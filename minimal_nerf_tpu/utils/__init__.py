"""Utilities: image IO, metrics logging, profiling."""
