"""Tracing / profiling / debug utilities.

The reference's only instrumentation is a per-step wall-clock logged to wandb
(``nerf_model.py:167-168``). This module adds the TPU-native equivalents:

- ``trace(logdir)``: ``jax.profiler`` trace context (view in TensorBoard /
  xprof) around any training window,
- ``StepTimer``: dispatch-aware steps/sec + rays/sec (what the trainer logs),
- ``debug_mode()``: enables ``jax_debug_nans`` + disables donation-unsafe
  optimizations for hunting non-finite values (the pure-functional analogue
  of a race detector / sanitizer pass — SURVEY.md section 5).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_mode(nans: bool = True, disable_jit: bool = False) -> Iterator[None]:
    """NaN-checking (and optionally jit-less) execution for debugging."""
    ctx = contextlib.ExitStack()
    with ctx:
        if nans:
            ctx.enter_context(jax.debug_nans(True))
        if disable_jit:
            ctx.enter_context(jax.disable_jit())
        yield


class StepTimer:
    """Rolling steps/sec + rays/sec measurement (host-side, fetch-free)."""

    def __init__(self, rays_per_step: int):
        self.rays_per_step = rays_per_step
        self._t0: Optional[float] = None
        self._steps = 0

    def tick(self, n: int = 1) -> None:
        if self._t0 is None:
            self._t0 = time.perf_counter()
            self._steps = 0
        self._steps += n

    def rates(self) -> dict:
        if self._t0 is None or self._steps == 0:
            return {}
        dt = time.perf_counter() - self._t0
        sps = self._steps / dt
        self._t0 = time.perf_counter()
        self._steps = 0
        return {
            "iterations_per_sec": sps,
            "rays_per_sec": sps * self.rays_per_step,
        }
