"""Driver entry points run on the virtual CPU mesh."""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft  # noqa: E402


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    graft.dryrun_multichip(8)


def test_entry_returns_jittable():
    fn, args = graft.entry()
    # trace-only check (full CPU compile of the production shapes is slow)
    shapes = jax.eval_shape(fn, *args)
    assert shapes[0].shape == (1024, 3)
    assert shapes[1].shape == (1024, 3)
