"""Driver entry points run on the virtual CPU mesh."""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft  # noqa: E402


@pytest.mark.slow
def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_hermetic_from_hostile_env():
    """The dryrun must self-isolate when the ambient env doesn't pin a CPU mesh.

    Reproduces the round-1 driver failure mode (MULTICHIP_r01.json): a parent
    process whose JAX_PLATFORMS/XLA_FLAGS do NOT describe an n-device CPU
    platform. The dryrun must re-exec itself with a forced virtual CPU mesh
    rather than inherit the ambient platform.
    """
    import os
    import subprocess

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    repo = str(Path(__file__).resolve().parent.parent)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(4)"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(4)" in proc.stdout


def test_entry_returns_jittable():
    fn, args = graft.entry()
    # trace-only check (full CPU compile of the production shapes is slow)
    shapes = jax.eval_shape(fn, *args)
    assert shapes[0].shape == (1024, 3)
    assert shapes[1].shape == (1024, 3)
