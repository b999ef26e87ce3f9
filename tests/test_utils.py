"""Tests for metrics logging and profiling utilities."""

import csv

import numpy as np

from minimal_nerf_tpu.training.metrics import MetricsLogger
from minimal_nerf_tpu.utils.profiling import StepTimer, debug_mode


def test_metrics_logger_csv_schema_growth(tmp_path):
    logger = MetricsLogger(tmp_path / "run", name="t", echo=False)
    logger.log_scalars(1, {"a": 1.0})
    logger.log_scalars(2, {"a": 2.0, "b": 3.0})  # new key appears later
    with open(tmp_path / "run" / "metrics.csv") as f:
        rows = list(csv.DictReader(f))
    assert rows[0]["a"] == "1.0" and rows[0].get("b") in ("", None)
    assert rows[1]["b"] == "3.0"


def test_metrics_logger_image_and_hparams(tmp_path):
    logger = MetricsLogger(tmp_path / "run", echo=False)
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    path = logger.log_image("recon", img, step=5)
    assert path.exists()
    logger.log_hyperparams({"lr": 5e-4})
    assert (tmp_path / "run" / "hparams.json").exists()


def test_step_timer():
    t = StepTimer(rays_per_step=100)
    t.tick()
    t.tick(4)
    rates = t.rates()
    assert rates["rays_per_sec"] > 0
    assert rates["iterations_per_sec"] * 100 == rates["rays_per_sec"]


def test_debug_mode_context():
    import jax.numpy as jnp

    with debug_mode(nans=True):
        x = jnp.ones(4) + 1
    assert float(x.sum()) == 8.0
