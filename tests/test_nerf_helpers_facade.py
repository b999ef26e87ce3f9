"""Tests for the reference-shaped nerf_helpers facade."""

import jax
import jax.numpy as jnp
import numpy as np

from minimal_nerf_tpu import nerf_helpers
from minimal_nerf_tpu.models.nerf import NeRFNetwork


def test_facade_exports():
    for name in (
        "generate_coarse_samples", "generate_deltas",
        "calculate_unnormalized_weights", "estimate_ray_color",
        "inverse_transform_sampling", "get_rays", "pose_spherical",
        "convert_to_ndc_rays", "fix_batchify", "view_reconstruction",
        "generate_360_view_synthesis", "photo_nerf_to_image",
    ):
        assert hasattr(nerf_helpers, name), name


def test_fix_batchify():
    batch = {"a": jnp.ones((1, 8, 3)), "b": jnp.zeros((1, 4))}
    nerf_helpers.fix_batchify(batch)
    assert batch["a"].shape == (8, 3)
    assert batch["b"].shape == (4,)


def test_view_reconstruction_with_model_wrapper():
    net = NeRFNetwork(coarse_samples=4, fine_samples=4)
    o = jnp.zeros((8, 8, 3))
    d = jnp.ones((8, 8, 3))
    im = nerf_helpers.view_reconstruction(net, o, d, N=32)
    assert im.shape == (8, 8, 3)
    assert im.dtype == np.uint8
