"""Pallas kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minimal_nerf_tpu.kernels.raymarch import (
    make_pallas_mlp_apply,
    nerf_mlp_pallas_apply,
)
from minimal_nerf_tpu.models import init_nerf_mlp, nerf_mlp_apply
from minimal_nerf_tpu.models.nerf import (
    NeRFConfig,
    init_nerf_network,
    render_rays,
)


@pytest.fixture(scope="module")
def mlp_params():
    return init_nerf_mlp(jax.random.PRNGKey(0), position_dim=10, direction_dim=4)


def test_pallas_mlp_matches_reference_fp32(mlp_params):
    key = jax.random.PRNGKey(1)
    samples = jax.random.uniform(key, (8, 16, 3), minval=-3.0, maxval=3.0)
    direc = jax.random.normal(jax.random.fold_in(key, 1), (8, 3))

    ref_sigma, ref_rgb = nerf_mlp_apply(mlp_params, samples, direc)
    k_sigma, k_rgb = nerf_mlp_pallas_apply(
        mlp_params, samples, direc, tile=64, interpret=True
    )
    np.testing.assert_allclose(k_sigma, ref_sigma, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(k_rgb, ref_rgb, rtol=2e-5, atol=1e-6)


def test_pallas_mlp_with_padding(mlp_params):
    # point count not a multiple of the tile exercises the pad/slice path
    key = jax.random.PRNGKey(2)
    samples = jax.random.uniform(key, (5, 7, 3), minval=-2.0, maxval=2.0)
    direc = jax.random.normal(jax.random.fold_in(key, 1), (5, 3))
    ref_sigma, ref_rgb = nerf_mlp_apply(mlp_params, samples, direc)
    k_sigma, k_rgb = nerf_mlp_pallas_apply(
        mlp_params, samples, direc, tile=64, interpret=True
    )
    assert k_sigma.shape == ref_sigma.shape
    np.testing.assert_allclose(k_sigma, ref_sigma, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(k_rgb, ref_rgb, rtol=2e-5, atol=1e-6)


def test_pallas_render_rays_integration(mlp_params):
    cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    key = jax.random.PRNGKey(3)
    params = init_nerf_network(key, cfg)
    o = jnp.zeros((16, 3))
    d = jax.random.normal(key, (16, 3))
    render_key = jax.random.PRNGKey(9)

    out_ref = render_rays(params, cfg, o, d, render_key)
    out_pal = render_rays(
        params, cfg, o, d, render_key,
        mlp_apply=make_pallas_mlp_apply(tile=64, interpret=True),
    )
    np.testing.assert_allclose(
        out_pal["fine_rgb_rays"], out_ref["fine_rgb_rays"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        out_pal["coarse_rgb_rays"], out_ref["coarse_rgb_rays"], rtol=1e-4, atol=1e-5
    )
