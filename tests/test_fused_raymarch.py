"""Fused ray-march kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minimal_nerf_tpu.kernels.fused_raymarch import (
    fused_render_pass,
    render_rays_fused,
)
from minimal_nerf_tpu.models import init_nerf_mlp, nerf_mlp_apply
from minimal_nerf_tpu.models.nerf import (
    NeRFConfig,
    init_nerf_network,
    render_rays,
)
from minimal_nerf_tpu.ops import rendering


@pytest.fixture(scope="module")
def mlp_params():
    return init_nerf_mlp(jax.random.PRNGKey(0))


def _composed_reference(params, o, d, ts):
    """The jnp path the kernel fuses: MLP + deltas + weights + color."""
    samples = o[:, None, :] + ts * d[:, None, :]
    sigma, rgb = nerf_mlp_apply(params, samples, d)
    deltas = rendering.generate_deltas(ts)
    weights = rendering.calculate_unnormalized_weights(sigma, deltas)
    color = rendering.estimate_ray_color(weights, rgb)
    return color, weights


def _ts_for(key, n, s):
    o = jnp.zeros((n, 3))
    d = jax.random.normal(key, (n, 3)) - jnp.array([0.0, 0.0, 2.0])
    _, ts = rendering.generate_coarse_samples(jax.random.fold_in(key, 1), o, d, s)
    return o, d, ts


def test_fused_pass_matches_composed(mlp_params):
    o, d, ts = _ts_for(jax.random.PRNGKey(1), 8, 16)
    ref_color, ref_weights = _composed_reference(mlp_params, o, d, ts)
    k_color, k_weights = fused_render_pass(
        mlp_params, o, d, ts, ray_tile=4, interpret=True
    )
    np.testing.assert_allclose(k_color, ref_color, rtol=3e-5, atol=1e-6)
    np.testing.assert_allclose(k_weights, ref_weights, rtol=3e-5, atol=1e-6)


def test_fused_pass_with_ray_padding(mlp_params):
    # 10 rays, tile 4 -> 2 padded rays exercised
    o, d, ts = _ts_for(jax.random.PRNGKey(2), 10, 8)
    ref_color, ref_weights = _composed_reference(mlp_params, o, d, ts)
    k_color, k_weights = fused_render_pass(
        mlp_params, o, d, ts, ray_tile=4, interpret=True
    )
    assert k_color.shape == (10, 3)
    np.testing.assert_allclose(k_color, ref_color, rtol=3e-5, atol=1e-6)
    np.testing.assert_allclose(k_weights, ref_weights, rtol=3e-5, atol=1e-6)


def test_fused_pass_vjp_matches_autodiff(mlp_params):
    o, d, ts = _ts_for(jax.random.PRNGKey(3), 8, 16)
    target = jnp.full((8, 3), 0.4)

    def loss_ref(p):
        color, weights = _composed_reference(p, o, d, ts)
        return jnp.mean((color - target) ** 2) + 0.1 * jnp.mean(weights)

    def loss_fused(p):
        color, weights = fused_render_pass(p, o, d, ts, ray_tile=4, interpret=True)
        return jnp.mean((color - target) ** 2) + 0.1 * jnp.mean(weights)

    l_ref, g_ref = jax.value_and_grad(loss_ref)(mlp_params)
    l_fus, g_fus = jax.value_and_grad(loss_fused)(mlp_params)
    assert np.isclose(float(l_ref), float(l_fus), rtol=1e-5)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_fus),
    ):
        denom = np.abs(np.asarray(a)).max() + 1e-12
        err = np.abs(np.asarray(a) - np.asarray(b)).max() / denom
        # terminal-delta path is precision-dominated (see test_kernels_vjp)
        assert err < 1e-2, f"{jax.tree_util.keystr(ka)}: {err}"


def test_render_rays_fused_matches_render_rays():
    cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    key = jax.random.PRNGKey(4)
    params = init_nerf_network(key, cfg)
    o = jnp.zeros((8, 3))
    d = jax.random.normal(key, (8, 3)) - jnp.array([0.0, 0.0, 2.0])
    render_key = jax.random.PRNGKey(9)

    ref = render_rays(params, cfg, o, d, render_key)
    fused = render_rays_fused(params, cfg, o, d, render_key,
                              ray_tile=4, interpret=True)
    np.testing.assert_allclose(
        fused["coarse_rgb_rays"], ref["coarse_rgb_rays"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        fused["fine_rgb_rays"], ref["fine_rgb_rays"], rtol=1e-4, atol=1e-5
    )


def test_render_rays_fused_grad():
    cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    key = jax.random.PRNGKey(5)
    params = init_nerf_network(key, cfg)
    o = jnp.zeros((8, 3))
    d = jax.random.normal(key, (8, 3)) - jnp.array([0.0, 0.0, 2.0])
    rgb = jnp.full((8, 3), 0.5)
    render_key = jax.random.PRNGKey(11)

    def loss(p, render):
        out = render(p, cfg, o, d, render_key)
        return jnp.mean((out["fine_rgb_rays"] - rgb) ** 2) + jnp.mean(
            (out["coarse_rgb_rays"] - rgb) ** 2
        )

    g_ref = jax.grad(lambda p: loss(p, render_rays))(params)
    g_fus = jax.grad(
        lambda p: loss(
            p,
            lambda *a, **k: render_rays_fused(*a, ray_tile=4, interpret=True, **k),
        )
    )(params)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_fus),
    ):
        denom = np.abs(np.asarray(a)).max() + 1e-12
        err = np.abs(np.asarray(a) - np.asarray(b)).max() / denom
        assert err < 1e-2, f"{jax.tree_util.keystr(ka)}: {err}"


def test_fused_pass_nondefault_encoding_dims():
    # custom -p/-d flags must flow through the in-kernel encoding
    params = init_nerf_mlp(jax.random.PRNGKey(7), position_dim=6, direction_dim=2)
    o, d, ts = _ts_for(jax.random.PRNGKey(8), 8, 24)
    samples = o[:, None, :] + ts * d[:, None, :]
    ref_sigma, ref_rgb = nerf_mlp_apply(
        params, samples, d, position_dim=6, direction_dim=2
    )
    from minimal_nerf_tpu.ops import rendering as _r

    deltas = _r.generate_deltas(ts)
    ref_w = _r.calculate_unnormalized_weights(ref_sigma, deltas)
    ref_color = _r.estimate_ray_color(ref_w, ref_rgb)
    color, weights = fused_render_pass(
        params, o, d, ts, position_dim=6, direction_dim=2,
        ray_tile=4, interpret=True,
    )
    np.testing.assert_allclose(color, ref_color, rtol=3e-5, atol=1e-6)
    np.testing.assert_allclose(weights, ref_w, rtol=3e-5, atol=1e-6)


def test_auto_tiles_selection():
    from minimal_nerf_tpu.kernels.fused_raymarch import _auto_tiles

    # production 192-sample union keeps the tuned 16/8
    assert _auto_tiles(192) == (16, 8)
    # fast recipe's 64-sample union fills the MXU with 64/32 (+10% measured)
    assert _auto_tiles(64) == (64, 32)
    assert _auto_tiles(128) == (32, 16)
    for u in range(8, 512, 8):
        fwd, bwd = _auto_tiles(u)
        assert fwd % 8 == 0 and bwd % 8 == 0  # Mosaic sublane divisibility
        assert fwd % bwd == 0  # backward tile must divide forward
        assert 8 <= bwd <= fwd <= 64
