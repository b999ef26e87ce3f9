"""Custom-VJP Pallas backward parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minimal_nerf_tpu.kernels.raymarch import (
    make_pallas_mlp_apply,
    nerf_mlp_pallas_apply_diff,
)
from minimal_nerf_tpu.models import init_nerf_mlp, nerf_mlp_apply
from minimal_nerf_tpu.models.nerf import NeRFConfig, init_nerf_network
from minimal_nerf_tpu.training.loop import nerf_loss


@pytest.fixture(scope="module")
def mlp_params():
    return init_nerf_mlp(jax.random.PRNGKey(0), position_dim=10, direction_dim=4)


def _rel_err(a, b):
    a = np.asarray(a).ravel()
    b = np.asarray(b).ravel()
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-12)


def test_pallas_vjp_matches_autodiff(mlp_params):
    key = jax.random.PRNGKey(1)
    samples = jax.random.uniform(key, (8, 16, 3), minval=-3.0, maxval=3.0)
    direc = jax.random.normal(jax.random.fold_in(key, 1), (8, 3))
    target_sig = jax.random.uniform(jax.random.fold_in(key, 2), (8, 16, 1))
    target_rgb = jax.random.uniform(jax.random.fold_in(key, 3), (8, 16, 3))

    def loss_ref(p):
        sig, rgb = nerf_mlp_apply(p, samples, direc)
        return jnp.mean((sig - target_sig) ** 2) + jnp.mean((rgb - target_rgb) ** 2)

    def loss_pal(p):
        sig, rgb = nerf_mlp_pallas_apply_diff(
            p, samples, direc, tile=64, interpret=True
        )
        return jnp.mean((sig - target_sig) ** 2) + jnp.mean((rgb - target_rgb) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss_ref)(mlp_params)
    l_pal, g_pal = jax.value_and_grad(loss_pal)(mlp_params)
    assert np.isclose(float(l_ref), float(l_pal), rtol=1e-5)

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pal = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_leaves_with_path(g_pal)}
    for k, v_ref in flat_ref:
        ks = jax.tree_util.keystr(k)
        err = _rel_err(flat_pal[ks], v_ref)
        assert err < 1e-4, f"grad mismatch at {ks}: rel err {err}"


@pytest.mark.slow
def test_pallas_vjp_in_full_render_loss(mlp_params):
    cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    key = jax.random.PRNGKey(2)
    params = init_nerf_network(key, cfg)
    o = jnp.zeros((16, 3))
    d = jax.random.normal(key, (16, 3))
    rgb = jnp.full((16, 3), 0.5)
    render_key = jax.random.PRNGKey(5)

    pal_apply = make_pallas_mlp_apply(tile=64, interpret=True, differentiable=True)

    (l_ref, _), g_ref = jax.value_and_grad(nerf_loss, has_aux=True)(
        params, cfg, o, d, rgb, render_key, None, None
    )
    (l_pal, _), g_pal = jax.value_and_grad(nerf_loss, has_aux=True)(
        params, cfg, o, d, rgb, render_key, None, pal_apply
    )
    assert np.isclose(float(l_ref), float(l_pal), rtol=1e-5), (l_ref, l_pal)
    # the terminal-delta (1e10) gradient path is precision-dominated: fp32
    # autodiff and the fp32 kernel agree to ~0.2% but reassociate differently
    # (verified against an fp64 ground truth — both fp32 paths are equally
    # distant from it); 1% still catches structural bugs, which are O(1)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_pal),
    ):
        err = _rel_err(b, a)
        assert err < 1e-2, f"grad mismatch at {jax.tree_util.keystr(ka)}: {err}"


def test_pallas_vjp_with_padding(mlp_params):
    key = jax.random.PRNGKey(4)
    samples = jax.random.uniform(key, (5, 7, 3), minval=-2.0, maxval=2.0)
    direc = jax.random.normal(jax.random.fold_in(key, 1), (5, 3))

    def loss_ref(p):
        sig, rgb = nerf_mlp_apply(p, samples, direc)
        return jnp.mean(sig) + jnp.mean(rgb)

    def loss_pal(p):
        sig, rgb = nerf_mlp_pallas_apply_diff(
            p, samples, direc, tile=64, interpret=True
        )
        return jnp.mean(sig) + jnp.mean(rgb)

    g_ref = jax.grad(loss_ref)(mlp_params)
    g_pal = jax.grad(loss_pal)(mlp_params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pal)
    ):
        assert _rel_err(b, a) < 1e-4
