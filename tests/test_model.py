"""Model-layer tests: MLP shapes, hierarchical render, toy image model."""

import jax
import jax.numpy as jnp
import numpy as np

from minimal_nerf_tpu.models import (
    ImageNeRFModel,
    NeRFConfig,
    NeRFNetwork,
    init_nerf_mlp,
    init_nerf_network,
    nerf_mlp_apply,
    render_rays,
)
from minimal_nerf_tpu.models.nerf import render_single


def test_mlp_forward_shapes():
    # reference tests/nerf_model_test.py:69-72
    key = jax.random.PRNGKey(0)
    params = init_nerf_mlp(key, position_dim=10, direction_dim=4)
    samples = jax.random.uniform(key, (4, 4, 3))
    direc = jax.random.uniform(jax.random.fold_in(key, 1), (4, 3))
    density, rgb = nerf_mlp_apply(params, samples, direc)
    assert density.shape == (4, 4, 1)
    assert rgb.shape == (4, 4, 3)


def test_mlp_output_ranges():
    key = jax.random.PRNGKey(1)
    params = init_nerf_mlp(key)
    samples = jax.random.uniform(key, (8, 16, 3), minval=-3, maxval=3)
    direc = jax.random.normal(jax.random.fold_in(key, 1), (8, 3))
    density, rgb = nerf_mlp_apply(params, samples, direc)
    assert np.all(np.asarray(density) >= 0)  # ReLU-rectified
    assert np.all(np.asarray(rgb) >= 0) and np.all(np.asarray(rgb) <= 1)  # sigmoid


def test_mlp_param_shapes():
    params = init_nerf_mlp(jax.random.PRNGKey(0), position_dim=10, direction_dim=4)
    assert params["trunk"][0]["w"].shape == (60, 256)
    assert params["feature"][0]["w"].shape == (256 + 60, 256)
    assert params["density"]["w"].shape == (256, 1)
    assert params["rgb"][0]["w"].shape == (256 + 24, 128)
    assert params["rgb"][1]["w"].shape == (128, 3)


def test_mlp_direction_scale_invariance():
    # directions are unit-normalized inside the MLP: scaling d must not change output
    key = jax.random.PRNGKey(2)
    params = init_nerf_mlp(key)
    samples = jax.random.uniform(key, (4, 8, 3))
    direc = jax.random.normal(jax.random.fold_in(key, 1), (4, 3))
    d1, r1 = nerf_mlp_apply(params, samples, direc)
    d2, r2 = nerf_mlp_apply(params, samples, direc * 7.3)
    np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(r1, r2, rtol=1e-5, atol=1e-6)


def test_render_rays_shapes_and_finiteness():
    cfg = NeRFConfig(coarse_samples=16, fine_samples=32)
    key = jax.random.PRNGKey(3)
    params = init_nerf_network(key, cfg)
    o = jnp.zeros((8, 3))
    d = jax.random.normal(jax.random.fold_in(key, 1), (8, 3))
    out = render_rays(params, cfg, o, d, jax.random.fold_in(key, 2))
    assert out["fine_rgb_rays"].shape == (8, 3)
    assert out["coarse_rgb_rays"].shape == (8, 3)
    assert np.all(np.isfinite(np.asarray(out["fine_rgb_rays"])))
    assert np.all(np.isfinite(np.asarray(out["coarse_rgb_rays"])))


def test_render_rays_jit_and_grad():
    # batch large enough that not every density pre-activation is ReLU-dead
    cfg = NeRFConfig(coarse_samples=32, fine_samples=32)
    key = jax.random.PRNGKey(4)
    params = init_nerf_network(key, cfg)
    o = jnp.zeros((32, 3))
    d = jax.random.normal(key, (32, 3))
    target = jnp.full((32, 3), 0.5)

    @jax.jit
    def loss_fn(p):
        out = render_rays(p, cfg, o, d, jax.random.PRNGKey(7))
        return jnp.mean((out["fine_rgb_rays"] - target) ** 2) + jnp.mean(
            (out["coarse_rgb_rays"] - target) ** 2
        )

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # both networks receive gradient
    assert any(float(jnp.abs(g).sum()) > 0 for g in jax.tree_util.tree_leaves(grads["coarse"]))
    assert any(float(jnp.abs(g).sum()) > 0 for g in jax.tree_util.tree_leaves(grads["fine"]))


def test_render_single():
    cfg = NeRFConfig()
    key = jax.random.PRNGKey(5)
    params = init_nerf_mlp(key)
    o = jnp.zeros((4, 3))
    d = jax.random.normal(key, (4, 3))
    out = render_single(params, cfg, o, d, key, num_samples=32)
    assert out["pred_rgbs"].shape == (4, 3)
    assert out["density"].shape == (4, 32, 1)


def test_nerf_network_wrapper():
    net = NeRFNetwork(coarse_samples=8, fine_samples=16)
    o = jnp.zeros((4, 3))
    d = jnp.ones((4, 3))
    out = net.forward(o, d)
    assert set(out) == {"fine_rgb_rays", "coarse_rgb_rays"}


def test_image_nerf_model():
    # reference tests/nerf_model_test.py:78-80 (position_dim=-1 -> no encoding)
    model = ImageNeRFModel(position_dim=-1)
    rgb = model(jnp.array([[1.0, 0.0]]))
    assert rgb.shape == (1, 3)
    model_enc = ImageNeRFModel(position_dim=10)
    rgb = model_enc(jnp.array([[0.3, 0.7]]))
    assert rgb.shape == (1, 3)
    assert np.all(np.asarray(rgb) >= 0) and np.all(np.asarray(rgb) <= 1)


def test_bf16_compute_close_to_fp32():
    cfg = NeRFConfig(coarse_samples=16, fine_samples=32)
    key = jax.random.PRNGKey(6)
    params = init_nerf_network(key, cfg)
    o = jnp.zeros((8, 3))
    d = jax.random.normal(key, (8, 3))
    out32 = render_rays(params, cfg, o, d, jax.random.PRNGKey(1))
    out16 = render_rays(
        params, cfg, o, d, jax.random.PRNGKey(1), compute_dtype=jnp.bfloat16
    )
    np.testing.assert_allclose(
        out32["fine_rgb_rays"], out16["fine_rgb_rays"], atol=0.08
    )


def test_single_nerf_wrapper():
    from minimal_nerf_tpu.models import SingleNeRF

    net = SingleNeRF(num_samples=16)
    out = net.forward(jnp.zeros((4, 3)), jnp.ones((4, 3)))
    assert out["pred_rgbs"].shape == (4, 3)
    assert out["density"].shape == (4, 16, 1)
