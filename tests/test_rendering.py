"""Golden-value and property tests for the volume-rendering math.

Golden values are framework-agnostic truths ported from the reference's test
suite (``tests/nerf_helpers_test.py``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minimal_nerf_tpu.ops import rendering


def test_calculate_unnormalized_weights_golden():
    # reference tests/nerf_helpers_test.py:16-21 (hand-computed values)
    deltas = jnp.full((1, 5, 1), 0.2)
    density = jnp.array([0, 50, 1, 0.3, 1], dtype=jnp.float32).reshape(deltas.shape)
    weights = rendering.calculate_unnormalized_weights(density, deltas)
    gt = jnp.array(
        [0, 0.9999546001, 8.229611e-6, 2.1646e-6, 6.34545e-6], dtype=jnp.float32
    ).reshape(deltas.shape)
    np.testing.assert_allclose(weights, gt, rtol=1.3e-6, atol=1e-9)


def test_estimate_ray_color_equal_weights():
    weights = jnp.full((1, 256, 1), 1 / 256)
    rgbs = jnp.full((1, 256, 3), 1.0)
    ray_color = rendering.estimate_ray_color(weights, rgbs)
    np.testing.assert_allclose(ray_color, jnp.ones((1, 3)), rtol=1e-6)


def test_estimate_ray_color_one_hot_weight():
    weights = jnp.zeros((1, 256, 1)).at[:, 200, :].set(1.0)
    rgbs = jnp.full((1, 256, 3), 1.0)
    ray_color = rendering.estimate_ray_color(weights, rgbs)
    np.testing.assert_allclose(ray_color, jnp.ones((1, 3)), rtol=1e-6)


def test_generate_deltas():
    ts = jnp.arange(2, 6, 1, dtype=jnp.float32).reshape((1, -1, 1))
    deltas = rendering.generate_deltas(ts)
    gt = jnp.ones((1, 4, 1)).at[:, -1, :].set(1e10)
    np.testing.assert_allclose(deltas, gt)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_stratified_samples_within_bins(seed):
    # reference tests/nerf_helpers_test.py:49-63 — bin-bounds property test
    o_rays = jnp.array([[0.0, 0.0, 0.0]])
    d_rays = jnp.array([[1.0, 1.0, 1.0]])
    samples, ts = rendering.generate_coarse_samples(
        jax.random.PRNGKey(seed), o_rays, d_rays, num_samples=2
    )
    bounds = np.array([2.0, 4.0, 6.0])
    assert np.all(ts[0, :, 0] >= bounds[:-1]) and np.all(ts[0, :, 0] <= bounds[1:])
    lower = bounds[:-1, None] * np.ones(3)
    upper = bounds[1:, None] * np.ones(3)
    assert np.all(np.asarray(samples[0]) >= lower)
    assert np.all(np.asarray(samples[0]) <= upper)


def test_stratified_samples_monotone_and_shapes():
    key = jax.random.PRNGKey(0)
    o = jax.random.normal(key, (16, 3))
    d = jax.random.normal(jax.random.fold_in(key, 1), (16, 3))
    samples, ts = rendering.generate_coarse_samples(key, o, d, 64)
    assert samples.shape == (16, 64, 3)
    assert ts.shape == (16, 64, 1)
    assert np.all(np.diff(ts[..., 0], axis=1) > 0)


def test_inverse_transform_sampling_bounds_and_concentration():
    key = jax.random.PRNGKey(3)
    n, c, s = 8, 64, 128
    o = jnp.zeros((n, 3))
    d = jnp.ones((n, 3))
    _, ts = rendering.generate_coarse_samples(key, o, d, c)
    # concentrate all weight in one coarse bin per ray
    weights = jnp.zeros((n, c, 1)).at[:, 30, :].set(1.0)
    fine_samples, fine_ts = rendering.inverse_transform_sampling(
        jax.random.fold_in(key, 9), o, d, weights, ts, s
    )
    assert fine_ts.shape == (n, s, 1)
    assert np.all(fine_ts >= 2.0) and np.all(fine_ts <= 6.0)
    # nearly all fine samples must land within the hot bin's neighborhood
    lo = np.asarray(ts[:, 29, 0])
    hi = np.asarray(ts[:, 31, 0])
    frac_in = np.mean(
        (np.asarray(fine_ts[..., 0]) >= lo[:, None])
        & (np.asarray(fine_ts[..., 0]) <= hi[:, None])
    )
    assert frac_in > 0.95


def test_inverse_transform_sampling_uniform_weights_cover_range():
    key = jax.random.PRNGKey(4)
    n, c, s = 4, 64, 128
    o = jnp.zeros((n, 3))
    d = jnp.ones((n, 3))
    _, ts = rendering.generate_coarse_samples(key, o, d, c)
    weights = jnp.full((n, c, 1), 1.0 / c)
    _, fine_ts = rendering.inverse_transform_sampling(
        jax.random.fold_in(key, 5), o, d, weights, ts, s
    )
    spread = np.asarray(fine_ts[..., 0].max(axis=1) - fine_ts[..., 0].min(axis=1))
    assert np.all(spread > 3.0)  # spans most of [2, 6]


def test_union_and_sort_ts():
    key = jax.random.PRNGKey(5)
    n = 4
    o = jax.random.normal(key, (n, 3))
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    _, coarse_ts = rendering.generate_coarse_samples(key, o, d, 64)
    _, fine_ts = rendering.generate_coarse_samples(jax.random.fold_in(key, 2), o, d, 128)
    samples, all_ts = rendering.union_and_sort_ts(o, d, fine_ts, coarse_ts)
    assert all_ts.shape == (n, 192, 1)
    assert samples.shape == (n, 192, 3)
    assert np.all(np.diff(all_ts[..., 0], axis=1) >= 0)
    # positions are consistent with o + t*d
    recon = o[:, None, :] + all_ts * d[:, None, :]
    np.testing.assert_allclose(samples, recon, rtol=1e-6)


def test_weights_sum_bounded_by_one():
    # sum of transmittance weights over a ray is <= 1 (equality when opaque)
    key = jax.random.PRNGKey(6)
    density = jax.nn.relu(jax.random.normal(key, (32, 64, 1))) * 5
    _, ts = rendering.generate_coarse_samples(
        key, jnp.zeros((32, 3)), jnp.ones((32, 3)), 64
    )
    deltas = rendering.generate_deltas(ts)
    w = rendering.calculate_unnormalized_weights(density, deltas)
    sums = np.asarray(w.sum(axis=1))
    assert np.all(sums <= 1.0 + 1e-5)


def test_linterp_sampling_sorted_and_bounded():
    key = jax.random.PRNGKey(11)
    n, c, s = 16, 64, 128
    o = jnp.zeros((n, 3))
    d = jnp.ones((n, 3))
    _, ts = rendering.generate_coarse_samples(key, o, d, c)
    weights = jax.random.uniform(jax.random.fold_in(key, 1), (n, c, 1))
    fine_samples, fine_ts = rendering.inverse_transform_sampling_linterp(
        jax.random.fold_in(key, 2), o, d, weights, ts, s
    )
    f = np.asarray(fine_ts[..., 0])
    assert np.all(np.diff(f, axis=1) >= 0), "linterp fine ts must be sorted"
    assert f.min() >= 2.0 and f.max() <= 6.0


def test_linterp_concentrates_like_reference():
    key = jax.random.PRNGKey(12)
    n, c, s = 8, 64, 128
    o = jnp.zeros((n, 3))
    d = jnp.ones((n, 3))
    _, ts = rendering.generate_coarse_samples(key, o, d, c)
    weights = jnp.zeros((n, c, 1)).at[:, 30, :].set(1.0)
    _, fine_ts = rendering.inverse_transform_sampling_linterp(
        jax.random.fold_in(key, 1), o, d, weights, ts, s
    )
    lo = np.asarray(ts[:, 29, 0])
    hi = np.asarray(ts[:, 31, 0])
    frac_in = np.mean(
        (np.asarray(fine_ts[..., 0]) >= lo[:, None])
        & (np.asarray(fine_ts[..., 0]) <= hi[:, None])
    )
    assert frac_in > 0.95


def test_merge_sorted_ts_matches_full_sort():
    key = jax.random.PRNGKey(13)
    n = 8
    o = jax.random.normal(key, (n, 3))
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    coarse = jnp.sort(jax.random.uniform(key, (n, 64, 1), minval=2, maxval=6), axis=1)
    fine = jnp.sort(
        jax.random.uniform(jax.random.fold_in(key, 2), (n, 128, 1), minval=2, maxval=6),
        axis=1,
    )
    s_ref, t_ref = rendering.union_and_sort_ts(o, d, fine, coarse)
    s_m, t_m = rendering.merge_sorted_ts(o, d, fine, coarse)
    np.testing.assert_allclose(np.asarray(t_m), np.asarray(t_ref), atol=0)
    np.testing.assert_allclose(np.asarray(s_m), np.asarray(s_ref), rtol=1e-6)


def test_render_rays_linterp_mode():
    from minimal_nerf_tpu.models.nerf import NeRFConfig, init_nerf_network, render_rays

    cfg = NeRFConfig(coarse_samples=16, fine_samples=16, fine_sampling="linterp")
    key = jax.random.PRNGKey(14)
    params = init_nerf_network(key, cfg)
    o = jnp.zeros((8, 3))
    d = jax.random.normal(key, (8, 3))
    out = render_rays(params, cfg, o, d, jax.random.fold_in(key, 1))
    assert np.all(np.isfinite(np.asarray(out["fine_rgb_rays"])))
