"""Occupancy-grid acceleration: packing, queries, guided sampling, train step.

The grid is an opt-in acceleration with no reference counterpart (the
reference samples uniformly, ``nerf_helpers.py:28-56``); these tests pin its
own contracts: bit-packing round-trips, bin probes match a dense NumPy
re-derivation, guided samples land only in occupied bins, warmup/fallback
reduce to uniform coverage, and the occupancy train step trains (loss falls,
grid sparsifies after warmup) with mesh/no-mesh equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minimal_nerf_tpu.models.nerf import NeRFConfig, init_nerf_network, render_rays
from minimal_nerf_tpu.ops import occupancy as occ_lib
from minimal_nerf_tpu.ops.occupancy import OccupancyConfig


def small_cfg(**kw):
    # floor=0 / no jitter pin the pure-concentration semantics most tests
    # exercise; dedicated tests cover the production floor/jitter defaults
    kw.setdefault("resolution", 16)
    kw.setdefault("bound", 3.2)
    kw.setdefault("num_bins", 16)
    kw.setdefault("floor", 0.0)
    kw.setdefault("in_bin_jitter", False)
    return OccupancyConfig(**kw)


# ------------------------------------------------------------------- packing


def test_pack_occupancy_roundtrip():
    cfg = small_cfg()
    g = cfg.resolution
    rng = np.random.default_rng(0)
    ema = rng.uniform(0.0, 0.03, size=(g, g, g)).astype(np.float32)
    words = np.asarray(occ_lib.pack_occupancy(jnp.asarray(ema), cfg))
    assert words.dtype == np.uint32 and words.shape == (g**3 // 32,)
    expected = (ema > cfg.threshold).reshape(-1)
    lin = np.arange(g**3)
    got = (words[lin >> 5] >> (lin & 31)) & 1
    np.testing.assert_array_equal(got.astype(bool), expected)


def test_pack_occupancy_force_all():
    cfg = small_cfg()
    ema = occ_lib.init_grid(cfg)  # all zeros -> all empty
    words = np.asarray(occ_lib.pack_occupancy(ema, cfg, force_all=True))
    assert (words == np.uint32(0xFFFFFFFF)).all()
    words_off = np.asarray(occ_lib.pack_occupancy(ema, cfg, force_all=False))
    assert (words_off == 0).all()


def test_pack_occupancy_uses_effective_threshold():
    """pack_occupancy thresholds through occupancy_mask (incl. the
    rel_threshold component), not the raw absolute cutoff."""
    cfg = small_cfg(floor=0.25, threshold=1e-2, rel_threshold=1e-2)
    g = cfg.resolution
    rng = np.random.default_rng(3)
    ema = rng.uniform(0.0, 0.03, size=(g, g, g)).astype(np.float32)
    ema[:2] = 400.0  # dense slab pushes the effective cutoff above 0.03
    words = np.asarray(occ_lib.pack_occupancy(jnp.asarray(ema), cfg))
    lin = np.arange(g**3)
    bits = ((words[lin >> 5] >> (lin & 31)) & 1).astype(bool).reshape(g, g, g)
    np.testing.assert_array_equal(bits, dense_mask(ema, cfg))
    assert bits[:2].all() and not bits[2:].any()


def test_effective_threshold_tracks_grid_mean():
    """rel_threshold couples the cutoff to mean density (creep fix): haze
    just above the absolute threshold stays pruned once real surfaces
    dominate the EMA mass."""
    cfg = small_cfg(threshold=1e-2, rel_threshold=1e-2)
    g = cfg.resolution
    ema = np.full((g, g, g), 0.02, np.float32)  # uniform haze, 2x absolute thr
    ema[:2] = 400.0  # a dense surface slab dominating the mean
    thr = float(occ_lib.effective_threshold(jnp.asarray(ema), cfg))
    assert thr > 0.02, "cutoff must rise above the haze level"
    mask = np.asarray(occ_lib.occupancy_mask(jnp.asarray(ema), cfg))
    assert mask[:2].all() and not mask[2:].any()
    # absolute-only behavior (rel=0): haze counts as occupied (the creep)
    cfg0 = small_cfg(threshold=1e-2, rel_threshold=0.0)
    mask0 = np.asarray(occ_lib.occupancy_mask(jnp.asarray(ema), cfg0))
    assert mask0.all()
    # with a near-empty grid the absolute floor still applies
    lo = np.zeros((g, g, g), np.float32)
    lo[0, 0, 0] = 0.5
    thr_lo = float(occ_lib.effective_threshold(jnp.asarray(lo), cfg))
    assert thr_lo == pytest.approx(cfg.threshold)


# -------------------------------------------------------------------- query


def dense_mask(ema, cfg):
    """NumPy re-derivation of the effective-threshold occupancy mask."""
    thr = max(cfg.threshold, cfg.rel_threshold * float(np.mean(ema)))
    return ema > thr


def query_reference(occ_dense, o, d, cfg, num_bins, near, far):
    """Dense NumPy re-derivation of query_bin_weights (incl. floor)."""
    g = cfg.resolution
    width = (far - near) / num_bins
    mids = near + (np.arange(num_bins) + 0.5) * width
    pos = o[:, None, :] + mids[None, :, None] * d[:, None, :]
    v = np.floor((pos + cfg.bound) * (g / (2 * cfg.bound))).astype(np.int64)
    inb = ((v >= 0) & (v < g)).all(axis=-1)
    vc = np.clip(v, 0, g - 1)
    occ = occ_dense[vc[..., 0], vc[..., 1], vc[..., 2]] & inb
    w = np.where(occ, 1.0, np.where(inb, cfg.floor, 0.0)).astype(np.float32)
    empty = w.sum(axis=1) == 0
    w[empty] = 1.0
    return w


def test_query_bin_weights_matches_dense_lookup():
    cfg = small_cfg()
    g = cfg.resolution
    rng = np.random.default_rng(1)
    ema = rng.uniform(0.0, 0.03, size=(g, g, g)).astype(np.float32)
    occ_dense = dense_mask(ema, cfg)
    words = occ_lib.pack_occupancy(jnp.asarray(ema), cfg)

    n = 64
    o = rng.normal(0, 2.0, size=(n, 3)).astype(np.float32)
    d = rng.normal(0, 1.0, size=(n, 3)).astype(np.float32)
    got = np.asarray(
        occ_lib.query_bin_weights(
            words, jnp.asarray(o), jnp.asarray(d), cfg, cfg.num_bins, 2.0, 6.0
        )
    )
    want = query_reference(occ_dense, o, d, cfg, cfg.num_bins, 2.0, 6.0)
    np.testing.assert_array_equal(got, want)


def test_query_out_of_bounds_is_empty_with_fallback():
    cfg = small_cfg()
    words = occ_lib.pack_occupancy(
        jnp.full((16, 16, 16), 1.0), cfg
    )  # fully occupied grid
    # ray entirely outside the AABB: origin far away pointing further away
    o = jnp.array([[100.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    w = occ_lib.query_bin_weights(words, o, d, cfg, cfg.num_bins, 2.0, 6.0)
    # fallback: all probes out of bounds -> uniform ones
    np.testing.assert_array_equal(np.asarray(w), np.ones((1, cfg.num_bins)))


# ------------------------------------------------------------------ sampling


def test_occupancy_samples_land_in_occupied_bins():
    key = jax.random.PRNGKey(0)
    n, b, s = 32, 16, 8
    rng = np.random.default_rng(2)
    weights = (rng.uniform(size=(n, b)) < 0.3).astype(np.float32)
    weights[weights.sum(axis=1) == 0, 0] = 1.0  # ensure each ray has a bin
    o = np.zeros((n, 3), np.float32)
    d = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (n, 1))
    near, far = 2.0, 6.0
    _, ts = occ_lib.occupancy_coarse_samples(
        key, jnp.asarray(o), jnp.asarray(d), jnp.asarray(weights), s, near, far
    )
    ts = np.asarray(ts)[..., 0]
    assert ts.shape == (n, s)
    assert (ts >= near).all() and (ts <= far).all()
    assert (np.diff(ts, axis=1) >= 0).all(), "ts must be sorted"
    width = (far - near) / b
    bins = np.clip(((ts - near) / width).astype(int), 0, b - 1)
    occupied = np.take_along_axis(weights, bins.reshape(n, -1), axis=1)
    assert (occupied > 0).all(), "every sample must land in an occupied bin"


def test_uniform_weights_give_even_stratified_coverage():
    key = jax.random.PRNGKey(3)
    n, b, s = 8, 16, 16
    weights = jnp.ones((n, b))
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    _, ts = occ_lib.occupancy_coarse_samples(key, o, d, weights, s, 2.0, 6.0)
    ts = np.asarray(ts)[..., 0]
    width = 4.0 / b
    bins = np.clip(((ts - 2.0) / width).astype(int), 0, b - 1)
    # S == B with uniform weights: exactly one sample per bin
    for row in bins:
        np.testing.assert_array_equal(np.sort(row), np.arange(b))


def test_all_zero_weights_fall_back_to_uniform():
    key = jax.random.PRNGKey(4)
    n, b, s = 4, 16, 16
    weights = jnp.zeros((n, b))
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    _, ts = occ_lib.occupancy_coarse_samples(key, o, d, weights, s, 2.0, 6.0)
    ts = np.asarray(ts)[..., 0]
    bins = np.clip(((ts - 2.0) / (4.0 / b)).astype(int), 0, b - 1)
    for row in bins:
        np.testing.assert_array_equal(np.sort(row), np.arange(b))


def test_sampler_concentrates_where_occupied():
    """With only bins 4..7 occupied, all samples sit in that t-range."""
    cfg = small_cfg()
    g = cfg.resolution
    # occupy the z-slab that bins 4..7 of a straight -z ray pass through
    o = jnp.array([[0.0, 0.0, 4.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    near, far = 2.0, 6.0
    width = (far - near) / cfg.num_bins
    ema = np.zeros((g, g, g), np.float32)
    for k in range(4, 8):
        t_mid = near + (k + 0.5) * width
        z = 4.0 - t_mid
        zi = int(np.floor((z + cfg.bound) * (g / (2 * cfg.bound))))
        xi = int(np.floor((0.0 + cfg.bound) * (g / (2 * cfg.bound))))
        ema[xi, xi, zi] = 1.0
    words = occ_lib.pack_occupancy(jnp.asarray(ema), cfg)
    sampler = occ_lib.make_occupancy_sampler(words, cfg)
    _, ts = sampler(jax.random.PRNGKey(5), o, d, 8, near, far)
    ts = np.asarray(ts)[..., 0]
    # expected occupied bins from an independent dense-grid derivation (the
    # voxel size 0.4 exceeds the bin width 0.25, so neighbors of bins 4..7
    # sharing a voxel are legitimately occupied too)
    want = query_reference(
        dense_mask(ema, cfg), np.asarray(o), np.asarray(d), cfg,
        cfg.num_bins, near, far,
    )[0]
    occupied_bins = np.nonzero(want)[0]
    assert 4 in occupied_bins and 7 in occupied_bins
    assert occupied_bins.max() - occupied_bins.min() <= 7, "slab stays local"
    bins = np.clip(((ts - near) / width).astype(int), 0, cfg.num_bins - 1)
    assert np.isin(bins, occupied_bins).all()


# ------------------------------------------------------------------- update


def test_update_grid_ema_decays_and_tracks_density():
    cfg = small_cfg()
    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    params = init_nerf_network(jax.random.PRNGKey(0), nerf_cfg)
    ema0 = jnp.full((16, 16, 16), 5.0)
    ema1 = occ_lib.update_grid_ema(
        ema0, params, nerf_cfg.position_dim, nerf_cfg.direction_dim,
        cfg, jax.random.PRNGKey(1),
    )
    assert ema1.shape == (16, 16, 16)
    e0, e1 = np.asarray(ema0), np.asarray(ema1)
    # max(decay * ema, sigma): never below sigma >= 0, never above
    # max(decay * old, actual density); with old=5.0 >> typical init densities
    # most cells should show pure decay
    assert (e1 >= 0).all()
    assert (e1 <= np.maximum(cfg.decay * e0, e1)).all()
    assert np.median(e1) <= cfg.decay * 5.0 + 1e-5


def test_probe_bits_onehot_matches_gather():
    """The MXU one-hot probe lowering must be bit-identical to the gather
    lowering, including over non-64-divisible word counts (padding path)."""
    rng = np.random.default_rng(7)
    for g in (16, 64):  # 128 words (n_hi=2) and 8192 words (n_hi=128)
        n_words = g**3 // 32
        words = jnp.asarray(
            rng.integers(0, 2**32, size=n_words, dtype=np.uint32)
        )
        lin = jnp.asarray(
            rng.integers(0, g**3, size=(257, 13), dtype=np.int32)
        )
        got = occ_lib._probe_bits_onehot(words, lin)
        want = occ_lib._probe_bits_gather(words, lin)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_probe_bits_pallas_matches_gather():
    """The VMEM-resident Pallas probe kernel (interpret mode off-TPU) must be
    bit-identical to the gather lowering, including over word counts needing
    n_hi padding and probe counts needing P_BLK padding."""
    rng = np.random.default_rng(11)
    for g, shape in ((16, (257, 13)), (64, (512, 64)), (32, (33,))):
        n_words = g**3 // 32
        words = jnp.asarray(
            rng.integers(0, 2**32, size=n_words, dtype=np.uint32)
        )
        lin = jnp.asarray(rng.integers(0, g**3, size=shape, dtype=np.int32))
        got = occ_lib._probe_bits_pallas(words, lin)
        want = occ_lib._probe_bits_gather(words, lin)
        assert got.shape == want.shape and got.dtype == want.dtype
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_query_bin_weights_probe_methods_agree():
    cfg = small_cfg(floor=0.25)
    g = cfg.resolution
    rng = np.random.default_rng(5)
    ema = jnp.asarray(rng.uniform(0, 0.03, (g, g, g)).astype(np.float32))
    words = occ_lib.pack_occupancy(ema, cfg)
    o = jnp.asarray(rng.normal(0, 0.5, (33, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(0, 1, (33, 3)).astype(np.float32))
    a = occ_lib.query_bin_weights(words, o, d, cfg, 16, 2.0, 6.0,
                                  probe_method="gather")
    for method in ("onehot", "pallas"):
        b = occ_lib.query_bin_weights(words, o, d, cfg, 16, 2.0, 6.0,
                                      probe_method=method)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_update_grid_ema_grid_source_selects_net():
    """grid_source='coarse' must ignore the fine net's density (the fine net
    hallucinates in never-sampled empty space under concentrated sampling)."""
    cfg_all = {
        src: small_cfg(grid_source=src) for src in ("both", "coarse", "fine")
    }
    params = {"coarse": {"d": 0.5}, "fine": {"d": 10.0}}

    def fake_apply(p, pts, dirs, pd, dd, compute_dtype=None):
        return jnp.full(pts.shape[:-1] + (1,), p["d"]), None

    ema0 = jnp.zeros((16, 16, 16))
    out = {
        src: float(
            occ_lib.update_grid_ema(
                ema0, params, 10, 4, cfg, jax.random.PRNGKey(0),
                mlp_apply=fake_apply,
            ).max()
        )
        for src, cfg in cfg_all.items()
    }
    assert out["coarse"] == 0.5
    assert out["fine"] == 10.0
    assert out["both"] == 10.0  # max over nets


def test_grid_source_validated():
    with pytest.raises(AssertionError):
        small_cfg(grid_source="bogus")


def test_measured_defaults_pinned():
    """The A/B-backed defaults (PERFORMANCE.md round 3): grid EMA fed by the
    coarse net only (+0.9 dB, occ_fraction at true occupancy on the 120k
    object-scene A/B) and the one-hot MXU bin-probe lowering (11.8 vs 13.5
    ms/step, bit-identical). A silent regression of either would look like
    a quality/perf regression long before anyone checked the config."""
    from minimal_nerf_tpu.ops.occupancy import (
        OccupancyConfig,
        resolve_probe_method,
    )
    from minimal_nerf_tpu.training.config import TrainConfig

    assert OccupancyConfig().grid_source == "coarse"
    # "auto" resolves to the measured-fastest lowering per grid size:
    # one-hot at the default 64^3 (and up to ~80^3), gather at big grids
    # whose [P, G^3/2048] one-hot would dominate HBM traffic
    assert OccupancyConfig().probe_method == "auto"
    assert resolve_probe_method(OccupancyConfig()) == "onehot"
    assert resolve_probe_method(OccupancyConfig(resolution=80)) == "onehot"
    assert resolve_probe_method(OccupancyConfig(resolution=128)) == "gather"
    assert TrainConfig(occupancy=True).occupancy_config.grid_source == "coarse"
    assert TrainConfig(occupancy=True).occupancy_config.probe_method == "auto"


# --------------------------------------------------------- render integration


def test_render_rays_with_trivial_occupancy_sampler_shapes():
    """An all-occupied grid's sampler yields a valid hierarchical render."""
    cfg = small_cfg()
    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    params = init_nerf_network(jax.random.PRNGKey(0), nerf_cfg)
    words = occ_lib.pack_occupancy(occ_lib.init_grid(cfg), cfg, force_all=True)
    sampler = occ_lib.make_occupancy_sampler(words, cfg)
    o = jnp.zeros((16, 3))
    d = jax.random.normal(jax.random.PRNGKey(1), (16, 3)) - jnp.array([0, 0, 2.0])
    out = jax.jit(
        lambda p, o_, d_: render_rays(
            p, nerf_cfg, o_, d_, jax.random.PRNGKey(2), coarse_sampler=sampler
        )
    )(params, o, d)
    assert out["fine_rgb_rays"].shape == (16, 3)
    assert np.isfinite(np.asarray(out["fine_rgb_rays"])).all()


# ---------------------------------------------------------------- train step


def _tiny_scene(n_frames=2, size=16):
    from minimal_nerf_tpu.data.synthetic import pack_images

    rng = np.random.default_rng(0)
    images = pack_images(
        rng.integers(0, 256, (n_frames, size, size, 3), dtype=np.uint8)
    )
    poses = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
    poses[:, 2, 3] = 4.0
    return jnp.asarray(images), jnp.asarray(poses)


@pytest.mark.slow
def test_occupancy_train_step_runs_and_is_deterministic():
    from minimal_nerf_tpu.training import TrainConfig, make_train_step
    from minimal_nerf_tpu.training.loop import SceneStatic

    occ_cfg = small_cfg(update_every=2, warmup_steps=3)
    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    train_cfg = TrainConfig(num_rays=32, cropping_epochs=0, precision="fp32",
                            steps_per_epoch=4)
    static = SceneStatic(height=16, width=16, focal=20.0, num_frames=2)
    images, poses = _tiny_scene()

    def run(n_steps):
        step_fn, tx = make_train_step(
            nerf_cfg, train_cfg, static, occupancy_cfg=occ_cfg
        )
        params = init_nerf_network(jax.random.PRNGKey(0), nerf_cfg)
        opt_state = tx.init(params)
        grid = occ_lib.init_grid(occ_cfg)
        losses = []
        for step in range(n_steps):
            params, opt_state, grid, metrics = step_fn(
                params, opt_state, grid, images, poses, step,
                jax.random.PRNGKey(7),
            )
            losses.append(float(metrics["train_loss"]))
            assert 0.0 <= float(metrics["occ_fraction"]) <= 1.0
        return params, grid, losses

    p1, g1, l1 = run(6)
    p2, g2, l2 = run(6)
    assert l1 == l2, "occupancy training must be deterministic"
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert all(np.isfinite(l1))


@pytest.mark.slow
def test_occupancy_multi_step_matches_single_steps():
    from minimal_nerf_tpu.training import TrainConfig
    from minimal_nerf_tpu.training.loop import (
        SceneStatic,
        make_multi_step,
        make_train_step,
    )

    occ_cfg = small_cfg(update_every=2, warmup_steps=2)
    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    train_cfg = TrainConfig(num_rays=32, cropping_epochs=0, precision="fp32",
                            steps_per_epoch=4)
    static = SceneStatic(height=16, width=16, focal=20.0, num_frames=2)
    images, poses = _tiny_scene()
    base_key = jax.random.PRNGKey(11)

    step_fn, tx = make_train_step(nerf_cfg, train_cfg, static, occupancy_cfg=occ_cfg)
    params = init_nerf_network(jax.random.PRNGKey(0), nerf_cfg)
    opt_state = tx.init(params)
    grid = occ_lib.init_grid(occ_cfg)
    for step in range(4):
        params, opt_state, grid, m_single = step_fn(
            params, opt_state, grid, images, poses, step, base_key
        )

    multi_fn, tx2 = make_multi_step(
        nerf_cfg, train_cfg, static, num_inner=4, occupancy_cfg=occ_cfg
    )
    params2 = init_nerf_network(jax.random.PRNGKey(0), nerf_cfg)
    opt2 = tx2.init(params2)
    grid2 = occ_lib.init_grid(occ_cfg)
    params2, opt2, grid2, m_multi = multi_fn(
        params2, opt2, grid2, images, poses, 0, base_key
    )

    np.testing.assert_allclose(
        float(m_multi["train_loss"]), float(m_single["train_loss"]),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(np.asarray(grid), np.asarray(grid2))
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_occupancy_mesh_matches_unsharded():
    from minimal_nerf_tpu.parallel import make_mesh
    from minimal_nerf_tpu.training import TrainConfig, make_train_step
    from minimal_nerf_tpu.training.loop import SceneStatic

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")

    occ_cfg = small_cfg(update_every=2, warmup_steps=2)
    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    train_cfg = TrainConfig(num_rays=32, cropping_epochs=0, precision="fp32",
                            steps_per_epoch=4)
    static = SceneStatic(height=16, width=16, focal=20.0, num_frames=2)
    images, poses = _tiny_scene()
    base_key = jax.random.PRNGKey(13)

    step_0, tx0 = make_train_step(nerf_cfg, train_cfg, static, occupancy_cfg=occ_cfg)
    mesh1 = make_mesh(1)
    step_1, tx1 = make_train_step(
        nerf_cfg, train_cfg, static, mesh=mesh1, occupancy_cfg=occ_cfg
    )
    mesh2 = make_mesh(2)
    step_2, tx2 = make_train_step(
        nerf_cfg, train_cfg, static, mesh=mesh2, occupancy_cfg=occ_cfg
    )

    outs = []
    for step_fn, tx in ((step_0, tx0), (step_1, tx1), (step_2, tx2)):
        params = init_nerf_network(jax.random.PRNGKey(0), nerf_cfg)
        opt_state = tx.init(params)
        grid = occ_lib.init_grid(occ_cfg)
        losses = []
        for step in range(4):
            params, opt_state, grid, metrics = step_fn(
                params, opt_state, grid, images, poses, step, base_key
            )
            losses.append(float(metrics["train_loss"]))
        outs.append((params, grid, losses))

    (p0, g0, l0), (p1, g1, l1), (p2, g2, l2) = outs
    # a 1-device mesh matches no mesh (per-shard fold_in(0) mirrors the key
    # stream); tolerance is ULP-level, not bitwise — the occupancy grid
    # update compiles into differently-fused XLA programs in the two cases
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # 2-way sharding decorrelates per-shard render RNG (params diverge after
    # step 1, so the later grid updates do too) — only statistical agreement
    assert all(np.isfinite(l2))
    assert g2.shape == g0.shape


# -------------------------------------------------------------- trainer e2e


@pytest.mark.slow
def test_trainer_occupancy_end_to_end_and_resume(fixture_scene, tmp_path):
    """Occupancy fit runs, checkpoints carry the grid, resume is exact.

    The resumed run re-executes the SAME compiled program, so bitwise
    equality with the uninterrupted run holds (unlike cross-program
    comparisons, which are only ULP-close).
    """
    from minimal_nerf_tpu.training import (
        TrainConfig,
        Trainer,
        load_model_for_inference,
    )

    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    mk = lambda steps: TrainConfig(
        num_rays=32, max_steps=steps, cropping_epochs=0, log_every=1000,
        check_val_every_n_epoch=10000, ckpt_every_steps=4, precision="fp32",
        occupancy=True, occ_resolution=16, occ_update_every=2,
        occ_warmup_steps=3,
    )
    t_full = Trainer(nerf_cfg, mk(8), fixture_scene, tmp_path, name="occ-full")
    p_full = t_full.fit()
    assert t_full._grid is not None

    t_a = Trainer(nerf_cfg, mk(4), fixture_scene, tmp_path, name="occ-res")
    t_a.fit()
    t_b = Trainer(
        nerf_cfg, mk(8), fixture_scene, tmp_path, name="occ-res",
        resume_ckpt="auto",
    )
    p_res = t_b.fit()
    for a, b in zip(
        jax.tree_util.tree_leaves(p_full), jax.tree_util.tree_leaves(p_res)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(t_full._grid), np.asarray(t_b._grid)
    )

    # inference reload of an occupancy checkpoint (grid rides opt_state slot)
    ckpt = next((tmp_path / "occ-full" / "checkpoints").glob("*.ckpt"))
    params2, cfg2, tcfg2 = load_model_for_inference(ckpt)
    assert tcfg2.occupancy and "coarse" in params2


def test_trainer_occupancy_steps_per_call(fixture_scene, tmp_path):
    """The scan-fused multi-step path carries the grid through boundaries."""
    from minimal_nerf_tpu.training import TrainConfig, Trainer

    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    train_cfg = TrainConfig(
        num_rays=32, max_steps=8, cropping_epochs=0, log_every=4,
        check_val_every_n_epoch=1000, ckpt_every_steps=1000, precision="fp32",
        steps_per_call=4, occupancy=True, occ_resolution=16,
        occ_update_every=2, occ_warmup_steps=2,
    )
    trainer = Trainer(
        nerf_cfg, train_cfg, fixture_scene, tmp_path, name="occ-spc"
    )
    params = trainer.fit()
    assert params is not None and trainer._grid is not None


@pytest.mark.slow
def test_score_uses_checkpoint_grid(fixture_scene, tmp_path):
    """score.py renders occupancy checkpoints with their grid by default.

    The two paths (grid-guided vs --ignore-occupancy uniform sampling) must
    both produce valid scores; they differ only in coarse sample placement.
    """
    import score as score_cli

    from minimal_nerf_tpu.training import Trainer, TrainConfig, load_state_for_inference

    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    train_cfg = TrainConfig(
        num_rays=64, max_steps=6, cropping_epochs=0, log_every=100,
        check_val_every_n_epoch=1000, ckpt_every_steps=100, precision="fp32",
        occupancy=True, occ_resolution=16, occ_update_every=2,
        occ_warmup_steps=2,
    )
    t = Trainer(nerf_cfg, train_cfg, fixture_scene, tmp_path, name="occ-score")
    t.fit()
    ckpt = next((tmp_path / "occ-score" / "checkpoints").glob("*.ckpt"))

    _, _, _, grid, _ = load_state_for_inference(ckpt)
    assert grid is not None and grid.shape == (16, 16, 16)

    psnr_grid, _ = score_cli.calculate_scores(
        str(ckpt), fixture_scene, rays=256, limit=1
    )
    psnr_uni, _ = score_cli.calculate_scores(
        str(ckpt), fixture_scene, rays=256, limit=1, ignore_occupancy=True
    )
    assert np.isfinite(psnr_grid) and np.isfinite(psnr_uni)


# ------------------------------------------------------------ floor / jitter


def test_floor_blends_occupied_and_empty_bins():
    cfg = small_cfg(floor=0.25)
    g = cfg.resolution
    rng = np.random.default_rng(7)
    ema = rng.uniform(0.0, 0.03, size=(g, g, g)).astype(np.float32)
    words = occ_lib.pack_occupancy(jnp.asarray(ema), cfg)
    n = 32
    o = rng.normal(0, 1.5, size=(n, 3)).astype(np.float32)
    d = rng.normal(0, 1.0, size=(n, 3)).astype(np.float32)
    got = np.asarray(
        occ_lib.query_bin_weights(
            words, jnp.asarray(o), jnp.asarray(d), cfg, cfg.num_bins, 2.0, 6.0
        )
    )
    want = query_reference(
        dense_mask(ema, cfg), o, d, cfg, cfg.num_bins, 2.0, 6.0
    )
    np.testing.assert_array_equal(got, want)
    # floor actually present: some weights strictly between 0/fallback and 1
    assert ((got == 0.25).sum() > 0) or (got == 1.0).all()


def test_in_bin_jitter_keeps_ts_sorted_and_contained():
    key = jax.random.PRNGKey(9)
    n, b, s = 16, 16, 32
    rng = np.random.default_rng(8)
    weights = (rng.uniform(size=(n, b)) < 0.3).astype(np.float32)
    weights[weights.sum(axis=1) == 0, 0] = 1.0
    o = np.zeros((n, 3), np.float32)
    d = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (n, 1))
    near, far = 2.0, 6.0
    _, ts = occ_lib.occupancy_coarse_samples(
        key, jnp.asarray(o), jnp.asarray(d), jnp.asarray(weights), s,
        near, far, in_bin_jitter=True,
    )
    ts = np.asarray(ts)[..., 0]
    assert (np.diff(ts, axis=1) >= 0).all(), "ts sorted after jitter"
    width = (far - near) / b
    bins = np.clip(((ts - near) / width).astype(int), 0, b - 1)
    occupied = np.take_along_axis(weights, bins.reshape(n, -1), axis=1)
    assert (occupied > 0).all(), "jittered samples stay in occupied bins"
    # two different keys give different jitter (diversity, unlike the
    # deterministic CDF inverse which only varies through the shared eps)
    _, ts2 = occ_lib.occupancy_coarse_samples(
        jax.random.PRNGKey(10), jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(weights), s, near, far, in_bin_jitter=True,
    )
    assert not np.array_equal(ts, np.asarray(ts2)[..., 0])


# ------------------------------------------------------------------- baking


def test_bake_grid_marks_dense_cells_and_is_decay_free():
    cfg = small_cfg()
    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    params = init_nerf_network(jax.random.PRNGKey(0), nerf_cfg)
    baked = occ_lib.bake_grid(
        params, nerf_cfg.position_dim, nerf_cfg.direction_dim, cfg,
        jax.random.PRNGKey(3), passes=2,
    )
    assert baked.shape == (16, 16, 16)
    b = np.asarray(baked)
    assert (b >= 0).all()
    # pure max over jittered passes: every pass can only raise a cell, so a
    # single-pass bake is a lower bound on the two-pass bake
    one = np.asarray(
        occ_lib.bake_grid(
            params, nerf_cfg.position_dim, nerf_cfg.direction_dim, cfg,
            jax.random.PRNGKey(3), passes=1,
        )
    )
    assert (b >= one - 1e-6).all()


@pytest.mark.slow
def test_score_bake_occupancy_on_uniform_checkpoint(fixture_scene, tmp_path):
    """--bake-occupancy builds a grid for checkpoints trained WITHOUT one."""
    import score as score_cli

    from minimal_nerf_tpu.training import Trainer, TrainConfig

    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    train_cfg = TrainConfig(
        num_rays=64, max_steps=4, cropping_epochs=0, log_every=100,
        check_val_every_n_epoch=1000, ckpt_every_steps=100, precision="fp32",
    )
    t = Trainer(nerf_cfg, train_cfg, fixture_scene, tmp_path, name="bake")
    t.fit()
    ckpt = next((tmp_path / "bake" / "checkpoints").glob("*.ckpt"))

    psnr, ssim = score_cli.calculate_scores(
        str(ckpt), fixture_scene, rays=256, limit=1, bake_occupancy=True,
        coarse=4, fine=4,
    )
    assert np.isfinite(psnr) and psnr > 0


def test_update_grid_ema_non_pow2_resolution():
    # G=20: 8000 cells passes OccupancyConfig (8000 % 32 == 0) but is not
    # divisible by the preferred 512 eval rows — eval_rows must adapt
    cfg = occ_lib.OccupancyConfig(resolution=20)
    nerf_cfg = NeRFConfig(coarse_samples=4, fine_samples=4)
    params = init_nerf_network(jax.random.PRNGKey(0), nerf_cfg)
    ema = occ_lib.update_grid_ema(
        jnp.zeros((20, 20, 20)), params, nerf_cfg.position_dim,
        nerf_cfg.direction_dim, cfg, jax.random.PRNGKey(1),
    )
    assert ema.shape == (20, 20, 20)
    assert np.isfinite(np.asarray(ema)).all()


def test_eval_step_uses_occupancy_sampler():
    from minimal_nerf_tpu.training.config import TrainConfig
    from minimal_nerf_tpu.training.loop import make_eval_step

    cfg = small_cfg()
    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    train_cfg = TrainConfig(precision="fp32")
    params = init_nerf_network(jax.random.PRNGKey(0), nerf_cfg)
    eval_occ = make_eval_step(nerf_cfg, train_cfg, occupancy_cfg=cfg)
    eval_uni = make_eval_step(nerf_cfg, train_cfg)

    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    rgb = jnp.asarray(rng.random((16, 3)).astype(np.float32))
    key = jax.random.PRNGKey(2)

    # a half-occupied grid: losses must be finite and (generically) differ
    # from the uniform-sampled losses because coarse samples move
    ema = jnp.zeros((16, 16, 16)).at[:8].set(1.0)
    words = occ_lib.pack_occupancy(ema, cfg)
    m_occ = eval_occ(params, o, d, rgb, key, words)
    m_uni = eval_uni(params, o, d, rgb, key)
    assert np.isfinite(float(m_occ["val_loss"]))
    assert np.isfinite(float(m_uni["val_loss"]))
    assert float(m_occ["val_loss"]) != float(m_uni["val_loss"])


def test_bake_occupancy_rejects_single_mode_ckpt(tmp_path):
    from minimal_nerf_tpu.inference import build_render_chunk
    from minimal_nerf_tpu.models.mlp import init_nerf_mlp
    from minimal_nerf_tpu.training import checkpoint as ckpt_lib
    from minimal_nerf_tpu.training.config import TrainConfig
    from minimal_nerf_tpu.training.loop import make_optimizer

    params = init_nerf_mlp(jax.random.PRNGKey(0), 10, 4)
    train_cfg = TrainConfig()
    tx = make_optimizer(train_cfg, 100)
    path = tmp_path / "model=s-epoch=0-step=1.ckpt"
    ckpt_lib.save_checkpoint(
        path, params, tx.init(params), 1,
        NeRFConfig().to_dict(), train_cfg.to_dict(), extra={"mode": "single"},
    )
    import pytest

    with pytest.raises(ValueError, match="single"):
        build_render_chunk(str(path), 64, bake_occupancy=True)
