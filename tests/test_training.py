"""Training-subsystem tests: LR schedule, checkpoint round-trip, overfit smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minimal_nerf_tpu.models.nerf import NeRFConfig, init_nerf_network
from minimal_nerf_tpu.training import (
    TrainConfig,
    Trainer,
    load_model_for_inference,
    make_lr_schedule,
    make_multi_step,
    make_optimizer,
    make_train_step,
)
from minimal_nerf_tpu.training import checkpoint as ckpt_lib
from minimal_nerf_tpu.training.loop import SceneStatic, scene_static
from minimal_nerf_tpu.data.synthetic import SyntheticScene


def test_lr_schedule_reference_values():
    # reference nerf_model.py:134-143: 5e-4 -> 5e-5 over 1200 epochs, stepped
    # per epoch (staircase), 100 steps/epoch
    cfg = TrainConfig()
    sched = make_lr_schedule(cfg, steps_per_epoch=100)
    assert np.isclose(float(sched(0)), 5e-4)
    assert np.isclose(float(sched(99)), 5e-4)  # still epoch 0
    gamma = (5e-5 / 5e-4) ** (1 / 1200)
    assert np.isclose(float(sched(100)), 5e-4 * gamma, rtol=1e-6)
    assert np.isclose(float(sched(1200 * 100)), 5e-5, rtol=1e-5)
    # keeps decaying past 1200 epochs (no clamp), like torch ExponentialLR
    assert float(sched(2400 * 100)) < 5e-5


def test_lr_floor_bounds_the_decay():
    """--lr-floor clamps the unbounded per-epoch decay from below; 0 (the
    default) preserves exact reference semantics."""
    floored = make_lr_schedule(
        TrainConfig(lr_floor=1e-5), steps_per_epoch=100
    )
    assert np.isclose(float(floored(0)), 5e-4)  # floor inactive early
    assert np.isclose(float(floored(2400 * 100)), 1e-5)  # clamped late
    ref = make_lr_schedule(TrainConfig(), steps_per_epoch=100)
    assert float(ref(2400 * 100)) < 1e-5  # default still unbounded


def test_checkpoint_roundtrip(tmp_path):
    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    train_cfg = TrainConfig(num_rays=32)
    params = init_nerf_network(jax.random.PRNGKey(0), nerf_cfg)
    tx = make_optimizer(train_cfg, 100)
    opt_state = tx.init(params)

    path = tmp_path / ckpt_lib.checkpoint_name("test", 3, 399)
    ckpt_lib.save_checkpoint(
        path, params, opt_state, 399, nerf_cfg.to_dict(), train_cfg.to_dict()
    )
    header, leaves = ckpt_lib.load_checkpoint(path)
    assert header["step"] == 399
    params2_t = init_nerf_network(jax.random.PRNGKey(7), nerf_cfg)
    opt2_t = tx.init(params2_t)
    params2, opt2 = ckpt_lib.restore_state(header, leaves, params2_t, opt2_t)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(opt_state), jax.tree_util.tree_leaves(opt2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_fetch_batched_roundtrip():
    """The single-transfer fetch must reproduce every leaf bitwise across
    mixed dtypes, 0-d leaves, bools, and non-array passthroughs."""
    import jax.numpy as jnp

    tree = {
        "a": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
        "b": {"c": jnp.asarray(3, jnp.int32),
              "d": jnp.asarray([[True, False]])},
        "e": jnp.linspace(0, 1, 7, dtype=jnp.bfloat16),
        "f": jnp.zeros((2, 0, 3), jnp.float32),
        "g": "passthrough",
        "h": jnp.asarray(2.5, jnp.float32),
    }
    out = ckpt_lib.device_fetch_batched(tree)
    assert out["g"] == "passthrough"
    flat_in = jax.tree_util.tree_leaves(
        {k: v for k, v in tree.items() if k != "g"})
    flat_out = jax.tree_util.tree_leaves(
        {k: v for k, v in out.items() if k != "g"})
    for a, b in zip(flat_in, flat_out):
        assert isinstance(b, np.ndarray) or np.isscalar(b)
        assert np.asarray(b).dtype == np.asarray(a).dtype
        assert np.asarray(b).shape == a.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_name_parsing():
    name = ckpt_lib.checkpoint_name("lego", 1089, 108999)
    assert name == "model=lego-epoch=1089-step=108999.ckpt"
    assert ckpt_lib.parse_epoch_step(name) == (1089, 108999)


def test_latest_checkpoint(tmp_path):
    for e, s in [(1, 99), (5, 599), (3, 299)]:
        (tmp_path / ckpt_lib.checkpoint_name("x", e, s)).write_bytes(b"")
    latest = ckpt_lib.latest_checkpoint(tmp_path)
    assert latest is not None and "step=599" in latest.name


def test_load_missing_checkpoint_is_a_clear_error(tmp_path):
    # an empty or wrong -c path must not surface as np.load's
    # IsADirectoryError('.') (hit by score.py -c "" in a run script)
    for bad in ("", str(tmp_path / "nope.ckpt"), str(tmp_path)):
        with pytest.raises(FileNotFoundError, match="checkpoint not found"):
            ckpt_lib.load_checkpoint(bad)
        with pytest.raises(FileNotFoundError, match="checkpoint not found"):
            ckpt_lib.read_header(bad)


@pytest.mark.slow
def test_train_step_descends_loss(fixture_scene):
    scene = SyntheticScene.load(fixture_scene, "train")
    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    # higher LR than production: the point is that gradients flow and the
    # optimizer descends, on a CPU-sized budget
    train_cfg = TrainConfig(
        num_rays=128, cropping_epochs=0, precision="fp32",
        start_lr=2e-3, end_lr=2e-4,
    )
    static = scene_static(scene)
    step_fn, tx = make_train_step(nerf_cfg, train_cfg, static)
    params = init_nerf_network(jax.random.PRNGKey(0), nerf_cfg)
    opt_state = tx.init(params)
    arrays = scene.device_arrays()
    base_key = jax.random.PRNGKey(0)

    losses = []
    for step in range(150):
        params, opt_state, metrics = step_fn(
            params, opt_state, arrays["images"], arrays["poses"], step, base_key
        )
        losses.append(float(metrics["train_loss"]))
    # NeRF starts slow; require a clear (5%) descent over 150 steps
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.95, (
        losses[:10], losses[-10:]
    )


@pytest.mark.slow
def test_multi_step_matches_single_steps(fixture_scene):
    scene = SyntheticScene.load(fixture_scene, "train")
    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    train_cfg = TrainConfig(num_rays=64, cropping_epochs=0, precision="fp32")
    static = scene_static(scene)
    arrays = scene.device_arrays()
    base_key = jax.random.PRNGKey(1)

    step_fn, tx = make_train_step(nerf_cfg, train_cfg, static)
    params = init_nerf_network(jax.random.PRNGKey(0), nerf_cfg)
    opt_state = tx.init(params)
    for step in range(4):
        params, opt_state, _ = step_fn(
            params, opt_state, arrays["images"], arrays["poses"], step, base_key
        )

    multi_fn, tx2 = make_multi_step(nerf_cfg, train_cfg, static, num_inner=4)
    params2 = init_nerf_network(jax.random.PRNGKey(0), nerf_cfg)
    opt_state2 = tx2.init(params2)
    params2, opt_state2, _ = multi_fn(
        params2, opt_state2, arrays["images"], arrays["poses"], 0, base_key
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)


@pytest.mark.slow
def test_initial_state_handoff_on_mesh(fixture_scene, tmp_path):
    """The progressive phase handoff (Trainer(initial_state=...)) on a
    device mesh: phase 2 must accept phase 1's replicated final_state
    (params/opt/grid/step as committed global arrays), re-replicate it
    cleanly, and continue to the new max_steps at a changed sample budget."""
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual devices")
    from minimal_nerf_tpu.parallel import make_mesh

    mesh = make_mesh(4)
    mk = lambda steps, c, f: (
        NeRFConfig(coarse_samples=c, fine_samples=f),
        TrainConfig(
            num_rays=64, max_steps=steps, cropping_epochs=0, log_every=2,
            check_val_every_n_epoch=1000, ckpt_every_steps=1000,
            precision="fp32", occupancy=True, occ_resolution=16,
            occ_warmup_steps=2, occ_update_every=2,
        ),
    )
    n1, c1 = mk(2, 8, 8)
    t1 = Trainer(n1, c1, fixture_scene, tmp_path, name="meshprog", mesh=mesh)
    t1.fit()
    assert t1.final_state[3] == 2
    n2, c2 = mk(4, 12, 12)
    t2 = Trainer(
        n2, c2, fixture_scene, tmp_path, name="meshprog", mesh=mesh,
        initial_state=t1.final_state,
    )
    t2.fit()
    cks = sorted(
        (tmp_path / "meshprog" / "checkpoints").glob("*.ckpt"),
        key=lambda p: int(p.stem.split("step=")[1]),
    )
    assert int(cks[-1].stem.split("step=")[1]) == 4
    header, _ = ckpt_lib.load_checkpoint(str(cks[-1]))
    assert NeRFConfig.from_dict(header["nerf_config"]).coarse_samples == 12


@pytest.mark.slow
def test_trainer_end_to_end(fixture_scene, tmp_path):
    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    train_cfg = TrainConfig(
        num_rays=64,
        max_steps=6,
        cropping_epochs=0,
        log_every=3,
        check_val_every_n_epoch=2,
        ckpt_every_steps=100,
        precision="fp32",
    )
    trainer = Trainer(
        nerf_cfg, train_cfg, fixture_scene, tmp_path, name="smoke"
    )
    params = trainer.fit()
    assert params is not None
    # final checkpoint exists with the naming convention
    ckpts = list((tmp_path / "smoke" / "checkpoints").glob("*.ckpt"))
    assert ckpts, "no checkpoint written"
    assert (tmp_path / "smoke" / "metrics.csv").exists()
    # every row carries the session wall clock, monotonically increasing
    # (exact wall basis for stall/time-to-quality analysis)
    import csv as _csv

    with open(tmp_path / "smoke" / "metrics.csv") as f:
        walls = [float(r["wall_seconds"]) for r in _csv.DictReader(f)
                 if r.get("wall_seconds")]
    assert walls and walls == sorted(walls)
    # validation ran (6 steps / 3 per epoch = 2 epochs; val every 2 epochs)
    images = list((tmp_path / "smoke" / "images").glob("*.png"))
    assert images, "no validation image written"
    # inference reload round-trip
    params2, cfg2, _ = load_model_for_inference(ckpts[0])
    assert cfg2.coarse_samples == 8


def test_trainer_resume(fixture_scene, tmp_path):
    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    mk = lambda steps: TrainConfig(
        num_rays=64, max_steps=steps, cropping_epochs=0, log_every=100,
        check_val_every_n_epoch=1000, ckpt_every_steps=4, precision="fp32",
    )
    t1 = Trainer(nerf_cfg, mk(4), fixture_scene, tmp_path, name="resume")
    t1.fit()
    t2 = Trainer(
        nerf_cfg, mk(8), fixture_scene, tmp_path, name="resume", resume_ckpt="auto"
    )
    params, opt_state, start = t2.init_state()
    assert start == 4


@pytest.mark.slow
def test_trainer_steps_per_call(fixture_scene, tmp_path):
    # chunked multi-step dispatch must produce the same boundaries + ckpts
    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    train_cfg = TrainConfig(
        num_rays=64, max_steps=12, cropping_epochs=0, log_every=6,
        check_val_every_n_epoch=2, ckpt_every_steps=100, precision="fp32",
        steps_per_call=4,
    )
    trainer = Trainer(nerf_cfg, train_cfg, fixture_scene, tmp_path, name="spc")
    trainer.fit()
    ckpts = list((tmp_path / "spc" / "checkpoints").glob("*.ckpt"))
    assert ckpts
    assert (tmp_path / "spc" / "metrics.csv").exists()


@pytest.mark.slow
def test_trainer_steps_per_call_matches_single(fixture_scene, tmp_path):
    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    base = dict(
        num_rays=32, max_steps=8, cropping_epochs=0, log_every=100,
        check_val_every_n_epoch=1000, ckpt_every_steps=1000, precision="fp32",
    )
    t1 = Trainer(nerf_cfg, TrainConfig(**base), fixture_scene, tmp_path, name="a")
    p1 = t1.fit()
    t2 = Trainer(
        nerf_cfg, TrainConfig(**base, steps_per_call=4), fixture_scene,
        tmp_path, name="b",
    )
    p2 = t2.fit()
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)


def test_load_single_mode_checkpoint(fixture_scene, tmp_path):
    # mode="single" checkpoints restore as a single MLP pytree
    nerf_cfg = NeRFConfig(coarse_samples=8)
    train_cfg = TrainConfig(
        num_rays=32, max_steps=2, cropping_epochs=0, log_every=100,
        check_val_every_n_epoch=1000, ckpt_every_steps=100, precision="fp32",
    )
    t = Trainer(nerf_cfg, train_cfg, fixture_scene, tmp_path, name="sload",
                mode="single")
    t.fit()
    ckpt = next((tmp_path / "sload" / "checkpoints").glob("*.ckpt"))
    params, cfg2, _ = load_model_for_inference(ckpt)
    assert "trunk" in params  # single MLP pytree, not {"coarse","fine"}


@pytest.mark.slow
def test_resume_reproduces_uninterrupted_run(fixture_scene, tmp_path):
    # deterministic fold_in(key, step) RNG: save at step 4, resume, and land
    # bitwise-identical to an uninterrupted 8-step run
    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    mk = lambda steps, name: TrainConfig(
        num_rays=32, max_steps=steps, cropping_epochs=0, log_every=1000,
        check_val_every_n_epoch=10000, ckpt_every_steps=4, precision="fp32",
    )
    t_full = Trainer(nerf_cfg, mk(8, "f"), fixture_scene, tmp_path, name="unint")
    p_full = t_full.fit()

    t_a = Trainer(nerf_cfg, mk(4, "a"), fixture_scene, tmp_path, name="resumed")
    t_a.fit()
    t_b = Trainer(
        nerf_cfg, mk(8, "b"), fixture_scene, tmp_path, name="resumed",
        resume_ckpt="auto",
    )
    p_resumed = t_b.fit()

    for a, b in zip(
        jax.tree_util.tree_leaves(p_full), jax.tree_util.tree_leaves(p_resumed)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_epoch_shuffle_visits_each_frame_exactly_once():
    """One epoch = one shuffled exactly-once pass over the train frames.

    Regression for the round-1 advisor finding: the permutation key was
    derived from the per-step key, so frame selection degenerated to iid
    sampling with replacement. The permutation must be stable within an
    epoch (reference DataLoader shuffle=True semantics, dataloader.py:95).
    """
    from minimal_nerf_tpu.data.synthetic import pack_images
    from minimal_nerf_tpu.training.loop import sample_train_batch

    f, h, w = 5, 8, 8
    # frame i is a constant image of value i*40 so sampled rgb identifies it
    images_np = np.stack(
        [np.full((h, w, 3), i * 40, np.uint8) for i in range(f)]
    )
    images = pack_images(images_np)
    poses = jnp.tile(jnp.eye(4), (f, 1, 1))
    static = SceneStatic(height=h, width=w, focal=10.0, num_frames=f)
    base_key = jax.random.PRNGKey(3)

    def frame_at_step(step):
        key = jax.random.fold_in(base_key, step)
        k_batch, _ = jax.random.split(key)
        batch = sample_train_batch(
            k_batch, jnp.int32(step), images, poses, static,
            num_rays=4, steps_per_epoch=f, cropping_epochs=0,
            base_key=base_key,
        )
        vals = np.asarray(batch["rgb"]) * 255.0 / 40.0
        frames = np.rint(vals).astype(int)
        assert (frames == frames.flat[0]).all()  # one frame per step
        return int(frames.flat[0])

    epoch0 = [frame_at_step(s) for s in range(f)]
    epoch1 = [frame_at_step(s) for s in range(f, 2 * f)]
    assert sorted(epoch0) == list(range(f)), epoch0
    assert sorted(epoch1) == list(range(f)), epoch1
    # different epochs reshuffle (5! = 120 orders; equality is a red flag
    # for a key-derivation bug, not bad luck)
    assert epoch0 != epoch1, (epoch0, epoch1)


def test_train_step_metrics_superset_reference_keys():
    """metrics must superset the reference's wandb scalar set for a train step
    (nerf_model.py:105-106,124-125,164-166 + track_grad_norm=2)."""
    from minimal_nerf_tpu.data.synthetic import pack_images

    nerf_cfg = NeRFConfig(coarse_samples=4, fine_samples=4)
    train_cfg = TrainConfig(num_rays=8, cropping_epochs=0, precision="fp32")
    static = SceneStatic(height=8, width=8, focal=10.0, num_frames=2)
    step_fn, tx = make_train_step(nerf_cfg, train_cfg, static)
    params = init_nerf_network(jax.random.PRNGKey(0), nerf_cfg)
    opt_state = tx.init(params)
    images = pack_images(
        np.random.default_rng(0).integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    )
    poses = jnp.tile(jnp.eye(4), (2, 1, 1))
    _, _, metrics = step_fn(
        params, opt_state, images, poses, 0, jax.random.PRNGKey(1)
    )
    expected = {
        "train_loss", "train_coarse_loss", "train_fine_loss",
        "coarse_density_norms", "coarse_density_non_zeros",
        "fine_density_norms", "fine_density_non_zeros",
        "grad_2.0_norm_total", "lr",
    }
    assert expected <= set(metrics), sorted(metrics)
    for k in expected:
        assert np.isfinite(float(metrics[k])), k
    # non-zero counts are whole-batch totals: bounded by rays x samples
    assert 0 <= float(metrics["coarse_density_non_zeros"]) <= 8 * 4
    assert 0 <= float(metrics["fine_density_non_zeros"]) <= 8 * (4 + 4)
    assert float(metrics["grad_2.0_norm_total"]) > 0


def test_metrics_logger_appends_and_widens(tmp_path):
    from minimal_nerf_tpu.training.metrics import MetricsLogger

    lg = MetricsLogger(tmp_path, name="t", echo=False)
    lg.log_scalars(1, {"a": 1.0})
    lg.log_scalars(2, {"a": 2.0})
    size_before = (tmp_path / "metrics.csv").stat().st_size
    lg.log_scalars(3, {"a": 3.0})
    # steady-state logging appends (file strictly grows, no rewrite shrink)
    assert (tmp_path / "metrics.csv").stat().st_size > size_before
    lg.log_scalars(4, {"a": 4.0, "b": 9.0})  # schema widens -> rewrite
    import csv as _csv

    with open(tmp_path / "metrics.csv") as f:
        rows = list(_csv.DictReader(f))
    assert [r["step"] for r in rows] == ["1", "2", "3", "4"]
    assert rows[3]["b"] == "9.0"
    assert rows[0]["b"] == ""  # old rows backfilled empty


def test_async_save_failure_surfaces_on_next_save(tmp_path, monkeypatch):
    from concurrent.futures import ThreadPoolExecutor

    from minimal_nerf_tpu.training import checkpoint as ckpt_lib
    from minimal_nerf_tpu.training.trainer import Trainer

    def boom(*a, **k):
        raise OSError("disk full")

    pool = ThreadPoolExecutor(1)
    monkeypatch.setattr(
        ckpt_lib, "save_checkpoint_async", lambda *a, **k: pool.submit(boom)
    )
    trainer = Trainer.__new__(Trainer)  # skip dataset loading
    trainer.is_primary = True
    trainer.steps_per_epoch = 100
    trainer.ckpt_dir = tmp_path
    trainer.name = "t"
    trainer.nerf_config = NeRFConfig(coarse_samples=4, fine_samples=4)
    trainer.train_config = TrainConfig()
    trainer.mode = "full"
    trainer.save(None, None, 100)  # schedules the failing save
    pool.submit(lambda: None).result()  # ensure the failing task finished
    import pytest

    with pytest.raises(OSError, match="disk full"):
        trainer.save(None, None, 200)


def test_metrics_logger_resume_preserves_history(tmp_path):
    from minimal_nerf_tpu.training.metrics import MetricsLogger

    lg = MetricsLogger(tmp_path, name="t", echo=False)
    lg.log_scalars(10, {"a": 1.0})
    lg2 = MetricsLogger(tmp_path, name="t", echo=False)  # resumed run
    lg2.log_scalars(20, {"a": 2.0, "b": 5.0})  # widens schema too
    import csv as _csv

    with open(tmp_path / "metrics.csv") as f:
        rows = list(_csv.DictReader(f))
    assert [r["step"] for r in rows] == ["10", "20"]
    assert rows[1]["b"] == "5.0"


def test_metrics_logger_mirrors_to_fake_wandb(tmp_path, monkeypatch):
    """When wandb is importable, scalars AND images mirror to it
    (reference train_nerf.py:23, nerf_model.py:203)."""
    import sys
    import types

    calls = {"log": [], "init": []}
    fake = types.ModuleType("wandb")

    class _Run:
        def log(self, data, step=None):
            calls["log"].append((data, step))

    def init(project=None, name=None):
        calls["init"].append((project, name))
        return _Run()

    class Image:
        def __init__(self, arr, caption=None):
            self.arr = np.asarray(arr)
            self.caption = caption

    fake.init = init
    fake.Image = Image
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from minimal_nerf_tpu.training.metrics import MetricsLogger

    lg = MetricsLogger(tmp_path, name="t", echo=False, wandb_project="NeRF")
    assert calls["init"] == [("NeRF", "t")]
    lg.log_scalars(5, {"train_loss": 0.5})
    lg.log_image("recon-val0", np.zeros((4, 4, 3), np.uint8), step=5)
    scalar_calls = [c for c in calls["log"] if "train_loss" in c[0]]
    image_calls = [c for c in calls["log"] if "recon" in c[0]]
    assert scalar_calls == [({"train_loss": 0.5}, 5)]
    assert len(image_calls) == 1 and image_calls[0][1] == 5
    assert image_calls[0][0]["recon"][0].caption == "recon-val0"


def test_metrics_logger_fresh_run_truncates_stale_csv(tmp_path):
    from minimal_nerf_tpu.training.metrics import MetricsLogger

    old = MetricsLogger(tmp_path, echo=False)
    old.log_scalars(1, {"train_loss": 1.0})
    old.log_scalars(2, {"train_loss": 0.5})

    fresh = MetricsLogger(tmp_path, echo=False, resume=False)
    fresh.log_scalars(1, {"train_loss": 9.0})
    import csv as _csv

    with open(tmp_path / "metrics.csv", newline="") as f:
        rows = list(_csv.DictReader(f))
    assert len(rows) == 1 and float(rows[0]["train_loss"]) == 9.0

    resumed = MetricsLogger(tmp_path, echo=False, resume=True)
    resumed.log_scalars(2, {"train_loss": 8.0})
    with open(tmp_path / "metrics.csv", newline="") as f:
        rows = list(_csv.DictReader(f))
    assert [int(r["step"]) for r in rows] == [1, 2]


def test_batched_eval_matches_per_frame_loop(fixture_scene):
    """make_batched_eval_step reproduces the per-frame eval loop exactly
    (same RNG stream per frame, mean over frames)."""
    from minimal_nerf_tpu.training.loop import make_batched_eval_step, make_eval_step

    scene = SyntheticScene.load(fixture_scene, "val")
    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    train_cfg = TrainConfig(num_rays=64, precision="fp32")
    params = init_nerf_network(jax.random.PRNGKey(0), nerf_cfg)
    base_key = jax.random.PRNGKey(42)
    step = 7
    arrays = scene.device_arrays()

    eval_fn = make_eval_step(nerf_cfg, train_cfg)
    losses = []
    for idx in range(scene.num_frames):
        key = jax.random.fold_in(base_key, 10_000_000 + step + idx)
        batch = scene.ray_batch(key, idx, train_cfg.num_rays, arrays=arrays)
        m = eval_fn(
            params, batch["origin"], batch["direc"], batch["rgb"],
            jax.random.fold_in(key, 1),
        )
        losses.append(jax.device_get(m))
    want = {k: float(np.mean([m[k] for m in losses])) for k in losses[0]}

    eval_all = make_batched_eval_step(nerf_cfg, train_cfg, scene_static(scene))
    got = jax.device_get(
        eval_all(params, arrays["images"], arrays["poses"], step, base_key)
    )
    for k, v in want.items():
        np.testing.assert_allclose(float(got[k]), v, rtol=1e-6, err_msg=k)


def test_batched_single_eval_matches_per_frame_loop(fixture_scene):
    """make_batched_eval_step_single reproduces the historical mode='single'
    per-frame validation loop exactly (same RNG stream, mean over frames)."""
    from minimal_nerf_tpu.models.mlp import init_nerf_mlp
    from minimal_nerf_tpu.models.nerf import render_single
    from minimal_nerf_tpu.training.loop import make_batched_eval_step_single

    scene = SyntheticScene.load(fixture_scene, "val")
    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    train_cfg = TrainConfig(num_rays=64, precision="fp32")
    params = init_nerf_mlp(
        jax.random.PRNGKey(0), nerf_cfg.position_dim, nerf_cfg.direction_dim
    )
    base_key = jax.random.PRNGKey(42)
    step = 7
    arrays = scene.device_arrays()

    losses = []
    for idx in range(scene.num_frames):
        key = jax.random.fold_in(base_key, 10_000_000 + step + idx)
        batch = scene.ray_batch(key, idx, train_cfg.num_rays, arrays=arrays)
        out = render_single(
            params, nerf_cfg, batch["origin"], batch["direc"],
            jax.random.fold_in(key, 1),
            compute_dtype=train_cfg.compute_dtype,
        )
        losses.append(float(jnp.mean((out["pred_rgbs"] - batch["rgb"]) ** 2)))
    want = float(np.mean(losses))

    eval_all = make_batched_eval_step_single(
        nerf_cfg, train_cfg, scene_static(scene)
    )
    got = jax.device_get(
        eval_all(params, arrays["images"], arrays["poses"], step, base_key)
    )
    np.testing.assert_allclose(float(got["val_loss"]), want, rtol=1e-6)


@pytest.mark.slow
def test_validation_boundary_is_one_metrics_row(fixture_scene, tmp_path):
    """A validation boundary writes ONE metrics.csv row carrying both the
    val losses and the boundary timings (advisor r3: two sparsely-populated
    rows per boundary forced per-step consumers to merge by step)."""
    import csv as _csv

    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    cfg = TrainConfig(
        num_rays=32, max_steps=3, cropping_epochs=0, log_every=100,
        check_val_every_n_epoch=1, ckpt_every_steps=1000, precision="fp32",
    )
    t = Trainer(nerf_cfg, cfg, fixture_scene, tmp_path, name="onerow")
    t.fit()
    with open(tmp_path / "onerow" / "metrics.csv", newline="") as f:
        rows = list(_csv.DictReader(f))
    val_rows = [r for r in rows if r.get("val_loss")]
    assert val_rows, "no validation rows logged"
    for r in val_rows:
        assert r.get("val_seconds"), r
        assert r.get("ckpt_seconds"), r


@pytest.mark.slow
def test_auto_resume_fresh_run_does_not_adopt_stale_csv(fixture_scene, tmp_path):
    """--ckpt auto with NO checkpoint on disk is a fresh run: it must not
    append to a stale metrics.csv from a previous same-name run."""
    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    cfg = TrainConfig(
        num_rays=32, max_steps=2, cropping_epochs=0, log_every=1,
        check_val_every_n_epoch=1000, ckpt_every_steps=1000, precision="fp32",
    )
    run_dir = tmp_path / "stale"
    run_dir.mkdir()
    (run_dir / "metrics.csv").write_text("step,bogus\n999,1.0\n")
    t = Trainer(
        nerf_cfg, cfg, fixture_scene, tmp_path, name="stale",
        resume_ckpt="auto",
    )
    t.fit()
    import csv as csv_mod

    with open(run_dir / "metrics.csv") as f:
        rows = list(csv_mod.DictReader(f))
    # the stale history is gone: no bogus column, no step-999 row (checking
    # the parsed step column — a raw substring check once false-failed on
    # "999" appearing inside a wall-clock float)
    assert all("bogus" not in r for r in rows)
    assert all(int(r["step"]) <= cfg.max_steps for r in rows)
