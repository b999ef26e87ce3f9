"""End-to-end CLI tests: train -> checkpoint -> render -> score on the fixture."""

import sys
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import train_nerf  # noqa: E402
import render as render_cli  # noqa: E402
import score as score_cli  # noqa: E402


@pytest.fixture(scope="module")
def trained_run(fixture_scene, tmp_path_factory):
    root = tmp_path_factory.mktemp("runs")
    train_nerf.main(
        [
            "-n", "clitest", "-s", "6", "-r", "64", "-rd", str(root),
            "--precision", "fp32",
            "full", "-b", str(fixture_scene), "-c", "8", "-f", "8", "-cr", "0",
        ]
    )
    ckpts = sorted((root / "clitest" / "checkpoints").glob("*.ckpt"))
    assert ckpts
    return root, ckpts[-1]


def test_train_full_cli_writes_checkpoint(trained_run):
    root, ckpt = trained_run
    assert "epoch=" in ckpt.name and "step=" in ckpt.name
    assert (root / "clitest" / "metrics.csv").exists()


def test_render_cli(trained_run, tmp_path):
    root, ckpt = trained_run
    gif = render_cli.render(
        str(ckpt), tmp_path, rays=256, num_poses=2, height=32, width=32
    )
    assert gif.exists()
    assert gif.name.endswith("-360.gif")
    assert "epoch=" in gif.name


def test_score_cli(trained_run, fixture_scene):
    root, ckpt = trained_run
    psnr, ssim = score_cli.calculate_scores(
        str(ckpt), fixture_scene, rays=256, limit=1
    )
    assert np.isfinite(psnr) and psnr > 0
    assert -1.0 <= ssim <= 1.0


def test_train_single_cli(fixture_scene, tmp_path):
    train_nerf.main(
        [
            "-n", "singletest", "-s", "4", "-r", "64", "-rd", str(tmp_path),
            "--precision", "fp32",
            "single", "-b", str(fixture_scene), "-c", "8",
        ]
    )
    ckpts = list((tmp_path / "singletest" / "checkpoints").glob("*.ckpt"))
    assert ckpts


def test_train_simple_cli(fixture_scene, tmp_path):
    im_path = str(fixture_scene / "train" / "r_0.png")
    train_nerf.main(
        [
            "-n", "simpletest", "-s", "4", "-r", "128", "-rd", str(tmp_path),
            "simple", "-i", im_path,
        ]
    )
    assert (tmp_path / "simpletest" / "metrics.csv").exists()
    # validation reconstruction image written at final step
    assert list((tmp_path / "simpletest" / "images").glob("*.png"))


@pytest.mark.slow
def test_score_cli_data_parallel_matches_single(trained_run, fixture_scene):
    """--data-parallel scoring on the virtual mesh gives the same PSNR/SSIM
    (same render keys per chunk shard modulo fold_in decorrelation, so the
    comparison is statistical: identical to within sampling noise)."""
    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    root, ckpt = trained_run
    psnr1, ssim1 = score_cli.calculate_scores(
        str(ckpt), fixture_scene, rays=256, limit=1
    )
    psnr8, ssim8 = score_cli.calculate_scores(
        str(ckpt), fixture_scene, rays=256, limit=1, data_parallel=8
    )
    assert np.isfinite(psnr8)
    # MC jitter differs across shard keys; scores must agree closely
    assert abs(psnr8 - psnr1) < 1.0, (psnr1, psnr8)
    assert abs(ssim8 - ssim1) < 0.05, (ssim1, ssim8)


def test_render_cli_data_parallel(trained_run, tmp_path):
    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    root, ckpt = trained_run
    gif = render_cli.render(
        str(ckpt), tmp_path, rays=256, num_poses=1, height=32, width=32,
        data_parallel=8,
    )
    assert gif.exists() and gif.name.endswith("-360.gif")


@pytest.mark.slow
def test_train_full_cli_occupancy(fixture_scene, tmp_path):
    """--occupancy trains, logs occ_fraction, and render/score accept the ckpt."""
    train_nerf.main(
        [
            "-n", "occtest", "-s", "6", "-r", "64", "-rd", str(tmp_path),
            "--precision", "fp32",
            "full", "-b", str(fixture_scene), "-c", "8", "-f", "8", "-cr", "0",
            "--occupancy", "--occ-resolution", "16",
            "--occ-update-every", "2", "--occ-warmup-steps", "3",
        ]
    )
    ckpts = sorted((tmp_path / "occtest" / "checkpoints").glob("*.ckpt"))
    assert ckpts
    csv = (tmp_path / "occtest" / "metrics.csv").read_text()
    assert "occ_fraction" in csv
    # occupancy checkpoints load for inference (grid rides the opt_state slot)
    psnr, ssim = score_cli.calculate_scores(
        str(ckpts[-1]), fixture_scene, rays=256, limit=1
    )
    assert np.isfinite(psnr) and psnr > 0


def test_score_and_render_sample_count_overrides(trained_run, fixture_scene, tmp_path):
    """--coarse/--fine inference overrides work without retraining."""
    root, ckpt = trained_run
    psnr, ssim = score_cli.calculate_scores(
        str(ckpt), fixture_scene, rays=256, limit=1, coarse=4, fine=4
    )
    assert np.isfinite(psnr) and psnr > 0
    gif = render_cli.render(
        str(ckpt), tmp_path, rays=256, num_poses=1, height=32, width=32,
        coarse=4, fine=4,
    )
    assert gif.exists()


def test_ckpt_records_training_kernel(trained_run):
    # train_nerf.py resolves --kernel and records it in the checkpoint so
    # inference can default to the same numerics (kernel consistency)
    from minimal_nerf_tpu.training import checkpoint as ckpt_lib
    from minimal_nerf_tpu.training.config import TrainConfig

    _, ckpt = trained_run
    header, _ = ckpt_lib.load_checkpoint(str(ckpt))
    cfg = TrainConfig.from_dict(header["train_config"])
    # CPU test env: auto resolves to xla at train time
    assert cfg.kernel == "xla"


def test_fast_preset_expansion():
    """--fast expands to the validated recipe; explicit flags win."""
    parser = train_nerf.build_parser()
    args = parser.parse_args(["-n", "x", "full", "--fast"])
    train_nerf.apply_fast_preset(args, train_nerf._FAST_PRESET_DEFAULTS)
    assert args.occupancy and args.coarse == 16 and args.fine == 48
    assert args.steps_per_call == 20
    # an explicit -c overrides the preset's coarse count only
    args2 = parser.parse_args(["-n", "x", "full", "--fast", "-c", "32"])
    train_nerf.apply_fast_preset(args2, train_nerf._FAST_PRESET_DEFAULTS)
    assert args2.coarse == 32 and args2.fine == 48 and args2.occupancy
    # an explicit value EQUAL to the normal default still wins over the preset
    args3 = parser.parse_args(
        ["-n", "x", "--steps-per-call", "1", "full", "--fast", "-c", "64"]
    )
    train_nerf.apply_fast_preset(args3, train_nerf._FAST_PRESET_DEFAULTS)
    assert args3.coarse == 64 and args3.fine == 48
    assert args3.steps_per_call == 1 and args3.occupancy
    # without --fast, the None sentinels resolve to the normal defaults
    args4 = parser.parse_args(["-n", "x", "full"])
    train_nerf.apply_fast_preset(args4, train_nerf._FAST_PRESET_DEFAULTS)
    assert args4.coarse == 64 and args4.fine == 128
    assert args4.steps_per_call == 1 and not args4.occupancy


@pytest.mark.slow
def test_train_full_cli_fast_flag(fixture_scene, tmp_path):
    """`full --fast` trains end-to-end (occupancy on, reduced samples)."""
    train_nerf.main(
        [
            "-n", "fasttest", "-s", "4", "-r", "64", "-rd", str(tmp_path),
            "--precision", "fp32",
            # tiny-run override: steps_per_call=2 (explicit wins over the
            # preset's 20, which would overshoot a 4-step fixture run)
            "--steps-per-call", "2",
            "full", "-b", str(fixture_scene), "-cr", "0", "--fast",
            "--occ-resolution", "16",
            "--occ-warmup-steps", "2", "--occ-update-every", "2",
        ]
    )
    ckpts = sorted((tmp_path / "fasttest" / "checkpoints").glob("*.ckpt"))
    assert ckpts
    csv = (tmp_path / "fasttest" / "metrics.csv").read_text()
    assert "occ_fraction" in csv
    from minimal_nerf_tpu.training import checkpoint as ckpt_lib
    from minimal_nerf_tpu.training.config import TrainConfig
    from minimal_nerf_tpu.models.nerf import NeRFConfig

    header, _ = ckpt_lib.load_checkpoint(str(ckpts[-1]))
    ncfg = NeRFConfig.from_dict(header["nerf_config"])
    assert ncfg.coarse_samples == 16 and ncfg.fine_samples == 48
    assert TrainConfig.from_dict(header["train_config"]).occupancy


@pytest.mark.slow
def test_progressive_resume_changes_sample_budget(fixture_scene, tmp_path):
    """A fast-recipe checkpoint resumes under a bigger sample budget (the
    progressive fast-then-finish schedule): params/opt/grid restore across a
    -c/-f change, training continues from the saved step, and the finish
    config is what lands in the new checkpoint."""
    common = [
        "-n", "prog", "-r", "64", "-rd", str(tmp_path),
        "--precision", "fp32", "--steps-per-call", "2",
    ]
    occ = ["--occ-resolution", "16", "--occ-warmup-steps", "2",
           "--occ-update-every", "2"]
    train_nerf.main(
        common + ["-s", "4", "full", "-b", str(fixture_scene), "-cr", "0",
                  "--fast"] + occ
    )
    ck1 = sorted((tmp_path / "prog" / "checkpoints").glob("*.ckpt"))
    assert ck1
    # finish: resume auto, production budget, occupancy still on
    train_nerf.main(
        common + ["-s", "8", "-l", "auto", "full", "-b", str(fixture_scene),
                  "-cr", "0", "--occupancy", "-c", "64", "-f", "128"] + occ
    )
    ck2 = sorted(
        (tmp_path / "prog" / "checkpoints").glob("*.ckpt"),
        key=lambda p: int(p.stem.split("step=")[1]),
    )
    from minimal_nerf_tpu.models.nerf import NeRFConfig
    from minimal_nerf_tpu.training import checkpoint as ckpt_lib

    header, _ = ckpt_lib.load_checkpoint(str(ck2[-1]))
    assert header["step"] == 8
    ncfg = NeRFConfig.from_dict(header["nerf_config"])
    assert ncfg.coarse_samples == 64 and ncfg.fine_samples == 128


@pytest.mark.slow
def test_finish_steps_one_flag_progressive(fixture_scene, tmp_path):
    """--finish-steps runs the fast-then-finish schedule in ONE invocation:
    phase 1 at the configured budget to steps-N, phase 2 resumed at the
    --finish-coarse/--finish-fine budget to steps; a relaunch with -l auto
    finds both phases complete and is a no-op (no mislabeled checkpoint)."""
    from minimal_nerf_tpu.models.nerf import NeRFConfig
    from minimal_nerf_tpu.training import checkpoint as ckpt_lib

    argv = [
        "-n", "prog1", "-s", "8", "-r", "64", "-rd", str(tmp_path),
        "--precision", "fp32", "--steps-per-call", "2",
        "full", "-b", str(fixture_scene), "-cr", "0", "--fast",
        "--finish-steps", "4", "--finish-coarse", "12", "--finish-fine", "12",
        "--occ-resolution", "16", "--occ-warmup-steps", "2",
        "--occ-update-every", "2",
    ]
    train_nerf.main(argv)
    cks = sorted(
        (tmp_path / "prog1" / "checkpoints").glob("*.ckpt"),
        key=lambda p: int(p.stem.split("step=")[1]),
    )
    steps = [int(p.stem.split("step=")[1]) for p in cks]
    assert steps[-1] == 8 and 4 in steps  # phase-1 end + final
    header, _ = ckpt_lib.load_checkpoint(str(cks[-1]))
    ncfg = NeRFConfig.from_dict(header["nerf_config"])
    assert ncfg.coarse_samples == 12 and ncfg.fine_samples == 12
    h4, _ = ckpt_lib.load_checkpoint(str(cks[steps.index(4)]))
    n4 = NeRFConfig.from_dict(h4["nerf_config"])
    assert n4.coarse_samples == 16 and n4.fine_samples == 48  # --fast budget

    # one continuous metrics history: phase 2's logger adopts phase 1's csv
    import csv as csv_mod

    with open(tmp_path / "prog1" / "metrics.csv") as f:
        msteps = {int(r["step"]) for r in csv_mod.DictReader(f)}
    assert {4, 8} <= msteps  # rows from BOTH phases

    # idempotent relaunch: everything already trained -> both phases no-op
    mtimes = {p.name: p.stat().st_mtime_ns for p in cks}
    train_nerf.main(argv[:12] + ["-l", "auto"] + argv[12:])
    cks2 = sorted((tmp_path / "prog1" / "checkpoints").glob("*.ckpt"))
    assert {p.name for p in cks2} == set(mtimes)
    final = max(cks2, key=lambda p: int(p.stem.split("step=")[1]))
    assert final.stat().st_mtime_ns == mtimes[final.name]


def test_finish_steps_explicit_ckpt_past_phase1(fixture_scene, tmp_path):
    """-l <explicit ckpt> already at/past the phase-1 target: phase 1 is a
    no-op that saves nothing, and phase 2 must resume from the EXPLICIT
    checkpoint (the run dir is empty) instead of training from scratch."""
    from minimal_nerf_tpu.training import checkpoint as ckpt_lib

    donor_root = tmp_path / "donor"
    train_nerf.main([
        "-n", "donor", "-s", "6", "-r", "64", "-rd", str(donor_root),
        "--precision", "fp32",
        "full", "-b", str(fixture_scene), "-c", "8", "-f", "8", "-cr", "0",
    ])
    donor_ck = sorted(
        (donor_root / "donor" / "checkpoints").glob("*.ckpt"),
        key=lambda p: int(p.stem.split("step=")[1]),
    )[-1]
    train_nerf.main([
        "-n", "prog2", "-s", "8", "-r", "64", "-rd", str(tmp_path),
        "--precision", "fp32", "-l", str(donor_ck),
        "full", "-b", str(fixture_scene), "-c", "8", "-f", "8", "-cr", "0",
        "--finish-steps", "4", "--finish-coarse", "12", "--finish-fine", "12",
    ])
    cks = sorted(
        (tmp_path / "prog2" / "checkpoints").glob("*.ckpt"),
        key=lambda p: int(p.stem.split("step=")[1]),
    )
    # phase 1 (target step 4) was a no-op given the step-6 donor; phase 2
    # resumed the donor at 6 and finished to 8 — no step<=4 ckpt may exist
    steps = [int(p.stem.split("step=")[1]) for p in cks]
    assert steps and min(steps) > 4 and steps[-1] == 8
    header, _ = ckpt_lib.load_checkpoint(str(cks[-1]))
    assert header["step"] == 8


def test_finish_steps_validation():
    with pytest.raises(SystemExit):
        train_nerf.main([
            "-n", "x", "-s", "10", "full", "--finish-steps", "10",
        ])


def test_finetune_steps_resumes_exactly_n(trained_run, fixture_scene, tmp_path):
    """--finetune-steps N derives -s as ckpt_step + N (the re-numericize
    workflow, VERDICT r3 #8): resume the step-6 donor, train exactly 3 more
    steps, final checkpoint at step 9 (whatever -s says)."""
    from minimal_nerf_tpu.training import checkpoint as ckpt_lib

    _, donor_ck = trained_run
    train_nerf.main([
        "-n", "renum", "-s", "999999", "-r", "64", "-rd", str(tmp_path),
        "--precision", "fp32", "-l", str(donor_ck),
        "full", "-b", str(fixture_scene), "-c", "8", "-f", "8", "-cr", "0",
        "--finetune-steps", "3",
    ])
    cks = sorted(
        (tmp_path / "renum" / "checkpoints").glob("*.ckpt"),
        key=lambda p: int(p.stem.split("step=")[1]),
    )
    assert cks, "finetune run saved no checkpoint"
    header, _ = ckpt_lib.load_checkpoint(str(cks[-1]))
    assert header["step"] == 9  # donor step 6 + 3


def test_finetune_steps_validation():
    for argv in (
        ["-n", "x", "-s", "10", "full", "--finetune-steps", "3"],  # no -l
        ["-n", "x", "-s", "10", "-l", "x.ckpt", "full",
         "--finetune-steps", "3", "--finish-steps", "2"],  # multi-phase
        ["-n", "x", "-s", "10", "-l", "x.ckpt", "full",
         "--finetune-steps", "-1"],  # negative
    ):
        with pytest.raises(SystemExit):
            train_nerf.main(argv)


def test_budget_schedule_parsing():
    """parse_budget_schedule: phase tiling, remainder phase, error cases."""
    parse = train_nerf.parse_budget_schedule
    assert parse("16+48:60,32+96:40,64+128", 120) == [
        (16, 48, 60), (32, 96, 100), (64, 128, 120),
    ]
    assert parse("16+48:100,64+128:20", 120) == [(16, 48, 100), (64, 128, 120)]
    assert parse("64+128", 10) == [(64, 128, 10)]
    assert parse("16+48:60,32+96", 120) == [(16, 48, 60), (32, 96, 120)]
    for bad in (
        "16+48:60,32+96:40",                    # covers 100 of -s 120
        "16+48:130",                            # overshoots
        "16+48:60,64+128:100",                  # sums past -s
        "16+48:120,64+128",                     # remainder phase gets 0 steps
        "16x48:60,64+128",                      # bad budget syntax
        "16+48:sixty,64+128",                   # bad step count
        "16+48:0,64+128",                       # zero-step phase
        "",                                     # empty
    ):
        with pytest.raises(SystemExit):
            parse(bad, 120)
    with pytest.raises(SystemExit):
        # --finish-steps and --budget-schedule are mutually exclusive
        train_nerf.main([
            "-n", "x", "-s", "10", "full", "--finish-steps", "2",
            "--budget-schedule", "8+8:5,12+12",
        ])


@pytest.mark.slow
def test_budget_schedule_three_phase(fixture_scene, tmp_path):
    """--budget-schedule runs an N-phase progressive schedule in ONE
    invocation (VERDICT r3 #5): per-phase sample budgets land in the phase
    checkpoints, metrics history is continuous, and an -l auto relaunch
    finds every phase complete (no-op)."""
    from minimal_nerf_tpu.models.nerf import NeRFConfig
    from minimal_nerf_tpu.training import checkpoint as ckpt_lib

    argv = [
        "-n", "sched3", "-s", "9", "-r", "64", "-rd", str(tmp_path),
        "--precision", "fp32",
        "full", "-b", str(fixture_scene), "-cr", "0",
        "--budget-schedule", "8+8:3,10+10:3,12+12",
    ]
    train_nerf.main(argv)
    cks = sorted(
        (tmp_path / "sched3" / "checkpoints").glob("*.ckpt"),
        key=lambda p: int(p.stem.split("step=")[1]),
    )
    steps = [int(p.stem.split("step=")[1]) for p in cks]
    assert steps[-1] == 9 and {3, 6} <= set(steps)  # each phase end saved
    for step, want in ((3, 8), (6, 10), (9, 12)):
        header, _ = ckpt_lib.load_checkpoint(str(cks[steps.index(step)]))
        ncfg = NeRFConfig.from_dict(header["nerf_config"])
        assert (ncfg.coarse_samples, ncfg.fine_samples) == (want, want)

    import csv as csv_mod

    with open(tmp_path / "sched3" / "metrics.csv") as f:
        msteps = {int(r["step"]) for r in csv_mod.DictReader(f)}
    assert {3, 6, 9} <= msteps  # rows from all three phases

    mtimes = {p.name: p.stat().st_mtime_ns for p in cks}
    train_nerf.main(argv[:8] + ["-l", "auto"] + argv[8:])
    cks2 = sorted((tmp_path / "sched3" / "checkpoints").glob("*.ckpt"))
    assert {p.name for p in cks2} == set(mtimes)
    final = max(cks2, key=lambda p: int(p.stem.split("step=")[1]))
    assert final.stat().st_mtime_ns == mtimes[final.name]


@pytest.mark.slow
def test_val_render_every_skips_images(fixture_scene, tmp_path):
    """val_render_every=N renders the recon image on every Nth validation
    only; val losses still log at every boundary."""
    from minimal_nerf_tpu.models.nerf import NeRFConfig
    from minimal_nerf_tpu.training import Trainer, TrainConfig

    nerf_cfg = NeRFConfig(coarse_samples=8, fine_samples=8)
    mk = lambda n: TrainConfig(
        num_rays=32, max_steps=6, cropping_epochs=0, log_every=100,
        check_val_every_n_epoch=1, ckpt_every_steps=100, precision="fp32",
        val_render_every=n,
    )
    # fixture: 3 train frames => validations at steps 3 and 6
    Trainer(nerf_cfg, mk(1), fixture_scene, tmp_path, name="valall").fit()
    Trainer(nerf_cfg, mk(100), fixture_scene, tmp_path, name="valskip").fit()
    ims_all = list((tmp_path / "valall" / "images").glob("recon-val*.png"))
    ims_skip = list((tmp_path / "valskip" / "images").glob("recon-val*.png"))
    assert len(ims_all) == 2, ims_all
    assert len(ims_skip) == 1, ims_skip  # only the first validation renders
    for name in ("valall", "valskip"):
        csv = (tmp_path / name / "metrics.csv").read_text()
        assert "val_loss" in csv and "val_fine_loss" in csv


def test_kernel_fallback_warns(capsys):
    from minimal_nerf_tpu.training.config import TrainConfig
    from minimal_nerf_tpu.views import resolve_inference_kernel

    fused = TrainConfig(kernel="fused")
    assert resolve_inference_kernel("auto", fused, backend="cpu") == "xla"
    err = capsys.readouterr().err
    assert "DEGRADED" in err and "fused" in err
    # no warning for an xla-trained checkpoint off-TPU
    resolve_inference_kernel("auto", TrainConfig(kernel="xla"), backend="cpu")
    assert "DEGRADED" not in capsys.readouterr().err


def test_resolve_inference_kernel():
    from minimal_nerf_tpu.training.config import TrainConfig
    from minimal_nerf_tpu.views import resolve_inference_kernel

    fused = TrainConfig(kernel="fused")
    # an explicit kernel choice always wins
    assert resolve_inference_kernel("pallas", fused, backend="tpu") == "pallas"
    assert resolve_inference_kernel("xla", fused, backend="tpu") == "xla"
    # auto prefers the kernel the checkpoint trained under on TPU
    assert resolve_inference_kernel("auto", fused, backend="tpu") == "fused"
    assert (
        resolve_inference_kernel("auto", TrainConfig(kernel="xla"), backend="tpu")
        == "xla"
    )
    # legacy checkpoints without a recorded kernel -> backend default
    assert resolve_inference_kernel("auto", TrainConfig(), backend="tpu") == "fused"
    assert resolve_inference_kernel("auto", None, backend="tpu") == "fused"
    # Pallas kernels need a TPU backend: off-TPU auto is always xla
    assert resolve_inference_kernel("auto", fused, backend="cpu") == "xla"
