"""Train NeRF models (TPU-native CLI).

Same public surface as the reference ``train_nerf.py`` (flags at
``train_nerf.py:62-91``): subcommands ``simple`` / ``single`` / ``full`` with
``-n/-s/-p/-d/-rd/-r/-l`` shared flags and the full-model ``-b/-c/-f/-nr/-fr/
-cr`` flags. TPU additions: ``--precision {bf16,fp32}``, ``--data-parallel N``
(shard the ray batch over an N-device mesh), ``--resume auto``.

Usage examples:
    python train_nerf.py -n test -s 10 simple
    python train_nerf.py -n lego -s 120000 full -b ./data/nerf_synthetic/lego/
    python train_nerf.py -n lego -s 120000 --data-parallel 4 full -b ...
"""

import argparse

from minimal_nerf_tpu.models.nerf import NeRFConfig
from minimal_nerf_tpu.training.config import TrainConfig


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Train a NeRF model")
    subparsers = parser.add_subparsers(dest="type", help="Training different NeRF Versions")
    parser.add_argument("-n", "--name", type=str, required=True,
                        help="name of the model experiment")
    parser.add_argument("-s", "--steps", type=int, default=100000,
                        help="max number of steps")
    parser.add_argument("--gpu", action="store_true",
                        help="accepted for reference-CLI compatibility; "
                             "JAX always uses the available accelerator")
    parser.add_argument("-p", "--position_encoding", type=int, default=10,
                        help="position encoding length")
    parser.add_argument("-d", "--direction_encoding", type=int, default=4,
                        help="direction encoding length")
    parser.add_argument("-rd", "--root_dir", type=str, default="./experiments/",
                        help="directory to save models")
    parser.add_argument("-r", "--rays", type=int, default=4096,
                        help="number of rays per batch")
    parser.add_argument("-l", "--ckpt", type=str, default=None,
                        help="load/resume from checkpoint path, or 'auto' for "
                             "latest in the run dir")
    parser.add_argument("--precision", choices=["bf16", "fp32"], default="bf16",
                        help="matmul compute dtype (params always fp32)")
    parser.add_argument("--data-parallel", type=int, default=0,
                        help="shard the ray batch over this many devices "
                             "(0 = single device, or all devices with "
                             "--multihost)")
    parser.add_argument("--multihost", action="store_true",
                        help="join a multi-process runtime "
                             "(jax.distributed.initialize) before training; "
                             "one process per host, mesh spans every host's "
                             "devices, process 0 owns ckpt/metric writes")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="coordinator host:port for --multihost (omit on "
                             "TPU pods: auto-detected)")
    parser.add_argument("--num-processes", type=int, default=None,
                        help="total process count for --multihost (omit on "
                             "TPU pods)")
    parser.add_argument("--process-id", type=int, default=None,
                        help="this process's index for --multihost (omit on "
                             "TPU pods)")
    parser.add_argument("--kernel", choices=["auto", "xla", "pallas", "fused"],
                        default="auto",
                        help="compute path: plain XLA; 'pallas' = fused MLP "
                             "kernel; 'fused' = fully-fused ray-march kernel "
                             "(MLP + compositing, TPU only); 'auto' = fused "
                             "on TPU, xla elsewhere")
    parser.add_argument("--steps-per-call", type=int, default=None,
                        help="fuse N train steps per dispatch via lax.scan "
                             "(default: 1)")
    parser.add_argument("--log-every", type=int, default=100,
                        help="steps between metric fetches/CSV rows")
    parser.add_argument("--val-render-every", type=int, default=1,
                        help="render the validation recon image only every "
                             "Nth validation boundary (val losses always "
                             "run; 1 = reference behavior, an image per "
                             "validation)")
    parser.add_argument("--wandb", type=str, default=None, metavar="PROJECT",
                        help="mirror scalars/images to this Weights & Biases "
                             "project (the reference always logs to "
                             "project 'NeRF', train_nerf.py:23); CSV/PNG "
                             "logging stays on either way")
    parser.add_argument("--debug-nans", action="store_true",
                        help="enable jax_debug_nans (fail fast on non-finite "
                             "values; disables some optimizations)")
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="write a jax.profiler trace of the whole run to "
                             "DIR (offline parsing recipe in PERFORMANCE.md)")
    parser.add_argument("--seed", type=int, default=0)

    simple_parser = subparsers.add_parser("simple")
    full_parser = subparsers.add_parser("full")
    single_parser = subparsers.add_parser("single")

    full_parser.add_argument("-b", "--base_dir", type=str,
                             default="./data/nerf_synthetic/lego/",
                             help="directory for dataset")
    full_parser.add_argument("-c", "--coarse", type=int, default=None,
                             help="number of coarse samples (default: 64)")
    full_parser.add_argument("-f", "--fine", type=int, default=None,
                             help="number of fine samples (default: 128)")
    full_parser.add_argument("-nr", "--near", type=float, default=2.0,
                             help="near bound for dataset")
    full_parser.add_argument("-fr", "--far", type=float, default=6.0,
                             help="far bound of dataset")
    full_parser.add_argument("-cr", "--cropping_epochs", type=int, default=10,
                             help="num. epochs to crop image for ray sampling.")
    full_parser.add_argument("--fine-sampling", choices=["reference", "linterp"],
                             default="reference",
                             help="in-bin jitter (reference parity) vs linear "
                                  "CDF interpolation (sort-free TPU fast path)")
    full_parser.add_argument("--fast", action="store_true",
                             help="the validated fast recipe in one flag: "
                                  "expands to --occupancy -c 16 -f 48 "
                                  "--steps-per-call 20 (quality-neutral vs "
                                  "the 64+128 production config at ~2.6x "
                                  "throughput — PERFORMANCE.md/CONFIGS.md). "
                                  "Explicitly-passed values win over the "
                                  "preset. Empty-background scenes should "
                                  "add a crop warmup (-cr, reference "
                                  "CONFIGS.md ship recipe); reference-length "
                                  "runs should add --finish-steps (the "
                                  "16+48 budget saturates early — "
                                  "PERFORMANCE.md reference-length A/B)")
    full_parser.add_argument("--finish-steps", type=int, default=0,
                             metavar="N",
                             help="progressive schedule: train the LAST N "
                                  "steps at the production sample budget "
                                  "(--finish-coarse/--finish-fine, default "
                                  "64+128), everything before at the "
                                  "configured budget (e.g. --fast's 16+48). "
                                  "Closes the low-budget quality gap at "
                                  "reference length for a fraction of the "
                                  "uniform cost (PERFORMANCE.md "
                                  "'progressive schedule'); implemented as "
                                  "an in-process resume with a changed "
                                  "budget, so an interrupted run relaunched "
                                  "with -l auto continues correctly")
    full_parser.add_argument("--finish-coarse", type=int, default=64,
                             help="coarse samples for the --finish-steps "
                                  "phase")
    full_parser.add_argument("--finish-fine", type=int, default=128,
                             help="fine samples for the --finish-steps phase")
    full_parser.add_argument("--budget-schedule", type=str, default=None,
                             metavar="C+F:N[,C+F:N...][,C+F]",
                             help="general N-phase sample-budget schedule "
                                  "(--finish-steps is the 2-phase special "
                                  "case): comma-separated phases, each "
                                  "'COARSE+FINE:STEPS'; the last phase may "
                                  "omit ':STEPS' to take the remainder of "
                                  "-s. Example: -s 120000 "
                                  "--budget-schedule 16+48:60000,32+96:"
                                  "40000,64+128 — phase budgets override "
                                  "-c/-f; each phase continues in-memory "
                                  "from the last, and relaunches with "
                                  "-l auto skip completed phases")
    full_parser.add_argument("--finetune-steps", type=int, default=0,
                             metavar="N",
                             help="train exactly N steps past the resumed "
                                  "checkpoint (-l required; -s is derived "
                                  "as ckpt_step + N). Primary use: "
                                  "RE-NUMERICIZING a checkpoint for a "
                                  "different compute kernel — weights adapt "
                                  "to their training kernel's numerics "
                                  "(2-6 dB scoring mismatch, PERFORMANCE.md "
                                  "'Kernel consistency'), and a short "
                                  "finetune under the target kernel "
                                  "(e.g. --kernel xla for CPU inference) "
                                  "recovers it")
    full_parser.add_argument("--lr-floor", type=float, default=0.0,
                             help="lower bound on the per-epoch exponential "
                                  "LR decay (0 = reference parity: the decay "
                                  "is unbounded). Scenes with few train "
                                  "frames advance the epoch-based schedule "
                                  "proportionally faster and starve the "
                                  "late run; ~1e-5 keeps the tail trainable")
    full_parser.add_argument("--occupancy",
                             action=argparse.BooleanOptionalAction,
                             default=None,
                             help="occupancy-grid accelerated coarse sampling "
                                  "(opt-in; concentrates samples in occupied "
                                  "space so -c/-f can be reduced at equal "
                                  "quality — see PERFORMANCE.md). "
                                  "--no-occupancy overrides the --fast "
                                  "preset, like an explicit -c/-f does")
    full_parser.add_argument("--occ-resolution", type=int, default=64,
                             help="occupancy grid cells per axis")
    full_parser.add_argument("--occ-bound", type=float, default=3.2,
                             help="occupancy grid AABB half-extent (world "
                                  "units); content outside it is permanently "
                                  "down-weighted to --occ-floor")
    full_parser.add_argument("--occ-threshold", type=float, default=1e-2,
                             help="absolute density threshold for an "
                                  "occupied cell")
    full_parser.add_argument("--occ-rel-threshold", type=float, default=1e-2,
                             help="scene-relative threshold component: the "
                                  "effective cutoff is max(--occ-threshold, "
                                  "REL * mean(ema)); keeps the cutoff above "
                                  "late-run free-space haze (0 = round-2 "
                                  "absolute-only behavior)")
    full_parser.add_argument("--occ-decay", type=float, default=0.9,
                             help="per-update density EMA decay")
    full_parser.add_argument("--occ-grid-source", default="coarse",
                             choices=("both", "coarse", "fine"),
                             help="which net's density feeds the grid EMA; "
                                  "'coarse' (default) avoids the fine net's "
                                  "hallucinated density in never-sampled "
                                  "empty space (occ_fraction creep; +0.9 dB "
                                  "on the 120k object-scene A/B)")
    full_parser.add_argument("--occ-probe-method", default="auto",
                             choices=("auto", "gather", "onehot", "pallas"),
                             help="lowering of the per-probe grid lookup "
                                  "(bit-identical results): 'onehot' = MXU "
                                  "one-hot matmul (fastest at the default "
                                  "64^3 grid), 'gather' = per-element "
                                  "lookups (wins at large grids), 'pallas' "
                                  "= the onehot resolution VMEM-resident "
                                  "(kernels/occupancy_probe.py); 'auto' "
                                  "picks by grid size")
    full_parser.add_argument("--occ-update-every", type=int, default=16,
                             help="train steps between grid EMA updates")
    full_parser.add_argument("--occ-warmup-steps", type=int, default=256,
                             help="steps with every cell forced occupied")
    full_parser.add_argument("--occ-num-bins", type=int, default=64,
                             help="per-ray occupancy probe bins (the bin "
                                  "query gather is the sampler's main cost; "
                                  "32 halves it at slightly coarser "
                                  "guidance)")
    full_parser.add_argument("--occ-floor", type=float, default=0.25,
                             help="sampling weight of unoccupied in-bounds "
                                  "bins relative to occupied (1.0)")
    full_parser.add_argument("--occ-no-jitter", action="store_true",
                             help="use the deterministic CDF inverse instead "
                                  "of independent in-bin jitter")

    single_parser.add_argument("-b", "--base_dir", type=str, default="./dev_data/",
                               help="directory for dataset")
    single_parser.add_argument("-c", "--samples", type=int, default=128,
                               help="number of samples")

    simple_parser.add_argument("-i", "--im_path", type=str,
                               default="./tests/test_data/grad_lounge.png",
                               help="The image path to use as data")
    return parser


def make_mesh_or_none(n: int, multihost: bool = False):
    if n and n > 0:
        from minimal_nerf_tpu.parallel import make_mesh

        return make_mesh(n)
    if multihost:
        # multi-process runs default to a mesh over ALL global devices —
        # a multihost launch without a mesh would train replicated
        from minimal_nerf_tpu.parallel import make_mesh

        return make_mesh()
    return None


def resolve_kernel(kernel: str) -> str:
    if kernel == "auto":
        import jax

        return "fused" if jax.default_backend() == "tpu" else "xla"
    return kernel


def make_mlp_apply(kernel: str):
    if kernel == "pallas":
        from minimal_nerf_tpu.kernels.raymarch import make_pallas_mlp_apply

        return make_pallas_mlp_apply(differentiable=True)
    return None


def make_render_fn(kernel: str):
    if kernel == "fused":
        from minimal_nerf_tpu.kernels.fused_raymarch import make_fused_render_fn

        return make_fused_render_fn()
    return None


def apply_fast_preset(args, parser_defaults) -> None:
    """Expand ``--fast`` into the validated fast-recipe flags (in place).

    Preset: ``--occupancy -c 16 -f 48 --steps-per-call 20`` — the
    quality-neutral ~2.6x-throughput recipe from PERFORMANCE.md (the
    reference documents its recipes as CONFIGS.md prose, ``CONFIGS.md:9-20``;
    here the headline recipe is one switch). A value the user passed
    explicitly wins over the preset — even one equal to the normal default
    (e.g. ``--fast -c 64``), hence the None parser sentinels.
    """
    if getattr(args, "fast", False):
        preset = {
            "occupancy": True, "coarse": 16, "fine": 48, "steps_per_call": 20,
        }
        for field, value in preset.items():
            if getattr(args, field) is None:
                setattr(args, field, value)
    # fields the user left unset (and the preset didn't fill) get the normal
    # defaults — the parser uses None sentinels so an explicit `-c 64` is
    # distinguishable from an omitted -c (it must beat the --fast preset)
    for field, value in parser_defaults.items():
        if getattr(args, field) is None:
            setattr(args, field, value)


_FAST_PRESET_DEFAULTS = {
    "occupancy": False, "coarse": 64, "fine": 128, "steps_per_call": 1,
}


def parse_budget_schedule(spec: str, total_steps: int):
    """``"C+F:N,...[,C+F]"`` -> ``[(coarse, fine, end_step), ...]``.

    Each phase trains to its cumulative ``end_step``; the last phase may omit
    ``:N`` and takes the remainder of ``total_steps``. The phase ends must
    exactly tile ``[0, total_steps]`` — partial coverage is an error, not a
    silent truncation.
    """
    phases = []
    parts = [p.strip() for p in spec.split(",") if p.strip()]
    if not parts:
        raise SystemExit(f"--budget-schedule: empty schedule {spec!r}")
    end = 0
    for i, part in enumerate(parts):
        budget, sep, n_str = part.partition(":")
        try:
            coarse, fine = (int(x) for x in budget.split("+"))
        except ValueError:
            raise SystemExit(
                f"--budget-schedule: bad phase {part!r} (want COARSE+FINE"
                f"[:STEPS])"
            ) from None
        if sep:
            try:
                n = int(n_str)
            except ValueError:
                raise SystemExit(
                    f"--budget-schedule: bad step count in {part!r}"
                ) from None
        elif i == len(parts) - 1:
            n = total_steps - end
        else:
            raise SystemExit(
                f"--budget-schedule: only the LAST phase may omit ':STEPS' "
                f"(phase {part!r})"
            )
        if n <= 0 or coarse <= 0 or fine < 0:
            raise SystemExit(
                f"--budget-schedule: phase {part!r} resolves to "
                f"{coarse}+{fine}:{n}; needs steps>0, coarse>0, fine>=0"
            )
        end += n
        phases.append((coarse, fine, end))
    if end != total_steps:
        raise SystemExit(
            f"--budget-schedule covers {end} steps but -s is {total_steps}; "
            "phase step counts must sum to -s (omit the last ':STEPS' to "
            "take the remainder)"
        )
    return phases


def resolve_phases(args):
    """The (coarse, fine, end_step) phase list for a full-model run.

    ``--budget-schedule`` is the general form; ``--finish-steps`` is sugar
    for its 2-phase case; neither means a single phase at -c/-f.
    """
    finish = getattr(args, "finish_steps", 0) or 0
    schedule = getattr(args, "budget_schedule", None)
    if schedule and finish:
        raise SystemExit(
            "--finish-steps is the 2-phase shorthand for --budget-schedule; "
            "pass one or the other"
        )
    if schedule:
        return parse_budget_schedule(schedule, args.steps)
    if finish < 0 or finish >= args.steps:
        raise SystemExit(
            f"--finish-steps must be in [0, steps); got {finish} of "
            f"{args.steps}"
        )
    if finish:
        return [
            (args.coarse, args.fine, args.steps - finish),
            (args.finish_coarse, args.finish_fine, args.steps),
        ]
    return [(args.coarse, args.fine, args.steps)]


def apply_finetune_steps(args) -> None:
    """Resolve ``--finetune-steps N`` into ``-s ckpt_step + N`` (in place).

    Reads only the resumed checkpoint's header. Single-phase by definition —
    a finetune is a continuation of an already-scheduled run.
    """
    finetune = getattr(args, "finetune_steps", 0) or 0
    if not finetune:
        return
    if finetune < 0:
        raise SystemExit(f"--finetune-steps must be positive; got {finetune}")
    if getattr(args, "budget_schedule", None) or getattr(args, "finish_steps", 0):
        raise SystemExit(
            "--finetune-steps is a single-phase resume; it cannot combine "
            "with --finish-steps/--budget-schedule"
        )
    if not args.ckpt:
        raise SystemExit(
            "--finetune-steps needs a checkpoint to resume (-l PATH or "
            "-l auto)"
        )
    from pathlib import Path

    from minimal_nerf_tpu.training import checkpoint as ckpt_lib

    ckpt = args.ckpt
    if ckpt == "auto":
        latest = ckpt_lib.latest_checkpoint(
            Path(args.root_dir) / args.name / "checkpoints"
        )
        if latest is None:
            raise SystemExit(
                f"--finetune-steps with -l auto: no checkpoint found under "
                f"{Path(args.root_dir) / args.name / 'checkpoints'}"
            )
        ckpt = str(latest)
    args.ckpt = ckpt
    args.steps = ckpt_lib.read_header(ckpt)["step"] + finetune


def train_full_nerf(args) -> None:
    import dataclasses

    from minimal_nerf_tpu.training.trainer import Trainer

    apply_fast_preset(args, _FAST_PRESET_DEFAULTS)
    apply_finetune_steps(args)
    phases = resolve_phases(args)
    nerf_cfg = NeRFConfig(
        position_dim=args.position_encoding,
        direction_dim=args.direction_encoding,
        coarse_samples=args.coarse,
        fine_samples=args.fine,
        near=args.near,
        far=args.far,
        fine_sampling=args.fine_sampling,
    )
    train_cfg = TrainConfig(
        num_rays=args.rays,
        max_steps=args.steps,
        cropping_epochs=args.cropping_epochs,
        precision=args.precision,
        seed=args.seed,
        steps_per_call=args.steps_per_call,
        log_every=args.log_every,
        val_render_every=args.val_render_every,
        kernel=resolve_kernel(args.kernel),
        occupancy=args.occupancy,
        occ_resolution=args.occ_resolution,
        occ_bound=args.occ_bound,
        occ_threshold=args.occ_threshold,
        occ_rel_threshold=args.occ_rel_threshold,
        occ_decay=args.occ_decay,
        occ_update_every=args.occ_update_every,
        occ_warmup_steps=args.occ_warmup_steps,
        occ_num_bins=args.occ_num_bins,
        occ_floor=args.occ_floor,
        occ_in_bin_jitter=not args.occ_no_jitter,
        occ_grid_source=args.occ_grid_source,
        occ_probe_method=args.occ_probe_method,
        lr_floor=args.lr_floor,
    )
    mesh = make_mesh_or_none(args.data_parallel, args.multihost)
    kernel = resolve_kernel(args.kernel)
    # Progressive schedule: each phase trains to its end_step at its own
    # sample budget (resume-under-changed-sample-budget is the tested
    # mechanism, tests/test_training.py). Phase 1 resumes from -l if given;
    # every later phase continues from the previous phase's IN-MEMORY final
    # state — no filesystem round-trip, so it follows exactly the state the
    # phase ended on (explicit -l resumes included, stale run-dir
    # checkpoints ignored) and works on multihost runs without a shared
    # filesystem (only process 0 writes checkpoint files). fit() is a no-op
    # for phases a relaunch finds already complete.
    trainer = None
    for coarse, fine, end_step in phases:
        nerf_cfg_i = dataclasses.replace(
            nerf_cfg, coarse_samples=coarse, fine_samples=fine
        )
        train_cfg_i = dataclasses.replace(train_cfg, max_steps=end_step)
        if trainer is None:
            trainer = Trainer(
                nerf_cfg_i, train_cfg_i, args.base_dir, args.root_dir,
                name=args.name, resume_ckpt=args.ckpt,
                mesh=mesh,
                mlp_apply=make_mlp_apply(kernel),
                render_fn=make_render_fn(kernel),
                wandb_project=args.wandb,
            )
        else:
            trainer.logger.close()
            trainer = Trainer(
                nerf_cfg_i, train_cfg_i, args.base_dir, args.root_dir,
                name=args.name, initial_state=trainer.final_state,
                mesh=mesh,
                mlp_apply=make_mlp_apply(kernel),
                render_fn=make_render_fn(kernel),
                wandb_project=args.wandb,
            )
        trainer.fit()


def train_single_nerf(args) -> None:
    from minimal_nerf_tpu.training.trainer import Trainer

    if args.steps_per_call is None:
        args.steps_per_call = 1
    nerf_cfg = NeRFConfig(
        position_dim=args.position_encoding,
        direction_dim=args.direction_encoding,
        coarse_samples=args.samples,
    )
    train_cfg = TrainConfig(
        num_rays=args.rays,
        max_steps=args.steps,
        cropping_epochs=0,
        precision=args.precision,
        seed=args.seed,
        steps_per_call=args.steps_per_call,
        log_every=args.log_every,
        val_render_every=args.val_render_every,
        kernel=resolve_kernel(args.kernel),
    )
    trainer = Trainer(
        nerf_cfg, train_cfg, args.base_dir, args.root_dir, name=args.name,
        resume_ckpt=args.ckpt,
        mesh=make_mesh_or_none(args.data_parallel, args.multihost),
        mlp_apply=make_mlp_apply(resolve_kernel(args.kernel)), mode="single",
        wandb_project=args.wandb,
    )
    trainer.fit()


def train_simple_image(args) -> None:
    from minimal_nerf_tpu.training.simple import train_simple_image as run

    run(
        args.im_path, args.root_dir, args.name, args.steps,
        position_dim=args.position_encoding, batch_size=args.rays,
        seed=args.seed,
    )


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if getattr(args, "multihost", False):
        # must run before anything initializes a JAX backend in this process
        from minimal_nerf_tpu.parallel import distributed

        distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    if getattr(args, "debug_nans", False):
        import jax

        jax.config.update("jax_debug_nans", True)
    if getattr(args, "profile", None):
        # whole-run jax.profiler trace; parse offline per PERFORMANCE.md
        import contextlib

        from minimal_nerf_tpu.utils.profiling import trace

        ctx = trace(args.profile)
    else:
        import contextlib

        ctx = contextlib.nullcontext()
    with ctx:
        _dispatch(args)


def _dispatch(args) -> None:
    if args.type == "full":
        train_full_nerf(args)
    elif args.type == "single":
        train_single_nerf(args)
    elif args.type == "simple":
        train_simple_image(args)
    else:
        build_parser().error("choose a subcommand: simple | single | full")


if __name__ == "__main__":
    main()
