"""End-to-end demo on a self-generated procedural scene (no dataset needed).

Generates an analytic sphere-field scene, trains the full hierarchical NeRF,
renders a 360-degree orbit gif, and scores PSNR/SSIM on held-out test views —
the whole reference workflow (train_nerf.py -> render.py -> score.py) in one
script. Works on CPU (tiny config) or TPU (pass --steps 3000 --size 100).

Usage:
    python examples/demo_procedural.py --out /tmp/nerf_demo --steps 500
"""

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="/tmp/nerf_demo")
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--rays", type=int, default=1024)
    parser.add_argument("--coarse", type=int, default=32)
    parser.add_argument("--fine", type=int, default=32)
    parser.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    parser.add_argument("--kernel", default="auto",
                        choices=["auto", "xla", "pallas", "fused"],
                        help="auto = fused on TPU, xla elsewhere")
    parser.add_argument("--steps-per-call", type=int, default=1,
                        help="fuse N train steps per dispatch (lax.scan)")
    parser.add_argument("--fine-sampling", default="reference",
                        choices=["reference", "linterp"])
    parser.add_argument("--occupancy", action="store_true",
                        help="occupancy-grid accelerated coarse sampling")
    parser.add_argument("--finish-steps", type=int, default=0,
                        help="progressive schedule: last N steps at the "
                             "--finish-coarse/--finish-fine budget")
    parser.add_argument("--finish-coarse", type=int, default=64)
    parser.add_argument("--finish-fine", type=int, default=128)
    parser.add_argument("--lr-floor", type=float, default=0.0,
                        help="lower bound on the per-epoch LR decay "
                             "(0 = reference parity)")
    parser.add_argument("--occ-floor", type=float, default=0.25)
    parser.add_argument("--occ-num-bins", type=int, default=64)
    parser.add_argument("--occ-no-jitter", action="store_true")
    parser.add_argument("--occ-grid-source", default="coarse",
                        choices=("both", "coarse", "fine"))
    parser.add_argument("--name", default="demo",
                        help="run name under --out (for A/B comparisons)")
    parser.add_argument("--scene",
                        choices=["field", "object", "thin", "shell"],
                        default="field",
                        help="occupancy archetype: 'object' = compact "
                             "Blender-like cluster (the occupancy regime), "
                             "'thin' = branching ficus/mic-like, 'shell' = "
                             "hollow ship-like surface")
    parser.add_argument("--cr", type=int, default=0,
                        help="center-crop warmup epochs (the reference's "
                             "remedy for empty-background scenes; one epoch "
                             "= 20 steps here)")
    args = parser.parse_args()

    out = Path(args.out)
    scene_dir = out / "scene"

    from minimal_nerf_tpu.data.procedural import make_procedural_scene, save_scene_tree

    if not (scene_dir / "transforms_train.json").exists():
        print(f"[demo] generating procedural scene at {scene_dir} ...")
        scenes, _ = make_procedural_scene(
            split_frames=(("train", 20), ("val", 2), ("test", 4)),
            height=args.size, width=args.size, scene=args.scene,
        )
        save_scene_tree(scenes, scene_dir)

    import train_nerf

    print(f"[demo] training {args.steps} steps ...")
    argv = [
        "-n", args.name, "-s", str(args.steps), "-r", str(args.rays),
        "-rd", str(out), "--precision", args.precision, "--kernel", args.kernel,
        "--steps-per-call", str(args.steps_per_call),
        "full", "-b", str(scene_dir), "-c", str(args.coarse),
        "-f", str(args.fine), "-cr", str(args.cr),
        "--fine-sampling", args.fine_sampling,
        "--lr-floor", str(args.lr_floor),
    ]
    if args.finish_steps:
        argv += ["--finish-steps", str(args.finish_steps),
                 "--finish-coarse", str(args.finish_coarse),
                 "--finish-fine", str(args.finish_fine)]
    if args.occupancy:
        argv += ["--occupancy", "--occ-floor", str(args.occ_floor),
                 "--occ-num-bins", str(args.occ_num_bins),
                 "--occ-grid-source", args.occ_grid_source]
        if args.occ_no_jitter:
            argv.append("--occ-no-jitter")
    train_nerf.main(argv)

    from minimal_nerf_tpu.training import checkpoint as ckpt_lib

    ckpt = ckpt_lib.latest_checkpoint(out / args.name / "checkpoints")
    print(f"[demo] latest checkpoint: {ckpt}")

    import render as render_cli

    gif = render_cli.render(str(ckpt), out / "recons", rays=args.rays,
                            num_poses=10, height=args.size, width=args.size)
    print(f"[demo] wrote {gif}")

    import score as score_cli

    psnr, ssim = score_cli.calculate_scores(str(ckpt), scene_dir, rays=args.rays)
    print(f"[demo] test PSNR {psnr:.2f} dB, SSIM {ssim:.4f}")


if __name__ == "__main__":
    main()
