"""Renders novel views (360 view) from a NeRF model (TPU-native CLI).

Same surface as reference ``render.py``:
    python render.py -c CKPT_PATH -r 4096 -p 40 -s SAVE_DIR

Parses the ``epoch=`` substring from the checkpoint filename for the gif name
(reference ``render.py:15-16``) and writes ``{SAVE_DIR}/{epoch}-360.gif``.
"""

import argparse
from pathlib import Path


def render(ckpt: str, save_dir: Path, rays: int, num_poses: int,
           height: int = 800, width: int = 800, kernel: str = "auto",
           data_parallel: int = 1, ignore_occupancy: bool = False,
           coarse: int = 0, fine: int = 0,
           bake_occupancy: bool = False,
           frames_per_dispatch: int = 8) -> Path:
    from minimal_nerf_tpu import views
    from minimal_nerf_tpu.inference import build_render_chunk

    epoch_idx = ckpt.find("epoch=")
    epoch = ckpt[epoch_idx: epoch_idx + ckpt[epoch_idx:].find("-")]
    render_chunk, _, _ = build_render_chunk(
        ckpt, rays, kernel=kernel, data_parallel=data_parallel,
        ignore_occupancy=ignore_occupancy, coarse=coarse, fine=fine,
        bake_occupancy=bake_occupancy,
    )
    save_dir.mkdir(parents=True, exist_ok=True)
    return views.generate_360_view_synthesis(
        render_chunk, save_dir, epoch, height=height, width=width,
        chunk=rays, num_poses=num_poses,
        frames_per_dispatch=frames_per_dispatch,
    )


def main(argv=None):
    parser = argparse.ArgumentParser(description="Render a 360 view from a NeRF Model")
    parser.add_argument("-c", "--ckpt", type=str, required=True,
                        help="ckpt path for model")
    parser.add_argument("-r", "--rays", type=int, default=4096,
                        help="number of rays per batch")
    parser.add_argument("-p", "--num_poses", type=int, default=40,
                        help="number of images in gif.")
    parser.add_argument("-s", "--save_dir", type=Path, default=Path("./recons/"),
                        help="where to save the resulting gif")
    parser.add_argument("--height", type=int, default=800)
    parser.add_argument("--width", type=int, default=800)
    parser.add_argument("--kernel", choices=["auto", "xla", "pallas", "fused"],
                        default="auto")
    parser.add_argument("--data-parallel", type=int, default=1,
                        help="shard each ray chunk over this many devices")
    parser.add_argument("--ignore-occupancy", action="store_true",
                        help="render with uniform coarse sampling even if the "
                             "checkpoint carries an occupancy grid (ablation)")
    parser.add_argument("--bake-occupancy", action="store_true",
                        help="bake an occupancy grid from the trained "
                             "densities when the checkpoint has none")
    parser.add_argument("--coarse", type=int, default=0,
                        help="override coarse samples/ray (0 = checkpoint value)")
    parser.add_argument("--fine", type=int, default=0,
                        help="override fine samples/ray (0 = checkpoint value)")
    parser.add_argument("--frames-per-dispatch", type=int, default=8,
                        help="poses rendered per device dispatch "
                             "(batched sweep; 1 = pose-at-a-time)")
    args = parser.parse_args(argv)

    return render(args.ckpt, args.save_dir, args.rays, args.num_poses,
                  height=args.height, width=args.width, kernel=args.kernel,
                  data_parallel=args.data_parallel,
                  ignore_occupancy=args.ignore_occupancy,
                  coarse=args.coarse, fine=args.fine,
                  bake_occupancy=args.bake_occupancy,
                  frames_per_dispatch=args.frames_per_dispatch)


if __name__ == "__main__":
    main()
