"""Calculate score metrics for NeRF Models (TPU-native CLI).

Same surface as reference ``score.py``:
    python score.py -c CKPT_PATH -r 4096 -b BASE_DIR

Reconstructs every test view and reports average PSNR / SSIM against the
uint8 ground truth using the skimage-compatible metrics in
``minimal_nerf_tpu.ops.image_metrics`` (reference ``score.py:20-41``).
"""

import argparse
from pathlib import Path

import numpy as np


def calculate_scores(ckpt: str, base_dir, rays: int, limit: int = 0,
                     kernel: str = "auto", data_parallel: int = 1,
                     ignore_occupancy: bool = False,
                     coarse: int = 0, fine: int = 0,
                     bake_occupancy: bool = False,
                     frames_per_dispatch: int = 8):
    import jax

    from minimal_nerf_tpu import views
    from minimal_nerf_tpu.data.synthetic import SyntheticScene
    from minimal_nerf_tpu.inference import build_render_chunk
    from minimal_nerf_tpu.ops.image_metrics import (
        peak_signal_noise_ratio,
        structural_similarity,
    )

    render_chunk, _, _ = build_render_chunk(
        ckpt, rays, kernel=kernel, data_parallel=data_parallel,
        ignore_occupancy=ignore_occupancy, coarse=coarse, fine=fine,
        bake_occupancy=bake_occupancy,
    )
    scene = SyntheticScene.load(base_dir, "test")

    n = scene.num_frames if not limit else min(limit, scene.num_frames)
    ssim_sum = 0.0
    psnr_sum = 0.0
    # batched multi-frame sweep (reference score.py:26-37 renders one frame
    # per Python iteration): frames_per_dispatch frames per device dispatch,
    # uint8 device-side, next batch queued before this one is fetched so the
    # host-side SSIM/PSNR below overlaps device rendering
    recon_iter = views.render_poses_batched(
        render_chunk, scene.poses[:n], scene.height, scene.width, scene.focal,
        chunk=rays,
        frame_keys=[jax.random.PRNGKey(idx) for idx in range(n)],
        frames_per_dispatch=frames_per_dispatch, progress=True,
    )
    for idx, recon in enumerate(recon_iter):
        gt_im = scene.images[idx]  # already uint8 RGB
        ssim_sum += structural_similarity(gt_im, recon, multichannel=True)
        psnr_sum += peak_signal_noise_ratio(gt_im, recon)

    psnr = psnr_sum / n
    ssim = ssim_sum / n
    print("==============Calculate Scores==============")
    print(f"average psnr score: {psnr}")
    print(f"average ssim score: {ssim}")
    return psnr, ssim


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Calculate score metrics for NeRF Models."
    )
    parser.add_argument("-c", "--ckpt", type=str, required=True,
                        help="ckpt path for model")
    parser.add_argument("-r", "--rays", type=int, default=4096,
                        help="number of rays per batch")
    parser.add_argument("-b", "--base_dir", type=Path,
                        default=Path("./data/nerf_synthetic/lego/"),
                        help="dataset directory")
    parser.add_argument("--limit", type=int, default=0,
                        help="score only the first N test views (0 = all)")
    parser.add_argument("--kernel", choices=["auto", "xla", "pallas", "fused"],
                        default="auto")
    parser.add_argument("--data-parallel", type=int, default=1,
                        help="shard each ray chunk over this many devices")
    parser.add_argument("--ignore-occupancy", action="store_true",
                        help="render with uniform coarse sampling even if the "
                             "checkpoint carries an occupancy grid (ablation)")
    parser.add_argument("--bake-occupancy", action="store_true",
                        help="bake an occupancy grid from the trained "
                             "densities when the checkpoint has none, so "
                             "--coarse/--fine can be reduced with "
                             "concentrated sampling")
    parser.add_argument("--coarse", type=int, default=0,
                        help="override coarse samples/ray at inference "
                             "(0 = checkpoint value)")
    parser.add_argument("--fine", type=int, default=0,
                        help="override fine samples/ray at inference "
                             "(0 = checkpoint value)")
    parser.add_argument("--frames-per-dispatch", type=int, default=8,
                        help="test frames rendered per device dispatch "
                             "(batched sweep; 1 = frame-at-a-time)")
    args = parser.parse_args(argv)

    return calculate_scores(args.ckpt, args.base_dir, args.rays,
                            limit=args.limit, kernel=args.kernel,
                            data_parallel=args.data_parallel,
                            ignore_occupancy=args.ignore_occupancy,
                            coarse=args.coarse, fine=args.fine,
                            bake_occupancy=args.bake_occupancy,
                            frames_per_dispatch=args.frames_per_dispatch)


if __name__ == "__main__":
    main()
