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
                     bake_occupancy: bool = False):
    import dataclasses

    import jax

    from minimal_nerf_tpu import views
    from minimal_nerf_tpu.data.synthetic import SyntheticScene
    from minimal_nerf_tpu.ops.image_metrics import (
        peak_signal_noise_ratio,
        structural_similarity,
    )
    from minimal_nerf_tpu.training.trainer import load_state_for_inference

    params, nerf_cfg, train_cfg, occ_grid = load_state_for_inference(ckpt)
    if coarse or fine:
        # inference-time sample-count override: the MLP weights are
        # independent of the per-ray sample counts (shape-static knobs), so
        # renders can trade quality for speed without retraining
        nerf_cfg = dataclasses.replace(
            nerf_cfg,
            coarse_samples=coarse or nerf_cfg.coarse_samples,
            fine_samples=fine or nerf_cfg.fine_samples,
        )
    coarse_sampler = None
    occ_cfg = train_cfg.occupancy_config
    if occ_grid is None and bake_occupancy and not ignore_occupancy:
        # bake a grid from the trained densities so uniform-trained
        # checkpoints can also render with concentrated sampling at reduced
        # --coarse/--fine counts (ops/occupancy.py:bake_grid)
        from minimal_nerf_tpu.ops import occupancy as occ_lib

        occ_cfg = occ_cfg or occ_lib.OccupancyConfig()
        occ_grid = occ_lib.bake_grid(
            params, nerf_cfg.position_dim, nerf_cfg.direction_dim,
            occ_cfg, jax.random.PRNGKey(0),
            compute_dtype=train_cfg.compute_dtype,
        )
    if occ_grid is not None and not ignore_occupancy:
        # occupancy-trained models render with their grid (the coarse net
        # only trains where the grid samples — see load_state_for_inference)
        from minimal_nerf_tpu.ops import occupancy as occ_lib

        occ_words = occ_lib.pack_occupancy(jax.numpy.asarray(occ_grid), occ_cfg)
        coarse_sampler = occ_lib.make_occupancy_sampler(occ_words, occ_cfg)
    scene = SyntheticScene.load(base_dir, "test")
    mlp_apply, render_fn = None, None
    # "auto" renders through the kernel the checkpoint trained under (the
    # weights adapt to that kernel's numerics — see resolve_inference_kernel)
    kernel = views.resolve_inference_kernel(kernel, train_cfg)
    if kernel == "pallas":
        from minimal_nerf_tpu.kernels.raymarch import make_pallas_mlp_apply

        mlp_apply = make_pallas_mlp_apply()
    elif kernel == "fused":
        from minimal_nerf_tpu.kernels.fused_raymarch import make_fused_render_fn

        render_fn = make_fused_render_fn()

    if data_parallel > 1:
        # shard each chunk's rays over a ('data',) mesh — scoring is
        # embarrassingly parallel, params replicated, no collectives needed
        from minimal_nerf_tpu.parallel import make_mesh

        mesh = make_mesh(data_parallel)
        assert rays % mesh.size == 0, (
            f"--rays {rays} must be divisible by --data-parallel {mesh.size}"
        )
        render_chunk_p = views.make_param_render_chunk(
            nerf_cfg, compute_dtype=train_cfg.compute_dtype,
            mlp_apply=mlp_apply, render_fn=render_fn,
            coarse_sampler=coarse_sampler,
        )
        sharded_p = views.make_sharded_render_chunk(render_chunk_p, mesh)

        def render_chunk(o, d, key):
            return sharded_p(params, o, d, key)
    else:
        render_chunk = views.make_fine_render_chunk(
            params, nerf_cfg, compute_dtype=train_cfg.compute_dtype,
            mlp_apply=mlp_apply, render_fn=render_fn,
            coarse_sampler=coarse_sampler,
        )

    n = scene.num_frames if not limit else min(limit, scene.num_frames)
    ssim_sum = 0.0
    psnr_sum = 0.0
    try:
        from tqdm import tqdm

        frame_iter = tqdm(range(n))
    except ImportError:  # pragma: no cover
        frame_iter = range(n)
    for idx in frame_iter:
        gt_im = scene.images[idx]  # already uint8 RGB
        o, d = scene.frame_rays(idx)
        recon = views.view_reconstruction(
            render_chunk, o, d, chunk=rays, key=jax.random.PRNGKey(idx)
        )
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
    args = parser.parse_args(argv)

    return calculate_scores(args.ckpt, args.base_dir, args.rays,
                            limit=args.limit, kernel=args.kernel,
                            data_parallel=args.data_parallel,
                            ignore_occupancy=args.ignore_occupancy,
                            coarse=args.coarse, fine=args.fine,
                            bake_occupancy=args.bake_occupancy)


if __name__ == "__main__":
    main()
