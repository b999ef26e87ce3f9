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
           bake_occupancy: bool = False) -> Path:
    import dataclasses

    from minimal_nerf_tpu import views
    from minimal_nerf_tpu.training.trainer import load_state_for_inference

    epoch_idx = ckpt.find("epoch=")
    epoch = ckpt[epoch_idx: epoch_idx + ckpt[epoch_idx:].find("-")]
    params, nerf_cfg, train_cfg, occ_grid = load_state_for_inference(ckpt)
    if coarse or fine:
        # inference-time sample-count override (see score.py)
        nerf_cfg = dataclasses.replace(
            nerf_cfg,
            coarse_samples=coarse or nerf_cfg.coarse_samples,
            fine_samples=fine or nerf_cfg.fine_samples,
        )
    coarse_sampler = None
    occ_cfg = train_cfg.occupancy_config
    if occ_grid is None and bake_occupancy and not ignore_occupancy:
        # bake a grid from the trained densities (see score.py / bake_grid)
        import jax

        from minimal_nerf_tpu.ops import occupancy as occ_lib

        occ_cfg = occ_cfg or occ_lib.OccupancyConfig()
        occ_grid = occ_lib.bake_grid(
            params, nerf_cfg.position_dim, nerf_cfg.direction_dim,
            occ_cfg, jax.random.PRNGKey(0),
            compute_dtype=train_cfg.compute_dtype,
        )
    if occ_grid is not None and not ignore_occupancy:
        # occupancy-trained models render with their grid (see
        # trainer.load_state_for_inference)
        import jax.numpy as jnp

        from minimal_nerf_tpu.ops import occupancy as occ_lib

        occ_words = occ_lib.pack_occupancy(jnp.asarray(occ_grid), occ_cfg)
        coarse_sampler = occ_lib.make_occupancy_sampler(occ_words, occ_cfg)
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
        # shard each chunk's rays over a ('data',) mesh (same path as
        # score.py --data-parallel)
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
    save_dir.mkdir(parents=True, exist_ok=True)
    return views.generate_360_view_synthesis(
        render_chunk, save_dir, epoch, height=height, width=width,
        chunk=rays, num_poses=num_poses,
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
    args = parser.parse_args(argv)

    return render(args.ckpt, args.save_dir, args.rays, args.num_poses,
                  height=args.height, width=args.width, kernel=args.kernel,
                  data_parallel=args.data_parallel,
                  ignore_occupancy=args.ignore_occupancy,
                  coarse=args.coarse, fine=args.fine,
                  bake_occupancy=args.bake_occupancy)


if __name__ == "__main__":
    main()
