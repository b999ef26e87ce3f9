"""Shared checkpoint-to-render-chunk setup for the inference CLIs.

``score.py`` and ``render.py`` need the same pipeline: load a checkpoint,
apply inference-time sample-count overrides, resolve the compute kernel
(defaulting to the kernel the checkpoint TRAINED under — see
``views.resolve_inference_kernel``), attach the occupancy sampler (the
checkpoint's grid, or one baked from the trained densities), and build a
(possibly mesh-sharded) render chunk. One implementation here so fixes
land once.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


def build_render_chunk(
    ckpt: str,
    rays: int,
    kernel: str = "auto",
    data_parallel: int = 1,
    ignore_occupancy: bool = False,
    coarse: int = 0,
    fine: int = 0,
    bake_occupancy: bool = False,
):
    """Load ``ckpt`` and build a ``render_chunk(o, d, key) -> rgb`` callable.

    Returns:
        ``(render_chunk, nerf_cfg, train_cfg)`` — configs reflect any
        ``coarse``/``fine`` overrides.
    """
    import jax

    from minimal_nerf_tpu import views
    from minimal_nerf_tpu.training.trainer import load_state_for_inference

    params, nerf_cfg, train_cfg, occ_grid, ckpt_step = load_state_for_inference(ckpt)
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

        if "coarse" not in params:
            raise ValueError(
                "--bake-occupancy requires a full coarse+fine checkpoint "
                "(this one is a mode='single' coarse-only model)"
            )
        occ_cfg = occ_cfg or occ_lib.OccupancyConfig()
        occ_grid = occ_lib.bake_grid(
            params, nerf_cfg.position_dim, nerf_cfg.direction_dim,
            occ_cfg, jax.random.PRNGKey(0),
            compute_dtype=train_cfg.compute_dtype,
        )
        ckpt_step = occ_cfg.warmup_steps  # baked grid: never warmup-forced
    if occ_grid is not None and not ignore_occupancy:
        # occupancy-trained models render with their grid (the coarse net
        # only trains where the grid samples — see load_state_for_inference).
        # A checkpoint saved inside the occupancy warmup window trained with
        # every cell forced occupied — pack the same way here
        import jax.numpy as jnp

        from minimal_nerf_tpu.ops import occupancy as occ_lib

        occ_words = occ_lib.pack_occupancy(
            jnp.asarray(occ_grid), occ_cfg,
            force_all=ckpt_step < occ_cfg.warmup_steps,
        )
        coarse_sampler = occ_lib.make_occupancy_sampler(occ_words, occ_cfg)

    # "auto" renders through the kernel the checkpoint trained under (the
    # weights adapt to that kernel's numerics)
    kernel = views.resolve_inference_kernel(kernel, train_cfg)
    mlp_apply, render_fn = None, None
    if kernel == "pallas":
        from minimal_nerf_tpu.kernels.raymarch import make_pallas_mlp_apply

        mlp_apply = make_pallas_mlp_apply()
    elif kernel == "fused":
        from minimal_nerf_tpu.kernels.fused_raymarch import make_fused_render_fn

        render_fn = make_fused_render_fn()

    if data_parallel > 1:
        # shard each chunk's rays over a ('data',) mesh — rendering is
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
    return render_chunk, nerf_cfg, train_cfg
