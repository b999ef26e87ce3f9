"""The training orchestrator: epochs, validation, checkpointing, resume.

Replaces ``pytorch_lightning.Trainer`` (reference ``train_nerf.py:26-34``)
with a plain loop around the jitted train step. Reference semantics kept:

- one epoch = one shuffled pass over the train frames (100 steps for the
  Blender scenes),
- validation every ``check_val_every_n_epoch`` epochs: val losses over every
  val frame's ray batch + one reconstructed val view image
  (``nerf_model.py:171-205``),
- crop warmup for the first ``cropping_epochs`` epochs (``dataloader.py:93-99``),
- checkpoints named ``model={name}-epoch={E}-step={S}.ckpt`` with auto-resume.

TPU specifics: metrics stay on device and are fetched only every
``log_every`` steps (no per-step host sync); params/opt_state are donated.
"""

from __future__ import annotations

import functools
import time
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from minimal_nerf_tpu import views
from minimal_nerf_tpu.data.synthetic import SyntheticScene
from minimal_nerf_tpu.models.mlp import init_nerf_mlp
from minimal_nerf_tpu.models.nerf import NeRFConfig, init_nerf_network, render_single
from minimal_nerf_tpu.training import checkpoint as ckpt_lib
from minimal_nerf_tpu.training.config import TrainConfig
from minimal_nerf_tpu.training.loop import (
    make_train_step,
    nerf_loss,
    scene_static,
    single_nerf_loss,
)
from minimal_nerf_tpu.training.metrics import MetricsLogger


class Trainer:
    """End-to-end NeRF training on one chip or a data-parallel mesh."""

    def __init__(
        self,
        nerf_config: NeRFConfig,
        train_config: TrainConfig,
        base_dir,
        root_dir,
        name: str = "nerf",
        resume_ckpt: Optional[str] = None,
        mesh=None,
        mlp_apply=None,
        render_fn=None,
        logger: Optional[MetricsLogger] = None,
        mode: str = "full",
        wandb_project: Optional[str] = None,
        initial_state=None,
    ):
        """``initial_state``: optional ``(params, opt_state, grid, step)``
        handed over in-memory from a previous Trainer's ``final_state`` (the
        progressive schedule's phase handoff). Takes precedence over
        ``resume_ckpt`` and involves no filesystem read — in a multihost run
        every process holds the same in-memory state, where a
        checkpoint-file handoff would break on hosts without a shared
        filesystem (only process 0 writes checkpoints)."""
        assert mode in ("full", "single"), mode
        self.mode = mode
        self.render_fn = render_fn
        self.nerf_config = nerf_config
        self.train_config = train_config
        self.base_dir = base_dir
        self.name = name
        self.mesh = mesh
        self.mlp_apply = mlp_apply
        self.run_dir = Path(root_dir) / name
        self.ckpt_dir = self.run_dir / "checkpoints"
        # in a multi-process (multihost) run every process executes the same
        # training program (the grad pmean is a cross-host collective), but
        # only process 0 owns host-side IO: run dir, metrics, images, ckpts
        self.is_primary = jax.process_index() == 0
        self._initial_state = initial_state
        if resume_ckpt == "auto":
            # resolve 'auto' NOW (not in init_state): the logger's resume
            # decision below must reflect whether a checkpoint actually
            # exists — '--ckpt auto' on a fresh run must NOT adopt a stale
            # metrics.csv from a previous same-name run
            latest = ckpt_lib.latest_checkpoint(self.ckpt_dir)
            resume_ckpt = str(latest) if latest else None
        if self.is_primary:
            self.ckpt_dir.mkdir(parents=True, exist_ok=True)
            self.logger = logger or MetricsLogger(
                self.run_dir, name=name, wandb_project=wandb_project,
                # adopt an existing metrics.csv only when actually resuming
                # (from disk or an in-memory phase handoff); a fresh run
                # reusing a name starts a clean history
                resume=resume_ckpt is not None or initial_state is not None,
            )
        else:
            from minimal_nerf_tpu.training.metrics import NullLogger

            self.logger = logger or NullLogger()
        self.resume_ckpt = resume_ckpt

        self.train_scene = SyntheticScene.load(base_dir, "train")
        try:
            self.val_scene = SyntheticScene.load(base_dir, "val")
        except FileNotFoundError:
            self.val_scene = None

        self.static = scene_static(self.train_scene)
        self.steps_per_epoch = (
            train_config.steps_per_epoch or self.static.num_frames
        )
        self._occ_cfg = train_config.occupancy_config
        if self._occ_cfg is not None and mode != "full":
            raise ValueError("occupancy acceleration requires mode='full'")
        self._grid = None
        if mode == "full":
            loss_fn = (
                functools.partial(nerf_loss, render_fn=render_fn)
                if render_fn is not None
                else nerf_loss
            )
        else:
            loss_fn = single_nerf_loss
        self.step_fn, self.tx = make_train_step(
            nerf_config, train_config, self.static, mesh=mesh,
            mlp_apply=mlp_apply, loss_fn=loss_fn, occupancy_cfg=self._occ_cfg,
        )
        self.multi_fn = None
        if train_config.steps_per_call > 1:
            from minimal_nerf_tpu.training.loop import make_multi_step

            self.multi_fn, _ = make_multi_step(
                nerf_config, train_config, self.static,
                num_inner=train_config.steps_per_call, mesh=mesh,
                mlp_apply=mlp_apply, loss_fn=loss_fn,
                occupancy_cfg=self._occ_cfg,
            )
        self.base_key = jax.random.key(
            train_config.seed, impl=train_config.rng_impl
        )
        self._val_render_chunk = None
        # both modes validate through ONE batched dispatch over all val
        # frames (built lazily in validate())
        self._batched_eval = None

    # ------------------------------------------------------------------ state

    def init_state(self):
        """Fresh or resumed (params, opt_state, start_step).

        With occupancy acceleration the density-EMA grid is part of the
        training state: it rides the checkpoint inside the ``opt_state``
        slot (``{"opt": ..., "occ_ema": ...}`` — same on-disk format, no new
        fields) and is tracked as ``self._grid``.
        """
        if self._initial_state is not None:
            # in-memory handoff from a previous phase (see __init__): no
            # filesystem involved, identical on every process of a
            # multihost run
            params, opt_state, grid, start_step = self._initial_state
            self._grid = grid
            print(f"[trainer] continuing in-memory at step {start_step}")
            return params, opt_state, start_step
        init_key = jax.random.fold_in(self.base_key, 1)
        params = (
            init_nerf_network(init_key, self.nerf_config)
            if self.mode == "full"
            else init_nerf_mlp(
                init_key,
                self.nerf_config.position_dim,
                self.nerf_config.direction_dim,
            )
        )
        opt_state = self.tx.init(params)
        grid = None
        if self._occ_cfg is not None:
            from minimal_nerf_tpu.ops import occupancy as occ_lib

            grid = occ_lib.init_grid(self._occ_cfg)
        start_step = 0
        # __init__ already resolved the 'auto' sentinel to a concrete path
        # or None (the metrics logger needs the answer at construction time)
        resume = self.resume_ckpt
        if resume:
            header, leaves = ckpt_lib.load_checkpoint(resume)
            if self._occ_cfg is not None:
                params, wrapped = ckpt_lib.restore_state(
                    header, leaves, params, {"opt": opt_state, "occ_ema": grid}
                )
                opt_state, grid = wrapped["opt"], wrapped["occ_ema"]
            else:
                params, opt_state = ckpt_lib.restore_state(
                    header, leaves, params, opt_state
                )
            start_step = header["step"]
            print(f"[trainer] resumed from {resume} at step {start_step}")
        self._grid = grid
        return params, opt_state, start_step

    # ------------------------------------------------------------------- fit

    def fit(self) -> dict:
        """Run training to ``max_steps``. Returns the final params."""
        cfg = self.train_config
        params, opt_state, start_step = self.init_state()
        if jax.process_count() > 1:
            # resume reads each process's LOCAL filesystem; if only some
            # hosts see the checkpoint the processes would silently train
            # from different states (and eventually deadlock a collective)
            from jax.experimental import multihost_utils

            steps = np.asarray(
                multihost_utils.process_allgather(np.int64(start_step))
            ).ravel()
            if len({int(s) for s in steps}) != 1:
                raise RuntimeError(
                    f"multihost resume mismatch: processes restored "
                    f"different steps {sorted({int(s) for s in steps})}; "
                    "make the checkpoint path readable on every host "
                    "(shared filesystem) or pass an explicit --ckpt that "
                    "exists everywhere"
                )
        if start_step >= cfg.max_steps:
            # resumed at/past the target (e.g. phase 1 of an already-finished
            # progressive run, or -s smaller than the checkpoint): nothing to
            # train, and saving here would label the restored state with
            # cfg.max_steps — a lie when start_step is beyond it. This sits
            # AFTER the multihost consistency check so divergent resumes
            # raise there instead of deadlocking a collective with some
            # processes already returned.
            print(
                f"[trainer] resume step {start_step} >= max_steps "
                f"{cfg.max_steps}: nothing to do"
            )
            self.final_state = (params, opt_state, self._grid, start_step)
            return params
        grid = self._grid
        arrays = self.train_scene.device_arrays()
        if self.mesh is not None:
            from minimal_nerf_tpu.parallel import distributed

            arrays = distributed.put_replicated(arrays, self.mesh)
            params = distributed.put_replicated(params, self.mesh)
            opt_state = distributed.put_replicated(opt_state, self.mesh)
            if grid is not None:
                grid = distributed.put_replicated(grid, self.mesh)
            # the base key feeds global-mesh computations; committing it
            # replicated keeps every input of the step on one device set
            # (required once the mesh spans multiple processes)
            self.base_key = distributed.put_replicated_key(
                self.base_key, self.mesh
            )

        self.logger.log_hyperparams(
            {**self.nerf_config.to_dict(), **cfg.to_dict(), "name": self.name}
        )

        # boundaries at which per-step work (logging/val/ckpt) happens; the
        # scan-fused multi-step may only run strictly between them
        def next_boundary(s: int) -> int:
            candidates = [cfg.max_steps]
            for period in (cfg.log_every, self.steps_per_epoch, cfg.ckpt_every_steps):
                if period and period > 0:
                    candidates.append((s // period + 1) * period)
            return min(c for c in candidates if c > s)

        pending_metrics = None
        # session-relative wall clock logged with every row (wall_seconds):
        # makes wall/stall analysis exact instead of reconstructed from
        # per-window rates (experiments/r4/analyze.py). Resumes restart it
        # at 0 — consumers should diff within a session.
        t_fit_start = time.perf_counter()
        t_last = t_fit_start
        steps_since_log = 0
        step = start_step
        while step < cfg.max_steps:
            boundary = next_boundary(step)
            spc = cfg.steps_per_call
            if self.multi_fn is not None and boundary - step >= spc:
                if grid is not None:
                    params, opt_state, grid, metrics = self.multi_fn(
                        params, opt_state, grid,
                        arrays["images"], arrays["poses"], step, self.base_key,
                    )
                else:
                    params, opt_state, metrics = self.multi_fn(
                        params, opt_state, arrays["images"], arrays["poses"],
                        step, self.base_key,
                    )
                advanced = spc
            else:
                if grid is not None:
                    params, opt_state, grid, metrics = self.step_fn(
                        params, opt_state, grid,
                        arrays["images"], arrays["poses"], step, self.base_key,
                    )
                else:
                    params, opt_state, metrics = self.step_fn(
                        params, opt_state, arrays["images"], arrays["poses"],
                        step, self.base_key,
                    )
                advanced = 1
            self._grid = grid
            step += advanced
            pending_metrics = metrics
            steps_since_log += advanced

            if step % cfg.log_every == 0 or step == cfg.max_steps:
                fetched = {
                    k: float(v) for k, v in ckpt_lib.device_fetch_batched(
                        pending_metrics
                    ).items()
                }
                now = time.perf_counter()
                it_s = steps_since_log / (now - t_last)
                fetched["iterations_per_sec"] = it_s
                fetched["rays_per_sec"] = it_s * cfg.num_rays
                # reference key (nerf_model.py:167): seconds per train step
                fetched["train iteration speed"] = 1.0 / it_s
                fetched["wall_seconds"] = now - t_fit_start
                self.logger.log_scalars(step, fetched)
                t_last, steps_since_log = now, 0

            epoch_end = step % self.steps_per_epoch == 0
            epoch = step // self.steps_per_epoch
            if epoch_end and epoch % cfg.check_val_every_n_epoch == 0:
                # time the boundary work: over the axon tunnel, host-side
                # boundary costs (eager dispatches, device->host fetches)
                # can dominate reference-length wall time — keep them
                # observable in metrics.csv
                t0 = time.perf_counter()
                val_scalars = self.validate(params, step, log=False) or {}
                t_val = time.perf_counter() - t0
                t0 = time.perf_counter()
                self.save(params, opt_state, step)
                # ONE metrics.csv row per validation boundary: the val
                # losses and the boundary timings land in the same
                # log_scalars call (advisor r3: two sparsely-populated rows
                # for the same step forced per-step consumers to merge)
                self.logger.log_scalars(step, dict(
                    val_scalars,
                    val_seconds=t_val,
                    ckpt_seconds=time.perf_counter() - t0,
                    wall_seconds=time.perf_counter() - t_fit_start,
                ))
            elif step % cfg.ckpt_every_steps == 0:
                self.save(params, opt_state, step)

        self.save(params, opt_state, cfg.max_steps, blocking=True)
        # in-memory handoff point for a successor phase (progressive
        # schedule): everything the next Trainer needs, no filesystem read
        self.final_state = (params, opt_state, self._grid, cfg.max_steps)
        return params

    # ------------------------------------------------------------ validation

    def validate(self, params, step: int, log: bool = True) -> Optional[dict]:
        """Val losses over every val frame + one reconstructed view image.

        Returns the fetched val-loss scalars (or None without a val split).
        With ``log=False`` the scalars are NOT written to the logger — the
        caller merges them into its own row (fit() combines them with the
        boundary timings so each validation is one metrics.csv row).
        """
        if self.val_scene is None:
            return None
        cfg = self.train_config
        multiproc = self.mesh is not None and jax.process_count() > 1
        arrays = getattr(self, "_val_arrays", None)
        if arrays is None:
            # pack+upload the (immutable) val split once, not per validation
            arrays = self.val_scene.device_arrays()
            if multiproc:
                # validation inputs also feed global-mesh computations;
                # promote the (identical-per-process) values to global arrays
                from minimal_nerf_tpu.parallel import distributed

                arrays = distributed.put_replicated(arrays, self.mesh)
            self._val_arrays = arrays
        occ_ctx = ()
        if self.mode == "full" and self._occ_cfg is not None:
            # evaluate through the SAME grid-guided sampler training uses
            # (uniform val of an occupancy-trained model is a sampling
            # mismatch); the packed table also feeds the val render below.
            # During warmup training forces every cell occupied — validation
            # must match, or warmup-window val losses/renders go through a
            # partially-formed grid the train step never sampled from
            from minimal_nerf_tpu.ops import occupancy as occ_lib

            occ_ctx = (occ_lib.pack_occupancy(
                self._grid, self._occ_cfg,
                force_all=step < self._occ_cfg.warmup_steps,
            ),)
        if self.mode == "full":
            # every val frame in ONE dispatch (losses over all frames was a
            # per-frame Python loop: ~100 dispatches + device_gets per
            # validation boundary, ~40% of reference-length wall time)
            if self._batched_eval is None:
                from minimal_nerf_tpu.training.loop import (
                    make_batched_eval_step,
                    scene_static,
                )

                self._batched_eval = make_batched_eval_step(
                    self.nerf_config, cfg, scene_static(self.val_scene),
                    mesh=self.mesh, mlp_apply=self.mlp_apply,
                    render_fn=self.render_fn, occupancy_cfg=self._occ_cfg,
                )
            m = self._batched_eval(
                params, arrays["images"], arrays["poses"], step,
                self.base_key, *occ_ctx,
            )
            mean = {
                k: float(v)
                for k, v in ckpt_lib.device_fetch_batched(m).items()
            }
        else:
            # same one-dispatch treatment as full mode (the per-frame loop
            # paid one dispatch + device_get per frame — ~20 ms tunnel
            # latency each, VERDICT r3 weak #3); key stream unchanged
            if self._batched_eval is None:
                from minimal_nerf_tpu.training.loop import (
                    make_batched_eval_step_single,
                    scene_static,
                )

                self._batched_eval = make_batched_eval_step_single(
                    self.nerf_config, cfg, scene_static(self.val_scene),
                    mesh=self.mesh, mlp_apply=self.mlp_apply,
                )
            m = self._batched_eval(
                params, arrays["images"], arrays["poses"], step, self.base_key
            )
            mean = {
                k: float(v)
                for k, v in ckpt_lib.device_fetch_batched(m).items()
            }
        if log:
            self.logger.log_scalars(step, mean)

        # reconstruct one random val view (reference nerf_model.py:199-203),
        # every val_render_every-th validation boundary (the render is the
        # expensive half of a validation; losses above run every time). The
        # validation index derives from step so the cadence is resume-stable
        # (an in-memory counter would reset at every restart).
        val_period = self.steps_per_epoch * max(cfg.check_val_every_n_epoch, 1)
        val_index = step // val_period - 1  # first boundary renders
        if val_index % max(cfg.val_render_every, 1) != 0:
            return mean
        im_idx = int(
            jax.random.randint(
                jax.random.fold_in(self.base_key, 20_000_000 + step),
                (), 0, self.val_scene.num_frames,
            )
        )
        o, d = self.val_scene.frame_rays(im_idx)
        if multiproc:
            from minimal_nerf_tpu.parallel import distributed

            o = distributed.put_replicated(o, self.mesh)
            d = distributed.put_replicated(d, self.mesh)
        # params flow through the cached jitted sweep as an argument, so
        # validation renders compile once per run, not once per validation
        if self._val_render_chunk is None:
            if self.mode == "full" and self._occ_cfg is not None:
                # occupancy runs render validation views with the live grid
                # (threaded through the jitted sweep as part of the state)
                self._val_render_chunk = views.make_occ_param_render_chunk(
                    self.nerf_config, self._occ_cfg,
                    compute_dtype=cfg.compute_dtype,
                    mlp_apply=self.mlp_apply, render_fn=self.render_fn,
                )
            elif self.mode == "full":
                self._val_render_chunk = views.make_param_render_chunk(
                    self.nerf_config, compute_dtype=cfg.compute_dtype,
                    mlp_apply=self.mlp_apply, render_fn=self.render_fn,
                )
            else:
                def render_chunk_p(p, o_c, d_c, k):
                    out = render_single(
                        p, self.nerf_config, o_c, d_c, k,
                        compute_dtype=cfg.compute_dtype,
                        mlp_apply=self.mlp_apply,
                    )
                    return out["pred_rgbs"]

                self._val_render_chunk = render_chunk_p
        state = (params, occ_ctx[0]) if occ_ctx else params
        im = views.view_reconstruction_with_params(
            self._val_render_chunk, state, o, d, chunk=cfg.num_rays,
            key=jax.random.fold_in(self.base_key, 30_000_000 + step),
        )
        self.logger.log_image(f"recon-val{im_idx}", im, step=step)
        return mean

    # ----------------------------------------------------------- checkpoints

    def _check_pending_save(self) -> None:
        """Re-raise a failed background checkpoint save at the next boundary.

        Without this, a failing async save (e.g. disk full) was silently
        swallowed until the final blocking save of the run.
        """
        fut = getattr(self, "_pending_save", None)
        if fut is not None and fut.done():
            self._pending_save = None
            fut.result()  # raises if the background save failed

    def save(self, params, opt_state, step: int, blocking: bool = False):
        if not self.is_primary:
            return None
        self._check_pending_save()
        epoch = step // self.steps_per_epoch
        path = self.ckpt_dir / ckpt_lib.checkpoint_name(self.name, epoch, step)
        if getattr(self, "_occ_cfg", None) is not None:
            # the EMA grid rides the opt_state slot (see init_state docstring)
            opt_state = {"opt": opt_state, "occ_ema": self._grid}
        fut = ckpt_lib.save_checkpoint_async(
            path, params, opt_state, step,
            self.nerf_config.to_dict(), self.train_config.to_dict(),
            extra={"mode": self.mode},
        )
        self._pending_save = fut
        if blocking:
            result = fut.result()
            self._pending_save = None
            return result
        return path


def load_model_for_inference(ckpt_path):
    """Rebuild ``(params, NeRFConfig, TrainConfig)`` from a checkpoint file.

    The equivalent of the reference's ``NeRFNetwork.load_from_checkpoint``
    (``render.py:17``, ``score.py:21``) — hyperparams come from the embedded
    header, weights from the saved leaves. Handles both the full hierarchical
    network and coarse-only ``mode="single"`` checkpoints (whose params are a
    single MLP pytree). Use ``load_state_for_inference`` to also get the
    occupancy grid of an occupancy-accelerated run.
    """
    params, nerf_cfg, train_cfg, _, _ = load_state_for_inference(ckpt_path)
    return params, nerf_cfg, train_cfg


def load_state_for_inference(ckpt_path):
    """``load_model_for_inference`` + the occupancy-grid EMA (or None).

    Occupancy-trained models should be RENDERED with their grid too: the
    coarse net trains only where the grid places samples, so uniform-sampled
    inference is a train/test sampling mismatch (measured at -0.5 to -1.8 dB
    on the procedural A/B — see PERFORMANCE.md). ``score.py``/``render.py``
    use the returned grid automatically.

    Returns:
        ``(params, nerf_cfg, train_cfg, grid, step)`` — ``step`` is the save
        step, needed to reproduce warmup-window sampling (a checkpoint saved
        at ``step < occupancy warmup_steps`` trained with every grid cell
        forced occupied; inference must pack the grid the same way).
    """
    header, leaves = ckpt_lib.load_checkpoint(ckpt_path)
    nerf_cfg = NeRFConfig.from_dict(header["nerf_config"])
    train_cfg = TrainConfig.from_dict(header["train_config"])
    mode = (header.get("extra") or {}).get("mode", "full")
    init_key = jax.random.PRNGKey(0)
    if mode == "single":
        params_template = init_nerf_mlp(
            init_key, nerf_cfg.position_dim, nerf_cfg.direction_dim
        )
    else:
        params_template = init_nerf_network(init_key, nerf_cfg)
    # rebuild an opt_state template purely for structural restore
    from minimal_nerf_tpu.training.loop import make_optimizer

    tx = make_optimizer(train_cfg, train_cfg.steps_per_epoch or 100)
    opt_template = tx.init(params_template)
    occ_cfg = train_cfg.occupancy_config
    grid = None
    if occ_cfg is not None:
        # occupancy runs store the EMA grid inside the opt_state slot
        from minimal_nerf_tpu.ops import occupancy as occ_lib

        opt_template = {"opt": opt_template, "occ_ema": occ_lib.init_grid(occ_cfg)}
    params, restored_opt = ckpt_lib.restore_state(
        header, leaves, params_template, opt_template
    )
    if occ_cfg is not None:
        grid = restored_opt["occ_ema"]
    return params, nerf_cfg, train_cfg, grid, int(header["step"])
