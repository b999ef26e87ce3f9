"""Training configuration dataclass (single source of truth for hyperparams).

Defaults mirror the reference CLI + LightningModule defaults
(``train_nerf.py:65-83``, ``nerf_model.py:134-143``): 4096 rays/batch, Adam
5e-4 with exponential decay to 5e-5 over 1200 epochs stepped per epoch
(one epoch = one pass over the train frames), validation every 10 epochs,
center-crop warmup for ``cropping_epochs`` epochs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    num_rays: int = 4096
    max_steps: int = 100000
    cropping_epochs: int = 10
    check_val_every_n_epoch: int = 10
    start_lr: float = 5e-4
    end_lr: float = 5e-5
    lr_decay_epochs: int = 1200
    # lower bound on the per-epoch exponential decay (0 = reference parity:
    # ExponentialLR decays without bound, nerf_model.py:134-143). On scenes
    # with few train frames the epoch counter advances steps_per_epoch times
    # faster than the Blender scenes the schedule was tuned for, starving
    # the late run (lr ~1e-8 by step 100k on a 20-frame scene); a floor
    # like 1e-5 keeps the tail trainable.
    lr_floor: float = 0.0
    seed: int = 0
    # "bf16" casts matmul inputs to bfloat16 (fp32 params/accumulation) — the
    # TPU MXU fast path; "fp32" for exact-parity/debug runs.
    precision: str = "bf16"
    log_every: int = 100
    ckpt_every_steps: int = 10000
    # steps per epoch; None -> number of train frames (reference: DataLoader
    # over F frames with batch_size=1 => F steps/epoch, F=100 for Blender).
    steps_per_epoch: Optional[int] = None
    # render the validation recon image only on every Nth validation boundary
    # (1 = reference parity, nerf_model.py:199-203: an image every
    # validation). Val LOSSES still run at every boundary regardless — the
    # image is the expensive part (a full H*W render) and the reference's own
    # semantics only require "a periodic recon image".
    val_render_every: int = 1
    # fuse this many train steps into one lax.scan dispatch (amortizes host
    # dispatch latency; 1 = plain per-step dispatch). Epoch/val boundaries
    # are respected by falling back to single steps near them.
    steps_per_call: int = 1
    # Compute kernel the run trains under ("xla" | "pallas" | "fused";
    # resolved from the CLI's --kernel before construction). Recorded in the
    # checkpoint so score.py/render.py can default to the SAME kernel: the
    # weights adapt to their kernel's bf16 numerics, and rendering a
    # fused-trained model through the XLA path measured several dB lower
    # PSNR on the procedural A/B (PERFORMANCE.md "kernel consistency").
    kernel: str = "auto"
    # PRNG implementation for the training key stream. "threefry2x32" is
    # JAX's default (counter-based; lowers to a slow rolled loop on TPU —
    # profiled at ~14ms of a 70ms step); "rbg" uses the hardware-friendly
    # RBG generator: same statistical quality for sampling jitter, far
    # cheaper on TPU.
    rng_impl: str = "threefry2x32"
    # Occupancy-grid accelerated coarse sampling (opt-in; no reference
    # counterpart — see ops/occupancy.py). OFF by default to preserve the
    # reference's uniform stratified semantics. The remaining occ_* fields
    # mirror ops.occupancy.OccupancyConfig and are inert unless occupancy=True.
    occupancy: bool = False
    occ_resolution: int = 64
    occ_bound: float = 3.2
    occ_threshold: float = 1e-2
    # scene-relative occupancy cutoff component: effective threshold is
    # max(occ_threshold, occ_rel_threshold * mean(ema)). Fixes the long-run
    # occ_fraction creep of a purely absolute cutoff (see
    # ops.occupancy.OccupancyConfig.rel_threshold). 0 disables.
    occ_rel_threshold: float = 1e-2
    occ_decay: float = 0.9
    occ_update_every: int = 16
    occ_warmup_steps: int = 256
    occ_num_bins: int = 64
    occ_floor: float = 0.25
    occ_in_bin_jitter: bool = True
    # which net's density feeds the grid EMA ("both" | "coarse" | "fine").
    # Under grid-concentrated sampling the fine net hallucinates density in
    # never-sampled empty space, so max(coarse, fine) creeps occ_fraction
    # toward uniform; "coarse" holds it at true occupancy and scores +0.9 dB
    # on the 120k object-scene A/B (ops.occupancy.OccupancyConfig.grid_source).
    occ_grid_source: str = "coarse"
    # bin-probe lowering ("auto" | "gather" | "onehot"); bit-identical,
    # pure perf (ops.occupancy.OccupancyConfig.probe_method).
    occ_probe_method: str = "auto"

    @property
    def occupancy_config(self):
        """The ``OccupancyConfig`` this config describes, or None when off."""
        if not self.occupancy:
            return None
        from minimal_nerf_tpu.ops.occupancy import OccupancyConfig

        return OccupancyConfig(
            resolution=self.occ_resolution,
            bound=self.occ_bound,
            threshold=self.occ_threshold,
            rel_threshold=self.occ_rel_threshold,
            decay=self.occ_decay,
            update_every=self.occ_update_every,
            warmup_steps=self.occ_warmup_steps,
            num_bins=self.occ_num_bins,
            floor=self.occ_floor,
            in_bin_jitter=self.occ_in_bin_jitter,
            grid_source=self.occ_grid_source,
            probe_method=self.occ_probe_method,
        )

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TrainConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kept = {k: v for k, v in d.items() if k in known}
        if d.get("occupancy") and "occ_rel_threshold" not in d:
            # checkpoints from before the relative threshold existed trained
            # with the purely absolute cutoff — preserve their packing
            # semantics at inference instead of the new default
            kept["occ_rel_threshold"] = 0.0
        return cls(**kept)

    @property
    def compute_dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if self.precision == "bf16" else None
