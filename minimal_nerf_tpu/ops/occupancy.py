"""Occupancy-grid accelerated sampling (opt-in, OFF by default).

The reference has no acceleration structure — every coarse sample is drawn
uniformly over ``[near, far]`` regardless of where the scene's mass actually
is (``nerf_helpers.py:28-56``). This module adds the standard modern lever
(Instant-NGP-style occupancy grids, see PAPERS.md): a dense ``G^3`` grid of
density EMAs maintained from the live model, thresholded into a bit-packed
occupancy mask that concentrates the coarse samples in occupied space. With
samples restricted to occupied bins, the per-ray sample counts (and therefore
the step FLOPs — the fused pipeline is compute-bound at the matmul roofline,
PERFORMANCE.md) can be cut while holding reconstruction quality.

TPU-first design decisions:

- **Static shapes everywhere**: the sample count per ray stays fixed; the
  grid redistributes *where* the samples land (piecewise-constant inverse
  CDF over the per-ray bin-occupancy weights), not how many there are. No
  dynamic shapes, no ragged compaction — XLA sees one fixed program.
- **Bit-packed grid**: occupancy is ``G^3`` bits packed 32/word
  (``64^3 -> 32 KiB``), so the per-ray bin queries are 4-byte gathers from a
  table small enough to stay cache/VMEM-resident. A measured NEGATIVE result
  (round 3, PERFORMANCE.md "Bin-query layout A/B"): restructuring the grid
  as a ``[G*G, G]`` float32 row-gather table (the layout that makes PIXEL
  gathers ~free in ``data.synthetic``) is 2.3 ms/step SLOWER at production
  shapes — the bin query issues 64x more probes than the pixel gather
  (N*B = 262k/step), so fetching a 256-byte z-row per probe turns 1 MB of
  gather traffic into 67 MB. Per-element word gathers remain the best known
  lowering; ``--occ-num-bins 32`` halves the cost at coarser guidance.
- **In-jit EMA updates**: the grid update (evaluate both MLPs' densities at
  jittered cell centers, ``ema = max(decay * ema, sigma)``) is a
  ``lax.cond`` branch inside the train step, so scan-fused multi-step
  dispatches keep working and resume stays bitwise deterministic.
- **All-empty fallback**: rays whose 64 bin probes see no occupied voxel
  fall back to uniform weights — never a NaN, never a wasted ray.

The grid guides only the *coarse* sampler; fine sampling (inverse CDF of the
coarse weights) and all rendering math keep reference semantics
(``nerf_helpers.py:106-156``). Inference paths never require a grid.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from minimal_nerf_tpu.ops.rendering import _select_bins

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class OccupancyConfig:
    """Occupancy-grid hyperparameters.

    Attributes:
        resolution: grid cells per axis (``G``); ``G^3`` must be divisible
            by 32 for bit packing.
        bound: grid AABB is ``[-bound, bound]^3``. Default covers the
            synthetic scenes' content (the reference normalizes coordinates
            by pi for an assumed ~[-3, 3] scene bound, ``nerf_model.py:35-54``)
            with margin for ray segments near ``far``.
        threshold: absolute density above which a cell counts as occupied. At
            the production bin width ((6-2)/64 = 0.0625 t-units) a density at
            the threshold contributes alpha ~= 6e-4 — safely below visibility.
        rel_threshold: scene-relative component of the occupancy cutoff: the
            effective threshold is ``max(threshold, rel_threshold * mean(ema))``
            (cf. Instant-NGP/nerfacc's mean-density-coupled pruning). A purely
            absolute cutoff creeps in long runs: as the model learns low-level
            free-space haze whose density crosses ``threshold``, occ_fraction
            drifts toward ~0.5 and the grid degrades to near-uniform guidance
            exactly in the reference-length regime (measured round 2,
            STATUS.md). Coupling the cutoff to the grid's own mean keeps it
            above the haze floor once real surfaces dominate the EMA mass.
            0 disables (round-2 behavior).
        decay: per-update EMA decay; a cell whose density collapses fades out
            of the occupancy set over ``~log(eps)/log(decay)`` updates.
        update_every: train steps between grid updates. An update evaluates
            ``2 * G^3`` MLP points (~0.5x one production train step's samples)
            so the default amortizes to ~3% overhead.
        warmup_steps: steps during which every cell counts as occupied (the
            model has not yet learned where mass is); sampling is uniform.
        num_bins: uniform ray bins probed against the grid (independent of
            the per-ray sample count; default = the reference's 64 coarse
            bins so bin width stays below the voxel size).
        floor: sampling weight of UNOCCUPIED in-bounds bins relative to
            occupied bins (1.0). A nonzero floor keeps part of the sample
            budget sweeping empty space: pure concentration (floor=0) piles
            every sample into the few occupied bins (at ~3% occupancy that
            is sub-0.01 t-spacing — measured to over-fit the surface and
            LOSE ~1.6 dB vs uniform on the procedural A/B), and it leaves
            the empty-space density unsupervised after warmup. Out-of-AABB
            probes stay at weight 0.
        in_bin_jitter: True = independent uniform jitter inside the selected
            bin (the reference coarse sampler's jitter diversity,
            ``nerf_helpers.py:50``; ts re-sorted after). False = exact
            piecewise-constant CDF inverse (deterministic given the shared
            per-ray eps; already sorted).
        grid_source: which network's density feeds the EMA updates —
            ``"both"`` (max over coarse+fine), ``"coarse"``, or ``"fine"``.
            Measured (round 3, 120k-step object-scene run): under
            grid-concentrated sampling the FINE net only ever sees samples
            near surfaces, so it hallucinates density in the never-sampled
            empty space (42% of cells above threshold outside the object,
            q99 density ~13) and ``max(coarse, fine)`` drives occ_fraction
            to ~0.6-0.7 — THE root cause of the round-2 "threshold creep".
            The coarse net's floor-mass uniform sweep supervises empty
            space, keeping its field crisp (~3% occupied). ``"coarse"``
            builds the grid from the well-supervised field only; it is the
            DEFAULT after the 120k-step object-scene A/B: occ_fraction flat
            at 0.027 (true occupancy) vs 0.548 for "both", and +0.90 dB
            test PSNR (45.15 vs 44.25, PERFORMANCE.md "Grid-source A/B").
        probe_method: lowering of the per-probe word lookup —
            ``"gather"`` (per-element gathers), ``"onehot"`` (MXU one-hot
            matmul, ``_probe_bits_onehot``), or ``"auto"``. Bit-identical
            results; a pure performance choice. The one-hot route won the
            in-run A/B at the default resolution (11.8 vs 13.5 ms/step,
            347k vs 301k rays/s, PERFORMANCE.md "Bin-query lowering") but
            its [P, G^3/2048] one-hot grows linearly with the word-table
            size — at G=256 it would be an ~8.6 GB intermediate.
            ``"auto"`` (the default) picks onehot while the one-hot stays
            within ~2x the measured-win shape (G <= 80) and falls back to
            gather above; see ``resolve_probe_method``.
    """

    resolution: int = 64
    bound: float = 3.2
    threshold: float = 1e-2
    rel_threshold: float = 1e-2
    decay: float = 0.9
    update_every: int = 16
    warmup_steps: int = 256
    num_bins: int = 64
    floor: float = 0.25
    in_bin_jitter: bool = True
    grid_source: str = "coarse"
    probe_method: str = "auto"

    _GRID_SOURCES = ("both", "coarse", "fine")

    def __post_init__(self):
        assert (self.resolution**3) % 32 == 0, self.resolution
        assert self.grid_source in self._GRID_SOURCES, self.grid_source
        assert self.probe_method in ("auto", "gather", "onehot", "pallas"), (
            self.probe_method
        )

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "OccupancyConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


def init_grid(cfg: OccupancyConfig) -> jnp.ndarray:
    """Fresh density-EMA grid: ``[G, G, G]`` float32 zeros."""
    g = cfg.resolution
    return jnp.zeros((g, g, g), jnp.float32)


def effective_threshold(ema: jnp.ndarray, cfg: OccupancyConfig) -> jnp.ndarray:
    """The density cutoff for "occupied": ``max(threshold, rel * mean(ema))``.

    See ``OccupancyConfig.rel_threshold``: the scene-relative component keeps
    the cutoff above late-run free-space haze (whose density crosses the
    absolute ``threshold`` and would creep occ_fraction toward uniform).
    """
    if cfg.rel_threshold <= 0:
        return jnp.float32(cfg.threshold)
    return jnp.maximum(
        jnp.float32(cfg.threshold), cfg.rel_threshold * jnp.mean(ema)
    )


def occupancy_mask(
    ema: jnp.ndarray, cfg: OccupancyConfig, force_all: jnp.ndarray | bool = False
) -> jnp.ndarray:
    """``[G, G, G]`` bool: cell occupied (above the effective threshold).

    Args:
        force_all: traced bool; True marks every cell occupied (warmup).
    """
    return (ema > effective_threshold(ema, cfg)) | force_all


def pack_occupancy(
    ema: jnp.ndarray, cfg: OccupancyConfig, force_all: jnp.ndarray | bool = False
) -> jnp.ndarray:
    """Threshold the EMA grid into bit-packed occupancy words.

    This is the hot-path representation AND the serialization form: 4-byte
    per-element gathers from the 32 KiB word table are the fastest known
    lowering for the per-step bin query (see the module docstring's layout
    A/B — a float row-gather table is 2.3 ms/step slower at production
    shapes because it multiplies gather traffic 64x).

    Args:
        ema: ``[G, G, G]`` density EMAs.
        force_all: traced bool; True marks every cell occupied (warmup).

    Returns:
        ``[G^3 // 32]`` uint32, bit ``i & 31`` of word ``i >> 5`` = cell ``i``
        occupied (C-order linear index ``(x * G + y) * G + z``).
    """
    occ = occupancy_mask(ema, cfg, force_all)
    bits = occ.reshape(-1, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits << shifts[None, :], axis=1, dtype=jnp.uint32)


def _probe_bits_gather(occ_words: jnp.ndarray, lin: jnp.ndarray) -> jnp.ndarray:
    """Per-probe occupancy bits via per-element word gathers (the XLA
    lowering: one scalar gather per probe; 1.9 ms at production shapes)."""
    words = occ_words[lin >> 5]
    return (words >> (lin & 31).astype(jnp.uint32)) & jnp.uint32(1)


def _probe_bits_onehot(occ_words: jnp.ndarray, lin: jnp.ndarray) -> jnp.ndarray:
    """Per-probe occupancy bits via a one-hot matmul — the MXU as a gather.

    TPU has no hardware gather, so ``occ_words[lin >> 5]`` lowers to 262k
    serial scalar probes at production shapes. This route resolves the
    13-bit word index on the MXU instead: factor it as ``hi*64 + lo``,
    multiply a ``[P, n_hi]`` one-hot of ``hi`` against a ``[n_hi, 128]``
    table holding each word's two u16 halves (exact in f32), then select
    lane ``lo*2 + half`` and extract the in-half bit with exact integer
    arithmetic. ~4.3e9 exact-f32 MACs at production shapes — MXU noise; the
    real cost is materializing the ``[P, n_hi]`` one-hot and ``[P, 128]``
    row products through HBM. Bit-identical to ``_probe_bits_gather``.
    """
    n = occ_words.size
    n_hi = -(-n // 64)
    words = jnp.pad(occ_words, (0, n_hi * 64 - n))
    # [n_hi, 64 words, 2 u16 halves] -> [n_hi, 128]; u16 values are exact f32
    table = (
        jnp.stack([words & 0xFFFF, words >> 16], axis=-1)
        .astype(jnp.float32)
        .reshape(n_hi, 128)
    )
    flat = lin.reshape(-1)
    w = flat >> 5  # word index
    oh_hi = (
        (w >> 6)[:, None] == jnp.arange(n_hi, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)
    rows = jax.lax.dot(
        oh_hi, table, precision=jax.lax.Precision.HIGHEST
    )  # [P, 128]
    lane = ((w & 63) << 1) | ((flat >> 4) & 1)  # lo*2 + which u16 half
    sel = lane[:, None] == jnp.arange(128, dtype=jnp.int32)[None, :]
    half16 = jnp.sum(jnp.where(sel, rows, 0.0), axis=1).astype(jnp.int32)
    bit = (half16 >> (flat & 15)) & 1
    return bit.reshape(lin.shape).astype(jnp.uint32)


def _probe_bits_pallas(occ_words: jnp.ndarray, lin: jnp.ndarray) -> jnp.ndarray:
    """Per-probe occupancy bits via the VMEM-resident Pallas kernel (the
    one-hot matmul of ``_probe_bits_onehot`` with its ``[P, n_hi]``/
    ``[P, 128]`` intermediates kept on-chip instead of round-tripping HBM;
    ``kernels/occupancy_probe.py``). Bit-identical to both XLA lowerings;
    interpret mode off-TPU."""
    from minimal_nerf_tpu.kernels.occupancy_probe import probe_bits_pallas

    return probe_bits_pallas(
        occ_words, lin, interpret=jax.default_backend() != "tpu"
    )


_PROBE_METHODS = {
    "gather": _probe_bits_gather,
    "onehot": _probe_bits_onehot,
    "pallas": _probe_bits_pallas,
}

# "auto" uses the one-hot MXU route while its [P, n_hi] one-hot stays small
# (n_hi = G^3/2048; 128 at the measured-win G=64). Past ~2x that shape the
# one-hot's HBM traffic grows linearly and the per-element gather wins back.
_ONEHOT_MAX_HI = 256


def resolve_probe_method(cfg: OccupancyConfig) -> str:
    """Resolve ``cfg.probe_method`` ("auto" picks by grid size)."""
    if cfg.probe_method != "auto":
        return cfg.probe_method
    n_hi = -(-(cfg.resolution**3 // 32) // 64)
    return "onehot" if n_hi <= _ONEHOT_MAX_HI else "gather"


def query_bin_weights(
    occ_words: jnp.ndarray,
    o_rays: jnp.ndarray,
    d_rays: jnp.ndarray,
    cfg: OccupancyConfig,
    num_bins: int,
    near: float,
    far: float,
    probe_method: str = "auto",
) -> jnp.ndarray:
    """Per-ray occupancy weights over ``num_bins`` uniform bins of [near, far].

    Probes the grid at each bin's midpoint ``o + t_mid * d`` (``t`` in units
    of ``||d||``, matching the sampler's geometry). Occupied bins weigh 1.0,
    unoccupied in-bounds bins ``cfg.floor``, out-of-AABB probes 0; rays with
    no positive-weight probe fall back to uniform weights.

    Args:
        occ_words: ``[G^3 // 32]`` uint32 words from ``pack_occupancy``.
        probe_method: ``"gather"`` (per-element word gathers), ``"onehot"``
            (MXU one-hot matmul, ``_probe_bits_onehot``), or ``"auto"``
            (by grid size, ``resolve_probe_method``). Bit-identical
            results; a pure lowering choice.

    Returns:
        ``[N, B]`` float32 weights.
    """
    if probe_method == "auto":
        probe_method = resolve_probe_method(cfg)
    g = cfg.resolution
    dtype = o_rays.dtype
    width = (far - near) / num_bins
    mids = near + (jnp.arange(num_bins, dtype=dtype) + 0.5) * width
    pos = o_rays[:, None, :] + mids[None, :, None] * d_rays[:, None, :]  # [N,B,3]
    scale = g / (2.0 * cfg.bound)
    v = jnp.floor((pos + cfg.bound) * scale).astype(jnp.int32)
    in_bounds = jnp.all((v >= 0) & (v < g), axis=-1)  # [N,B]
    vc = jnp.clip(v, 0, g - 1)
    lin = (vc[..., 0] * g + vc[..., 1]) * g + vc[..., 2]  # [N,B]
    bit = _PROBE_METHODS[probe_method](occ_words, lin)
    occ = (bit != 0) & in_bounds
    weights = jnp.where(
        occ, 1.0, jnp.where(in_bounds, jnp.float32(cfg.floor), 0.0)
    ).astype(jnp.float32)
    any_mass = jnp.sum(weights, axis=1, keepdims=True) > 0
    return jnp.where(any_mass, weights, jnp.ones_like(weights))


def occupancy_coarse_samples(
    key: jax.Array,
    o_rays: jnp.ndarray,
    d_rays: jnp.ndarray,
    bin_weights: jnp.ndarray,
    num_samples: int,
    near: float,
    far: float,
    in_bin_jitter: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stratified samples from a per-ray piecewise-constant bin distribution.

    Bin selection is the inverse CDF of the (normalized) ``bin_weights``
    density over ``num_bins`` uniform bins, evaluated at a low-variance grid
    ``arange(0,1,1/S) + eps`` with one shared ``eps ~ U(0, 1/S)`` per ray
    (the same variance-reduction scheme as the reference's fine sampler,
    ``nerf_helpers.py:139-142``). The position inside the selected bin is
    either the exact CDF inverse (``in_bin_jitter=False`` — deterministic
    given eps, ts come out sorted) or an independent uniform jitter per
    sample (``in_bin_jitter=True`` — the reference coarse sampler's
    diversity, ``nerf_helpers.py:50``; ts re-sorted afterwards). Either way
    a drop-in replacement for ``rendering.generate_coarse_samples``.

    With uniform ``bin_weights`` (warmup / fallback) this reduces to an
    evenly-spread stratified sweep of ``[near, far]``.

    Returns:
        ``samples [N, S, 3]``, ``ts [N, S, 1]`` (sorted along S).
    """
    n, b = bin_weights.shape
    dtype = o_rays.dtype
    width = (far - near) / b

    # all-zero rows would collapse every sample into the last bin through the
    # normalization guard; fall back to uniform (query_bin_weights already
    # guarantees this, but keep the function total)
    bw = bin_weights.astype(dtype)
    bw = jnp.where(jnp.sum(bw, axis=1, keepdims=True) > 0, bw, jnp.ones_like(bw))
    cdf = jnp.cumsum(bw, axis=1)  # [N, B]
    cdf = cdf / (cdf[:, -1:] + 1e-10)

    k_eps, k_jitter = jax.random.split(key)
    eps = jax.random.uniform(k_eps, (n, 1), dtype=dtype) / num_samples
    grid = jnp.arange(num_samples, dtype=dtype) / num_samples
    u = grid[None, :] + eps  # [N, S], strictly increasing, < 1

    idx = jax.vmap(
        lambda a, v: jnp.searchsorted(a, v, side="left", method="compare_all")
    )(cdf, u)  # [N, S] in [0, B] (B only if cdf[-1] < u due to the guard)
    idx = jnp.minimum(idx, b - 1)

    if in_bin_jitter:
        frac = jax.random.uniform(k_jitter, (n, num_samples), dtype=dtype)
    else:
        cdf_bounds = jnp.concatenate(
            [jnp.zeros((n, 1), dtype), cdf], axis=1
        )  # [N, B+1]
        cdf_lo, cdf_hi = _select_bins(cdf_bounds, idx)
        denom = jnp.where(cdf_hi - cdf_lo < 1e-10, 1.0, cdf_hi - cdf_lo)
        frac = jnp.clip((u - cdf_lo) / denom, 0.0, 1.0)

    ts = near + (idx.astype(dtype) + frac) * width  # [N, S]
    if in_bin_jitter:
        # independent jitter breaks within-bin ordering; a 32..64-wide sort
        # is a cheap bitonic network on TPU (cf. the 192-union sort)
        ts = jnp.sort(ts, axis=1)
    ts = ts[..., None]  # [N, S, 1]
    samples = o_rays[:, None, :] + ts * d_rays[:, None, :]
    return samples, ts


def make_occupancy_sampler(
    occ_words: jnp.ndarray, cfg: OccupancyConfig, num_bins: int = 0
) -> Callable:
    """A ``coarse_sampler`` hook (signature of ``generate_coarse_samples``)
    that concentrates samples in occupied bins via the packed grid.

    Args:
        occ_words: ``[G^3 // 32]`` uint32 words from ``pack_occupancy``.
    """
    bins = num_bins or cfg.num_bins

    def sampler(key, o_rays, d_rays, num_samples, near, far):
        weights = query_bin_weights(
            occ_words, o_rays, d_rays, cfg, bins, near, far,
            probe_method=cfg.probe_method,
        )
        return occupancy_coarse_samples(
            key, o_rays, d_rays, weights, num_samples, near, far,
            in_bin_jitter=cfg.in_bin_jitter,
        )

    return sampler


def update_grid_ema(
    ema: jnp.ndarray,
    params: Params,
    position_dim: int,
    direction_dim: int,
    cfg: OccupancyConfig,
    key: jax.Array,
    compute_dtype=None,
    mlp_apply=None,
    eval_rows: int = 512,
) -> jnp.ndarray:
    """One EMA update: ``ema = max(decay * ema, sigma(model, jittered centers))``.

    Evaluates the density of the net(s) selected by ``cfg.grid_source`` at
    one jittered point per cell (max-reduced across nets for ``"both"``).
    See ``OccupancyConfig.grid_source`` for why ``"coarse"`` is the healthy
    choice under grid-concentrated sampling: the fine net hallucinates
    density in space it is never sampled in, and folding it in via max()
    degrades the grid toward uniform.

    Args:
        ema: ``[G, G, G]`` current EMAs.
        params: ``{"coarse": mlp, "fine": mlp}`` pytree.
        eval_rows: row width for reshaping the ``G^3`` points into the
            ``[rows, samples, 3]`` layout ``nerf_mlp_apply`` expects.
    """
    from minimal_nerf_tpu.models.mlp import nerf_mlp_apply

    apply_fn = mlp_apply if mlp_apply is not None else nerf_mlp_apply
    g = cfg.resolution
    total = g**3
    while total % eval_rows:
        # any resolution OccupancyConfig accepts (G^3 % 32 == 0) admits an
        # eval_rows of at least 32; halve from the preferred width until it
        # divides (e.g. G=20 -> 8000 points -> rows of 64)
        eval_rows //= 2
    cell = 2.0 * cfg.bound / g

    centers_1d = -cfg.bound + (jnp.arange(g, dtype=jnp.float32) + 0.5) * cell
    xx, yy, zz = jnp.meshgrid(centers_1d, centers_1d, centers_1d, indexing="ij")
    pts = jnp.stack([xx, yy, zz], axis=-1).reshape(total, 3)
    jitter = (
        jax.random.uniform(key, (total, 3), jnp.float32) - 0.5
    ) * cell
    pts = (pts + jitter).reshape(eval_rows, total // eval_rows, 3)
    # density is direction-independent (the density head sits on the trunk
    # before the direction features join, models/mlp.py); any unit dir works
    dirs = jnp.tile(jnp.array([[0.0, 0.0, -1.0]], jnp.float32), (eval_rows, 1))

    nets = (
        ("coarse", "fine") if cfg.grid_source == "both" else (cfg.grid_source,)
    )
    sigma = None
    for name in nets:
        density, _ = apply_fn(
            params[name], pts, dirs, position_dim, direction_dim,
            compute_dtype=compute_dtype,
        )
        density = density[..., 0].astype(jnp.float32)
        sigma = density if sigma is None else jnp.maximum(sigma, density)
    sigma = sigma.reshape(g, g, g)
    return jnp.maximum(ema * cfg.decay, sigma)


def bake_grid(
    params: Params,
    position_dim: int,
    direction_dim: int,
    cfg: OccupancyConfig,
    key: jax.Array,
    compute_dtype=None,
    mlp_apply=None,
    passes: int = 4,
) -> jnp.ndarray:
    """Bake an occupancy grid from a TRAINED model (no training history).

    For checkpoints trained with uniform sampling: probes the converged
    densities at ``passes`` independently-jittered points per cell
    (max-reduced, no decay) so ANY checkpoint can render with
    occupancy-concentrated sampling at reduced inference sample counts
    (``score.py``/``render.py --bake-occupancy``). Multiple jittered passes
    keep thin structures from slipping between probes.
    """
    import dataclasses as _dc

    bake_cfg = _dc.replace(cfg, decay=1.0)  # pure max over passes
    ema = init_grid(cfg)
    for i in range(passes):
        ema = update_grid_ema(
            ema, params, position_dim, direction_dim, bake_cfg,
            jax.random.fold_in(key, i), compute_dtype, mlp_apply,
        )
    return ema
