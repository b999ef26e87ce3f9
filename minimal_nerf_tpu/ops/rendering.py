"""Volume-rendering math: stratified sampling, transmittance weights,
alpha compositing, and inverse-CDF hierarchical sampling.

All functions are pure jnp with explicit PRNG keys (no global device state,
unlike the reference's module-global ``device`` at ``nerf_helpers.py:16``) and
static shapes, so the whole render is a single XLA computation under jit.

Behavioral parity notes (vs. reference ``nerf_helpers.py``):

- Stratified sampling (``nerf_helpers.py:28-56``): ``ts = near + step * i +
  U(0, step)`` with ``step = (far - near) / S``; **directions are NOT
  normalized** — ``t`` is measured in units of ``||d||``, matching the
  reference's geometry (dirs are only unit-normalized inside the MLP).
- Deltas (``:58-73``): ``delta_i = t_{i+1} - t_i`` with terminal delta 1e10.
- Weights (``:75-91``): ``w_i = T_i * (1 - exp(-sigma_i * delta_i))`` with
  ``T_i = exp(exclusive-prefix-sum of -sigma*delta)``.
- Compositing (``:93-104``): unnormalized weighted sum (no white background).
- Inverse-CDF sampling (``:106-156``): low-variance uniform grid
  ``arange(0,1,1/S) + eps`` with a **single shared eps ~ U(0, 1/S) per ray**,
  left-searchsorted into the normalized CDF, bin edges ``[near, ts..., far]``,
  uniform jitter within the selected bin. One deviation: the CDF denominator
  gets a ``1e-10`` guard so an (astronomically unlikely) all-zero-density ray
  yields valid samples instead of NaNs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def generate_coarse_samples(
    key: jax.Array,
    o_rays: jnp.ndarray,
    d_rays: jnp.ndarray,
    num_samples: int,
    near: float = 2.0,
    far: float = 6.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stratified per-ray samples of ``o + t * d`` on ``[near, far]``.

    Args:
        key: PRNG key for the per-sample jitter.
        o_rays: ``[N, 3]`` ray origins.
        d_rays: ``[N, 3]`` ray directions (NOT normalized; see module note).
        num_samples: samples per ray (static).

    Returns:
        ``samples [N, S, 3]``, ``ts [N, S, 1]`` (monotone along S).
    """
    n = o_rays.shape[0]
    dtype = o_rays.dtype
    step = (far - near) / num_samples
    base = near + step * jnp.arange(num_samples, dtype=dtype)  # [S]
    jitter = jax.random.uniform(key, (n, num_samples), dtype=dtype) * step
    ts = (base[None, :] + jitter)[..., None]  # [N, S, 1]
    samples = o_rays[:, None, :] + ts * d_rays[:, None, :]
    return samples, ts


def generate_deltas(ts: jnp.ndarray) -> jnp.ndarray:
    """``delta_i = t_{i+1} - t_i``; the final delta is 1e10 (ray to infinity).

    Args:
        ts: ``[N, S, 1]`` monotone sample times.

    Returns:
        ``[N, S, 1]`` deltas.
    """
    n = ts.shape[0]
    terminal = jnp.full((n, 1, 1), 1e10, dtype=ts.dtype)
    return jnp.concatenate([ts[:, 1:, :] - ts[:, :-1, :], terminal], axis=1)


def calculate_unnormalized_weights(
    density: jnp.ndarray, deltas: jnp.ndarray
) -> jnp.ndarray:
    """Transmittance-weighted alpha weights ``w_i = T_i (1 - exp(-sigma_i d_i))``.

    ``T_i = exp(sum_{j<i} -sigma_j * delta_j)`` (exclusive prefix), matching
    the reference's shifted-cumsum formulation (``nerf_helpers.py:75-91``).

    Args:
        density: ``[N, S, 1]`` nonnegative densities.
        deltas: ``[N, S, 1]`` time deltas.

    Returns:
        ``[N, S, 1]`` unnormalized weights.
    """
    n = density.shape[0]
    neg_delta_density = -density * deltas
    shifted = jnp.concatenate(
        [jnp.zeros((n, 1, 1), dtype=density.dtype), neg_delta_density[:, :-1, :]],
        axis=1,
    )
    transmittance = jnp.exp(jnp.cumsum(shifted, axis=1))
    return (1.0 - jnp.exp(neg_delta_density)) * transmittance


def estimate_ray_color(weights: jnp.ndarray, rgb: jnp.ndarray) -> jnp.ndarray:
    """Composite per-sample colors: ``sum_i w_i * rgb_i`` (no normalization).

    Args:
        weights: ``[N, S, 1]`` unnormalized weights.
        rgb: ``[N, S, 3]`` per-sample colors.

    Returns:
        ``[N, 3]`` ray colors.
    """
    return jnp.sum(weights * rgb, axis=1)


def _select_bins(
    ts_bounds: jnp.ndarray, lower_idxs: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``(ts_bounds[n, i], ts_bounds[n, i+1])`` for ``i = lower_idxs[n, s]``.

    One-hot weighted sums instead of ``take_along_axis``: XLA lowers per-row
    gathers from the [N, C+2] bounds table as slow custom fusions (~5.5ms
    each at the production shape, profiled on v5e); the [N, S, C+2] masked
    reduction is plain VPU work.

    Args:
        ts_bounds: ``[N, C+2]`` ascending bin edges.
        lower_idxs: ``[N, S]`` int indices in ``[0, C]``.

    Returns:
        ``lower [N, S]``, ``upper [N, S]``.
    """
    c2 = ts_bounds.shape[1]
    onehot = (
        lower_idxs[..., None] == jnp.arange(c2 - 1, dtype=lower_idxs.dtype)
    ).astype(ts_bounds.dtype)  # [N, S, C+1]
    lower = jnp.sum(ts_bounds[:, None, :-1] * onehot, axis=-1)
    upper = jnp.sum(ts_bounds[:, None, 1:] * onehot, axis=-1)
    return lower, upper


def inverse_transform_sampling(
    key: jax.Array,
    o_rays: jnp.ndarray,
    d_rays: jnp.ndarray,
    weights: jnp.ndarray,
    ts: jnp.ndarray,
    num_samples: int,
    near: float = 2.0,
    far: float = 6.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hierarchical (fine) sampling from the coarse weight distribution.

    Low-variance sampling: a uniform grid of ``num_samples`` CDF positions
    shifted by one shared ``eps ~ U(0, 1/S)`` per ray, mapped through the
    inverse CDF of the coarse weights, then jittered uniformly inside the
    selected coarse bin (reference ``nerf_helpers.py:106-156``).

    Args:
        key: PRNG key (consumed for the shared eps and the in-bin jitter).
        o_rays: ``[N, 3]`` origins.  d_rays: ``[N, 3]`` directions.
        weights: ``[N, C, 1]`` coarse weights.  ts: ``[N, C, 1]`` coarse times.
        num_samples: fine samples per ray (static).

    Returns:
        ``fine_samples [N, S, 3]``, ``fine_ts [N, S, 1]`` (NOT sorted; callers
        union with the coarse ts and sort — see ``models.nerf.render_rays``).
    """
    n, c, _ = ts.shape
    dtype = ts.dtype
    k_eps, k_jitter = jax.random.split(key)

    cdf = jnp.cumsum(weights[..., 0], axis=1)  # [N, C]
    cdf = cdf / (cdf[:, -1:] + 1e-10)

    eps = jax.random.uniform(k_eps, (n, 1), dtype=dtype) / num_samples
    grid = jnp.arange(num_samples, dtype=dtype) / num_samples  # arange(0,1,1/S)
    u = grid[None, :] + eps  # [N, S], u < 1

    # First index where cdf[idx] >= u (torch.searchsorted right=False).
    lower_idxs = jax.vmap(
        lambda a, v: jnp.searchsorted(a, v, side="left", method="compare_all")
    )(cdf, u)  # [N, S]

    bounds_lo = jnp.full((n, 1), near, dtype=dtype)
    bounds_hi = jnp.full((n, 1), far, dtype=dtype)
    ts_bounds = jnp.concatenate([bounds_lo, ts[..., 0], bounds_hi], axis=1)  # [N, C+2]

    lower_bins, upper_bins = _select_bins(ts_bounds, lower_idxs)
    lower_bins = lower_bins[..., None]
    upper_bins = upper_bins[..., None]

    jitter = jax.random.uniform(k_jitter, (n, num_samples, 1), dtype=dtype)
    fine_ts = lower_bins + (upper_bins - lower_bins) * jitter
    fine_samples = o_rays[:, None, :] + fine_ts * d_rays[:, None, :]
    return fine_samples, fine_ts


def inverse_transform_sampling_linterp(
    key: jax.Array,
    o_rays: jnp.ndarray,
    d_rays: jnp.ndarray,
    weights: jnp.ndarray,
    ts: jnp.ndarray,
    num_samples: int,
    near: float = 2.0,
    far: float = 6.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse-CDF sampling with in-bin LINEAR INTERPOLATION (bmild-style).

    Identical to ``inverse_transform_sampling`` except the position inside the
    selected coarse bin is the exact linear inverse of the piecewise-linear
    CDF instead of an independent uniform jitter (the reference's docstring
    itself flags its jitter as non-standard, ``nerf_helpers.py:113-115``).

    Because the low-variance ``u`` grid is strictly increasing and the
    piecewise-linear CDF inverse is monotone, the returned ``fine_ts`` is
    ALREADY SORTED per ray — enabling an O(n) merge with the sorted coarse
    ts instead of a full sort. (Measured at production config the merge is
    actually SLOWER than the sort on TPU — see PERFORMANCE.md "Fine-sampling
    A/B" — so this stays a non-default option.)

    Returns:
        ``fine_samples [N, S, 3]``, ``fine_ts [N, S, 1]`` sorted along S.
    """
    n, c, _ = ts.shape
    dtype = ts.dtype
    k_eps, _ = jax.random.split(key)

    cdf = jnp.cumsum(weights[..., 0], axis=1)  # [N, C]
    cdf = cdf / (cdf[:, -1:] + 1e-10)

    eps = jax.random.uniform(k_eps, (n, 1), dtype=dtype) / num_samples
    grid = jnp.arange(num_samples, dtype=dtype) / num_samples
    u = grid[None, :] + eps  # strictly increasing per ray

    lower_idxs = jax.vmap(
        lambda a, v: jnp.searchsorted(a, v, side="left", method="compare_all")
    )(cdf, u)

    bounds_lo = jnp.full((n, 1), near, dtype=dtype)
    bounds_hi = jnp.full((n, 1), far, dtype=dtype)
    ts_bounds = jnp.concatenate([bounds_lo, ts[..., 0], bounds_hi], axis=1)
    # CDF at each bin's lower/upper edge: [0, cdf...]
    cdf_bounds = jnp.concatenate(
        [jnp.zeros((n, 1), dtype), cdf, jnp.ones((n, 1), dtype)], axis=1
    )

    t_lo, t_hi = _select_bins(ts_bounds, lower_idxs)
    cdf_lo, cdf_hi = _select_bins(cdf_bounds, lower_idxs)

    denom = jnp.where(cdf_hi - cdf_lo < 1e-10, 1.0, cdf_hi - cdf_lo)
    frac = jnp.clip((u - cdf_lo) / denom, 0.0, 1.0)
    fine_ts = (t_lo + (t_hi - t_lo) * frac)[..., None]
    fine_samples = o_rays[:, None, :] + fine_ts * d_rays[:, None, :]
    return fine_samples, fine_ts


def merge_sorted_ts(
    o_rays: jnp.ndarray,
    d_rays: jnp.ndarray,
    fine_ts: jnp.ndarray,
    coarse_ts: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge two per-ray SORTED ts arrays without a full sort.

    Each element's merged position is its own index plus its rank in the
    other array (two vmapped binary searches + one scatter) — O(n log n)
    compares instead of a full 192-wide sorting network. Requires both inputs
    sorted along axis 1 (``inverse_transform_sampling_linterp`` guarantees
    this for the fine ts). N.B. on TPU at production shape the scatter makes
    this ~4.3 ms/step SLOWER than ``jnp.sort`` of the union (PERFORMANCE.md
    "Fine-sampling A/B") — kept for the linterp option, not as a fast path.

    Returns:
        ``samples [N, Sf+Sc, 3]``, ``ts [N, Sf+Sc, 1]`` sorted along axis 1.
    """
    f = fine_ts[..., 0]  # [N, Sf]
    c = coarse_ts[..., 0]  # [N, Sc]
    n, sf = f.shape
    sc = c.shape[1]
    # ranks: ties broken so fine elements come first (any consistent order)
    rank_f = jax.vmap(
        lambda a, v: jnp.searchsorted(a, v, side="left", method="compare_all")
    )(c, f)
    rank_c = jax.vmap(
        lambda a, v: jnp.searchsorted(a, v, side="right", method="compare_all")
    )(f, c)
    pos_f = jnp.arange(sf)[None, :] + rank_f  # [N, Sf]
    pos_c = jnp.arange(sc)[None, :] + rank_c  # [N, Sc]
    merged = jnp.zeros((n, sf + sc), f.dtype)
    merged = jax.vmap(lambda m, p, v: m.at[p].set(v))(merged, pos_f, f)
    merged = jax.vmap(lambda m, p, v: m.at[p].set(v))(merged, pos_c, c)
    all_ts = merged[..., None]
    samples = o_rays[:, None, :] + all_ts * d_rays[:, None, :]
    return samples, all_ts


def union_and_sort_ts(
    o_rays: jnp.ndarray,
    d_rays: jnp.ndarray,
    fine_ts: jnp.ndarray,
    coarse_ts: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sorted union of fine and coarse sample times, with positions recomputed.

    The reference concatenates ts AND sample positions then sort+gathers both
    (``nerf_model.py:116-120``); since positions are affine in t
    (``p = o + t*d``) we sort only ts and recompute positions — mathematically
    identical, cheaper on TPU (one sort, no gather of 3-vectors).

    Returns:
        ``samples [N, Sf+Sc, 3]``, ``ts [N, Sf+Sc, 1]`` sorted along axis 1.
    """
    all_ts = jnp.concatenate([fine_ts, coarse_ts], axis=1)
    all_ts = jnp.sort(all_ts, axis=1)
    samples = o_rays[:, None, :] + all_ts * d_rays[:, None, :]
    return samples, all_ts
