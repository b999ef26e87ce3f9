"""Fully-fused Pallas ray-march kernel: positions -> encode -> MLP ->
transmittance compositing -> ray color, forward AND backward, in VMEM.

This is the flagship kernel: one `pallas_call` per render pass takes the per
-ray origins/directions and sample times and produces composited ray colors
(plus the per-sample weights the hierarchical sampler needs). Compared to the
point-level kernel in ``raymarch.py`` it additionally fuses:

- sample-position construction ``x = (o + t*d) / pi`` (the ``[N, S, 3]``
  position tensor never exists in HBM),
- per-ray direction normalization + broadcast,
- delta computation (terminal 1e10), exclusive-prefix transmittance
  (``cumsum`` along the lane-resident sample axis), weight computation and
  the weighted color reduction (reference math at ``nerf_helpers.py:58-104``),
- the full backward chain: d(color)/d(sigma) via the reverse suffix sum
  ``dL/dsigma_i = delta_i * (T_i e_i g_i - sum_{j>i} w_j g_j)``, then the MLP
  backward with weight-gradient accumulation across grid steps.

Layout strategy: activations are carried as ``[R, S, C]`` (rays x samples x
features; features on lanes, samples on sublanes) so compositing indexes the
sample axis natively; matmuls view them as ``[R*S, C]`` — a free row-major
collapse. Sample times ``ts`` stay ``[R, S]`` with S on lanes for the scans.

Only parameter gradients are produced (positions/directions/ts carry no
trainable upstream state in NeRF training — ts enter via stop_gradient'd
sampling, see ``models/nerf.py``).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minimal_nerf_tpu.kernels.raymarch import (
    _encode_in_kernel,
    _unflatten_mlp_grads,
    flatten_mlp_params,
)

Params = Dict[str, Any]

DEFAULT_RAY_TILE = 16


def _auto_tiles(union_samples: int) -> Tuple[int, int]:
    """Pick (ray_tile, bwd_ray_tile) for a given fine-union sample count.

    The MXU matmuls see ``ray_tile * samples`` rows per grid step; the
    VMEM-safe sweet spots measured on v5e are ~4096 rows forward and ~2048
    backward (the backward holds ~3x the live activations). A fixed tile of
    16 is right for the 192-sample production union but leaves ~10% rays/s
    on the table at the fast recipe's 64-sample union (273k -> 301k rays/s
    at 16+48; PERFORMANCE.md). Tiles are multiples of 8 (Mosaic sublane
    divisibility), clamped to [8, 64], bwd reduced until it divides fwd.
    """
    u = max(union_samples, 1)
    fwd = min(64, max(8, (4096 // u) // 8 * 8))
    bwd = min(64, max(8, (2048 // u) // 8 * 8))
    while fwd % bwd:
        bwd -= 8
    return fwd, bwd


def _mm3(a, w, dtype):
    """``[R, S, Cin] @ [Cin, Cout]`` via a free collapse to ``[R*S, Cin]``."""
    r, s, cin = a.shape
    out = jnp.dot(
        a.reshape(r * s, cin).astype(dtype), w[:],
        preferred_element_type=jnp.float32,
    )
    return out.reshape(r, s, -1)


def _mm3T(a, w, dtype):
    """``[R, S, Cout] @ W^T`` for ``w [Cin, Cout]`` -> ``[R, S, Cin]``."""
    r, s, cout = a.shape
    out = jax.lax.dot_general(
        a.reshape(r * s, cout).astype(dtype), w[:].astype(dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    return out.reshape(r, s, -1)


def _aTb3(a, b, dtype):
    """``a^T b`` contracting (R, S) -> ``[Ca, Cb]``."""
    ra, sa, ca = a.shape
    rb, sb, cb = b.shape
    return jax.lax.dot_general(
        a.reshape(ra * sa, ca).astype(dtype),
        b.reshape(rb * sb, cb).astype(dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _cumsum_tri(x: jnp.ndarray, exclusive: bool = False) -> jnp.ndarray:
    """Prefix sum along the lane axis of ``[R, S]`` via a triangular matmul.

    Mosaic has no ``cumsum`` lowering; ``x @ tri`` with ``tri[i, j] = i <= j``
    (or ``i < j`` for exclusive) is one tiny fp32 MXU op.
    """
    s = x.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    tri = (rows < cols if exclusive else rows <= cols).astype(x.dtype)
    return jnp.dot(x, tri, preferred_element_type=jnp.float32)


def _suffix_sum_tri(x: jnp.ndarray) -> jnp.ndarray:
    """``out[:, i] = sum_{j > i} x[:, j]`` via the strict upper-tri transpose."""
    s = x.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    tri = (rows > cols).astype(x.dtype)
    return jnp.dot(x, tri, preferred_element_type=jnp.float32)


def _fused_forward_core(o, d, ts, ws, bs, position_dim, direction_dim, dtype):
    """Shared forward chain used by both kernels. Returns intermediates."""
    (t0w, t1w, t2w, t3w, f0wh, f0we, f1w, f2w, dw, r0wh, r0wd, r1w) = ws
    (t0b, t1b, t2b, t3b, f0b, f1b, f2b, db, r0b, r1b) = bs
    r_rays, s = ts.shape

    # positions [R, S, 3], normalized by pi (ops/encoding.py semantics)
    x = (o[:, None, :] + ts[:, :, None] * d[:, None, :]) * (1.0 / math.pi)
    # unit directions broadcast over samples
    dn = d * jax.lax.rsqrt(jnp.sum(d * d, axis=-1, keepdims=True))

    e = _encode_in_kernel(x.reshape(r_rays * s, 3), position_dim, dtype).reshape(
        r_rays, s, -1
    )
    ed1 = _encode_in_kernel(dn, direction_dim, dtype)  # [R, enc_d]
    ed = jnp.broadcast_to(ed1[:, None, :], (r_rays, s, ed1.shape[-1]))

    # activations stored in the compute dtype (halves VMEM under bf16; the
    # matmuls cast to it anyway, so this only moves the rounding point)
    act = lambda v: jax.nn.relu(v).astype(dtype)
    e = e.astype(dtype)
    ed = ed.astype(dtype)
    a0 = act(_mm3(e, t0w, dtype) + t0b[:])
    a1 = act(_mm3(a0, t1w, dtype) + t1b[:])
    a2 = act(_mm3(a1, t2w, dtype) + t2b[:])
    a3 = act(_mm3(a2, t3w, dtype) + t3b[:])
    a4 = act(_mm3(a3, f0wh, dtype) + _mm3(e, f0we, dtype) + f0b[:])
    a5 = act(_mm3(a4, f1w, dtype) + f1b[:])
    h = (_mm3(a5, f2w, dtype) + f2b[:]).astype(dtype)
    sg = jax.nn.relu(_mm3(h, dw, dtype) + db[:])  # [R, S, 1] fp32
    r0 = act(_mm3(h, r0wh, dtype) + _mm3(ed, r0wd, dtype) + r0b[:])
    rgb = jax.nn.sigmoid(_mm3(r0, r1w, dtype) + r1b[:])  # [R, S, 3] fp32

    # compositing (reference nerf_helpers.py:58-104)
    sigma = sg[..., 0]  # [R, S]
    deltas = jnp.concatenate(
        [ts[:, 1:] - ts[:, :-1], jnp.full((r_rays, 1), 1e10, ts.dtype)], axis=1
    )
    ndd = -sigma * deltas
    # exclusive prefix sum (the reference's shifted-cumsum, nerf_helpers.py:87-89)
    transmittance = jnp.exp(_cumsum_tri(ndd, exclusive=True))
    ealpha = jnp.exp(ndd)
    weights = (1.0 - ealpha) * transmittance  # [R, S]
    color = jnp.sum(weights[..., None] * rgb, axis=1)  # [R, 3]

    return dict(
        e=e, ed=ed, a0=a0, a1=a1, a2=a2, a3=a3, a4=a4, a5=a5, h=h, sg=sg,
        r0=r0, rgb=rgb, deltas=deltas, transmittance=transmittance,
        ealpha=ealpha, weights=weights, color=color,
    )


def _fused_fwd_kernel(
    position_dim, direction_dim, dtype,
    o_ref, d_ref, ts_ref,
    t0w, t1w, t2w, t3w, f0wh, f0we, f1w, f2w, dw, r0wh, r0wd, r1w,
    t0b, t1b, t2b, t3b, f0b, f1b, f2b, db, r0b, r1b,
    color_ref, weights_ref,
):
    ws = (t0w, t1w, t2w, t3w, f0wh, f0we, f1w, f2w, dw, r0wh, r0wd, r1w)
    bs = (t0b, t1b, t2b, t3b, f0b, f1b, f2b, db, r0b, r1b)
    f = _fused_forward_core(
        o_ref[:], d_ref[:], ts_ref[:], ws, bs, position_dim, direction_dim, dtype
    )
    color_ref[:] = f["color"]
    weights_ref[:] = f["weights"]


def _fused_bwd_kernel(
    position_dim, direction_dim, dtype,
    o_ref, d_ref, ts_ref, dcolor_ref, dweights_ref,
    t0w, t1w, t2w, t3w, f0wh, f0we, f1w, f2w, dw, r0wh, r0wd, r1w,
    t0b, t1b, t2b, t3b, f0b, f1b, f2b, db, r0b, r1b,
    g_t0w, g_t1w, g_t2w, g_t3w, g_f0wh, g_f0we, g_f1w, g_f2w, g_dw,
    g_r0wh, g_r0wd, g_r1w,
    g_t0b, g_t1b, g_t2b, g_t3b, g_f0b, g_f1b, g_f2b, g_db, g_r0b, g_r1b,
):
    ws = (t0w, t1w, t2w, t3w, f0wh, f0we, f1w, f2w, dw, r0wh, r0wd, r1w)
    bs = (t0b, t1b, t2b, t3b, f0b, f1b, f2b, db, r0b, r1b)
    f = _fused_forward_core(
        o_ref[:], d_ref[:], ts_ref[:], ws, bs, position_dim, direction_dim, dtype
    )
    dcolor = dcolor_ref[:]  # [R, 3]
    r_rays, s = ts_ref.shape

    # ---- compositing backward ----
    # g_rgb[r,s,:] = w[r,s] * dcolor[r,:]
    g_rgb = f["weights"][..., None] * dcolor[:, None, :]
    # g_w[r,s] = <dcolor[r], rgb[r,s]> (+ any direct weight cotangent)
    g_w = jnp.sum(dcolor[:, None, :] * f["rgb"], axis=-1) + dweights_ref[:]
    # dL/dsigma_i = delta_i * (T_i e_i g_i - sum_{j>i} w_j g_j)
    wg = f["weights"] * g_w
    suffix = _suffix_sum_tri(wg)  # sum over j > i
    g_sigma = f["deltas"] * (f["transmittance"] * f["ealpha"] * g_w - suffix)

    # ---- MLP backward (mirrors raymarch._nerf_mlp_bwd_kernel, 3-D layout) ----
    # gradient activations stored in compute dtype (VMEM budget); ReLU masks
    # compare in fp32 (Mosaic has no bf16 vector compare). Weight-gradient
    # contributions are computed INTERLEAVED with the reverse sweep so each
    # gradient activation dies as soon as its two consumers have run —
    # holding all of them simultaneously blows the 16MB scoped-VMEM budget.
    pos = lambda v: v.astype(jnp.float32) > 0
    gact = lambda v, mask: (v * mask).astype(dtype)

    def bsum(g):
        return jnp.sum(g.astype(jnp.float32), axis=(0, 1))[None, :]

    updates = []
    g_rgbpre = (g_rgb * f["rgb"] * (1.0 - f["rgb"])).astype(dtype)
    updates += [(g_r1w, _aTb3(f["r0"], g_rgbpre, dtype)), (g_r1b, bsum(g_rgbpre))]
    g_r0 = gact(_mm3T(g_rgbpre, r1w, dtype), pos(f["r0"]))
    updates += [
        (g_r0wh, _aTb3(f["h"], g_r0, dtype)),
        (g_r0wd, _aTb3(f["ed"], g_r0, dtype)),
        (g_r0b, bsum(g_r0)),
    ]
    g_sigpre = (g_sigma[..., None] * (f["sg"] > 0)).astype(dtype)
    updates += [(g_dw, _aTb3(f["h"], g_sigpre, dtype)), (g_db, bsum(g_sigpre))]
    g_h = (_mm3T(g_r0, r0wh, dtype) + _mm3T(g_sigpre, dw, dtype)).astype(dtype)
    updates += [(g_f2w, _aTb3(f["a5"], g_h, dtype)), (g_f2b, bsum(g_h))]
    g_a5 = gact(_mm3T(g_h, f2w, dtype), pos(f["a5"]))
    updates += [(g_f1w, _aTb3(f["a4"], g_a5, dtype)), (g_f1b, bsum(g_a5))]
    g_a4 = gact(_mm3T(g_a5, f1w, dtype), pos(f["a4"]))
    updates += [
        (g_f0wh, _aTb3(f["a3"], g_a4, dtype)),
        (g_f0we, _aTb3(f["e"], g_a4, dtype)),
        (g_f0b, bsum(g_a4)),
    ]
    g_a3 = gact(_mm3T(g_a4, f0wh, dtype), pos(f["a3"]))
    updates += [(g_t3w, _aTb3(f["a2"], g_a3, dtype)), (g_t3b, bsum(g_a3))]
    g_a2 = gact(_mm3T(g_a3, t3w, dtype), pos(f["a2"]))
    updates += [(g_t2w, _aTb3(f["a1"], g_a2, dtype)), (g_t2b, bsum(g_a2))]
    g_a1 = gact(_mm3T(g_a2, t2w, dtype), pos(f["a1"]))
    updates += [(g_t1w, _aTb3(f["a0"], g_a1, dtype)), (g_t1b, bsum(g_a1))]
    g_a0 = gact(_mm3T(g_a1, t1w, dtype), pos(f["a0"]))
    updates += [(g_t0w, _aTb3(f["e"], g_a0, dtype)), (g_t0b, bsum(g_a0))]

    is_first = pl.program_id(0) == 0

    @pl.when(is_first)
    def _():
        for ref, val in updates:
            ref[:] = val

    @pl.when(jnp.logical_not(is_first))
    def _():
        for ref, val in updates:
            ref[:] = ref[:] + val


def _pad_rays(arr, tile, fill=0.0):
    n = arr.shape[0]
    pad = (-n) % tile
    if pad:
        pad_block = jnp.full((pad,) + arr.shape[1:], fill, arr.dtype)
        arr = jnp.concatenate([arr, pad_block])
    return arr


@functools.partial(
    jax.jit,
    static_argnames=("position_dim", "direction_dim", "compute_dtype",
                     "ray_tile", "interpret"),
)
def _fused_forward(
    ws_and_bs, o, d, ts,
    position_dim, direction_dim, compute_dtype, ray_tile, interpret,
):
    ws, bs = ws_and_bs
    n, s = ts.shape
    assert n % ray_tile == 0
    grid = (n // ray_tile,)
    dtype = compute_dtype or jnp.float32

    ray_spec = lambda c: pl.BlockSpec(
        (ray_tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    const_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _fused_fwd_kernel, position_dim, direction_dim, dtype
    )
    color, weights = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec(3), ray_spec(3), ray_spec(s)]
        + [const_spec(w) for w in ws]
        + [const_spec(b) for b in bs],
        out_specs=[ray_spec(3), ray_spec(s)],
        out_shape=[
            jax.ShapeDtypeStruct((n, 3), jnp.float32),
            jax.ShapeDtypeStruct((n, s), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(o, d, ts, *ws, *bs)
    return color, weights


@functools.partial(
    jax.jit,
    static_argnames=("position_dim", "direction_dim", "compute_dtype",
                     "ray_tile", "interpret"),
)
def _fused_backward(
    ws_and_bs, o, d, ts, dcolor, dweights,
    position_dim, direction_dim, compute_dtype, ray_tile, interpret,
):
    ws, bs = ws_and_bs
    n, s = ts.shape
    assert n % ray_tile == 0
    grid = (n // ray_tile,)
    dtype = compute_dtype or jnp.float32

    ray_spec = lambda c: pl.BlockSpec(
        (ray_tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    const_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    grad_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws] + [
        jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs
    ]
    kernel = functools.partial(
        _fused_bwd_kernel, position_dim, direction_dim, dtype
    )
    grads = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec(3), ray_spec(3), ray_spec(s), ray_spec(3), ray_spec(s)]
        + [const_spec(w) for w in ws]
        + [const_spec(b) for b in bs],
        out_specs=[const_spec(g) for g in grad_shapes],
        out_shape=grad_shapes,
        compiler_params=pltpu.CompilerParams(
            # the peak stack allocation sits ~0.4% over Mosaic's default
            # 16MB scoped budget; raise the cap to the chip's usable VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(o, d, ts, dcolor, dweights, *ws, *bs)
    return list(grads[:12]), list(grads[12:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _fused_core(
    params, o, d, ts,
    position_dim, direction_dim, compute_dtype, ray_tile, bwd_ray_tile,
    interpret,
):
    ws_and_bs = flatten_mlp_params(params, compute_dtype)
    return _fused_forward(
        ws_and_bs, o, d, ts,
        position_dim, direction_dim, compute_dtype, ray_tile, interpret,
    )


def _fused_core_fwd(params, o, d, ts, position_dim, direction_dim,
                    compute_dtype, ray_tile, bwd_ray_tile, interpret):
    out = _fused_core(params, o, d, ts, position_dim, direction_dim,
                      compute_dtype, ray_tile, bwd_ray_tile, interpret)
    return out, (params, o, d, ts)


def _fused_core_bwd(position_dim, direction_dim, compute_dtype, ray_tile,
                    bwd_ray_tile, interpret, residuals, g):
    params, o, d, ts = residuals
    dcolor, dweights = g
    ws_and_bs = flatten_mlp_params(params, compute_dtype)
    gws, gbs = _fused_backward(
        ws_and_bs, o, d, ts, dcolor, dweights,
        position_dim, direction_dim, compute_dtype, bwd_ray_tile, interpret,
    )
    gparams = _unflatten_mlp_grads(gws, gbs, params)
    return (
        gparams,
        jnp.zeros_like(o),
        jnp.zeros_like(d),
        jnp.zeros_like(ts),
    )


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


def fused_render_pass(
    params: Params,
    o_rays: jnp.ndarray,
    d_rays: jnp.ndarray,
    ts: jnp.ndarray,
    position_dim: int = 10,
    direction_dim: int = 4,
    compute_dtype=None,
    ray_tile: int = DEFAULT_RAY_TILE,
    bwd_ray_tile: int = 0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fused render pass: MLP + compositing for given sample times.

    Args:
        params: one MLP pytree (``init_nerf_mlp``).
        o_rays/d_rays: ``[N, 3]``.
        ts: ``[N, S, 1]`` or ``[N, S]`` sorted sample times.
        ray_tile: forward rays per grid step.
        bwd_ray_tile: backward rays per grid step (the backward holds ~3x the
            live activations — defaults to ``ray_tile // 4`` capped at 4 when
            0). Must divide ``ray_tile``.

    Returns:
        ``color [N, 3]``, ``weights [N, S, 1]`` (differentiable in params).
    """
    if bwd_ray_tile <= 0:
        # Mosaic requires block sublane counts divisible by 8; the backward
        # holds ~3x the forward's live activations, so keep its tile minimal
        bwd_ray_tile = min(8, ray_tile)
    assert ray_tile % bwd_ray_tile == 0, (ray_tile, bwd_ray_tile)
    ts2 = ts[..., 0] if ts.ndim == 3 else ts
    n, s = ts2.shape
    o_p = _pad_rays(o_rays, ray_tile)
    # padded rays get direction (1,1,1) to avoid 0/0 in normalization;
    # their constant ts give zero deltas and zero cotangents (sliced out)
    d_p = _pad_rays(d_rays, ray_tile, fill=1.0)
    ts_p = _pad_rays(ts2, ray_tile, fill=1.0)
    color, weights = _fused_core(
        params, o_p, d_p, ts_p,
        position_dim, direction_dim, compute_dtype, ray_tile, bwd_ray_tile,
        interpret,
    )
    return color[:n], weights[:n][..., None]


def render_rays_fused(
    params: Params,
    config,
    o_rays: jnp.ndarray,
    d_rays: jnp.ndarray,
    key: jax.Array,
    compute_dtype=None,
    mlp_apply=None,  # accepted for interface parity; the fused path ignores it
    ray_tile: int = 0,
    bwd_ray_tile: int = 0,
    interpret: bool = False,
    coarse_sampler=None,
) -> Dict[str, jnp.ndarray]:
    """Hierarchical render with both passes through the fused kernel.

    Drop-in equivalent of ``models.nerf.render_rays`` (same sampling RNG
    stream, same math — see tests/test_fused_raymarch.py) with sampling and
    the 192-sample union in XLA and everything else in the kernel.
    ``coarse_sampler`` overrides coarse sample placement exactly as in
    ``models.nerf.render_rays`` (the kernel only consumes the resulting ts).
    ``ray_tile=0`` (default) sizes the tiles from the sample counts
    (``_auto_tiles``) — 16 at the production 192-sample union, larger for
    reduced-sample configs.
    """
    from minimal_nerf_tpu.ops import rendering

    if ray_tile <= 0:
        union = config.coarse_samples + config.fine_samples
        auto_fwd, auto_bwd = _auto_tiles(union)
        ray_tile = auto_fwd
        if bwd_ray_tile <= 0:
            bwd_ray_tile = auto_bwd

    sample_coarse = (
        coarse_sampler if coarse_sampler is not None
        else rendering.generate_coarse_samples
    )
    k_coarse, k_cdf = jax.random.split(key)
    # ts only; the sample positions XLA would build here are dead code
    # (the kernel reconstructs x = o + t*d in VMEM)
    _, coarse_ts = sample_coarse(
        k_coarse, o_rays, d_rays, config.coarse_samples, config.near, config.far
    )
    coarse_color, coarse_weights = fused_render_pass(
        params["coarse"], o_rays, d_rays, coarse_ts,
        config.position_dim, config.direction_dim,
        compute_dtype=compute_dtype, ray_tile=ray_tile,
        bwd_ray_tile=bwd_ray_tile, interpret=interpret,
    )

    sg = jax.lax.stop_gradient
    if getattr(config, "fine_sampling", "reference") == "linterp":
        _, fine_ts = rendering.inverse_transform_sampling_linterp(
            k_cdf, o_rays, d_rays, sg(coarse_weights), sg(coarse_ts),
            config.fine_samples, config.near, config.far,
        )
        _, all_ts = rendering.merge_sorted_ts(
            o_rays, d_rays, fine_ts, sg(coarse_ts)
        )
    else:
        _, fine_ts = rendering.inverse_transform_sampling(
            k_cdf, o_rays, d_rays, sg(coarse_weights), sg(coarse_ts),
            config.fine_samples, config.near, config.far,
        )
        _, all_ts = rendering.union_and_sort_ts(
            o_rays, d_rays, fine_ts, sg(coarse_ts)
        )

    fine_color, _ = fused_render_pass(
        params["fine"], o_rays, d_rays, sg(all_ts),
        config.position_dim, config.direction_dim,
        compute_dtype=compute_dtype, ray_tile=ray_tile,
        bwd_ray_tile=bwd_ray_tile, interpret=interpret,
    )
    return {"fine_rgb_rays": fine_color, "coarse_rgb_rays": coarse_color}


def make_fused_render_fn(ray_tile: int = 0,
                         bwd_ray_tile: int = 0, interpret: bool = False):
    """A ``render_fn`` hook (signature of ``models.nerf.render_rays``).

    ``ray_tile=0`` auto-sizes the kernel tiles from the model's sample
    counts at call time (``_auto_tiles``)."""

    # return_stats is accepted for render_fn-hook compatibility but ignored:
    # densities never leave the fused kernel's VMEM, so the density
    # diagnostics are only available on the XLA path.
    def render_fn(params, config, o_rays, d_rays, key, compute_dtype=None,
                  mlp_apply=None, return_stats=False, coarse_sampler=None):
        return render_rays_fused(
            params, config, o_rays, d_rays, key,
            compute_dtype=compute_dtype, ray_tile=ray_tile,
            bwd_ray_tile=bwd_ray_tile, interpret=interpret,
            coarse_sampler=coarse_sampler,
        )

    return render_fn
