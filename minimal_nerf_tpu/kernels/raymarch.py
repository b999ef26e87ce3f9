"""Fused Pallas TPU kernel for the NeRF MLP: encode -> 10 layers -> heads.

Why a kernel: under plain XLA, each of the ~10 matmuls in the MLP writes its
``[P, 256]`` activation to HBM and the next reads it back — at the production
workload (P = 4096 rays x 192 samples = 786k points per fine pass) that is
multiple GB of HBM traffic per pass, which dominates the step time on a
bandwidth-bound chip. This kernel keeps the ENTIRE per-tile activation chain
(positional encoding included) resident in VMEM: HBM traffic drops to the
``[P, 3]`` inputs, the ``[P, 4]`` outputs, and one copy of the ~0.5M-param
weights per grid sweep.

Design (see /opt/skills/guides/pallas_guide.md):

- grid over flattened sample points, ``TILE`` rows per program; weights are
  whole-array VMEM operands (index_map pinned to block 0) so Mosaic keeps one
  VMEM copy across grid steps,
- the positional encoding is computed in-kernel: coordinates are spread to
  the frequency-major channel layout with a tiny 0/1 selector matmul
  (``[TILE,3] @ [3,2*dim*3]`` on the MXU), then ``sin``/``cos`` on the VPU
  with an iota-derived parity mask — no encoded features ever touch HBM,
- the skip/concat layers are algebraically split (``concat(h, e) @ W ==
  h @ W_h + e @ W_e``) so no concatenation is materialized,
- matmuls run with ``preferred_element_type=float32``; with
  ``compute_dtype=bfloat16`` the weight copies and activations are cast to
  bf16 (fp32 accumulation) for the MXU fast path.

Parity: bitwise-level agreement with ``models.mlp.nerf_mlp_apply`` on the
same dtype is asserted in ``tests/test_kernels.py``; architecture cites
reference ``nerf_model.py:308-389``.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]

DEFAULT_TILE = 512


def _encode_in_kernel(x, dim: int, dtype):
    """Frequency-major positional encoding of ``x [R, 3]`` -> ``[R, 6*dim]``.

    Channel c encodes coordinate ``c % 3`` at frequency ``2**(c//6) * pi``
    with ``sin`` iff ``(c // 3) % 2 == 1`` — the reference's cos-before-sin,
    per-frequency layout (``nerf_model.py:19-33``).
    """
    out_c = 2 * dim * 3
    # 0/1 selector, built from iota so it lives in registers/VMEM as a const
    rows = jax.lax.broadcasted_iota(jnp.int32, (3, out_c), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (3, out_c), 1)
    selector = (rows == cols % 3).astype(dtype)
    spread = jnp.dot(x.astype(dtype), selector, preferred_element_type=jnp.float32)

    ch = jax.lax.broadcasted_iota(jnp.int32, (1, out_c), 1)
    freq = jnp.exp2(jnp.floor_divide(ch, 6).astype(jnp.float32)) * math.pi
    is_sin = (jnp.floor_divide(ch, 3) % 2) == 1
    angles = spread * freq
    return jnp.where(is_sin, jnp.sin(angles), jnp.cos(angles))


def _mm(a, w, dtype):
    return jnp.dot(a.astype(dtype), w[:], preferred_element_type=jnp.float32)


def _nerf_mlp_kernel(
    position_dim: int,
    direction_dim: int,
    dtype,
    x_ref,
    d_ref,
    # weights (possibly pre-cast to compute dtype)
    t0w, t1w, t2w, t3w, f0wh, f0we, f1w, f2w, dw, r0wh, r0wd, r1w,
    # biases (fp32, shape [1, out])
    t0b, t1b, t2b, t3b, f0b, f1b, f2b, db, r0b, r1b,
    # outputs
    sigma_ref,
    rgb_ref,
):
    enc_x = _encode_in_kernel(x_ref[:], position_dim, dtype)  # [R, 60] fp32
    enc_d = _encode_in_kernel(d_ref[:], direction_dim, dtype)  # [R, 24] fp32

    h = jax.nn.relu(_mm(enc_x, t0w, dtype) + t0b[:])
    h = jax.nn.relu(_mm(h, t1w, dtype) + t1b[:])
    h = jax.nn.relu(_mm(h, t2w, dtype) + t2b[:])
    h = jax.nn.relu(_mm(h, t3w, dtype) + t3b[:])
    # skip: concat(h, enc_x) @ W == h @ W_h + enc_x @ W_e
    h = jax.nn.relu(_mm(h, f0wh, dtype) + _mm(enc_x, f0we, dtype) + f0b[:])
    h = jax.nn.relu(_mm(h, f1w, dtype) + f1b[:])
    h = _mm(h, f2w, dtype) + f2b[:]  # no activation (nerf_model.py:342-348)

    sigma_ref[:] = jax.nn.relu(_mm(h, dw, dtype) + db[:])
    r = jax.nn.relu(_mm(h, r0wh, dtype) + _mm(enc_d, r0wd, dtype) + r0b[:])
    rgb_ref[:] = jax.nn.sigmoid(_mm(r, r1w, dtype) + r1b[:])


def flatten_mlp_params(
    params: Params, compute_dtype=None
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Split/flatten an ``init_nerf_mlp`` pytree into kernel operand lists.

    The two concat layers are split row-wise into (h-part, enc-part); weights
    are optionally cast to the compute dtype; biases stay fp32 as ``[1, out]``.
    """
    wt = (lambda w: w.astype(compute_dtype)) if compute_dtype else (lambda w: w)
    tr = params["trunk"]
    fe = params["feature"]
    de = params["density"]
    rg = params["rgb"]
    width = tr[0]["w"].shape[1]
    ws = [
        wt(tr[0]["w"]), wt(tr[1]["w"]), wt(tr[2]["w"]), wt(tr[3]["w"]),
        wt(fe[0]["w"][:width]), wt(fe[0]["w"][width:]),
        wt(fe[1]["w"]), wt(fe[2]["w"]),
        wt(de["w"]),
        wt(rg[0]["w"][:width]), wt(rg[0]["w"][width:]),
        wt(rg[1]["w"]),
    ]
    bs = [
        tr[0]["b"], tr[1]["b"], tr[2]["b"], tr[3]["b"],
        fe[0]["b"], fe[1]["b"], fe[2]["b"],
        de["b"],
        rg[0]["b"], rg[1]["b"],
    ]
    bs = [b.reshape(1, -1) for b in bs]
    return ws, bs


@functools.partial(
    jax.jit,
    static_argnames=("position_dim", "direction_dim", "compute_dtype", "tile",
                     "interpret"),
)
def _pallas_points_forward(
    ws_and_bs,
    x_pts: jnp.ndarray,
    d_pts: jnp.ndarray,
    position_dim: int,
    direction_dim: int,
    compute_dtype=None,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
):
    """Run the kernel over flattened, tile-padded points ``[P, 3]``."""
    ws, bs = ws_and_bs
    p = x_pts.shape[0]
    assert p % tile == 0, (p, tile)
    grid = (p // tile,)
    dtype = compute_dtype or jnp.float32

    point_spec = pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _nerf_mlp_kernel, position_dim, direction_dim, dtype
    )
    sigma, rgb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[point_spec, point_spec]
        + [const_spec(w) for w in ws]
        + [const_spec(b) for b in bs],
        out_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p, 1), jnp.float32),
            jax.ShapeDtypeStruct((p, 3), jnp.float32),
        ],
        interpret=interpret,
    )(x_pts, d_pts, *ws, *bs)
    return sigma, rgb


def nerf_mlp_pallas_apply(
    params: Params,
    samples: jnp.ndarray,
    direc: jnp.ndarray,
    position_dim: int = 10,
    direction_dim: int = 4,
    compute_dtype=None,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
):
    """Drop-in replacement for ``models.mlp.nerf_mlp_apply`` using the kernel.

    Args:
        samples: ``[N, S, 3]`` world-space sample positions.
        direc: ``[N, 3]`` per-ray directions.

    Returns:
        ``density [N, S, 1]``, ``rgb [N, S, 3]`` (fp32).
    """
    n, s, _ = samples.shape
    direc = direc / jnp.linalg.norm(direc, axis=-1, keepdims=True)
    d_pts = jnp.broadcast_to(direc[:, None, :], samples.shape).reshape(-1, 3)
    x_pts = (samples / math.pi).reshape(-1, 3)  # normalize_coordinates

    p = n * s
    pad = (-p) % tile
    if pad:
        x_pts = jnp.concatenate([x_pts, jnp.zeros((pad, 3), x_pts.dtype)])
        d_pts = jnp.concatenate([d_pts, jnp.ones((pad, 3), d_pts.dtype)])

    ws_and_bs = flatten_mlp_params(params, compute_dtype)
    sigma, rgb = _pallas_points_forward(
        ws_and_bs, x_pts, d_pts, position_dim, direction_dim,
        compute_dtype=compute_dtype, tile=tile, interpret=interpret,
    )
    return sigma[:p].reshape(n, s, 1), rgb[:p].reshape(n, s, 3)


def make_pallas_mlp_apply(tile: int = DEFAULT_TILE, interpret: bool = False,
                          differentiable: bool = False):
    """An ``mlp_apply`` hook for ``models.nerf.render_rays``.

    Args:
        differentiable: use the custom-VJP path (fused Pallas backward with
            in-VMEM recompute) so the hook works under ``jax.grad``. Input
            (position/direction) cotangents are zero — only weight gradients
            are produced, which is exactly what NeRF training needs.
    """

    def apply_fn(params, samples, direc, position_dim=10, direction_dim=4,
                 compute_dtype=None):
        fn = nerf_mlp_pallas_apply_diff if differentiable else nerf_mlp_pallas_apply
        return fn(
            params, samples, direc, position_dim, direction_dim,
            compute_dtype=compute_dtype, tile=tile, interpret=interpret,
        )

    return apply_fn


# --------------------------------------------------------------------------
# Fused backward: custom VJP with per-tile recompute in VMEM.
#
# The backward kernel re-runs the forward chain for its tile (activations
# never hit HBM), then walks the chain in reverse accumulating weight/bias
# gradients into revisited output blocks (TPU grid steps are sequential, so
# read-modify-write accumulation across grid iterations is safe — see
# pallas_guide.md "Grid and Block Specifications"). ReLU masks are recovered
# from recomputed outputs ((y > 0) == (pre > 0) for y = relu(pre)).
#
# Cotangents for the point inputs are returned as zeros: in NeRF training
# nothing trainable is upstream of the sample positions/directions
# (positions are o + t*d with RNG-drawn t; see models/nerf.py render_rays).
# --------------------------------------------------------------------------


def _mmT(a, w, dtype):
    """``a @ w.T`` for ``w [in, out]``: contract last dims."""
    return jax.lax.dot_general(
        a.astype(dtype), w[:].astype(dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _aTb(a, b, dtype):
    """``a.T @ b``: contract row dims -> ``[a_cols, b_cols]``."""
    return jax.lax.dot_general(
        a.astype(dtype), b.astype(dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _nerf_mlp_bwd_kernel(
    position_dim: int,
    direction_dim: int,
    dtype,
    # inputs
    x_ref, d_ref, dsig_ref, drgb_ref,
    t0w, t1w, t2w, t3w, f0wh, f0we, f1w, f2w, dw, r0wh, r0wd, r1w,
    t0b, t1b, t2b, t3b, f0b, f1b, f2b, db, r0b, r1b,
    # grad outputs (accumulated across the grid)
    g_t0w, g_t1w, g_t2w, g_t3w, g_f0wh, g_f0we, g_f1w, g_f2w, g_dw,
    g_r0wh, g_r0wd, g_r1w,
    g_t0b, g_t1b, g_t2b, g_t3b, g_f0b, g_f1b, g_f2b, g_db, g_r0b, g_r1b,
):
    # ---- recompute forward (identical to _nerf_mlp_kernel) ----
    e = _encode_in_kernel(x_ref[:], position_dim, dtype)
    ed = _encode_in_kernel(d_ref[:], direction_dim, dtype)
    a0 = jax.nn.relu(_mm(e, t0w, dtype) + t0b[:])
    a1 = jax.nn.relu(_mm(a0, t1w, dtype) + t1b[:])
    a2 = jax.nn.relu(_mm(a1, t2w, dtype) + t2b[:])
    a3 = jax.nn.relu(_mm(a2, t3w, dtype) + t3b[:])
    a4 = jax.nn.relu(_mm(a3, f0wh, dtype) + _mm(e, f0we, dtype) + f0b[:])
    a5 = jax.nn.relu(_mm(a4, f1w, dtype) + f1b[:])
    h = _mm(a5, f2w, dtype) + f2b[:]
    sg = jax.nn.relu(_mm(h, dw, dtype) + db[:])
    r0 = jax.nn.relu(_mm(h, r0wh, dtype) + _mm(ed, r0wd, dtype) + r0b[:])
    rgb = jax.nn.sigmoid(_mm(r0, r1w, dtype) + r1b[:])

    # ---- reverse sweep ----
    g_rgbpre = drgb_ref[:] * rgb * (1.0 - rgb)
    g_r0 = _mmT(g_rgbpre, r1w, dtype) * (r0 > 0)
    g_sigpre = dsig_ref[:] * (sg > 0)
    g_h = _mmT(g_r0, r0wh, dtype) + _mmT(g_sigpre, dw, dtype)
    g_a5 = _mmT(g_h, f2w, dtype) * (a5 > 0)
    g_a4 = _mmT(g_a5, f1w, dtype) * (a4 > 0)
    g_a3 = _mmT(g_a4, f0wh, dtype) * (a3 > 0)
    g_a2 = _mmT(g_a3, t3w, dtype) * (a2 > 0)
    g_a1 = _mmT(g_a2, t2w, dtype) * (a1 > 0)
    g_a0 = _mmT(g_a1, t1w, dtype) * (a0 > 0)

    updates = [
        (g_t0w, _aTb(e, g_a0, dtype)), (g_t0b, jnp.sum(g_a0, 0, keepdims=True)),
        (g_t1w, _aTb(a0, g_a1, dtype)), (g_t1b, jnp.sum(g_a1, 0, keepdims=True)),
        (g_t2w, _aTb(a1, g_a2, dtype)), (g_t2b, jnp.sum(g_a2, 0, keepdims=True)),
        (g_t3w, _aTb(a2, g_a3, dtype)), (g_t3b, jnp.sum(g_a3, 0, keepdims=True)),
        (g_f0wh, _aTb(a3, g_a4, dtype)), (g_f0we, _aTb(e, g_a4, dtype)),
        (g_f0b, jnp.sum(g_a4, 0, keepdims=True)),
        (g_f1w, _aTb(a4, g_a5, dtype)), (g_f1b, jnp.sum(g_a5, 0, keepdims=True)),
        (g_f2w, _aTb(a5, g_h, dtype)), (g_f2b, jnp.sum(g_h, 0, keepdims=True)),
        (g_dw, _aTb(h, g_sigpre, dtype)), (g_db, jnp.sum(g_sigpre, 0, keepdims=True)),
        (g_r0wh, _aTb(h, g_r0, dtype)), (g_r0wd, _aTb(ed, g_r0, dtype)),
        (g_r0b, jnp.sum(g_r0, 0, keepdims=True)),
        (g_r1w, _aTb(r0, g_rgbpre, dtype)),
        (g_r1b, jnp.sum(g_rgbpre, 0, keepdims=True)),
    ]

    is_first = pl.program_id(0) == 0

    @pl.when(is_first)
    def _():
        for ref, val in updates:
            ref[:] = val

    @pl.when(jnp.logical_not(is_first))
    def _():
        for ref, val in updates:
            ref[:] = ref[:] + val


@functools.partial(
    jax.jit,
    static_argnames=("position_dim", "direction_dim", "compute_dtype", "tile",
                     "interpret"),
)
def _pallas_points_backward(
    ws_and_bs,
    x_pts, d_pts, dsig, drgb,
    position_dim: int,
    direction_dim: int,
    compute_dtype=None,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
):
    ws, bs = ws_and_bs
    p = x_pts.shape[0]
    assert p % tile == 0, (p, tile)
    grid = (p // tile,)
    dtype = compute_dtype or jnp.float32

    point_spec = lambda c: pl.BlockSpec(
        (tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    const_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    # grad outputs revisit block 0 every grid step -> accumulate in VMEM
    acc_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )

    # grad output order: 12 weights then 10 biases, matching kernel signature
    grad_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws] + [
        jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs
    ]
    grad_specs = [acc_spec(s) for s in grad_shapes]

    kernel = functools.partial(
        _nerf_mlp_bwd_kernel, position_dim, direction_dim, dtype
    )
    grads = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[point_spec(3), point_spec(3), point_spec(1), point_spec(3)]
        + [const_spec(w) for w in ws]
        + [const_spec(b) for b in bs],
        out_specs=grad_specs,
        out_shape=grad_shapes,
        interpret=interpret,
    )(x_pts, d_pts, dsig, drgb, *ws, *bs)
    return list(grads[:12]), list(grads[12:])


def _unflatten_mlp_grads(gws, gbs, params: Params) -> Params:
    """Inverse of ``flatten_mlp_params`` for gradient pytrees (fp32)."""
    width = params["trunk"][0]["w"].shape[1]
    return {
        "trunk": [
            {"w": gws[0], "b": gbs[0].reshape(-1)},
            {"w": gws[1], "b": gbs[1].reshape(-1)},
            {"w": gws[2], "b": gbs[2].reshape(-1)},
            {"w": gws[3], "b": gbs[3].reshape(-1)},
        ],
        "feature": [
            {"w": jnp.concatenate([gws[4], gws[5]], axis=0),
             "b": gbs[4].reshape(-1)},
            {"w": gws[6], "b": gbs[5].reshape(-1)},
            {"w": gws[7], "b": gbs[6].reshape(-1)},
        ],
        "density": {"w": gws[8], "b": gbs[7].reshape(-1)},
        "rgb": [
            {"w": jnp.concatenate([gws[9], gws[10]], axis=0),
             "b": gbs[8].reshape(-1)},
            {"w": gws[11], "b": gbs[9].reshape(-1)},
        ],
    }


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7)
)
def _pallas_apply_core(
    params, x_pts, d_pts, position_dim, direction_dim, compute_dtype, tile,
    interpret,
):
    ws_and_bs = flatten_mlp_params(params, compute_dtype)
    return _pallas_points_forward(
        ws_and_bs, x_pts, d_pts, position_dim, direction_dim,
        compute_dtype=compute_dtype, tile=tile, interpret=interpret,
    )


def _pallas_apply_fwd(
    params, x_pts, d_pts, position_dim, direction_dim, compute_dtype, tile,
    interpret,
):
    out = _pallas_apply_core(
        params, x_pts, d_pts, position_dim, direction_dim, compute_dtype,
        tile, interpret,
    )
    return out, (params, x_pts, d_pts)


def _pallas_apply_bwd(
    position_dim, direction_dim, compute_dtype, tile, interpret, residuals, g
):
    params, x_pts, d_pts = residuals
    dsig, drgb = g
    ws_and_bs = flatten_mlp_params(params, compute_dtype)
    gws, gbs = _pallas_points_backward(
        ws_and_bs, x_pts, d_pts, dsig, drgb,
        position_dim, direction_dim,
        compute_dtype=compute_dtype, tile=tile, interpret=interpret,
    )
    gparams = _unflatten_mlp_grads(gws, gbs, params)
    # no input cotangents: nothing trainable upstream of the sample points
    return gparams, jnp.zeros_like(x_pts), jnp.zeros_like(d_pts)


_pallas_apply_core.defvjp(_pallas_apply_fwd, _pallas_apply_bwd)


def nerf_mlp_pallas_apply_diff(
    params: Params,
    samples: jnp.ndarray,
    direc: jnp.ndarray,
    position_dim: int = 10,
    direction_dim: int = 4,
    compute_dtype=None,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
):
    """Differentiable (custom-VJP) variant of ``nerf_mlp_pallas_apply``."""
    n, s, _ = samples.shape
    direc = direc / jnp.linalg.norm(direc, axis=-1, keepdims=True)
    d_pts = jnp.broadcast_to(direc[:, None, :], samples.shape).reshape(-1, 3)
    x_pts = (samples / math.pi).reshape(-1, 3)

    p = n * s
    pad = (-p) % tile
    if pad:
        x_pts = jnp.concatenate([x_pts, jnp.zeros((pad, 3), x_pts.dtype)])
        d_pts = jnp.concatenate([d_pts, jnp.ones((pad, 3), d_pts.dtype)])

    sigma, rgb = _pallas_apply_core(
        params, x_pts, d_pts, position_dim, direction_dim, compute_dtype,
        tile, interpret,
    )
    return sigma[:p].reshape(n, s, 1), rgb[:p].reshape(n, s, 3)
