"""VMEM-resident Pallas lowering of the occupancy bin probe.

The occupancy sampler's hot query is 262k independent bit lookups per step
(``N rays x B bins`` probes into the bit-packed ``G^3`` grid,
``ops/occupancy.query_bin_weights``). TPU has no hardware gather, so the two
XLA lowerings are per-element scalar probes (``_probe_bits_gather``, 1.9 ms
at production shapes) or the one-hot MXU matmul (``_probe_bits_onehot``,
the current default) whose ``[P, n_hi]`` one-hot and ``[P, 128]`` row
products round-trip ~270 MB of HBM per step.

This kernel runs the SAME one-hot-matmul resolution entirely in VMEM: the
word table (32 KiB at the default 64^3 grid, stored as exact-in-f32 u16
halves) is a grid-constant VMEM block, and each grid step materializes its
``[P_blk, n_hi]`` one-hot, row product, and lane select only on-chip — the
only HBM traffic is ``lin`` in (1 MB) and the bits out (1 MB). Bit-identical
to both XLA lowerings (tests/test_occupancy.py); selected via
``OccupancyConfig.probe_method = "pallas"``.

Layout note: probes enter the kernel probe-major as ``[P, 1]`` (one probe
per sublane). Mosaic cannot shape-cast a packed ``[rows, 128]`` block to
probe-major inside the kernel ("unsupported shape cast"), and the one-hot
matmul needs probes on MXU rows; the ``[P, 1]`` elementwise ops waste lanes
but are a negligible fraction of the block's work.

There is no reference counterpart (the reference has no acceleration
structure, SURVEY.md #5); this is a pure performance lowering for the
framework's occupancy subsystem.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# probes per grid step: [P_BLK, n_hi] one-hot + [P_BLK, 128] rows are the
# peak VMEM residents (2 MB each in f32 at the default n_hi=128)
_P_BLK = 4096


def _probe_kernel(n_hi, lin_ref, table_ref, out_ref):
    """One block of probes: one-hot row fetch + lane select, all in VMEM.

    ``lin_ref``: ``[P_BLK, 1]`` int32 linear cell indices (probe-major).
    ``table_ref``: ``[n_hi, 128]`` f32 — word ``w``'s u16 halves at row
    ``w >> 6``, lanes ``(w & 63) * 2`` and ``+1`` (exact in f32).
    ``out_ref``: ``[P_BLK, 1]`` int32 probe bits (0/1).
    """
    p = lin_ref.shape[0]

    lin = lin_ref[:]  # [P, 1]
    w = lin >> 5  # word index
    # lane of the u16 half inside the table row: lo*2 + which-half
    lane = ((w & 63) << 1) | ((lin >> 4) & 1)

    # [P, n_hi] one-hot of the table row; exact-f32 contraction fetches each
    # probe's 128-lane table row without any gather
    cols = jax.lax.broadcasted_iota(jnp.int32, (p, n_hi), 1)
    oh = ((w >> 6) == cols).astype(jnp.float32)
    rows = jax.lax.dot(
        oh, table_ref[:], precision=jax.lax.Precision.HIGHEST
    )  # [P, 128]

    # select the probe's u16 half, then extract the in-half bit exactly
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (p, 128), 1)
    half16 = jnp.sum(
        jnp.where(lane == lane_ids, rows, 0.0), axis=1, keepdims=True
    ).astype(jnp.int32)  # [P, 1]
    out_ref[:] = (half16 >> (lin & 15)) & 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def probe_bits_pallas(
    occ_words: jnp.ndarray, lin: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Per-probe occupancy bits, computed VMEM-resident.

    Drop-in for ``ops.occupancy._probe_bits_gather`` (same contract:
    ``occ_words [G^3 // 32]`` uint32, ``lin [...]`` int32 linear cell
    indices -> uint32 0/1 bits of ``lin``'s shape). Bit-identical results.
    """
    n = occ_words.size
    n_hi = -(-n // 64)
    words = jnp.pad(occ_words, (0, n_hi * 64 - n))
    # [n_hi, 64 words, 2 u16 halves] -> [n_hi, 128]; u16 is exact in f32
    table = (
        jnp.stack([words & 0xFFFF, words >> 16], axis=-1)
        .astype(jnp.float32)
        .reshape(n_hi, 128)
    )

    flat = lin.reshape(-1).astype(jnp.int32)
    p = flat.size
    p_pad = -(-p // _P_BLK) * _P_BLK
    col = jnp.pad(flat, (0, p_pad - p))[:, None]  # [P, 1] probe-major

    grid = (p_pad // _P_BLK,)
    bits = pl.pallas_call(
        functools.partial(_probe_kernel, n_hi),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_P_BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                table.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (_P_BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((p_pad, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(col, table)
    return bits[:p, 0].reshape(lin.shape).astype(jnp.uint32)
