"""Positional (Fourier-feature) encoding.

Behavioral parity notes (vs. reference ``nerf_model.py:19-54``):

- Channel layout: for each frequency ``i`` in ``range(dim)`` the reference
  appends ``cos(2**i * pi * x)`` (all C input channels) followed by
  ``sin(2**i * pi * x)`` (all C channels), concatenated along the last axis.
  The output layout is therefore ``(dim, [cos|sin], C)`` flattened to
  ``2 * dim * C`` channels — cos-before-sin, grouped per frequency. This exact
  layout matters for checkpoint conversion parity.
- Coordinates are normalized by ``pi`` (empirical Blender scene bound ~[-3, 3])
  before encoding so inputs sit in ~[-1, 1] (reference ``nerf_model.py:35-54``).

TPU notes: the encoding is a pure VPU (elementwise) op; under jit XLA fuses it
into the consumer matmul's producer. The fused Pallas ray-march kernel
(``minimal_nerf_tpu.kernels``) recomputes it on-chip in VMEM instead of
materializing the ``[N, S, 2*dim*C]`` tensor in HBM.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def positional_encoding(x: jnp.ndarray, dim: int = 10) -> jnp.ndarray:
    """Encode ``x`` with ``dim`` octaves of cos/sin Fourier features.

    Args:
        x: ``[..., C]`` array of (already normalized) coordinates.
        dim: number of frequency octaves ``2**i * pi``, ``i in [0, dim)``.

    Returns:
        ``[..., 2 * dim * C]`` encoding laid out frequency-major:
        ``[cos(2^0 pi x), sin(2^0 pi x), cos(2^1 pi x), ...]``.
    """
    c = x.shape[-1]
    freqs = (2.0 ** jnp.arange(dim, dtype=x.dtype)) * jnp.asarray(math.pi, x.dtype)
    # [..., dim, C] angles; stack cos before sin per frequency.
    angles = x[..., None, :] * freqs[:, None]
    enc = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-2)  # [..., dim, 2, C]
    return enc.reshape(*x.shape[:-1], 2 * dim * c)


def normalize_coordinates(x: jnp.ndarray, bound: float = math.pi) -> jnp.ndarray:
    """Scale coordinates from ``[-bound, bound]`` into ``[-1, 1]``.

    ``bound`` defaults to ``pi`` to match the reference (``nerf_model.py:35``).
    """
    return x / bound
