"""The core NeRF MLP as a plain parameter pytree + a pure apply function.

Architecture (parity with reference ``nerf_model.py:308-389``):

- trunk: 4 x Linear(->256) with ReLU, input gamma(pos) (``2*3*position_dim``-d),
- skip: re-concat gamma(pos), then Linear(256+enc ->256) ReLU, Linear(256->256)
  ReLU, Linear(256->256) (no activation),
- density head: Linear(256->1) + ReLU (nonnegative density),
- rgb head: concat gamma(dir), Linear(256+enc_dir ->128) ReLU, Linear(128->3)
  + sigmoid.

Directions are unit-normalized and broadcast per sample inside the apply
(reference ``nerf_model.py:373-374``); positions are normalized by pi then
encoded (``:377-379``).

Params are nested dicts of ``{"w": [in, out], "b": [out]}`` — note weights are
stored input-major (``[in, out]``), the transpose of torch's ``Linear.weight``,
so the forward is a plain ``x @ w + b`` feeding the MXU directly. Initialization
matches torch ``nn.Linear`` defaults: ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))``
for both weight and bias (kaiming_uniform(a=sqrt(5)) reduces to this), so
convergence behavior tracks the reference.

TPU note: ``compute_dtype=bfloat16`` casts matmul inputs to bf16 (params stay
fp32, accumulation in fp32 via ``preferred_element_type``) — the MXU's native
fast path. Heads and compositing stay fp32.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from minimal_nerf_tpu.ops.encoding import normalize_coordinates, positional_encoding

Params = Dict[str, Any]


def init_linear(key: jax.Array, in_dim: int, out_dim: int) -> Params:
    """Torch-``nn.Linear``-style init: ``U(+-1/sqrt(in_dim))`` for w and b."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_dim, jnp.float32))
    return {
        "w": jax.random.uniform(
            kw, (in_dim, out_dim), jnp.float32, minval=-bound, maxval=bound
        ),
        "b": jax.random.uniform(
            kb, (out_dim,), jnp.float32, minval=-bound, maxval=bound
        ),
    }


def _linear(p: Params, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    w, b = p["w"], p["b"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y + b.astype(jnp.float32)


def init_nerf_mlp(
    key: jax.Array,
    position_dim: int = 10,
    direction_dim: int = 4,
    width: int = 256,
    rgb_width: int = 128,
) -> Params:
    """Initialize one NeRF MLP (used for both the coarse and fine networks).

    Returns:
        pytree ``{"trunk": [4 linears], "feature": [3 linears],
        "density": linear, "rgb": [2 linears]}``.
    """
    pos_enc = 2 * 3 * position_dim
    dir_enc = 2 * 3 * direction_dim
    keys = iter(jax.random.split(key, 10))
    return {
        "trunk": [
            init_linear(next(keys), pos_enc, width),
            init_linear(next(keys), width, width),
            init_linear(next(keys), width, width),
            init_linear(next(keys), width, width),
        ],
        "feature": [
            init_linear(next(keys), width + pos_enc, width),
            init_linear(next(keys), width, width),
            init_linear(next(keys), width, width),
        ],
        "density": init_linear(next(keys), width, 1),
        "rgb": [
            init_linear(next(keys), width + dir_enc, rgb_width),
            init_linear(next(keys), rgb_width, 3),
        ],
    }


def nerf_mlp_apply(
    params: Params,
    samples: jnp.ndarray,
    direc: jnp.ndarray,
    position_dim: int = 10,
    direction_dim: int = 4,
    compute_dtype=None,
):
    """Forward pass: sample positions + ray directions -> (density, rgb).

    Args:
        params: pytree from ``init_nerf_mlp``.
        samples: ``[N, S, 3]`` world-space sample positions.
        direc: ``[N, 3]`` per-ray directions (broadcast over S inside).
        compute_dtype: optional matmul input dtype (e.g. ``jnp.bfloat16``).

    Returns:
        ``density [N, S, 1]`` (ReLU-rectified), ``rgb [N, S, 3]`` (sigmoid).
    """
    direc = direc / jnp.linalg.norm(direc, axis=-1, keepdims=True)
    direc = jnp.broadcast_to(direc[:, None, :], samples.shape)

    pos_enc = positional_encoding(normalize_coordinates(samples), dim=position_dim)
    dir_enc = positional_encoding(direc, dim=direction_dim)

    x = pos_enc
    for layer in params["trunk"]:
        x = jax.nn.relu(_linear(layer, x, compute_dtype))

    x = jnp.concatenate([x, pos_enc.astype(x.dtype)], axis=-1)
    x = jax.nn.relu(_linear(params["feature"][0], x, compute_dtype))
    x = jax.nn.relu(_linear(params["feature"][1], x, compute_dtype))
    x = _linear(params["feature"][2], x, compute_dtype)  # no activation

    density = jax.nn.relu(_linear(params["density"], x, compute_dtype))

    d = jnp.concatenate([x, dir_enc.astype(x.dtype)], axis=-1)
    d = jax.nn.relu(_linear(params["rgb"][0], d, compute_dtype))
    rgb = jax.nn.sigmoid(_linear(params["rgb"][1], d, compute_dtype))
    return density, rgb
