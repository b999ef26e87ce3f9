"""Toy 2-D image NeRF: f(x, y) -> rgb (reference ``ImageNeRFModel``).

Parity with reference ``nerf_model.py:392-445``: optional positional encoding
(disabled when ``position_dim <= 0``), then a 10-layer MLP
(7x256 ReLU, 256->128 ReLU, 128->3 sigmoid).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from minimal_nerf_tpu.models.mlp import init_linear
from minimal_nerf_tpu.ops.encoding import positional_encoding

Params = Dict[str, Any]


def init_image_nerf(key: jax.Array, position_dim: int = 10) -> Params:
    """Initialize the toy image MLP."""
    input_size = 2 * 2 * position_dim if position_dim > 0 else 2
    dims = [input_size, 256, 256, 256, 256, 256, 256, 256, 128, 3]
    keys = jax.random.split(key, len(dims) - 1)
    return {
        "layers": [
            init_linear(k, din, dout)
            for k, din, dout in zip(keys, dims[:-1], dims[1:])
        ]
    }


def image_nerf_apply(
    params: Params, x: jnp.ndarray, position_dim: int = 10
) -> jnp.ndarray:
    """Forward pass: ``[N, 2]`` normalized pixel coords -> ``[N, 3]`` rgb."""
    if position_dim > 0:
        x = positional_encoding(x, dim=position_dim)
    layers = params["layers"]
    for layer in layers[:-1]:
        x = jax.nn.relu(jnp.dot(x, layer["w"]) + layer["b"])
    last = layers[-1]
    return jax.nn.sigmoid(jnp.dot(x, last["w"]) + last["b"])


class ImageNeRFModel:
    """Thin wrapper mirroring the reference class surface."""

    def __init__(self, position_dim: int = 10, params: Params | None = None, seed: int = 0):
        self.position_dim = position_dim
        self.params = (
            params
            if params is not None
            else init_image_nerf(jax.random.PRNGKey(seed), position_dim)
        )

    def forward(self, x):
        return image_nerf_apply(self.params, jnp.asarray(x), self.position_dim)

    __call__ = forward
