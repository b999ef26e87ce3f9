"""Device-mesh construction and sharding helpers (data-parallel over rays)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    n_devices: Optional[int] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """A 1-D ``('data',)`` mesh over the first ``n_devices`` devices.

    Args:
        n_devices: mesh size; defaults to all visible devices.
        devices: explicit device list (overrides ``n_devices``).
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if n_devices > len(devices):
                raise ValueError(
                    f"requested a {n_devices}-device mesh but only "
                    f"{len(devices)} devices are visible"
                )
            devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated placement (params, images, poses)."""
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (ray-batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(x, mesh: Mesh):
    """Constrain an in-jit value to be batch-sharded over the data axis."""
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))
    )
