"""Multi-process (multi-host) runtime: ``jax.distributed`` + global meshes.

The reference has no distributed backend of any kind (SURVEY.md §2 #28 —
single process, single device, ``train_nerf.py:26``). The TPU-native
replacement: one process per host, wired into a single JAX runtime by
``jax.distributed.initialize`` so ``jax.devices()`` spans every host's chips
and XLA collectives ride ICI within a slice / DCN across slices. The
training step itself is unchanged — the same ``shard_map`` over a
``('data',)`` mesh (``parallel/mesh.py``) simply runs over a mesh whose
devices live on many processes, and the gradient ``pmean`` becomes a
cross-host collective.

Design notes (why this composes with the rest of the framework):

- Train batches are sampled IN-JIT from replicated device-resident scene
  arrays (``training/loop.py:sample_train_batch``), so there is NO host
  data loading to partition across processes: every process runs the same
  program on the same replicated inputs and XLA keeps each device's ray
  shard local. The only per-process work is host-side orchestration.
- Host-side inputs that cross into global-mesh computations must be
  ``jax.Array``s with a global sharding; ``to_global`` promotes
  identical-on-every-process host arrays (val batches, scene arrays).
- Exactly one process (``is_primary``) writes checkpoints, metrics, and
  images; the others run the same computation for its collective side
  effects and discard the host outputs (``training/trainer.py``).

Verified by ``tests/test_distributed.py``: a real 2-process CPU cluster
(Gloo collectives, 4 virtual devices per process) trains the full model on
a global 8-device mesh and lands at the same loss as the single-process
8-device mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join (or form) the multi-process runtime.

    On TPU pods all arguments are auto-detected from the TPU metadata and
    this is a bare ``jax.distributed.initialize()``. For CPU debug clusters
    (and the test suite) pass all three explicitly. Must be called before
    any JAX backend use in the process.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_distributed() -> bool:
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that owns host-side IO (ckpts, metrics, images)."""
    return jax.process_index() == 0


def to_global(x, sharding) -> jax.Array:
    """Promote an identical-on-every-process host array to a global array.

    Every process must pass the same value (deterministic here: everything
    host-side derives from the shared base PRNG key). Each process
    materializes only the shards it is responsible for.
    (``jax.device_put`` refuses shardings with non-addressable devices, so
    multi-process replication must go through ``make_array_from_callback``.)
    """
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def spans_processes(mesh) -> bool:
    """True if the mesh includes devices owned by other processes."""
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def put_replicated(tree, mesh):
    """Replicate a host/local pytree over a (possibly multi-process) mesh."""
    from minimal_nerf_tpu.parallel.mesh import replicated_sharding

    sharding = replicated_sharding(mesh)
    if not spans_processes(mesh):
        return jax.device_put(tree, sharding)
    return jax.tree_util.tree_map(
        lambda x: to_global(jax.device_get(x), sharding), tree
    )


def put_replicated_key(key, mesh):
    """Replicate a PRNG key array over a (possibly multi-process) mesh.

    Key arrays have an extended dtype that ``make_array_from_callback``
    cannot build directly; round-trip through ``key_data``/``wrap_key_data``.
    """
    from minimal_nerf_tpu.parallel.mesh import replicated_sharding

    if not spans_processes(mesh):
        return jax.device_put(key, replicated_sharding(mesh))
    impl = jax.random.key_impl(key)
    data = put_replicated(jax.random.key_data(key), mesh)
    return jax.random.wrap_key_data(data, impl=impl)
