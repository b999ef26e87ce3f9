"""Parallelism layer: device meshes and sharding for data-parallel training.

The reference has no distributed support of any kind (SURVEY.md section 2,
``train_nerf.py:26``). This subsystem is the TPU-native addition: rays are
embarrassingly parallel, so training shards the ray batch over a 1-D
``('data',)`` mesh (params replicated, XLA inserts the grad ``psum`` over ICI)
and rendering/scoring shards views or ray chunks the same way.
"""

from minimal_nerf_tpu.parallel import distributed  # noqa: F401
from minimal_nerf_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
