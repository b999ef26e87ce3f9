"""minimal-nerf-tpu: a TPU-native (JAX/XLA/Pallas) NeRF framework.

A ground-up rebuild of the capabilities of the reference PyTorch implementation
(NakuraMino/CSE-573-Minimal-NeRF) designed for TPU hardware:

- all rendering math (stratified sampling, inverse-CDF hierarchical sampling,
  positional encoding, transmittance compositing) is pure, jit-compiled
  ``jax.numpy`` with explicit PRNG keys (``minimal_nerf_tpu.ops``),
- the coarse/fine MLPs are plain-pytree parameter trees evaluated by pure
  functions so the same weights feed either the XLA path or the fused Pallas
  ray-march kernel (``minimal_nerf_tpu.models``, ``minimal_nerf_tpu.kernels``),
- the data pipeline loads each Blender-synthetic split once into device arrays
  and fuses ray generation + pixel sampling into the jitted train step
  (``minimal_nerf_tpu.data``) instead of re-raycasting a full image per batch,
- training is a single donated jit (or ``shard_map`` over a device mesh for
  data-parallel scale-out) with optax Adam + exponential LR decay
  (``minimal_nerf_tpu.training``, ``minimal_nerf_tpu.parallel``).
"""

__version__ = "0.1.0"

from minimal_nerf_tpu.ops import encoding, rendering, cameras  # noqa: F401
