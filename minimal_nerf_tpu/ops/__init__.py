"""Pure-jnp rendering math: encoding, sampling, compositing, cameras, metrics."""

from minimal_nerf_tpu.ops import cameras, encoding, image_metrics, rendering  # noqa: F401
