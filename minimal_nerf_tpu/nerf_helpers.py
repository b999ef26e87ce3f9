"""Reference-shaped helper facade (drop-in familiarity layer).

Re-exports this framework's rendering math under the reference's
``nerf_helpers`` names and signatures (reference ``nerf_helpers.py``), so a
user of the original can find every function where they expect it. Explicit
differences, documented rather than hidden:

- sampling functions take a leading ``key`` argument (JAX explicit PRNG)
  instead of relying on a global torch RNG/device,
- ``view_reconstruction``/``generate_360_view_synthesis`` accept either a
  ``models.nerf.NeRFNetwork`` wrapper or a raw ``render_chunk`` callable.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from minimal_nerf_tpu import views as _views
from minimal_nerf_tpu.ops.cameras import (  # noqa: F401
    convert_to_ndc_rays,
    get_rays,
    pose_spherical,
    spherical_poses,
)
from minimal_nerf_tpu.ops.rendering import (  # noqa: F401
    calculate_unnormalized_weights,
    estimate_ray_color,
    generate_coarse_samples,
    generate_deltas,
    inverse_transform_sampling,
    union_and_sort_ts,
)

photo_nerf_to_image = _views.photo_nerf_to_image
generate_360_view_synthesis = _views.generate_360_view_synthesis


def fix_batchify(batch: Dict) -> None:
    """Squeeze a leading singleton batch axis in-place (reference
    ``nerf_helpers.py:18-26``). Only needed when mimicking a DataLoader that
    wraps ray batches in an extra dimension."""
    for key, value in batch.items():
        batch[key] = value.squeeze(0) if hasattr(value, "squeeze") else value


def torch_to_numpy(tensor, is_normalized_image: bool = False) -> np.ndarray:
    """Array-to-numpy conversion for plotting (reference ``nerf_helpers.py:240-251``).

    Accepts a torch tensor, jax array, or numpy array; moves a ``...CHW``
    layout (ndim >= 4) to ``...HWC`` and optionally rescales a normalized
    image back to [0, 255], exactly like the reference.
    """
    if hasattr(tensor, "detach"):  # torch
        arr = tensor.cpu().clone().detach().numpy()
    else:  # jax / numpy / anything np.asarray understands
        arr = np.array(tensor)
    if arr.ndim >= 4:  # ...CHW -> ...HWC
        arr = np.moveaxis(arr, [-3, -2, -1], [-1, -3, -2])
    if is_normalized_image:
        arr = np.clip(arr * 255, 0, 255)
    return arr


def view_reconstruction(model, all_o_rays, all_d_rays, N: int = 4096) -> np.ndarray:
    """Reference-signature view reconstruction (``nerf_helpers.py:189-210``).

    Args:
        model: a ``models.nerf.NeRFNetwork`` (or any object whose ``forward``
            returns ``{"fine_rgb_rays": ...}``), or a raw ``render_chunk``
            callable ``(o, d, key) -> rgb``.

    Returns:
        ``[H, W, 3]`` uint8 image.
    """
    if callable(model) and not hasattr(model, "forward"):
        render_chunk = model
    else:
        def render_chunk(o, d, key):
            return model.forward(o, d, key=key)["fine_rgb_rays"]

    return _views.view_reconstruction(render_chunk, all_o_rays, all_d_rays, chunk=N)
