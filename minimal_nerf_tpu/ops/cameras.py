"""Camera math: pinhole ray generation, spherical poses, NDC projection.

This module sits below both the data pipeline and the rendering helpers
(fixing the reference's circular-ish import between ``nerf_helpers.py:11`` and
``dataloader.py``). Everything is pure jnp / numpy and jit-friendly.

Behavioral parity notes:

- ``get_rays`` matches reference ``dataloader.py:36-43`` (itself from
  bmild/nerf): pixel grid in xy-order, dirs ``[(i - W/2)/f, -(j - H/2)/f, -1]``
  rotated by ``c2w[:3, :3]``; origins broadcast from ``c2w[:3, -1]``.
  Directions are intentionally NOT normalized (see ``ops.rendering``).
- ``pose_spherical`` matches reference ``nerf_helpers.py:258-284``.
- ``convert_to_ndc_rays`` matches reference ``dataloader.py:45-76``
  (front-facing scenes only; unused in the Blender-synthetic path, kept for
  surface parity).
- ``focal_from_angle`` matches ``dataloader.py:121``:
  ``0.5 * W / tan(0.5 * camera_angle_x)``.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def focal_from_angle(width: float, camera_angle_x: float) -> float:
    """Focal length in pixels from the horizontal field of view."""
    return 0.5 * width / math.tan(0.5 * camera_angle_x)


def pixel_dirs(
    xs: jnp.ndarray, ys: jnp.ndarray, height: int, width: int, focal
) -> jnp.ndarray:
    """Camera-frame direction for pixel coordinates ``(xs, ys)``.

    Args:
        xs: ``[...]`` pixel column indices (float or int).
        ys: ``[...]`` pixel row indices.

    Returns:
        ``[..., 3]`` camera-frame directions ``[(x-W/2)/f, -(y-H/2)/f, -1]``.
    """
    xs = jnp.asarray(xs, jnp.float32)
    ys = jnp.asarray(ys, jnp.float32)
    return jnp.stack(
        [
            (xs - width * 0.5) / focal,
            -(ys - height * 0.5) / focal,
            -jnp.ones_like(xs),
        ],
        axis=-1,
    )


def get_rays(
    height: int, width: int, focal, c2w: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rays for every pixel of a pinhole camera.

    Args:
        height/width: image size in pixels.
        focal: focal length in pixels.
        c2w: ``[3|4, 4]`` camera-to-world matrix.

    Returns:
        ``rays_o [H, W, 3]`` (identical rows), ``rays_d [H, W, 3]``.
    """
    c2w = jnp.asarray(c2w, jnp.float32)
    i, j = jnp.meshgrid(
        jnp.arange(width, dtype=jnp.float32),
        jnp.arange(height, dtype=jnp.float32),
        indexing="xy",
    )
    dirs = pixel_dirs(i, j, height, width, focal)  # [H, W, 3]
    rays_d = jnp.sum(dirs[..., None, :] * c2w[:3, :3], axis=-1)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def rays_for_pixels(
    xs: jnp.ndarray, ys: jnp.ndarray, height: int, width: int, focal, c2w: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rays for a sparse set of pixels — the TPU-native hot path.

    Instead of raycasting the full ``H x W`` grid and gathering 4096 rays (the
    reference recomputes 640k rays per step, ``dataloader.py:147-149``), the
    jitted train step calls this on just the sampled coordinates.

    Args:
        xs, ys: ``[N]`` pixel coordinates.
        c2w: ``[3|4, 4]`` or batched ``[..., 3|4, 4]`` camera-to-world.

    Returns:
        ``rays_o [N, 3]``, ``rays_d [N, 3]``.
    """
    c2w = jnp.asarray(c2w, jnp.float32)
    dirs = pixel_dirs(xs, ys, height, width, focal)  # [N, 3]
    rays_d = jnp.sum(dirs[..., None, :] * c2w[..., :3, :3], axis=-1)
    rays_o = jnp.broadcast_to(c2w[..., :3, -1], rays_d.shape)
    return rays_o, rays_d


def _trans_t(t: float) -> np.ndarray:
    return np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, t], [0, 0, 0, 1]], dtype=np.float32
    )


def _rot_phi(phi: float) -> np.ndarray:
    c, s = np.cos(phi), np.sin(phi)
    return np.array(
        [[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]], dtype=np.float32
    )


def _rot_theta(th: float) -> np.ndarray:
    c, s = np.cos(th), np.sin(th)
    return np.array(
        [[c, 0, -s, 0], [0, 1, 0, 0], [s, 0, c, 0], [0, 0, 0, 1]], dtype=np.float32
    )


def pose_spherical(theta_deg: float, phi_deg: float, radius: float) -> np.ndarray:
    """Camera-to-world pose on a sphere (reference ``nerf_helpers.py:279-284``).

    Args:
        theta_deg: azimuth in degrees.  phi_deg: elevation in degrees.
        radius: distance from origin.

    Returns:
        ``[4, 4]`` float32 camera-to-world matrix.
    """
    c2w = _trans_t(radius)
    c2w = _rot_phi(phi_deg / 180.0 * np.pi) @ c2w
    c2w = _rot_theta(theta_deg / 180.0 * np.pi) @ c2w
    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.float32
    )
    return flip @ c2w


def spherical_poses(
    num_poses: int = 40, phi_deg: float = -30.0, radius: float = 4.0
) -> np.ndarray:
    """The reference's 360-degree orbit: ``num_poses`` azimuths in
    ``linspace(-180, 180, num_poses + 1)[:-1]`` (``nerf_helpers.py:179``).

    Returns:
        ``[num_poses, 4, 4]`` float32 poses.
    """
    angles = np.linspace(-180.0, 180.0, num_poses + 1)[:-1]
    return np.stack([pose_spherical(a, phi_deg, radius) for a in angles])


def convert_to_ndc_rays(
    o_rays: jnp.ndarray,
    d_rays: jnp.ndarray,
    focal,
    width: int,
    height: int,
    near: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NDC ray projection for FRONT-FACING scenes (reference ``dataloader.py:45-76``).

    Dead code in the Blender-synthetic path; kept for public-surface parity.

    Args:
        o_rays/d_rays: ``[..., 3]`` rays.

    Returns:
        ``o_ndc [..., 3]``, ``d_ndc [..., 3]`` with d_ndc unit-normalized.
    """
    t_near = -(near + o_rays[..., 2]) / d_rays[..., 2]
    o_rays = o_rays + t_near[..., None] * d_rays

    ox, oy, oz = o_rays[..., 0], o_rays[..., 1], o_rays[..., 2]
    dx, dy, dz = d_rays[..., 0], d_rays[..., 1], d_rays[..., 2]

    ox_new = -1.0 * focal / (width / 2) * (ox / oz)
    oy_new = -1.0 * focal / (height / 2) * (oy / oz)
    oz_new = 1.0 + (2 * near) / oz
    dx_new = -1.0 * focal / (width / 2) * ((dx / dz) - (ox / oz))
    dy_new = -1.0 * focal / (height / 2) * ((dy / dz) - (oy / oz))
    dz_new = (-2.0 * near) / oz

    o_ndc = jnp.stack([ox_new, oy_new, oz_new], axis=-1)
    d_ndc = jnp.stack([dx_new, dy_new, dz_new], axis=-1)
    d_ndc = d_ndc / jnp.linalg.norm(d_ndc, axis=-1, keepdims=True)
    return o_ndc, d_ndc
