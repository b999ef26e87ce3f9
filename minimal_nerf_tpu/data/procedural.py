"""Procedural analytic scenes: self-contained ground truth for e2e training.

The Blender-synthetic dataset cannot ship with the repo, so this module
generates NeRF-compatible scenes from an analytic density/color field
(soft-edged colored spheres inside the [-1.5, 1.5]^3 box) rendered with the
SAME transmittance compositing math the model learns (``ops.rendering``), at
high sample count for near-exact integration. Poses follow the reference's
spherical orbit (radius 4, the near=2/far=6 frustum).

Used by: the end-to-end quality tests (train -> PSNR on held-out views), the
benchmark's convergence mode, and as a demo dataset
(``python -m minimal_nerf_tpu.data.procedural --out DIR`` writes a
transforms_{split}.json + PNG tree the CLIs consume directly).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from minimal_nerf_tpu.data.synthetic import SyntheticScene
from minimal_nerf_tpu.ops import cameras, rendering
from minimal_nerf_tpu.utils import imageio as mio


@dataclasses.dataclass(frozen=True)
class SphereField:
    """K soft spheres: centers ``[K,3]``, radii ``[K]``, colors ``[K,3]``,
    peak densities ``[K]``."""

    centers: np.ndarray
    radii: np.ndarray
    colors: np.ndarray
    densities: np.ndarray

    @classmethod
    def random(cls, key: int = 0, num_spheres: int = 6) -> "SphereField":
        rng = np.random.default_rng(key)
        return cls(
            centers=rng.uniform(-1.0, 1.0, (num_spheres, 3)).astype(np.float32),
            radii=rng.uniform(0.25, 0.6, num_spheres).astype(np.float32),
            colors=rng.uniform(0.1, 1.0, (num_spheres, 3)).astype(np.float32),
            densities=rng.uniform(20.0, 60.0, num_spheres).astype(np.float32),
        )

    @classmethod
    def random_object(cls, key: int = 0, num_spheres: int = 48) -> "SphereField":
        """A compact object: many small primitives clustered near the origin.

        Unlike :meth:`random` (large spheres spread through the box), this
        matches the Blender scenes' occupancy profile — fine structure
        inside a ~0.8-radius ball, the rest of the [near, far] frustum
        empty — which is the regime occupancy-guided sampling targets.
        """
        rng = np.random.default_rng(key)
        # cluster centers inside a ball (rejection-free: scale gaussian dirs)
        dirs = rng.normal(size=(num_spheres, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True) + 1e-9
        r = 0.75 * rng.random(num_spheres) ** (1 / 3)  # uniform in ball
        return cls(
            centers=(dirs * r[:, None]).astype(np.float32),
            radii=rng.uniform(0.06, 0.22, num_spheres).astype(np.float32),
            colors=rng.uniform(0.1, 1.0, (num_spheres, 3)).astype(np.float32),
            densities=rng.uniform(40.0, 120.0, num_spheres).astype(np.float32),
        )

    @classmethod
    def random_thin(cls, key: int = 0, num_branches: int = 6,
                    steps_per_branch: int = 36) -> "SphereField":
        """Thin branching structure (ficus/mic analogue).

        Tiny beads along random-walk branches growing up from a trunk —
        the hardest occupancy profile in the Blender set: sub-percent
        occupied volume, fine geometry, mostly-empty crops (the regime
        the reference's ``-cr`` center-crop warmup exists for,
        reference ``README.md:46-47``).
        """
        rng = np.random.default_rng(key)
        centers = [np.linspace([0.0, -0.85, 0.0], [0.0, -0.1, 0.0], 10)]
        for _ in range(num_branches):
            pos = np.array([0.0, rng.uniform(-0.3, 0.1), 0.0])
            step = rng.normal(size=3)
            step[1] = abs(step[1])  # grow upward
            step /= np.linalg.norm(step) + 1e-9
            pts = []
            for _ in range(steps_per_branch):
                step += 0.22 * rng.normal(size=3)
                step[1] = abs(step[1]) * 0.6 + 0.15
                step /= np.linalg.norm(step) + 1e-9
                pos = pos + 0.06 * step
                r = np.linalg.norm(pos)
                if r > 0.92:  # keep inside the unit ball
                    pos = pos * (0.92 / r)
                pts.append(pos.copy())
            centers.append(np.stack(pts))
        centers = np.concatenate(centers).astype(np.float32)
        k = centers.shape[0]
        return cls(
            centers=centers,
            radii=rng.uniform(0.015, 0.04, k).astype(np.float32),
            colors=rng.uniform(0.15, 1.0, (k, 3)).astype(np.float32),
            densities=rng.uniform(160.0, 320.0, k).astype(np.float32),
        )

    @classmethod
    def random_shell(cls, key: int = 0, num_spheres: int = 110) -> "SphereField":
        """Hollow shell (ship-hull/materials analogue): beads on an
        ellipsoid surface, empty both inside and outside — occupancy is
        a thin 2-D surface embedded in the 3-D frustum."""
        rng = np.random.default_rng(key)
        dirs = rng.normal(size=(num_spheres, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True) + 1e-9
        axes = np.array([0.85, 0.45, 0.65])
        return cls(
            centers=(dirs * axes).astype(np.float32),
            radii=rng.uniform(0.05, 0.12, num_spheres).astype(np.float32),
            colors=rng.uniform(0.1, 1.0, (num_spheres, 3)).astype(np.float32),
            densities=rng.uniform(50.0, 140.0, num_spheres).astype(np.float32),
        )

    def field(self, pts: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Analytic (density, rgb) at points ``[..., 3]``.

        Density: smooth bump ``sigma_k * sigmoid((r_k - |x - c_k|) / w)``
        summed over spheres; color: density-weighted sphere colors.
        """
        d2 = jnp.sum(
            (pts[..., None, :] - self.centers) ** 2, axis=-1
        )  # [..., K]
        dist = jnp.sqrt(d2 + 1e-12)
        w = 0.02  # edge softness
        act = jax.nn.sigmoid((self.radii - dist) / w)  # [..., K]
        sigma_k = act * self.densities
        sigma = jnp.sum(sigma_k, axis=-1, keepdims=True)  # [..., 1]
        rgb = jnp.einsum("...k,kc->...c", sigma_k, jnp.asarray(self.colors)) / (
            sigma + 1e-9
        )
        return sigma, jnp.clip(rgb, 0.0, 1.0)


import functools


@functools.partial(jax.jit, static_argnames=("num_samples", "near", "far"))
def _render_chunk_analytic(
    centers, radii, colors, densities, o_c, d_c, k, num_samples, near, far
):
    """Module-level jitted chunk renderer: one compile serves ALL frames
    (a per-frame closure would re-trace/compile per view — minutes each
    through this environment's remote-compile queue)."""
    field = SphereField(centers, radii, colors, densities)
    samples, ts = rendering.generate_coarse_samples(
        k, o_c, d_c, num_samples, near, far
    )
    sigma, rgb = field.field(samples)
    deltas = rendering.generate_deltas(ts)
    weights = rendering.calculate_unnormalized_weights(sigma, deltas)
    return rendering.estimate_ray_color(weights, rgb)


def render_analytic_view(
    field: SphereField,
    pose: np.ndarray,
    height: int,
    width: int,
    focal: float,
    num_samples: int = 256,
    near: float = 2.0,
    far: float = 6.0,
    chunk: int = 65536,
) -> np.ndarray:
    """Ground-truth render of one view via dense stratified integration.

    Returns:
        ``[H, W, 3]`` uint8 image (black background, like the Blender RGBs).
    """
    o, d = cameras.get_rays(height, width, focal, pose)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    n = o.shape[0]
    # pad to a chunk multiple so every dispatch reuses one compiled shape
    pad = (-n) % chunk
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
    key = jax.random.PRNGKey(0)
    args = (
        jnp.asarray(field.centers), jnp.asarray(field.radii),
        jnp.asarray(field.colors), jnp.asarray(field.densities),
    )
    out = []
    for i in range(0, n + pad, chunk):
        out.append(
            np.asarray(
                _render_chunk_analytic(
                    *args, o[i : i + chunk], d[i : i + chunk],
                    jax.random.fold_in(key, i),
                    num_samples=num_samples, near=near, far=far,
                )
            )
        )
    im = np.concatenate(out)[:n].reshape(height, width, 3)
    return (np.clip(im, 0.0, 1.0) * 255.0).astype(np.uint8)


def make_procedural_scene(
    split_frames=(("train", 20), ("val", 2), ("test", 4)),
    height: int = 100,
    width: int = 100,
    camera_angle_x: float = 0.6911112070083618,
    field: Optional[SphereField] = None,
    seed: int = 0,
    gt_samples: int = 256,
    scene: str = "field",
    chunk: int = 65536,
):
    """Generate in-memory ``SyntheticScene``s for each split.

    Poses are drawn from the spherical orbit with split-specific azimuth
    offsets (train/val/test see distinct viewpoints) and slight elevation
    variation.

    Args:
        scene: ``"field"`` (large spheres through the box), ``"object"``
            (compact Blender-like cluster), ``"thin"`` (branching
            ficus/mic-like structure) or ``"shell"`` (hollow
            ship-hull-like surface).

    Returns:
        dict split -> SyntheticScene, plus the generating ``field``.
    """
    if field is None:
        makers = {
            "field": SphereField.random,
            "object": SphereField.random_object,
            "thin": SphereField.random_thin,
            "shell": SphereField.random_shell,
        }
        field = makers[scene](seed)
    focal = cameras.focal_from_angle(width, camera_angle_x)
    scenes = {}
    offsets = {"train": 0.0, "val": 3.1, "test": 7.3}
    for si, (split, n_frames) in enumerate(split_frames):
        images, poses = [], []
        for i in range(n_frames):
            theta = -180.0 + (360.0 / n_frames) * i + offsets.get(split, 0.0)
            phi = -30.0 + 10.0 * np.sin(2.1 * i + si)
            pose = cameras.pose_spherical(theta, phi, 4.0)
            images.append(
                render_analytic_view(
                    field, pose, height, width, focal,
                    num_samples=gt_samples, chunk=chunk,
                )
            )
            poses.append(pose)
        scenes[split] = SyntheticScene(
            images=np.stack(images),
            poses=np.stack(poses).astype(np.float32),
            focal=focal,
            camera_angle_x=camera_angle_x,
            split=split,
            base_dir="<procedural>",
        )
    return scenes, field


def save_scene_tree(scenes, out_dir) -> Path:
    """Write ``transforms_{split}.json`` + PNGs so the CLIs can consume it."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for split, scene in scenes.items():
        (out / split).mkdir(exist_ok=True)
        frames = []
        for i in range(scene.num_frames):
            rel = f"./{split}/r_{i}"
            mio.imwrite(out / split / f"r_{i}.png", scene.images[i])
            frames.append(
                {
                    "file_path": rel,
                    "rotation": 0.0,
                    "transform_matrix": np.asarray(scene.poses[i]).tolist(),
                }
            )
        with open(out / f"transforms_{split}.json", "w") as f:
            json.dump(
                {"camera_angle_x": scene.camera_angle_x, "frames": frames}, f
            )
    return out


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description="Generate a procedural scene tree")
    parser.add_argument("--out", required=True)
    parser.add_argument("--size", type=int, default=100, help="image H=W")
    parser.add_argument("--train-frames", type=int, default=20)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--gt-samples", type=int, default=256,
                        help="integration samples/ray for the ground-truth "
                             "render (lower for quick fixtures)")
    parser.add_argument("--chunk", type=int, default=65536,
                        help="rays per render dispatch (lower on CPU)")
    parser.add_argument("--scene", choices=["field", "object", "thin", "shell"],
                        default="field",
                        help="occupancy archetype: 'object' = compact "
                             "Blender-like cluster, 'thin' = branching "
                             "ficus/mic-like, 'shell' = hollow ship-like")
    args = parser.parse_args()
    scenes, _ = make_procedural_scene(
        split_frames=(("train", args.train_frames), ("val", 2), ("test", 4)),
        height=args.size,
        width=args.size,
        seed=args.seed,
        scene=args.scene,
        gt_samples=args.gt_samples,
        chunk=args.chunk,
    )
    save_scene_tree(scenes, args.out)
    print(f"wrote procedural scene to {args.out}")
