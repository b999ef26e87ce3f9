"""Procedural-scene generator tests + a fast end-to-end learn check."""

import pytest

import jax
import numpy as np

from minimal_nerf_tpu.data.procedural import (
    SphereField,
    make_procedural_scene,
    render_analytic_view,
    save_scene_tree,
)
from minimal_nerf_tpu.data.synthetic import SyntheticScene


def test_sphere_field_values():
    field = SphereField.random(0, num_spheres=3)
    pts = np.array([[0.0, 0.0, 0.0], [5.0, 5.0, 5.0]], dtype=np.float32)
    sigma, rgb = field.field(pts)
    assert sigma.shape == (2, 1) and rgb.shape == (2, 3)
    # far outside every sphere: density ~ 0
    assert float(sigma[1, 0]) < 1e-3
    assert np.all(np.asarray(rgb) >= 0) and np.all(np.asarray(rgb) <= 1)


def test_render_analytic_view_nontrivial():
    field = SphereField.random(1, num_spheres=4)
    from minimal_nerf_tpu.ops.cameras import focal_from_angle, pose_spherical

    pose = pose_spherical(30.0, -30.0, 4.0)
    im = render_analytic_view(field, pose, 32, 32, focal_from_angle(32, 0.69),
                              num_samples=64)
    assert im.shape == (32, 32, 3) and im.dtype == np.uint8
    # scene is visible: some non-background pixels, some background
    assert im.max() > 30
    assert (im.sum(axis=-1) < 10).any()


def test_make_and_save_procedural_scene(tmp_path):
    scenes, field = make_procedural_scene(
        split_frames=(("train", 3), ("val", 1), ("test", 2)),
        height=24, width=24, gt_samples=32,
    )
    assert scenes["train"].num_frames == 3
    out = save_scene_tree(scenes, tmp_path / "scene")
    # round-trips through the standard loader
    loaded = SyntheticScene.load(out, "test")
    assert loaded.num_frames == 2
    np.testing.assert_array_equal(loaded.images, scenes["test"].images)
    np.testing.assert_allclose(loaded.poses, scenes["test"].poses, atol=1e-6)
    assert abs(loaded.focal - scenes["test"].focal) < 1e-6


def test_thin_scene_is_sparse_and_visible():
    from minimal_nerf_tpu.ops import cameras

    f = SphereField.random_thin(0)
    # every bead stays inside the unit ball
    extent = np.linalg.norm(f.centers, axis=1) + f.radii
    assert (extent < 1.0).all()
    # deterministic per seed
    f2 = SphereField.random_thin(0)
    np.testing.assert_array_equal(f.centers, f2.centers)
    pose = cameras.pose_spherical(30.0, -30.0, 4.0)
    im = render_analytic_view(f, pose, 48, 48,
                              cameras.focal_from_angle(48, 0.69),
                              num_samples=128, chunk=2304)
    dark = (im.sum(axis=-1) < 10).mean()
    assert im.max() > 30  # structure is visible
    assert dark > 0.6  # and MOST of the view is empty space (thin regime)


def test_shell_scene_is_hollow_surface():
    from minimal_nerf_tpu.ops import cameras

    f = SphereField.random_shell(0)
    # beads sit ON the ellipsoid surface: radial residual of the
    # normalized coordinates is ~1 for every center
    axes = np.array([0.85, 0.45, 0.65])
    r = np.linalg.norm(f.centers / axes, axis=1)
    np.testing.assert_allclose(r, 1.0, atol=1e-5)
    # the interior is empty: density at the origin ~ 0
    sigma, _ = f.field(np.zeros((1, 3), dtype=np.float32))
    assert float(sigma[0, 0]) < 1e-2
    pose = cameras.pose_spherical(-60.0, -30.0, 4.0)
    im = render_analytic_view(f, pose, 48, 48,
                              cameras.focal_from_angle(48, 0.69),
                              num_samples=128, chunk=2304)
    assert im.max() > 30


@pytest.mark.slow
def test_make_procedural_scene_dispatches_archetypes():
    for name in ("thin", "shell"):
        scenes, field = make_procedural_scene(
            split_frames=(("train", 1), ("test", 1)),
            height=16, width=16, gt_samples=32, scene=name,
        )
        assert scenes["train"].images.shape == (1, 16, 16, 3)


def test_object_scene_is_compact_with_empty_margins():
    from minimal_nerf_tpu.data.procedural import SphereField

    f = SphereField.random_object(0)
    # every primitive (center + radius) stays inside the unit ball — the
    # rest of the sampled frustum is empty space
    import numpy as np

    extent = np.linalg.norm(f.centers, axis=1) + f.radii
    assert (extent < 1.0).all()
    # and it renders: a centered view must have content in the middle and
    # black corners (empty space along those rays)
    from minimal_nerf_tpu.data.procedural import render_analytic_view
    from minimal_nerf_tpu.ops import cameras

    pose = cameras.pose_spherical(30.0, -30.0, 4.0)
    im = render_analytic_view(f, pose, 48, 48, cameras.focal_from_angle(48, 0.69),
                              num_samples=64, chunk=2304)
    assert im[:4, :4].max() == 0  # corner rays miss the object
    assert im[16:32, 16:32].max() > 30  # center rays hit it
