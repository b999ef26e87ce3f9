"""Tests for camera math: pinhole rays, spherical poses, focal golden value."""

import math

import jax.numpy as jnp
import numpy as np

from minimal_nerf_tpu.ops import cameras


def test_focal_golden():
    # reference tests/dataloader_test.py:39-41
    assert math.isclose(
        cameras.focal_from_angle(800, 0.6), 1293.091257506331, rel_tol=1e-12
    )


def test_get_rays_identity_pose():
    h = w = 4
    focal = 2.0
    c2w = jnp.eye(4)
    rays_o, rays_d = cameras.get_rays(h, w, focal, c2w)
    assert rays_o.shape == (h, w, 3) and rays_d.shape == (h, w, 3)
    np.testing.assert_allclose(rays_o, np.zeros((h, w, 3)))
    # pixel (x=0, y=0): dir = [(0-2)/2, -(0-2)/2, -1] = [-1, 1, -1]
    np.testing.assert_allclose(rays_d[0, 0], np.array([-1.0, 1.0, -1.0]), atol=1e-6)
    # all z-components are -1 under identity rotation
    np.testing.assert_allclose(rays_d[..., 2], -np.ones((h, w)), atol=1e-6)


def test_get_rays_translation():
    c2w = jnp.eye(4).at[:3, 3].set(jnp.array([0.5, 0.5, 0.5]))
    rays_o, _ = cameras.get_rays(8, 8, 4.0, c2w)
    np.testing.assert_allclose(rays_o, np.full((8, 8, 3), 0.5))


def test_rays_for_pixels_matches_full_grid():
    h, w, focal = 16, 16, 10.0
    c2w = np.asarray(cameras.pose_spherical(30.0, -30.0, 4.0))
    full_o, full_d = cameras.get_rays(h, w, focal, c2w)
    xs = jnp.array([0, 3, 15, 7])
    ys = jnp.array([0, 5, 15, 2])
    o, d = cameras.rays_for_pixels(xs, ys, h, w, focal, c2w)
    np.testing.assert_allclose(o, np.asarray(full_o)[np.asarray(ys), np.asarray(xs)], rtol=1e-6)
    np.testing.assert_allclose(d, np.asarray(full_d)[np.asarray(ys), np.asarray(xs)], rtol=1e-5, atol=1e-6)


def test_pose_spherical_radius_and_orthonormality():
    pose = cameras.pose_spherical(45.0, -30.0, 4.0)
    assert pose.shape == (4, 4)
    # camera center sits at distance `radius` from the origin
    assert math.isclose(float(np.linalg.norm(pose[:3, 3])), 4.0, rel_tol=1e-6)
    rot = pose[:3, :3]
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-6)


def test_spherical_poses_count_and_distinct():
    poses = cameras.spherical_poses(num_poses=40)
    assert poses.shape == (40, 4, 4)
    # all 40 poses in the orbit are distinct (endpoint excluded => no duplicate)
    flat = poses.reshape(40, -1)
    for i in range(1, 40):
        assert not np.allclose(flat[0], flat[i], atol=1e-5)


def test_ndc_rays_shapes_and_unit_dirs():
    h = w = 8
    c2w = np.eye(4)
    c2w[2, 3] = 1.0  # camera at z=1 looking down -z
    o, d = cameras.get_rays(h, w, 10.0, jnp.asarray(c2w))
    o_ndc, d_ndc = cameras.convert_to_ndc_rays(o, d, 10.0, w, h, near=1.0)
    assert o_ndc.shape == (h, w, 3) and d_ndc.shape == (h, w, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d_ndc), axis=-1), np.ones((h, w)), rtol=1e-6
    )
