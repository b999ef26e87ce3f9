"""Tests for chunked view reconstruction and 360 synthesis."""

import jax
import jax.numpy as jnp
import numpy as np

from minimal_nerf_tpu import views


def test_view_reconstruction_chunk_padding_consistency():
    # a deterministic "renderer" that ignores the key: chunked sweep must
    # reproduce direct evaluation regardless of chunk size / padding
    def render_chunk(o, d, key):
        return jnp.stack(
            [o[:, 0] + d[:, 0], o[:, 1] * 0 + 0.25, d[:, 2]], axis=-1
        )

    h = w = 13  # 169 rays, not a multiple of any chunk
    o = jnp.arange(h * w * 3, dtype=jnp.float32).reshape(h, w, 3) / 100.0
    d = jnp.ones((h, w, 3)) * 0.5
    im1 = views.view_reconstruction(render_chunk, o, d, chunk=32)
    im2 = views.view_reconstruction(render_chunk, o, d, chunk=169)
    np.testing.assert_array_equal(im1, im2)
    assert im1.shape == (h, w, 3) and im1.dtype == np.uint8


def test_view_reconstruction_clipping():
    def render_chunk(o, d, key):
        return jnp.full((o.shape[0], 3), 2.0)  # overflows 255 -> clipped

    o = jnp.zeros((4, 4, 3))
    d = jnp.ones((4, 4, 3))
    im = views.view_reconstruction(render_chunk, o, d, chunk=8)
    assert im.max() == 255


def test_generate_360_view_synthesis(tmp_path):
    def render_chunk(o, d, key):
        return jnp.abs(d) / (jnp.max(jnp.abs(d)) + 1e-6)

    out = views.generate_360_view_synthesis(
        render_chunk, tmp_path, epoch="epoch=3", height=16, width=16,
        chunk=64, num_poses=3, progress=False,
    )
    assert out.exists() and out.name == "epoch=3-360.gif"


def test_render_poses_batched_matches_sequential():
    # the batched multi-frame sweep must reproduce the sequential
    # view_reconstruction path bitwise: same in-jit ray math as
    # cameras.get_rays, same per-chunk key folding, same uint8 conversion.
    # The renderer depends on o, d AND the key so all three are verified.
    from minimal_nerf_tpu.ops import cameras

    def render_chunk(o, d, key):
        noise = jax.random.uniform(key, (o.shape[0], 1))
        return jnp.abs(jnp.sin(o * 3 + d)) * 0.9 + noise * 0.1

    h, w, focal = 9, 11, 12.5  # h*w=99, chunk 16 -> 7 chunks incl. padding
    poses = np.stack(
        [np.asarray(p) for p in cameras.spherical_poses(num_poses=5)]
    )
    base = jax.random.PRNGKey(7)
    frame_keys = [jax.random.fold_in(base, i) for i in range(5)]

    seq = []
    for i in range(5):
        o, d = cameras.get_rays(h, w, focal, poses[i])
        seq.append(
            views.view_reconstruction(
                render_chunk, o, d, chunk=16, key=frame_keys[i]
            )
        )
    # frames_per_dispatch=2 over 5 poses: exercises the padded last batch
    batched = list(
        views.render_poses_batched(
            render_chunk, poses, h, w, focal, chunk=16,
            frame_keys=frame_keys, frames_per_dispatch=2,
        )
    )
    assert len(batched) == 5
    for s, b in zip(seq, batched):
        assert b.shape == (h, w, 3) and b.dtype == np.uint8
        np.testing.assert_array_equal(s, b)


def test_render_poses_batched_single_dispatch_covers_all():
    def render_chunk(o, d, key):
        return jnp.clip(jnp.abs(d), 0.0, 1.0)

    from minimal_nerf_tpu.ops import cameras

    poses = np.stack(
        [np.asarray(p) for p in cameras.spherical_poses(num_poses=3)]
    )
    ims = list(
        views.render_poses_batched(
            render_chunk, poses, 8, 8, 10.0, chunk=64,
            frames_per_dispatch=8,  # > num poses: clamped to 3
        )
    )
    assert len(ims) == 3
    assert all(im.shape == (8, 8, 3) for im in ims)


def test_photo_nerf_to_image():
    def apply_fn(coords):
        return jnp.concatenate(
            [coords, jnp.zeros((coords.shape[0], 1))], axis=-1
        )

    im = views.photo_nerf_to_image(apply_fn, 10, 14, chunk=32)
    assert im.shape == (10, 14, 3)
    np.testing.assert_allclose(im[0, 0], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(im[-1, -1], [1, 1, 0], atol=1e-6)
