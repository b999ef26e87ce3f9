"""Data-layer tests against the procedurally generated fixture scene."""

import jax
import jax.numpy as jnp
import numpy as np

from minimal_nerf_tpu.data import (
    PhotoDataset,
    SyntheticDataset,
    SyntheticScene,
    sample_random_coordinates,
)


def test_scene_load(fixture_scene):
    scene = SyntheticScene.load(fixture_scene, "train")
    assert scene.images.shape == (3, 64, 64, 3)
    assert scene.images.dtype == np.uint8
    assert scene.poses.shape == (3, 4, 4)
    assert scene.camera_angle_x == 0.6


def test_focal_matches_reference_formula(fixture_scene):
    # 0.5 * W / tan(0.5 * 0.6); golden for W=800 is 1293.091..., scale by W
    scene = SyntheticScene.load(fixture_scene, "train")
    assert abs(scene.focal - 1293.091257506331 * 64 / 800) < 1e-9


def test_sample_random_coordinates_bounds():
    key = jax.random.PRNGKey(0)
    xs, ys = sample_random_coordinates(key, 1000, 64, 64, cropping=False)
    assert xs.min() >= 0 and xs.max() < 64
    assert ys.min() >= 0 and ys.max() < 64
    # full-range sampling should touch the outer quarter
    assert (np.asarray(xs) < 16).any() or (np.asarray(xs) >= 48).any()


def test_sample_random_coordinates_cropping():
    key = jax.random.PRNGKey(1)
    xs, ys = sample_random_coordinates(key, 1000, 64, 64, cropping=True)
    assert xs.min() >= 16 and xs.max() < 48
    assert ys.min() >= 16 and ys.max() < 48


def test_sample_random_coordinates_traced_crop_flag():
    # the crop flag must be usable as a traced value inside jit
    @jax.jit
    def f(key, crop):
        return sample_random_coordinates(key, 16, 64, 64, cropping=crop)

    xs, ys = f(jax.random.PRNGKey(2), jnp.asarray(True))
    assert xs.min() >= 16 and xs.max() < 48
    xs, _ = f(jax.random.PRNGKey(2), jnp.asarray(False))
    assert xs.shape == (16,)


def test_ray_batch_gather_correct(fixture_scene):
    scene = SyntheticScene.load(fixture_scene, "train")
    arrays = scene.device_arrays()
    batch = scene.ray_batch(jax.random.PRNGKey(3), 1, 64, arrays=arrays)
    assert batch["origin"].shape == (64, 3)
    assert batch["direc"].shape == (64, 3)
    assert batch["rgb"].shape == (64, 3)
    # rgb gather matches direct indexing
    xs, ys = np.asarray(batch["xs"]), np.asarray(batch["ys"])
    expected = scene.images[1, ys, xs, :].astype(np.float32) / 255.0
    np.testing.assert_allclose(batch["rgb"], expected, atol=1e-7)
    # origins equal the frame's camera center
    np.testing.assert_allclose(
        batch["origin"], np.broadcast_to(scene.poses[1, :3, 3], (64, 3)), atol=1e-6
    )


def test_ray_batch_matches_full_raycast(fixture_scene):
    scene = SyntheticScene.load(fixture_scene, "train")
    batch = scene.ray_batch(jax.random.PRNGKey(4), 0, 32)
    full_o, full_d = scene.frame_rays(0)
    xs, ys = np.asarray(batch["xs"]), np.asarray(batch["ys"])
    np.testing.assert_allclose(
        batch["direc"], np.asarray(full_d)[ys, xs], rtol=1e-5, atol=1e-6
    )


def test_synthetic_dataset_train_keys(fixture_scene):
    ds = SyntheticDataset(fixture_scene, "train", 128)
    batch = ds[0]
    assert set(batch) == {"origin", "direc", "rgb", "xs", "ys"}
    assert batch["origin"].shape == (128, 3)


def test_synthetic_dataset_val_keys(fixture_scene):
    ds = SyntheticDataset(fixture_scene, "val", 16)
    batch = ds[1]
    for k in ("all_origin", "all_direc", "image"):
        assert k in batch
    assert batch["all_origin"].shape == (64, 64, 3)
    assert batch["image"].shape == (64, 64, 3)
    assert float(batch["image"].max()) <= 1.0


def test_photo_dataset_first_and_last_pixel(fixture_scene):
    # reference tests/dataloader_test.py:20-30 coordinate normalization
    path = str(fixture_scene / "train" / "r_0.png")
    pds = PhotoDataset(path)
    coords, rgb = pds[0]
    np.testing.assert_allclose(coords, np.zeros(2))
    assert rgb.shape == (3,)
    coords, rgb = pds[len(pds) - 1]
    np.testing.assert_allclose(coords, np.ones(2))


def test_photo_dataset_batches(fixture_scene):
    path = str(fixture_scene / "train" / "r_0.png")
    pds = PhotoDataset(path)
    coords, rgb = next(pds.batches(jax.random.PRNGKey(0), 32))
    assert coords.shape == (32, 2)
    assert rgb.shape == (32, 3)


def test_synthetic_datamodule_crop_switch(fixture_scene):
    from minimal_nerf_tpu.data import SyntheticDataModule

    dm = SyntheticDataModule(fixture_scene, num_rays=32, cropping_epochs=2)
    assert dm.train_dataloader().cropping is True
    dm.current_epoch = 2
    assert dm.train_dataloader().cropping is False
    assert dm.val_dataloader().tvt == "val"


def test_dataloader_factories(fixture_scene):
    from minimal_nerf_tpu.data import (
        getPhotoDataloader,
        getSyntheticDataloader,
        getValDataloader,
    )

    sdl = getSyntheticDataloader(fixture_scene, "train", 16)
    batches = [b for b in sdl]
    assert len(batches) == 3 and batches[0]["origin"].shape == (16, 3)

    pdl = getPhotoDataloader(str(fixture_scene / "train" / "r_0.png"), batch_size=8)
    coords, rgb = next(pdl.epoch(0))
    assert coords.shape == (8, 2)

    vdl = getValDataloader(str(fixture_scene / "train" / "r_0.png"))
    assert vdl[0] == (64, 64)
