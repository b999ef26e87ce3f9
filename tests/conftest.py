"""Test config: force an 8-device virtual CPU platform BEFORE jax initializes.

Multi-device sharding tests run on a virtual 8-way host mesh
(``--xla_force_host_platform_device_count=8``); all math tests run fp32 on CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The axon TPU plugin (sitecustomize) registers itself regardless of
# JAX_PLATFORMS; pin the platform via jax.config, which wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def fixture_scene(tmp_path_factory):
    """A tiny on-disk Blender-synthetic-style dataset (procedurally generated).

    Mirrors the reference's ``tests/test_data`` fixture layout:
    ``transforms_{train,val,test}.json`` + ``{split}/r_i.png`` images, but the
    images are small (64x64) and generated, not copied.
    """
    from minimal_nerf_tpu.utils import imageio as mio

    base = tmp_path_factory.mktemp("scene")
    rng = np.random.default_rng(0)
    h = w = 64
    # one consistent image per split: every frame shows the same scene from
    # the same pose, so the loss floor is ~0 and overfit tests have signal
    split_img = {
        s: np.kron(rng.random((8, 8, 3)), np.ones((8, 8, 1)))[:h, :w]
        for s in ("train", "val", "test")
    }
    for split, n_frames in [("train", 3), ("val", 2), ("test", 2)]:
        (base / split).mkdir()
        frames = []
        for i in range(n_frames):
            img = split_img[split]
            img_u8 = (img * 255).astype(np.uint8)
            rel = f"./{split}/r_{i}"
            mio.imwrite(str(base / split / f"r_{i}.png"), img_u8)
            c2w = np.eye(4)
            c2w[:3, 3] = [0.5, 0.5, 4.0]
            frames.append(
                {
                    "file_path": rel,
                    "rotation": 0.0125,
                    "transform_matrix": c2w.tolist(),
                }
            )
        import json

        with open(base / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.6, "frames": frames}, f)
    return base
