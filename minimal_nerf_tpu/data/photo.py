"""Toy 2-D photo datasets for the image-NeRF model.

Parity with reference ``dataloader.py:164-203``: ``PhotoDataset`` yields one
(normalized-coordinate, rgb) pair per pixel; ``ValDataset`` yields the image
size. The TPU-native addition is ``PhotoDataset.batches`` — a permuted,
device-resident batch iterator replacing the torch DataLoader.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from minimal_nerf_tpu.utils import imageio as mio


class PhotoDataset:
    """Per-pixel dataset of a single photo; coords normalized to [0, 1]."""

    def __init__(self, im_path):
        self.im_path = im_path
        self.im = mio.imread(im_path).astype(np.float32) / 255.0
        self.H, self.W, self.C = self.im.shape
        # precomputed flat per-pixel coords/rgb (device-ready)
        ys, xs = np.meshgrid(np.arange(self.H), np.arange(self.W), indexing="ij")
        self.coords = np.stack(
            [ys.ravel() / (self.H - 1), xs.ravel() / (self.W - 1)], axis=-1
        ).astype(np.float32)
        self.rgb = self.im.reshape(-1, 3)

    def __len__(self) -> int:
        return self.H * self.W

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        h = idx // self.W
        w = idx % self.W
        coords = np.array(
            [h / (self.H - 1), w / (self.W - 1)], dtype=np.float32
        )
        return coords, self.im[h, w, :]

    def batches(
        self, key: jax.Array, batch_size: int, shuffle: bool = True
    ) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray]]:
        """One epoch of (coords, rgb) batches from device arrays."""
        n = len(self)
        order = (
            np.asarray(jax.random.permutation(key, n)) if shuffle else np.arange(n)
        )
        coords = jnp.asarray(self.coords)
        rgb = jnp.asarray(self.rgb)
        for i in range(0, n - batch_size + 1, batch_size):
            idx = jnp.asarray(order[i : i + batch_size])
            yield coords[idx], rgb[idx]


def getPhotoDataloader(im_path, batch_size: int = 1024, seed: int = 0,
                       shuffle: bool = True):
    """Factory mirroring reference ``dataloader.getPhotoDataloader``:
    returns a ``(dataset, epoch_iterator_factory)``-style callable object."""
    import jax

    ds = PhotoDataset(im_path)

    def epoch(epoch_idx: int = 0):
        return ds.batches(
            jax.random.PRNGKey(seed + epoch_idx), batch_size, shuffle=shuffle
        )

    ds.epoch = epoch  # type: ignore[attr-defined]
    return ds


def getValDataloader(im_path, batch_size: int = 1, shuffle: bool = False):
    """Factory mirroring reference ``dataloader.getValDataloader``."""
    return ValDataset(im_path)


class ValDataset:
    """Single-item dataset carrying the image size (reference ``dataloader.py:188-203``)."""

    def __init__(self, im_path):
        self.im_path = im_path
        self.im = mio.imread(im_path).astype(np.float32) / 255.0
        self.H, self.W, self.C = self.im.shape

    def __len__(self) -> int:
        return 1

    def __getitem__(self, idx: int) -> Tuple[int, int]:
        return (self.H, self.W)
