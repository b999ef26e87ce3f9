"""Image IO: PNG read/write and animated-GIF write, backend-agnostic.

Prefers the ``imageio`` package (what the reference uses, ``dataloader.py:148``,
``nerf_helpers.py:187``), falls back to PIL. All functions deal in numpy
uint8 ``[H, W, 3]`` RGB arrays.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np

try:  # preferred backend
    import imageio.v2 as _imageio
except ImportError:  # pragma: no cover
    _imageio = None

try:
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover
    _PILImage = None


def imread(path: str | Path) -> np.ndarray:
    """Read an image as ``[H, W, 3]`` uint8 RGB (alpha dropped, gray expanded)."""
    if _imageio is not None:
        arr = np.asarray(_imageio.imread(str(path), mode="RGB"))
    elif _PILImage is not None:
        arr = np.asarray(_PILImage.open(str(path)).convert("RGB"))
    else:  # pragma: no cover
        raise ImportError("no image backend available (need imageio or PIL)")
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    return arr[..., :3].astype(np.uint8)


def imwrite(path: str | Path, image: np.ndarray) -> None:
    """Write a ``[H, W, 3]`` uint8 image (format from extension)."""
    image = np.asarray(image, dtype=np.uint8)
    if _imageio is not None:
        _imageio.imwrite(str(path), image)
    elif _PILImage is not None:
        _PILImage.fromarray(image).save(str(path))
    else:  # pragma: no cover
        raise ImportError("no image backend available (need imageio or PIL)")


def mimwrite(path: str | Path, frames: Sequence[np.ndarray], fps: float = 10.0) -> None:
    """Write an animated GIF from uint8 RGB frames (reference ``nerf_helpers.py:187``)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if _imageio is not None:
        _imageio.mimwrite(str(path), frames, duration=1000.0 / fps, loop=0)
    elif _PILImage is not None:
        ims = [_PILImage.fromarray(f) for f in frames]
        ims[0].save(
            str(path),
            save_all=True,
            append_images=ims[1:],
            duration=int(1000.0 / fps),
            loop=0,
        )
    else:  # pragma: no cover
        raise ImportError("no image backend available (need imageio or PIL)")
