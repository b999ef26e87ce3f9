"""PSNR / SSIM image metrics (scikit-image-compatible, no skimage dependency).

The reference scores test views with ``skimage.metrics.structural_similarity``
(multichannel, uint8) and ``peak_signal_noise_ratio`` (``score.py:33-36``).
This module reimplements both with the same defaults so scores are directly
comparable:

- PSNR: ``10 * log10(data_range**2 / mse)`` over the full image, float64.
- SSIM: uniform 7x7 window (``gaussian_weights=False``), ``K1=0.01``,
  ``K2=0.03``, sample-covariance normalization ``NP/(NP-1)``, border of
  ``(win_size-1)//2`` cropped before averaging, channels averaged last —
  matching skimage's ``structural_similarity(..., multichannel=True)`` for
  integer inputs (``data_range = 255`` for uint8).

Implementation is numpy (host-side scoring path); a box filter via cumsum
keeps it O(pixels) with no scipy dependency.
"""

from __future__ import annotations

import numpy as np


def peak_signal_noise_ratio(
    image_true: np.ndarray, image_test: np.ndarray, data_range: float | None = None
) -> float:
    """PSNR in dB between two images (skimage-compatible).

    Args:
        image_true/image_test: arrays of identical shape.
        data_range: value range; inferred as 255 for uint8 inputs.
    """
    if data_range is None:
        if image_true.dtype == np.uint8:
            data_range = 255.0
        else:
            data_range = float(image_true.max() - image_true.min())
    err = np.mean(
        (image_true.astype(np.float64) - image_test.astype(np.float64)) ** 2
    )
    with np.errstate(divide="ignore"):  # identical images -> inf, like skimage
        return float(10.0 * np.log10((data_range**2) / err))


def _box_filter(img: np.ndarray, win: int) -> np.ndarray:
    """Mean filter with a ``win x win`` window, 'valid' region only.

    Args:
        img: ``[H, W]`` float64 image.

    Returns:
        ``[H - win + 1, W - win + 1]`` window means.
    """
    # Integral-image (summed-area table) box sum.
    pad = np.zeros((img.shape[0] + 1, img.shape[1] + 1), dtype=np.float64)
    np.cumsum(np.cumsum(img, axis=0), axis=1, out=pad[1:, 1:])
    s = (
        pad[win:, win:]
        - pad[:-win, win:]
        - pad[win:, :-win]
        + pad[:-win, :-win]
    )
    return s / (win * win)


def _ssim_channel(
    x: np.ndarray, y: np.ndarray, data_range: float, win_size: int
) -> float:
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    np_pix = win_size * win_size
    cov_norm = np_pix / (np_pix - 1)  # sample covariance

    ux = _box_filter(x, win_size)
    uy = _box_filter(y, win_size)
    uxx = _box_filter(x * x, win_size)
    uyy = _box_filter(y * y, win_size)
    uxy = _box_filter(x * y, win_size)

    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    a1 = 2 * ux * uy + c1
    a2 = 2 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    # The 'valid' box filter already excludes the (win-1)//2 border skimage
    # crops before averaging, so the mean is over the same pixels.
    return float(s.mean())


def structural_similarity(
    im1: np.ndarray,
    im2: np.ndarray,
    data_range: float | None = None,
    win_size: int = 7,
    multichannel: bool = True,
) -> float:
    """Mean SSIM between two images (skimage-compatible defaults).

    Args:
        im1/im2: ``[H, W]`` or ``[H, W, C]`` images of the same dtype/shape.
        data_range: value range; inferred as 255 for uint8.
        win_size: odd window size (default 7, skimage's non-gaussian default).
        multichannel: average SSIM over the last-axis channels.

    Returns:
        scalar mean SSIM.
    """
    if im1.shape != im2.shape:
        raise ValueError(f"shape mismatch: {im1.shape} vs {im2.shape}")
    if data_range is None:
        if im1.dtype == np.uint8:
            data_range = 255.0
        else:
            raise ValueError("data_range must be given for non-uint8 images")
    if multichannel and im1.ndim == 3:
        return float(
            np.mean(
                [
                    _ssim_channel(im1[..., c], im2[..., c], data_range, win_size)
                    for c in range(im1.shape[-1])
                ]
            )
        )
    return _ssim_channel(im1, im2, data_range, win_size)
