"""Tests for the skimage-compatible PSNR/SSIM implementations."""

import numpy as np
import pytest

from minimal_nerf_tpu.ops.image_metrics import (
    peak_signal_noise_ratio,
    structural_similarity,
)


def test_psnr_identical_is_inf():
    img = np.random.default_rng(0).integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert peak_signal_noise_ratio(img, img) == np.inf


def test_psnr_known_value():
    a = np.zeros((16, 16), dtype=np.uint8)
    b = np.full((16, 16), 10, dtype=np.uint8)
    # mse = 100 -> psnr = 10*log10(255^2/100)
    expected = 10 * np.log10(255.0**2 / 100.0)
    assert abs(peak_signal_noise_ratio(a, b) - expected) < 1e-9


def test_ssim_identical_is_one():
    img = np.random.default_rng(1).integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert abs(structural_similarity(img, img) - 1.0) < 1e-12


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    small = np.clip(
        img.astype(int) + rng.integers(-5, 6, img.shape), 0, 255
    ).astype(np.uint8)
    big = np.clip(
        img.astype(int) + rng.integers(-60, 61, img.shape), 0, 255
    ).astype(np.uint8)
    s_small = structural_similarity(img, small)
    s_big = structural_similarity(img, big)
    assert 0 < s_big < s_small < 1


def test_ssim_matches_skimage_if_available():
    skimage = pytest.importorskip("skimage.metrics")
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    b = np.clip(a.astype(int) + rng.integers(-20, 21, a.shape), 0, 255).astype(
        np.uint8
    )
    ours = structural_similarity(a, b)
    theirs = skimage.structural_similarity(a, b, channel_axis=-1)
    assert abs(ours - theirs) < 1e-7


def test_ssim_uniform_shift():
    # constant-luminance shift: variance terms identical, only luminance term differs
    a = np.full((32, 32), 100, dtype=np.uint8)
    b = np.full((32, 32), 110, dtype=np.uint8)
    s = structural_similarity(a, b, multichannel=False)
    c1 = (0.01 * 255) ** 2
    expected = (2 * 100 * 110 + c1) / (100**2 + 110**2 + c1)
    assert abs(s - expected) < 1e-9
