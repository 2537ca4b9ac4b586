"""Metric-convention tests (SURVEY.md §4 "eval metrics ... against
published values on known images" — here against analytic ground truth,
since no benchmark images exist on disk)."""

import numpy as np
import pytest

from pesr_tpu.metrics import calc_psnr, calc_ssim, rgb2ycbcr


def test_rgb2ycbcr_known_points():
    # MATLAB rgb2ycbcr: white -> Y=235, black -> Y=16 (BT.601 ranges).
    white = np.full((1, 1, 3), 255.0)
    black = np.zeros((1, 1, 3))
    np.testing.assert_allclose(rgb2ycbcr(white), 235.0, atol=1e-6)
    np.testing.assert_allclose(rgb2ycbcr(black), 16.0, atol=1e-6)
    full = rgb2ycbcr(white, only_y=False)
    np.testing.assert_allclose(full[0, 0], [235.0, 128.0, 128.0],
                               atol=1e-6)


def test_psnr_analytic():
    a = np.zeros((32, 32), np.float64)
    b = np.full((32, 32), 10.0)
    # MSE=100 -> PSNR = 10*log10(255^2/100)
    expected = 10 * np.log10(255.0 ** 2 / 100.0)
    np.testing.assert_allclose(calc_psnr(a, b, crop_border=0, on_y=False),
                               expected, rtol=1e-9)


def test_psnr_identical_is_inf_and_crop_matters():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (40, 40, 3)).astype(np.float64)
    assert calc_psnr(img, img, crop_border=4) == float("inf")
    # Corrupt only the border: cropped PSNR must be inf, uncropped not.
    noisy = img.copy()
    noisy[:2] += 5
    assert calc_psnr(noisy, img, crop_border=4) == float("inf")
    assert calc_psnr(noisy, img, crop_border=0) < float("inf")


def test_psnr_shape_mismatch_raises():
    with pytest.raises(ValueError):
        calc_psnr(np.zeros((4, 4, 3)), np.zeros((5, 4, 3)))


def test_ssim_bounds_and_monotonicity():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (64, 64, 3)).astype(np.float64)
    assert calc_ssim(img, img, crop_border=0) == pytest.approx(1.0)
    light = calc_ssim(img + rng.normal(0, 5, img.shape), img, crop_border=0)
    heavy = calc_ssim(img + rng.normal(0, 40, img.shape), img,
                      crop_border=0)
    assert 0 < heavy < light < 1.0


def test_ssim_constant_shift_high():
    """SSIM is luminance-tolerant: a small constant shift keeps SSIM
    close to 1 (unlike PSNR)."""
    img = np.random.default_rng(2).integers(40, 200, (64, 64)).astype(
        np.float64)
    shifted = img + 3.0
    assert calc_ssim(shifted, img, crop_border=0, on_y=False) > 0.98
