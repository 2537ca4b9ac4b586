"""Perceptual-metric behavior tests (SURVEY.md §4; exact published-value
checks are impossible offline, so these pin the *properties* the PIRM
protocol relies on: degradation ordering, determinism, and the PI
combination rule)."""

import numpy as np
import pytest

from pesr_tpu.metrics import (NiqeModel, fit_niqe_model, ma_score, niqe,
                              perceptual_index)
from pesr_tpu.metrics.niqe import compute_mscn, extract_niqe_features
from pesr_tpu.data.datasets import SyntheticImages


# NIQE needs enough 96x96 blocks for a stable test-image covariance —
# 480x480 gives 25 blocks (192x192 gave 4 and wildly unstable scores).
@pytest.fixture(scope="module")
def model():
    src = SyntheticImages(num_images=8, height=480, width=480, seed=42)
    return fit_niqe_model([src.get(i) for i in range(8)])


@pytest.fixture(scope="module")
def sharp_image():
    return SyntheticImages(num_images=1, height=480, width=480,
                           seed=7).get(0)


def _blur(img, k=5):
    from scipy.ndimage import uniform_filter
    return uniform_filter(img.astype(np.float64), size=(k, k, 1)
                          ).astype(np.uint8)


def test_mscn_is_normalized(sharp_image):
    from pesr_tpu.metrics.niqe import _rgb2gray
    mscn, sigma = compute_mscn(_rgb2gray(sharp_image))
    assert abs(float(np.mean(mscn))) < 0.05
    assert 0.1 < float(np.std(mscn)) < 3.0
    assert (sigma >= 0).all()


def test_feature_matrix_shape(sharp_image):
    feats = extract_niqe_features(sharp_image)
    assert feats.shape == ((480 // 96) ** 2, 36)
    assert np.isfinite(feats).all()


def test_niqe_prefers_sharp_over_blurred(model, sharp_image):
    score_sharp = niqe(sharp_image, model)
    score_blur = niqe(_blur(sharp_image, 7), model)
    assert np.isfinite(score_sharp) and np.isfinite(score_blur)
    assert score_sharp < score_blur


def test_niqe_deterministic(model, sharp_image):
    assert niqe(sharp_image, model) == niqe(sharp_image, model)


def test_niqe_model_save_load(tmp_path, model):
    p = str(tmp_path / "m.npz")
    model.save(p)
    loaded = NiqeModel.load(p)
    np.testing.assert_array_equal(loaded.mu, model.mu)
    np.testing.assert_array_equal(loaded.cov, model.cov)


def test_ma_prefers_sharp_over_blurred(sharp_image):
    sharp = ma_score(sharp_image)
    blur = ma_score(_blur(sharp_image, 7))
    assert 0.0 <= blur < sharp <= 10.0


def test_ma_pluggable_predictor(sharp_image):
    assert ma_score(sharp_image, predictor=lambda img: 7.25) == 7.25


def test_pi_combination_rule(model, sharp_image):
    pi = perceptual_index(sharp_image, model,
                          ma_predictor=lambda img: 6.0)
    n = niqe(sharp_image, model)
    np.testing.assert_allclose(pi, 0.5 * ((10.0 - 6.0) + n), rtol=1e-12)


def test_pi_orders_degradation(model, sharp_image):
    assert perceptual_index(sharp_image, model) < \
        perceptual_index(_blur(sharp_image, 7), model)
