"""Ma-score real feature pipeline (metrics/ma_features.py): shapes,
determinism, degradation sensitivity, DWT correctness, and the
zero-code-change loadable-regressor contract (round-1 verdict item 7)."""

import numpy as np
import pytest

from pesr_tpu.metrics.ma_features import (MaModel, dct_features, dwt2,
                                          extract_ma_features,
                                          load_ma_model, pca_features,
                                          wavelet_features)


def _img(seed=0, size=128):
    rng = np.random.default_rng(seed)
    base = rng.random((size // 4, size // 4, 3))
    img = np.kron(base, np.ones((4, 4, 1)))           # structure
    img += 0.15 * rng.random((size, size, 3))         # texture
    return (img / img.max() * 255).astype(np.uint8)


def test_feature_shapes_and_determinism():
    img = _img()
    f1 = extract_ma_features(img)
    f2 = extract_ma_features(img.copy())
    assert f1["dct"].shape == (18,)          # 3 scales x 6
    assert f1["wavelet"].shape == (20,)      # 3 levels x 6 + 2 ratios
    assert f1["pca"].shape == (75,)          # 3 scales x 25
    for k in f1:
        np.testing.assert_array_equal(f1[k], f2[k])
        assert np.all(np.isfinite(f1[k])), k


def test_dwt2_is_an_orthonormal_analysis():
    """Periodized db2 analysis is exactly orthogonal: subband energies
    sum to the input energy (Parseval)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((64, 64))
    ll, (lh, hl, hh) = dwt2(x)
    assert ll.shape == (32, 32)
    e_in = np.sum(x * x)
    e_out = sum(np.sum(b * b) for b in (ll, lh, hl, hh))
    np.testing.assert_allclose(e_out, e_in, rtol=1e-10)
    # ... and a constant image has all detail energy ~0 (vanishing
    # moment of db2), pinning the lo/hi filter assignment.
    c = np.full((32, 32), 3.7)
    _, (lh2, hl2, hh2) = dwt2(c)
    for b in (lh2, hl2, hh2):
        np.testing.assert_allclose(b, 0.0, atol=1e-10)


def test_features_respond_to_blur():
    """Blur must move every feature family (these statistics are what
    the trained forests consume to detect over-smoothed SR)."""
    from scipy.ndimage import gaussian_filter
    img = _img(2)
    blurred = gaussian_filter(img.astype(np.float64),
                              sigma=(2, 2, 0)).astype(np.uint8)
    f_sharp = extract_ma_features(img)
    f_blur = extract_ma_features(blurred)
    # DCT HF-energy-ratio mean (index 4 of scale 0) drops under blur.
    assert f_blur["dct"][4] < f_sharp["dct"][4]
    # Wavelet level-1 detail log-energy (index 1) drops under blur.
    assert f_blur["wavelet"][1] < f_sharp["wavelet"][1]
    # PCA spectrum concentrates: first eigenvalue share rises.
    assert f_blur["pca"][0] > f_sharp["pca"][0]


def _tiny_forest(feat_dim, split_feat, thr, lo, hi):
    """One-tree forest: x[split_feat] <= thr -> lo else hi."""
    return dict(
        children_left=np.array([1, -1, -1], np.int32),
        children_right=np.array([2, -1, -1], np.int32),
        feature=np.array([split_feat, -2, -2], np.int32),
        threshold=np.array([thr, 0, 0], np.float32),
        value=np.array([0, lo, hi], np.float32),
        tree_offsets=np.array([0, 3], np.int32),
    )


def test_ma_model_forest_npz_roundtrip(tmp_path):
    """The documented npz format loads and predicts with zero code
    changes — the contract converted published TreeBagger weights rely
    on."""
    arrays = {}
    for g, d in (("dct", 18), ("wavelet", 20), ("pca", 75)):
        for k, v in _tiny_forest(d, 0, 1e9, 6.0, 9.0).items():
            arrays[f"{g}_{k}"] = v
    arrays["combine_w"] = np.array([1 / 3, 1 / 3, 1 / 3], np.float32)
    arrays["combine_b"] = np.float32(0.5)
    path = str(tmp_path / "ma_model.npz")
    MaModel(arrays).save(path)

    model = load_ma_model(path)
    img = _img(3)
    # every group's x[0] <= 1e9 -> each forest returns 6.0
    assert model(img) == pytest.approx(6.0 + 0.5)

    # and ma_score picks it up through the env var
    import pesr_tpu.metrics.ma as ma
    import os
    old = os.environ.get("PESR_MA_MODEL")
    ma._REAL_MODEL_CHECKED = False
    os.environ["PESR_MA_MODEL"] = path
    try:
        assert ma.ma_score(img) == pytest.approx(6.5)
    finally:
        ma._REAL_MODEL_CHECKED = False
        ma._REAL_MODEL = None
        if old is None:
            os.environ.pop("PESR_MA_MODEL", None)
        else:
            os.environ["PESR_MA_MODEL"] = old


def test_ma_model_linear_group_and_multitree(tmp_path):
    """Mixed npz: linear model for one group, a 2-tree forest for the
    others; forest prediction = mean over trees."""
    arrays = {}
    f = _tiny_forest(18, 0, 1e9, 4.0, 9.0)
    # duplicate the tree with a different leaf -> mean = (4+8)/2 = 6
    arrays.update({f"dct_{k}": np.concatenate([v, v]) if k != "tree_offsets"
                   else np.array([0, 3, 6], np.int32)
                   for k, v in f.items()})
    arrays["dct_value"] = np.array([0, 4, 9, 0, 8, 9], np.float32)
    arrays["wavelet_linear_w"] = np.zeros(20, np.float32)
    arrays["wavelet_linear_b"] = np.float32(3.0)
    arrays["pca_linear_w"] = np.zeros(75, np.float32)
    arrays["pca_linear_b"] = np.float32(9.0)
    arrays["combine_w"] = np.array([1.0, 1.0, 1.0], np.float32)
    path = str(tmp_path / "m.npz")
    MaModel(arrays).save(path)
    model = MaModel.load(path)
    assert model(_img(4)) == pytest.approx(6.0 + 3.0 + 9.0)
