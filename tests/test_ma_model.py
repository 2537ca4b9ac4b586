"""End-to-end tests for the forest-backed Ma metric (round-2 verdict
#4): the packaged synthetic-fitted forest loads through the MaModel
plug-in path by default, $PESR_MA_MODEL overrides it, and pirm.py's
JSON output self-describes which NIQE/Ma models produced the numbers."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from pesr_tpu.metrics import ma as ma_mod
from pesr_tpu.metrics.ma import ma_provenance, ma_score
from pesr_tpu.metrics.ma_features import MaModel

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_FOREST = os.path.join(_ROOT, "pesr_tpu", "metrics",
                       "ma_model_synthetic.npz")


@pytest.fixture(autouse=True)
def _clean_ma_env(monkeypatch):
    monkeypatch.delenv("PESR_MA_MODEL", raising=False)
    # Invalidate the per-env cache so each test resolves fresh.
    ma_mod._RESOLVED_ENV = None
    yield
    ma_mod._RESOLVED_ENV = None


def test_packaged_forest_is_default_and_orders_degradations():
    """Without PESR_MA_MODEL the packaged forest (NOT the logistic
    approximation) backs ma_score, and it orders pristine > bicubic
    x4-up > heavy blur on a held-out synthetic image."""
    from scipy.ndimage import gaussian_filter

    from pesr_tpu.data.datasets import (SyntheticImages,
                                        host_bicubic_downsample,
                                        host_bicubic_resize)

    assert os.path.exists(_FOREST)
    assert ma_provenance().startswith("forest:")
    # Round-3: the natural-image-fitted forest outranks the synthetic
    # one when packaged (metrics/fit_natural.py); either way a forest —
    # not the approximation — must be the default.
    assert ("natural-image-fitted" in ma_provenance()
            or "synthetic-fitted" in ma_provenance())

    hr = SyntheticImages(num_images=1, height=160, width=160,
                         seed=31415).get(0)
    up4 = host_bicubic_resize(host_bicubic_downsample(hr, 4), 160, 160)
    blurred = np.clip(np.stack(
        [gaussian_filter(hr[..., c].astype(np.float64), 2.5)
         for c in range(3)], -1) + 0.5, 0, 255).astype(np.uint8)

    s_hr, s_up, s_blur = ma_score(hr), ma_score(up4), ma_score(blurred)
    assert s_hr > s_up > s_blur, (s_hr, s_up, s_blur)
    assert 0.0 <= s_blur and s_hr <= 10.0


def test_env_model_overrides_packaged_default(tmp_path, monkeypatch):
    """$PESR_MA_MODEL engages the plug-in path: a linear model whose
    output is a constant must win over the packaged forest."""
    arrays = {}
    for g, dim in (("dct", 18), ("wavelet", 20), ("pca", 75)):
        arrays[f"{g}_linear_w"] = np.zeros(dim, np.float32)
        arrays[f"{g}_linear_b"] = np.float32(7.0)
    arrays["provenance"] = np.str_("unit-test constant model")
    path = os.path.join(tmp_path, "const_ma.npz")
    MaModel(arrays).save(path)

    monkeypatch.setenv("PESR_MA_MODEL", path)
    img = np.random.default_rng(0).integers(0, 256, (96, 96, 3),
                                            dtype=np.uint8)
    assert ma_score(img) == pytest.approx(7.0)
    assert path in ma_provenance()
    assert "unit-test constant model" in ma_provenance()


def test_pirm_json_reports_model_provenance(tmp_path):
    """The PIRM CLI's JSON output must carry niqe_model/ma_model
    provenance so synthetic-fitted numbers are self-describing."""
    from pesr_tpu.utils.image_io import imwrite_uint8

    rng = np.random.default_rng(5)
    d = os.path.join(tmp_path, "sr")
    for i in range(2):
        imwrite_uint8(os.path.join(d, f"im{i}.png"),
                      rng.integers(0, 256, (96, 96, 3), dtype=np.uint8))

    env = dict(os.environ, PYTHONPATH=_ROOT + os.pathsep
               + os.environ.get("PYTHONPATH", ""),
               JAX_PLATFORMS="cpu")
    env.pop("PESR_MA_MODEL", None)
    out = subprocess.run(
        [sys.executable, "-m", "pesr_tpu.metrics.pirm", "--dir", d],
        capture_output=True, text=True, env=env, check=True).stdout
    rec = json.loads(out.strip().splitlines()[-1])
    assert {"pi", "niqe", "ma", "niqe_model", "ma_model"} <= rec.keys()
    assert "-fitted" in rec["niqe_model"]  # natural- or synthetic-
    assert rec["ma_model"].startswith("forest:")
    assert "-fitted" in rec["ma_model"]


def test_forest_predictor_matches_sklearn_semantics():
    """The flat-array forest walker must agree with a hand-built tree:
    route left on x[f] <= thr, leaf at children_left == -1, mean over
    trees."""
    from pesr_tpu.metrics.ma_features import _predict_forest

    # Tree 0: root splits feature 0 at 0.5 -> leaves 1.0 / 3.0
    # Tree 1: single leaf 5.0
    left = np.array([1, -1, -1, -1], np.int32)
    right = np.array([2, -1, -1, -1], np.int32)
    feat = np.array([0, -2, -2, -2], np.int32)
    thr = np.array([0.5, 0, 0, 0], np.float32)
    val = np.array([0.0, 1.0, 3.0, 5.0], np.float32)
    offs = np.array([0, 3, 4], np.int32)
    lo = _predict_forest(np.array([0.2]), left, right, feat, thr, val,
                         offs)
    hi = _predict_forest(np.array([0.9]), left, right, feat, thr, val,
                         offs)
    assert lo == pytest.approx((1.0 + 5.0) / 2)
    assert hi == pytest.approx((3.0 + 5.0) / 2)
