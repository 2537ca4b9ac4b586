"""Ma et al. (2017) SR quality score — documented approximation
(SURVEY.md §7 hard-parts item 3).

The true Ma score is a LEARNED regressor (PCA features over DCT/wavelet
statistics + trained regression forests) distributed only as MATLAB
code + trained weights; neither is on this machine nor reproducible
without the training corpus.  This module provides:

  * ``ma_score(img, predictor=None)`` — resolution order: explicit
    ``predictor`` > ``$PESR_MA_MODEL`` forest npz > the packaged
    natural-image-fitted forest (``ma_model_natural.npz``,
    fit_natural.py — degradation ladder over real photographs found in
    installed packages) > the packaged synthetic-fitted forest
    (``ma_model_synthetic.npz``, fit_ma.py) > the approximation below;
    all forests run the genuine 3-family feature pipeline + forest
    predictor, ordering-verified on held-out degradations;
    ``ma_provenance()`` reports which one is active;
  * ``ma_score_approx`` — a fixed, documented approximation built from
    the same statistic families the real regressor consumes (local
    frequency-energy distribution and MSCN spread), mapped to [0, 10].
    It tracks the real score's *ordering* (sharper, more natural SR
    results score higher; over-smoothed or heavily artifacted results
    score lower) but its absolute values are NOT the published Ma
    numbers — PIRM-PI parity checks against reference outputs must
    plug in the real regressor when its weights become available.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

from pesr_tpu.metrics.niqe import _rgb2gray, compute_mscn


def _dct2(block: np.ndarray) -> np.ndarray:
    from scipy.fft import dctn
    return dctn(block, norm="ortho")


def ma_score_approx(img: np.ndarray, block: int = 32) -> float:
    """Approximate Ma score in [0, 10] (higher = better perceived SR).

    Statistics (per 32x32 block, averaged):
      * high-frequency DCT energy ratio — super-resolved images that
        recover texture keep substantial HF energy; blurry upscales
        concentrate energy at DC/low frequencies;
      * MSCN spread (variance) — natural sharp images have wider MSCN
        distributions than over-smoothed ones.
    The logistic mapping constants are fixed (not fitted to any
    reference output) and documented here for reproducibility.
    """
    gray = _rgb2gray(img) / 255.0
    h, w = gray.shape
    nh, nw = h // block, w // block
    if nh == 0 or nw == 0:
        raise ValueError(f"image {gray.shape} smaller than block {block}")

    hf_ratios = []
    for i in range(nh):
        for j in range(nw):
            d = _dct2(gray[i * block:(i + 1) * block,
                           j * block:(j + 1) * block])
            energy = d * d
            total = float(energy.sum()) + 1e-12
            # "high frequency" = outside the lowest 8x8 corner.
            low = float(energy[:8, :8].sum())
            hf_ratios.append((total - low) / total)
    hf = float(np.mean(hf_ratios))

    mscn, _ = compute_mscn(gray * 255.0)
    spread = float(np.var(mscn))

    # Logistic maps: hf in [0,~0.5] and spread in [0,~1.5] for typical
    # content; centered so bicubic upscales land mid-scale.
    s_hf = 1.0 / (1.0 + np.exp(-(hf - 0.10) / 0.04))
    s_sp = 1.0 / (1.0 + np.exp(-(spread - 0.55) / 0.15))
    return float(10.0 * (0.6 * s_hf + 0.4 * s_sp))


_REAL_MODEL = None
_REAL_MODEL_PATH = ""    # path the loaded forest actually came from
_RESOLVED_ENV = None     # env value the cache was resolved against

# Packaged default forests (genuine 3-family feature pipeline + forest
# predictor, ordering-verified on held-out degradations).  Preference:
# natural-image-fitted (metrics/fit_natural.py — degradation ladder over
# real photographs found in installed packages) > synthetic-fitted
# (metrics/fit_ma.py).  $PESR_MA_MODEL (e.g. converted MATLAB TreeBagger
# weights) overrides both the moment real weights exist.
_HERE = os.path.dirname(__file__)
_DEFAULT_FOREST_PATHS = (os.path.join(_HERE, "ma_model_natural.npz"),
                         os.path.join(_HERE, "ma_model_synthetic.npz"))


def _real_model():
    """Resolve the forest-backed Ma regressor: $PESR_MA_MODEL >
    packaged synthetic-fitted forest > None (callers fall back to
    ma_score_approx).  Cached per env-var value — cheap to call per
    image, re-resolves if the env changes (tests, notebook use)."""
    global _REAL_MODEL, _REAL_MODEL_PATH, _RESOLVED_ENV

    env = os.environ.get("PESR_MA_MODEL", "")
    if _RESOLVED_ENV != env:
        from pesr_tpu.metrics.ma_features import load_ma_model
        _REAL_MODEL = load_ma_model()
        _REAL_MODEL_PATH = env if _REAL_MODEL is not None else ""
        if _REAL_MODEL is None:
            if env:
                # Provenance must reflect what actually loaded, never
                # the user's intent (round-3 review).
                print(f"[ma] WARNING: PESR_MA_MODEL={env} does not "
                      "exist; falling back to the packaged forest")
            for path in _DEFAULT_FOREST_PATHS:
                if os.path.exists(path):
                    _REAL_MODEL = load_ma_model(path)
                    _REAL_MODEL_PATH = path
                    break
        _RESOLVED_ENV = env
    return _REAL_MODEL


def _model_source() -> str:
    """Path the active forest was actually loaded from ('' if none)."""
    _real_model()
    return _REAL_MODEL_PATH


def ma_score(img: np.ndarray,
             predictor: Optional[Callable[[np.ndarray], float]] = None
             ) -> float:
    """Ma score: explicit ``predictor`` > loaded real regressor
    ($PESR_MA_MODEL npz, see metrics/ma_features.py) > documented
    approximation."""
    if predictor is not None:
        return float(predictor(img))
    model = _real_model()
    if model is not None:
        return float(model(img))
    return ma_score_approx(img)


def ma_provenance() -> str:
    """Which Ma predictor ``ma_score`` (without an explicit predictor)
    is using right now — surfaced in pirm.py's JSON output so consumers
    can tell forest-backed numbers from the approximation (round-2
    verdict #4)."""
    model = _real_model()
    if model is not None:
        embedded = model.arrays.get("provenance")
        return (f"forest:{_model_source()}"
                + (f" — {embedded}" if embedded is not None else ""))
    return ("approximation: fixed logistic constants "
            "(ma.ma_score_approx) — NOT published-Ma comparable")
