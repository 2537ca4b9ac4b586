"""Ma et al. (2017) no-reference SR quality metric — the real feature
pipeline with a loadable-weights regressor (round-1 verdict item 7;
SURVEY.md §3.5 / §7 hard-part 3).

The published metric ("Learning a no-reference quality metric for
single-image super-resolution", CVIU 2017; MATLAB code `sr-metric`)
extracts three statistic families over a 3-scale pyramid and feeds each
to a trained regression forest, combining the three predictions:

  1. local frequency: 5x5 block-DCT coefficient statistics (GGD shape,
     coefficient of variation, high-frequency energy ratio);
  2. global frequency: wavelet subband statistics (GGD fits of
     LH/HL/HH detail bands per level + cross-level energy ratios);
  3. spatial: eigen-spectra of local patch covariance (PCA singular
     values).

This module implements those feature extractors in NumPy/SciPy (no
MATLAB, no network) and a forest predictor whose weights LOAD from an
``.npz`` — plugging converted published weights requires zero code
changes (see :class:`MaModel` for the exact array format a MATLAB
``TreeBagger`` -> npz converter must emit).  Until such weights exist
on this machine the metric falls back to ``ma.ma_score_approx``;
absolute published-Ma parity is impossible without them (documented in
metrics/ma.py), but the full feature pipeline below is deterministic,
shape-stable, and unit-tested so the swap is load-and-go.

Pooling/windowing details that the paper leaves loose are pinned here
(and may differ from the MATLAB internals — re-verify against official
outputs when weights arrive): percentile pooling at 10%, PERIODIZED
boundary extension for the DWT (mode 'per': keeps the transform exactly
orthogonal, which the unit tests pin via subband energy conservation;
MATLAB's default dwtmode is 'sym' — if converted TreeBagger weights
disagree at borders, switch _dwt_1d's np.pad to symmetric to match),
db2 wavelet.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from pesr_tpu.metrics.niqe import _estimate_ggd, _halve, _rgb2gray

# --------------------------------------------------------------------------
# Feature group 1: block-DCT statistics over 3 scales
# --------------------------------------------------------------------------


def _block_dct_stats(gray: np.ndarray, block: int = 5):
    """Per-block 2-D DCT stats of one scale: (GGD alpha of AC coeffs,
    coefficient of variation, HF energy ratio) pooled as mean + p10."""
    from scipy.fft import dctn

    h, w = gray.shape
    nh, nw = h // block, w // block
    if nh == 0 or nw == 0:
        raise ValueError(f"image {gray.shape} smaller than DCT block")
    alphas, covs, hfs = [], [], []
    # Vectorized block DCT: reshape into [nh, nw, block, block].
    blocks = gray[:nh * block, :nw * block].reshape(
        nh, block, nw, block).transpose(0, 2, 1, 3)
    coefs = dctn(blocks, axes=(2, 3), norm="ortho")
    for i in range(nh):
        for j in range(nw):
            d = coefs[i, j]
            ac = d.ravel()[1:]
            alpha, _ = _estimate_ggd(ac)
            alphas.append(alpha)
            mu = np.mean(np.abs(ac)) + 1e-12
            covs.append(float(np.std(np.abs(ac)) / mu))
            e = d * d
            total = float(e.sum()) + 1e-12
            hfs.append(1.0 - float(e[:2, :2].sum()) / total)
    out = []
    for v in (alphas, covs, hfs):
        v = np.asarray(v)
        out += [float(v.mean()), float(np.percentile(v, 10))]
    return out  # 6 per scale


def dct_features(gray: np.ndarray, scales: int = 3) -> np.ndarray:
    """[scales * 6] block-DCT features over the dyadic pyramid."""
    feats = []
    g = gray.astype(np.float64)
    for _ in range(scales):
        feats += _block_dct_stats(g)
        g = _halve(g)
    return np.asarray(feats, np.float64)


# --------------------------------------------------------------------------
# Feature group 2: wavelet subband statistics (db2, 3 levels)
# --------------------------------------------------------------------------

# Daubechies-2 analysis filters (orthonormal).
_DB2_LO = np.array([1 + np.sqrt(3), 3 + np.sqrt(3),
                    3 - np.sqrt(3), 1 - np.sqrt(3)]) / (4 * np.sqrt(2))
_DB2_HI = _DB2_LO[::-1] * np.array([1, -1, 1, -1])


def _dwt_1d(x: np.ndarray, axis: int):
    """One periodized DWT level along ``axis`` (exactly orthogonal:
    subband energies sum to input energy); returns (approx, detail),
    each of length floor(n/2) (odd extents drop the last sample)."""
    n = x.shape[axis] - (x.shape[axis] % 2)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, n)
    x = x[tuple(sl)]
    pad = len(_DB2_LO) - 2
    ext = [(0, 0)] * x.ndim
    ext[axis] = (0, pad)
    xe = np.pad(x, ext, mode="wrap")

    def corr(filt):
        out = None
        for k, f in enumerate(filt):
            s = [slice(None)] * x.ndim
            s[axis] = slice(k, k + n, 2)
            term = f * xe[tuple(s)]
            out = term if out is None else out + term
        return out

    return corr(_DB2_LO), corr(_DB2_HI)


def dwt2(gray: np.ndarray):
    """One 2-D DWT level -> (LL, (LH, HL, HH))."""
    lo, hi = _dwt_1d(gray, 0)
    ll, lh = _dwt_1d(lo, 1)
    hl, hh = _dwt_1d(hi, 1)
    return ll, (lh, hl, hh)


def wavelet_features(gray: np.ndarray, levels: int = 3) -> np.ndarray:
    """[levels * 6 + (levels-1)] features: per level and detail band
    (LH/HL/HH) the GGD alpha and log-energy pooled over the band, plus
    cross-level energy ratios (fine/coarse)."""
    g = gray.astype(np.float64)
    feats = []
    energies = []
    for _ in range(levels):
        g, (lh, hl, hh) = dwt2(g)
        level_e = 0.0
        for band in (lh, hl, hh):
            alpha, sigma_sq = _estimate_ggd(band.ravel())
            feats += [alpha, float(np.log1p(sigma_sq))]
            level_e += float(np.mean(band * band))
        energies.append(level_e + 1e-12)
    for k in range(len(energies) - 1):
        feats.append(float(energies[k] / energies[k + 1]))
    return np.asarray(feats, np.float64)


# --------------------------------------------------------------------------
# Feature group 3: patch-PCA singular values over 3 scales
# --------------------------------------------------------------------------


def pca_features(gray: np.ndarray, patch: int = 5, scales: int = 3,
                 stride: int = 3) -> np.ndarray:
    """[scales * patch^2] normalized eigen-spectra of the local patch
    covariance: sharp natural images spread variance across many
    principal directions; blur concentrates it in the first few."""
    feats = []
    g = gray.astype(np.float64)
    for _ in range(scales):
        h, w = g.shape
        if h < patch or w < patch:
            feats += [0.0] * (patch * patch)
            continue
        ys = np.arange(0, h - patch + 1, stride)
        xs = np.arange(0, w - patch + 1, stride)
        idx = (ys[:, None, None, None] + np.arange(patch)[None, :, None,
                                                          None],
               xs[None, None, :, None] + np.arange(patch)[None, None,
                                                          None, :])
        patches = g[idx[0], idx[1]].reshape(len(ys) * len(xs), -1)
        patches = patches - patches.mean(axis=1, keepdims=True)
        cov = patches.T @ patches / max(len(patches) - 1, 1)
        eig = np.linalg.eigvalsh(cov)[::-1]
        eig = eig / (eig.sum() + 1e-12)
        feats += [float(v) for v in eig]
        g = _halve(g)
    return np.asarray(feats, np.float64)


def extract_ma_features(img: np.ndarray) -> Dict[str, np.ndarray]:
    """All three Ma feature groups of one HWC uint8 (or grayscale)
    image, keyed ``dct`` / ``wavelet`` / ``pca``."""
    gray = _rgb2gray(img)
    return {"dct": dct_features(gray),
            "wavelet": wavelet_features(gray),
            "pca": pca_features(gray)}


# --------------------------------------------------------------------------
# Loadable regressor
# --------------------------------------------------------------------------

_GROUPS = ("dct", "wavelet", "pca")


def _predict_forest(x: np.ndarray, left: np.ndarray, right: np.ndarray,
                    feature: np.ndarray, threshold: np.ndarray,
                    value: np.ndarray, offsets: np.ndarray) -> float:
    """Mean prediction of a CART forest stored as flat node arrays.

    Node arrays are the sklearn/CART convention: ``left[i] == -1``
    marks a leaf whose prediction is ``value[i]``; interior nodes route
    to ``left[i]`` if ``x[feature[i]] <= threshold[i]`` else
    ``right[i]``.  ``offsets[[t, t+1]]`` brackets tree ``t``'s nodes.
    """
    preds = []
    for t in range(len(offsets) - 1):
        base = int(offsets[t])
        i = base
        while left[i] != -1:
            f = feature[i]
            i = base + int(left[i] if x[f] <= threshold[i]
                           else right[i])
        preds.append(float(value[i]))
    return float(np.mean(preds))


@dataclasses.dataclass
class MaModel:
    """Three per-group regressors + combination weights.

    npz format (what a MATLAB ``TreeBagger`` -> npz converter emits;
    also what :meth:`save` writes):
      for each group g in dct/wavelet/pca EITHER a forest
        ``{g}_children_left / {g}_children_right / {g}_feature /
        {g}_threshold / {g}_value`` (flat int32/f32 node arrays, child
        indices LOCAL to their tree) and ``{g}_tree_offsets``
        (int32 [n_trees+1]),
      OR a linear model ``{g}_linear_w`` [D] + ``{g}_linear_b`` [] —
      and ``combine_w`` f32 [3] + ``combine_b`` f32 [] for the final
      weighted sum (the official metric averages: w = 1/3, b = 0).
    """

    arrays: Dict[str, np.ndarray]

    @classmethod
    def load(cls, path: str) -> "MaModel":
        with np.load(path) as z:
            return cls({k: z[k] for k in z.files})

    def save(self, path: str) -> None:
        np.savez(path, **self.arrays)

    def _group_predict(self, g: str, x: np.ndarray) -> float:
        a = self.arrays
        if f"{g}_linear_w" in a:
            return float(x @ a[f"{g}_linear_w"] + a[f"{g}_linear_b"])
        return _predict_forest(
            x, a[f"{g}_children_left"], a[f"{g}_children_right"],
            a[f"{g}_feature"], a[f"{g}_threshold"], a[f"{g}_value"],
            a[f"{g}_tree_offsets"])

    def predict(self, feats: Dict[str, np.ndarray]) -> float:
        w = self.arrays.get("combine_w", np.full(3, 1 / 3))
        b = float(self.arrays.get("combine_b", 0.0))
        s = sum(float(wg) * self._group_predict(g, feats[g])
                for wg, g in zip(w, _GROUPS))
        return s + b

    def __call__(self, img: np.ndarray) -> float:
        return self.predict(extract_ma_features(img))


def load_ma_model(path: Optional[str] = None) -> Optional[MaModel]:
    """Load the real Ma regressor from ``path`` or $PESR_MA_MODEL;
    None when neither exists (callers fall back to the approximation)."""
    import os
    path = path or os.environ.get("PESR_MA_MODEL", "")
    if path and os.path.exists(path):
        return MaModel.load(path)
    return None
