"""NIQE — Natural Image Quality Evaluator (Mittal, Soundararajan, Bovik
2013), the computable half of the PIRM perceptual index (SURVEY.md §2
item 10, §3.5; BASELINE.json:2).

Faithful reimplementation of the MATLAB reference pipeline:
  * luminance (MATLAB rgb2gray coefficients),
  * MSCN coefficients with a 7x7 Gaussian (sigma 7/6) local mean/std,
  * per-96x96-block features: GGD fit of MSCN (2) + AGGD fits of the
    four pairwise-product orientations (4 x 4) = 18 features,
  * two scales (the second after MATLAB-bicubic 0.5x downscale with
    antialias — pesr_tpu.ops.resize supplies the exact kernel) = 36,
  * quality = Mahalanobis-style distance between the test image's
    (mean, cov) over blocks and a pristine-corpus model (mu, cov).

The canonical pristine model (modelparameters.mat) ships with MATLAB
and is NOT redistributable/available here (SURVEY.md §7 hard-parts 3);
``fit_niqe_model`` rebuilds one from any folder of pristine images, and
a default model fitted on this repo's deterministic synthetic corpus is
cached under ``pesr_tpu/metrics/`` — replace it with a DIV2K-fitted
model for published-number parity.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterable, Optional, Tuple

import numpy as np
from scipy.special import gamma as _gamma_fn

from pesr_tpu.ops.resize import resize_kernel_matrix

_DEFAULT_MODEL_PATH = os.path.join(os.path.dirname(__file__),
                                   "niqe_model.npz")

# Precomputed gamma-ratio lookup for GGD/AGGD shape estimation.
_GAM = np.arange(0.2, 10.001, 0.001)
_R_GAM = (_gamma_fn(2.0 / _GAM) ** 2) / (
    _gamma_fn(1.0 / _GAM) * _gamma_fn(3.0 / _GAM))


def _rgb2gray(img: np.ndarray) -> np.ndarray:
    """MATLAB rgb2gray (values stay in [0,255])."""
    if img.ndim == 2:
        return img.astype(np.float64)
    x = img.astype(np.float64)
    return 0.2989 * x[..., 0] + 0.5870 * x[..., 1] + 0.1140 * x[..., 2]


def _gaussian_window(size: int = 7, sigma: float = 7.0 / 6.0) -> np.ndarray:
    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-(ax ** 2) / (2 * sigma ** 2))
    w = np.outer(k, k)
    return w / w.sum()


def _filter2_same(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """'same' correlation with replicate borders (MATLAB imfilter
    default in the NIQE code uses 'replicate')."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    padded = np.pad(img, ((ph, ph), (pw, pw)), mode="edge")
    h, w = img.shape
    shape = (h, w, kh, kw)
    strides = padded.strides * 2
    windows = np.lib.stride_tricks.as_strided(padded, shape, strides)
    return np.einsum("ijkl,kl->ij", windows, kernel, optimize=True)


def compute_mscn(gray: np.ndarray, c: float = 1.0
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """MSCN coefficients and the local-sigma field."""
    w = _gaussian_window()
    mu = _filter2_same(gray, w)
    sigma = np.sqrt(np.abs(_filter2_same(gray * gray, w) - mu * mu))
    return (gray - mu) / (sigma + c), sigma


def _estimate_ggd(vec: np.ndarray) -> Tuple[float, float]:
    """Generalized Gaussian fit -> (alpha, sigma^2)."""
    sigma_sq = float(np.mean(vec ** 2))
    e_abs = float(np.mean(np.abs(vec)))
    rho = sigma_sq / (e_abs ** 2 + 1e-12)
    alpha = _GAM[np.argmin(np.abs(_R_GAM - 1.0 / (rho + 1e-12)))]
    return float(alpha), sigma_sq


def _estimate_aggd(vec: np.ndarray) -> Tuple[float, float, float, float]:
    """Asymmetric GGD fit -> (alpha, mean, sigma_l^2, sigma_r^2)."""
    left = vec[vec < 0]
    right = vec[vec > 0]
    sigma_l_sq = float(np.mean(left ** 2)) if left.size else 0.0
    sigma_r_sq = float(np.mean(right ** 2)) if right.size else 0.0
    sigma_l = np.sqrt(sigma_l_sq)
    sigma_r = np.sqrt(sigma_r_sq)
    gamma_hat = sigma_l / (sigma_r + 1e-12)
    r_hat = (float(np.mean(np.abs(vec))) ** 2) / (
        float(np.mean(vec ** 2)) + 1e-12)
    r_hat_norm = r_hat * (gamma_hat ** 3 + 1) * (gamma_hat + 1) / (
        (gamma_hat ** 2 + 1) ** 2 + 1e-12)
    alpha = _GAM[np.argmin((_R_GAM - r_hat_norm) ** 2)]
    const = np.sqrt(_gamma_fn(1.0 / alpha) / _gamma_fn(3.0 / alpha))
    mean_param = (sigma_r - sigma_l) * (
        _gamma_fn(2.0 / alpha) / _gamma_fn(1.0 / alpha)) * const
    return float(alpha), float(mean_param), sigma_l_sq, sigma_r_sq


def _block_features(mscn: np.ndarray) -> np.ndarray:
    """The 18 NIQE features of one block's MSCN field."""
    feats = list(_estimate_ggd(mscn.ravel()))
    shifts = ((0, 1), (1, 0), (1, 1), (1, -1))  # H, V, D1, D2
    for dy, dx in shifts:
        # np.roll deliberately mirrors MATLAB's circshift: the official
        # NIQE/BRISQUE reference code forms its pairwise products as
        # imdist(:) .* circshift(imdist, shift)(:), i.e. WITH circular
        # wrap-around at block edges.  Do not "fix" this to a
        # non-wrapping shift — that would deviate from the published
        # feature definition the pristine model is fitted against.
        shifted = np.roll(np.roll(mscn, dy, axis=0), dx, axis=1)
        product = (mscn * shifted).ravel()
        feats.extend(_estimate_aggd(product))
    return np.asarray(feats, np.float64)


def _halve(gray: np.ndarray) -> np.ndarray:
    """MATLAB imresize(im, 0.5) with antialias, exact kernel."""
    h, w = gray.shape
    mh = resize_kernel_matrix(h, h // 2).astype(np.float64)
    mw = resize_kernel_matrix(w, w // 2).astype(np.float64)
    return mh @ gray @ mw.T


def extract_niqe_features(img: np.ndarray, block: int = 96,
                          sharpness_threshold: Optional[float] = None
                          ) -> np.ndarray:
    """Per-block 36-dim feature matrix [n_blocks, 36] over two scales.

    ``sharpness_threshold`` in (0,1] enables the fit-time patch
    selection (keep blocks whose mean local sigma exceeds threshold *
    max over blocks); None keeps all blocks (test-time behavior).
    """
    gray = _rgb2gray(img)
    h, w = gray.shape
    nh, nw = h // block, w // block
    if nh == 0 or nw == 0:
        raise ValueError(f"image {gray.shape} smaller than NIQE block "
                         f"{block}")
    gray = gray[:nh * block, :nw * block]

    per_scale = []
    keep = None
    for scale_idx in range(2):
        b = block // (2 ** scale_idx)
        mscn, sigma = compute_mscn(gray)
        feats, sharps = [], []
        for i in range(nh):
            for j in range(nw):
                blk = mscn[i * b:(i + 1) * b, j * b:(j + 1) * b]
                feats.append(_block_features(blk))
                sharps.append(np.mean(
                    sigma[i * b:(i + 1) * b, j * b:(j + 1) * b]))
        feats = np.stack(feats)
        if scale_idx == 0 and sharpness_threshold is not None:
            sharps = np.asarray(sharps)
            keep = sharps > sharpness_threshold * sharps.max()
            if keep.sum() < 2:
                keep = np.ones(len(feats), bool)
        per_scale.append(feats)
        if scale_idx == 0:
            gray = _halve(gray)
    all_feats = np.concatenate(per_scale, axis=1)
    return all_feats[keep] if keep is not None else all_feats


@dataclasses.dataclass
class NiqeModel:
    mu: np.ndarray    # [36]
    cov: np.ndarray   # [36, 36]
    # Free-text record of what the pristine model was fitted on, carried
    # in the npz and surfaced by pirm.py's JSON output so downstream
    # consumers can tell synthetic-fitted scores from natural-image ones
    # (round-2 verdict #4).
    provenance: str = ""

    def save(self, path: str) -> None:
        np.savez(path, mu=self.mu, cov=self.cov,
                 provenance=np.str_(self.provenance))

    @classmethod
    def load(cls, path: str) -> "NiqeModel":
        data = np.load(path)
        prov = (str(data["provenance"]) if "provenance" in data.files
                else f"{os.path.basename(path)} (no provenance recorded)")
        return cls(mu=data["mu"], cov=data["cov"], provenance=prov)


def fit_niqe_model(images: Iterable[np.ndarray],
                   sharpness_threshold: float = 0.75,
                   provenance: str = "") -> NiqeModel:
    """Fit the pristine model from HWC uint8 (or [0,255] float) images."""
    feats = np.concatenate([
        extract_niqe_features(img,
                              sharpness_threshold=sharpness_threshold)
        for img in images])
    return NiqeModel(mu=feats.mean(axis=0), cov=np.cov(feats.T),
                     provenance=provenance)


_DEFAULT_MODEL_CACHE: Optional[NiqeModel] = None
_RESOLVED_ENV: Optional[str] = None

# Natural-image-fitted pristine model (metrics/fit_natural.py: real
# photographs found in installed packages) — preferred over the
# synthetic-corpus fallback when present.  $PESR_NIQE_MODEL (e.g. a
# DIV2K-fitted npz) overrides both.
_NATURAL_MODEL_PATH = os.path.join(os.path.dirname(__file__),
                                   "niqe_model_natural.npz")


def _default_model() -> NiqeModel:
    """Resolve the pristine model ($PESR_NIQE_MODEL > packaged
    natural-image-fitted > packaged synthetic-fitted > lazy synthetic
    fit), once per process — niqe() runs per validation image, and
    without the memo a read-only install would re-fit the whole
    pristine model per image (and even the writable case re-read the
    npz each call).  Re-resolves if the env var changes (tests)."""
    global _DEFAULT_MODEL_CACHE, _RESOLVED_ENV
    env = os.environ.get("PESR_NIQE_MODEL", "")
    if _DEFAULT_MODEL_CACHE is not None and _RESOLVED_ENV == env:
        return _DEFAULT_MODEL_CACHE
    _RESOLVED_ENV = env
    if env and os.path.exists(env):
        model = NiqeModel.load(env)
        _DEFAULT_MODEL_CACHE = model
        return model
    if env:
        print(f"[niqe] WARNING: PESR_NIQE_MODEL={env} does not exist; "
              "falling back to the packaged pristine model")
    if os.path.exists(_NATURAL_MODEL_PATH):
        model = NiqeModel.load(_NATURAL_MODEL_PATH)
    elif os.path.exists(_DEFAULT_MODEL_PATH):
        model = NiqeModel.load(_DEFAULT_MODEL_PATH)
    else:
        from pesr_tpu.data.datasets import SyntheticImages
        src = SyntheticImages(num_images=24, height=480, width=480,
                              seed=1234)
        model = fit_niqe_model(
            [src.get(i) for i in range(len(src))],
            provenance="synthetic-fitted (deterministic synthetic "
                       "corpus) — NOT comparable to published NIQE")
        try:
            model.save(_DEFAULT_MODEL_PATH)
        except OSError:
            pass  # read-only install: keep the in-process memo only
    _DEFAULT_MODEL_CACHE = model
    return model


def niqe_from_features(feats: np.ndarray, model: NiqeModel) -> float:
    """NIQE score from a precomputed [n_blocks, 36] feature matrix
    (``extract_niqe_features`` output).  Split from :func:`niqe` so
    resampling studies (benchmarks/pi_precision.py) can score one
    image's cached features against many refit pristine models without
    re-running the MSCN/AGGD pipeline per model."""
    feats = feats[np.isfinite(feats).all(axis=1)]
    if feats.shape[0] == 0:
        raise ValueError("no finite NIQE feature blocks in image")
    mu_t = feats.mean(axis=0)
    # A single-block image (or fully degenerate blocks) has no sample
    # covariance; MATLAB's formula then reduces to pooling against the
    # pristine covariance alone.
    cov_t = (np.cov(feats.T) if feats.shape[0] > 1
             else np.zeros_like(model.cov))
    pooled = (model.cov + cov_t) / 2.0
    diff = model.mu - mu_t
    return float(np.sqrt(diff @ np.linalg.pinv(pooled) @ diff))


def niqe(img: np.ndarray, model: Optional[NiqeModel] = None) -> float:
    """NIQE score of one image (lower = more natural)."""
    model = model or _default_model()
    return niqe_from_features(extract_niqe_features(img), model)


def main(argv=None) -> int:
    """Refit the NIQE pristine model from a directory of natural images:

        python -m pesr_tpu.metrics.niqe --fit_dir <HR images> \\
            [--out pesr_tpu/metrics/niqe_model.npz] [--max_images N]

    Run against DIV2K_train_HR the moment real data lands (SURVEY.md
    §0.1 follow-ups): the bundled default model is fitted on the
    synthetic corpus and its absolute scores are not comparable to
    published NIQE values until refit on natural pristine images.
    """
    import argparse

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--fit_dir", required=True)
    p.add_argument("--out", default=_DEFAULT_MODEL_PATH)
    p.add_argument("--max_images", type=int, default=200)
    p.add_argument("--sharpness_threshold", type=float, default=0.75)
    args = p.parse_args(argv)

    from pesr_tpu.utils.image_io import imread_uint8

    files = sorted(
        f for f in os.listdir(args.fit_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
    )[: args.max_images]
    if not files:
        raise SystemExit(f"no images under {args.fit_dir}")
    print(f"fitting NIQE pristine model on {len(files)} images ...")
    imgs = (imread_uint8(os.path.join(args.fit_dir, f)) for f in files)
    model = fit_niqe_model(
        imgs, args.sharpness_threshold,
        provenance=f"fitted on {args.fit_dir} ({len(files)} images)")
    model.save(args.out)
    print(f"saved {args.out} (mu[0]={model.mu[0]:.4f})")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
