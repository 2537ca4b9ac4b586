"""Fit a real regression forest for the Ma metric on the synthetic
corpus (round-2 verdict #4) and save it in the :class:`MaModel` npz
schema so the plug-in path (``$PESR_MA_MODEL``) runs end-to-end with
the approximation disengaged.

    python -m pesr_tpu.metrics.fit_ma --out pesr_tpu/metrics/ma_model_synthetic.npz

Training signal: the published Ma regressor (CVIU 2017) was trained on
human opinion scores of SR outputs — unavailable here (zero egress, no
datasets).  The stand-in target is a DEGRADATION-LADDER ordinal score:
each synthetic-corpus image spawns variants spanning pristine -> mild
blur -> bicubic down/up at growing scales -> heavy blur, with fixed
scores in [1, 9.5] ordered by degradation severity (plus a noise rung
so the forests learn that high-frequency energy alone is not quality).
The fitted model therefore tracks the real metric's *ordering* on
SR-style degradations — the same contract as ``ma_score_approx`` — but
through the genuine 3-family feature pipeline and forest predictor
(metrics/ma_features.py), making the MATLAB-weight swap a pure data
drop.  Absolute values are NOT published-Ma comparable; the npz embeds
a ``provenance`` string and pirm.py surfaces it in its JSON output.

sklearn is used at FIT time only (it is available in this image); the
committed npz is consumed by the pure-NumPy ``MaModel`` predictor, so
runtime metric evaluation has no sklearn dependency.
"""

from __future__ import annotations

import argparse
from typing import Dict, List, Optional, Tuple

import numpy as np

from pesr_tpu.metrics.ma_features import _GROUPS, MaModel, \
    extract_ma_features


def degradation_ladder(hr: np.ndarray, rng: np.random.Generator
                       ) -> List[Tuple[np.ndarray, float]]:
    """(variant, target score) pairs for one pristine HWC uint8 image.

    Scores are a fixed ordinal ladder, not calibrated opinion scores —
    see the module docstring."""
    from scipy.ndimage import gaussian_filter

    from pesr_tpu.data.datasets import (host_bicubic_downsample,
                                        host_bicubic_resize)

    def blur(img: np.ndarray, sigma: float) -> np.ndarray:
        out = np.stack([gaussian_filter(img[..., c].astype(np.float64),
                                        sigma) for c in range(3)], -1)
        return np.clip(out + 0.5, 0, 255).astype(np.uint8)

    def down_up(img: np.ndarray, s: int) -> np.ndarray:
        h, w = img.shape[:2]
        lo = host_bicubic_downsample(img, s)
        return host_bicubic_resize(lo, h, w)

    noisy = np.clip(hr.astype(np.float64)
                    + rng.normal(0.0, 8.0, hr.shape) + 0.5,
                    0, 255).astype(np.uint8)
    return [
        (hr, 9.5),
        (blur(hr, 0.6), 7.5),
        (down_up(hr, 2), 6.5),
        (noisy, 5.5),
        (down_up(hr, 3), 5.0),
        (down_up(hr, 4), 3.5),
        (blur(down_up(hr, 4), 1.0), 2.5),
        (blur(hr, 2.5), 1.5),
    ]


def crops_from_images(images: List[np.ndarray], crop: int = 192,
                      max_crops_per_image: int = 4) -> List[np.ndarray]:
    """Deterministic grid of up to N crop x crop windows per image —
    turns arbitrarily-sized pristine sources (e.g. the natural-image
    registry) into ladder-ready HR patches."""
    out: List[np.ndarray] = []
    for img in images:
        h, w = img.shape[:2]
        if h < crop or w < crop:
            continue
        nh, nw = h // crop, w // crop
        # Corner-spread picks: corners first, row-major fallback.
        coords = [(i, j) for i in range(nh) for j in range(nw)]
        coords.sort(key=lambda ij: (min(ij[0], nh - 1 - ij[0])
                                    + min(ij[1], nw - 1 - ij[1])))
        for i, j in coords[:max_crops_per_image]:
            out.append(img[i * crop:(i + 1) * crop,
                           j * crop:(j + 1) * crop])
    return out


def build_training_set(num_images: int = 24, crop: int = 192,
                       seed: int = 77,
                       hr_images: Optional[List[np.ndarray]] = None
                       ) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    """Feature matrices per group + target vector over the ladder.

    ``hr_images``: explicit pristine HR sources (cropped to ``crop``
    windows); default is the deterministic synthetic corpus."""
    if hr_images is not None:
        patches = crops_from_images(hr_images, crop=crop)
    else:
        from pesr_tpu.data.datasets import SyntheticImages
        src = SyntheticImages(num_images=num_images, height=crop,
                              width=crop, seed=seed)
        patches = [src.get(i) for i in range(len(src))]
    rng = np.random.default_rng(seed)
    cols: Dict[str, List[np.ndarray]] = {g: [] for g in _GROUPS}
    ys: List[float] = []
    for hr in patches:
        for variant, score in degradation_ladder(hr, rng):
            feats = extract_ma_features(variant)
            for g in _GROUPS:
                cols[g].append(feats[g])
            ys.append(score)
    return ({g: np.stack(v) for g, v in cols.items()},
            np.asarray(ys, np.float64))


def _export_forest(forest, prefix: str) -> Dict[str, np.ndarray]:
    """sklearn RandomForestRegressor -> MaModel flat node arrays.

    sklearn's per-tree ``children_left/right`` already use local
    indices and -1 leaves — exactly the npz schema's convention."""
    left, right, feat, thr, val = [], [], [], [], []
    offsets = [0]
    for est in forest.estimators_:
        t = est.tree_
        left.append(t.children_left)
        right.append(t.children_right)
        feat.append(t.feature)
        thr.append(t.threshold)
        val.append(t.value.reshape(-1))
        offsets.append(offsets[-1] + t.node_count)
    return {
        f"{prefix}_children_left": np.concatenate(left).astype(np.int32),
        f"{prefix}_children_right": np.concatenate(right).astype(np.int32),
        f"{prefix}_feature": np.concatenate(feat).astype(np.int32),
        f"{prefix}_threshold": np.concatenate(thr).astype(np.float32),
        f"{prefix}_value": np.concatenate(val).astype(np.float32),
        f"{prefix}_tree_offsets": np.asarray(offsets, np.int32),
    }


def fit_forests(x: Dict[str, np.ndarray], y: np.ndarray,
                n_trees: int = 12, max_depth: int = 7, seed: int = 77,
                provenance: Optional[str] = None) -> MaModel:
    """Fit the per-group forests from already-extracted feature
    matrices (``build_training_set`` output).  Split from
    :func:`fit_ma_model` so resampling studies
    (benchmarks/pi_precision.py) can refit many times on row-resampled
    features without re-running the feature pipeline."""
    from sklearn.ensemble import RandomForestRegressor

    arrays: Dict[str, np.ndarray] = {}
    for g in _GROUPS:
        forest = RandomForestRegressor(
            n_estimators=n_trees, max_depth=max_depth, random_state=seed)
        forest.fit(x[g], y)
        arrays.update(_export_forest(forest, g))
    arrays["combine_w"] = np.full(3, 1 / 3, np.float32)
    arrays["combine_b"] = np.float32(0.0)
    arrays["provenance"] = np.str_(provenance or (
        "synthetic-fitted: degradation-ladder ordinal targets on the "
        "deterministic synthetic corpus (fit_ma.py) — ordering-faithful "
        "for SR degradations, NOT published-Ma comparable"))
    return MaModel(arrays)


def fit_ma_model(num_images: int = 24, n_trees: int = 12,
                 max_depth: int = 7, seed: int = 77,
                 hr_images: Optional[List[np.ndarray]] = None,
                 provenance: Optional[str] = None) -> MaModel:
    x, y = build_training_set(num_images=num_images, seed=seed,
                              hr_images=hr_images)
    return fit_forests(x, y, n_trees=n_trees, max_depth=max_depth,
                       seed=seed, provenance=provenance)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--num_images", type=int, default=24)
    p.add_argument("--n_trees", type=int, default=12)
    p.add_argument("--max_depth", type=int, default=7)
    p.add_argument("--seed", type=int, default=77)
    args = p.parse_args(argv)

    model = fit_ma_model(args.num_images, args.n_trees, args.max_depth,
                         args.seed)
    model.save(args.out)

    # Held-out sanity: the fitted score must order pristine > bicubic
    # x4 up > heavy blur on images the fit never saw.
    from pesr_tpu.data.datasets import SyntheticImages
    src = SyntheticImages(num_images=4, height=192, width=192, seed=991)
    rng = np.random.default_rng(0)
    ok = 0
    for i in range(len(src)):
        ladder = degradation_ladder(src.get(i), rng)
        s_hr = model(ladder[0][0])
        s_mid = model(ladder[5][0])   # down_up x4
        s_bad = model(ladder[7][0])   # blur 2.5
        ok += (s_hr > s_mid > s_bad)
        print(f"holdout {i}: hr {s_hr:.2f}  x4-up {s_mid:.2f}  "
              f"blur {s_bad:.2f}")
    print(f"ordering correct on {ok}/{len(src)} held-out images")
    print(f"saved -> {args.out}")
    return 0 if ok == len(src) else 1


if __name__ == "__main__":
    import sys
    sys.exit(main())
