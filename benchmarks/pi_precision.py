#!/usr/bin/env python
"""PI instrument precision: what spread do the fitted Ma/NIQE stand-ins
put on a reported perceptual-index value? (round-4 verdict #5)

The PIRM contract row is "PI within +-0.1" (BASELINE.json:5), but the
stand-in metric models are fit on an 11-photograph registry and PI is
reported as a point value.  This study bootstraps the instrument's two
error sources and reports whether +-0.1 is resolvable:

  1. image-sampling spread — mean PI over a finite eval set: the
     per-image std / sqrt(n) (same statistic pirm.evaluate_dir now
     emits as ``pi_sem``).
  2. fit-set sensitivity — refit the Ma forests AND the NIQE pristine
     model on K bootstrap resamples of the 11 fit photographs, score a
     FIXED eval set with every refit pair, and take the std of the
     mean PI across refits.  Features are extracted once per image and
     reused (fit_ma.fit_forests / niqe.niqe_from_features), so the K
     refits cost seconds, not feature-pipeline hours.
  3. forest-seed sensitivity — same fit set, K forest random seeds
     (NIQE has no stochastic fit step; this isolates sklearn's
     bootstrap-and-feature-subsample noise).

Eval set = SR-like content the instrument actually scores: MATLAB-
bicubic x4 down/up crops of the three never-fitted holdout photographs
plus held-out synthetic images (seed 991 — no fit ever used it).

Prints ONE JSON line; PARITY.md quotes the numbers.  Runs on CPU only
(feature pipelines are NumPy/scipy; the TPU is not touched).
"""

import json
import os
import sys
import time

import numpy as np


def _eval_images(crop: int = 384) -> list:
    """(name, SR-like uint8 image) eval set: x4 down/up of holdout
    photograph crops + held-out synthetic images."""
    from pesr_tpu.data.datasets import (SyntheticImages,
                                        host_bicubic_downsample,
                                        host_bicubic_resize)
    from pesr_tpu.metrics.fit_ma import crops_from_images
    from pesr_tpu.metrics.natural_images import load_holdout_images

    def down_up(img):
        h, w = img.shape[:2]
        return host_bicubic_resize(host_bicubic_downsample(img, 4), h, w)

    out = []
    for name, img in load_holdout_images():
        for k, c in enumerate(crops_from_images(
                [img], crop=crop, max_crops_per_image=4)):
            out.append((f"{name}/{k}", down_up(c)))
    src = SyntheticImages(num_images=6, height=crop, width=crop,
                          seed=991)
    for i in range(len(src)):
        out.append((f"synthetic991/{i}", down_up(src.get(i))))
    return out


def main() -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))

    from pesr_tpu.metrics.fit_ma import (build_training_set,
                                         fit_forests)
    from pesr_tpu.metrics.ma_features import extract_ma_features
    from pesr_tpu.metrics.natural_images import load_natural_images
    from pesr_tpu.metrics.niqe import (NiqeModel, extract_niqe_features,
                                       niqe_from_features)

    k_boot = int(os.environ.get("PIP_BOOT", "16"))
    k_seeds = int(os.environ.get("PIP_SEEDS", "8"))
    t0 = time.time()

    fit_named = load_natural_images()
    fit_names = [n for n, _ in fit_named]
    fit_images = [img for _, img in fit_named]
    n_fit = len(fit_images)
    print(f"[pi_precision] fit set: {n_fit} images "
          f"({', '.join(fit_names)})", file=sys.stderr)

    # ---- one-time feature extraction, grouped per fit image ----
    # NIQE pristine features: fit-time sharpness selection, per image.
    niqe_fit_feats = [extract_niqe_features(img, sharpness_threshold=0.75)
                      for img in fit_images]
    # Ma ladder features: build each image's (x, y) rows independently
    # (seed derived from the image index so a bootstrap replicate is
    # order-independent).
    ma_groups = []
    for i, img in enumerate(fit_images):
        x, y = build_training_set(hr_images=[img], seed=77 + i)
        ma_groups.append((x, y))
    print(f"[pi_precision] fit features extracted "
          f"({time.time() - t0:.0f}s)", file=sys.stderr)

    # ---- eval set + its cached features ----
    evals = _eval_images()
    eval_niqe = [extract_niqe_features(img) for _, img in evals]
    eval_ma = [extract_ma_features(img) for _, img in evals]
    n_eval = len(evals)
    # A second condition on the SAME underlying content (a mild blur of
    # each SR-like eval image) measures the instrument's PAIRED-DELTA
    # precision: every committed PI claim in demo/README is a
    # difference between two engines scored on identical images, not an
    # absolute value.
    from scipy.ndimage import gaussian_filter

    def _blur(img):
        out = np.stack([gaussian_filter(img[..., c].astype(np.float64),
                                        1.0) for c in range(3)], -1)
        return np.clip(out + 0.5, 0, 255).astype(np.uint8)

    evals_b = [(n, _blur(img)) for n, img in evals]
    eval_niqe_b = [extract_niqe_features(img) for _, img in evals_b]
    eval_ma_b = [extract_ma_features(img) for _, img in evals_b]
    print(f"[pi_precision] eval set: {n_eval} SR-like images x 2 "
          f"conditions ({time.time() - t0:.0f}s)", file=sys.stderr)

    def mean_pi(niqe_model: NiqeModel, ma_model,
                niqe_feats=None, ma_feats=None):
        pis = [0.5 * ((10.0 - ma_model.predict(mf))
                      + niqe_from_features(nf, niqe_model))
               for nf, mf in zip(niqe_feats or eval_niqe,
                                 ma_feats or eval_ma)]
        return float(np.mean(pis)), [float(p) for p in pis]

    def refit(image_idx, seed=77):
        feats = np.concatenate([niqe_fit_feats[i] for i in image_idx])
        nm = NiqeModel(mu=feats.mean(axis=0), cov=np.cov(feats.T),
                       provenance="bootstrap replicate")
        xs = {g: np.concatenate([ma_groups[i][0][g] for i in image_idx])
              for g in ma_groups[0][0]}
        ys = np.concatenate([ma_groups[i][1] for i in image_idx])
        mm = fit_forests(xs, ys, seed=seed,
                         provenance="bootstrap replicate")
        return nm, mm

    # ---- baseline: the full fit set, canonical seed (this IS the
    # packaged-model recipe modulo per-image ladder seeds) ----
    nm0, mm0 = refit(list(range(n_fit)))
    pi0, pis0 = mean_pi(nm0, mm0)
    pi_img_std = float(np.std(pis0))
    pi_img_sem = pi_img_std / np.sqrt(n_eval)

    # ---- fit-set bootstrap ----
    rng = np.random.default_rng(0)
    boot_means, boot_deltas = [], []
    for k in range(k_boot):
        idx = rng.integers(0, n_fit, size=n_fit)
        nm, mm = refit(list(idx))
        m, _ = mean_pi(nm, mm)
        mb, _ = mean_pi(nm, mm, eval_niqe_b, eval_ma_b)
        boot_means.append(m)
        boot_deltas.append(mb - m)
        print(f"[pi_precision] boot {k}: mean PI {m:.3f} "
              f"blur-delta {mb - m:+.3f} "
              f"(images {sorted(set(int(i) for i in idx))})",
              file=sys.stderr)
    pi_fit_boot_std = float(np.std(boot_means))
    pi_delta_fit_boot_std = float(np.std(boot_deltas))

    # ---- forest-seed sweep (fixed full fit set) ----
    seed_means, seed_deltas = [], []
    for s in range(k_seeds):
        nm, mm = refit(list(range(n_fit)), seed=s)
        m, _ = mean_pi(nm, mm)
        mb, _ = mean_pi(nm, mm, eval_niqe_b, eval_ma_b)
        seed_means.append(m)
        seed_deltas.append(mb - m)
    pi_seed_std = float(np.std(seed_means))
    pi_delta_seed_std = float(np.std(seed_deltas))

    out = {
        "metric": "pi_fit_boot_std", "value": round(pi_fit_boot_std, 4),
        "unit": "PI (std of mean over fit-set bootstrap)",
        "contract_tolerance": 0.1,
        "pi_mean": round(pi0, 4),
        "pi_image_std": round(pi_img_std, 4),
        "pi_image_sem": round(pi_img_sem, 4),
        "pi_fit_boot_std": round(pi_fit_boot_std, 4),
        "pi_fit_boot_means": [round(m, 4) for m in boot_means],
        "pi_seed_std": round(pi_seed_std, 4),
        "pi_seed_means": [round(m, 4) for m in seed_means],
        # Paired delta (blurred-vs-SR-like on identical images): the
        # statistic every committed PI comparison actually uses.
        "pi_delta_mean": round(float(np.mean(boot_deltas)), 4),
        "pi_delta_fit_boot_std": round(pi_delta_fit_boot_std, 4),
        "pi_delta_seed_std": round(pi_delta_seed_std, 4),
        "n_fit_images": n_fit, "n_eval_images": n_eval,
        "k_boot": k_boot, "k_seeds": k_seeds,
        "eval_images": [n for n, _ in evals],
        # What +-0.1 claims the stand-in can and cannot support:
        # paired deltas on identical images with ONE committed model
        # pair repeat to the seed noise; absolute values inherit the
        # fit-set spread and need the real MATLAB weights.
        "delta_same_images_resolvable_01": bool(
            pi_delta_seed_std < 0.1),
        "absolute_resolvable_01": bool(
            pi_fit_boot_std < 0.1 and pi_img_sem < 0.1),
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
