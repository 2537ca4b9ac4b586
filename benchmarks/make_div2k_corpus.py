"""Synthesize a DIV2K-shaped ON-DISK corpus (round-4 verdict #1).

The reference trains from ~800 2K-resolution PNGs on disk
(SURVEY.md §2 item 5: DIV2K_train_HR + DIV2K_train_LR_bicubic/X<s>
with the ``0001x4.png`` naming), but every training benchmark in this
repo fed the in-memory procedural corpus — the production ingest path
(PairedImageFolder -> PatchIterator/native sampler -> Prefetcher) had
never run at real-data volume.  This script writes that corpus so
benchmarks/ingest_bench.py and the long-soak runs can exercise the
disk path end-to-end:

  <out>/DIV2K/DIV2K_train_HR/0001.png .. 0800.png   (~2040x1344)
  <out>/DIV2K/DIV2K_train_LR_bicubic/X4/0001x4.png  (MATLAB-bicubic)
  <out>/div2k_val/HR + LR_bicubic/X4                (held-out val split)

Layouts match pesr_tpu.data.datasets._resolve_train_source /
load_eval_set exactly, so ``train.py --data_root <out>`` runs the
production path unchanged.

Content: the same three procedural families as the in-memory corpus
(classic smooth / hard x2-band / hard_x4 sub-x4-Nyquist band, mixed
50/25/25) rendered by a FAST float32 generator — the in-memory
renderer's float64 full-canvas math costs 23-28 s per 2K hard image
on this box's single host core (profiled), which would put an 800-
image corpus at ~3 h.  The fast renderer windows every feature to its
bounding box and lands at ~1-3 s/image with the same feature
statistics (gratings/strokes/checkerboards/edges in the same bands).
Byte-parity with SyntheticImages is NOT a goal: this corpus is a new
artifact; determinism per (seed, index) is (re-run the script, get
the same corpus).

Usage:
  python benchmarks/make_div2k_corpus.py --out /tmp/div2k_synth \
      --num 800 --val 10 --lr_scales 4
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
from PIL import Image

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pesr_tpu.data.datasets import host_bicubic_downsample  # noqa: E402

# DIV2K images are ~2K with varying aspect; all dims multiples of 24
# (divisible by every supported scale's crop convention incl. 8 and 12).
_SIZES = [(1344, 2040), (1368, 2040), (1344, 1992), (1320, 2016)]


def _smooth_base(rng: np.random.Generator, h: int, w: int,
                 n: int, f_hi: float, amp_rng) -> np.ndarray:
    """Sum of full-canvas low-frequency cosine gratings (float32)."""
    yy = np.arange(h, dtype=np.float32)[:, None]
    xx = np.arange(w, dtype=np.float32)[None, :]
    img = np.zeros((h, w, 3), np.float32)
    for _ in range(n):
        fy, fx = rng.uniform(0.5, f_hi, 2)
        phase = rng.uniform(0, 2 * np.pi)
        g = np.cos(2 * np.pi * (fy * yy / h + fx * xx / w)
                   + phase).astype(np.float32)
        img += rng.uniform(*amp_rng) * g[:, :, None] \
            * rng.uniform(0.3, 1.0, 3).astype(np.float32)
    return img


def render_fast(idx: int, h: int, w: int, variant: str,
                seed: int = 0) -> np.ndarray:
    """Fast 2K-scale render: same feature families/bands as the
    in-memory corpus, every local feature computed only in its
    bounding box, float32 throughout, no 2x supersample (features are
    drawn with soft edges directly, so downsample antialiasing is not
    needed for learnable statistics)."""
    rng = np.random.default_rng(seed * 100003 + idx
                                + {"classic": 0, "hard": 91001,
                                   "hard_x4": 92002}[variant])
    if variant == "classic":
        img = _smooth_base(rng, h, w, 6, 24.0, (0.05, 0.35))
        for _ in range(8):
            y0 = int(rng.integers(0, h - 8))
            x0 = int(rng.integers(0, w - 8))
            y1 = y0 + int(rng.integers(8, max(9, h // 3)))
            x1 = x0 + int(rng.integers(8, max(9, w // 3)))
            img[y0:y1, x0:x1] += rng.uniform(-0.4, 0.4, 3) \
                .astype(np.float32)
        img += rng.normal(0, 0.02, (h, w, 3)).astype(np.float32)
    else:
        x4 = variant == "hard_x4"
        # Bands in FINAL-resolution cycles/px (no supersample here).
        f_rng = (0.044, 0.12) if x4 else (0.1, 0.35)
        per_rng = (8, 27) if x4 else (2, 7)
        thick_rng = (4.0, 12.0) if x4 else (1.0, 3.0)
        len_rng = (16, 120) if x4 else (4, 30)
        strokes_rng = (60, 160) if x4 else (240, 480)

        img = _smooth_base(rng, h, w, 3, 12.0, (0.05, 0.2))

        # Windowed oriented gratings, evaluated in the +-3.5 sigma box.
        for _ in range(24):
            f = rng.uniform(*f_rng)
            theta = rng.uniform(0, np.pi)
            cy, cx = rng.uniform(0.05, 0.95) * h, rng.uniform(0.05, 0.95) * w
            sig = rng.uniform(0.02, 0.08) * h
            r = 3.5 * sig
            lo_y, hi_y = max(0, int(cy - r)), min(h, int(cy + r) + 1)
            lo_x, hi_x = max(0, int(cx - r)), min(w, int(cx + r) + 1)
            ly = np.arange(lo_y, hi_y, dtype=np.float32)[:, None] - cy
            lx = np.arange(lo_x, hi_x, dtype=np.float32)[None, :] - cx
            window = np.exp(-(ly * ly + lx * lx) / (2 * sig * sig))
            carrier = np.cos(
                2 * np.pi * f * (np.cos(theta) * ly + np.sin(theta) * lx)
                + rng.uniform(0, 2 * np.pi)).astype(np.float32)
            img[lo_y:hi_y, lo_x:hi_x] += (
                rng.uniform(0.25, 0.5) * window * carrier)[:, :, None] \
                * rng.uniform(0.5, 1.0, 3).astype(np.float32)

        # Step edges inside random circles (bbox-windowed), soft 1-px
        # antialiased boundary via a clipped signed distance.
        for _ in range(16):
            cy, cx = rng.uniform(0, h), rng.uniform(0, w)
            rad = rng.uniform(0.04, 0.2) * h
            lo_y, hi_y = max(0, int(cy - rad)), min(h, int(cy + rad) + 1)
            lo_x, hi_x = max(0, int(cx - rad)), min(w, int(cx + rad) + 1)
            if hi_y <= lo_y or hi_x <= lo_x:
                continue
            ly = np.arange(lo_y, hi_y, dtype=np.float32)[:, None] - cy
            lx = np.arange(lo_x, hi_x, dtype=np.float32)[None, :] - cx
            t = rng.uniform(0, np.pi)
            inside = (ly * ly + lx * lx) < rad * rad
            sd = np.sin(t) * ly + np.cos(t) * lx
            half = np.clip(sd + 0.5, 0.0, 1.0)  # soft half-plane edge
            img[lo_y:hi_y, lo_x:hi_x] += (
                inside * half * rng.uniform(-0.5, 0.5))[:, :, None] \
                * np.ones(3, np.float32)

        # Checkerboard patches (soft-edge squares via sin product).
        for _ in range(8):
            ph = int(rng.integers(min(192, h // 4), max(193, h // 3)))
            pw = int(rng.integers(min(192, w // 4), max(193, w // 3)))
            y0 = int(rng.integers(0, max(1, h - ph)))
            x0 = int(rng.integers(0, max(1, w - pw)))
            per = int(rng.integers(*per_rng))
            ys = np.arange(ph, dtype=np.int64)[:, None]
            xs = np.arange(pw, dtype=np.int64)[None, :]
            board = (((ys // per) + (xs // per)) % 2).astype(np.float32)
            img[y0:y0 + ph, x0:x0 + pw] += (
                rng.uniform(0.3, 0.6) * (board - 0.5))[:, :, None] \
                * rng.uniform(0.5, 1.0, 3).astype(np.float32)

        # Glyph strokes: distance-to-segment in the stroke bbox.
        for _ in range(int(rng.integers(*strokes_rng))):
            y0, x0 = rng.uniform(0, h), rng.uniform(0, w)
            length = rng.uniform(*len_rng)
            t = rng.uniform(0, np.pi)
            y1 = float(np.clip(y0 + length * np.sin(t), 0, h - 1))
            x1 = float(np.clip(x0 + length * np.cos(t), 0, w - 1))
            thick = rng.uniform(*thick_rng)
            lo_y = int(max(0, min(y0, y1) - thick - 1))
            hi_y = int(min(h, max(y0, y1) + thick + 1))
            lo_x = int(max(0, min(x0, x1) - thick - 1))
            hi_x = int(min(w, max(x0, x1) + thick + 1))
            if hi_y <= lo_y or hi_x <= lo_x:
                continue
            ly = np.arange(lo_y, hi_y, dtype=np.float32)[:, None]
            lx = np.arange(lo_x, hi_x, dtype=np.float32)[None, :]
            dy, dx = y1 - y0, x1 - x0
            den = dy * dy + dx * dx + 1e-9
            tt = np.clip(((ly - y0) * dy + (lx - x0) * dx) / den, 0, 1)
            dist = np.hypot(ly - (y0 + tt * dy), lx - (x0 + tt * dx))
            mask = np.clip(thick / 2 + 0.5 - dist, 0, 1) \
                .astype(np.float32)
            img[lo_y:hi_y, lo_x:hi_x] += (
                rng.uniform(-0.9, 0.9) * mask)[:, :, None] \
                * np.ones(3, np.float32)

    img -= img.min()
    img /= max(float(img.max()), 1e-9)
    return (img * 255.0).round().astype(np.uint8)


def _variant_for(i: int) -> str:
    # Deterministic 50/25/25 interleave: even -> classic, then
    # alternate hard / hard_x4 on the odd slots.
    if i % 2 == 0:
        return "classic"
    return "hard" if i % 4 == 1 else "hard_x4"


def write_corpus(out: str, num: int, val: int, lr_scales, seed: int,
                 log_every: int = 25) -> dict:
    hr_dir = os.path.join(out, "DIV2K", "DIV2K_train_HR")
    os.makedirs(hr_dir, exist_ok=True)
    lr_dirs = {}
    for s in lr_scales:
        d = os.path.join(out, "DIV2K", "DIV2K_train_LR_bicubic", f"X{s}")
        os.makedirs(d, exist_ok=True)
        lr_dirs[s] = d
    val_hr = os.path.join(out, "div2k_val", "HR")
    os.makedirs(val_hr, exist_ok=True)
    val_lr = {}
    for s in lr_scales:
        d = os.path.join(out, "div2k_val", "LR_bicubic", f"X{s}")
        os.makedirs(d, exist_ok=True)
        val_lr[s] = d

    t0 = time.time()
    n_written = 0
    for i in range(num + val):
        is_val = i >= num
        stem = f"{i + 1:04d}"
        hdir = val_hr if is_val else hr_dir
        ldirs = val_lr if is_val else lr_dirs
        hr_path = os.path.join(hdir, f"{stem}.png")
        if (os.path.exists(hr_path)
                and all(os.path.exists(
                    os.path.join(ldirs[s], f"{stem}x{s}.png"))
                    for s in lr_scales)):
            continue  # resumable: re-running skips complete images
        h, w = _SIZES[i % len(_SIZES)]
        img = render_fast(i, h, w, _variant_for(i), seed=seed)
        Image.fromarray(img).save(hr_path)
        for s in lr_scales:
            lr = host_bicubic_downsample(img, s)
            Image.fromarray(lr).save(
                os.path.join(ldirs[s], f"{stem}x{s}.png"))
        n_written += 1
        if n_written % log_every == 0:
            dt = time.time() - t0
            print(f"[{i + 1}/{num + val}] {dt:.0f}s "
                  f"({dt / n_written:.1f} s/img)", flush=True)

    manifest = {
        "num_train": num, "num_val": val, "seed": seed,
        "lr_scales": list(lr_scales), "sizes": _SIZES,
        "mix": "50% classic / 25% hard / 25% hard_x4",
        "wall_s": round(time.time() - t0, 1),
        "written_this_run": n_written,
    }
    with open(os.path.join(out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", default="/tmp/div2k_synth")
    ap.add_argument("--num", type=int, default=800)
    ap.add_argument("--val", type=int, default=10)
    ap.add_argument("--lr_scales", default="4",
                    help="comma-separated LR scales to pre-generate")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    scales = [int(s) for s in args.lr_scales.split(",") if s]
    m = write_corpus(args.out, args.num, args.val, scales, args.seed)
    print(json.dumps(m))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
