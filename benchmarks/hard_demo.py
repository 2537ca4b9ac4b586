#!/usr/bin/env python
"""Hard-corpus x2 demo + natural-holdout eval row (round-3 verdict #4).

The classic synthetic corpus is too smooth for x2 SR to matter
(bicubic already scores 45.7 dB; the learned margin was +0.14 dB).
``synthetic_hard`` (data/datasets.py) adds glyph strokes, fine oriented
textures, checkerboards, and step edges — its x2 bicubic baseline is
~34.5 dB, leaving real restoration headroom.  This script:

1. trains the 8x64 x2 demo generator on ``synthetic_hard`` (same
   budget as the classic x2 demo: 8000 L1 steps), slims the checkpoint
   to generator-params-only, and measures learned-vs-bicubic PSNR on
   the held-out hard eval images;
2. evaluates the committed x4 demo checkpoint on the NATURAL registry
   including the holdout photograph (the one image neither the metric
   fits nor any training ever saw) — PSNR/PI per image, holdout called
   out.

    python benchmarks/hard_demo.py [--steps 8000]
        [--out benchmarks/hard_demo_r4.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def bicubic_baseline(samples, scale: int) -> float:
    """Mean Y-PSNR of MATLAB-bicubic upsampling on an eval set."""
    import jax.numpy as jnp
    import numpy as np

    from pesr_tpu.metrics import calc_psnr
    from pesr_tpu.ops.resize import imresize

    ps = []
    for s in samples:
        h, w = s.lr.shape[:2]
        up = imresize(jnp.asarray(s.lr, jnp.float32),
                      (h * scale, w * scale))
        up = np.clip(np.round(np.asarray(up)), 0, 255).astype(np.uint8)
        ps.append(calc_psnr(up, s.hr, crop_border=scale))
    return float(np.mean(ps))


def model_psnr(ckpt: str, scale: int, samples) -> float:
    import numpy as np

    from pesr_tpu.metrics import calc_psnr
    from pesr_tpu.models.fold import folded_inference
    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    from pesr_tpu.training.checkpoint import restore_generator_params

    params, _ = restore_generator_params(ckpt)
    apply_fn, variables = folded_inference(params, scale)
    eng = BatchTiledUpscaler(apply_fn, variables, scale, "auto", 8)
    srs = eng.upscale_many([s.lr for s in samples], batch_size=8)
    return float(np.mean([calc_psnr(sr, s.hr, crop_border=scale)
                          for sr, s in zip(srs, samples)]))


def natural_holdout_rows(ckpt: str, scale: int) -> list:
    """Per-image PSNR/PI of a checkpoint on the natural registry
    (includes the holdout photo the metric fits never saw)."""
    import numpy as np

    from pesr_tpu.config import Opts
    from pesr_tpu.data.datasets import load_eval_set
    from pesr_tpu.metrics import calc_psnr, perceptual_index
    from pesr_tpu.metrics.natural_images import holdout_names
    from pesr_tpu.models.fold import folded_inference
    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    from pesr_tpu.training.checkpoint import restore_generator_params

    opts = Opts(num_blocks=8, num_channels=64, scale=scale)
    samples = load_eval_set(opts, "natural")
    params, _ = restore_generator_params(ckpt)
    apply_fn, variables = folded_inference(params, scale)
    eng = BatchTiledUpscaler(apply_fn, variables, scale, "auto", 8)
    holdouts = set(holdout_names())
    rows = []
    for s in samples:
        sr = eng.upscale_many([s.lr], batch_size=1)[0]
        row = {"name": s.name,
               "holdout": s.name in holdouts,
               "psnr": round(float(calc_psnr(sr, s.hr,
                                             crop_border=scale)), 3)}
        try:
            row["pi"] = round(float(perceptual_index(sr)), 3)
        except ValueError:
            row["pi"] = None   # sub-NIQE-block image
        rows.append(row)
    return rows


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=8000)
    p.add_argument("--ckpt", default=os.path.join(REPO, "demo",
                                                  "checkpoint_x2_hard"))
    p.add_argument("--out", default=os.path.join(
        REPO, "benchmarks", "hard_demo_r4.json"))
    args = p.parse_args()

    from tpu_lease import acquire_tpu
    acquire_tpu()
    from pesr_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from pesr_tpu.config import Opts
    from pesr_tpu.data.datasets import load_eval_set
    from pesr_tpu.training.checkpoint import latest_step_dir
    from pesr_tpu.training.loop import run_training

    if latest_step_dir(args.ckpt):
        print(f"[hard-demo] reusing {args.ckpt}")
    else:
        run_training(Opts(
            phase="pretrain", scale=2, num_blocks=8, num_channels=64,
            batch_size=16, patch_size=48, steps_per_epoch=args.steps,
            num_epochs=1, snapshot_every=1, eval_every=1, log_every=500,
            train_dataset="synthetic_hard",
            valid_dataset="synthetic_hard", check_point=args.ckpt))
        from perceptual_demo import _slim_to_generator
        _slim_to_generator(args.ckpt)

    eval_opts = Opts(num_blocks=8, num_channels=64, scale=2)
    samples = load_eval_set(eval_opts, "synthetic_hard", 5)
    bicubic = bicubic_baseline(samples, 2)
    learned = model_psnr(args.ckpt, 2, samples)
    print(f"[hard-demo] x2 on synthetic_hard: learned {learned:.2f} vs "
          f"bicubic {bicubic:.2f} dB (margin {learned - bicubic:+.2f})",
          flush=True)

    natural = natural_holdout_rows(os.path.join(REPO, "demo",
                                                "checkpoint"), 4)
    for r in natural:
        if r["holdout"]:
            print(f"[hard-demo] natural HOLDOUT row: {r}", flush=True)

    summary = {
        "x2_hard": {"ckpt": os.path.relpath(args.ckpt, REPO),
                    "steps": args.steps,
                    "psnr_learned": round(learned, 3),
                    "psnr_bicubic": round(bicubic, 3),
                    "margin_db": round(learned - bicubic, 3)},
        "natural_x4_rows": natural,
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
        f.write("\n")
    print(json.dumps(summary))
    ok = learned - bicubic >= 0.5
    print(f"[hard-demo] learned x2 beats bicubic by "
          f"{learned - bicubic:.2f} dB — "
          f"{'MET (>=0.5)' if ok else 'MISSED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
