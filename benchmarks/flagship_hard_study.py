#!/usr/bin/env python
"""Flagship-width quality on the HARD corpus (round 4).

The hard-corpus demo (benchmarks/hard_demo.py) proved a real
learned-over-bicubic margin at toy 8x64 width.  This study runs the
same question at the CONTRACT width — 32 blocks x 256 channels — on
the scales where it matters most (x2, where the classic corpus was too
smooth to show anything, and x4, the contract scale):

1. train the flagship per scale on ``synthetic_hard`` (3000 L1 steps,
   the flagship_quant_study budget);
2. measure learned bf16-folded vs MATLAB-bicubic Y-PSNR on held-out
   hard images through the production engine;
3. measure the int8 W8A8 delta on these weights — hard-corpus training
   (glyph edges, gratings, checkerboards) produces different
   weight/activation statistics than the smooth corpus, so this is one
   more realistic quantization stress on the 0.05 dB budget.

    python benchmarks/flagship_hard_study.py [--scales 2,4]
        [--steps 3000] [--out benchmarks/flagship_hard_r4.json]

Checkpoints land under bench_artifacts/ (gitignored); the committed
artifact is the JSON + the demo/README.md table row.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ARTIFACTS = os.path.join(REPO, "bench_artifacts")


def _opts(scale: int, steps: int, ckpt: str, dataset: str):
    from pesr_tpu.config import Opts
    return Opts(
        phase="pretrain", scale=scale, num_blocks=32, num_channels=256,
        batch_size=16, patch_size=48 if scale <= 4 else 24,
        steps_per_epoch=steps, num_epochs=1, snapshot_every=1,
        eval_every=99, log_every=200, train_dataset=dataset,
        valid_dataset=dataset, check_point=ckpt)


def study_scale(scale: int, steps: int,
                dataset: str = "synthetic_hard") -> dict:
    import jax.numpy as jnp
    import numpy as np
    from hard_demo import bicubic_baseline

    from pesr_tpu.data.datasets import load_eval_set
    from pesr_tpu.metrics import calc_psnr
    from pesr_tpu.models.fold import folded_inference
    from pesr_tpu.models.quant_apply import (default_calib_tiles,
                                             int8_inference)
    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    from pesr_tpu.training.checkpoint import (latest_step_dir,
                                              restore_generator_params)
    from pesr_tpu.training.loop import run_training

    suffix = "" if dataset == "synthetic_hard" else "_band"
    ckpt = os.path.join(ARTIFACTS, f"flagship_hard_x{scale}{suffix}")
    if latest_step_dir(ckpt):
        print(f"[hard-study] reusing {ckpt}", flush=True)
    else:
        t0 = time.time()
        run_training(_opts(scale, steps, ckpt, dataset))
        print(f"[hard-study] trained x{scale} on {dataset}: {steps} "
              f"steps in {time.time() - t0:.0f}s", flush=True)

    samples = load_eval_set(_opts(scale, 0, ckpt, dataset), dataset, 5)
    lrs = [s.lr for s in samples]

    # MATLAB-bicubic baseline (shared helper, hard_demo.py)
    bicubic = bicubic_baseline(samples, scale)

    params, step = restore_generator_params(ckpt)
    out = {"scale": scale, "steps": step, "dataset": dataset,
           "psnr_bicubic": round(bicubic, 3)}
    for path in ("bf16", "int8"):
        if path == "bf16":
            apply_fn, variables = folded_inference(params, scale,
                                                   dtype=jnp.bfloat16)
        else:
            apply_fn, variables = int8_inference(
                params, scale, default_calib_tiles(lrs))
        eng = BatchTiledUpscaler(apply_fn, variables, scale, "auto", 8)
        srs = eng.upscale_many(lrs, batch_size=8)
        out[f"psnr_{path}"] = round(float(np.mean(
            [calc_psnr(sr, s.hr, crop_border=scale)
             for sr, s in zip(srs, samples)])), 3)
        del eng
    out["margin_db"] = round(out["psnr_bf16"] - bicubic, 3)
    out["int8_delta_db"] = round(out["psnr_bf16"] - out["psnr_int8"], 3)
    print(f"[hard-study] x{scale}: {out}", flush=True)
    return out


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scales", default="2,4")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--dataset", default="synthetic_hard",
                   help="synthetic_hard or synthetic_hard_x4 (the "
                   "round-4 verdict #4 x4-band variant: energy below "
                   "the x4 LR Nyquist so the contract scale has a "
                   "learnable hard-content margin)")
    p.add_argument("--out", default=os.path.join(
        REPO, "benchmarks", "flagship_hard_r4.json"))
    args = p.parse_args()

    from tpu_lease import acquire_tpu
    acquire_tpu()
    from pesr_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    os.makedirs(ARTIFACTS, exist_ok=True)
    rows = [study_scale(int(s), args.steps, args.dataset)
            for s in args.scales.split(",")]
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
        f.write("\n")
    print(json.dumps(rows))
    ok = (all(r["margin_db"] >= 0.5 for r in rows)
          and all(abs(r["int8_delta_db"]) <= 0.05 for r in rows))
    print(f"[hard-study] margins >=0.5 dB and int8 within 0.05 dB: "
          f"{'MET' if ok else 'MISSED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
