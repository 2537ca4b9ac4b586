#!/usr/bin/env python
"""Flagship-width int8 quality study (round-2 verdict #1).

The throughput contract's headline path is int8 W8A8, but its PSNR
budget (<= 0.05 dB vs bf16, BASELINE.json:5) had only been measured on
8x64 demo checkpoints.  This script trains the FLAGSHIP 32x256
generator per scale on the synthetic corpus to realistic weight
statistics, then measures the int8-vs-bf16 PSNR delta with and without
QAT:

    python benchmarks/flagship_quant_study.py [--scales 4,2,8]
        [--steps 3000] [--qat_steps 300] [--out quant_study.json]

Checkpoints land under ``bench_artifacts/`` (gitignored — ~0.5 GB per
scale with optimizer state); the committed artifact is the delta table
(README "Performance" / BASELINE.md) plus the JSON this prints.

Measurement protocol: all paths run the SAME device-resident tiled
engine the bench measures (BatchTiledUpscaler, auto tile) on the
synthetic eval set; Y-PSNR vs HR with scale-sized border crop, exactly
test.py's convention.  "bf16" is the folded bf16 path (the production
fallback), "int8" is W8A8 calibrated on the eval set's own LR tiles.
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


def _opts(scale: int, steps: int, ckpt: str, phase: str = "pretrain",
          pretrained: str = ""):
    from pesr_tpu.config import Opts
    return Opts(
        phase=phase, scale=scale, num_blocks=32, num_channels=256,
        batch_size=16, patch_size=48 if scale <= 4 else 24,
        steps_per_epoch=steps, num_epochs=1, snapshot_every=1,
        eval_every=99, log_every=100, train_dataset="synthetic",
        valid_dataset="synthetic", check_point=ckpt,
        pretrained_model=pretrained)


def train_flagship(scale: int, steps: int) -> str:
    from pesr_tpu.training.loop import run_training

    ckpt = os.path.join(ARTIFACTS, f"flagship_x{scale}")
    from pesr_tpu.training.checkpoint import latest_step_dir
    if latest_step_dir(ckpt):
        print(f"[study] reusing {ckpt}")
        return ckpt
    t0 = time.time()
    run_training(_opts(scale, steps, ckpt))
    print(f"[study] trained x{scale} flagship: {steps} steps in "
          f"{time.time() - t0:.0f}s")
    return ckpt


def qat_flagship(scale: int, ckpt: str, steps: int) -> str:
    from pesr_tpu.training.checkpoint import latest_step_dir
    from pesr_tpu.training.loop import run_training

    out = ckpt + "_qat"
    if latest_step_dir(out):
        print(f"[study] reusing {out}")
        return out
    run_training(_opts(scale, steps, out, phase="qat",
                       pretrained=ckpt))
    return out


def measure(scale: int, ckpt: str) -> dict:
    """Mean Y-PSNR of the bf16-folded and int8 engines on the synthetic
    eval set, from one checkpoint."""
    import jax.numpy as jnp
    import numpy as np

    from pesr_tpu.data.datasets import load_eval_set
    from pesr_tpu.metrics import calc_psnr
    from pesr_tpu.models.fold import folded_inference
    from pesr_tpu.models.quant_apply import (default_calib_tiles,
                                             int8_inference)
    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    from pesr_tpu.training.checkpoint import restore_generator_params

    params, step = restore_generator_params(ckpt)
    opts = _opts(scale, 0, ckpt)
    samples = load_eval_set(opts, "synthetic", 5)
    lrs = [s.lr for s in samples]

    out = {"ckpt": ckpt, "step": step}
    for path in ("bf16", "int8"):
        if path == "bf16":
            apply_fn, variables = folded_inference(params, scale,
                                                   dtype=jnp.bfloat16)
        else:
            apply_fn, variables = int8_inference(
                params, scale, default_calib_tiles(lrs))
        eng = BatchTiledUpscaler(apply_fn, variables, scale, "auto", 8)
        srs = eng.upscale_many(lrs, batch_size=8)
        psnrs = [calc_psnr(sr, s.hr, crop_border=scale)
                 for sr, s in zip(srs, samples)]
        out[f"psnr_{path}"] = round(float(np.mean(psnrs)), 4)
        del eng
    out["delta_db"] = round(out["psnr_bf16"] - out["psnr_int8"], 4)
    return out


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scales", default="4,2,8")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--qat_steps", type=int, default=300)
    p.add_argument("--out", default=os.path.join(ARTIFACTS,
                                                 "quant_study.json"))
    args = p.parse_args()

    from tpu_lease import acquire_tpu
    acquire_tpu()
    from pesr_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    os.makedirs(ARTIFACTS, exist_ok=True)
    rows = []
    for scale in [int(s) for s in args.scales.split(",")]:
        ckpt = train_flagship(scale, args.steps)
        row = {"scale": scale, "pre_qat": measure(scale, ckpt)}
        print(f"[study] x{scale} pre-QAT: {row['pre_qat']}", flush=True)
        qat = qat_flagship(scale, ckpt, args.qat_steps)
        row["post_qat"] = measure(scale, qat)
        print(f"[study] x{scale} post-QAT: {row['post_qat']}", flush=True)
        rows.append(row)

    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows))
    # Report the budgets separately: bench.py's default headline is
    # calibrated PTQ (no QAT), so the PTQ verdict is what backs the
    # shipped path; the QAT verdict records the available mitigation
    # (round-3 review: min() of the two could claim MET for a path
    # nobody runs by default).
    ptq_ok = all(r["pre_qat"]["delta_db"] <= 0.05 for r in rows)
    qat_ok = all(r["post_qat"]["delta_db"] <= 0.05 for r in rows)
    print(f"[study] 0.05 dB budget — PTQ (bench default path): "
          f"{'MET' if ptq_ok else 'MISSED'}; after QAT: "
          f"{'MET' if qat_ok else 'MISSED'}")
    return 0 if (ptq_ok or qat_ok) else 1


if __name__ == "__main__":
    sys.exit(main())
