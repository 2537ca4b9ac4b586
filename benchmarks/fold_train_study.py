#!/usr/bin/env python
"""--fold_train quality-equivalence study at flagship width (round-3
verdict #3).

``--fold_train`` is the largest measured un-deployed training win
(+21% pretrain / +17% GAN steps/s, BASELINE.md) but stayed opt-in
because the folded upsampler's patch borders see one-shot zero padding
where the canonical chain pads per stage (models/fold.py; FLAGS.md).
Matching the canonical border semantics inside the step would cost a
replicate-pad + crop of ``fold_min_halo`` LR px per side — at the
48-px training patch that is (54/48)^2 = +27% compute, erasing the
win — so the decision must come from EVIDENCE: train the flagship
twice with identical budgets/seeds/data, plain vs --fold_train, and
compare final quality through the production inference engine.

    python benchmarks/fold_train_study.py [--steps 3000]
        [--out benchmarks/fold_train_study_r4.json]

Reuses benchmarks/flagship_quant_study.py's pretrain for the plain arm
(cached under bench_artifacts/).  The verdict that flips (or keeps) the
default lives in docs/FLAGS.md + BASELINE.md next to this JSON.
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


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--out", default=os.path.join(
        REPO, "benchmarks", "fold_train_study_r4.json"))
    args = p.parse_args()

    from tpu_lease import acquire_tpu
    acquire_tpu()
    from pesr_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    import dataclasses

    from flagship_quant_study import _opts, measure, train_flagship
    from pesr_tpu.training.checkpoint import latest_step_dir
    from pesr_tpu.training.loop import run_training

    # Arm 1: plain (shared with the quant study; cached).
    plain_ckpt = train_flagship(4, args.steps)

    # Arm 2: identical opts/seed/data, training THROUGH the folded
    # upsampler.
    fold_ckpt = os.path.join(ARTIFACTS, "flagship_x4_foldtrain")
    fold_steps_per_s = None
    if latest_step_dir(fold_ckpt):
        print(f"[fold-study] reusing {fold_ckpt}")
    else:
        opts = dataclasses.replace(
            _opts(4, args.steps, fold_ckpt), fold_train=True)
        t0 = time.time()
        run_training(opts)
        dt = time.time() - t0
        fold_steps_per_s = round(args.steps / dt, 2)
        print(f"[fold-study] fold_train arm: {args.steps} steps in "
              f"{dt:.0f}s ({fold_steps_per_s} steps/s)")

    # Both arms evaluated identically: the params tree is the same
    # schema, so measure() runs the SAME folded-bf16 + int8 production
    # engines on both (flagship_quant_study protocol).
    plain = measure(4, plain_ckpt)
    fold = measure(4, fold_ckpt)
    print(f"[fold-study] plain:      {plain}", flush=True)
    print(f"[fold-study] fold_train: {fold}", flush=True)

    summary = {
        "steps": args.steps, "width": "32x256", "scale": 4,
        "plain": plain, "fold_train": fold,
        "fold_steps_per_s": fold_steps_per_s,
        "quality_delta_db_bf16": round(
            plain["psnr_bf16"] - fold["psnr_bf16"], 4),
        "quality_delta_db_int8": round(
            plain["psnr_int8"] - fold["psnr_int8"], 4),
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
        f.write("\n")
    print(json.dumps(summary))
    d = summary["quality_delta_db_bf16"]
    print(f"[fold-study] fold_train quality delta (plain - fold): "
          f"{d:+.4f} dB bf16 — "
          f"{'EQUIVALENT (<=0.05)' if abs(d) <= 0.05 else 'NOT equivalent'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
