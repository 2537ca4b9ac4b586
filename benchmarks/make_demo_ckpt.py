#!/usr/bin/env python
"""Train + slim + evaluate a demo checkpoint for one scale (round 4).

The demo set promises a working out-of-the-box model at EVERY supported
``--scale``; x3/x6 (the DIV2K X3-track factorization, added round 3)
were missing.  This script is the generic maker the per-scale demos
share: train the 8x64 generator on the synthetic corpus, slim the
experiment dir to generator-params-only (~3 MB, the committable form),
and print learned-vs-bicubic Y-PSNR through the production engine.

    python benchmarks/make_demo_ckpt.py --scale 3 --steps 6000
        [--ckpt demo/checkpoint_x3] [--dataset synthetic]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scale", type=int, required=True)
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--ckpt", default="")
    args = p.parse_args()
    ckpt = args.ckpt or os.path.join(REPO, "demo",
                                     f"checkpoint_x{args.scale}")

    from tpu_lease import acquire_tpu
    acquire_tpu()
    from pesr_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from hard_demo import bicubic_baseline, model_psnr

    from pesr_tpu.config import Opts
    from pesr_tpu.data.datasets import load_eval_set
    from pesr_tpu.training.checkpoint import latest_step_dir
    from pesr_tpu.training.loop import run_training

    if latest_step_dir(ckpt):
        print(f"[demo-ckpt] reusing {ckpt}")
    else:
        run_training(Opts(
            phase="pretrain", scale=args.scale, num_blocks=8,
            num_channels=64, batch_size=16, patch_size=48,
            steps_per_epoch=args.steps, num_epochs=1, snapshot_every=1,
            eval_every=1, log_every=500, train_dataset=args.dataset,
            valid_dataset=args.dataset, check_point=ckpt))
        from perceptual_demo import _slim_to_generator
        _slim_to_generator(ckpt)

    samples = load_eval_set(Opts(num_blocks=8, num_channels=64,
                                 scale=args.scale), args.dataset, 5)
    bicubic = bicubic_baseline(samples, args.scale)   # shared helpers
    learned = model_psnr(ckpt, args.scale, samples)   # (hard_demo.py)
    out = {"scale": args.scale, "ckpt": os.path.relpath(ckpt, REPO),
           "steps": args.steps, "dataset": args.dataset,
           "psnr_learned": round(learned, 3),
           "psnr_bicubic": round(bicubic, 3),
           "margin_db": round(learned - bicubic, 3)}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
