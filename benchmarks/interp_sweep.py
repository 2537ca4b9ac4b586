#!/usr/bin/env python
"""Network-interpolation sweep (ESRGAN §4.4) over the demo checkpoints.

Blends the L1/QAT demo generator (PSNR model) toward its GAN fine-tune
(demo/checkpoint_gan) in parameter space and measures PSNR + PIRM-PI at
each alpha — the measured perception-distortion curve test.py's
``--interp_model/--interp_alpha`` exposes:

    python benchmarks/interp_sweep.py [--alphas 0,0.25,0.5,0.75,1]

Prints one JSON line with the full sweep (PI under both the packaged
natural-fitted default metric models and the synthetic-fitted in-domain
pair — the same two columns as demo/README.md's before/after table).
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
    p.add_argument("--alphas", default="0,0.25,0.5,0.75,1")
    p.add_argument("--base", default=os.path.join(REPO, "demo",
                                                  "checkpoint"))
    p.add_argument("--gan", default=os.path.join(REPO, "demo",
                                                 "checkpoint_gan"))
    args = p.parse_args()
    alphas = [float(a) for a in args.alphas.split(",")]

    from tpu_lease import acquire_tpu
    acquire_tpu()
    from pesr_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    import numpy as np

    from pesr_tpu.config import Opts
    from pesr_tpu.data.datasets import load_eval_set
    from pesr_tpu.metrics import calc_psnr, perceptual_index
    from pesr_tpu.metrics.ma_features import load_ma_model
    from pesr_tpu.metrics.niqe import NiqeModel
    from pesr_tpu.models.fold import folded_inference
    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    from pesr_tpu.training.checkpoint import (interpolate_params,
                                              restore_generator_params)

    opts = Opts(num_blocks=8, num_channels=64, scale=4)
    base, _ = restore_generator_params(args.base)
    gan, _ = restore_generator_params(args.gan)
    samples = load_eval_set(opts, "synthetic", 5)
    lrs = [s.lr for s in samples]

    metrics_dir = os.path.join(REPO, "pesr_tpu", "metrics")
    nm = NiqeModel.load(os.path.join(metrics_dir, "niqe_model.npz"))
    mm = load_ma_model(os.path.join(metrics_dir,
                                    "ma_model_synthetic.npz"))

    eng = None
    rows = []
    for a in alphas:
        params = interpolate_params(base, gan, a)
        apply_fn, variables = folded_inference(params, opts.scale)
        if eng is None:
            eng = BatchTiledUpscaler(apply_fn, variables, opts.scale,
                                     "auto", 8)
        else:
            # Same folded program every alpha — only weights change.
            eng.update_variables(variables)
        srs = eng.upscale_many(lrs, batch_size=8)
        psnr = float(np.mean([calc_psnr(sr, s.hr, crop_border=opts.scale)
                              for sr, s in zip(srs, samples)]))
        pi_nat = float(np.mean([perceptual_index(sr) for sr in srs]))
        pi_syn = float(np.mean(
            [perceptual_index(sr, niqe_model=nm, ma_predictor=mm)
             for sr in srs]))
        row = {"alpha": a, "psnr": round(psnr, 3),
               "pi_natural_models": round(pi_nat, 3),
               "pi_synthetic_models": round(pi_syn, 3)}
        print(f"[interp] {row}", flush=True)
        rows.append(row)

    # Committed artifacts stay machine-portable: repo-relative paths.
    rel = lambda p: os.path.relpath(os.path.abspath(p), REPO)
    print(json.dumps({"base": rel(args.base), "gan": rel(args.gan),
                      "sweep": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
