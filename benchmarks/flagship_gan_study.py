#!/usr/bin/env python
"""Flagship-width (32x256) perceptual GAN study (round-3 verdict #1).

The PESR-defining claim — trade a bounded amount of PSNR for better
perceived quality (BASELINE.json:9 config 3; SURVEY.md §0.2) — had only
been demonstrated at toy 8x64 width (demo/checkpoint_gan).  This script
proves (or refutes) the recipe at the CONTRACT width:

1. L1-pretrain the 32x256 x4 generator on the synthetic corpus
   (reuses benchmarks/flagship_quant_study.py's 3000-step pretrain and
   its cached ``bench_artifacts/flagship_x4`` checkpoint).
2. GAN fine-tune with the shipped synthetic-corpus recipe (RSGAN +
   VGG22 trunk, ``--alpha_l1 20 --alpha_vgg 100 --alpha_gan 0.1``) and
   ``--ema_decay`` so the serving weights are the averaged ones.
3. Measure PSNR + PIRM-PI before/after (both packaged metric-model
   sets), the network-interpolation curve at flagship width, and the
   int8-vs-bf16 PSNR delta on the GAN-TUNED weights — adversarially
   trained weights are the realistic quantization stress for the
   0.05 dB budget (BASELINE.json:5; round-3 verdict weak #1).

    python benchmarks/flagship_gan_study.py [--steps 2000]
        [--out benchmarks/flagship_gan_study_r4.json]

Checkpoints land under gitignored ``bench_artifacts/``; the committed
artifact is the JSON + the table in demo/README.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ARTIFACTS = os.path.join(REPO, "bench_artifacts")


def _metric_models():
    """(natural-default, synthetic-fitted) NIQE/Ma model pairs."""
    from pesr_tpu.metrics.ma_features import load_ma_model
    from pesr_tpu.metrics.niqe import NiqeModel

    mdir = os.path.join(REPO, "pesr_tpu", "metrics")
    nm_syn = NiqeModel.load(os.path.join(mdir, "niqe_model.npz"))
    mm_syn = load_ma_model(os.path.join(mdir, "ma_model_synthetic.npz"))
    return nm_syn, mm_syn


def evaluate(params, scale: int, samples, nm_syn, mm_syn,
             engine_box: dict) -> dict:
    """PSNR + PI (both metric-model sets) through the folded bf16
    engine; the engine compiles once and hot-swaps weights per call."""
    import numpy as np

    from pesr_tpu.metrics import calc_psnr, perceptual_index
    from pesr_tpu.models.fold import folded_inference
    from pesr_tpu.ops.tiling import BatchTiledUpscaler

    apply_fn, variables = folded_inference(params, scale)
    if engine_box.get("eng") is None:
        engine_box["eng"] = BatchTiledUpscaler(apply_fn, variables,
                                               scale, "auto", 8)
    else:
        engine_box["eng"].update_variables(variables)
    eng = engine_box["eng"]
    srs = eng.upscale_many([s.lr for s in samples], batch_size=8)
    psnr = float(np.mean([calc_psnr(sr, s.hr, crop_border=scale)
                          for sr, s in zip(srs, samples)]))
    pi_nat = float(np.mean([perceptual_index(sr) for sr in srs]))
    pi_syn = float(np.mean(
        [perceptual_index(sr, niqe_model=nm_syn, ma_predictor=mm_syn)
         for sr in srs]))
    return {"psnr": round(psnr, 3), "pi_natural_models": round(pi_nat, 3),
            "pi_synthetic_models": round(pi_syn, 3)}


def quant_delta(params, scale: int, samples) -> dict:
    """bf16-vs-int8 Y-PSNR delta through the production engines —
    flagship_quant_study.measure()'s protocol, on given params."""
    import jax.numpy as jnp
    import numpy as np

    from pesr_tpu.metrics import calc_psnr
    from pesr_tpu.models.fold import folded_inference
    from pesr_tpu.models.quant_apply import (default_calib_tiles,
                                             int8_inference)
    from pesr_tpu.ops.tiling import BatchTiledUpscaler

    lrs = [s.lr for s in samples]
    out = {}
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
             for sr, s in zip(srs, samples)])), 4)
        del eng
    out["delta_db"] = round(out["psnr_bf16"] - out["psnr_int8"], 4)
    return out


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=2000,
                   help="GAN fine-tune steps (L1 pretrain is 3000)")
    p.add_argument("--pretrain_steps", type=int, default=3000)
    p.add_argument("--ema_decay", type=float, default=0.999)
    p.add_argument("--alpha_vgg", type=float, default=100.0)
    p.add_argument("--alpha_gan", type=float, default=0.1)
    p.add_argument("--alpha_l1", type=float, default=20.0)
    p.add_argument("--gan_type", default="RSGAN")
    p.add_argument("--alphas", default="0,0.25,0.5,0.75,1")
    p.add_argument("--tag", default="",
                   help="suffix for the checkpoint dir + default output "
                        "(second operating points, e.g. 'strong')")
    p.add_argument("--out", default="")
    args = p.parse_args()
    suffix = f"_{args.tag}" if args.tag else ""
    if not args.out:
        args.out = os.path.join(
            REPO, "benchmarks", f"flagship_gan_study_r4{suffix}.json")

    from tpu_lease import acquire_tpu
    acquire_tpu()
    from pesr_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from flagship_quant_study import train_flagship

    # 1. L1 pretrain (cached across runs in bench_artifacts/).
    l1_ckpt = train_flagship(4, args.pretrain_steps)

    # 2. GAN fine-tune with EMA serving weights.
    from pesr_tpu.config import Opts
    from pesr_tpu.training.checkpoint import (interpolate_params,
                                              latest_step_dir,
                                              restore_generator_params)
    from pesr_tpu.training.loop import run_training

    gan_ckpt = os.path.join(ARTIFACTS, f"flagship_x4_gan{suffix}")
    if latest_step_dir(gan_ckpt):
        print(f"[gan-study] reusing {gan_ckpt}")
    else:
        opts = Opts(
            phase="train", scale=4, num_blocks=32, num_channels=256,
            batch_size=16, patch_size=48, steps_per_epoch=args.steps,
            num_epochs=1, snapshot_every=1, eval_every=1, log_every=100,
            train_dataset="synthetic", valid_dataset="synthetic",
            check_point=gan_ckpt, pretrained_model=l1_ckpt,
            vgg_weights=os.path.join(REPO, "demo", "vgg_synthetic"),
            vgg_layer="22", gan_type=args.gan_type,
            alpha_vgg=args.alpha_vgg, alpha_gan=args.alpha_gan,
            alpha_l1=args.alpha_l1, ema_decay=args.ema_decay)
        run_training(opts)

    # 3. Before/after + interp curve + int8 delta on GAN weights.
    from pesr_tpu.data.datasets import load_eval_set
    eval_opts = Opts(num_blocks=32, num_channels=256, scale=4)
    samples = load_eval_set(eval_opts, "synthetic", 5)
    nm_syn, mm_syn = _metric_models()
    box = {}

    base_params, _ = restore_generator_params(l1_ckpt)
    gan_params, _ = restore_generator_params(gan_ckpt)  # EMA preferred

    before = evaluate(base_params, 4, samples, nm_syn, mm_syn, box)
    print(f"[gan-study] L1 baseline: {before}", flush=True)
    after = evaluate(gan_params, 4, samples, nm_syn, mm_syn, box)
    print(f"[gan-study] GAN (EMA):   {after}", flush=True)

    sweep = []
    for a in [float(x) for x in args.alphas.split(",")]:
        params = interpolate_params(base_params, gan_params, a)
        row = {"alpha": a,
               **evaluate(params, 4, samples, nm_syn, mm_syn, box)}
        print(f"[gan-study] interp {row}", flush=True)
        sweep.append(row)

    quant = quant_delta(gan_params, 4, samples)
    print(f"[gan-study] int8 on GAN-tuned weights: {quant}", flush=True)

    summary = {
        "width": "32x256", "scale": 4,
        "recipe": {"pretrain_steps": args.pretrain_steps,
                   "gan_steps": args.steps, "gan_type": args.gan_type,
                   "alpha_l1": args.alpha_l1, "alpha_vgg": args.alpha_vgg,
                   "alpha_gan": args.alpha_gan,
                   "ema_decay": args.ema_decay, "vgg_layer": "22"},
        "before": before, "after": after,
        "pi_delta_synthetic": round(after["pi_synthetic_models"]
                                    - before["pi_synthetic_models"], 3),
        "pi_delta_natural": round(after["pi_natural_models"]
                                  - before["pi_natural_models"], 3),
        "psnr_cost_db": round(before["psnr"] - after["psnr"], 3),
        "interp_sweep": sweep,
        "int8_on_gan_weights": quant,
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
        f.write("\n")
    print(json.dumps(summary))

    pi_win = summary["pi_delta_synthetic"] < 0
    psnr_ok = summary["psnr_cost_db"] <= 1.0
    quant_ok = quant["delta_db"] <= 0.05
    print(f"[gan-study] PI {'improved' if pi_win else 'DID NOT improve'} "
          f"by {-summary['pi_delta_synthetic']:.3f} (synthetic-fitted) "
          f"at {summary['psnr_cost_db']:.2f} dB PSNR cost "
          f"({'<=' if psnr_ok else '>'} 1 dB); int8 delta on GAN "
          f"weights {quant['delta_db']:+.4f} dB "
          f"({'inside' if quant_ok else 'OUTSIDE'} the 0.05 budget)")
    return 0 if (pi_win and psnr_ok) else 1


if __name__ == "__main__":
    sys.exit(main())
