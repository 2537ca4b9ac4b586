#!/usr/bin/env python
"""Perceptual-trade demo without ImageNet VGG (round-2 verdict #5).

Runs PESR's config-3 recipe end-to-end on this machine's own artifacts:
the synthetic-corpus-trained VGG trunk (benchmarks/pretrain_vgg.py) as
the perceptual anchor, a GAN fine-tune from the demo checkpoint, and a
before/after PSNR + PIRM-PI comparison (forest-backed Ma + exact NIQE
under both the natural-image-fitted defaults and the synthetic-fitted
in-domain models — provenance-tagged, relative comparisons only):

    python benchmarks/perceptual_demo.py [--steps 1000]
        [--alpha_vgg 100] [--alpha_gan 0.1] [--alpha_l1 20]

Success criterion (BASELINE.json:9 analog): PI improves (drops) vs the
L1 checkpoint while PSNR gives up a bounded amount — the perceptual
trade the reference exists to make, demonstrated with zero external
weights.  Writes demo/checkpoint_gan and prints a JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def evaluate(ckpt: str, tag: str) -> dict:
    """PSNR + PI of a generator checkpoint on the synthetic eval set."""
    import numpy as np

    from pesr_tpu.config import Opts
    from pesr_tpu.data.datasets import load_eval_set
    from pesr_tpu.metrics import calc_psnr, perceptual_index
    from pesr_tpu.models.fold import folded_inference
    from pesr_tpu.ops.tiling import BatchTiledUpscaler
    from pesr_tpu.training.checkpoint import restore_generator_params

    opts = Opts(num_blocks=8, num_channels=64, scale=4)
    params, step = restore_generator_params(ckpt)
    apply_fn, variables = folded_inference(params, opts.scale)
    eng = BatchTiledUpscaler(apply_fn, variables, opts.scale, "auto", 8)
    samples = load_eval_set(opts, "synthetic", 5)
    srs = eng.upscale_many([s.lr for s in samples], batch_size=8)
    psnr = float(np.mean([calc_psnr(sr, s.hr, crop_border=opts.scale)
                          for sr, s in zip(srs, samples)]))
    # Default models (natural-image-fitted when packaged) AND the
    # synthetic-fitted pair — the latter is the in-domain measure for
    # this synthetic-corpus demo (demo/README.md table).
    pi = float(np.mean([perceptual_index(sr) for sr in srs]))
    out = {"ckpt": ckpt, "step": step, "psnr": round(psnr, 3),
           "pi": round(pi, 3)}
    metrics_dir = os.path.join(REPO, "pesr_tpu", "metrics")
    synth_niqe = os.path.join(metrics_dir, "niqe_model.npz")
    synth_ma = os.path.join(metrics_dir, "ma_model_synthetic.npz")
    if os.path.exists(synth_niqe) and os.path.exists(synth_ma):
        from pesr_tpu.metrics.ma_features import load_ma_model
        from pesr_tpu.metrics.niqe import NiqeModel
        nm, mm = NiqeModel.load(synth_niqe), load_ma_model(synth_ma)
        out["pi_synthetic_models"] = round(float(np.mean(
            [perceptual_index(sr, niqe_model=nm, ma_predictor=mm)
             for sr in srs])), 3)
    print(f"[demo] {tag}: {out}", flush=True)
    return out


def _slim_to_generator(ckpt_dir: str) -> None:
    """Rewrite the experiment dir as a generator-params-only step dir.

    The full GAN training checkpoint (G+D+optimizer states, twice with
    the best copy) is ~0.5 GB — committable demo artifacts keep just
    what test.py consumes (~3.5 MB); re-running this script regenerates
    the full state if a GAN resume is wanted."""
    import shutil

    import orbax.checkpoint as ocp

    from pesr_tpu.training.checkpoint import (latest_step_dir,
                                              restore_payload)

    step_dir = latest_step_dir(ckpt_dir)
    payload = restore_payload(step_dir)
    slim = {"step": payload["step"],
            "g": {"params": payload["g"]["params"]}}
    name = os.path.basename(step_dir)
    for entry in os.listdir(ckpt_dir):
        p = os.path.join(ckpt_dir, entry)
        shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(ckpt_dir, name), slim, force=True)


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    # Defaults = the recipe that demonstrated the trade on this corpus
    # (PI 11.47 -> 8.29 at 0.83 dB; demo/README.md).  The reference's
    # ImageNet-VGG54 weighting (alpha_vgg 50, alpha_gan 1, no L1)
    # collapses here — the synthetic VGG22 anchor has different
    # magnitudes and the corpus is smooth, so the adversarial term
    # needs a 10x stronger pixel/perceptual anchor against it.
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--alpha_vgg", type=float, default=100.0)
    p.add_argument("--alpha_gan", type=float, default=0.1)
    p.add_argument("--alpha_l1", type=float, default=20.0)
    p.add_argument("--gan_type", default="RSGAN")
    p.add_argument("--out", default=os.path.join(REPO, "demo",
                                                 "checkpoint_gan"))
    p.add_argument("--vgg", default=os.path.join(REPO, "demo",
                                                 "vgg_synthetic"))
    args = p.parse_args()

    # Train the trunk in a child process BEFORE this process touches
    # jax: the dev-harness TPU is single-tenant, so a parent that has
    # already acquired the lease starves any child trying to (the
    # lease lives for the process lifetime).
    if not os.path.isdir(args.vgg):
        print("[demo] no VGG trunk yet — training one "
              "(benchmarks/pretrain_vgg.py)", flush=True)
        subprocess.run([sys.executable,
                        os.path.join(REPO, "benchmarks",
                                     "pretrain_vgg.py"),
                        "--out", args.vgg], check=True)

    from tpu_lease import acquire_tpu
    acquire_tpu()
    from pesr_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    base_ckpt = os.path.join(REPO, "demo", "checkpoint")
    before = evaluate(base_ckpt, "L1 baseline")

    from pesr_tpu.config import Opts
    from pesr_tpu.training.loop import run_training
    opts = Opts(
        phase="train", scale=4, num_blocks=8, num_channels=64,
        batch_size=16, patch_size=24, steps_per_epoch=args.steps,
        num_epochs=1, snapshot_every=1, eval_every=1, log_every=100,
        train_dataset="synthetic", valid_dataset="synthetic",
        check_point=args.out, pretrained_model=base_ckpt,
        vgg_weights=args.vgg, vgg_layer="22",
        gan_type=args.gan_type, alpha_vgg=args.alpha_vgg,
        alpha_gan=args.alpha_gan, alpha_l1=args.alpha_l1)
    run_training(opts)

    _slim_to_generator(args.out)
    after = evaluate(args.out, "GAN fine-tune")
    summary = {
        "before": before, "after": after,
        "pi_delta": round(after["pi"] - before["pi"], 3),
        "psnr_cost_db": round(before["psnr"] - after["psnr"], 3),
        "recipe": {"steps": args.steps, "alpha_vgg": args.alpha_vgg,
                   "alpha_gan": args.alpha_gan,
                   "alpha_l1": args.alpha_l1,
                   "gan_type": args.gan_type, "vgg_layer": "22"},
    }
    print(json.dumps(summary))
    win = summary["pi_delta"] < 0
    verdict = "improved" if win else "DID NOT improve"
    print(f"[demo] perceptual trade: PI {verdict} by "
          f"{-summary['pi_delta']:.3f} at a cost of "
          f"{summary['psnr_cost_db']:.2f} dB PSNR")
    return 0 if win else 1


if __name__ == "__main__":
    sys.exit(main())
