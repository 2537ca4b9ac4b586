#!/usr/bin/env python
"""Production data-path ingest benchmark at DIV2K volume (round-4
verdict #1).

Every training benchmark before round 5 fed the in-memory procedural
corpus; the on-disk path (PairedImageFolder -> PatchIterator / native
C++ sampler -> Prefetcher -> shard_batch -> fused device prep) had
never run at real-data volume.  This harness runs run_training() — the
REAL production loop, not a mirror — over the DIV2K-shaped disk corpus
(benchmarks/make_div2k_corpus.py) and over the in-memory corpus in the
same window, and reports the steady-state steps/s ratio.  Contract
(round-4 verdict #1): disk within ~3% of in-memory.

Modes:
  memory      --train_dataset synthetic (in-memory reference rate)
  disk_lr     --train_dataset DIV2K with the pre-generated X<scale> LR
              dir: the DIV2K bicubic track.  Python PatchIterator
              behind the Prefetcher; decoded images RAM-cache lazily,
              so epoch 1 pays the decode (reported as the warm rate)
              and epoch 2+ is steady state.
  disk_hrcrop --train_dataset DIV2K/DIV2K_train_HR (plain HR folder):
              LR synthesized on device; the native C++ sampler decodes
              the whole corpus up front (startup, reported) and serves
              crop batches from RAM.

Each mode runs num_epochs=2 x IB_STEPS steps; the JSONL throughput
windows give warm (epoch 1, minus the compile window) and steady
(epoch 2) rates.  Also reports the native decoder's standalone PNG
decode rate over the corpus.

Prints ONE JSON line:
  {"metric": "ingest_steady_ratio", "value": <disk_lr steady /
   memory steady>, "unit": "ratio", "paths": {...}}

Env: IB_CORPUS (default /tmp/div2k_synth), IB_STEPS (steps/epoch,
default 400), IB_PHASES (default "pretrain,gan"), IB_MODES (default
"memory,disk_lr,disk_hrcrop"), IB_BLOCKS/IB_CHANNELS (default
flagship 32x256).
"""

import dataclasses
import json
import os
import shutil
import sys
import tempfile
import time


def _steady_rate(jsonl_path: str, steps_per_epoch: int) -> dict:
    """Split the run's throughput windows into warm (epoch 1, skipping
    the compile-polluted first window) and steady (epoch 2)."""
    warm, steady = [], []
    with open(jsonl_path) as f:
        for line in f:
            rec = json.loads(line)
            if "steps_per_s" not in rec:
                continue
            (warm if rec["step"] <= steps_per_epoch else steady).append(
                rec["steps_per_s"])
    return {
        # warm[0] includes jit compile; drop it when there is more data.
        "warm_steps_per_s": round(
            sum(warm[1:]) / len(warm[1:]), 3) if len(warm) > 1
        else (round(warm[0], 3) if warm else None),
        "steady_steps_per_s": round(
            sum(steady) / len(steady), 3) if steady else None,
        "windows_warm": len(warm), "windows_steady": len(steady),
    }


def _run_mode(base_opts, train_dataset: str, steps: int,
              phase: str) -> dict:
    from pesr_tpu.training.loop import run_training

    ckpt_dir = tempfile.mkdtemp(prefix=f"ingest_{phase}_")
    opts = dataclasses.replace(
        base_opts, phase=phase, train_dataset=train_dataset,
        check_point=ckpt_dir, steps_per_epoch=steps, num_epochs=2,
        log_every=25, eval_every=0, snapshot_every=0, eval_pi=False)
    t0 = time.time()
    run_training(opts)
    wall = time.time() - t0
    out = _steady_rate(os.path.join(ckpt_dir, f"{phase}.jsonl"), steps)
    out["wall_s"] = round(wall, 1)
    shutil.rmtree(ckpt_dir, ignore_errors=True)
    return out


def _decode_throughput(corpus: str, n: int = 32) -> dict:
    """Standalone native-decoder rate over the corpus HR PNGs."""
    import numpy as np

    from pesr_tpu.data import native

    hr_dir = os.path.join(corpus, "DIV2K", "DIV2K_train_HR")
    files = sorted(os.listdir(hr_dir))[:n]
    if not native.available():
        return {"native_available": False}
    # Touch the page cache first so the number is decode, not disk.
    for f in files:
        with open(os.path.join(hr_dir, f), "rb") as fh:
            fh.read()
    t0 = time.time()
    mpx = 0.0
    for f in files:
        img = native.decode_png(os.path.join(hr_dir, f))
        mpx += img.shape[0] * img.shape[1] / 1e6
    dt = time.time() - t0
    return {"native_available": True, "images": len(files),
            "decode_mpx_per_s": round(mpx / dt, 1),
            "decode_images_per_s": round(len(files) / dt, 2),
            "wall_s": round(dt, 2)}


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))
    sys.path.insert(0, here)
    from tpu_lease import acquire_tpu
    acquire_tpu()

    from pesr_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from pesr_tpu.config import Opts

    corpus = os.environ.get("IB_CORPUS", "/tmp/div2k_synth")
    steps = int(os.environ.get("IB_STEPS", "400"))
    phases = [p.strip() for p in os.environ.get(
        "IB_PHASES", "pretrain,gan").split(",") if p.strip()]
    modes = [m.strip() for m in os.environ.get(
        "IB_MODES", "memory,disk_lr,disk_hrcrop").split(",") if m.strip()]
    if not os.path.isdir(os.path.join(corpus, "DIV2K", "DIV2K_train_HR")):
        raise SystemExit(f"corpus not found under {corpus} — run "
                         "benchmarks/make_div2k_corpus.py first")

    base = Opts(
        num_blocks=int(os.environ.get("IB_BLOCKS", "32")),
        num_channels=int(os.environ.get("IB_CHANNELS", "256")),
        batch_size=16, patch_size=48, scale=4,
        data_root=corpus, fold_train=True,
        compute_dtype="bfloat16",
        alpha_vgg=50.0, alpha_tv=1e-6, alpha_l1=1.0)

    dataset_for = {"memory": "synthetic", "disk_lr": "DIV2K",
                   "disk_hrcrop": "DIV2K/DIV2K_train_HR",
                   # round 5: batches rendered INSIDE XLA — zero
                   # host->device batch traffic (data/device_synth.py);
                   # IB_MODES=memory,device isolates the link share.
                   "device": "synthetic_device"}
    phase_map = {"pretrain": "pretrain", "gan": "train"}

    paths = {"decode": _decode_throughput(corpus)}
    print(f"[ingest] native decode: {paths['decode']}", file=sys.stderr)
    for ph in phases:
        for mode in modes:
            key = f"{ph}_{mode}"
            paths[key] = _run_mode(base, dataset_for[mode], steps,
                                   phase_map[ph])
            print(f"[ingest] {key}: {paths[key]}", file=sys.stderr)

    ratios = {}
    for ph in phases:
        mem = paths.get(f"{ph}_memory", {}).get("steady_steps_per_s")
        for mode in ("disk_lr", "disk_hrcrop", "device"):
            d = paths.get(f"{ph}_{mode}", {}).get("steady_steps_per_s")
            if mem and d:
                ratios[f"{ph}_{mode}"] = round(d / mem, 4)
    head = ratios.get("pretrain_disk_lr") or (
        next(iter(ratios.values())) if ratios else None)

    import jax
    dev = jax.devices()[0]
    print(json.dumps({
        "metric": "ingest_steady_ratio",
        "value": head, "unit": "disk/memory steady steps/s",
        "device": str(dev), "platform": dev.platform,
        "config": {"blocks": base.num_blocks,
                   "channels": base.num_channels,
                   "batch": base.batch_size, "patch": base.patch_size,
                   "scale": base.scale, "steps_per_epoch": steps,
                   "corpus": corpus},
        "ratios": ratios,
        "paths": paths,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
