#!/usr/bin/env python
"""Scripted runs of the five driver-defined benchmark configs
(BASELINE.md "Benchmark configs to stand up"; BASELINE.json:6-11).

    python benchmarks/run.py --config N [--full]

Configs (datasets fall back to the procedural corpus when DIV2K/Set5 are
not on disk — pass --data_root when they are):

  1  x4 SR inference, one image, single whole-ish forward (CPU-friendly)
  2  generator-only L1 pretraining, 48x48 LR patches, batch 16, x4
  3  full GAN fine-tune: RaGAN + VGG + TV
  4  tiled batched inference throughput (delegates to bench.py)
  5  data-parallel multi-chip GAN sweep over x2/x4/x8 with
     self-validation (virtual CPU mesh when only one chip is present)

``--full`` uses flagship model sizes; default is a small smoke profile
so every config runs in minutes on one chip.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

# abspath: a relative invocation ("python benchmarks/run.py") would
# otherwise resolve REPO to "benchmarks" and break imports + config4.
import os as _os
REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _opts(full: bool, **overrides):
    from pesr_tpu.config import Opts
    base = dict(train_dataset="synthetic", valid_dataset="synthetic",
                test_dataset="synthetic", num_valids=2, log_every=5)
    if not full:
        base.update(num_blocks=2, num_channels=16, batch_size=8,
                    patch_size=16, steps_per_epoch=4, num_epochs=1)
    else:
        base.update(steps_per_epoch=200, num_epochs=1)
    base.update(overrides)
    return Opts(**base)


def config1(full: bool) -> dict:
    """Single-image x4 forward (BASELINE.json:7)."""
    import numpy as np
    from pesr_tpu.data.datasets import load_eval_set
    from pesr_tpu.metrics import calc_psnr
    from pesr_tpu.ops.tiling import TiledUpscaler
    from pesr_tpu.training.loop import build_generator
    import jax, jax.numpy as jnp

    opts = _opts(full)
    gen = build_generator(opts)
    params = gen.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))["params"]
    sample = load_eval_set(opts, max_images=1)[0]
    tiler = TiledUpscaler(gen.apply, {"params": params}, opts.scale,
                          opts.tile_size, opts.tile_overlap, 1)
    # Warm up first: without it the timed number is XLA compile time,
    # not the single-forward latency the config defines.
    tiler.warmup()
    t0 = time.time()
    sr = tiler.upscale(sample.lr)
    dt = time.time() - t0
    return {"config": 1, "psnr": calc_psnr(sr, sample.hr, opts.scale),
            "seconds": dt, "shape": list(sr.shape)}


def config2(full: bool) -> dict:
    """L1 pretraining (BASELINE.json:8)."""
    from pesr_tpu.training.loop import run_training
    opts = _opts(full, phase="pretrain",
                 check_point="/tmp/pesr_bench_c2")
    return {"config": 2, **run_training(opts)}


def config3(full: bool) -> dict:
    """GAN fine-tune (BASELINE.json:9)."""
    from pesr_tpu.training.loop import run_training
    # RaSGAN = the relativistic-AVERAGE GAN the config names
    # (BASELINE.json:9 "RaGAN"); RSGAN is the no-average variant.
    opts = _opts(full, phase="train", check_point="/tmp/pesr_bench_c3",
                 gan_type="RaSGAN", alpha_vgg=50.0, alpha_gan=1.0,
                 alpha_tv=1e-6)
    return {"config": 3, **run_training(opts)}


def config4(full: bool) -> dict:
    """Tiled throughput — the bench.py contract (BASELINE.json:10)."""
    env = {}
    if not full:
        env = {"BENCH_BLOCKS": "4", "BENCH_CHANNELS": "32",
               "BENCH_IMAGES": "2", "BENCH_REPEATS": "1"}
    import os
    out = subprocess.run([sys.executable, f"{REPO}/bench.py"],
                         capture_output=True, text=True,
                         env={**os.environ, **env})
    if out.returncode != 0 or not out.stdout.strip():
        # Surface bench.py's real failure instead of an IndexError /
        # JSONDecodeError over an empty stdout (round-2 review).
        raise RuntimeError(
            f"bench.py exited {out.returncode}; stderr tail:\n"
            + "\n".join(out.stderr.strip().splitlines()[-10:]))
    line = out.stdout.strip().splitlines()[-1]
    return {"config": 4, **json.loads(line)}


def config5(full: bool) -> dict:
    """Multi-chip DP GAN sweep over scales (BASELINE.json:11).

    Runs on the 8-device virtual CPU mesh by default (this host has one
    chip; the sharded program is identical on real ICI — SURVEY.md §4).
    Set PESR_C5_REAL=1 on a real multi-chip host to use its devices.
    Platform must be decided BEFORE any jax backend init, so this builds
    the mesh config up front rather than probing device_count."""
    import os
    if os.environ.get("PESR_C5_REAL") != "1":
        from pesr_tpu.parallel import force_cpu_devices
        force_cpu_devices(8)
    import jax
    from pesr_tpu.training.loop import run_training
    results = {}
    for scale in (2, 4, 8):
        opts = _opts(full, phase="train", scale=scale,
                     check_point=f"/tmp/pesr_bench_c5_x{scale}",
                     batch_size=8, alpha_vgg=1.0, vgg_layer="22",
                     mesh_shape=str(jax.device_count()))
        r = run_training(opts)
        results[f"x{scale}"] = {k: round(v, 4) for k, v in r.items()}
    return {"config": 5, "devices": jax.device_count(), **results}


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=int, required=True,
                   choices=[1, 2, 3, 4, 5])
    p.add_argument("--full", action="store_true")
    args = p.parse_args()
    result = [config1, config2, config3, config4, config5][
        args.config - 1](args.full)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
