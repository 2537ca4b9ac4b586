#!/usr/bin/env python
"""Training-step throughput benchmark (BASELINE.md configs 2 and 3).

bench.py covers config 4 (tiled inference, the contract row); this
measures the two TRAINING configs on one chip at the flagship recipe
(defaults: 32 blocks x 256 ch, batch 16, 48x48 LR patches, x4, bf16
compute — Opts defaults == BASELINE.json:8):

  * ``pretrain``: the single-jit L1 step (SURVEY.md §3.1)
  * ``gan``: the single-jit RaGAN D-then-G step incl. VGG perceptual
    (SURVEY.md §3.2; VGG params are randomly initialized here — the
    throughput is identical to trained weights, only values differ)

Timed work per step includes the fused on-device batch prep
(uint8 -> normalize/augment/LR-synthesis, data/augment.py), i.e. the
steady-state per-step device work of training/loop.py with the host
prefetcher hidden.  Steps are queued asynchronously and the clock stops
on a scalar fetch from the LAST step's metrics (block_until_ready is a
no-op through this dev harness's tunnel).

Prints ONE JSON line:
  {"metric": "train_step_throughput", "value": <gan steps/s>,
   "unit": "steps/s", "paths": {"pretrain": {...}, "gan": {...}}}
each path carrying steps_per_s, examples_per_s, hr_mpx_per_s, and the
per-step HR-megapixel count for roofline math.

Env overrides: TB_STEPS (timed steps, default 30), TB_BLOCKS,
TB_CHANNELS, TB_BATCH, TB_PATCH, TB_SCALE, TB_PHASES
(comma list out of {pretrain,gan,qat}; default "pretrain,gan"),
TB_PROFILE (jax.profiler trace dir around the timed steps),
TB_ACCUM / TB_UNROLL=1 / TB_REMAT=1 / TB_FOLD_TRAIN=1 (--grad_accum /
--unroll_body / --remat / --fold_train for memory-vs-speed studies).
"""

import dataclasses
import json
import os
import sys
import time


def _bench_phase(opts, phase: str, steps: int) -> dict:
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pesr_tpu.data import augment
    from pesr_tpu.models import VGG19Features
    from pesr_tpu.training import steps as steps_lib
    from pesr_tpu.training.loop import build_discriminator, build_generator
    from pesr_tpu.training.state import (create_discriminator_state,
                                         create_generator_state,
                                         init_vgg_params)

    opts = dataclasses.replace(opts, phase=phase)
    rng = jax.random.key(0)
    rng, g_key, d_key, v_key = jax.random.split(rng, 4)
    gen = build_generator(opts)
    g_state = create_generator_state(opts, gen, g_key)
    if opts.fold_train and phase != "qat":
        from pesr_tpu.models.fold import make_fold_train_apply
        g_state = g_state.replace(apply_fn=make_fold_train_apply(
            opts.scale, opts.res_scale, jnp.bfloat16,
            remat=opts.remat, unroll=opts.unroll_body))

    gan = phase == "train"
    if gan:
        disc = build_discriminator(opts)
        d_state = create_discriminator_state(opts, disc, d_key)
        vgg = VGG19Features(layer=opts.vgg_layer, dtype=jnp.bfloat16)
        vgg_params = init_vgg_params(opts, vgg, v_key)
        step_fn = steps_lib.make_gan_step(
            opts, d_apply=lambda p, x: disc.apply({"params": p}, x),
            vgg_apply=lambda p, x: vgg.apply({"params": p}, x))
    else:
        if phase == "qat":
            from pesr_tpu.models.qat import make_qat_apply
            g_state = g_state.replace(apply_fn=make_qat_apply(
                opts.scale, opts.res_scale, jnp.bfloat16))
        step_fn = steps_lib.make_pretrain_step(opts)

    prep = jax.jit(functools.partial(augment.prepare_train_batch,
                                     scale=opts.scale))
    # A couple of distinct host batches so the steady state isn't one
    # cached device constant; uploads stay outside the timed region the
    # same way the loop's prefetcher hides them.
    host = np.random.default_rng(1).integers(
        0, 256, (2, opts.batch_size, opts.hr_patch_size,
                 opts.hr_patch_size, 3), dtype=np.uint8)
    hr_dev = [jax.device_put(h) for h in host]

    def one(i, g_state, d_state, key):
        lr_img, hr_img = prep(key, hr_dev[i % 2])
        if gan:
            g_state, d_state, metrics = step_fn(
                g_state, d_state, vgg_params, lr_img, hr_img, key)
        else:
            g_state, metrics = step_fn(g_state, lr_img, hr_img)
        return g_state, d_state, metrics

    # Warmup: compile + one steady step.
    for i in range(2):
        rng, key = jax.random.split(rng)
        g_state, d_state_out, metrics = one(
            i, g_state, d_state if gan else None, key)
        if gan:
            d_state = d_state_out
    float(jnp.ravel(next(iter(metrics.values())))[0])  # sync

    profile_dir = os.environ.get("TB_PROFILE", "")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    t0 = time.time()
    for i in range(steps):
        rng, key = jax.random.split(rng)
        g_state, d_state_out, metrics = one(
            i, g_state, d_state if gan else None, key)
        if gan:
            d_state = d_state_out
    float(jnp.ravel(next(iter(metrics.values())))[0])  # fence
    dt = time.time() - t0
    if profile_dir:
        jax.profiler.stop_trace()
        print(f"[train_bench] trace -> {profile_dir}", file=sys.stderr)

    hr_mpx = opts.batch_size * opts.hr_patch_size ** 2 / 1e6
    return {
        "steps_per_s": round(steps / dt, 4),
        "examples_per_s": round(steps * opts.batch_size / dt, 2),
        "hr_mpx_per_s": round(steps * hr_mpx / dt, 3),
        "hr_mpx_per_step": round(hr_mpx, 4),
        "timed_steps": steps,
        "wall_s": round(dt, 2),
    }


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))  # repo root (pesr_tpu)
    sys.path.insert(0, here)                   # tpu_lease
    from tpu_lease import acquire_tpu
    acquire_tpu()

    from pesr_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from pesr_tpu.config import Opts

    steps = int(os.environ.get("TB_STEPS", "30"))
    opts = Opts(
        num_blocks=int(os.environ.get("TB_BLOCKS", "32")),
        num_channels=int(os.environ.get("TB_CHANNELS", "256")),
        batch_size=int(os.environ.get("TB_BATCH", "16")),
        patch_size=int(os.environ.get("TB_PATCH", "48")),
        scale=int(os.environ.get("TB_SCALE", "4")),
        grad_accum=int(os.environ.get("TB_ACCUM", "1")),
        unroll_body=os.environ.get("TB_UNROLL", "0") == "1",
        remat=os.environ.get("TB_REMAT", "0") == "1",
        fold_train=os.environ.get("TB_FOLD_TRAIN", "0") == "1",
        compute_dtype="bfloat16",
        # Random-init VGG anchors throughput only (see module docstring);
        # production weight guidance lives in training/loop.py.
        alpha_vgg=50.0, alpha_tv=1e-6,
    )
    phase_map = {"pretrain": "pretrain", "gan": "train", "qat": "qat"}
    names = [p.strip() for p in os.environ.get(
        "TB_PHASES", "pretrain,gan").split(",") if p.strip()]
    for n in names:
        if n not in phase_map:
            raise SystemExit(f"TB_PHASES: unknown phase {n!r} "
                             f"(valid: {sorted(phase_map)})")

    paths = {}
    for n in names:
        paths[n] = _bench_phase(opts, phase_map[n], steps)
        print(f"[train_bench] {n}: {paths[n]}", file=sys.stderr)

    head = paths.get("gan") or paths[names[0]]
    print(json.dumps({
        "metric": "train_step_throughput",
        "value": head["steps_per_s"],
        "unit": "steps/s",
        "config": {"blocks": opts.num_blocks, "channels": opts.num_channels,
                   "batch": opts.batch_size, "patch": opts.patch_size,
                   "scale": opts.scale, "compute": "bfloat16"},
        "paths": paths,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
