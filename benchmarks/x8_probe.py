#!/usr/bin/env python
"""Decompose the x8 int8 pass to attribute the roofline gap (round-3
verdict #6; BASELINE.md roofline table).

x8 measures ~170 MP/s/chip vs the body-only roofline's ~212.  The
round-3 attribution said: the tiled engine adds ZERO overhead at x8, so
the gap lives in the apply math.  This probe times the apply's
components SEPARATELY, at exactly the shapes bench.py dispatches at x8
(batch 8, 255x168 LR + fold-band padding), on the real chip:

  * full     — the production apply_u8 (head+body+tail+upfold+u8+D2S)
  * body     — head + unrolled int8 body scan + tail + skip (no upfold)
  * upfold   — the 9x9 256->192 int8 conv alone (quant_fold path)
  * upfold16 — the same conv in bf16 (quant_fold=False path)
  * d2s      — denormalize_to_uint8 + pixel_shuffle(8) alone
  * mxu      — 64 back-to-back 3x3 int8 256->256 convs with NO requant
               (the conv-emitter ceiling at this spatial shape)

Reports ms per dispatch, the additive residue (full − body − upfold −
d2s = requant/scheduling not overlapped), and effective TOP/s per
component, so "close the gap" vs "emitter ceiling" is decided by data.

    python benchmarks/x8_probe.py [--reps 10] [--out ...json]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _fetch_scalar(out):
    """Force execution by fetching ONE element.  Index on-device FIRST:
    np.asarray(tensor) would pull the whole buffer over this session's
    ~20 MB/s dev tunnel (65 MB for an x8 batch = seconds of pure D2H,
    60x the compute being measured)."""
    import numpy as np
    leaf = out if not isinstance(out, (tuple, list)) else out[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def _time(fn, *args, reps: int = 10) -> float:
    """Best-of-reps wall ms; device-side scalar fetch forces execution
    (the tunnel makes block_until_ready a no-op)."""
    _fetch_scalar(fn(*args))
    best = float("inf")
    for _i in range(reps):
        t0 = time.perf_counter()
        _fetch_scalar(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--scale", type=int, default=8,
                   help="probe any supported scale at bench shapes "
                   "(round-4 verdict #7 runs this at the contract "
                   "scale x4, where the engine splits each image into "
                   "a tile grid — components are timed at the REAL "
                   "flattened tile-batch shape the engine dispatches)")
    p.add_argument("--out", default="")
    args = p.parse_args()
    if not args.out:
        args.out = os.path.join(
            REPO, "benchmarks",
            f"x{args.scale}_probe_r{'4' if args.scale == 8 else '5'}.json")

    if os.environ.get("X8_CPU"):  # script smoke without the chip
        from pesr_tpu.parallel import force_cpu_devices
        force_cpu_devices(1)
    else:
        from tpu_lease import acquire_tpu
        acquire_tpu()
    from pesr_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pesr_tpu.models import Generator
    from pesr_tpu.models.quant_apply import (_conv_bf16, _conv_int8,
                                             _qconv, default_calib_tiles,
                                             int8_inference)
    from pesr_tpu.ops.tiling import BatchTiledUpscaler

    # X8_BLOCKS/X8_CHANNELS/X8_BATCH: tiny-model CPU smoke of the probe
    # itself (the committed numbers use the flagship defaults on-chip).
    scale = args.scale
    blocks = int(os.environ.get("X8_BLOCKS", "32"))
    channels = int(os.environ.get("X8_CHANNELS", "256"))
    b = int(os.environ.get("X8_BATCH", "8"))
    gen = Generator(scale=scale, num_blocks=blocks,
                    num_channels=channels)
    variables = jax.jit(gen.init)(jax.random.key(0),
                                  jnp.zeros((1, 16, 16, 3)))
    rng = np.random.default_rng(0)
    lr_h, lr_w = 2040 // scale, 1344 // scale
    imgs = rng.integers(0, 256, (b, lr_h, lr_w, 3), dtype=np.uint8)
    calib = default_calib_tiles([rng.integers(0, 256, (510, 336, 3),
                                              dtype=np.uint8)])

    apply_fn, qvars = int8_inference(variables["params"], scale, calib)
    eng = BatchTiledUpscaler(apply_fn, qvars, scale, "auto", 8)
    dev = jax.devices()[0]
    print(f"[x8_probe] device={dev}", file=sys.stderr, flush=True)
    res = {"device": f"{dev.platform}:{dev}",
           "model": f"{blocks}x{channels}",
           "shapes": {}, "components_ms": {}, "derived": {}}

    # --- engine baseline at bench shapes -----------------------------
    imgs_dev = jnp.asarray(imgs)
    _ = np.asarray(imgs_dev[0, 0, 0, 0])
    ms_engine = _time(eng.upscale_batch_device, imgs_dev,
                      reps=args.reps)
    out_mp = b * lr_h * lr_w * scale * scale / 1e6
    res["components_ms"]["engine"] = round(ms_engine, 3)
    res["derived"]["engine_mps"] = round(out_mp / (ms_engine / 1e3), 1)

    # --- the padded tile-batch shape the engine dispatches ----------
    # At x8 the auto chooser covers the image with ONE tile; at x4 it
    # splits a grid and flattens [n_tiles*b, ...] into one dispatch —
    # the components must be timed at THAT batch or the attribution
    # compares different MXU utilization points.
    import math
    th, tw = eng._tile_hw(lr_h, lr_w, b=b)
    th, tw = min(th, lr_h), min(tw, lr_w)
    nh, nw = math.ceil(lr_h / th), math.ceil(lr_w / tw)
    ov_h, ov_w = eng._ov_for(nh), eng._ov_for(nw)
    ph, pw = th + 2 * ov_h, tw + 2 * ov_w
    cb = b * nh * nw  # flattened tile batch
    res["shapes"] = {"lr": [lr_h, lr_w], "tile": [th, tw],
                     "grid": [nh, nw], "halo": [ov_h, ov_w],
                     "padded": [ph, pw], "batch": b, "tile_batch": cb}
    x = jnp.asarray(
        rng.normal(0, 0.5, (cb, ph, pw, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    _ = np.asarray(x[0, 0, 0, 0])

    q = qvars["params"]
    res_scale = 0.1

    def body_only(qp, xin):
        head = _conv_bf16(xin, qp["head"])
        blk = qp["body"]["block"]

        def body_fn(carry, per_block):
            c1, c2 = per_block
            xq1 = jnp.clip(
                jnp.round(carry.astype(jnp.float32) * c1["qin"]),
                -127, 127).astype(jnp.int8)
            acc1 = _conv_int8(xq1, c1["w_q"])
            t = (acc1.astype(jnp.float32) * (c1["m"] * c2["qin"])
                 + c1["bias"] * c2["qin"])
            xq2 = jnp.clip(jnp.round(jnp.maximum(t, 0.0)),
                           -127, 127).astype(jnp.int8)
            acc2 = _conv_int8(xq2, c2["w_q"])
            y = (acc2.astype(jnp.float32) * c2["m"]
                 + c2["bias"]).astype(jnp.bfloat16)
            return (carry + jnp.asarray(res_scale, jnp.bfloat16) * y,
                    None)

        y, _ = jax.lax.scan(body_fn, head,
                            (blk["conv1"], blk["conv2"]), unroll=True)
        return _qconv(y, qp["tail"]) + head

    jbody = jax.jit(body_only)
    ms_body = _time(jbody, q, x, reps=args.reps)
    res["components_ms"]["body"] = round(ms_body, 3)

    trunk_out = jbody(q, x)  # [b, ph, pw, 256] bf16

    up = q["upfold"]
    # int8_inference popped _pads into the apply closure; re-derive.
    from pesr_tpu.models.fold import fold_generator_params
    folded = fold_generator_params(
        jax.tree_util.tree_map(np.asarray, variables["params"]), scale)
    pads = folded.pop("_pads")

    if "w_q" in up:
        jup = jax.jit(functools.partial(_qconv, qp=up,
                                        padding=(pads, pads)))
        ms_up = _time(lambda t: jup(t), trunk_out, reps=args.reps)
        res["components_ms"]["upfold_int8"] = round(ms_up, 3)
    else:
        ms_up = None

    jup16 = jax.jit(lambda t: _conv_bf16(t, folded["upfold"],
                                         padding=(pads, pads)))
    ms_up16 = _time(jup16, trunk_out, reps=args.reps)
    res["components_ms"]["upfold_bf16"] = round(ms_up16, 3)

    from pesr_tpu.data.augment import denormalize_to_uint8
    from pesr_tpu.ops.pixel_shuffle import pixel_shuffle
    up_out = (jup(trunk_out) if ms_up is not None
              else jup16(trunk_out))

    jd2s = jax.jit(lambda t: pixel_shuffle(denormalize_to_uint8(t),
                                           scale))
    ms_d2s = _time(jd2s, up_out, reps=args.reps)
    res["components_ms"]["u8_d2s"] = round(ms_d2s, 3)

    # --- full apply (same shapes, no engine) -------------------------
    japply = jax.jit(apply_fn.uint8_variant)
    ms_full = _time(japply, qvars, x, reps=args.reps)
    res["components_ms"]["apply_u8"] = round(ms_full, 3)

    # --- conv-emitter ceiling at this spatial shape ------------------
    c = channels
    n_convs = 2 * blocks
    w8 = jnp.asarray(rng.integers(-127, 128, (3, 3, c, c)), jnp.int8)
    xq0 = jnp.asarray(rng.integers(-127, 128, (cb, ph, pw, c)),
                      jnp.int8)
    _ = np.asarray(xq0[0, 0, 0, 0])

    def mxu_chain(xq, w):
        def step(carry, _):
            acc = _conv_int8(carry, w)
            # cheapest legal int32->int8 (shift); keeps the chain
            # sequential without a requant VPU chain
            return (acc >> 8).astype(jnp.int8), None
        y, _ = jax.lax.scan(step, xq, None, length=n_convs,
                            unroll=True)
        return y

    jmxu = jax.jit(mxu_chain)
    ms_mxu = _time(jmxu, xq0, w8, reps=max(3, args.reps // 2))
    res["components_ms"][f"mxu_{n_convs}convs"] = round(ms_mxu, 3)

    # --- derived attribution -----------------------------------------
    px = cb * ph * pw
    conv_flop = n_convs * 2 * 9 * c * c * px
    res["derived"]["mxu_tops_at_shape"] = round(
        conv_flop / (ms_mxu / 1e3) / 1e12, 1)
    body_flop = conv_flop + 2 * 9 * c * c * px  # + tail
    res["derived"]["body_tops_effective"] = round(
        body_flop / (ms_body / 1e3) / 1e12, 1)
    if ms_up is not None:
        kup = int(np.asarray(folded["upfold"]["kernel"]).shape[0])
        up_flop = 2 * kup * kup * c * 3 * scale * scale * px
        res["derived"]["upfold_int8_tops"] = round(
            up_flop / (ms_up / 1e3) / 1e12, 1)
    parts = ms_body + (ms_up if ms_up is not None else ms_up16) + ms_d2s
    res["derived"]["sum_parts_ms"] = round(parts, 3)
    res["derived"]["apply_minus_parts_ms"] = round(ms_full - parts, 3)
    res["derived"]["engine_minus_apply_ms"] = round(
        ms_engine - ms_full, 3)
    res["derived"]["apply_mps"] = round(out_mp / (ms_full / 1e3), 1)

    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")
    print(json.dumps(res, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
