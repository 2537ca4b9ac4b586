"""Int8 (W8A8) generator inference — the performance path to the
50 MP/s/chip contract (BASELINE.md; round-1 verdict top-next item).

The v5e MXU runs int8 at 2x bf16 peak (394 vs 197 T(FL)OPS); the bf16
generator is compute-bound at ~31 MP/s theoretical (~40 after the
folded upsampler, models/fold.py), so int8 is the only route past the
contract on this hardware.

What it took to actually reach the int8 MXU (measured 2026-08-16 on the
v5e): XLA lowers ``lax.conv(int8, int8) -> int32`` onto the int8 MXU at
~266 TOP/s, BUT any per-conv dynamic range computation (round-1's
``max|x|`` per tensor) serializes a full VPU/HBM reduction against the
conv chain and erases the win (1.09x measured in round 1).  The fix is
STATIC scales from an offline calibration pass — no data-dependent
reductions anywhere in the compiled program (254 TOP/s measured for the
full block structure, 1.56x bf16).

Scheme (per-channel symmetric W8A8, bf16 residual carry):
  * activation scales are per-INPUT-CHANNEL and static: s_in[c] =
    amax_c / 127 from calibration.  Per-channel input scales fold
    EXACTLY into the weights (w'[k,c,o] = w[k,c,o] * s_in[c]), so they
    cost nothing at run time;
  * weights: per-OUTPUT-CHANNEL symmetric int8 on the folded weights,
    s_w[o] = max|w'[..., o]| / 127;
  * conv accumulates int32 on the MXU; dequant is one fused VPU
    multiply: y = acc * s_w[o] + bias;
  * the residual carry stays bfloat16 — quantization error enters only
    through conv INPUTS (like weight noise), never compounds through
    the 32-block residual stream;
  * head / folded-upsampler / out stay bf16 (quality-sensitive
    endpoints, ~6% of time).

Calibration: a bf16 forward over a few representative tiles recording
per-channel amax of every conv input (collect_calibration).  No labels
needed; test.py calibrates on the eval set's own LR tiles.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pesr_tpu.models.fold import fold_generator_params
from pesr_tpu.ops.pixel_shuffle import fold_min_halo


def _conv_bf16(x: jnp.ndarray, p: Dict[str, Any],
               padding="SAME") -> jnp.ndarray:
    """bf16 conv+bias — fold._bias_conv pinned to the bf16 dtype (one
    definition of the NHWC/HWIO conv semantics; round-4 review)."""
    from pesr_tpu.models.fold import _bias_conv
    return _bias_conv(x, p, padding, jnp.bfloat16)


# --------------------------------------------------------------------------
# Calibration
# --------------------------------------------------------------------------


def make_calibration_apply(res_scale: float = 0.1) -> Callable:
    """Build ``calib(variables, x) -> amax tree``: a bf16 forward that
    records per-channel max|input| of every quantizable conv.

    The amax tree mirrors what quantize_generator_params consumes:
      {"body": {"in1": [L, C], "in2": [L, C]}, "tail_in": [C],
       "up_in": [C]}  (up_in = the folded-upsampler input tail+skip)

    Scale-independent by construction: the graph stops at the upfold
    INPUT, which every scale shares — the same amax tree calibrates a
    checkpoint at any scale (a former ``scale`` parameter was dead).
    """

    def apply(variables: Any, x: jnp.ndarray) -> Dict[str, Any]:
        p = variables["params"]
        x = x.astype(jnp.bfloat16)
        head = _conv_bf16(x, p["head"])

        blk = p["body"]["block"]

        def body_fn(carry, per_block):
            c1, c2 = per_block
            a1 = jnp.max(jnp.abs(carry.astype(jnp.float32)),
                         axis=(0, 1, 2))
            y = jnp.maximum(_conv_bf16(carry, c1), 0)
            a2 = jnp.max(jnp.abs(y.astype(jnp.float32)), axis=(0, 1, 2))
            y = _conv_bf16(y, c2)
            return (carry + jnp.asarray(res_scale, jnp.bfloat16) * y,
                    (a1, a2))

        y, (in1, in2) = jax.lax.scan(body_fn, head,
                                     (blk["conv1"], blk["conv2"]))
        tail_in = jnp.max(jnp.abs(y.astype(jnp.float32)), axis=(0, 1, 2))
        u = _conv_bf16(y, p["tail"]) + head
        up_in = jnp.max(jnp.abs(u.astype(jnp.float32)), axis=(0, 1, 2))
        return {"body": {"in1": in1, "in2": in2}, "tail_in": tail_in,
                "up_in": up_in}

    return apply


def collect_calibration(params: Dict[str, Any],
                        tiles: Sequence[np.ndarray],
                        res_scale: float = 0.1) -> Dict[str, Any]:
    """Run the calibration forward over normalized [-1,1] NHWC tiles
    (same-shape batches) and reduce amax across batches.  Calibration
    is scale-independent (see make_calibration_apply)."""
    calib_fn = jax.jit(make_calibration_apply(res_scale))
    acc = None
    for t in tiles:
        stats = jax.device_get(calib_fn({"params": params},
                                        jnp.asarray(t)))
        acc = stats if acc is None else jax.tree_util.tree_map(
            np.maximum, acc, stats)
    return acc


# --------------------------------------------------------------------------
# Quantization
# --------------------------------------------------------------------------


def _quantize_conv_folded(kernel: np.ndarray, bias: np.ndarray,
                          amax_in: np.ndarray) -> Dict[str, Any]:
    """HWIO f32 kernel + per-input-channel amax -> int8 conv params.

    Returns {w_q int8 HWIO, qin [Cin] f32 (1/s_in, multiplies the bf16
    activation before rounding), m [Cout] f32 (dequant multiplier),
    bias [Cout] f32}.
    """
    kernel = np.asarray(kernel, np.float64)
    s_in = np.maximum(np.asarray(amax_in, np.float64), 1e-6) / 127.0
    w_fold = kernel * s_in[None, None, :, None]
    s_w = np.max(np.abs(w_fold), axis=(0, 1, 2))
    s_w = np.maximum(s_w, 1e-12) / 127.0
    w_q = np.clip(np.round(w_fold / s_w), -127, 127).astype(np.int8)
    return {"w_q": jnp.asarray(w_q),
            "qin": jnp.asarray((1.0 / s_in).astype(np.float32)),
            "m": jnp.asarray(s_w.astype(np.float32)),
            "bias": jnp.asarray(bias, jnp.float32)}


def quantize_generator_params(params: Dict[str, Any],
                              calib: Dict[str, Any],
                              scale: int = 4,
                              quant_fold: bool = False) -> Dict[str, Any]:
    """Generator params + calibration amax tree -> W8A8 params tree.

    Body + tail convs are quantized; the head stays bf16, and the
    folded upsampler (derived here, so the int8 path gets the same
    ~20% MXU-work reduction as the bf16 path) defaults to bf16 too —
    it writes RGB directly, and quantizing it measurably costs PSNR
    (~0.04 dB on the demo checkpoint) for ~1% throughput
    (``quant_fold=True`` to trade the other way)."""
    blk = params["body"]["block"]
    in1 = np.asarray(calib["body"]["in1"])
    in2 = np.asarray(calib["body"]["in2"])
    num_blocks = in1.shape[0]

    q1, q2 = [], []
    for i in range(num_blocks):
        q1.append(_quantize_conv_folded(
            np.asarray(blk["conv1"]["kernel"])[i],
            np.asarray(blk["conv1"]["bias"])[i], in1[i]))
        q2.append(_quantize_conv_folded(
            np.asarray(blk["conv2"]["kernel"])[i],
            np.asarray(blk["conv2"]["bias"])[i], in2[i]))
    stack = lambda qs: jax.tree_util.tree_map(  # noqa: E731
        lambda *xs: jnp.stack(xs), *qs)

    folded = fold_generator_params(params, scale)
    pads = folded.pop("_pads")
    bf16 = lambda p: jax.tree_util.tree_map(  # noqa: E731
        lambda a: jnp.asarray(a, jnp.bfloat16), p)
    return {
        "head": bf16(params["head"]),
        "body": {"block": {"conv1": stack(q1), "conv2": stack(q2)}},
        "tail": _quantize_conv_folded(np.asarray(params["tail"]["kernel"]),
                                      np.asarray(params["tail"]["bias"]),
                                      np.asarray(calib["tail_in"])),
        "upfold": (_quantize_conv_folded(
            np.asarray(folded["upfold"]["kernel"]),
            np.asarray(folded["upfold"]["bias"]),
            np.asarray(calib["up_in"])) if quant_fold
            else bf16(folded["upfold"])),
        "_pads": pads,
    }


# --------------------------------------------------------------------------
# Inference
# --------------------------------------------------------------------------


def _qconv(x_bf16: jnp.ndarray, qp: Dict[str, Any],
           padding="SAME") -> jnp.ndarray:
    """Static-scale int8 conv: bf16 in, bf16 out, int8 MXU inside."""
    xq = jnp.clip(jnp.round(x_bf16.astype(jnp.float32) * qp["qin"]),
                  -127, 127).astype(jnp.int8)
    acc = _conv_int8(xq, qp["w_q"], padding)
    return (acc.astype(jnp.float32) * qp["m"]
            + qp["bias"]).astype(jnp.bfloat16)


def _conv_int8(xq: jnp.ndarray, w_q: jnp.ndarray,
               padding="SAME") -> jnp.ndarray:
    """int8 x int8 -> int32 conv on the int8 MXU."""
    return jax.lax.conv_general_dilated(
        xq, w_q, (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def make_int8_apply(scale: int, res_scale: float = 0.1,
                    pads=None) -> Callable:
    """Build ``apply(qvariables, x)`` compatible with the tiling engines.

    ``qvariables = {"params": quantize_generator_params(...)}`` with
    the ``_pads`` entry popped by the caller (see int8_inference)."""
    if pads is None:
        raise ValueError(
            "make_int8_apply requires the folded upsampler's (pad_lo, "
            "pad_hi) — pop '_pads' from quantize_generator_params(...) "
            "and pass it, or use int8_inference() which does both")
    s = scale

    def _trunk(qvariables: Any, x: jnp.ndarray) -> jnp.ndarray:
        q = qvariables["params"]
        head = _conv_bf16(x, q["head"])

        blk = q["body"]["block"]

        def body_fn(carry, per_block):
            c1, c2 = per_block
            # Fused requant on the conv1 -> conv2 link: conv1's dequant
            # multiplier (per-OUTPUT-channel m1) and conv2's input quant
            # scale (per-INPUT-channel qin2) live on the SAME channel
            # axis, so one per-channel vector m1*qin2 takes conv1's
            # int32 accumulator straight to conv2's int8 input — the
            # bf16 activation between them (a full-tensor multiply +
            # two casts per block) never materializes.  ReLU commutes
            # with the positive per-channel scale, and rounding once in
            # f32 (instead of bf16-cast then round) only REMOVES a
            # rounding step.  Only this in-block link can fuse: the
            # residual carry needs real-unit bf16 values.
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
            return carry + jnp.asarray(res_scale, jnp.bfloat16) * y, None

        # Fully unrolled body: the scan boundary stopped XLA from
        # overlapping each block's requant (VPU round/clip/cast chains)
        # with the next block's MXU conv; unrolling lets the scheduler
        # software-pipeline across blocks — measured 54.9 -> 61.4
        # MP/s (+12%) on the x4 flagship, bitwise-identical output
        # (canonical sweep numbers: BASELINE.md roofline table).
        # Compile cost: ~27s first call at 32 blocks (persistent-cached).
        y, _ = jax.lax.scan(body_fn, head, (blk["conv1"], blk["conv2"]),
                            unroll=True)
        y = _qconv(y, q["tail"]) + head

        up = q["upfold"]
        return (_qconv(y, up, padding=(pads, pads)) if "w_q" in up
                else _conv_bf16(y, up, padding=(pads, pads)))

    def apply(qvariables: Any, x: jnp.ndarray) -> jnp.ndarray:
        # Return bf16 (no upcast): every consumer upcasts elementwise
        # before quantizing (denormalize_to_uint8 / the float_out engine
        # path start with astype(float32), and bf16->f32 is exact), so
        # the uint8 output is bitwise identical and the apply's HR-res
        # output buffer is half the bytes.
        from pesr_tpu.ops.pixel_shuffle import pixel_shuffle
        return pixel_shuffle(_trunk(qvariables, x), s)

    def apply_u8(qvariables: Any, x: jnp.ndarray) -> jnp.ndarray:
        # uint8 BEFORE the depth-to-space (see models/fold.py apply_u8:
        # the per-element quantize commutes with the layout shuffle
        # bitwise, and the shuffle then moves 1-byte pixels — it was
        # ~13% of x8 pass time at float width).
        from pesr_tpu.data.augment import denormalize_to_uint8
        from pesr_tpu.ops.pixel_shuffle import pixel_shuffle
        return pixel_shuffle(denormalize_to_uint8(_trunk(qvariables, x)),
                             s)

    # The int8 path always uses the folded upsampler, so it inherits the
    # fold's border band: the tiling engines must pad+crop at least this
    # much on every border (see models/fold.py and ops/tiling.py).
    apply.min_halo = apply_u8.min_halo = fold_min_halo(scale)
    apply.uint8_variant = apply_u8
    return apply


def int8_inference(params: Dict[str, Any], scale: int,
                   calib_tiles: Sequence[np.ndarray],
                   res_scale: float = 0.1,
                   quant_fold: Optional[bool] = None):
    """One-call setup: calibrate on ``calib_tiles`` (normalized [-1,1]
    NHWC batches), quantize, and return ``(apply_fn, variables)`` for
    the tiling engines.

    ``quant_fold`` (None = auto): whether the folded upsampler conv
    also runs int8.  Auto enables it only at scale >= 8, where the
    9x9x256->192 upfold is ~10% of the model's FLOPs and quantizing it
    measured +5% throughput (155.6 -> 158.4 MP/s) for 0.015 dB on the
    trained 32x256 flagship; at x2/x4 the upfold is too small to pay
    back (measured 0.1 MP/s noise), so the bf16 upfold keeps its
    quality margin for free (round-3 on-chip measurements)."""
    if quant_fold is None:
        quant_fold = scale >= 8
    calib = collect_calibration(params, calib_tiles, res_scale)
    q = quantize_generator_params(params, calib, scale,
                                  quant_fold=quant_fold)
    pads = q.pop("_pads")
    return make_int8_apply(scale, res_scale, pads=pads), {"params": q}


def int8_agreement_db(apply_int8: Callable, qvariables: Any,
                      params: Dict[str, Any], scale: int,
                      probe_tiles: Sequence[np.ndarray],
                      res_scale: float = 0.1,
                      bf16_engine=None) -> float:
    """Agreement PSNR (dB, 255-peak) between the int8 and bf16-folded
    applies over normalized [-1,1] NHWC probe batches.

    The quantized engine's ground truth is the bf16 engine it replaces,
    so their output agreement is measurable with NO labels at engine-
    build time.  Empirical mapping (round-4 stress study,
    tests/test_quant_stress.py, 8x64 demo checkpoint): healthy
    checkpoints with matched calibration measure ~62 dB agreement
    (eval delta 0.02 dB) — including under injected weight/activation
    outliers (one-tap x50, hot channels x30, heavy 1%-x30 tails: the
    per-input-channel scales + bf16 residual carry absorb them all
    within the 0.05 dB budget).  The one stress that actually blows
    the budget — CALIBRATION DISTRIBUTION SHIFT (near-black
    calibration tiles, eval delta 2.1 dB) — collapses agreement to
    ~42 dB.  Interpolating the two points log-linearly, each ~10.5 dB
    of agreement costs ~10x eval delta; 0.05 dB risk sits at ~59 dB."""
    import jax

    from pesr_tpu.models.fold import folded_inference

    # res_scale MUST reach the reference engine: comparing against a
    # differently-scaled network makes the agreement meaningless.
    # ``bf16_engine`` lets int8_inference_guarded share the one it
    # builds instead of folding the params twice.
    bf16_apply, bf16_vars = (bf16_engine if bf16_engine is not None
                             else folded_inference(params, scale,
                                                   res_scale,
                                                   dtype=jnp.bfloat16))
    f_int8 = jax.jit(apply_int8)
    f_bf16 = jax.jit(bf16_apply)
    se, n = 0.0, 0
    for t in probe_tiles:
        x = jnp.asarray(t)
        yq = np.asarray(f_int8(qvariables, x), np.float32)
        yb = np.asarray(f_bf16(bf16_vars, x), np.float32)
        err = (yq - yb) * 127.5          # [-1,1] -> 255-scale
        se += float(np.sum(err * err))
        n += err.size
    rms = np.sqrt(se / max(n, 1))
    return float(20.0 * np.log10(255.0 / max(rms, 1e-12)))


def int8_inference_guarded(params: Dict[str, Any], scale: int,
                           calib_tiles: Sequence[np.ndarray],
                           probe_tiles: Optional[Sequence[np.ndarray]]
                           = None,
                           min_agreement_db: float = 55.0,
                           res_scale: float = 0.1,
                           quant_fold: Optional[bool] = None,
                           fallback_dtype=None):
    """int8_inference with an automatic per-checkpoint quality guard
    (round-3 verdict #2 mitigation; round-4 verdict weak #2 rescue).

    Rung ladder, in throughput order:
      1. int8 calibrated on ``calib_tiles`` — agreement measured vs the
         bf16 folded reference on ``probe_tiles`` (default: the
         calibration tiles; pass tiles from the SERVING distribution to
         also catch calibration/serving shift, the one stress class
         that measurably blows the 0.05 dB budget);
      2. when rung 1 lands under ``min_agreement_db`` AND distinct
         probe tiles exist: RECALIBRATE on the probe tiles and retry —
         the measured failure mode is calibration distribution shift,
         which recalibrating on serving-distribution tiles fixes
         outright (tests/test_quant_stress.py pins the rescue), so the
         guard should not surrender 26 MP/s to a fixable miscalibration
         (round-4 verdict weak #2).  Skipped when probe == calib:
         recalibrating on the same tiles rebuilds the identical engine;
      3. the unquantized folded path (``fallback_dtype``; default
         bf16) WITH A LOUD WARNING — exact, ~42% slower at x4.

    Returns ``(apply_fn, variables, report)``.  ``report["served"]``
    names the rung that came back ("int8" | "int8_recalibrated" |
    "bf16"/"float32"); ``report["fallback"]`` stays the rung-3 flag.
    The agreement reference is ALWAYS the bf16 folded engine — the
    55 dB default floor and the log-linear agreement->delta map were
    calibrated against it (int8_agreement_db docstring); a float32
    reference would fold the bf16 activation noise of the int8 path's
    own residual carry into the score and shift the regimes.  The
    default threshold (55 dB) sits between the healthy regime (~62 dB
    measured across clean and outlier-injected checkpoints) and the
    blown regime (~42 dB under calibration shift); by the measured
    log-linear agreement->delta map it admits at most ~0.1 dB risk
    while keeping ~7 dB of false-fallback margin."""
    from pesr_tpu.models.fold import (fold_generator_params,
                                      make_folded_apply)

    # Fold ONCE, cast per consumer dtype: the guard used to fold
    # flagship params a second time when a float32 fallback tripped
    # (round-4 advisor), and the probe reference + fallback engine
    # share the same folded tree anyway.
    folded = fold_generator_params(params, scale)
    pads = folded.pop("_pads")

    def _folded_engine(dtype):
        cast = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype),
                                      folded)
        return (make_folded_apply(scale, res_scale, dtype, pads=pads),
                {"params": cast})

    bf16_engine = _folded_engine(jnp.bfloat16)
    probe = probe_tiles if probe_tiles is not None else calib_tiles

    apply_fn, variables = int8_inference(params, scale, calib_tiles,
                                         res_scale, quant_fold)
    agreement = int8_agreement_db(apply_fn, variables, params, scale,
                                  probe, res_scale,
                                  bf16_engine=bf16_engine)
    report = {"agreement_db": round(agreement, 2),
              "min_agreement_db": min_agreement_db,
              "served": "int8", "recalibrated": False,
              "fallback": False}

    if agreement < min_agreement_db and probe is not calib_tiles:
        import sys
        print(
            f"[quant-guard] agreement {agreement:.1f} dB < "
            f"{min_agreement_db:.1f} dB floor with offline calibration "
            f"— recalibrating on the probe (serving-distribution) "
            f"tiles and retrying before falling back.",
            file=sys.stderr, flush=True)
        retry_fn, retry_vars = int8_inference(params, scale, probe,
                                              res_scale, quant_fold)
        retry_db = int8_agreement_db(retry_fn, retry_vars, params,
                                     scale, probe, res_scale,
                                     bf16_engine=bf16_engine)
        report["agreement_db_recalibrated"] = round(retry_db, 2)
        if retry_db >= min_agreement_db:
            apply_fn, variables = retry_fn, retry_vars
            agreement = retry_db
            report.update(served="int8_recalibrated",
                          recalibrated=True)
            print(
                f"[quant-guard] recalibration rescued the int8 engine: "
                f"agreement {retry_db:.1f} dB >= "
                f"{min_agreement_db:.1f} dB — serving int8 calibrated "
                f"on the probe tiles.",
                file=sys.stderr, flush=True)

    if agreement < min_agreement_db:
        import sys
        report["fallback"] = True
        print(
            f"[quant-guard] int8-vs-bf16 agreement {agreement:.1f} dB "
            f"< {min_agreement_db:.1f} dB floor — the quantized engine "
            f"would not hold the quality budget on this checkpoint/"
            f"calibration (likely causes: calibration tiles that do not "
            f"cover the serving distribution, or pathological weight "
            f"statistics).  FALLING BACK to the unquantized folded "
            f"path (slower, exact).",
            file=sys.stderr, flush=True)
        if fallback_dtype is None or fallback_dtype == jnp.bfloat16:
            # Reuse the reference engine the agreement probe built.
            apply_fn, variables = bf16_engine
            report["served"] = "bf16"
        else:
            apply_fn, variables = _folded_engine(fallback_dtype)
            report["served"] = np.dtype(fallback_dtype).name
    return apply_fn, variables, report


def default_calib_tiles(lr_images: Sequence[np.ndarray],
                        tile: int = 96, max_tiles: int = 16,
                        seed: int = 0) -> Sequence[np.ndarray]:
    """Build normalized calibration batches from uint8 LR images:
    random ``tile x tile`` crops, one [N, tile, tile, 3] batch."""
    rng = np.random.default_rng(seed)
    crops = []
    for _ in range(max_tiles):
        img = lr_images[rng.integers(len(lr_images))]
        h, w = img.shape[:2]
        if h < tile or w < tile:
            pad_h, pad_w = max(0, tile - h), max(0, tile - w)
            img = np.pad(img, ((0, pad_h), (0, pad_w), (0, 0)),
                         mode="edge")
            h, w = img.shape[:2]
        y = rng.integers(0, h - tile + 1)
        x = rng.integers(0, w - tile + 1)
        crops.append(img[y:y + tile, x:x + tile])
    batch = np.stack(crops).astype(np.float32) / 127.5 - 1.0
    return [batch]
