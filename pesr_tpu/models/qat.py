"""Quantization-aware training: an inference-sim W8A8 generator forward
with straight-through gradients (``--phase qat``; round-1 verdict item 2
"optional short QAT fine-tune").

The int8 inference path (models/quant_apply.py) is post-training
quantization: weights adapt to nothing.  A short QAT fine-tune runs the
SAME quantization math in the forward pass — per-input-channel
activation scales folded into per-output-channel-quantized weights —
but with float carriers and straight-through estimators, so gradients
flow and the L1 objective pulls the weights onto the int8 grid.  After
QAT, the saved checkpoint is a plain f32 Generator tree; inference uses
the standard calibrated int8 path (or bf16 — QAT costs it nothing).

Numerics note: the fake-quantized operands are integers <= 127, which
bfloat16 represents exactly (8 mantissa bits cover +-256), and TPU
convs accumulate in f32 — so the bf16 fake-quant conv reproduces the
int8 MXU result EXACTLY, not approximately (pinned by
tests/test_qat.py).

Scale handling is dynamic per batch (stop-gradient amax): training
sees a slightly different scale each step, which regularizes toward
robustness to whatever static scales inference calibration later picks.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from pesr_tpu.ops.pixel_shuffle import pixel_shuffle, upsample_stages


def _ste_round(x: jnp.ndarray) -> jnp.ndarray:
    """round() in the forward, identity in the backward."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def fake_quant_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                    bias: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Inference-sim W8A8 conv: quantize activations per input channel,
    fold those scales into the kernel, quantize it per output channel,
    convolve the integer-valued tensors, dequantize.  Matches
    quant_apply._qconv when the calibration amax equals this batch's —
    up to one int8 LSB on values landing within an f32 ulp of a .5
    rounding boundary: the inference path computes weight scales in
    float64 and rounds x*qin (a precomputed reciprocal) while this
    traced graph stays float32 and divides, so the two can round such
    borderline values to adjacent steps.  Immaterial for training (QAT
    optimizes THROUGH the quantizer, not against exact bits), but do
    not build bit-equality tests on this contract."""
    xf = x.astype(jnp.float32)
    amax = jax.lax.stop_gradient(
        jnp.max(jnp.abs(xf), axis=tuple(range(x.ndim - 1))))
    s_in = jnp.maximum(amax, 1e-6) / 127.0
    xq = jnp.clip(_ste_round(xf / s_in), -127, 127)

    kf = kernel.astype(jnp.float32)
    w_fold = kf * s_in[None, None, :, None]
    s_w = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(jnp.abs(w_fold), axis=(0, 1, 2)), 1e-12)
        / 127.0)
    wq = jnp.clip(_ste_round(w_fold / s_w), -127, 127)

    # Integer-valued bf16 operands: exact on the MXU (f32 accumulation).
    y = jax.lax.conv_general_dilated(
        xq.astype(dtype), wq.astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (y.astype(jnp.float32) * s_w
            + bias.astype(jnp.float32)).astype(dtype)


def make_qat_apply(scale: int, res_scale: float = 0.1,
                   dtype=jnp.bfloat16) -> Callable:
    """Build ``apply(variables, x)`` consuming the standard Generator
    params tree, with the body+tail convs fake-quantized exactly as the
    int8 inference path quantizes them (head/upsampler/out stay float,
    mirroring quant_apply's endpoint policy)."""
    stages = upsample_stages(scale)

    from pesr_tpu.models.fold import _bias_conv

    def _conv(x, p):
        return _bias_conv(x, p, "SAME", dtype)

    def apply(variables: Any, x: jnp.ndarray) -> jnp.ndarray:
        p = variables["params"]
        x = x.astype(dtype)
        head = _conv(x, p["head"])

        blk = p["body"]["block"]

        def body_fn(carry, per_block):
            c1, c2 = per_block
            y = jnp.maximum(
                fake_quant_conv(carry, c1["kernel"], c1["bias"], dtype), 0)
            y = fake_quant_conv(y, c2["kernel"], c2["bias"], dtype)
            return carry + jnp.asarray(res_scale, dtype) * y, None

        y, _ = jax.lax.scan(body_fn, head, (blk["conv1"], blk["conv2"]))
        y = fake_quant_conv(y, p["tail"]["kernel"], p["tail"]["bias"],
                            dtype) + head

        for i, f in enumerate(stages):
            up = p["upsampler"][f"conv{i}"]
            y = _conv(y, up)
            y = pixel_shuffle(y, f)
        out = _conv(y, p["out"])
        return out.astype(jnp.float32)

    return apply
