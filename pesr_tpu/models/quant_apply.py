"""Int8 post-training-quantized generator inference (performance path
toward the 50 MP/s/chip contract, BASELINE.md).

The v5e MXU runs int8 at 2x bf16 peak (394 vs 197 T(FL)OPS); the
bf16 generator is compute-bound at ~31 MP/s theoretical, so int8 is the
only route past the contract on this hardware.

Scheme (standard symmetric PTQ, chosen for SR robustness):
  * weights: per-OUTPUT-CHANNEL symmetric int8, scales s_w[o] =
    max|W[..., o]| / 127 — per-channel is what keeps EDSR-style nets
    within ~0.1 dB;
  * activations: dynamic per-TENSOR symmetric int8, s_x = max|x| / 127
    computed on device per conv input (one fused VPU reduction — no
    calibration corpus needed, important here where none exists);
  * accumulation int32 on the MXU (``preferred_element_type``),
    dequantized as y * (s_x * s_w[o]) + bias in f32;
  * residual adds, pixel-shuffle, and the first/last convs' I/O stay
    bf16/f32 (quantizing the 3-channel head/tail I/O buys nothing).

Opt-in via ``--quant int8`` (test.py) / ``BENCH_QUANT=int8`` (bench.py);
the parity-grade path remains bf16.  Measured (2026-08-16, trained 8x64
demo checkpoint, synthetic eval): int8 costs 0.21 dB PSNR (43.35 vs
43.56) for +22% throughput — outside the 0.05 dB parity budget, hence
opt-in.  Closing it needs finer activation granularity or QAT.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from pesr_tpu.ops.pixel_shuffle import pixel_shuffle


def quantize_conv(p: Dict[str, Any]) -> Dict[str, Any]:
    """HWIO f32 kernel -> {w_q int8, s_w [O] f32, bias f32}."""
    w = jnp.asarray(p["kernel"], jnp.float32)
    s_w = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    s_w = jnp.maximum(s_w, 1e-12)
    w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    return {"w_q": w_q, "s_w": s_w,
            "bias": jnp.asarray(p["bias"], jnp.float32)}


def quantize_generator_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the body/tail/upsampler convs of a Generator params tree
    (head and output convs stay bf16 — 3-channel I/O, negligible FLOPs
    but quality-sensitive endpoints)."""
    blk = params["body"]["block"]
    qblk = {name: jax.vmap(quantize_conv)(
        {"kernel": blk[name]["kernel"], "bias": blk[name]["bias"]})
        for name in ("conv1", "conv2")}
    q = {
        "head": params["head"],
        "body": {"block": qblk},
        "tail": quantize_conv(params["tail"]),
        "upsampler": {k: quantize_conv(v)
                      for k, v in params["upsampler"].items()},
        "out": params["out"],
    }
    return q


def _qconv(x: jnp.ndarray, qp: Dict[str, Any]) -> jnp.ndarray:
    """Dynamic per-tensor int8 conv: returns f32 NHWC."""
    s_x = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(x / s_x), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        x_q, qp["w_q"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (s_x * qp["s_w"]) + qp["bias"]


def _conv_bf16(x: jnp.ndarray, p: Dict[str, Any]) -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), jnp.asarray(p["kernel"], jnp.bfloat16),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + jnp.asarray(p["bias"], jnp.bfloat16)


def make_int8_apply(scale: int, res_scale: float = 0.1) -> Callable:
    """Build ``apply(qvariables, x)`` compatible with the tiling engines.

    ``qvariables = {"params": quantize_generator_params(params)}``.
    """
    num_stages = {1: 0, 2: 1, 4: 2, 8: 3}[scale]

    def apply(qvariables: Any, x: jnp.ndarray) -> jnp.ndarray:
        q = qvariables["params"]
        head = _conv_bf16(x, q["head"]).astype(jnp.float32)

        blk = q["body"]["block"]

        def body_fn(carry, per_block):
            c1, c2 = per_block
            y = jnp.maximum(_qconv(carry, c1), 0.0)
            y = _qconv(y, c2)
            return carry + jnp.float32(res_scale) * y, None

        y, _ = jax.lax.scan(body_fn, head, (blk["conv1"], blk["conv2"]))

        y = _qconv(y, q["tail"]) + head
        for i in range(num_stages):
            y = _qconv(y, q["upsampler"][f"conv{i}"])
            y = pixel_shuffle(y, 2)
        out = _conv_bf16(y, q["out"])
        return out.astype(jnp.float32)

    return apply
