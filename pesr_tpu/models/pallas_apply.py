"""Generator inference path with the fused Pallas residual-block body
(SURVEY.md §7.9; the ``--use_pallas`` flag surface).

Consumes the SAME params pytree as models.Generator (so checkpoints,
the torch converter, and the tiling engines are shared) but executes the
32-block body as a ``lax.scan`` over pesr_tpu.ops.pallas.fused_resblock
and each x2 upsampler stage via pesr_tpu.ops.pallas.fused_upsampler_stage;
only the head/tail/output convs stay on XLA.

Honest status (measured on v5e, 2026-08-16): XLA's conv lowering runs
the body at ~163-186 TFLOP/s effective and the fused kernel at
~53 TFLOP/s — the kernel's HBM-traffic savings don't pay because the
body is compute-bound.  The round-2 int8 investigation closed the
"int8 MXU variant" idea: on this jaxlib the native-int8 fast path
lives in XLA's CONV emitter (~266 TOP/s); int8 ``dot_general`` — the
only matmul form available inside Pallas/Mosaic — runs at ~66 TOP/s
whether emitted by XLA or Mosaic, so a Pallas int8 kernel cannot beat
the XLA conv it would replace.  The production int8 path is therefore
plain ``lax.conv`` with static scales (models/quant_apply.py); this
Pallas path stays OPT-IN as the correctness-tested fusion scaffold.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from pesr_tpu.ops.pallas.resblock import fused_resblock
from pesr_tpu.ops.pallas.upsampler import fused_upsampler_stage
from pesr_tpu.ops.pixel_shuffle import pixel_shuffle, upsample_stages


def _conv(x: jnp.ndarray, p: Any, dtype) -> jnp.ndarray:
    """flax.linen.Conv-equivalent SAME conv + bias in compute dtype
    (fold._bias_conv — one definition of the NHWC/HWIO semantics)."""
    from pesr_tpu.models.fold import _bias_conv
    return _bias_conv(x, p, "SAME", dtype)


def make_pallas_apply(scale: int, res_scale: float = 0.1,
                      dtype=jnp.bfloat16, tile=(36, 36),
                      interpret=None) -> Callable:
    """Build ``apply(variables, x)`` interchangeable with
    models.Generator.apply (same params tree, same I/O contract).

    ``interpret=None`` resolves to True off-TPU (the Mosaic kernels only
    lower for TPU; the interpreter keeps CPU tests/dev runs working).
    Differentiable end-to-end — each kernel carries a custom_vjp — so
    this apply_fn drops into training states as well as inference.
    """
    stages = upsample_stages(scale)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def apply(variables: Any, x: jnp.ndarray) -> jnp.ndarray:
        p = variables["params"]
        x = x.astype(dtype)
        head = _conv(x, p["head"], dtype)

        blk = p["body"]["block"]

        def body_fn(carry, per_block):
            w1, b1, w2, b2 = per_block
            out = fused_resblock(carry, w1.astype(dtype), b1.astype(dtype),
                                 w2.astype(dtype), b2.astype(dtype),
                                 res_scale=res_scale, tile=tile,
                                 interpret=interpret)
            return out, None

        y, _ = jax.lax.scan(
            body_fn, head,
            (blk["conv1"]["kernel"], blk["conv1"]["bias"],
             blk["conv2"]["kernel"], blk["conv2"]["bias"]))

        y = _conv(y, p["tail"], dtype) + head
        for i, f in enumerate(stages):
            up = p["upsampler"][f"conv{i}"]
            if f == 2:
                y = fused_upsampler_stage(y, up["kernel"].astype(dtype),
                                          up["bias"].astype(dtype),
                                          tile=tile, interpret=interpret)
            else:
                # The fused kernel is written for the x2 stage layout
                # (4 depth-to-space phases = 4 contiguous slices); x3
                # stages (DIV2K X3 track) take the XLA reference —
                # identical numerics, and the body (the FLOPs) is still
                # the fused Pallas path.
                y = pixel_shuffle(_conv(y, up, dtype), f)
        out = _conv(y, p["out"], dtype)
        return out.astype(jnp.float32)

    # Introspection tags (serving.export_upscaler rejects exporting the
    # Pallas path off-TPU / in interpreter mode based on these).
    apply.uses_pallas = True
    apply.pallas_interpret = bool(interpret)
    return apply
