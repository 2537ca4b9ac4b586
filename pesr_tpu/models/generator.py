"""EDSR-style residual generator with sub-pixel upsampler (SURVEY.md §2
item 2, §3.4).

Reference behavior being rebuilt (reconstructed; mount was empty —
SURVEY.md §0): head 3x3 conv -> ``num_blocks`` residual blocks
(conv-ReLU-conv, residual scaled by ``res_scale``) -> tail conv + global
skip -> per-stage [conv to 4C, PixelShuffle(2)] upsampling -> 3-channel
output conv.  Defaults 32 blocks / 256 channels / res_scale 0.1
(~43 M params).

TPU-native choices:
  * NHWC layout end-to-end (TPU conv layout; torch checkpoints are
    converted OIHW->HWIO in pesr_tpu/convert.py).
  * bfloat16 compute / float32 params by default — convs hit the MXU in
    bf16 with f32 accumulation; the residual adds stay in compute dtype.
  * The body is rolled with ``nn.scan`` -> ONE compiled ResBlock body
    executed ``num_blocks`` times: compile time and HLO size stay flat as
    the net deepens, and XLA still pipelines HBM weight streaming.
  * Optional fused Pallas residual-block path (pesr_tpu/ops/pallas) behind
    ``use_pallas`` with numerics-parity tests against this XLA reference.

I/O contract: input is NHWC in [-1, 1] (see pesr_tpu/data/augment.py for
the uint8 <-> [-1,1] convention); output is NHWC in approximately [-1, 1]
(unclamped, like the reference — clamping happens at quantization).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

import jax

from pesr_tpu.ops.pixel_shuffle import pixel_shuffle, upsample_stages

Dtype = Any


@jax.custom_vjp
def _relu_save_output(x: jnp.ndarray) -> jnp.ndarray:
    """ReLU whose VJP keys off the OUTPUT instead of the input.

    ``jax.nn.relu``'s gradient masks with ``x > 0``, so AD must save the
    pre-activation (as a bool mask) alongside the post-activation that
    the next conv's weight-gradient already needs.  ``y = max(x, 0)``
    satisfies ``y > 0  <=>  x > 0``, so masking with the output is the
    SAME subgradient (0 at x == 0 either way) — bitwise-identical
    gradients — and the saved mask stack disappears: inside the
    ``nn.scan`` body each residual block then stacks two buffers
    (carry, relu output) instead of three.  Profiled on-chip: the
    per-iteration ``dynamic-update-slice`` stacking was ~33% of the
    flagship pretrain step; dropping the mask stack is a direct
    HBM-traffic cut on every training path (scan, unroll, and the
    Pallas custom-vjp path recomputes instead and is unaffected).
    """
    return jnp.maximum(x, 0)


def _relu_fwd(x):
    y = jnp.maximum(x, 0)
    return y, y


def _relu_bwd(y, g):
    return (jnp.where(y > 0, g, jnp.zeros_like(g)),)


_relu_save_output.defvjp(_relu_fwd, _relu_bwd)


class ResBlock(nn.Module):
    """conv3x3 -> ReLU -> conv3x3, residual scaled by ``res_scale``."""

    num_channels: int
    res_scale: float = 0.1
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Conv(self.num_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv1")(x)
        y = _relu_save_output(y)
        y = nn.Conv(self.num_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv2")(y)
        return x + jnp.asarray(self.res_scale, y.dtype) * y


class _ScanBody(nn.Module):
    """Adapter giving ResBlock the (carry, x) -> (carry, y) scan signature."""

    num_channels: int
    res_scale: float
    dtype: Dtype
    param_dtype: Dtype

    @nn.compact
    def __call__(self, carry, _):
        out = ResBlock(self.num_channels, self.res_scale, self.dtype,
                       self.param_dtype, name="block")(carry)
        return out, None


class Upsampler(nn.Module):
    """Sub-pixel stages: [conv C->f^2*C, depth-to-space(f)] per stage
    (f = 2 per stage for power-of-two scales, one f = 3 stage for the
    DIV2K X3 track — see ops.pixel_shuffle.upsample_stages)."""

    num_channels: int
    stages: tuple  # per-stage factors, e.g. (2, 2) for x4, (3,) for x3
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, f in enumerate(self.stages):
            x = nn.Conv(f * f * self.num_channels, (3, 3), padding="SAME",
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"conv{i}")(x)
            x = pixel_shuffle(x, f)
        return x


class Generator(nn.Module):
    """The PESR generator (SURVEY.md §3.4 hot path)."""

    scale: int = 4
    num_blocks: int = 32
    num_channels: int = 256
    res_scale: float = 0.1
    img_channels: int = 3
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    # Gradient checkpointing over the scanned body (``--remat``): saves
    # only each block's carry and recomputes the two conv activations in
    # the backward pass — activation memory for the body drops from
    # ~3 buffers/block to ~1, buying ~3x larger batch*patch² at the cost
    # of one extra forward (the classic TPU HBM-for-FLOPs trade; the
    # body is MXU-bound so the recompute overlaps well).  Identical
    # params tree and gradients (tests/test_models.py).
    remat: bool = False
    # Unroll the body scan (``--unroll_body``): the scan keeps compile
    # time flat but its per-iteration activation stacking
    # (dynamic-update-slice into the saved-residuals buffer) and loop
    # boundary cost real time in the TRAINING step; unrolling removes
    # both.  Same params tree (weights stay stacked on the leading
    # axis), identical outputs/grads; costs a long one-time compile at
    # 32 blocks (persistent-cached).
    unroll: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        stages = upsample_stages(self.scale)  # ValueError on e.g. 5
        x = x.astype(self.dtype)

        head = nn.Conv(self.num_channels, (3, 3), padding="SAME",
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="head")(x)

        # Rolled residual body: one traced block, scanned num_blocks times.
        # Weights are stacked on a leading axis; convert.py un/re-stacks
        # when mapping to the reference's per-block torch tensors.
        body = nn.scan(
            nn.remat(_ScanBody) if self.remat else _ScanBody,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.num_blocks,
            unroll=self.num_blocks if self.unroll else 1,
        )(self.num_channels, self.res_scale, self.dtype, self.param_dtype,
          name="body")
        y, _ = body(head, None)

        y = nn.Conv(self.num_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="tail")(y)
        y = y + head  # global skip (SURVEY.md §3.4)

        y = Upsampler(self.num_channels, stages, self.dtype,
                      self.param_dtype, name="upsampler")(y)
        out = nn.Conv(self.img_channels, (3, 3), padding="SAME",
                      dtype=self.dtype, param_dtype=self.param_dtype,
                      name="out")(y)
        return out.astype(jnp.float32)
