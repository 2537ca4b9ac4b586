"""Fused sub-pixel upsampler kernel: conv3x3 (C -> 4C) + bias +
depth-to-space(2) in one VMEM-resident pass (BASELINE.json:5 "...and
sub-pixel (PixelShuffle) x4 upsampler become fused Pallas conv kernels";
SURVEY.md §7.9).

Under XLA the conv writes a [H, W, 4C] buffer to HBM and the
pixel-shuffle transpose reads+rewrites it at 2x resolution; fusing keeps
the 4C intermediate in VMEM and writes only the final [2H, 2W, C] tile.

Conv strategy is the same shift-accumulate as the resblock kernel (nine
full-tile MXU matmuls, here (rows, C) @ (C, 4C)); the depth-to-space is
the models/pixel_shuffle channel-order-preserving reshape+transpose done
on the VMEM tile, so torch checkpoint parity carries through.

SAME zero-pad semantics via wrapper padding + halo-1 tiles; forward-only
(inference path), opt-in with an XLA fallback like the resblock kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _upsampler_kernel(x_ref, w_ref, b_ref, o_ref, *, compute_dtype):
    """x block (1, TH+2, TW+2, C) -> o block (1, 2*TH, 2*TW, C).

    The wrapper pre-permutes the 4C output channels into quadrant-major
    order (quadrant q = i*2+j contiguous in [q*C, (q+1)*C)), so the
    depth-to-space reduces to four contiguous channel slices written at
    spatial stride 2 — Mosaic rejects the naive rank-5 reshape/transpose
    ("unsupported shape cast"), but strided stores lower fine.
    """
    x = x_ref[0].astype(compute_dtype)
    hin, win, c = x.shape
    th, tw = hin - 2, win - 2

    xf = x.reshape(hin * win, c)
    acc = jnp.zeros((th, tw, 4 * c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            y = jnp.dot(xf, w_ref[dy, dx],
                        preferred_element_type=jnp.float32)
            y = y.reshape(hin, win, 4 * c)
            acc = acc + y[dy:dy + th, dx:dx + tw, :]
    # Mosaic only lowers strided stores for 32-bit data -> o_ref is f32
    # (the wrapper casts back; XLA fuses the convert into the consumer).
    acc = acc + b_ref[...].astype(jnp.float32)

    for q in range(4):
        i, j = q // 2, q % 2
        o_ref[0, i::2, j::2, :] = acc[:, :, q * c:(q + 1) * c]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_upsampler_stage(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                          tile: Tuple[int, int] = (36, 36),
                          interpret: bool = False) -> jnp.ndarray:
    """One x2 stage: pixel_shuffle(conv3x3_SAME(x, w) + b, 2).

    x [B, H, W, C]; w (3, 3, C, 4C) HWIO; b (4C,).
    Returns [B, 2H, 2W, C].
    """
    bsz, h, w_dim, c = x.shape
    th, tw = tile
    nh, nw = -(-h // th), -(-w_dim // tw)
    compute_dtype = x.dtype if x.dtype != jnp.float64 else jnp.float32

    # Quadrant-major channel permutation (see kernel docstring): torch
    # PixelShuffle order is ch = c_idx*4 + (i*2+j); regroup to
    # ch' = (i*2+j)*C + c_idx.
    perm = jnp.asarray([c_idx * 4 + q for q in range(4)
                        for c_idx in range(c)])
    w = jnp.take(w, perm, axis=3)
    b = jnp.take(b, perm, axis=0)

    xp = jnp.pad(x, ((0, 0), (1, nh * th - h + 1), (1, nw * tw - w_dim + 1),
                     (0, 0)))

    i_idx = jnp.arange(nh) * th
    j_idx = jnp.arange(nw) * tw
    win_h = jax.vmap(
        lambda i: jax.lax.dynamic_slice_in_dim(xp, i, th + 2, axis=1)
    )(i_idx)
    tiles = jax.vmap(
        lambda j: jax.lax.dynamic_slice_in_dim(win_h, j, tw + 2, axis=3)
    )(j_idx)
    tiles = tiles.transpose(2, 1, 0, 3, 4, 5).reshape(
        bsz * nh * nw, th + 2, tw + 2, c)

    wdt = compute_dtype
    out_tiles = pl.pallas_call(
        functools.partial(_upsampler_kernel, compute_dtype=wdt),
        grid=(bsz * nh * nw,),
        in_specs=[
            pl.BlockSpec((1, th + 2, tw + 2, c), lambda k: (k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, 4 * c), lambda k: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * c,), lambda k: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * th, 2 * tw, c),
                               lambda k: (k, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz * nh * nw, 2 * th, 2 * tw, c),
                                       jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * c * 4 * c * th * tw,
            bytes_accessed=(th + 2) * (tw + 2) * c * 2 * 5,
            transcendentals=0,
        ),
    )(tiles, w.astype(wdt), b.astype(wdt))

    out = out_tiles.reshape(bsz, nh, nw, 2 * th, 2 * tw, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(bsz, nh * 2 * th, nw * 2 * tw, c)
    return out[:, :2 * h, :2 * w_dim, :].astype(x.dtype)


def upsampler_stage_reference(x: jnp.ndarray, w: jnp.ndarray,
                              b: jnp.ndarray) -> jnp.ndarray:
    """XLA reference: SAME conv + bias + pixel_shuffle(2) — exactly what
    models/generator.Upsampler does per stage."""
    from pesr_tpu.ops.pixel_shuffle import pixel_shuffle
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return pixel_shuffle(y + b.astype(y.dtype), 2)
