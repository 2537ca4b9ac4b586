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

SAME zero-pad semantics via wrapper padding + halo-1 tiles; opt-in with
an XLA fallback like the resblock kernel.  Differentiable the same way
as the resblock kernel: Pallas forward + ``custom_vjp`` backward that
recomputes through the XLA reference (conv transpose + space-to-depth),
so ``--use_pallas`` training reaches the upsampler stages too.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _upsampler_kernel(x_ref, w_ref, b_ref, o_ref, *, compute_dtype):
    """Grid step (tile k, channel-chunk m): x block (1, TH+2, TW+2, C)
    + per-chunk weights (1, 3, 3, C, 4*CHUNK) -> o block
    (1, 2*TH, 2*TW, CHUNK).

    The wrapper pre-groups the 4C conv outputs so each chunk's columns
    are [quadrant q][final channel c0..c0+CHUNK) contiguously; the
    depth-to-space is then four contiguous slices written at spatial
    stride 2.  Mosaic lowering constraints encountered (pinned by the
    C=256 flagship-width TPU check):
      * the naive rank-5 reshape/transpose is rejected
        ("unsupported shape cast");
      * strided stores must be 32-bit (hence the f32 o_ref, cast back
        by the wrapper where XLA fuses it into the consumer);
      * the strided store's base memref needs a last dim <= 128, hence
        the channel-chunk grid dimension.
    """
    from pesr_tpu.ops.pallas.common import conv3x3_shift_acc

    x = x_ref[0].astype(compute_dtype)
    chunk = o_ref.shape[-1]

    # b_ref carries ALL chunks (Mosaic block rules disallow a
    # 1-of-n_chunks second-minor block); select this grid step's row.
    bias = b_ref[pl.program_id(1)]
    acc = conv3x3_shift_acc(x, w_ref[0], bias)  # (TH, TW, 4*chunk)

    for q in range(4):
        i, j = q // 2, q % 2
        o_ref[0, i::2, j::2, :] = acc[:, :, q * chunk:(q + 1) * chunk]


def _upsampler_pallas_forward(x: jnp.ndarray, w: jnp.ndarray,
                              b: jnp.ndarray, tile: Tuple[int, int],
                              interpret: bool) -> jnp.ndarray:
    """Raw Pallas forward (no autodiff rule)."""
    bsz, h, w_dim, c = x.shape
    th, tw = tile
    compute_dtype = x.dtype if x.dtype != jnp.float64 else jnp.float32

    # Channel-chunked, quadrant-major weight regrouping (see kernel
    # docstring): torch PixelShuffle order is ch = c_idx*4 + (i*2+j);
    # chunk m holds columns [q][c0 + t] for q in 0..3, t in 0..CHUNK.
    chunk = min(c, 128)
    n_chunks = -(-c // chunk)
    if c % chunk:
        # Widths >128 not divisible by 128 can't use the chunked strided
        # stores — fall back to the XLA path (this is an opt-in
        # optimization, never a correctness dependency; SURVEY.md §7.6).
        return upsampler_stage_reference(x, w, b)
    cols = jnp.asarray(
        [[(m * chunk + t) * 4 + q for q in range(4)
          for t in range(chunk)] for m in range(n_chunks)])  # [m, 4*chunk]
    wg = jnp.take(w, cols.reshape(-1), axis=3).reshape(
        3, 3, c, n_chunks, 4 * chunk).transpose(3, 0, 1, 2, 4)
    bg = jnp.take(b, cols.reshape(-1), axis=0).reshape(
        n_chunks, 4 * chunk)

    from pesr_tpu.ops.pallas.common import halo_tiles, untile
    tiles, nh, nw = halo_tiles(x, th, tw, halo=1)

    wdt = compute_dtype
    out_tiles = pl.pallas_call(
        functools.partial(_upsampler_kernel, compute_dtype=wdt),
        grid=(bsz * nh * nw, n_chunks),
        in_specs=[
            pl.BlockSpec((1, th + 2, tw + 2, c),
                         lambda k, m: (k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 3, c, 4 * chunk),
                         lambda k, m: (m, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chunks, 4 * chunk), lambda k, m: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * th, 2 * tw, chunk),
                               lambda k, m: (k, 0, 0, m),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz * nh * nw, 2 * th, 2 * tw, c),
                                       jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * c * 4 * c * th * tw,
            bytes_accessed=(th + 2) * (tw + 2) * c * 2 * 5,
            transcendentals=0,
        ),
    )(tiles, wg.astype(wdt), bg.astype(jnp.float32))
    # bias stays f32: bf16 packs 2 rows/sublane and Mosaic cannot prove a
    # dynamic (program_id) row index even, rejecting the chunk-row load.

    return untile(out_tiles, bsz, nh, nw, 2 * h, 2 * w_dim
                  ).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _upsampler_vjp(x, w, b, tile, interpret):
    return _upsampler_pallas_forward(x, w, b, tile, interpret)


def _upsampler_fwd(x, w, b, tile, interpret):
    return _upsampler_pallas_forward(x, w, b, tile, interpret), (x, w, b)


def _upsampler_bwd(tile, interpret, residuals, g):
    # XLA transpose of the reference (conv transpose + space-to-depth on
    # the cotangent), recomputed from the saved inputs — same remat
    # strategy as the resblock kernel's backward.
    x, w, b = residuals
    _, pullback = jax.vjp(upsampler_stage_reference, x, w, b)
    return pullback(g)


_upsampler_vjp.defvjp(_upsampler_fwd, _upsampler_bwd)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_upsampler_stage(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                          tile: Tuple[int, int] = (36, 36),
                          interpret: bool = False) -> jnp.ndarray:
    """One x2 stage: pixel_shuffle(conv3x3_SAME(x, w) + b, 2).

    x [B, H, W, C]; w (3, 3, C, 4C) HWIO; b (4C,).
    Returns [B, 2H, 2W, C].  Differentiable (Pallas forward + XLA
    reference backward) so ``--use_pallas`` covers training.
    """
    return _upsampler_vjp(x, w, b, tile, interpret)


def upsampler_stage_reference(x: jnp.ndarray, w: jnp.ndarray,
                              b: jnp.ndarray) -> jnp.ndarray:
    """XLA reference: SAME conv + bias + pixel_shuffle(2) — exactly what
    models/generator.Upsampler does per stage."""
    from pesr_tpu.ops.pixel_shuffle import pixel_shuffle
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return pixel_shuffle(y + b.astype(y.dtype), 2)
