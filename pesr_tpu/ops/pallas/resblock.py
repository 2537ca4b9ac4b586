"""Fused residual-block kernel: conv3x3 + bias + ReLU + conv3x3 +
scaled-residual-add in one VMEM-resident pass (SURVEY.md §3.4: the
residual chain is ~95% of generator FLOPs; §7.9).

Why fuse: under XLA each conv round-trips activations through HBM (read
x, write y) — a 32-block body moves ~65 activation-sized buffers.  The
fused kernel reads each spatial tile (plus a 2-pixel halo) once, runs
BOTH convs and the residual math out of VMEM, and writes the tile once:
~2x less HBM traffic per block.

Conv strategy ("shift-accumulate"): a 3x3 conv is nine C->C matmuls —
for each tap (dy, dx) the FULL input tile (flattened to [rows, C]) hits
the MXU against W[dy, dx], and the [tile_h, tile_w, C] result is
accumulated at spatial offset (dy, dx) on the VPU.  Large contiguous
matmuls (MXU-optimal), no im2col gather.  The ~10% extra tap-FLOPs on
the halo fringe are the price of alignment.

Boundary semantics: SAME zero padding, identical to
``flax.linen.Conv(padding="SAME")`` — the wrapper zero-pads by 2 and the
parity test pins equality against the XLA reference.

Autodiff: the kernel is wrapped in a ``jax.custom_vjp`` whose backward
pass is the XLA transpose of the reference math (recomputed from the
saved inputs — rematerialization, so the fused forward's VMEM residency
never has to spill intermediates for the backward).  ``--use_pallas``
is therefore usable in TRAINING as well as inference; gradient parity
vs ``jax.grad`` of the XLA reference is pinned in tests/test_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pesr_tpu.ops.pallas.common import (conv3x3_shift_acc, halo_tiles,
                                        untile)


def _resblock_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                     res_scale: float, compute_dtype, img_h: int,
                     img_w: int, nh: int, nw: int):
    """One grid step = one output tile.  x_ref block: (1, TH+4, TW+4, C);
    o_ref block: (1, TH, TW, C)."""
    x = x_ref[0].astype(compute_dtype)
    th = o_ref.shape[1]
    tw = o_ref.shape[2]

    y1 = conv3x3_shift_acc(x, w1_ref[...], b1_ref[...])      # (TH+2,TW+2,C)
    y1 = jnp.maximum(y1, 0.0)

    # SAME-conv chain semantics: the reference zero-pads conv2's INPUT at
    # the image border, but y1's halo ring computed from zero-padded x is
    # relu(bias + partial sums) != 0 there — mask the out-of-image ring.
    k = pl.program_id(0)
    i = (k // nw) % nh
    j = k % nw
    gy = i * th - 1 + jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    gx = j * tw - 1 + jax.lax.broadcasted_iota(jnp.int32, (1, tw + 2, 1), 1)
    inside = (gy >= 0) & (gy < img_h) & (gx >= 0) & (gx < img_w)
    y1 = jnp.where(inside, y1, 0.0).astype(compute_dtype)

    y2 = conv3x3_shift_acc(y1, w2_ref[...], b2_ref[...])     # (TH,TW,C)

    core = x[2:2 + th, 2:2 + tw, :].astype(jnp.float32)
    out = core + jnp.float32(res_scale) * y2
    o_ref[0] = out.astype(o_ref.dtype)


def _resblock_pallas_forward(x: jnp.ndarray, w1: jnp.ndarray,
                             b1: jnp.ndarray, w2: jnp.ndarray,
                             b2: jnp.ndarray, res_scale: float,
                             tile: Tuple[int, int],
                             interpret: bool) -> jnp.ndarray:
    """Raw Pallas forward (no autodiff rule).

    The input is zero-padded by 2 (two SAME convs) and to tile multiples;
    overlapping halo windows are expressed by pre-tiling the padded
    activation into [B*nh*nw, TH+4, TW+4, C] (an HBM gather XLA fuses
    with the pad) so the grid pipeline double-buffers tiles automatically.
    """
    b, h, w, c = x.shape
    th, tw = tile
    compute_dtype = x.dtype if x.dtype != jnp.float64 else jnp.float32

    tiles, nh, nw = halo_tiles(x, th, tw, halo=2)

    wdt = compute_dtype
    kernel = functools.partial(_resblock_kernel, res_scale=res_scale,
                               compute_dtype=wdt, img_h=h, img_w=w,
                               nh=nh, nw=nw)
    out_tiles = pl.pallas_call(
        kernel,
        grid=(b * nh * nw,),
        in_specs=[
            pl.BlockSpec((1, th + 4, tw + 4, c), lambda k: (k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, c), lambda k: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda k: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, c), lambda k: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda k: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, tw, c), lambda k: (k, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * nh * nw, th, tw, c), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 9 * c * c * (th + 2) * (tw + 2),
            bytes_accessed=(th + 4) * (tw + 4) * c * 2 * 2,
            transcendentals=0,
        ),
    )(tiles, w1.astype(wdt), b1.astype(wdt), w2.astype(wdt),
      b2.astype(wdt))

    return untile(out_tiles, b, nh, nw, h, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _resblock_vjp(x, w1, b1, w2, b2, res_scale, tile, interpret):
    return _resblock_pallas_forward(x, w1, b1, w2, b2, res_scale, tile,
                                    interpret)


def _resblock_fwd(x, w1, b1, w2, b2, res_scale, tile, interpret):
    out = _resblock_pallas_forward(x, w1, b1, w2, b2, res_scale, tile,
                                   interpret)
    return out, (x, w1, b1, w2, b2)


def _resblock_bwd(res_scale, tile, interpret, residuals, g):
    # Backward = XLA transpose of the reference math, recomputed from the
    # saved inputs (remat): d/dx needs the transposed convs (spatially
    # flipped, io-swapped kernels) and the ReLU mask; d/dW needs the
    # input/hidden activations.  XLA's autodiff of the reference emits
    # exactly those convs on the MXU — no hand-written transpose kernel
    # can change the math, only the scheduling, and the forward is where
    # the fusion win lives.
    x, w1, b1, w2, b2 = residuals
    _, pullback = jax.vjp(
        lambda x_, w1_, b1_, w2_, b2_: resblock_reference(
            x_, w1_, b1_, w2_, b2_, res_scale=res_scale),
        x, w1, b1, w2, b2)
    return pullback(g)


_resblock_vjp.defvjp(_resblock_fwd, _resblock_bwd)


@functools.partial(jax.jit, static_argnames=("res_scale", "tile",
                                             "interpret"))
def fused_resblock(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                   w2: jnp.ndarray, b2: jnp.ndarray,
                   res_scale: float = 0.1,
                   tile: Tuple[int, int] = (36, 36),
                   interpret: bool = False) -> jnp.ndarray:
    """x [B,H,W,C] (+ HWIO conv weights) -> x + res_scale*conv2(relu(conv1(x))).

    Differentiable: forward runs the fused Pallas kernel, backward the
    XLA reference transpose (see ``_resblock_bwd``) — so the generator
    body can train with ``--use_pallas`` (grad parity pinned in
    tests/test_pallas.py::test_fused_resblock_grads_match_reference).
    """
    return _resblock_vjp(x, w1, b1, w2, b2, res_scale, tile, interpret)


def resblock_reference(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                       w2: jnp.ndarray, b2: jnp.ndarray,
                       res_scale: float = 0.1) -> jnp.ndarray:
    """XLA-semantics reference: the exact math models/generator.ResBlock
    performs (SAME convs, ReLU between, scaled residual)."""
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(x, w1.astype(x.dtype), (1, 1), "SAME",
                                     dimension_numbers=dn)
    y = y + b1.astype(y.dtype)
    y = jnp.maximum(y, 0)
    y = jax.lax.conv_general_dilated(y, w2.astype(y.dtype), (1, 1), "SAME",
                                     dimension_numbers=dn)
    y = y + b2.astype(y.dtype)
    return x + jnp.asarray(res_scale, x.dtype) * y
