"""Shared pieces of the fused conv kernels (resblock.py, upsampler.py).

Both kernels use the same two building blocks, kept here so semantics
can't silently diverge:

  * shift-accumulate 3x3 VALID conv (nine full-tile MXU matmuls),
  * halo tiling: expanding [B, H, W, C] into overlapping
    [B*nh*nw, TH+2*halo, TW+2*halo, C] windows (an HBM gather XLA fuses
    with the zero-pad) and reassembling kernel output tiles.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def conv3x3_shift_acc(x: jnp.ndarray, w: jnp.ndarray,
                      b: jnp.ndarray) -> jnp.ndarray:
    """VALID 3x3 conv of an (hin, win, Cin) tile via nine full-tile
    matmuls; returns (hin-2, win-2, Cout) float32.  ``w`` is
    (3, 3, Cin, Cout) HWIO; Cout is read from the weights."""
    hin, win, cin = x.shape
    cout = w.shape[-1]
    hout, wout = hin - 2, win - 2
    xf = x.reshape(hin * win, cin)
    acc = jnp.zeros((hout, wout, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            y = jnp.dot(xf, w[dy, dx],
                        preferred_element_type=jnp.float32)
            y = y.reshape(hin, win, cout)
            acc = acc + y[dy:dy + hout, dx:dx + wout, :]
    return acc + b.astype(jnp.float32)


def halo_tiles(x: jnp.ndarray, th: int, tw: int, halo: int
               ) -> Tuple[jnp.ndarray, int, int]:
    """Zero-pad [B,H,W,C] by ``halo`` + to tile multiples, then expand
    into overlapping windows [B*nh*nw, TH+2*halo, TW+2*halo, C].
    Returns (tiles, nh, nw)."""
    b, h, w, c = x.shape
    nh, nw = -(-h // th), -(-w // tw)
    xp = jnp.pad(x, ((0, 0), (halo, nh * th - h + halo),
                     (halo, nw * tw - w + halo), (0, 0)))
    i_idx = jnp.arange(nh) * th
    j_idx = jnp.arange(nw) * tw
    win_h = jax.vmap(
        lambda i: jax.lax.dynamic_slice_in_dim(xp, i, th + 2 * halo,
                                               axis=1))(i_idx)
    tiles = jax.vmap(
        lambda j: jax.lax.dynamic_slice_in_dim(win_h, j, tw + 2 * halo,
                                               axis=3))(j_idx)
    return (tiles.transpose(2, 1, 0, 3, 4, 5).reshape(
        b * nh * nw, th + 2 * halo, tw + 2 * halo, c), nh, nw)


def untile(tiles: jnp.ndarray, b: int, nh: int, nw: int, h: int, w: int
           ) -> jnp.ndarray:
    """Reassemble [B*nh*nw, TH, TW, C] kernel outputs into
    [B, H, W, C] (cropping grid padding)."""
    th, tw, c = tiles.shape[1], tiles.shape[2], tiles.shape[3]
    out = tiles.reshape(b, nh, nw, th, tw, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, nh * th, nw * tw, c)
    return out[:, :h, :w, :]
