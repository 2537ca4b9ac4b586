"""Sub-pixel (PixelShuffle) depth-to-space in NHWC (SURVEY.md §2 item 2).

The reference generator upsamples with ``nn.PixelShuffle`` after a conv that
expands channels by r^2 (SURVEY.md §3.4).  On TPU the idiomatic form is a
reshape+transpose that XLA fuses into the surrounding convs; there is no
data movement kernel to hand-write for the standalone op.

Channel-order contract (needed for torch checkpoint parity, see
pesr_tpu/convert.py): torch's NCHW pixel_shuffle maps input channel
``c*r*r + i*r + j`` to output channel ``c`` at spatial offset ``(i, j)``.
We keep exactly that order in NHWC:

    out[b, h*r + i, w*r + j, c] == x[b, h, w, c*r*r + i*r + j]

so a converted checkpoint produces bit-identical layouts.
"""

from __future__ import annotations

import jax.numpy as jnp


# Stage factorization helpers live in the jax-free pesr_tpu.scales
# (config/convert import them without touching a backend); re-exported
# here because model code naturally finds them next to pixel_shuffle.
from pesr_tpu.scales import fold_min_halo, upsample_stages  # noqa: F401,E402


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Depth-to-space: [B, H, W, C*r^2] -> [B, H*r, W*r, C] (NHWC)."""
    if r == 1:
        return x
    b, h, w, c_in = x.shape
    if c_in % (r * r) != 0:
        raise ValueError(f"channels {c_in} not divisible by r^2={r * r}")
    c = c_in // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, i, W, j, C
    return x.reshape(b, h * r, w * r, c)


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Space-to-depth inverse: [B, H*r, W*r, C] -> [B, H, W, C*r^2]."""
    if r == 1:
        return x
    b, hr, wr, c = x.shape
    if hr % r or wr % r:
        raise ValueError(f"spatial dims {(hr, wr)} not divisible by r={r}")
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, H, W, C, i, j
    return x.reshape(b, h, w, c * r * r)
