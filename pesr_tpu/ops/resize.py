"""MATLAB-``imresize``-equivalent bicubic resampling, jittable (SURVEY.md §7
"hard parts" item 2).

DIV2K's official LR images are produced with MATLAB ``imresize`` (bicubic
kernel a=-0.5, *antialiased* when downscaling).  PIL, OpenCV, and
``jax.image.resize`` all differ slightly, which is enough to blow the
0.05 dB PSNR-parity budget (BASELINE.md).  This module reimplements the
MATLAB "contributions" algorithm exactly:

  * cubic kernel with a = -0.5,
  * kernel support widened by 1/scale when downscaling (antialias),
  * symmetric (mirrored) edges — MATLAB's ``aux = [1:L, L:-1:1]`` index
    folding — with per-row weight aggregation,
  * separable passes over H then W.

Because output/input sizes are static under jit, the sampling weights are
a compile-time constant (numpy), and each 1-D pass is a dense
``(out_size, in_size)`` matmul — which is exactly what the MXU wants,
instead of the gather-heavy form a CPU implementation would use.

Used by the on-device data pipeline (synthetic LR generation, BASELINE.json:5
"bicubic downsample ... moves to a fused on-device preprocessing stage") and
by eval utilities.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _cubic(x: np.ndarray) -> np.ndarray:
    """MATLAB's bicubic kernel (Keys 1981, a = -0.5)."""
    absx = np.abs(x)
    absx2 = absx * absx
    absx3 = absx2 * absx
    f = (1.5 * absx3 - 2.5 * absx2 + 1.0) * (absx <= 1)
    f += (-0.5 * absx3 + 2.5 * absx2 - 4.0 * absx + 2.0) * \
        ((1 < absx) & (absx <= 2))
    return f


@functools.lru_cache(maxsize=128)
def _contributions(in_size: int, out_size: int,
                   antialias: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """MATLAB imresize 'contributions': per-output-pixel indices+weights.

    Returns (indices [out, P] int32 folded into the input range by
             symmetric mirroring, weights [out, P] float64 row-normalized).
    """
    scale = out_size / in_size
    kernel_width = 4.0
    if scale < 1 and antialias:
        kernel_width /= scale

    # Output-pixel centers mapped to input coordinates (0-based version of
    # MATLAB's u = x/scale + 0.5*(1 - 1/scale) with 1-based x).
    x = np.arange(out_size, dtype=np.float64)
    u = (x + 0.5) / scale - 0.5

    left = np.floor(u - kernel_width / 2).astype(np.int64)
    p = int(np.ceil(kernel_width)) + 2
    indices = left[:, None] + np.arange(p)[None, :]

    dist = u[:, None] - indices
    if scale < 1 and antialias:
        weights = scale * _cubic(scale * dist)
    else:
        weights = _cubic(dist)
    weights /= np.sum(weights, axis=1, keepdims=True)

    # Symmetric (mirrored) edges: MATLAB folds out-of-range taps with
    # aux = [1:L, L:-1:1]; indices = aux(mod(idx-1, 2L)+1).  0-based
    # equivalent below.  Duplicate columns keep their weights and the
    # matmul form (resize_kernel_matrix) sums them, matching MATLAB's
    # aggregation.
    aux = np.concatenate(
        [np.arange(in_size), np.arange(in_size - 1, -1, -1)])
    indices = aux[np.mod(indices, aux.size)]

    # Drop all-zero weight columns (MATLAB does the same compaction).
    nz = ~np.all(weights == 0, axis=0)
    return indices[:, nz].astype(np.int32), weights[:, nz]


@functools.lru_cache(maxsize=128)
def resize_kernel_matrix(in_size: int, out_size: int,
                         antialias: bool = True) -> np.ndarray:
    """Dense (out_size, in_size) float32 resampling matrix for one axis.

    Row i holds the bicubic weights of output pixel i over all input
    pixels.  Dense so the resize becomes an MXU matmul under jit.
    """
    indices, weights = _contributions(in_size, out_size, antialias)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    out_idx = np.repeat(np.arange(out_size), indices.shape[1])
    np.add.at(mat, (out_idx, indices.ravel()), weights.ravel())
    return mat.astype(np.float32)


def imresize(img: jnp.ndarray, out_hw: Tuple[int, int],
             antialias: bool = True) -> jnp.ndarray:
    """MATLAB-equivalent bicubic resize of NHWC (or HWC / HW) images.

    ``out_hw`` must be static under jit.  Computation runs in float32 and
    returns float32 (cast at the call site if needed); values are NOT
    clipped — MATLAB clips only on integer-type output, which callers
    handle at quantization time (pesr_tpu.utils.image_io).
    """
    squeeze_batch = img.ndim == 3
    squeeze_chan = img.ndim == 2
    if squeeze_chan:
        img = img[None, :, :, None]
    elif squeeze_batch:
        img = img[None]
    b, h, w, c = img.shape
    oh, ow = out_hw

    # Full f32 matmul precision: TPU matmuls default to bf16 inputs, which
    # costs ~1e-3 relative error — fatal for the 0.05 dB parity budget.
    hi = jax.lax.Precision.HIGHEST
    x = img.astype(jnp.float32)
    if oh != h:
        mh = jnp.asarray(resize_kernel_matrix(h, oh, antialias))
        # [oh,h] x [B,h,(W*C)] -> einsum over H
        x = jnp.einsum("oh,bhwc->bowc", mh, x, precision=hi)
    if ow != w:
        mw = jnp.asarray(resize_kernel_matrix(w, ow, antialias))
        x = jnp.einsum("ow,bhwc->bhoc", mw, x, precision=hi)

    if squeeze_chan:
        return x[0, :, :, 0]
    if squeeze_batch:
        return x[0]
    return x
