"""On-device fused preprocessing (SURVEY.md §7.4; BASELINE.json:5).

The reference does to-tensor conversion and random flip/rot90 on CPU
loader workers; here the batch crosses host->device as raw uint8 (4x
less PCIe/DMA traffic than float32) and one jitted function performs:

    uint8 -> float [-1,1] -> per-sample dihedral augmentation
    [-> MATLAB-bicubic LR synthesis when no LR files exist]

The dihedral group (8 symmetries = the reference's hflip/vflip/rot90
set) is implemented as three independent per-sample bits (vertical flip,
horizontal flip, transpose) applied with `jnp.where` — no dynamic shapes,
no per-sample control flow, fully vectorized on the VPU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pesr_tpu.ops.resize import imresize


def normalize_uint8(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] -> float32 [-1,1] (the model-space convention)."""
    return x.astype(jnp.float32) / 127.5 - 1.0


def denormalize_to_uint8(x: jnp.ndarray) -> jnp.ndarray:
    """float [-1,1] -> uint8 with round-half-away like MATLAB im2uint8.

    ``floor(y + 0.5)``, NOT ``jnp.round`` — that is round-half-to-EVEN,
    which writes 128 where MATLAB/PIL write 129 for an exact 128.5
    (negative ties are moot: anything below 0.5 clips to 0)."""
    y = (x.astype(jnp.float32) + 1.0) * 127.5
    return jnp.clip(jnp.floor(y + 0.5), 0.0, 255.0).astype(jnp.uint8)


def _dihedral(x: jnp.ndarray, bits: jnp.ndarray) -> jnp.ndarray:
    """Apply per-sample dihedral ops; ``bits`` is [3, B] bool
    (vflip, hflip, transpose).  Requires square spatial dims for the
    transpose bit (training patches are square)."""
    v = bits[0][:, None, None, None]
    h = bits[1][:, None, None, None]
    t = bits[2][:, None, None, None]
    x = jnp.where(v, x[:, ::-1, :, :], x)
    x = jnp.where(h, x[:, :, ::-1, :], x)
    x = jnp.where(t, jnp.swapaxes(x, 1, 2), x)
    return x


def augment_batch(key: jax.Array, lr: jnp.ndarray, hr: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the same random dihedral symmetry to each aligned LR/HR pair."""
    bits = jax.random.bernoulli(key, 0.5, (3, lr.shape[0]))
    return _dihedral(lr, bits), _dihedral(hr, bits)


def prepare_train_batch(key: jax.Array, hr_u8: jnp.ndarray,
                        scale: int,
                        lr_u8: Optional[jnp.ndarray] = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The fused device-side stage: normalize (+ synthesize LR) + augment.

    ``lr_u8=None`` is synthetic-pair mode: LR comes from the on-device
    MATLAB-equivalent bicubic downsample of HR (no uint8 requantization —
    documented deviation from disk-based DIV2K LR, which is quantized).
    Jit this with ``scale`` static; shapes are static per config.
    """
    hr = normalize_uint8(hr_u8)
    if lr_u8 is None:
        p = hr.shape[1] // scale
        lr = imresize(hr, (p, hr.shape[2] // scale))
    else:
        lr = normalize_uint8(lr_u8)
    return augment_batch(key, lr, hr)
