"""MATLAB-bicubic resize numerics (SURVEY.md §7 hard-parts item 2).

Oracles:
  * an independent scalar-loop reimplementation of the MATLAB
    contributions algorithm (catches vectorization/matmul bugs),
  * torch's antialiased bicubic (designed to match PIL/MATLAB) for the
    DIV2K downscale use case,
  * analytic invariants (constant preservation, partition of unity).
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from pesr_tpu.ops import imresize, resize_kernel_matrix
from pesr_tpu.ops.resize import _cubic


def _reference_resize_1d(signal: np.ndarray, out_size: int) -> np.ndarray:
    """Slow scalar-loop MATLAB imresize along axis 0 (float64)."""
    in_size = signal.shape[0]
    scale = out_size / in_size
    kw = 4.0 / scale if scale < 1 else 4.0
    out = np.zeros((out_size,) + signal.shape[1:], np.float64)
    for i in range(out_size):
        u = (i + 0.5) / scale - 0.5
        left = int(np.floor(u - kw / 2))
        idx = np.arange(left, left + int(np.ceil(kw)) + 2)
        if scale < 1:
            w = scale * _cubic(scale * (u - idx))
        else:
            w = _cubic(u - idx)
        w = w / w.sum()
        # MATLAB symmetric mirroring: aux = [1:L, L:-1:1].
        aux = np.concatenate(
            [np.arange(in_size), np.arange(in_size - 1, -1, -1)])
        idx = aux[np.mod(idx, aux.size)]
        out[i] = np.tensordot(w, signal[idx], axes=(0, 0))
    return out


@pytest.mark.parametrize("in_size,out_size", [(12, 3), (17, 5), (8, 32),
                                              (100, 25), (25, 100)])
def test_kernel_matrix_matches_scalar_reference(in_size, out_size):
    rng = np.random.default_rng(0)
    sig = rng.standard_normal((in_size, 3))
    ref = _reference_resize_1d(sig, out_size)
    mat = resize_kernel_matrix(in_size, out_size)
    np.testing.assert_allclose(mat @ sig, ref, atol=1e-5)


def test_partition_of_unity():
    for in_size, out_size in [(64, 16), (16, 64), (37, 11)]:
        mat = resize_kernel_matrix(in_size, out_size)
        np.testing.assert_allclose(mat.sum(axis=1), 1.0, atol=1e-6)


def test_constant_image_preserved():
    img = jnp.full((1, 24, 24, 3), 0.37, jnp.float32)
    out = imresize(img, (6, 6))
    np.testing.assert_allclose(np.asarray(out), 0.37, atol=1e-6)


def test_downscale_matches_torch_antialias_bicubic_interior():
    """DIV2K LR generation path: x4 antialiased downscale.

    Interior pixels must agree with torch's antialiased bicubic to float
    tolerance.  Borders are excluded by design: torch/PIL renormalize
    over in-bounds taps at image edges, while MATLAB (our target
    semantics, used to build DIV2K) mirrors the image symmetrically —
    the two conventions legitimately differ in a ~2-pixel band.
    """
    rng = np.random.default_rng(2)
    img = rng.random((1, 64, 48, 3)).astype(np.float32)

    ours = np.asarray(imresize(jnp.asarray(img), (16, 12)))

    t = torch.from_numpy(img).permute(0, 3, 1, 2)
    ref = torch.nn.functional.interpolate(
        t, size=(16, 12), mode="bicubic", antialias=True,
    ).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(ours[:, 2:-2, 2:-2], ref[:, 2:-2, 2:-2],
                               atol=1e-5)


def test_border_pixels_use_symmetric_mirroring():
    """Border taps must fold symmetrically (MATLAB), not clamp.

    Oracle: extend the signal to infinity by symmetric reflection
    (s[-1-i] = s[i], s[L+i] = s[L-1-i]) and evaluate the raw
    contributions formula for the first/last output pixels directly.
    A clamped implementation gives a measurably different border value
    (~6.8/255 worst case on x4 antialiased downscale per the round-1
    advisor), so this pins the convention.
    """
    rng = np.random.default_rng(7)
    in_size, out_size = 64, 16     # x4 antialiased downscale
    sig = rng.random(in_size)

    def ext(i):
        # Infinite symmetric extension, period 2*in_size.
        i = np.mod(i, 2 * in_size)
        return np.where(i < in_size, i, 2 * in_size - 1 - i)

    scale = out_size / in_size
    kw = 4.0 / scale
    expected = []
    for i in (0, out_size - 1):
        u = (i + 0.5) / scale - 0.5
        left = int(np.floor(u - kw / 2))
        idx = np.arange(left, left + int(np.ceil(kw)) + 2)
        w = scale * _cubic(scale * (u - idx))
        w = w / w.sum()
        expected.append(np.dot(w, sig[ext(idx)]))

    out = resize_kernel_matrix(in_size, out_size) @ sig
    np.testing.assert_allclose([out[0], out[-1]], expected, atol=1e-6)

    # And prove the convention matters: a clamped version must differ.
    clamped = []
    for i in (0,):
        u = (i + 0.5) / scale - 0.5
        left = int(np.floor(u - kw / 2))
        idx = np.arange(left, left + int(np.ceil(kw)) + 2)
        w = scale * _cubic(scale * (u - idx))
        w = w / w.sum()
        clamped.append(np.dot(w, sig[np.clip(idx, 0, in_size - 1)]))
    assert abs(clamped[0] - expected[0]) > 1e-4


def test_shapes_2d_3d_4d():
    img = np.random.default_rng(3).random((20, 30)).astype(np.float32)
    assert imresize(jnp.asarray(img), (10, 15)).shape == (10, 15)
    img3 = img[:, :, None].repeat(3, axis=2)
    assert imresize(jnp.asarray(img3), (10, 15)).shape == (10, 15, 3)
    img4 = img3[None]
    assert imresize(jnp.asarray(img4), (40, 60)).shape == (1, 40, 60, 3)
