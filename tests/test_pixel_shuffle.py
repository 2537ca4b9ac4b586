"""PixelShuffle parity vs the torch-CPU oracle (SURVEY.md §4 unit tier)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from pesr_tpu.ops import pixel_shuffle, pixel_unshuffle


@pytest.mark.parametrize("r", [1, 2, 3, 4])
def test_matches_torch_pixel_shuffle(r):
    rng = np.random.default_rng(0)
    b, h, w, c = 2, 5, 7, 6
    x = rng.standard_normal((b, h, w, c * r * r)).astype(np.float32)

    ours = np.asarray(pixel_shuffle(jnp.asarray(x), r))

    # torch operates in NCHW; transpose around it.
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = torch.pixel_shuffle(t, r).permute(0, 2, 3, 1).numpy()

    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("r", [2, 4])
def test_unshuffle_inverts_shuffle(r):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 4, 3 * r * r)).astype(np.float32)
    y = pixel_unshuffle(pixel_shuffle(jnp.asarray(x), r), r)
    np.testing.assert_array_equal(np.asarray(y), x)


def test_bad_channel_count_raises():
    with pytest.raises(ValueError):
        pixel_shuffle(jnp.zeros((1, 2, 2, 7)), 2)
