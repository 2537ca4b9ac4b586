"""Golden-output regression test (SURVEY.md §4 "golden: generator forward
on a fixed seed/input vs a committed ndarray").

Pins the EXACT numerics of init + forward on CPU float32: any
unintentional change to initializer plumbing, conv conventions,
pixel-shuffle order, residual scaling, or the scan body shows up here as
a diff against the committed array (tests/goldens/, regenerated only by
a deliberate scripted decision).
"""

import pytest
import os

import numpy as np
import jax
import jax.numpy as jnp

from pesr_tpu.models import Generator

_GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                       "generator_forward.npz")


@pytest.mark.slow
def test_generator_forward_matches_committed_golden():
    gen = Generator(scale=4, num_blocks=3, num_channels=12,
                    dtype=jnp.float32)
    x = jnp.asarray(np.linspace(-1, 1, 1 * 10 * 8 * 3,
                                dtype=np.float32).reshape(1, 10, 8, 3))
    variables = gen.init(jax.random.key(1234), x)
    y = np.asarray(gen.apply(variables, x))

    golden = np.load(_GOLDEN)["y"]
    assert y.shape == golden.shape
    np.testing.assert_allclose(y, golden, atol=2e-6)
