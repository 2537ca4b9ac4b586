"""Determinism tests (SURVEY.md §5.2: the rebuild replaces the
reference's absent race-detection story with fixed-PRNG determinism
guarantees — same seed, same machine => bitwise-same results)."""

import pytest
import dataclasses

import numpy as np
import jax

from pesr_tpu.config import Opts
from pesr_tpu.data import prepare_train_batch
from pesr_tpu.data.datasets import PatchIterator, SyntheticImages
from pesr_tpu.training import create_generator_state, make_pretrain_step
from pesr_tpu.training.loop import build_generator

TINY = Opts(num_blocks=2, num_channels=8, patch_size=8, batch_size=4,
            compute_dtype="float32")


def _run_steps(seed: int, n: int = 3):
    opts = dataclasses.replace(TINY, seed=seed)
    src = SyntheticImages(4, 64, 64, seed=opts.seed)
    it = PatchIterator(src, opts.patch_size, opts.scale, opts.batch_size,
                       seed=opts.seed)
    g_state = create_generator_state(opts, build_generator(opts),
                                     jax.random.key(opts.seed))
    step = make_pretrain_step(opts)
    rng = jax.random.key(opts.seed)
    losses = []
    for _ in range(n):
        _, hr = next(it)
        rng, key = jax.random.split(rng)
        lr_img, hr_img = prepare_train_batch(key, hr, scale=opts.scale)
        g_state, m = step(g_state, lr_img, hr_img)
        losses.append(float(m["l1"]))
    return losses, jax.device_get(g_state.params)


@pytest.mark.slow
def test_training_bitwise_deterministic():
    l1, p1 = _run_steps(seed=3)
    l2, p2 = _run_steps(seed=3)
    assert l1 == l2
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_different_seeds_diverge():
    l1, _ = _run_steps(seed=3)
    l2, _ = _run_steps(seed=4)
    assert l1 != l2
