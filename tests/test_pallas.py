"""Pallas kernel numerics-parity tests (SURVEY.md §4 unit tier: "Pallas
conv vs lax.conv").  On the CPU test mesh kernels run in interpreter
mode; the same parity asserts run compiled on real TPU via bench/verify.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pesr_tpu.ops.pallas import fused_resblock, resblock_reference


def _make(c=8, b=2, h=20, w=24, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype)
    w1 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, dtype)
    b1 = jnp.asarray(rng.standard_normal((c,)) * 0.1, dtype)
    w2 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, dtype)
    b2 = jnp.asarray(rng.standard_normal((c,)) * 0.1, dtype)
    return x, w1, b1, w2, b2


def test_fused_resblock_matches_reference_exact_tiles():
    x, w1, b1, w2, b2 = _make(h=16, w=16)
    got = fused_resblock(x, w1, b1, w2, b2, res_scale=0.1, tile=(8, 8),
                         interpret=True)
    ref = resblock_reference(x, w1, b1, w2, b2, res_scale=0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5)


def test_fused_resblock_ragged_tiles_and_edges():
    """Image size not divisible by the tile: the zero-pad fringe must not
    leak into real pixels, and SAME boundary semantics must hold."""
    x, w1, b1, w2, b2 = _make(h=19, w=23)
    got = fused_resblock(x, w1, b1, w2, b2, res_scale=0.3, tile=(8, 8),
                         interpret=True)
    ref = resblock_reference(x, w1, b1, w2, b2, res_scale=0.3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5)


def test_fused_resblock_single_tile_covers_image():
    x, w1, b1, w2, b2 = _make(h=10, w=12)
    got = fused_resblock(x, w1, b1, w2, b2, tile=(16, 16), interpret=True)
    ref = resblock_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5)


def test_fused_upsampler_matches_reference():
    from pesr_tpu.ops.pallas import (fused_upsampler_stage,
                                     upsampler_stage_reference)
    c = 8
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 11, 14, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, c, 4 * c)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((4 * c,)) * 0.1, jnp.float32)
    got = fused_upsampler_stage(x, w, b, tile=(8, 8), interpret=True)
    ref = upsampler_stage_reference(x, w, b)
    assert got.shape == (2, 22, 28, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5)


def test_fused_upsampler_multi_chunk_channels():
    """C > 128 exercises the channel-chunk grid dimension (the Mosaic
    strided-store path that broke at the flagship width)."""
    from pesr_tpu.ops.pallas import (fused_upsampler_stage,
                                     upsampler_stage_reference)
    c = 256
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, c, 4 * c)) * 0.05,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((4 * c,)) * 0.05, jnp.float32)
    got = fused_upsampler_stage(x, w, b, tile=(8, 8), interpret=True)
    ref = upsampler_stage_reference(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5)


def test_fused_upsampler_matches_torch_pixel_shuffle_order():
    """End-to-end channel-order check against torch (conv + PixelShuffle),
    so converted checkpoints stay exact through the fused stage."""
    import torch
    c = 4
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 6, 6, c)).astype(np.float32)
    w = (rng.standard_normal((3, 3, c, 4 * c)) * 0.2).astype(np.float32)
    b = (rng.standard_normal((4 * c,)) * 0.1).astype(np.float32)

    from pesr_tpu.ops.pallas import fused_upsampler_stage
    ours = np.asarray(fused_upsampler_stage(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), tile=(8, 8),
        interpret=True))

    with torch.no_grad():
        conv = torch.nn.Conv2d(c, 4 * c, 3, padding=1)
        conv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1)))
        conv.bias.copy_(torch.from_numpy(b))
        t = conv(torch.from_numpy(x).permute(0, 3, 1, 2))
        ref = torch.pixel_shuffle(t, 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.slow
def test_pallas_apply_matches_generator_apply():
    """The full --use_pallas inference path must reproduce
    models.Generator.apply on the same params tree."""
    from pesr_tpu.models import Generator
    from pesr_tpu.models.pallas_apply import make_pallas_apply

    gen = Generator(scale=2, num_blocks=3, num_channels=8,
                    dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(5).standard_normal(
        (1, 14, 18, 3)), jnp.float32)
    variables = gen.init(jax.random.key(0), x)

    ref = gen.apply(variables, x)
    pal = make_pallas_apply(scale=2, res_scale=0.1, dtype=jnp.float32,
                            tile=(8, 8), interpret=True)(variables, x)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                               atol=3e-5)


def test_fused_resblock_grads_match_reference():
    """custom_vjp tier: d/d{x, w1, b1, w2, b2} of the fused kernel must
    equal jax.grad of the XLA reference (the backward IS the reference
    transpose, recomputed — so this pins the wiring, residual order, and
    nondiff-arg plumbing)."""
    x, w1, b1, w2, b2 = _make(h=13, w=10)

    def loss_pallas(x, w1, b1, w2, b2):
        out = fused_resblock(x, w1, b1, w2, b2, res_scale=0.3,
                             tile=(8, 8), interpret=True)
        return jnp.sum(jnp.sin(out))  # non-trivial cotangent

    def loss_ref(x, w1, b1, w2, b2):
        return jnp.sum(jnp.sin(resblock_reference(x, w1, b1, w2, b2,
                                                  res_scale=0.3)))

    got = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-5, rtol=1e-4)


def test_fused_upsampler_grads_match_reference():
    from pesr_tpu.ops.pallas import (fused_upsampler_stage,
                                     upsampler_stage_reference)
    c = 8
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((1, 9, 7, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, c, 4 * c)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((4 * c,)) * 0.1, jnp.float32)

    def loss_pallas(x, w, b):
        return jnp.sum(jnp.cos(fused_upsampler_stage(
            x, w, b, tile=(8, 8), interpret=True)))

    def loss_ref(x, w, b):
        return jnp.sum(jnp.cos(upsampler_stage_reference(x, w, b)))

    got = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-5, rtol=1e-4)


def test_pallas_train_step_matches_xla_train_step():
    """--use_pallas in TRAINING: one L1 pretrain step through the Pallas
    apply_fn must produce the same loss and (numerically) the same
    updated params as the flax Generator apply on identical init."""
    from pesr_tpu.models import Generator
    from pesr_tpu.models.pallas_apply import make_pallas_apply
    import optax

    gen = Generator(scale=2, num_blocks=2, num_channels=8,
                    dtype=jnp.float32)
    rng = np.random.default_rng(13)
    lr_img = jnp.asarray(rng.standard_normal((2, 10, 10, 3)) * 0.5,
                         jnp.float32)
    hr_img = jnp.asarray(rng.standard_normal((2, 20, 20, 3)) * 0.5,
                         jnp.float32)
    variables = gen.init(jax.random.key(0), lr_img)
    pallas_apply = make_pallas_apply(scale=2, res_scale=0.1,
                                     dtype=jnp.float32, tile=(8, 8),
                                     interpret=True)

    def one_step(apply_fn, params):
        def loss_fn(p):
            sr = apply_fn({"params": p}, lr_img)
            return jnp.mean(jnp.abs(sr - hr_img))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        tx = optax.sgd(1e-2)
        updates, _ = tx.update(grads, tx.init(params), params)
        return loss, optax.apply_updates(params, updates)

    loss_p, params_p = one_step(pallas_apply, variables["params"])
    loss_x, params_x = one_step(
        lambda v, x: gen.apply(v, x), variables["params"])
    np.testing.assert_allclose(float(loss_p), float(loss_x), atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4),
        params_p, params_x)


def test_fused_resblock_chain_matches_generator_body():
    """Scanning the kernel over stacked per-block weights must equal the
    XLA reference chained the same way (the generator-body use case)."""
    c, nblocks = 8, 3
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 12, 12, c)), jnp.float32)
    stk = lambda *shape: jnp.asarray(  # noqa: E731
        rng.standard_normal((nblocks,) + shape) * 0.1, jnp.float32)
    w1s, b1s = stk(3, 3, c, c), stk(c)
    w2s, b2s = stk(3, 3, c, c), stk(c)

    y_kernel = x
    y_ref = x
    for i in range(nblocks):
        y_kernel = fused_resblock(y_kernel, w1s[i], b1s[i], w2s[i], b2s[i],
                                  tile=(8, 8), interpret=True)
        y_ref = resblock_reference(y_ref, w1s[i], b1s[i], w2s[i], b2s[i])
    np.testing.assert_allclose(np.asarray(y_kernel), np.asarray(y_ref),
                               atol=3e-5)
