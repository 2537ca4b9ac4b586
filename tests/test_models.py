"""Model construction/forward tests (SURVEY.md §4 unit tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pesr_tpu.models import Discriminator, Generator, VGG19Features


def _count_params(tree):
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


@pytest.mark.parametrize("scale", [2, 3, 4, 8])
def test_generator_output_shape(scale):
    g = Generator(scale=scale, num_blocks=2, num_channels=8,
                  dtype=jnp.float32)
    x = jnp.zeros((2, 12, 10, 3))
    params = g.init(jax.random.key(0), x)
    y = g.apply(params, x)
    assert y.shape == (2, 12 * scale, 10 * scale, 3)
    assert y.dtype == jnp.float32


def test_generator_default_param_count():
    """Default config is the EDSR-scale ~43M-param net (SURVEY.md §2.2)."""
    g = Generator()
    params = jax.eval_shape(
        lambda: g.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3))))
    n = _count_params(params)
    assert 40e6 < n < 46e6, n


def test_generator_residual_path_identity():
    """With res_scale=0 the body is an identity over the head features:
    output equals the (head -> tail+skip -> upsample -> out) path, and
    must be finite and input-dependent."""
    g = Generator(scale=2, num_blocks=3, num_channels=8, res_scale=0.0,
                  dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(1), (1, 6, 6, 3))
    params = g.init(jax.random.key(0), x)
    y1 = g.apply(params, x)
    y2 = g.apply(params, x * 2.0)
    assert np.isfinite(np.asarray(y1)).all()
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_generator_remat_same_params_and_grads():
    """--remat must be a pure memory/FLOPs trade: identical params tree,
    identical outputs, and (numerically) identical gradients."""
    kw = dict(scale=2, num_blocks=3, num_channels=8, dtype=jnp.float32)
    gen = Generator(**kw)
    gen_r = Generator(**kw, remat=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 10, 10, 3)), jnp.float32)
    v = gen.init(jax.random.key(0), x)
    # Same tree structure AND same values from the same init key.
    v_r = gen_r.init(jax.random.key(0), x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), v, v_r)

    np.testing.assert_allclose(np.asarray(gen_r.apply(v, x)),
                               np.asarray(gen.apply(v, x)), atol=1e-6)

    def loss(apply, p):
        return jnp.mean(jnp.abs(apply({"params": p}, x)))

    g = jax.grad(lambda p: loss(gen.apply, p))(v["params"])
    g_r = jax.grad(lambda p: loss(gen_r.apply, p))(v["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5), g, g_r)


def test_discriminator_logits_shape():
    # Narrow schedule: the shape/dtype contract is schedule-independent
    # and the flagship 64..512 widths cost ~12 s of CPU compile alone.
    d = Discriminator(channel_schedule=(8, 8, 16, 16), dense_features=32,
                      dtype=jnp.float32)
    x = jnp.zeros((4, 32, 32, 3))
    params = d.init(jax.random.key(0), x)
    logits = d.apply(params, x)
    assert logits.shape == (4, 1)
    assert logits.dtype == jnp.float32


@pytest.mark.slow
def test_discriminator_spectral_norm_runs():
    d = Discriminator(spectral_norm=True, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(2), (2, 48, 48, 3))
    params = d.init(jax.random.key(0), x)
    logits = d.apply(params, x)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("layer,expected_ch,expected_stride",
                         [("22", 128, 2), ("54", 512, 16)])
def test_vgg_feature_shapes(layer, expected_ch, expected_stride):
    m = VGG19Features(layer=layer, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.key(0), x)
    feats = m.apply(params, x)
    s = 64 // expected_stride
    assert feats.shape == (1, s, s, expected_ch)


def test_generator_unroll_same_params_outputs_and_grads():
    """--unroll_body must be a pure compile-time/runtime trade:
    identical params tree (weights stay stacked), identical outputs,
    and (numerically) identical gradients vs the rolled scan."""
    kw = dict(scale=2, num_blocks=3, num_channels=8, dtype=jnp.float32)
    gen = Generator(**kw)
    gen_u = Generator(**kw, unroll=True)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 10, 10, 3)), jnp.float32)
    v = gen.init(jax.random.key(0), x)
    v_u = gen_u.init(jax.random.key(0), x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), v, v_u)

    np.testing.assert_allclose(np.asarray(gen_u.apply(v, x)),
                               np.asarray(gen.apply(v, x)), atol=1e-6)

    def loss(apply, p):
        return jnp.mean(jnp.abs(apply({"params": p}, x)))

    g = jax.grad(lambda p: loss(gen.apply, p))(v["params"])
    g_u = jax.grad(lambda p: loss(gen_u.apply, p))(v["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5), g, g_u)
