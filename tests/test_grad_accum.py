"""--grad_accum: in-step microbatch gradient accumulation
(training/steps.py _accumulate/_microbatches; docs/FLAGS.md).

The contract: grad_accum=N is ONE optimizer update on grads averaged
over N microbatches.  For per-sample losses that is exactly the
full-batch step (mean of microbatch means == batch mean), so the
equivalence tests here demand near-bitwise parameter agreement; the
relativistic-average GAN types legitimately differ (E[C] per
microbatch) and get a finiteness/updates test instead.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pesr_tpu.config import Opts, opts_from_args
from pesr_tpu.models import VGG19Features
from pesr_tpu.training import (create_discriminator_state,
                               create_generator_state, make_gan_step,
                               make_pretrain_step)
from pesr_tpu.training.loop import build_discriminator, build_generator
from pesr_tpu.training.state import init_vgg_params

TINY = Opts(num_blocks=2, num_channels=8, patch_size=12, batch_size=8,
            compute_dtype="float32", steps_per_epoch=10,
            alpha_vgg=1.0, alpha_tv=1e-6, alpha_gan=1.0)


def _batch(opts, seed=0):
    rng = np.random.default_rng(seed)
    hr = np.tanh(rng.standard_normal(
        (opts.batch_size, opts.hr_patch_size, opts.hr_patch_size, 3)
    ).astype(np.float32))
    lr = hr[:, ::opts.scale, ::opts.scale]
    return jnp.asarray(lr), jnp.asarray(hr)


def _tree_allclose(a, b, atol):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    return max(float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
               for x, y in zip(flat_a, flat_b)) <= atol


def _run_pretrain(accum, steps=3):
    opts = dataclasses.replace(TINY, grad_accum=accum, learning_rate=1e-3)
    g_state = create_generator_state(opts, build_generator(opts),
                                     jax.random.key(0))
    step = make_pretrain_step(opts)
    for i in range(steps):
        lr, hr = _batch(opts, seed=i)
        g_state, metrics = step(g_state, lr, hr)
    return jax.device_get(g_state.params), {k: float(v)
                                            for k, v in metrics.items()}


def test_pretrain_accum_matches_full_batch():
    """L1 is a per-sample mean: accum=4 must reproduce the accum=1 step
    up to float reassociation."""
    p1, m1 = _run_pretrain(1)
    p4, m4 = _run_pretrain(4)
    assert _tree_allclose(p1, p4, atol=2e-5)
    assert abs(m1["l1"] - m4["l1"]) < 1e-5


def _gan_states(opts):
    gen, disc = build_generator(opts), build_discriminator(opts)
    vgg = VGG19Features(layer="22", dtype=jnp.float32)
    g_state = create_generator_state(opts, gen, jax.random.key(0))
    d_state = create_discriminator_state(opts, disc, jax.random.key(1))
    vgg_params = init_vgg_params(opts, vgg, jax.random.key(2))
    step = make_gan_step(
        opts,
        d_apply=lambda p, x: disc.apply({"params": p}, x),
        vgg_apply=lambda p, x: vgg.apply({"params": p}, x))
    return g_state, d_state, vgg_params, step


def _run_gan(opts, steps=2):
    g_state, d_state, vgg_params, step = _gan_states(opts)
    for i in range(steps):
        lr, hr = _batch(opts, seed=i)
        g_state, d_state, metrics = step(g_state, d_state, vgg_params,
                                         lr, hr, jax.random.key(10 + i))
    return (jax.device_get(g_state.params), jax.device_get(d_state.params),
            {k: float(v) for k, v in metrics.items()})


@pytest.mark.slow
def test_gan_accum_stays_close_to_full_batch():
    """GAN-phase accumulation is per-microbatch semantics, not bitwise:
    the discriminator's batch-stat normalization computes mean/var per
    microbatch (the torch-BN-accumulation behavior).  RSGAN itself pairs
    logits sample-for-sample, so the remaining divergence is the norm
    statistics alone — pin it bounded-small (measured ~4e-4 max param
    delta after 2 steps at lr 1e-4) so a real regression (wrong grads,
    missing 1/N) cannot hide behind the documented approximation."""
    base = dataclasses.replace(TINY, gan_type="RSGAN")
    g1, d1, m1 = _run_gan(base)
    g2, d2, m2 = _run_gan(dataclasses.replace(base, grad_accum=2))
    assert _tree_allclose(g1, g2, atol=2e-3)
    assert _tree_allclose(d1, d2, atol=2e-3)
    assert abs(m1["g_loss"] - m2["g_loss"]) < 0.3, (m1, m2)
    assert abs(m1["psnr"] - m2["psnr"]) < 0.05, (m1, m2)


@pytest.mark.slow
def test_gan_accum_relativistic_average_updates_and_is_finite():
    """RaSGAN's E[C] is per-microbatch under accumulation (documented
    approximation): the step must still update both nets finitely."""
    opts = dataclasses.replace(TINY, gan_type="RaSGAN", grad_accum=4)
    g_state, d_state, vgg_params, step = _gan_states(opts)
    g0 = jax.device_get(g_state.params)
    d0 = jax.device_get(d_state.params)
    lr, hr = _batch(opts)
    g_state, d_state, metrics = step(g_state, d_state, vgg_params, lr, hr,
                                     jax.random.key(3))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    assert not _tree_allclose(g0, jax.device_get(g_state.params), atol=0.0)
    assert not _tree_allclose(d0, jax.device_get(d_state.params), atol=0.0)


def test_pretrain_accum_dp_mesh_matches_single_device():
    """Strided microbatching must keep DP shards local AND reproduce the
    single-device numbers on the 8-device virtual mesh."""
    from pesr_tpu.parallel import make_mesh, shard_batch, \
        shard_pytree_replicated
    opts = dataclasses.replace(TINY, grad_accum=2, learning_rate=1e-3)
    lr, hr = _batch(opts)

    ref_state = create_generator_state(opts, build_generator(opts),
                                       jax.random.key(0))
    step = make_pretrain_step(opts)
    ref_state, ref_m = step(ref_state, lr, hr)

    mesh = make_mesh(8)
    dp_state = create_generator_state(opts, build_generator(opts),
                                      jax.random.key(0))
    dp_state = shard_pytree_replicated(mesh, dp_state)
    dp_state, dp_m = step(dp_state, shard_batch(mesh, np.asarray(lr)),
                          shard_batch(mesh, np.asarray(hr)))
    assert abs(float(ref_m["l1"]) - float(dp_m["l1"])) < 1e-6
    assert _tree_allclose(jax.device_get(ref_state.params),
                          jax.device_get(dp_state.params), atol=2e-5)


def test_grad_accum_cli_validation():
    with pytest.raises(SystemExit):
        opts_from_args(("--batch_size", "8", "--grad_accum", "3"),
                       mode="train")
    with pytest.raises(SystemExit):
        opts_from_args(("--grad_accum", "0"), mode="train")
    opts = opts_from_args(("--batch_size", "8", "--grad_accum", "4"),
                          mode="train")
    assert opts.grad_accum == 4


def test_microbatch_split_is_strided():
    from pesr_tpu.training.steps import _microbatches
    x = jnp.arange(8)
    mb = np.asarray(_microbatches(x, 4))
    assert mb.shape == (4, 2)
    # microbatch i = samples {i, i+accum}: every device's contiguous DP
    # shard contributes equally to every microbatch
    np.testing.assert_array_equal(mb[0], [0, 4])
    np.testing.assert_array_equal(mb[3], [3, 7])
    with pytest.raises(ValueError):
        _microbatches(x, 3)


@pytest.mark.slow
def test_gan_step_single_forward_matches_two_forward_reference():
    """The production GAN step computes ONE generator forward (jax.vjp)
    whose value feeds the D update detached and whose residuals back
    the G update.  The chain rule is identical to the naive two-forward
    formulation; pin the whole step (both nets' updated params +
    metrics) against a test-local naive implementation."""
    from pesr_tpu import losses

    opts = dataclasses.replace(TINY, gan_type="RaSGAN")
    g_state, d_state, vgg_params, step = _gan_states(opts)
    g_ref = create_generator_state(opts, build_generator(opts),
                                   jax.random.key(0))
    d_ref = create_discriminator_state(opts, build_discriminator(opts),
                                       jax.random.key(1))
    disc = build_discriminator(opts)
    vgg = VGG19Features(layer="22", dtype=jnp.float32)
    d_apply = lambda p, x: disc.apply({"params": p}, x)  # noqa: E731
    vgg_apply = lambda p, x: vgg.apply({"params": p}, x)  # noqa: E731
    fns = losses.gan_losses(opts.gan_type, 0.0)

    def naive_step(g_state, d_state, lr_img, hr_img):
        def d_loss_fn(d_params):
            sr_d = jax.lax.stop_gradient(
                g_state.apply_fn({"params": g_state.params}, lr_img))
            return fns["d"](d_apply(d_params, hr_img),
                            d_apply(d_params, sr_d))

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_state.params)
        d_state = d_state.apply_gradients(grads=d_grads)

        def g_loss_fn(g_params):
            sr = g_state.apply_fn({"params": g_params}, lr_img)
            gan_l = fns["g"](d_apply(d_state.params, hr_img),
                             d_apply(d_state.params, sr))
            tv_l = losses.tv_loss(sr)
            vgg_l = losses.perceptual_loss(
                vgg_apply(vgg_params, sr),
                jax.lax.stop_gradient(vgg_apply(vgg_params, hr_img)))
            return (opts.alpha_gan * gan_l + opts.alpha_tv * tv_l
                    + opts.alpha_vgg * vgg_l)

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(g_state.params)
        g_state = g_state.apply_gradients(grads=g_grads)
        return g_state, d_state, d_loss, g_loss

    lr, hr = _batch(opts)
    g_new, d_new, metrics = step(g_state, d_state, vgg_params, lr, hr,
                                 jax.random.key(7))
    g_naive, d_naive, d_loss, g_loss = jax.jit(naive_step)(
        g_ref, d_ref, lr, hr)

    assert abs(float(metrics["d_loss"]) - float(d_loss)) < 1e-5
    assert abs(float(metrics["g_loss"]) - float(g_loss)) < 1e-4
    assert _tree_allclose(jax.device_get(g_new.params),
                          jax.device_get(g_naive.params), atol=1e-5)
    assert _tree_allclose(jax.device_get(d_new.params),
                          jax.device_get(d_naive.params), atol=1e-5)
