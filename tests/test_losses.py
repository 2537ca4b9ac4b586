"""Loss numerics vs the torch-CPU oracle (SURVEY.md §4 unit tier)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from pesr_tpu import losses


RNG = np.random.default_rng(0)
DR = RNG.standard_normal((8, 1)).astype(np.float32)
DF = RNG.standard_normal((8, 1)).astype(np.float32)


def _torch_bce(x, target):
    t = torch.full_like(x, float(target))
    return F.binary_cross_entropy_with_logits(x, t).item()


@pytest.mark.parametrize("gan_type", ["GAN", "RSGAN", "RaSGAN", "RaLSGAN",
                                      "LSGAN"])
def test_gan_losses_match_torch(gan_type):
    fns = losses.gan_losses(gan_type, focal_gamma=0.0)
    dr_t, df_t = torch.from_numpy(DR), torch.from_numpy(DF)

    if gan_type == "GAN":
        d_ref = _torch_bce(dr_t, 1) + _torch_bce(df_t, 0)
        g_ref = _torch_bce(df_t, 1)
    elif gan_type == "RSGAN":
        d_ref = _torch_bce(dr_t - df_t, 1)
        g_ref = _torch_bce(df_t - dr_t, 1)
    elif gan_type == "RaSGAN":
        d_ref = 0.5 * (_torch_bce(dr_t - df_t.mean(), 1)
                       + _torch_bce(df_t - dr_t.mean(), 0))
        g_ref = 0.5 * (_torch_bce(dr_t - df_t.mean(), 0)
                       + _torch_bce(df_t - dr_t.mean(), 1))
    elif gan_type == "RaLSGAN":
        d_ref = 0.5 * (((dr_t - df_t.mean() - 1) ** 2).mean()
                       + ((df_t - dr_t.mean() + 1) ** 2).mean()).item()
        g_ref = 0.5 * (((dr_t - df_t.mean() + 1) ** 2).mean()
                       + ((df_t - dr_t.mean() - 1) ** 2).mean()).item()
    else:  # LSGAN
        d_ref = (((dr_t - 1) ** 2).mean() + (df_t ** 2).mean()).item()
        g_ref = ((df_t - 1) ** 2).mean().item()

    np.testing.assert_allclose(fns["d"](jnp.asarray(DR), jnp.asarray(DF)),
                               d_ref, rtol=1e-4)
    np.testing.assert_allclose(fns["g"](jnp.asarray(DR), jnp.asarray(DF)),
                               g_ref, rtol=1e-4)


def test_focal_weighting_reduces_easy_examples():
    """Focal loss should down-weight confidently-correct logits more than
    hard ones."""
    easy = jnp.asarray([[6.0]])   # sigmoid ~1, target 1 -> tiny weight
    hard = jnp.asarray([[-6.0]])
    plain = losses._bce_logits(easy, 1.0, 0.0)
    focal = losses._bce_logits(easy, 1.0, 2.0)
    assert focal < plain * 1e-3
    plain_h = losses._bce_logits(hard, 1.0, 0.0)
    focal_h = losses._bce_logits(hard, 1.0, 2.0)
    assert focal_h > 0.9 * plain_h


def test_tv_loss_matches_manual():
    x = RNG.standard_normal((2, 5, 6, 3)).astype(np.float32)
    h = x[:, 1:] - x[:, :-1]
    w = x[:, :, 1:] - x[:, :, :-1]
    ref = 2.0 * ((h * h).mean() + (w * w).mean())
    np.testing.assert_allclose(losses.tv_loss(jnp.asarray(x)), ref,
                               rtol=1e-5)
    assert float(losses.tv_loss(jnp.ones((1, 4, 4, 3)))) == 0.0


def test_l1_matches_torch():
    a = RNG.standard_normal((2, 4, 4, 3)).astype(np.float32)
    b = RNG.standard_normal((2, 4, 4, 3)).astype(np.float32)
    ref = F.l1_loss(torch.from_numpy(a), torch.from_numpy(b)).item()
    np.testing.assert_allclose(losses.l1_loss(jnp.asarray(a),
                                              jnp.asarray(b)), ref,
                               rtol=1e-6)


def test_gradient_penalty_near_zero_for_linear_unit_d():
    """For D(x) = sum over a unit-direction: ||grad|| == 1 -> penalty 0."""
    hr = jnp.asarray(RNG.standard_normal((4, 8, 8, 3)), jnp.float32)
    sr = jnp.asarray(RNG.standard_normal((4, 8, 8, 3)), jnp.float32)
    n = 8 * 8 * 3

    def d_apply(x):
        # gradient of sum(x)/sqrt(n) has L2 norm exactly 1 per sample
        return jnp.sum(x.reshape(x.shape[0], -1), axis=1,
                       keepdims=True) / jnp.sqrt(float(n))

    gp = losses.gradient_penalty(d_apply, hr, sr, jax.random.key(0))
    np.testing.assert_allclose(float(gp), 0.0, atol=1e-9)
