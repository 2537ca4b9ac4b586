"""Loss library (SURVEY.md §2 item 6, §3.2).

Components the reference composes in its generator/discriminator
objectives (reconstructed; confidences per SURVEY.md):

  * L1 pixel loss — the phase-1 "pretrain" objective (BASELINE.json:8).
  * VGG perceptual loss — distance between frozen VGG-19 features of SR
    and HR (BASELINE.json:9).
  * Relativistic GAN family — the reference exposes a ``gan_type`` flag;
    we implement GAN / LSGAN / RSGAN / RaSGAN / RaLSGAN with
    BCE-with-logits applied externally to the sigmoid-free discriminator.
  * Total-variation loss on the SR output.
  * Optional focal re-weighting of the GAN BCE and a WGAN-style gradient
    penalty (the reference's ``--focal_loss`` / ``--GP`` flags).

All losses are pure functions returning scalars in float32; they are
composed inside the single jitted train step (pesr_tpu/training).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp


Array = jnp.ndarray


# --------------------------------------------------------------------------
# Pixel losses
# --------------------------------------------------------------------------


def l1_loss(sr: Array, hr: Array) -> Array:
    return jnp.mean(jnp.abs(sr.astype(jnp.float32) - hr.astype(jnp.float32)))


def l2_loss(sr: Array, hr: Array) -> Array:
    d = sr.astype(jnp.float32) - hr.astype(jnp.float32)
    return jnp.mean(d * d)


def tv_loss(x: Array) -> Array:
    """Total variation (squared-difference form, per-count normalized —
    the common torch TVLoss convention used by perceptual-SR repos)."""
    xf = x.astype(jnp.float32)
    h_diff = xf[:, 1:, :, :] - xf[:, :-1, :, :]
    w_diff = xf[:, :, 1:, :] - xf[:, :, :-1, :]
    return 2.0 * (jnp.mean(h_diff * h_diff) + jnp.mean(w_diff * w_diff))


def perceptual_loss(feat_sr: Array, feat_hr: Array,
                    criterion: str = "l1") -> Array:
    """Distance between (already-extracted) VGG features."""
    if criterion == "l1":
        return l1_loss(feat_sr, feat_hr)
    return l2_loss(feat_sr, feat_hr)


# --------------------------------------------------------------------------
# GAN losses
# --------------------------------------------------------------------------


def _bce_logits(logits: Array, target: float, focal_gamma: float) -> Array:
    """Mean BCE-with-logits vs a constant target, with optional focal
    re-weighting (w = (1 - p_correct)^gamma, stop-gradient on the weight)."""
    x = logits.astype(jnp.float32)
    t = jnp.full_like(x, target)
    # Numerically-stable BCE-with-logits.
    bce = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if focal_gamma > 0.0:
        p = jax.nn.sigmoid(x)
        p_correct = jnp.where(t > 0.5, p, 1.0 - p)
        w = jax.lax.stop_gradient((1.0 - p_correct) ** focal_gamma)
        bce = w * bce
    return jnp.mean(bce)


def gan_losses(gan_type: str, focal_gamma: float = 0.0
               ) -> Dict[str, Callable[[Array, Array], Array]]:
    """Return {'d': fn, 'g': fn}, each fn(d_real_logits, d_fake_logits).

    Conventions (SURVEY.md §2 item 6): the discriminator has no sigmoid;
    relativistic variants compare real/fake logits (pairwise for RSGAN,
    against the batch mean for Ra*).
    """
    g = focal_gamma

    if gan_type == "GAN":
        def d_loss(dr, df):
            return _bce_logits(dr, 1.0, g) + _bce_logits(df, 0.0, g)

        def g_loss(dr, df):
            del dr
            return _bce_logits(df, 1.0, g)

    elif gan_type == "LSGAN":
        def d_loss(dr, df):
            return (l2_loss(dr, jnp.ones_like(dr))
                    + l2_loss(df, jnp.zeros_like(df)))

        def g_loss(dr, df):
            del dr
            return l2_loss(df, jnp.ones_like(df))

    elif gan_type == "RSGAN":
        def d_loss(dr, df):
            return _bce_logits(dr - df, 1.0, g)

        def g_loss(dr, df):
            return _bce_logits(df - dr, 1.0, g)

    elif gan_type == "RaSGAN":
        def d_loss(dr, df):
            return 0.5 * (_bce_logits(dr - jnp.mean(df), 1.0, g)
                          + _bce_logits(df - jnp.mean(dr), 0.0, g))

        def g_loss(dr, df):
            return 0.5 * (_bce_logits(dr - jnp.mean(df), 0.0, g)
                          + _bce_logits(df - jnp.mean(dr), 1.0, g))

    elif gan_type == "RaLSGAN":
        def d_loss(dr, df):
            return 0.5 * (jnp.mean((dr - jnp.mean(df) - 1.0) ** 2)
                          + jnp.mean((df - jnp.mean(dr) + 1.0) ** 2))

        def g_loss(dr, df):
            return 0.5 * (jnp.mean((dr - jnp.mean(df) + 1.0) ** 2)
                          + jnp.mean((df - jnp.mean(dr) - 1.0) ** 2))

    else:
        raise ValueError(f"unknown gan_type {gan_type!r}")

    return {"d": d_loss, "g": g_loss}


def gradient_penalty(d_apply: Callable[[Array], Array], hr: Array,
                     sr: Array, rng: jax.Array) -> Array:
    """WGAN-GP-style penalty on interpolates: E[(||grad D(x_hat)|| - 1)^2].

    ``d_apply`` maps images -> logits with D's params already bound.
    """
    eps = jax.random.uniform(rng, (hr.shape[0], 1, 1, 1), jnp.float32)
    x_hat = eps * hr.astype(jnp.float32) + (1.0 - eps) * sr.astype(jnp.float32)

    def scalar_d(x):
        return jnp.sum(d_apply(x))

    grads = jax.grad(scalar_d)(x_hat)
    norms = jnp.sqrt(jnp.sum(grads * grads, axis=(1, 2, 3)) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)
