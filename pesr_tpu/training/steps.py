"""Single-jit train steps (SURVEY.md §3.1/§3.2; BASELINE.json:5 "the
relativistic-average GAN training loop ... compiles to a single XLA train
step, data-parallel over ICI").

The reference's GAN iteration launches ~five separate network executions
per batch (G fwd, D fwd x2 for the D step, D fwd x2 + VGG fwd x2 for the
G step) from Python.  Here each phase is ONE jitted function: XLA sees
the whole step, CSEs the shared G forward between the D- and G-updates'
primals, fuses elementwise loss math into the surrounding convs, and
inserts the gradient ``psum`` over the mesh's data axis automatically.

Sharding contract: batch arrays arrive sharded along axis 0
(parallel.batch_sharding); states/params are replicated.  Both train
states are donated — G+D+optimizer memory is rewritten in place.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from pesr_tpu import losses
from pesr_tpu.config import Opts
from pesr_tpu.training.state import GanTrainState

Metrics = Dict[str, jnp.ndarray]


def _psnr_from_mse(mse: jnp.ndarray) -> jnp.ndarray:
    """PSNR over the model's [-1,1] range mapped to [0,1] (peak 1.0)."""
    return -10.0 * jnp.log10(jnp.maximum(mse / 4.0, 1e-12))


def make_pretrain_step(opts: Opts) -> Callable[
        [GanTrainState, jnp.ndarray, jnp.ndarray],
        Tuple[GanTrainState, Metrics]]:
    """Phase-1 L1 pretraining step (BASELINE.json:8, SURVEY.md §3.1)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(g_state: GanTrainState, lr_img: jnp.ndarray,
             hr_img: jnp.ndarray) -> Tuple[GanTrainState, Metrics]:
        def loss_fn(params):
            sr = g_state.apply_fn({"params": params}, lr_img)
            l1 = losses.l1_loss(sr, hr_img)
            mse = losses.l2_loss(sr, hr_img)
            return l1, mse

        (l1, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            g_state.params)
        g_state = g_state.apply_gradients(grads=grads)
        return g_state, {"l1": l1, "psnr": _psnr_from_mse(mse)}

    return step


def make_gan_step(opts: Opts, d_apply: Callable, vgg_apply: Callable,
                  ) -> Callable[..., Tuple[GanTrainState, GanTrainState,
                                           Metrics]]:
    """Phase-2 GAN step: D update then G update, one XLA program
    (SURVEY.md §3.2; BASELINE.json:9).

    ``d_apply(params, imgs) -> logits``; ``vgg_apply(params, imgs) ->
    features`` (ignored when ``alpha_vgg == 0``, e.g. before converted
    VGG weights exist — SURVEY.md §7 hard-parts item 1).
    """
    fns = losses.gan_losses(
        opts.gan_type, opts.fl_gamma if opts.focal_loss else 0.0)
    use_vgg = opts.alpha_vgg > 0.0
    use_l1 = opts.alpha_l1 > 0.0

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(g_state: GanTrainState, d_state: GanTrainState,
             vgg_params: Any, lr_img: jnp.ndarray, hr_img: jnp.ndarray,
             rng: jax.Array) -> Tuple[GanTrainState, GanTrainState, Metrics]:
        # --- Discriminator update (G frozen; SURVEY.md §3.2 "D step") ---
        sr_detached = jax.lax.stop_gradient(
            g_state.apply_fn({"params": g_state.params}, lr_img))

        def d_loss_fn(d_params):
            dr = d_apply(d_params, hr_img)
            df = d_apply(d_params, sr_detached)
            loss = fns["d"](dr, df)
            if opts.use_gp:
                gp = losses.gradient_penalty(
                    lambda x: d_apply(d_params, x), hr_img, sr_detached, rng)
                loss = loss + 10.0 * gp
            return loss

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_state.params)
        d_state = d_state.apply_gradients(grads=d_grads)

        # --- Generator update (uses the just-updated D) ---
        def g_loss_fn(g_params):
            sr = g_state.apply_fn({"params": g_params}, lr_img)
            dr = d_apply(d_state.params, hr_img)
            df = d_apply(d_state.params, sr)
            gan_l = fns["g"](dr, df)
            tv_l = losses.tv_loss(sr)
            total = opts.alpha_gan * gan_l + opts.alpha_tv * tv_l
            aux = {"g_gan": gan_l, "tv": tv_l}
            if use_vgg:
                f_sr = vgg_apply(vgg_params, sr)
                f_hr = jax.lax.stop_gradient(vgg_apply(vgg_params, hr_img))
                vgg_l = losses.perceptual_loss(f_sr, f_hr)
                total = total + opts.alpha_vgg * vgg_l
                aux["vgg"] = vgg_l
            if use_l1:
                l1 = losses.l1_loss(sr, hr_img)
                total = total + opts.alpha_l1 * l1
                aux["l1"] = l1
            aux["mse"] = losses.l2_loss(sr, hr_img)
            return total, aux

        (g_loss, aux), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_state.params)
        g_state = g_state.apply_gradients(grads=g_grads)

        metrics = {"d_loss": d_loss, "g_loss": g_loss,
                   "psnr": _psnr_from_mse(aux.pop("mse")), **aux}
        return g_state, d_state, metrics

    return step
