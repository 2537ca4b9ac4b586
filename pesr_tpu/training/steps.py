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


def ema_update(ema, params, decay: float):
    """One EMA step: ``ema += (1-decay) * (params - ema)`` per leaf.

    ``decay`` is a Python float closed over at trace time (constant in
    the compiled step — no host->device scalar per step).  Initialize
    ``ema = params`` (no zero-init bias correction needed; the standard
    GAN-SR convention, ESRGAN lineage)."""
    rate = 1.0 - float(decay)
    return jax.tree_util.tree_map(
        lambda e, p: e + rate * (p.astype(e.dtype) - e), ema, params)


def _microbatches(x: jnp.ndarray, accum: int) -> jnp.ndarray:
    """[B, ...] -> [accum, B/accum, ...] for ``lax.scan``.

    Microbatch ``i`` takes every ``accum``-th sample (reshape to
    [B/accum, accum, ...] then swap) rather than contiguous chunks: under
    data-parallel meshes the batch axis is sharded in contiguous
    per-device blocks, and the strided split keeps every microbatch's
    elements on their home devices (each device contributes B/(A*D)
    samples to every microbatch) — a contiguous split would concentrate
    a microbatch on a subset of devices and force a reshard per scan
    iteration."""
    b = x.shape[0]
    if b % accum:
        raise ValueError(f"batch size {b} not divisible by "
                         f"grad_accum={accum}")
    return jnp.swapaxes(x.reshape(b // accum, accum, *x.shape[1:]), 0, 1)


def _accumulate(grad_fn: Callable, params,
                split_xs: Tuple[jnp.ndarray, ...], accum: int):
    """Run ``grad_fn(params, *microbatch)`` over ``accum`` microbatches,
    averaging grads and aux outputs (one grads-tree carry; activations
    live only per microbatch — with ``--remat`` this bounds peak HBM at
    roughly 1/accum of the full-batch step).

    Every array in ``split_xs`` must already carry the [accum, ...]
    leading axis (batches via :func:`_microbatches`, per-microbatch PRNG
    keys via ``jax.random.split``).

    All ``accum`` microbatches go through ONE scan over one traced copy
    of ``grad_fn`` — zero-initialized carries come from ``eval_shape``,
    which costs no compute.  (Peeling the first microbatch out of the
    scan would embed a second full fwd+bwd HLO copy in every step,
    doubling compile time — review finding.)"""

    def micro(carry, mb):
        aux_acc, g_acc = carry
        aux, g = grad_fn(params, *mb)
        return (jax.tree_util.tree_map(jnp.add, aux_acc, aux),
                jax.tree_util.tree_map(jnp.add, g_acc, g)), None

    init = jax.tree_util.tree_map(
        lambda t: jnp.zeros(t.shape, t.dtype),
        jax.eval_shape(grad_fn, params, *(s[0] for s in split_xs)))
    (aux, grads), _ = jax.lax.scan(micro, init, split_xs)
    inv = 1.0 / accum
    return (jax.tree_util.tree_map(lambda a: a * inv, aux),
            jax.tree_util.tree_map(lambda g: g * inv, grads))


def make_pretrain_step(opts: Opts) -> Callable[
        [GanTrainState, jnp.ndarray, jnp.ndarray],
        Tuple[GanTrainState, Metrics]]:
    """Phase-1 L1 pretraining step (BASELINE.json:8, SURVEY.md §3.1).

    With ``--grad_accum A > 1`` the batch is split into A microbatches
    whose grads are averaged before the single optimizer update —
    numerically the full-batch step (pixel losses are per-sample means,
    so mean-of-microbatch-means == batch mean), at ~1/A the activation
    memory.  Pinned by tests/test_grad_accum.py.

    With ``--ema_decay > 0`` the step takes and returns an EMA params
    tree as a second argument: ``step(g_state, ema, lr, hr) ->
    (g_state, ema, metrics)`` — the EMA update rides inside the same
    XLA program (one fused axpy over the params, no extra dispatch)."""
    accum = max(1, int(getattr(opts, "grad_accum", 1)))
    ema_decay = float(getattr(opts, "ema_decay", 0.0))

    def step(g_state: GanTrainState, lr_img: jnp.ndarray,
             hr_img: jnp.ndarray) -> Tuple[GanTrainState, Metrics]:
        def loss_fn(params, lr_mb, hr_mb):
            sr = g_state.apply_fn({"params": params}, lr_mb)
            l1 = losses.l1_loss(sr, hr_mb)
            mse = losses.l2_loss(sr, hr_mb)
            return l1, mse

        if accum == 1:
            (l1, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                g_state.params, lr_img, hr_img)
        else:
            vg = jax.value_and_grad(loss_fn, has_aux=True)

            def grad_fn(params, lr_mb, hr_mb):
                (l1_m, mse_m), g = vg(params, lr_mb, hr_mb)
                return (l1_m, mse_m), g

            (l1, mse), grads = _accumulate(
                grad_fn, g_state.params,
                (_microbatches(lr_img, accum),
                 _microbatches(hr_img, accum)), accum)
        g_state = g_state.apply_gradients(grads=grads)
        return g_state, {"l1": l1, "psnr": _psnr_from_mse(mse)}

    if ema_decay > 0.0:
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step_with_ema(g_state: GanTrainState, ema,
                          lr_img: jnp.ndarray, hr_img: jnp.ndarray):
            g_state, metrics = step(g_state, lr_img, hr_img)
            return (g_state, ema_update(ema, g_state.params, ema_decay),
                    metrics)

        return step_with_ema

    return jax.jit(step, donate_argnums=(0,))


def make_gan_step(opts: Opts, d_apply: Callable, vgg_apply: Callable,
                  ) -> Callable[..., Tuple[GanTrainState, GanTrainState,
                                           Metrics]]:
    """Phase-2 GAN step: D update then G update, one XLA program
    (SURVEY.md §3.2; BASELINE.json:9).

    ``d_apply(params, imgs) -> logits``; ``vgg_apply(params, imgs) ->
    features`` (ignored when ``alpha_vgg == 0``, e.g. before converted
    VGG weights exist — SURVEY.md §7 hard-parts item 1).

    With ``--ema_decay > 0`` the step takes and returns the generator
    EMA tree: ``step(g, d, vgg, ema, lr, hr, rng) -> (g, d, ema,
    metrics)``.
    """
    fns = losses.gan_losses(
        opts.gan_type, opts.fl_gamma if opts.focal_loss else 0.0)
    use_vgg = opts.alpha_vgg > 0.0
    use_l1 = opts.alpha_l1 > 0.0
    # With grad_accum > 1, each phase accumulates over microbatches
    # before its single optimizer update (D on the full batch, then G
    # against the UPDATED D — identical phase ordering to accum=1).
    # GAN-phase accumulation is the standard per-microbatch semantics,
    # NOT bitwise full-batch math: the discriminator's batch-statistics
    # normalization computes mean/var per microbatch, and the
    # relativistic-AVERAGE types (RaSGAN/RaLSGAN) compute E[C(.)] per
    # microbatch — same behavior as torch accumulation with BN.  The
    # divergence is bounded-small (tests/test_grad_accum.py) and the
    # L1 pretrain phase remains exact.  Documented in docs/FLAGS.md.
    accum = max(1, int(getattr(opts, "grad_accum", 1)))
    ema_decay = float(getattr(opts, "ema_decay", 0.0))

    def step(g_state: GanTrainState, d_state: GanTrainState,
             vgg_params: Any, lr_img: jnp.ndarray, hr_img: jnp.ndarray,
             rng: jax.Array) -> Tuple[GanTrainState, GanTrainState, Metrics]:
        # --- Discriminator update (G frozen; SURVEY.md §3.2 "D step") ---
        def d_loss_fn(d_params, sr_detached, hr_mb, rng_mb):
            dr = d_apply(d_params, hr_mb)
            df = d_apply(d_params, sr_detached)
            loss = fns["d"](dr, df)
            if opts.use_gp:
                gp = losses.gradient_penalty(
                    lambda x: d_apply(d_params, x), hr_mb, sr_detached,
                    rng_mb)
                loss = loss + 10.0 * gp
            return loss, loss

        d_vg = jax.value_and_grad(d_loss_fn, has_aux=True)

        # --- Generator loss as a function of sr (not g_params): every
        # G-gradient path flows through sr, so the G grads are one VJP
        # through a SINGLE generator forward — whose value, detached,
        # also feeds the D update (G's params don't change between the
        # phases).  The naive formulation runs the generator body twice
        # (a detached forward for D, then the differentiated primal for
        # G); XLA cannot CSE the two because the differentiable one
        # also stacks residuals for the backward.  Measured on-chip:
        # 7.5-7.8 -> 9.54 steps/s (+25%) at the flagship GAN recipe;
        # grads are the same chain rule, pinned against the two-forward
        # reference in tests/test_grad_accum.py.
        def g_loss_from_sr(sr, d_params, hr_mb):
            dr = d_apply(d_params, hr_mb)
            df = d_apply(d_params, sr)
            gan_l = fns["g"](dr, df)
            tv_l = losses.tv_loss(sr)
            total = opts.alpha_gan * gan_l + opts.alpha_tv * tv_l
            aux = {"g_gan": gan_l, "tv": tv_l}
            if use_vgg:
                f_sr = vgg_apply(vgg_params, sr)
                f_hr = jax.lax.stop_gradient(vgg_apply(vgg_params, hr_mb))
                vgg_l = losses.perceptual_loss(f_sr, f_hr)
                total = total + opts.alpha_vgg * vgg_l
                aux["vgg"] = vgg_l
            if use_l1:
                l1 = losses.l1_loss(sr, hr_mb)
                total = total + opts.alpha_l1 * l1
                aux["l1"] = l1
            aux["mse"] = losses.l2_loss(sr, hr_mb)
            aux["g_loss"] = total
            return total, aux

        sr_vg = jax.value_and_grad(g_loss_from_sr, has_aux=True)

        if accum == 1:
            sr, g_vjp = jax.vjp(
                lambda p: g_state.apply_fn({"params": p}, lr_img),
                g_state.params)
            (_, d_loss), d_grads = d_vg(
                d_state.params, jax.lax.stop_gradient(sr), hr_img, rng)
            d_state = d_state.apply_gradients(grads=d_grads)

            # G update against the JUST-UPDATED D.
            (_, aux), d_sr = sr_vg(sr, d_state.params, hr_img)
            (g_grads,) = g_vjp(d_sr)
        else:
            # Accumulated phases recompute each microbatch's forward
            # ON PURPOSE: holding every microbatch's VJP residuals
            # across the D update would re-materialize the full-batch
            # activations that grad_accum exists to avoid.
            rngs = jax.random.split(rng, accum)

            def d_grad_fn(d_params, lr_mb, hr_mb, rng_mb):
                sr_detached = jax.lax.stop_gradient(
                    g_state.apply_fn({"params": g_state.params}, lr_mb))
                (_, loss), g = d_vg(d_params, sr_detached, hr_mb, rng_mb)
                return loss, g

            d_loss, d_grads = _accumulate(
                d_grad_fn, d_state.params,
                (_microbatches(lr_img, accum),
                 _microbatches(hr_img, accum), rngs), accum)
            d_state = d_state.apply_gradients(grads=d_grads)

            def g_grad_fn(g_params, lr_mb, hr_mb):
                def g_loss_fn(p):
                    sr = g_state.apply_fn({"params": p}, lr_mb)
                    return g_loss_from_sr(sr, d_state.params, hr_mb)

                (_, aux_m), g = jax.value_and_grad(
                    g_loss_fn, has_aux=True)(g_params)
                return aux_m, g

            aux, g_grads = _accumulate(
                g_grad_fn, g_state.params,
                (_microbatches(lr_img, accum),
                 _microbatches(hr_img, accum)), accum)
        g_state = g_state.apply_gradients(grads=g_grads)

        metrics = {"d_loss": d_loss, "g_loss": aux.pop("g_loss"),
                   "psnr": _psnr_from_mse(aux.pop("mse")), **aux}
        return g_state, d_state, metrics

    if ema_decay > 0.0:
        # EMA rides in the same program: step(g, d, vgg, ema, lr, hr,
        # rng) -> (g, d, ema, metrics).  The GAN phase is where EMA
        # earns its keep — the adversarial updates oscillate and the
        # averaged weights are the serving model (ESRGAN lineage).
        @functools.partial(jax.jit, donate_argnums=(0, 1, 3))
        def step_with_ema(g_state: GanTrainState, d_state: GanTrainState,
                          vgg_params: Any, ema, lr_img: jnp.ndarray,
                          hr_img: jnp.ndarray, rng: jax.Array):
            g_state, d_state, metrics = step(
                g_state, d_state, vgg_params, lr_img, hr_img, rng)
            return (g_state, d_state,
                    ema_update(ema, g_state.params, ema_decay), metrics)

        return step_with_ema

    return jax.jit(step, donate_argnums=(0, 1))
