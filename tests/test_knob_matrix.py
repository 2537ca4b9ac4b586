"""Training-knob interaction matrix (round-3 verdict #7; docs/FLAGS.md).

The training knobs {--fold_train, --unroll_body, --remat, --grad_accum,
--ema_decay} compose into a matrix the docs describe but nothing swept:
a new knob could silently corrupt an existing combination.  This sweep
runs EVERY combination for two steps of each phase through the
PRODUCTION wiring (loop.configure_generator_apply + the real step
factories) and pins the updated params against the all-knobs-off
baseline with a combo-dependent tolerance class:

Every combo is compared against the baseline with MATCHING fold_train
(plain baseline or fold-alone baseline): --fold_train legitimately
changes the gradients at patch borders (one-shot zero padding,
FLAGS.md), so fold-vs-plain is pinned once, separately, with the
documented-divergence bound, while the knob INTERACTIONS — the thing
this matrix exists for — are pinned in tight classes:

- EXACT — remat / unroll_body / ema_decay in any mix: documented as
  "identical params/outputs/grads"; pinned to float-reassociation noise.
- ACCUM — + grad_accum=2: exact for the per-sample pretrain loss up to
  reassociation (2e-5 class, tests/test_grad_accum.py), bounded for the
  GAN phase (per-microbatch batch-stat/E[C] semantics).

Documented incompatibilities must fail LOUDLY, not silently pick one:
--use_pallas + --fold_train raises (pinned below).
"""

import dataclasses
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pesr_tpu.config import Opts
from pesr_tpu.models import VGG19Features
from pesr_tpu.training import (create_discriminator_state,
                               create_generator_state, make_gan_step,
                               make_pretrain_step)
from pesr_tpu.training.loop import (build_discriminator, build_generator,
                                    configure_generator_apply)
from pesr_tpu.training.state import init_vgg_params

TINY = Opts(num_blocks=2, num_channels=8, patch_size=12, batch_size=8,
            compute_dtype="float32", steps_per_epoch=10,
            learning_rate=1e-3, alpha_vgg=1.0, alpha_tv=1e-6,
            alpha_gan=1.0, gan_type="RSGAN")

# fold_train, unroll_body, remat, grad_accum, ema_decay — full matrix.
MATRIX = [
    dict(fold_train=f, unroll_body=u, remat=r, grad_accum=a, ema_decay=e)
    for f, u, r, a, e in itertools.product(
        (False, True), (False, True), (False, True), (1, 2), (0.0, 0.5))
]

# The GAN step (D + G + VGG in one program) compiles ~3x slower on the
# CPU test mesh, so its sweep is the representative subset: every
# single knob, every fold_train pairing, and the all-on combos.  The
# apply-level interactions (fold x unroll x remat) are identical
# between phases and the pretrain sweep covers their full product.
_D = dict(fold_train=False, unroll_body=False, remat=False,
          grad_accum=1, ema_decay=0.0)
GAN_MATRIX = [
    dict(_D),
    dict(_D, fold_train=True),
    dict(_D, unroll_body=True),
    dict(_D, remat=True),
    dict(_D, grad_accum=2),
    dict(_D, ema_decay=0.5),
    dict(_D, fold_train=True, grad_accum=2),
    dict(_D, fold_train=True, ema_decay=0.5),
    dict(_D, remat=True, grad_accum=2, ema_decay=0.5),
    dict(_D, fold_train=True, remat=True, grad_accum=2, ema_decay=0.5),
    dict(_D, fold_train=True, unroll_body=True, remat=True,
         grad_accum=2, ema_decay=0.5),
]


def _combo_id(c):
    return "-".join([
        "fold" if c["fold_train"] else "plain",
        "unroll" if c["unroll_body"] else "scan",
        "remat" if c["remat"] else "norem",
        f"acc{c['grad_accum']}",
        "ema" if c["ema_decay"] else "noema",
    ])


def _batch(opts, seed=0):
    rng = np.random.default_rng(seed)
    hr = np.tanh(rng.standard_normal(
        (opts.batch_size, opts.hr_patch_size, opts.hr_patch_size, 3)
    ).astype(np.float32))
    lr = hr[:, ::opts.scale, ::opts.scale]
    return jnp.asarray(lr), jnp.asarray(hr)


def _max_abs_diff(a, b):
    return max(float(np.max(np.abs(np.asarray(x, np.float32)
                                   - np.asarray(y, np.float32))))
               for x, y in zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(b)))


def _opts(combo, phase):
    return dataclasses.replace(TINY, phase=phase, **combo)


def _g_state(opts):
    state = create_generator_state(opts, build_generator(opts),
                                   jax.random.key(0))
    return configure_generator_apply(opts, state)


def _expected_ema(param_history, decay):
    """Host-side reference for the in-step EMA recursion."""
    ema = param_history[0]
    for p in param_history[1:]:
        ema = jax.tree_util.tree_map(
            lambda e, q: e + (1.0 - decay) * (np.asarray(q, np.float32)
                                              - e),
            ema, p)
    return ema


def _run_pretrain(combo, steps=2):
    opts = _opts(combo, "pretrain")
    g_state = _g_state(opts)
    init_params = jax.device_get(g_state.params)
    step = make_pretrain_step(opts)
    ema = (jax.tree_util.tree_map(jnp.copy, g_state.params)
           if combo["ema_decay"] else None)
    history = [init_params]
    for i in range(steps):
        lr, hr = _batch(opts, seed=i)
        if ema is not None:
            g_state, ema, metrics = step(g_state, ema, lr, hr)
        else:
            g_state, metrics = step(g_state, lr, hr)
        history.append(jax.device_get(g_state.params))
    return (init_params, jax.device_get(g_state.params),
            None if ema is None else jax.device_get(ema), history,
            {k: float(v) for k, v in metrics.items()})


def _run_gan(combo, steps=2):
    opts = _opts(combo, "train")
    g_state = _g_state(opts)
    init_params = jax.device_get(g_state.params)
    disc = build_discriminator(opts)
    d_state = create_discriminator_state(opts, disc, jax.random.key(1))
    vgg = VGG19Features(layer="22", dtype=jnp.float32)
    vgg_params = init_vgg_params(opts, vgg, jax.random.key(2))
    step = make_gan_step(
        opts,
        d_apply=lambda p, x: disc.apply({"params": p}, x),
        vgg_apply=lambda p, x: vgg.apply({"params": p}, x))
    ema = (jax.tree_util.tree_map(jnp.copy, g_state.params)
           if combo["ema_decay"] else None)
    history = [init_params]
    for i in range(steps):
        lr, hr = _batch(opts, seed=i)
        key = jax.random.key(10 + i)
        if ema is not None:
            g_state, d_state, ema, metrics = step(
                g_state, d_state, vgg_params, ema, lr, hr, key)
        else:
            g_state, d_state, metrics = step(
                g_state, d_state, vgg_params, lr, hr, key)
        history.append(jax.device_get(g_state.params))
    return (init_params, jax.device_get(g_state.params),
            None if ema is None else jax.device_get(ema), history,
            {k: float(v) for k, v in metrics.items()})


PLAIN = dict(fold_train=False, unroll_body=False, remat=False,
             grad_accum=1, ema_decay=0.0)
FOLD = dict(PLAIN, fold_train=True)


@pytest.fixture(scope="module")
def baselines_pretrain():
    return {False: _run_pretrain(PLAIN), True: _run_pretrain(FOLD)}


@pytest.fixture(scope="module")
def baselines_gan():
    return {False: _run_gan(PLAIN), True: _run_gan(FOLD)}


def _tolerance(combo, phase):
    """Combo-vs-matching-baseline tolerance class (module docstring).

    GAN + grad_accum: the per-microbatch batch-stat/E[C] semantics move
    the D grads enough that Adam runs separate by its theoretical max
    (lr per coordinate per step -> 2 steps x 1e-3 x 2 runs = 4e-3
    measured exactly); the psnr-agreement assertion below carries the
    corruption-detection weight for this class.

    GAN exact class: wider than pretrain's 1e-6 because the loop-
    unrolled generator compiles to a different XLA schedule whose f32
    reassociation, amplified through the sigmoid/BCE adversarial chain
    and two Adam-normalized updates, measures 8e-5 (pretrain pins the
    same knob at 1e-6, so this is scheduling numerics, not semantics)."""
    if combo["grad_accum"] > 1:
        return 3e-5 if phase == "pretrain" else 5e-3
    return 1e-6 if phase == "pretrain" else 2e-4


def _check_combo(combo, baseline, result, phase):
    init, b_final, _, _, b_metrics = baseline
    _, final, ema, history, metrics = result
    for k, v in metrics.items():
        assert np.isfinite(v), (k, v, combo)
    tol = _tolerance(combo, phase)
    diff = _max_abs_diff(final, b_final)
    assert diff <= tol, (combo, diff, tol)
    key = "l1" if phase == "pretrain" else "psnr"
    assert abs(metrics[key] - b_metrics[key]) < (
        1e-5 if phase == "pretrain" else 0.5), (combo, metrics, b_metrics)
    if combo["ema_decay"]:
        exp = _expected_ema(history, combo["ema_decay"])
        assert _max_abs_diff(ema, exp) < 1e-6, combo


@pytest.mark.slow
@pytest.mark.parametrize("combo", MATRIX, ids=_combo_id)
def test_pretrain_matrix(combo, baselines_pretrain):
    _check_combo(combo, baselines_pretrain[combo["fold_train"]],
                 _run_pretrain(combo), "pretrain")


@pytest.mark.slow
@pytest.mark.parametrize("combo", GAN_MATRIX, ids=_combo_id)
def test_gan_matrix(combo, baselines_gan):
    _check_combo(combo, baselines_gan[combo["fold_train"]],
                 _run_gan(combo), "gan")


@pytest.mark.slow
def test_fold_vs_plain_documented_divergence(baselines_pretrain):
    """fold_train-vs-plain itself: the divergence is the documented
    border-padding effect, NOT corruption.  Two Adam runs from one init
    can separate by at most ~2x the per-run update span (each step moves
    <= lr per coordinate); corruption (NaN, exploding grads via a broken
    fold derivation) lands far beyond it, and a dead step (zero grads)
    fails the span floor."""
    init, p_final, _, _, p_metrics = baselines_pretrain[False]
    _, f_final, _, _, f_metrics = baselines_pretrain[True]
    span = _max_abs_diff(p_final, init)
    assert span > 1e-4                       # plain actually trained
    diff = _max_abs_diff(f_final, p_final)
    assert diff <= 2.05 * span, (diff, span)
    # Both runs optimize the same objective in the patch interior: the
    # training l1 after two steps must agree to within a few percent
    # even at this border-heavy tiny patch size.
    assert abs(f_metrics["l1"] - p_metrics["l1"]) < 0.1 * p_metrics["l1"]


def test_fold_train_cli_default_resolution():
    """Round-4 default flip: the CLI turns --fold_train ON (flagship
    equivalence study, benchmarks/fold_train_study_r4.json) but steps
    aside for the applies it conflicts with; explicit flags always
    win.  Programmatic Opts() keeps the explicit-off default."""
    from pesr_tpu.config import opts_from_args

    assert opts_from_args((), mode="train").fold_train is True
    assert opts_from_args(("--unroll_body",),
                          mode="train").fold_train is False
    assert opts_from_args(("--use_pallas",),
                          mode="train").fold_train is False
    assert opts_from_args(("--no_fold_train",),
                          mode="train").fold_train is False
    assert opts_from_args(("--fold_train", "--unroll_body"),
                          mode="train").fold_train is True
    assert Opts().fold_train is False


def test_pallas_fold_conflict_fails_loudly():
    """--use_pallas and --fold_train both replace the generator apply;
    asking for both must raise, not silently pick one."""
    opts = dataclasses.replace(TINY, use_pallas=True, fold_train=True)
    state = create_generator_state(opts, build_generator(opts),
                                   jax.random.key(0))
    with pytest.raises(ValueError, match="pick one"):
        configure_generator_apply(opts, state)
