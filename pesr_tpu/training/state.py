"""Train-state construction: params + Adam + LR schedule (SURVEY.md §3.1).

The reference builds per-network ``torch.optim.Adam`` optimizers with a
step-decay LR schedule (halving every ``lr_step`` epochs, reconstructed
[U-med]).  Here each network gets a ``flax`` TrainState over an
``optax.adam`` with an ``optax.exponential_decay`` staircase schedule —
the schedule is step-indexed so it lives inside the jitted update with
no host-side LR bookkeeping.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from pesr_tpu.config import Opts


class GanTrainState(train_state.TrainState):
    """TrainState; kept as a named subclass so checkpoints self-describe."""


def make_lr_schedule(opts: Opts) -> optax.Schedule:
    """Step-decay: LR halves every ``lr_step`` epochs (staircase).

    ``steps_per_epoch == 0`` means "derive from the dataset"; the
    training driver resolves it before creating states (loop.py), so a
    0 reaching here is a direct caller without a dataset (tests, dryrun)
    — fall back to the reference's canonical 1000 steps/epoch.
    """
    spe = opts.steps_per_epoch if opts.steps_per_epoch > 0 else 1000
    return optax.exponential_decay(
        init_value=opts.learning_rate,
        transition_steps=max(1, opts.lr_step * spe),
        decay_rate=0.5,
        staircase=True,
    )


def _make_tx(opts: Opts) -> optax.GradientTransformation:
    return optax.adam(make_lr_schedule(opts), b1=0.9, b2=0.999)


def create_generator_state(opts: Opts, model: Any,
                           rng: jax.Array) -> GanTrainState:
    """Init generator params at the training patch shape and wrap in a
    TrainState.  Shapes only drive initialization — the apply_fn is
    shape-polymorphic across jit traces (tiling uses other shapes)."""
    x = jnp.zeros((1, opts.patch_size, opts.patch_size, opts.img_channels),
                  jnp.float32)
    params = model.init(rng, x)["params"]
    return GanTrainState.create(
        apply_fn=model.apply, params=params, tx=_make_tx(opts))


def create_discriminator_state(opts: Opts, model: Any,
                               rng: jax.Array) -> GanTrainState:
    x = jnp.zeros((2, opts.hr_patch_size, opts.hr_patch_size,
                   opts.img_channels), jnp.float32)
    params = model.init(rng, x)["params"]
    return GanTrainState.create(
        apply_fn=model.apply, params=params, tx=_make_tx(opts))


def init_vgg_params(opts: Opts, model: Any, rng: jax.Array) -> Any:
    """Frozen VGG params: converted weights if provided, else fixed-seed
    random (tests / weight-agnostic parity math; SURVEY.md §7 hard-parts
    item 1)."""
    x = jnp.zeros((1, opts.hr_patch_size, opts.hr_patch_size,
                   opts.img_channels), jnp.float32)
    params = model.init(rng, x)["params"]
    if opts.vgg_weights:
        from pesr_tpu.convert import load_vgg_weights  # lazy: optional dep
        params = load_vgg_weights(opts.vgg_weights, params)
    return params


Batch = Tuple[jnp.ndarray, jnp.ndarray]
StepFn = Callable[..., Any]
