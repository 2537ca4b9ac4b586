"""Training driver layer (SURVEY.md §2 item 7, §3.1-3.2, §7.6)."""

from pesr_tpu.training.state import (
    GanTrainState,
    create_generator_state,
    create_discriminator_state,
    make_lr_schedule,
)
from pesr_tpu.training.steps import make_pretrain_step, make_gan_step

__all__ = [
    "GanTrainState",
    "create_generator_state",
    "create_discriminator_state",
    "make_lr_schedule",
    "make_pretrain_step",
    "make_gan_step",
]
