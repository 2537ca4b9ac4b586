"""Model zoo (SURVEY.md §2 items 2-4): Generator, Discriminator, VGG19."""

from pesr_tpu.models.generator import Generator, ResBlock, Upsampler
from pesr_tpu.models.discriminator import Discriminator
from pesr_tpu.models.vgg import VGG19Features, vgg_preprocess

__all__ = [
    "Generator",
    "ResBlock",
    "Upsampler",
    "Discriminator",
    "VGG19Features",
    "vgg_preprocess",
]
