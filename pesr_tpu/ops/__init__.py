"""Shape/resampling ops on the compute path (SURVEY.md §7 items 2, 4, 7)."""

from pesr_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle
from pesr_tpu.ops.resize import imresize, resize_kernel_matrix

__all__ = [
    "pixel_shuffle",
    "pixel_unshuffle",
    "imresize",
    "resize_kernel_matrix",
]
