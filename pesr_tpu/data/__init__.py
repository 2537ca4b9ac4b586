"""Data pipeline (SURVEY.md §2 item 5; BASELINE.json:5 "the DIV2K patch
pipeline ... moves to a fused on-device preprocessing stage").

Split of responsibilities (SURVEY.md §7.4):
  * host (numpy, this package's ``datasets``): decode PNGs once into a
    RAM cache, pick random aligned crop windows, stack uint8 batches;
  * device (jit, ``augment``): uint8 -> [-1,1] conversion, the random
    flip/rot90 dihedral augmentations, and (synthetic-pair mode) the
    MATLAB-bicubic downsample — all fused into one XLA program that runs
    where the batch is about to be consumed.
"""

from pesr_tpu.data.augment import (
    augment_batch,
    denormalize_to_uint8,
    normalize_uint8,
    prepare_train_batch,
)
from pesr_tpu.data.datasets import (
    EvalSample,
    PairedImageFolder,
    PatchIterator,
    Prefetcher,
    SyntheticImages,
    load_eval_set,
    make_train_iterator,
)

__all__ = [
    "augment_batch",
    "normalize_uint8",
    "denormalize_to_uint8",
    "prepare_train_batch",
    "SyntheticImages",
    "PairedImageFolder",
    "PatchIterator",
    "Prefetcher",
    "EvalSample",
    "load_eval_set",
    "make_train_iterator",
]
