"""SR scale -> sub-pixel stage factorization (shared, dependency-free).

Single source of truth for which scales the framework supports and how
the generator's upsampler decomposes them into PixelShuffle stages
(SURVEY.md §3.4).  Kept free of jax imports so the CLI/config and the
torch checkpoint converter can use it without initializing a backend.
"""

from __future__ import annotations

from typing import Tuple


def upsample_stages(scale: int) -> Tuple[int, ...]:
    """Factor an SR scale into per-stage sub-pixel factors.

    EDSR-lineage upsamplers build the total scale from sub-pixel stages:
    powers of two become x2 stages ((2, 2) for x4, matching the
    reference's two [conv->4C, PixelShuffle(2)] stages) and a factor of
    3 becomes one x3 stage (one [conv->9C, PixelShuffle(3)], the torch
    EDSR convention for the DIV2K X3 track).  Any 2^a * 3^b scale is
    supported — x2 stages first, then x3 (for pure powers of two this
    reproduces the original stage list exactly, so existing checkpoints
    are unaffected).  Raises ValueError for anything else (e.g. 5),
    which is what the config/CLI surface reports.
    """
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    stages = []
    s = scale
    while s % 2 == 0:
        stages.append(2)
        s //= 2
    while s % 3 == 0:
        stages.append(3)
        s //= 3
    if s != 1:
        raise ValueError(
            f"scale must factor into 2s and 3s (1/2/3/4/6/8/...), "
            f"got {scale}")
    return tuple(stages)


def fold_min_halo(scale: int) -> int:
    """Correctness floor (LR px) for folded/int8 upsampler applies.

    The folded chain (models/fold.py) is exact only R = num_stages + 1
    LR pixels away from a zero-padded border — one 3x3 conv of radius
    <= 1 LR px per stage plus the out conv.  The tiling engines must
    replicate-pad + crop at least this much context on every border."""
    return 0 if scale == 1 else len(upsample_stages(scale)) + 1
