"""Pallas TPU kernels (SURVEY.md §2.9, §7.9; BASELINE.json:5 "the
EDSR-style residual-block generator ... become fused Pallas conv
kernels").

Every kernel ships with an XLA-semantics reference implementation and a
numerics-parity test; the kernels are opt-in (``--use_pallas``) with the
XLA path as fallback, per SURVEY.md §7 hard-parts item 6 ("treat as an
optimization with a fallback, not a correctness dependency").
"""

from pesr_tpu.ops.pallas.resblock import (fused_resblock,
                                          resblock_reference)
from pesr_tpu.ops.pallas.upsampler import (fused_upsampler_stage,
                                           upsampler_stage_reference)

__all__ = ["fused_resblock", "resblock_reference",
           "fused_upsampler_stage", "upsampler_stage_reference"]
