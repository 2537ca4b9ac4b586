"""pesr_tpu — a TPU-native perceptual super-resolution framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the PESR
research codebase (thangvubk/PESR: "Perception-Enhanced Image
Super-Resolution via Relativistic Generative Adversarial Networks",
ECCV 2018 PIRM workshop).  See SURVEY.md at the repo root for the
component inventory this package implements and BASELINE.md for the
performance contract.

Layering (SURVEY.md §1 "Planned TPU-native layering"):

  core      — dtype policy, PRNG discipline           (pesr_tpu.utils)
  kernels   — Pallas fused conv kernels               (pesr_tpu.ops.pallas)
  ops       — pixel-shuffle, bicubic resize, tiling   (pesr_tpu.ops)
  models    — flax Generator / Discriminator / VGG    (pesr_tpu.models)
  data      — DIV2K/benchmark loaders + on-device aug (pesr_tpu.data)
  losses    — L1 / VGG-perceptual / RaGAN / TV        (pesr_tpu.losses)
  parallel  — mesh construction, DP sharding          (pesr_tpu.parallel)
  training  — single-jit G+D train step, loops        (pesr_tpu.training)
  metrics   — PSNR / SSIM / NIQE / Ma / PIRM-PI       (pesr_tpu.metrics)
  entry     — train.py / test.py CLIs (repo root), PESR-compatible flags

Everything on the compute path is NHWC, static-shaped, and jit-compiled;
data parallelism is expressed with `jax.sharding.NamedSharding` over a
1-D device mesh so the same program runs on one chip or a full ICI slice.
"""

__version__ = "0.1.0"

# Public convenience API (heavier submodules import lazily at call sites).
from pesr_tpu.config import Opts, build_parser, opts_from_args  # noqa: E402

__all__ = ["Opts", "build_parser", "opts_from_args", "__version__"]
