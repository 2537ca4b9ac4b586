"""Evaluation metrics (SURVEY.md §2 items 9-10; BASELINE.json:2)."""

from pesr_tpu.metrics.psnr_ssim import calc_psnr, calc_ssim, rgb2ycbcr
from pesr_tpu.metrics.niqe import NiqeModel, fit_niqe_model, niqe
from pesr_tpu.metrics.ma import ma_score
from pesr_tpu.metrics.pirm import evaluate_dir, perceptual_index

__all__ = [
    "calc_psnr", "calc_ssim", "rgb2ycbcr",
    "niqe", "fit_niqe_model", "NiqeModel",
    "ma_score", "perceptual_index", "evaluate_dir",
]
