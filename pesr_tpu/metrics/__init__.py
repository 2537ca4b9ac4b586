"""Evaluation metrics (SURVEY.md §2 items 9-10; BASELINE.json:2)."""

from pesr_tpu.metrics.psnr_ssim import calc_psnr, calc_ssim, rgb2ycbcr

__all__ = ["calc_psnr", "calc_ssim", "rgb2ycbcr"]
