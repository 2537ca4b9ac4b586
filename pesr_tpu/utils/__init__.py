"""Utilities: image I/O, logging, meters (SURVEY.md §2 item 9)."""

from pesr_tpu.utils.image_io import imread_uint8, imwrite_uint8
from pesr_tpu.utils.logging import AverageMeter, MetricLogger

__all__ = ["imread_uint8", "imwrite_uint8", "AverageMeter", "MetricLogger"]
