"""PNG image I/O (SURVEY.md §2 items 8/9: test.py saves SR PNGs for the
offline PIRM evaluation; utils handle tensor<->image conversion)."""

from __future__ import annotations

import os
from typing import Union

import numpy as np
from PIL import Image


def imread_uint8(path: Union[str, os.PathLike]) -> np.ndarray:
    """Read an image file as HWC uint8 RGB (grayscale -> 3 channels)."""
    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), dtype=np.uint8)
    return arr


def imwrite_uint8(path: Union[str, os.PathLike], img: np.ndarray) -> None:
    """Write an HWC uint8 RGB array as PNG (dirs created as needed).

    PNG paths prefer the native libpng encoder (pesr_tpu.data.native —
    the benchmark exports are 2K images where PIL's encoder is the
    bottleneck); PIL remains the fallback and handles other formats."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError(f"expected uint8, got {img.dtype}")
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(f"expected HWC RGB, got shape {img.shape}")
    path = os.fspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if path.lower().endswith(".png"):
        try:
            from pesr_tpu.data import native
            if native.available():
                native.encode_png(path, img)
                return
        except (ImportError, IOError):
            pass
    Image.fromarray(img).save(path)
