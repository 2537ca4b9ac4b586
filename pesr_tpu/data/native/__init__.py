"""ctypes binding + lazy build of the native data-loader core
(sampler.cpp).  Falls back cleanly: every entry point returns None /
raises ImportError when the shared library can't be built, and the
Python pipeline (pesr_tpu.data.datasets) is used instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "sampler.cpp")
_SO = os.path.join(_DIR, "libpesr_data.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    """Compile the sampler, atomically.

    The compiler writes to a private temp path which is os.rename()d
    over _SO only when complete, under an flock — two processes
    rebuilding in place (DP bench runs, pytest workers) could otherwise
    CDLL a half-written file or rewrite an inode another process has
    dlopen-mmapped (round-2 review)."""
    import fcntl
    import tempfile
    lock_path = _SO + ".lock"
    try:
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            # Another process may have finished the build while we
            # waited on the lock.
            if os.path.exists(_SO) and os.path.getmtime(_SO) >= \
                    os.path.getmtime(_SRC):
                return ctypes.CDLL(_SO)
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
            os.close(fd)
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     _SRC, "-lpng", "-pthread", "-o", tmp],
                    check=True, capture_output=True, timeout=300)
                os.rename(tmp, _SO)  # atomic on the same filesystem
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
    except (OSError, subprocess.SubprocessError):
        return None
    return ctypes.CDLL(_SO)


def get_lib() -> Optional[ctypes.CDLL]:
    """Build-on-demand loader; None when native support is unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        try:
            if os.path.exists(_SO) and os.path.getmtime(_SO) >= \
                    os.path.getmtime(_SRC):
                try:
                    _lib = ctypes.CDLL(_SO)
                except OSError:
                    # A stale-but-fresh-looking .so (glibc/arch
                    # mismatch after a clone onto a different machine)
                    # must not strand the native path: a local rebuild
                    # usually succeeds (round-4 review).
                    _lib = _build()
            else:
                _lib = _build()
        except OSError:
            # CDLL load failure of a just-built .so (missing libpng)
            # or a missing sampler.cpp must mean "native unavailable",
            # not a crash in make_train_iterator — the documented
            # contract is a clean Python fallback.
            _lib = None
        if _lib is None:
            _build_failed = True
            return None
        _lib.pesr_png_probe.restype = ctypes.c_int
        _lib.pesr_png_decode.restype = ctypes.c_int
        _lib.pesr_png_encode.restype = ctypes.c_int
        _lib.pesr_sample_patches.restype = None
        return _lib


def available() -> bool:
    return get_lib() is not None


def decode_png(path: str) -> np.ndarray:
    """GIL-light PNG decode -> HWC uint8 RGB (raises on failure)."""
    lib = get_lib()
    if lib is None:
        raise ImportError("native data library unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    p = path.encode()
    if lib.pesr_png_probe(p, ctypes.byref(h), ctypes.byref(w)):
        raise IOError(f"cannot read PNG header: {path}")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.pesr_png_decode(
        p, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        h.value, w.value)
    if rc:
        raise IOError(f"PNG decode failed ({rc}): {path}")
    return out


def encode_png(path: str, img: np.ndarray, level: int = 4) -> None:
    """libpng RGB8 encode (raises on failure); ``level`` = zlib 0-9."""
    lib = get_lib()
    if lib is None:
        raise ImportError("native data library unavailable")
    img = np.ascontiguousarray(img)
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected HWC uint8 RGB")
    rc = lib.pesr_png_encode(
        path.encode(), img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        img.shape[0], img.shape[1], level)
    if rc:
        raise IOError(f"PNG encode failed ({rc}): {path}")


class NativePatchSampler:
    """Multithreaded aligned-HR-crop batches from a cached image list.

    Deterministic in (seed, step); mirrors PatchIterator's HR-crop mode
    (LR is synthesized on device by data.augment.prepare_train_batch).
    """

    def __init__(self, images: List[np.ndarray], patch_hr: int,
                 batch: int, seed: int, threads: int = 0) -> None:
        lib = get_lib()
        if lib is None:
            raise ImportError("native data library unavailable")
        self._lib = lib
        self._imgs = [np.ascontiguousarray(im) for im in images]
        for im in self._imgs:
            if im.dtype != np.uint8 or im.ndim != 3 or im.shape[2] != 3:
                raise ValueError("images must be HWC uint8 RGB")
            if im.shape[0] < patch_hr or im.shape[1] < patch_hr:
                raise ValueError("image smaller than patch")
        n = len(self._imgs)
        self._ptrs = (ctypes.POINTER(ctypes.c_ubyte) * n)(
            *[im.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
              for im in self._imgs])
        self._hs = (ctypes.c_int * n)(*[im.shape[0] for im in self._imgs])
        self._ws = (ctypes.c_int * n)(*[im.shape[1] for im in self._imgs])
        self.patch, self.batch, self.seed = patch_hr, batch, seed
        self.threads = threads or min(8, os.cpu_count() or 1)
        self._step = 0

    def sample(self, step: Optional[int] = None) -> np.ndarray:
        if step is None:
            step = self._step
            self._step += 1
        out = np.empty((self.batch, self.patch, self.patch, 3), np.uint8)
        self._lib.pesr_sample_patches(
            self._ptrs, self._hs, self._ws, len(self._imgs),
            self.batch, self.patch,
            ctypes.c_uint64(self.seed), ctypes.c_uint64(step),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            self.threads)
        return out

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[None, np.ndarray]:
        return None, self.sample()
