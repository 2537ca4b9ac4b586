"""Host-heap hygiene for long runs (round 5).

The round-5 soak surfaced steady host-RSS growth of ~= the per-step
uint8 batch bytes on the tunneled-TPU client (pretrain leg: ~1.5-2.3
MB/step long after the decode cache plateaued), while the SAME loop on
the CPU backend holds a flat RSS for both the in-memory and the
DIV2K LR-file data paths (/tmp leak probes, 400 steps each) — i.e. the
growth lives in the transfer client's host-side allocations, not in
this package's Python.  Occasional multi-MB RSS dips during the runs
point at allocator retention (freed-but-unreturned arenas) rather than
a hard reference leak.

``trim_host_heap()`` asks glibc to return free arena memory to the OS
(``malloc_trim(0)``).  It is cheap (~ms), Linux/glibc-only, and safe to
call from the training loop at epoch boundaries (``--trim_host_heap``).
Non-glibc platforms no-op.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_libc = None
_checked = False


def trim_host_heap() -> bool:
    """Return free heap arenas to the OS; True if a trim call ran."""
    global _libc, _checked
    if not _checked:
        _checked = True
        try:
            path = ctypes.util.find_library("c")
            lib = ctypes.CDLL(path) if path else ctypes.CDLL(None)
            if hasattr(lib, "malloc_trim"):
                _libc = lib
        except OSError:
            _libc = None
    if _libc is None:
        return False
    try:
        _libc.malloc_trim(0)
        return True
    except Exception:
        return False
