"""Allocator tuning for slow-first-touch environments.

On this sandbox (Firecracker microVM) faulting in fresh mmap'd pages runs at
~10-50 MB/s while warm pages run at ~5 GB/s. glibc satisfies every numpy
temporary >128 KB with a fresh mmap/munmap pair, so each map_batches batch
pays the fault cost again — a 30-60x slowdown on vectorized kernels.

Fix: raise the malloc mmap threshold so large numpy temporaries come from the
(reused, already-faulted) heap, and disable trim so the heap is never given
back. Applied in-process via mallopt(3) and exported via MALLOC_* env vars so
Ray worker processes inherit it. No-op on platforms without glibc.
"""

from __future__ import annotations

import ctypes
import os

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_M_MMAP_MAX = -4

_done = False


def tune_allocator() -> bool:
    global _done
    if _done:
        return True
    # children (ray workers) read these at startup
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_MMAP_MAX_", "0")
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(_M_MMAP_THRESHOLD, (1 << 31) - 1)
        libc.mallopt(_M_TRIM_THRESHOLD, (1 << 31) - 1)
        libc.mallopt(_M_MMAP_MAX, 0)
        _done = True
    except Exception:  # pragma: no cover — non-glibc platform
        return False
    return True
