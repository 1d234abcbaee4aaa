"""glibc malloc tuning: keep large buffers in the process heap.

On this class of sandboxed kernels, first-touch page faults on freshly
mmap'd memory cost ~100 µs per 4 KiB page — three orders of magnitude above
bare metal.  numpy hands any allocation above glibc's dynamic mmap
threshold (~32 MB, and often much less after trims) to ``mmap``, and frees
return the pages to the OS, so EVERY sizeable vector op re-pays the fault
storm: a 2.25M-element ``np.empty`` + fill measured 2.3 s cold and 2.3 ms
once the heap retains the pages (1000×).

``tune_malloc`` raises the mmap threshold and disables trim so the heap
grows once and is reused.  Trade-off: freed memory is not returned to the
OS until exit (RSS stays at high-water mark) — the right trade for worker
and serving processes.  Set ``VEXOR_NO_MALLOC_TUNE=1`` to opt out.  No-op
on non-glibc platforms.
"""

from __future__ import annotations

import os

_done = False


def tune_malloc() -> bool:
    global _done
    if _done:
        return True
    if os.environ.get("VEXOR_NO_MALLOC_TUNE"):
        return False
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        ok = libc.mallopt(M_MMAP_THRESHOLD, 1 << 30) == 1
        ok = libc.mallopt(M_TRIM_THRESHOLD, -1) == 1 and ok
        _done = ok
        return ok
    except Exception:
        return False
