"""Process-level memory posture for the serving tier.

This box (and any fresh Linux container) serves anonymous-page faults at
~5-7 s per GB single-threaded with transparent hugepages in `madvise` mode —
measured: a 1.1 GB fresh ndarray costs ~7 s to first-touch serially but only
~1.5 s when 16 threads fault disjoint ranges, and ~0.2 s when the pages were
already faulted into the glibc heap. A cold phrase-cache fill at 5M docs
allocates several GB of numpy temporaries, so allocation faults — not
compute — dominated the cold latency (measured 17 s of a 31 s fill).

Two fixes, both glibc/Linux-only and silently skipped elsewhere:

- ``enable_heap_reuse()``: mallopt(M_MMAP_THRESHOLD, max) + trim-threshold
  so numpy's large blocks come from the sbrk heap and stay faulted across
  frees. First allocation pays the fault; every later query reuses hot
  pages (measured: 286M-element uint32 cumsum 9.4 s → 0.95 s on reuse).
  The trade-off — freed memory is retained by the process — is the standard
  serving-tier allocator posture (jemalloc/mimalloc behave the same way by
  default), bounded by peak working set, fine on a dedicated search box.
- ``prefault(nbytes)``: touch-ahead of the heap arena on 16 threads so even
  the FIRST query pays ~1.5 s/GB instead of 5-7. Callers overlap it with
  I/O (the cold phrase fill runs it behind the Arrow sidecar scan, hiding
  the entire cost). A module-level high-water mark makes repeat calls
  no-ops once the arena is hot.

Arrow's pool is jemalloc (its scans/sorts fault multi-threaded already);
``retain_arrow_memory()`` disables its dirty-page decay so warm queries
reuse instead of refaulting.
"""

from __future__ import annotations

import threading

_LOCK = threading.Lock()
_ENABLED = False
_HOT_BYTES = 0


def enable_heap_reuse() -> bool:
    """mallopt so glibc serves large allocations from the reusable heap
    instead of fresh mmaps. Idempotent; returns False on non-glibc."""
    global _ENABLED
    with _LOCK:
        if _ENABLED:
            return True
        try:
            import ctypes

            libc = ctypes.CDLL("libc.so.6", use_errno=True)
            M_TRIM_THRESHOLD, M_MMAP_THRESHOLD, M_MMAP_MAX = -1, -3, -4
            M_ARENA_MAX = -8
            ok = (libc.mallopt(M_MMAP_THRESHOLD, 2**31 - 1) == 1
                  and libc.mallopt(M_TRIM_THRESHOLD, 2**31 - 1) == 1
                  and libc.mallopt(M_MMAP_MAX, 0) == 1)
            # single arena: per-THREAD arenas (the scoring pool's) shrink
            # their heaps back to the OS on free regardless of the main
            # arena's trim threshold, so a 24-thread scorer re-faulted
            # ~2 GB/query (measured 400-550k minor faults, warm latency
            # 10-22 s vs 2.6 s with one arena). Large-block mallocs under one
            # arena serialize on its lock, but the serving tier's blocks are
            # few and big — measured net win. Threads that already mapped an
            # arena keep it; call this before the pools spawn.
            libc.mallopt(M_ARENA_MAX, 1)
            _ENABLED = bool(ok)
            return _ENABLED
        except Exception:
            return False


def retain_arrow_memory() -> None:
    """Stop jemalloc returning Arrow's pages to the OS (decay −1): warm
    scans/sorts reuse hot pages instead of refaulting them."""
    try:
        import pyarrow as pa

        if pa.default_memory_pool().backend_name == "jemalloc":
            pa.jemalloc_set_decay_ms(-1)
    except Exception:
        pass


def prefault(nbytes: int, threads: int = 16) -> int:
    """Fault `nbytes` of heap into residency on `threads` threads and free
    it back to the (retained, see enable_heap_reuse) arena. Tracks a
    high-water mark: only the delta beyond already-hot bytes is touched.
    Returns the bytes actually touched. Safe to call from a background
    thread (numpy page writes release the GIL via the buffer protocol)."""
    global _HOT_BYTES
    if not enable_heap_reuse():
        return 0
    with _LOCK:
        delta = int(nbytes) - _HOT_BYTES
        if delta <= 64 * 1024 * 1024:  # not worth a touch pass
            return 0
        _HOT_BYTES = int(nbytes)
    import numpy as np

    arena = np.empty(delta, dtype=np.uint8)
    page = 4096
    ch = max(1, len(arena) // max(1, threads))

    def touch(i: int) -> None:
        arena[i * ch: (i + 1) * ch + (len(arena) if i == threads - 1 else 0):
              page] = 0

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(threads) as ex:
        list(ex.map(touch, range(threads)))
    del arena  # stays in the heap arena, pages remain resident
    return delta


def prefault_async(nbytes: int, threads: int = 16) -> threading.Thread:
    """Kick prefault on a daemon thread (overlap with I/O); join() to wait."""
    t = threading.Thread(target=prefault, args=(nbytes, threads), daemon=True)
    t.start()
    return t
