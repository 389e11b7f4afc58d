#!/usr/bin/env python3
"""Allocation-lifecycle probe — companion to BENCH/busprobe.py.

busprobe.py shows the fresh-page population rate collapsing under
concurrency.  This probe separates the two regimes a numpy-heavy Spark
worker actually lives in:

  fresh  — allocate a 130 MB buffer, touch, free, repeat (mmap/munmap
           churn; after iteration 1 the guest kernel re-serves the
           just-freed pages)
  reuse  — allocate once, re-touch in place

Measured on this box (see BENCH/allocprobe.json): the FIRST population
of never-touched guest pages runs at ~4 MB/s (34 s for 130 MB), while
every later alloc/free cycle of the same footprint runs at ~1.4 GB/s —
even without buffer reuse, and regardless of MALLOC_MMAP_THRESHOLD_.
Conclusion: mmap churn per se is cheap once the guest owns the pages;
what is catastrophic is GROWING the guest's resident footprint (or
re-growing it after the hypervisor reclaims, e.g. free-page reporting
under memory pressure).  That is consistent with the local[32] substr
inversion: 64 GiB pinned JVM heap + 32 workers keeps the box near the
reclaim boundary, so worker allocations keep crossing it; at 16 GiB/8
workers they never do.  The decisive test is a low-heap local[32] run
(BENCH/diag_c32.json when recorded).

Prints one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

N = 130 * 1024 * 1024
ITERS = 6


def trial(reuse: bool) -> list[float]:
    times = []
    buf = np.empty(N, np.uint8) if reuse else None
    for i in range(ITERS):
        t0 = time.time()
        if not reuse:
            buf = np.empty(N, np.uint8)
        buf[::4096] = i  # touch every page
        buf.sum()  # read pass
        times.append(round(time.time() - t0, 3))
        if not reuse:
            del buf
    return times


def main() -> None:
    print(
        json.dumps(
            {
                "buf_mb": N >> 20,
                "fresh_alloc_free_s": trial(False),
                "reuse_in_place_s": trial(True),
            }
        )
    )


if __name__ == "__main__":
    main()
