#!/usr/bin/env python3
"""Memory-bus saturation probe — attribution evidence for the scaling report.

The dedup pipeline's heavy stages (winnowing kernels, span verify, shuffle
encode/decode) are numpy/memcpy-bound.  This probe measures the box's
aggregate copy bandwidth at 1, 2, 8 and 32 concurrent worker PROCESSES
(matching how pyspark runs Python workers), each streaming copies of a
64 MiB buffer (far larger than any cache share), plus the fresh-page
population rate each worker pays on first touch (this hypervisor lazily
populates guest pages; see BENCH/BASELINE.md host caveat).

If aggregate GB/s stops growing (or drops) between 8 and 32 workers, then
a 32-thread local-mode "cluster" on this box cannot express the pipeline's
scaling — the bus, not the plan, is the limit.  Run on an idle box.

Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np

BUF_MB = 64
SECONDS = 3.0


def worker(barrier, out_q):
    n = BUF_MB * 1024 * 1024
    t0 = time.time()
    src = np.empty(n, dtype=np.uint8)
    src[::4096] = 1  # touch every page: measures lazy population rate
    populate_s = time.time() - t0
    dst = np.empty_like(src)
    np.copyto(dst, src)  # populate dst + warm the pair before the clock
    barrier.wait()  # all workers measure the same window
    t0 = time.time()
    it = 0
    while time.time() - t0 < SECONDS:
        np.copyto(dst, src)
        it += 1
    elapsed = time.time() - t0
    out_q.put((2 * n * it / elapsed, populate_s))  # bytes read+written /s


def level(k: int) -> dict:
    barrier = mp.Barrier(k)
    out_q = mp.Queue()
    procs = [mp.Process(target=worker, args=(barrier, out_q)) for _ in range(k)]
    for p in procs:
        p.start()
    results = [out_q.get() for _ in procs]
    for p in procs:
        p.join()
    agg = sum(r[0] for r in results)
    return {
        "workers": k,
        "agg_GBps": round(agg / 1e9, 2),
        "per_worker_GBps": round(agg / k / 1e9, 2),
        "populate_MBps_median": round(
            float(np.median([BUF_MB / r[1] for r in results])), 1
        ),
    }


def main() -> None:
    levels = [level(k) for k in (1, 2, 8, 32)]
    by_k = {str(lv["workers"]): lv for lv in levels}
    s8, s32 = by_k["8"]["agg_GBps"], by_k["32"]["agg_GBps"]
    print(
        json.dumps(
            {
                "buf_mb": BUF_MB,
                "seconds_per_level": SECONDS,
                "levels": levels,
                "agg_32_over_8": round(s32 / s8, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
