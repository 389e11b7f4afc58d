#!/usr/bin/env python3
"""At-volume throughput check for the round-4 coverage-closure operators
(ntcard / LPCQF / VAC) — 20M synthetic elements on local[N], demonstrating
the scale properties the plans claim:

  * ntcard: the 2^-p sampling filter runs map-side, so the bucket exchange
    carries ~20M/2^p rows into a bounded (2*2^r-cell) table;
  * LPCQF: cell build is one partial+final agg into <= nregs*2^sigbits
    cells; the probe broadcasts the bounded table;
  * VAC: the cascade explodes exactly the kept levels (~2x rows for
    base 2), then one partial+final agg per (group, level).

Writes one JSON line; appended by hand to BENCH/BASELINE.md when rerun.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sketch_spark import get_spark  # noqa: E402

N = int(os.environ.get("NEWOPS_N", 20_000_000))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    from sketch_spark.operators.frequency import lpcqf_query, lpcqf_sketch
    from sketch_spark.operators.ntcard import ntcard_buckets, ntcard_estimate
    from sketch_spark.operators.vac import vac_distinct

    spark = get_spark("newops-scale", master=f"local[{CPUS}]",
                      shuffle_partitions=2 * CPUS)
    # ~N occurrences of ~N/2 distinct keys (planted multiplicity ~2):
    # key = id % (N/2), occurrence id = id.  All hashes JVM-side.
    base = spark.range(N).select(
        F.xxhash64(F.pmod("id", F.lit(N // 2))).alias("h"),
        F.xxhash64("id", F.lit(7)).alias("u"),
        (F.pmod("id", F.lit(4))).cast("string").alias("g"),
        F.pmod("id", F.lit(N // 2)).alias("k"),
    ).persist()
    base.count()  # materialize + warm workers
    out = {}

    t0 = time.time()
    b = ntcard_buckets(base, "g", "h", r=14, p=7, maxcnt=255)
    est = ntcard_estimate(b, r=14, p=7).collect()
    out["ntcard_sec"] = round(time.time() - t0, 2)
    out["ntcard_f0x2_over_truth"] = round(
        2 * sum(r["f0"] for r in est) / (N // 2), 4
    )

    # LPCQF sized for the key space (nregs ~ 2x distinct keys, the way the
    # reference structure must be sized to stay below saturation); the
    # query's auto join policy declines the broadcast at this size.
    t0 = time.time()
    sk = lpcqf_sketch(base, "k", nregs=(1 << 25) - 39, sigbits=8).persist()
    sk.count()  # the sketch is a materialized artifact (checkpoint table)
    out["lpcqf_build_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    probes = spark.range(100_000).select(F.col("id").alias("k"))
    cnt = lpcqf_query(sk, probes, "k", nregs=(1 << 25) - 39, sigbits=8)
    s = cnt.agg(F.sum("est_count")).collect()[0][0]
    out["lpcqf_probe_sec"] = round(time.time() - t0, 2)
    out["lpcqf_sec"] = round(out["lpcqf_build_sec"] + out["lpcqf_probe_sec"], 2)
    out["lpcqf_probe_sum"] = int(s)

    t0 = time.time()
    prof = vac_distinct(base, "g", "k", "u", n=12).collect()
    out["vac_exact_sec"] = round(time.time() - t0, 2)
    out["vac_rows"] = len(prof)
    out["vac_level0_occ"] = int(
        sum(r["n_occurrences"] for r in prof if r["level"] == 0)
    )

    # the scale tier: HLL base sketches per level (register max-merge is
    # one partial+final agg; the exchange carries (group, level, bucket)
    # partials, never keys)
    t0 = time.time()
    from sketch_spark.operators.vac import vac_hll

    hv = vac_hll(base, "g", "h", "u", n=12, p=12).collect()
    out["vac_hll_sec"] = round(time.time() - t0, 2)
    out["vac_hll_rows"] = len(hv)

    out["n"] = N
    out["cpus"] = CPUS
    out["elems_per_sec"] = {
        k.replace("_sec", ""): round(N / v)
        for k, v in list(out.items()) if k.endswith("_sec")
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
