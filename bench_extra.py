#!/usr/bin/env python3
"""Noop-sink isolation harness (optimization guide §1.4) — NOT the frozen
driver bench.  `bench.py` is the measured artifact and stays untouched;
this file reproduces the per-query measurements cited in
OPTIMIZATION_r06.md:

  * each headline query timed 1 cold + N warm reps, either bench-style
    (`.count()`, what the driver times) or noop-sink (computes every
    column of every row — catches work that count() lets the optimizer
    prune);
  * optional `.explain("formatted")` dumps to plans/<tag>/;
  * a dedup-pipeline stage profile on the bench corpus (same corpus
    cache, counters asserted against the pinned set).

Env:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf1.0 — the
                       scale the round-5 driver measurement used)
  SPARK_GRAFT_CPUS     local[N] (default 32)
  BX_MODE              "count" (default) | "noop"
  BX_REPS              warm reps per query (default 3)
  BX_PLANS             dump plans to plans/<BX_PLANS>/<query>_<suffix>.txt
  BX_PLAN_SUFFIX       suffix for the dumps (default "after")
  BX_DEDUP             "1" to also run the dedup stage profile (default 0)

Prints one line per query: cold, warm median, warm reps, rows.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sketch_spark import get_spark  # noqa: E402

HEADLINE = [
    "q01_fingerprint_groups",
    "q03_bottomk",
    "q05_oneperm_registers",
    "q06_band_buckets",
    "q07_simhash",
    "q14_order_part_overlap",
    "q15_ngram_jaccard",
    "q16_ann_topk",
    "q17_user_sessions",
    "q18_lineitem_agg",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mode = os.environ.get("BX_MODE", "count")
    reps = int(os.environ.get("BX_REPS", "3"))
    plans = os.environ.get("BX_PLANS")
    suffix = os.environ.get("BX_PLAN_SUFFIX", "after")
    spark = get_spark(
        "sketch-spark-bench-extra", master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    from pyspark.sql import functions as F

    from sketch_spark.plans import entry_queries as EQ

    # worker warmup (same rationale as bench.py's untimed region)
    spark.range(4 * cpus).repartition(2 * cpus).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    out = {}
    for name in HEADLINE:
        df = EQ.QUERIES[name](spark, sf_dir)
        if plans:
            os.makedirs(f"plans/{plans}", exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(f"plans/{plans}/{name}_{suffix}.txt", "w") as f:
                f.write(buf.getvalue())
        walls, n = [], None
        for i in range(reps + 1):
            spark.sparkContext.setJobDescription(f"{name} rep{i} ({mode})")
            t0 = time.time()
            if mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                n = df.count()
            walls.append(round(time.time() - t0, 3))
        med = round(statistics.median(walls[1:]), 3)
        out[name] = {"cold": walls[0], "warm_median": med, "warm": walls[1:], "rows": n}
        print(f"# {name}: cold {walls[0]} warm_med {med} {walls[1:]} rows {n}",
              file=sys.stderr, flush=True)

    if os.environ.get("BX_DEDUP") == "1":
        from sketch_spark.operators import suffix as _suffix
        from sketch_spark.operators.dedup import DedupConfig, DedupPipeline

        cache = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            ".bench_cache", "transcripts_scale21.parquet",
        )
        t = spark.read.parquet(cache).repartition(2 * cpus, "conv_id").persist()
        t.count()
        _suffix.pretouch_for(spark, t, 2 * cpus)
        wpipe = DedupPipeline(spark, DedupConfig())
        wpipe.run(
            t.where(F.pmod(F.xxhash64("conv_id"), F.lit(10)) == 0)
        )["clusters"].count()
        runs = []
        for i in range(reps):
            spark.catalog.clearCache()
            tt = spark.read.parquet(cache).repartition(2 * cpus, "conv_id").persist()
            tt.count()
            t0 = time.time()
            pipe = DedupPipeline(spark, DedupConfig())
            pipe.run(tt)["clusters"].count()
            wall = round(time.time() - t0, 3)
            stages = {e["stage"]: e.get("seconds") for e in pipe.ckpt.log}
            runs.append(wall)
            print(f"# dedup rep{i}: {wall}s stages={stages} "
                  f"counters={dict(pipe.counters)}", file=sys.stderr, flush=True)
        out["dedup_pipeline"] = {"walls": sorted(runs)}

    print(json.dumps({"sf_dir": sf_dir, "mode": mode, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
