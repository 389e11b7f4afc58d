#!/usr/bin/env python3
"""spark-submit driver for the transcript dedup pipeline (north rule:
"deployed via spark-submit --py-files on N and 4N executor clusters").

The sketch_spark package arrives via --py-files (see scripts/submit_dedup.sh
which builds dist/sketch_spark.zip); this file has no repo-relative imports
and works unchanged on a real cluster:

  spark-submit --master <cluster> --py-files dist/sketch_spark.zip \
      scripts/run_dedup.py --input <transcripts.parquet> \
      --output <clusters.parquet> [--checkpoint-dir <dir>] [--json <path>]

Prints one JSON line with wall time, throughput, per-stage seconds, and the
pipeline lineage counters.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcripts parquet path")
    ap.add_argument("--output", default=None, help="clusters parquet output")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="resumable per-stage checkpoint root (parquet/Iceberg stand-in)")
    ap.add_argument("--json", default=None, help="also write the JSON line here")
    ap.add_argument("--tau", type=float, default=None)
    ap.add_argument("--bucket-cap", type=int, default=None)
    args = ap.parse_args()

    from sketch_spark import get_spark
    from sketch_spark.operators.dedup import DedupConfig, DedupPipeline

    # master comes from spark-submit (--master); session-level tuning knobs
    # (AQE, Arrow, ANSI-off) come from get_spark.
    spark = get_spark("dedup-submit", master="inherit")
    par = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(max(2 * par, 8)))

    cfg_kw = {}
    if args.tau is not None:
        cfg_kw["tau"] = args.tau
    if args.bucket_cap is not None:
        cfg_kw["bucket_cap"] = args.bucket_cap
    cfg = DedupConfig(**cfg_kw)

    t = spark.read.parquet(args.input).repartition(max(2 * par, 8), "conv_id").persist()
    n_turns = t.count()
    # warm the Python UDF workers before the clock (one-time pandas/numpy
    # import per worker; a long-running cluster amortizes this to zero)
    spark.range(4 * par).repartition(2 * par).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    t0 = time.time()
    pipe = DedupPipeline(spark, cfg, checkpoint_dir=args.checkpoint_dir)
    out = pipe.run(t)
    if args.output:
        out["clusters"].write.mode("overwrite").parquet(args.output)
    else:
        out["clusters"].count()
    wall = time.time() - t0

    line = json.dumps({
        "turns": n_turns,
        "wall_sec": round(wall, 2),
        "turns_per_sec": round(n_turns / wall, 1),
        "parallelism": par,
        "stages": {e["stage"]: e.get("seconds") for e in pipe.ckpt.log},
        "counters": pipe.counters,
        "checkpoint_dir": args.checkpoint_dir,
        "resumed_stages": [e["stage"] for e in pipe.ckpt.log if e.get("resumed")],
    })
    print(line)
    if args.json:
        with open(args.json, "w") as f:
            f.write(line + "\n")
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
