#!/usr/bin/env python3
"""Two-cluster-size scaling evidence (north rule: N -> 4N executors,
efficiency >= 0.8).  No real cluster exists in this sandbox; per driver
instruction the same job runs on the same input at local[8] and local[32]
and we report throughput at both + efficiency = T8 / (4 * T32).

Usage:  python3 BENCH/scaling.py <cpus> [scale]
Prints one JSON line with timings + the per-stage counters that prove both
runs did identical work.  BENCH/run_scaling.sh drives both and writes
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sketch_spark import get_spark  # noqa: E402
from sketch_spark.operators.dedup import DedupConfig, DedupPipeline  # noqa: E402
from sketch_spark.sources import synth  # noqa: E402


def corpus_path(scale: int) -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(root, ".bench_cache", f"transcripts_scale{scale}.parquet")


def ensure_corpus(spark, scale: int) -> str:
    path = corpus_path(scale)
    if not os.path.exists(path):
        corpus = synth.generate(synth.SynthConfig(scale=scale))
        t, _, _ = synth.to_spark(spark, corpus)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        t.write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    cpus = int(sys.argv[1])
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    spark = get_spark(
        f"scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=2 * cpus
    )
    path = ensure_corpus(spark, scale)
    t = spark.read.parquet(path).repartition(2 * cpus, "conv_id").persist()
    n_turns = t.count()

    t0 = time.time()
    pipe = DedupPipeline(spark, DedupConfig())
    out = pipe.run(t)
    out["clusters"].count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "cpus": cpus,
                "scale": scale,
                "turns": n_turns,
                "wall_sec": round(wall, 2),
                "turns_per_sec": round(n_turns / wall, 1),
                "stages": {e["stage"]: e.get("seconds") for e in pipe.ckpt.log},
                "counters": pipe.counters,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
