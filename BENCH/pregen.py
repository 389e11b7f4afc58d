#!/usr/bin/env python3
"""Parallel corpus pre-generation for the scaling campaign.

synth.generate is single-threaded driver-side Python (~25 min per
scale-1200 chunk); the scale-4800 weak-scaling corpus needs four such
chunks.  Built inline by BENCH/scaling.py:ensure_corpus they serialize
~2 h into the middle of the campaign; built here they run as parallel
worker processes BEFORE any timed run, so measurements never share the
box with generation.  Each worker uses the exact ensure_corpus code
path (same seeds, same "s{i}-" prefixing, same to_spark casts, same
UTC session timezone), so the cached parquet is byte-equivalent data to
what scaling.py would have produced; chunk part-files are hardlinked
into the final directory (readers repartition by conv_id, so file
layout is irrelevant).

Usage:
  python3 BENCH/pregen.py drive          # builds scales 300, 1200, 4800
  python3 BENCH/pregen.py worker <job>   # internal: one generation job
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CHUNK = 1200  # must match BENCH/scaling.py


def corpus_path(scale: int) -> str:  # must match BENCH/scaling.py
    return os.path.join(ROOT, ".bench_cache", f"transcripts_scale{scale}.parquet")


def truth_path(scale: int) -> str:
    return corpus_path(scale).replace("transcripts_", "truth_clusters_")


def chunk_dir(i: int) -> str:
    return os.path.join(ROOT, ".bench_cache", f"chunk4800_{i}")


def _spark():
    from sketch_spark import get_spark

    # small heap: these sessions only convert + write parquet
    os.environ.setdefault("SPARK_DRIVER_MEM", "4g")
    return get_spark("pregen", master="local[1]", shuffle_partitions=8)


def worker(job: str) -> None:
    from pyspark.sql import functions as F

    from sketch_spark.sources import synth

    spark = _spark()
    if job == "s300":
        corpus = synth.generate(synth.SynthConfig(scale=300))
        t, _, tc = synth.to_spark(spark, corpus)
        t.write.mode("overwrite").parquet(corpus_path(300))
        tc.write.mode("overwrite").parquet(truth_path(300))
    else:  # "c0".."c3": scale-4800 chunk i (c0 doubles as scale-1200)
        i = int(job[1:])
        corpus = synth.generate(synth.SynthConfig(seed=42 + i, scale=CHUNK))
        t, _, tc = synth.to_spark(spark, corpus)
        if i == 0:
            # chunk 0 is generate(seed=42, scale=1200) — identical to the
            # scale-1200 strong-scaling corpus before prefixing
            t.write.mode("overwrite").parquet(corpus_path(CHUNK))
            tc.write.mode("overwrite").parquet(truth_path(CHUNK))
        pre = F.lit(f"s{i}-")
        d = chunk_dir(i)
        t.withColumn("conv_id", F.concat(pre, "conv_id")).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "transcripts"))
        tc.select(
            F.concat(pre, "conv_id").alias("conv_id"),
            F.concat(pre, "cluster_id").alias("cluster_id"),
        ).write.mode("overwrite").parquet(os.path.join(d, "truth"))
    spark.stop()


def combine_4800() -> None:
    for sub, final in (("transcripts", corpus_path(4800)), ("truth", truth_path(4800))):
        if os.path.exists(final):
            shutil.rmtree(final)
        os.makedirs(final)
        for i in range(4):
            # per-CHUNK assert: a stale/partially-cleaned chunk dir whose
            # glob matches nothing must fail here, not ship a scale-4800
            # corpus with a quarter of the data silently missing (the old
            # total-across-chunks n >= 4 could pass with an empty chunk)
            files = glob.glob(os.path.join(chunk_dir(i), sub, "part-*.parquet"))
            assert files, f"{final}: chunk {i} contributes no part files"
            for f in files:
                os.link(f, os.path.join(final, f"c{i}-{os.path.basename(f)}"))
        open(os.path.join(final, "_SUCCESS"), "w").close()
    # completion marker so scaling.ensure_corpus accepts the combined
    # corpus without rebuilding (its append-mode build path writes the
    # same marker)
    with open(corpus_path(4800) + ".complete", "w") as f:
        json.dump({"scale": 4800, "chunks": 4, "via": "pregen.combine_4800"}, f)


def drive() -> None:
    t0 = time.time()
    jobs = ["c0", "c1", "c2", "c3", "s300"]
    logs = {
        j: open(os.path.join(ROOT, "BENCH", "logs", f"pregen_{j}.log"), "w")
        for j in jobs
    }
    procs = {
        j: subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker", j],
            cwd=ROOT,
            stdout=logs[j],
            stderr=subprocess.STDOUT,
        )
        for j in jobs
    }
    fail = [j for j, p in procs.items() if p.wait() != 0]
    for fh in logs.values():
        fh.close()
    assert not fail, f"pregen workers failed: {fail}"
    combine_4800()
    for scale in (300, 1200, 4800):
        assert os.path.exists(corpus_path(scale)) and os.path.exists(
            truth_path(scale)
        ), scale
    print(f"pregen done in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    os.makedirs(os.path.join(ROOT, "BENCH", "logs"), exist_ok=True)
    {"drive": drive}.get(sys.argv[1], lambda: worker(sys.argv[2]))()
