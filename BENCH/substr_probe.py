#!/usr/bin/env python3
"""Probe: why is the substr stage ~3x slower inside DedupPipeline than
standalone on the identical input?  Times substring_pairs' three internal
phases (winnow+persist / candidate agg / verify) and samples total RSS of
the JVM + python workers once a second.

Usage: python3 BENCH/substr_probe.py standalone|pipeline
"""
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEM", "16g")

MODE = sys.argv[1] if len(sys.argv) > 1 else "standalone"

samples = []
stop = threading.Event()


def rss_mb():
    total_jvm = total_py = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace")
            with open(f"/proc/{pid}/statm") as f:
                rss = int(f.read().split()[1]) * 4096 // (1 << 20)
        except OSError:
            continue
        if "java" in cmd:
            total_jvm += rss
        elif "pyspark.daemon" in cmd or "pyspark.worker" in cmd:
            total_py += rss
    return total_jvm, total_py


def sampler():
    t0 = time.time()
    while not stop.is_set():
        j, p = rss_mb()
        samples.append((round(time.time() - t0, 1), j, p))
        stop.wait(1.0)


threading.Thread(target=sampler, daemon=True).start()

from sketch_spark import get_spark  # noqa: E402
from sketch_spark.operators import suffix, transcripts  # noqa: E402

spark = get_spark(f"substr-probe-{MODE}", master="local[32]", shuffle_partitions=64)
t = spark.read.parquet(".bench_cache/transcripts_scale21.parquet").repartition(64, "conv_id").persist()
t.count()
spark.range(128).repartition(64).mapInPandas(lambda it: it, schema="id long").count()

marks = {}


def mark(name):
    marks[name] = time.time()
    j, p = rss_mb()
    print(f"## t={time.time():.1f} {name}: jvm={j}MB py={p}MB", flush=True)


if MODE == "pipeline":
    from sketch_spark.operators.dedup import DedupConfig, DedupPipeline

    mark("pipeline_start")
    pipe = DedupPipeline(spark, DedupConfig())
    conv = pipe.conv_stage(t)
    sig = pipe.sig_stage(conv)
    exact = pipe.exact_stage(conv)
    cands = pipe.cands_stage(sig)
    verified = pipe.verify_stage(cands, sig, conv)
    mark("prestages_done")
else:
    conv = transcripts.conv_table(t, 3, 42).persist()
    conv.count()
    mark("conv_done")
    if MODE == "standalone_pt":
        from pyspark.sql import functions as F

        total_chars = conv.agg(F.sum(F.length("full_text"))).collect()[0][0]
        per_task = int(total_chars * 1.6 / 64) + 1024
        tpt = time.time()
        touched = suffix.pretouch_arena(spark, 64, per_task)
        print(f"## pretouch: {touched} bytes in {time.time()-tpt:.1f}s "
              f"(per_task_chars={per_task})", flush=True)
        mark("pretouch_done")

# substr with internal phase timing (mirrors suffix.substring_pairs)
t0 = time.time()
fps = suffix.winnow_fingerprints(conv, "full_text", "cid", 200, 50).persist()
n_fps = fps.count()
t1 = time.time()
mark("winnow_done")
sc = suffix.substring_candidate_pairs(fps, "cid", n_fps=n_fps).persist()
n_sc = sc.count()
t2 = time.time()
mark("cands_done")
n_pairs = suffix.verify_substring_pairs(sc, conv, "full_text", "cid", 200).count()
t3 = time.time()
mark("verify_done")
print(f"RESULT mode={MODE} fps={n_fps} sc={n_sc} pairs={n_pairs} "
      f"winnow={t1-t0:.1f}s cands={t2-t1:.1f}s verify={t3-t2:.1f}s total={t3-t0:.1f}s",
      flush=True)
stop.set()
peak_j = max(s[1] for s in samples)
peak_p = max(s[2] for s in samples)
print(f"PEAK jvm={peak_j}MB py={peak_p}MB", flush=True)
for s in samples[:: max(1, len(samples) // 40)]:
    print(f"RSS {s[0]} {s[1]} {s[2]}", flush=True)
spark.stop()
