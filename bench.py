#!/usr/bin/env python3
"""Benchmark harness: headline queries + transcript dedup throughput.

Prints ONE JSON line.  FROZEN ARTIFACT SCHEMA (v1 — round-over-round
comparisons depend on these fields; add, never rename/remove):

  metric              "end_to_end_bench_seconds"
  value               sum of warm-median query walls + median dedup wall
  unit                "sec"
  queries             {name: warm-median seconds} + "dedup_pipeline"
  queries_cold        {name: first-execution seconds} (JVM one-time costs)
  sf                  scale factor parsed from SPARK_GRAFT_SF_DIR
  dedup_turns         corpus size actually benchmarked
  dedup_turns_per_sec dedup_turns / median dedup wall
  cpus                local[N]
  counters            pipeline lineage counters of the MEDIAN rep
  counters_expected   pinned counters for the default corpus (null when
                      BENCH_TURNS deviates from the pinned scale)
  counters_match      counters == counters_expected (null when not pinned);
                      false means the walls compare DIFFERENT WORK — treat
                      any timing delta as unattributable until resolved
  dedup_stages        per-stage seconds of the median rep
  dedup_rep_walls     all rep walls, sorted
  load1_at_start      host load after the idle gate (comparability signal)
  idle_wait_s         seconds spent in the idle gate
  protocol            measurement protocol descriptor (reps, statistics,
                      warmup inventory, idle gate) — if two artifacts have
                      different protocol values, do not compare them

Protocol (see BENCH/BASELINE.md §3b for why): bounded idle-wait, untimed
warmup (table scan, shuffle, Python workers, kernel arena pre-touch,
10%-sample pipeline rep), then 1 cold + BENCH_QUERY_REPS warm runs per
query (warm MEDIAN reported) and BENCH_PIPELINE_REPS full pipeline reps
(median_low reported, stages/counters paired with that rep).

Env:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  BENCH_TURNS          approx synthetic transcript turns for the dedup run
                       (default 200_000)
  BENCH_QUERY_REPS / BENCH_PIPELINE_REPS / BENCH_IDLE_WAIT_S  see below
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sketch_spark import get_spark  # noqa: E402

# Pinned lineage counters for the DEFAULT bench corpus (BENCH_TURNS=200000
# -> synth scale 21 -> 199,825 turns, seed 42).  Identical across rounds
# 2-4; any drift means the bench is timing DIFFERENT WORK (a plan change
# that altered candidate generation, a synth change, a routing bug) and
# the artifact flags it via counters_match=false (VERDICT r4 #7).
PINNED_TURNS = 199_825
PINNED_COUNTERS = {
    "convs": 8149,
    "exact_pairs": 721,
    "candidate_pairs": 100328,
    "verified_pairs": 99613,
    "substring_pairs": 9659,
    "cc_iterations": 2,
    "clusters": 4684,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    turns_target = int(os.environ.get("BENCH_TURNS", "200000"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    # executor-model heap: 2 GiB per core, capped at 16 GiB.  The cap is
    # measured, not guessed: BENCH/diag_c32.json shows the identical
    # local[32] job 1.49x FASTER with a 16 GiB pinned heap than warm with
    # 64 GiB — on this host a large pre-touched resident heap pushes the
    # guest past its reclaim boundary and every Python-worker slab
    # allocation serializes on the hypervisor's slow page-population path
    # (BENCH/BASELINE.md section 3b).  The cap is a trade, not a free win:
    # at scale-1200 the diag's own stage table shows cands pays a little
    # for it (67.9 s warm/64 GiB -> 78.1 s cold/16 GiB, and an earlier
    # 16 GiB local[32] run spilled cands to 107.7 s — run_scaling.sh
    # header), traded against the much larger page-population loss.  At
    # BENCH scale (sf0.1, 200k turns) 16 GiB never spills (round-2 ran
    # the same work in 16 GiB).  SPARK_DRIVER_MEM still overrides.
    os.environ.setdefault("SPARK_DRIVER_MEM", f"{min(2 * cpus, 16)}g")

    # Idle-box guard (VERDICT r3 #10): a busy host inflates every number
    # 2-5x through the same page-population path; the artifact must say so
    # instead of leaving a regression ambiguous between host and plan.
    # Bounded idle-wait first: the harness is often launched right after
    # other JVM work whose shutdown churn sits in load1 for ~1 min — a
    # short wait buys a comparable artifact; a persistent load means real
    # contention and the artifact records it instead of waiting forever.
    wait_budget = float(os.environ.get("BENCH_IDLE_WAIT_S", "180"))
    waited = 0.0
    while os.getloadavg()[0] > 2.0 and waited < wait_budget:
        time.sleep(10)
        waited += 10
    load1 = os.getloadavg()[0]
    if waited:
        print(
            f"# idle-wait: {waited:.0f}s (load1 now {load1:.2f})",
            file=sys.stderr,
        )
    if load1 > 2.0:
        print(
            f"# WARNING: host not idle (load1={load1:.2f}) — walls below "
            "are not comparable across rounds", file=sys.stderr,
        )
    spark = get_spark("sketch-spark-bench", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus)

    from sketch_spark.plans import entry_queries as EQ

    # Untimed warmup: scan the input tables once (page cache), run one
    # small shuffle (JVM heap population — this host faults fresh pages at
    # ~200 MB/s, a tax long-running executors never pay), and spin up the
    # Python UDF workers.  The timed region below measures the query
    # plans, not JVM/interpreter startup.
    warm_t0 = time.time()
    for tbl in ("documents", "lineitem", "orders", "events", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{tbl}.parquet").count()
    from pyspark.sql import functions as F

    # NB: GroupedData.count() is a TRANSFORMATION (returns a DataFrame);
    # the warmup shuffle only runs if the chain ends in an action (the
    # round-3 artifact paid ~10 s of first-query page population because
    # this line silently did nothing — VERDICT r3 #1).
    spark.range(50_000_000).repartition(2 * cpus, "id").groupBy(
        F.pmod("id", F.lit(97))
    ).count().count()
    spark.range(4 * cpus).repartition(2 * cpus).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    print(f"# warmup {time.time() - warm_t0:.1f}s", file=sys.stderr)

    # Bounded wait-for-idle: back-to-back runs on this box leave the prior
    # JVM's shutdown churn in load1 for ~1 min, and queries timed against
    # it swing 3-5x (q01 2.2 s idle vs 8.6 s at load1=10.9, identical
    # code).  Waiting is free and keeps the artifact attributable.
    wait_t0 = time.time()
    while os.getloadavg()[0] > 2.0 and time.time() - wait_t0 < 60:
        time.sleep(5)
    if time.time() - wait_t0 >= 5:
        print(f"# waited {time.time() - wait_t0:.0f}s for idle "
              f"(load1 now {os.getloadavg()[0]:.2f})", file=sys.stderr)

    # Repeat-warm protocol, same as the scaling campaign (BENCH/scaling.py)
    # and the dedup rep below: each query runs once cold then BENCH_QUERY_REPS
    # warm times; the headline ("queries") is the warm MEDIAN, the cold wall
    # is preserved in "queries_cold".  The first execution of each plan in a
    # fresh JVM pays one-time costs a long-running cluster amortizes (codegen
    # compilation, execution-memory slab page population — BASELINE.md
    # §3b/§7), and single warm executions still swing 3-5x with this host's
    # reclaim state; the median pins the plan cost.  Both numbers stay in
    # the artifact so any regression is attributable from the JSON alone.
    timings: dict[str, float] = {}
    timings_cold: dict[str, float] = {}
    headline = [
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
    reps = int(os.environ.get("BENCH_QUERY_REPS", "3"))
    for name in headline:
        walls = []
        for _ in range(reps + 1):
            t0 = time.time()
            n = EQ.QUERIES[name](spark, sf_dir).count()
            walls.append(round(time.time() - t0, 3))
        timings_cold[name] = walls[0]
        # true median (statistics convention, averaging the middle pair at
        # even rep counts — ws[len//2] silently picked the upper-middle,
        # i.e. the MAX at reps=2)
        timings[name] = round(statistics.median(walls[1:]), 3)
        print(f"# {name}: {n} rows, warm median {timings[name]}s "
              f"(cold {walls[0]}s, warm reps {walls[1:]})", file=sys.stderr)

    # transcript dedup pipeline on a deterministic synthetic corpus
    from sketch_spark.operators.dedup import DedupConfig, DedupPipeline
    from sketch_spark.sources import synth

    base_turns = 9_710  # measured turns of scale=1 corpus (seed 42)
    scale = max(1, round(turns_target / base_turns))
    gen_t0 = time.time()
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache", f"transcripts_scale{scale}.parquet")
    # _SUCCESS, not bare existence: a killed write leaves a readable
    # partial dir that would silently bench a truncated corpus
    if os.path.exists(os.path.join(cache, "_SUCCESS")):
        t = spark.read.parquet(cache)
        n_turns = t.count()
        print(f"# corpus: {n_turns} turns (scale {scale}) from cache", file=sys.stderr)
    else:
        corpus = synth.generate(synth.SynthConfig(scale=scale))
        n_turns = len(corpus.transcripts)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        t, _, _ = synth.to_spark(spark, corpus)
        t.write.mode("overwrite").parquet(cache)
        t = spark.read.parquet(cache)
        print(f"# corpus: {n_turns} turns (scale {scale}) generated in "
              f"{time.time() - gen_t0:.1f}s", file=sys.stderr)
    t = t.repartition(2 * cpus, "conv_id").persist()
    t.count()
    # Spin up the Python UDF workers before starting the clock: each of the
    # ~cpus workers pays a one-time pandas/numpy import (~14 s total at 32
    # cores, measured) that a long-running cluster amortizes to zero.  The
    # timed region below measures the pipeline, not interpreter startup.
    warm_t0 = time.time()
    spark.range(4 * cpus).repartition(2 * cpus).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    print(f"# python workers warmed in {time.time() - warm_t0:.1f}s", file=sys.stderr)
    # Populate each worker's kernel arena (suffix._ARENA) before the clock
    # starts: first-touch page population runs at ~45 MB/s on this host
    # (BENCH/BASELINE.md §3b) and lands wherever the first winnowing task
    # runs — measured as a stochastic 10-130 s swing of the substr stage
    # (substr total 10.3 s with pre-touched arenas vs 63-139 s cold,
    # identical code/input/counters; BENCH/logs/substr_probe_*.out).  A
    # long-running executor pays this once per lifetime; this benchmark
    # recreates all 32 workers per run, so without the pre-touch the timed
    # region measures the sandbox's page-population path, not the plan.
    warm_t0 = time.time()
    from sketch_spark.operators import suffix as _suffix

    # shared sizing policy with BENCH/scaling.py — one implementation
    touched = _suffix.pretouch_for(spark, t, 2 * cpus)
    print(f"# worker arenas pre-touched ({touched >> 20} MB reported) in "
          f"{time.time() - warm_t0:.1f}s", file=sys.stderr)
    # Untimed full warm rep, then BENCH_PIPELINE_REPS timed reps with the
    # warm MEDIAN as headline — the same repeat-warm protocol as the
    # scaling campaign (BENCH/scaling.py) and the query loop above.
    # The first pipeline execution in a fresh JVM pays a one-time
    # page-population tax for execution-memory slabs and shuffle buffers
    # that the arena pre-touch cannot reach (Python-side only): measured
    # same-session 29.6 s -> 16.7 s -> 15.0 s with the cache cleared
    # between reps, with substr absorbing most of it (14.1 -> 5.3 s).
    # Long-running executors pay this once per lifetime; this benchmark
    # recreates the JVM per run, so without the warm rep the timed region
    # measures the sandbox's reclaim state (walls swung 16 s vs 26 s on
    # identical code purely with host page state — BASELINE.md §7), and
    # even warm single reps swing ~2x under the host's reclaim churn.
    def fresh_corpus():
        spark.catalog.clearCache()
        tt = spark.read.parquet(cache).repartition(2 * cpus, "conv_id").persist()
        tt.count()
        return tt

    # Sampled (~10% of convs) untimed warm rep: compiles every stage's
    # codegen classes and first-touches each worker's hot code paths at a
    # tenth of the full run's wall; the residual slab-population delta the
    # sample can't reach lands in the first timed rep, which the median
    # discards.
    warm_t0 = time.time()
    wpipe = DedupPipeline(spark, DedupConfig())
    wsample = t.where(F.pmod(F.xxhash64("conv_id"), F.lit(10)) == 0)
    wpipe.run(wsample)["clusters"].count()
    print(f"# pipeline warm rep (untimed, 10% sample) in "
          f"{time.time() - warm_t0:.1f}s", file=sys.stderr)
    p_reps = int(os.environ.get("BENCH_PIPELINE_REPS", "3"))
    runs = []
    for i in range(p_reps):
        t = fresh_corpus()  # also drops the prior rep's persisted stages
        t0 = time.time()
        pipe = DedupPipeline(spark, DedupConfig())
        out = pipe.run(t)
        out["clusters"].count()
        wall = round(time.time() - t0, 3)
        stages = {e["stage"]: e.get("seconds") for e in pipe.ckpt.log}
        runs.append((wall, stages, pipe))
        print(f"# dedup rep {i}: {wall}s stages={stages}", file=sys.stderr)
    runs.sort(key=lambda r: r[0])
    # median_low: an actual element (its stage log and counters stay
    # paired with the reported wall); identical to the median at odd rep
    # counts, lower-middle instead of upper-middle at even ones
    dedup_s, stage_s, pipe = runs[(len(runs) - 1) // 2]
    timings["dedup_pipeline"] = dedup_s
    tps = round(n_turns / dedup_s, 1)
    print(f"# dedup: {n_turns} turns in {dedup_s}s (median of "
          f"{[r[0] for r in runs]}) = {tps} turns/s; "
          f"stages={stage_s}; counters={pipe.counters}", file=sys.stderr)

    pinned = n_turns == PINNED_TURNS
    counters_match = (dict(pipe.counters) == PINNED_COUNTERS) if pinned else None
    if counters_match is False:
        diff = {
            k: (PINNED_COUNTERS.get(k), pipe.counters.get(k))
            for k in set(PINNED_COUNTERS) | set(pipe.counters)
            if PINNED_COUNTERS.get(k) != pipe.counters.get(k)
        }
        print(
            "# COUNTER MISMATCH vs pinned set (expected, got): "
            f"{diff} — walls below time DIFFERENT WORK", file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "end_to_end_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "dedup_turns": n_turns,
        "dedup_turns_per_sec": tps,
        "cpus": cpus,
        "counters": pipe.counters,
        "dedup_stages": stage_s,
        "dedup_rep_walls": sorted(r[0] for r in runs),
        "queries_cold": timings_cold,
        "load1_at_start": round(load1, 2),
        "idle_wait_s": round(waited, 1),
        "counters_expected": PINNED_COUNTERS if pinned else None,
        "counters_match": counters_match,
        "protocol": {
            "version": 1,
            "query_reps": reps,
            "pipeline_reps": p_reps,
            "query_stat": "warm_median",
            "pipeline_stat": "median_low",
            "warmup": "scan+shuffle+py-workers+arena-pretouch+10pct-sample-rep",
            "idle_gate_load1": 2.0,
            "driver_mem": os.environ.get("SPARK_DRIVER_MEM"),
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
