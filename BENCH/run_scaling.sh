#!/usr/bin/env bash
# Scaling-evidence campaign (north rule: N -> 4N executors, efficiency
# >= 0.8; no real cluster in this sandbox, so the same job runs at two
# local[N] parallelism levels — strong scaling — and at matched
# per-core load — weak scaling).
#
# Executor model: every run gets 2 GiB of JVM heap PER CORE, floored at
# 16 GiB.  Per-core: a 4N-executor cluster brings 4N x the memory along
# with 4N x the cores; pinning the heap while quadrupling threads
# starves per-task execution memory and measures spill, not scaling —
# measured: local[32] @ 16g = 191.8 s with cands at 107.7 s vs
# local[32] @ 64g = 144.6 s with cands at 46.7 s, identical counters.
# NOTE (post-campaign, BENCH/diag_c32.json): at scale-1200 the OPPOSITE
# trade was later measured — local[32] with a 16 GiB pinned heap ran
# 1.49x FASTER than warm 64 GiB (502.2 s cold vs 747.8 s warm), because
# a large pre-touched resident heap pushes this host past its reclaim
# boundary (BASELINE.md §3b).  bench.py therefore caps ITS heap at
# 16 GiB; this campaign script deliberately keeps the 2 GiB/core model
# so every jsonl line remains comparable with the earlier entries —
# re-measuring the whole series under a new heap model costs more than
# the divergence is worth.  The two heap models are both recorded in
# their artifacts (mem is derivable from cpus here; bench.py logs its
# cap in its own comment).
# Floor: at low parallelism this ONE JVM holds the whole cached input
# that a real small cluster still spreads across full-memory executor
# nodes — local[2] @ 4g dies outright at scale 1200; and giving the
# small-N side MORE memory can only shrink T_N, which LOWERS the
# reported efficiency T_N/(4*T_4N): the floor is conservative.  The
# primary N -> 4N pair is 2 -> 8 cores: this box has ONE memory bus,
# which >= 8 cores of this workload saturate (local[32] ~ local[8] wall
# at matched per-core memory), whereas real executors each bring their
# own DRAM channels; 8 -> 32 is still run and reported with that
# attribution.
#
# Every invocation appends ONE JSON line to BENCH/scaling_results.jsonl
# immediately (crash-safe); BENCH/report.py derives every headline
# number (median + range) from that file — nothing in BASELINE.md may
# come from anywhere else.
#
# Usage: BENCH/run_scaling.sh [strong_scale]      (default 1200)
set -uo pipefail
cd "$(dirname "$0")/.."
SCALE="${1:-1200}"
OUT="BENCH/scaling_results.jsonl"

mkdir -p BENCH/logs
RUN_N=0

run() { # cpus scale extra-env...
  local CPUS="$1" SC="$2"; shift 2
  local MEM=$((2 * CPUS)); [ "$MEM" -lt 16 ] && MEM=16
  RUN_N=$((RUN_N + 1))
  local LOG="BENCH/logs/scaling_${RUN_N}_c${CPUS}_s${SC}.log"
  echo "== local[$CPUS] scale $SC mem ${MEM}g $* ==" >&2
  env SCALING_REPEAT=1 SPARK_DRIVER_MEM="${MEM}g" "$@" \
    python3 BENCH/scaling.py "$CPUS" "$SC" 2>"$LOG" \
    | tail -1 | tee -a "$OUT"
}

: > "$OUT"

# strong scaling: fixed input, 3 repeats at 2, 8 and 32 cores
for REP in 1 2 3; do
  RECALL=0; [ "$REP" = 1 ] && RECALL=1
  run 2  "$SCALE"
  run 8  "$SCALE" SCALING_RECALL="$RECALL"
  run 32 "$SCALE"
done

# weak scaling: 4x cores on 4x data (2@300 -> 8@1200 and
# 8@1200 -> 32@4800 both reuse the strong runs above)
run 2 300
run 2 300
run 32 $((SCALE * 4))

python3 BENCH/report.py
