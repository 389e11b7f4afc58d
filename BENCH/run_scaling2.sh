#!/usr/bin/env bash
# Continuation of BENCH/run_scaling.sh, re-planned after the rep-1 results
# (see BENCH/scaling_results.jsonl lines 1-3):
#
#   * local[32] @ scale-1200 measured SLOWER than local[8] on identical
#     work (747.8 s vs 404.8 s warmed, identical counters), with the warm
#     substr pass slower than the cold one in the same JVM.  That is the
#     single-memory-bus saturation this script's predecessor predicted
#     ("the primary N -> 4N pair is 2 -> 8 cores"), now measured; >= 8
#     concurrent winnowing workers on one DRAM controller thrash instead
#     of scale.  BENCH/busprobe.py (run first, untimed, idle box)
#     records the pure-memcpy version of the same inversion as the
#     attribution evidence.
#   * Consequently the planned local[32] @ scale-4800 weak run (est. 3-4 h
#     of measuring that same saturation) is replaced by local[8] @
#     scale-4800: the weak pair 2@1200 -> 8@4800 (4x cores, 4x data) stays
#     inside the <= 8-core regime where the box can physically scale, and
#     costs ~1 h.  local[32] is still re-run at scale-1200 so the
#     saturation number is a reproduced median, not a one-off.
#
# Protocol, heap model and the append-only jsonl contract are identical to
# run_scaling.sh (same run() body); results append to the same
# BENCH/scaling_results.jsonl.  The heap model stays 2 GiB/core (floored
# at 16 GiB) even though BENCH/diag_c32.json later measured a 16 GiB cap
# FASTER at local[32] — comparability with the existing jsonl entries
# wins; see the post-campaign NOTE in run_scaling.sh's header.  Expensive runs are ordered so a wall-clock
# cutoff costs the least-valuable rep.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="BENCH/scaling_results.jsonl"

mkdir -p BENCH/logs
RUN_N=0

run() { # cpus scale extra-env...
  local CPUS="$1" SC="$2"; shift 2
  local MEM=$((2 * CPUS)); [ "$MEM" -lt 16 ] && MEM=16
  RUN_N=$((RUN_N + 1))
  local LOG="BENCH/logs/scaling2_${RUN_N}_c${CPUS}_s${SC}.log"
  echo "== local[$CPUS] scale $SC mem ${MEM}g $* ==" >&2
  env SCALING_REPEAT=1 SPARK_DRIVER_MEM="${MEM}g" "$@" \
    python3 BENCH/scaling.py "$CPUS" "$SC" 2>"$LOG" \
    | tail -1 | tee -a "$OUT"
}

# untimed, idle-box: memory-bus saturation probe (attribution evidence)
python3 BENCH/busprobe.py | tee BENCH/busprobe.json

# weak pair 2@300 -> 8@1200 (c8@1200 reps come from the strong series)
run 2 300
run 2 300
run 2 300
# strong series reps 2,3 at 8 cores
run 8 1200
run 8 1200
# weak pair 2@1200 -> 8@4800 (4x cores, 4x data)
run 8 4800
# local[32] rep 2: reproduce the saturation number
run 32 1200
# strong series rep 3 at 2 cores (rep 2 ran under run_scaling.sh)
run 2 1200
# local[32] rep 3 — least informative, first to cut at the wall clock
run 32 1200

python3 BENCH/report.py
