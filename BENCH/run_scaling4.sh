#!/usr/bin/env bash
# Round-5 campaign at the r5 kernels (deterministic hot-census routing,
# vectorized winnow selection, per-partition resume plumbing — pipeline
# value-identical, counters asserted per run):
#   (1) 2@1200  (2) 8@1200        -> strong pair 2->8, the regime this
#       single-socket box expresses before DRAM saturation (BASELINE §3b)
#   (3) 32@1200 + SCALING_RECALL  -> re-pin recall/clusters at r5 HEAD
#   (4) 8@4800                    -> weak pair vs 2@1200 (4x cores, 4x data)
# Heap model: 2 GiB/core floored at 16 GiB (run_scaling.sh model).
# An idle gate fronts each run: back-to-back JVMs leave ~1 min of
# shutdown churn in load1 and walls swing 2-5x against it.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="BENCH/scaling_results.jsonl"
mkdir -p BENCH/logs

wait_idle() {
  local budget=300 waited=0
  while [ "$(awk '{print ($1 > 2.5) ? 1 : 0}' /proc/loadavg)" = "1" ] \
      && [ "$waited" -lt "$budget" ]; do
    sleep 15; waited=$((waited + 15))
  done
  echo "# idle-wait ${waited}s (load1 $(cut -d' ' -f1 /proc/loadavg))" >&2
}

run() { # cpus scale mem [extra env...]
  local CPUS="$1" SC="$2" MEM="$3"; shift 3
  local LOG="BENCH/logs/scaling4_c${CPUS}_s${SC}.log"
  wait_idle
  echo "== local[$CPUS] scale $SC mem ${MEM} ==" >&2
  env SCALING_REPEAT=1 SPARK_DRIVER_MEM="${MEM}" "$@" \
    python3 BENCH/scaling.py "$CPUS" "$SC" 2>"$LOG" \
    | tail -1 | tee -a "$OUT"
}

run 2 1200 16g
run 8 1200 16g
run 32 1200 16g SCALING_RECALL=1
run 8 4800 16g
