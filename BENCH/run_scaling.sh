#!/usr/bin/env bash
# Scaling-evidence campaign (north rule: N -> 4N executors, efficiency
# >= 0.8; no real cluster in this sandbox, so the same job runs at two
# local[N] parallelism levels — strong scaling — and at matched
# per-core load — weak scaling).
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

run() { # cpus scale extra-env...
  local CPUS="$1" SC="$2"; shift 2
  echo "== local[$CPUS] scale $SC $* ==" >&2
  env SCALING_REPEAT=1 "$@" python3 BENCH/scaling.py "$CPUS" "$SC" 2>/dev/null \
    | tail -1 | tee -a "$OUT"
}

: > "$OUT"

# strong scaling: fixed input, 3 repeats at 8 and 32 cores, 2 at 2 cores
for REP in 1 2 3; do
  RECALL=0; [ "$REP" = 1 ] && RECALL=1
  run 8  "$SCALE" SCALING_RECALL="$RECALL"
  run 32 "$SCALE"
done
run 2 "$SCALE"
run 2 "$SCALE"

# weak scaling: 4x cores on 4x data (2@300 -> 8@1200 reuses the strong
# runs above; 8@1200 -> 32@4800 needs the big corpus + a bigger driver
# heap: the 46M-turn persist OOMs the default 16g)
run 2 300
SPARK_DRIVER_MEM=96g run 32 $((SCALE * 4))

python3 BENCH/report.py
