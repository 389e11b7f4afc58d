#!/usr/bin/env bash
# Drive the two-cluster-size scaling evidence (north rule: N -> 4N with
# efficiency >= 0.8; no real cluster in this sandbox, so the same job runs
# on the same input at two local[N] parallelism levels).
#
# Usage: BENCH/run_scaling.sh [scale]   (default 1200 = 11.5M turns)
# Writes one JSON line per parallelism level to BENCH/scaling_results.jsonl;
# fold the numbers into BENCH/BASELINE.md by hand (the prose matters).
set -euo pipefail
cd "$(dirname "$0")/.."
SCALE="${1:-1200}"
OUT="BENCH/scaling_results.jsonl"
: > "$OUT"
for CPUS in 2 8 32; do
  echo "== local[$CPUS] scale $SCALE ==" >&2
  SCALING_REPEAT=1 SCALING_RECALL="$([ "$CPUS" = 8 ] && echo 1 || echo 0)" \
    python3 BENCH/scaling.py "$CPUS" "$SCALE" 2>/dev/null | tee -a "$OUT"
done
