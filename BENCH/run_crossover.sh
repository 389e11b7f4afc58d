#!/usr/bin/env bash
# Verify-prefilter crossover measurement (VERDICT r3 #7): the same
# 8@1200 job with the MinHash pre-filter forced each way; the campaign's
# auto-decided 8@1200 run already covers whichever side the policy chose,
# so pass the side(s) to run explicitly:  BENCH/run_crossover.sh off
# Walls land in the jsonl as their own series (r4-pfoff / r4-pfon);
# BASELINE.md §7b quotes both plus the auto policy's decision inputs.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="BENCH/scaling_results.jsonl"
mkdir -p BENCH/logs
for PF in "${@:-off on}"; do
  LOG="BENCH/logs/crossover_c8_s1200_pf${PF}.log"
  echo "== local[8] scale 1200 prefilter=$PF ==" >&2
  env SCALING_REPEAT=1 SPARK_DRIVER_MEM=16g SCALING_PREFILTER="$PF" \
    python3 BENCH/scaling.py 8 1200 2>"$LOG" \
    | tail -1 | tee -a "$OUT"
done
