#!/usr/bin/env bash
# Round-4 campaign: (1) the work-matched weak pair's missing side 8@4800
# (the one BASELINE gate still lacking a number after round 3), then
# (2)+(3) re-measure 2@1200 and 8@1200 under the CURRENT kernels — the
# round-4 arena rewrite (26dd110) changed the winnowing/verify kernels,
# and a weak/strong efficiency quoted across code revisions would be
# confounded (the jsonl now records rev+heap per line, so old and new
# entries coexist self-describingly) — then (4) the warm-protocol
# low-heap local[32]@1200 rep that BASELINE §3b flags as the missing
# reproduction of the single-cold-run diag_c32.json finding.
# Heap model: 2 GiB/core floored at 16 GiB for (1)-(3) (run_scaling.sh
# model); (4) pins 16 GiB deliberately — that IS the experiment.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="BENCH/scaling_results.jsonl"
mkdir -p BENCH/logs

run() { # cpus scale mem
  local CPUS="$1" SC="$2" MEM="$3"
  local LOG="BENCH/logs/scaling3_c${CPUS}_s${SC}_m${MEM}.log"
  echo "== local[$CPUS] scale $SC mem ${MEM} ==" >&2
  env SCALING_REPEAT=1 SPARK_DRIVER_MEM="$MEM" \
    python3 BENCH/scaling.py "$CPUS" "$SC" 2>"$LOG" \
    | tail -1 | tee -a "$OUT"
}

run 8 4800 16g
run 2 1200 16g
run 8 1200 16g
run 32 1200 16g
