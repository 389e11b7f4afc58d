#!/usr/bin/env bash
# Deploy the dedup pipeline via spark-submit --py-files (north-rule
# deployment surface).  In the sandbox the "cluster" is local[N]; on a real
# cluster replace --master (the script and zip are unchanged).
#
# Usage: scripts/submit_dedup.sh <cores> --input <parquet> [run_dedup args...]
set -euo pipefail
cd "$(dirname "$0")/.."
CORES="${1:?usage: submit_dedup.sh <cores> --input <parquet> ...}"
shift
scripts/make_pyfiles.sh >&2
exec spark-submit \
  --master "local[${CORES}]" \
  --driver-memory "${SPARK_DRIVER_MEM:-16g}" \
  --py-files dist/sketch_spark.zip \
  scripts/run_dedup.py "$@"
