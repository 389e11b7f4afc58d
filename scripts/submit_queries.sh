#!/usr/bin/env bash
# Run the full oracle query surface through spark-submit --py-files (the
# deployed driver-contract shape).  Usage:
#   scripts/submit_queries.sh <cores> [run_queries args...]
set -euo pipefail
cd "$(dirname "$0")/.."
CORES="${1:?usage: submit_queries.sh <cores> [--sf-dir ...]}"
shift
scripts/make_pyfiles.sh >&2
exec spark-submit \
  --master "local[${CORES}]" \
  --driver-memory "${SPARK_DRIVER_MEM:-16g}" \
  --py-files dist/sketch_spark.zip \
  scripts/run_queries.py "$@"
