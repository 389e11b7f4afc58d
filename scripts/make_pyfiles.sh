#!/usr/bin/env bash
# Build dist/sketch_spark.zip for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/sketch_spark.zip
# zip only the package sources (no tests, no caches)
find sketch_spark -name '*.py' | grep -v __pycache__ | zip -q dist/sketch_spark.zip -@
echo "dist/sketch_spark.zip:"
unzip -l dist/sketch_spark.zip | tail -2
