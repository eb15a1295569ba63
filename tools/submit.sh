#!/usr/bin/env bash
# Package goskema_spark and run it via spark-submit --py-files (north rule).
# Usage: tools/submit.sh <input> <ledger> <run_id> [extra spark-submit args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="/tmp/goskema_spark.zip"
(cd "$REPO" && rm -f "$ZIP" && zip -qr "$ZIP" goskema_spark -x '*__pycache__*')

INPUT="$1"; LEDGER="$2"; RUN_ID="$3"; shift 3 || true
exec spark-submit \
  --master "${SPARK_MASTER:-local[32]}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-32}" \
  --conf spark.sql.optimizer.excludedRules=org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate \
  --py-files "$ZIP" \
  "$@" \
  "$REPO/goskema_spark/__main__.py" \
  --input "$INPUT" --ledger "$LEDGER" --run-id "$RUN_ID"
