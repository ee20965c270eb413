#!/usr/bin/env bash
# Run the CDC replay via spark-submit --py-files (the north_rule's
# deployment form). Packages datax_spark into a zip, ships it to the
# (local-mode) cluster, and executes the CLI with a replay job spec.
#
# Usage: tools/submit_replay.sh <job.json> [master] [extra spark-submit args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
JOB="${1:?usage: submit_replay.sh <job.json> [master]}"
MASTER="${2:-local[8]}"
shift || true; shift || true

ZIP="$(mktemp -d)/datax_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" datax_spark -x '*__pycache__*')

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.objectHashAggregate.sortBased.fallbackThreshold=1000000 \
  "$@" \
  "$REPO/datax_spark/cli.py" --job "$JOB"
