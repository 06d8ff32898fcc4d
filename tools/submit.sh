#!/usr/bin/env bash
# spark-submit packaging for multi-executor clusters (BASELINE.json north_rule).
#
# Packages webcrawler_spark/ as a zip shipped to every executor via
# --py-files and submits the dedup pipeline. On a real cluster swap --master
# for yarn/k8s and add --num-executors / executor sizing; everything else is
# identical.
#
# Usage: tools/submit.sh --input DIR --warehouse DIR [--master local[8]] [spark-submit args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="/tmp/webcrawler_spark_pyfiles.zip"

(cd "$REPO" && python - <<'PY'
import zipfile, pathlib
root = pathlib.Path("webcrawler_spark")
with zipfile.ZipFile("/tmp/webcrawler_spark_pyfiles.zip", "w") as z:
    for p in sorted(root.rglob("*.py")):
        z.write(p, p.as_posix())
print("packaged", "/tmp/webcrawler_spark_pyfiles.zip")
PY
)

MASTER="local[8]"
ARGS=()
while [[ $# -gt 0 ]]; do
  case "$1" in
    --master) MASTER="$2"; shift 2 ;;
    *) ARGS+=("$1"); shift ;;
  esac
done

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "$REPO/tools/submit_entry.py" "${ARGS[@]}"
