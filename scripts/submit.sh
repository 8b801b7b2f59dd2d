#!/usr/bin/env bash
# spark-submit --py-files launch path (north_star: "launched via
# spark-submit --py-files on multi-executor clusters").
#
# Packages crawler_spark/ into a zip and submits the given driver
# script with it on the --py-files classpath — the same launch shape a
# real cluster deployment uses (swap --master for yarn/k8s there).
#
# Usage:
#   scripts/submit.sh <driver.py> [args...]
#   SPARK_MASTER=local[8] scripts/submit.sh scripts/scaling_bench.py --worker 8 /tmp/w
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
STAGE="$(mktemp -d)"
trap 'rm -rf "$STAGE"' EXIT
python - "$REPO" "$STAGE" <<'EOF'
import shutil, sys
repo, stage = sys.argv[1], sys.argv[2]
shutil.make_archive(f"{stage}/crawler_spark", "zip", repo, "crawler_spark")
EOF

# --driver-memory must be a launch flag: by submit time the JVM is
# already up, so spark.driver.memory set inside the app is ignored
# (the in-process pyspark launcher reads it from the builder instead).
exec spark-submit \
  --master "${SPARK_MASTER:-local[32]}" \
  --driver-memory "${SPARK_DRIVER_MEM:-24g}" \
  --py-files "$STAGE/crawler_spark.zip" \
  "$@"
