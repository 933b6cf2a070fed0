#!/usr/bin/env bash
# Package the engine and launch the crawl via spark-submit --py-files.
# Usage: tools/submit_crawl.sh [--master local[8]] [submit_crawl.py args...]
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="local[8]"
if [[ "${1:-}" == "--master" ]]; then
  MASTER="$2"
  shift 2
fi

ZIP=$(mktemp -u /tmp/mongodb_postproc_spark.XXXX.zip)
trap 'rm -f "$ZIP"' EXIT
python -c "
import shutil, sys
shutil.make_archive('${ZIP%.zip}', 'zip', '.', 'mongodb_postproc_spark')
"

exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=16 \
  --conf spark.driver.memory=8g \
  --conf "spark.driver.extraJavaOptions=-Xms8g -XX:+AlwaysPreTouch" \
  --py-files "$ZIP" \
  tools/submit_crawl.py "$@"
