#!/usr/bin/env bash
# Cluster deployment path (north_rule: "submitted via spark-submit
# --py-files"): package the engine as a zip and run the crawl CLI through
# spark-submit. On a real cluster replace --master local[N] with the
# cluster master URL; everything else is identical.
#
# Usage: tools/submit.sh <pages.parquet> <seeds.parquet> <hosts.parquet> <store_dir> [rounds] [budget] [cores]
set -euo pipefail
cd "$(dirname "$0")/.."

PAGES=$1; SEEDS=$2; HOSTS=$3; STORE=$4
ROUNDS=${5:-1}; BUDGET=${6:-5}; CORES=${7:-8}

ZIP=$(mktemp -d)/webscraper_spark.zip
(python - "$ZIP" <<'EOF'
import os, sys, zipfile
zf = zipfile.ZipFile(sys.argv[1], "w", zipfile.ZIP_DEFLATED)
for root, _, files in os.walk("webscraper_spark"):
    if "__pycache__" in root:
        continue
    for f in files:
        p = os.path.join(root, f)
        zf.write(p, p)
zf.close()
EOF
)

exec spark-submit \
  --master "local[$CORES]" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  tools/submit_launcher.py \
  crawl --pages "$PAGES" --seeds "$SEEDS" --seeds-format "${SEEDS_FORMAT:-parquet}" \
  --hosts "$HOSTS" \
  --store "$STORE" --rounds "$ROUNDS" --budget "$BUDGET"
