#!/usr/bin/env bash
# Cluster launch (north_rule: run via spark-submit --py-files on a
# multi-executor cluster).  Packages the library and submits the pipeline
# job; on the sandbox this degrades to local[N].
#
# Usage: scripts/submit.sh [--master spark://... ] [pipeline args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/osm_wikidata_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" osm_wikidata_spark)

MASTER="${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.shuffle.partitions="${SPARK_SHUFFLE_PARTITIONS:-200}" \
  "$REPO/scripts/run_pipeline_job.py" "$@"
