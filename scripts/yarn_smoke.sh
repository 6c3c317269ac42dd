#!/usr/bin/env bash
# Cluster smoke test — run where a real YARN (or standalone/k8s)
# cluster and HDFS exist; this sandbox has neither, so the script is
# the documented launch path, not a local test (SURVEY.md §2.A).
#
# Usage:
#   DATA_DIR=hdfs:///data/sf100 MASTER=yarn ./scripts/yarn_smoke.sh
#
# What it proves on a real cluster:
#   1. the package zips and ships via --py-files (no install step),
#   2. every query plan builds and executes against cluster-resident
#      parquet (DATA_DIR can be hdfs:/, s3a:/, gs:/ — paths are
#      plain strings throughout the engine),
#   3. AQE + shuffle-partition sizing take effect executor-side.
set -euo pipefail

MASTER="${MASTER:-yarn}"
DATA_DIR="${DATA_DIR:?set DATA_DIR to a cluster-visible sf directory}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"

ZIP="$(mktemp -d)/hadoop_release_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" hadoop_release_spark)

spark-submit \
  --master "$MASTER" \
  --deploy-mode client \
  --name hadoop-release-spark-smoke \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-200}" \
  --conf spark.sql.parquet.aggregatePushdown=true \
  "$REPO/scripts/yarn_smoke_job.py" "$DATA_DIR" "${SMOKE_QUERIES:-d02_agg_groupby,c13_join_star,l01_dedup_exact}"
