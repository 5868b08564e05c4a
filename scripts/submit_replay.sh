#!/usr/bin/env bash
# Cluster deployment (BASELINE.json:14: "run via spark-submit --py-files
# on a multi-executor cluster at two cluster sizes").
#
# Usage: scripts/submit_replay.sh <wal_dir> <table_or_sink_root> <executors>
#
# The same zip + entry script runs unchanged at N and 4N executors; the
# engine has no Catalyst extensions or native code (pure PySpark), so
# --py-files is the complete deployment unit.
set -euo pipefail

WAL_DIR=${1:?wal dir}
TARGET=${2:?target table (iceberg: cat.db.tbl) or sink root path}
EXECUTORS=${3:?executor count}

REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/beehive_data_etl_spark.zip
(cd "$REPO_DIR" && zip -qr "$ZIP" beehive_data_etl_spark -x '*__pycache__*')

# optional extra confs (semicolon-separated k=v pairs), e.g. a
# node-local spark.local.dir
EXTRA_ARGS=()
if [[ -n "${SUBMIT_EXTRA_CONF:-}" ]]; then
  IFS=';' read -ra _confs <<< "$SUBMIT_EXTRA_CONF"
  for c in "${_confs[@]}"; do
    EXTRA_ARGS+=(--conf "$c")
  done
fi

# deployment carries the SAME tuned confs as the engine's in-process
# session (beehive_data_etl_spark/session.py) — measured round 4: a
# submit job without the pinned heap (G1 on Java 17 uncommits idle
# heap; re-touch page-zeroing stalls jobs for seconds) and without the
# 32 MB input splits (token-array scans need sub-file parallelism) ran
# the identical replay 3x slower than the in-process twin
exec spark-submit \
  --master "${SPARK_MASTER:-yarn}" \
  --deploy-mode client \
  --driver-memory "${DRIVER_MEM:-8g}" \
  --num-executors "$EXECUTORS" \
  --executor-cores "${EXECUTOR_CORES:-4}" \
  --executor-memory "${EXECUTOR_MEM:-8g}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.coalescePartitions.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-512}" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=10000 \
  --conf spark.sql.files.maxPartitionBytes=33554432 \
  --conf spark.sql.parquet.compression.codec=snappy \
  --conf spark.sql.python.filterPushdown.enabled=true \
  --conf "spark.driver.extraJavaOptions=-Xms${DRIVER_MEM:-8g} -XX:+AlwaysPreTouch" \
  --conf "spark.executor.extraJavaOptions=-Xms${EXECUTOR_MEM:-8g} -XX:+AlwaysPreTouch" \
  --py-files "$ZIP" \
  "${EXTRA_ARGS[@]}" \
  "$REPO_DIR/scripts/replay_job.py" "$WAL_DIR" "$TARGET"
