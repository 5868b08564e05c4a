#!/usr/bin/env bash
# Deploy the decoupled table subscriber (scripts/subscribe_job.py):
# tails <src_table_root>'s changelog through the Python Data Source
# stream into a replica at <dst_table_root>, cursor = the Spark
# checkpoint. Same --py-files unit as submit_replay.sh.
#
# Usage: scripts/submit_subscribe.sh <src_table_root> <dst_table_root> <executors>
# Env:   SUBSCRIBE_ONCE=1 for the drain-and-exit cron shape; see
#        scripts/subscribe_job.py for all knobs.
set -euo pipefail

SRC=${1:?source table root}
DST=${2:?replica table root}
EXECUTORS=${3:?executor count}

REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/beehive_data_etl_spark.zip
(cd "$REPO_DIR" && zip -qr "$ZIP" beehive_data_etl_spark -x '*__pycache__*')

exec spark-submit \
  --master "${SPARK_MASTER:-yarn}" \
  --deploy-mode client \
  --driver-memory "${DRIVER_MEM:-8g}" \
  --num-executors "$EXECUTORS" \
  --executor-cores "${EXECUTOR_CORES:-4}" \
  --executor-memory "${EXECUTOR_MEM:-8g}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-512}" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.python.filterPushdown.enabled=true \
  --py-files "$ZIP" \
  "$REPO_DIR/scripts/subscribe_job.py" "$SRC" "$DST"
