"""spark-submit entry point: checkpointed Structured-Streaming replay of
a WAL directory into the CDC sink (SURVEY.md §3.2 E1).

Chooses the Iceberg adapter when the runtime is on the classpath and the
target looks like a table identifier; otherwise the snapshot sink.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession

from beehive_data_etl_spark.sinks.iceberg import IcebergSink, iceberg_available
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.sources.eventlog import BASE_ENVELOPE_DDL
from beehive_data_etl_spark.streaming.replay import replay_stream


def main() -> None:
    wal_dir, target = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName("beehive-cdc-replay").getOrCreate()
    if iceberg_available(spark) and "/" not in target:
        sink = IcebergSink(spark, target)
    else:
        sink = SnapshotSink(spark, target, n_buckets=4096, salt_partials=8)
    replay_stream(
        spark,
        wal_dir,
        sink,
        checkpoint_dir=f"{target.rstrip('/')}/_checkpoint"
        if "/" in target
        else f"/tmp/ckpt-{target.replace('.', '-')}",
        schema_ddl=BASE_ENVELOPE_DDL,
        max_files_per_trigger=8,
        watermark=("event_ts", "10 minutes"),
    )


if __name__ == "__main__":
    main()
