from beehive_data_etl_spark.sinks.snapshot import SnapshotSink  # noqa: F401
