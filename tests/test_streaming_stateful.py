"""Custom stateful streaming operator (applyInPandasWithState): the
per-key LWW changelog must emit exactly the net-new versions across
micro-batches and ignore stale/duplicate deliveries."""

from beehive_data_etl_spark.sources.eventlog import BASE_ENVELOPE_DDL
from beehive_data_etl_spark.streaming.stateful import streaming_lww_latest


def test_streaming_lww_changelog(spark, smoke_log, tmp_path):
    events = (
        spark.readStream.schema(BASE_ENVELOPE_DDL)
        .option("maxFilesPerTrigger", 2)
        .parquet(smoke_log)
        .select("doc_id", "op_sequence", "op", "n_tok", "event_ts")
    )
    changelog = streaming_lww_latest(events)
    q = (
        changelog.writeStream.outputMode("append")
        .format("memory")
        .queryName("lww_changelog")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql(
        "SELECT doc_id, max(op_sequence) AS last_seq, count(*) AS n_updates "
        "FROM lww_changelog GROUP BY doc_id"
    ).collect()
    got = {r.doc_id: (r.last_seq, r.n_updates) for r in out}

    log = spark.read.parquet(smoke_log)
    expected = {
        r.doc_id: r.last_seq
        for r in log.groupBy("doc_id")
        .agg({"op_sequence": "max"})
        .withColumnRenamed("max(op_sequence)", "last_seq")
        .collect()
    }
    assert set(got) == set(expected)
    for doc, (last_seq, n_updates) in got.items():
        # final emitted version is the true LWW winner…
        assert last_seq == expected[doc], doc
        # …and updates are monotone: at most one emit per micro-batch
        assert n_updates >= 1


def test_drop_duplicates_within_watermark(spark, smoke_log, tmp_path):
    """Arrival-order dedup of verbatim duplicate deliveries via
    dropDuplicatesWithinWatermark (B30 streaming form): duplicates in
    the log collapse to one row per (doc_id, op_sequence)."""
    from beehive_data_etl_spark.sources.eventlog import BASE_ENVELOPE_DDL

    ev = (
        spark.readStream.schema(BASE_ENVELOPE_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(smoke_log)
        .select("doc_id", "op_sequence", "event_ts")
        .withWatermark("event_ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["doc_id", "op_sequence"])
    )
    q = (
        ev.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_out = spark.sql("select count(*) c from dedup_stream").collect()[0].c
    log = spark.read.parquet(smoke_log)
    n_raw = log.count()
    n_unique = log.select("doc_id", "op_sequence").distinct().count()
    assert n_raw > n_unique  # the fixture really contains duplicates
    assert n_out == n_unique
