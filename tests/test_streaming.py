"""Structured Streaming replay path (SURVEY.md §2 A1/A11): checkpointed
micro-batches via foreachBatch, resume-from-checkpoint, exactly-once."""

from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.sources.eventlog import BASE_ENVELOPE_DDL
from beehive_data_etl_spark.streaming.replay import replay_stream
from beehive_data_etl_spark.verify import compare_final, oracle_final_spark


def test_stream_replay_matches_oracle(spark, smoke_log, tmp_path):
    root = str(tmp_path / "sink")
    sink = SnapshotSink(spark, root, n_buckets=8)
    replay_stream(
        spark,
        smoke_log,
        sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
        schema_ddl=BASE_ENVELOPE_DDL,
        max_files_per_trigger=2,
        watermark=("event_ts", "10 minutes"),
    )
    state = sink.read_state()
    report = compare_final(
        state.filter(~state.deleted), oracle_final_spark(spark, smoke_log)
    )
    assert report["ok"], report
    # multiple micro-batches actually ran
    assert len(sink.current_snapshot()["committed_batches"]) >= 2


def test_stream_resume_from_checkpoint(spark, smoke_log, tmp_path):
    """Run once over the first half of the WAL (staged copy), add the
    remaining files, restart with the SAME checkpoint — the second run
    must consume only the new files and land on the oracle state."""
    import glob
    import os
    import shutil

    staged = str(tmp_path / "wal")
    os.makedirs(staged)
    files = sorted(glob.glob(os.path.join(smoke_log, "part-*.parquet")))
    for f in files[: len(files) // 2]:
        shutil.copy(f, staged)

    root = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    sink = SnapshotSink(spark, root, n_buckets=8)
    replay_stream(spark, staged, sink, ckpt, BASE_ENVELOPE_DDL, max_files_per_trigger=2)
    v_mid = sink.current_snapshot()["version"]
    assert v_mid >= 1

    for f in files[len(files) // 2 :]:
        shutil.copy(f, staged)
    sink2 = SnapshotSink(spark, root, n_buckets=8)
    replay_stream(spark, staged, sink2, ckpt, BASE_ENVELOPE_DDL, max_files_per_trigger=2)
    state = sink2.read_state()
    report = compare_final(
        state.filter(~state.deleted), oracle_final_spark(spark, smoke_log)
    )
    assert report["ok"], report


def test_stream_progress_metrics_emitted(spark, smoke_log, tmp_path):
    """A12: every streaming micro-batch lands in stream_progress.jsonl
    with row counts and the in-plan observed envelope counters."""
    from beehive_data_etl_spark.metrics import read_stream_progress

    root = str(tmp_path / "sink")
    sink = SnapshotSink(spark, root, n_buckets=8)
    replay_stream(
        spark, smoke_log, sink, str(tmp_path / "ckpt"),
        BASE_ENVELOPE_DDL, max_files_per_trigger=4,
    )
    progress = read_stream_progress(
        spark, f"{root}/_metrics/stream_progress.jsonl"
    )
    batches = [p for p in progress if p["num_input_rows"] > 0]
    assert len(batches) >= 2
    assert sum(p["num_input_rows"] for p in batches) >= 3000
    assert any("cdc_envelope" in p["observed"] for p in batches)


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """B29 under REAL readStream (round-1 verdict: the session query was
    batch-twinned only): session_window + watermark + AvailableNow over
    a time-ordered multi-file source. Append mode only emits sessions
    the watermark has closed, so the streamed result must be a SUBSET of
    the batch result and cover everything but the final-batch tail."""
    import time

    from pyspark.sql import functions as F

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    stream_dir = str(tmp_path / "stream_src")
    # four ts-ordered files with increasing mtimes → the file source
    # feeds them oldest-first and the watermark advances between batches
    bounds = events.selectExpr(
        "percentile_approx(ts, array(0.25, 0.5, 0.75), 10000) AS q"
    ).collect()[0]["q"]
    lows = [None, *bounds]
    highs = [*bounds, None]
    for i, (lo, hi) in enumerate(zip(lows, highs)):
        part = events
        if lo is not None:
            part = part.filter(F.col("ts") > lo)
        if hi is not None:
            part = part.filter(F.col("ts") <= hi)
        part.coalesce(1).write.mode("append").parquet(stream_dir)
        time.sleep(1.1)  # distinct mtimes for deterministic file order

    def sessionize(df):
        return (
            df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("session_value"),
            )
            .select(
                "user_id",
                F.unix_timestamp(F.col("session_window.start")).alias("session_start"),
                "n_events",
                "session_value",
            )
        )

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(stream_dir)
        # the fixture's ts is TIMESTAMP_NTZ; watermarks need TIMESTAMP
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "0 seconds")
    )
    q = (
        sessionize(stream)
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = {tuple(r) for r in spark.table("sess_stream").collect()}
    batch_src = spark.read.parquet(stream_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch = {tuple(r) for r in sessionize(batch_src).collect()}
    assert streamed, "streaming emitted nothing"
    assert streamed <= batch, "streamed sessions disagree with batch"
    # only sessions still open at the final watermark may be missing
    assert len(streamed) >= 0.8 * len(batch), (len(streamed), len(batch))


def test_streaming_json_envelope_replay(spark, smoke_log, tmp_path):
    """A1+A2 on the Kafka-shaped path UNDER readStream: the smoke log
    re-serialized as JSON-lines (value string per record, one corrupted
    record injected per file) streamed with from_json parsing +
    validation into the sink — final state must equal the parquet
    oracle, and the poisoned records must be quarantined, not kill the
    stream."""
    import glob as _glob
    import json as _json
    import os

    from beehive_data_etl_spark.operators.validate import validating_transform
    from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
    from beehive_data_etl_spark.sources.json_envelope import parse_json_envelope
    from beehive_data_etl_spark.verify import compare_final, oracle_final_spark

    jdir = str(tmp_path / "json_wal")
    os.makedirs(jdir)
    files = sorted(_glob.glob(os.path.join(smoke_log, "part-*.parquet")))
    for i, f in enumerate(files):
        rows = spark.read.parquet(f).collect()
        with open(os.path.join(jdir, f"part-{i:05d}.jsonl"), "w") as fh:
            for r in rows:
                d = r.asDict()
                d["event_ts"] = d["event_ts"].isoformat() if d.get("event_ts") else None
                fh.write(_json.dumps(d) + "\n")
            fh.write("{this is not json\n")  # poison pill per file

    qdir = str(tmp_path / "quarantine")
    sink = SnapshotSink(spark, str(tmp_path / "sink"), n_buckets=8)
    validator = validating_transform(qdir)

    stream = spark.readStream.schema("value string").text(jdir)

    def _apply(df, epoch_id):
        batch = validator(parse_json_envelope(df))
        sink.apply_batch(batch, f"json-{epoch_id:06d}")

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    state = sink.read_state()
    report = compare_final(
        state.filter(~state.deleted), oracle_final_spark(spark, smoke_log)
    )
    assert report["ok"], report
    bad = spark.read.parquet(qdir)
    assert bad.count() == len(files)  # exactly the poison pills
    assert {r._reject_reason for r in bad.collect()} == {"bad_op"}


def test_streaming_dedup_within_watermark(spark, smoke_log, tmp_path):
    """B30 in TRUE streaming form: duplicate deliveries (a whole WAL
    file re-delivered mid-stream) suppressed by
    dropDuplicatesWithinWatermark on the event key while the state
    stays bounded by the watermark — each (doc_id, op_sequence) must
    come out exactly once."""
    import glob as _glob
    import os
    import shutil as _shutil
    import time as _time

    from pyspark.sql import functions as F

    files = sorted(_glob.glob(os.path.join(smoke_log, "part-*.parquet")))
    stream_dir = str(tmp_path / "dup_wal")
    os.makedirs(stream_dir)
    # deliver files in order; re-deliver file 1 (as a new file) midway —
    # the cross-batch duplicate the in-batch distinct cannot catch
    order = files[:3] + [files[1]] + files[3:]
    for i, f in enumerate(order):
        _shutil.copy(f, os.path.join(stream_dir, f"part-{i:05d}.parquet"))
        _time.sleep(0.05)

    schema = spark.read.parquet(files[0]).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(stream_dir)
        .withColumn("event_ts", F.col("event_ts").cast("timestamp"))
        .withWatermark("event_ts", "1 hour")
        .dropDuplicatesWithinWatermark(["doc_id", "op_sequence"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("dedup_stream").select("doc_id", "op_sequence")
    n_out = out.count()
    n_distinct = out.distinct().count()
    assert n_out == n_distinct, "streaming dedup emitted duplicates"
    expected = (
        spark.read.parquet(*files).select("doc_id", "op_sequence").distinct().count()
    )
    assert n_distinct == expected


def test_auto_files_per_batch_deterministic_and_resumable(
    spark, smoke_log, tmp_path
):
    """files_per_batch='auto' chunks by cumulative footer row counts
    (events per batch), deterministically: greedy prefix accumulation
    means a chunk boundary depends only on the files BEFORE it, so a
    resume — even after the append-only log GREW — re-derives the same
    committed-prefix boundaries and batch ids line up."""
    from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
    from beehive_data_etl_spark.streaming.replay import (
        _chunks_by_events,
        _log_files,
        replay_incremental,
    )
    from beehive_data_etl_spark.verify import compare_final, oracle_final_spark

    files = _log_files(smoke_log)
    chunks = _chunks_by_events(files, 800)
    assert [f for c in chunks for f in c] == files  # partition, in order
    assert all(len(c) >= 2 for c in chunks)  # ~375-row files batch up
    # tiny target → one file per chunk; huge target → one chunk
    assert _chunks_by_events(files, 1) == [[f] for f in files]
    assert _chunks_by_events(files, 10**9) == [files]
    # THE determinism property: chunking the grown log preserves every
    # boundary derived from the shorter prefix (review-found hazard of
    # any global files-per-batch derivation)
    short = _chunks_by_events(files[:5], 800)
    grown = _chunks_by_events(files, 800)
    assert grown[: len(short) - 1] == short[: len(short) - 1]

    sink = SnapshotSink(spark, str(tmp_path / "auto"), n_buckets=4)
    out1 = replay_incremental(
        spark, smoke_log, sink, files_per_batch="auto",
        target_events_per_batch=800, max_batches=2,
    )
    assert len(out1) == 2 and not any(o.get("skipped") for o in out1)
    out2 = replay_incremental(
        spark, smoke_log, sink, files_per_batch="auto",
        target_events_per_batch=800,
    )
    assert [o.get("skipped", False) for o in out2[:2]] == [True, True]
    state = sink.read_state()
    res = compare_final(
        state.filter(~state.deleted), oracle_final_spark(spark, smoke_log)
    )
    assert res["ok"], res

    import pytest

    with pytest.raises(ValueError, match="auto"):
        replay_incremental(spark, smoke_log, sink, files_per_batch="4")
