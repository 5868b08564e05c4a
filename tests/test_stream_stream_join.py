"""Stream-stream join (Structured Streaming): event-time-bounded inner
join of two live streams — the enrichment shape (e.g. click joined to
impression within a window) a CDC platform needs beyond single-stream
windows. State is bounded by the watermark + the join's time-range
condition; correctness is checked against the identical batch join."""

import glob
import os

from pyspark.sql import functions as F


def _staged_streams(spark, smoke_log, tmp_path):
    """Split the WAL into two event streams: inserts (left) and deletes
    (right), staged as parquet dirs the file-stream source tails."""
    log = spark.read.parquet(os.path.join(smoke_log, "part-*.parquet"))
    left_dir = str(tmp_path / "left")
    right_dir = str(tmp_path / "right")
    log.filter(F.col("op") == "I").select(
        F.col("doc_id"), F.col("op_sequence").alias("l_seq"),
        F.col("event_ts").alias("l_ts"),
    ).coalesce(4).write.parquet(left_dir)
    log.filter(F.col("op") == "D").select(
        F.col("doc_id").alias("r_doc_id"), F.col("op_sequence").alias("r_seq"),
        F.col("event_ts").alias("r_ts"),
    ).coalesce(4).write.parquet(right_dir)
    return left_dir, right_dir


def test_stream_stream_time_bounded_join_equals_batch(spark, smoke_log, tmp_path):
    left_dir, right_dir = _staged_streams(spark, smoke_log, tmp_path)
    cond = (
        "doc_id = r_doc_id AND "
        "r_ts >= l_ts AND r_ts <= l_ts + interval 30 minutes"
    )

    # batch ground truth: the identical join over the staged inputs
    bl = spark.read.parquet(left_dir)
    br = spark.read.parquet(right_dir)
    want = {
        (r.doc_id, r.l_seq, r.r_seq)
        for r in bl.join(br, F.expr(cond)).collect()
    }
    assert want, "fixture must produce matches"

    # streaming: watermarks on BOTH sides (required for state cleanup on
    # a stream-stream join); delay exceeds the WAL's out-of-order
    # displacement (~19 min at smoke scale) so no late row is dropped
    # and the result equals the batch join exactly
    sl = (
        spark.readStream.schema(bl.schema).option("maxFilesPerTrigger", 1)
        .parquet(left_dir).withWatermark("l_ts", "2 hours")
    )
    sr = (
        spark.readStream.schema(br.schema).option("maxFilesPerTrigger", 1)
        .parquet(right_dir).withWatermark("r_ts", "2 hours")
    )
    q = (
        sl.join(sr, F.expr(cond))
        .writeStream.format("memory").queryName("ssj_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.doc_id, r.l_seq, r.r_seq)
        for r in spark.table("ssj_out").collect()
    }
    assert got == want
    # the run really was incremental (multiple micro-batches)
    assert len(glob.glob(os.path.join(str(tmp_path / "ckpt"), "offsets", "*"))) >= 2
