"""Skew handling (SURVEY.md §5.7): Zipf(1.6) hot keys replayed with the
explicit salting path stay correct, and the salted partial reduction
actually splits hot keys across reducers."""

from pyspark.sql import functions as F

from beehive_data_etl_spark.operators.lww import lww_dedup
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.streaming.replay import replay_incremental
from beehive_data_etl_spark.verify import compare_final, oracle_final_spark


def test_skewed_replay_correct_with_salting(spark, skew_log, tmp_path):
    root = str(tmp_path / "sink")
    sink = SnapshotSink(spark, root, n_buckets=8, salt_partials=8)
    replay_incremental(spark, skew_log, sink, files_per_batch=2)
    state = sink.read_state()
    report = compare_final(
        state.filter(~state.deleted), oracle_final_spark(spark, skew_log)
    )
    assert report["ok"], report


def test_hot_key_is_actually_hot_and_salted(spark, skew_log):
    """Sanity: the fixture really is skewed (top key ≫ median) and the
    salted first phase reduces a hot key's rows by ~the event/salt
    ratio before the final per-key shuffle."""
    df = spark.read.parquet(skew_log)
    counts = df.groupBy("doc_id").count()
    stats = counts.agg(
        F.max("count").alias("mx"), F.expr("percentile(count, 0.5)").alias("md")
    ).collect()[0]
    assert stats["mx"] > 20 * stats["md"], "fixture not skewed enough"

    hot = counts.orderBy(F.desc("count")).first()["doc_id"]
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64("op_sequence"), F.lit(8))
    )
    partial_rows = (
        salted.filter(F.col("doc_id") == hot)
        .groupBy("doc_id", "_salt")
        .count()
        .count()
    )
    assert partial_rows > 1, "salt did not split the hot key"
    # and the salted dedup result matches the plain one
    a = lww_dedup(df, "doc_id", "op_sequence", salt_partials=8)
    b = lww_dedup(df, "doc_id", "op_sequence")
    assert a.count() == b.count() == counts.count()
