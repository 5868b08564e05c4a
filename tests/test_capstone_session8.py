"""Session-8 capstone: the full training-data pipeline composed —
audited streaming ingest with ALL FOUR derived views refreshing per
epoch (aggregate IVM, token index, near-dup, shard export), then a
full-refetch dump-diff, scheduled maintenance, a deep fsck, and a
replica bootstrap — every surface exact at every checkpoint."""

import os

from pyspark.sql import functions as F

from beehive_data_etl_spark.operators.audit import standard_token_audit
from beehive_data_etl_spark.operators.refetch import refetch_apply
from beehive_data_etl_spark.sinks.aggregates import AggregateView
from beehive_data_etl_spark.sinks.fsck import fsck
from beehive_data_etl_spark.sinks.shards import ShardExport
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.sinks.token_index import TokenIndex
from beehive_data_etl_spark.sources.eventlog import BASE_ENVELOPE_DDL
from beehive_data_etl_spark.streaming.replay import bootstrap, replay_stream
from beehive_data_etl_spark.verify import compare_final, oracle_final_spark


def test_capstone_ingest_views_refetch_maintenance_replica(
    spark, smoke_log, tmp_path
):
    root = str(tmp_path / "table")
    sink = SnapshotSink(
        spark, root, n_buckets=8, audit=standard_token_audit()
    )
    views = [
        AggregateView(spark, sink, str(tmp_path / "agg"), ["source"], ["n_tok"]),
        TokenIndex(spark, sink, str(tmp_path / "ix"), n_buckets=8),
        ShardExport(spark, sink, str(tmp_path / "shards"), k=4),
    ]

    epochs = []

    def hook(epoch_id):
        for v in views:
            v.refresh()
        epochs.append(epoch_id)

    # 1) audited streaming ingest, views at per-epoch cadence
    replay_stream(
        spark,
        smoke_log,
        sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
        schema_ddl=BASE_ENVELOPE_DDL,
        max_files_per_trigger=2,
        watermark=("event_ts", "10 minutes"),
        on_batch_commit=hook,
    )
    assert len(epochs) >= 2
    state = sink.read_state()
    assert compare_final(
        state.filter(~state.deleted), oracle_final_spark(spark, smoke_log)
    )["ok"]
    for v in views:
        assert v.verify()["ok"]

    # 2) nightly full-refetch: a re-scraped register with churn becomes
    # a MINIMAL batch through the same audited sink
    dump = (
        sink.read_final()
        .select("doc_id", "tokens", "n_tok", "source")
        .withColumn(
            "tokens",
            F.when(F.col("n_tok") == 1, F.array(F.lit(11), F.lit(12)))
            .otherwise(F.col("tokens")),
        )
        .withColumn(
            "n_tok",
            F.when(F.col("n_tok") == 1, F.lit(2)).otherwise(F.col("n_tok")),
        )
    )
    refetch_apply(sink, dump, "nightly-refetch")
    for v in views:
        v.refresh()
        assert v.verify()["ok"]
    got = {r.doc_id: tuple(r.tokens) for r in sink.read_final().collect()}
    want = {r.doc_id: tuple(r.tokens) for r in dump.collect()}
    assert got == want

    # 3) maintenance + integrity: compact, GC nothing (floor unset),
    # vacuum superseded bytes, then a deep fsck over the result
    sink.compact()
    for v in views:
        v.refresh()  # pure-rewrite window: incremental no-row refresh
        assert v.verify()["ok"]
    sink.vacuum()
    rep = fsck(sink, deep=True)
    assert rep["ok"], rep

    # 4) replica bootstrap from the live table (snapshot export +
    # empty tail) — byte-equal final state
    replica = SnapshotSink(spark, str(tmp_path / "replica"), n_buckets=4)
    as_of = (
        sink.read_state().agg(F.max("op_sequence")).collect()[0][0]
    )
    bootstrap(sink.read_state(), replica, as_of_seq=int(as_of))
    a = {r.doc_id: tuple(r.tokens) for r in replica.read_final().collect()}
    assert a == want
    # the shard export's layout equals a fresh full export of the table
    twin = ShardExport(spark, sink, str(tmp_path / "twin"), k=4)
    twin.refresh()
    exp = views[2]
    assert {int(s) for s in exp.current()["shards"]} == {
        int(s) for s in twin.current()["shards"]
    }
    for s in exp.current()["shards"]:
        a = [tuple(r) for r in exp.read(shard=int(s)).drop("shard").collect()]
        b = [tuple(r) for r in twin.read(shard=int(s)).drop("shard").collect()]
        assert a == b, f"shard {s} diverged"
