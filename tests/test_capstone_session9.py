"""Session-9 capstone: the new read/serve/distribute layer composed
over a real audited replay — one table, end to end.

Flow: replay the smoke WAL → cluster-by compaction → scan_where
(stats-pruned, exact vs unpruned) → ValueIndex select_rows (== the
scan) → filtered replica + filtered outbox (same predicate, same
subset through BOTH transports) → maintenance with report-first
ordering + snapshot expiry → everything still exact, fsck clean,
lagging views rebuilt."""

import os
import sys

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.sinks.fsck import fsck
from beehive_data_etl_spark.sinks.health import table_report
from beehive_data_etl_spark.sinks.outbox import Outbox
from beehive_data_etl_spark.sources.kafka import kafka_envelope
from beehive_data_etl_spark.sinks.replicate import Replicator
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.sinks.token_index import ValueIndex
from beehive_data_etl_spark.streaming.replay import replay_incremental
from beehive_data_etl_spark.verify import compare_final, oracle_final_spark

PRED = [("n_tok", ">=", 5)]


CORE_COLS = ["doc_id", "tokens", "n_tok", "source"]


def _rows(df):
    # compare on the base payload columns: the outbox consumer's table
    # carries extra envelope columns (event_ts) the source table lacks
    return sorted(map(tuple, df.select(*CORE_COLS).collect()))


def test_session9_capstone(spark, smoke_log, tmp_path):
    root = str(tmp_path / "main")
    sink = SnapshotSink(spark, root, n_buckets=8, compact_threshold=100)

    # --- phase 1: partial replay, wire the filtered consumers early
    replay_incremental(
        spark, smoke_log, sink, files_per_batch="auto",
        target_events_per_batch=800, max_batches=2,
    )
    replica = SnapshotSink(spark, str(tmp_path / "cut"), n_buckets=4)
    rep = Replicator(sink, replica, name="cut", where=PRED)
    rep.sync()
    topic = str(tmp_path / "topic")
    ob = Outbox(sink, topic, n_partitions=4, where=PRED)
    ob.sync()
    vix = ValueIndex(
        spark, sink, str(tmp_path / "vix"), token_col="n_tok", n_buckets=8
    )
    vix.refresh()

    # --- phase 2: the rest of the log (updates/deletes), consumers tail
    replay_incremental(
        spark, smoke_log, sink, files_per_batch="auto",
        target_events_per_batch=800,
    )
    rep.sync()
    ob.sync()
    vix.refresh()

    # correctness gate first: byte-equal replay vs the oracle
    state = sink.read_state()
    assert compare_final(
        state.filter(~state.deleted), oracle_final_spark(spark, smoke_log)
    )["ok"]

    # --- phase 3: layout for the predicate, then the read paths
    sink.compact(cluster_by=["n_tok"])
    want = _rows(sink.read_final().filter(F.col("n_tok") >= 5))
    assert want  # non-vacuous
    assert _rows(sink.scan_where(PRED)) == want
    vix.refresh()
    assert _rows(
        vix.select_rows(sorted({r[0] for r in sink.read_final()
                                .filter(F.col("n_tok") >= 5)
                                .select("n_tok").collect()}))
    ) == want

    # both transports delivered the same subset
    assert _rows(replica.read_final()) == want
    consumer = SnapshotSink(spark, str(tmp_path / "consumer"), n_buckets=4)
    recs = spark.read.option("recursiveFileLookup", "true").parquet(topic)
    consumer.apply_batch(kafka_envelope(recs), "consume")
    assert _rows(consumer.read_final()) == want

    # --- phase 4: maintenance — report-first ordering, then expiry
    rep_before = table_report(sink)
    assert {r["action"] for r in rep_before["recommendations"]}
    out = sink.expire_snapshots(keep_last=2)
    # filtered-replica + outbox cursor tags clamp the floor: consumers
    # stay syncable by construction
    assert out["snapshot_floor"] <= min(
        v for k, v in sink.tags().items() if not k.endswith("-next")
    ) + 1
    assert not fsck(sink)["errors"]

    # the lagging index rebuilds (its window may be expired), and the
    # read paths stay exact afterwards
    r = vix.refresh()
    assert r["mode"] in ("noop", "noop-delta", "full", "incremental")
    assert _rows(sink.scan_where(PRED)) == want

    # one more write cycle proves the table is still fully live
    sink.apply_batch(
        spark.createDataFrame(
            [("I", 10**9, "cap-new", [1, 2, 3, 4, 5], 5, "s")],
            "op string, op_sequence long, doc_id string, tokens array<int>, "
            "n_tok int, source string",
        ),
        "cap-final",
    )
    rep.sync()
    want2 = _rows(sink.read_final().filter(F.col("n_tok") >= 5))
    assert _rows(sink.scan_where(PRED)) == want2
    assert _rows(replica.read_final()) == want2
    assert len(want2) == len(want) + 1
