"""Capstone composition soak: every table-lifecycle feature running on
ONE table in one pass — replay with per-batch derived-view refreshes,
an online rebucket mid-stream, more replay, maintenance (compact +
vacuum), then a bootstrap replica stood up from the live table's state
export. Each piece is tested in isolation elsewhere; this asserts they
COMPOSE: views stay exact through the reshard, maintenance doesn't
break pinned metadata, and the replica ends byte-equal."""

import os

from pyspark.sql import functions as F

from beehive_data_etl_spark.sinks.aggregates import AggregateView
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.sinks.token_index import TokenIndex
from beehive_data_etl_spark.streaming.replay import bootstrap, replay_incremental
from beehive_data_etl_spark.verify import compare_final, oracle_final_spark


def test_full_lifecycle_composition(spark, smoke_log, tmp_path):
    root = str(tmp_path / "table")
    sink = SnapshotSink(spark, root, n_buckets=8, compact_threshold=3)
    view = AggregateView(
        spark, sink, str(tmp_path / "agg"), group_cols=["source"],
        sum_cols=["n_tok"],
    )
    index = TokenIndex(spark, sink, str(tmp_path / "idx"), n_buckets=8)

    # phase 1: half the WAL, views refreshed per batch (the
    # foreachBatch cadence replay_stream wires up)
    for n in (1, 2):
        replay_incremental(
            spark, smoke_log, sink, files_per_batch=2, max_batches=n
        )
        view.refresh()
        index.refresh()

    # phase 2: reshard the live table, then keep streaming
    sink.rebucket(32)
    replay_incremental(spark, smoke_log, sink, files_per_batch=2, max_batches=3)
    view.refresh()
    index.refresh()

    # phase 3: the rest, then maintenance — views refresh BEFORE
    # vacuum: consumers must stay inside the vacuum horizon
    # (read_changes_pruned needs the window's old files; the documented
    # constraint — with older_than_s=0 there IS no grace horizon)
    replay_incremental(spark, smoke_log, sink, files_per_batch=2)
    view.refresh()
    index.refresh()
    sink.compact()
    # absorb the compact version bump BEFORE vacuum, so verify() later
    # reads the view's reflected version from live files (a pure
    # rewrite window emits zero change rows — exercised here)
    view.refresh()
    index.refresh()
    # single-writer root here, so the zero-horizon vacuum is safe; it
    # must actually reclaim the dead pre-rebucket bucket space + the
    # deltas the compaction superseded
    vac = sink.vacuum(older_than_s=0.0)
    assert vac["removed"] > 0, vac

    # table equals the oracle; both derived views equal full recomputes
    report = compare_final(
        sink.read_state().filter(~F.col("deleted")),
        oracle_final_spark(spark, smoke_log),
    )
    assert report["ok"], report
    assert view.verify()["ok"]
    assert index.verify()["ok"]

    # phase 4: replica from the (vacuumed, rebucketed) live table
    export = sink.read_state()
    as_of = export.agg(F.max("op_sequence")).collect()[0][0]
    replica = SnapshotSink(spark, str(tmp_path / "replica"), n_buckets=16)
    bootstrap(export, replica, as_of)
    tail = replay_incremental(
        spark, smoke_log, replica, files_per_batch=2, start_after_seq=as_of
    )
    assert all(m.get("skipped") for m in tail)  # export was complete
    r2 = compare_final(
        replica.read_state().filter(~F.col("deleted")),
        oracle_final_spark(spark, smoke_log),
    )
    assert r2["ok"], r2

    # every surviving data dir is referenced by CURRENT (the dead
    # pre-rebucket wal-batch dirs are gone, not merely "a rebucket dir
    # exists" — the earlier form of this assertion was vacuous)
    snap = sink.current_snapshot()
    live = {
        os.path.normpath(os.path.join(root, e["path"]))
        for ents in snap["buckets"].values()
        for e in ents
    }
    live_ingest_roots = {os.path.dirname(p) for p in live}
    for d in os.listdir(os.path.join(root, "data")):
        full = os.path.normpath(os.path.join(root, "data", d))
        assert any(r.startswith(full) for r in live_ingest_roots), (
            f"unreferenced data dir survived vacuum: {d}"
        )
