"""Table-to-table CDC replication (sinks/replicate.py): the upstream
table's changelog drives a downstream sink through the SAME apply_batch
contract as WAL ingest — exactly-once via the downstream committed-
batch cursor, retention pinned upstream via an auto-moved tag."""

import os

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.sinks.replicate import Replicator
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.streaming.replay import replay_incremental


def _final_map(sink):
    df = sink.read_state().filter("NOT deleted")
    return {
        r.doc_id: (r.op_sequence, tuple(r.tokens) if r.tokens is not None else None)
        for r in df.collect()
    }


def test_incremental_replication_converges(spark, smoke_log, tmp_path):
    src = SnapshotSink(spark, str(tmp_path / "a"), n_buckets=8)
    dst = SnapshotSink(spark, str(tmp_path / "b"), n_buckets=4)
    rep = Replicator(src, dst, name="mirror")

    replay_incremental(spark, smoke_log, src, files_per_batch=2, max_batches=2)
    out1 = rep.sync()
    assert not out1.get("skipped")
    assert _final_map(dst) == _final_map(src)
    # tombstones carry over on the initial sync (bootstrap invariant)
    src_tombs = src.read_state().filter("deleted").count()
    assert dst.read_state().filter("deleted").count() == src_tombs

    # second window is incremental: only changed docs flow
    replay_incremental(spark, smoke_log, src, files_per_batch=2)
    out2 = rep.sync()
    assert not out2.get("skipped")
    assert _final_map(dst) == _final_map(src)

    # idle sync is a no-op, cursor = src head
    assert rep.sync()["skipped"]
    assert rep.cursor() == src.current_snapshot()["version"]
    # retention tag tracks the cursor on the SOURCE
    assert src.tags()["repl-mirror"] == rep.cursor()


def test_replication_crash_retry_exactly_once(spark, smoke_log, tmp_path):
    src = SnapshotSink(spark, str(tmp_path / "a"), n_buckets=8)
    replay_incremental(spark, smoke_log, src, files_per_batch=4, max_batches=1)

    boom = {"armed": True}

    def hook(point):
        if point == "before_pointer_swap" and boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("injected crash")

    dst = SnapshotSink(spark, str(tmp_path / "b"), n_buckets=4, crash_hook=hook)
    rep = Replicator(src, dst, name="m")
    with pytest.raises(RuntimeError, match="injected"):
        rep.sync()
    assert dst.current_snapshot() is None  # nothing committed
    assert rep.cursor() == 0

    out = rep.sync()  # retry, same window
    assert not out.get("skipped")
    assert _final_map(dst) == _final_map(src)
    # re-sync of the committed window is a no-op
    assert rep.sync()["skipped"]


def test_rewrite_only_window_is_silent(spark, smoke_log, tmp_path):
    src = SnapshotSink(spark, str(tmp_path / "a"), n_buckets=8)
    dst = SnapshotSink(spark, str(tmp_path / "b"), n_buckets=4)
    rep = Replicator(src, dst)

    replay_incremental(spark, smoke_log, src, files_per_batch=2, max_batches=2)
    rep.sync()
    v_dst = dst.current_snapshot()["version"]

    src.compact()
    src.rebucket(12)
    out = rep.sync()  # two rewrite commits, zero row changes
    assert not out.get("skipped")
    assert _final_map(dst) == _final_map(src)
    assert rep.cursor() == src.current_snapshot()["version"]
    assert dst.current_snapshot()["version"] == v_dst + 1

    # and changes made AFTER the rewrites still replicate through it
    replay_incremental(spark, smoke_log, src, files_per_batch=2)
    rep.sync()
    assert _final_map(dst) == _final_map(src)


def test_replication_refuses_upstream_rollback_window(
    spark, smoke_log, tmp_path
):
    src = SnapshotSink(spark, str(tmp_path / "a"), n_buckets=8)
    dst = SnapshotSink(spark, str(tmp_path / "b"), n_buckets=4)
    rep = Replicator(src, dst)

    replay_incremental(spark, smoke_log, src, files_per_batch=2, max_batches=2)
    rep.sync()
    v_good = src.current_snapshot()["version"]
    replay_incremental(spark, smoke_log, src, files_per_batch=2, max_batches=3)
    src.rollback_to(v_good)
    with pytest.raises(RuntimeError, match="rolled back"):
        rep.sync()
    # downstream untouched by the refused window
    assert rep.cursor() == v_good


def test_retention_tag_survives_upstream_vacuum(spark, smoke_log, tmp_path):
    # copy-on-write upstream: every batch supersedes ALL previous files,
    # so without the replication tag a vacuum() between syncs reaps the
    # from-version old images the next pruned diff must read
    src = SnapshotSink(
        spark, str(tmp_path / "a"), n_buckets=4, compact_threshold=1
    )
    dst = SnapshotSink(spark, str(tmp_path / "b"), n_buckets=4)
    rep = Replicator(src, dst, name="m")

    replay_incremental(spark, smoke_log, src, files_per_batch=2, max_batches=2)
    rep.sync()
    replay_incremental(spark, smoke_log, src, files_per_batch=2)
    src.vacuum()  # would reap the cursor version's files if untagged
    out = rep.sync()
    assert not out.get("skipped")
    assert _final_map(dst) == _final_map(src)


def test_derived_replica_with_transform(spark, smoke_log, tmp_path):
    """The fan-out shape: the replicated envelope is a DataFrame — a
    consumer can derive columns in flight (here: n_tok recomputed)
    before it hits the downstream sink."""
    src = SnapshotSink(spark, str(tmp_path / "a"), n_buckets=8)
    replay_incremental(spark, smoke_log, src, files_per_batch=4, max_batches=1)

    class TransformingSink(SnapshotSink):
        def apply_batch(self, batch_df, batch_id):
            derived = batch_df.withColumn(
                "tok_sq", (F.col("n_tok").cast("long") * F.col("n_tok")).cast("long")
            )
            return super().apply_batch(derived, batch_id)

    dst = TransformingSink(spark, str(tmp_path / "b"), n_buckets=4)
    Replicator(src, dst).sync()
    rows = dst.read_state().filter("NOT deleted").select("n_tok", "tok_sq").collect()
    assert rows and all(
        r.tok_sq == r.n_tok * r.n_tok for r in rows if r.n_tok is not None
    )


def test_replication_across_schema_evolution(spark, evolution_log, tmp_path):
    """A window whose batches added/widened columns evolves the replica
    schema through the normal ingest-evolution path."""
    src = SnapshotSink(spark, str(tmp_path / "a"), n_buckets=8)
    dst = SnapshotSink(spark, str(tmp_path / "b"), n_buckets=4)
    rep = Replicator(src, dst)

    # stage 1: pre-evolution shape only
    replay_incremental(spark, evolution_log, src, files_per_batch=2, max_batches=2)
    rep.sync()
    assert "lang" not in dst.read_state().columns

    # stage 2: the log adds `lang` and widens `n_tok` mid-replay
    replay_incremental(spark, evolution_log, src, files_per_batch=2)
    rep.sync()

    def rows(sink):
        df = sink.read_state().filter("NOT deleted")
        cols = sorted(df.columns)
        return sorted(
            tuple(
                tuple(v) if isinstance(v, list) else v
                for v in (r[c] for c in cols)
            )
            for r in df.collect()
        )

    assert sorted(dst.read_state().columns) == sorted(src.read_state().columns)
    assert rows(dst) == rows(src)


def test_mark_synced_refuses_fresh_replica(spark, smoke_log, tmp_path):
    src = SnapshotSink(spark, str(tmp_path / "a"), n_buckets=8)
    replay_incremental(spark, smoke_log, src, files_per_batch=4, max_batches=1)
    dst = SnapshotSink(spark, str(tmp_path / "b"), n_buckets=4)
    rep = Replicator(src, dst)
    with pytest.raises(RuntimeError, match="no replication cursor"):
        rep.mark_synced(src.current_snapshot()["version"])


def test_lost_cursor_refuses_full_copy_onto_state(spark, smoke_log, tmp_path):
    """If every repl-* id is trimmed from the downstream, cursor()==0
    with existing state — the initial-copy path must refuse (a state
    copy cannot reconcile deletes whose tombstones the source GC'd);
    force=True mark_synced is the verified-recovery path."""
    src = SnapshotSink(spark, str(tmp_path / "a"), n_buckets=8)
    dst = SnapshotSink(spark, str(tmp_path / "b"), n_buckets=4)
    rep = Replicator(src, dst, name="m")

    replay_incremental(spark, smoke_log, src, files_per_batch=2, max_batches=2)
    rep.sync()
    dst.trim_committed_batches(retain_last=0)  # simulate over-trim
    assert rep.cursor() == 0

    replay_incremental(spark, smoke_log, src, files_per_batch=2)
    with pytest.raises(RuntimeError, match="already has state"):
        rep.sync()

    # verified-recovery: re-point the cursor, then incremental resumes
    rep.mark_synced(src.tags()["repl-m"], force=True)
    rep.sync()
    assert _final_map(dst) == _final_map(src)


def test_retention_pin_survives_crash_before_tag_move(
    spark, smoke_log, tmp_path, monkeypatch
):
    """Review-found crash window: downstream commit lands, then the
    process dies before the main-tag move. The pre-apply `-next` tag
    must keep pinning the new cursor version's files through a
    compact+vacuum, or the next incremental diff reads reaped paths."""
    src = SnapshotSink(spark, str(tmp_path / "a"), n_buckets=4,
                       compact_threshold=100)
    dst = SnapshotSink(spark, str(tmp_path / "b"), n_buckets=4)
    rep = Replicator(src, dst, name="m")

    replay_incremental(spark, smoke_log, src, files_per_batch=2, max_batches=1)
    rep.sync()
    replay_incremental(spark, smoke_log, src, files_per_batch=2, max_batches=2)
    v2 = src.current_snapshot()["version"]

    # crash AFTER the downstream apply, BEFORE the main-tag move
    real_advance = Replicator._advance_retention_tag

    def boom(self, to):
        raise RuntimeError("crash before tag move")

    monkeypatch.setattr(Replicator, "_advance_retention_tag", boom)
    with pytest.raises(RuntimeError, match="crash before tag move"):
        rep.sync()
    monkeypatch.setattr(Replicator, "_advance_retention_tag", real_advance)
    assert rep.cursor() == v2               # downstream committed
    assert src.tags()["repl-m-next"] == v2  # and v2 stays pinned

    src.compact()   # supersedes v2's delta files
    src.vacuum()    # would reap them without the -next pin
    replay_incremental(spark, smoke_log, src, files_per_batch=2)
    out = rep.sync()  # incremental diff reads v2's old images
    assert not out.get("skipped")
    assert _final_map(dst) == _final_map(src)
    assert src.tags()["repl-m"] == rep.cursor()
    assert "repl-m-next" not in src.tags()  # dropped once caught up


def test_replicator_requires_cursor_capable_destination(spark, smoke_log, tmp_path):
    src = SnapshotSink(spark, str(tmp_path / "a"), n_buckets=4)

    class NoCursorSink:
        def committed(self, batch_id):
            return False

        def apply_batch(self, df, batch_id):
            return {}

    with pytest.raises(TypeError, match="current_snapshot"):
        Replicator(src, NoCursorSink())
