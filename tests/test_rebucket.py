"""Online rebucketing (partition evolution): resharding a live table's
bucket space mid-stream without breaking exactly-once resume, time
travel, point lookups, the changelog, or derived incremental views.

The 100 TB motivation: bucket count is the unit of merge parallelism
and must track table growth — rebucket() is the engine's resharding
primitive (Iceberg partition-spec evolution is the cluster twin)."""

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.sinks.aggregates import AggregateView
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.streaming.replay import replay_incremental
from beehive_data_etl_spark.verify import compare_final, oracle_final_spark


@pytest.fixture(scope="module")
def resharded(spark, smoke_log, tmp_path_factory):
    """Half the log at 8 buckets → rebucket to 32 → the rest."""
    root = str(tmp_path_factory.mktemp("reshard"))
    sink = SnapshotSink(spark, root, n_buckets=8)
    replay_incremental(spark, smoke_log, sink, files_per_batch=2, max_batches=2)
    v_pre = sink.current_snapshot()["version"]
    pre_rows = {
        (r.doc_id, r.op_sequence, r.deleted)
        for r in sink.read_state().select("doc_id", "op_sequence", "deleted").collect()
    }
    rb = sink.rebucket(32)
    replay_incremental(spark, smoke_log, sink, files_per_batch=2)
    v_final = sink.current_snapshot()["version"]
    return sink, v_pre, pre_rows, rb, v_final


def test_final_state_matches_oracle_across_rebucket(spark, smoke_log, resharded):
    sink, _, _, rb, _ = resharded
    assert rb["rebucketed"] and rb["from"] == 8 and rb["to"] == 32
    assert sink.current_snapshot()["n_buckets"] == 32
    engine = sink.read_state().filter(~F.col("deleted"))
    report = compare_final(engine, oracle_final_spark(spark, smoke_log))
    assert report["ok"], report


def test_committed_batches_survive_rebucket(spark, smoke_log, resharded):
    sink, _, _, _, v_final = resharded
    again = replay_incremental(spark, smoke_log, sink, files_per_batch=2)
    assert all(m.get("skipped") for m in again)
    assert sink.current_snapshot()["version"] == v_final


def test_time_travel_reads_pre_rebucket_bucket_space(resharded):
    sink, v_pre, pre_rows, _, _ = resharded
    got = {
        (r.doc_id, r.op_sequence, r.deleted)
        for r in sink.read_state(version=v_pre)
        .select("doc_id", "op_sequence", "deleted")
        .collect()
    }
    assert got == pre_rows


def test_lookup_before_and_after_rebucket(resharded):
    sink, v_pre, pre_rows, _, _ = resharded
    live_now = {r.doc_id for r in sink.read_final().select("doc_id").collect()}
    probe = sorted(live_now)[:3]
    got = sink.lookup(probe)
    assert {r.doc_id for r in got.collect()} == set(probe)
    # versioned lookup against the OLD bucket space
    pre_live = sorted(d for d, _, dead in pre_rows if not dead)[:3]
    got_pre = sink.lookup(pre_live, version=v_pre)
    assert {r.doc_id for r in got_pre.collect()} == set(pre_live)


def test_changelog_across_rebucket_equals_full_join(resharded):
    """The pruned changelog degrades to whole-state images for a window
    containing a rebucket, and must equal the full-outer-join changelog
    exactly — rewritten-but-unchanged rows stay silent."""
    sink, v_pre, _, _, v_final = resharded
    pruned = sink.read_changes_pruned(v_pre, v_final)
    full = sink.read_changes(v_pre, v_final)
    cols = sorted(pruned.columns)
    assert cols == sorted(full.columns)
    p, f = pruned.select(*cols), full.select(*cols)
    assert p.exceptAll(f).count() == 0
    assert f.exceptAll(p).count() == 0
    assert p.count() > 0  # the post-rebucket batches really changed docs


def test_aggregate_view_maintained_across_rebucket(spark, smoke_log, tmp_path):
    """Derived incremental views keep their O(delta) refresh loop
    running straight through a reshard; result equals a recompute."""
    sink = SnapshotSink(spark, str(tmp_path / "sink"), n_buckets=8)
    replay_incremental(spark, smoke_log, sink, files_per_batch=2, max_batches=2)
    view = AggregateView(
        spark, sink, str(tmp_path / "view"), group_cols=["source"],
        sum_cols=["n_tok"],
    )
    view.refresh()
    sink.rebucket(32)
    replay_incremental(spark, smoke_log, sink, files_per_batch=2, max_batches=3)
    r = view.refresh()
    assert r["mode"] == "incremental"
    assert view.verify()["ok"]


def test_stale_sink_object_cannot_commit_after_rebucket(spark, smoke_log, tmp_path):
    """Cross-process safety: a writer that planned under the old bucket
    space must be refused at its commit point."""
    from beehive_data_etl_spark.sources.readers import read_wal
    import glob
    import os

    root = str(tmp_path / "sink")
    sink_a = SnapshotSink(spark, root, n_buckets=8)
    replay_incremental(spark, smoke_log, sink_a, files_per_batch=2, max_batches=2)
    sink_b = SnapshotSink(spark, root, n_buckets=8)  # opened pre-rebucket
    sink_a.rebucket(16)
    files = sorted(glob.glob(os.path.join(smoke_log, "part-*.parquet")))
    batch = read_wal(spark, files[4:6])
    with pytest.raises(RuntimeError, match="rebucketed"):
        sink_b.apply_batch(batch, "stale-writer-batch")
    # the refused batch is NOT recorded as committed — a reopened sink
    # can re-apply it cleanly
    sink_c = SnapshotSink(spark, root, n_buckets=16)
    assert not sink_c.committed("stale-writer-batch")
    m = sink_c.apply_batch(batch, "stale-writer-batch")
    assert not m.get("skipped")


def test_rebucket_guards(spark, smoke_log, tmp_path):
    sink = SnapshotSink(spark, str(tmp_path / "sink"), n_buckets=8)
    with pytest.raises(ValueError, match="no snapshot"):
        sink.rebucket(16)
    replay_incremental(spark, smoke_log, sink, files_per_batch=2, max_batches=1)
    assert sink.rebucket(8) == {"rebucketed": False, "n_buckets": 8}
    with pytest.raises(ValueError, match=">= 1"):
        sink.rebucket(0)


def test_crashed_manifests_not_reused_across_rebucket(spark, smoke_log, tmp_path):
    """Review finding: a batch that crashed after writing manifests, a
    rebucket, then a re-apply of the same batch — the dead-space
    manifests must be recomputed, not reused (reuse would commit files
    whose bucket numbers no longer address their keys; 8→12 is chosen
    so no bucket coincides by arithmetic accident)."""

    class _Boom(RuntimeError):
        pass

    def _crash_once_at(point_name):
        state = {"fired": False}

        def hook(point):
            if point == point_name and not state["fired"]:
                state["fired"] = True
                raise _Boom(point)

        return hook

    root = str(tmp_path / "sink")
    sink = SnapshotSink(spark, root, n_buckets=8)
    replay_incremental(spark, smoke_log, sink, files_per_batch=2, max_batches=2)
    sink.crash_hook = _crash_once_at("after_manifest")
    with pytest.raises(_Boom):
        replay_incremental(spark, smoke_log, sink, files_per_batch=2, max_batches=3)
    sink.crash_hook = lambda point: None
    sink.rebucket(12)
    # the crashed batch's manifests exist but are in the 8-bucket space
    assert sink._manifested_buckets("wal-000002-part-00004.parquet") == set()
    replay_incremental(spark, smoke_log, sink, files_per_batch=2)
    engine = sink.read_state().filter(~F.col("deleted"))
    report = compare_final(engine, oracle_final_spark(spark, smoke_log))
    assert report["ok"], report
    # bucket-pruned lookups see every live doc (wrong-bucket files would
    # make some keys silently invisible)
    live = [r.doc_id for r in sink.read_final().select("doc_id").collect()]
    got = sink.lookup(live)
    assert got.count() == len(live)


def test_rebucket_chain_interleaved_with_replay(spark, smoke_log, tmp_path):
    """Grow AND shrink through non-doubling counts (8→5→13) with replay
    between reshards — final state must stay byte-equal to the oracle
    and the snapshot bucket maps must never reference dead-space
    bucket numbers."""
    sink = SnapshotSink(spark, str(tmp_path / "sink"), n_buckets=8)
    replay_incremental(spark, smoke_log, sink, files_per_batch=2, max_batches=1)
    sink.rebucket(5)
    replay_incremental(spark, smoke_log, sink, files_per_batch=2, max_batches=3)
    sink.rebucket(13)
    replay_incremental(spark, smoke_log, sink, files_per_batch=2)
    snap = sink.current_snapshot()
    assert snap["n_buckets"] == 13
    assert all(0 <= int(b) < 13 for b in snap["buckets"])
    engine = sink.read_state().filter(~F.col("deleted"))
    report = compare_final(engine, oracle_final_spark(spark, smoke_log))
    assert report["ok"], report
