"""Online backfill (SnapshotSink.backfill): retro-compute derived
payload columns over the live table through the rewrite/commit
protocol — chunked, resumable via snapshot-recorded progress, schema-
evolving, and honest about its changelog silence (replication refuses
a backfill window instead of silently diverging)."""

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.sinks.replicate import Replicator
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.streaming.replay import replay_incremental
from beehive_data_etl_spark.verify import compare_final, oracle_final_spark

def DOUBLE_NTOK():
    return {"n_tok_x2": F.col("n_tok").cast("long") * 2}


def _col_map(sink, col):
    return {
        r.doc_id: r[col]
        for r in sink.read_state().filter("NOT deleted").select("doc_id", col).collect()
    }


def test_backfill_adds_column_and_stays_silent_in_changelog(
    spark, smoke_log, tmp_path
):
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=8)
    replay_incremental(spark, smoke_log, sink, files_per_batch=2)
    v_pre = sink.current_snapshot()["version"]

    out = sink.backfill(DOUBLE_NTOK())
    assert out["compacted"]
    v_post = sink.current_snapshot()["version"]

    # values correct on every live row; tombstones carry NULL
    state = sink.read_state()
    assert state.filter("NOT deleted").filter(
        F.col("n_tok_x2") != F.col("n_tok").cast("long") * 2
    ).count() == 0
    assert state.filter("deleted AND n_tok_x2 IS NOT NULL").count() == 0
    # untouched payload still byte-equal vs the replay oracle
    assert compare_final(
        state.filter(~state.deleted), oracle_final_spark(spark, smoke_log)
    )["ok"]
    # schema evolved at the backfill commit, not before
    assert "n_tok_x2" in sink.current_snapshot()["schema"]
    assert "n_tok_x2" not in sink.snapshot(v_pre)["schema"]
    # time travel to the pre-backfill version reads the OLD shape
    assert "n_tok_x2" not in sink.read_state(version=v_pre).columns
    # the changelog is silent about the rewrite (op_sequence unchanged)
    assert sink.read_changes_pruned(v_pre, v_post).count() == 0


def test_backfill_chunked_resume(spark, smoke_log, tmp_path):
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=8)
    replay_incremental(spark, smoke_log, sink, files_per_batch=2)

    first = sink.backfill(DOUBLE_NTOK(), buckets=[0, 1, 2], name="x2")
    assert set(first["compacted"]) <= {0, 1, 2}
    done = sink.backfill_status("x2")
    assert done == set(first["compacted"])

    # resume after a "driver crash": re-run over the remaining buckets
    remaining = sorted(set(range(8)) - done)
    sink.backfill(DOUBLE_NTOK(), buckets=remaining, name="x2")
    assert sink.backfill_status("x2") >= done | {
        b
        for b in remaining
        if sink.current_snapshot()["buckets"].get(str(b))
    }
    vals = _col_map(sink, "n_tok_x2")
    ntok = _col_map(sink, "n_tok")
    assert vals and all(vals[k] == ntok[k] * 2 for k in vals)


def test_backfill_replaces_existing_column(spark, smoke_log, tmp_path):
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    replay_incremental(spark, smoke_log, sink, files_per_batch=4)
    before = _col_map(sink, "n_tok")
    sink.backfill({"n_tok": F.col("n_tok") + F.lit(7)})
    after = _col_map(sink, "n_tok")
    assert after == {k: v + 7 for k, v in before.items() if v is not None} | {
        k: None for k, v in before.items() if v is None
    }


def test_backfill_refuses_internal_columns(spark, smoke_log, tmp_path):
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    replay_incremental(spark, smoke_log, sink, files_per_batch=4, max_batches=1)
    with pytest.raises(ValueError, match="internal"):
        sink.backfill({"op_sequence": F.lit(0)})
    with pytest.raises(ValueError, match="at least one"):
        sink.backfill({})


def test_replication_refuses_backfill_window_then_mark_synced(
    spark, smoke_log, tmp_path
):
    src = SnapshotSink(spark, str(tmp_path / "a"), n_buckets=8)
    dst = SnapshotSink(spark, str(tmp_path / "b"), n_buckets=4)
    rep = Replicator(src, dst, name="m")

    replay_incremental(spark, smoke_log, src, files_per_batch=2, max_batches=2)
    rep.sync()
    src.backfill(DOUBLE_NTOK())
    with pytest.raises(RuntimeError, match="backfill"):
        rep.sync()

    # reconcile: same (deterministic) backfill downstream, then advance
    dst.backfill(DOUBLE_NTOK())
    rep.mark_synced(src.current_snapshot()["version"])
    assert rep.cursor() == src.current_snapshot()["version"]

    # subsequent ingest replicates normally and the tables agree,
    # including the backfilled column
    replay_incremental(spark, smoke_log, src, files_per_batch=2)
    rep.sync()
    assert _col_map(dst, "n_tok_x2") == _col_map(src, "n_tok_x2")
    s, d = src.read_state(), dst.read_state()
    assert compare_final(
        d.filter(~d.deleted), oracle_final_spark(spark, smoke_log)
    )["ok"]


def test_backfill_row_lww_semantics_after_more_ingest(
    spark, smoke_log, tmp_path
):
    """Row-granularity LWW: a doc updated AFTER the backfill is fully
    replaced by its new version, which does not carry the derived
    column (NULL) — the documented reason to deploy the forward-path
    transform before backfilling history."""
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=8)
    replay_incremental(spark, smoke_log, sink, files_per_batch=2, max_batches=2)
    sink.backfill(DOUBLE_NTOK())
    backfilled = set(_col_map(sink, "doc_id"))

    replay_incremental(spark, smoke_log, sink, files_per_batch=2)
    sink.compact()
    state = sink.read_state()
    assert compare_final(
        state.filter(~state.deleted), oracle_final_spark(spark, smoke_log)
    )["ok"]
    rows = state.filter("NOT deleted").select(
        "doc_id", "n_tok", "n_tok_x2", "op_sequence"
    ).collect()
    # every non-null derived value is still correct after folds
    assert all(
        r.n_tok_x2 == r.n_tok * 2 for r in rows if r.n_tok_x2 is not None
    )
    # and at least one backfilled doc survived untouched with its value
    assert any(r.n_tok_x2 is not None for r in rows if r.doc_id in backfilled)


def test_initial_sync_carries_backfilled_values(spark, smoke_log, tmp_path):
    """A FRESH replica's first sync is a state copy, not a changelog
    read — it picks up backfilled values without needing the refusal/
    mark_synced dance (which protects only incremental windows)."""
    src = SnapshotSink(spark, str(tmp_path / "a"), n_buckets=8)
    replay_incremental(spark, smoke_log, src, files_per_batch=4)
    src.backfill(DOUBLE_NTOK())

    dst = SnapshotSink(spark, str(tmp_path / "b"), n_buckets=4)
    out = Replicator(src, dst).sync()
    assert not out.get("skipped")
    assert _col_map(dst, "n_tok_x2") == _col_map(src, "n_tok_x2")


def test_backfill_status_follows_rollback_lineage(spark, smoke_log, tmp_path):
    """A rollback past a backfill undoes its rewritten files; status
    must walk the RESTORED lineage so a resume re-runs those buckets
    instead of skipping them."""
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=8)
    replay_incremental(spark, smoke_log, sink, files_per_batch=4)
    v_pre = sink.current_snapshot()["version"]

    done = sink.backfill(DOUBLE_NTOK(), buckets=[0, 1], name="x2")["compacted"]
    assert set(sink.backfill_status("x2")) == set(done)

    sink.rollback_to(v_pre)
    assert sink.backfill_status("x2") == set()  # undone with the rollback
    assert "n_tok_x2" not in sink.read_state().columns

    # resume from scratch works and the column is complete again
    sink.backfill(DOUBLE_NTOK(), name="x2")
    vals = _col_map(sink, "n_tok_x2")
    ntok = _col_map(sink, "n_tok")
    assert vals and all(vals[k] == ntok[k] * 2 for k in vals)
