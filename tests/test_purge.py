"""purge_keys / purge_audit — takedown ("right to be forgotten")
across RETAINED HISTORY, not just current state.

The invariant under test is physical: after purge + vacuum,
``purge_audit`` — a scan of EVERY parquet file under the table root,
reachable or not — finds zero occurrences of the keys. Semantic
invariants ride along: the purge is not a tombstone (a later legitimate
re-insert at any op_sequence wins), every untouched row stays
byte-equal, the pruned changelog degrades to the full state diff and
emits honest ``D`` rows (so TokenIndex / AggregateView refreshes stay
exact), replication refuses the window, and tags refuse the purge
(pinned bytes would survive vacuum).
"""

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.sinks.aggregates import AggregateView
from beehive_data_etl_spark.sinks.replicate import Replicator
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.sinks.token_index import TokenIndex
from beehive_data_etl_spark.streaming.replay import replay_incremental


class _Boom(RuntimeError):
    pass


def _crash_once_at(point_name: str):
    state = {"fired": False}

    def hook(point: str) -> None:
        if point == point_name and not state["fired"]:
            state["fired"] = True
            raise _Boom(point)

    return hook


def _final_map(sink):
    df = sink.read_state().filter("NOT deleted")
    return {
        r.doc_id: (r.op_sequence, tuple(r.tokens) if r.tokens is not None else None)
        for r in df.collect()
    }


def _live_keys(sink, n):
    return [
        r.doc_id
        for r in sink.read_state()
        .filter("NOT deleted")
        .select("doc_id")
        .orderBy("doc_id")
        .limit(n)
        .collect()
    ]


@pytest.fixture()
def replayed(spark, smoke_log, tmp_path):
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=8)
    replay_incremental(spark, smoke_log, sink, files_per_batch=2)
    return sink


def test_purge_removes_current_state_and_every_retained_byte(replayed):
    sink = replayed
    keys = _live_keys(sink, 3)
    assert sink.purge_audit(keys)["hits"] > 0
    want = {k: v for k, v in _final_map(sink).items() if k not in keys}

    out = sink.purge_keys(keys)
    assert out["purged_live_rows"] == 3
    assert out["buckets"]

    assert _final_map(sink) == want  # survivors byte-equal, keys gone
    assert sink.lookup(keys).count() == 0
    audit = sink.purge_audit(keys)
    assert audit["hits"] == 0, audit


def test_purge_removes_tombstones_not_just_live_rows(replayed):
    sink = replayed
    dead = [
        r.doc_id
        for r in sink.read_state()
        .filter("deleted")
        .select("doc_id")
        .limit(2)
        .collect()
    ]
    assert dead, "smoke log should contain deletes"
    sink.purge_keys(dead)
    # not even the tombstone row remains — the key's clock restarted
    assert sink.read_state().filter(F.col("doc_id").isin(dead)).count() == 0
    assert sink.purge_audit(dead)["hits"] == 0


def test_purged_key_reinsert_wins_at_any_sequence(spark, replayed):
    """A tombstone would shadow a lower-seq re-insert; a purge must not:
    the key's LWW history is GONE, so even op_sequence=1 re-creates it."""
    sink = replayed
    key = _live_keys(sink, 1)[0]
    sink.purge_keys([key])
    one = spark.createDataFrame(
        [("I", 1, key, [7, 7, 7], 3, "manual", None, 0)],
        "op string, op_sequence long, doc_id string, tokens array<int>, "
        "n_tok int, source string, event_ts timestamp, batch_hint int",
    )
    sink.apply_batch(one, "reinsert-after-purge")
    row = sink.read_state().filter(F.col("doc_id") == key).collect()
    assert len(row) == 1 and not row[0].deleted
    assert list(row[0].tokens) == [7, 7, 7] and row[0].op_sequence == 1


def test_tags_refuse_purge_and_pin_bytes_under_ignore(replayed):
    sink = replayed
    keys = _live_keys(sink, 2)
    sink.tag("pre-purge")
    with pytest.raises(RuntimeError, match="pre-purge"):
        sink.purge_keys(keys)
    # explicit override: current state is clean, tagged bytes survive
    sink.purge_keys(keys, ignore_tags=True)
    assert sink.lookup(keys).count() == 0
    assert sink.purge_audit(keys)["hits"] > 0  # pinned by the tag
    sink.drop_tag("pre-purge")
    sink.vacuum()
    assert sink.purge_audit(keys)["hits"] == 0


def test_changelog_window_degrades_to_full_diff_with_D_rows(replayed):
    sink = replayed
    keys = _live_keys(sink, 3)
    v_pre = sink.current_snapshot()["version"]
    sink.purge_keys(keys, skip_vacuum=True)  # old files stay readable
    v_post = sink.current_snapshot()["version"]

    ch = sink.read_changes_pruned(v_pre, v_post, include_old=True)
    rows = ch.collect()
    assert sorted(r.doc_id for r in rows) == sorted(keys)
    assert all(r.change_type == "D" for r in rows)
    # pre-image carried, new side honestly NULL (no forged sequence)
    assert all(r._old_tokens is not None for r in rows)
    assert all(r.op_sequence is None and r.tokens is None for r in rows)

    # the degrade target and the pruned façade agree exactly
    full = sink.read_changes(v_pre, v_post, include_old=True)
    assert ch.columns == full.columns
    assert ch.exceptAll(full).count() == 0
    assert full.exceptAll(ch).count() == 0


def test_token_index_and_aggregate_view_stay_exact_across_purge(
    spark, replayed, tmp_path
):
    sink = replayed
    ix = TokenIndex(spark, sink, str(tmp_path / "ix"), n_buckets=8)
    view = AggregateView(spark, sink, str(tmp_path / "agg"), ["source"], ["n_tok"])
    ix.refresh()
    view.refresh()

    keys = _live_keys(sink, 3)
    sink.purge_keys(keys, skip_vacuum=True)  # consumers refresh FIRST
    assert ix.refresh()["mode"] == "incremental"
    view.refresh()
    sink.vacuum()

    assert ix.verify()["ok"]
    assert ix.read().filter(F.col("doc_id").isin(keys)).count() == 0
    assert view.verify()["ok"]


def test_replication_refuses_purge_window(spark, smoke_log, tmp_path):
    src = SnapshotSink(spark, str(tmp_path / "a"), n_buckets=8)
    dst = SnapshotSink(spark, str(tmp_path / "b"), n_buckets=4)
    rep = Replicator(src, dst, name="m")
    replay_incremental(spark, smoke_log, src, files_per_batch=2, max_batches=2)
    rep.sync()

    keys = _live_keys(src, 2)
    # the replicator's retention tag pins src history: purge says so
    with pytest.raises(RuntimeError, match="repl-m"):
        src.purge_keys(keys)
    src.purge_keys(keys, ignore_tags=True, skip_vacuum=True)
    with pytest.raises(RuntimeError, match="purge"):
        rep.sync()
    # the documented runbook: purge the replica, mark past, resume
    dst.purge_keys(keys)
    rep.mark_synced(src.current_snapshot()["version"])
    replay_incremental(spark, smoke_log, src, files_per_batch=2)
    rep.sync()
    assert _final_map(dst) == _final_map(src)


def test_rollback_window_now_refused_by_pruned_changelog(spark, smoke_log, tmp_path):
    """Latent-staleness fix that rode in with the purge walk: a pruned
    changelog window spanning a rollback used to return silently-wrong
    (empty) changes; it now refuses."""
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=8)
    replay_incremental(spark, smoke_log, sink, files_per_batch=2, max_batches=2)
    v1 = sink.current_snapshot()["version"]
    replay_incremental(spark, smoke_log, sink, files_per_batch=2)
    sink.rollback_to(v1)
    v_rb = sink.current_snapshot()["version"]
    with pytest.raises(RuntimeError, match="rollback"):
        sink.read_changes_pruned(v1, v_rb)


def test_concurrent_rewrite_claim_fails_loudly(replayed):
    sink = replayed
    keys = _live_keys(sink, 2)
    with sink._commit_lock:
        sink._compacting |= set(range(sink.n_buckets))
    try:
        with pytest.raises(RuntimeError, match="NOT purged"):
            sink.purge_keys(keys)
    finally:
        with sink._commit_lock:
            sink._compacting -= set(range(sink.n_buckets))
    assert sink.lookup(keys).count() == 2  # nothing half-applied


def test_purge_crash_before_pointer_swap_changes_nothing(replayed):
    sink = replayed
    keys = _live_keys(sink, 2)
    before = _final_map(sink)
    v = sink.current_snapshot()["version"]
    sink.crash_hook = _crash_once_at("before_pointer_swap")
    with pytest.raises(_Boom):
        sink.purge_keys(keys)
    assert sink.current_snapshot()["version"] == v
    assert _final_map(sink) == before
    # retry completes (hook fires once)
    sink.purge_keys(keys)
    assert sink.lookup(keys).count() == 0
    assert sink.purge_audit(keys)["hits"] == 0


def test_purge_on_patch_table(spark, patch_log, tmp_path):
    from beehive_data_etl_spark.streaming.replay import replay_incremental as ri

    sink = SnapshotSink(spark, str(tmp_path / "p"), n_buckets=8, patch=True)
    ri(spark, patch_log, sink, files_per_batch=2)
    keys = _live_keys(sink, 2)
    sink.purge_keys(keys)
    assert sink.read_state().filter(F.col("doc_id").isin(keys)).count() == 0
    assert sink.purge_audit(keys)["hits"] == 0


def test_purge_input_validation(replayed):
    with pytest.raises(ValueError):
        replayed.purge_keys([])
    with pytest.raises(ValueError):
        replayed.purge_audit([])
