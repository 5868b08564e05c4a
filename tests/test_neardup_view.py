"""NearDupView: the changelog-driven near-dup adapter — same refresh()
contract as AggregateView/TokenIndex, feeding the sink's changelog
through IncrementalNearDup.process_batch."""

import os

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.functions.incremental_dedup import NearDupView
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink

SCHEMA = (
    "op string, op_sequence long, doc_id string, tokens array<int>, "
    "n_tok int, source string, event_ts timestamp, batch_hint int"
)
BASE = list(range(1, 30))  # long shared run -> near-dup signatures


def _ev(op, seq, doc, toks):
    n = len(toks) if toks is not None else None
    return (op, seq, doc, toks, n, "s", None, 0)


@pytest.fixture()
def sink(spark, tmp_path):
    return SnapshotSink(spark, str(tmp_path / "sink"), n_buckets=4)


def _norm(df):
    return {tuple(sorted((r.id_new, r.id_corpus))) for r in df.collect()}


def test_cross_batch_duplicate_found_once(spark, sink, tmp_path):
    view = NearDupView(spark, sink, str(tmp_path / "nd"))
    b1 = [_ev("I", 1, "a", BASE), _ev("I", 2, "b", [500, 501, 502])]
    sink.apply_batch(spark.createDataFrame(b1, SCHEMA), "b1")
    r = view.refresh()
    assert r["mode"] == "full"
    assert _norm(view.pairs()) == set()  # no dups yet
    # batch 2 inserts a near-copy of 'a' -> exactly the (c, a) pair
    b2 = [_ev("I", 3, "c", BASE + [99]), _ev("I", 4, "d", list(range(700, 720)))]
    sink.apply_batch(spark.createDataFrame(b2, SCHEMA), "b2")
    assert view.refresh()["mode"] == "incremental"
    assert _norm(view.pairs()) == {("a", "c")}
    # noop refresh adds nothing
    assert view.refresh()["mode"] == "noop"
    assert _norm(view.pairs()) == {("a", "c")}


def test_update_and_delete_flow_through_changelog(spark, sink, tmp_path):
    view = NearDupView(spark, sink, str(tmp_path / "nd"))
    sink.apply_batch(
        spark.createDataFrame([_ev("I", 1, "a", BASE)], SCHEMA), "b1"
    )
    view.refresh()
    # delete 'a', then insert 'x' duplicating its OLD content: the
    # tombstone must prevent pairing against the dead doc
    sink.apply_batch(
        spark.createDataFrame([_ev("D", 2, "a", None)], SCHEMA), "b2"
    )
    view.refresh()
    sink.apply_batch(
        spark.createDataFrame([_ev("I", 3, "x", BASE)], SCHEMA), "b3"
    )
    view.refresh()
    assert _norm(view.pairs()) == set()
    # an update that REWRITES 'x' to match a live doc pairs fresh
    sink.apply_batch(
        spark.createDataFrame([_ev("I", 4, "y", list(range(900, 930)))], SCHEMA),
        "b4",
    )
    view.refresh()
    sink.apply_batch(
        spark.createDataFrame([_ev("U", 5, "x", list(range(900, 930)))], SCHEMA),
        "b5",
    )
    view.refresh()
    assert _norm(view.pairs()) == {("x", "y")}


def test_crash_between_store_append_and_swap_is_idempotent(spark, sink, tmp_path):
    view = NearDupView(spark, sink, str(tmp_path / "nd"))
    sink.apply_batch(
        spark.createDataFrame(
            [_ev("I", 1, "a", BASE), _ev("I", 2, "b", [500, 501, 502])], SCHEMA
        ),
        "b1",
    )
    view.refresh()
    sink.apply_batch(
        spark.createDataFrame([_ev("I", 3, "c", BASE + [99])], SCHEMA), "b2"
    )
    # crash AFTER process_batch (store appended, pairs dir written)
    # but BEFORE the pointer swap
    real_swap = view._swap
    view._swap = lambda v: (_ for _ in ()).throw(RuntimeError("crash"))
    with pytest.raises(RuntimeError):
        view.refresh()
    view._swap = real_swap
    # pairs() ignores the orphan dir above the pointer
    assert _norm(view.pairs()) == set()
    # retry heals: batch_id discard keeps the store single-copy, the
    # pair is reported exactly once
    assert view.refresh()["mode"] == "incremental"
    assert _norm(view.pairs()) == {("a", "c")}


def test_replay_job_env_enables_neardup(spark, smoke_log, tmp_path, monkeypatch):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import replay_job

    target = str(tmp_path / "sink_nd")
    monkeypatch.setattr(sys, "argv", ["replay_job.py", smoke_log, target])
    monkeypatch.setenv("REPLAY_MODE", "stream")
    monkeypatch.setenv("REPLAY_N_BUCKETS", "8")
    monkeypatch.setenv("REPLAY_NEARDUP", "1")
    replay_job.main()
    sink2 = SnapshotSink(spark, target, n_buckets=8)
    view = NearDupView(spark, sink2, os.path.join(target, "_views", "neardup"))
    assert view.current()["version"] == sink2.current_snapshot()["version"]
    view.pairs().count()  # readable (smoke log rarely has near-dups)
