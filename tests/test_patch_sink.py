"""SnapshotSink(patch=True): the full commit protocol — merge, inline
compaction, pipelined commits, crash replay, changelog, backfill — run
with the per-cell LWW fold (operators/patch.py). Partial-update streams
must reconstruct the fold-left model state through every one of those
paths; changelogs must emit FULL row images."""

from concurrent.futures import ThreadPoolExecutor

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from patch_model import SCHEMA
from patch_model import model as _model
from patch_model import to_events as _to_events
from pyspark.sql import functions as F

from beehive_data_etl_spark.operators.patch import CELL
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink


def _ops_strategy():
    from patch_model import ops_strategy

    return ops_strategy(max_ops=40)


def _df(spark, events):
    return spark.createDataFrame(pd.DataFrame(events), schema=SCHEMA)


def _state(sink):
    return {
        r["doc_id"]: {
            k: v for k, v in r.asDict().items() if k not in ("doc_id", CELL)
        }
        for r in sink.read_state().collect()
    }


def _assert_matches(sink, events):
    got, model = _state(sink), _model(events)
    assert set(got) == set(model)
    for k, m in model.items():
        assert got[k] == m, (k, got[k], m)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops_strategy(), n_batches=st.integers(1, 4))
def test_patch_replay_matches_model(spark, tmp_path_factory, ops, n_batches):
    """Sequential micro-batches through merge + inline compaction
    (threshold 2 forces fold-of-folded chains) reconstruct the model."""
    events = _to_events(ops)
    root = str(tmp_path_factory.mktemp("patch_sink"))
    sink = SnapshotSink(
        spark, root, n_buckets=4, lineage=False, compact_threshold=2, patch=True
    )
    size = max(1, len(events) // n_batches)
    for i in range(0, len(events), size):
        sink.apply_batch(_df(spark, events[i : i + size]), f"b{i}")
    _assert_matches(sink, events)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops_strategy(), n_batches=st.integers(2, 4))
def test_pipelined_patch_commits(spark, tmp_path_factory, ops, n_batches):
    """Concurrent batch commits (arbitrary commit order) — the
    associativity/commutativity claim, end-to-end through the sink."""
    events = _to_events(ops)
    root = str(tmp_path_factory.mktemp("patch_pipe"))
    sink = SnapshotSink(
        spark, root, n_buckets=4, lineage=False, compact_threshold=2, patch=True
    )
    size = max(1, len(events) // n_batches)
    chunks = [events[i : i + size] for i in range(0, len(events), size)]
    with ThreadPoolExecutor(max_workers=len(chunks)) as ex:
        list(
            ex.map(
                lambda ic: sink.apply_batch(_df(spark, ic[1]), f"pb{ic[0]}"),
                enumerate(chunks),
            )
        )
    _assert_matches(sink, events)


def test_patch_crash_replay(spark, tmp_path):
    class _Boom(RuntimeError):
        pass

    events = _to_events(
        [("I", i % 3, [], i) for i in range(6)]
        + [("P", i % 3, ["a"], 50 + i) for i in range(6)]
    )
    root = str(tmp_path / "t")
    sink = SnapshotSink(spark, root, n_buckets=4, patch=True)
    sink.apply_batch(_df(spark, events[:6]), "b1")
    fired = []

    def hook(point):
        if point == "after_manifest" and not fired:
            fired.append(point)
            raise _Boom(point)

    sink.crash_hook = hook
    with pytest.raises(_Boom):
        sink.apply_batch(_df(spark, events[6:]), "b2")
    sink2 = SnapshotSink(spark, root, n_buckets=4, patch=True)
    sink2.apply_batch(_df(spark, events[6:]), "b2")
    _assert_matches(sink2, events)


def test_patch_changelog_emits_full_images(spark, tmp_path):
    """A patch batch's changelog rows must carry the UNMASKED cells'
    old values (full images, consumable by any replica) and no internal
    _cell_seq column."""
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4, patch=True)
    sink.apply_batch(
        _df(
            spark,
            [
                {"op": "I", "op_sequence": 1, "doc_id": "d1", "a": 1.0,
                 "b": "x", "c": 10, "patch_cols": None},
                {"op": "I", "op_sequence": 2, "doc_id": "d2", "a": 2.0,
                 "b": "y", "c": 20, "patch_cols": None},
            ],
        ),
        "b1",
    )
    v1 = sink.current_snapshot()["version"]
    sink.apply_batch(
        _df(
            spark,
            [
                {"op": "P", "op_sequence": 3, "doc_id": "d1", "a": 9.0,
                 "b": None, "c": None, "patch_cols": ["a"]},
            ],
        ),
        "b2",
    )
    v2 = sink.current_snapshot()["version"]
    for changes in (
        sink.read_changes(v1, v2),
        sink.read_changes_pruned(v1, v2),
    ):
        rows = {r["doc_id"]: r.asDict() for r in changes.collect()}
        assert CELL not in changes.columns
        assert set(rows) == {"d1"}  # untouched d2 emits nothing
        r = rows["d1"]
        assert r["change_type"] == "U"
        assert r["a"] == 9.0  # patched cell
        assert r["b"] == "x" and r["c"] == 10  # full image, not NULLs
        assert r["op_sequence"] == 3


def test_patch_mode_mismatch_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    sink = SnapshotSink(spark, root, n_buckets=4, patch=True)
    sink.apply_batch(
        _df(spark, _to_events([("I", 0, [], 1)])), "b1"
    )
    wrong = SnapshotSink(spark, root, n_buckets=4)  # row-LWW reopen
    with pytest.raises(RuntimeError, match="patch="):
        wrong.apply_batch(_df(spark, _to_events([("U", 0, [], 2)])), "b2")


def test_backfill_on_patch_table_survives_refold(spark, tmp_path):
    """A backfilled derived column must get a _cell_seq entry: without
    it the very next fold (compaction or any read) would treat the cell
    as never-set and null it. A later patch to ANOTHER column must keep
    the backfilled value; a later patch to the backfilled column itself
    must override it."""
    root = str(tmp_path / "t")
    sink = SnapshotSink(
        spark, root, n_buckets=4, compact_threshold=2, patch=True
    )
    sink.apply_batch(
        _df(spark, _to_events([("I", 0, [], 3), ("I", 1, [], 4)])), "b1"
    )
    sink.backfill({"a2": F.col("a") * 2}, name="a2")
    # read through a fold (read_state always folds)
    st1 = {r["doc_id"]: r["a2"] for r in sink.read_state().collect()}
    assert st1 == {"doc-0": 6.0, "doc-1": 8.0}
    # patch another column on doc-0: a2 must survive the merge fold
    sink.apply_batch(
        _df(
            spark,
            [{"op": "P", "op_sequence": 10, "doc_id": "doc-0", "a": 7.0,
              "b": None, "c": None, "patch_cols": ["a"]}],
        ),
        "b2",
    )
    # patch the backfilled column itself on doc-1
    batch = pd.DataFrame(
        [{"op": "P", "op_sequence": 11, "doc_id": "doc-1", "a": None,
          "b": None, "c": None, "a2": 99.0, "patch_cols": ["a2"]}]
    )
    sink.apply_batch(
        spark.createDataFrame(
            batch,
            schema=SCHEMA.replace(
                ", patch_cols array<string>",
                ", a2 double, patch_cols array<string>",
            ),
        ),
        "b3",
    )
    # force a full compaction so the final read is a fold of folds
    sink.compact()
    rows = {r["doc_id"]: r.asDict() for r in sink.read_state().collect()}
    assert rows["doc-0"]["a"] == 7.0
    assert rows["doc-0"]["a2"] == 6.0  # survived both folds
    assert rows["doc-1"]["a2"] == 99.0  # patch overrode the backfill
    assert rows["doc-1"]["a"] == 4.0


def test_patch_internal_columns_hidden_from_user_reads(spark, tmp_path):
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4, patch=True)
    sink.apply_batch(_df(spark, _to_events([("I", 0, [], 1)])), "b1")
    assert CELL not in sink.read_final().columns
    assert CELL not in sink.lookup(["doc-0"]).columns
    assert sink.lookup(["doc-0"]).count() == 1


def test_late_patch_surfaces_in_changelog(spark, tmp_path):
    """A late OUT-OF-ORDER patch (seq below the row's current max)
    changes state without advancing the row op_sequence. The seq-only
    change predicate silently dropped such rows (review-found, repro'd);
    the cell-fingerprint comparison must emit them from BOTH readers."""
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4, patch=True)
    # batch with the HIGHER seq commits first: patch seq=11 sets b
    sink.apply_batch(
        _df(
            spark,
            [
                {"op": "I", "op_sequence": 1, "doc_id": "d", "a": 1.0,
                 "b": "x", "c": 5, "patch_cols": None},
                {"op": "P", "op_sequence": 11, "doc_id": "d", "a": None,
                 "b": "late?", "c": None, "patch_cols": ["b"]},
            ],
        ),
        "b1",
    )
    v1 = sink.current_snapshot()["version"]
    # then the EARLIER patch seq=5 arrives (pipelined out-of-order
    # commit): sets a — row seq stays 11, state changes
    sink.apply_batch(
        _df(
            spark,
            [{"op": "P", "op_sequence": 5, "doc_id": "d", "a": 42.0,
              "b": None, "c": None, "patch_cols": ["a"]}],
        ),
        "b2",
    )
    v2 = sink.current_snapshot()["version"]
    for changes in (
        sink.read_changes(v1, v2),
        sink.read_changes_pruned(v1, v2),
    ):
        rows = {r["doc_id"]: r.asDict() for r in changes.collect()}
        assert set(rows) == {"d"}, rows
        assert rows["d"]["change_type"] == "U"
        assert rows["d"]["a"] == 42.0
        assert rows["d"]["op_sequence"] == 11  # clock NOT advanced


def test_patch_source_refuses_row_lww_replica(spark, tmp_path):
    """A per-cell source can change state without advancing the row
    clock, so a row-LWW replica has nothing to order such an image by —
    the Replicator refuses the pairing at construction."""
    from beehive_data_etl_spark.sinks.replicate import Replicator

    src = SnapshotSink(spark, str(tmp_path / "a"), n_buckets=4, patch=True)
    dst = SnapshotSink(spark, str(tmp_path / "b"), n_buckets=2)
    with pytest.raises(TypeError, match="patch-mode"):
        Replicator(src, dst, name="m")


def test_patch_source_replicates_to_patch_replica(spark, tmp_path):
    """patch → patch replication is cell-exact: the change stream
    carries _cell_seq, the replica folds it verbatim — including a late
    out-of-order patch window whose row seq never advances."""
    from beehive_data_etl_spark.sinks.replicate import Replicator

    src = SnapshotSink(spark, str(tmp_path / "a"), n_buckets=4, patch=True)
    dst = SnapshotSink(spark, str(tmp_path / "b"), n_buckets=2, patch=True)
    rep = Replicator(src, dst, name="m")
    src.apply_batch(
        _df(spark, _to_events([("I", 0, [], 1), ("I", 1, [], 2), ("D", 2, [], 3)])),
        "b1",
    )
    rep.sync()

    def live(s):
        return {
            r["doc_id"]: (r["a"], r["b"], r["c"])
            for r in s.read_final().collect()
        }

    assert live(dst) == live(src)
    # window 2: a patch at a HIGH seq — full image flows with cell seqs
    src.apply_batch(
        _df(
            spark,
            [{"op": "P", "op_sequence": 9, "doc_id": "doc-0", "a": 42.0,
              "b": None, "c": None, "patch_cols": ["a"]}],
        ),
        "b2",
    )
    rep.sync()
    assert live(dst) == live(src)
    assert live(dst)["doc-0"][0] == 42.0
    assert live(dst)["doc-0"][1] is not None  # unmasked cell carried over
    # window 3: a LATE patch below the row's max seq — state changes,
    # row clock does not; the replica must still converge
    src.apply_batch(
        _df(
            spark,
            [{"op": "P", "op_sequence": 4, "doc_id": "doc-0", "a": None,
              "b": "late-b", "c": None, "patch_cols": ["b"]}],
        ),
        "b3",
    )
    rep.sync()
    assert live(dst) == live(src)
    assert live(dst)["doc-0"][1] == "late-b"


def test_delete_clears_columns_absent_from_the_deleting_batch(spark, tmp_path):
    """Cell maps are built against the TABLE schema, not the batch's: a
    delete arriving in a batch narrower than the evolved table must
    still kill the missing columns' cells, or a later revive resurrects
    deleted (possibly PII) data (review-found, repro'd)."""
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4, patch=True)
    wide = "op string, op_sequence long, doc_id string, a double, d string, patch_cols array<string>"
    narrow = "op string, op_sequence long, doc_id string, a double, patch_cols array<string>"
    sink.apply_batch(
        spark.createDataFrame(
            pd.DataFrame(
                [{"op": "I", "op_sequence": 1, "doc_id": "d0", "a": 1.0,
                  "d": "secret", "patch_cols": None}]
            ),
            schema=wide,
        ),
        "b1",
    )
    sink.apply_batch(
        spark.createDataFrame(
            pd.DataFrame(
                [
                    {"op": "D", "op_sequence": 2, "doc_id": "d0", "a": None,
                     "patch_cols": None},
                    {"op": "I", "op_sequence": 3, "doc_id": "d0", "a": 9.0,
                     "patch_cols": None},
                ]
            ),
            schema=narrow,
        ),
        "b2",
    )
    row = sink.read_final().collect()[0]
    assert row["a"] == 9.0
    assert row["d"] is None  # NOT "secret" — the delete cleared it


def test_rollback_keeps_patch_mode(spark, tmp_path):
    """rollback_to writes a fresh snapshot dict — it must carry the
    patch flag or the table refuses its own sink's next apply
    (review-found, repro'd)."""
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4, patch=True)
    sink.apply_batch(_df(spark, _to_events([("I", 0, [], 1)])), "b1")
    v1 = sink.current_snapshot()["version"]
    sink.apply_batch(_df(spark, _to_events([("U", 0, [], 2)])), "b2")
    sink.rollback_to(v1)
    out = sink.apply_batch(_df(spark, _to_events([("U", 0, [], 3)])), "b3")
    assert not out.get("skipped")
    assert sink.current_snapshot()["patch"] is True


def test_row_lww_table_keeps_patch_cols_payload_column(spark, tmp_path):
    """patch_cols is envelope metadata ONLY in patch mode — a row-LWW
    table with a genuine payload column of that name must keep its data
    (review-found silent drop)."""
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    sink.apply_batch(
        spark.createDataFrame(
            pd.DataFrame(
                [{"op": "I", "op_sequence": 1, "doc_id": "d0",
                  "patch_cols": ["keep", "me"]}]
            ),
            schema="op string, op_sequence long, doc_id string, patch_cols array<string>",
        ),
        "b1",
    )
    row = sink.read_final().collect()[0]
    assert row["patch_cols"] == ["keep", "me"]
