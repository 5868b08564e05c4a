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
from pyspark.sql import functions as F

from beehive_data_etl_spark.operators.patch import CELL
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink

PAYLOAD = ["a", "b", "c"]
SCHEMA = (
    "op string, op_sequence long, doc_id string, "
    "a double, b string, c long, patch_cols array<string>"
)


def _ops_strategy():
    op_entry = st.tuples(
        st.sampled_from(["I", "U", "D", "P", "P", "P"]),
        st.integers(min_value=0, max_value=5),
        st.lists(st.sampled_from(PAYLOAD), min_size=0, max_size=3, unique=True),
        st.integers(min_value=0, max_value=99),
    )
    return st.lists(op_entry, min_size=1, max_size=40)


def _to_events(ops):
    events = []
    for seq, (op, doc, mask, vs) in enumerate(ops, start=1):
        events.append(
            {
                "op": op,
                "op_sequence": seq,
                "doc_id": f"doc-{doc}",
                "a": float(vs) if (op in ("I", "U") or "a" in mask) else None,
                "b": f"s{vs}" if (op in ("I", "U") or "b" in mask) else None,
                "c": vs * 10 if (op in ("I", "U") or "c" in mask) else None,
                "patch_cols": mask if op == "P" else None,
            }
        )
    return events


def _model(events):
    """Per-cell fold-left in plain Python; returns ALL rows with a
    deleted flag (mirrors read_state)."""
    cells: dict[str, dict] = {}
    top: dict[str, int] = {}
    for e in sorted(events, key=lambda e: e["op_sequence"]):
        k, stt = e["doc_id"], cells.setdefault(e["doc_id"], {})
        top[k] = max(top.get(k, 0), e["op_sequence"])
        if e["op"] == "P":
            for c in e["patch_cols"] or []:
                stt[c] = e[c]
        else:
            for c in PAYLOAD:
                stt[c] = None if e["op"] == "D" else e[c]
            stt["deleted"] = e["op"] == "D"
    return {
        k: {
            "op_sequence": top[k],
            "deleted": bool(stt.get("deleted", False)),
            **{c: stt.get(c) for c in PAYLOAD},
        }
        for k, stt in cells.items()
    }


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


def test_patch_source_replicates_to_row_lww_replica(spark, tmp_path):
    """The changelog's full images make a patch-mode table replicable
    into a PLAIN row-LWW replica: the replica stores whole rows and
    never needs masks or cell seqs."""
    from beehive_data_etl_spark.sinks.replicate import Replicator

    src = SnapshotSink(spark, str(tmp_path / "a"), n_buckets=4, patch=True)
    dst = SnapshotSink(spark, str(tmp_path / "b"), n_buckets=2)
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
    # incremental window: a patch — the replica must receive the FULL
    # image (unmasked cells included), not a sparse row
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
