"""DistinctView: mergeable-HLL distinct-count IVM. Pins the
maintenance discipline case by case — additions never rescan (including
re-inserting an already-present value), a removal whose (group, value)
pair was re-added in the same window never rescans (the
update-keeps-value CDC case), any other removal rescans exactly the
damaged groups — plus the losslessness that makes verify() an EXACT
compare, rollup composition from stored sketches, NULL group keys,
the 0-non-null → 0-distinct no-rescan path, and the refusal surface."""

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.sinks.distinct import DistinctView, distinct_full
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink


def _apply(spark, sink, bid, rows):
    """rows: (op, seq, doc_id, grp, v)"""
    sink.apply_batch(
        spark.createDataFrame(
            rows, "op string, op_sequence long, doc_id string, grp string, v string"
        ),
        bid,
    )


@pytest.fixture()
def pair(spark, tmp_path):
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    view = DistinctView(
        spark, sink, str(tmp_path / "v"), ["grp"], distinct_cols=["v"]
    )
    return sink, view


def _rows(view):
    return {
        r["grp"]: (r["n_rows"], r["nd_v"]) for r in view.read().collect()
    }


def test_distinct_lifecycle(spark, pair):
    sink, view = pair
    _apply(spark, sink, "b1", [
        ("I", 1, "a1", "g0", "x"), ("I", 2, "a2", "g0", "y"),
        ("I", 3, "a3", "g0", "x"),          # duplicate value
        ("I", 4, "b1", "g1", "p"), ("I", 7, "b2", "g1", "r"),
        ("I", 5, "n1", None, "q"),          # NULL group key
        ("I", 6, "z1", "gz", None),         # NULL value
    ])
    assert view.refresh()["mode"] == "full"
    assert view.verify()["ok"]
    got = _rows(view)
    # small cardinalities estimate exactly (HLL is exact well below
    # 2^lg_k) — assert exact values, not tolerances
    assert got["g0"] == (3, 2) and got["g1"] == (2, 2)
    assert got[None] == (1, 1) and got["gz"] == (1, 0)
    assert view.refresh()["mode"] == "noop"

    # additions never rescan — new value and already-present value
    _apply(spark, sink, "b2", [
        ("I", 10, "a4", "g0", "z"), ("I", 11, "a5", "g0", "x"),
    ])
    r = view.refresh()
    assert r["mode"] == "incremental" and r["rescanned_groups"] == 0
    assert view.verify()["ok"] and _rows(view)["g0"] == (5, 3)

    # update that KEEPS the value (patch-like CDC): remove+add of the
    # same (group, value) pair self-cancels — clean
    _apply(spark, sink, "b3", [("U", 12, "a1", "g0", "x")])
    r = view.refresh()
    assert r["rescanned_groups"] == 0
    assert view.verify()["ok"] and _rows(view)["g0"] == (5, 3)

    # delete of the only holder of "z": dirty, rescan drops it
    _apply(spark, sink, "b4", [("D", 13, "a4", None, None)])
    r = view.refresh()
    assert r["rescanned_groups"] == 1
    assert view.verify()["ok"] and _rows(view)["g0"] == (4, 2)

    # delete one of TWO holders of "x": conservative dirty — the
    # sketch can't prove survival; the rescan restores the truth
    _apply(spark, sink, "b5", [("D", 14, "a5", None, None)])
    r = view.refresh()
    assert r["rescanned_groups"] == 1
    assert view.verify()["ok"] and _rows(view)["g0"] == (3, 2)

    # delete + same-window re-add of the same value by another doc:
    # the anti-join cancels the removal — clean
    _apply(spark, sink, "b6", [
        ("D", 15, "a2", None, None), ("I", 16, "a6", "g0", "y"),
    ])
    r = view.refresh()
    assert r["rescanned_groups"] == 0
    assert view.verify()["ok"] and _rows(view)["g0"] == (3, 2)

    # group-moving update: old group dirty (its value left), new group
    # folds the arrival in clean — ONE rescan total
    _apply(spark, sink, "b7", [("U", 17, "b1", "g0", "p")])
    r = view.refresh()
    assert r["rescanned_groups"] == 1          # g1 only
    got = _rows(view)
    assert got["g1"] == (1, 1)
    assert got["g0"] == (4, 3)
    assert view.verify()["ok"]

    # a group emptied entirely by the window drops WITHOUT a rescan
    # (row count is authoritative; nothing left to scan)
    _apply(spark, sink, "b7b", [("D", 50, "b2", None, None)])
    r = view.refresh()
    assert r["rescanned_groups"] == 0
    assert "g1" not in _rows(view)
    assert view.verify()["ok"]

    # last non-null value leaves but rows remain: 0 distinct from the
    # additive non-null count — no rescan
    _apply(spark, sink, "b8", [("I", 18, "z2", "gz", "w")])
    view.refresh()
    _apply(spark, sink, "b9", [("D", 19, "z2", None, None)])
    r = view.refresh()
    assert r["rescanned_groups"] == 0
    assert _rows(view)["gz"] == (1, 0)
    assert view.verify()["ok"]


def test_distinct_matches_fresh_full_build(spark, pair):
    """Lossless union, end to end: after a chain of incremental
    refreshes the maintained estimates equal a from-scratch full
    build's — EXACTLY, not within tolerance."""
    sink, view = pair
    _apply(spark, sink, "b1", [
        ("I", i, f"d{i}", f"g{i % 3}", f"v{i % 17}") for i in range(1, 40)
    ])
    view.refresh()
    _apply(spark, sink, "b2", [
        ("I", 100 + i, f"e{i}", f"g{i % 3}", f"v{i % 29}")
        for i in range(1, 30)
    ])
    view.refresh()
    _apply(spark, sink, "b3", [
        ("D", 200, "d1", None, None), ("U", 201, "d2", "g1", "moved"),
    ])
    view.refresh()
    fresh = DistinctView(
        spark, sink, str(sink.root) + "_v2", ["grp"], distinct_cols=["v"]
    )
    assert fresh.refresh()["mode"] == "full"
    assert _rows(view) == _rows(fresh)
    assert view.verify()["ok"]


def test_distinct_rollup(spark, tmp_path):
    """estimate_rollup unions stored sketches to a coarser grouping —
    identical to a direct build at that grouping (lossless), without
    touching base data. Also: the empty grouping = table-wide."""
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    sink.apply_batch(
        spark.createDataFrame(
            [
                ("I", i, f"d{i}", f"s{i % 2}", f"g{i % 4}", f"v{i % 13}")
                for i in range(1, 60)
            ],
            "op string, op_sequence long, doc_id string, src string, "
            "grp string, v string",
        ),
        "b1",
    )
    view = DistinctView(
        spark, sink, str(tmp_path / "v"), ["src", "grp"], distinct_cols=["v"]
    )
    view.refresh()
    live = sink.read_state().filter(~F.col("deleted"))
    for roll in (["src"], []):
        want = {
            tuple(r[g] for g in roll): (r["n_rows"], r["nd_v"])
            for r in distinct_full(live, roll, ["v"], 12)
            .select(
                *roll, "n_rows",
                DistinctView._estimate("v"),
            )
            .collect()
        }
        got = {
            tuple(r[g] for g in roll): (r["n_rows"], r["nd_v"])
            for r in view.estimate_rollup(roll).collect()
        }
        assert got == want
    with pytest.raises(ValueError, match="roll UP"):
        view.estimate_rollup(["v"])


def test_distinct_over_table_key(spark, tmp_path):
    """The canonical deployment (distinct doc_ids per source) maintains
    the KEY column, which has no _old_ twin in the pre-image changelog
    — keys are immutable, so the current column IS the old identity
    (review-found: the first incremental window used to fail with
    UNRESOLVED_COLUMN `_old_doc_id`)."""
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    view = DistinctView(
        spark, sink, str(tmp_path / "v"), ["grp"], distinct_cols=["doc_id"]
    )
    _apply(spark, sink, "b1", [
        ("I", 1, "d1", "g0", "x"), ("I", 2, "d2", "g0", "x"),
        ("I", 3, "d3", "g1", "x"),
    ])
    assert view.refresh()["mode"] == "full"
    # incremental window with an insert, an update (id kept — the
    # remove+add self-cancels) and a delete (dirty rescan)
    _apply(spark, sink, "b2", [
        ("I", 10, "d4", "g0", "y"), ("U", 11, "d2", "g0", "z"),
        ("D", 12, "d3", None, None),
    ])
    r = view.refresh()
    assert r["mode"] == "incremental" and r["rescanned_groups"] == 0
    # d3's group emptied (count-authoritative drop); d2's update
    # self-cancelled; only the insert touched g0's sketch
    got = {r["grp"]: (r["n_rows"], r["nd_doc_id"]) for r in view.read().collect()}
    assert got == {"g0": (3, 3)}
    assert view.verify()["ok"]
    # a delete that leaves the group populated: dirty rescan path
    _apply(spark, sink, "b3", [("D", 13, "d4", None, None)])
    r = view.refresh()
    assert r["rescanned_groups"] == 1
    assert view.verify()["ok"]


def test_distinct_refusals(spark, tmp_path):
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    with pytest.raises(ValueError, match="at least one"):
        DistinctView(spark, sink, str(tmp_path / "v"), ["g"], [])
    with pytest.raises(ValueError, match="lg_k"):
        DistinctView(spark, sink, str(tmp_path / "v"), ["g"], ["v"], lg_k=30)
    # unsketchable type refuses with guidance, not a Spark error
    sink.apply_batch(
        spark.createDataFrame(
            [("I", 1, "d1", "g0", 1.5)],
            "op string, op_sequence long, doc_id string, grp string, v double",
        ),
        "b1",
    )
    view = DistinctView(spark, sink, str(tmp_path / "v"), ["grp"], ["v"])
    with pytest.raises(ValueError, match="hll_sketch_agg accepts"):
        view.refresh()


def test_distinct_lg_k_pinned(spark, pair):
    """The sketch precision is pinned in the CURRENT pointer: a handle
    with a different lg_k refuses to refresh (an incremental merge —
    or worse, a delete-only window's clean/rescan split — would commit
    a mixed-precision view) and refuses to verify. A fresh directory
    at the new precision is the documented path."""
    sink, view = pair
    _apply(spark, sink, "b1", [("I", 1, "d1", "g0", "x")])
    view.refresh()
    assert view.current()["lg_k"] == 12
    other = DistinctView(
        spark, sink, view.root, ["grp"], distinct_cols=["v"], lg_k=14
    )
    _apply(spark, sink, "b2", [("I", 2, "d2", "g0", "y")])
    with pytest.raises(ValueError, match="full rebuild"):
        other.refresh()
    with pytest.raises(ValueError, match="stored lg_k"):
        other.verify()
    # the matching handle still refreshes and verifies
    assert view.refresh()["mode"] == "incremental"
    assert view.verify()["ok"]


def test_distinct_dropped_column_guard(spark, tmp_path):
    """The inherited alter-window guard fires for the sketched column."""
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    _apply(spark, sink, "b1", [("I", 1, "d1", "g0", "x")])
    view = DistinctView(spark, sink, str(tmp_path / "v"), ["grp"], ["v"])
    view.refresh()
    sink.drop_column("v")
    with pytest.raises(ValueError, match="no longer exist"):
        view.refresh()
