"""MinMaxView: IVM for the non-invertible aggregates. Pins the dirty
rule from the module docstring case by case — additions never rescan,
removals strictly inside the extremes never rescan, a removal AT the
extreme rescans unless the same window added at-or-beyond it, the
non-null count going to 0 produces NULL without a rescan — plus group
moves, group disappearance, NULL group keys, exactness after every
refresh (verify() is a full recompute), and the refusal surface."""

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.sinks.minmax import MinMaxView
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink


def _apply(spark, sink, bid, rows):
    """rows: (op, seq, doc_id, grp, v)"""
    sink.apply_batch(
        spark.createDataFrame(
            rows, "op string, op_sequence long, doc_id string, grp string, v long"
        ),
        bid,
    )


@pytest.fixture()
def pair(spark, tmp_path):
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    view = MinMaxView(
        spark, sink, str(tmp_path / "v"), ["grp"],
        min_cols=["v"], max_cols=["v"],
    )
    return sink, view


def _rows(view):
    return {
        r["grp"]: (r["n_rows"], r["min_v"], r["max_v"])
        for r in view.read().collect()
    }


def test_minmax_lifecycle(spark, pair):
    sink, view = pair
    _apply(spark, sink, "b1", [
        ("I", 1, "a1", "g0", 10), ("I", 2, "a2", "g0", 50),
        ("I", 3, "b1", "g1", 5), ("I", 4, "b2", "g1", 7),
        ("I", 5, "c1", "g2", 1), ("I", 6, "c2", "g2", 9),
        ("I", 7, "n1", None, 3),            # NULL group key
        ("I", 8, "z1", "gz", None),         # NULL value
    ])
    assert view.refresh()["mode"] == "full"
    assert view.verify()["ok"]
    got = _rows(view)
    assert got["g0"] == (2, 10, 50) and got[None] == (1, 3, 3)
    assert got["gz"] == (1, None, None)
    assert view.refresh()["mode"] == "noop"

    # additions strictly inside the extremes: clean path, no rescan
    _apply(spark, sink, "b2", [("I", 10, "a3", "g0", 30)])
    r = view.refresh()
    assert r["mode"] == "incremental" and r["rescanned_groups"] == 0
    assert view.verify()["ok"] and _rows(view)["g0"] == (3, 10, 50)

    # an addition beyond the max is ALSO clean (greatest folds it in)
    _apply(spark, sink, "b3", [("I", 11, "a4", "g0", 99)])
    r = view.refresh()
    assert r["rescanned_groups"] == 0 and _rows(view)["g0"] == (4, 10, 99)

    # deleting the max holder: dirty, rescan restores the runner-up
    _apply(spark, sink, "b4", [("D", 12, "a4", None, None)])
    r = view.refresh()
    assert r["rescanned_groups"] == 1
    assert view.verify()["ok"] and _rows(view)["g0"] == (3, 10, 50)

    # update moving a doc between groups: it held g2's min -> g2 dirty;
    # it lands inside g1's range -> g1 clean
    _apply(spark, sink, "b5", [("U", 13, "c1", "g1", 6)])
    r = view.refresh()
    assert r["rescanned_groups"] == 1
    got = _rows(view)
    assert got["g2"] == (1, 9, 9) and got["g1"] == (3, 5, 7)
    assert view.verify()["ok"]

    # delete-at-max + same-window insert at-or-beyond: NOT dirty
    _apply(spark, sink, "b6", [
        ("D", 14, "a2", None, None),        # a2 held g0's max (50)
        ("I", 15, "a5", "g0", 77),
    ])
    r = view.refresh()
    assert r["rescanned_groups"] == 0
    assert view.verify()["ok"] and _rows(view)["g0"] == (3, 10, 77)

    # last NON-NULL value leaves but rows remain: NULL extremes from
    # the additive non-null count — no rescan
    _apply(spark, sink, "b7", [
        ("I", 16, "z2", "gz", 4),
    ])
    view.refresh()
    _apply(spark, sink, "b8", [("D", 17, "z2", None, None)])
    r = view.refresh()
    assert r["rescanned_groups"] == 0
    assert _rows(view)["gz"] == (1, None, None)
    assert view.verify()["ok"]

    # whole group deleted -> dropped from the view
    _apply(spark, sink, "b9", [("D", 18, "c2", None, None)])
    view.refresh()
    assert "g2" not in _rows(view)
    assert view.verify()["ok"]


def test_minmax_update_within_group_away_from_extreme(spark, pair):
    sink, view = pair
    _apply(spark, sink, "b1", [
        ("I", 1, "a1", "g0", 10), ("I", 2, "a2", "g0", 50),
    ])
    view.refresh()
    # a2's value drops from the stored max: removal AT max, addition
    # below it -> dirty; rescan finds 40 (itself) vs 10
    _apply(spark, sink, "b2", [("U", 3, "a2", "g0", 40)])
    r = view.refresh()
    assert r["rescanned_groups"] == 1
    assert _rows(view)["g0"] == (2, 10, 40)
    assert view.verify()["ok"]
    # ... while a non-extreme update stays clean
    _apply(spark, sink, "b3", [("I", 4, "a3", "g0", 20)])
    view.refresh()
    _apply(spark, sink, "b4", [("U", 5, "a3", "g0", 25)])
    r = view.refresh()
    assert r["rescanned_groups"] == 0
    assert _rows(view)["g0"] == (3, 10, 40)
    assert view.verify()["ok"]


def test_minmax_refusals(spark, tmp_path):
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    sink.apply_batch(
        spark.createDataFrame(
            [("I", 1, "d1", [1, 2], "s")],
            "op string, op_sequence long, doc_id string, "
            "tokens array<int>, source string",
        ),
        "b1",
    )
    with pytest.raises(ValueError, match="min_cols and/or max_cols"):
        MinMaxView(spark, sink, str(tmp_path / "v0"), ["source"])
    v = MinMaxView(
        spark, sink, str(tmp_path / "v1"), ["source"], max_cols=["tokens"]
    )
    with pytest.raises(ValueError, match="orderable"):
        v.refresh()


def test_minmax_dropped_column_gives_guidance(spark, tmp_path):
    """Review-found: the orderable-type check ran before the window
    guard, so a dropped maintained column raised a bare KeyError
    instead of the preamble's delete-and-rebuild ValueError."""
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    sink.apply_batch(
        spark.createDataFrame(
            [("I", 1, "d1", "g", 5)],
            "op string, op_sequence long, doc_id string, grp string, v long",
        ),
        "b1",
    )
    view = MinMaxView(
        spark, sink, str(tmp_path / "v"), ["grp"], max_cols=["v"]
    )
    view.refresh()
    sink.drop_column("v")
    with pytest.raises(ValueError, match="no longer exist"):
        view.refresh()


def test_minmax_over_table_key(spark, tmp_path):
    """Extremes of the KEY column itself (min/max doc_id per group):
    the pre-image changelog has no _old_doc_id — the key is immutable,
    so the current column carries the old identity (shared
    _pre_image_col fallback, review-found via the distinct twin)."""
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    view = MinMaxView(
        spark, sink, str(tmp_path / "v"), ["grp"],
        min_cols=["doc_id"], max_cols=["doc_id"],
    )
    _apply(spark, sink, "b1", [
        ("I", 1, "a1", "g0", 1), ("I", 2, "a5", "g0", 2),
        ("I", 3, "b2", "g1", 3),
    ])
    assert view.refresh()["mode"] == "full"
    # delete the max-holding key: dirty rescan restores the runner-up
    _apply(spark, sink, "b2", [("D", 10, "a5", None, None)])
    r = view.refresh()
    assert r["mode"] == "incremental" and r["rescanned_groups"] == 1
    got = {
        r["grp"]: (r["min_doc_id"], r["max_doc_id"])
        for r in view.read().collect()
    }
    assert got == {"g0": ("a1", "a1"), "g1": ("b2", "b2")}
    assert view.verify()["ok"]
