"""SampleView: deterministic bottom-k hash samples with KMV distinct
estimation. Pins the dirty rule — additions never rescan (below the
threshold they enter the sample, above it they fall out of the slice),
a removal above the stored k-th hash never rescans, a removal of a
SAMPLED id rescans exactly that group, the under-k "sample = whole
membership" path filters in place with no rescan, a same-window
re-add self-cancels — plus the adds-truncation merge property
(bottom-k of a union is derivable from bottom-k of the parts), NULL
keys, KMV exactness below k, k pinning, and the refusal surface."""

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.functions.hashing import portable_hash32
from beehive_data_etl_spark.sinks.sample import SampleView
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink


def _apply(spark, sink, bid, rows):
    """rows: (op, seq, doc_id, grp)"""
    sink.apply_batch(
        spark.createDataFrame(
            rows, "op string, op_sequence long, doc_id string, grp string"
        ),
        bid,
    )


def _hash_order(spark, ids):
    """ids sorted the way the view samples them: by (portable hash, id)."""
    df = spark.createDataFrame([(i,) for i in ids], "id string")
    rows = (
        df.withColumn("h", portable_hash32(F.col("id")))
        .orderBy("h", "id")
        .collect()
    )
    return [r["id"] for r in rows]


@pytest.fixture()
def pair(spark, tmp_path):
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    view = SampleView(spark, sink, str(tmp_path / "v"), ["grp"], k=3)
    return sink, view


def _rows(view):
    return {
        r["grp"]: (r["n_rows"], tuple(r["sample_ids"]), r["nd_kmv"])
        for r in view.read().collect()
    }


def test_sample_lifecycle(spark, pair):
    sink, view = pair
    g0 = [f"d{i}" for i in range(6)]
    _apply(spark, sink, "b1", [
        *[("I", 1 + i, d, "g0") for i, d in enumerate(g0)],
        ("I", 20, "x1", "g1"), ("I", 21, "x2", "g1"),   # under k
        ("I", 22, "n1", None),                           # NULL group
    ])
    assert view.refresh()["mode"] == "full"
    assert view.verify()["ok"]
    order = _hash_order(spark, g0)
    got = _rows(view)
    assert got["g0"][:2] == (6, tuple(order[:3]))
    # under k: the sample IS the membership and KMV is exact
    assert got["g1"] == (2, tuple(_hash_order(spark, ["x1", "x2"])), 2)
    assert got[None][0] == 1 and got[None][2] == 1

    # pick fresh ids deterministically above/below g0's 3rd hash
    pool = [f"p{i}" for i in range(30)]
    order_all = _hash_order(spark, g0 + pool)
    cut = order_all.index(order[2])
    above = [c for c in pool if order_all.index(c) > cut]
    below = [c for c in pool if order_all.index(c) < cut]
    assert above and below  # 30 hashes around a median cut

    # addition hashing ABOVE the k-th value: folds in and falls out of
    # the slice — clean, sample unchanged
    _apply(spark, sink, "b2", [("I", 30, above[0], "g0")])
    r = view.refresh()
    assert r["mode"] == "incremental" and r["rescanned_groups"] == 0
    assert view.verify()["ok"]
    assert _rows(view)["g0"][1] == tuple(order[:3])

    # addition BELOW it: enters the sample — still clean
    _apply(spark, sink, "b3", [("I", 31, below[0], "g0")])
    r = view.refresh()
    assert r["rescanned_groups"] == 0
    assert view.verify()["ok"]
    live = g0 + [above[0], below[0]]
    assert _rows(view)["g0"][1] == tuple(_hash_order(spark, live)[:3])

    # removal ABOVE the stored k-th hash: provably outside — clean
    _apply(spark, sink, "b4", [("D", 40, above[0], None)])
    r = view.refresh()
    assert r["rescanned_groups"] == 0
    assert view.verify()["ok"]
    live.remove(above[0])

    # removal of a SAMPLED id: dirty — rescan restores the runner-up
    head = _hash_order(spark, live)[0]
    _apply(spark, sink, "b5", [("D", 41, head, None)])
    r = view.refresh()
    assert r["rescanned_groups"] == 1
    assert view.verify()["ok"]
    live.remove(head)
    assert _rows(view)["g0"][1] == tuple(_hash_order(spark, live)[:3])

    # update that KEEPS the id (patch-like CDC): remove+add of the
    # same id self-cancels — clean even though the id is sampled
    sampled = _rows(view)["g0"][1][0]
    _apply(spark, sink, "b6", [("U", 42, sampled, "g0")])
    r = view.refresh()
    assert r["rescanned_groups"] == 0
    assert view.verify()["ok"]

    # under-k group: removal filters the membership array — no rescan
    _apply(spark, sink, "b7", [("D", 43, "x1", None)])
    r = view.refresh()
    assert r["rescanned_groups"] == 0
    assert view.verify()["ok"]
    assert _rows(view)["g1"] == (1, ("x2",), 1)

    # group-moving update: sampled id leaves g0 (dirty) and arrives in
    # g1 under k (clean membership fold) — ONE rescan total
    mover = _rows(view)["g0"][1][0]
    _apply(spark, sink, "b8", [("U", 44, mover, "g1")])
    r = view.refresh()
    assert r["rescanned_groups"] == 1
    assert view.verify()["ok"]
    live.remove(mover)
    got = _rows(view)
    assert got["g0"][1] == tuple(_hash_order(spark, live)[:3])
    assert got["g1"] == (2, tuple(_hash_order(spark, ["x2", mover])), 2)


def test_sample_adds_truncation_stays_exact(spark, tmp_path):
    """A window adding MORE than k new ids to one group: the delta
    carries only the adds' bottom-k, and the merged result must still
    equal a from-scratch build (bottom-k of a union is contained in
    the union of bottom-ks; whenever truncation dropped adds, the
    merged sample is provably full)."""
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    view = SampleView(spark, sink, str(tmp_path / "v"), ["grp"], k=4)
    _apply(spark, sink, "b1", [("I", 1, "seed", "g0")])
    view.refresh()
    _apply(spark, sink, "b2", [
        ("I", 10 + i, f"bulk{i}", "g0") for i in range(25)
    ])
    r = view.refresh()
    assert r["mode"] == "incremental" and r["rescanned_groups"] == 0
    assert view.verify()["ok"]
    fresh = SampleView(spark, sink, str(tmp_path / "v2"), ["grp"], k=4)
    fresh.refresh()
    assert _rows(view) == _rows(fresh)


def test_sample_kmv_estimates(spark, tmp_path):
    """KMV over a full sample lands within its standard error of the
    exact count (k=64 → ~12.7% standard error; assert 3 sigma — and
    the hash is fixed, so this is deterministic, not flaky), and is
    exactly the membership size below k."""
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    view = SampleView(spark, sink, str(tmp_path / "v"), ["grp"], k=64)
    sink.apply_batch(
        spark.createDataFrame(
            [("I", i, f"doc-{i}", "big" if i <= 2000 else "small")
             for i in range(1, 2011)],
            "op string, op_sequence long, doc_id string, grp string",
        ),
        "b1",
    )
    view.refresh()
    got = _rows(view)
    assert got["small"][2] == 10
    assert abs(got["big"][2] - 2000) / 2000 < 0.38
    assert view.verify()["ok"]


def test_sample_refusals(spark, tmp_path):
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    with pytest.raises(ValueError, match="k must be"):
        SampleView(spark, sink, str(tmp_path / "v"), ["g"], k=0)
    with pytest.raises(ValueError, match="k must be"):
        # k=1 degenerates the KMV estimator to 0 for every full group
        SampleView(spark, sink, str(tmp_path / "v"), ["g"], k=1)
    # non-string id column refuses with guidance
    sink.apply_batch(
        spark.createDataFrame(
            [("I", 1, "d1", 5)],
            "op string, op_sequence long, doc_id string, num long",
        ),
        "b1",
    )
    bad = SampleView(spark, sink, str(tmp_path / "v"), ["doc_id"], id_col="num")
    with pytest.raises(ValueError, match="cast/derive a string id"):
        bad.refresh()
    # k is pinned in the pointer
    view = SampleView(spark, sink, str(tmp_path / "v2"), ["num"], k=8)
    view.refresh()
    assert view.current()["k"] == 8
    other = SampleView(spark, sink, str(tmp_path / "v2"), ["num"], k=16)
    sink.apply_batch(
        spark.createDataFrame(
            [("I", 2, "d2", 5)],
            "op string, op_sequence long, doc_id string, num long",
        ),
        "b2",
    )
    with pytest.raises(ValueError, match="delete the view directory"):
        other.refresh()
    with pytest.raises(ValueError, match="stored k"):
        other.verify()
    assert view.refresh()["mode"] == "incremental"
    assert view.verify()["ok"]
