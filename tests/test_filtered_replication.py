"""Predicate-filtered replication (Replicator(where=...)): the
downstream holds exactly the matching subset of the source's live
rows across every membership transition.

Pins: the subset invariant dst.read_final() == filter(src.read_final())
after bootstrap and after windows carrying moves INTO and OUT OF the
predicate plus genuine deletes; the eviction is a real tombstone at
the evicting row's op_sequence (so replays/late windows cannot
resurrect); unfiltered windows still work side by side; patch sources
and bad predicates are refused; an all-miss window commits empty and
advances the cursor."""

import shutil

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.sinks.replicate import Replicator
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink

SCHEMA = (
    "op string, op_sequence long, doc_id string, tokens array<int>, "
    "n_tok int, source string"
)

PRED = [("source", "=", "web")]


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _subset(src):
    df = src.read_final().filter(F.col("source") == "web")
    return sorted(map(tuple, df.select(*sorted(df.columns)).collect()))


def _dst_rows(dst):
    df = dst.read_final()
    return sorted(map(tuple, df.select(*sorted(df.columns)).collect()))


@pytest.fixture()
def pair(spark, tmp_path):
    src = SnapshotSink(spark, str(tmp_path / "src"), n_buckets=4,
                       compact_threshold=100)
    dst = SnapshotSink(spark, str(tmp_path / "dst"), n_buckets=2,
                       compact_threshold=100)
    src.apply_batch(
        _batch(spark, [
            ("I", 100, "w-1", [1], 1, "web"),
            ("I", 101, "w-2", [2], 1, "web"),
            ("I", 102, "b-1", [3], 1, "books"),
            ("I", 103, "b-2", [4], 1, "books"),
            ("D", 104, "gone", None, None, None),
        ]),
        "b-0",
    )
    return src, dst


def test_bootstrap_carries_subset_and_tombstones(spark, pair):
    src, dst = pair
    rep = Replicator(src, dst, name="webmirror", where=PRED)
    assert not rep.sync().get("skipped")
    assert _dst_rows(dst) == _subset(src)
    assert {r.doc_id for r in dst.read_state().filter("deleted").collect()} \
        == {"gone"}
    assert dst.read_state().filter(
        ~F.col("deleted") & (F.col("source") != "web")
    ).count() == 0


def test_membership_transitions_across_windows(spark, pair):
    src, dst = pair
    rep = Replicator(src, dst, name="webmirror", where=PRED)
    rep.sync()
    # window 1: w-1 leaves the subset (eviction), b-1 joins it,
    # w-2 is deleted outright, b-2 updates but stays outside
    src.apply_batch(
        _batch(spark, [
            ("U", 200, "w-1", [1, 1], 2, "books"),
            ("U", 201, "b-1", [3, 3], 2, "web"),
            ("D", 202, "w-2", None, None, None),
            ("U", 203, "b-2", [4, 4], 2, "books"),
        ]),
        "b-1",
    )
    assert not rep.sync().get("skipped")
    assert _dst_rows(dst) == _subset(src)
    assert {r[0] for r in dst.read_final().select("doc_id").collect()} == {"b-1"}
    # the eviction is a genuine tombstone AT THE EVICTING SEQ
    tomb = {r.doc_id: r.op_sequence
            for r in dst.read_state().filter("deleted").collect()}
    assert tomb["w-1"] == 200 and tomb["w-2"] == 202
    # window 2: w-1 comes back into the subset
    src.apply_batch(
        _batch(spark, [("U", 300, "w-1", [9], 1, "web")]), "b-2"
    )
    rep.sync()
    assert _dst_rows(dst) == _subset(src)
    docs = {r[0] for r in dst.read_final().select("doc_id").collect()}
    assert docs == {"b-1", "w-1"}


def test_null_predicate_value_evicts(spark, pair):
    """Three-valued-logic regression (review-found): an update setting
    the predicate column to NULL made new_m SQL-NULL, and the bare
    ~new_m shipped the row as a LIVE all-NULL upsert instead of the
    eviction delete — permanently diverging the replica. NULL rejects
    the predicate, so the row must tombstone."""
    src, dst = pair
    rep = Replicator(src, dst, name="webmirror", where=PRED)
    rep.sync()
    src.apply_batch(
        _batch(spark, [("U", 600, "w-1", [1], 1, None)]), "b-null"
    )
    rep.sync()
    assert _dst_rows(dst) == _subset(src)
    docs = {r[0] for r in dst.read_final().select("doc_id").collect()}
    assert "w-1" not in docs
    tomb = {r.doc_id: r.op_sequence
            for r in dst.read_state().filter("deleted").collect()}
    assert tomb.get("w-1") == 600


def test_all_miss_window_commits_empty_and_advances(spark, pair):
    src, dst = pair
    rep = Replicator(src, dst, name="webmirror", where=PRED)
    rep.sync()
    src.apply_batch(
        _batch(spark, [("U", 400, "b-2", [7], 1, "books")]), "b-miss"
    )
    out = rep.sync()
    assert not out.get("skipped")
    assert rep.cursor() == src.current_snapshot()["version"]
    assert _dst_rows(dst) == _subset(src)
    assert rep.sync()["skipped"]


def test_filtered_and_full_replicas_coexist(spark, pair, tmp_path):
    src, dst = pair
    full = SnapshotSink(spark, str(tmp_path / "full"), n_buckets=2,
                        compact_threshold=100)
    rf = Replicator(src, dst, name="webmirror", where=PRED)
    ra = Replicator(src, full, name="all")
    rf.sync()
    ra.sync()
    src.apply_batch(
        _batch(spark, [("U", 500, "w-1", [1], 1, "books")]), "b-x"
    )
    rf.sync()
    ra.sync()
    assert _dst_rows(dst) == _subset(src)
    a = src.read_final()
    b = full.read_final()
    assert sorted(map(tuple, a.select(*sorted(a.columns)).collect())) == \
        sorted(map(tuple, b.select(*sorted(b.columns)).collect()))


def test_refusals(spark, tmp_path):
    src = SnapshotSink(spark, str(tmp_path / "p"), n_buckets=2, patch=True)
    dst = SnapshotSink(spark, str(tmp_path / "q"), n_buckets=2, patch=True)
    with pytest.raises(TypeError, match="patch-mode source"):
        Replicator(src, dst, name="f", where=PRED)
    row_src = SnapshotSink(spark, str(tmp_path / "r"), n_buckets=2)
    with pytest.raises(ValueError, match="unknown op"):
        Replicator(row_src, dst, name="g", where=[("source", "!=", "x")])
