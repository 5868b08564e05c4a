"""Generalized column-stats pruning: every commit entry records
per-column [min, max] from the staged parquet footers (the Iceberg
manifest-column-stats analogue beyond the key column), and
scan_where() skips whole BUCKETS whose stats prove no current row can
match a predicate conjunction — driver-side, before any Spark job.

Pins (each a correctness argument, not a convenience):
- exactness vs the unpruned read_final() under inserts, updates,
  deletes and tombstones — including the stale-winner trap (a key's
  old version matches, its newest doesn't: filter must apply AFTER
  the LWW fold, and pruning must stay bucket-granular);
- the patch-table assembled-row trap: a per-cell table's latest row
  is stitched from cells in DIFFERENT entries, so the row-LWW rule
  ("one entry admits all conjuncts") would wrongly prune — patch
  tables use the per-conjunct existential rule;
- all-NULL marker: a tombstone-only delta records [] ("provably no
  non-null value") and comparison predicates may prune on it;
- legacy entries without col_ranges are never pruned;
- cluster_by compaction keeps every read exact and records fresh
  stats."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.sinks.snapshot import (
    SnapshotSink,
    _col_range_admits,
)

SCHEMA = (
    "op string, op_sequence long, doc_id string, tokens array<int>, "
    "n_tok int, source string"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(prefix, n, seq0, source, op="I", n_tok=2):
    return [
        (op, seq0 + i, f"{prefix}-{i:04d}",
         None if op == "D" else [seq0 + i, i],
         None if op == "D" else n_tok,
         None if op == "D" else source)
        for i in range(n)
    ]


@pytest.fixture()
def sink(spark, tmp_path):
    """Three sources ingested in separate batches: hashing scatters
    keys across buckets, but each batch's files carry only its own
    source value — the layout where per-column stats pruning bites
    for a rare-source predicate."""
    root = str(tmp_path / "sink")
    shutil.rmtree(root, ignore_errors=True)
    s = SnapshotSink(spark, root, n_buckets=4, compact_threshold=100)
    s.apply_batch(_batch(spark, _rows("a", 12, 1000, "web", n_tok=5)), "b-a")
    s.apply_batch(_batch(spark, _rows("b", 12, 2000, "books", n_tok=50)), "b-b")
    # the rare source: TWO keys — lands in at most two buckets
    s.apply_batch(_batch(spark, _rows("z", 2, 3000, "rare", n_tok=500)), "b-z")
    return s


def _expected(sink, pred_col_op_vals):
    df = sink.read_final()
    for c, op, v in pred_col_op_vals:
        col = F.col(c)
        if op == "=":
            df = df.filter(col == v)
        elif op == ">=":
            df = df.filter(col >= v)
        elif op == "<":
            df = df.filter(col < v)
        elif op == "between":
            df = df.filter(col.between(v[0], v[1]))
        elif op == "in":
            df = df.filter(col.isin(list(v)))
        else:
            raise AssertionError(op)
    return df


def _same(a, b):
    ra = sorted(map(tuple, a.select(*sorted(a.columns)).collect()))
    rb = sorted(map(tuple, b.select(*sorted(b.columns)).collect()))
    assert ra == rb


def test_col_ranges_recorded_on_ingest(sink):
    snap = sink.current_snapshot()
    ents = [e for ents in snap["buckets"].values() for e in ents]
    assert ents
    for e in ents:
        cr = e.get("col_ranges")
        assert cr, e
        assert "source" in cr and "n_tok" in cr and "op_sequence" in cr
        # the KEY is deliberately absent (key_range covers it)
        assert "doc_id" not in cr
        # array column has no top-level leaf stats
        assert "tokens" not in cr
        lo, hi = cr["source"]
        assert lo <= hi


def test_scan_where_exact_and_prunes_rare_source(sink):
    preds = [("source", "=", "rare")]
    plan = sink.plan_scan_where(preds)
    # the two rare keys live in at most 2 of 4 buckets; every other
    # non-empty bucket is provably web/books-only
    assert len(plan["buckets_read"]) <= 2
    assert plan["buckets_read"], plan
    _same(sink.scan_where(preds), _expected(sink, preds))


def test_scan_where_range_and_conjunction(sink):
    for preds in (
        [("n_tok", ">=", 100)],
        [("n_tok", "between", (40, 60))],
        [("source", "in", ["books", "rare"])],
        [("source", "=", "books"), ("n_tok", "<", 100)],
        [("doc_id", ">=", "z"), ("source", "=", "rare")],
    ):
        _same(sink.scan_where(preds), _expected(sink, preds))


def test_joint_entry_rule_prunes_cross_entry_conjunction(sink):
    # web rows have n_tok=5, rare rows n_tok=500: no SINGLE entry
    # admits (source=web AND n_tok>=100), even though some bucket has
    # one entry admitting each conjunct — the row-LWW joint rule
    # prunes every bucket
    plan = sink.plan_scan_where([("source", "=", "web"), ("n_tok", ">=", 100)])
    assert plan["buckets_read"] == []
    assert sink.scan_where(
        [("source", "=", "web"), ("n_tok", ">=", 100)]
    ).count() == 0


def test_stale_winner_not_resurrected(sink):
    # flip one rare doc to a common source at a HIGHER seq, in its own
    # batch: the old 'rare' version still matches the stats of its
    # entry, so the bucket is read — but the post-fold filter must
    # exclude the doc (its current source is no longer rare)
    sink.apply_batch(
        _batch(sink.spark, [("U", 9000, "z-0000", [1], 1, "web")]), "b-flip"
    )
    preds = [("source", "=", "rare")]
    got = sink.scan_where(preds)
    _same(got, _expected(sink, preds))
    assert "z-0000" not in {r["doc_id"] for r in got.collect()}


def test_deleted_rows_never_match(sink):
    sink.apply_batch(
        _batch(sink.spark, _rows("z", 2, 9500, None, op="D")), "b-del"
    )
    assert sink.scan_where([("source", "=", "rare")]).count() == 0


def test_tombstone_only_delta_records_allnull_marker(spark, tmp_path):
    root = str(tmp_path / "allnull")
    s = SnapshotSink(spark, root, n_buckets=2, compact_threshold=100)
    s.apply_batch(_batch(spark, _rows("k", 4, 100, "web")), "b-1")
    s.apply_batch(_batch(spark, _rows("k", 4, 200, None, op="D")), "b-2")
    snap = s.current_snapshot()
    markers = [
        e["col_ranges"]["source"]
        for ents in snap["buckets"].values()
        for e in ents
        if e["path"].split("/")[-2].endswith("b-2")
    ]
    assert markers and all(m == [] for m in markers)
    # [] admits no comparison predicate
    assert not _col_range_admits([], "=", "web")
    assert _col_range_admits(None, "=", "web")


def test_legacy_entries_without_stats_never_pruned(sink):
    snap = sink.current_snapshot()
    for ents in snap["buckets"].values():
        for e in ents:
            e.pop("col_ranges", None)
    path = os.path.join(
        sink.root, "_snapshots", f"v{snap['version']:06d}.json"
    )
    with open(path, "w") as fh:
        json.dump(snap, fh)
    preds = [("source", "=", "rare")]
    plan = sink.plan_scan_where(preds)
    assert plan["buckets_pruned"] == []
    _same(sink.scan_where(preds), _expected(sink, preds))


def test_patch_assembled_row_not_pruned(spark, tmp_path):
    """THE patch-mode trap: key's row is assembled from two entries —
    entry 1 (full insert) sets source='web' with n_tok=1, entry 2 (a
    patch) sets n_tok=999 only. The conjunction (source=web AND
    n_tok=999) is satisfied ONLY by the assembled row; no single entry
    admits both conjuncts, so the row-LWW joint rule would prune the
    bucket and silently lose the row. Patch tables therefore use the
    per-conjunct existential rule."""
    root = str(tmp_path / "patch")
    s = SnapshotSink(spark, root, n_buckets=2, compact_threshold=100,
                     patch=True)
    full = spark.createDataFrame(
        [("I", 100, "p-1", [1], 1, "web", None)],
        SCHEMA + ", patch_cols array<string>",
    )
    s.apply_batch(full, "b-full")
    patch = spark.createDataFrame(
        [("P", 200, "p-1", None, 999, None, ["n_tok"])],
        SCHEMA + ", patch_cols array<string>",
    )
    s.apply_batch(patch, "b-patch")
    preds = [("source", "=", "web"), ("n_tok", "=", 999)]
    plan = s.plan_scan_where(preds)
    assert plan["buckets_read"], "assembled row wrongly pruned"
    rows = s.scan_where(preds).collect()
    assert [r["doc_id"] for r in rows] == ["p-1"]
    assert rows[0]["n_tok"] == 999 and rows[0]["source"] == "web"


def test_cluster_by_compaction_exact_and_records_stats(sink):
    res = sink.compact(cluster_by=["source"])
    assert res["compacted"]
    snap = sink.current_snapshot()
    for ents in snap["buckets"].values():
        for e in ents:
            assert e.get("col_ranges"), e
    for preds in (
        [("source", "=", "rare")],
        [("n_tok", ">=", 100)],
        [("source", "=", "web"), ("n_tok", "<", 100)],
    ):
        _same(sink.scan_where(preds), _expected(sink, preds))
    # post-compaction: one entry per bucket, ranges now span sources —
    # rare-bucket pruning degrades to the buckets that hold rare keys
    plan = sink.plan_scan_where([("source", "=", "rare")])
    assert plan["buckets_read"]


def test_scan_where_time_travel(sink):
    v = sink.current_snapshot()["version"]
    sink.apply_batch(
        _batch(sink.spark, _rows("z", 2, 9500, None, op="D")), "b-del2"
    )
    assert sink.scan_where([("source", "=", "rare")]).count() == 0
    old = sink.scan_where([("source", "=", "rare")], version=v)
    assert old.count() == 2


def test_scan_where_validation(sink):
    with pytest.raises(ValueError, match="at least one"):
        sink.scan_where([])
    with pytest.raises(ValueError, match="unknown op"):
        sink.scan_where([("source", "!=", "web")])
    with pytest.raises(ValueError, match="no such payload column"):
        sink.scan_where([("deleted", "=", True)])
    with pytest.raises(ValueError, match="no such payload column"):
        sink.scan_where([("nope", "=", 1)])
    with pytest.raises(ValueError, match="between"):
        sink.scan_where([("n_tok", "between", 5)])
    # unbounded between is not null-rejecting — it would break the
    # all-NULL-marker pruning contract (review-found)
    with pytest.raises(ValueError, match="at least one bound"):
        sink.scan_where([("n_tok", "between", (None, None))])
    with pytest.raises(ValueError, match="cluster_by"):
        sink.compact(cluster_by=["doc_id"])
    with pytest.raises(ValueError, match="no such column"):
        sink.compact(cluster_by=["sorce"])


def test_cluster_by_compaction_is_cron_idempotent(sink):
    """MAINTAIN_CLUSTER_BY runs compact(cluster_by) every cycle: the
    second run over an unchanged table must rewrite NOTHING (the
    entries record their sort), not re-sort the whole table
    (review-found full-table-rewrite-per-cron)."""
    first = sink.compact(cluster_by=["source"])
    assert first["compacted"]
    second = sink.compact(cluster_by=["source"])
    assert second["compacted"] == [], second
    # a DIFFERENT sort does rewrite; plain compact() of the
    # single-entry buckets stays a no-op
    third = sink.compact(cluster_by=["n_tok"])
    assert third["compacted"]
    assert sink.compact()["compacted"] == []
    # new deltas re-dirty their buckets for the clustered compact
    sink.apply_batch(
        _batch(sink.spark, [("I", 9900, "new-1", [1], 1, "web")]), "b-new"
    )
    fourth = sink.compact(cluster_by=["n_tok"])
    assert len(fourth["compacted"]) >= 1


def test_admit_incomparable_evidence_never_prunes():
    # recorded str range vs an int probe: TypeError ⇒ admit (Spark,
    # not the stats, decides the match)
    assert _col_range_admits(["a", "z"], "=", 5)
    assert _col_range_admits([1, 9], "between", (None, 4))
    assert not _col_range_admits([1, 9], "between", (10, None))
    assert _col_range_admits([1, 9], "in", [0, 9, 100])
    assert not _col_range_admits([1, 9], "in", [0, 100])
