"""Secondary value index (sinks/token_index.py::ValueIndex): scalar
column value -> doc postings maintained from the pre-image changelog,
and the index-accelerated equality scan (select_rows) driving the
sink's four-prune lookup.

Pins: maintained postings equal a full recompute through updates and
deletes; NULL values are never indexed; select_rows equals
scan_where's answer at the head and refuses a lagging index unless
allow_stale (where re-filtering removes false positives); the
selectivity cap fails loudly; scalar/array column misuse fails
loudly."""

import shutil

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.sinks.token_index import TokenIndex, ValueIndex

SCHEMA = (
    "op string, op_sequence long, doc_id string, tokens array<int>, "
    "n_tok int, source string"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(prefix, n, seq0, source, op="I"):
    return [
        (op, seq0 + i, f"{prefix}-{i:04d}",
         None if op == "D" else [seq0 + i],
         None if op == "D" else 2,
         None if op == "D" else source)
        for i in range(n)
    ]


@pytest.fixture()
def sink(spark, tmp_path):
    root = str(tmp_path / "sink")
    shutil.rmtree(root, ignore_errors=True)
    s = SnapshotSink(spark, root, n_buckets=4, compact_threshold=100)
    s.apply_batch(_batch(spark, _rows("a", 20, 1000, "web")), "b-a")
    s.apply_batch(_batch(spark, _rows("b", 20, 2000, "books")), "b-b")
    s.apply_batch(_batch(spark, _rows("z", 3, 3000, "rare")), "b-z")
    return s


def _ix(spark, sink, tmp_path):
    return ValueIndex(
        spark, sink, str(tmp_path / "vix"), token_col="source", n_buckets=8
    )


def test_full_build_matches_recompute_and_lookup(spark, sink, tmp_path):
    ix = _ix(spark, sink, tmp_path)
    assert ix.refresh()["mode"] == "full"
    assert ix.verify()["ok"]
    docs = {r["doc_id"] for r in ix.lookup(["rare"]).collect()}
    assert docs == {"z-0000", "z-0001", "z-0002"}


def test_incremental_updates_deletes_and_nulls(spark, sink, tmp_path):
    ix = _ix(spark, sink, tmp_path)
    ix.refresh()
    # move one doc off 'rare', delete another, and insert a NULL-source
    # doc (must never be indexed)
    sink.apply_batch(
        _batch(spark, [
            ("U", 9000, "z-0000", [1], 1, "web"),
            ("D", 9001, "z-0001", None, None, None),
            ("I", 9002, "n-0000", [2], 1, None),
        ]),
        "b-mut",
    )
    r = ix.refresh()
    assert r["mode"] == "incremental"
    assert ix.verify()["ok"], ix.verify()
    assert {r["doc_id"] for r in ix.lookup(["rare"]).collect()} == {"z-0002"}
    got = ix.read()
    assert got.filter(F.col("token").isNull()).count() == 0
    assert got.filter(F.col("doc_id") == "n-0000").count() == 0


def test_select_rows_matches_scan_where(spark, sink, tmp_path):
    ix = _ix(spark, sink, tmp_path)
    ix.refresh()
    via_index = ix.select_rows(["rare"])
    via_scan = sink.scan_where([("source", "=", "rare")])
    cols = sorted(via_index.columns)
    assert cols == sorted(via_scan.columns)
    a = sorted(map(tuple, via_index.select(*cols).collect()))
    b = sorted(map(tuple, via_scan.select(*cols).collect()))
    assert a == b and len(a) == 3


def test_select_rows_staleness_contract(spark, sink, tmp_path):
    ix = _ix(spark, sink, tmp_path)
    ix.refresh()
    # sink advances: z-0000 leaves 'rare' AFTER the index version
    sink.apply_batch(
        _batch(spark, [("U", 9100, "z-0000", [1], 1, "web")]), "b-stale"
    )
    with pytest.raises(ValueError, match="lags sink head"):
        ix.select_rows(["rare"])
    # allow_stale: the false positive (z-0000 still posted under
    # 'rare') is removed by the current-value re-filter
    docs = {r["doc_id"] for r in
            ix.select_rows(["rare"], allow_stale=True).collect()}
    assert docs == {"z-0001", "z-0002"}
    ix.refresh()
    docs = {r["doc_id"] for r in ix.select_rows(["rare"]).collect()}
    assert docs == {"z-0001", "z-0002"}


def test_select_rows_selectivity_cap(spark, sink, tmp_path):
    ix = _ix(spark, sink, tmp_path)
    ix.refresh()
    with pytest.raises(ValueError, match="not selective enough"):
        ix.select_rows(["web"], max_keys=5)
    assert ix.select_rows(["missing-value"]).count() == 0


def test_type_misuse_fails_loudly(spark, sink, tmp_path):
    with pytest.raises(ValueError, match="not a scalar column"):
        ValueIndex(
            spark, sink, str(tmp_path / "bad"), token_col="tokens"
        ).refresh()
    with pytest.raises(ValueError, match="not an array column"):
        TokenIndex(
            spark, sink, str(tmp_path / "bad2"), token_col="source"
        ).refresh()
