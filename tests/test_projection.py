"""Column projection pushed BELOW the merge-on-read fold
(``columns=`` on read_final / lookup / scan_range / scan_where):
narrow reads of a wide table must cost bytes ∝ the columns asked
for, not the table width — at 10^10 rows the difference between
scanning 2 columns and 50.

Pins:
- exactness vs the full read for BOTH folds. Row-LWW is sound
  because the per-key max-struct packs whatever payload columns are
  present; per-cell patch tables are the interesting case — each
  column folds off its own ``_cell_seq`` entry, so a column subset
  must yield exactly the full fold's values for those columns even
  when the winning row is ASSEMBLED from cells in different deltas;
- the narrowed schema reaches the parquet scan's ReadSchema (the
  projection is real, not a post-fold select);
- scan_where predicate columns ride the read target even when the
  caller didn't ask for them back;
- validation: unknown / internal columns are refused driver-side;
- empty-table and all-pruned paths return the narrow schema.
"""

import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.sinks.snapshot import SnapshotSink

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
    """Inserts, updates and deletes across three batches so the fold
    has real work to do (stale versions + tombstones present)."""
    s = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    s.apply_batch(_batch(spark, _rows("a", 12, 1000, "web", n_tok=5)), "b1")
    s.apply_batch(
        _batch(spark, _rows("a", 6, 2000, "web2", op="U", n_tok=9)), "b2"
    )
    s.apply_batch(_batch(spark, _rows("a", 3, 3000, None, op="D")), "b3")
    return s


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def _expect(sink, cols):
    full = sink.read_final()
    return _sorted_rows(full.select("doc_id", *cols))


def test_read_final_projection_exact(sink):
    got = sink.read_final(columns=["n_tok"])
    assert got.columns == ["doc_id", "n_tok"]
    assert _sorted_rows(got) == _expect(sink, ["n_tok"])
    # multi-column, caller order preserved, duplicates collapsed
    got2 = sink.read_final(columns=["source", "n_tok", "source"])
    assert got2.columns == ["doc_id", "source", "n_tok"]
    assert _sorted_rows(got2) == _expect(sink, ["source", "n_tok"])


def test_lookup_and_scan_range_projection_exact(sink):
    ids = ["a-0000", "a-0004", "a-0007", "missing"]
    got = sink.lookup(ids, columns=["source"])
    full = sink.lookup(ids).select("doc_id", "source")
    assert got.columns == ["doc_id", "source"]
    assert _sorted_rows(got) == _sorted_rows(full)

    got = sink.scan_range(lo="a-0004", hi="a-0009", columns=["n_tok"])
    full = sink.scan_range(lo="a-0004", hi="a-0009").select("doc_id", "n_tok")
    assert got.columns == ["doc_id", "n_tok"]
    assert _sorted_rows(got) == _sorted_rows(full)


def test_scan_where_predicate_col_not_in_output(sink):
    """The filter applies to POST-fold values, so the predicate column
    must survive the narrowed read even when not asked for back."""
    got = sink.scan_where([("n_tok", ">=", 9)], columns=["source"])
    full = (
        sink.read_final().filter(F.col("n_tok") >= 9).select("doc_id", "source")
    )
    assert got.columns == ["doc_id", "source"]
    assert _sorted_rows(got) == _sorted_rows(full)


def test_projection_reaches_parquet_scan(sink, capsys):
    """The narrowed read target must reach ReadSchema — dropping a
    wide column post-scan would still pay its bytes."""
    sink.read_final(columns=["n_tok"]).explain("formatted")
    plan = capsys.readouterr().out
    schemas = re.findall(r"ReadSchema: struct<(.*?)>", plan)
    assert schemas, plan
    for s in schemas:
        names = {f.split(":")[0] for f in s.split(",") if f}
        assert "tokens" not in names and "source" not in names, plan
        assert "n_tok" in names, plan


def test_projection_validation(sink):
    with pytest.raises(ValueError, match="no such payload column"):
        sink.read_final(columns=["nope"])
    for internal in ("op_sequence", "deleted", "_bucket"):
        with pytest.raises(ValueError, match="no such payload column"):
            sink.read_final(columns=[internal])
    # the key itself is always allowed (and deduped into slot 0)
    got = sink.read_final(columns=["doc_id", "n_tok"])
    assert got.columns == ["doc_id", "n_tok"]


def test_projection_empty_paths(spark, tmp_path, sink):
    # all-pruned lookup (no key matches any bucket's range)
    got = sink.lookup(["zzzz"], columns=["n_tok"])
    assert got.columns == ["doc_id", "n_tok"] and got.count() == 0
    # empty table: schema known from the snapshot, zero rows
    s = SnapshotSink(spark, str(tmp_path / "e"), n_buckets=2)
    s.apply_batch(_batch(spark, []).limit(0), "b0")
    got = s.read_final(columns=["source"])
    assert got.columns == ["doc_id", "source"] and got.count() == 0


def test_patch_table_projection_assembled_rows(spark, tmp_path):
    """Per-cell fold: the winning row is stitched from cells in
    DIFFERENT deltas; a projected read must still return the full
    fold's values for the asked-for columns."""
    from patch_model import SCHEMA as PSCHEMA

    def _pdf(events):
        return spark.createDataFrame(pd.DataFrame(events), schema=PSCHEMA)

    sink = SnapshotSink(spark, str(tmp_path / "p"), n_buckets=4, patch=True)
    sink.apply_batch(
        _pdf(
            [
                {"op": "I", "op_sequence": 1, "doc_id": "d1",
                 "a": 1.0, "b": "x", "c": 10, "patch_cols": None},
                {"op": "I", "op_sequence": 2, "doc_id": "d2",
                 "a": 2.0, "b": "y", "c": 20, "patch_cols": None},
            ]
        ),
        "b1",
    )
    # patches land in a separate delta: d1's current row is assembled
    # from both entries (a,b from batch 1; c from batch 2)
    sink.apply_batch(
        _pdf(
            [
                {"op": "P", "op_sequence": 3, "doc_id": "d1",
                 "a": None, "b": None, "c": 99, "patch_cols": ["c"]},
                {"op": "P", "op_sequence": 4, "doc_id": "d2",
                 "a": 5.5, "b": None, "c": None, "patch_cols": ["a"]},
            ]
        ),
        "b2",
    )
    full = {r["doc_id"]: r.asDict() for r in sink.read_final().collect()}
    got = sink.read_final(columns=["c", "a"])
    assert got.columns == ["doc_id", "c", "a"]
    by_id = {r["doc_id"]: r.asDict() for r in got.collect()}
    assert by_id["d1"] == {"doc_id": "d1", "c": 99, "a": 1.0}
    assert by_id["d2"] == {"doc_id": "d2", "c": 20, "a": 5.5}
    for k in by_id:
        assert by_id[k]["c"] == full[k]["c"] and by_id[k]["a"] == full[k]["a"]
