"""compact(zorder=True): Morton-curve multi-column clustering.

Pins (1) the interleave expression bit-for-bit against a Python
reference, (2) the LAYOUT claim with parquet footer evidence — under a
linear (a, b) sort a predicate on b alone admits every file, under
z-order most files' [min, max] on b exclude it, (3) fold/read
correctness is untouched by the sort, (4) cron idempotence: re-running
the same zorder compact is a no-op, switching linear <-> zorder is
not, (5) the refusal surface (column count, unsupported types)."""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from beehive_data_etl_spark.operators.zorder import zorder_expr
from beehive_data_etl_spark.sinks.snapshot import KEY, SnapshotSink


def _morton(vals, n):
    z = 0
    for bit in range(16):
        for j, v in enumerate(vals):
            z |= ((v >> bit) & 1) << (bit * n + j)
    return z


def test_zorder_expr_matches_reference(spark):
    schema = T.StructType(
        [T.StructField("x", T.LongType()), T.StructField("y", T.LongType())]
    )
    # ranges [0, 65535] make the quantizer the identity on the codes
    rngs = {"x": [0, 65535], "y": [0, 65535]}
    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 40000)]
    df = spark.createDataFrame(rows, schema)
    got = [
        r.z
        for r in df.select(zorder_expr(schema, ["x", "y"], rngs).alias("z"))
        .collect()
    ]
    want = [_morton(v, 2) for v in rows]
    assert got == want
    # NULL codes to 0 (sorts first), never NULL in the sort key
    r = (
        spark.createDataFrame([(None, 4)], schema)
        .select(zorder_expr(schema, ["x", "y"], rngs).alias("z"))
        .collect()[0]
        .z
    )
    assert r == _morton((0, 4), 2)


def test_zorder_four_columns_never_negative(spark):
    """At 4 columns the naive 16-bit interleave would write a code bit
    into bit 63 — the BIGINT sign bit — making half the 4th column's
    range sort FIRST (review-found). The per-column bit budget drops
    to 15 there: z stays in [0, 2^60)."""
    schema = T.StructType(
        [T.StructField(c, T.LongType()) for c in ("w", "x", "y", "v")]
    )
    rngs = {c: [0, 32767] for c in ("w", "x", "y", "v")}
    top = 32767
    rows = [(0, 0, 0, 0), (top, top, top, top), (top, 0, 0, 0),
            (0, 0, 0, top), (123, 456, 789, 1011)]
    got = [
        r.z
        for r in spark.createDataFrame(rows, schema)
        .select(zorder_expr(schema, ["w", "x", "y", "v"], rngs).alias("z"))
        .collect()
    ]
    assert all(0 <= z < (1 << 60) for z in got), got
    assert got[0] == 0 and got[1] == (1 << 60) - 1


def _batch(spark, n):
    # two independent deterministic uniform-ish columns in [0, 4096)
    return spark.createDataFrame(
        [
            ("I", 1000 + i, f"doc-{i:06d}", (i * 48271) % 4096,
             (i * 69621) % 4096)
            for i in range(n)
        ],
        "op string, op_sequence long, doc_id string, a int, b int",
    )


def _file_spans(sink, col):
    """Per-file [min, max] of ``col`` straight from parquet footers."""
    snap = sink.current_snapshot()
    spans = []
    for ents in snap["buckets"].values():
        for e in ents:
            d = os.path.join(sink.root, e["path"])
            for f in glob.glob(os.path.join(d, "*.parquet")):
                md = pq.read_metadata(f)
                idx = next(
                    i for i in range(len(md.schema))
                    if md.schema.column(i).path == col
                )
                lo = min(
                    md.row_group(g).column(idx).statistics.min
                    for g in range(md.num_row_groups)
                )
                hi = max(
                    md.row_group(g).column(idx).statistics.max
                    for g in range(md.num_row_groups)
                )
                spans.append((lo, hi))
    return spans


@pytest.fixture(scope="module")
def zsink(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("zt"))
    s = SnapshotSink(
        spark, root, n_buckets=2, compact_threshold=100, target_file_rows=500
    )
    s.apply_batch(_batch(spark, 16000), "b1")
    return s


def test_zorder_layout_prunes_second_column(spark, zsink):
    s = zsink
    expected = s.read_final().orderBy(KEY).collect()

    s.compact(cluster_by=["a", "b"])
    lin = _file_spans(s, "b")
    # linear (a, b) sort: a-major runs leave b unconstrained — the
    # probe value is admitted by (almost) every file
    lin_admit = sum(1 for lo, hi in lin if lo <= 2048 <= hi)
    assert lin_admit >= 0.9 * len(lin)

    s.compact(cluster_by=["a", "b"], zorder=True)
    zsp = _file_spans(s, "b")
    assert len(zsp) >= 16  # target_file_rows actually split the bucket
    z_admit = sum(1 for lo, hi in zsp if lo <= 2048 <= hi)
    # the Morton layout's whole point: most files exclude the value
    assert z_admit <= 0.5 * len(zsp)
    # ... on BOTH columns (a linear sort can do one; the curve does all)
    za = _file_spans(s, "a")
    assert sum(1 for lo, hi in za if lo <= 2048 <= hi) <= 0.5 * len(za)

    # the sort changed the layout, never the data
    assert s.read_final().orderBy(KEY).collect() == expected
    # scan_where on the second column stays exact
    got = s.scan_where([("b", "=", 2048)]).select(KEY).collect()
    want = [r for r in expected if r.b == 2048]
    assert {r[0] for r in got} == {r[KEY] for r in want} and want


def test_zorder_cron_idempotence(spark, zsink):
    s = zsink
    # establish the z layout ourselves (order-independent: this is a
    # rewrite or a no-op depending on what ran before)
    s.compact(cluster_by=["a", "b"], zorder=True)
    # same columns + same zorder flag -> single-entry buckets skip
    assert s.compact(cluster_by=["a", "b"], zorder=True)["compacted"] == []
    # switching BACK to linear is a real layout change, not a no-op
    assert s.compact(cluster_by=["a", "b"])["compacted"] != []


def test_zorder_refusals(spark, tmp_path):
    root = str(tmp_path / "t")
    s = SnapshotSink(spark, root, n_buckets=2)
    s.apply_batch(
        spark.createDataFrame(
            [("I", 1, "d1", [1, 2], 2, "s")],
            "op string, op_sequence long, doc_id string, "
            "tokens array<int>, n_tok int, source string",
        ),
        "b1",
    )
    with pytest.raises(ValueError, match="needs cluster_by"):
        s.compact(zorder=True)
    with pytest.raises(ValueError, match="2..4|2\\.\\.4"):
        s.compact(cluster_by=["n_tok"], zorder=True)
    with pytest.raises(ValueError, match="unsupported type"):
        s.compact(cluster_by=["tokens", "n_tok"], zorder=True)
