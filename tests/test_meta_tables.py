"""Queryable metadata tables (sinks/meta.py) — Iceberg's
files/snapshots/refs analogue, built driver-side from snapshot JSONs
and pinned against the sink's own metadata."""

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.sinks.meta import meta_table, register_meta_views
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink

SCHEMA = (
    "op string, op_sequence long, doc_id string, tokens array<int>, "
    "n_tok int, source string"
)


@pytest.fixture()
def table(spark, tmp_path):
    s = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    s.apply_batch(
        spark.createDataFrame(
            [("I", i, f"d-{i}", [i], i, "s") for i in range(12)], SCHEMA
        ),
        "b1",
    )
    s.apply_batch(
        spark.createDataFrame(
            [("U", 100, "d-0", [9], 1, "s2"), ("D", 101, "d-1", [], 0, "s")],
            SCHEMA,
        ),
        "b2",
    )
    s.tag("train", 1)
    s.compact()
    return s


def test_files_matches_snapshot_entries(table):
    snap = table.current_snapshot()
    df = meta_table(table, "files")
    want = sum(len(v) for v in snap["buckets"].values())
    assert df.count() == want
    # entry facts survive: compacted flags, per-bucket paths, key ranges
    got = {
        (r["bucket"], r["path"]): (r["compacted"], r["key_min"], r["key_max"])
        for r in df.collect()
    }
    for b_str, entries in snap["buckets"].items():
        for e in entries:
            kr = e.get("key_range") or (None, None)
            assert got[(int(b_str), e["path"])] == (
                bool(e.get("compacted")),
                kr[0],
                kr[1],
            )


def test_files_time_travel(table):
    v1_files = meta_table(table, "files", version=1)
    head_files = meta_table(table, "files")
    assert v1_files.count() < head_files.count() or (
        v1_files.collect() != head_files.collect()
    )
    # tag refs resolve too
    assert (
        meta_table(table, "files", version="train").collect()
        == v1_files.collect()
    )


def test_snapshots_operations_and_floor(table):
    table.rollback_to(2)
    df = meta_table(table, "snapshots")
    rows = {r["version"]: r for r in df.collect()}
    head = table.current_snapshot()["version"]
    assert set(rows) == set(range(1, head + 1))
    assert rows[1]["operation"] == "append"
    assert rows[3]["operation"] == "compaction"
    assert rows[head]["operation"] == "rollback_to"
    assert rows[2]["parent"] == 1
    assert all(
        rows[v]["committed_at"] <= rows[v + 1]["committed_at"]
        for v in range(1, head)
    )


def test_tags_batches_and_sql_views(spark, table):
    tags = {(r["name"], r["version"]) for r in meta_table(table, "tags").collect()}
    assert ("train", 1) in tags
    batches = [r["batch_id"] for r in meta_table(table, "batches").collect()]
    assert batches[:2] == ["b1", "b2"]
    register_meta_views(spark, table, prefix="mt")
    # compact() folds multi-delta buckets only (folding one file is
    # pointless): after it, no bucket holds more than one entry unless
    # all its entries were already single-delta — the ops question the
    # files view answers in one line
    worst = spark.sql(
        "SELECT max(n) FROM (SELECT bucket, count(*) AS n FROM mt_files "
        "GROUP BY bucket)"
    ).collect()[0][0]
    assert worst == 1
    assert (
        spark.sql("SELECT count(*) FROM mt_files WHERE compacted").collect()[
            0
        ][0]
        >= 1
    )
    joined = spark.sql(
        "SELECT s.operation, count(*) AS n FROM mt_snapshots s "
        "GROUP BY s.operation ORDER BY n DESC"
    ).collect()
    assert {r["operation"] for r in joined} >= {"append", "compaction"}


def test_unknown_kind_and_empty_table(spark, tmp_path, table):
    with pytest.raises(ValueError, match="unknown metadata table"):
        meta_table(table, "nope")
    # fresh table: views register as EMPTY typed tables (dashboards
    # wire up before ingest); explicit versions still raise
    empty = SnapshotSink(spark, str(tmp_path / "e"), n_buckets=2)
    assert register_meta_views(spark, empty, prefix="fresh")
    for kind in ("files", "snapshots", "tags", "batches"):
        assert meta_table(empty, kind).count() == 0
    with pytest.raises(Exception):
        meta_table(empty, "files", version=3)


def test_snapshots_keeps_tag_pins_below_floor(spark, tmp_path):
    """expire_snapshots keeps tagged JSONs below the floor — the
    snapshots table must show them, so tags JOIN snapshots never drops
    an audit pin; a trim_committed commit is labeled as such."""
    s = SnapshotSink(spark, str(tmp_path / "f"), n_buckets=2)
    for i in range(6):
        s.apply_batch(
            spark.createDataFrame(
                [("I", 10 + i, f"d-{i}", [i], i, "s")], SCHEMA
            ),
            f"b{i}",
        )
    s.tag("audit", 1)
    s.trim_committed_batches(retain_last=2)
    s.expire_snapshots(keep_last=2)
    df = meta_table(s, "snapshots")
    rows = {r["version"]: r for r in df.collect()}
    head = s.current_snapshot()["version"]
    floor = s.current_snapshot()["snapshot_floor"]
    assert 1 in rows  # the pinned version below the floor
    assert set(rows) >= set(range(floor, head + 1))
    assert "trim_committed" in {r["operation"] for r in rows.values()}
    joined = meta_table(s, "tags").join(df, "version").collect()
    assert {r["name"] for r in joined} == {"audit"}
