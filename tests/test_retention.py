"""delete_where: predicate-scoped soft deletes as ordinary change
events — the replicable/changelog-visible complement to purge_keys.

Pins:
- matched live rows tombstone, others untouched; the tombstones are
  REAL rows (read_state keeps them) at one shared fresh op_sequence;
- the changelog window carries them as D rows — every derived
  consumer sees the sweep like any other batch (unlike purge);
- idempotent: a re-run matches zero rows and commits nothing;
- LWW revive: a later higher-seq write of a deleted key wins;
- patch-mode tables sweep the same way (cells nulled via the normal
  D normalization);
- dry_run counts without applying; empty match is a no-op."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.operators.retention import delete_where
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink

SCHEMA = (
    "op string, op_sequence long, doc_id string, tokens array<int>, "
    "n_tok int, source string"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def sink(spark, tmp_path):
    s = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    s.apply_batch(
        _batch(
            spark,
            [
                ("I", 100 + i, f"d-{i}", [i], i, "old" if i < 5 else "new")
                for i in range(10)
            ],
        ),
        "b1",
    )
    return s


def test_delete_where_tombstones_matches(sink):
    v0 = sink.current_snapshot()["version"]
    out = delete_where(sink, [("source", "=", "old")])
    assert out["deleted"] == 5
    assert out["version"] > v0
    live = {r["doc_id"] for r in sink.read_final().collect()}
    assert live == {f"d-{i}" for i in range(5, 10)}
    # tombstones are REAL rows at the shared fresh sequence
    dead = sink.read_state().filter(F.col("deleted"))
    rows = dead.collect()
    assert {r["doc_id"] for r in rows} == {f"d-{i}" for i in range(5)}
    assert {r["op_sequence"] for r in rows} == {out["op_sequence"]}
    # changelog-visible: the window ships plain D events (replicable)
    ch = sink.read_changes_pruned(v0, out["version"])
    d_rows = [r for r in ch.collect() if r["change_type"] == "D"]
    assert {r["doc_id"] for r in d_rows} == {f"d-{i}" for i in range(5)}


def test_delete_where_idempotent_and_dry_run(sink):
    probe = delete_where(sink, [("n_tok", "<", 3)], dry_run=True)
    assert probe["deleted"] == 3 and probe["dry_run"]
    v_probe = sink.current_snapshot()["version"]
    assert v_probe == probe["version"]  # dry run committed nothing
    out = delete_where(sink, [("n_tok", "<", 3)])
    assert out["deleted"] == 3
    again = delete_where(sink, [("n_tok", "<", 3)])
    assert again["deleted"] == 0
    assert again["version"] == out["version"]  # no empty commit


def test_delete_where_lww_revive(sink, spark):
    out = delete_where(sink, [("source", "=", "old")])
    # a later, higher-seq image of a swept key wins LWW — correct for
    # a retention sweep (the next scheduled run re-evaluates)
    sink.apply_batch(
        _batch(spark, [("U", out["op_sequence"] + 50, "d-0", [9], 9, "new")]),
        "b-revive",
    )
    live = {r["doc_id"] for r in sink.read_final().collect()}
    assert "d-0" in live


def test_delete_where_patch_table(spark, tmp_path):
    from patch_model import SCHEMA as PSCHEMA

    s = SnapshotSink(spark, str(tmp_path / "p"), n_buckets=4, patch=True)
    s.apply_batch(
        spark.createDataFrame(
            pd.DataFrame(
                [
                    {"op": "I", "op_sequence": 10, "doc_id": "d1",
                     "a": 1.0, "b": "x", "c": 5, "patch_cols": None},
                    {"op": "I", "op_sequence": 11, "doc_id": "d2",
                     "a": 2.0, "b": "y", "c": 50, "patch_cols": None},
                ]
            ),
            schema=PSCHEMA,
        ),
        "b1",
    )
    out = delete_where(s, [("c", ">=", 50)])
    assert out["deleted"] == 1
    by_id = {r["doc_id"]: r.asDict() for r in s.read_state().collect()}
    assert by_id["d2"]["deleted"] and by_id["d2"]["a"] is None
    assert not by_id["d1"]["deleted"]


def test_delete_where_validation(sink):
    with pytest.raises(ValueError):
        delete_where(sink, [("nope", "=", 1)])


def test_sweep_after_tombstone_gc_does_not_collide(spark, sink):
    """Review-found: a seq-only batch id collides after tombstone GC.
    Sweep 1 allocates seq S; expire_tombstones physically removes the
    swept rows, regressing the raw max below S; a later sweep then
    re-allocates S — the (version, seq) batch id keeps it a NEW batch
    so the sweep actually applies (a seq-only id would be skipped as a
    re-delivery forever while reporting success)."""
    r1 = delete_where(sink, [("source", "=", "old")])
    assert r1["deleted"] == 5
    # GC every tombstone the sweep wrote (floor above the sweep's seq)
    sink.expire_tombstones(r1["op_sequence"] + 1)
    assert sink.read_state().filter(F.col("deleted")).count() == 0
    # rows age into the predicate after the GC
    sink.apply_batch(
        _batch(spark, [("U", 300 + i, f"d-{i}", [i], i, "old")
                       for i in range(5, 8)]),
        "age-out",
    )
    r2 = delete_where(sink, [("source", "=", "old")])
    assert "skipped" not in r2
    assert r2["deleted"] == 3
    assert r2["batch_id"] != r1["batch_id"]
    live = {r["doc_id"] for r in sink.read_final().collect()}
    assert live == {"d-8", "d-9"}


# ---------------------------------------------------------- update_where
from beehive_data_etl_spark.operators.retention import update_where  # noqa: E402


def test_update_where_row_table(spark, sink):
    """Matched rows get the SET expressions applied over their CURRENT
    values at one shared fresh sequence; unmatched rows untouched; the
    window ships plain U events."""
    v0 = sink.current_snapshot()["version"]
    out = update_where(
        sink,
        [("source", "=", "old")],
        {"source": F.lit("archived"), "n_tok": "n_tok + 100"},
    )
    assert out["updated"] == 5
    rows = {r["doc_id"]: r for r in sink.read_final().collect()}
    for i in range(5):
        assert rows[f"d-{i}"]["source"] == "archived"
        assert rows[f"d-{i}"]["n_tok"] == i + 100  # read-modify-write
        assert list(rows[f"d-{i}"]["tokens"]) == [i]  # untouched col kept
    for i in range(5, 10):
        assert rows[f"d-{i}"]["source"] == "new"
        assert rows[f"d-{i}"]["n_tok"] == i
    ch = sink.read_changes(v0, out["version"])
    got = {(r["doc_id"], r["change_type"]) for r in ch.collect()}
    assert got == {(f"d-{i}", "U") for i in range(5)}
    # crash-retry exactly-once: same batch id is a reported skip
    again = update_where(
        sink,
        [("doc_id", "=", "d-9")],
        {"source": F.lit("x")},
        batch_id=out["batch_id"],
    )
    assert again.get("skipped")
    assert sink.read_final().filter(F.col("source") == "x").count() == 0


def test_update_where_dry_run_and_empty(spark, sink):
    head = sink.current_snapshot()["version"]
    out = update_where(
        sink, [("source", "=", "old")], {"source": F.lit("a")}, dry_run=True
    )
    assert out["updated"] == 5 and out["dry_run"]
    assert sink.current_snapshot()["version"] == head  # nothing applied
    out = update_where(
        sink, [("source", "=", "nope")], {"source": F.lit("a")}
    )
    assert out["updated"] == 0
    assert sink.current_snapshot()["version"] == head


def test_update_where_rejects_bad_columns(spark, sink):
    with pytest.raises(ValueError, match="cannot SET"):
        update_where(sink, [("n_tok", ">=", 0)], {"doc_id": F.lit("x")})
    with pytest.raises(ValueError, match="cannot SET"):
        update_where(sink, [("n_tok", ">=", 0)], {"nope": F.lit("x")})
    with pytest.raises(ValueError, match="nothing to update"):
        update_where(sink, [("n_tok", ">=", 0)], {})


def test_update_where_lww_race_semantics(spark, sink):
    """A concurrent higher-seq write of a matched key wins over the
    sweep — plan, land a newer image, then apply the planned sweep via
    its deterministic clock: the newer image's values survive."""
    out = update_where(
        sink, [("doc_id", "=", "d-0")], {"source": F.lit("swept")}
    )
    # a later write at a higher sequence clobbers the sweep's image
    sink.apply_batch(
        _batch(spark, [("U", out["op_sequence"] + 1, "d-0", [7], 7, "winner")]),
        "b-conc",
    )
    row = sink.read_final().filter(F.col("doc_id") == "d-0").collect()[0]
    assert row["source"] == "winner" and row["n_tok"] == 7


def test_update_where_patch_table_cell_level(spark, tmp_path):
    """On a per-cell table the sweep patches ONLY the SET columns: a
    late out-of-order patch to a DIFFERENT column still composes, and
    the scan is narrow (SET ∪ reads)."""
    s = SnapshotSink(spark, str(tmp_path / "pt"), n_buckets=4, patch=True)
    schema = SCHEMA + ", patch_cols array<string>"
    s.apply_batch(
        spark.createDataFrame(
            [("I", 100 + i, f"d-{i}", [i], i, "old", None) for i in range(6)],
            schema,
        ),
        "b1",
    )
    out = update_where(
        s,
        [("n_tok", "<", 3)],
        {"source": F.lit("archived"), "n_tok": "n_tok * 10"},
        reads=["n_tok"],
    )
    assert out["updated"] == 3
    rows = {r["doc_id"]: r for r in s.read_final().collect()}
    for i in range(3):
        assert rows[f"d-{i}"]["source"] == "archived"
        assert rows[f"d-{i}"]["n_tok"] == i * 10
        assert list(rows[f"d-{i}"]["tokens"]) == [i]  # unmasked cell kept
    # late out-of-order patch to a DIFFERENT column, seq BELOW the
    # sweep's (but above the insert's cell clock): per-cell LWW
    # composes — a full-row sweep image would have shadowed it
    late_seq = out["op_sequence"] - 1
    assert late_seq > 100  # above d-0's insert, below the sweep
    s.apply_batch(
        spark.createDataFrame(
            [("P", late_seq, "d-0", [42], None, None, ["tokens"])], schema
        ),
        "b-late",
    )
    row = s.read_final().filter(F.col("doc_id") == "d-0").collect()[0]
    assert list(row["tokens"]) == [42]  # the late tokens patch landed
    assert row["source"] == "archived"  # the sweep's cell survived


def test_update_where_patch_unlisted_read_fails_loudly(spark, tmp_path):
    s = SnapshotSink(spark, str(tmp_path / "pt2"), n_buckets=2, patch=True)
    schema = SCHEMA + ", patch_cols array<string>"
    s.apply_batch(
        spark.createDataFrame([("I", 1, "a", [1], 1, "s", None)], schema),
        "b1",
    )
    with pytest.raises(Exception):  # analysis error: n_tok not scanned
        update_where(s, [("source", "=", "s")], {"tokens": "array(n_tok)"})
