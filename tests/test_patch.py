"""Per-cell LWW patch semantics (operators/patch.py): random streams of
full upserts, deletes, and partial patches folded by the engine must
equal a plain-Python per-cell fold-left model; the fold must be
associative (fold of folded rows == fold of raws) — the property the
sink's compaction and pipelined commits rest on."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from patch_model import PAYLOAD, SCHEMA
from patch_model import model as _model
from patch_model import ops_strategy as _ops_strategy
from patch_model import to_events as _to_events
from pyspark.sql import functions as F

from beehive_data_etl_spark.operators.patch import (
    CELL,
    cell_lww_dedup,
    patch_events,
)


def _fold(spark, events, salt=0):
    df = spark.createDataFrame(pd.DataFrame(events), schema=SCHEMA)
    return cell_lww_dedup(
        patch_events(df, key="doc_id", seq="op_sequence"),
        key="doc_id",
        seq="op_sequence",
        salt_partials=salt,
    )


def _rows(df):
    return {
        r["doc_id"]: {k: v for k, v in r.asDict().items() if k != CELL}
        for r in df.collect()
    }


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops_strategy())
def test_cell_fold_matches_model(spark, ops):
    events = _to_events(ops)
    got = _rows(_fold(spark, events))
    model = _model(events)
    assert set(got) == set(model)
    for k, m in model.items():
        r = got[k]
        assert r["deleted"] == m["deleted"], k
        assert r["op_sequence"] == m["op_sequence"], k
        for c in PAYLOAD:
            assert r[c] == m[c], (k, c)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops_strategy(), cut=st.integers(0, 50), salt=st.sampled_from([0, 4]))
def test_cell_fold_associative(spark, ops, cut, salt):
    """fold(fold(A) ∪ B) == fold(A ∪ B) for any split — folded rows
    (what compaction writes) re-enter the fold losslessly."""
    events = _to_events(ops)
    cut = min(cut, len(events))
    a, b = events[:cut], events[cut:]
    direct = _rows(_fold(spark, events, salt=salt))
    folded_a = cell_lww_dedup(
        patch_events(
            spark.createDataFrame(pd.DataFrame(a), schema=SCHEMA),
            key="doc_id",
            seq="op_sequence",
        ),
        key="doc_id",
        seq="op_sequence",
    ) if a else None
    raw_b = patch_events(
        spark.createDataFrame(pd.DataFrame(b), schema=SCHEMA),
        key="doc_id",
        seq="op_sequence",
    ) if b else None
    if folded_a is None:
        merged = raw_b
    elif raw_b is None:
        merged = folded_a
    else:
        merged = folded_a.unionByName(raw_b)
    refold = _rows(cell_lww_dedup(merged, key="doc_id", seq="op_sequence", salt_partials=salt))
    assert refold == direct


def test_patch_only_key_is_live_and_patch_never_resurrects(spark):
    events = [
        # doc-0: only ever patched — live, patched cell set, others NULL
        {"op": "P", "op_sequence": 1, "doc_id": "doc-0", "a": 1.5, "b": None,
         "c": None, "patch_cols": ["a"]},
        # doc-1: insert, delete, then a patch AFTER the delete — stays
        # deleted (patches never touch the existence cell); the patched
        # cell is still recorded (invisible until an upsert revives it)
        {"op": "I", "op_sequence": 2, "doc_id": "doc-1", "a": 1.0, "b": "x",
         "c": 7, "patch_cols": None},
        {"op": "D", "op_sequence": 3, "doc_id": "doc-1", "a": None, "b": None,
         "c": None, "patch_cols": None},
        {"op": "P", "op_sequence": 4, "doc_id": "doc-1", "a": 9.0, "b": None,
         "c": None, "patch_cols": ["a"]},
    ]
    got = _rows(_fold(spark, events))
    assert got["doc-0"]["deleted"] is False
    assert got["doc-0"]["a"] == 1.5 and got["doc-0"]["b"] is None
    assert got["doc-1"]["deleted"] is True
    assert got["doc-1"]["op_sequence"] == 4


def test_mask_hygiene(spark):
    """Wire masks cannot set the existence cell, internal columns, or
    unknown columns; a NULL-mask patch sets nothing but advances seq."""
    events = [
        {"op": "I", "op_sequence": 1, "doc_id": "d", "a": 1.0, "b": "x",
         "c": 1, "patch_cols": None},
        {"op": "P", "op_sequence": 2, "doc_id": "d", "a": 2.0, "b": None,
         "c": None, "patch_cols": ["deleted", "doc_id", "nope", "a"]},
        {"op": "P", "op_sequence": 3, "doc_id": "d", "a": 99.0, "b": None,
         "c": None, "patch_cols": None},
    ]
    got = _rows(_fold(spark, events))["d"]
    assert got["a"] == 2.0  # 'a' applied; seq-3 null-mask patch did not
    assert got["b"] == "x" and got["c"] == 1
    assert got["deleted"] is False
    assert got["op_sequence"] == 3  # null-mask patch still advances seq


def test_salted_equals_unsalted(spark):
    events = _to_events(
        [("P", i % 3, ["a", "b"][: 1 + i % 2], i) for i in range(40)]
        + [("U", 0, [], 7), ("D", 1, [], 0)]
    )
    plain = _rows(_fold(spark, events))
    salted = _rows(_fold(spark, events, salt=8))
    assert plain == salted


def test_cell_seq_map_records_setters(spark):
    events = [
        {"op": "I", "op_sequence": 1, "doc_id": "d", "a": 1.0, "b": "x",
         "c": 1, "patch_cols": None},
        {"op": "P", "op_sequence": 5, "doc_id": "d", "a": 2.0, "b": None,
         "c": None, "patch_cols": ["a"]},
    ]
    df = _fold(spark, events)
    m = df.select(F.map_entries(CELL).alias("e")).collect()[0]["e"]
    m = {e["key"]: e["value"] for e in m}
    assert m == {"a": 5, "b": 1, "c": 1, "deleted": 1}
