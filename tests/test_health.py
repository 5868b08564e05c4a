"""Table health report (sinks/health.py): metadata-only diagnostics
with actionable recommendations — delta accumulation → compact,
bucket skew → salting/rebucket hints, metadata growth → trim/expire,
healthy table → explicit 'none'."""

import pytest

from beehive_data_etl_spark.sinks.health import table_report
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink

SCHEMA = (
    "op string, op_sequence long, doc_id string, tokens array<int>, "
    "n_tok int, source string"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(prefix, n, seq0):
    return [
        (  # noqa: E501
            "I", seq0 + i, f"{prefix}-{i:04d}", [i], 1, "s"
        )
        for i in range(n)
    ]


def _actions(rep):
    return {r["action"] for r in rep["recommendations"]}


def test_empty_and_healthy(spark, tmp_path):
    s = SnapshotSink(spark, str(tmp_path / "e"), n_buckets=2)
    assert _actions(table_report(s)) == {"none"}
    s.apply_batch(_batch(spark, _rows("a", 20, 100)), "b0")
    s.compact()
    rep = table_report(s)
    assert _actions(rep) == {"none"}
    assert rep["table"]["raw_rows"] == 20
    assert rep["table"]["version"] == s.current_snapshot()["version"]
    assert set(rep["buckets"]) <= set(range(2))


def test_delta_accumulation_recommends_compact(spark, tmp_path):
    s = SnapshotSink(spark, str(tmp_path / "d"), n_buckets=2,
                     compact_threshold=100)
    for i in range(5):
        s.apply_batch(_batch(spark, _rows("a", 10, 100 * (i + 1))), f"b{i}")
    rep = table_report(s, small_file_rows=0)
    acts = _actions(rep)
    assert "compact" in acts
    rec = next(r for r in rep["recommendations"] if r["action"] == "compact")
    # args carry the COMPLETE machine-usable bucket list (a mechanical
    # actor consumes action+args, never parses the call string)
    assert rec["args"]["buckets"] == sorted(
        b for b, s in rep["buckets"].items() if s["deltas"] >= 4
    )
    assert all(b["deltas"] >= 2 for b in rep["buckets"].values())
    s.compact()
    assert "compact" not in _actions(table_report(s, small_file_rows=0))


def test_skew_hint(spark, tmp_path):
    s = SnapshotSink(spark, str(tmp_path / "k"), n_buckets=8,
                     compact_threshold=100)
    s.apply_batch(_batch(spark, _rows("a", 8, 100)), "b0")
    # one hot key hammered across BATCHES (in-batch updates LWW-fold
    # away before writing): its bucket accumulates a delta per batch
    for i in range(10):
        s.apply_batch(
            _batch(spark, [("U", 1000 + i, "hot-key", [i], 1, "s")]),
            f"hot-{i}",
        )
    rep = table_report(s, small_file_rows=0)
    assert "investigate-skew" in _actions(rep)
    assert rep["table"]["max_bucket_rows"] >= 10


def test_metadata_growth_thresholds(spark, tmp_path, monkeypatch):
    s = SnapshotSink(spark, str(tmp_path / "m"), n_buckets=2,
                     compact_threshold=100)
    s.apply_batch(_batch(spark, _rows("a", 5, 100)), "b0")
    # fake the committed-batch blowup instead of 10k real commits
    import beehive_data_etl_spark.sinks.health as health

    snap = s.current_snapshot()
    snap["committed_batches"] = [f"x{i}" for i in range(10_001)]
    monkeypatch.setattr(
        type(s), "current_snapshot", lambda self, _s=snap: _s
    )
    rep = health.table_report(s, small_file_rows=0)
    assert "trim-dedup-window" in _actions(rep)
