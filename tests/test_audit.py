"""Write-audit-publish gate (operators/audit.py): batch-level quality
rules run on the STAGED output before anything publishes — a violating
batch aborts crash-equivalently (table byte-untouched), a clean one
commits, crash-replay reuse stays sound."""

import os
import sys

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.operators.audit import (
    AuditError,
    predicate_audit,
    standard_token_audit,
)
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.sources.readers import read_wal
from beehive_data_etl_spark.streaming.replay import replay_incremental
from beehive_data_etl_spark.verify import compare_final, oracle_final_spark


def _log_files(log_dir):
    import glob

    return sorted(glob.glob(os.path.join(log_dir, "part-*.parquet")))


def test_clean_replay_passes_standard_audit(spark, smoke_log, tmp_path):
    sink = SnapshotSink(
        spark, str(tmp_path / "t"), n_buckets=8, audit=standard_token_audit()
    )
    replay_incremental(spark, smoke_log, sink, files_per_batch=2)
    state = sink.read_state()
    assert compare_final(
        state.filter(~state.deleted), oracle_final_spark(spark, smoke_log)
    )["ok"]


def test_poisoned_batch_blocked_table_untouched(spark, smoke_log, tmp_path):
    sink = SnapshotSink(
        spark, str(tmp_path / "t"), n_buckets=8, audit=standard_token_audit()
    )
    files = _log_files(smoke_log)
    sink.apply_batch(read_wal(spark, files[0:2]), "b1")
    v1 = sink.current_snapshot()["version"]
    before = {
        r.doc_id: r.op_sequence for r in sink.read_state().collect()
    }

    # upstream bug: the batch arrives with every token array emptied
    poisoned = read_wal(spark, files[2:4]).withColumn(
        "tokens",
        F.when(F.col("op") != "D", F.array().cast("array<int>")).otherwise(
            F.col("tokens")
        ),
    )
    with pytest.raises(AuditError, match="live_empty_tokens"):
        sink.apply_batch(poisoned, "b2")
    # crash-equivalent abort: version unchanged, state unchanged, no
    # manifests, no staging leftovers referenced anywhere
    assert sink.current_snapshot()["version"] == v1
    assert {r.doc_id: r.op_sequence for r in sink.read_state().collect()} == before
    assert not os.path.isdir(os.path.join(sink.root, "_manifests", "b2"))
    assert not sink.committed("b2")

    # the corrected batch (same id) commits normally
    sink.apply_batch(read_wal(spark, files[2:4]), "b2")
    assert sink.committed("b2")


def test_audit_rule_details_and_volume_bounds(spark, smoke_log, tmp_path):
    files = _log_files(smoke_log)
    batch = read_wal(spark, files[0:2])
    n = batch.select("doc_id").distinct().count()

    # volume contract: a batch 100x the expected size is an upstream bug
    sink = SnapshotSink(
        spark,
        str(tmp_path / "t"),
        n_buckets=4,
        audit=predicate_audit(rules={}, max_rows=max(1, n // 2)),
    )
    with pytest.raises(AuditError, match="max_rows"):
        sink.apply_batch(batch, "big")

    sink2 = SnapshotSink(
        spark,
        str(tmp_path / "t2"),
        n_buckets=4,
        audit=predicate_audit(rules={}, min_rows=10**9),
    )
    with pytest.raises(AuditError, match="min_rows"):
        sink2.apply_batch(batch, "small")

    # violation counts surface in the error
    sink3 = SnapshotSink(
        spark,
        str(tmp_path / "t3"),
        n_buckets=4,
        audit=predicate_audit(
            rule_factory=lambda: {"all_rows_flagged": F.lit(True)}
        ),
    )
    with pytest.raises(AuditError) as err:
        sink3.apply_batch(batch, "flagged")
    assert err.value.violations["all_rows_flagged"] > 0
    assert err.value.batch_id == "flagged"


def test_audit_tolerance_allows_bounded_violations(spark, smoke_log, tmp_path):
    files = _log_files(smoke_log)
    batch = read_wal(spark, files[0:2])
    # the audit sees the POST-LWW staged rows, so poison a row that
    # survives the fold: a doc whose batch-max event is a live upsert
    live_max = {
        r.doc_id: r.s
        for r in batch.filter("op != 'D'")
        .groupBy("doc_id")
        .agg(F.max("op_sequence").alias("s"))
        .collect()
    }
    all_max = {
        r.doc_id: r.s
        for r in batch.groupBy("doc_id").agg(F.max("op_sequence").alias("s")).collect()
    }
    doc, seq = next(
        (d, s) for d, s in live_max.items() if all_max[d] == s
    )
    one_bad = batch.withColumn(
        "tokens",
        F.when(
            (F.col("doc_id") == doc) & (F.col("op_sequence") == seq),
            F.array().cast("array<int>"),
        ).otherwise(F.col("tokens")),
    )
    strict = SnapshotSink(
        spark, str(tmp_path / "a"), n_buckets=4, audit=standard_token_audit()
    )
    with pytest.raises(AuditError):
        strict.apply_batch(one_bad, "b")
    tolerant = SnapshotSink(
        spark,
        str(tmp_path / "b"),
        n_buckets=4,
        audit=standard_token_audit(max_violations=2),
    )
    tolerant.apply_batch(one_bad, "b")
    assert tolerant.committed("b")


def test_replay_job_audit_wiring(spark, smoke_log, tmp_path, monkeypatch):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import replay_job

    target = str(tmp_path / "t")
    monkeypatch.setattr(sys, "argv", ["replay_job.py", smoke_log, target])
    monkeypatch.setenv("REPLAY_MODE", "pipelined")
    monkeypatch.setenv("REPLAY_N_BUCKETS", "8")
    monkeypatch.setenv("REPLAY_FILES_PER_BATCH", "2")
    monkeypatch.setenv("REPLAY_INFLIGHT", "2")
    monkeypatch.setenv("REPLAY_AUDIT", "standard")
    replay_job.main()  # clean log passes the gate end-to-end
    sink = SnapshotSink(spark, target, n_buckets=8)
    state = sink.read_state()
    assert compare_final(
        state.filter(~state.deleted), oracle_final_spark(spark, smoke_log)
    )["ok"]
