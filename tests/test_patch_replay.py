"""End-to-end patch replay: a generated patch-envelope WAL
(generate_patch_log — out-of-order files, verbatim duplicates, masked
partial updates) replayed through the real paths (incremental,
pipelined via the spark-submit entry point, streaming) must reproduce
the independent winner-seq/join-back oracle byte-exactly — token
arrays, n_tok, source, and the row clock."""

import os
import sys

from pyspark.sql import functions as F

from beehive_data_etl_spark.operators.audit import standard_token_audit
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.streaming.replay import replay_incremental
from beehive_data_etl_spark.verify import compare_final, oracle_patch_final_spark


def _assert_state_equals_oracle(spark, sink, patch_log):
    state = sink.read_state().filter("NOT deleted")
    oracle = oracle_patch_final_spark(spark, patch_log)
    report = compare_final(state, oracle)  # tokens + op_sequence
    assert report["ok"], report
    # the token-centric comparator ignores the other cells — check
    # source and n_tok the same full-outer way
    e = state.select("doc_id", "source", "n_tok")
    o = oracle.select(
        "doc_id", F.col("source").alias("o_source"), F.col("n_tok").alias("o_n_tok")
    )
    j = e.join(o, "doc_id", "full_outer")
    bad = j.filter(
        ~F.col("source").eqNullSafe(F.col("o_source"))
        | ~F.col("n_tok").cast("long").eqNullSafe(F.col("o_n_tok").cast("long"))
    ).count()
    assert bad == 0


def test_patch_replay_incremental_matches_oracle(spark, patch_log, tmp_path):
    sink = SnapshotSink(
        spark,
        str(tmp_path / "t"),
        n_buckets=8,
        compact_threshold=2,
        patch=True,
        audit=standard_token_audit(patch=True),
    )
    replay_incremental(spark, patch_log, sink, files_per_batch=2)
    _assert_state_equals_oracle(spark, sink, patch_log)


def test_patch_replay_job_pipelined(spark, patch_log, tmp_path, monkeypatch):
    """The deployment entry point end-to-end with REPLAY_PATCH=1:
    pipelined (out-of-order commit) replay + the patch-aware audit."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import replay_job

    target = str(tmp_path / "t")
    monkeypatch.setattr(sys, "argv", ["replay_job.py", patch_log, target])
    monkeypatch.setenv("REPLAY_MODE", "pipelined")
    monkeypatch.setenv("REPLAY_PATCH", "1")
    monkeypatch.setenv("REPLAY_AUDIT", "standard")
    monkeypatch.setenv("REPLAY_N_BUCKETS", "8")
    monkeypatch.setenv("REPLAY_FILES_PER_BATCH", "2")
    monkeypatch.setenv("REPLAY_INFLIGHT", "2")
    replay_job.main()
    sink = SnapshotSink(spark, target, n_buckets=8, patch=True)
    _assert_state_equals_oracle(spark, sink, patch_log)


def test_patch_replay_stream(spark, patch_log, tmp_path):
    """Structured-Streaming tail over the patch envelope (AvailableNow,
    checkpointed) — the serial foreachBatch path."""
    from beehive_data_etl_spark.sources.eventlog import PATCH_ENVELOPE_DDL
    from beehive_data_etl_spark.streaming.replay import replay_stream

    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=8, patch=True)
    replay_stream(
        spark,
        patch_log,
        sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
        schema_ddl=PATCH_ENVELOPE_DDL,
        max_files_per_trigger=3,
    )
    _assert_state_equals_oracle(spark, sink, patch_log)


def test_derived_views_over_patch_table(spark, patch_log, tmp_path):
    """Incremental view maintenance composes with per-cell folds: the
    changelog's full images + cell-fingerprint change detection must
    keep an AggregateView exactly equal to a from-scratch GROUP BY —
    including groups whose membership changed ONLY via a source-mask
    patch (the row moves between groups with no token change)."""
    from pyspark.sql import functions as F

    from beehive_data_etl_spark.sinks.aggregates import AggregateView

    sink = SnapshotSink(
        spark, str(tmp_path / "t"), n_buckets=8, compact_threshold=2, patch=True
    )
    view = AggregateView(
        spark, sink, str(tmp_path / "agg"), ["source"], ["n_tok"]
    )
    import glob

    files = sorted(glob.glob(os.path.join(patch_log, "part-*.parquet")))
    for i in range(0, len(files), 2):
        sink.apply_batch(
            spark.read.parquet(*files[i : i + 2]).drop("event_ts", "batch_hint"),
            f"b{i}",
        )
        view.refresh()
    got = {
        r["source"]: (r["n_rows"], r["n_tok"]) for r in view.read().collect()
    }
    want = {
        r["source"]: (r["n_rows"], r["n_tok"])
        for r in sink.read_final()
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_tok").alias("n_tok"),
        )
        .collect()
    }
    assert got == want
