"""M1 end-to-end: WAL replay → LWW merge → final state byte-equal to two
independent oracles (SURVEY.md §5.3, BASELINE.json:6,15)."""

import numpy as np
import pytest

from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.streaming.replay import replay_incremental
from beehive_data_etl_spark.verify import (
    compare_final,
    oracle_final_duckdb,
    oracle_final_spark,
)


@pytest.fixture(scope="module")
def replayed(spark, smoke_log, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sink"))
    sink = SnapshotSink(spark, root, n_buckets=8, salt_partials=4)
    metrics = replay_incremental(spark, smoke_log, sink, files_per_batch=2)
    return sink, metrics


def test_final_state_matches_spark_oracle(spark, smoke_log, replayed):
    sink, _ = replayed
    state = sink.read_state()
    engine = state.filter(~state.deleted)
    report = compare_final(engine, oracle_final_spark(spark, smoke_log))
    assert report["ok"], report
    assert report["n"] > 0


def test_tokens_byte_equal_vs_duckdb(spark, smoke_log, replayed):
    """Byte-equality gate: int32 token arrays compared element-wise
    against a fully independent engine (DuckDB)."""
    sink, _ = replayed
    engine = (
        sink.read_final()
        .select("doc_id", "tokens", "n_tok", "source")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    oracle = oracle_final_duckdb(smoke_log).sort_values("doc_id").reset_index(drop=True)
    assert list(engine.doc_id) == list(oracle.doc_id)
    for e_tok, o_tok in zip(engine.tokens, oracle.tokens):
        e = np.asarray(e_tok, dtype=np.int32)
        o = np.asarray(o_tok, dtype=np.int32)
        assert e.tobytes() == o.tobytes()  # byte-equal, literally
    assert (engine.n_tok.to_numpy() == oracle.n_tok.to_numpy()).all()
    assert list(engine.source) == list(oracle.source)


def test_replay_is_idempotent(spark, smoke_log, replayed):
    sink, _ = replayed
    before = sink.current_snapshot()["version"]
    again = replay_incremental(spark, smoke_log, sink, files_per_batch=2)
    assert all(m.get("skipped") for m in again)
    assert sink.current_snapshot()["version"] == before


def test_deletes_tombstoned_not_resurrected(spark, smoke_log, replayed):
    """A doc whose last op is D must be absent from read_final but keep
    a tombstone in the internal state (SURVEY.md §7.3)."""
    sink, _ = replayed
    state = sink.read_state()
    n_tombstones = state.filter(state.deleted).count()
    assert n_tombstones > 0
    final_ids = {r.doc_id for r in sink.read_final().select("doc_id").collect()}
    dead_ids = {r.doc_id for r in state.filter(state.deleted).select("doc_id").collect()}
    assert not (final_ids & dead_ids)


def test_lineage_and_metrics_emitted(replayed):
    """A12: every commit records per-bucket rows and input-file lineage."""
    sink, metrics = replayed
    applied = [m for m in metrics if not m.get("skipped")]
    assert applied
    for m in applied:
        assert m["bucket_rows"]
        # lineage now rides the merge job (observe + plan metadata; no
        # second scan): total events + the batch's input files
        assert "lineage" in m
        assert m["lineage"]["events"] > 0
        assert m["lineage"]["input_files"]
        assert m["wall_s"] > 0
    assert len(sink.read_metrics()) >= len(applied)


def test_replay_with_transform_stage(spark, smoke_log, tmp_path):
    """A5 integration: the beehive-style vectorized transform stage runs
    inside the replay (before the merge) and its derived columns land in
    the final table via schema evolution."""
    from beehive_data_etl_spark.functions.transforms import cdc_bench_transform

    root = str(tmp_path / "sink")
    sink = SnapshotSink(spark, root, n_buckets=8)
    replay_incremental(
        spark, smoke_log, sink, files_per_batch=2, transform=cdc_bench_transform
    )
    final = sink.read_final()
    assert "tok_fingerprint" in final.columns and "payload_valid" in final.columns
    live = final.filter(final.payload_valid.isNotNull())
    assert live.filter(~final.payload_valid).count() == 0  # every payload valid
    # fingerprints recomputable from the stored tokens
    from pyspark.sql import functions as F

    recheck = final.filter(
        final.tok_fingerprint != F.xxhash64("tokens")
    ).count()
    assert recheck == 0
    # and the payload itself still matches the oracle
    state = sink.read_state()
    report = compare_final(
        state.filter(~state.deleted), oracle_final_spark(spark, smoke_log)
    )
    assert report["ok"], report


def test_doc_id_offset_no_truncation(tmp_path):
    """Review (round 3): numpy U8 formatting truncated ids >= 1e8 to
    their first 8 digits, silently colliding shards' 'disjoint' key
    ranges — offsets beyond 1e8 must render in full."""
    import pyarrow.parquet as pq

    from beehive_data_etl_spark.sources.eventlog import generate_event_log

    log = generate_event_log(
        str(tmp_path / "log"), n_docs=10, n_events=50, n_files=2,
        doc_id_offset=100_000_000,
    )
    import glob as _glob

    ids = set()
    for f in _glob.glob(log + "/part-*.parquet"):
        ids |= set(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
    assert all(len(i) == len("doc-") + 9 for i in ids), sorted(ids)[:3]
    nums = {int(i.split("-")[1]) for i in ids}
    assert min(nums) >= 100_000_000 and max(nums) < 100_000_010
