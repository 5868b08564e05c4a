"""Pipelined replay (replay_incremental inflight>1): concurrent
micro-batch jobs over the merge-on-read sink. Correct because delta
appends are independent and the LWW fold is order-insensitive and
idempotent; the snapshot commit is the serialized critical section.
This is the sandbox twin of a cluster scheduler running queued
micro-batches concurrently — the lever that lifts the N→4N scaling
efficiency past the per-job latency floor (BENCH/BASELINE.md)."""

import pytest

from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.streaming.replay import replay_incremental
from beehive_data_etl_spark.verify import compare_final, oracle_final_spark


class _Boom(RuntimeError):
    pass


def test_pipelined_matches_oracle(spark, smoke_log, tmp_path):
    sink = SnapshotSink(spark, str(tmp_path / "sink"), n_buckets=8)
    metrics = replay_incremental(
        spark, smoke_log, sink, files_per_batch=1, inflight=4
    )
    assert all(not m.get("skipped") for m in metrics)
    state = sink.read_state()
    report = compare_final(
        state.filter(~state.deleted), oracle_final_spark(spark, smoke_log)
    )
    assert report["ok"], report
    # every batch committed exactly once (order may differ from log order)
    committed = sink.current_snapshot()["committed_batches"]
    assert sorted(committed) == sorted({m["batch_id"] for m in metrics})
    assert len(committed) == len(set(committed))


def test_pipelined_with_inline_compaction(spark, smoke_log, tmp_path):
    """compact_threshold low enough that compactions fire WHILE other
    batches append concurrently — the consumed-paths commit logic must
    keep concurrent appends alive."""
    sink = SnapshotSink(
        spark, str(tmp_path / "sink"), n_buckets=4, compact_threshold=2
    )
    replay_incremental(spark, smoke_log, sink, files_per_batch=1, inflight=4)
    state = sink.read_state()
    report = compare_final(
        state.filter(~state.deleted), oracle_final_spark(spark, smoke_log)
    )
    assert report["ok"], report


def test_pipelined_crash_and_resume(spark, smoke_log, tmp_path):
    """A crash mid-pipeline may leave LATER batches committed and
    earlier ones not; resume must replay exactly the uncommitted ids
    and converge to the oracle state."""
    root = str(tmp_path / "sink")
    sink = SnapshotSink(spark, root, n_buckets=8)
    fired = {"n": 0}

    def hook(point: str) -> None:
        if point == "before_pointer_swap":
            fired["n"] += 1
            if fired["n"] == 3:  # crash the third commit attempt
                raise _Boom(point)

    sink.crash_hook = hook
    with pytest.raises(_Boom):
        replay_incremental(spark, smoke_log, sink, files_per_batch=1, inflight=4)

    sink2 = SnapshotSink(spark, root, n_buckets=8)
    metrics = replay_incremental(
        spark, smoke_log, sink2, files_per_batch=1, inflight=4
    )
    assert any(m.get("skipped") for m in metrics)  # some batches survived
    state = sink2.read_state()
    report = compare_final(
        state.filter(~state.deleted), oracle_final_spark(spark, smoke_log)
    )
    assert report["ok"], report
    committed = sink2.current_snapshot()["committed_batches"]
    assert len(committed) == len(set(committed))


def test_pipelined_schema_evolution(spark, evolution_log, tmp_path):
    """Concurrent batches carrying DIFFERENT schemas (the F3 log adds
    `lang` and widens `n_tok` mid-stream) must still converge: commits
    re-evolve against the then-current head, and deltas written under
    the older schema align at read time."""
    from pyspark.sql import types as T

    sink = SnapshotSink(spark, str(tmp_path / "sink"), n_buckets=8)
    replay_incremental(spark, evolution_log, sink, files_per_batch=1, inflight=4)
    final = sink.read_final()
    fields = {f.name: f.dataType for f in final.schema.fields}
    assert fields["n_tok"] == T.LongType()
    assert fields["lang"] == T.StringType()
    assert fields["tokens"] == T.ArrayType(T.IntegerType())
    state = sink.read_state()
    report = compare_final(
        state.filter(~state.deleted), oracle_final_spark(spark, evolution_log)
    )
    assert report["ok"], report


def test_concurrent_compact_during_pipelined_ingest(spark, smoke_log, tmp_path):
    """Maintenance compaction racing pipelined ingest: compact()
    publishes under the commit lock and replaces only the delta files
    it folded, so appends that land mid-fold survive and the final
    state still matches the oracle."""
    import threading
    import time as _time

    sink = SnapshotSink(
        spark, str(tmp_path / "sink"), n_buckets=4, compact_threshold=1000
    )
    errors = []

    def _compact_loop():
        try:
            for _ in range(4):
                _time.sleep(0.4)
                sink.compact()
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    th = threading.Thread(target=_compact_loop)
    th.start()
    replay_incremental(spark, smoke_log, sink, files_per_batch=1, inflight=4)
    th.join()
    assert not errors, errors
    sink.compact()
    state = sink.read_state()
    report = compare_final(
        state.filter(~state.deleted), oracle_final_spark(spark, smoke_log)
    )
    assert report["ok"], report


def test_vacuum_racing_pipelined_ingest(spark, smoke_log, tmp_path):
    """Review finding: vacuum() used to reap the published-but-
    uncommitted files of in-flight batches as orphans, leaving the
    subsequent commit pointing at deleted paths. The in-flight guard
    must keep a racing vacuum safe (through the same sink object)."""
    import os
    import threading
    import time as _time

    root = str(tmp_path / "sink")
    sink = SnapshotSink(spark, root, n_buckets=4, compact_threshold=2)
    errors = []

    def _vacuum_loop():
        try:
            for _ in range(8):
                _time.sleep(0.25)
                sink.vacuum()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    th = threading.Thread(target=_vacuum_loop)
    th.start()
    replay_incremental(spark, smoke_log, sink, files_per_batch=1, inflight=4)
    th.join()
    assert not errors, errors
    state = sink.read_state()
    report = compare_final(
        state.filter(~state.deleted), oracle_final_spark(spark, smoke_log)
    )
    assert report["ok"], report
    # every bucket path referenced by CURRENT exists on disk
    snap = sink.current_snapshot()
    for entries in snap["buckets"].values():
        for e in entries:
            assert os.path.isdir(os.path.join(root, e["path"])), e["path"]
