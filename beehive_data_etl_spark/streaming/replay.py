"""Binlog/WAL-tail replayers (SURVEY.md §2 A1/A4/A11, §3.2 E1).

Two entry points over the same ``SnapshotSink.apply_batch`` merge:

- ``replay_stream`` — Structured Streaming file-tail with a checkpoint
  directory and ``foreachBatch`` (BASELINE.json:6: "consumed in
  checkpointed micro-batches via Structured Streaming"). Spark manages
  offsets; the sink's manifests make re-delivered epochs idempotent, so
  restart-from-checkpoint is exactly-once end-to-end. The source schema
  is fixed for the lifetime of a run (a Spark streaming-source
  constraint), so a schema-evolving log is read with its final
  superset schema here.
- ``replay_incremental`` — an ordered-file micro-batcher that reads
  each batch with its *own* merged schema, so added/widened columns hit
  the sink mid-replay and trigger real in-flight schema evolution
  (SURVEY.md §2 A9). This is how lakehouse streaming sources plan file
  batches internally; offsets are recovered from the sink's committed
  batch ids (no separate checkpoint state to lose).

Both paths tolerate duplicate delivery, out-of-order files, and crash/
restart at any point — see tests/test_exactly_once.py.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from beehive_data_etl_spark.sources.readers import read_wal

Transform = Callable[[DataFrame], DataFrame]

# Both replayers drive the shared sink contract (committed / apply_batch)
# and work against SnapshotSink (sandbox) or IcebergSink (cluster) alike.
from typing import Protocol


class CdcSink(Protocol):
    def committed(self, batch_id: str) -> bool: ...

    def apply_batch(self, batch_df: DataFrame, batch_id): ...


def _log_files(log_dir: str) -> list[str]:
    files = sorted(glob.glob(os.path.join(log_dir, "part-*.parquet")))
    if not files:
        raise FileNotFoundError(f"no part-*.parquet under {log_dir}")
    return files


def replay_incremental(
    spark: SparkSession,
    log_dir: str,
    sink: CdcSink,
    files_per_batch: int = 1,
    transform: Transform | None = None,
    max_batches: int | None = None,
    inflight: int = 1,
) -> list[dict]:
    """Replay an ordered WAL directory through the sink, one schema-aware
    micro-batch per ``files_per_batch`` files. Resumable: batch ids are
    deterministic functions of the file list, and committed ids are
    skipped inside the sink. Returns per-batch commit metrics.

    ``inflight > 1`` PIPELINES micro-batches: up to that many batch
    jobs run concurrently (driver threads submitting to the shared
    scheduler — exactly what a cluster's queued micro-batches do).
    Correct because the sink is merge-on-read with an order-insensitive
    idempotent LWW fold: concurrent batches append independent delta
    files and the snapshot commit is the sink's serialized critical
    section. Batches may COMMIT out of log order; exactly-once per
    batch_id and final-state correctness are unaffected (a crash leaves
    some later batch committed and an earlier one not — the resume
    replays exactly the uncommitted ids). Use inflight=1 (default) when
    strict commit order matters, e.g. a downstream consumer tailing the
    snapshot log."""
    files = _log_files(log_dir)
    chunks = [files[i : i + files_per_batch] for i in range(0, len(files), files_per_batch)]
    if max_batches is not None:
        chunks = chunks[:max_batches]

    def _one(i: int, chunk: list[str]) -> dict:
        batch_id = f"wal-{i:06d}-{os.path.basename(chunk[0])}"
        if sink.committed(batch_id):
            return {"batch_id": batch_id, "skipped": True}
        df = read_wal(spark, chunk)
        if transform is not None:
            df = transform(df)
        return sink.apply_batch(df, batch_id)

    if inflight <= 1:
        return [_one(i, chunk) for i, chunk in enumerate(chunks)]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=inflight) as ex:
        return list(ex.map(_one, range(len(chunks)), chunks))


def replay_stream(
    spark: SparkSession,
    log_dir: str,
    sink: CdcSink,
    checkpoint_dir: str,
    schema_ddl: str,
    max_files_per_trigger: int = 1,
    transform: Transform | None = None,
    watermark: tuple[str, str] | None = None,
    on_batch_commit: Callable[[int], None] | None = None,
) -> None:
    """Structured Streaming replay with ``Trigger.AvailableNow``:
    processes everything currently in ``log_dir`` in checkpointed
    micro-batches, then stops. Restarting with the same checkpoint
    resumes from the recorded offsets; an epoch that was delivered but
    not committed is re-applied idempotently by the sink manifests.

    ``watermark=(col, delay)`` installs an event-time watermark
    (SURVEY.md §2 A4) — with LWW merge semantics late events are
    *correct* regardless (they lose the op_sequence comparison), the
    watermark only bounds any stateful operators added upstream.

    ``on_batch_commit(epoch_id)`` runs inside foreachBatch AFTER the
    sink commit — the hook downstream incremental consumers (aggregate
    views, token index, incremental near-dup) refresh from, at the
    exact cadence their O(changed rows) cost model assumes. foreachBatch
    epochs are serial, so refreshes here never race. A hook failure
    fails the epoch BEFORE the checkpoint advances; the sink commit is
    already durable, so the restart skips the re-delivered batch id and
    re-runs only the refresh (views are idempotent at a version)."""
    from beehive_data_etl_spark.metrics import ProgressJsonlListener, observe_envelope

    reader = (
        spark.readStream.schema(schema_ddl)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")
        .parquet(log_dir)
    )
    if watermark is not None:
        reader = reader.withWatermark(*watermark)
    if transform is not None:
        reader = transform(reader)
    reader = observe_envelope(reader)  # in-plan counters (A12), free

    def _apply(df: DataFrame, epoch_id: int) -> None:
        sink.apply_batch(df, f"stream-{epoch_id:06d}")
        if on_batch_commit is not None:
            on_batch_commit(epoch_id)

    query = (
        reader.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    # progress capture from the query's own buffer — synchronous and
    # complete, unlike listener callbacks (async delivery). The
    # ProgressJsonlListener in metrics.py serves long-running jobs whose
    # progress outgrows the buffer. Only filesystem sinks have a root to
    # write under; IcebergSink (cluster) has none — skip rather than
    # crash the deployment entry point after a successful run.
    sink_root = getattr(sink, "root", None)
    if sink_root is not None:
        ProgressJsonlListener.append_progresses(
            os.path.join(sink_root, "_metrics", "stream_progress.jsonl"),
            query.recentProgress,
        )
