"""Lineage + metrics emission (SURVEY.md §2 A12).

Three layers, all queryable:

- per-commit metrics + per-(batch, bucket) lineage → written by the
  sink to ``<root>/_metrics/commits.jsonl`` (``SnapshotSink.apply_batch``
  / ``read_metrics``),
- streaming progress (rows/sec, batch duration, watermark) → a
  ``StreamingQueryListener`` appending each micro-batch's progress to
  ``<root>/_metrics/stream_progress.jsonl``,
- in-plan observed metrics → ``df.observe`` counters evaluated inside
  the job itself (no extra pass), surfaced through the listener's
  ``observedMetrics``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def observe_envelope(df: DataFrame, name: str = "cdc_envelope") -> DataFrame:
    """Attach in-plan counters (rows, deletes, max op_sequence) — they
    ride the existing job, costing nothing extra."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("deletes"),
        F.max("op_sequence").alias("max_op_sequence"),
    )


class ProgressJsonlListener(StreamingQueryListener):
    """Append every micro-batch's progress (+ observed metrics) to a
    JSONL file — the sandbox stand-in for a metrics bus."""

    def __init__(self, out_path: str) -> None:
        self.out_path = out_path
        os.makedirs(os.path.dirname(out_path), exist_ok=True)

    @staticmethod
    def append_progresses(out_path: str, progresses) -> None:
        """Write a batch of StreamingQueryProgress objects (e.g. from
        ``query.recentProgress``) in the same JSONL shape."""
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "a") as fh:
            for p in progresses:
                rec = {
                    "batch_id": p["batchId"] if isinstance(p, dict) else p.batchId,
                    "timestamp": p["timestamp"] if isinstance(p, dict) else p.timestamp,
                    "num_input_rows": p["numInputRows"]
                    if isinstance(p, dict)
                    else p.numInputRows,
                    "input_rows_per_sec": p.get("inputRowsPerSecond")
                    if isinstance(p, dict)
                    else p.inputRowsPerSecond,
                    "process_rows_per_sec": p.get("processedRowsPerSecond")
                    if isinstance(p, dict)
                    else p.processedRowsPerSecond,
                    "duration_ms": (p.get("durationMs") if isinstance(p, dict) else dict(p.durationMs or {})) or {},
                    "observed": {
                        k: str(v)
                        for k, v in (
                            (p.get("observedMetrics") if isinstance(p, dict) else p.observedMetrics)
                            or {}
                        ).items()
                    },
                }
                fh.write(json.dumps(rec) + "\n")

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        rec = {
            "batch_id": p.batchId,
            "timestamp": p.timestamp,
            "num_input_rows": p.numInputRows,
            "input_rows_per_sec": p.inputRowsPerSecond,
            "process_rows_per_sec": p.processedRowsPerSecond,
            "duration_ms": dict(p.durationMs or {}),
            "observed": {k: str(v) for k, v in (p.observedMetrics or {}).items()},
        }
        with open(self.out_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def read_stream_progress(spark: SparkSession, out_path: str) -> list[dict]:
    if not os.path.exists(out_path):
        return []
    with open(out_path) as fh:
        return [json.loads(line) for line in fh if line.strip()]
