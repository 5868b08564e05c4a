"""spark-submit entry point: re-drive quarantined (dead-letter) events
back through validation into the CDC sink.

``validating_transform`` (operators/validate.py) quarantines envelope-
contract violations instead of poisoning the merge. The operational
loop this script closes: the operator fixes the upstream emitter (or
supplies an in-flight repair expression), then re-drives the quarantine
— rows that now pass validation are applied as ONE batch; rows that
still fail are rewritten to a fresh ``<quarantine>/_remaining-<id>``
directory; consumed part files are archived under
``<quarantine>/_redriven-<id>/`` (underscore prefix → invisible to any
Spark read of the quarantine dir).

Exactly-once: the batch id is a content hash of the consumed part-file
names, so re-running over the same quarantine set skips at the sink
(committed-batch check) and merely re-archives; and the events
themselves are LWW-idempotent anyway.

Env:
  REDRIVE_FIX      optional comma-separated ``col=sql_expr`` repairs
                   applied BEFORE re-validation, e.g.
                   ``n_tok=size(tokens)`` for an upstream counter bug.
  REPLAY_PATCH=1   per-cell sink (same flag as replay_job).
  REPLAY_N_BUCKETS / REPLAY_SALT    table sizing (same as replay_job).

Usage: redrive_job.py <quarantine_dir> <target_table_dir>
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from beehive_data_etl_spark.operators.validate import (
    REASON_COL,
    validate_envelope,
)
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink


def _parse_fixes(spec: str) -> dict[str, str]:
    fixes: dict[str, str] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        col, _, expr = part.partition("=")
        if not col.strip() or not expr.strip():
            raise ValueError(
                f"REDRIVE_FIX entries must be col=sql_expr, got {part!r}"
            )
        fixes[col.strip()] = expr.strip()
    return fixes


def redrive(
    spark: SparkSession,
    quarantine_dir: str,
    sink: SnapshotSink,
    fixes: dict[str, str] | None = None,
) -> dict:
    files = sorted(glob.glob(os.path.join(quarantine_dir, "*.parquet")))
    if not files:
        return {"redriven": 0, "remaining": 0, "skipped": True,
                "reason": "empty quarantine"}
    batch_id = "redrive-" + hashlib.sha256(
        "\n".join(os.path.basename(f) for f in files).encode()
    ).hexdigest()[:16]
    df = spark.read.parquet(*files).drop(REASON_COL)
    for col, expr in (fixes or {}).items():
        df = df.withColumn(col, F.expr(expr))
    valid, rejected = validate_envelope(df)
    # one pass each; the shared scan subtree is collapsed by Catalyst
    remaining_dir = os.path.join(quarantine_dir, f"_remaining-{batch_id}")
    n_remaining = 0
    if not rejected.isEmpty():
        rejected.write.mode("overwrite").parquet(remaining_dir)
        n_remaining = spark.read.parquet(remaining_dir).count()
    out = sink.apply_batch(valid, batch_id)
    # archive the consumed inputs only AFTER the commit (a crash before
    # this point leaves the quarantine intact; the re-run skips at the
    # sink and completes the archive)
    archive = os.path.join(quarantine_dir, f"_redriven-{batch_id}")
    os.makedirs(archive, exist_ok=True)
    for f in files:
        shutil.move(f, os.path.join(archive, os.path.basename(f)))
        crc = os.path.join(os.path.dirname(f), f".{os.path.basename(f)}.crc")
        if os.path.exists(crc):
            os.remove(crc)
    return {
        "batch_id": batch_id,
        "redriven_files": len(files),
        "remaining": n_remaining,
        "remaining_dir": remaining_dir if n_remaining else None,
        "commit": {k: v for k, v in out.items() if k != "lineage"},
    }


def main() -> None:
    quarantine_dir, target = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName("beehive-cdc-redrive").getOrCreate()
    sink = SnapshotSink(
        spark,
        target,
        n_buckets=int(os.environ.get("REPLAY_N_BUCKETS", "4096")),
        salt_partials=int(os.environ.get("REPLAY_SALT", "8")),
        patch=os.environ.get("REPLAY_PATCH") == "1",
    )
    fixes = _parse_fixes(os.environ.get("REDRIVE_FIX", ""))
    print("REDRIVE_METRICS " + json.dumps(
        redrive(spark, quarantine_dir, sink, fixes)
    ))


if __name__ == "__main__":
    main()
