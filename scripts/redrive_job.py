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

Exactly-once vs retry-ability: the batch id hashes the consumed
part-file names AND sizes AND the repair spec — re-running the same
files with the same fix skips at the sink (committed-batch check, and
the events are LWW-idempotent anyway), while re-running with a
CORRECTED fix is a NEW batch that applies the newly-repairable rows.
A run that repairs nothing commits nothing and leaves the quarantine
untouched, so a wrong fix is retryable.

Env:
  REDRIVE_FIX      optional ';'-separated ``col=sql_expr`` repairs
                   applied BEFORE re-validation, e.g.
                   ``n_tok=coalesce(n_tok, size(tokens))``. ';' (not
                   ',') separates entries so expressions may contain
                   commas.
  REPLAY_PATCH=1   per-cell sink + patch envelope validation rules
                   (op 'P' allowed, token rules scoped to the mask).
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

import pyarrow.parquet as pq
from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F

from beehive_data_etl_spark.operators.validate import (
    REASON_COL,
    validate_envelope,
)
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink


def _parse_fixes(spec: str) -> dict[str, str]:
    fixes: dict[str, str] = {}
    for part in spec.split(";"):
        part = part.strip()
        if not part:
            continue
        col, _, expr = part.partition("=")
        if not col.strip() or not expr.strip():
            raise ValueError(
                f"REDRIVE_FIX entries must be col=sql_expr (';'-separated), "
                f"got {part!r}"
            )
        fixes[col.strip()] = expr.strip()
    return fixes


def redrive(
    spark: SparkSession,
    quarantine_dir: str,
    sink: SnapshotSink,
    fixes: dict[str, str] | None = None,
    patch: bool = False,
) -> dict:
    files = sorted(glob.glob(os.path.join(quarantine_dir, "*.parquet")))
    if not files:
        return {"redriven": 0, "remaining": 0, "skipped": True,
                "reason": "empty quarantine"}
    # content-sensitive id: names + sizes + the repair spec — same
    # inputs+fix re-runs skip at the sink; a corrected fix is a new
    # batch (review-found: a name-only hash silently no-op'd retries
    # with a better fix)
    ident = "\n".join(
        f"{os.path.basename(f)}:{os.path.getsize(f)}" for f in files
    ) + "\n" + json.dumps(fixes or {}, sort_keys=True)
    batch_id = "redrive-" + hashlib.sha256(ident.encode()).hexdigest()[:16]
    total = sum(pq.read_metadata(f).num_rows for f in files)  # footers only
    df = spark.read.parquet(*files).drop(REASON_COL)
    for col, expr in (fixes or {}).items():
        df = df.withColumn(col, F.expr(expr))
    valid, rejected = validate_envelope(df, patch=patch)
    # remaining rows: ONE job — the Observation rides the write (the
    # validating_transform pattern; an isEmpty probe would be a third
    # evaluation of the read+fix+validate subtree)
    remaining_dir = os.path.join(quarantine_dir, f"_remaining-{batch_id}")
    obs = Observation()
    rejected.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
        "overwrite"
    ).parquet(remaining_dir)
    n_remaining = int(obs.get["n"])
    if n_remaining == 0:
        shutil.rmtree(remaining_dir, ignore_errors=True)
        remaining_dir = None
    n_valid = total - n_remaining  # valid/rejected partition the input
    if n_valid == 0:
        # the fix repaired nothing: commit NOTHING and leave the
        # quarantine untouched so a corrected fix can retry
        if remaining_dir:
            shutil.rmtree(remaining_dir, ignore_errors=True)
        return {"batch_id": batch_id, "redriven_files": 0,
                "remaining": n_remaining, "skipped": True,
                "reason": "no rows passed validation; quarantine untouched"}
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
        "redriven_rows": n_valid,
        "remaining": n_remaining,
        "remaining_dir": remaining_dir,
        "commit": {k: v for k, v in out.items() if k != "lineage"},
    }


def main() -> None:
    quarantine_dir, target = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName("beehive-cdc-redrive").getOrCreate()
    patch = os.environ.get("REPLAY_PATCH") == "1"
    sink = SnapshotSink(
        spark,
        target,
        n_buckets=int(os.environ.get("REPLAY_N_BUCKETS", "4096")),
        salt_partials=int(os.environ.get("REPLAY_SALT", "8")),
        patch=patch,
    )
    fixes = _parse_fixes(os.environ.get("REDRIVE_FIX", ""))
    print("REDRIVE_METRICS " + json.dumps(
        redrive(spark, quarantine_dir, sink, fixes, patch=patch)
    ))


if __name__ == "__main__":
    main()
