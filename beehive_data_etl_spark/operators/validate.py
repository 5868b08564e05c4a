"""Envelope validation (SURVEY.md §2 A2): enforce the CDC envelope
contract and split a batch into (valid, rejected) — rejected rows carry
a reason and go to a quarantine sink instead of poisoning the merge.

Rules (the binlog/WAL contract):
- ``op`` ∈ {I, U, D}; ``doc_id`` and ``op_sequence`` non-null;
- upserts carry a payload: ``tokens`` non-null and ``n_tok ==
  size(tokens)`` for I/U;
- deletes carry none: ``tokens`` null for D.

Everything is one declarative projection — the split costs two filters
over the same scan (Catalyst collapses the shared subtree), no UDFs.
"""

from __future__ import annotations

import contextlib
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REASON_COL = "_reject_reason"


def _reason_expr(patch: bool = False):
    ops = ("I", "U", "D", "P") if patch else ("I", "U", "D")
    out = F.when(
        # isNull first: for a null op the isin() predicate is NULL
        # (not true), and a bare negation would let the row through
        # every later branch too — a null-op event would merge with
        # deleted=NULL and act as a silent delete (ADVICE round 1)
        F.col("op").isNull() | ~F.col("op").isin(*ops),
        F.lit("bad_op"),
    ).when(F.col("doc_id").isNull(), F.lit("null_doc_id")).when(
        F.col("op_sequence").isNull(), F.lit("null_op_sequence")
    )
    if not patch:
        return (
            out.when(
                (F.col("op") != "D") & F.col("tokens").isNull(),
                F.lit("missing_payload"),
            )
            .when(
                (F.col("op") != "D")
                & F.col("n_tok").isNotNull()
                & (F.size("tokens") != F.col("n_tok")),
                F.lit("n_tok_mismatch"),
            )
            .when(
                (F.col("op") == "D") & F.col("tokens").isNotNull(),
                F.lit("delete_with_payload"),
            )
        )
    # patch envelope (op 'P' + patch_cols mask): token rules apply only
    # to events that SET the token cells; a patch carries nothing
    # outside its mask; tokens and n_tok always travel together
    is_p = F.col("op") == "P"
    sets_tok = ~is_p | F.array_contains("patch_cols", "tokens")
    return (
        out.when(
            is_p & (F.col("patch_cols").isNull() | (F.size("patch_cols") == 0)),
            F.lit("empty_patch_mask"),
        )
        .when(
            is_p
            & (
                F.array_contains("patch_cols", "tokens")
                != F.array_contains("patch_cols", "n_tok")
            ),
            F.lit("unpaired_token_mask"),
        )
        .when(
            (F.col("op") != "D") & sets_tok & F.col("tokens").isNull(),
            F.lit("missing_payload"),
        )
        .when(
            (F.col("op") != "D")
            & sets_tok
            & F.col("n_tok").isNotNull()
            & (F.size("tokens") != F.col("n_tok")),
            F.lit("n_tok_mismatch"),
        )
        .when(
            is_p & ~sets_tok & F.col("tokens").isNotNull(),
            F.lit("unmasked_payload"),
        )
        .when(
            (F.col("op") == "D") & F.col("tokens").isNotNull(),
            F.lit("delete_with_payload"),
        )
    )


def validate_envelope(
    batch: DataFrame, patch: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(valid, rejected)``; ``rejected`` carries REASON_COL.
    ``patch=True`` validates the patch envelope (op 'P' allowed; token
    rules scoped to events whose mask sets the token cells)."""
    tagged = batch.withColumn(REASON_COL, _reason_expr(patch))
    valid = tagged.filter(F.col(REASON_COL).isNull()).drop(REASON_COL)
    rejected = tagged.filter(F.col(REASON_COL).isNotNull())
    return valid, rejected


def validating_transform(quarantine_dir: str | None = None, patch: bool = False):
    """A replay ``transform`` that enforces A2: valid rows continue to
    the merge; rejected rows are appended to the quarantine directory
    (parquet) with their reasons."""

    def _apply(batch: DataFrame) -> DataFrame:
        valid, rejected = validate_envelope(batch, patch=patch)
        if quarantine_dir is not None:
            # no isEmpty() probe: that was a third scan of the source
            # per batch (probe + quarantine write + valid path). An
            # append of zero rows just writes metadata — cheaper than
            # the extra job, and the valid path stays a single scan.
            # An Observation rides the SAME write job (zero extra jobs)
            # and tells the driver whether anything was rejected; on a
            # clean batch the metadata-only part files just written are
            # pruned so a long-running stream doesn't accumulate one
            # empty file per batch (ADVICE round 2).
            from pyspark.sql import Observation

            obs = Observation()
            t0 = time.time()
            rejected.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
                "append"
            ).parquet(quarantine_dir)
            if obs.get["n"] == 0:
                _prune_empty_parts(quarantine_dir, since=t0 - 1.0)
        return valid

    return _apply


def _prune_empty_parts(directory: str, since: float) -> None:
    """Remove zero-row parquet part files written at/after ``since`` —
    driver-side footer reads only, no Spark job. Concurrent (pipelined)
    batches may race to remove the same empty file; both outcomes are
    correct, so missing files are ignored."""
    import pyarrow.parquet as pq

    try:
        entries = list(os.scandir(directory))
    except FileNotFoundError:
        return
    for ent in entries:
        if not ent.name.endswith(".parquet") or ent.name.startswith("."):
            continue
        # ValueError covers pyarrow.ArrowInvalid (its base class) for
        # corrupt/truncated candidates — best-effort means skip, not
        # fail the batch
        with contextlib.suppress(OSError, ValueError):
            if ent.stat().st_mtime >= since and pq.read_metadata(ent.path).num_rows == 0:
                os.remove(ent.path)
                # local filesystems write a hidden .<name>.crc sidecar
                # per part file; orphaning one per clean batch would
                # rebuild the very accumulation this prune removes
                with contextlib.suppress(OSError):
                    os.remove(os.path.join(directory, f".{ent.name}.crc"))
