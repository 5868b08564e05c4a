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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REASON_COL = "_reject_reason"


def _reason_expr():
    return (
        F.when(
            # isNull first: for a null op the isin() predicate is NULL
            # (not true), and a bare negation would let the row through
            # every later branch too — a null-op event would merge with
            # deleted=NULL and act as a silent delete (ADVICE round 1)
            F.col("op").isNull() | ~F.col("op").isin("I", "U", "D"),
            F.lit("bad_op"),
        )
        .when(F.col("doc_id").isNull(), F.lit("null_doc_id"))
        .when(F.col("op_sequence").isNull(), F.lit("null_op_sequence"))
        .when(
            (F.col("op") != "D") & F.col("tokens").isNull(), F.lit("missing_payload")
        )
        .when(
            (F.col("op") != "D")
            & F.col("n_tok").isNotNull()
            & (F.size("tokens") != F.col("n_tok")),
            F.lit("n_tok_mismatch"),
        )
        .when((F.col("op") == "D") & F.col("tokens").isNotNull(), F.lit("delete_with_payload"))
    )


def validate_envelope(batch: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Returns ``(valid, rejected)``; ``rejected`` carries REASON_COL."""
    tagged = batch.withColumn(REASON_COL, _reason_expr())
    valid = tagged.filter(F.col(REASON_COL).isNull()).drop(REASON_COL)
    rejected = tagged.filter(F.col(REASON_COL).isNotNull())
    return valid, rejected


def validating_transform(quarantine_dir: str | None = None):
    """A replay ``transform`` that enforces A2: valid rows continue to
    the merge; rejected rows are appended to the quarantine directory
    (parquet) with their reasons."""

    def _apply(batch: DataFrame) -> DataFrame:
        valid, rejected = validate_envelope(batch)
        if quarantine_dir is not None:
            # no isEmpty() probe: that was a third scan of the source
            # per batch (probe + quarantine write + valid path). An
            # append of zero rows just writes metadata — cheaper than
            # the extra job, and the valid path stays a single scan.
            rejected.write.mode("append").parquet(quarantine_dir)
        return valid

    return _apply
