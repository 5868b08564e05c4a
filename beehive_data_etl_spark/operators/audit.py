"""Write-audit-publish gate (batch-level quality contract).

Row-level validation (``operators.validate``) quarantines individual
malformed envelopes and lets the batch proceed. This is the OTHER
failure mode a 10^10-event ingest needs guarded: a batch that is
row-wise well-formed but wrong in aggregate — an upstream bug emitting
all-empty token arrays, a misconfigured fetcher delivering 100× the
expected volume, a resequencer sending op_sequence zeros. Committing
such a batch poisons the table and every derived view at the commit's
cadence; catching it needs batch-level rules evaluated on the content
that is ABOUT to be committed.

Iceberg's pattern is write-audit-publish: stage the snapshot, audit,
then publish. This sink already stages (data files and manifests land
before the pointer swap), so the gate slots in exactly there:
``SnapshotSink(audit=...)`` runs the audit over the STAGED batch
output — the real bytes, post LWW dedup and schema alignment — after
the merge job writes and before anything is published. A violation
raises ``AuditError``: staging is cleaned, no manifest or pointer
moves, the table is byte-identical to before (a crash-equivalent
abort). The operator fixes the upstream and re-applies the batch id.

``standard_token_audit`` builds the audit for the north-rule
tokenized-sequence payload from declarative violation predicates —
ONE aggregation job over the staged files, no per-row Python. Custom
audits are any ``fn(staged_df, metrics) -> None`` that raises to
block; compose predicates with ``predicate_audit``.

Crash-replay note: buckets reused from a crashed attempt's manifests
bypass the audit — sound, because manifests are only written AFTER the
audit passed in the attempt that produced them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class AuditError(RuntimeError):
    """A batch failed its write-audit-publish gate; nothing committed."""

    def __init__(self, batch_id: str, violations: dict[str, int]) -> None:
        self.batch_id = batch_id
        self.violations = violations
        super().__init__(
            f"batch {batch_id} failed audit: "
            + ", ".join(f"{k}={v}" for k, v in sorted(violations.items()))
        )


def predicate_audit(
    rules: dict[str, "F.Column"] | None = None,
    rule_factory: Callable[[], dict] | None = None,
    max_violations: int = 0,
    min_rows: int = 0,
    max_rows: int | None = None,
) -> Callable[[DataFrame, dict], None]:
    """Audit from violation predicates: each rule is a boolean Column
    that is TRUE for a violating row. All rules are counted in ONE
    aggregation job (conditional sums — map-side combinable, scales
    with staged-batch size only). ``rule_factory`` defers Column
    construction to call time for callers that build the audit before
    a SparkSession exists (e.g. module-level job config)."""

    def audit(staged: DataFrame, metrics: dict) -> None:
        built = dict(rules or {})
        if rule_factory is not None:
            built.update(rule_factory())
        aggs = [
            F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).alias(name)
            for name, cond in built.items()
        ] + [F.count(F.lit(1)).alias("__rows")]
        row = staged.agg(*aggs).collect()[0]
        violations = {
            name: int(row[name] or 0)
            for name in built
            if int(row[name] or 0) > max_violations
        }
        n = int(row["__rows"])
        if n < min_rows:
            violations["min_rows"] = n
        if max_rows is not None and n > max_rows:
            violations["max_rows"] = n
        if violations:
            raise AuditError(metrics.get("batch_id", "?"), violations)

    return audit


def standard_token_audit(
    max_violations: int = 0,
    min_rows: int = 0,
    max_rows: int | None = None,
    max_n_tok: int = 1_000_000,
    patch: bool = False,
) -> Callable[[DataFrame, dict], None]:
    """The north-rule payload contract (doc_id, tokens, n_tok, source):

    - a live (non-tombstone) row must carry a non-empty token array,
    - ``n_tok`` must be positive, consistent with ``size(tokens)``,
      and bounded (a runaway upstream concatenation bug),
    - ``op_sequence`` must be positive (a resequencer emitting zeros
      breaks LWW ordering silently),
    - ``doc_id`` must be non-null/non-empty.

    Tombstones (deleted=true) are exempt from payload rules — their
    payload is legitimately NULL. With ``patch=True`` (per-cell tables,
    ``SnapshotSink(patch=True)``) the token rules additionally require
    the tokens CELL to be set: a staged batch whose events for a key
    are all metadata patches legitimately carries no tokens — only a
    SET-but-empty token payload is a violation."""

    def rule_factory() -> dict:
        live = ~F.col("deleted")
        rules: dict = {}
        if patch:
            live = live & F.col("_cell_seq")["tokens"].isNotNull()
            # tokens and n_tok travel together (n_tok derives from
            # tokens): a staged row where exactly one of the two cells
            # is set came from a solo-mask patch the cell-gated rules
            # below cannot judge — flag the pairing itself
            rules["unpaired_token_cells"] = (
                F.col("_cell_seq")["tokens"].isNotNull()
                != F.col("_cell_seq")["n_tok"].isNotNull()
            )
        rules.update(
            {
                "null_doc_id": F.col("doc_id").isNull() | (F.col("doc_id") == ""),
                "nonpositive_op_sequence": F.col("op_sequence") <= 0,
                "live_empty_tokens": live
                & (F.col("tokens").isNull() | (F.size("tokens") == 0)),
                "live_bad_n_tok": live
                & (
                    F.col("n_tok").isNull()
                    | (F.col("n_tok") <= 0)
                    | (F.col("n_tok") > max_n_tok)
                    | (F.col("n_tok").cast("long") != F.size("tokens").cast("long"))
                ),
            }
        )
        return rules

    return predicate_audit(
        rule_factory=rule_factory,
        max_violations=max_violations,
        min_rows=min_rows,
        max_rows=max_rows,
    )
