"""Full-refetch (dump-diff) ingestion: turn a complete re-scrape into
a MINIMAL change-event batch.

The reference pipeline's sources don't emit change events — its
fetchers re-download ENTIRE registers (grants, charity registry,
companies data) and upsert every document on every run. Replayed
naively into a CDC engine that shape is pathological: a nightly
10^10-row dump becomes 10^10 upsert events when perhaps 0.1% of rows
actually changed, and every downstream consumer (changelog readers,
aggregate views, shard export, replicas) pays for the no-op churn.

``dump_to_events`` closes that gap: diff the new dump against the
table's current LIVE state and emit only

- ``I`` for keys in the dump that aren't live,
- ``U`` for live keys whose payload differs (null-safe, column-wise),
- ``D`` for live keys the dump no longer contains (opt-out via
  ``delete_missing=False`` for partial/incremental scrapes),

all stamped with one caller-supplied ``op_sequence`` — the refetch is
a single logical observation of the source, so every row it changes
changes "at" that clock tick. The emitted batch is an ordinary
envelope batch: it flows through validation, audit, schema evolution
(a dump may carry NEW columns — they ride the normal evolution path),
the exactly-once sink, and every derived view with zero special cases.

Idempotence falls out of minimality: re-diffing the same dump after
applying it yields ZERO events — a crashed-and-rerun refetch converges
instead of re-stamping the whole corpus (pinned by test).

Scale shape: ONE full-outer join of dump vs live state on the key —
O(dump + state), both sides shuffle-partitioned on the same key, with
the column-wise change predicate evaluated inside the join projection
(no second pass). The state side is the sink's merge-on-read fold; the
dump side is whatever the fetcher wrote. Unchanged rows — the
overwhelming majority of a re-scrape — are filtered before anything is
written. op_sequence allocation is one column-pruned MAX aggregation
over the state (``next_op_sequence``), amortizable across refetches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sinks.snapshot import _INTERNAL, KEY, SEQ


def next_op_sequence(sink) -> int:
    """The smallest sequence strictly above every sequence the table
    has seen — what a refetch batch should stamp so its changes win
    LWW. Computed over the RAW deltas (one genuinely column-pruned,
    shuffle-free MAX scan): the raw max is >= the folded state's max
    for every key, tombstones included — a fold here would drag every
    payload column through the LWW struct comparison for a single
    scalar (review finding)."""
    snap = sink.current_snapshot()
    if snap is None:
        return 1
    raw = sink._read_buckets(snap, list(range(snap["n_buckets"])))
    if raw is None:
        return 1
    row = raw.select(SEQ).agg(F.max(SEQ).alias("m")).collect()[0]
    return int(row.m or 0) + 1


def _refuse_malformed_keys(dump: DataFrame) -> None:
    """A dump with a NULL key or the same key twice is not a function
    doc_id → payload, so no diff against it is meaningful: duplicates
    make the refetch oscillate forever (state converges to one image,
    the other row re-stamps it every run) and same-seq events with
    different payloads break the LWW tie contract (ties assume
    byte-identical duplicate deliveries). One aggregation job over the
    dump's key column, refused loudly — matching the missing-column
    philosophy."""
    bad = (
        dump.groupBy(KEY)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col(KEY).isNull() | (F.col("n") > 1))
        .limit(5)
        .collect()
    )
    if bad:
        raise _malformed_key_error([(r[0], r.n) for r in bad])


def _malformed_key_error(bad: list[tuple], total: int | None = None) -> ValueError:
    """One formatter for the malformed-key refusal — shared with
    merge_into's folded fast path so the two can't drift. ``total`` is
    the full offending-key count when the caller's audit only sampled a
    few (merge_into's single-row folded audit carries the exact count
    but just one example struct), so multi-key corruption is reported
    as such instead of masquerading as a single bad key."""
    shown = f"{len(bad)} example(s): {bad}" if total and total > len(bad) else f"{bad}"
    n = f"{total} offending key(s), " if total is not None else "offending keys "
    return ValueError(
        "dump is not keyed by a unique non-null "
        f"{KEY}: {n}{shown} — "
        "de-duplicate or fix the fetcher before diffing"
    )


def dump_to_events(
    sink,
    dump: DataFrame,
    op_sequence: int,
    *,
    delete_missing: bool = True,
) -> DataFrame:
    """The minimal (op, op_sequence, doc_id, payload…) envelope batch
    that moves the table's live state to exactly the dump's image.

    ``dump`` must carry the key plus EVERY current payload column —
    a full refetch that silently lacked a column would null it for
    every emitted row, so the omission is refused loudly; columns the
    table doesn't have yet are allowed (schema evolution)."""
    snap = sink.current_snapshot()
    if KEY not in dump.columns:
        raise ValueError(f"dump is missing the key column {KEY!r}")
    if op_sequence <= 0:
        raise ValueError("op_sequence must be positive")
    _refuse_malformed_keys(dump)
    dump_payload = [c for c in dump.columns if c != KEY]
    if snap is None:
        # empty table: the whole dump is inserts
        return dump.select(
            F.lit("I").alias("op"),
            F.lit(op_sequence).cast("long").alias(SEQ),
            F.col(KEY),
            *dump_payload,
        )
    state = sink.read_state()
    table_payload = [c for c in state.columns if c not in _INTERNAL and c != KEY]
    missing = [c for c in table_payload if c not in dump.columns]
    if missing:
        raise ValueError(
            f"dump is missing current payload columns {missing}: a full "
            "refetch must carry every column (a U event would null them "
            "for every changed row). Re-fetch with the columns, or drop "
            "them from the table schema first."
        )
    new_cols = [c for c in dump_payload if c not in table_payload]
    d = dump.select(KEY, *dump_payload).withColumn("_in_dump", F.lit(True))
    s = state.select(
        F.col(KEY),
        F.col("deleted").alias("_old_del"),
        *[F.col(c).alias(f"_old_{c}") for c in table_payload],
    )
    j = d.join(s, KEY, "full_outer")
    live = F.col("_old_del").isNotNull() & ~F.col("_old_del")
    in_dump = F.col("_in_dump").isNotNull()
    changed = F.lit(False)
    for c in table_payload:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"_old_{c}"))
    for c in new_cols:
        # a brand-new column counts as a change only where it is set —
        # otherwise every row of the corpus would re-stamp on the first
        # dump that introduces the column
        changed = changed | F.col(c).isNotNull()
    op = (
        F.when(in_dump & ~live, F.lit("I"))
        .when(in_dump & live & changed, F.lit("U"))
        .when(~in_dump & live & F.lit(delete_missing), F.lit("D"))
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            "op",
            F.lit(op_sequence).cast("long").alias(SEQ),
            F.col(KEY),
            # deletes carry no payload (the envelope contract)
            *[
                F.when(F.col("op") != "D", F.col(c)).alias(c)
                for c in dump_payload
            ],
        )
    )


def refetch_apply(
    sink,
    dump: DataFrame,
    batch_id: str,
    *,
    op_sequence: int | None = None,
    delete_missing: bool = True,
) -> dict:
    """Convenience wrapper: allocate the sequence, diff, and apply as
    one exactly-once batch (re-running with the same batch_id skips at
    the sink like any re-delivered batch). Returns the sink's commit
    metrics. For pipelines with validation/audit between diff and
    apply, call ``dump_to_events`` directly."""
    seq = next_op_sequence(sink) if op_sequence is None else op_sequence
    events = dump_to_events(
        sink, dump, seq, delete_missing=delete_missing
    )
    return sink.apply_batch(events, batch_id)
