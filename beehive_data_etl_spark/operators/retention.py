"""Predicate-scoped soft deletes: TTL / retention sweeps as ORDINARY
change events.

``purge_keys`` is the takedown hammer — it physically removes bytes,
restarts the keys' LWW clocks, and REFUSES replication (no forward
event can express it). Most retention policies want the opposite
trade: "tombstone every row older than N days / below quality q" as a
normal ``D`` batch that

- flows through the exactly-once sink protocol (crash-replayable,
  batch-id deduped),
- is VISIBLE to every changelog consumer at a truthful op_sequence —
  aggregate views subtract, token indexes unpost, shard exports
  rewrite, replicas and outbox feeds ship the deletes like any other
  change (vs purge's refuse-and-reconcile),
- retains time travel until compaction + vacuum age the bytes out on
  the table's normal horizon.

``delete_where(sink, predicates)`` finds matching LIVE rows via the
stats-pruned ``scan_where`` (key-only projection — the sweep reads one
column, not the table width), stamps them all at ONE freshly allocated
op_sequence (the sweep is a single logical observation, exactly
``dump_to_events``' clock argument), and applies them as a normal
envelope batch.

Semantics under concurrency — plain LWW, stated rather than hidden:
the sweep deletes the rows that matched at its planned snapshot; a
writer that lands a HIGHER-seq image of a matched key after the plan
simply wins (the delete raced a newer write and lost — correct for a
retention sweep, which the next scheduled run re-evaluates anyway).
Idempotence falls out of minimality: re-running the same sweep after
it applied matches zero rows and commits nothing.

Scale: O(matching buckets' state) for the scan (stats-pruned,
key-only), O(matched rows) for the event batch — never O(table
width), never a driver-side collect."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sinks.snapshot import CELL, KEY, SEQ
from .refetch import next_op_sequence


def delete_where(
    sink,
    predicates: list[tuple],
    batch_id: str | None = None,
    dry_run: bool = False,
) -> dict:
    """Tombstone every live row matching the conjunctive
    ``predicates`` (``scan_where``'s grammar: ``[(col, op, value),
    ...]``) at one freshly allocated op_sequence. Returns
    ``{"deleted", "op_sequence", "batch_id", "version"}``;
    ``dry_run=True`` reports the match count without applying."""
    snap = sink.current_snapshot()
    if snap is None:
        raise ValueError("no snapshot yet")
    # key-only projection: the sweep pays one column of scan bytes.
    # scan_where validates the predicate grammar and prunes buckets
    # whose stats prove no current row can match.
    matching = sink.scan_where(predicates, columns=[]).localCheckpoint()
    n = matching.count()
    if dry_run or n == 0:
        return {
            "deleted": n,
            "op_sequence": None,
            "batch_id": None,
            "version": snap["version"],
            "dry_run": dry_run,
        }
    # one clock tick for the whole sweep; recomputes identically on a
    # crash-retry (nothing committed yet — same snapshot, same raw
    # max), so the deterministic batch_id below re-enters the sink's
    # crash-replay path. The batch id carries the PLANNED VERSION, not
    # just the sequence: after a tombstone GC physically removes a
    # prior sweep's rows, the raw max regresses and a later sweep can
    # re-allocate the same seq — a seq-only id would collide with the
    # committed earlier batch and be skipped as a re-delivery forever
    # (review-found). The version always advanced past the earlier
    # sweep's commit, so (version, seq) is unique per logical sweep
    # while staying stable across crash-retries.
    seq = next_op_sequence(sink)
    schema = T.StructType.fromDDL(snap["schema"])
    payload = [
        f
        for f in schema.fields
        if f.name not in (KEY, SEQ, "deleted", CELL)
    ]
    events = matching.select(
        F.lit("D").alias("op"),
        F.lit(seq).cast("long").alias(SEQ),
        F.col(KEY),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in payload],
    )
    bid = batch_id or f"delete-where-v{snap['version']}-{seq}"
    metrics = sink.apply_batch(events, bid)
    if metrics.get("skipped"):
        # a committed batch already carries this id. With the default
        # (version, seq) id that means THIS sweep already applied (a
        # crash-retry after commit) — report honestly instead of
        # claiming a fresh delete; with a caller-supplied id it means
        # the caller reused one, which must not pass silently either.
        return {
            "deleted": 0,
            "op_sequence": seq,
            "batch_id": bid,
            "version": sink.current_snapshot()["version"],
            "dry_run": False,
            "skipped": metrics.get("reason", "batch id already committed"),
        }
    return {
        "deleted": n,
        "op_sequence": seq,
        "batch_id": bid,
        "version": sink.current_snapshot()["version"],
        "dry_run": False,
    }
