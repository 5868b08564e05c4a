"""Partial-update (patch) CDC events with per-cell LWW timestamps.

The reference's fetchers overwrite whole documents, so plain row-level
last-writer-wins (``operators.lww``) reconstructs its state exactly.
Real binlog/WAL sources additionally emit PARTIAL updates — a Debezium
``updateDescription`` / MongoDB ``$set`` carries only the columns the
transaction touched. Folding those with row-LWW is wrong: the newest
event wins the whole row and silently nulls every column it didn't set.

The principled fix is per-CELL last-writer-wins — each (row, column)
pair carries the op_sequence of the event that last set it (the same
model as Cassandra cell timestamps). Rows gain one internal column::

    _cell_seq: map<string, bigint>   -- column name -> setter seq

- a FULL event (op I/U/D) sets every payload cell plus the synthetic
  ``deleted`` existence cell at its op_sequence (a delete sets all
  payload cells to NULL — the row is gone, not sparse);
- a PATCH event (op P) sets only the cells named in its mask column
  and never the existence cell (a patch cannot delete or resurrect).

``cell_lww_dedup`` then reduces any bag of cell-events to one row per
key: for each cell, the value carried by the max-``_cell_seq[c]`` event;
``op_sequence`` = max over all events; ``deleted`` from the existence
cell (keys that only ever saw patches are live).

Why this shape (and not MERGE + per-column COALESCE against the old
image): the fold is ASSOCIATIVE and COMMUTATIVE — folding any partition
of the events in any order, including already-folded rows, yields the
same row, because every cell remembers its own setter seq. That is the
exact property ``sinks.snapshot`` is built on (merge-on-read deltas,
inline compaction, pipelined out-of-order batch commits, crash-replayed
manifests), so the entire hardened commit protocol works unchanged with
this fold swapped in (``SnapshotSink(patch=True)``).

Scale notes: one single-pass aggregation — 2 agg expressions per column
(``max_by(value, cell_seq)`` + ``max(cell_seq)``), map-side partial
combine, so a hot key reduces per map partition before the shuffle; the
same two-phase ``salt_partials`` salting as row-LWW applies on top.
No joins, no windows, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CELL = "_cell_seq"
_EXIST = "deleted"  # the synthetic existence cell


def patch_events(
    df: DataFrame,
    key: str = "doc_id",
    seq: str = "op_sequence",
    op_col: str = "op",
    mask_col: str = "patch_cols",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Normalize raw envelope rows into cell-event form.

    Input rows carry ``op`` ('I'/'U'/'D' full, 'P' patch), the key, the
    sequence, payload columns, and — for patches — ``mask_col`` (an
    ``array<string>`` naming the columns the patch sets). Output rows
    carry ``deleted`` plus ``_cell_seq`` and drop op/mask.

    Mask hygiene is enforced here, not trusted from the wire: mask
    entries are intersected with the actual payload columns, so a patch
    can never set the existence cell, the key, the sequence, or a
    column that does not exist. A patch with a NULL/empty mask sets
    nothing (it still advances the row's op_sequence).
    """
    if payload_cols is None:
        payload_cols = [
            c
            for c in df.columns
            if c not in (key, seq, op_col, mask_col, _EXIST, CELL)
        ]
    full_cells = F.array(
        *[F.lit(c) for c in payload_cols], F.lit(_EXIST)
    )
    allowed = F.array(*[F.lit(c) for c in payload_cols])
    if mask_col in df.columns:
        mask = F.array_intersect(
            F.coalesce(F.col(mask_col), F.array().cast("array<string>")), allowed
        )
    else:
        mask = F.array().cast("array<string>")
    cells = F.when(F.col(op_col) == "P", mask).otherwise(full_cells)
    cell_map = F.map_from_arrays(
        cells, F.array_repeat(F.col(seq).cast("long"), F.size(cells))
    )
    out = df.withColumn(_EXIST, F.col(op_col) == "D").withColumn(CELL, cell_map)
    # normalize deletes: a D event's payload cells are NULL no matter
    # what the wire carried — the row is gone, not sparse (without this
    # a junk-payload delete would store those values as live cells)
    for c in payload_cols:
        out = out.withColumn(c, F.when(F.col(op_col) != "D", F.col(c)))
    return out.drop(*[c for c in (op_col, mask_col) if c in df.columns])


def widen_for_cells(
    df: DataFrame,
    table_payload_fields,
    key: str = "doc_id",
    seq: str = "op_sequence",
    op_col: str = "op",
    mask_col: str = "patch_cols",
):
    """Project raw envelope rows onto the TABLE's payload ∪ the batch's
    extras (typed nulls for columns the batch lacks) BEFORE
    ``patch_events``, so a full/delete event stamps EVERY table column
    — the narrow-delete-must-clear-evolved-columns invariant. Shared by
    SnapshotSink and IcebergSink precisely so the two sinks cannot
    drift (review-found duplication). Returns ``(widened_df,
    payload_names)``; pass the names as ``patch_events(...,
    payload_cols=names)``."""
    names = [f.name for f in table_payload_fields]
    known = set(names)
    have = set(df.columns)
    extras = [
        c
        for c in df.columns
        if c not in known and c not in (key, seq, op_col, mask_col, _EXIST, CELL)
    ]
    types = {f.name: f.dataType for f in table_payload_fields}
    widened = df.select(
        *[c for c in (op_col, mask_col) if c in have],
        F.col(key),
        F.col(seq),
        *[
            (F.col(c) if c in have else F.lit(None).cast(types[c])).alias(c)
            for c in names
        ],
        *[F.col(c) for c in extras],
    )
    return widened, names + extras


def _cell_fold(df: DataFrame, key: str, seq: str, salt_col: str | None) -> DataFrame:
    payload = [
        c for c in df.columns if c not in (key, seq, _EXIST, CELL, salt_col)
    ]
    group = [key] if salt_col is None else [key, salt_col]
    aggs = [F.max(F.col(seq)).alias(seq)]
    for c in payload + [_EXIST]:
        cs = F.col(CELL)[c]
        # max_by ignores rows whose cell seq is NULL (non-setters) and
        # preserves a NULL value at the winning seq (a delete clearing
        # the cell) — probed semantics, relied on here
        aggs.append(F.max_by(F.col(c), cs).alias(f"_v_{c}"))
        aggs.append(F.max(cs).alias(f"_s_{c}"))
    out = df.groupBy(*group).agg(*aggs)
    entries = F.array(
        *[
            F.struct(F.lit(c).alias("key"), F.col(f"_s_{c}").alias("value"))
            for c in payload + [_EXIST]
        ]
    )
    cell_map = F.map_from_entries(
        F.filter(entries, lambda e: e["value"].isNotNull())
    )
    return out.select(
        *[F.col(c) for c in group],
        F.col(seq),
        *[F.col(f"_v_{c}").alias(c) for c in payload],
        F.coalesce(F.col(f"_v_{_EXIST}"), F.lit(False)).alias(_EXIST),
        cell_map.alias(CELL),
    )


def cell_lww_dedup(
    df: DataFrame,
    key: str = "doc_id",
    seq: str = "op_sequence",
    salt_partials: int = 0,
) -> DataFrame:
    """Reduce cell-events (rows carrying ``_cell_seq``) to one row per
    key under per-cell LWW. Same signature and salting contract as
    ``lww.lww_dedup`` so ``SnapshotSink`` can use either fold.

    Accepts its own output as input (associative/commutative): folded
    rows re-enter with their per-cell seqs intact, so
    fold(fold(A) ∪ B) == fold(A ∪ B) for any split — the property the
    sink's compaction and pipelined commits require (property-tested).
    """
    if salt_partials and salt_partials > 1:
        salted = df.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(seq)), F.lit(salt_partials))
        )
        partial = _cell_fold(salted, key, seq, "_salt")
        return _cell_fold(partial.drop("_salt"), key, seq, None)
    return _cell_fold(df, key, seq, None)
