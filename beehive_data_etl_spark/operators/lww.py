"""Last-writer-wins dedup over an ``op_sequence`` watermark (SURVEY.md §2 A3/A8).

The reference achieves LWW implicitly — each fetcher re-run upserts the
latest document per key into MongoDB (SURVEY.md §1.1). Here it is an
explicit, shuffle-aware Spark reduction.

Implementation notes (scale):

- ``max(struct(op_sequence, …))`` is a single-pass aggregate with a
  map-side partial phase, so every map partition reduces a hot key to
  one row *before* the shuffle — the skew-killing property we need for
  Zipf-distributed doc_ids.
- Because the aggregation buffer contains a variable-length
  ``array<int32>`` payload, Catalyst plans it as ObjectHashAggregate /
  SortAggregate rather than whole-stage-codegen HashAggregate; the
  partial/final split still applies.
- ``salt_partials`` adds an *explicit* pre-shuffle salting stage
  (mandated by BASELINE.json:6): a first reduction keyed by
  ``(key, salt)`` fans a hot key across ``salt`` reducers, then a final
  per-key reduction combines the salted partials. Use it when a single
  key's events exceed what one partial-agg task should hold (e.g.
  10^10-event replays where one doc_id dominates a micro-batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pick_latest(df: DataFrame, key: str, seq: str, salt_col: str | None) -> DataFrame:
    payload = [c for c in df.columns if c not in (key, seq, salt_col)]
    group = [key] if salt_col is None else [key, salt_col]
    packed = F.max(F.struct(F.col(seq), *[F.col(c) for c in payload])).alias("_lww")
    out = df.groupBy(*group).agg(packed)
    return out.select(
        key,
        *([salt_col] if salt_col else []),
        F.col(f"_lww.{seq}").alias(seq),
        *[F.col(f"_lww.{c}").alias(c) for c in payload],
    )


def lww_dedup(
    df: DataFrame,
    key: str = "doc_id",
    seq: str = "op_sequence",
    salt_partials: int = 0,
) -> DataFrame:
    """Keep the max-``seq`` row per ``key``; deterministic on ties
    (struct comparison falls through to the payload columns, and
    duplicate deliveries are byte-identical by contract).

    With ``salt_partials > 0`` runs the two-phase salted reduction:
    ``groupBy(key, pmod(xxhash64(seq), S))`` partial LWW, then the
    final per-key LWW — the classic hot-key pattern (SURVEY.md §4).
    """
    if salt_partials and salt_partials > 1:
        salted = df.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(seq)), F.lit(salt_partials))
        )
        partial = _pick_latest(salted, key, seq, "_salt")
        return _pick_latest(partial.drop("_salt"), key, seq, None)
    return _pick_latest(df, key, seq, None)
