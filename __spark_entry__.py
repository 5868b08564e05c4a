"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query on sf0.001 — the engine's signature
  CDC operation in batch form: treat the events table as a change log
  (key=user_id, op_sequence=event_id, deletes from event_type) and
  produce the last-writer-wins final state (SURVEY.md §7.1 M1: "what is
  the final state per key after this change log?").
- ``queries()`` / ``oracle_sql()``: the full operator surface from
  SURVEY.md §2B plus the training-data operators (dedup / similarity /
  text analysis / multimodal), each checked against a DuckDB oracle at
  sf0.01 by the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: batch CDC replay semantics over sf0.001 events —
    per-key LWW final state with delete tombstoning dropped."""
    from beehive_data_etl_spark.operators.lww import lww_dedup

    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    log = events.select(
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_id").alias("op_sequence"),
        F.when(F.col("event_type") == "delete", "D").otherwise("U").alias("op"),
        F.col("event_type"),
        F.col("value"),
    )
    # salt_partials=0: salting is opt-in for measured hot-key skew (see
    # q_dedup_lww_salted); paying the two-phase double shuffle on an
    # unskewed log was a round-1 wart
    final = lww_dedup(log, key="doc_id", seq="op_sequence")
    return final.filter(F.col("op") != "D").select(
        "doc_id",
        F.col("op_sequence").alias("last_seq"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (see
    beehive_data_etl_spark/plans/queries.py for the implementations)."""
    from beehive_data_etl_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query — EVERY queries() key has one
    (same key set, enforced by tests): approximate operators are
    expressed oracle-checkably (the HLL sketch emits its exact count +
    a tolerance flag; LSH/IVF pipelines are deterministic and replayed
    exactly in SQL; the multimodal decode stub's byte arithmetic is
    recomputed from hex(encode(text)))."""
    from beehive_data_etl_spark.plans.queries import ORACLES

    return dict(ORACLES)
