"""Multi-source (multi-master) CDC fan-in (SURVEY.md §2 A1/A3 extension).

A single-source binlog has a total order for free (its LSN /
op_sequence). When SEVERAL independent sources write the same key space
— multi-master replication, region-sharded producers, a migration
running old and new writers side by side — last-writer-wins needs a
total order ACROSS sources. This module provides the standard
commit-timestamp construction (the Cassandra/Spanner-flavored LWW
clock): a composite 64-bit sequence

    composite = ts_millis · 2^(source_bits+local_bits)
              + source_id · 2^local_bits
              + (local_seq mod 2^local_bits)

ordering events by (commit time, source id, per-source sequence)
lexicographically. Properties the merge relies on:

- **Deterministic**: every replica computes the same winner from the
  same events, in any arrival order — the LWW fold is order-insensitive,
  so fan-in is just N independent replays into ONE sink (no
  cross-source coordination, no merge operator, no extra shuffle).
- **Cross-source ties break by source id** (stable, documented), and
  same-source same-millisecond events by the low bits of the local
  sequence. The local tiebreak is exact while a source emits fewer than
  2^local_bits events per millisecond per key — beyond that, two events
  of the SAME source in the SAME millisecond can invert; with the
  defaults that is 32768 events/ms/source, far above any OLTP binlog.
- **Range-guarded in-plan**: a source id outside [0, 2^source_bits) or
  a timestamp outside the packable range fails the job loudly
  (raise_error in the projection — JVM-side, no extra scan) instead of
  silently aliasing two sources onto one clock.

At 10^10 events the cost is one projection per batch — the composite
never shuffles anything the single-source path didn't already shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beehive_data_etl_spark.streaming.replay import CdcSink, replay_incremental

DEFAULT_SOURCE_BITS = 6   # up to 64 concurrent sources
DEFAULT_LOCAL_BITS = 15   # 32768 events/ms/source before tiebreak wrap
# with 6+15 low bits, ts_millis gets 64-1-21 = 42 bits → year 2109


def multimaster_sequence(
    df: DataFrame,
    ts_col: str = "event_ts",
    source_id_col: str = "source_id",
    local_seq_col: str = "op_sequence",
    source_bits: int = DEFAULT_SOURCE_BITS,
    local_bits: int = DEFAULT_LOCAL_BITS,
    out_col: str = "op_sequence",
) -> DataFrame:
    """Replace ``out_col`` with the composite multi-master sequence.
    The input columns: a commit timestamp, a small integer source id,
    and the source's own dense sequence (used only as the low-bit
    tiebreaker — its absolute value does not survive)."""
    ts_bits = 64 - 1 - source_bits - local_bits
    # cast covers TIMESTAMP_NTZ sources (parquet naive timestamps) —
    # interpreted in the session timezone, same as the oracle's epoch_ms
    ts_ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    src = F.col(source_id_col).cast("long")
    local = F.pmod(F.col(local_seq_col).cast("long"), F.lit(1 << local_bits))
    bad = (
        F.col(ts_col).isNull()
        | src.isNull()
        | (src < 0)
        | (src >= F.lit(1 << source_bits))
        | (ts_ms < 0)
        | (ts_ms >= F.lit(1 << ts_bits))
    )
    composite = (
        ts_ms * F.lit(1 << (source_bits + local_bits))
        + src * F.lit(1 << local_bits)
        + local
    )
    guarded = F.when(
        bad,
        F.raise_error(
            F.concat(
                F.lit(
                    f"multimaster_sequence: unpackable ({source_id_col}, "
                    f"{ts_col}) = ("
                ),
                F.coalesce(src.cast("string"), F.lit("null")),
                F.lit(", "),
                F.coalesce(F.col(ts_col).cast("string"), F.lit("null")),
                F.lit(")"),
            )
        ).cast("long"),
    ).otherwise(composite)
    return df.withColumn(out_col, guarded)


def replay_fanin(
    spark: SparkSession,
    log_dirs: dict[int, str],
    sink: CdcSink,
    files_per_batch: int = 1,
    ts_col: str = "event_ts",
    source_bits: int = DEFAULT_SOURCE_BITS,
    local_bits: int = DEFAULT_LOCAL_BITS,
    inflight: int = 1,
) -> dict[int, list[dict]]:
    """Fan N per-source WALs into one sink. Each source replays
    independently (its batch ids namespaced ``src<id>-``), the composite
    sequence stamped in-flight; because the sink's LWW fold is
    order-insensitive and idempotent, ANY interleaving — including
    replaying whole sources one after another, or resuming one source
    after a crash while others are ahead — converges to the same final
    table (pinned by test). Per-source checkpointing/exactly-once is the
    sink's existing committed-id machinery, unchanged."""
    results: dict[int, list[dict]] = {}
    for sid in sorted(log_dirs):

        def _stamp(df: DataFrame, sid: int = sid) -> DataFrame:
            return multimaster_sequence(
                df.withColumn("_src", F.lit(sid)),
                ts_col=ts_col,
                source_id_col="_src",
                source_bits=source_bits,
                local_bits=local_bits,
            ).drop("_src")

        results[sid] = replay_incremental(
            spark,
            log_dirs[sid],
            sink,
            files_per_batch=files_per_batch,
            transform=_stamp,
            inflight=inflight,
            batch_prefix=f"src{sid}",
        )
    return results
