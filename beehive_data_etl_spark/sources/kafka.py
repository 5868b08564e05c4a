"""Kafka transport adapter (SURVEY.md §2 A1): the engine's WAL tail
over the transport real CDC almost always rides — a Kafka topic of
Debezium-style JSON change events.

Spark's Kafka source emits a FIXED record schema (key binary, value
binary, topic string, partition int, offset long, timestamp timestamp,
timestampType int); everything here is expressed against that schema,
so the parsing/normalization layer is testable WITHOUT a broker: the
tests drive DataFrames of exactly that shape end-to-end into the sink
(the same simulation-twin pattern as ``sinks/iceberg.py``). The broker
wiring itself (``read_kafka_stream``) is a thin ``readStream.format(
"kafka")`` builder, gated behind a clear error when the Kafka package
isn't on the classpath (it is not in this sandbox).

Normalization semantics (``kafka_envelope``):

- ``value`` JSON-decodes into the engine envelope via ``from_json`` —
  unparseable bytes surface as NULL doc_id/op and flow to the
  quarantine through ``operators.validate``, never killing the stream;
- **log-compaction tombstones**: a NULL value with a non-null key is
  Kafka's native delete — synthesized into an op='D' event for the
  key (UTF-8-decoded), so compacted topics replay correctly;
- **key fallback**: an event whose JSON lacks doc_id takes it from the
  record key — Debezium puts the document key there by contract;
- **op_sequence fallback**: events lacking an explicit sequence use
  the record's partition offset. Sound per key because CDC topics are
  key-partitioned (all events of a doc_id land in ONE partition, where
  offsets are strictly increasing — Kafka's ordering guarantee); it is
  the operator's contract that the topic is key-partitioned and was
  not re-partitioned mid-history, exactly Debezium's own assumption.
  When enabled the offset is the clock for EVERY event (embedded
  sequences are ignored) — mixing two clock domains per key would
  break LWW, so it's one or the other, never coalesced.

Everything is declarative column expressions — one projection, no
UDFs, batch/streaming agnostic (the identical expression runs under
``foreachBatch`` or on a batch read of the same records).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .json_envelope import JSON_ENVELOPE_DDL

KAFKA_RECORD_DDL = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)
_ENV_FIELDS = [
    "op", "op_sequence", "doc_id", "tokens", "n_tok", "source",
    "event_ts", "lang",
]


def kafka_envelope(
    records: DataFrame,
    envelope_ddl: str = JSON_ENVELOPE_DDL,
    allow_offset_sequence: bool = False,
) -> DataFrame:
    """Normalize Kafka records into the typed CDC envelope (see module
    docstring for the tombstone / key / sequence fallback semantics).

    With ``allow_offset_sequence=False`` (default) an event lacking
    op_sequence keeps it NULL and quarantines at validation — the safe
    default. Pass True for topics that carry no producer sequence at
    all: the partition offset becomes the LWW clock for EVERY event
    (requires a key-partitioned topic; see module docstring)."""
    env = records.withColumn(
        "_env", F.from_json(F.col("value").cast("string"), envelope_ddl)
    )
    is_tombstone = F.col("value").isNull() & F.col("key").isNotNull()
    key_str = F.col("key").cast("string")
    op = F.when(is_tombstone, F.lit("D")).otherwise(F.col("_env.op"))
    doc_id = F.coalesce(F.col("_env.doc_id"), key_str)
    seq = (
        F.col("offset")
        if allow_offset_sequence
        else F.col("_env.op_sequence")
    )
    event_ts = F.coalesce(F.col("_env.event_ts"), F.col("timestamp"))
    rest = [
        F.col(f"_env.{f}").alias(f)
        for f in _ENV_FIELDS
        if f not in ("op", "op_sequence", "doc_id", "event_ts")
    ]
    return env.select(
        op.alias("op"),
        seq.alias("op_sequence"),
        doc_id.alias("doc_id"),
        *rest,
        event_ts.alias("event_ts"),
    )


def kafka_source_lag(records: DataFrame) -> DataFrame:
    """Per-partition max offset of a record batch — the consumer-side
    half of lag monitoring (broker-side end offsets come from the
    admin client on a real deployment). One tiny aggregation."""
    return records.groupBy("topic", "partition").agg(
        F.max("offset").alias("max_offset"),
        F.count(F.lit(1)).alias("records"),
    )


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
):
    """The broker wiring: a readStream builder over the Kafka source,
    whose output feeds ``kafka_envelope`` → ``validate_envelope`` →
    ``replay_stream``'s foreachBatch exactly like the file tail. Raises
    with instructions when the spark-sql-kafka package is absent (this
    sandbox has no broker or package — the parsing layer above carries
    the test coverage)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        # fail fast on a truncated topic rather than silently skipping
        .option("failOnDataLoss", "true")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option(
            "maxOffsetsPerTrigger", str(max_offsets_per_trigger)
        )
    try:
        return reader.load()
    except Exception as exc:  # pragma: no cover - needs a broker
        raise RuntimeError(
            "Kafka source unavailable: run with --packages "
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
            "and a reachable broker"
        ) from exc
