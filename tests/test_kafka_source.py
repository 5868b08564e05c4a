"""Kafka transport adapter (sources/kafka.py): records of Spark's
exact Kafka source schema — driven WITHOUT a broker (the simulation-
twin pattern) through envelope normalization → validation → the
exactly-once sink, byte-equal vs expected state."""

import json

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.operators.validate import validate_envelope
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.sources.kafka import (
    KAFKA_RECORD_DDL,
    kafka_envelope,
    kafka_source_lag,
    read_kafka_stream,
)


def _rec(key, value, partition=0, offset=0):
    return (
        key.encode() if key is not None else None,
        json.dumps(value).encode() if isinstance(value, dict) else value,
        "cdc.tokens",
        partition,
        offset,
        None,
        0,
    )


def _records(spark, rows):
    return spark.createDataFrame(rows, KAFKA_RECORD_DDL)


def _ev(op, seq, doc, tokens=None, source="kafka"):
    out = {"op": op, "op_sequence": seq, "doc_id": doc, "source": source}
    if tokens is not None:
        out["tokens"] = tokens
        out["n_tok"] = len(tokens)
    return out


def test_kafka_records_replay_to_exact_state(spark, tmp_path):
    rows = [
        _rec("a", _ev("I", 1, "a", [1, 2]), offset=0),
        _rec("a", _ev("U", 3, "a", [9, 9, 9]), offset=1),
        _rec("b", _ev("I", 2, "b", [5]), offset=2),
        _rec("c", _ev("I", 4, "c", [7, 7]), offset=3),
        _rec("c", _ev("D", 5, "c"), offset=4),
        # out-of-order + duplicate delivery
        _rec("a", _ev("U", 2, "a", [0]), offset=5),
        _rec("b", _ev("I", 2, "b", [5]), offset=6),
    ]
    env = kafka_envelope(_records(spark, rows))
    valid, rejected = validate_envelope(env)
    assert rejected.count() == 0
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    sink.apply_batch(valid, "kafka-b1")
    got = {
        r.doc_id: tuple(r.tokens)
        for r in sink.read_final().collect()
    }
    assert got == {"a": (9, 9, 9), "b": (5,)}


def test_compaction_tombstone_becomes_delete(spark, tmp_path):
    rows = [
        _rec("a", _ev("I", 1, "a", [1]), offset=0),
        _rec("a", None, offset=1),  # Kafka log-compaction tombstone
    ]
    env = kafka_envelope(_records(spark, rows), allow_offset_sequence=True)
    valid, rejected = validate_envelope(env)
    assert rejected.count() == 0
    rows = valid.orderBy("op_sequence").collect()
    assert rows[-1].op == "D" and rows[-1].doc_id == "a"
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    sink.apply_batch(valid, "b1")
    assert sink.read_final().count() == 0


def test_doc_id_falls_back_to_record_key(spark):
    ev = {"op": "I", "op_sequence": 1, "tokens": [1], "n_tok": 1}
    env = kafka_envelope(_records(spark, [_rec("the-key", ev)]))
    row = env.collect()[0]
    assert row.doc_id == "the-key"


def test_junk_bytes_quarantine_not_crash(spark):
    rows = [
        _rec("a", b"\xff\x00 not json at all", offset=0),
        _rec("b", _ev("I", 1, "b", [1]), offset=1),
    ]
    valid, rejected = validate_envelope(kafka_envelope(_records(spark, rows)))
    assert valid.count() == 1 and rejected.count() == 1
    assert rejected.collect()[0]._reject_reason in ("bad_op", "null_doc_id")


def test_offset_clock_is_all_or_nothing(spark, tmp_path):
    """allow_offset_sequence=True: the offset is the LWW clock for
    EVERY event (embedded sequences ignored — one clock domain)."""
    ev1 = _ev("I", 999, "a", [1])   # embedded seq says 999...
    ev2 = _ev("U", 1, "a", [2])     # ...but offsets order them 0 < 1
    env = kafka_envelope(
        _records(spark, [_rec("a", ev1, offset=0), _rec("a", ev2, offset=1)]),
        allow_offset_sequence=True,
    )
    seqs = sorted(r.op_sequence for r in env.collect())
    assert seqs == [0, 1]
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    sink.apply_batch(env, "b1")
    got = sink.read_final().collect()
    assert len(got) == 1 and list(got[0].tokens) == [2]  # offset 1 wins
    # default mode: missing embedded sequence quarantines instead
    no_seq = {"op": "I", "doc_id": "x", "tokens": [1], "n_tok": 1}
    valid, rejected = validate_envelope(
        kafka_envelope(_records(spark, [_rec("x", no_seq)]))
    )
    assert valid.count() == 0
    assert rejected.collect()[0]._reject_reason == "null_op_sequence"


def test_source_lag_report(spark):
    rows = [
        _rec("a", _ev("I", 1, "a", [1]), partition=0, offset=10),
        _rec("b", _ev("I", 2, "b", [1]), partition=0, offset=11),
        _rec("c", _ev("I", 3, "c", [1]), partition=1, offset=5),
    ]
    lag = {
        (r.topic, r.partition): (r.max_offset, r.records)
        for r in kafka_source_lag(_records(spark, rows)).collect()
    }
    assert lag == {("cdc.tokens", 0): (11, 2), ("cdc.tokens", 1): (5, 1)}


def test_broker_wiring_fails_with_instructions(spark):
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        read_kafka_stream(spark, "localhost:9092", "cdc.tokens")
