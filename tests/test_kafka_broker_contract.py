"""Embedded file-backed mock-broker CONTRACT tests for the Kafka
transport (VERDICT r04 item 8) — the offset/rebalance semantics no
sandbox broker can exercise, mirrored on the WAL-tail resume tests'
style: a topic is N append-only partition files with hash key
partitioning (Kafka's producer default), a consumer group is a
file-backed committed-offset map, and the consumer loop applies each
fetched slice to the exactly-once sink under a DETERMINISTIC batch id
derived from (partition, start, end) offsets.

That batch-id discipline is the load-bearing contract: Kafka delivery
is at-least-once across crashes and rebalances (work between apply and
commit is redelivered), and the sink's committed-batch manifest turns
the redelivery into a no-op because the SAME offsets name the SAME
batch id regardless of which consumer fetches them or when. These
tests crash consumers between apply and commit, rebalance partition
ownership mid-stream, and verify final state byte-equal to a
sequential oracle with no double-apply.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.operators.validate import validate_envelope
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.sources.kafka import KAFKA_RECORD_DDL, kafka_envelope

TOPIC = "cdc.tokens"


class FileBroker:
    """Append-only partition files + hash key partitioning — the
    minimal broker model: per-partition offsets are dense and strictly
    increasing, and all records of one key land in one partition
    (Kafka's ordering contract, which the offset-clock mode relies
    on)."""

    def __init__(self, root: str, n_partitions: int = 2) -> None:
        self.root = root
        self.n = n_partitions
        os.makedirs(root, exist_ok=True)
        for p in range(n_partitions):
            open(self._f(p), "a").close()

    def _f(self, p: int) -> str:
        return os.path.join(self.root, f"p{p}.jsonl")

    def partition_for(self, key: str) -> int:
        import hashlib

        # stable across processes (builtin hash() is seed-randomized,
        # which could land every test key in one partition on a bad
        # seed and void the crash test's per-partition assertions)
        return int(hashlib.md5(key.encode()).hexdigest(), 16) % self.n

    def produce(self, key: str, value: dict | None) -> tuple[int, int]:
        p = self.partition_for(key)
        off = self.end_offset(p)
        with open(self._f(p), "a") as fh:
            fh.write(json.dumps({"key": key, "value": value}) + "\n")
        return p, off

    def end_offset(self, p: int) -> int:
        with open(self._f(p)) as fh:
            return sum(1 for _ in fh)

    def fetch(self, p: int, start: int, max_records: int = 1000) -> list[tuple]:
        out = []
        with open(self._f(p)) as fh:
            for off, ln in enumerate(fh):
                if off < start or len(out) >= max_records:
                    continue
                r = json.loads(ln)
                out.append(
                    (
                        r["key"].encode(),
                        json.dumps(r["value"]).encode()
                        if r["value"] is not None
                        else None,
                        TOPIC,
                        p,
                        off,
                        None,
                        0,
                    )
                )
        return out


class Group:
    """File-backed committed offsets — survives consumer restarts like
    Kafka's __consumer_offsets."""

    def __init__(self, root: str) -> None:
        self.path = os.path.join(root, "group.json")

    def committed(self, p: int) -> int:
        if not os.path.exists(self.path):
            return 0
        return json.load(open(self.path)).get(str(p), 0)

    def commit(self, p: int, off: int) -> None:
        d = json.load(open(self.path)) if os.path.exists(self.path) else {}
        d[str(p)] = off
        json.dump(d, open(self.path, "w"))


class _Crash(Exception):
    pass


def consume_once(
    spark,
    broker: FileBroker,
    group: Group,
    sink: SnapshotSink,
    partitions: list[int],
    max_records: int = 1000,
    crash_before_commit: bool = False,
) -> int:
    """One consumer poll cycle over the assigned partitions: fetch from
    the committed offset, normalize + validate + apply as ONE batch per
    partition slice under the offsets-derived batch id, then commit.
    ``crash_before_commit`` kills the consumer after apply (the
    at-least-once window Kafka exposes)."""
    applied = 0
    for p in partitions:
        start = group.committed(p)
        recs = broker.fetch(p, start, max_records)
        if not recs:
            continue
        end = start + len(recs)
        df = spark.createDataFrame(recs, KAFKA_RECORD_DDL)
        env = kafka_envelope(df, allow_offset_sequence=True)
        valid, rejected = validate_envelope(env)
        assert rejected.count() == 0
        # deterministic from the offset range: a redelivery of the same
        # slice — any consumer, any time — is the same batch id
        sink.apply_batch(valid, f"{TOPIC}-p{p}-{start}-{end}")
        applied += len(recs)
        if crash_before_commit:
            raise _Crash(f"crashed after apply, before commit of p{p}")
        group.commit(p, end)
    return applied


def _ev(op, doc, tokens=None):
    out = {"op": op, "doc_id": doc, "source": "kafka"}
    if tokens is not None:
        out["tokens"] = tokens
        out["n_tok"] = len(tokens)
    return out


def _produce_script(broker):
    """A fixed event script over 6 docs; returns the expected final
    (doc -> tokens) state under per-key append order — which the
    offset clock must reproduce because keys are hash-pinned to one
    partition each."""
    script = [
        ("I", "d0", [1]), ("I", "d1", [2]), ("I", "d2", [3]),
        ("U", "d0", [1, 1]), ("I", "d3", [4]), ("D", "d2", None),
        ("U", "d1", [2, 2]), ("I", "d4", [5]), ("U", "d3", [4, 4]),
        ("I", "d5", [6]), ("D", "d4", None), ("U", "d0", [1, 1, 1]),
    ]
    for op, doc, tokens in script:
        broker.produce(doc, _ev(op, doc, tokens))
    final = {}
    for op, doc, tokens in script:
        if op == "D":
            final.pop(doc, None)
        else:
            final[doc] = tuple(tokens)
    return final


def _state(sink):
    return {r.doc_id: tuple(r.tokens) for r in sink.read_final().collect()}


def test_crash_between_apply_and_commit_is_exactly_once(spark, tmp_path):
    broker = FileBroker(str(tmp_path / "broker"), n_partitions=2)
    group = Group(str(tmp_path / "broker"))
    expected = _produce_script(broker)
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)

    with pytest.raises(_Crash):
        consume_once(spark, broker, group, sink, [0, 1], crash_before_commit=True)
    # p0's slice applied but NOT committed; a restarted consumer
    # re-fetches the identical slice -> identical batch id -> skipped
    v_after_crash = sink.current_snapshot()["version"]
    consume_once(spark, broker, group, sink, [0, 1])
    assert _state(sink) == expected
    # the redelivered p0 slice must not have produced a new version
    versions_added = sink.current_snapshot()["version"] - v_after_crash
    assert versions_added == 1  # p1 only; p0 redelivery skipped
    # drained: nothing left to consume
    assert consume_once(spark, broker, group, sink, [0, 1]) == 0


def test_rebalance_resumes_from_committed_offset(spark, tmp_path):
    """Consumer A owns both partitions and consumes the first half;
    the group rebalances (B takes p1) mid-stream; B must resume p1
    exactly at A's committed offset — no gap, no overlap — and the
    final state equals the oracle."""
    broker = FileBroker(str(tmp_path / "broker"), n_partitions=2)
    group = Group(str(tmp_path / "broker"))
    expected = _produce_script(broker)
    half = {p: broker.end_offset(p) // 2 for p in (0, 1)}
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)

    # A consumes the first half of each partition (bounded poll)
    for p in (0, 1):
        consume_once(spark, broker, group, sink, [p], max_records=half[p])
        assert group.committed(p) == half[p]
    # rebalance: A -> p0, B -> p1; both finish their assignment
    consume_once(spark, broker, group, sink, [0])  # A keeps p0
    consume_once(spark, broker, group, sink, [1])  # B resumes p1 at committed
    assert _state(sink) == expected
    for p in (0, 1):
        assert group.committed(p) == broker.end_offset(p)


def test_overlapping_redelivery_after_rebalance_is_noop(spark, tmp_path):
    """The ugly rebalance race: the OLD owner applies a slice it had
    already fetched while the NEW owner re-fetches the same offsets.
    Identical offsets -> identical batch id -> one of the two applies,
    the other skips; state never double-folds."""
    broker = FileBroker(str(tmp_path / "broker"), n_partitions=1)
    group = Group(str(tmp_path / "broker"))
    for i in range(4):
        broker.produce("k", _ev("U" if i else "I", "k", [i]))
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)

    recs = broker.fetch(0, 0)
    df = spark.createDataFrame(recs, KAFKA_RECORD_DDL)
    valid, _ = validate_envelope(kafka_envelope(df, allow_offset_sequence=True))
    bid = f"{TOPIC}-p0-0-{len(recs)}"
    m1 = sink.apply_batch(valid, bid)   # old owner, zombie apply
    m2 = sink.apply_batch(valid, bid)   # new owner, redelivery
    assert not m1.get("skipped") and m2.get("skipped")
    assert _state(sink) == {"k": (3,)}


def test_tombstone_compaction_roundtrip_through_consumer(spark, tmp_path):
    """A compacted topic's NULL-value tombstone flows through the
    consumer loop as a delete at its own offset clock."""
    broker = FileBroker(str(tmp_path / "broker"), n_partitions=1)
    group = Group(str(tmp_path / "broker"))
    broker.produce("gone", _ev("I", "gone", [7]))
    broker.produce("kept", _ev("I", "kept", [8]))
    broker.produce("gone", None)  # compaction tombstone
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    consume_once(spark, broker, group, sink, [0])
    assert _state(sink) == {"kept": (8,)}
