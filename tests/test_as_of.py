"""as_of_version: timestamp time travel. Pins boundary semantics
(latest version AT-or-before ts), ISO-string input, the too-early
refusal, the expire_snapshots floor interaction, and that the resolved
version feeds the normal time-travel readers."""

import time

import pytest

from beehive_data_etl_spark.sinks.snapshot import SnapshotSink


def _apply(spark, sink, bid, lo, hi, seq0):
    sink.apply_batch(
        spark.createDataFrame(
            [("I", seq0 + i, f"d-{i}", [i], i, "s") for i in range(lo, hi)],
            "op string, op_sequence long, doc_id string, tokens array<int>, "
            "n_tok int, source string",
        ),
        bid,
    )


def test_as_of_version(spark, tmp_path):
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    t0 = time.time()
    _apply(spark, sink, "b1", 0, 3, 100)   # v1
    t1 = time.time()
    time.sleep(0.05)
    _apply(spark, sink, "b2", 3, 6, 200)   # v2
    t2 = time.time()
    time.sleep(0.05)
    _apply(spark, sink, "b3", 6, 9, 300)   # v3
    t3 = time.time()

    assert sink.as_of_version(t1) == 1
    assert sink.as_of_version(t2) == 2
    assert sink.as_of_version(t3) == 3
    assert sink.as_of_version(time.time() + 3600) == 3  # future -> head
    with pytest.raises(ValueError, match="oldest readable"):
        sink.as_of_version(t0 - 10)

    # ISO-8601 input (naive = UTC)
    from datetime import datetime, timezone

    iso = datetime.fromtimestamp(t2, tz=timezone.utc).isoformat()
    assert sink.as_of_version(iso) == 2

    # the resolved version drives the normal readers
    assert sink.read_state(version=sink.as_of_version(t1)).count() == 3

    # expire below the floor: an early ts now names the floor
    sink.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="snapshot_floor"):
        sink.as_of_version(t1)
    assert sink.as_of_version(t3) == 3
