"""Time-travel reads + incremental changelog (read_changes): the
read-side surface a CDC table consumer needs — reproduce any committed
snapshot, and tail net row-level changes between two versions instead
of re-scanning the table."""

from pyspark.sql import functions as F

from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.streaming.replay import replay_incremental
from beehive_data_etl_spark.verify import compare_final, oracle_final_spark


def _final_map(df):
    return {
        r.doc_id: (r.op_sequence, tuple(r.tokens) if r.tokens is not None else None)
        for r in df.collect()
    }


def test_time_travel_reproduces_old_state(spark, smoke_log, tmp_path):
    sink = SnapshotSink(spark, str(tmp_path / "sink"), n_buckets=8)
    replay_incremental(spark, smoke_log, sink, files_per_batch=2, max_batches=2)
    v_mid = sink.current_snapshot()["version"]
    mid_state = _final_map(sink.read_state().filter("NOT deleted"))

    replay_incremental(spark, smoke_log, sink, files_per_batch=2)
    assert sink.current_snapshot()["version"] > v_mid
    # time travel back: byte-identical to what read_state returned then
    back = _final_map(sink.read_state(version=v_mid).filter("NOT deleted"))
    assert back == mid_state
    # and the head still matches the full oracle
    state = sink.read_state()
    assert compare_final(
        state.filter(~state.deleted), oracle_final_spark(spark, smoke_log)
    )["ok"]


def test_read_changes_matches_state_diff(spark, smoke_log, tmp_path):
    sink = SnapshotSink(spark, str(tmp_path / "sink"), n_buckets=8)
    replay_incremental(spark, smoke_log, sink, files_per_batch=2, max_batches=2)
    v_a = sink.current_snapshot()["version"]
    a = _final_map(sink.read_state(version=v_a).filter("NOT deleted"))
    replay_incremental(spark, smoke_log, sink, files_per_batch=2)
    v_b = sink.current_snapshot()["version"]
    b = _final_map(sink.read_state(version=v_b).filter("NOT deleted"))

    changes = sink.read_changes(v_a, v_b).collect()
    got = {r.doc_id: r.change_type for r in changes}
    expect = {}
    for k in b:
        if k not in a:
            expect[k] = "I"
        elif b[k][0] > a[k][0]:
            expect[k] = "U"
    for k in a:
        if k not in b:
            expect[k] = "D"
    assert got == expect
    # changed rows carry the NEW payload for I/U
    for r in changes:
        if r.change_type in ("I", "U"):
            assert (r.op_sequence, tuple(r.tokens) if r.tokens is not None else None) == b[r.doc_id]


def test_read_changes_empty_between_same_version(spark, smoke_log, tmp_path):
    sink = SnapshotSink(spark, str(tmp_path / "sink"), n_buckets=8)
    replay_incremental(spark, smoke_log, sink, files_per_batch=4)
    v = sink.current_snapshot()["version"]
    assert sink.read_changes(v, v).count() == 0
