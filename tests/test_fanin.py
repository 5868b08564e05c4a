"""Multi-source (multi-master) CDC fan-in (sources/fanin.py): the
composite commit-timestamp sequence gives N independent writers one
deterministic LWW order — any replay interleaving converges to the same
final table, verified against an independent DuckDB oracle."""

import glob
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.operators.lww import lww_dedup
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.sources.eventlog import generate_event_log
from beehive_data_etl_spark.sources.fanin import (
    multimaster_sequence,
    replay_fanin,
)

FIXTURE_ROOT = "/tmp/beehive_fixtures"
# the composite formula with the module defaults (source_bits=6,
# local_bits=15), mirrored verbatim in the oracle SQL
TS_MUL = 1 << 21
SRC_MUL = 1 << 15
LOCAL_MOD = 1 << 15


@pytest.fixture(scope="module")
def two_logs():
    """Two sources writing the SAME doc key space with different event
    streams — every doc both sources touch is a multi-master conflict."""
    a = generate_event_log(
        os.path.join(FIXTURE_ROOT, "f_fanin_a"), n_docs=150, n_events=1500,
        n_files=5, seed=11,
    )
    b = generate_event_log(
        os.path.join(FIXTURE_ROOT, "f_fanin_b"), n_docs=150, n_events=1500,
        n_files=5, seed=22,
    )
    return {0: a, 1: b}


def oracle_fanin_duckdb(log_dirs: dict[int, str]):
    parts = []
    for sid, d in sorted(log_dirs.items()):
        files = sorted(glob.glob(os.path.join(d, "part-*.parquet")))
        parts.append(
            f"SELECT *, {sid} AS src FROM read_parquet({files!r}, union_by_name=true)"
        )
    union = " UNION ALL BY NAME ".join(parts)
    q = f"""
        WITH u AS ({union}),
        c AS (
          SELECT *, epoch_ms(event_ts) * {TS_MUL} + src * {SRC_MUL}
                    + (op_sequence % {LOCAL_MOD}) AS comp
          FROM u
        )
        SELECT doc_id, comp AS op_sequence, tokens
        FROM c
        QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY comp DESC) = 1
          AND op != 'D'
        ORDER BY doc_id
    """
    return duckdb.sql(q).df()


def final_map(sink):
    return {
        r["doc_id"]: (r["op_sequence"], tuple(r["tokens"]) if r["tokens"] is not None else None)
        for r in sink.read_state().filter(~F.col("deleted")).collect()
    }


def test_fanin_matches_oracle_and_converges_any_order(spark, two_logs, tmp_path):
    # order A: source 0 fully, then source 1
    s1 = SnapshotSink(spark, str(tmp_path / "t1"), n_buckets=4)
    replay_fanin(spark, two_logs, s1, files_per_batch=2)
    # order B: interleaved the other way round (source 1 first)
    s2 = SnapshotSink(spark, str(tmp_path / "t2"), n_buckets=4)
    replay_fanin(spark, {1: two_logs[1]}, s2, files_per_batch=2)
    replay_fanin(spark, {0: two_logs[0]}, s2, files_per_batch=2)
    m1, m2 = final_map(s1), final_map(s2)
    assert m1 == m2  # convergence: arrival order is irrelevant
    ora = oracle_fanin_duckdb(two_logs)
    assert set(m1) == set(ora["doc_id"])
    by_doc = {
        d: (s, tuple(t)) for d, s, t in
        zip(ora["doc_id"], ora["op_sequence"], ora["tokens"])
    }
    assert m1 == by_doc  # byte-equal tokens + winning composite seq


def test_fanin_resume_one_source_behind(spark, two_logs, tmp_path):
    """One source crashes mid-replay while the other finishes — the
    resumed fan-in skips committed batches and still converges."""
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    replay_fanin(spark, {0: two_logs[0]}, sink, files_per_batch=2)
    from beehive_data_etl_spark.streaming.replay import replay_incremental
    from beehive_data_etl_spark.sources.fanin import multimaster_sequence

    def stamp1(df):
        return multimaster_sequence(
            df.withColumn("_src", F.lit(1)), source_id_col="_src"
        ).drop("_src")

    replay_incremental(
        spark, two_logs[1], sink, files_per_batch=2, transform=stamp1,
        batch_prefix="src1", max_batches=1,  # crash after one batch
    )
    out = replay_fanin(spark, two_logs, sink, files_per_batch=2)
    assert all(r.get("skipped") for r in out[0])  # source 0 all committed
    assert out[1][0].get("skipped") and not out[1][1].get("skipped")
    ref = SnapshotSink(spark, str(tmp_path / "ref"), n_buckets=4)
    replay_fanin(spark, two_logs, ref, files_per_batch=2)
    assert final_map(sink) == final_map(ref)


def test_tie_on_timestamp_breaks_by_source_id(spark):
    df = spark.createDataFrame(
        [
            ("U", 7, "doc-x", [1, 1], "2026-01-01 00:00:01"),
            ("U", 7, "doc-x", [2, 2], "2026-01-01 00:00:01"),
        ],
        "op string, op_sequence long, doc_id string, tokens array<int>, event_ts string",
    ).withColumn("event_ts", F.col("event_ts").cast("timestamp"))
    df = df.withColumn(
        "source_id", F.when(F.col("tokens")[0] == 2, 1).otherwise(0)
    )
    stamped = multimaster_sequence(df)
    win = lww_dedup(stamped.drop("event_ts", "source_id"), "doc_id", "op_sequence")
    assert win.collect()[0]["tokens"] == [2, 2]  # higher source id wins


def test_multimaster_range_guard_raises(spark):
    df = spark.createDataFrame(
        [("U", 1, "d", 64, "2026-01-01 00:00:01")],
        "op string, op_sequence long, doc_id string, source_id int, event_ts string",
    ).withColumn("event_ts", F.col("event_ts").cast("timestamp"))
    with pytest.raises(Exception, match="unpackable"):
        multimaster_sequence(df).collect()
