"""Full-refetch (dump-diff) ingestion (operators/refetch.py): a
complete re-scrape becomes the MINIMAL change-event batch, flowing
through the ordinary envelope/sink machinery."""

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.operators.refetch import (
    dump_to_events,
    next_op_sequence,
    refetch_apply,
)
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.streaming.replay import replay_incremental


@pytest.fixture()
def replayed(spark, smoke_log, tmp_path):
    sink = SnapshotSink(spark, str(tmp_path / "sink"), n_buckets=8)
    replay_incremental(spark, smoke_log, sink, files_per_batch=2)
    return sink


def _final_map(df):
    return {
        r.doc_id: (tuple(r.tokens) if r.tokens is not None else None, r.n_tok, r.source)
        for r in df.select("doc_id", "tokens", "n_tok", "source").collect()
    }


def _make_dump(spark, sink, n_update=5, n_delete=3, n_insert=4):
    """Current live image with a few rows updated, deleted, inserted."""
    cur = sink.read_final().select("doc_id", "tokens", "n_tok", "source")
    ids = sorted(r.doc_id for r in cur.select("doc_id").collect())
    upd, dele = set(ids[:n_update]), set(ids[n_update : n_update + n_delete])
    dump = (
        cur.filter(~F.col("doc_id").isin(list(dele)))
        .withColumn(
            "tokens",
            F.when(
                F.col("doc_id").isin(list(upd)), F.array(F.lit(1), F.lit(2))
            ).otherwise(F.col("tokens")),
        )
        .withColumn(
            "n_tok",
            F.when(F.col("doc_id").isin(list(upd)), F.lit(2)).otherwise(
                F.col("n_tok")
            ),
        )
    )
    fresh = sink.spark.createDataFrame(
        [(f"refetch-{i}", [9, 9, 9], 3, "refetch") for i in range(n_insert)],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    return dump.unionByName(fresh), len(upd) + len(dele) + n_insert


def test_refetch_moves_state_to_dump_minimally(spark, replayed):
    sink = replayed
    dump, n_changed = _make_dump(spark, sink)
    seq = next_op_sequence(sink)
    events = dump_to_events(sink, dump, seq)
    assert events.count() == n_changed  # minimal: only real changes
    ops = {r.op for r in events.select("op").distinct().collect()}
    assert ops == {"I", "U", "D"}
    sink.apply_batch(events, "refetch-1")
    assert _final_map(sink.read_final()) == _final_map(dump)


def test_refetch_is_idempotent(spark, replayed):
    sink = replayed
    dump, _ = _make_dump(spark, sink)
    refetch_apply(sink, dump, "refetch-1")
    # same dump again: zero events, state unchanged
    again = dump_to_events(sink, dump, next_op_sequence(sink))
    assert again.count() == 0
    before = _final_map(sink.read_final())
    refetch_apply(sink, dump, "refetch-2")
    assert _final_map(sink.read_final()) == before


def test_refetch_reinserts_over_tombstones(spark, replayed):
    sink = replayed
    key = sink.read_final().select("doc_id").first()[0]
    one = spark.createDataFrame(
        [("D", next_op_sequence(sink), key, None, None, None, None, 0)],
        "op string, op_sequence long, doc_id string, tokens array<int>, "
        "n_tok int, source string, event_ts timestamp, batch_hint int",
    )
    sink.apply_batch(one, "del-one")
    dump = sink.read_final().select("doc_id", "tokens", "n_tok", "source")
    revive = spark.createDataFrame(
        [(key, [5, 5], 2, "revived")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    refetch_apply(sink, dump.unionByName(revive), "refetch-revive")
    row = sink.read_final().filter(F.col("doc_id") == key).collect()
    assert len(row) == 1 and list(row[0].tokens) == [5, 5]


def test_refetch_delete_missing_opt_out(spark, replayed):
    sink = replayed
    n_before = sink.read_final().count()
    partial = sink.read_final().select("doc_id", "tokens", "n_tok", "source").limit(10)
    events = dump_to_events(
        sink, partial, next_op_sequence(sink), delete_missing=False
    )
    assert events.count() == 0  # unchanged subset: nothing to do
    assert sink.read_final().count() == n_before


def test_refetch_bootstraps_empty_table(spark, tmp_path):
    sink = SnapshotSink(spark, str(tmp_path / "fresh"), n_buckets=4)
    dump = spark.createDataFrame(
        [("a", [1], 1, "s"), ("b", [2, 2], 2, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    out = refetch_apply(sink, dump, "refetch-0")
    assert not out.get("skipped", False)
    assert _final_map(sink.read_final()) == _final_map(dump)


def test_refetch_missing_column_refused(spark, replayed):
    sink = replayed
    narrow = sink.read_final().select("doc_id", "tokens", "n_tok")  # no source
    with pytest.raises(ValueError, match="source"):
        dump_to_events(sink, narrow, next_op_sequence(sink))


def test_refetch_evolves_new_columns(spark, replayed):
    sink = replayed
    dump = (
        sink.read_final()
        .select("doc_id", "tokens", "n_tok", "source")
        .withColumn(
            "lang",
            F.when(F.col("doc_id") == F.lit(_first_id(sink)), F.lit("en")),
        )
    )
    events = dump_to_events(sink, dump, next_op_sequence(sink))
    # only the row where the new column is SET re-stamps
    assert events.count() == 1
    sink.apply_batch(events, "refetch-evolve")
    got = sink.read_final()
    assert "lang" in got.columns
    assert got.filter(F.col("lang") == "en").count() == 1


def _first_id(sink):
    return sink.read_final().select("doc_id").orderBy("doc_id").first()[0]


def test_refetch_refuses_duplicate_and_null_keys(spark, replayed):
    """A dump that is not a function doc_id -> payload is refused
    loudly: duplicates oscillate forever (review finding: each run
    re-stamps the other image) and NULL keys would plant NULL-key rows
    the integrity checker classifies as corruption."""
    sink = replayed
    base = sink.read_final().select("doc_id", "tokens", "n_tok", "source")
    two = spark.createDataFrame(
        [("twice", [1], 1, "a"), ("twice", [2], 1, "b")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    with pytest.raises(ValueError, match="unique non-null"):
        dump_to_events(sink, base.unionByName(two), next_op_sequence(sink))
    nullk = spark.createDataFrame(
        [(None, [1], 1, "a")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    with pytest.raises(ValueError, match="unique non-null"):
        dump_to_events(sink, base.unionByName(nullk), next_op_sequence(sink))
