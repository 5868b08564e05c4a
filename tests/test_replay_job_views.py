"""The deployment entry point's derived-view wiring: replay_stream's
on_batch_commit hook refreshes the aggregate view and token index at
per-micro-batch cadence, and scripts/replay_job.py enables them from
env (stream AND pipelined modes)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.sinks.aggregates import AggregateView
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.sinks.token_index import TokenIndex
from beehive_data_etl_spark.sources.eventlog import BASE_ENVELOPE_DDL
from beehive_data_etl_spark.streaming.replay import replay_stream


def test_on_batch_commit_refreshes_views_per_epoch(spark, smoke_log, tmp_path):
    root = str(tmp_path / "sink")
    sink = SnapshotSink(spark, root, n_buckets=8)
    agg = AggregateView(spark, sink, str(tmp_path / "agg"), ["source"], ["n_tok"])
    ix = TokenIndex(spark, sink, str(tmp_path / "ix"), n_buckets=8)
    epochs = []

    def hook(epoch_id):
        agg.refresh()
        ix.refresh()
        # the view reflects the sink's snapshot as of THIS epoch
        assert agg.current()["version"] == sink.current_snapshot()["version"]
        epochs.append(epoch_id)

    replay_stream(
        spark,
        smoke_log,
        sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
        schema_ddl=BASE_ENVELOPE_DDL,
        max_files_per_trigger=2,
        watermark=("event_ts", "10 minutes"),
        on_batch_commit=hook,
    )
    assert len(epochs) >= 2  # hook ran once per micro-batch
    assert agg.verify()["ok"]
    assert ix.verify()["ok"]


@pytest.mark.parametrize("mode", ["stream", "pipelined"])
def test_replay_job_env_wiring(spark, smoke_log, tmp_path, monkeypatch, mode):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import replay_job

    target = str(tmp_path / f"sink_{mode}")
    monkeypatch.setattr(sys, "argv", ["replay_job.py", smoke_log, target])
    monkeypatch.setenv("REPLAY_MODE", mode)
    monkeypatch.setenv("REPLAY_N_BUCKETS", "8")
    monkeypatch.setenv("REPLAY_AGG_GROUP", "source")
    monkeypatch.setenv("REPLAY_AGG_SUM", "n_tok")
    monkeypatch.setenv("REPLAY_MINMAX_GROUP", "source")
    monkeypatch.setenv("REPLAY_MINMAX_MIN", "n_tok")
    monkeypatch.setenv("REPLAY_MINMAX_MAX", "n_tok")
    monkeypatch.setenv("REPLAY_DISTINCT_GROUP", "source")
    monkeypatch.setenv("REPLAY_DISTINCT_COLS", "doc_id")
    monkeypatch.setenv("REPLAY_SAMPLE_GROUP", "source")
    monkeypatch.setenv("REPLAY_SAMPLE_K", "8")
    monkeypatch.setenv("REPLAY_HIST_GROUP", "source")
    monkeypatch.setenv("REPLAY_HIST_COL", "n_tok")
    monkeypatch.setenv("REPLAY_HIST_EDGES", "0,8,16,32,64")
    monkeypatch.setenv("REPLAY_HIST_SUM", "n_tok")
    monkeypatch.setenv("REPLAY_INDEX_COL", "tokens")
    monkeypatch.setenv("REPLAY_SHARDS", "4")
    # enrich view: a dim table keyed by the log's source values
    dim_root = str(tmp_path / f"dim_{mode}")
    dim = SnapshotSink(spark, dim_root, n_buckets=2)
    srcs = [
        r[0]
        for r in spark.read.parquet(smoke_log).select("source").distinct().collect()
    ]
    dim.apply_batch(
        spark.createDataFrame(
            [("I", 1 + i, s, f"lic-{s}") for i, s in enumerate(srcs)],
            "op string, op_sequence long, doc_id string, license string",
        ),
        "dim1",
    )
    monkeypatch.setenv("REPLAY_ENRICH_DIM", dim_root)
    monkeypatch.setenv("REPLAY_ENRICH_FK", "source")
    if mode == "pipelined":
        monkeypatch.setenv("REPLAY_FILES_PER_BATCH", "2")
        monkeypatch.setenv("REPLAY_INFLIGHT", "2")
    replay_job.main()

    from beehive_data_etl_spark.sinks.distinct import DistinctView
    from beehive_data_etl_spark.sinks.minmax import MinMaxView
    from beehive_data_etl_spark.sinks.shards import ShardExport

    sink = SnapshotSink(spark, target, n_buckets=8)
    agg = AggregateView(spark, sink, os.path.join(target, "_views", "agg"),
                        ["source"], ["n_tok"])
    mm = MinMaxView(spark, sink, os.path.join(target, "_views", "minmax"),
                    ["source"], min_cols=["n_tok"], max_cols=["n_tok"])
    nd = DistinctView(spark, sink, os.path.join(target, "_views", "distinct"),
                      ["source"], ["doc_id"])
    from beehive_data_etl_spark.sinks.sample import SampleView

    sm = SampleView(spark, sink, os.path.join(target, "_views", "sample"),
                    ["source"], k=8)
    from beehive_data_etl_spark.sinks.histogram import HistogramView

    hg = HistogramView(spark, sink, os.path.join(target, "_views", "histogram"),
                       ["source"], "n_tok", [0.0, 8.0, 16.0, 32.0, 64.0],
                       sum_cols=["n_tok"])
    ix = TokenIndex(spark, sink, os.path.join(target, "_views", "token_index"))
    exp = ShardExport(spark, sink, os.path.join(target, "_views", "shards"), k=4)
    v = sink.current_snapshot()["version"]
    assert agg.current()["version"] == v
    assert mm.current()["version"] == v
    assert nd.current()["version"] == v
    assert sm.current()["version"] == v
    assert hg.current()["version"] == v
    assert ix.current()["version"] == v
    assert exp.current()["version"] == v
    assert agg.verify()["ok"]
    assert mm.verify()["ok"]
    assert nd.verify()["ok"]
    assert sm.verify()["ok"]
    assert hg.verify()["ok"]
    assert ix.verify()["ok"]
    assert exp.verify()["ok"]
    # the aggregate actually aggregates the replayed corpus
    total = agg.read().agg(F.sum("n_rows")).collect()[0][0]
    assert total == sink.read_final().count()
    # the enrich view reflects both cursors and joins exactly
    from beehive_data_etl_spark.sinks.enrich import EnrichView

    ev = EnrichView(
        spark, sink, SnapshotSink.open(spark, str(tmp_path / f"dim_{mode}")),
        os.path.join(target, "_views", "enriched"), fk="source",
    )
    assert ev.current()["fact_version"] == v
    assert ev.verify()["ok"]
    joined = ev.read()
    assert joined.count() == sink.read_final().count()
    assert joined.filter(F.col("dim_license").isNull()).count() == 0


@pytest.mark.parametrize("mode", ["stream", "pipelined"])
def test_replay_job_replication_wiring(spark, smoke_log, tmp_path, monkeypatch, mode):
    """REPLAY_REPLICATE_TO: the job tails its own table's changelog
    into a replica — per-epoch in stream mode, post-replay in
    pipelined mode — and the replica's final state equals the
    source's."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import replay_job

    target = str(tmp_path / f"src_{mode}")
    replica = str(tmp_path / f"dst_{mode}")
    monkeypatch.setattr(sys, "argv", ["replay_job.py", smoke_log, target])
    monkeypatch.setenv("REPLAY_MODE", mode)
    monkeypatch.setenv("REPLAY_N_BUCKETS", "8")
    monkeypatch.setenv("REPLAY_REPLICATE_TO", replica)
    monkeypatch.setenv("REPLAY_REPLICATE_BUCKETS", "4")
    if mode == "pipelined":
        monkeypatch.setenv("REPLAY_FILES_PER_BATCH", "2")
        monkeypatch.setenv("REPLAY_INFLIGHT", "2")
    replay_job.main()

    src = SnapshotSink(spark, target, n_buckets=8)
    dst = SnapshotSink(spark, replica, n_buckets=4)

    def fmap(s):
        return {
            r.doc_id: (r.op_sequence, tuple(r.tokens) if r.tokens is not None else None)
            for r in s.read_state().filter("NOT deleted").collect()
        }

    assert fmap(dst) == fmap(src)
    # the cursor (committed repl batch ids) reached the source head
    from beehive_data_etl_spark.sinks.replicate import Replicator

    assert Replicator(src, dst).cursor() == src.current_snapshot()["version"]


def test_replay_job_filtered_replication_wiring(
    spark, smoke_log, tmp_path, monkeypatch
):
    """REPLAY_REPLICATE_WHERE (JSON conjuncts, scan_where grammar)
    turns the deployed replica into a filtered slice."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import replay_job

    target = str(tmp_path / "src_f")
    replica = str(tmp_path / "dst_f")
    monkeypatch.setattr(sys, "argv", ["replay_job.py", smoke_log, target])
    monkeypatch.setenv("REPLAY_MODE", "pipelined")
    monkeypatch.setenv("REPLAY_N_BUCKETS", "8")
    monkeypatch.setenv("REPLAY_FILES_PER_BATCH", "2")
    monkeypatch.setenv("REPLAY_INFLIGHT", "2")
    monkeypatch.setenv("REPLAY_REPLICATE_TO", replica)
    monkeypatch.setenv("REPLAY_REPLICATE_BUCKETS", "4")
    monkeypatch.setenv("REPLAY_REPLICATE_WHERE", '[["n_tok", ">=", 5]]')
    replay_job.main()

    src = SnapshotSink(spark, target, n_buckets=8)
    dst = SnapshotSink(spark, replica, n_buckets=4)
    want = src.read_final().filter(F.col("n_tok") >= 5)
    got = dst.read_final()
    cols = sorted(want.columns)
    assert sorted(map(tuple, want.select(*cols).collect())) == \
        sorted(map(tuple, got.select(*cols).collect()))
    assert want.count() > 0
