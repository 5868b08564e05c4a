"""Data-source WRITE path (spark_datasource.BeehiveBatchWriter):
``df.write.format("beehive")`` appends envelope batches through the
sink's SHARED publish+commit protocol from a JVM-less Python worker.

Pins:
- a DS-written batch lands byte-equal state to the same batch applied
  through SnapshotSink.apply_batch (two write paths, one protocol);
- exactly-once on batchId (re-running the job commits nothing);
- empty-table bootstrap (+ SnapshotSink.open reads the recorded
  layout); the precomputed JVM ``_bucket`` fast path agrees with the
  Python-hash path;
- only WINNING task attempts' files commit (retried/speculative
  attempts' staged files are pruned at commit);
- subset batches read back with typed NULLs and record their own
  entry schema; full-width batches reuse the head schema string (one
  read-side scan group);
- refusals: overwrite mode, missing batchId, mis-typed envelope,
  unknown/reserved columns, patch tables, non-I/U/D ops;
- abort() cleans staging."""

import os

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.sources.spark_datasource import (
    BeehiveBatchWriter,
    register,
)

SCHEMA = (
    "op string, op_sequence long, doc_id string, tokens array<int>, "
    "n_tok int, source string"
)
B1 = [("I", 100 + i, f"d-{i}", [i], i, "s") for i in range(10)]
B2 = [
    ("U", 200, "d-0", [9, 9], 2, "t"),
    ("D", 201, "d-1", None, None, None),
    ("I", 202, "d-10", [7], 1, "t"),
]


@pytest.fixture(scope="module")
def ds_spark(spark):
    register(spark)
    return spark


def _batch(spark, rows, schema=SCHEMA):
    return spark.createDataFrame(rows, schema)


def _final(sink):
    return sorted(
        (r["doc_id"], r["tokens"], r["n_tok"], r["source"])
        for r in sink.read_final().collect()
    )


def test_ds_write_matches_sink_apply(ds_spark, tmp_path):
    sa = SnapshotSink(ds_spark, str(tmp_path / "a"), n_buckets=4)
    sa.apply_batch(_batch(ds_spark, B1), "b1")
    sa.apply_batch(_batch(ds_spark, B2), "b2")
    sb = SnapshotSink(ds_spark, str(tmp_path / "b"), n_buckets=4)
    sb.apply_batch(_batch(ds_spark, B1), "b1")
    _batch(ds_spark, B2).write.format("beehive").option(
        "batchId", "b2"
    ).mode("append").save(sb.root)
    assert _final(sa) == _final(sb)
    # D rows are REAL tombstones with nulled payload
    dead = sb.read_state().filter(F.col("deleted")).collect()
    assert [(r["doc_id"], r["tokens"]) for r in dead] == [("d-1", None)]
    # exactly-once: same batchId commits nothing
    v = sb.current_snapshot()["version"]
    _batch(ds_spark, B2).write.format("beehive").option(
        "batchId", "b2"
    ).mode("append").save(sb.root)
    assert sb.current_snapshot()["version"] == v
    # full-width batches reuse the head schema string: ONE scan group
    head = sb.current_snapshot()
    schemas = {
        e["schema"] for ents in head["buckets"].values() for e in ents
    }
    assert schemas == {head["schema"]}


def test_ds_write_bootstrap_and_bucket_column(ds_spark, tmp_path):
    root_c = str(tmp_path / "c")
    _batch(ds_spark, B1).write.format("beehive").option(
        "batchId", "boot"
    ).option("nBuckets", "4").mode("append").save(root_c)
    sc_ = SnapshotSink.open(ds_spark, root_c)
    assert sc_.n_buckets == 4 and not sc_.patch
    root_d = str(tmp_path / "d")
    _batch(ds_spark, B1).withColumn(
        "_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(4)).cast("int")
    ).write.format("beehive").option("batchId", "boot").option(
        "nBuckets", "4"
    ).mode("append").save(root_d)
    sd = SnapshotSink.open(ds_spark, root_d)
    assert _final(sc_) == _final(sd)
    # the table is a normal table: the sink can keep writing it
    sc_.apply_batch(_batch(ds_spark, B2), "b2")
    assert ("d-10", [7], 1, "t") in _final(sc_)


def test_ds_write_subset_batch_typed_nulls(ds_spark, tmp_path):
    sink = SnapshotSink(ds_spark, str(tmp_path / "s"), n_buckets=4)
    sink.apply_batch(_batch(ds_spark, B1), "b1")
    narrow = ds_spark.createDataFrame(
        [("I", 300, "d-20", 5)],
        "op string, op_sequence long, doc_id string, n_tok int",
    )
    narrow.write.format("beehive").option("batchId", "n1").mode(
        "append"
    ).save(sink.root)
    rows = {r["doc_id"]: r for r in sink.read_final().collect()}
    assert rows["d-20"]["n_tok"] == 5
    assert rows["d-20"]["tokens"] is None and rows["d-20"]["source"] is None
    # the narrow entry records its OWN schema (per-entry schemas, like
    # pre-evolution deltas); the table schema string is unchanged
    head = sink.current_snapshot()
    schemas = {
        e["schema"] for ents in head["buckets"].values() for e in ents
    }
    assert len(schemas) == 2 and head["schema"] in schemas


def _writer(root, ds_spark, options=None):
    schema = _batch(ds_spark, B2).schema
    opts = {"path": root, "batchId": "unit"}
    opts.update(options or {})
    return BeehiveBatchWriter(root, schema, opts, False)


def _arrow_batches(rows):
    sch = pa.schema(
        [
            ("op", pa.string()),
            ("op_sequence", pa.int64()),
            ("doc_id", pa.string()),
            ("tokens", pa.list_(pa.int32())),
            ("n_tok", pa.int32()),
            ("source", pa.string()),
        ]
    )
    cols = list(zip(*rows))
    return [pa.RecordBatch.from_arrays([pa.array(c, t.type) for c, t in zip(cols, sch)], schema=sch)]


def test_ds_write_prunes_losing_attempts(ds_spark, tmp_path):
    """Simulate a retried task: two write() attempts stage files, only
    one attempt's message reaches commit — the loser's file must not
    be committed."""
    root = str(tmp_path / "t")
    SnapshotSink(ds_spark, root, n_buckets=4).apply_batch(
        _batch(ds_spark, B1), "b1"
    )
    w = _writer(root, ds_spark)
    win = w.write(iter(_arrow_batches(B2)))
    lose = w.write(iter(_arrow_batches(B2)))  # retried attempt, same data
    staged = [
        f
        for d in os.listdir(w.staging)
        for f in os.listdir(os.path.join(w.staging, d))
    ]
    assert len(staged) == len(win.files) + len(lose.files)
    w.commit([win])
    sink = SnapshotSink.open(ds_spark, root)
    # exactly one copy of each event: no duplicate rows from the loser
    raw = sink._read_buckets(sink.current_snapshot(), list(range(4)))
    n_b2 = raw.filter(F.col("op_sequence") >= 200).count()
    assert n_b2 == len(B2)
    assert ("d-10", [7], 1, "t") in _final(sink)
    assert not os.path.isdir(w.staging)


def test_ds_write_refuses_schema_change_between_plan_and_commit(
    ds_spark, tmp_path
):
    """A drop_column landing between a DS write's planning and its
    commit must abort the commit: the staged entries still carry the
    dropped column's bytes, and committing them would plant exactly the
    resurrection trap the physical alter rewrite closes. The guard runs
    INSIDE the publish critical section (review-found TOCTOU in the
    unlocked pre-check version)."""
    root = str(tmp_path / "t")
    sink = SnapshotSink(ds_spark, root, n_buckets=4)
    sink.apply_batch(_batch(ds_spark, B1), "b1")
    w = _writer(root, ds_spark)  # plans against the 4-column schema
    msg = w.write(iter(_arrow_batches(B2)))
    sink.drop_column("source")  # lands before the DS commit
    with pytest.raises(RuntimeError, match="schema changed"):
        w.commit([msg])
    assert not os.path.isdir(w.staging)  # aborted crash-equivalently
    head = sink.current_snapshot()
    assert "source" not in head["schema"]
    assert not any(
        "source" in e["schema"]
        for ents in head["buckets"].values()
        for e in ents
    )


def test_ds_write_abort_cleans_staging(ds_spark, tmp_path):
    root = str(tmp_path / "t")
    SnapshotSink(ds_spark, root, n_buckets=4).apply_batch(
        _batch(ds_spark, B1), "b1"
    )
    w = _writer(root, ds_spark)
    msg = w.write(iter(_arrow_batches(B2)))
    assert msg.files and os.path.isdir(w.staging)
    w.abort([msg])
    assert not os.path.isdir(w.staging)
    v = SnapshotSink.open(ds_spark, root).current_snapshot()["version"]
    assert v == 1  # nothing committed


def test_ds_write_refusals(ds_spark, tmp_path):
    root = str(tmp_path / "t")
    sink = SnapshotSink(ds_spark, root, n_buckets=4)
    sink.apply_batch(_batch(ds_spark, B1), "b1")
    df = _batch(ds_spark, B2)
    with pytest.raises(Exception, match="batchId"):
        df.write.format("beehive").mode("append").save(root)
    with pytest.raises(Exception, match="refetch_apply"):
        df.write.format("beehive").option("batchId", "x").mode(
            "overwrite"
        ).save(root)
    with pytest.raises(Exception, match="cast it"):
        df.withColumn(
            "op_sequence", F.col("op_sequence").cast("int")
        ).write.format("beehive").option("batchId", "x").mode(
            "append"
        ).save(root)
    with pytest.raises(Exception, match="no schema evolution"):
        df.withColumn("extra", F.lit(1)).write.format("beehive").option(
            "batchId", "x"
        ).mode("append").save(root)
    with pytest.raises(Exception, match="no widening"):
        df.withColumn("n_tok", F.col("n_tok").cast("long")).write.format(
            "beehive"
        ).option("batchId", "x").mode("append").save(root)
    with pytest.raises(Exception, match="reserved"):
        df.withColumn("deleted", F.lit(True)).write.format(
            "beehive"
        ).option("batchId", "x").mode("append").save(root)
    # non-I/U/D ops fail the executor-side validation
    with pytest.raises(Exception, match="I/U/D"):
        df.withColumn("op", F.lit("P")).write.format("beehive").option(
            "batchId", "x"
        ).mode("append").save(root)
    v = sink.current_snapshot()["version"]
    assert v == 1  # none of the refused writes committed anything


def test_ds_write_patch_table_refused(ds_spark, tmp_path):
    root = str(tmp_path / "p")
    s = SnapshotSink(ds_spark, root, n_buckets=4, patch=True)
    full = ds_spark.createDataFrame(
        [("I", 100, "d-0", None, [1], 1, "s")],
        "op string, op_sequence long, doc_id string, patch_cols "
        "array<string>, tokens array<int>, n_tok int, source string",
    )
    s.apply_batch(full, "b1")
    with pytest.raises(Exception, match="patch"):
        _batch(ds_spark, B2).write.format("beehive").option(
            "batchId", "x"
        ).mode("append").save(root)


def test_stream_writer_pure_ds_replication(ds_spark, tmp_path):
    """The zero-package-code replication pipeline: changelog stream
    source → beehive stream sink. Converges to the source state across
    a stop/restart (exactly-once per epoch), and a FRESH checkpoint
    reusing the streamId is refused loudly instead of silently deduping
    every replayed epoch against the old lineage's commits."""
    src_root, dst_root = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    src = SnapshotSink(ds_spark, src_root, n_buckets=4)
    src.apply_batch(_batch(ds_spark, B1), "b1")

    from pyspark.errors.exceptions.captured import StreamingQueryException

    def run_once(checkpoint):
        q = (
            ds_spark.readStream.format("beehive_changes")
            .load(src_root)
            .withColumn("op", F.col("change_type"))
            .drop("change_type", "deleted")
            .writeStream.format("beehive")
            .option("checkpointLocation", checkpoint)
            .option("streamId", "rep1")
            .option("nBuckets", "4")
            .trigger(processingTime="500 milliseconds")
            .start(dst_root)
        )
        # a failing stream raises out of processAllAvailable AND out
        # of awaitTermination — surface either as the return value,
        # like q.exception()
        err = None
        try:
            q.processAllAvailable()
        except StreamingQueryException as e:
            err = e
        try:
            q.stop()
            q.awaitTermination(60)
        except StreamingQueryException as e:
            err = err or e
        return err or q.exception()

    assert run_once(ckpt) is None
    dst = SnapshotSink.open(ds_spark, dst_root)
    assert _final(dst) == _final(src)
    src.apply_batch(_batch(ds_spark, B2), "b2")
    assert run_once(ckpt) is None  # restart from the same checkpoint
    assert _final(SnapshotSink.open(ds_spark, dst_root)) == _final(src)
    # fresh checkpoint + reused streamId: epochs rewind to 0 below the
    # recorded high-water — refused, never silently skipped
    err = run_once(str(tmp_path / "ckpt2"))
    assert err is not None and "streamId" in str(err)


def test_open_refusals(ds_spark, tmp_path):
    with pytest.raises(ValueError, match="existing tables"):
        SnapshotSink.open(ds_spark, str(tmp_path / "nope"))
    root = str(tmp_path / "t")
    SnapshotSink(ds_spark, root, n_buckets=4).apply_batch(
        _batch(ds_spark, B1), "b1"
    )
    with pytest.raises(ValueError, match="recorded in the table"):
        SnapshotSink.open(ds_spark, root, n_buckets=8)
