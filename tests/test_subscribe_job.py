"""scripts/subscribe_job.py — the decoupled subscriber: bootstrap +
incremental catch-up across separate runs, exactly-once through Spark's
checkpoint + the replica's batch-id dedup, retention pin on the
source."""

import os
import sys

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.sources import table_meta as tm

SCHEMA = (
    "op string, op_sequence long, doc_id string, tokens array<int>, "
    "n_tok int, source string"
)


def _run_job(monkeypatch, src, dst, **env):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import subscribe_job

    monkeypatch.setenv("SUBSCRIBE_ONCE", "1")
    monkeypatch.setenv("SUBSCRIBE_BUCKETS", "4")
    monkeypatch.setenv("SUBSCRIBE_TRIGGER_S", "1")
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    monkeypatch.setattr(sys, "argv", ["subscribe_job.py", src, dst])
    subscribe_job.main()


def _rows(sink):
    return sorted(
        (r["doc_id"], list(r["tokens"]), r["n_tok"], r["source"])
        for r in sink.read_final().collect()
    )


def test_subscribe_bootstrap_catchup_and_idempotence(
    spark, tmp_path, monkeypatch
):
    src_root = str(tmp_path / "src")
    dst_root = str(tmp_path / "dst")
    src = SnapshotSink(spark, src_root, n_buckets=4)
    src.apply_batch(
        spark.createDataFrame(
            [("I", i, f"d{i % 6}", [i], 1, "s") for i in range(24)], SCHEMA
        ),
        "b1",
    )
    # run 1: bootstrap copies the live state
    _run_job(monkeypatch, src_root, dst_root)
    dst = SnapshotSink(spark, dst_root, n_buckets=4)
    assert _rows(dst) == _rows(src)
    # upstream moves on: updates, a delete, a fresh insert
    src.apply_batch(
        spark.createDataFrame(
            [
                ("U", 100, "d0", [9, 9], 2, "s2"),
                ("D", 101, "d1", [], 0, "s"),
                ("I", 102, "fresh", [7], 1, "s3"),
            ],
            SCHEMA,
        ),
        "b2",
    )
    # run 2: same checkpoint catches up incrementally
    _run_job(monkeypatch, src_root, dst_root)
    assert _rows(dst) == _rows(src)
    assert dst.read_final().filter(F.col("doc_id") == "d1").count() == 0
    # retention pin followed the committed cursor on the SOURCE
    assert tm.load_tags(src_root)[f"stream-{os.path.basename(dst_root)}"] >= 1
    # run 3 with nothing new: no replica commits (exactly-once, no dup)
    before = dst.current_snapshot()["version"]
    _run_job(monkeypatch, src_root, dst_root)
    assert dst.current_snapshot()["version"] == before


def test_subscribe_refuses_unstreamable_window(spark, tmp_path, monkeypatch):
    """An upstream purge inside the consumed window surfaces the data
    source's guidance error instead of silently diverging the replica."""
    src_root = str(tmp_path / "src2")
    dst_root = str(tmp_path / "dst2")
    src = SnapshotSink(spark, src_root, n_buckets=4)
    src.apply_batch(
        spark.createDataFrame(
            [("I", i, f"d{i}", [i], 1, "s") for i in range(8)], SCHEMA
        ),
        "b1",
    )
    _run_job(monkeypatch, src_root, dst_root)
    src.apply_batch(
        spark.createDataFrame([("U", 50, "d0", [5], 1, "s")], SCHEMA), "b2"
    )
    # the subscriber's retention tag now exists (eager bootstrap pin),
    # so purge first refuses — the replica-retention interplay
    # purge_keys documents; follow its guidance for this test
    with pytest.raises(RuntimeError, match="tags pin"):
        src.purge_keys(["d3"])
    src.purge_keys(["d3"], ignore_tags=True)
    with pytest.raises(Exception, match="purge"):
        _run_job(monkeypatch, src_root, dst_root)


def test_subscribe_fresh_checkpoint_no_batch_id_collision(
    spark, tmp_path, monkeypatch
):
    """Epoch ids restart at 0 on a fresh checkpoint; the replica batch
    ids are namespaced per checkpoint lineage, so the re-bootstrap
    APPLIES instead of being skipped as a re-delivery (review-found
    silent-divergence bug)."""
    import shutil

    src_root = str(tmp_path / "src3")
    dst_root = str(tmp_path / "dst3")
    ckpt = os.path.join(dst_root, "_subscribe_ckpt")
    src = SnapshotSink(spark, src_root, n_buckets=4)
    src.apply_batch(
        spark.createDataFrame(
            [("I", i, f"d{i}", [i], 1, "s") for i in range(6)], SCHEMA
        ),
        "b1",
    )
    _run_job(monkeypatch, src_root, dst_root)
    dst = SnapshotSink(spark, dst_root, n_buckets=4)
    assert _rows(dst) == _rows(src)
    # upstream change, then LOSE the checkpoint (the documented
    # recovery move) and re-run: epoch 0 again, fresh run id
    src.apply_batch(
        spark.createDataFrame([("U", 50, "d0", [9], 1, "s9")], SCHEMA), "b2"
    )
    shutil.rmtree(ckpt)
    _run_job(monkeypatch, src_root, dst_root)
    assert _rows(dst) == _rows(src)  # re-bootstrap applied, not skipped
    assert dst.read_final().filter(F.col("source") == "s9").count() == 1


def test_stream_bootstrap_pins_to_version(spark, tmp_path):
    """The bootstrap window (FROM=0) eagerly pins its TO version before
    executors read — the longest batch must not race retention
    (review-found: the old guard excluded exactly this batch)."""
    from pyspark.sql import types as T

    from beehive_data_etl_spark.sources.spark_datasource import (
        BeehiveChangesStreamReader,
    )

    root = str(tmp_path / "pinboot")
    src = SnapshotSink(spark, root, n_buckets=2)
    src.apply_batch(
        spark.createDataFrame([("I", 1, "a", [1], 1, "s")], SCHEMA), "b1"
    )
    head = src.current_snapshot()["version"]
    schema = T.StructType.fromDDL(
        "doc_id string, op_sequence bigint, deleted boolean, "
        "tokens array<int>, n_tok int, source string, change_type string"
    )
    r = BeehiveChangesStreamReader(schema, {"path": root, "pin": "boot"})
    r.partitions({"version": 0}, {"version": head})
    assert tm.load_tags(root)["stream-boot"] == head
