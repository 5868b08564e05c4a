"""Table integrity checker (sinks/fsck.py): metadata tier (snapshot
chain, referenced dirs, key-range coverage) and deep tier (bucket
assignment, NULL keys/seqs) — each corruption class planted and
caught."""

import glob
import json
import os
import shutil

import pytest

from beehive_data_etl_spark.sinks.fsck import fsck
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.streaming.replay import replay_incremental


@pytest.fixture()
def replayed(spark, smoke_log, tmp_path):
    sink = SnapshotSink(spark, str(tmp_path / "sink"), n_buckets=8)
    replay_incremental(spark, smoke_log, sink, files_per_batch=2)
    return sink


def _head_path(sink):
    v = sink.current_snapshot()["version"]
    return os.path.join(sink.root, "_snapshots", f"v{v:06d}.json")


def _rewrite_head(sink, mutate):
    with open(_head_path(sink)) as fh:
        snap = json.load(fh)
    mutate(snap)
    with open(_head_path(sink), "w") as fh:
        json.dump(snap, fh)


def test_healthy_table_passes_both_tiers(spark, replayed):
    rep = fsck(replayed, deep=True)
    assert rep["ok"], rep
    assert rep["errors"] == [] and rep["deep"]["errors"] == []
    assert rep["files_checked"] > 0
    assert rep["deep"]["rows_scanned"] > 0


def test_missing_data_dir_detected(spark, replayed):
    sink = replayed
    entry = next(iter(sink.current_snapshot()["buckets"].values()))[0]
    shutil.rmtree(os.path.join(sink.root, entry["path"]))
    rep = fsck(sink)
    assert not rep["ok"]
    assert any("missing dir" in e for e in rep["errors"])


def test_uncovering_key_range_detected(spark, replayed):
    sink = replayed

    def narrow(snap):
        for entries in snap["buckets"].values():
            for e in entries:
                if e.get("key_range") and e["key_range"][0] is not None:
                    # claim the file holds only one impossible key —
                    # a pruned read would skip every real row
                    e["key_range"] = ["zzz-none", "zzz-none"]
                    return

    _rewrite_head(sink, narrow)
    rep = fsck(sink)
    assert not rep["ok"]
    assert any("does not cover" in e for e in rep["errors"])


def test_broken_snapshot_chain_detected(spark, replayed):
    sink = replayed
    os.remove(os.path.join(sink.root, "_snapshots", "v000001.json"))
    rep = fsck(sink)
    assert not rep["ok"]
    assert any("missing snapshot JSON" in e for e in rep["errors"])


def test_deep_catches_misplaced_bucket_file(spark, replayed):
    sink = replayed
    snap = sink.current_snapshot()
    # two non-empty buckets with different key populations
    src_b, dst_b = [b for b in sorted(snap["buckets"], key=int)
                    if snap["buckets"][b]][:2]
    src_dir = os.path.join(sink.root, snap["buckets"][src_b][0]["path"])
    dst_dir = os.path.join(sink.root, snap["buckets"][dst_b][0]["path"])
    f = glob.glob(os.path.join(src_dir, "*.parquet"))[0]
    shutil.copy(f, os.path.join(dst_dir, "misplaced.parquet"))

    def forget_ranges(snap):
        # hide the move from the metadata tier (legacy entry: no stats)
        for entries in snap["buckets"].values():
            for e in entries:
                e["key_range"] = None
                e["file_ranges"] = None

    _rewrite_head(sink, forget_ranges)
    shallow = fsck(sink)
    assert shallow["ok"]  # metadata tier cannot see it
    rep = fsck(sink, deep=True)
    assert not rep["ok"]
    assert any("hash outside their bucket dir" in e for e in rep["deep"]["errors"])


def test_fsck_requires_a_snapshot(spark, tmp_path):
    sink = SnapshotSink(spark, str(tmp_path / "empty"), n_buckets=4)
    with pytest.raises(ValueError, match="no snapshot"):
        fsck(sink)
