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


def test_uncovering_col_range_detected(spark, replayed):
    """scan_where() prunes whole buckets on col_ranges — a recorded
    range that doesn't cover the file's actual values (or a false
    all-NULL marker) skips live rows; fsck must flag both."""
    sink = replayed

    def narrow(snap):
        for entries in snap["buckets"].values():
            for e in entries:
                cr = e.get("col_ranges") or {}
                if cr.get("op_sequence"):
                    e["col_ranges"]["op_sequence"] = [-2, -1]
                    return

    _rewrite_head(sink, narrow)
    rep = fsck(sink)
    assert not rep["ok"]
    assert any("col_ranges[op_sequence]" in e for e in rep["errors"])

    def fake_allnull(snap):
        for entries in snap["buckets"].values():
            for e in entries:
                cr = e.get("col_ranges") or {}
                if cr.get("op_sequence") and cr["op_sequence"] != []:
                    e["col_ranges"]["op_sequence"] = []
                    return

    _rewrite_head(sink, fake_allnull)
    rep = fsck(sink)
    assert not rep["ok"]
    assert any("claims all-NULL" in e for e in rep["errors"])


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
        # hide the move from the metadata tier (legacy entry: no stats
        # — col_ranges included, or ITS coverage check sees the
        # misplaced file's widened column ranges first)
        for entries in snap["buckets"].values():
            for e in entries:
                e["key_range"] = None
                e["file_ranges"] = None
                e["col_ranges"] = None

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


def test_unlisted_file_invisible_to_pruned_reads_detected(spark, replayed):
    """file_ranges is load-bearing: pruned reads enumerate files FROM
    THE DICT, so an on-disk file absent from it is silently invisible —
    the metadata tier must flag it (review finding)."""
    sink = replayed
    snap = sink.current_snapshot()
    src_b, dst_b = [b for b in sorted(snap["buckets"], key=int)
                    if snap["buckets"][b]][:2]
    src_dir = os.path.join(sink.root, snap["buckets"][src_b][0]["path"])
    dst_dir = os.path.join(sink.root, snap["buckets"][dst_b][0]["path"])
    f = glob.glob(os.path.join(src_dir, "*.parquet"))[0]
    shutil.copy(f, os.path.join(dst_dir, "misplaced.parquet"))
    rep = fsck(sink)
    assert not rep["ok"]
    assert any("absent from file_ranges" in e for e in rep["errors"])


def test_narrowed_file_range_detected(spark, replayed):
    sink = replayed

    def narrow_one_file(snap):
        for entries in snap["buckets"].values():
            for e in entries:
                if e.get("file_ranges"):
                    name = next(iter(e["file_ranges"]))
                    e["file_ranges"][name] = ["zzz-none", "zzz-none"]
                    # keep the entry-level range covering so only the
                    # per-file check can catch it
                    return

    _rewrite_head(sink, narrow_one_file)
    rep = fsck(sink)
    assert not rep["ok"]
    assert any("file_ranges[" in e and "does not cover" in e for e in rep["errors"])


def test_ghost_file_in_file_ranges_detected(spark, replayed):
    sink = replayed

    def add_ghost(snap):
        for entries in snap["buckets"].values():
            for e in entries:
                if e.get("file_ranges"):
                    e["file_ranges"]["ghost.parquet"] = ["a", "b"]
                    return

    _rewrite_head(sink, add_ghost)
    rep = fsck(sink)
    assert not rep["ok"]
    assert any("missing files" in e for e in rep["errors"])


def test_tag_at_missing_version_reports_not_crashes(spark, replayed):
    """fsck must RETURN the corruption, never raise on it: a tag whose
    version JSON is gone previously crashed the orphan scan (review
    finding — _referenced_paths re-loads every tagged snapshot)."""
    sink = replayed
    sink.tag("pin", 1)
    os.remove(os.path.join(sink.root, "_snapshots", "v000001.json"))
    rep = fsck(sink)
    assert not rep["ok"]
    assert any("points at missing version" in e for e in rep["errors"])


def test_head_missing_n_buckets_reports_not_crashes(spark, replayed):
    sink = replayed

    def drop_nb(snap):
        del snap["n_buckets"]

    _rewrite_head(sink, drop_nb)
    rep = fsck(sink, deep=True)
    assert not rep["ok"]
    assert any("lacks n_buckets" in e for e in rep["errors"])
    assert rep["deep"]["rows_scanned"] == 0  # deep skipped, not crashed
