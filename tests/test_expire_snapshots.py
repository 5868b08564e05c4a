"""Snapshot-chain metadata GC (SnapshotSink.expire_snapshots): at
10^10 events the _snapshots/ dir is millions of JSONs nothing else
bounds — vacuum reaps data, trim_committed_batches bounds the dedup
window INSIDE snapshots, this bounds the chain.

Pins: floor-first publish (a crash mid-delete leaves extra files,
never an unrecorded hole); tagged versions keep their JSON and CLAMP
the floor so changelog windows from a tagged cursor stay walkable;
reads below the floor fail loudly naming the floor; fsck treats
below-floor holes as policy and above-floor holes as corruption;
replication keeps working across an expiry; backfill_status stops at
the floor instead of crashing."""

import os

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.sinks.fsck import fsck
from beehive_data_etl_spark.sinks.replicate import Replicator
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink

SCHEMA = (
    "op string, op_sequence long, doc_id string, tokens array<int>, "
    "n_tok int, source string"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _grow(spark, sink, n, seq0, tag=""):
    for i in range(n):
        sink.apply_batch(
            _batch(spark, [("I", seq0 + i, f"d{tag}-{i}", [i], 1, "s")]),
            f"b{tag}-{i}",
        )


@pytest.fixture()
def sink(spark, tmp_path):
    s = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=2,
                     compact_threshold=100)
    _grow(spark, s, 8, 100)
    return s


def _json_versions(sink):
    return sorted(
        int(f[1:-5])
        for f in os.listdir(os.path.join(sink.root, "_snapshots"))
        if f.startswith("v") and f.endswith(".json")
    )


def test_expire_retires_below_floor_and_reads_fail_loudly(spark, sink):
    head_v = sink.current_snapshot()["version"]
    out = sink.expire_snapshots(keep_last=3)
    assert out["expired"] > 0
    floor = out["snapshot_floor"]
    assert floor == head_v - 3 + 1
    vs = _json_versions(sink)
    assert min(vs) == floor
    # state unchanged; floor propagates through later commits
    assert sink.read_final().count() == 8
    _grow(spark, sink, 1, 900, tag="x")
    assert sink.current_snapshot()["snapshot_floor"] == floor
    with pytest.raises(ValueError, match="expired"):
        sink.read_state(version=floor - 1)
    with pytest.raises(ValueError, match="snapshot_floor"):
        sink.snapshot(1)
    # re-running with the same horizon is a no-op
    again = sink.expire_snapshots(keep_last=10_000)
    assert again["expired"] == 0


def test_tags_keep_their_json_and_clamp_the_floor(spark, sink):
    sink.tag("pin", 3)
    out = sink.expire_snapshots(keep_last=1)
    # clamp: floor may not pass min(tags)+1, so v4.. stay walkable
    assert out["snapshot_floor"] == 4
    vs = _json_versions(sink)
    assert 3 in vs and min(v for v in vs if v != 3) == 4
    # the tagged version still time-travels; the window FROM it walks
    assert sink.read_state(version="pin").count() >= 0
    assert sink.read_changes(3, sink.current_snapshot()["version"]).count() > 0
    # dropping the tag unclamps the next expiry (and reaps the pinned
    # JSON's versions below the new floor)
    sink.drop_tag("pin")
    out2 = sink.expire_snapshots(keep_last=2)
    assert out2["snapshot_floor"] > 4
    assert 3 not in _json_versions(sink)


def test_fsck_distinguishes_policy_from_corruption(spark, sink):
    sink.expire_snapshots(keep_last=3)
    rep = fsck(sink)
    assert rep["ok"], rep["errors"]
    assert any("expired below" in i for i in rep["info"])
    # a hole ABOVE the floor is still corruption
    floor = sink.current_snapshot()["snapshot_floor"]
    os.remove(os.path.join(sink.root, "_snapshots", f"v{floor:06d}.json"))
    rep2 = fsck(sink)
    assert not rep2["ok"]
    assert any("missing snapshot JSON" in e for e in rep2["errors"])


def test_replication_survives_expiry(spark, sink, tmp_path):
    dst = SnapshotSink(spark, str(tmp_path / "r"), n_buckets=2,
                       compact_threshold=100)
    rep = Replicator(sink, dst, name="m")
    rep.sync()
    _grow(spark, sink, 3, 500, tag="n")
    # the cursor tag clamps the floor — expiring aggressively cannot
    # strand the replica's next window
    sink.expire_snapshots(keep_last=1)
    assert not rep.sync().get("skipped")
    a = sink.read_final()
    b = dst.read_final()
    cols = sorted(a.columns)
    assert sorted(map(tuple, a.select(*cols).collect())) == \
        sorted(map(tuple, b.select(*cols).collect()))


def test_backfill_status_stops_at_floor(spark, sink):
    sink.backfill({"n_tok2": F.col("n_tok") * 2}, name="double")
    done_before = sink.backfill_status("double")
    assert done_before
    _grow(spark, sink, 2, 700, tag="m")
    sink.expire_snapshots(keep_last=2)
    # the backfill commit is below the floor: forgotten, not a crash
    assert sink.backfill_status("double") == set()


def test_validation(spark, sink):
    with pytest.raises(ValueError, match="keep_last"):
        sink.expire_snapshots(keep_last=0)


def test_sweep_parses_seven_digit_versions(spark, sink):
    """f"v{v:06d}" stops zero-padding at 10^6 — exactly the chain
    length this feature exists for. A 6-digit slice parsed
    v1000005.json as 100000 and reaped the live head (review-found)."""
    import json as _json

    head = sink.current_snapshot()
    big = dict(head)
    big.update({"version": 1000005, "parent": head["version"]})
    sdir = os.path.join(sink.root, "_snapshots")
    with open(os.path.join(sdir, "v1000005.json"), "w") as fh:
        _json.dump(big, fh)
    with open(os.path.join(sdir, "CURRENT"), "w") as fh:
        fh.write("v1000005.json")
    out = sink.expire_snapshots(keep_last=3)
    assert out["snapshot_floor"] == 1000003
    vs = _json_versions(sink)
    assert 1000005 in vs  # the head survived
    assert all(v >= 1000003 for v in vs)
    assert sink.read_final().count() == 8  # state intact


def test_fsck_reports_not_crashes_on_missing_tagged_json(spark, sink):
    sink.tag("pin", 2)
    sink.expire_snapshots(keep_last=2)  # floor clamped to 3, v2 kept
    os.remove(os.path.join(sink.root, "_snapshots", "v000002.json"))
    rep = fsck(sink)  # must report, never raise (fsck contract)
    assert not rep["ok"]
    assert any("points at missing version" in e for e in rep["errors"])


def test_lagging_views_rebuild_after_expiry(spark, sink, tmp_path):
    """Derived views keep their cursor in their own pointer (no source
    tag clamps the floor for them): an expired incremental window must
    fall back to a full rebuild, not fail every refresh forever."""
    from beehive_data_etl_spark.sinks.aggregates import AggregateView
    from beehive_data_etl_spark.sinks.shards import ShardExport
    from beehive_data_etl_spark.sinks.token_index import ValueIndex

    agg = AggregateView(spark, sink, str(tmp_path / "agg"),
                        group_cols=["source"], sum_cols=["n_tok"])
    vix = ValueIndex(spark, sink, str(tmp_path / "vix"),
                     token_col="source", n_buckets=4)
    sh = ShardExport(spark, sink, str(tmp_path / "sh"), k=2)
    for v in (agg, vix, sh):
        v.refresh()
    _grow(spark, sink, 4, 800, tag="w")
    sink.expire_snapshots(keep_last=1)
    assert agg.refresh()["mode"] != "noop"
    assert vix.refresh()["mode"] == "full"
    assert sh.refresh()["mode"] == "full"
    assert vix.verify()["ok"]
    total = agg.read().agg(F.sum("n_rows")).collect()[0][0]
    assert total == sink.read_final().count()
    tok = agg.read().agg(F.sum("n_tok")).collect()[0][0]
    assert tok == sink.read_final().agg(F.sum("n_tok")).collect()[0][0]
