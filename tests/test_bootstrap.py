"""Bootstrap (initial snapshot + WAL tail from an offset) — the
Debezium-style pattern that stands up a new replica of a 10^10-row
table in O(state) instead of O(history): seed from a consistent state
export as of op_sequence S, then replay only WAL files whose footer-stat
max op_sequence exceeds S (file-level pruning, LWW absorbs straddle).

Key hazard covered here: OUT-OF-ORDER delivery. A pre-cutoff stale
update displaced into a post-cutoff file must lose LWW against the
tombstone of a pre-cutoff delete — which requires the bootstrap state
to carry tombstones (see replay.bootstrap docstring).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.operators.lww import lww_dedup
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.sources.readers import read_wal
from beehive_data_etl_spark.streaming.replay import (
    bootstrap,
    replay_incremental,
    wal_max_seq,
)
from beehive_data_etl_spark.verify import compare_final, oracle_final_spark

CUTOFF = 1800  # smoke log has 3000 events over 8 files (~375/file)


def _state_as_of(spark, log_dir: str, cutoff: int):
    """Consistent LWW state (incl. tombstones) as of op_sequence <=
    cutoff — what a production source's snapshot-at-LSN exports."""
    log = read_wal(spark, log_dir).filter(F.col("op_sequence") <= cutoff)
    return lww_dedup(log.drop("event_ts", "batch_hint"), "doc_id", "op_sequence")


@pytest.fixture(scope="module")
def bootstrapped(spark, smoke_log, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("boot_sink"))
    sink = SnapshotSink(spark, root, n_buckets=8)
    boot = bootstrap(_state_as_of(spark, smoke_log, CUTOFF), sink, CUTOFF)
    tail = replay_incremental(
        spark, smoke_log, sink, files_per_batch=2, start_after_seq=CUTOFF
    )
    return sink, boot, tail


def test_footer_stats_readable(smoke_log):
    import glob

    files = sorted(glob.glob(os.path.join(smoke_log, "part-*.parquet")))
    tops = [wal_max_seq(f) for f in files]
    assert all(t is not None for t in tops)
    # displacement moves events LATER only, so the per-file max is the
    # file's native band max and the sequence of maxes is increasing
    assert tops == sorted(tops)


def test_bootstrap_tail_matches_full_replay_oracle(spark, smoke_log, bootstrapped):
    sink, _, _ = bootstrapped
    engine = sink.read_state().filter(~F.col("deleted"))
    report = compare_final(engine, oracle_final_spark(spark, smoke_log))
    assert report["ok"], report
    assert report["n"] > 0


def test_tail_actually_pruned_files(bootstrapped):
    _, _, tail = bootstrapped
    pruned = [m for m in tail if m.get("pruned")]
    ran = [m for m in tail if not m.get("skipped")]
    # chunks {0,1} and {2,3} have max seq ~750/~1500 <= 1800 -> pruned
    assert len(pruned) >= 2
    assert ran, "some post-cutoff chunks must still replay"


def test_bootstrap_idempotent_and_refuses_nonempty(spark, smoke_log, bootstrapped):
    sink, _, _ = bootstrapped
    again = bootstrap(_state_as_of(spark, smoke_log, CUTOFF), sink, CUTOFF)
    assert again.get("skipped")
    with pytest.raises(ValueError, match="empty table"):
        bootstrap(
            _state_as_of(spark, smoke_log, CUTOFF), sink, CUTOFF,
            batch_id="bootstrap-other",
        )


def _write_wal_file(path: str, rows: list[tuple]) -> None:
    """rows: (op, op_sequence, doc_id, tokens)."""
    import datetime

    base = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    tbl = pa.table(
        {
            "op": pa.array([r[0] for r in rows], pa.string()),
            "op_sequence": pa.array([r[1] for r in rows], pa.int64()),
            "doc_id": pa.array([r[2] for r in rows], pa.string()),
            "tokens": pa.array([r[3] for r in rows], pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[3]) for r in rows], pa.int32()),
            "source": pa.array(["s0" for _ in rows], pa.string()),
            "event_ts": pa.array(
                [base + datetime.timedelta(seconds=r[1]) for r in rows],
                pa.timestamp("us", tz="UTC"),
            ),
            "batch_hint": pa.array([0 for _ in rows], pa.int32()),
        }
    )
    pq.write_table(tbl, path)


@pytest.fixture()
def ooo_delete_log(tmp_path):
    """doc x: I@1, D@10, then a STALE U@8 displaced into the last file
    (post-cutoff). doc y: live throughout. Cutoff 10 prunes file 0."""
    d = str(tmp_path / "wal")
    os.makedirs(d)
    _write_wal_file(os.path.join(d, "part-00000.parquet"),
                    [("I", 1, "x", [1, 2]), ("I", 2, "y", [3])])
    _write_wal_file(os.path.join(d, "part-00001.parquet"),
                    [("D", 10, "x", []), ("U", 11, "y", [3, 4])])
    _write_wal_file(os.path.join(d, "part-00002.parquet"),
                    [("U", 8, "x", [9, 9]), ("U", 12, "y", [5])])
    return d


def test_no_resurrection_through_bootstrap(spark, ooo_delete_log, tmp_path):
    """The displaced stale update (seq 8 < delete seq 10 <= cutoff) must
    NOT resurrect doc x: the bootstrap tombstone wins LWW."""
    sink = SnapshotSink(spark, str(tmp_path / "sink"), n_buckets=4)
    state = _state_as_of(spark, ooo_delete_log, 10)
    # the export really carries x's tombstone
    assert [r.op for r in state.filter(F.col("doc_id") == "x").collect()] == ["D"]
    bootstrap(state, sink, 10)
    tail = replay_incremental(
        spark, ooo_delete_log, sink, files_per_batch=1, start_after_seq=10
    )
    # file 0 (max seq 2) pruned; file 1 (max 11) straddles and runs —
    # its D@10 no-ops vs the bootstrap tombstone; file 2 runs and
    # re-delivers the stale U@8, which must lose to the tombstone
    assert tail[0].get("pruned")
    assert not tail[1].get("skipped") and not tail[2].get("skipped")
    final = {r.doc_id: list(r.tokens) for r in sink.read_final().collect()}
    assert "x" not in final
    assert final == {"y": [5]}


def test_bootstrap_then_tail_tiny_log(spark, ooo_delete_log, tmp_path):
    """Same log, proper order: bootstrap first, then tail; byte-equal to
    a from-scratch full replay."""
    boot_sink = SnapshotSink(spark, str(tmp_path / "boot"), n_buckets=4)
    bootstrap(_state_as_of(spark, ooo_delete_log, 10), boot_sink, 10)
    replay_incremental(
        spark, ooo_delete_log, boot_sink, files_per_batch=1, start_after_seq=10
    )

    full_sink = SnapshotSink(spark, str(tmp_path / "full"), n_buckets=4)
    replay_incremental(spark, ooo_delete_log, full_sink, files_per_batch=1)

    b = {(r.doc_id, tuple(r.tokens)) for r in boot_sink.read_final().collect()}
    f = {(r.doc_id, tuple(r.tokens)) for r in full_sink.read_final().collect()}
    assert b == f == {("y", (5,))}


def test_replica_migration_to_new_bucket_count(spark, smoke_log, tmp_path):
    """The bootstrap-based alternative to in-place rebucket(): stand up
    a REPLICA with a different bucket count from a live table's state
    export + WAL tail. The export's max op_sequence IS the consistent
    cutoff (it is the last applied event's seq — a superseded event's
    absence is still reflected in the winner's row), and tombstones ride
    the export, so the tail is safe under out-of-order delivery."""
    src = SnapshotSink(spark, str(tmp_path / "src"), n_buckets=8)
    replay_incremental(spark, smoke_log, src, files_per_batch=2, max_batches=2)
    export = src.read_state()  # tombstones included — the full contract
    as_of = export.agg(F.max("op_sequence")).collect()[0][0]

    dst = SnapshotSink(spark, str(tmp_path / "dst"), n_buckets=32)
    bootstrap(export, dst, as_of)
    replay_incremental(
        spark, smoke_log, dst, files_per_batch=2, start_after_seq=as_of
    )
    report = compare_final(
        dst.read_state().filter(~F.col("deleted")),
        oracle_final_spark(spark, smoke_log),
    )
    assert report["ok"], report
    assert dst.current_snapshot()["n_buckets"] == 32
