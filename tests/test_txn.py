"""Multi-table transactional CDC (streaming/txn.py): release-on-commit
semantics, atomic cross-table consistent points, crash re-drive, and
the retention/quarantine edges — each scenario vs hand-built batches or
the deterministic txn log + independent DuckDB oracle."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.sources.eventlog import TXN_ENVELOPE_DDL, generate_txn_log
from beehive_data_etl_spark.streaming.replay import replay_incremental
from beehive_data_etl_spark.streaming.txn import TxnCoordinator
from beehive_data_etl_spark.verify import oracle_txn_final_duckdb

FIXTURE_ROOT = "/tmp/beehive_fixtures"


@pytest.fixture(scope="module")
def txn_log():
    return generate_txn_log(os.path.join(FIXTURE_ROOT, "f_txn"))


def mk_coord(spark, tmp_path, tables=("docs", "meta"), **kw):
    sinks = {
        t: SnapshotSink(spark, os.path.join(str(tmp_path), "tables", t), n_buckets=2)
        for t in tables
    }
    return TxnCoordinator(spark, os.path.join(str(tmp_path), "coord"), sinks, **kw), sinks


def ev(spark, rows):
    """rows: (op, seq, doc, table, txn, txn_events) — payload derived."""
    data = [
        (
            op,
            seq,
            doc,
            None if op in ("D", "C", "R") else [seq, seq + 1],
            None if op in ("D", "C", "R") else 2,
            "src",
            None,
            0,
            table,
            txn,
            expect,
        )
        for (op, seq, doc, table, txn, expect) in rows
    ]
    return spark.createDataFrame(data, TXN_ENVELOPE_DDL)


def live_docs(sink):
    if sink.current_snapshot() is None:
        return {}
    return {r["doc_id"]: r["tokens"] for r in sink.read_final().collect()}


# ---------------------------------------------------------------- oracle


def test_txn_replay_matches_oracle(spark, txn_log, tmp_path):
    coord, sinks = mk_coord(spark, tmp_path)
    replay_incremental(spark, txn_log, coord, files_per_batch=2)
    for table in ("docs", "meta"):
        eng = (
            sinks[table]
            .read_state()
            .filter(~F.col("deleted"))
            .orderBy("doc_id")
            .select("doc_id", "op_sequence", "tokens", "n_tok", "source")
            .toPandas()
        )
        ora = oracle_txn_final_duckdb(txn_log, table)[
            ["doc_id", "op_sequence", "tokens", "n_tok", "source"]
        ]
        assert list(eng["doc_id"]) == list(ora["doc_id"])
        assert list(eng["op_sequence"]) == list(ora["op_sequence"])
        # byte-equality of token arrays (the north-rule invariant)
        assert all(
            list(a) == list(b) for a, b in zip(eng["tokens"], ora["tokens"])
        )
    # consistent point reflects the final state of BOTH tables
    point = coord.latest_point()
    for table in ("docs", "meta"):
        at_point = coord.consistent_read(table).count()
        assert at_point == sinks[table].read_final().count()
    assert point["versions"]["docs"] is not None


def test_txn_replay_is_batch_split_invariant(spark, txn_log, tmp_path):
    """files_per_batch=1 vs =5 produce identical final tables — txn
    release must not depend on where micro-batch boundaries fall."""
    finals = []
    for i, fpb in enumerate((1, 5)):
        coord, sinks = mk_coord(spark, tmp_path / f"s{i}")
        replay_incremental(spark, txn_log, coord, files_per_batch=fpb)
        finals.append(
            sorted(
                (r["doc_id"], r["op_sequence"], tuple(r["tokens"]))
                for r in sinks["docs"]
                .read_state()
                .filter(~F.col("deleted"))
                .collect()
            )
        )
    assert finals[0] == finals[1]


# ------------------------------------------------------- release edges


def test_txn_spanning_batches_held_then_released(spark, tmp_path):
    coord, sinks = mk_coord(spark, tmp_path)
    # txn 1: two events; only the first + marker arrive in batch 1
    b1 = ev(spark, [("I", 1, "a", "docs", 1, None), ("C", 100, None, None, 1, 2)])
    r1 = coord.apply_batch(b1, "b1")
    assert r1["released_events"] == 0 and r1.get("pending_events") == 1
    assert live_docs(sinks["docs"]) == {}
    stuck = coord.stuck_txns()
    assert stuck["awaiting_events"] == {1: {"have": 1, "expected": 2}}
    b2 = ev(spark, [("I", 2, "b", "meta", 1, None)])
    r2 = coord.apply_batch(b2, "b2")
    assert r2["txns_completed"] == 1 and r2["released_events"] == 2
    assert set(live_docs(sinks["docs"])) == {"a"}
    assert set(live_docs(sinks["meta"])) == {"b"}


def test_marker_before_events(spark, tmp_path):
    coord, sinks = mk_coord(spark, tmp_path)
    coord.apply_batch(ev(spark, [("C", 100, None, None, 7, 1)]), "b1")
    assert coord.stuck_txns()["awaiting_events"] == {7: {"have": 0, "expected": 1}}
    r = coord.apply_batch(ev(spark, [("I", 1, "x", "docs", 7, None)]), "b2")
    assert r["txns_completed"] == 1
    assert set(live_docs(sinks["docs"])) == {"x"}


def test_rollback_discards_even_late_events(spark, tmp_path):
    coord, sinks = mk_coord(spark, tmp_path)
    r1 = coord.apply_batch(
        ev(spark, [("I", 1, "a", "docs", 3, None), ("R", 100, None, None, 3, None)]),
        "b1",
    )
    assert r1["aborted_events"] == 1
    # a late commit marker and a straggler event of the aborted txn
    r = coord.apply_batch(
        ev(spark, [("I", 2, "b", "docs", 3, None), ("C", 101, None, None, 3, 2)]),
        "b2",
    )
    assert live_docs(sinks["docs"]) == {}
    assert r["aborted_events"] == 1
    assert 3 in coord.stuck_txns()["aborted"]


def test_overfull_txn_quarantined(spark, tmp_path):
    coord, sinks = mk_coord(spark, tmp_path)
    r = coord.apply_batch(
        ev(
            spark,
            [
                ("I", 1, "a", "docs", 5, None),
                ("I", 2, "b", "docs", 5, None),
                ("C", 100, None, None, 5, 1),
            ],
        ),
        "b1",
    )
    assert r["txns_overfull"] == 1 and r["released_events"] == 0
    assert live_docs(sinks["docs"]) == {}
    assert coord.stuck_txns()["quarantined"] == [5]
    # a re-delivered event of a quarantined txn never applies either
    coord.apply_batch(ev(spark, [("I", 1, "a", "docs", 5, None)]), "b2")
    assert live_docs(sinks["docs"]) == {}


def test_conflicting_commit_markers_quarantine(spark, tmp_path):
    coord, sinks = mk_coord(spark, tmp_path)
    coord.apply_batch(ev(spark, [("C", 100, None, None, 9, 2)]), "b1")
    r = coord.apply_batch(
        ev(spark, [("C", 101, None, None, 9, 3), ("I", 1, "a", "docs", 9, None)]),
        "b2",
    )
    assert r["released_events"] == 0
    assert 9 in coord.stuck_txns()["quarantined"]


def test_duplicate_events_collapse_in_count(spark, tmp_path):
    """Re-delivered duplicates (same op_sequence) must not fake
    completeness or overfullness."""
    coord, sinks = mk_coord(spark, tmp_path)
    r1 = coord.apply_batch(
        ev(
            spark,
            [
                ("I", 1, "a", "docs", 2, None),
                ("I", 1, "a", "docs", 2, None),  # verbatim duplicate
                ("C", 100, None, None, 2, 2),
            ],
        ),
        "b1",
    )
    assert r1["txns_completed"] == 0  # still waiting for the 2nd event
    r2 = coord.apply_batch(ev(spark, [("U", 2, "a", "docs", 2, None)]), "b2")
    assert r2["txns_completed"] == 1
    assert live_docs(sinks["docs"])["a"] == [2, 3]


def test_null_txn_rows_release_immediately(spark, tmp_path):
    coord, sinks = mk_coord(spark, tmp_path)
    r = coord.apply_batch(ev(spark, [("I", 1, "a", "docs", None, None)]), "b1")
    assert r["released_events"] == 1
    assert set(live_docs(sinks["docs"])) == {"a"}


def test_empty_txn_completes_trivially(spark, tmp_path):
    coord, _ = mk_coord(spark, tmp_path)
    r = coord.apply_batch(ev(spark, [("C", 100, None, None, 4, 0)]), "b1")
    assert r["txns_completed"] == 1
    assert coord.stuck_txns()["awaiting_events"] == {}


def test_unterminated_txn_stays_pending(spark, tmp_path):
    coord, sinks = mk_coord(spark, tmp_path)
    coord.apply_batch(ev(spark, [("I", 1, "a", "docs", 8, None)]), "b1")
    coord.apply_batch(ev(spark, [("I", 2, "b", "docs", 99, None), ("C", 100, None, None, 99, 1)]), "b2")
    assert set(live_docs(sinks["docs"])) == {"b"}
    assert coord.stuck_txns()["awaiting_marker"] == {8: 1}


# ------------------------------------------------- crash / exactly-once


def test_redelivered_batch_skips(spark, tmp_path):
    coord, sinks = mk_coord(spark, tmp_path)
    b = ev(spark, [("I", 1, "a", "docs", None, None)])
    coord.apply_batch(b, "b1")
    r = coord.apply_batch(b, "b1")
    assert r["skipped"] and r["reason"] == "already committed"
    assert coord.committed("b1")


class _FailingSink:
    """Wraps a SnapshotSink; raises on apply_batch until disarmed."""

    def __init__(self, inner):
        self.inner = inner
        self.armed = True

    def apply_batch(self, df, batch_id):
        if self.armed:
            raise RuntimeError("injected crash before this table's commit")
        return self.inner.apply_batch(df, batch_id)

    def __getattr__(self, name):
        return getattr(self.inner, name)


def test_consistent_read_never_torn_across_tables(spark, tmp_path):
    coord, sinks = mk_coord(spark, tmp_path)
    # seed both tables at point 0
    coord.apply_batch(
        ev(
            spark,
            [
                ("I", 1, "a", "docs", None, None),
                ("I", 2, "m", "meta", None, None),
            ],
        ),
        "b1",
    )
    v_docs = coord.latest_point()["versions"]["docs"]
    # batch 2 touches BOTH tables within one txn; crash 'meta' mid-apply
    failing = _FailingSink(coord.sinks["meta"])
    coord.sinks["meta"] = failing
    b2 = ev(
        spark,
        [
            ("U", 10, "a", "docs", 1, None),
            ("U", 11, "m", "meta", 1, None),
            ("C", 100, None, None, 1, 2),
        ],
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        coord.apply_batch(b2, "b2")
    # docs' SINK already has the new row (tables apply in order)…
    assert live_docs(sinks["docs"])["a"] == [10, 11]
    # …but the consistent view is still the pre-batch cut: no torn txn
    point = coord.latest_point()
    assert point["batch_id"] == "b1"
    assert point["versions"]["docs"] == v_docs
    assert {
        r["doc_id"]: r["tokens"] for r in coord.consistent_read("docs").collect()
    }["a"] == [1, 2]
    # recover and RE-DRIVE the same batch: docs' sink skips (manifest),
    # meta applies, the point advances atomically to the full txn
    failing.armed = False
    r = coord.apply_batch(b2, "b2")
    assert r["applied"]["docs"].get("skipped"), r["applied"]["docs"]
    point = coord.latest_point()
    assert point["batch_id"] == "b2"
    assert {
        r["doc_id"]: r["tokens"] for r in coord.consistent_read("meta").collect()
    }["m"] == [11, 12]


def test_resume_after_head_flip_before_point(spark, tmp_path):
    """Crash between the HEAD flip and the point publish: re-drive only
    re-publishes the point (every table already committed)."""
    coord, sinks = mk_coord(spark, tmp_path)
    coord.apply_batch(ev(spark, [("I", 1, "a", "docs", None, None)]), "b1")
    point_file = [
        f for f in os.listdir(os.path.join(coord.root, "points")) if f.endswith(".json")
    ][0]
    os.remove(os.path.join(coord.root, "points", point_file))
    # the crash killed the process — the re-driving coordinator is a
    # FRESH instance (the committed cache is per-lifetime by design)
    coord = TxnCoordinator(spark, coord.root, sinks)
    assert not coord.committed("b1")
    r = coord.apply_batch(ev(spark, [("I", 1, "a", "docs", None, None)]), "b1")
    assert r.get("resumed") is True
    assert coord.latest_point()["batch_id"] == "b1"
    assert set(live_docs(sinks["docs"])) == {"a"}


def test_floor_compaction_treats_old_duplicates_as_released(spark, tmp_path):
    coord, sinks = mk_coord(spark, tmp_path, released_retain=1)
    coord.apply_batch(
        ev(
            spark,
            [
                ("I", 1, "a", "docs", 1, None),
                ("C", 100, None, None, 1, 1),
                ("I", 2, "b", "docs", 2, None),
                ("C", 101, None, None, 2, 1),
            ],
        ),
        "b1",
    )
    # retention kept only txn 2; txn 1 fell below the floor
    # a straggler duplicate of txn 1 re-arrives → released, not pending
    r = coord.apply_batch(ev(spark, [("I", 1, "a", "docs", 1, None)]), "b2")
    assert r["released_events"] == 1 and r.get("pending_events", 0) == 0
    # idempotent at the sink: same op_sequence, LWW absorbs it
    assert live_docs(sinks["docs"])["a"] == [1, 2]


def test_vacuum_stages_keeps_live_pending(spark, tmp_path):
    coord, sinks = mk_coord(spark, tmp_path)
    coord.apply_batch(ev(spark, [("I", 1, "a", "docs", 1, None)]), "b1")  # pending
    coord.apply_batch(ev(spark, [("C", 100, None, None, 1, 1)]), "b2")  # releases
    out = coord.vacuum_stages()
    assert out["removed"] == ["v-b1"] and out["kept"] == "v-b2"
    # the coordinator still works from the surviving stage
    coord.apply_batch(ev(spark, [("I", 5, "z", "docs", None, None)]), "b3")
    assert set(live_docs(sinks["docs"])) == {"a", "z"}


# --------------------------------------------------------- deployment


@pytest.mark.parametrize("mode", ["stream", "pipelined"])
def test_replay_job_txn_wiring(spark, txn_log, tmp_path, monkeypatch, mode):
    """REPLAY_TXN=1: the spark-submit entry point stands up per-table
    sinks + coordinator from env and the deployed final state is
    byte-equal to the independent oracle in BOTH modes."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import replay_job

    target = str(tmp_path / f"txn_{mode}")
    monkeypatch.setattr(sys, "argv", ["replay_job.py", txn_log, target])
    monkeypatch.setenv("REPLAY_TXN", "1")
    monkeypatch.setenv("REPLAY_MODE", mode)
    monkeypatch.setenv("REPLAY_N_BUCKETS", "4")
    if mode == "pipelined":
        monkeypatch.setenv("REPLAY_FILES_PER_BATCH", "3")
    replay_job.main()

    sinks = {
        t: SnapshotSink(spark, os.path.join(target, "tables", t), n_buckets=4)
        for t in ("docs", "meta")
    }
    coord = TxnCoordinator(spark, os.path.join(target, "coord"), sinks)
    assert coord.latest_point() is not None
    for t in ("docs", "meta"):
        eng = (
            sinks[t]
            .read_state()
            .filter(~F.col("deleted"))
            .orderBy("doc_id")
            .select("doc_id", "op_sequence", "tokens")
            .toPandas()
        )
        ora = oracle_txn_final_duckdb(txn_log, t)
        assert list(eng["doc_id"]) == list(ora["doc_id"])
        assert all(list(a) == list(b) for a, b in zip(eng["tokens"], ora["tokens"]))


# ------------------------------------------------- review-pass regressions


def test_zero_expected_marker_with_data_quarantines(spark, tmp_path):
    """A corrupt expected=0 marker whose txn HAS data must quarantine —
    and never emit a second 'released' copy of the same events."""
    coord, sinks = mk_coord(spark, tmp_path)
    r = coord.apply_batch(
        ev(
            spark,
            [
                ("I", 1, "a", "docs", 6, None),
                ("C", 100, None, None, 6, 0),
            ],
        ),
        "b1",
    )
    assert r["txns_completed"] == 0 and r["txns_overfull"] == 1
    assert r["released_events"] == 0 and r["quarantined_events"] == 1
    assert live_docs(sinks["docs"]) == {}
    assert 6 in coord.stuck_txns()["quarantined"]


def test_floor_never_passes_open_txn(spark, tmp_path):
    """Floor compaction must not release a torn partial transaction:
    the floor stays below every open txn (pending or awaiting events),
    however many later txns release."""
    coord, sinks = mk_coord(spark, tmp_path, released_retain=1)
    coord.apply_batch(
        ev(
            spark,
            [
                ("I", 1, "a", "docs", 1, None),  # txn 1 OPEN (no marker)
                ("I", 2, "b", "docs", 2, None),
                ("C", 100, None, None, 2, 1),
                ("I", 3, "c", "docs", 3, None),
                ("C", 101, None, None, 3, 1),
            ],
        ),
        "b1",
    )
    assert set(live_docs(sinks["docs"])) == {"b", "c"}
    # txn 1 must still be pending, NOT floor-released as a partial txn
    assert coord.stuck_txns()["awaiting_marker"] == {1: 1}
    r = coord.apply_batch(ev(spark, [("C", 102, None, None, 1, 1)]), "b2")
    assert r["txns_completed"] == 1
    assert set(live_docs(sinks["docs"])) == {"a", "b", "c"}


def test_floor_trimmed_marker_redelivery_ignored(spark, tmp_path):
    """A re-delivered commit marker of a floor-trimmed txn must not
    re-enter `expected` (it could never complete — its events are gone
    from the spill)."""
    coord, _ = mk_coord(spark, tmp_path, released_retain=1)
    coord.apply_batch(
        ev(
            spark,
            [
                ("I", 1, "a", "docs", 1, None),
                ("C", 100, None, None, 1, 1),
                ("I", 2, "b", "docs", 2, None),
                ("C", 101, None, None, 2, 1),
            ],
        ),
        "b1",
    )
    coord.apply_batch(ev(spark, [("C", 100, None, None, 1, 1)]), "b2")
    assert coord.stuck_txns()["awaiting_events"] == {}


def test_batch_id_suffix_no_false_skip(spark, tmp_path):
    """Batch id '1' must not be mistaken for committed because 'x-1'
    published a point (exact-id match, not suffix)."""
    coord, sinks = mk_coord(spark, tmp_path)
    coord.apply_batch(ev(spark, [("I", 1, "a", "docs", None, None)]), "x-1")
    assert not coord.committed("1")
    r = coord.apply_batch(ev(spark, [("I", 2, "b", "docs", None, None)]), "1")
    assert not r.get("skipped")
    assert set(live_docs(sinks["docs"])) == {"a", "b"}


def test_corrupt_markers_counted_not_crash(spark, tmp_path):
    """Null-txn markers and count-less commit markers are source
    corruption: counted, never a batch-crash (a re-drive would wedge on
    the same row forever). A rollback for an ALREADY-RELEASED txn is
    equally impossible to honor and lands in the same counter."""
    coord, sinks = mk_coord(spark, tmp_path)
    r = coord.apply_batch(
        ev(
            spark,
            [
                ("C", 100, None, None, None, 2),   # null txn_id
                ("C", 101, None, None, 11, None),  # commit without count
                ("I", 1, "a", "docs", 12, None),
                ("C", 102, None, None, 12, 1),
            ],
        ),
        "b1",
    )
    assert r["corrupt_markers"] == 2
    assert set(live_docs(sinks["docs"])) == {"a"}
    # retroactive rollback of the released txn 12: counted, not honored
    r2 = coord.apply_batch(ev(spark, [("R", 103, None, None, 12, None)]), "b2")
    assert r2["corrupt_markers"] == 1
    assert 12 not in coord.stuck_txns()["aborted"]
    assert set(live_docs(sinks["docs"])) == {"a"}


def test_committed_cache_survives_new_instance(spark, tmp_path):
    coord, sinks = mk_coord(spark, tmp_path)
    coord.apply_batch(ev(spark, [("I", 1, "a", "docs", None, None)]), "b1")
    fresh = TxnCoordinator(spark, coord.root, sinks)
    assert fresh.committed("b1")
    assert fresh.apply_batch(
        ev(spark, [("I", 1, "a", "docs", None, None)]), "b1"
    )["skipped"]


def test_generator_emits_marker_before_events(txn_log):
    """The fixture must actually exercise marker-before-events arrival:
    at least one committed txn has a data event in a LATER file than its
    marker (displaced out-of-order past the marker)."""
    import duckdb

    n = duckdb.sql(
        f"""
        WITH raw AS (
          SELECT *, CAST(regexp_extract(filename, 'part-(\\d+)', 1) AS INT) AS f
          FROM read_parquet('{txn_log}/part-*.parquet',
                            union_by_name=true, filename=true)
        ),
        markers AS (SELECT txn_id, f AS mf FROM raw WHERE op = 'C'),
        ev AS (SELECT txn_id, max(f) AS ef FROM raw
               WHERE op IN ('I','U','D') GROUP BY txn_id)
        SELECT count(*) FROM markers JOIN ev USING (txn_id) WHERE ef > mf
        """
    ).fetchone()[0]
    assert n > 0, "fixture never places an event after its txn's marker"


def test_expire_pending_quarantines_stale_txn(spark, tmp_path):
    """Transaction timeout: a txn whose producer died mid-txn is
    quarantined once it has been pending longer than ttl_points, and a
    marker arriving after expiry cannot resurrect its partial events."""
    coord, sinks = mk_coord(spark, tmp_path)
    coord.apply_batch(ev(spark, [("I", 1, "a", "docs", 1, None)]), "b1")  # point 0
    coord.apply_batch(ev(spark, [("I", 2, "x", "docs", None, None)]), "b2")  # 1
    coord.apply_batch(ev(spark, [("I", 3, "y", "docs", None, None)]), "b3")  # 2
    out = coord.expire_pending(ttl_points=1)
    assert out["expired"] == [1]
    # a fresh-enough pending txn is NOT expired
    coord.apply_batch(ev(spark, [("I", 4, "b", "docs", 2, None)]), "b4")  # 3
    assert coord.expire_pending(ttl_points=5)["expired"] == []
    # the late marker for the expired txn cannot release it
    coord.apply_batch(ev(spark, [("C", 100, None, None, 1, 1)]), "b5")
    assert set(live_docs(sinks["docs"])) == {"x", "y"}
    assert 1 in coord.stuck_txns()["quarantined"]
