"""Branch refs (sinks/snapshot.py create_branch/branch/fast_forward):
metadata-only forks of the snapshot chain sharing the data layout —
the multi-commit write-audit-publish shape. Stage N exactly-once
batches on a branch, audit its head in isolation, publish atomically
with fast_forward (refused if main moved), or delete and the table
never saw it."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.sinks.snapshot import SnapshotSink

SCHEMA = (
    "op string, op_sequence long, doc_id string, tokens array<int>, "
    "n_tok int, source string"
)


def _ev(op, seq, doc, toks):
    return (op, seq, doc, toks, len(toks or []), "s")


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def sink(spark, tmp_path):
    s = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    s.apply_batch(
        _batch(spark, [_ev("I", i, f"d{i}", [i, i]) for i in range(1, 9)]),
        "b1",
    )
    return s


def _docs(s):
    return {
        r.doc_id: r.tokens
        for r in s.read_final(columns=["doc_id", "tokens"]).collect()
    }


def test_branch_write_isolated_from_main(spark, sink, tmp_path):
    base_v = sink.current_snapshot()["version"]
    sink.create_branch("wip")
    br = sink.branch("wip")
    br.apply_batch(_batch(spark, [_ev("U", 10, "d1", [9])]), "b2")
    br.apply_batch(
        _batch(spark, [_ev("I", 11, "dx", [7]), _ev("D", 12, "d2", None)]),
        "b3",
    )
    # main untouched: version, rows, tokens
    assert sink.current_snapshot()["version"] == base_v
    m = _docs(sink)
    assert m["d1"] == [1, 1] and "d2" in m and "dx" not in m
    # branch reflects its chain
    b = _docs(br)
    assert b["d1"] == [9] and "d2" not in b and b["dx"] == [7]
    info = sink.branches()["wip"]
    assert info["base"] == base_v and info["head"] == base_v + 2
    # branch exactly-once: same logical id skips on the branch
    r = br.apply_batch(_batch(spark, [_ev("U", 99, "d1", [0])]), "b2")
    assert r["skipped"] and br.committed("b2")


def test_fast_forward_publishes_and_dedupes(spark, sink, tmp_path):
    base_v = sink.current_snapshot()["version"]
    sink.create_branch("wip")
    br = sink.branch("wip")
    br.apply_batch(_batch(spark, [_ev("U", 10, "d1", [9])]), "b2")
    br.apply_batch(_batch(spark, [_ev("I", 11, "dx", [7])]), "b3")
    want = _docs(br)
    res = sink.fast_forward("wip")
    assert res["fast_forwarded"] == 2 and res["version"] == base_v + 2
    assert sink.current_snapshot()["version"] == base_v + 2
    assert _docs(sink) == want
    assert "wip" not in sink.branches()
    # published batch ids are UN-namespaced: a WAL replay onto main
    # dedupes against the branch's commits
    assert sink.committed("b2") and sink.committed("b3")
    r = sink.apply_batch(_batch(spark, [_ev("U", 99, "d1", [0])]), "b2")
    assert r["skipped"]
    # the published span is ordinary chain history: time travel and
    # changelog windows walk it exactly as if committed on main
    assert sink.snapshot(base_v + 1)["version"] == base_v + 1
    ch = sink.read_changes(base_v, base_v + 2)
    assert ch.filter(F.col("doc_id") == "dx").count() == 1


def test_fast_forward_refuses_diverged_then_replay_recovers(spark, sink):
    sink.create_branch("wip")
    br = sink.branch("wip")
    br.apply_batch(_batch(spark, [_ev("U", 10, "d1", [9])]), "b2")
    sink.apply_batch(_batch(spark, [_ev("I", 20, "dz", [5])]), "b4")
    with pytest.raises(RuntimeError, match="main moved"):
        sink.fast_forward("wip")
    # the documented recovery: re-apply the branch's batches to main
    sink.apply_batch(_batch(spark, [_ev("U", 10, "d1", [9])]), "b2")
    sink.delete_branch("wip")
    m = _docs(sink)
    assert m["d1"] == [9] and m["dz"] == [5]
    assert "wip" not in sink.branches()


def test_empty_branch_fast_forward_noop(spark, sink):
    sink.create_branch("idle")
    res = sink.fast_forward("idle")
    assert res["fast_forwarded"] == 0
    assert "idle" not in sink.branches()


def test_branch_guards(spark, sink, tmp_path):
    sink.create_branch("wip")
    br = sink.branch("wip")
    for op, call in [
        ("vacuum", lambda: br.vacuum()),
        ("rollback_to", lambda: br.rollback_to(1)),
        ("tag", lambda: br.tag("t")),
        ("expire_snapshots", lambda: br.expire_snapshots(1)),
        ("purge_keys", lambda: br.purge_keys(["d1"])),
        ("rebucket", lambda: br.rebucket(8)),
        ("drop_column", lambda: br.drop_column("source")),
        ("set_table_audit", lambda: br.set_table_audit()),
        ("create_branch", lambda: br.create_branch("nested")),
        ("fast_forward", lambda: br.fast_forward("wip")),
    ]:
        with pytest.raises(RuntimeError, match="table-level"):
            call()
    with pytest.raises(ValueError, match="invalid branch name"):
        sink.create_branch("main")
    with pytest.raises(ValueError, match="already exists"):
        sink.create_branch("wip")
    with pytest.raises(ValueError, match="no branch"):
        sink.branch("nope")
    # purge on MAIN refused while branches live (takedown must cover
    # every ref)
    with pytest.raises(RuntimeError, match="purge"):
        sink.purge_keys(["d1"])


def test_vacuum_retains_branch_files_until_deleted(spark, sink, tmp_path):
    sink.create_branch("wip")
    br = sink.branch("wip")
    br.apply_batch(_batch(spark, [_ev("U", 10, "d1", [9])]), "b2")
    # main moves on and compacts, superseding the fork-point deltas
    sink.apply_batch(_batch(spark, [_ev("U", 20, "d3", [8])]), "b4")
    sink.compact()
    sink.vacuum()
    # branch state fully readable after main's vacuum: its own delta
    # AND the base files it references survived
    b = _docs(br)
    assert b["d1"] == [9] and b["d3"] == [3, 3]
    branch_dirs = [
        d
        for d in os.listdir(os.path.join(sink.root, "data"))
        if d.startswith("ingest=b.wip.")
    ]
    assert branch_dirs
    sink.delete_branch("wip")
    sink.vacuum()
    assert not [
        d
        for d in os.listdir(os.path.join(sink.root, "data"))
        if d.startswith("ingest=b.wip.")
    ]


def test_expire_snapshots_keeps_fork_point(spark, sink):
    for i in range(4):
        sink.apply_batch(
            _batch(spark, [_ev("U", 20 + i, "d1", [i])]), f"m{i}"
        )
    head = sink.current_snapshot()["version"]
    fork = head - 2
    sink.create_branch("wip", at=fork)
    res = sink.expire_snapshots(keep_last=1)
    # floor clamped to fork+1; the fork-point JSON itself is kept
    assert res["snapshot_floor"] == fork + 1
    assert sink.snapshot(fork)["version"] == fork
    with pytest.raises(ValueError, match="expired"):
        sink.snapshot(fork - 1)
    sink.delete_branch("wip")


def test_branch_compact_and_schema_evolution_publish(spark, sink):
    """A branch can compact and schema-evolve; fast_forward publishes
    the evolved schema and folded layout."""
    base_v = sink.current_snapshot()["version"]
    sink.create_branch("wip")
    br = sink.branch("wip")
    wide = (
        "op string, op_sequence long, doc_id string, tokens array<int>, "
        "n_tok int, source string, lang string"
    )
    br.apply_batch(
        spark.createDataFrame(
            [("U", 10, "d1", [9], 1, "s", "en")], wide
        ),
        "b2",
    )
    br.compact()
    assert "lang" in br.current_snapshot()["schema"]
    sink.fast_forward("wip")
    assert "lang" in sink.current_snapshot()["schema"]
    got = {
        r.doc_id: r.lang
        for r in sink.read_final(columns=["doc_id", "lang"]).collect()
    }
    assert got["d1"] == "en" and got["d2"] is None
    # one apply + one compact on the branch = two published commits
    assert sink.current_snapshot()["version"] == base_v + 2


def test_derived_view_refreshes_across_publish(spark, sink, tmp_path):
    from beehive_data_etl_spark.sinks.aggregates import AggregateView

    view = AggregateView(
        spark, sink, str(tmp_path / "agg"), ["source"], ["n_tok"]
    )
    view.refresh()
    sink.create_branch("wip")
    br = sink.branch("wip")
    br.apply_batch(_batch(spark, [_ev("I", 10, "dx", [1, 2, 3])]), "b2")
    br.apply_batch(_batch(spark, [_ev("D", 11, "d1", None)]), "b3")
    sink.fast_forward("wip")
    view.refresh()
    assert view.current()["version"] == sink.current_snapshot()["version"]
    assert view.verify()["ok"]


def test_crashed_fast_forward_recovers(spark, sink, tmp_path):
    """Crash BEFORE the pointer swap: re-run publishes. Crash AFTER
    the swap but before cleanup (simulated by restoring the branch
    files post-publish): re-run detects already-published and
    finishes the cleanup instead of refusing."""
    sink.create_branch("wip")
    br = sink.branch("wip")
    br.apply_batch(_batch(spark, [_ev("U", 10, "d1", [9])]), "b2")

    class Boom(Exception):
        pass

    def hook(point):
        if point == "before_pointer_swap":
            raise Boom()

    sink.crash_hook = hook
    with pytest.raises(Boom):
        sink.fast_forward("wip")
    sink.crash_hook = lambda point: None
    base_v = sink.current_snapshot()["version"]
    # pre-swap crash left main untouched
    assert _docs(sink)["d1"] == [1, 1]
    # save the branch metadata to simulate the post-swap crash later
    sdir = os.path.join(sink.root, "_snapshots")
    saved = {
        f: open(os.path.join(sdir, f)).read()
        for f in os.listdir(sdir)
        if f.startswith("b-wip-") or f == "BRANCH-wip.json"
    }
    res = sink.fast_forward("wip")
    assert res["fast_forwarded"] == 1
    assert _docs(sink)["d1"] == [9]
    # simulate: crash happened right after the pointer swap — branch
    # pointer and chain files still on disk
    for f, body in saved.items():
        with open(os.path.join(sdir, f), "w") as fh:
            fh.write(body)
    res2 = sink.fast_forward("wip")
    assert res2.get("already_published") and res2["fast_forwarded"] == 0
    assert "wip" not in sink.branches()
    assert sink.current_snapshot()["version"] == base_v + 1


def test_branch_lookup_and_time_travel(spark, sink):
    """Branch handles serve the whole read surface: point lookups hit
    branch state; time travel below the fork reads shared history."""
    base_v = sink.current_snapshot()["version"]
    sink.create_branch("wip")
    br = sink.branch("wip")
    br.apply_batch(_batch(spark, [_ev("U", 10, "d1", [9])]), "b2")
    got = br.lookup(["d1"]).collect()
    assert len(got) == 1 and got[0].tokens == [9]
    pre = br.read_state(version=base_v)
    assert {
        r.doc_id: r.tokens for r in pre.select("doc_id", "tokens").collect()
    }["d1"] == [1, 1]
    sink.delete_branch("wip")

def test_replay_job_branch_staging(spark, smoke_log, tmp_path, monkeypatch):
    """REPLAY_BRANCH deployment shape: the replay lands on a branch and
    publishes by fast_forward at the quiesced end; derived views follow
    MAIN and refresh only after the publish. REPLAY_BRANCH_PUBLISH=0
    stages without touching main."""
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    import replay_job

    # stage the WAL in two halves
    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    files = sorted(os.listdir(smoke_log))
    parts = [f for f in files if f.startswith("part-")]
    for f in parts[:4]:
        shutil.copy(os.path.join(smoke_log, f), os.path.join(wal, f))
    target = str(tmp_path / "t")
    monkeypatch.setattr(sys, "argv", ["replay_job.py", wal, target])
    monkeypatch.setenv("REPLAY_MODE", "pipelined")
    monkeypatch.setenv("REPLAY_N_BUCKETS", "8")
    monkeypatch.setenv("REPLAY_FILES_PER_BATCH", "2")
    monkeypatch.setenv("REPLAY_INFLIGHT", "1")
    monkeypatch.setenv("REPLAY_AGG_GROUP", "source")
    monkeypatch.setenv("REPLAY_AGG_SUM", "n_tok")
    replay_job.main()
    sink = SnapshotSink.open(spark, target)
    v_before = sink.current_snapshot()["version"]

    # second half arrives; stage it on a branch WITHOUT publishing
    for f in parts[4:]:
        shutil.copy(os.path.join(smoke_log, f), os.path.join(wal, f))
    monkeypatch.setenv("REPLAY_BRANCH", "stage")
    monkeypatch.setenv("REPLAY_BRANCH_PUBLISH", "0")
    replay_job.main()
    assert sink.current_snapshot()["version"] == v_before  # main untouched
    assert "stage" in sink.branches()

    # now publish (resume is idempotent: committed chunks skip)
    monkeypatch.setenv("REPLAY_BRANCH_PUBLISH", "1")
    replay_job.main()
    assert "stage" not in sink.branches()
    assert sink.current_snapshot()["version"] > v_before
    # final state equals the full-log oracle
    from beehive_data_etl_spark.verify import (
        compare_final,
        oracle_final_spark,
    )

    state = sink.read_state()
    assert compare_final(
        state.filter(~state.deleted), oracle_final_spark(spark, wal)
    )["ok"]
    # the view followed the PUBLISHED head
    from beehive_data_etl_spark.sinks.aggregates import AggregateView

    agg = AggregateView(
        spark, sink, os.path.join(target, "_views", "agg"),
        ["source"], ["n_tok"],
    )
    assert agg.current()["version"] == sink.current_snapshot()["version"]
    assert agg.verify()["ok"]

def test_branch_dedupes_main_inherited_batch_ids(spark, sink):
    """A staged replay resuming over history main already ingested
    must SKIP those chunks on the branch, not re-apply them
    (review-found: the phys-id check alone missed inherited ids)."""
    sink.create_branch("wip")
    br = sink.branch("wip")
    assert br.committed("b1")  # main's pre-fork commit
    r = br.apply_batch(
        _batch(spark, [_ev("U", 99, "d1", [0])]), "b1"
    )
    assert r["skipped"]
    assert _docs(br)["d1"] == [1, 1]  # nothing re-applied


def test_recreated_branch_name_does_not_shadow_history(spark, sink):
    """Husk b-<name>-v*.json files from a dead incarnation must not be
    served as history by a re-created branch of the same name
    (review-found stale-chain shadowing)."""
    sink.create_branch("wip")
    br = sink.branch("wip")
    br.apply_batch(_batch(spark, [_ev("U", 10, "d1", [9])]), "b2")
    husk = os.path.join(
        sink.root, "_snapshots",
        f"b-wip-v{br.current_snapshot()['version']:06d}.json",
    )
    saved = open(husk).read()
    sink.delete_branch("wip")
    # simulate a crashed cleanup: the husk survives the delete
    with open(husk, "w") as fh:
        fh.write(saved)
    # main moves to the husk's version number with DIFFERENT content
    sink.apply_batch(_batch(spark, [_ev("I", 20, "dz", [5])]), "b3")
    main_v = sink.current_snapshot()["version"]
    sink.create_branch("wip")
    br2 = sink.branch("wip")
    got = {
        r.doc_id: r.tokens
        for r in br2.read_state(version=main_v)
        .filter(~F.col("deleted"))
        .select("doc_id", "tokens")
        .collect()
    }
    # the husk said d1=[9]; real main history says d1=[1,1] and dz=[5]
    assert got["d1"] == [1, 1] and got["dz"] == [5]
    sink.delete_branch("wip")


def test_compact_only_branch_crash_recovery(spark, sink):
    """A branch with only rewrite commits (no batch ids) must still be
    recognized as already-published after a post-swap crash
    (review-found: the batch-id-based detection missed it)."""
    sink.apply_batch(_batch(spark, [_ev("U", 10, "d1", [7])]), "b2")
    sink.create_branch("wip")
    br = sink.branch("wip")
    assert br.compact()["compacted"]
    sdir = os.path.join(sink.root, "_snapshots")
    saved = {
        f: open(os.path.join(sdir, f)).read()
        for f in os.listdir(sdir)
        if f.startswith("b-wip-") or f == "BRANCH-wip.json"
    }
    res = sink.fast_forward("wip")
    assert res["fast_forwarded"] == 1
    # simulate the post-swap crash: branch metadata restored
    for f, body in saved.items():
        with open(os.path.join(sdir, f), "w") as fh:
            fh.write(body)
    res2 = sink.fast_forward("wip")
    assert res2.get("already_published")
    assert "wip" not in sink.branches()


def test_replay_job_branch_refused_in_stream_mode(
    spark, smoke_log, tmp_path, monkeypatch
):
    """Stream mode's checkpoint cannot un-consume files staged on an
    abandoned branch — the combination is refused up front."""
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    import replay_job

    target = str(tmp_path / "t")
    # bootstrap main so the branch has a fork point
    monkeypatch.setattr(sys, "argv", ["replay_job.py", smoke_log, target])
    monkeypatch.setenv("REPLAY_MODE", "pipelined")
    monkeypatch.setenv("REPLAY_N_BUCKETS", "8")
    replay_job.main()
    monkeypatch.setenv("REPLAY_MODE", "stream")
    monkeypatch.setenv("REPLAY_BRANCH", "stage")
    with pytest.raises(ValueError, match="pipelined"):
        replay_job.main()
