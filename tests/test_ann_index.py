"""AnnIndex (sinks/ann_index.py): incrementally-maintained IVF ANN
index over a CDC table's embedding column — postings O(changed rows)
per refresh, search reads only the probed cells' partitions."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.sinks.ann_index import AnnIndex
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink

SCHEMA = (
    "op string, op_sequence long, doc_id string, tokens array<int>, "
    "n_tok int, source string, embedding array<float>"
)

# doc ids sort so c0..c3 seed the codebook: four orthogonal centroids
E = [
    [1.0, 0.0, 0.0, 0.0],
    [0.0, 1.0, 0.0, 0.0],
    [0.0, 0.0, 1.0, 0.0],
    [0.0, 0.0, 0.0, 1.0],
]


def _ev(op, seq, doc, vec):
    return (op, seq, doc, [1, 2, 3], 3, "s", vec)


def _near(axis, eps=0.1):
    v = [eps] * 4
    v[axis] = 1.0
    return v


@pytest.fixture()
def sink(spark, tmp_path):
    s = SnapshotSink(spark, str(tmp_path / "sink"), n_buckets=4)
    seed = [_ev("I", i + 1, f"c{i}", E[i]) for i in range(4)]
    docs = [
        _ev("I", 10, "x-a", _near(0)),
        _ev("I", 11, "x-b", _near(0, 0.2)),
        _ev("I", 12, "y-a", _near(1)),
        _ev("I", 13, "z-a", _near(2)),
    ]
    s.apply_batch(
        spark.createDataFrame(seed + docs, SCHEMA), "b1"
    )
    return s


def _hits(df):
    return [r.doc_id for r in df.collect()]


def test_full_build_matches_bruteforce(spark, sink, tmp_path):
    ix = AnnIndex(spark, sink, str(tmp_path / "ann"), n_cells=4, nprobe=1)
    assert ix.refresh()["mode"] == "full"
    assert ix.verify()["ok"]
    got = _hits(ix.search(E[0], k=3, nprobe=1))
    # exact re-rank inside the probed cell: c0 (identical), then the
    # two x docs by true cosine
    assert got[0] == "c0" and set(got[1:]) == {"x-a", "x-b"}
    # nprobe=all cells == brute force over every live doc
    all_hits = ix.search(E[1], k=8, nprobe=4)
    live = sink.read_final(columns=["doc_id", "embedding"])
    assert all_hits.count() == live.count()
    assert _hits(all_hits)[0] == "c1"
    # refresh is idempotent at head
    assert ix.refresh()["mode"] == "noop"


def test_incremental_update_move_delete(spark, sink, tmp_path):
    ix = AnnIndex(spark, sink, str(tmp_path / "ann"), n_cells=4, nprobe=1)
    ix.refresh()
    # move x-a from the e0 cell to the e2 cell; same-cell update to
    # x-b (vector changes, cell does not); delete y-a
    sink.apply_batch(
        sink.spark.createDataFrame(
            [
                _ev("U", 20, "x-a", _near(2)),
                _ev("U", 21, "x-b", _near(0, 0.3)),
                _ev("D", 22, "y-a", None),
            ],
            SCHEMA,
        ),
        "b2",
    )
    assert ix.refresh()["mode"] == "incremental"
    assert ix.verify()["ok"]
    e0 = _hits(ix.search(E[0], k=8, nprobe=1))
    assert "x-a" not in e0 and "x-b" in e0
    e2 = _hits(ix.search(E[2], k=8, nprobe=1))
    assert "x-a" in e2
    assert "y-a" not in _hits(ix.search(E[1], k=8, nprobe=4))
    # the same-cell update refreshed the stored vector: x-b's returned
    # cosine reflects the NEW vector, not the stale build-time one
    row = (
        ix.search(E[0], k=8, nprobe=1)
        .filter(F.col("doc_id") == "x-b")
        .collect()[0]
    )
    from beehive_data_etl_spark.functions.similarity import cosine_expr

    want = (
        sink.spark.range(1)
        .select(
            cosine_expr(
                F.array(*[F.lit(x) for x in _near(0, 0.3)]),
                F.array(*[F.lit(float(x)) for x in E[0]]),
            ).alias("c")
        )
        .collect()[0]["c"]
    )
    assert abs(row.cos - want) < 1e-9


def test_pure_rewrite_window_is_noop_delta(spark, sink, tmp_path):
    ix = AnnIndex(spark, sink, str(tmp_path / "ann"), n_cells=4)
    # second delta per bucket so compact() has something to fold
    sink.apply_batch(
        sink.spark.createDataFrame([_ev("U", 20, "x-a", _near(0, 0.15))], SCHEMA),
        "b2",
    )
    ix.refresh()
    r = sink.compact()  # version bump, zero change rows
    assert r["compacted"]
    r = ix.refresh()
    assert r["mode"] == "noop-delta"
    assert ix.verify()["ok"]


def test_compact_folds_and_reaps_orphans(spark, sink, tmp_path):
    ix = AnnIndex(spark, sink, str(tmp_path / "ann"), n_cells=4)
    ix.refresh()
    sink.apply_batch(
        sink.spark.createDataFrame([_ev("U", 30, "x-a", _near(3))], SCHEMA),
        "b2",
    )
    ix.refresh()
    before = {(r.cell, r.doc_id, tuple(r.vec)) for r in ix.read().collect()}
    # a crashed refresh's unlisted dir must never be read, and compact
    # reaps it once aged
    orphan = os.path.join(ix.root, "ann-vorphan-deadbeef")
    os.makedirs(orphan)
    r = ix.compact(orphan_older_than_s=0.0)
    assert r["files_folded"] == 2 and r["dirs_reaped"] >= 1
    assert not os.path.isdir(orphan)
    after = {(r.cell, r.doc_id, tuple(r.vec)) for r in ix.read().collect()}
    assert before == after
    assert ix.verify()["ok"]


def test_null_and_zero_vectors(spark, tmp_path):
    s = SnapshotSink(spark, str(tmp_path / "s"), n_buckets=2)
    rows = [_ev("I", i + 1, f"c{i}", E[i]) for i in range(4)] + [
        _ev("I", 10, "null-vec", None),
        _ev("I", 11, "zero-vec", [0.0, 0.0, 0.0, 0.0]),
    ]
    s.apply_batch(spark.createDataFrame(rows, SCHEMA), "b1")
    ix = AnnIndex(spark, s, str(tmp_path / "ann"), n_cells=4)
    ix.refresh()
    assert ix.verify()["ok"]
    posted = {r.doc_id for r in ix.read().collect()}
    assert "null-vec" not in posted        # NULL vectors are unindexed
    assert "zero-vec" in posted            # degenerate but deterministic
    zero_cell = [
        r.cell for r in ix.read().collect() if r.doc_id == "zero-vec"
    ]
    assert zero_cell == [0]


def test_guards(spark, sink, tmp_path):
    ix = AnnIndex(spark, sink, str(tmp_path / "ann"), n_cells=4)
    with pytest.raises(ValueError, match="never refreshed"):
        ix.search(E[0])
    ix.refresh()
    with pytest.raises(ValueError, match="dim"):
        ix.search([1.0, 0.0])
    with pytest.raises(ValueError, match="n_cells"):
        AnnIndex(spark, sink, str(tmp_path / "ann"), n_cells=8).current()
    # a column the table has not evolved yet is the normal transient
    # CDC state — noop, NOT a crash (the deployment job refreshes
    # per epoch from before the embeddings land)
    r = AnnIndex(spark, sink, str(tmp_path / "ann2"), vec_col="nope").refresh()
    assert r["mode"] == "noop" and "not in schema" in r["reason"]
    # a PRESENT non-array column is a permanent misconfiguration
    with pytest.raises(ValueError, match="not an array"):
        AnnIndex(
            spark, sink, str(tmp_path / "ann3"), vec_col="source"
        ).refresh()
    # a table with no live vectors yet cannot seed a codebook — noop
    s2 = SnapshotSink(spark, str(tmp_path / "s2"), n_buckets=2)
    s2.apply_batch(
        spark.createDataFrame([_ev("I", 1, "d", None)], SCHEMA), "b1"
    )
    ix4 = AnnIndex(spark, s2, str(tmp_path / "ann4"), n_cells=2)
    r = ix4.refresh()
    assert r["mode"] == "noop" and "seed" in r["reason"]
    # ...and builds normally once vectors arrive
    s2.apply_batch(
        spark.createDataFrame([_ev("U", 2, "d", E[0])], SCHEMA), "b2"
    )
    assert ix4.refresh()["mode"] == "full"
    assert ix4.verify()["ok"]


def test_search_prunes_to_probed_cells(spark, sink, tmp_path):
    """The scale property: a search's scan reads only the probed
    cells' partition dirs — file-level evidence, not plan hope."""
    ix = AnnIndex(spark, sink, str(tmp_path / "ann"), n_cells=4, nprobe=1)
    ix.refresh()
    df = ix.search(E[3], k=5, nprobe=1)
    files = {f for f in df.inputFiles()}
    assert files, "search plan lists no files"
    assert all("cell=" in f for f in files)
    probed = {f.split("cell=")[1].split("/")[0] for f in files}
    assert probed == {"3"}

@pytest.mark.parametrize("mode", ["pipelined", "stream"])
def test_replay_job_ann_wiring(spark, tmp_path, monkeypatch, mode):
    """REPLAY_ANN_COL wires the IVF index into the deployment job.
    Pipelined mode reads each micro-batch with its own merged schema;
    stream mode needs REPLAY_SCHEMA=auto so the readStream schema
    carries the beyond-envelope embedding column."""
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    import replay_job

    log = str(tmp_path / "wal")
    os.makedirs(log)
    rows1 = [
        ("I", i + 1, f"c{i}", [1, 2], 2, "s", None, E[i]) for i in range(4)
    ]
    rows2 = [
        ("I", 10, "x-a", [1, 2], 2, "s", None, _near(0)),
        ("U", 11, "c1", [1, 2], 2, "s", None, _near(1, 0.2)),
        ("D", 12, "c3", None, None, "s", None, None),
    ]
    ddl = (
        "op string, op_sequence long, doc_id string, tokens array<int>, "
        "n_tok int, source string, event_ts timestamp, "
        "embedding array<float>"
    )
    for i, rows in enumerate([rows1, rows2]):
        spark.createDataFrame(rows, ddl).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / f"stage{i}"))
        src = next(
            f
            for f in os.listdir(str(tmp_path / f"stage{i}"))
            if f.endswith(".parquet")
        )
        shutil.copy(
            os.path.join(str(tmp_path / f"stage{i}"), src),
            os.path.join(log, f"part-{i:05d}.parquet"),
        )
    target = str(tmp_path / "sink")
    monkeypatch.setattr(sys, "argv", ["replay_job.py", log, target])
    monkeypatch.setenv("REPLAY_MODE", mode)
    monkeypatch.setenv("REPLAY_N_BUCKETS", "4")
    if mode == "pipelined":
        monkeypatch.setenv("REPLAY_FILES_PER_BATCH", "1")
        monkeypatch.setenv("REPLAY_INFLIGHT", "1")
    else:
        monkeypatch.setenv("REPLAY_SCHEMA", "auto")
    monkeypatch.setenv("REPLAY_ANN_COL", "embedding")
    monkeypatch.setenv("REPLAY_ANN_CELLS", "4")
    replay_job.main()

    sink = SnapshotSink.open(spark, target)
    ix = AnnIndex(
        spark, sink, os.path.join(target, "_views", "ann"), n_cells=4
    )
    assert ix.current()["version"] == sink.current_snapshot()["version"]
    assert ix.verify()["ok"]
    posted = {r.doc_id for r in ix.read().collect()}
    assert "c3" not in posted and "x-a" in posted
