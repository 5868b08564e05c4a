"""Incremental near-dup detection on CDC ingest
(functions/incremental_dedup.py): per-batch candidates against the
accumulated banded-signature store must equal batch-at-once pairing for
insert-only streams; updates re-pair with fresh signatures and deletes
tombstone them; the store is merge-on-read LWW."""

import pyspark.sql.functions as F
import pytest

from beehive_data_etl_spark.functions.dedup import (
    banded_signatures,
    token_shingles,
)
from beehive_data_etl_spark.functions.incremental_dedup import (
    IncrementalNearDup,
    SignatureStore,
    incremental_candidates_static,
)

BATCH_SCHEMA = "doc_id string, op_sequence long, tokens array<int>, deleted boolean"


def _doc(i, toks, seq, deleted=False):
    return (f"d{i:03d}", seq, toks, deleted)


BASE = list(range(1, 30))  # long shared run → near-dup signatures


@pytest.fixture()
def inc(spark, tmp_path):
    return IncrementalNearDup(spark, str(tmp_path / "sigs"), k=16, bands=4)


def _pairs(df):
    return {(r.id_new, r.id_corpus) for r in df.collect()}


def test_insert_only_stream_equals_batch_at_once(spark, tmp_path, inc):
    """Every near-dup pair of the final corpus is found exactly once:
    intra-batch when both docs arrive together, new-vs-corpus when the
    second doc arrives later."""
    b1 = [_doc(1, BASE, 1), _doc(2, BASE + [99], 2), _doc(3, [500, 501, 502], 3)]
    b2 = [_doc(4, BASE + [98], 4), _doc(5, list(range(200, 230)), 5)]
    b3 = [_doc(6, BASE, 6)]
    batches = [b1, b2, b3]
    seen = set()
    for rows in batches:
        out = inc.process_batch(spark.createDataFrame(rows, BATCH_SCHEMA))
        # normalize orientation BEFORE the re-report check: a cross
        # pair arrives as (new, corpus) which can be the reverse of the
        # sorted intra form — comparing raw tuples would miss a
        # flipped re-report (round-3 review)
        new_pairs = {tuple(sorted(p)) for p in _pairs(out)}
        assert not (new_pairs & seen)
        seen |= new_pairs

    # oracle: batch-at-once static pairing over the final corpus
    all_rows = [r for b in batches for r in b]
    docs = spark.createDataFrame(all_rows, BATCH_SCHEMA)
    banded = banded_signatures(
        docs.select(F.col("doc_id").alias("id"), token_shingles("tokens").alias("sh")),
        F.col("sh"),
        id_col="id",
    )
    buckets = (
        banded.groupBy("band", "band_hash")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    expected = {
        tuple(sorted((a, b)))
        for r in buckets.collect()
        for i, a in enumerate(r.ids)
        for b in r.ids[i + 1 :]
        if a != b
    }
    assert seen == expected
    assert ("d001", "d006") in seen or ("d006", "d001") in {tuple(sorted(p)) for p in seen}


def test_update_repairs_with_fresh_signatures(spark, inc):
    """An UPDATE that rewrites a doc's content must pair by its NEW
    tokens and must not pair against its own stale signatures."""
    inc.process_batch(
        spark.createDataFrame([_doc(1, BASE, 1), _doc(2, list(range(600, 640)), 2)], BATCH_SCHEMA)
    )
    # d002 is rewritten to match d001
    out = inc.process_batch(
        spark.createDataFrame([_doc(2, BASE + [77], 10)], BATCH_SCHEMA)
    )
    assert _pairs(out) == {("d002", "d001")}

    # the store's live signature for d002 is the new one (LWW)
    live = inc.store.read()
    d2 = live.filter(F.col("id") == "d002")
    fresh = banded_signatures(
        spark.createDataFrame([_doc(2, BASE + [77], 10)], BATCH_SCHEMA).select(
            F.col("doc_id").alias("id"), token_shingles("tokens").alias("sh")
        ),
        F.col("sh"),
        id_col="id",
    )
    assert {(r.band, r.band_hash) for r in d2.collect()} == {
        (r.band, r.band_hash) for r in fresh.collect()
    }


def test_delete_tombstones_signatures(spark, inc):
    """A DELETE removes the doc from the store: later twins find no
    corpus partner."""
    inc.process_batch(spark.createDataFrame([_doc(1, BASE, 1)], BATCH_SCHEMA))
    inc.process_batch(
        spark.createDataFrame([("d001", 5, None, True)], BATCH_SCHEMA)
    )
    assert inc.store.read().filter(F.col("id") == "d001").count() == 0
    out = inc.process_batch(
        spark.createDataFrame([_doc(9, BASE, 6)], BATCH_SCHEMA)
    )
    assert _pairs(out) == set()


def test_store_is_append_only_and_lww(spark, tmp_path):
    store = SignatureStore(spark, str(tmp_path / "s"))
    assert store.read() is None
    rows1 = spark.createDataFrame(
        [("a", 0, "h1", 1, False)],
        "id string, band int, band_hash string, op_sequence long, deleted boolean",
    )
    store.append(rows1)
    files_after_1 = set(store._files())
    rows2 = spark.createDataFrame(
        [("a", 0, "h2", 2, False)],
        "id string, band int, band_hash string, op_sequence long, deleted boolean",
    )
    store.append(rows2)
    assert files_after_1 < set(store._files())  # strictly grew, nothing rewritten
    live = store.read().collect()
    assert [(r.id, r.band, r.band_hash) for r in live] == [("a", 0, "h2")]


def test_static_split_variant_matches_per_batch_shape(spark):
    """incremental_candidates_static: pairs only cross the split —
    corpus×corpus twins are NOT reported."""
    docs = spark.createDataFrame(
        [("n1", BASE), ("c1", BASE + [99]), ("c2", BASE + [98]), ("c3", [7, 8, 9])],
        "doc_id string, tokens array<int>",
    )
    out = incremental_candidates_static(
        docs,
        is_new=F.col("doc_id").startswith("n"),
        shingles=token_shingles("tokens"),
        id_col="doc_id",
    )
    got = {(r.id_new, r.id_corpus) for r in out.collect()}
    assert got == {("n1", "c1"), ("n1", "c2")}  # c1~c2 excluded by design


def test_replay_integration_store_tracks_table_state(spark, smoke_log, tmp_path):
    """End-to-end on the real CDC path: replay the smoke WAL with a
    transform that runs incremental near-dup per micro-batch as a side
    stage. After replay, the signature store's LIVE doc set must equal
    the merged table's live doc set (updates superseded, deletes
    tombstoned). Serial batches (inflight=1): the store snapshot is
    pinned per batch, so pipelined mode would see bounded staleness —
    documented in the module docstring."""
    from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
    from beehive_data_etl_spark.streaming.replay import replay_incremental

    tracker = IncrementalNearDup(spark, str(tmp_path / "sigs"), k=8, bands=2)

    def with_neardup(batch):
        tracker.process_batch(
            batch.withColumn("deleted", F.col("op") == F.lit("D")),
            id_col="doc_id",
            seq_col="op_sequence",
            tokens_col="tokens",
            deleted_col="deleted",
        )
        return batch

    sink = SnapshotSink(spark, str(tmp_path / "sink"), n_buckets=8)
    replay_incremental(
        spark, smoke_log, sink, files_per_batch=2, transform=with_neardup
    )
    live_docs = {
        r.doc_id
        for r in sink.read_state().filter(~F.col("deleted")).select("doc_id").collect()
    }
    store_docs = {r.id for r in tracker.store.read().select("id").distinct().collect()}
    assert store_docs == live_docs


def test_retry_is_idempotent_with_batch_id(spark, tmp_path):
    """Crash-after-append, before the engine commit: the replayed batch
    must not pair against its own first attempt's signatures, and the
    store must hold exactly one copy of the batch's rows."""
    inc = IncrementalNearDup(spark, str(tmp_path / "sigs"), k=16, bands=4)
    rows = [_doc(1, BASE, 1), _doc(2, BASE + [99], 2)]
    first = inc.process_batch(
        spark.createDataFrame(rows, BATCH_SCHEMA), batch_id="b0"
    )
    # simulated crash → replay of the same batch
    retry = inc.process_batch(
        spark.createDataFrame(rows, BATCH_SCHEMA), batch_id="b0"
    )
    assert _pairs(first) == _pairs(retry) == {("d001", "d002")}
    per_id_band = (
        spark.read.schema(
            "id string, band int, band_hash string, op_sequence long, deleted boolean"
        )
        .parquet(*inc.store._files())
        .groupBy("id", "band")
        .count()
        .collect()
    )
    assert all(r["count"] == 1 for r in per_id_band)


def test_update_plus_twin_in_one_batch_reports_pair_once(spark, inc):
    """Round-3 review: batch = [X updated, Y inserted], X's STALE
    signatures still in the store — the pair must be reported exactly
    once (intra), never a second time orientation-flipped via the
    corpus join against X's old rows."""
    inc.process_batch(spark.createDataFrame([_doc(1, BASE, 1)], BATCH_SCHEMA))
    out = inc.process_batch(
        spark.createDataFrame(
            [_doc(1, BASE + [55], 10), _doc(2, BASE + [55, 56], 11)], BATCH_SCHEMA
        )
    )
    got = [(r.id_new, r.id_corpus) for r in out.collect()]
    assert got == [("d001", "d002")]


def test_store_compaction_bounds_history(spark, tmp_path):
    """After many batches the store folds to O(live) rows; LWW answers
    and later appends are unaffected; tombstones survive compaction so
    late out-of-order rows cannot resurrect deleted docs."""
    inc = IncrementalNearDup(spark, str(tmp_path / "sigs"), k=8, bands=2)
    inc.store.compact_threshold = 4
    for i in range(6):
        inc.process_batch(
            spark.createDataFrame([_doc(1, BASE + [i], i + 1)], BATCH_SCHEMA)
        )
    inc.process_batch(
        spark.createDataFrame([("d001", 100, None, True)], BATCH_SCHEMA)
    )
    inc.store.compact()
    assert len(inc.store._files()) == 1
    raw = spark.read.schema(
        "id string, band int, band_hash string, op_sequence long, deleted boolean"
    ).parquet(*inc.store._files())
    assert raw.count() == 2  # one tombstone per band, nothing else
    assert raw.filter(~F.col("deleted")).count() == 0
    assert inc.store.read().count() == 0
    # a LATE stale signature (lower op_sequence) must stay dead
    inc.process_batch(
        spark.createDataFrame([_doc(1, BASE, 50)], BATCH_SCHEMA)
    )
    assert inc.store.read().filter(F.col("id") == "d001").count() == 0


def test_token_shingles_sql_matches_spark(spark):
    """The DuckDB twin of token_shingles must produce the identical
    shingle sets (guards silent drift — round-3 review flagged it as
    untested)."""
    import duckdb

    from beehive_data_etl_spark.functions.dedup import token_shingles_sql

    rows = [("a", [1, 2, 3, 4, 5]), ("b", [9]), ("c", [7, 7, 7, 7]), ("d", [])]
    sdf = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {
        r.doc_id: sorted(r.sh)
        for r in sdf.select("doc_id", token_shingles("tokens", 3).alias("sh")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id VARCHAR, tokens INT[])")
    for d, toks in rows:
        con.execute("INSERT INTO t VALUES (?, ?)", [d, toks])
    want = {
        d: sorted(sh)
        for d, sh in con.execute(
            f"SELECT doc_id, {token_shingles_sql('tokens', 3)} FROM t"
        ).fetchall()
    }
    assert got == want


def test_compaction_supersede_then_gc(spark, tmp_path):
    """Round-3 review: under pipelined/multi-process use a compaction
    must never delete a file a concurrent batch's pinned snapshot still
    references. Two-phase expiry: compact() SUPERSEDES its inputs (gone
    from listings, kept on disk for the horizon), and only gc after the
    horizon removes them — and the steady state is ONE live file, so
    maybe_compact cannot re-trigger a full refold every batch."""
    store = SignatureStore(
        spark, str(tmp_path / "s"), compact_threshold=2, compact_older_than_s=3600
    )
    schema = "id string, band int, band_hash string, op_sequence long, deleted boolean"
    store.append(spark.createDataFrame([("a", 0, "h1", 1, False)], schema), "b0")
    store.append(spark.createDataFrame([("a", 0, "h2", 2, False)], schema), "b1")
    before = set(store._files())
    assert len(before) == 2
    store.compact()
    live = store._files()
    assert len(live) == 1 and live[0] not in before  # one fresh fold
    # originals stay ON DISK for pinned readers, just unlisted
    assert before <= set(store._all_parquet())
    assert [r.band_hash for r in store.read().collect()] == ["h2"]
    # inside the horizon, repeated maybe_compact must be a no-op (the
    # round-3 review's runaway-refold finding)
    store.maybe_compact()
    assert store._files() == live
    # after the horizon the superseded sets are physically reaped
    assert store.gc_superseded(older_than_s=0) == 2
    assert set(store._all_parquet()) == set(live)
    assert [r.band_hash for r in store.read().collect()] == ["h2"]
