"""Spark Python Data Source over SnapshotSink tables — parity with the
sink's own readers (sources/spark_datasource.py, sources/table_meta.py).

Every semantic claim the data source makes is pinned against the
engine path that defines it: batch == read_final / read_state,
changelog == read_changes, time travel == snapshot refs, bucket-hash
pruning == _bucket_expr."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.sources import table_meta as tm
from beehive_data_etl_spark.sources.spark_datasource import (
    bucket_of,
    plan_state_partitions,
    plan_window_partitions,
    register,
)
from beehive_data_etl_spark.streaming.replay import replay_incremental


@pytest.fixture(scope="module")
def ds_table(spark, smoke_log, tmp_path_factory):
    """A real replayed table (same fixture recipe as test_cdc_replay)
    with the data sources registered."""
    root = str(tmp_path_factory.mktemp("ds_sink"))
    sink = SnapshotSink(spark, root, n_buckets=8)
    replay_incremental(spark, smoke_log, sink, files_per_batch=2)
    register(spark)
    return sink


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


# ---------------------------------------------------------------- batch read
def test_batch_read_matches_read_final(spark, ds_table):
    sink = ds_table
    via_ds = spark.read.format("beehive").load(sink.root)
    expect = sink.read_final()
    assert via_ds.columns == expect.columns
    cols = [c for c in expect.columns]
    assert _sorted_rows(via_ds, cols) == _sorted_rows(expect, cols)


def test_batch_read_internal_matches_read_state(spark, ds_table):
    sink = ds_table
    via_ds = (
        spark.read.format("beehive")
        .option("internal", "true")
        .load(sink.root)
    )
    expect = sink.read_state()
    cols = sorted(set(via_ds.columns) & set(expect.columns))
    assert set(via_ds.columns) == set(expect.columns)
    assert _sorted_rows(via_ds, cols) == _sorted_rows(expect, cols)


def test_batch_time_travel_version_and_tag(spark, ds_table):
    sink = ds_table
    head = sink.current_snapshot()["version"]
    v = max(1, head - 1)
    sink.tag("ds-pin", v)
    expect = sink.read_state(version=v).filter(~F.col("deleted"))
    payload = [c for c in expect.columns if c not in ("op_sequence", "deleted")]
    expect = expect.select(*payload)
    for ref in (str(v), "ds-pin"):
        got = spark.read.format("beehive").option("version", ref).load(sink.root)
        assert _sorted_rows(got, payload) == _sorted_rows(expect, payload)


def test_batch_column_projection(spark, ds_table):
    sink = ds_table
    got = (
        spark.read.format("beehive")
        .option("columns", "n_tok, source")
        .load(sink.root)
    )
    assert got.columns == ["doc_id", "n_tok", "source"]
    expect = sink.read_final(columns=["n_tok", "source"])
    assert _sorted_rows(got, got.columns) == _sorted_rows(expect, got.columns)


def test_batch_key_filter_correct_under_pruning(spark, ds_table):
    sink = ds_table
    some = sink.read_final().select("doc_id").limit(3).collect()
    keys = [r[0] for r in some]
    got = (
        spark.read.format("beehive")
        .load(sink.root)
        .filter(F.col("doc_id") == keys[0])
    )
    expect = sink.read_final().filter(F.col("doc_id") == keys[0])
    cols = expect.columns
    assert _sorted_rows(got, cols) == _sorted_rows(expect, cols)
    got_in = (
        spark.read.format("beehive")
        .load(sink.root)
        .filter(F.col("doc_id").isin(keys))
    )
    expect_in = sink.read_final().filter(F.col("doc_id").isin(keys))
    assert _sorted_rows(got_in, cols) == _sorted_rows(expect_in, cols)


def test_xxhash64_python_twin_matches_spark(spark):
    """bucket_of is only sound if the pure-Python XXH64 equals Spark's
    JVM xxhash64 — pin it over adversarial lengths (0..40 bytes spans
    every tail path; unicode spans multi-byte UTF-8)."""
    vals = [
        "",
        "a",
        "doc-000123",
        "x" * 7,
        "y" * 8,
        "z" * 31,
        "w" * 32,
        "v" * 33,
        "u" * 40,
        "snake🐍",
        "グラフ",
    ] + [f"doc{i:05d}" for i in range(50)]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    jvm = {
        r["s"]: r["h"]
        for r in df.select("s", F.xxhash64("s").alias("h")).collect()
    }
    from beehive_data_etl_spark.sources.spark_datasource import _xxhash64_utf8

    for v in vals:
        assert _xxhash64_utf8(v.encode("utf-8")) == jvm[v], v


def test_state_partition_pruning_plans_one_bucket(ds_table):
    """EqualTo on the key plans exactly the key's bucket."""
    from pyspark.sql.datasource import EqualTo

    sink = ds_table
    snap = sink.current_snapshot()
    key = "whatever-key-0042"
    parts = plan_state_partitions(sink.root, snap, [EqualTo(("doc_id",), key)])
    assert len(parts) <= 1
    if parts:
        assert parts[0].bucket == bucket_of(key, snap["n_buckets"])
    unpruned = plan_state_partitions(sink.root, snap, [])
    assert len(unpruned) > 1


# ------------------------------------------------------------ changelog batch
def test_changes_batch_matches_read_changes(spark, ds_table):
    sink = ds_table
    head = sink.current_snapshot()["version"]
    frm = max(1, head - 2)
    got = (
        spark.read.format("beehive_changes")
        .option("fromVersion", str(frm))
        .option("toVersion", str(head))
        .load(sink.root)
    )
    expect = sink.read_changes(frm, head)
    assert got.columns == expect.columns
    cols = expect.columns
    assert _sorted_rows(got, cols) == _sorted_rows(expect, cols)


def test_changes_bootstrap_window_is_live_state_as_inserts(spark, ds_table):
    sink = ds_table
    head = sink.current_snapshot()["version"]
    got = (
        spark.read.format("beehive_changes")
        .option("fromVersion", "0")
        .option("toVersion", str(head))
        .load(sink.root)
    )
    assert got.filter(F.col("change_type") != "I").count() == 0
    expect = sink.read_final()
    assert got.count() == expect.count()
    assert _sorted_rows(got.select("doc_id", "n_tok"), ["doc_id", "n_tok"]) == \
        _sorted_rows(expect.select("doc_id", "n_tok"), ["doc_id", "n_tok"])


def test_changes_window_all_types_match(spark, tmp_path):
    """A constructed window with one I, one U, one D and one untouched
    doc — the DS emits exactly read_changes' rows."""
    schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("op_sequence", T.LongType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
        ]
    )
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    b1 = [
        ("I", 1, "keep", [1], 1, "s"),
        ("I", 2, "upd", [2], 1, "s"),
        ("I", 3, "del", [3], 1, "s"),
    ]
    sink.apply_batch(spark.createDataFrame(b1, schema), "b1")
    v1 = sink.current_snapshot()["version"]
    b2 = [
        ("U", 10, "upd", [2, 2], 2, "s"),
        ("D", 11, "del", [], 0, "s"),
        ("I", 12, "new", [4], 1, "s"),
    ]
    sink.apply_batch(spark.createDataFrame(b2, schema), "b2")
    v2 = sink.current_snapshot()["version"]
    register(spark)
    got = (
        spark.read.format("beehive_changes")
        .option("fromVersion", str(v1))
        .option("toVersion", str(v2))
        .load(str(tmp_path / "t"))
    )
    expect = sink.read_changes(v1, v2)
    cols = expect.columns
    assert _sorted_rows(got, cols) == _sorted_rows(expect, cols)
    by_key = {r["doc_id"]: r["change_type"] for r in got.collect()}
    assert by_key == {"upd": "U", "del": "D", "new": "I"}


def test_changes_window_prunes_untouched_buckets(spark, ds_table):
    """Rewrite-only / untouched buckets contribute no partitions."""
    sink = ds_table
    head = sink.current_snapshot()["version"]
    all_buckets = len(plan_window_partitions(sink.root, 0, head))
    assert all_buckets > 0
    # a window with no commits plans nothing
    assert plan_window_partitions(sink.root, head, head) == []


# --------------------------------------------------------------- refusals
def test_patch_table_refused(spark, tmp_path):
    root = str(tmp_path / "patch_t")
    schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("op_sequence", T.LongType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("patch_cols", T.ArrayType(T.StringType())),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
        ]
    )
    sink = SnapshotSink(spark, root, n_buckets=2, patch=True)
    rows = [("I", 1, "a", None, [1], 1, "s")]
    sink.apply_batch(spark.createDataFrame(rows, schema), "b1")
    register(spark)
    with pytest.raises(Exception, match="patch"):
        spark.read.format("beehive").load(root).collect()


def test_rollback_window_refused(spark, ds_table):
    sink = ds_table
    # simulate a rollback marker without disturbing the shared table:
    # the guard reads metrics only, so probe the guard directly on a
    # fake snapshot dir
    import json
    import tempfile

    d = tempfile.mkdtemp()
    os.makedirs(os.path.join(d, "_snapshots"))
    for v, m in ((1, {}), (2, {"rollback_to": 1}), (3, {})):
        with open(os.path.join(d, "_snapshots", f"v{v:06d}.json"), "w") as fh:
            json.dump({"version": v, "metrics": m}, fh)
    with pytest.raises(RuntimeError, match="rollback_to"):
        tm.refuse_unstreamable_window(d, 1, 3)
    tm.refuse_unstreamable_window(d, 2, 3)  # window past it is fine


def test_tombstone_floor_advance_refused(spark, tmp_path):
    root = str(tmp_path / "floor_t")
    schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("op_sequence", T.LongType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
        ]
    )
    sink = SnapshotSink(spark, root, n_buckets=2)
    sink.apply_batch(
        spark.createDataFrame([("I", 1, "a", [1]), ("D", 2, "b", [])], schema),
        "b1",
    )
    v1 = sink.current_snapshot()["version"]
    sink.expire_tombstones(3)
    v2 = sink.current_snapshot()["version"]
    assert v2 > v1
    with pytest.raises(RuntimeError, match="tombstone_floor"):
        plan_window_partitions(root, v1, v2)


# --------------------------------------------------------------- streaming
def test_stream_replays_to_final_state_with_restart(spark, tmp_path):
    """End-to-end: readStream over the changelog → foreachBatch LWW
    apply into a second table; stop mid-stream, apply more upstream
    batches, restart from the SAME checkpoint — the consumer converges
    to the upstream final state with no duplicate effects (exactly-once
    via Spark's offset log + deterministic windows)."""
    src_root = str(tmp_path / "src")
    dst_root = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("op_sequence", T.LongType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
        ]
    )
    src = SnapshotSink(spark, src_root, n_buckets=4)
    dst = SnapshotSink(spark, dst_root, n_buckets=4)
    register(spark)

    def apply_window(df, epoch_id):
        events = df.withColumn(
            "op",
            F.when(F.col("change_type") == "D", F.lit("D")).otherwise(
                F.lit("U")
            ),
        ).drop("change_type")
        dst.apply_batch(events, f"ds-epoch-{epoch_id}")

    def run_once():
        # Python stream sources don't implement Trigger.AvailableNow
        # (the JVM wrapper falls back); drain with processAllAvailable
        q = (
            spark.readStream.format("beehive_changes")
            .option("pin", "t1")
            .load(src_root)
            .writeStream.foreachBatch(apply_window)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="500 milliseconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(60)
        if q.exception() is not None:
            raise q.exception()

    n = 40
    rows1 = [("I", i, f"d{i % 10}", [i], 1, "s") for i in range(n)]
    src.apply_batch(spark.createDataFrame(rows1, schema), "b1")
    run_once()
    rows2 = [("U", 100 + i, f"d{i}", [9, i], 2, "s2") for i in range(5)] + [
        ("D", 200, "d9", [], 0, "s")
    ]
    src.apply_batch(spark.createDataFrame(rows2, schema), "b2")
    src.apply_batch(
        spark.createDataFrame([("I", 300, "fresh", [7], 1, "s3")], schema),
        "b3",
    )
    run_once()
    # retention pin follows the stream, lagging one batch (Spark
    # delivers commit() when the NEXT batch is constructed): after the
    # second run it pins the FIRST run's end — at or below every
    # version a replayed window still reads, never above
    pin = tm.load_tags(src_root)["stream-t1"]
    assert 1 <= pin <= src.current_snapshot()["version"]
    want = _sorted_rows(src.read_final(), ["doc_id", "n_tok", "source"])
    got = _sorted_rows(dst.read_final(), ["doc_id", "n_tok", "source"])
    assert got == want
    # tokens byte-parity
    s = {r["doc_id"]: list(r["tokens"]) for r in src.read_final().collect()}
    g = {r["doc_id"]: list(r["tokens"]) for r in dst.read_final().collect()}
    assert s == g
    # re-running with nothing new applies nothing (no-op, no dup batch)
    before = dst.current_snapshot()["version"]
    run_once()
    assert dst.current_snapshot()["version"] == before


# --------------------------------------------------- review-found regressions
def test_bootstrap_skips_history_guard(spark, tmp_path):
    """frm=0 is a pure state copy: markers (rollback/purge/…) or
    expired snapshots anywhere in old history must NOT refuse it, and
    planning must not walk O(history) JSONs (review-found — the same
    exemption Replicator.sync gives its initial full copy)."""
    import json

    schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("op_sequence", T.LongType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
        ]
    )
    root = str(tmp_path / "boot")
    sink = SnapshotSink(spark, root, n_buckets=2)
    sink.apply_batch(
        spark.createDataFrame([("I", 1, "a", [1])], schema), "b1"
    )
    sink.apply_batch(
        spark.createDataFrame([("I", 2, "b", [2])], schema), "b2"
    )
    # forge a purge marker into v1's metrics: a guarded window (1,2]
    # must refuse, but the bootstrap window (0,2] must not
    p = os.path.join(root, "_snapshots", "v000002.json")
    snap = json.load(open(p))
    snap["metrics"]["purge"] = {"keys": ["x"]}
    json.dump(snap, open(p, "w"))
    with pytest.raises(RuntimeError, match="purge"):
        plan_window_partitions(root, 1, 2)
    head = sink.current_snapshot()["version"]
    parts = plan_window_partitions(root, 0, head)
    assert parts  # bootstrap planned fine


def test_changes_batch_schema_is_to_version(spark, tmp_path):
    """A batch window read on a later-evolved table emits the
    TO-version's columns, not the head's (review-found)."""
    schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("op_sequence", T.LongType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
        ]
    )
    root = str(tmp_path / "evo_win")
    sink = SnapshotSink(spark, root, n_buckets=2)
    sink.apply_batch(spark.createDataFrame([("I", 1, "a", [1])], schema), "b1")
    sink.apply_batch(spark.createDataFrame([("U", 2, "a", [2])], schema), "b2")
    v2 = sink.current_snapshot()["version"]
    wider = schema.add("lang", T.StringType())
    sink.apply_batch(
        spark.createDataFrame([("I", 3, "c", [3], "en")], wider), "b3"
    )
    register(spark)
    got = (
        spark.read.format("beehive_changes")
        .option("fromVersion", "1")
        .option("toVersion", str(v2))
        .load(root)
    )
    expect = sink.read_changes(1, v2)
    assert got.columns == expect.columns  # no 'lang' leak from head
    cols = expect.columns
    assert _sorted_rows(got, cols) == _sorted_rows(expect, cols)


def test_pin_tag_monotonic(spark, tmp_path):
    """The stream's retention cursor can never move backward, even
    when a lazy commit races a newer eager pin (review-found)."""
    schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("op_sequence", T.LongType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
        ]
    )
    root = str(tmp_path / "pin")
    sink = SnapshotSink(spark, root, n_buckets=2)
    sink.apply_batch(spark.createDataFrame([("I", 1, "a", [1])], schema), "b1")
    sink.apply_batch(spark.createDataFrame([("I", 2, "b", [2])], schema), "b2")
    tm.pin_tag(root, "stream-x", 2, monotonic=True)
    tm.pin_tag(root, "stream-x", 1, monotonic=True)  # late commit: no-op
    assert tm.load_tags(root)["stream-x"] == 2
    tm.pin_tag(root, "stream-x", 1)  # explicit non-monotonic move works
    assert tm.load_tags(root)["stream-x"] == 1


def test_schema_evolution_alignment_through_ds(spark, tmp_path):
    """Old-schema delta files (missing a later-added column) read as
    typed nulls through the DS — align_to_schema parity."""
    root = str(tmp_path / "evo")
    base = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("op_sequence", T.LongType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
        ]
    )
    sink = SnapshotSink(spark, root, n_buckets=2)
    sink.apply_batch(
        spark.createDataFrame([("I", 1, "a", [1]), ("I", 2, "b", [2])], base),
        "b1",
    )
    wider = base.add("lang", T.StringType())
    sink.apply_batch(
        spark.createDataFrame([("I", 10, "c", [3], "en")], wider), "b2"
    )
    register(spark)
    got = spark.read.format("beehive").load(root)
    expect = sink.read_final()
    assert got.columns == expect.columns
    cols = ["doc_id", "lang"]
    assert _sorted_rows(got.select(*cols), cols) == _sorted_rows(
        expect.select(*cols), cols
    )


def test_random_history_parity_property(spark, tmp_path):
    """Property-style: random multi-batch histories (duplicate
    deliveries, out-of-order seqs, deletes, re-inserts, inline
    compaction via a low threshold) — the DS's Arrow fold and the
    sink's Catalyst fold must byte-agree on every state AND on every
    adjacent changelog window. Two independent implementations of the
    same semantics are the oracle."""
    import random

    rng = random.Random(1234)
    schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("op_sequence", T.LongType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
        ]
    )
    root = str(tmp_path / "prop")
    sink = SnapshotSink(spark, root, n_buckets=4, compact_threshold=3)
    register(spark)
    keys = [f"k{i}" for i in range(17)]
    seqs = list(range(1, 400))
    rng.shuffle(seqs)
    versions = []
    for b in range(6):
        rows = []
        for _ in range(rng.randint(3, 20)):
            k = rng.choice(keys)
            s = seqs.pop()
            if rng.random() < 0.15:
                rows.append(("D", s, k, [], 0, "s"))
            else:
                toks = [rng.randint(0, 99) for _ in range(rng.randint(0, 5))]
                rows.append(("U", s, k, toks, len(toks), f"src{s % 3}"))
        if rows and rng.random() < 0.3:
            rows.append(rows[-1])  # byte-identical duplicate delivery
        sink.apply_batch(spark.createDataFrame(rows, schema), f"pb{b}")
        versions.append(sink.current_snapshot()["version"])
    cols = ["doc_id", "tokens", "n_tok", "source"]
    for v in versions:
        got = (
            spark.read.format("beehive")
            .option("version", str(v))
            .load(root)
        )
        want = sink.read_state(version=v).filter(~F.col("deleted")).select(*cols)
        assert _sorted_rows(got, cols) == _sorted_rows(want, cols), f"v{v}"
    ch_cols = None
    for frm, to in zip(versions, versions[1:]):
        got = (
            spark.read.format("beehive_changes")
            .option("fromVersion", str(frm))
            .option("toVersion", str(to))
            .load(root)
        )
        want = sink.read_changes(frm, to)
        ch_cols = ch_cols or want.columns
        assert _sorted_rows(got, ch_cols) == _sorted_rows(want, ch_cols), (
            frm,
            to,
        )
    # point reads under the key row-group filter agree too
    for k in rng.sample(keys, 5):
        got = (
            spark.read.format("beehive")
            .load(root)
            .filter(F.col("doc_id") == k)
        )
        want = sink.read_final().filter(F.col("doc_id") == k)
        assert _sorted_rows(got, cols) == _sorted_rows(want, cols), k


def test_matching_row_groups_prunes_and_keeps_statless():
    """Unit evidence for the executor-side key row-group prune: sorted
    keys → a point probe admits one group of many; groups without
    stats are kept (never prune without proof)."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from beehive_data_etl_spark.sources.spark_datasource import (
        _matching_row_groups,
    )

    keys = [f"k{i:04d}" for i in range(100)]
    t = pa.table(
        {
            "doc_id": pa.array(keys),
            "tokens": pa.array([[i] for i in range(100)], pa.list_(pa.int32())),
        }
    )
    path = tempfile.mktemp(suffix=".parquet")
    pq.write_table(t, path, row_group_size=10)  # 10 groups, sorted keys
    pf = pq.ParquetFile(path)
    assert pf.metadata.num_row_groups == 10
    assert _matching_row_groups(pf, ["k0055"]) == [5]
    assert _matching_row_groups(pf, ["k0005", "k0095"]) == [0, 9]
    assert _matching_row_groups(pf, ["zzz"]) == []
    nostats = tempfile.mktemp(suffix=".parquet")
    pq.write_table(t, nostats, row_group_size=10, write_statistics=False)
    pf2 = pq.ParquetFile(nostats)
    assert _matching_row_groups(pf2, ["k0055"]) == list(range(10))


def test_changes_stream_reader_resolves_tag_start(spark, tmp_path):
    """Review r04: startingVersion goes through resolve_ref like the
    batch reader's fromVersion — a TAG works, numeric strings keep
    working, and an unknown tag fails with the guided tag error, not a
    bare int() ValueError."""
    from beehive_data_etl_spark.sources.spark_datasource import (
        BeehiveChangesStreamReader,
    )

    root = str(tmp_path / "t")
    sink = SnapshotSink(spark, root, n_buckets=2)
    sink.apply_batch(
        spark.createDataFrame(
            [("I", 1, "d1", [1], 1, "s")],
            "op string, op_sequence long, doc_id string, "
            "tokens array<int>, n_tok int, source string",
        ),
        "b1",
    )
    sink.tag("start-here", sink.current_snapshot()["version"])
    schema = T.StructType([T.StructField("doc_id", T.StringType())])
    r = BeehiveChangesStreamReader(
        schema, {"path": root, "startingVersion": "start-here"}
    )
    assert r.start == sink.current_snapshot()["version"]
    r2 = BeehiveChangesStreamReader(schema, {"path": root})
    assert r2.start == 0
    with pytest.raises(KeyError, match="no tag"):
        BeehiveChangesStreamReader(
            schema, {"path": root, "startingVersion": "nope"}
        )
