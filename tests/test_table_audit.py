"""Table-level write contracts (SnapshotSink.set_table_audit): the
standard token audit recorded in table METADATA and enforced by every
writer — a second sink object with no constructor audit, and the Data
Source write path via a pyarrow rule twin.

Pins:
- a fresh sink object (no audit arg) refuses a contract-violating
  batch; dropping the contract restores permissiveness;
- the contract survives ordinary commits AND rollback_to (the
  session-5 'patch' key lesson);
- DS writes count violations executor-side and refuse at commit,
  staging cleaned, nothing committed; compliant DS writes pass;
- the pyarrow rule twin counts EXACTLY what the Spark rules count on
  an adversarial batch (nulls, Kleene edges, dead rows);
- a contract change between DS plan and commit is refused;
- set_table_audit refuses tables lacking the contract's columns."""

import os

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.operators.audit import AuditError
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.sources.spark_datasource import (
    BeehiveBatchWriter,
    _arrow_audit_counts,
    register,
)

SCHEMA = (
    "op string, op_sequence long, doc_id string, tokens array<int>, "
    "n_tok int, source string"
)
GOOD = [("I", 100 + i, f"d-{i}", [i, i], 2, "s") for i in range(6)]
# one violation of each rule class + Kleene edge cases
BAD = [
    ("I", 200, "d-0", [], 0, "s"),  # live_empty_tokens + bad n_tok
    ("I", 201, "d-1", [1, 2, 3], 2, "s"),  # n_tok != size(tokens)
    ("I", 0, "d-2", [1], 1, "s"),  # nonpositive op_sequence
    ("I", 203, "", [1], 1, "s"),  # empty doc_id
    # NULL tokens with SET n_tok: live_empty_tokens fires; the
    # n_tok != size(NULL) comparison is NULL in both engines and must
    # NOT count toward live_bad_n_tok
    ("I", 204, "d-4", None, 5, "s"),
    ("D", 205, "d-5", None, None, None),  # tombstone: exempt
]


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def sink(spark, tmp_path):
    s = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    s.apply_batch(_batch(spark, GOOD), "b1")
    s.set_table_audit()
    return s


def test_second_sink_object_enforces_contract(spark, sink):
    other = SnapshotSink(spark, sink.root, n_buckets=4)  # no audit arg
    v0 = other.current_snapshot()["version"]
    with pytest.raises(AuditError, match="live_empty_tokens"):
        other.apply_batch(_batch(spark, BAD), "b-bad")
    assert other.current_snapshot()["version"] == v0
    other.apply_batch(
        _batch(spark, [("U", 300, "d-0", [9], 1, "s")]), "b-good"
    )
    assert other.current_snapshot()["version"] == v0 + 1
    sink.drop_table_audit()
    other.apply_batch(_batch(spark, BAD), "b-bad2")  # permissive again
    assert {r["doc_id"] for r in sink.read_final().collect()} >= {"d-1"}


def test_contract_survives_commits_and_rollback(spark, sink):
    sink.apply_batch(_batch(spark, [("U", 300, "d-0", [9], 1, "s")]), "b2")
    head = sink.current_snapshot()
    assert head["audit"]["standard"]["max_violations"] == 0
    v_tagged = head["version"]
    sink.apply_batch(_batch(spark, [("U", 301, "d-1", [8], 1, "s")]), "b3")
    sink.rollback_to(v_tagged)
    assert sink.current_snapshot()["audit"] is not None
    with pytest.raises(AuditError):
        sink.apply_batch(_batch(spark, BAD), "b-bad")


@pytest.fixture(scope="module")
def ds_spark(spark):
    register(spark)
    return spark


def test_ds_write_enforces_contract(ds_spark, tmp_path):
    root = str(tmp_path / "t")
    s = SnapshotSink(ds_spark, root, n_buckets=4)
    s.apply_batch(_batch(ds_spark, GOOD), "b1")
    s.set_table_audit()
    with pytest.raises(Exception, match="failed audit"):
        _batch(ds_spark, BAD).write.format("beehive").option(
            "batchId", "ds-bad"
        ).mode("append").save(root)
    head = s.current_snapshot()
    assert "ds-bad" not in head["committed_batches"]
    assert not [
        d for d in os.listdir(os.path.join(root, "data"))
        if d.startswith("_stage-ds")
    ]
    _batch(ds_spark, [("U", 300, "d-0", [9], 1, "s")]).write.format(
        "beehive"
    ).option("batchId", "ds-good").mode("append").save(root)
    assert "ds-good" in s.current_snapshot()["committed_batches"]


def test_arrow_twin_matches_spark_rules(spark, sink):
    """The parity pin: the executor-side pyarrow counts equal the
    Spark-rule counts (via the sink's own table-audit callable) on the
    same STORED-form rows."""
    stored = (
        _batch(spark, BAD)
        .withColumn("deleted", F.col("op") == "D")
        .select(
            "doc_id",
            *[
                F.when(F.col("op") != "D", F.col(c)).alias(c)
                for c in ("tokens", "n_tok", "source")
            ],
            F.col("op_sequence"),
            "deleted",
        )
    )
    fn = sink._table_audit_fn(sink.current_snapshot())
    with pytest.raises(AuditError) as exc:
        fn(stored, {"batch_id": "parity"})
    spark_counts = exc.value.violations
    arrow_counts = _arrow_audit_counts(stored.toArrow(), 1_000_000)
    assert {k: v for k, v in arrow_counts.items() if v > 0} == spark_counts
    # the Kleene edge: NULL tokens + set n_tok is exactly ONE
    # live_empty_tokens violation and ZERO extra live_bad_n_tok in
    # both engines
    assert arrow_counts["live_empty_tokens"] == 2  # d-0 (empty), d-4 (null)
    assert arrow_counts["live_bad_n_tok"] == 2  # d-0 (0), d-1 (mismatch)


def test_ds_contract_change_between_plan_and_commit(ds_spark, tmp_path):
    root = str(tmp_path / "t")
    s = SnapshotSink(ds_spark, root, n_buckets=4)
    s.apply_batch(_batch(ds_spark, GOOD), "b1")
    w = BeehiveBatchWriter(
        root, _batch(ds_spark, GOOD).schema,
        {"path": root, "batchId": "unit"}, False,
    )
    import pyarrow as pa

    sch = pa.schema(
        [
            ("op", pa.string()),
            ("op_sequence", pa.int64()),
            ("doc_id", pa.string()),
            ("tokens", pa.list_(pa.int32())),
            ("n_tok", pa.int32()),
            ("source", pa.string()),
        ]
    )
    cols = list(zip(*[("U", 300, "d-0", [9], 1, "s")]))
    msg = w.write(
        iter(
            [
                pa.RecordBatch.from_arrays(
                    [pa.array(c, t.type) for c, t in zip(cols, sch)],
                    schema=sch,
                )
            ]
        )
    )
    s.set_table_audit()  # contract lands AFTER the write planned
    with pytest.raises(RuntimeError, match="write contract"):
        w.commit([msg])
    assert "unit" not in s.current_snapshot()["committed_batches"]


def test_contract_is_batch_scoped_not_table_scoped(spark, tmp_path):
    """Tightening a contract must not wedge ingestion: an inline
    compaction folds OLD rows (written under the laxer contract) into
    staging, and the batch-scoped audit must judge only the BATCH's
    rows (review-found: the staged-bytes version re-judged history on
    every compaction touch)."""
    # threshold 1 = copy-on-write: every touch folds the old deltas,
    # so b2 is guaranteed to drag the violating b1 rows into staging
    s = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=2,
                     compact_threshold=1)
    s.apply_batch(_batch(spark, GOOD), "b1")  # n_tok=2 rows
    s.set_table_audit(max_n_tok=1)  # OLD rows now violate
    v0 = s.current_snapshot()["version"]
    # a compliant batch touching every bucket triggers inline
    # compaction of the violating old rows — and must still commit
    s.apply_batch(
        _batch(spark, [("U", 400 + i, f"d-{i}", [9], 1, "s")
                       for i in range(6)]),
        "b2",
    )
    assert s.current_snapshot()["version"] == v0 + 1
    assert s.current_snapshot()["metrics"]["compacted_buckets"]
    # while a batch whose OWN rows violate is still refused
    with pytest.raises(AuditError, match="live_bad_n_tok"):
        s.apply_batch(
            _batch(spark, [("U", 500, "d-0", [1, 2], 2, "s")]), "b3"
        )


def test_min_rows_fires_on_empty_batch(spark, sink):
    sink.drop_table_audit()
    sink.set_table_audit(min_rows=1)
    v0 = sink.current_snapshot()["version"]
    with pytest.raises(AuditError, match="min_rows"):
        sink.apply_batch(_batch(sink.spark, []), "b-empty")
    head = sink.current_snapshot()
    # nothing committed — the corrected re-send under the same id works
    assert head["version"] == v0
    assert "b-empty" not in head["committed_batches"]
    sink.apply_batch(
        _batch(sink.spark, [("U", 400, "d-0", [9], 1, "s")]), "b-empty"
    )
    assert "b-empty" in sink.current_snapshot()["committed_batches"]


def test_sink_batch_in_flight_refused_on_contract_change(spark, tmp_path):
    """The sink mirrors the DS guard: a batch planned before
    set_table_audit is refused at its commit (crash-equivalently),
    not silently committed unaudited."""
    s = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    s.apply_batch(_batch(spark, GOOD), "b1")

    def hook(point):
        if point == "after_data_write" and not getattr(hook, "done", False):
            hook.done = True
            SnapshotSink(spark, s.root, n_buckets=2).set_table_audit()

    s.crash_hook = hook
    with pytest.raises(RuntimeError, match="write contract"):
        s.apply_batch(_batch(spark, BAD), "b2")
    s.crash_hook = lambda point: None
    # re-applying enforces the now-current contract
    with pytest.raises(AuditError):
        s.apply_batch(_batch(spark, BAD), "b2")


def test_ds_redelivery_of_committed_batch_skips_despite_new_contract(
    ds_spark, tmp_path
):
    """Exactly-once beats the audit: a batch that committed BEFORE the
    contract existed re-delivers as the documented idempotent skip,
    never as an AuditError (review-found ordering)."""
    root = str(tmp_path / "t")
    s = SnapshotSink(ds_spark, root, n_buckets=4)
    s.apply_batch(_batch(ds_spark, GOOD), "b1")
    _batch(ds_spark, BAD).write.format("beehive").option(
        "batchId", "ds-x"
    ).mode("append").save(root)  # commits: no contract yet
    s.set_table_audit()
    v0 = s.current_snapshot()["version"]
    _batch(ds_spark, BAD).write.format("beehive").option(
        "batchId", "ds-x"
    ).mode("append").save(root)  # re-delivery: silent skip
    assert s.current_snapshot()["version"] == v0


def test_set_table_audit_refusals(spark, tmp_path):
    s = SnapshotSink(spark, str(tmp_path / "n"), n_buckets=2)
    with pytest.raises(ValueError, match="no snapshot"):
        s.set_table_audit()
    s.apply_batch(
        spark.createDataFrame(
            [("I", 1, "k", 2.0)],
            "op string, op_sequence long, doc_id string, score double",
        ),
        "b1",
    )
    with pytest.raises(ValueError, match="needs column"):
        s.set_table_audit()
    t2 = SnapshotSink(spark, str(tmp_path / "t2"), n_buckets=2)
    t2.apply_batch(_batch(spark, GOOD[:1]), "b1")
    with pytest.raises(ValueError, match="max_rows"):
        t2.set_table_audit(max_rows=-1)
    with pytest.raises(ValueError, match="max_n_tok"):
        t2.set_table_audit(max_n_tok=0)


def test_ds_contract_params_change_between_plan_and_commit(ds_spark, tmp_path):
    """Review r04 (stream-writer shape): write tasks that counted
    violations under contract spec A must not have those counts
    enforced by a commit-side instance holding spec B — the counts
    say nothing about the changed parameters. The commit refuses with
    the stale-spec message instead of publishing silently (the locked
    audit-change guard alone is vacuous here because the FRESH
    commit-side instance plans under B, matching the head)."""
    import pyarrow as pa

    root = str(tmp_path / "t")
    s = SnapshotSink(ds_spark, root, n_buckets=4)
    s.apply_batch(_batch(ds_spark, GOOD), "b1")
    s.set_table_audit(max_n_tok=1_000_000)  # spec A
    w1 = BeehiveBatchWriter(
        root, _batch(ds_spark, GOOD).schema,
        {"path": root, "batchId": "unit2"}, False,
    )
    sch = pa.schema(
        [
            ("op", pa.string()),
            ("op_sequence", pa.int64()),
            ("doc_id", pa.string()),
            ("tokens", pa.list_(pa.int32())),
            ("n_tok", pa.int32()),
            ("source", pa.string()),
        ]
    )
    # n_tok=5000 is clean under A (max 1M) but violates B (max 1000)
    cols = list(zip(*[("U", 300, "d-0", list(range(5000)), 5000, "s")]))
    msg = w1.write(
        iter(
            [
                pa.RecordBatch.from_arrays(
                    [pa.array(c, t.type) for c, t in zip(cols, sch)],
                    schema=sch,
                )
            ]
        )
    )
    assert msg.audit_counts is not None and msg.audit_spec is not None
    s.set_table_audit(max_n_tok=1000)  # tightened to spec B mid-flight
    # commit-side re-instantiation (what Spark does for stream writers)
    w2 = BeehiveBatchWriter(
        root, _batch(ds_spark, GOOD).schema,
        {"path": root, "batchId": "unit2"}, False,
    )
    w2.staging = w1.staging
    with pytest.raises(RuntimeError, match="different contract spec"):
        w2.commit([msg])
    assert "unit2" not in s.current_snapshot()["committed_batches"]
