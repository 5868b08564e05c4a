"""A2 envelope validation + JSON envelope parsing: malformed events are
quarantined with reasons; good events merge; a corrupted JSON record
degrades to a rejected row instead of failing the job."""

import glob
import json

from pyspark.sql import functions as F

from beehive_data_etl_spark.operators.validate import (
    REASON_COL,
    validate_envelope,
    validating_transform,
)
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.sources.json_envelope import parse_json_envelope
from beehive_data_etl_spark.streaming.replay import replay_incremental
from beehive_data_etl_spark.verify import compare_final, oracle_final_spark

ENVELOPE = (
    "op string, op_sequence long, doc_id string, tokens array<int>, "
    "n_tok int, source string"
)


def _bad_rows(spark):
    rows = [
        ("X", 100, "doc-1", [1, 2], 2, "s"),          # bad_op
        (None, 107, "doc-8", [1], 1, "s"),            # bad_op: NULL op (a
        # JSON envelope missing only `op` parses to null — must NOT pass
        # as valid-with-NULL-deleted, which would act as a silent delete)
        ("U", 101, None, [1], 1, "s"),                # null_doc_id
        ("U", None, "doc-2", [1], 1, "s"),            # null_op_sequence
        ("I", 102, "doc-3", None, 0, "s"),            # missing_payload
        ("U", 103, "doc-4", [1, 2, 3], 99, "s"),      # n_tok_mismatch
        ("D", 104, "doc-5", [9], 1, "s"),             # delete_with_payload
        ("U", 105, "doc-6", [7, 8], 2, "s"),          # VALID
        ("D", 106, "doc-7", None, None, "s"),         # VALID delete
    ]
    return spark.createDataFrame(rows, ENVELOPE)


def test_validate_envelope_reasons(spark):
    valid, rejected = validate_envelope(_bad_rows(spark))
    reasons = {r.doc_id: r[REASON_COL] for r in rejected.collect()}
    assert reasons == {
        "doc-1": "bad_op",
        "doc-8": "bad_op",
        None: "null_doc_id",
        "doc-2": "null_op_sequence",
        "doc-3": "missing_payload",
        "doc-4": "n_tok_mismatch",
        "doc-5": "delete_with_payload",
    }
    assert {r.doc_id for r in valid.collect()} == {"doc-6", "doc-7"}


def test_replay_with_validation_quarantines(spark, smoke_log, tmp_path):
    """The smoke log is fully valid — replay through the validator must
    be a no-op on the result, and the quarantine stays empty."""
    qdir = str(tmp_path / "quarantine")
    sink = SnapshotSink(spark, str(tmp_path / "sink"), n_buckets=8)
    replay_incremental(
        spark, smoke_log, sink, files_per_batch=4,
        transform=validating_transform(qdir),
    )
    state = sink.read_state()
    report = compare_final(
        state.filter(~state.deleted), oracle_final_spark(spark, smoke_log)
    )
    assert report["ok"], report
    # the quarantine write always runs (no isEmpty probe — that was a
    # second scan per batch), but clean batches prune their own
    # metadata-only part files (ADVICE round 2): a long stream must not
    # accumulate one empty file per batch
    import os as _os

    # include dotfiles: local filesystems write a hidden .<part>.crc
    # sidecar per part file, which the prune must also remove (glob
    # skips dotfiles and would green-light unbounded crc accumulation).
    # _SUCCESS and its sidecar are a single overwritten marker — bounded,
    # so exempt.
    leftovers = [
        f
        for f in (_os.listdir(qdir) if _os.path.isdir(qdir) else [])
        if (f.endswith(".parquet") or f.endswith(".crc")) and "_SUCCESS" not in f
    ]
    assert leftovers == []


def test_replay_quarantines_injected_bad_events(spark, smoke_log, tmp_path):
    """Inject malformed events into the stream via a corrupting
    transform; they must land in quarantine and NOT in the table."""
    qdir = str(tmp_path / "quarantine")
    validator = validating_transform(qdir)

    def corrupt_then_validate(batch):
        poisoned = batch.withColumn(
            "op",
            F.when(F.col("op_sequence") % 100 == 7, F.lit("Z")).otherwise(
                F.col("op")
            ),
        )
        return validator(poisoned)

    sink = SnapshotSink(spark, str(tmp_path / "sink"), n_buckets=8)
    replay_incremental(
        spark, smoke_log, sink, files_per_batch=4, transform=corrupt_then_validate
    )
    qfiles = glob.glob(qdir + "/*.parquet")
    assert qfiles
    quarantined = spark.read.parquet(qdir)
    assert quarantined.count() > 0
    assert set(
        r[REASON_COL] for r in quarantined.select(REASON_COL).distinct().collect()
    ) == {"bad_op"}
    # none of the poisoned op_sequences reached the table
    state = sink.read_state()
    assert state.filter(state.op_sequence % 100 == 7).count() == 0


def test_json_envelope_parse_and_degrade(spark):
    recs = [
        (json.dumps({"op": "I", "op_sequence": 1, "doc_id": "doc-1",
                     "tokens": [1, 2, 3], "n_tok": 3, "source": "s"}),),
        (json.dumps({"op": "D", "op_sequence": 2, "doc_id": "doc-1"}),),
        ("{this is not json",),
    ]
    df = spark.createDataFrame(recs, "value string")
    env = parse_json_envelope(df)
    valid, rejected = validate_envelope(env)
    good = {(r.op, r.op_sequence) for r in valid.collect()}
    assert good == {("I", 1), ("D", 2)}
    bad = rejected.collect()
    assert len(bad) == 1 and bad[0][REASON_COL] in ("bad_op", "null_doc_id")
    # parsed payload is intact and typed
    row = valid.filter(F.col("op") == "I").collect()[0]
    assert row.tokens == [1, 2, 3] and row.n_tok == 3


def test_prune_skips_corrupt_parquet_and_removes_crc(tmp_path):
    """Review (round 3): best-effort prune must skip unreadable
    candidates (pyarrow raises ArrowInvalid, a ValueError — not
    OSError) and must take the hidden .crc sidecar down with the
    empty part file."""
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from beehive_data_etl_spark.operators.validate import _prune_empty_parts

    qdir = tmp_path / "q"
    qdir.mkdir()
    (qdir / "corrupt.parquet").write_bytes(b"")  # truncated/zero-byte
    empty = pa.table({"x": pa.array([], type=pa.int64())})
    pq.write_table(empty, qdir / "part-0.parquet")
    (qdir / ".part-0.parquet.crc").write_bytes(b"\x00")
    full = pa.table({"x": pa.array([1], type=pa.int64())})
    pq.write_table(full, qdir / "part-1.parquet")
    _prune_empty_parts(str(qdir), since=_time.time() - 60)  # must not raise
    names = sorted(p.name for p in qdir.iterdir())
    assert names == ["corrupt.parquet", "part-1.parquet"]
