"""Dead-letter re-drive (scripts/redrive_job.py): quarantined envelope
violations, repaired in flight, re-enter the table as one idempotent
batch; unfixable rows stay quarantined; consumed inputs are archived."""

import os
import sys

from pyspark.sql import functions as F

from beehive_data_etl_spark.operators.validate import validating_transform
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.sources.readers import read_wal
from beehive_data_etl_spark.verify import compare_final, oracle_final_spark

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from redrive_job import _parse_fixes, redrive  # noqa: E402


def _corrupt(df):
    """Break ~1/3 of upserts with a wrong n_tok (fixable) and a few ops
    with an unknown op code (unfixable)."""
    h = F.abs(F.xxhash64("doc_id", "op_sequence")) % 9
    return df.withColumn(
        "n_tok",
        F.when((F.col("op") != "D") & (h < 3), F.col("n_tok") + 7).otherwise(
            F.col("n_tok")
        ),
    ).withColumn(
        "op", F.when(h == 8, F.lit("X")).otherwise(F.col("op"))
    )


def test_redrive_repairs_and_applies(spark, smoke_log, tmp_path):
    qdir = str(tmp_path / "quarantine")
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=8)
    vt = validating_transform(quarantine_dir=qdir)
    batch = _corrupt(read_wal(spark, smoke_log))
    sink.apply_batch(vt(batch), "b1")
    assert len(os.listdir(qdir)) > 0

    out = redrive(
        spark, qdir, sink, fixes=_parse_fixes("n_tok=size(tokens)")
    )
    assert out["redriven_files"] > 0
    assert out["remaining"] > 0  # the op='X' rows are unfixable
    assert not out["commit"].get("skipped")
    # the wrong-n_tok rows are back; only the op='X' rows are missing —
    # compare against the full-log oracle minus those keys' events
    h = F.abs(F.xxhash64("doc_id", "op_sequence")) % 9
    oracle = oracle_final_spark(spark, smoke_log)
    lost = (
        read_wal(spark, smoke_log)
        .withColumn("_h", h)
        .filter("_h = 8")
        .select("doc_id", F.col("op_sequence").alias("_lost_seq"))
    )
    # a doc whose WINNING event was dropped (op X) may differ; every
    # other doc must match byte-exactly
    affected = {r.doc_id for r in lost.collect()}
    state = sink.read_state().filter("NOT deleted").filter(
        ~F.col("doc_id").isin(list(affected))
    )
    report = compare_final(
        state, oracle.filter(~F.col("doc_id").isin(list(affected)))
    )
    assert report["ok"], report
    # remaining dir holds ONLY the unfixable reason
    rem = spark.read.parquet(out["remaining_dir"])
    assert set(r["_reject_reason"] for r in rem.collect()) == {"bad_op"}

    # re-run over the now-archived quarantine: nothing to do
    again = redrive(spark, qdir, sink, fixes=_parse_fixes("n_tok=size(tokens)"))
    assert again.get("skipped")


def test_redrive_idempotent_batch_id(spark, smoke_log, tmp_path):
    """Crash-between-commit-and-archive: a re-run over the SAME files
    skips at the sink (content-hashed batch id) and completes."""
    qdir = str(tmp_path / "q")
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    vt = validating_transform(quarantine_dir=qdir)
    sink.apply_batch(
        vt(_corrupt(read_wal(spark, smoke_log))), "b1"
    )
    out1 = redrive(spark, qdir, sink, fixes=_parse_fixes("n_tok=size(tokens)"))
    bid = out1["batch_id"]
    # simulate the crash: move the archived files BACK
    archive = os.path.join(qdir, f"_redriven-{bid}")
    for f in os.listdir(archive):
        os.rename(os.path.join(archive, f), os.path.join(qdir, f))
    out2 = redrive(spark, qdir, sink, fixes=_parse_fixes("n_tok=size(tokens)"))
    assert out2["batch_id"] == bid
    assert out2["commit"].get("skipped")  # sink-level exactly-once


def test_parse_fixes_allows_commas_in_exprs():
    fixes = _parse_fixes(
        "n_tok=coalesce(n_tok, size(tokens)); source=concat(source, '-fixed')"
    )
    assert fixes == {
        "n_tok": "coalesce(n_tok, size(tokens))",
        "source": "concat(source, '-fixed')",
    }


def test_wrong_fix_commits_nothing_and_is_retryable(spark, smoke_log, tmp_path):
    """A fix that repairs nothing must NOT consume the quarantine or
    commit a batch — and a corrected fix afterwards must be a NEW batch
    that applies (review-found: the name-only hash made the retry a
    silent no-op)."""
    qdir = str(tmp_path / "q")
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    vt = validating_transform(quarantine_dir=qdir)
    # corrupt ONLY with wrong n_tok (all rows fixable by the right fix)
    batch = read_wal(spark, smoke_log).withColumn(
        "n_tok",
        F.when(F.col("op") != "D", F.col("n_tok") + 7).otherwise(F.col("n_tok")),
    )
    sink.apply_batch(vt(batch), "b1")
    n_files = len([f for f in os.listdir(qdir) if f.endswith(".parquet")])
    assert n_files > 0

    wrong = redrive(spark, qdir, sink, fixes=_parse_fixes("n_tok=n_tok"))
    assert wrong.get("skipped") and "untouched" in wrong["reason"]
    # quarantine intact, nothing committed, no stray dirs
    assert len([f for f in os.listdir(qdir) if f.endswith(".parquet")]) == n_files
    assert not sink.committed(wrong["batch_id"])

    right = redrive(spark, qdir, sink, fixes=_parse_fixes("n_tok=size(tokens)"))
    assert right["batch_id"] != wrong["batch_id"]  # fix is part of the id
    assert right["redriven_rows"] > 0 and right["remaining"] == 0
    assert sink.committed(right["batch_id"])


def test_patch_envelope_redrive(spark, tmp_path):
    """REPLAY_PATCH re-drive: patch events ('P' + mask) must survive
    re-validation (review-found: the row-envelope rules rejected every
    patch as bad_op, making patch quarantines un-redrivable)."""
    import pandas as pd

    from beehive_data_etl_spark.operators.validate import validate_envelope

    qdir = str(tmp_path / "q")
    os.makedirs(qdir)
    sink = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4, patch=True)
    schema = (
        "op string, op_sequence long, doc_id string, tokens array<int>, "
        "n_tok int, source string, patch_cols array<string>"
    )
    rows = [
        # good insert + good patch; one patch with a broken n_tok
        # (fixable) and one with an empty mask (unfixable)
        {"op": "I", "op_sequence": 1, "doc_id": "d0", "tokens": [1, 2],
         "n_tok": 2, "source": "s", "patch_cols": None},
        {"op": "P", "op_sequence": 2, "doc_id": "d0", "tokens": [3, 4, 5],
         "n_tok": 9, "source": None, "patch_cols": ["tokens", "n_tok"]},
        {"op": "P", "op_sequence": 3, "doc_id": "d0", "tokens": None,
         "n_tok": None, "source": "x", "patch_cols": []},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows), schema=schema)
    valid, rejected = validate_envelope(df, patch=True)
    assert valid.count() == 1  # the insert
    reasons = {r["_reject_reason"] for r in rejected.collect()}
    assert reasons == {"n_tok_mismatch", "empty_patch_mask"}
    rejected.write.mode("overwrite").parquet(qdir)
    sink.apply_batch(valid, "b1")

    out = redrive(
        spark, qdir, sink,
        fixes=_parse_fixes("n_tok=coalesce(size(tokens), n_tok)"),
        patch=True,
    )
    assert out["redriven_rows"] == 1  # the repaired patch
    assert out["remaining"] == 1  # empty-mask patch stays dead
    row = sink.read_final().collect()[0]
    assert row["tokens"] == [3, 4, 5] and row["n_tok"] == 3
    assert row["source"] == "s"  # patch left unmasked cells alone
