"""General MERGE INTO (operators.merge): arbitrary-condition upserts
as ordinary exactly-once change batches.

Pins:
- all four clause kinds land the right final state (hand-computed
  oracle) and are changelog-visible like any other batch;
- clause order: matched DELETE is checked before UPDATE;
- the lookup-pruned target path and the full-state join path agree;
- skip_unchanged drops no-op updates (and commits nothing when the
  whole merge is a no-op);
- patch tables get masked P updates that compose with later
  out-of-order patches to OTHER columns;
- new columns ride normal schema evolution;
- malformed sources / protected columns / dead clauses are refused;
- explicit batch_id dedupes at the sink; dry_run commits nothing;
- merge_into_sql renders the Iceberg twin with the same clause order."""

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.operators.merge import merge_into, merge_into_sql
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink

SCHEMA = (
    "op string, op_sequence long, doc_id string, tokens array<int>, "
    "n_tok int, source string"
)
SRC_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def sink(spark, tmp_path):
    s = SnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    s.apply_batch(
        _batch(
            spark,
            [
                ("I", 100 + i, f"d-{i}", [i], i, "old" if i < 5 else "new")
                for i in range(10)
            ],
        ),
        "b1",
    )
    return s


def _state(sink):
    return {
        r["doc_id"]: (r["tokens"], r["n_tok"], r["source"])
        for r in sink.read_final().collect()
    }


def test_merge_all_clauses(sink, spark):
    # source: updates d-0..d-2 (matched), d-3 matched-delete target,
    # m-0/m-1 new inserts; by-source deletes everything else
    src = spark.createDataFrame(
        [
            ("d-0", [90], 90, "merged"),
            ("d-1", [91], 91, "merged"),
            ("d-2", [92], 92, "merged"),
            ("d-3", [93], 93, "kill"),
            ("m-0", [80], 80, "merged"),
            ("m-1", [81], 81, "merged"),
        ],
        SRC_SCHEMA,
    )
    v0 = sink.current_snapshot()["version"]
    out = merge_into(
        sink,
        src,
        when_matched_delete=True,
        delete_condition="s.source = 'kill'",
        when_matched_update={
            "tokens": "s.tokens",
            "n_tok": "s.n_tok + t.n_tok",
            "source": "s.source",
        },
        when_not_matched_insert=True,
        when_not_matched_by_source_delete=True,
        by_source_delete_condition="t.source = 'old'",
    )
    assert out["inserted"] == 2
    assert out["updated"] == 3
    # d-3 (matched delete) + d-4 (by-source, source='old'; d-0..2 were
    # matched so not by-source candidates; 5..9 are 'new')
    assert out["deleted"] == 2
    st = _state(sink)
    assert st["d-0"] == ([90], 90 + 0, "merged")
    assert st["d-2"] == ([92], 92 + 2, "merged")
    assert "d-3" not in st and "d-4" not in st
    assert st["m-0"] == ([80], 80, "merged")
    for i in range(5, 10):  # untouched: matched no clause? no — they
        # weren't in the source and source='new' fails the by-source cond
        assert st[f"d-{i}"] == ([i], i, "new")
    # changelog-visible at one shared fresh sequence
    ch = sink.read_changes_pruned(v0, out["version"]).collect()
    assert {r["doc_id"] for r in ch} == {
        "d-0", "d-1", "d-2", "d-3", "d-4", "m-0", "m-1"
    }
    assert {r["op_sequence"] for r in ch} == {out["op_sequence"]}


def test_lookup_pruned_and_full_paths_agree(sink, spark, tmp_path):
    src = spark.createDataFrame(
        [("d-1", [70], 70, "x"), ("m-9", [71], 71, "x")], SRC_SCHEMA
    )
    merge_into(
        sink, src,
        when_matched_update={"n_tok": "s.n_tok"},
        when_not_matched_insert=True,
    )
    pruned = _state(sink)
    s2 = SnapshotSink(sink.spark, str(tmp_path / "t2"), n_buckets=4)
    s2.apply_batch(
        _batch(
            sink.spark,
            [
                ("I", 100 + i, f"d-{i}", [i], i, "old" if i < 5 else "new")
                for i in range(10)
            ],
        ),
        "b1",
    )
    merge_into(
        s2, src,
        when_matched_update={"n_tok": "s.n_tok"},
        when_not_matched_insert=True,
        lookup_cap=0,  # force the full-state join path
    )
    assert _state(s2) == pruned


def test_skip_unchanged_noop_commits_nothing(sink, spark):
    src = spark.createDataFrame([("d-7", [7], 7, "new")], SRC_SCHEMA)
    v0 = sink.current_snapshot()["version"]
    out = merge_into(
        sink, src,
        when_matched_update={"tokens": "s.tokens", "n_tok": "s.n_tok",
                             "source": "s.source"},
        skip_unchanged=True,
    )
    assert out["updated"] == 0 and out["batch_id"] is None
    assert sink.current_snapshot()["version"] == v0
    # default (SQL semantics) re-stamps the row
    out2 = merge_into(
        sink, src,
        when_matched_update={"tokens": "s.tokens", "n_tok": "s.n_tok",
                             "source": "s.source"},
    )
    assert out2["updated"] == 1
    assert sink.current_snapshot()["version"] > v0


def test_merge_patch_table_masked_update_composes(spark, tmp_path):
    s = SnapshotSink(spark, str(tmp_path / "p"), n_buckets=4, patch=True)
    full = spark.createDataFrame(
        [("I", 100, "d-0", ["d-0"], [1, 2], 2, "src")],
        "op string, op_sequence long, doc_id string, patch_cols array<string>, "
        "tokens array<int>, n_tok int, source string",
    ).withColumn("patch_cols", F.lit(None).cast("array<string>"))
    s.apply_batch(full, "b1")
    src = spark.createDataFrame(
        [("d-0", 99), ("m-0", 50)], "doc_id string, n_tok int"
    )
    out = merge_into(
        s, src,
        when_matched_update={"n_tok": "s.n_tok"},
        when_not_matched_insert={"n_tok": "s.n_tok",
                                 "source": "'fresh'"},
    )
    assert out["updated"] == 1 and out["inserted"] == 1
    st = {r["doc_id"]: r.asDict() for r in s.read_final().collect()}
    # masked update: tokens/source untouched on d-0
    assert st["d-0"]["n_tok"] == 99
    assert st["d-0"]["tokens"] == [1, 2] and st["d-0"]["source"] == "src"
    assert st["m-0"]["n_tok"] == 50 and st["m-0"]["tokens"] is None
    # a LATE patch to a DIFFERENT column (lower seq than the merge)
    # still composes — the merge masked only n_tok
    late = spark.createDataFrame(
        [("P", 150, "d-0", ["source"], None, None, "late")],
        "op string, op_sequence long, doc_id string, patch_cols array<string>, "
        "tokens array<int>, n_tok int, source string",
    )
    s.apply_batch(late, "b-late")
    st = {r["doc_id"]: r.asDict() for r in s.read_final().collect()}
    assert st["d-0"]["source"] == "late"  # late patch wins its cell
    assert st["d-0"]["n_tok"] == 99  # merge's cell survives


def test_merge_new_column_evolves_schema(sink, spark):
    src = spark.createDataFrame([("m-0", 1)], "doc_id string, quality int")
    merge_into(sink, src, when_not_matched_insert={"quality": "s.quality"})
    row = {r["doc_id"]: r for r in sink.read_final().collect()}
    assert row["m-0"]["quality"] == 1
    assert row["d-0"]["quality"] is None


def test_merge_refusals(sink, spark):
    src = spark.createDataFrame([("d-0", [1], 1, "x")], SRC_SCHEMA)
    with pytest.raises(ValueError, match="at least one clause"):
        merge_into(sink, src)
    with pytest.raises(ValueError, match="could never fire"):
        merge_into(
            sink, src,
            when_matched_delete=True,
            when_matched_update={"n_tok": "1"},
        )
    with pytest.raises(ValueError, match="protected"):
        merge_into(sink, src, when_matched_update={"op_sequence": "1"})
    with pytest.raises(ValueError, match="empty"):
        merge_into(sink, src, when_not_matched_insert={})
    dup = spark.createDataFrame(
        [("d-0", [1], 1, "x"), ("d-0", [2], 2, "y")], SRC_SCHEMA
    )
    with pytest.raises(ValueError, match="unique non-null"):
        merge_into(sink, dup, when_not_matched_insert=True)
    nokey = spark.createDataFrame([(1,)], "n_tok int")
    with pytest.raises(ValueError, match="missing the key"):
        merge_into(sink, nokey, when_not_matched_insert=True)


def test_merge_exactly_once_and_dry_run(sink, spark):
    src = spark.createDataFrame([("m-0", [1], 1, "x")], SRC_SCHEMA)
    probe = merge_into(
        sink, src, when_not_matched_insert=True, dry_run=True
    )
    assert probe["inserted"] == 1 and probe["dry_run"]
    assert "m-0" not in _state(sink)
    out = merge_into(
        sink, src, when_not_matched_insert=True, batch_id="job-42"
    )
    assert out["inserted"] == 1
    # re-running the insert is idempotent BY MINIMALITY: the key is now
    # matched, the clause emits nothing, nothing commits
    again = merge_into(
        sink, src, when_not_matched_insert=True, batch_id="job-42"
    )
    assert again["inserted"] == 0 and again["batch_id"] is None
    assert _state(sink)["m-0"] == ([1], 1, "x")
    # a self-referential update is NOT self-falsifying — the explicit
    # batch_id is what dedupes the re-run at the sink
    upd = merge_into(
        sink, src,
        when_matched_update={"n_tok": "t.n_tok + 1"},
        batch_id="job-43",
    )
    assert upd["updated"] == 1
    retry = merge_into(
        sink, src,
        when_matched_update={"n_tok": "t.n_tok + 1"},
        batch_id="job-43",
    )
    assert retry.get("skipped") and retry["updated"] == 0
    assert _state(sink)["m-0"][1] == 2  # incremented exactly once


def test_merge_into_empty_table_bootstraps(spark, tmp_path):
    s = SnapshotSink(spark, str(tmp_path / "e"), n_buckets=4)
    src = spark.createDataFrame([("m-0", [1], 1, "x")], SRC_SCHEMA)
    # t.-qualified expressions must resolve on the BOOTSTRAP run too
    # (review-found: the synthesized-column variant crashed the first
    # run of any generic merge pipeline carrying an update clause)
    out = merge_into(
        s, src,
        when_matched_update={"n_tok": "s.n_tok + t.n_tok"},
        when_not_matched_insert=True,
    )
    assert out["inserted"] == 1 and out["updated"] == 0
    assert _state(s) == {"m-0": ([1], 1, "x")}
    # second run of the SAME pipeline: the key now matches and the
    # t.-referencing update fires
    out2 = merge_into(
        s, src,
        when_matched_update={"n_tok": "s.n_tok + t.n_tok"},
        when_not_matched_insert=True,
    )
    assert out2["updated"] == 1
    assert _state(s)["m-0"][1] == 2


def test_merge_into_sql_twin():
    sql = merge_into_sql(
        "cat.db.tokens",
        "updates",
        when_matched_delete=True,
        delete_condition="s.source = 'kill'",
        when_matched_update={"n_tok": "s.n_tok + t.n_tok"},
        when_not_matched_insert=True,
        source_columns=["doc_id", "tokens", "n_tok"],
        when_not_matched_by_source_delete=True,
        by_source_delete_condition="t.source = 'old'",
    )
    assert sql.startswith("MERGE INTO cat.db.tokens t")
    assert "USING updates s" in sql and "ON t.doc_id = s.doc_id" in sql
    # clause order mirrors merge_into: DELETE before UPDATE
    assert sql.index("THEN DELETE") < sql.index("THEN UPDATE")
    assert "WHEN MATCHED AND (s.source = 'kill') THEN DELETE" in sql
    assert "UPDATE SET t.n_tok = s.n_tok + t.n_tok" in sql
    assert (
        "WHEN NOT MATCHED THEN INSERT (doc_id, tokens, n_tok) "
        "VALUES (s.doc_id, s.tokens, s.n_tok)" in sql
    )
    assert (
        "WHEN NOT MATCHED BY SOURCE AND (t.source = 'old') THEN DELETE"
        in sql
    )
    with pytest.raises(ValueError, match="source_columns"):
        merge_into_sql("t", "s", when_not_matched_insert=True)
    with pytest.raises(ValueError, match="at least one clause"):
        merge_into_sql("t", "s")
    # the SQL twin refuses the dead-UPDATE combo exactly like merge_into
    # (ANSI MERGE evaluates matched clauses in order)
    with pytest.raises(ValueError, match="could never fire"):
        merge_into_sql(
            "t", "s",
            when_matched_delete=True,
            when_matched_update={"n_tok": "s.n_tok"},
        )


def test_merge_small_batch_job_budget(sink, spark):
    """VERDICT r03 item 7: the per-call source preparation is ONE
    bounded aggregation job (lazy checkpoint + distinct-key groups up
    to lookup_cap+1 giving emptiness + malformed-key audit + size +
    lookup keys together), not the former three (eager checkpoint,
    full audit, count). Measured at the fold: 17 jobs -> 13 for a
    small matched+insert merge; the bound leaves slack for AQE stage
    materialization jitter but fails if a per-batch job creeps back."""
    src = spark.createDataFrame(
        [("d1", 111), ("d999", 999)], "doc_id string, n_tok int"
    )
    sc = spark.sparkContext
    sc.setJobGroup("merge-budget", "probe")
    try:
        merge_into(
            sink,
            src,
            when_matched_update={"n_tok": "s.n_tok"},
            when_not_matched_insert=True,
        )
    finally:
        sc.setJobGroup(None, None)
    n_jobs = len(sc.statusTracker().getJobIdsForGroup("merge-budget"))
    assert n_jobs <= 15, f"small merge_into launched {n_jobs} jobs"


def test_merge_malformed_keys_refused_on_folded_path(sink, spark):
    """The folded single-job audit must still refuse duplicate and
    NULL keys exactly like the full audit (same error shape)."""
    import pytest

    dup = spark.createDataFrame(
        [("d1", 1), ("d1", 2)], "doc_id string, n_tok int"
    )
    with pytest.raises(ValueError, match="unique non-null"):
        merge_into(sink, dup, when_not_matched_insert=True)
    nul = spark.createDataFrame(
        [(None, 1)], "doc_id string, n_tok int"
    )
    with pytest.raises(ValueError, match="unique non-null"):
        merge_into(sink, nul, when_not_matched_insert=True)
