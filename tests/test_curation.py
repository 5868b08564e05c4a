"""Semantic + plan-shape tests for the corpus-curation operators
(functions/curation.py): benchmark decontamination, duplicate-n-gram
fraction, mixture reweighting, deterministic shuffle-shard. Oracle
parity runs separately in test_oracle_parity.py; these pin semantics
the value-hash alone can't (broadcast shape, invariants, edge docs)."""

import io
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from beehive_data_etl_spark.functions.curation import (
    decontaminate,
    dup_ngram_fraction,
    mixture_weights,
    shuffle_shards,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, source=s) for i, (t, s) in enumerate(rows)]
    )


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# --------------------------------------------------------- decontaminate
def test_decontaminate_benchmark_side_is_broadcast(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(decontaminate(docs))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    # the corpus side must reach the join without a CO-LOCATION shuffle:
    # allowed Exchanges are the benchmark-distinct (feeding the
    # broadcast), the final per-doc aggregation, and the narrow-input
    # spread (round-robin, only because the test corpus is one file)
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 1
    shuffles = re.findall(r"\(\d+\) Exchange\n.*\n.*Arguments: (\w+)", plan)
    assert len(shuffles) == 3, plan
    assert sorted(shuffles).count("hashpartitioning") == 2  # distinct + agg
    assert "RoundRobinPartitioning" in shuffles  # the spread, not a key shuffle


def test_decontaminate_flags_exact_benchmark_copy(spark):
    # doc 17 hashes into the 5% benchmark slice for ids 0..99?  Don't
    # assume — find a benchmark member dynamically, then plant a corpus
    # doc that copies its text verbatim: it MUST be flagged with
    # n_hits == its shingle count, and a disjoint-vocab doc must not.
    from beehive_data_etl_spark.functions.curation import _bench_pred

    base = _docs(
        spark,
        [("alpha beta gamma delta epsilon zeta", "s")] * 0
        + [(f"w{i}a w{i}b w{i}c w{i}d w{i}e", "s") for i in range(40)],
    )
    marked = base.withColumn("b", _bench_pred("doc_id", 5))
    bench_ids = [r.doc_id for r in marked.filter("b").collect()]
    assert bench_ids, "no benchmark member in 40 ids — widen the range"
    bench_text = base.filter(F.col("doc_id") == bench_ids[0]).collect()[0].text
    extra = spark.createDataFrame(
        [
            Row(doc_id=1000, text=bench_text, source="s"),  # verbatim copy
            Row(doc_id=1001, text="zz1 zz2 zz3 zz4 zz5 zz6", source="s"),
        ]
    )
    out = {
        r.doc_id: r.n_hits
        for r in decontaminate(base.unionByName(extra)).collect()
    }
    assert 1000 in out and out[1000] == 2  # 5 words -> 2 distinct 4-grams
    assert 1001 not in out


def test_decontaminate_excludes_benchmark_docs_from_output(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from beehive_data_etl_spark.functions.curation import _bench_pred

    flagged = decontaminate(docs)
    bench = docs.filter(_bench_pred("doc_id", 5)).select("doc_id")
    assert flagged.join(bench, "doc_id").count() == 0


# ----------------------------------------------------- dup_ngram_fraction
def test_dup_fraction_bounds_and_duplicate_doc(spark):
    rows = [(f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f", "s") for i in range(6)]
    rows.append(rows[0])  # doc 6 duplicates doc 0 verbatim
    out = {r.doc_id: r.dup_frac for r in dup_ngram_fraction(_docs(spark, rows)).collect()}
    assert out[0] == 1.0 and out[6] == 1.0  # every shingle shared
    assert all(v == 0.0 for k, v in out.items() if k not in (0, 6))


def test_dup_fraction_covers_every_doc_with_shingles(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert dup_ngram_fraction(docs).count() == docs.count()
    rng = dup_ngram_fraction(docs).agg(
        F.min("dup_frac").alias("lo"), F.max("dup_frac").alias("hi")
    ).collect()[0]
    assert 0.0 <= rng.lo <= rng.hi <= 1.0


# -------------------------------------------------------- mixture_weights
def test_mixture_weights_invariants(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pdf = mixture_weights(docs).toPandas()
    assert abs(pdf["share"].sum() - 1.0) < 1e-2  # shares sum to 1 (4dp rounding)
    assert (pdf["weight"] <= 2.0).all() and (pdf["weight"] > 0).all()
    # weight * share == target share (1/k) wherever the cap didn't bind
    k = len(pdf)
    unbound = pdf[pdf["weight"] < 2.0]
    assert ((unbound["weight"] * unbound["share"] - 1.0 / k).abs() < 1e-3).all()


def test_mixture_weights_cap_binds_on_rare_source(spark):
    rows = [("w " * 100, "big")] * 10 + [("w w", "rare")]
    pdf = mixture_weights(_docs(spark, rows), cap=2.0).toPandas().set_index("source")
    assert pdf.loc["rare", "weight"] == 2.0  # uncapped would be ~125x


# ---------------------------------------------------------- shuffle_shards
def test_shuffle_shards_partitions_and_positions(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = shuffle_shards(docs, k=8).toPandas()
    assert len(out) == out["doc_id"].nunique()  # every doc exactly once
    assert set(out["shard"].unique()) <= set(range(8))
    for _, grp in out.groupby("shard"):
        pos = sorted(grp["pos"])
        assert pos == list(range(1, len(grp) + 1))  # dense 1..n per shard


def test_dup_span_semantics(spark):
    # doc A and B share the exact 6-word phrase -> 3 consecutive dup
    # 4-grams; C is disjoint -> 0
    shared = "p1 p2 p3 p4 p5 p6"
    rows = [
        (f"a1 a2 a3 {shared} a4 a5", "s"),
        (f"b1 b2 {shared} b3 b4 b5", "s"),
        ("c1 c2 c3 c4 c5 c6 c7 c8 c9", "s"),
    ]
    from beehive_data_etl_spark.functions.curation import dup_span

    out = {r.doc_id: r.max_dup_run for r in dup_span(_docs(spark, rows)).collect()}
    assert out[0] == 3 and out[1] == 3  # 6 shared words = 3 dup 4-grams
    assert out[2] == 0


def test_write_shards_layout_and_determinism(spark, tmp_path):
    from beehive_data_etl_spark.functions.curation import shuffle_shards, write_shards

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_shards(docs, out1, k=4)
    write_shards(docs.repartition(7), out2, k=4)  # layout-independent
    a = spark.read.parquet(out1)
    b = spark.read.parquet(out2)
    # content round-trips exactly (all columns + shard)
    assert a.count() == docs.count()
    assert a.drop("shard").exceptAll(docs).count() == 0
    assert docs.exceptAll(a.drop("shard")).count() == 0
    # shard membership matches the query-form operator
    expect = shuffle_shards(docs, k=4).toPandas().set_index("doc_id")["shard"]
    # partition-column read-back infers int32 — compare values
    got = a.select("doc_id", "shard").toPandas().set_index("doc_id")["shard"].astype("int64")
    assert got.sort_index().equals(expect.sort_index().astype("int64"))
    # byte-determinism: per-shard file row order identical across runs
    import pyarrow.parquet as pq
    import glob

    for s in range(4):
        fa = sorted(glob.glob(f"{out1}/shard={s}/*.parquet"))
        fb = sorted(glob.glob(f"{out2}/shard={s}/*.parquet"))
        ids_a = [i for f in fa for i in pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()]
        ids_b = [i for f in fb for i in pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()]
        assert ids_a == ids_b and len(ids_a) > 0


def test_shuffle_shards_deterministic_across_runs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = shuffle_shards(docs, k=8).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        shuffle_shards(docs.repartition(7), k=8)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)  # layout-independent (no rand(), no partition order)
