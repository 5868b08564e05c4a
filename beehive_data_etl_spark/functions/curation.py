"""Corpus-curation operators for LLM training-data pipelines.

Four first-class operators a 100 TB curation pipeline runs between
ingest and shard-writing, each expressed as pure DataFrame ops (no
Python in the hot path) with an exact DuckDB oracle in plans/queries.py:

- ``decontaminate``      — benchmark n-gram overlap detection (the
  standard eval-set decontamination step: drop training docs sharing
  any n-gram with a held-out benchmark; see e.g. GPT-3 appendix C /
  Dodge et al. 2021's C4 analysis — public methodology).
- ``dup_ngram_fraction`` — per-doc fraction of n-grams appearing in
  more than one document (Lee et al. 2022 "Deduplicating Training Data
  Makes Language Models Better" measures exactly this signal; here at
  n-gram granularity over an inverted index — no pair expansion, so hot
  n-grams cost a count, never O(m^2)).
- ``mixture_weights``    — per-source sampling weights to steer the
  token mixture toward a target share (domain reweighting as in
  GPT-3/Pile-style sampling; weight = target_share / actual_share,
  capped so rare sources aren't up-sampled unboundedly).
- ``shuffle_shards``     — deterministic global shuffle + shard
  assignment for training-data writers: hash-ordered position within a
  hash-assigned shard, reproducible across engines and runs (a
  `rand()`-based shuffle is not).

Scale notes (100 TB):
- decontaminate joins the corpus's exploded n-grams against the
  benchmark n-gram set. The benchmark is small by definition (eval
  suites are MBs, corpora are TBs) → broadcast the benchmark side;
  the corpus is scanned ONCE and never shuffled before the join, and
  the per-doc aggregation shuffles only the surviving hits
  (plan-tested: BroadcastHashJoin, one corpus scan).
- dup_ngram_fraction is two hash aggregations over the inverted index
  (n-gram -> doc count, then doc -> fraction) plus one shuffle join on
  the n-gram key; partial aggregation runs map-side, and a degenerate
  hot n-gram contributes one counter, not a pair blow-up.
- mixture_weights aggregates to |sources| rows before the window —
  the single-partition window is over a cardinality that is tiny by
  construction (sources are a curated enum), never over the corpus.
- shuffle_shards is exactly the physical layout a shard writer wants:
  ``repartition(k, shard).sortWithinPartitions(h)`` → one shuffle,
  each output file a sorted shard. The query form uses a row_number
  window per shard, which is the same exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beehive_data_etl_spark.functions.dedup import (
    spread_if_narrow,
    word_shingles,
    word_shingles_positional,
    word_shingles_sql,
)
from beehive_data_etl_spark.functions.hashing import portable_hash32, portable_hash32_sql

__all__ = [
    "decontaminate",
    "dup_ngram_fraction",
    "mixture_weights",
    "shuffle_shards",
]


def _shingled(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, shingle) pairs, distinct per doc (word_shingles dedups).
    The spread sits BELOW the projection and ABOVE the expression-heavy
    shingling (the engine's measured lesson: an under-partitioned
    corpus file serializes all shingle work in one task)."""
    return spread_if_narrow(docs.select(id_col, text_col)).select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("s")
    )


def decontaminate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    bench_pct: int = 5,
) -> DataFrame:
    """Per-doc count of distinct n-grams shared with the benchmark
    slice. Returns (id_col, n_hits) for contaminated docs only — the
    caller anti-joins this against the corpus to drop them.

    The benchmark n-gram set is collected from the hash-sliced
    benchmark docs and BROADCAST; the corpus side streams through a
    single scan. In production the benchmark would be a separate small
    table — the join shape is identical."""
    base = docs.select(id_col, text_col)
    pred = _bench_pred(id_col, bench_pct)
    # each side filters BEFORE shingling, so the expensive n-gram
    # expansion runs once per doc total: the benchmark branch shingles
    # only its 5% slice (tiny — no spread needed), the corpus branch
    # the rest (spread against under-partitioned input files)
    bench = (
        base.filter(pred)
        .select(F.explode(word_shingles(text_col, n)).alias("s"))
        .distinct()
    )
    corpus = spread_if_narrow(base.filter(~pred)).select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("s")
    )
    return (
        corpus.join(F.broadcast(bench), "s")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )


def _bench_pred(id_col: str, pct: int) -> Column:
    """True for docs in the deterministic ``pct``% benchmark slice —
    hash-sliced (salt 'bench:') so the split is reproducible across
    engines and re-runs, same contract as q_split_assign."""
    return (
        portable_hash32(F.concat(F.lit("bench:"), F.col(id_col).cast("string"))) % 100
        < pct
    )


def dup_ngram_fraction(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
) -> DataFrame:
    """(id_col, dup_frac): fraction of each doc's distinct n-grams that
    occur in >= 2 documents, rounded to 4dp after aggregation.

    Inverted-index shape: ngram->document-frequency (map-side partial
    agg), join back on the n-gram key, per-doc mean of the >=2
    indicator. Hot n-grams are a single counter — no pair expansion."""
    sh = _shingled(docs, text_col, id_col, n)
    df_counts = sh.groupBy("s").agg(F.count("*").alias("d"))
    return (
        sh.join(df_counts, "s")
        .groupBy(id_col)
        .agg(
            F.round(
                F.avg(F.when(F.col("d") >= 2, F.lit(1.0)).otherwise(F.lit(0.0))), 4
            ).alias("dup_frac")
        )
    )


def mixture_weights(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    cap: float = 2.0,
) -> DataFrame:
    """(source, tokens, share, weight): whitespace-token count per
    source, its share of the total token mass, and the sampling weight
    ``min(target_share / share, cap)`` that steers sampling toward a
    UNIFORM target mixture across sources (target_share = 1/|sources|).

    The corpus collapses to |sources| rows before any window — the
    full-frame window runs over a tiny curated enum, never the corpus."""
    per_source = docs.groupBy(source_col).agg(
        F.sum(F.size(F.split(F.trim(F.col(text_col)), r"\s+"))).alias("tokens")
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    total = F.sum("tokens").over(w)
    n_sources = F.count("*").over(w)
    share = F.col("tokens").cast("double") / total.cast("double")
    weight = F.least(
        (F.lit(1.0) / n_sources.cast("double")) / share, F.lit(float(cap))
    )
    return per_source.select(
        F.col(source_col),
        F.col("tokens").cast("long").alias("tokens"),
        F.round(share, 4).alias("share"),
        F.round(weight, 4).alias("weight"),
    )


def shuffle_shards(
    docs: DataFrame, id_col: str = "doc_id", k: int = 8
) -> DataFrame:
    """(id_col, shard, pos): deterministic global shuffle — shard =
    portable_hash('shard:'||id) % k, pos = hash-rank within the shard
    (ties broken by id). Reproducible across engines/runs, unlike
    ``ORDER BY rand()``. The window's exchange IS the shard writer's
    repartition — no extra shuffle when chained into a partitioned
    write."""
    from pyspark.sql import Window

    h = portable_hash32(F.concat(F.lit("shard:"), F.col(id_col).cast("string")))
    win = Window.partitionBy("shard").orderBy("h", id_col)
    return (
        docs.select(F.col(id_col), h.alias("h"), (h % k).alias("shard"))
        .withColumn("pos", F.row_number().over(win).cast("long"))
        .select(id_col, F.col("shard").cast("long").alias("shard"), "pos")
    )


def write_shards(
    df: DataFrame, out_dir: str, id_col: str = "doc_id", k: int = 8
) -> None:
    """Materialize a deterministic globally-shuffled training-shard
    layout: ``out_dir/shard=<i>/`` parquet, rows within each shard in
    portable-hash order (ties by id). The same physical plan as
    ``shuffle_shards`` — ONE shuffle (repartition on the shard key),
    in-task sort, partitioned write; re-running over the same rows
    reproduces byte-identical shard membership and row order regardless
    of input partitioning. Works on any keyed DataFrame — documents,
    or a CDC sink's ``read_final()``."""
    h = portable_hash32(F.concat(F.lit("shard:"), F.col(id_col).cast("string")))
    (
        df.withColumn("__h", h)
        .withColumn("shard", (F.col("__h") % k).cast("long"))
        .repartition(k, "shard")
        .sortWithinPartitions("shard", "__h", id_col)
        .drop("__h")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )


def dup_span(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
) -> DataFrame:
    """(id_col, max_dup_run): length, per doc, of the LONGEST run of
    consecutive n-gram positions whose n-gram occurs in >= 2 documents
    — i.e. a duplicated run of k n-grams is a duplicated substring of
    k+n-1 words (the exact-substring-dedup signal of Lee et al. 2022,
    at n-gram resolution instead of a distributed suffix array). Docs
    with no duplicated n-gram report 0.

    Shape: positional shingles (posexplode, NO distinct — position is
    the payload) -> document-frequency of each n-gram over the DISTINCT
    per-doc shingle set -> keep duplicated positions -> gaps-and-islands
    (pos - row_number per doc) -> max island size. Two aggregations and
    one n-gram-key join over the inverted index; the islands window
    shuffles on the doc key only.

    Decision record: the dfreq subtree re-scans + re-shingles the
    corpus (Spark gives no exchange reuse across join subtrees — the
    engine's measured LSH lesson). The single-scan alternative
    (groupBy n-gram with collect_list of (doc,pos) structs) needs
    UNBOUNDED single-row state on hot n-grams and, unlike minhash's
    max_bucket cap, no cap is semantically safe here (every position
    of a duplicated n-gram feeds a run). Re-shingling is narrow, cheap
    codegen work; the expensive parts — the inverted-index shuffle and
    the islands window — each run once."""
    psh = spread_if_narrow(docs.select(id_col, text_col)).select(
        F.col(id_col),
        F.posexplode(word_shingles_positional(text_col, n)).alias("pos", "s"),
    )
    dfreq = (
        psh.select(id_col, "s")
        .distinct()
        .groupBy("s")
        .agg(F.count("*").alias("d"))
    )
    dup = psh.join(dfreq, "s").filter(F.col("d") >= 2).select(id_col, "pos")
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    runs = dup.withColumn("grp", F.col("pos") - F.row_number().over(w))
    best = (
        runs.groupBy(id_col, "grp")
        .agg(F.count("*").alias("cnt"))
        .groupBy(id_col)
        .agg(F.max("cnt").cast("long").alias("max_dup_run"))
    )
    return docs.select(id_col).join(best, id_col, "left_outer").select(
        F.col(id_col),
        F.coalesce(F.col("max_dup_run"), F.lit(0).cast("long")).alias("max_dup_run"),
    )


# ---------------------------------------------------------------- SQL twins


def shingle_cte_sql(n: int = 4) -> str:
    """DuckDB CTE producing the same (doc_id, s) pairs as _shingled."""
    return (
        "sh AS (SELECT doc_id, unnest("
        + word_shingles_sql("text", n)
        + ") AS s FROM documents)"
    )


def bench_pred_sql(pct: int = 5) -> str:
    return (
        portable_hash32_sql("'bench:' || CAST(doc_id AS VARCHAR)") + f" % 100 < {pct}"
    )
