"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting — plus the beehive-style
normalization stage (SURVEY.md §2C "field normalization").

Everything here is a pure Column expression (JVM-side, whole-stage
codegen) unless noted; the pandas-UDF variants exist to exercise the
vectorized Arrow path (A5) and are verified to agree with the
expression forms.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# tiny marker-word tables per language — a deliberately simple n-gram/
# stopword heuristic that an ANSI-SQL oracle can replicate exactly
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "das"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}

_WORD_RE = r"[A-Za-z]+"
_BPE_ISH_RE = r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]"


def clean_text_expr(col: Column | str) -> Column:
    """Normalization: trim, lowercase, collapse whitespace (the
    reference's per-record string cleanup, SURVEY.md §2C)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def make_clean_text_pandas():
    """Arrow-vectorized twin of clean_text_expr (A5 transform stage).

    Factory returning a freshly-built pandas UDF: the inner function is
    local, so cloudpickle ships it BY VALUE and workers never need this
    package importable (module-level UDFs pickle by reference and break
    without --py-files)."""

    @F.pandas_udf(T.StringType())
    def clean_text_pandas(s: pd.Series) -> pd.Series:
        return s.str.replace(r"\s+", " ", regex=True).str.strip().str.lower()

    return clean_text_pandas


def token_count_expr(col: Column | str, mode: str = "whitespace") -> Column:
    """Token counting: 'whitespace' splits on runs of whitespace;
    'bpe-ish' counts letter-runs / digit-groups / punctuation marks."""
    c = F.col(col) if isinstance(col, str) else col
    if mode == "whitespace":
        return F.size(F.split(F.trim(c), r"\s+"))
    return F.size(F.regexp_extract_all(c, F.lit(_BPE_ISH_RE), 0))


def _marker_hits(c: Column, lang: str) -> Column:
    words = LANG_MARKERS[lang]
    pat = "(" + "|".join(words) + ")"
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(r"\b" + pat + r"\b"), 0))


def lang_id_expr(col: Column | str) -> Column:
    """Argmax over marker-word hit counts. Tie rule (replicable in ANSI
    SQL): max hits, ties broken by lexicographically LARGEST language
    code. Returns 'und' when nothing matched."""
    c = F.col(col) if isinstance(col, str) else col
    scored = F.array(
        *[
            F.struct(_marker_hits(c, lang).alias("hits"), F.lit(lang).alias("lang"))
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.array_max(scored)  # struct order: (hits, lang)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score_expr(col: Column | str) -> Column:
    """Document quality heuristic in [0,1]: rewards mid-length docs and
    high alpha ratio, penalizes very short docs. Integer-ish arithmetic
    rounded to 4dp so the SQL oracle matches exactly."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    n_words = F.size(F.split(F.trim(c), r"\s+"))
    alpha_ratio = n_alpha / F.greatest(n_chars, F.lit(1))
    len_score = F.least(n_words / F.lit(100.0), F.lit(1.0))
    return F.round(alpha_ratio * 0.5 + len_score * 0.5, 4)


def fingerprint_expr(col: Column | str, mod: int = 1_000_000_007) -> Column:
    """Rolling polynomial fingerprint over words: map each word to
    ``v = length(word)*7 + ascii(first char)`` then fold
    ``acc = (acc*31 + v) % mod``. The per-word value is < mod, so
    Spark's zero-init fold and DuckDB's first-element-init
    ``list_reduce`` produce identical results, and every intermediate
    stays < 2^35 (DuckDB errors on BIGINT overflow; Spark wraps)."""
    c = F.col(col) if isinstance(col, str) else col
    vals = F.transform(
        F.split(F.trim(c), r"\s+"),
        lambda w: (F.length(w) * 7 + F.coalesce(F.ascii(F.substring(w, 1, 1)), F.lit(0)))
        .cast("long"),
    )
    return F.aggregate(
        vals, F.lit(0).cast("long"), lambda acc, v: (acc * 31 + v) % F.lit(mod)
    )


def fingerprint_sql(expr: str, mod: int = 1_000_000_007) -> str:
    """DuckDB twin of fingerprint_expr (first element seeds the fold —
    equivalent because v < mod)."""
    return (
        f"list_reduce(list_transform(string_split_regex(trim({expr}), '\\s+'), "
        f"w -> (length(w) * 7 + coalesce(ascii(substr(w, 1, 1)), 0))::BIGINT), "
        f"(acc, v) -> (acc * 31 + v) % {mod})"
    )


def repetition_ratio_expr(col: Column | str, n: int = 3) -> Column:
    """Gopher/C4-style repetition signal: the fraction of word n-grams
    that are duplicates of an earlier one in the same document —
    ``1 - distinct_ngrams / total_ngrams`` (0.0 for docs shorter than
    n words). Pure JVM expressions; the classic quality filter drops
    docs above ~0.2."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.trim(F.lower(c)), r"\s+")
    total = F.greatest(F.size(words) - (n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(total, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    distinct = F.size(F.array_distinct(grams))
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.round(1.0 - distinct / total, 4)
    )


def repetition_ratio_sql(expr: str, n: int = 3) -> str:
    """DuckDB twin of repetition_ratio_expr."""
    w = f"string_split_regex(trim(lower({expr})), '\\s+')"
    total = f"greatest(len({w}) - {n - 1}, 0)"
    grams = (
        f"list_transform(generate_series(1, greatest({total}, 1)), "
        f"i -> array_to_string(list_slice({w}, i, i + {n - 1}), ' '))"
    )
    return (
        f"CASE WHEN {total} <= 0 THEN 0.0 ELSE "
        f"ROUND(1.0 - len(list_distinct({grams})) / {total}, 4) END"
    )


# one pattern per PII class, kept regex-dialect-portable (no lookarounds,
# no shorthand classes that differ between Java and RE2/DuckDB)
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\- ]{7,}[0-9]",
}


def pii_redact_expr(col: Column | str) -> Column:
    """Replace email- and phone-shaped spans with typed placeholder
    tokens — the standard pre-training scrub. Vectorized JVM regex;
    patterns are portable so an oracle applies the identical ones."""
    c = F.col(col) if isinstance(col, str) else col
    out = c
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def pii_count_expr(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    total = F.lit(0)
    for pat in PII_PATTERNS.values():
        total = total + F.regexp_count(c, F.lit(pat))
    return total.cast("long")


def pii_redact_sql(expr: str) -> tuple[str, str]:
    """(redacted_sql, count_sql) — DuckDB twins."""
    red = expr
    cnt_terms = []
    for name, pat in PII_PATTERNS.items():
        red = f"regexp_replace({red}, '{pat}', '<{name.upper()}>', 'g')"
        cnt_terms.append(f"len(regexp_extract_all({expr}, '{pat}'))")
    return red, "(" + " + ".join(cnt_terms) + ")::BIGINT"


# ------------------------------------------------- corpus term statistics
def tfidf_top_terms(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_top: int = 3,
) -> "DataFrame":
    """Top-``n_top`` TF-IDF terms per document — the classic keyword-
    extraction operator (salient-term indexing / topic tagging over a
    training corpus).

    Shape at 100 TB: the corpus's token explosion — by far the dominant
    cost — runs ONCE: a single (doc, term) aggregation builds the tf
    table, and document frequency, document length, and the final
    ranking all run as WINDOWS over that table (a groupBy+self-join
    formulation re-executes the explode subtree per join — Spark's
    no-exchange-reuse-across-join-subtrees behavior, measured in the
    minhash rewrite). The windows chain term → doc so the rank window
    reuses the doc partitioning (3 tf-table shuffles total, zero
    re-scans). The corpus-size scalar is one column-pruned count scan,
    broadcast. Scores are rounded BEFORE ranking so the cross-engine
    ordering contract is on the rounded value (ties broken by term) —
    two engines' last-ulp ln differences can never flip a rank.
    """
    from pyspark.sql import Window

    from beehive_data_etl_spark.functions.dedup import (
        spread_if_narrow,
        word_shingles_positional,
    )

    base = spread_if_narrow(docs.select(id_col, text_col))
    words = base.select(
        F.col(id_col),
        F.explode(word_shingles_positional(text_col, 1)).alias("term"),
    ).filter(F.col("term") != "")
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("cnt"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w_term = Window.partitionBy("term")
    w_doc = Window.partitionBy(id_col)
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(w_term))
        .withColumn("len", F.sum("cnt").over(w_doc))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                (F.col("cnt") / F.col("len"))
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                4,
            ),
        )
    )
    w_rank = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= n_top)
        .select(id_col, "term", "rank", "tfidf")
    )


def token_cooccurrence(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 5,
    min_co: int = 15,
    max_terms_per_doc: int = 10_000,
) -> "DataFrame":
    """Document-level term co-occurrence with PMI — the association-
    mining operator behind collocation detection and topic seeding.

    Pair generation reuses ``dedup.bucket_pairs`` with the document as
    the bucket: per-doc grouped term lists (bounded by
    ``max_terms_per_doc``), streaming posexplode-then-slice expansion —
    never a corpus self-join (the engine's measured no-exchange-reuse
    lesson) and never an O(m²) single-row array. The df table is
    vocabulary-sized: it is localCheckpoint-materialized so the three
    places that need it (eligibility filter, two PMI denominators)
    never re-execute the corpus aggregation that built it — the corpus
    token explosion runs exactly twice (once inside the df job, once
    feeding the pair expansion), plus one column-pruned count scan.

    PMI = ln(n_co * N / (df_a * df_b)), rounded; pairs below ``min_co``
    docs are dropped (at sf0.01 this prunes the rare-term pairs — the
    filter provably binds)."""
    from beehive_data_etl_spark.functions.dedup import (
        bucket_pairs,
        spread_if_narrow,
        word_shingles,
    )

    base = spread_if_narrow(docs.select(id_col, text_col))
    toks = base.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(text_col, 1)).alias("term"),
    ).filter((F.col("term") != "") & (F.length("term") >= 2))
    dft = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        # vocabulary-sized: pin it so the three downstream consumers
        # read blocks, not a re-run of the corpus aggregation (no
        # exchange reuse across join subtrees). eager=False keeps
        # DataFrame CONSTRUCTION job-free (explain/compose never runs a
        # corpus job); materialization happens once, inside the first
        # action. localCheckpoint blocks are lost with their executor —
        # a cluster deployment with preemptible executors would use
        # reliable checkpointing; at vocabulary size either is cheap.
        .localCheckpoint(eager=False)
    )
    elig = toks.join(F.broadcast(dft.select("term")), "term")
    banded = elig.select(
        F.col("term").alias("id"),
        F.lit(0).alias("band"),
        F.col("doc").alias("band_hash"),
    )
    pairs = bucket_pairs(
        banded, max_bucket=max_terms_per_doc, out_a="term_a", out_b="term_b"
    ).filter(F.col("n_shared_bands") >= min_co)
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    da = dft.select(F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    db = dft.select(F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    return (
        pairs.join(F.broadcast(da), "term_a")
        .join(F.broadcast(db), "term_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term_a",
            "term_b",
            F.col("n_shared_bands").alias("n_co"),
            # cast to double BEFORE multiplying: n_co * n_docs in int64
            # wraps (non-ANSI) or errors (ANSI) at 10^10-doc scale;
            # products under 2^53 stay exact in double, so small-scale
            # results are bit-identical to the integer formulation
            F.round(
                F.log(
                    F.col("n_shared_bands").cast("double")
                    * F.col("n_docs")
                    / (F.col("df_a").cast("double") * F.col("df_b"))
                ),
                4,
            ).alias("pmi"),
        )
    )


def bm25_rank(
    docs,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    n_top: int = 20,
) -> "DataFrame":
    """Okapi BM25 retrieval: rank documents against a fixed query-term
    set (the relevance scorer behind corpus search / targeted-subset
    selection for training mixes).

    Shape at 100 TB: the corpus token explosion runs ONCE — a single
    (doc) aggregation computes document length AND each query term's
    per-doc frequency as conditional sums in the same pass (query terms
    are literals, so no join against a term table). The corpus
    statistics (avgdl, per-term document frequency) derive from that
    per-doc table with one tiny aggregation, broadcast; N is one
    column-pruned count scan. The final top-k is orderBy+limit —
    TakeOrderedAndProject, per-partition heaps, never a global sort —
    and the rank is a window over the n_top survivors only. Scores are
    rounded BEFORE ranking (ties by doc id) so the cross-engine
    ordering contract is on the rounded value; the three term
    contributions sum in fixed left-to-right order on both engines.

    IDF is Lucene's non-negative variant ln(1 + (N - df + .5)/(df + .5)).
    """
    from pyspark.sql import Window

    from beehive_data_etl_spark.functions.dedup import (
        spread_if_narrow,
        word_shingles_positional,
    )

    base = spread_if_narrow(docs.select(id_col, text_col))
    words = base.select(
        F.col(id_col),
        F.explode(word_shingles_positional(text_col, 1)).alias("term"),
    ).filter(F.col("term") != "")
    per_doc = words.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("term") == q, 1).otherwise(0)).alias(f"tf_{i}")
            for i, q in enumerate(query_terms)
        ],
    )
    # per_doc feeds BOTH the stats aggregation and the scoring join;
    # Spark re-executes the subtree per consumer (no exchange reuse
    # across join subtrees — the engine's measured LSH lesson), which
    # would run the corpus explosion twice. Pin it: per_doc is one row
    # per DOC with 2+|Q| numeric columns — tiny next to the text it
    # summarizes. Lazy, so composing/explaining the query runs no job.
    per_doc = per_doc.localCheckpoint(eager=False)
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    stats = (
        per_doc.agg(
            F.avg("dl").alias("avgdl"),
            *[
                F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
                for i in range(len(query_terms))
            ],
        )
        .crossJoin(F.broadcast(n_docs))
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(query_terms)):
        tf = F.col(f"tf_{i}")
        df = F.col(f"df_{i}")
        idf = F.log(
            ((F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5))) + F.lit(1.0)
        )
        s = idf * (
            (tf * F.lit(k1 + 1.0))
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + (F.lit(b) * F.col("dl")) / F.col("avgdl")))
        )
        score = s if score is None else score + s
    ranked = (
        scored.withColumn("score", F.round(score, 4))
        .filter(F.col("score") > 0)
        .select(id_col, "score")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(n_top)
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return ranked.withColumn("rank", F.row_number().over(w))


def token_entropy(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Per-document unigram Shannon entropy (nats) — the
    distribution-flatness quality signal (near-zero entropy = highly
    repetitive / degenerate text; high entropy = diverse vocabulary),
    a standard pre-training corpus filter alongside q_repetition's
    duplicate-n-gram fraction.

    ONE corpus token explosion -> (doc, term) counts -> one per-doc
    aggregation, computed as ln(len) - Σ(cnt·ln cnt)/len so the only
    float work happens over the integer count table. Map-side combine
    on both aggregations; no windows, no joins."""
    from beehive_data_etl_spark.functions.dedup import (
        spread_if_narrow,
        word_shingles_positional,
    )

    base = spread_if_narrow(docs.select(id_col, text_col))
    words = base.select(
        F.col(id_col),
        F.explode(word_shingles_positional(text_col, 1)).alias("term"),
    ).filter(F.col("term") != "")
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("cnt"))
    return tf.groupBy(id_col).agg(
        F.sum("cnt").alias("n_words"),
        F.count(F.lit(1)).alias("n_terms"),
        F.round(
            F.log(F.sum("cnt"))
            - F.sum(F.col("cnt") * F.log("cnt")) / F.sum("cnt"),
            4,
        ).alias("entropy"),
    )
