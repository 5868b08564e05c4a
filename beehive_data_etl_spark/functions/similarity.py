"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB pipeline needs both:

- ``cosine_topk_bruteforce`` — exact top-k: broadcast the (small) query
  set against the full corpus; per-row dot products are higher-order
  array folds in the JVM (no Python). Scales linearly in corpus size
  with zero shuffle on the corpus side (queries broadcast).
- ``lsh_bucketed_topk`` — the scale path: random-hyperplane signatures
  (derived deterministically from the portable hash, so no stored model
  is needed) bucket the corpus; candidates come from an equi-join on
  the signature, then exact cosine re-ranks inside buckets only.

``cosine_expr`` casts to double and folds sequentially, matching
DuckDB's ``list_cosine_similarity`` to ~1e-12; results are rounded to
4dp before any threshold/rank so both engines agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from beehive_data_etl_spark.functions.dedup import DEFAULT_MAX_BUCKET
from beehive_data_etl_spark.functions.hashing import portable_hash32


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a.cast("array<double>"), F.lit(0.0), lambda acc, v: acc + v * v
        )
    )


def cosine_expr(a: Column, b: Column, decimals: int = 4) -> Column:
    # try_divide: a zero-norm (degenerate) vector yields NULL rather
    # than an ANSI DIVIDE_BY_ZERO error — callers that must rank such
    # vectors coalesce the NULL below any real score (AnnIndex._assign)
    return F.round(
        F.try_divide(dot_expr(a, b), norm_expr(a) * norm_expr(b)), decimals
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (excluding self).
    The query side is broadcast — the corpus is never shuffled."""
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .withColumn("cos", cosine_expr(F.col("q_vec"), F.col("n_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos", "rank")
    )


def hyperplane_signature(
    vec: Column, planes: int = 8, dim: int = 64, table: int = 0
) -> Column:
    """Random-hyperplane LSH signature without a stored model: plane p's
    j-th coefficient is ±1 from the portable hash of ``"table/p:j"`` —
    any engine (or oracle) regenerates the same planes. Returns an int
    in [0, 2^planes)."""
    v = vec.cast("array<double>")
    bits = []
    for p in range(planes):

        def _coeffs(prefix: str) -> Column:
            # closure, not default-arg (transform passes (elem, idx) to
            # 2-param lambdas)
            return F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda j: F.when(
                    portable_hash32(F.concat(F.lit(prefix), j.cast("string")))
                    .bitwiseAND(F.lit(1)) == 1,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)),
            )

        proj = F.aggregate(
            F.zip_with(v, _coeffs(f"{table}/{p}:"), lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, val: acc + val,
        )
        bits.append(F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")



def multi_table_signatures(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: int,
    tables: int,
    dim: int,
    id_alias: str = "id",
    vec_alias: str = "vec",
) -> DataFrame:
    """One corpus scan → (id, vec, tbl, bucket) rows for ALL hash
    tables: per-table signatures computed as an array of (tbl, bucket)
    structs in a single projection and exploded. The ONE Spark-side
    definition of the multi-table blocking — lsh_bucketed_topk and
    cosine_neardup_pairs_lsh both call it, and the SQL oracle twin
    (_hyperplane_sigs_sql in plans/queries.py) mirrors it; change the
    plane/bucket derivation HERE and there together."""
    per_table = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                hyperplane_signature(F.col(vec_col), planes, dim, table=t).alias(
                    "bucket"
                ),
            )
            for t in range(tables)
        ]
    )
    return (
        df.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(vec_alias),
            F.explode(per_table).alias("s"),
        )
        .select(
            id_alias, vec_alias,
            F.col("s.tbl").alias("tbl"), F.col("s.bucket").alias("bucket"),
        )
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    planes: int = 4,
    tables: int = 3,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket
    in ANY of ``tables`` independent hash tables (equi-join on
    (table, signature) — shuffle on a small int key instead of an
    all-pairs product), then exact cosine re-ranks the distinct
    candidates. More tables → higher recall, linearly more candidates —
    the classic LSH recall/cost dial."""

    c = multi_table_signatures(
        corpus, id_col, vec_col, planes, tables, dim, "n_id", "n_vec"
    )
    q = multi_table_signatures(
        queries, id_col, vec_col, planes, tables, dim, "q_id", "q_vec"
    )
    scored = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", "q_vec", "n_vec")
        .dropDuplicates(["q_id", "n_id"])
        .withColumn("cos", cosine_expr(F.col("q_vec"), F.col("n_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos", "rank")
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking group
    (label) — the blocked self-join keeps the pair count tractable; at
    corpus scale swap the block for an LSH bucket."""
    base = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), F.col(group_col).alias("grp")
    )
    l, r = base.alias("l"), base.alias("r")
    return (
        l.join(r, (F.col("l.grp") == F.col("r.grp")) & (F.col("l.id") < F.col("r.id")))
        .withColumn("cos", cosine_expr(F.col("l.vec"), F.col("r.vec")))
        .filter(F.col("cos") >= threshold)
        .select(
            F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"), F.col("cos")
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the other classic ANN
    scale path next to LSH: partition the corpus into ``n_centroids``
    cells by nearest centroid, probe only the query's ``nprobe``
    closest cells, exact-cosine re-rank inside them.

    Centroids are model-free and deterministic: the corpus vectors with
    the ``n_centroids`` smallest ids act as seeds — selected by
    ``orderBy(id).limit(n)``, NOT ``id < n`` (ids need not be dense or
    0-based; a filter would silently yield few or zero centroids and an
    ANN index that finds nothing). They are i.i.d. samples of the
    distribution, which is all k-means initialization needs; a
    trained-centroid variant would broadcast its codebook the same way.
    Cell assignment uses the ROUNDED cosine (4dp) with centroid-id
    tie-break so an oracle reproduces it bit-for-bit.

    Scale shape: the centroid set is broadcast (tiny); assignment is a
    map-side expression + one map-side-combined groupBy per corpus row
    — the corpus is shuffled once on ``n_id`` and once on the cell
    equi-join, never all-pairs. Query count × nprobe bounds the probe
    fan-out."""
    cents = (
        corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))
        .orderBy("c_id")
        .limit(n_centroids)
    )
    c = corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    scored = c.crossJoin(F.broadcast(cents)).withColumn(
        "a_cos", cosine_expr(F.col("n_vec"), F.col("c_vec"))
    )
    # argmax per corpus row WITHOUT a window: max_by over a struct is a
    # plain aggregate (partial/final, map-side combined) — a window here
    # would shuffle corpus × n_centroids rows
    assign = scored.groupBy("n_id").agg(
        F.max_by(
            "c_id", F.struct(F.col("a_cos"), (-F.col("c_id")).alias("nc"))
        ).alias("cell"),
        F.any_value("n_vec").alias("n_vec"),
    )
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    q_scored = q.crossJoin(F.broadcast(cents)).withColumn(
        "a_cos", cosine_expr(F.col("q_vec"), F.col("c_vec"))
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("a_cos"), F.asc("c_id"))
    probes = (
        q_scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("q_id", "q_vec", F.col("c_id").alias("cell"))
    )
    cand = (
        assign.join(F.broadcast(probes), "cell")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos", cosine_expr(F.col("q_vec"), F.col("n_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos", "rank")
    )


def cosine_neardup_pairs_lsh(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    planes: int = 6,
    tables: int = 2,
    dim: int = 64,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Embedding near-duplicate pairs blocked by hyperplane LSH buckets
    instead of a metadata group — the corpus-scale path (the grouped
    variant needs a natural blocking key and still goes quadratic
    inside big groups). Candidates share a bucket in ANY of ``tables``
    hash tables; exact cosine then filters at ``threshold``. Same
    deterministic model-free hyperplanes as ``lsh_bucketed_topk``, so
    the oracle replays the blocking exactly. Recall rises with
    ``tables`` and falls with ``planes`` — at cos ≥ 0.9 the collision
    probability per table is (1 - arccos(0.9)/π)^planes ≈ 0.45, so two
    tables catch ~70% of true pairs; production settings push tables
    higher."""
    # pair generation by BUCKET GROUPING, not a signature self-join — a
    # self-join computes every hyperplane signature TWICE (no exchange
    # reuse across the join's identical subtrees; same measured fact as
    # minhash_lsh_pairs): ONE corpus scan, one shuffle of the
    # (id, vec, tbl, bucket) rows, then in-bucket pairs stream out via
    # posexplode-then-slice (row i carries (mem[i], mem[i+1:]), so
    # single-row memory is O(m·dim), never O(m²)). max_bucket drops
    # degenerate hot buckets deterministically (oracle applies the
    # identical cap); cosine is computed once per DISTINCT pair, after
    # the (id_a, id_b) dedup, not once per shared table.
    sig = multi_table_signatures(
        embeddings, id_col, vec_col, planes, tables, dim, "id", "vec"
    )
    buckets = (
        sig.groupBy("tbl", "bucket")
        .agg(F.sort_array(F.collect_list(F.struct("id", "vec"))).alias("mem"))
        .filter((F.size("mem") >= 2) & (F.size("mem") <= max_bucket))
    )
    exploded = buckets.select(
        "mem", F.posexplode(F.slice("mem", 1, F.size("mem") - 1)).alias("i", "a")
    )
    pairs = exploded.select(
        "a", F.explode(F.slice("mem", F.col("i") + 2, F.size("mem"))).alias("b")
    )
    return (
        pairs.groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        # mem is sorted, so id_a <= id_b; drop equal-id pairs (duplicate
        # vec_ids in one bucket would otherwise emit (x, x) self-pairs
        # at cos 1.0 — the old self-join's l.id < r.id guard, restored)
        .agg(F.any_value("a.vec").alias("va"), F.any_value("b.vec").alias("vb"))
        .filter(F.col("id_a") != F.col("id_b"))
        .withColumn("cos", cosine_expr(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
