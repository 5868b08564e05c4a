"""Distributed connected components for near-duplicate clustering.

Every large-scale training-data dedup pipeline ends with this step:
MinHash/SimHash/cosine candidate pairs are EDGES of a similarity graph,
and the dedup unit is the connected component (transitive closure), not
the individual pair — doc A ~ B and B ~ C must collapse to one cluster
even when A ~ C was never emitted. Round 1 shipped only a 1-hop
canonical assignment (correct for exact-hash dups, wrong for near-dup
graphs); this is the fixpoint version.

Algorithm: iterative min-label propagation —

    label(n) ← min(label(n), min over neighbors' labels)

repeated until no label changes. Each round is ONE shuffle (join on the
edge list + groupBy-min) and converges in O(graph diameter) rounds;
near-dup similarity graphs are overwhelmingly tiny star/clique-shaped
clusters, so 2-4 rounds is typical at any corpus size. Scale notes:

- the edge list is never collected; the driver sees only the per-round
  changed-label COUNT (one scalar action) for the convergence test;
- ``localCheckpoint`` truncates the logical plan each round — without
  it the plan doubles per iteration and Catalyst analysis, not the
  data, becomes the bottleneck;
- for adversarial long-path graphs (diameter ≫ 10) switch the body to
  the large-star/small-star alternation (Kiveris et al., "Connected
  Components in MapReduce and Beyond"), which contracts paths in
  O(log^2 n) rounds with the same join+min primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    strict: bool = True,
) -> DataFrame:
    """``pairs`` (undirected edges) → one row per node that appears in
    any edge: ``(node, comp)`` with ``comp`` = the minimum node id
    reachable through the graph (the canonical/cluster id).

    Nodes with no edges don't appear — callers left-join their full id
    universe and coalesce to self (see q_dedup_cluster).

    ``strict=True`` (default) RAISES if ``max_iter`` rounds pass without
    reaching the fixpoint — partially-propagated labels would silently
    report one real component as several clusters (under-collapsed
    dedup); a graph that deep needs a higher ``max_iter`` or the
    large-star/small-star variant, and that must be a loud decision."""
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.localCheckpoint(eager=True)  # edges reused every round

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    changed = 0
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["b"] == labels["node"])
            .select(sym["a"].alias("node"), F.col("comp"))
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if strict and changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter or use "
            "connected_components_star for graphs this deep"
        )
    return labels


def connected_components_star(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    strict: bool = True,
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") — the
    path-CONTRACTING alternative to plain min-label propagation: where
    propagation moves labels one hop per round (O(diameter) rounds),
    the star operations rewire edges toward local minima and converge
    in O(log² n) rounds on ANY graph shape, including the long chains
    adversarial near-dup graphs can form (progressively edited
    boilerplate). Same primitive per round — join + groupBy-min — so
    it scales exactly like the simple variant.

    Per round, over the current edge multiset E (kept as (u, v) both
    directions for large-star, canonical u>v for small-star):

    - large-star: for every node u, connect every strictly-LARGER
      neighbor v to m = min(neighbors(u) ∪ {u});
    - small-star: for every node u, connect every neighbor v ≤ u
      (and u itself) to m = min(neighbors≤u ∪ {u}).

    Fixpoint: every edge is (node, its component minimum). Returns
    ``(node, comp)`` like connected_components."""
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    edges = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _large_star(ed: DataFrame) -> DataFrame:
        # m(u) = min over neighbors and self; emit (v, m) for v > u
        m = (
            ed.groupBy("u")
            .agg(F.least(F.min("v"), F.first("u")).alias("m"))
        )
        big = ed.filter(F.col("v") > F.col("u"))
        return (
            big.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(ed: DataFrame) -> DataFrame:
        # canonicalize so u >= v, then link all small neighbors + self
        canon = ed.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = canon.groupBy("u").agg(F.min("v").alias("m"))
        linked = (
            canon.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        return linked

    def _is_star_forest(ed: DataFrame) -> bool:
        # Fixpoint CERTIFICATE (round-5; replaces the round-2-era
        # count + exceptAll comparison, which needed one full EXTRA
        # confirmation round to observe "nothing changed"): the
        # iteration's fixpoints are exactly the min-rooted star
        # forests, checkable on the CURRENT symmetric edge set with
        # ONE aggregate — every node u is either a root (all
        # neighbors larger: min(v) > u) or a leaf with exactly one
        # neighbor, its root (count distinct v = 1 and that v < u).
        # A chain a>b>c fails at b (two distinct neighbors, one
        # smaller), so partial contractions never certify. On small
        # duplicate subgraphs the round cost is JOB COUNT, and this
        # turns rounds+confirmation into rounds alone.
        root = F.col("m") > F.col("u")
        leaf = (F.col("c") == 1) & (F.col("m") < F.col("u"))
        return (
            ed.groupBy("u")
            .agg(F.min("v").alias("m"), F.count_distinct("v").alias("c"))
            .filter(~(root | leaf))
            .isEmpty()
        )

    converged = False
    for _ in range(max_iter):
        # round FIRST, certify after: a fresh edge set is essentially
        # never already a star forest, so a pre-round check is a wasted
        # aggregate job in the common case — and a star round applied
        # to a fixpoint is the identity, so round-then-check never
        # corrupts an already-converged graph, it just certifies it
        # one (idempotent) round later
        new_edges = _small_star(_large_star(edges))
        # ONE checkpoint per round: new_edges is referenced twice
        # inside sym_new's plan (itself + its swap), but fusing that
        # double-evaluation into the single checkpoint job beats a
        # second eager materialization
        edges = new_edges.unionByName(
            new_edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct().localCheckpoint(eager=True)
        if _is_star_forest(edges):
            converged = True
            break
    if strict and not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "star rounds"
        )
    # at fixpoint every node's min neighbor IS its component min
    return (
        edges.groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("comp"))
        .select(F.col("u").alias("node"), "comp")
    )
