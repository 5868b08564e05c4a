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
            f"({changed} labels still changing); raise max_iter or use a "
            "path-contracting variant for graphs this deep"
        )
    return labels
