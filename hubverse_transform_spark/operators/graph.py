"""Iterative graph analytics [EXT]: PageRank over an edge DataFrame.

The reference has no graph code anywhere (grep over src/, faas/, test/ —
SURVEY.md §2.2); this is part of the Layer-B analytic surface. Complements
``operators/clusters.py`` (iterative connected components) with the other
canonical fixed-point graph computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    tol: float | None = None,
) -> DataFrame:
    """PageRank over a directed edge list, fixed iteration count with an
    optional early exit: when ``tol`` is set, iteration stops as soon as
    the L1 rank delta ``sum(|pr_new - pr_old|)`` falls below it (the delta
    is one extra co-partitioned join + scalar agg per round — cheap next
    to the contribution shuffle, and it is what keeps a 20-iteration
    budget from paying 20 shuffle rounds on a graph that stabilizes in 6).
    ``tol=None`` (default) runs exactly ``iterations`` rounds, bit-stable
    for oracle comparison.

    Returns (node, pr). Nodes are those appearing in ``edges`` (either end);
    rank mass from dangling nodes is dropped (callers with undirected graphs
    symmetrize first, which eliminates danglings entirely).

    Scale shape: each iteration is one join of the edge list with the
    current rank vector on ``src`` (both sides hash-partitioned on the same
    key, so AQE reuses the exchange) followed by one aggregation on ``dst``
    — the classic two-shuffle PageRank step, no driver-side collection of
    nodes or ranks. Out-degrees are folded into the edge list ONCE up front
    (edges carry pr-mass fraction 1/out_deg), so the per-iteration join is
    binary, not ternary. The node count rides as a 1-row broadcast.
    Reused frames (nodes, fraction-folded edges, per-round ranks) are
    eagerly ``localCheckpoint``ed instead of persisted: lineage truncates
    every round (no O(iterations) plan growth) and the stored RDDs are
    reclaimed by the ContextCleaner when the frame goes out of scope — no
    persist leak across iterations.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct().localCheckpoint()
    n_df = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # fold 1/out_deg into the edges once; every iteration then joins 2 tables
    e_frac = e.join(deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("frac")
    ).localCheckpoint()

    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    for _ in range(iterations):
        contribs = (
            e_frac.join(ranks, e_frac.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("pr") * F.col("frac")).alias("m"))
            .groupBy("node")
            .agg(F.sum("m").alias("m"))
        )
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("n")
                    + damping * F.coalesce(F.col("m"), F.lit(0.0))
                ).alias("pr"),
            )
        ).localCheckpoint()
        if tol is not None:
            delta = (
                new_ranks.select("node", F.col("pr").alias("_new"))
                .join(ranks.select("node", F.col("pr").alias("_old")), "node")
                .agg(F.sum(F.abs(F.col("_new") - F.col("_old"))).alias("d"))
                .first()["d"]
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle count [EXT] on an undirected simple graph.

    Canonicalizes each edge to (lo, hi) and distincts, then finds closed
    triples with the ordered two-join (a<b, b<c, a-c) — the standard
    distributed formulation: ordering the joins by node id means every
    triangle is produced exactly once and the join fan-out is bounded by
    forward-degree, not total degree (the classic skew guard for triangle
    counting; high-degree hubs only expand toward higher ids).

    Returns (node, triangles) for nodes in at least one triangle.
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e1 = canon.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = canon.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = canon.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return per_node
