"""Connected components over near-duplicate pair graphs [EXT].

Completes the dedup pipeline: candidate pairs (MinHash-LSH / SimHash) form an
undirected graph; each connected component is one duplicate cluster, and the
minimum doc id in a component is its canonical representative.

Algorithm: iterative min-label propagation — every node adopts the smallest
label among itself and its neighbors until fixpoint. Per iteration: ONE join
(edges x labels) + ONE groupBy min — both shuffle on node id, so an iteration
is O(|E|/cluster) per executor with no driver-side graph state. Lineage is
truncated each round with ``localCheckpoint`` (iterative plans otherwise grow
exponentially in Catalyst). Near-dup clusters have tiny diameters (pairs,
triangles, short chains), so convergence takes ~log(diameter) rounds; the
fixpoint check is a count of changed labels per round.

Deterministic: the fixpoint labels every node with its component's minimum id
regardless of execution order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label each node that appears in ``edges`` with its component's min id.

    Returns ``(node, component)``; isolated documents (no edges) are by
    definition their own singleton clusters and are not enumerated here.
    """
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).unionByName(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    )
    sym = sym.localCheckpoint()

    labels = (
        sym.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        # the pre-iteration label rides along as _old so the fixpoint check
        # is a cheap aggregate over the checkpointed result — no extra join
        # of new-vs-old label sets per round
        propagated = labels.join(
            neighbor_min, labels.node == neighbor_min.src, "left"
        ).select(
            "node",
            F.col("label").alias("_old"),
            F.least(
                F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
            ).alias("label"),
        )
        # pointer jumping (label <- label of label): compresses chains so a
        # path of length L converges in O(log L) rounds instead of O(L)
        lookup = propagated.select(
            F.col("node").alias("_lnode"), F.col("label").alias("_llabel")
        )
        new_labels = (
            propagated.join(lookup, propagated.label == lookup._lnode, "left")
            .select(
                "node",
                "_old",
                F.least(
                    F.col("label"), F.coalesce(F.col("_llabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("label") != F.col("_old")).count()
        labels = new_labels.drop("_old")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components: labels still changing after "
            f"max_iter={max_iter} rounds; output would be incorrect — raise "
            "max_iter (pointer jumping converges in O(log diameter), so 25 "
            "covers diameters up to ~2^25)"
        )

    return labels.select(F.col("node"), F.col("label").alias("component"))


def dedup_clusters(
    edges: DataFrame,
    *,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Duplicate clusters from a pair graph: ``(node, component,
    cluster_size)`` — keep ``node == component`` rows to materialize the
    canonical survivors, or ``node != component`` for the deletion list."""
    from pyspark.sql import Window

    cc = connected_components(edges, src_col=src_col, dst_col=dst_col)
    w = Window.partitionBy("component")
    return cc.select(
        "node", "component", F.count(F.lit(1)).over(w).alias("cluster_size")
    )


def connected_components_star(
    edges: DataFrame,
    *,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components by alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the O(log n)-round algorithm that survives LARGE-diameter
    graphs, where plain min-label propagation needs O(diameter) rounds.

    - large-star: every node links each STRICTLY-LARGER neighbor to the
      minimum of its closed neighborhood;
    - small-star: every node links each not-larger neighbor (and itself)
      to that minimum.

    Both rounds are one groupBy-min plus one join on the node id — the
    same two-shuffle cost as a propagation round, but the star moves whole
    subtrees per round instead of one hop. Termination: the edge multiset
    reaches a star forest (every node points at its component minimum);
    detected by an order-insensitive hash of the edge set. Raises
    ``RuntimeError`` if ``max_iter`` rounds pass without reaching that
    fixpoint (labels would be silently wrong otherwise). Returns
    ``(node, component)`` like ``connected_components``, identical labels
    (asserted in tests on random graphs) — including nodes whose only
    edges are self-loops, which come back as ``(node, node)`` singletons.
    """
    # the incoming pair frame is usually an expensive near-dup build; both
    # the node-set scan and the edge canonicalization consume it, so
    # materialize it once (eager checkpoint: the build job runs with full
    # AQE planning; stored pair partitions feed both branches, GC-reclaimed)
    raw = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    ).localCheckpoint()
    # Nodes appear in the star rounds only via non-self-loop edges; keep the
    # full node set so self-loop-only nodes re-enter as singletons at the end.
    all_nodes = (
        raw.select(F.col("u").alias("node"))
        .unionByName(raw.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    e = (
        raw.filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )

    def _edge_sig(df: DataFrame):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).first()
        return (row["n"], row["h"])

    sig = _edge_sig(e)
    converged = False
    for _ in range(max_iter):
        # large-star over the symmetric adjacency
        adj = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = adj.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            adj.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        e = (
            large.filter(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .distinct()
            .localCheckpoint()
        )
        # small-star over the (u > v) oriented edges
        mins2 = e.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            e.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(mins2.select(F.col("u"), F.col("m").alias("v")))
        )
        e = (
            small.filter(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .distinct()
            .localCheckpoint()
        )
        new_sig = _edge_sig(e)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        raise RuntimeError(
            f"connected_components_star: edge set did not reach the star-"
            f"forest fixpoint within max_iter={max_iter} rounds; labels "
            "would be incorrect — raise max_iter (rounds needed grow "
            "O(log n), so 25 covers any realistic graph)"
        )
    # star forest: every u points at its component min v; the roots
    # themselves are members too. Right-join onto the full node set so
    # self-loop-only (edge-filtered) nodes come back as singletons.
    labeled = e.select(
        F.col("u").alias("node"), F.col("v").alias("component")
    ).unionByName(
        e.select(F.col("v").alias("node"), F.col("v").alias("component"))
    ).distinct()
    return all_nodes.join(labeled, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )
