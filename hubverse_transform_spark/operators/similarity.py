"""Similarity search over embedding columns [EXT].

Baseline: brute-force cosine top-k — broadcast the (small) query set against
the corpus, score with JVM-side higher-order functions, rank with a window
partitioned by query. The corpus side never shuffles for scoring; the only
exchange is the per-query top-k (tiny).

Scale path: hyperplane-LSH bucketing — each vector maps to a sign-pattern
bucket from D deterministic pseudo-random hyperplanes (derived from md5 of
(plane, dim) so runs are reproducible and oracle-able); candidate generation
joins on bucket, then exact cosine re-ranks. Probing multiple buckets trades
recall for cost.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hubverse_transform_spark.functions.vectors import cosine_similarity, dot_product, l2_norm


def _with_unit_vec(df: DataFrame, id_alias: str, id_col: str, vec_col: str, out: str) -> DataFrame:
    """Project (id, unit-normalized double vector). The norm is materialized
    as a column FIRST so the per-element division doesn't re-evaluate the
    norm subtree per element; zero-norm vectors become null (excluded by any
    similarity predicate, matching cosine's null semantics)."""
    normed = df.select(
        F.col(id_col).alias(id_alias),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    ).select(id_alias, "_v", l2_norm(F.col("_v")).alias("_n"))
    return normed.select(
        id_alias,
        F.when(
            F.col("_n") > 0, F.transform(F.col("_v"), lambda x: x / F.col("_n"))
        ).alias(out),
    )


def cosine_brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query vector by cosine similarity.

    Returns (query_id, neighbor_id, cosine_sim, rank); self-matches excluded.
    ``queries`` is broadcast — scoring is a map-only stage over the corpus.
    Ties break on neighbor id for full determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", cosine_similarity(F.col("_qvec"), F.col("_cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component j in [-1, 1) derived
    from md5(plane|j). Reproducible across engines and runs (no RNG)."""
    comps = []
    for j in range(dim):
        h = hashlib.md5(f"{plane}|{j}".encode()).hexdigest()
        comps.append(int(h[:8], 16) / float(1 << 31) - 1.0)
    return comps


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id of ``vec`` under the given hyperplanes."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(c) for c in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(2**i)).otherwise(F.lit(0))
    return bucket


def cosine_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket.

    2^num_planes buckets; expected candidate set = corpus / 2^planes per
    query. Same output shape as the brute-force operator (rank within
    candidates), so callers can measure recall against the exact baseline.
    """
    planes = [_hyperplane(p, dim) for p in range(num_planes)]
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        hyperplane_bucket(F.col(vec_col), planes).alias("_bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        hyperplane_bucket(F.col(vec_col), planes).alias("_bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="_bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", cosine_similarity(F.col("_qvec"), F.col("_cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 4,
    dim: int = 64,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= threshold).

    ``exact=True`` runs the full self-join (bounded inputs / oracle only);
    default buckets by hyperplane signature first — near-identical vectors
    land in the same bucket with high probability, and the join shuffles on
    bucket keys instead of exploding quadratically.
    """
    if exact:
        # pre-normalize once per vector -> per-pair work is a single dot
        # product instead of dot + two norms (3x fewer flops in the O(n^2) loop)
        a = _with_unit_vec(df, "id_a", id_col, vec_col, "_ua")
        b = _with_unit_vec(df, "id_b", id_col, vec_col, "_ub")
        joined = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
        return (
            joined.withColumn("cosine_sim", dot_product(F.col("_ua"), F.col("_ub")))
            .filter(F.col("cosine_sim") >= threshold)
            .select("id_a", "id_b", "cosine_sim")
        )
    else:
        planes = [_hyperplane(p, dim) for p in range(num_planes)]
        withb = df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            hyperplane_bucket(F.col(vec_col), planes).alias("_bucket"),
        )
        a = withb.select(
            F.col("_id").alias("id_a"), F.col("_v").alias("_va"), "_bucket"
        )
        b = withb.select(
            F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), "_bucket"
        )
        joined = a.join(b, on="_bucket").filter(F.col("id_a") < F.col("id_b"))
    return (
        joined.withColumn("cosine_sim", cosine_similarity(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )
