"""Composed training-data curation funnel [EXT].

The end-to-end shape a 100 TB pre-training pipeline actually runs: exact
dedup -> quality gate -> near-dup removal, reported as a per-stage survivor
funnel. Every stage reuses an already-verified operator (content-hash dedup,
quality_score, SimHash pigeonhole blocking), so the funnel adds composition,
not new kernels.

Scale shape: one hash-shuffle for the dedup groupBy, a map-only quality
filter stacked on the semi-join output, and the segment-blocked SimHash
self-join from operators.dedup — no stage materializes to the driver. In
production the final survivor set is written out (partitioned / bucketed by
source) and the funnel counts are the cheap side metrics; here the counts ARE
the query so the whole plan stays oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hubverse_transform_spark.functions.text import quality_score
from hubverse_transform_spark.operators.dedup import (
    content_hash_dedup,
    simhash_near_dup_pairs,
)


def curation_funnel(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    bits: int = 32,
    ngram: int = 2,
    max_hamming: int = 3,
) -> DataFrame:
    """Per-stage survivor counts of the curation pipeline.

    Stages (each feeding the next):

    1. ``raw`` — input documents.
    2. ``exact_dedup`` — keep the lowest id per sha256(text) group.
    3. ``quality`` — keep rows with ``quality_score(text) >= min_quality``.
    4. ``near_dup`` — drop the higher id of every SimHash pair within
       ``max_hamming`` bits (pigeonhole-blocked self-join; greedy low-id-wins
       is deterministic and needs no iterative clustering).

    Returns ``(stage string, docs_kept bigint)`` — one row per stage. All
    four counts come from ONE aggregation over a single flagged lineage
    (survivorship encoded as boolean columns, counts as conditional sums,
    unpivoted with ``stack``) — a naive per-stage ``.count()`` union re-runs
    every upstream stage once per branch, 4× the scans and shuffles.
    """
    base = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    keep = content_hash_dedup(base, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id"), F.lit(True).alias("_kept")
    )
    flagged = base.join(keep, "doc_id", "left").withColumn(
        "_q", F.col("_kept").isNotNull() & (quality_score(F.col("text")) >= min_quality)
    )
    s2 = flagged.filter("_q").select("doc_id", "text")
    pairs = simhash_near_dup_pairs(
        s2, "doc_id", "text", bits=bits, ngram=ngram, max_hamming=max_hamming
    )
    drop = pairs.select(F.col("id_b").alias("doc_id"), F.lit(True).alias("_dup")).distinct()
    final = flagged.join(drop, "doc_id", "left")

    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0))
    agg = final.agg(
        F.count(F.lit(1)).alias("n_raw"),
        one_if(F.col("_kept").isNotNull()).alias("n_dedup"),
        one_if(F.col("_q")).alias("n_quality"),
        one_if(F.col("_q") & F.col("_dup").isNull()).alias("n_final"),
    )
    return agg.select(
        F.expr(
            "stack(4, 'raw', n_raw, 'exact_dedup', n_dedup, "
            "'quality', n_quality, 'near_dup', n_final) AS (stage, docs_kept)"
        )
    )
