"""Unit tests for the round-3 curation operators: chunk-level dedup,
perplexity bucketing (exact vs approx-threshold agreement), per-domain
caps, and PQ reconstruction."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

from hubverse_transform_spark.operators.dedup import chunk_dup_stats
from hubverse_transform_spark.operators.sampling import per_group_cap
from hubverse_transform_spark.operators.similarity import pq_reconstruction
from hubverse_transform_spark.operators.textstats import (
    perplexity_bucket_thresholds,
    perplexity_buckets,
)


def test_chunk_dup_stats_flags_shared_chunks(spark):
    # docs a and b share their first 3-word chunk; c is unique
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma other words here"),
            (3, "totally unique content nothing shared"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in chunk_dup_stats(docs, chunk_words=3, drop_threshold=0.5).collect()
    }
    assert out[1].n_chunks == 2 and out[1].dup_chunks == 1
    assert out[2].n_chunks == 2 and out[2].dup_chunks == 1
    assert out[3].dup_chunks == 0 and out[3].keep
    assert abs(out[1].dup_fraction - 0.5) < 1e-12
    # fraction == threshold -> not strictly below -> dropped
    assert not out[1].keep


def test_chunk_dup_stats_partial_tail_chunk(spark):
    # 4 words at chunk_words=3 -> 2 chunks, the second a 1-word tail
    docs = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    row = chunk_dup_stats(docs, chunk_words=3).collect()[0]
    assert row.n_chunks == 2


def test_perplexity_bucket_paths_agree(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    exact = {
        r.bucket: r
        for r in perplexity_buckets(docs, n_buckets=3).collect()
    }
    approx = {
        r.bucket: r
        for r in perplexity_bucket_thresholds(docs, n_buckets=3).collect()
    }
    assert set(exact) == set(approx) == {1, 2, 3}
    total_exact = sum(r.n_docs for r in exact.values())
    total_approx = sum(r.n_docs for r in approx.values())
    assert total_exact == total_approx
    # the approx cut points may shift boundary docs by a few, never more
    for b in exact:
        assert abs(exact[b].n_docs - approx[b].n_docs) <= max(
            3, total_exact // 50
        ), (b, exact[b].n_docs, approx[b].n_docs)


def test_per_group_cap_keeps_top_rows_deterministically(spark):
    rows = [("a", i, f"r{i}") for i in range(10)] + [("b", 100, "only")]
    df = spark.createDataFrame(rows, ["grp", "score", "tag"])
    kept = per_group_cap(
        df, "grp", [F.col("score").desc(), F.col("tag")], 3
    ).collect()
    by_grp = {}
    for r in kept:
        by_grp.setdefault(r.grp, []).append(r.score)
    assert sorted(by_grp["a"], reverse=True) == [9, 8, 7]
    assert by_grp["b"] == [100]
    assert "_rank" not in per_group_cap(
        df, "grp", [F.col("score")], 1
    ).columns


def test_pq_reconstruction_error_monotone_in_codes(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    few = pq_reconstruction(emb, n_sub=4, n_codes=2)
    many = pq_reconstruction(emb, n_sub=4, n_codes=8)
    avg_few = few.agg(F.avg("avg_recon_err")).collect()[0][0]
    avg_many = many.agg(F.avg("avg_recon_err")).collect()[0][0]
    # larger codebook can only reduce (or tie) nearest-code distance
    assert avg_many <= avg_few + 1e-9
    # codes drawn from the corpus itself: the code vectors reconstruct
    # themselves exactly, so max error must exceed avg error overall
    assert many.count() > 0
