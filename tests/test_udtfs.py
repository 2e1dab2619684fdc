"""Unit tests for the ChunkText UDTF (functions/udtfs.py)."""

from __future__ import annotations

import hashlib

from hubverse_transform_spark.functions.udtfs import register_udtfs


def test_chunk_text_windows_and_overlap(spark):
    register_udtfs(spark)
    text = " ".join(f"t{i}" for i in range(50))
    spark.createDataFrame([(1, text)], "doc_id long, text string").createOrReplaceTempView(
        "chunk_in"
    )
    rows = spark.sql(
        "SELECT d.doc_id, c.* FROM chunk_in d, LATERAL chunk_text(d.text, 32, 8) c"
    ).collect()
    # stride 24 over 50 tokens -> starts at 0, 24, 48
    assert [(r.chunk_idx, r.n_tokens) for r in rows] == [(0, 32), (1, 26), (2, 2)]
    expect0 = hashlib.md5(" ".join(f"t{i}" for i in range(32)).encode()).hexdigest()
    assert rows[0].chunk_hash == expect0


def test_chunk_text_empty_and_null(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "one two")],
        "doc_id long, text string",
    ).createOrReplaceTempView("chunk_edge")
    rows = spark.sql(
        "SELECT d.doc_id, c.* FROM chunk_edge d, LATERAL chunk_text(d.text, 4, 1) c"
    ).collect()
    assert [(r.doc_id, r.chunk_idx, r.n_tokens) for r in rows] == [(4, 0, 2)]
