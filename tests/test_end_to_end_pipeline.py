"""Whole-engine integration: raw text files -> corpus frame -> batch curation
(quality gate + content dedup + split routing) -> split-partitioned lake ->
profile readback. One test that walks the path a real training-data pipeline
takes through the library's public surface."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


GOOD = (
    "the quick brown fox jumps over the lazy dog and then keeps running "
    "through the quiet field while the sun is high and the air is warm "
)


def test_text_corpus_to_curated_lake(spark, tmp_path):
    from hubverse_transform_spark.operators.profiling import profile_columns
    from hubverse_transform_spark.sources.textfiles import read_text_corpus
    from hubverse_transform_spark.streaming.curation import curate_document_stream

    src = tmp_path / "raw"
    src.mkdir()
    # 3 files x 20 docs; file c duplicates file a's content exactly
    lines_a = [GOOD + f"variant {i}" for i in range(20)]
    lines_b = [GOOD + f"other {i}" for i in range(20)]
    (src / "a.txt").write_text("\n".join(lines_a) + "\n")
    (src / "b.txt").write_text("\n".join(lines_b) + "\n")
    (src / "c.txt").write_text("\n".join(lines_a) + "\n")  # pure duplicate
    (src / "junk.txt").write_text("!!!\n??\n")  # gated by quality

    docs = read_text_corpus(spark, str(src / "*.txt")).withColumn(
        "ingest_ts", F.timestamp_seconds(F.lit(1700000000))
    )
    curated = curate_document_stream(docs, id_col="doc_id", ts_col="ingest_ts")

    lake = str(tmp_path / "lake")
    curated.write.partitionBy("split").parquet(lake)

    back = spark.read.parquet(lake)
    # 40 distinct texts survive: c's 20 dedup against a's, junk gated
    assert back.count() == 40
    assert back.select("fingerprint").distinct().count() == 40
    assert set(r.split for r in back.select("split").distinct().collect()) <= {
        "train",
        "val",
        "test",
    }
    # physical layout: split is a partition directory (pruned reads for
    # downstream training jobs)
    assert {d for d in os.listdir(lake) if d.startswith("split=")}

    # profile the curated lake end-to-end (exact path)
    prof = {r.column: r for r in profile_columns(back, ["doc_id", "n_chars"]).collect()}
    assert prof["doc_id"].n_rows == 40 and prof["doc_id"].n_distinct == 40
    assert prof["n_chars"].n_null == 0
