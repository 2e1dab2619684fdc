"""Raw text corpus source [EXT]: glob of text files -> a documents frame.

The front door of an LLM data pipeline: crawl/export directories of plain
text (one document per line, the common jsonl-adjacent layout) become the
``documents``-shaped frame the curation operators consume. Built on Spark's
distributed text source, so a million files fan out across executors and
``input_file_name()`` keeps provenance without any driver-side listing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_corpus(
    spark: SparkSession,
    path: str,
    *,
    min_chars: int = 1,
    line_per_doc: bool = True,
) -> DataFrame:
    """Read a text-file glob into (doc_id, text, source, n_chars).

    ``line_per_doc=True``: each line is a document (jsonl-style exports);
    False: each FILE is one document (``wholetext``). ``doc_id`` is a
    deterministic 64-bit id from (source file, content) — stable across
    re-reads and cluster sizes, unlike ``monotonically_increasing_id`` which
    is partition-layout-dependent. Blank/short lines are dropped before the
    id projection so the filter pushes into the scan.
    """
    raw = spark.read.text(path, wholetext=not line_per_doc)
    docs = (
        raw.select(
            F.col("value").alias("text"),
            F.input_file_name().alias("source"),
        )
        .filter(F.length(F.trim(F.col("text"))) >= min_chars)
    )
    return docs.select(
        F.xxhash64("source", "text").alias("doc_id"),
        "text",
        "source",
        F.length("text").alias("n_chars"),
    )
