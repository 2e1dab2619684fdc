"""Streaming curation pipeline [EXT]: the training-data funnel applied at
ingest instead of in batch.

Composes three independently-tested stages over a document stream:

1. quality gate  — ``functions.text.quality_score`` filter (stateless
   projection, codegen);
2. content dedup — md5 fingerprint + ``dropDuplicatesWithinWatermark``
   (state bounded by traffic per watermark window, the only viable shape
   for an unbounded corpus — see streaming/stateful.watermarked_dedup);
3. split routing — ``operators.sampling.hash_split`` (stateless md5
   bucketing, reproducible across replays by construction).

The sink partitions by split, so train/val/test land in separate directories
as data arrives — the streaming twin of the batch curation funnel
(plans/curation.py, q49) plus the q101 split. Batch frames run the same
pipeline eagerly (dedup falls back to dropDuplicates), which is how the
backfill path reuses this exact code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hubverse_transform_spark.functions.text import doc_fingerprint, quality_score
from hubverse_transform_spark.operators.sampling import hash_split
from hubverse_transform_spark.streaming.stateful import watermarked_dedup


def curate_document_stream(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    min_quality: float = 0.5,
    watermark: str = "1 hour",
) -> DataFrame:
    """Quality-gate, dedup, and split-route a (possibly streaming) document
    frame. Returns the curated frame with ``quality``, ``fingerprint`` and
    ``split`` columns appended — ready for
    ``writeStream.partitionBy("split")``.
    """
    scored = docs.withColumn("quality", quality_score(F.col(text_col)))
    gated = scored.filter(F.col("quality") >= min_quality)
    fp = gated.withColumn("fingerprint", doc_fingerprint(F.col(text_col)))
    deduped = watermarked_dedup(
        fp, key_cols=["fingerprint"], ts_col=ts_col, watermark=watermark
    )
    return hash_split(deduped, id_col)


def run_curation_stream(
    docs: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    **kwargs,
):
    """Start the curation stream into a split-partitioned parquet lake.

    Append mode: every surviving document lands exactly once per checkpoint
    lineage (dedup state and sink commits both live in the checkpoint), and
    the split partitioning means downstream training jobs read
    ``output_dir/split=train`` with partition pruning.
    """
    curated = curate_document_stream(docs, **kwargs)
    return (
        curated.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("split")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
