"""hubverse_transform_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of hubverse-org/hubverse-transform (reference at
/root/reference, see SURVEY.md) as idiomatic Spark DataFrame transformations,
plus a general analytic / LLM-data-pipeline operator layer designed for
100 TB-scale execution (partition-aware joins, broadcast dims, AQE, no
driver-side materialization in the data plane).

Layer A (reference parity):
    - ``schema``      tasks.json -> StructType compiler   (ref model_output.py:282-288)
    - ``sources``     schema-enforced CSV / cast-on-read Parquet readers
                      (ref model_output.py:263-277)
    - ``transform``   ModelOutputPipeline: read -> add provenance columns ->
                      single-file parquet sink / delete (ref model_output.py:291-340)
    - ``paths``       filename parse / URI sanitize / S3 key routing
                      (ref model_output.py:136-261)
    - ``streaming``   event-driven ingest (ref faas/lambda_function.py:22-62)

Layer B (extensions, not in the reference — SURVEY.md §2.3):
    - ``operators``   joins/aggs/windows/top-k/set-ops, dedup family
                      (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding),
                      similarity search (brute-force + LSH-bucketed ANN),
                      text analysis, multimodal column plumbing, as-of join
    - ``functions``   column-level helpers (null-token normalization,
                      arrow-style casts, vector math, text metrics)
"""

from hubverse_transform_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
