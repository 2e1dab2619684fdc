"""Partitioned hub-lake sink (scale path of A6) + one-pass bulk backfill (A14).

The reference writes one Parquet object per submission file
(ref model_output.py:312-322) and backfills by re-firing a Lambda per S3
object (ref faas/lambda_retrigger_model_output_add.py:13-66). At 100 TB the
Spark-native shape is:

- a Hive-partitioned lake keyed by the two provenance columns the transform
  appends — ``model_id``/``round_id`` — so downstream queries prune partitions
  on the dominant access axes (SURVEY.md §7 "scale posture");
- backfill as ONE glob read over every raw submission with provenance parsed
  columnar from the file name (``input_file_name``), instead of a per-object
  driver loop — the scan parallelizes across the cluster and a million raw
  files are one job, not a million Lambda invocations.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession

from hubverse_transform_spark.schema import hub_schema
from hubverse_transform_spark.sources.config import read_tasks
from hubverse_transform_spark.sources.model_output import (
    read_model_output_csv,
    read_model_output_parquet,
)
from hubverse_transform_spark.transform import with_provenance_from_filename

PARTITION_COLS = ["model_id", "round_id"]


def write_hub_dataset(df: DataFrame, path: str, mode: str = "append") -> None:
    """Write transformed model-output rows as a partitioned Parquet lake.

    ``partitionBy(model_id, round_id)`` keeps each submission's rows in its
    own directory — reads filtered on either provenance column (the common
    downstream pattern) scan only matching partitions. ``append`` is the
    steady-state mode; use ``overwrite`` with
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` for idempotent
    re-submissions of a single (model, round).
    """
    df.write.mode(mode).partitionBy(*PARTITION_COLS).parquet(path)


def overwrite_submission_partitions(df: DataFrame, path: str) -> None:
    """Idempotent re-submission at lake scale: dynamic partition overwrite.

    The reference re-uploads a file and overwrites the same output object
    (ref model_output.py:312-322); the partitioned-lake equivalent replaces
    ONLY the (model_id, round_id) partitions present in ``df``, leaving every
    other submission untouched — no read-modify-write of the whole dataset.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        df.write.mode("overwrite").partitionBy(*PARTITION_COLS).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    *,
    bucket_col: str,
    num_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    Bucketing pre-shuffles the data ONCE at write time: two tables bucketed on
    the same key with the same bucket count join with ZERO exchanges (and zero
    sorts when ``sort_col`` matches the join key) — the physical answer to
    "this fact table joins on this key every day". At 100 TB that one avoided
    shuffle per query dominates everything else. Verified by plan assertion in
    tests (no Exchange under the join).
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(name)


def backfill_hub_dataset(
    spark: SparkSession,
    hub_path: str,
    output_path: str,
    *,
    raw_dir: str = "raw",
    file_format: str = "csv",
    mode: str = "overwrite",
) -> DataFrame:
    """Reprocess every raw submission file in one distributed pass.

    One schema-enforced glob read (files must share a header layout per
    format), provenance derived per-row from the source file name, one
    partitioned write. Returns the transformed DataFrame (already written).
    """
    tasks = read_tasks(hub_path)
    if not tasks:
        raise FileNotFoundError(f"could not read tasks.json for hub_path={hub_path!r}")
    schema = hub_schema(tasks)
    glob = posixpath.join(str(hub_path), raw_dir, f"*.{file_format}")
    if file_format == "csv":
        df = read_model_output_csv(spark, glob, schema)
    elif file_format in ("parquet", "pqt"):
        df = read_model_output_parquet(spark, glob, schema)
    else:
        raise ValueError(f"Unsupported backfill format {file_format!r}")
    df = with_provenance_from_filename(df)
    write_hub_dataset(df, output_path, mode=mode)
    return df
