"""Live-S3 integration smoke (env-gated; skipped without credentials).

Mirrors the reference's one live test (ref
test/integration/test_model_output_integration.py:163-170 —
``ModelOutputHandler.from_s3`` reading a real hub's tasks config). Spark's
S3 access goes through the s3a Hadoop connector instead of cloudpathlib, so
the smoke validates the same three contract points on the s3a path:

1. key routing (``from_s3`` -> hub/input/output URIs on the bucket),
2. the config scan (tasks.json fetched through the Hadoop FS API),
3. a schema-enforced read of the routed submission file.

Gate: set ``HUBVERSE_S3_TEST_BUCKET`` (and, when the driver requires a
routed object, ``HUBVERSE_S3_TEST_KEY``, default the reference's FluSight
example key) with working AWS credentials in the environment, plus
hadoop-aws on the Spark classpath (``spark.jars.packages
org.apache.hadoop:hadoop-aws``). None of that exists in the test sandbox,
so this module must report SKIPPED, not failed.
"""

from __future__ import annotations

import os

import pytest

BUCKET = os.environ.get("HUBVERSE_S3_TEST_BUCKET")
KEY = os.environ.get(
    "HUBVERSE_S3_TEST_KEY",
    "raw/model-output/FluSight-ensemble/2023-10-14-FluSight-ensemble.csv",
)

pytestmark = pytest.mark.skipif(
    not BUCKET,
    reason="live S3 smoke: set HUBVERSE_S3_TEST_BUCKET + AWS credentials "
    "+ hadoop-aws on the classpath to run",
)


@pytest.fixture(scope="module")
def s3_spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("s3-smoke")
        .config("spark.jars.packages", "org.apache.hadoop:hadoop-aws:3.4.1")
        .config(
            "spark.hadoop.fs.s3a.aws.credentials.provider",
            "org.apache.hadoop.fs.s3a.DefaultAWSCredentialsProviderChain",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_from_s3_routes_and_reads_tasks(s3_spark):
    """from_s3 must route the key and fetch tasks.json via s3a (the live
    analog of ref test_model_output_integration.py:163-170)."""
    from hubverse_transform_spark.transform import ModelOutputPipeline

    mo = ModelOutputPipeline.from_s3(s3_spark, BUCKET, KEY)
    assert mo.hub_path == f"s3a://{BUCKET}"
    assert "rounds" in mo.tasks
    assert len(mo.tasks["rounds"]) >= 1


def test_read_file_schema_enforced(s3_spark):
    """The routed submission must read through the compiled hub schema."""
    from hubverse_transform_spark.transform import ModelOutputPipeline

    mo = ModelOutputPipeline.from_s3(s3_spark, BUCKET, KEY)
    df = mo.read_file()
    assert {"output_type", "output_type_id", "value"} <= set(df.columns)
