"""spread_small_scan contract: repartitions small scans, leaves derived
plans alone, and NEVER touches the RDD API (an ``.rdd`` conversion under
AQE eagerly materializes upstream query stages — ADVICE round 7)."""

from __future__ import annotations

import pyspark.sql

from hubverse_transform_spark.session import (
    _scan_shaped,
    spread_small_scan,
)


def _one_file_scan(spark, tmp_path):
    path = str(tmp_path / "tiny.parquet")
    spark.range(0, 1000, 1, 1).selectExpr(
        "id", "cast(id as string) as s"
    ).coalesce(1).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def test_repartitions_one_file_scan(spark, tmp_path):
    df = _one_file_scan(spark, tmp_path)
    out = spread_small_scan(df)
    target = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() >= min(target, 1000)


def test_projection_and_filter_still_scan_shaped(spark, tmp_path):
    df = _one_file_scan(spark, tmp_path).filter("id > 10").select("id")
    assert _scan_shaped(df)
    assert spread_small_scan(df) is not df  # repartitioned


def test_noop_on_derived_plans(spark, tmp_path):
    df = _one_file_scan(spark, tmp_path)
    agg = df.groupBy("s").count()
    joined = df.join(df.selectExpr("id as id2"), df.id == pyspark.sql.functions.col("id2"))
    assert spread_small_scan(agg) is agg
    assert spread_small_scan(joined) is joined
    assert not _scan_shaped(agg)
    assert not _scan_shaped(joined)


def test_noop_on_in_memory_source(spark):
    df = spark.range(10)  # no input files
    assert spread_small_scan(df) is df


def test_never_touches_rdd(spark, tmp_path, monkeypatch):
    """The decision path must not convert the plan to an RDD."""
    df = _one_file_scan(spark, tmp_path)
    agg = df.groupBy("s").count()

    def _boom(self):  # pragma: no cover - failing is the assertion
        raise AssertionError("spread_small_scan touched df.rdd")

    monkeypatch.setattr(pyspark.sql.DataFrame, "rdd", property(_boom))
    spread_small_scan(df)
    spread_small_scan(agg)
