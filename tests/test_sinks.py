"""Partitioned-lake sink + one-pass bulk backfill (scale path of A6/A14)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from hubverse_transform_spark.sinks import backfill_hub_dataset, write_hub_dataset


def test_backfill_builds_partitioned_lake(spark, hub_dir: Path, csv_numeric_file: Path):
    # two submissions -> one glob read -> one partitioned write
    second = hub_dir / "raw" / "2024-08-01-teamxyz-model.csv"
    second.write_text(csv_numeric_file.read_text())
    lake = hub_dir / "lake"

    df = backfill_hub_dataset(spark, str(hub_dir), str(lake))
    assert set(df.columns) >= {"round_id", "model_id"}

    # hive layout: model_id=<...>/round_id=<...>
    dirs = {p.name for p in lake.iterdir() if p.is_dir()}
    assert dirs == {
        "model_id=teamabc-output_type_ids_numeric",
        "model_id=teamxyz-model",
    }

    back = spark.read.parquet(str(lake))
    assert back.count() == 12
    # partition pruning: filtering on the partition column scans one partition
    one = back.filter(F.col("model_id") == "teamxyz-model")
    assert one.count() == 6


def test_write_hub_dataset_appends(spark, tmp_path: Path):
    lake = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [("m1", "2024-01-01", 1.0)], ["model_id", "round_id", "value"]
    )
    write_hub_dataset(df, lake)
    write_hub_dataset(df, lake)  # append mode: second write adds rows
    assert spark.read.parquet(lake).count() == 2
