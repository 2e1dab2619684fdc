"""Incremental materialized-view maintenance: per-batch folds, partition
isolation, and replay idempotency."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from hubverse_transform_spark.streaming.matview import DailyAggMatview


def _events(spark, rows):
    return spark.createDataFrame(rows, ["ts_str", "value"]).select(
        F.to_timestamp("ts_str").alias("ts"), F.col("value").cast("double")
    )


def _view_dict(mv):
    return {
        str(r.day): (r.n_events, r.sum_value) for r in mv.read().collect()
    }


def test_matview_incremental_fold_and_partition_isolation(spark, tmp_path: Path):
    src, ckpt = tmp_path / "src", str(tmp_path / "ckpt")
    view = str(tmp_path / "view")
    mv = DailyAggMatview(spark, view)

    b1 = _events(
        spark,
        [("2024-01-01 10:00:00", 1.0), ("2024-01-01 11:00:00", 2.0), ("2024-01-02 09:00:00", 5.0)],
    )
    b1.coalesce(1).write.mode("append").parquet(str(src))
    q = mv.start(
        spark.readStream.schema("ts timestamp, value double").parquet(str(src)), ckpt
    )
    q.awaitTermination()
    assert _view_dict(mv) == {"2024-01-01": (2, 3.0), "2024-01-02": (1, 5.0)}

    # second batch touches day-02 and a new day-03: day-01 partition untouched
    b2 = _events(spark, [("2024-01-02 12:00:00", 10.0), ("2024-01-03 08:00:00", 7.0)])
    b2.coalesce(1).write.mode("append").parquet(str(src))
    q = mv.start(
        spark.readStream.schema("ts timestamp, value double").parquet(str(src)), ckpt
    )
    q.awaitTermination()
    assert _view_dict(mv) == {
        "2024-01-01": (2, 3.0),
        "2024-01-02": (2, 15.0),
        "2024-01-03": (1, 7.0),
    }


def test_matview_replay_is_idempotent(spark, tmp_path: Path):
    view = str(tmp_path / "view")
    mv = DailyAggMatview(spark, view)

    batch = _events(spark, [("2024-02-01 10:00:00", 4.0), ("2024-02-01 11:00:00", 6.0)])
    mv.upsert(batch, batch_id=7)
    assert _view_dict(mv) == {"2024-02-01": (2, 10.0)}

    # at-least-once delivery: the SAME batch id arrives again -> no double count
    mv.upsert(batch, batch_id=7)
    assert _view_dict(mv) == {"2024-02-01": (2, 10.0)}

    # a genuinely new batch folds in
    mv.upsert(_events(spark, [("2024-02-01 12:00:00", 1.0)]), batch_id=8)
    assert _view_dict(mv) == {"2024-02-01": (3, 11.0)}
