"""Incremental materialized-view maintenance [EXT]: keep a day-partitioned
aggregate table up to date from a stream without ever rescanning history.

The batch shape (q11/q63) recomputes daily aggregates from the full events
table every run — O(history) per refresh. At 100 TB of events the only viable
refresh is incremental: each micro-batch folds its per-day deltas into the
existing aggregate rows and rewrites ONLY the touched day partitions
(dynamic partition overwrite), so refresh cost tracks batch size, not table
size, and readers always see a consistent parquet view.

Exactly-once: foreachBatch is at-least-once — a batch can be re-delivered
after a failure. Every view row carries the ``batch_id`` that last merged it;
a re-delivered batch first drops rows already stamped with its own id before
merging, so the fold is idempotent under replay.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class DailyAggMatview:
    """Day-partitioned (n_events, sum_value) aggregate of an event stream."""

    def __init__(
        self,
        spark: SparkSession,
        view_path: str,
        *,
        ts_col: str = "ts",
        value_col: str = "value",
    ) -> None:
        self.spark = spark
        self.view_path = view_path
        self.ts_col = ts_col
        self.value_col = value_col

    def _read_view(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self.view_path)
        except AnalysisException:
            return None  # first batch: view does not exist yet

    def upsert(self, batch_df: DataFrame, batch_id: int) -> None:
        """Fold one micro-batch into the view (the foreachBatch body)."""
        deltas = batch_df.groupBy(
            F.to_date(F.col(self.ts_col)).alias("day")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(self.value_col).alias("sum_value"),
        )
        # the touched-day list is tiny (days per batch), safe on the driver;
        # it bounds both the view read and the overwrite to affected partitions
        days = [r.day for r in deltas.select("day").distinct().collect()]
        if not days:
            return
        existing = self._read_view()
        merged = deltas.withColumn("batch_id", F.lit(batch_id))
        if existing is not None:
            prior = existing.filter(
                F.col("day").isin(days) & (F.col("batch_id") != batch_id)
            ).select("day", "n_events", "sum_value", "batch_id")
            merged = (
                prior.unionByName(merged)
                .groupBy("day")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("sum_value").alias("sum_value"),
                    F.max("batch_id").alias("batch_id"),
                )
            )
        # the merge reads the same partitions the write replaces: materialize
        # the merged rows (they are day-level aggregates — tiny) to cut the
        # lineage back to the files being overwritten
        merged = merged.localCheckpoint(eager=True)
        prev = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                merged.repartition("day")
                .write.mode("overwrite")
                .partitionBy("day")
                .parquet(self.view_path)
            )
        finally:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    def start(self, events: DataFrame, checkpoint: str, *, available_now: bool = True):
        """Attach the maintenance loop to a streaming events DataFrame."""
        writer = events.writeStream.foreachBatch(self.upsert).option(
            "checkpointLocation", checkpoint
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def read(self) -> DataFrame:
        view = self._read_view()
        if view is None:
            return self.spark.createDataFrame([], StructType([]))
        return view.select("day", "n_events", "sum_value")
