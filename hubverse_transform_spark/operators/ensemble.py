"""Hub ensemble operators [EXT, domain-aligned]: combine model-output rows
across models into ensemble forecasts.

The reference stops at normalizing per-model submissions into a lake
(SURVEY.md Layer A); the first thing a hub DOES with that lake is build
ensembles — linear-pool means and quantile-wise medians per task cell
(hubverse's downstream hub-ensemble workflow). These operators run on the
exact output schema ``ModelOutputPipeline`` writes, so lake -> ensemble is
one groupBy away.

Scale shape: one hash aggregation keyed by the task cell (task-id columns +
output_type + output_type_id) with map-side partial aggregation; per-model
weights ride in via a broadcast join. No windows, no self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the non-task columns of the model-output schema
_NON_TASK = {"model_id", "value"}


def task_cell_cols(df: DataFrame) -> list[str]:
    """All columns that define a forecast task cell (everything except the
    model identity and the value)."""
    return [c for c in df.columns if c not in _NON_TASK]


def mean_ensemble(
    df: DataFrame,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Linear-pool ensemble: per task cell, the (weighted) mean of model
    values, with the contributing-model count.

    ``weights`` maps model_id -> weight; weights must be non-negative
    (ValueError otherwise). Models NOT listed in ``weights`` are excluded
    entirely (the broadcast inner join drops their rows), so ``n_models``
    counts weighted models only. A task cell whose listed models all carry
    weight 0 has no defined mean (0/0) and is dropped from the output
    rather than emitted as a null-value row. ``weights=None`` means equal
    weights across every model present.

    Output: task-cell columns + ``value`` + ``n_models`` — the same shape
    as a model's own rows, so the ensemble can be written back to the lake
    as just another ``model_id``.
    """
    cells = task_cell_cols(df)
    if weights is None:
        return df.groupBy(*cells).agg(
            F.avg("value").alias("value"),
            F.count_distinct("model_id").alias("n_models"),
        )
    if any(w < 0 for w in weights.values()):
        raise ValueError("ensemble weights must be non-negative")
    spark = df.sparkSession
    w = spark.createDataFrame(list(weights.items()), "model_id string, w double")
    return (
        df.join(F.broadcast(w), "model_id")
        .groupBy(*cells)
        .agg(
            # try_divide: an all-zero-weight cell is null (not an ANSI
            # divide-by-zero error), then dropped by the filter below
            F.try_divide(F.sum(F.col("value") * F.col("w")), F.sum("w")).alias("value"),
            F.count_distinct("model_id").alias("n_models"),
        )
        .filter(F.col("value").isNotNull())
    )


def median_ensemble(df: DataFrame) -> DataFrame:
    """Quantile-wise median ensemble: per task cell, the exact median of
    model values — the outlier-robust combine hubs prefer for quantile
    output types (median of the models' 0.5-quantiles is the ensemble's
    0.5-quantile, and so on per output_type_id)."""
    cells = task_cell_cols(df)
    return df.groupBy(*cells).agg(
        F.median("value").alias("value"),
        F.count_distinct("model_id").alias("n_models"),
    )
