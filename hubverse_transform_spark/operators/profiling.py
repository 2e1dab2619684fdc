"""One-pass data profiling [EXT]: per-column health statistics.

The first query anyone runs against an unfamiliar 100 TB lake: row count,
null fraction, distinct count, min/max per column. All columns profile in a
SINGLE aggregation over one scan (2 + 3·n_cols aggregate expressions), then
the wide result unpivots to one row per column — never one scan per column.

``count_distinct`` here is exact (it is the oracle-checkable form and fine
at profile-table scale); at true lake scale swap ``approx_count_distinct``
via ``exact=False`` — same single-pass plan with HLL sketches instead of
distinct-hash aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, *, exact: bool = True
) -> DataFrame:
    """Profile ``cols`` (default: all) in one aggregation.

    Returns (column, n_rows, n_null, n_distinct, min_value, max_value) with
    min/max rendered as strings so heterogeneous column types coexist in one
    long-format result.
    """
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"__null_{c}"))
        dc = F.count_distinct(col) if exact else F.approx_count_distinct(col)
        aggs.append(dc.alias(f"__dist_{c}"))
        aggs.append(F.min(col).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__null_{c}").alias("n_null"),
            F.col(f"__dist_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_value"),
            F.col(f"__max_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")
