"""Physical-plan inspection helpers."""

from hubverse_transform_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    scanned_columns,
)

__all__ = ["explain_str", "pushed_filters", "scanned_columns", "has_broadcast_join"]
