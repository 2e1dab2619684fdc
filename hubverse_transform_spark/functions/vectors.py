"""Vector math over ``array<float>`` embedding columns (Layer B [EXT]).

Pure higher-order-function expressions (``zip_with`` / ``aggregate``) — these
run JVM-side inside codegen, so a cosine top-k over 100 TB of embeddings never
crosses into Python. Elements are cast to double before accumulating so the
result is order-stable and matches DuckDB's ``list_dot_product`` /
``list_cosine_similarity`` oracles at double precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Elementwise product summed in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm of an array column."""
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; null when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)
