"""Arrow-parity cast expressions (Layer A, SURVEY.md §7.2).

PyArrow ``cast(float64 -> string)`` renders integral doubles without a
fractional part ("0", "111") and non-integral ones in shortest form ("0.01").
Spark's ``cast(double as string)`` renders "0.0"/"111.0" instead. The golden
tests pin the Arrow form (ref test_model_output.py:328,
test_model_output_integration.py:122), so the double->string path goes through
:func:`double_to_string_arrow` — still a pure codegen expression, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, DoubleType, FloatType, StringType

# largest double that can round-trip a long exactly; above this, integral
# doubles have no fractional digits anyway and Spark renders scientific
# notation like Arrow does not — out of the golden domain, fall back to cast.
_MAX_EXACT_LONG_DOUBLE = 9.007199254740992e15


def double_to_string_arrow(col: Column) -> Column:
    """Render a double column as text the way PyArrow's cast does.

    Integral values print with no fractional part; everything else falls back
    to Spark's string cast (identical to Arrow for shortest-form decimals like
    ``0.01`` in the golden domain).
    """
    is_integral = (
        col.isNotNull()
        & ~F.isnan(col)
        & (col == F.floor(col))
        & (F.abs(col) < F.lit(_MAX_EXACT_LONG_DOUBLE))
    )
    return F.when(is_integral, col.cast("long").cast("string")).otherwise(col.cast("string"))


def cast_to(col: Column, source: DataType, target: DataType) -> Column:
    """Cast ``col`` from ``source`` to ``target`` with Arrow-parity formatting
    for the float->string case (ref pq.read_table(schema=) casting,
    model_output.py:277)."""
    if source == target:
        return col
    if isinstance(source, (DoubleType, FloatType)) and isinstance(target, StringType):
        return double_to_string_arrow(col)
    return col.cast(target)
