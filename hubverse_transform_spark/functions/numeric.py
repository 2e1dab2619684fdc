"""Engine-stable display rounding.

``round(double, d)`` is implemented differently across engines (Spark rounds
the exact BigDecimal expansion of the double; DuckDB rounds the scaled binary
value), so a value that sits exactly ON a half boundary — which integer
ratios genuinely reach, e.g. 1/128 = 0.0078125 at d = 6 — rounds differently
on the SAME input double. Reference divergence class: round-8/9 multi-seed
differential campaign (q148 et al.).

``half_up(x, d)`` = floor(x * 10^d + 0.5) / 10^d evaluates the identical
IEEE operation sequence on both engines, so it cannot diverge — PROVIDED the
input double is itself bit-identical across engines. That holds for
deterministic per-row expressions (integer-ratio similarities, shares,
rates) but NOT for order-dependent float aggregates (sums of doubles), which
need the exact-integer-numerator form instead (``__spark_entry__._half_up``).

Oracle-side equivalent: ``floor(x * 1e<d> + 0.5) / 1e<d>``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def half_up(col: Column, d: int) -> Column:
    """floor(col * 10^d + 0.5) / 10^d — engine-stable half-up of a
    deterministic (bit-identical cross-engine) double at d decimals.

    Half-UP, not half-away-from-zero: an exact NEGATIVE half boundary
    rounds toward +inf (-0.0000005 -> -0.0 at d=6), where ``round()``
    would round away from zero. Deliberate repo-wide convention (see
    ``__spark_entry__._half_up``): the boundary direction for negatives is
    a display choice; cross-engine determinism is the requirement, and the
    oracle mirrors the same floor form so both sides agree by
    construction."""
    p = F.lit(float(10**d))
    return F.floor(col * p + 0.5) / p
