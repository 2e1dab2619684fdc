"""Data-quality expectations [EXT]: declarative row-level constraint checks
with a quarantine channel.

Generalizes the reference's file-level error channel (UserWarning on bad
extensions, ref model_output.py:112-122, 212-221) to the data plane: instead
of rejecting whole files, every ROW is checked against named predicates and
routed to the clean output or a quarantine annotated with which checks
failed — the badRecordsPath pattern for semantic (not parse) errors.

Scale shape: all checks evaluate in ONE projection over the scan (an array
of failed-check names built from ``when`` expressions — pure codegen, no
UDF); the split is two filters over the same cached/scanned relation, and
each side's filter is pushable. No shuffle at all unless the caller adds one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: name of the appended column listing failed checks (empty array = clean)
VIOLATIONS_COL = "violations"


def with_expectations(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Append ``violations: array<string>`` listing every failed check.

    ``checks`` maps check-name -> predicate Column that must hold for a
    clean row. A predicate evaluating to NULL (e.g. comparisons over null
    inputs) counts as a violation — null-hostile semantics, matching SQL
    CHECK constraints' spirit for quarantine purposes.
    """
    flags = [
        F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
        for name, pred in checks.items()
    ]
    return df.withColumn(
        VIOLATIONS_COL,
        F.array_compact(F.array(*flags)) if flags else F.array().cast("array<string>"),
    )


def split_by_expectations(
    df: DataFrame, checks: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Route rows to (clean, quarantine). Quarantine keeps the violations
    column; clean drops it."""
    annotated = with_expectations(df, checks)
    clean = annotated.filter(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
    quarantine = annotated.filter(F.size(VIOLATIONS_COL) > 0)
    return clean, quarantine
