"""Inspect physical plans: verify pushdown, pruning, and join strategies.

At 100 TB a scan that reads all columns for a 2-column projection, or a
sort-merge join where a broadcast was possible, IS the performance bug — so
the engine's tests assert plan shape, not just results, using these helpers.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The plan text of ``df`` (what ``.explain(mode)`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into the file scan (``PushedFilters: [...]``)."""
    plan = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scanned_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (``ReadSchema``) — the pruning check."""
    plan = explain_str(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for part in m.group(1).split(","):
            name = part.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    """True when the plan contains a BroadcastHashJoin (vs sort-merge)."""
    return "BroadcastHashJoin" in explain_str(df)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — wider is better (fewer breaks)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df))))
