"""Skyline / Pareto-frontier operator [EXT].

Finds the non-dominated rows under (minimize x, maximize y) — the classic
skyline query (Borzsony/Kossmann/Stocker, ICDE'01). Not expressible as a
join-free SQL window in general; the distributed form used here is the
standard two-phase scheme:

1. LOCAL phase: each partition computes its own skyline with the sort +
   running-max sweep (O(n log n), inside ``mapInPandas`` on numpy arrays) —
   dominated rows die where they live, and each partition emits at most its
   local frontier;
2. GLOBAL phase: the union of local frontiers (bounded: skylines are small
   relative to inputs in practice) is swept once more on a single partition
   to drop cross-partition dominated rows.

A row (x1, y1) dominates (x2, y2) iff x1 <= x2 and y1 >= y2 with at least
one strict. Ties on both coordinates are all kept (they dominate each other
non-strictly, i.e. not at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _sweep(pdf, x_col: str, y_col: str):
    """Skyline sweep on one pandas frame: reduce to one (x, max y) pair per
    x, sort by x, keep pairs whose y strictly exceeds the running max of
    all smaller x — then join the surviving pairs back so rows tied on
    both coordinates (mutually non-dominated) are ALL kept."""
    if not len(pdf):
        return pdf
    best = pdf.groupby(x_col, as_index=False)[y_col].max().sort_values(x_col)
    ymax = best[y_col].cummax().shift(1)
    keep_pairs = best[(ymax.isna() | (best[y_col] > ymax)).to_numpy()]
    return pdf.merge(keep_pairs, on=[x_col, y_col])


def pareto_skyline(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Two-phase distributed skyline under (min ``x_col``, max ``y_col``).

    Returns the non-dominated subset of ``df`` with its original columns.
    Phase 1 prunes per partition (the data-sized work, fully parallel);
    phase 2 re-sweeps only the surviving local frontiers after a
    coalesce(1) — correct because global skyline ⊆ union of local skylines
    (any globally non-dominated row is trivially non-dominated within its
    own partition).
    """
    schema = df.schema

    def local(batches):
        for pdf in batches:
            out = _sweep(pdf, x_col, y_col)
            if len(out):
                yield out

    def final(batches):
        import pandas as pd

        parts = [pdf for pdf in batches if len(pdf)]
        if not parts:
            return
        yield _sweep(pd.concat(parts, ignore_index=True), x_col, y_col)

    locally = df.mapInPandas(local, schema)
    return locally.coalesce(1).mapInPandas(final, schema)
