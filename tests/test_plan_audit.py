"""Whole-surface plan audit: no declared query may degenerate to a
CartesianProduct (unhinted cross join) — the classic silent scale killer."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from tests.conftest import PLAN_EAGER as _EAGER

# plans come from the shared one-compile-pass fixture
# (tests/conftest.compiled_surface) — see its docstring; each audit below
# is a string/int assertion over the precompiled artifact.


@pytest.mark.parametrize("name", [q for q in entry.queries() if q not in _EAGER])
def test_no_cartesian_product(compiled_surface, name):
    art = compiled_surface[name]
    assert "error" not in art, f"{name}: plan compile failed: {art.get('error')}"
    plan = art["plan"]
    assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"
    # Python must only enter a plan Arrow-batched (ArrowEvalPython,
    # MapInPandas/Arrow, FlatMapGroupsInPandas) — BatchEvalPython is the
    # row-at-a-time pickling path, 10-100x slower, banned everywhere
    assert "BatchEvalPython" not in plan, (
        f"{name} plans a row-at-a-time Python UDF (BatchEvalPython)"
    )


# Whitelisted unpartitioned-window sites (Spark's "No Partition Defined for
# Window operation" WARN). A global window funnels its whole input through
# ONE task — admissible ONLY when the rows entering it are bounded by
# something other than data volume. Each entry: query -> (count, why the
# window input stays small at 100 TB). Any NEW unpartitioned window fails
# this gate until it's justified here.
_GLOBAL_WINDOW_OK = {
    # post-aggregation month grain: rows = distinct months
    "q117_mom_revenue_growth": (1, "running window over per-month aggregates"),
    # CDF over DISTINCT rounded perplexity scores (value granularity)
    "q127_perplexity_buckets": (2, "cumulative dist over distinct score table"),
    # one row per day after the daily-HLL rollup
    "q135_cumulative_distinct_users": (1, "running union over per-day rows"),
    # gap grid bounded by the observed day span
    "q147_interpolate_gaps": (1, "navigation over per-day series"),
    # log-log regression over the top-k frequency ranks (k fixed)
    "q165_zipf_slope": (1, "rank over bounded top-k vocab slice"),
    # one row per category after aggregation
    "q190_largest_remainder": (1, "seat-remainder rank over category rows"),
    # rows = embedding dimension (fixed, 64)
    "q195_power_iteration_pca": (1, "ordering over dim-sized eigenvector"),
    # rows = nodes of the (small) dimension hierarchy
    "q196_hierarchy_share": (1, "share-of-parent over hierarchy rows"),
    # CDFs over the (value, count) histogram: distinct token LENGTHS
    "q214_ks_drift": (2, "cumulative CDFs over value-granularity histogram"),
    # window over the distinct-frequency histogram, not the vocabulary
    "q215_vocab_gini": (1, "block-sum over distinct-frequency table"),
    # IDF/score rank over the top-k result slice
    "q70_bm25_search": (1, "rank over bounded result set"),
    # PMI rank over the aggregated bigram table's top slice
    "q71_pmi_collocations": (1, "rank over aggregated collocation table"),
    # ratio-to-report over per-nation aggregates
    "q88_revenue_share": (1, "share window over per-group aggregates"),
    # the one intentional residual: prefix-sum over the 32-row bucket-count
    # table; the data-sized numbering runs in the PARTITIONED window
    "q220_scalable_row_number": (1, "offset prefix-sum over <=32 bucket rows"),
    # remainder rank over the 5-row stratum allocation table
    "q240_neyman_allocation": (1, "largest-remainder rank over 5 segment rows"),
    # cumulative capture over the quantized score grid (<=1001 rows by
    # 3-decimal score granularity, not data volume)
    "q244_gain_lift_table": (1, "cumsum over <=1001-row score grid"),
    # scalar modularity total over the 25-row per-brand contribution table
    "q248_graph_modularity": (1, "sum over 25 brand-community rows"),
    # lag over exactly 5 depth-quintile rate rows
    "q358_depth_conversion_monotonicity": (1, "lag over 5 quintile rows"),
    # cumulative Q over exactly 7 lag rows
    "q368_ljung_box_residuals": (1, "cumsum over 7 lag rows"),
    # day-rank over the bounded order-date grid (date span, not data
    # volume); the ranked grid feeds BOTH sides of the decay join, so the
    # window appears twice in the plan
    "q359_ewma_control_chart": (2, "rank over ~2400 distinct-day rows, x2"),
}


@pytest.mark.parametrize("name", [q for q in entry.queries() if q not in _EAGER])
def test_no_unjustified_global_window(compiled_surface, name):
    """Census gate: every unpartitioned Window in every declared query must
    appear in _GLOBAL_WINDOW_OK with its cardinality argument; a whitelisted
    query losing its global window must be removed from the list (keeps the
    census honest both ways)."""
    art = compiled_surface[name]
    assert "error" not in art, f"{name}: plan compile failed: {art.get('error')}"
    got = art["gwin"]
    want = _GLOBAL_WINDOW_OK.get(name, (0, ""))[0]
    assert got == want, (
        f"{name}: {got} unpartitioned Window ops, whitelist says {want} — "
        "a global window is a single-task funnel; justify it in "
        "_GLOBAL_WINDOW_OK (bounded-cardinality argument) or partition it"
    )
