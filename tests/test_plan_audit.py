"""Whole-surface plan audit: no declared query may degenerate to a
CartesianProduct (unhinted cross join) — the classic silent scale killer."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from hubverse_transform_spark.plans.inspect import explain_str

SF = "/root/testdata/sf0.001"

# q45 executes eagerly at build time (localCheckpoint loop); its join
# structure is covered by its own tests
_EAGER = {"q45_dedup_clusters"}


@pytest.mark.parametrize("name", [q for q in entry.queries() if q not in _EAGER])
def test_no_cartesian_product(spark, name):
    plan = explain_str(entry.queries()[name](spark, SF))
    assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"
    # Python must only enter a plan Arrow-batched (ArrowEvalPython,
    # MapInPandas/Arrow, FlatMapGroupsInPandas) — BatchEvalPython is the
    # row-at-a-time pickling path, 10-100x slower, banned everywhere
    assert "BatchEvalPython" not in plan, (
        f"{name} plans a row-at-a-time Python UDF (BatchEvalPython)"
    )
