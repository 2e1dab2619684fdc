"""Minimal repro: which plan shapes get runtime exchange reuse, and which
need a manual persist (r13 verdict item 6).

The r13 census found 0 ReusedExchange nodes across 40 executed query plans
even though many queries consume one expensive intermediate from several
plan branches (q251 executed 120 parquet scans for a 2-round HITS). This
script distinguishes the cases on a tiny synthetic input so future persist
decisions can cite mechanism instead of re-measuring every query:

  A. SELF-JOIN on one aggregated frame (two aliases of the SAME object,
     same key) — the classic case exchange reuse was built for.
  B. TWO-BRANCH UNION where each branch re-derives the same aggregate and
     then aggregates differently — the shape most multi-branch operators
     here have (degree-from-both-endpoints, verification re-joins).
  C. Case B with the shared frame .persist()ed — what the codebase does
     manually.

For each case it prints the EXECUTED plan's ReusedExchange /
ReusedSubquery / InMemoryTableScan / Exchange / scan counts. Run:

    python tools/repro_exchange_reuse.py

Diagnostic only — never part of the bench contract or the timed surface.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hubverse_transform_spark.session import get_spark


def executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def census(label: str, plan: str) -> None:
    counts = {
        pat: len(re.findall(pat, plan))
        for pat in (
            "ReusedExchange",
            "ReusedSubquery",
            "InMemoryTableScan",
            "Exchange",
            "Scan parquet",
            "HashAggregate",
        )
    }
    print(f"{label:55s} {counts}")


def main() -> None:
    spark = get_spark("repro-exchange-reuse", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")
    path = "/tmp/repro_exchange_reuse_input"
    spark.range(0, 100_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
    ).write.mode("overwrite").parquet(path)
    base = spark.read.parquet(path)

    # A. self-join of ONE aggregated frame on its own key: the two join
    # sides canonicalize to the same Exchange subtree inside one plan.
    agg = base.groupBy("k").agg(F.sum("v").alias("s"))
    a, b = agg.alias("a"), agg.alias("b")
    self_join = a.join(b, F.col("a.k") == F.col("b.k")).select(
        F.col("a.k"), (F.col("a.s") + F.col("b.s")).alias("t")
    )
    census("A self-join of one aggregate (same key)", executed_plan(self_join))

    # B. two-branch union, each branch re-deriving the same aggregate then
    # aggregating on DIFFERENT keys: the shared subtree feeds exchanges
    # with different partitioning, so there is no common Exchange to
    # reuse — only the upstream scan+aggregate, which reuse does NOT
    # deduplicate because reuse matches Exchange/Subquery nodes only.
    br1 = agg.groupBy((F.col("k") % 10).alias("g")).agg(F.sum("s").alias("x"))
    br2 = agg.groupBy((F.col("k") % 7).alias("g")).agg(F.max("s").alias("x"))
    union = br1.unionByName(br2)
    census("B union of two re-aggregations (diff keys)", executed_plan(union))

    # B2. union where both branches DO share the aggregate's own exchange
    # key — the favorable sub-case.
    br3 = agg.filter(F.col("s") > 100).select("k", F.col("s").alias("x"))
    br4 = agg.filter(F.col("s") < 50).select("k", (F.col("s") * 2).alias("x"))
    union2 = br3.unionByName(br4)
    census("B2 union of two filters over one aggregate", executed_plan(union2))

    # C. the manual fix: persist the shared frame. Branches hit
    # InMemoryTableScan; upstream runs once.
    aggp = base.groupBy("k").agg(F.sum("v").alias("s")).persist()
    br1p = aggp.groupBy((F.col("k") % 10).alias("g")).agg(F.sum("s").alias("x"))
    br2p = aggp.groupBy((F.col("k") % 7).alias("g")).agg(F.max("s").alias("x"))
    unionp = br1p.unionByName(br2p)
    census("C same union, shared aggregate persisted", executed_plan(unionp))
    aggp.unpersist()

    print(
        "\nReading: reuse fires only where an identical Exchange subtree "
        "appears twice INSIDE one plan (case A); a union whose branches "
        "re-derive the same upstream work below DIFFERENT exchange keys "
        "(case B) re-executes that work per branch — Spark's reuse "
        "matches Exchange/Subquery nodes, never arbitrary subtrees. "
        "Manual persist (case C) is the only mechanism that deduplicates "
        "those, which is why the multi-branch operators here carry "
        "cache-compute-release."
    )
    spark.stop()


if __name__ == "__main__":
    main()
