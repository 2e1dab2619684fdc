"""Round-13 plan evidence: capture executed (AQE-final) formatted plans for
the queries the r13 optimization touched, under 'before' (r12 session
config) and 'after' (r13 session config) modes.

Usage: python tools/dump_r13_plans.py before|after [q1 q2 ...]

Writes plans/r13/<query>_<mode>.txt. The plan is captured AFTER a noop-sink
execution so AdaptiveSparkPlan shows isFinalPlan=true — AQE coalescing
(partition counts in AQEShuffleRead) and runtime SMJ->SHJ rewrites are
visible, which a static explain cannot show.

'before' recreates the r12-tip session config by overriding the three r13
knobs back to their Spark defaults (minPartitionSize 1m,
preferSortMergeJoin true, SHJ-local-map threshold 0, dataFrameDebugging on).
Diagnostic only - never part of the bench or the timed surface.
"""

from __future__ import annotations

import io
import os
import sys
import contextlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "q158_prefix_filter_jaccard",
    "q212_containment_pairs",
    "q45_dedup_clusters",
    "q249_kcore_peel",
    "q334_clustering_coefficient",
    "q327_mutual_knn_rate",
    "q252_label_propagation",
    "q170_quantile_binning",
    "q302_hard_negative_mining",
    "q281_column_stats_collection",
]


def main() -> None:
    mode = sys.argv[1]
    assert mode in ("before", "after"), mode
    queries = sys.argv[2:] or DEFAULT_QUERIES

    if mode == "before" and not os.environ.get("SPARK_GRAFT_PLANS_NOFLIP"):
        # r12-tip values for the three knobs r13 changed (Spark defaults).
        # For CODE-change captures (same config, old vs new query code) set
        # SPARK_GRAFT_PLANS_NOFLIP=1 and run 'before' from the pre-change
        # tree: both sides then use the committed r13 session config.
        os.environ["SPARK_GRAFT_AQE_MIN_PARTITION_SIZE"] = "1m"
        os.environ["SPARK_GRAFT_SHJ_LOCAL_MAP_THRESHOLD"] = "0"
        os.environ["SPARK_GRAFT_DF_DEBUGGING"] = "true"
        os.environ["SPARK_GRAFT_PREFER_SMJ"] = "true"

    import __spark_entry__ as entry_mod
    from hubverse_transform_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(f"plans-r13-{mode}")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(out_dir, exist_ok=True)

    fns = entry_mod.queries()
    for name in queries:
        spark.sparkContext.setJobDescription(f"plans-r13-{mode}:{name}")
        df = fns[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{mode}.txt")
        with open(path, "w") as f:
            f.write(
                f"# {name} — {mode} (executed plan, AQE final; sf_dir={sf_dir})\n"
            )
            f.write(text)
        print(f"wrote {path} ({len(text)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
