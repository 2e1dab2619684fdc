"""Round-14 plan evidence: capture executed (AQE-final) formatted plans
for touched queries, from whatever tree this file runs in.

Usage: python tools/dump_r14_plans.py <suffix> q1 [q2 ...]

Writes plans/r14/<query>_<suffix>.txt INTO THE REPO (absolute path, so
running a copy of this script from a baseline worktree still lands the
'before' captures next to the 'after' ones). Unlike the r13 dumper there
is no config flip: r14 changes are code-only, so 'before' is captured by
running this script from a worktree at the pre-change commit with the
same session config.

The plan is captured AFTER a noop-sink execution so AdaptiveSparkPlan
shows isFinalPlan=true. Operators that end in ``compute_release`` show a
checkpoint-truncated final frame; set SPARK_GRAFT_EXPLAIN_LAZY=1 to
capture the full operator DAG behind the boundary (lazy mode — dump
process only, never bench/oracle/tests).

Diagnostic only — never part of the bench contract or the timed surface.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.getcwd())

OUT_DIR = "/root/repo/plans/r14"


def main() -> None:
    suffix = sys.argv[1]
    queries = sys.argv[2:]
    assert queries, "pass query names"

    import __spark_entry__ as entry_mod
    from hubverse_transform_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(f"plans-r14-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)

    fns = entry_mod.queries()
    for name in queries:
        spark.sparkContext.setJobDescription(f"plans-r14-{suffix}:{name}")
        df = fns[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        lazy = " (EXPLAIN_LAZY: operator DAG behind checkpoint)" if os.environ.get(
            "SPARK_GRAFT_EXPLAIN_LAZY"
        ) else ""
        with open(os.path.join(OUT_DIR, f"{name}_{suffix}.txt"), "w") as f:
            f.write(
                f"# {name} — {suffix} (executed plan, AQE final; "
                f"sf_dir={sf_dir}; tree={os.getcwd()}){lazy}\n"
            )
            f.write(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
