"""Round-13 optimization profiler: where does each bench query's wall time go?

For every declared query (or $SPARK_GRAFT_BENCH_ONLY subset) this measures,
with the same session/config/noop-sink methodology as bench.py:

  - build_s : Python DataFrame-composition time (queries()[name](...))
  - plan_s  : Catalyst analysis+optimization+physical planning time, forced
              via queryExecution().executedPlan() BEFORE any job runs
  - exec_s  : noop-sink execution wall time (includes AQE re-planning)
  - jobs / stages / tasks : scheduler work per execution, from the status
              tracker deltas — per-stage overhead is a first-order cost for
              sub-second queries at bench scale

plus a second exec-only run (exec2_s) so warm-vs-cold execution spread is
visible. Output: one JSON line per query to stdout plus a summary, and the
full list to tools/profile_out.json (or $SPARK_GRAFT_PROFILE_OUT).

Diagnostic only — never part of the bench contract or the timed surface.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from hubverse_transform_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warmup identical to bench.py
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).groupBy(
        "r_name"
    ).count().write.mode("overwrite").format("noop").save()

    fns = entry_mod.queries()
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {q.strip() for q in only.split(",") if q.strip()}
        fns = {n: f for n, f in fns.items() if n in keep}

    rows = []
    for name, fn in fns.items():
        sc.setJobDescription(f"profile:{name}")
        try:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            # force analysis + optimization + physical planning, no jobs
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            jobs0 = tracker.getJobIdsForGroup(None)
            df.write.mode("overwrite").format("noop").save()
            t3 = time.perf_counter()
            df2 = fn(spark, sf_dir)
            t4 = time.perf_counter()
            df2.write.mode("overwrite").format("noop").save()
            t5 = time.perf_counter()
            jobs1 = tracker.getJobIdsForGroup(None)
            n_jobs = (len(jobs1) - len(jobs0)) // 2  # two executions ran
            rec = {
                "q": name,
                "build_s": round(t1 - t0, 3),
                "plan_s": round(t2 - t1, 3),
                "exec_s": round(t3 - t2, 3),
                "exec2_s": round(t5 - t4, 3),
                "build2_s": round(t4 - t3, 3),
                "jobs_per_exec": n_jobs,
            }
        except Exception as exc:  # noqa: BLE001
            rec = {"q": name, "error": f"{type(exc).__name__}: {exc}"[:200]}
        rows.append(rec)
        print(json.dumps(rec), flush=True)
        sc.setJobDescription(None)

    ok = [r for r in rows if "error" not in r]
    tot = lambda k: round(sum(r[k] for r in ok), 1)  # noqa: E731
    summary = {
        "n": len(ok),
        "build_s": tot("build_s"),
        "plan_s": tot("plan_s"),
        "exec_s": tot("exec_s"),
        "exec2_s": tot("exec2_s"),
        "build2_s": tot("build2_s"),
        "jobs": sum(r["jobs_per_exec"] for r in ok),
    }
    print("SUMMARY " + json.dumps(summary), flush=True)
    out = os.environ.get(
        "SPARK_GRAFT_PROFILE_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "profile_out.json"),
    )
    with open(out, "w") as f:
        json.dump({"rows": rows, "summary": summary}, f)
    spark.stop()


if __name__ == "__main__":
    main()
