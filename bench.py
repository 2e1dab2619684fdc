"""Benchmark harness: run the declared query surface at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query executes to completion through the noop sink (full computation, no
driver-side result materialization cost in the timing).

Timing protocol (round 9): one cold pass over every query establishes the
ranking, then the TOP-N wall-time queries (N=30) get two more executions so
their reported number is a median-of-3 with an explicit min/max spread —
"environmental drift" becomes a measured interval instead of an eyeball
claim. The long tail stays single-run (it contributes little signal and a
second pass of 348 sub-second queries would double the bench's wall time for
noise-level information). BENCH.json carries the spread per re-run query
under "spread"; the headline total sums medians for the top-N and the single
cold run for the tail.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from hubverse_transform_spark.session import get_spark

TOP_N_RERUN = 30


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM warmup: initialize codegen, shuffle machinery, the parquet reader
    # and the noop sink once before timing, on a 5-row table — the measured
    # queries still read their data cold.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).groupBy(
        "r_name"
    ).count().write.mode("overwrite").format("noop").save()

    def run_once(fn) -> float:
        start = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - start

    # pass 1: one timed execution per query. A query that throws is recorded
    # under "errors" and excluded from the total rather than aborting the
    # whole benchmark (a single regression must not zero out the round's
    # numbers — round-1 failure mode).
    first: dict[str, float] = {}
    errors: dict[str, str] = {}
    fns = entry_mod.queries()
    for name, fn in fns.items():
        try:
            first[name] = run_once(fn)
        except Exception as exc:  # noqa: BLE001 - record and keep benching
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]

    # pass 2: the top-N wall-time queries get two more runs — median-of-3
    # is the drift-robust point estimate, min/max is the measured spread.
    top = sorted(first, key=first.get, reverse=True)[:TOP_N_RERUN]
    spread: dict[str, dict[str, float]] = {}
    timings: dict[str, float] = {}
    for name, t1 in first.items():
        if name in top:
            runs = [t1]
            try:
                runs.append(run_once(fns[name]))
                runs.append(run_once(fns[name]))
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            med = statistics.median(runs)
            timings[name] = round(med, 3)
            spread[name] = {
                "median": round(med, 3),
                "min": round(min(runs), 3),
                "max": round(max(runs), 3),
                "runs": len(runs),
            }
        else:
            timings[name] = round(t1, 3)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "timing": f"median-of-3 for top-{TOP_N_RERUN} by wall time, single cold run for the tail",
        "sf": sf,
    }
    if errors:
        result["errors"] = errors
    # Spark/Ivy banners share stdout with the JSON line, so the driver's
    # tail-capture can miss it; also persist a clean machine-readable copy.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.json"), "w") as f:
        json.dump(result, f)
    print(json.dumps(result))
    # The driver keeps only the last ~2000 chars of stdout; the full line
    # above (~7 KB at 215 queries) gets front-truncated there and fails to
    # parse (BENCH_r01-r04 all recorded "parsed": null). Emit a second,
    # compact line LAST — same contract fields, per-query map trimmed to the
    # slowest entries that fit the tail budget — so the tail always ends
    # with one complete parseable JSON line. Full timings stay in BENCH.json.
    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "queries_full": "BENCH.json",
        "queries": {},
    }
    budget = 1700
    for name in sorted(timings, key=timings.get, reverse=True):
        compact["queries"][name] = timings[name]
        if len(json.dumps(compact)) > budget:
            del compact["queries"][name]
            break
    print(json.dumps(compact))
    spark.stop()
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
