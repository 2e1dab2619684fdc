"""Benchmark harness: run the declared query surface at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query executes to completion through the noop sink (full computation, no
driver-side result materialization cost in the timing).

Timing protocol (round 9): every query runs twice (min-of-2, exactly the
r1–r8 protocol, so the headline total stays comparable across the whole
BENCH_r* series and against BASELINE.md); the TOP-N wall-time queries
(N=30) get a third execution so their BENCH.json entry under "spread"
reports a median-of-3 with an explicit min/max interval — "environmental
drift" becomes a measured number instead of an eyeball claim. The headline
"queries"/"value" stay min-based: switching the headline to medians would
have discontinuously inflated the series by ~30% for a metric change, not
a performance change (measured: a round-8-tip worktree benches identically
to HEAD on the same machine). Round-over-round drift adjudication quotes
median-over-median from "spread".
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

    # pass 1: two timed executions per query (the r1–r8 protocol). A query
    # that throws is recorded under "errors" and excluded from the total
    # rather than aborting the whole benchmark (a single regression must
    # not zero out the round's numbers — round-1 failure mode).
    all_runs: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    fns = entry_mod.queries()
    for name, fn in fns.items():
        try:
            all_runs[name] = [run_once(fn), run_once(fn)]
        except Exception as exc:  # noqa: BLE001 - record and keep benching
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]

    # pass 2: the top-N wall-time queries get a third run — median-of-3 is
    # the drift-robust estimate quoted for round-over-round comparisons,
    # min/max the measured spread. The headline stays min-based for series
    # continuity.
    top = sorted(all_runs, key=lambda n: min(all_runs[n]), reverse=True)[:TOP_N_RERUN]
    spread: dict[str, dict[str, float]] = {}
    timings: dict[str, float] = {}
    for name, runs in all_runs.items():
        if name in top:
            try:
                runs.append(run_once(fns[name]))
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            spread[name] = {
                "median": round(statistics.median(runs), 3),
                "min": round(min(runs), 3),
                "max": round(max(runs), 3),
                "runs": len(runs),
            }
        timings[name] = round(min(runs), 3)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "timing": (
            f"min-of-2 headline (r1-r8 protocol); top-{TOP_N_RERUN} by wall "
            "time run 3x with median+min/max under 'spread'"
        ),
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
