"""Benchmark harness: run the declared query surface at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query executes to completion through the noop sink (full computation, no
driver-side result materialization cost in the timing).

Timing protocol (round 10): every query runs THREE times and the headline
"value"/"queries" are MEDIANS — the drift-robust estimate the round-9
spread campaign showed is needed (same-tree noise measured at ±11%, larger
than most round-over-round deltas the headline exists to surface). Each
query's min/max interval is recorded under "spread" so the noise envelope
stays a number. For series continuity with the r1–r9 min-of-2 protocol,
"value_min2" carries the old headline (sum of per-query min of the first
two runs) exactly once per run — compare r10+ to r9-and-earlier through
that field, and medians to medians from r9's partial "spread". The
driver's BENCH_r{N}.json is the single number of record; intermediate
runs quoted in commit messages or VERIFY notes are working measurements.

Ambient-load context (round 11): the "load" field records getloadavg()
before/after the run and the /proc/stat busy fraction over the timed
window, so cross-round comparisons can cite the load each number was
measured under instead of guessing at sandbox weather.

Auto-adjudication (round 13): three manual q334 adjudications in r12 all
concluded "ambient load" — this closes that loop inside the harness. The
committed prior (HEAD's BENCH.json per-query medians) is loaded at start;
any query whose fresh median exceeds its prior by >RATIO_GATE while the
run started under load (loadavg_pre[0] >= LOAD_GATE) is re-measured
min-of-2 AT COMPLETION (when a transient burst has had time to pass) and
both numbers land in BENCH.json under "adjudication" with the loadavg at
re-measure time — "recovered" movers are machine-attributed to weather,
"persistent" ones are the short list a human still reads. Movers on a
quiet machine skip the re-measure and are marked "quiet_baseline" (a
regression measured quiet is likely real — re-measuring would only
launder it) — UNLESS the run flags a mass wobble (>= MASS_MOVER_GATE
simultaneous movers: storms that arrive mid-run after a quiet start
inflate the whole tail at once, which no code change does; see the
constant's comment), in which case the top movers are re-measured
exactly as on a loaded start. Subset runs (SPARK_GRAFT_BENCH_ONLY) write BENCH_partial.json
so the full-surface artifact of record is never clobbered by a targeted
session; SPARK_GRAFT_BENCH_PRIOR overrides the prior source for the
gate's own demonstration runs.
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

N_RUNS = 3

#: auto-adjudication gates (round-13 verdict item 3). RATIO_GATE is the
#: judge's prescribed >1.25x mover threshold; LOAD_GATE is deliberately
#: low (1-min loadavg >= 1.0 on a 32-cpu box = any sustained ambient
#: activity) because the re-measure is cheap and the quiet-machine branch
#: exists precisely so a genuinely quiet regression is NOT re-measured
#: away. MAX_REMEASURE bounds the added wall time; overflow is recorded,
#: never silent.
RATIO_GATE = 1.25
LOAD_GATE = 1.0
MAX_REMEASURE = 15

#: mass-wobble re-measure (r13 session 8, a measurement-methodology fix —
#: documented in OPTIMIZATION_r13.md): the load gate reads the loadavg at
#: START, but this sandbox's storms arrive on ~10-minute cadence MID-run,
#: and the recorded stamps cannot discriminate (the bench's own 32-core
#: stages dominate loadavg_post on quiet-weather runs too — the quiet
#: 240.6 s cell and the stormy 304-338 s cells carry byte-identical load
#: fields). What does discriminate is the mover COUNT: a code change
#: touches a handful of queries, so >= MASS_MOVER_GATE simultaneous
#: >RATIO_GATE movers on one run is ambient weather by construction
#: (today's storm cells flagged 189-207; genuine quiet baselines flag
#: single digits). Such runs now get the same top-15 min-of-2 re-measure
#: as loaded starts instead of a blanket quiet_baseline; each re-measure
#: records the loadavg it ran under so a still-stormy "persistent" is
#: readable as such.
MASS_MOVER_GATE = 25


def _load_prior() -> tuple[dict[str, float], str]:
    """Committed per-query medians: HEAD's BENCH.json (the number of
    record), overridable via SPARK_GRAFT_BENCH_PRIOR for demonstration
    runs. Returns ({} , source) when no prior exists (first run)."""
    import subprocess

    override = os.environ.get("SPARK_GRAFT_BENCH_PRIOR")
    if override:
        try:
            with open(override) as f:
                return json.load(f).get("queries", {}), override
        except (OSError, ValueError):
            return {}, f"unreadable:{override}"
    try:
        out = subprocess.run(
            ["git", "show", "HEAD:BENCH.json"],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out).get("queries", {}), "git:HEAD:BENCH.json"
    except Exception:  # noqa: BLE001 - no git / no committed artifact yet
        return {}, "none"


def _flag_movers(
    timings: dict[str, float], prior: dict[str, float]
) -> list[tuple[str, float, float]]:
    """(name, prior, median) for every query whose fresh median exceeds
    its committed prior by >RATIO_GATE, worst ratio first. Queries with no
    prior (or a zero/negative one) are never flagged — a first run has
    nothing to adjudicate against."""
    return sorted(
        (
            (name, prior[name], med)
            for name, med in timings.items()
            if prior.get(name, 0.0) > 0.0 and med > RATIO_GATE * prior[name]
        ),
        key=lambda t: t[2] / t[1],
        reverse=True,
    )


def _proc_stat() -> tuple[int, int]:
    """(total jiffies, idle+iowait jiffies) from the aggregate cpu line."""
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    return sum(vals), vals[3] + (vals[4] if len(vals) > 4 else 0)


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

    # ambient-load context (round-10 verdict item 2): same-tree totals vary
    # ±11%+ with sandbox load, so the number of record carries the load it
    # was measured under — getloadavg at start/end plus the /proc/stat
    # busy fraction over the whole timed window. cpu_busy_frac ~1.0 means
    # the 32 cores were saturated (this bench alone saturates them on the
    # heavy queries; a LOADED machine shows elevated load_pre/load_post
    # 1-minute values relative to n_cpus and a busy fraction that stays
    # high even through the cheap single-stage queries).
    load_pre = os.getloadavg()
    stat_t0, stat_i0 = _proc_stat()

    # three timed executions per query. A query that throws is recorded
    # under "errors" and excluded from the total rather than aborting the
    # whole benchmark (a single regression must not zero out the round's
    # numbers — round-1 failure mode).
    all_runs: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    fns = entry_mod.queries()
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {q.strip() for q in only.split(",") if q.strip()}
        fns = {n: f for n, f in fns.items() if n in keep}
    for name, fn in fns.items():
        try:
            all_runs[name] = [run_once(fn) for _ in range(N_RUNS)]
        except Exception as exc:  # noqa: BLE001 - record and keep benching
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            all_runs.pop(name, None)

    timings: dict[str, float] = {}
    spread: dict[str, dict[str, float]] = {}
    min2_total = 0.0
    for name, runs in all_runs.items():
        timings[name] = round(statistics.median(runs), 3)
        spread[name] = {
            "median": timings[name],
            "min": round(min(runs), 3),
            "max": round(max(runs), 3),
            "runs": len(runs),
        }
        min2_total += min(runs[:2])

    # --- auto-adjudication (r13): re-measure loaded-run movers min-of-2
    # at completion, before the post-run load snapshot so `load` still
    # brackets everything timed.
    prior, prior_src = _load_prior()
    movers: dict[str, dict] = {}
    flagged = _flag_movers(timings, prior)
    started_loaded = load_pre[0] >= LOAD_GATE
    mass_wobble = len(flagged) >= MASS_MOVER_GATE
    for i, (name, p, med) in enumerate(flagged):
        rec = {"prior": p, "median": med, "ratio": round(med / p, 3)}
        if not (started_loaded or mass_wobble):
            rec["verdict"] = "quiet_baseline"  # measured quiet: likely real
        elif i >= MAX_REMEASURE:
            rec["verdict"] = "not_remeasured_cap"  # recorded, never silent
        else:
            rec["remeasure_load1"] = round(os.getloadavg()[0], 2)
            runs2 = [run_once(fns[name]) for _ in range(2)]
            rec["remeasure"] = [round(r, 3) for r in runs2]
            rec["remeasure_min"] = round(min(runs2), 3)
            rec["verdict"] = (
                "recovered"
                if min(runs2) <= RATIO_GATE * p
                else "persistent"
            )
        movers[name] = rec
    adjudication = {
        "prior_source": prior_src,
        "ratio_gate": RATIO_GATE,
        "load_gate": LOAD_GATE,
        "started_loaded": started_loaded,
        "mass_mover_gate": MASS_MOVER_GATE,
        "mass_wobble": mass_wobble,
        "n_flagged": len(flagged),
        "movers": movers,
    }

    stat_t1, stat_i1 = _proc_stat()
    load = {
        "loadavg_pre": [round(x, 2) for x in load_pre],
        "loadavg_post": [round(x, 2) for x in os.getloadavg()],
        "cpu_busy_frac": round(
            1.0 - (stat_i1 - stat_i0) / max(1, stat_t1 - stat_t0), 4
        ),
        "n_cpus": os.cpu_count(),
    }

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "total_query_wall_sec",
        "value": total,
        "value_median": total,
        "value_min2": round(min2_total, 3),
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "timing": (
            f"median-of-{N_RUNS} headline for every query (r10 protocol); "
            "'value_min2' = r1-r9 min-of-2 protocol over the same runs for "
            "series continuity; per-query min/max under 'spread'"
        ),
        "sf": sf,
        "load": load,
        "adjudication": adjudication,
    }
    if errors:
        result["errors"] = errors
    # Spark/Ivy banners share stdout with the JSON line, so the driver's
    # tail-capture can miss it; also persist a clean machine-readable copy.
    # Subset runs write BENCH_partial.json — the full-surface artifact of
    # record must never be clobbered by a targeted session.
    out_name = "BENCH_partial.json" if only else "BENCH.json"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), out_name), "w") as f:
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
        "value_median": result["value_median"],
        "value_min2": result["value_min2"],
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "load": load,
        "adjudication_summary": {
            "n_movers": len(movers),
            "n_remeasured": sum(1 for m in movers.values() if "remeasure" in m),
            "n_persistent": sum(
                1 for m in movers.values() if m["verdict"] == "persistent"
            ),
        },
        "queries_full": out_name,
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
