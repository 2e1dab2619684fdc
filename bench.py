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

#: quiet-start guard (round-14, r13 verdict item 3): the r13 driver run
#: STARTED at loadavg 8.29 on 32 cpus and its whole per-query map came out
#: storm-inflated (geomean 0.891 over a losers' bracket the judge spent a
#: page un-confounding). Starting the timed window under ambient load is
#: the one weather failure a harness CAN refuse: if the 1-min loadavg is
#: >= QUIET_START_GATE when the bench begins, wait (poll every 20 s, up to
#: QUIET_START_MAX_WAIT — one full ~10-min storm cycle) for it to drop
#: before timing. The wait is recorded in the `load` field
#: (`quiet_wait_sec`, `loadavg_first`) — never silent — and a machine that
#: stays loaded past the budget is timed anyway (recorded, not refused:
#: the driver needs a number either way). Env-overridable so tests and
#: constrained hosts can disable it; NOT a result filter — it only moves
#: the start of the window, it never drops or re-labels a measurement.
QUIET_START_GATE = 4.0
QUIET_START_MAX_WAIT = 720.0


def _load_prior() -> tuple[dict, str]:
    """Committed artifact of record: HEAD's BENCH.json (full document, so
    callers can read both per-query medians and the emitted compact-line
    key set), overridable via SPARK_GRAFT_BENCH_PRIOR for demonstration
    runs. Returns ({}, source) when no prior exists (first run)."""
    import subprocess

    override = os.environ.get("SPARK_GRAFT_BENCH_PRIOR")
    if override:
        try:
            with open(override) as f:
                return json.load(f), override
        except (OSError, ValueError):
            return {}, f"unreadable:{override}"
    try:
        out = subprocess.run(
            ["git", "show", "HEAD:BENCH.json"],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out), "git:HEAD:BENCH.json"
    except Exception:  # noqa: BLE001 - no git / no committed artifact yet
        return {}, "none"


def _compact_fill_order(
    timings: dict[str, float], prior_doc: dict
) -> list[str]:
    """Key-stable fill order for the compact stdout line's `queries` map
    (round-14, r13 verdict item 2: the old slowest-first-only fill churned
    9 queries out of / 7 into the driver's round-over-round comparison on
    an unchanged 378-query surface, turning its per-query diff into a
    losers' bracket).

    Order: every key the COMMITTED prior emitted in ITS compact line
    (still present in this run), in the prior's order, THEN the current
    run's remaining queries slowest-first. The budget-limited greedy fill
    downstream therefore keeps the prior's key set intact before admitting
    new entries — the driver's common set stops churning while genuinely
    new slow queries still surface. Priors that predate the
    `compact_keys` field fall back to the prior's slowest-first order,
    which reproduces what its compact line emitted."""
    prior_keys = prior_doc.get("compact_keys")
    if not prior_keys:
        # prior predates the field: its compact line emitted its slowest
        # ~40 entries, so that prefix reproduces the set the driver saw
        pq = prior_doc.get("queries", {})
        prior_keys = sorted(pq, key=pq.get, reverse=True)[:40]
    stable = [k for k in prior_keys if k in timings]
    rest = sorted(
        (k for k in timings if k not in set(stable)),
        key=timings.get,
        reverse=True,
    )
    return stable + rest


def _wait_quiet_start(
    gate: float, max_wait: float, poll: float = 20.0
) -> tuple[float, float]:
    """Block until the 1-min loadavg drops below ``gate`` or ``max_wait``
    seconds elapse. Returns (seconds waited, loadavg first observed) so
    the caller can record the wait — the guard must never be silent."""
    first = os.getloadavg()[0]
    if first < gate or max_wait <= 0:
        return 0.0, first
    t0 = time.monotonic()
    while time.monotonic() - t0 < max_wait:
        time.sleep(min(poll, max(0.1, max_wait - (time.monotonic() - t0))))
        if os.getloadavg()[0] < gate:
            break
    return round(time.monotonic() - t0, 1), first


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

    # quiet-start guard (r13 verdict item 3) — runs BEFORE the session and
    # warmup so the whole timed window starts on a quiet machine. Recorded
    # below in `load`; never silent, never drops a measurement.
    quiet_gate = float(os.environ.get("SPARK_GRAFT_QUIET_GATE", QUIET_START_GATE))
    quiet_max_wait = float(
        os.environ.get("SPARK_GRAFT_QUIET_MAX_WAIT", QUIET_START_MAX_WAIT)
    )
    quiet_wait_sec, loadavg_first = _wait_quiet_start(quiet_gate, quiet_max_wait)

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
    prior_doc, prior_src = _load_prior()
    prior = prior_doc.get("queries", {}) if isinstance(prior_doc, dict) else {}
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
        # quiet-start guard record (r14): loadavg when the process began,
        # the gate it was held to, and how long it waited (0.0 = no wait)
        "quiet_gate": quiet_gate,
        "quiet_wait_sec": quiet_wait_sec,
        "loadavg_first": round(loadavg_first, 2),
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
    # The driver keeps only the last ~2000 chars of stdout; the full line
    # (~7 KB at 215 queries) gets front-truncated there and fails to
    # parse (BENCH_r01-r04 all recorded "parsed": null). So a second,
    # compact line is emitted LAST — same contract fields, per-query map
    # trimmed to fit the tail budget. r14 (verdict item 2): the fill order
    # is KEY-STABLE — the committed prior's emitted keys first, then
    # current slowest — so the driver's round-over-round per-query diff
    # compares a fixed set instead of churning with the weather; the
    # emitted key set is recorded in the full artifact as `compact_keys`
    # (the next run's stable prefix). Full timings stay in BENCH.json.
    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "value_median": result["value_median"],
        "value_min2": result["value_min2"],
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_errors": len(errors),
        # slim copy: quiet_gate is a constant, not a measurement — keep the
        # compact line's char budget for per-query keys (full copy in BENCH.json)
        "load": {k: v for k, v in load.items() if k != "quiet_gate"},
        "adjudication_summary": {
            "n_movers": len(movers),
            "n_remeasured": sum(1 for m in movers.values() if "remeasure" in m),
            "n_persistent": sum(
                1 for m in movers.values() if m["verdict"] == "persistent"
            ),
        },
        "queries_full": "BENCH_partial.json" if only else "BENCH.json",
        "queries": {},
    }
    budget = 1700
    for name in _compact_fill_order(timings, prior_doc if isinstance(prior_doc, dict) else {}):
        compact["queries"][name] = timings[name]
        if len(json.dumps(compact)) > budget:
            del compact["queries"][name]
            break
    result["compact_keys"] = list(compact["queries"])
    # Spark/Ivy banners share stdout with the JSON line, so the driver's
    # tail-capture can miss it; also persist a clean machine-readable copy.
    # Subset runs write BENCH_partial.json — the full-surface artifact of
    # record must never be clobbered by a targeted session.
    out_name = compact["queries_full"]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), out_name), "w") as f:
        json.dump(result, f)
    print(json.dumps(result))
    print(json.dumps(compact))
    spark.stop()
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
