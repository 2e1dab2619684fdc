"""Per-stage diagnostic for one or more bench queries (guide §7.1/§7.2).

Runs each named query through the noop sink twice (cold + warm) with the
Spark UI enabled, then reads the REST status API to print, per execution,
every completed stage with task count, wall duration, executor run/CPU
time, and shuffle read/write bytes — the 'which stage is slow, and is it
compute, shuffle or scheduling' readout the optimization guide starts
from. Jobs are mapped to queries via setJobGroup.

Usage:  SPARK_GRAFT_UI=true python tools/stage_profile.py q334_clustering_coefficient [q72_... ...]

Diagnostic only — never part of the bench contract or the timed surface.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_UI", "true")

import __spark_entry__ as entry_mod
from hubverse_transform_spark.session import get_spark


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    assert names, "pass at least one query name"
    spark = get_spark("stage-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    assert ui, "Spark UI is disabled — run with SPARK_GRAFT_UI=true"
    app_id = sc.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    # warmup identical to bench.py
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).groupBy(
        "r_name"
    ).count().write.mode("overwrite").format("noop").save()

    fns = entry_mod.queries()
    for name in names:
        fn = fns[name]
        for run in ("cold", "warm"):
            group = f"{name}:{run}"
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            wall = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            time.sleep(0.3)  # let the listener flush
            jobs = [j for j in _get(f"{base}/jobs") if j.get("jobGroup") == group]
            stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
            print(f"\n=== {name} [{run}] wall={wall:.2f}s jobs={len(jobs)} stages={len(stage_ids)}")
            rows = []
            for sid in stage_ids:
                try:
                    for att in _get(f"{base}/stages/{sid}"):
                        if att["status"] not in ("COMPLETE", "FAILED"):
                            continue
                        dur = None
                        if att.get("firstTaskLaunchedTime") and att.get("completionTime"):
                            # ISO 'GMT' suffix timestamps; crude ms diff via epoch parse
                            pass
                        rows.append(
                            (
                                sid,
                                att["numCompleteTasks"],
                                att.get("executorRunTime", 0) / 1e3,
                                att.get("executorCpuTime", 0) / 1e9,
                                att.get("shuffleReadBytes", 0) / 1e6,
                                att.get("shuffleWriteBytes", 0) / 1e6,
                                att["name"].split("\n")[0][:70],
                            )
                        )
                except Exception as exc:  # skipped stages 404
                    if "404" not in str(exc):
                        raise
            rows.sort(key=lambda r: -r[2])
            print(f"{'stage':>5} {'tasks':>5} {'run_s':>8} {'cpu_s':>8} {'shR_MB':>8} {'shW_MB':>8}  name")
            for r in rows[:14]:
                print(f"{r[0]:>5} {r[1]:>5} {r[2]:>8.2f} {r[3]:>8.2f} {r[4]:>8.1f} {r[5]:>8.1f}  {r[6]}")
    spark.stop()


if __name__ == "__main__":
    main()
