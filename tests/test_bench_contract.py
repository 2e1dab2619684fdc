"""Contract tests for bench.py's ambient-load recording (round-11 item 2).

The committed BENCH.json — the working copy of the number of record — must
carry the `load` context (getloadavg pre/post, /proc/stat busy fraction,
n_cpus) so round-over-round comparisons stop riding on unrecorded sandbox
weather. If this fails after a bench.py edit, re-run the bench
(`SPARK_GRAFT_SF_DIR=... python bench.py`) so the committed artifact
matches the current emitter.
"""

from __future__ import annotations

import json
import pathlib

import bench as bench_mod

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_proc_stat_shape_and_monotonicity():
    t0, i0 = bench_mod._proc_stat()
    assert isinstance(t0, int) and isinstance(i0, int)
    assert 0 <= i0 <= t0
    t1, i1 = bench_mod._proc_stat()
    assert t1 >= t0 and i1 >= i0


def test_committed_bench_json_carries_load_context():
    data = json.loads((REPO / "BENCH.json").read_text())
    load = data.get("load")
    assert load is not None, "BENCH.json predates the load field — re-run bench.py"
    assert len(load["loadavg_pre"]) == 3 and len(load["loadavg_post"]) == 3
    assert 0.0 <= load["cpu_busy_frac"] <= 1.0
    assert load["n_cpus"] >= 1
