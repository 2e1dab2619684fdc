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


def test_committed_bench_json_carries_adjudication():
    """Round-13 contract: the number of record self-adjudicates its movers
    (r12 spent three manual q334 adjudications on what this field now
    answers). If this fails after a bench.py edit, re-run the full bench.

    Until the first full-surface refresh lands, the committed artifact may
    predate the field — the demo artifacts in evidence/ carry the shape in
    the interim, and this skip deletes itself the moment BENCH.json is
    regenerated (the emitter always writes the field now)."""
    data = json.loads((REPO / "BENCH.json").read_text())
    adj = data.get("adjudication")
    if adj is None:
        import pytest

        pytest.skip("BENCH.json predates auto-adjudication — refresh pending")
    assert adj["ratio_gate"] == bench_mod.RATIO_GATE
    assert adj["load_gate"] == bench_mod.LOAD_GATE
    assert isinstance(adj["started_loaded"], bool)
    assert adj["prior_source"].startswith(("git:", "none"))
    if "mass_wobble" in adj:  # r13 s8 emitter onward
        assert adj["mass_mover_gate"] == bench_mod.MASS_MOVER_GATE
        assert adj["n_flagged"] == len(adj["movers"])
        assert adj["mass_wobble"] == (adj["n_flagged"] >= bench_mod.MASS_MOVER_GATE)
        if adj["mass_wobble"]:
            # mass wobbles must not be laundered into quiet_baseline
            assert not any(
                rec["verdict"] == "quiet_baseline"
                for rec in adj["movers"].values()
            )
    for name, rec in adj["movers"].items():
        assert name in data["queries"]
        # The emitter gates strictly on the unrounded median/prior ratio but
        # records round(ratio, 3) — a 1.2504x mover lands in the artifact as
        # exactly 1.25, so the committed value may sit ON the gate.
        assert rec["ratio"] >= bench_mod.RATIO_GATE
        assert rec["verdict"] in {
            "recovered", "persistent", "quiet_baseline", "not_remeasured_cap"
        }
        if rec["verdict"] in {"recovered", "persistent"}:
            assert len(rec["remeasure"]) == 2
            assert rec["remeasure_min"] == min(rec["remeasure"])
            # the verdict is a pure function of the recorded numbers
            recovered = rec["remeasure_min"] <= bench_mod.RATIO_GATE * rec["prior"]
            assert rec["verdict"] == ("recovered" if recovered else "persistent")


def test_flag_movers_pure_logic():
    prior = {"qa": 1.0, "qb": 2.0, "qc": 0.5, "qnew": 0.0}
    timings = {
        "qa": 1.24,   # below gate — not a mover
        "qb": 2.51,   # 1.255x — mover
        "qc": 2.0,    # 4x — mover, worst first
        "qnew": 9.9,  # zero prior — never flagged
        "qz": 5.0,    # no prior — never flagged
    }
    flagged = bench_mod._flag_movers(timings, prior)
    assert [f[0] for f in flagged] == ["qc", "qb"]
    assert flagged[0] == ("qc", 0.5, 2.0)


def test_load_prior_override_and_fallback(tmp_path, monkeypatch):
    p = tmp_path / "prior.json"
    p.write_text(json.dumps({"queries": {"qa": 1.5}}))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_PRIOR", str(p))
    queries, src = bench_mod._load_prior()
    assert queries == {"qa": 1.5} and src == str(p)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_PRIOR", str(tmp_path / "missing.json"))
    queries, src = bench_mod._load_prior()
    assert queries == {} and src.startswith("unreadable:")
    monkeypatch.delenv("SPARK_GRAFT_BENCH_PRIOR")
    queries, src = bench_mod._load_prior()
    assert src == "git:HEAD:BENCH.json" and len(queries) > 300
