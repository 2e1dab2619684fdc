"""SHUFFLES.md regression gate: the committed per-query exchange budget IS
the allowlist. Every declared query's static plan is re-counted (same code
path as the dump: tools/dump_shuffles.shuffle_row, AQE off, sf0.001) and
compared against the committed table — an exchange appearing or vanishing
fails here until `python tools/dump_shuffles.py` regenerates the table in
the same commit, which is exactly the review the file header promises
("a diff here is a plan regression unless the change is deliberate").

Round-9 restructure: the ~378 static-plan compiles run ONCE in a
session-scoped fixture (one AQE toggle, one queries() materialization, one
sequential compile pass) and the per-query cases assert from the resulting
dict — same per-query failure granularity, a fraction of the wall time the
378 independently-fixtured cases paid. A compile error in any single query
surfaces in that query's own case (stored as an ERROR sentinel), not as a
fixture-wide crash.
"""

from __future__ import annotations

import pathlib
import re
import sys

import pytest

import __spark_entry__ as entry

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from dump_shuffles import _EAGER, shuffle_row  # noqa: E402

_QUERIES = [q for q in entry.queries() if q not in _EAGER]


def _committed_table() -> dict[str, tuple[str, str]]:
    rows = {}
    for line in (REPO / "SHUFFLES.md").read_text().splitlines():
        m = re.match(r"\| (q\w+) \| (\S+) \| (\S+) \|", line)
        if m:
            rows[m.group(1)] = (m.group(2), m.group(3))
    return rows


_TABLE = _committed_table()


@pytest.fixture(scope="session")
def computed_budgets(spark):
    """One pass: compile every declared query's static plan (AQE off) and
    count its exchanges. Returns {name: (n_ex, n_bc) | ("ERROR", msg)}.

    Compiles run on a thread pool: Catalyst analyzes independent plans
    concurrently and py4j serves each Python thread over its own gateway
    connection, so the pass scales with driver cores instead of paying 378
    sequential round-trips. The AQE toggle is session-global — set once
    around the whole pool, which every worker wants identically."""
    from concurrent.futures import ThreadPoolExecutor

    fns = entry.queries()
    was_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    out: dict[str, tuple[str, str]] = {}

    def one(name: str) -> tuple[str, tuple[str, str]]:
        try:
            n_ex, n_bc, _note = shuffle_row(spark, fns[name])
            return name, (n_ex, n_bc)
        except Exception as exc:  # surface per-query, not fixture-wide
            return name, ("ERROR", f"{type(exc).__name__}: {exc}"[:200])

    try:
        with ThreadPoolExecutor(max_workers=8) as pool:
            for name, row in pool.map(one, _QUERIES):
                out[name] = row
        # Some operators persist() intermediates during composition and
        # release them via compute_release; while such a window is open,
        # a CONCURRENTLY-compiling query whose plan contains the same
        # subtree picks up InMemoryTableScan fragments and its static
        # exchange count inflates nondeterministically. Any pooled result
        # that disagrees with the committed table is therefore recompiled
        # sequentially (no other compile in flight): a window artifact
        # heals, a genuine plan regression reproduces and still fails.
        for name, row in list(out.items()):
            if row != _TABLE.get(name):
                out[name] = one(name)[1]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", was_aqe)
    return out


def test_every_declared_query_has_a_committed_row():
    missing = [q for q in _QUERIES if q not in _TABLE]
    assert not missing, (
        f"queries without a SHUFFLES.md row: {missing} — run "
        "`python tools/dump_shuffles.py`"
    )


@pytest.mark.parametrize("name", _QUERIES)
def test_exchange_budget_unchanged(computed_budgets, name):
    if name not in _TABLE:
        pytest.skip("covered by test_every_declared_query_has_a_committed_row")
    got = computed_budgets[name]
    assert got[0] != "ERROR", f"{name}: plan compile failed: {got[1]}"
    assert got == _TABLE[name], (
        f"{name}: static plan now has {got[0]} shuffles / {got[1]} broadcasts, "
        f"SHUFFLES.md says {_TABLE[name]} — if the plan change is "
        "deliberate, regenerate the table (`python tools/dump_shuffles.py`) "
        "in the same commit; otherwise this is a plan regression"
    )
