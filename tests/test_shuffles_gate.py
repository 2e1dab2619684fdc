"""SHUFFLES.md regression gate: the committed per-query exchange budget IS
the allowlist. Every declared query's static plan is re-counted (same
string-level counter as the dump: tools/dump_shuffles.count_exchanges, AQE
off, sf0.001) and compared against the committed table — an exchange
appearing or vanishing fails here until `python tools/dump_shuffles.py`
regenerates the table in the same commit, which is exactly the review the
file header promises ("a diff here is a plan regression unless the change
is deliberate").

Round-9 restructure: the plans come from the shared one-compile-pass
fixture (tests/conftest.compiled_surface — threaded, persist-window
artifacts healed there); the per-query cases assert from the dict, so the
gate costs string regexes, not a second full Catalyst pass.
"""

from __future__ import annotations

import pathlib
import re
import sys

import pytest

import __spark_entry__ as entry
from tests.conftest import PLAN_EAGER

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from dump_shuffles import count_exchanges  # noqa: E402

_QUERIES = [q for q in entry.queries() if q not in PLAN_EAGER]


def _committed_table() -> dict[str, tuple[str, str]]:
    rows = {}
    for line in (REPO / "SHUFFLES.md").read_text().splitlines():
        m = re.match(r"\| (q\w+) \| (\S+) \| (\S+) \|", line)
        if m:
            rows[m.group(1)] = (m.group(2), m.group(3))
    return rows


_TABLE = _committed_table()


def test_every_declared_query_has_a_committed_row():
    missing = [q for q in _QUERIES if q not in _TABLE]
    assert not missing, (
        f"queries without a SHUFFLES.md row: {missing} — run "
        "`python tools/dump_shuffles.py`"
    )


@pytest.mark.parametrize("name", _QUERIES)
def test_exchange_budget_unchanged(compiled_surface, name):
    if name not in _TABLE:
        pytest.skip("covered by test_every_declared_query_has_a_committed_row")
    art = compiled_surface[name]
    assert "error" not in art, f"{name}: plan compile failed: {art.get('error')}"
    n_ex, n_bc, _note = count_exchanges(art["plan"])
    assert (n_ex, n_bc) == _TABLE[name], (
        f"{name}: static plan now has {n_ex} shuffles / {n_bc} broadcasts, "
        f"SHUFFLES.md says {_TABLE[name]} — if the plan change is "
        "deliberate, regenerate the table (`python tools/dump_shuffles.py`) "
        "in the same commit; otherwise this is a plan regression"
    )
