"""SHUFFLES.md regression gate: the committed per-query exchange budget IS
the allowlist. Every declared query's static plan is re-counted (same code
path as the dump: tools/dump_shuffles.shuffle_row, AQE off, sf0.001) and
compared against the committed table — an exchange appearing or vanishing
fails here until `python tools/dump_shuffles.py` regenerates the table in
the same commit, which is exactly the review the file header promises
("a diff here is a plan regression unless the change is deliberate")."""

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


def test_every_declared_query_has_a_committed_row():
    missing = [q for q in _QUERIES if q not in _TABLE]
    assert not missing, (
        f"queries without a SHUFFLES.md row: {missing} — run "
        "`python tools/dump_shuffles.py`"
    )


@pytest.mark.parametrize("name", _QUERIES)
def test_exchange_budget_unchanged(spark, name):
    if name not in _TABLE:
        pytest.skip("covered by test_every_declared_query_has_a_committed_row")
    was_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        n_ex, n_bc, _note = shuffle_row(spark, entry.queries()[name])
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", was_aqe)
    assert (n_ex, n_bc) == _TABLE[name], (
        f"{name}: static plan now has {n_ex} shuffles / {n_bc} broadcasts, "
        f"SHUFFLES.md says {_TABLE[name]} — if the plan change is "
        "deliberate, regenerate the table (`python tools/dump_shuffles.py`) "
        "in the same commit; otherwise this is a plan regression"
    )
