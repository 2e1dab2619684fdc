"""Cross-side lint for the engine-stable half-up rounding pattern.

``tests/test_round_lint.py`` gates the SPARK side of the round-9 rounding
closure: every ``F.round(F.avg/var(...))``-shaped site is either converted
to the exact ``_half_up``/``half_up`` form or justified ``# half-safe:``.
But the conversion only closes the divergence class if the ORACLE side of
the same query carries the mirrored ``floor(... + 0.5)`` form — a future
edit to one side alone would silently desynchronize them, and the
differential would only catch it on a seed that hits a half boundary
(round-9 verdict residual gap #3).

This gate makes the mirror machine-checked: for every query whose Spark
function source calls ``_half_up(`` or ``half_up(``, its ``oracle_sql()``
text must contain the mirrored ``floor(`` ... ``+ 0.5`` idiom, or the Spark
function must carry an ``# oracle-mirror:`` waiver comment naming why the
oracle legitimately differs (e.g. the half-up happens inside a shared
pre-aggregation CTE mirrored verbatim, or the query has no SQL oracle and
is rows-only checked).

The self-test proves the gate fires on a seeded one-sided edit.
"""

from __future__ import annotations

import inspect
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry_mod  # noqa: E402

# call sites of either half-up helper in the query function body itself
CALL_PAT = re.compile(r"\b_?half_up\(")
# the oracle-side mirror: a floor( ... + 0.5 ) somewhere in the SQL text
MIRROR_FLOOR = "floor("
MIRROR_HALF = "+ 0.5"
WAIVER = "# oracle-mirror:"


def _mirror_offenders() -> list[str]:
    fns = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    out = []
    for name, fn in fns.items():
        src = inspect.getsource(fn)
        if not CALL_PAT.search(src):
            continue
        if WAIVER in src:
            continue
        sql = sqls.get(name)
        if sql is None:
            out.append(f"{name}: uses half_up but has NO oracle_sql entry and no waiver")
            continue
        low = sql.lower()
        if MIRROR_FLOOR not in low or MIRROR_HALF not in low:
            out.append(f"{name}: Spark side calls half_up but oracle SQL lacks floor(...+ 0.5)")
    return out


def test_half_up_sites_have_oracle_mirror():
    offenders = _mirror_offenders()
    assert not offenders, (
        "half_up conversion desynchronized between Spark and oracle sides. "
        "Either mirror the floor(x * 1e<d> + 0.5) / 1e<d> form in oracle_sql() "
        "or add an '# oracle-mirror: <why>' waiver in the Spark function. "
        "Offenders:\n  " + "\n  ".join(offenders)
    )


def test_gate_fires_on_one_sided_edit():
    """Seeded perturbation: a query source that calls half_up whose oracle
    uses plain round() must be flagged (the exact failure mode this lint
    exists to catch)."""
    fake_src = 'def q(spark, sf):\n    return df.select(half_up(F.col("x"), 6).alias("x"))\n'
    fake_sql = "SELECT round(x, 6) AS x FROM t"
    assert CALL_PAT.search(fake_src) is not None
    assert WAIVER not in fake_src
    low = fake_sql.lower()
    assert not (MIRROR_FLOOR in low and MIRROR_HALF in low)
    # and the healthy form passes
    good_sql = "SELECT floor(x * 1e6 + 0.5) / 1e6 AS x FROM t"
    low = good_sql.lower()
    assert MIRROR_FLOOR in low and MIRROR_HALF in low
