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
WAIVER = "# oracle-mirror:"


def _has_structural_half_up(sql: str) -> bool:
    """True iff some ``floor(...)`` call's OWN argument ends with ``+ 0.5``
    — a balanced-paren walk, not two independent substring checks (round-10
    verdict: 'floor(' anywhere plus '+ 0.5' in an unrelated expression used
    to pass without a true mirror; fooled-safe, not fails-safe)."""
    low = sql.lower()
    for m in re.finditer(r"\bfloor\s*\(", low):
        depth, i = 1, m.end()
        while i < len(low) and depth:
            if low[i] == "(":
                depth += 1
            elif low[i] == ")":
                depth -= 1
            i += 1
        if depth:
            continue  # unbalanced floor( — not a mirror, keep scanning
        arg = low[m.end() : i - 1]
        if re.search(r"\+\s*0\.5\s*$", arg.strip()):
            return True
    return False


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
        if not _has_structural_half_up(sql):
            out.append(f"{name}: Spark side calls half_up but oracle SQL lacks floor(...+ 0.5)")
    return out


# --- guarded-explicit-moments Pearson mirror (round-10 verdict item 3) ---
#
# Engine-native corr() throws under ANSI on zero variance INSIDE the
# aggregate (a projection CASE cannot guard it), so q41/q213/q238/q253
# compute Pearson from explicit moments with BOTH variance terms guarded
# `(vx > 0) & (vy > 0)` before the `/ sqrt(vx*vy)` division. The oracle
# mirrors the exact formula. A one-sided edit — someone "simplifying" the
# Spark side back to F.corr(), or the oracle side back to corr(), or
# dropping one guard — reintroduces the crash/NULL divergence only on
# degenerate data, where the differential won't see it until a sparse seed
# hits. These lints make the mirror structural.

# Spark-side signature of the guarded-moments form
PEARSON_SPARK = re.compile(r"\(\s*\w+\s*>\s*0\s*\)\s*&\s*\(\s*\w+\s*>\s*0\s*\)[\s\S]{0,200}?/\s*F\.sqrt\(")
# oracle-side mirror: CASE WHEN <...> > 0 AND <...> > 0 THEN <...> / sqrt(
PEARSON_ORACLE = re.compile(
    r"case\s+when[\s\S]*?>\s*0[\s\S]*?\band\b[\s\S]*?>\s*0[\s\S]*?then[\s\S]*?/\s*sqrt\(",
    re.IGNORECASE,
)
# the trap itself: engine-native corr( as a function call, either side
NATIVE_CORR_SPARK = re.compile(r"\bF\.corr\s*\(")
NATIVE_CORR_SQL = re.compile(r"\bcorr\s*\(", re.IGNORECASE)


def _pearson_offenders() -> list[str]:
    fns = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    out = []
    for name, fn in fns.items():
        src = inspect.getsource(fn)
        if NATIVE_CORR_SPARK.search(src) and "# ansi-corr-safe:" not in src:
            out.append(
                f"{name}: Spark side calls F.corr() — throws under ANSI on "
                "zero variance inside the aggregate; use guarded explicit "
                "moments or justify with '# ansi-corr-safe:'"
            )
        sql = sqls.get(name, "")
        if NATIVE_CORR_SQL.search(sql) and "# ansi-corr-safe:" not in src:
            out.append(
                f"{name}: oracle SQL calls corr() — the Spark side avoids it "
                "by convention (guarded explicit moments); mirror the formula"
            )
        if PEARSON_SPARK.search(src) and WAIVER not in src:
            if not sql:
                out.append(
                    f"{name}: guarded-Pearson Spark form but NO oracle_sql "
                    "entry and no waiver"
                )
            elif not PEARSON_ORACLE.search(sql):
                out.append(
                    f"{name}: Spark side guards Pearson moments "
                    "((vx>0)&(vy>0) before /sqrt) but oracle SQL lacks the "
                    "mirrored CASE WHEN ...>0 AND ...>0 THEN .../sqrt( form"
                )
    return out


def test_guarded_pearson_sites_have_oracle_mirror():
    offenders = _pearson_offenders()
    assert not offenders, (
        "guarded-Pearson convention desynchronized between Spark and oracle "
        "sides. Offenders:\n  " + "\n  ".join(offenders)
    )


def test_guarded_pearson_lint_covers_the_four_known_sites():
    """The four ANSI-corr sites the convention exists for must actually
    match the Spark-side signature — if a refactor changes their shape the
    lint silently stops covering them; this canary fails instead."""
    fns = entry_mod.queries()
    covered = [
        n for n in fns if PEARSON_SPARK.search(inspect.getsource(fns[n]))
    ]
    for expected in (
        "q41_corr_stats",
        "q213_spearman_length_ttr",
        "q238_acf_daily_orders",
        "q253_degree_assortativity",
    ):
        assert expected in covered, f"{expected} no longer matches PEARSON_SPARK"


def test_pearson_gate_fires_on_one_sided_edit():
    """Seeded perturbations: each one-sided edit the lint exists to catch."""
    guarded_src = (
        "def q(spark, sf):\n"
        "    return df.agg(F.when((vx > 0) & (vy > 0),\n"
        "        (n * sxy - sx * sy) / F.sqrt(vx * vy)))\n"
    )
    assert PEARSON_SPARK.search(guarded_src)
    # oracle reverted to native corr() -> no structural mirror
    bad_sql = "SELECT corr(x, y) AS r FROM t GROUP BY g"
    assert not PEARSON_ORACLE.search(bad_sql)
    assert NATIVE_CORR_SQL.search(bad_sql)
    # oracle dropped one guard -> no AND between the two > 0 conditions
    one_guard = "SELECT round(CASE WHEN n*sxx - sx*sx > 0 THEN (n*sxy-sx*sy) / sqrt((n*sxx-sx*sx)*(n*syy-sy*sy)) END, 6) AS r FROM m"
    assert not PEARSON_ORACLE.search(one_guard)
    # healthy mirrored form passes
    good = (
        "SELECT round(CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0 "
        "THEN (n*sxy-sx*sy) / sqrt((n*sxx-sx*sx)*(n*syy-sy*sy)) END, 6) AS r FROM m"
    )
    assert PEARSON_ORACLE.search(good)
    # Spark side reverted to F.corr -> flagged
    assert NATIVE_CORR_SPARK.search('df.agg(F.corr("x", "y"))')


def test_structural_half_up_fires_on_decoy():
    """The round-10 verdict's exact fooling case: floor() used for an
    unrelated purpose plus '+ 0.5' in a different expression must NOT count
    as a mirror under the structural check."""
    decoy = "SELECT floor(x / 7) AS bucket, y + 0.5 AS shifted FROM t"
    assert not _has_structural_half_up(decoy)
    # nested parens inside the floor argument still resolve correctly
    real = "SELECT floor(CAST(c AS DOUBLE) * 1e4 / (n * 100) + 0.5) / 1e4 AS m FROM t"
    assert _has_structural_half_up(real)
    # and trailing whitespace/newlines before the close paren are tolerated
    multiline = "SELECT floor(x * 1e6\n        + 0.5\n    ) / 1e6 AS v FROM t"
    assert _has_structural_half_up(multiline)


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
    assert not _has_structural_half_up(fake_sql)
    # and the healthy form passes
    assert _has_structural_half_up("SELECT floor(x * 1e6 + 0.5) / 1e6 AS x FROM t")
