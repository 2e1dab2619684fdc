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


# --- bespoke exact-integer algebra canaries (round-11 verdict item 5) ---
#
# Three sparse-guarded queries carry exact-integer conversions whose algebra
# is bespoke (not the generic half_up form the lints above cover), so the
# GUARD_FLOORS count floor in test_sparse_guard_gate.py is their only
# structural protection — and a count floor is a tripwire, not a proof: an
# unrelated F.when added in the same function masks a dropped guard. These
# signature canaries pin the exact algebraic shape on BOTH sides, the same
# treatment the guarded-Pearson four get above:
#
#   q232 CUSUM     : D·cusum_k = D·P_k − k·T  (dd * running-sum − row_number * total)
#   q246 conformal : |cents·n − C|            (score AND coverage sides, 2 sites)
#   q287 MASE      : constant series -> NULL  (sum of integer naive errors > 0 guard)

EXACT_INTEGER_CANARIES = {
    "q232_cusum_changepoint": (
        re.compile(
            r"\*\s*F\.sum\([^)]*\)\.over\(\w+\)[\s\S]{0,30}?-\s*F\.row_number\(\)\.over\(\w+\)\s*\*"
        ),
        re.compile(
            r"\*\s*sum\([^)]*\)\s+over\s+\w+[\s\S]{0,40}?-\s*row_number\(\)\s+over\s+\w+\s*\*",
            re.IGNORECASE,
        ),
        1,
    ),
    "q246_conformal_intervals": (
        re.compile(
            r"F\.abs\(\s*_cents\([^)]*\)\s*\*\s*F\.col\([^)]*\)[\s\S]{0,20}?-\s*F\.col\([^)]*\)\s*\)"
        ),
        re.compile(
            r"abs\(\s*cast\(round\([^)]*\*\s*100\)\s*as\s+bigint\)\s*\*\s*[\w.]+\s*-\s*[\w.]+\)",
            re.IGNORECASE,
        ),
        2,  # the exact score algebra appears on the calibration AND coverage sides
    ),
    "q287_forecast_accuracy": (
        re.compile(
            r"F\.when\(\s*F\.sum\(_intval\([\s\S]{0,100}?>\s*0,[\s\S]{0,60}?_half_up\("
        ),
        re.compile(
            r"case\s+when\s+sum\(cast\(round\(abs\([\s\S]{0,80}?>\s*0\s*then\s*floor\(",
            re.IGNORECASE,
        ),
        1,
    ),
}


def test_exact_integer_canaries_pin_both_sides():
    """Each bespoke-algebra site must match its structural signature on the
    Spark side AND the oracle side, with the required multiplicity."""
    fns = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    errs = []
    for name, (spark_pat, oracle_pat, min_hits) in EXACT_INTEGER_CANARIES.items():
        src = inspect.getsource(fns[name])
        sql = sqls[name]
        s_hits = len(spark_pat.findall(src))
        o_hits = len(oracle_pat.findall(sql))
        if s_hits < min_hits:
            errs.append(
                f"{name}: Spark source matches the exact-integer signature "
                f"{s_hits}x, need >= {min_hits} — the bespoke algebra was edited?"
            )
        if o_hits < min_hits:
            errs.append(
                f"{name}: oracle SQL matches the mirror signature {o_hits}x, "
                f"need >= {min_hits} — one-sided edit?"
            )
    assert not errs, (
        "bespoke exact-integer algebra desynchronized (see COVERAGE.md "
        "'Degenerate-input semantics'). Offenders:\n  " + "\n  ".join(errs)
    )


def test_exact_integer_canaries_fire_on_one_sided_edits():
    """Seeded perturbations: each canary must fail on the exact refactor it
    exists to catch, and pass on the healthy form."""
    q232_s, q232_o, _ = EXACT_INTEGER_CANARIES["q232_cusum_changepoint"]
    # healthy: D·P_k − k·T
    good = '_dd") * F.sum("_md").over(wc)\n            - F.row_number().over(wk) * F.col("_tt")'
    assert q232_s.search(good)
    # reverted to a float running mean deviation — no exact form
    assert not q232_s.search('F.sum("_md").over(wc) / F.row_number().over(wk) - F.col("_mean")')
    assert q232_o.search("s.dd * sum(d.md) OVER w\n - row_number() OVER w * s.tt")
    assert not q232_o.search("sum(d.md - s.mean) OVER w AS cusum")

    q246_s, q246_o, _ = EXACT_INTEGER_CANARIES["q246_conformal_intervals"]
    assert q246_s.search('F.abs(_cents("value") * F.col("n_cal") - F.col("_c"))')
    # reverted to the float rounded-score form seed 787 bit
    assert not q246_s.search('F.abs(F.round(F.col("value") - F.col("_mean"), 4))')
    assert q246_o.search("abs(CAST(round(cl.value * 100) AS BIGINT) * m.n_cal - m.c)")
    assert q246_o.search("abs(CAST(round(t.value * 100)\n AS BIGINT) * q.n_cal - m.c)")
    assert not q246_o.search("abs(round(cl.value - m.mean, 4))")

    q287_s, q287_o, _ = EXACT_INTEGER_CANARIES["q287_forecast_accuracy"]
    assert q287_s.search(
        'F.when(\n  F.sum(_intval(F.abs(F.col("_a") - F.col("_p")))) > 0,\n  _half_up('
    )
    # guard dropped: bare ratio crashes on a constant series
    assert not q287_s.search("_half_up(F.sum(_intval(err)), F.sum(_intval(napierr)), 6)")
    assert q287_o.search(
        "CASE WHEN sum(CAST(round(abs(a - p)) AS BIGINT)) > 0 THEN floor(x)"
    )
    assert not q287_o.search("floor(sum(err) * 1e6 / sum(naive) + 0.5) / 1e6 AS mase")


# --- r12-fix structural canaries (round-13 verdict items 4 & 7) -------------
#
# The three boundary-class fixes the r12 ultra campaign forced (q352 raw
# effect, q147 interpolation, q131 PQ micro-units) are bespoke algebra: the
# differential only re-proves them on a seed that reaches the boundary, so a
# one-sided refactor would sit latent. Same treatment as q232/q246/q287
# above — structural signatures pinned on BOTH sides. q131's algebra lives
# in the OPERATOR (similarity.pq_reconstruction), so its Spark pattern is
# checked against that source, not the thin entry wrapper.

from hubverse_transform_spark.operators.similarity import (  # noqa: E402
    pq_reconstruction,
)

Q147_SPARK_INTERP = re.compile(
    r"_half_up\(\s*num,\s*F\.lit\(100\)\s*\*\s*den,\s*2\s*\)"
)
Q147_ORACLE_INTERP = re.compile(
    r"floor\(\s*cast\(\s*p\.av\s*\*\s*\(nx\.ad\s*-\s*p\.ad\)"
    r"[\s\S]{0,400}?/\s*\(100\s*\*\s*\(nx\.ad\s*-\s*p\.ad\)\)\s*\+\s*0\.5\s*\)"
    r"\s*/\s*1e2",
    re.IGNORECASE,
)

Q131_SPARK_QUANT = re.compile(
    r"F\.floor\(\s*sq_dist\s*\*\s*F\.lit\(1e6\)\s*\+\s*0\.5\s*\)\.cast\(\"long\"\)"
)
Q131_SPARK_AVG = re.compile(
    r"F\.floor\(\s*F\.sum\(\"_e\"\)\.cast\(\"double\"\)\s*/\s*F\.count\(F\.lit\(1\)\)\s*\+\s*0\.5\s*\)"
)
Q131_SPARK_MAX = re.compile(
    r"F\.max\(\"_e\"\)\.cast\(\"double\"\)\s*/\s*F\.lit\(1e6\)"
)
Q131_ORACLE_QUANT = re.compile(
    r"cast\(\s*floor\(\s*list_sum[\s\S]{0,120}?\*\s*1e6\s*\+\s*0\.5\s*\)\s*as\s+bigint\s*\)\s*as\s+k",
    re.IGNORECASE,
)
Q131_ORACLE_AVG = re.compile(
    r"floor\(\s*cast\(\s*sum\(e\)\s*as\s+double\s*\)\s*/\s*count\(\*\)\s*\+\s*0\.5\s*\)\s*/\s*1e6",
    re.IGNORECASE,
)
Q131_ORACLE_MAX = re.compile(
    r"cast\(\s*max\(e\)\s*as\s+double\s*\)\s*/\s*1e6",
    re.IGNORECASE,
)

# q352's CUPED arm is the one estimator arm DELIBERATELY left float (θ is a
# ratio of float covariance moments; a d=6 boundary needs its reduced
# rational denominator to divide 2·10^6 — astronomical cancellation). The
# canary pins the float FORM and the written JUSTIFICATION together so
# neither can be edited away without the other (a dropped justification
# leaves an unexplained float arm; a converted arm leaves a stale waiver).
Q352_SPARK_CUPED_FLOAT = re.compile(
    r"F\.round\(\s*F\.col\(\"_mc1\"\)\s*-\s*F\.col\(\"_mc0\"\),\s*6\s*\)"
)
Q352_WAIVER_TOKEN = "astronomical cancellation"
Q352_ORACLE_CUPED_FLOAT = re.compile(
    r"'cuped'[\s\S]{0,200}?round\(\s*\(select\s+m\s+from\s+cupm[\s\S]{0,120}?,\s*6\s*\)",
    re.IGNORECASE,
)


def test_r12_fix_canaries_pin_both_sides():
    fns = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    errs = []

    q147_src = inspect.getsource(fns["q147_interpolate_gaps"])
    q147_sql = sqls["q147_interpolate_gaps"]
    if not Q147_SPARK_INTERP.search(q147_src):
        errs.append("q147: Spark interpolation branch no longer the exact "
                    "_half_up(num, 100*den, 2) form")
    if q147_src.count("_half_up(") < 4:
        errs.append("q147: fewer than 4 _half_up display branches — a "
                    "branch reverted to float rounding?")
    if not Q147_ORACLE_INTERP.search(q147_sql):
        errs.append("q147: oracle lost the mirrored integer-rational "
                    "floor(...)/1e2 interpolation form")

    q131_src = inspect.getsource(pq_reconstruction)
    q131_sql = sqls["q131_pq_recon_error"]
    for pat, what in (
        (Q131_SPARK_QUANT, "micro-unit quantization (floor(d*1e6+0.5).cast(long))"),
        (Q131_SPARK_AVG, "integer-mean display (floor(sum_e/n + 0.5))"),
        (Q131_SPARK_MAX, "integer-max display (max_e/1e6)"),
    ):
        if not pat.search(q131_src):
            errs.append(f"q131/pq_reconstruction: Spark side lost the {what}")
    for pat, what in (
        (Q131_ORACLE_QUANT, "micro-unit quantization"),
        (Q131_ORACLE_AVG, "integer-mean display"),
        (Q131_ORACLE_MAX, "integer-max display"),
    ):
        if not pat.search(q131_sql):
            errs.append(f"q131: oracle SQL lost the mirrored {what}")

    q352_src = inspect.getsource(fns["q352_variance_reduction_methods"])
    q352_sql = sqls["q352_variance_reduction_methods"]
    has_float = bool(Q352_SPARK_CUPED_FLOAT.search(q352_src))
    has_waiver = Q352_WAIVER_TOKEN in q352_src
    if has_float and not has_waiver:
        errs.append("q352: CUPED float arm present but its half-safe "
                    "justification ('astronomical cancellation') was removed")
    if has_waiver and not has_float:
        errs.append("q352: CUPED waiver present but the float form it "
                    "justifies is gone — stale waiver or one-sided conversion")
    if not (has_float or has_waiver):
        errs.append("q352: CUPED arm unrecognizable — if consciously "
                    "converted to exact arithmetic, update this canary")
    if has_float and not Q352_ORACLE_CUPED_FLOAT.search(q352_sql):
        errs.append("q352: Spark CUPED is float but oracle lost the "
                    "mirrored round(m1 - m0, 6) form")

    assert not errs, (
        "r12 boundary-class fix desynchronized (see SEEDS.md r12 catches). "
        "Offenders:\n  " + "\n  ".join(errs)
    )


def test_r12_fix_canaries_fire_on_one_sided_edits():
    """Each canary must reject the exact refactor it exists to catch and
    accept the healthy committed form."""
    # q147: interpolation reverted to float round()
    assert Q147_SPARK_INTERP.search(".otherwise(_half_up(num, F.lit(100) * den, 2))")
    assert not Q147_SPARK_INTERP.search(".otherwise(F.round(num / den / 100, 2))")
    assert Q147_ORACLE_INTERP.search(
        "ELSE floor(CAST(p.av * (nx.ad - p.ad)\n + (nv) AS DOUBLE) * 1e2\n"
        " / (100 * (nx.ad - p.ad)) + 0.5) / 1e2"
    )
    assert not Q147_ORACLE_INTERP.search(
        "ELSE round((p.av + (nx.av - p.av) * (d - p.ad) / (nx.ad - p.ad)) / 100, 2)"
    )
    # q131: float grid values reintroduced (the pre-fix form)
    assert Q131_SPARK_QUANT.search('F.floor(sq_dist * F.lit(1e6) + 0.5).cast("long")')
    assert not Q131_SPARK_QUANT.search("F.round(sq_dist, 6)")
    assert Q131_ORACLE_AVG.search("floor(CAST(sum(e) AS DOUBLE) / count(*) + 0.5) / 1e6")
    assert not Q131_ORACLE_AVG.search("round(avg(e_float), 6)")
    # q352: the two half-states the waiver canary exists for
    healthy = (
        '# ... needs astronomical cancellation (half-safe, seed-covered).\n'
        'F.round(F.col("_mc1") - F.col("_mc0"), 6).alias("effect")'
    )
    assert Q352_SPARK_CUPED_FLOAT.search(healthy) and Q352_WAIVER_TOKEN in healthy
    no_waiver = 'F.round(F.col("_mc1") - F.col("_mc0"), 6)'
    assert Q352_SPARK_CUPED_FLOAT.search(no_waiver) and Q352_WAIVER_TOKEN not in no_waiver
    converted = "# needs astronomical cancellation\n_half_up(C1n0 - C0n1, den, 6)"
    assert not Q352_SPARK_CUPED_FLOAT.search(converted) and Q352_WAIVER_TOKEN in converted
    assert Q352_ORACLE_CUPED_FLOAT.search(
        "SELECT 'cuped',\n round((SELECT m FROM cupm WHERE t = 1)\n"
        " - (SELECT m FROM cupm WHERE t = 0), 6)"
    )
    assert not Q352_ORACLE_CUPED_FLOAT.search(
        "SELECT 'cuped', floor(CAST(mc AS DOUBLE) * 1e6 / n + 0.5) / 1e6"
    )


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


# --- r13 catch: q359 EWMA display boundary (seed 565859) -------------------
# The decay weights λ(1-λ)^k are exact terminating decimals over integer
# daily counts, and a 7^4-divisible day grid cancels the (1-λ)^t·μ0 tail —
# the TRUE ewma reaches the d=4 half boundary (565859 day 5 = exactly
# 5.16975), where round() splits across engines on the same double. The
# fix is the mirrored floor half-up pair; these patterns pin BOTH sides so
# a lockstep revert to round() (which the generic desync lint would not
# see) cannot silently reintroduce the class.

Q359_SPARK_EWMA = re.compile(
    r"half_up\(\s*F\.col\(\"_wsum\"\)\s*\+\s*F\.pow\("
)
Q359_ORACLE_EWMA = re.compile(
    r"floor\(CAST\(wsum \+ pow\([\s\S]{0,80}?\* 1e4 \+ 0\.5\)\s*/\s*1e4",
)


def test_q359_ewma_boundary_fix_pinned_both_sides():
    import __spark_entry__ as entry

    src = inspect.getsource(entry.queries()["q359_ewma_control_chart"])
    sql = entry.oracle_sql()["q359_ewma_control_chart"]
    assert Q359_SPARK_EWMA.search(src), (
        "q359: ewma display no longer the half_up(_wsum + pow·mu, 4) form — "
        "round() reintroduces the seed-565859 d=4 boundary divergence"
    )
    assert src.count("F.round(") == 2, (
        "q359: expected exactly the two lcl/ucl F.round sites (irrational "
        "sd·sqrt class); the ewma display must stay half_up"
    )
    assert len(Q359_ORACLE_EWMA.findall(sql)) == 3, (
        "q359 oracle: the ewma floor-mirror must appear in the display AND "
        "both out_of_control comparisons"
    )
    assert "round(wsum" not in sql, "q359 oracle: round() on the ewma again"


def test_q359_canary_fires_on_one_sided_and_lockstep_edits():
    assert not Q359_SPARK_EWMA.search(
        'F.round(\n F.col("_wsum")\n + F.pow(F.lit(1 - lam), F.col("_r"))'
    )
    assert not Q359_ORACLE_EWMA.search("round(wsum + pow(0.7, r) * mu, 4)")
    # healthy forms match
    assert Q359_SPARK_EWMA.search('half_up(\n    F.col("_wsum")\n    + F.pow(')
    assert Q359_ORACLE_EWMA.search(
        "floor(CAST(wsum + pow(0.7, r) * mu AS DOUBLE)\n * 1e4 + 0.5) / 1e4"
    )
