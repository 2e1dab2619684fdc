"""Gate for the degenerate-input (sparse-data) NULL-semantics convention.

Round 10's sparse campaign hardened ~25 queries whose estimators crash or
diverge on degenerate groups (single-arm strata, zero variance, single-class
days, zero recaptures...). The convention, now codified in COVERAGE.md
("Degenerate-input semantics"):

  * an UNDEFINED estimator returns NULL (``F.when(<defined>, value)`` on the
    Spark side, ``CASE WHEN <defined> THEN value END`` mirrored in the
    oracle) — never an ANSI DIVIDE_BY_ZERO crash, never an engine-dependent
    float residue;
  * a DEGENERATE GROUP is excluded (``.filter``/``WHERE``/``HAVING`` on both
    sides) where the row itself is meaningless (df<=0 residual audits,
    n=1 z-scores);
  * both sides carry the SAME predicate, on exact (integer/decimal)
    arithmetic where the float form's sign is order-dependent.

The convention is encoded twice per query (Spark + oracle) in ~25 places
with nothing tying them together — a refactor could silently "simplify" a
NULL guard back into a crash and no test would notice until a sparse seed
hits (round-10 verdict nit). This gate freezes, per guarded query, the
MINIMUM count of guard constructs on each side: F.when( calls and .filter(
calls in the Spark source, CASE WHEN in the oracle SQL. Dropping any guard
decreases a count below its floor and fails loudly; adding guards is always
allowed.

THIS FLOOR IS A TRIPWIRE, NOT A PROOF (r11 verdict): a refactor that
deletes the real guard but introduces an unrelated ``F.when`` elsewhere in
the same function keeps the count and passes. The real backstops are the
full differential plus the tiny/sparse-tier seed campaign, which execute
the degenerate paths; and the structurally-pinned subset gets stronger
treatment in ``test_oracle_mirror_lint.py`` — the guarded-Pearson four
(q41/q213/q238/q253) via PEARSON_SPARK/PEARSON_ORACLE and the bespoke
exact-integer three (q232 CUSUM, q246 conformal, q287 MASE) via
EXACT_INTEGER_CANARIES, each with seeded one-sided-edit self-tests.
"""

from __future__ import annotations

import inspect
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry_mod  # noqa: E402

# name -> (min F.when( in Spark source, min .filter( in Spark source,
#          min CASE WHEN in oracle SQL), frozen at the round-11 tree.
# The guarded-Pearson four (q41/q213/q238/q253) are ALSO structurally
# checked by tests/test_oracle_mirror_lint.py; this table catches the rest.
GUARD_FLOORS: dict[str, tuple[int, int, int]] = {
    "q41_corr_stats": (1, 0, 1),
    "q125_price_moments": (1, 0, 1),
    "q154_event_anomaly_zscore": (1, 1, 1),
    "q213_spearman_length_ttr": (1, 0, 1),
    "q218_embedding_outliers": (0, 2, 0),  # exclusion via filter/WHERE only
    "q234_roc_auc_daily": (2, 0, 2),
    "q238_acf_daily_orders": (1, 0, 2),
    "q246_conformal_intervals": (1, 3, 1),
    "q253_degree_assortativity": (1, 0, 1),
    "q271_ndcg_mrr": (4, 0, 5),
    "q287_forecast_accuracy": (1, 1, 1),
    "q306_cuped_adjustment": (4, 1, 4),
    "q307_ipw_treatment_effect": (8, 1, 13),
    "q314_obf_sequential_audit": (2, 2, 5),
    "q338_ols_residual_outliers": (2, 1, 2),
    "q348_seasonality_strength": (1, 0, 1),
    # r12 conscious update: q352 moved from per-arm filter(t)×crossJoin
    # branches to conditional (pivoted) aggregation — 21 F.when / 2 .filter
    # on the new form (the 2 surviving filters are the both-non-null user
    # filter and the both-arm stratum exclusion); oracle gained the exact
    # cents CASE. Proven on a sparse-tier differential (ultra-454647 full
    # re-run exit 0) per this gate's removal contract.
    "q352_variance_reduction_methods": (21, 2, 8),
    "q372_erasure_impact_audit": (4, 1, 5),
    "q377_capture_recapture": (1, 0, 3),
}

WHEN_PAT = re.compile(r"F\.when\(")
FILTER_PAT = re.compile(r"\.filter\(")
CASE_PAT = re.compile(r"CASE\s+WHEN", re.IGNORECASE)


def _counts(name: str) -> tuple[int, int, int]:
    src = inspect.getsource(entry_mod.queries()[name])
    sql = entry_mod.oracle_sql().get(name, "")
    return (
        len(WHEN_PAT.findall(src)),
        len(FILTER_PAT.findall(src)),
        len(CASE_PAT.findall(sql)),
    )


def test_sparse_guard_floors_hold():
    fns = entry_mod.queries()
    errs = []
    for name, (w_min, f_min, c_min) in GUARD_FLOORS.items():
        if name not in fns:
            errs.append(f"{name}: listed in GUARD_FLOORS but not in queries()")
            continue
        w, f, c = _counts(name)
        if w < w_min:
            errs.append(f"{name}: F.when count {w} < floor {w_min} — a NULL guard was dropped?")
        if f < f_min:
            errs.append(f"{name}: .filter count {f} < floor {f_min} — a degenerate-group exclusion was dropped?")
        if c < c_min:
            errs.append(f"{name}: oracle CASE WHEN count {c} < floor {c_min} — the oracle mirror was dropped?")
    assert not errs, (
        "degenerate-input guard convention violated (see COVERAGE.md "
        "'Degenerate-input semantics'). A guard may only be removed together "
        "with a conscious floor update here AND a sparse-tier differential "
        "run proving the new form. Offenders:\n  " + "\n  ".join(errs)
    )


def test_gate_fires_on_dropped_guard():
    """Seeded perturbation: simulate a refactor that inlines q125's skewness
    without the F.when guard — the counts must fall below the floor."""
    stripped_src = (
        "def q125_price_moments(spark, sf):\n"
        "    skew = (m3 - 3*m1*m2 + 2*m1**3) / (F.sqrt(var) * var)\n"
        "    return agg.select(skew)\n"
    )
    w = len(WHEN_PAT.findall(stripped_src))
    w_min, _, _ = GUARD_FLOORS["q125_price_moments"]
    assert w < w_min  # the gate would flag this edit
