"""Multi-seed oracle differential sweep (round-8 hardening tool).

For each seed: generate a full sf0.01-shaped twin with ``gen_reseed.py``,
run the complete ``check_oracle`` differential on it, report, and delete
the twin. Every query must hash-match its DuckDB oracle on EVERY seed —
any failure is a real engine/oracle disagreement that the canonical
seed-42 data happened to mask. This sweep has caught three such bugs:

- q129: Spark double math vs DuckDB DECIMAL literals rounding an x.xx5
  allocation in opposite directions (seed 31337),
- q199: the Spark side flagging MinHash docs at jaccard>=0.5 while the
  oracle embedded q23's 0.1-threshold pair SQL (seed 31337),
- q267: a LIMIT 50 cutting through structurally tied Adamic-Adar scores
  ranked on raw float sums — a per-run flake, not just cross-engine
  (seed 777, second run).

Usage:
    python tools/seed_sweep.py [seed ...]        (default: 777 5 99 20260815)
    python tools/seed_sweep.py --fast [seed]     (default fast seed: 90210)
    python tools/seed_sweep.py --sparse [seed]   (default sparse seed: 271829)
    python tools/seed_sweep.py --ultra seed ...  (scale 0.03, r12 campaign tier)
    python tools/seed_sweep.py --tiny seed ...   (scale 0.01)

``--sparse`` (round-10 addition) generates the twin at SCALE 0.1 — an
sf0.001-shaped dataset where per-group denominators genuinely reach zero
(the tier that exposed q307's single-arm stratum and q377's zero
recaptures as ANSI DIVIDE_BY_ZERO crashes). The full surface must still
hash-match its oracle on the sparse twin: empty-group, zero-denominator,
and degenerate-tie behavior has to agree cross-engine, not just at the
comfortable density.

``--fast`` is the per-commit gate (round-9 addition): ONE fresh seed, and
only the 50 driver-gated queries plus every query a previous campaign
actually bit (the sentinel set below) — minutes instead of the full
15-dataset campaign, while still exercising each known divergence class
on data the fixes were never tuned against. Full sweeps remain the
round-close tool.

Exit code = total failures across all seeds.
"""

from __future__ import annotations

import re
import shutil
import subprocess
import sys
import time

DEFAULT_SEEDS = [777, 5, 99, 20260815]
DEFAULT_FAST_SEED = 90210

# every query a multi-seed campaign has bitten, by divergence class
# (VERIFY_r08.md §3): decimal-vs-double literals, embedded-SQL parameters,
# float-tie ranking, money half-up, ANSI zero-variance, magnitude display,
# -0.0 signs, exact-rational round() — plus q50 (this round's
# integer-microsecond duration fix) as the duration-class sentinel.
BITTEN = [
    "q03_top_orders",
    "q99_mad_outliers",
    "q129_token_budget_mix",
    "q148_price_position",
    "q183_filtered_aggregates",
    "q199_dedup_method_yield",
    "q248_graph_modularity",
    "q267_adamic_adar",
    "q269_nb_token_logodds",
    "q279_sparse_cosine_pairs",
    "q344_retention_decay_fit",
    "q348_seasonality_strength",
    "q50_session_durations",
    # round-10 class: ANSI DIVIDE_BY_ZERO reachable only on SPARSE data
    # (single-arm propensity stratum / zero recaptures at sf0.001) — now
    # CASE-guarded on both engine sides; kept here so the guards stay
    # exercised against fresh data every commit
    "q307_ipw_treatment_effect",
    "q377_capture_recapture",
    "q218_embedding_outliers",
    "q247_simpson_audit",
    "q338_ols_residual_outliers",
    "q372_erasure_impact_audit",
    "q59_sql_scalar_subquery",
    "q73_correlated_avg_subquery",
    "q234_roc_auc_daily",
    "q271_ndcg_mrr",
    "q125_price_moments",
    "q246_conformal_intervals",
    "q143_event_entropy",
    "q180_revenue_bridge",
    "q238_acf_daily_orders",
    "q314_obf_sequential_audit",
    "q127_perplexity_buckets",
    "q253_degree_assortativity",
    "q232_cusum_changepoint",
    "q287_forecast_accuracy",
    "q38_approx_distinct_users",
]


def _fast_query_set() -> list[str]:
    """The 50 driver-gated queries (q01..q50) plus the bitten sentinels."""
    sys.path.insert(0, ".")
    import __spark_entry__ as entry_mod

    names = list(entry_mod.queries())
    driver = [n for n in names if (m := re.match(r"q(\d+)_", n)) and int(m.group(1)) <= 50]
    extra = [n for n in BITTEN if n in names and n not in driver]
    missing = [n for n in BITTEN if n not in names]
    if missing:
        print(f"WARNING: bitten sentinels not in queries(): {missing}")
    return driver + extra


DEFAULT_SPARSE_SEED = 271829


#: density tiers (r12 campaign nomenclature — VERIFY_r12 §8, SEEDS.md):
#: canonical is sf0.01-shaped, the others shrink every table so group
#: denominators/strata/ties reach the degenerate regimes. Ultra (0.03) is
#: the tier that caught q352/q147/q131 in r12 — sparse enough for exact
#: rationals with tiny denominators, dense enough that most groups still
#: exist.
TIER_SCALE = {"canonical": "1.0", "sparse": "0.1", "ultra": "0.03", "tiny": "0.01"}


def main() -> int:
    args = sys.argv[1:]
    fast = "--fast" in args
    tier = next((t for t in TIER_SCALE if f"--{t}" in args), None)
    args = [a for a in args if a not in ("--fast", "--canonical", "--sparse", "--ultra", "--tiny")]
    subset: list[str] = []
    if fast:
        seeds = [int(s) for s in args] or [DEFAULT_FAST_SEED]
        subset = _fast_query_set()
        print(f"fast gate: {len(subset)} queries on seed(s) {seeds}")
    elif tier == "sparse":
        seeds = [int(s) for s in args] or [DEFAULT_SPARSE_SEED]
        print(f"sparse sweep (scale 0.1): full surface on seed(s) {seeds}")
    elif tier:
        seeds = [int(s) for s in args]
        if not seeds:
            print(f"--{tier} needs explicit seed(s) — no default, seeds must be fresh per SEEDS.md")
            return 2
        print(f"{tier} sweep (scale {TIER_SCALE[tier]}): full surface on seed(s) {seeds}")
    else:
        seeds = [int(s) for s in args] or DEFAULT_SEEDS
    scale = TIER_SCALE.get(tier or "canonical", "1.0")
    total_fail = 0
    t0 = time.perf_counter()
    for seed in seeds:
        twin = f".scratch/sweep-{seed}"
        print(f"=== seed {seed} -> {twin}")
        subprocess.run(
            [sys.executable, "tools/gen_reseed.py", twin, str(seed), scale],
            check=True,
            capture_output=True,
        )
        proc = subprocess.run(
            [sys.executable, "tools/check_oracle.py", twin, *subset],
            capture_output=True,
            text=True,
        )
        lines = proc.stdout.splitlines()
        ok = sum(1 for ln in lines if ln.startswith("OK "))
        tol = sum(1 for ln in lines if ln.startswith("OK~"))
        fails = [ln for ln in lines if ln.startswith(("FAIL", "ERR"))]
        print(f"seed {seed}: ok={ok} tolerance={tol} fail={len(fails)}")
        for ln in fails[:10]:
            print("   " + ln)
        total_fail += len(fails)
        shutil.rmtree(twin, ignore_errors=True)
    elapsed = time.perf_counter() - t0
    kind = "fast gate" if fast else f"{tier or 'canonical'} full surface"
    print(
        f"sweep done: {total_fail} failures across {len(seeds)} seeds "
        f"({kind}, {elapsed:.0f}s)"
    )
    return total_fail


if __name__ == "__main__":
    raise SystemExit(main())
