"""SCALING.md regression gate: the committed x100 growth ratios are the
allowlist; a regenerated SCALING.md whose ratio exceeds allowlist x1.5 fails
here (same committed-artifact pattern as tests/test_shuffles_gate.py).

SCALING.md was previously advisory — a plan regression that doubled a
query's sf0.001->sf0.1 growth ratio only surfaced if someone read the table
(round-9 verdict item 5). This gate makes the table binding: after
`python tools/dump_scaling.py` regenerates it, any query whose measured
x100 ratio exceeds its committed ceiling fails the suite until either the
regression is fixed or the new ratio is consciously committed to the
ALLOWLIST below (which is exactly the review the gate exists to force).

Tolerances: wall-time ratios of sub-second dispatch-bound queries are
noisy (the round-9 spread campaign measured +/-11% same-tree drift on
multi-second queries; proportionally more on 0.3s cells), so the effective
ceiling is max(committed * 1.5, committed + NOISE_FLOOR). A genuine plan
regression — a lost broadcast, a new quadratic join — moves a ratio by
integer multiples, far past either term.

The self-test proves the gate fires on a seeded ratio bump.
"""

from __future__ import annotations

import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parent.parent

#: committed x100 ratios (t(sf0.1)/t(sf0.001)) from SCALING.md as of round
#: 10. Update ONLY alongside a reviewed `python tools/dump_scaling.py`
#: regeneration — that review is the point of the gate.
ALLOWLIST: dict[str, float] = {
    "q01_pricing_summary": 1.8,
    "q02_revenue_by_region": 1.2,
    "q21_ngram_jaccard_pairs": 1.9,
    "q23_minhash_lsh_pairs": 1.5,
    "q26_text_quality_by_lang": 2.3,
    "q45_dedup_clusters": 1.5,
    "q48_ivf_cosine_topk": 1.4,
    "q72_part_pagerank": 2.0,
    "q126_chunk_dedup": 1.1,
    "q132_pq_adc_topk": 1.4,
    "q144_revenue_trend": 2.1,
    "q158_prefix_filter_jaccard": 5.6,
    "q159_embedding_covariance": 0.9,
    "q46_winnowing_fingerprints": 1.5,
    "q119_copurchase_lift": 3.6,
    "q120_lsh_multitable_topk": 1.1,
    "q124_split_leakage": 1.3,
    "q137_brand_triangles": 2.4,
    "q149_consensus_pairs": 1.8,
    "q170_quantile_binning": 6.6,
    "q175_ivf_recall_audit": 1.4,
    "q188_minhash_estimate_error": 2.4,
    "q194_star_components": 1.3,
    "q198_cluster_survivorship": 1.7,
    "q199_dedup_method_yield": 1.3,
    "q202_cluster_size_distribution": 1.7,
    "q203_banding_sensitivity": 1.3,
    "q206_group_quantiles_scalable": 3.9,
    "q207_approx_decile_audit": 2.2,
    "q37_simhash_neardup": 1.8,
    "q47_winnow_overlap_pairs": 1.6,
    "q49_curation_funnel": 1.8,
    "q150_recursive_reach": 2.4,
    "q161_ivf_list_balance": 1.3,
    "q195_power_iteration_pca": 1.4,
    "q208_rag_chunking": 0.7,
    "q209_mixture_weights": 1.3,
    "q210_ngram_decontamination": 2.0,
    "q211_centroid_confusion": 1.1,
    "q212_containment_pairs": 2.4,
    "q213_spearman_length_ttr": 1.4,
    "q214_ks_drift": 1.1,
    "q215_vocab_gini": 1.4,
    "q193_degree_distribution": 3.6,
    "q236_bfs_reach": 2.4,
    "q245_fellegi_sunter": 5.6,
    "q249_kcore_peel": 2.1,
    "q251_hits_bipartite": 2.1,
    "q252_label_propagation": 5.0,
    "q253_degree_assortativity": 4.8,
    "q266_poisson_bootstrap_ci": 2.0,
    "q267_adamic_adar": 4.8,
    "q281_column_stats_collection": 8.0,
    "q302_hard_negative_mining": 3.9,
    "q303_dedup_method_overlap": 1.7,
    "q309_blocking_quality_audit": 2.1,
    "q311_ann_hubness_audit": 1.1,
    "q330_dedup_threshold_pr_curve": 2.3,
    "q334_clustering_coefficient": 6.7,
    "q365_rec_novelty_coverage": 2.6,
    "q366_dedup_storage_savings": 1.7,
    "q353_cf_holdout_hitrate": 2.2,
    "q354_bpe_merge_steps": 1.6,
    "q355_three_itemset_rules": 3.2,
    "q368_ljung_box_residuals": 1.2,
    "q370_ranker_agreement": 3.2,
}

#: additive slack for dispatch-bound rows where a 0.2s noise swing moves the
#: ratio by whole units without any plan change
NOISE_FLOOR = 2.0


def _ceiling(committed: float) -> float:
    return max(committed * 1.5, committed + NOISE_FLOOR)


#: round-10 verdict item 4: the cheap full-surface tier — every query NOT in
#: the headline table, ONE warmed sf0.001 run + ONE sf0.1 run per round
#: (`python tools/dump_scaling.py --full`). Single-run cells are noisier
#: than the 3-column table, so the committed values are the measured ratio
#: and the same ceiling formula applies (the +2.0 additive floor does most
#: of the work at these magnitudes). The ~300-entry committed dict is
#: machine-written by `python tools/gen_full_allowlist.py` into
#: tests/full_scaling_allowlist.py — regenerate ONLY alongside a reviewed
#: `--full` dump; the review step is reading that diff.
from full_scaling_allowlist import FULL_ALLOWLIST  # noqa: E402


def _measured_ratios(text: str) -> dict[str, float]:
    """Parse the MAIN x100 table only — the full-surface tier and the
    sf1-probe section are separate experiments with their own parsers/gates
    (the sf1 probe is x1000 on a different slice with prose adjudication
    and is deliberately not gated)."""
    main = text.split("<!-- full-surface:begin -->")[0]
    main = main.split("<!-- sf1-probe:begin -->")[0]
    rows: dict[str, float] = {}
    for line in main.splitlines():
        m = re.match(r"\| (q\w+) \| [\d.]+ \| [\d.]+ \| [\d.]+ \| ([\d.]+) \|", line)
        if m:
            rows[m.group(1)] = float(m.group(2))
    return rows


def _full_surface_ratios(text: str) -> dict[str, float]:
    """Parse the marker-delimited full-surface cheap tier (4 columns:
    query | sf0.001 | sf0.1 | ratio)."""
    m = re.search(r"<!-- full-surface:begin -->(.*?)<!-- full-surface:end -->", text, re.S)
    if not m:
        return {}
    rows: dict[str, float] = {}
    for line in m.group(1).splitlines():
        mm = re.match(r"\| (q\w+) \| [\d.]+ \| [\d.]+ \| ([\d.]+|inf) \|", line)
        if mm:
            rows[mm.group(1)] = float(mm.group(2))
    return rows


def test_full_surface_ratios_within_committed_ceiling():
    text = (REPO / "SCALING.md").read_text()
    measured = _full_surface_ratios(text)
    assert len(measured) >= 290, (
        f"full-surface table parse broke or tier missing: {len(measured)} rows "
        "(regenerate with `python tools/dump_scaling.py --full`)"
    )
    offenders = []
    for name, ratio in measured.items():
        committed = FULL_ALLOWLIST.get(name)
        if committed is None:
            offenders.append(f"{name}: ratio {ratio} has no FULL_ALLOWLIST entry")
        elif ratio > _ceiling(committed):
            offenders.append(
                f"{name}: measured x100 ratio {ratio} exceeds ceiling "
                f"{_ceiling(committed):.1f} (committed {committed})"
            )
    assert not offenders, (
        "full-surface growth-ratio regression — fix the plan or consciously "
        "update FULL_ALLOWLIST alongside the --full regeneration:\n  "
        + "\n  ".join(offenders)
    )


def test_full_surface_gate_fires_on_seeded_ratio_bump():
    fake = (
        "<!-- full-surface:begin -->\n"
        "| query | sf0.001 s | sf0.1 s | x100 ratio |\n"
        "|---|---|---|---|\n"
        "| q51_seeded_example | 0.10 | 9.90 | 99.0 |\n"
        "<!-- full-surface:end -->\n"
    )
    measured = _full_surface_ratios(fake)
    assert measured == {"q51_seeded_example": 99.0}
    # any committed value this table realistically holds is far below 99
    assert measured["q51_seeded_example"] > _ceiling(10.0)
    # the main-table parser must NOT see full-surface rows
    assert "q51_seeded_example" not in _measured_ratios(fake)


def test_scaling_ratios_within_committed_ceiling():
    text = (REPO / "SCALING.md").read_text()
    measured = _measured_ratios(text)
    assert len(measured) >= 60, f"SCALING.md main table parse broke: {len(measured)} rows"
    offenders = []
    for name, ratio in measured.items():
        committed = ALLOWLIST.get(name)
        if committed is None:
            offenders.append(f"{name}: ratio {ratio} has no committed allowlist entry")
        elif ratio > _ceiling(committed):
            offenders.append(
                f"{name}: measured x100 ratio {ratio} exceeds ceiling "
                f"{_ceiling(committed):.1f} (committed {committed})"
            )
    assert not offenders, (
        "SCALING.md growth-ratio regression — fix the plan or consciously "
        "update ALLOWLIST alongside the dump_scaling regeneration:\n  "
        + "\n  ".join(offenders)
    )


def test_gate_fires_on_seeded_ratio_bump():
    """A doubled ratio on a committed row must be flagged."""
    fake = (
        "| query | sf0.001 s | sf0.01 s | sf0.1 s | x100 ratio |\n"
        "|---|---|---|---|---|\n"
        "| q01_pricing_summary | 0.51 | 0.52 | 7.00 | 13.7 |\n"
    )
    measured = _measured_ratios(fake)
    assert measured == {"q01_pricing_summary": 13.7}
    assert measured["q01_pricing_summary"] > _ceiling(ALLOWLIST["q01_pricing_summary"])
    # and the sf1 probe section is excluded from parsing
    probed = _measured_ratios(fake + "\n<!-- sf1-probe:begin -->\n| q99_x | 1.0 | 1.0 | 99.0 | 99.0 |\n")
    assert "q99_x" not in probed
