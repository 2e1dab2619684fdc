#!/bin/bash
# Interleaved A/B driver: alternate passes over the r9 tip worktree and HEAD,
# >=4 pairs, one session (round-10 verdict item #1).
set -u
QS="q149_consensus_pairs,q198_cluster_survivorship,q207_approx_decile_audit,q158_prefix_filter_jaccard,q212_containment_pairs,q206_group_quantiles_scalable,q194_star_components,q127_perplexity_buckets,q144_revenue_trend,q252_label_propagation,q120_lsh_multitable_topk,q141_merged_intervals,q131_pq_recon_error,q236_bfs_reach,q45_dedup_clusters"
OUT=/root/repo/.scratch/ab_r9_r10.jsonl
mkdir -p /root/repo/.scratch
: > "$OUT"
for i in 1 2 3 4; do
  python /root/repo/tools/ab_bench.py /root/repo/.worktrees/r9tip r9tip "$QS" "$OUT" 2>/root/repo/.scratch/ab_err_a$i.log
  python /root/repo/tools/ab_bench.py /root/repo head "$QS" "$OUT" 2>/root/repo/.scratch/ab_err_b$i.log
done
echo DONE
