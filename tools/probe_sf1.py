"""One-off sf1 scale probe for the dedup/ANN query family (VERDICT item 7).

Runs the near-dup / ANN headline queries against the locally generated sf1
slice (tools/gen_sf1.py: 10x the sf0.1 documents/embeddings) and rewrites
the marker-delimited `## sf1 probe` section of SCALING.md with measured
times and the x1000 ratio vs sf0.001 — the extrapolation column the
0.001->0.1 sweep cannot provide.

Usage: python tools/gen_sf1.py && python tools/probe_sf1.py
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entry
from hubverse_transform_spark.session import get_spark

SF1 = ".scratch/sf1"
SF_SMALL = "/root/testdata/sf0.001"

#: the family whose scale posture the probe certifies
FAMILY = [
    "q21_ngram_jaccard_pairs",
    "q23_minhash_lsh_pairs",
    "q37_simhash_neardup",
    "q45_dedup_clusters",
    "q120_lsh_multitable_topk",
    "q158_prefix_filter_jaccard",
    "q212_containment_pairs",
    # round 8: the graph family (owns the bench tail) + the re-blocked ER
    # scorer — sf1 slice now generates lineitem/part/customer too
    "q72_part_pagerank",
    "q236_bfs_reach",
    "q249_kcore_peel",
    "q252_label_propagation",
    "q334_clustering_coefficient",
    "q245_fellegi_sunter",
]

BEGIN, END = "<!-- sf1-probe:begin -->", "<!-- sf1-probe:end -->"


def main() -> None:
    if not os.path.exists(f"{SF1}/documents.parquet"):
        raise SystemExit("run tools/gen_sf1.py first")
    spark = get_spark("sf1-probe", cpus=None)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    qs["q01_pricing_summary"](spark, SF_SMALL).collect()  # warm session

    lines = [
        BEGIN,
        "",
        "## sf1 probe — dedup/ANN + graph/ER families at 1000x sf0.001",
        "",
        "Local sf1 slice (tools/gen_sf1.py: 50k documents / 20k embeddings,",
        "driver-style vocabulary + ~10% seeded near-dups; 6M-row lineitem /",
        "200k parts / 150k customers for the graph + ER rows) — 10x the",
        "largest driver SF. `x1000 ratio` = t(sf1)/t(sf0.001) vs 1000x data;",
        "sublinear ratios here are the direct evidence the prefix/banding",
        "joins do not go quadratic as document frequency keeps growing",
        "linearly. Read pair-join rows against the `sf1 rows` column: the",
        "31-word vocabulary makes every shingle common, so the TRUE pair",
        "count itself grows ~quadratically (q212's exact answer grows",
        "~200x for 1000x docs) — a runtime ratio well under the output",
        "growth means the join is paced by answer size, not plan defects.",
        "Graph rows: the iterative family (pagerank/BFS/k-core/LP) holds",
        "single-digit ratios at 1000x data. q334 tracks wedge volume, which",
        "grows with degree^2, not rows (the slice's co-order graph is denser",
        "than the driver's); q245 tracks the true lev<=2 candidate count",
        "(2.74M pairs at 150k sequential names vs 163k at 15k) — both are",
        "answer/structure-paced, with sub-data-growth ratios.",
        "Cells are MIN-OF-2 timed runs (r11 verdict item 3: a single-run",
        "sf1 cell under ambient load cost two manual re-run adjudications",
        "in round 11; the second warmed run + the load stamp below retire",
        "that). `sf1 runs` shows both raw runs so spread stays visible.",
        "Regenerate: `python tools/gen_sf1.py && python tools/probe_sf1.py`.",
        "",
        f"Load context: loadavg_pre {tuple(round(x, 2) for x in os.getloadavg())} "
        "at probe start,",
        "loadavg_post stamped at the end of this section.",
        "",
        "| query | sf0.001 s (min2) | sf1 s (min2) | sf1 runs | x1000 ratio | sf1 rows |",
        "|---|---|---|---|---|---|",
    ]
    for name in FAMILY:
        qs[name](spark, SF_SMALL).collect()  # per-plan warmup
        small_runs = []
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, SF_SMALL).collect()
            small_runs.append(time.time() - t0)
        t_small = min(small_runs)
        big_runs = []
        for _ in range(2):
            t0 = time.time()
            n = len(qs[name](spark, SF1).collect())
            big_runs.append(time.time() - t0)
        t_big = min(big_runs)
        ratio = t_big / t_small if t_small > 0 else float("inf")
        print(
            f"{name}: sf0.001 {t_small:.2f}s sf1 min2 {t_big:.2f}s "
            f"(runs {big_runs[0]:.2f}/{big_runs[1]:.2f}) x{ratio:.1f} ({n} rows)"
        )
        lines.append(
            f"| {name} | {t_small:.2f} | {t_big:.2f} "
            f"| {big_runs[0]:.2f} / {big_runs[1]:.2f} | {ratio:.1f} | {n} |"
        )
    lines += [
        "",
        f"loadavg_post {tuple(round(x, 2) for x in os.getloadavg())}.",
        "",
        END,
    ]
    spark.stop()

    md = open("SCALING.md").read()
    section = "\n".join(lines)
    if BEGIN in md:
        md = re.sub(
            re.escape(BEGIN) + ".*?" + re.escape(END), section, md, flags=re.S
        )
    else:
        md = md.rstrip() + "\n\n" + section + "\n"
    open("SCALING.md", "w").write(md)
    print("SCALING.md sf1 section updated")


if __name__ == "__main__":
    main()
