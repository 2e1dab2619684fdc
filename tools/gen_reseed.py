"""Re-seeded sf0.01 twin for the seed-robustness differential (VERDICT r7
item 7).

Generates a FULL sf0.01-shaped dataset (all 10 tables, same schemas, same
value domains/grids/horizons — those are corpus CONTRACTS the query
surface legitimately parameterizes on: the Jan-2024 events horizon, the
0.01-step discount grid, 2-decimal money, Customer#%09d names) but with
every random draw re-seeded. Running `tools/check_oracle.py` against this
twin flushes corpus-CONSTANT assumptions: any place the Spark side
hard-codes something about seed-42's draws that the DuckDB oracle does
not (value ties that seed 42 never produced, knife-edge rounding
boundaries, specific near-dup layouts) shows up as a hash mismatch,
because both engines read the same re-seeded parquet and must still
agree.

Distribution notes (matched to the observed seed-42 data, see git log):
order width ~ 1+Poisson(3.07) (observed 1..13, mean 4.07); discounts
0.00..0.10 step .01; tax 0.00..0.08; quantity integer 1..50; events.ts
microsecond-precision over Jan 2024 (the testdata's actual parquet
unit at every SF); documents share the driver's 31-word vocabulary with ~10% mutated
near-dups; embeddings are 10 Gaussian clusters in R^64 float32 with ~5%
perturbation near-dups.

Usage: python tools/gen_reseed.py [outdir] [seed] [scale]
       (default .scratch/sf0.01-reseed, 777, 1.0)

``scale`` multiplies every table's row count (dimension contracts —
region/nation, value grids, horizons — are untouched): ``0.1`` yields an
sf0.001-SHAPED fresh-seed twin, the SPARSE tier where denominators that
are never zero at sf0.01 genuinely hit zero (round-10 class: q307's
single-arm propensity stratum, q377's zero recaptures — both found by
executing the surface at sf0.001, neither reachable at the sf0.01 the
differential usually runs at).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.01"

N_CUST, N_SUPP, N_PART, N_ORDERS, N_EVENTS, N_DOCS, N_VECS = (
    1500, 100, 2000, 15000, 10000, 500, 500
)
DIM = 64


def main() -> None:
    global N_CUST, N_SUPP, N_PART, N_ORDERS, N_EVENTS, N_DOCS, N_VECS
    out = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf0.01-reseed"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 777
    scale = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    if scale != 1.0:
        N_CUST, N_SUPP, N_PART, N_ORDERS, N_EVENTS, N_DOCS, N_VECS = (
            max(20, int(n * scale))
            for n in (N_CUST, N_SUPP, N_PART, N_ORDERS, N_EVENTS, N_DOCS, N_VECS)
        )
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    con = duckdb.connect()

    # region / nation: fixed dimension contracts — copy verbatim
    for t in ("region", "nation"):
        pq.write_table(
            con.sql(f"select * from '{BASE}/{t}.parquet'").arrow(), f"{out}/{t}.parquet"
        )

    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(N_CUST), pa.int64()),
                "c_name": pa.array([f"Customer#{i:09d}" for i in range(N_CUST)]),
                "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
                "c_acctbal": pa.array(
                    np.round(rng.uniform(-999.99, 9999.99, N_CUST), 2), pa.float64()
                ),
                "c_mktsegment": pa.array(
                    [segs[int(i)] for i in rng.integers(0, 5, N_CUST)]
                ),
            }
        ),
        f"{out}/customer.parquet",
    )

    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(range(N_SUPP), pa.int64()),
                "s_name": pa.array([f"Supplier#{i:09d}" for i in range(N_SUPP)]),
                "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
                "s_acctbal": pa.array(
                    np.round(rng.uniform(-999.99, 9999.99, N_SUPP), 2), pa.float64()
                ),
            }
        ),
        f"{out}/supplier.parquet",
    )

    colors = ["blue", "cold", "dark", "hot", "lite", "red", "slow", "small"]
    nouns = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
    types = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(N_PART), pa.int64()),
                "p_name": pa.array(
                    [
                        f"{colors[int(a)]} {nouns[int(b)]}"
                        for a, b in zip(
                            rng.integers(0, 8, N_PART), rng.integers(0, 8, N_PART)
                        )
                    ]
                ),
                "p_brand": pa.array(
                    [f"Brand#{int(i)}" for i in rng.integers(1, 26, N_PART)]
                ),
                "p_type": pa.array([types[int(i)] for i in rng.integers(0, 6, N_PART)]),
                "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
                "p_retailprice": pa.array(
                    np.round(rng.uniform(900.0, 1100.0, N_PART), 2), pa.float64()
                ),
            }
        ),
        f"{out}/part.parquet",
    )

    day_us = 86_400_000_000
    o_lo = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    o_days = rng.integers(0, (365 * 6 + 213), N_ORDERS)  # through 2001-08-01
    o_date_us = o_lo + o_days * day_us
    statuses = ["F", "O", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(N_ORDERS), pa.int64()),
                "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORDERS), pa.int64()),
                "o_orderstatus": pa.array(
                    [statuses[int(i)] for i in rng.integers(0, 3, N_ORDERS)]
                ),
                "o_totalprice": pa.array(
                    np.round(rng.uniform(1000.0, 500000.0, N_ORDERS), 2), pa.float64()
                ),
                "o_orderdate": pa.array(o_date_us, pa.timestamp("us")),
                "o_orderpriority": pa.array(
                    [prios[int(i)] for i in rng.integers(0, 5, N_ORDERS)]
                ),
            }
        ),
        f"{out}/orders.parquet",
    )

    widths = 1 + rng.poisson(3.07, N_ORDERS)
    okeys = np.repeat(np.arange(N_ORDERS, dtype=np.int64), widths)
    n_li = len(okeys)
    linenos = np.concatenate([np.arange(1, w + 1) for w in widths]).astype(np.int32)
    ship_us = np.repeat(o_date_us, widths) + rng.integers(1, 96, n_li) * day_us
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(okeys, pa.int64()),
                "l_partkey": pa.array(rng.integers(0, N_PART, n_li), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, N_SUPP, n_li), pa.int64()),
                "l_linenumber": pa.array(linenos, pa.int32()),
                "l_quantity": pa.array(
                    rng.integers(1, 51, n_li).astype(np.float64), pa.float64()
                ),
                "l_extendedprice": pa.array(
                    np.round(rng.uniform(901.0, 105000.0, n_li), 2), pa.float64()
                ),
                "l_discount": pa.array(
                    np.round(rng.integers(0, 11, n_li) * 0.01, 2), pa.float64()
                ),
                "l_tax": pa.array(
                    np.round(rng.integers(0, 9, n_li) * 0.01, 2), pa.float64()
                ),
                "l_returnflag": pa.array(
                    [["A", "N", "R"][int(i)] for i in rng.integers(0, 3, n_li)]
                ),
                "l_linestatus": pa.array(
                    [["F", "O"][int(i)] for i in rng.integers(0, 2, n_li)]
                ),
                "l_shipdate": pa.array(ship_us, pa.timestamp("us")),
            }
        ),
        f"{out}/lineitem.parquet",
    )

    ev_lo = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    span_us = 30 * 86_400 * 10**6
    ts_us = ev_lo + np.sort(rng.integers(0, span_us, N_EVENTS))
    etypes = ["click", "error", "purchase", "signup", "view"]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(N_EVENTS), pa.int64()),
                "ts": pa.array(ts_us, pa.timestamp("us")),
                "user_id": pa.array(rng.integers(0, 150, N_EVENTS), pa.int64()),
                "event_type": pa.array(
                    [etypes[int(i)] for i in rng.integers(0, 5, N_EVENTS)]
                ),
                "value": pa.array(
                    np.round(rng.uniform(0.01, 490.02, N_EVENTS), 2), pa.float64()
                ),
                "props": pa.array(
                    [f'{{"k": {int(i)}}}' for i in rng.integers(0, 100, N_EVENTS)]
                ),
            }
        ),
        f"{out}/events.parquet",
    )

    vocab = [
        r[0]
        for r in con.sql(
            "SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM "
            f"read_parquet('{BASE}/documents.parquet') ORDER BY w"
        ).fetchall()
    ]
    langs = ["de", "en", "es", "fr", "zh"]
    varr = np.array(vocab)
    texts: list[str] = []
    lens = rng.integers(10, 101, N_DOCS)
    for i in range(N_DOCS):
        if i >= 10 and rng.random() < 0.10:
            base = texts[int(rng.integers(max(0, i - 100), i))].split()
            for _ in range(int(rng.integers(1, 4))):
                base[int(rng.integers(len(base)))] = vocab[
                    int(rng.integers(len(vocab)))
                ]
            texts.append(" ".join(base))
        else:
            texts.append(" ".join(varr[rng.integers(0, len(varr), lens[i])]))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(N_DOCS), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array([langs[int(i)] for i in rng.integers(0, 5, N_DOCS)]),
                "source": pa.array([f"src{i % 20}" for i in range(N_DOCS)]),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{out}/documents.parquet",
    )

    centers = rng.normal(0, 1, (10, DIM))
    labels = rng.integers(0, 10, N_VECS)
    vecs = centers[labels] + rng.normal(0, 0.3, (N_VECS, DIM))
    for i in rng.choice(N_VECS // 2, size=N_VECS // 20, replace=False):
        j = N_VECS - 1 - int(i)
        vecs[j] = vecs[i] + rng.normal(0, 0.01, DIM)
        labels[j] = labels[i]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(N_VECS), pa.int64()),
                "embedding": pa.array(
                    [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        f"{out}/embeddings.parquet",
    )

    print(f"wrote re-seeded twin (seed={seed}, scale={scale}) to {out}/")


if __name__ == "__main__":
    main()
