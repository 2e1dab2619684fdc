"""Generate a local sf1 slice (documents + embeddings only) for the one-off
dedup/ANN scale probe (VERDICT r5/r6 item 7).

The driver's testdata tops out at sf0.1; the near-dup / ANN family's scale
claims rest on sublinear 0.001->0.1 ratios, so this synthesizes a 10x-larger
corpus IN THE DRIVER'S OWN STYLE (same 31-word vocabulary sampled from
sf0.1 so shingle document-frequency keeps growing linearly like the real
generator's, same 10-100 token lengths, same lang/source cardinalities,
~10% seeded mutated near-dups so pair joins have realistic yield) and
writes it OUTSIDE the read-only testdata tree. Only the two tables the
probe family touches are generated.

Usage: python tools/gen_sf1.py [outdir]   (default .scratch/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_DOCS = 50_000      # 10x sf0.1's 5_000
N_VECS = 20_000      # 10x sf0.1's 2_000
DIM = 64
SEED = 1337


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)

    con = duckdb.connect()
    vocab = [
        r[0]
        for r in con.sql(
            "SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM "
            "read_parquet('/root/testdata/sf0.1/documents.parquet') ORDER BY w"
        ).fetchall()
    ]
    langs = [r[0] for r in con.sql(
        "SELECT DISTINCT lang FROM "
        "read_parquet('/root/testdata/sf0.1/documents.parquet') ORDER BY lang"
    ).fetchall()]
    sources = [f"src{i}" for i in range(20)]

    lens = rng.integers(10, 101, size=N_DOCS)
    texts: list[str] = []
    vsize = len(vocab)
    varr = np.array(vocab)
    for i in range(N_DOCS):
        if i >= 10 and rng.random() < 0.10:
            # mutated near-dup of a recent doc: 1-3 token substitutions
            base = texts[int(rng.integers(max(0, i - 1000), i))].split()
            for _ in range(int(rng.integers(1, 4))):
                base[int(rng.integers(len(base)))] = vocab[int(rng.integers(vsize))]
            texts.append(" ".join(base))
        else:
            texts.append(" ".join(varr[rng.integers(0, vsize, size=lens[i])]))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([langs[i % len(langs)] for i in range(N_DOCS)]),
            "source": pa.array([sources[i % 20] for i in range(N_DOCS)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out}/documents.parquet")

    centers = rng.normal(0, 1, size=(10, DIM))
    labels = rng.integers(0, 10, size=N_VECS)
    vecs = centers[labels] + rng.normal(0, 0.3, size=(N_VECS, DIM))
    # ~5% near-dup vectors: tiny perturbation of an earlier vector
    for i in rng.choice(N_VECS // 2, size=N_VECS // 20, replace=False):
        j = N_VECS - 1 - int(i)
        vecs[j] = vecs[i] + rng.normal(0, 0.01, size=DIM)
        labels[j] = labels[i]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(N_VECS), pa.int64()),
                "embedding": pa.array(
                    [v.astype(np.float32) for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        f"{out}/embeddings.parquet",
    )
    print(f"wrote {out}/documents.parquet ({N_DOCS}) and embeddings.parquet ({N_VECS})")

    # ---- graph/ER slice (round-8 probe extension): lineitem/part/customer
    # at 10x sf0.1, driver-style distributions. Only the columns the graph
    # family (q72/q236/q249/q252/q334: l_orderkey+l_partkey, p_brand) and
    # q245 (customer comparison fields) actually read.
    n_orders = 1_500_000          # 10x sf0.1's 150k
    n_parts = 200_000             # 10x sf0.1's 20k
    n_cust = 150_000              # 10x sf0.1's 15k
    widths = rng.integers(1, 8, size=n_orders)   # ~4 items/order like sf0.1
    orderkeys = np.repeat(np.arange(n_orders, dtype=np.int64), widths)
    partkeys = rng.integers(0, n_parts, size=len(orderkeys)).astype(np.int64)
    pq.write_table(
        pa.table({"l_orderkey": orderkeys, "l_partkey": partkeys}),
        f"{out}/lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(n_parts), pa.int64()),
                "p_brand": pa.array(
                    [f"Brand#{1 + i % 25}" for i in range(n_parts)]
                ),
            }
        ),
        f"{out}/part.parquet",
    )
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_nationkey": pa.array(
                    rng.integers(0, 25, size=n_cust), pa.int32()
                ),
                "c_mktsegment": pa.array(
                    [segs[int(i)] for i in rng.integers(0, 5, size=n_cust)]
                ),
                "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
                "c_acctbal": pa.array(
                    np.round(rng.uniform(-999.99, 9999.99, size=n_cust), 2),
                    pa.float64(),
                ),
            }
        ),
        f"{out}/customer.parquet",
    )
    print(
        f"wrote {out}/lineitem.parquet ({len(orderkeys)}), part.parquet "
        f"({n_parts}), customer.parquet ({n_cust})"
    )


if __name__ == "__main__":
    main()
