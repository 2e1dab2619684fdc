"""q245 weight-pruned blocking equals the all-pairs Fellegi-Sunter scoring.

The rewrite (round 8) replaces the nation-blocked quadratic self-join with
the lev<=2 deletion-neighborhood candidate join, justified by a weight
argument: min(name-agree weight) = 3.272943 > max(name-disagree weight)
= 0.587887, so with >= 20 candidates the global top-20 is inside the
candidate set. This test checks BOTH branches against a brute-force
python oracle on synthetic corpora: one with dense near-duplicate names
(blocked path) and one degenerate corpus with no lev<=2 pairs at all
(all-pairs fallback)."""

from __future__ import annotations

import pandas as pd
import pytest

import __spark_entry__ as entry


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_top20(rows):
    out = []
    for i, a in enumerate(rows):
        for b in rows[i + 1:]:
            lo, hi = (a, b) if a["k"] < b["k"] else (b, a)
            if lo["nat"] != hi["nat"]:
                continue
            w = (
                (1.504077 if lo["seg"] == hi["seg"] else -2.079442)
                + (6.856462 if _lev(lo["name"], hi["name"]) <= 2 else -2.995632)
                + (2.079442 if lo["bal"] // 500 == hi["bal"] // 500 else -1.504077)
            )
            out.append((lo["k"], hi["k"], round(w, 6)))
    out.sort(key=lambda t: (-t[2], t[0], t[1]))
    return out[:20]


def _write_customer(spark, tmp_path, rows):
    pdf = pd.DataFrame(
        {
            "c_custkey": [r["k"] for r in rows],
            "c_nationkey": [r["nat"] for r in rows],
            "c_mktsegment": [r["seg"] for r in rows],
            "c_name": [r["name"] for r in rows],
            "c_acctbal": [float(r["bal"]) for r in rows],
        }
    )
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{sf_dir}/customer.parquet"
    )
    return sf_dir


def _run(spark, sf_dir):
    got = entry.queries()["q245_fellegi_sunter"](spark, sf_dir).collect()
    return [(r["cust1"], r["cust2"], round(r["match_weight"], 6)) for r in got]


@pytest.mark.parametrize("dense", [True, False], ids=["blocked", "fallback"])
def test_q245_equals_brute_force(spark, tmp_path, dense):
    segs = ["BUILDING", "MACHINERY", "FURNITURE"]
    if dense:
        # 40 customers, heavy near-duplication: Customer#00000000X families
        rows = [
            {
                "k": i,
                "nat": i % 3,
                "seg": segs[i % 3],
                "name": f"Customer#{i % 12:09d}"[:-1] + str(i % 7),
                "bal": (i * 137) % 3000 - 500,
            }
            for i in range(40)
        ]
    else:
        # degenerate: 8 customers, pairwise lev > 2 names -> fallback path
        names = [
            "alpha-omega-one", "bravo!!!!XXXXQQ", "charlie^^^^^^^^",
            "delta1234567890", "echo___________", "foxtrot########",
            "golfRRRRRRRRRRR", "hotelZZZZZZZZZZ",
        ]
        rows = [
            {"k": i, "nat": i % 2, "seg": segs[i % 3], "name": names[i],
             "bal": i * 600 - 400}
            for i in range(8)
        ]
        assert all(
            _lev(a["name"], b["name"]) > 2
            for i, a in enumerate(rows) for b in rows[i + 1:]
        )
    sf_dir = _write_customer(spark, tmp_path, rows)
    assert _run(spark, sf_dir) == _brute_top20(rows)
