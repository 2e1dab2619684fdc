"""Differential checker: run every queries() entry against its DuckDB oracle.

Compares row count, column names, and order-insensitive rounded values —
a local approximation of the driver's CORRECTNESS gate. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from hubverse_transform_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def tolcheck_q109(sdf, con) -> list[str]:
    """HLL-union weekly estimates must land within max(3, 5%) of the exact
    weekly distinct computed by DuckDB — the sketch output is merge-order
    dependent so it can't hash-match, but drift outside the HLL++ error
    envelope is a real bug and must FAIL here, not print 'rows-only'."""
    exact = {
        int(w): int(n)
        for w, n in con.sql(
            "SELECT weekofyear(date_trunc('day', ts)) AS week,"
            " count(DISTINCT user_id) AS n FROM events GROUP BY 1"
        ).fetchall()
    }
    errs = []
    if sorted(exact) != sorted(int(w) for w in sdf["week"]):
        errs.append(f"week sets differ: {sorted(exact)} vs {sorted(sdf['week'])}")
        return errs
    for _, r in sdf.iterrows():
        x = exact[int(r["week"])]
        if abs(int(r["approx_users"]) - x) > max(3, 0.05 * x):
            errs.append(
                f"week {int(r['week'])}: approx {int(r['approx_users'])} "
                f"outside 5% of exact {x}"
            )
    return errs


def tolcheck_q207(sdf, con) -> list[str]:
    """approx_percentile(accuracy=10000) guarantees rank error <= eps=1e-4
    — but that is a RANK guarantee, discrete in rows: the implementation
    promises the cut within ceil(eps*n) positions of the target, so for
    eps*n < 1 (n < 10000, e.g. the sf0.001 tier at ~6k lineitem rows) the
    achievable fractional error is one row, 1/n > eps. Assert against
    max(eps, ceil(eps*n)/n) + 5e-7 d=6-rounding slack (the audit column is
    rounded to 6 decimals, which can round 1/n UP past the exact bound).
    The query's own audit column realizes the error against a full data
    pass (tie-mass slack already folded in by the query)."""
    errs = []
    import math

    n = con.sql("SELECT count(*) FROM lineitem").fetchone()[0]
    eps = 1e-4
    bound = max(eps, math.ceil(eps * n) / n) + 5e-7
    for _, r in sdf.iterrows():
        if float(r["max_rank_err"]) > bound:
            errs.append(
                f"decile {int(r['decile'])}: realized rank error "
                f"{r['max_rank_err']} > sketch guarantee {bound:.7f} (n={n})"
            )
    if len(sdf) != 9:
        errs.append(f"expected 9 deciles, got {len(sdf)}")
    return errs


# rows-only queries get a tolerance assertion instead of a silent pass:
# the tool FAILS loudly when a sketch estimate drifts outside the
# tolerance of its exact twin (VERDICT r5/r6 item 8)
TOLERANCE_CHECKS = {
    "q109_hll_union_users": tolcheck_q109,
    "q207_approx_decile_audit": tolcheck_q207,
}


def _isna(v) -> bool:
    """Scalar missing-ness across the pandas conversions both engines use:
    Spark toPandas hands NULL booleans/objects as None, DuckDB .df() hands
    NULL doubles AND NULL booleans as float NaN — the same semantic value
    in three spellings (round-10: q247's undefined sign_flip hashed as
    'None' vs 'nan'). NaN-vs-NULL was never observable anyway: DuckDB's
    pandas conversion collapses double NULL to NaN before we see it."""
    if isinstance(v, (list, tuple)) or hasattr(v, "__len__") and not isinstance(v, str):
        return False
    if v is None:
        return True
    try:
        return v != v  # NaN/NaT are the only self-unequal scalars
    except Exception:
        return False


def _oracle_nan_audit(con, sql: str) -> list[str]:
    """Oracles must spell undefined results as explicit CASE->NULL, never
    rely on float NaN propagation: normalize() hashes Spark NULL and a
    DuckDB NaN identically ('null'), so an oracle that erroneously computes
    a genuine NaN where Spark defines NULL would pass the differential
    silently (round-10 advice). DuckDB's pandas conversion collapses NULL
    doubles to NaN before we see them, so this audit runs ENGINE-side,
    where NULL and NaN are distinct: count rows where any float column
    isnan() (isnan(NULL) is NULL -> not counted). Scalar float columns
    only — no current oracle emits float arrays."""
    rel = con.sql(f"SELECT * FROM ({sql}) _q LIMIT 0")
    float_cols = [
        c for c, t in zip(rel.columns, rel.types) if str(t) in ("DOUBLE", "FLOAT")
    ]
    if not float_cols:
        return []
    preds = " OR ".join(f'isnan("{c}")' for c in float_cols)
    n = con.sql(f"SELECT count(*) FROM ({sql}) _q WHERE {preds}").fetchone()[0]
    if n:
        return [f"{n} oracle rows carry genuine NaN (spell undefined as CASE->NULL)"]
    return []


def _spark_nan_audit(tbl) -> list[str]:
    """Symmetric twin of _oracle_nan_audit (r11 verdict item 1): the SPARK
    side must also spell undefined as NULL, never a computed float NaN —
    normalize() hashes Spark NaN and oracle NULL identically, so a genuine
    0.0/0.0-style NaN in the engine output where the oracle defines
    CASE->NULL would pass the differential silently. The audit runs on the
    Arrow representation (DataFrame.toArrow(), the same single execution
    that feeds the pandas compare), where NULL keeps its validity bit and
    NaN is a value — the distinction toPandas destroys. Scans scalar float
    columns and one level of list<float> (embedding outputs)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    bad = []
    for field in tbl.schema:
        col = tbl[field.name]
        if pa.types.is_floating(field.type):
            n = pc.sum(pc.is_nan(col)).as_py() or 0  # is_nan(NULL)=NULL, skipped
        elif pa.types.is_list(field.type) and pa.types.is_floating(
            field.type.value_type
        ):
            n = pc.sum(pc.is_nan(pc.list_flatten(col))).as_py() or 0
        else:
            continue
        if n:
            bad.append(f"{field.name}({n} rows)")
    if bad:
        return [
            f"Spark output carries genuine NaN in {', '.join(bad)} "
            "(undefined must be NULL on BOTH engines)"
        ]
    return []


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            if _isna(v):
                v = "null"
            elif isinstance(v, float):
                v = round(v, 9)
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in entry_mod.queries().items():
        if only and name not in only and name.split("_", 1)[0] not in only:
            continue
        try:
            stbl = fn(spark, sf).toArrow()
            spark_nan_errs = _spark_nan_audit(stbl)
            sdf = stbl.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if spark_nan_errs:
            print(f"FAIL {name}: {'; '.join(spark_nan_errs)}")
            failures += 1
            continue
        if name not in oracles:
            check = TOLERANCE_CHECKS.get(name)
            if check is None:
                print(f"rows-only {name}: {len(sdf)} rows (no tolerance check!)")
                continue
            errs = check(sdf, con)
            if errs:
                print(f"FAIL {name}: tolerance check: {'; '.join(errs)}")
                failures += 1
            else:
                print(f"OK~  {name}: {len(sdf)} rows (tolerance-asserted, no hash)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
            nan_errs = _oracle_nan_audit(con, oracles[name])
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        if nan_errs:
            print(f"FAIL {name}: {'; '.join(nan_errs)}")
            failures += 1
            continue
        s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
        if s_cols != o_cols:
            print(f"FAIL {name}: columns {s_cols} vs {o_cols}")
            failures += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows {len(sdf)} vs {len(odf)}")
            failures += 1
            continue
        s_rows = normalize(sdf.to_dict("records"), s_cols)
        o_rows = normalize(odf.to_dict("records"), o_cols)
        if s_rows != o_rows:
            diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
            print(f"FAIL {name}: value mismatch ({len(sdf)} rows); first diffs:")
            for a, b in diffs:
                print(f"   spark:  {a}\n   oracle: {b}")
            failures += 1
            continue
        print(f"OK   {name}: {len(sdf)} rows")
    spark.stop()
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
