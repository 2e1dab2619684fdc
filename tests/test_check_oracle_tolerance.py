"""The differential tool's tolerance assertions for the rows-only sketch
queries must FAIL loudly on drift — seeded perturbations of a known-good
result frame flip them to errors (VERDICT r5/r6 item: 'rows-only' lines
were previously unchecked prints)."""

from __future__ import annotations

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "tools")

from check_oracle import TOLERANCE_CHECKS, tolcheck_q109, tolcheck_q207

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    c.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    return c


def _exact_weekly(con):
    return con.sql(
        "SELECT weekofyear(date_trunc('day', ts)) AS week,"
        " count(DISTINCT user_id) AS approx_users, 1 AS n_days"
        " FROM events GROUP BY 1"
    ).df()


def test_q109_exact_passes_and_perturbation_fails(con):
    good = _exact_weekly(con)
    assert tolcheck_q109(good, con) == []
    # drift one week's estimate 20% high -> must be reported
    bad = good.copy()
    bad.loc[0, "approx_users"] = int(bad.loc[0, "approx_users"] * 1.2) + 10
    errs = tolcheck_q109(bad, con)
    assert errs and "outside 5%" in errs[0]
    # a missing/extra week is also a failure, not a silent pass
    errs = tolcheck_q109(good.iloc[1:], con)
    assert errs and "week sets differ" in errs[0]


def test_q207_guarantee_passes_and_perturbation_fails(con):
    good = pd.DataFrame(
        {
            "decile": range(1, 10),
            "approx_cut": [float(i) for i in range(1, 10)],
            "frac_below": [i / 10 for i in range(1, 10)],
            "frac_at_or_below": [i / 10 for i in range(1, 10)],
            "max_rank_err": [0.0] * 9,
        }
    )
    assert tolcheck_q207(good, con) == []
    bad = good.copy()
    bad.loc[4, "max_rank_err"] = 5e-4  # outside the accuracy=10000 bound
    errs = tolcheck_q207(bad, con)
    assert errs and "rank error" in errs[0]
    errs = tolcheck_q207(good.iloc[:5], con)
    assert errs and "9 deciles" in errs[0]
    # sparse-tier discreteness (round-10): at n < 10000 the sketch's rank
    # guarantee is ceil(eps*n) = ONE ROW, so a realized error of exactly
    # 1/n (even rounded UP at d=6) must PASS, and 2/n must still fail
    n = con.sql("SELECT count(*) FROM lineitem").fetchone()[0]
    assert n < 10000, "fixture expects the sf0.001 tier"
    one_row = good.copy()
    one_row.loc[2, "max_rank_err"] = round(1.0 / n, 6)
    assert tolcheck_q207(one_row, con) == []
    two_rows = good.copy()
    two_rows.loc[2, "max_rank_err"] = round(2.0 / n, 6)
    errs = tolcheck_q207(two_rows, con)
    assert errs and "rank error" in errs[0]


def test_every_rows_only_query_has_a_tolerance_check():
    import __spark_entry__ as entry

    rows_only = set(entry.queries()) - set(entry.oracle_sql())
    assert rows_only == set(TOLERANCE_CHECKS), (
        "every oracle-less query needs a tolerance assertion in "
        "tools/check_oracle.py TOLERANCE_CHECKS"
    )


def test_spark_nan_audit_fires_on_planted_nan(spark):
    """r11 verdict item 1: the engine-side NaN audit must fail loudly when
    the SPARK output carries a genuine float NaN (e.g. an unguarded
    0.0/0.0) where the convention demands NULL — the class that previously
    hash-collided silently because toPandas collapses NULL and NaN."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    from check_oracle import _spark_nan_audit

    # end-to-end: a planted NaN through a real Spark plan (sqrt of a
    # negative — ANSI throws on 0.0/0.0 before it can produce NaN, but
    # sqrt/log/asin out-of-domain NaNs flow through silently, which is
    # exactly the class this audit exists to catch)
    planted = (
        spark.range(2)
        .select(F.sqrt(F.col("id").cast("double") - F.lit(1.0)).alias("x"))
        .toArrow()
    )
    errs = _spark_nan_audit(planted)
    assert errs and "genuine NaN" in errs[0] and "x(" in errs[0]
    # NULL (the convention-compliant spelling) passes
    ok = (
        spark.range(2)
        .select(F.when(F.lit(False), F.lit(1.0)).alias("x"))
        .toArrow()
    )
    assert _spark_nan_audit(ok) == []
    # list<float> payloads (embedding outputs) are scanned one level deep
    bad_list = pa.table({"v": [[1.0, float("nan")], None]})
    assert _spark_nan_audit(bad_list)
    assert _spark_nan_audit(pa.table({"v": [[1.0, 2.0], None]})) == []
    # non-float columns are ignored
    assert _spark_nan_audit(pa.table({"s": ["a", None], "i": [1, None]})) == []


def test_oracle_nan_audit_fires_on_planted_nan(con):
    """The DuckDB-side twin (added r11) keeps its own seeded self-test."""
    from check_oracle import _oracle_nan_audit

    errs = _oracle_nan_audit(con, "SELECT 'nan'::DOUBLE AS x")
    assert errs and "NaN" in errs[0]
    assert _oracle_nan_audit(con, "SELECT CASE WHEN false THEN 1.0 END::DOUBLE AS x") == []
    assert _oracle_nan_audit(con, "SELECT 'a' AS s, 1 AS i") == []


def test_normalize_canonicalizes_missing_representations():
    """Spark hands NULL booleans as None, DuckDB's pandas conversion hands
    NULL doubles/booleans as float NaN — normalize() must hash them
    identically (round-10: q247's undefined sign_flip on a 1-customer
    nation), while real values keep distinguishing."""
    import numpy as np

    from check_oracle import normalize

    spark_rows = [{"a": 1, "flip": None}, {"a": 2, "flip": True}]
    duck_rows = [{"a": 1, "flip": float("nan")}, {"a": 2, "flip": True}]
    assert normalize(spark_rows, ["a", "flip"]) == normalize(duck_rows, ["a", "flip"])
    # NaT (self-unequal) also canonicalizes; lists pass through untouched
    assert normalize([{"a": np.datetime64("NaT")}], ["a"]) == normalize([{"a": None}], ["a"])
    assert normalize([{"a": [1, 2]}], ["a"]) == normalize([{"a": [1, 2]}], ["a"])
    # and a genuine value difference still differs
    assert normalize([{"a": False}], ["a"]) != normalize([{"a": None}], ["a"])
