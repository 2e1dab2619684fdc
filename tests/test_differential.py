"""Randomized differential testing: hypothesis-generated query shapes run on
both Spark and DuckDB over the same parquet, results compared exactly.

This is the sqllogictest-style layer the reference lacks (SURVEY.md §5): the
fixed oracle corpus pins 40+ handwritten queries; this pins the *generator*
dimensions — arbitrary filter thresholds, group keys, and sort orders.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hubverse_transform_spark.session import load_table

SF = "/root/testdata/sf0.001"

DIFF_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _norm(rows):
    return sorted(
        tuple(round(v, 9) if isinstance(v, float) else v for v in r) for r in rows
    )


def _assert_rows_close(got, want, rel=1e-9):
    """Order-insensitive row compare with float tolerance.

    Spark and DuckDB may sum doubles in different orders; a sum landing on a
    rounding boundary (e.g. ...3.65 vs ...3.649999) must not fail the diff.
    Rows are keyed by their non-float fields; floats compare via isclose.
    """
    import math

    def key(r):
        return tuple(v for v in r if not isinstance(v, float))

    got_s = sorted((tuple(r) for r in got), key=key)
    want_s = sorted((tuple(r) for r in want), key=key)
    assert len(got_s) == len(want_s), (len(got_s), len(want_s))
    for g, w in zip(got_s, want_s):
        assert len(g) == len(w), (g, w)
        for gv, wv in zip(g, w):
            if isinstance(gv, float) or isinstance(wv, float):
                assert math.isclose(gv, wv, rel_tol=rel, abs_tol=1e-6), (g, w)
            else:
                assert gv == wv, (g, w)


@DIFF_SETTINGS
@given(
    qty=st.integers(1, 50),
    disc_lo=st.floats(0.0, 0.1, allow_nan=False),
    flag=st.sampled_from(["A", "N", "R"]),
    keys=st.sampled_from(
        [("l_returnflag",), ("l_linestatus",), ("l_returnflag", "l_linestatus")]
    ),
)
def test_random_filter_agg(spark, ddb, qty, disc_lo, flag, keys):
    li = load_table(spark, SF, "lineitem")
    got = (
        li.filter(
            (F.col("l_quantity") < qty)
            & (F.col("l_discount") >= disc_lo)
            & (F.col("l_returnflag") != flag)
        )
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_extendedprice").alias("s"))
        .collect()
    )
    key_sql = ", ".join(keys)
    want = ddb.sql(
        f"""SELECT {key_sql}, count(*) AS n, sum(l_extendedprice) AS s
            FROM lineitem
            WHERE l_quantity < {qty} AND l_discount >= {disc_lo!r}
              AND l_returnflag != '{flag}'
            GROUP BY {key_sql}"""
    ).fetchall()
    _assert_rows_close([tuple(r) for r in got], want)


@DIFF_SETTINGS
@given(
    k=st.integers(1, 20),
    part=st.sampled_from(["o_orderpriority", "o_orderstatus"]),
    direction=st.sampled_from(["asc", "desc"]),
)
def test_random_topk_window(spark, ddb, k, part, direction):
    from pyspark.sql import Window

    o = load_table(spark, SF, "orders")
    order = (
        [F.col("o_totalprice").desc(), F.col("o_orderkey")]
        if direction == "desc"
        else [F.col("o_totalprice").asc(), F.col("o_orderkey")]
    )
    w = Window.partitionBy(part).orderBy(*order)
    got = (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(part, "o_orderkey", "rk")
        .collect()
    )
    want = ddb.sql(
        f"""SELECT {part}, o_orderkey, rk FROM (
              SELECT {part}, o_orderkey,
                     row_number() OVER (PARTITION BY {part}
                         ORDER BY o_totalprice {direction}, o_orderkey) AS rk
              FROM orders)
            WHERE rk <= {k}"""
    ).fetchall()
    assert _norm([tuple(r) for r in got]) == _norm(want)


@DIFF_SETTINGS
@given(
    jtype=st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
    price_lo=st.integers(0, 200_000),
    status=st.sampled_from(["F", "O", "P"]),
)
def test_random_join_shapes(spark, ddb, jtype, price_lo, status):
    o = load_table(spark, SF, "orders").filter(F.col("o_totalprice") >= price_lo)
    li = load_table(spark, SF, "lineitem").filter(F.col("l_linestatus") != status)
    joined = o.join(li, o.o_orderkey == li.l_orderkey, jtype)
    if jtype in ("left_semi", "left_anti"):
        got = joined.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()
    else:
        got = (
            joined.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"), F.count("l_orderkey").alias("n_li"))
            .collect()
        )
    sql_join = {
        "inner": "JOIN", "left": "LEFT JOIN",
        "left_semi": "SEMI JOIN", "left_anti": "ANTI JOIN",
    }[jtype]
    base = f"""FROM (SELECT * FROM orders WHERE o_totalprice >= {price_lo}) o
               {sql_join} (SELECT * FROM lineitem WHERE l_linestatus != '{status}') l
               ON o.o_orderkey = l.l_orderkey"""
    if jtype in ("left_semi", "left_anti"):
        want = ddb.sql(f"SELECT o_orderstatus, count(*) AS n {base} GROUP BY 1").fetchall()
    else:
        want = ddb.sql(
            f"SELECT o_orderstatus, count(*) AS n, count(l.l_orderkey) AS n_li {base} GROUP BY 1"
        ).fetchall()
    _assert_rows_close([tuple(r) for r in got], want)
