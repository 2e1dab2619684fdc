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
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 1).alias("s"))
        .collect()
    )
    key_sql = ", ".join(keys)
    want = ddb.sql(
        f"""SELECT {key_sql}, count(*) AS n, round(sum(l_extendedprice), 1) AS s
            FROM lineitem
            WHERE l_quantity < {qty} AND l_discount >= {disc_lo!r}
              AND l_returnflag != '{flag}'
            GROUP BY {key_sql}"""
    ).fetchall()
    assert _norm([tuple(r) for r in got]) == _norm(want)


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
