"""Size the driver-side py4j composition tail (r13 verdict item 7).

The r13 profile attributed ~164 s of the 378 s quiet baseline to
driver-side query COMPOSITION (py4j round trips while building DataFrame
chains), ~0.3-0.5 s x ~300 queries. The candidate fix is rebuilding
queries as single ``spark.sql()`` strings (one py4j call + one analysis
pass instead of one round trip per DataFrame/Column method). Before any
surface rewrite, this tool measures the actual per-query delta on one
representative relational query (q76_binational_volume, TPC-H Q7 shape —
a typical mid-size chain: 5 joins, a filter, a groupBy/agg) hand-translated
to SQL INSIDE THIS TOOL ONLY (the declared query surface is untouched):

  1. asserts the SQL form returns IDENTICAL results (sorted collect), then
  2. times composition-only (build the frame, no action) for both forms, and
  3. times full execution (noop sink) for both forms,

printing per-form medians and the projected full-surface saving. Run:

    python tools/measure_composition.py [n_reps]

Diagnostic only — never part of the bench contract or the timed surface.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from hubverse_transform_spark.session import get_spark, load_table


SQL = """
SELECT supp_nation, cust_nation, year(l_shipdate) AS l_year,
       floor(CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) AS DOUBLE)
             * 1e2 / 10000 + 0.5) / 1e2 AS revenue,
       count(1) AS n_lines
FROM mc_lineitem li
JOIN mc_orders o    ON li.l_orderkey = o.o_orderkey
JOIN mc_customer c  ON o.o_custkey = c.c_custkey
JOIN mc_supplier s  ON li.l_suppkey = s.s_suppkey
JOIN (SELECT n_nationkey AS cnk, n_name AS cust_nation FROM mc_nation) cn
     ON c.c_nationkey = cnk
JOIN (SELECT n_nationkey AS snk, n_name AS supp_nation FROM mc_nation) sn
     ON s.s_nationkey = snk
WHERE (cust_nation = 'NATION_3' AND supp_nation = 'NATION_7')
   OR (cust_nation = 'NATION_7' AND supp_nation = 'NATION_3')
GROUP BY supp_nation, cust_nation, year(l_shipdate)
"""


def main() -> None:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("measure-composition")
    spark.sparkContext.setLogLevel("ERROR")
    fns = entry_mod.queries()
    fn = fns["q76_binational_volume"]

    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"mc_{t}")

    def sql_form():
        return spark.sql(SQL)

    # equivalence first — a composition benchmark of a WRONG query is noise
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, sql_form().collect()))
    assert a == b, f"SQL translation diverges: {a[:2]} vs {b[:2]}"
    print(f"equivalence OK ({len(a)} rows identical)")

    def time_compose(build) -> list[float]:
        out = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            build()
            out.append(time.perf_counter() - t0)
        return out

    def time_full(build) -> list[float]:
        out = []
        for _ in range(max(3, n_reps // 3)):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            out.append(time.perf_counter() - t0)
        return out

    chain_c = time_compose(lambda: fn(spark, sf_dir))
    sql_c = time_compose(sql_form)
    chain_f = time_full(lambda: fn(spark, sf_dir))
    sql_f = time_full(sql_form)

    mc, ms = statistics.median(chain_c), statistics.median(sql_c)
    fc, fs = statistics.median(chain_f), statistics.median(sql_f)
    print(f"compose-only median of {n_reps}: chain {mc*1000:.0f} ms | sql {ms*1000:.0f} ms | delta {(mc-ms)*1000:.0f} ms")
    print(f"full-run     median          : chain {fc:.3f} s | sql {fs:.3f} s | delta {(fc-fs)*1000:.0f} ms")
    print(
        f"projection: {(mc-ms)*1000:.0f} ms x ~300 chain-composed queries "
        f"~= {(mc-ms)*300:.0f} s per full bench IF every query translated "
        "at the same per-query saving (upper bound — heavier chains save "
        "more, trivial ones less)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
