"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's declared operator surface (SURVEY.md §2):
each entry is a thin wrapper over a ``hubverse_transform_spark`` library
operator, and ``oracle_sql()`` carries the equivalent DuckDB SQL. Both sides
alias every computed column identically and round floating aggregates the same
way, so the driver's order-insensitive value hash compares equal numbers.

Hash-sensitive design choices:
- md5/sha256 (not xxhash64) anywhere a hash value is part of a result, so SQL
  oracles reproduce signatures bit-for-bit;
- double aggregates rounded at the precision their magnitude supports
  (sums of ~1e9 -> 1 decimal; unit-scale avgs -> 6);
- every rank/limit has an explicit deterministic tie-break key.
"""

from __future__ import annotations

import os
import sys

# importable regardless of the harness's working directory
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hubverse_transform_spark.functions.text import (
    _LANG_PROFILES,
    _profile_hits,
    PII_PATTERNS,
    bpe_ish_token_count,
    chargram_min_fingerprint,
    lang_id_expr,
    pii_counts,
    quality_score,
    redact_pii,
    whitespace_token_count,
)
from hubverse_transform_spark.operators.asof import asof_join
from hubverse_transform_spark.operators.clusters import dedup_clusters
from hubverse_transform_spark.operators.dedup import (
    MINHASH_PRIME,
    SHINGLE_HASH_HEX,
    content_hash_dedup,
    minhash_lsh_pairs,
    minhash_params,
    minhash_signature,
    ngram_jaccard_pairs,
    shingle_ngrams,
    simhash,
    simhash_near_dup_pairs,
    ngram_containment,
    containment_prefix_pairs,
    chunk_dup_stats,
    edit_distance_pairs,
    minhash_lsh_incremental_pairs,
    winnow_fingerprints,
    winnow_overlap_pairs,
)
from hubverse_transform_spark.functions.numeric import half_up
from hubverse_transform_spark.operators.multimodal import decode_features, frame_sample
from hubverse_transform_spark.plans.curation import curation_funnel
from hubverse_transform_spark.operators.similarity import (
    _hyperplane,
    cosine_brute_force_topk,
    cosine_lsh_topk,
    embedding_near_dup_pairs,
    ivf_cosine_topk,
    pq_adc_topk,
    pq_reconstruction,
    semantic_dedup_reps,
)
from hubverse_transform_spark.operators.quality import partition_completeness
from hubverse_transform_spark.operators.graph import triangle_count
from hubverse_transform_spark.operators.sampling import (
    hash_split,
    per_group_cap,
    proportional_allocation_sample,
    split_thresholds,
    stratified_sample_exact,
)
from hubverse_transform_spark.operators.sessions import session_stats
from hubverse_transform_spark.operators.graph import pagerank
from hubverse_transform_spark.operators.textstats import (
    bm25_topk,
    dup_ngram_fraction,
    gopher_quality_rules,
    heavy_hitter_tokens,
    perplexity_buckets,
    pmi_bigrams,
    tfidf_top_terms,
    top_ngrams_per_group,
)
from hubverse_transform_spark.operators.topk import top_k_per_group
from hubverse_transform_spark.session import load_table
from hubverse_transform_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- engine-stable rounding of exact rationals -------------------------------
#
# round(double, d) of a value that is an exact integer ratio C/n (money
# averages, count averages, indicator rates) can land exactly on a half
# boundary, where Spark and DuckDB round the SAME double differently
# (seed-7 differential, commit 5af76d2).  floor(C * 10^d / n + 0.5)
# evaluates the identical IEEE operation sequence on both engines over an
# exact-integer numerator, so it cannot diverge.  Sites that average
# irrational-derived doubles instead carry a `# half-safe:` justification;
# tests/test_round_lint.py enforces one or the other on every
# F.round(F.avg(...))-shaped site.


def _half_up(num, den, d: int):
    """floor(num * 10^d / den + 0.5) / 10^d over an exact-integer numerator.

    ``num`` must be an exact-integer-valued column (e.g. a sum of cents /
    counts, already a LONG); ``den`` an exact-integer denominator expression
    (count, count*100, ...).  Oracle-side equivalent::

        floor(CAST(num AS DOUBLE) * 1e<d> / den + 0.5) / 1e<d>

    Negative-boundary semantics (deliberate, repo-wide): floor(x + 0.5) is
    HALF-UP — an exact negative half boundary rounds toward +inf
    (-50.5853125 at d=6 -> -50.585312), unlike round()'s half-away-from-zero
    (-> -50.585313).  The convention trades that last-digit display choice
    for cross-engine determinism; every display branch of a query must use
    the same form on both sides so the differential pins whichever
    convention the query uses.
    """
    p = F.lit(float(10**d))
    return F.floor(num.cast("double") * p / den + 0.5) / p


def _cents(col):
    """Exact integer cents of a 2-decimal money double.

    Round before the cast: DuckDB CAST(double AS BIGINT) rounds while Spark
    truncates, so the pre-round makes the cast exact and identical on both
    engines.  Oracle-side: CAST(round(col * 100) AS BIGINT).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def _intval(col):
    """Exact integer of an integer-valued double (quantities, counts).

    Oracle-side: CAST(round(col) AS BIGINT).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c).cast("long")


def _fixed(col, scale: int):
    """Exact integer of a fixed-grid double (value is a multiple of 1/scale,
    e.g. a per-row round(x, 4) output with scale=10000).

    Oracle-side: CAST(round(col * <scale>) AS BIGINT).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * scale).cast("long")


# =============================================================================
# Relational core (TPC-H-flavored; SURVEY.md §2.2 joins/aggs/windows/set-ops)
# =============================================================================


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate groupBy with filter pushdown (hash agg, partial+final)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            _half_up(F.sum(_cents("l_extendedprice")), F.lit(100), 1).alias("sum_base_price"),
            _half_up(F.sum(_fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)), F.lit(10000), 1).alias("sum_disc_price"),
            _half_up(F.sum(_intval("l_quantity")), F.count(F.lit(1)), 5).alias("avg_qty"),
            _half_up(F.sum(_cents("l_discount")), F.count(F.lit(1)) * 100, 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q02_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way join with broadcast dims (region/nation/customer) + agg."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            _half_up(F.sum(_fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)), F.lit(10000), 1).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q03_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + deterministic global top-10 (TakeOrderedAndProject)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-07-01").cast("timestamp")
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp")
    )
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    # exact-integer revenue (seed-271828 differential): the 2-dec price x
    # 2-dec discount product lives on a 1e-4 grid, so double sums rounded
    # at 2 decimals flip x.xx50 boundaries per engine. Sum exact 1e-4
    # units as BIGINT, rank on the exact sum, and take the 2-decimal
    # value by explicit half-up integer step.
    units = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
    ).cast("long")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey")
        .agg(F.sum(units).alias("_u"))
    )
    return (
        rev.orderBy(F.col("_u").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            (F.floor((F.col("_u") + 50) / 100) / 100.0).alias("revenue"),
        )
    )


def q04_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) + count by priority."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q05_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) + count by segment."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def q06_revenue_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure filter + single agg (all predicates pushed to the scan)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _half_up(F.sum(_fixed(F.col("l_extendedprice") * F.col("l_discount"), 10000)), F.lit(10000), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q07_topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number window."""
    p = _t(spark, sf_dir, "part")
    return top_k_per_group(
        p.select("p_brand", "p_partkey", "p_retailprice"),
        ["p_brand"],
        [F.col("p_retailprice").desc(), F.col("p_partkey")],
        3,
    )


def q08_setops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operations."""
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    cust_nations = n.join(c, n.n_nationkey == c.c_nationkey).select("n_name").distinct()
    supp_nations = n.join(s, n.n_nationkey == s.s_nationkey).select("n_name").distinct()
    both = cust_nations.intersect(supp_nations).withColumn("tag", F.lit("both"))
    cust_only = cust_nations.exceptAll(supp_nations).withColumn("tag", F.lit("cust_only"))
    return both.unionByName(cust_only)


def q09_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def q10_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group over a join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def q11_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date bucketing + agg over the events table."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def q12_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the props column."""
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _half_up(F.sum(_cents("value")), F.count(F.lit(1)) * 100, 6).alias("avg_value"),
        )
    )


def q13_part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions + agg."""
    p = _t(spark, sf_dir, "part")
    return (
        p.withColumn("type_word", F.split(F.col("p_type"), " ").getItem(0))
        .groupBy("type_word")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            _half_up(F.sum("p_size"), F.count(F.lit(1)), 6).alias("avg_size"),
            _half_up(F.sum(_cents("p_retailprice")), F.count(F.lit(1)) * 100, 4).alias("avg_price"),
        )
    )


def q14_asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click matched to the user's latest prior purchase."""
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("p_value"))
    )
    joined = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["p_value"],
    )
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.count("p_value_asof").alias("n_matched"),
        F.round(F.coalesce(F.sum("p_value_asof"), F.lit(0.0)), 4).alias("sum_purchase"),
    )


def q15_acctbal_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window aggregate as correlated-subquery replacement."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey")
    rich = (
        c.withColumn("nation_avg", F.avg("c_acctbal").over(w))
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
    )
    return (
        rich.join(F.broadcast(n), rich.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_rich"),
            _half_up(F.sum(_cents("c_acctbal")), F.count(F.lit(1)) * 100, 4).alias("avg_bal"),
        )
    )


def q16_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 combinations incl. grand total)."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


def q17_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows per customer: running sum, lag, sequence number."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(wr), 2).alias("running_total"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.row_number().over(w).alias("order_seq"),
    )


def q18_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join against a tiny broadcast band table."""
    li = _t(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [("low", 0, 10), ("mid", 11, 25), ("high", 26, 50)], ["band", "lo", "hi"]
    )
    return (
        li.join(
            F.broadcast(bands),
            (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") <= F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _half_up(F.sum(_cents("l_extendedprice")), F.lit(100), 1).alias("sum_price"),
        )
    )


def q19_disjunctive_pred_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-predicate join: OR'd (brand, size,
    quantity) groups spanning both sides of a broadcast part join. Exercises
    Catalyst's CNF predicate splitting — the per-table conjuncts it can
    extract from the OR groups push to each scan."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    grp = lambda brand, max_size, qlo, qhi: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, max_size)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(grp("Brand#11", 15, 1, 11) | grp("Brand#22", 25, 10, 20) | grp("Brand#33", 35, 20, 30))
        .groupBy("p_brand")
        .agg(
            _half_up(F.sum(_fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)), F.lit(10000), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# =============================================================================
# LLM-data-pipeline operators (SURVEY.md §2.3 [EXT])
# =============================================================================


def q20_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash exact dedup over documents."""
    d = _t(spark, sf_dir, "documents")
    return content_hash_dedup(d, "text", "doc_id")


def q21_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs, blocked by lang."""
    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        d, "doc_id", "text", ngram=3, threshold=0.1, block_col="lang"
    )
    return pairs.select("id_a", "id_b", half_up(F.col("jaccard"), 6).alias("jaccard"))


def q22_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (md5 family), rendered as a comparable string."""
    d = _t(spark, sf_dir, "documents")
    sig = minhash_signature(shingle_ngrams(F.col("text"), 3), 8)
    return d.select("doc_id", F.concat_ws(",", sig).alias("sig"))


def q23_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs verified by true Jaccard."""
    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        d, "doc_id", "text", ngram=3, num_hashes=8, bands=4, threshold=0.1
    )
    return pairs.select("id_a", "id_b", half_up(F.col("jaccard"), 6).alias("jaccard"))


def q24_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for query vectors vec_id < 10."""
    emb = _t(spark, sf_dir, "embeddings")
    out = cosine_brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 10), id_col="vec_id", vec_col="embedding", k=5
    )
    return out.select(
        "query_id", "neighbor_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank"
    )


def q25_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via the hyperplane-LSH bucketed path
    (the scale form: candidate pairs share a deterministic md5-plane bucket,
    so the self-join shuffles on bucket keys, never all-pairs and never a
    driver-side collect). The exact matmul form is kept as a test-only recall
    baseline (tests/test_similarity.py)."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(
        emb, threshold=0.3, exact=False, num_planes=4, dim=64
    )
    return pairs.select("id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim"))


def q26_text_quality_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality summary per language slice."""
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return (
        d.select(
            "lang",
            whitespace_token_count(t).alias("ws_tokens"),
            F.length(t).alias("chars"),
            quality_score(t).alias("quality"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("ws_tokens").alias("total_tokens"),
            _half_up(F.sum("chars"), F.count(F.lit(1)), 4).alias("avg_chars"),
            # quality is a per-row round(x,4) output => exact 1e-4 grid
            _half_up(F.sum(_fixed("quality", 10000)), F.count(F.lit(1)) * 10000, 4).alias("avg_quality"),
        )
    )


def q27_lang_guess_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID vs the labeled lang column."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("lang", lang_id_expr(F.col("text")).alias("lang_guess"))
        .groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q28_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 fingerprint over normalized text; keep-first semantics."""
    d = _t(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")))
    return (
        d.groupBy(fp.alias("fingerprint"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def q29_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling windows per event type (batch form of the
    streaming operator)."""
    e = _t(spark, sf_dir, "events")
    agg = tumbling_window_agg(
        e, ts_col="ts", window_duration="10 minutes", group_cols=["event_type"], watermark=None
    )
    return agg.select(
        F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
        F.round("avg_value", 6).alias("avg_value"),
    )


def q30_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding by 5 (each event in two windows)."""
    e = _t(spark, sf_dir, "events")
    agg = sliding_window_agg(
        e,
        ts_col="ts",
        window_duration="10 minutes",
        slide_duration="5 minutes",
        group_cols=["event_type"],
        watermark=None,
    )
    return agg.select(
        F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    )


def q31_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (5-minute gap) per user: session count + max size."""
    e = _t(spark, sf_dir, "events")
    sessions = session_window_agg(
        e, ts_col="ts", gap="5 minutes", group_cols=["user_id"], watermark=None
    )
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
    )


def q32_binary_bytes_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column handling: byte lengths of utf-8 payloads."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("source", F.octet_length(F.encode(F.col("text"), "utf-8")).alias("bytes"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("bytes").alias("total_bytes"),
        )
    )


def q33_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprints over 2-gram shingles."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", simhash(F.col("text"), bits=16, ngram=2).alias("simhash16"))


def q34_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per source: whitespace + BPE-ish pre-tokenizer regex."""
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return (
        d.select(
            "source",
            whitespace_token_count(t).alias("ws"),
            bpe_ish_token_count(t).alias("bpe"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_tokens"),
        )
    )


def q35_chargram_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling char-8-gram min-hash document fingerprints."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", chargram_min_fingerprint(F.col("text"), 8).alias("fp8"))


def q36_lsh_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed ANN top-3 (the scale path of q24); the
    deterministic md5-derived planes make it fully oracle-able."""
    emb = _t(spark, sf_dir, "embeddings")
    out = cosine_lsh_topk(
        emb,
        emb.filter(F.col("vec_id") < 5),
        id_col="vec_id",
        vec_col="embedding",
        k=3,
        num_planes=4,
        dim=64,
        probes=2,
    )
    return out.select(
        "query_id", "neighbor_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank"
    )


def q37_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via pigeonhole segment blocking; the blocked
    plan provably returns exactly the all-pairs hamming<=3 set. 32-bit
    fingerprints: at 16 bits random pairs alone pass hamming<=3 at ~1%
    (drowning true near-dups in n^2/100 noise pairs); at 32 bits the random
    rate is ~1.3e-6, so the result is the actual near-dup set and the
    8-bit segments block ~16x more selectively."""
    d = _t(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(d, "doc_id", "text", bits=32, ngram=2, max_hamming=3)


def q39_pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long->wide conditional aggregation) with explicit value list."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


def q40_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (matches quantile_cont).

    One array-argument percentile call per column: three scalar calls would
    each buffer the full value set per group (3x agg state); the array form
    sorts once and reads three order statistics.

    Scale note: exact ``percentile()`` buffers each group's column in one
    reducer — q206_group_quantiles_scalable is the DECLARED scale twin
    (rank selection over bounded distinct-value counts, no such buffer);
    q207 is the approx_percentile sketch form with its error audit."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))").alias("_p"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
    ).select(
        "l_returnflag",
        F.round(F.col("_p")[0], 4).alias("p25_price"),
        F.round(F.col("_p")[1], 4).alias("p50_price"),
        F.round(F.col("_p")[2], 4).alias("p75_price"),
        "median_qty",
    )


def q41_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: correlation + sample stddev/variance."""
    li = _t(spark, sf_dir, "lineitem")
    q = _intval("l_quantity")
    # corr/stddev are sqrt-derived (irrational — d-boundary hits have
    # measure zero under engine round()); var over INTEGER quantities is
    # an exact rational, so it moves to exact moments + floor half-up
    # (var_samp's streaming merge is engine- and order-dependent)
    # engine-native corr() throws under ANSI on zero variance (reachable
    # on degenerate tiers: a 1-row or all-equal group) — explicit guarded
    # moments, same formula in the oracle (tiny-tier hardening; the
    # value itself is unchanged where variance is positive)
    cx = F.col("l_quantity").cast("double")
    cy = F.col("l_extendedprice").cast("double")
    cn = F.count(F.lit(1)).cast("double")
    csx, csy = F.sum(cx), F.sum(cy)
    csxy, csxx, csyy = F.sum(cx * cy), F.sum(cx * cx), F.sum(cy * cy)
    cvx = cn * csxx - csx * csx
    cvy = cn * csyy - csy * csy
    m = li.groupBy("l_returnflag").agg(
        F.round(
            F.when(
                (cvx > 0) & (cvy > 0),
                (cn * csxy - csx * csy) / F.sqrt(cvx * cvy),
            ),
            6,
        ).alias("corr_qty_price"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(q).alias("_s1"),
        F.sum(q * q).alias("_s2"),
    )
    nd = F.col("n_rows").cast("double")
    var = (nd * F.col("_s2") - F.col("_s1").cast("double") * F.col("_s1")) / (
        nd * (F.col("n_rows") - 1)
    )
    return m.select(
        "l_returnflag",
        "corr_qty_price",
        "sd_price",
        half_up(var, 4).alias("var_qty"),
        "n_rows",
    )


def q42_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary multimodal plumbing inside an oracle-checked query:
    build binary assets from documents, run the mapInPandas feature extractor
    (fake decode = deterministic md5 digest), roll up per modality."""
    d = _t(spark, sf_dir, "documents")
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        F.col("source").alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
    )
    feats = decode_features(assets, fake=True)
    return feats.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("byte_len").alias("total_bytes"),
        F.countDistinct("feature").alias("distinct_features"),
    )


def q43_embedding_component_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array explode + aggregation: per-label element statistics over the
    flattened embedding components (posexplode keeps the dimension index)."""
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "x"))
        .filter(F.col("dim") < 4)
        .select("label", "dim", F.col("x").cast("double").alias("x"))
        .groupBy("label", "dim")
        .agg(
            # half-safe: continuous float32 components, not an integer
            # ratio; a d=6 half-boundary hit has measure zero
            F.round(F.avg("x"), 6).alias("avg_x"),
            F.round(F.min("x"), 6).alias("min_x"),
            F.round(F.max("x"), 6).alias("max_x"),
        )
    )


def q44_frame_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1->N mapInPandas batch shape inside an oracle-checked query: fabricate
    video assets from documents (duration derived from n_chars), sample one
    frame per second, count frames per source."""
    d = _t(spark, sf_dir, "documents")
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("video").alias("modality"),
        F.lit(None).cast("string").alias("mime_type"),
        F.lit(None).cast("binary").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.col("n_chars") * 10).alias("duration_ms"),
    )
    frames = frame_sample(assets, every_ms=1000, fake=True)
    joined = frames.join(
        d.select(F.col("doc_id").alias("asset_id"), "source"), on="asset_id"
    )
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.countDistinct("asset_id").alias("n_videos"),
        F.max("ts_ms").alias("max_ts_ms"),
    )


def q46_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint summary per document (char-8-grams, window 4):
    fingerprint count + lexicographic min — pins the whole fingerprint set."""
    d = _t(spark, sf_dir, "documents")
    fps = winnow_fingerprints(d, "doc_id", "text", k=8, window=4)
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.min("fp").alias("min_fp"),
    )


def q47_winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level overlap candidates: pairs sharing >= 40 winnowing
    fingerprints with document frequency <= 100. The synthetic corpus is
    template-heavy: without the df cap a handful of boilerplate fingerprints
    (df up to ~3.4k at sf0.1) dominate the inverted-index join at ~56× the
    volume while carrying no clone signal."""
    d = _t(spark, sf_dir, "documents")
    return winnow_overlap_pairs(
        d, "doc_id", "text", k=8, window=4, min_shared=40, max_df=100
    )


def q48_ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN top-5 (the inverted-list scale path of q24, sibling
    of the hyperplane-LSH path q36). Deterministic centroids = the 16
    lowest-id vectors, 4 probed lists per query."""
    emb = _t(spark, sf_dir, "embeddings")
    out = ivf_cosine_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        n_centroids=16,
        n_probe=4,
        k=5,
    )
    return out.select(
        "query_id", "neighbor_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank"
    )


def q49_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline: exact dedup -> quality gate ->
    SimHash near-dup removal, reported as per-stage survivor counts.
    Composes three independently-oracled operators into the funnel a
    pre-training data pipeline runs for real."""
    d = _t(spark, sf_dir, "documents")
    return curation_funnel(
        d, id_col="doc_id", text_col="text", min_quality=0.5,
        bits=32, ngram=2, max_hamming=3,
    )


def q45_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: connected components (iterative min-label
    propagation) over the 32-bit SimHash near-dup pair graph, with per-node
    component id and cluster size."""
    d = _t(spark, sf_dir, "documents")
    pairs = simhash_near_dup_pairs(d, "doc_id", "text", bits=32, ngram=2, max_hamming=3)
    return dedup_clusters(pairs)


def q38_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct with an in-engine tolerance audit. The
    raw sketch estimate is implementation-defined (merge-order dependent),
    so the OUTPUT carries the exact per-group distinct plus a boolean
    asserting the HLL++ estimate (rsd=0.02) landed within 5% (2.5σ) of it
    — oracle-matchable (oracle emits the exact count and literal TRUE)
    while still exercising the sketch path end-to-end. Measured max rel
    err at sf0.1 is 0.4%. At lake scale the exact countDistinct column is
    dropped and the estimate stands alone — this query is the calibration
    run that justifies that swap (same audit pattern as q207)."""
    e = _t(spark, sf_dir, "events")
    # tolerance = max(5% relative, 2 counts absolute): the sketch estimate
    # is integer-quantized, so at tiny per-group cardinalities (~20 users
    # on a scale-0.01 twin) a ±1 deviation exceeds any pure relative bound
    # (same discrete-floor reasoning as q207's rank guarantee)
    abs_err = F.abs(
        F.approx_count_distinct("user_id", 0.02) - F.countDistinct("user_id")
    )
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        (
            abs_err
            <= F.greatest(F.lit(2.0), 0.05 * F.countDistinct("user_id"))
        ).alias("approx_within_tol"),
    )


def q50_session_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gaps-and-islands sessionization (lag + conditional running sum
    exposing session ids — the analytic complement of q31's session_window):
    per-user session counts and duration statistics, 30-minute gap."""
    e = _t(spark, sf_dir, "events")
    return session_stats(e, ts_col="ts", user_col="user_id", gap_seconds=1800)


def q51_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: exactly min(25, |lang|) documents
    per language, ranked by md5(doc_id) so the 'random' order is
    reproducible across runs and engines."""
    d = _t(spark, sf_dir, "documents")
    return stratified_sample_exact(d, strata_col="lang", key_col="doc_id", k=25).select(
        "doc_id", "lang", "sample_rank"
    )


def q52_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document for doc_id < 50; document frequency
    and N computed over the full corpus."""
    d = _t(spark, sf_dir, "documents")
    return tfidf_top_terms(
        d, id_col="doc_id", text_col="text", k=3, query_filter=F.col("doc_id") < 50
    )


def q53_lone_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who alone were late on multi-supplier
    orders), reformulated as ONE aggregation over the order key instead of
    the textbook double self-join: per order, count distinct suppliers and
    distinct late suppliers (late = shipped > 60 days after order date on a
    finished order), keep orders with >1 supplier and exactly 1 late one,
    and credit that supplier. One shuffle of lineitem vs three for the
    EXISTS/NOT-EXISTS formulation — the rewrite that matters at 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = (
        li.join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", late.alias("late"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
            F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias("late_supp"),
        )
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .groupBy("late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(s, F.col("late_supp") == s.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


def q54_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer-join reconciliation of two independent aggregates (order
    spend per customer key vs purchase-event value per user key), classified
    into both / orders_only / events_only buckets."""
    o = _t(spark, sf_dir, "orders")
    e = _t(spark, sf_dir, "events")
    spend = o.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("spend"), F.count(F.lit(1)).alias("n_orders")
    )
    purch = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum("value").alias("purch_value"), F.count(F.lit(1)).alias("n_purch"))
    )
    side = (
        F.when(F.col("o_custkey").isNull(), F.lit("events_only"))
        .when(F.col("user_id").isNull(), F.lit("orders_only"))
        .otherwise(F.lit("both"))
    )
    return (
        spend.join(purch, spend.o_custkey == purch.user_id, "full_outer")
        .select(
            side.alias("side"),
            F.coalesce(F.col("spend"), F.lit(0.0)).alias("spend"),
            F.coalesce(F.col("purch_value"), F.lit(0.0)).alias("purch_value"),
        )
        .groupBy("side")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.round(F.sum("spend"), 2).alias("total_spend"),
            F.round(F.sum("purch_value"), 4).alias("total_purchase"),
        )
    )


def q56_moving_avg_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-interval window frame (value-based, peer-inclusive — vs the
    ROWS frames of q17): trailing 7-day moving average of order totals per
    customer, ordered by order date as epoch seconds."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-6 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        _half_up(
            F.sum(_cents("o_totalprice")).over(w),
            F.count(F.lit(1)).over(w) * 100,
            4,
        ).alias("mavg_7d"),
        F.count(F.lit(1)).over(w).alias("n_7d"),
    )


def q57_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup q09 nor cube q16 can express
    this set list) + grouping() null-vs-group disambiguation flags."""
    o = _t(spark, sf_dir, "orders")
    return o.groupingSets(
        [[F.col("o_orderstatus")], [F.col("o_orderpriority")], []],
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
    ).agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


def q58_chunked_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (lateral table function): chunk documents into 32-token
    windows with 8-token overlap — the pre-training/RAG context chunker.
    Each chunk is pinned by md5 so the oracle checks exact content."""
    from hubverse_transform_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d.createOrReplaceTempView("q58_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.chunk_hash
        FROM q58_docs d, LATERAL chunk_text(d.text, 32, 8) c
        """
    )


def q59_sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-entry-point query (temp view + spark.sql) with an uncorrelated
    scalar subquery in the predicate — parts priced above the global
    average, counted per brand."""
    _t(spark, sf_dir, "part").createOrReplaceTempView("q59_part")
    # avg of 2-decimal money is an exact cents ratio that genuinely lands
    # on the d=2 half boundary (sparse seed 577215: 1034.725 rounded
    # 1034.73 vs 1034.72 across engines) — exact-integer half-up, the SQL
    # spelling of _half_up, mirrored verbatim in the oracle
    return spark.sql(
        """
        SELECT p_brand, count(*) AS n_above,
               floor(CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS DOUBLE)
                     * 1e2 / (count(*) * 100) + 0.5) / 1e2 AS avg_above_price
        FROM q59_part
        WHERE p_retailprice > (SELECT avg(p_retailprice) FROM q59_part)
        GROUP BY p_brand
        """
    )


def q60_distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions not covered by q07/q17: ntile quartiles,
    percent_rank, cume_dist over customer balances per market segment
    (unique tie-break via custkey keeps every value deterministic)."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        # percent_rank/cume_dist are exact integer ratios ((r-1)/(n-1),
        # c/n) — engine-stable floor half-up, not round()
        half_up(F.percent_rank().over(w), 6).alias("pct_rank"),
        half_up(F.cume_dist().over(w), 6).alias("cume"),
    )


def q61_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: a legacy batch lacking o_orderpriority merged
    with a current batch via unionByName(allowMissingColumns=True) — the
    heterogeneous-parquet-generations shape every long-lived lake hits.
    Missing columns null-fill; the rollup splits legacy vs current."""
    o = _t(spark, sf_dir, "orders")
    legacy = o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_totalprice")
    current = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    merged = legacy.unionByName(current, allowMissingColumns=True)
    return merged.groupBy(
        F.coalesce(F.col("o_orderpriority"), F.lit("<legacy>")).alias("priority")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


def q62_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition detection (the boilerplate/low-entropy quality signal):
    per-document max-token-frequency ratio, rolled up per language."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.explode_outer(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term"),
    ).filter((F.col("term").isNotNull()) & (F.col("term") != ""))
    tf = toks.groupBy("doc_id", "lang", "term").agg(F.count(F.lit(1)).alias("tf"))
    per_doc = tf.groupBy("doc_id", "lang").agg(
        (F.max("tf").cast("double") / F.sum("tf").cast("double")).alias("rep_ratio")
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        # half-safe: mean of per-doc rationals a_i/b_i with heterogeneous
        # denominators b_i < 2e6; a d=6 half boundary needs the reduced
        # denominator to be exactly 2*10^6*odd — unreachable per-doc and
        # measure-zero for the float sum (seed campaign guards drift)
        F.round(F.avg("rep_ratio"), 6).alias("avg_rep"),
        F.round(F.max("rep_ratio"), 6).alias("max_rep"),
        F.sum(F.when(F.col("rep_ratio") > 0.1, 1).otherwise(0)).cast("bigint").alias("n_repetitive"),
    )


def q63_date_spine_densify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling densification: generate the full calendar spine between
    min and max event dates (sequence + explode) and left-join daily
    aggregates onto it, zero-filling silent days — the time-series shape
    dashboards and anomaly detectors need. The tiny daily aggregate is
    broadcast into the spine join."""
    e = _t(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    return spine.join(F.broadcast(daily), "day", "left").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


def q64_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide -> long, the inverse of q39's pivot): turn part's
    numeric metric columns into (metric, val) rows, then aggregate per
    brand and metric."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    long = p.unpivot(["p_partkey", "p_brand"], ["size", "retailprice"], "metric", "val")
    return long.groupBy("p_brand", "metric").agg(
        F.count(F.lit(1)).alias("n"),
        # both unpivoted metrics (int size, 2-dec retailprice) sit on the
        # exact 0.01 grid, so the avg numerator is an exact integer
        _half_up(F.sum(_fixed("val", 100)), F.count(F.lit(1)) * 100, 4).alias("avg_val"),
        F.round(F.sum("val"), 2).alias("sum_val"),
    )


def q65_kmeans_update_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration of spherical k-means (the iterative-ML primitive
    behind a production IVF quantizer): assign every vector to its nearest
    of the 16 deterministic centroids (q48's quantizer), then recompute
    centroid means (first 4 dims reported). Assignment is a broadcast cross
    join + single-shuffle argmax (max_by over a sim/centroid struct) —
    iterate = repeat this stage; no driver-side loops over vectors."""
    from hubverse_transform_spark.functions.vectors import cosine_similarity

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ve")
    )
    cents = (
        emb.orderBy("vec_id")
        .limit(16)
        .select(F.col("vec_id").alias("cid"), F.col("ve").alias("cv"))
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        *[F.element_at("ve", i + 1).alias(f"d{i + 1}") for i in range(4)],
        "cid",
        cosine_similarity(F.col("ve"), F.col("cv")).alias("sim"),
    )
    assigned = scored.groupBy("vec_id", "d1", "d2", "d3", "d4").agg(
        F.max_by("cid", F.struct(F.col("sim"), (-F.col("cid")).alias("neg"))).alias("cid")
    )
    return assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_assigned"),
        # half-safe: continuous float32 embedding components — not an
        # integer ratio; a d=6 half-boundary hit has measure zero
        *[F.round(F.avg(f"d{i + 1}"), 6).alias(f"c{i + 1}") for i in range(4)],
    )


def q55_extreme_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max/arg-min aggregates (max_by/min_by with a struct tie-break):
    richest and poorest customer per nation in a single hash aggregation —
    no window, no second shuffle."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max_by("c_name", F.struct("c_acctbal", "c_custkey")).alias("richest_customer"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.min_by("c_name", F.struct("c_acctbal", "c_custkey")).alias("poorest_customer"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


def q66_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts through a
    left join (customers with zero orders must appear). Aggregate orders by
    o_custkey FIRST (map-side partial combine on the fact table), then left
    join the small per-customer counts — the join moves one row per customer
    instead of one per order, the shuffle that matters at 100 TB."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    cnt = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    per_cust = c.join(cnt, c.c_custkey == cnt.o_custkey, "left").select(
        F.coalesce(F.col("n"), F.lit(0)).alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q67_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity lineitems, where "small"
    is a correlated per-part threshold (0.2 * that part's average quantity).
    Decorrelated as agg-then-join: both sides shuffle once on l_partkey
    (SMJ/hash co-partition); the part dim is broadcast. The threshold compare
    is deterministic across engines because l_quantity is integer-valued, so
    the per-part sum (exact in double) and IEEE divide/multiply reproduce."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    avgq = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")
    )
    small = (
        li.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(avgq, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
    )
    return (
        small.join(p, small.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            # exact cents close the order-dependent float-sum exposure: the
            # true value C/700 can never sit on a d=2 half boundary (odd
            # denominator 7), but the double sum's ulp noise is gone too
            _half_up(F.sum(_cents("l_extendedprice")), F.lit(700), 2).alias(
                "avg_yearly"
            ),
        )
    )


def q68_rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no urgent
    orders. Uncorrelated scalar subquery (1-row agg broadcast into a cross
    join — never collected to the driver) + left-anti join on a projected
    orders column (scan prunes to o_custkey + the pushed priority filter)."""
    c = _t(spark, sf_dir, "customer")
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    pos_avg = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("bal_thresh")
    )
    rich = c.crossJoin(F.broadcast(pos_avg)).filter(
        F.col("c_acctbal") > F.col("bal_thresh")
    )
    inactive = rich.join(urgent, rich.c_custkey == urgent.o_custkey, "left_anti")
    return inactive.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rich_inactive"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


def q69_excess_inventory_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (no partsupp table in the testdata, so "availability"
    is shipped volume): suppliers who moved > 50 units of any small part in
    1996, counted per nation. Nested-subquery chain decorrelated to
    semi-join -> agg -> semi-join; part filter is broadcast-semi pushed
    below the (l_suppkey, l_partkey) aggregation so the shuffle only carries
    qualifying lineitems. Integer-valued quantities sum exactly in double,
    so the > 50 cut is engine-independent."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    small_parts = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 15).select("p_partkey")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    shipped = (
        li.select("l_suppkey", "l_partkey", "l_quantity")
        .join(F.broadcast(small_parts), li.l_partkey == small_parts.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    excess = shipped.filter(F.col("qty") > 50).select("l_suppkey").distinct()
    return (
        s.join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )


BM25_QUERY_TERMS = ["join", "vector", "stream"]


def q70_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 keyword search over documents: top-10 docs for a 3-term
    query (the retrieval primitive behind corpus curation / eval search).
    See operators/textstats.bm25_topk for the shuffle layout."""
    d = _t(spark, sf_dir, "documents")
    return bm25_topk(d, BM25_QUERY_TERMS, k=10)


def q71_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigram collocations by PMI (phrase mining / tokenizer-merge
    candidates). True occurrence counts via one overlapping-match regex
    pass; see operators/textstats.pmi_bigrams."""
    d = _t(spark, sf_dir, "documents")
    return pmi_bigrams(d, min_count=5, k=20)


def _q72_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q72's edge build, exposed so the plan test can assert its join
    strategy directly: pagerank() eagerly localCheckpoints the
    fraction-folded edges, which truncates this subplan out of the final
    frame's explain output."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        # fact-fact self-join: force a shuffled hash join — broadcasting a
        # corpus-sized side is the local-mode plan that dies at cluster scale
        a.join(b.hint("shuffle_hash"), "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )


def q72_part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, d=0.85) over the part co-occurrence graph:
    parts are linked when they appear in the same order. Edge build is a
    self-join of lineitem on l_orderkey (distinct, self-pairs removed —
    symmetric by construction, so no dangling mass); then the iterative
    two-shuffle join/agg loop in operators/graph.pagerank. The oracle
    unrolls the same three iterations as SQL CTEs."""
    pairs = _q72_edges(spark, sf_dir)
    pr = pagerank(pairs, iterations=3, damping=0.85)
    return pr.select(F.col("node").alias("p_partkey"), F.round("pr", 6).alias("pr"))


def q73_correlated_avg_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar-aggregate subquery through the SQL surface: orders
    priced at more than 2x their own customer's average order. Catalyst
    decorrelates this into an aggregate + join (no per-row re-execution —
    verify with explain: one Aggregate on o_custkey feeding a join), the
    rewrite that makes correlated subqueries viable at 100 TB."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("q73_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_big,
               -- money avg -> exact cents ratio: engine-stable half-up
               -- (same class as q59; oracle mirrors verbatim)
               floor(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                     * 1e2 / (count(*) * 100) + 0.5) / 1e2 AS avg_big_price
        FROM q73_orders o
        WHERE o_totalprice > 2.0 * (SELECT avg(o2.o_totalprice)
                                    FROM q73_orders o2
                                    WHERE o2.o_custkey = o.o_custkey)
        GROUP BY o_orderpriority
        """
    )


def q74_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON via Spark 4's VariantType: parse_json once into
    a variant column, then typed variant_get extraction — the open-schema
    path that replaces per-field get_json_object string re-parsing (q12)
    with a single binary-encoded parse whose fields are extracted without
    re-tokenizing the JSON per access."""
    e = _t(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        "value",
        F.variant_get(F.parse_json("props"), "$.k", "bigint").alias("k"),
    )
    return (
        v.withColumn("k_decade", F.expr("k div 10"))
        .groupBy("event_type", "k_decade")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _half_up(F.sum(_cents("value")), F.count(F.lit(1)) * 100, 6).alias("avg_value"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


def q75_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (operators/quality.py): route lineitem
    rows through named expectations in ONE codegen projection, then the
    violation histogram with per-violation price stats — the
    profile-before-quarantine query every ingest pipeline runs. A check that
    never fails ('price_positive') yields no row on either engine."""
    from hubverse_transform_spark.operators.quality import (
        VIOLATIONS_COL,
        with_expectations,
    )

    li = _t(spark, sf_dir, "lineitem")
    checks = {
        "discount_cap": F.col("l_discount") <= 0.05,
        "qty_cap": F.col("l_quantity") <= 45,
        "tax_band": F.col("l_tax") < 0.04,
        "price_positive": F.col("l_extendedprice") > 0,
    }
    bad = with_expectations(li, checks).filter(F.size(VIOLATIONS_COL) > 0)
    return (
        bad.select(
            F.explode(VIOLATIONS_COL).alias("violation"), "l_extendedprice"
        )
        .groupBy("violation")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            _half_up(F.sum(_cents("l_extendedprice")), F.count(F.lit(1)) * 100, 2).alias("avg_price"),
        )
    )


def q76_binational_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year, in both
    directions. Five-way join where the fact table joins two *different*
    dimension roles (customer nation vs supplier nation) of the same
    broadcast nation table; the disjunctive nation-pair predicate applies
    after both roles resolve."""
    n1, n2 = "NATION_3", "NATION_7"
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cnk"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("snk"))
        .filter(
            ((F.col("cust_nation") == n1) & (F.col("supp_nation") == n2))
            | ((F.col("cust_nation") == n2) & (F.col("supp_nation") == n1))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            _half_up(
                F.sum(_fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)),
                F.lit(10000),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q77_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of total revenue by year — the
    conditional-fraction aggregate sum(CASE)/sum(all) computed in a single
    hash aggregation, no second pass over the joined fact."""
    target = "NATION_5"
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # exact 1e-4 revenue units (the 2-dec price x 2-dec discount grid): both
    # sums are exact BIGINTs, the share is a deterministic integer ratio, and
    # the floor half-up evaluates identically on both engines — closes the
    # order-dependent float-sum share exposure (round-9 share-class sweep)
    u = _fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            _half_up(
                F.sum(F.when(F.col("n_name") == target, u).otherwise(F.lit(0))),
                F.sum(u),
                6,
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q78_frame_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame navigation: first_value / last_value / nth_value over a
    running frame per customer — each order sees the customer's first order
    price, the latest-so-far, and the second ever (null until it exists).
    Bounded output check for frame semantics both engines must agree on."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.first_value("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last_value("o_totalprice").over(w), 2).alias("latest_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
    )


def q79_vector_hof_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions as the vector-stats kernel: one
    projection computes L2 norm (aggregate), negative-component count
    (filter), max |x| (transform + array_max), and an exists flag per
    embedding — all JVM-side lambda evaluation, no Python — then rolls up
    per label. Embeddings cast float->double on BOTH engines before any
    arithmetic (float32 rounding is not reproducible across engines);
    left-to-right HOF folds make the per-row sums order-deterministic."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("ve")
    )
    l2 = F.sqrt(F.aggregate("ve", F.lit(0.0), lambda acc, x: acc + x * x))
    n_neg = F.size(F.filter("ve", lambda x: x < 0))
    max_abs = F.array_max(F.transform("ve", lambda x: F.abs(x)))
    spiky = F.exists("ve", lambda x: F.abs(x) > 2.0)
    per_vec = emb.select(
        "label",
        l2.alias("l2"),
        n_neg.alias("n_neg"),
        max_abs.alias("max_abs"),
        spiky.cast("long").alias("spiky"),
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        # half-safe: l2 is a sqrt (irrational) — not an integer ratio; a
        # d=6 half-boundary hit has measure zero
        F.round(F.avg("l2"), 6).alias("avg_l2"),
        F.sum("n_neg").cast("bigint").alias("total_neg"),
        F.round(F.max("max_abs"), 6).alias("corpus_max_abs"),
        F.sum("spiky").cast("bigint").alias("n_spiky"),
    )


def q80_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel (view -> click -> purchase) in ONE shuffle:
    collect each user's (ts, type) events into a sorted struct array, then
    pure HOF scans find the first view, the first click after it, and the
    first purchase after that. The relational formulation (the oracle) needs
    three grouped joins against the events table — three shuffles of the
    fact; this shape shuffles it once and state per user is their own event
    list, the standard product-analytics funnel at scale."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "event_type"))).alias("seq")
    )

    def first_after(typ, after):
        hits = F.filter(
            "seq", lambda s: (s.event_type == typ) & (s.ts > after)
        )
        return F.when(F.size(hits) > 0, hits[0].ts)

    staged = per_user.select(
        "seq",
        F.when(
            F.size(F.filter("seq", lambda s: s.event_type == "view")) > 0,
            F.filter("seq", lambda s: s.event_type == "view")[0].ts,
        ).alias("t_view"),
    )
    staged = staged.select(
        "seq", "t_view", first_after("click", F.col("t_view")).alias("t_click")
    )
    staged = staged.select(
        "t_view", "t_click", first_after("purchase", F.col("t_click")).alias("t_purchase")
    )
    return staged.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("t_view").isNotNull().cast("long")).alias("n_viewed"),
        F.sum(F.col("t_click").isNotNull().cast("long")).alias("n_clicked_after"),
        F.sum(F.col("t_purchase").isNotNull().cast("long")).alias("n_purchased_after"),
    )


def q81_trimmed_mean_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate Pandas UDF (the UDAF surface): 10% trimmed mean of
    part retail price per brand, mixed in one groupBy with JVM built-ins.
    The oracle reproduces the trim with window ranks. Python is justified
    here only as API coverage — a production trimmed mean at 100 TB would
    use approx quantile cuts + a JVM conditional average."""
    from hubverse_transform_spark.functions.pandas_aggs import trimmed_mean_10

    p = _t(spark, sf_dir, "part")
    # Spark disallows mixing GROUPED_AGG pandas UDFs with JVM aggregates in
    # one agg ([INVALID_PANDAS_UDF_PLACEMENT]); run the two aggregations
    # over the same shuffle key and join the per-brand results (broadcast —
    # brand cardinality is tiny)
    # the UDAF returns an exact-cents-over-one-IEEE-division double, and
    # avg_price is the same exact ratio — both can sit ON a d=4 half
    # boundary, so display via the engine-stable floor half-up, not round()
    trimmed = p.groupBy("p_brand").agg(
        half_up(trimmed_mean_10("p_retailprice"), 4).alias("trimmed_avg_price")
    )
    cents = F.round(F.col("p_retailprice") * 100).cast("bigint")
    plain = p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        half_up(
            F.sum(cents).cast("double") / (100.0 * F.count(F.lit(1))), 4
        ).alias("avg_price"),
    )
    return plain.join(F.broadcast(trimmed), "p_brand").select(
        "p_brand", "n_parts", "trimmed_avg_price", "avg_price"
    )


def q82_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join (entity resolution): distinct part names that
    share their final token (the block key) and sit within levenshtein
    distance 3. Blocking turns the quadratic all-pairs edit-distance scan
    into per-block candidate sets — the standard record-linkage shape;
    levenshtein evaluates only inside blocks, after the equi-join."""
    names = (
        _t(spark, sf_dir, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
        .withColumn("noun", F.element_at(F.split("name", " "), -1))
    )
    a = names.alias("a")
    b = names.alias("b")
    return (
        a.join(b, "noun")
        .filter(F.col("a.name") < F.col("b.name"))
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.levenshtein(F.col("a.name"), F.col("b.name")).cast("bigint").alias("dist"),
        )
        .filter(F.col("dist") <= 3)
    )


def q83_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiling of orders (operators/profiling.py): one
    aggregation computes nulls / exact distincts / min / max for every
    column, one row per column out — the lake-health query, never one scan
    per column. Timestamps render in their string form on both engines
    (UTC session + DuckDB's naive-timestamp text format agree)."""
    from hubverse_transform_spark.operators.profiling import profile_columns

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    return profile_columns(o)


def q84_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot change detection (operators/diff.py): derive two
    deterministic 'versions' of orders — the old one missing every 10th
    order, the new one with bumped prices on every 7th — and classify every
    key added/removed/changed/unchanged via one full-outer join on
    (key, md5 digest). Summary counts per change type."""
    from hubverse_transform_spark.operators.diff import snapshot_diff

    o = _t(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.round(F.col("o_totalprice") * 1.1, 2)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    d = snapshot_diff(old, new, "o_orderkey", ["o_orderstatus", "o_totalprice"])
    return d.groupBy("change").agg(F.count(F.lit(1)).alias("n_orders"))


def q85_lateral_top_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join (SQL surface): each order picks its single
    priciest lineitem through a lateral ORDER BY ... LIMIT 1 subquery —
    the per-row top-k idiom Catalyst rewrites into a join + per-key limit
    rather than executing the subquery per order."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("q85_orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("q85_lineitem")
    return spark.sql(
        """
        SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
        FROM q85_orders o, LATERAL (
            SELECT l_linenumber, l_extendedprice FROM q85_lineitem li
            WHERE li.l_orderkey = o.o_orderkey
            ORDER BY l_extendedprice DESC, l_linenumber LIMIT 1
        ) l
        WHERE o.o_orderkey < 2000
        """
    )


def q86_multiset_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations — intersectAll / exceptAll keep
    duplicate multiplicities, which the q08 DISTINCT forms erase: supplier
    keys of high-discount vs late-shipped lineitems, with per-op row counts
    proving multiplicity preservation."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_discount") >= 0.08).select("l_suppkey")
    b = li.filter(
        F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("l_suppkey")
    inter = a.intersectAll(b).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("intersect_all").alias("op"), "n"
    )
    exc = a.exceptAll(b).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("except_all").alias("op"), "n"
    )
    return inter.unionByName(exc)


def q87_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): nullable derived
    keys where NULL must match NULL — the semantics ordinary equi-joins
    silently drop. Counts matches split by null-key vs value-key."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey")
    key = F.when(F.col("n_nationkey") % 5 == 0, F.lit(None)).otherwise(
        F.col("n_nationkey")
    )
    a = n.select(key.alias("ka"))
    b = n.select(key.alias("kb"))
    joined = a.join(b, F.col("ka").eqNullSafe(F.col("kb")))
    return joined.groupBy(F.col("ka").isNull().alias("is_null_key")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


def q88_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total (ratio_to_report): each nation's share of global
    revenue via an unpartitioned window over the ALREADY-AGGREGATED
    25-row result — the window sees one row per nation, never the fact
    table, so the 'move everything to one partition' hazard is bounded by
    dimension cardinality."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # exact 1e-4 revenue units: the d=1 display of a 1e-4-grid sum straddles
    # x.x5 and the share is a ratio of order-dependent float sums — both
    # closed by summing exact BIGINT units (round-9 share-class sweep)
    rev = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                _fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
            ).alias("_u")
        )
    )
    w = Window.partitionBy()
    return rev.select(
        "n_name",
        _half_up(F.col("_u"), F.lit(10000), 1).alias("revenue"),
        _half_up(F.col("_u"), F.sum("_u").over(w), 6).alias("share"),
    )


def q89_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer, top 20
    by lost revenue. Join + agg + global TakeOrdered with explicit
    tie-break; customer/nation broadcast into the fact stream."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _half_up(
                F.sum(_fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)),
                F.lit(10000),
                2,
            ).alias("lost_revenue")
        )
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q90_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (no l_shipmode column in the testdata, so the split
    key is the ship-delay bucket): late vs on-time lineitems per order
    priority class, conditional counts in one aggregation."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate").cast("date"), 60)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(late.alias("is_late"))
        .agg(
            F.sum(high.cast("long")).alias("high_priority_lines"),
            F.sum((~high).cast("long")).alias("low_priority_lines"),
        )
    )


def q91_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue where the customer and supplier share a
    nation — the equality rides BETWEEN two fact-side foreign keys, so the
    nation dim joins once and the same-nation predicate filters the joined
    stream (not a second dim join)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            _half_up(
                F.sum(_fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)),
                F.lit(10000),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q92_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe error handling: try_divide yields NULL (not an exception,
    not Inf) where the tax divisor is zero, and try_to_number NULLs
    unparseable strings — the per-row error channel for dirty data, per
    order-priority class."""
    li = _t(spark, sf_dir, "lineitem")
    ratio = F.try_divide(F.col("l_discount"), F.col("l_tax"))
    # the ratio is (disc_cents / tax_cents) with tax_cents in 1..8, so
    # ratio * 840 (lcm 1..8) is an exact integer — the avg converts to the
    # engine-stable half-up form over an exact numerator
    dc, tc = _cents("l_discount"), _cents("l_tax")
    r840 = F.when(tc != 0, (dc * 840 / tc).cast("long"))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(ratio.isNull().cast("long")).alias("n_null_ratio"),
            _half_up(F.sum(r840), F.count(r840) * 840, 6).alias("avg_ratio"),
        )
    )


def q93_decimal_exact_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decimal money math: cast prices to DECIMAL(18,2) BEFORE
    aggregation so the revenue sum is exact by type, not
    by-rounding-convention — the accounting-grade alternative to double
    sums, associative and engine-independent without any round() hedging."""
    li = _t(spark, sf_dir, "lineitem")
    dec = F.col("l_extendedprice").cast("decimal(18,2)")
    return (
        li.groupBy("l_linestatus")
        .agg(
            # the SUM is exact decimal math; the final single cast to double
            # is deterministic (nearest double of the same exact value on any
            # engine) and sidesteps Decimal trailing-zero formatting drift
            F.sum(dec).cast("double").alias("exact_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q94_status_count_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType as a first-class column: per order priority, build a
    status -> count map (map_from_entries over collected structs) and
    extract typed values with element_at — the open-keyed aggregation
    shape. The oracle proves the SAME values via conditional sums; the map
    is the Spark-side representation under test."""
    o = _t(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    mapped = counts.groupBy("o_orderpriority").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderstatus", "n")))
        ).alias("m")
    )
    return mapped.select(
        "o_orderpriority",
        F.coalesce(F.element_at("m", "F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.element_at("m", "O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.element_at("m", "P"), F.lit(0)).alias("n_p"),
        F.size("m").alias("n_statuses"),
    )


def q95_top_customer_roster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg): the three richest
    customers per market segment as one comma-joined, rank-ordered string.
    Rank via per-group window top-k, then sort_array(collect_list(struct))
    preserves rank order inside the aggregation — the deterministic form of
    Spark's unordered collect_list."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    top = c.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)
    return top.groupBy("c_mktsegment").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("rk", "c_name"))),
                lambda s: s.c_name,
            ),
            ",",
        ).alias("roster"),
        F.round(F.sum("c_acctbal"), 2).alias("top3_balance"),
    )


def q96_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (array_union / array_intersect / array_except)
    against a constant stopword list, per document — the set-column kernel
    (dedup vocabularies, tag algebra). Sizes only, so element order never
    matters; rolled up per language."""
    stop = F.array(*[F.lit(w) for w in ["the", "a", "and", "of", "to"]])
    d = _t(spark, sf_dir, "documents")
    toks = F.array_distinct(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    )
    per_doc = d.select(
        "lang",
        F.size(F.array_union(toks, stop)).alias("n_union"),
        F.size(F.array_intersect(toks, stop)).alias("n_stop_hits"),
        F.size(F.array_except(toks, stop)).alias("n_content"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_union").cast("bigint").alias("total_union"),
        F.sum("n_stop_hits").cast("bigint").alias("total_stop_hits"),
        F.sum("n_content").cast("bigint").alias("total_content"),
    )


def q97_temporal_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal function breadth: quarter truncation, day-of-week, month-end
    snapping, and month arithmetic — grouped by quarter with day-of-week
    distribution, the calendar semantics batch reports live on."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.date_format(F.date_trunc("quarter", "o_orderdate"), "yyyy-MM-dd").alias("qtr"),
            F.dayofweek("o_orderdate").alias("dow"),
            F.date_format(
                F.last_day(F.col("o_orderdate").cast("date")), "yyyy-MM-dd"
            ).alias("month_end"),
            F.datediff(
                F.lit("1997-01-01").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("days_to_97"),
        )
        .groupBy("qtr")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum((F.col("dow") == 1).cast("long")).alias("n_sunday"),
            F.count_distinct("month_end").alias("n_month_ends"),
            _half_up(F.sum("days_to_97"), F.count(F.lit(1)), 4).alias("avg_days_to_97"),
        )
    )


def q98_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill / LOCF (last observation carried forward): sparse
    per-user readings (every 3rd event keeps its value, the rest null) are
    gap-filled with last(ignorenulls) over an ordered running frame — the
    time-series imputation primitive. Rolled up per user to keep the
    output compact."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    sparse = e.select(
        "user_id",
        "ts",
        "event_type",
        "value",
        F.when((F.col("user_id") + F.dayofmonth("ts")) % 3 == 0, F.col("value")).alias(
            "reading"
        ),
    )
    # explicit total order: ts ties (same user, same instant) must fill the
    # same way on every engine
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_type", "value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = sparse.select(
        "user_id",
        F.last("reading", ignorenulls=True).over(w).alias("filled"),
    )
    return filled.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("filled").isNull().cast("long")).alias("n_still_null"),
        F.round(F.sum("filled"), 4).alias("sum_filled"),
    )


def q99_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation: per market
    segment, MAD = median(|bal - median(bal)|), outliers are rows more than
    3 MADs from the median. Two exact-median aggregation levels with the
    per-segment medians broadcast back — the mean/stddev-free outlier gate
    that survives heavy tails."""
    # balances are exact cents: run the whole median/MAD pipeline on integer
    # cents so every interpolated midpoint (k/2) and 3*MAD comparison is an
    # exact double, immune to interpolation-order fp drift (see q81)
    c = _t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    med = c.groupBy("c_mktsegment").agg(
        F.expr("percentile(cents, 0.5)").alias("med")
    )
    dev = c.join(F.broadcast(med), "c_mktsegment").select(
        "c_mktsegment", "med",
        F.abs(F.col("cents") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("c_mktsegment").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "c_mktsegment")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            # med/mad are exact k or k.5 cents (midpoint interpolation);
            # round(x.xx5 double, 2) disagrees across engines on the SAME
            # double, so take whole cents by explicit half-up floor(x+.5)
            (F.floor(F.min("med") + F.lit(0.5)) / 100.0).alias("median_bal"),
            (F.floor(F.min("mad") + F.lit(0.5)) / 100.0).alias("mad_bal"),
            F.sum(
                (F.col("adev") > 3 * F.col("mad")).cast("long")
            ).alias("n_outliers"),
        )
    )


def q100_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen month, counted
    as active per subsequent month — the product-analytics staple. First-
    seen is one aggregation; the (cohort, activity-month) matrix is a
    distinct-user count after joining the cohort table back (per-user —
    data-sized, so unhinted: AQE broadcasts while small, shuffles at lake
    scale)."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias("month")
    )
    cohort = e.groupBy("user_id").agg(F.min("month").alias("cohort_month"))
    return (
        e.join(cohort, "user_id")
        .groupBy("cohort_month", F.col("month").alias("active_month"))
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def q101_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by md5(doc_id)
    (operators/sampling.hash_split): a stateless projection whose hex-
    threshold bucketing is reproducible in any engine, rolled up to split ×
    lang membership counts and average document length."""
    d = _t(spark, sf_dir, "documents")
    return (
        hash_split(d, "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            _half_up(F.sum("n_chars"), F.count(F.lit(1)), 6).alias("avg_chars"),
        )
    )


def q102_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.ngram_containment):
    word-3-gram containment of every corpus document (sources src2+)
    against the held-out benchmark sources src0/src1; docs at >= 0.5
    containment are contamination candidates. Benchmark vocabulary is
    broadcast; the corpus side never shuffles its shingles."""
    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("source").isin("src0", "src1"))
    corpus = d.filter(~F.col("source").isin("src0", "src1"))
    return ngram_containment(
        corpus, bench, "doc_id", "text", ngram=3, threshold=0.5
    )


def q103_weighted_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sample allocation
    (operators/sampling.proportional_allocation_sample): 100 sample slots
    distributed across sources proportional to each source's character
    mass (exact integer division), filled by md5-rank within the source."""
    d = _t(spark, sf_dir, "documents")
    return proportional_allocation_sample(
        d, strata_col="source", weight_col="n_chars", key_col="doc_id", total_k=100
    ).select("doc_id", "source", "sample_rank")


def q104_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication
    (operators/similarity.semantic_dedup_reps): embeddings cluster to their
    nearest deterministic coarse centroid, and each cluster keeps the
    member most similar to that centroid as its representative — cluster
    population and representative similarity per centroid."""
    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup_reps(emb, id_col="vec_id", vec_col="embedding", n_centroids=16)


def q105_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit (operators/quality.
    referential_integrity_audit): orphan and null-FK counts for the star
    schema's five core foreign keys, one broadcast anti-join per relation,
    unioned into a long-format report."""
    from hubverse_transform_spark.operators.quality import referential_integrity_audit

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return referential_integrity_audit(
        [
            ("lineitem.orderkey", li, "l_orderkey", o, "o_orderkey"),
            ("orders.custkey", o, "o_custkey", c, "c_custkey"),
            ("customer.nationkey", c, "c_nationkey", n, "n_nationkey"),
            ("supplier.nationkey", s, "s_nationkey", n, "n_nationkey"),
            ("nation.regionkey", n, "n_regionkey", r, "r_regionkey"),
        ]
    )


def q106_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of lineitem extended price: fixed 5000-wide
    buckets via floor division (engine-portable, no percentile state),
    with per-bucket row count and revenue mass — the single-pass
    distribution sketch behind every data-explorer bar chart."""
    li = _t(spark, sf_dir, "lineitem")
    bucket = F.floor(F.col("l_extendedprice") / 5000).cast("long")
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("bucket_revenue"),
        )
        .select(
            "bucket",
            (F.col("bucket") * 5000).alias("price_lo"),
            "n_items",
            "bucket_revenue",
        )
    )


def q110_binned_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable range join (operators/rangejoin.binned_interval_join): price
    bands joined by bin equi-keys instead of a nested loop — intervals
    replicate into fixed-width bins, the join is an ordinary hash join on
    the bin id, and the exact BETWEEN filters residual collisions. Same
    answer as the q18-style broadcast loop, but the plan survives an
    interval side too big to broadcast. Bands overlap deliberately: a point
    can match two bands, and does."""
    from hubverse_transform_spark.operators.rangejoin import binned_interval_join

    li = _t(spark, sf_dir, "lineitem").select("l_extendedprice")
    bands = spark.createDataFrame(
        [("budget", 0.0, 20000.0), ("mid", 15000.0, 40000.0), ("premium", 35000.0, 70000.0)],
        ["band", "lo", "hi"],
    )
    return (
        binned_interval_join(li, bands, "l_extendedprice", "lo", "hi", bin_width=10000.0)
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _half_up(F.sum(_cents("l_extendedprice")), F.lit(100), 1).alias("sum_price"),
        )
    )


def q107_scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 reconstruction (operators/scd.build_scd2): collapse each
    customer's order-priority observations into effective-dated version
    intervals — gaps-and-islands on attribute CHANGE (the sibling of time-gap
    sessionization), one shuffle for the whole window+rollup+lead chain."""
    from hubverse_transform_spark.operators.scd import build_scd2

    o = _t(spark, sf_dir, "orders")
    return build_scd2(
        o,
        key_col="o_custkey",
        attr_col="o_orderpriority",
        ts_col="o_orderdate",
        tiebreak_col="o_orderkey",
    )


def q108_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of embeddings (vector compression for ANN
    serving): per-vector min/max affine scale to 0..255 codes, dequantize,
    and report per-label reconstruction error — everything in JVM array
    HOFs over one scan, no UDF, no shuffle before the tiny label rollup."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    mn, mx = F.array_min("v"), F.array_max("v")
    scale = (mx - mn) / F.lit(255.0)
    codes = F.transform("v", lambda x: F.round((x - mn) / scale))
    recon = F.transform(codes, lambda c: mn + c * scale)
    sq = F.zip_with("v", recon, lambda a, b: (a - b) * (a - b))
    mse = F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x) / F.size("v")
    per_vec = emb.filter(mx > mn).select("vec_id", "label", mse.alias("mse"))
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        # half-safe: mse is continuous float arithmetic (affine quantization
        # residuals), not an integer ratio — boundary hits have measure zero
        F.round(F.avg("mse") * 1e6, 6).alias("avg_mse_ppm"),
        F.round(F.max("mse") * 1e6, 6).alias("max_mse_ppm"),
    )


def q109_hll_union_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: per-day HLL sketches of active
    users unioned into per-week estimates (hll_sketch_agg -> hll_union_agg)
    — the re-aggregatable pre-cube pattern that replaces count_distinct at
    lake scale, where exact distincts cannot roll up. Sketch estimates are
    implementation-defined, so this entry is rows-only checked (tolerance
    asserted in-tool by tools/check_oracle.py against the exact weekly
    distinct)."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    return (
        daily.groupBy(F.weekofyear("day").alias("week"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )


def q111_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: monthly share of revenue from promo-type parts — a
    conditional-fraction aggregate over one broadcast part join; the CASE
    folds into the single aggregation pass (no second scan for the
    numerator)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    # exact 1e-4 revenue units close the float-sum share exposure; the 100x
    # percent scale folds into the double-side multiplier (1e6 = 100 * 1e4)
    # so the numerator BIGINT cannot overflow at any scale factor
    u = _fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    promo_u = F.when(F.col("p_type").startswith("PROMO"), u).otherwise(F.lit(0))
    return (
        li.join(p.select("p_partkey", "p_type"),
                F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("month"))
        .agg(
            (
                F.floor(
                    F.sum(promo_u).cast("double") * 1e6 / F.sum(u) + F.lit(0.5)
                )
                / F.lit(1e4)
            ).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q112_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum 1996-H1 revenue. The
    textbook view+subquery becomes one aggregation plus a broadcast scalar
    max + equality filter (ties all kept, as Q15 requires) — no re-scan of
    lineitem for the max, and no rank-1 window: a global rank over the
    per-supplier aggregate would funnel every supplier row through one
    partition, a frame that GROWS with scale factor (the r3 verdict's
    standardize-global-rank item)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-07-01")
        )
        .groupBy("l_suppkey")
        .agg(_half_up(F.sum(_fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)), F.lit(10000), 2).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    top = (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("_mx"))
        .drop("_mx")
    )
    return top.join(s, F.col("l_suppkey") == F.col("s_suppkey")).select(
        "s_suppkey", "s_name", "total_rev"
    )


def q113_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with orders whose total quantity exceeds
    250 — the HAVING-subquery becomes an aggregate on the fact key joined
    back to orders/customer; the big-order key set is tiny, so both
    enrichment joins it unhinted (per-order aggregate — fact-sized, so a
    forced broadcast would be the local-mode plan; AQE picks)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


def q114_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM fluency scoring (textstats.unigram_logprob_scores): per-document
    average unigram negative log-probability under a corpus-fit add-one-
    smoothed model — the KenLM-style filter signal; token-keyed model table
    broadcast into the per-doc rollup."""
    from hubverse_transform_spark.operators.textstats import unigram_logprob_scores

    d = _t(spark, sf_dir, "documents")
    return unigram_logprob_scores(d, id_col="doc_id", text_col="text")


def q115_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining sequence packing: documents concatenate in deterministic
    order into fixed-capacity token windows (streaming first-fit — the
    standard concat-then-split packing). A running token sum over (lang,
    doc_id) order assigns each doc its window id by integer division; the
    rollup reports docs and token fill per window. One shuffle on the
    packing key; the window function and rollup share the same sort."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("n_tokens"),
    )
    capacity = 2048
    packed = toks.withColumn(
        "window_id",
        F.expr(f"(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id "
               f"ROWS UNBOUNDED PRECEDING) - n_tokens) div {capacity}"),
    )
    return packed.groupBy("lang", "window_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("window_tokens"),
    )


def q116_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile: the count-of-counts histogram for lineitem's
    two main join keys — rows per key bucketed by log10 magnitude, plus the
    max single-key load. This is the diagnostic run BEFORE choosing a join
    strategy (broadcast / salting / AQE skew split — operators/skew.py); two
    cheap aggregations per key, unioned."""
    li = _t(spark, sf_dir, "lineitem")

    def profile(key: str) -> DataFrame:
        per_key = li.groupBy(F.col(key).alias("_k")).agg(
            F.count(F.lit(1)).alias("_n")
        )
        bucket = F.length(F.col("_n").cast("string")).alias("magnitude")
        return per_key.groupBy(bucket).agg(
            F.lit(key).alias("key"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("_n").alias("n_rows"),
            F.max("_n").alias("max_rows_per_key"),
        ).select("key", "magnitude", "n_keys", "n_rows", "max_rows_per_key")

    return profile("l_orderkey").unionAll(profile("l_partkey"))


def q117_mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: aggregate the order series to months,
    then lag + percent-change over the (tiny) aggregated frame — the
    time-series growth report every dashboard ships. The window runs on the
    post-aggregation series, so its single-partition sort touches months,
    not orders."""
    o = _t(spark, sf_dir, "orders")
    # exact cent sums: the monthly series and the percent change both become
    # deterministic integer ratios (the old float sum was order-dependent
    # and its round(.,2)/round(.,4) could straddle a half boundary); 1e6 =
    # 100 (percent) * 1e4 (d=4), applied double-side so no BIGINT overflow
    monthly = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
    ).agg(F.sum(_cents("o_totalprice")).alias("_u"))
    w = Window.orderBy("month")
    prev = F.lag("_u").over(w)
    return monthly.select(
        "month",
        F.round(F.col("_u") / 100.0, 2).alias("revenue"),
        (
            F.floor((F.col("_u") - prev).cast("double") * 1e6 / prev + F.lit(0.5))
            / F.lit(1e4)
        ).alias("mom_pct"),
    )


def q118_status_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-status transition matrix: per customer's order sequence, count
    (previous status -> status) pairs — the Markov-chain summary behind
    lifecycle analytics. One window (lag over the customer partition) and
    one rollup, sharing the same shuffle."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    pairs = o.select(
        F.lag("o_orderstatus").over(w).alias("from_status"),
        F.col("o_orderstatus").alias("to_status"),
    ).filter(F.col("from_status").isNotNull())
    return pairs.groupBy("from_status", "to_status").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )


def q119_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association: brand pairs co-occurring in the same order
    with support counts and lift = P(a,b)·N / (P(a)·P(b)) — the frequent-
    itemset primitive. Baskets are per-order distinct brand sets; the pair
    join is a self-join co-partitioned on the order key (one shuffle each
    side), and the per-brand counts broadcast into the pair rollup. Brands
    bound the blow-up (25 brands -> <=300 pairs per basket)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    basket = (
        li.join(p.select("p_partkey", "p_brand"),
                F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n_orders = basket.agg(F.count_distinct("l_orderkey").alias("_no"))
    brand_n = basket.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n"))
    a = basket.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_a"))
    b = basket.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_b"))
    pair_n = (
        a.join(b, "l_orderkey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 50)
    )
    na = brand_n.select(F.col("p_brand").alias("brand_a"), F.col("n").alias("n_a"))
    nb = brand_n.select(F.col("p_brand").alias("brand_b"), F.col("n").alias("n_b"))
    return (
        pair_n.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "n_both",
            half_up(
                F.col("n_both") * F.col("_no").cast("double")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


def q120_lsh_multitable_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-ed multi-table hyperplane-LSH ANN top-3 (the recall-amplified
    scale path of q36): 4 independent 4-plane tables, 2 probes each —
    a candidate qualifies if it collides in ANY table, so miss probability
    decays as (1-p)^L (RECALL.md: 0.77 recall@5 vs 0.27 single-table).
    Deterministic md5 planes keep the whole candidate set oracle-able."""
    emb = _t(spark, sf_dir, "embeddings")
    out = cosine_lsh_topk(
        emb,
        emb.filter(F.col("vec_id") < 5),
        id_col="vec_id",
        vec_col="embedding",
        k=3,
        num_planes=4,
        dim=64,
        probes=2,
        num_tables=4,
    )
    return out.select(
        "query_id", "neighbor_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank"
    )


def q121_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate 4-gram fraction per doc (Gopher-style
    repetition/contamination signal; operators/textstats.py)."""
    d = _t(spark, sf_dir, "documents")
    return dup_ngram_fraction(d, id_col="doc_id", text_col="text", n=4)


def q122_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText quality-rule screen aggregated per source:
    word-count bounds, mean-word-length bounds, alpha-word fraction."""
    d = _t(spark, sf_dir, "documents")
    return gopher_quality_rules(d, text_col="text", group_col="source")


def q123_top_bigrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most frequent word bigrams per language (vocabulary /
    collocation profile; occurrence counts, deterministic tie-break)."""
    d = _t(spark, sf_dir, "documents")
    return top_ngrams_per_group(d, text_col="text", group_col="lang", n=2, k=3)


def q124_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split near-duplicate leakage audit [EXT]: MinHash-LSH near-dup
    pairs (q23's banding) whose members landed in DIFFERENT splits of the
    deterministic hash split (q101) — the eval-contamination check every
    training pipeline needs before shipping a split. Pair discovery stays
    banded (no all-pairs); split assignment is a stateless projection joined
    in after the candidate join, so the audit costs one extra broadcast-free
    map stage over q23."""
    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        d, "doc_id", "text", ngram=3, num_hashes=8, bands=4, threshold=0.1
    )
    splits = hash_split(d.select("doc_id"), "doc_id").select("doc_id", "split")
    sa = splits.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
    )
    sb = splits.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select(
            "id_a",
            "id_b",
            "split_a",
            "split_b",
            half_up(F.col("jaccard"), 6).alias("jaccard"),
        )
    )


def q125_price_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution moments per brand from one aggregation pass: mean,
    population variance and skewness via raw-moment expansion
    (E[x], E[x^2], E[x^3]) — the engine-portable formulation (Spark's
    skewness() is population, DuckDB's is sample-adjusted; expanding the
    moments sidesteps both). Single shuffle, map-side combine."""
    p = _t(spark, sf_dir, "part")
    x = F.col("p_retailprice")
    # mean and variance of 2-decimal money are exact cents rationals whose
    # d=4 boundaries are REACHABLE (sparse seed 881199: an 8-part brand's
    # mean hit x.xxxx5 through the float avg) — they move to exact-integer
    # moments summed as DECIMAL(38,0) (128-bit: Σcents² stays exact far
    # past 100 TB row counts; DuckDB's BIGINT sums are HUGEINT already)
    # and a pinned IEEE sequence. Skewness keeps the float moments: its
    # sqrt makes the display irrational (half-safe, boundary measure-zero).
    c = _cents(x)
    agg = p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c.cast("decimal(38,0)")).alias("_s1"),
        F.sum((c * c).cast("decimal(38,0)")).alias("_s2"),
        F.avg(x).alias("_m1"),
        F.avg(x * x).alias("_m2"),
        F.avg(x * x * x).alias("_m3"),
    )
    m1, m2, m3 = F.col("_m1"), F.col("_m2"), F.col("_m3")
    nd = F.col("n").cast("double")
    s1d = F.col("_s1").cast("double")
    s2d = F.col("_s2").cast("double")
    var_pinned = (nd * s2d - s1d * s1d) / (nd * nd * F.lit(1e4))
    # sqrt(var)*var, not pow(var, 1.5): sqrt is IEEE correctly-rounded in
    # every engine, pow is not — cross-engine hash equality needs the former.
    # The degenerate-brand predicate is the EXACT integer variance
    # n·Σc² − (Σc)² (decimal/HUGEINT on the two engines, bit-identical), not
    # the float m2 − m1²: for an all-equal multi-row brand the float form's
    # tiny residue is order-dependent and its SIGN can differ between
    # engines, flipping one side to NULL while the other divides by ~0
    # (round-10 advice). The DIVISOR is the pinned variance too (r11
    # advice): the order-dependent float m2 − m1² can round to <= 0 on a
    # near-degenerate brand even when the exact predicate holds, turning
    # sqrt(var)*var into NaN; var_pinned is computed from the exact integer
    # sums through one deterministic IEEE sequence, identical on both
    # engines, and the extra var_pinned > 0 guard covers the case where the
    # positive exact variance underflows the double subtraction to 0.
    # Float moments are kept for the skew numerator.
    var_exact_pos = F.col("n") * F.col("_s2") - F.col("_s1") * F.col("_s1") > 0
    skew = F.when(
        var_exact_pos & (var_pinned > 0),
        (m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1)
        / (F.sqrt(var_pinned) * var_pinned),
    )
    return agg.select(
        "p_brand",
        "n",
        _half_up(F.col("_s1"), F.col("n") * 100, 4).alias("mean_price"),
        half_up(var_pinned, 4).alias("var_price"),
        # + 0.0: a 2-part brand's skew is ±tiny before rounding and the
        # engines disagree on the residue's SIGN at exactly 0 (-0.0 class,
        # same normalization as q248)
        (F.round(skew, 6) + 0.0).alias("skew_price"),
    )


def q126_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level dedup signal (dedup.chunk_dup_stats): RefinedWeb-style
    repeated-chunk fraction per document — fixed 10-word chunks hashed and
    counted corpus-wide, one content-keyed shuffle + per-doc rollup."""
    d = _t(spark, sf_dir, "documents")
    return chunk_dup_stats(
        d, id_col="doc_id", text_col="text", chunk_words=10, drop_threshold=0.5
    )


def q127_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity partitioning
    (textstats.perplexity_buckets): corpus-fit unigram-LM score per doc;
    EXACT quantile cut points from the cumulative distribution over distinct
    rounded scores (bounded table — no per-document global window), tiers
    assigned map-side. The approx_percentile sibling is pinned against this
    in tests."""
    d = _t(spark, sf_dir, "documents")
    return perplexity_buckets(d, id_col="doc_id", text_col="text", n_buckets=3)


def q128_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota capping (sampling.per_group_cap): keep the 20 largest
    documents per source (deterministic tiebreak on doc_id), report per-source
    kept/total document and char mass — the C4-style anti-domination guard."""
    d = _t(spark, sf_dir, "documents")
    kept = per_group_cap(
        d, "source", [F.col("n_chars").desc(), F.col("doc_id")], 20
    )
    total = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("n_chars").alias("total_chars"),
    )
    k = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
    )
    return total.join(k, "source").select(
        "source", "n_total", "n_kept", "total_chars", "kept_chars"
    )


def q129_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix planner: per-language available token mass vs a weighted
    token budget (half the corpus) — allocation, clamped sampling rate, and
    epoch count per language. One agg + broadcast scalar total; the mix table
    itself is a literal map (it is configuration, not data)."""
    weights = {"en": 0.5, "zh": 0.15, "es": 0.15, "de": 0.1, "fr": 0.1}
    d = _t(spark, sf_dir, "documents")
    per_lang = d.groupBy("lang").agg(
        F.sum(whitespace_token_count(F.col("text"))).alias("avail_tokens")
    )
    total = per_lang.agg(F.sum("avail_tokens").alias("_total"))
    # EXACT-INTEGER allocation (seed-31337 differential fix): the old
    # double chain total*0.5*w rounds x.xx5 allocations DOWN while
    # DuckDB's DECIMAL literals round them UP. The budget share in
    # milli-tokens is an exact BIGINT (every w*1000 is even, so
    # total*w1000/2 is integral), the 2-decimal allocation is an explicit
    # half-up integer step, and the rates divide exact integers — every
    # engine computes identical values by construction.
    wmap_milli = F.create_map(
        *[
            x
            for k, v in weights.items()
            for x in (F.lit(k), F.lit(int(round(v * 1000))))
        ]
    )
    # products stay far below 2^53, so the double divisions are exact
    alloc_milli = (
        (F.col("_total") * wmap_milli[F.col("lang")]) / F.lit(2)
    ).cast("long")
    alloc_cents = F.floor((alloc_milli + F.lit(5)) / F.lit(10)).cast("long")
    rate = alloc_milli / (F.col("avail_tokens") * F.lit(1000.0))
    return per_lang.crossJoin(F.broadcast(total)).select(
        "lang",
        "avail_tokens",
        (alloc_cents / F.lit(100.0)).alias("alloc_tokens"),
        F.round(F.least(F.lit(1.0), rate), 6).alias("sample_rate"),
        F.round(rate, 6).alias("epochs"),
    )


def q130_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape adapted to the testdata (no partsupp table): profit by
    supplier nation and order year for one part type, supply cost proxied at
    20% of part retail price. Fact-fact join on orderkey; part filter and the
    supplier→nation dimension chain broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    # integer-cents profit per row (revenue cents minus cost cents, each
    # rounded once from a single double product) so the BIGINT sum is exact
    # and engine-order-independent — the q99-style cross-engine money trick
    profit_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long") - F.round(
        F.col("l_quantity") * F.col("p_retailprice") * 20, 0
    ).cast("long")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(F.sum(profit_cents) / 100.0, 2).alias("sum_profit")
        )
    )


def q131_pq_recon_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization compression audit (similarity.pq_reconstruction):
    4 subspaces × 4 deterministic codes, per-label reconstruction error;
    broadcast codebook, no corpus self-join."""
    e = _t(spark, sf_dir, "embeddings")
    return pq_reconstruction(
        e, id_col="vec_id", vec_col="embedding", label_col="label", n_sub=4, n_codes=4
    )


def q132_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance ANN top-5 (similarity.pq_adc_topk): corpus
    reduced to a PQ code table, per-query LUT broadcast, map-side scoring —
    the memory-bound third ANN path next to LSH (q36/q120) and IVF (q48)."""
    emb = _t(spark, sf_dir, "embeddings")
    return pq_adc_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        n_sub=4,
        n_codes=4,
        k=5,
    )


def q133_partition_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lake partition-completeness audit (quality.partition_completeness):
    per-day ingest counts vs the min-max day spine, missing/low/ok status.
    Spine generated from a broadcast scalar pair — fact scanned once."""
    ev = _t(spark, sf_dir, "events")
    out = partition_completeness(ev, "ts", low_watermark=0.5)
    # stringly day for the cross-engine hash (q63 convention)
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "n_rows", "status"
    )


def q134_part_supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape via the lineitem bridge (no partsupp table): distinct
    supplier count per (brand, size) for non-PROMO parts, excluding
    blacklisted suppliers (negative account balance) with a broadcast
    anti-join — the NOT IN subquery decorrelated."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") != "PROMO")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(
            F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def q135_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users over days WITHOUT a distinct-over-expanding-
    window (quadratic state): each user collapses to a first-seen day, daily
    new-user counts cumulative-sum over the (tiny, aggregated) day spine —
    the scale formulation of running-unique. Daily actives ride along for
    comparison. The only global window runs over per-day rows."""
    ev = _t(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    active = ev.groupBy(day).agg(
        F.count_distinct("user_id").alias("active_users")
    )
    new = (
        ev.groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        active.join(new, "day", "left")
        .select(
            "day",
            "active_users",
            F.coalesce(F.col("new_users"), F.lit(0)).alias("new_users"),
        )
        .withColumn("cum_users", F.sum("new_users").over(w))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "active_users",
            "new_users",
            "cum_users",
        )
    )


def q136_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median price per return flag (weight = quantity): collapse to
    per-(flag, price) weight, cumulative weight over the price order, first
    price whose cumulative weight reaches half the total — the exact,
    interpolation-free formulation that is engine-portable (no percentile
    sketch, integer-valued weights sum exactly in double)."""
    li = _t(spark, sf_dir, "lineitem")
    grouped = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
    ).agg(F.sum("l_quantity").alias("wt"))
    wcum = Window.partitionBy("flag").orderBy("price").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wtot = Window.partitionBy("flag")
    ranked = grouped.select(
        "flag",
        "price",
        F.sum("wt").over(wcum).alias("cum"),
        F.sum("wt").over(wtot).alias("tot"),
    ).filter(F.col("cum") >= F.col("tot") / 2)
    return ranked.groupBy("flag").agg(
        F.min("price").alias("weighted_median_price")
    )


def q137_brand_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count (graph.triangle_count) on the brand co-purchase graph:
    brands are linked when they co-occur in >= 5 orders (the q119 basket
    self-join, thresholded); ordered two-join finds each triangle once.
    Node set is bounded (25 brands) but the operator's join discipline is
    the general one."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    baskets = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select("l_orderkey", F.col("p_brand").alias("brand"))
        .distinct()
    )
    b2 = baskets.select(
        F.col("l_orderkey").alias("ok2"), F.col("brand").alias("brand2")
    )
    edges = (
        baskets.join(b2, (baskets.l_orderkey == b2.ok2))
        .filter(F.col("brand") < F.col("brand2"))
        .groupBy("brand", "brand2")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 5)
        .select(F.col("brand").alias("src"), F.col("brand2").alias("dst"))
    )
    return triangle_count(edges).orderBy("node")


def q138_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-drift audit: chi-square distance between each hash split's
    document-length distribution and the global one — the eval-integrity
    check that a split is not length-biased. Observed/expected grids are
    tiny post-aggregation tables; every join is broadcast; zero-count grid
    cells are materialized (a drifted split can be missing a bucket
    entirely, and chi-square must see that)."""
    d = _t(spark, sf_dir, "documents")
    s = hash_split(d, "doc_id").select(
        "split", F.floor(F.col("n_chars") / 100).alias("bucket")
    )
    ob = s.groupBy("split", "bucket").agg(F.count(F.lit(1)).alias("n"))
    split_tot = ob.groupBy("split").agg(F.sum("n").alias("st"))
    bucket_tot = ob.groupBy("bucket").agg(F.sum("n").alias("bt"))
    grand = ob.agg(F.sum("n").alias("g"))
    grid = (
        split_tot.crossJoin(F.broadcast(bucket_tot))
        .crossJoin(F.broadcast(grand))
        .join(F.broadcast(ob), ["split", "bucket"], "left")
        .select(
            "split",
            "bucket",
            F.coalesce(F.col("n"), F.lit(0)).alias("obs"),
            (F.col("st") * F.col("bt") / F.col("g")).alias("exp"),
        )
    )
    contrib = (F.col("obs") - F.col("exp")) * (F.col("obs") - F.col("exp")) / F.col(
        "exp"
    )
    return grid.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("obs").alias("n_docs"),
        F.round(F.sum(contrib), 6).alias("chi2"),
    )


def q139_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per group with exact percentile_disc cutoffs computed
    by rank selection (value at rank ceil(p*n)) — no sketch, no
    interpolation, so the clip points are identical in any engine. The
    cutoff table is per-group scalars (broadcast); clipping is map-side."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("_r"),
        F.count(F.lit(1)).over(Window.partitionBy("o_orderpriority")).alias("_n"),
    )
    cuts = (
        ranked.filter(
            (F.col("_r") == F.ceil(F.col("_n") * 0.1))
            | (F.col("_r") == F.ceil(F.col("_n") * 0.9))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.min("o_totalprice").alias("_lo"),
            F.max("o_totalprice").alias("_hi"),
        )
    )
    clipped = o.join(F.broadcast(cuts), "o_orderpriority").select(
        "o_orderpriority",
        F.greatest(F.col("_lo"), F.least(F.col("_hi"), F.col("o_totalprice"))).alias(
            "_v"
        ),
        "_lo",
        "_hi",
    )
    return clipped.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("_lo"), 2).alias("p10_cut"),
        F.round(F.min("_hi"), 2).alias("p90_cut"),
        # clipped prices stay on the exact cent grid
        _half_up(F.sum(_cents("_v")), F.count(F.lit(1)) * 100, 4).alias("winsorized_mean"),
    )


def q140_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (not cube/rollup) through the SQL surface with
    grouping() flags — the ((flag,status),(flag),()) lattice in one Expand,
    one shuffle."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_gs")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS flag,
               coalesce(l_linestatus, 'ALL') AS status,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


def q141_merged_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union per user (islands merge): each event spans
    [ts, ts+300s]; overlapping spans merge via the running-max-end trick
    (island starts where the current start exceeds every previous end), then
    per-user coverage = Σ island lengths. One window shuffle partitioned by
    user; NTZ-safe epoch math shared with operators/sessions."""
    from hubverse_transform_spark.operators.sessions import _epoch_micros

    # exact integer microseconds: coverage sums stay exact-integer, so the
    # 2-decimal display uses the engine-stable floor half-up (a coverage
    # total whose micros end in exactly 5000 sits ON the d=2 half boundary,
    # where round(double) diverges across engines)
    ev = _t(spark, sf_dir, "events").select(
        "user_id", _epoch_micros(F.col("ts")).alias("_t")
    )
    span = 300 * 1000000  # 300 s in micros
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = Window.partitionBy("user_id").orderBy("_t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    marked = ev.withColumn(
        "_new",
        F.when(
            F.col("_t") > F.max(F.col("_t") + span).over(w_prev), 1
        ).otherwise(F.when(F.max("_t").over(w_prev).isNull(), 1).otherwise(0)),
    ).withColumn("_island", F.sum("_new").over(w_run))
    islands = marked.groupBy("user_id", "_island").agg(
        F.min("_t").alias("_start"), (F.max("_t") + span).alias("_end")
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        _half_up(
            F.sum(F.col("_end") - F.col("_start")), F.lit(1000000), 2
        ).alias("covered_sec"),
    )


def q142_brand_mode_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode with deterministic ties (count desc, then value):
    the modal part type per brand. Two aggregations, one rank window over
    the small per-(brand,type) table."""
    p = _t(spark, sf_dir, "part")
    counts = p.groupBy("p_brand", "p_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("p_brand").orderBy(F.col("n").desc(), "p_type")
    return (
        counts.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("p_brand", F.col("p_type").alias("mode_type"), "n")
    )


def q143_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the event-type mix per day — the distribution-
    health metric monitoring pipelines alert on (a collapsing mix means an
    upstream producer died). Two aggregations; the per-day totals broadcast
    back into the per-(day,type) table."""
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = per.groupBy("day").agg(F.sum("n").alias("t"))
    p = F.col("n") / F.col("t")
    return (
        per.join(F.broadcast(tot), "day")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            # + 0.0: a single-type day has entropy -1·log(1) = -0.0 in one
            # engine and 0.0 in the other (tiny-tier seed 2468; the q248
            # -0.0 normalization class)
            (F.round(-F.sum(p * F.log(p)), 6) + 0.0).alias("entropy"),
        )
    )


def q144_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-region revenue trend: closed-form OLS slope/intercept of daily
    revenue over the day index, computed ENTIRELY in exact integer
    arithmetic (revenue in cents, day index small ints — every moment sum
    stays under 2^63), so the regression is bit-identical in any engine and
    any partitioning. The daily rollup is the only big shuffle; the moment
    sums collapse to one row per region."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    daily = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(cents).alias("y"))
        .select(
            "r_name",
            F.datediff(F.col("day"), F.lit("1995-01-01").cast("date"))
            .cast("long")
            .alias("x"),
            "y",
        )
    )
    m = daily.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        m.withColumn("den_d", den.cast("double"))
        .select(
            "r_name",
            "n",
            F.round(num / F.col("den_d") / 100.0, 6).alias("slope_per_day"),
            F.round(
                (F.col("sy").cast("double") - num / F.col("den_d") * F.col("sx"))
                / F.col("n")
                / 100.0,
                6,
            ).alias("intercept"),
        )
    )


def q145_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase credits the latest
    non-purchase event by the same user within the preceding hour (else
    'direct'). A RANGE-framed window over epoch seconds carries the latest
    qualifying (ts, type) struct — no self-join, one user-keyed shuffle;
    credited value sums exactly via integer cents."""
    from hubverse_transform_spark.operators.sessions import _epoch_seconds

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        _epoch_seconds(F.col("ts")).alias("_t"),
        F.round(F.col("value") * 100, 0).cast("long").alias("_cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("_t")
        .rangeBetween(-3600, 0)
    )
    touch = F.max(
        F.when(
            F.col("event_type") != "purchase",
            F.struct(F.col("_t").alias("t"), F.col("event_type").alias("et")),
        )
    ).over(w)
    purchases = (
        ev.withColumn("_touch", touch)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.coalesce(F.col("_touch.et"), F.lit("direct")).alias("channel"),
            "_cents",
        )
    )
    return purchases.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum("_cents") / 100.0, 2).alias("credited_value"),
    )


def q146_rolling_7d_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day WITHOUT a sliding distinct
    window: collapse to distinct (day, user), fan each out to the 7 days it
    covers (explode of a constant 7-element sequence — map-side), then one
    count-distinct per target day. The standard scale rewrite of
    COUNT(DISTINCT) OVER RANGE 7 days (whose state is quadratic); output
    restricted to days that actually exist."""
    ev = _t(spark, sf_dir, "events")
    du = ev.select(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
            "_d"
        ),
        "user_id",
    ).distinct()
    days = du.select("_d").distinct()
    fanned = du.select(
        "_d", "user_id", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("_off")
    ).select((F.col("_d") + F.col("_off")).alias("_td"), "user_id")
    return (
        fanned.join(days, fanned._td == days._d)
        .groupBy("_td")
        .agg(F.count_distinct("user_id").alias("users_7d"))
        .select(
            F.date_format(
                F.date_add(F.lit("2024-01-01").cast("date"), F.col("_td").cast("int")),
                "yyyy-MM-dd",
            ).alias("day"),
            "users_7d",
        )
    )


def q147_interpolate_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over a sparse daily series (the gap-fill
    downstream of q63's spine densify): days with under 3 purchase events
    are treated as unreliable (nulled), then reconstructed from the nearest
    reliable anchors on both sides via IGNORE NULLS window navigation — no
    self-join, one global-window pass over the (tiny, aggregated) day spine.
    Anchor values are exact integer cents, so the interpolation arithmetic
    is a single identical double expression in both engines."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("d")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("_cents"),
    )
    v = F.when(F.col("n") >= 3, F.struct(F.col("d").alias("ad"), F.col("_cents").alias("av")))
    w_prev = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.orderBy("d").rowsBetween(0, Window.unboundedFollowing)
    anchored = daily.select(
        "d",
        "n",
        "_cents",
        F.last(v, ignorenulls=True).over(w_prev).alias("_p"),
        F.first(v, ignorenulls=True).over(w_next).alias("_nx"),
    )
    pd_, pv = F.col("_p.ad"), F.col("_p.av")
    nd, nv = F.col("_nx.ad"), F.col("_nx.av")
    # The interpolated cents N/D (N = pv·D + (nv−pv)·(d−pd), D = nd−pd,
    # all exact integers) is a rational that CAN land exactly on a
    # 0.5-cent boundary — ultra-sparse seed 515253 hit 110846.5 cents,
    # where round(same_double, 2) still diverges across engines (the r8
    # class). Every branch displays through the exact half-up form:
    # dollars = floor(N/D + 0.5)/100 via _half_up(N, 100·D, 2); the
    # anchor/copy branches are the D=1 special case.
    num = pv * (nd - pd_) + (nv - pv) * (F.col("d") - pd_)
    den = nd - pd_
    value = (
        F.when(F.col("n") >= 3, _half_up(F.col("_cents"), F.lit(100), 2))
        .when(F.col("_p").isNull(), _half_up(nv, F.lit(100), 2))
        .when(F.col("_nx").isNull(), _half_up(pv, F.lit(100), 2))
        .otherwise(_half_up(num, F.lit(100) * den, 2))
    )
    return anchored.select(
        F.date_format(
            F.date_add(F.lit("2024-01-01").cast("date"), F.col("d").cast("int")),
            "yyyy-MM-dd",
        ).alias("day"),
        "n",
        (F.col("n") < 3).alias("filled"),
        value.alias("value_filled"),
    )


def q148_price_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist of each brand's average price within its part
    type — the relative-position windows over an aggregated (small) table.
    Averages come from exact integer cents so the rank ORDER is engine-
    independent (double-sum averages can flip near-ties across engines)."""
    p = _t(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100, 0).cast("long")
    agg = p.groupBy("p_type", "p_brand").agg(
        F.sum(cents).alias("_c"), F.count(F.lit(1)).alias("_n")
    )
    avg_price = F.col("_c").cast("double") / F.col("_n")
    w = Window.partitionBy("p_type").orderBy(avg_price, "p_brand")
    # explicit half-up at the 4th decimal: the cent average C/n is a
    # rational that CAN sit exactly on a x.xxxx5 boundary (seed-7
    # differential), where round() diverges across engines on the same
    # double; floor(q+0.5) over the identical IEEE quotient cannot
    avg4 = F.floor(F.col("_c").cast("double") * 100 / F.col("_n") + 0.5)
    return agg.select(
        "p_type",
        "p_brand",
        (avg4 / 10000.0).alias("avg_price"),
        half_up(F.percent_rank().over(w), 6).alias("pct_rank"),
        half_up(F.cume_dist().over(w), 6).alias("cume_dist"),
    )


def q149_consensus_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-signal dedup consensus: the agreement matrix between the two
    independent near-dup detectors (MinHash-LSH Jaccard, q23 config vs
    SimHash hamming, q37 config). Production curation ensembles signals
    exactly like this — pairs found by both are near-certain dups, single-
    signal pairs get a cheaper second look. Full-outer join of two bounded
    candidate-pair sets (never the corpus), 3-row rollup."""
    d = _t(spark, sf_dir, "documents")
    mh = minhash_lsh_pairs(
        d, "doc_id", "text", ngram=3, num_hashes=8, bands=4, threshold=0.1
    ).select("id_a", "id_b", F.lit(1).alias("_mh"))
    sh = simhash_near_dup_pairs(
        d, "doc_id", "text", bits=32, ngram=2, max_hamming=3
    ).select("id_a", "id_b", F.lit(1).alias("_sh"))
    joined = mh.join(sh, ["id_a", "id_b"], "full_outer").select(
        (F.col("_mh").isNotNull()).alias("in_minhash"),
        (F.col("_sh").isNotNull()).alias("in_simhash"),
    )
    return joined.groupBy("in_minhash", "in_simhash").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


def q150_recursive_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE (Spark 4 SQL surface): path counting from a seed brand
    over the canonical (src<dst, hence acyclic) co-purchase edge DAG —
    per reachable brand, number of distinct paths of length <= 3 and the
    shortest hop count. UNION ALL recursion terminates on the DAG order +
    depth guard identically in both engines; parameterized SQL carries the
    seed/threshold (no string splicing)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    baskets = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select("l_orderkey", F.col("p_brand").alias("brand"))
        .distinct()
    )
    b2 = baskets.select(
        F.col("l_orderkey").alias("ok2"), F.col("brand").alias("brand2")
    )
    edges = (
        baskets.join(b2, baskets.l_orderkey == b2.ok2)
        .filter(F.col("brand") < F.col("brand2"))
        .groupBy(F.col("brand").alias("src"), F.col("brand2").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
        .select("src", "dst")
    )
    # materialize the (tiny) edge list before recursing: a WITH-RECURSIVE
    # body re-evaluates every CTE it references per iteration, so leaving
    # the basket self-join inline multiplies the expensive build by the
    # recursion depth (measured 6.4s -> ~2s at sf0.1). EAGER localCheckpoint
    # rather than cache(): the build job runs here with full AQE planning,
    # the recursion then scans the stored (tiny) edge partitions, and the
    # storage is GC-reclaimed — nothing stays pinned in the CacheManager
    # after the query.
    edges.localCheckpoint(eager=True).createOrReplaceTempView("edges_rr")
    return spark.sql(
        """
        WITH RECURSIVE reach(brand, depth) AS (
            SELECT :seed, 0
            UNION ALL
            SELECT e.dst, r.depth + 1
            FROM reach r JOIN edges_rr e ON e.src = r.brand
            WHERE r.depth < 3
        )
        SELECT brand, count(*) AS n_paths, min(depth) AS min_depth
        FROM reach WHERE depth > 0
        GROUP BY brand
        """,
        args={"seed": "Brand#1"},
    )


def q151_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (the fasttext-classifier slot in a
    curation pipeline): a logistic model over text features — stopword
    ratio, alpha ratio, log token count — with literal weights, scored
    entirely in column expressions (batch inference without a UDF), tiered
    and rolled up per language. Swapping trained weights in changes no
    plan."""
    from hubverse_transform_spark.functions.text import (
        alpha_ratio,
        stopword_ratio,
        whitespace_token_count,
    )

    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    logit = (
        F.lit(-2.0)
        + 3.0 * stopword_ratio(t)
        + 2.0 * alpha_ratio(t)
        + 0.5 * F.log(whitespace_token_count(t) + F.lit(1.0))
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    scored = d.select(
        "lang",
        p.alias("_p"),
        F.when(p >= 0.7, "high").when(p >= 0.4, "mid").otherwise("low").alias(
            "tier"
        ),
    )
    return scored.groupBy("lang", "tier").agg(
        F.count(F.lit(1)).alias("n_docs"),
        # half-safe: _p is a sigmoid (exp-based, irrational) — not an
        # integer ratio; a d=6 half-boundary hit has measure zero
        F.round(F.avg("_p"), 6).alias("avg_p"),
    )


def q152_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 -> 8 dims with the
    deterministic md5 hyperplane family (planes 100..107 — disjoint from the
    LSH tables), reporting per-label norm-preservation (projected/original
    L2 ratio). Map-only: the projection matrix is 8 constant-folded literal
    arrays; nothing shuffles but the 10-row label rollup — the shape of
    every matmul-by-small-matrix feature transform at scale."""
    from hubverse_transform_spark.functions.vectors import dot_product

    emb = _t(spark, sf_dir, "embeddings")
    planes = [_hyperplane(100 + j, 64) for j in range(8)]
    ve = F.col("embedding").cast("array<double>")
    projs = [
        dot_product(ve, F.array(*[F.lit(x) for x in pl])) for pl in planes
    ]
    proj_sq = projs[0] * projs[0]
    for pj in projs[1:]:
        proj_sq = proj_sq + pj * pj
    ratio = F.sqrt(proj_sq / dot_product(ve, ve))
    return (
        emb.select("label", ratio.alias("_r"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            # half-safe: _r is an L2-norm ratio (sqrt-based, irrational) —
            # not an integer ratio; a d=6 half-boundary hit has measure zero
            F.round(F.avg("_r"), 6).alias("avg_norm_ratio"),
            F.round(F.min("_r"), 6).alias("min_norm_ratio"),
            F.round(F.max("_r"), 6).alias("max_norm_ratio"),
        )
    )


def q153_notin_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic NOT IN: the classic trap where one NULL in the
    subquery empties the whole result. One row, three counts — NOT IN over a
    null-bearing set (0 rows survive), NOT IN with nulls pre-filtered, and
    the NOT EXISTS rewrite (null rows simply never match). Spark plans the
    first as a null-aware anti join (NAAJ, a broadcast-only physical op);
    the rewrite is the scale-safe form — at 100 TB you want the NOT EXISTS
    shape, and this query pins why the two differ."""
    _t(spark, sf_dir, "part").createOrReplaceTempView("part_q153")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q153")
    return spark.sql(
        """
        WITH sizes AS (SELECT DISTINCT p_size FROM part_q153),
             qty AS (SELECT DISTINCT CASE WHEN l_quantity >= 50 THEN NULL
                                          ELSE CAST(l_quantity AS INT) END AS q
                     FROM lineitem_q153)
        SELECT
          (SELECT count(*) FROM sizes
            WHERE p_size NOT IN (SELECT q FROM qty)) AS notin_with_null,
          (SELECT count(*) FROM sizes
            WHERE p_size NOT IN (SELECT q FROM qty WHERE q IS NOT NULL))
              AS notin_null_filtered,
          (SELECT count(*) FROM sizes s
            WHERE NOT EXISTS (SELECT 1 FROM qty WHERE q = s.p_size))
              AS not_exists_rewrite
        """
    )


def q154_event_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series anomaly detection: per-event-type daily counts scored
    against that type's own mean/stddev (z-score), returning |z| >= 2 days.
    Two aggs sharing one shuffle key (type) — daily rollup, then a windowed
    stats pass; no per-day driver loop, no global sort until the tiny
    anomaly set."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("event_type")
    # a type whose daily counts are all EQUAL has stddev exactly 0 (integer
    # counts — genuinely reachable on sparse data) and a 1-day type has
    # stddev NULL: both have no anomaly scale, so z is NULL and the |z|
    # filter drops them. CASE guards the ANSI division; Catalyst folds the
    # repeated identical window expressions into one Window operator.
    scored = daily.select(
        "event_type",
        "day",
        "n_events",
        F.when(
            F.stddev_samp("n_events").over(w) > 0,
            (F.col("n_events") - F.avg("n_events").over(w))
            / F.stddev_samp("n_events").over(w),
        ).alias("_z"),
    )
    return scored.filter(F.abs(F.col("_z")) >= 2.0).select(
        "event_type", "day", "n_events", F.round("_z", 4).alias("zscore")
    )


def q155_lang_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-confidence audit for the stopword lang-ID: per predicted
    language, how decisive the argmax was (margin = top1 - top2 profile
    hits) and how many docs sit in the low-confidence band (margin <= 1) —
    the curation dial that decides which docs need a real model's second
    opinion. Pure column expressions; one shuffle for the rollup."""
    d = _t(spark, sf_dir, "documents")
    lowered = F.lower(F.col("text"))
    scores = F.array(
        *[
            _profile_hits(lowered, words)
            for _, words in sorted(_LANG_PROFILES.items())
        ]
    )
    desc = F.reverse(F.array_sort(scores))
    margin = desc[0] - desc[1]
    return (
        d.select(
            lang_id_expr(F.col("text")).alias("pred_lang"),
            margin.alias("_m"),
        )
        .groupBy("pred_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # margins are integer hit-count differences
            _half_up(F.sum("_m"), F.count(F.lit(1)), 6).alias("avg_margin"),
            F.sum(F.when(F.col("_m") <= 1, 1).otherwise(0)).alias("n_low_conf"),
        )
    )


def q156_merge_changeset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO / CDC-apply semantics (operators/scd.apply_changeset): a
    deterministic changeset derived from orders — every key%97==0 updated
    (status 'X', price*1.1), every key%89==0 deleted, inserts at key+10M —
    applied to the snapshot in one full-outer join, then rolled up per
    status so the hash compare covers every merge branch (update wins,
    delete drops, insert appends, untouched passes through)."""
    from hubverse_transform_spark.operators.scd import apply_changeset

    o = _t(spark, sf_dir, "orders")
    base = o.select("o_orderkey", "o_orderstatus", "o_totalprice")
    updates = base.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        F.lit("U").alias("op"),
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
    )
    deletes = base.filter(
        (F.col("o_orderkey") % 89 == 0) & (F.col("o_orderkey") % 97 != 0)
    ).select(
        "o_orderkey",
        F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    inserts = base.filter(F.col("o_orderkey") % 83 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        F.lit("I").alias("op"),
        F.lit("N").alias("o_orderstatus"),
        F.lit(1000.0).alias("o_totalprice"),
    )
    changes = updates.unionByName(deletes).unionByName(inserts)
    merged = apply_changeset(base, changes, "o_orderkey", "op")
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _half_up(F.sum(_fixed("o_totalprice", 1000)), F.lit(1000), 1).alias("sum_price"),
    )


def q157_packing_capacity_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing capacity sweep: the q115 first-fit-by-offset packer
    evaluated at three context lengths in one plan. The per-doc running
    token offset is computed ONCE (one shuffle + sort per lang), then a
    broadcast cross join against the 3-row capacity dim derives each
    capacity's window ids — the sweep costs three cheap aggregations, not
    three repacks. Reports windows, mean fill, and waste per capacity
    (fill>1 = a doc straddling its window boundary, counted where it
    starts)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("n_tokens"),
    )
    offs = toks.withColumn(
        "prev_cum",
        F.expr(
            "sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id "
            "ROWS UNBOUNDED PRECEDING) - n_tokens"
        ),
    )
    caps = spark.createDataFrame([(512,), (2048,), (8192,)], ["capacity"])
    per_window = (
        offs.crossJoin(F.broadcast(caps))
        .groupBy(
            "capacity", "lang", F.expr("prev_cum div capacity").alias("window_id")
        )
        .agg(F.sum("n_tokens").alias("tok"))
    )
    return per_window.groupBy("capacity").agg(
        F.count(F.lit(1)).alias("n_windows"),
        # capacity is constant per group, so both ratios are exact-integer
        # rationals: fill = sum(tok)/(n*cap), waste = (n*cap - sum)/(n*cap)
        _half_up(
            F.sum("tok"), F.count(F.lit(1)) * F.first("capacity"), 6
        ).alias("avg_fill"),
        _half_up(
            F.count(F.lit(1)) * F.first("capacity") - F.sum("tok"),
            F.count(F.lit(1)) * F.first("capacity"),
            6,
        ).alias("waste_frac"),
    )


def q158_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin-style prefix-filtered exact Jaccard join (3-gram shingles,
    t=0.6): rarest-first prefixes prune the candidate postings join
    losslessly, so the result is byte-identical to the plain inverted-index
    join at the same parameters — the high-threshold scale path where
    postings^2 cost concentrates in the commonest shingles. Oracle verifies
    the exact pair set + similarity values."""
    from hubverse_transform_spark.operators.dedup import prefix_filter_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    return prefix_filter_jaccard_pairs(
        d, "doc_id", "text", ngram=3, threshold=0.6
    )


def q159_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed covariance matrix of the 64-dim embedding column (full
    upper triangle, 2080 cells) via per-partition numpy Gram partials
    (mapInPandas, BLAS matmul) merged by a 2080-key shuffle — the two-phase
    moment aggregation every PCA/whitening pipeline runs before the eigen
    step. Oracle replays the exact moments with a component cross join."""
    from hubverse_transform_spark.operators.profiling import embedding_covariance

    emb = _t(spark, sf_dir, "embeddings")
    cov = embedding_covariance(emb, "embedding")
    # + 0.0 folds IEEE negative zero to +0.0 (DuckDB round yields -0.0)
    return cov.select("i", "j", (F.round("cov", 6) + 0.0).alias("cov"))


def q160_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier filter: diagonal-Mahalanobis score (squared
    z-scores summed over the 64 components) against global per-component
    moments, top-20 most anomalous vectors. The stats pass is one
    posexplode aggregation (64 rows); scoring re-joins them on the
    component index (broadcast) and folds per-vector — the curation gate
    that drops corrupt/degenerate embeddings before ANN indexing. No
    all-pairs work; two scans, one bounded shuffle."""
    emb = _t(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x")
    )
    stats = comp.groupBy("dim").agg(
        F.avg("x").alias("mu"), F.var_samp("x").alias("var")
    )
    scored = (
        comp.join(F.broadcast(stats), "dim")
        .groupBy("vec_id")
        .agg(
            F.round(
                F.sum((F.col("x") - F.col("mu")) * (F.col("x") - F.col("mu")) / F.col("var")),
                4,
            ).alias("maha_sq")
        )
    )
    return scored.orderBy(F.col("maha_sq").desc(), F.col("vec_id")).limit(20)


def q161_ivf_list_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index health audit: per-inverted-list size, corpus share, and
    skew vs uniform for the q48 quantizer — the check that decides whether
    the list keys are safe to bucket a lake by (a 3x-hot list is a 3x-hot
    partition at every probe). One scan + a 16-row shuffle."""
    from hubverse_transform_spark.operators.similarity import ivf_list_stats

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_list_stats(emb, id_col="vec_id", vec_col="embedding", n_centroids=16)


def q162_bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting at scale via Spark's bucketed-bitmap
    aggregates (the roaring-bitmap pattern): user ids fold into per-bucket
    bitmaps (bitmap_bucket_number / bitmap_bit_position /
    bitmap_construct_agg), buckets sum their popcounts — a two-level
    aggregation whose shuffle carries fixed-size bitmap bytes instead of
    one row per distinct value. Same answer as count(DISTINCT), which is
    exactly what the oracle runs; the sketch-free exact sibling of q38."""
    e = _t(spark, sf_dir, "events")
    per_bucket = e.groupBy(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("_bucket"),
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("_bm"))
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(_bm)")).alias("n_users")
    )


def q163_interval_join_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/joins.interval_join_streams (same operator,
    static inputs — the backfill path every streaming pipeline needs):
    clicks attributed to purchases by the same user within 300 s, rolled up
    per day. Pins that the streaming interval-join condition produces
    batch-reconcilable answers; the streaming execution of the identical
    operator is covered in tests/test_stream_joins.py."""
    from hubverse_transform_spark.streaming.joins import interval_join_streams

    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    joined = interval_join_streams(
        clicks, purchases, key_col="user_id", horizon_seconds=300
    )
    return joined.groupBy(
        F.date_format("r_ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_attributed"),
        F.count_distinct("l_key").alias("n_users"),
    )


def q164_events_since_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-anchored running state: for every event, the timestamp of the
    user's most recent purchase so far (running MAX of a conditional
    expression — the 'sessionize by marker event' pattern), rolled up to
    events-per-user split pre/post first purchase. One shuffle on user_id;
    the window and rollup share the sort."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = e.withColumn(
        "_last_purchase",
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).over(w),
    )
    return marked.groupBy("user_id").agg(
        F.sum(F.when(F.col("_last_purchase").isNull(), 1).otherwise(0)).alias(
            "n_before_first_purchase"
        ),
        F.sum(F.when(F.col("_last_purchase").isNotNull(), 1).otherwise(0)).alias(
            "n_after_first_purchase"
        ),
    )


def q165_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health Zipf audit: OLS slope of log-frequency vs log-rank
    over the top-200 tokens (natural text ~ -1; synthetic/templated
    corpora flatten). Token rollup -> dense rank -> closed-form OLS in one
    scalar aggregation — regression over a corpus without any UDF or
    driver math. One data-sized shuffle (token counts); the top-200 slice
    and moment rollup are bounded."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    # TakeOrderedAndProject keeps the top-200 slice distributed; only the
    # 200 surviving rows pass through the (bounded) global rank window
    top = counts.orderBy(F.col("n").desc(), F.col("tok")).limit(200)
    ranked = top.select(
        "n",
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), F.col("tok")))
        .alias("rank"),
    )
    pts = ranked.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    return pts.agg(
        F.round(
            (
                F.avg(F.col("x") * F.col("y")) - F.avg("x") * F.avg("y")
            )
            / (F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")),
            6,
        ).alias("zipf_slope"),
        F.count(F.lit(1)).alias("n_points"),
    )


def q166_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary Jaccard: per source pair, overlap of their
    distinct-token vocabularies — the corpus-mix diagnostic for 'are these
    sources redundant'. Vocabulary postings join on token (bounded by
    vocab size, never |docs|^2); per-source sizes broadcast back onto the
    pair counts."""
    d = _t(spark, sf_dir, "documents")
    vocab = (
        d.select(
            "source",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("vsz"))
    a = vocab.select(F.col("source").alias("src_a"), "tok")
    b = vocab.select(F.col("source").alias("src_b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("vsz").alias("_va"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("vsz").alias("_vb"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            half_up(
                F.col("n_shared")
                / (F.col("_va") + F.col("_vb") - F.col("n_shared")),
                6,
            ).alias("vocab_jaccard"),
        )
    )


def q167_two_stage_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval, the production ANN pattern: a cheap PQ-ADC
    shortlist (top-20 per query, raw vectors never shuffle — q132's scan)
    feeds an EXACT cosine re-rank that touches only |queries| x 20 raw
    vectors. Re-rank order uses the rounded similarity (+ neighbor-id
    tiebreak) so both engines rank identical numbers."""
    from hubverse_transform_spark.functions.vectors import cosine_similarity

    emb = _t(spark, sf_dir, "embeddings")
    shortlist = pq_adc_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        n_sub=4,
        n_codes=4,
        k=20,
    ).select("query_id", "neighbor_id")
    qv = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("_qv"),
    ).filter(F.col("query_id") < 10)
    nv = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("_nv"),
    )
    scored = (
        shortlist.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .withColumn(
            "_sim", F.round(cosine_similarity(F.col("_qv"), F.col("_nv")), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rerank", F.row_number().over(w))
        .filter(F.col("rerank") <= 5)
        .select(
            "query_id", "neighbor_id", F.col("_sim").alias("cosine_sim"), "rerank"
        )
    )


def q168_salted_agg_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof salted aggregation in the driver-checked surface:
    two-phase (key, salt)->key aggregation over lineitem by return flag —
    the explicit hot-key split (operators/skew.two_phase_agg) whose merge
    must equal the direct groupBy, which is exactly what the plain-SQL
    oracle computes. Each phase is a partial agg; the second input is
    salt_buckets x |keys| rows."""
    from hubverse_transform_spark.operators.skew import two_phase_agg

    li = _t(spark, sf_dir, "lineitem")
    out = two_phase_agg(
        li.select("l_returnflag", "l_quantity", "l_extendedprice"),
        "l_returnflag",
        {"l_quantity": "sum", "l_extendedprice": "max"},
        salt_buckets=16,
    )
    return out.select(
        "l_returnflag",
        F.round(F.col("sum_l_quantity"), 2).alias("sum_qty"),
        F.round(F.col("max_l_extendedprice"), 2).alias("max_price"),
    )


def q169_dominant_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding argmax histogram: per label, which dimension carries each
    vector's maximum (array_position of array_max — first occurrence on
    ties in both engines), top-3 dominant dims per label by vector count.
    A map-only scan plus one bounded rollup — the quick 'is one dimension
    saturated' health check after a bad normalization step."""
    emb = _t(spark, sf_dir, "embeddings")
    ve = F.col("embedding").cast("array<double>")
    dims = emb.select(
        "label", F.array_position(ve, F.array_max(ve)).alias("dom_dim")
    )
    counts = dims.groupBy("label", "dom_dim").agg(
        F.count(F.lit(1)).alias("n_vecs")
    )
    w = Window.partitionBy("label").orderBy(
        F.col("n_vecs").desc(), F.col("dom_dim")
    )
    return counts.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= 3
    )


def q170_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven feature discretization: exact decile cuts computed once
    (one array-percentile aggregation), broadcast to every row as nine
    scalar columns, bucket id = 1 + #cuts below the value — pure codegen
    comparisons, no HOF/join per bucket. Cuts are rounded to 4 decimals on
    both engines so interpolation FP noise cannot flip a boundary row.
    Scale note: EXACT percentile's final merge buffers the column in one
    reducer (the known exact-order-statistic shape, same as q40); the
    DECLARED scale twin is q207_approx_decile_audit — the identical
    binning driven by approx_percentile's fixed-size sketch, with an
    in-engine rank-error audit and a tolerance-asserted paths-agree test
    (tests/test_entry_contract.py) pinning sketch-vs-exact agreement."""
    li = _t(spark, sf_dir, "lineitem")
    fracs = ", ".join(f"{i / 10.0}D" for i in range(1, 10))
    # one array-percentile agg (sorts once, single buffer) projected to
    # scalar cut columns — NOT an array + filter() HOF in the row loop:
    # higher-order functions run interpreted per row (measured 5.1s at
    # sf0.1); nine scalar comparisons stay inside whole-stage codegen
    cuts = li.agg(
        F.expr(f"percentile(l_extendedprice, array({fracs}))").alias("_p")
    ).select(
        *[F.round(F.col("_p")[i - 1], 4).alias(f"_c{i}") for i in range(1, 10)]
    )
    bucket = F.lit(1)
    for i in range(1, 10):
        bucket = bucket + (F.col("l_extendedprice") > F.col(f"_c{i}")).cast("int")
    binned = li.crossJoin(F.broadcast(cuts)).select(
        bucket.alias("bucket"), "l_extendedprice"
    )
    return binned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.min("l_extendedprice"), 2).alias("lo"),
        F.round(F.max("l_extendedprice"), 2).alias("hi"),
    )


def q171_weekly_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week churn: users active in week w with no event in w+1
    (anti-join of the distinct (week, user) activity set against itself
    shifted one week), reported per closed week (the last week has no
    successor and is excluded). Activity collapses to one row per (week,
    user) BEFORE any join, so the anti-join is bounded by active users,
    not events."""
    e = _t(spark, sf_dir, "events")
    active = e.select(
        F.trunc("ts", "week").alias("wk"), "user_id"
    ).distinct()
    nxt = active.select(
        F.date_add(F.col("wk"), -7).alias("wk"),
        F.col("user_id").alias("_u2"),
    )
    churned = active.join(
        nxt,
        (active.user_id == nxt._u2) & (active.wk == nxt.wk),
        "left_anti",
    )
    per_week = active.groupBy("wk").agg(F.count(F.lit(1)).alias("n_active"))
    churn_counts = churned.groupBy("wk").agg(
        F.count(F.lit(1)).alias("n_churned")
    )
    maxw = active.agg(F.max("wk").alias("_maxw"))
    return (
        per_week.join(churn_counts, "wk", "left")
        .crossJoin(F.broadcast(maxw))
        .filter(F.col("wk") < F.col("_maxw"))
        .select(
            F.date_format("wk", "yyyy-MM-dd").alias("week"),
            "n_active",
            F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
            half_up(F.coalesce("n_churned", F.lit(0)) / F.col("n_active"), 6).alias(
                "churn_rate"
            ),
        )
    )


def q172_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay scoring (7-day e-folding): each event's value
    discounted by its age against the corpus max timestamp, summed per
    user, top-20. The recency-weighted metric behind trending/engagement
    ranking; one broadcast scalar (max ts), one map-only discount, one
    shuffle. NTZ-safe epoch seconds via unix_micros (never CAST(ntz AS
    DOUBLE)); ranked on the rounded score so both engines order identical
    numbers."""
    from hubverse_transform_spark.operators.sessions import _epoch_seconds

    e = _t(spark, sf_dir, "events")
    mx = e.agg(F.max("ts").alias("_mx"))
    age_sec = _epoch_seconds(F.col("_mx")) - _epoch_seconds(F.col("ts"))
    score = F.round(
        F.sum(F.col("value") * F.exp(-age_sec / F.lit(604800.0))), 4
    ).alias("score")
    return (
        e.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(score)
        .orderBy(F.col("score").desc(), "user_id")
        .limit(20)
    )


def q173_capped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential fold that NO window frame can express: per-part running
    inventory balance clamped at zero (returns add stock, shipments drain
    it, balance never goes negative — the clamp makes each step depend on
    the folded value, not a prefix sum). Per-group ordered fold via
    sort_array(collect_list(struct)) + aggregate() HOF — group sizes are
    bounded by lineitems-per-part (~30-60 at any SF), so the collected
    array is small even at 100 TB; the fold itself is a JVM lambda, fully
    deterministic, and the DuckDB oracle replays it with list_reduce over
    the identically-ordered list."""
    li = _t(spark, sf_dir, "lineitem")
    delta = F.when(F.col("l_returnflag") == "R", F.col("l_quantity")).otherwise(
        -F.col("l_quantity")
    )
    g = (
        li.select(
            "l_partkey",
            F.struct(
                "l_shipdate", "l_orderkey", "l_linenumber", delta.alias("d")
            ).alias("_s"),
        )
        .groupBy("l_partkey")
        .agg(
            F.sort_array(F.collect_list("_s")).alias("_moves"),
            F.count(F.lit(1)).alias("n_moves"),
        )
    )
    balance = F.round(
        F.aggregate(
            F.transform(F.col("_moves"), lambda s: s.d),
            F.lit(0.0),
            lambda acc, x: F.greatest(F.lit(0.0), acc + x),
        ),
        2,
    ).alias("balance")
    return (
        g.select("l_partkey", "n_moves", balance)
        .orderBy(F.col("balance").desc(), "l_partkey")
        .limit(20)
    )


def q174_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path mining: sessionize (30-min gap islands, q50's
    machinery), fold each session's ordered event types into a '>'-joined
    path signature, count the top-10 paths. The window chain and the
    per-session fold share one (user) shuffle; path strings are bounded by
    session length. Deterministic ordering via (ts, event_id) everywhere."""
    from hubverse_transform_spark.operators.sessions import _epoch_seconds

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (_epoch_seconds(F.col("ts")) - _epoch_seconds(prev_ts) >= 1800),
        1,
    ).otherwise(0)
    sess = e.withColumn(
        "_seq",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = sess.groupBy("user_id", "_seq").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s.event_type,
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(10)
    )


def q175_ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality metric computed IN the engine (RECALL.md's number
    as a declared, oracle-checked query): per query, recall@5 of the IVF
    path (q48's quantizer, 4 probes) against the exact brute-force top-5
    (q24) — an equi-join of the two result sets and one rollup. The audit
    every ANN rollout runs before flipping traffic; both inputs are
    independently oracle-verified, so this checks the *composition*."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    bf = cosine_brute_force_topk(
        emb, queries_df, id_col="vec_id", vec_col="embedding", k=5
    ).select("query_id", "neighbor_id")
    ivf = ivf_cosine_topk(
        emb,
        queries_df,
        id_col="vec_id",
        vec_col="embedding",
        n_centroids=16,
        n_probe=4,
        k=5,
    ).select(
        F.col("query_id").alias("_q"), F.col("neighbor_id").alias("_n")
    )
    hits = bf.join(
        ivf, (bf.query_id == ivf._q) & (bf.neighbor_id == ivf._n), "left"
    )
    return hits.groupBy("query_id").agg(
        F.round(F.sum(F.col("_n").isNotNull().cast("int")) / 5.0, 2).alias(
            "recall_at_5"
        )
    )


def q176_above_nation_p90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise quantile threshold join: customers above their own
    nation's p90 account balance (q15's shape with an order statistic
    instead of a mean — the threshold is a per-group exact percentile,
    computed once per nation and joined back broadcast). Reports count and
    balance share above the cut per nation."""
    c = _t(spark, sf_dir, "customer")
    # exact cent sums for the share (balances are a cent grid; the float
    # sums were order-dependent and the d=6 boundary is reachable); the p90
    # threshold stays on the raw column — the interpolated value lies a
    # fixed fraction g in (0,1) between adjacent grid balances (or ON one
    # when g=0, where strict > excludes it on both engines), so cross-engine
    # ulp noise cannot flip the filter
    cuts = c.groupBy("c_nationkey").agg(
        F.expr("percentile(c_acctbal, 0.9)").alias("_p90"),
        F.sum(_cents("c_acctbal")).alias("_tot"),
    )
    return (
        c.join(F.broadcast(cuts), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("_p90"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            _half_up(F.sum(_cents("c_acctbal")), F.first("_tot"), 6).alias(
                "balance_share"
            ),
        )
    )


def q177_token_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary concentration (heavy-hitter mass): what fraction of all
    token occurrences the tokens at/above the p99 of per-token frequency
    carry. The threshold is a percentile of the count distribution — fully
    distributed, no global rank window — so the same plan stands when the
    vocabulary is 100M terms. One row: vocab size, heavy-hitter count,
    occurrence share."""
    d = _t(spark, sf_dir, "documents")
    counts = (
        d.select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cut = counts.agg(
        F.expr("percentile(n, 0.99)").alias("_p99"),
        F.sum("n").alias("_total"),
        F.count(F.lit(1)).alias("vocab_size"),
    )
    return (
        counts.crossJoin(F.broadcast(cut))
        .filter(F.col("n") >= F.col("_p99"))
        .groupBy("vocab_size")
        .agg(
            F.count(F.lit(1)).alias("n_heavy"),
            half_up(F.sum("n") / F.first("_total"), 6).alias("occurrence_share"),
        )
    )


def q178_click_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANTI interval join (the missing flavor next to q163's inner): clicks
    with NO purchase by the same user within the following 300 s —
    streaming's outer-join-after-watermark answer, computed in batch.
    Abandonment rate per day; the anti side never materializes matched
    pairs."""
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 300 SECONDS"))
    )
    abandoned = clicks.join(purchases, cond, "left_anti")
    all_daily = clicks.groupBy(
        F.date_format("c_ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_clicks"))
    ab_daily = abandoned.groupBy(
        F.date_format("c_ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_abandoned"))
    return all_daily.join(ab_daily, "day", "left").select(
        "day",
        "n_clicks",
        F.coalesce("n_abandoned", F.lit(0)).alias("n_abandoned"),
        half_up(
            F.coalesce("n_abandoned", F.lit(0)) / F.col("n_clicks"), 6
        ).alias("abandon_rate"),
    )


def q179_value_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-based RANGE window frame (the numeric sibling of q56's
    time-range frame): for each customer, how many segment peers sit
    within +/-500 of their account balance, and their local density rank.
    The frame bound is a value offset, not a row count — rows with equal
    orderby values share a frame, which no ROWS frame can express."""
    c = _t(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal"))
        .rangeBetween(-500, 500)
    )
    peers = c.select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        (F.count(F.lit(1)).over(w) - 1).alias("n_peers_within_500"),
    )
    return (
        peers.groupBy("c_mktsegment")
        .agg(
            _half_up(F.sum("n_peers_within_500"), F.count(F.lit(1)), 4).alias("avg_peers"),
            F.max("n_peers_within_500").alias("max_peers"),
        )
    )


def q180_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price/volume bridge (waterfall decomposition): month-over-month
    revenue change split into a volume effect (qty change at old price)
    and a price effect (price change at new qty), per return flag. One
    monthly rollup, one lag window over the tiny aggregate — the FP&A
    decomposition every revenue dashboard runs."""
    li = _t(spark, sf_dir, "lineitem")
    # exact integer moments per month — V = Σ cents·qty, Q = Σ qty — and
    # every effect evaluated as ONE pinned IEEE sequence over those
    # integers, so both engines compute bit-identical doubles and the d=1
    # half-up cannot flip (the old float avg-price ratio was
    # order-dependent and its d=1 boundary genuinely flipped on the
    # tiny-tier twin: 4146262.35 rounded .3 vs .4)
    monthly = li.groupBy(
        "l_returnflag", F.date_format("l_shipdate", "yyyy-MM").alias("month")
    ).agg(
        F.sum(_intval("l_quantity")).alias("_q"),
        F.sum(_cents("l_extendedprice") * _intval("l_quantity")).alias("_v"),
    )
    w = Window.partitionBy("l_returnflag").orderBy("month")
    prev_q = F.lag("_q").over(w)
    prev_v = F.lag("_v").over(w)
    vol = (
        (F.col("_q") - F.col("_pq")).cast("double") * F.col("_pv").cast("double")
    ) / (F.col("_pq").cast("double") * F.lit(1e2))
    price = (
        F.col("_v").cast("double") / (F.col("_q").cast("double") * F.lit(1e2))
        - F.col("_pv").cast("double") / (F.col("_pq").cast("double") * F.lit(1e2))
    ) * F.col("_q").cast("double")
    return (
        monthly.select(
            "l_returnflag", "month", "_q", "_v", prev_q.alias("_pq"), prev_v.alias("_pv")
        )
        .filter(F.col("_pq").isNotNull())
        .select(
            "l_returnflag",
            "month",
            half_up(vol, 1).alias("volume_effect"),
            half_up(price, 1).alias("price_effect"),
        )
    )


def q181_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): each doc draws u from its md5 hash (deterministic
    'randomness', the trick every reproducible sampler here uses) and
    scores key = ln(u)/weight; the top-50 keys are the sample, longer docs
    proportionally likelier. Map-only scoring + TakeOrdered — no shuffle
    of the corpus, no driver RNG state; the selection is ranked on the
    6-rounded key (+ doc_id) so both engines cut the same boundary."""
    d = _t(spark, sf_dir, "documents")
    frac = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("double")
        + 1.0
    ) / F.lit(float(1 << 60))
    key = F.round(F.log(frac) / F.col("n_chars"), 6)
    return (
        d.select("doc_id", "n_chars", key.alias("es_key"))
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(50)
    )


def q182_rank_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK()-with-ties cut (vs the row_number cuts used everywhere else):
    all parts tied into the top-3 size values per brand survive, so group
    sizes vary with tie mass — the semantic difference between 'top 3
    rows' and 'top 3 ranks'. No tie-break key needed: ties are included,
    which is exactly what makes the result deterministic."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    ranked = p.withColumn("_rk", F.rank().over(w)).filter(F.col("_rk") <= 3)
    return ranked.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.max("p_size").alias("top_size"),
        F.min("p_size").alias("cut_size"),
    )


def q183_filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-surface pins: the standard FILTER (WHERE ...) aggregate clause
    (one pass, no self-joins for conditional aggregates) and a lateral
    column alias (return_rate referenced by the very next select item) —
    both parsed by Spark 4 and DuckDB identically. Per ship month: item
    count, returned-item count/revenue via FILTER, and a rate derived
    from the lateral alias."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q183")
    return spark.sql(
        """
        SELECT date_format(l_shipdate, 'yyyy-MM') AS month,
               count(*) AS n_items,
               count(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
               -- exact-cents money: double sums round x.x5 differently
               -- across engines (seed-5 differential); the BIGINT cent sum
               -- is exact and the 1-decimal step is explicit half-up
               CAST((sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                         FILTER (WHERE l_returnflag = 'R') + 5) DIV 10
                    AS DOUBLE) / 10.0 AS returned_revenue,
               -- count ratio: exact integer ratio, d=6 boundary reachable
               -- (1/128-style denominators) -> engine-stable half-up
               floor(CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS DOUBLE)
                     * 1e6 / count(*) + 0.5) / 1e6 AS return_rate,
               CASE WHEN CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS DOUBLE)
                         / count(*) > 0.3
                    THEN 'high' ELSE 'normal' END AS return_band
        FROM lineitem_q183
        GROUP BY 1
        """
    )


def q184_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit: BPE-ish tokens per whitespace word, per
    language — the metric that decides whether a tokenizer bloats a
    language's sequence lengths (and training cost) relative to English.
    Two token counters over one scan, ratio at the rollup."""
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return (
        d.select(
            "lang",
            whitespace_token_count(t).alias("_ws"),
            bpe_ish_token_count(t).alias("_bpe"),
        )
        .groupBy("lang")
        .agg(
            _half_up(F.sum("_ws"), F.count(F.lit(1)), 4).alias("avg_ws_tokens"),
            _half_up(F.sum("_bpe"), F.count(F.lit(1)), 4).alias("avg_bpe_tokens"),
            # fertility is also an exact integer ratio of token sums
            _half_up(F.sum("_bpe"), F.sum("_ws"), 6).alias("fertility"),
        )
    )


def q185_trigram_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram fuzzy search (the autocomplete/typo-tolerant index shape):
    score every part name by character-trigram overlap with the query
    string 'chocolate' and return the top-15. The query's trigram set is a
    constant-folded literal array, scoring is one map-only array_intersect
    per row, ranking is TakeOrdered — the brute-force form whose scale
    path is the inverted trigram index (same postings machinery as q21)."""
    p = _t(spark, sf_dir, "part")
    query = "chocolate"
    qgrams = sorted({query[i : i + 3] for i in range(len(query) - 2)})
    name = F.lower(F.col("p_name"))
    tri = F.array_distinct(
        F.expr(
            "transform(sequence(1, greatest(length(lower(p_name)) - 2, 1)), "
            "i -> substring(lower(p_name), i, 3))"
        )
    )
    score = F.size(
        F.array_intersect(tri, F.array(*[F.lit(g) for g in qgrams]))
    )
    return (
        p.select("p_partkey", "p_name", score.alias("n_shared_trigrams"))
        .filter(F.col("n_shared_trigrams") > 0)
        .orderBy(F.col("n_shared_trigrams").desc(), "p_partkey")
        .limit(15)
    )


def q186_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier (min price, max size) over PROMO parts —
    the classic non-dominated-set operator, distributed as two-phase
    local-sweep + frontier-merge mapInPandas (operators/skyline.py):
    dominated rows die inside their own partition, only local frontiers
    reach the final single-partition sweep. Oracle is the NOT EXISTS
    dominance definition, so the pruning scheme itself is what's checked."""
    from hubverse_transform_spark.operators.skyline import pareto_skyline

    p = _t(spark, sf_dir, "part").filter(F.col("p_type").startswith("PROMO"))
    sky = pareto_skyline(
        p.select("p_partkey", "p_retailprice", "p_size"),
        "p_retailprice",
        "p_size",
    )
    return sky.select(
        "p_partkey", F.round("p_retailprice", 2).alias("price"), "p_size"
    )


def q187_struct_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column (row-value) IN subquery: lineitems whose exact
    (partkey, suppkey) pair shipped in some 1996 order — the composite-key
    semi-join the parser must plan from `(a, b) IN (SELECT x, y ...)`,
    counted per return flag."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q187")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_q187")
    return spark.sql(
        """
        SELECT l_returnflag, count(*) AS n_items
        FROM lineitem_q187
        WHERE (l_partkey, l_suppkey) IN (
            SELECT l_partkey, l_suppkey
            FROM lineitem_q187 JOIN orders_q187 ON l_orderkey = o_orderkey
            WHERE year(o_orderdate) = 1996 AND o_orderpriority = '1-URGENT'
        )
        GROUP BY l_returnflag
        """
    )


def q188_minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch calibration audit: for every LSH-surfaced near-dup pair,
    compare the MinHash ESTIMATE of Jaccard (fraction of equal signature
    components) against the exact value, and roll up the mean absolute
    error and bias. The check that tells you whether 8 hashes are enough
    before you trust banding at 100 TB; both the estimate and the truth
    are engine-reproducible (md5 permutation family)."""
    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        d, "doc_id", "text", ngram=3, num_hashes=8, bands=4, threshold=0.0
    )
    sigs = d.select(
        F.col("doc_id").alias("_id"),
        minhash_signature(
            shingle_ngrams(F.col("text"), 3), num_hashes=8
        ).alias("_sig"),
    )
    sa = sigs.select(F.col("_id").alias("id_a"), F.col("_sig").alias("_siga"))
    sb = sigs.select(F.col("_id").alias("id_b"), F.col("_sig").alias("_sigb"))
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("_siga"), F.col("_sigb"), lambda x, y: x == y),
                lambda v: v,
            )
        )
        / F.lit(8.0)
    )
    scored = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select((est - F.col("jaccard")).alias("_err"))
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        # half-safe: _err is a difference of rationals with heterogeneous
        # denominators (k/128 signature agreement minus per-pair exact
        # jaccard a/b); a d=6 half boundary needs the reduced sum
        # denominator to be exactly 2*10^6*odd — measure-zero, seed-swept
        F.round(F.avg(F.abs(F.col("_err"))), 6).alias("mean_abs_error"),
        F.round(F.avg("_err"), 6).alias("bias"),
    )


def q189_nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-in-time join (bidirectional as-of with tolerance): each
    click pairs with the temporally closest purchase by the same user
    within +/-600 s, ties to the earlier purchase. Neither backward-only
    ASOF nor a plain interval join expresses 'nearest' — it is the
    interval join plus a per-left-row rank on |gap|. Rolled up per day:
    matched clicks and total |gap| (the sum stays on the millisecond
    grid, so cross-engine rounding is stable where an average is not)."""
    from hubverse_transform_spark.operators.sessions import _epoch_micros

    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    # exact integer-microsecond gaps: identical |gap| ordering, and the
    # summed total stays exact-integer so the 3-decimal display uses the
    # engine-stable floor half-up (a gap total whose micros end in 500
    # sits ON the d=3 half boundary)
    gap_us = _epoch_micros(F.col("p_ts")) - _epoch_micros(F.col("c_ts"))
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.abs(gap_us) <= 600 * 1000000),
    ).select("c_id", "c_ts", gap_us.alias("_gap"))
    w = Window.partitionBy("c_id").orderBy(F.abs(F.col("_gap")), F.col("_gap"))
    nearest = joined.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    return nearest.groupBy(
        F.date_format("c_ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_matched"),
        _half_up(
            F.sum(F.abs(F.col("_gap"))), F.lit(1000000), 3
        ).alias("total_abs_gap_s"),
    )


def q190_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer allocation by the largest-remainder method (Hamilton
    apportionment): split 1000 units across nations proportionally to
    customer count — floor every quota, then hand the leftover units to
    the largest fractional remainders (ties to lowest nation key). The
    deterministic integer-budget splitter behind sampling quotas and
    shard assignment; two bounded aggregates and one 25-row window."""
    c = _t(spark, sf_dir, "customer")
    counts = c.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("_n"))
    tot = counts.agg(F.sum("_n").alias("_tot"))
    quota = (F.col("_n") * 1000.0 / F.col("_tot"))
    based = counts.crossJoin(F.broadcast(tot)).select(
        "c_nationkey",
        "_n",
        F.floor(quota).cast("long").alias("_base"),
        (quota - F.floor(quota)).alias("_rem"),
    )
    leftover = based.agg((F.lit(1000) - F.sum("_base")).alias("_left"))
    w = Window.orderBy(F.col("_rem").desc(), F.col("c_nationkey"))
    return (
        based.crossJoin(F.broadcast(leftover))
        .withColumn("_rk", F.row_number().over(w))
        .select(
            "c_nationkey",
            F.col("_n").alias("n_customers"),
            (
                F.col("_base")
                + F.when(F.col("_rk") <= F.col("_left"), 1).otherwise(0)
            ).alias("allocation"),
        )
    )


def q191_width_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via the SQL width_bucket function (explicit
    [0, 200) domain, 20 buckets, under/overflow in buckets 0 and 21) over
    event values per type — the fixed-domain sibling of q170's data-driven
    quantile bins; entirely map-side until the bounded rollup."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.expr("width_bucket(value, 0.0, 200.0, 20)").alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def q192_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index — the production score-drift metric
    (PSI = sum over buckets of (p_now - p_ref) * ln(p_now / p_ref)) —
    between the first and last week of event values on a fixed 10-bucket
    [0, 200) grid, per event type. Laplace-smoothed bucket shares keep the
    log finite on empty buckets; one scan, two bounded rollups, and the
    bucket join is 10xtypes rows."""
    e = _t(spark, sf_dir, "events")
    wk = F.trunc("ts", "week")
    bounds = e.agg(
        F.min(wk).alias("_lo"), F.max(wk).alias("_hi")
    )
    bucket = F.least(F.floor(F.col("value") / 20).cast("int"), F.lit(9))
    tagged = (
        e.crossJoin(F.broadcast(bounds))
        .filter((wk == F.col("_lo")) | (wk == F.col("_hi")))
        .select(
            "event_type",
            bucket.alias("bucket"),
            F.when(wk == F.col("_lo"), "ref").otherwise("now").alias("_side"),
        )
    )
    per_bucket = tagged.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("_side") == "ref", 1).otherwise(0)).alias("_nref"),
        F.sum(F.when(F.col("_side") == "now", 1).otherwise(0)).alias("_nnow"),
    )
    tot = per_bucket.groupBy("event_type").agg(
        F.sum("_nref").alias("_tref"), F.sum("_nnow").alias("_tnow")
    )
    p_ref = (F.col("_nref") + 0.5) / (F.col("_tref") + 5.0)
    p_now = (F.col("_nnow") + 0.5) / (F.col("_tnow") + 5.0)
    contrib = (p_now - p_ref) * F.log(p_now / p_ref)
    return (
        per_bucket.join(F.broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(F.round(F.sum(contrib), 6).alias("psi"))
    )


def q193_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph profiling: degree distribution of the brand co-purchase graph
    (q150's canonical edge set) — how many brands have degree d. The
    first-look health check before running PageRank/components on any
    graph; two bounded aggregations after the edge build."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    baskets = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select("l_orderkey", F.col("p_brand").alias("brand"))
        .distinct()
    )
    b2 = baskets.select(
        F.col("l_orderkey").alias("ok2"), F.col("brand").alias("brand2")
    )
    edges = (
        baskets.join(b2, baskets.l_orderkey == b2.ok2)
        .filter(F.col("brand") < F.col("brand2"))
        .groupBy(F.col("brand").alias("src"), F.col("brand2").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
    )
    deg = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_brands"))


def q194_star_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q45's duplicate clustering re-run through the alternating
    large-star/small-star algorithm (clusters.connected_components_star,
    Kiveris et al.) — the O(log n)-round scale path for large-diameter
    graphs, where min-label propagation needs O(diameter) rounds. Same
    SimHash pair graph, same (node, component, cluster_size) answer; the
    oracle is the recursive-CTE reachability labeling, so the driver
    verifies the ALGORITHM, not just the plumbing."""
    from hubverse_transform_spark.operators.clusters import (
        connected_components_star,
    )

    d = _t(spark, sf_dir, "documents")
    pairs = simhash_near_dup_pairs(
        d, "doc_id", "text", bits=32, ngram=2, max_hamming=3
    )
    cc = connected_components_star(pairs)
    w = Window.partitionBy("component")
    return cc.select(
        "node", "component", F.count(F.lit(1)).over(w).alias("cluster_size")
    )


def q195_power_iteration_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First PCA component by POWER ITERATION over the distributed
    covariance matrix (profiling.power_iteration_top_eigen): three
    v <- normalize(Cv) rounds, each one join + one 64-key aggregation —
    iterative linear algebra with no eigensolver and no driver-side
    matrix. Output: the top-5 dimensions by |loading| plus the Rayleigh
    eigenvalue estimate; ranked on the rounded loading so both engines cut
    identically. The oracle unrolls the same three iterations in SQL."""
    from hubverse_transform_spark.operators.profiling import (
        power_iteration_top_eigen,
    )

    emb = _t(spark, sf_dir, "embeddings")
    eig = power_iteration_top_eigen(emb, "embedding", iters=3)
    ranked = eig.select(
        "dim",
        F.round(F.abs(F.col("loading")), 5).alias("abs_loading"),
        F.round("eigenvalue_est", 3).alias("eigenvalue_est"),
    )
    w = Window.orderBy(F.col("abs_loading").desc(), "dim")
    return (
        ranked.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("rk", "dim", "abs_loading", "eigenvalue_est")
    )


def q196_hierarchy_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level share-of-parent (the OLAP drilldown ratio): each nation's
    revenue as a share of its region, and each region's share of the
    world, in one pass — two window sums over the 25-row nation rollup
    (no re-aggregation per level). The fact-table shuffle happens once;
    every level above it is window arithmetic on the tiny aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            # exact 1e-4 revenue units: the d=1 display straddles x.x5 on
            # the 1e-4 grid and both shares are ratios of float sums —
            # closed by exact BIGINT units (round-9 share-class sweep)
            F.sum(
                _fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
            ).alias("_u")
        )
    )
    wr = Window.partitionBy("r_name")
    wall = Window.partitionBy()
    return rev.select(
        "r_name",
        "n_name",
        _half_up(F.col("_u"), F.lit(10000), 1).alias("revenue"),
        _half_up(F.col("_u"), F.sum("_u").over(wr), 6).alias(
            "share_of_region"
        ),
        _half_up(
            F.sum("_u").over(wr), F.sum("_u").over(wall), 6
        ).alias("region_share_of_world"),
    )


def q197_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user (gaps-and-islands on
    the DATE grid — the sibling of q50's time-gap sessionization): distinct
    activity days, island id = day minus a per-user day rank (constant
    within a run of consecutive dates), max run length. Top-15 streaks with
    user tie-break."""
    e = _t(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "_grp", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    runs = islands.groupBy("user_id", "_grp").agg(
        F.count(F.lit(1)).alias("_len")
    )
    best = runs.groupBy("user_id").agg(
        F.max("_len").alias("longest_streak_days"),
        F.count(F.lit(1)).alias("n_streaks"),
    )
    return best.orderBy(
        F.col("longest_streak_days").desc(), "user_id"
    ).limit(15)


def q198_cluster_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup survivorship: inside every near-dup cluster (q45's SimHash
    components) keep the BEST document — highest quality score, ties to
    lowest doc id — via one max_by aggregation over the cluster label, no
    window re-sort. The rule-based golden-record step that turns a
    component labeling into a keep/drop decision; reports kept doc, its
    score, and how many members it displaced."""
    d = _t(spark, sf_dir, "documents")
    pairs = simhash_near_dup_pairs(
        d, "doc_id", "text", bits=32, ngram=2, max_hamming=3
    )
    cc = dedup_clusters(pairs)
    scored = d.select(
        F.col("doc_id").alias("node"), quality_score(F.col("text")).alias("_q")
    )
    members = cc.join(scored, "node")
    return members.groupBy("component").agg(
        F.expr("max_by(node, struct(_q, -node))").alias("kept_doc"),
        F.round(F.max("_q"), 4).alias("kept_quality"),
        (F.count(F.lit(1)) - 1).alias("n_dropped"),
    )


def q199_dedup_method_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which dedup signal catches what: per method — exact content hash,
    MinHash-LSH (jaccard>=0.5), SimHash (hamming<=3) — how many documents
    get flagged as duplicates, plus the union. The method-selection summary
    a curation team reads before picking its pipeline; each signal is
    independently oracle-verified elsewhere (q20/q23/q37), so this checks
    their composition into doc-level flags."""
    d = _t(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id", F.sha2(F.col("text"), 256).alias("_h")
    )
    wcnt = Window.partitionBy("_h")
    exact_docs = (
        hashed.withColumn("_n", F.count(F.lit(1)).over(wcnt))
        .filter(F.col("_n") > 1)
        .select("doc_id")
    )
    mh = minhash_lsh_pairs(
        d, "doc_id", "text", ngram=3, num_hashes=8, bands=4, threshold=0.5
    )
    sh = simhash_near_dup_pairs(d, "doc_id", "text", bits=32, ngram=2, max_hamming=3)
    # r13 (guide §2.4 "remove shuffles outright"): the old shape evaluated
    # every pair generator TWICE (its own count + the union count: 2.1 s of
    # duplicated build at sf0.1). One tagged union -> per-doc method
    # bitmask -> ONE row of conditional counts, unpivoted to the same
    # 4-row output: each generator runs once, and the four count
    # aggregations collapse into one. bit_or over the per-source bit is
    # idempotent, so a doc flagged by both pair ends (or by multiple
    # pairs) counts once per method, exactly like the old per-method
    # distinct. Counts are bit-identical; row set unchanged.
    pair_docs = lambda p: p.select(  # noqa: E731
        F.col("id_a").alias("doc_id")
    ).unionByName(p.select(F.col("id_b").alias("doc_id")))
    tagged = (
        exact_docs.select("doc_id", F.lit(4).alias("_bit"))
        .unionByName(pair_docs(mh).select("doc_id", F.lit(2).alias("_bit")))
        .unionByName(pair_docs(sh).select("doc_id", F.lit(1).alias("_bit")))
    )
    masks = tagged.groupBy("doc_id").agg(F.bit_or("_bit").alias("_mask"))
    # coalesce: on a corpus with NO flagged docs the old per-method
    # count(*) returned 0 while sum() over zero rows is NULL — the sparse
    # tier reaches that shape
    wide = masks.agg(
        F.coalesce(
            F.sum(((F.col("_mask").bitwiseAND(4)) > 0).cast("long")), F.lit(0)
        ).alias("_exact"),
        F.coalesce(
            F.sum(((F.col("_mask").bitwiseAND(2)) > 0).cast("long")), F.lit(0)
        ).alias("_mh"),
        F.coalesce(
            F.sum(((F.col("_mask").bitwiseAND(1)) > 0).cast("long")), F.lit(0)
        ).alias("_sh"),
        F.count(F.lit(1)).alias("_union"),
    )
    return wide.select(
        F.expr(
            "stack(4, 'exact_hash', _exact, 'minhash_lsh', _mh,"
            " 'simhash', _sh, 'union', _union)"
        ).alias("method", "n_docs_flagged")
    )


def q200_catalog_rowcounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog sanity sweep: row count of every table in the lake in one
    result — the first health query against any unfamiliar dataset, and
    the cheapest cross-check that every reader wiring (all ten parquet
    sources) actually resolves. Counts come from parquet footer statistics
    (no full scans)."""
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    out = None
    for t in tables:
        c = _t(spark, sf_dir, t).agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(t).alias("table_name"), "n_rows"
        )
        out = c if out is None else out.unionByName(c)
    return out


def q201_window_aligned_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two windowed aggregates joined on their time bucket: clicks and
    purchases per 15-minute tumbling window, with the per-bucket
    conversion ratio — the grid-aligned join every funnel dashboard runs
    (vs q163's row-level interval join). Buckets with clicks but no
    purchases survive the left join with rate 0."""
    e = _t(spark, sf_dir, "events")
    bucket = F.date_format(
        F.timestamp_seconds(
            (F.unix_micros(F.to_utc_timestamp("ts", "UTC")) / 1_000_000)
            .cast("long")
            - (F.unix_micros(F.to_utc_timestamp("ts", "UTC")) / 1_000_000)
            .cast("long")
            % 900
        ),
        "yyyy-MM-dd HH:mm",
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    buys = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    return clicks.join(buys, "bucket", "left").select(
        "bucket",
        "n_clicks",
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        half_up(
            F.coalesce("n_purchases", F.lit(0)) / F.col("n_clicks"), 6
        ).alias("conversion"),
    )


def q202_cluster_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of near-dup cluster sizes (how much of the corpus sits
    in pairs vs big families): q45's components rolled up to (size,
    n_clusters, n_docs) — the one-line summary that decides whether dedup
    should drop whole families or just pick survivors."""
    d = _t(spark, sf_dir, "documents")
    pairs = simhash_near_dup_pairs(
        d, "doc_id", "text", bits=32, ngram=2, max_hamming=3
    )
    cc = dedup_clusters(pairs)
    sizes = cc.select("component", "cluster_size").distinct()
    return sizes.groupBy(F.col("cluster_size").alias("size")).agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("cluster_size").alias("n_docs"),
    )


def q203_banding_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding sensitivity: candidate-pair yield of the SAME 8-hash
    MinHash signatures banded as 2x4 vs 4x2 (rows-per-band 4 vs 2) at
    threshold 0 — the S-curve knob every LSH deployment tunes (fewer,
    wider bands -> higher precision, lower recall). Both configurations
    share one signature computation; the oracle replays both bandings."""
    d = _t(spark, sf_dir, "documents")
    out = None
    for bands in (2, 4):
        p = minhash_lsh_pairs(
            d, "doc_id", "text", ngram=3, num_hashes=8, bands=bands,
            threshold=0.0,
        )
        row = p.agg(F.count(F.lit(1)).alias("n_pairs")).select(
            F.lit(bands).alias("bands"), "n_pairs"
        )
        out = row if out is None else out.unionByName(row)
    return out


def q204_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) revenue concentration per market segment: the share
    of segment revenue carried by customers above their segment's p80
    customer-revenue cut. Scale-safe concentration — a per-group exact
    percentile threshold joined back broadcast, never a global rank
    window over all customers."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    # exact 1e-4 revenue units end-to-end: per-customer revenue becomes an
    # exact BIGINT (the old double sum was order-dependent, so the p80
    # threshold AND the share could flip across engines near ties); the
    # percentile interpolates between exact integers, where cross-engine
    # ulp noise cannot move a customer across the strict > filter
    per_cust = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(
            F.sum(
                _fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
            ).alias("_rev")
        )
    )
    cuts = per_cust.groupBy("c_mktsegment").agg(
        F.expr("percentile(_rev, 0.8)").alias("_p80"),
        F.sum("_rev").alias("_tot"),
        F.count(F.lit(1)).alias("n_customers"),
    )
    return (
        per_cust.join(F.broadcast(cuts), "c_mktsegment")
        .filter(F.col("_rev") > F.col("_p80"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_top_customers"),
            F.first("n_customers").alias("n_customers"),
            _half_up(F.sum("_rev"), F.first("_tot"), 6).alias(
                "top20pct_revenue_share"
            ),
        )
    )


def q205_null_aggregate_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL null-aggregate semantics pinned in one row per event type:
    count(*) counts rows, count(col)/count(DISTINCT col) skip nulls, sum
    ignores nulls, and avg(col) != sum(col)/count(*) exactly because of
    that — the four facts every aggregate bug report eventually reduces
    to. Nulls synthesized deterministically (value < 50 -> NULL)."""
    e = _t(spark, sf_dir, "events")
    v = F.when(F.col("value") >= 50, F.col("value"))
    ann = e.select("event_type", v.alias("_v"))
    return ann.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("_v").alias("n_nonnull"),
        F.count_distinct("_v").alias("n_distinct_nonnull"),
        F.round(F.sum("_v"), 2).alias("sum_v"),
        _half_up(F.sum(_cents("_v")), F.count("_v") * 100, 6).alias("avg_nonnull"),
        _half_up(F.sum(_cents("_v")), F.count(F.lit(1)) * 100, 6).alias("sum_over_rows"),
    )


def q206_group_quantiles_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q40's declared SCALE TWIN: the same per-group quartiles, computed
    the lake-safe way — no exact ``percentile()`` single-reducer anywhere.

    Distributional (type-1) quantiles by rank selection over a
    per-DISTINCT-value count table (the q127/perplexity_buckets pattern):
    values collapse to (group, value, count) whose cardinality is bounded
    by VALUE GRANULARITY (2-decimal prices over a bounded domain → ~1e7
    distinct ceiling regardless of row count, vs rows in the exact-
    percentile buffer), the cumulative distribution runs per group over
    that bounded table, and the p-quantile is the smallest value whose
    cumulative count reaches ceil(p*n) — written as the integer
    comparison ``cum*4 >= n*i`` so no float rank math can diverge between
    engines. Distributional, so results are actual data values (q40's
    interpolated form can emit off-grid midpoints)."""
    li = _t(spark, sf_dir, "lineitem")
    dist = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count(F.lit(1)).alias("_c")
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = dist.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("_c").over(wcum).alias("_cum"),
        F.sum("_c").over(Window.partitionBy("l_returnflag")).alias("_n"),
    )

    def _cut(i: int, d: int):
        # smallest v with cum >= ceil(n*i/d)  ⟺  cum*d >= n*i (integers)
        return F.min(
            F.when(
                F.col("_cum") * d >= F.col("_n") * i, F.col("l_extendedprice")
            )
        )

    price_cuts = cum.groupBy("l_returnflag").agg(
        F.round(_cut(1, 4), 2).alias("p25_price"),
        F.round(_cut(2, 4), 2).alias("p50_price"),
        F.round(_cut(3, 4), 2).alias("p75_price"),
    )
    qdist = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("_c")
    )
    qw = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    qcum = qdist.select(
        "l_returnflag",
        "l_quantity",
        F.sum("_c").over(qw).alias("_cum"),
        F.sum("_c").over(Window.partitionBy("l_returnflag")).alias("_n"),
    )
    qty_cuts = qcum.groupBy("l_returnflag").agg(
        F.round(
            F.min(
                F.when(
                    F.col("_cum") * 2 >= F.col("_n"), F.col("l_quantity")
                )
            ),
            1,
        ).alias("median_qty")
    )
    return price_cuts.join(qty_cuts, "l_returnflag")


def q207_approx_decile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q170's declared SCALE TWIN: decile cut points from
    ``approx_percentile``'s FIXED-SIZE sketch (Greenwald–Khanna summary,
    accuracy=10000 → rank error ≤ n/10000) with the in-engine agreement
    audit — for each approx cut, one extra pass counts the realized
    fraction of rows strictly below / at-or-below it, and ``max_rank_err``
    is how far the target decile falls outside that tie-aware interval.
    The sketch guarantee says ≤ 1e-4; the paths-agree test pins it
    (tests/test_entry_contract.py). No oracle_sql: the sketch's exact
    output is engine-internal (merge-order dependent), so the driver
    records the rows-only check — correctness is carried by the audit
    columns and the tolerance-asserted test, the q127 pattern.

    This is the plan q170 takes at lake scale: agg state is O(1/accuracy)
    per partition, merged pairwise — no single reducer ever buffers the
    column."""
    li = _t(spark, sf_dir, "lineitem")
    fracs = ", ".join(f"{i / 10.0}D" for i in range(1, 10))
    sk = li.agg(
        F.expr(
            f"approx_percentile(l_extendedprice, array({fracs}), 10000)"
        ).alias("_a"),
        F.count(F.lit(1)).alias("_n"),
    )
    # one pass over lineitem with the 9 cuts broadcast: realized ranks
    audited = li.crossJoin(F.broadcast(sk)).agg(
        F.first("_a").alias("_a"),
        F.first("_n").alias("_n"),
        *[
            F.sum(
                (F.col("l_extendedprice") <= F.col("_a")[i - 1]).cast("long")
            ).alias(f"_le{i}")
            for i in range(1, 10)
        ],
        *[
            F.sum(
                (F.col("l_extendedprice") < F.col("_a")[i - 1]).cast("long")
            ).alias(f"_lt{i}")
            for i in range(1, 10)
        ],
    )
    rows = audited.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("decile"),
                        F.round(F.col("_a")[i - 1], 2).alias("approx_cut"),
                        F.round(F.col(f"_lt{i}") / F.col("_n"), 6).alias(
                            "frac_below"
                        ),
                        F.round(F.col(f"_le{i}") / F.col("_n"), 6).alias(
                            "frac_at_or_below"
                        ),
                        F.round(
                            F.greatest(
                                F.lit(0.0),
                                F.lit(i / 10.0)
                                - F.col(f"_le{i}") / F.col("_n"),
                                F.col(f"_lt{i}") / F.col("_n")
                                - F.lit(i / 10.0),
                            ),
                            6,
                        ).alias("max_rank_err"),
                    )
                    for i in range(1, 10)
                ]
            )
        ).alias("_r")
    ).select("_r.*")
    return rows


def q208_rag_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunking [EXT]: split every document into overlapping fixed
    token windows (window=32, stride=24 — the retrieval-corpus chunking
    every RAG/embedding pipeline runs before indexing), then audit the
    chunk stream per source: chunk counts, token expansion from the
    overlap, and the chunk-level duplicate rate (distinct md5 chunk
    fingerprints vs chunks — repeated chunks waste index space and skew
    retrieval).

    Scale shape: the 1→N chunk explode is ``sequence`` + ``slice`` +
    ``array_join`` — one pass per document, all codegen, no Python, no
    re-tokenization per chunk (the token array is computed once per row
    and sliced per start offset). The only shuffles are the per-source
    rollups; chunk fingerprint distinct-count shuffles on (source, hash)
    with map-side partial aggregation. At 100 TB the chunk stream is
    emitted and aggregated without ever materializing chunk text beyond
    the md5."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    base = d.select("doc_id", "source", toks.alias("_w")).withColumn(
        "_n", F.size("_w")
    )
    chunks = base.select(
        "doc_id",
        "source",
        "_n",
        "_w",
        F.explode(
            F.sequence(F.lit(0), F.col("_n") - 1, F.lit(24))
        ).alias("_s"),
    ).select(
        "doc_id",
        "source",
        F.least(F.lit(32), F.col("_n") - F.col("_s")).alias("_ct"),
        F.md5(F.array_join(F.slice(F.col("_w"), F.col("_s") + 1, 32), " ")).alias(
            "_h"
        ),
    )
    per_src = chunks.groupBy("source").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("_ct").alias("chunk_tokens"),
        half_up(
            1.0 - F.count_distinct("_h") / F.count(F.lit(1)), 6
        ).alias("dup_chunk_frac"),
    )
    doc_toks = base.groupBy("source").agg(F.sum("_n").alias("doc_tokens"))
    return per_src.join(doc_toks, "source").select(
        "source",
        "n_docs",
        "n_chunks",
        "chunk_tokens",
        "doc_tokens",
        "dup_chunk_frac",
        half_up(F.col("chunk_tokens") / F.col("doc_tokens"), 6).alias("expansion"),
    )


def q209_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture temperature sampling [EXT]: per-domain sampling
    weights w_i = c_i^α / Σ c_j^α over source token counts (α=0.7 — the
    Pile/PaLM-style heavy-tail flattening), plus the epoch count each
    domain would run at a 5M-token budget (epochs > 1 ⇒ the sampler
    repeats that domain). This is THE curation knob that turns corpus
    stats into a data-loading plan.

    Scale shape: one map-side token count + per-source sum (bounded key
    cardinality = #domains), then a broadcast of the single-row
    normalizer onto the tiny per-source frame. The 100 TB corpus is
    touched exactly once, map-only."""
    d = _t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    per = (
        d.select("source", n_tok.alias("_n"))
        .groupBy("source")
        .agg(F.sum("_n").alias("corpus_tokens"))
    )
    z = per.agg(F.sum(F.pow("corpus_tokens", F.lit(0.7))).alias("_z"))
    return per.crossJoin(F.broadcast(z)).select(
        "source",
        "corpus_tokens",
        F.round(F.pow("corpus_tokens", F.lit(0.7)) / F.col("_z"), 6).alias(
            "weight"
        ),
        F.round(
            F.lit(5_000_000)
            * F.pow("corpus_tokens", F.lit(0.7))
            / F.col("_z")
            / F.col("corpus_tokens"),
            6,
        ).alias("epochs_at_5m"),
    )


def q210_ngram_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style 13-gram decontamination audit [EXT]: for every held-out
    document (deterministic doc_id % 37 == 0 split), the fraction of its
    13-gram shingles that also occur anywhere in the training split, and
    how many distinct training documents collide. This is the shingle-
    level leakage report run before any benchmark number is trusted
    (q102 is the coarser benchmark-vocabulary containment; this is the
    per-eval-document n-gram form with train-side attribution).

    Scale shape: the join shuffles gram postings on gram hash —
    cardinality grows with the corpus, no reducer pile-up. In production
    the eval split is KB-to-MB against a 100 TB train side, so the gram
    join naturally builds on the tiny eval postings (AQE picks the
    broadcast); the LEFT join keeps clean eval docs in the report with
    zero hits.

    Shingling is the GENERATOR form — token array projected once per
    document, ``explode(sequence)`` of start positions, ``slice`` +
    ``array_join`` per gram — not ``shingle_ngrams``'s overlapping-regex
    form: the Generate boundary stops Catalyst from inlining the split
    into per-gram evaluation (the O(L²) HOF trap the regex form exists to
    avoid), and at n=13 the regex's 13-token lookahead at every boundary
    costs ~5× the slice (measured 2.5 s vs 0.5 s per pass at sf0.1).
    Postings are NOT per-doc distinct — every aggregate below is
    COUNT(DISTINCT ...), so duplicate grams change no result, and
    skipping the per-doc distinct never materializes shingle arrays."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    base = d.select("doc_id", "source", toks.alias("_w")).withColumn(
        "_n", F.size("_w")
    )
    posts = base.select(
        "doc_id",
        "source",
        "_w",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.col("_n") - 12, F.lit(1)))
        ).alias("_i"),
    ).select(
        "doc_id",
        "source",
        F.array_join(F.slice(F.col("_w"), F.col("_i"), 13), " ").alias("_g"),
    )
    tpost = posts.filter(F.col("doc_id") % 37 == 0).select(
        "doc_id", "source", "_g"
    )
    trpost = posts.filter(F.col("doc_id") % 37 != 0).select(
        F.col("doc_id").alias("_tid"), "_g"
    )
    hit_gram = F.when(F.col("_tid").isNotNull(), F.col("_g"))
    return (
        tpost.join(trpost, "_g", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count_distinct("_g").alias("n_grams"),
            F.count_distinct(hit_gram).alias("n_hit_grams"),
            F.count_distinct("_tid").alias("n_train_docs"),
        )
        .select(
            "doc_id",
            "source",
            "n_grams",
            "n_hit_grams",
            "n_train_docs",
            half_up(F.col("n_hit_grams") / F.col("n_grams"), 6).alias(
                "contamination"
            ),
        )
    )


def q211_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding label-quality audit [EXT]: per-label centroids (mean
    vector), then every vector re-assigned to its nearest centroid by L2
    distance — the confusion matrix (label, assigned, n_vectors) is the
    standard sanity check that a labeled embedding corpus actually
    clusters by its labels (off-diagonal mass = label noise or entangled
    classes). Nearest-centroid assignment with SUPERVISED centroids — the
    one-shot sibling of the iterative spherical k-means in
    ``similarity.spherical_kmeans_centroids``.

    Scale shape: posexplode → (pos, val) stream; centroids are a
    #labels×dim aggregate (tiny) broadcast back onto the stream; the
    distance partial-sums shuffle on (vec_id, label) with map-side
    combine; argmin is a per-vector window over #labels rows with a
    deterministic (d2, label) tie-break. All codegen — no Python, no
    driver-side centroid collect, no HOF lambdas in the per-pair path."""
    e = _t(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))
    cent = ex.groupBy(F.col("label").alias("clabel"), "pos").agg(
        F.avg("val").alias("cval")
    )
    diff = F.col("val") - F.col("cval")
    d2 = (
        ex.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "clabel")
        .agg(F.sum(diff * diff).alias("_d2"))
    )
    w = Window.partitionBy("vec_id").orderBy("_d2", "clabel")
    best = d2.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return best.groupBy("label", F.col("clabel").alias("assigned")).agg(
        F.count(F.lit(1)).alias("n_vectors")
    )


def q212_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment self-join [EXT]: ordered pairs (A, B) where
    >= 60% of A's 3-gram shingles appear in B — the quote / sub-document
    duplication signal Jaccard dilutes (q158) and the corpus-vs-corpus
    sibling of q102's benchmark containment. Prefix-filtered
    (probe-side-only prefix, lossless), exact verification on candidates.
    Stop-shingle skew is capped adaptively (``max_df="auto"`` = 4× the
    p99.9 document frequency): outlier shingles route through the salted
    exact residual join instead of piling f index postings + f·hits
    candidate rows onto one reducer key — output identical to the
    uncapped join (the oracle below is the uncapped brute join); see
    ``operators/dedup.containment_prefix_pairs`` for the 100 TB posture
    and why the cap chases outliers rather than a fixed constant."""
    d = _t(spark, sf_dir, "documents")
    return containment_prefix_pairs(
        d, "doc_id", "text", ngram=3, threshold=0.6, max_df="auto"
    )


def q213_spearman_length_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation [EXT] between document length and
    type-token ratio per language — the standard monotone-association
    check behind corpus heuristics ("longer docs repeat more"); Pearson
    (already in ``F.corr``) is distorted by heavy-tailed lengths, so rank
    correlation is the curation-grade statistic.

    Average ranks under ties computed as ``rank() + (tie_count - 1)/2``
    (two windows per variable, both partitioned by language), then
    Spearman rho = Pearson correlation of the rank columns via the
    built-in ``corr`` aggregate — no UDF, no driver math. Scale shape:
    the per-language rank windows are the inherent cost of an exact rank
    statistic (one sort per language partition); everything after is a
    map-side pair of products into one scalar aggregation per language."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    b = d.select(
        "lang",
        (F.col("n_chars") * 1.0).alias("x"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("y"),
    )

    def _avg_rank(col: str):
        return (
            F.rank().over(Window.partitionBy("lang").orderBy(col))
            + (
                F.count(F.lit(1)).over(Window.partitionBy("lang", col)) - 1
            )
            / 2.0
        )

    r = b.select(
        "lang", _avg_rank("x").alias("rx"), _avg_rank("y").alias("ry")
    )
    # explicit guarded moments (ANSI corr throws when all ranks tie)
    sn = F.count(F.lit(1)).cast("double")
    ssx, ssy = F.sum("rx"), F.sum("ry")
    ssxy = F.sum(F.col("rx") * F.col("ry"))
    ssxx = F.sum(F.col("rx") * F.col("rx"))
    ssyy = F.sum(F.col("ry") * F.col("ry"))
    svx = sn * ssxx - ssx * ssx
    svy = sn * ssyy - ssy * ssy
    return r.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.round(
                F.when(
                    (svx > 0) & (svy > 0),
                    (sn * ssxy - ssx * ssy) / F.sqrt(svx * svy),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("spearman_rho"),
    )


def q214_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic [EXT] between the
    token-length distributions of two sources: D = max |CDF_a - CDF_b|
    over the union of observed values, plus the value where the maximum
    is attained (deterministic min-value tie-break). The
    distribution-free sibling of q192's binned PSI — KS needs no bin
    choice and is the standard two-sample drift gate.

    Scale shape: lengths collapse to a (value, count_a, count_b)
    table bounded by VALUE GRANULARITY (the q206 argument — distinct
    token counts, not rows), the CDFs are one cumulative window over
    that bounded table, and the argmax uses the broadcast-max filter
    (no global rank window over data-sized frames)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    b = d.filter(F.col("source").isin("src0", "src1")).select(
        "source", F.size(toks).cast("long").alias("v")
    )
    cnt = b.groupBy("v").agg(
        F.count(F.when(F.col("source") == "src0", 1)).alias("c0"),
        F.count(F.when(F.col("source") == "src1", 1)).alias("c1"),
    )
    tot = cnt.agg(
        F.sum("c0").alias("n_a"), F.sum("c1").alias("n_b")
    )
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    diff = cnt.crossJoin(F.broadcast(tot)).select(
        "v",
        "n_a",
        "n_b",
        F.abs(
            F.sum("c0").over(wcum) / F.col("n_a")
            - F.sum("c1").over(wcum) / F.col("n_b")
        ).alias("_ad"),
    )
    mx = diff.agg(F.max("_ad").alias("_mx"))
    return (
        diff.crossJoin(F.broadcast(mx))
        .filter(F.col("_ad") == F.col("_mx"))
        .groupBy("n_a", "n_b")
        .agg(
            F.round(F.max("_ad"), 6).alias("ks_stat"),
            F.min("v").alias("at_value"),
        )
        .select("n_a", "n_b", "ks_stat", "at_value")
    )


def q215_vocab_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary Gini coefficient [EXT]: inequality of the token
    frequency distribution (0 = uniform usage, →1 = a few tokens dominate)
    — the corpus-health scalar next to q165's Zipf slope; templated or
    deduplication-damaged corpora spike it.

    Exact Gini from sorted frequencies G = 2·Σ(i·c_i)/(n·Σc) − (n+1)/n
    WITHOUT ranking individual vocabulary rows: ties share a frequency,
    so Σ(i·c_i) folds per DISTINCT frequency value into
    c·(2·cum_before + k + 1)·k/2 (the arithmetic-series block sum). The
    only window runs over the distinct-frequency table — bounded by value
    granularity, not vocabulary size (the q206 argument) — and every term
    stays integer until the final division, so the SQL oracle matches to
    the last bit. One data-sized shuffle (token counts), one bounded
    shuffle (frequency histogram)."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    dist = freq.groupBy("c").agg(F.count(F.lit(1)).alias("k"))
    wprev = Window.orderBy("c").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = dist.select(
        "c",
        "k",
        F.coalesce(F.sum("k").over(wprev), F.lit(0)).alias("_cb"),
    )
    block_ic = (
        F.col("c") * (2 * F.col("_cb") + F.col("k") + 1) * F.col("k") / 2
    )
    agg = cum.agg(
        F.sum("k").alias("_n"),
        F.sum(F.col("c") * F.col("k")).alias("_tot"),
        F.sum(block_ic).alias("_ic"),
    )
    return agg.select(
        F.col("_n").alias("vocab_size"),
        F.col("_tot").alias("total_tokens"),
        half_up(
            2.0 * F.col("_ic") / (F.col("_n").cast("double") * F.col("_tot"))
            - (F.col("_n") + 1.0) / F.col("_n"),
            6,
        ).alias("gini"),
    )


def q216_pii_redaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub audit [EXT]: per-segment counts of email/phone/ipv4/url
    hits found by ``functions.text.pii_counts`` and — the actual gate — the
    RESIDUAL match count after ``redact_pii`` ran (must be 0 everywhere:
    redaction that leaves a matchable substring is a leak, not a scrub).
    The testdata carries no free-text PII, so a deterministic contact
    string is constructed per customer from its own columns (every third
    customer lacks a phone, so counts differ per label) — which makes
    this a true cross-engine differential for the regex dialect:
    PII_PATTERNS deliberately sticks to syntax Java regex and DuckDB's
    RE2 interpret identically, and the oracle replays both the
    construction and all four patterns.

    Scale shape: pure map-side chained regexp (codegen, no UDF, no
    Python) + one per-segment aggregation — the cheapest possible shape
    for a 100 TB scrub pass."""
    c = _t(spark, sf_dir, "customer")
    digits = F.lpad(F.col("c_custkey").cast("string"), 10, "0")
    phone = F.concat(
        F.lit("+"), F.substring(digits, 1, 3), F.lit("-"),
        F.substring(digits, 4, 3), F.lit("-"), F.substring(digits, 7, 4),
    )
    email = F.concat(
        F.lower(F.regexp_replace("c_name", "#", "")), F.lit("@example.com")
    )
    ip = F.concat_ws(
        ".",
        (F.col("c_custkey") % 256).cast("string"),
        (F.col("c_nationkey") % 256).cast("string"),
        (F.col("c_custkey") % 100).cast("string"),
        F.lit("7"),
    )
    txt = F.concat(
        F.col("c_name"), F.lit(" <"), email, F.lit(">"),
        F.when(F.col("c_custkey") % 3 != 0, F.concat(F.lit(" tel "), phone))
        .otherwise(F.lit("")),
        F.lit(" ip "), ip,
        F.lit(" https://hub.example/c/"), F.lower("c_mktsegment"),
    )
    cnt = pii_counts(txt)
    residual = pii_counts(redact_pii(txt))
    labels = [label for label, _ in PII_PATTERNS]
    return (
        c.select(
            "c_mktsegment",
            *[cnt[lbl].alias(f"_{lbl}") for lbl in labels],
            sum([residual[lbl] for lbl in labels], F.lit(0)).alias("_res"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            *[F.sum(f"_{lbl}").alias(f"n_{lbl}") for lbl in labels],
            F.sum("_res").alias("residual_matches"),
        )
    )


def q217_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment [EXT]: every document maps to
    a stable shard via the first 8 hex digits of md5(doc_id) mod 32 —
    content-independent, reshuffle-free across runs AND engines (md5 is
    bit-identical everywhere; xxhash64 would be Spark-only), the layout
    step every epoch-shuffled training loader runs before writing shards.
    Output is the balance audit: per-shard doc/token mass plus relative
    deviation from the ideal uniform share (a loader stalls on its fattest
    shard, so skew here IS the training-throughput bug).

    Scale shape: one map-side hash projection (no shuffle to assign), one
    32-key aggregation with map-side combine, and the 2-row expected-share
    scalar crossJoin-broadcast back (q214's pattern — no global window,
    no second scan of the corpus)."""
    d = _t(spark, sf_dir, "documents")
    shard = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(32),
    )
    per = (
        d.select(
            shard.alias("shard_id"),
            whitespace_token_count(F.col("text")).alias("_tok"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tok").alias("n_tokens"),
        )
    )
    tot = per.agg(
        F.sum("n_docs").alias("_nd"), F.count(F.lit(1)).alias("_ns")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "shard_id",
        "n_docs",
        "n_tokens",
        half_up(
            F.col("n_docs") / (F.col("_nd") * 1.0 / F.col("_ns")) - 1.0, 6
        ).alias("doc_skew"),
    )


def q218_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding outlier audit [EXT]: distance of each vector to
    its own label's centroid, z-scored within the label, top-3 per label —
    the mislabeled/corrupt-vector screen (CleanLab-style confident-learning
    signal reduced to its distributional core) run before embeddings feed
    contrastive training; q211 is the cross-label confusion sibling.

    Scale shape: centroids via one (label, pos) aggregation over the
    posexploded vectors (640 rows — broadcast back), per-vector distance as
    a second aggregation on (vec_id, label), per-label moment scalars
    broadcast again, and the top-3 via a rank window partitioned by label.
    No pairwise joins anywhere — linear in vectors at every step."""
    emb = _t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x")
    )
    cent = ex.groupBy("label", "pos").agg(F.avg("x").alias("c"))
    dist = (
        ex.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).alias("_d2"))
        .select("vec_id", "label", F.sqrt("_d2").alias("_d"))
    )
    stats = dist.groupBy("label").agg(
        F.avg("_d").alias("_mu"), F.stddev_samp("_d").alias("_sd")
    )
    # degenerate labels carry no outlier signal and cannot be z-scored:
    # n=1 gives sd NULL, and a 2-member label gives sd EXACTLY 0 (both
    # members are equidistant from their midpoint centroid by symmetry) —
    # reachable on sparse data, where the unguarded division crashed under
    # ANSI (round-10 sparse sweep, seed 271829). Filtering also dodges the
    # engines' opposite NULL-ordering defaults in the rank window.
    stats = stats.filter(F.col("_sd").isNotNull() & (F.col("_sd") > 0))
    z = dist.join(F.broadcast(stats), "label").select(
        "label", "vec_id", ((F.col("_d") - F.col("_mu")) / F.col("_sd")).alias("_z")
    )
    w = Window.partitionBy("label").orderBy(F.col("_z").desc(), "vec_id")
    return (
        z.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("label", "vec_id", F.round("_z", 6).alias("z_score"), "rank")
    )


def q219_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weighting [EXT] (Xie et al. 2023, reduced to
    its unigram core): per-document mean log-ratio of add-one-smoothed
    token probabilities under the TARGET distribution (the 'en' slice)
    vs the whole corpus — the data-selection score that upweights
    documents resembling the target domain. Reported per source: document
    count, mean importance, and how many documents a weight>0 gate keeps.

    Scale shape: the token-ratio model is one vocabulary-sized aggregation
    (tiny — broadcast), so scoring is a map-side broadcast join over the
    exploded token stream plus one per-doc and one per-source aggregation.
    The 100 TB corpus is never joined to itself and the model table is
    O(vocab), not O(corpus)."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "source",
        "lang",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    cnt = tok.groupBy("w").agg(
        F.count(F.lit(1)).alias("_ca"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("_ce"),
    )
    tots = cnt.agg(
        F.sum("_ca").alias("_ta"),
        F.sum("_ce").alias("_te"),
        F.count(F.lit(1)).alias("_v"),
    )
    model = cnt.crossJoin(F.broadcast(tots)).select(
        "w",
        (
            F.log((F.col("_ce") + 1) / (F.col("_te") + F.col("_v")))
            - F.log((F.col("_ca") + 1) / (F.col("_ta") + F.col("_v")))
        ).alias("_s"),
    )
    per_doc = (
        tok.join(F.broadcast(model), "w")
        .groupBy("doc_id", "source")
        .agg(F.avg("_s").alias("_wgt"))
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        # half-safe: _wgt is a mean of log-probability ratios (irrational)
        # — not an integer ratio; a d=6 half-boundary hit has measure zero
        F.round(F.avg("_wgt"), 6).alias("avg_importance"),
        F.count(F.when(F.col("_wgt") > 0, 1)).alias("n_selected"),
    )


def q220_scalable_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global row numbering WITHOUT a data-sized global window
    [EXT]: the classic distributed rewrite of ``row_number() OVER (ORDER BY
    k)`` — which Spark executes as a SINGLE task holding the whole dataset
    (the exact WindowExec funnel tests/test_plan_audit.py gates). Instead:
    value-bucket the order key into 32 ranges (min/max scalars broadcast),
    number rows per bucket with a PARTITIONED window (parallel), prefix-sum
    the 32 bucket counts into offsets (the only unpartitioned window — over
    a <=32-row post-agg table, whitelisted with that argument), and
    broadcast the offsets back. Same answer as the single-task form,
    verified against exactly that form as the oracle; at 100 TB the rewrite
    is the difference between one 100 TB task and none. Production range
    partitioning would use ``repartitionByRange`` sampling; fixed value
    buckets keep the plan deterministic for the differential."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    mnmx = d.agg(
        F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx")
    )
    span = F.ceil((F.col("_mx") - F.col("_mn") + 1) / 32)
    bucketed = d.crossJoin(F.broadcast(mnmx)).select(
        "doc_id",
        "source",
        F.least(
            F.lit(31), F.floor((F.col("doc_id") - F.col("_mn")) / span)
        ).alias("_b"),
    )
    bcnt = bucketed.groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))
    woff = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offs = bcnt.select(
        "_b", F.coalesce(F.sum("_c").over(woff), F.lit(0)).alias("_off")
    )
    w = Window.partitionBy("_b").orderBy("doc_id")
    return (
        bucketed.withColumn("_r", F.row_number().over(w))
        .join(F.broadcast(offs), "_b")
        .select(
            "doc_id", "source",
            (F.col("_r") + F.col("_off")).cast("long").alias("global_idx"),
        )
    )


def q221_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed engagement score [EXT]: per event type,
    sum of values weighted by exp(-ln2 · age/half_life) with a 7-day
    half-life anchored at the stream's max timestamp — the feature-store
    aggregate behind 'recent activity' signals, where a plain windowed sum
    forgets nothing and a short window forgets everything. Decay needs no
    per-row state: the weight is a pure map-side expression, so the whole
    query is one scan + one 5-key aggregation (contrast with the running-
    state formulation, which would serialize per key). Timestamps go
    through epoch seconds (events.ts is TIMESTAMP_NTZ — Spark 4 forbids a
    direct double cast; `operators/sessions._epoch_seconds`)."""
    from hubverse_transform_spark.operators.sessions import _epoch_seconds

    e = _t(spark, sf_dir, "events")
    mx = e.agg(F.max("ts").alias("_mxts"))
    age = _epoch_seconds(F.col("_mxts")) - _epoch_seconds(F.col("ts"))
    half_life = 7 * 86400.0
    wgt = F.exp(F.lit(-0.6931471805599453) * age / F.lit(half_life))
    return (
        e.crossJoin(F.broadcast(mx))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value") * wgt), 6).alias("decayed_value"),
            F.round(F.sum(wgt), 6).alias("effective_events"),
        )
    )


def q222_brand_price_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS [EXT]: regress line revenue on quantity within each part
    brand with the SQL-standard ``regr_slope / regr_intercept / regr_r2``
    aggregates — the grouped linear-fit every feature store and pricing
    analysis runs (elasticity screens, drift-vs-volume fits). The slope IS
    the quantity-weighted mean unit price, the r2 how much price dispersion
    within the brand breaks the linear story; both engines implement the
    same standard definitions so the differential pins them cross-engine.

    Scale shape: regr_* are algebraic aggregates (sums of x, y, xy, x², y²)
    — one scan, map-side partial aggregation, one 25-key shuffle; the
    part→brand dimension joins broadcast. No window, no second pass."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    x = F.col("l_quantity").cast("double")
    y = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double")
    return (
        li.join(p.select("p_partkey", "p_brand"),
                li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.regr_slope(y, x), 4).alias("slope"),
            F.round(F.regr_intercept(y, x), 4).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
        )
    )


def q223_symspell_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance join via SymSpell deletion neighborhoods [EXT]: all
    supplier-name pairs with Levenshtein distance <= 1, WITHOUT the O(n²)
    cross join the oracle runs. Any two strings within one edit share at
    least one member of {self} ∪ {all single-character deletions}
    (substitution → both delete the edited position; insert/delete → the
    longer's deletion equals the shorter), so generating the ~L variants per
    name (linear side — the per-row HOF runs once per NAME, never per pair)
    turns the similarity join into an equi-join on the variant key, followed
    by an exact ``levenshtein`` verify on the candidate pairs only. At 100 TB
    this is the difference between |corpus|·L join rows and |corpus|²
    comparisons; the variant key is also the natural LSH-style partition key,
    and a df-cap on hot variants (the q212 pattern) bolts on unchanged.

    Cross-engine note: Spark and DuckDB both expose classic Levenshtein, so
    the verify predicate is dialect-safe."""
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return edit_distance_pairs(s, "s_suppkey", "s_name", max_dist=1).select(
        F.col("id_a").alias("suppkey_a"),
        F.col("id_b").alias("suppkey_b"),
        "dist",
    )


def q224_segment_nation_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical dependence audit [EXT]: mutual information (nats),
    chi-square statistic, and Cramér's V between customer market segment and
    nation — the feature-redundancy / leakage screen run before a categorical
    column is admitted as a training feature (high MI against the label or
    against an existing feature means redundancy or leakage). Testdata
    assigns segments independently of nation, so the expected result is
    MI ≈ 0 with V near 0 — the audit's null baseline.

    Scale shape: one (segment, nation) aggregation over the corpus (map-side
    combine, 125 cells), then everything downstream — marginals, expected
    counts, the three statistics — runs on the 125-row contingency table
    with broadcast joins. The corpus is scanned exactly once."""
    c = _t(spark, sf_dir, "customer")
    joint = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("_nxy")
    )
    seg = joint.groupBy("c_mktsegment").agg(F.sum("_nxy").alias("_nx"))
    nat = joint.groupBy("c_nationkey").agg(F.sum("_nxy").alias("_ny"))
    tot = joint.agg(
        F.sum("_nxy").alias("_n"),
        F.count_distinct("c_mktsegment").alias("_r"),
        F.count_distinct("c_nationkey").alias("_c"),
    )
    cell = (
        joint.join(F.broadcast(seg), "c_mktsegment")
        .join(F.broadcast(nat), "c_nationkey")
        .crossJoin(F.broadcast(tot))
    )
    n = F.col("_n").cast("double")
    exp = F.col("_nx") * F.col("_ny") / n
    mi_term = (F.col("_nxy") / n) * F.log(F.col("_nxy") * n / (F.col("_nx") * F.col("_ny")))
    chi_term = (F.col("_nxy") - exp) * (F.col("_nxy") - exp) / exp
    return cell.groupBy("_n", "_r", "_c").agg(
        F.round(F.sum(mi_term), 6).alias("mi_nats"),
        F.round(F.sum(chi_term), 4).alias("chi2"),
    ).select(
        F.col("_n").cast("long").alias("n_customers"),
        "mi_nats",
        "chi2",
        F.round(
            F.sqrt(F.col("chi2") / (F.col("_n") * F.least(F.col("_r") - 1, F.col("_c") - 1))),
            6,
        ).alias("cramers_v"),
    )


def q225_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit [EXT]: distribution of the first significant
    digit of order totals against Benford's law ``log10(1 + 1/d)`` with
    per-digit chi-square contributions — the classic fabricated-numbers /
    broken-upstream-generator screen for financial columns (synthetic
    uniform-ish prices deliberately FAIL Benford, which the audit surfaces
    rather than hides). First digit is extracted arithmetically
    (``floor(x / 10^floor(log10 x))``), not via string formatting, so both
    engines agree bit-for-bit.

    Scale shape: pure map-side digit projection + one 9-key aggregation with
    map-side combine; the 1-row total broadcasts back. One scan, no window."""
    o = _t(spark, sf_dir, "orders")
    x = F.col("o_totalprice").cast("double")
    digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x)))).cast("long")
    per = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    tot = per.agg(F.sum("n_orders").alias("_n"))
    obs = F.col("n_orders") / F.col("_n")
    exp = F.log(F.lit(1.0) + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    return per.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n_orders",
        F.round(obs, 6).alias("obs_share"),
        F.round(exp, 6).alias("benford_share"),
        F.round(F.col("_n") * (obs - exp) * (obs - exp) / exp, 4).alias("chi2_term"),
    )


def q228_incremental_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup ingest gate [EXT]: every 10th document plays the
    'today's batch' role and is checked against the rest of the corpus via
    ``minhash_lsh_incremental_pairs`` — band keys on both sides, the BATCH
    side broadcast, the corpus side streamed map-only (never shuffled, never
    self-joined). Same banding/verify parameters as q23, so the oracle is
    q23's SQL with the candidate join restricted to (new × corpus); at 100 TB
    the corpus's banded table is persisted once and only the O(batch) probe
    side is computed per ingest."""
    d = _t(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 10 == 0)
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    return minhash_lsh_incremental_pairs(
        new, corpus, "doc_id", "text", ngram=3, num_hashes=8, bands=4, threshold=0.1
    ).select("new_id", "corpus_id", half_up(F.col("jaccard"), 6).alias("jaccard"))


def q226_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams
    [EXT]: counts and row-normalized probabilities of (previous event type →
    event type), ordered by (ts, event_id) within each user — the behavioral
    model behind next-action prediction features and funnel-shape drift
    monitors (q174 reports whole session paths; this is the edge-level
    aggregate those paths marginalize to).

    Scale shape: one lag window PARTITIONED by user (parallel, state = one
    row), one 25-cell aggregation with map-side combine, and the per-prev
    row normalization as a second window over the 25-row result — never the
    event stream. One scan end-to-end."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.select(
            "user_id",
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        "n",
        half_up(F.col("n") / F.sum("n").over(wp), 6).alias("prob"),
    )


def q227_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact φ-heavy-hitter vocabulary [EXT]: tokens holding ≥ 2% of the
    corpus token mass, via bounded-memory Misra–Gries partition candidates
    (mapInPandas, k = 2·⌈1/φ⌉ counters) + an exact recount restricted to
    the broadcast candidate set — O(1/φ·partitions) shuffled keys instead
    of O(vocab), with the candidate-superset guarantee making the final
    counts EXACT (the oracle is the full-vocabulary groupBy this replaces).
    The stopword/boilerplate screen every tokenizer-training and
    contamination pipeline runs first; ``operators/textstats.py``
    ``heavy_hitter_tokens`` docstring carries the proof sketch, and the
    eviction path is unit-tested on skew the testdata's 31-word vocabulary
    cannot trigger."""
    d = _t(spark, sf_dir, "documents")
    return heavy_hitter_tokens(d, "text", phi=0.02)


def q229_logreg_gradient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact logistic-regression gradient step, distributed [EXT]: the
    shape every data-parallel trainer (SGD/L-BFGS) runs per iteration —
    weights broadcast (literals here: w = [0.3, −0.2], b = 0.1), per-row
    gradient computed map-side, ONE global aggregation for the gradient
    vector and log-loss. Predicts lang='en' from two document scalars
    (chars/1000, ws-tokens/100). At 100 TB each step is exactly one scan +
    one scalar-tuple reduce — no shuffle of features, no driver-side data —
    and the differential pins the math (sigmoid/log-loss) cross-engine.

    Scale shape: whole-stage-codegen projection + single partial/final agg;
    the iterative loop (not declared here) would checkpoint weights between
    steps, q72's pagerank pattern."""
    d = _t(spark, sf_dir, "documents")
    x1 = F.col("n_chars") / 1000.0
    x2 = whitespace_token_count(F.col("text")) / 100.0
    y = F.when(F.col("lang") == "en", 1.0).otherwise(0.0)
    z = F.lit(0.3) * x1 + F.lit(-0.2) * x2 + F.lit(0.1)
    s = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return d.select(
        x1.alias("_x1"), x2.alias("_x2"), y.alias("_y"), s.alias("_s")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        # half-safe: every gradient term contains the sigmoid _s
        # (exp-based, irrational) — a d=6 half-boundary hit has measure zero
        F.round(F.avg((F.col("_s") - F.col("_y")) * F.col("_x1")), 6).alias("grad_chars"),
        F.round(F.avg((F.col("_s") - F.col("_y")) * F.col("_x2")), 6).alias("grad_tokens"),
        F.round(F.avg(F.col("_s") - F.col("_y")), 6).alias("grad_bias"),
        F.round(
            F.avg(
                -(F.col("_y") * F.log("_s") + (1 - F.col("_y")) * F.log(1 - F.col("_s")))
            ),
            6,
        ).alias("log_loss"),
    )


def q230_welch_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between event cohorts [EXT]: per
    event-type pair ('click' as control vs every other type), mean uplift,
    Welch t-statistic, and Welch–Satterthwaite degrees of freedom over the
    event value — the A/B experiment readout, computed from ONE pass of
    per-cohort algebraic moments (count/avg/var_samp with FILTER) and a
    5-row broadcast of the control moments. No per-row second scan, no
    driver math; both engines share var_samp semantics so the statistic
    hash-matches."""
    e = _t(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("mu"),
        F.var_samp("value").alias("v"),
    )
    ctrl = per.filter(F.col("event_type") == "click").select(
        F.col("n").alias("_nc"), F.col("mu").alias("_muc"), F.col("v").alias("_vc")
    )
    t = per.filter(F.col("event_type") != "click").crossJoin(F.broadcast(ctrl))
    se2 = F.col("v") / F.col("n") + F.col("_vc") / F.col("_nc")
    dof = (se2 * se2) / (
        (F.col("v") / F.col("n")) * (F.col("v") / F.col("n")) / (F.col("n") - 1)
        + (F.col("_vc") / F.col("_nc")) * (F.col("_vc") / F.col("_nc")) / (F.col("_nc") - 1)
    )
    return t.select(
        F.col("event_type").alias("variant"),
        "n",
        F.round(F.col("mu") - F.col("_muc"), 6).alias("uplift"),
        F.round((F.col("mu") - F.col("_muc")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(dof, 4).alias("welch_dof"),
    )


def q231_twap_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price/value (TWAP) per event type [EXT]: each
    observation is weighted by how long it remained the latest one
    (``lead(ts) − ts``; the stream tail carries no interval and is
    dropped) — the standard featurization for IRREGULARLY-sampled series,
    where a plain avg over-weights bursts (30 quotes in a volatile minute
    vs 1 in a quiet hour). Deterministic tie-break on (ts, event_id).

    Scale shape: one lead window PARTITIONED by event type (parallel, one
    row of lookahead state), one 5-key aggregation. Timestamps route via
    epoch seconds (events.ts is TIMESTAMP_NTZ)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    # exact integer microseconds (ts is NTZ; pin the wall clock to UTC so
    # unix_micros is timezone-independent) — the weight unit cancels in
    # the TWAP ratio, and an integer weight keeps the numerator exact
    us = F.unix_micros(F.to_utc_timestamp(F.col("ts"), "UTC"))
    us_next = F.unix_micros(F.to_utc_timestamp(F.lead("ts").over(w), "UTC"))
    iv = e.select(
        "event_type",
        "value",
        (us_next - us).alias("_w"),
    ).filter(F.col("_w").isNotNull())
    return iv.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        # value sits on the cent grid and _w is integer micros, so both
        # the weighted and the plain mean have exact-integer numerators
        _half_up(F.sum(_cents("value") * F.col("_w")), F.sum("_w") * 100, 6).alias("twap"),
        _half_up(F.sum(_cents("value")), F.count(F.lit(1)) * 100, 6).alias("plain_avg"),
    )


def q232_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event type [EXT]: cumulative sum of
    daily-mean deviations from the series mean; the day where |CUSUM| peaks
    is the most likely level-shift location and the peak magnitude the
    shift evidence (Page's statistic, the standard drift alarm for metric
    time series — the monitor a training-data pipeline points at its daily
    quality/volume metrics).

    Scale shape: the corpus collapses to a (type, day) aggregation first
    (150 rows); the running CUSUM window, the series-mean broadcast, and
    the argmax ranking all run on that bounded table — the corpus is
    scanned once."""
    # EXACT integer pipeline (tiny-tier seed 13579 hit a d=6 half boundary
    # of the old float cusum): daily means round to 1e-6-unit integers
    # md = half_up(cents_sum/(100·nd), 6)·1e6, and with D days and
    # T = Σmd the statistic D·cusum_k = D·P_k − k·T is exact integer
    # arithmetic — the peak argmax ranks on |D·cusum_k| and the display is
    # the exact rational |M|/(D·1e6) half-up at 6, identical per engine.
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("_day")
    ).agg(
        F.floor(
            F.sum(_cents("value")).cast("double") * 1e4 / F.count(F.lit(1))
            + 0.5
        )
        .cast("long")
        .alias("_md")
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("_dd"), F.sum("_md").alias("_tt")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("_day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wk = Window.partitionBy("event_type").orderBy("_day")
    cusum = (
        daily.join(F.broadcast(stats), "event_type")
        .withColumn(
            "_m",
            F.col("_dd") * F.sum("_md").over(wc)
            - F.row_number().over(wk) * F.col("_tt"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("_m")).desc(), "_day"
    )
    return (
        cusum.withColumn("_r", F.row_number().over(wr))
        .filter(F.col("_r") == 1)
        .select(
            "event_type",
            F.date_format("_day", "yyyy-MM-dd").alias("peak_day"),
            _half_up(F.abs(F.col("_m")), F.col("_dd") * F.lit(1000000), 6).alias(
                "cusum_peak"
            ),
        )
    )


def q233_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurizer [EXT]: tokens map to a FIXED 16-bucket
    feature space via md5 (bucket = first 8 hex digits mod 16, sign = ±1
    off the 9th digit — the signed hashing trick that debiases collisions,
    Weinberger et al. 2009), summing term frequency × sign per (doc,
    bucket). The vocabulary-free featurizer for linear models/quality
    classifiers at corpus scale: no vocab table to build, broadcast, or
    version — the feature space is a pure function of the token bytes,
    identical across engines and across ingest batches. Long-form output
    (doc_id, bucket, feat) keeps it oracle-comparable; q229 is the model
    step such features feed. Emitted for the first 50 docs to bound the
    differential, the featurization itself is corpus-wide map-side.

    Scale shape: explode + one (doc, bucket) aggregation with map-side
    combine — no joins, no windows, no vocabulary state."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    bucket = F.pmod(
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long"), F.lit(16)
    )
    sign = F.when(
        F.substring(F.md5("w"), 9, 1).isin(*list("02468ace")), F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        tok.select("doc_id", bucket.alias("bucket"), sign.alias("_s"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("_s").alias("feat"))
    )


def q234_roc_auc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day ROC-AUC via the Mann–Whitney U rank-sum [EXT]: how well the
    event ``value`` separates converting events (purchase/signup) from the
    rest, scored day by day — the standard offline-eval readout for any
    scoring model. Exact tie-corrected AUC WITHOUT a per-row rank window:
    rows first collapse to the (day, value) distinct-value table (events
    values live on a 2-decimal grid, so the collapsed table is bounded by
    ~49k rows per day REGARDLESS of corpus size), then
    U = Σ_v n_pos(v)·(cum_neg_below(v) + ½·n_neg(v)) and AUC = U/(P·N) —
    the pairs-won formulation, algebraically identical to average-rank AUC.

    Scale shape: one (day, value) aggregation with map-side combine, one
    running-sum window PARTITIONED by day over the bounded collapsed table,
    one per-day aggregation. No global window, no O(n log n) rank over raw
    rows, no driver math."""
    e = _t(spark, sf_dir, "events")
    lab = e.select(
        F.to_date("ts").alias("_day"),
        "value",
        F.when(F.col("event_type").isin("purchase", "signup"), 1)
        .otherwise(0)
        .alias("_y"),
    )
    g = lab.groupBy("_day", "value").agg(
        F.sum("_y").alias("_pos"),
        F.sum(F.lit(1) - F.col("_y")).alias("_neg"),
    )
    w = (
        Window.partitionBy("_day")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = g.withColumn("_cneg", F.sum("_neg").over(w) - F.col("_neg"))
    return (
        ranked.groupBy("_day")
        .agg(
            F.sum("_pos").alias("n_pos"),
            F.sum("_neg").alias("n_neg"),
            F.sum(
                F.col("_pos") * (F.col("_cneg") + 0.5 * F.col("_neg"))
            ).alias("_u"),
        )
        .select(
            F.date_format("_day", "yyyy-MM-dd").alias("day"),
            "n_pos",
            "n_neg",
            # a day with no positives (or no negatives) has no ranking to
            # score: AUC undefined -> NULL (ultra-sparse data reaches this)
            F.when(
                (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                half_up(F.col("_u") / (F.col("n_pos") * F.col("n_neg")), 6),
            ).alias("auc"),
        )
    )


def q235_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration / Expected Calibration Error for a q229-family logistic
    model (same features, spread-calibrated weights so the reliability
    diagram exercises all bins) [EXT]: probabilities bucket into 10 fixed
    bins; per bin, mean confidence vs empirical accuracy and their gap; the
    scalar ECE (Σ share·|acc−conf|, Guo et al. 2017) rides every row via a
    1-row broadcast. The reliability diagram a model-based quality filter
    (q151) needs before its scores can gate data.

    Scale shape: scoring and binning are pure map-side column exprs (no
    UDF, no vocab), then ONE 10-key aggregation; the ECE reduction runs on
    the 10-row bin table. One corpus scan total."""
    d = _t(spark, sf_dir, "documents")
    x1 = (F.col("n_chars") - 300.0) / 100.0
    x2 = (whitespace_token_count(F.col("text")) - 50.0) / 20.0
    y = F.when(F.col("lang") == "en", 1.0).otherwise(0.0)
    s = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(0.9) * x1 + F.lit(-0.7) * x2 + F.lit(0.1))))
    bins = (
        d.select(
            F.least(F.floor(s * 10), F.lit(9)).alias("bin"),
            s.alias("_s"),
            y.alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("_s").alias("_conf"),
            F.avg("_y").alias("_acc"),
        )
    )
    tot = bins.agg(
        F.sum("n").alias("_tot"),
        F.sum(F.abs(F.col("_acc") - F.col("_conf")) * F.col("n")).alias("_werr"),
    )
    return (
        bins.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n",
            F.round("_conf", 6).alias("confidence"),
            # _acc is an exact indicator ratio k/n — engine-stable half-up
            half_up(F.col("_acc"), 6).alias("accuracy"),
            F.round(F.abs(F.col("_acc") - F.col("_conf")), 6).alias("gap"),
            F.round(F.col("_werr") / F.col("_tot"), 6).alias("ece"),
        )
    )


def q236_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-limited BFS reachability over the part co-purchase graph [EXT]:
    minimum hop distance from the seed parts (p_partkey ≤ 5) through
    ``operators/graph.bfs_hops`` — frontier expansion + visited anti-join,
    which computes min-hop with |V| rows of state where path enumeration
    (the recursive-CTE form, q150) would blow up exponentially on a dense
    co-occurrence graph. Output: per-hop reached-node count and a bit_xor
    key checksum so the oracle pins WHICH nodes, not just how many.

    Scale shape: per round one shuffled-hash join (frontier side is the
    small one — AQE would broadcast it in early rounds on a cluster), one
    distinct, one co-partitioned anti-join; fixed 3 rounds, everything
    persisted per round and released on return. The oracle mirrors the
    rounds as unrolled hop CTEs (h1/h2/h3 with NOT IN visited), not path
    recursion."""
    from hubverse_transform_spark.operators.graph import bfs_hops

    edges = _q72_edges(spark, sf_dir)
    seeds = edges.filter(F.col("src") <= 5).select(F.col("src").alias("node"))
    reached = bfs_hops(edges, seeds, max_hops=3)
    return (
        reached.groupBy("hop")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.bit_xor(F.col("node")).alias("node_xor"),
        )
        .orderBy("hop")
    )


def q237_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curves per market segment [EXT]: customer
    "lifetime" = days between first and last order; a lifetime is an
    OBSERVED churn event when the last order predates the dataset horizon
    (global max order date, 1-row broadcast) by more than 365 days,
    otherwise right-CENSORED — the product-limit estimator
    S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) with censored lifetimes leaving the risk
    set silently (Kaplan & Meier 1958). The retention readout for cohort
    planning. Running product realized as exp(Σ ln·) with a 1e-300 floor
    so a terminal dᵢ=nᵢ collapses to S=0 identically in both engines.

    Scale shape: per-customer collapse is one co-keyed aggregation; the KM
    recursion runs on the bounded (segment × distinct-lifetime) table
    (≤ date-span rows per segment) with windows PARTITIONED by segment.
    Emits death times only (d>0)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    life = o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("_first"), F.max("o_orderdate").alias("_last")
    )
    horizon = o.agg(F.max("o_orderdate").alias("_hmax"))
    per = (
        life.crossJoin(F.broadcast(horizon))
        .join(c, life.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.datediff("_last", "_first").alias("t"),
            F.when(F.datediff("_hmax", "_last") > 365, 1).otherwise(0).alias("_ev"),
        )
    )
    tbl = per.groupBy("segment", "t").agg(
        F.sum("_ev").alias("d"), F.count(F.lit(1)).alias("_all")
    )
    wseg = Window.partitionBy("segment").orderBy("t")
    km = (
        tbl.withColumn(
            "n_risk",
            F.sum("_all").over(
                Window.partitionBy("segment").orderBy("t").rowsBetween(
                    0, Window.unboundedFollowing
                )
            ),
        )
        .withColumn(
            "_lnS",
            F.sum(
                F.log(
                    F.greatest(
                        F.lit(1.0) - F.col("d") / F.col("n_risk"), F.lit(1e-300)
                    )
                )
            ).over(wseg.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return km.filter(F.col("d") > 0).select(
        "segment",
        "t",
        "n_risk",
        "d",
        F.round(F.exp("_lnS"), 6).alias("survival"),
    )


def q238_acf_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily order series at lags 1–7 days
    [EXT]: Pearson corr between the daily (count, revenue) series and its
    lag-k shift — the seasonality/persistence diagnostic behind any
    forecasting or anomaly baseline (the weekly harmonic shows up as a
    lag-7 peak). Lag alignment is an equi-join of the daily table against
    itself on ``day − k`` via a 7-row lag spine — no per-lag window pass,
    no global-window rank.

    Scale shape: the corpus collapses to one (day) aggregation first
    (~2.4k rows at any SF — the date span bounds it); the 7-lag spine
    crossJoin and self-join run on that bounded table. One corpus scan."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("_day")).agg(
        F.count(F.lit(1)).alias("_n"), F.sum("o_totalprice").alias("_rev")
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    d2 = daily.select(
        F.col("_day").alias("_day2"),
        F.col("_n").alias("_n2"),
        F.col("_rev").alias("_rev2"),
    )
    pairs = (
        daily.crossJoin(F.broadcast(lags))
        .join(d2, F.date_sub(F.col("_day"), F.col("lag")) == F.col("_day2"))
    )
    # engine-native corr() THROWS under ANSI when a series has zero
    # variance (tiny-tier data: all-equal daily counts at some lag) and a
    # CASE cannot guard inside an aggregate — compute Pearson from
    # explicit moments with the variance terms guarded (q344 pattern),
    # identical formula in the oracle
    def _pearson(xc: str, yc: str):
        x = F.col(xc).cast("double")
        y = F.col(yc).cast("double")
        n = F.count(F.lit(1)).cast("double")
        sx, sy = F.sum(x), F.sum(y)
        sxy, sxx, syy = F.sum(x * y), F.sum(x * x), F.sum(y * y)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        return F.when(
            (vx > 0) & (vy > 0), (n * sxy - sx * sy) / F.sqrt(vx * vy)
        )

    return (
        pairs.groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(_pearson("_n", "_n2"), 6).alias("acf_count"),
            F.round(_pearson("_rev", "_rev2"), 6).alias("acf_revenue"),
        )
        .orderBy("lag")
    )


def q239_qq_decile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile–quantile drift readout [EXT]: exact per-decile values of
    the event ``value`` distribution, first week vs last week, and their
    gap — WHERE the distribution moved, complementing KS (q214: max CDF
    gap) and PSI (q-psi: binned mass shift). percentile_disc semantics
    (smallest v with cdf ≥ k/10) realized by rank selection over the
    (cohort, value) distinct-value table with an integer-exact threshold
    (``cum·10 ≥ k·tot`` — no float cdf), so both engines pick identical
    grid values and the hash matches bit-for-bit.

    Scale shape: one (cohort, value) aggregation (bounded: events values
    live on a ~49k-point 2-decimal grid), windows PARTITIONED by cohort,
    a 9-row decile spine joined against the bounded table, one 9-key
    aggregation. No single-reducer percentile buffer (the q40 trap)."""
    e = _t(spark, sf_dir, "events")
    coh = e.select(
        F.when(F.to_date("ts") < F.lit("2024-01-08"), "first_week")
        .when(F.to_date("ts") >= F.lit("2024-01-24"), "last_week")
        .alias("cohort"),
        "value",
    ).filter(F.col("cohort").isNotNull())
    g = coh.groupBy("cohort", "value").agg(F.count(F.lit(1)).alias("_c"))
    wc = (
        Window.partitionBy("cohort")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = g.withColumn("_cum", F.sum("_c").over(wc)).withColumn(
        "_tot", F.sum("_c").over(Window.partitionBy("cohort"))
    )
    ks = spark.range(1, 10).select(F.col("id").cast("int").alias("decile"))
    qs = (
        cum.crossJoin(F.broadcast(ks))
        .filter(F.col("_cum") * 10 >= F.col("decile") * F.col("_tot"))
        .groupBy("cohort", "decile")
        .agg(F.min("value").alias("_q"))
    )
    return (
        qs.groupBy("decile")
        .pivot("cohort", ["first_week", "last_week"])
        .agg(F.first("_q"))
        .select(
            "decile",
            F.round("first_week", 2).alias("q_first"),
            F.round("last_week", 2).alias("q_last"),
            F.round(F.col("last_week") - F.col("first_week"), 2).alias("gap"),
        )
        .orderBy("decile")
    )


def q240_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-optimal (Neyman) stratified-sample allocation [EXT]: split a
    10,000-row sampling budget across market segments proportionally to
    N_h·S_h (stratum size × within-stratum stddev of order value) — the
    allocation that minimizes estimator variance for a fixed budget
    (Neyman 1934), and what a data-curation pipeline uses to budget QA
    samples across heterogeneous sources. Integerization is exact
    largest-remainder (floor + rank of fractional parts), so allocations
    always sum to the budget — composes q190's Hamilton apportionment with
    one-pass moment aggregation.

    Scale shape: one co-keyed join + one 5-key moment aggregation; the
    allocation arithmetic (two 1-row broadcasts + remainder rank) runs on
    the 5-row stratum table."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.stddev_samp("o_totalprice").alias("_s"),
        )
    )
    tot = per.agg(F.sum(F.col("n_orders") * F.col("_s")).alias("_ns"))
    quota = per.crossJoin(F.broadcast(tot)).withColumn(
        "_quota", F.lit(10000.0) * F.col("n_orders") * F.col("_s") / F.col("_ns")
    ).withColumn("_base", F.floor("_quota"))
    left = quota.agg((F.lit(10000) - F.sum("_base")).alias("_left"))
    wr = Window.orderBy(
        (F.col("_quota") - F.col("_base")).desc(), F.col("segment")
    )
    return (
        quota.withColumn("_r", F.row_number().over(wr))
        .crossJoin(F.broadcast(left))
        .select(
            "segment",
            "n_orders",
            F.round("_s", 2).alias("stddev_price"),
            (
                F.col("_base")
                + F.when(F.col("_r") <= F.col("_left"), 1).otherwise(0)
            ).cast("long").alias("alloc"),
        )
    )


def q241_seasonal_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal decomposition of daily order revenue [EXT]:
    multiplicative seasonal index per weekday (mean daily revenue on that
    weekday ÷ overall mean daily revenue) — the first stage of any
    classical decomposition / forecasting baseline, and the correction
    factor behind 'is Monday volume actually low?' monitoring. Weekday via
    ``weekday()`` (0=Monday) with the oracle on ``isodow−1`` so both
    engines share the encoding.

    Scale shape: the corpus collapses to the bounded (day) table first
    (date span caps it at any SF); the 7-key weekday aggregation and the
    1-row overall-mean broadcast run on that table. One corpus scan."""
    o = _t(spark, sf_dir, "orders")
    # exact cent sums: the weekday mean is then an exact integer ratio
    # Sw/nw and the seasonal index an exact ratio Sw*n/(nw*S) — both were
    # round()s of order-dependent float averages with reachable half
    # boundaries; double-side multipliers keep every product overflow-free
    daily = o.groupBy(F.to_date("o_orderdate").alias("_day")).agg(
        F.sum(_cents("o_totalprice")).alias("_u")
    )
    dow = daily.groupBy(F.weekday("_day").alias("dow")).agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("_u").alias("_sw")
    )
    overall = daily.agg(
        F.sum("_u").alias("_s_all"), F.count(F.lit(1)).alias("_n_all")
    )
    return (
        dow.crossJoin(F.broadcast(overall))
        .select(
            "dow",
            "n_days",
            _half_up(F.col("_sw"), F.col("n_days") * 100, 2).alias(
                "avg_revenue"
            ),
            (
                F.floor(
                    F.col("_sw").cast("double")
                    * F.col("_n_all")
                    * 1e6
                    / (F.col("n_days").cast("double") * F.col("_s_all"))
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("seasonal_index"),
        )
        .orderBy("dow")
    )


def q242_robust_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust trend per event type: Theil–Sen slope + Mann–Kendall test
    [EXT] — the outlier-resistant complement to OLS trend (q-OLS breaks on
    one bad day; the median-of-pairwise-slopes estimator has a 29%
    breakdown point, and the MK S statistic gives a distribution-free
    monotone-trend signal). Daily means are rounded to the 6-decimal grid
    BEFORE pairing so both engines order identical slope values; the
    median is lower-median rank selection (row_number = ⌊(n+1)/2⌋), exact
    and interpolation-free.

    Scale shape: the corpus collapses to (type, day) first; the pairwise
    self-join runs on that bounded table (≤ C(span,2) rows per type —
    ~435 at a 30-day span — INDEPENDENT of corpus size), windows
    partitioned by type."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("_day")
    ).agg(
        # exact half-up keeps the 6-decimal grid engine-identical (the
        # grid is what makes downstream slope ordering deterministic)
        _half_up(F.sum(_cents("value")), F.count(F.lit(1)) * 100, 6).alias("_mu")
    )
    b = daily.select(
        F.col("event_type").alias("_t2"),
        F.col("_day").alias("_day2"),
        F.col("_mu").alias("_mu2"),
    )
    pairs = daily.join(
        b,
        (F.col("event_type") == F.col("_t2")) & (F.col("_day") < F.col("_day2")),
    ).select(
        "event_type",
        (
            (F.col("_mu2") - F.col("_mu"))
            / F.datediff("_day2", "_day")
        ).alias("_slope"),
        F.signum(F.col("_mu2") - F.col("_mu")).alias("_sgn"),
    )
    agg = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("_sgn").cast("long").alias("mk_s"),
    )
    wm = Window.partitionBy("event_type").orderBy("_slope")
    med = (
        pairs.withColumn("_rn", F.row_number().over(wm))
        .join(agg, "event_type")
        .filter(F.col("_rn") == F.floor((F.col("n_pairs") + 1) / 2))
        .select("event_type", half_up(F.col("_slope"), 6).alias("theil_sen_slope"))
    )
    return agg.join(med, "event_type").select(
        "event_type",
        "n_pairs",
        "mk_s",
        half_up(F.col("mk_s") / F.col("n_pairs"), 6).alias("kendall_tau"),
        "theil_sen_slope",
    )


def q243_best_split_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed decision-stump learning [EXT]: per day, the value
    threshold that best separates converting events (purchase/signup) by
    information gain — every distinct value is a split candidate, and ALL
    candidates are scored in ONE window pass over cumulative class counts
    (the sorted-scan trick every scalable tree learner uses: gain at
    threshold v needs only (cum_pos, cum_neg) at v plus day totals — no
    per-candidate scan).

    Scale shape: rows collapse to the (day, value) grid (bounded: events
    values live on a 2-decimal grid), cumulative and total windows are
    PARTITIONED by day, argmax is a row_number pick. Gain math runs on
    exact integer counts, so both engines produce bit-identical doubles."""
    e = _t(spark, sf_dir, "events")
    lab = e.select(
        F.to_date("ts").alias("_day"),
        "value",
        F.when(F.col("event_type").isin("purchase", "signup"), 1)
        .otherwise(0)
        .alias("_y"),
    )
    g = lab.groupBy("_day", "value").agg(
        F.sum("_y").alias("_pos"), F.sum(F.lit(1) - F.col("_y")).alias("_neg")
    )
    wc = (
        Window.partitionBy("_day")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("_day")
    cum = (
        g.withColumn("_cp", F.sum("_pos").over(wc))
        .withColumn("_cn", F.sum("_neg").over(wc))
        .withColumn("_tp", F.sum("_pos").over(wt))
        .withColumn("_tn", F.sum("_neg").over(wt))
    )

    def ent(p):
        return F.when(
            (p <= 0) | (p >= 1), F.lit(0.0)
        ).otherwise(-(p * F.log2(p) + (1 - p) * F.log2(1 - p)))

    nl = F.col("_cp") + F.col("_cn")
    nr = (F.col("_tp") - F.col("_cp")) + (F.col("_tn") - F.col("_cn"))
    n = F.col("_tp") + F.col("_tn")
    gain = (
        ent(F.col("_tp") / n)
        - (nl / n) * ent(F.col("_cp") / nl)
        - (nr / n) * ent((F.col("_tp") - F.col("_cp")) / nr)
    )
    scored = cum.filter(nr > 0).select(
        "_day",
        "value",
        nl.alias("n_left"),
        nr.alias("n_right"),
        gain.alias("_gain"),
    )
    wbest = Window.partitionBy("_day").orderBy(F.col("_gain").desc(), "value")
    return (
        scored.withColumn("_r", F.row_number().over(wbest))
        .filter(F.col("_r") == 1)
        .select(
            F.date_format("_day", "yyyy-MM-dd").alias("day"),
            F.col("value").alias("best_threshold"),
            F.round("_gain", 6).alias("info_gain"),
            "n_left",
            "n_right",
        )
    )


def q244_gain_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model gain/lift table [EXT]: rank documents by a logistic quality
    score (q235's model), cut the population into score-ordered deciles,
    and report per-decile positive capture + lift — THE campaign/filter
    targeting readout ('the top 20% of scores holds 55% of the
    positives'). Scores quantize to a 3-decimal grid first, so the
    cumulative ranking runs over a ≤1001-row table regardless of corpus
    size, and decile membership is integer-exact (ceil(cum·10/tot)); the
    decile's cumulative capture is max(cum_pos) — monotone, so no second
    ranking pass.

    Scale shape: one corpus scan into the bounded score-grid aggregation;
    ONE global window over the ≤1001-row grid (whitelisted: bounded by
    score granularity, not data volume); 10-key final aggregation."""
    d = _t(spark, sf_dir, "documents")
    x1 = (F.col("n_chars") - 300.0) / 100.0
    x2 = (whitespace_token_count(F.col("text")) - 50.0) / 20.0
    y = F.when(F.col("lang") == "en", 1).otherwise(0)
    s = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-(F.lit(0.9) * x1 + F.lit(-0.7) * x2 + F.lit(0.1)))
    )
    g = (
        d.select(F.round(s, 3).alias("_s3"), y.alias("_y"))
        .groupBy("_s3")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum("_y").alias("_pos"))
    )
    wg = Window.orderBy(F.col("_s3").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = g.withColumn("_cn", F.sum("_n").over(wg)).withColumn(
        "_cp", F.sum("_pos").over(wg)
    )
    tot = g.agg(F.sum("_n").alias("_tot"), F.sum("_pos").alias("_tpos"))
    dec = (
        cum.crossJoin(F.broadcast(tot))
        .withColumn(
            "decile", F.ceil(F.col("_cn") * 10 / F.col("_tot")).cast("int")
        )
        .groupBy("decile")
        .agg(
            F.sum("_n").alias("n"),
            F.sum("_pos").alias("n_pos"),
            F.max("_cp").alias("_cum_pos"),
            F.first("_tot").alias("_t"),
            F.first("_tpos").alias("_tp"),
        )
    )
    return dec.select(
        "decile",
        "n",
        "n_pos",
        half_up(F.col("_cum_pos") / F.col("_tp"), 6).alias("capture_rate"),
        half_up(
            (F.col("n_pos") / F.col("n")) / (F.col("_tp") / F.col("_t")), 6
        ).alias("lift"),
    ).orderBy("decile")


# q245's adaptive plan choice (weight-pruned lev<=2 join vs degenerate
# all-pairs fallback) costs one scalar count() job at composition time.
# Memoize the decision per customer-table identity (path + mtime + size) so
# only the FIRST composition per dataset is eager — bench re-runs, repeated
# test compositions, and plan-dump tooling after a first pass stay lazy.
_Q245_BRANCH: dict = {}


def _q245_branch_key(sf_dir: str):
    p = os.path.join(sf_dir, "customer.parquet")
    try:
        st = os.stat(p)
        return (os.path.realpath(p), st.st_mtime_ns, st.st_size)
    except OSError:
        return (os.path.realpath(p), None, None)


def q245_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter probabilistic record-linkage scoring [EXT]: customer
    pairs (semantically: every within-nation pair), scored by summing
    per-field log-likelihood match weights (agree → ln(m/u), disagree →
    ln((1−m)/(1−u)), literal 6-decimal weights so both engines add
    identical doubles) over three comparison fields — market segment,
    name edit-distance (lev ≤ 2), acctbal 500-bucket. Top-20 by weight
    with full key tie-break: the classic ER decision model
    (Fellegi & Sunter 1969).

    Scale shape — WEIGHT-PRUNED blocking, not all-pairs: nation has FIXED
    cardinality (25), so a nation-blocked self-join grows quadratically
    with data (measured ×100 ratio 42.0 in round 7 — the repo's one
    super-linear plan). The weights themselves prove a far smaller
    candidate set exact: the lowest possible weight of a NAME-AGREEING
    pair is −2.079442 + 6.856462 − 1.504077 = 3.272943, while the highest
    possible weight of a name-DISagreeing pair is
    1.504077 − 2.995632 + 2.079442 = 0.587887 < 3.272943. So whenever at
    least 20 name-agreeing pairs exist, the global top-20 is a subset of
    them, and the quadratic comparison space collapses to the lev≤2
    similarity join — ``edit_distance_pairs``' deletion-neighborhood
    equi-join (|corpus|·L² candidate rows, variant key = shuffle key,
    data-scaling cardinality), nation-blocked to preserve the pair
    predicate. The candidate count is one scalar aggregate action
    (adaptive plan choice, the same pattern as dedup's auto ``max_df``);
    the all-pairs fallback only ever runs on degenerate corpora with
    fewer than 20 near-identical names.

    Measured rejection: a tier-1 cascade (block additionally on
    seg × bal, emit only all-three-agree pairs at the strictly-highest
    weight) produced 100× fewer candidates at sf1 (25k vs 2.74M) but ran
    SLOWER (42 s vs 29 s) — the 2×25.8M-row variant explode+shuffle
    dominates regardless of block tightness, and the composite string
    block key only widened the shuffle rows. sf1 runtime is paced by the
    true lev≤2 candidate count (2.74M pairs at 150k names), not by a
    plan defect."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        "c_name",
        F.floor(F.col("c_acctbal") / 500).alias("_bal"),
    )
    # ln(m/u), ln((1-m)/(1-u)) at 6 decimals: seg m=.9 u=.2, name-lev<=2
    # m=.95 u=.001, bal-bucket m=.8 u=.1 — literal weights, not engine
    # ln(), so both engines sum identical doubles
    seg_w = (1.504077, -2.079442)
    name_w = (6.856462, -2.995632)
    bal_w = (2.079442, -1.504077)
    from hubverse_transform_spark.caching import compute_release

    # persist: the count() that picks the plan is also the job that fills
    # the cache, so the scoring pass reads candidates back instead of
    # re-running the variant self-join (compute_release frees it on exit);
    # on a memoized repeat the candidate set is composed lazily (it is
    # consumed exactly once in the scoring DAG, so no persist is needed)
    key = _q245_branch_key(sf_dir)
    memoized = _Q245_BRANCH.get(key)
    if memoized is None:
        cand = edit_distance_pairs(
            c, "c_custkey", "c_name", max_dist=2, block_col="c_nationkey"
        ).persist()
        big = cand.count() >= 20
        _Q245_BRANCH[key] = big
        if not big:
            cand.unpersist()
    else:
        big = memoized
        cand = (
            edit_distance_pairs(
                c, "c_custkey", "c_name", max_dist=2, block_col="c_nationkey"
            )
            if big
            else None
        )
    if big:
        attrs = c.select(
            "c_custkey", "c_mktsegment", "_bal"
        )
        scored = (
            cand.join(
                attrs.select(
                    F.col("c_custkey").alias("id_a"),
                    F.col("c_mktsegment").alias("_seg1"),
                    F.col("_bal").alias("_bal1"),
                ),
                "id_a",
            )
            .join(
                attrs.select(
                    F.col("c_custkey").alias("id_b"),
                    F.col("c_mktsegment").alias("_seg2"),
                    F.col("_bal").alias("_bal2"),
                ),
                "id_b",
            )
            .select(
                F.col("id_a").alias("cust1"),
                F.col("id_b").alias("cust2"),
                F.round(
                    F.when(F.col("_seg1") == F.col("_seg2"), F.lit(seg_w[0]))
                    .otherwise(F.lit(seg_w[1]))
                    + F.lit(name_w[0])  # lev<=2 holds for every candidate
                    + F.when(F.col("_bal1") == F.col("_bal2"), F.lit(bal_w[0]))
                    .otherwise(F.lit(bal_w[1])),
                    6,
                ).alias("match_weight"),
            )
        )
        top = scored.orderBy(
            F.col("match_weight").desc(), "cust1", "cust2"
        ).limit(20)
        if memoized is None:
            # first composition: release the persisted candidates after one
            # eager materialization of the 20-row output
            return compute_release(top, cand)
        # memoized repeat: cand is consumed exactly once in this DAG — stay
        # fully lazy (no persist to release, no eager job)
        return top
    # degenerate-corpus fallback: all within-nation pairs (tiny by
    # precondition — fewer than 20 name-agreeing pairs exist at all)
    b = c.select(
        F.col("c_custkey").alias("_k2"),
        F.col("c_nationkey").alias("_n2"),
        F.col("c_mktsegment").alias("_seg2"),
        F.col("c_name").alias("_name2"),
        F.col("_bal").alias("_bal2"),
    )
    pairs = c.join(
        b,
        (F.col("c_nationkey") == F.col("_n2"))
        & (F.col("c_custkey") < F.col("_k2")),
    )
    lev_le2 = F.levenshtein(F.col("c_name"), F.col("_name2"), 2) >= 0
    score = (
        F.when(F.col("c_mktsegment") == F.col("_seg2"), F.lit(seg_w[0]))
        .otherwise(F.lit(seg_w[1]))
        + F.when(lev_le2, F.lit(name_w[0])).otherwise(F.lit(name_w[1]))
        + F.when(F.col("_bal") == F.col("_bal2"), F.lit(bal_w[0]))
        .otherwise(F.lit(bal_w[1]))
    )
    return (
        pairs.select(
            F.col("c_custkey").alias("cust1"),
            F.col("_k2").alias("cust2"),
            F.round(score, 6).alias("match_weight"),
        )
        .orderBy(F.col("match_weight").desc(), "cust1", "cust2")
        .limit(20)
    )


def q246_conformal_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split conformal prediction intervals per event type [EXT]: calibrate
    on the first half of the month (nonconformity = |value − type mean|,
    rounded to the 4-decimal grid so both engines rank identical scores),
    take the ⌈(n+1)·0.9⌉-th smallest score as the 90% radius q̂ (the
    finite-sample-valid split-conformal quantile, Vovk et al.), then AUDIT
    empirical coverage on the held-out second half — distribution-free
    uncertainty quantification, the wrapper that turns any point forecast
    into a calibrated interval.

    Scale shape: two one-pass aggregations (calibration moments, test
    coverage) + rank selection over the per-type distinct-score table
    (bounded by the events value grid), windows PARTITIONED by type."""
    e = _t(spark, sf_dir, "events")
    cal = e.filter(F.to_date("ts") < F.lit("2024-01-16"))
    test = e.filter(F.to_date("ts") >= F.lit("2024-01-16"))
    # EXACT nonconformity: with C = sum of cents and n = n_cal, the score
    # |value − C/(100n)| scales by the per-type constant 100n to the exact
    # integer |cents(value)·n − C| — ranking and the coverage comparison run
    # on integers, so no float average / round-4 grid can diverge across
    # engines (ultra-sparse seed 787 hit the d=4 half boundary of the old
    # rounded-score form; the mean itself is order-dependent in float)
    mom = cal.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_cal"),
        F.sum(_cents("value")).alias("_c"),
    )
    scores = cal.join(F.broadcast(mom), "event_type").select(
        "event_type",
        "n_cal",
        F.abs(_cents("value") * F.col("n_cal") - F.col("_c")).alias("_si"),
    )
    wr = Window.partitionBy("event_type").orderBy("_si")
    qhat = (
        scores.withColumn("_rn", F.row_number().over(wr))
        .filter(F.col("_rn") == F.ceil((F.col("n_cal") + 1) * 0.9))
        .select("event_type", "n_cal", F.col("_si").alias("_qi"))
    )
    cov = (
        test.join(F.broadcast(mom.select("event_type", "_c")), "event_type")
        .join(F.broadcast(qhat), "event_type")
        .groupBy("event_type", "n_cal", "_qi")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(
                    F.abs(_cents("value") * F.col("n_cal") - F.col("_c"))
                    <= F.col("_qi"),
                    1,
                ).otherwise(0)
            ).alias("_hit"),
        )
    )
    return cov.select(
        "event_type",
        "n_cal",
        "n_test",
        _half_up(F.col("_qi"), F.lit(100) * F.col("n_cal"), 4).alias("q_hat"),
        half_up(F.col("_hit") / F.col("n_test"), 6).alias("coverage"),
    )


def q247_simpson_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit [EXT]: the OLS slope of customer spend on
    account balance computed in AGGREGATE vs WITHIN each nation, with a
    flip flag where the stratum slope's sign contradicts the aggregate —
    the classic confounding check any metrics platform should run before
    reporting a pooled trend (Simpson 1951). regr_slope is the
    SQL-standard algebraic aggregate, one pass per grouping.

    Scale shape: the per-customer spend collapse is one co-keyed join +
    aggregation; both regressions are single-pass algebraic aggregates;
    the 1-row aggregate slope rides as a broadcast."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    spend = (
        o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("_spend"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
    )
    overall = spend.agg(
        F.regr_slope("_spend", "c_acctbal").alias("_oslope")
    )
    per = spend.groupBy(F.col("c_nationkey").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.regr_slope("_spend", "c_acctbal").alias("_slope"),
    )
    return (
        per.crossJoin(F.broadcast(overall))
        .select(
            "nation",
            "n_cust",
            F.round("_slope", 6).alias("nation_slope"),
            F.round("_oslope", 6).alias("overall_slope"),
            (F.signum("_slope") != F.signum("_oslope")).alias("sign_flip"),
        )
    )


def q248_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the brand partition over the part co-purchase
    graph [EXT]: Q = Σ_c (e_c/m − (d_c/2m)²) — does the brand attribute
    explain the co-purchase structure better than chance? The quality
    score behind every community-detection loop (Louvain's objective),
    computed here for a GIVEN partition in two aggregation passes: per
    community, within-community edge count e_c and total degree d_c, with
    the global edge count as a 1-row broadcast. Per-brand contribution
    rows + the scalar Q on every row.

    Scale shape: two joins edge→part-brand (co-partitioned on partkey; the
    part side is dimension-sized), one count aggregation per community, one
    whitelisted global sum over the 25-row community table; integer counts
    make the doubles bit-identical cross-engine."""
    edges = _q72_edges(spark, sf_dir)
    brand = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    lab = (
        edges.join(
            brand.select(
                F.col("p_partkey").alias("src"), F.col("p_brand").alias("_bs")
            ),
            "src",
        )
        .join(
            brand.select(
                F.col("p_partkey").alias("dst"), F.col("p_brand").alias("_bd")
            ),
            "dst",
        )
    )
    m = lab.agg((F.count(F.lit(1)) / 2).alias("_m"))
    per = lab.groupBy(F.col("_bs").alias("brand")).agg(
        F.count(F.lit(1)).alias("_deg"),
        F.sum(F.when(F.col("_bs") == F.col("_bd"), 1).otherwise(0)).alias(
            "_within2"
        ),
    )
    qexpr = (F.col("_within2") / 2) / F.col("_m") - F.pow(
        F.col("_deg") / (2 * F.col("_m")), 2
    )
    contrib = per.crossJoin(F.broadcast(m)).select(
        "brand", "_within2", "_deg", qexpr.alias("_q")
    )
    # scalar Q via a bounded global window over the 25-row brand table
    # (NB: "_Q" would collide with "_q" — Spark names are case-insensitive)
    return contrib.withColumn(
        "_qtot", F.sum("_q").over(Window.partitionBy())
    ).select(
        "brand",
        (F.col("_within2") / 2).cast("long").alias("e_within"),
        F.col("_deg").alias("degree_sum"),
        # +0.0 normalizes IEEE negative zero: round(-1e-9, 6) keeps the
        # sign bit in one engine and not the other (seed-2718 differential)
        (F.round("_q", 6) + F.lit(0.0)).alias("contribution"),
        (F.round("_qtot", 6) + F.lit(0.0)).alias("modularity"),
    )


def q249_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round k-core peeling (k=120) of the part co-purchase graph
    [EXT]: iteratively drop nodes with degree < k and the edges touching
    them — the densest-substructure screen used to find tightly
    co-occurring item groups (and, in pipeline terms, template/boilerplate
    clusters). Three FIXED peeling rounds (bit-stable for the oracle; the
    emitted round-3/round-2 deltas show convergence), each round = one
    degree aggregation + one semi-join filter of the edge list.

    Scale shape: per round, degree is a map-side-combined count on src
    (symmetric edges: out-degree == degree), the survivor filter is two
    co-partitioned semi-joins; edge set shrinks monotonically; all
    intermediates persisted per round, released on return."""
    from hubverse_transform_spark.caching import compute_release

    edges = _q72_edges(spark, sf_dir).persist()
    cached = [edges]
    rows = []
    cur = edges
    k = 120
    snap = []
    for rnd in range(4):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
        stats = cur.agg(
            F.lit(rnd).alias("round"),
            F.count_distinct("src").alias("n_nodes"),
            (F.count(F.lit(1)) / 2).cast("long").alias("n_edges"),
        )
        snap.append(stats)
        if rnd == 3:
            break
        keep = deg.filter(F.col("_deg") >= k).select("src").persist()
        nxt = (
            cur.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .persist()
        )
        cached += [keep, nxt]
        cur = nxt
    out = snap[0]
    for s in snap[1:]:
        out = out.unionByName(s)
    return compute_release(out.orderBy("round"), *cached)


def q250_backtest_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest folds over the event stream [EXT]: fold f
    trains on days 1..7f and tests on days 7f+1..7f+7 (expanding window,
    the standard time-series CV that never leaks the future), with
    per-fold row counts and LABEL-SHIFT audit (test conversion share −
    train conversion share) — the fold-construction + drift readout an
    evaluation harness needs before trusting backtest metrics.

    Scale shape: ONE corpus scan — the fold spine (3 rows) cross-joins the
    per-day aggregate table (bounded by the date span), so fold membership
    is evaluated on day aggregates, never by re-scanning events per
    fold."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("_day")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(
            F.when(F.col("event_type").isin("purchase", "signup"), 1).otherwise(0)
        ).alias("_conv"),
    )
    folds = spark.range(1, 4).select(F.col("id").cast("int").alias("fold"))
    tagged = daily.crossJoin(F.broadcast(folds)).withColumn(
        "_part",
        F.when(
            F.datediff("_day", F.lit("2024-01-01")) < F.col("fold") * 7, "train"
        )
        .when(
            F.datediff("_day", F.lit("2024-01-01")) < (F.col("fold") + 1) * 7,
            "test",
        ),
    ).filter(F.col("_part").isNotNull())
    per = tagged.groupBy("fold", "_part").agg(
        F.sum("_n").alias("_rows"), F.sum("_conv").alias("_c")
    )
    wide = (
        per.groupBy("fold")
        .pivot("_part", ["train", "test"])
        .agg(F.first("_rows").alias("rows"), F.first("_c").alias("conv"))
    )
    return wide.select(
        "fold",
        F.col("train_rows").alias("train_rows"),
        F.col("test_rows").alias("test_rows"),
        half_up(F.col("train_conv") / F.col("train_rows"), 6).alias("train_conv_rate"),
        half_up(F.col("test_conv") / F.col("test_rows"), 6).alias("test_conv_rate"),
        half_up(
            F.col("test_conv") / F.col("test_rows")
            - F.col("train_conv") / F.col("train_rows"),
            6,
        ).alias("label_shift"),
    ).orderBy("fold")


def q251_hits_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities on the customer→part purchase bipartite
    graph [EXT], two fixed mutual-reinforcement rounds with L1
    normalization: authority(part) = Σ hub(customer) over buyers,
    hub(customer) = Σ authority(part) over their basket — 'influential
    parts are bought by broad customers; broad customers buy influential
    parts' (Kleinberg 1999). The OTHER canonical eigenvector ranking next
    to q72's PageRank, and on a bipartite graph the two sides genuinely
    differ. Top-20 authorities with key tie-break.

    Scale shape: each half-round is one co-partitioned join edge⋈scores +
    one aggregation (the PageRank two-shuffle pattern); normalizers ride
    as 1-row broadcasts; fixed rounds keep it bit-stable."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .distinct()
    )
    # round 1: hub = basket size, normalized; auth = Σ normalized hubs
    hub1 = edges.groupBy("cust").agg(F.count(F.lit(1)).cast("double").alias("_h"))
    h1n = hub1.agg(F.sum("_h").alias("_hs"))
    hub1 = hub1.crossJoin(F.broadcast(h1n)).select(
        "cust", (F.col("_h") / F.col("_hs")).alias("_h")
    )
    auth1 = (
        edges.join(hub1, "cust")
        .groupBy("part")
        .agg(F.sum("_h").alias("_a"))
    )
    a1n = auth1.agg(F.sum("_a").alias("_as"))
    auth1 = auth1.crossJoin(F.broadcast(a1n)).select(
        "part", (F.col("_a") / F.col("_as")).alias("_a")
    )
    # round 2: hub = Σ auth over basket; auth = Σ hub over buyers
    hub2 = (
        edges.join(auth1, "part").groupBy("cust").agg(F.sum("_a").alias("_h2"))
    )
    h2n = hub2.agg(F.sum("_h2").alias("_hs2"))
    hub2 = hub2.crossJoin(F.broadcast(h2n)).select(
        "cust", (F.col("_h2") / F.col("_hs2")).alias("_h2")
    )
    auth2 = (
        edges.join(hub2, "cust").groupBy("part").agg(F.sum("_h2").alias("_a2"))
    )
    a2n = auth2.agg(F.sum("_a2").alias("_as2"))
    return (
        auth2.crossJoin(F.broadcast(a2n))
        .select(
            "part",
            F.round(F.col("_a2") / F.col("_as2") * 1e6, 6).alias("authority_ppm"),
        )
        .orderBy(F.col("authority_ppm").desc(), "part")
        .limit(20)
    )


def q252_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation over the part co-purchase graph
    [EXT]: every 10th part keeps its brand as a SEED label; two synchronous
    rounds spread labels to unlabeled neighbors by neighbor-majority vote
    (mode of labeled neighbors, deterministic min-label tie-break) — the
    transductive labeling pass (Zhu & Ghahramani 2002) a pipeline uses to
    extend sparse human labels across a similarity graph. Output: per-brand
    labeled-node counts per round plus the residual unlabeled count, so the
    propagation front is visible.

    Scale shape: per round, one join edges⋈labels + one (node, label)
    count aggregation + one per-node argmax window (partitioned by node);
    seeds stay fixed (clamped), labels monotone — 2 rounds, bit-stable."""
    edges = _q72_edges(spark, sf_dir)
    brand = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    nodes = (
        edges.select(F.col("src").alias("node")).distinct()
        .join(brand, F.col("node") == F.col("p_partkey"))
        .select(
            "node",
            F.when(F.col("node") % 10 == 0, F.col("p_brand")).alias("label"),
        )
    )
    cur = nodes
    for _ in range(2):
        labeled = cur.filter(F.col("label").isNotNull()).select(
            F.col("node").alias("src"), F.col("label").alias("_nl")
        )
        votes = (
            edges.join(labeled, "src")
            .groupBy(F.col("dst").alias("node"), "_nl")
            .agg(F.count(F.lit(1)).alias("_v"))
        )
        wv = Window.partitionBy("node").orderBy(F.col("_v").desc(), "_nl")
        winner = (
            votes.withColumn("_r", F.row_number().over(wv))
            .filter(F.col("_r") == 1)
            .select("node", F.col("_nl").alias("_win"))
        )
        cur = (
            cur.join(winner, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("label"), F.col("_win")).alias("label"),
            )
        )
    return (
        cur.groupBy(F.coalesce(F.col("label"), F.lit("UNLABELED")).alias("label"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


def q253_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the part co-purchase graph [EXT]: Pearson
    correlation of endpoint degrees over the edge list — do hubs link to
    hubs (r>0, social-network shape) or to leaves (r<0, hub-and-spoke)?
    The one-number topology fingerprint (Newman 2002) that tells a
    blocking/partitioning strategy what degree skew to expect.

    Scale shape: one degree aggregation, two co-partitioned joins to tag
    each edge with (deg_src, deg_dst), one corr() pass — corr is algebraic
    and single-pass; no windows, no driver math."""
    edges = _q72_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
    tagged = (
        edges.join(deg, "src")
        .withColumnRenamed("_d", "_ds")
        .join(deg.withColumnRenamed("src", "dst").withColumnRenamed("_d", "_dd"), "dst")
    )
    # engine-native corr() THROWS under ANSI on zero variance (tiny-tier
    # graphs: every endpoint degree equal) — explicit guarded moments,
    # identical formula in the oracle (q238/q344 pattern)
    x = F.col("_ds").cast("double")
    y = F.col("_dd").cast("double")
    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum(x), F.sum(y)
    sxy, sxx, syy = F.sum(x * y), F.sum(x * x), F.sum(y * y)
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    return tagged.agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_edges"),
        _half_up(F.sum("_ds"), F.count(F.lit(1)), 4).alias("avg_degree"),
        F.round(
            F.when(
                (vx > 0) & (vy > 0), (n * sxy - sx * sy) / F.sqrt(vx * vy)
            ),
            6,
        ).alias("assortativity"),
    )


def q254_readability_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability profile per language [EXT]: mean syllables-per-word
    (vowel-group count as the standard syllable heuristic) and the share
    of 'complex' words (≥ 3 vowel groups) — the Flesch/FK ingredients that
    survive a corpus with no sentence structure (this synthetic corpus has
    none, so the sentence-length term is meaningless and deliberately
    omitted). A pipeline uses these as quality/difficulty features.

    Scale shape: syllable totals are map-side regexp_count; the
    complex-word share needs per-token granularity → explode + one (lang)
    aggregation with map-side combine. One corpus scan per branch."""
    d = _t(spark, sf_dir, "documents")
    totals = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.regexp_count(F.lower("text"), F.lit("[aeiouy]+"))).alias("_syl"),
        F.sum(whitespace_token_count(F.col("text"))).alias("_words"),
    )
    tok = d.select(
        "lang",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("_w"),
    ).filter(F.col("_w") != "")
    cx = tok.groupBy("lang").agg(
        F.sum(
            F.when(F.regexp_count("_w", F.lit("[aeiouy]+")) >= 3, 1).otherwise(0)
        ).alias("_cx"),
        F.count(F.lit(1)).alias("_nw"),
    )
    return totals.join(cx, "lang").select(
        "lang",
        "n_docs",
        half_up(F.col("_syl") / F.col("_words"), 6).alias("syllables_per_word"),
        half_up(F.col("_cx") / F.col("_nw"), 6).alias("complex_word_share"),
    )


def q255_doc_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-entropy repetitiveness screen, rolled up per
    language [EXT]: Shannon entropy of each doc's own token distribution
    (low entropy = template/boilerplate/stuttering text — the repetition
    signal n-gram rules miss when the repeats aren't adjacent) plus the
    distinct-token ratio; per-language mean/min so the worst offenders are
    visible. Complements the Gopher duplicate-n-gram fraction with an
    order-free measure.

    Scale shape: explode → (doc, token) count aggregation (map-side
    combine; state bounded by per-doc vocab), per-doc entropy is one more
    keyed aggregation using the log-identity H = log2(n) − Σc·log2(c)/n
    (no per-doc total join needed), then a 5-key rollup."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("_w"),
    ).filter(F.col("_w") != "")
    cnt = tok.groupBy("doc_id", "lang", "_w").agg(F.count(F.lit(1)).alias("_c"))
    per_doc = cnt.groupBy("doc_id", "lang").agg(
        (
            F.log2(F.sum("_c"))
            - F.sum(F.col("_c") * F.log2("_c")) / F.sum("_c")
        ).alias("_H"),
        (F.count(F.lit(1)) / F.sum("_c")).alias("_dr"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        # half-safe: _H is log2-based Shannon entropy (irrational except
        # degenerate single-token docs) — boundary hits have measure zero
        F.round(F.avg("_H"), 6).alias("avg_entropy"),
        F.round(F.min("_H"), 6).alias("min_entropy"),
        # half-safe: _dr is a mean of per-doc rationals with heterogeneous
        # denominators (vocab/total per doc); a d=6 half boundary needs the
        # reduced sum denominator to be exactly 2*10^6*odd — measure-zero
        F.round(F.avg("_dr"), 6).alias("avg_distinct_ratio"),
    )


def q256_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class classifier evaluation of the stopword-profile lang-ID
    against the labeled lang column [EXT]: support, TP, precision, recall,
    F1 per true class — the metric derivation layer on top of q27's raw
    confusion counts, computed entirely from ONE confusion-matrix
    aggregation (per-class FP/FN are sums over the tiny class×class
    table, no second corpus pass).

    Scale shape: one corpus scan into the ≤36-cell confusion table; all
    metric math runs on that bounded table (two rollups + one join)."""
    d = _t(spark, sf_dir, "documents")
    conf = (
        d.select("lang", lang_id_expr(F.col("text")).alias("_pred"))
        .groupBy("lang", "_pred")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    tp = conf.filter(F.col("lang") == F.col("_pred")).select(
        "lang", F.col("_n").alias("_tp")
    )
    support = conf.groupBy("lang").agg(F.sum("_n").alias("support"))
    predicted = conf.groupBy(F.col("_pred").alias("lang")).agg(
        F.sum("_n").alias("_npred")
    )
    joined = (
        support.join(tp, "lang", "left")
        .join(predicted, "lang", "left")
        .select(
            "lang",
            "support",
            F.coalesce(F.col("_tp"), F.lit(0)).alias("tp"),
            F.coalesce(F.col("_npred"), F.lit(0)).alias("_np"),
        )
    )
    prec = F.when(F.col("_np") > 0, F.col("tp") / F.col("_np")).otherwise(0.0)
    rec = F.col("tp") / F.col("support")
    return joined.select(
        "lang",
        "support",
        "tp",
        half_up(prec, 6).alias("precision"),
        half_up(rec, 6).alias("recall"),
        half_up(
            F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0), 6
        ).alias("f1"),
    )


def q257_time_to_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion distribution [EXT]: per user, the delay between
    their FIRST view and their FIRST subsequent purchase, bucketed into
    hours — the funnel-latency histogram product analytics reads next to
    the conversion rate (median time-to-convert, long-tail mass). Users
    whose first purchase precedes their first view (arrived converted)
    are excluded by the tv < tp guard.

    Scale shape: one per-user collapse (two FILTER min-aggregates, one
    co-keyed pass), then a bounded bucket aggregation (≤ month-span × 24
    buckets). Timestamps route via epoch seconds (events.ts is
    TIMESTAMP_NTZ)."""
    from hubverse_transform_spark.operators.sessions import _epoch_seconds

    e = _t(spark, sf_dir, "events")
    per = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", _epoch_seconds(F.col("ts")))
        ).alias("_tv"),
        F.min(
            F.when(F.col("event_type") == "purchase", _epoch_seconds(F.col("ts")))
        ).alias("_tp"),
    )
    conv = per.filter(
        F.col("_tv").isNotNull()
        & F.col("_tp").isNotNull()
        & (F.col("_tv") < F.col("_tp"))
    ).select(F.floor((F.col("_tp") - F.col("_tv")) / 3600).alias("delay_h"))
    tot = conv.agg(F.count(F.lit(1)).alias("_n"))
    return (
        conv.groupBy("delay_h")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .crossJoin(F.broadcast(tot))
        .select(
            "delay_h",
            "n_users",
            half_up(F.col("n_users") / F.col("_n"), 6).alias("share"),
        )
    )


def q258_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic burstiness per event type [EXT]: Fano factor (variance/mean
    of hourly arrival counts — 1.0 under Poisson, ≫1 under bursts) and
    the bounded dispersion coefficient (σ−μ)/(σ+μ) — the load-shape
    diagnostics that decide whether a streaming pipeline needs burst
    headroom or can size for the mean. Complements pointwise anomaly
    z-scores with a per-series dispersion summary.

    Scale shape: corpus collapses to the (type, hour) count table first
    (bounded by span × 24 × types); moments are one algebraic pass over
    that table."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("_h")
    ).agg(F.count(F.lit(1)).alias("_n"))
    # exact integer moments (Σn, Σn²) make the variance a DETERMINISTIC
    # double — n·Σn² − (Σn)² over exact integers, identical IEEE sequence
    # on both engines (var_samp's streaming merge is engine- and
    # order-dependent) — so fano and even the sqrt-based burstiness
    # (sqrt is correctly-rounded IEEE) display via floor half-up
    moments = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("_n").alias("_s1"),
        F.sum(F.col("_n") * F.col("_n")).alias("_s2"),
    )
    nd = F.col("n_hours").cast("double")
    var = (nd * F.col("_s2") - F.col("_s1").cast("double") * F.col("_s1")) / (
        nd * (F.col("n_hours") - 1)
    )
    mean = F.col("_s1").cast("double") / nd
    return moments.select(
        "event_type",
        "n_hours",
        _half_up(F.col("_s1"), F.col("n_hours"), 6).alias("mean_per_hour"),
        half_up(var * nd / F.col("_s1"), 6).alias("fano"),
        half_up((F.sqrt(var) - mean) / (F.sqrt(var) + mean), 6).alias(
            "burstiness"
        ),
    )


def q259_feature_ig_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical feature ranking by information gain [EXT]: which of
    four candidate features (event type, hour-of-day, day-of-week,
    value 50-bucket) best predicts conversion — IG(f) = H(y) −
    Σ_v share(v)·H(y|v), the feature-selection readout behind every tree
    split and every 'is this column worth keeping' audit. All four
    features are scored from ONE corpus scan: the row melts into
    (feature, value) pairs via an inline array-of-structs explode, so
    adding a feature adds zero extra scans.

    Scale shape: one scan → 4× explode (codegen, no shuffle) → one
    (feature, value) aggregation; the entropy math runs on the ≤64-row
    melted table with H(y) as a 1-row broadcast."""
    e = _t(spark, sf_dir, "events")
    y = F.when(F.col("event_type").isin("purchase", "signup"), 1).otherwise(0)
    melted = e.select(
        y.alias("_y"),
        F.explode(
            F.array(
                F.struct(F.lit("event_type").alias("f"), F.col("event_type").alias("v")),
                F.struct(
                    F.lit("hour").alias("f"),
                    F.hour("ts").cast("string").alias("v"),
                ),
                F.struct(
                    F.lit("dow").alias("f"),
                    F.weekday("ts").cast("string").alias("v"),
                ),
                F.struct(
                    F.lit("value_bucket").alias("f"),
                    F.floor(F.col("value") / 50).cast("string").alias("v"),
                ),
            )
        ).alias("_fv"),
    ).select("_y", F.col("_fv.f").alias("_f"), F.col("_fv.v").alias("_v"))
    g = melted.groupBy("_f", "_v").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_y").alias("_pos")
    )
    base = e.agg(
        F.count(F.lit(1)).alias("_tn"), F.sum(y).alias("_tpos")
    )

    def ent(p):
        return F.when(
            (p <= 0) | (p >= 1), F.lit(0.0)
        ).otherwise(-(p * F.log2(p) + (1 - p) * F.log2(1 - p)))

    per = (
        g.crossJoin(F.broadcast(base))
        .groupBy("_f")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            (
                ent(F.first("_tpos") / F.first("_tn"))
                - F.sum(
                    (F.col("_n") / F.col("_tn"))
                    * ent(F.col("_pos") / F.col("_n"))
                )
            ).alias("_ig"),
        )
    )
    return per.select(
        F.col("_f").alias("feature"),
        "n_values",
        F.round("_ig", 6).alias("info_gain"),
    )


def q260_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs
    [EXT]: for each anchor doc (doc_id < 30), the positive is the next doc
    of the same language (lead over the language-partitioned id order) and
    each of 4 negatives is drawn VOCABULARY-FREE by hashing
    (anchor, slot) into the dense doc-id space — md5 mod corpus size —
    with a two-step linear probe past the anchor/positive (2 forbidden
    ids, 3 candidates: always resolves). No RNG state, no sampling table
    to version: the draw is a pure function of ids, reproducible across
    engines and re-runs — which is what makes distributed regeneration of
    training pairs safe.

    Scale shape: anchors/positives via one language-partitioned lead
    window; negatives are map-side hash arithmetic with the corpus size as
    a 1-row broadcast; the 4-slot fan-out is a codegen explode."""
    d = _t(spark, sf_dir, "documents")
    n = d.agg(F.count(F.lit(1)).alias("_N"))
    wl = Window.partitionBy("lang").orderBy("doc_id")
    pairs = (
        d.select("doc_id", "lang")
        .withColumn("_pos", F.lead("doc_id").over(wl))
        .filter((F.col("doc_id") < 30) & F.col("_pos").isNotNull())
    )
    slots = pairs.select(
        "doc_id",
        F.col("_pos").alias("pos_id"),
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("slot"),
    )
    raw = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat_ws("-", "doc_id", "slot")), 1, 8), 16, 10
        ).cast("long"),
        F.col("_N"),
    )
    probe1 = F.pmod(raw + 1, F.col("_N"))
    probe2 = F.pmod(raw + 2, F.col("_N"))
    bad = lambda c: (c == F.col("doc_id")) | (c == F.col("pos_id"))  # noqa: E731
    neg = (
        F.when(~bad(raw), raw)
        .when(~bad(probe1), probe1)
        .otherwise(probe2)
    )
    return (
        slots.crossJoin(F.broadcast(n))
        .select(
            F.col("doc_id").alias("anchor_id"),
            "pos_id",
            "slot",
            neg.alias("neg_id"),
        )
    )


def q261_map_hof_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions over per-doc token-count maps [EXT]:
    build a token→count MapType column per document (map_from_entries over
    the grouped counts), keep frequent tokens with ``map_filter`` (count ≥
    3), normalize to shares with ``transform_values`` (both JVM map
    lambdas, closing the HOF surface next to the array HOFs of q74), then
    explode back to rows for the differential. The map stays an
    engine-side column — no Python, no collect.

    Scale shape: one (doc, token) aggregation, one collect_list-to-map per
    doc (state bounded by per-doc vocab), map lambdas are codegen'd
    expressions; output restricted to doc_id < 20 to bound the
    differential, the operator itself is corpus-wide."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    cnt = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("_w"),
        )
        .filter(F.col("_w") != "")
        .groupBy("doc_id", "_w")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    mapped = cnt.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("_w", "_c"))
        ).alias("_m"),
        F.sum("_c").alias("_tot"),
    )
    freq = mapped.select(
        "doc_id",
        F.map_filter("_m", lambda k, v: v >= 3).alias("_counts"),
        F.transform_values(
            F.map_filter("_m", lambda k, v: v >= 3),
            lambda k, v: v / F.col("_tot"),
        ).alias("_shares"),
    )
    z = freq.select(
        "doc_id",
        F.explode(
            F.map_zip_with(
                "_counts",
                "_shares",
                lambda k, c, s: F.struct(c.alias("cnt"), s.alias("share")),
            )
        ).alias("token", "_cs"),
    )
    return z.select(
        "doc_id",
        "token",
        F.col("_cs.cnt").alias("cnt"),
        half_up(F.col("_cs.share"), 6).alias("share"),
    )


def q262_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-level file provenance via the hidden ``_metadata`` column
    [EXT]: per physical input file feeding the orders and lineitem tables,
    row count and key range — the audit a lakehouse runs to answer 'which
    files contribute to this table, and are their row counts sane?'
    without a separate manifest. ``_metadata.file_path`` is populated by
    the file-source scan itself (Spark's hidden metadata struct), so
    provenance costs no extra read.

    Scale shape: one scan per table with the metadata projection fused
    into it; aggregation keys = file count (bounded by layout, not
    rows)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    fname = F.regexp_extract(F.col("_metadata.file_path"), r"[^/]+$", 0)
    per_o = o.select(fname.alias("file"), F.col("o_orderkey").alias("_k"))
    per_l = li.select(fname.alias("file"), F.col("l_orderkey").alias("_k"))
    return (
        per_o.unionByName(per_l)
        .groupBy("file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_k").alias("min_orderkey"),
            F.max("_k").alias("max_orderkey"),
        )
    )


def q263_table_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table content checksums [EXT]: per table, XOR of
    a 32-bit md5 prefix over a canonical string serialization of the key
    columns — the replication/sync fingerprint two engines (or two sides
    of a migration) can compare WITHOUT sorting or shipping rows.
    md5-based (not xxhash64) so any engine reproduces it bit-for-bit;
    bit_xor makes it order- and partitioning-independent; count rides
    along to catch the XOR blind spot (duplicate pairs cancel).

    Scale shape: map-side hash + one tiny XOR/count aggregation per table
    — one scan each, no shuffle beyond the 1-row reduce."""
    def chk(df, name, serial):
        h = F.conv(F.substring(F.md5(serial), 1, 8), 16, 10).cast("long")
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor(h).alias("checksum32"),
        )

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    parts = [
        chk(o, "orders", F.concat_ws("|", "o_orderkey", "o_custkey", "o_orderstatus")),
        chk(li, "lineitem", F.concat_ws("|", "l_orderkey", "l_partkey", "l_linenumber")),
        chk(c, "customer", F.concat_ws("|", "c_custkey", "c_nationkey", "c_mktsegment")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def q264_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-level constraint audit [EXT]: primary-key uniqueness and
    foreign-key orphan counts across the star schema (orders.o_custkey →
    customer, lineitem.l_orderkey → orders, lineitem.l_partkey → part,
    customer.c_nationkey → nation) — the dbt-test layer, run as
    co-partitioned anti-join counts + duplicate-key scans so one query
    certifies the whole join graph before anything downstream trusts it.

    Scale shape: each FK check is ONE left-anti join on the join key
    (co-partitioned, the same shuffle the real joins pay); each PK check
    is one keyed count; results union into a constraint×metric table."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    p = _t(spark, sf_dir, "part")
    n = _t(spark, sf_dir, "nation")

    def pk_dups(df, key, name):
        return (
            df.groupBy(key)
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > 1)
            .agg(
                F.lit(name).alias("constraint_name"),
                F.lit("pk_unique").alias("kind"),
                F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("violations"),
            )
        )

    def fk_orphans(child, key, parent, pkey, name):
        return (
            child.select(F.col(key).alias("_k"))
            .join(parent.select(F.col(pkey).alias("_k")), "_k", "left_anti")
            .agg(
                F.lit(name).alias("constraint_name"),
                F.lit("fk_orphan").alias("kind"),
                F.count(F.lit(1)).alias("violations"),
            )
        )

    checks = [
        pk_dups(o, "o_orderkey", "orders_pk"),
        pk_dups(c, "c_custkey", "customer_pk"),
        pk_dups(p, "p_partkey", "part_pk"),
        fk_orphans(o, "o_custkey", c, "c_custkey", "orders_custkey_fk"),
        fk_orphans(li, "l_orderkey", o, "o_orderkey", "lineitem_orderkey_fk"),
        fk_orphans(li, "l_partkey", p, "p_partkey", "lineitem_partkey_fk"),
        fk_orphans(c, "c_nationkey", n, "n_nationkey", "customer_nationkey_fk"),
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.unionByName(ch)
    return out


def q265_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training inner loop, step one [EXT]: corpus-wide
    adjacent character-pair counts (the statistic a byte-pair-encoding
    merge step maximizes), computed VOCABULARY-FIRST — aggregate word
    frequencies before exploding character pairs, so the expensive
    per-character explosion runs over the distinct-word table (bounded by
    vocabulary size), not over the corpus. Top 30 pairs with a
    deterministic tie-break.

    Scale shape: one (word) aggregation over the corpus (map-side combine
    collapses repeats), then a corpus-size-INDEPENDENT pair explosion over
    the vocab table; final agg keys = alphabet², tiny."""
    d = _t(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    pairs = (
        words.filter(F.length("w") >= 2)
        .select(
            "w", "f", F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i")
        )
        .select(F.expr("substring(w, i, 2)").alias("pair"), "f")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("f").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(30)
    )


#: cumulative Poisson(1) CDF thresholds scaled to 2^32 — shared literals on
#: both the Spark and DuckDB sides so the bootstrap weights are bit-identical
_POISSON1_T = (1580030168, 3160060337, 3950075421, 4213413783, 4279248373, 4292415291)


def q266_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable bootstrap via Poisson resampling [EXT]: 40 bootstrap
    replicates of the mean order value per priority, where each row's
    per-replicate multiplicity is Poisson(1) drawn by inverse-CDF from a
    deterministic md5 hash — the 'bag of little bootstraps'-style trick
    that makes resampling a MAP operation (no shared RNG state, no
    per-replicate shuffles of the data). Reports the bootstrap mean, SE,
    and a 90% percentile CI per group.

    Scale shape: the 40× row explosion feeds a (group, replicate)
    aggregation whose partial agg collapses it map-side to
    |groups|×40 keys per partition; the replicate-mean table (200 rows)
    is the only thing that ever shuffles. At 100 TB this is one corpus
    scan, same cost as a plain GROUP BY."""
    from hubverse_transform_spark.session import spread_small_scan

    t = _POISSON1_T
    # spread BEFORE the 40x explode: a one-file scan would otherwise run
    # all 6M md5 evaluations on a single task
    o = spread_small_scan(
        _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )
    )
    reps = o.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(39))).alias("r")
    )
    u = F.conv(
        F.substring(F.md5(F.concat_ws("-", "o_orderkey", "r")), 1, 8), 16, 10
    ).cast("long")
    w = (
        F.when(u < t[0], 0)
        .when(u < t[1], 1)
        .when(u < t[2], 2)
        .when(u < t[3], 3)
        .when(u < t[4], 4)
        .when(u < t[5], 5)
        .otherwise(6)
    )
    means = (
        reps.withColumn("_w", w)
        .groupBy("o_orderpriority", "r")
        .agg(
            (F.sum(F.col("_w") * F.col("o_totalprice")) / F.sum("_w")).alias("m")
        )
    )
    return means.groupBy("o_orderpriority").agg(
        # half-safe: m is a mean of 40 per-replicate rationals with
        # heterogeneous denominators (Poisson weight sums); a d=2 half
        # boundary needs the reduced sum denominator to be exactly 200*odd
        # across all 40 replicate denominators at once — measure-zero,
        # covered by the multi-seed campaign
        F.round(F.avg("m"), 2).alias("boot_mean"),
        F.round(F.stddev("m"), 4).alias("boot_se"),
        F.round(F.expr("percentile(m, 0.05)"), 2).alias("ci_lo"),
        F.round(F.expr("percentile(m, 0.95)"), 2).alias("ci_hi"),
    )


def q267_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the co-purchase bipartite graph [EXT]:
    Adamic–Adar scores between part pairs — for parts u, v the score is
    Σ over shared orders o of 1/ln(|o|), down-weighting common neighbors
    that are themselves promiscuous (big orders say less about affinity).
    Top 50 pairs with deterministic tie-break.

    Scale shape: the pair generation is a SELF-JOIN ON THE ORDER KEY, so
    the fan-out per order is bounded by order size (≤ lines-per-order,
    single digits), never quadratic in parts; the order-degree table joins
    on the same key, so all three inputs share one co-partitioned
    exchange. The final agg shuffles only surviving pairs."""
    lp = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    deg = lp.groupBy("o").agg(F.count(F.lit(1)).alias("s")).filter(F.col("s") >= 2)
    pr = (
        lp.alias("a")
        .join(lp.alias("b"), "o")
        .filter(F.col("a.p") < F.col("b.p"))
        .join(deg, "o")
        .select(
            F.col("a.p").alias("p1"),
            F.col("b.p").alias("p2"),
            (F.lit(1.0) / F.log("s")).alias("_w"),
        )
    )
    scored = pr.groupBy("p1", "p2").agg(
        # round BEFORE ranking: pairs sharing a degree multiset are
        # mathematically tied, but float summation order perturbs the raw
        # sums by ~1e-16 per engine AND per run (partial-agg order is
        # nondeterministic), so an unrounded rank-50 cut through a tie
        # group is a latent flake — the seed-777 differential caught it
        F.round(F.sum("_w"), 9).alias("_aa"),
        F.count(F.lit(1)).alias("n_common"),
    )
    return (
        scored.orderBy(F.col("_aa").desc(), "p1", "p2")
        .limit(50)
        .select("p1", "p2", F.round("_aa", 6).alias("aa_score"), "n_common")
    )


def _morton16(bx, by):
    """Interleave two 4-bit bucket ids into an 8-bit Morton (Z-order)
    code with plain shift/mask arithmetic — identical integer math to the
    DuckDB oracle so codes match bit-for-bit."""
    m = F.lit(0)
    for i in range(4):
        m = m + F.shiftright(bx, i).bitwiseAND(F.lit(1)) * F.lit(2 ** (2 * i + 1))
        m = m + F.shiftright(by, i).bitwiseAND(F.lit(1)) * F.lit(2 ** (2 * i))
    return m


def q268_zorder_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-layout audit: Z-order vs linear clustering [EXT]. Bucket
    lineitem on two independent dims (part, supplier; 16×16 grid), assign
    each row to one of 32 'files' under (a) Morton-interleaved order and
    (b) linear (bx, by) order, then compute each file's zone map
    (min/max per dim) and report the average per-dim span and the
    worst-dim span per layout — the number a lakehouse optimizer uses to
    decide whether re-clustering pays: linear layouts prune perfectly on
    the leading dim and not at all on the trailing one; Z-order splits
    the difference on both.

    Scale shape: file assignment is pure map-side arithmetic (the top
    bits of the cell code — no global sort, no window); zone maps are one
    groupBy over layout×file (64 keys). This mirrors how
    ``sinks.write_zordered`` lays files out, as an auditable query."""
    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 16).alias("bx"), (F.col("l_suppkey") % 16).alias("by")
    )
    z = li.select(
        F.lit("zorder").alias("layout"),
        F.shiftright(_morton16(F.col("bx"), F.col("by")), 3).alias("file_id"),
        "bx",
        "by",
    )
    lin = li.select(
        F.lit("linear").alias("layout"),
        F.shiftright(F.col("bx") * 16 + F.col("by"), 3).alias("file_id"),
        "bx",
        "by",
    )
    spans = (
        z.unionByName(lin)
        .groupBy("layout", "file_id")
        .agg(
            (F.max("bx") - F.min("bx") + 1).alias("_sx"),
            (F.max("by") - F.min("by") + 1).alias("_sy"),
        )
    )
    return spans.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_files"),
        _half_up(F.sum("_sx"), F.count(F.lit(1)), 4).alias("avg_span_x"),
        _half_up(F.sum("_sy"), F.count(F.lit(1)), 4).alias("avg_span_y"),
        _half_up(F.sum(F.greatest("_sx", "_sy")), F.count(F.lit(1)), 4).alias("avg_worst_span"),
    )


def q269_nb_token_logodds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive-Bayes quality-classifier TRAINING in-engine [EXT]: label
    documents long/short against the global median length, then compute
    per-token add-1-smoothed class-conditional log-odds
    ln((c_long+1)/(T_long+V)) − ln((c_short+1)/(T_short+V)) — the
    training counterpart of q151's fixed-weight inference (this is how
    the fasttext-style curation classifier's weights are fit from a
    labeled corpus without leaving the engine). Top 25 tokens by
    |log-odds|.

    Scale shape: one token-count aggregation keyed by (token, class); the
    class totals and vocabulary size are 1-row aggregates broadcast back
    via crossJoin — no large side ever re-shuffles."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("_len"), F.col("text")
    )
    med = d.agg(F.expr("percentile(_len, 0.5)").alias("_med"))
    labeled = d.crossJoin(F.broadcast(med)).select(
        (F.col("_len") >= F.col("_med")).alias("is_long"), "text"
    )
    tok = (
        labeled.select(
            "is_long",
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(
            F.count(F.when(F.col("is_long"), 1)).alias("c_long"),
            F.count(F.when(~F.col("is_long"), 1)).alias("c_short"),
        )
    )
    totals = tok.agg(
        F.sum("c_long").alias("_tl"),
        F.sum("c_short").alias("_ts"),
        F.count(F.lit(1)).alias("_v"),
    )
    scored = tok.crossJoin(F.broadcast(totals)).select(
        F.col("w").alias("token"),
        "c_long",
        "c_short",
        # round BEFORE ranking: log-odds of identical count tuples are
        # mathematically tied — an unrounded |score| rank-25 cut through a
        # tie group is a latent cross-engine flake (q267's class)
        F.round(
            F.log((F.col("c_long") + 1) / (F.col("_tl") + F.col("_v")))
            - F.log((F.col("c_short") + 1) / (F.col("_ts") + F.col("_v"))),
            9,
        ).alias("_lo"),
    )
    return (
        scored.orderBy(F.abs("_lo").desc(), "token")
        .limit(25)
        .select("token", "c_long", "c_short", F.round("_lo", 6).alias("log_odds"))
    )


def q270_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval rankings [EXT]: per
    language, rank documents by (a) token count and (b) type-token ratio,
    fuse with RRF(k=60) = Σ 1/(60+rank), keep the top 3 fused docs per
    language — the standard way hybrid search merges BM25 and vector
    rankings without score calibration.

    Scale shape: both rankings and the fused top-k are windows
    PARTITIONED by the candidate-list key (lang here; per-query candidate
    sets in a real retrieval stack), so state is bounded per partition —
    no global sort. Exactly-equal fused scores (rank-pair swaps) break
    ties on doc_id."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    feat = d.select(
        "doc_id",
        "lang",
        F.size(toks).alias("_n"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("_ttr"),
    )
    w1 = Window.partitionBy("lang").orderBy(F.col("_n").desc(), "doc_id")
    w2 = Window.partitionBy("lang").orderBy(F.col("_ttr").desc(), "doc_id")
    ranked = feat.select(
        "doc_id",
        "lang",
        F.row_number().over(w1).alias("r_len"),
        F.row_number().over(w2).alias("r_ttr"),
    ).withColumn(
        "_rrf",
        F.lit(1.0) / (60 + F.col("r_len")) + F.lit(1.0) / (60 + F.col("r_ttr")),
    )
    wf = Window.partitionBy("lang").orderBy(F.col("_rrf").desc(), "doc_id")
    return (
        ranked.withColumn("fused_rank", F.row_number().over(wf))
        .filter(F.col("fused_rank") <= 3)
        .select(
            "lang",
            "fused_rank",
            "doc_id",
            "r_len",
            "r_ttr",
            F.round("_rrf", 6).alias("rrf_score"),
        )
    )


def q271_ndcg_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality metrics nDCG@10 and MRR [EXT]: per language
    ('query'), rank documents by token count (the retrieval-score proxy)
    against a deterministic graded relevance (doc_id mod 3: 0/1/2), and
    compute DCG@10 / ideal-DCG@10 and the reciprocal rank of the first
    relevant hit — the offline eval loop every search/RAG stack runs over
    its candidate lists.

    Scale shape: both the score ranking and the ideal ranking are windows
    PARTITIONED by the query key (candidate lists are bounded per query);
    the metric rollup is one groupBy over queries. Gains (2^rel − 1) are
    small integers, so cross-engine float parity holds exactly."""
    d = _t(spark, sf_dir, "documents")
    feat = d.select(
        "doc_id",
        "lang",
        F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("_n"),
        (F.col("doc_id") % 3).alias("_rel"),
    )
    wr = Window.partitionBy("lang").orderBy(F.col("_n").desc(), "doc_id")
    wi = Window.partitionBy("lang").orderBy(F.col("_rel").desc(), "doc_id")
    ranked = feat.select(
        "lang",
        "_rel",
        F.row_number().over(wr).alias("_rk"),
        F.row_number().over(wi).alias("_irk"),
    )
    gain = F.pow(F.lit(2.0), F.col("_rel")) - 1
    agg = ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("_rk") <= 10, gain / F.log2(F.col("_rk") + 1))).alias(
            "_dcg"
        ),
        F.sum(
            F.when(F.col("_irk") <= 10, gain / F.log2(F.col("_irk") + 1))
        ).alias("_idcg"),
        F.min(F.when(F.col("_rel") > 0, F.col("_rk"))).alias("_first"),
    )
    return agg.select(
        "lang",
        "n_docs",
        # a lang with no relevant docs has ideal-DCG 0: NDCG undefined ->
        # NULL (mrr's 1/NULL already nulls safely) — ultra-sparse reachable
        F.when(
            F.col("_idcg") > 0, F.round(F.col("_dcg") / F.col("_idcg"), 6)
        ).alias("ndcg10"),
        half_up(F.lit(1.0) / F.col("_first"), 6).alias("mrr"),
    )


def q272_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear (double) exponential smoothing per series [EXT]: the
    level/trend recurrence l_t = αy_t + (1−α)(l_{t−1}+b_{t−1}),
    b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1} over daily event counts per event
    type, with the 1-step-ahead forecast — a recurrence NO window frame
    can express (each step feeds the next), run as an applyInPandas
    grouped-map: sequential WITHIN a series, parallel ACROSS series.
    α=β=0.5 are dyadic so the arithmetic is bit-identical to the DuckDB
    recursive-CTE oracle.

    Scale shape: the corpus-sized work is the daily pre-aggregation (one
    shuffle); the Python boundary sees only |series|×|days| rows, grouped
    by series key — bounded state per group, Arrow-batched."""
    import pandas as pd

    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("_day"))
        .agg(F.count(F.lit(1)).cast("double").alias("_y"))
    )

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("_day")
        y = pdf["_y"].to_numpy()
        level, trend = y[0], 0.0
        for t in range(1, len(y)):
            nl = 0.5 * y[t] + 0.5 * (level + trend)
            trend = 0.5 * (nl - level) + 0.5 * trend
            level = nl
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_days": [len(y)],
                "level": [round(level, 4)],
                "trend": [round(trend, 4)],
                "forecast": [round(level + trend, 4)],
            }
        )

    return daily.groupBy("event_type").applyInPandas(
        fit,
        "event_type string, n_days long, level double, trend double, forecast double",
    )


def q273_ann_knn_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-classifier evaluation over the embedding table [EXT]: hold out
    vec_id % 5 == 0 as the test split, predict each test vector's label by
    majority vote of its 5 nearest TRAIN neighbors by cosine (ties →
    smallest label), and report per-true-label accuracy — the eval loop a
    curation stack runs to validate an embedding space before trusting
    semantic dedup/clustering built on it.

    Scale shape: reuses ``cosine_brute_force_topk`` — the test split is
    broadcast, scoring is a map-only pass over the train corpus, and only
    |test|×k candidate rows ever shuffle (the IVF/LSH paths of q48/q120
    are the declared swap-in at lake scale); the vote and the accuracy
    rollup are two small keyed aggs."""
    emb = _t(spark, sf_dir, "embeddings")
    test = emb.filter(F.col("vec_id") % 5 == 0)
    train = emb.filter(F.col("vec_id") % 5 != 0)
    nn = cosine_brute_force_topk(
        train, test, id_col="vec_id", vec_col="embedding", k=5
    )
    votes = (
        nn.join(
            train.select(F.col("vec_id").alias("neighbor_id"), "label"), "neighbor_id"
        )
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("_v"))
    )
    wv = Window.partitionBy("query_id").orderBy(F.col("_v").desc(), "label")
    pred = (
        votes.withColumn("_r", F.row_number().over(wv))
        .filter(F.col("_r") == 1)
        .select("query_id", F.col("label").alias("pred"))
    )
    truth = test.select(F.col("vec_id").alias("query_id"), F.col("label").alias("true_label"))
    return (
        truth.join(pred, "query_id")
        .groupBy("true_label")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(F.when(F.col("pred") == F.col("true_label"), 1).otherwise(0)).alias(
                "n_correct"
            ),
        )
        .select(
            "true_label",
            "n_test",
            "n_correct",
            half_up(F.col("n_correct") / F.col("n_test"), 4).alias("accuracy"),
        )
    )


def q274_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking for dedup storage [EXT]: boundaries fall
    where the hash of the trailing 8-char window ≡ 0 (mod 64) — so chunk
    edges are CONTENT-anchored and survive insertions (the rsync/LBFS
    trick fixed-size chunking can't do). Per doc: chunk count, average and
    max chunk length, reconstructed from boundary positions with bounded
    array HOFs. md5-based so the oracle reproduces boundaries exactly.

    Scale shape: the per-character window explosion is linear in corpus
    bytes with a tiny constant and aggregates straight back to one row per
    doc (map-side combine); at lake scale the same boundary rule runs as a
    rolling hash inside mapInPandas — the declared swap, same outputs."""
    d = _t(spark, sf_dir, "documents").select("doc_id", F.col("text"), F.length("text").alias("_len"))
    pos = d.select(
        "doc_id",
        "_len",
        F.explode(F.sequence(F.lit(8), F.col("_len"))).alias("i"),
        F.col("text"),
    ).select(
        "doc_id",
        "_len",
        "i",
        F.conv(
            F.substring(F.md5(F.expr("substring(text, i - 7, 8)")), 1, 8), 16, 10
        ).cast("long").alias("_h"),
    )
    bounds = (
        pos.filter(F.col("_h") % 64 == 0)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("i")).alias("_bs"))
    )
    ext = F.concat(F.array(F.lit(0)), F.col("_bs"), F.array(F.col("_len")))
    lens = F.zip_with(
        F.slice(ext, 1, F.size(ext) - 1),
        F.slice(ext, 2, F.size(ext) - 1),
        lambda a, b: b - a,
    )
    return (
        d.select("doc_id", "_len")
        .join(bounds, "doc_id", "left")
        .withColumn("_bs", F.coalesce("_bs", F.array().cast("array<int>")))
        .select(
            "doc_id",
            F.size(F.col("_bs")).alias("n_boundaries"),
            (F.size(F.col("_bs")) + 1).alias("n_chunks"),
            half_up(F.col("_len") / (F.size(F.col("_bs")) + 1), 4).alias(
                "avg_chunk_len"
            ),
            F.array_max(F.filter(lens, lambda x: x >= 0)).alias("max_chunk_len"),
        )
        .filter(F.col("doc_id") < 100)
    )


def q275_bloom_semijoin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semijoin, made explicit and audited [EXT]: build a
    1024-bit / 3-hash Bloom filter over the rich-supplier keys
    (s_acctbal > 9000), probe every distinct lineitem supplier key through
    it, and report pass counts vs the exact semijoin — the runtime-filter
    pattern Spark injects automatically, surfaced as a query so its
    false-positive rate is a measured number, not folklore.

    Scale shape: the filter is ≤1024 distinct bit positions — broadcast;
    probing is a map-side broadcast join (3 hash rows per probe key), so
    the big side never shuffles; the exact twin is a broadcast left-semi.
    md5 positions make the filter bit-identical cross-engine."""
    sup = _t(spark, sf_dir, "supplier")
    small = sup.filter(F.col("s_acctbal") > 9000).select(
        F.col("s_suppkey").alias("k")
    )
    js = F.explode(F.sequence(F.lit(0), F.lit(2))).alias("j")

    def bitpos(key, j):
        return (
            F.conv(
                F.substring(F.md5(F.concat_ws("-", key, j)), 1, 8), 16, 10
            ).cast("long")
            % 1024
        )

    bloom = (
        small.select("k", js)
        .select(bitpos(F.col("k"), F.col("j")).alias("pos"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    probe = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_suppkey").alias("k"))
        .distinct()
    )
    probed = (
        probe.select("k", js)
        .select("k", bitpos(F.col("k"), F.col("j")).alias("pos"))
        .join(F.broadcast(bloom), "pos", "left")
        .groupBy("k")
        .agg((F.sum(F.coalesce("_hit", F.lit(0))) == 3).alias("bloom_pass"))
    )
    member = probe.join(F.broadcast(small), "k", "left_semi").select(
        "k", F.lit(True).alias("is_member")
    )
    audit = probed.join(member, "k", "left").select(
        "bloom_pass", F.coalesce("is_member", F.lit(False)).alias("is_member")
    )
    return audit.agg(
        F.count(F.lit(1)).alias("n_probe_keys"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0)).alias("n_members"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).alias("n_bloom_pass"),
        F.sum(
            F.when(F.col("bloom_pass") & ~F.col("is_member"), 1).otherwise(0)
        ).alias("n_false_pos"),
    ).select(
        "*",
        half_up(
            F.col("n_false_pos")
            / (F.col("n_probe_keys") - F.col("n_members")),
            6,
        ).alias("fp_rate"),
    )


def q276_watermark_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-sizing audit [EXT]: per event type, how late does data
    actually arrive? Lateness of each event = (max event-time seen so far
    in arrival order) − (its own event time); bucketed counts (on-time,
    ≤1 min, ≤1 h, >1 h) plus the max observed lateness — the measurement
    that picks ``withWatermark``'s delay for the streaming pipelines
    (streaming/ingest.py) instead of guessing.

    Scale shape: one window PARTITIONED by event type ordered by the
    arrival proxy (event_id) with a strictly-preceding running max —
    bounded state per partition key; the bucket rollup is one groupBy.
    Event-time math stays in exact integer microseconds (the NTZ-safe
    path of operators/sessions._epoch_seconds)."""
    from hubverse_transform_spark.operators.sessions import _epoch_seconds

    ev = _t(spark, sf_dir, "events").select(
        "event_type", "event_id", _epoch_seconds(F.col("ts")).alias("_es")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late = ev.select(
        "event_type",
        F.greatest(
            F.lit(0.0), F.coalesce(F.max("_es").over(w) - F.col("_es"), F.lit(0.0))
        ).alias("_late"),
    )
    return late.groupBy("event_type").agg(
        F.sum(F.when(F.col("_late") <= 0, 1).otherwise(0)).alias("n_ontime"),
        F.sum(
            F.when((F.col("_late") > 0) & (F.col("_late") <= 60), 1).otherwise(0)
        ).alias("n_within_1m"),
        F.sum(
            F.when((F.col("_late") > 60) & (F.col("_late") <= 3600), 1).otherwise(0)
        ).alias("n_within_1h"),
        F.sum(F.when(F.col("_late") > 3600, 1).otherwise(0)).alias("n_over_1h"),
        F.round(F.max("_late"), 6).alias("max_lateness_sec"),
    )


def q277_ucb1_arm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-armed-bandit readout (UCB1) [EXT]: per arm (event type), the
    empirical mean reward plus the exploration bonus
    sqrt(2·ln(N_total)/n_arm) — the deterministic half of an
    explore/exploit loop (arm selection = argmax of this score), computed
    as a batch readout the way an experimentation platform refreshes arm
    scores between serving windows.

    Scale shape: one keyed aggregation for the per-arm moments; the total
    pull count is a 1-row aggregate broadcast back via crossJoin."""
    ev = _t(spark, sf_dir, "events")
    arms = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pulls"), F.avg("value").alias("_mean")
    )
    total = arms.agg(F.sum("n_pulls").alias("_n"))
    return arms.crossJoin(F.broadcast(total)).select(
        "event_type",
        "n_pulls",
        F.round("_mean", 6).alias("mean_reward"),
        F.round(
            F.sqrt(F.lit(2.0) * F.log("_n") / F.col("n_pulls")), 6
        ).alias("explore_bonus"),
        F.round(
            F.col("_mean") + F.sqrt(F.lit(2.0) * F.log("_n") / F.col("n_pulls")),
            6,
        ).alias("ucb_score"),
    )


def q278_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator [EXT]: treatment cohort =
    even user_ids, post period = events on/after 2024-01-15; the causal
    readout is (T_post − T_pre) − (C_post − C_pre) over mean event value —
    the 2×2 design every experimentation/causal pipeline reduces to, done
    in ONE pass with conditional aggregates (no self-joins, no four
    scans).

    Scale shape: a single scan with four FILTERed means collapsing
    map-side; output is one row."""
    ev = _t(spark, sf_dir, "events")
    treat = F.col("user_id") % 2 == 0
    post = F.col("ts") >= F.lit("2024-01-15").cast("timestamp_ntz")
    cell = lambda c: F.avg(F.when(c, F.col("value")))
    agg = ev.agg(
        cell(treat & ~post).alias("_tpre"),
        cell(treat & post).alias("_tpost"),
        cell(~treat & ~post).alias("_cpre"),
        cell(~treat & post).alias("_cpost"),
    )
    return agg.select(
        F.round("_tpre", 6).alias("t_pre"),
        F.round("_tpost", 6).alias("t_post"),
        F.round("_cpre", 6).alias("c_pre"),
        F.round("_cpost", 6).alias("c_post"),
        F.round(
            (F.col("_tpost") - F.col("_tpre")) - (F.col("_cpost") - F.col("_cpre")),
            6,
        ).alias("did_estimate"),
    )


def q279_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse-vector cosine similarity join [EXT]: documents as
    L2-normalized TF-IDF vectors, pairwise cosine via the INVERTED-INDEX
    join (postings joined on token, weight products summed per pair) —
    the weighted complement of the set-based Jaccard family (q21/q158):
    same join skeleton, real-valued scores. IDF comes from the FULL
    corpus; the pair join runs over the doc_id < 200 slice (the
    differential bound — at lake scale the cap is a df ceiling plus
    banding, exactly the q212/q158 treatment).

    Scale shape: postings ship once, keyed by token; per-token fan-out is
    df² — bounded here by the slice, bounded at scale by the df cap; the
    pair aggregation is one shuffle on (d1, d2)."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    n_docs = d.agg(F.count(F.lit(1)).alias("_n"))
    df_ = tok.distinct().groupBy("w").agg(F.count(F.lit(1)).alias("_df"))
    tf = (
        tok.filter(F.col("doc_id") < 200)
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    weighted = (
        tf.join(df_, "w")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "w", (F.col("_tf") * F.log(F.col("_n") / F.col("_df"))).alias("_w")
        )
    )
    norms = weighted.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("_w") * F.col("_w"))).alias("_norm")
    )
    unit = weighted.join(norms, "doc_id").select(
        "doc_id", "w", (F.col("_w") / F.col("_norm")).alias("_u")
    )
    pairs = (
        unit.alias("a")
        .join(unit.alias("b"), "w")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(
            # round BEFORE ranking: 31-word count vectors produce
            # structurally tied cosines, and the raw float sum breaks the
            # tie differently per engine/run at the LIMIT cut (q267 class)
            F.round(F.sum(F.col("a._u") * F.col("b._u")), 9).alias("_cos"),
            F.count(F.lit(1)).alias("n_shared_tokens"),
        )
    )
    return (
        pairs.orderBy(F.col("_cos").desc(), "d1", "d2")
        .limit(40)
        .select("d1", "d2", F.round("_cos", 6).alias("cosine"), "n_shared_tokens")
    )


def q280_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation [EXT]: recency / frequency / monetary
    per customer, each scored 1–5 against GLOBAL quintile thresholds
    computed as one tiny percentile aggregate and broadcast back — the
    scale-correct form of the usual ntile(5)-over-everything (which is a
    single-partition global sort); comparisons against broadcast
    thresholds are map-side. Recency is inverted (recent = 5). Output:
    segment cell counts + mean monetary.

    Scale shape: one orders aggregation per customer, one 1-row
    percentile agg, one broadcast crossJoin, one cell rollup (≤125
    keys)."""
    o = _t(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("_mx"))
    rfm = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count(F.lit(1)).alias("_f"),
            F.sum("o_totalprice").alias("_m"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            F.datediff("_mx", "_last").cast("double").alias("_r"),
            F.col("_f").cast("double").alias("_fd"),
            "_m",
        )
    )
    th = rfm.agg(
        F.expr("percentile(_r, array(0.2D, 0.4D, 0.6D, 0.8D))").alias("_tr"),
        F.expr("percentile(_fd, array(0.2D, 0.4D, 0.6D, 0.8D))").alias("_tf"),
        F.expr("percentile(_m, array(0.2D, 0.4D, 0.6D, 0.8D))").alias("_tm"),
    )

    def score(v, t):
        s = F.lit(1)
        for i in range(4):
            s = s + F.when(v > t[i], 1).otherwise(0)
        return s

    scored = rfm.crossJoin(F.broadcast(th)).select(
        (F.lit(6) - score(F.col("_r"), F.col("_tr"))).alias("r_score"),
        score(F.col("_fd"), F.col("_tf")).alias("f_score"),
        score(F.col("_m"), F.col("_tm")).alias("m_score"),
        "_m",
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        # sum, not avg: cell sums stay on the cent grid, so round(., 2) is
        # midpoint-safe cross-engine; an avg lands on .0025 steps and the
        # two engines' rounding modes diverge exactly on .005 midpoints
        F.round(F.sum("_m"), 2).alias("sum_monetary"),
    )


def q281_column_stats_collection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics [EXT]: per numeric lineitem column
    — row/null counts, exact NDV, min/max, quartiles — the statistics a
    cost-based optimizer consumes, collected with the melt-via-
    array-of-structs pattern so ONE corpus scan feeds every column's
    stats (q259's trick, turned into the engine's stats collector).

    Scale shape: one scan, explode ×4 (column count, not data driven),
    then a pre-aggregation to (col, value, count) so the final per-column
    agg sees only distinct values: NDV becomes a plain count (no
    countDistinct expand), quartiles use frequency-weighted
    percentile(v, p, cnt) — identical order statistics, but the
    imperative-agg buffer holds distinct values, not rows. NDV is exact
    with approx_count_distinct as the documented lake-scale swap."""
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    melted = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("double").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("_s")
    ).select("_s.col_name", "_s.v")
    cnts = melted.groupBy("col_name", "v").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        cnts.groupBy("col_name")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.sum(F.when(F.col("v").isNull(), F.col("cnt")).otherwise(0)).alias(
                "n_null"
            ),
            F.count("v").alias("ndv"),
            F.round(F.min("v"), 4).alias("min_v"),
            F.round(F.max("v"), 4).alias("max_v"),
            F.round(
                F.expr("percentile(v, array(0.25, 0.5, 0.75), cnt)").getItem(0), 4
            ).alias("p25"),
            F.round(
                F.expr("percentile(v, array(0.25, 0.5, 0.75), cnt)").getItem(1), 4
            ).alias("p50"),
            F.round(
                F.expr("percentile(v, array(0.25, 0.5, 0.75), cnt)").getItem(2), 4
            ).alias("p75"),
        )
    )


def q282_ab_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power analysis from measured moments [EXT]: per event
    type, the per-arm sample size required to detect a 5%-of-mean effect
    at α=0.05 / 80% power — n = 2σ²(z_α/2+z_β)²/δ² with the z constants
    as shared literals — the pre-registration calculator an
    experimentation platform runs against LIVE variance estimates instead
    of guesses (q230 is the post-hoc read of the same machinery).

    Scale shape: one keyed moment aggregation; the formula is constant
    arithmetic per group."""
    z = (1.959964 + 0.841621) ** 2
    ev = _t(spark, sf_dir, "events")
    # exact cent moments: mean, variance, MDE and the sample-size formula
    # all become deterministic doubles (identical IEEE sequence both
    # engines) — var_samp/avg merges are engine- and order-dependent and
    # the d=4/d=6 displays of these grid-derived rationals are reachable
    c = _cents("value")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(c).alias("_s1"),
        F.sum(c * c).alias("_s2"),
    )
    nd = F.col("n_obs").cast("double")
    meand = F.col("_s1").cast("double") / (100.0 * nd)
    vard = (
        nd * F.col("_s2") - F.col("_s1").cast("double") * F.col("_s1")
    ) / (nd * (F.col("n_obs") - 1)) / 1e4
    delta = meand * 0.05
    return m.select(
        "event_type",
        "n_obs",
        half_up(meand, 6).alias("mean_value"),
        half_up(vard, 4).alias("var_value"),
        half_up(delta, 6).alias("mde"),
        half_up(F.lit(2.0) * vard * F.lit(z) / (delta * delta), 4).alias(
            "n_per_arm"
        ),
    )


def q283_dq_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality scorecard [EXT]: validity/completeness checks across
    four tables — nonpositive prices, out-of-range discounts, null keys,
    negative event values, malformed JSON props — rolled into one
    (table, check, n_checked, n_violations) audit table, the dbt-test /
    Deequ layer run as a single engine query per table (each check is a
    conditional count, so a table's whole checklist costs ONE scan).

    Scale shape: one scan per table with FILTERed counts collapsing
    map-side; output is bounded by the number of declared checks."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ev = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer")

    def checks(df, table, named):
        aggs = [F.count(F.lit(1)).alias("_n")]
        for name, cond in named:
            aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(name))
        one = df.agg(*aggs)
        outs = []
        for name, _ in named:
            outs.append(
                one.select(
                    F.lit(table).alias("table_name"),
                    F.lit(name).alias("check_name"),
                    F.col("_n").alias("n_checked"),
                    F.col(name).alias("n_violations"),
                )
            )
        return outs

    parts = (
        checks(
            o,
            "orders",
            [
                ("nonpositive_price", F.col("o_totalprice") <= 0),
                ("null_custkey", F.col("o_custkey").isNull()),
            ],
        )
        + checks(
            li,
            "lineitem",
            [
                ("discount_out_of_range", ~F.col("l_discount").between(0, 1)),
                ("nonpositive_qty", F.col("l_quantity") <= 0),
            ],
        )
        + checks(
            ev,
            "events",
            [
                ("negative_value", F.col("value") < 0),
                ("malformed_props", ~F.col("props").startswith("{")),
            ],
        )
        + checks(c, "customer", [("null_acctbal", F.col("c_acctbal").isNull())])
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def q284_topk_plus_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k with an OTHER rollup [EXT]: revenue by part brand per
    region, keeping each region's top-3 brands as named rows and
    collapsing the tail into one 'OTHER' row — the reporting shape every
    BI layer wants and plain top-k (q07) can't give without losing the
    remainder. Rank over the AGGREGATED (region, brand) table, so the
    window sees |regions|×|brands| rows, never line items.

    Scale shape: the only corpus-sized work is the revenue aggregation
    (one shuffle); the supplier→nation→region dims broadcast; the rank
    window and the re-aggregation run on the tiny rollup."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "p_brand")
        .agg(
            # exact 1e-4-dollar units: deterministic ranking, boundary-safe
            # display rounding downstream
            F.sum(_fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias("_rev")
        )
    )
    w = Window.partitionBy("r_name").orderBy(F.col("_rev").desc(), "p_brand")
    labeled = rev.withColumn(
        "brand_label",
        F.when(F.row_number().over(w) <= 3, F.col("p_brand")).otherwise(
            F.lit("OTHER")
        ),
    )
    return labeled.groupBy("r_name", "brand_label").agg(
        F.count(F.lit(1)).alias("n_brands"),
        _half_up(F.sum("_rev"), F.lit(10000), 2).alias("revenue"),
    )


def q285_hist2d_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram with marginals in ONE pass [EXT]: bucket lineitem on
    (quantity, price) and compute the joint cell counts PLUS both
    marginal histograms PLUS the grand total via GROUPING SETS — four
    aggregation grains sharing a single shuffle, where the naive form is
    four scans. Aggregate-level bucket ids surface as -1 sentinels
    (disambiguated from real buckets via GROUPING()).

    Scale shape: one scan, one shuffle keyed on the grouping-set id +
    buckets; bucket arithmetic is map-side."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_quantity") / 10).cast("int").alias("qb"),
        F.floor(F.col("l_extendedprice") / 10000).cast("int").alias("pb"),
        _fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias("_rev"),
    )
    g = li.groupingSets([["qb", "pb"], ["qb"], ["pb"], []], "qb", "pb").agg(
        F.grouping("qb").alias("_gq"),
        F.grouping("pb").alias("_gp"),
        F.count(F.lit(1)).alias("n_rows"),
        _half_up(F.sum("_rev"), F.lit(10000), 2).alias("revenue"),
    )
    return g.select(
        F.when(F.col("_gq") == 1, F.lit(-1)).otherwise(F.col("qb")).alias("qb"),
        F.when(F.col("_gp") == 1, F.lit(-1)).otherwise(F.col("pb")).alias("pb"),
        "n_rows",
        "revenue",
    )


def q286_wilson_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson lower-bound ranking [EXT]: per part brand, the lower bound
    of the 95% Wilson score interval on the 'deep discount' success rate
    (l_discount > 0.05) — the ranking that does NOT let a 3-for-3
    small-sample item beat a 950-for-1000 heavy hitter (the classic
    sort-by-rating fix). z is a shared literal so both engines compute
    identical bounds.

    Scale shape: one keyed (n, successes) aggregation; the bound is
    constant arithmetic per group."""
    z = 1.959964
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    agg = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias("s"),
        )
    )
    ph = F.col("s") / F.col("n")
    z2n = F.lit(z * z) / F.col("n")
    lb = (
        ph
        + z2n / 2
        - F.lit(z) * F.sqrt((ph * (1 - ph) + z2n / 4) / F.col("n"))
    ) / (1 + z2n)
    return agg.select(
        "p_brand",
        "n",
        "s",
        half_up(ph, 6).alias("p_hat"),
        # wilson_lb is sqrt-based (irrational): round() is boundary-safe
        F.round(lb, 6).alias("wilson_lb"),
    )


def q287_forecast_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-accuracy backtest [EXT]: score the seasonal-naive
    forecast (lag-7) of daily event counts per type with MAPE, sMAPE and
    MASE (denominator = mean |one-step naive error| over the same eval
    window) — the metric layer that decides whether q272's smoothing or
    q241's seasonal index actually earns its keep.

    Scale shape: daily pre-aggregation is the only corpus-sized work;
    lags are windows PARTITIONED by series over the bounded daily table;
    the metric rollup is one groupBy per series."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("_day")
    ).agg(F.count(F.lit(1)).cast("double").alias("_a"))
    w = Window.partitionBy("event_type").orderBy("_day")
    lagged = daily.select(
        "event_type",
        "_a",
        F.lag("_a", 7).over(w).alias("_f"),
        F.lag("_a", 1).over(w).alias("_p"),
    ).filter(F.col("_f").isNotNull())
    err = F.abs(F.col("_a") - F.col("_f"))
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days_scored"),
        # half-safe: mape/smape average per-day rationals with
        # heterogeneous denominators (daily counts); a d=6 half boundary
        # needs the reduced sum denominator to be exactly 2*10^6*odd —
        # measure-zero, covered by the multi-seed campaign
        F.round(F.avg(err / F.col("_a")), 6).alias("mape"),
        F.round(F.avg(2 * err / (F.col("_a") + F.col("_f"))), 6).alias("smape"),
        # mase reduces to an exact ratio of integer error sums; a CONSTANT
        # series has zero naive error (tiny-tier reachable) -> undefined,
        # NULL (mirrored CASE in the oracle)
        F.when(
            F.sum(_intval(F.abs(F.col("_a") - F.col("_p")))) > 0,
            _half_up(
                F.sum(_intval(err)),
                F.sum(_intval(F.abs(F.col("_a") - F.col("_p")))),
                6,
            ),
        ).alias("mase"),
    )


def q288_late_dim_unknown_member(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving dimension handling [EXT]: facts whose dimension row
    hasn't landed yet route to an explicit UNKNOWN member instead of
    silently dropping (the inner-join bug every warehouse hits once).
    Simulated by withholding customers with c_custkey % 10 == 0 from the
    dim; orders aggregate by the nation of the matched customer or
    'UNKNOWN', with per-bucket revenue so the backfill reconciliation has
    a target number.

    Scale shape: one LEFT broadcast join facts→dim (dim rows bounded),
    nation lookup broadcast, one rollup keyed by ≤26 labels."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 != 0)
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dim = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "n_name"
    )
    return (
        o.join(dim, o.o_custkey == dim.c_custkey, "left")
        .select(
            F.coalesce("n_name", F.lit("UNKNOWN")).alias("nation_label"),
            "o_totalprice",
        )
        .groupBy("nation_label")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def q289_partial_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable partial state, merged exactly [EXT]: per event
    type, compute per-DAY partial aggregates (n, mean, M2) and MERGE them
    with Chan's parallel-variance formulas — the algebraic-state
    machinery behind every incremental rollup / materialized-view merge
    (daily partials → monthly → total without re-reading raw data). The
    oracle computes variance DIRECTLY from raw rows, so the hash match
    PROVES the merge is exact, not approximate.

    Scale shape: raw data is touched once (daily pre-agg); the fold runs
    over ≤|days| structs per series via the aggregate() HOF — pure JVM,
    bounded state. Cites the same pattern as sinks' incremental matview
    (streaming/matview.py)."""
    ev = _t(spark, sf_dir, "events")
    day = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("_day"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("value").alias("mean"),
            (F.var_pop("value") * F.count(F.lit(1))).alias("m2"),
        )
    )
    packed = day.groupBy("event_type").agg(
        F.sort_array(
            F.collect_list(F.struct("_day", "n", "mean", "m2"))
        ).alias("_parts"),
        F.count(F.lit(1)).alias("n_partials"),
    )
    zero = F.struct(
        F.lit(0.0).alias("n"), F.lit(0.0).alias("mean"), F.lit(0.0).alias("m2")
    )

    def merge(acc, p):
        n = acc.n + p.n
        delta = p.mean - acc.mean
        return F.when(acc.n == 0.0, F.struct(p.n.alias("n"), p.mean.alias("mean"), p.m2.alias("m2"))).otherwise(
            F.struct(
                n.alias("n"),
                (acc.mean + delta * p.n / n).alias("mean"),
                (acc.m2 + p.m2 + delta * delta * acc.n * p.n / n).alias("m2"),
            )
        )

    folded = packed.select(
        "event_type",
        "n_partials",
        F.aggregate(F.col("_parts"), zero, merge).alias("_st"),
    )
    return folded.select(
        "event_type",
        "n_partials",
        F.col("_st.n").cast("long").alias("n_rows"),
        F.round("_st.mean", 6).alias("mean_value"),
        F.round(F.col("_st.m2") / F.col("_st.n"), 4).alias("var_pop_value"),
    )


def q290_median_ci_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free median confidence interval via order statistics
    [EXT]: per order priority, the 95% CI for the median of order value
    is the pair of values at ranks (n − z√n)/2 and 1 + (n + z√n)/2 — no
    normality assumption, no resampling, just two rank selections — the
    robust counterpart of q266's bootstrap CI.

    Scale shape: rank via a window PARTITIONED by the group key; the rank
    targets come from a per-group count joined back (broadcast — group
    count is tiny). At lake scale the two rank selections run as q206's
    bounded-distinct rank selection instead of a full per-group sort."""
    z = 1.959964
    o = _t(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    cnt = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("_n"))
    targets = cnt.select(
        "o_orderpriority",
        "_n",
        F.floor((F.col("_n") - z * F.sqrt("_n")) / 2).cast("long").alias("_lo"),
        (F.ceil((F.col("_n") + z * F.sqrt("_n")) / 2) + 1).cast("long").alias("_hi"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ranked = (
        _t(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_totalprice", "o_orderkey")
        .withColumn("_rk", F.row_number().over(w))
    )
    hits = ranked.join(F.broadcast(targets), "o_orderpriority").filter(
        (F.col("_rk") == F.col("_lo")) | (F.col("_rk") == F.col("_hi"))
    )
    med = o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_value")
    )
    ci = hits.groupBy("o_orderpriority").agg(
        F.max(F.col("_n")).alias("n_orders"),
        F.round(
            F.max(F.when(F.col("_rk") == F.col("_lo"), F.col("o_totalprice"))), 2
        ).alias("ci_lo"),
        F.round(
            F.max(F.when(F.col("_rk") == F.col("_hi"), F.col("o_totalprice"))), 2
        ).alias("ci_hi"),
    )
    return ci.join(med, "o_orderpriority").select(
        "o_orderpriority", "n_orders", "ci_lo", "median_value", "ci_hi"
    )


def q291_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe categorical target encoding [EXT]: per category
    (order priority), the smoothed target mean
    (Σy + prior·m)/(n + m) with m=20 — the ML feature every gradient-
    boosted pipeline derives — plus the leave-one-out extremes
    ((Σy − y_max)/(n−1), (Σy − y_min)/(n−1)) that bound what any single
    row can see of its own label (the leakage audit).

    Scale shape: one keyed aggregation, the global prior is a 1-row
    broadcast; LOO bounds come from the same group moments — no per-row
    second pass."""
    o = _t(spark, sf_dir, "orders")
    prior = o.agg(F.avg("o_totalprice").alias("_p"))
    g = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_totalprice").alias("_s"),
        F.sum(_cents("o_totalprice")).alias("_sc"),
        F.min("o_totalprice").alias("_mn"),
        F.max("o_totalprice").alias("_mx"),
    )
    return g.crossJoin(F.broadcast(prior)).select(
        "o_orderpriority",
        "n",
        # smoothed blends the float global prior — not an exact ratio;
        # its double is order-dependent only at ~1e-13, absorbed at d=4
        F.round((F.col("_s") + F.col("_p") * 20) / (F.col("n") + 20), 4).alias(
            "smoothed_encoding"
        ),
        # the LOO bounds ARE exact integer ratios over cent sums
        _half_up(
            F.col("_sc") - _fixed("_mx", 100), (F.col("n") - 1) * 100, 4
        ).alias("loo_min"),
        _half_up(
            F.col("_sc") - _fixed("_mn", 100), (F.col("n") - 1) * 100, 4
        ).alias("loo_max"),
    )


def q292_stream_state_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming state-store sizing from batch history [EXT]: for
    candidate tumbling-window widths (1 min / 5 min / 1 h), the number of
    live keys a per-user windowed aggregation would hold — window count,
    total and peak distinct users per window, and the peak state estimate
    at 48 bytes/key — the capacity-planning query you run BEFORE picking
    the window/watermark of streaming/windows.py, not after the executors
    OOM.

    Scale shape: one explode ×3 (candidate count), one distinct-per-
    window aggregation keyed (width, window, user), then a bounded
    rollup; at lake scale the distinct collapses to approx_count_distinct
    — the documented swap."""
    from hubverse_transform_spark.operators.sessions import _epoch_seconds

    ev = _t(spark, sf_dir, "events").select(
        _epoch_seconds(F.col("ts")).alias("_es"), "user_id"
    )
    widths = F.explode(F.array(F.lit(60), F.lit(300), F.lit(3600))).alias("width_s")
    per_win = (
        ev.select("*", widths)
        .select(
            "width_s",
            F.floor(F.col("_es") / F.col("width_s")).alias("_win"),
            "user_id",
        )
        .groupBy("width_s", "_win")
        .agg(F.countDistinct("user_id").alias("_keys"))
    )
    return per_win.groupBy("width_s").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("_keys").alias("total_keys"),
        F.max("_keys").alias("peak_keys"),
        F.round(F.max("_keys") * 48 / 1024.0, 4).alias("peak_state_kb"),
    )


def q293_srm_guardrail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail [EXT]: distinct users split by the
    assignment hash (user_id mod 2) should be 50/50; the chi-square stat
    Σ(obs−exp)²/exp against the χ²₁ 95% critical value (3.841459) flags
    broken randomization BEFORE anyone reads the experiment (q230/q282) —
    the first check every experimentation platform runs.

    Scale shape: one distinct-user aggregation, constant arithmetic on
    two cells."""
    ev = _t(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    cells = users.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).alias("n_arm0"),
    ).select(
        "n_users", "n_arm0", (F.col("n_users") - F.col("n_arm0")).alias("n_arm1")
    )
    exp = F.col("n_users") / 2.0
    chi2 = (F.col("n_arm0") - exp) ** 2 / exp + (F.col("n_arm1") - exp) ** 2 / exp
    return cells.select(
        "n_users",
        "n_arm0",
        "n_arm1",
        F.round(chi2, 6).alias("chi2"),
        (chi2 < 3.841459).alias("srm_pass"),
    )


#: declared schema contract for q294 — intentionally includes one column the
#: testdata doesn't have and one wrong type, so every status value is exercised
_SCHEMA_CONTRACT = {
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_shipmode": "string",  # not in the testdata -> 'missing'
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp_ntz",
        "user_id": "string",  # actual is bigint -> 'type_mismatch'
        "value": "double",
    },
}


def q294_schema_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema data-contract enforcement [EXT]: diff each table's ACTUAL
    parquet schema (catalog introspection, zero data read) against a
    declared contract — per (table, column): ok / type_mismatch /
    missing (contracted, absent) / unexpected (present, uncontracted) —
    the producer/consumer contract check a lakehouse runs on every
    publish, built on the same StructType machinery as the reference's
    schema derivation (schema.py; reference hubverse-transform
    model_output.py schema section).

    Scale shape: pure metadata — reads footers only; the diff itself is
    driver-side over |columns| entries, then parallelized as a
    createDataFrame so downstream composition stays in-engine."""
    rows = []
    for table, contract in _SCHEMA_CONTRACT.items():
        actual = {
            f.name: f.dataType.simpleString()
            for f in spark.read.parquet(f"{sf_dir}/{table}.parquet").schema.fields
        }
        for col_name, want in contract.items():
            if col_name not in actual:
                rows.append((table, col_name, "missing", want, None))
            elif actual[col_name] != want:
                rows.append(
                    (table, col_name, "type_mismatch", want, actual[col_name])
                )
            else:
                rows.append((table, col_name, "ok", want, actual[col_name]))
        for col_name in sorted(set(actual) - set(contract)):
            rows.append((table, col_name, "unexpected", None, actual[col_name]))
    return spark.createDataFrame(
        rows,
        "table_name string, column_name string, status string,"
        " expected_type string, actual_type string",
    )


def q295_cbo_estimation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based-optimizer estimation audit [EXT]: the textbook
    cardinality estimates — join size |A|·|B|/max(ndv_A, ndv_B), and
    conjunctive selectivity under the independence assumption
    sel(p₁∧p₂)=sel(p₁)·sel(p₂) — computed from q281-style stats and
    compared against ACTUAL row counts, per case. The ratio column is the
    number a plan-regression harness alarms on (independence violations
    and FK skew are exactly what blows up real plans at 100 TB).

    Scale shape: each estimate needs only per-table 1-row stat aggs; each
    actual is one count (the joins co-partition on their keys)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")

    def join_case(name, a, ak, b, bk):
        stats_a = a.agg(
            F.count(F.lit(1)).alias("na"), F.countDistinct(ak).alias("da")
        )
        stats_b = b.agg(
            F.count(F.lit(1)).alias("nb"), F.countDistinct(bk).alias("db")
        )
        actual = (
            a.select(F.col(ak).alias("_k"))
            .join(b.select(F.col(bk).alias("_k")), "_k")
            .agg(F.count(F.lit(1)).alias("actual_rows"))
        )
        return (
            stats_a.crossJoin(stats_b)
            .crossJoin(actual)
            .select(
                F.lit(name).alias("case_name"),
                half_up(
                    F.col("na") * F.col("nb") / F.greatest("da", "db"), 2
                ).alias("est_rows"),
                "actual_rows",
            )
        )

    def conj_case(name, df, p1, p2):
        s = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.when(p1, 1.0).otherwise(0.0)).alias("s1"),
            F.avg(F.when(p2, 1.0).otherwise(0.0)).alias("s2"),
            F.sum(F.when(p1 & p2, 1).otherwise(0)).alias("actual_rows"),
        )
        return s.select(
            F.lit(name).alias("case_name"),
            half_up(F.col("n") * F.col("s1") * F.col("s2"), 2).alias("est_rows"),
            "actual_rows",
        )

    cases = [
        join_case("join_orders_customer", o, "o_custkey", c, "c_custkey"),
        join_case("join_lineitem_part", li, "l_partkey", p, "p_partkey"),
        conj_case(
            "conj_lineitem_disc_qty",
            li,
            F.col("l_discount") > 0.05,
            F.col("l_quantity") < 25,
        ),
        conj_case(
            "conj_orders_prio_price",
            o,
            F.col("o_orderpriority") == "1-URGENT",
            F.col("o_totalprice") > 100000,
        ),
    ]
    out = cases[0]
    for x in cases[1:]:
        out = out.unionByName(x)
    return out.select(
        "case_name",
        "est_rows",
        "actual_rows",
        half_up(F.col("est_rows") / F.col("actual_rows"), 4).alias("est_ratio"),
    )


def q296_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix [EXT]: pairwise Jaccard between the
    distinct-user audiences of each event type — the segment-overlap
    readout an activation/advertising stack computes before assuming two
    triggers reach different people. Intersections via a self-join of the
    deduped (type, user) table ON THE USER KEY (co-partitioned), sizes
    broadcast back into the pair rollup.

    Scale shape: the only corpus-sized work is one distinct; the
    user-keyed self-join fans out by per-user type count (≤|types|);
    audience sizes are a tiny broadcast."""
    ev = _t(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(F.count(F.lit(1)).alias("_n"))
    inter = (
        tu.alias("a")
        .join(tu.alias("b"), "user_id")
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(sizes.withColumnsRenamed({"event_type": "type_a", "_n": "n_a"})),
            "type_a",
        )
        .join(
            F.broadcast(sizes.withColumnsRenamed({"event_type": "type_b", "_n": "n_b"})),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_common",
            half_up(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def q297_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit [EXT]: group customers by the quasi-identifier
    tuple (nation, market segment, balance bucket) and report, for k ∈
    {2, 5, 10}, how many equivalence classes fall below k and how many
    ROWS sit in them — the re-identification exposure a privacy review
    quantifies before any 'anonymized' extract ships.

    Scale shape: one QI aggregation; the k sweep explodes the bounded
    group-size table ×3, never the raw rows."""
    c = _t(spark, sf_dir, "customer")
    groups = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).alias("_bb"),
    ).agg(F.count(F.lit(1)).alias("_gs"))
    ks = F.explode(F.array(F.lit(2), F.lit(5), F.lit(10))).alias("k")
    return (
        groups.select("_gs", ks)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.when(F.col("_gs") < F.col("k"), 1).otherwise(0)).alias(
                "n_groups_below_k"
            ),
            F.sum(
                F.when(F.col("_gs") < F.col("k"), F.col("_gs")).otherwise(0)
            ).alias("n_rows_at_risk"),
        )
    )


def q298_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private noisy counts, calibration run [EXT]:
    per-nation customer counts with Laplace(1/ε) noise, ε=1, drawn by
    inverse-CDF from a deterministic md5 uniform — noise as a MAP
    expression, reproducible across engines (the release pipeline swaps
    in a real RNG; THIS run publishes true+noisy side by side to verify
    the mechanism's error envelope, which is why it may).

    Scale shape: one keyed count; noise is constant arithmetic per
    group."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cnt = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    u = (
        F.conv(F.substring(F.md5(F.concat_ws("-", F.col("n_name"), F.lit("dp1"))), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    centered = u - 0.5
    noise = -F.signum(centered) * F.log(1 - 2 * F.abs(centered))
    return cnt.select(
        "n_name",
        "true_count",
        F.round(F.col("true_count") + noise, 4).alias("noisy_count"),
        F.round(F.abs(noise), 4).alias("abs_noise"),
    )


def q299_lsh_scurve_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding planner [EXT]: the analytic S-curve
    P(candidate) = 1−(1−s^r)^b for candidate (bands, rows) configs over a
    similarity grid, plus each config's threshold estimate (1/b)^(1/r) —
    the table you read BEFORE picking q23/q228's banding, where q203
    measures the same trade-off empirically. Generated entirely
    in-engine from literal grids (no table scan).

    Scale shape: a 5×9 literal explode; pure arithmetic."""
    spark_range = spark.range(1)
    cfgs = F.explode(
        F.array(
            *[
                F.struct(F.lit(b).alias("b"), F.lit(r).alias("r"))
                for b, r in ((4, 8), (8, 4), (16, 2), (16, 8), (32, 4))
            ]
        )
    ).alias("_c")
    svals = F.explode(
        F.array(*[F.lit(round(s / 10.0, 1)) for s in range(1, 10)])
    ).alias("s")
    grid = (
        spark_range.select(cfgs)
        .select("_c.b", "_c.r", svals)
    )
    return grid.select(
        "b",
        "r",
        "s",
        F.round(
            1 - F.pow(1 - F.pow(F.col("s"), F.col("r")), F.col("b")), 6
        ).alias("p_candidate"),
        F.round(F.pow(1.0 / F.col("b"), 1.0 / F.col("r")), 4).alias(
            "est_threshold"
        ),
    )


def q300_feature_store_materialization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store materialization audit [EXT]: denormalize the star
    schema into the wide per-order training table (order value, customer
    balance, nation/region attributes, order weekday) and emit a
    per-region row count + order-insensitive md5 content checksum +
    feature sums — the publish-gate a feature platform runs so training
    and serving provably read the SAME materialization (q263's checksum
    machinery applied to a derived table instead of a base one).

    Scale shape: fact→dim joins are all broadcast (dims bounded); the
    audit rollup is one keyed agg over ≤|regions| keys — the wide table
    itself never collects."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    wide = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "r_name",
            "o_orderkey",
            "o_totalprice",
            "c_acctbal",
            "n_name",
            F.weekday("o_orderdate").alias("_dow"),
        )
    )
    rowhash = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    "o_orderkey",
                    "n_name",
                    # integer cents, not a formatted double: both engines
                    # stringify BIGINT identically; double->string repr differs
                    F.round(F.col("o_totalprice") * 100).cast("long"),
                    "_dow",
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return wide.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(rowhash).alias("content_checksum32"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
    )


def q301_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card statistics [EXT]: the per-language table a model
    datasheet publishes — document counts, exact-duplicate exposure,
    token totals, median document length, vocabulary size, mean token
    length — computed in one pass over the token explosion plus one
    content-hash aggregation (the 'datasheets for datasets' numbers,
    generated by the engine that owns the data rather than a side
    script).

    Scale shape: one token explode feeding (lang, token) and (lang, doc)
    aggregations; dup exposure reuses q20's content-hash grouping; the
    per-lang rollup is bounded by |langs|."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "lang",
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    per_doc = tok.groupBy("lang", "doc_id").agg(
        F.count(F.lit(1)).alias("_nt"), F.sum(F.length("w")).alias("_chars")
    )
    doc_stats = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_nt").alias("total_tokens"),
        F.round(F.expr("percentile(_nt, 0.5)"), 1).alias("median_tokens"),
        half_up(F.sum("_chars") / F.sum("_nt"), 4).alias("avg_token_len"),
    )
    vocab = tok.select("lang", "w").distinct().groupBy("lang").agg(
        F.count(F.lit(1)).alias("vocab_size")
    )
    dups = (
        d.groupBy("lang", F.sha2("text", 256).alias("_h"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("lang")
        .agg(
            F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(0)).alias(
                "n_exact_dup_docs"
            )
        )
    )
    return (
        doc_stats.join(vocab, "lang")
        .join(dups, "lang")
        .select(
            "lang",
            "n_docs",
            "n_exact_dup_docs",
            "total_tokens",
            "median_tokens",
            "vocab_size",
            "avg_token_len",
        )
    )


def q302_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training [EXT]: per query
    vector, the top-3 most-similar corpus vectors whose LABEL differs —
    the 'confusable but wrong' examples an embedding trainer feeds as
    negatives (library operator similarity.hard_negative_topk; the
    label-exclusion predicate composes unchanged with the IVF/LSH
    candidate paths at lake scale).

    Scale shape: queries broadcast, scoring map-only over the corpus,
    per-query top-k is the only exchange."""
    from hubverse_transform_spark.operators.similarity import hard_negative_topk

    emb = _t(spark, sf_dir, "embeddings")
    out = hard_negative_topk(
        emb, emb.filter(F.col("vec_id") < 50), k=3
    )
    return out.select(
        "query_id",
        "neighbor_id",
        "neighbor_label",
        F.round("cosine_sim", 6).alias("cosine_sim"),
        "rank",
    )


def q303_dedup_method_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-method overlap structure (UpSet matrix) [EXT]: every
    candidate duplicate PAIR flagged by exact content hash, MinHash-LSH
    (q23's config) or SimHash (q37's config), bucketed by the exact
    METHOD COMBINATION that caught it (bitmask: exact=4, minhash=2,
    simhash=1) — q199 counts per-method doc yields; this shows which
    methods agree on WHICH pairs, the evidence for dropping a redundant
    signal from the cascade.

    Scale shape: reuses the three independently-oracled pair generators
    (each banding/blocking-bounded); the mask join runs over the tiny
    union of caught pairs."""
    d = _t(spark, sf_dir, "documents")
    ex = (
        d.select(F.sha2("text", 256).alias("_h"), "doc_id").alias("a")
        .join(
            d.select(F.sha2("text", 256).alias("_h"), F.col("doc_id").alias("doc_b")),
            "_h",
        )
        .filter(F.col("doc_id") < F.col("doc_b"))
        .select(F.col("doc_id").alias("id_a"), F.col("doc_b").alias("id_b"))
    )
    mh = minhash_lsh_pairs(
        d, "doc_id", "text", ngram=3, num_hashes=8, bands=4, threshold=0.1
    ).select("id_a", "id_b")
    sh = simhash_near_dup_pairs(
        d, "doc_id", "text", bits=32, ngram=2, max_hamming=3
    ).select("id_a", "id_b")
    allp = ex.unionByName(mh).unionByName(sh).distinct()

    def mark(pairs, name):
        return pairs.distinct().withColumn(name, F.lit(1))

    masked = (
        allp.join(mark(ex, "_e"), ["id_a", "id_b"], "left")
        .join(mark(mh, "_m"), ["id_a", "id_b"], "left")
        .join(mark(sh, "_s"), ["id_a", "id_b"], "left")
        .select(
            (
                F.coalesce("_e", F.lit(0)) * 4
                + F.coalesce("_m", F.lit(0)) * 2
                + F.coalesce("_s", F.lit(0))
            ).alias("method_mask")
        )
    )
    return masked.groupBy("method_mask").agg(F.count(F.lit(1)).alias("n_pairs"))


def q304_seasonal_adjusted_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted anomaly detection [EXT]: daily event counts
    per type, divided by that type's day-of-week index (q241's
    decomposition) BEFORE z-scoring — per type, how many days flag at
    |z| ≥ 2 raw vs adjusted, and how many days FLIP — the direct measure
    of how many 'anomalies' q154's unadjusted detector hallucinates out
    of plain weekly seasonality.

    Scale shape: one daily rollup; dow index and moments are bounded
    aggregations joined back on the type key."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("_day")
    ).agg(F.count(F.lit(1)).cast("double").alias("_v"))
    daily = daily.withColumn("_dow", F.weekday("_day"))
    dow_idx = (
        daily.groupBy("event_type", "_dow")
        .agg(F.avg("_v").alias("_dmu"))
        .join(
            daily.groupBy("event_type").agg(F.avg("_v").alias("_mu")), "event_type"
        )
        .select("event_type", "_dow", (F.col("_dmu") / F.col("_mu")).alias("_idx"))
    )
    adj = daily.join(dow_idx, ["event_type", "_dow"]).select(
        "event_type", "_v", (F.col("_v") / F.col("_idx")).alias("_adj")
    )
    moments = adj.groupBy("event_type").agg(
        F.avg("_v").alias("_rm"),
        F.stddev_pop("_v").alias("_rs"),
        F.avg("_adj").alias("_am"),
        F.stddev_pop("_adj").alias("_as"),
    )
    flags = adj.join(F.broadcast(moments), "event_type").select(
        "event_type",
        (F.abs((F.col("_v") - F.col("_rm")) / F.col("_rs")) >= 2).alias("_fr"),
        (F.abs((F.col("_adj") - F.col("_am")) / F.col("_as")) >= 2).alias("_fa"),
    )
    return flags.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.when(F.col("_fr"), 1).otherwise(0)).alias("n_raw_anomalies"),
        F.sum(F.when(F.col("_fa"), 1).otherwise(0)).alias("n_adjusted_anomalies"),
        F.sum(F.when(F.col("_fr") != F.col("_fa"), 1).otherwise(0)).alias("n_flips"),
    )


def q305_decile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-segment migration matrix [EXT]: users bucketed into spend
    quintiles in the first half of the window and again in the second
    half, cross-tabulated — the churn/upsell movement matrix a growth
    team reads (who left the top quintile?). Buckets come from broadcast
    percentile thresholds (q280's scale-correct quintile machinery), the
    matrix is one 25-cell rollup.

    Scale shape: two conditional sums per user in ONE scan, thresholds
    are a 1-row broadcast, no global rank window."""
    ev = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp_ntz")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, F.col("value"))).alias("_x"),
        F.sum(F.when(F.col("ts") >= cut, F.col("value"))).alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    th = per_user.agg(
        F.expr("percentile(_x, array(0.2D, 0.4D, 0.6D, 0.8D))").alias("_tx"),
        F.expr("percentile(_y, array(0.2D, 0.4D, 0.6D, 0.8D))").alias("_ty"),
    )

    def score(v, t):
        s = F.lit(1)
        for i in range(4):
            s = s + F.when(v > t[i], 1).otherwise(0)
        return s

    scored = per_user.crossJoin(F.broadcast(th)).select(
        score(F.col("_x"), F.col("_tx")).alias("pre_quintile"),
        score(F.col("_y"), F.col("_ty")).alias("post_quintile"),
    )
    return scored.groupBy("pre_quintile", "post_quintile").agg(
        F.count(F.lit(1)).alias("n_users")
    )


def q306_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction [EXT]: the experiment metric (per-user
    post-period value) adjusted by the pre-period covariate,
    y' = y − θ(x − x̄) with θ = cov(y,x)/var(x) — per arm: raw and
    adjusted means plus the variance-reduction ratio, the standard trick
    that cuts experiment runtimes ~θ²ρ² without touching the treatment
    effect (complements q230's t-test and q282's power math).

    Scale shape: one per-user conditional aggregation; θ and x̄ are a
    1-row broadcast; per-arm rollup is two keys."""
    ev = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp_ntz")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, F.col("value"))).alias("_x"),
        F.sum(F.when(F.col("ts") >= cut, F.col("value"))).alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    # theta is undefined when the covariate has no variance (single
    # qualifying user on sparse data): aggregate moments, then guard the
    # division — adjusted columns go NULL rather than ANSI-crashing
    g = per_user.agg(
        F.covar_pop("_y", "_x").alias("_cyx"),
        F.var_pop("_x").alias("_vx"),
        F.avg("_x").alias("_xbar"),
    ).select(
        F.when(F.col("_vx") > 0, F.col("_cyx") / F.col("_vx")).alias("_theta"),
        "_xbar",
    )
    adj = per_user.crossJoin(F.broadcast(g)).select(
        (F.col("user_id") % 2).alias("arm"),
        "_y",
        (
            F.col("_y") - F.col("_theta") * (F.col("_x") - F.col("_xbar"))
        ).alias("_yadj"),
        "_theta",
    )
    return adj.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        # per-user _y is a sum of cent-grid values whose float error is
        # << half a cent, so round(_y*100) recovers identical exact cents
        _half_up(F.sum(_fixed("_y", 100)), F.count(F.lit(1)) * 100, 6).alias("mean_y"),
        # half-safe: _yadj embeds theta = cov/var (irrational) — a d=6
        # half-boundary hit has measure zero
        F.round(F.avg("_yadj"), 6).alias("mean_y_cuped"),
        # an arm with one user has var_pop(_y) exactly 0: the reduction
        # ratio is undefined there — guarded NULL, mirrored in the oracle
        F.round(
            F.when(
                F.var_pop("_y") > 0,
                F.lit(1) - F.var_pop("_yadj") / F.var_pop("_y"),
            ),
            6,
        ).alias("var_reduction"),
        F.round(F.max("_theta"), 6).alias("theta"),
    )


def q307_ipw_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted ATE [EXT]: stratify users by pre-period
    activity quintile, estimate per-stratum propensity P(treat|stratum),
    then the Horvitz-Thompson estimate avg(t·y/p − (1−t)·y/(1−p)) — the
    observational-causal counterpart of q306's CUPED and q278's
    diff-in-diff, with positivity diagnostics (min/max propensity).

    Scale shape: per-user conditional aggregation, then two broadcast
    joins (4 quintile cuts; ≤5 stratum propensities); final 1-row agg."""
    ev = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp_ntz")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, F.col("value"))).alias("_x"),
        F.sum(F.when(F.col("ts") >= cut, F.col("value"))).alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    cuts = per_user.agg(
        F.expr("percentile(_x, array(0.2, 0.4, 0.6, 0.8))").alias("_c")
    )
    strat = per_user.crossJoin(F.broadcast(cuts)).select(
        (F.col("user_id") % 2).cast("double").alias("_t"),
        "_y",
        F.aggregate(
            "_c",
            F.lit(0),
            lambda acc, c: acc + F.when(F.col("_x") > c, 1).otherwise(0),
        ).alias("_stratum"),
    )
    prop = strat.groupBy("_stratum").agg(F.avg("_t").alias("_p"))
    scored = strat.join(F.broadcast(prop), "_stratum")
    # naive diff of means over cent-grid _y: A1/(100 n1) − A0/(100 n0)
    # = (A1·n0 − A0·n1)/(100·n1·n0) — an exact integer ratio
    _a1 = F.sum(F.when(F.col("_t") == 1, _fixed("_y", 100)))
    _n1 = F.count(F.when(F.col("_t") == 1, 1))
    _a0 = F.sum(F.when(F.col("_t") == 0, _fixed("_y", 100)))
    _n0 = F.count(F.when(F.col("_t") == 0, 1))
    return scored.agg(
        F.count(F.lit(1)).alias("n_users"),
        _half_up(_a1 * _n0 - _a0 * _n1, F.lit(100) * _n1 * _n0, 6).alias(
            "naive_diff"
        ),
        # half-safe: the IPW term divides by the propensity _p (a
        # heterogeneous per-stratum rational); a d=6 half boundary needs
        # the reduced sum denominator = 2*10^6*odd — measure-zero.
        # Positivity guard: a stratum that is all-treatment (p=1) or
        # all-control (p=0) has no defined IPW contribution — its rows are
        # excluded (CASE short-circuits, so ANSI mode never divides by 0;
        # unguarded this crashed at sf0.001, where a quintile stratum
        # genuinely goes single-arm).
        F.round(
            F.avg(
                F.when(
                    (F.col("_p") > 0) & (F.col("_p") < 1),
                    F.col("_t") * F.col("_y") / F.col("_p")
                    - (1 - F.col("_t")) * F.col("_y") / (1 - F.col("_p")),
                )
            ),
            6,
        ).alias("ipw_ate"),
        F.round(F.min("_p"), 6).alias("min_propensity"),
        F.round(F.max("_p"), 6).alias("max_propensity"),
    )


def q308_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit [EXT]: complement of q297's k-anonymity — within
    each quasi-identifier equivalence class (nation, balance bucket), the
    SENSITIVE attribute (market segment) must take ≥ l distinct values
    (distinct l-diversity) with entropy ≥ ln(l) (entropy l-diversity), or
    a homogeneity attack reads the sensitive value straight off the QI.
    Reports, for l ∈ {2, 3}, the failing classes under both criteria.

    Scale shape: two cascaded aggregations (QI+sensitive → QI); the l
    sweep explodes only the bounded per-class table."""
    c = _t(spark, sf_dir, "customer")
    cells = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).alias("_bb"),
        "c_mktsegment",
    ).agg(F.count(F.lit(1)).alias("_n"))
    # round the entropy to 9 decimals: uniform groups land EXACTLY at
    # ln(d) in infinite precision, and summation-order noise would
    # otherwise flip the h < ln(l) boundary between engines
    # half-safe: _h and the ln(l) threshold are log-based irrationals (a
    # 1e-9 half boundary has measure zero), and the downstream sums
    # aggregate exact 0/1 indicators of the stabilized comparison — the
    # rounded float itself is never averaged or displayed.
    groups = cells.groupBy("c_nationkey", "_bb").agg(
        F.count(F.lit(1)).alias("_d"),
        F.sum("_n").alias("_tot"),
        F.round(
            F.log(F.sum("_n"))
            - F.sum(F.col("_n") * F.log("_n")) / F.sum("_n"),
            9,
        ).alias("_h"),
    )
    ls = F.explode(F.array(F.lit(2), F.lit(3))).alias("l")
    return (
        groups.select("_d", "_tot", "_h", ls)
        .groupBy("l")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.when(F.col("_d") < F.col("l"), 1).otherwise(0)).alias(
                "n_below_distinct_l"
            ),
            F.sum(
                F.when(
                    F.col("_h") < F.round(F.log(F.col("l").cast("double")), 9), 1
                ).otherwise(0)
            ).alias("n_below_entropy_l"),
            F.sum(
                F.when(F.col("_d") < F.col("l"), F.col("_tot")).otherwise(0)
            ).alias("n_rows_at_risk"),
        )
    )


def q309_blocking_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage blocking audit [EXT]: evaluate candidate-generation
    strategies against exact ground truth (3-gram Jaccard ≥ 0.5 pairs,
    inverted-index join). Per strategy — length bucket (n_chars/100) vs
    first token — report candidate volume, reduction ratio vs all-pairs,
    and pairs completeness (recall of true pairs whose two docs share a
    block). The standard pre-flight before committing to a blocking key
    in entity resolution (complements q245's Fellegi-Sunter scoring).

    Scale shape: candidate volume is Σ n·(n−1)/2 over block sizes — an
    aggregation, never a materialized pair set; completeness joins the
    (small) truth-pair table to per-doc block keys twice."""
    d = _t(spark, sf_dir, "documents")
    truth = ngram_jaccard_pairs(
        d, "doc_id", "text", ngram=3, threshold=0.5, block_col=None
    ).select("id_a", "id_b")
    keyed = d.select(
        "doc_id",
        F.floor(F.col("n_chars") / 100).cast("string").alias("len_bucket"),
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").getItem(0).alias(
            "first_token"
        ),
    )
    n_docs = d.count()
    total_pairs = n_docs * (n_docs - 1) // 2
    strategies = [("len_bucket", "len_bucket"), ("first_token", "first_token")]
    outs = []
    for name, col in strategies:
        cand = (
            keyed.groupBy(col)
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(
                F.sum(F.col("_n") * (F.col("_n") - 1) / 2)
                .cast("long")
                .alias("n_candidate_pairs")
            )
        )
        compl = (
            keyed.select(F.col("doc_id").alias("id_a"), F.col(col).alias("_ka"))
            .join(F.broadcast(truth), "id_a")
            .join(
                keyed.select(F.col("doc_id").alias("id_b"),
                             F.col(col).alias("_kb")).hint("shuffle_hash"),
                "id_b",
            )
            .agg(
                F.count(F.lit(1)).alias("n_true_pairs"),
                F.coalesce(
                    _half_up(
                        F.sum((F.col("_ka") == F.col("_kb")).cast("long")),
                        F.count(F.lit(1)),
                        6,
                    ),
                    F.lit(0.0),
                ).alias("pairs_completeness"),
            )
        )
        outs.append(
            cand.crossJoin(compl).select(
                F.lit(name).alias("strategy"),
                "n_candidate_pairs",
                _half_up(
                    F.lit(total_pairs) - F.col("n_candidate_pairs"),
                    F.lit(total_pairs),
                    6,
                ).alias("reduction_ratio"),
                "n_true_pairs",
                "pairs_completeness",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def q310_bigram_backoff_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff bigram LM scoring [EXT]: corpus-fit bigram model with
    Brants-style backoff — score(w2|w1) = ln(c(w1,w2)/c(w1)) when the
    bigram was seen, else ln(0.4·c(w2)/N) — rolled up per language as the
    fluency signal one tier above q114's unigram filter. Also reports the
    backoff rate (unseen-bigram share), the usual LM-coverage diagnostic.

    Scale shape: token stream shuffles once per count table; the bigram
    model is corpus-sized so it shuffle-joins on (w1, w2), while the
    vocab-bounded unigram table broadcasts; per-lang rollup is 2-key."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.posexplode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "pos", "w"
        ),
    ).filter(F.col("w") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = toks.select(
        "lang", F.lag("w").over(w).alias("w1"), F.col("w").alias("w2")
    ).filter(F.col("w1").isNotNull())
    uni = toks.groupBy(F.col("w").alias("w1")).agg(F.count(F.lit(1)).alias("c1"))
    big = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    n_total = toks.agg(F.count(F.lit(1)).alias("n")).select("n")
    scored = (
        bg.join(big.hint("shuffle_hash"), ["w1", "w2"], "left")
        .join(F.broadcast(uni), "w1")
        .join(
            F.broadcast(uni.select(F.col("w1").alias("w2"),
                                   F.col("c1").alias("c1_w2"))),
            "w2",
        )
        .crossJoin(F.broadcast(n_total))
        .select(
            "lang",
            F.when(
                F.col("c2").isNotNull(), F.log(F.col("c2") / F.col("c1"))
            ).otherwise(
                F.log(F.lit(0.4)) + F.log(F.col("c1_w2") / F.col("n"))
            ).alias("lp"),
            F.col("c2").isNull().cast("long").alias("backed_off"),
        )
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        # half-safe: lp is a natural-log probability (irrational) — a d=6
        # half-boundary hit has measure zero
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
        # the backoff rate is an exact indicator-count ratio
        _half_up(F.sum("backed_off"), F.count(F.lit(1)), 6).alias("backoff_rate"),
    )


def q311_ann_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN hubness audit [EXT]: the k-occurrence distribution — how often
    each vector appears in other vectors' exact top-10 cosine neighbor
    lists. High-dimensional corpora grow 'hubs' (vectors in everyone's
    neighbor list) and antihubs (in nobody's); a skewed k-occurrence
    histogram predicts poor ANN recall before an index is ever built
    (Radovanović et al., JMLR 2010). Buckets: 0, 1–4, 5–9, 10–19, 20+.

    Scale shape: capped probe set (vec_id < 2000) bounds the probe matrix
    (≤2000×64 f64 ≈ 1 MB), collected once and broadcast; the neighbor side
    streams through ``mapInPandas`` and each Arrow batch is scored with ONE
    BLAS GEMM — the ``similarity._exact_cosine_pairs_blocked`` pattern,
    ~100× the interpreted ``aggregate(zip_with(...))`` fold it replaces
    (round-7 verdict item). Each batch emits only its per-query partial
    top-10 (with a 2e-9 slack: |x − round9(x)| ≤ 5e-10, so any row whose
    ROUNDED sim ties the batch's 10th cannot sit below threshold − 1e-9 —
    rounding ties are never cut), so the finalizing window reads ~10 rows
    per (query, batch) instead of all n_q·n pairs. Ranking stays
    Spark-side on ``F.round(sim, 9)`` with the id tie-break, identical to
    the oracle's."""
    import numpy as np
    import pandas as pd

    base = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 2000)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    # collect the probe matrix from the PRE-repartition projection (no
    # shuffle job just to move <=2000 rows to the driver); only the
    # mapInPandas GEMM input needs the spread, because a one-file scan
    # would serialize the scoring loop onto one task
    e = base.repartition(spark.sparkContext.defaultParallelism)
    probes = base.collect()  # bounded by construction: vec_id < 2000
    q_ids = np.array([r["vec_id"] for r in probes], dtype=np.int64)
    qm = np.array([list(r["v"]) for r in probes], dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1)
    qn[qn == 0] = np.inf
    sc = spark.sparkContext
    b_ids, b_q, b_qn = sc.broadcast(q_ids), sc.broadcast(qm), sc.broadcast(qn)

    def score(batches):
        qi, mat, nrm = b_ids.value, b_q.value, b_qn.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.array([list(v) for v in pdf["v"]], dtype=np.float64)
            an = np.linalg.norm(a, axis=1)
            an[an == 0] = np.inf
            s = (a @ mat.T) / (an[:, None] * nrm[None, :])
            nid = pdf["vec_id"].to_numpy()
            s[nid[:, None] == qi[None, :]] = -np.inf  # self-pairs out
            k = min(10, s.shape[0])
            thr = np.partition(s, -k, axis=0)[-k, :]
            keep = (s >= (thr[None, :] - 2e-9)) & np.isfinite(s)
            ii, jj = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "query_id": qi[jj],
                    "neighbor_id": nid[ii],
                    "sim_raw": s[ii, jj],
                }
            )

    scored = e.mapInPandas(
        score, "query_id long, neighbor_id long, sim_raw double"
    ).select(
        "query_id",
        "neighbor_id",
        # round before ranking: both engines agree on 9-decimal sims, so
        # near-tie rank order is decided by the id tie-break, not by
        # 1e-16 summation-order noise
        F.round("sim_raw", 9).alias("sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    topk = scored.withColumn("rank", F.row_number().over(wq)).filter(
        F.col("rank") <= 10
    )
    indeg = (
        e.select(F.col("vec_id").alias("neighbor_id"))
        .join(topk.groupBy("neighbor_id").agg(F.count(F.lit(1)).alias("_k")),
              "neighbor_id", "left")
        .select(F.coalesce(F.col("_k"), F.lit(0)).alias("k_occ"))
    )
    bucket = (
        F.when(F.col("k_occ") == 0, "0_antihub")
        .when(F.col("k_occ") < 5, "1-4")
        .when(F.col("k_occ") < 10, "5-9")
        .when(F.col("k_occ") < 20, "10-19")
        .otherwise("20+_hub")
    )
    out = indeg.groupBy(bucket.alias("k_occurrence_bucket")).agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.max("k_occ").alias("max_k_occurrence"),
    )
    # compute-release (the q245 pattern): materialize the 5-row histogram
    # eagerly, then DESTROY the three probe broadcasts — otherwise repeated
    # invocations in a long session (bench loops, test suites) accumulate
    # ~1 MB of driver+executor broadcast blocks per call
    out = out.localCheckpoint(eager=True)
    for b in (b_ids, b_q, b_qn):
        b.destroy()
    return out


def q312_attribution_model_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution comparison [EXT]: the same purchases as
    q145, credited under three standard models at once — first-touch,
    last-touch, and linear (cents split evenly over every qualifying
    touch in the preceding hour via largest-remainder integer division;
    'direct' when none) — the side-by-side a marketing team reads before
    picking a model. All three credits are exact integer cents.

    Scale shape: one RANGE-framed window per user collects the touch
    structs (no self-join); linear explodes only purchase rows × their
    bounded touch lists; final rollup is channel-keyed."""
    from hubverse_transform_spark.operators.sessions import _epoch_seconds

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        _epoch_seconds(F.col("ts")).alias("_t"),
        F.round(F.col("value") * 100, 0).cast("long").alias("_cents"),
    )
    w = Window.partitionBy("user_id").orderBy("_t").rangeBetween(-3600, 0)
    touches = F.array_sort(
        F.collect_list(
            F.when(
                F.col("event_type") != "purchase",
                F.struct(F.col("_t").alias("t"), F.col("event_type").alias("et")),
            )
        ).over(w)
    )
    purchases = (
        ev.withColumn("_touches", touches)
        .filter(F.col("event_type") == "purchase")
        .select(
            "_cents",
            F.coalesce(F.get("_touches", 0).getField("et"),
                       F.lit("direct")).alias("_first"),
            F.coalesce(
                F.try_element_at("_touches", F.lit(-1)).getField("et"),
                F.lit("direct"),
            ).alias("_last"),
            F.when(
                F.size("_touches") == 0, F.array(F.lit("direct"))
            ).otherwise(F.transform("_touches", lambda s: s.getField("et"))).alias(
                "_chs"
            ),
        )
    )
    first = purchases.groupBy(F.col("_first").alias("channel")).agg(
        F.sum("_cents").alias("_fc")
    )
    last = purchases.groupBy(F.col("_last").alias("channel")).agg(
        F.sum("_cents").alias("_lc")
    )
    # exact integer cents: cents div n to every touch, remainder cents to the
    # first (cents mod n) touches in sorted order — largest-remainder
    # distribution keeps the per-channel sums hash-stable (no 1/n floats)
    linear = (
        purchases.select(
            "_cents",
            F.size("_chs").alias("_n"),
            F.posexplode("_chs").alias("_pos", "channel"),
        )
        .groupBy("channel")
        .agg(
            F.sum(
                F.expr("_cents div _n")
                + F.when(F.col("_pos") < F.col("_cents") % F.col("_n"), 1)
                .otherwise(0)
            ).alias("_nc")
        )
    )
    # linear's channel set is a superset of first/last (a first or last touch
    # is always an element of the touch list), so left joins are lossless
    return (
        linear.join(first, "channel", "left")
        .join(last, "channel", "left")
        .select(
            "channel",
            F.round(F.coalesce(F.col("_fc"), F.lit(0)) / 100.0, 2).alias(
                "first_touch_value"
            ),
            F.round(F.coalesce(F.col("_lc"), F.lit(0)) / 100.0, 2).alias(
                "last_touch_value"
            ),
            F.round(F.col("_nc") / 100.0, 2).alias("linear_value"),
        )
    )


def q313_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance retrieval [EXT]: re-rank the query's
    top-12 cosine candidates by greedily picking 5 that balance relevance
    against redundancy — score = λ·sim(q,d) − (1−λ)·max over selected of
    sim(d,s), λ=0.7 (Carbonell & Goldstein 1998) — the diversification a
    RAG stack applies so 5 retrieved chunks aren't 5 near-copies
    (composes with q208's chunking and q167's re-rank).

    Scale shape: candidate generation is the broadcast brute-force top-k
    (IVF/LSH swap in at lake scale); the greedy runs driver-side over the
    k-BOUNDED candidate set (12 ids + 144 pair sims — same bounded-collect
    posture as the IVF centroid pull, never data-sized)."""
    e = (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        # one-file scans serialize the scoring loop onto one task
        .repartition(spark.sparkContext.defaultParallelism)
    )
    qv = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x
    )
    nrm2 = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0.0), lambda s, x: s + x * x
    )
    cand = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "v",
            F.round(
                dot / F.sqrt(nrm2(F.col("qv")) * nrm2(F.col("v"))), 9
            ).alias("simq"),
        )
        .orderBy(F.col("simq").desc(), "vec_id")
        .limit(12)
    )
    rows = cand.collect()  # bounded: 12 candidates
    ids = [r["vec_id"] for r in rows]
    simq = {r["vec_id"]: float(r["simq"]) for r in rows}
    vecs = {r["vec_id"]: [float(x) for x in r["v"]] for r in rows}

    def _cos(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a)
        nb = sum(x * x for x in b)
        return round(d / (na * nb) ** 0.5, 9)

    lam = 0.7
    selected: list[tuple[int, int, float]] = []
    remaining = sorted(ids)
    while len(selected) < 5 and remaining:
        best = None
        for cid in remaining:
            pen = max(
                (_cos(vecs[cid], vecs[s]) for s, _, _ in selected), default=0.0
            )
            score = lam * simq[cid] - (1 - lam) * pen
            if best is None or score > best[1]:
                best = (cid, score)
        selected.append((best[0], len(selected) + 1, best[1]))
        remaining.remove(best[0])
    return spark.createDataFrame(
        [(rank, cid, round(score, 6)) for cid, rank, score in selected],
        "rank int, neighbor_id bigint, mmr_score double",
    )


def q314_obf_sequential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential monitoring audit [EXT]: daily interim looks at the
    running A/B experiment (arm = user_id parity) with an O'Brien-Fleming-
    shaped spending boundary z_bound = 2.2414/√t at information fraction t
    — reports each day's cumulative Welch z against its boundary and
    whether naive fixed-α peeking (|z| > 1.959964) would have "won" early
    where OBF correctly keeps the gate closed. Complements q230 (final
    t-test), q282 (power), q293 (SRM).

    Scale shape: one (day, arm) aggregation; cumulative moments are
    arm-partitioned windows over ~30 day rows; the boundary is constant
    arithmetic."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), (F.col("user_id") % 2).alias("arm")
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("value").alias("_s"),
        F.sum(F.col("value") * F.col("value")).alias("_s2"),
    )
    w = (
        Window.partitionBy("arm")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = daily.select(
        "day",
        "arm",
        F.sum("_n").over(w).alias("_cn"),
        F.sum("_s").over(w).alias("_cs"),
        F.sum("_s2").over(w).alias("_cs2"),
    )
    # day-1 interims can have a single cumulative observation per arm
    # (cn = 1: sample variance undefined) and tied cent-grid values can
    # zero the pooled SE — both guarded NULL (tiny-tier seed 2468 hit the
    # cn-1 division), mirrored in the oracle
    _var = F.when(
        F.col("_cn") > 1,
        (F.col("_cs2") - F.col("_cs") * F.col("_cs") / F.col("_cn"))
        / (F.col("_cn") - 1),
    )
    a = cum.filter(F.col("arm") == 0).select(
        "day",
        F.col("_cn").alias("_na"),
        (F.col("_cs") / F.col("_cn")).alias("_ma"),
        _var.alias("_va"),
    )
    b = cum.filter(F.col("arm") == 1).select(
        "day",
        F.col("_cn").alias("_nb"),
        (F.col("_cs") / F.col("_cn")).alias("_mb"),
        _var.alias("_vb"),
    )
    tot = a.agg(F.max("_na").alias("_ta")).crossJoin(
        b.agg(F.max("_nb").alias("_tb"))
    )
    se = F.sqrt(F.col("_va") / F.col("_na") + F.col("_vb") / F.col("_nb"))
    z = F.when(F.col("_se") > 0, (F.col("_ma") - F.col("_mb")) / F.col("_se"))
    return (
        a.join(b, "day")
        .crossJoin(F.broadcast(tot))
        .withColumn("_se", se)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            half_up(
                (F.col("_na") + F.col("_nb"))
                / (F.col("_ta") + F.col("_tb")).cast("double"),
                6,
            ).alias("info_frac"),
            F.round(z, 6).alias("z_stat"),
            F.round(
                F.lit(2.2414)
                / F.sqrt(
                    (F.col("_na") + F.col("_nb"))
                    / (F.col("_ta") + F.col("_tb")).cast("double")
                ),
                6,
            ).alias("obf_bound"),
            (
                F.abs(z)
                > F.lit(2.2414)
                / F.sqrt(
                    (F.col("_na") + F.col("_nb"))
                    / (F.col("_ta") + F.col("_tb")).cast("double")
                )
            ).alias("obf_crossed"),
            (F.abs(z) > 1.959964).alias("naive_crossed"),
        )
    )


def q315_ecod_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ECOD outlier scoring [EXT] (Li et al., TKDE 2022): per feature,
    the empirical tail probability min(P(X≤v), P(X≥v)); outlier score =
    Σ −ln(tailp) over features (l_quantity, l_discount, l_tax) — the
    parameter-free anomaly detector that needs only per-column CDFs.
    Top-10 most anomalous lineitems with full-key tie-break.

    Scale shape: the CDFs live on (col, value, count) tables — windows
    partition on col_name and scan VALUE-granularity rows (≤70 total),
    never data; scoring joins three broadcast CDF maps; result is a
    TakeOrdered top-10."""
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_discount", "l_tax"]
    melted = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("double").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("_s")
    ).select("_s.col_name", "_s.v")
    cnts = melted.groupBy("col_name", "v").agg(F.count(F.lit(1)).alias("_c"))
    wcdf = (
        Window.partitionBy("col_name")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("col_name")
    cdf = cnts.select(
        "col_name",
        "v",
        (F.sum("_c").over(wcdf) / F.sum("_c").over(wtot)).alias("_pl"),
        (
            (F.sum("_c").over(wtot) - F.sum("_c").over(wcdf) + F.col("_c"))
            / F.sum("_c").over(wtot)
        ).alias("_pr"),
    ).select(
        "col_name",
        "v",
        (-F.log(F.least("_pl", "_pr"))).alias("_nll"),
    )
    scored = li.select("l_orderkey", "l_linenumber", *cols)
    for c in cols:
        scored = scored.join(
            F.broadcast(
                cdf.filter(F.col("col_name") == c).select(
                    F.col("v").alias(c), F.col("_nll").alias(f"_nll_{c}")
                )
            ),
            c,
        )
    return (
        scored.select(
            "l_orderkey",
            "l_linenumber",
            F.round(
                sum(F.col(f"_nll_{c}") for c in cols), 6
            ).alias("ecod_score"),
        )
        .orderBy(F.col("ecod_score").desc(), "l_orderkey", "l_linenumber")
        .limit(10)
    )


def q316_partial_topk_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed top-k merge audit [EXT]: shard the corpus (doc_id mod
    8), take each shard's LOCAL top-20 tokens, merge by summing the local
    counts that survived, and compare the merged top-20 against the exact
    global top-20 — recall@20 and the worst undercount. This is THE
    approximation every "top terms per hour" dashboard quietly makes;
    the audit measures what the shard cut actually costs.

    Scale shape: local top-k is a shard-partitioned window; exact and
    merged top-20 are sort-limits (TakeOrdered); the candidate set is
    ≤ shards×k rows."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        (F.col("doc_id") % 8).alias("shard"),
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    local = toks.groupBy("shard", "w").agg(F.count(F.lit(1)).alias("_lc"))
    wl = Window.partitionBy("shard").orderBy(F.col("_lc").desc(), "w")
    survived = local.withColumn("_r", F.row_number().over(wl)).filter(
        F.col("_r") <= 20
    )
    merged = (
        survived.groupBy("w")
        .agg(F.sum("_lc").alias("_mc"))
        .orderBy(F.col("_mc").desc(), "w")
        .limit(20)
    )
    exact = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("_ec"))
        .orderBy(F.col("_ec").desc(), "w")
        .limit(20)
    )
    joined = exact.join(F.broadcast(merged), "w", "left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.round(F.count("_mc") / 20.0, 6).alias("recall_at_20"),
        F.max(
            F.when(F.col("_mc").isNotNull(), F.col("_ec") - F.col("_mc"))
        ).alias("max_undercount"),
    )


def q317_fd_discovery_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery audit [EXT]: for candidate FDs
    A→B, holds iff ndv(A) == ndv(A,B) (Metanome-style profiling); also
    reports how many LHS values violate (map to >1 RHS) — the
    data-profiling pass a catalog runs before trusting "key" claims
    (complements q264's referential integrity and q294's contracts).

    Scale shape: per FD one (A,B) aggregation then one A aggregation —
    counts only, no row materialization; the 6-FD sweep unions 1-row
    frames."""
    fds = [
        ("orders", "o_orderkey", "o_orderstatus"),
        ("customer", "c_custkey", "c_mktsegment"),
        ("part", "p_name", "p_brand"),
        ("lineitem", "l_partkey", "l_suppkey"),
        ("lineitem", "l_orderkey", "l_returnflag"),
        ("events", "user_id", "event_type"),
    ]
    outs = []
    for tbl, lhs, rhs in fds:
        t = _t(spark, sf_dir, tbl)
        per_lhs = t.groupBy(lhs).agg(F.countDistinct(rhs).alias("_nd"))
        outs.append(
            per_lhs.agg(
                F.count(F.lit(1)).alias("lhs_ndv"),
                F.sum("_nd").alias("pair_ndv"),
                (F.sum("_nd") == F.count(F.lit(1))).alias("holds"),
                F.sum(F.when(F.col("_nd") > 1, 1).otherwise(0)).alias(
                    "n_violating_lhs"
                ),
            ).select(
                F.lit(f"{tbl}.{lhs}->{rhs}").alias("fd"),
                "lhs_ndv",
                "pair_ndv",
                "holds",
                "n_violating_lhs",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def q318_quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization audit [EXT]: map each source's document-
    length distribution onto a shared reference (the cross-source mean of
    per-source centile means — the microarray-style QN recipe adapted to
    unequal group sizes via ntile(100)). Reports, per centile, the
    reference value and the worst per-source deviation — the
    "are these sources even comparable" check before pooling corpora.

    Scale shape: ntile is a source-partitioned window; everything after
    lives on the 100-row-per-source centile grid."""
    d = _t(spark, sf_dir, "documents")
    wn = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    centiles = d.select(
        "source", "n_chars", F.ntile(100).over(wn).alias("centile")
    )
    per_sc = centiles.groupBy("source", "centile").agg(
        F.avg("n_chars").alias("_m")
    )
    wc = Window.partitionBy("centile")
    return (
        per_sc.select(
            "centile", "_m", F.avg("_m").over(wc).alias("_ref")
        )
        .groupBy("centile")
        .agg(
            F.round(F.max("_ref"), 6).alias("ref_value"),
            F.round(F.max(F.abs(F.col("_m") - F.col("_ref"))), 6).alias(
                "max_source_deviation"
            ),
        )
    )


def q319_mann_whitney_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U / rank-biserial effect size per event type [EXT]:
    the nonparametric twin of q230's Welch t-test — U computed from the
    value-granularity histogram (values quantized to 1 decimal), never
    from a global rank: U_A = Σ_v nA(v)·(cumB(<v) + ½·nB(v)), and the
    rank-biserial correlation r = 2U/(nA·nB) − 1 reads as a directional
    effect size robust to outliers.

    Scale shape: one (type, arm, value) aggregation; the cumulative walk
    is a type-partitioned window over the bounded value grid; ½-ties stay
    exact by carrying 2U as an integer."""
    ev = _t(spark, sf_dir, "events")
    hist = ev.groupBy(
        "event_type",
        F.round(F.col("value"), 1).alias("_v"),
    ).agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).alias("_na"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0)).alias("_nb"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # 2U stays integral: 2·nA·cumB(<v) + nA·nB(v)
    stepped = hist.select(
        "event_type",
        "_na",
        "_nb",
        (F.sum("_nb").over(w) - F.col("_nb")).alias("_cumb_less"),
    )
    return (
        stepped.groupBy("event_type")
        .agg(
            F.sum("_na").alias("n_a"),
            F.sum("_nb").alias("n_b"),
            F.sum(
                2 * F.col("_na") * F.col("_cumb_less")
                + F.col("_na") * F.col("_nb")
            ).alias("_u2"),
        )
        .select(
            "event_type",
            "n_a",
            "n_b",
            (F.col("_u2") / 2.0).alias("u_stat"),
            half_up(
                F.col("_u2") / (F.col("n_a") * F.col("n_b")).cast("double")
                - 1.0,
                6,
            ).alias("rank_biserial"),
        )
    )


def q320_equi_depth_histogram_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram construction audit [EXT]: build the 10-bucket
    equi-depth histogram a cost-based optimizer keeps for o_totalprice
    (cut points = exact deciles) and measure how equi the depths actually
    came out — heavy value ties pile rows into one bucket, and the skew
    ratio tells the planner how much to trust uniform-depth selectivity
    math (feeds q295's estimation audit; q281 collects the moments).

    Scale shape: one exact-percentile aggregation (1×9 cuts, broadcast),
    one bucket-assignment pass (CASE sums against the cut array), one
    10-row rollup."""
    o = _t(spark, sf_dir, "orders")
    cuts = o.agg(
        F.expr(
            "percentile(o_totalprice, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
        ).alias("_c")
    )
    binned = o.crossJoin(F.broadcast(cuts)).select(
        "o_totalprice",
        F.aggregate(
            "_c",
            F.lit(0),
            lambda acc, c: acc + F.when(F.col("o_totalprice") > c, 1).otherwise(0),
        ).alias("bucket"),
    )
    n_total = o.count()
    return (
        binned.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .select(
            "bucket",
            "n_rows",
            F.lit(n_total // 10).cast("long").alias("expected_rows"),
            half_up(F.col("n_rows") / F.lit(n_total / 10.0), 6).alias(
                "depth_ratio"
            ),
            "lo",
            "hi",
        )
    )


def q321_markov_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov next-event prediction accuracy [EXT]: train the first-order
    transition table (q226's matrix), predict each transition's next type
    by the argmax row, and score in-sample accuracy per current type —
    the 'is a Markov assumption even useful here' read a sequence-model
    team takes before anything fancier.

    Scale shape: transitions are a user-partitioned lead window; the
    argmax is a 25-row window over the aggregated matrix; scoring joins
    the broadcast 5-row prediction map."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
    )
    counts = trans.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("_n"))
    wr = Window.partitionBy("cur").orderBy(F.col("_n").desc(), "nxt")
    pred = (
        counts.withColumn("_r", F.row_number().over(wr))
        .filter(F.col("_r") == 1)
        .select("cur", F.col("nxt").alias("predicted_next"))
    )
    return (
        trans.join(F.broadcast(pred), "cur")
        .groupBy(F.col("cur").alias("event_type"), "predicted_next")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            _half_up(
                F.sum((F.col("nxt") == F.col("predicted_next")).cast("long")),
                F.count(F.lit(1)),
                6,
            ).alias("accuracy"),
        )
    )


def q322_ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram novelty rate [EXT]: per document, the share of its distinct
    3-grams whose FIRST corpus occurrence (min doc_id) is this document —
    the curation signal that separates content-adding documents from
    recombinations of already-seen text (the incremental view of what
    q121's duplicate-fraction measures in aggregate). Rolled up per lang.

    Scale shape: shingle postings shuffle once for the min-doc table and
    once joining back (both keyed on the shingle); the per-doc and
    per-lang rollups are keyed aggregations."""
    d = _t(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        "lang",
        F.explode_outer(shingle_ngrams(F.col("text"), 3)).alias("_s"),
    ).filter(F.col("_s").isNotNull())
    first = sh.groupBy("_s").agg(F.min("doc_id").alias("_first"))
    per_doc = (
        sh.join(first.hint("shuffle_hash"), "_s")
        .groupBy("doc_id", "lang")
        .agg(
            F.avg((F.col("_first") == F.col("doc_id")).cast("double")).alias(
                "_nov"
            )
        )
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        # half-safe: _nov is a mean of per-doc rationals with heterogeneous
        # denominators (distinct 3-grams per doc); a d=6 half boundary
        # needs the reduced sum denominator = 2*10^6*odd — measure-zero
        F.round(F.avg("_nov"), 6).alias("avg_novelty_rate"),
        F.round(F.min("_nov"), 6).alias("min_novelty_rate"),
    )


def q323_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate span detection [EXT]: per source, the 5-gram spans
    appearing in more than 5% of that source's documents — the
    CommonCrawl-style header/footer/template signal a cleaning pipeline
    strips before dedup (distinct from q126's chunk dedup: this flags the
    repeated UNIT, not the duplicated document). Top-10 per source by
    document frequency.

    Scale shape: distinct 5-grams per doc explode once; the (source,
    ngram) df table aggregates, joins the broadcast per-source doc
    counts, and ranks inside a source-partitioned window."""
    d = _t(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        "source",
        F.explode_outer(shingle_ngrams(F.col("text"), 5)).alias("_g"),
    ).filter(F.col("_g").isNotNull())
    df_tbl = sh.groupBy("source", "_g").agg(
        F.countDistinct("doc_id").alias("_df")
    )
    per_src = d.groupBy("source").agg(F.count(F.lit(1)).alias("_nd"))
    wr = Window.partitionBy("source").orderBy(F.col("_df").desc(), "_g")
    return (
        df_tbl.join(F.broadcast(per_src), "source")
        .filter(F.col("_df") > 0.05 * F.col("_nd"))
        .withColumn("_r", F.row_number().over(wr))
        .filter(F.col("_r") <= 10)
        .select(
            "source",
            F.col("_g").alias("ngram"),
            F.col("_df").alias("doc_freq"),
            half_up(F.col("_df") / F.col("_nd").cast("double"), 6).alias(
                "df_share"
            ),
        )
    )


def q324_weighted_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (multiset) Jaccard similarity join [EXT]: J_w(A,B) =
    Σ_g min(cA,cB) / Σ_g max(cA,cB) over 3-gram OCCURRENCE-count vectors —
    the repetition-aware near-dup measure that set Jaccard (q21) is blind
    to (a doc that repeats one paragraph 10× looks distinct as a set but
    not as a multiset). Blocked by lang, threshold 0.3. n-grams (not
    unigrams) keep the measure selective AND the postings shallow — the
    unigram variant was measured at 21k pairs ≥0.3 on this corpus with
    stopword-depth postings, a quadratic blow-up at scale.

    Scale shape: Σmax needs no pair materialization — Σmax = totA + totB
    − Σmin, so only the shared-gram join (inverted index, same posture
    as ngram_jaccard_pairs) ever runs; per-doc totals ride along as
    grouping keys."""
    from hubverse_transform_spark.operators.textstats import _ngram_occurrences

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.explode_outer(_ngram_occurrences(F.col("text"), 3)).alias("w"),
    ).filter(F.col("w").isNotNull())
    counts = toks.groupBy("doc_id", "lang", "w").agg(
        F.count(F.lit(1)).alias("_c")
    )
    wt = Window.partitionBy("doc_id")
    sides = counts.withColumn("_tot", F.sum("_c").over(wt))
    a = sides.alias("a")
    b = sides.hint("shuffle_hash").alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a._tot").alias("_ta"),
            F.col("b._tot").alias("_tb"),
        )
        .agg(F.sum(F.least("a._c", "b._c")).alias("_smin"))
    )
    wj = F.col("_smin") / (
        F.col("_ta") + F.col("_tb") - F.col("_smin")
    ).cast("double")
    return (
        inter.withColumn("_wj", wj)
        .filter(F.col("_wj") >= 0.3)
        .select("id_a", "id_b", F.round("_wj", 6).alias("weighted_jaccard"))
    )


def q325_hodges_lehmann_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann shift estimator per event type [EXT]: the median of
    all pairwise differences (arm1 − arm0) — the robust location-shift
    companion to q319's rank-biserial, computed WITHOUT materializing
    n²/4 pairs: both arms collapse to integer-floor value grids, the
    difference histogram is the grid×grid join (≤ |grid|² weighted rows),
    and the weighted median walks the cumulative weights.

    Scale shape: grids are value-granularity (floor() keeps ~560 rows per
    type); the convolution join and the cumulative walk both partition by
    event_type."""
    ev = _t(spark, sf_dir, "events")
    grid = ev.groupBy(
        "event_type",
        (F.col("user_id") % 2).alias("_arm"),
        F.floor("value").alias("_v"),
    ).agg(F.count(F.lit(1)).alias("_n"))
    ga = grid.filter(F.col("_arm") == 0).select(
        "event_type", F.col("_v").alias("_va"), F.col("_n").alias("_na")
    )
    gb = grid.filter(F.col("_arm") == 1).select(
        "event_type", F.col("_v").alias("_vb"), F.col("_n").alias("_nb")
    )
    diffs = (
        ga.join(gb.hint("shuffle_hash"), "event_type")
        .groupBy("event_type", (F.col("_vb") - F.col("_va")).alias("_d"))
        .agg(F.sum(F.col("_na") * F.col("_nb")).alias("_w"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("_d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("event_type")
    walked = diffs.select(
        "event_type",
        "_d",
        F.sum("_w").over(wcum).alias("_cum"),
        F.sum("_w").over(wtot).alias("_tot"),
    )
    # weighted lower median: smallest d whose cumulative weight reaches
    # half the total (percentile_disc convention, integer weights exact)
    return (
        walked.filter(2 * F.col("_cum") >= F.col("_tot"))
        .groupBy("event_type")
        .agg(
            F.min("_d").alias("hl_shift"),
            F.max("_tot").alias("n_pairs"),
        )
    )


def q326_meta_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-effects meta-analysis across experiment slices [EXT]: treat
    each event type as a study (arm mean difference + its variance),
    pool by inverse-variance weighting, and report Cochran's Q and I² —
    the heterogeneity read that says whether 'the' treatment effect is
    one number or five (the cross-slice sequel to q230/q278/q306).

    Scale shape: one (type, arm) moment aggregation; everything after is
    5-row arithmetic."""
    ev = _t(spark, sf_dir, "events")
    m = ev.groupBy("event_type", (F.col("user_id") % 2).alias("_arm")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("value").alias("_mean"),
        F.var_samp("value").alias("_var"),
    )
    a = m.filter(F.col("_arm") == 1).select(
        "event_type",
        F.col("_mean").alias("_m1"),
        (F.col("_var") / F.col("_n")).alias("_se1"),
    )
    b = m.filter(F.col("_arm") == 0).select(
        "event_type",
        F.col("_mean").alias("_m0"),
        (F.col("_var") / F.col("_n")).alias("_se0"),
    )
    studies = a.join(b, "event_type").select(
        "event_type",
        (F.col("_m1") - F.col("_m0")).alias("_eff"),
        (F.lit(1.0) / (F.col("_se1") + F.col("_se0"))).alias("_w"),
    )
    pooled = studies.agg(
        (F.sum(F.col("_w") * F.col("_eff")) / F.sum("_w")).alias("_pool"),
        F.sum("_w").alias("_sw"),
        F.count(F.lit(1)).alias("n_studies"),
    )
    return (
        studies.crossJoin(F.broadcast(pooled))
        .agg(
            F.max("n_studies").alias("n_studies"),
            F.round(F.max("_pool"), 6).alias("pooled_effect"),
            F.round(F.sqrt(F.lit(1.0) / F.max("_sw")), 6).alias("pooled_se"),
            F.round(
                F.sum(
                    F.col("_w")
                    * (F.col("_eff") - F.col("_pool"))
                    * (F.col("_eff") - F.col("_pool"))
                ),
                6,
            ).alias("q_stat"),
        )
        .select(
            "n_studies",
            "pooled_effect",
            "pooled_se",
            "q_stat",
            F.round(
                F.greatest(
                    F.lit(0.0),
                    (F.col("q_stat") - (F.col("n_studies") - 1))
                    / F.col("q_stat"),
                ),
                6,
            ).alias("i_squared"),
        )
    )


def q327_mutual_knn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN audit [EXT]: of each vector's exact top-10 cosine
    neighbors, how many reciprocate (both directions in each other's
    top-10)? Mutual-kNN edges are the standard graph for semantic dedup /
    clustering (one-way edges are hub artifacts — see q311); the per-label
    mutuality rate says how symmetric the neighborhood structure is
    before building on it.

    Scale shape: capped probe set (vec_id < 1000), hoisted-norm broadcast
    scoring, per-query rank windows; the reciprocity check is a self-join
    of the k·n top-k table on the reversed pair."""
    e = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 1000)
        .select(
            "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
        )
        # one-file scans serialize the all-pairs loop onto one task
        .repartition(spark.sparkContext.defaultParallelism)
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x
    )
    nrm2 = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0.0), lambda s, x: s + x * x
    )
    # r13 (guide §1.2 "per-task work"): squared norms hoisted to each side
    # of the cross join — |Q|+|C| fold evaluations instead of 2·|Q|·|C|
    # (the docstring said "hoisted-norm"; the code wasn't). Bit-identical:
    # the same per-vector fold value feeds the same product inside the
    # same sqrt/divide/round chain, so sims (and the rank order built on
    # them) are unchanged.
    q = e.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        nrm2(F.col("v")).alias("_qn2"),
    )
    scored = (
        e.withColumn("_n2", nrm2(F.col("v")))
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot / F.sqrt(F.col("_qn2") * F.col("_n2")), 9).alias("sim"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    topk = (
        scored.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= 10)
        .select("query_id", "neighbor_id")
    )
    rev = topk.select(
        F.col("neighbor_id").alias("query_id"),
        F.col("query_id").alias("neighbor_id"),
        F.lit(1).alias("_mutual"),
    )
    marked = topk.join(rev.hint("shuffle_hash"), ["query_id", "neighbor_id"], "left")
    per_node = marked.groupBy("query_id").agg(
        F.sum(F.coalesce(F.col("_mutual"), F.lit(0))).alias("_nmut")
    )
    return (
        per_node.join(
            F.broadcast(e.select(F.col("vec_id").alias("query_id"), "label")),
            "query_id",
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            # the mutual rate is an exact integer ratio: sum(mutual)/(10*n)
            _half_up(F.sum("_nmut"), F.count(F.lit(1)) * 10, 6).alias("avg_mutual_rate"),
            (F.min("_nmut") / 10.0).alias("min_mutual_rate"),
        )
    )


def q328_countmin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch audit [EXT]: build a d=4 × w=256 CMS over the
    token stream (md5-derived row hashes, engine-reproducible), read back
    the exact top-15 tokens through it, and report each token's
    overcount — CMS never undercounts, and the measured inflation tells
    you whether 4×256 counters suffice at this skew (the sketch sibling
    of q227's Misra-Gries and q38's HLL).

    Scale shape: ONE tokenization pass — the corpus collapses to the
    (token, count) vocabulary first, and every CMS counter is the SUM of
    per-token counts in its bucket (identical integers to hashing the raw
    stream), so the 4 sketch rows aggregate the vocab table, not 4 more
    corpus scans; the probe joins 15×4 bucket lookups against the
    broadcast counter table."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    wc = toks.groupBy("w").agg(F.count(F.lit(1)).alias("_n"))
    counters = (
        wc.select(
            "w",
            "_n",
            F.explode(F.array(*[F.lit(j) for j in range(4)])).alias("_j"),
        )
        .withColumn(
            "_b",
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("_j").cast("string"), F.lit("|"),
                                   F.col("w"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 256,
        )
        .groupBy("_j", "_b")
        .agg(F.sum("_n").alias("_c"))
    )
    exact = (
        wc.select("w", F.col("_n").alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), "w")
        .limit(15)
    )
    probes = exact.select(
        "w",
        "exact_count",
        F.explode(F.array(*[F.lit(j) for j in range(4)])).alias("_j"),
    ).withColumn(
        "_b",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("_j").cast("string"), F.lit("|"),
                               F.col("w"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 256,
    )
    return (
        probes.join(F.broadcast(counters), ["_j", "_b"])
        .groupBy("w", "exact_count")
        .agg(F.min("_c").alias("cms_estimate"))
        .select(
            F.col("w").alias("token"),
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count")).alias("overcount"),
        )
    )


def q329_overdispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count overdispersion audit [EXT]: per event type, the dispersion
    index var/mean of DAILY event counts — 1 under a Poisson arrival
    model; >1 flags bursty/clustered traffic where Poisson-based alerting
    (and q282's power math) understates variance. Complements q258's
    per-user burstiness with the fleet-level view.

    Scale shape: one (type, day) count aggregation, then a 5-row moment
    rollup."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("_day")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    # exact integer moments: the variance, the dispersion ratio AND the
    # overdispersed BOOLEAN (a strict > 1.5 threshold that an
    # engine-dependent var_samp merge could flip near the boundary) all
    # become deterministic doubles — identical IEEE sequence both engines
    moments = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("_n").alias("_s1"),
        F.sum(F.col("_n") * F.col("_n")).alias("_s2"),
    )
    nd = F.col("n_days").cast("double")
    var = (nd * F.col("_s2") - F.col("_s1").cast("double") * F.col("_s1")) / (
        nd * (F.col("n_days") - 1)
    )
    disp = var * nd / F.col("_s1")
    return moments.select(
        "event_type",
        "n_days",
        _half_up(F.col("_s1"), F.col("n_days"), 6).alias("mean_daily"),
        half_up(var, 6).alias("var_daily"),
        half_up(disp, 6).alias("dispersion_index"),
        (disp > 1.5).alias("overdispersed"),
    )


def q330_dedup_threshold_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold sweep [EXT]: precision/recall/F1 of the MinHash
    ESTIMATE (signature agreement fraction) as the dedup decision rule,
    against exact Jaccard ≥ 0.7 as truth, for estimate thresholds
    {0.5, 0.625, 0.75, 0.875} over the LSH candidate set — the curve a
    pipeline owner reads to pick the knob q188 calibrates and q203/q299
    plan around.

    Scale shape: candidates come from banding (never all-pairs); the
    sweep explodes the scored pair set ×4 thresholds."""
    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        d, "doc_id", "text", ngram=3, num_hashes=8, bands=4, threshold=0.0
    )
    sigs = d.select(
        F.col("doc_id").alias("_id"),
        minhash_signature(shingle_ngrams(F.col("text"), 3), num_hashes=8).alias(
            "_sig"
        ),
    )
    sa = sigs.select(F.col("_id").alias("id_a"), F.col("_sig").alias("_siga"))
    sb = sigs.select(F.col("_id").alias("id_b"), F.col("_sig").alias("_sigb"))
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("_siga"), F.col("_sigb"), lambda x, y: x == y),
                lambda v: v,
            )
        )
        / F.lit(8.0)
    )
    scored = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            est.alias("_est"), (F.col("jaccard") >= 0.7).alias("_truth")
        )
    )
    swept = scored.select(
        "_est",
        "_truth",
        F.explode(
            F.array(F.lit(0.5), F.lit(0.625), F.lit(0.75), F.lit(0.875))
        ).alias("threshold"),
    )
    agg = swept.groupBy("threshold").agg(
        F.sum(
            F.when(F.col("_est") >= F.col("threshold"), 1).otherwise(0)
        ).alias("n_predicted"),
        F.sum(F.when(F.col("_truth"), 1).otherwise(0)).alias("n_true"),
        F.sum(
            F.when(
                F.col("_truth") & (F.col("_est") >= F.col("threshold")), 1
            ).otherwise(0)
        ).alias("_tp"),
    )
    prec = F.when(
        F.col("n_predicted") > 0, F.col("_tp") / F.col("n_predicted")
    ).otherwise(F.lit(0.0))
    rec = F.when(F.col("n_true") > 0, F.col("_tp") / F.col("n_true")).otherwise(
        F.lit(0.0)
    )
    return agg.select(
        "threshold",
        "n_predicted",
        "n_true",
        half_up(prec, 6).alias("precision"),
        half_up(rec, 6).alias("recall"),
        half_up(
            F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("f1"),
    )


def q331_item_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering [EXT]: part-part cosine
    similarity over order-interaction vectors (binary "ordered together"
    profiles) — sim(i,j) = co(i,j) / √(n_i·n_j), the classic
    neighborhood-CF precompute (Sarwar et al., WWW'01). Top-3 neighbors
    for each of the 20 most-ordered parts. q119's co-purchase lift is the
    statistical read of the same co-occurrence; this is the recommender
    read.

    Scale shape: co-occurrence comes from the order-blocked self-join
    (pairs bounded by per-order line width, never corpus-quadratic);
    per-item norms joined unhinted (|items| grows with data; AQE
    broadcasts while small); final is a per-item top-3 window over the
    candidate slice."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n_i = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("_n"))
    b = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("_pb")
    )
    top_items = (
        n_i.orderBy(F.col("_n").desc(), "l_partkey")
        .limit(20)
        .select(F.col("l_partkey").alias("item_a"), F.col("_n").alias("_na"))
    )
    # r13 (guide §3.2/§2.3): the head restriction is pushed BELOW the
    # co-occurrence self-join — co(i,j) counts shared orders per pair, so
    # restricting the LEFT side to the k=20 head items before the join
    # yields bit-identical counts for every surviving (item_a, item_b)
    # while never materializing the full item×item table. The 20-row head
    # list is a constant-k broadcast (scale-safe); the order join is
    # UNHINTED so AQE broadcasts the head order slice while it is small
    # and falls back to a shuffle join when it is not (q334's deg-join
    # convention) — Catalyst has no rule to push an inner join below an
    # aggregate, so the rewrite must be spelled here.
    co = (
        li.join(
            F.broadcast(top_items.select(F.col("item_a").alias("l_partkey"))),
            "l_partkey",
        )
        .join(
            b,
            (F.col("l_orderkey") == F.col("_ok"))
            & (F.col("l_partkey") != F.col("_pb")),
        )
        .groupBy(F.col("l_partkey").alias("item_a"), F.col("_pb").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("_co"))
    )
    scored = (
        co.join(F.broadcast(top_items), "item_a")
        .join(
            n_i.select(F.col("l_partkey").alias("item_b"),
                       F.col("_n").alias("_nb")),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            F.round(
                F.col("_co") / F.sqrt(F.col("_na") * F.col("_nb")), 9
            ).alias("_sim"),
        )
    )
    wr = Window.partitionBy("item_a").orderBy(F.col("_sim").desc(), "item_b")
    return (
        scored.withColumn("_r", F.row_number().over(wr))
        .filter(F.col("_r") <= 3)
        .select(
            "item_a",
            "item_b",
            F.round("_sim", 6).alias("cosine_sim"),
            F.col("_r").alias("rank"),
        )
    )


def q332_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit [EXT]: the third privacy gate after q297's
    k-anonymity and q308's l-diversity — each QI equivalence class's
    sensitive-attribute distribution must sit within total-variation
    distance t of the GLOBAL distribution (for categorical attributes,
    EMD = TVD = ½·L1). Reports failing classes for t ∈ {0.2, 0.35, 0.5}.

    Scale shape: one QI×sensitive aggregation joined to the broadcast
    5-row global distribution; the t sweep explodes only the per-class
    distance table."""
    c = _t(spark, sf_dir, "customer")
    cells = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).alias("_bb"),
        "c_mktsegment",
    ).agg(F.count(F.lit(1)).alias("_n"))
    glob = c.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("_gn"))
    glob_tot = c.agg(F.count(F.lit(1)).alias("_gt"))
    classes = cells.groupBy("c_nationkey", "_bb").agg(
        F.sum("_n").alias("_ct")
    )
    # cross the class list with the full 5-segment global distribution so
    # segments MISSING from a class contribute their whole global share
    grid = classes.crossJoin(F.broadcast(glob.crossJoin(glob_tot)))
    joined = grid.join(
        cells, ["c_nationkey", "_bb", "c_mktsegment"], "left"
    )
    # the five |class share - global share| terms are exact integer ratios
    # whose sum can sit exactly ON a threshold (1/5 = 0.2 is reachable) —
    # fold them LEFT in segment order on both engines (sort_array +
    # F.aggregate / list(ORDER BY) + list_reduce) so the double is a fixed
    # IEEE sequence, then engine-stable floor half-up instead of round()
    term = F.abs(
        F.coalesce(F.col("_n"), F.lit(0)) / F.col("_ct")
        - F.col("_gn") / F.col("_gt")
    )
    arr = F.sort_array(
        F.collect_list(F.struct(F.col("c_mktsegment"), term.alias("_term")))
    )
    # half-safe: _tvd is half_up of a BIT-IDENTICAL deterministic double
    # (the sorted left-fold above, mirrored in the oracle), so both
    # engines hold the same rounded value; the downstream sums aggregate
    # exact integer indicators/counts conditioned on it, never the float.
    tvd = joined.groupBy("c_nationkey", "_bb").agg(
        F.max("_ct").alias("_ct"),
        half_up(
            F.lit(0.5)
            * F.aggregate(arr, F.lit(0.0), lambda a, x: a + x["_term"]),
            9,
        ).alias("_tvd"),
    )
    ts = F.explode(F.array(F.lit(0.2), F.lit(0.35), F.lit(0.5))).alias("t")
    return (
        tvd.select("_ct", "_tvd", ts)
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.when(F.col("_tvd") > F.col("t"), 1).otherwise(0)).alias(
                "n_above_t"
            ),
            F.sum(
                F.when(F.col("_tvd") > F.col("t"), F.col("_ct")).otherwise(0)
            ).alias("n_rows_at_risk"),
        )
    )


def q333_importance_weight_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-reweighting health check [EXT]: when a corpus is
    reweighted toward a target mix (here: quality-bucket shares toward a
    uniform target, the q219 DSIR posture), the effective sample size
    ESS = (Σw)²/Σw² says how many samples the weighted set is really
    worth — the first diagnostic before trusting any reweighted metric.
    Reports per lang: raw n, ESS, ESS ratio, and the clipped-weight
    (w ≤ 5× median... w capped at 5) variant a production pipeline uses.

    Scale shape: per-(lang, bucket) shares aggregate once; the weight is
    constant per bucket, so the per-document Σw/Σw² moments collapse to
    Σ_b n_b·w_b over the ≤5-row bucket table — the moments fold LEFT over
    the bucket-sorted term list on BOTH engines (Spark sort_array +
    F.aggregate, DuckDB list(... ORDER BY b) + list_reduce), which makes
    each sum a fixed IEEE sequence instead of an order-dependent float
    aggregate: the ESS ratios are then deterministic doubles and the
    floor half-up display cannot diverge (round-9 share-class sweep —
    these rationals CAN sit on a d=6 half boundary)."""
    d = _t(spark, sf_dir, "documents")
    bucketed = d.select(
        "lang", F.least(F.floor(F.col("n_chars") / 200), F.lit(4)).alias("_b")
    )
    shares = bucketed.groupBy("lang", "_b").agg(F.count(F.lit(1)).alias("_n"))
    wl = Window.partitionBy("lang")
    weighted = shares.select(
        "lang",
        "_b",
        "_n",
        # target: uniform over the lang's observed buckets; actual: _n/lang
        # total -> w = target/actual = lang_total / (n_buckets * _n)
        (
            F.sum("_n").over(wl)
            / (F.count(F.lit(1)).over(wl) * F.col("_n")).cast("double")
        ).alias("_w"),
    ).withColumn("_wc", F.least(F.col("_w"), F.lit(5.0)))
    arr = F.sort_array(
        F.collect_list(F.struct(F.col("_b"), F.col("_n"), F.col("_w"), F.col("_wc")))
    )

    def _fold(term):
        return F.aggregate(arr, F.lit(0.0), lambda a, x: a + term(x))

    folded = weighted.groupBy("lang").agg(
        F.sum("_n").alias("n_docs"),
        _fold(lambda x: x["_n"] * x["_w"]).alias("_sw"),
        _fold(lambda x: x["_n"] * (x["_w"] * x["_w"])).alias("_sww"),
        _fold(lambda x: x["_n"] * x["_wc"]).alias("_swc"),
        _fold(lambda x: x["_n"] * (x["_wc"] * x["_wc"])).alias("_swcc"),
    )
    return folded.select(
        "lang",
        "n_docs",
        half_up(F.col("_sw") * F.col("_sw") / F.col("_sww"), 6).alias("ess"),
        half_up(
            F.col("_sw") * F.col("_sw") / (F.col("_sww") * F.col("n_docs")), 6
        ).alias("ess_ratio"),
        half_up(F.col("_swc") * F.col("_swc") / F.col("_swcc"), 6).alias(
            "ess_clipped"
        ),
    )


def q334_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average local clustering coefficient per brand [EXT] over the
    part co-order graph: cc(v) = 2·triangles(v) / (deg(v)·(deg(v)−1)) —
    how clique-like each part's neighborhood is (q137 counts the
    triangles; this normalizes them into the standard small-world
    statistic, Watts & Strogatz 1998).

    Scale shape: edges come from the order-blocked self-join (bounded by
    order width); triangles enumerate via the DEGREE-ORIENTED two-path
    join — orienting every edge from its lower-(degree, id) endpoint
    bounds per-node out-degree by ~√(2m), so hub wedges never explode
    (the standard arboricity argument; id orientation measured 4×
    slower on this graph); each triangle is found exactly once."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    b = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("_pb")
    )
    edges = (
        li.join(
            b.hint("shuffle_hash"),
            (F.col("l_orderkey") == F.col("_ok"))
            & (F.col("l_partkey") < F.col("_pb")),
        )
        .select(F.col("l_partkey").alias("src"), F.col("_pb").alias("dst"))
        .distinct()
    )
    deg = (
        edges.select(F.col("src").alias("v"))
        .unionAll(edges.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    # no broadcast hint on the degree table: it is |V|-sized, so a forced
    # broadcast is exactly the local-mode plan that dies at lake scale
    # (and the explicit hint would forbid AQE from choosing otherwise).
    # Unhinted, AQE broadcasts while deg is small and falls back to a
    # co-partitioned shuffle join once it isn't — edges are already keyed
    # on src/dst, so the shuffle is the one the wedge join needs anyway.
    keyed = (
        edges.join(
            deg.select(F.col("v").alias("src"), F.col("_d").alias("_ds")),
            "src",
        )
        .join(
            deg.select(F.col("v").alias("dst"), F.col("_d").alias("_dd")),
            "dst",
        )
    )
    lower_first = (F.col("_ds") < F.col("_dd")) | (
        (F.col("_ds") == F.col("_dd")) & (F.col("src") < F.col("dst"))
    )
    # NOTE: persisting oriented/deg + compute_release was measured SLOWER
    # here (13.1s vs 9.9s at sf0.1) — the checkpoint boundary costs more
    # than the shared-subtree recomputation it saves on this dense graph.
    # Also measured and rejected (round 8): wedge generation via per-node
    # collect_list adjacency + HOF ordered-pair explode (one shuffle
    # instead of the o1xo2 self-join) — 9.2s vs 4.9s for the triangle
    # stages alone at sf0.1, same 1,884,488 triangles; the array
    # build/explode costs more than the extra shuffle-hash join saves
    oriented = keyed.select(
        F.when(lower_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(lower_first, F.col("dst")).otherwise(F.col("src")).alias("w"),
    )
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    # r13 also measured and rejected (stage-level readout,
    # tools/stage_profile.py): unhinting the wedge/closure joins so AQE
    # could broadcast the edge list (~10 MB compressed at sf0.1) against
    # the 950 MB wedge stream. The closure build side is 6M (a,c) pairs
    # whose IN-MEMORY UnsafeHashedRelation size sits at the adaptive
    # broadcast threshold, so AQE's strategy flipped run-to-run: one run
    # fused map-side at 190 CPU-s, the next sorted 30M wedges for an SMJ
    # at 385 CPU-s — vs a stable 104 CPU-s for this hinted SHJ shape.
    # Strictly worse on median and unstable; the hinted pair stays the
    # measured optimum of four tried shapes.
    wedges = o1.join(
        o2.hint("shuffle_hash"), F.col("o1.w") == F.col("o2.u")
    ).select(
        F.col("o1.u").alias("a"), F.col("o1.w").alias("b"),
        F.col("o2.w").alias("c"),
    )
    tri = wedges.join(
        oriented.select(F.col("u").alias("a"), F.col("w").alias("c")).hint(
            "shuffle_hash"
        ),
        ["a", "c"],
    )
    tri_per_node = (
        tri.select(F.col("a").alias("v"))
        .unionAll(tri.select(F.col("b").alias("v")))
        .unionAll(tri.select(F.col("c").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("_t"))
    )
    cc = (
        deg.join(tri_per_node, "v", "left")
        .filter(F.col("_d") >= 2)
        .select(
            "v",
            (
                2.0
                * F.coalesce(F.col("_t"), F.lit(0))
                / (F.col("_d") * (F.col("_d") - 1))
            ).alias("_cc"),
        )
    )
    parts = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("v"), "p_brand"
    )
    return (
        cc.join(F.broadcast(parts), "v")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            # half-safe: _cc is a mean of per-node rationals 2t/(d(d-1))
            # with heterogeneous denominators; a d=6 half boundary needs
            # the reduced sum denominator = 2*10^6*odd — measure-zero
            F.round(F.avg("_cc"), 6).alias("avg_clustering_coeff"),
            F.round(F.max("_cc"), 6).alias("max_clustering_coeff"),
        )
    )


def q335_knapsack_data_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy budgeted data selection [EXT]: under a per-lang token
    budget (2000 tokens), select documents by descending quality-per-
    token ratio until the budget is spent — the greedy knapsack that is
    the standard first cut for 'best corpus under a budget' (q129 mixes
    by fixed shares; this OPTIMIZES within the share). Reports what the
    greedy kept vs dropped per lang.

    Scale shape: ratio rank and running token sum are lang-partitioned
    windows; the rollup is conditional aggregation."""
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "lang",
        "doc_id",
        quality_score(F.col("text")).alias("_q"),
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("_tok"),
    ).select(
        "lang",
        "doc_id",
        "_q",
        "_tok",
        (F.col("_q") / F.col("_tok")).alias("_ratio"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("_ratio").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    budget = 2000
    selected = scored.withColumn("_cum", F.sum("_tok").over(w)).withColumn(
        "_keep", F.col("_cum") <= budget
    )
    return selected.groupBy("lang").agg(
        F.sum(F.when(F.col("_keep"), 1).otherwise(0)).alias("n_selected"),
        F.sum(F.when(F.col("_keep"), F.col("_tok")).otherwise(0)).alias(
            "tokens_used"
        ),
        # _q is a per-row round(x,4) quality score — exact 1e-4 grid
        _half_up(
            F.sum(F.when(F.col("_keep"), _fixed("_q", 10000))),
            F.count(F.when(F.col("_keep"), 1)) * 10000,
            6,
        ).alias("avg_quality_selected"),
        _half_up(
            F.sum(F.when(~F.col("_keep"), _fixed("_q", 10000))),
            F.count(F.when(~F.col("_keep"), 1)) * 10000,
            6,
        ).alias("avg_quality_dropped"),
    )


def q336_source_distribution_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level source similarity [EXT]: histogram intersection
    Σ_t min(p_a(t), p_b(t)) between source token DISTRIBUTIONS — which
    sources are near-copies of each other at the distribution level
    (doc-level dedup can miss a source that paraphrases another but
    shares its vocabulary mix). Top-10 most similar source pairs.

    Scale shape: per-(source, token) shares aggregate once; the pair join
    is token-keyed (inverted index over the bounded vocab), Σmin needs no
    missing-token terms (min with an absent token is 0); TakeOrdered
    top-10."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    ws = Window.partitionBy("source")
    shares = (
        toks.groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "source", "w", (F.col("_n") / F.sum("_n").over(ws)).alias("_p")
        )
    )
    a = shares.alias("a")
    b = shares.hint("shuffle_hash").alias("b")
    return (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.round(F.sum(F.least("a._p", "b._p")), 6).alias(
                "hist_intersection"
            )
        )
        .orderBy(F.col("hist_intersection").desc(), "source_a", "source_b")
        .limit(10)
    )


def q337_temporal_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal motif counting [EXT]: consecutive event-type TRIPLES per
    user completing within 30 minutes — the 3-event sequential patterns
    (Paranjape et al., WSDM'17 restricted to consecutive events) that
    q226's pair matrix can't see (a→b→c ≠ a→b plus b→c when timing
    matters). Top-10 motifs.

    Scale shape: two lead windows over the same user partition (one sort,
    both windows share it); motif rollup is a 3-key agg; TakeOrdered."""
    from hubverse_transform_spark.operators.sessions import _epoch_seconds

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    triples = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
        _epoch_seconds(F.col("ts")).alias("_t1"),
        F.lead(_epoch_seconds(F.col("ts")), 2).over(w).alias("_t3"),
    ).filter(
        F.col("e3").isNotNull() & (F.col("_t3") - F.col("_t1") <= 1800)
    )
    return (
        triples.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "e1", "e2", "e3")
        .limit(10)
    )


def q338_ols_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression residual diagnostics [EXT]: after q222's per-brand OLS
    of retail price on size, flag the parts whose residual exceeds 2
    residual-σ — the 'mispriced vs the brand's own price curve' read a
    catalog-quality pass produces. Per brand: outlier count and the worst
    standardized residual.

    Scale shape: one moment aggregation fits each brand's line; the
    5-number model broadcasts back for the residual pass; σ and the
    outlier rollup are a second keyed agg."""
    p = _t(spark, sf_dir, "part")
    # a brand with no size variance (one part, or all parts the same size
    # — reachable on sparse data, where the unguarded slope division threw
    # ANSI DIVIDE_BY_ZERO) cannot be regressed: aggregate the moments
    # first, drop degenerate brands, and only then form the slope, so the
    # division never sees a zero denominator
    # ... and a 2-part brand's line is SATURATED (df = n - 2 = 0): its
    # residuals are pure float residue whose magnitude/sign differ per
    # engine (ultra-sparse seed 787: sigma 1e-13 vs exact 0), so the
    # residual audit additionally requires n >= 3
    fit = (
        p.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("_nb"),
            F.covar_pop("p_size", "p_retailprice").alias("_cxy"),
            F.var_pop("p_size").alias("_vx"),
            F.avg("p_retailprice").alias("_my"),
            F.avg("p_size").alias("_mx"),
        )
        .filter((F.col("_vx") > 0) & (F.col("_nb") > 2))
        .select(
            "p_brand",
            (F.col("_cxy") / F.col("_vx")).alias("_slope"),
            "_my",
            "_mx",
        )
    )
    resid = p.join(F.broadcast(fit), "p_brand").select(
        "p_brand",
        (
            F.col("p_retailprice")
            - (
                F.col("_my")
                + F.col("_slope") * (F.col("p_size") - F.col("_mx"))
            )
        ).alias("_r"),
    )
    sigma = resid.groupBy("p_brand").agg(
        F.stddev_samp("_r").alias("_sig")
    )
    return (
        resid.join(F.broadcast(sigma), "p_brand")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.max("_sig"), 6).alias("resid_sigma"),
            F.sum(
                F.when(F.abs(F.col("_r")) > 2 * F.col("_sig"), 1).otherwise(0)
            ).alias("n_outliers"),
            # sigma is exactly 0 when every residual in the brand is equal
            # (2-part brands on sparse data): the standardized residual is
            # undefined there — NULL, guarded so ANSI never divides by 0
            F.round(
                F.max(
                    F.when(
                        F.col("_sig") > 0, F.abs(F.col("_r")) / F.col("_sig")
                    )
                ),
                6,
            ).alias("max_std_resid"),
        )
    )


def q339_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence predictability audit [EXT]: the conditional entropy
    H(next | current) per current event type — how much signal q321's
    Markov argmax is even working with (H = 0: deterministic follow-up;
    H = ln(5): next event is noise). Reports entropy, the argmax share,
    and the normalized predictability 1 − H/ln(5).

    Scale shape: one lead-window pass, one (cur, next) aggregation, then
    entropy from the cascaded per-cur rollup (ln(tot) − Σ n·ln(n)/tot —
    no window needed)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
    )
    counts = trans.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("_n"))
    return counts.groupBy("cur").agg(
        F.sum("_n").alias("n_transitions"),
        F.round(
            F.log(F.sum("_n"))
            - F.sum(F.col("_n") * F.log("_n")) / F.sum("_n"),
            6,
        ).alias("entropy"),
        half_up(F.max("_n") / F.sum("_n").cast("double"), 6).alias(
            "top_share"
        ),
        F.round(
            1
            - (
                F.log(F.sum("_n"))
                - F.sum(F.col("_n") * F.log("_n")) / F.sum("_n")
            )
            / F.log(F.lit(5.0)),
            6,
        ).alias("predictability"),
    )


def q340_bh_fdr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR audit [EXT]: Welch z per event type (the
    5 parallel A/B readouts of q230), two-sided p-values via the
    Abramowitz-Stegun 26.2.17 polynomial normal tail (literal
    coefficients — both engines evaluate identical arithmetic, no erf
    needed), then the BH step-up rule at α=0.1 — the multiple-testing
    correction any metrics platform applies before declaring 5 slices
    'significant'.

    Scale shape: one (type, arm) moment agg; ranks over the 5-row p
    table come from a count-self-join (no global window); the step-up
    cutoff is a 1-row broadcast."""
    ev = _t(spark, sf_dir, "events")
    m = ev.groupBy("event_type", (F.col("user_id") % 2).alias("_arm")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("value").alias("_mean"),
        F.var_samp("value").alias("_var"),
    )
    a = m.filter(F.col("_arm") == 1).select(
        "event_type", F.col("_mean").alias("_m1"),
        (F.col("_var") / F.col("_n")).alias("_s1"),
    )
    b = m.filter(F.col("_arm") == 0).select(
        "event_type", F.col("_mean").alias("_m0"),
        (F.col("_var") / F.col("_n")).alias("_s0"),
    )
    z = (F.col("_m1") - F.col("_m0")) / F.sqrt(F.col("_s1") + F.col("_s0"))
    # A&S 26.2.17: 1-Phi(x) = phi(x)(b1 t + ... + b5 t^5), t = 1/(1+px)
    x = F.abs(F.col("_z"))
    t = 1 / (1 + 0.2316419 * x)
    phi = F.exp(-x * x / 2) / F.lit(2.5066282746310002)
    tail = phi * (
        0.319381530 * t
        - 0.356563782 * t * t
        + 1.781477937 * t * t * t
        - 1.821255978 * t * t * t * t
        + 1.330274429 * t * t * t * t * t
    )
    pvals = (
        a.join(b, "event_type")
        .select("event_type", z.alias("_z"))
        .select("event_type", "_z", (2 * tail).alias("_p"))
    )
    ranked = pvals.alias("x").join(
        pvals.select(F.col("_p").alias("_p2")).alias("y"),
        F.col("y._p2") <= F.col("x._p"),
    ).groupBy("event_type", "_z", "_p").agg(
        F.count(F.lit(1)).alias("p_rank")
    )
    kmax = ranked.agg(
        F.max(
            F.when(
                F.col("_p") <= F.col("p_rank") * 0.1 / 5, F.col("p_rank")
            )
        ).alias("_kmax")
    )
    return (
        ranked.crossJoin(F.broadcast(kmax))
        .select(
            "event_type",
            F.round("_z", 6).alias("z_stat"),
            F.round("_p", 6).alias("p_value"),
            "p_rank",
            F.round(F.col("p_rank") * 0.1 / 5, 6).alias("bh_cutoff"),
            F.coalesce(
                F.col("p_rank") <= F.col("_kmax"), F.lit(False)
            ).alias("significant"),
        )
    )


#: deterministic consistent-hash ring: 2 vnodes per shard, md5-positioned.
#: shared literal between the Spark plan and the SQL oracle.
def _hash_ring(n_shards: int, vnodes: int = 2) -> list[tuple[int, int]]:
    import hashlib as _hl

    pts = []
    for s in range(n_shards):
        for vn in range(vnodes):
            pos = int(_hl.md5(f"s{s}|v{vn}".encode()).hexdigest()[:8], 16)
            pts.append((pos, s))
    return sorted(pts)


def q341_shard_rebalance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard rebalance audit [EXT]: when a keyspace grows from 8 to 10
    shards, what fraction of keys MOVE under (a) mod-hash placement
    (expected ~9/10 — the classic resharding disaster) vs (b) a
    consistent-hash ring with 2 vnodes/shard (only segments claimed by
    the new shards move) — the Karger et al. argument, measured on the
    actual user keyspace.

    Scale shape: one pass computes old/new owners per key from literal
    ring points (HOF over ≤20 broadcast constants); the rollup is a
    2-row aggregation."""
    ev = _t(spark, sf_dir, "events").select("user_id").distinct()
    khash = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("long")

    def ring_owner(ring: list[tuple[int, int]]):
        arr = F.array(
            *[
                F.struct(F.lit(pos).alias("pos"), F.lit(s).alias("shard"))
                for pos, s in ring
            ]
        )
        nxt = F.array_sort(
            F.filter(arr, lambda r: r.getField("pos") >= F.col("_kh"))
        )
        return F.coalesce(
            F.get(nxt, 0).getField("shard"),
            F.lit(ring[0][1]),
        )

    keyed = ev.select(khash.alias("_kh"), F.col("user_id").alias("_k"))
    modded = keyed.select(
        F.lit("mod").alias("strategy"),
        ((F.col("_kh") % 8) != (F.col("_kh") % 10)).alias("_moved"),
    )
    ringed = keyed.select(
        F.lit("ring").alias("strategy"),
        (
            ring_owner(_hash_ring(8)) != ring_owner(_hash_ring(10))
        ).alias("_moved"),
    )
    return (
        modded.unionByName(ringed)
        .groupBy("strategy")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.when(F.col("_moved"), 1).otherwise(0)).alias("n_moved"),
            _half_up(
                F.sum(F.col("_moved").cast("long")), F.count(F.lit(1)), 6
            ).alias("moved_frac"),
        )
    )


def q342_ttl_cache_hit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL cache planning from access logs [EXT]: if responses were
    cached per (user, event type) with TTL T, what hit rate would the
    event history have seen? hit = previous same-key access within T;
    swept for T ∈ {60s, 300s, 1800s} — the capacity-vs-freshness curve
    an infra team reads before sizing a cache tier.

    Scale shape: one lag window per (user, type); the TTL sweep explodes
    each event ×3 after the gap is computed."""
    from hubverse_transform_spark.operators.sessions import _epoch_seconds

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        (
            _epoch_seconds(F.col("ts"))
            - F.lag(_epoch_seconds(F.col("ts"))).over(w)
        ).alias("_gap")
    )
    swept = gaps.select(
        "_gap",
        F.explode(
            F.array(F.lit(60), F.lit(300), F.lit(1800))
        ).alias("ttl_seconds"),
    )
    return swept.groupBy("ttl_seconds").agg(
        F.count(F.lit(1)).alias("n_accesses"),
        F.sum(
            F.when(
                F.col("_gap").isNotNull() & (F.col("_gap") <= F.col("ttl_seconds")),
                1,
            ).otherwise(0)
        ).alias("n_hits"),
        _half_up(
            F.sum(
                F.when(
                    F.col("_gap").isNotNull()
                    & (F.col("_gap") <= F.col("ttl_seconds")),
                    1,
                ).otherwise(0)
            ),
            F.count(F.lit(1)),
            6,
        ).alias("hit_rate"),
    )


def q343_competing_risks_cif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Competing-risks cumulative incidence [EXT]: from each user's first
    event, the time to FIRST purchase (risk 1) vs first error (risk 2),
    censored at the last observed event — the Aalen-Johansen estimator
    CIF_k(t) = Σ_{s≤t} S(s⁻)·d_k(s)/n(s) on a daily grid, per arm. Naive
    1−KM per risk OVERSTATES incidence when risks compete; this is the
    correct decomposition (complements q237's single-risk KM).

    Scale shape: per-user collapse is one keyed agg; the estimator runs
    on the bounded (arm × distinct-day) grid with arm-partitioned
    windows; ln-sum-exp realizes the running product (q237's trick)."""
    ev = _t(spark, sf_dir, "events")
    per_ev = ev.select(
        "user_id",
        (F.col("user_id") % 2).alias("arm"),
        F.to_date("ts").alias("_d"),
        "event_type",
    )
    firsts = per_ev.groupBy("user_id", "arm").agg(
        F.min("_d").alias("_start"),
        F.max("_d").alias("_last"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("_d"))).alias(
            "_p"
        ),
        F.min(F.when(F.col("event_type") == "error", F.col("_d"))).alias(
            "_e"
        ),
    )
    # exit day + cause: earliest of first-purchase/first-error, else
    # censored at the last observed day (cause 0)
    exits = firsts.select(
        "arm",
        F.when(
            F.col("_p").isNotNull()
            & (F.col("_e").isNull() | (F.col("_p") <= F.col("_e"))),
            F.struct(
                F.datediff("_p", "_start").alias("t"), F.lit(1).alias("k")
            ),
        )
        .when(
            F.col("_e").isNotNull(),
            F.struct(
                F.datediff("_e", "_start").alias("t"), F.lit(2).alias("k")
            ),
        )
        .otherwise(
            F.struct(
                F.datediff("_last", "_start").alias("t"), F.lit(0).alias("k")
            )
        )
        .alias("_x"),
    ).select("arm", F.col("_x.t").alias("t"), F.col("_x.k").alias("k"))
    grid = exits.groupBy("arm", "t").agg(
        F.sum(F.when(F.col("k") == 1, 1).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("k") == 2, 1).otherwise(0)).alias("d2"),
        F.count(F.lit(1)).alias("_all"),
    )
    warm = Window.partitionBy("arm")
    wcum = Window.partitionBy("arm").orderBy("t")
    wprev = wcum.rowsBetween(Window.unboundedPreceding, -1)
    stepped = grid.select(
        "arm",
        "t",
        "d1",
        "d2",
        (
            F.sum("_all").over(warm)
            - F.coalesce(F.sum("_all").over(wprev), F.lit(0))
        ).alias("n_risk"),
    )
    hazarded = stepped.select(
        "arm",
        "t",
        "d1",
        "d2",
        "n_risk",
        F.exp(
            F.coalesce(
                F.sum(
                    F.log(
                        F.greatest(
                            F.lit(1.0)
                            - (F.col("d1") + F.col("d2")) / F.col("n_risk"),
                            F.lit(1e-300),
                        )
                    )
                ).over(wprev),
                F.lit(0.0),
            )
        ).alias("_s_prev"),
    )
    return (
        hazarded.select(
            "arm",
            "t",
            "n_risk",
            F.round(
                F.sum(
                    F.col("_s_prev") * F.col("d1") / F.col("n_risk")
                ).over(wcum.rowsBetween(Window.unboundedPreceding, 0)),
                6,
            ).alias("cif_purchase"),
            F.round(
                F.sum(
                    F.col("_s_prev") * F.col("d2") / F.col("n_risk")
                ).over(wcum.rowsBetween(Window.unboundedPreceding, 0)),
                6,
            ).alias("cif_error"),
            (F.col("d1") + F.col("d2") > 0).alias("_ev"),
        )
        .filter(F.col("_ev"))
        .drop("_ev")
    )


def q344_retention_decay_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention decay-law fit [EXT]: weekly cohort retention (q100 at
    week grain), averaged per week offset, then the power-law fit
    ln r(k) = a + b·ln k over offsets k ≥ 1 — the 'is churn power-law or
    exponential' read a growth team uses to extrapolate LTV beyond the
    observed horizon.

    Scale shape: cohort matrix is q100's shape (agg + unhinted
    AQE-gated cohort join);
    the fit is closed-form OLS moments over the ≤5-row offset table."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("_wk")
    )
    cohort = e.groupBy("user_id").agg(F.min("_wk").alias("_c0"))
    joined = e.join(cohort, "user_id").select(
        "user_id",
        "_c0",
        (F.datediff("_wk", "_c0") / 7).cast("int").alias("_k"),
    )
    sizes = cohort.groupBy("_c0").agg(F.countDistinct("user_id").alias("_n0"))
    matrix = (
        joined.groupBy("_c0", "_k")
        .agg(F.countDistinct("user_id").alias("_nk"))
        .join(F.broadcast(sizes), "_c0")
        .filter(F.col("_k") >= 1)
        .groupBy("_k")
        .agg(F.avg(F.col("_nk") / F.col("_n0")).alias("_r"))
    )
    pts = matrix.select(
        F.log(F.col("_k").cast("double")).alias("_x"),
        F.log("_r").alias("_y"),
    )
    # Pearson/slope from explicit moments, NOT corr()/covar_pop(): a
    # degenerate offset table (one distinct k — seed-5 differential)
    # zeroes Var(x), and ANSI-mode corr THROWS DIVIDE_BY_ZERO where
    # DuckDB quietly NULLs; the guarded moment form returns NULL fits on
    # both engines and identical doubles everywhere else (same formula,
    # same exact inputs).
    fit = pts.agg(
        F.count(F.lit(1)).alias("n_offsets"),
        F.avg("_x").alias("_mx"),
        F.avg("_y").alias("_my"),
        F.avg(F.col("_x") * F.col("_x")).alias("_mxx"),
        F.avg(F.col("_x") * F.col("_y")).alias("_mxy"),
        F.avg(F.col("_y") * F.col("_y")).alias("_myy"),
    )
    varx = F.col("_mxx") - F.col("_mx") * F.col("_mx")
    vary = F.col("_myy") - F.col("_my") * F.col("_my")
    covxy = F.col("_mxy") - F.col("_mx") * F.col("_my")
    b = F.when(varx > 0, covxy / varx)
    rho2 = F.when((varx > 0) & (vary > 0), covxy * covxy / (varx * vary))
    return fit.select(
        "n_offsets",
        F.round(b, 6).alias("decay_exponent"),
        F.round(F.exp(F.col("_my") - b * F.col("_mx")), 6).alias(
            "week1_retention"
        ),
        F.round(rho2, 6).alias("r_squared"),
    )


def q345_moore_lewis_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moore-Lewis data selection [EXT]: score every out-of-domain
    document by the cross-entropy DIFFERENCE between an in-domain unigram
    LM (lang='en' docs) and the general-corpus LM — the canonical
    'select general data that looks like my domain' filter (Moore &
    Lewis, ACL 2010; q114 is the single-model fluency version). Top-10
    most domain-like non-English documents.

    Scale shape: both LMs are vocab-bounded broadcast tables over the
    shared union vocabulary (add-1 smoothing keeps OOV finite); scoring
    is one token-stream join; TakeOrdered top-10."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    vocab = toks.select("w").distinct()
    vsize = vocab.agg(F.count(F.lit(1)).alias("_v"))
    dom = toks.filter(F.col("lang") == "en").groupBy("w").agg(
        F.count(F.lit(1)).alias("_cd")
    )
    dom_tot = dom.agg(F.sum("_cd").alias("_nd"))
    gen = toks.groupBy("w").agg(F.count(F.lit(1)).alias("_cg"))
    gen_tot = gen.agg(F.sum("_cg").alias("_ng"))
    model = (
        vocab.join(F.broadcast(dom), "w", "left")
        .join(F.broadcast(gen), "w", "left")
        .crossJoin(F.broadcast(vsize))
        .crossJoin(F.broadcast(dom_tot))
        .crossJoin(F.broadcast(gen_tot))
        .select(
            "w",
            (
                -F.log(
                    (F.coalesce(F.col("_cd"), F.lit(0)) + 1.0)
                    / (F.col("_nd") + F.col("_v"))
                )
            ).alias("_nll_d"),
            (
                -F.log(
                    (F.coalesce(F.col("_cg"), F.lit(0)) + 1.0)
                    / (F.col("_ng") + F.col("_v"))
                )
            ).alias("_nll_g"),
        )
    )
    scored = (
        toks.filter(F.col("lang") != "en")
        .join(F.broadcast(model), "w")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # half-safe: cross-entropy difference of log-probability means
            # (irrational) — a d=6 half-boundary hit has measure zero
            F.round(
                F.avg("_nll_d") - F.avg("_nll_g"), 6
            ).alias("ce_difference"),
        )
    )
    return scored.orderBy("ce_difference", "doc_id").limit(10)


def q346_error_retry_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-recovery funnel [EXT]: after each 'error' event, what does
    the user do within 10 minutes — retry into success (a non-error
    event), hit another error, or go silent ('none')? The ops metric
    behind 'are errors churning users'. Per outcome: count and share.

    Scale shape: one lead window per user; the rollup is a 1-key agg over
    error rows only."""
    from hubverse_transform_spark.operators.sessions import _epoch_seconds

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nexts = ev.select(
        "event_type",
        _epoch_seconds(F.col("ts")).alias("_t"),
        F.lead("event_type").over(w).alias("_nt"),
        F.lead(_epoch_seconds(F.col("ts"))).over(w).alias("_nts"),
    ).filter(F.col("event_type") == "error")
    outcome = F.when(
        F.col("_nt").isNull() | (F.col("_nts") - F.col("_t") > 600),
        F.lit("none"),
    ).otherwise(F.col("_nt"))
    grouped = nexts.groupBy(outcome.alias("next_within_10m")).agg(
        F.count(F.lit(1)).alias("n_errors")
    )
    tot = grouped.agg(F.sum("n_errors").alias("_tot"))
    return grouped.crossJoin(F.broadcast(tot)).select(
        "next_within_10m",
        "n_errors",
        half_up(F.col("n_errors") / F.col("_tot"), 6).alias("share"),
    )


def q347_window_funnel_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order window funnel [EXT]: the ClickHouse-windowFunnel
    semantics — per user, the deepest prefix of signup → click → purchase
    completed with each step within 1 hour of the PREVIOUS step (q80/q201
    funnels count step membership; this enforces order and per-step
    timeout). Histogram of funnel levels 0–3.

    Scale shape: three cascaded min-aggregations (each step's earliest
    qualifying timestamp), keyed on user; the histogram is a 1-key agg."""
    from hubverse_transform_spark.operators.sessions import _epoch_seconds

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", _epoch_seconds(F.col("ts")).alias("_t")
    )
    users = ev.select("user_id").distinct()
    t1 = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("_t").alias("_t1")
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1.hint("shuffle_hash"), "user_id")
        .filter((F.col("_t") > F.col("_t1")) & (F.col("_t") - F.col("_t1") <= 3600))
        .groupBy("user_id")
        .agg(F.min("_t").alias("_t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2.hint("shuffle_hash"), "user_id")
        .filter((F.col("_t") > F.col("_t2")) & (F.col("_t") - F.col("_t2") <= 3600))
        .groupBy("user_id")
        .agg(F.min("_t").alias("_t3"))
    )
    level = (
        F.when(F.col("_t3").isNotNull(), 3)
        .when(F.col("_t2").isNotNull(), 2)
        .when(F.col("_t1").isNotNull(), 1)
        .otherwise(0)
    )
    grouped = (
        users.join(t1, "user_id", "left")
        .join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .groupBy(level.alias("funnel_level"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    tot = grouped.agg(F.sum("n_users").alias("_tot"))
    return grouped.crossJoin(F.broadcast(tot)).select(
        "funnel_level",
        "n_users",
        half_up(F.col("n_users") / F.col("_tot"), 6).alias("share"),
    )


def q348_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality strength [EXT]: the STL-style variance decomposition
    of daily order revenue — seasonal component = day-of-week mean
    (q241's index), strength = max(0, 1 − Var(residual)/Var(series))
    (Wang, Smith & Hyndman 2006) — one number that says whether the DOW
    pattern is worth modeling at all (feeds q304's seasonal anomalies).

    Scale shape: daily rollup, broadcast 7-row DOW means, then a 1-row
    variance aggregation."""
    o = _t(spark, sf_dir, "orders")
    # half-safe: the true daily sum of 2-decimal money is ON the cent
    # grid, so round(,2) re-snaps each engine's ~1e-9 float-sum noise to
    # the SAME grid point (0.005 away from any boundary) — _rev is
    # bit-identical cross-engine; its mean is an undisplayed intermediate
    # and the variance displays carry the magnitude waivers below.
    daily = o.groupBy(F.to_date("o_orderdate").alias("_day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("_rev")
    )
    dow = daily.groupBy(F.dayofweek("_day").alias("_dw")).agg(
        F.avg("_rev").alias("_smean")
    )
    resid = daily.select(F.dayofweek("_day").alias("_dw"), "_rev").join(
        F.broadcast(dow), "_dw"
    )
    # half-safe: variances are ~5e11 here — the engines' var_pop
    # algorithms agree only to ~1e-14 RELATIVE, so a fixed 2-decimal
    # display demanded 14 significant digits and flipped x.xx5 boundaries
    # per seed (seed-5 differential). Report in billions at 3 decimals —
    # 6 significant digits, 8 orders of headroom over the cross-engine
    # noise floor (continuous magnitude, not a reachable grid).
    return resid.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.var_pop("_rev") / 1e9, 3).alias("var_daily_bn"),
        # half-safe: same continuous-magnitude rationale as above
        F.round(F.var_pop(F.col("_rev") - F.col("_smean")) / 1e9, 3).alias(
            "var_residual_bn"
        ),
        # a 1-day series has var_pop exactly 0: strength is undefined,
        # guarded NULL (mirrored in the oracle) instead of an ANSI crash
        F.round(
            F.when(
                F.var_pop("_rev") > 0,
                F.greatest(
                    F.lit(0.0),
                    1
                    - F.var_pop(F.col("_rev") - F.col("_smean"))
                    / F.var_pop("_rev"),
                ),
            ),
            6,
        ).alias("seasonality_strength"),
    )


def q349_partition_layout_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition layout planner [EXT]: for candidate time-partitioning
    grains (day / week / month) of the event stream, how many partitions
    exist in total and how many a typical 7-day predicate
    ('2024-01-10'..'2024-01-16') actually touches — the pruning-ratio
    table a lake admin reads before choosing a layout (finer grain prunes
    harder but multiplies small files; pairs with q268's z-order and
    q133's completeness audits).

    Scale shape: three 1-row distinct-count aggregations unioned."""
    ev = _t(spark, sf_dir, "events")
    lo = F.lit("2024-01-10").cast("timestamp_ntz")
    hi = F.lit("2024-01-17").cast("timestamp_ntz")
    outs = []
    for grain in ("day", "week", "month"):
        agg = ev.agg(
            F.countDistinct(F.date_trunc(grain, "ts")).alias("n_partitions"),
            F.countDistinct(
                F.when(
                    (F.col("ts") >= lo) & (F.col("ts") < hi),
                    F.date_trunc(grain, "ts"),
                )
            ).alias("n_touched"),
        ).select(
            F.lit(grain).alias("grain"),
            "n_partitions",
            "n_touched",
            half_up(
                1 - F.col("n_touched") / F.col("n_partitions").cast("double"),
                6,
            ).alias("pruning_ratio"),
        )
        outs.append(agg)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def q350_encoding_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column encoding planner [EXT]: per lineitem column, the NDV ratio
    and the dictionary key width that drive a columnar writer's
    dictionary-vs-plain decision (dictionary pays when the key width
    beats the value width and the page dictionary fits) — the ANALYZE
    output feeding a parquet/ORC writer's encoding chooser (q281 collects
    the value stats; this is the storage read of them).

    Scale shape: one melt + (col, value) pre-aggregation (q281's shape);
    the per-column rollup sees distinct values only."""
    li = _t(spark, sf_dir, "lineitem")
    cols = [
        "l_returnflag",
        "l_linestatus",
        "l_partkey",
        "l_quantity",
        "l_shipdate",
    ]
    melted = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("_s")
    ).select("_s.col_name", "_s.v")
    cnts = melted.groupBy("col_name", "v").agg(F.count(F.lit(1)).alias("_c"))
    stats = cnts.groupBy("col_name").agg(
        F.sum("_c").alias("n_rows"),
        F.count(F.lit(1)).alias("ndv"),
    )
    dict_bits = F.ceil(F.log2(F.col("ndv").cast("double")))
    return stats.select(
        "col_name",
        "n_rows",
        "ndv",
        half_up(F.col("ndv") / F.col("n_rows").cast("double"), 6).alias(
            "ndv_ratio"
        ),
        dict_bits.alias("dict_key_bits"),
        F.when(
            (F.col("ndv") <= 65536)
            & (F.col("ndv") / F.col("n_rows").cast("double") < 0.5),
            F.lit("dictionary"),
        )
        .otherwise(F.lit("plain"))
        .alias("recommendation"),
    )


def q351_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-activity peak detection [EXT]: per event type, the days that
    are strict local maxima AND at least 1.1× their centered 7-day mean —
    the alerting primitive behind 'traffic spiked on X' (q154's z-score
    flags level shifts; this flags shape). Emits the peak days with their
    prominence ratio.

    Scale shape: one daily rollup; neighbors and the centered mean are
    type-partitioned windows over ~30 day rows."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("event_type").orderBy("day")
    w7 = w.rowsBetween(-3, 3)
    flagged = daily.select(
        "event_type",
        "day",
        "n_events",
        F.lag("n_events").over(w).alias("_prev"),
        F.lead("n_events").over(w).alias("_next"),
        F.avg("n_events").over(w7).alias("_avg7"),
    )
    return (
        flagged.filter(
            F.col("_prev").isNotNull()
            & F.col("_next").isNotNull()
            & (F.col("n_events") > F.col("_prev"))
            & (F.col("n_events") > F.col("_next"))
            & (F.col("n_events") > 1.1 * F.col("_avg7"))
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            F.round("_avg7", 2).alias("avg_7d"),
            F.round(F.col("n_events") / F.col("_avg7"), 6).alias(
                "prominence_ratio"
            ),
        )
    )


def q352_variance_reduction_methods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator bake-off [EXT]: the same A/B effect estimated three ways
    — raw difference of means, CUPED (q306), and post-stratification on
    pre-period quintiles (q307's strata) — each with its standard error,
    so the variance-reduction choice is read off one table instead of
    three dashboards.

    Scale shape: one per-user aggregation feeds all three estimators;
    θ/cuts ride as a 1-row broadcast; both arms are pivoted in-row via
    conditional aggregation (no per-arm filter branches — r12: the old
    filter×crossJoin form re-expanded the corpus lineage 6x), so the
    whole bake-off is one global agg + one ≤5-row stratum agg; output is
    3 rows."""
    ev = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp_ntz")
    # _cy: exact integer cents of the post-period spend (decimal(38,0) —
    # 128-bit, HUGEINT on the oracle side). The raw and post-stratified
    # effects are differences of MONEY MEANS, whose exact rationals
    # C/(100·n) genuinely land on d=6 half boundaries (ultra-sparse seed
    # 454647 hit -50.5853125 exactly: the engines' float sums straddled
    # the boundary by 1 ulp each side) — the q183/q232 class, so both
    # displays move to exact-integer arithmetic below.
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, F.col("value"))).alias("_x"),
        F.sum(F.when(F.col("ts") >= cut, F.col("value"))).alias("_y"),
        F.sum(
            F.when(F.col("ts") >= cut, _cents("value")).cast("decimal(38,0)")
        ).alias("_cy"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull()).select(
        (F.col("user_id") % 2).alias("_t"), "_x", "_y", "_cy", "user_id"
    )
    # same degenerate-covariate guard as q306: moments first, divide after
    theta = per_user.agg(
        F.covar_pop("_y", "_x").alias("_cyx"),
        F.var_pop("_x").alias("_vx"),
        F.avg("_x").alias("_xbar"),
        F.expr("percentile(_x, array(0.2, 0.4, 0.6, 0.8))").alias("_cuts"),
    ).select(
        F.when(F.col("_vx") > 0, F.col("_cyx") / F.col("_vx")).alias("_th"),
        "_xbar",
        "_cuts",
    )
    enriched = per_user.crossJoin(F.broadcast(theta)).select(
        "_t",
        "_y",
        "_cy",
        (F.col("_y") - F.col("_th") * (F.col("_x") - F.col("_xbar"))).alias(
            "_yc"
        ),
        F.aggregate(
            "_cuts",
            F.lit(0),
            lambda acc, c: acc + F.when(F.col("_x") > c, 1).otherwise(0),
        ).alias("_s"),
    )

    # Both arms via CONDITIONAL aggregation (pivoted in-row), not
    # filter(t=1)×filter(t=0) crossJoins: the filter/crossJoin form
    # re-expanded the whole per-user lineage once per arm per estimator —
    # 12 scans of the corpus-sized events table and 26 exchanges for a
    # 3-row answer. One global agg (raw + cuped) + one per-stratum agg
    # (post) cuts that to 4 scans; arm-empty inputs now degrade to NULL
    # effects on BOTH engines instead of dropping rows on one.
    arm1 = F.col("_t") == 1
    arm0 = F.col("_t") == 0

    # raw effect: exact rational (C1·n0 − C0·n1)/(100·n1·n0) half-up at 6
    # — a money-mean difference whose d=6 half boundary is REACHABLE
    # (seed 454647). The SE keeps float variance (sqrt → irrational,
    # boundary measure-zero). cuped stays float: θ is a ratio of float
    # covariance moments whose reduced rational denominator dividing
    # 2·10^6 needs astronomical cancellation (half-safe, seed-covered).
    g = enriched.agg(
        F.sum(F.when(arm1, 1).otherwise(0)).alias("_n1"),
        F.sum(F.when(arm0, 1).otherwise(0)).alias("_n0"),
        F.sum(F.when(arm1, F.col("_cy"))).alias("_C1"),
        F.sum(F.when(arm0, F.col("_cy"))).alias("_C0"),
        F.var_samp(F.when(arm1, F.col("_y"))).alias("_v1"),
        F.var_samp(F.when(arm0, F.col("_y"))).alias("_v0"),
        F.avg(F.when(arm1, F.col("_yc"))).alias("_mc1"),
        F.avg(F.when(arm0, F.col("_yc"))).alias("_mc0"),
        F.var_samp(F.when(arm1, F.col("_yc"))).alias("_vc1"),
        F.var_samp(F.when(arm0, F.col("_yc"))).alias("_vc0"),
    )
    raw = g.select(
        F.lit("raw").alias("method"),
        _half_up(
            F.col("_C1") * F.col("_n0") - F.col("_C0") * F.col("_n1"),
            F.lit(100) * F.col("_n1") * F.col("_n0"),
            6,
        ).alias("effect"),
        F.round(
            F.sqrt(F.col("_v1") / F.col("_n1") + F.col("_v0") / F.col("_n0")),
            6,
        ).alias("se"),
    )
    cuped = g.select(
        F.lit("cuped").alias("method"),
        F.round(F.col("_mc1") - F.col("_mc0"), 6).alias("effect"),
        F.round(
            F.sqrt(F.col("_vc1") / F.col("_n1") + F.col("_vc0") / F.col("_n0")),
            6,
        ).alias("se"),
    )

    st = enriched.groupBy("_s").agg(
        F.sum(F.when(arm1, 1).otherwise(0)).alias("_n1"),
        F.sum(F.when(arm0, 1).otherwise(0)).alias("_n0"),
        F.sum(F.when(arm1, F.col("_cy"))).alias("_C1"),
        F.sum(F.when(arm0, F.col("_cy"))).alias("_C0"),
        F.var_samp(F.when(arm1, F.col("_y"))).alias("_v1"),
        F.var_samp(F.when(arm0, F.col("_y"))).alias("_v0"),
    ).filter((F.col("_n1") > 0) & (F.col("_n0") > 0))  # both-arm strata only
    # post-stratified effect: same money-mean-difference class, one level
    # deeper (weighted across strata whose small-n denominators CAN divide
    # 2·10^6 at sparse tiers). q232's pattern: quantize the per-stratum
    # difference to an exact 1e-7-grid integer (identical floor of an
    # identical double on both engines), then the weighted mean is exact
    # integer arithmetic: effect = Σ(dq_s·N_s) / (10^7·N) half-up at 6.
    post = (
        st.select(
            F.floor(
                (F.col("_C1") * F.col("_n0") - F.col("_C0") * F.col("_n1"))
                .cast("double")
                * F.lit(1e7)
                / (F.lit(100) * F.col("_n1") * F.col("_n0"))
                + 0.5
            ).cast("long").alias("_dq"),
            (F.col("_v1") / F.col("_n1") + F.col("_v0") / F.col("_n0")).alias(
                "_var"
            ),
            (F.col("_n1") + F.col("_n0")).alias("_ns"),
        )
        .agg(
            _half_up(
                F.sum(F.col("_dq") * F.col("_ns")),
                F.lit(10_000_000) * F.sum("_ns"),
                6,
            ).alias("effect"),
            F.round(
                F.sqrt(
                    F.sum(
                        F.col("_var") * F.col("_ns") * F.col("_ns")
                    )
                    / (F.sum("_ns") * F.sum("_ns"))
                ),
                6,
            ).alias("se"),
        )
        .select(F.lit("post_stratified").alias("method"), "effect", "se")
    )
    return raw.unionByName(cuped).unionByName(post)


def q353_cf_holdout_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recommender holdout evaluation [EXT]: train q331's item-item CF on
    orders BEFORE 1998-01-01, then measure hit-rate@3 on the held-out
    period — of the test-period co-purchases involving a trained head
    item, how many land in its trained top-3 list? The temporal-split
    eval that separates 'my similarity table is pretty' from 'it
    predicts'.

    Scale shape: train/test are date-pruned scans of the same order-
    blocked co-occurrence shape; the trained top-3 table (60 rows)
    broadcasts into the test-pair probe."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    odate = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    keyed = li.join(
        odate.hint("shuffle_hash"),
        li.l_orderkey == odate.o_orderkey,
    ).select(
        "l_orderkey",
        "l_partkey",
        (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")).alias(
            "_train"
        ),
    )
    train = keyed.filter(F.col("_train")).select("l_orderkey", "l_partkey")
    test = keyed.filter(~F.col("_train")).select("l_orderkey", "l_partkey")
    n_i = train.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("_n"))
    b = train.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("_pb")
    )
    top_items = (
        n_i.orderBy(F.col("_n").desc(), "l_partkey")
        .limit(20)
        .select(F.col("l_partkey").alias("item_a"), F.col("_n").alias("_na"))
    )
    # r13 (guide §3.2/§2.3): head restriction pushed below the co-occurrence
    # self-join — counts are per-pair, so restricting the LEFT side to the
    # k=20 head items is exact (q331's rewrite, same rationale/comment).
    co = (
        train.join(
            F.broadcast(top_items.select(F.col("item_a").alias("l_partkey"))),
            "l_partkey",
        )
        .join(
            b,
            (F.col("l_orderkey") == F.col("_ok"))
            & (F.col("l_partkey") != F.col("_pb")),
        )
        .groupBy(F.col("l_partkey").alias("item_a"), F.col("_pb").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("_co"))
    )
    wr = Window.partitionBy("item_a").orderBy(
        F.col("_sim").desc(), "item_b"
    )
    top3 = (
        co.join(F.broadcast(top_items), "item_a")
        .join(
            n_i.select(F.col("l_partkey").alias("item_b"),
                       F.col("_n").alias("_nb")),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            F.round(F.col("_co") / F.sqrt(F.col("_na") * F.col("_nb")), 9).alias(
                "_sim"
            ),
        )
        .withColumn("_r", F.row_number().over(wr))
        .filter(F.col("_r") <= 3)
        .select("item_a", "item_b")
    )
    tb = test.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("_pb")
    )
    # r13: same pushdown on the probe side — the head-item restriction
    # (previously applied after the pair distinct) moves below the test
    # self-join; distinct over (item_a, item_b) commutes with an item_a
    # subset restriction, so the surviving pair set is identical.
    test_pairs = (
        test.join(
            F.broadcast(top_items.select(F.col("item_a").alias("l_partkey"))),
            "l_partkey",
        )
        .join(
            tb,
            (F.col("l_orderkey") == F.col("_ok"))
            & (F.col("l_partkey") != F.col("_pb")),
        )
        .select(
            F.col("l_partkey").alias("item_a"), F.col("_pb").alias("item_b")
        )
        .distinct()
    )
    hits = test_pairs.join(
        F.broadcast(top3.withColumn("_hit", F.lit(1))),
        ["item_a", "item_b"],
        "left",
    )
    return hits.agg(
        F.count(F.lit(1)).alias("n_test_pairs"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hits"),
        _half_up(
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)).cast("long")),
            F.count(F.lit(1)),
            6,
        ).alias("hit_rate_at_3"),
    )


def q354_bpe_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge simulation [EXT]: three unrolled merge steps of
    byte-pair-encoding training at WORD granularity — each step counts
    adjacent token pairs corpus-wide (q265 is one such step), merges the
    most frequent pair everywhere (left-to-right literal replacement on
    the space-sentineled normalized text), and recounts. Returns the
    3-step merge table a tokenizer trainer would emit.

    Scale shape: each step is one shuffle (pair counts) + a map-side
    literal replace; the argmax pair is a bounded 1-row driver pull, the
    merge token embeds '@@' so later steps can't split it."""
    d = _t(spark, sf_dir, "documents")
    norm = F.concat(
        F.lit(" "),
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
        F.lit(" "),
    )
    corpus = d.select(F.col("doc_id").alias("_doc"), norm.alias("_txt"))
    rows = []
    for step in range(1, 4):
        toks = corpus.select(
            "_doc",
            F.posexplode(F.split(F.trim(F.col("_txt")), r"\s+")).alias(
                "_p", "_w"
            ),
        )
        w = Window.partitionBy("_doc").orderBy("_p")
        pairs = (
            toks.select(
                F.lag("_w").over(w).alias("_w1"), F.col("_w").alias("_w2")
            )
            .filter(F.col("_w1").isNotNull())
            .groupBy("_w1", "_w2")
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        top = pairs.orderBy(
            F.col("_n").desc(), "_w1", "_w2"
        ).limit(1).collect()[0]
        w1, w2, n = top["_w1"], top["_w2"], top["_n"]
        rows.append((step, f"{w1} {w2}", f"{w1}@@{w2}", int(n)))
        corpus = corpus.select(
            "_doc",
            F.replace(
                F.col("_txt"), F.lit(f" {w1} {w2} "), F.lit(f" {w1}@@{w2} ")
            ).alias("_txt"),
        )
    return spark.createDataFrame(
        rows, "step int, merged_pair string, new_token string, pair_count bigint"
    )


def q355_three_itemset_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over 3-itemsets [EXT]: {a, b} → c rules from
    order baskets with support ≥ 2 orders, ranked by lift — the market-
    basket step past q119's pair lift (pair rules miss 'a AND b together
    imply c'). Top-10 rules by lift with full tie-break.

    Scale shape: triples enumerate via the order-blocked double self-join
    with a < b orientation (bounded by basket width³, never corpus-
    quadratic); supports join broadcast; TakeOrdered top-10."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n_orders = li.select("l_orderkey").distinct().count()
    b = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("_pb")
    )
    c = li.select(
        F.col("l_orderkey").alias("_ok2"), F.col("l_partkey").alias("_pc")
    )
    triples = (
        li.join(
            b.hint("shuffle_hash"),
            (F.col("l_orderkey") == F.col("_ok"))
            & (F.col("l_partkey") < F.col("_pb")),
        )
        .join(
            c.hint("shuffle_hash"),
            (F.col("l_orderkey") == F.col("_ok2"))
            & (F.col("_pc") != F.col("l_partkey"))
            & (F.col("_pc") != F.col("_pb")),
        )
        .groupBy(
            F.col("l_partkey").alias("item_a"),
            F.col("_pb").alias("item_b"),
            F.col("_pc").alias("item_c"),
        )
        .agg(F.count(F.lit(1)).alias("_sup_abc"))
        .filter(F.col("_sup_abc") >= 2)
    )
    pair_sup = (
        li.join(
            b.hint("shuffle_hash"),
            (F.col("l_orderkey") == F.col("_ok"))
            & (F.col("l_partkey") < F.col("_pb")),
        )
        .groupBy(
            F.col("l_partkey").alias("item_a"), F.col("_pb").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("_sup_ab"))
    )
    item_sup = li.groupBy(F.col("l_partkey").alias("item_c")).agg(
        F.count(F.lit(1)).alias("_sup_c")
    )
    scored = (
        triples.join(pair_sup.hint("shuffle_hash"), ["item_a", "item_b"])
        .join(F.broadcast(item_sup), "item_c")
        .select(
            "item_a",
            "item_b",
            "item_c",
            F.col("_sup_abc").alias("support"),
            half_up(F.col("_sup_abc") / F.col("_sup_ab"), 6).alias(
                "confidence"
            ),
            half_up(
                F.col("_sup_abc")
                * F.lit(float(n_orders))
                / (F.col("_sup_ab") * F.col("_sup_c")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), "item_a", "item_b", "item_c"
    ).limit(10)


def q356_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting [EXT]: per week, users decomposed into NEW
    (first week ever), RETAINED (active previous week too), and
    RESURRECTED (active before, but not last week) — plus the churned
    count (active last week, absent now) — the standard MAU/WAU
    decomposition a growth team reads weekly (q100's cohort matrix is
    the long view; this is the ledger).

    Scale shape: one (user, week) distinct pass; the state classification
    is a lag window per user over week rows; churn joins the previous
    week's actives."""
    ev = _t(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("_wk")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("_wk")
    classified = uw.select(
        "user_id",
        "_wk",
        F.lag("_wk").over(w).alias("_prev_active"),
        F.min("_wk").over(
            Window.partitionBy("user_id")
        ).alias("_first"),
    ).select(
        "_wk",
        F.when(F.col("_wk") == F.col("_first"), "new")
        .when(
            F.datediff("_wk", "_prev_active") == 7, "retained"
        )
        .otherwise("resurrected")
        .alias("state"),
    )
    counts = classified.groupBy(
        F.date_format("_wk", "yyyy-MM-dd").alias("week")
    ).agg(
        F.sum(F.when(F.col("state") == "new", 1).otherwise(0)).alias("new_users"),
        F.sum(F.when(F.col("state") == "retained", 1).otherwise(0)).alias(
            "retained_users"
        ),
        F.sum(F.when(F.col("state") == "resurrected", 1).otherwise(0)).alias(
            "resurrected_users"
        ),
    )
    # churned(w) = active in w-7 and not in w
    prev = uw.select(
        F.date_format(F.date_add(F.col("_wk").cast("date"), 7), "yyyy-MM-dd").alias(
            "week"
        ),
        "user_id",
    )
    cur = uw.select(
        F.date_format(F.col("_wk").cast("date"), "yyyy-MM-dd").alias("week"),
        "user_id",
    )
    churned = (
        prev.join(cur.hint("shuffle_hash"), ["week", "user_id"], "left_anti")
        .groupBy("week")
        .agg(F.count(F.lit(1)).alias("churned_users"))
    )
    return (
        counts.join(churned, "week", "left")
        .select(
            "week",
            "new_users",
            "retained_users",
            "resurrected_users",
            F.coalesce(F.col("churned_users"), F.lit(0)).alias(
                "churned_users"
            ),
        )
    )


def q357_conversion_regression_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-regression detector [EXT]: weekly purchase-per-user
    conversion with Wilson 95% intervals (q286's machinery over time),
    flagged when a week's upper bound falls below the previous week's
    lower bound — the CI-disjointness rule that pages a team only on
    statistically real drops, not noise.

    Scale shape: one (week, user) distinct pass, weekly rollup, Wilson
    arithmetic per row, one lag window over ~5 week rows."""
    ev = _t(spark, sf_dir, "events")
    weekly = ev.groupBy(F.date_trunc("week", "ts").alias("_wk")).agg(
        F.countDistinct("user_id").alias("_n"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("_k"),
    )
    z2 = 1.959964 * 1.959964
    p = F.col("_k") / F.col("_n")
    denom = 1 + z2 / F.col("_n")
    center = (p + z2 / (2 * F.col("_n"))) / denom
    half = (
        F.lit(1.959964)
        * F.sqrt(
            p * (1 - p) / F.col("_n") + z2 / (4 * F.col("_n") * F.col("_n"))
        )
        / denom
    )
    banded = weekly.select(
        "_wk",
        "_n",
        "_k",
        half_up(p, 6).alias("conversion"),
        (center - half).alias("_lo"),
        (center + half).alias("_hi"),
    )
    # lag over the ~5 week rows; the year partition keeps the window off
    # the unpartitioned path (single year in this corpus, bounded weeks)
    w = Window.partitionBy(F.year("_wk")).orderBy("_wk")
    flagged = banded.select(
        F.date_format("_wk", "yyyy-MM-dd").alias("week"),
        F.col("_n").alias("n_users"),
        F.col("_k").alias("n_converted"),
        "conversion",
        F.round("_lo", 6).alias("wilson_lo"),
        F.round("_hi", 6).alias("wilson_hi"),
        F.coalesce(
            F.col("_hi") < F.lag("_lo").over(w), F.lit(False)
        ).alias("regression_flag"),
    )
    return flagged


def q358_depth_conversion_monotonicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement-depth monotonicity audit [EXT]: conversion rate by
    event-count quintile — deeper users should convert more, and the
    number of ADJACENT DECREASES (isotonic violations) says whether the
    'engagement drives conversion' narrative survives contact with data.

    Scale shape: per-user rollup, quintile cuts via one exact-percentile
    agg (broadcast), per-bucket rates, one lag over 5 rows."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("_depth"),
        F.max(
            (F.col("event_type") == "purchase").cast("int")
        ).alias("_converted"),
    )
    cuts = per_user.agg(
        F.expr("percentile(_depth, array(0.2, 0.4, 0.6, 0.8))").alias("_c")
    )
    bucketed = per_user.crossJoin(F.broadcast(cuts)).select(
        F.aggregate(
            "_c",
            F.lit(0),
            lambda acc, c: acc + F.when(F.col("_depth") > c, 1).otherwise(0),
        ).alias("depth_quintile"),
        "_converted",
    )
    rates = bucketed.groupBy("depth_quintile").agg(
        F.count(F.lit(1)).alias("n_users"),
        _half_up(
            F.sum(F.col("_converted").cast("long")), F.count(F.lit(1)), 6
        ).alias(
            "conversion_rate"
        ),
    )
    # global window over exactly 5 quintile rows (whitelisted in the
    # plan-audit census)
    w = Window.orderBy("depth_quintile")
    return rates.select(
        "depth_quintile",
        "n_users",
        "conversion_rate",
        F.coalesce(
            F.col("conversion_rate") < F.lag("conversion_rate").over(w),
            F.lit(False),
        ).alias("isotonic_violation"),
    )


def q359_ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart [EXT]: exponentially weighted moving average of
    daily order counts (λ=0.3) with ±3σ_EWMA limits, σ_EWMA² =
    σ²·λ/(2−λ)·(1−(1−λ)^{2t}) — the SPC chart that catches small
    sustained shifts CUSUM-style charts (q232) and point z-scores (q154)
    trade off differently. The recursion is realized as an explicit
    decay-weighted prefix sum, exact on the bounded day grid.

    Scale shape: daily rollup, then day-rank windows over the ~2400-row
    date grid (calendar span, not data volume); the decay weights come
    from pow() on the rank delta, never a true recursion."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    lam = 0.3
    base = daily.agg(
        F.avg("_n").alias("_mu"), F.stddev_samp("_n").alias("_sd")
    )
    # global window over the bounded day grid (~80 rows; whitelisted in
    # the plan-audit census)
    w = Window.orderBy("day")
    ranked = daily.withColumn("_r", F.row_number().over(w))
    a = ranked.alias("a")
    bseq = ranked.select(
        F.col("_r").alias("_rb"), F.col("_n").alias("_nb")
    ).alias("b")
    # EWMA_t = λ Σ_{i<=t} (1-λ)^(t-i) x_i + (1-λ)^t μ0 (μ0 = grand mean)
    ewma = (
        a.join(bseq.hint("shuffle_hash"), F.col("_rb") <= F.col("_r"))
        .groupBy("a.day", "a._n", "a._r")
        .agg(
            F.sum(
                F.lit(lam)
                * F.pow(F.lit(1 - lam), F.col("_r") - F.col("_rb"))
                * F.col("_nb")
            ).alias("_wsum")
        )
    )
    return (
        ewma.crossJoin(F.broadcast(base))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("_n").alias("n_orders"),
            F.round(
                F.col("_wsum")
                + F.pow(F.lit(1 - lam), F.col("_r")) * F.col("_mu"),
                4,
            ).alias("ewma"),
            F.round(
                F.col("_mu")
                - 3
                * F.col("_sd")
                * F.sqrt(
                    F.lit(lam / (2 - lam))
                    * (1 - F.pow(F.lit(1 - lam), 2 * F.col("_r")))
                ),
                4,
            ).alias("lcl"),
            F.round(
                F.col("_mu")
                + 3
                * F.col("_sd")
                * F.sqrt(
                    F.lit(lam / (2 - lam))
                    * (1 - F.pow(F.lit(1 - lam), 2 * F.col("_r")))
                ),
                4,
            ).alias("ucl"),
        )
        .withColumn(
            "out_of_control",
            (F.col("ewma") < F.col("lcl")) | (F.col("ewma") > F.col("ucl")),
        )
    )


def q360_sample_fidelity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample fidelity audit [EXT]: a deterministic 1000-row 'reservoir'
    (the 1000 smallest md5(orderkey) hashes — the fixed-size analogue of
    q51's rate-based hash sample) vs the full table, compared on mean /
    p50 / p90 of order value — the 'can dashboards run on the sample'
    check that should precede any sampled rollout.

    Scale shape: the sample is a TakeOrdered by hash (no shuffle of the
    full data beyond the top-k); both sides collapse to 1-row moment
    aggregates before the compare."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    sample = o.select(
        "o_totalprice", F.md5(F.col("o_orderkey").cast("string")).alias("_h")
    ).orderBy("_h").limit(1000)
    full_stats = o.agg(
        F.count(F.lit(1)).alias("full_n"),
        _half_up(F.sum(_cents("o_totalprice")), F.count(F.lit(1)) * 100, 4).alias("full_mean"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("full_p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("full_p90"),
    )
    samp_stats = sample.agg(
        F.count(F.lit(1)).alias("sample_n"),
        _half_up(F.sum(_cents("o_totalprice")), F.count(F.lit(1)) * 100, 4).alias("sample_mean"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias(
            "sample_p50"
        ),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias(
            "sample_p90"
        ),
    )
    return full_stats.crossJoin(samp_stats).select(
        "full_n",
        "sample_n",
        "full_mean",
        "sample_mean",
        half_up(
            F.abs(F.col("sample_mean") - F.col("full_mean"))
            / F.col("full_mean"),
            6,
        ).alias("mean_rel_err"),
        "full_p50",
        "sample_p50",
        "full_p90",
        "sample_p90",
    )


def q361_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b between daily order count and daily revenue [EXT]:
    the concordant/discordant-pair rank correlation with tie correction —
    the robust alternative to Pearson (q41) and the pairwise sibling of
    Spearman (q213), computed from the day-grid self-join (bounded by the
    calendar span squared, never by row count).

    Scale shape: one daily rollup, one grid×grid join with i<j
    orientation, then 1-row tie-corrected arithmetic."""
    o = _t(spark, sf_dir, "orders")
    # half-safe: the true daily sum of 2-decimal money is ON the cent
    # grid — round(,2) re-snaps both engines' float sums to the same grid
    # double (0.005 from any boundary), so the _y == _y2 tie indicators
    # (exact integer sums) cannot flip cross-engine.
    daily = o.groupBy(F.to_date("o_orderdate").alias("_day")).agg(
        F.count(F.lit(1)).alias("_x"),
        F.round(F.sum("o_totalprice"), 2).alias("_y"),
    )
    b = daily.select(
        F.col("_day").alias("_day2"),
        F.col("_x").alias("_x2"),
        F.col("_y").alias("_y2"),
    )
    pairs = daily.join(b.hint("shuffle_hash"), F.col("_day") < F.col("_day2"))
    sgn = (
        F.signum((F.col("_x") - F.col("_x2")).cast("double"))
        * F.signum(F.col("_y") - F.col("_y2"))
    )
    stats = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(sgn).alias("_s"),
        F.sum(
            F.when(F.col("_x") == F.col("_x2"), 1).otherwise(0)
        ).alias("_tx"),
        F.sum(
            F.when(F.col("_y") == F.col("_y2"), 1).otherwise(0)
        ).alias("_ty"),
    )
    return stats.select(
        "n_pairs",
        F.col("_s").cast("long").alias("concordant_minus_discordant"),
        F.round(
            F.col("_s")
            / F.sqrt(
                (F.col("n_pairs") - F.col("_tx")).cast("double")
                * (F.col("n_pairs") - F.col("_ty"))
            ),
            6,
        ).alias("kendall_tau_b"),
    )


def q362_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimator [EXT]: α̂ = 1/mean(ln(x_i/x_(k))) over
    the top-k order statistics of order value (k=500) — the standard
    heavy-tail exponent read (Hill 1975) that says whether revenue
    concentration (q204's Pareto share) comes from a power law and how
    fat the tail is (α ≤ 2: infinite variance — percentile dashboards
    over means).

    Scale shape: top-k is a TakeOrdered; the threshold x_(k) is a 1-row
    broadcast; the estimator is one aggregation over k rows."""
    o = _t(spark, sf_dir, "orders")
    k = 500
    topk = o.select("o_totalprice").orderBy(
        F.col("o_totalprice").desc(), "o_totalprice"
    ).limit(k)
    xk = topk.agg(F.min("o_totalprice").alias("_xk"))
    return (
        topk.crossJoin(F.broadcast(xk))
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.round(F.max("_xk"), 2).alias("threshold"),
            F.round(
                F.lit(1.0)
                / F.avg(F.log(F.col("o_totalprice") / F.col("_xk"))),
                6,
            ).alias("hill_alpha"),
        )
    )


def q363_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling cross-metric correlation [EXT]: the trailing-14-day
    Pearson correlation between each event-type pair's daily counts —
    the co-movement monitor that flags when two product surfaces start
    moving together (or stop). Emits each pair's LATEST rolling value
    plus its min/max over the window history.

    Scale shape: daily (type, day) rollup, pair join on day (types ×
    types, bounded), rolling moments via pair-partitioned 14-row
    windows."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("_day")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    b = daily.select(
        F.col("event_type").alias("_et2"),
        F.col("_day").alias("_day2"),
        F.col("_n").alias("_n2"),
    )
    paired = daily.join(
        b.hint("shuffle_hash"),
        (F.col("_day") == F.col("_day2"))
        & (F.col("event_type") < F.col("_et2")),
    )
    w = (
        Window.partitionBy("event_type", "_et2")
        .orderBy("_day")
        .rowsBetween(-13, 0)
    )
    # manual Pearson from window moments: Spark's corr window throws on
    # zero-variance frames under ANSI; the explicit form guards the
    # denominator and matches the SQL twin term-for-term
    x = F.col("_n").cast("double")
    y = F.col("_n2").cast("double")
    moments = paired.select(
        "event_type",
        "_et2",
        "_day",
        F.count(F.lit(1)).over(w).alias("_cnt"),
        F.sum(x).over(w).alias("_sx"),
        F.sum(y).over(w).alias("_sy"),
        F.sum(x * x).over(w).alias("_sxx"),
        F.sum(y * y).over(w).alias("_syy"),
        F.sum(x * y).over(w).alias("_sxy"),
    ).filter(F.col("_cnt") >= 14)
    varx = F.col("_cnt") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vary = F.col("_cnt") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    rolled = moments.select(
        "event_type",
        "_et2",
        "_day",
        F.when(
            varx * vary > 0,
            (F.col("_cnt") * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
            / F.sqrt(varx * vary),
        ).alias("_rc"),
    )
    return rolled.groupBy(
        F.col("event_type").alias("type_a"), F.col("_et2").alias("type_b")
    ).agg(
        F.round(F.max_by("_rc", "_day"), 6).alias("latest_corr_14d"),
        F.round(F.min("_rc"), 6).alias("min_corr_14d"),
        F.round(F.max("_rc"), 6).alias("max_corr_14d"),
    )


def q364_bayes_ab_normal_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian A/B readout [EXT]: Beta(1,1)-posterior conversion rates
    per arm and P(B > A) under the normal approximation to the posterior
    difference — the 'probability B is better' number a product team
    actually asks for, next to q230's p-value (Φ via the same
    Abramowitz-Stegun polynomial as q340, identical literal arithmetic
    in both engines).

    Scale shape: one per-arm conversion aggregation; everything after is
    1-row arithmetic."""
    ev = _t(spark, sf_dir, "events")
    per_arm = ev.groupBy((F.col("user_id") % 2).alias("_arm")).agg(
        F.countDistinct("user_id").alias("_n"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("_k"),
    )
    a = per_arm.filter(F.col("_arm") == 0).select(
        F.col("_n").alias("_na"), F.col("_k").alias("_ka")
    )
    b = per_arm.filter(F.col("_arm") == 1).select(
        F.col("_n").alias("_nb"), F.col("_k").alias("_kb")
    )
    j = a.crossJoin(b)
    # Beta(1+k, 1+n-k) posterior moments
    ma = (F.col("_ka") + 1) / (F.col("_na") + 2)
    mb = (F.col("_kb") + 1) / (F.col("_nb") + 2)
    va = ma * (1 - ma) / (F.col("_na") + 3)
    vb = mb * (1 - mb) / (F.col("_nb") + 3)
    z = (mb - ma) / F.sqrt(va + vb)
    x = F.abs(F.col("_z"))
    t = 1 / (1 + 0.2316419 * x)
    tail = (
        F.exp(-x * x / 2)
        / F.lit(2.5066282746310002)
        * (
            0.319381530 * t
            - 0.356563782 * t * t
            + 1.781477937 * t * t * t
            - 1.821255978 * t * t * t * t
            + 1.330274429 * t * t * t * t * t
        )
    )
    p_b_gt_a = F.when(F.col("_z") >= 0, 1 - tail).otherwise(tail)
    return (
        j.select(
            F.round(ma, 6).alias("posterior_mean_a"),
            F.round(mb, 6).alias("posterior_mean_b"),
            z.alias("_z"),
        )
        .select(
            "posterior_mean_a",
            "posterior_mean_b",
            F.round("_z", 6).alias("z_stat"),
            F.round(p_b_gt_a, 6).alias("p_b_beats_a"),
        )
    )


def q365_rec_novelty_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recommendation novelty & catalog coverage [EXT]: for q331's
    item-item top-3 lists, the mean self-information −log2(popularity)
    of recommended items (novelty — are we just recommending
    bestsellers?) and the share of the catalog that appears in any list
    (coverage) — the two beyond-accuracy metrics that expose popularity
    bias (complements q353's hit-rate).

    Scale shape: re-derives the bounded top-3 table (q331's shape), joins
    unhinted AQE-gated popularity join, and collapses to one row."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n_orders = li.select("l_orderkey").distinct().count()
    n_catalog = _t(spark, sf_dir, "part").count()
    n_i = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("_n"))
    b = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("_pb")
    )
    top_items = (
        n_i.orderBy(F.col("_n").desc(), "l_partkey")
        .limit(20)
        .select(F.col("l_partkey").alias("item_a"), F.col("_n").alias("_na"))
    )
    # r13 (guide §3.2/§2.3): head restriction pushed below the co-occurrence
    # self-join — counts are per-pair, so restricting the LEFT side to the
    # k=20 head items is exact (q331's rewrite, same rationale/comment).
    co = (
        li.join(
            F.broadcast(top_items.select(F.col("item_a").alias("l_partkey"))),
            "l_partkey",
        )
        .join(
            b,
            (F.col("l_orderkey") == F.col("_ok"))
            & (F.col("l_partkey") != F.col("_pb")),
        )
        .groupBy(F.col("l_partkey").alias("item_a"), F.col("_pb").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("_co"))
    )
    wr = Window.partitionBy("item_a").orderBy(F.col("_sim").desc(), "item_b")
    recs = (
        co.join(F.broadcast(top_items), "item_a")
        .join(
            n_i.select(F.col("l_partkey").alias("item_b"),
                       F.col("_n").alias("_nb")),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            F.round(
                F.col("_co") / F.sqrt(F.col("_na") * F.col("_nb")), 9
            ).alias("_sim"),
            F.col("_nb"),
        )
        .withColumn("_r", F.row_number().over(wr))
        .filter(F.col("_r") <= 3)
    )
    return recs.agg(
        F.count(F.lit(1)).alias("n_recommendations"),
        # half-safe: log2-based novelty (irrational) — a d=6 half-boundary
        # hit has measure zero
        F.round(
            F.avg(-F.log2(F.col("_nb") / F.lit(float(n_orders)))), 6
        ).alias("mean_novelty_bits"),
        half_up(
            F.countDistinct("item_b") / F.lit(float(n_catalog)), 6
        ).alias("catalog_coverage"),
    )


def q366_dedup_storage_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup ROI ledger [EXT]: bytes (chars) reclaimed by exact dedup vs
    near-dup clustering — per method, the characters of every NON-KEEPER
    document (keeper = smallest doc_id per group, q20/q45 semantics) and
    the share of the corpus that is — the storage/compute savings
    number a dedup rollout is justified with (q199 counts documents;
    this prices them).

    Scale shape: both group tables come from existing operator shapes
    (hash groupBy; SimHash components); the savings rollup is one keyed
    agg per method over (doc, group) rows."""
    d = _t(spark, sf_dir, "documents")
    total = d.agg(F.sum("n_chars").alias("_tot"))
    exact_groups = d.select(
        F.sha2(F.col("text"), 256).alias("_g"), "doc_id", "n_chars"
    )
    near = dedup_clusters(
        simhash_near_dup_pairs(d, "doc_id", "text", bits=32, ngram=2,
                               max_hamming=3)
    )
    near_groups = near.select(
        F.col("component").cast("string").alias("_g"),
        F.col("node").alias("doc_id"),
    ).join(d.select("doc_id", "n_chars"), "doc_id")

    def savings(groups: DataFrame, method: str) -> DataFrame:
        wk = Window.partitionBy("_g")
        marked = groups.select(
            "_g",
            "n_chars",
            (F.col("doc_id") == F.min("doc_id").over(wk)).alias("_keep"),
        )
        return (
            marked.agg(
                F.sum(
                    F.when(~F.col("_keep"), F.col("n_chars")).otherwise(0)
                ).alias("chars_saved"),
                F.sum(
                    F.when(~F.col("_keep"), 1).otherwise(0)
                ).alias("docs_removed"),
            )
            .crossJoin(F.broadcast(total))
            .select(
                F.lit(method).alias("method"),
                "docs_removed",
                "chars_saved",
                half_up(F.col("chars_saved") / F.col("_tot"), 6).alias(
                    "corpus_share_saved"
                ),
            )
        )

    return savings(exact_groups, "exact_sha256").unionByName(
        savings(near_groups, "simhash_components")
    )


def q367_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve [EXT]: cumulative purchase value per user by
    weekly cohort and week offset — the financial overlay on q100's
    retention matrix (retention says who came back; this says what they
    were worth), the curve LTV extrapolation (q344) is fit against.

    Scale shape: per-(user, offset) rollup, unhinted AQE-gated cohort
    join (per-user table is data-sized),
    cohort-partitioned cumulative window over ≤5 offset rows each."""
    ev = _t(spark, sf_dir, "events")
    keyed = ev.select(
        "user_id",
        F.date_trunc("week", "ts").alias("_wk"),
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100, 0).cast("long"),
        ).otherwise(0).alias("_cents"),
    )
    cohort = keyed.groupBy("user_id").agg(F.min("_wk").alias("_c0"))
    sizes = cohort.groupBy("_c0").agg(F.count(F.lit(1)).alias("_n0"))
    per_offset = (
        keyed.join(cohort, "user_id")
        .groupBy(
            "_c0",
            (F.datediff("_wk", "_c0") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.sum("_cents").alias("_rev"))
    )
    w = (
        Window.partitionBy("_c0")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per_offset.join(F.broadcast(sizes), "_c0")
        .select(
            F.date_format("_c0", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            F.col("_n0").alias("cohort_size"),
            _half_up(
                F.sum("_rev").over(w), F.lit(100) * F.col("_n0"), 4
            ).alias("cum_ltv_per_user"),
        )
    )


def q368_ljung_box_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box residual-autocorrelation audit [EXT]: after removing the
    day-of-week seasonal mean from daily revenue (q348's residuals), the
    Q statistic n(n+2)·Σ_{k≤7} ρ̂_k²/(n−k) — if Q stays small the
    residuals are white and the seasonal model is sufficient; a large Q
    says structure remains (feeds back into q272/q304's model choices).
    Emits the per-lag autocorrelations and the cumulative Q.

    Scale shape: residuals via broadcast DOW means; ONE lag-exploded
    self-join on the bounded date grid covers all 7 lags (the per-lag
    join loop compiled to 52 exchanges of pure job overhead — the
    exploded form is 7 rows per residual day, one shuffle-hash join, one
    keyed aggregation); the Q rollup is 7 rows."""
    o = _t(spark, sf_dir, "orders")
    # half-safe: the true daily sum of 2-decimal money is ON the cent
    # grid, so round(,2) re-snaps each engine's float sum to the SAME
    # grid double; _rev's mean is an undisplayed intermediate and the
    # rho/Q displays are continuous residual ratios (their own waivers).
    daily = o.groupBy(F.to_date("o_orderdate").alias("_day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("_rev")
    )
    dow = daily.groupBy(F.dayofweek("_day").alias("_dw")).agg(
        F.avg("_rev").alias("_sm")
    )
    resid = (
        daily.select(F.dayofweek("_day").alias("_dw"), "_day", "_rev")
        .join(F.broadcast(dow), "_dw")
        .select("_day", (F.col("_rev") - F.col("_sm")).alias("_r"))
    )
    mu = resid.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("_r").alias("_mu")
    )
    base = (
        resid.crossJoin(F.broadcast(mu))
        .agg(
            F.max("_n").alias("_n"),
            F.max("_mu").alias("_mu"),
            F.sum(
                (F.col("_r") - F.col("_mu")) * (F.col("_r") - F.col("_mu"))
            ).alias("_ss"),
        )
    )
    shifted = resid.select(
        F.col("_r").alias("_rl"),
        F.explode(F.array(*[F.lit(k) for k in range(1, 8)])).alias("lag"),
        F.col("_day").alias("_d0"),
    ).select(F.date_add("_d0", F.col("lag")).alias("_day"), "_rl", "lag")
    terms = (
        resid.join(shifted.hint("shuffle_hash"), "_day")
        .crossJoin(F.broadcast(base))
        .groupBy("lag")
        .agg(
            F.max("_n").alias("_n"),
            (
                F.sum(
                    (F.col("_r") - F.col("_mu"))
                    * (F.col("_rl") - F.col("_mu"))
                )
                / F.max("_ss")
            ).alias("_rho"),
        )
        .select(
            "lag",
            "_n",
            F.round("_rho", 6).alias("autocorr"),
            (
                F.col("_rho") * F.col("_rho") / (F.col("_n") - F.col("lag"))
            ).alias("_term"),
        )
    )
    w = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    return terms.select(
        "lag",
        "autocorr",
        F.round(
            F.col("_n") * (F.col("_n") + 2) * F.sum("_term").over(w), 6
        ).alias("ljung_box_q"),
    )


def q369_pinball_quantile_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-forecast backtest [EXT]: forecast each event type's daily
    count quantiles (τ = 0.5, 0.9) from the TRAIN period's day-of-week
    empirical quantiles, score the final week with pinball loss
    L_τ(y, ŷ) = max(τ(y−ŷ), (τ−1)(y−ŷ)) — the proper scoring rule for
    quantile forecasts that q287's point-error metrics can't grade.

    Scale shape: train quantiles via one exact-percentile agg per
    (type, dow) — a bounded 35-row model table broadcast into the
    holdout; the loss rollup is per (type, τ)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("_day")
    ).agg(F.count(F.lit(1)).alias("_n"))
    split = F.lit("2024-01-25").cast("date")
    train = daily.filter(F.col("_day") < split)
    test = daily.filter(F.col("_day") >= split)
    model = train.groupBy(
        "event_type", F.dayofweek("_day").alias("_dw")
    ).agg(
        F.expr("percentile(_n, 0.5)").alias("_q50"),
        F.expr("percentile(_n, 0.9)").alias("_q90"),
    )
    scored = (
        test.select("event_type", F.dayofweek("_day").alias("_dw"), "_n")
        .join(F.broadcast(model), ["event_type", "_dw"])
        .select(
            "event_type",
            "_n",
            F.explode(
                F.array(
                    F.struct(
                        F.lit(0.5).alias("tau"), F.col("_q50").alias("yhat")
                    ),
                    F.struct(
                        F.lit(0.9).alias("tau"), F.col("_q90").alias("yhat")
                    ),
                )
            ).alias("_f"),
        )
        .select(
            "event_type",
            F.col("_f.tau").alias("tau"),
            F.greatest(
                F.col("_f.tau") * (F.col("_n") - F.col("_f.yhat")),
                (F.col("_f.tau") - 1) * (F.col("_n") - F.col("_f.yhat")),
            ).alias("_loss"),
            (F.col("_n") <= F.col("_f.yhat")).cast("long").alias("_cov"),
        )
    )
    return scored.groupBy("event_type", "tau").agg(
        F.count(F.lit(1)).alias("n_days"),
        # pinball losses sit on the exact 1/100 grid (tau in {.5,.9} times
        # interpolated-percentile residuals on the 1/10 or 1/2 grid), so
        # round(loss*100) recovers an exact integer numerator
        _half_up(F.sum(_fixed("_loss", 100)), F.count(F.lit(1)) * 100, 6).alias("mean_pinball_loss"),
        _half_up(F.sum("_cov"), F.count(F.lit(1)), 6).alias("empirical_coverage"),
    )


def q370_ranker_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranker agreement audit [EXT]: for each head item, Kendall's τ
    between its CF-similarity ranking (q331) and plain popularity ranking
    over the same candidate set — τ near 1 means the expensive CF table
    is just popularity in disguise (and q365's novelty will be low); the
    sanity check before shipping a second ranker.

    Scale shape: the candidate lists are the bounded top-20×top-10
    slices; pair enumeration for τ runs inside each head item's ≤10-row
    list (self-join on the head key)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n_i = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("_n"))
    b = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("_pb")
    )
    top_items = (
        n_i.orderBy(F.col("_n").desc(), "l_partkey")
        .limit(10)
        .select(F.col("l_partkey").alias("item_a"), F.col("_n").alias("_na"))
    )
    # r13 (guide §3.2/§2.3): head restriction pushed below the co-occurrence
    # self-join — counts are per-pair, so restricting the LEFT side to the
    # k=10 head items is exact (q331's rewrite, same rationale/comment).
    co = (
        li.join(
            F.broadcast(top_items.select(F.col("item_a").alias("l_partkey"))),
            "l_partkey",
        )
        .join(
            b,
            (F.col("l_orderkey") == F.col("_ok"))
            & (F.col("l_partkey") != F.col("_pb")),
        )
        .groupBy(F.col("l_partkey").alias("item_a"), F.col("_pb").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("_co"))
    )
    cand = (
        co.join(F.broadcast(top_items), "item_a")
        .join(
            n_i.select(F.col("l_partkey").alias("item_b"),
                       F.col("_n").alias("_nb")),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            F.round(
                F.col("_co") / F.sqrt(F.col("_na") * F.col("_nb")), 9
            ).alias("_sim"),
            "_nb",
        )
    )
    wr = Window.partitionBy("item_a").orderBy(F.col("_sim").desc(), "item_b")
    top10 = cand.withColumn("_r", F.row_number().over(wr)).filter(
        F.col("_r") <= 10
    )
    p = top10.select("item_a", F.col("item_b").alias("_ib1"),
                     F.col("_sim").alias("_s1"), F.col("_nb").alias("_p1"))
    q = top10.select("item_a", F.col("item_b").alias("_ib2"),
                     F.col("_sim").alias("_s2"), F.col("_nb").alias("_p2"))
    pairs = p.join(q.hint("shuffle_hash"), "item_a").filter(
        F.col("_ib1") < F.col("_ib2")
    )
    sgn = F.signum(F.col("_s1") - F.col("_s2")) * F.signum(
        (F.col("_p1") - F.col("_p2")).cast("double")
    )
    return (
        pairs.groupBy("item_a")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            half_up(F.sum(sgn) / F.count(F.lit(1)), 6).alias(
                "kendall_tau_sim_vs_popularity"
            ),
        )
    )


def q371_bloom_size_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter sizing planner [EXT]: for the join keys a semijoin
    pushdown would filter (q275 measures the FPR of one configuration),
    the textbook m = −n·ln(p)/(ln 2)² bits and k = (m/n)·ln 2 hashes for
    target FPRs {1%, 0.1%} against each key's MEASURED NDV — the sizing
    table a planner consults before emitting a runtime filter.

    Scale shape: one exact-NDV aggregation per key column; the sizing
    sweep is constant arithmetic over a 3×2 grid."""
    import math

    keys = [
        ("lineitem", "l_partkey"),
        ("lineitem", "l_suppkey"),
        ("orders", "o_custkey"),
    ]
    ln2sq = math.log(2) ** 2
    outs = []
    for tbl, col in keys:
        t = _t(spark, sf_dir, tbl)
        ndv = t.agg(F.countDistinct(col).alias("ndv"))
        for fpr in (0.01, 0.001):
            bits_per_key = -math.log(fpr) / ln2sq
            outs.append(
                ndv.select(
                    F.lit(f"{tbl}.{col}").alias("key"),
                    "ndv",
                    F.lit(fpr).alias("target_fpr"),
                    F.ceil(F.col("ndv") * F.lit(bits_per_key)).alias(
                        "filter_bits"
                    ),
                    F.lit(round(bits_per_key * math.log(2), 2)).alias(
                        "n_hashes"
                    ),
                    half_up(
                        F.col("ndv") * F.lit(bits_per_key) / 8 / 1024.0, 2
                    ).alias("filter_kib"),
                )
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def q372_erasure_impact_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure impact audit [EXT]: if the 1% most active users
    requested deletion, how much of the event lake gets rewritten under a
    daily-partitioned layout — rows removed, days (partitions) touched,
    and the rewrite amplification (partition rows rewritten per row
    actually deleted) — the privacy-ops capacity number behind GDPR/CCPA
    erasure SLAs (pairs with q349's layout planner).

    Scale shape: per-user activity rollup, exact-percentile cutoff
    (1-row broadcast), then two keyed aggregations over flagged rows."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("_n"))
    cut = per_user.agg(F.expr("percentile(_n, 0.99)").alias("_p99"))
    heavy = (
        per_user.crossJoin(F.broadcast(cut))
        .filter(F.col("_n") > F.col("_p99"))
        .select("user_id")
    )
    flagged = ev.join(
        F.broadcast(heavy.withColumn("_del", F.lit(1))), "user_id", "left"
    ).select(
        F.to_date("ts").alias("_day"),
        F.coalesce(F.col("_del"), F.lit(0)).alias("_del"),
    )
    per_day = flagged.groupBy("_day").agg(
        F.count(F.lit(1)).alias("_rows"),
        F.sum("_del").alias("_del_rows"),
    )
    return per_day.agg(
        F.sum("_del_rows").alias("rows_deleted"),
        F.sum(F.when(F.col("_del_rows") > 0, 1).otherwise(0)).alias(
            "partitions_touched"
        ),
        F.count(F.lit(1)).alias("partitions_total"),
        F.sum(
            F.when(F.col("_del_rows") > 0, F.col("_rows")).otherwise(0)
        ).alias("rows_rewritten"),
        # the >p99 cutoff can select ZERO users (p99 == max on sparse /
        # low-cardinality activity): no deletions -> amplification is
        # undefined, NULL — guarded so ANSI never divides by zero
        F.when(
            F.sum("_del_rows") > 0,
            half_up(
                F.sum(
                    F.when(F.col("_del_rows") > 0, F.col("_rows")).otherwise(0)
                )
                / F.sum("_del_rows").cast("double"),
                6,
            ),
        ).alias("rewrite_amplification"),
    )


def q373_price_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price index triple [EXT]: Laspeyres (base-period quantity
    weights), Paasche (current weights), and Fisher (geometric mean)
    indices of per-part unit prices between the first and second half of
    the order history — the econ-style price-level read that a plain avg
    price confounds with mix shift (q180's bridge decomposes revenue;
    this isolates price).

    Scale shape: two conditional aggregations per part, one inner join
    on the bounded part dimension, 1-row index arithmetic."""
    li = _t(spark, sf_dir, "lineitem")
    cut = F.lit("1998-01-01").cast("timestamp_ntz")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.when(F.col("l_shipdate") < cut, F.col("l_quantity"))).alias(
            "_q0"
        ),
        F.sum(
            F.when(F.col("l_shipdate") < cut, F.col("l_extendedprice"))
        ).alias("_v0"),
        F.sum(
            F.when(F.col("l_shipdate") >= cut, F.col("l_quantity"))
        ).alias("_q1"),
        F.sum(
            F.when(F.col("l_shipdate") >= cut, F.col("l_extendedprice"))
        ).alias("_v1"),
    ).filter(
        F.col("_q0").isNotNull()
        & F.col("_q1").isNotNull()
        & (F.col("_q0") > 0)
        & (F.col("_q1") > 0)
    )
    priced = per_part.select(
        (F.col("_v0") / F.col("_q0")).alias("_p0"),
        (F.col("_v1") / F.col("_q1")).alias("_p1"),
        "_q0",
        "_q1",
    )
    agg = priced.agg(
        F.count(F.lit(1)).alias("n_parts"),
        (F.sum(F.col("_p1") * F.col("_q0"))
         / F.sum(F.col("_p0") * F.col("_q0"))).alias("_lasp"),
        (F.sum(F.col("_p1") * F.col("_q1"))
         / F.sum(F.col("_p0") * F.col("_q1"))).alias("_paas"),
    )
    return agg.select(
        "n_parts",
        F.round("_lasp", 6).alias("laspeyres"),
        F.round("_paas", 6).alias("paasche"),
        F.round(F.sqrt(F.col("_lasp") * F.col("_paas")), 6).alias("fisher"),
    )


def q374_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak session concurrency per day [EXT]: the classic +1/−1 sweep —
    sessions (30-min-gap, q50 semantics) emit a +1 at start and −1 at
    end, and the running sum over each day's ordered boundary stream is
    the live-session count; its max is the capacity number an SRE sizes
    for (q329's dispersion says arrivals are bursty; this says how high
    the bursts stack).

    Scale shape: sessionization is the standard lag/flag/sum windows per
    user; the sweep's running sum partitions by DAY (calendar-bounded
    partitions, each a within-day boundary stream)."""
    from hubverse_transform_spark.operators.sessions import _epoch_seconds

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        _epoch_seconds(F.col("ts")).alias("_t"),
        F.when(
            F.lag(_epoch_seconds(F.col("ts"))).over(w).isNull()
            | (
                _epoch_seconds(F.col("ts"))
                - F.lag(_epoch_seconds(F.col("ts"))).over(w)
                >= 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("_new"),
    )
    ws = Window.partitionBy("user_id").orderBy("_t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessions = (
        flagged.withColumn("_sid", F.sum("_new").over(ws))
        .groupBy("user_id", "_sid")
        .agg(F.min("_t").alias("_start"), F.max("_t").alias("_end"))
    )
    boundaries = sessions.select(
        F.col("_start").alias("_t"), F.lit(1).alias("_d")
    ).unionByName(
        # end bound +1s so zero-length sessions still count at their instant
        sessions.select((F.col("_end") + 1).alias("_t"), F.lit(-1).alias("_d"))
    )
    wd = (
        Window.partitionBy("_day")
        .orderBy("_t", F.col("_d").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = boundaries.select(
        F.to_date(F.timestamp_seconds("_t")).alias("_day"), "_t", "_d"
    ).select("_day", F.sum("_d").over(wd).alias("_live"))
    return swept.groupBy(
        F.date_format("_day", "yyyy-MM-dd").alias("day")
    ).agg(F.max("_live").alias("peak_concurrent_sessions"))


def q375_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table financial reconciliation [EXT]: o_totalprice vs the
    lineitem-derived total Σ extendedprice·(1−discount)·(1+tax) per
    order — the books-balance audit every warehouse runs between a
    header table and its detail table. Reports the mismatch-rate
    histogram (relative error buckets) rather than pretending the
    numbers tie.

    Scale shape: one lineitem rollup, one key join to orders, bucket
    rollup — nothing wider than the fact scan."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    derived = li.groupBy("l_orderkey").agg(
        F.sum(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
        ).alias("_derived")
    )
    joined = o.join(
        derived.hint("shuffle_hash"),
        o.o_orderkey == derived.l_orderkey,
        "left",
    ).select(
        "o_totalprice",
        F.coalesce(F.col("_derived"), F.lit(0.0)).alias("_derived"),
    )
    rel = F.abs(F.col("_derived") - F.col("o_totalprice")) / F.col(
        "o_totalprice"
    )
    bucket = (
        F.when(rel < 0.0001, "exact_1e-4")
        .when(rel < 0.01, "lt_1pct")
        .when(rel < 0.10, "lt_10pct")
        .otherwise("gte_10pct")
    )
    tot = o.count()
    return (
        joined.groupBy(bucket.alias("mismatch_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # half-safe: rel is a mean of per-order rationals with
            # heterogeneous denominators (order totals); a d=6 half
            # boundary needs the reduced sum denominator = 2*10^6*odd —
            # measure-zero, covered by the multi-seed campaign
            F.round(F.avg(rel), 6).alias("avg_rel_error"),
        )
        .select(
            "mismatch_bucket",
            "n_orders",
            _half_up(F.col("n_orders"), F.lit(tot), 6).alias("share"),
            "avg_rel_error",
        )
    )


def q376_entry_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry-event bounce rate [EXT]: per session ENTRY event type, the
    share of sessions that end after that single event — the landing-
    surface quality read (q178's click abandonment is one cell of this
    table; q50 builds the same sessions).

    Scale shape: sessionization windows per user, then a (session →
    first type, size) collapse and a 5-row rollup."""
    from hubverse_transform_spark.operators.sessions import _epoch_seconds

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag(_epoch_seconds(F.col("ts"))).over(w).isNull()
            | (
                _epoch_seconds(F.col("ts"))
                - F.lag(_epoch_seconds(F.col("ts"))).over(w)
                >= 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("_new"),
    )
    ws = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = flagged.withColumn("_sid", F.sum("_new").over(ws))
    per_session = sess.groupBy("user_id", "_sid").agg(
        F.min_by("event_type", F.struct("ts", "event_id")).alias(
            "entry_type"
        ),
        F.count(F.lit(1)).alias("_len"),
    )
    return per_session.groupBy("entry_type").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        _half_up(
            F.sum((F.col("_len") == 1).cast("long")), F.count(F.lit(1)), 6
        ).alias("bounce_rate"),
        _half_up(F.sum("_len"), F.count(F.lit(1)), 6).alias("avg_session_events"),
    )


def q377_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture population estimate [EXT]: two independent
    deterministic hash 'captures' of the user space (disjoint md5
    criteria, ~20% each) yield the Lincoln-Petersen estimate
    N̂ = n1·n2/m from their overlap — the mark-recapture trick for
    estimating a population you can't scan twice, audited against the
    true distinct count (the estimator q38's HLL replaces at scale;
    this one needs only two cheap membership predicates).

    Scale shape: one distinct-user pass with two hash predicates; the
    estimate is 1-row arithmetic."""
    ev = _t(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    h1 = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("c1|"),
                                       F.col("user_id").cast("string"))),
                        1, 8),
            16,
            10,
        ).cast("long")
        % 100
        < 20
    )
    h2 = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("c2|"),
                                       F.col("user_id").cast("string"))),
                        1, 8),
            16,
            10,
        ).cast("long")
        % 100
        < 20
    )
    marked = users.select(
        h1.cast("int").alias("_c1"), h2.cast("int").alias("_c2")
    )
    return marked.agg(
        F.count(F.lit(1)).alias("true_population"),
        F.sum("_c1").alias("n_capture1"),
        F.sum("_c2").alias("n_capture2"),
        F.sum(F.col("_c1") * F.col("_c2")).alias("n_recaptured"),
        # zero recaptures -> the Lincoln-Petersen estimate is undefined:
        # report NULL instead of dividing by zero (CASE short-circuits, so
        # ANSI mode never evaluates the division; unguarded this crashed
        # at sf0.001, where the two 20% captures genuinely miss each other)
        F.when(
            F.sum(F.col("_c1") * F.col("_c2")) > 0,
            half_up(
                F.sum("_c1")
                * F.sum("_c2")
                / F.sum(F.col("_c1") * F.col("_c2")).cast("double"),
                2,
            ),
        ).alias("lincoln_petersen_estimate"),
    )


def q378_asof_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of feature matrix generation [EXT]: per user, trailing 7/14/28-
    day activity counts and purchase value AS OF a training cutoff
    (2024-01-25), with the post-cutoff purchase flag as the label — the
    point-in-time-correct feature/label build every churn/propensity
    model needs (leakage-free by construction: features read strictly
    before the cutoff, the label strictly after; q300 materializes such
    features, q124 audits the leakage this avoids). Output is the
    aggregated feature-space census (label × activity-band counts), not
    the matrix itself.

    Scale shape: one pass of conditional aggregations per user (each
    trailing window is a CASE bound, no self-joins), then a bounded
    census rollup."""
    ev = _t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-25").cast("timestamp_ntz")
    day = lambda n: F.lit(f"2024-01-{25 - n:02d}").cast("timestamp_ntz")  # noqa: E731
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when((F.col("ts") >= day(7)) & (F.col("ts") < cutoff), 1)
            .otherwise(0)
        ).alias("_n7"),
        F.sum(
            F.when((F.col("ts") >= day(14)) & (F.col("ts") < cutoff), 1)
            .otherwise(0)
        ).alias("_n14"),
        F.sum(F.when(F.col("ts") < cutoff, 1).otherwise(0)).alias("_n_all"),
        F.round(
            F.sum(
                F.when(
                    (F.col("ts") >= day(7))
                    & (F.col("ts") < cutoff)
                    & (F.col("event_type") == "purchase"),
                    F.col("value"),
                ).otherwise(0.0)
            ),
            2,
        ).alias("_v7"),
        F.max(
            F.when(
                (F.col("ts") >= cutoff)
                & (F.col("event_type") == "purchase"),
                1,
            ).otherwise(0)
        ).alias("label"),
    )
    band = (
        F.when(F.col("_n7") == 0, "inactive_7d")
        .when(F.col("_n7") < 5, "low")
        .when(F.col("_n7") < 15, "mid")
        .otherwise("high")
    )
    return per_user.groupBy("label", band.alias("activity_band")).agg(
        F.count(F.lit(1)).alias("n_users"),
        _half_up(F.sum("_n14"), F.count(F.lit(1)), 6).alias("avg_n14"),
        # _v7 is a per-user round(.,2) output — exact cent grid
        _half_up(F.sum(_fixed("_v7", 100)), F.count(F.lit(1)) * 100, 6).alias("avg_purchase_value_7d"),
    )


# =============================================================================
# Driver contract
# =============================================================================


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q01_pricing_summary(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_summary": q01_pricing_summary,
        "q02_revenue_by_region": q02_revenue_by_region,
        "q03_top_orders": q03_top_orders,
        "q04_priority_semijoin": q04_priority_semijoin,
        "q05_customers_no_orders": q05_customers_no_orders,
        "q06_revenue_filter": q06_revenue_filter,
        "q07_topk_parts_per_brand": q07_topk_parts_per_brand,
        "q08_setops_nations": q08_setops_nations,
        "q09_rollup_lineitem": q09_rollup_lineitem,
        "q10_distinct_customers": q10_distinct_customers,
        "q11_events_daily": q11_events_daily,
        "q12_events_json": q12_events_json,
        "q13_part_type_stats": q13_part_type_stats,
        "q14_asof_click_purchase": q14_asof_click_purchase,
        "q15_acctbal_above_nation_avg": q15_acctbal_above_nation_avg,
        "q16_cube_orders": q16_cube_orders,
        "q17_running_totals": q17_running_totals,
        "q18_range_join_bands": q18_range_join_bands,
        "q19_disjunctive_pred_join": q19_disjunctive_pred_join,
        "q20_exact_dedup": q20_exact_dedup,
        "q21_ngram_jaccard_pairs": q21_ngram_jaccard_pairs,
        "q22_minhash_signatures": q22_minhash_signatures,
        "q23_minhash_lsh_pairs": q23_minhash_lsh_pairs,
        "q24_cosine_topk": q24_cosine_topk,
        "q25_embedding_neardup": q25_embedding_neardup,
        "q26_text_quality_by_lang": q26_text_quality_by_lang,
        "q27_lang_guess_counts": q27_lang_guess_counts,
        "q28_fingerprint_dedup": q28_fingerprint_dedup,
        "q29_tumbling_windows": q29_tumbling_windows,
        "q30_sliding_windows": q30_sliding_windows,
        "q31_session_counts": q31_session_counts,
        "q32_binary_bytes_by_source": q32_binary_bytes_by_source,
        "q33_simhash_fingerprints": q33_simhash_fingerprints,
        "q34_token_counts": q34_token_counts,
        "q35_chargram_fingerprint": q35_chargram_fingerprint,
        "q36_lsh_cosine_topk": q36_lsh_cosine_topk,
        "q37_simhash_neardup": q37_simhash_neardup,
        "q38_approx_distinct_users": q38_approx_distinct_users,
        "q39_pivot_linestatus": q39_pivot_linestatus,
        "q40_quantiles": q40_quantiles,
        "q41_corr_stats": q41_corr_stats,
        "q42_multimodal_features": q42_multimodal_features,
        "q43_embedding_component_stats": q43_embedding_component_stats,
        "q44_frame_sample_counts": q44_frame_sample_counts,
        "q45_dedup_clusters": q45_dedup_clusters,
        "q46_winnowing_fingerprints": q46_winnowing_fingerprints,
        "q47_winnow_overlap_pairs": q47_winnow_overlap_pairs,
        "q48_ivf_cosine_topk": q48_ivf_cosine_topk,
        "q49_curation_funnel": q49_curation_funnel,
        "q50_session_durations": q50_session_durations,
        "q51_stratified_sample": q51_stratified_sample,
        "q52_tfidf_top_terms": q52_tfidf_top_terms,
        "q53_lone_late_supplier": q53_lone_late_supplier,
        "q54_full_outer_reconcile": q54_full_outer_reconcile,
        "q55_extreme_customer_per_nation": q55_extreme_customer_per_nation,
        "q56_moving_avg_range_frame": q56_moving_avg_range_frame,
        "q57_grouping_sets": q57_grouping_sets,
        "q58_chunked_docs": q58_chunked_docs,
        "q59_sql_scalar_subquery": q59_sql_scalar_subquery,
        "q60_distribution_windows": q60_distribution_windows,
        "q61_schema_evolution_union": q61_schema_evolution_union,
        "q62_repetition_scores": q62_repetition_scores,
        "q63_date_spine_densify": q63_date_spine_densify,
        "q64_unpivot_part_metrics": q64_unpivot_part_metrics,
        "q65_kmeans_update_step": q65_kmeans_update_step,
        "q66_order_count_distribution": q66_order_count_distribution,
        "q67_small_quantity_revenue": q67_small_quantity_revenue,
        "q68_rich_inactive_customers": q68_rich_inactive_customers,
        "q69_excess_inventory_shippers": q69_excess_inventory_shippers,
        "q70_bm25_search": q70_bm25_search,
        "q71_pmi_collocations": q71_pmi_collocations,
        "q72_part_pagerank": q72_part_pagerank,
        "q73_correlated_avg_subquery": q73_correlated_avg_subquery,
        "q74_variant_props": q74_variant_props,
        "q75_quality_gate": q75_quality_gate,
        "q76_binational_volume": q76_binational_volume,
        "q77_market_share": q77_market_share,
        "q78_frame_navigation": q78_frame_navigation,
        "q79_vector_hof_stats": q79_vector_hof_stats,
        "q80_event_funnel": q80_event_funnel,
        "q81_trimmed_mean_prices": q81_trimmed_mean_prices,
        "q82_fuzzy_name_pairs": q82_fuzzy_name_pairs,
        "q83_profile_orders": q83_profile_orders,
        "q84_snapshot_diff": q84_snapshot_diff,
        "q85_lateral_top_line": q85_lateral_top_line,
        "q86_multiset_setops": q86_multiset_setops,
        "q87_null_safe_join": q87_null_safe_join,
        "q88_revenue_share": q88_revenue_share,
        "q89_returned_item_customers": q89_returned_item_customers,
        "q90_shipmode_priority": q90_shipmode_priority,
        "q91_local_supplier_volume": q91_local_supplier_volume,
        "q92_try_arithmetic": q92_try_arithmetic,
        "q93_decimal_exact_revenue": q93_decimal_exact_revenue,
        "q94_status_count_map": q94_status_count_map,
        "q95_top_customer_roster": q95_top_customer_roster,
        "q96_array_set_ops": q96_array_set_ops,
        "q97_temporal_functions": q97_temporal_functions,
        "q98_forward_fill": q98_forward_fill,
        "q99_mad_outliers": q99_mad_outliers,
        "q100_cohort_retention": q100_cohort_retention,
        "q101_dataset_split": q101_dataset_split,
        "q102_decontamination": q102_decontamination,
        "q103_weighted_allocation": q103_weighted_allocation,
        "q104_semantic_dedup": q104_semantic_dedup,
        "q105_fk_audit": q105_fk_audit,
        "q106_price_histogram": q106_price_histogram,
        "q107_scd2_priority_history": q107_scd2_priority_history,
        "q108_embedding_quantization": q108_embedding_quantization,
        "q109_hll_union_users": q109_hll_union_users,
        "q110_binned_range_join": q110_binned_range_join,
        "q111_promo_revenue_share": q111_promo_revenue_share,
        "q112_top_supplier": q112_top_supplier,
        "q113_big_orders": q113_big_orders,
        "q114_unigram_logprob": q114_unigram_logprob,
        "q115_sequence_packing": q115_sequence_packing,
        "q116_key_skew_profile": q116_key_skew_profile,
        "q117_mom_revenue_growth": q117_mom_revenue_growth,
        "q118_status_transitions": q118_status_transitions,
        "q119_copurchase_lift": q119_copurchase_lift,
        "q120_lsh_multitable_topk": q120_lsh_multitable_topk,
        "q121_dup_ngram_fraction": q121_dup_ngram_fraction,
        "q122_gopher_quality_rules": q122_gopher_quality_rules,
        "q123_top_bigrams_per_lang": q123_top_bigrams_per_lang,
        "q124_split_leakage": q124_split_leakage,
        "q125_price_moments": q125_price_moments,
        "q126_chunk_dedup": q126_chunk_dedup,
        "q127_perplexity_buckets": q127_perplexity_buckets,
        "q128_domain_caps": q128_domain_caps,
        "q129_token_budget_mix": q129_token_budget_mix,
        "q130_product_profit": q130_product_profit,
        "q131_pq_recon_error": q131_pq_recon_error,
        "q132_pq_adc_topk": q132_pq_adc_topk,
        "q133_partition_completeness": q133_partition_completeness,
        "q134_part_supplier_stats": q134_part_supplier_stats,
        "q135_cumulative_distinct_users": q135_cumulative_distinct_users,
        "q136_weighted_median": q136_weighted_median,
        "q137_brand_triangles": q137_brand_triangles,
        "q138_split_drift": q138_split_drift,
        "q139_winsorized_stats": q139_winsorized_stats,
        "q140_grouping_sets": q140_grouping_sets,
        "q141_merged_intervals": q141_merged_intervals,
        "q142_brand_mode_type": q142_brand_mode_type,
        "q143_event_entropy": q143_event_entropy,
        "q144_revenue_trend": q144_revenue_trend,
        "q145_attribution": q145_attribution,
        "q146_rolling_7d_users": q146_rolling_7d_users,
        "q147_interpolate_gaps": q147_interpolate_gaps,
        "q148_price_position": q148_price_position,
        "q149_consensus_pairs": q149_consensus_pairs,
        "q150_recursive_reach": q150_recursive_reach,
        "q151_quality_model": q151_quality_model,
        "q152_random_projection": q152_random_projection,
        "q153_notin_null_semantics": q153_notin_null_semantics,
        "q154_event_anomaly_zscore": q154_event_anomaly_zscore,
        "q155_lang_margin": q155_lang_margin,
        "q156_merge_changeset": q156_merge_changeset,
        "q157_packing_capacity_sweep": q157_packing_capacity_sweep,
        "q158_prefix_filter_jaccard": q158_prefix_filter_jaccard,
        "q159_embedding_covariance": q159_embedding_covariance,
        "q160_mahalanobis_outliers": q160_mahalanobis_outliers,
        "q161_ivf_list_balance": q161_ivf_list_balance,
        "q162_bitmap_distinct_users": q162_bitmap_distinct_users,
        "q163_interval_join_batch_twin": q163_interval_join_batch_twin,
        "q164_events_since_purchase": q164_events_since_purchase,
        "q165_zipf_slope": q165_zipf_slope,
        "q166_vocab_overlap": q166_vocab_overlap,
        "q167_two_stage_rerank": q167_two_stage_rerank,
        "q168_salted_agg_equivalence": q168_salted_agg_equivalence,
        "q169_dominant_component": q169_dominant_component,
        "q170_quantile_binning": q170_quantile_binning,
        "q171_weekly_churn": q171_weekly_churn,
        "q172_decayed_engagement": q172_decayed_engagement,
        "q173_capped_running_balance": q173_capped_running_balance,
        "q174_top_session_paths": q174_top_session_paths,
        "q175_ivf_recall_audit": q175_ivf_recall_audit,
        "q176_above_nation_p90": q176_above_nation_p90,
        "q177_token_concentration": q177_token_concentration,
        "q178_click_abandonment": q178_click_abandonment,
        "q179_value_range_frame": q179_value_range_frame,
        "q180_revenue_bridge": q180_revenue_bridge,
        "q181_weighted_sample": q181_weighted_sample,
        "q182_rank_with_ties": q182_rank_with_ties,
        "q183_filtered_aggregates": q183_filtered_aggregates,
        "q184_tokenizer_fertility": q184_tokenizer_fertility,
        "q185_trigram_search": q185_trigram_search,
        "q186_pareto_skyline": q186_pareto_skyline,
        "q187_struct_in_subquery": q187_struct_in_subquery,
        "q188_minhash_estimate_error": q188_minhash_estimate_error,
        "q189_nearest_event_join": q189_nearest_event_join,
        "q190_largest_remainder": q190_largest_remainder,
        "q191_width_bucket_histogram": q191_width_bucket_histogram,
        "q192_psi_drift": q192_psi_drift,
        "q193_degree_distribution": q193_degree_distribution,
        "q194_star_components": q194_star_components,
        "q195_power_iteration_pca": q195_power_iteration_pca,
        "q196_hierarchy_share": q196_hierarchy_share,
        "q197_longest_streak": q197_longest_streak,
        "q198_cluster_survivorship": q198_cluster_survivorship,
        "q199_dedup_method_yield": q199_dedup_method_yield,
        "q200_catalog_rowcounts": q200_catalog_rowcounts,
        "q201_window_aligned_conversion": q201_window_aligned_conversion,
        "q202_cluster_size_distribution": q202_cluster_size_distribution,
        "q203_banding_sensitivity": q203_banding_sensitivity,
        "q204_pareto_concentration": q204_pareto_concentration,
        "q205_null_aggregate_semantics": q205_null_aggregate_semantics,
        "q206_group_quantiles_scalable": q206_group_quantiles_scalable,
        "q207_approx_decile_audit": q207_approx_decile_audit,
        "q208_rag_chunking": q208_rag_chunking,
        "q209_mixture_weights": q209_mixture_weights,
        "q210_ngram_decontamination": q210_ngram_decontamination,
        "q211_centroid_confusion": q211_centroid_confusion,
        "q212_containment_pairs": q212_containment_pairs,
        "q213_spearman_length_ttr": q213_spearman_length_ttr,
        "q214_ks_drift": q214_ks_drift,
        "q215_vocab_gini": q215_vocab_gini,
        "q216_pii_redaction_audit": q216_pii_redaction_audit,
        "q217_shard_assignment": q217_shard_assignment,
        "q218_embedding_outliers": q218_embedding_outliers,
        "q219_dsir_importance": q219_dsir_importance,
        "q220_scalable_row_number": q220_scalable_row_number,
        "q221_decayed_engagement": q221_decayed_engagement,
        "q222_brand_price_regression": q222_brand_price_regression,
        "q223_symspell_name_pairs": q223_symspell_name_pairs,
        "q224_segment_nation_mi": q224_segment_nation_mi,
        "q225_benford_audit": q225_benford_audit,
        "q226_event_transition_matrix": q226_event_transition_matrix,
        "q227_heavy_hitter_tokens": q227_heavy_hitter_tokens,
        "q228_incremental_lsh_dedup": q228_incremental_lsh_dedup,
        "q229_logreg_gradient": q229_logreg_gradient,
        "q230_welch_ab_test": q230_welch_ab_test,
        "q231_twap_by_type": q231_twap_by_type,
        "q232_cusum_changepoint": q232_cusum_changepoint,
        "q233_feature_hashing": q233_feature_hashing,
        "q234_roc_auc_daily": q234_roc_auc_daily,
        "q235_calibration_ece": q235_calibration_ece,
        "q236_bfs_reach": q236_bfs_reach,
        "q237_kaplan_meier": q237_kaplan_meier,
        "q238_acf_daily_orders": q238_acf_daily_orders,
        "q239_qq_decile_drift": q239_qq_decile_drift,
        "q240_neyman_allocation": q240_neyman_allocation,
        "q241_seasonal_dow_index": q241_seasonal_dow_index,
        "q242_robust_trend": q242_robust_trend,
        "q243_best_split_stump": q243_best_split_stump,
        "q244_gain_lift_table": q244_gain_lift_table,
        "q245_fellegi_sunter": q245_fellegi_sunter,
        "q246_conformal_intervals": q246_conformal_intervals,
        "q247_simpson_audit": q247_simpson_audit,
        "q248_graph_modularity": q248_graph_modularity,
        "q249_kcore_peel": q249_kcore_peel,
        "q250_backtest_folds": q250_backtest_folds,
        "q251_hits_bipartite": q251_hits_bipartite,
        "q252_label_propagation": q252_label_propagation,
        "q253_degree_assortativity": q253_degree_assortativity,
        "q254_readability_proxy": q254_readability_proxy,
        "q255_doc_token_entropy": q255_doc_token_entropy,
        "q256_classifier_eval": q256_classifier_eval,
        "q257_time_to_conversion": q257_time_to_conversion,
        "q258_burstiness": q258_burstiness,
        "q259_feature_ig_ranking": q259_feature_ig_ranking,
        "q260_negative_sampling": q260_negative_sampling,
        "q261_map_hof_token_stats": q261_map_hof_token_stats,
        "q262_file_provenance": q262_file_provenance,
        "q263_table_checksums": q263_table_checksums,
        "q264_referential_integrity": q264_referential_integrity,
        "q265_bpe_pair_counts": q265_bpe_pair_counts,
        "q266_poisson_bootstrap_ci": q266_poisson_bootstrap_ci,
        "q267_adamic_adar": q267_adamic_adar,
        "q268_zorder_pruning_audit": q268_zorder_pruning_audit,
        "q269_nb_token_logodds": q269_nb_token_logodds,
        "q270_rrf_fusion": q270_rrf_fusion,
        "q271_ndcg_mrr": q271_ndcg_mrr,
        "q272_holt_linear": q272_holt_linear,
        "q273_ann_knn_eval": q273_ann_knn_eval,
        "q274_cdc_chunking": q274_cdc_chunking,
        "q275_bloom_semijoin_audit": q275_bloom_semijoin_audit,
        "q276_watermark_lateness_audit": q276_watermark_lateness_audit,
        "q277_ucb1_arm_scores": q277_ucb1_arm_scores,
        "q278_diff_in_diff": q278_diff_in_diff,
        "q279_sparse_cosine_pairs": q279_sparse_cosine_pairs,
        "q280_rfm_segments": q280_rfm_segments,
        "q281_column_stats_collection": q281_column_stats_collection,
        "q282_ab_power_analysis": q282_ab_power_analysis,
        "q283_dq_scorecard": q283_dq_scorecard,
        "q284_topk_plus_other": q284_topk_plus_other,
        "q285_hist2d_grouping_sets": q285_hist2d_grouping_sets,
        "q286_wilson_ranking": q286_wilson_ranking,
        "q287_forecast_accuracy": q287_forecast_accuracy,
        "q288_late_dim_unknown_member": q288_late_dim_unknown_member,
        "q289_partial_agg_merge": q289_partial_agg_merge,
        "q290_median_ci_order_stats": q290_median_ci_order_stats,
        "q291_target_encoding_loo": q291_target_encoding_loo,
        "q292_stream_state_sizing": q292_stream_state_sizing,
        "q293_srm_guardrail": q293_srm_guardrail,
        "q294_schema_contract_audit": q294_schema_contract_audit,
        "q295_cbo_estimation_audit": q295_cbo_estimation_audit,
        "q296_audience_overlap": q296_audience_overlap,
        "q297_k_anonymity_audit": q297_k_anonymity_audit,
        "q298_dp_noisy_counts": q298_dp_noisy_counts,
        "q299_lsh_scurve_planner": q299_lsh_scurve_planner,
        "q300_feature_store_materialization": q300_feature_store_materialization,
        "q301_dataset_card": q301_dataset_card,
        "q302_hard_negative_mining": q302_hard_negative_mining,
        "q303_dedup_method_overlap": q303_dedup_method_overlap,
        "q304_seasonal_adjusted_anomalies": q304_seasonal_adjusted_anomalies,
        "q305_decile_migration": q305_decile_migration,
        "q306_cuped_adjustment": q306_cuped_adjustment,
        "q307_ipw_treatment_effect": q307_ipw_treatment_effect,
        "q308_l_diversity_audit": q308_l_diversity_audit,
        "q309_blocking_quality_audit": q309_blocking_quality_audit,
        "q310_bigram_backoff_logprob": q310_bigram_backoff_logprob,
        "q311_ann_hubness_audit": q311_ann_hubness_audit,
        "q312_attribution_model_compare": q312_attribution_model_compare,
        "q313_mmr_diversified_topk": q313_mmr_diversified_topk,
        "q314_obf_sequential_audit": q314_obf_sequential_audit,
        "q315_ecod_outliers": q315_ecod_outliers,
        "q316_partial_topk_merge_audit": q316_partial_topk_merge_audit,
        "q317_fd_discovery_audit": q317_fd_discovery_audit,
        "q318_quantile_normalization": q318_quantile_normalization,
        "q319_mann_whitney_by_type": q319_mann_whitney_by_type,
        "q320_equi_depth_histogram_audit": q320_equi_depth_histogram_audit,
        "q321_markov_next_event_accuracy": q321_markov_next_event_accuracy,
        "q322_ngram_novelty_rate": q322_ngram_novelty_rate,
        "q323_boilerplate_ngrams": q323_boilerplate_ngrams,
        "q324_weighted_jaccard_pairs": q324_weighted_jaccard_pairs,
        "q325_hodges_lehmann_shift": q325_hodges_lehmann_shift,
        "q326_meta_analysis": q326_meta_analysis,
        "q327_mutual_knn_rate": q327_mutual_knn_rate,
        "q328_countmin_audit": q328_countmin_audit,
        "q329_overdispersion_index": q329_overdispersion_index,
        "q330_dedup_threshold_pr_curve": q330_dedup_threshold_pr_curve,
        "q331_item_item_cf": q331_item_item_cf,
        "q332_t_closeness_audit": q332_t_closeness_audit,
        "q333_importance_weight_ess": q333_importance_weight_ess,
        "q334_clustering_coefficient": q334_clustering_coefficient,
        "q335_knapsack_data_selection": q335_knapsack_data_selection,
        "q336_source_distribution_similarity": q336_source_distribution_similarity,
        "q337_temporal_motifs": q337_temporal_motifs,
        "q338_ols_residual_outliers": q338_ols_residual_outliers,
        "q339_transition_entropy": q339_transition_entropy,
        "q340_bh_fdr_audit": q340_bh_fdr_audit,
        "q341_shard_rebalance_audit": q341_shard_rebalance_audit,
        "q342_ttl_cache_hit_audit": q342_ttl_cache_hit_audit,
        "q343_competing_risks_cif": q343_competing_risks_cif,
        "q344_retention_decay_fit": q344_retention_decay_fit,
        "q345_moore_lewis_selection": q345_moore_lewis_selection,
        "q346_error_retry_rate": q346_error_retry_rate,
        "q347_window_funnel_levels": q347_window_funnel_levels,
        "q348_seasonality_strength": q348_seasonality_strength,
        "q349_partition_layout_planner": q349_partition_layout_planner,
        "q350_encoding_planner": q350_encoding_planner,
        "q351_peak_detection": q351_peak_detection,
        "q352_variance_reduction_methods": q352_variance_reduction_methods,
        "q353_cf_holdout_hitrate": q353_cf_holdout_hitrate,
        "q354_bpe_merge_steps": q354_bpe_merge_steps,
        "q355_three_itemset_rules": q355_three_itemset_rules,
        "q356_growth_accounting": q356_growth_accounting,
        "q357_conversion_regression_detector": q357_conversion_regression_detector,
        "q358_depth_conversion_monotonicity": q358_depth_conversion_monotonicity,
        "q359_ewma_control_chart": q359_ewma_control_chart,
        "q360_sample_fidelity_audit": q360_sample_fidelity_audit,
        "q361_kendall_tau_daily": q361_kendall_tau_daily,
        "q362_hill_tail_index": q362_hill_tail_index,
        "q363_rolling_correlation": q363_rolling_correlation,
        "q364_bayes_ab_normal_approx": q364_bayes_ab_normal_approx,
        "q365_rec_novelty_coverage": q365_rec_novelty_coverage,
        "q366_dedup_storage_savings": q366_dedup_storage_savings,
        "q367_cohort_ltv_curve": q367_cohort_ltv_curve,
        "q368_ljung_box_residuals": q368_ljung_box_residuals,
        "q369_pinball_quantile_backtest": q369_pinball_quantile_backtest,
        "q370_ranker_agreement": q370_ranker_agreement,
        "q371_bloom_size_planner": q371_bloom_size_planner,
        "q372_erasure_impact_audit": q372_erasure_impact_audit,
        "q373_price_indices": q373_price_indices,
        "q374_peak_concurrency": q374_peak_concurrency,
        "q375_order_reconciliation": q375_order_reconciliation,
        "q376_entry_bounce_rate": q376_entry_bounce_rate,
        "q377_capture_recapture": q377_capture_recapture,
        "q378_asof_feature_matrix": q378_asof_feature_matrix,
    }


# --- oracle SQL builders (kept in sync with the library operators) -----------

_SHINGLES3 = (
    "list_distinct(list_transform(range(1, greatest(len(toks)-3,0)+2), "
    "i -> array_to_string(toks[i:i+2], ' ')))"
)
_SHINGLES2 = (
    "list_distinct(list_transform(range(1, greatest(len(toks)-2,0)+2), "
    "i -> array_to_string(toks[i:i+1], ' ')))"
)
_TOKS = "regexp_split_to_array(lower(trim(text)), '\\s+')"
_SHINGLES13 = (
    "list_distinct(list_transform(range(1, greatest(len(toks)-13,0)+2), "
    "i -> array_to_string(toks[i:i+12], ' ')))"
)

#: hex bucket thresholds for the 80/10/10 hash split, shared with q101's
#: Spark side via operators/sampling.split_thresholds
_SPLIT_THRESHOLDS = split_thresholds((("train", 0.8), ("val", 0.1), ("test", 0.1)))


_SHINGLE_HASH = (
    f"list_transform(sh, s -> CAST('0x' || substr(md5(s), 1, {SHINGLE_HASH_HEX}) AS BIGINT))"
)


def _sig_exprs(num_hashes: int) -> str:
    """Per-seed MinHash minima over the (a*h + b) mod P permutation family —
    parameters imported from the operator so both sides stay in sync."""
    mins = ", ".join(
        f"list_aggregate(list_transform(hs, h -> (CAST({a} AS BIGINT) * h + {b}) % {MINHASH_PRIME}), 'min')"
        for a, b in minhash_params(num_hashes)
    )
    return f"[{mins}]"


def _quality_sql(text: str = "text") -> str:
    """DuckDB rendition of functions.text.quality_score (same expression tree)."""
    en = "|".join(_LANG_PROFILES["en"])
    n = f"length({text})"
    ws = f"len(regexp_split_to_array(trim({text}), '\\s+'))"
    alpha = f"(len(regexp_extract_all({text}, '[A-Za-z]')) * 1.0 / {n})"
    punct = f"(len(regexp_extract_all({text}, '[^\\w\\s]')) * 1.0 / {n})"
    stop = f"(len(regexp_extract_all(lower({text}), '\\b(?:{en})\\b')) * 1.0 / {ws})"
    band = f"(CASE WHEN {n} >= 50 AND {n} <= 20000 THEN 1.0 WHEN {n} > 0 THEN 0.5 ELSE 0.0 END)"
    return (
        f"(floor((0.35 * {band} + 0.30 * least({alpha} * 1.25, 1.0) "
        f"+ 0.20 * least({stop} * 4.0, 1.0) "
        f"+ 0.15 * (1.0 - least({punct} * 4.0, 1.0))) * 10000.0 + 0.5) "
        f"/ 10000.0)"
    )


def _lang_guess_sql(text: str = "text") -> str:
    """argmax-by-(score, lang) via zero-padded score||lang string GREATEST —
    identical ordering to array_max over struct(score, lang)."""
    parts = []
    for lang, words in sorted(_LANG_PROFILES.items()):
        pat = "\\b(?:" + "|".join(words) + ")\\b"
        parts.append(
            f"lpad(CAST(len(regexp_extract_all(lower({text}), '{pat}')) AS VARCHAR), 10, '0') || '{lang}'"
        )
    g = "greatest(" + ", ".join(parts) + ")"
    return f"(CASE WHEN substr({g}, 1, 10) = '0000000000' THEN 'und' ELSE substr({g}, 11) END)"


def _simhash_sql(bits: int = 16) -> str:
    """N-bit SimHash from shingle hash lists, md5-derived bits (matches
    operators.dedup.simhash; the 15-hex/60-bit base hash covers bits<=60)."""
    votes = [
        "list_aggregate(list_transform(hs, h -> CASE WHEN ((h >> {j}) & 1) = 1 "
        "THEN 1 ELSE -1 END), 'sum')".format(j=j)
        for j in range(bits)
    ]
    terms = " + ".join(
        f"(CASE WHEN ({votes[j]}) > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END)"
        for j in range(bits)
    )
    return terms


def _lsh_bucket_sql(table: int, num_planes: int, dim: int) -> str:
    """SQL expression for table ``table``'s hyperplane bucket of column
    ``ve`` (plane components inlined as array literals — same deterministic
    md5 family as operators.similarity._hyperplane)."""
    terms = []
    for p in range(num_planes):
        comps = ", ".join(repr(c) for c in _hyperplane(table * num_planes + p, dim))
        terms.append(
            f"(CASE WHEN list_dot_product(ve, [{comps}]) >= 0 THEN {2**p} ELSE 0 END)"
        )
    return " + ".join(terms)


def _lsh_topk_sql(
    *,
    k: int,
    num_planes: int,
    dim: int,
    max_query_id: int,
    probes: int = 0,
    num_tables: int = 1,
) -> str:
    """Hyperplane-LSH top-k oracle: the deterministic md5-derived plane
    components are inlined as SQL array literals, so DuckDB reproduces the
    exact bucket assignment and candidate ranking of cosine_lsh_topk —
    including multi-probe and OR-ed multi-table candidate generation (a pair
    qualifies if it collides in ANY table; the single OR-join scores each
    pair once, mirroring the engine's dropDuplicates)."""
    buckets = ", ".join(
        f"{_lsh_bucket_sql(t, num_planes, dim)} AS bucket{t}"
        for t in range(num_tables)
    )
    per_table = []
    for t in range(num_tables):
        probe_set = ", ".join(
            [f"q.bucket{t}"] + [f"xor(q.bucket{t}, {1 << i})" for i in range(probes)]
        )
        per_table.append(f"c.bucket{t} IN ({probe_set})")
    collide = " OR ".join(per_table)
    return f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
        ), b AS (
            SELECT vec_id, ve, {buckets} FROM v
        ), q AS (
            SELECT vec_id AS query_id, ve AS qv,
                   {", ".join(f"bucket{t}" for t in range(num_tables))}
            FROM b WHERE vec_id < {max_query_id}
        ), scored AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   list_cosine_similarity(q.qv, c.ve) AS sim
            FROM q JOIN b c
              ON ({collide})
             AND c.vec_id != q.query_id
        ), ranked AS (
            SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, round(sim, 6) AS cosine_sim, rank
        FROM ranked WHERE rank <= {k}
    """


def _lsh_neardup_sql(*, threshold: float, num_planes: int, dim: int) -> str:
    """Bucketed near-dup oracle: replays embedding_near_dup_pairs' default
    path — same md5-derived hyperplane bucket assignment (plane components
    inlined as array literals), same same-bucket-only candidate join."""
    bucket_terms = []
    for p in range(num_planes):
        comps = ", ".join(repr(c) for c in _hyperplane(p, dim))
        bucket_terms.append(
            f"(CASE WHEN list_dot_product(ve, [{comps}]) >= 0 THEN {2**p} ELSE 0 END)"
        )
    bucket = " + ".join(bucket_terms)
    return f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
        ), b AS (
            SELECT vec_id, ve, {bucket} AS bucket FROM v
        )
        SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
               round(list_cosine_similarity(a.ve, b2.ve), 6) AS cosine_sim
        FROM b a JOIN b b2
          ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
        WHERE list_cosine_similarity(a.ve, b2.ve) >= {threshold}
    """


def oracle_sql() -> dict[str, str]:
    en_profile = "|".join(_LANG_PROFILES["en"])
    sqls = {
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   floor(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
                         * 1e1 / 100 + 0.5) / 1e1 AS sum_base_price,
                   floor(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
                         * 1e1 / 10000 + 0.5) / 1e1 AS sum_disc_price,
                   floor(CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
                         * 1e5 / count(*) + 0.5) / 1e5 AS avg_qty,
                   floor(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
                         * 1e6 / (count(*) * 100) + 0.5) / 1e6 AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q02_revenue_by_region": """
            SELECT r_name,
                   floor(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
                         * 1e1 / 10000 + 0.5) / 1e1 AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY r_name
        """,
        "q03_top_orders": """
            WITH r AS (
                SELECT o_orderkey,
                       sum(CAST(round(l_extendedprice * (1 - l_discount)
                                      * 10000, 0) AS BIGINT)) AS u
                FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                WHERE c_mktsegment = 'BUILDING'
                  AND o_orderdate < TIMESTAMP '1996-07-01'
                  AND l_shipdate > TIMESTAMP '1996-07-01'
                GROUP BY o_orderkey
            )
            SELECT o_orderkey,
                   CAST((u + 50) // 100 AS BIGINT) / 100.0 AS revenue
            FROM r ORDER BY u DESC, o_orderkey
            LIMIT 10
        """,
        "q04_priority_semijoin": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
            )
            GROUP BY o_orderpriority
        """,
        "q05_customers_no_orders": """
            SELECT c_mktsegment, count(*) AS n_customers
            FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            GROUP BY c_mktsegment
        """,
        "q06_revenue_filter": """
            SELECT floor(CAST(sum(CAST(round(l_extendedprice * l_discount * 10000)
                                      AS BIGINT)) AS DOUBLE)
                         * 1e2 / 10000 + 0.5) / 1e2 AS revenue,
                   count(*) AS n_rows
            FROM lineitem
            WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
        """,
        "q07_topk_parts_per_brand": """
            SELECT p_brand, p_partkey, p_retailprice, rank
            FROM (
                SELECT p_brand, p_partkey, p_retailprice,
                       row_number() OVER (PARTITION BY p_brand
                                          ORDER BY p_retailprice DESC, p_partkey) AS rank
                FROM part
            )
            WHERE rank <= 3
        """,
        "q08_setops_nations": """
            WITH cust AS (SELECT DISTINCT n_name FROM nation JOIN customer ON n_nationkey = c_nationkey),
                 supp AS (SELECT DISTINCT n_name FROM nation JOIN supplier ON n_nationkey = s_nationkey)
            SELECT n_name, 'both' AS tag FROM (SELECT n_name FROM cust INTERSECT SELECT n_name FROM supp)
            UNION ALL
            SELECT n_name, 'cust_only' AS tag FROM (SELECT n_name FROM cust EXCEPT SELECT n_name FROM supp)
        """,
        "q09_rollup_lineitem": """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS n_rows,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "q10_distinct_customers": """
            SELECT c_mktsegment,
                   count(DISTINCT o_custkey) AS n_customers,
                   count(*) AS n_orders
            FROM customer JOIN orders ON c_custkey = o_custkey
            GROUP BY c_mktsegment
        """,
        "q11_events_daily": """
            SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
        "q12_events_json": """
            SELECT json_extract_string(props, '$.k') AS k,
                   count(*) AS n_events,
                   floor(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                         * 1e6 / (count(*) * 100) + 0.5) / 1e6 AS avg_value
            FROM events
            GROUP BY 1
        """,
        "q13_part_type_stats": """
            SELECT string_split(p_type, ' ')[1] AS type_word,
                   count(*) AS n_parts,
                   floor(CAST(sum(p_size) AS DOUBLE) * 1e6 / count(*) + 0.5)
                       / 1e6 AS avg_size,
                   floor(CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS DOUBLE)
                         * 1e4 / (count(*) * 100) + 0.5) / 1e4 AS avg_price
            FROM part
            GROUP BY 1
        """,
        "q14_asof_click_purchase": """
            WITH clicks AS (
                SELECT user_id, ts, value FROM events WHERE event_type = 'click'
            ), purch AS (
                SELECT user_id, ts, max(value) AS p_value
                FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
            )
            SELECT c.user_id AS user_id,
                   count(*) AS n_clicks,
                   count(p.p_value) AS n_matched,
                   round(coalesce(sum(p.p_value), 0.0), 4) AS sum_purchase
            FROM clicks c
            ASOF LEFT JOIN purch p ON c.user_id = p.user_id AND c.ts >= p.ts
            GROUP BY c.user_id
        """,
        "q15_acctbal_above_nation_avg": """
            WITH avgs AS (
                SELECT c_nationkey AS nk, avg(c_acctbal) AS nation_avg
                FROM customer GROUP BY c_nationkey
            )
            SELECT n_name,
                   count(*) AS n_rich,
                   floor(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                         * 1e4 / (count(*) * 100) + 0.5) / 1e4 AS avg_bal
            FROM customer
            JOIN avgs ON c_nationkey = nk
            JOIN nation ON c_nationkey = n_nationkey
            WHERE c_acctbal > nation_avg
            GROUP BY n_name
        """,
        "q16_cube_orders": """
            SELECT o_orderstatus, o_orderpriority,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS sum_price
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "q17_running_totals": """
            SELECT o_custkey, o_orderkey,
                   round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS UNBOUNDED PRECEDING), 2) AS running_total,
                   round(lag(o_totalprice) OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey), 2) AS prev_price,
                   row_number() OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) AS order_seq
            FROM orders
        """,
        "q18_range_join_bands": """
            SELECT band,
                   count(*) AS n_items,
                   floor(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
                         * 1e1 / 100 + 0.5) / 1e1 AS sum_price
            FROM lineitem
            JOIN (VALUES ('low', 0, 10), ('mid', 11, 25), ('high', 26, 50))
                 AS b(band, lo, hi)
              ON l_quantity >= lo AND l_quantity <= hi
            GROUP BY band
        """,
        "q19_disjunctive_pred_join": """
            SELECT p_brand,
                   floor(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
                         * 1e2 / 10000 + 0.5) / 1e2 AS revenue,
                   count(*) AS n_items
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 35
                   AND l_quantity BETWEEN 20 AND 30)
            GROUP BY p_brand
        """,
        "q20_exact_dedup": """
            SELECT sha256(text) AS content_hash,
                   min(doc_id) AS keep_id,
                   count(*) AS dup_count
            FROM documents
            GROUP BY sha256(text)
        """,
        "q21_ngram_jaccard_pairs": f"""
            WITH tok AS (
                SELECT doc_id, lang, {_TOKS} AS toks FROM documents
            ), sh AS (
                SELECT doc_id, lang, {_SHINGLES3} AS s FROM tok
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   floor((CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.s, b.s)))) * 1e6 + 0.5) / 1e6 AS jaccard
            FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s)) * 1.0
                  / len(list_distinct(list_concat(a.s, b.s))) >= 0.1
        """,
        "q22_minhash_signatures": f"""
            WITH tok AS (
                SELECT doc_id, {_TOKS} AS toks FROM documents
            ), shg AS (
                SELECT doc_id, {_SHINGLES3} AS sh FROM tok
            ), hsh AS (
                SELECT doc_id, {_SHINGLE_HASH} AS hs FROM shg
            )
            SELECT doc_id, array_to_string({_sig_exprs(8)}, ',') AS sig
            FROM hsh
        """,
        "q23_minhash_lsh_pairs": f"""
            WITH tok AS (
                SELECT doc_id, {_TOKS} AS toks FROM documents
            ), shg AS (
                SELECT doc_id, {_SHINGLES3} AS sh FROM tok
            ), sig AS (
                SELECT doc_id, sh, {_sig_exprs(8)} AS sg
                FROM (SELECT doc_id, sh, {_SHINGLE_HASH} AS hs FROM shg)
            ), banded AS (
                SELECT doc_id, sh, b AS band_idx,
                       CAST(b AS VARCHAR) || '|' || array_to_string(sg[b*2+1:b*2+2], '|') AS band
                FROM sig, (SELECT unnest(range(0, 4)) AS b)
            ), cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
            )
            SELECT c.id_a, c.id_b,
                   floor((CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                         / len(list_distinct(list_concat(x.sh, y.sh)))) * 1e6 + 0.5) / 1e6 AS jaccard
            FROM cand c
            JOIN shg x ON x.doc_id = c.id_a
            JOIN shg y ON y.doc_id = c.id_b
            WHERE len(list_intersect(x.sh, y.sh)) * 1.0
                  / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.1
        """,
        "q24_cosine_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                FROM embeddings WHERE vec_id < 10
            ), scored AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim
                FROM q, embeddings e
                WHERE e.vec_id != q.query_id
            ), ranked AS (
                SELECT query_id, neighbor_id, sim,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, neighbor_id) AS rank
                FROM scored
            )
            SELECT query_id, neighbor_id, round(sim, 6) AS cosine_sim, rank
            FROM ranked WHERE rank <= 5
        """,
        "q25_embedding_neardup": _lsh_neardup_sql(
            threshold=0.3, num_planes=4, dim=64
        ),
        "q26_text_quality_by_lang": f"""
            WITH ann AS (
                SELECT lang,
                       len(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens,
                       length(text) AS chars,
                       {_quality_sql("text")} AS quality
                FROM documents
            )
            SELECT lang,
                   count(*) AS docs,
                   CAST(sum(ws_tokens) AS BIGINT) AS total_tokens,
                   floor(CAST(sum(chars) AS DOUBLE) * 1e4 / count(*) + 0.5)
                       / 1e4 AS avg_chars,
                   floor(CAST(sum(CAST(round(quality * 10000) AS BIGINT)) AS DOUBLE)
                         * 1e4 / (count(*) * 10000) + 0.5) / 1e4 AS avg_quality
            FROM ann GROUP BY lang
        """,
        "q27_lang_guess_counts": f"""
            SELECT lang, {_lang_guess_sql("text")} AS lang_guess, count(*) AS n_docs
            FROM documents
            GROUP BY 1, 2
        """,
        "q28_fingerprint_dedup": """
            SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint,
                   min(doc_id) AS keep_id,
                   count(*) AS dup_count
            FROM documents
            GROUP BY 1
        """,
        "q29_tumbling_windows": """
            SELECT strftime(make_timestamp(CAST(floor(epoch(ts)/600)*600*1000000 AS BIGINT)),
                            '%Y-%m-%d %H:%M:%S') AS win_start,
                   event_type,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value,
                   round(avg(value), 6) AS avg_value
            FROM events
            GROUP BY 1, 2
        """,
        "q30_sliding_windows": """
            WITH expanded AS (
                SELECT CAST(floor(epoch(ts)/300)*300 AS BIGINT) AS win_s, event_type, value FROM events
                UNION ALL
                SELECT CAST(floor(epoch(ts)/300)*300 - 300 AS BIGINT) AS win_s, event_type, value FROM events
            )
            SELECT strftime(make_timestamp(win_s * 1000000), '%Y-%m-%d %H:%M:%S') AS win_start,
                   event_type,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM expanded
            GROUP BY 1, 2
        """,
        "q31_session_counts": """
            WITH flagged AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                                 OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                    >= INTERVAL 5 MINUTE
                            THEN 1 ELSE 0 END AS new_session
                FROM events
            ), sessions AS (
                SELECT user_id, ts,
                       sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                              ROWS UNBOUNDED PRECEDING) AS session_id
                FROM flagged
            ), per_session AS (
                SELECT user_id, session_id, count(*) AS n_events
                FROM sessions GROUP BY user_id, session_id
            )
            SELECT user_id,
                   count(*) AS n_sessions,
                   max(n_events) AS max_session_events
            FROM per_session GROUP BY user_id
        """,
        "q32_binary_bytes_by_source": """
            SELECT source,
                   count(*) AS n_docs,
                   CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
            FROM documents
            GROUP BY source
        """,
        "q33_simhash_fingerprints": f"""
            WITH tok AS (
                SELECT doc_id, {_TOKS} AS toks FROM documents
            ), shg AS (
                SELECT doc_id, {_SHINGLES2} AS sh FROM tok
            ), hashed AS (
                SELECT doc_id,
                       list_transform(sh, s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS hs
                FROM shg
            )
            SELECT doc_id, CAST({_simhash_sql(16)} AS BIGINT) AS simhash16
            FROM hashed
        """,
        "q34_token_counts": """
            WITH ann AS (
                SELECT source,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS ws,
                       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS bpe
                FROM documents
            )
            SELECT source,
                   count(*) AS n_docs,
                   CAST(sum(ws) AS BIGINT) AS ws_tokens,
                   CAST(sum(bpe) AS BIGINT) AS bpe_tokens
            FROM ann GROUP BY source
        """,
        "q35_chargram_fingerprint": """
            WITH norm AS (
                SELECT doc_id,
                       regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
                FROM documents
            )
            SELECT doc_id,
                   CASE WHEN length(t) >= 8 THEN
                       list_aggregate(list_transform(range(1, length(t) - 8 + 2),
                                      i -> md5(substr(t, CAST(i AS INTEGER), 8))), 'min')
                   ELSE md5(t) END AS fp8
            FROM norm
        """,
        "q36_lsh_cosine_topk": _lsh_topk_sql(
            k=3, num_planes=4, dim=64, max_query_id=5, probes=2
        ),
        "q37_simhash_neardup": f"""
            WITH tok AS (
                SELECT doc_id, {_TOKS} AS toks FROM documents
            ), shg AS (
                SELECT doc_id, {_SHINGLES2} AS sh FROM tok
            ), hashed AS (
                SELECT doc_id,
                       list_transform(sh, s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS hs
                FROM shg
            ), fp AS (
                SELECT doc_id, CAST({_simhash_sql(32)} AS BIGINT) AS f FROM hashed
            )
            -- pigeonhole: the engine's 4x4-bit segment blocking returns exactly
            -- the all-pairs hamming<=3 set, so the oracle is the plain filter
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.f, b.f)) AS INTEGER) AS hamming
            FROM fp a JOIN fp b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.f, b.f)) <= 3
        """,
        # the sketch estimate itself is engine-internal; the query exports
        # the exact count plus an in-engine tolerance boolean, so the oracle
        # is the exact count and literal TRUE (q207's audit pattern)
        "q38_approx_distinct_users": """
            SELECT event_type,
                   count(DISTINCT user_id) AS exact_users,
                   TRUE AS approx_within_tol
            FROM events GROUP BY event_type
        """,
        "q39_pivot_linestatus": """
            SELECT l_returnflag,
                   round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
                   round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O
            FROM lineitem
            GROUP BY l_returnflag
        """,
        "q40_quantiles": """
            SELECT l_returnflag,
                   round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
                   round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
                   round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price,
                   round(quantile_cont(l_quantity, 0.5), 4) AS median_qty
            FROM lineitem
            GROUP BY l_returnflag
        """,
        "q41_corr_stats": """
            WITH m AS (
                SELECT l_returnflag,
                       round(CASE WHEN count(*) * sum(l_quantity * l_quantity)
                                       - sum(l_quantity) * sum(l_quantity) > 0
                                   AND count(*) * sum(l_extendedprice * l_extendedprice)
                                       - sum(l_extendedprice) * sum(l_extendedprice) > 0
                                  THEN (count(*) * sum(l_quantity * l_extendedprice)
                                        - sum(l_quantity) * sum(l_extendedprice))
                                       / sqrt((count(*) * sum(l_quantity * l_quantity)
                                               - sum(l_quantity) * sum(l_quantity))
                                              * (count(*) * sum(l_extendedprice * l_extendedprice)
                                                 - sum(l_extendedprice) * sum(l_extendedprice)))
                             END, 6) AS corr_qty_price,
                       round(stddev_samp(l_extendedprice), 2) AS sd_price,
                       count(*) AS n,
                       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                           AS s1,
                       CAST(sum(CAST(round(l_quantity) AS BIGINT)
                                * CAST(round(l_quantity) AS BIGINT))
                            AS BIGINT) AS s2
                FROM lineitem GROUP BY l_returnflag
            )
            SELECT l_returnflag, corr_qty_price, sd_price,
                   floor((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                         / (CAST(n AS DOUBLE) * (n - 1)) * 1e4 + 0.5) / 1e4
                       AS var_qty,
                   n AS n_rows
            FROM m
        """,
        "q42_multimodal_features": """
            SELECT source AS modality,
                   count(*) AS n_assets,
                   CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
                   count(DISTINCT source || ':' || substr(md5(text), 1, 12))
                       AS distinct_features
            FROM documents
            GROUP BY source
        """,
        "q43_embedding_component_stats": """
            WITH dims AS (SELECT unnest(range(4)) AS dim)
            SELECT label, CAST(dim AS INTEGER) AS dim,
                   round(avg(CAST(embedding[CAST(dim AS INTEGER) + 1] AS DOUBLE)), 6) AS avg_x,
                   round(min(CAST(embedding[CAST(dim AS INTEGER) + 1] AS DOUBLE)), 6) AS min_x,
                   round(max(CAST(embedding[CAST(dim AS INTEGER) + 1] AS DOUBLE)), 6) AS max_x
            FROM embeddings, dims
            GROUP BY label, dim
        """,
        "q44_frame_sample_counts": """
            WITH f AS (
                SELECT doc_id, source,
                       CAST(ceil(n_chars * 10 / 1000.0) AS BIGINT) AS nf
                FROM documents
                WHERE n_chars > 0
            )
            SELECT source,
                   CAST(sum(nf) AS BIGINT) AS n_frames,
                   count(DISTINCT doc_id) AS n_videos,
                   max((nf - 1) * 1000) AS max_ts_ms
            FROM f GROUP BY source
        """,
        "q46_winnowing_fingerprints": """
            WITH norm AS (
                SELECT doc_id,
                       regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
                FROM documents
            ), g AS (
                SELECT doc_id,
                       CASE WHEN length(t) >= 8 THEN
                           list_transform(range(1, length(t) - 8 + 2),
                                          i -> md5(substr(t, CAST(i AS INTEGER), 8)))
                       ELSE [md5(t)] END AS hs
                FROM norm
            ), wmins AS (
                SELECT doc_id,
                       list_distinct(list_transform(range(1, len(hs) + 1),
                           i -> list_aggregate(
                               hs[CAST(i AS INTEGER):CAST(i + 3 AS INTEGER)],
                               'min'))) AS fps
                FROM g
            )
            SELECT doc_id,
                   CAST(len(fps) AS BIGINT) AS n_fps,
                   list_aggregate(fps, 'min') AS min_fp
            FROM wmins
        """,
        "q49_curation_funnel": f"""
            WITH dedup AS (
                SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
            ), s1 AS (
                SELECT d.doc_id, d.text FROM documents d JOIN dedup USING (doc_id)
            ), s2 AS (
                SELECT doc_id, text FROM s1 WHERE {_quality_sql('text')} >= 0.5
            ), tok AS (
                SELECT doc_id, {_TOKS} AS toks FROM s2
            ), shg AS (
                SELECT doc_id, {_SHINGLES2} AS sh FROM tok
            ), hashed AS (
                SELECT doc_id,
                       list_transform(sh, s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS hs
                FROM shg
            ), fp AS (
                SELECT doc_id, CAST({_simhash_sql(32)} AS BIGINT) AS f FROM hashed
            ), dropped AS (
                SELECT DISTINCT b.doc_id
                FROM fp a JOIN fp b ON a.doc_id < b.doc_id
                WHERE bit_count(xor(a.f, b.f)) <= 3
            ), s3 AS (
                SELECT s2.doc_id FROM s2 ANTI JOIN dropped USING (doc_id)
            )
            SELECT 'raw' AS stage, count(*) AS docs_kept FROM documents
            UNION ALL SELECT 'exact_dedup', count(*) FROM s1
            UNION ALL SELECT 'quality', count(*) FROM s2
            UNION ALL SELECT 'near_dup', count(*) FROM s3
        """,
        "q48_ivf_cosine_topk": """
            WITH cent AS (
                SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
                FROM embeddings ORDER BY vec_id LIMIT 16
            ), corpus AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            ), assigned AS (
                SELECT vec_id, v, cid FROM (
                    SELECT c.vec_id, c.v, ct.cid,
                           row_number() OVER (
                               PARTITION BY c.vec_id
                               ORDER BY list_cosine_similarity(c.v, ct.cv) DESC,
                                        ct.cid) AS rn
                    FROM corpus c, cent ct)
                WHERE rn = 1
            ), probes AS (
                SELECT query_id, qv, cid FROM (
                    SELECT q.vec_id AS query_id, q.v AS qv, ct.cid,
                           row_number() OVER (
                               PARTITION BY q.vec_id
                               ORDER BY list_cosine_similarity(q.v, ct.cv) DESC,
                                        ct.cid) AS rn
                    FROM corpus q, cent ct WHERE q.vec_id < 10)
                WHERE rn <= 4
            ), cand AS (
                SELECT p.query_id, a.vec_id AS neighbor_id,
                       list_cosine_similarity(p.qv, a.v) AS sim
                FROM probes p JOIN assigned a
                  ON a.cid = p.cid AND a.vec_id != p.query_id
            )
            SELECT query_id, neighbor_id, round(sim, 6) AS cosine_sim, rank
            FROM (SELECT query_id, neighbor_id, sim,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY sim DESC, neighbor_id) AS rank
                  FROM cand)
            WHERE rank <= 5
        """,
        "q47_winnow_overlap_pairs": """
            WITH norm AS (
                SELECT doc_id,
                       regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
                FROM documents
            ), g AS (
                SELECT doc_id,
                       CASE WHEN length(t) >= 8 THEN
                           list_transform(range(1, length(t) - 8 + 2),
                                          i -> md5(substr(t, CAST(i AS INTEGER), 8)))
                       ELSE [md5(t)] END AS hs
                FROM norm
            ), wmins AS (
                SELECT doc_id,
                       list_distinct(list_transform(range(1, len(hs) + 1),
                           i -> list_aggregate(
                               hs[CAST(i AS INTEGER):CAST(i + 3 AS INTEGER)],
                               'min'))) AS fps
                FROM g
            ), fp AS (
                SELECT doc_id, unnest(fps) AS fp FROM wmins
            ), rare AS (
                SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 100
            ), kept AS (
                SELECT fp.doc_id, fp.fp FROM fp SEMI JOIN rare USING (fp)
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   count(*) AS shared_fps
            FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING count(*) >= 40
        """,
        "q45_dedup_clusters": f"""
            WITH RECURSIVE tok AS (
                SELECT doc_id, {_TOKS} AS toks FROM documents
            ), shg AS (
                SELECT doc_id, {_SHINGLES2} AS sh FROM tok
            ), hashed AS (
                SELECT doc_id,
                       list_transform(sh, s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS hs
                FROM shg
            ), fp AS (
                SELECT doc_id, CAST({_simhash_sql(32)} AS BIGINT) AS f FROM hashed
            ), pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM fp a JOIN fp b ON a.doc_id < b.doc_id
                WHERE bit_count(xor(a.f, b.f)) <= 3
            ), edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL
                SELECT id_b AS src, id_a AS dst FROM pairs
            ), walk AS (
                SELECT DISTINCT src AS node, src AS label FROM edges
                UNION
                SELECT e.src AS node, w.label
                FROM edges e JOIN walk w ON e.dst = w.node
            ), comp AS (
                SELECT node, min(label) AS component FROM walk GROUP BY node
            )
            SELECT node, component,
                   count(*) OVER (PARTITION BY component) AS cluster_size
            FROM comp
        """,
        "q50_session_durations": """
            WITH flagged AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
                SELECT user_id, ts,
                       sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                              ROWS UNBOUNDED PRECEDING) AS session_seq
                FROM flagged
            ), per_session AS (
                SELECT user_id, session_seq, count(*) AS n_events,
                       max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
                FROM sess GROUP BY 1, 2
            )
            SELECT user_id,
                   count(*) AS n_sessions,
                   CAST(sum(n_events) AS BIGINT) AS n_events,
                   max(n_events) AS max_session_events,
                   floor(CAST(sum(duration_us) AS DOUBLE) * 1e3
                         / (count(*) * 1000000) + 0.5) / 1e3
                       AS avg_session_s,
                   floor(CAST(max(duration_us) AS DOUBLE) / 1e3 + 0.5) / 1e3
                       AS max_session_s
            FROM per_session GROUP BY user_id
        """,
        "q51_stratified_sample": """
            SELECT doc_id, lang, sample_rank FROM (
                SELECT doc_id, lang,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                           AS sample_rank
                FROM documents
            ) WHERE sample_rank <= 25
        """,
        "q52_tfidf_top_terms": f"""
            WITH toks AS (
                SELECT doc_id, unnest({_TOKS}) AS term FROM documents
            ), t2 AS (
                SELECT doc_id, term FROM toks WHERE term <> ''
            ), tf AS (
                SELECT doc_id, term, count(*) AS tf FROM t2 GROUP BY 1, 2
            ), dfreq AS (
                SELECT term, count(DISTINCT doc_id) AS df FROM t2 GROUP BY 1
            ), n AS (
                SELECT count(*) AS n_docs FROM documents
            ), scored AS (
                SELECT tf.doc_id, tf.term,
                       CAST(tf.tf AS DOUBLE)
                           * ln(CAST(n.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE)) AS score
                FROM tf JOIN dfreq USING (term) CROSS JOIN n
                WHERE tf.doc_id < 50
            ), ranked AS (
                SELECT doc_id, term, score,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, term) AS rank
                FROM scored
            )
            SELECT doc_id, term, round(score, 6) AS tfidf, rank
            FROM ranked WHERE rank <= 3
        """,
        "q53_lone_late_supplier": """
            WITH j AS (
                SELECT l_orderkey, l_suppkey,
                       (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderstatus = 'F'
            ), per_order AS (
                SELECT l_orderkey,
                       count(DISTINCT l_suppkey) AS n_supp,
                       count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
                       max(CASE WHEN late THEN l_suppkey END) AS late_supp
                FROM j GROUP BY 1
            ), waits AS (
                SELECT late_supp, count(*) AS numwait
                FROM per_order
                WHERE n_supp > 1 AND n_late = 1
                GROUP BY late_supp
            )
            SELECT s_name, numwait
            FROM waits JOIN supplier ON late_supp = s_suppkey
            ORDER BY numwait DESC, s_name
            LIMIT 20
        """,
        "q54_full_outer_reconcile": """
            WITH spend AS (
                SELECT o_custkey, sum(o_totalprice) AS spend, count(*) AS n_orders
                FROM orders GROUP BY 1
            ), purch AS (
                SELECT user_id, sum(value) AS purch_value, count(*) AS n_purch
                FROM events WHERE event_type = 'purchase' GROUP BY 1
            )
            SELECT CASE WHEN o_custkey IS NULL THEN 'events_only'
                        WHEN user_id IS NULL THEN 'orders_only'
                        ELSE 'both' END AS side,
                   count(*) AS n_keys,
                   round(sum(coalesce(spend, 0.0)), 2) AS total_spend,
                   round(sum(coalesce(purch_value, 0.0)), 4) AS total_purchase
            FROM spend FULL OUTER JOIN purch ON o_custkey = user_id
            GROUP BY 1
        """,
        "q55_extreme_customer_per_nation": """
            WITH j AS (
                SELECT n_name, c_name, c_acctbal, c_custkey
                FROM customer JOIN nation ON c_nationkey = n_nationkey
            ), mx AS (
                SELECT n_name, c_name AS richest_customer FROM (
                    SELECT n_name, c_name,
                           row_number() OVER (PARTITION BY n_name
                                              ORDER BY c_acctbal DESC, c_custkey DESC) AS r
                    FROM j
                ) WHERE r = 1
            ), mn AS (
                SELECT n_name, c_name AS poorest_customer FROM (
                    SELECT n_name, c_name,
                           row_number() OVER (PARTITION BY n_name
                                              ORDER BY c_acctbal ASC, c_custkey ASC) AS r
                    FROM j
                ) WHERE r = 1
            ), agg AS (
                SELECT n_name, round(max(c_acctbal), 2) AS max_bal,
                       round(min(c_acctbal), 2) AS min_bal,
                       count(*) AS n_customers
                FROM j GROUP BY 1
            )
            SELECT agg.n_name, richest_customer, max_bal, poorest_customer,
                   min_bal, n_customers
            FROM agg JOIN mx USING (n_name) JOIN mn USING (n_name)
        """,
        "q56_moving_avg_range_frame": """
            SELECT o_custkey, o_orderkey,
                   floor(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                              OVER w AS DOUBLE)
                         * 1e4 / (count(*) OVER w * 100) + 0.5) / 1e4 AS mavg_7d,
                   count(*) OVER w AS n_7d
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                         RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
        """,
        "q57_grouping_sets": """
            SELECT o_orderstatus, o_orderpriority,
                   CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
                   CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS sum_price
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """,
        "q58_chunked_docs": f"""
            WITH tok AS (
                SELECT doc_id, {_TOKS} AS toks FROM documents
                WHERE doc_id < 20 AND trim(text) <> ''
            ), starts AS (
                SELECT doc_id, toks,
                       unnest(range(1, greatest(len(toks), 1) + 1, 24)) AS s
                FROM tok
            ), chunks AS (
                SELECT doc_id,
                       CAST((s - 1) / 24 AS BIGINT) AS chunk_idx,
                       toks[s : least(s + 31, len(toks))] AS chunk
                FROM starts
            )
            SELECT doc_id, chunk_idx,
                   CAST(len(chunk) AS BIGINT) AS n_tokens,
                   md5(array_to_string(chunk, ' ')) AS chunk_hash
            FROM chunks
        """,
        "q59_sql_scalar_subquery": """
            SELECT p_brand, count(*) AS n_above,
                   floor(CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS DOUBLE)
                         * 1e2 / (count(*) * 100) + 0.5) / 1e2 AS avg_above_price
            FROM part
            WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
            GROUP BY p_brand
        """,
        "q60_distribution_windows": """
            SELECT c_mktsegment, c_custkey,
                   ntile(4) OVER w AS quartile,
                   floor(percent_rank() OVER w * 1e6 + 0.5) / 1e6
                       AS pct_rank,
                   floor(cume_dist() OVER w * 1e6 + 0.5) / 1e6 AS cume
            FROM customer
            WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        """,
        "q61_schema_evolution_union": """
            WITH merged AS (
                SELECT o_orderkey, o_totalprice
                FROM orders WHERE o_orderkey % 2 = 0
                UNION ALL BY NAME
                SELECT o_orderkey, o_totalprice, o_orderpriority
                FROM orders WHERE o_orderkey % 2 = 1
            )
            SELECT coalesce(o_orderpriority, '<legacy>') AS priority,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS sum_price
            FROM merged GROUP BY 1
        """,
        "q62_repetition_scores": f"""
            WITH toks AS (
                SELECT doc_id, lang, unnest({_TOKS}) AS term FROM documents
            ), tf AS (
                SELECT doc_id, lang, term, count(*) AS tf
                FROM toks WHERE term <> '' GROUP BY 1, 2, 3
            ), per_doc AS (
                SELECT doc_id, lang,
                       CAST(max(tf) AS DOUBLE) / CAST(sum(tf) AS DOUBLE) AS rep_ratio
                FROM tf GROUP BY 1, 2
            )
            SELECT lang,
                   count(*) AS n_docs,
                   round(avg(rep_ratio), 6) AS avg_rep,
                   round(max(rep_ratio), 6) AS max_rep,
                   CAST(sum(CASE WHEN rep_ratio > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_repetitive
            FROM per_doc GROUP BY lang
        """,
        "q63_date_spine_densify": """
            WITH bounds AS (
                SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
                FROM events
            ), spine AS (
                SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
                FROM bounds
            ), daily AS (
                SELECT CAST(ts AS DATE) AS day,
                       count(*) AS n_events,
                       round(sum(value), 4) AS sum_value
                FROM events GROUP BY 1
            )
            SELECT strftime(s.day, '%Y-%m-%d') AS day,
                   coalesce(n_events, 0) AS n_events,
                   coalesce(sum_value, 0.0) AS sum_value
            FROM spine s LEFT JOIN daily d ON s.day = d.day
        """,
        "q64_unpivot_part_metrics": """
            WITH base AS (
                SELECT p_partkey, p_brand,
                       CAST(p_size AS DOUBLE) AS size,
                       p_retailprice AS retailprice
                FROM part
            )
            SELECT p_brand, metric,
                   count(*) AS n,
                   floor(CAST(sum(CAST(round(val * 100) AS BIGINT)) AS DOUBLE)
                         * 1e4 / (count(*) * 100) + 0.5) / 1e4 AS avg_val,
                   round(sum(val), 2) AS sum_val
            FROM base UNPIVOT (val FOR metric IN (size, retailprice))
            GROUP BY 1, 2
        """,
        "q65_kmeans_update_step": """
            WITH v AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
            ), cent AS (
                SELECT vec_id AS cid, ve AS cv FROM v ORDER BY vec_id LIMIT 16
            ), scored AS (
                SELECT v.vec_id, v.ve, c.cid,
                       list_cosine_similarity(v.ve, c.cv) AS sim
                FROM v CROSS JOIN cent c
            ), assigned AS (
                SELECT vec_id, ve, cid FROM (
                    SELECT vec_id, ve, cid,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY sim DESC, cid) AS r
                    FROM scored
                ) WHERE r = 1
            )
            SELECT cid, count(*) AS n_assigned,
                   round(avg(ve[1]), 6) AS c1,
                   round(avg(ve[2]), 6) AS c2,
                   round(avg(ve[3]), 6) AS c3,
                   round(avg(ve[4]), 6) AS c4
            FROM assigned GROUP BY cid
        """,
        "q66_order_count_distribution": """
            WITH per_cust AS (
                SELECT c_custkey, count(o_orderkey) AS c_count
                FROM customer LEFT JOIN orders
                  ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
                GROUP BY c_custkey
            )
            SELECT c_count, count(*) AS custdist
            FROM per_cust GROUP BY c_count
        """,
        "q67_small_quantity_revenue": """
            WITH avgq AS (
                SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_thresh
                FROM lineitem GROUP BY l_partkey
            )
            SELECT p_brand,
                   count(*) AS n_small,
                   floor(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                              AS DOUBLE) * 1e2 / 700 + 0.5) / 1e2 AS avg_yearly
            FROM lineitem l
            JOIN avgq a ON l.l_partkey = a.l_partkey
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_quantity < a.qty_thresh
            GROUP BY p_brand
        """,
        "q68_rich_inactive_customers": """
            SELECT c_mktsegment,
                   count(*) AS n_rich_inactive,
                   round(sum(c_acctbal), 2) AS total_bal
            FROM customer
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                               WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderpriority = '1-URGENT')
            GROUP BY c_mktsegment
        """,
        "q69_excess_inventory_shippers": """
            SELECT n_name, count(*) AS n_suppliers
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            WHERE s_suppkey IN (
                SELECT l_suppkey
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE p_size <= 15
                  AND l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1997-01-01'
                GROUP BY l_suppkey, l_partkey
                HAVING sum(l_quantity) > 50)
            GROUP BY n_name
        """,
        "q70_bm25_search": f"""
            WITH dl AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                       END AS dl
                FROM documents
            ), stats AS (
                SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl
            ), toks AS (
                SELECT doc_id, unnest({_TOKS}) AS term FROM documents
            ), tf AS (
                SELECT doc_id, term, count(*) AS tf FROM toks
                WHERE term IN ('join', 'vector', 'stream') GROUP BY 1, 2
            ), dfreq AS (
                SELECT term, count(*) AS df FROM tf GROUP BY 1
            ), scored AS (
                SELECT t.doc_id,
                       ln((CAST(s.n_docs AS DOUBLE) - f.df + 0.5)
                          / (CAST(f.df AS DOUBLE) + 0.5) + 1.0)
                       * (CAST(t.tf AS DOUBLE) * 2.2)
                       / (t.tf + 1.2 * (1.0 - 0.75
                          + 0.75 * CAST(d.dl AS DOUBLE) / s.avgdl)) AS s
                FROM tf t
                JOIN dfreq f USING (term)
                JOIN dl d USING (doc_id)
                CROSS JOIN stats s
            ), docsc AS (
                SELECT doc_id, round(sum(s), 6) AS bm25,
                       count(*) AS n_terms_hit
                FROM scored GROUP BY doc_id
            )
            SELECT doc_id, bm25, n_terms_hit, rank FROM (
                SELECT doc_id, bm25, n_terms_hit,
                       row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
                FROM docsc)
            WHERE rank <= 10
        """,
        "q71_pmi_collocations": f"""
            WITH tok AS (
                SELECT {_TOKS} AS toks FROM documents
            ), uni AS (
                SELECT unnest(toks) AS term FROM tok
            ), cu AS (
                SELECT term, count(*) AS c_term FROM uni
                WHERE term <> '' GROUP BY term
            ), bi AS (
                SELECT unnest(CASE WHEN len(toks) >= 2
                    THEN list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i + 1])
                    ELSE [] END) AS bigram
                FROM tok
            ), cb AS (
                SELECT bigram, count(*) AS c_bigram FROM bi GROUP BY bigram
            ), tu AS (
                SELECT CAST(sum(c_term) AS BIGINT) AS t_uni FROM cu
            ), tb AS (
                SELECT CAST(sum(c_bigram) AS BIGINT) AS t_bi FROM cb
            ), scored AS (
                SELECT bigram, c_bigram,
                       round(ln((CAST(c_bigram AS DOUBLE) / t_bi)
                             / ((CAST(cx.c_term AS DOUBLE) / t_uni)
                                * (CAST(cy.c_term AS DOUBLE) / t_uni))), 6) AS pmi
                FROM cb
                JOIN cu cx ON string_split(bigram, ' ')[1] = cx.term
                JOIN cu cy ON string_split(bigram, ' ')[2] = cy.term
                CROSS JOIN tu CROSS JOIN tb
                WHERE c_bigram >= 5
            )
            SELECT bigram, c_bigram, pmi, rank FROM (
                SELECT bigram, c_bigram, pmi,
                       row_number() OVER (ORDER BY pmi DESC, bigram) AS rank
                FROM scored)
            WHERE rank <= 20
        """,
        "q72_part_pagerank": """
            WITH pairs AS (
                SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
                FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                WHERE a.l_partkey <> b.l_partkey
            ), nodes AS (
                SELECT src AS node FROM pairs UNION SELECT dst FROM pairs
            ), nn AS (
                SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
            ), deg AS (
                SELECT src, count(*) AS out_deg FROM pairs GROUP BY src
            ), ef AS (
                SELECT src, dst, CAST(1.0 AS DOUBLE) / out_deg AS frac
                FROM pairs JOIN deg USING (src)
            ), pr0 AS (
                SELECT node, CAST(1.0 AS DOUBLE) / n AS pr
                FROM nodes CROSS JOIN nn
            ), m1 AS (
                SELECT ef.dst AS node, sum(pr0.pr * ef.frac) AS m
                FROM ef JOIN pr0 ON ef.src = pr0.node GROUP BY 1
            ), pr1 AS (
                SELECT nodes.node, 0.15 / nn.n + 0.85 * coalesce(m1.m, 0.0) AS pr
                FROM nodes CROSS JOIN nn LEFT JOIN m1 ON nodes.node = m1.node
            ), m2 AS (
                SELECT ef.dst AS node, sum(pr1.pr * ef.frac) AS m
                FROM ef JOIN pr1 ON ef.src = pr1.node GROUP BY 1
            ), pr2 AS (
                SELECT nodes.node, 0.15 / nn.n + 0.85 * coalesce(m2.m, 0.0) AS pr
                FROM nodes CROSS JOIN nn LEFT JOIN m2 ON nodes.node = m2.node
            ), m3 AS (
                SELECT ef.dst AS node, sum(pr2.pr * ef.frac) AS m
                FROM ef JOIN pr2 ON ef.src = pr2.node GROUP BY 1
            ), pr3 AS (
                SELECT nodes.node, 0.15 / nn.n + 0.85 * coalesce(m3.m, 0.0) AS pr
                FROM nodes CROSS JOIN nn LEFT JOIN m3 ON nodes.node = m3.node
            )
            SELECT node AS p_partkey, round(pr, 6) AS pr FROM pr3
        """,
        "q73_correlated_avg_subquery": """
            SELECT o_orderpriority, count(*) AS n_big,
                   floor(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                         * 1e2 / (count(*) * 100) + 0.5) / 1e2 AS avg_big_price
            FROM orders o
            WHERE o_totalprice > 2.0 * (SELECT avg(o2.o_totalprice)
                                        FROM orders o2
                                        WHERE o2.o_custkey = o.o_custkey)
            GROUP BY o_orderpriority
        """,
        "q74_variant_props": """
            WITH v AS (
                SELECT event_type, value,
                       CAST(json_extract(props, '$.k') AS BIGINT) AS k
                FROM events
            )
            SELECT event_type, k // 10 AS k_decade,
                   count(*) AS n_events,
                   floor(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                         * 1e6 / (count(*) * 100) + 0.5) / 1e6 AS avg_value,
                   min(k) AS k_min,
                   max(k) AS k_max
            FROM v GROUP BY event_type, k // 10
        """,
        "q75_quality_gate": """
            WITH f AS (
                SELECT l_discount, l_quantity, l_tax, l_extendedprice
                FROM lineitem
            ), viol AS (
                SELECT 'discount_cap' AS violation, l_extendedprice FROM f
                WHERE NOT coalesce(l_discount <= 0.05, FALSE)
                UNION ALL
                SELECT 'qty_cap', l_extendedprice FROM f
                WHERE NOT coalesce(l_quantity <= 45, FALSE)
                UNION ALL
                SELECT 'tax_band', l_extendedprice FROM f
                WHERE NOT coalesce(l_tax < 0.04, FALSE)
                UNION ALL
                SELECT 'price_positive', l_extendedprice FROM f
                WHERE NOT coalesce(l_extendedprice > 0, FALSE)
            )
            SELECT violation, count(*) AS n_rows,
                   floor(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
                         * 1e2 / (count(*) * 100) + 0.5) / 1e2 AS avg_price
            FROM viol GROUP BY violation
        """,
        "q76_binational_volume": """
            SELECT sn.n_name AS supp_nation,
                   cn.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INT) AS l_year,
                   floor(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
                         * 1e2 / 10000 + 0.5) / 1e2 AS revenue,
                   count(*) AS n_lines
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            WHERE (cn.n_name = 'NATION_3' AND sn.n_name = 'NATION_7')
               OR (cn.n_name = 'NATION_7' AND sn.n_name = 'NATION_3')
            GROUP BY 1, 2, 3
        """,
        "q77_market_share": """
            SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                   floor(CAST(sum(CASE WHEN n_name = 'NATION_5'
                                       THEN CAST(round(l_extendedprice
                                                       * (1 - l_discount)
                                                       * 10000) AS BIGINT)
                                       ELSE 0 END) AS DOUBLE) * 1e6
                         / sum(CAST(round(l_extendedprice * (1 - l_discount)
                                          * 10000) AS BIGINT))
                         + 0.5) / 1e6 AS mkt_share,
                   count(*) AS n_lines
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY 1
        """,
        "q78_frame_navigation": """
            SELECT o_custkey, o_orderkey,
                   round(first_value(o_totalprice) OVER w, 2) AS first_price,
                   round(last_value(o_totalprice) OVER w, 2) AS latest_price,
                   round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price
            FROM orders
            WHERE o_orderkey < 3000
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "q79_vector_hof_stats": """
            WITH per_vec AS (
                SELECT label,
                       sqrt(list_aggregate(
                           list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
                           'sum')) AS l2,
                       len(list_filter(CAST(embedding AS DOUBLE[]),
                                       x -> x < 0)) AS n_neg,
                       list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                               x -> abs(x))) AS max_abs,
                       CASE WHEN len(list_filter(CAST(embedding AS DOUBLE[]),
                                                 x -> abs(x) > 2.0)) > 0
                            THEN 1 ELSE 0 END AS spiky
                FROM embeddings
            )
            SELECT label,
                   count(*) AS n_vecs,
                   round(avg(l2), 6) AS avg_l2,
                   CAST(sum(n_neg) AS BIGINT) AS total_neg,
                   round(max(max_abs), 6) AS corpus_max_abs,
                   CAST(sum(spiky) AS BIGINT) AS n_spiky
            FROM per_vec GROUP BY label
        """,
        "q80_event_funnel": """
            WITH users AS (
                SELECT DISTINCT user_id FROM events
            ), v AS (
                SELECT user_id, min(ts) AS t_view FROM events
                WHERE event_type = 'view' GROUP BY user_id
            ), c AS (
                SELECT e.user_id, min(e.ts) AS t_click
                FROM events e JOIN v ON e.user_id = v.user_id
                WHERE e.event_type = 'click' AND e.ts > v.t_view
                GROUP BY e.user_id
            ), p AS (
                SELECT e.user_id, min(e.ts) AS t_purchase
                FROM events e JOIN c ON e.user_id = c.user_id
                WHERE e.event_type = 'purchase' AND e.ts > c.t_click
                GROUP BY e.user_id
            )
            SELECT count(*) AS n_users,
                   CAST(sum(CASE WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_viewed,
                   CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_clicked_after,
                   CAST(sum(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_purchased_after
            FROM users u
            LEFT JOIN v ON u.user_id = v.user_id
            LEFT JOIN c ON u.user_id = c.user_id
            LEFT JOIN p ON u.user_id = p.user_id
        """,
        "q81_trimmed_mean_prices": """
            WITH ranked AS (
                SELECT p_brand, p_retailprice,
                       row_number() OVER (PARTITION BY p_brand
                                          ORDER BY p_retailprice) AS rk,
                       count(*) OVER (PARTITION BY p_brand) AS n
                FROM part
            ), cut AS (
                SELECT p_brand, p_retailprice, rk, n,
                       CASE WHEN n - 2 * CAST(floor(n * 0.1) AS BIGINT) > 0
                            THEN CAST(floor(n * 0.1) AS BIGINT)
                            ELSE 0 END AS k
                FROM ranked
            )
            SELECT p_brand,
                   count(*) AS n_parts,
                   floor(CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT))
                                  FILTER (WHERE rk > k AND rk <= n - k)
                              AS DOUBLE)
                         / (100.0 * count(*)
                                FILTER (WHERE rk > k AND rk <= n - k))
                         * 1e4 + 0.5) / 1e4
                       AS trimmed_avg_price,
                   floor(CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT))
                              AS DOUBLE) / (100.0 * count(*)) * 1e4 + 0.5)
                       / 1e4 AS avg_price
            FROM cut GROUP BY p_brand
        """,
        "q82_fuzzy_name_pairs": """
            WITH names AS (
                SELECT DISTINCT p_name AS name FROM part
            ), keyed AS (
                SELECT name, string_split(name, ' ')[-1] AS noun FROM names
            )
            SELECT a.name AS name_a, b.name AS name_b,
                   CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
            FROM keyed a JOIN keyed b
              ON a.noun = b.noun AND a.name < b.name
            WHERE levenshtein(a.name, b.name) <= 3
        """,
        "q83_profile_orders": """
            SELECT 'o_orderkey' AS "column", count(*) AS n_rows,
               CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               count(DISTINCT o_orderkey) AS n_distinct,
               CAST(min(o_orderkey) AS VARCHAR) AS min_value,
               CAST(max(o_orderkey) AS VARCHAR) AS max_value FROM orders UNION ALL SELECT 'o_custkey' AS "column", count(*) AS n_rows,
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               count(DISTINCT o_custkey) AS n_distinct,
               CAST(min(o_custkey) AS VARCHAR) AS min_value,
               CAST(max(o_custkey) AS VARCHAR) AS max_value FROM orders UNION ALL SELECT 'o_orderstatus' AS "column", count(*) AS n_rows,
               CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               count(DISTINCT o_orderstatus) AS n_distinct,
               CAST(min(o_orderstatus) AS VARCHAR) AS min_value,
               CAST(max(o_orderstatus) AS VARCHAR) AS max_value FROM orders UNION ALL SELECT 'o_totalprice' AS "column", count(*) AS n_rows,
               CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               count(DISTINCT o_totalprice) AS n_distinct,
               CAST(min(o_totalprice) AS VARCHAR) AS min_value,
               CAST(max(o_totalprice) AS VARCHAR) AS max_value FROM orders UNION ALL SELECT 'o_orderpriority' AS "column", count(*) AS n_rows,
               CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               count(DISTINCT o_orderpriority) AS n_distinct,
               CAST(min(o_orderpriority) AS VARCHAR) AS min_value,
               CAST(max(o_orderpriority) AS VARCHAR) AS max_value FROM orders
        """,
        "q84_snapshot_diff": """
            WITH old AS (
                SELECT o_orderkey, o_orderstatus, o_totalprice
                FROM orders WHERE o_orderkey % 10 != 0
            ), new AS (
                SELECT o_orderkey, o_orderstatus,
                       CASE WHEN o_orderkey % 7 = 0
                            THEN round(o_totalprice * 1.1, 2)
                            ELSE o_totalprice END AS o_totalprice
                FROM orders
            ), d AS (
                SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
                            WHEN n.o_orderkey IS NULL THEN 'removed'
                            WHEN NOT (o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                                      AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice)
                                 THEN 'changed'
                            ELSE 'unchanged' END AS change
                FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
            )
            SELECT change, count(*) AS n_orders FROM d GROUP BY change
        """,
        "q85_lateral_top_line": """
            SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
            FROM orders o, LATERAL (
                SELECT l_linenumber, l_extendedprice FROM lineitem li
                WHERE li.l_orderkey = o.o_orderkey
                ORDER BY l_extendedprice DESC, l_linenumber LIMIT 1
            ) l
            WHERE o.o_orderkey < 2000
        """,
        "q86_multiset_setops": """
            SELECT 'intersect_all' AS op, count(*) AS n FROM (
                SELECT l_suppkey FROM lineitem WHERE l_discount >= 0.08
                INTERSECT ALL
                SELECT l_suppkey FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1999-01-01')
            UNION ALL
            SELECT 'except_all' AS op, count(*) AS n FROM (
                SELECT l_suppkey FROM lineitem WHERE l_discount >= 0.08
                EXCEPT ALL
                SELECT l_suppkey FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1999-01-01')
        """,
        "q87_null_safe_join": """
            WITH a AS (
                SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL
                            ELSE n_nationkey END AS ka FROM nation
            ), b AS (
                SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL
                            ELSE n_nationkey END AS kb FROM nation
            )
            SELECT ka IS NULL AS is_null_key, count(*) AS n_pairs
            FROM a JOIN b ON ka IS NOT DISTINCT FROM kb
            GROUP BY 1
        """,
        "q88_revenue_share": """
            WITH rev AS (
                SELECT n_name,
                       sum(CAST(round(l_extendedprice * (1 - l_discount)
                                      * 10000) AS BIGINT)) AS u
                FROM lineitem
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                GROUP BY n_name
            )
            SELECT n_name,
                   floor(CAST(u AS DOUBLE) * 1e1 / 10000 + 0.5) / 1e1
                       AS revenue,
                   floor(CAST(u AS DOUBLE) * 1e6 / sum(u) OVER () + 0.5) / 1e6
                       AS share
            FROM rev
        """,
        "q89_returned_item_customers": """
            SELECT c_custkey, c_name, n_name,
                   floor(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
                         * 1e2 / 10000 + 0.5) / 1e2
                       AS lost_revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-07-01'
              AND o_orderdate < TIMESTAMP '1996-10-01'
            GROUP BY c_custkey, c_name, n_name
            ORDER BY lost_revenue DESC, c_custkey
            LIMIT 20
        """,
        "q90_shipmode_priority": """
            SELECT l_shipdate > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
                       AS is_late,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS high_priority_lines,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 0 ELSE 1 END) AS BIGINT)
                       AS low_priority_lines
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1
        """,
        "q91_local_supplier_volume": """
            SELECT n_name,
                   floor(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
                         * 1e2 / 10000 + 0.5) / 1e2 AS revenue,
                   count(*) AS n_lines
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE c_nationkey = s_nationkey
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
        """,
        "q92_try_arithmetic": """
            SELECT l_returnflag,
                   count(*) AS n_rows,
                   CAST(sum(CASE WHEN l_discount / nullif(l_tax, 0) IS NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_null_ratio,
                   floor(CAST(sum(CAST(CAST(round(l_discount * 100) AS BIGINT) * 840
                                       / nullif(CAST(round(l_tax * 100) AS BIGINT), 0)
                                       AS BIGINT)) AS DOUBLE)
                         * 1e6 / (count(l_discount / nullif(l_tax, 0)) * 840) + 0.5)
                       / 1e6 AS avg_ratio
            FROM lineitem GROUP BY l_returnflag
        """,
        "q93_decimal_exact_revenue": """
            SELECT l_linestatus,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS exact_revenue,
                   count(*) AS n_lines
            FROM lineitem GROUP BY l_linestatus
        """,
        "q94_status_count_map": """
            SELECT o_orderpriority,
                   CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_f,
                   CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_o,
                   CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_p,
                   CAST(count(DISTINCT o_orderstatus) AS INT) AS n_statuses
            FROM orders GROUP BY o_orderpriority
        """,
        "q95_top_customer_roster": """
            WITH ranked AS (
                SELECT c_mktsegment, c_name, c_acctbal,
                       row_number() OVER (PARTITION BY c_mktsegment
                           ORDER BY c_acctbal DESC, c_custkey) AS rk
                FROM customer
            )
            SELECT c_mktsegment,
                   string_agg(c_name, ',' ORDER BY rk) AS roster,
                   round(sum(c_acctbal), 2) AS top3_balance
            FROM ranked WHERE rk <= 3
            GROUP BY c_mktsegment
        """,
        "q96_array_set_ops": f"""
            WITH per_doc AS (
                SELECT lang,
                       list_distinct({_TOKS}) AS toks,
                       ['the', 'a', 'and', 'of', 'to'] AS stops
                FROM documents
            ), sized AS (
                SELECT lang,
                       len(list_distinct(list_concat(toks, stops))) AS n_union,
                       len(list_intersect(toks, stops)) AS n_stop_hits,
                       len(list_filter(toks,
                           t -> NOT list_contains(stops, t))) AS n_content
                FROM per_doc
            )
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_union) AS BIGINT) AS total_union,
                   CAST(sum(n_stop_hits) AS BIGINT) AS total_stop_hits,
                   CAST(sum(n_content) AS BIGINT) AS total_content
            FROM sized GROUP BY lang
        """,
        "q97_temporal_functions": """
            WITH t AS (
                SELECT strftime(CAST(date_trunc('quarter', o_orderdate)
                                      AS DATE), '%Y-%m-%d') AS qtr,
                       dayofweek(o_orderdate) AS dow,
                       strftime(last_day(CAST(o_orderdate AS DATE)),
                                '%Y-%m-%d') AS month_end,
                       datediff('day', CAST(o_orderdate AS DATE),
                                DATE '1997-01-01') AS days_to_97
                FROM orders
            )
            SELECT qtr, count(*) AS n_orders,
                   CAST(sum(CASE WHEN dow = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_sunday,
                   count(DISTINCT month_end) AS n_month_ends,
                   floor(CAST(sum(days_to_97) AS DOUBLE) * 1e4 / count(*)
                         + 0.5) / 1e4 AS avg_days_to_97
            FROM t GROUP BY qtr
        """,
        "q98_forward_fill": """
            WITH sparse AS (
                SELECT user_id, ts, event_type, value,
                       CASE WHEN (user_id + dayofmonth(ts)) % 3 = 0
                            THEN value END AS reading
                FROM events WHERE user_id < 50
            ), filled AS (
                SELECT user_id,
                       last_value(reading IGNORE NULLS) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_type, value
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS filled
                FROM sparse
            )
            SELECT user_id, count(*) AS n_rows,
                   CAST(sum(CASE WHEN filled IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_still_null,
                   round(sum(filled), 4) AS sum_filled
            FROM filled GROUP BY user_id
        """,
        "q99_mad_outliers": """
            WITH cents AS (
                SELECT c_mktsegment,
                       CAST(round(c_acctbal * 100) AS BIGINT) AS cents
                FROM customer
            ), med AS (
                SELECT c_mktsegment,
                       quantile_cont(cents, 0.5) AS med
                FROM cents GROUP BY c_mktsegment
            ), dev AS (
                SELECT c.c_mktsegment, m.med,
                       abs(c.cents - m.med) AS adev
                FROM cents c JOIN med m USING (c_mktsegment)
            ), mad AS (
                SELECT c_mktsegment, quantile_cont(adev, 0.5) AS mad
                FROM dev GROUP BY c_mktsegment
            )
            SELECT d.c_mktsegment,
                   count(*) AS n_customers,
                   floor(min(d.med) + 0.5) / 100.0 AS median_bal,
                   floor(min(m.mad) + 0.5) / 100.0 AS mad_bal,
                   CAST(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_outliers
            FROM dev d JOIN mad m USING (c_mktsegment)
            GROUP BY d.c_mktsegment
        """,
        "q100_cohort_retention": """
            WITH em AS (
                SELECT user_id,
                       strftime(CAST(date_trunc('month', ts) AS DATE), '%Y-%m')
                           AS month
                FROM events
            ), cohort AS (
                SELECT user_id, min(month) AS cohort_month FROM em GROUP BY user_id
            )
            SELECT c.cohort_month, em.month AS active_month,
                   count(DISTINCT em.user_id) AS n_users
            FROM em JOIN cohort c USING (user_id)
            GROUP BY c.cohort_month, em.month
        """,
        "q101_dataset_split": f"""
            WITH s AS (
                SELECT lang, n_chars,
                       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                                 < '{_SPLIT_THRESHOLDS[0][1]}' THEN 'train'
                            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                                 < '{_SPLIT_THRESHOLDS[1][1]}' THEN 'val'
                            ELSE 'test' END AS split
                FROM documents
            )
            SELECT split, lang, count(*) AS n_docs,
                   floor(CAST(sum(n_chars) AS DOUBLE) * 1e6 / count(*)
                         + 0.5) / 1e6 AS avg_chars
            FROM s GROUP BY split, lang
        """,
        "q102_decontamination": f"""
            WITH tok AS (
                SELECT doc_id, source, {_TOKS} AS toks FROM documents
            ), sh AS (
                SELECT doc_id, source, {_SHINGLES3} AS s FROM tok
            ), bench AS (
                SELECT DISTINCT unnest(s) AS g FROM sh
                WHERE source IN ('src0', 'src1')
            ), corp AS (
                SELECT doc_id, unnest(s) AS g FROM sh
                WHERE source NOT IN ('src0', 'src1')
            ), per AS (
                SELECT c.doc_id, count(*) AS n_shingles,
                       CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_matched
                FROM corp c LEFT JOIN bench b USING (g)
                GROUP BY c.doc_id
            )
            SELECT doc_id, n_shingles, n_matched,
                   floor((CAST(n_matched AS DOUBLE) / n_shingles) * 1e6 + 0.5) / 1e6 AS containment
            FROM per WHERE n_matched * 1.0 / n_shingles >= 0.5
        """,
        "q103_weighted_allocation": """
            WITH w AS (
                SELECT source, sum(n_chars) AS sw FROM documents GROUP BY source
            ), tot AS (
                SELECT sum(sw) AS tw FROM w
            ), alloc AS (
                SELECT source, (100 * sw) // tw AS a FROM w, tot
            ), ranked AS (
                SELECT doc_id, source,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                                   doc_id) AS sample_rank
                FROM documents
            )
            SELECT r.doc_id, r.source, r.sample_rank
            FROM ranked r JOIN alloc a USING (source)
            WHERE r.sample_rank <= a.a
        """,
        "q104_semantic_dedup": """
            WITH v AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
            ), cent AS (
                SELECT vec_id AS cid, ve AS cv FROM v ORDER BY vec_id LIMIT 16
            ), scored AS (
                SELECT v.vec_id, c.cid,
                       list_cosine_similarity(v.ve, c.cv) AS sim
                FROM v CROSS JOIN cent c
            ), assigned AS (
                SELECT vec_id, cid, sim FROM (
                    SELECT vec_id, cid, sim,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY sim DESC, cid) AS r
                    FROM scored
                ) WHERE r = 1
            ), reps AS (
                SELECT cid, vec_id, sim,
                       row_number() OVER (PARTITION BY cid
                                          ORDER BY sim DESC, vec_id) AS rr,
                       count(*) OVER (PARTITION BY cid) AS n_members,
                       max(sim) OVER (PARTITION BY cid) AS msim
                FROM assigned
            )
            SELECT cid, vec_id AS rep_id, n_members,
                   round(msim, 6) AS rep_sim
            FROM reps WHERE rr = 1
        """,
        "q105_fk_audit": """
            SELECT 'lineitem.orderkey' AS relation,
                   count(*) AS n_rows,
                   CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_null_fk,
                   (SELECT count(*) FROM lineitem
                    WHERE l_orderkey IS NOT NULL
                      AND l_orderkey NOT IN (SELECT o_orderkey FROM orders
                                             WHERE o_orderkey IS NOT NULL))
                       AS n_orphans
            FROM lineitem
            UNION ALL
            SELECT 'orders.custkey', count(*),
                   CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   (SELECT count(*) FROM orders
                    WHERE o_custkey IS NOT NULL
                      AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                            WHERE c_custkey IS NOT NULL))
            FROM orders
            UNION ALL
            SELECT 'customer.nationkey', count(*),
                   CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   (SELECT count(*) FROM customer
                    WHERE c_nationkey IS NOT NULL
                      AND c_nationkey NOT IN (SELECT n_nationkey FROM nation
                                              WHERE n_nationkey IS NOT NULL))
            FROM customer
            UNION ALL
            SELECT 'supplier.nationkey', count(*),
                   CAST(sum(CASE WHEN s_nationkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   (SELECT count(*) FROM supplier
                    WHERE s_nationkey IS NOT NULL
                      AND s_nationkey NOT IN (SELECT n_nationkey FROM nation
                                              WHERE n_nationkey IS NOT NULL))
            FROM supplier
            UNION ALL
            SELECT 'nation.regionkey', count(*),
                   CAST(sum(CASE WHEN n_regionkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   (SELECT count(*) FROM nation
                    WHERE n_regionkey IS NOT NULL
                      AND n_regionkey NOT IN (SELECT r_regionkey FROM region
                                              WHERE r_regionkey IS NOT NULL))
            FROM nation
        """,
        "q106_price_histogram": """
            SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bucket,
                   CAST(floor(l_extendedprice / 5000) AS BIGINT) * 5000
                       AS price_lo,
                   count(*) AS n_items,
                   round(sum(l_extendedprice), 2) AS bucket_revenue
            FROM lineitem
            GROUP BY 1
        """,
        "q107_scd2_priority_history": """
            WITH flagged AS (
                SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
                       CASE WHEN row_number() OVER w = 1
                              OR o_orderpriority IS DISTINCT FROM
                                 lag(o_orderpriority) OVER w
                            THEN 1 ELSE 0 END AS chg
                FROM orders
                WINDOW w AS (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey)
            ), islands AS (
                SELECT o_custkey, o_orderpriority, o_orderdate,
                       CAST(sum(chg) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey
                                           ROWS UNBOUNDED PRECEDING)
                            AS BIGINT) AS version
                FROM flagged
            ), per_version AS (
                SELECT o_custkey, version,
                       min(o_orderpriority) AS o_orderpriority,
                       min(o_orderdate) AS valid_from,
                       count(*) AS n_obs
                FROM islands GROUP BY o_custkey, version
            )
            SELECT o_custkey, o_orderpriority, version, valid_from,
                   lead(valid_from) OVER (PARTITION BY o_custkey
                                          ORDER BY version) AS valid_to,
                   n_obs
            FROM per_version
        """,
        "q108_embedding_quantization": """
            WITH v AS (
                SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ve
                FROM embeddings
            ), scaled AS (
                SELECT vec_id, label, ve,
                       list_min(ve) AS mn,
                       (list_max(ve) - list_min(ve)) / 255.0 AS scale
                FROM v
                WHERE list_max(ve) > list_min(ve)
            ), err AS (
                SELECT vec_id, label,
                       list_sum(list_transform(
                           list_transform(ve,
                               x -> x - (mn + round((x - mn) / scale) * scale)),
                           d -> d * d
                       )) / len(ve) AS mse
                FROM scaled
            )
            SELECT label, count(*) AS n_vecs,
                   round(avg(mse) * 1e6, 6) AS avg_mse_ppm,
                   round(max(mse) * 1e6, 6) AS max_mse_ppm
            FROM err GROUP BY label
        """,
        "q110_binned_range_join": """
            WITH bands(band, lo, hi) AS (
                VALUES ('budget', 0.0, 20000.0),
                       ('mid', 15000.0, 40000.0),
                       ('premium', 35000.0, 70000.0)
            )
            SELECT band, count(*) AS n_items,
                   floor(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
                         * 1e1 / 100 + 0.5) / 1e1 AS sum_price
            FROM lineitem JOIN bands
              ON l_extendedprice BETWEEN lo AND hi
            GROUP BY band
        """,
        "q111_promo_revenue_share": """
            SELECT strftime(CAST(date_trunc('month', l_shipdate) AS DATE),
                            '%Y-%m') AS month,
                   floor(CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                                       THEN CAST(round(l_extendedprice
                                                       * (1 - l_discount)
                                                       * 10000) AS BIGINT)
                                       ELSE 0 END) AS DOUBLE) * 1e6
                         / sum(CAST(round(l_extendedprice * (1 - l_discount)
                                          * 10000) AS BIGINT))
                         + 0.5) / 1e4 AS promo_pct,
                   count(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1
        """,
        "q112_top_supplier": """
            WITH rev AS (
                SELECT l_suppkey,
                       floor(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
                             * 1e2 / 10000 + 0.5) / 1e2
                           AS total_rev
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-07-01'
                GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, total_rev
            FROM rev JOIN supplier ON l_suppkey = s_suppkey
            WHERE total_rev = (SELECT max(total_rev) FROM rev)
        """,
        "q113_big_orders": """
            WITH big AS (
                SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING sum(l_quantity) > 250
            )
            SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
                   total_qty
            FROM orders JOIN big ON o_orderkey = l_orderkey
                        JOIN customer ON o_custkey = c_custkey
        """,
        "q114_unigram_logprob": f"""
            WITH toks AS (
                SELECT doc_id, unnest({_TOKS}) AS term FROM documents
            ), t2 AS (
                SELECT doc_id, term FROM toks WHERE term <> ''
            ), counts AS (
                SELECT term, count(*) AS c FROM t2 GROUP BY term
            ), totals AS (
                SELECT CAST(sum(c) AS BIGINT) AS total, count(*) AS vocab
                FROM counts
            ), model AS (
                SELECT term, -ln((c + 1.0) / (total + vocab)) AS nll
                FROM counts, totals
            )
            SELECT t2.doc_id, count(*) AS n_tokens,
                   round(avg(m.nll), 6) AS avg_neg_logprob
            FROM t2 JOIN model m USING (term)
            GROUP BY t2.doc_id
        """,
        "q115_sequence_packing": f"""
            WITH toks AS (
                SELECT doc_id, lang, len({_TOKS}) AS n_tokens FROM documents
            ), packed AS (
                SELECT lang, n_tokens,
                       CAST((sum(n_tokens) OVER (PARTITION BY lang
                                                 ORDER BY doc_id
                                                 ROWS UNBOUNDED PRECEDING)
                             - n_tokens) AS BIGINT) // 2048 AS window_id
                FROM toks
            )
            SELECT lang, window_id, count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS window_tokens
            FROM packed GROUP BY lang, window_id
        """,
        "q116_key_skew_profile": """
            WITH ok AS (
                SELECT l_orderkey AS _k, count(*) AS _n FROM lineitem GROUP BY 1
            ), pk AS (
                SELECT l_partkey AS _k, count(*) AS _n FROM lineitem GROUP BY 1
            )
            SELECT 'l_orderkey' AS key,
                   length(CAST(_n AS VARCHAR)) AS magnitude,
                   count(*) AS n_keys,
                   CAST(sum(_n) AS BIGINT) AS n_rows,
                   max(_n) AS max_rows_per_key
            FROM ok GROUP BY 2
            UNION ALL
            SELECT 'l_partkey', length(CAST(_n AS VARCHAR)), count(*),
                   CAST(sum(_n) AS BIGINT), max(_n)
            FROM pk GROUP BY 2
        """,
        "q117_mom_revenue_growth": """
            WITH monthly AS (
                SELECT strftime(CAST(date_trunc('month', o_orderdate) AS DATE),
                                '%Y-%m') AS month,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS u
                FROM orders GROUP BY 1
            )
            SELECT month, round(u / 100.0, 2) AS revenue,
                   floor(CAST(u - lag(u) OVER (ORDER BY month) AS DOUBLE)
                         * 1e6 / lag(u) OVER (ORDER BY month) + 0.5) / 1e4
                       AS mom_pct
            FROM monthly
        """,
        "q118_status_transitions": """
            WITH seq AS (
                SELECT lag(o_orderstatus) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderdate,
                                                         o_orderkey)
                           AS from_status,
                       o_orderstatus AS to_status
                FROM orders
            )
            SELECT from_status, to_status, count(*) AS n_transitions
            FROM seq WHERE from_status IS NOT NULL
            GROUP BY from_status, to_status
        """,
        "q119_copurchase_lift": """
            WITH basket AS (
                SELECT DISTINCT l_orderkey, p_brand
                FROM lineitem JOIN part ON l_partkey = p_partkey
            ), n_orders AS (
                SELECT count(DISTINCT l_orderkey) AS n FROM basket
            ), brand_n AS (
                SELECT p_brand, count(*) AS n FROM basket GROUP BY p_brand
            ), pair_n AS (
                SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
                       count(*) AS n_both
                FROM basket a JOIN basket b
                  ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
                GROUP BY 1, 2
                HAVING count(*) >= 50
            )
            SELECT brand_a, brand_b, n_both,
                   floor((n_both * (SELECT CAST(n AS DOUBLE) FROM n_orders)
                          / (na.n * nb.n)) * 1e6 + 0.5) / 1e6 AS lift
            FROM pair_n
            JOIN brand_n na ON na.p_brand = brand_a
            JOIN brand_n nb ON nb.p_brand = brand_b
        """,
        "q120_lsh_multitable_topk": _lsh_topk_sql(
            k=3, num_planes=4, dim=64, max_query_id=5, probes=2, num_tables=4
        ),
        # occurrence 4-grams (multiplicity kept, no short-text fallback):
        # docs under 4 tokens emit nothing and drop out
        "q121_dup_ngram_fraction": f"""
            WITH tok AS (
                SELECT doc_id, {_TOKS} AS toks FROM documents
            ), g AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(toks) - 4 + 2),
                              i -> array_to_string(toks[i:i+3], ' '))) AS gram
                FROM tok
            ), gd AS (
                SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY gram
            )
            SELECT doc_id,
                   count(*) AS total_ngrams,
                   CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS dup_ngrams,
                   floor((CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)
                               AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6
                       AS dup_frac
            FROM g JOIN gd USING (gram)
            GROUP BY doc_id
        """,
        "q122_gopher_quality_rules": f"""
            WITH ann AS (
                SELECT source,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                       END AS wc,
                       length(regexp_replace(trim(text), '\\s+', '', 'g'))
                           AS char_mass,
                       len(list_filter({_TOKS},
                           t -> regexp_full_match(t, '[a-z]+'))) AS alpha_words
                FROM documents
            ), fl AS (
                SELECT source,
                       (wc < 50 OR wc > 2000) AS wc_fail,
                       (wc = 0 OR char_mass / wc < 3.0
                                OR char_mass / wc > 10.0) AS mwl_fail,
                       (wc = 0 OR alpha_words / wc < 0.6) AS alpha_fail
                FROM ann
            )
            SELECT source,
                   count(*) AS n_docs,
                   CAST(sum(CASE WHEN wc_fail THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_wordcount_fail,
                   CAST(sum(CASE WHEN mwl_fail THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_meanwordlen_fail,
                   CAST(sum(CASE WHEN alpha_fail THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_alphafrac_fail,
                   CAST(sum(CASE WHEN NOT wc_fail AND NOT mwl_fail
                                      AND NOT alpha_fail
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
            FROM fl GROUP BY source
        """,
        "q123_top_bigrams_per_lang": f"""
            WITH tok AS (
                SELECT lang, {_TOKS} AS toks FROM documents
            ), g AS (
                SELECT lang,
                       unnest(list_transform(range(1, len(toks)),
                              i -> array_to_string(toks[i:i+1], ' '))) AS ngram
                FROM tok
            ), counts AS (
                SELECT lang, ngram, count(*) AS n_occurrences
                FROM g GROUP BY lang, ngram
            ), ranked AS (
                SELECT lang, ngram, n_occurrences,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY n_occurrences DESC, ngram)
                           AS rank
                FROM counts
            )
            SELECT lang, ngram, n_occurrences, rank
            FROM ranked WHERE rank <= 3
        """,
        "q124_split_leakage": f"""
            WITH tok AS (
                SELECT doc_id, {_TOKS} AS toks FROM documents
            ), shg AS (
                SELECT doc_id, {_SHINGLES3} AS sh FROM tok
            ), sig AS (
                SELECT doc_id, sh, {_sig_exprs(8)} AS sg
                FROM (SELECT doc_id, sh, {_SHINGLE_HASH} AS hs FROM shg)
            ), banded AS (
                SELECT doc_id, sh, b AS band_idx,
                       CAST(b AS VARCHAR) || '|' || array_to_string(sg[b*2+1:b*2+2], '|') AS band
                FROM sig, (SELECT unnest(range(0, 4)) AS b)
            ), cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
            ), pairs AS (
                SELECT c.id_a, c.id_b,
                       floor((CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                             / len(list_distinct(list_concat(x.sh, y.sh)))) * 1e6 + 0.5) / 1e6 AS jaccard
                FROM cand c
                JOIN shg x ON x.doc_id = c.id_a
                JOIN shg y ON y.doc_id = c.id_b
                WHERE len(list_intersect(x.sh, y.sh)) * 1.0
                      / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.1
            ), sp AS (
                SELECT doc_id,
                       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                                 < '{_SPLIT_THRESHOLDS[0][1]}' THEN 'train'
                            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                                 < '{_SPLIT_THRESHOLDS[1][1]}' THEN 'val'
                            ELSE 'test' END AS split
                FROM documents
            )
            SELECT p.id_a, p.id_b, a.split AS split_a, b.split AS split_b,
                   p.jaccard
            FROM pairs p
            JOIN sp a ON a.doc_id = p.id_a
            JOIN sp b ON b.doc_id = p.id_b
            WHERE a.split != b.split
        """,
        "q125_price_moments": """
            WITH agg AS (
                SELECT p_brand,
                       count(*) AS n,
                       sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS s1,
                       sum(CAST(round(p_retailprice * 100) AS BIGINT)
                           * CAST(round(p_retailprice * 100) AS BIGINT)) AS s2,
                       avg(p_retailprice) AS m1,
                       avg(p_retailprice * p_retailprice) AS m2,
                       avg(p_retailprice * p_retailprice * p_retailprice) AS m3
                FROM part GROUP BY p_brand
            ), moments AS (
                SELECT agg.*,
                       (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1e4) AS vp
                FROM agg
            )
            SELECT p_brand, n,
                   floor(CAST(s1 AS DOUBLE) * 1e4 / (n * 100) + 0.5) / 1e4
                       AS mean_price,
                   floor(vp * 1e4 + 0.5) / 1e4 AS var_price,
                   round(CASE WHEN n * s2 - s1 * s1 > 0 AND vp > 0
                              THEN (m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1)
                                   / (sqrt(vp) * vp)
                         END, 6) + 0.0 AS skew_price
            FROM moments
        """,
        "q126_chunk_dedup": """
            WITH words AS (
                SELECT doc_id, string_split(text, ' ') AS w FROM documents
            ), numbered AS (
                SELECT doc_id, w,
                       unnest(range(0, CAST(ceil(len(w) / 10.0) AS BIGINT))) AS c
                FROM words
            ), chunks AS (
                SELECT doc_id,
                       md5(array_to_string(w[c*10+1 : c*10+10], ' ')) AS h
                FROM numbered
            ), counts AS (
                SELECT h, count(*) AS n FROM chunks GROUP BY h
            ), per_doc AS (
                SELECT doc_id, count(*) AS n_chunks,
                       sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS dup_chunks
                FROM chunks JOIN counts USING (h) GROUP BY doc_id
            )
            SELECT doc_id,
                   n_chunks,
                   CAST(dup_chunks AS BIGINT) AS dup_chunks,
                   floor((CAST(dup_chunks AS DOUBLE) / n_chunks) * 1e6 + 0.5) / 1e6 AS dup_fraction,
                   (dup_chunks / n_chunks) < 0.5 AS keep
            FROM per_doc
        """,
        "q127_perplexity_buckets": f"""
            WITH toks AS (
                SELECT doc_id, unnest({_TOKS}) AS term FROM documents
            ), t2 AS (
                SELECT doc_id, term FROM toks WHERE term <> ''
            ), counts AS (
                SELECT term, count(*) AS c FROM t2 GROUP BY term
            ), totals AS (
                SELECT CAST(sum(c) AS BIGINT) AS total, count(*) AS vocab
                FROM counts
            ), model AS (
                SELECT term, -ln((c + 1.0) / (total + vocab)) AS nll
                FROM counts, totals
            ), scores AS (
                SELECT t2.doc_id, count(*) AS n_tokens,
                       round(avg(m.nll), 6) AS avg_neg_logprob
                FROM t2 JOIN model m USING (term)
                GROUP BY t2.doc_id
            ), dist AS (
                SELECT avg_neg_logprob AS s, count(*) AS c
                FROM scores GROUP BY 1
            ), cum AS (
                SELECT s,
                       sum(c) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING)
                           AS cumc,
                       sum(c) OVER () AS n
                FROM dist
            ), cuts AS (
                SELECT min(CASE WHEN cumc >= ceil(n * (1.0/3)) THEN s END)
                           AS cut1,
                       min(CASE WHEN cumc >= ceil(n * (2.0/3)) THEN s END)
                           AS cut2
                FROM cum
            ), tiered AS (
                SELECT sc.*,
                       1 + CAST(sc.avg_neg_logprob > cut1 AS INT)
                         + CAST(sc.avg_neg_logprob > cut2 AS INT) AS bucket
                FROM scores sc CROSS JOIN cuts
            )
            SELECT bucket,
                   count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                   floor(CAST(sum(CAST(round(avg_neg_logprob * 1e6) AS BIGINT))
                              AS DOUBLE) / count(*) + 0.5) / 1e6
                       AS avg_score,
                   min(avg_neg_logprob) AS min_score,
                   max(avg_neg_logprob) AS max_score
            FROM tiered GROUP BY bucket
        """,
        "q128_domain_caps": """
            WITH ranked AS (
                SELECT source, n_chars,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY n_chars DESC, doc_id)
                           AS rk
                FROM documents
            ), total AS (
                SELECT source, count(*) AS n_total,
                       CAST(sum(n_chars) AS BIGINT) AS total_chars
                FROM documents GROUP BY source
            ), kept AS (
                SELECT source, count(*) AS n_kept,
                       CAST(sum(n_chars) AS BIGINT) AS kept_chars
                FROM ranked WHERE rk <= 20 GROUP BY source
            )
            SELECT source, n_total, n_kept, total_chars, kept_chars
            FROM total JOIN kept USING (source)
        """,
        "q129_token_budget_mix": f"""
            WITH per_lang AS (
                SELECT lang,
                       CAST(sum(len(regexp_split_to_array(trim(text), '\\s+')))
                            AS BIGINT) AS avail_tokens
                FROM documents GROUP BY lang
            ), total AS (
                SELECT CAST(sum(avail_tokens) AS BIGINT) AS t FROM per_lang
            ), weighted AS (
                -- exact-integer milli-token allocation: t*w1000 is always
                -- even, so alloc_milli is an exact BIGINT and the
                -- 2-decimal value is an explicit half-up integer step —
                -- no double-vs-DECIMAL rounding divergence at x.xx5
                SELECT lang, avail_tokens,
                       CAST(t * (CASE lang
                                 WHEN 'en' THEN 500 WHEN 'zh' THEN 150
                                 WHEN 'es' THEN 150 WHEN 'de' THEN 100
                                 WHEN 'fr' THEN 100 END) // 2
                            AS BIGINT) AS alloc_milli
                FROM per_lang, total
            )
            SELECT lang, avail_tokens,
                   CAST((alloc_milli + 5) // 10 AS BIGINT) / 100.0
                       AS alloc_tokens,
                   round(least(1.0, alloc_milli / (avail_tokens * 1000.0)),
                         6) AS sample_rate,
                   round(alloc_milli / (avail_tokens * 1000.0), 6) AS epochs
            FROM weighted
        """,
        "q130_product_profit": """
            SELECT n_name AS nation,
                   CAST(year(o_orderdate) AS INTEGER) AS o_year,
                   round(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                        * 100, 0) AS BIGINT)
                             - CAST(round(l_quantity * p_retailprice * 20, 0)
                                    AS BIGINT)) / 100.0, 2)
                       AS sum_profit
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_type = 'ECONOMY'
            GROUP BY n_name, year(o_orderdate)
        """,
        "q131_pq_recon_error": """
            WITH base AS (
                SELECT vec_id, label, embedding,
                       unnest(range(0, 4)) AS sub_id
                FROM embeddings
            ), subs AS (
                SELECT vec_id, label, sub_id,
                       list_transform(embedding[sub_id*16+1 : sub_id*16+16],
                                      x -> CAST(x AS DOUBLE)) AS sv
                FROM base
            ), cb_base AS (
                SELECT vec_id AS code, embedding, unnest(range(0, 4)) AS sub_id
                FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 4)
            ), codebook AS (
                SELECT sub_id, code,
                       list_transform(embedding[sub_id*16+1 : sub_id*16+16],
                                      x -> CAST(x AS DOUBLE)) AS cv
                FROM cb_base
            ), dists AS (
                SELECT s.vec_id, s.label, s.sub_id, c.code,
                       CAST(floor(list_sum(list_transform(list_zip(s.sv, c.cv),
                                      p -> (p[1]-p[2])*(p[1]-p[2]))) * 1e6
                                  + 0.5) AS BIGINT) AS k
                FROM subs s JOIN codebook c USING (sub_id)
            ), best AS (
                SELECT vec_id, label, sub_id, k,
                       row_number() OVER (PARTITION BY vec_id, sub_id
                                          ORDER BY k, code) AS rk
                FROM dists
            ), err AS (
                SELECT vec_id, label, CAST(sum(k) AS BIGINT) AS e
                FROM best WHERE rk = 1 GROUP BY vec_id, label
            )
            SELECT label,
                   count(*) AS n_vecs,
                   floor(CAST(sum(e) AS DOUBLE) / count(*) + 0.5) / 1e6
                       AS avg_recon_err,
                   CAST(max(e) AS DOUBLE) / 1e6 AS max_recon_err
            FROM err GROUP BY label
        """,
        "q132_pq_adc_topk": """
            WITH subs AS (
                SELECT vec_id, sub_id,
                       list_transform(embedding[sub_id*16+1 : sub_id*16+16],
                                      x -> CAST(x AS DOUBLE)) AS sv
                FROM (SELECT vec_id, embedding, unnest(range(0, 4)) AS sub_id
                      FROM embeddings)
            ), codebook AS (
                SELECT sub_id, code,
                       list_transform(embedding[sub_id*16+1 : sub_id*16+16],
                                      x -> CAST(x AS DOUBLE)) AS cv
                FROM (SELECT vec_id AS code, embedding,
                             unnest(range(0, 4)) AS sub_id
                      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 4))
            ), dists AS (
                SELECT s.vec_id, s.sub_id, c.code,
                       round(list_sum(list_transform(list_zip(s.sv, c.cv),
                                      p -> (p[1]-p[2])*(p[1]-p[2]))), 6) AS d
                FROM subs s JOIN codebook c USING (sub_id)
            ), codes AS (
                SELECT vec_id, sub_id, code FROM (
                    SELECT vec_id, sub_id, code,
                           row_number() OVER (PARTITION BY vec_id, sub_id
                                              ORDER BY d, code) AS rk
                    FROM dists
                ) WHERE rk = 1
            ), lut AS (
                SELECT vec_id AS qid, sub_id, code, d AS ld
                FROM dists WHERE vec_id < 10
            ), scored AS (
                SELECT l.qid, c.vec_id AS cid,
                       round(sum(l.ld), 6) AS adc_dist
                FROM codes c JOIN lut l USING (sub_id, code)
                GROUP BY l.qid, c.vec_id
            ), ranked AS (
                SELECT qid, cid, adc_dist,
                       row_number() OVER (PARTITION BY qid
                                          ORDER BY adc_dist, cid) AS rank
                FROM scored WHERE qid <> cid
            )
            SELECT qid AS query_id, cid AS neighbor_id, adc_dist, rank
            FROM ranked WHERE rank <= 5
        """,
        "q133_partition_completeness": """
            WITH daily AS (
                SELECT CAST(ts AS DATE) AS day, count(*) AS n_rows
                FROM events GROUP BY 1
            ), bounds AS (
                SELECT min(day) AS lo, max(day) AS hi, avg(n_rows) AS mean_n
                FROM daily
            ), spine AS (
                SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE
                           AS day,
                       mean_n
                FROM bounds
            )
            SELECT strftime(s.day, '%Y-%m-%d') AS day,
                   coalesce(d.n_rows, 0) AS n_rows,
                   CASE WHEN d.n_rows IS NULL THEN 'missing'
                        WHEN d.n_rows < s.mean_n * 0.5 THEN 'low'
                        ELSE 'ok' END AS status
            FROM spine s LEFT JOIN daily d USING (day)
        """,
        "q134_part_supplier_stats": """
            SELECT p_brand, p_size,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_type <> 'PROMO'
              AND l_suppkey NOT IN
                  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY p_brand, p_size
        """,
        "q135_cumulative_distinct_users": """
            WITH active AS (
                SELECT CAST(ts AS DATE) AS day,
                       count(DISTINCT user_id) AS active_users
                FROM events GROUP BY 1
            ), firsts AS (
                SELECT user_id, min(CAST(ts AS DATE)) AS day
                FROM events GROUP BY user_id
            ), new AS (
                SELECT day, count(*) AS new_users FROM firsts GROUP BY day
            )
            SELECT strftime(a.day, '%Y-%m-%d') AS day, a.active_users,
                   coalesce(n.new_users, 0) AS new_users,
                   CAST(sum(coalesce(n.new_users, 0))
                        OVER (ORDER BY a.day
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS cum_users
            FROM active a LEFT JOIN new n USING (day)
        """,
        "q136_weighted_median": """
            WITH grouped AS (
                SELECT l_returnflag AS flag, l_extendedprice AS price,
                       sum(l_quantity) AS wt
                FROM lineitem GROUP BY 1, 2
            ), ranked AS (
                SELECT flag, price,
                       sum(wt) OVER (PARTITION BY flag ORDER BY price
                                     ROWS UNBOUNDED PRECEDING) AS cum,
                       sum(wt) OVER (PARTITION BY flag) AS tot
                FROM grouped
            )
            SELECT flag, min(price) AS weighted_median_price
            FROM ranked WHERE cum >= tot / 2
            GROUP BY flag
        """,
        "q137_brand_triangles": """
            WITH baskets AS (
                SELECT DISTINCT l_orderkey, p_brand AS brand
                FROM lineitem JOIN part ON l_partkey = p_partkey
            ), edges AS (
                SELECT a.brand AS x, b.brand AS y
                FROM baskets a JOIN baskets b USING (l_orderkey)
                WHERE a.brand < b.brand
                GROUP BY 1, 2
                HAVING count(*) >= 5
            ), tri AS (
                SELECT e1.x, e1.y, e2.y AS z
                FROM edges e1
                JOIN edges e2 ON e1.y = e2.x
                JOIN edges e3 ON e1.x = e3.x AND e2.y = e3.y
            ), nodes AS (
                SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri
            )
            SELECT node, count(*) AS triangles FROM nodes GROUP BY node
        """,
        "q138_split_drift": f"""
            WITH s AS (
                SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                                 < '{_SPLIT_THRESHOLDS[0][1]}' THEN 'train'
                            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                                 < '{_SPLIT_THRESHOLDS[1][1]}' THEN 'val'
                            ELSE 'test' END AS split,
                       CAST(floor(n_chars / 100.0) AS BIGINT) AS bucket
                FROM documents
            ), ob AS (
                SELECT split, bucket, count(*) AS n FROM s GROUP BY 1, 2
            ), st AS (
                SELECT split, CAST(sum(n) AS BIGINT) AS st FROM ob GROUP BY 1
            ), bt AS (
                SELECT bucket, CAST(sum(n) AS BIGINT) AS bt FROM ob GROUP BY 1
            ), g AS (
                SELECT CAST(sum(n) AS BIGINT) AS g FROM ob
            ), grid AS (
                SELECT st.split, bt.bucket,
                       coalesce(ob.n, 0) AS obs,
                       st.st * bt.bt / CAST(g.g AS DOUBLE) AS exp
                FROM st CROSS JOIN bt CROSS JOIN g
                LEFT JOIN ob ON ob.split = st.split AND ob.bucket = bt.bucket
            )
            SELECT split,
                   count(*) AS n_buckets,
                   CAST(sum(obs) AS BIGINT) AS n_docs,
                   round(sum((obs - exp) * (obs - exp) / exp), 6) AS chi2
            FROM grid GROUP BY split
        """,
        "q139_winsorized_stats": """
            WITH ranked AS (
                SELECT o_orderpriority, o_totalprice,
                       row_number() OVER (PARTITION BY o_orderpriority
                                          ORDER BY o_totalprice) AS r,
                       count(*) OVER (PARTITION BY o_orderpriority) AS n
                FROM orders
            ), cuts AS (
                SELECT o_orderpriority,
                       min(o_totalprice) AS lo, max(o_totalprice) AS hi
                FROM ranked
                WHERE r = CAST(ceil(n * 0.1) AS BIGINT)
                   OR r = CAST(ceil(n * 0.9) AS BIGINT)
                GROUP BY o_orderpriority
            )
            SELECT o.o_orderpriority,
                   count(*) AS n,
                   round(min(c.lo), 2) AS p10_cut,
                   round(min(c.hi), 2) AS p90_cut,
                   floor(CAST(sum(CAST(round(
                              greatest(c.lo, least(c.hi, o.o_totalprice)) * 100)
                              AS BIGINT)) AS DOUBLE)
                         * 1e4 / (count(*) * 100) + 0.5) / 1e4
                       AS winsorized_mean
            FROM orders o JOIN cuts c USING (o_orderpriority)
            GROUP BY o.o_orderpriority
        """,
        "q140_grouping_sets": """
            SELECT coalesce(l_returnflag, 'ALL') AS flag,
                   coalesce(l_linestatus, 'ALL') AS status,
                   CAST(grouping(l_returnflag) AS INT) AS g_flag,
                   CAST(grouping(l_linestatus) AS INT) AS g_status,
                   count(*) AS n,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                    (l_returnflag), ())
        """,
        "q141_merged_intervals": """
            WITH ev AS (
                SELECT user_id, epoch_us(ts) AS t FROM events
            ), marked AS (
                SELECT user_id, t,
                       CASE WHEN max(t + 300000000) OVER
                                 (PARTITION BY user_id ORDER BY t
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) IS NULL THEN 1
                            WHEN t > max(t + 300000000) OVER
                                 (PARTITION BY user_id ORDER BY t
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) THEN 1
                            ELSE 0 END AS is_new
                FROM ev
            ), islands AS (
                SELECT user_id, t,
                       sum(is_new) OVER (PARTITION BY user_id ORDER BY t
                                         ROWS UNBOUNDED PRECEDING) AS island
                FROM marked
            ), merged AS (
                SELECT user_id, island,
                       min(t) AS start, max(t) + 300000000 AS fin
                FROM islands GROUP BY user_id, island
            )
            SELECT user_id,
                   count(*) AS n_islands,
                   floor(CAST(sum(fin - start) AS DOUBLE) * 1e2 / 1000000
                         + 0.5) / 1e2 AS covered_sec
            FROM merged GROUP BY user_id
        """,
        "q142_brand_mode_type": """
            WITH counts AS (
                SELECT p_brand, p_type, count(*) AS n
                FROM part GROUP BY 1, 2
            ), ranked AS (
                SELECT p_brand, p_type, n,
                       row_number() OVER (PARTITION BY p_brand
                                          ORDER BY n DESC, p_type) AS rk
                FROM counts
            )
            SELECT p_brand, p_type AS mode_type, n
            FROM ranked WHERE rk = 1
        """,
        "q143_event_entropy": """
            WITH per AS (
                SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                       event_type, count(*) AS n
                FROM events GROUP BY 1, 2
            ), tot AS (
                SELECT day, CAST(sum(n) AS BIGINT) AS t FROM per GROUP BY day
            )
            SELECT per.day,
                   count(*) AS n_types,
                   round(-sum((n / CAST(t AS DOUBLE))
                              * ln(n / CAST(t AS DOUBLE))), 6) + 0.0
                       AS entropy
            FROM per JOIN tot USING (day)
            GROUP BY per.day
        """,
        "q144_revenue_trend": """
            WITH daily AS (
                SELECT r_name,
                       CAST(datediff('day', DATE '1995-01-01',
                                     CAST(o_orderdate AS DATE)) AS BIGINT)
                           AS x,
                       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                           * 100, 0) AS BIGINT)) AS BIGINT)
                           AS y
                FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                GROUP BY r_name, CAST(o_orderdate AS DATE)
            ), m AS (
                SELECT r_name, count(*) AS n,
                       CAST(sum(x) AS BIGINT) AS sx,
                       CAST(sum(y) AS BIGINT) AS sy,
                       CAST(sum(x * y) AS BIGINT) AS sxy,
                       CAST(sum(x * x) AS BIGINT) AS sxx
                FROM daily GROUP BY r_name
            )
            SELECT r_name, n,
                   round((n * sxy - sx * sy)
                         / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0, 6)
                       AS slope_per_day,
                   round((CAST(sy AS DOUBLE)
                          - (n * sxy - sx * sy)
                            / CAST(n * sxx - sx * sx AS DOUBLE) * sx)
                         / n / 100.0, 6) AS intercept
            FROM m
        """,
        "q145_attribution": """
            WITH ev AS (
                SELECT user_id, event_type, epoch(ts) AS t,
                       CAST(round(value * 100, 0) AS BIGINT) AS cents
                FROM events
            ), touched AS (
                SELECT user_id, event_type, cents,
                       max(CASE WHEN event_type <> 'purchase'
                                THEN {'t': t, 'et': event_type} END)
                           OVER (PARTITION BY user_id ORDER BY t
                                 RANGE BETWEEN 3600 PRECEDING
                                       AND CURRENT ROW) AS touch
                FROM ev
            )
            SELECT coalesce(touch.et, 'direct') AS channel,
                   count(*) AS n_purchases,
                   round(sum(cents) / 100.0, 2) AS credited_value
            FROM touched
            WHERE event_type = 'purchase'
            GROUP BY 1
        """,
        "q146_rolling_7d_users": """
            WITH du AS (
                SELECT DISTINCT
                       datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                           AS d,
                       user_id
                FROM events
            ), days AS (
                SELECT DISTINCT d FROM du
            ), fanned AS (
                SELECT du.d + off AS td, du.user_id
                FROM du, (SELECT unnest(range(0, 7)) AS off)
            )
            SELECT strftime(DATE '2024-01-01' + INTERVAL (f.td) DAY,
                            '%Y-%m-%d') AS day,
                   count(DISTINCT f.user_id) AS users_7d
            FROM fanned f JOIN days ON f.td = days.d
            GROUP BY 1
        """,
        "q147_interpolate_gaps": """
            WITH daily AS (
                SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                           AS d,
                       count(*) AS n,
                       CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                            AS BIGINT) AS cents
                FROM events WHERE event_type = 'purchase'
                GROUP BY 1
            ), anchored AS (
                SELECT d, n, cents,
                       last_value(CASE WHEN n >= 3
                                       THEN {'ad': d, 'av': cents} END
                                  IGNORE NULLS)
                           OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS p,
                       first_value(CASE WHEN n >= 3
                                        THEN {'ad': d, 'av': cents} END
                                   IGNORE NULLS)
                           OVER (ORDER BY d ROWS BETWEEN CURRENT ROW
                                 AND UNBOUNDED FOLLOWING) AS nx
                FROM daily
            )
            SELECT strftime(DATE '2024-01-01' + INTERVAL (d) DAY,
                            '%Y-%m-%d') AS day,
                   n,
                   n < 3 AS filled,
                   CASE WHEN n >= 3
                        THEN floor(CAST(cents AS DOUBLE) * 1e2 / 100 + 0.5)
                             / 1e2
                        WHEN p IS NULL
                        THEN floor(CAST(nx.av AS DOUBLE) * 1e2 / 100 + 0.5)
                             / 1e2
                        WHEN nx IS NULL
                        THEN floor(CAST(p.av AS DOUBLE) * 1e2 / 100 + 0.5)
                             / 1e2
                        ELSE floor(CAST(p.av * (nx.ad - p.ad)
                                        + (nx.av - p.av) * (d - p.ad)
                                        AS DOUBLE) * 1e2
                                   / (100 * (nx.ad - p.ad)) + 0.5) / 1e2
                   END AS value_filled
            FROM anchored
        """,
        "q148_price_position": """
            WITH agg AS (
                SELECT p_type, p_brand,
                       CAST(sum(CAST(round(p_retailprice * 100, 0) AS BIGINT))
                            AS BIGINT) AS c,
                       count(*) AS n
                FROM part GROUP BY 1, 2
            )
            SELECT p_type, p_brand,
                   floor(CAST(c AS DOUBLE) * 100 / n + 0.5) / 10000.0
                       AS avg_price,
                   floor(percent_rank() OVER
                         (PARTITION BY p_type
                          ORDER BY CAST(c AS DOUBLE) / n, p_brand)
                         * 1e6 + 0.5) / 1e6
                       AS pct_rank,
                   floor(cume_dist() OVER
                         (PARTITION BY p_type
                          ORDER BY CAST(c AS DOUBLE) / n, p_brand)
                         * 1e6 + 0.5) / 1e6
                       AS cume_dist
            FROM agg
        """,
    }
    # q149 composes the two near-dup detectors' own oracles verbatim, so the
    # consensus check can never drift from the signals it audits
    sqls["q149_consensus_pairs"] = f"""
        WITH mh AS ({sqls["q23_minhash_lsh_pairs"]}),
             sh AS ({sqls["q37_simhash_neardup"]}),
             joined AS (
                 SELECT coalesce(mh.id_a, sh.id_a) AS id_a,
                        mh.id_a IS NOT NULL AS in_minhash,
                        sh.id_a IS NOT NULL AS in_simhash
                 FROM mh FULL OUTER JOIN sh
                   ON mh.id_a = sh.id_a AND mh.id_b = sh.id_b
             )
        SELECT in_minhash, in_simhash, count(*) AS n_pairs
        FROM joined GROUP BY 1, 2
    """
    sqls["q150_recursive_reach"] = """
        WITH RECURSIVE edges AS (
            SELECT a.brand AS src, b.brand AS dst FROM
                (SELECT DISTINCT l_orderkey, p_brand AS brand
                 FROM lineitem JOIN part ON l_partkey = p_partkey) a
            JOIN
                (SELECT DISTINCT l_orderkey, p_brand AS brand
                 FROM lineitem JOIN part ON l_partkey = p_partkey) b
            ON a.l_orderkey = b.l_orderkey AND a.brand < b.brand
            GROUP BY 1, 2
            HAVING count(*) >= 5
        ), reach(brand, depth) AS (
            SELECT 'Brand#1', 0
            UNION ALL
            SELECT e.dst, r.depth + 1
            FROM reach r JOIN edges e ON e.src = r.brand
            WHERE r.depth < 3
        )
        SELECT brand, count(*) AS n_paths, min(depth) AS min_depth
        FROM reach WHERE depth > 0
        GROUP BY brand
    """
    _stop = f"(len(regexp_extract_all(lower(text), '\\b(?:{en_profile})\\b')) * 1.0 / len(regexp_split_to_array(trim(text), '\\s+')))"
    _alpha = "(len(regexp_extract_all(text, '[A-Za-z]')) * 1.0 / length(text))"
    _ws = "len(regexp_split_to_array(trim(text), '\\s+'))"
    sqls["q151_quality_model"] = f"""
        WITH scored AS (
            SELECT lang,
                   1.0 / (1.0 + exp(-(-2.0 + 3.0 * {_stop}
                                      + 2.0 * {_alpha}
                                      + 0.5 * ln({_ws} + 1.0)))) AS p
            FROM documents
        )
        SELECT lang,
               CASE WHEN p >= 0.7 THEN 'high'
                    WHEN p >= 0.4 THEN 'mid'
                    ELSE 'low' END AS tier,
               count(*) AS n_docs,
               round(avg(p), 6) AS avg_p
        FROM scored GROUP BY 1, 2
    """
    _planes = [_hyperplane(100 + j, 64) for j in range(8)]
    _proj_terms = " + ".join(
        f"list_dot_product(ve, {pl}) * list_dot_product(ve, {pl})"
        for pl in _planes
    )
    sqls["q152_random_projection"] = f"""
        WITH v AS (
            SELECT label, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
        ), r AS (
            SELECT label,
                   sqrt(({_proj_terms}) / list_dot_product(ve, ve)) AS ratio
            FROM v
        )
        SELECT label,
               count(*) AS n_vecs,
               round(avg(ratio), 6) AS avg_norm_ratio,
               round(min(ratio), 6) AS min_norm_ratio,
               round(max(ratio), 6) AS max_norm_ratio
        FROM r GROUP BY label
    """
    sqls["q153_notin_null_semantics"] = """
        WITH sizes AS (SELECT DISTINCT p_size FROM part),
             qty AS (SELECT DISTINCT CASE WHEN l_quantity >= 50 THEN NULL
                                          ELSE CAST(l_quantity AS INT) END AS q
                     FROM lineitem)
        SELECT
          (SELECT count(*) FROM sizes
            WHERE p_size NOT IN (SELECT q FROM qty)) AS notin_with_null,
          (SELECT count(*) FROM sizes
            WHERE p_size NOT IN (SELECT q FROM qty WHERE q IS NOT NULL))
              AS notin_null_filtered,
          (SELECT count(*) FROM sizes s
            WHERE NOT EXISTS (SELECT 1 FROM qty WHERE q = s.p_size))
              AS not_exists_rewrite
    """
    sqls["q154_event_anomaly_zscore"] = """
        WITH daily AS (
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2
        ), scored AS (
            SELECT event_type, day, n_events,
                   CASE WHEN stddev_samp(n_events)
                                 OVER (PARTITION BY event_type) > 0
                        THEN (n_events - avg(n_events)
                                  OVER (PARTITION BY event_type))
                             / stddev_samp(n_events)
                                   OVER (PARTITION BY event_type)
                   END AS z
            FROM daily
        )
        SELECT event_type, day, n_events, round(z, 4) AS zscore
        FROM scored WHERE abs(z) >= 2.0
    """
    _margin_scores = ", ".join(
        "len(regexp_extract_all(lower(text), '\\b(?:" + "|".join(words) + ")\\b'))"
        for _, words in sorted(_LANG_PROFILES.items())
    )
    sqls["q155_lang_margin"] = f"""
        WITH scored AS (
            SELECT {_lang_guess_sql()} AS pred_lang,
                   list_sort([{_margin_scores}], 'DESC') AS l
            FROM documents
        )
        SELECT pred_lang, count(*) AS n_docs,
               floor(CAST(sum(l[1] - l[2]) AS DOUBLE) * 1e6 / count(*)
                     + 0.5) / 1e6 AS avg_margin,
               count(*) FILTER (WHERE l[1] - l[2] <= 1) AS n_low_conf
        FROM scored GROUP BY pred_lang
    """
    sqls["q156_merge_changeset"] = """
        WITH base AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        ), upd AS (
            SELECT o_orderkey, 'X' AS o_orderstatus,
                   o_totalprice * 1.1 AS o_totalprice
            FROM base WHERE o_orderkey % 97 = 0
        ), del AS (
            SELECT o_orderkey FROM base
            WHERE o_orderkey % 89 = 0 AND o_orderkey % 97 != 0
        ), ins AS (
            SELECT o_orderkey + 10000000 AS o_orderkey,
                   'N' AS o_orderstatus, 1000.0 AS o_totalprice
            FROM base WHERE o_orderkey % 83 = 0
        ), merged AS (
            SELECT b.o_orderkey,
                   coalesce(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
                   coalesce(u.o_totalprice, b.o_totalprice) AS o_totalprice
            FROM base b LEFT JOIN upd u USING (o_orderkey)
            WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM del)
            UNION ALL
            SELECT * FROM ins
        )
        SELECT o_orderstatus, count(*) AS n_orders,
               floor(CAST(sum(CAST(round(o_totalprice * 1000) AS BIGINT)) AS DOUBLE)
                     * 1e1 / 1000 + 0.5) / 1e1 AS sum_price
        FROM merged GROUP BY o_orderstatus
    """
    sqls["q157_packing_capacity_sweep"] = """
        WITH toks AS (
            SELECT doc_id, lang,
                   len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tokens
            FROM documents
        ), offs AS (
            SELECT doc_id, lang, n_tokens,
                   sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING) - n_tokens
                       AS prev_cum
            FROM toks
        ), pw AS (
            SELECT capacity, lang, prev_cum // capacity AS window_id,
                   sum(n_tokens) AS tok
            FROM offs CROSS JOIN (VALUES (512), (2048), (8192)) caps(capacity)
            GROUP BY 1, 2, 3
        )
        SELECT capacity, count(*) AS n_windows,
               floor(CAST(sum(tok) AS DOUBLE) * 1e6 / (count(*) * capacity)
                     + 0.5) / 1e6 AS avg_fill,
               floor(CAST(count(*) * capacity - sum(tok) AS DOUBLE) * 1e6
                     / (count(*) * capacity) + 0.5) / 1e6
                   AS waste_frac
        FROM pw GROUP BY capacity
    """
    # lossless prefix filtering => the oracle is simply the exact Jaccard
    # join (inverted-index candidates, full verification) at ngram=2, t=0.6
    sqls["q158_prefix_filter_jaccard"] = f"""
        WITH tok AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ), sh AS (
            SELECT doc_id, {_SHINGLES3} AS s FROM tok
        ), post AS (
            SELECT doc_id, unnest(s) AS g FROM sh
        ), cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM post a JOIN post b ON a.g = b.g AND a.doc_id < b.doc_id
        )
        SELECT id_a, id_b,
               floor((CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
                     / len(list_distinct(list_concat(x.s, y.s)))) * 1e6 + 0.5) / 1e6 AS jaccard
        FROM cand JOIN sh x ON x.doc_id = id_a JOIN sh y ON y.doc_id = id_b
        WHERE len(list_intersect(x.s, y.s)) * 1.0
              / len(list_distinct(list_concat(x.s, y.s))) >= 0.6
    """
    sqls["q159_embedding_covariance"] = """
        WITH v AS (
            SELECT CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
        ), m AS (
            SELECT CAST(t.range AS INT) - 1 AS i,
                   sum(ve[CAST(t.range AS INT)]) AS sx, count(*) AS n
            FROM v, range(1, 65) t GROUP BY 1
        ), pairs AS (
            SELECT CAST(a.range AS INT) AS pi, CAST(b.range AS INT) AS pj
            FROM range(1, 65) a, range(1, 65) b
            WHERE a.range <= b.range
        ), s AS (
            SELECT pi - 1 AS i, pj - 1 AS j, sum(ve[pi] * ve[pj]) AS sxx
            FROM v CROSS JOIN pairs GROUP BY 1, 2
        )
        SELECT s.i, s.j,
               round((sxx - mi.sx * mj.sx / mi.n) / (mi.n - 1), 6) + 0.0 AS cov
        FROM s JOIN m mi ON mi.i = s.i JOIN m mj ON mj.i = s.j
    """
    sqls["q160_mahalanobis_outliers"] = """
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
        ), comp AS (
            SELECT vec_id, CAST(t.range AS INT) - 1 AS dim,
                   ve[CAST(t.range AS INT)] AS x
            FROM v, range(1, 65) t
        ), stats AS (
            SELECT dim, avg(x) AS mu, var_samp(x) AS var FROM comp GROUP BY dim
        ), scored AS (
            SELECT vec_id, round(sum((x - mu) * (x - mu) / var), 4) AS maha_sq
            FROM comp JOIN stats USING (dim) GROUP BY vec_id
        )
        SELECT vec_id, maha_sq FROM scored
        ORDER BY maha_sq DESC, vec_id LIMIT 20
    """
    sqls["q161_ivf_list_balance"] = """
        WITH cent AS (
            SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
            FROM embeddings ORDER BY vec_id LIMIT 16
        ), corpus AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), assigned AS (
            SELECT vec_id, cid FROM (
                SELECT c.vec_id, ct.cid,
                       row_number() OVER (
                           PARTITION BY c.vec_id
                           ORDER BY list_cosine_similarity(c.v, ct.cv) DESC,
                                    ct.cid) AS rn
                FROM corpus c, cent ct)
            WHERE rn = 1
        ), counts AS (
            -- empty lists reported too: outer-join onto the full centroid
            -- set; uniform denominator is the CONFIGURED list count (16)
            SELECT ct.cid, coalesce(a.n, 0) AS n_vecs
            FROM cent ct LEFT JOIN (
                SELECT cid, count(*) AS n FROM assigned GROUP BY cid
            ) a USING (cid)
        )
        SELECT cid, n_vecs,
               floor((CAST(n_vecs AS DOUBLE)
                      / (SELECT sum(n_vecs) FROM counts)) * 1e6 + 0.5) / 1e6
                   AS share,
               floor((CAST(n_vecs AS DOUBLE) * 16
                      / (SELECT sum(n_vecs) FROM counts)) * 1e4 + 0.5) / 1e4
                   AS skew_vs_uniform
        FROM counts
    """
    # the bitmap path is exact, so the oracle is plain COUNT(DISTINCT)
    sqls["q162_bitmap_distinct_users"] = """
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """
    sqls["q163_interval_join_batch_twin"] = """
        WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
             p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
        SELECT strftime(p.ts, '%Y-%m-%d') AS day,
               count(*) AS n_attributed,
               count(DISTINCT c.user_id) AS n_users
        FROM c JOIN p
          ON c.user_id = p.user_id
         AND c.ts <= p.ts
         AND c.ts >= p.ts - INTERVAL 300 SECONDS
        GROUP BY 1
    """
    sqls["q164_events_since_purchase"] = """
        WITH marked AS (
            SELECT user_id,
                   max(CASE WHEN event_type = 'purchase' THEN ts END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS last_purchase
            FROM events
        )
        SELECT user_id,
               count(*) FILTER (WHERE last_purchase IS NULL)
                   AS n_before_first_purchase,
               count(*) FILTER (WHERE last_purchase IS NOT NULL)
                   AS n_after_first_purchase
        FROM marked GROUP BY user_id
    """
    sqls["q165_zipf_slope"] = """
        WITH toks AS (
            SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
            FROM documents
        ), counts AS (
            SELECT tok, count(*) AS n FROM toks WHERE tok != '' GROUP BY tok
        ), ranked AS (
            SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rank
            FROM counts QUALIFY rank <= 200
        ), pts AS (
            SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y
            FROM ranked
        )
        SELECT round((avg(x * y) - avg(x) * avg(y))
                     / (avg(x * x) - avg(x) * avg(x)), 6) AS zipf_slope,
               count(*) AS n_points
        FROM pts
    """
    sqls["q166_vocab_overlap"] = """
        WITH vocab AS (
            SELECT DISTINCT source,
                   unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
            FROM documents
        ), v AS (SELECT source, tok FROM vocab WHERE tok != ''),
        sizes AS (SELECT source, count(*) AS vsz FROM v GROUP BY source),
        inter AS (
            SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
            FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT src_a, src_b, n_shared,
               floor((CAST(n_shared AS DOUBLE)
                      / (sa.vsz + sb.vsz - n_shared)) * 1e6 + 0.5) / 1e6
                   AS vocab_jaccard
        FROM inter
        JOIN sizes sa ON sa.source = src_a
        JOIN sizes sb ON sb.source = src_b
    """
    # stage 1 is q132's oracle verbatim with a deeper shortlist (lossless
    # composition — the re-rank stage can only reorder what stage 1 emits)
    sqls["q167_two_stage_rerank"] = f"""
        WITH shortlist AS (
            {sqls["q132_pq_adc_topk"].replace("rank <= 5", "rank <= 20")}
        ), v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
        ), rer AS (
            SELECT s.query_id, s.neighbor_id,
                   round(list_cosine_similarity(q.ve, n.ve), 6) AS cosine_sim
            FROM shortlist s
            JOIN v q ON q.vec_id = s.query_id
            JOIN v n ON n.vec_id = s.neighbor_id
        )
        SELECT query_id, neighbor_id, cosine_sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine_sim DESC, neighbor_id)
                   AS rerank
        FROM rer QUALIFY rerank <= 5
    """
    sqls["q168_salted_agg_equivalence"] = """
        SELECT l_returnflag,
               round(sum(l_quantity), 2) AS sum_qty,
               round(max(l_extendedprice), 2) AS max_price
        FROM lineitem GROUP BY l_returnflag
    """
    sqls["q169_dominant_component"] = """
        WITH v AS (
            SELECT label, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
        ), d AS (
            SELECT label, list_position(ve, list_max(ve)) AS dom_dim FROM v
        ), c AS (
            SELECT label, dom_dim, count(*) AS n_vecs FROM d GROUP BY 1, 2
        )
        SELECT label, dom_dim, n_vecs,
               row_number() OVER (PARTITION BY label
                                  ORDER BY n_vecs DESC, dom_dim) AS rk
        FROM c QUALIFY rk <= 3
    """
    sqls["q170_quantile_binning"] = """
        WITH cuts AS (
            SELECT list_transform(
                       quantile_cont(l_extendedprice,
                           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
                       c -> round(c, 4)) AS cts
            FROM lineitem
        )
        SELECT 1 + len(list_filter(cts, c -> l_extendedprice > c)) AS bucket,
               count(*) AS n_rows,
               round(min(l_extendedprice), 2) AS lo,
               round(max(l_extendedprice), 2) AS hi
        FROM lineitem, cuts GROUP BY bucket
    """
    sqls["q171_weekly_churn"] = """
        WITH active AS (
            SELECT DISTINCT date_trunc('week', ts) AS wk, user_id FROM events
        ), churned AS (
            SELECT a.wk, a.user_id FROM active a
            WHERE NOT EXISTS (SELECT 1 FROM active b
                              WHERE b.user_id = a.user_id
                                AND b.wk = a.wk + INTERVAL 7 DAY)
        ), pw AS (
            SELECT wk, count(*) AS n_active FROM active GROUP BY wk
        ), cc AS (
            SELECT wk, count(*) AS n_churned FROM churned GROUP BY wk
        )
        SELECT strftime(pw.wk, '%Y-%m-%d') AS week, n_active,
               coalesce(n_churned, 0) AS n_churned,
               floor((CAST(coalesce(n_churned, 0) AS DOUBLE) / n_active) * 1e6
                     + 0.5) / 1e6 AS churn_rate
        FROM pw LEFT JOIN cc USING (wk)
        WHERE pw.wk < (SELECT max(wk) FROM active)
    """
    sqls["q172_decayed_engagement"] = """
        WITH mx AS (SELECT max(ts) AS m FROM events)
        SELECT user_id,
               round(sum(value * exp(-(epoch_us(m) - epoch_us(ts))
                                     / 1e6 / 604800.0)), 4) AS score
        FROM events, mx
        GROUP BY user_id
        ORDER BY score DESC, user_id
        LIMIT 20
    """
    sqls["q173_capped_running_balance"] = """
        WITH s AS (
            SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber,
                   CASE WHEN l_returnflag = 'R' THEN l_quantity
                        ELSE -l_quantity END AS delta
            FROM lineitem
        ), g AS (
            SELECT l_partkey,
                   list(delta ORDER BY l_shipdate, l_orderkey, l_linenumber)
                       AS ds,
                   count(*) AS n_moves
            FROM s GROUP BY l_partkey
        )
        SELECT l_partkey, n_moves,
               round(list_reduce(list_prepend(CAST(0 AS DOUBLE), ds),
                                 (acc, x) -> greatest(0, acc + x)), 2)
                   AS balance
        FROM g
        ORDER BY balance DESC, l_partkey
        LIMIT 20
    """
    sqls["q174_top_session_paths"] = """
        WITH flagged AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, event_type, ts, event_id,
                   sum(new_session) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS seq
            FROM flagged
        ), paths AS (
            SELECT user_id, seq,
                   array_to_string(list(event_type ORDER BY ts, event_id), '>')
                       AS path
            FROM sess GROUP BY user_id, seq
        )
        SELECT path, count(*) AS n_sessions
        FROM paths GROUP BY path
        ORDER BY n_sessions DESC, path
        LIMIT 10
    """
    # composition audit: both sides reuse their own verified oracles
    sqls["q175_ivf_recall_audit"] = f"""
        WITH bf AS ({sqls["q24_cosine_topk"]}),
             ivf AS ({sqls["q48_ivf_cosine_topk"]})
        SELECT bf.query_id,
               round(count(ivf.neighbor_id) / 5.0, 2) AS recall_at_5
        FROM bf LEFT JOIN ivf
          ON ivf.query_id = bf.query_id
         AND ivf.neighbor_id = bf.neighbor_id
        GROUP BY bf.query_id
    """
    sqls["q176_above_nation_p90"] = """
        WITH cuts AS (
            SELECT c_nationkey, quantile_cont(c_acctbal, 0.9) AS p90,
                   sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS tot
            FROM customer GROUP BY 1
        )
        SELECT c_nationkey, count(*) AS n_above,
               floor(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                          AS DOUBLE) * 1e6 / any_value(tot) + 0.5) / 1e6
                   AS balance_share
        FROM customer JOIN cuts USING (c_nationkey)
        WHERE c_acctbal > p90
        GROUP BY c_nationkey
    """
    sqls["q177_token_concentration"] = """
        WITH counts AS (
            SELECT tok, count(*) AS n
            FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                      AS tok
                  FROM documents)
            WHERE tok != '' GROUP BY tok
        ), cut AS (
            SELECT quantile_cont(n, 0.99) AS p99, sum(n) AS total,
                   count(*) AS vocab_size
            FROM counts
        )
        SELECT vocab_size, count(*) AS n_heavy,
               floor((CAST(sum(n) AS DOUBLE) / any_value(total)) * 1e6 + 0.5) / 1e6
                   AS occurrence_share
        FROM counts, cut
        WHERE n >= p99
        GROUP BY vocab_size
    """
    sqls["q178_click_abandonment"] = """
        WITH c AS (SELECT user_id AS cu, ts AS cts FROM events
                   WHERE event_type = 'click'),
             p AS (SELECT user_id AS pu, ts AS pts FROM events
                   WHERE event_type = 'purchase'),
             a AS (SELECT cu, cts FROM c
                   WHERE NOT EXISTS (SELECT 1 FROM p
                                     WHERE pu = cu AND pts >= cts
                                       AND pts <= cts + INTERVAL 300 SECONDS)),
             ad AS (SELECT strftime(cts, '%Y-%m-%d') AS day,
                           count(*) AS n_clicks FROM c GROUP BY 1),
             ab AS (SELECT strftime(cts, '%Y-%m-%d') AS day,
                           count(*) AS n_abandoned FROM a GROUP BY 1)
        SELECT ad.day, n_clicks, coalesce(n_abandoned, 0) AS n_abandoned,
               floor((CAST(coalesce(n_abandoned, 0) AS DOUBLE) / n_clicks)
                     * 1e6 + 0.5) / 1e6 AS abandon_rate
        FROM ad LEFT JOIN ab USING (day)
    """
    sqls["q179_value_range_frame"] = """
        WITH peers AS (
            SELECT c_mktsegment,
                   count(*) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal
                                  RANGE BETWEEN 500 PRECEDING
                                        AND 500 FOLLOWING) - 1
                       AS n_peers
            FROM customer
        )
        SELECT c_mktsegment,
               floor(CAST(sum(n_peers) AS DOUBLE) * 1e4 / count(*) + 0.5)
                   / 1e4 AS avg_peers,
               max(n_peers) AS max_peers
        FROM peers GROUP BY c_mktsegment
    """
    sqls["q180_revenue_bridge"] = """
        WITH monthly AS (
            SELECT l_returnflag, strftime(l_shipdate, '%Y-%m') AS month,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS v
            FROM lineitem GROUP BY 1, 2
        ), l AS (
            SELECT l_returnflag, month, q, v,
                   lag(q) OVER w AS pq, lag(v) OVER w AS pv
            FROM monthly
            WINDOW w AS (PARTITION BY l_returnflag ORDER BY month)
        )
        SELECT l_returnflag, month,
               floor(((CAST(q - pq AS DOUBLE) * CAST(pv AS DOUBLE))
                      / (CAST(pq AS DOUBLE) * 1e2)) * 1e1 + 0.5) / 1e1
                   AS volume_effect,
               floor(((CAST(v AS DOUBLE) / (CAST(q AS DOUBLE) * 1e2)
                       - CAST(pv AS DOUBLE) / (CAST(pq AS DOUBLE) * 1e2))
                      * CAST(q AS DOUBLE)) * 1e1 + 0.5) / 1e1
                   AS price_effect
        FROM l WHERE pq IS NOT NULL
    """
    sqls["q181_weighted_sample"] = """
        WITH scored AS (
            SELECT doc_id, n_chars,
                   round(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                                  1, 15)) AS BIGINT) + 1.0)
                            / 1152921504606846976.0)
                         / n_chars, 6) AS es_key
            FROM documents
        )
        SELECT doc_id, n_chars, es_key
        FROM scored ORDER BY es_key DESC, doc_id LIMIT 50
    """
    sqls["q182_rank_with_ties"] = """
        WITH ranked AS (
            SELECT p_brand, p_size,
                   rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC)
                       AS rk
            FROM part
        )
        SELECT p_brand, count(*) AS n_parts,
               max(p_size) AS top_size, min(p_size) AS cut_size
        FROM ranked WHERE rk <= 3
        GROUP BY p_brand
    """
    sqls["q183_filtered_aggregates"] = """
        SELECT strftime(l_shipdate, '%Y-%m') AS month,
               count(*) AS n_items,
               count(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
               CAST((sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                         FILTER (WHERE l_returnflag = 'R') + 5) // 10
                    AS BIGINT) / 10.0 AS returned_revenue,
               floor(CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS DOUBLE)
                     * 1e6 / count(*) + 0.5) / 1e6 AS return_rate,
               CASE WHEN count(*) FILTER (WHERE l_returnflag = 'R') * 1.0
                         / count(*) > 0.3
                    THEN 'high' ELSE 'normal' END AS return_band
        FROM lineitem
        GROUP BY 1
    """
    sqls["q184_tokenizer_fertility"] = """
        WITH ann AS (
            SELECT lang,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
                       AS ws,
                   len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS bpe
            FROM documents
        )
        SELECT lang,
               floor(CAST(sum(ws) AS DOUBLE) * 1e4 / count(*) + 0.5)
                   / 1e4 AS avg_ws_tokens,
               floor(CAST(sum(bpe) AS DOUBLE) * 1e4 / count(*) + 0.5)
                   / 1e4 AS avg_bpe_tokens,
               floor(CAST(sum(bpe) AS DOUBLE) * 1e6 / sum(ws) + 0.5)
                   / 1e6 AS fertility
        FROM ann GROUP BY lang
    """
    _q = "chocolate"
    _qgrams = ", ".join(
        repr(g) for g in sorted({_q[i : i + 3] for i in range(len(_q) - 2)})
    )
    sqls["q185_trigram_search"] = f"""
        WITH tri AS (
            SELECT p_partkey, p_name,
                   len(list_intersect(
                       list_distinct(list_transform(
                           range(1, greatest(length(lower(p_name)) - 2, 1) + 1),
                           i -> substr(lower(p_name), CAST(i AS INT), 3))),
                       [{_qgrams}])) AS n
            FROM part
        )
        SELECT p_partkey, p_name, n AS n_shared_trigrams
        FROM tri WHERE n > 0
        ORDER BY n DESC, p_partkey LIMIT 15
    """
    sqls["q186_pareto_skyline"] = """
        WITH pp AS (
            SELECT p_partkey, p_retailprice, p_size FROM part
            WHERE p_type LIKE 'PROMO%'
        )
        SELECT p_partkey, round(p_retailprice, 2) AS price, p_size
        FROM pp a
        WHERE NOT EXISTS (
            SELECT 1 FROM pp b
            WHERE b.p_retailprice <= a.p_retailprice
              AND b.p_size >= a.p_size
              AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
        )
    """
    # DuckDB's binder rejects row-value IN subqueries; the EXISTS rewrite
    # is equivalent here (both key columns are non-null)
    sqls["q187_struct_in_subquery"] = """
        SELECT l_returnflag, count(*) AS n_items
        FROM lineitem l1
        WHERE EXISTS (
            SELECT 1
            FROM lineitem l2 JOIN orders ON l2.l_orderkey = o_orderkey
            WHERE year(o_orderdate) = 1996 AND o_orderpriority = '1-URGENT'
              AND l2.l_partkey = l1.l_partkey
              AND l2.l_suppkey = l1.l_suppkey
        )
        GROUP BY l_returnflag
    """
    sqls["q188_minhash_estimate_error"] = f"""
        WITH tok AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ), shg AS (
            SELECT doc_id, {_SHINGLES3} AS sh FROM tok
        ), sig AS (
            SELECT doc_id, {_sig_exprs(8)} AS sg
            FROM (SELECT doc_id, {_SHINGLE_HASH} AS hs FROM shg)
        ), banded AS (
            SELECT doc_id,
                   CAST(b AS VARCHAR) || '|' ||
                   array_to_string(sg[b*2+1:b*2+2], '|') AS band
            FROM sig, (SELECT unnest(range(0, 4)) AS b)
        ), cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.doc_id < b.doc_id
        ), j AS (
            SELECT len(list_filter(range(1, 9),
                                   i -> sx.sg[CAST(i AS INT)]
                                        = sy.sg[CAST(i AS INT)])) / 8.0
                   - len(list_intersect(x.sh, y.sh)) * 1.0
                     / len(list_distinct(list_concat(x.sh, y.sh))) AS err
            FROM cand c
            JOIN shg x ON x.doc_id = c.id_a
            JOIN shg y ON y.doc_id = c.id_b
            JOIN sig sx ON sx.doc_id = c.id_a
            JOIN sig sy ON sy.doc_id = c.id_b
        )
        SELECT count(*) AS n_pairs,
               round(avg(abs(err)), 6) AS mean_abs_error,
               round(avg(err), 6) AS bias
        FROM j
    """
    sqls["q189_nearest_event_join"] = """
        WITH c AS (SELECT event_id AS c_id, user_id AS cu, ts AS cts
                   FROM events WHERE event_type = 'click'),
             p AS (SELECT user_id AS pu, ts AS pts
                   FROM events WHERE event_type = 'purchase'),
             j AS (SELECT c_id, cts,
                          epoch_us(pts) - epoch_us(cts) AS gap
                   FROM c JOIN p
                     ON cu = pu
                    AND abs(epoch_us(pts) - epoch_us(cts)) <= 600000000),
             n AS (SELECT c_id, cts, gap,
                          row_number() OVER (PARTITION BY c_id
                                             ORDER BY abs(gap), gap) AS rn
                   FROM j)
        SELECT strftime(cts, '%Y-%m-%d') AS day,
               count(*) AS n_matched,
               floor(CAST(sum(abs(gap)) AS DOUBLE) * 1e3 / 1000000 + 0.5)
                   / 1e3 AS total_abs_gap_s
        FROM n WHERE rn = 1 GROUP BY 1
    """
    sqls["q190_largest_remainder"] = """
        WITH counts AS (
            SELECT c_nationkey, count(*) AS n FROM customer GROUP BY 1
        ), tot AS (SELECT sum(n) AS t FROM counts),
        based AS (
            SELECT c_nationkey, n,
                   CAST(floor(n * 1000.0 / t) AS BIGINT) AS base,
                   n * 1000.0 / t - floor(n * 1000.0 / t) AS rem
            FROM counts, tot
        ), leftover AS (SELECT 1000 - sum(base) AS l FROM based),
        r AS (
            SELECT c_nationkey, n, base,
                   row_number() OVER (ORDER BY rem DESC, c_nationkey) AS rk
            FROM based
        )
        SELECT c_nationkey, n AS n_customers,
               base + CASE WHEN rk <= (SELECT l FROM leftover)
                           THEN 1 ELSE 0 END AS allocation
        FROM r
    """
    # DuckDB lacks width_bucket; the closed-form emulation is exact on the
    # [0, 200) x 20 integer-width domain
    sqls["q191_width_bucket_histogram"] = """
        SELECT event_type,
               CASE WHEN value < 0 THEN 0
                    WHEN value >= 200 THEN 21
                    ELSE 1 + CAST(floor(value / 10) AS INT) END AS bucket,
               count(*) AS n_events
        FROM events
        GROUP BY 1, 2
    """
    sqls["q192_psi_drift"] = """
        WITH bounds AS (
            SELECT min(date_trunc('week', ts)) AS lo,
                   max(date_trunc('week', ts)) AS hi
            FROM events
        ), tagged AS (
            SELECT event_type,
                   least(CAST(floor(value / 20) AS INT), 9) AS bucket,
                   CASE WHEN date_trunc('week', ts) = lo THEN 'ref'
                        ELSE 'now' END AS side
            FROM events, bounds
            WHERE date_trunc('week', ts) = lo OR date_trunc('week', ts) = hi
        ), per_bucket AS (
            SELECT event_type, bucket,
                   count(*) FILTER (WHERE side = 'ref') AS nref,
                   count(*) FILTER (WHERE side = 'now') AS nnow
            FROM tagged GROUP BY 1, 2
        ), tot AS (
            SELECT event_type, sum(nref) AS tref, sum(nnow) AS tnow
            FROM per_bucket GROUP BY 1
        )
        SELECT event_type,
               round(sum(((nnow + 0.5) / (tnow + 5.0)
                          - (nref + 0.5) / (tref + 5.0))
                         * ln(((nnow + 0.5) / (tnow + 5.0))
                              / ((nref + 0.5) / (tref + 5.0)))), 6) AS psi
        FROM per_bucket JOIN tot USING (event_type)
        GROUP BY event_type
    """
    sqls["q193_degree_distribution"] = """
        WITH baskets AS (
            SELECT DISTINCT l_orderkey, p_brand AS brand
            FROM lineitem JOIN part ON l_partkey = p_partkey
        ), edges AS (
            SELECT a.brand AS src, b.brand AS dst
            FROM baskets a JOIN baskets b
              ON a.l_orderkey = b.l_orderkey AND a.brand < b.brand
            GROUP BY 1, 2
            HAVING count(*) >= 5
        ), deg AS (
            SELECT node, count(*) AS degree FROM (
                SELECT src AS node FROM edges
                UNION ALL
                SELECT dst AS node FROM edges
            ) GROUP BY node
        )
        SELECT degree, count(*) AS n_brands FROM deg GROUP BY degree
    """
    # the star algorithm must produce exactly the propagation labeling
    sqls["q194_star_components"] = sqls["q45_dedup_clusters"]
    sqls["q195_power_iteration_pca"] = """
        WITH v AS (
            SELECT CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
        ), m AS (
            SELECT CAST(t.range AS INT) - 1 AS i,
                   sum(ve[CAST(t.range AS INT)]) AS sx, count(*) AS n
            FROM v, range(1, 65) t GROUP BY 1
        ), pairs AS (
            SELECT CAST(a.range AS INT) AS pi, CAST(b.range AS INT) AS pj
            FROM range(1, 65) a, range(1, 65) b WHERE a.range <= b.range
        ), s AS (
            SELECT pi - 1 AS i, pj - 1 AS j, sum(ve[pi] * ve[pj]) AS sxx
            FROM v CROSS JOIN pairs GROUP BY 1, 2
        ), covu AS (
            SELECT s.i, s.j,
                   (sxx - mi.sx * mj.sx / mi.n) / (mi.n - 1) AS cov
            FROM s JOIN m mi ON mi.i = s.i JOIN m mj ON mj.i = s.j
        ), covf AS (
            SELECT i, j, cov FROM covu
            UNION ALL
            SELECT j AS i, i AS j, cov FROM covu WHERE i <> j
        ), v0 AS (
            SELECT CAST(t.range AS INT) - 1 AS j, 0.125 AS x
            FROM range(1, 65) t
        ), w1 AS (
            SELECT i, sum(cov * x) AS w FROM covf JOIN v0 ON covf.j = v0.j
            GROUP BY i
        ), v1 AS (
            SELECT i AS j, w / (SELECT sqrt(sum(w * w)) FROM w1) AS x FROM w1
        ), w2 AS (
            SELECT i, sum(cov * x) AS w FROM covf JOIN v1 ON covf.j = v1.j
            GROUP BY i
        ), v2 AS (
            SELECT i AS j, w / (SELECT sqrt(sum(w * w)) FROM w2) AS x FROM w2
        ), w3 AS (
            SELECT i, sum(cov * x) AS w FROM covf JOIN v2 ON covf.j = v2.j
            GROUP BY i
        ), v3 AS (
            SELECT i AS j, w / (SELECT sqrt(sum(w * w)) FROM w3) AS x FROM w3
        ), w4 AS (
            SELECT i, sum(cov * x) AS w FROM covf JOIN v3 ON covf.j = v3.j
            GROUP BY i
        ), lam AS (
            SELECT sum(w4.w * v3.x) AS l FROM w4 JOIN v3 ON w4.i = v3.j
        )
        SELECT row_number() OVER (ORDER BY round(abs(x), 5) DESC, j) AS rk,
               j AS dim, round(abs(x), 5) AS abs_loading,
               round((SELECT l FROM lam), 3) AS eigenvalue_est
        FROM v3 QUALIFY rk <= 5
    """
    sqls["q196_hierarchy_share"] = """
        WITH rev AS (
            SELECT r_name, n_name,
                   sum(CAST(round(l_extendedprice * (1 - l_discount)
                                  * 10000) AS BIGINT)) AS u
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1, 2
        )
        SELECT r_name, n_name,
               floor(CAST(u AS DOUBLE) * 1e1 / 10000 + 0.5) / 1e1 AS revenue,
               floor(CAST(u AS DOUBLE) * 1e6
                     / sum(u) OVER (PARTITION BY r_name) + 0.5) / 1e6
                   AS share_of_region,
               floor(CAST(sum(u) OVER (PARTITION BY r_name) AS DOUBLE) * 1e6
                     / sum(u) OVER () + 0.5) / 1e6 AS region_share_of_world
        FROM rev
    """
    sqls["q197_longest_streak"] = """
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ), isl AS (
            SELECT user_id, d,
                   d - CAST(row_number() OVER (PARTITION BY user_id
                                               ORDER BY d) AS INT) AS grp
            FROM days
        ), runs AS (
            SELECT user_id, grp, count(*) AS len FROM isl GROUP BY 1, 2
        ), best AS (
            SELECT user_id, max(len) AS longest_streak_days,
                   count(*) AS n_streaks
            FROM runs GROUP BY 1
        )
        SELECT user_id, longest_streak_days, n_streaks
        FROM best ORDER BY longest_streak_days DESC, user_id LIMIT 15
    """
    # survivorship over q45's exact component labeling + q26's quality expr
    sqls["q198_cluster_survivorship"] = sqls["q45_dedup_clusters"].replace(
        """            SELECT node, component,
                   count(*) OVER (PARTITION BY component) AS cluster_size
            FROM comp""",
        f"""            , q AS (
                SELECT doc_id, {{qsql}} AS qsc FROM documents
            ), mm AS (
                SELECT comp.component, comp.node, q.qsc
                FROM comp JOIN q ON q.doc_id = comp.node
            ), r AS (
                SELECT component, node, qsc,
                       row_number() OVER (PARTITION BY component
                                          ORDER BY qsc DESC, node) AS rk,
                       count(*) OVER (PARTITION BY component) AS csz
                FROM mm
            )
            SELECT component, node AS kept_doc,
                   round(qsc, 4) AS kept_quality, csz - 1 AS n_dropped
            FROM r WHERE rk = 1""".replace("{qsql}", _quality_sql())
    )
    # doc-level flags composed from the three signals' own oracles
    sqls["q199_dedup_method_yield"] = f"""
        -- q23's pair SQL bands at the same (ngram=3, hashes=8, bands=4)
        -- but verifies at threshold 0.1; this query's contract is
        -- jaccard >= 0.5, so re-filter the embedded pairs (the rounded
        -- jaccard column is safe to threshold: true jaccards of <=700-
        -- element shingle sets are rationals nowhere near 0.5 +/- 5e-7).
        -- The seed-31337 differential caught the unfiltered embed: 3 docs
        -- flagged only by 0.1<=j<0.5 pairs inflated the oracle's counts.
        WITH mhp AS (SELECT * FROM ({sqls["q23_minhash_lsh_pairs"]})
                     WHERE jaccard >= 0.5),
             shp AS ({sqls["q37_simhash_neardup"]}),
             ex AS (
                 SELECT doc_id FROM (
                     SELECT doc_id,
                            count(*) OVER (PARTITION BY sha256(text)) AS n
                     FROM documents)
                 WHERE n > 1
             ),
             mhd AS (SELECT id_a AS doc_id FROM mhp
                     UNION SELECT id_b FROM mhp),
             shd AS (SELECT id_a AS doc_id FROM shp
                     UNION SELECT id_b FROM shp),
             un AS (SELECT doc_id FROM ex
                    UNION SELECT doc_id FROM mhd
                    UNION SELECT doc_id FROM shd)
        SELECT 'exact_hash' AS method, count(*) AS n_docs_flagged FROM ex
        UNION ALL SELECT 'minhash_lsh', count(*) FROM mhd
        UNION ALL SELECT 'simhash', count(*) FROM shd
        UNION ALL SELECT 'union', count(*) FROM un
    """
    sqls["q203_banding_sensitivity"] = """
        SELECT 2 AS bands, (
        WITH tok AS (
            SELECT doc_id, {TOKS} AS toks FROM documents
        ), shg AS (
            SELECT doc_id, {SH3} AS sh FROM tok
        ), sig AS (
            SELECT doc_id, {SIGS} AS sg
            FROM (SELECT doc_id, {SHASH} AS hs FROM shg)
        ), banded AS (
            SELECT doc_id,
                   CAST(b AS VARCHAR) || '|' ||
                   array_to_string(sg[b*4+1:b*4+4], '|') AS band
            FROM sig, (SELECT unnest(range(0, 2)) AS b)
        )
        SELECT count(*) AS n FROM (
            SELECT DISTINCT a.doc_id, b.doc_id
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.doc_id < b.doc_id)
    ) AS n_pairs
        UNION ALL
        SELECT 4 AS bands, (
        WITH tok AS (
            SELECT doc_id, {TOKS} AS toks FROM documents
        ), shg AS (
            SELECT doc_id, {SH3} AS sh FROM tok
        ), sig AS (
            SELECT doc_id, {SIGS} AS sg
            FROM (SELECT doc_id, {SHASH} AS hs FROM shg)
        ), banded AS (
            SELECT doc_id,
                   CAST(b AS VARCHAR) || '|' ||
                   array_to_string(sg[b*2+1:b*2+2], '|') AS band
            FROM sig, (SELECT unnest(range(0, 4)) AS b)
        )
        SELECT count(*) AS n FROM (
            SELECT DISTINCT a.doc_id, b.doc_id
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.doc_id < b.doc_id)
    ) AS n_pairs
    """.replace("{TOKS}", _TOKS).replace("{SH3}", _SHINGLES3).replace(
        "{SIGS}", _sig_exprs(8)).replace("{SHASH}", _SHINGLE_HASH)
    sqls["q201_window_aligned_conversion"] = """
        WITH b AS (
            SELECT event_type,
                   strftime(make_timestamp(
                       CAST(epoch_us(ts) - (epoch_us(ts) % 900000000)
                            AS BIGINT)), '%Y-%m-%d %H:%M') AS bucket
            FROM events
            WHERE event_type IN ('click', 'purchase')
        ), c AS (
            SELECT bucket, count(*) AS n_clicks FROM b
            WHERE event_type = 'click' GROUP BY bucket
        ), p AS (
            SELECT bucket, count(*) AS n_purchases FROM b
            WHERE event_type = 'purchase' GROUP BY bucket
        )
        SELECT c.bucket, n_clicks,
               coalesce(n_purchases, 0) AS n_purchases,
               floor((CAST(coalesce(n_purchases, 0) AS DOUBLE) / n_clicks)
                     * 1e6 + 0.5) / 1e6 AS conversion
        FROM c LEFT JOIN p USING (bucket)
    """
    sqls["q202_cluster_size_distribution"] = sqls["q45_dedup_clusters"].replace(
        """            SELECT node, component,
                   count(*) OVER (PARTITION BY component) AS cluster_size
            FROM comp""",
        """            , csz AS (
                SELECT component, count(*) AS cluster_size
                FROM comp GROUP BY component
            )
            SELECT cluster_size AS size, count(*) AS n_clusters,
                   CAST(sum(cluster_size) AS BIGINT) AS n_docs
            FROM csz GROUP BY cluster_size"""
    )
    sqls["q204_pareto_concentration"] = """
        WITH per_cust AS (
            SELECT c_mktsegment, c_custkey,
                   sum(CAST(round(l_extendedprice * (1 - l_discount)
                                  * 10000) AS BIGINT)) AS rev
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2
        ), cuts AS (
            SELECT c_mktsegment, quantile_cont(rev, 0.8) AS p80,
                   sum(rev) AS tot, count(*) AS n_customers
            FROM per_cust GROUP BY 1
        )
        SELECT c_mktsegment, count(*) AS n_top_customers,
               any_value(n_customers) AS n_customers,
               floor(CAST(sum(rev) AS DOUBLE) * 1e6 / any_value(tot) + 0.5)
                   / 1e6 AS top20pct_revenue_share
        FROM per_cust JOIN cuts USING (c_mktsegment)
        WHERE rev > p80
        GROUP BY c_mktsegment
    """
    sqls["q205_null_aggregate_semantics"] = """
        WITH ann AS (
            SELECT event_type,
                   CASE WHEN value >= 50 THEN value END AS v
            FROM events
        )
        SELECT event_type,
               count(*) AS n_rows,
               count(v) AS n_nonnull,
               count(DISTINCT v) AS n_distinct_nonnull,
               round(sum(v), 2) AS sum_v,
               floor(CAST(sum(CAST(round(v * 100) AS BIGINT)) AS DOUBLE)
                     * 1e6 / (count(v) * 100) + 0.5) / 1e6 AS avg_nonnull,
               floor(CAST(sum(CAST(round(v * 100) AS BIGINT)) AS DOUBLE)
                     * 1e6 / (count(*) * 100) + 0.5) / 1e6 AS sum_over_rows
        FROM ann GROUP BY event_type
    """
    # q206: same integer rank-selection rule (cum*d >= n*i ⟺ cum >= ceil(n*i/d))
    # over per-distinct-value counts — no float rank math on either engine.
    # q207 has NO oracle on purpose: approx_percentile's sketch output is
    # engine-internal; its audit columns + tolerance test carry correctness.
    sqls["q206_group_quantiles_scalable"] = """
        WITH dist AS (
            SELECT l_returnflag, l_extendedprice AS v, count(*) AS c
            FROM lineitem GROUP BY 1, 2
        ), cum AS (
            SELECT l_returnflag, v,
                   sum(c) OVER (PARTITION BY l_returnflag ORDER BY v) AS cumc,
                   sum(c) OVER (PARTITION BY l_returnflag) AS n
            FROM dist
        ), price AS (
            SELECT l_returnflag,
                   round(min(CASE WHEN cumc * 4 >= n * 1 THEN v END), 2) AS p25_price,
                   round(min(CASE WHEN cumc * 4 >= n * 2 THEN v END), 2) AS p50_price,
                   round(min(CASE WHEN cumc * 4 >= n * 3 THEN v END), 2) AS p75_price
            FROM cum GROUP BY l_returnflag
        ), qdist AS (
            SELECT l_returnflag, l_quantity AS v, count(*) AS c
            FROM lineitem GROUP BY 1, 2
        ), qcum AS (
            SELECT l_returnflag, v,
                   sum(c) OVER (PARTITION BY l_returnflag ORDER BY v) AS cumc,
                   sum(c) OVER (PARTITION BY l_returnflag) AS n
            FROM qdist
        ), qty AS (
            SELECT l_returnflag,
                   round(min(CASE WHEN cumc * 2 >= n THEN v END), 1) AS median_qty
            FROM qcum GROUP BY l_returnflag
        )
        SELECT l_returnflag, p25_price, p50_price, p75_price, median_qty
        FROM price JOIN qty USING (l_returnflag)
    """
    sqls["q208_rag_chunking"] = f"""
        WITH b AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
        b2 AS (SELECT doc_id, source, toks, len(toks) AS n FROM b),
        ch AS (SELECT doc_id, source, toks, n,
                      unnest(range(0, n, 24)) AS s
               FROM b2),
        c2 AS (SELECT doc_id, source, n, least(32, n - s) AS ct,
                      md5(array_to_string(toks[s+1:s+32], ' ')) AS h
               FROM ch),
        per_src AS (
            SELECT source, count(DISTINCT doc_id) AS n_docs,
                   count(*) AS n_chunks,
                   CAST(sum(ct) AS BIGINT) AS chunk_tokens,
                   floor((1.0 - CAST(count(DISTINCT h) AS DOUBLE) / count(*))
                         * 1e6 + 0.5) / 1e6
                       AS dup_chunk_frac
            FROM c2 GROUP BY source),
        dt AS (SELECT source, CAST(sum(n) AS BIGINT) AS doc_tokens
               FROM b2 GROUP BY source)
        SELECT source, n_docs, n_chunks, chunk_tokens, doc_tokens,
               dup_chunk_frac,
               floor((CAST(chunk_tokens AS DOUBLE) / doc_tokens) * 1e6 + 0.5)
                   / 1e6 AS expansion
        FROM per_src JOIN dt USING (source)
    """
    sqls["q209_mixture_weights"] = f"""
        WITH t AS (
            SELECT source, CAST(sum(len({_TOKS})) AS BIGINT) AS corpus_tokens
            FROM documents GROUP BY source
        ), z AS (SELECT sum(pow(corpus_tokens, 0.7)) AS z FROM t)
        SELECT source, corpus_tokens,
               round(pow(corpus_tokens, 0.7) / z, 6) AS weight,
               round(5000000 * pow(corpus_tokens, 0.7) / z / corpus_tokens, 6)
                   AS epochs_at_5m
        FROM t CROSS JOIN z
    """
    sqls["q210_ngram_decontamination"] = f"""
        WITH tok AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
        sh AS (SELECT doc_id, source, {_SHINGLES13} AS s FROM tok),
        tpost AS (SELECT doc_id, source, unnest(s) AS g
                  FROM sh WHERE doc_id % 37 = 0),
        trpost AS (SELECT doc_id AS tid, unnest(s) AS g
                   FROM sh WHERE doc_id % 37 <> 0)
        SELECT t.doc_id, t.source,
               count(DISTINCT t.g) AS n_grams,
               count(DISTINCT CASE WHEN tr.tid IS NOT NULL THEN t.g END)
                   AS n_hit_grams,
               count(DISTINCT tr.tid) AS n_train_docs,
               floor((CAST(count(DISTINCT CASE WHEN tr.tid IS NOT NULL
                                          THEN t.g END) AS DOUBLE)
                      / count(DISTINCT t.g)) * 1e6 + 0.5) / 1e6
                   AS contamination
        FROM tpost t LEFT JOIN trpost tr USING (g)
        GROUP BY 1, 2
    """
    sqls["q211_centroid_confusion"] = """
        WITH v AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ve
            FROM embeddings
        ), ex AS (
            SELECT vec_id, label, CAST(t.range AS INT) - 1 AS pos,
                   ve[CAST(t.range AS INT)] AS val
            FROM v, range(1, 65) t
        ), cent AS (
            SELECT label AS clabel, pos, avg(val) AS cval
            FROM ex GROUP BY 1, 2
        ), d AS (
            SELECT vec_id, label, clabel,
                   sum((val - cval) * (val - cval)) AS d2
            FROM ex JOIN cent USING (pos) GROUP BY 1, 2, 3
        ), best AS (
            SELECT vec_id, label, clabel,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d2, clabel) AS rn
            FROM d
        )
        SELECT label, clabel AS assigned, count(*) AS n_vectors
        FROM best WHERE rn = 1 GROUP BY 1, 2
    """
    # lossless prefix + size filters => the oracle is the brute inverted-
    # index candidate join with full containment verification
    sqls["q212_containment_pairs"] = f"""
        WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        sh AS (SELECT doc_id, {_SHINGLES3} AS s FROM tok),
        post AS (SELECT doc_id, unnest(s) AS g FROM sh),
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM post a JOIN post b ON a.g = b.g AND a.doc_id <> b.doc_id
        )
        SELECT id_a, id_b,
               floor((CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / len(x.s)) * 1e6 + 0.5) / 1e6
                   AS containment
        FROM cand JOIN sh x ON x.doc_id = id_a JOIN sh y ON y.doc_id = id_b
        WHERE len(list_intersect(x.s, y.s)) * 1.0 / len(x.s) >= 0.6
    """
    sqls["q213_spearman_length_ttr"] = f"""
        WITH b AS (
            SELECT lang, n_chars * 1.0 AS x,
                   len(list_distinct({_TOKS})) * 1.0 / len({_TOKS}) AS y
            FROM documents
        ), r AS (
            SELECT lang,
                rank() OVER (PARTITION BY lang ORDER BY x)
                  + (count(*) OVER (PARTITION BY lang, x) - 1) / 2.0 AS rx,
                rank() OVER (PARTITION BY lang ORDER BY y)
                  + (count(*) OVER (PARTITION BY lang, y) - 1) / 2.0 AS ry
            FROM b
        )
        SELECT lang, count(*) AS n_docs,
               round(CASE WHEN count(*) * sum(rx * rx) - sum(rx) * sum(rx) > 0
                           AND count(*) * sum(ry * ry) - sum(ry) * sum(ry) > 0
                          THEN (count(*) * sum(rx * ry) - sum(rx) * sum(ry))
                               / sqrt((count(*) * sum(rx * rx)
                                       - sum(rx) * sum(rx))
                                      * (count(*) * sum(ry * ry)
                                         - sum(ry) * sum(ry)))
                     END, 6) + 0.0 AS spearman_rho
        FROM r GROUP BY lang
    """
    sqls["q214_ks_drift"] = f"""
        WITH b AS (
            SELECT source, len({_TOKS}) AS v FROM documents
            WHERE source IN ('src0', 'src1')
        ), cnt AS (
            SELECT v,
                   count(*) FILTER (source = 'src0') AS c0,
                   count(*) FILTER (source = 'src1') AS c1
            FROM b GROUP BY v
        ), cum AS (
            SELECT v,
                   sum(c0) OVER (ORDER BY v) * 1.0
                       / (SELECT sum(c0) FROM cnt) AS f0,
                   sum(c1) OVER (ORDER BY v) * 1.0
                       / (SELECT sum(c1) FROM cnt) AS f1
            FROM cnt
        )
        SELECT CAST((SELECT sum(c0) FROM cnt) AS BIGINT) AS n_a,
               CAST((SELECT sum(c1) FROM cnt) AS BIGINT) AS n_b,
               round(max(abs(f0 - f1)), 6) AS ks_stat,
               CAST(min(v) FILTER (abs(f0 - f1) =
                    (SELECT max(abs(f0 - f1)) FROM cum)) AS BIGINT)
                   AS at_value
        FROM cum
    """
    # same integer block-sum identity as the Spark side: sum of i*c over a
    # tied frequency block c with k members starting after cum_before rows
    # = c * (2*cum_before + k + 1) * k / 2
    sqls["q215_vocab_gini"] = f"""
        WITH tok AS (
            SELECT unnest({_TOKS}) AS w FROM documents
        ), freq AS (
            SELECT w, count(*) AS c FROM tok WHERE w <> '' GROUP BY w
        ), dist AS (
            SELECT c, count(*) AS k FROM freq GROUP BY c
        ), cum AS (
            SELECT c, k,
                   coalesce(sum(k) OVER (ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cb
            FROM dist
        ), agg AS (
            SELECT sum(k) AS n, sum(c * k) AS tot,
                   sum(c * (2 * cb + k + 1) * k / 2) AS ic
            FROM cum
        )
        SELECT CAST(n AS BIGINT) AS vocab_size,
               CAST(tot AS BIGINT) AS total_tokens,
               floor((2 * CAST(ic AS DOUBLE) / (n * tot)
                      - CAST(n + 1 AS DOUBLE) / n) * 1e6 + 0.5) / 1e6 AS gini
        FROM agg
    """
    # NOT an f-string: the regex quantifiers {2,} would collide with format
    # braces. PII_PATTERNS is written in the Java/RE2 shared dialect, so the
    # literals here are byte-identical to functions/text.py.
    sqls["q216_pii_redaction_audit"] = r"""
        WITH built AS (
            SELECT c_mktsegment,
                   c_name || ' <' || lower(replace(c_name, '#', ''))
                   || '@example.com>'
                   || CASE WHEN c_custkey % 3 <> 0 THEN ' tel +'
                        || substr(lpad(CAST(c_custkey AS VARCHAR), 10, '0'), 1, 3)
                        || '-'
                        || substr(lpad(CAST(c_custkey AS VARCHAR), 10, '0'), 4, 3)
                        || '-'
                        || substr(lpad(CAST(c_custkey AS VARCHAR), 10, '0'), 7, 4)
                      ELSE '' END
                   || ' ip ' || CAST(c_custkey % 256 AS VARCHAR) || '.'
                   || CAST(c_nationkey % 256 AS VARCHAR) || '.'
                   || CAST(c_custkey % 100 AS VARCHAR) || '.7'
                   || ' https://hub.example/c/' || lower(c_mktsegment) AS txt
            FROM customer
        ), scrubbed AS (
            SELECT c_mktsegment, txt,
                   regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                       txt,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\+?\d[\d\- ]{7,14}\d', '<PHONE>', 'g'),
                       '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IPV4>', 'g'),
                       'https?://[^\s]+', '<URL>', 'g') AS red
            FROM built
        )
        SELECT c_mktsegment,
               count(*) AS n_customers,
               CAST(sum(len(regexp_extract_all(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS n_email,
               CAST(sum(len(regexp_extract_all(txt, '\+?\d[\d\- ]{7,14}\d'))) AS BIGINT) AS n_phone,
               CAST(sum(len(regexp_extract_all(txt, '\b(?:\d{1,3}\.){3}\d{1,3}\b'))) AS BIGINT) AS n_ipv4,
               CAST(sum(len(regexp_extract_all(txt, 'https?://[^\s]+'))) AS BIGINT) AS n_url,
               CAST(sum(
                   len(regexp_extract_all(red, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                 + len(regexp_extract_all(red, '\+?\d[\d\- ]{7,14}\d'))
                 + len(regexp_extract_all(red, '\b(?:\d{1,3}\.){3}\d{1,3}\b'))
                 + len(regexp_extract_all(red, 'https?://[^\s]+'))
               ) AS BIGINT) AS residual_matches
        FROM scrubbed
        GROUP BY c_mktsegment
    """
    sqls["q217_shard_assignment"] = r"""
        WITH s AS (
            SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) % 32 AS shard_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+'))
                   END AS tok
            FROM documents
        ), per AS (
            SELECT shard_id, count(*) AS n_docs,
                   CAST(sum(tok) AS BIGINT) AS n_tokens
            FROM s GROUP BY shard_id
        ), tot AS (
            SELECT CAST(sum(n_docs) AS BIGINT) AS nd, count(*) AS ns FROM per
        )
        SELECT shard_id, n_docs, n_tokens,
               floor((n_docs / (CAST(nd AS DOUBLE) / ns) - 1.0) * 1e6 + 0.5)
                   / 1e6 AS doc_skew
        FROM per, tot
    """
    sqls["q218_embedding_outliers"] = """
        WITH v AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ve
            FROM embeddings
        ), ex AS (
            SELECT vec_id, label, CAST(t.range AS INT) AS pos,
                   ve[CAST(t.range AS INT)] AS x
            FROM v, range(1, 65) t
        ), cent AS (
            SELECT label, pos, avg(x) AS c FROM ex GROUP BY 1, 2
        ), dist AS (
            SELECT vec_id, e.label,
                   sqrt(sum((x - c) * (x - c))) AS d
            FROM ex e JOIN cent USING (label, pos)
            GROUP BY 1, 2
        ), st AS (
            SELECT label, avg(d) AS mu, stddev_samp(d) AS sd
            FROM dist GROUP BY 1
        ), z AS (
            SELECT dist.label, vec_id, (d - mu) / sd AS zv FROM dist
            JOIN st USING (label)
            WHERE sd IS NOT NULL AND sd > 0
        ), r AS (
            SELECT label, vec_id, zv,
                   row_number() OVER (PARTITION BY label
                                      ORDER BY zv DESC, vec_id) AS rank
            FROM z
        )
        SELECT label, vec_id, round(zv, 6) AS z_score, CAST(rank AS BIGINT) AS rank
        FROM r WHERE rank <= 3
    """
    sqls["q219_dsir_importance"] = r"""
        WITH tok AS (
            SELECT doc_id, source, lang,
                   unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
            FROM documents
        ), tk AS (
            SELECT * FROM tok WHERE w <> ''
        ), cnt AS (
            SELECT w, count(*) AS ca,
                   count(*) FILTER (lang = 'en') AS ce
            FROM tk GROUP BY w
        ), tots AS (
            SELECT CAST(sum(ca) AS BIGINT) AS ta, CAST(sum(ce) AS BIGINT) AS te,
                   count(*) AS v
            FROM cnt
        ), model AS (
            SELECT w, ln((ce + 1) * 1.0 / (te + v)) - ln((ca + 1) * 1.0 / (ta + v)) AS s
            FROM cnt, tots
        ), per_doc AS (
            SELECT doc_id, source, avg(s) AS wgt
            FROM tk JOIN model USING (w)
            GROUP BY 1, 2
        )
        SELECT source, count(*) AS n_docs,
               round(avg(wgt), 6) AS avg_importance,
               count(*) FILTER (wgt > 0) AS n_selected
        FROM per_doc GROUP BY source
    """
    # the oracle IS the single-task form q220 exists to avoid — same answer,
    # opposite execution shape
    sqls["q220_scalable_row_number"] = """
        SELECT doc_id, source,
               row_number() OVER (ORDER BY doc_id) AS global_idx
        FROM documents
    """
    sqls["q221_decayed_engagement"] = """
        WITH mx AS (SELECT max(ts) AS mxts FROM events)
        SELECT event_type,
               count(*) AS n_events,
               round(sum(value * exp(-0.6931471805599453
                   * (epoch(mxts) - epoch(ts)) / 604800.0)), 6) AS decayed_value,
               round(sum(exp(-0.6931471805599453
                   * (epoch(mxts) - epoch(ts)) / 604800.0)), 6) AS effective_events
        FROM events, mx
        GROUP BY event_type
    """
    sqls["q222_brand_price_regression"] = """
        SELECT p_brand,
               count(*) AS n_lines,
               round(regr_slope(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE),
                                CAST(l_quantity AS DOUBLE)), 4) AS slope,
               round(regr_intercept(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE),
                                    CAST(l_quantity AS DOUBLE)), 4) AS intercept,
               round(regr_r2(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE),
                             CAST(l_quantity AS DOUBLE)), 6) AS r2
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """
    # the oracle IS the O(n^2) cross join the deletion-neighborhood equi-join
    # exists to avoid — same answer, opposite execution shape
    sqls["q223_symspell_name_pairs"] = """
        SELECT a.s_suppkey AS suppkey_a, b.s_suppkey AS suppkey_b,
               CAST(levenshtein(a.s_name, b.s_name) AS INT) AS dist
        FROM supplier a, supplier b
        WHERE a.s_suppkey < b.s_suppkey
          AND levenshtein(a.s_name, b.s_name) <= 1
    """
    sqls["q224_segment_nation_mi"] = """
        WITH joint AS (
            SELECT c_mktsegment, c_nationkey, count(*) AS nxy
            FROM customer GROUP BY 1, 2
        ), seg AS (
            SELECT c_mktsegment, sum(nxy) AS nx FROM joint GROUP BY 1
        ), nat AS (
            SELECT c_nationkey, sum(nxy) AS ny FROM joint GROUP BY 1
        ), tot AS (
            SELECT CAST(sum(nxy) AS DOUBLE) AS n,
                   count(DISTINCT c_mktsegment) AS r,
                   count(DISTINCT c_nationkey) AS c
            FROM joint
        ), agg AS (
            SELECT any_value(n) AS n, any_value(r) AS r, any_value(c) AS c,
                   round(sum((nxy / n) * ln(nxy * n / (nx * ny))), 6) AS mi_nats,
                   round(sum((nxy - nx * ny / n) * (nxy - nx * ny / n)
                             / (nx * ny / n)), 4) AS chi2
            FROM joint
            JOIN seg USING (c_mktsegment)
            JOIN nat USING (c_nationkey)
            CROSS JOIN tot
        )
        SELECT CAST(n AS BIGINT) AS n_customers, mi_nats, chi2,
               round(sqrt(chi2 / (n * least(r - 1, c - 1))), 6) AS cramers_v
        FROM agg
    """
    sqls["q225_benford_audit"] = """
        WITH per AS (
            SELECT CAST(floor(CAST(o_totalprice AS DOUBLE)
                       / power(10.0, floor(log10(CAST(o_totalprice AS DOUBLE)))))
                       AS BIGINT) AS digit,
                   count(*) AS n_orders
            FROM orders GROUP BY 1
        ), tot AS (SELECT CAST(sum(n_orders) AS DOUBLE) AS n FROM per)
        SELECT digit, n_orders,
               round(n_orders / n, 6) AS obs_share,
               round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS benford_share,
               round(n * (n_orders / n - ln(1.0 + 1.0 / digit) / ln(10.0))
                       * (n_orders / n - ln(1.0 + 1.0 / digit) / ln(10.0))
                       / (ln(1.0 + 1.0 / digit) / ln(10.0)), 4) AS chi2_term
        FROM per, tot
    """
    # q23's banding SQL with the candidate join restricted to new x corpus
    sqls["q228_incremental_lsh_dedup"] = f"""
        WITH tok AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ), shg AS (
            SELECT doc_id, {_SHINGLES3} AS sh FROM tok
        ), sig AS (
            SELECT doc_id, sh, {_sig_exprs(8)} AS sg
            FROM (SELECT doc_id, sh, {_SHINGLE_HASH} AS hs FROM shg)
        ), banded AS (
            SELECT doc_id, sh, b AS band_idx,
                   CAST(b AS VARCHAR) || '|' || array_to_string(sg[b*2+1:b*2+2], '|') AS band
            FROM sig, (SELECT unnest(range(0, 4)) AS b)
        ), cand AS (
            SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
            FROM banded a JOIN banded b ON a.band = b.band
            WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
        )
        SELECT c.new_id, c.corpus_id,
               floor((CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                     / len(list_distinct(list_concat(x.sh, y.sh)))) * 1e6 + 0.5) / 1e6 AS jaccard
        FROM cand c
        JOIN shg x ON x.doc_id = c.new_id
        JOIN shg y ON y.doc_id = c.corpus_id
        WHERE len(list_intersect(x.sh, y.sh)) * 1.0
              / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.1
    """
    sqls["q229_logreg_gradient"] = r"""
        WITH feat AS (
            SELECT n_chars / 1000.0 AS x1,
                   len(regexp_split_to_array(trim(text), '\s+')) / 100.0 AS x2,
                   CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
            FROM documents
        ), scored AS (
            SELECT x1, x2, y,
                   1.0 / (1.0 + exp(-(0.3 * x1 - 0.2 * x2 + 0.1))) AS s
            FROM feat
        )
        SELECT count(*) AS n_docs,
               round(avg((s - y) * x1), 6) AS grad_chars,
               round(avg((s - y) * x2), 6) AS grad_tokens,
               round(avg(s - y), 6) AS grad_bias,
               round(avg(-(y * ln(s) + (1 - y) * ln(1 - s))), 6) AS log_loss
        FROM scored
    """
    sqls["q230_welch_ab_test"] = """
        WITH per AS (
            SELECT event_type, count(*) AS n, avg(value) AS mu,
                   var_samp(value) AS v
            FROM events GROUP BY 1
        ), ctrl AS (
            SELECT n AS nc, mu AS muc, v AS vc FROM per WHERE event_type = 'click'
        )
        SELECT p.event_type AS variant, p.n,
               round(p.mu - c.muc, 6) AS uplift,
               round((p.mu - c.muc) / sqrt(p.v / p.n + c.vc / c.nc), 6) AS t_stat,
               round(pow(p.v / p.n + c.vc / c.nc, 2)
                     / (pow(p.v / p.n, 2) / (p.n - 1)
                        + pow(c.vc / c.nc, 2) / (c.nc - 1)), 4) AS welch_dof
        FROM per p, ctrl c
        WHERE p.event_type <> 'click'
    """
    sqls["q231_twap_by_type"] = """
        WITH iv AS (
            SELECT event_type, value,
                   epoch_us(lead(ts) OVER (PARTITION BY event_type
                                           ORDER BY ts, event_id))
                       - epoch_us(ts) AS w
            FROM events
        )
        SELECT event_type, count(*) AS n_intervals,
               floor(CAST(sum(CAST(round(value * 100) AS BIGINT) * w) AS DOUBLE)
                     * 1e6 / (CAST(sum(w) AS DOUBLE) * 100) + 0.5) / 1e6 AS twap,
               floor(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                     * 1e6 / (count(*) * 100) + 0.5) / 1e6 AS plain_avg
        FROM iv WHERE w IS NOT NULL
        GROUP BY event_type
    """
    sqls["q232_cusum_changepoint"] = """
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   CAST(floor(CAST(sum(CAST(round(value * 100) AS BIGINT))
                                   AS DOUBLE) * 1e4 / count(*) + 0.5)
                        AS BIGINT) AS md
            FROM events GROUP BY 1, 2
        ), st AS (
            SELECT event_type, count(*) AS dd,
                   CAST(sum(md) AS BIGINT) AS tt
            FROM daily GROUP BY 1
        ), cusum AS (
            SELECT d.event_type, d.day,
                   s.dd * sum(d.md) OVER w
                       - row_number() OVER w * s.tt AS m,
                   s.dd
            FROM daily d JOIN st s USING (event_type)
            WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day)
        ), r AS (
            SELECT event_type, day, m, dd,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY abs(m) DESC, day) AS rk
            FROM cusum
        )
        SELECT event_type, strftime(day, '%Y-%m-%d') AS peak_day,
               floor(CAST(abs(m) AS DOUBLE) * 1e6 / (dd * 1000000) + 0.5)
                   / 1e6 AS cusum_peak
        FROM r WHERE rk = 1
    """
    sqls["q233_feature_hashing"] = r"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
            FROM documents WHERE doc_id < 50
        )
        SELECT doc_id,
               CAST('0x' || substring(md5(w), 1, 8) AS BIGINT) % 16 AS bucket,
               CAST(sum(CASE WHEN substring(md5(w), 9, 1) IN
                        ('0','2','4','6','8','a','c','e') THEN 1 ELSE -1 END)
                    AS BIGINT) AS feat
        FROM tok WHERE w <> ''
        GROUP BY 1, 2
    """
    sqls["q226_event_transition_matrix"] = """
        WITH seq AS (
            SELECT event_type AS next_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        ), trans AS (
            SELECT prev_type, next_type, count(*) AS n
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT prev_type, next_type, n,
               floor((CAST(n AS DOUBLE)
                      / sum(n) OVER (PARTITION BY prev_type)) * 1e6 + 0.5)
                   / 1e6 AS prob
        FROM trans
    """
    # the oracle IS the full-vocabulary groupBy the two-phase MG path avoids
    sqls["q227_heavy_hitter_tokens"] = r"""
        WITH tok AS (
            SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
            FROM documents
        ), c AS (
            SELECT w, count(*) AS n FROM tok WHERE w <> '' GROUP BY w
        ), t AS (SELECT sum(n) AS tot FROM c)
        SELECT w AS token, n,
               floor((CAST(n AS DOUBLE) / tot) * 1e6 + 0.5) / 1e6 AS share
        FROM c, t
        WHERE n >= 0.02 * tot
    """
    sqls["q234_roc_auc_daily"] = """
        WITH lab AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day, value,
                   CASE WHEN event_type IN ('purchase','signup') THEN 1 ELSE 0 END AS y
            FROM events
        ), g AS (
            SELECT day, value, sum(y) AS pos, sum(1 - y) AS neg
            FROM lab GROUP BY 1, 2
        ), r AS (
            SELECT day, pos, neg,
                   sum(neg) OVER (PARTITION BY day ORDER BY value
                                  ROWS UNBOUNDED PRECEDING) - neg AS cneg
            FROM g
        )
        SELECT strftime(day, '%Y-%m-%d') AS day,
               CAST(sum(pos) AS BIGINT) AS n_pos,
               CAST(sum(neg) AS BIGINT) AS n_neg,
               CASE WHEN sum(pos) > 0 AND sum(neg) > 0
                    THEN floor((CAST(sum(pos * (cneg + 0.5 * neg)) AS DOUBLE)
                                / (sum(pos) * sum(neg))) * 1e6 + 0.5) / 1e6
               END AS auc
        FROM r GROUP BY day
    """
    sqls["q235_calibration_ece"] = r"""
        WITH scored AS (
            SELECT 1.0 / (1.0 + exp(-(0.9 * (n_chars - 300.0) / 100.0
                       - 0.7 * (len(regexp_split_to_array(trim(text), '\s+')) - 50.0) / 20.0
                       + 0.1))) AS s,
                   CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
            FROM documents
        ), bins AS (
            SELECT least(CAST(floor(s * 10) AS BIGINT), 9) AS bin,
                   count(*) AS n, avg(s) AS conf, avg(y) AS acc
            FROM scored GROUP BY 1
        ), tot AS (
            SELECT sum(n) AS t, sum(abs(acc - conf) * n) AS werr FROM bins
        )
        SELECT bin, n, round(conf, 6) AS confidence,
               floor(acc * 1e6 + 0.5) / 1e6 AS accuracy,
               round(abs(acc - conf), 6) AS gap, round(werr / t, 6) AS ece
        FROM bins, tot
    """
    # unrolled hop CTEs (frontier \ visited) — NOT path recursion, which
    # explodes on a dense co-occurrence graph; mirrors bfs_hops round-wise
    sqls["q236_bfs_reach"] = """
        WITH e AS (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
            WHERE a.l_partkey <> b.l_partkey
        ), h0 AS (
            SELECT DISTINCT src AS node FROM e WHERE src <= 5
        ), h1 AS (
            SELECT DISTINCT e.dst AS node FROM e JOIN h0 ON e.src = h0.node
            WHERE e.dst NOT IN (SELECT node FROM h0)
        ), h2 AS (
            SELECT DISTINCT e.dst AS node FROM e JOIN h1 ON e.src = h1.node
            WHERE e.dst NOT IN (SELECT node FROM h0)
              AND e.dst NOT IN (SELECT node FROM h1)
        ), h3 AS (
            SELECT DISTINCT e.dst AS node FROM e JOIN h2 ON e.src = h2.node
            WHERE e.dst NOT IN (SELECT node FROM h0)
              AND e.dst NOT IN (SELECT node FROM h1)
              AND e.dst NOT IN (SELECT node FROM h2)
        ), walk AS (
            SELECT node, 0 AS hop FROM h0
            UNION ALL SELECT node, 1 FROM h1
            UNION ALL SELECT node, 2 FROM h2
            UNION ALL SELECT node, 3 FROM h3
        )
        SELECT hop, count(*) AS n_nodes, bit_xor(node) AS node_xor
        FROM walk GROUP BY hop ORDER BY hop
    """
    sqls["q237_kaplan_meier"] = """
        WITH life AS (
            SELECT o_custkey, min(o_orderdate) AS f, max(o_orderdate) AS l
            FROM orders GROUP BY 1
        ), horizon AS (
            SELECT max(o_orderdate) AS hmax FROM orders
        ), per AS (
            SELECT c.c_mktsegment AS segment,
                   datediff('day', life.f, life.l) AS t,
                   CASE WHEN datediff('day', life.l, horizon.hmax) > 365
                        THEN 1 ELSE 0 END AS ev
            FROM life
            CROSS JOIN horizon
            JOIN customer c ON life.o_custkey = c.c_custkey
        ), tbl AS (
            SELECT segment, t, sum(ev) AS d, count(*) AS alln
            FROM per GROUP BY 1, 2
        ), risk AS (
            SELECT segment, t, d,
                   sum(alln) OVER (PARTITION BY segment ORDER BY t
                                   ROWS BETWEEN CURRENT ROW
                                   AND UNBOUNDED FOLLOWING) AS n_risk
            FROM tbl
        ), km AS (
            SELECT segment, t, d, n_risk,
                   sum(ln(greatest(1.0 - d * 1.0 / n_risk, 1e-300)))
                       OVER (PARTITION BY segment ORDER BY t
                             ROWS UNBOUNDED PRECEDING) AS lnS
            FROM risk
        )
        SELECT segment, t, CAST(n_risk AS BIGINT) AS n_risk,
               CAST(d AS BIGINT) AS d, round(exp(lnS), 6) AS survival
        FROM km WHERE d > 0
    """
    sqls["q238_acf_daily_orders"] = """
        WITH daily AS (
            SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
                   count(*) AS n, sum(o_totalprice) AS rev
            FROM orders GROUP BY 1
        ), lags AS (
            SELECT CAST(unnest(range(1, 8)) AS INT) AS lag
        )
        , mom AS (
            SELECT l.lag, count(*) AS np,
                   sum(CAST(d1.n AS DOUBLE)) AS sx,
                   sum(CAST(d2.n AS DOUBLE)) AS sy,
                   sum(CAST(d1.n AS DOUBLE) * CAST(d2.n AS DOUBLE)) AS sxy,
                   sum(CAST(d1.n AS DOUBLE) * CAST(d1.n AS DOUBLE)) AS sxx,
                   sum(CAST(d2.n AS DOUBLE) * CAST(d2.n AS DOUBLE)) AS syy,
                   sum(d1.rev) AS rsx, sum(d2.rev) AS rsy,
                   sum(d1.rev * d2.rev) AS rsxy,
                   sum(d1.rev * d1.rev) AS rsxx,
                   sum(d2.rev * d2.rev) AS rsyy
            FROM daily d1 CROSS JOIN lags l
            JOIN daily d2 ON d2.day = d1.day - l.lag * INTERVAL 1 DAY
            GROUP BY l.lag
        )
        SELECT lag, CAST(np AS BIGINT) AS n_pairs,
               round(CASE WHEN np * sxx - sx * sx > 0
                           AND np * syy - sy * sy > 0
                          THEN (np * sxy - sx * sy)
                               / sqrt((np * sxx - sx * sx)
                                      * (np * syy - sy * sy))
                     END, 6) AS acf_count,
               round(CASE WHEN np * rsxx - rsx * rsx > 0
                           AND np * rsyy - rsy * rsy > 0
                          THEN (np * rsxy - rsx * rsy)
                               / sqrt((np * rsxx - rsx * rsx)
                                      * (np * rsyy - rsy * rsy))
                     END, 6) AS acf_revenue
        FROM mom ORDER BY lag
    """
    sqls["q239_qq_decile_drift"] = """
        WITH coh AS (
            SELECT CASE WHEN CAST(date_trunc('day', ts) AS DATE) < DATE '2024-01-08'
                        THEN 'first_week'
                        WHEN CAST(date_trunc('day', ts) AS DATE) >= DATE '2024-01-24'
                        THEN 'last_week' END AS cohort, value
            FROM events
        ), g AS (
            SELECT cohort, value, count(*) AS c FROM coh
            WHERE cohort IS NOT NULL GROUP BY 1, 2
        ), cum AS (
            SELECT cohort, value,
                   sum(c) OVER (PARTITION BY cohort ORDER BY value
                                ROWS UNBOUNDED PRECEDING) AS cm,
                   sum(c) OVER (PARTITION BY cohort) AS tot
            FROM g
        ), ks AS (SELECT CAST(unnest(range(1, 10)) AS INT) AS decile),
        q AS (
            SELECT cohort, decile, min(value) AS q
            FROM cum CROSS JOIN ks
            WHERE cm * 10 >= decile * tot
            GROUP BY 1, 2
        )
        SELECT decile,
               round(max(CASE WHEN cohort = 'first_week' THEN q END), 2) AS q_first,
               round(max(CASE WHEN cohort = 'last_week' THEN q END), 2) AS q_last,
               round(max(CASE WHEN cohort = 'last_week' THEN q END)
                     - max(CASE WHEN cohort = 'first_week' THEN q END), 2) AS gap
        FROM q GROUP BY decile ORDER BY decile
    """
    sqls["q240_neyman_allocation"] = """
        WITH per AS (
            SELECT c.c_mktsegment AS segment, count(*) AS n_orders,
                   stddev_samp(o.o_totalprice) AS s
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1
        ), tot AS (SELECT sum(n_orders * s) AS ns FROM per),
        quota AS (
            SELECT segment, n_orders, s,
                   10000.0 * n_orders * s / tot.ns AS q,
                   floor(10000.0 * n_orders * s / tot.ns) AS base
            FROM per, tot
        ), lft AS (SELECT 10000 - sum(base) AS l FROM quota),
        rk AS (
            SELECT segment, n_orders, s, base,
                   row_number() OVER (ORDER BY q - base DESC, segment) AS r
            FROM quota
        )
        SELECT segment, n_orders, round(s, 2) AS stddev_price,
               CAST(base + CASE WHEN r <= lft.l THEN 1 ELSE 0 END AS BIGINT)
                   AS alloc
        FROM rk, lft
    """
    sqls["q241_seasonal_dow_index"] = """
        WITH daily AS (
            SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS u
            FROM orders GROUP BY 1
        ), dow AS (
            SELECT isodow(day) - 1 AS dow, count(*) AS n_days,
                   sum(u) AS sw
            FROM daily GROUP BY 1
        ), overall AS (
            SELECT sum(u) AS s_all, count(*) AS n_all FROM daily
        )
        SELECT dow, n_days,
               floor(CAST(sw AS DOUBLE) * 1e2 / (n_days * 100) + 0.5) / 1e2
                   AS avg_revenue,
               floor(CAST(sw AS DOUBLE) * n_all * 1e6
                     / (CAST(n_days AS DOUBLE) * s_all) + 0.5) / 1e6
                   AS seasonal_index
        FROM dow, overall ORDER BY dow
    """
    sqls["q242_robust_trend"] = """
        WITH daily AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                   floor(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                         * 1e6 / (count(*) * 100) + 0.5) / 1e6 AS mu
            FROM events GROUP BY 1, 2
        ), pairs AS (
            SELECT a.event_type,
                   (b.mu - a.mu) / datediff('day', a.day, b.day) AS slope,
                   sign(b.mu - a.mu) AS sgn
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND a.day < b.day
        ), agg AS (
            SELECT event_type, count(*) AS n_pairs,
                   CAST(sum(sgn) AS BIGINT) AS mk_s
            FROM pairs GROUP BY 1
        ), med AS (
            SELECT event_type,
                   floor(slope * 1e6 + 0.5) / 1e6 AS theil_sen_slope
            FROM (
                SELECT event_type, slope,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY slope) AS rn,
                       count(*) OVER (PARTITION BY event_type) AS np
                FROM pairs
            ) WHERE rn = floor((np + 1) / 2)
        )
        SELECT a.event_type, a.n_pairs, a.mk_s,
               floor((CAST(a.mk_s AS DOUBLE) / a.n_pairs) * 1e6 + 0.5) / 1e6
                   AS kendall_tau,
               m.theil_sen_slope
        FROM agg a JOIN med m USING (event_type)
    """
    sqls["q243_best_split_stump"] = """
        WITH lab AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day, value,
                   CASE WHEN event_type IN ('purchase','signup')
                        THEN 1 ELSE 0 END AS y
            FROM events
        ), g AS (
            SELECT day, value, sum(y) AS pos, sum(1 - y) AS neg
            FROM lab GROUP BY 1, 2
        ), cum AS (
            SELECT day, value,
                   sum(pos) OVER (PARTITION BY day ORDER BY value
                                  ROWS UNBOUNDED PRECEDING) AS cp,
                   sum(neg) OVER (PARTITION BY day ORDER BY value
                                  ROWS UNBOUNDED PRECEDING) AS cn,
                   sum(pos) OVER (PARTITION BY day) AS tp,
                   sum(neg) OVER (PARTITION BY day) AS tn
            FROM g
        ), scored AS (
            SELECT day, value, cp + cn AS n_left,
                   (tp - cp) + (tn - cn) AS n_right,
                   (CASE WHEN tp * 1.0 / (tp + tn) <= 0
                              OR tp * 1.0 / (tp + tn) >= 1 THEN 0.0
                         ELSE -(tp * 1.0 / (tp + tn)) * log2(tp * 1.0 / (tp + tn))
                              - (1 - tp * 1.0 / (tp + tn))
                                * log2(1 - tp * 1.0 / (tp + tn)) END)
                   - ((cp + cn) * 1.0 / (tp + tn))
                     * (CASE WHEN cp * 1.0 / (cp + cn) <= 0
                                  OR cp * 1.0 / (cp + cn) >= 1 THEN 0.0
                             ELSE -(cp * 1.0 / (cp + cn)) * log2(cp * 1.0 / (cp + cn))
                                  - (1 - cp * 1.0 / (cp + cn))
                                    * log2(1 - cp * 1.0 / (cp + cn)) END)
                   - (((tp - cp) + (tn - cn)) * 1.0 / (tp + tn))
                     * (CASE WHEN (tp - cp) * 1.0 / ((tp - cp) + (tn - cn)) <= 0
                                  OR (tp - cp) * 1.0 / ((tp - cp) + (tn - cn)) >= 1
                             THEN 0.0
                             ELSE -((tp - cp) * 1.0 / ((tp - cp) + (tn - cn)))
                                    * log2((tp - cp) * 1.0 / ((tp - cp) + (tn - cn)))
                                  - (1 - (tp - cp) * 1.0 / ((tp - cp) + (tn - cn)))
                                    * log2(1 - (tp - cp) * 1.0
                                           / ((tp - cp) + (tn - cn))) END)
                   AS gain
            FROM cum WHERE (tp - cp) + (tn - cn) > 0
        ), best AS (
            SELECT day, value, gain, n_left, n_right,
                   row_number() OVER (PARTITION BY day
                                      ORDER BY gain DESC, value) AS r
            FROM scored
        )
        SELECT strftime(day, '%Y-%m-%d') AS day, value AS best_threshold,
               round(gain, 6) AS info_gain,
               CAST(n_left AS BIGINT) AS n_left,
               CAST(n_right AS BIGINT) AS n_right
        FROM best WHERE r = 1
    """
    sqls["q244_gain_lift_table"] = r"""
        WITH scored AS (
            SELECT round(1.0 / (1.0 + exp(-(0.9 * (n_chars - 300.0) / 100.0
                       - 0.7 * (len(regexp_split_to_array(trim(text), '\s+'))
                                - 50.0) / 20.0
                       + 0.1))), 3) AS s3,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM documents
        ), g AS (
            SELECT s3, count(*) AS n, sum(y) AS pos FROM scored GROUP BY 1
        ), cum AS (
            SELECT s3, n, pos,
                   sum(n) OVER (ORDER BY s3 DESC ROWS UNBOUNDED PRECEDING) AS cn,
                   sum(pos) OVER (ORDER BY s3 DESC ROWS UNBOUNDED PRECEDING) AS cp
            FROM g
        ), tot AS (SELECT sum(n) AS t, sum(pos) AS tp FROM g),
        dec AS (
            SELECT CAST(ceil(cn * 10.0 / tot.t) AS INT) AS decile,
                   sum(n) AS n, sum(pos) AS n_pos, max(cp) AS cum_pos,
                   any_value(tot.t) AS t, any_value(tot.tp) AS tp
            FROM cum, tot GROUP BY 1
        )
        SELECT decile, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
               floor((CAST(cum_pos AS DOUBLE) / tp) * 1e6 + 0.5) / 1e6
                   AS capture_rate,
               floor(((CAST(n_pos AS DOUBLE) / n) / (CAST(tp AS DOUBLE) / t))
                     * 1e6 + 0.5) / 1e6 AS lift
        FROM dec ORDER BY decile
    """
    sqls["q245_fellegi_sunter"] = """
        WITH f AS (
            SELECT c_custkey, c_nationkey, c_mktsegment, c_name,
                   floor(c_acctbal / 500) AS bal
            FROM customer
        )
        SELECT a.c_custkey AS cust1, b.c_custkey AS cust2,
               round(
                   CASE WHEN a.c_mktsegment = b.c_mktsegment
                        THEN 1.504077 ELSE -2.079442 END
                 + CASE WHEN levenshtein(a.c_name, b.c_name) <= 2
                        THEN 6.856462 ELSE -2.995632 END
                 + CASE WHEN a.bal = b.bal
                        THEN 2.079442 ELSE -1.504077 END, 6) AS match_weight
        FROM f a JOIN f b
          ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        ORDER BY match_weight DESC, cust1, cust2
        LIMIT 20
    """
    sqls["q246_conformal_intervals"] = """
        WITH cal AS (
            SELECT event_type, value FROM events
            WHERE CAST(date_trunc('day', ts) AS DATE) < DATE '2024-01-16'
        ), tst AS (
            SELECT event_type, value FROM events
            WHERE CAST(date_trunc('day', ts) AS DATE) >= DATE '2024-01-16'
        ), mom AS (
            SELECT event_type, count(*) AS n_cal,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS c
            FROM cal GROUP BY 1
        ), sc AS (
            SELECT cl.event_type, m.n_cal,
                   abs(CAST(round(cl.value * 100) AS BIGINT) * m.n_cal - m.c)
                       AS si
            FROM cal cl JOIN mom m USING (event_type)
        ), qh AS (
            SELECT event_type, n_cal, si AS qi
            FROM (
                SELECT event_type, n_cal, si,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY si) AS rn
                FROM sc
            ) WHERE rn = ceil((n_cal + 1) * 0.9)
        )
        SELECT t.event_type, q.n_cal, count(*) AS n_test,
               floor(CAST(q.qi AS DOUBLE) * 1e4 / (100 * q.n_cal) + 0.5)
                   / 1e4 AS q_hat,
               floor((CAST(sum(CASE WHEN abs(CAST(round(t.value * 100)
                                                  AS BIGINT) * q.n_cal - m.c)
                                        <= q.qi THEN 1 ELSE 0 END)
                           AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6
                   AS coverage
        FROM tst t
        JOIN mom m USING (event_type)
        JOIN qh q ON q.event_type = t.event_type
        GROUP BY 1, 2, q.qi
    """
    sqls["q247_simpson_audit"] = """
        WITH spend AS (
            SELECT c.c_nationkey AS nation, c.c_acctbal AS bal,
                   s.spend
            FROM (SELECT o_custkey, sum(o_totalprice) AS spend
                  FROM orders GROUP BY 1) s
            JOIN customer c ON s.o_custkey = c.c_custkey
        ), overall AS (
            SELECT regr_slope(spend, bal) AS oslope FROM spend
        )
        SELECT nation, count(*) AS n_cust,
               round(regr_slope(spend, bal), 6) AS nation_slope,
               round(any_value(overall.oslope), 6) AS overall_slope,
               sign(regr_slope(spend, bal))
                   <> sign(any_value(overall.oslope)) AS sign_flip
        FROM spend, overall
        GROUP BY nation
    """
    sqls["q248_graph_modularity"] = """
        WITH e AS (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
            WHERE a.l_partkey <> b.l_partkey
        ), lab AS (
            SELECT ps.p_brand AS bs, pd.p_brand AS bd
            FROM e
            JOIN part ps ON e.src = ps.p_partkey
            JOIN part pd ON e.dst = pd.p_partkey
        ), m AS (SELECT count(*) / 2.0 AS m FROM lab),
        per AS (
            SELECT bs AS brand, count(*) AS deg,
                   sum(CASE WHEN bs = bd THEN 1 ELSE 0 END) AS within2
            FROM lab GROUP BY 1
        ), contrib AS (
            SELECT brand, within2, deg,
                   (within2 / 2.0) / m.m - pow(deg / (2 * m.m), 2) AS q
            FROM per, m
        ), tot AS (SELECT sum(q) AS bigq FROM contrib)
        SELECT brand, CAST(within2 / 2 AS BIGINT) AS e_within,
               deg AS degree_sum, round(q, 6) + 0.0 AS contribution,
               round(tot.bigq, 6) + 0.0 AS modularity
        FROM contrib, tot
    """
    sqls["q249_kcore_peel"] = """
        WITH e0 AS (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
            WHERE a.l_partkey <> b.l_partkey
        ),
        k0 AS (SELECT src FROM (SELECT src, count(*) AS c FROM e0 GROUP BY 1)
               WHERE c >= 120),
        e1 AS (SELECT src, dst FROM e0
               WHERE src IN (SELECT src FROM k0) AND dst IN (SELECT src FROM k0)),
        k1 AS (SELECT src FROM (SELECT src, count(*) AS c FROM e1 GROUP BY 1)
               WHERE c >= 120),
        e2 AS (SELECT src, dst FROM e1
               WHERE src IN (SELECT src FROM k1) AND dst IN (SELECT src FROM k1)),
        k2 AS (SELECT src FROM (SELECT src, count(*) AS c FROM e2 GROUP BY 1)
               WHERE c >= 120),
        e3 AS (SELECT src, dst FROM e2
               WHERE src IN (SELECT src FROM k2) AND dst IN (SELECT src FROM k2))
        SELECT 0 AS round, count(DISTINCT src) AS n_nodes,
               CAST(count(*) / 2 AS BIGINT) AS n_edges FROM e0
        UNION ALL
        SELECT 1, count(DISTINCT src), CAST(count(*) / 2 AS BIGINT) FROM e1
        UNION ALL
        SELECT 2, count(DISTINCT src), CAST(count(*) / 2 AS BIGINT) FROM e2
        UNION ALL
        SELECT 3, count(DISTINCT src), CAST(count(*) / 2 AS BIGINT) FROM e3
        ORDER BY round
    """
    sqls["q250_backtest_folds"] = """
        WITH daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   count(*) AS n,
                   sum(CASE WHEN event_type IN ('purchase','signup')
                            THEN 1 ELSE 0 END) AS conv
            FROM events GROUP BY 1
        ), folds AS (SELECT CAST(unnest(range(1, 4)) AS INT) AS fold),
        tagged AS (
            SELECT f.fold, d.n, d.conv,
                   CASE WHEN datediff('day', DATE '2024-01-01', d.day)
                             < f.fold * 7 THEN 'train'
                        WHEN datediff('day', DATE '2024-01-01', d.day)
                             < (f.fold + 1) * 7 THEN 'test' END AS part
            FROM daily d CROSS JOIN folds f
        )
        SELECT fold,
               CAST(sum(CASE WHEN part = 'train' THEN n END) AS BIGINT)
                   AS train_rows,
               CAST(sum(CASE WHEN part = 'test' THEN n END) AS BIGINT)
                   AS test_rows,
               floor((CAST(sum(CASE WHEN part = 'train' THEN conv END)
                           AS DOUBLE)
                      / sum(CASE WHEN part = 'train' THEN n END))
                     * 1e6 + 0.5) / 1e6
                   AS train_conv_rate,
               floor((CAST(sum(CASE WHEN part = 'test' THEN conv END)
                           AS DOUBLE)
                      / sum(CASE WHEN part = 'test' THEN n END))
                     * 1e6 + 0.5) / 1e6
                   AS test_conv_rate,
               floor((CAST(sum(CASE WHEN part = 'test' THEN conv END)
                           AS DOUBLE)
                      / sum(CASE WHEN part = 'test' THEN n END)
                      - CAST(sum(CASE WHEN part = 'train' THEN conv END)
                             AS DOUBLE)
                        / sum(CASE WHEN part = 'train' THEN n END))
                     * 1e6 + 0.5) / 1e6
                   AS label_shift
        FROM tagged WHERE part IS NOT NULL
        GROUP BY fold ORDER BY fold
    """
    sqls["q251_hits_bipartite"] = """
        WITH e AS (
            SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ), h1 AS (
            SELECT cust, count(*) * 1.0 AS h FROM e GROUP BY 1
        ), h1n AS (
            SELECT cust, h / (SELECT sum(h) FROM h1) AS h FROM h1
        ), a1 AS (
            SELECT e.part, sum(h1n.h) AS a FROM e JOIN h1n USING (cust)
            GROUP BY 1
        ), a1n AS (
            SELECT part, a / (SELECT sum(a) FROM a1) AS a FROM a1
        ), h2 AS (
            SELECT e.cust, sum(a1n.a) AS h FROM e JOIN a1n USING (part)
            GROUP BY 1
        ), h2n AS (
            SELECT cust, h / (SELECT sum(h) FROM h2) AS h FROM h2
        ), a2 AS (
            SELECT e.part, sum(h2n.h) AS a FROM e JOIN h2n USING (cust)
            GROUP BY 1
        )
        SELECT part, round(a / (SELECT sum(a) FROM a2) * 1e6, 6) AS authority_ppm
        FROM a2
        ORDER BY authority_ppm DESC, part
        LIMIT 20
    """
    sqls["q252_label_propagation"] = """
        WITH e AS (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
            WHERE a.l_partkey <> b.l_partkey
        ), l0 AS (
            SELECT n.node,
                   CASE WHEN n.node % 10 = 0 THEN p.p_brand END AS label
            FROM (SELECT DISTINCT src AS node FROM e) n
            JOIN part p ON n.node = p.p_partkey
        ), v1 AS (
            SELECT e.dst AS node, l0.label AS nl, count(*) AS v
            FROM e JOIN l0 ON e.src = l0.node
            WHERE l0.label IS NOT NULL
            GROUP BY 1, 2
        ), w1 AS (
            SELECT node, nl FROM (
                SELECT node, nl,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY v DESC, nl) AS r
                FROM v1
            ) WHERE r = 1
        ), l1 AS (
            SELECT l0.node, coalesce(l0.label, w1.nl) AS label
            FROM l0 LEFT JOIN w1 ON l0.node = w1.node
        ), v2 AS (
            SELECT e.dst AS node, l1.label AS nl, count(*) AS v
            FROM e JOIN l1 ON e.src = l1.node
            WHERE l1.label IS NOT NULL
            GROUP BY 1, 2
        ), w2 AS (
            SELECT node, nl FROM (
                SELECT node, nl,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY v DESC, nl) AS r
                FROM v2
            ) WHERE r = 1
        ), l2 AS (
            SELECT l1.node, coalesce(l1.label, w2.nl) AS label
            FROM l1 LEFT JOIN w2 ON l1.node = w2.node
        )
        SELECT coalesce(label, 'UNLABELED') AS label, count(*) AS n_nodes
        FROM l2 GROUP BY 1
    """
    sqls["q253_degree_assortativity"] = """
        WITH e AS (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
            WHERE a.l_partkey <> b.l_partkey
        ), d AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        mom AS (
            SELECT count(*) AS np,
                   CAST(sum(ds.deg) AS BIGINT) AS sds,
                   sum(CAST(ds.deg AS DOUBLE)) AS sx,
                   sum(CAST(dd.deg AS DOUBLE)) AS sy,
                   sum(CAST(ds.deg AS DOUBLE) * CAST(dd.deg AS DOUBLE)) AS sxy,
                   sum(CAST(ds.deg AS DOUBLE) * CAST(ds.deg AS DOUBLE)) AS sxx,
                   sum(CAST(dd.deg AS DOUBLE) * CAST(dd.deg AS DOUBLE)) AS syy
            FROM e JOIN d ds ON e.src = ds.src JOIN d dd ON e.dst = dd.src
        )
        SELECT CAST(np / 2 AS BIGINT) AS n_edges,
               floor(CAST(sds AS DOUBLE) * 1e4 / np + 0.5) / 1e4 AS avg_degree,
               round(CASE WHEN np * sxx - sx * sx > 0
                           AND np * syy - sy * sy > 0
                          THEN (np * sxy - sx * sy)
                               / sqrt((np * sxx - sx * sx)
                                      * (np * syy - sy * sy))
                     END, 6) AS assortativity
        FROM mom
    """
    sqls["q254_readability_proxy"] = r"""
        WITH totals AS (
            SELECT lang, count(*) AS n_docs,
                   sum(len(regexp_extract_all(lower(text), '[aeiouy]+')))
                       AS syl,
                   sum(len(regexp_split_to_array(trim(text), '\s+'))) AS words
            FROM documents GROUP BY 1
        ), tok AS (
            SELECT lang,
                   unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
            FROM documents
        ), cx AS (
            SELECT lang,
                   sum(CASE WHEN len(regexp_extract_all(w, '[aeiouy]+')) >= 3
                            THEN 1 ELSE 0 END) AS cxw,
                   count(*) AS nw
            FROM tok WHERE w <> '' GROUP BY 1
        )
        SELECT t.lang, t.n_docs,
               floor((CAST(t.syl AS DOUBLE) / t.words) * 1e6 + 0.5) / 1e6
                   AS syllables_per_word,
               floor((CAST(c.cxw AS DOUBLE) / c.nw) * 1e6 + 0.5) / 1e6
                   AS complex_word_share
        FROM totals t JOIN cx c USING (lang)
    """
    sqls["q255_doc_token_entropy"] = r"""
        WITH tok AS (
            SELECT doc_id, lang,
                   unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
            FROM documents
        ), cnt AS (
            SELECT doc_id, lang, w, count(*) AS c
            FROM tok WHERE w <> '' GROUP BY 1, 2, 3
        ), per_doc AS (
            SELECT doc_id, lang,
                   log2(sum(c)) - sum(c * log2(c)) / sum(c) AS h,
                   count(*) * 1.0 / sum(c) AS dr
            FROM cnt GROUP BY 1, 2
        )
        SELECT lang, count(*) AS n_docs,
               round(avg(h), 6) AS avg_entropy,
               round(min(h), 6) AS min_entropy,
               round(avg(dr), 6) AS avg_distinct_ratio
        FROM per_doc GROUP BY 1
    """
    sqls["q256_classifier_eval"] = f"""
        WITH conf AS (
            SELECT lang, {_lang_guess_sql("text")} AS pred, count(*) AS n
            FROM documents GROUP BY 1, 2
        ), sup AS (
            SELECT lang, CAST(sum(n) AS BIGINT) AS support FROM conf GROUP BY 1
        ), tp AS (
            SELECT lang, CAST(n AS BIGINT) AS tp FROM conf WHERE lang = pred
        ), pr AS (
            SELECT pred AS lang, sum(n) AS npred FROM conf GROUP BY 1
        ), j AS (
            SELECT s.lang, s.support,
                   coalesce(tp.tp, 0) AS tp,
                   coalesce(pr.npred, 0) AS np
            FROM sup s LEFT JOIN tp USING (lang) LEFT JOIN pr USING (lang)
        )
        , m AS (
            SELECT lang, support, tp,
                   CASE WHEN np > 0 THEN CAST(tp AS DOUBLE) / np
                        ELSE 0.0 END AS prec,
                   CAST(tp AS DOUBLE) / support AS rec
            FROM j
        )
        SELECT lang, support, tp,
               floor(prec * 1e6 + 0.5) / 1e6 AS precision,
               floor(rec * 1e6 + 0.5) / 1e6 AS recall,
               floor((CASE WHEN prec + rec > 0
                           THEN 2 * prec * rec / (prec + rec)
                           ELSE 0.0 END) * 1e6 + 0.5) / 1e6 AS f1
        FROM m
    """
    sqls["q257_time_to_conversion"] = """
        WITH per AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN epoch(ts) END) AS tv,
                   min(CASE WHEN event_type = 'purchase' THEN epoch(ts) END) AS tp
            FROM events GROUP BY 1
        ), conv AS (
            SELECT CAST(floor((tp - tv) / 3600) AS BIGINT) AS delay_h
            FROM per WHERE tv IS NOT NULL AND tp IS NOT NULL AND tv < tp
        ), tot AS (SELECT count(*) AS n FROM conv)
        SELECT delay_h, count(*) AS n_users,
               floor((CAST(count(*) AS DOUBLE) / any_value(tot.n)) * 1e6 + 0.5) / 1e6
                   AS share
        FROM conv, tot GROUP BY delay_h
    """
    sqls["q258_burstiness"] = """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
            FROM events GROUP BY 1, 2
        ), m AS (
            SELECT event_type, count(*) AS nh,
                   CAST(sum(n) AS BIGINT) AS s1,
                   CAST(sum(n * n) AS BIGINT) AS s2
            FROM hourly GROUP BY 1
        ), v AS (
            -- exact-moment variance: the identical IEEE sequence the
            -- Spark side evaluates over exact integer moments
            SELECT event_type, nh, s1,
                   (CAST(nh AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                       / (CAST(nh AS DOUBLE) * (nh - 1)) AS var,
                   CAST(s1 AS DOUBLE) / CAST(nh AS DOUBLE) AS mean
            FROM m
        )
        SELECT event_type, nh AS n_hours,
               floor(CAST(s1 AS DOUBLE) * 1e6 / nh + 0.5) / 1e6
                   AS mean_per_hour,
               floor(var * CAST(nh AS DOUBLE) / s1 * 1e6 + 0.5) / 1e6 AS fano,
               floor((sqrt(var) - mean) / (sqrt(var) + mean) * 1e6 + 0.5)
                   / 1e6 AS burstiness
        FROM v
    """
    sqls["q259_feature_ig_ranking"] = """
        WITH base AS (
            SELECT count(*) AS tn,
                   sum(CASE WHEN event_type IN ('purchase','signup')
                            THEN 1 ELSE 0 END) AS tpos
            FROM events
        ), melted AS (
            SELECT CASE WHEN event_type IN ('purchase','signup')
                        THEN 1 ELSE 0 END AS y,
                   f, v
            FROM events,
                 LATERAL (VALUES
                     ('event_type', event_type),
                     ('hour', CAST(hour(ts) AS VARCHAR)),
                     ('dow', CAST(isodow(date_trunc('day', ts)) - 1 AS VARCHAR)),
                     ('value_bucket', CAST(CAST(floor(value / 50) AS BIGINT)
                                           AS VARCHAR))) AS t(f, v)
        ), g AS (
            SELECT f, v, count(*) AS n, sum(y) AS pos
            FROM melted GROUP BY 1, 2
        ), hy AS (
            SELECT CASE WHEN tpos * 1.0 / tn <= 0 OR tpos * 1.0 / tn >= 1
                        THEN 0.0
                        ELSE -(tpos * 1.0 / tn) * log2(tpos * 1.0 / tn)
                             - (1 - tpos * 1.0 / tn)
                               * log2(1 - tpos * 1.0 / tn) END AS h,
                   tn
            FROM base
        )
        SELECT g.f AS feature, count(*) AS n_values,
               round(any_value(hy.h)
                     - sum((g.n * 1.0 / hy.tn)
                           * (CASE WHEN g.pos * 1.0 / g.n <= 0
                                        OR g.pos * 1.0 / g.n >= 1 THEN 0.0
                                   ELSE -(g.pos * 1.0 / g.n)
                                          * log2(g.pos * 1.0 / g.n)
                                        - (1 - g.pos * 1.0 / g.n)
                                          * log2(1 - g.pos * 1.0 / g.n)
                              END)), 6) AS info_gain
        FROM g, hy GROUP BY 1
    """
    sqls["q260_negative_sampling"] = """
        WITH n AS (SELECT count(*) AS nn FROM documents),
        pairs AS (
            SELECT doc_id,
                   lead(doc_id) OVER (PARTITION BY lang ORDER BY doc_id) AS pos
            FROM documents
        ), anch AS (
            SELECT doc_id, pos FROM pairs
            WHERE doc_id < 30 AND pos IS NOT NULL
        ), slots AS (
            SELECT doc_id, pos, CAST(unnest(range(0, 4)) AS INT) AS slot
            FROM anch
        ), hashed AS (
            SELECT doc_id, pos, slot, nn,
                   CAST('0x' || substring(md5(doc_id || '-' || slot), 1, 8)
                        AS BIGINT) % nn AS raw
            FROM slots, n
        )
        SELECT doc_id AS anchor_id, pos AS pos_id, slot,
               CASE WHEN raw <> doc_id AND raw <> pos THEN raw
                    WHEN (raw + 1) % nn <> doc_id AND (raw + 1) % nn <> pos
                        THEN (raw + 1) % nn
                    ELSE (raw + 2) % nn END AS neg_id
        FROM hashed
    """
    sqls["q261_map_hof_token_stats"] = r"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
            FROM documents WHERE doc_id < 20
        ), cnt AS (
            SELECT doc_id, w, count(*) AS c
            FROM tok WHERE w <> '' GROUP BY 1, 2
        ), tot AS (
            SELECT doc_id, sum(c) AS t FROM cnt GROUP BY 1
        )
        SELECT cnt.doc_id, cnt.w AS token, cnt.c AS cnt,
               floor((CAST(cnt.c AS DOUBLE) / tot.t) * 1e6 + 0.5) / 1e6
                   AS share
        FROM cnt JOIN tot USING (doc_id)
        WHERE cnt.c >= 3
    """
    sqls["q262_file_provenance"] = """
        SELECT 'orders.parquet' AS file, count(*) AS n_rows,
               min(o_orderkey) AS min_orderkey, max(o_orderkey) AS max_orderkey
        FROM orders
        UNION ALL
        SELECT 'lineitem.parquet', count(*), min(l_orderkey), max(l_orderkey)
        FROM lineitem
    """
    sqls["q263_table_checksums"] = """
        SELECT 'orders' AS table_name, count(*) AS n_rows,
               bit_xor(CAST('0x' || substring(md5(o_orderkey || '|' || o_custkey
                   || '|' || o_orderstatus), 1, 8) AS BIGINT)) AS checksum32
        FROM orders
        UNION ALL
        SELECT 'lineitem', count(*),
               bit_xor(CAST('0x' || substring(md5(l_orderkey || '|' || l_partkey
                   || '|' || l_linenumber), 1, 8) AS BIGINT))
        FROM lineitem
        UNION ALL
        SELECT 'customer', count(*),
               bit_xor(CAST('0x' || substring(md5(c_custkey || '|' || c_nationkey
                   || '|' || c_mktsegment), 1, 8) AS BIGINT))
        FROM customer
    """
    sqls["q264_referential_integrity"] = """
        SELECT 'orders_pk' AS constraint_name, 'pk_unique' AS kind,
               count(*) AS violations
        FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
        UNION ALL
        SELECT 'customer_pk', 'pk_unique', count(*)
        FROM (SELECT c_custkey FROM customer GROUP BY 1 HAVING count(*) > 1)
        UNION ALL
        SELECT 'part_pk', 'pk_unique', count(*)
        FROM (SELECT p_partkey FROM part GROUP BY 1 HAVING count(*) > 1)
        UNION ALL
        SELECT 'orders_custkey_fk', 'fk_orphan', count(*)
        FROM orders o WHERE NOT EXISTS
            (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'lineitem_orderkey_fk', 'fk_orphan', count(*)
        FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'lineitem_partkey_fk', 'fk_orphan', count(*)
        FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
        UNION ALL
        SELECT 'customer_nationkey_fk', 'fk_orphan', count(*)
        FROM customer c WHERE NOT EXISTS
            (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    """
    sqls["q200_catalog_rowcounts"] = """
        SELECT 'region' AS table_name, count(*) AS n_rows FROM region
        UNION ALL
        SELECT 'nation' AS table_name, count(*) AS n_rows FROM nation
        UNION ALL
        SELECT 'customer' AS table_name, count(*) AS n_rows FROM customer
        UNION ALL
        SELECT 'supplier' AS table_name, count(*) AS n_rows FROM supplier
        UNION ALL
        SELECT 'part' AS table_name, count(*) AS n_rows FROM part
        UNION ALL
        SELECT 'orders' AS table_name, count(*) AS n_rows FROM orders
        UNION ALL
        SELECT 'lineitem' AS table_name, count(*) AS n_rows FROM lineitem
        UNION ALL
        SELECT 'events' AS table_name, count(*) AS n_rows FROM events
        UNION ALL
        SELECT 'documents' AS table_name, count(*) AS n_rows FROM documents
        UNION ALL
        SELECT 'embeddings' AS table_name, count(*) AS n_rows FROM embeddings
    """
    sqls["q265_bpe_pair_counts"] = r"""
        WITH tok AS (
            SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
            FROM documents
        ), wc AS (
            SELECT w, count(*) AS f FROM tok WHERE w <> '' GROUP BY 1
        ), pos AS (
            SELECT w, f, unnest(range(1, len(w))) AS i
            FROM wc WHERE len(w) >= 2
        ), p AS (
            SELECT substring(w, CAST(i AS INT), 2) AS pair, f FROM pos
        )
        SELECT pair, CAST(sum(f) AS BIGINT) AS cnt
        FROM p GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 30
    """
    _pt = _POISSON1_T
    sqls["q266_poisson_bootstrap_ci"] = f"""
        WITH reps AS (
            SELECT o_orderkey, o_orderpriority, o_totalprice,
                   CAST(unnest(range(0, 40)) AS INT) AS r
            FROM orders
        ), wt AS (
            SELECT o_orderpriority, r, o_totalprice,
                   CAST('0x' || substring(md5(o_orderkey || '-' || r), 1, 8)
                        AS BIGINT) AS u
            FROM reps
        ), ws AS (
            SELECT o_orderpriority, r, o_totalprice,
                   CASE WHEN u < {_pt[0]} THEN 0 WHEN u < {_pt[1]} THEN 1
                        WHEN u < {_pt[2]} THEN 2 WHEN u < {_pt[3]} THEN 3
                        WHEN u < {_pt[4]} THEN 4 WHEN u < {_pt[5]} THEN 5
                        ELSE 6 END AS w
            FROM wt
        ), m AS (
            SELECT o_orderpriority, r,
                   sum(w * o_totalprice) / sum(w) AS m
            FROM ws GROUP BY 1, 2
        )
        SELECT o_orderpriority, round(avg(m), 2) AS boot_mean,
               round(stddev_samp(m), 4) AS boot_se,
               round(quantile_cont(m, 0.05), 2) AS ci_lo,
               round(quantile_cont(m, 0.95), 2) AS ci_hi
        FROM m GROUP BY 1
    """
    sqls["q267_adamic_adar"] = """
        WITH lp AS (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        ), deg AS (
            SELECT o, count(*) AS s FROM lp GROUP BY 1 HAVING count(*) >= 2
        ), pr AS (
            SELECT a.p AS p1, b.p AS p2, 1.0 / ln(d.s) AS w
            FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p
            JOIN deg d ON d.o = a.o
        ), scored AS (
            -- rank on the 9-decimal-rounded score: degree-multiset ties
            -- must cut deterministically at the LIMIT boundary
            SELECT p1, p2, round(sum(w), 9) AS aa, count(*) AS n_common
            FROM pr GROUP BY 1, 2
        )
        SELECT p1, p2, round(aa, 6) AS aa_score, n_common
        FROM scored ORDER BY aa DESC, p1, p2 LIMIT 50
    """
    _mz = " + ".join(
        f"(((bx >> {i}) & 1) * {2 ** (2 * i + 1)})"
        f" + (((by >> {i}) & 1) * {2 ** (2 * i)})"
        for i in range(4)
    )
    sqls["q268_zorder_pruning_audit"] = f"""
        WITH b AS (
            SELECT l_partkey % 16 AS bx, l_suppkey % 16 AS by FROM lineitem
        ), assigned AS (
            SELECT 'zorder' AS layout, ({_mz}) >> 3 AS file_id, bx, by FROM b
            UNION ALL
            SELECT 'linear', (bx * 16 + by) >> 3, bx, by FROM b
        ), spans AS (
            SELECT layout, file_id,
                   max(bx) - min(bx) + 1 AS sx,
                   max(by) - min(by) + 1 AS sy
            FROM assigned GROUP BY 1, 2
        )
        SELECT layout, count(*) AS n_files,
               floor(CAST(sum(sx) AS DOUBLE) * 1e4 / count(*) + 0.5)
                   / 1e4 AS avg_span_x,
               floor(CAST(sum(sy) AS DOUBLE) * 1e4 / count(*) + 0.5)
                   / 1e4 AS avg_span_y,
               floor(CAST(sum(greatest(sx, sy)) AS DOUBLE) * 1e4 / count(*)
                     + 0.5) / 1e4 AS avg_worst_span
        FROM spans GROUP BY 1
    """
    sqls["q269_nb_token_logodds"] = r"""
        WITH d AS (
            SELECT text, len(text) AS l FROM documents
        ), med AS (
            SELECT quantile_cont(l, 0.5) AS m FROM d
        ), tok AS (
            SELECT (d.l >= med.m) AS is_long,
                   unnest(regexp_split_to_array(lower(trim(d.text)), '\s+')) AS w
            FROM d, med
        ), cnt AS (
            SELECT w,
                   count(*) FILTER (is_long) AS c_long,
                   count(*) FILTER (NOT is_long) AS c_short
            FROM tok WHERE w <> '' GROUP BY 1
        ), tot AS (
            SELECT CAST(sum(c_long) AS BIGINT) AS tl,
                   CAST(sum(c_short) AS BIGINT) AS ts,
                   count(*) AS v
            FROM cnt
        ), scored AS (
            -- rank on the 9-decimal-rounded score: identical count tuples
            -- are mathematically tied and must cut deterministically
            SELECT w AS token, c_long, c_short,
                   round(ln((c_long + 1) * 1.0 / (tl + v))
                         - ln((c_short + 1) * 1.0 / (ts + v)), 9) AS lo
            FROM cnt, tot
        )
        SELECT token, c_long, c_short, round(lo, 6) AS log_odds
        FROM scored ORDER BY abs(lo) DESC, token LIMIT 25
    """
    sqls["q270_rrf_fusion"] = r"""
        WITH feat AS (
            SELECT doc_id, lang,
                   len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n,
                   len(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')))
                       * 1.0
                       / len(regexp_split_to_array(lower(trim(text)), '\s+')) AS ttr
            FROM documents
        ), ranked AS (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY n DESC, doc_id) AS r_len,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY ttr DESC, doc_id) AS r_ttr
            FROM feat
        ), fused AS (
            SELECT doc_id, lang, r_len, r_ttr,
                   1.0 / (60 + r_len) + 1.0 / (60 + r_ttr) AS rrf,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY 1.0 / (60 + r_len)
                                               + 1.0 / (60 + r_ttr) DESC,
                                               doc_id) AS fused_rank
            FROM ranked
        )
        SELECT lang, fused_rank, doc_id, r_len, r_ttr,
               round(rrf, 6) AS rrf_score
        FROM fused WHERE fused_rank <= 3
    """
    sqls["q271_ndcg_mrr"] = r"""
        WITH feat AS (
            SELECT doc_id, lang,
                   len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n,
                   doc_id % 3 AS rel
            FROM documents
        ), ranked AS (
            SELECT lang, rel,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY n DESC, doc_id) AS rk,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY rel DESC, doc_id) AS irk
            FROM feat
        )
        SELECT lang, count(*) AS n_docs,
               CASE WHEN sum(CASE WHEN irk <= 10
                                  THEN (power(2, rel) - 1) / log2(irk + 1)
                             END) > 0
                    THEN round(sum(CASE WHEN rk <= 10
                                        THEN (power(2, rel) - 1)
                                             / log2(rk + 1) END)
                               / sum(CASE WHEN irk <= 10
                                          THEN (power(2, rel) - 1)
                                               / log2(irk + 1) END),
                               6)
               END AS ndcg10,
               floor((CAST(1 AS DOUBLE) / min(CASE WHEN rel > 0 THEN rk END))
                     * 1e6 + 0.5) / 1e6 AS mrr
        FROM ranked GROUP BY 1
    """
    sqls["q272_holt_linear"] = """
        WITH RECURSIVE d AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   CAST(count(*) AS DOUBLE) AS y
            FROM events GROUP BY 1, 2
        ), s AS (
            SELECT event_type, y,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY day) AS rn
            FROM d
        ), rec AS (
            SELECT event_type, 1 AS rn, y AS l, CAST(0.0 AS DOUBLE) AS b
            FROM s WHERE rn = 1
            UNION ALL
            SELECT s.event_type, s.rn,
                   0.5 * s.y + 0.5 * (rec.l + rec.b) AS l,
                   0.5 * ((0.5 * s.y + 0.5 * (rec.l + rec.b)) - rec.l)
                   + 0.5 * rec.b AS b
            FROM rec JOIN s ON s.event_type = rec.event_type
                           AND s.rn = rec.rn + 1
        ), mx AS (
            SELECT event_type, CAST(max(rn) AS BIGINT) AS n FROM s GROUP BY 1
        )
        SELECT rec.event_type, mx.n AS n_days,
               round(rec.l, 4) AS level, round(rec.b, 4) AS trend,
               round(rec.l + rec.b, 4) AS forecast
        FROM rec JOIN mx ON mx.event_type = rec.event_type
                        AND rec.rn = mx.n
    """
    sqls["q273_ann_knn_eval"] = """
        WITH test AS (
            SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 5 = 0
        ), train AS (
            SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 5 <> 0
        ), sims AS (
            SELECT t.vec_id AS query_id, r.vec_id AS neighbor_id, r.label,
                   list_cosine_similarity(t.embedding, r.embedding) AS sim
            FROM test t, train r
        ), nn AS (
            SELECT query_id, label,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id) AS rk
            FROM sims
        ), votes AS (
            SELECT query_id, label, count(*) AS v
            FROM nn WHERE rk <= 5 GROUP BY 1, 2
        ), pred AS (
            SELECT query_id, label AS pred FROM (
                SELECT query_id, label,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY v DESC, label) AS r
                FROM votes
            ) WHERE r = 1
        )
        SELECT t.label AS true_label, count(*) AS n_test,
               count(*) FILTER (p.pred = t.label) AS n_correct,
               floor((CAST(count(*) FILTER (p.pred = t.label) AS DOUBLE)
                      / count(*)) * 1e4 + 0.5) / 1e4 AS accuracy
        FROM test t JOIN pred p ON p.query_id = t.vec_id
        GROUP BY 1
    """
    sqls["q274_cdc_chunking"] = """
        WITH d AS (
            SELECT doc_id, text, CAST(len(text) AS INT) AS l FROM documents
        ), pos AS (
            SELECT doc_id, l, text, unnest(range(8, l + 1)) AS i FROM d
        ), h AS (
            SELECT doc_id, CAST(i AS INT) AS i
            FROM pos
            WHERE CAST('0x' || substring(
                      md5(substring(text, CAST(i - 7 AS INT), 8)), 1, 8)
                  AS BIGINT) % 64 = 0
        ), b AS (
            SELECT doc_id, list_sort(list(i)) AS bs FROM h GROUP BY 1
        ), j AS (
            SELECT d.doc_id, d.l,
                   coalesce(b.bs, CAST([] AS INT[])) AS bs
            FROM d LEFT JOIN b USING (doc_id)
        ), ext AS (
            SELECT doc_id, l, bs,
                   list_concat(list_concat([CAST(0 AS INT)], bs),
                               [l]) AS e
            FROM j
        )
        SELECT doc_id,
               len(bs) AS n_boundaries,
               len(bs) + 1 AS n_chunks,
               floor((CAST(l AS DOUBLE) / (len(bs) + 1)) * 1e4 + 0.5) / 1e4
                   AS avg_chunk_len,
               list_aggregate(
                   list_transform(range(1, len(e)),
                                  k -> e[CAST(k + 1 AS INT)]
                                       - e[CAST(k AS INT)]),
                   'max') AS max_chunk_len
        FROM ext WHERE doc_id < 100
    """
    sqls["q275_bloom_semijoin_audit"] = """
        WITH small AS (
            SELECT s_suppkey AS k FROM supplier WHERE s_acctbal > 9000
        ), js AS (
            SELECT CAST(unnest(range(0, 3)) AS INT) AS j
        ), bloom AS (
            SELECT DISTINCT
                   CAST('0x' || substring(md5(k || '-' || j), 1, 8)
                        AS BIGINT) % 1024 AS pos
            FROM small, js
        ), probe AS (
            SELECT DISTINCT l_suppkey AS k FROM lineitem
        ), probed AS (
            SELECT p.k,
                   count(*) FILTER (b.pos IS NOT NULL) = 3 AS bloom_pass
            FROM (SELECT k,
                         CAST('0x' || substring(md5(k || '-' || j), 1, 8)
                              AS BIGINT) % 1024 AS pos
                  FROM probe, js) p
            LEFT JOIN bloom b ON b.pos = p.pos
            GROUP BY 1
        ), audit AS (
            SELECT bloom_pass,
                   EXISTS (SELECT 1 FROM small s WHERE s.k = probed.k)
                       AS is_member
            FROM probed
        )
        SELECT count(*) AS n_probe_keys,
               count(*) FILTER (is_member) AS n_members,
               count(*) FILTER (bloom_pass) AS n_bloom_pass,
               count(*) FILTER (bloom_pass AND NOT is_member) AS n_false_pos,
               floor((CAST(count(*) FILTER (bloom_pass AND NOT is_member)
                           AS DOUBLE)
                      / (count(*) - count(*) FILTER (is_member)))
                     * 1e6 + 0.5) / 1e6 AS fp_rate
        FROM audit
    """
    sqls["q301_dataset_card"] = r"""
        WITH tok AS (
            SELECT lang, doc_id,
                   unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
            FROM documents
        ), tok2 AS (
            SELECT lang, doc_id, w FROM tok WHERE w <> ''
        ), per_doc AS (
            SELECT lang, doc_id, count(*) AS nt, sum(len(w)) AS chars
            FROM tok2 GROUP BY 1, 2
        ), ds AS (
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(nt) AS BIGINT) AS total_tokens,
                   round(quantile_cont(nt, 0.5), 1) AS median_tokens,
                   floor((CAST(sum(chars) AS DOUBLE) / sum(nt)) * 1e4 + 0.5) / 1e4
                   AS avg_token_len
            FROM per_doc GROUP BY 1
        ), vocab AS (
            SELECT lang, count(*) AS vocab_size
            FROM (SELECT DISTINCT lang, w FROM tok2) GROUP BY 1
        ), dups AS (
            SELECT lang,
                   CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
                       AS n_exact_dup_docs
            FROM (SELECT lang, sha256(text) AS h, count(*) AS c
                  FROM documents GROUP BY 1, 2)
            GROUP BY 1
        )
        SELECT ds.lang, n_docs, n_exact_dup_docs, total_tokens,
               median_tokens, vocab_size, avg_token_len
        FROM ds JOIN vocab USING (lang) JOIN dups USING (lang)
    """
    sqls["q302_hard_negative_mining"] = """
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qv, label AS ql
            FROM embeddings WHERE vec_id < 50
        ), c AS (
            SELECT vec_id AS neighbor_id, embedding AS cv,
                   label AS neighbor_label
            FROM embeddings
        ), s AS (
            -- widen to DOUBLE[] first: on FLOAT[] DuckDB accumulates the dot
            -- product in float32, which drifts past the round-6 tolerance
            SELECT query_id, neighbor_id, neighbor_label,
                   list_cosine_similarity(CAST(qv AS DOUBLE[]),
                                           CAST(cv AS DOUBLE[])) AS sim
            FROM q JOIN c ON ql <> neighbor_label
        ), r AS (
            SELECT query_id, neighbor_id, neighbor_label, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id) AS rank
            FROM s
        )
        SELECT query_id, neighbor_id, neighbor_label,
               round(sim, 6) AS cosine_sim, rank
        FROM r WHERE rank <= 3
    """
    sqls["q303_dedup_method_overlap"] = f"""
        WITH mh_full AS ({sqls["q23_minhash_lsh_pairs"]}),
        sh_full AS ({sqls["q37_simhash_neardup"]}),
        ex AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM documents a JOIN documents b
              ON sha256(a.text) = sha256(b.text) AND a.doc_id < b.doc_id
        ), mh AS (SELECT DISTINCT id_a, id_b FROM mh_full),
        sh AS (SELECT DISTINCT id_a, id_b FROM sh_full),
        exd AS (SELECT DISTINCT id_a, id_b FROM ex),
        allp AS (
            SELECT id_a, id_b FROM exd
            UNION SELECT id_a, id_b FROM mh
            UNION SELECT id_a, id_b FROM sh
        ), masked AS (
            SELECT (CASE WHEN e.id_a IS NOT NULL THEN 4 ELSE 0 END
                    + CASE WHEN m.id_a IS NOT NULL THEN 2 ELSE 0 END
                    + CASE WHEN s.id_a IS NOT NULL THEN 1 ELSE 0 END)
                       AS method_mask
            FROM allp p
            LEFT JOIN exd e ON e.id_a = p.id_a AND e.id_b = p.id_b
            LEFT JOIN mh m ON m.id_a = p.id_a AND m.id_b = p.id_b
            LEFT JOIN sh s ON s.id_a = p.id_a AND s.id_b = p.id_b
        )
        SELECT method_mask, count(*) AS n_pairs FROM masked GROUP BY 1
    """
    sqls["q304_seasonal_adjusted_anomalies"] = """
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   CAST(count(*) AS DOUBLE) AS v
            FROM events GROUP BY 1, 2
        ), d2 AS (
            SELECT event_type, v, isodow(day) - 1 AS dow FROM daily
        ), idx AS (
            SELECT a.event_type, a.dow, a.dmu / b.mu AS idx
            FROM (SELECT event_type, dow, avg(v) AS dmu
                  FROM d2 GROUP BY 1, 2) a
            JOIN (SELECT event_type, avg(v) AS mu
                  FROM d2 GROUP BY 1) b USING (event_type)
        ), adj AS (
            SELECT d2.event_type, d2.v, d2.v / idx.idx AS adjv
            FROM d2 JOIN idx ON idx.event_type = d2.event_type
                            AND idx.dow = d2.dow
        ), m AS (
            SELECT event_type, avg(v) AS rm, stddev_pop(v) AS rs,
                   avg(adjv) AS am, stddev_pop(adjv) AS asd
            FROM adj GROUP BY 1
        ), f AS (
            SELECT adj.event_type,
                   abs((v - rm) / rs) >= 2 AS fr,
                   abs((adjv - am) / asd) >= 2 AS fa
            FROM adj JOIN m USING (event_type)
        )
        SELECT event_type, count(*) AS n_days,
               count(*) FILTER (fr) AS n_raw_anomalies,
               count(*) FILTER (fa) AS n_adjusted_anomalies,
               count(*) FILTER (fr <> fa) AS n_flips
        FROM f GROUP BY 1
    """
    sqls["q305_decile_migration"] = """
        WITH per_user AS (
            SELECT user_id,
                   sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                            THEN value END) AS x,
                   sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                            THEN value END) AS y
            FROM events GROUP BY 1
        ), pu AS (
            SELECT * FROM per_user WHERE x IS NOT NULL AND y IS NOT NULL
        ), th AS (
            SELECT quantile_cont(x, 0.2) AS x1, quantile_cont(x, 0.4) AS x2,
                   quantile_cont(x, 0.6) AS x3, quantile_cont(x, 0.8) AS x4,
                   quantile_cont(y, 0.2) AS y1, quantile_cont(y, 0.4) AS y2,
                   quantile_cont(y, 0.6) AS y3, quantile_cont(y, 0.8) AS y4
            FROM pu
        ), scored AS (
            SELECT 1 + CASE WHEN x > x1 THEN 1 ELSE 0 END
                     + CASE WHEN x > x2 THEN 1 ELSE 0 END
                     + CASE WHEN x > x3 THEN 1 ELSE 0 END
                     + CASE WHEN x > x4 THEN 1 ELSE 0 END AS pre_quintile,
                   1 + CASE WHEN y > y1 THEN 1 ELSE 0 END
                     + CASE WHEN y > y2 THEN 1 ELSE 0 END
                     + CASE WHEN y > y3 THEN 1 ELSE 0 END
                     + CASE WHEN y > y4 THEN 1 ELSE 0 END AS post_quintile
            FROM pu, th
        )
        SELECT pre_quintile, post_quintile, count(*) AS n_users
        FROM scored GROUP BY 1, 2
    """
    sqls["q306_cuped_adjustment"] = """
        WITH per_user AS (
            SELECT user_id,
                   sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                            THEN value END) AS x,
                   sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                            THEN value END) AS y
            FROM events GROUP BY 1
        ), pu AS (
            SELECT * FROM per_user WHERE x IS NOT NULL AND y IS NOT NULL
        ), g AS (
            SELECT CASE WHEN var_pop(x) > 0
                        THEN covar_pop(y, x) / var_pop(x) END AS theta,
                   avg(x) AS xbar
            FROM pu
        ), adj AS (
            SELECT user_id % 2 AS arm, y,
                   y - theta * (x - xbar) AS yadj, theta
            FROM pu, g
        )
        SELECT arm, count(*) AS n_users,
               floor(CAST(sum(CAST(round(y * 100) AS BIGINT)) AS DOUBLE)
                     * 1e6 / (count(*) * 100) + 0.5) / 1e6 AS mean_y,
               round(avg(yadj), 6) AS mean_y_cuped,
               round(CASE WHEN var_pop(y) > 0
                          THEN 1 - var_pop(yadj) / var_pop(y)
                     END, 6) AS var_reduction,
               round(max(theta), 6) AS theta
        FROM adj GROUP BY 1
    """
    sqls["q307_ipw_treatment_effect"] = """
        WITH per_user AS (
            SELECT user_id,
                   sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                            THEN value END) AS x,
                   sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                            THEN value END) AS y
            FROM events GROUP BY 1
        ), pu AS (
            SELECT * FROM per_user WHERE x IS NOT NULL AND y IS NOT NULL
        ), cuts AS (
            SELECT quantile_cont(x, [0.2, 0.4, 0.6, 0.8]) AS c FROM pu
        ), strat AS (
            SELECT CAST(user_id % 2 AS DOUBLE) AS t, y,
                   (CASE WHEN x > c[1] THEN 1 ELSE 0 END
                    + CASE WHEN x > c[2] THEN 1 ELSE 0 END
                    + CASE WHEN x > c[3] THEN 1 ELSE 0 END
                    + CASE WHEN x > c[4] THEN 1 ELSE 0 END) AS stratum
            FROM pu, cuts
        ), prop AS (
            SELECT stratum, avg(t) AS p FROM strat GROUP BY 1
        )
        SELECT count(*) AS n_users,
               floor(CAST(sum(CASE WHEN t = 1
                                   THEN CAST(round(y * 100) AS BIGINT) END)
                          * count(CASE WHEN t = 0 THEN 1 END)
                          - sum(CASE WHEN t = 0
                                     THEN CAST(round(y * 100) AS BIGINT) END)
                          * count(CASE WHEN t = 1 THEN 1 END) AS DOUBLE)
                     * 1e6 / (100 * count(CASE WHEN t = 1 THEN 1 END)
                              * count(CASE WHEN t = 0 THEN 1 END)) + 0.5)
                   / 1e6 AS naive_diff,
               round(avg(CASE WHEN p > 0 AND p < 1
                              THEN t * y / p - (1 - t) * y / (1 - p)
                         END), 6) AS ipw_ate,
               round(min(p), 6) AS min_propensity,
               round(max(p), 6) AS max_propensity
        FROM strat JOIN prop USING (stratum)
    """
    sqls["q308_l_diversity_audit"] = """
        WITH cells AS (
            SELECT c_nationkey, floor(c_acctbal / 1000) AS bb,
                   c_mktsegment, count(*) AS n
            FROM customer GROUP BY 1, 2, 3
        ), groups AS (
            SELECT c_nationkey, bb, count(*) AS d,
                   CAST(sum(n) AS BIGINT) AS tot,
                   round(ln(sum(n)) - sum(n * ln(n)) / sum(n), 9) AS h
            FROM cells GROUP BY 1, 2
        ), ls AS (SELECT CAST(unnest([2, 3]) AS INT) AS l)
        SELECT l, count(*) AS n_groups,
               CAST(sum(CASE WHEN d < l THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_below_distinct_l,
               CAST(sum(CASE WHEN h < round(ln(CAST(l AS DOUBLE)), 9)
                            THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_below_entropy_l,
               CAST(sum(CASE WHEN d < l THEN tot ELSE 0 END) AS BIGINT)
                   AS n_rows_at_risk
        FROM groups, ls GROUP BY 1
    """
    sqls["q309_blocking_quality_audit"] = f"""
        WITH tok AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ), sh AS (
            SELECT doc_id, {_SHINGLES3} AS s FROM tok
        ), truth AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s)) * 1.0
                  / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
        ), keyed AS (
            SELECT doc_id,
                   CAST(n_chars // 100 AS VARCHAR) AS len_bucket,
                   ({_TOKS})[1] AS first_token
            FROM documents
        ), tot AS (
            SELECT count(*) AS n FROM documents
        ), strategies AS (
            SELECT 'len_bucket' AS strategy, len_bucket AS k, doc_id FROM keyed
            UNION ALL
            SELECT 'first_token', first_token, doc_id FROM keyed
        ), cand AS (
            SELECT strategy,
                   CAST(sum(n * (n - 1) / 2) AS BIGINT) AS n_candidate_pairs
            FROM (SELECT strategy, k, count(*) AS n
                  FROM strategies GROUP BY 1, 2)
            GROUP BY 1
        ), joined AS (
            SELECT k1.len_bucket AS la, k2.len_bucket AS lb,
                   k1.first_token AS fa, k2.first_token AS fb
            FROM truth t
            JOIN keyed k1 ON k1.doc_id = t.id_a
            JOIN keyed k2 ON k2.doc_id = t.id_b
        ), compl AS (
            SELECT 'len_bucket' AS strategy, count(*) AS n_true_pairs,
                   coalesce(floor(CAST(sum(CASE WHEN la = lb THEN 1
                                             ELSE 0 END) AS DOUBLE)
                                  * 1e6 / count(*) + 0.5) / 1e6, 0.0) AS pc
            FROM joined
            UNION ALL
            SELECT 'first_token', count(*),
                   coalesce(floor(CAST(sum(CASE WHEN fa = fb THEN 1
                                             ELSE 0 END) AS DOUBLE)
                                  * 1e6 / count(*) + 0.5) / 1e6, 0.0)
            FROM joined
        )
        SELECT c.strategy, c.n_candidate_pairs,
               floor(CAST(tot.n * (tot.n - 1) // 2 - c.n_candidate_pairs
                          AS DOUBLE)
                     * 1e6 / (tot.n * (tot.n - 1) // 2) + 0.5) / 1e6
                   AS reduction_ratio,
               p.n_true_pairs, p.pc AS pairs_completeness
        FROM cand c JOIN compl p ON p.strategy = c.strategy, tot
    """
    sqls["q310_bigram_backoff_logprob"] = f"""
        WITH tok AS (
            SELECT doc_id, lang,
                   list_filter({_TOKS}, t -> t != '') AS toks
            FROM documents
        ), uni AS (
            SELECT w1, count(*) AS c1
            FROM (SELECT unnest(toks) AS w1 FROM tok) GROUP BY 1
        ), tot AS (
            SELECT CAST(sum(len(toks)) AS DOUBLE) AS n FROM tok
        ), bg AS (
            SELECT lang,
                   unnest(list_transform(range(1, len(toks)),
                          i -> toks[i])) AS w1,
                   unnest(list_transform(range(1, len(toks)),
                          i -> toks[i+1])) AS w2
            FROM tok
        ), big AS (
            SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2
        ), scored AS (
            SELECT bg.lang,
                   CASE WHEN big.c2 IS NOT NULL
                        THEN ln(big.c2 * 1.0 / u1.c1)
                        ELSE ln(0.4) + ln(u2.c1 / tot.n) END AS lp,
                   CASE WHEN big.c2 IS NULL THEN 1 ELSE 0 END
                       AS backed_off
            FROM bg
            LEFT JOIN big ON big.w1 = bg.w1 AND big.w2 = bg.w2
            JOIN uni u1 ON u1.w1 = bg.w1
            JOIN uni u2 ON u2.w1 = bg.w2
            CROSS JOIN tot
        )
        SELECT lang, count(*) AS n_bigrams,
               round(avg(lp), 6) AS avg_logprob,
               floor(CAST(sum(backed_off) AS DOUBLE) * 1e6 / count(*)
                     + 0.5) / 1e6 AS backoff_rate
        FROM scored GROUP BY 1
    """
    sqls["q311_ann_hubness_audit"] = """
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE vec_id < 2000
        ), scored AS (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   round(list_cosine_similarity(q.v, e.v), 9) AS sim
            FROM e q, e WHERE e.vec_id != q.vec_id
        ), topk AS (
            SELECT neighbor_id
            FROM (SELECT query_id, neighbor_id,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY sim DESC, neighbor_id)
                             AS r
                  FROM scored)
            WHERE r <= 10
        ), indeg AS (
            SELECT e.vec_id, coalesce(k.c, 0) AS k_occ
            FROM e LEFT JOIN (SELECT neighbor_id, count(*) AS c
                              FROM topk GROUP BY 1) k
              ON k.neighbor_id = e.vec_id
        )
        SELECT CASE WHEN k_occ = 0 THEN '0_antihub'
                    WHEN k_occ < 5 THEN '1-4'
                    WHEN k_occ < 10 THEN '5-9'
                    WHEN k_occ < 20 THEN '10-19'
                    ELSE '20+_hub' END AS k_occurrence_bucket,
               count(*) AS n_vectors,
               CAST(max(k_occ) AS BIGINT) AS max_k_occurrence
        FROM indeg GROUP BY 1
    """
    sqls["q312_attribution_model_compare"] = """
        WITH ev AS (
            SELECT user_id, event_type, epoch(ts) AS t,
                   CAST(round(value * 100, 0) AS BIGINT) AS cents
            FROM events
        ), touched AS (
            SELECT user_id, event_type, cents,
                   list_sort(list({'t': t, 'et': event_type})
                             FILTER (WHERE event_type <> 'purchase')
                             OVER (PARTITION BY user_id ORDER BY t
                                   RANGE BETWEEN 3600 PRECEDING
                                         AND CURRENT ROW)) AS touches
            FROM ev
        ), pur AS (
            SELECT cents,
                   coalesce(touches[1].et, 'direct') AS first_ch,
                   coalesce(touches[len(touches)].et, 'direct') AS last_ch,
                   CASE WHEN touches IS NULL OR len(touches) = 0
                        THEN ['direct']
                        ELSE list_transform(touches, s -> s.et) END AS chs
            FROM touched WHERE event_type = 'purchase'
        ), firsts AS (
            SELECT first_ch AS channel, sum(cents) AS fc FROM pur GROUP BY 1
        ), lasts AS (
            SELECT last_ch AS channel, sum(cents) AS lc FROM pur GROUP BY 1
        ), lin AS (
            SELECT ch AS channel,
                   sum(cents // len
                       + CASE WHEN i <= cents % len THEN 1 ELSE 0 END) AS nc
            FROM (SELECT cents, len(chs) AS len, unnest(chs) AS ch,
                         generate_subscripts(chs, 1) AS i
                  FROM pur)
            GROUP BY 1
        )
        SELECT n.channel,
               round(coalesce(f.fc, 0) / 100.0, 2) AS first_touch_value,
               round(coalesce(l.lc, 0) / 100.0, 2) AS last_touch_value,
               round(n.nc / 100.0, 2) AS linear_value
        FROM lin n
        LEFT JOIN firsts f ON f.channel = n.channel
        LEFT JOIN lasts l ON l.channel = n.channel
    """
    # MMR greedy unrolled: sK picks rank K's candidate given sel(K-1);
    # each step's argmax ties break on id (matches the driver-side greedy,
    # which scans candidates in ascending id with strict >)
    sqls["q313_mmr_diversified_topk"] = """
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), qv AS (SELECT v FROM e WHERE vec_id = 0),
        cand AS (
            SELECT e.vec_id AS id,
                   round(list_cosine_similarity(e.v, qv.v), 9) AS simq, e.v
            FROM e, qv WHERE e.vec_id != 0
            ORDER BY simq DESC, id LIMIT 12
        ), ps AS (
            SELECT a.id AS ia, b.id AS ib,
                   round(list_cosine_similarity(a.v, b.v), 9) AS s
            FROM cand a, cand b WHERE a.id != b.id
        ), s1 AS (
            SELECT id, 0.7 * simq AS score FROM cand
            ORDER BY simq DESC, id LIMIT 1
        ), s2 AS (
            SELECT c.id, 0.7 * c.simq - 0.3 * max(ps.s) AS score
            FROM cand c JOIN ps ON ps.ia = c.id
            WHERE ps.ib IN (SELECT id FROM s1)
              AND c.id NOT IN (SELECT id FROM s1)
            GROUP BY c.id, c.simq ORDER BY score DESC, c.id LIMIT 1
        ), sel2 AS (SELECT id FROM s1 UNION ALL SELECT id FROM s2),
        s3 AS (
            SELECT c.id, 0.7 * c.simq - 0.3 * max(ps.s) AS score
            FROM cand c JOIN ps ON ps.ia = c.id
            WHERE ps.ib IN (SELECT id FROM sel2)
              AND c.id NOT IN (SELECT id FROM sel2)
            GROUP BY c.id, c.simq ORDER BY score DESC, c.id LIMIT 1
        ), sel3 AS (SELECT id FROM sel2 UNION ALL SELECT id FROM s3),
        s4 AS (
            SELECT c.id, 0.7 * c.simq - 0.3 * max(ps.s) AS score
            FROM cand c JOIN ps ON ps.ia = c.id
            WHERE ps.ib IN (SELECT id FROM sel3)
              AND c.id NOT IN (SELECT id FROM sel3)
            GROUP BY c.id, c.simq ORDER BY score DESC, c.id LIMIT 1
        ), sel4 AS (SELECT id FROM sel3 UNION ALL SELECT id FROM s4),
        s5 AS (
            SELECT c.id, 0.7 * c.simq - 0.3 * max(ps.s) AS score
            FROM cand c JOIN ps ON ps.ia = c.id
            WHERE ps.ib IN (SELECT id FROM sel4)
              AND c.id NOT IN (SELECT id FROM sel4)
            GROUP BY c.id, c.simq ORDER BY score DESC, c.id LIMIT 1
        )
        SELECT CAST(1 AS INT) AS rank, id AS neighbor_id,
               round(score, 6) AS mmr_score FROM s1
        UNION ALL SELECT 2, id, round(score, 6) FROM s2
        UNION ALL SELECT 3, id, round(score, 6) FROM s3
        UNION ALL SELECT 4, id, round(score, 6) FROM s4
        UNION ALL SELECT 5, id, round(score, 6) FROM s5
    """
    sqls["q314_obf_sequential_audit"] = """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, user_id % 2 AS arm,
                   count(*) AS n, sum(value) AS s, sum(value * value) AS s2
            FROM events GROUP BY 1, 2
        ), cum AS (
            SELECT day, arm,
                   sum(n) OVER w AS cn, sum(s) OVER w AS cs,
                   sum(s2) OVER w AS cs2
            FROM daily
            WINDOW w AS (PARTITION BY arm ORDER BY day
                         ROWS UNBOUNDED PRECEDING)
        ), a AS (
            SELECT day, cn AS na, cs / cn AS ma,
                   CASE WHEN cn > 1
                        THEN (cs2 - cs * cs / cn) / (cn - 1) END AS va
            FROM cum WHERE arm = 0
        ), b AS (
            SELECT day, cn AS nb, cs / cn AS mb,
                   CASE WHEN cn > 1
                        THEN (cs2 - cs * cs / cn) / (cn - 1) END AS vb
            FROM cum WHERE arm = 1
        ), tot AS (
            SELECT (SELECT max(na) FROM a) + (SELECT max(nb) FROM b) AS t
        ), j AS (
            SELECT a.day, na, ma, va, nb, mb, vb,
                   sqrt(va / na + vb / nb) AS se
            FROM a JOIN b USING (day)
        )
        SELECT strftime(j.day, '%Y-%m-%d') AS day,
               floor(((na + nb) / CAST(t AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS info_frac,
               round(CASE WHEN se > 0 THEN (ma - mb) / se END, 6) AS z_stat,
               round(2.2414 / sqrt((na + nb) / CAST(t AS DOUBLE)), 6)
                   AS obf_bound,
               abs(CASE WHEN se > 0 THEN (ma - mb) / se END)
                   > 2.2414 / sqrt((na + nb) / CAST(t AS DOUBLE))
                   AS obf_crossed,
               abs(CASE WHEN se > 0 THEN (ma - mb) / se END) > 1.959964
                   AS naive_crossed
        FROM j, tot
    """
    sqls["q315_ecod_outliers"] = """
        WITH cnts AS (
            SELECT col_name, v, count(*) AS c
            FROM (
                SELECT 'l_quantity' AS col_name,
                       CAST(l_quantity AS DOUBLE) AS v FROM lineitem
                UNION ALL
                SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem
                UNION ALL
                SELECT 'l_tax', CAST(l_tax AS DOUBLE) FROM lineitem
            ) GROUP BY 1, 2
        ), cdf AS (
            SELECT col_name, v,
                   -ln(least(
                       sum(c) OVER wc * 1.0 / sum(c) OVER wt,
                       (sum(c) OVER wt - sum(c) OVER wc + c) * 1.0
                           / sum(c) OVER wt)) AS nll
            FROM cnts
            WINDOW wc AS (PARTITION BY col_name ORDER BY v
                          ROWS UNBOUNDED PRECEDING),
                   wt AS (PARTITION BY col_name)
        )
        SELECT l.l_orderkey, l.l_linenumber,
               round(q.nll + d.nll + t.nll, 6) AS ecod_score
        FROM lineitem l
        JOIN cdf q ON q.col_name = 'l_quantity'
                  AND q.v = CAST(l.l_quantity AS DOUBLE)
        JOIN cdf d ON d.col_name = 'l_discount'
                  AND d.v = CAST(l.l_discount AS DOUBLE)
        JOIN cdf t ON t.col_name = 'l_tax'
                  AND t.v = CAST(l.l_tax AS DOUBLE)
        ORDER BY ecod_score DESC, l.l_orderkey, l.l_linenumber
        LIMIT 10
    """
    sqls["q316_partial_topk_merge_audit"] = f"""
        WITH toks AS (
            SELECT shard, w FROM (
                SELECT doc_id % 8 AS shard,
                       unnest({_TOKS}) AS w
                FROM documents
            ) WHERE w != ''
        ), local AS (
            SELECT shard, w, count(*) AS lc FROM toks GROUP BY 1, 2
        ), survived AS (
            SELECT shard, w, lc FROM (
                SELECT shard, w, lc,
                       row_number() OVER (PARTITION BY shard
                                          ORDER BY lc DESC, w) AS r
                FROM local) WHERE r <= 20
        ), merged AS (
            SELECT w, sum(lc) AS mc FROM survived GROUP BY 1
            ORDER BY mc DESC, w LIMIT 20
        ), exact AS (
            SELECT w, count(*) AS ec FROM toks GROUP BY 1
            ORDER BY ec DESC, w LIMIT 20
        )
        SELECT count(*) AS n_exact,
               round(count(mc) / 20.0, 6) AS recall_at_20,
               CAST(max(CASE WHEN mc IS NOT NULL THEN ec - mc END) AS BIGINT)
                   AS max_undercount
        FROM exact LEFT JOIN merged USING (w)
    """
    _fd_sqls = []
    for _tbl, _lhs, _rhs in [
        ("orders", "o_orderkey", "o_orderstatus"),
        ("customer", "c_custkey", "c_mktsegment"),
        ("part", "p_name", "p_brand"),
        ("lineitem", "l_partkey", "l_suppkey"),
        ("lineitem", "l_orderkey", "l_returnflag"),
        ("events", "user_id", "event_type"),
    ]:
        _fd_sqls.append(f"""
            SELECT '{_tbl}.{_lhs}->{_rhs}' AS fd,
                   count(*) AS lhs_ndv,
                   CAST(sum(nd) AS BIGINT) AS pair_ndv,
                   sum(nd) = count(*) AS holds,
                   CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_violating_lhs
            FROM (SELECT {_lhs}, count(DISTINCT {_rhs}) AS nd
                  FROM {_tbl} GROUP BY 1)
        """)
    sqls["q317_fd_discovery_audit"] = " UNION ALL ".join(_fd_sqls)
    sqls["q318_quantile_normalization"] = """
        WITH centiles AS (
            SELECT source, n_chars,
                   ntile(100) OVER (PARTITION BY source
                                    ORDER BY n_chars, doc_id) AS centile
            FROM documents
        ), per_sc AS (
            SELECT source, centile, avg(n_chars) AS m
            FROM centiles GROUP BY 1, 2
        ), wref AS (
            SELECT centile, m,
                   avg(m) OVER (PARTITION BY centile) AS ref
            FROM per_sc
        )
        SELECT centile, round(max(ref), 6) AS ref_value,
               round(max(abs(m - ref)), 6) AS max_source_deviation
        FROM wref GROUP BY 1
    """
    sqls["q319_mann_whitney_by_type"] = """
        WITH hist AS (
            SELECT event_type, round(value, 1) AS v,
                   sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS na,
                   sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS nb
            FROM events GROUP BY 1, 2
        ), stepped AS (
            SELECT event_type, na, nb,
                   sum(nb) OVER (PARTITION BY event_type ORDER BY v
                                 ROWS UNBOUNDED PRECEDING) - nb AS cumb_less
            FROM hist
        )
        SELECT event_type,
               CAST(sum(na) AS BIGINT) AS n_a,
               CAST(sum(nb) AS BIGINT) AS n_b,
               sum(2 * na * cumb_less + na * nb) / 2.0 AS u_stat,
               floor((sum(2 * na * cumb_less + na * nb)
                      / CAST(sum(na) * sum(nb) AS DOUBLE) - 1.0)
                     * 1e6 + 0.5) / 1e6
                   AS rank_biserial
        FROM stepped GROUP BY 1
    """
    _bucket9 = " + ".join(
        f"CASE WHEN o_totalprice > c[{i}] THEN 1 ELSE 0 END"
        for i in range(1, 10)
    )
    sqls["q320_equi_depth_histogram_audit"] = f"""
        WITH cuts AS (
            SELECT quantile_cont(o_totalprice,
                [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS c
            FROM orders
        ), tot AS (SELECT count(*) AS n FROM orders),
        binned AS (
            SELECT o_totalprice, ({_bucket9}) AS bucket
            FROM orders, cuts
        )
        SELECT bucket, count(*) AS n_rows,
               CAST(n // 10 AS BIGINT) AS expected_rows,
               floor((count(*) / (n / 10.0)) * 1e6 + 0.5) / 1e6 AS depth_ratio,
               round(min(o_totalprice), 2) AS lo,
               round(max(o_totalprice), 2) AS hi
        FROM binned, tot
        GROUP BY bucket, n
    """
    sqls["q321_markov_next_event_accuracy"] = """
        WITH trans AS (
            SELECT event_type AS cur,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS nxt
            FROM events
        ), t2 AS (SELECT * FROM trans WHERE nxt IS NOT NULL),
        counts AS (SELECT cur, nxt, count(*) AS n FROM t2 GROUP BY 1, 2),
        pred AS (
            SELECT cur, nxt AS predicted_next FROM (
                SELECT cur, nxt,
                       row_number() OVER (PARTITION BY cur
                                          ORDER BY n DESC, nxt) AS r
                FROM counts) WHERE r = 1
        )
        SELECT t2.cur AS event_type, p.predicted_next,
               count(*) AS n_transitions,
               floor(CAST(sum(CASE WHEN t2.nxt = p.predicted_next
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     * 1e6 / count(*) + 0.5) / 1e6 AS accuracy
        FROM t2 JOIN pred p ON p.cur = t2.cur
        GROUP BY 1, 2
    """
    sqls["q322_ngram_novelty_rate"] = f"""
        WITH tok AS (
            SELECT doc_id, lang, {_TOKS} AS toks FROM documents
        ), sh AS (
            SELECT doc_id, lang, unnest({_SHINGLES3}) AS s FROM tok
        ), first AS (
            SELECT s, min(doc_id) AS fd FROM sh GROUP BY 1
        ), per_doc AS (
            SELECT sh.doc_id, sh.lang,
                   avg(CASE WHEN f.fd = sh.doc_id THEN 1.0 ELSE 0.0 END)
                       AS nov
            FROM sh JOIN first f ON f.s = sh.s
            GROUP BY 1, 2
        )
        SELECT lang, count(*) AS n_docs,
               round(avg(nov), 6) AS avg_novelty_rate,
               round(min(nov), 6) AS min_novelty_rate
        FROM per_doc GROUP BY 1
    """
    _SHINGLES5 = (
        "list_distinct(list_transform(range(1, greatest(len(toks)-5,0)+2), "
        "i -> array_to_string(toks[i:i+4], ' ')))"
    )
    sqls["q323_boilerplate_ngrams"] = f"""
        WITH tok AS (
            SELECT doc_id, source, {_TOKS} AS toks FROM documents
        ), sh AS (
            SELECT doc_id, source, unnest({_SHINGLES5}) AS g FROM tok
        ), df_tbl AS (
            SELECT source, g, count(DISTINCT doc_id) AS df
            FROM sh GROUP BY 1, 2
        ), per_src AS (
            SELECT source, count(*) AS nd FROM documents GROUP BY 1
        )
        SELECT source, g AS ngram,
               CAST(df AS BIGINT) AS doc_freq,
               floor((df / CAST(nd AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS df_share
        FROM (
            SELECT d.source, d.g, d.df, p.nd,
                   row_number() OVER (PARTITION BY d.source
                                      ORDER BY d.df DESC, d.g) AS r
            FROM df_tbl d JOIN per_src p ON p.source = d.source
            WHERE d.df > 0.05 * p.nd
        ) WHERE r <= 10
    """
    sqls["q324_weighted_jaccard_pairs"] = f"""
        WITH tok AS (
            SELECT doc_id, lang, {_TOKS} AS toks FROM documents
        ), toks AS (
            SELECT doc_id, lang,
                   unnest(list_transform(range(1, len(toks) - 3 + 2),
                          i -> array_to_string(toks[i:i+2], ' '))) AS w
            FROM tok
        ), counts AS (
            SELECT doc_id, lang, w, count(*) AS c
            FROM toks GROUP BY 1, 2, 3
        ), sides AS (
            SELECT doc_id, lang, w, c,
                   sum(c) OVER (PARTITION BY doc_id) AS tot
            FROM counts
        ), inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   a.tot AS ta, b.tot AS tb,
                   sum(least(a.c, b.c)) AS smin
            FROM sides a JOIN sides b
              ON a.w = b.w AND a.lang = b.lang AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4
        )
        SELECT id_a, id_b,
               round(smin / CAST(ta + tb - smin AS DOUBLE), 6)
                   AS weighted_jaccard
        FROM inter
        WHERE smin / CAST(ta + tb - smin AS DOUBLE) >= 0.3
    """
    sqls["q325_hodges_lehmann_shift"] = """
        WITH grid AS (
            SELECT event_type, user_id % 2 AS arm, floor(value) AS v,
                   count(*) AS n
            FROM events GROUP BY 1, 2, 3
        ), ga AS (
            SELECT event_type, v AS va, n AS na FROM grid WHERE arm = 0
        ), gb AS (
            SELECT event_type, v AS vb, n AS nb FROM grid WHERE arm = 1
        ), diffs AS (
            SELECT ga.event_type, vb - va AS d, sum(na * nb) AS w
            FROM ga JOIN gb USING (event_type) GROUP BY 1, 2
        ), walked AS (
            SELECT event_type, d,
                   sum(w) OVER (PARTITION BY event_type ORDER BY d
                                ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(w) OVER (PARTITION BY event_type) AS tot
            FROM diffs
        )
        SELECT event_type, CAST(min(d) AS BIGINT) AS hl_shift,
               CAST(max(tot) AS BIGINT) AS n_pairs
        FROM walked WHERE 2 * cum >= tot GROUP BY 1
    """
    sqls["q326_meta_analysis"] = """
        WITH m AS (
            SELECT event_type, user_id % 2 AS arm, count(*) AS n,
                   avg(value) AS mean, var_samp(value) AS var
            FROM events GROUP BY 1, 2
        ), a AS (
            SELECT event_type, mean AS m1, var / n AS se1 FROM m WHERE arm = 1
        ), b AS (
            SELECT event_type, mean AS m0, var / n AS se0 FROM m WHERE arm = 0
        ), studies AS (
            SELECT a.event_type, m1 - m0 AS eff, 1.0 / (se1 + se0) AS w
            FROM a JOIN b USING (event_type)
        ), pooled AS (
            SELECT sum(w * eff) / sum(w) AS pool, sum(w) AS sw,
                   count(*) AS k
            FROM studies
        ), qs AS (
            SELECT CAST(max(k) AS BIGINT) AS n_studies,
                   round(max(pool), 6) AS pooled_effect,
                   round(sqrt(1.0 / max(sw)), 6) AS pooled_se,
                   round(sum(w * (eff - pool) * (eff - pool)), 6) AS q_stat
            FROM studies, pooled
        )
        SELECT n_studies, pooled_effect, pooled_se, q_stat,
               round(greatest(0.0, (q_stat - (n_studies - 1)) / q_stat), 6)
                   AS i_squared
        FROM qs
    """
    sqls["q327_mutual_knn_rate"] = """
        WITH e AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE vec_id < 1000
        ), scored AS (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   round(list_cosine_similarity(q.v, e.v), 9) AS sim
            FROM e q, e WHERE e.vec_id != q.vec_id
        ), topk AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, neighbor_id)
                           AS r
                FROM scored) WHERE r <= 10
        ), marked AS (
            SELECT t.query_id,
                   CASE WHEN rv.query_id IS NOT NULL THEN 1 ELSE 0 END
                       AS mutual
            FROM topk t LEFT JOIN topk rv
              ON rv.query_id = t.neighbor_id
             AND rv.neighbor_id = t.query_id
        ), per_node AS (
            SELECT query_id, CAST(sum(mutual) AS BIGINT) AS nmut
            FROM marked GROUP BY 1
        )
        SELECT e.label, count(*) AS n_vectors,
               floor(CAST(sum(nmut) AS DOUBLE) * 1e6 / (count(*) * 10)
                     + 0.5) / 1e6 AS avg_mutual_rate,
               CAST(min(nmut) AS DOUBLE) / 10 AS min_mutual_rate
        FROM per_node p JOIN e ON e.vec_id = p.query_id
        GROUP BY 1
    """
    sqls["q328_countmin_audit"] = f"""
        WITH toks AS (
            SELECT w FROM (SELECT unnest({_TOKS}) AS w FROM documents)
            WHERE w != ''
        ), js AS (SELECT unnest([0, 1, 2, 3]) AS j),
        counters AS (
            SELECT j,
                   CAST('0x' || substring(md5(CAST(j AS VARCHAR) || '|' || w),
                                          1, 8) AS BIGINT) % 256 AS b,
                   count(*) AS c
            FROM toks, js GROUP BY 1, 2
        ), exact AS (
            SELECT w, count(*) AS exact_count FROM toks GROUP BY 1
            ORDER BY exact_count DESC, w LIMIT 15
        ), probes AS (
            SELECT e.w, e.exact_count, js.j,
                   CAST('0x' || substring(md5(CAST(js.j AS VARCHAR) || '|'
                                              || e.w),
                                          1, 8) AS BIGINT) % 256 AS b
            FROM exact e, js
        )
        SELECT p.w AS token, p.exact_count,
               CAST(min(c.c) AS BIGINT) AS cms_estimate,
               CAST(min(c.c) - p.exact_count AS BIGINT) AS overcount
        FROM probes p JOIN counters c ON c.j = p.j AND c.b = p.b
        GROUP BY 1, 2
    """
    sqls["q329_overdispersion_index"] = """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
            FROM events GROUP BY 1, 2
        ), m AS (
            SELECT event_type, count(*) AS nd,
                   CAST(sum(n) AS BIGINT) AS s1,
                   CAST(sum(n * n) AS BIGINT) AS s2
            FROM daily GROUP BY 1
        ), v AS (
            -- exact-moment variance: the identical IEEE sequence the
            -- Spark side evaluates over exact integer moments
            SELECT event_type, nd, s1,
                   (CAST(nd AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                       / (CAST(nd AS DOUBLE) * (nd - 1)) AS var
            FROM m
        )
        SELECT event_type, nd AS n_days,
               floor(CAST(s1 AS DOUBLE) * 1e6 / nd + 0.5) / 1e6 AS mean_daily,
               floor(var * 1e6 + 0.5) / 1e6 AS var_daily,
               floor(var * CAST(nd AS DOUBLE) / s1 * 1e6 + 0.5) / 1e6
                   AS dispersion_index,
               var * CAST(nd AS DOUBLE) / s1 > 1.5 AS overdispersed
        FROM v
    """
    sqls["q330_dedup_threshold_pr_curve"] = f"""
        WITH tok AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ), shg AS (
            SELECT doc_id, {_SHINGLES3} AS sh FROM tok
        ), sig AS (
            SELECT doc_id, {_sig_exprs(8)} AS sg
            FROM (SELECT doc_id, {_SHINGLE_HASH} AS hs FROM shg)
        ), banded AS (
            SELECT doc_id,
                   CAST(b AS VARCHAR) || '|' ||
                   array_to_string(sg[b*2+1:b*2+2], '|') AS band
            FROM sig, (SELECT unnest(range(0, 4)) AS b)
        ), cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.doc_id < b.doc_id
        ), scored AS (
            SELECT len(list_filter(range(1, 9),
                                   i -> sx.sg[CAST(i AS INT)]
                                        = sy.sg[CAST(i AS INT)])) / 8.0
                       AS est,
                   len(list_intersect(x.sh, y.sh)) * 1.0
                       / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.7
                       AS truth
            FROM cand c
            JOIN shg x ON x.doc_id = c.id_a
            JOIN shg y ON y.doc_id = c.id_b
            JOIN sig sx ON sx.doc_id = c.id_a
            JOIN sig sy ON sy.doc_id = c.id_b
        ), swept AS (
            SELECT est, truth, t.threshold
            FROM scored,
                 (SELECT unnest(CAST([0.5, 0.625, 0.75, 0.875] AS DOUBLE[]))
                      AS threshold) t
        ), agg AS (
            SELECT threshold,
                   CAST(sum(CASE WHEN est >= threshold THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_predicted,
                   CAST(sum(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_true,
                   sum(CASE WHEN truth AND est >= threshold
                            THEN 1 ELSE 0 END) AS tp
            FROM swept GROUP BY 1
        )
        , m AS (
            SELECT threshold, n_predicted, n_true,
                   CASE WHEN n_predicted > 0
                        THEN CAST(tp AS DOUBLE) / n_predicted
                        ELSE 0.0 END AS prec,
                   CASE WHEN n_true > 0
                        THEN CAST(tp AS DOUBLE) / n_true
                        ELSE 0.0 END AS rec
            FROM agg
        )
        SELECT threshold, n_predicted, n_true,
               floor(prec * 1e6 + 0.5) / 1e6 AS precision,
               floor(rec * 1e6 + 0.5) / 1e6 AS recall,
               floor((CASE WHEN prec + rec > 0
                           THEN 2 * prec * rec / (prec + rec)
                           ELSE 0.0 END) * 1e6 + 0.5) / 1e6 AS f1
        FROM m
    """
    sqls["q331_item_item_cf"] = """
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        ni AS (SELECT l_partkey, count(*) AS n FROM li GROUP BY 1),
        co AS (
            SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
                   count(*) AS c
            FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                               AND a.l_partkey != b.l_partkey
            GROUP BY 1, 2
        ), top_items AS (
            SELECT l_partkey AS item_a, n AS na FROM ni
            ORDER BY n DESC, l_partkey LIMIT 20
        ), scored AS (
            SELECT c.item_a, c.item_b,
                   round(c.c / sqrt(t.na * nb.n), 9) AS sim
            FROM co c
            JOIN top_items t ON t.item_a = c.item_a
            JOIN ni nb ON nb.l_partkey = c.item_b
        )
        SELECT item_a, item_b, round(sim, 6) AS cosine_sim,
               CAST(r AS INT) AS rank
        FROM (SELECT item_a, item_b, sim,
                     row_number() OVER (PARTITION BY item_a
                                        ORDER BY sim DESC, item_b) AS r
              FROM scored) WHERE r <= 3
    """
    sqls["q332_t_closeness_audit"] = """
        WITH cells AS (
            SELECT c_nationkey, floor(c_acctbal / 1000) AS bb,
                   c_mktsegment, count(*) AS n
            FROM customer GROUP BY 1, 2, 3
        ), gseg AS (
            SELECT c_mktsegment, count(*) AS gn FROM customer GROUP BY 1
        ), gtot AS (SELECT count(*) AS gt FROM customer),
        classes AS (
            SELECT c_nationkey, bb, CAST(sum(n) AS BIGINT) AS ct
            FROM cells GROUP BY 1, 2
        ), grid AS (
            SELECT cl.c_nationkey, cl.bb, cl.ct, g.c_mktsegment, g.gn,
                   gtot.gt
            FROM classes cl, gseg g, gtot
        ), tvd AS (
            -- left-fold the segment-sorted terms: the identical IEEE
            -- sequence the Spark side evaluates; CAST AS DOUBLE division
            -- (decimal-literal quotients are not bit-identical to double)
            SELECT c_nationkey, bb, max(ct) AS ct,
                   floor(0.5 * list_reduce(
                             list(abs(CAST(coalesce(n, 0) AS DOUBLE) / ct
                                      - CAST(gn AS DOUBLE) / gt)
                                  ORDER BY c_mktsegment),
                             (a, x) -> a + x) * 1e9 + 0.5) / 1e9 AS tvd
            FROM grid LEFT JOIN cells USING (c_nationkey, bb, c_mktsegment)
            GROUP BY 1, 2
        )
        SELECT t, count(*) AS n_groups,
               CAST(sum(CASE WHEN tvd > t THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_above_t,
               CAST(sum(CASE WHEN tvd > t THEN ct ELSE 0 END) AS BIGINT)
                   AS n_rows_at_risk
        FROM tvd, (SELECT unnest(CAST([0.2, 0.35, 0.5] AS DOUBLE[])) AS t)
        GROUP BY 1
    """
    sqls["q333_importance_weight_ess"] = """
        WITH bucketed AS (
            SELECT lang,
                   least(CAST(floor(n_chars / 200) AS BIGINT), 4) AS b
            FROM documents
        ), shares AS (
            SELECT lang, b, count(*) AS n FROM bucketed GROUP BY 1, 2
        ), weighted AS (
            SELECT lang, b, n,
                   sum(n) OVER (PARTITION BY lang) * 1.0
                       / (count(*) OVER (PARTITION BY lang) * n) AS w
            FROM shares
        ), terms AS (
            SELECT lang, b, n, w, least(w, 5.0) AS wc FROM weighted
        ), folded AS (
            -- left-fold the bucket-sorted term lists: the identical IEEE
            -- sequence the Spark side evaluates (sort_array + F.aggregate)
            SELECT lang, CAST(sum(n) AS BIGINT) AS n_docs,
                   list_reduce(list(n * w ORDER BY b),
                               (a, x) -> a + x) AS sw,
                   list_reduce(list(n * (w * w) ORDER BY b),
                               (a, x) -> a + x) AS sww,
                   list_reduce(list(n * wc ORDER BY b),
                               (a, x) -> a + x) AS swc,
                   list_reduce(list(n * (wc * wc) ORDER BY b),
                               (a, x) -> a + x) AS swcc
            FROM terms GROUP BY lang
        )
        SELECT lang, n_docs,
               floor(sw * sw / sww * 1e6 + 0.5) / 1e6 AS ess,
               floor(sw * sw / (sww * n_docs) * 1e6 + 0.5) / 1e6 AS ess_ratio,
               floor(swc * swc / swcc * 1e6 + 0.5) / 1e6 AS ess_clipped
        FROM folded
    """
    sqls["q334_clustering_coefficient"] = """
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        edges AS (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                               AND a.l_partkey < b.l_partkey
        ), deg AS (
            SELECT v, count(*) AS d FROM (
                SELECT src AS v FROM edges
                UNION ALL SELECT dst FROM edges
            ) GROUP BY 1
        ), tri AS (
            SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
            FROM edges e1
            JOIN edges e2 ON e2.src = e1.dst
            JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
        ), tpn AS (
            SELECT v, count(*) AS t FROM (
                SELECT a AS v FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri
            ) GROUP BY 1
        ), cc AS (
            SELECT deg.v,
                   2.0 * coalesce(tpn.t, 0) / (deg.d * (deg.d - 1)) AS cc
            FROM deg LEFT JOIN tpn ON tpn.v = deg.v
            WHERE deg.d >= 2
        )
        SELECT p.p_brand, count(*) AS n_parts,
               round(avg(cc.cc), 6) AS avg_clustering_coeff,
               round(max(cc.cc), 6) AS max_clustering_coeff
        FROM cc JOIN part p ON p.p_partkey = cc.v
        GROUP BY 1
    """
    sqls["q335_knapsack_data_selection"] = f"""
        WITH scored AS (
            SELECT lang, doc_id, {_quality_sql("text")} AS q,
                   len(regexp_split_to_array(lower(trim(text)), '\\s+'))
                       AS tok
            FROM documents
        ), ranked AS (
            SELECT lang, doc_id, q, tok,
                   sum(tok) OVER (PARTITION BY lang
                                  ORDER BY q / tok DESC, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum
            FROM scored
        )
        SELECT lang,
               CAST(sum(CASE WHEN cum <= 2000 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_selected,
               CAST(sum(CASE WHEN cum <= 2000 THEN tok ELSE 0 END) AS BIGINT)
                   AS tokens_used,
               floor(CAST(sum(CASE WHEN cum <= 2000
                                   THEN CAST(round(q * 10000) AS BIGINT) END)
                          AS DOUBLE)
                     * 1e6 / (count(CASE WHEN cum <= 2000 THEN 1 END) * 10000)
                     + 0.5) / 1e6
                   AS avg_quality_selected,
               floor(CAST(sum(CASE WHEN cum > 2000
                                   THEN CAST(round(q * 10000) AS BIGINT) END)
                          AS DOUBLE)
                     * 1e6 / (count(CASE WHEN cum > 2000 THEN 1 END) * 10000)
                     + 0.5) / 1e6
                   AS avg_quality_dropped
        FROM ranked GROUP BY 1
    """
    sqls["q336_source_distribution_similarity"] = f"""
        WITH toks AS (
            SELECT source, w FROM (
                SELECT source, unnest({_TOKS}) AS w FROM documents
            ) WHERE w != ''
        ), shares AS (
            SELECT source, w,
                   count(*) * 1.0
                       / sum(count(*)) OVER (PARTITION BY source) AS p
            FROM toks GROUP BY 1, 2
        )
        SELECT a.source AS source_a, b.source AS source_b,
               round(sum(least(a.p, b.p)), 6) AS hist_intersection
        FROM shares a JOIN shares b ON a.w = b.w AND a.source < b.source
        GROUP BY 1, 2
        ORDER BY hist_intersection DESC, source_a, source_b
        LIMIT 10
    """
    sqls["q337_temporal_motifs"] = """
        WITH seq AS (
            SELECT event_type AS e1,
                   lead(event_type, 1) OVER w AS e2,
                   lead(event_type, 2) OVER w AS e3,
                   epoch(ts) AS t1,
                   lead(epoch(ts), 2) OVER w AS t3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT e1, e2, e3, count(*) AS n_occurrences
        FROM seq WHERE e3 IS NOT NULL AND t3 - t1 <= 1800
        GROUP BY 1, 2, 3
        ORDER BY n_occurrences DESC, e1, e2, e3
        LIMIT 10
    """
    sqls["q338_ols_residual_outliers"] = """
        WITH moments AS (
            SELECT p_brand, count(*) AS nb,
                   covar_pop(p_size, p_retailprice) AS cxy,
                   var_pop(p_size) AS vx,
                   avg(p_retailprice) AS my, avg(p_size) AS mx
            FROM part GROUP BY 1
        ), fit AS (
            SELECT p_brand, cxy / vx AS slope, my, mx
            FROM moments WHERE vx > 0 AND nb > 2
        ), resid AS (
            SELECT p.p_brand,
                   p_retailprice - (my + slope * (p_size - mx)) AS r
            FROM part p JOIN fit USING (p_brand)
        ), sigma AS (
            SELECT p_brand, stddev_samp(r) AS sig FROM resid GROUP BY 1
        )
        SELECT r.p_brand, count(*) AS n_parts,
               round(max(sig), 6) AS resid_sigma,
               CAST(sum(CASE WHEN abs(r.r) > 2 * sig THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers,
               round(max(CASE WHEN sig > 0 THEN abs(r.r) / sig END), 6)
                   AS max_std_resid
        FROM resid r JOIN sigma USING (p_brand)
        GROUP BY 1
    """
    sqls["q339_transition_entropy"] = """
        WITH trans AS (
            SELECT event_type AS cur,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS nxt
            FROM events
        ), t2 AS (SELECT * FROM trans WHERE nxt IS NOT NULL),
        counts AS (SELECT cur, nxt, count(*) AS n FROM t2 GROUP BY 1, 2)
        SELECT cur, CAST(sum(n) AS BIGINT) AS n_transitions,
               round(ln(sum(n)) - sum(n * ln(n)) / sum(n), 6) AS entropy,
               floor((CAST(max(n) AS DOUBLE) / sum(n)) * 1e6 + 0.5) / 1e6
                   AS top_share,
               round(1 - (ln(sum(n)) - sum(n * ln(n)) / sum(n)) / ln(5.0), 6)
                   AS predictability
        FROM counts GROUP BY 1
    """
    sqls["q340_bh_fdr_audit"] = """
        WITH m AS (
            SELECT event_type, user_id % 2 AS arm, count(*) AS n,
                   avg(value) AS mean, var_samp(value) AS var
            FROM events GROUP BY 1, 2
        ), a AS (
            SELECT event_type, mean AS m1, var / n AS s1 FROM m WHERE arm = 1
        ), b AS (
            SELECT event_type, mean AS m0, var / n AS s0 FROM m WHERE arm = 0
        ), zt AS (
            SELECT event_type, (m1 - m0) / sqrt(s1 + s0) AS z
            FROM a JOIN b USING (event_type)
        ), pv AS (
            SELECT event_type, z,
                   2 * (exp(-abs(z) * abs(z) / 2) / 2.5066282746310002
                        * (0.319381530 * (1 / (1 + 0.2316419 * abs(z)))
                           - 0.356563782 * (1 / (1 + 0.2316419 * abs(z)))
                             * (1 / (1 + 0.2316419 * abs(z)))
                           + 1.781477937 * (1 / (1 + 0.2316419 * abs(z)))
                             * (1 / (1 + 0.2316419 * abs(z)))
                             * (1 / (1 + 0.2316419 * abs(z)))
                           - 1.821255978 * (1 / (1 + 0.2316419 * abs(z)))
                             * (1 / (1 + 0.2316419 * abs(z)))
                             * (1 / (1 + 0.2316419 * abs(z)))
                             * (1 / (1 + 0.2316419 * abs(z)))
                           + 1.330274429 * (1 / (1 + 0.2316419 * abs(z)))
                             * (1 / (1 + 0.2316419 * abs(z)))
                             * (1 / (1 + 0.2316419 * abs(z)))
                             * (1 / (1 + 0.2316419 * abs(z)))
                             * (1 / (1 + 0.2316419 * abs(z))))) AS p
            FROM zt
        ), ranked AS (
            SELECT x.event_type, x.z, x.p, count(*) AS p_rank
            FROM pv x JOIN pv y ON y.p <= x.p
            GROUP BY 1, 2, 3
        ), kmax AS (
            SELECT max(CASE WHEN p <= p_rank * 0.1 / 5 THEN p_rank END)
                AS kmax
            FROM ranked
        )
        SELECT event_type, round(z, 6) AS z_stat, round(p, 6) AS p_value,
               CAST(p_rank AS BIGINT) AS p_rank,
               round(p_rank * 0.1 / 5, 6) AS bh_cutoff,
               coalesce(p_rank <= kmax, false) AS significant
        FROM ranked, kmax
    """
    _r8 = _hash_ring(8)
    _r10 = _hash_ring(10)

    def _ring_case(ring: list[tuple[int, int]]) -> str:
        cases = " ".join(f"WHEN kh <= {pos} THEN {s}" for pos, s in ring)
        return f"(CASE {cases} ELSE {ring[0][1]} END)"

    sqls["q341_shard_rebalance_audit"] = f"""
        WITH keys AS (SELECT DISTINCT user_id FROM events),
        keyed AS (
            SELECT CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                                          1, 8) AS BIGINT) AS kh
            FROM keys
        ), flags AS (
            SELECT 'mod' AS strategy, (kh % 8) != (kh % 10) AS moved
            FROM keyed
            UNION ALL
            SELECT 'ring', {_ring_case(_r8)} != {_ring_case(_r10)}
            FROM keyed
        )
        SELECT strategy, count(*) AS n_keys,
               CAST(sum(CASE WHEN moved THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_moved,
               floor(CAST(sum(CASE WHEN moved THEN 1 ELSE 0 END) AS DOUBLE)
                     * 1e6 / count(*) + 0.5) / 1e6
                   AS moved_frac
        FROM flags GROUP BY 1
    """
    sqls["q342_ttl_cache_hit_audit"] = """
        WITH gaps AS (
            SELECT epoch(ts) - lag(epoch(ts))
                       OVER (PARTITION BY user_id, event_type
                             ORDER BY ts, event_id) AS gap
            FROM events
        )
        SELECT ttl_seconds, count(*) AS n_accesses,
               CAST(sum(CASE WHEN gap IS NOT NULL AND gap <= ttl_seconds
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
               floor(CAST(sum(CASE WHEN gap IS NOT NULL AND gap <= ttl_seconds
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     * 1e6 / count(*) + 0.5) / 1e6 AS hit_rate
        FROM gaps,
             (SELECT CAST(unnest([60, 300, 1800]) AS INT) AS ttl_seconds)
        GROUP BY 1
    """
    sqls["q343_competing_risks_cif"] = """
        WITH pe AS (
            SELECT user_id, user_id % 2 AS arm, CAST(ts AS DATE) AS d,
                   event_type
            FROM events
        ), firsts AS (
            SELECT user_id, arm, min(d) AS start, max(d) AS last,
                   min(CASE WHEN event_type = 'purchase' THEN d END) AS p,
                   min(CASE WHEN event_type = 'error' THEN d END) AS e
            FROM pe GROUP BY 1, 2
        ), exits AS (
            SELECT arm,
                   CAST(CASE WHEN p IS NOT NULL AND (e IS NULL OR p <= e)
                             THEN datediff('day', start, p)
                             WHEN e IS NOT NULL
                             THEN datediff('day', start, e)
                             ELSE datediff('day', start, last) END AS INT)
                       AS t,
                   CASE WHEN p IS NOT NULL AND (e IS NULL OR p <= e) THEN 1
                        WHEN e IS NOT NULL THEN 2 ELSE 0 END AS k
            FROM firsts
        ), grid AS (
            SELECT arm, t,
                   sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS d1,
                   sum(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS d2,
                   count(*) AS alln
            FROM exits GROUP BY 1, 2
        ), stepped AS (
            SELECT arm, t, d1, d2,
                   sum(alln) OVER (PARTITION BY arm)
                   - coalesce(sum(alln)
                       OVER (PARTITION BY arm ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0) AS n_risk
            FROM grid
        ), hz AS (
            SELECT arm, t, d1, d2, n_risk,
                   exp(coalesce(sum(ln(greatest(
                           1.0 - (d1 + d2) * 1.0 / n_risk, 1e-300)))
                       OVER (PARTITION BY arm ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0.0)) AS s_prev
            FROM stepped
        ), cif AS (
            SELECT arm, t, d1, d2, n_risk,
                   round(sum(s_prev * d1 * 1.0 / n_risk)
                         OVER (PARTITION BY arm ORDER BY t
                               ROWS UNBOUNDED PRECEDING), 6)
                       AS cif_purchase,
                   round(sum(s_prev * d2 * 1.0 / n_risk)
                         OVER (PARTITION BY arm ORDER BY t
                               ROWS UNBOUNDED PRECEDING), 6) AS cif_error
            FROM hz
        )
        SELECT arm, t, CAST(n_risk AS BIGINT) AS n_risk,
               cif_purchase, cif_error
        FROM cif WHERE d1 + d2 > 0
    """
    sqls["q344_retention_decay_fit"] = """
        WITH e AS (
            SELECT user_id, date_trunc('week', ts) AS wk FROM events
        ), cohort AS (
            SELECT user_id, min(wk) AS c0 FROM e GROUP BY 1
        ), joined AS (
            SELECT e.user_id, c.c0,
                   CAST(datediff('day', c.c0, e.wk) / 7 AS INT) AS k
            FROM e JOIN cohort c USING (user_id)
        ), sizes AS (
            SELECT c0, count(DISTINCT user_id) AS n0 FROM cohort GROUP BY 1
        ), matrix AS (
            SELECT k, avg(nk * 1.0 / n0) AS r
            FROM (SELECT c0, k, count(DISTINCT user_id) AS nk
                  FROM joined GROUP BY 1, 2) m
            JOIN sizes USING (c0)
            WHERE k >= 1 GROUP BY 1
        ), pts AS (
            SELECT ln(CAST(k AS DOUBLE)) AS x, ln(r) AS y FROM matrix
        ), fit AS (
            -- explicit moments, mirroring the engine formula exactly:
            -- zero-variance offset tables NULL the fit on both sides
            SELECT count(*) AS n_offsets,
                   avg(x) AS mx, avg(y) AS my,
                   avg(x * x) AS mxx, avg(x * y) AS mxy, avg(y * y) AS myy
            FROM pts
        ), derived AS (
            SELECT n_offsets, mx, my,
                   mxx - mx * mx AS varx,
                   myy - my * my AS vary,
                   mxy - mx * my AS covxy
            FROM fit
        )
        SELECT n_offsets,
               round(CASE WHEN varx > 0 THEN covxy / varx END, 6)
                   AS decay_exponent,
               round(exp(my - (CASE WHEN varx > 0 THEN covxy / varx END)
                              * mx), 6) AS week1_retention,
               round(CASE WHEN varx > 0 AND vary > 0
                          THEN covxy * covxy / (varx * vary) END, 6)
                   AS r_squared
        FROM derived
    """
    sqls["q345_moore_lewis_selection"] = f"""
        WITH toks AS (
            SELECT doc_id, lang, w FROM (
                SELECT doc_id, lang, unnest({_TOKS}) AS w FROM documents
            ) WHERE w != ''
        ), vocab AS (SELECT DISTINCT w FROM toks),
        vs AS (SELECT count(*) AS v FROM vocab),
        dom AS (
            SELECT w, count(*) AS cd FROM toks WHERE lang = 'en' GROUP BY 1
        ), dt AS (SELECT CAST(sum(cd) AS BIGINT) AS nd FROM dom),
        gen AS (SELECT w, count(*) AS cg FROM toks GROUP BY 1),
        gt AS (SELECT CAST(sum(cg) AS BIGINT) AS ng FROM gen),
        model AS (
            SELECT v2.w,
                   -ln((coalesce(d.cd, 0) + 1.0) / (dt.nd + vs.v)) AS nll_d,
                   -ln((coalesce(g.cg, 0) + 1.0) / (gt.ng + vs.v)) AS nll_g
            FROM vocab v2
            LEFT JOIN dom d ON d.w = v2.w
            LEFT JOIN gen g ON g.w = v2.w
            CROSS JOIN vs CROSS JOIN dt CROSS JOIN gt
        )
        SELECT t.doc_id, t.lang, count(*) AS n_tokens,
               round(avg(m.nll_d) - avg(m.nll_g), 6) AS ce_difference
        FROM toks t JOIN model m ON m.w = t.w
        WHERE t.lang != 'en'
        GROUP BY 1, 2
        ORDER BY ce_difference, doc_id
        LIMIT 10
    """
    sqls["q346_error_retry_rate"] = """
        WITH nexts AS (
            SELECT event_type, epoch(ts) AS t,
                   lead(event_type) OVER w AS nt,
                   lead(epoch(ts)) OVER w AS nts
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), errs AS (
            SELECT CASE WHEN nt IS NULL OR nts - t > 600 THEN 'none'
                        ELSE nt END AS next_within_10m
            FROM nexts WHERE event_type = 'error'
        ), grouped AS (
            SELECT next_within_10m, count(*) AS n_errors
            FROM errs GROUP BY 1
        ), tot AS (
            SELECT CAST(sum(n_errors) AS BIGINT) AS tot FROM grouped
        )
        SELECT next_within_10m, n_errors,
               floor((CAST(n_errors AS DOUBLE) / tot) * 1e6 + 0.5) / 1e6 AS share
        FROM grouped, tot
    """
    sqls["q347_window_funnel_levels"] = """
        WITH ev AS (
            SELECT user_id, event_type, epoch(ts) AS t FROM events
        ), users AS (SELECT DISTINCT user_id FROM ev),
        t1 AS (
            SELECT user_id, min(t) AS t1 FROM ev
            WHERE event_type = 'signup' GROUP BY 1
        ), t2 AS (
            SELECT e.user_id, min(e.t) AS t2
            FROM ev e JOIN t1 ON t1.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.t > t1.t1
              AND e.t - t1.t1 <= 3600
            GROUP BY 1
        ), t3 AS (
            SELECT e.user_id, min(e.t) AS t3
            FROM ev e JOIN t2 ON t2.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.t > t2.t2
              AND e.t - t2.t2 <= 3600
            GROUP BY 1
        ), levels AS (
            SELECT CASE WHEN t3.t3 IS NOT NULL THEN 3
                        WHEN t2.t2 IS NOT NULL THEN 2
                        WHEN t1.t1 IS NOT NULL THEN 1 ELSE 0 END
                       AS funnel_level
            FROM users u
            LEFT JOIN t1 ON t1.user_id = u.user_id
            LEFT JOIN t2 ON t2.user_id = u.user_id
            LEFT JOIN t3 ON t3.user_id = u.user_id
        ), grouped AS (
            SELECT funnel_level, count(*) AS n_users
            FROM levels GROUP BY 1
        ), tot AS (
            SELECT CAST(sum(n_users) AS BIGINT) AS tot FROM grouped
        )
        SELECT funnel_level, n_users,
               floor((CAST(n_users AS DOUBLE) / tot) * 1e6 + 0.5) / 1e6 AS share
        FROM grouped, tot
    """
    sqls["q348_seasonality_strength"] = """
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   round(sum(o_totalprice), 2) AS rev
            FROM orders GROUP BY 1
        ), dw AS (
            SELECT dayofweek(day) AS dwk, avg(rev) AS smean
            FROM daily GROUP BY 1
        )
        SELECT count(*) AS n_days,
               round(var_pop(rev) / 1e9, 3) AS var_daily_bn,
               round(var_pop(rev - smean) / 1e9, 3) AS var_residual_bn,
               round(CASE WHEN var_pop(rev) > 0
                          THEN greatest(0.0,
                               1 - var_pop(rev - smean) / var_pop(rev))
                     END, 6) AS seasonality_strength
        FROM daily d JOIN dw ON dw.dwk = dayofweek(d.day)
    """
    _grain_sqls = []
    for _g in ("day", "week", "month"):
        _touch = (
            f"count(DISTINCT CASE WHEN ts >= TIMESTAMP '2024-01-10' "
            f"AND ts < TIMESTAMP '2024-01-17' "
            f"THEN date_trunc('{_g}', ts) END)"
        )
        _grain_sqls.append(f"""
            SELECT '{_g}' AS grain,
                   count(DISTINCT date_trunc('{_g}', ts)) AS n_partitions,
                   {_touch} AS n_touched,
                   floor((1 - CAST({_touch} AS DOUBLE)
                          / count(DISTINCT date_trunc('{_g}', ts)))
                         * 1e6 + 0.5) / 1e6
                       AS pruning_ratio
            FROM events
        """)
    sqls["q349_partition_layout_planner"] = " UNION ALL ".join(_grain_sqls)
    sqls["q350_encoding_planner"] = """
        WITH melted AS (
            SELECT 'l_returnflag' AS col_name,
                   CAST(l_returnflag AS VARCHAR) AS v FROM lineitem
            UNION ALL SELECT 'l_linestatus',
                   CAST(l_linestatus AS VARCHAR) FROM lineitem
            UNION ALL SELECT 'l_partkey',
                   CAST(l_partkey AS VARCHAR) FROM lineitem
            UNION ALL SELECT 'l_quantity',
                   CAST(l_quantity AS VARCHAR) FROM lineitem
            UNION ALL SELECT 'l_shipdate',
                   CAST(l_shipdate AS VARCHAR) FROM lineitem
        ), cnts AS (
            SELECT col_name, v, count(*) AS c FROM melted GROUP BY 1, 2
        ), stats AS (
            SELECT col_name, CAST(sum(c) AS BIGINT) AS n_rows,
                   count(*) AS ndv
            FROM cnts GROUP BY 1
        )
        SELECT col_name, n_rows, ndv,
               floor((CAST(ndv AS DOUBLE) / n_rows) * 1e6 + 0.5) / 1e6 AS ndv_ratio,
               CAST(ceil(log2(ndv)) AS BIGINT) AS dict_key_bits,
               CASE WHEN ndv <= 65536 AND ndv * 1.0 / n_rows < 0.5
                    THEN 'dictionary' ELSE 'plain' END AS recommendation
        FROM stats
    """
    sqls["q351_peak_detection"] = """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2
        ), flagged AS (
            SELECT event_type, day, n_events,
                   lag(n_events) OVER w AS prev,
                   lead(n_events) OVER w AS nxt,
                   avg(n_events) OVER (PARTITION BY event_type ORDER BY day
                                       ROWS BETWEEN 3 PRECEDING
                                            AND 3 FOLLOWING) AS avg7
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day)
        )
        SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n_events,
               round(avg7, 2) AS avg_7d,
               round(n_events / avg7, 6) AS prominence_ratio
        FROM flagged
        WHERE prev IS NOT NULL AND nxt IS NOT NULL
          AND n_events > prev AND n_events > nxt
          AND n_events > 1.1 * avg7
    """
    sqls["q352_variance_reduction_methods"] = """
        WITH per_user AS (
            SELECT user_id,
                   sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                            THEN value END) AS x,
                   sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                            THEN value END) AS y,
                   sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                            THEN CAST(round(value * 100) AS BIGINT) END) AS cy
            FROM events GROUP BY 1
        ), pu AS (
            SELECT * FROM per_user WHERE x IS NOT NULL AND y IS NOT NULL
        ), model AS (
            SELECT CASE WHEN var_pop(x) > 0
                        THEN covar_pop(y, x) / var_pop(x) END AS th,
                   avg(x) AS xbar,
                   quantile_cont(x, [0.2, 0.4, 0.6, 0.8]) AS cuts
            FROM pu
        ), enr AS (
            SELECT user_id % 2 AS t, y, cy,
                   y - th * (x - xbar) AS yc,
                   (CASE WHEN x > cuts[1] THEN 1 ELSE 0 END
                    + CASE WHEN x > cuts[2] THEN 1 ELSE 0 END
                    + CASE WHEN x > cuts[3] THEN 1 ELSE 0 END
                    + CASE WHEN x > cuts[4] THEN 1 ELSE 0 END) AS s
            FROM pu, model
        ), rawm AS (
            SELECT t, count(*) AS n, sum(cy) AS c, var_samp(y) AS v
            FROM enr GROUP BY 1
        ), cupm AS (
            SELECT t, count(*) AS n, avg(yc) AS m, var_samp(yc) AS v
            FROM enr GROUP BY 1
        ), strm AS (
            SELECT s, t, count(*) AS n, sum(cy) AS c, var_samp(y) AS v
            FROM enr GROUP BY 1, 2
        ), s1 AS (
            SELECT s, c AS c1, v / n AS se1, n AS n1 FROM strm WHERE t = 1
        ), s0 AS (
            SELECT s, c AS c0, v / n AS se0, n AS n0 FROM strm WHERE t = 0
        ), ps AS (
            SELECT s,
                   CAST(floor(CAST(c1 * n0 - c0 * n1 AS DOUBLE) * 1e7
                              / (100 * n1 * n0) + 0.5) AS BIGINT) AS dq,
                   se1 + se0 AS vr, n1 + n0 AS ns
            FROM s1 JOIN s0 USING (s)
        )
        SELECT 'raw' AS method,
               floor(CAST((SELECT c FROM rawm WHERE t = 1)
                          * (SELECT n FROM rawm WHERE t = 0)
                          - (SELECT c FROM rawm WHERE t = 0)
                          * (SELECT n FROM rawm WHERE t = 1) AS DOUBLE)
                     * 1e6
                     / (100 * (SELECT n FROM rawm WHERE t = 1)
                        * (SELECT n FROM rawm WHERE t = 0))
                     + 0.5) / 1e6 AS effect,
               round(sqrt((SELECT v / n FROM rawm WHERE t = 1)
                          + (SELECT v / n FROM rawm WHERE t = 0)), 6) AS se
        UNION ALL
        SELECT 'cuped',
               round((SELECT m FROM cupm WHERE t = 1)
                     - (SELECT m FROM cupm WHERE t = 0), 6),
               round(sqrt((SELECT v / n FROM cupm WHERE t = 1)
                          + (SELECT v / n FROM cupm WHERE t = 0)), 6)
        UNION ALL
        SELECT 'post_stratified',
               floor(CAST(sum(dq * ns) AS DOUBLE) * 1e6
                     / (10000000 * sum(ns)) + 0.5) / 1e6,
               round(sqrt(sum(vr * ns * ns)
                          / (sum(ns) * sum(ns))), 6)
        FROM ps
    """
    sqls["q353_cf_holdout_hitrate"] = """
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        keyed AS (
            SELECT li.l_orderkey, li.l_partkey,
                   o.o_orderdate < TIMESTAMP '1998-01-01' AS train
            FROM li JOIN orders o ON o.o_orderkey = li.l_orderkey
        ), tr AS (SELECT l_orderkey, l_partkey FROM keyed WHERE train),
        te AS (SELECT l_orderkey, l_partkey FROM keyed WHERE NOT train),
        ni AS (SELECT l_partkey, count(*) AS n FROM tr GROUP BY 1),
        co AS (
            SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
                   count(*) AS c
            FROM tr a JOIN tr b ON a.l_orderkey = b.l_orderkey
                               AND a.l_partkey != b.l_partkey
            GROUP BY 1, 2
        ), top_items AS (
            SELECT l_partkey AS item_a, n AS na FROM ni
            ORDER BY n DESC, l_partkey LIMIT 20
        ), top3 AS (
            SELECT item_a, item_b FROM (
                SELECT c.item_a, c.item_b,
                       row_number() OVER (
                           PARTITION BY c.item_a
                           ORDER BY round(c.c / sqrt(t.na * nb.n), 9) DESC,
                                    c.item_b) AS r
                FROM co c
                JOIN top_items t ON t.item_a = c.item_a
                JOIN ni nb ON nb.l_partkey = c.item_b
            ) WHERE r <= 3
        ), test_pairs AS (
            SELECT DISTINCT a.l_partkey AS item_a, b.l_partkey AS item_b
            FROM te a
            JOIN te b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey != b.l_partkey
            JOIN top_items t ON t.item_a = a.l_partkey
        )
        SELECT count(*) AS n_test_pairs,
               CAST(sum(CASE WHEN t3.item_a IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hits,
               floor(CAST(sum(CASE WHEN t3.item_a IS NOT NULL
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     * 1e6 / count(*) + 0.5) / 1e6 AS hit_rate_at_3
        FROM test_pairs tp LEFT JOIN top3 t3
          ON t3.item_a = tp.item_a AND t3.item_b = tp.item_b
    """
    _bpe_ctes = [
        """c0 AS (
            SELECT doc_id AS doc,
                   ' ' || regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
                       || ' ' AS txt
            FROM documents
        )"""
    ]
    for _i in (1, 2, 3):
        _prev = f"c{_i - 1}"
        _bpe_ctes.append(f"""p{_i} AS (
            SELECT w1, w2, count(*) AS n FROM (
                SELECT lag(w) OVER (PARTITION BY doc ORDER BY p) AS w1,
                       w AS w2
                FROM (SELECT doc,
                             unnest(regexp_split_to_array(trim(txt),
                                                          '\\s+')) AS w,
                             generate_subscripts(
                                 regexp_split_to_array(trim(txt), '\\s+'),
                                 1) AS p
                      FROM {_prev}))
            WHERE w1 IS NOT NULL GROUP BY 1, 2
        )""")
        _bpe_ctes.append(
            f"t{_i} AS (SELECT w1, w2, n FROM p{_i} "
            f"ORDER BY n DESC, w1, w2 LIMIT 1)"
        )
        if _i < 3:
            _bpe_ctes.append(f"""c{_i} AS (
                SELECT doc, replace(txt,
                    ' ' || (SELECT w1 FROM t{_i}) || ' '
                        || (SELECT w2 FROM t{_i}) || ' ',
                    ' ' || (SELECT w1 FROM t{_i}) || '@@'
                        || (SELECT w2 FROM t{_i}) || ' ') AS txt
                FROM {_prev}
            )""")
    _bpe_steps = " UNION ALL ".join(
        f"""SELECT CAST({_i} AS INT) AS step,
               (SELECT w1 || ' ' || w2 FROM t{_i}) AS merged_pair,
               (SELECT w1 || '@@' || w2 FROM t{_i}) AS new_token,
               (SELECT n FROM t{_i}) AS pair_count"""
        for _i in (1, 2, 3)
    )
    sqls["q354_bpe_merge_steps"] = (
        "WITH " + ",\n".join(_bpe_ctes) + "\n" + _bpe_steps
    )
    sqls["q355_three_itemset_rules"] = """
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        no AS (SELECT count(DISTINCT l_orderkey) AS n FROM li),
        triples AS (
            SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
                   c.l_partkey AS item_c, count(*) AS sup_abc
            FROM li a
            JOIN li b ON b.l_orderkey = a.l_orderkey
                     AND a.l_partkey < b.l_partkey
            JOIN li c ON c.l_orderkey = a.l_orderkey
                     AND c.l_partkey != a.l_partkey
                     AND c.l_partkey != b.l_partkey
            GROUP BY 1, 2, 3
            HAVING count(*) >= 2
        ), pair_sup AS (
            SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
                   count(*) AS sup_ab
            FROM li a JOIN li b ON b.l_orderkey = a.l_orderkey
                               AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        ), item_sup AS (
            SELECT l_partkey AS item_c, count(*) AS sup_c FROM li GROUP BY 1
        )
        SELECT t.item_a, t.item_b, t.item_c,
               CAST(t.sup_abc AS BIGINT) AS support,
               floor((CAST(t.sup_abc AS DOUBLE) / p.sup_ab) * 1e6 + 0.5) / 1e6
                   AS confidence,
               floor((t.sup_abc * CAST(no.n AS DOUBLE)
                      / (p.sup_ab * i.sup_c)) * 1e6 + 0.5) / 1e6 AS lift
        FROM triples t
        JOIN pair_sup p ON p.item_a = t.item_a AND p.item_b = t.item_b
        JOIN item_sup i ON i.item_c = t.item_c, no
        ORDER BY lift DESC, t.item_a, t.item_b, t.item_c
        LIMIT 10
    """
    sqls["q356_growth_accounting"] = """
        WITH uw AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
            FROM events
        ), cls AS (
            SELECT wk,
                   CASE WHEN wk = min(wk) OVER (PARTITION BY user_id)
                        THEN 'new'
                        WHEN datediff('day',
                                      lag(wk) OVER (PARTITION BY user_id
                                                    ORDER BY wk), wk) = 7
                        THEN 'retained'
                        ELSE 'resurrected' END AS state
            FROM uw
        ), counts AS (
            SELECT strftime(wk, '%Y-%m-%d') AS week,
                   CAST(sum(CASE WHEN state = 'new' THEN 1 ELSE 0 END)
                        AS BIGINT) AS new_users,
                   CAST(sum(CASE WHEN state = 'retained' THEN 1 ELSE 0 END)
                        AS BIGINT) AS retained_users,
                   CAST(sum(CASE WHEN state = 'resurrected'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS resurrected_users
            FROM cls GROUP BY 1
        ), prev AS (
            SELECT strftime(CAST(wk AS DATE) + 7, '%Y-%m-%d') AS week,
                   user_id
            FROM uw
        ), cur AS (
            SELECT strftime(CAST(wk AS DATE), '%Y-%m-%d') AS week, user_id
            FROM uw
        ), churned AS (
            SELECT p.week, count(*) AS churned_users
            FROM prev p LEFT JOIN cur c
              ON c.week = p.week AND c.user_id = p.user_id
            WHERE c.user_id IS NULL
            GROUP BY 1
        )
        SELECT counts.week, new_users, retained_users, resurrected_users,
               CAST(coalesce(ch.churned_users, 0) AS BIGINT)
                   AS churned_users
        FROM counts LEFT JOIN churned ch ON ch.week = counts.week
    """
    _z = 1.959964
    _z2 = _z * _z
    sqls["q357_conversion_regression_detector"] = f"""
        WITH weekly AS (
            SELECT date_trunc('week', ts) AS wk,
                   count(DISTINCT user_id) AS n,
                   count(DISTINCT CASE WHEN event_type = 'purchase'
                                       THEN user_id END) AS k
            FROM events GROUP BY 1
        ), banded AS (
            SELECT wk, n, k,
                   floor((CAST(k AS DOUBLE) / n) * 1e6 + 0.5) / 1e6
                       AS conversion,
                   ((k * 1.0 / n) + {_z2!r} / (2 * n)) / (1 + {_z2!r} / n)
                   - {_z!r} * sqrt((k * 1.0 / n) * (1 - k * 1.0 / n) / n
                                   + {_z2!r} / (4 * n * n))
                     / (1 + {_z2!r} / n) AS lo,
                   ((k * 1.0 / n) + {_z2!r} / (2 * n)) / (1 + {_z2!r} / n)
                   + {_z!r} * sqrt((k * 1.0 / n) * (1 - k * 1.0 / n) / n
                                   + {_z2!r} / (4 * n * n))
                     / (1 + {_z2!r} / n) AS hi
            FROM weekly
        )
        SELECT strftime(wk, '%Y-%m-%d') AS week,
               CAST(n AS BIGINT) AS n_users,
               CAST(k AS BIGINT) AS n_converted,
               conversion,
               round(lo, 6) AS wilson_lo, round(hi, 6) AS wilson_hi,
               coalesce(hi < lag(lo) OVER (PARTITION BY year(wk)
                                           ORDER BY wk), false)
                   AS regression_flag
        FROM banded
    """
    sqls["q358_depth_conversion_monotonicity"] = """
        WITH per_user AS (
            SELECT user_id, count(*) AS depth,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS converted
            FROM events GROUP BY 1
        ), cuts AS (
            SELECT quantile_cont(depth, [0.2, 0.4, 0.6, 0.8]) AS c
            FROM per_user
        ), bucketed AS (
            SELECT (CASE WHEN depth > c[1] THEN 1 ELSE 0 END
                    + CASE WHEN depth > c[2] THEN 1 ELSE 0 END
                    + CASE WHEN depth > c[3] THEN 1 ELSE 0 END
                    + CASE WHEN depth > c[4] THEN 1 ELSE 0 END)
                       AS depth_quintile,
                   converted
            FROM per_user, cuts
        ), rates AS (
            SELECT depth_quintile, count(*) AS n_users,
                   floor(CAST(sum(converted) AS DOUBLE) * 1e6 / count(*)
                         + 0.5) / 1e6 AS conversion_rate
            FROM bucketed GROUP BY 1
        )
        SELECT depth_quintile, n_users, conversion_rate,
               coalesce(conversion_rate < lag(conversion_rate)
                            OVER (ORDER BY depth_quintile), false)
                   AS isotonic_violation
        FROM rates
    """
    _lam = 0.3
    _oml = 1 - _lam
    _lfac = _lam / (2 - _lam)
    sqls["q359_ewma_control_chart"] = f"""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n
            FROM orders GROUP BY 1
        ), base AS (
            SELECT avg(n) AS mu, stddev_samp(n) AS sd FROM daily
        ), ranked AS (
            SELECT day, n, row_number() OVER (ORDER BY day) AS r
            FROM daily
        ), ew AS (
            SELECT a.day, a.n, a.r,
                   sum({_lam!r} * pow({_oml!r}, a.r - b.r) * b.n) AS wsum
            FROM ranked a JOIN ranked b ON b.r <= a.r
            GROUP BY 1, 2, 3
        )
        SELECT strftime(day, '%Y-%m-%d') AS day,
               CAST(n AS BIGINT) AS n_orders,
               round(wsum + pow({_oml!r}, r) * mu, 4) AS ewma,
               round(mu - 3 * sd * sqrt({_lfac!r}
                     * (1 - pow({_oml!r}, 2 * r))), 4) AS lcl,
               round(mu + 3 * sd * sqrt({_lfac!r}
                     * (1 - pow({_oml!r}, 2 * r))), 4) AS ucl,
               (round(wsum + pow({_oml!r}, r) * mu, 4)
                < round(mu - 3 * sd * sqrt({_lfac!r}
                        * (1 - pow({_oml!r}, 2 * r))), 4))
               OR (round(wsum + pow({_oml!r}, r) * mu, 4)
                   > round(mu + 3 * sd * sqrt({_lfac!r}
                           * (1 - pow({_oml!r}, 2 * r))), 4))
                   AS out_of_control
        FROM ew, base
    """
    sqls["q360_sample_fidelity_audit"] = """
        WITH o AS (SELECT o_orderkey, o_totalprice FROM orders),
        sample AS (
            SELECT o_totalprice FROM (
                SELECT o_totalprice,
                       md5(CAST(o_orderkey AS VARCHAR)) AS h
                FROM o ORDER BY h LIMIT 1000)
        ), fs AS (
            SELECT count(*) AS full_n,
                   floor(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                         * 1e4 / (count(*) * 100) + 0.5) / 1e4 AS full_mean,
                   round(quantile_cont(o_totalprice, 0.5), 4) AS full_p50,
                   round(quantile_cont(o_totalprice, 0.9), 4) AS full_p90
            FROM o
        ), ss AS (
            SELECT count(*) AS sample_n,
                   floor(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                         * 1e4 / (count(*) * 100) + 0.5) / 1e4 AS sample_mean,
                   round(quantile_cont(o_totalprice, 0.5), 4) AS sample_p50,
                   round(quantile_cont(o_totalprice, 0.9), 4) AS sample_p90
            FROM sample
        )
        SELECT full_n, sample_n, full_mean, sample_mean,
               floor((abs(sample_mean - full_mean) / full_mean) * 1e6 + 0.5) / 1e6
                   AS mean_rel_err,
               full_p50, sample_p50, full_p90, sample_p90
        FROM fs, ss
    """
    sqls["q361_kendall_tau_daily"] = """
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS x,
                   round(sum(o_totalprice), 2) AS y
            FROM orders GROUP BY 1
        ), pairs AS (
            SELECT a.x, a.y, b.x AS x2, b.y AS y2
            FROM daily a JOIN daily b ON a.day < b.day
        )
        SELECT count(*) AS n_pairs,
               CAST(sum(sign(CAST(x - x2 AS DOUBLE)) * sign(y - y2))
                    AS BIGINT) AS concordant_minus_discordant,
               round(sum(sign(CAST(x - x2 AS DOUBLE)) * sign(y - y2))
                     / sqrt(CAST(count(*)
                                 - sum(CASE WHEN x = x2 THEN 1 ELSE 0 END)
                                 AS DOUBLE)
                            * (count(*)
                               - sum(CASE WHEN y = y2 THEN 1 ELSE 0 END))),
                     6) AS kendall_tau_b
        FROM pairs
    """
    sqls["q362_hill_tail_index"] = """
        WITH topk AS (
            SELECT o_totalprice FROM orders
            ORDER BY o_totalprice DESC LIMIT 500
        ), xk AS (SELECT min(o_totalprice) AS xk FROM topk)
        SELECT count(*) AS k,
               round(max(xk.xk), 2) AS threshold,
               round(1.0 / avg(ln(o_totalprice / xk.xk)), 6) AS hill_alpha
        FROM topk, xk
    """
    sqls["q363_rolling_correlation"] = """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
            FROM events GROUP BY 1, 2
        ), paired AS (
            SELECT a.event_type AS ta, b.event_type AS tb, a.day,
                   a.n AS na, b.n AS nb
            FROM daily a JOIN daily b
              ON a.day = b.day AND a.event_type < b.event_type
        ), moments AS (
            SELECT ta, tb, day,
                   count(*) OVER w AS cnt,
                   sum(CAST(na AS DOUBLE)) OVER w AS sx,
                   sum(CAST(nb AS DOUBLE)) OVER w AS sy,
                   sum(CAST(na AS DOUBLE) * CAST(na AS DOUBLE)) OVER w
                       AS sxx,
                   sum(CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE)) OVER w
                       AS syy,
                   sum(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) OVER w
                       AS sxy
            FROM paired
            WINDOW w AS (PARTITION BY ta, tb ORDER BY day
                         ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        ), rolled AS (
            SELECT ta, tb, day,
                   CASE WHEN (cnt * sxx - sx * sx) * (cnt * syy - sy * sy)
                             > 0
                        THEN (cnt * sxy - sx * sy)
                             / sqrt((cnt * sxx - sx * sx)
                                    * (cnt * syy - sy * sy)) END AS rc
            FROM moments WHERE cnt >= 14
        )
        SELECT ta AS type_a, tb AS type_b,
               round(max_by(rc, day), 6) AS latest_corr_14d,
               round(min(rc), 6) AS min_corr_14d,
               round(max(rc), 6) AS max_corr_14d
        FROM rolled
        GROUP BY 1, 2
    """
    sqls["q364_bayes_ab_normal_approx"] = """
        WITH per_arm AS (
            SELECT user_id % 2 AS arm,
                   count(DISTINCT user_id) AS n,
                   count(DISTINCT CASE WHEN event_type = 'purchase'
                                       THEN user_id END) AS k
            FROM events GROUP BY 1
        ), a AS (SELECT n AS na, k AS ka FROM per_arm WHERE arm = 0),
        b AS (SELECT n AS nb, k AS kb FROM per_arm WHERE arm = 1),
        j AS (
            SELECT (ka + 1) * 1.0 / (na + 2) AS ma,
                   (kb + 1) * 1.0 / (nb + 2) AS mb,
                   na, nb
            FROM a, b
        ), zt AS (
            SELECT round(ma, 6) AS posterior_mean_a,
                   round(mb, 6) AS posterior_mean_b,
                   (mb - ma) / sqrt(ma * (1 - ma) / (na + 3)
                                    + mb * (1 - mb) / (nb + 3)) AS z
            FROM j
        ), pz AS (
            SELECT posterior_mean_a, posterior_mean_b, z,
                   exp(-abs(z) * abs(z) / 2) / 2.5066282746310002
                   * (0.319381530 * (1 / (1 + 0.2316419 * abs(z)))
                      - 0.356563782 * (1 / (1 + 0.2316419 * abs(z)))
                        * (1 / (1 + 0.2316419 * abs(z)))
                      + 1.781477937 * (1 / (1 + 0.2316419 * abs(z)))
                        * (1 / (1 + 0.2316419 * abs(z)))
                        * (1 / (1 + 0.2316419 * abs(z)))
                      - 1.821255978 * (1 / (1 + 0.2316419 * abs(z)))
                        * (1 / (1 + 0.2316419 * abs(z)))
                        * (1 / (1 + 0.2316419 * abs(z)))
                        * (1 / (1 + 0.2316419 * abs(z)))
                      + 1.330274429 * (1 / (1 + 0.2316419 * abs(z)))
                        * (1 / (1 + 0.2316419 * abs(z)))
                        * (1 / (1 + 0.2316419 * abs(z)))
                        * (1 / (1 + 0.2316419 * abs(z)))
                        * (1 / (1 + 0.2316419 * abs(z)))) AS tail
            FROM zt
        )
        SELECT posterior_mean_a, posterior_mean_b,
               round(z, 6) AS z_stat,
               round(CASE WHEN z >= 0 THEN 1 - tail ELSE tail END, 6)
                   AS p_b_beats_a
        FROM pz
    """
    sqls["q365_rec_novelty_coverage"] = """
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        no AS (SELECT count(DISTINCT l_orderkey) AS n FROM li),
        nc AS (SELECT count(*) AS n FROM part),
        ni AS (SELECT l_partkey, count(*) AS n FROM li GROUP BY 1),
        co AS (
            SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
                   count(*) AS c
            FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                               AND a.l_partkey != b.l_partkey
            GROUP BY 1, 2
        ), top_items AS (
            SELECT l_partkey AS item_a, n AS na FROM ni
            ORDER BY n DESC, l_partkey LIMIT 20
        ), recs AS (
            SELECT item_b, nbn FROM (
                SELECT c.item_a, c.item_b, nb.n AS nbn,
                       row_number() OVER (
                           PARTITION BY c.item_a
                           ORDER BY round(c.c / sqrt(t.na * nb.n), 9) DESC,
                                    c.item_b) AS r
                FROM co c
                JOIN top_items t ON t.item_a = c.item_a
                JOIN ni nb ON nb.l_partkey = c.item_b
            ) WHERE r <= 3
        )
        SELECT count(*) AS n_recommendations,
               round(avg(-log2(nbn * 1.0 / (SELECT n FROM no))), 6)
                   AS mean_novelty_bits,
               floor((CAST(count(DISTINCT item_b) AS DOUBLE) / (SELECT n FROM nc))
                     * 1e6 + 0.5) / 1e6
                   AS catalog_coverage
        FROM recs
    """
    sqls["q366_dedup_storage_savings"] = f"""
        WITH RECURSIVE tok AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ), shg AS (
            SELECT doc_id, {_SHINGLES2} AS sh FROM tok
        ), hashed AS (
            SELECT doc_id,
                   list_transform(sh, s ->
                       CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS hs
            FROM shg
        ), fp AS (
            SELECT doc_id, CAST({_simhash_sql(32)} AS BIGINT) AS f
            FROM hashed
        ), prs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM fp a JOIN fp b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.f, b.f)) <= 3
        ), edges AS (
            SELECT id_a AS src, id_b AS dst FROM prs
            UNION ALL
            SELECT id_b AS src, id_a AS dst FROM prs
        ), walk AS (
            SELECT DISTINCT src AS node, src AS label FROM edges
            UNION
            SELECT e.src AS node, w.label
            FROM edges e JOIN walk w ON e.dst = w.node
        ), comp AS (
            SELECT node, min(label) AS component FROM walk GROUP BY node
        ), total AS (
            SELECT CAST(sum(n_chars) AS BIGINT) AS tot FROM documents
        ), exact_m AS (
            SELECT n_chars,
                   doc_id = min(doc_id) OVER (PARTITION BY sha256(text))
                       AS keep
            FROM documents
        ), near_m AS (
            SELECT d.n_chars,
                   c.node = min(c.node) OVER (PARTITION BY c.component)
                       AS keep
            FROM comp c JOIN documents d ON d.doc_id = c.node
        )
        SELECT 'exact_sha256' AS method,
               CAST(sum(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_removed,
               CAST(sum(CASE WHEN NOT keep THEN n_chars ELSE 0 END)
                    AS BIGINT) AS chars_saved,
               floor((CAST(sum(CASE WHEN NOT keep THEN n_chars ELSE 0 END)
                           AS DOUBLE)
                      / (SELECT tot FROM total)) * 1e6 + 0.5) / 1e6 AS corpus_share_saved
        FROM exact_m
        UNION ALL
        SELECT 'simhash_components',
               CAST(sum(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT),
               CAST(sum(CASE WHEN NOT keep THEN n_chars ELSE 0 END)
                    AS BIGINT),
               floor((CAST(sum(CASE WHEN NOT keep THEN n_chars ELSE 0 END)
                           AS DOUBLE)
                      / (SELECT tot FROM total)) * 1e6 + 0.5) / 1e6
        FROM near_m
    """
    sqls["q367_cohort_ltv_curve"] = """
        WITH keyed AS (
            SELECT user_id, date_trunc('week', ts) AS wk,
                   CASE WHEN event_type = 'purchase'
                        THEN CAST(round(value * 100, 0) AS BIGINT)
                        ELSE 0 END AS cents
            FROM events
        ), cohort AS (
            SELECT user_id, min(wk) AS c0 FROM keyed GROUP BY 1
        ), sizes AS (
            SELECT c0, count(*) AS n0 FROM cohort GROUP BY 1
        ), per_offset AS (
            SELECT c.c0,
                   CAST(datediff('day', c.c0, k.wk) / 7 AS INT)
                       AS week_offset,
                   sum(k.cents) AS rev
            FROM keyed k JOIN cohort c USING (user_id)
            GROUP BY 1, 2
        )
        SELECT strftime(p.c0, '%Y-%m-%d') AS cohort_week, p.week_offset,
               CAST(s.n0 AS BIGINT) AS cohort_size,
               floor(CAST(sum(p.rev) OVER (PARTITION BY p.c0
                                           ORDER BY p.week_offset
                                           ROWS UNBOUNDED PRECEDING)
                          AS DOUBLE)
                     * 1e4 / (100 * s.n0) + 0.5) / 1e4 AS cum_ltv_per_user
        FROM per_offset p JOIN sizes s ON s.c0 = p.c0
    """
    _lb_lags = " UNION ALL ".join(
        f"""
        SELECT lag, n, round(rho, 6) AS autocorr,
               rho * rho / (n - lag) AS term
        FROM (SELECT {k} AS lag, max(b.n) AS n,
                     sum((a.r - b.mu) * (l.r - b.mu)) / max(b.ss) AS rho
              FROM resid a
              JOIN resid l ON a.day = l.day + {k}, base b)
        """
        for k in range(1, 8)
    )
    sqls["q368_ljung_box_residuals"] = f"""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   round(sum(o_totalprice), 2) AS rev
            FROM orders GROUP BY 1
        ), dow AS (
            SELECT dayofweek(day) AS dwk, avg(rev) AS sm
            FROM daily GROUP BY 1
        ), resid AS (
            SELECT d.day, d.rev - w.sm AS r
            FROM daily d JOIN dow w ON w.dwk = dayofweek(d.day)
        ), mu AS (
            SELECT count(*) AS n, avg(r) AS mu FROM resid
        ), base AS (
            SELECT max(m.n) AS n, max(m.mu) AS mu,
                   sum((r.r - m.mu) * (r.r - m.mu)) AS ss
            FROM resid r, mu m
        ), terms AS ({_lb_lags})
        SELECT lag, autocorr,
               round(n * (n + 2) * sum(term)
                     OVER (ORDER BY lag ROWS UNBOUNDED PRECEDING), 6)
                   AS ljung_box_q
        FROM terms
    """
    sqls["q369_pinball_quantile_backtest"] = """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
            FROM events GROUP BY 1, 2
        ), train AS (
            SELECT * FROM daily WHERE day < DATE '2024-01-25'
        ), test AS (
            SELECT * FROM daily WHERE day >= DATE '2024-01-25'
        ), model AS (
            SELECT event_type, dayofweek(day) AS dw,
                   quantile_cont(n, 0.5) AS q50,
                   quantile_cont(n, 0.9) AS q90
            FROM train GROUP BY 1, 2
        ), scored AS (
            SELECT t.event_type, 0.5 AS tau,
                   greatest(0.5 * (t.n - m.q50),
                            (0.5 - 1) * (t.n - m.q50)) AS loss,
                   CASE WHEN t.n <= m.q50 THEN 1 ELSE 0 END AS cov
            FROM test t JOIN model m
              ON m.event_type = t.event_type AND m.dw = dayofweek(t.day)
            UNION ALL
            SELECT t.event_type, 0.9,
                   greatest(0.9 * (t.n - m.q90),
                            (0.9 - 1) * (t.n - m.q90)),
                   CASE WHEN t.n <= m.q90 THEN 1 ELSE 0 END
            FROM test t JOIN model m
              ON m.event_type = t.event_type AND m.dw = dayofweek(t.day)
        )
        SELECT event_type, tau, count(*) AS n_days,
               floor(CAST(sum(CAST(round(loss * 100) AS BIGINT)) AS DOUBLE)
                     * 1e6 / (count(*) * 100) + 0.5) / 1e6
                   AS mean_pinball_loss,
               floor(CAST(sum(cov) AS DOUBLE) * 1e6 / count(*) + 0.5) / 1e6
                   AS empirical_coverage
        FROM scored GROUP BY 1, 2
    """
    sqls["q370_ranker_agreement"] = """
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        ni AS (SELECT l_partkey, count(*) AS n FROM li GROUP BY 1),
        co AS (
            SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
                   count(*) AS c
            FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                               AND a.l_partkey != b.l_partkey
            GROUP BY 1, 2
        ), top_items AS (
            SELECT l_partkey AS item_a, n AS na FROM ni
            ORDER BY n DESC, l_partkey LIMIT 10
        ), cand AS (
            SELECT c.item_a, c.item_b,
                   round(c.c / sqrt(t.na * nb.n), 9) AS sim, nb.n AS nb
            FROM co c
            JOIN top_items t ON t.item_a = c.item_a
            JOIN ni nb ON nb.l_partkey = c.item_b
        ), top10 AS (
            SELECT item_a, item_b, sim, nb FROM (
                SELECT item_a, item_b, sim, nb,
                       row_number() OVER (PARTITION BY item_a
                                          ORDER BY sim DESC, item_b) AS r
                FROM cand) WHERE r <= 10
        ), pairs AS (
            SELECT a.item_a, a.sim AS s1, a.nb AS p1,
                   b.sim AS s2, b.nb AS p2
            FROM top10 a JOIN top10 b
              ON a.item_a = b.item_a AND a.item_b < b.item_b
        )
        SELECT item_a, count(*) AS n_pairs,
               floor((sum(sign(s1 - s2) * sign(CAST(p1 - p2 AS DOUBLE)))
                      / count(*)) * 1e6 + 0.5) / 1e6
                   AS kendall_tau_sim_vs_popularity
        FROM pairs GROUP BY 1
    """
    import math as _math

    _bloom_sqls = []
    for _tbl, _col in [
        ("lineitem", "l_partkey"),
        ("lineitem", "l_suppkey"),
        ("orders", "o_custkey"),
    ]:
        for _fpr in (0.01, 0.001):
            _bpk = -_math.log(_fpr) / (_math.log(2) ** 2)
            _nh = round(_bpk * _math.log(2), 2)
            _bloom_sqls.append(f"""
                SELECT '{_tbl}.{_col}' AS key, ndv,
                       {_fpr!r} AS target_fpr,
                       CAST(ceil(ndv * {_bpk!r}) AS BIGINT) AS filter_bits,
                       {_nh!r} AS n_hashes,
                       floor((ndv * {_bpk!r} / 8 / 1024.0) * 1e2 + 0.5) / 1e2 AS filter_kib
                FROM (SELECT count(DISTINCT {_col}) AS ndv FROM {_tbl})
            """)
    sqls["q371_bloom_size_planner"] = " UNION ALL ".join(_bloom_sqls)
    sqls["q372_erasure_impact_audit"] = """
        WITH per_user AS (
            SELECT user_id, count(*) AS n FROM events GROUP BY 1
        ), cut AS (
            SELECT quantile_cont(n, 0.99) AS p99 FROM per_user
        ), heavy AS (
            SELECT user_id FROM per_user, cut WHERE n > p99
        ), flagged AS (
            SELECT CAST(ts AS DATE) AS day,
                   CASE WHEN h.user_id IS NOT NULL THEN 1 ELSE 0 END
                       AS del
            FROM events e LEFT JOIN heavy h ON h.user_id = e.user_id
        ), per_day AS (
            SELECT day, count(*) AS rows_, sum(del) AS del_rows
            FROM flagged GROUP BY 1
        )
        SELECT CAST(sum(del_rows) AS BIGINT) AS rows_deleted,
               CAST(sum(CASE WHEN del_rows > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS partitions_touched,
               count(*) AS partitions_total,
               CAST(sum(CASE WHEN del_rows > 0 THEN rows_ ELSE 0 END)
                    AS BIGINT) AS rows_rewritten,
               CASE WHEN sum(del_rows) > 0
                    THEN floor((CAST(sum(CASE WHEN del_rows > 0
                                             THEN rows_ ELSE 0 END)
                                     AS DOUBLE) / sum(del_rows))
                               * 1e6 + 0.5) / 1e6
               END AS rewrite_amplification
        FROM per_day
    """
    sqls["q373_price_indices"] = """
        WITH per_part AS (
            SELECT l_partkey,
                   sum(CASE WHEN l_shipdate < TIMESTAMP '1998-01-01'
                            THEN l_quantity END) AS q0,
                   sum(CASE WHEN l_shipdate < TIMESTAMP '1998-01-01'
                            THEN l_extendedprice END) AS v0,
                   sum(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01'
                            THEN l_quantity END) AS q1,
                   sum(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01'
                            THEN l_extendedprice END) AS v1
            FROM lineitem GROUP BY 1
        ), priced AS (
            SELECT v0 / q0 AS p0, v1 / q1 AS p1, q0, q1
            FROM per_part
            WHERE q0 IS NOT NULL AND q1 IS NOT NULL AND q0 > 0 AND q1 > 0
        ), agg AS (
            SELECT count(*) AS n_parts,
                   sum(p1 * q0) / sum(p0 * q0) AS lasp,
                   sum(p1 * q1) / sum(p0 * q1) AS paas
            FROM priced
        )
        SELECT n_parts, round(lasp, 6) AS laspeyres,
               round(paas, 6) AS paasche,
               round(sqrt(lasp * paas), 6) AS fisher
        FROM agg
    """
    sqls["q374_peak_concurrency"] = """
        WITH flagged AS (
            SELECT user_id, epoch(ts) AS t,
                   CASE WHEN lag(epoch(ts)) OVER w IS NULL
                             OR epoch(ts) - lag(epoch(ts)) OVER w >= 1800
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY t
                                    ROWS UNBOUNDED PRECEDING) AS sid,
                   t
            FROM flagged
        ), sessions AS (
            SELECT user_id, sid, min(t) AS s, max(t) AS e
            FROM sess GROUP BY 1, 2
        ), boundaries AS (
            SELECT s AS t, 1 AS d FROM sessions
            UNION ALL
            SELECT e + 1 AS t, -1 AS d FROM sessions
        ), swept AS (
            SELECT CAST(to_timestamp(t) AS DATE) AS day,
                   sum(d) OVER (PARTITION BY CAST(to_timestamp(t) AS DATE)
                                ORDER BY t, d DESC
                                ROWS UNBOUNDED PRECEDING) AS live
            FROM boundaries
        )
        SELECT strftime(day, '%Y-%m-%d') AS day,
               CAST(max(live) AS BIGINT) AS peak_concurrent_sessions
        FROM swept GROUP BY 1
    """
    sqls["q375_order_reconciliation"] = """
        WITH derived AS (
            SELECT l_orderkey,
                   sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))
                       AS derived
            FROM lineitem GROUP BY 1
        ), joined AS (
            SELECT o.o_totalprice, coalesce(d.derived, 0.0) AS derived
            FROM orders o LEFT JOIN derived d
              ON d.l_orderkey = o.o_orderkey
        ), tot AS (SELECT count(*) AS n FROM orders),
        bucketed AS (
            SELECT abs(derived - o_totalprice) / o_totalprice AS rel,
                   CASE WHEN abs(derived - o_totalprice) / o_totalprice
                             < 0.0001 THEN 'exact_1e-4'
                        WHEN abs(derived - o_totalprice) / o_totalprice
                             < 0.01 THEN 'lt_1pct'
                        WHEN abs(derived - o_totalprice) / o_totalprice
                             < 0.10 THEN 'lt_10pct'
                        ELSE 'gte_10pct' END AS mismatch_bucket
            FROM joined
        )
        SELECT mismatch_bucket, count(*) AS n_orders,
               floor(CAST(count(*) AS DOUBLE) * 1e6 / (SELECT n FROM tot)
                     + 0.5) / 1e6 AS share,
               round(avg(rel), 6) AS avg_rel_error
        FROM bucketed GROUP BY 1
    """
    sqls["q376_entry_bounce_rate"] = """
        WITH flagged AS (
            SELECT user_id, event_type, ts, event_id,
                   CASE WHEN lag(epoch(ts)) OVER w IS NULL
                             OR epoch(ts) - lag(epoch(ts)) OVER w >= 1800
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, event_type, ts, event_id,
                   sum(new_s) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM flagged
        ), per_session AS (
            SELECT user_id, sid,
                   max(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
                   count(*) AS len
            FROM (SELECT *,
                         row_number() OVER (PARTITION BY user_id, sid
                                            ORDER BY ts, event_id) AS rn
                  FROM sess)
            GROUP BY 1, 2
        )
        SELECT entry_type, count(*) AS n_sessions,
               floor(CAST(sum(CASE WHEN len = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                     * 1e6 / count(*) + 0.5) / 1e6 AS bounce_rate,
               floor(CAST(sum(len) AS DOUBLE) * 1e6 / count(*) + 0.5) / 1e6
                   AS avg_session_events
        FROM per_session GROUP BY 1
    """
    sqls["q377_capture_recapture"] = """
        WITH users AS (SELECT DISTINCT user_id FROM events),
        marked AS (
            SELECT CASE WHEN CAST('0x' || substring(
                                md5('c1|' || CAST(user_id AS VARCHAR)),
                                1, 8) AS BIGINT) % 100 < 20
                        THEN 1 ELSE 0 END AS c1,
                   CASE WHEN CAST('0x' || substring(
                                md5('c2|' || CAST(user_id AS VARCHAR)),
                                1, 8) AS BIGINT) % 100 < 20
                        THEN 1 ELSE 0 END AS c2
            FROM users
        )
        SELECT count(*) AS true_population,
               CAST(sum(c1) AS BIGINT) AS n_capture1,
               CAST(sum(c2) AS BIGINT) AS n_capture2,
               CAST(sum(c1 * c2) AS BIGINT) AS n_recaptured,
               CASE WHEN sum(c1 * c2) > 0
                    THEN floor((sum(c1) * sum(c2)
                                / CAST(sum(c1 * c2) AS DOUBLE))
                               * 1e2 + 0.5) / 1e2
               END AS lincoln_petersen_estimate
        FROM marked
    """
    sqls["q378_asof_feature_matrix"] = """
        WITH per_user AS (
            SELECT user_id,
                   sum(CASE WHEN ts >= TIMESTAMP '2024-01-18'
                             AND ts < TIMESTAMP '2024-01-25'
                            THEN 1 ELSE 0 END) AS n7,
                   sum(CASE WHEN ts >= TIMESTAMP '2024-01-11'
                             AND ts < TIMESTAMP '2024-01-25'
                            THEN 1 ELSE 0 END) AS n14,
                   round(sum(CASE WHEN ts >= TIMESTAMP '2024-01-18'
                                   AND ts < TIMESTAMP '2024-01-25'
                                   AND event_type = 'purchase'
                                  THEN value ELSE 0.0 END), 2) AS v7,
                   max(CASE WHEN ts >= TIMESTAMP '2024-01-25'
                             AND event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS label
            FROM events GROUP BY 1
        )
        SELECT label,
               CASE WHEN n7 = 0 THEN 'inactive_7d'
                    WHEN n7 < 5 THEN 'low'
                    WHEN n7 < 15 THEN 'mid'
                    ELSE 'high' END AS activity_band,
               count(*) AS n_users,
               floor(CAST(sum(n14) AS DOUBLE) * 1e6 / count(*) + 0.5) / 1e6
                   AS avg_n14,
               floor(CAST(sum(CAST(round(v7 * 100) AS BIGINT)) AS DOUBLE)
                     * 1e6 / (count(*) * 100) + 0.5) / 1e6
                   AS avg_purchase_value_7d
        FROM per_user GROUP BY 1, 2
    """
    sqls["q295_cbo_estimation_audit"] = """
        WITH so AS (
            SELECT count(*) AS n, count(DISTINCT o_custkey) AS d FROM orders
        ), sc AS (
            SELECT count(*) AS n, count(DISTINCT c_custkey) AS d FROM customer
        ), sl AS (
            SELECT count(*) AS n, count(DISTINCT l_partkey) AS d FROM lineitem
        ), sp AS (
            SELECT count(*) AS n, count(DISTINCT p_partkey) AS d FROM part
        ), j1 AS (
            SELECT count(*) AS a FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
        ), j2 AS (
            SELECT count(*) AS a FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
        ), f1 AS (
            SELECT count(*) AS n,
                   avg(CASE WHEN l_discount > 0.05 THEN 1.0 ELSE 0.0 END) AS s1,
                   avg(CASE WHEN l_quantity < 25 THEN 1.0 ELSE 0.0 END) AS s2,
                   count(*) FILTER (l_discount > 0.05 AND l_quantity < 25) AS a
            FROM lineitem
        ), f2 AS (
            SELECT count(*) AS n,
                   avg(CASE WHEN o_orderpriority = '1-URGENT'
                            THEN 1.0 ELSE 0.0 END) AS s1,
                   avg(CASE WHEN o_totalprice > 100000
                            THEN 1.0 ELSE 0.0 END) AS s2,
                   count(*) FILTER (o_orderpriority = '1-URGENT'
                                    AND o_totalprice > 100000) AS a
            FROM orders
        ), cases AS (
            SELECT 'join_orders_customer' AS case_name,
                   floor((CAST(so.n AS DOUBLE) * sc.n / greatest(so.d, sc.d)) * 1e2 + 0.5)
                       / 1e2 AS est_rows,
                   j1.a AS actual_rows
            FROM so, sc, j1
            UNION ALL
            SELECT 'join_lineitem_part',
                   floor((CAST(sl.n AS DOUBLE) * sp.n / greatest(sl.d, sp.d)) * 1e2 + 0.5)
                       / 1e2, j2.a
            FROM sl, sp, j2
            UNION ALL
            SELECT 'conj_lineitem_disc_qty',
                   floor(n * s1 * s2 * 1e2 + 0.5) / 1e2, a FROM f1
            UNION ALL
            SELECT 'conj_orders_prio_price',
                   floor(n * s1 * s2 * 1e2 + 0.5) / 1e2, a FROM f2
        )
        SELECT case_name, est_rows, actual_rows,
               floor((est_rows / actual_rows) * 1e4 + 0.5) / 1e4 AS est_ratio
        FROM cases
    """
    sqls["q296_audience_overlap"] = """
        WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
        sizes AS (SELECT event_type, count(*) AS n FROM tu GROUP BY 1),
        inter AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   count(*) AS n_common
            FROM tu a JOIN tu b ON a.user_id = b.user_id
                               AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_common,
               floor((CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common)) * 1e6 + 0.5) / 1e6 AS jaccard
        FROM inter
        JOIN sizes sa ON sa.event_type = type_a
        JOIN sizes sb ON sb.event_type = type_b
    """
    sqls["q297_k_anonymity_audit"] = """
        WITH groups AS (
            SELECT count(*) AS gs
            FROM customer
            GROUP BY c_nationkey, c_mktsegment, floor(c_acctbal / 1000)
        ), ks AS (SELECT CAST(unnest([2, 5, 10]) AS INT) AS k)
        SELECT k, count(*) AS n_groups,
               CAST(sum(CASE WHEN gs < k THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_groups_below_k,
               CAST(sum(CASE WHEN gs < k THEN gs ELSE 0 END) AS BIGINT)
                   AS n_rows_at_risk
        FROM groups, ks GROUP BY 1
    """
    sqls["q298_dp_noisy_counts"] = """
        WITH cnt AS (
            SELECT n.n_name, count(*) AS true_count
            FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
            GROUP BY 1
        ), noise AS (
            SELECT n_name, true_count,
                   CAST('0x' || substring(md5(n_name || '-dp1'), 1, 8) AS BIGINT)
                       / 4294967296.0 - 0.5 AS centered
            FROM cnt
        )
        SELECT n_name, true_count,
               round(true_count
                     + (-sign(centered) * ln(1 - 2 * abs(centered))),
                     4) AS noisy_count,
               round(abs(-sign(centered) * ln(1 - 2 * abs(centered))),
                     4) AS abs_noise
        FROM noise
    """
    sqls["q299_lsh_scurve_planner"] = """
        WITH cfg AS (
            SELECT * FROM (VALUES (4, 8), (8, 4), (16, 2), (16, 8), (32, 4))
                AS t(b, r)
        ), sg AS (
            SELECT CAST(unnest(range(1, 10)) AS INT) / 10.0 AS s
        )
        SELECT b, r, s,
               round(1 - power(1 - power(s, r), b), 6) AS p_candidate,
               round(power(1.0 / b, 1.0 / r), 4) AS est_threshold
        FROM cfg, sg
    """
    sqls["q300_feature_store_materialization"] = """
        WITH wide AS (
            SELECT r.r_name, o.o_orderkey, o.o_totalprice, c.c_acctbal,
                   n.n_name, isodow(o.o_orderdate) - 1 AS dow
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
        )
        SELECT r_name, count(*) AS n_rows,
               bit_xor(CAST('0x' || substring(
                   md5(o_orderkey || '|' || n_name || '|'
                       || CAST(round(o_totalprice * 100) AS BIGINT)
                       || '|' || dow), 1, 8) AS BIGINT)) AS content_checksum32,
               round(sum(o_totalprice), 2) AS sum_price,
               round(sum(c_acctbal), 2) AS sum_acctbal
        FROM wide GROUP BY 1
    """
    sqls["q289_partial_agg_merge"] = """
        SELECT event_type,
               count(DISTINCT date_trunc('day', ts)) AS n_partials,
               count(*) AS n_rows,
               round(avg(value), 6) AS mean_value,
               round(var_pop(value), 4) AS var_pop_value
        FROM events GROUP BY 1
    """
    sqls["q290_median_ci_order_stats"] = """
        WITH cnt AS (
            SELECT o_orderpriority, count(*) AS n,
                   CAST(floor((count(*) - 1.959964 * sqrt(count(*))) / 2)
                        AS BIGINT) AS lo,
                   CAST(ceil((count(*) + 1.959964 * sqrt(count(*))) / 2)
                        AS BIGINT) + 1 AS hi
            FROM orders GROUP BY 1
        ), ranked AS (
            SELECT o_orderpriority, o_totalprice,
                   row_number() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice, o_orderkey) AS rk
            FROM orders
        ), med AS (
            SELECT o_orderpriority,
                   round(quantile_cont(o_totalprice, 0.5), 4) AS median_value
            FROM orders GROUP BY 1
        )
        SELECT cnt.o_orderpriority, cnt.n AS n_orders,
               round(max(CASE WHEN rk = lo THEN o_totalprice END), 2) AS ci_lo,
               any_value(med.median_value) AS median_value,
               round(max(CASE WHEN rk = hi THEN o_totalprice END), 2) AS ci_hi
        FROM ranked
        JOIN cnt USING (o_orderpriority)
        JOIN med USING (o_orderpriority)
        WHERE rk = lo OR rk = hi
        GROUP BY 1, 2
    """
    sqls["q291_target_encoding_loo"] = """
        WITH prior AS (SELECT avg(o_totalprice) AS p FROM orders),
        g AS (
            SELECT o_orderpriority, count(*) AS n, sum(o_totalprice) AS s,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sc,
                   min(o_totalprice) AS mn, max(o_totalprice) AS mx
            FROM orders GROUP BY 1
        )
        SELECT o_orderpriority, n,
               round((s + p * 20) / (n + 20), 4) AS smoothed_encoding,
               floor(CAST(sc - CAST(round(mx * 100) AS BIGINT) AS DOUBLE)
                     * 1e4 / ((n - 1) * 100) + 0.5) / 1e4 AS loo_min,
               floor(CAST(sc - CAST(round(mn * 100) AS BIGINT) AS DOUBLE)
                     * 1e4 / ((n - 1) * 100) + 0.5) / 1e4 AS loo_max
        FROM g, prior
    """
    sqls["q292_stream_state_sizing"] = """
        WITH widths AS (
            SELECT CAST(unnest([60, 300, 3600]) AS INT) AS width_s
        ), per_win AS (
            SELECT width_s, floor(epoch(ts) / width_s) AS win,
                   count(DISTINCT user_id) AS keys
            FROM events, widths GROUP BY 1, 2
        )
        SELECT width_s, count(*) AS n_windows,
               CAST(sum(keys) AS BIGINT) AS total_keys,
               max(keys) AS peak_keys,
               round(max(keys) * 48 / 1024.0, 4) AS peak_state_kb
        FROM per_win GROUP BY 1
    """
    sqls["q293_srm_guardrail"] = """
        WITH u AS (SELECT DISTINCT user_id FROM events),
        cells AS (
            SELECT count(*) AS n_users,
                   count(*) FILTER (user_id % 2 = 0) AS n_arm0,
                   count(*) FILTER (user_id % 2 <> 0) AS n_arm1
            FROM u
        )
        SELECT n_users, n_arm0, n_arm1,
               round(power(n_arm0 - n_users / 2.0, 2) / (n_users / 2.0)
                     + power(n_arm1 - n_users / 2.0, 2) / (n_users / 2.0),
                     6) AS chi2,
               (power(n_arm0 - n_users / 2.0, 2) / (n_users / 2.0)
                + power(n_arm1 - n_users / 2.0, 2) / (n_users / 2.0))
               < 3.841459 AS srm_pass
        FROM cells
    """
    sqls["q294_schema_contract_audit"] = """
        SELECT * FROM (VALUES
            ('orders', 'o_orderkey', 'ok', 'bigint', 'bigint'),
            ('orders', 'o_custkey', 'ok', 'bigint', 'bigint'),
            ('orders', 'o_totalprice', 'ok', 'double', 'double'),
            ('orders', 'o_orderdate', 'ok', 'timestamp_ntz', 'timestamp_ntz'),
            ('orders', 'o_shipmode', 'missing', 'string', NULL),
            ('orders', 'o_orderpriority', 'unexpected', NULL, 'string'),
            ('orders', 'o_orderstatus', 'unexpected', NULL, 'string'),
            ('events', 'event_id', 'ok', 'bigint', 'bigint'),
            ('events', 'ts', 'ok', 'timestamp_ntz', 'timestamp_ntz'),
            ('events', 'user_id', 'type_mismatch', 'string', 'bigint'),
            ('events', 'value', 'ok', 'double', 'double'),
            ('events', 'event_type', 'unexpected', NULL, 'string'),
            ('events', 'props', 'unexpected', NULL, 'string')
        ) AS t(table_name, column_name, status, expected_type, actual_type)
    """
    sqls["q283_dq_scorecard"] = """
        WITH o AS (
            SELECT count(*) AS n,
                   count(*) FILTER (o_totalprice <= 0) AS c1,
                   count(*) FILTER (o_custkey IS NULL) AS c2
            FROM orders
        ), li AS (
            SELECT count(*) AS n,
                   count(*) FILTER (l_discount NOT BETWEEN 0 AND 1) AS c1,
                   count(*) FILTER (l_quantity <= 0) AS c2
            FROM lineitem
        ), ev AS (
            SELECT count(*) AS n,
                   count(*) FILTER (value < 0) AS c1,
                   count(*) FILTER (props NOT LIKE '{%') AS c2
            FROM events
        ), c AS (
            SELECT count(*) AS n,
                   count(*) FILTER (c_acctbal IS NULL) AS c1
            FROM customer
        )
        SELECT 'orders' AS table_name, 'nonpositive_price' AS check_name,
               n AS n_checked, c1 AS n_violations FROM o
        UNION ALL SELECT 'orders', 'null_custkey', n, c2 FROM o
        UNION ALL SELECT 'lineitem', 'discount_out_of_range', n, c1 FROM li
        UNION ALL SELECT 'lineitem', 'nonpositive_qty', n, c2 FROM li
        UNION ALL SELECT 'events', 'negative_value', n, c1 FROM ev
        UNION ALL SELECT 'events', 'malformed_props', n, c2 FROM ev
        UNION ALL SELECT 'customer', 'null_acctbal', n, c1 FROM c
    """
    sqls["q284_topk_plus_other"] = """
        WITH rev AS (
            SELECT r.r_name, p.p_brand,
                   sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                            AS BIGINT)) AS rv
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY 1, 2
        ), labeled AS (
            SELECT r_name,
                   CASE WHEN row_number() OVER (PARTITION BY r_name
                                                ORDER BY rv DESC, p_brand) <= 3
                        THEN p_brand ELSE 'OTHER' END AS brand_label,
                   rv
            FROM rev
        )
        SELECT r_name, brand_label, count(*) AS n_brands,
               floor(CAST(sum(rv) AS DOUBLE) * 1e2 / 10000 + 0.5) / 1e2 AS revenue
        FROM labeled GROUP BY 1, 2
    """
    sqls["q285_hist2d_grouping_sets"] = """
        WITH b AS (
            SELECT CAST(floor(l_quantity / 10) AS INT) AS qb,
                   CAST(floor(l_extendedprice / 10000) AS INT) AS pb,
                   CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS rev
            FROM lineitem
        )
        SELECT CASE WHEN grouping(qb) = 1 THEN -1 ELSE qb END AS qb,
               CASE WHEN grouping(pb) = 1 THEN -1 ELSE pb END AS pb,
               count(*) AS n_rows,
               floor(CAST(sum(rev) AS DOUBLE) * 1e2 / 10000 + 0.5) / 1e2
                   AS revenue
        FROM b GROUP BY GROUPING SETS ((qb, pb), (qb), (pb), ())
    """
    sqls["q286_wilson_ranking"] = """
        WITH agg AS (
            SELECT p.p_brand, count(*) AS n,
                   CAST(count(*) FILTER (l.l_discount > 0.05) AS BIGINT) AS s
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY 1
        )
        SELECT p_brand, n, s,
               floor((CAST(s AS DOUBLE) / n) * 1e6 + 0.5) / 1e6 AS p_hat,
               round(((s * 1.0 / n) + (1.959964 * 1.959964 / n) / 2
                      - 1.959964 * sqrt(((s * 1.0 / n) * (1 - s * 1.0 / n)
                                         + (1.959964 * 1.959964 / n) / 4) / n))
                     / (1 + 1.959964 * 1.959964 / n), 6) AS wilson_lb
        FROM agg
    """
    sqls["q287_forecast_accuracy"] = """
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   CAST(count(*) AS DOUBLE) AS a
            FROM events GROUP BY 1, 2
        ), lagged AS (
            SELECT event_type, a,
                   lag(a, 7) OVER (PARTITION BY event_type ORDER BY day) AS f,
                   lag(a, 1) OVER (PARTITION BY event_type ORDER BY day) AS p
            FROM daily
        )
        SELECT event_type, count(*) AS n_days_scored,
               round(avg(abs(a - f) / a), 6) AS mape,
               round(avg(2 * abs(a - f) / (a + f)), 6) AS smape,
               CASE WHEN sum(CAST(round(abs(a - p)) AS BIGINT)) > 0
                    THEN floor(CAST(sum(CAST(round(abs(a - f)) AS BIGINT))
                                    AS DOUBLE)
                               * 1e6 / sum(CAST(round(abs(a - p)) AS BIGINT))
                               + 0.5) / 1e6
               END AS mase
        FROM lagged WHERE f IS NOT NULL GROUP BY 1
    """
    sqls["q288_late_dim_unknown_member"] = """
        WITH dim AS (
            SELECT c.c_custkey, n.n_name
            FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
            WHERE c.c_custkey % 10 <> 0
        )
        SELECT coalesce(dim.n_name, 'UNKNOWN') AS nation_label,
               count(*) AS n_orders,
               round(sum(o.o_totalprice), 2) AS revenue
        FROM orders o LEFT JOIN dim ON dim.c_custkey = o.o_custkey
        GROUP BY 1
    """
    sqls["q277_ucb1_arm_scores"] = """
        WITH arms AS (
            SELECT event_type, count(*) AS n_pulls, avg(value) AS m
            FROM events GROUP BY 1
        ), tot AS (
            SELECT CAST(sum(n_pulls) AS DOUBLE) AS n FROM arms
        )
        SELECT event_type, n_pulls, round(m, 6) AS mean_reward,
               round(sqrt(2.0 * ln(n) / n_pulls), 6) AS explore_bonus,
               round(m + sqrt(2.0 * ln(n) / n_pulls), 6) AS ucb_score
        FROM arms, tot
    """
    sqls["q278_diff_in_diff"] = """
        SELECT round(avg(value) FILTER (user_id % 2 = 0
                       AND ts < TIMESTAMP '2024-01-15'), 6) AS t_pre,
               round(avg(value) FILTER (user_id % 2 = 0
                       AND ts >= TIMESTAMP '2024-01-15'), 6) AS t_post,
               round(avg(value) FILTER (user_id % 2 <> 0
                       AND ts < TIMESTAMP '2024-01-15'), 6) AS c_pre,
               round(avg(value) FILTER (user_id % 2 <> 0
                       AND ts >= TIMESTAMP '2024-01-15'), 6) AS c_post,
               round((avg(value) FILTER (user_id % 2 = 0
                          AND ts >= TIMESTAMP '2024-01-15')
                      - avg(value) FILTER (user_id % 2 = 0
                          AND ts < TIMESTAMP '2024-01-15'))
                     - (avg(value) FILTER (user_id % 2 <> 0
                          AND ts >= TIMESTAMP '2024-01-15')
                        - avg(value) FILTER (user_id % 2 <> 0
                          AND ts < TIMESTAMP '2024-01-15')), 6) AS did_estimate
        FROM events
    """
    sqls["q279_sparse_cosine_pairs"] = r"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
            FROM documents
        ), tok2 AS (
            SELECT doc_id, w FROM tok WHERE w <> ''
        ), nd AS (
            SELECT CAST(count(*) AS DOUBLE) AS n FROM documents
        ), dfq AS (
            SELECT w, count(*) AS df
            FROM (SELECT DISTINCT doc_id, w FROM tok2) GROUP BY 1
        ), tf AS (
            SELECT doc_id, w, count(*) AS tf
            FROM tok2 WHERE doc_id < 200 GROUP BY 1, 2
        ), wgt AS (
            SELECT tf.doc_id, tf.w, tf.tf * ln(nd.n / dfq.df) AS wt
            FROM tf JOIN dfq USING (w), nd
        ), nrm AS (
            SELECT doc_id, sqrt(sum(wt * wt)) AS nn FROM wgt GROUP BY 1
        ), unitv AS (
            SELECT wgt.doc_id, wgt.w, wgt.wt / nrm.nn AS u
            FROM wgt JOIN nrm USING (doc_id)
        ), pairs AS (
            -- rank on the 9-decimal-rounded cosine: structurally tied
            -- pairs must cut deterministically at the LIMIT boundary
            SELECT a.doc_id AS d1, b.doc_id AS d2,
                   round(sum(a.u * b.u), 9) AS cosv,
                   count(*) AS n_shared_tokens
            FROM unitv a JOIN unitv b ON a.w = b.w AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT d1, d2, round(cosv, 6) AS cosine, n_shared_tokens
        FROM pairs ORDER BY cosv DESC, d1, d2 LIMIT 40
    """
    sqls["q280_rfm_segments"] = """
        WITH mx AS (SELECT max(o_orderdate) AS mxd FROM orders),
        cust AS (
            SELECT o_custkey, max(o_orderdate) AS last_o,
                   count(*) AS f, sum(o_totalprice) AS m
            FROM orders GROUP BY 1
        ), rfm AS (
            SELECT CAST(date_diff('day', CAST(last_o AS DATE),
                                  CAST(mxd AS DATE)) AS DOUBLE) AS r,
                   CAST(f AS DOUBLE) AS fd, m
            FROM cust, mx
        ), th AS (
            SELECT quantile_cont(r, 0.2) AS r1, quantile_cont(r, 0.4) AS r2,
                   quantile_cont(r, 0.6) AS r3, quantile_cont(r, 0.8) AS r4,
                   quantile_cont(fd, 0.2) AS f1, quantile_cont(fd, 0.4) AS f2,
                   quantile_cont(fd, 0.6) AS f3, quantile_cont(fd, 0.8) AS f4,
                   quantile_cont(m, 0.2) AS m1, quantile_cont(m, 0.4) AS m2,
                   quantile_cont(m, 0.6) AS m3, quantile_cont(m, 0.8) AS m4
            FROM rfm
        ), scored AS (
            SELECT 6 - (1 + CASE WHEN r > r1 THEN 1 ELSE 0 END
                          + CASE WHEN r > r2 THEN 1 ELSE 0 END
                          + CASE WHEN r > r3 THEN 1 ELSE 0 END
                          + CASE WHEN r > r4 THEN 1 ELSE 0 END) AS r_score,
                   1 + CASE WHEN fd > f1 THEN 1 ELSE 0 END
                     + CASE WHEN fd > f2 THEN 1 ELSE 0 END
                     + CASE WHEN fd > f3 THEN 1 ELSE 0 END
                     + CASE WHEN fd > f4 THEN 1 ELSE 0 END AS f_score,
                   1 + CASE WHEN m > m1 THEN 1 ELSE 0 END
                     + CASE WHEN m > m2 THEN 1 ELSE 0 END
                     + CASE WHEN m > m3 THEN 1 ELSE 0 END
                     + CASE WHEN m > m4 THEN 1 ELSE 0 END AS m_score,
                   m
            FROM rfm, th
        )
        SELECT r_score, f_score, m_score, count(*) AS n_customers,
               round(sum(m), 2) AS sum_monetary
        FROM scored GROUP BY 1, 2, 3
    """
    _colstat = """
        SELECT '{c}' AS col_name, count(*) AS n_rows,
               count(*) FILTER ({c} IS NULL) AS n_null,
               count(DISTINCT {c}) AS ndv,
               round(min({c}), 4) AS min_v, round(max({c}), 4) AS max_v,
               round(quantile_cont({c}, 0.25), 4) AS p25,
               round(quantile_cont({c}, 0.5), 4) AS p50,
               round(quantile_cont({c}, 0.75), 4) AS p75
        FROM lineitem
    """
    sqls["q281_column_stats_collection"] = " UNION ALL ".join(
        _colstat.format(c=c)
        for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    )
    _z2 = (1.959964 + 0.841621) ** 2
    sqls["q282_ab_power_analysis"] = f"""
        WITH m AS (
            SELECT event_type, count(*) AS n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS s1,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)
                            * CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS s2
            FROM events GROUP BY 1
        ), v AS (
            -- exact-moment mean/variance: the identical IEEE sequence the
            -- Spark side evaluates over exact cent moments
            SELECT event_type, n,
                   CAST(s1 AS DOUBLE) / (100.0 * CAST(n AS DOUBLE)) AS mean,
                   (CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                       / (CAST(n AS DOUBLE) * (n - 1)) / 1e4 AS var
            FROM m
        )
        SELECT event_type, n AS n_obs,
               floor(mean * 1e6 + 0.5) / 1e6 AS mean_value,
               floor(var * 1e4 + 0.5) / 1e4 AS var_value,
               floor(mean * 0.05 * 1e6 + 0.5) / 1e6 AS mde,
               floor(2.0 * var * {_z2!r}
                     / ((mean * 0.05) * (mean * 0.05)) * 1e4 + 0.5) / 1e4
                   AS n_per_arm
        FROM v
    """
    sqls["q276_watermark_lateness_audit"] = """
        WITH e AS (
            SELECT event_type, event_id, epoch(ts) AS es FROM events
        ), l AS (
            SELECT event_type,
                   greatest(0.0, coalesce(
                       max(es) OVER (PARTITION BY event_type ORDER BY event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING) - es,
                       0.0)) AS late
            FROM e
        )
        SELECT event_type,
               count(*) FILTER (late <= 0) AS n_ontime,
               count(*) FILTER (late > 0 AND late <= 60) AS n_within_1m,
               count(*) FILTER (late > 60 AND late <= 3600) AS n_within_1h,
               count(*) FILTER (late > 3600) AS n_over_1h,
               round(max(late), 6) AS max_lateness_sec
        FROM l GROUP BY 1
    """
    return sqls
