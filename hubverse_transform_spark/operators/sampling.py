"""Deterministic sampling [EXT] for training-data curation: hash-fraction
sampling (scale path, pure filter) and exact-k stratified sampling
(window path). Both are reproducible across runs and engines — the sample
is a pure function of the row key, never of RNG state or partitioning,
which is what makes downstream dedup/eval splits auditable.

``rand(seed)`` / ``df.sample`` are partitioning-dependent in Spark and not
reproducible in a SQL oracle; md5-keyed selection is (DuckDB computes the
identical digest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# md5 prefix of 8 hex chars -> uniform 32-bit integer
_HASH_SPACE = float(1 << 32)


def hash_uniform(key: F.Column) -> F.Column:
    """Map an arbitrary string column to a deterministic uniform [0,1) double
    via the first 8 hex chars of its md5 digest."""
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double") / F.lit(_HASH_SPACE)


def hash_fraction_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash.

    Scale path: a pure filter — no shuffle, no state, pushes through any
    partitioning, and the same row set survives at any cluster size or data
    layout. Consistent across tables too: sampling two tables by the same
    join key keeps referential integrity (the TPC-H-join-preserving trick).
    """
    return df.filter(hash_uniform(F.col(key_col).cast("string")) < fraction)


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: tuple[tuple[str, float], ...] = (("train", 0.8), ("val", 0.1), ("test", 0.1)),
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row's split is a pure
    function of ``md5(key)``, so the partition is stable under re-runs,
    re-partitioning, data growth, and engine choice — the property an
    auditable eval split needs (a ``rand()`` split is none of these).

    Scale path: a stateless projection — no shuffle, no coordination; rows
    can be split during ingest. Bucketing compares the first 8 md5 hex chars
    against precomputed hex thresholds: fixed-width lowercase hex compares
    lexicographically exactly as the 32-bit integer it encodes, so a SQL
    oracle reproduces the assignment with plain string comparison (no
    hex->int conversion drift).
    """
    fracs = [f for _, f in splits]
    if abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {sum(fracs)}")
    u = F.substring(F.md5(F.col(key_col).cast("string")), 1, 8)
    expr = None
    for name, thresh in split_thresholds(splits):
        cond = u < F.lit(thresh)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = expr.otherwise(splits[-1][0]) if expr is not None else F.lit(splits[-1][0])
    return df.withColumn(out_col, expr)


def split_thresholds(
    splits: tuple[tuple[str, float], ...],
) -> list[tuple[str, str]]:
    """(name, 8-hex-char cumulative threshold) for every split but the last
    (which takes the remainder). Shared with the SQL oracle so both engines
    bucket on byte-identical constants."""
    out, cum = [], 0.0
    for name, frac in splits[:-1]:
        cum += frac
        out.append((name, format(int(cum * (1 << 32)), "08x")))
    return out


def proportional_allocation_sample(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    key_col: str,
    total_k: int,
) -> DataFrame:
    """Weight-proportional sample allocation: stratum ``s`` gets
    ``floor(total_k * weight(s) / total_weight)`` sample slots (integer
    arithmetic — exact and engine-portable, no float division), filled by
    md5-rank within the stratum. The curation move behind "sample 1M docs,
    proportional to each source's token mass".

    Two aggregations over the stratum key (weights, then the rank filter's
    window) plus one broadcast join of the tiny per-stratum allocation table
    — the big table shuffles once. Integer weights required (token/char
    counts are); ``weight_col`` sums must stay within int64.
    """
    weights = df.groupBy(strata_col).agg(F.sum(weight_col).alias("_w"))
    total = weights.agg(F.sum("_w").alias("_tw"))
    alloc = weights.crossJoin(F.broadcast(total)).select(
        strata_col,
        F.expr(f"({total_k} * _w) div _tw").alias("_alloc"),
    )
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    ranked = df.withColumn("sample_rank", F.row_number().over(w))
    return ranked.join(F.broadcast(alloc), strata_col).filter(
        F.col("sample_rank") <= F.col("_alloc")
    ).drop("_alloc")


def stratified_sample_exact(
    df: DataFrame, strata_col: str, key_col: str, k: int
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, deterministically ranked
    by key digest (a reproducible 'random' order).

    Window path: one shuffle on the stratum key. For 100 TB corpora with
    few strata prefer ``hash_fraction_sample`` (no shuffle) unless exact
    per-stratum counts are required; for heavy strata the sort is the cost
    — rank by digest so the sort key is uncorrelated with ingest order.
    Adds a ``sample_rank`` column (1..k within each stratum).
    """
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def per_group_cap(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    cap: int,
) -> DataFrame:
    """Per-domain quota capping [EXT]: keep at most ``cap`` rows per group,
    preferring rows by ``order_cols`` (callers must include a unique
    tiebreak key so the kept set is deterministic). This is the standard
    curation guard against a single domain dominating a training mix
    (C4/RefinedWeb cap documents per registered domain).

    One window shuffle partitioned BY THE GROUP — no global sort; a hot
    domain concentrates on one reducer only up to its own row count, which
    is exactly the work that domain requires. Adds ``_rank`` then filters;
    the projection drops the helper column.
    """
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= cap)
        .drop("_rank")
    )


def dsir_log_weights(
    df: DataFrame,
    target_pred,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 1024,
) -> DataFrame:
    """DSIR-style importance weights [EXT] (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every document by
    how much more likely its tokens are under a TARGET distribution (rows
    matching ``target_pred``) than under the RAW corpus distribution, using
    hashed unigram features — the standard cheap proxy for "select raw data
    that looks like the target domain" before pretraining.

    Both distributions are add-one-smoothed over ``num_buckets`` md5-hashed
    buckets (cross-engine deterministic — no RNG, no engine hash). Per doc:
    avg_token_logratio = (Σ_tokens ln(p_target(b)/p_raw(b))) / n_tokens —
    length-normalized so long documents don't dominate the resampling key.

    Scale shape: one token explode → bucket counts (B rows, broadcast back),
    then the token stream joins the B-row ratio table map-side and folds per
    document. Two data-sized hash aggregations, zero windows, zero UDFs; the
    bucket table is O(num_buckets) regardless of corpus size.
    """
    toks = df.select(
        F.col(id_col),
        target_pred.alias("_is_target"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("_w"),
    ).filter(F.col("_w") != "")
    bucketed = toks.select(
        id_col,
        "_is_target",
        (
            F.conv(F.substring(F.md5("_w"), 1, 4), 16, 10).cast("long")
            % num_buckets
        ).alias("_b"),
    )
    counts = bucketed.groupBy("_b").agg(
        F.count(F.lit(1)).alias("_r"),
        F.count(F.when(F.col("_is_target"), 1)).alias("_t"),
    )
    totals = counts.agg(
        F.sum("_r").alias("_R"), F.sum("_t").alias("_T")
    )
    ratios = counts.crossJoin(F.broadcast(totals)).select(
        "_b",
        (
            F.log((F.col("_t") + 1.0) / (F.col("_T") + F.lit(float(num_buckets))))
            - F.log((F.col("_r") + 1.0) / (F.col("_R") + F.lit(float(num_buckets))))
        ).alias("_lr"),
    )
    return (
        bucketed.join(F.broadcast(ratios), "_b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("_lr") / F.count(F.lit(1))).alias("avg_token_logratio"),
        )
    )
