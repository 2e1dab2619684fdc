"""Document-level text analysis [EXT]: language-ID, quality scoring, token
counting, fingerprinting — over the ``documents`` table shape
(doc_id, text, lang, source, n_chars).

All column expressions come from ``functions.text`` (pure built-ins); this
module assembles them into DataFrame operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hubverse_transform_spark.functions.text import (
    alpha_ratio,
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id_expr,
    punct_ratio,
    quality_score,
    stopword_ratio,
    whitespace_token_count,
)


def annotate_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis column set to a documents DataFrame.

    One projection — Catalyst fuses all metrics into a single codegen stage
    over the scan.
    """
    t = F.col(text_col)
    return df.select(
        "*",
        F.length(t).alias("char_count"),
        whitespace_token_count(t).alias("ws_tokens"),
        bpe_ish_token_count(t).alias("bpe_tokens"),
        F.round(alpha_ratio(t), 6).alias("alpha_ratio"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        lang_id_expr(t).alias("lang_guess"),
        doc_fingerprint(t).alias("fingerprint"),
    )


def corpus_quality_summary(df: DataFrame, text_col: str = "text", group_col: str = "lang") -> DataFrame:
    """Per-group corpus statistics (the 'is this slice worth training on'
    query): doc counts, token totals, mean quality."""
    annotated = annotate_documents(df, text_col)
    return (
        annotated.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("ws_tokens").alias("total_tokens"),
            F.round(F.avg("char_count"), 4).alias("avg_chars"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    query_filter=None,
) -> DataFrame:
    """Top-k TF-IDF terms per document: tf(doc, term) * ln(N / df(term)).

    Whitespace tokenization (lowercased, trimmed — same convention as the
    dedup shingle family). Document frequency and N come from the FULL
    corpus; ``query_filter`` (a Column predicate) restricts only which
    documents get ranked output, not the statistics.

    Scale shape: the corpus-wide side is two hash aggregations over the
    exploded token stream (tf keyed by (doc, term), df keyed by term —
    both map-side-combinable); the query side is a small tf slice joined to
    the term-keyed df table. The scalar N rides in as a 1-row broadcast
    cross join, and the small query-side tf is broadcast into the df join,
    so only the two aggregations shuffle the full token stream.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))

    tf_q = tf.filter(query_filter) if query_filter is not None else tf
    scored = (
        dfreq.join(F.broadcast(tf_q), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            (F.col("tf").cast("double") * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double"))).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", F.round("score", 6).alias("tfidf"), "rank")
    )
