"""Document-level text analysis [EXT]: language-ID, quality scoring, token
counting, fingerprinting — over the ``documents`` table shape
(doc_id, text, lang, source, n_chars).

All column expressions come from ``functions.text`` (pure built-ins); this
module assembles them into DataFrame operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
