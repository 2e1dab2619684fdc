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


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 keyword search: top-k documents for a bag of query terms.

    idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)   (Lucene's non-negative form)
    score(D) = sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * |D|/avgdl))

    Scale shape: document length |D| is a per-row expression on the scan (no
    shuffle); N and avgdl ride as a 1-row broadcast; the token stream is
    filtered to the query terms BEFORE the (doc, term) aggregation, so the
    only full shuffle carries matching postings. df(t) is a tiny per-term agg
    broadcast back into the postings. Ranking sorts the rounded score so the
    row_number cut is reproducible across engines.
    """
    t = F.col(text_col)
    dl = df.select(F.col(id_col), whitespace_token_count(t).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.col("dl").cast("double")).alias("avgdl")
    )
    toks = df.select(
        F.col(id_col),
        F.explode_outer(F.split(F.lower(F.trim(t)), r"\s+")).alias("term"),
    ).filter(F.col("term").isin(list(query_terms)))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl").cast("double") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    doc_scores = scored.groupBy(id_col).agg(
        F.round(F.sum("s"), 6).alias("bm25"), F.count(F.lit(1)).alias("n_terms_hit")
    )
    # global top-k as sort-limit (TakeOrderedAndProject: per-partition heaps,
    # k rows to the driver stage) — NOT an unpartitioned row_number window,
    # which would funnel every scored document into one partition. The rank
    # column is then a window over just k rows.
    top = doc_scores.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("bm25").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "bm25", "n_terms_hit", "rank"
    )


def pmi_bigrams(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information:
    pmi(x,y) = ln( (c_xy / T_bi) / ((c_x / T_uni) * (c_y / T_uni)) ).

    Bigram occurrences (NOT distinct per doc — PMI needs true frequencies)
    come from one overlapping-match regex pass per document, avoiding the
    O(L²) HOF-inlining trap (see dedup.shingle_ngrams). Three aggregations —
    bigram counts, unigram counts, and the two scalar totals — then two
    broadcast joins of the small unigram table into the bigram table keyed
    on each side of the pair. All counts are exact integers, so the PMI
    ratio is engine-reproducible at 6 decimals.
    """
    t = F.col(text_col)
    norm = F.regexp_replace(F.lower(F.trim(t)), r"\s+", " ")
    uni = df.select(F.explode_outer(F.split(norm, " ")).alias("term")).filter(
        (F.col("term").isNotNull()) & (F.col("term") != "")
    )
    bi = df.select(
        F.explode_outer(
            F.regexp_extract_all(norm, F.lit(r"(?<=^| )(?=(\S+ \S+))"), 1)
        ).alias("bigram")
    ).filter(F.col("bigram").isNotNull())
    cu = uni.groupBy("term").agg(F.count(F.lit(1)).alias("c_term"))
    cb = bi.groupBy("bigram").agg(F.count(F.lit(1)).alias("c_bigram"))
    tot_u = cu.agg(F.sum("c_term").alias("t_uni"))
    tot_b = cb.agg(F.sum("c_bigram").alias("t_bi"))
    lhs = cu.select(F.col("term").alias("x"), F.col("c_term").alias("c_x"))
    rhs = cu.select(F.col("term").alias("y"), F.col("c_term").alias("c_y"))
    scored = (
        cb.filter(F.col("c_bigram") >= min_count)
        .withColumn("x", F.split(F.col("bigram"), " ").getItem(0))
        .withColumn("y", F.split(F.col("bigram"), " ").getItem(1))
        .join(F.broadcast(lhs), "x")
        .join(F.broadcast(rhs), "y")
        .crossJoin(F.broadcast(tot_u))
        .crossJoin(F.broadcast(tot_b))
        .select(
            "bigram",
            "c_bigram",
            F.round(
                F.log(
                    (F.col("c_bigram").cast("double") / F.col("t_bi"))
                    / (
                        (F.col("c_x").cast("double") / F.col("t_uni"))
                        * (F.col("c_y").cast("double") / F.col("t_uni"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    # sort-limit top-k, then rank the k survivors (see bm25_topk note)
    top = scored.orderBy(F.col("pmi").desc(), F.col("bigram")).limit(k)
    w = Window.orderBy(F.col("pmi").desc(), F.col("bigram"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "bigram", "c_bigram", "pmi", "rank"
    )


def unigram_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document average unigram negative log-probability — the
    language-model fluency score real curation pipelines threshold on
    (KenLM-style filtering, here with a corpus-fit unigram model and
    add-one smoothing so every token has finite probability).

    p(t) = (count(t) + 1) / (total_tokens + vocab); score(d) =
    mean over tokens of -ln p(t). Low = built from common corpus tokens,
    high = rare/garbled. The model table is token-keyed and broadcast into
    the per-doc rollup, so the token stream shuffles only for the two
    aggregations (corpus counts; per-doc mean) — the same shape as TF-IDF.

    Returns (id, n_tokens, avg_neg_logprob rounded to 6).
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    model = counts.crossJoin(F.broadcast(totals)).select(
        "term",
        (-F.log((F.col("c") + 1.0) / (F.col("total") + F.col("vocab")))).alias("nll"),
    )
    return (
        toks.join(F.broadcast(model), "term")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("nll"), 6).alias("avg_neg_logprob"),
        )
        .select(F.col("_id").alias(id_col), "n_tokens", "avg_neg_logprob")
    )
