"""Differential tests of the round-3 numeric operators against tiny
pure-Python reference implementations on randomized (seeded) inputs — the
oracle checks cover the real tables; these pin the algorithms themselves on
adversarial shapes (ties, single rows, all-overlapping intervals)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _weighted_median_ref(pairs):
    """(value, weight) list -> smallest v whose cumulative weight >= half."""
    total = sum(w for _, w in pairs)
    acc = 0
    for v, w in sorted(pairs):
        acc += w
        if acc >= total / 2:
            return v
    raise AssertionError("unreachable")


def test_weighted_median_matches_reference(spark):
    rng = random.Random(7)
    rows = []
    for grp in ["a", "b", "c"]:
        for _ in range(rng.randint(1, 40)):
            rows.append((grp, float(rng.randint(1, 20)), float(rng.randint(1, 5))))
    # tie-heavy group: every value identical
    rows += [("t", 4.0, 1.0)] * 5
    df = spark.createDataFrame(rows, ["flag", "price", "wt"])

    grouped = df.groupBy("flag", "price").agg(F.sum("wt").alias("w"))
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy("flag")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    got = {
        r.flag: r.wm
        for r in grouped.select(
            "flag",
            "price",
            F.sum("w").over(wcum).alias("cum"),
            F.sum("w").over(Window.partitionBy("flag")).alias("tot"),
        )
        .filter(F.col("cum") >= F.col("tot") / 2)
        .groupBy("flag")
        .agg(F.min("price").alias("wm"))
        .collect()
    }
    by_grp = {}
    for g, v, w in rows:
        by_grp.setdefault(g, []).append((v, w))
    for g, pairs in by_grp.items():
        assert got[g] == _weighted_median_ref(pairs), g


def _merge_ref(starts, span):
    """Sorted starts + fixed span -> (n_islands, covered)."""
    islands = []
    for s in sorted(starts):
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], s + span)
        else:
            islands.append([s, s + span])
    return len(islands), sum(e - s for s, e in islands)


def test_interval_merge_matches_reference(spark):
    rng = random.Random(11)
    rows = []
    expect = {}
    for uid in range(6):
        starts = sorted(rng.randint(0, 3000) for _ in range(rng.randint(1, 30)))
        rows += [(uid, float(s)) for s in starts]
        expect[uid] = _merge_ref(starts, 300.0)
    # duplicate timestamps for one user (same event twice)
    rows += [(99, 100.0), (99, 100.0)]
    expect[99] = _merge_ref([100.0, 100.0], 300.0)

    from pyspark.sql import Window

    df = spark.createDataFrame(rows, ["user_id", "_t"])
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = df.withColumn(
        "_new",
        F.when(F.col("_t") > F.max(F.col("_t") + 300.0).over(w_prev), 1).otherwise(
            F.when(F.max("_t").over(w_prev).isNull(), 1).otherwise(0)
        ),
    ).withColumn("_island", F.sum("_new").over(w_run))
    got = {
        r.user_id: (r.n, r.cov)
        for r in marked.groupBy("user_id", "_island")
        .agg(F.min("_t").alias("s"), (F.max("_t") + 300.0).alias("e"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("e") - F.col("s")).alias("cov"),
        )
        .collect()
    }
    for uid, (n, cov) in expect.items():
        assert got[uid][0] == n, uid
        assert abs(got[uid][1] - cov) < 1e-9, uid


def test_chunk_dedup_reference_on_random_corpus(spark):
    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for i in range(25):
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 35)))))
    from collections import Counter

    from hubverse_transform_spark.operators.dedup import chunk_dup_stats

    cw = 5
    chunks_by_doc = {}
    counts = Counter()
    for i, text in docs:
        words = text.split(" ")
        cs = [
            " ".join(words[j * cw : (j + 1) * cw])
            for j in range((len(words) + cw - 1) // cw)
        ]
        chunks_by_doc[i] = cs
        counts.update(cs)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.doc_id: r for r in chunk_dup_stats(df, chunk_words=cw).collect()}
    for i, cs in chunks_by_doc.items():
        assert got[i].n_chunks == len(cs), i
        assert got[i].dup_chunks == sum(1 for c in cs if counts[c] > 1), i
