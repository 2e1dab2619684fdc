"""The composed curation funnel (plans/curation.py): each stage must drop
exactly the documents its rule names, in order."""

from __future__ import annotations

from hubverse_transform_spark.plans.curation import curation_funnel

GOOD_1 = "The quick brown fox jumps over the lazy dog near the river bank today."
GOOD_2 = "A completely different and equally wholesome sentence about the weather in spring."


def test_curation_funnel_stage_counts(spark):
    rows = [
        (1, GOOD_1),                       # kept all the way through
        (2, GOOD_1),                       # byte-identical -> exact_dedup drop
        (3, "!!!???"),                     # junk -> quality drop
        (4, GOOD_1.upper() + "  "),        # same tokens after normalize ->
                                           # SimHash hamming 0 -> near_dup drop
        (5, GOOD_2),                       # kept
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["stage"]: r["docs_kept"] for r in curation_funnel(df).collect()}
    assert got == {"raw": 5, "exact_dedup": 4, "quality": 3, "near_dup": 2}
