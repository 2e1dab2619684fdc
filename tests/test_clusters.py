"""Connected components / dedup clusters over pair graphs."""

from __future__ import annotations

from hubverse_transform_spark.operators.clusters import (
    connected_components,
    dedup_clusters,
)


def test_connected_components_chain_and_triangle(spark):
    # components: chain 1-2-3-4, triangle 10-11-12, pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["id_a", "id_b"],
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_long_chain_converges(spark):
    # a 30-node path needs multiple propagation rounds; label must still reach
    # the far end (fixpoint, not fixed-iteration truncation)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["id_a", "id_b"]
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 31


def test_dedup_clusters_sizes(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (8, 9)], ["id_a", "id_b"])
    rows = {r["node"]: r for r in dedup_clusters(edges).collect()}
    assert rows[3]["component"] == 1 and rows[3]["cluster_size"] == 3
    assert rows[9]["component"] == 8 and rows[9]["cluster_size"] == 2
    survivors = [n for n, r in rows.items() if r["component"] == n]
    assert sorted(survivors) == [1, 8]
