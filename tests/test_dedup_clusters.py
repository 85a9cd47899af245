"""Connected-components cluster resolution: hand graphs (chain, triangle,
disjoint), determinism at odd partitioning, and the convergence cap."""

from __future__ import annotations

import pytest

from log_anomaly_detector_spark.operators.dedup_clusters import (
    connected_components,
)


def test_components_on_hand_graph(spark):
    # components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21} (pair)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a long, doc_b long",
    ).repartition(7)
    got = {
        r["node"]: r["component_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_components_long_chain_converges(spark):
    # a 12-node path needs ~diameter rounds — still within the cap
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    got = {
        r["node"]: r["component_id"]
        for r in connected_components(pairs).collect()
    }
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_components_round_cap_raises(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_a long, doc_b long"
    )
    with pytest.raises(ValueError, match="max_rounds"):
        connected_components(pairs, max_rounds=2)
