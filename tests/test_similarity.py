"""ANN quality: LSH and IVF candidates must recover most of the exact
brute-force top-k (recall gate), and near-dup methods agree on the planted
pairs."""

from __future__ import annotations

import pytest

from log_anomaly_detector_spark.operators.similarity import (
    q_ann_ivf,
    q_ann_lsh,
    q_cosine_topk,
)
from log_anomaly_detector_spark.operators.text import (
    q_jaccard_near_dup,
    q_minhash_lsh_pairs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def exact(spark):
    return {(r["q_id"], r["c_id"]) for r in q_cosine_topk(spark, SF).collect()}


def test_lsh_recall(spark, exact):
    lsh = {(r["q_id"], r["c_id"]) for r in q_ann_lsh(spark, SF).collect()}
    assert len(exact & lsh) / len(exact) >= 0.5


def test_ivf_recall(spark, exact):
    ivf = {(r["q_id"], r["c_id"]) for r in q_ann_ivf(spark, SF).collect()}
    assert len(exact & ivf) / len(exact) >= 0.5


def test_minhash_finds_jaccard_pairs(spark):
    """MinHash-LSH candidates must cover most true 3-gram-Jaccard near-dups."""
    truth = {
        (r["doc_a"], r["doc_b"]) for r in q_jaccard_near_dup(spark, SF).collect()
    }
    mh = {(r["doc_a"], r["doc_b"]) for r in q_minhash_lsh_pairs(spark, SF).collect()}
    if truth:
        assert len(truth & mh) / len(truth) >= 0.8
    else:
        pytest.skip("no planted near-dups at this sf")
