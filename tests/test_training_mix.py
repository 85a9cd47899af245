"""Packing/mix semantics beyond the value oracle: structural invariants of
the bin layout and the mix rates."""

from __future__ import annotations

from collections import defaultdict

from log_anomaly_detector_spark.operators.training_mix import (
    MIX_WEIGHTS,
    PACK_BUDGET,
    q_pack_sequences,
    q_source_mix,
)

SF = "/root/testdata/sf0.001"


def test_pack_layout_invariants(spark):
    rows = q_pack_sequences(spark, SF).collect()
    by_bucket = defaultdict(list)
    for r in rows:
        by_bucket[r["pack_bucket"]].append(r)
    assert len(by_bucket) > 1  # buckets actually spread
    for bucket, docs in by_bucket.items():
        docs.sort(key=lambda r: r["doc_id"])
        cum = 0
        prev_bin = 0
        for r in docs:
            # offset/bin are exactly the running token count in bucket order
            assert r["bin_id"] == cum // PACK_BUDGET, (bucket, r)
            assert r["tok_offset"] == cum % PACK_BUDGET, (bucket, r)
            assert r["bin_id"] >= prev_bin  # bins fill forward, never skip back
            prev_bin = r["bin_id"]
            cum += r["n_tok"]


def test_source_mix_rates(spark):
    got = {r["lang"]: r for r in q_source_mix(spark, SF).collect()}
    for lang, r in got.items():
        want = MIX_WEIGHTS.get(lang, 0)
        assert r["rate_pct"] == want
        assert 0 <= r["n_kept"] <= r["n_total"]
        if want == 0:
            assert r["n_kept"] == 0
        # md5 coin ≈ rate: binomial tolerance on small strata
        if r["n_total"] >= 30 and want > 0:
            frac = 100.0 * r["n_kept"] / r["n_total"]
            assert abs(frac - want) < 30, (lang, frac, want)
