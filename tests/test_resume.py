"""Checkpoint/resume (R10): a killed run resumes only unfinished partitions
and converges to the same verdicts + violations as a single-shot run.
Reference analogue: warm start (Drain.py:260-279) + idempotent delete+insert
(database/upsert_log_line.py:27-52)."""

from __future__ import annotations

import pytest

from log_anomaly_detector_spark.config import DEFAULT_CONFIG as CFG
from log_anomaly_detector_spark.datagen import (
    GenSpec,
    gen_allowed_sources,
    gen_baseline_profile,
    gen_reference_snapshot,
    gen_sequences,
)
from log_anomaly_detector_spark.engine import run_validation
from log_anomaly_detector_spark.storage import read_manifest

SPEC = GenSpec(n_docs=4_000, n_parts=8, seed=7)


@pytest.fixture(scope="module")
def world(spark):
    seqs = gen_sequences(spark, SPEC).cache()
    snap = gen_reference_snapshot(spark, SPEC).cache()
    allowed = gen_allowed_sources(spark)
    baseline = gen_baseline_profile(spark, SPEC, CFG)
    return seqs, snap, allowed, baseline


def _viol_set(spark, out):
    df = spark.read.parquet(f"{out}/violations")
    return {(r["part_id"], r["doc_id"], r["rule_id"]) for r in df.collect()}


def test_resume_converges_to_single_shot(spark, world, tmp_path):
    seqs, snap, allowed, baseline, = world
    single = str(tmp_path / "single")
    resumed = str(tmp_path / "resumed")

    full = run_validation(
        spark, seqs, snap, allowed, baseline, single, CFG, input_digest="d1"
    )

    # simulate a kill after the first 3-partition batch
    part1 = run_validation(
        spark, seqs, snap, allowed, baseline, resumed, CFG,
        input_digest="d1", batch_parts=3, max_batches=1,
    )
    assert part1.metrics["partitions_validated"] == 3
    assert len(read_manifest(resumed)) == 3

    # rerun: must skip the 3 done partitions and finish the rest
    part2 = run_validation(
        spark, seqs, snap, allowed, baseline, resumed, CFG, input_digest="d1"
    )
    assert part2.metrics["partitions_skipped"] == 3
    assert part2.metrics["partitions_validated"] == SPEC.n_parts - 3

    assert _viol_set(spark, resumed) == _viol_set(spark, single)
    v_single = {r["part_id"]: (r["label"], r["score"]) for r in
                spark.read.parquet(f"{single}/verdicts").collect()}
    v_resumed = {r["part_id"]: (r["label"], r["score"]) for r in
                 spark.read.parquet(f"{resumed}/verdicts").collect()}
    assert v_single == v_resumed

    # a third run is a no-op (idempotent)
    part3 = run_validation(
        spark, seqs, snap, allowed, baseline, resumed, CFG, input_digest="d1"
    )
    assert part3.metrics["partitions_validated"] == 0
    assert _viol_set(spark, resumed) == _viol_set(spark, single)


def test_digest_change_invalidates(spark, world, tmp_path):
    seqs, snap, allowed, baseline = world
    out = str(tmp_path / "out")
    run_validation(spark, seqs, snap, allowed, baseline, out, CFG, input_digest="a")
    again = run_validation(
        spark, seqs, snap, allowed, baseline, out, CFG, input_digest="b"
    )
    assert again.metrics["partitions_skipped"] == 0
    assert again.metrics["partitions_validated"] == SPEC.n_parts


def test_manifest_lineage_fields(spark, world, tmp_path):
    seqs, snap, allowed, baseline = world
    out = str(tmp_path / "out")
    run_validation(spark, seqs, snap, allowed, baseline, out, CFG, input_digest="d1")
    recs = read_manifest(out)
    assert len(recs) == SPEC.n_parts
    for r in recs:
        assert r["status"] == "done"
        assert r["input_digest"] == "d1"
        assert set(r["rule_versions"]) == {
            "null_rate", "n_tok_stats", "approx_distinct", "uniqueness",
            "referential", "n_tok_consistency", "null_tokens", "token_equality",
            "drift_psi", "drift_ks", "drift_chi2",
        }
        assert len(r["stats_digest"]) == 16
        assert r["batch_rows_per_sec"] > 0
