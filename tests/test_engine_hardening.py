"""Hardening gates from the round-1 advice:

* uniqueness is GLOBAL (PK semantics, init_schema.sql:12) — duplicates that
  straddle checkpoint batches, or a done partition vs a resumed one, are
  still detected;
* a crash mid-manifest-append leaves at most a torn trailing line, which
  read_manifest tolerates instead of permanently breaking resume (R10);
* an all-NULL n_tok partition fails the n_tok_stats rule instead of raising;
* partition planning comes from storage metadata, not a data scan.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from log_anomaly_detector_spark import storage
from log_anomaly_detector_spark.config import DEFAULT_CONFIG as CFG
from log_anomaly_detector_spark.config import RuleConfig
from log_anomaly_detector_spark.datagen import (
    GenSpec,
    gen_allowed_sources,
    gen_baseline_profile,
    gen_reference_snapshot,
    gen_sequences,
)
from log_anomaly_detector_spark.engine import run_validation
from log_anomaly_detector_spark.rules.column_stats import stats_verdicts

SPEC = GenSpec(n_docs=2_000, n_parts=4, seed=11)


@pytest.fixture(scope="module")
def world(spark):
    seqs = gen_sequences(spark, SPEC)
    # plant a CROSS-BATCH duplicate: copy one clean doc from part 0 into the
    # last partition (datagen's own DUP_MOD duplicates are always adjacent
    # ids in the same partition, which a batch-scoped check would also catch)
    victim = seqs.filter(
        (F.col("part_id") == 0) & F.col("doc_id").endswith("000042")
    ).limit(1)
    planted = victim.withColumn("part_id", F.lit(SPEC.n_parts - 1))
    seqs = seqs.unionByName(planted).cache()
    snap = gen_reference_snapshot(spark, SPEC).cache()
    allowed = gen_allowed_sources(spark)
    baseline = gen_baseline_profile(spark, SPEC, CFG)
    victim_id = victim.first()["doc_id"]
    return seqs, snap, allowed, baseline, victim_id


@pytest.mark.parametrize("mode", ["salted", "direct"])
def test_cross_batch_duplicate_detected(spark, world, tmp_path, mode):
    """batch_parts=1 → the two copies are validated in DIFFERENT batches;
    both must still be flagged by the uniqueness rule."""
    seqs, snap, allowed, baseline, victim_id = world
    out = str(tmp_path / f"out_{mode}")
    cfg = RuleConfig(uniqueness_mode=mode)
    res = run_validation(
        spark, seqs, snap, allowed, baseline, out, cfg,
        input_digest="x", batch_parts=1,
    )
    assert res.metrics["duplicate_keys_global"] >= 1
    viol = spark.read.parquet(f"{out}/violations")
    hits = {
        (r["part_id"], r["rule_id"])
        for r in viol.filter(F.col("doc_id") == victim_id).collect()
    }
    assert (0, "uniqueness") in hits, "original copy (batch 0) not flagged"
    assert (SPEC.n_parts - 1, "uniqueness") in hits, "planted copy not flagged"


def test_cross_batch_duplicate_detected_on_resume(spark, world, tmp_path):
    """Kill after batch 0 (victim's home partition committed as done), resume:
    the resumed run must still flag the planted copy in the last partition."""
    seqs, snap, allowed, baseline, victim_id = world
    out = str(tmp_path / "resumed")
    run_validation(
        spark, seqs, snap, allowed, baseline, out, CFG,
        input_digest="x", batch_parts=1, max_batches=1,
    )
    res = run_validation(
        spark, seqs, snap, allowed, baseline, out, CFG, input_digest="x"
    )
    assert res.metrics["partitions_skipped"] == 1
    viol = spark.read.parquet(f"{out}/violations")
    planted_hits = viol.filter(
        (F.col("doc_id") == victim_id)
        & (F.col("part_id") == SPEC.n_parts - 1)
        & (F.col("rule_id") == "uniqueness")
    ).count()
    assert planted_hits == 1


def test_manifest_tolerates_torn_tail(tmp_path):
    out = str(tmp_path)
    storage.append_manifest(out, [{"part_id": 0, "status": "done"}])
    storage.append_manifest(out, [{"part_id": 1, "status": "done"}])
    # simulate a crash mid-append: torn, unparseable trailing line
    with open(storage.manifest_path(out), "a") as f:
        f.write('{"part_id": 2, "sta')
    recs = storage.read_manifest(out)
    assert [r["part_id"] for r in recs] == [0, 1]
    # torn line NOT at the tail = external corruption → still raised
    with open(storage.manifest_path(out), "a") as f:
        f.write('\n{"part_id": 3, "status": "done"}\n')
    with pytest.raises(json.JSONDecodeError):
        storage.read_manifest(out)


def test_all_null_n_tok_fails_rule_not_run():
    rows = [
        {
            "part_id": 0,
            "n_rows": 10,
            "null_doc_id": 0,
            "null_n_tok": 10,
            "null_source": 0,
            "n_tok_min": None,
            "n_tok_max": None,
            "n_tok_mean": None,
            "approx_distinct_doc_id": 10,
        }
    ]
    verdicts = {r["rule_id"]: r for r in stats_verdicts(rows, CFG)}
    assert verdicts["n_tok_stats"]["passed"] is False
    assert verdicts["n_tok_stats"]["observed_stat"] != verdicts["n_tok_stats"][
        "observed_stat"
    ]  # NaN
    assert verdicts["null_rate"]["passed"] is False  # 100% null n_tok


def test_list_partitions_metadata(tmp_path, spark):
    df = spark.range(10).select(
        F.col("id").alias("x"), (F.col("id") % 3).cast("int").alias("part_id")
    )
    path = str(tmp_path / "tbl")
    df.write.partitionBy("part_id").parquet(path)
    assert storage.list_partitions(path) == [0, 1, 2]
    assert storage.list_partitions(str(tmp_path / "missing")) is None
    flat = str(tmp_path / "flat")
    spark.range(3).write.parquet(flat)
    assert storage.list_partitions(flat) is None


def test_non_ascii_scrub(spark, tmp_path):
    """Spell.py:297 — runs of non-ASCII chars become one <NASCII> sentinel."""
    from log_anomaly_detector_spark.sources.logtext import read_structured_logs

    p = str(tmp_path / "log.txt")
    with open(p, "w", encoding="utf-8") as f:
        f.write("081109 203615 143 INFO dfs.DataNode: Received block café±\n")
    df = read_structured_logs(
        spark, p, logformat="<Date> <Time> <Pid> <Level> <Component>: <Content>"
    )
    row = df.first()
    assert row["Content"] == "Received block caf<NASCII>"
    assert row["_parsed"]


def test_all_null_n_tok_partition_end_to_end(spark, world, tmp_path):
    """A partition whose n_tok is entirely NULL must fail n_tok_stats (and
    null_rate) and label Anomaly — never crash the run (NULL aggregates)."""
    seqs, snap, allowed, baseline, _ = world
    nulled = seqs.withColumn(
        "n_tok",
        F.when(F.col("part_id") == 0, F.lit(None).cast("int")).otherwise(
            F.col("n_tok")
        ),
    )
    out = str(tmp_path / "nulled")
    res = run_validation(
        spark, nulled, snap, allowed, baseline, out, CFG, input_digest="z"
    )
    v0 = next(v for v in res.verdicts if v["part_id"] == 0)
    assert v0["label"] == "Anomaly"
    failed0 = {
        r["rule_id"]
        for r in res.rule_verdicts
        if r["part_id"] == 0 and not r["passed"]
    }
    assert {"n_tok_stats", "null_rate"} <= failed0
