"""End-to-end detection pipeline (reference run_pipeline_v2 lifecycle) on
synthetic HDFS-shaped logs."""

from __future__ import annotations

import pytest

from log_anomaly_detector_spark.pipeline import UNMAPPED, run_detection_pipeline

RAW = """081109 203615 148 INFO dfs.DataNode$PacketResponder: PacketResponder 1 for block blk_100 terminating
081109 203616 149 INFO dfs.DataNode$PacketResponder: PacketResponder 2 for block blk_100 terminating
081109 203617 150 INFO dfs.FSNamesystem: BLOCK* ask 10.1.1.1:50010 to replicate blk_100 to 10.1.1.2:50010
081109 203618 151 INFO dfs.DataNode$PacketResponder: PacketResponder 1 for block blk_200 terminating
081109 203619 152 WARN dfs.FSNamesystem: BLOCK* weird unparseable-template-free event for blk_200 zz9
garbage line that matches nothing
"""


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("logs") / "raw.log"
    p.write_text(RAW)
    return run_detection_pipeline(spark, str(p), seq_threshold=0.5)


def test_structured_and_templates(result):
    assert result.structured.filter("_parsed").count() == 5
    assert result.structured.filter("NOT _parsed").count() == 1
    temps = {r["EventTemplate"]: r["Occurrences"] for r in result.templates.collect()}
    # digits → <*> collapses the three PacketResponder lines to one template
    assert temps["PacketResponder <*> for block blk_<*> terminating"] == 3
    assert all(len(r["EventId"]) == 8 for r in result.templates.collect())


def test_mapping_ranked(result):
    m = {r["EventTemplate"]: r["event_int"] for r in result.mapping.collect()}
    assert m["PacketResponder <*> for block blk_<*> terminating"] == 1  # most frequent


def test_sequences_ordered(result):
    seqs = {r["block_id"]: r["tokens"] for r in result.sequences.collect()}
    assert set(seqs) == {"blk_100", "blk_200"}
    assert len(seqs["blk_100"]) == 3
    assert seqs["blk_100"][0] == seqs["blk_100"][1] == 1  # two PacketResponder lines first
    assert len(seqs["blk_200"]) == 2


def test_verdict_semantics(result):
    v = {r["block_id"]: r for r in result.verdicts.collect()}
    assert v["blk_100"]["label"] == "Normal"
    assert v["blk_100"]["anomaly_score"] == 0.0
    # blk_200: both lines map to known templates → Normal at 0.5 threshold
    assert v["blk_200"]["anomaly_score"] < 0.5


def test_warm_start_accumulates(spark, result, tmp_path):
    p = tmp_path / "raw2.log"
    p.write_text(
        "081109 203620 153 INFO dfs.DataNode$PacketResponder: "
        "PacketResponder 7 for block blk_300 terminating\n"
    )
    r2 = run_detection_pipeline(
        spark, str(p), previous_templates=result.templates
    )
    temps = {r["EventTemplate"]: r["Occurrences"] for r in r2.templates.collect()}
    # warm start: 3 previous + 1 new occurrence of the same template
    assert temps["PacketResponder <*> for block blk_<*> terminating"] == 4


def test_induction_pipeline_end_to_end(spark, tmp_path):
    """v2 lifecycle with LEARNED templates (parse_and_store_log_lines,
    Drain.py:329-423): warm templates absorb their lines; novel lines found
    new templates, are flagged anomalous, and their blocks go Anomaly; the
    new-template slice is the dim-upsert payload."""
    from log_anomaly_detector_spark.pipeline import run_induction_pipeline

    log = tmp_path / "raw.log"
    lines = []
    # 4 known-shape lines on blk_100 (warm template matches)
    for i in range(4):
        lines.append(
            f"081109 2036{i:02d} 143 INFO dfs.DataNode: "
            f"Receiving block blk_100 src 10.0.0.{i}"
        )
    # 2 novel lines on blk_200 → new template → anomalous block
    for i in range(2):
        lines.append(
            f"081109 2037{i:02d} 143 WARN dfs.DataNode: "
            f"Corrupt frame {i}77 detected on blk_200"
        )
    log.write_text("\n".join(lines) + "\n")
    warm = spark.createDataFrame(
        [("Receiving block blk_<*> src <*>",)], "template string"
    )
    res = run_induction_pipeline(spark, str(log), warm_templates=warm, depth=4)

    t = {r["template"]: r for r in res.templates.collect()}
    assert t["Receiving block blk_<*> src <*>"]["is_new"] is False
    assert t["Receiving block blk_<*> src <*>"]["occurrences"] == 4
    new = [r["template"] for r in res.new_templates.collect()]
    assert new == ["Corrupt frame <*> detected on blk_<*>"]

    flags = {
        r["LineId"]: r["is_anomaly"] for r in res.structured.collect()
    }
    assert [flags[i] for i in range(6)] == [False] * 4 + [True] * 2

    v = {r["block_id"]: r["label"] for r in res.verdicts.collect()}
    assert v == {"blk_100": "Normal", "blk_200": "Anomaly"}
