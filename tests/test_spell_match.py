"""Spell LCS matcher semantics: the Catalyst fold must agree with an
independent sequential LCS, and spell_match must reproduce the reference's
LCSMatch decision rules (prefilter, max-LCS, shorter-template tie, tau
accept) on planted cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_anomaly_detector_spark.operators.spell_match import (
    lcs_length,
    spell_match,
)


def _lcs_ref(a: list[str], b: list[str]) -> int:
    # independent sequential DP (full-matrix formulation, written fresh —
    # intentionally not the rolling-row used by the Spark fold)
    n, m = len(a), len(b)
    L = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            L[i][j] = (
                L[i - 1][j - 1] + 1
                if a[i - 1] == b[j - 1]
                else max(L[i - 1][j], L[i][j - 1])
            )
    return L[n][m]


CASES = [
    (["a", "b", "c", "d"], ["a", "c", "d"]),          # plain subsequence
    (["a", "b", "c"], ["x", "y", "z"]),               # disjoint
    (["a", "a", "b", "a"], ["a", "b", "a", "a"]),     # duplicates
    (["recv", "block", "<*>"], ["recv", "block", "<*>"]),  # wildcard literal
    (["recv", "block", "42"], ["recv", "block", "<*>"]),   # wildcard ≠ word
    (["a"], ["a", "b", "c", "d", "e"]),               # short vs long
    (["x", "a", "x", "b", "x", "c"], ["a", "b", "c"]),  # interleaved
    ([], ["a", "b"]),                                  # empty line
    (["a", "b"], []),                                  # empty template
]


def test_lcs_fold_matches_sequential_dp(spark):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(CASES)],
        "i int, a array<string>, b array<string>",
    )
    got = {
        r["i"]: r["lcs"]
        for r in df.select(
            "i", lcs_length(F.col("a"), F.col("b")).alias("lcs")
        ).collect()
    }
    for i, (a, b) in enumerate(CASES):
        assert got[i] == _lcs_ref(a, b), (a, b, got[i])


def test_spell_match_reference_decisions(spark):
    """Planted LCSMatch decisions (Spell.py:112-133): best by max LCS, tie →
    SHORTER template, accept iff lcs >= tau·|seq|; below-threshold and
    prefilter-excluded lines stay unmatched (they would found new clusters,
    Spell.py:252-255)."""
    templates = spark.createDataFrame(
        [
            ("T1", ["recv", "block", "<*>", "from", "<*>"]),
            ("T2", ["recv", "block", "<*>", "from"]),       # shorter: wins ties
            ("T3", ["delete", "block", "<*>"]),
        ],
        "template_id string, template_tokens array<string>",
    )
    lines = spark.createDataFrame(
        [
            # lcs(T1)=3 ('recv block from'), lcs(T2)=3 → tie → T2 (shorter)
            (0, ["recv", "block", "b42", "from", "n7"]),
            # lcs(T3)=2 ≥ 0.5·3 → T3 (T1/T2 prefiltered out: overlap 1 < 1.5)
            (1, ["delete", "block", "b42"]),
            # no template overlaps ≥ 0.5·|seq| → unmatched
            (2, ["totally", "novel", "line", "here"]),
            # shares 'recv block' but 2 < 0.5·5 → below tau either way
            (3, ["recv", "block", "x", "y", "z"]),
            # zero tokens: reference arithmetic matches the SHORTEST template
            # (all lcs 0, accept 0 >= tau·0) — T3 is the 3-token dim minimum
            (4, []),
        ],
        "line_id long, tokens array<string>",
    )
    got = {
        r["line_id"]: (r["matched_template_id"], r["lcs_len"])
        for r in spell_match(lines, templates, tau=0.5).collect()
    }
    assert got[0] == ("T2", 3)
    assert got[1] == ("T3", 2)
    assert got[2] == (None, None)
    assert got[3][0] is None
    assert got[4] == ("T3", 0)


def test_spell_match_plans_equi_candidate_join(spark):
    """Candidates come from the prefix-principle token hash join — the plan
    must contain no nested-loop scan of the template dim per line."""
    from log_anomaly_detector_spark.operators.spell_match import q_spell_match
    from log_anomaly_detector_spark.plans import formatted_plan

    plan = formatted_plan(q_spell_match(spark, "/root/testdata/sf0.001"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
