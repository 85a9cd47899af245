"""ParameterList extraction (get_parameter_list, Drain.py:553-562) parity.

Two findings about the reference pinned here as executable documentation:

* the reference's own implementation is INERT for multi-token templates —
  after escaping, every space is "\\ " but line 557 substitutes on raw
  spaces (``re.sub(r' +', ...)``), leaving a stray backslash that makes the
  generated regex unmatchable, so findall returns [] for any real template;
* the intended published form (escaped-space substitution, as in the
  original LogPAI Drain) works, but its ``<.{1,5}>`` normalization is
  greedy and can merge ADJACENT wildcards ("<*> <*>" → one "<*>").

Our `parameter_list` implements the INTENDED semantics positionally
(token-aligned, which Drain guarantees for matched pairs); this file proves
agreement with the intended regex form on well-behaved templates.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from log_anomaly_detector_spark.operators.relational import parameter_list


def _reference_verbatim(template: str, content: str) -> list[str]:
    """The reference's get_parameter_list, line for line (Drain.py:553-562)."""
    t = re.sub(r"<.{1,5}>", "<*>", str(template))
    if "<*>" not in t:
        return []
    t = re.sub(r"([^A-Za-z0-9])", r"\\\1", t)
    t = re.sub(r" +", r"\\s+", t)  # Drain.py:557 — raw-space form
    t = "^" + t.replace(r"\<\*\>", "(.*?)") + "$"
    m = re.findall(t, str(content))
    m = m[0] if m else ()
    return list(m) if isinstance(m, tuple) else [m]


def _intended_regex(template: str, content: str) -> list[str]:
    """The intended published semantics: escaped-space substitution."""
    t = re.sub(r"<.{1,5}>", "<*>", str(template))
    if "<*>" not in t:
        return []
    t = re.sub(r"([^A-Za-z0-9])", r"\\\1", t)
    t = re.sub(r"\\ +", r"\\s+", t)
    t = "^" + t.replace(r"\<\*\>", "(.*?)") + "$"
    m = re.findall(t, str(content))
    m = m[0] if m else ()
    return list(m) if isinstance(m, tuple) else [m]


CASES = [
    # (template, content) — single-token params, incl. embedded prefix/suffix
    (
        "Receiving block blk_<*> src /<*> dest /<*>:50010",
        "Receiving block blk_123 src /10.0.0.1 dest /10.0.0.2:50010",
    ),
    ('{"k": <*>}', '{"k": 69}'),
    ("PacketResponder <*> for block blk_<*> terminating",
     "PacketResponder 1 for block blk_99 terminating"),
    ("Verification succeeded for blk_<*>", "Verification succeeded for blk_-42"),
    ("no wildcards here", "no wildcards here"),
]


def test_reference_verbatim_form_is_inert():
    t, c = CASES[0]
    assert _reference_verbatim(t, c) == []          # the line-557 defect
    assert _intended_regex(t, c) == ["123", "10.0.0.1", "10.0.0.2"]


def test_positional_matches_intended_regex(spark):
    df = spark.createDataFrame(CASES, "template string, content string")
    got = df.select(
        "template",
        "content",
        F.array_join(
            parameter_list(F.col("content"), F.col("template")), "|"
        ).alias("params"),
    ).collect()
    for r in got:
        want = _intended_regex(r["template"], r["content"])
        # parenthesized: the conditional expression must bind BEFORE the ==
        # (an unparenthesized form parses as `split if params else ([]==want)`
        # and is vacuously truthy whenever params is non-empty)
        params = r["params"].split("|") if r["params"] else []
        assert params == want, (r["template"], r["params"], want)


@pytest.mark.skipif(
    not __import__("os").path.exists(
        "/root/reference/output/hdfs/HDFS.log_templates.csv"
    ),
    reason="reference tree not present",
)
def test_positional_matches_intended_on_hdfs_dim(spark):
    """Every (filled line, template) pair from the reference's own 47-template
    dim: positional == intended-regex (no template there has adjacent
    wildcards or multi-token params)."""
    import pandas as pd

    ref = [
        str(t)
        for t in pd.read_csv(
            "/root/reference/output/hdfs/HDFS.log_templates.csv"
        )["EventTemplate"]
    ]
    rows = []
    for ti, tmpl in enumerate(ref):
        content = " ".join(
            tok.replace("<*>", str(5_000 + ti)) for tok in tmpl.split()
        )
        rows.append((tmpl, content))
    df = spark.createDataFrame(rows, "template string, content string")
    got = df.select(
        "template",
        "content",
        F.array_join(
            parameter_list(F.col("content"), F.col("template")), "|"
        ).alias("params"),
    ).collect()
    mismatches = []
    adjacent = []
    for r in got:
        if "<*> <*>" in r["template"]:
            # the intended-regex form's greedy `<.{1,5}>` merges ADJACENT
            # wildcards across the space ("blk_<*> <*>" → one group spanning
            # two tokens); positional keeps one param per wildcard token —
            # assert the documented divergence shape instead of equality
            adjacent.append(r)
            continue
        want = "|".join(_intended_regex(r["template"], r["content"]))
        if r["params"] != want:
            mismatches.append((r["template"], r["params"], want))
    assert mismatches == []
    for r in adjacent:
        n_wildcard_tokens = sum(
            1 for tok in r["template"].split() if "<*>" in tok
        )
        assert len(r["params"].split("|")) == n_wildcard_tokens
