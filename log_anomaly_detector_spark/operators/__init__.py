"""Operator library: one callable per operator family from SURVEY.md §2,
each over the driver-provided testdata tables, with a DuckDB oracle SQL
string where the semantics are ANSI-SQL-expressible.

Modules register into QUERIES/ORACLES dicts consumed by __spark_entry__.
"""

from log_anomaly_detector_spark.operators import (
    multimodal,
    relational,
    similarity,
    text,
)
from log_anomaly_detector_spark.operators.template_induction import (
    q_template_induction,
)

_MODULES = (relational, text, similarity, multimodal)


def all_queries():
    q = {}
    for m in _MODULES:
        q.update(m.QUERIES)
    # Drain induction: iterative fixpoint → rows-only check (golden-gated in
    # tests/test_template_induction.py against a sequential implementation)
    q["template_induction"] = q_template_induction
    return q


def all_oracles():
    o = {}
    for m in _MODULES:
        o.update(m.ORACLES)
    return o
