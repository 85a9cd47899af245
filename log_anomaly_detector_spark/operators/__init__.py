"""Operator library: one callable per operator family from SURVEY.md §2,
each over the driver-provided testdata tables, with a DuckDB oracle SQL
string where the semantics are ANSI-SQL-expressible.

Modules register into QUERIES/ORACLES dicts consumed by __spark_entry__.
"""

from log_anomaly_detector_spark.operators import (
    dedup_clusters,
    multimodal,
    relational,
    similarity,
    spell_match,
    text,
    training_mix,
)
from log_anomaly_detector_spark.operators.template_induction import (
    q_template_induction,
)

_MODULES = (
    relational,
    text,
    similarity,
    spell_match,
    dedup_clusters,
    training_mix,
    multimodal,
)


def all_queries():
    q = {}
    for m in _MODULES:
        q.update(m.QUERIES)
    q["template_induction"] = q_template_induction
    return q


def all_oracles():
    o = {}
    for m in _MODULES:
        o.update(m.ORACLES)
    # Drain induction: the iterative fixpoint is not SQL-expressible, but its
    # converged dim on the driver's sf0.01 fixture is DETERMINISTIC (verified
    # across runs and sessions), so it gets a HARD check against a checked-in
    # golden VALUES literal (tools/gen_induction_golden.py) — the same
    # pattern as KMV/mm_features; semantics are additionally golden-gated
    # against a sequential reference in tests/test_template_induction.py.
    from log_anomaly_detector_spark.operators._induction_golden import (
        INDUCTION_GOLDEN_SQL,
    )

    o["template_induction"] = INDUCTION_GOLDEN_SQL
    return o
