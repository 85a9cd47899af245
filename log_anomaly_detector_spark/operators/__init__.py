"""Operator library: one callable per operator family from SURVEY.md §2,
each over the driver-provided testdata tables, with a DuckDB oracle SQL
string where the semantics are ANSI-SQL-expressible.

Modules register into QUERIES/ORACLES dicts consumed by __spark_entry__.
"""

from log_anomaly_detector_spark.operators import multimodal, relational, similarity, text


def all_queries():
    q = {}
    for m in (relational, text, similarity, multimodal):
        q.update(m.QUERIES)
    return q


def all_oracles():
    o = {}
    for m in (relational, text, similarity, multimodal):
        o.update(m.ORACLES)
    return o
