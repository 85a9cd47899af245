"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary aggregate at sf0.001.
``queries()`` exposes one callable per implemented operator family from
SURVEY.md §2 (+ the training-data ops: dedup, similarity, text analysis,
multimodal); ``oracle_sql()`` carries a hard check for ALL 54 — 52 as
DuckDB-equivalent ANSI SQL (including a recursive-CTE LCS for spell_match
and a transitive-closure CTE for dedup_clusters),
hll_distinct as a tolerance-band contract (exact distinct hash-compared +
within-3·rsd boolean the oracle pins TRUE), and template_induction as a
checked-in deterministic golden VALUES literal (the fixpoint is not
SQL-expressible but its converged dim on the sf0.01 fixture is — verified —
deterministic; semantics additionally golden-gated in tests).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from log_anomaly_detector_spark.operators import all_oracles, all_queries
from log_anomaly_detector_spark.operators.relational import q_pricing_summary


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return all_oracles()
