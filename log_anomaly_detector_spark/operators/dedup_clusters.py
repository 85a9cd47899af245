"""Near-dup cluster resolution: pair graph → connected components →
canonical document per cluster.

The reference dedupes at two granularities — exact duplicate drop during
data prep (HDFS/data_process.py's set-based block dedup) and template-level
merging (Drain/Spell cluster upkeep). A training-data pipeline needs the
step BETWEEN pair generation and keep-one-per-group: near-dup pairs
(Jaccard/MinHash/embedding — all implemented in this repo) are edges of a
graph whose CONNECTED COMPONENTS are the duplicate clusters; the canonical
doc is the minimum id in each component (keep it, drop the rest).

Spark lift: iterative min-label propagation —

    label(v) ← min(label(v), min over neighbors' labels)

converges in graph-diameter rounds (duplicate clusters are shallow by
construction: near-dup similarity is almost-transitive, so diameters are
small). Each round is one keyed join + one grouped min; per-round driver
state is ONE scalar (the changed-label count), and the label DataFrame is
``localCheckpoint``-ed every round — an iterative plan that re-references
itself doubles its logical tree per round and melts the analyzer (see
CLAUDE.md). Rounds are capped with a clear error, not an unbounded loop.

Scale shape: edges shuffle once per round keyed by node; components never
materialize driver-side; the big-data analogue (large-star/small-star) has
the same per-round shape — this is the diameter-bounded variant, the right
trade for dedup graphs. Deterministic (min over ids) → HARD DuckDB oracle
via a recursive-CTE transitive closure over the same Jaccard pair query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_anomaly_detector_spark.operators.text import _JACCARD_SQL


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 20,
) -> DataFrame:
    """(node, component_id) for every node in ``pairs``; component_id = the
    minimum node id reachable from it. Raises after ``max_rounds`` non-
    converged rounds (a duplicate graph with diameter > 20 means the pair
    generator is linking non-duplicates — fail loudly, don't spin)."""
    edges = pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    edges = (
        edges.unionByName(edges.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("s").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        nbr = edges.join(
            labels.withColumnRenamed("node", "d"), "d"
        ).select(F.col("s").alias("node"), "label")
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()  # truncate lineage: flat plan every round
        )
        changed = (
            new_labels.withColumnRenamed("label", "new_label")
            .join(labels, "node")
            .filter(F.col("new_label") != F.col("label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("label").alias("component_id"))
    raise ValueError(
        f"connected_components did not converge within max_rounds={max_rounds} "
        "rounds — the pair graph has a longer diameter than any plausible "
        "duplicate cluster; check the pair generator's threshold."
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters over the exact 3-gram-Jaccard near-dup pairs:
    (doc_id, component_id, keep) — keep=True on the canonical (minimum)
    doc of each cluster, False on the members a dedup pass would drop."""
    from log_anomaly_detector_spark.operators.text import q_jaccard_near_dup

    pairs = q_jaccard_near_dup(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs)
    return comp.select(
        F.col("node").alias("doc_id"),
        "component_id",
        (F.col("node") == F.col("component_id")).alias("keep"),
    )


_CLUSTERS_SQL = f"""
WITH RECURSIVE jacc AS ({_JACCARD_SQL}),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM jacc
  UNION
  SELECT doc_b AS s, doc_a AS d FROM jacc
),
reach(s, d) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
)
SELECT s AS doc_id,
       least(s, min(d)) AS component_id,
       s = least(s, min(d)) AS keep
FROM reach GROUP BY s
"""

QUERIES = {"dedup_clusters": q_dedup_clusters}
ORACLES = {"dedup_clusters": _CLUSTERS_SQL}
