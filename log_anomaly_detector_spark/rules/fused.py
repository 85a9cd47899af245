"""Fused single-pass row rules for the co-located (doc_id-bucketed) layout.

When sequences AND snapshot are bucketed+sorted by doc_id, the entire
row-scope rule pack evaluates in ONE pass with ZERO shuffle:

* the snapshot join is a storage-co-located sort-merge (no Exchange);
* the join output stays partitioned+sorted on doc_id, so the uniqueness
  count is a `Window.partitionBy(doc_id)` with no Exchange and no extra sort;
* n_tok consistency, referential (broadcast), NULL tokens, and the
  token-equality *candidate* flag are column expressions in the same
  projection, exploded into violation rows;
* only the (tiny) token-equality candidate set is persisted and sent through
  the Arrow first-mismatch UDF — the cache keeps the single big scan single.

On a non-co-located layout this plan would shuffle full rows twice (window +
join), so the engine only selects it when `uniqueness_mode == "direct"`;
the layout-agnostic multi-branch path (row_invariants + uniqueness +
token_equality modules) remains the fallback. Both paths are asserted
equivalent in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from log_anomaly_detector_spark.rules.token_equality import first_mismatch

_CAND = "_token_eq_candidate"


def fused_row_violations(
    seqs: DataFrame,
    snapshot: DataFrame,
    allowed: DataFrame,
    dups: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (violations, cache_handle) — caller unpersists the handle
    after materializing the violations.

    ``dups`` (doc_id, dup_cnt), when given, is the duplicate-key set computed
    over the FULL table (engine job 0) so duplicates spanning checkpoint
    batches are caught; on the doc_id-bucketed layout that join is co-located
    (no Exchange) just like the snapshot join. Without ``dups`` the count
    falls back to a window over ``seqs`` itself (standalone single-batch use).
    """
    joined = seqs.join(
        snapshot.select("doc_id", "ref_tokens"), "doc_id", "left"
    ).join(
        F.broadcast(allowed.select("source", F.lit(True).alias("_in_dim"))),
        "source",
        "left",
    )
    if dups is None:
        # window computed as its own projection first — Spark cannot resolve
        # a window expression nested inside the explode/filter lambda below
        joined = joined.withColumn(
            "_dup_cnt", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
        )
    else:
        joined = joined.join(
            dups.select("doc_id", F.col("dup_cnt").alias("_dup_cnt")),
            "doc_id",
            "left",
        )
    dup_cnt = F.col("_dup_cnt")

    def v(cond, rule_id, observed, expected):
        return F.when(
            cond,
            F.struct(
                F.lit(rule_id).alias("rule_id"),
                observed.alias("observed"),
                expected.alias("expected"),
            ),
        )

    viols = F.array(
        v(
            ~(F.col("n_tok") == F.size("tokens")),
            "n_tok_consistency",
            F.concat(F.lit("n_tok="), F.col("n_tok").cast("string")),
            F.concat(F.lit("size(tokens)="), F.size("tokens").cast("string")),
        ),
        v(
            F.col("source").isNotNull() & F.col("_in_dim").isNull(),
            "referential",
            F.col("source"),
            F.lit("member of allowed_sources"),
        ),
        v(
            F.col("tokens").isNull(),
            "null_tokens",
            F.lit("tokens=NULL"),
            F.lit("non-null tokens"),
        ),
        v(
            F.col("doc_id").isNotNull() & (dup_cnt > 1),
            "uniqueness",
            F.concat(F.lit("count="), dup_cnt.cast("string")),
            F.lit("count=1"),
        ),
        v(
            F.col("ref_tokens").isNotNull()
            & ~F.col("tokens").eqNullSafe(F.col("ref_tokens")),
            _CAND,
            F.lit(""),
            F.lit(""),
        ),
    )
    fused = joined.select(
        "part_id",
        "doc_id",
        "tokens",
        "ref_tokens",
        F.explode(F.filter(viols, lambda x: x.isNotNull())).alias("v"),
    ).select("part_id", "doc_id", "tokens", "ref_tokens", "v.*")

    # post-explode rows ≈ violations only — tiny at healthy violation rates;
    # persist so the two union branches share the single big scan
    fused = fused.persist(StorageLevel.MEMORY_AND_DISK)

    plain = fused.filter(F.col("rule_id") != _CAND).select(
        "part_id", "doc_id", "rule_id", "observed", "expected"
    )
    tok = (
        fused.filter(F.col("rule_id") == _CAND)
        .withColumn("m", first_mismatch("tokens", "ref_tokens"))
        .filter(F.col("m.idx") >= 0)
        .select(
            "part_id",
            "doc_id",
            F.lit("token_equality").alias("rule_id"),
            F.concat(
                F.lit("tokens["),
                F.col("m.idx").cast("string"),
                F.lit("]="),
                F.col("m.obs").cast("string"),
            ).alias("observed"),
            F.concat(F.lit("ref="), F.col("m.exp").cast("string")).alias("expected"),
        )
    )
    return plain.unionByName(tok), fused
