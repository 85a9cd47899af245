"""Online template matching over a log-line stream — the reference's v2
detection loop (``parse_and_store_log_lines``, Drain.py:329-423) as
Structured Streaming: raw lines arrive in a file-source stream, each
micro-batch is parsed (shared ``structure_lines`` core), matched against the
WARM template dim, and lines fitting no known template are flagged anomalous
and appended to the sink — exactly the reference's "never seen this shape
before" alert (Drain.py:367-373), minus the dim mutation: in the streaming
setting new-template founding is a batch (re-)induction concern
(operators/template_induction), so the stream stays side-effect-free on the
dim and restart-safe via the checkpoint.

Scale shape: the dim is broadcast (dim-sized by definition), every batch is
one narrow parse projection + one broadcast similarity join — no state store
growth, no shuffle keyed on anything unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_anomaly_detector_spark.operators.template_match import match_templates
from log_anomaly_detector_spark.sources.logtext import (
    DEFAULT_CONTENT_REXES,
    DEFAULT_LOGFORMAT,
    structure_lines,
)


def match_log_stream(
    spark: SparkSession,
    input_dir: str,
    templates: DataFrame,
    out_dir: str,
    st: float = 0.5,
    logformat: str = DEFAULT_LOGFORMAT,
    content_rexes: tuple[str, ...] = DEFAULT_CONTENT_REXES,
    matcher: str = "drain",
) -> None:
    """Drain one pass over everything currently in ``input_dir``
    (``availableNow`` trigger — restartable: the checkpoint remembers
    consumed files) and append per-line match results to
    ``{out_dir}/matched`` parquet.

    ``templates``: warm dim with a ``template`` string column (the same
    contract as induce_templates' warm start).

    ``matcher``: "drain" (positional similarity, the default) or "spell"
    (LCS similarity, the reference's second parser family) — both accept a
    line iff score ≥ ``st`` (Spell's score = lcs_len/|seq|, exactly its
    tau·|seq| acceptance rewritten as a ratio), both broadcast the dim."""
    if matcher not in ("drain", "spell"):
        raise ValueError(f"matcher must be 'drain' or 'spell', got {matcher!r}")
    tmpl = templates.select(
        F.col("template").alias("template_id"),
        F.split(F.trim("template"), " +").alias("template_tokens"),
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        structured = structure_lines(
            batch_df.withColumn("LineId", F.monotonically_increasing_id()),
            logformat,
            content_rexes,
        ).filter("_parsed")
        lines = structured.select(
            "LineId",
            F.split(F.trim("EventTemplate"), " +").alias("tokens"),
        )
        if matcher == "spell":
            from log_anomaly_detector_spark.operators.spell_match import (
                spell_match,
            )

            matched = spell_match(
                lines,
                tmpl,
                tau=st,
                line_id="LineId",
                line_tokens="tokens",
                template_id="template_id",
                template_tokens="template_tokens",
            )
        else:
            matched = match_templates(
                lines,
                tmpl,
                st=st,
                line_id="LineId",
                line_tokens="tokens",
                template_id="template_id",
                template_tokens="template_tokens",
            )
        joined = structured.join(matched, "LineId", "left")
        if matcher == "spell":
            # Spell's score as a ratio — the token count comes straight off
            # the already-joined structured row (no extra per-batch join)
            joined = joined.withColumn(
                "similarity",
                F.round(
                    F.col("lcs_len")
                    / F.size(F.split(F.trim("EventTemplate"), " +")),
                    6,
                ),
            )
        out = joined.select(
            "LineId",
            "Content",
            "EventTemplate",
            F.col("matched_template_id"),
            "similarity",
            F.col("matched_template_id").isNull().alias("is_anomaly"),
            F.lit(epoch_id).alias("epoch_id"),
        )
        out.write.mode("append").parquet(f"{out_dir}/matched")

    q = (
        spark.readStream.text(input_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
