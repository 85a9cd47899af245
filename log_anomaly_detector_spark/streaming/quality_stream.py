"""Ingest-time quality gating of a document stream — the streaming lift of
the batch training-data gates (``operators/text.py`` q_repetition_filter /
q_decontaminate): every landing document is scored ROW-LOCALLY for intra-doc
repetition and checked against a static eval-shingle set, then routed to the
kept corpus or a quarantine sink within the same micro-batch.

Row-local is the design point: the batch repetition metrics are per-document
multiset statistics of the doc's own 3-grams, so they need NO streaming
aggregation state — a single sequential fold over the SORTED gram array
computes (distinct, max run) inside the projection, with values equal to the
batch explode→groupBy by construction (both count duplicates of the same
3-gram multiset; equality is pinned per-doc by test). The decontamination
side is a stream-static broadcast of the benchmark 5-gram set (benchmark-
sized by definition). The whole gate is therefore STATELESS: no watermark,
no state store, bounded memory at any throughput, resumable purely from the
file-source checkpoint.

Reference parity: the reference gates quality row-locally during data prep
too (content-predicate drops, HDFS/data_process.py:60-75); this is that
stage lifted to the metrics the LLM-data literature actually gates on
(Gopher repetition, GPT-3-style eval-overlap), applied at ingest.

Semantics note vs the batch queries: the repetition metrics and thresholds
are IDENTICAL; the contamination decision (any shared 5-gram) is identical,
but the streamed hit count is DISTINCT shared grams (arrays_overlap /
array_intersect are set-valued) where the batch query counts gram POSITIONS
— the boolean gate is the same either way and the parity test pins both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from log_anomaly_detector_spark.functions.text_funcs import word_ngrams, words

DOC_STREAM_SCHEMA = "doc_id long, ts timestamp, text string"

# pinned thresholds — same values as the batch keep/drop flag
# (operators/text.py q_repetition_filter)
DUP_PPM_MAX = 300_000
TOP_PPM_MAX = 200_000


def _rep_fold(grams: Column) -> Column:
    """struct(run, max_run, distinct) from ONE sequential fold over the
    sorted gram array — the row-local equivalent of the batch
    explode → count-per-gram → (sum, count, max) aggregation: sorting
    groups equal grams into runs, so `max run length` IS the max gram
    count and `# of runs` IS the distinct count. O(n) interpreted steps
    per row, bounded by document length; no shuffle, no state."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("max_run"),
        F.lit(0).cast("long").alias("n_distinct"),
    )

    def step(s: Column, x: Column) -> Column:
        same = s["prev"].eqNullSafe(x)  # NULL prev (first gram) → new run
        run = F.when(same, s["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(s["max_run"], run).alias("max_run"),
            (
                s["n_distinct"] + F.when(same, F.lit(0)).otherwise(F.lit(1))
            ).alias("n_distinct"),
        )

    return F.aggregate(F.array_sort(grams), init, step)


def build_eval_grams(spark: SparkSession, benchmark_docs: DataFrame) -> DataFrame:
    """Distinct 5-gram set of a benchmark table (doc_id, text) — the static
    side of the ingest gate. Same construction as the batch
    q_decontaminate eval slice; benchmark-sized by definition, so it
    broadcasts."""
    base = benchmark_docs.filter(F.col("text").isNotNull()).select(
        words(F.col("text")).alias("_ws")
    )
    return (
        base.select(word_ngrams(F.col("_ws"), 5).alias("grams"))
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )


def gate_doc_stream(
    spark: SparkSession,
    input_dir: str,
    eval_grams: DataFrame,
    schema_ddl: str = DOC_STREAM_SCHEMA,
) -> DataFrame:
    """readStream → row-local repetition fold + static-broadcast overlap →
    (doc_id, ts, n_3grams, dup_3gram_ppm, top_3gram_ppm,
    eval_hits_distinct, contaminated, keep). Callers attach a sink.

    Docs too short to score (<3 words → no 3-grams) pass the repetition
    gate with NULL metrics — absence of evidence is not a drop reason; the
    batch query simply excludes them, and the parity test covers both
    conventions. The eval side rides as ONE broadcast row holding the
    sorted gram array (stream-static join, re-broadcast per micro-batch at
    benchmark size — trivial)."""
    stream = spark.readStream.schema(schema_ddl).parquet(input_dir)
    # word_ngrams caller contract: PROJECT the token array first — an
    # inlined split re-evaluates per element reference inside the
    # interpreted lambda (functions/text_funcs.py)
    toks = stream.select(
        "doc_id", "ts", words(F.col("text")).alias("_ws")
    )
    grammed = toks.select(
        "doc_id",
        "ts",
        word_ngrams(F.col("_ws"), 3).alias("_g3"),
        word_ngrams(F.col("_ws"), 5).alias("_g5"),
    )
    # project the fold ONCE, extract fields in the NEXT projection (same
    # CollapseProject protection: a multiply-referenced alias is never
    # re-inlined, so the fold runs once per row, not once per metric)
    folded = grammed.select(
        "doc_id", "ts", "_g5", F.size("_g3").cast("long").alias("n_3grams"),
        _rep_fold(F.col("_g3")).alias("_rep"),
    )
    metrics = folded.select(
        "doc_id",
        "ts",
        "_g5",
        "n_3grams",
        F.expr(
            "CASE WHEN n_3grams > 0 THEN"
            " (n_3grams - _rep.n_distinct) * 1000000 DIV n_3grams END"
        ).alias("dup_3gram_ppm"),
        F.expr(
            "CASE WHEN n_3grams > 0 THEN"
            " _rep.max_run * 1000000 DIV n_3grams END"
        ).alias("top_3gram_ppm"),
    )
    eval_row = F.broadcast(
        eval_grams.agg(
            F.array_sort(F.collect_list("gram")).alias("_eval_grams")
        )
    )
    joined = metrics.join(eval_row, F.lit(True), "left")
    rep_ok = ~(
        (F.col("dup_3gram_ppm") > DUP_PPM_MAX)
        | (F.col("top_3gram_ppm") > TOP_PPM_MAX)
    )
    contaminated = F.arrays_overlap(F.col("_g5"), F.col("_eval_grams"))
    return joined.select(
        "doc_id",
        "ts",
        "n_3grams",
        "dup_3gram_ppm",
        "top_3gram_ppm",
        F.size(F.array_intersect(F.col("_g5"), F.col("_eval_grams"))).alias(
            "eval_hits_distinct"
        ),
        contaminated.alias("contaminated"),
        (F.coalesce(rep_ok, F.lit(True)) & ~contaminated).alias("keep"),
    )


def run_quality_gate_once(
    spark: SparkSession,
    input_dir: str,
    eval_grams: DataFrame,
    checkpoint: str,
    kept_dir: str,
    quarantine_dir: str,
    schema_ddl: str = DOC_STREAM_SCHEMA,
) -> DataFrame:
    """Drain all available input through the gate, routing each micro-batch
    to TWO parquet sinks in one pass (foreachBatch: kept corpus +
    quarantine with full metrics for audit), then return the kept rows.

    foreachBatch gives dual sinks at the cost of exactly-once: a batch
    retried after a mid-write crash can append twice. The production
    pattern is idempotent per-batch output paths (partition by batch_id and
    overwrite); this drain helper targets local smoke runs, same caveat
    discipline as run_dedup_stream_once."""

    def _route(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            batch_df.filter(F.col("keep")).drop("keep").write.mode(
                "append"
            ).parquet(kept_dir)
            batch_df.filter(~F.col("keep")).write.mode("append").parquet(
                quarantine_dir
            )
        finally:
            batch_df.unpersist()

    q = (
        gate_doc_stream(spark, input_dir, eval_grams, schema_ddl)
        .writeStream.foreachBatch(_route)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(kept_dir)
    except AnalysisException as ex:
        cond = (
            ex.getCondition()
            if hasattr(ex, "getCondition")
            else ex.getErrorClass()
        )
        # foreachBatch sinks are PLAIN parquet dirs (no _spark_metadata), so
        # an empty drain leaves NO directory at all — PATH_NOT_FOUND is the
        # only benign condition here; anything else surfaces
        if cond != "PATH_NOT_FOUND":
            raise
        return spark.createDataFrame(
            [],
            "doc_id long, ts timestamp, n_3grams long, dup_3gram_ppm long,"
            " top_3gram_ppm long, eval_hits_distinct int, contaminated"
            " boolean",
        )
