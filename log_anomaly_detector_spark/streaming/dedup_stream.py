"""Streaming exact dedup of a continuously-landing document stream.

The reference dedupes batches with an in-memory ``set`` during data prep
(HDFS/data_process.py — set-based block dedup); the batch lift is
``operators.text.q_exact_dup_groups`` (hash → groupBy). This is the INGEST
lift: a file-source stream of documents, deduped on a normalized content
fingerprint as they land, so the training corpus never admits a byte-copy
twice even when the copies arrive in different micro-batches.

Scale shape: ``dropDuplicatesWithinWatermark`` keys the state store by the
16-byte fingerprint only — state is bounded by (unique docs per watermark
horizon), NOT by corpus size, and expires automatically; a plain streaming
``dropDuplicates`` would grow state forever. Content never enters the state
store (the fingerprint is computed map-side, the same md5-of-normalized-text
as ``operators.text.fingerprint`` — a whitespace/case-variant copy dedupes
too). Each micro-batch shuffles once on the fingerprint; everything else is
narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from log_anomaly_detector_spark.functions.text_funcs import fingerprint

DOC_STREAM_SCHEMA = "doc_id long, ts timestamp, text string"


def dedup_doc_stream(
    spark: SparkSession,
    input_dir: str,
    schema_ddl: str = DOC_STREAM_SCHEMA,
    watermark: str = "1 hour",
) -> DataFrame:
    """readStream → normalized-content fingerprint →
    ``dropDuplicatesWithinWatermark(fp)``. Returns the streaming DataFrame
    of FIRST-SEEN documents (doc_id, ts, fp); callers attach a sink.

    Duplicates arriving within the watermark horizon of the first copy are
    dropped across micro-batch boundaries; a copy arriving later than the
    horizon is admitted again (the documented trade for bounded state — run
    a periodic batch `q_exact_dup_groups` sweep to catch stragglers).
    """
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(schema_ddl).parquet(input_dir)
    return (
        stream.withColumn("fp", fingerprint(F.col("text")))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
        .select("doc_id", "ts", "fp")
    )


def run_dedup_stream_once(
    spark: SparkSession,
    input_dir: str,
    checkpoint: str,
    out_dir: str,
    schema_ddl: str = DOC_STREAM_SCHEMA,
    watermark: str = "1 hour",
) -> DataFrame:
    """Drain all available input through the dedup stream into a parquet
    sink (synchronous smoke mode) and return the admitted rows. A parquet
    sink — unlike memory — supports CHECKPOINT RECOVERY: re-running with the
    same checkpoint resumes the state store, so duplicates of documents
    admitted in a previous run are still dropped (within the watermark) and
    already-processed input files are not re-read."""
    dd = dedup_doc_stream(spark, input_dir, schema_ddl, watermark)
    q = (
        dd.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(out_dir)
    except AnalysisException as ex:
        # zero micro-batches ever fired (no input since the checkpoint began)
        # — the sink holds no data files to infer a schema from; return an
        # empty, correctly-typed result instead of surfacing the sink's
        # internal state as an error. Any OTHER analysis failure (corrupt /
        # foreign files in out_dir) must surface, not read as "no documents".
        # the metadata-only sink dir raises _LEGACY_ERROR_TEMP_1134 with this
        # message on this Spark build; match both the structured conditions
        # and the legacy message so only the no-data cases read as empty
        cond = (
            ex.getCondition()
            if hasattr(ex, "getCondition")  # 4.0+; getErrorClass deprecated
            else ex.getErrorClass()
        )
        benign = cond in (
            "UNABLE_TO_INFER_SCHEMA",
            "PATH_NOT_FOUND",
        ) or "Unable to infer schema" in str(ex)
        if not benign:
            raise
        return spark.createDataFrame([], "doc_id long, ts timestamp, fp string")
