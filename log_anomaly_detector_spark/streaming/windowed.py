"""Windowed streaming aggregation with watermark + late-data handling.

The reference has no time windows (SURVEY.md §2.5) — this is the Structured
Streaming lift of its per-request counting (``api/log_sequences.py:64-70``)
to a continuously-running tumbling-window aggregate over an event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    schema_ddl: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """readStream → watermark → tumbling-window counts per event_type.
    Returns the streaming DataFrame; callers attach a sink."""
    stream = spark.readStream.schema(schema_ddl).parquet(input_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100)).alias("value_c"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "value_c",
        )
    )


def run_windowed_counts_once(
    spark: SparkSession, input_dir: str, schema_ddl: str, checkpoint: str,
    query_name: str = "windowed_counts",
) -> DataFrame:
    """Drain all available input through the streaming query into a memory
    sink (synchronous smoke mode) and return the result as a DataFrame."""
    agg = windowed_event_counts(spark, input_dir, schema_ddl)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}")
