"""Tabular sources/sinks: schema-pinned CSV scan (S3), plain-text sequence
sink/scan round-trip (S9/S7).

Reference: ``pd.read_csv(..., dtype={...}, na_filter=False)`` pins dtypes at
``HDFS/data_process.py:79-80``; the sequence sink space-joins tokens one row
per line (``HDFS/data_process.py:126-130`` — which ``eval()``s CSV cells, a
wart we do not reproduce).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_csv_pinned(spark: SparkSession, path: str, schema_ddl: str) -> DataFrame:
    """CSV scan with an explicit schema — never inferSchema (a full extra
    pass at scale) and never dtype re-inference."""
    return spark.read.schema(schema_ddl).option("header", "true").csv(path)


def write_sequence_text(df: DataFrame, path: str, tokens_col: str = "tokens") -> None:
    """One space-joined token row per line (the reference's model-input file)."""
    df.select(
        F.array_join(F.col(tokens_col).cast("array<string>"), " ").alias("value")
    ).write.mode("overwrite").text(path)
