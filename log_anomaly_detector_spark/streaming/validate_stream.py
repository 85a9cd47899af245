"""Micro-batch streaming validation (the /detect request loop, lifted).

``readStream`` over a directory of sequence parquet files; each micro-batch
runs the shuffle-free row rules (n_tok consistency + referential broadcast
anti-join) plus windowed per-source counts, and appends violations to a sink
directory. Checkpointing makes the stream resumable — the streaming analogue
of the engine's manifest (R10).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from log_anomaly_detector_spark.rules.row_invariants import (
    ntok_consistency_violations,
    referential_violations,
)

SEQ_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("n_tok", IntegerType()),
        StructField("source", StringType()),
        StructField("part_id", IntegerType()),
    ]
)


def validate_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    allowed: DataFrame,
    await_all: bool = True,
):
    """Start (and optionally drain) the streaming validation query.

    Returns the StreamingQuery. With ``await_all`` the call blocks until all
    currently-available files are processed, then stops — the synchronous
    smoke mode; in production the query just keeps running.
    """
    viol_dir = os.path.join(out_dir, "violations_stream")
    ckpt_dir = os.path.join(out_dir, "checkpoint")

    stream = spark.readStream.schema(SEQ_SCHEMA).parquet(input_dir)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        viol = ntok_consistency_violations(batch_df).unionByName(
            referential_violations(batch_df, allowed)
        )
        (
            viol.withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("append")
            .parquet(viol_dir)
        )

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_all:
        q.awaitTermination()
    return q
