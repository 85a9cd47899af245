"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference accumulates per-block event sequences incrementally across
requests (DB-backed warm state: ``build_event_sequences_v3`` re-reads lines
per block, ``api/detect_anomaly_sequence_v2.py:147-190``). The streaming lift
keeps that state in Spark's state store instead: per ``doc_id``, a running
token count + violation count across micro-batches, emitting an updated
verdict row whenever the group receives new rows.

State schema: (n_rows long, n_tok_sum long, n_bad long).
Output: (doc_id, n_rows, n_tok_sum, n_bad, anomaly_score, label) — score =
n_bad/n_rows rounded 6dp, label via ``>=`` threshold (reference semantics,
config.py).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
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

OUTPUT_SCHEMA = (
    "doc_id string, n_rows long, n_tok_sum long, n_bad long, "
    "anomaly_score double, label string"
)
STATE_SCHEMA = "n_rows long, n_tok_sum long, n_bad long"

SEQ_THRESHOLD = 0.2  # API default, main.py:127


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n_rows, n_tok_sum, n_bad = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n_rows += len(pdf)
        n_tok_sum += int(pdf["n_tok"].sum())
        # violation within the stream: declared length disagrees with array
        n_bad += int((pdf["n_tok"] != pdf["tokens"].str.len()).sum())
    state.update((n_rows, n_tok_sum, n_bad))
    score = round(n_bad / n_rows, 6) if n_rows else 0.0
    yield pd.DataFrame(
        {
            "doc_id": [key[0]],
            "n_rows": [n_rows],
            "n_tok_sum": [n_tok_sum],
            "n_bad": [n_bad],
            "anomaly_score": [score],
            "label": ["Anomaly" if score >= SEQ_THRESHOLD else "Normal"],
        }
    )


def stateful_doc_scores(spark: SparkSession, input_dir: str) -> DataFrame:
    """readStream → groupBy(doc_id) → applyInPandasWithState accumulator."""
    stream = spark.readStream.schema(SEQ_SCHEMA).parquet(input_dir)
    return stream.groupBy("doc_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_once(
    spark: SparkSession, input_dir: str, checkpoint: str, out_dir: str
) -> DataFrame:
    """Drain available input, appending per-batch updates to ``out_dir``
    (foreachBatch parquet — checkpoint-recoverable, unlike the memory sink).
    Returns the LATEST state row per doc_id."""
    import pyspark.sql.functions as F

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.withColumn("epoch_id", F.lit(epoch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        stateful_doc_scores(spark, input_dir)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    all_rows = spark.read.parquet(out_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("epoch_id"), F.desc("n_rows"))
    return (
        all_rows.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "epoch_id")
    )
