"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked deterministic stub — but the Spark-side plumbing is real and
tested: binary columns, schema, Arrow batch shape through ``mapInPandas``,
and partition-count preservation. Swapping ``_fake_decode`` for a real
``PIL.Image.open``/``soundfile.read`` is a one-function change on the
executor side.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_anomaly_detector_spark.operators.relational import t

FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, mean_byte double, width int, height int, codec string"
)


def binary_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model an asset table: (doc_id, payload binary, codec). The payload is
    the utf-8 encoded document text standing in for an opaque media blob."""
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("png")).otherwise(F.lit("wav")).alias(
            "codec"
        ),
    )


def q_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary columns — JVM-side only (length + sha2)."""
    b = binary_payloads(spark, sf_dir)
    return b.select(
        "doc_id",
        "codec",
        F.length("payload").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha256"),
    )


_BINMETA_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS codec,
       cast(octet_length(encode(text)) AS int) AS n_bytes,
       sha256(text) AS sha256
FROM documents
"""


def _fake_decode(payload: bytes, codec: str) -> tuple[int, int]:
    """STUB decoder — deterministic fake dimensions derived from the payload.

    Real deployment: replace with an actual codec call; the surrounding
    Arrow/mapInPandas plumbing is unchanged. (Media libraries are not
    installed in this environment by design.)
    """
    h = len(payload)
    return (h % 640) + 16, (h % 480) + 16


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: vectorized byte stats + (stubbed) decode dims.
    Arrow-batched; the only per-row Python is the stub decode call itself."""
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.str.len().astype("int32")
        mean_byte = np.array(
            [np.frombuffer(p, dtype=np.uint8).mean() if len(p) else 0.0 for p in payloads]
        )
        dims = [_fake_decode(p, c) for p, c in zip(payloads, pdf["codec"])]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "mean_byte": np.round(mean_byte, 6),
                "width": np.array([d[0] for d in dims], dtype="int32"),
                "height": np.array([d[1] for d in dims], dtype="int32"),
                "codec": pdf["codec"],
            }
        )


def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary columns via mapInPandas. The decode is
    a stub, but a DETERMINISTIC one — so the oracle below re-derives every
    output from the payload in SQL, verifying the Arrow plumbing (batch
    shape, schema, vectorized byte stats) end to end. A real codec would
    return this query to a rows-only check.

    NULL payloads are excluded JVM-side BEFORE the Arrow stage (the same
    semantics as NULL vectors in the similarity tier): a missing blob has
    no bytes to featurize, and the kernel's ``np.frombuffer`` would throw
    on None — caught by the null-payload sweep (tests/test_null_inputs.py).
    The oracle SQL pins the identical filter."""
    return (
        binary_payloads(spark, sf_dir)
        .filter(F.col("payload").isNotNull())
        .mapInPandas(extract_features, schema=FEATURE_SCHEMA)
    )


# payload = utf-8(text), ASCII by construction → byte mean == mean of char
# code points; numpy's float64 mean of ≤255-valued ints is the exact integer
# ratio, and np.round / DuckDB round are both half-even.
_MMFEAT_SQL = """
SELECT doc_id,
       cast(octet_length(encode(text)) AS int) AS n_bytes,
       round(list_sum(list_transform(string_split(text, ''), c -> ord(c)))
             * 1.0 / octet_length(encode(text)), 6) AS mean_byte,
       cast((octet_length(encode(text)) % 640) + 16 AS int) AS width,
       cast((octet_length(encode(text)) % 480) + 16 AS int) AS height,
       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS codec
FROM documents
WHERE text IS NOT NULL
"""


QUERIES = {
    "binary_meta": q_binary_meta,
    "mm_features": q_mm_features,
}

ORACLES = {
    "binary_meta": _BINMETA_SQL,
    "mm_features": _MMFEAT_SQL,
}
