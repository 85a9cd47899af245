#!/usr/bin/env python
"""Deterministic at-scale documents/embeddings tables for per-query scaling
runs (same schema as the driver's testdata documents/embeddings, generated
entirely with Spark expressions — seed-free determinism via xxhash64 of the
row id, so any parallelism produces identical bytes).

Corpus shape mirrors a web dedup workload rather than the tiny word-salad
testdata: each doc is 20 tokens — ~30% from a 50-word common vocabulary,
~70% from a corpus-sized rare pool (n_docs/10 distinct tokens), so shingle
document-frequency has a realistic long tail. Every doc_id ≡ 1 (mod 100)
is a PLANTED near-dup of its predecessor (same 20 tokens except the last →
3-gram Jaccard 17/23 ≈ 0.74 ≥ 0.7), giving the dedup queries a true ~1%
duplicate rate to find. Embeddings are 64-dim hash-derived uniforms in
[-1, 1); every vec_id ≡ 1 (mod 100) duplicates its predecessor's vector
(cosine 1.0 planted neighbors).

Usage: python tools/gen_scale_docs.py --out /tmp/lad_docs500k \
           --n-docs 500000 --n-vecs 500000 [--parts 32]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COMMON = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "block", "node", "shard", "query",
    "plan", "join", "sort", "read", "write", "cache", "disk", "net",
    "warm", "cold", "byte", "page", "heap", "task", "stage", "core",
    "skew", "salt", "probe", "build", "map", "fold", "emit", "sink",
    "source", "field", "token", "label", "score", "bound", "limit",
    "range", "group",
]

N_WORDS = 20
DIM = 64


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-docs", type=int, default=500_000)
    ap.add_argument("--n-vecs", type=int, default=500_000)
    ap.add_argument("--parts", type=int, default=32)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from log_anomaly_detector_spark.session import get_spark

    spark = get_spark("gen_scale_docs", master=args.master)
    os.makedirs(args.out, exist_ok=True)

    rare_pool = max(args.n_docs // 10, 1000)
    ids = spark.range(args.n_docs, numPartitions=args.parts).select(
        F.col("id").alias("doc_id")
    )
    base = F.when(F.col("doc_id") % 100 == 1, F.col("doc_id") - 1).otherwise(
        F.col("doc_id")
    )

    def word(i: int):
        h = F.xxhash64(base, F.lit(i))
        common = F.element_at(F.lit(COMMON), (F.pmod(h, 50) + 1).cast("int"))
        rare = F.concat(F.lit("w"), F.pmod(F.xxhash64(base, F.lit(i), F.lit(7)), rare_pool))
        w = F.when(F.pmod(h, 10) < 3, common).otherwise(rare)
        if i == N_WORDS - 1:
            # planted near-dups diverge ONLY here (their own id, not base)
            return F.when(
                F.col("doc_id") % 100 == 1, F.concat(F.lit("x"), F.col("doc_id"))
            ).otherwise(w)
        return w

    text = F.concat_ws(" ", *[word(i) for i in range(N_WORDS)])
    docs = ids.select(
        "doc_id",
        text.alias("text"),
        F.lit("en").alias("lang"),
        F.lit("synthetic-scale").alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )
    docs.write.mode("overwrite").parquet(os.path.join(args.out, "documents.parquet"))

    vids = spark.range(args.n_vecs, numPartitions=args.parts).select(
        F.col("id").alias("vec_id")
    )
    vbase = F.when(F.col("vec_id") % 100 == 1, F.col("vec_id") - 1).otherwise(
        F.col("vec_id")
    )
    # hash-uniform in [-1, 1): xxhash64 → pmod 1e6 → scale (exact at any
    # parallelism; FLOAT[] like the driver tables)
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda d: (
            (F.pmod(F.xxhash64(vbase, d, F.lit(13)), 2_000_000) - 1_000_000)
            / 1_000_000.0
        ).cast("float"),
    )
    vecs = vids.select(
        "vec_id",
        emb.alias("embedding"),
        F.pmod(F.col("vec_id"), 16).cast("int").alias("label"),
    )
    vecs.write.mode("overwrite").parquet(os.path.join(args.out, "embeddings.parquet"))

    print(
        f"wrote {args.out}: documents={args.n_docs} embeddings={args.n_vecs}"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
