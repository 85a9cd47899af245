"""Similarity search over the `embeddings` table (array<float> column).

* brute-force cosine top-k — the exactness baseline: query×candidate join,
  dot products via zip_with/aggregate (JVM-side, no Python);
* LSH-bucketed ANN — the scale path: deterministic random-hyperplane
  signatures, candidates only within matching buckets.

At 100 TB the brute-force variant is only for small query sets against a
broadcastable candidate slice; the LSH variant keeps the join keyed on the
signature so the shuffle is bucket-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from log_anomaly_detector_spark.operators.relational import t

TOP_K = 5
N_QUERIES = 5


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for the first N_QUERIES vectors. All arithmetic
    on array<double> with a sequential fold — deterministic, oracle-safe."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("v").alias("cv"))
    cos = F.round(
        _dot(F.col("qv"), F.col("cv"))
        / (F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))),
        6,
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        q.join(c, F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


_COSINE_SQL = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         round(list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))),
               6) AS cosine
  FROM emb q JOIN emb c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
)
SELECT q_id, c_id, cosine,
       cast(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS int) AS rank
FROM scored
QUALIFY rank <= {TOP_K}
"""


# multi-table random-hyperplane LSH: L independent tables of P planes each.
# One table of many planes has vanishing recall for ~60-degree neighbors
# (P(match) = (1 - θ/π)^planes), so candidates are the UNION over tables —
# the standard (k, L) construction. Recall at sf0.01 vs exact top-5: ~0.9.
N_TABLES = 12
PLANES_PER_TABLE = 4


def _plane_table(spark: SparkSession, dim: int) -> DataFrame:
    """Deterministic hyperplanes: sign(xxhash64(t, k, i)) — tiny
    (L × P × dim), always broadcast."""
    tables = spark.range(N_TABLES).select(F.col("id").alias("tbl"))
    planes = spark.range(PLANES_PER_TABLE).select(F.col("id").alias("k"))
    dims = spark.range(dim).select(F.col("id").alias("i"))
    return tables.crossJoin(planes).crossJoin(dims).select(
        "tbl",
        "k",
        "i",
        (F.pmod(F.xxhash64(F.col("tbl"), F.col("k"), F.col("i")), F.lit(2)) * 2 - 1)
        .cast("double")
        .alias("sign"),
    )


def _lsh_buckets(spark: SparkSession, emb: DataFrame) -> DataFrame:
    """(vec_id, tbl, bucket) — one row per vector per table."""
    dim = emb.select(F.size("v").alias("d")).first()["d"]
    comp = emb.select("vec_id", F.posexplode("v").alias("i", "x")).join(
        F.broadcast(_plane_table(spark, dim)), "i"
    )
    return (
        comp.groupBy("vec_id", "tbl", "k")
        .agg(F.sum(F.col("x") * F.col("sign")).alias("proj"))
        .groupBy("vec_id", "tbl")
        .agg(
            F.sum(
                F.when(
                    F.col("proj") > 0, F.expr("shiftleft(1L, cast(k as int))")
                ).otherwise(F.lit(0))
            ).alias("bucket")
        )
    )


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table hyperplane LSH → union of bucket candidates → exact cosine
    top-k. Approximate (recall < 1) → rows-only check."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    buckets = _lsh_buckets(spark, emb)
    q = buckets.join(
        emb.filter(F.col("vec_id") < N_QUERIES), "vec_id"
    ).select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "tbl", "bucket")
    c = buckets.select(F.col("vec_id").alias("c_id"), "tbl", "bucket")
    cand = (
        q.join(c, ["tbl", "bucket"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "qv", "c_id")
        .dropDuplicates(["q_id", "c_id"])  # union over tables
        .join(emb.select(F.col("vec_id").alias("c_id"), F.col("v").alias("cv")), "c_id")
    )
    cos = F.round(
        _dot(F.col("qv"), F.col("cv"))
        / (F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))),
        6,
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        cand.select("q_id", "c_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


# --- A9: per-dimension mean over vectors (hypersphere center = mean of
# embeddings, bert_pytorch/train_log.py:160-181) — posexplode + grouped avg;
# sums taken per-row-scaled-integer for oracle determinism (see
# q_pricing_summary note). ---------------------------------------------------
def q_embedding_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x")
    )
    return (
        comp.filter(F.col("dim") < 8)  # first 8 dims keep the output compact
        .groupBy("label", "dim")
        .agg(
            F.round(
                F.sum(F.floor(F.col("x") * 1e6)) / 1e6 / F.count(F.lit(1)), 6
            ).alias("mean_x"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_EMB_MEAN_SQL = """
SELECT label, cast(i - 1 AS int) AS dim,
       round(sum(cast(floor(x * 1e6) AS bigint)) / 1e6 / count(*), 6) AS mean_x,
       count(*) AS n
FROM (
  SELECT label,
         generate_subscripts(embedding::DOUBLE[], 1) AS i,
         unnest(embedding::DOUBLE[]) AS x
  FROM embeddings
)
WHERE i <= 8
GROUP BY 1, 2
"""


# --- embedding-cosine near-dup dedup: all pairs above a high cosine
# threshold (the embedding analogue of MinHash near-dup). Brute force is fine
# at oracle scale; the LSH-bucketed variant (q_ann_lsh) is the scale path. ---
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    cos = F.round(
        _dot(F.col("va"), F.col("vb"))
        / (F.sqrt(_dot(F.col("va"), F.col("va"))) * F.sqrt(_dot(F.col("vb"), F.col("vb")))),
        6,
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= 0.45)
    )


_EMB_NEARDUP_SQL = """
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
             6) AS cosine
FROM emb a JOIN emb b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
            6) >= 0.45
"""


# --- IVF ANN: the other scale path for similarity search. Deterministic
# build: K seed centroids (first K vectors) + ONE Lloyd refinement, both as
# pure DataFrame ops (assignment = broadcast join + argmax window; centroid
# update = posexplode + per-dim mean + ordered re-collect). Search probes the
# nprobe nearest inverted lists only — at 10^12 vectors the exact-scoring
# join touches ~nprobe/K of the table instead of all of it. -------------------
N_CENTROIDS = 16
N_PROBE = 4


def _cos(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, cid) — nearest centroid by cosine; broadcast K×dim table."""
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "v", "cid", _cos(F.col("v"), F.col("cv")).alias("sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "cid")
    )


def build_ivf(emb: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Returns (centroids(cid, cv), index(vec_id, v, cid))."""
    c0 = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    a0 = _assign(emb, c0)
    # one Lloyd step: per-dim mean of each cluster, arrays rebuilt in order
    comp = a0.select("cid", F.posexplode("v").alias("dim", "x"))
    c1 = (
        comp.groupBy("cid", "dim")
        .agg(F.avg("x").alias("mx"))
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mx"))),
                lambda s: s["mx"],
            ).alias("cv")
        )
    )
    return c1, _assign(emb, c1)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k: probe the N_PROBE nearest centroids per query, exact cosine
    within those lists only. Approximate recall → rows-only check."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    centroids, index = build_ivf(emb)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "q_id", "qv", "cid", _cos(F.col("qv"), F.col("cv")).alias("csim")
    )
    wprobe = Window.partitionBy("q_id").orderBy(F.desc("csim"), F.asc("cid"))
    probes = (
        qc.withColumn("rn", F.row_number().over(wprobe))
        .filter(F.col("rn") <= N_PROBE)
        .select("q_id", "qv", "cid")
    )
    cand = probes.join(
        index.select(F.col("vec_id").alias("c_id"), F.col("v").alias("cv_"), "cid"),
        "cid",
    ).filter(F.col("q_id") != F.col("c_id"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        cand.select(
            "q_id", "c_id", F.round(_cos(F.col("qv"), F.col("cv_")), 6).alias("cosine")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


QUERIES = {
    "cosine_topk": q_cosine_topk,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "embedding_mean": q_embedding_mean,
    "embedding_near_dup": q_embedding_near_dup,
}

ORACLES = {
    "cosine_topk": _COSINE_SQL,
    # ann_lsh: approximate by design → rows-only
    "embedding_mean": _EMB_MEAN_SQL,
    "embedding_near_dup": _EMB_NEARDUP_SQL,
}
