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


N_PLANES = 6  # 64 buckets — sized so sf0.01's 500 vectors give ~8/bucket


def _plane_table(spark: SparkSession, dim: int) -> DataFrame:
    """Deterministic pseudo-random hyperplanes: sign(xxhash64(k, i)) — tiny
    (N_PLANES × dim), always broadcast."""
    planes = spark.range(N_PLANES).select(F.col("id").alias("k"))
    dims = spark.range(dim).select(F.col("id").alias("i"))
    return planes.crossJoin(dims).select(
        "k",
        "i",
        (F.pmod(F.xxhash64(F.col("k"), F.col("i")), F.lit(2)) * 2 - 1)
        .cast("double")
        .alias("sign"),
    )


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH: 12-bit signature → bucket → exact cosine only
    within the query's bucket. Approximate (recall < 1) → rows-only check."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dim = emb.select(F.size("v").alias("d")).first()["d"]
    comp = emb.select(
        "vec_id", "v", F.posexplode("v").alias("i", "x")
    ).join(F.broadcast(_plane_table(spark, dim)), "i")
    sig = (
        comp.groupBy("vec_id", "k")
        .agg(F.sum(F.col("x") * F.col("sign")).alias("proj"))
        .groupBy("vec_id")
        .agg(
            F.sum(
                F.when(
                    F.col("proj") > 0, F.expr("shiftleft(1L, cast(k as int))")
                ).otherwise(F.lit(0))
            ).alias("bucket")
        )
    )
    withsig = emb.join(sig, "vec_id")
    q = withsig.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "bucket"
    )
    c = withsig.select(F.col("vec_id").alias("c_id"), F.col("v").alias("cv"), "bucket")
    cos = F.round(
        _dot(F.col("qv"), F.col("cv"))
        / (F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))),
        6,
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        q.join(c, ["bucket"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", cos.alias("cosine"))
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


QUERIES = {
    "cosine_topk": q_cosine_topk,
    "ann_lsh": q_ann_lsh,
    "embedding_mean": q_embedding_mean,
    "embedding_near_dup": q_embedding_near_dup,
}

ORACLES = {
    "cosine_topk": _COSINE_SQL,
    # ann_lsh: approximate by design → rows-only
    "embedding_mean": _EMB_MEAN_SQL,
    "embedding_near_dup": _EMB_NEARDUP_SQL,
}
