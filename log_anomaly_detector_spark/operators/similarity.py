"""Similarity search over the `embeddings` table (array<float> column).

* brute-force cosine top-k — the exactness baseline: query×candidate join,
  dot products via zip_with/aggregate (JVM-side, no Python);
* LSH-bucketed ANN — the scale path: deterministic random-hyperplane
  signatures, candidates only within matching buckets;
* IVF ANN — the other scale path: K inverted lists, search probes only the
  nprobe nearest lists;
* embedding near-dup — LSH-bucket candidates + exact verify (never an
  all-pairs theta join).

Scale shapes (the parts that must survive 10^12 vectors):
* LSH bucketing is a SINGLE narrow projection: the hyperplane matrix is a
  deterministic driver-side constant embedded ONCE as an array literal, and
  each row computes all of its table-buckets with per-row array expressions
  — zero extra shuffles, zero row blowup (the previous posexplode(dim) +
  two-groupBy formulation shuffled dim× the table twice).
* IVF assignment is the same trick: the K×dim centroid matrix is a broadcast
  literal and the argmax is computed WITHIN the row, instead of
  crossJoin(K) + a per-vector window (K× row blowup + shuffle).
* The only shuffles anywhere are keyed joins on bucket/list ids.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from log_anomaly_detector_spark.operators.relational import t

TOP_K = 5
N_QUERIES = 5


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _vq_col(v: Column) -> Column:
    """array<int> of floor(x·1e6) — the shared quantization, computed
    JVM-SIDE so the Arrow kernels receive 4-byte ints instead of 8-byte
    doubles (halves the Python-worker transfer, which profiling showed is
    the binding cost of the corpus-sized kernel passes: ~1 GB of float64
    per 2M×64 pass before this). floor(double·1e6) is the identical IEEE
    multiply+floor numpy applies, so kernel outputs are unchanged
    bit-for-bit; int32 is safe for any |component| < ~2147 (embedding
    components are O(1))."""
    return F.transform(v, lambda x: F.floor(x * 1e6).cast("int"))


def _cos(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _seq_fold(mat: "np.ndarray") -> "np.ndarray":
    """Left-fold row sums with float64 rounding at EVERY step — i.e. the
    bit-identical value of Catalyst's `aggregate(zip_with(a,b,*), 0.0, +)`
    and DuckDB's `list_dot_product` sequential accumulation. np.cumsum is a
    plain sequential loop per row (no pairwise blocking, unlike np.sum /
    np.dot), so cumsum[…, -1] reproduces ((0+p0)+p1)+… exactly; 0.0+p0 == p0
    in IEEE, so omitting the explicit zero seed changes nothing."""
    return np.cumsum(mat, axis=1)[:, -1]


def _norm_udf():
    """Arrow kernel for the corpus-sized norm pass: sqrt of the sequential
    sum of squares, bit-identical to Catalyst's `sqrt(_dot(v, v))` (same
    `_seq_fold` argument). The inline fold is interpreted
    per element — a full-corpus pass at 2M×64 is 128M interpreted ops for
    what numpy does in one vectorized sweep. Factory (not module-level
    decoration): pandas_udf return-type strings parse at call time against a
    live session (CLAUDE.md gotcha)."""

    @F.pandas_udf("double")
    def norm(v: pd.Series) -> pd.Series:
        if len(v) == 0:  # np.stack raises on empty — guard the batch shape
            return pd.Series([], dtype="float64")
        C = np.stack(v.to_numpy())
        return pd.Series(np.sqrt(_seq_fold(C * C)))

    return norm


def _pair_dot_udf():
    """Arrow kernel for candidate-pair dot products (near-dup verify):
    sequential float64 fold of elementwise products, bit-identical to
    Catalyst's `_dot(va, vb)` — both vectors ship per pair (pair-bounded
    stream, never corpus²). Factory for the same call-time-parse reason as
    `_norm_udf`."""

    @F.pandas_udf("double")
    def pdot(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:  # np.stack raises on empty — guard the batch shape
            return pd.Series([], dtype="float64")
        A = np.stack(va.to_numpy())
        B = np.stack(vb.to_numpy())
        return pd.Series(_seq_fold(A * B))

    return pdot


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for the first N_QUERIES vectors. All arithmetic
    on array<double> with a sequential fold — deterministic, oracle-safe.
    Acceptable at scale only because the query side is bounded (N_QUERIES);
    the full-corpus paths are q_ann_lsh / q_ann_ivf."""
    emb = (
        t(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .filter(F.col("v").isNotNull())  # NULL vectors have no cosine
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    # ONE fused corpus pass scores every query against every vector
    # (`_allpairs_score_udf`) — queries are a driver-side constant, and the
    # former inequality nested-loop join shipped each corpus vector
    # N_QUERIES× through Arrow. Sequential-fold cosine is bit-identical to
    # the Catalyst formulation (see _seq_fold), oracle untouched.
    qrows = {r["q_id"]: list(r["qv"]) for r in q.collect()}
    if not qrows:
        return spark.createDataFrame([], _TOPK_SCHEMA)
    scored = emb.select("vec_id", "v").mapInPandas(
        _allpairs_score_udf(qrows), schema="q_id long, c_id long, cosine double"
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.select("q_id", "c_id", F.round(F.col("cosine"), 6).alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


_COSINE_SQL = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
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


# --- random-hyperplane LSH ---------------------------------------------------
# multi-table construction: L independent tables of P planes each; candidates
# are the union over tables (P(match per table) = (1 - θ/π)^P). (L=24, P=4)
# measures recall 0.92 vs exact top-5 at sf0.01 (tests gate ≥ 0.5; this
# synthetic corpus has far neighbors — cosine ~0.3 — so recall costs more
# tables than a real embedding corpus would need).
N_TABLES = 24
PLANES_PER_TABLE = 4


def _plane_signs(n_tables: int, planes: int, dim: int) -> list[float]:
    """Deterministic ±1 hyperplane matrix, flattened [tbl][plane][dim] —
    md5-parity seeded, identical on every run/driver. Tiny (L×P×dim) and
    embedded in the plan as ONE array literal."""
    return [
        1.0 if int(hashlib.md5(f"{t}:{k}:{i}".encode()).hexdigest(), 16) % 2 else -1.0
        for t in range(n_tables)
        for k in range(planes)
        for i in range(dim)
    ]


def _bucket_array(v: Column, dim: int, n_tables: int, planes: int) -> Column:
    """array<bigint> of length n_tables: per-table LSH bucket for vector `v`,
    computed entirely within the row (bucket = Σ_k [v·plane_k > 0]·2^k).
    The plane matrix literal appears ONCE in the expression tree.

    The projection is taken over QUANTIZED components (±floor(x·1e6) integer
    sum): integer addition is order-free, so the bucket is bit-identical at
    any parallelism AND across engines — which is what makes the whole ANN
    query DuckDB-oracle-checkable (same rationale as the engine's money
    aggregates).

    This is the pure-Catalyst REFERENCE formulation (kept for the equivalence
    test); the hot path uses `_bucket_udf` — the same integer arithmetic as
    ONE numpy matmul per Arrow batch, measured ~40× faster than the
    interpreted higher-order-function chain."""
    flat = F.lit(_plane_signs(n_tables, planes, dim))
    vq = F.transform(v, lambda x: F.floor(x * 1e6).cast("long"))
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_tables - 1)),
        lambda tt: F.aggregate(
            F.sequence(F.lit(0), F.lit(planes - 1)),
            F.lit(0).cast("long"),
            lambda acc, kk: acc
            + F.when(
                F.aggregate(
                    F.zip_with(
                        vq,
                        F.slice(flat, tt * (planes * dim) + kk * dim + 1, dim),
                        lambda xq, s: xq * s.cast("long"),
                    ),
                    F.lit(0).cast("long"),
                    lambda a, x: a + x,
                )
                > 0,
                F.pow(F.lit(2.0), kk).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ),
    )


def _bucket_udf(dim: int, n_tables: int, planes: int):
    """Vectorized Arrow signature kernel: same quantized-integer projection as
    `_bucket_array` (floor(x·1e6) int64, exact — |component| ≤ ~1e6, 64-term
    sums ≤ ~6.4e7, far inside int64), evaluated as one numpy matmul per batch.
    Integer arithmetic is order-free, so the result is bit-identical to the
    Catalyst formulation AND to the DuckDB oracle at any parallelism — the
    sanctioned Pandas-UDF exception: built-ins express this only as an
    interpreted per-plane fold (measured seconds for thousands of rows).

    Input is the PRE-QUANTIZED `_vq_col` array<int> (the floor happens
    JVM-side), so each corpus pass ships half the Arrow bytes of the former
    float64 feed; callers pass ``_vq_col(F.col("v"))``."""
    signs = (
        np.array(_plane_signs(n_tables, planes, dim), dtype=np.int64)
        .reshape(n_tables * planes, dim)
        .T
    )  # dim × (L·P)
    pw = 2 ** np.arange(planes, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def buckets(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:  # np.stack raises on empty — guard the batch shape
            return pd.Series([], dtype=object)
        vq = np.stack(vs.to_numpy()).astype(np.int64)  # batch × dim
        bits = (vq @ signs > 0).reshape(-1, n_tables, planes)
        return pd.Series(list((bits * pw).sum(axis=2)))

    return buckets


def _lsh_buckets(
    emb: DataFrame, dim: int, n_tables: int = N_TABLES, planes: int = PLANES_PER_TABLE
) -> DataFrame:
    """(vec_id, tbl, bucket) — one narrow Arrow-batched projection +
    posexplode over the (short) per-table bucket array; NO shuffle, NO dim×
    row blowup."""
    udf = _bucket_udf(dim, n_tables, planes)
    return emb.select(
        "vec_id", F.posexplode(udf(_vq_col(F.col("v")))).alias("tbl", "bucket")
    )


def _emb_dim(emb: DataFrame) -> int | None:
    # schema-level when available; otherwise one 1-row probe (driver-side,
    # once per query build — never per row). Returns None when NO non-null
    # vector exists: at scale an empty corpus slice is a legitimate input
    # (a filter that matched nothing), so dim-probing queries short-circuit
    # to an empty, correctly-typed result instead of a driver TypeError.
    # The isNotNull filter matters: probing the RAW first row would read a
    # NULL vector as d=None and silently empty a non-empty corpus.
    row = emb.filter(F.col("v").isNotNull()).select(F.size("v").alias("d")).first()
    return None if row is None else row["d"]


# contract output schema of the top-k ANN queries / the near-dup pair query —
# the empty-corpus short-circuit must return exactly these
_TOPK_SCHEMA = "q_id bigint, c_id bigint, cosine double, rank int"
_PAIRS_SCHEMA = "id_a bigint, id_b bigint, cosine double"


_ANN_LSH_SQL = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
planes AS (
  SELECT t.t AS tbl, k.k AS k, i.i AS i,
         CASE WHEN strpos('13579bdf',
                          substr(md5(t.t || ':' || k.k || ':' || i.i), 32, 1)) > 0
              THEN 1 ELSE -1 END AS s
  FROM range(0, {N_TABLES}) t(t), range(0, {PLANES_PER_TABLE}) k(k), range(0, 64) i(i)
),
proj AS (
  SELECT e.vec_id, p.tbl, p.k,
         sum(cast(floor(e.v[p.i + 1] * 1e6) AS bigint) * p.s) AS pr
  FROM emb e, planes p
  GROUP BY 1, 2, 3
),
buckets AS (
  SELECT vec_id, tbl,
         cast(sum(CASE WHEN pr > 0 THEN cast(pow(2, k) AS bigint) ELSE 0 END) AS bigint) AS bucket
  FROM proj GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT qb.vec_id AS q_id, cb.vec_id AS c_id
  FROM buckets qb JOIN buckets cb ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
  WHERE qb.vec_id < {N_QUERIES} AND qb.vec_id <> cb.vec_id
),
scored AS (
  SELECT q_id, c_id,
         round(list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))),
               6) AS cosine
  FROM cand JOIN emb q ON q.vec_id = q_id JOIN emb c ON c.vec_id = c_id
)
SELECT q_id, c_id, cosine,
       cast(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS int) AS rank
FROM scored QUALIFY rank <= {TOP_K}
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table hyperplane LSH → union of bucket candidates → exact cosine
    rerank top-k. Approximate vs exact brute force (recall gated in tests),
    but fully DETERMINISTIC (md5 planes + integer-quantized projections), so
    the query itself is DuckDB-oracle-verified end to end. The oracle pins
    dim=64 (the driver tables); the Spark side reads dim from the data.

    Scale shape (what must survive 10^12 vectors): every broadcast here is of
    a QUERY-BOUNDED side — the query-bucket table (N_QUERIES × N_TABLES rows)
    joins map-side against the corpus bucket stream, and the candidate-id set
    (bounded by queries × bucket sizes) broadcasts into a plain corpus scan to
    fetch vectors. The full embeddings table is NEVER broadcast and its vector
    payloads never shuffle — the only wide ops are the candidate-pair distinct
    and the per-query top-k window, both candidate-sized. The heavy bucket
    projection runs ONCE over the corpus (queries bucket separately on the
    filtered rows)."""
    raw = (
        t(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        # NULL vectors cannot participate in any similarity math (cosine,
        # signatures, centroids) — excluded here so neither the driver-side
        # seed collect nor the Arrow kernels ever see None
        .filter(F.col("v").isNotNull())
    )
    dim = _emb_dim(raw)
    if dim is None:  # empty corpus → empty result, contract schema
        return spark.createDataFrame([], _TOPK_SCHEMA)
    # query rows come straight off the scan (the vec_id predicate pushes to
    # parquet) and become driver/closure state; the corpus gets the
    # parallelizing repartition only when under-split (single-split testdata)
    qrows = {
        r["vec_id"]: list(r["v"])
        for r in raw.filter(F.col("vec_id") < N_QUERIES).collect()
    }
    if not qrows:  # no query-range ids → empty result, contract schema
        return spark.createDataFrame([], _TOPK_SCHEMA)
    par = spark.sparkContext.defaultParallelism
    emb = raw if raw.rdd.getNumPartitions() >= par else raw.repartition(par)
    # the whole search is ONE fused corpus pass (`_lsh_probe_score_udf`):
    # per-table buckets via the exact `_bucket_udf` matmul, membership
    # against the driver-side query buckets, sequential-fold cosine for
    # matches — emitting the skinny (q_id, c_id, cosine) stream. The former
    # pipeline (corpus bucket projection → bucket join → candidate
    # dropDuplicates → vector-fetch join → scoring kernel) shuffled
    # candidate ids twice and re-shipped candidate vectors; here the only
    # shuffle left is the top-k window on skinny rows, and the cross-table
    # dedup is structural (one row per candidate, union computed in-row).
    scored = emb.select("vec_id", "v").mapInPandas(
        _lsh_probe_score_udf(qrows, dim, N_TABLES, PLANES_PER_TABLE),
        schema="q_id long, c_id long, cosine double",
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.select("q_id", "c_id", F.round(F.col("cosine"), 6).alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


# --- A9: per-dimension mean over vectors (hypersphere center = mean of
# embeddings, bert_pytorch/train_log.py:160-181) — posexplode + grouped avg;
# sums taken per-row-scaled-integer for oracle determinism (see
# q_pricing_summary note). ---------------------------------------------------
def q_embedding_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    # slice BEFORE exploding: the former posexplode-then-filter generated
    # corpus×dim rows and kept corpus×8 (generators can't take pushed
    # predicates) — slicing explodes only the 8 kept components. The agg
    # still combines map-side, so the shuffle is (labels×8) partials.
    comp = emb.select(
        "label",
        F.posexplode(
            F.slice(F.col("embedding").cast("array<double>"), 1, 8)
        ).alias("dim", "x"),
    )
    return (
        comp.groupBy("label", "dim")
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


# --- embedding-cosine near-dup dedup: all pairs above a cosine threshold
# (the embedding analogue of MinHash near-dup). BUCKET-FIRST: candidates come
# from a dedicated LSH family (more tables, fewer planes — tuned so recall at
# τ=0.45 is 1.0: P(miss) = (1-(1-θ/π)^2)^ND_TABLES ≈ 2e-6 per true pair at the
# threshold, vanishing above it — ND_TABLES=24 is what that exponent assumes).
# Verified exactly within buckets; the DuckDB oracle is the brute-force cross
# join, so exactness of the bucketed plan is checked at every sf the driver
# runs. The Spark plan never theta-joins two unbounded sides and NEVER
# broadcasts the corpus:
#   * the bucket self-join ships only SKINNY (id, packed/array signature)
#     rows — vector payloads stay out of the wide candidate stream;
#   * pair dedup is MAP-SIDE: a colliding pair is emitted only from the FIRST
#     table where its signatures agree, so no dropDuplicates shuffle exists;
#   * exact cosine runs after hint-free KEYED vector-fetch joins (AQE may
#     broadcast the dim-sized side at bench scale; at 10^12 vectors the same
#     plan shuffles instead of OOMing).
# Bucket selectivity is corpus-dependent: this synthetic far-neighbor corpus
# (bulk cosine ~0.3 vs τ=0.45) makes most pairs candidates — a real embedding
# corpus with separated clusters prunes far harder at the same guarantees. ----
ND_THRESHOLD = 0.45
ND_TABLES = 24
ND_PLANES = 2


# buckets/table = 2^planes: at ≥ 8 planes (≥ 256 buckets) the per-bucket
# membership is a bounded slice of the corpus and the GROUPED verify (one
# kernel pass over memberships, O(corpus·tables) Arrow bytes) beats the
# pair-stream verify (O(candidate-pairs) bytes — measured 15 GB / 117 s for
# the 14.6M pairs the production regime emits at 100k vectors, vs 0.5 GB
# grouped). Below that threshold the dispatch is by estimated BUCKET MEMORY
# (round 7): a low-plane config makes buckets corpus/2^planes-sized, which
# is only a problem when one bucket's flattened vectors outgrow a task
# (collect_list row + kernel scratch) — measured at sf1.0 (20k vectors, the
# contract 24×2 regime ⇒ ~5k-row buckets, 2.6 MB each) the grouped kernel
# verifies in seconds what the pair stream took 111 s to do, because the
# candidate-pair stream is ~corpus²/2 rows shipping BOTH 64-dim vectors per
# pair. The pair stream remains the fallback when buckets exceed the cap
# (then the config is quadratic-by-design and distribution is what's left).
_GROUPED_VERIFY_MIN_PLANES = 8
# per-bucket flattened-vector budget for the grouped kernel (rows·dim·8B):
# bounds the collect_list row and the kernel's per-group scratch. 256 MB ⇒
# ~500k 64-dim vectors per bucket — far past any bench scale, conservative
# for a 16 GB driver-sized task.
_GROUPED_MAX_BUCKET_BYTES = 1 << 28
# in-kernel pair-block budget: bounds eq/prod scratch to ~128 MB worst-case
_PAIR_BLOCK = 1 << 18


def _grouped_verify_udf(
    dim: int, n_tables: int, threshold: float, pair_block: int = _PAIR_BLOCK
):
    """mapInPandas kernel over (tbl, ids, vflat, sigflat) bucket-group rows:
    emits every first-hit candidate pair of the group with its RAW cosine.

    Two phases per bucket. (1) PREFILTER: every i<j pair is scored by ONE
    int64 matmul per row block over the floor(x·1e6) quantization — the same
    exact-integer trick as the IVF kernels (products ≤ dim·(1e6·‖x‖∞)² stay
    under 2^53 for ‖x‖∞ ≲ 11; corpora outside that envelope skip the
    prefilter for that bucket and degrade to the all-pairs flow below). A
    pair survives iff its quantized cosine COULD reach threshold−1e−6 under
    a rigorous error bound: |raw_dot − dq·1e−12| ≤ (Σ|vqa|+Σ|vqb|+dim)·1e−12
    (components are (vq+f)/1e6 with f∈[0,1)), plus a 4·dim·eps margin for
    the float rounding of the dot-space comparison itself — so no pair the
    exact path would emit is ever dropped, and false survivors are killed by
    phase 2. Replaces the former all-pairs fancy-indexed dedup+fold (~1.7
    µs/pair — ~370M pair checks ≈ 360 core-seconds at 500k vectors) with
    ~1 Gmul/s integer matmuls. (2) EXACT on the survivor set (result-sized,
    not pair-sized): first-collision dedup — group (tbl, bucket) emits
    (i, j) iff tbl is the FIRST table where their full signatures agree,
    exactly-once across groups, no distinct shuffle — then the sequential-
    fold cosine (same `_seq_fold` argument as `_norm_udf`/`_pair_dot_udf`:
    norms are sqrt(cumsum(C·C)), dots the sequential fold of the elementwise
    product, cosine dot/(na·nb) — the identical IEEE ops the pair-stream
    path evaluates), so both strategies produce byte-equal rows (pinned by
    tests/test_similarity.py grouped-vs-pairs equivalence).

    The final filter is raw cosine ≥ threshold−1e−6 (any value that could
    round up to the 6dp threshold survives; the exact half-up round +
    compare happens JVM-side), so the Arrow return stream is result-sized,
    not candidate-sized."""
    slack = threshold - 1e-6
    eps = float(np.finfo(np.float64).eps)
    # quantized-component ceiling keeping dim·max|vq|² < 2^53 (with margin)
    pf_max = math.sqrt(2.0**53 / dim) * 0.9

    def kernel(batches):
        for pdf in batches:
            out_a: list[np.ndarray] = []
            out_b: list[np.ndarray] = []
            out_c: list[np.ndarray] = []
            for tbl, ids, vflat, sigflat in zip(
                pdf["tbl"], pdf["ids"], pdf["vflat"], pdf["sigflat"]
            ):
                g = len(ids)
                if g < 2:
                    continue
                ids = np.asarray(ids, dtype=np.int64)
                C = np.asarray(vflat, dtype=np.float64).reshape(g, dim)
                S = np.asarray(sigflat, dtype=np.int64).reshape(g, n_tables)
                norms = np.sqrt(_seq_fold(C * C))
                VQ = np.floor(C * 1e6).astype(np.int64)
                prefilter = np.abs(VQ).max(initial=0) <= pf_max
                if prefilter:
                    sa = np.abs(VQ).sum(axis=1)  # per-row Σ|vq| dot bound
                    # float64 copy for the dot matmul: BLAS GEMM is ~4× the
                    # int64 kernel, and under the pf_max gate it is EXACT —
                    # every product and every partial sum is an integer with
                    # |·| ≤ dim·max|vq|² < 2^53, exactly representable in
                    # float64 at any accumulation order (verified
                    # array_equal vs the int64 matmul)
                    VQf = VQ.astype(np.float64)
                # row blocks of b rows × ≤g cols bound scratch to ~pair_block
                b = max(1, pair_block // g)
                for r0 in range(0, g - 1, b):
                    r1 = min(r0 + b, g - 1)
                    rl = np.arange(r1 - r0, dtype=np.int64)  # block-local row
                    cl = np.arange(g - r0 - 1, dtype=np.int64)  # cols r0+1..
                    tri = cl[None, :] >= rl[:, None]  # ⟺ j > i globally
                    if prefilter:
                        dq = VQf[r0:r1] @ VQf[r0 + 1 :].T  # exact (see above)
                        lhs = dq * 1e-12
                        err = (sa[r0:r1, None] + sa[None, r0 + 1 :] + dim) * 1e-12
                        rhs = slack * (norms[r0:r1, None] * norms[None, r0 + 1 :])
                        keep = (
                            lhs + err + 4.0 * dim * eps * (np.abs(lhs) + np.abs(rhs))
                            >= rhs
                        ) & tri
                    else:
                        keep = tri
                    ri, ci = np.nonzero(keep)
                    if ri.size == 0:
                        continue
                    ii = ri + r0
                    jj = ci + r0 + 1
                    # first table where the signatures agree == this group's
                    # table ⟺ this group owns the pair (argmax finds the
                    # first True; membership guarantees S[·, tbl] matches)
                    first = np.argmax(S[ii] == S[jj], axis=1)
                    m = first == tbl
                    if not m.any():
                        continue
                    ia, ja = ii[m], jj[m]
                    dots = _seq_fold(C[ia] * C[ja])
                    with np.errstate(invalid="ignore"):  # 0/0 → NaN is handled
                        cos = dots / (norms[ia] * norms[ja])
                    # NaN parity with the pair-stream path: Spark (and the
                    # DuckDB oracle) order NaN ABOVE every double, so a
                    # zero-norm pair's 0/0 cosine passes `cosine >= τ` there;
                    # numpy's comparison would silently drop it (ADVICE r6)
                    keep2 = (cos >= slack) | np.isnan(cos)
                    if not keep2.any():
                        continue
                    ia, ja, cos = ia[keep2], ja[keep2], cos[keep2]
                    out_a.append(np.minimum(ids[ia], ids[ja]))
                    out_b.append(np.maximum(ids[ia], ids[ja]))
                    out_c.append(cos)
            if out_a:
                yield pd.DataFrame(
                    {
                        "id_a": np.concatenate(out_a),
                        "id_b": np.concatenate(out_b),
                        "cosine": np.concatenate(out_c),
                    }
                )

    return kernel


def _grouped_near_dup(
    emb: DataFrame, threshold: float, n_tables: int, planes: int, dim: int
) -> DataFrame:
    """Grouped-bucket near-dup verify (the ≥ `_GROUPED_VERIFY_MIN_PLANES`
    pruning-regime strategy): ONE membership shuffle keyed by (tbl, bucket),
    group members folded into parallel flat arrays JVM-side, then a single
    Arrow kernel computes norms, first-hit dedup, and sequential-fold cosines
    per bucket. No pair-sized stream ever exists — Arrow traffic is
    O(corpus·tables) for the memberships plus O(result) back, and the plan
    needs no persists (every table is read once)."""
    udf = _bucket_udf(dim, n_tables, planes)
    memb = emb.select(
        "vec_id", "v", udf(_vq_col(F.col("v"))).alias("sig")
    ).select("vec_id", "v", "sig", F.posexplode("sig").alias("tbl", "bucket"))
    grouped = (
        memb.groupBy("tbl", "bucket")
        .agg(F.collect_list(F.struct("vec_id", "v", "sig")).alias("m"))
        .select(
            "tbl",
            F.transform("m", lambda s: s["vec_id"]).alias("ids"),
            F.flatten(F.transform("m", lambda s: s["v"])).alias("vflat"),
            F.flatten(F.transform("m", lambda s: s["sig"])).alias("sigflat"),
        )
    )
    raw = grouped.mapInPandas(
        _grouped_verify_udf(dim, n_tables, threshold),
        schema="id_a long, id_b long, cosine double",
    )
    # identical 6dp half-up round + compare as the pair-stream verify. The
    # coalesce restores zero-norm NaNs: pandas→Arrow treats NaN as the
    # missing-value sentinel, so the kernel's 0/0 cosines arrive as NULL —
    # and NULL is the ONLY way the kernel's float64 column loses a value, so
    # mapping it back to NaN is exact (Spark orders NaN above every double,
    # keeping the pair exactly like the pair-stream path and the oracle).
    return raw.select(
        "id_a",
        "id_b",
        F.round(
            F.coalesce(F.col("cosine"), F.lit(float("nan"))), 6
        ).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = ND_THRESHOLD,
    n_tables: int = ND_TABLES,
    planes: int = ND_PLANES,
    dim: int | None = None,
    verify: str = "auto",
    n_rows: int | None = None,
) -> DataFrame:
    """All (id_a < id_b, cosine) pairs with cosine ≥ threshold over
    ``emb(vec_id, v array<double>)`` — LSH-bucket candidates + exact verify.

    Parameterized for the full regime spectrum: the contract fixture runs
    τ=0.45 / 2 planes / 24 tables (per-pair miss ≈ 2e-6 at the threshold —
    but τ this low sits in hyperplane LSH's no-pruning regime, so most pairs
    are candidates on a far-neighbor corpus); production near-dup dedup runs
    τ ≥ 0.8-0.9 where MORE planes per table prune hard (random pairs match a
    p-plane table with prob ~2^-p) and the table count for recall stays
    modest (miss/table = 1-(1-θ/π)^p, tables chosen so miss^L is
    negligible).

    Verify strategy (``verify``: "auto" | "grouped" | "pairs"): "auto" picks
    the GROUPED kernel — one membership shuffle, norms + first-hit dedup +
    sequential-fold cosines computed per bucket in a single Arrow pass,
    O(corpus·tables) kernel traffic instead of the pair-stream's
    O(candidate-pairs) (measured 15 GB / 117 s vs 0.5 GB for the production
    regime's 14.6M candidates at 100k vectors; at sf1.0 the contract regime's
    pair stream was 111 s vs seconds grouped) — whenever per-bucket memory is
    bounded: planes ≥ `_GROUPED_VERIFY_MIN_PLANES`, or a caller-supplied
    ``n_rows`` whose corpus/2^planes estimated bucket stays under
    `_GROUPED_MAX_BUCKET_BYTES`. Low-plane configs withOUT a row count (or
    past the cap) keep the distributed pair stream — there a bucket group
    would be one giant task. Both strategies emit byte-identical rows
    (equivalence-tested, including the zero-norm NaN edge).

    Pair-stream dedup is map-side via first-colliding-table signatures,
    picked by config width: ≤62 signature bits → ONE packed long + SWAR
    group check; wider configs carry the bucket array and walk it with
    zip_with — same exactly-once semantics, no dropDuplicates shuffle in
    either path. Vector fetch is hint-free keyed joins (AQE may broadcast at
    small scale; shuffles, never OOMs, at 10^12 vectors).

    Pass ``dim`` when ``emb`` sits behind a repartition/shuffle — the
    fallback one-row probe would otherwise run the whole shuffle-map stage
    just to read a vector length."""
    dim = dim if dim is not None else _emb_dim(emb)
    if dim is None:
        raise ValueError(
            "embedding_near_dup_pairs: empty embeddings input — pass the "
            "known dim, or short-circuit empty corpora upstream (the "
            "contract query does)"
        )
    if verify not in ("auto", "grouped", "pairs"):
        raise ValueError(f"unknown verify strategy {verify!r}")
    if verify == "auto":
        bucket_ok = (
            n_rows is not None
            and (n_rows / float(2**planes)) * dim * 8 <= _GROUPED_MAX_BUCKET_BYTES
        )
        verify = (
            "grouped"
            if planes >= _GROUPED_VERIFY_MIN_PLANES or bucket_ok
            else "pairs"
        )
    if verify == "grouped":
        return _grouped_near_dup(emb, threshold, n_tables, planes, dim)
    from log_anomaly_detector_spark.operators.caching import tracked_persist

    udf = _bucket_udf(dim, n_tables, planes)
    sigs = emb.select("vec_id", udf(_vq_col(F.col("v"))).alias("sig"))
    if n_tables * planes <= 62:
        # SKINNY candidate stream: only (id, PACKED signature) rides the
        # bucket self-join — the whole signature is ONE long (planes bits per
        # bucket × n_tables groups), so the per-pair dedup check is a couple
        # of integer ops instead of a per-table array walk.
        gbits = planes
        group_pows = [2 ** (gbits * i) for i in range(n_tables)]
        packed = F.aggregate(
            F.zip_with(F.col("sig"), F.lit(group_pows), lambda bkt, p: bkt * p),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        # persist the exploded signature table: BOTH sides of the bucket
        # self-join read it, so without the cache the Arrow signature
        # kernel (and the corpus scan under it) runs twice per action —
        # the r4 verdict's one remaining wall lever on this query. Narrow
        # payload only (id + packed long + table + bucket), never vectors.
        # Keyed BY REGIME: the contract (24×2) and production (8×12)
        # parameterizations produce different plans, and a shared key would
        # thrash the slot on every alternation, silently reintroducing the
        # double-computed kernel. (The norms persist below shares one key on
        # purpose — its plan is regime-independent, so sameSemantics reuses
        # the warm handle across regimes.)
        skinny = tracked_persist(
            f"embnd_skinny_{n_tables}x{planes}",
            sigs.select(
                "vec_id",
                packed.alias("psig"),
                F.posexplode("sig").alias("tbl", "bucket"),
            ),
        )
        a = skinny.select(
            F.col("vec_id").alias("id_a"), F.col("psig").alias("psig_a"), "tbl", "bucket"
        )
        b = skinny.select(
            F.col("vec_id").alias("id_b"), F.col("psig").alias("psig_b"), "tbl", "bucket"
        )
        # first-collision dedup: emit the pair only from the FIRST table
        # whose buckets agree — exactly-once per pair, no distinct shuffle.
        # SWAR: x = psig_a XOR psig_b; y gathers each group's OR-of-bits at
        # the group's low bit; "tbl is the first match" ⟺ every group BELOW
        # tbl is nonzero in y (the group AT tbl matches by join construction).
        low_mask = sum(1 << (gbits * i) for i in range(n_tables))
        x = F.col("psig_a").bitwiseXOR(F.col("psig_b"))
        y = x
        for k in range(1, gbits):
            y = y.bitwiseOR(F.shiftrightunsigned(x, k))
        y = y.bitwiseAND(F.lit(low_mask))
        below = F.element_at(  # low-bit pattern covering groups < tbl
            F.lit([(2 ** (gbits * t) - 1) & low_mask for t in range(n_tables)]),
            F.col("tbl") + 1,
        )
        first_hit = y.bitwiseAND(below) == below
    else:
        # wide config: carry the bucket array, first match via zip_with walk
        # (same double-read shape as the packed path → same regime-keyed
        # persist)
        skinny = tracked_persist(
            f"embnd_skinny_{n_tables}x{planes}",
            sigs.select(
                "vec_id", "sig", F.posexplode("sig").alias("tbl", "bucket")
            ),
        )
        a = skinny.select(
            F.col("vec_id").alias("id_a"), F.col("sig").alias("sig_a"), "tbl", "bucket"
        )
        b = skinny.select(
            F.col("vec_id").alias("id_b"), F.col("sig").alias("sig_b"), "tbl", "bucket"
        )
        first_hit = (
            F.col("tbl")
            == F.array_position(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda s, t: s == t),
                F.lit(True),
            )
            - 1
        )
    pairs = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(first_hit)
        .select("id_a", "id_b")
    )
    # verify: vectors + norms arrive via plain KEYED joins with NO broadcast
    # hint — at bench scale AQE converts the dim-sized side to a runtime
    # broadcast; at 10^12 vectors the same plan shuffles instead of OOMing
    # (the round-2 forced F.broadcast(corpus) is exactly what this removes).
    # Norms are computed ONCE per vector on the fetch side — dot/(na*nb)
    # evaluates the identical IEEE ops as the inline cosine, so the 6dp round
    # stays bit-exact vs the DuckDB oracle.
    # the verify stage fetches vectors TWICE (id_a and id_b keyed joins) —
    # persist the norms table so the corpus scan + norm reduction run once
    # per action instead of twice (MEMORY_AND_DISK: spills, never OOMs)
    withn = tracked_persist(
        "embnd_norms",
        # Arrow norm kernel: bit-identical to sqrt(_dot(v, v)) (see
        # _norm_udf) but vectorized — the inline fold interpreted a full
        # corpus-sized pass per action before this
        emb.select("vec_id", "v", _norm_udf()(F.col("v")).alias("n")),
    )
    paired = pairs.join(
        withn.select(
            F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na")
        ),
        "id_a",
    ).join(
        withn.select(
            F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb")
        ),
        "id_b",
    )
    # pair dot via the INLINE JVM fold (round 7): the r6 Arrow `_pair_dot_udf`
    # here was the CLAUDE.md pair-stream trap — a pandas_udf over the
    # candidate-PAIR stream ships both vectors per pair to Python workers,
    # exactly the transfer co-tenant load crushes (r6 verdict: 2.2 s → 5.9 s
    # on the contract regime). The fold evaluates the identical IEEE ops
    # (dot/(na·nb), sequential accumulation), so the 6dp round stays
    # bit-exact vs the DuckDB oracle AND vs the grouped kernel; the Arrow
    # kernels stay where they won — corpus-sized passes (`_norm_udf`) and
    # group-local verifies, never pair streams.
    # zero-norm guard (ADVICE r6): ANSI Spark RAISES on x/0 where numpy and
    # DuckDB produce 0/0 = NaN — and both engines order NaN above every
    # double, so the `cosine >= τ` filter must KEEP such pairs. The explicit
    # NaN branch makes the pair stream byte-equal to the grouped kernel and
    # the oracle on all-zero embeddings instead of crashing.
    denom = F.col("na") * F.col("nb")
    cos = F.round(
        F.when(denom != 0, _dot(F.col("va"), F.col("vb")) / denom).otherwise(
            F.lit(float("nan"))
        ),
        6,
    )
    return (
        paired.select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = (
        t(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        # NULL vectors cannot participate in any similarity math (cosine,
        # signatures, centroids) — excluded here so neither the driver-side
        # seed collect nor the Arrow kernels ever see None
        .filter(F.col("v").isNotNull())
    )
    # testdata parquet arrives as ONE split; the cheap id repartition
    # parallelizes the signature kernel and the norm computation. The dim
    # probe and the ROW COUNT (which sizes the verify dispatch — grouped
    # kernel iff buckets stay memory-bounded) come from ONE cheap aggregate
    # over the raw scan (pre-repartition — probing the shuffled side would
    # run the whole shuffle-map stage for one row).
    probe = raw.agg(
        F.count(F.lit(1)).alias("n"),
        F.first(F.size("v"), ignorenulls=True).alias("d"),
    ).first()
    if probe is None or probe["d"] is None:  # empty corpus → contract schema
        return spark.createDataFrame([], _PAIRS_SCHEMA)
    emb = raw.repartition(spark.sparkContext.defaultParallelism, "vec_id")
    return embedding_near_dup_pairs(emb, dim=probe["d"], n_rows=probe["n"])


# production-regime parameterization: high threshold, enough planes per
# table that a random pair collides with prob ~2^-12 — the regime the
# embedding_near_dup_pairs docstring names for real near-dup dedup. NOT a
# contract query (the oracle-verified contract fixture runs the low-τ
# no-pruning regime); this is the shape per-query SCALING evidence runs,
# because the contract parameters are quadratic-by-design on a large corpus
# (τ=0.45 with 2 planes ⇒ 4 buckets/table ⇒ bucket self-joins explode) —
# measuring those at 500k vectors would benchmark a misconfiguration.
PROD_ND_THRESHOLD = 0.85
PROD_ND_TABLES = 8
PROD_ND_PLANES = 12


def q_embedding_near_dup_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`embedding_near_dup_pairs` in the production regime (τ=0.85, 12
    planes × 8 tables — a random pair collides with prob ~2^-12 per table,
    so LSH actually prunes). NOT a contract query / no ORACLES entry ON
    PURPOSE: the driver registry stays at the 52 oracle-verified queries,
    and the contract `q_embedding_near_dup` already hard-verifies the exact
    same plan against the brute-force oracle at low τ. This entry exists for
    per-query SCALING evidence and as the parameterization real near-dup
    dedup should copy — the contract regime is quadratic by design at
    corpus scale (2 planes ⇒ 4 buckets/table ⇒ bucket self-joins explode).
    Planted-duplicate recall 1.0 pinned by
    tests/test_similarity.py::test_embedding_near_dup_production_regime.
    Reference near-dup semantics citation as for q_embedding_near_dup."""
    raw = (
        t(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .filter(F.col("v").isNotNull())
    )
    dim = _emb_dim(raw)
    if dim is None:
        return spark.createDataFrame([], _PAIRS_SCHEMA)
    emb = raw.repartition(spark.sparkContext.defaultParallelism, "vec_id")
    return embedding_near_dup_pairs(
        emb,
        threshold=PROD_ND_THRESHOLD,
        n_tables=PROD_ND_TABLES,
        planes=PROD_ND_PLANES,
        dim=dim,
    )


_EMB_NEARDUP_SQL = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
             6) AS cosine
FROM emb a JOIN emb b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
            6) >= {ND_THRESHOLD}
"""


# --- IVF ANN: the other scale path for similarity search. Deterministic
# build: K seed centroids (md5-min-K sample of the corpus) + ONE Lloyd
# refinement. The
# centroid matrix lives on the driver (K×dim — tiny by construction) and is
# embedded as an array literal, so ASSIGNMENT IS A PER-ROW EXPRESSION: sims =
# transform(seq(K), c -> cos(v, centroid_c)); cid = argmax — no crossJoin row
# blowup, no per-vector window, zero added shuffle. The Lloyd update is one
# grouped agg (per-dim sums as K×dim tiny partials). Search probes the nprobe
# nearest inverted lists only — at 10^12 vectors the exact-scoring join
# touches ~nprobe/K of the table instead of all of it. ------------------------
N_CENTROIDS = 16
N_PROBE = 4


def _quantize_cents(cents: list[list[float]]) -> list[list[int]]:
    """floor(x·1e6) per component, computed DRIVER-side — the same IEEE
    double multiply + floor every engine applies (Python, numpy, Catalyst,
    DuckDB all round-trip identically), so the quantized centroid matrix is
    one shared constant."""
    return [[int(math.floor(x * 1e6)) for x in c] for c in cents]


def _centroid_sims_q(v: Column, cents: list[list[float]]) -> Column:
    """array<double> of QUANTIZED similarity(v, centroid_c), computed within
    the row — the pure-Catalyst REFERENCE formulation (the hot path is
    `_assign_udf`, same arithmetic as one numpy integer matmul per Arrow
    batch; equivalence is pinned by test).

    sim = idot(vq, cq) / (sqrt(idot(vq, vq)) · sqrt(idot(cq, cq))) over
    floor(x·1e6) int64 components: every dot is an EXACT integer (≤ ~6.4e13
    for 64 dims, inside both int64 and double's 2^53 — so even an engine
    that sums in doubles is exact and ORDER-FREE), and the only float ops
    are two sqrts, one multiply, one divide — single IEEE operations that
    are bit-identical across Python/numpy/JVM/DuckDB. This replaces the
    raw-float cosine argmax, whose fold-order-sensitive sums matched the
    oracle only because the fixtures never produced a near-tie."""
    k, dim = len(cents), len(cents[0])
    cq = _quantize_cents(cents)
    flatq = F.lit([x for c in cq for x in c])
    cnorms = F.lit([math.sqrt(float(sum(x * x for x in c))) for c in cq])
    vq = F.transform(v, lambda x: F.floor(x * 1e6).cast("long"))
    vdot = F.aggregate(
        F.zip_with(vq, vq, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    vnorm = F.sqrt(vdot.cast("double"))
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda cc: F.aggregate(
            F.zip_with(
                vq, F.slice(flatq, cc * dim + 1, dim), lambda a, b: a * b
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
        / (vnorm * F.element_at(cnorms, cc + 1)),
    )


def _assign_udf(cents: list[list[float]]):
    """Vectorized Arrow assignment kernel: the SAME quantized-integer
    similarity as `_centroid_sims_q`, evaluated as one numpy int64 matmul
    per batch — the sanctioned Pandas-UDF exception (the Catalyst
    formulation is an interpreted K×dim fold per row: measured 139 s for
    ONE pass over 2M×64-dim vectors on 8 cores; the kernel does the same
    pass in seconds). Exactness argument in `_centroid_sims_q`'s docstring;
    np.argmax takes the FIRST max, matching the `ties → lowest cid` rule.

    Input is the PRE-QUANTIZED `_vq_col` array<int> — the corpus-sized
    assignment passes were Arrow-transfer-bound (~1 GB of float64 per 2M×64
    pass), and shipping the floor(x·1e6) ints as int32 halves that."""
    C = np.array(_quantize_cents(cents), dtype=np.int64)  # K × dim
    cn = np.sqrt((C * C).sum(axis=1).astype(np.float64))  # K

    @F.pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:  # np.stack raises on empty — guard the batch shape
            return pd.Series([], dtype="int32")
        vq = np.stack(vs.to_numpy()).astype(np.int64)  # batch × dim
        d = (vq @ C.T).astype(np.float64)  # exact integers, batch × K
        vn = np.sqrt((vq * vq).sum(axis=1).astype(np.float64))  # batch
        sims = d / (vn[:, None] * cn[None, :])
        return pd.Series(np.argmax(sims, axis=1).astype("int32"))

    return assign


def _assign(emb: DataFrame, cents: list[list[float]]) -> DataFrame:
    """(vec_id, v, vq, cid): nearest centroid by quantized similarity, Arrow
    kernel; ties → lowest cid (np.argmax returns the first max). ``emb`` must
    carry the pre-quantized ``vq`` column (see `_with_vq`)."""
    return emb.withColumn("cid", _assign_udf(cents)(F.col("vq")))


def _probe_lists(
    cents: list[list[float]], qrows: dict[int, list[float]]
) -> dict[int, list[int]]:
    """Top-N_PROBE centroid ids per query, computed DRIVER-side with the
    exact `_centroid_sims_q` arithmetic: integer quantized dots (exact in
    int64 and double), vnorm = sqrt(float(idot)), sim = float(idot) /
    (vnorm · cnorm) — single IEEE ops, bit-identical across
    Python/numpy/JVM/DuckDB — then sort by (−sim, cid) like the Catalyst
    array_sort(struct(neg, cid)) slice (equivalence test pins parity).
    Queries and centroids are both driver-side constants, so this is O(nq·K·
    dim) driver work — no reason to round-trip 5 rows through a plan."""
    cq = _quantize_cents(cents)
    cns = [math.sqrt(float(sum(x * x for x in c))) for c in cq]
    out: dict[int, list[int]] = {}
    for q_id, qv in qrows.items():
        vq = [int(math.floor(x * 1e6)) for x in qv]
        vnorm = math.sqrt(float(sum(a * a for a in vq)))
        sims = [
            float(sum(a * b for a, b in zip(vq, cq[c]))) / (vnorm * cns[c])
            for c in range(len(cq))
        ]
        order = sorted(range(len(cq)), key=lambda c: (-sims[c], c))
        out[q_id] = order[: N_PROBE]
    return out


def _probe_score_udf(cents: list[list[float]], qrows: dict[int, list[float]]):
    """Fused c1-assignment + probe-membership + exact-cosine scoring: ONE
    mapInPandas pass over the corpus replaces the former three-stage tail
    (c1 `_assign` kernel pass → cid join materializing a candidate table
    with full vector payloads → scoring kernel over ~1.3 GB of re-shipped
    vectors). Per batch: the `_assign_udf` int64-matmul argmax picks each
    vector's inverted list; the driver-side probe lists (`_probe_lists`)
    invert to cid → querying q_ids; rows on a probed list are scored with
    the `_seq_fold` sequential float64 cosine (bit-identical to the
    Catalyst `_cos` fold — same guarantee as every `_seq_fold` kernel). Output is the
    skinny (q_id, c_id, raw cosine) candidate stream — ~24 B/row instead of
    vector payloads. Self-pairs are excluded in-kernel (q_id == vec_id).

    Scale shape: one pass, corpus-partitioned, no shuffle until the
    TOP_K-per-query window over the candidate stream; all driver/closure
    state is K×dim + nq×dim."""
    C = np.array(_quantize_cents(cents), dtype=np.int64)  # K × dim
    cn = np.sqrt((C * C).sum(axis=1).astype(np.float64))  # K
    plists = _probe_lists(cents, qrows)
    # invert: cid -> [(q_id, float64 query vector, seq-fold query norm)]
    probers: dict[int, list] = {}
    for q_id in sorted(plists):
        Qrow = np.array(qrows[q_id], dtype=np.float64)
        qn = float(np.sqrt(_seq_fold((Qrow * Qrow)[None, :])[0]))
        for cid in plists[q_id]:
            probers.setdefault(cid, []).append((q_id, Qrow, qn))

    def score(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            Vall = np.stack(pdf["v"].to_numpy())
            # quantize in-kernel (identical IEEE floor — `_vq_col`): the
            # kernel needs float64 vectors anyway, so shipping a vq column
            # would only add Arrow bytes
            vq = np.floor(Vall * 1e6).astype(np.int64)
            d = (vq @ C.T).astype(np.float64)
            vn = np.sqrt((vq * vq).sum(axis=1).astype(np.float64))
            cid = np.argmax(d / (vn[:, None] * cn[None, :]), axis=1)
            frames = []
            for k, qs in probers.items():
                mask = cid == k
                if not mask.any():
                    continue
                V = Vall[mask]
                ids = pdf["vec_id"][mask].to_numpy()
                cnv = np.sqrt(_seq_fold(V * V))
                for q_id, Qrow, qn in qs:
                    dots = _seq_fold(Qrow[None, :] * V)
                    cos = dots / (qn * cnv)
                    keep = ids != q_id  # self-pair exclusion
                    frames.append(
                        pd.DataFrame(
                            {
                                "q_id": np.full(int(keep.sum()), q_id, dtype=np.int64),
                                "c_id": ids[keep],
                                "cosine": cos[keep],
                            }
                        )
                    )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return score


def _allpairs_score_udf(qrows: dict[int, list[float]]):
    """Fused brute-force scoring: ONE mapInPandas pass over (vec_id, v)
    emitting (q_id, c_id, cosine) for EVERY query in the closure — replaces
    the inequality nested-loop join that shipped each corpus vector once
    PER QUERY through Arrow (N_QUERIES× the bytes). Same `_seq_fold`
    bit-exactness as the other `_seq_fold` kernels; self-pairs excluded in-kernel."""
    qids = sorted(qrows)
    Q = np.array([qrows[q] for q in qids], dtype=np.float64)  # nq × dim
    qn = np.sqrt(_seq_fold(Q * Q))

    def score(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["v"].to_numpy())
            ids = pdf["vec_id"].to_numpy()
            cnv = np.sqrt(_seq_fold(V * V))
            frames = []
            for j, q_id in enumerate(qids):
                dots = _seq_fold(Q[j][None, :] * V)
                cos = dots / (qn[j] * cnv)
                keep = ids != q_id
                frames.append(
                    pd.DataFrame(
                        {
                            "q_id": np.full(int(keep.sum()), q_id, dtype=np.int64),
                            "c_id": ids[keep],
                            "cosine": cos[keep],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return score


def _query_buckets(
    qrows: dict[int, list[float]], dim: int, n_tables: int, planes: int
) -> dict[int, list[int]]:
    """Per-query LSH bucket ids computed DRIVER-side with the exact
    `_bucket_udf` arithmetic (floor(x·1e6) int64 @ signs > 0 bits packed by
    powers of two — integer ops, order-free, bit-identical everywhere).
    Query vectors are driver constants, so there is no reason to round-trip
    them through a plan; equivalence test pins parity with `_lsh_buckets`."""
    signs = (
        np.array(_plane_signs(n_tables, planes, dim), dtype=np.int64)
        .reshape(n_tables * planes, dim)
        .T
    )
    pw = 2 ** np.arange(planes, dtype=np.int64)
    out: dict[int, list[int]] = {}
    for q_id, qv in qrows.items():
        vq = np.floor(np.array(qv, dtype=np.float64) * 1e6).astype(np.int64)
        bits = (vq @ signs > 0).reshape(n_tables, planes)
        out[q_id] = [int(x) for x in (bits * pw).sum(axis=1)]
    return out


def _lsh_probe_score_udf(
    qrows: dict[int, list[float]], dim: int, n_tables: int, planes: int
):
    """Fused LSH search: ONE mapInPandas pass over (vec_id, v) that
    (a) computes each corpus vector's per-table buckets with the exact
    `_bucket_udf` matmul, (b) tests membership against the driver-side
    query buckets (`_query_buckets` — N_QUERIES×L closure state), and
    (c) scores matching (query, candidate) pairs with the `_seq_fold`
    sequential-fold cosine, emitting the skinny (q_id, c_id, cosine)
    stream. Replaces the corpus bucket projection + bucket join + candidate
    dropDuplicates + vector-fetch join + scoring kernel — and the
    cross-table DEDUP becomes structural: a candidate's row lives in
    exactly one batch, so the per-row union over tables (computed with one
    in-kernel any()) can never produce the same pair twice. Self-pairs
    excluded in-kernel.

    Scale shape: zero shuffles until the top-k window on skinny rows; the
    closure holds O(nq·L) ints + nq×dim query floats."""
    signs = (
        np.array(_plane_signs(n_tables, planes, dim), dtype=np.int64)
        .reshape(n_tables * planes, dim)
        .T
    )
    pw = 2 ** np.arange(planes, dtype=np.int64)
    qb = _query_buckets(qrows, dim, n_tables, planes)
    qids = sorted(qrows)
    Q = np.array([qrows[q] for q in qids], dtype=np.float64)
    qn = np.sqrt(_seq_fold(Q * Q))
    # per query: L-vector of its table buckets, for vectorized comparison
    QB = np.array([qb[q] for q in qids], dtype=np.int64)  # nq × L

    def score(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["v"].to_numpy())
            # quantize in-kernel: np.floor(x·1e6) is the identical IEEE
            # multiply+floor the JVM applies (`_vq_col`), and the kernel
            # needs the float64 vectors anyway — shipping a vq column would
            # add 256 B/row of Arrow transfer plus an interpreted JVM floor
            vq = np.floor(V * 1e6).astype(np.int64)
            bits = (vq @ signs > 0).reshape(-1, n_tables, planes)
            B = (bits * pw).sum(axis=2)  # batch × L corpus buckets
            ids = pdf["vec_id"].to_numpy()
            cnv = None  # computed lazily — many batches have no candidates
            frames = []
            for j, q_id in enumerate(qids):
                # candidate ⟺ any table's bucket matches (union over tables)
                mask = (B == QB[j][None, :]).any(axis=1) & (ids != q_id)
                if not mask.any():
                    continue
                if cnv is None:
                    cnv = np.sqrt(_seq_fold(V * V))
                Vm = V[mask]
                dots = _seq_fold(Q[j][None, :] * Vm)
                cos = dots / (qn[j] * cnv[mask])
                frames.append(
                    pd.DataFrame(
                        {
                            "q_id": np.full(int(mask.sum()), q_id, dtype=np.int64),
                            "c_id": ids[mask],
                            "cosine": cos,
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return score


def _lloyd_partials(cents: list[list[float]]):
    """Fused assign + partial-sum pass for the Lloyd step: one mapInPandas
    over the float64 `v` column (quantized in-kernel with the identical
    IEEE floor — `_vq_col` docstring) that (a) assigns each vector to its
    nearest centroid with the EXACT `_assign_udf` arithmetic — same int64
    matmul, same float64 division, same first-max argmax — and (b)
    scatter-adds the int64 component sums and member counts per cid,
    emitting only K×dim rows PER PARTITION. Replaces a corpus-sized kernel
    output + corpus×dim posexplode shuffle with dim-sized partials; int64
    sums of floor(x·1e6) components are order-free (global sums bounded by
    rows·1e6·max|x| ≪ 2^63), so the aggregated (cid, i, s, n) table is
    bit-identical to the exploded-agg formulation at any parallelism.
    Empty cids emit NO rows (callers fall back to the seed centroid), so a
    zero count can never reach the mean's division."""
    C = np.array(_quantize_cents(cents), dtype=np.int64)  # K × dim
    cn = np.sqrt((C * C).sum(axis=1).astype(np.float64))  # K
    K, dim = C.shape

    def partials(it):
        S = np.zeros((K, dim), dtype=np.int64)
        N = np.zeros(K, dtype=np.int64)
        for pdf in it:
            if len(pdf) == 0:
                continue
            # in-kernel quantization (identical IEEE floor — `_vq_col`)
            vq = np.floor(np.stack(pdf["v"].to_numpy()) * 1e6).astype(np.int64)
            d = (vq @ C.T).astype(np.float64)
            vn = np.sqrt((vq * vq).sum(axis=1).astype(np.float64))
            cid = np.argmax(d / (vn[:, None] * cn[None, :]), axis=1)
            counts = np.bincount(cid, minlength=K)
            # K masked sums beat np.add.at (unbuffered per-element fallback)
            for k in np.flatnonzero(counts):
                S[k] += vq[cid == k].sum(axis=0)
            N += counts
        nz = np.flatnonzero(N)
        if len(nz):
            yield pd.DataFrame(
                {
                    "cid": np.repeat(nz, dim).astype("int32"),
                    "i": np.tile(np.arange(dim, dtype="int32"), len(nz)),
                    "s": S[nz].reshape(-1),
                    "n": np.repeat(N[nz], dim),
                }
            )

    return partials


def _with_vq(emb: DataFrame) -> DataFrame:
    """Attach the quantized `vq` column once if absent — callers that persist
    the corpus add it BEFORE the persist so the int32 arrays are cached and
    every kernel pass reads them without recomputing the floor."""
    return emb if "vq" in emb.columns else emb.withColumn("vq", _vq_col(F.col("v")))


def build_ivf(
    emb: DataFrame, dim: int | None = None
) -> tuple[list[list[float]], DataFrame]:
    """Returns (centroids as driver-side K×dim floats, index(vec_id, v, cid)).

    Centroid collection is O(K×dim) driver data — the analogue of a trained
    coarse quantizer, which IS driver/broadcast state in any IVF system.
    Pass ``dim`` when ``emb`` sits behind a shuffle (see
    embedding_near_dup_pairs).

    Seeding is a deterministic md5-min-K sample (the `kmv_distinct` trick):
    the K corpus vectors with the smallest md5(vec_id) hex strings, cid =
    rank in that order. No assumption about id range or density — any
    non-empty corpus seeds; md5 parity across Spark/DuckDB keeps the seed
    set (and therefore the whole index) oracle-checkable. The global
    orderBy+limit plans as TakeOrdered (per-task top-K, K×dim driver data)."""
    dim = dim if dim is not None else _emb_dim(emb)
    seeds = (
        emb.filter(F.col("v").isNotNull())
        .select("vec_id", "v", F.md5(F.col("vec_id").cast("string")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(N_CENTROIDS)
        .collect()
    )
    seeds.sort(key=lambda r: (r["h"], r["vec_id"]))  # pin order off-plan too
    c0 = [list(r["v"]) for r in seeds]
    if not c0:
        raise ValueError(
            "build_ivf: empty embeddings corpus — an IVF index needs seed "
            "centroids (contract queries short-circuit empty corpora before "
            "this point)"
        )
    # one Lloyd step: per-dim mean of each cluster — K×dim tiny partial aggs.
    # Sums are over QUANTIZED floor(x·1e6) integers: order-free, so the
    # centroids (and therefore the whole index) are bit-identical at any
    # parallelism and across engines — IVF becomes oracle-checkable.
    # Shape: ONE fused mapInPandas pass per partition that assigns c0 AND
    # scatter-adds the integer partial sums in numpy, emitting only K×dim
    # rows per partition (`_lloyd_partials`). This replaces the former
    # c0-assignment kernel pass + corpus×dim posexplode shuffle (128M
    # exploded rows at 2M×64) with the same exact arithmetic: per-row cid is
    # the identical int64-matmul argmax as `_assign_udf`, and int64 sums of
    # quantized components are order-free, so the final (cid, i) sums and
    # counts match the exploded-agg formulation bit-for-bit (equivalence
    # test pins this). The per-(cid, i) `n` is the cluster size repeated per
    # component, summed across partitions like `s`. Quantization happens
    # IN-KERNEL from the float64 vectors (identical IEEE floor — `_vq_col`
    # docstring), so no interpreted JVM floor runs and no extra column ships.
    sums = (
        emb.select("v")
        .mapInPandas(_lloyd_partials(c0), schema="cid int, i int, s long, n long")
        .groupBy("cid", "i")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
    )
    comp: dict[int, dict[int, int]] = {}
    n_by_cid: dict[int, int] = {}
    for r in sums.collect():  # K×dim rows, one action
        comp.setdefault(r["cid"], {})[r["i"]] = r["s"]
        n_by_cid[r["cid"]] = r["n"]
    # cid is an INDEX into c0 (argmax position), so the centroid count is
    # len(c0) — a corpus with fewer than N_CENTROIDS seed rows (sparse ids,
    # null vectors among the seeds) simply trains a smaller quantizer
    c1 = [
        [comp[c][i] / 1e6 / n_by_cid[c] for i in range(dim)]
        if c in comp
        else c0[c]
        for c in range(len(c0))
    ]
    return c1, _assign(_with_vq(emb), c1)


_IVF_COS = (
    "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
    "* sqrt(list_dot_product({b}, {b})))"
)
# quantized similarity for ASSIGNMENT and PROBE SELECTION (mirrors
# _centroid_sims_q / _assign_udf exactly): floor(x·1e6) components, exact
# order-free integer dots (≤2^53 so double-typed sums are still exact), two
# sqrts + multiply + divide as the only float ops. `scored` keeps the raw
# 6dp-rounded cosine — that is the OUTPUT value, not a discrete decision.
_IVF_Q = "list_transform({v}, x -> floor(x * 1e6))"
_IVF_QSIM = (
    f"list_dot_product({_IVF_Q.format(v='{a}')}, {_IVF_Q.format(v='{b}')})"
    f" / (sqrt(list_dot_product({_IVF_Q.format(v='{a}')}, {_IVF_Q.format(v='{a}')}))"
    f" * sqrt(list_dot_product({_IVF_Q.format(v='{b}')}, {_IVF_Q.format(v='{b}')})))"
)
_ANN_IVF_SQL = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
c0 AS (
  -- md5-min-K seed sample, cid = rank in md5 order (mirrors build_ivf;
  -- same md5(cast(id AS varchar)) parity the kmv_distinct oracle relies on)
  SELECT cast(rn - 1 AS int) AS cid, cv FROM (
    SELECT v AS cv,
           row_number() OVER (ORDER BY md5(cast(vec_id AS varchar)), vec_id) AS rn
    FROM emb
  ) WHERE rn <= {N_CENTROIDS}
),
a0 AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_IVF_QSIM.format(a="e.v", b="c.cv")} DESC, c.cid
           ) AS rn
    FROM emb e CROSS JOIN c0 c
  ) WHERE rn = 1
),
comp AS (
  SELECT cid, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM a0
),
sums AS (
  SELECT cid, i, sum(cast(floor(x * 1e6) AS bigint)) AS s
  FROM comp GROUP BY 1, 2
),
cnt AS (SELECT cid, count(*) AS n FROM a0 GROUP BY 1),
c1 AS (
  SELECT s.cid, list(s.s / 1e6 / c.n ORDER BY s.i) AS cv
  FROM sums s JOIN cnt c USING (cid) GROUP BY s.cid, c.n
),
c1full AS (
  SELECT cid, cv FROM c1
  UNION ALL
  SELECT cid, cv FROM c0 WHERE cid NOT IN (SELECT cid FROM c1)
),
idx AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_IVF_QSIM.format(a="e.v", b="c.cv")} DESC, c.cid
           ) AS rn
    FROM emb e CROSS JOIN c1full c
  ) WHERE rn = 1
),
probes AS (
  SELECT q_id, cid FROM (
    SELECT e.vec_id AS q_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_IVF_QSIM.format(a="e.v", b="c.cv")} DESC, c.cid
           ) AS rn
    FROM emb e CROSS JOIN c1full c
    WHERE e.vec_id < {N_QUERIES}
  ) WHERE rn <= {N_PROBE}
),
scored AS (
  SELECT p.q_id, a.vec_id AS c_id,
         round({_IVF_COS.format(a="q.v", b="a.v")}, 6) AS cosine
  FROM probes p
  JOIN idx a USING (cid)
  JOIN emb q ON q.vec_id = p.q_id
  WHERE a.vec_id <> p.q_id
)
SELECT q_id, c_id, cosine,
       cast(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS int) AS rank
FROM scored QUALIFY rank <= {TOP_K}
"""


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k: probe the N_PROBE nearest centroids per query, exact cosine
    within those lists only. Approximate vs brute force (recall gated in
    tests) but fully DETERMINISTIC (seeded centroids, integer-quantized Lloyd
    sums) — the query is DuckDB-oracle-verified end to end."""
    raw = (
        t(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        # NULL vectors cannot participate in any similarity math (cosine,
        # signatures, centroids) — excluded here so neither the driver-side
        # seed collect nor the Arrow kernels ever see None
        .filter(F.col("v").isNotNull())
    )
    dim = _emb_dim(raw)
    if dim is None:  # empty corpus → empty result, contract schema
        return spark.createDataFrame([], _TOPK_SCHEMA)
    # single-split testdata: the Arrow kernels otherwise run in ONE task —
    # repartition ONLY when the source is under-split (fewer input splits
    # than cores). No downstream op needs a particular partitioning anymore
    # (the fused search pass replaced the cid join; the top-k window
    # shuffles by q_id regardless), so a well-split corpus skips the full
    # vector-payload shuffle entirely (~1.5 GB at 2M×64 — measured seconds
    # of the cold wall). The corpus is tracked-persisted: the BUILD consumes
    # it twice (seed collect + Lloyd pass) and the SEARCH pass reads it
    # again (MEMORY_AND_DISK: spills, never OOMs). Quantization happens
    # inside each kernel (numpy floor, identical IEEE — `_vq_col`), so the
    # cache holds only (vec_id, v) and no interpreted JVM floor ever runs.
    from log_anomaly_detector_spark.operators.caching import tracked_persist

    par = spark.sparkContext.defaultParallelism
    shaped = raw if raw.rdd.getNumPartitions() >= par else raw.repartition(par)
    emb = tracked_persist("ivf_emb", shaped)
    cents, _index = build_ivf(emb, dim=dim)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    qrows = {r["q_id"]: list(r["qv"]) for r in q.collect()}
    if not qrows:  # corpus has no query-range ids → empty result, same schema
        return spark.createDataFrame([], _TOPK_SCHEMA)
    # the whole search tail is ONE fused corpus pass (`_probe_score_udf`):
    # c1 assignment, probe-list membership (probe lists computed driver-side
    # with the exact Catalyst arithmetic — `_probe_lists`, equivalence
    # tested), and the sequential-fold exact cosine, emitting the skinny
    # (q_id, c_id, cosine) candidate stream. The former tail re-ran the
    # assignment kernel, materialized a cid join carrying full vector
    # payloads (~1.3 GB at 2M×64), and re-shipped those vectors to a second
    # kernel — measured 12.7 s at local[2]; the fused pass does it in ~4 s.
    # Values are bit-identical throughout, so the DuckDB oracle (which still
    # expresses probes/index relationally) passes untouched.
    scored = emb.select("vec_id", "v").mapInPandas(
        _probe_score_udf(cents, qrows), schema="q_id long, c_id long, cosine double"
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.select("q_id", "c_id", F.round(F.col("cosine"), 6).alias("cosine"))
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
    "ann_lsh": _ANN_LSH_SQL,
    "ann_ivf": _ANN_IVF_SQL,
    "embedding_mean": _EMB_MEAN_SQL,
    "embedding_near_dup": _EMB_NEARDUP_SQL,
}
