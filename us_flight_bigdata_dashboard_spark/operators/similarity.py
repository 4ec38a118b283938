"""Vector similarity search over ``embeddings`` (north-star extension).

Brute-force cosine top-k is the correctness baseline; sign-random-projection
LSH bucketing is the scale path (candidates only within a bucket — the
all-pairs product never materializes at 100 TB).

Determinism: dot products and norms are computed as *sequential
left-to-right folds* over the array (Spark ``aggregate`` ≡ DuckDB
``list_reduce``) with per-element float→double casts. Identical operand
order + IEEE arithmetic → bit-identical results in both engines, so ranks
need no tolerance; remaining ties (exact-duplicate vectors) are broken by
neighbor id.

At cluster scale the few query vectors broadcast; candidate generation for
LSH shuffles only (bucket, vec_id) pairs.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

N_QUERY_VECS = 5
TOP_K = 10
N_PLANES = 8
DIM = 64


def _dot(a: Column, b: Column) -> Column:
    """Sequential fold dot product — deterministic operand order."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), "
        f"(acc, x) -> acc + x)"
    )


def _cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _sql_cosine(a: str, b: str) -> str:
    return f"({_sql_dot(a, b)} / (sqrt({_sql_dot(a, a)}) * sqrt({_sql_dot(b, b)})))"


# ---------------------------------------------------------------------------
# Brute-force cosine top-k
# ---------------------------------------------------------------------------

def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors for the first 5 vectors: broadcast the
    query side, score all candidates, partitioned window rank."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cand = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    scored = (
        F.broadcast(queries)
        .crossJoin(cand)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine(F.col("q_emb"), F.col("c_emb")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= TOP_K)


def _sql_knn_bruteforce() -> str:
    cos = _sql_cosine("q.embedding", "c.embedding")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {cos} AS cosine_sim
  FROM embeddings q JOIN embeddings c ON q.vec_id < {N_QUERY_VECS} AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine_sim,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# Sign-random-projection LSH ANN
# ---------------------------------------------------------------------------

def _plane_weights() -> list[list[int]]:
    """Deterministic pseudo-random ±1 hyperplanes from md5(plane, dim) —
    computed in Python, embedded as literals in BOTH engines' plans (at
    scale this is a broadcast weights table, not runtime hashing)."""
    planes = []
    for p in range(N_PLANES):
        row = []
        for d in range(DIM):
            h = hashlib.md5(f"plane{p}_dim{d}".encode()).hexdigest()
            row.append(1 if h[0] >= "8" else -1)
        planes.append(row)
    return planes


def _bucket_expr(emb: Column) -> Column:
    """8-bit sign-projection bucket string for a vector column."""
    bits = []
    for row in _plane_weights():
        weights = F.array(*[F.lit(float(w)) for w in row])
        proj = F.aggregate(
            F.zip_with(emb, weights, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _sql_bucket(emb: str) -> str:
    parts = []
    for row in _plane_weights():
        lst = "[" + ", ".join(f"CAST({w}.0 AS DOUBLE)" for w in row) + "]"
        proj = (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(list_zip({emb}, {lst}), p -> CAST(p[1] AS DOUBLE) * p[2])), "
            f"(acc, x) -> acc + x)"
        )
        parts.append(f"(CASE WHEN {proj} >= 0 THEN '1' ELSE '0' END)")
    return " || ".join(parts)


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via sign-random-projection buckets: candidates share the query's
    8-bit bucket; exact cosine re-rank inside the bucket (top-5). The
    bucket equi-join is the scale path — ~n/256 candidates per query
    instead of n."""
    emb = load_table(spark, sf_dir, "embeddings")
    bucketed = emb.select("vec_id", "embedding", _bucket_expr(F.col("embedding")).alias("bucket"))
    queries = bucketed.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"), "bucket"
    )
    cand = bucketed.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"), "bucket")
    scored = (
        F.broadcast(queries)
        .join(cand, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "bucket",
            _cosine(F.col("q_emb"), F.col("c_emb")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)


def _sql_ann_lsh() -> str:
    cos = _sql_cosine("q.embedding", "c.embedding")
    bucket = _sql_bucket("embedding")
    return f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.bucket AS bucket,
         {cos} AS cosine_sim
  FROM bucketed q JOIN bucketed c USING (bucket)
  WHERE q.vec_id < {N_QUERY_VECS} AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, bucket, cosine_sim, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# IVF-style ANN (inverted file: centroid assignment + probe-cluster search)
# ---------------------------------------------------------------------------

N_CENTROIDS = 8


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: the first ``N_CENTROIDS`` vectors act as deterministic
    centroids (in production: k-means over a sample, centroids broadcast);
    every vector is assigned to its nearest centroid (inverted file), a
    query searches only its own cell — candidate set ~n/K instead of n.

    Spark shape at scale: centroid table broadcasts; assignment is a
    narrow map; the cell equi-join replaces the brute-force cross join."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cent_emb")
    )
    scored_cells = (
        emb.crossJoin(F.broadcast(centroids))
        .select(
            "vec_id",
            "embedding",
            "centroid_id",
            _cosine(F.col("embedding"), F.col("cent_emb")).alias("cent_sim"),
        )
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("cent_sim").desc(), F.col("centroid_id").asc())
    assigned = (
        scored_cells.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "centroid_id")
    )
    queries_df = assigned.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"), "centroid_id"
    )
    cand = assigned.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"), "centroid_id")
    scored = (
        F.broadcast(queries_df)
        .join(cand, "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "centroid_id",
            _cosine(F.col("q_emb"), F.col("c_emb")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)


def _sql_ann_ivf() -> str:
    cent_sim = _sql_cosine("e.embedding", "c.embedding")
    cos = _sql_cosine("q.embedding", "n.embedding")
    return f"""
WITH centroids AS (
  SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id < {N_CENTROIDS}
),
assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {cent_sim} DESC, c.centroid_id ASC) AS rn
    FROM embeddings e CROSS JOIN centroids c
  ) WHERE rn = 1
),
scored AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, q.centroid_id,
         {cos} AS cosine_sim
  FROM assigned q JOIN assigned n USING (centroid_id)
  WHERE q.vec_id < {N_QUERY_VECS} AND q.vec_id <> n.vec_id
)
SELECT query_id, neighbor_id, centroid_id, cosine_sim, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs
# ---------------------------------------------------------------------------

def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate detection in embedding space: LSH-bucketed pairs with
    cosine ≥ 0.99 (the embedding-space analog of MinHash dedup; bucketing
    keeps the pair space sparse at scale)."""
    emb = load_table(spark, sf_dir, "embeddings")
    bucketed = emb.select("vec_id", "embedding", _bucket_expr(F.col("embedding")).alias("bucket"))
    a = bucketed.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"), "bucket")
    b = bucketed.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", _cosine(F.col("emb_a"), F.col("emb_b")).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= 0.99)
    )


def _sql_embedding_near_dup() -> str:
    cos = _sql_cosine("a.embedding", "b.embedding")
    bucket = _sql_bucket("embedding")
    return f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cosine_sim
FROM bucketed a JOIN bucketed b USING (bucket)
WHERE a.vec_id < b.vec_id AND {cos} >= 0.99
"""


# ---------------------------------------------------------------------------
# Per-label vector statistics
# ---------------------------------------------------------------------------

def q_vector_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label counts + norm statistics (min/max of a deterministic
    per-row norm — order-independent aggregates)."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    return (
        emb.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("norm").alias("min_norm"),
            F.max("norm").alias("max_norm"),
        )
    )


def _sql_vector_label_stats() -> str:
    norm = f"sqrt({_sql_dot('embedding', 'embedding')})"
    return f"""
SELECT label,
       COUNT(*) AS n_vectors,
       MIN({norm}) AS min_norm,
       MAX({norm}) AS max_norm
FROM embeddings
GROUP BY 1
"""


QUERIES = {
    "knn_bruteforce": q_knn_bruteforce,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "embedding_near_dup": q_embedding_near_dup,
    "vector_label_stats": q_vector_label_stats,
}

ORACLE = {
    "knn_bruteforce": _sql_knn_bruteforce(),
    "ann_lsh": _sql_ann_lsh(),
    "ann_ivf": _sql_ann_ivf(),
    "embedding_near_dup": _sql_embedding_near_dup(),
    "vector_label_stats": _sql_vector_label_stats(),
}
