"""Similarity search over an embedding column (array<float>).

Two paths over the `embeddings` table (vec_id bigint, embedding
list<float>[64], label int):

  cosine_topk     brute-force exact top-k: broadcast the (small) query
                  set against all candidates; the baseline and the
                  correctness oracle.
  rp_lsh_topk     random-hyperplane LSH: 8 sign-projection bits -> 256
                  buckets; candidates share the query's bucket. The
                  scale path — candidate count drops ~256x; recall is
                  probabilistic (pytest checks it against brute force).

Determinism: hyperplane signs are derived in Python from md5 (portable,
fixed), embedded as literal arrays in BOTH the Spark plan and the oracle
SQL, so the LSH variant is hash-checked too, not rows-only.

All dot products fold left-to-right over the list order after a
float->double cast, which is bit-identical between Spark's `aggregate`
HOF and DuckDB's `list_dot_product` (verified empirically).

Scale notes: brute-force is O(|Q| x N x d) with the query side
broadcast — no shuffle of the candidate table at all; LSH prunes the
candidate stream by bucket equality before any arithmetic. At 100 TB the
candidate scan stays embarrassingly parallel; the only shuffle is the
final per-query top-k (tiny). For billions of vectors swap the in-plan
literal hyperplanes for a broadcast matrix and add multi-probe.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

EMBED_DIM = 64
N_PLANES = 8


def _plane_sign(p: int, d: int) -> int:
    """Deterministic ±1 from md5 — same constants in Spark and SQL."""
    h = hashlib.md5(f"plane:{p}:dim:{d}".encode()).hexdigest()
    return 1 if int(h[:8], 16) & 1 else -1


PLANES: list[list[int]] = [
    [_plane_sign(p, d) for d in range(EMBED_DIM)] for p in range(N_PLANES)
]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def with_norm(df: DataFrame, out: str = "norm") -> DataFrame:
    emb = _as_double(F.col("embedding"))
    return df.withColumn(out, F.sqrt(_dot(emb, emb)))


def cosine_topk(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 10,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for the first `n_queries` vectors."""
    return cosine_topk_df(load_table(spark, sf_dir, "embeddings"), n_queries, k)


def cosine_topk_df(emb_raw: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    emb = with_norm(emb_raw)
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    cands = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    cos = _dot(_as_double(F.col("q_emb")), _as_double(F.col("c_emb"))) / (
        F.col("q_norm") * F.col("c_norm")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        F.broadcast(queries)
        .crossJoin(cands)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
        .orderBy("query_id", "rank")
    )


COSINE_TOPK_SQL = """
WITH normed AS (
  SELECT vec_id, embedding,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
  FROM embeddings
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
           / (q.norm * c.norm) AS cosine
  FROM normed q JOIN normed c ON q.vec_id < 10 AND q.vec_id != c.vec_id
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cosine
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


def _bucket_expr() -> Column:
    """256-bucket id from 8 sign projections (in-plan literal planes)."""
    emb = _as_double(F.col("embedding"))
    bucket: Column = F.lit(0)
    for p in range(N_PLANES):
        plane = F.array(*[F.lit(float(s)) for s in PLANES[p]])
        proj = _dot(emb, plane)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def _bucket_sql() -> str:
    parts = []
    for p in range(N_PLANES):
        arr = "[" + ",".join(f"{s}.0" for s in PLANES[p]) + "]"
        parts.append(
            f"CASE WHEN list_dot_product(embedding::DOUBLE[], {arr}::DOUBLE[]) > 0 "
            f"THEN {1 << p} ELSE 0 END"
        )
    return " + ".join(parts)


def rp_lsh_topk(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 10,
    k: int = 5,
) -> DataFrame:
    """LSH-bucketed approximate top-k (same-bucket candidates only)."""
    return rp_lsh_topk_df(load_table(spark, sf_dir, "embeddings"), n_queries, k)


def rp_lsh_topk_df(emb_raw: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    emb = with_norm(emb_raw).withColumn("bucket", _bucket_expr())
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        F.col("bucket").alias("q_bucket"),
    )
    cands = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
        F.col("bucket").alias("c_bucket"),
    )
    cos = _dot(_as_double(F.col("q_emb")), _as_double(F.col("c_emb"))) / (
        F.col("q_norm") * F.col("c_norm")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        F.broadcast(queries)
        .join(cands, F.col("q_bucket") == F.col("c_bucket"))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
        .orderBy("query_id", "rank")
    )


def rp_lsh_topk_sql() -> str:
    return f"""
WITH normed AS (
  SELECT vec_id, embedding,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm,
         ({_bucket_sql()}) AS bucket
  FROM embeddings
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
           / (q.norm * c.norm) AS cosine
  FROM normed q JOIN normed c
    ON q.vec_id < 10 AND q.bucket = c.bucket AND q.vec_id != c.vec_id
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cosine
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


def embedding_near_dup_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.4
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding-space near-dups).

    The synthetic embeddings are near-orthogonal (max pairwise cosine
    ~0.51), so the default threshold is 0.4 to exercise non-empty
    output; production near-dup uses 0.9+. Brute force at test scale;
    at 100 TB the same query runs after an LSH bucket equality predicate
    (see rp_lsh_topk) to avoid the cross product.
    """
    emb = with_norm(load_table(spark, sf_dir, "embeddings"))
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("norm").alias("norm_a"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("norm").alias("norm_b"),
    )
    cos = _dot(_as_double(F.col("emb_a")), _as_double(F.col("emb_b"))) / (
        F.col("norm_a") * F.col("norm_b")
    )
    return (
        a.crossJoin(b)
        .where(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
        .orderBy("vec_a", "vec_b")
    )


EMBEDDING_NEAR_DUP_SQL = """
WITH normed AS (
  SELECT vec_id, embedding,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
         / (a.norm * b.norm) AS cosine
FROM normed a JOIN normed b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        / (a.norm * b.norm) >= 0.4
ORDER BY vec_a, vec_b
"""
