"""Product-quantization (PQ) approximate nearest neighbor — the
memory-compression tier of the ANN family.

The engine's other ANN paths trade compute (brute force), candidate
count (RP-LSH buckets), or probe breadth (IVF cells). PQ attacks MEMORY:
each 64-dim vector is split into 8 subvectors of 8 components, each
subvector replaced by the id of its nearest entry in a 16-entry
sub-codebook — 8 x 4 bits ≈ 8 bytes per vector against 256 bytes of
floats, a 32x compression that is what lets billion-vector indexes live
in RAM (Jégou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011). Queries score against codes with an asymmetric
distance: one (M x codes) lookup table per query, then each candidate
costs M table adds — no float math per candidate at all.

Spark shape: the codebook is O(codes x dim) and rides the closure; both
encode and ADC scoring are narrow numpy-matmul mapInPandas passes over
the cached quantized vectors (the kmeans/RP-LSH precedent), so the only
shuffle in the whole operator is the final per-query top-k.

Exactness: everything runs in the same round(x*1e6) int64 quantization
as embedding_kmeans — subspace distances < 2^45, ADC sums < 2^48 — with
first-minimum (lowest code id) tie-breaks, so the DuckDB oracle
reproduces encode + LUT + ADC bit-for-bit and the driver hash-checks
the full PQ pipeline.

Codebook: the quantized subvectors of the first `codes` vectors (the
same deterministic seeding rule as embedding_kmeans' initial centroids).
Training the codebook with per-subspace Lloyd rounds is the
embedding_kmeans machinery applied per subspace; kept untrained here so
the oracle stays one SQL statement while encode/ADC mechanics — the
part that matters at scale — are fully exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .similarity import _quantized

PQ_M = 8  # subspaces
PQ_D = 8  # dims per subspace
PQ_CODES = 16  # codebook entries per subspace

__all__ = ["pq_topk", "PQ_TOPK_SQL"]


def pq_topk(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 10,
    k: int = 5,
) -> DataFrame:
    """(query_id, rank, neighbor_id, adc_dist): PQ/ADC top-k per query."""
    import numpy as np
    import pandas as pd

    emb = _quantized(load_table(spark, sf_dir, "embeddings")).persist()

    def _mat(df: DataFrame) -> "np.ndarray":
        rows = df.orderBy("vec_id").collect()
        return np.array([r["q"] for r in rows], dtype=np.int64).reshape(
            len(rows), PQ_M, PQ_D
        )

    # codebook + query sets are O(codes x dim) / O(n_queries x dim):
    # driver-side by design, same shape as the kmeans codebook collect
    cmat = _mat(emb.where(F.col("vec_id") < PQ_CODES))  # (codes, M, D)
    qmat = _mat(emb.where(F.col("vec_id") < n_queries))  # (nq, M, D)
    # per-query lookup table: lut[q, m, c] = |query_sub - code_sub|^2
    lut = ((qmat[:, None, :, :] - cmat[None, :, :, :]) ** 2).sum(axis=3)
    lut = np.ascontiguousarray(lut.transpose(0, 2, 1))  # (nq, M, codes)
    nq = lut.shape[0]

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf["q"].tolist(), dtype=np.int64).reshape(
                len(pdf), PQ_M, PQ_D
            )
            # encode: nearest sub-code per subspace, ties -> lowest code id
            d = ((x[:, None, :, :] - cmat[None, :, :, :]) ** 2).sum(axis=3)
            codes = d.argmin(axis=1)  # (b, M)
            # ADC: per query, sum the M table entries the codes select
            m_idx = np.arange(PQ_M)[None, :]
            adc = np.stack(
                [lut[qi][m_idx, codes].sum(axis=1).ravel() for qi in range(nq)],
                axis=1,
            )  # (b, nq)
            vec_ids = pdf["vec_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(np.arange(nq, dtype=np.int64), len(pdf)),
                    "neighbor_id": np.tile(vec_ids, nq),
                    "adc_dist": adc.T.reshape(-1),
                }
            )

    scored = emb.mapInPandas(
        score, "query_id bigint, neighbor_id bigint, adc_dist bigint"
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    out = (
        scored.where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "adc_dist")
        .orderBy("query_id", "rank")
        .localCheckpoint(eager=True)
    )
    emb.unpersist()
    return out


def _sq_dist_sql(a: str, b: str, m: str, d: str) -> str:
    idx = f"(({m} - 1) * {PQ_D} + {d})"
    return f"(({a}[{idx}] - {b}[{idx}]) * ({a}[{idx}] - {b}[{idx}]))"


PQ_TOPK_SQL = f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(round(x * 1000000) AS BIGINT)) AS q
  FROM embeddings
),
cb AS (SELECT vec_id AS code_id, q FROM qv WHERE vec_id < {PQ_CODES}),
enc_d AS (
  SELECT e.vec_id, c.code_id, m.m,
         SUM({_sq_dist_sql('e.q', 'c.q', 'm.m', 'd.d')}) AS dist
  FROM qv e, cb c, generate_series(1, {PQ_M}) m(m), generate_series(1, {PQ_D}) d(d)
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT vec_id, m, code_id FROM (
    SELECT vec_id, m, code_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m
                              ORDER BY dist, code_id) AS rn
    FROM enc_d
  ) WHERE rn = 1
),
lut AS (
  SELECT vec_id AS query_id, code_id, m, dist
  FROM enc_d WHERE vec_id < 10
),
adc AS (
  SELECT l.query_id, x.vec_id AS neighbor_id, SUM(l.dist) AS adc_dist
  FROM codes x
  JOIN lut l ON l.m = x.m AND l.code_id = x.code_id
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, neighbor_id, adc_dist,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc_dist, neighbor_id) AS rank
  FROM adc WHERE query_id != neighbor_id
)
SELECT query_id, rank, neighbor_id, adc_dist
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""
