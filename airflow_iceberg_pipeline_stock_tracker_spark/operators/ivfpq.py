"""IVF-PQ (IVFADC) approximate nearest neighbor — the full
billion-scale index architecture, re-expressed on Spark.

This composes the engine's two trained quantizers the way FAISS's
IVFADC does (Jégou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011, §IV): a COARSE quantizer (k-means over full
vectors) partitions the corpus into cells — the inverted file (IVF) —
and a PRODUCT quantizer compresses each vector's RESIDUAL against its
cell centroid. Queries probe only the `nprobe` nearest cells and score
candidates with asymmetric distance (per-(query, cell) lookup tables,
M table adds per candidate). Encoding residuals instead of raw vectors
is what makes the PQ codebook sharp: residual energy is a fraction of
vector energy, so 4-bit codes spend their resolution near the data.

Spark shape (the train-small/score-big discipline shared with
embedding_kmeans and pq_topk):
  * coarse training and residual-PQ training are each one fused
    assign+partial-sum mapInPandas pass per Lloyd round; only
    O(k*dim) / O(M*codes*D) partial tables shuffle or collect;
  * the scoring pass is ONE narrow mapInPandas over the cached
    quantized vectors — each batch assigns cells, takes residuals,
    encodes, and emits ADC rows only for (query, vector) pairs whose
    cell is probed — candidate volume is nprobe/k of the corpus, the
    IVF pruning working as designed;
  * the only data-sized shuffle is the final per-query top-k.

Exactness: the round(x*1e6) int64 lattice end-to-end. Residuals are
int - int (|r| <= 2e6), subspace distances < 2^47, ADC sums < 2^53,
floor-mean centroid updates — every iterate bit-reproducible, so the
DuckDB oracle unrolls coarse Lloyd -> residuals -> per-subspace Lloyd
-> encode -> probe -> LUT -> ADC as CTEs and the driver hash-checks
the ENTIRE index build + query pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .similarity import _quantized

IVFPQ_CELLS = 8  # coarse cells (inverted lists)
IVFPQ_COARSE_ITERS = 1  # coarse Lloyd rounds
IVFPQ_M = 8  # PQ subspaces
IVFPQ_D = 8  # dims per subspace
IVFPQ_CODES = 16  # PQ codebook entries per subspace
IVFPQ_PQ_ITERS = 1  # residual-PQ Lloyd rounds
IVFPQ_NPROBE = 2  # cells probed per query

DIM = IVFPQ_M * IVFPQ_D

__all__ = ["ivfpq_topk", "IVFPQ_TOPK_SQL"]


def _np():
    import numpy as np

    return np


def _coarse_assign(x, cmat):
    """(b,) nearest full-dim centroid ids, ties -> lowest index.

    Exact int64: |q| <= 1e6, dim 64 -> every term < 2^53.
    """
    np = _np()
    c2 = (cmat * cmat).sum(axis=1)  # (k,)
    return (c2[None, :] - 2 * (x @ cmat.T)).argmin(axis=1)


def _pq_encode(r, pqmat, valid):
    """codes (b, M) for residual block r (b, M, D) vs pqmat (M, C, D)."""
    np = _np()
    far = 1 << 60
    r2 = (r * r).sum(axis=2)
    c2 = (pqmat * pqmat).sum(axis=2)
    rc = np.einsum("bmd,mcd->bmc", r, pqmat)
    d = r2[:, :, None] - 2 * rc + c2[None, :, :]
    d = np.where(valid[None, :, :], d, far)
    return d.argmin(axis=2)


def _batch_mat(pdf):
    np = _np()
    return np.array(pdf["q"].tolist(), dtype=np.int64)


def _train_coarse(emb: DataFrame, k: int, iters: int, seed_pred=None, seed_rows=None):
    """Full-dim int Lloyd (the embedding_kmeans loop, numpy-fused).

    ``seed_pred``: optional Column predicate selecting exactly the k
    seed rows (default: vec_id < k, the registered row's rule). Seeds
    are consumed in vec_id order, so any predicate whose selected ids
    sort the same way in the SQL twin's `ORDER BY cid` tie-breaks is
    oracle-exact (retrieval.py seeds on first-chunk ids).

    ``seed_rows``: pre-collected seed rows (vec_id-ascending), letting a
    caller fund several trainers' seeds from ONE driver collect instead
    of one job each (guide §1.2 job-count reduction)."""
    import pandas as pd

    np = _np()
    if seed_rows is None:
        if seed_pred is None:
            seed_pred = F.col("vec_id") < k
        seed_rows = emb.where(seed_pred).orderBy("vec_id").collect()
    cmat = np.array([r["q"] for r in seed_rows], dtype=np.int64)
    for _ in range(iters):
        cb = cmat

        def partials(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                x = _batch_mat(pdf)
                idx = _coarse_assign(x, cb)
                for j in np.unique(idx):
                    sel = x[idx == j]
                    s = sel.sum(axis=0)
                    yield pd.DataFrame(
                        {
                            "cluster": int(j),
                            "i": np.arange(DIM, dtype=np.int64),
                            "s": s,
                            "n": int(sel.shape[0]),
                        }
                    )

        upd = (
            emb.mapInPandas(partials, "cluster int, i bigint, s bigint, n bigint")
            .groupBy("cluster", "i")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .select(
                "cluster",
                "i",
                F.floor(F.col("s").cast("double") / F.col("n"))
                .cast("bigint")
                .alias("v"),
            )
            .collect()
        )
        got = sorted({int(r["cluster"]) for r in upd})
        new = np.zeros((len(got), DIM), dtype=np.int64)
        remap = {c: i for i, c in enumerate(got)}
        for r in upd:
            new[remap[int(r["cluster"])], r["i"]] = r["v"]
        cmat = new
        # NOTE: cell ids after a drop are re-densified in ascending order
        # of surviving cluster id — the oracle's GROUP BY + ROW_NUMBER
        # ordering reproduces the same dense ranks. With k=8 over the
        # fixtures nothing ever empties; this is belt-and-braces.
    return cmat


def _train_residual_pq(
    emb: DataFrame, cmat, codes: int, iters: int, seed_pred=None, seed_rows=None
):
    """Per-subspace int Lloyd over residuals (the pq.py loop + coarse).

    ``seed_pred``: optional Column predicate selecting the seed rows
    (default: vec_id < codes, the registered row's rule). ``seed_rows``:
    pre-collected seed rows (vec_id-ascending) — see _train_coarse."""
    import pandas as pd

    np = _np()
    if seed_rows is None:
        if seed_pred is None:
            seed_pred = F.col("vec_id") < codes
        seed_rows = emb.where(seed_pred).orderBy("vec_id").collect()
    smat = np.array([r["q"] for r in seed_rows], dtype=np.int64)
    sres = smat - cmat[_coarse_assign(smat, cmat)]
    pqmat = np.ascontiguousarray(
        sres.reshape(len(sres), IVFPQ_M, IVFPQ_D).transpose(1, 0, 2)
    )
    valid = np.ones((IVFPQ_M, pqmat.shape[1]), dtype=bool)

    for _ in range(iters):
        pb, vd = pqmat, valid

        def partials(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                x = _batch_mat(pdf)
                r = (x - cmat[_coarse_assign(x, cmat)]).reshape(
                    len(x), IVFPQ_M, IVFPQ_D
                )
                cd = _pq_encode(r, pb, vd)
                # ONE emitted frame per Arrow batch: scatter-add per slot
                sums = np.zeros((IVFPQ_M, pb.shape[1], IVFPQ_D), dtype=np.int64)
                cnts = np.zeros((IVFPQ_M, pb.shape[1]), dtype=np.int64)
                for m in range(IVFPQ_M):
                    np.add.at(sums[m], cd[:, m], r[:, m, :])
                    np.add.at(cnts[m], cd[:, m], 1)
                mm, cc = np.nonzero(cnts)
                yield pd.DataFrame(
                    {
                        "m": np.repeat(mm, IVFPQ_D),
                        "code": np.repeat(cc, IVFPQ_D),
                        "i": np.tile(
                            np.arange(IVFPQ_D, dtype=np.int64), len(mm)
                        ),
                        "s": sums[mm, cc].reshape(-1),
                        "n": np.repeat(cnts[mm, cc], IVFPQ_D),
                    }
                )

        upd = (
            emb.mapInPandas(partials, "m int, code int, i bigint, s bigint, n bigint")
            .groupBy("m", "code", "i")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .select(
                "m",
                "code",
                "i",
                F.floor(F.col("s").cast("double") / F.col("n"))
                .cast("bigint")
                .alias("v"),
            )
            .collect()
        )
        new_mat = np.zeros_like(pqmat)
        new_valid = np.zeros_like(valid)
        for r in upd:
            new_mat[r["m"], r["code"], r["i"]] = r["v"]
            new_valid[r["m"], r["code"]] = True
        pqmat, valid = new_mat, new_valid
    return pqmat, valid


def ivfpq_topk(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 10,
    k: int = 5,
    nprobe: int = IVFPQ_NPROBE,
    rerank: int | None = None,
) -> DataFrame:
    """(query_id, rank, neighbor_id, adc_dist): IVFADC top-k per query.

    Candidates are restricted to each query's `nprobe` nearest cells
    (probe order: exact int L2 to the coarse centroids, ties to the
    lower cell id); distances are asymmetric PQ lookups over residual
    codes. query_id is the query's actual vec_id.

    ``rerank``: when set (> k), the standard two-stage retrieval: take
    the top-``rerank`` ADC candidates per query, score ONLY those with
    the exact int64 L2 against the stored full vectors, and return the
    exact top-k (adc_dist column then carries the exact distance).
    Production PQ systems close the quantization recall gap exactly
    this way — the expensive metric touches O(nq * rerank) vectors,
    never the corpus (tests pin recall(reranked) >= recall(ADC)).
    """
    import pandas as pd

    np = _np()
    emb = _quantized(load_table(spark, sf_dir, "embeddings")).persist()
    cmat = _train_coarse(emb, IVFPQ_CELLS, IVFPQ_COARSE_ITERS)
    pqmat, valid = _train_residual_pq(emb, cmat, IVFPQ_CODES, IVFPQ_PQ_ITERS)

    qrows = emb.where(F.col("vec_id") < n_queries).orderBy("vec_id").collect()
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qmat = np.array([r["q"] for r in qrows], dtype=np.int64)
    nq = len(qids)
    # probe list per query: nprobe nearest cells by exact distance
    c2 = (cmat * cmat).sum(axis=1)
    qdist = c2[None, :] - 2 * (qmat @ cmat.T)  # (nq, k) + const(q)
    probes = np.argsort(qdist, axis=1, kind="stable")[:, :nprobe]  # ties->low id
    # per-(query, probed cell) LUT over the query's residual IN THAT CELL
    far = 1 << 60
    luts = np.zeros((nq, nprobe, IVFPQ_M, pqmat.shape[1]), dtype=np.int64)
    for qi in range(nq):
        for pj in range(nprobe):
            qr = (qmat[qi] - cmat[probes[qi, pj]]).reshape(IVFPQ_M, IVFPQ_D)
            diff = qr[:, None, :] - pqmat  # (M, C, D)
            lut = (diff * diff).sum(axis=2)
            luts[qi, pj] = np.where(valid, lut, far)

    def score(batches):
        m_idx = np.arange(IVFPQ_M)
        for pdf in batches:
            if not len(pdf):
                continue
            x = _batch_mat(pdf)
            cells = _coarse_assign(x, cmat)
            r = (x - cmat[cells]).reshape(len(x), IVFPQ_M, IVFPQ_D)
            codes = _pq_encode(r, pqmat, valid)
            vec_ids = pdf["vec_id"].to_numpy()
            out_q, out_n, out_d = [], [], []
            for qi in range(nq):
                for pj in range(nprobe):
                    sel = cells == probes[qi, pj]
                    if not sel.any():
                        continue
                    adc = luts[qi, pj][m_idx[None, :], codes[sel]].sum(axis=1)
                    out_q.append(np.full(int(sel.sum()), qids[qi], dtype=np.int64))
                    out_n.append(vec_ids[sel])
                    out_d.append(adc)
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "adc_dist": np.concatenate(out_d),
                }
            )

    scored = emb.mapInPandas(
        score, "query_id bigint, neighbor_id bigint, adc_dist bigint"
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    ranked = (
        scored.where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
    )
    if rerank is not None and rerank > k:
        from .similarity import _sq_dist

        cand = ranked.where(F.col("rank") <= rerank).drop("rank", "adc_dist")
        qv = emb.select(
            F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
        ).where(F.col("query_id") < n_queries)
        nv = emb.select(
            F.col("vec_id").alias("neighbor_id"), F.col("q").alias("nq")
        )
        # O(nq * rerank) candidate rows resolve their vectors by id —
        # broadcast-sized here, plain shuffle-hash joins at scale
        w2 = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
        ranked = (
            cand.join(F.broadcast(qv), "query_id")
            .join(nv, "neighbor_id")
            .withColumn(
                "adc_dist", _sq_dist(F.col("qq"), F.col("nq"))
            )
            .drop("qq", "nq")
            .withColumn("rank", F.row_number().over(w2))
        )
    out = (
        ranked.where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "adc_dist")
        .orderBy("query_id", "rank")
        .localCheckpoint(eager=True)
    )
    emb.unpersist()
    return out


def _ivfpq_sql(
    n_queries: int = 10, k: int = 5, nprobe: int = IVFPQ_NPROBE
) -> str:
    """Unrolled DuckDB twin: coarse Lloyd -> residuals -> residual-PQ
    Lloyd -> encode -> probe -> LUT -> ADC, all exact-int CTEs.

    Gluing of the EMBEDDING_KMEANS_SQL and PQ_TOPK_SQL generator
    patterns; `iters` are unrolled the same way the Spark loops run.
    """
    full_dist = (
        "(list_dot_product(x.q::DOUBLE[], x.q::DOUBLE[]) "
        "- 2 * list_dot_product(x.q::DOUBLE[], c.c::DOUBLE[]) "
        "+ list_dot_product(c.c::DOUBLE[], c.c::DOUBLE[]))"
    )
    sub_dist = (
        "(list_dot_product(x.s::DOUBLE[], x.s::DOUBLE[]) "
        "- 2 * list_dot_product(x.s::DOUBLE[], c.c::DOUBLE[]) "
        "+ list_dot_product(c.c::DOUBLE[], c.c::DOUBLE[]))"
    )
    ctes = [
        """qv AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(round(x * 1000000) AS BIGINT)) AS q
  FROM embeddings
)""",
        f"cc0 AS (SELECT vec_id AS cid, q AS c FROM qv WHERE vec_id < {IVFPQ_CELLS})",
    ]
    prev = "cc0"
    for it in range(1, IVFPQ_COARSE_ITERS + 1):
        ctes.append(f"""ca{it} AS (
  SELECT vec_id, cid AS cluster, q FROM (
    SELECT x.vec_id, c.cid, x.q,
           ROW_NUMBER() OVER (PARTITION BY x.vec_id
                              ORDER BY {full_dist}, c.cid) AS rnk
    FROM qv x JOIN {prev} c ON true
  ) WHERE rnk = 1
)""")
        ctes.append(f"""cu{it} AS (
  SELECT cluster, i,
         CAST(floor(CAST(SUM(q[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS v
  FROM ca{it}, generate_series(1, {DIM}) t(i)
  GROUP BY cluster, i
)""")
        # re-densify surviving cluster ids in ascending order (matches
        # the Spark remap when a cell empties; no-op when none do)
        ctes.append(f"""cc{it} AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY cluster) - 1 AS BIGINT) AS cid,
         c
  FROM (SELECT cluster, list(v ORDER BY i) AS c
        FROM cu{it} GROUP BY cluster)
)""")
        prev = f"cc{it}"
    # final cell assignment for every vector, against the trained centers
    ctes.append(f"""cells AS (
  SELECT vec_id, cid AS cell, q FROM (
    SELECT x.vec_id, c.cid, x.q,
           ROW_NUMBER() OVER (PARTITION BY x.vec_id
                              ORDER BY {full_dist}, c.cid) AS rnk
    FROM qv x JOIN {prev} c ON true
  ) WHERE rnk = 1
)""")
    # residual subvectors
    ctes.append(f"""rsub AS (
  SELECT v.vec_id, v.cell, t.m AS m,
         list_transform(generate_series((t.m - 1) * {IVFPQ_D} + 1,
                                        t.m * {IVFPQ_D}),
                        i -> v.q[i] - c.c[i]) AS s
  FROM cells v
  JOIN {prev} c ON c.cid = v.cell,
       generate_series(1, {IVFPQ_M}) t(m)
)""")
    ctes.append(
        f"pb0 AS (SELECT m, vec_id AS code, s AS c FROM rsub "
        f"WHERE vec_id < {IVFPQ_CODES})"
    )
    pprev = "pb0"
    for it in range(1, IVFPQ_PQ_ITERS + 1):
        ctes.append(f"""pa{it} AS (
  SELECT vec_id, m, code, s FROM (
    SELECT x.vec_id, x.m, c.code, x.s,
           ROW_NUMBER() OVER (PARTITION BY x.vec_id, x.m
                              ORDER BY {sub_dist}, c.code) AS rnk
    FROM rsub x JOIN {pprev} c ON c.m = x.m
  ) WHERE rnk = 1
)""")
        ctes.append(f"""pu{it} AS (
  SELECT m, code, i,
         CAST(floor(CAST(SUM(s[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS v
  FROM pa{it}, generate_series(1, {IVFPQ_D}) t(i)
  GROUP BY m, code, i
)""")
        ctes.append(
            f"pb{it} AS (SELECT m, code, list(v ORDER BY i) AS c "
            f"FROM pu{it} GROUP BY m, code)"
        )
        pprev = f"pb{it}"
    # encode every vector's residual with the trained codebook
    ctes.append(f"""enc AS (
  SELECT vec_id, cell, m, code FROM (
    SELECT x.vec_id, x.cell, x.m, c.code,
           ROW_NUMBER() OVER (PARTITION BY x.vec_id, x.m
                              ORDER BY {sub_dist}, c.code) AS rnk
    FROM rsub x JOIN {pprev} c ON c.m = x.m
  ) WHERE rnk = 1
)""")
    # query probes: nprobe nearest trained centers per query
    ctes.append(f"""probes AS (
  SELECT vec_id AS query_id, cid AS cell, q FROM (
    SELECT x.vec_id, c.cid, x.q,
           ROW_NUMBER() OVER (PARTITION BY x.vec_id
                              ORDER BY {full_dist}, c.cid) AS rnk
    FROM qv x JOIN {prev} c ON true
    WHERE x.vec_id < {n_queries}
  ) WHERE rnk <= {nprobe}
)""")
    # per-(query, probed cell) LUT over the query's residual in that cell
    ctes.append(f"""qsub AS (
  SELECT p.query_id, p.cell, t.m AS m,
         list_transform(generate_series((t.m - 1) * {IVFPQ_D} + 1,
                                        t.m * {IVFPQ_D}),
                        i -> p.q[i] - c.c[i]) AS s
  FROM probes p
  JOIN {prev} c ON c.cid = p.cell,
       generate_series(1, {IVFPQ_M}) t(m)
)""")
    ctes.append(f"""lut AS (
  SELECT x.query_id, x.cell, x.m, c.code, CAST({sub_dist} AS BIGINT) AS dist
  FROM qsub x JOIN {pprev} c ON c.m = x.m
)""")
    # CAST: DuckDB SUM(BIGINT) -> HUGEINT -> float64 under the driver's
    # pandas canon; Spark stays BIGINT (the r4 lesson)
    ctes.append("""adc AS (
  SELECT l.query_id, e.vec_id AS neighbor_id,
         CAST(SUM(l.dist) AS BIGINT) AS adc_dist
  FROM enc e
  JOIN lut l ON l.cell = e.cell AND l.m = e.m AND l.code = e.code
  GROUP BY 1, 2
)""")
    ctes.append("""ranked AS (
  SELECT query_id, neighbor_id, adc_dist,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc_dist, neighbor_id) AS rank
  FROM adc WHERE query_id != neighbor_id
)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT query_id, rank, neighbor_id, adc_dist
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank"""
    )


IVFPQ_TOPK_SQL = _ivfpq_sql()
