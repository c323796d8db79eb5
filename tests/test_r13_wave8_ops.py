"""Round-13 wave-8 operators: Matryoshka prefix-dim recall ablation and
Local Outlier Factor over the RP-LSH k-NN graph.

Reference scope: extension tier (the reference DAG has no embedding
surface at all) — these are the serving-dim ablation and the noisy-
embedding screen a training-data pipeline runs over its vector corpus.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from airflow_iceberg_pipeline_stock_tracker_spark.operators.similarity import (  # noqa: E402
    KNN_K,
    MATRYOSHKA_DIMS,
    MATRYOSHKA_K,
    MATRYOSHKA_QUERIES,
    knn_graph_df,
    lof_from_edges,
    lof_scores,
    matryoshka_recall,
)
from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import load_table  # noqa: E402


# ---------------------------------------------------------------------------
# similarity_matryoshka_recall
# ---------------------------------------------------------------------------


def _brute_topk(vecs: dict, dim: int, qid: int, k: int) -> list:
    """Pure-Python exact top-k on the dim-prefix (ties by neighbor id)."""
    qv = vecs[qid][:dim]
    qn = math.sqrt(sum(x * x for x in qv))
    if qn == 0:
        return []
    scored = []
    for nid, v in vecs.items():
        if nid == qid:
            continue
        pv = v[:dim]
        pn = math.sqrt(sum(x * x for x in pv))
        if pn == 0:
            continue
        cos = sum(a * b for a, b in zip(qv, pv)) / (qn * pn)
        scored.append((-cos, nid))
    scored.sort()
    return [nid for _, nid in scored[:k]]


def test_matryoshka_matches_python_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = {
        r.vec_id: [float(x) for x in r.embedding] for r in emb.collect()
    }
    got = {
        (r.query_id, r.dim): r.hits
        for r in matryoshka_recall(emb).collect()
    }
    for qid in range(MATRYOSHKA_QUERIES):
        if qid not in vecs:
            continue
        full = set(_brute_topk(vecs, MATRYOSHKA_DIMS[-1], qid, MATRYOSHKA_K))
        for dim in MATRYOSHKA_DIMS:
            topk = _brute_topk(vecs, dim, qid, MATRYOSHKA_K)
            if not topk:
                assert (qid, dim) not in got
                continue
            assert got[(qid, dim)] == len(set(topk) & full), (qid, dim)


def test_matryoshka_full_dim_recall_is_one(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = matryoshka_recall(emb).collect()
    assert rows
    for r in rows:
        assert 0 <= r.hits <= MATRYOSHKA_K
        assert abs(r.recall - r.hits / MATRYOSHKA_K) < 1e-12
        if r.dim == MATRYOSHKA_DIMS[-1]:
            assert r.hits == MATRYOSHKA_K, r


def test_matryoshka_zero_prefix_dropped(spark):
    """A vector whose first 8 components are all zero must be excluded
    at dim=8 (no direction) but participate at the full dim."""
    dim = MATRYOSHKA_DIMS[-1]
    base = [
        (0, [1.0] * dim),
        (1, [0.0] * 8 + [1.0] * (dim - 8)),  # zero 8-prefix
        (2, [1.0] * dim),
        (3, [0.5] * dim),
    ]
    emb = spark.createDataFrame(
        [(i, v, 0) for i, v in base], "vec_id long, embedding array<float>, label int"
    )
    out = matryoshka_recall(emb, n_queries=1, k=2).collect()
    by_dim = {r.dim: r for r in out}
    # at dim 8 only vec 2 and 3 are candidates; at full dim vec 1 joins
    assert by_dim[8].hits <= 2
    assert by_dim[dim].hits == 2


# ---------------------------------------------------------------------------
# embedding_outlier_lof
# ---------------------------------------------------------------------------


def _python_lof(edges):
    """Replicate the LOF formula from the edge list, pure Python."""
    from collections import defaultdict

    dist = {}
    out_edges = defaultdict(list)
    for src, dst, cos in edges:
        d = max(0.0, 1.0 - cos)
        dist[(src, dst)] = d
        out_edges[src].append(dst)
    k_dist = {s: max(dist[(s, o)] for o in os_) for s, os_ in out_edges.items()}
    lrd = {}
    for s, os_ in out_edges.items():
        reach = [max(k_dist[o], dist[(s, o)]) for o in os_]
        avg = sum(reach) / len(reach)
        if avg > 0:
            lrd[s] = 1.0 / avg
    lof = {}
    for s in lrd:
        neigh = [lrd[o] for o in out_edges[s] if o in lrd]
        if neigh:
            lof[s] = (sum(neigh) / len(neigh)) * (1.0 / lrd[s])
    return k_dist, lrd, lof


def test_lof_matches_python_recompute(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    edges = [
        (r.src, r.dst, r.cosine) for r in knn_graph_df(emb, k=KNN_K).collect()
    ]
    k_dist, lrd, lof = _python_lof(edges)
    rows = lof_scores(emb, k=KNN_K).collect()
    assert rows
    got_ids = {r.vec_id for r in rows}
    # on the k-NN substrate every node has k out-edges, so every lrd
    # node keeps >= 1 scored neighbor and nothing is omitted
    assert got_ids == set(lrd) == set(lof)
    for r in rows:
        # lof is never NULL: a node whose neighbors all lack an lrd is
        # omitted by the inner join, not emitted (r13 advice)
        assert r.lof is not None
        assert abs(r.k_dist - k_dist[r.vec_id]) < 1e-9
        assert abs(1.0 / r.avg_reach - lrd[r.vec_id]) < 1e-6
        assert abs(r.lof - lof[r.vec_id]) < 1e-6


def test_lof_flags_planted_outlier(spark):
    """Handcrafted k-NN edges (k=2): nodes 0-3 form a tight clique
    (distance 0.01 edges), node 9 hangs off it at distance 0.5 — the
    textbook sparse point whose LOF must dwarf the clique's ~1.0."""
    tight, far = 1.0 - 0.01, 1.0 - 0.5
    raw = [
        (0, 1, tight), (0, 2, tight),
        (1, 0, tight), (1, 2, tight),
        (2, 0, tight), (2, 1, tight),
        (3, 0, tight), (3, 1, tight),
        (9, 0, far), (9, 1, far),
    ]
    edges = spark.createDataFrame(raw, "src long, dst long, cosine double")
    scored = {r.vec_id: r.lof for r in lof_from_edges(edges).collect()}
    assert all(v is not None for v in scored.values())  # never NULL
    assert scored[9] > 10 * max(
        v for k, v in scored.items() if k != 9
    ), scored
    # clique members sit at density parity with their neighbors
    for k, v in scored.items():
        if k in (0, 1, 2):
            assert 0.5 < v < 1.5, scored


def test_lof_asymmetric_edges(spark):
    """The documented asymmetric-edge-set contract (r13 advice): an edge
    whose dst has no outgoing edges contributes nothing to reach (its
    src's lrd averages fewer than k neighbors), and a node whose
    neighbors ALL lack out-edges is omitted entirely — never NULL."""
    tight = 1.0 - 0.1
    raw = [
        # 0 and 1 point at each other (both have out-edges)...
        (0, 1, tight), (1, 0, tight),
        # ...and both also point at 7, a pure sink (no out-edges)
        (0, 7, tight), (1, 7, tight),
        # 5 points ONLY at sinks -> all its neighbors lack an lrd
        (5, 7, tight), (5, 8, tight),
    ]
    edges = spark.createDataFrame(raw, "src long, dst long, cosine double")
    rows = {r.vec_id: r for r in lof_from_edges(edges).collect()}
    # 5 is omitted (all-sink neighborhood); the sinks 7/8 have no lrd
    assert set(rows) == {0, 1}
    # 0's reach set is {1} only — the (0,7) edge dropped by the kdist
    # inner join, so avg_reach averages ONE neighbor, not two
    assert abs(rows[0].avg_reach - 0.1) < 1e-12
    assert abs(rows[0].lof - 1.0) < 1e-12  # symmetric pair: parity
