"""r16 operators: the retrieval capstone (chunk -> embed -> IVFPQ ->
query -> recall@k certificate).

The differential ground truth is a pure-Python/numpy recompute of the
ENTIRE pipeline — independent loops, not the engine's einsum helpers —
so a transcription bug in either side surfaces as a mismatch.
"""

from __future__ import annotations

import hashlib
import os
import re
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_iceberg_pipeline_stock_tracker_spark.operators import (  # noqa: E402
    retrieval,
)
from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import (  # noqa: E402
    load_table,
)

TOKEN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _chunk_vecs_reference(doc_texts: dict[int, str]):
    """vec_id -> int64 ndarray, the hash-projection chunk embeddings."""
    sid = retrieval.RAG_SID
    size, stride = retrieval.RAG_CHUNK_SIZE, retrieval.RAG_CHUNK_STRIDE
    dim = retrieval.RAG_DIM
    a, b, c = retrieval.RAG_A, retrieval.RAG_B, retrieval.RAG_C
    p, span = 4_294_967_311, retrieval.RAG_SPAN
    vecs: dict[int, np.ndarray] = {}
    for doc_id, t in doc_texts.items():
        if t is None:
            continue
        toks = re.findall(TOKEN, t, flags=re.ASCII)
        n = len(toks)
        n_chunks = 1 if n <= size else 1 + (n - size + stride - 1) // stride
        for i in range(n_chunks):
            chunk = toks[i * stride : i * stride + size]
            if not chunk:
                continue
            v = np.zeros(dim, dtype=np.int64)
            for tok in chunk:
                h = _h32(tok)
                for j in range(dim):
                    v[j] += ((h * a + b + j * c) % p) % span - span // 2
            vecs[doc_id * sid + i] = v
    return vecs


def rag_recall_reference(
    doc_texts: dict[int, str],
    k: int = retrieval.RAG_K,
    nprobe: int = retrieval.RAG_NPROBE,
    rerank: int = retrieval.RAG_RERANK,
):
    """[(query_id, n_candidates, hits_adc, hits_rerank, recall_milli)]
    sorted by query_id — the full pipeline in plain loops."""
    sid = retrieval.RAG_SID
    M, D = 8, 8
    vecs = _chunk_vecs_reference(doc_texts)
    ids = sorted(vecs)
    X = np.array([vecs[i] for i in ids], dtype=np.int64)
    idarr = np.array(ids, dtype=np.int64)

    def assign(mat, cents):
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1)  # ties -> lowest index

    # coarse: first-chunk seeds of docs 0..CELLS-1, one Lloyd round
    seeds = [i for i in ids if i % sid == 0 and i < retrieval.RAG_CELLS * sid]
    cmat = np.array([vecs[i] for i in seeds], dtype=np.int64)
    for _ in range(1):
        asg = assign(X, cmat)
        cmat = np.array(
            [
                np.floor(
                    X[asg == cnum].sum(axis=0) / (asg == cnum).sum()
                ).astype(np.int64)
                for cnum in sorted(set(asg.tolist()))
            ]
        )
    cell = assign(X, cmat)

    # residual PQ: first-chunk seeds of docs 0..CODES-1, one round
    res = X - cmat[cell]
    pseeds = [i for i in ids if i % sid == 0 and i < retrieval.RAG_CODES * sid]
    pseed_pos = [ids.index(i) for i in pseeds]
    pq = res[pseed_pos].reshape(len(pseeds), M, D).transpose(1, 0, 2).copy()
    valid = np.ones((M, pq.shape[1]), dtype=bool)
    far = 1 << 60

    def encode(rblock, pqmat, vd):
        codes = np.zeros((len(rblock), M), dtype=np.int64)
        for m in range(M):
            d = ((rblock[:, m, None, :] - pqmat[m][None, :, :]) ** 2).sum(
                axis=2
            )
            d = np.where(vd[m][None, :], d, far)
            codes[:, m] = d.argmin(axis=1)
        return codes

    rs = res.reshape(len(ids), M, D)
    for _ in range(1):
        cd = encode(rs, pq, valid)
        new = np.zeros_like(pq)
        nv = np.zeros_like(valid)
        for m in range(M):
            for code in range(pq.shape[1]):
                sel = rs[cd[:, m] == code, m, :]
                if len(sel):
                    new[m, code] = np.floor(sel.sum(axis=0) / len(sel)).astype(
                        np.int64
                    )
                    nv[m, code] = True
        pq, valid = new, nv
    codes = encode(rs, pq, valid)

    qsel = [
        i
        for i in ids
        if i % sid == 1 and i < retrieval.RAG_QUERY_DOCS * sid
    ]
    out = []
    for qid in qsel:
        qv = vecs[qid]
        cd = ((cmat - qv[None, :]) ** 2).sum(axis=1)
        probe = np.argsort(cd, kind="stable")[:nprobe]
        luts = {}
        for pc in probe:
            qr = (qv - cmat[pc]).reshape(M, D)
            lut = ((qr[:, None, :] - pq) ** 2).sum(axis=2)
            luts[int(pc)] = np.where(valid, lut, far)
        cands = []
        for pos, vid in enumerate(idarr):
            if vid // sid == qid // sid or cell[pos] not in luts:
                continue
            adc = sum(
                int(luts[int(cell[pos])][m, codes[pos, m]]) for m in range(M)
            )
            cands.append((int(vid), adc))
        n_candidates = len(cands)
        adc_rank = sorted(cands, key=lambda t: (t[1], t[0]))
        adc_topk = {v for v, _ in adc_rank[:k]}
        pool = [v for v, _ in adc_rank[:rerank]]
        rer_rank = sorted(
            pool, key=lambda v: (int(((vecs[v] - qv) ** 2).sum()), v)
        )
        rer_topk = set(rer_rank[:k])
        ex = sorted(
            (
                (int(((vecs[v] - qv) ** 2).sum()), v)
                for v in ids
                if v // sid != qid // sid
            )
        )
        ex_topk = {v for _, v in ex[:k]}
        hits_adc = len(adc_topk & ex_topk)
        hits_rer = len(rer_topk & ex_topk)
        out.append(
            (qid, n_candidates, hits_adc, hits_rer, hits_rer * 1000 // k)
        )
    return sorted(out)


@pytest.fixture(scope="module")
def rag_rows(spark, sf_dir):
    return [
        tuple(r) for r in retrieval.rag_recall(spark, sf_dir).collect()
    ]


def test_rag_recall_matches_python_recompute(spark, sf_dir, rag_rows):
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    assert rag_rows == rag_recall_reference(texts)


def test_rag_recall_certificate_nonvacuous(rag_rows):
    """The certificate must measure something real: a populated query
    panel, IVF actually pruning (candidates < corpus for some query),
    and recall neither all-zero nor trivially perfect for ADC."""
    assert len(rag_rows) >= 10
    assert any(r[2] < r[3] for r in rag_rows)  # rerank lifted some query
    assert any(0 < r[4] < 1000 for r in rag_rows)
    assert sum(r[3] for r in rag_rows) > 0


def test_rag_rerank_never_hurts_measured_recall(rag_rows):
    """Two-stage retrieval re-orders the ADC pool by the EXACT metric,
    so per-query reranked hits must be >= ADC hits whenever the exact
    top-k is reachable inside the pool — and in aggregate the pool
    (rerank=40 >> k=10) makes strict improvement the expected outcome."""
    assert sum(r[3] for r in rag_rows) >= sum(r[2] for r in rag_rows)


def test_chunk_key_bound_and_uniqueness(spark, sf_dir):
    """vec_id = doc_id * RAG_SID + chunk_idx requires chunks/doc <
    RAG_SID; pin the fixture headroom and key uniqueness."""
    emb = retrieval.chunk_vectors(load_table(spark, sf_dir, "documents"))
    rows = emb.select("vec_id").collect()
    ids = [r.vec_id for r in rows]
    assert len(ids) == len(set(ids))
    assert max(i % retrieval.RAG_SID for i in ids) < retrieval.RAG_SID // 4


def test_chunk_vectors_match_reference(spark, sf_dir):
    """The embedding relation itself (not just the end-to-end summary)
    matches the plain-Python recompute — localizes a failure to the
    chunk/embed stage vs the index/query stages."""
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    want = _chunk_vecs_reference(texts)
    got = {
        r.vec_id: np.array(r.q, dtype=np.int64)
        for r in retrieval.chunk_vectors(
            load_table(spark, sf_dir, "documents")
        ).collect()
    }
    assert set(got) == set(want)
    assert all((got[i] == want[i]).all() for i in got)


# ---------------------------------------------------------------------------
# text_classifier_holdout
# ---------------------------------------------------------------------------


def test_classifier_holdout_matches_fold_restricted_reference(spark, sf_dir):
    """Differential recompute of the COMPOSITION: take the engine's
    leakage-safe fold assignment (its own oracle-paired row proves the
    split), re-train the classifier in plain Python on the train-fold
    texts only (the classifier_train_reference loop, engine-exact
    ASCII-whitespace tokenization), score every doc with the trained
    weights, and re-derive the per-fold accuracy table."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators import (
        curation,
        dedup,
        text as text_ops,
    )

    docs_df = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs_df)
    fold = {
        r.doc_id: r.split
        for r in curation.leakage_safe_split(docs_df, pairs).collect()
    }
    texts = {
        r.doc_id: r.text
        for r in docs_df.select("doc_id", "text").collect()
    }

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def tdiv(a, d):
        q = abs(a) // d
        return q if a >= 0 else -q

    feats, ys = {}, {}
    for doc_id, t in texts.items():
        toks = [
            x
            for x in re.split(r"\s+", (t or "").strip(" "), flags=re.ASCII)
            if x
        ]
        if not toks:
            continue
        cnt = {}
        for tk in toks:
            b = h32(tk) % text_ops.CLF_TRAIN_BUCKETS
            cnt[b] = cnt.get(b, 0) + 1
        feats[doc_id] = {b: (1000 * c) // len(toks) for b, c in cnt.items()}
        ys[doc_id] = (
            1000
            if toks.count(text_ops.CLF_TRAIN_POS)
            > toks.count(text_ops.CLF_TRAIN_NEG)
            else -1000
        )
    train_ids = [d for d in feats if fold[d] == "train"]
    w = {b: 0 for d in train_ids for b in feats[d]}
    for _ in range(text_ops.CLF_TRAIN_ITERS):
        grad = {b: 0 for b in w}
        for d in train_ids:
            xt = feats[d]
            score = sum(w.get(b, 0) * x for b, x in xt.items())
            resid = score - 10**6 * ys[d]
            for b, x in xt.items():
                grad[b] += resid * x
        for b in w:
            w[b] -= tdiv(
                tdiv(grad[b], len(train_ids)) * text_ops.CLF_TRAIN_LR, 10**6
            )
    tally = {}
    for d, xt in feats.items():
        score = sum(w.get(b, 0) * x for b, x in xt.items())
        ok = 1 if (score > 0) == (ys[d] > 0) else 0
        n, c = tally.get(fold[d], (0, 0))
        tally[fold[d]] = (n + 1, c + ok)
    want = sorted(
        (s, n, c, c * 1000 // n) for s, (n, c) in tally.items()
    )
    got = [
        tuple(r)
        for r in text_ops.classifier_holdout(docs_df, pairs).collect()
    ]
    assert got == want


def test_classifier_holdout_is_nonvacuous_and_leakage_safe(spark, sf_dir):
    """All three folds populated, holdout accuracy beats the majority
    class (the classifier genuinely generalizes), and fold counts cover
    exactly the docs classifier_train scores (same feature universe)."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators import (
        dedup,
        text as text_ops,
    )

    docs_df = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs_df)
    rows = {
        r.split: r
        for r in text_ops.classifier_holdout(docs_df, pairs).collect()
    }
    assert set(rows) == {"train", "val", "test"}
    trained = text_ops.classifier_train(docs_df).collect()
    assert sum(r.n_docs for r in rows.values()) == len(trained)
    pos = sum(r.y for r in trained) / len(trained)
    majority = max(pos, 1 - pos) * 1000
    for s in ("val", "test"):
        assert rows[s].acc_milli > majority


# ---------------------------------------------------------------------------
# text_bpe_encode_artifact
# ---------------------------------------------------------------------------


def test_bpe_artifact_roundtrip_matches_direct_encode(spark, sf_dir, tmp_path):
    """The ask's core contract: write merges+vocab, read them back,
    encode under the pinned vocabulary — bit-identical to the
    retrain-in-query bpe_encode stream, and the artifact really lives
    on disk (a fresh read, not the in-session training state)."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "tok_v1")
    bpe.bpe_write_artifact(docs, path)
    assert os.path.isdir(path + "/merges") and os.path.isdir(path + "/vocab")
    got = sorted(
        (r.doc_id, r.widx, r.sidx, r.token_id, r.token)
        for r in bpe.bpe_encode_pinned(docs, path).collect()
    )
    want = sorted(
        (r.doc_id, r.widx, r.sidx, r.token_id, r.token)
        for r in bpe.bpe_encode(docs).collect()
    )
    assert got == want
    # the artifact is a REAL tokenizer table: n_merges merge rows in
    # training order, dense lexicographic vocab ids
    merges = spark.read.parquet(path + "/merges").collect()
    assert sorted(r.merge_rank for r in merges) == list(
        range(1, len(merges) + 1)
    )
    vocab = spark.read.parquet(path + "/vocab").collect()
    ids = sorted(r.token_id for r in vocab)
    assert ids == list(range(len(vocab)))
    toks = sorted(r.token for r in vocab)
    assert [r.token for r in sorted(vocab, key=lambda r: r.token_id)] == toks


def test_bpe_pinned_encode_streams_micro_batches(spark, sf_dir, tmp_path):
    """The foreachBatch variant (r15 ask #4): encode each micro-batch
    under the FIXED persisted vocabulary — batches never retrain — and
    the drained union must equal the whole-corpus batch encode. Three
    parquet files + maxFilesPerTrigger=1 forces >= 3 separate batches
    (the established file-source harness)."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "tok_v1")
    bpe.bpe_write_artifact(docs, path)

    src = str(tmp_path / "doc_stream")
    for lo, hi in ((0, 150), (150, 320), (320, 10**9)):
        (
            docs.where(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    out_dir = str(tmp_path / "enc_out")

    def encode_batch(batch, batch_id):
        bpe.bpe_encode_pinned(batch, path).write.mode("append").parquet(
            out_dir
        )

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(encode_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.doc_id, r.widx, r.sidx, r.token_id, r.token)
        for r in spark.read.parquet(out_dir).collect()
    )
    want = sorted(
        (r.doc_id, r.widx, r.sidx, r.token_id, r.token)
        for r in bpe.bpe_encode(docs).collect()
    )
    assert got == want


# ---------------------------------------------------------------------------
# retrieval_index_artifact
# ---------------------------------------------------------------------------


def test_index_artifact_roundtrip_matches_in_process(
    spark, sf_dir, tmp_path, rag_rows
):
    """Write the index artifact, answer the panel from the artifact
    alone, and match the in-process rag_recall certificate row for row
    — plus pin that the artifact is four real parquet tables with the
    documented shapes."""
    path = str(tmp_path / "idx_v1")
    retrieval.rag_write_index(spark, sf_dir, path)
    for t in ("vectors", "centroids", "codebooks", "codes"):
        assert os.path.isdir(f"{path}/{t}")
    got = [
        tuple(r) for r in retrieval.rag_query_index(spark, path).collect()
    ]
    assert got == rag_rows
    cents = spark.read.parquet(f"{path}/centroids").collect()
    assert len(cents) <= retrieval.RAG_CELLS
    assert all(len(r.c) == retrieval.RAG_DIM for r in cents)
    codes = spark.read.parquet(f"{path}/codes")
    n_vecs = spark.read.parquet(f"{path}/vectors").count()
    assert codes.count() == n_vecs * 8  # one row per (vector, subspace)


def test_index_artifact_serving_plan_is_pure_jvm(spark, sf_dir, tmp_path):
    """The serving query's claim: with the index persisted, the query
    plan contains NO Python evaluation and no cartesian product — the
    only corpus-scale relation (codes) arrives through an equi-join.
    (The in-process builder row legitimately uses the Arrow-batched
    encode pass; this pins that the SERVING path does not.)"""
    path = str(tmp_path / "idx_v1")
    retrieval.rag_write_index(spark, sf_dir, path)
    plan = (
        retrieval.rag_query_index(spark, path)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("ArrowEvalPython", "BatchEvalPython", "FlatMapsInPandas",
                "MapInPandas", "PythonUDF", "CartesianProduct"):
        assert bad not in plan, bad


def test_rag_recall_candidate_less_query_reports_zero_row(spark, tmp_path):
    """r16 review finding: a panel query whose probed cells hold no
    cross-document candidate must report (0, 0, 0, 0) — the
    worst-recall query is exactly the one a silent omission would
    hide. Single-doc corpus: doc 0 has two chunks, so its chunk-1
    query exists but every candidate is same-doc-excluded. Engine,
    SQL oracle, and the Python reference must all emit the zero row."""
    import duckdb

    text = " ".join(f"tok{i}" for i in range(60))  # 60 tokens, 2 chunks
    docs = spark.createDataFrame([(0, text)], "doc_id bigint, text string")
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = [
        tuple(r)
        for r in retrieval.rag_recall(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 0, 0, 0, 0)]
    assert rag_recall_reference({0: text}) == got
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"parquet_scan('{tmp_path}/documents.parquet/*.parquet')"
    )
    assert [
        tuple(r) for r in con.execute(retrieval.RAG_RECALL_SQL).fetchall()
    ] == got
