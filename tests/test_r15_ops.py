"""r15 operators: quantized-GD classifier training (Gram-factored) and
BPE corpus encoding under the trained merge table.

Each op gets the house differential treatment: a pure-Python reference
recompute (same integer op order, same truncating division) plus
receipts that the op does what its contract claims (the classifier
LEARNS — accuracy above majority class; the encoder reproduces the
reference tokenization exactly).
"""

from __future__ import annotations

import os
import re
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_iceberg_pipeline_stock_tracker_spark.operators import text as text_ops  # noqa: E402
from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import (  # noqa: E402
    load_table,
)


# ---------------------------------------------------------------------------
# text_classifier_train
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def trained(spark, sf_dir):
    return {
        r.doc_id: (r.y, r.score_nano, r.pred, r.correct)
        for r in text_ops.classifier_train(
            load_table(spark, sf_dir, "documents")
        ).collect()
    }


def test_classifier_train_matches_python_recompute(spark, sf_dir, trained):
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    want = text_ops.classifier_train_reference(docs)
    assert trained == want


def test_classifier_train_actually_learns(trained):
    """The whole point of the training half: final train accuracy must
    beat the majority class (the label is a genuine function of the
    text — count('data') > count('table') — so a linear model over
    hashed bag-of-words can and must learn it; measured 0.842 at the
    500-doc fixture vs 0.606 majority, float ceiling 0.924)."""
    n = len(trained)
    acc = sum(c for _, _, _, c in trained.values()) / n
    pos = sum(y for y, _, _, _ in trained.values()) / n
    majority = max(pos, 1 - pos)
    assert acc > majority + 0.1
    assert acc >= 0.75


def test_classifier_train_learns_the_planted_direction(spark, sf_dir):
    """Interpretability pin: the label compares count('data') with
    count('table'), so the trained weight of 'data''s hash bucket must
    exceed 'table''s. Recover the weights from two synthetic one-token
    docs scored by the same final weights? Simpler: recompute the
    reference weights directly."""
    import hashlib

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    # reference exposes only scores; recompute weights via its internals
    ref = text_ops.classifier_train_reference
    out = ref(docs)
    assert out  # non-vacuous fixture
    # re-run the reference's training loop to get w (duplicated on
    # purpose: an independent transcription of the spec would hide a
    # shared bug; this asserts only the DIRECTION, which the spec's
    # construction guarantees once accuracy is high)
    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def tdiv(a, d):
        q = abs(a) // d
        return q if a >= 0 else -q

    feats, ys = {}, {}
    for doc_id, t in docs.items():
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
        feats[doc_id] = {
            b: (1000 * c) // len(toks) for b, c in cnt.items()
        }
        ys[doc_id] = (
            1000
            if toks.count(text_ops.CLF_TRAIN_POS)
            > toks.count(text_ops.CLF_TRAIN_NEG)
            else -1000
        )
    w = {b: 0 for xt in feats.values() for b in xt}
    for _ in range(text_ops.CLF_TRAIN_ITERS):
        grad = {b: 0 for b in w}
        for d, xt in feats.items():
            score = sum(w[b] * x for b, x in xt.items())
            resid = score - 10**6 * ys[d]
            for b, x in xt.items():
                grad[b] += resid * x
        for b in w:
            w[b] -= tdiv(
                tdiv(grad[b], len(feats)) * text_ops.CLF_TRAIN_LR, 10**6
            )
    b_pos = h32(text_ops.CLF_TRAIN_POS) % text_ops.CLF_TRAIN_BUCKETS
    b_neg = h32(text_ops.CLF_TRAIN_NEG) % text_ops.CLF_TRAIN_BUCKETS
    assert w[b_pos] > 0 > w[b_neg]


# ---------------------------------------------------------------------------
# text_bpe_encode
# ---------------------------------------------------------------------------


def test_bpe_encode_matches_python_recompute(spark, sf_dir):
    from airflow_iceberg_pipeline_stock_tracker_spark.operators import bpe

    docs_df = load_table(spark, sf_dir, "documents")
    got = sorted(
        (r.doc_id, r.widx, r.sidx, r.token_id, r.token)
        for r in bpe.bpe_encode(docs_df).collect()
    )
    texts = {
        r.doc_id: r.text
        for r in docs_df.select("doc_id", "text").collect()
    }
    want = bpe.bpe_encode_reference(texts)
    assert got == want


def test_bpe_encode_reference_matches_engine_on_whitespace_edges(
    spark, tmp_path
):
    """r15 code-review finding: the engines split trim(lower(text)) on
    ASCII \\s+ where trim strips SPACES only — a leading tab keeps an
    empty token at widx 0 and NBSP does not split. The Python reference
    must mirror that, not .strip().split(). Pin engine == reference on
    a corpus built from exactly those edges."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators import bpe

    texts = {
        1: "\tab cd",        # leading tab: widx 0 is an empty token
        2: "  ab\ncd  ",     # space-trimmed, newline splits
        3: "ab\xa0cd ef",  # NBSP must NOT split (one word 'ab\xa0cd')
        4: "ab  cd",         # run of separators = one split
        # VERTICAL TAB splits in the ENGINE (Java \s) and the Python
        # reference (re.ASCII \s) — pinned here. DuckDB's RE2 \s does
        # NOT include \x0B; that divergence is documented at
        # functions/texthash.py::tokens (no fixture contains \x0B, so
        # the oracle gate never sees it — r15 advice, option A)
        5: "ab\x0bcd ef",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id bigint, text string"
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = sorted(
        (r.doc_id, r.widx, r.sidx, r.token_id, r.token)
        for r in bpe.bpe_encode(
            load_table(spark, str(tmp_path), "documents")
        ).collect()
    )
    want = bpe.bpe_encode_reference(texts)
    assert got == want
    # the tab doc's first real word sits at widx 1, and the NBSP doc
    # kept 'ab\xa0cd' as ONE word
    assert min(w for d, w, *_ in got if d == 1) == 1
    nbsp_words = {w for d, w, *_ in got if d == 3}
    assert nbsp_words == {0, 1}
    # \x0B DID split in both engine and reference: three words
    assert {w for d, w, *_ in got if d == 5} == {0, 1, 2}


def test_bpe_encode_consistent_with_tokenize_counts(spark, sf_dir):
    """Cross-op pin: the per-doc row count of the encoded stream must
    equal bpe_tokenize's n_tokens (same trained merge table), and the
    stream must show real compression (merged multi-char symbols)."""
    from collections import Counter

    from airflow_iceberg_pipeline_stock_tracker_spark.operators import bpe

    docs_df = load_table(spark, sf_dir, "documents")
    enc = bpe.bpe_encode(docs_df).collect()
    per_doc = Counter(r.doc_id for r in enc)
    want = {
        r.doc_id: r.n_tokens for r in bpe.bpe_tokenize(docs_df).collect()
    }
    assert dict(per_doc) == want
    # merges actually applied: some emitted tokens are multi-char
    # non-marker symbols, and ids are a dense 0..|vocab|-1 range
    toks = {(r.token_id, r.token) for r in enc}
    assert any(
        len(t) > 1 and t != bpe.END_MARK and not t.endswith(bpe.END_MARK)
        for _, t in toks
    ) or any(len(t) > len(bpe.END_MARK) for _, t in toks)
    ids = sorted(i for i, _ in toks)
    assert ids == list(range(len(ids)))
