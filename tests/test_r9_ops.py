"""Unit tests for the round-9 operators: RSI, market basket, sequence
pattern match, containment dedup, SQ8 ANN, Gopher rules, TF-IDF
keywords. Each pins the semantic contract on a small adversarial
fixture (the oracle-differential gate checks engine parity; these check
the MATH is the intended math)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from airflow_iceberg_pipeline_stock_tracker_spark.operators import (
    dedup,
    similarity,
    text,
)
from airflow_iceberg_pipeline_stock_tracker_spark.operators.finance import rsi


def _prices(spark, closes, ticker="T"):
    base = dt.date(2024, 1, 1)
    return spark.createDataFrame(
        [
            (ticker, base + dt.timedelta(days=i), c / 100.0, 100.0)
            for i, c in enumerate(closes)
        ],
        "ticker string, date date, close double, volume double",
    )


def test_rsi_all_gains_is_100_all_losses_is_0(spark):
    up = rsi(_prices(spark, [100, 110, 120, 130])).collect()
    assert up[0].rsi is None  # first row: no previous close
    assert all(r.rsi == 100.0 for r in up[1:])
    down = rsi(_prices(spark, [130, 120, 110, 100])).collect()
    assert all(r.rsi == 0.0 for r in down[1:])


def test_rsi_mixed_and_flat_windows(spark):
    # +10, -5 within the window: RSI = 100*10/(10+5)
    rows = rsi(_prices(spark, [100, 110, 105])).collect()
    assert rows[2].rsi == pytest.approx(100.0 * 1000 / (1000 + 500))
    # a perfectly flat series never moves: no gains, no losses -> NULL
    flat = rsi(_prices(spark, [100, 100, 100])).collect()
    assert all(r.rsi is None for r in flat)
    assert all(r.gain_sum_c == 0 and r.loss_sum_c == 0 for r in flat)


def test_market_basket_counts_pairs_once_per_order(spark, sf_dir):
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.relational_ext import (
        orders_market_basket,
    )

    out = orders_market_basket(spark, sf_dir).collect()
    assert len(out) <= 20
    assert all(r.part_a < r.part_b for r in out)
    assert all(r.support >= 1 for r in out)
    # descending support, deterministic tie-break
    keys = [(-r.support, r.part_a, r.part_b) for r in out]
    assert keys == sorted(keys)


def test_pattern_match_counts_runs_and_conversions(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: view,click,purchase,view  -> one vcp run, converted
    for i, t in enumerate(["view", "click", "purchase", "view"]):
        rows.append((i, base + dt.timedelta(seconds=i), 1, t, 0.0, "{}"))
    # user 2: error x4 -> ONE maximal burst (greedy ee+), no conversion
    for i, t in enumerate(["error"] * 4):
        rows.append((10 + i, base + dt.timedelta(seconds=i), 2, t, 0.0, "{}"))
    # user 3: view,click,view -> no vcp
    for i, t in enumerate(["view", "click", "view"]):
        rows.append((20 + i, base + dt.timedelta(seconds=i), 3, t, 0.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    src = str(tmp_path / "events.parquet")
    ev.write.parquet(src)
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        events_pattern_match,
    )

    got = {
        r.user_id: r
        for r in events_pattern_match(spark, str(tmp_path)).collect()
    }
    assert got[1].n_view_click_purchase == 1 and got[1].converted
    assert got[2].n_error_bursts == 1 and not got[2].converted
    assert got[3].n_view_click_purchase == 0 and not got[3].converted


def test_containment_flags_subset_document(spark):
    # doc 2 is a strict prefix of doc 1: containment(2 in 1) = 1.0 even
    # though Jaccard is well below the near-dup bar
    long_words = " ".join(f"w{i}" for i in range(40))
    short_words = " ".join(f"w{i}" for i in range(12))
    other = " ".join(f"z{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, long_words), (2, short_words), (3, other)],
        ["doc_id", "text"],
    )
    out = dedup.containment_pairs(docs, threshold=0.8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.containment_b_in_a == pytest.approx(1.0)
    assert r.relation == "b_in_a"
    # sanity: plain jaccard would NOT pair them at 0.5
    jac = dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert not [x for x in jac if {x.doc_a, x.doc_b} == {1, 2}]


def test_sq_topk_codes_recall_vs_exact(spark, sf_dir):
    exact = similarity.cosine_topk(spark, sf_dir).collect()
    sq = similarity.sq_topk(spark, sf_dir).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    sq_sets = {}
    for r in sq:
        sq_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(sq_sets) == set(exact_sets)
    # the reranked pool must recover most exact neighbors (8-bit codes
    # over a global range are a faithful ordering at this dim)
    hits = sum(len(sq_sets[q] & exact_sets[q]) for q in exact_sets)
    total = sum(len(v) for v in exact_sets.values())
    assert hits / total >= 0.6, f"SQ recall {hits}/{total}"
    # int scores are exact ints and descending within each query's rank
    by_q = {}
    for r in sorted(sq, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r.cosine)
    for q, cs in by_q.items():
        assert cs == sorted(cs, reverse=True)


def test_sq_topk_degenerate_corpus_is_defined(spark):
    # constant corpus: every unit vector identical -> every code +-127,
    # all pairs tie, deterministic neighbor_id tie-break, no crash
    emb = spark.createDataFrame(
        [(i, [1.0, 1.0, 1.0]) for i in range(6)],
        "vec_id bigint, embedding array<double>",
    )
    out = similarity.sq_topk_df(emb, n_queries=2, k=2).collect()
    assert len(out) == 4  # 2 queries x k=2, no DIVIDE_BY_ZERO anywhere
    assert len({r.int_score for r in out}) == 1  # identical codes tie
    assert all(r.cosine == pytest.approx(1.0) for r in out)
    # zero vectors are dropped by the module-wide with_norm contract
    # BEFORE the normalize, so they can't 0/0 the unit projection
    with_zero = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 2.0]), (2, [2.0, 4.0]), (3, [1.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    out2 = similarity.sq_topk_df(with_zero, n_queries=4, k=2).collect()
    assert 0 not in {r.query_id for r in out2} | {r.neighbor_id for r in out2}


def test_gopher_rules_thresholds(spark):
    good = " ".join(["the quick brown fox jumps over that lazy dog now"] * 6)  # 60 toks, 3 stopword kinds
    short = "tiny doc with the and that"
    symbols = " ".join(["the of and that have with ####### ..."] * 8)
    docs = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols)], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in text.gopher_rules(docs).collect()}
    assert got[1].pass_gopher
    assert not got[2].rule_n_tokens and not got[2].pass_gopher
    assert not got[3].rule_symbols and not got[3].pass_gopher
    assert got[2].rule_stops  # the/and/that = 3 distinct stopword hits


def test_tfidf_keywords_prefers_rare_terms(spark):
    docs = spark.createDataFrame(
        [
            (1, "common common common zebra zebra unicorn"),
            (2, "common plain words here"),
            (3, "common plain words there"),
        ],
        ["doc_id", "text"],
    )
    got = text.tfidf_keywords(docs, k=2).collect()
    doc1 = [r.term for r in got if r.doc_id == 1]
    # 'zebra' (tf=2 but df=1) must outrank 'common' (tf=3, df=3): IDF
    # beats raw frequency — the whole point of the weighting
    assert doc1 == ["zebra", "common"]
    for r in got:
        assert r.rank in (1, 2)


def test_ahash_identical_images_are_near_dups(spark):
    from airflow_iceberg_pipeline_stock_tracker_spark.operators import multimodal

    # two identical rasters + one inverted -> ids 1,2 pair up (hamming
    # 0), id 3 (bitwise complement pattern) does not
    w, h = 8, 6
    grad = bytes(
        (r * 40 + c * 10) % 200 for r in range(h) for c in range(w) for _ in range(3)
    )
    inv = bytes(255 - b for b in grad)
    rows = [
        (1, "image", multimodal.encode_ppm(w, h, grad)),
        (2, "image", multimodal.encode_ppm(w, h, grad)),
        (3, "image", multimodal.encode_ppm(w, h, inv)),
    ]
    media = spark.createDataFrame(rows, "media_id bigint, kind string, payload binary")
    hashes = multimodal.ppm_ahash(media)
    got = {r.media_id: r for r in multimodal.ahash_near_dups(hashes).collect()}
    assert got[1].ahash == got[2].ahash
    assert got[1].n_near_dups == 1 and got[2].n_near_dups == 1
    assert got[3].n_near_dups == 0
    # the inverted raster flips every mean-threshold bit
    n_bits = w * h
    assert got[1].ahash ^ got[3].ahash == (1 << n_bits) - 1


def test_basket_rules_math_is_exact(spark, sf_dir):
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.relational_ext import (
        orders_basket_rules,
    )
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import (
        load_table,
    )

    out = orders_basket_rules(spark, sf_dir).collect()
    assert 0 < len(out) <= 20
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_baskets = li.select("l_orderkey").distinct().count()
    for r in out:
        assert r.conf_a_to_b == pytest.approx(r.support / r.support_a)
        assert r.conf_b_to_a == pytest.approx(r.support / r.support_b)
        assert r.lift == pytest.approx(
            r.support * n_baskets / (r.support_a * r.support_b)
        )
        assert 0 < r.conf_a_to_b <= 1 and 0 < r.conf_b_to_a <= 1
