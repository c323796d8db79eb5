"""Semantics tests for the corpus-curation operators (crafted fixtures;
the driver's oracle gate covers the full documents table)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from airflow_iceberg_pipeline_stock_tracker_spark.operators import curation, text


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_contamination_detects_shared_grams(spark):
    # doc 0 (0 % 20 == 0) is the benchmark; doc 1 shares the 3-gram
    # "alpha beta gamma"; doc 2 is disjoint
    df = _docs(
        spark,
        [
            (0, "alpha beta gamma delta", "en", "s"),
            (1, "alpha beta gamma something else entirely", "en", "s"),
            (2, "completely different words here now", "en", "s"),
        ],
    )
    got = {r.doc_id: r for r in curation.contamination(df).collect()}
    assert set(got) == {1, 2}  # train docs only
    # doc 1: 4 grams, shares exactly "alpha beta gamma" + "beta gamma delta"?
    # bench grams: "alpha beta gamma", "beta gamma delta" — doc 1 grams:
    # "alpha beta gamma", "beta gamma something", ... -> 1 shared
    assert got[1].n_shared_grams == 1
    assert got[1].n_bench_docs == 1
    assert got[1].contaminated == 1
    assert got[2].n_shared_grams == 0
    assert got[2].contaminated == 0


def test_leakage_safe_split_co_travel(spark):
    docs = _docs(
        spark,
        [(i, f"doc number {i}", "en", "s") for i in range(1, 6)],
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    out = curation.leakage_safe_split(docs, pairs).collect()
    by_id = {r.doc_id: r for r in out}
    # the chain 1~2~3 is one cluster labeled by its min
    assert [by_id[i].cluster_id for i in (1, 2, 3)] == [1, 1, 1]
    # co-travel: identical split for every member of the cluster
    assert len({by_id[i].split for i in (1, 2, 3)}) == 1
    # singletons cluster as themselves
    assert by_id[4].cluster_id == 4 and by_id[5].cluster_id == 5
    for r in out:
        assert r.split in ("train", "val", "test")


def test_pii_scrub_counts_and_hash(spark):
    raw = "contact bob@example.com or 415-555-1234 at 10.0.0.1 today"
    scrubbed = "contact <EMAIL> or <PHONE> at <IP> today"
    df = _docs(spark, [(1, raw, "en", "s"), (2, "no pii here", "en", "s")])
    got = {r.doc_id: r for r in curation.pii_scrub(df).collect()}
    assert (got[1].n_emails, got[1].n_phones, got[1].n_ips) == (1, 1, 1)
    assert got[1].pii_any == 1
    assert got[1].scrubbed_md5 == hashlib.md5(scrubbed.encode()).hexdigest()
    assert got[2].pii_any == 0
    assert got[2].scrubbed_md5 == hashlib.md5(b"no pii here").hexdigest()


def test_stratified_sample_deterministic_and_bounded(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = curation.stratified_sample(docs).collect()
    b = curation.stratified_sample(docs).collect()
    assert a == b  # rand()-free: identical on every run
    for r in a:
        assert r.sample_bucket < r.bucket_threshold
    # en is downweighted to 0.5 but dominant; rough rate sanity (binomial
    # noise at n~200 stays well inside these bounds)
    n_en = docs.where(F.col("lang") == "en").count()
    kept_en = sum(1 for r in a if r.lang == "en")
    assert 0.3 * n_en < kept_en < 0.7 * n_en


def test_top_terms_ranking_semantics(spark):
    # doc 1: "zz" tf=3 dominates; "aa" and "bb" tf=1 — "bb" is rarer
    # across the corpus (df tiebreak), then term order breaks aa/cc
    df = _docs(
        spark,
        [
            (1, "zz zz zz aa bb cc", "en", "s"),
            (2, "aa cc dd", "en", "s"),
            (3, "aa cc ee", "en", "s"),
        ],
    )
    got = [(r.term, r.tf, r.df) for r in text.top_terms(df).collect() if r.doc_id == 1]
    # tf desc first -> zz; then df asc among tf=1: bb(df=1) before
    # aa(df=3)/cc(df=3); aa before cc by term
    assert got == [("zz", 3, 1), ("bb", 1, 1), ("aa", 1, 3)]


def test_corpus_verdict_flag_consistency(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = curation.corpus_verdict(docs).collect()
    assert len(rows) == docs.count()  # a verdict for every document
    for r in rows:
        expect = int(
            r.q_ok and r.lang_ok and r.uniq_ok and r.clean_ok and not r.is_bench
        )
        assert r.kept == expect
        assert r.is_bench == int(r.doc_id % curation.BENCH_MOD == 0)
    kept = sum(r.kept for r in rows)
    assert 0 < kept < len(rows)  # both kept and dropped docs exist


def test_corpus_stats_exact_percentiles(spark):
    # one source, token counts 1..10 -> p50 = value at ceil(5) = 5,
    # p95 = value at ceil(9.5) = 10
    rows = [(i, " ".join(["w"] * i), "en", "s") for i in range(1, 11)]
    df = _docs(spark, rows)
    r = text.corpus_stats(df).collect()
    assert len(r) == 1
    s = r[0]
    assert (s.n_docs, s.total_tokens, s.min_tokens) == (10, 55, 1)
    assert (s.p50_tokens, s.p95_tokens, s.max_tokens) == (5, 10, 10)


def test_source_overlap_counts_planted_cross_source_dups(spark):
    """Identical texts planted across sources must surface as
    (source_a, source_b, n_shared_texts) rows; single-source dups and
    unique texts must not. (The sf fixtures have no cross-source exact
    dups, so without this plant the operator would pass vacuously.)"""
    df = _docs(
        spark,
        [
            # "shared one" appears in crawl_a, crawl_b, crawl_c
            (1, "shared one text", "en", "crawl_a"),
            (2, "shared one text", "en", "crawl_b"),
            (3, "shared one text", "en", "crawl_c"),
            # "shared two" appears in crawl_a (twice!) and crawl_b;
            # per-source DISTINCT means it still counts once per pair
            (4, "shared two text", "en", "crawl_a"),
            (5, "shared two text", "en", "crawl_a"),
            (6, "shared two text", "en", "crawl_b"),
            # same-source dup only: no pair row
            (7, "solo dup", "en", "crawl_c"),
            (8, "solo dup", "en", "crawl_c"),
            # unique
            (9, "nothing like the others", "en", "crawl_b"),
        ],
    )
    got = {
        (r.source_a, r.source_b): r.n_shared_texts
        for r in curation.source_overlap(df).collect()
    }
    assert got == {
        ("crawl_a", "crawl_b"): 2,  # shared one + shared two
        ("crawl_a", "crawl_c"): 1,
        ("crawl_b", "crawl_c"): 1,
    }


def test_source_overlap_near_dup_pairs(spark):
    """With a mined pair set, cross-source near-dup pairs are counted in
    n_near_dup_pairs; same-source pairs are excluded; (source_a,
    source_b) ordering is normalized; exact and near rows full-outer
    merge with zero fills."""
    df = _docs(
        spark,
        [
            (1, "alpha text", "en", "crawl_a"),
            (2, "alpha text v2", "en", "crawl_b"),
            (3, "beta text", "en", "crawl_b"),
            (4, "beta text v2", "en", "crawl_b"),  # same-source pair
            (5, "exact twin", "en", "crawl_a"),
            (6, "exact twin", "en", "crawl_c"),
        ],
    )
    # planted miner output (what simhash/minhash would emit)
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4)], ["doc_a", "doc_b"]
    )
    got = {
        (r.source_a, r.source_b): (r.n_shared_texts, r.n_near_dup_pairs)
        for r in curation.source_overlap(df, pairs=pairs).collect()
    }
    assert got == {
        ("crawl_a", "crawl_b"): (0, 1),  # near-only row, zero-filled exact
        ("crawl_a", "crawl_c"): (1, 0),  # exact-only row, zero-filled near
    }


def test_mixture_sample_flattens_dominant_sources(spark, sf_dir):
    """Alpha-0.5 mixing must pull every source's share toward the
    middle: dominant sources lose share vs raw proportion, tiny sources
    gain — and the quota math stays within the target."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators import curation
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import load_table
    import math

    docs = load_table(spark, sf_dir, "documents")
    raw = {r.source: r.n for r in docs.groupBy("source").count()
           .withColumnRenamed("count", "n").collect()}
    picked = curation.mixture_sample(docs).collect()
    got = {}
    for r in picked:
        got[r.source] = got.get(r.source, 0) + 1
    assert sum(got.values()) <= curation.MIXTURE_TARGET
    # every source with a nonzero quota appears; shares flattened
    n_total = sum(raw.values())
    k_total = sum(got.values())
    for s, n in raw.items():
        w = math.floor(math.sqrt(n))
        if w == 0:
            continue
        assert s in got, s
        raw_share = n / n_total
        mixed_share = got[s] / k_total
        # sqrt-weighting: above-average sources shrink, below-average grow
        if raw_share > 1.2 / len(raw):
            assert mixed_share < raw_share, (s, raw_share, mixed_share)
