"""Round-13 wave-2 operators: skyline (Pareto dominance) and the
Benford first-digit DQ screen.

Reference scope: extension tier — the reference DAG
(/root/reference/dags/dag.py) has row-predicate DQ checks only; these
add a preference-query operator class and a distributional DQ check.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from airflow_iceberg_pipeline_stock_tracker_spark.operators.skyline import (  # noqa: E402
    skyline_min_price_max_size,
)

_PART_SCHEMA = "p_partkey long, p_brand string, p_size int, p_retailprice double"


def _brute_skyline(rows):
    """Quadratic reference: the textbook dominance definition."""
    out = []
    for p in rows:
        dominated = any(
            q[1] == p[1]  # same brand
            and round(q[3] * 100) <= round(p[3] * 100)
            and q[2] >= p[2]
            and (round(q[3] * 100) < round(p[3] * 100) or q[2] > p[2])
            for q in rows
        )
        if not dominated:
            out.append(p[0])
    return sorted(out)


def test_skyline_matches_brute_force(spark):
    rows = [
        # brand X: a clean staircase + dominated interior points
        (1, "X", 10, 5.00),
        (2, "X", 20, 8.00),
        (3, "X", 30, 12.00),
        (4, "X", 15, 9.00),   # dominated by 2 (cheaper, bigger)
        (5, "X", 20, 8.00),   # exact duplicate of 2 -> BOTH kept
        (6, "X", 5, 5.00),    # same price as 1, smaller -> dominated
        (7, "X", 10, 4.99),   # cheaper than 1 at same size -> dominates 1
        # brand Y: single row is trivially on the skyline
        (8, "Y", 1, 100.00),
    ]
    df = spark.createDataFrame(rows, _PART_SCHEMA)
    got = sorted(
        r.p_partkey
        for r in skyline_min_price_max_size(
            df, "p_brand", "p_retailprice", "p_size"
        ).collect()
    )
    assert got == _brute_skyline(rows)
    # the duplicate pair survives together, the dominated ones are out
    assert 2 in got and 5 in got and 1 not in got and 4 not in got


def test_skyline_null_rows_excluded(spark):
    rows = [(1, "X", None, 5.0), (2, "X", 10, None), (3, "X", 10, 5.0)]
    df = spark.createDataFrame(rows, _PART_SCHEMA)
    got = skyline_min_price_max_size(
        df, "p_brand", "p_retailprice", "p_size"
    ).collect()
    assert [r.p_partkey for r in got] == [3]


def test_skyline_hypothesis_random_tables(spark):
    """Random small tables: window-algorithm set == quadratic set."""
    import random

    rng = random.Random(1337)
    for trial in range(5):
        rows = [
            (
                i,
                rng.choice(["A", "B"]),
                rng.randint(1, 8),
                float(rng.randint(100, 120)) / 10.0,
            )
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, _PART_SCHEMA)
        got = sorted(
            r.p_partkey
            for r in skyline_min_price_max_size(
                df, "p_brand", "p_retailprice", "p_size"
            ).collect()
        )
        assert got == _brute_skyline(rows), f"trial {trial}"


def test_benford_digits_and_chi2(spark, sf_dir):
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.relational_ext import dq_benford

    out = dq_benford(spark, sf_dir).collect()
    digits = [r.digit for r in out]
    assert digits == sorted(digits) and set(digits) <= set(range(1, 10))
    # frequencies are a distribution; expected freqs are Benford's law
    assert abs(sum(r.obs_freq for r in out) - 1.0) < 1e-9
    for r in out:
        assert abs(r.exp_freq - math.log10(1.0 + 1.0 / r.digit)) < 1e-12
        assert r.chi2_term >= 0.0


def test_benford_digit_extraction_is_string_based(spark):
    """1000.00 must land in digit 1 — floor(log10) would wobble."""
    from airflow_iceberg_pipeline_stock_tracker_spark.functions.money import cents

    df = spark.createDataFrame(
        [(1000.00,), (999.99,), (0.01,), (901.82,)], "x double"
    )
    got = [
        r.d
        for r in df.select(
            F.substring(cents("x").cast("string"), 1, 1)
            .cast("int")
            .alias("d")
        ).collect()
    ]
    assert got == [1, 9, 1, 9]


# ---------------------------------------------------------------------------
# wave 3: A-ES weighted sampling + edit-distance fuzzy dedup
# ---------------------------------------------------------------------------

_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _doc(i, text, n=None):
    return (i, text, "en", "s", len(text) if n is None else n)


def test_weighted_sample_keys_match_python_recompute(spark):
    """aes_key must equal the Python-recomputed u^(1/w) exactly —
    the portable-hash contract at the value level."""
    import hashlib

    from airflow_iceberg_pipeline_stock_tracker_spark.operators.curation import (
        WSAMPLE_SALT,
        weighted_sample,
    )

    rows = [_doc(i, "x" * (10 + 7 * i)) for i in range(30)]
    out = weighted_sample(
        spark.createDataFrame(rows, _DOC_SCHEMA), k=30
    ).collect()
    assert len(out) == 30
    for r in out:
        h = int(
            hashlib.md5(f"{WSAMPLE_SALT}:{r.doc_id}".encode()).hexdigest()[:15],
            16,
        )
        u = float(h + 1) / float(1 << 60)
        assert r.aes_key == u ** (1.0 / float(r.n_chars))
    # ranks strictly follow key desc
    keys = [r.aes_key for r in sorted(out, key=lambda r: r.rank)]
    assert keys == sorted(keys, reverse=True)


def test_weighted_sample_huge_weight_wins(spark):
    """w -> inf drives u^(1/w) -> 1: an overwhelming weight must rank
    first regardless of its hash draw."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.curation import (
        weighted_sample,
    )

    rows = [_doc(i, "y" * 20) for i in range(50)] + [
        (999, "big", "en", "s", 10**12)
    ]
    out = weighted_sample(
        spark.createDataFrame(rows, _DOC_SCHEMA), k=5
    ).collect()
    assert out[0].doc_id == 999


def test_edit_distance_finds_typo_pairs_and_respects_blocking(spark):
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.dedup import (
        edit_distance_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        _doc(1, base),
        _doc(2, base.replace("jumps", "jumped")),   # 2 edits, same prefix
        _doc(3, "zzz " + base),                     # same content, prefix differs -> blocked apart
        _doc(4, "completely different text that shares nothing at all"),
    ]
    got = {
        (r.doc_a, r.doc_b): r.lev_dist
        for r in edit_distance_pairs(
            spark.createDataFrame(rows, _DOC_SCHEMA)
        ).collect()
    }
    assert (1, 2) in got and got[(1, 2)] == 2
    # doc 3's 16-char block key differs: out of scope by definition
    assert all(3 not in p for p in got)
    assert all(4 not in p for p in got)


def test_edit_distance_length_band_prunes(spark):
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.dedup import (
        edit_distance_pairs,
    )

    pfx = "shared sixteen c"
    rows = [
        _doc(1, pfx + "x" * 10),
        # same block, but n_chars delta 40 >> band 8: no DP runs
        _doc(2, pfx + "x" * 50),
    ]
    out = edit_distance_pairs(
        spark.createDataFrame(rows, _DOC_SCHEMA)
    ).collect()
    assert out == []


def test_edit_distance_non_ascii_sanitized(spark):
    """Non-ASCII chars are stripped before the DP (Spark and DuckDB
    disagree on unicode levenshtein), so accented variants pair up."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.dedup import (
        edit_distance_pairs,
    )

    a = "hello world this is a stable shared prefix for the block"
    rows = [_doc(1, a), _doc(2, a.replace("stable", "stablé"))]
    out = edit_distance_pairs(
        spark.createDataFrame(rows, _DOC_SCHEMA)
    ).collect()
    # 'é' is stripped -> 'stabl' vs 'stable': distance 1, not a
    # unicode-dependent value
    assert len(out) == 1 and out[0].lev_dist == 1


# ---------------------------------------------------------------------------
# wave 4: classical seasonal decomposition + RRF hybrid retrieval
# ---------------------------------------------------------------------------


def test_stl_reconstruction_identity_and_centering(spark, sf_dir):
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        events_stl_decompose,
    )

    out = events_stl_decompose(spark, sf_dir).collect()
    assert len(out) > 0
    interior = [r for r in out if r.trend is not None]
    assert interior, "expected at least one full centered window"
    for r in interior:
        # additive identity: y = trend + seasonal + residual
        assert abs(r.y - (r.trend + r.seasonal + r.residual)) < 1e-9
    # seasonal indices are zero-centered over the distinct dows
    seas = {r.dow: r.seasonal for r in out}
    assert abs(sum(seas.values())) < 1e-9 * max(1.0, max(abs(v) for v in seas.values()))
    # edge rows (first/last 3 days of a contiguous series) carry NULLs
    assert out[0].trend is None and out[0].residual is None
    assert out[-1].trend is None


def test_stl_gap_voids_the_window(spark, tmp_path):
    """A missing calendar day must NULL the trend for every window that
    spans it — row-count alone would silently average a lopsided week."""
    import datetime as dt

    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        events_stl_decompose,
    )

    days = [dt.datetime(2024, 1, d, 12, 0) for d in (
        1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11,   # contiguous
        13, 14, 15, 16, 17, 18, 19,          # gap at the 12th
    )]
    rows = [
        (i * 10 + k, ts, k, "t", 1.0, "{}")
        for i, ts in enumerate(days)
        for k in range(3)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.d.isoformat(): r.trend
        for r in events_stl_decompose(spark, str(tmp_path)).collect()
    }
    # windows centered at Jan 9..15 span the missing 12th -> NULL trend
    for d in range(9, 16):
        key = f"2024-01-{d:02d}"
        if key in out:
            assert out[key] is None, key
    # a fully interior day away from the gap keeps its trend
    assert out["2024-01-05"] is not None


def test_rrf_fusion_math_and_rank_shape(spark, sf_dir):
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.llm_queries import (
        RRF_K,
        RRF_TOP,
        similarity_rrf_hybrid,
    )

    out = similarity_rrf_hybrid(spark, sf_dir).collect()
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    assert len(out) <= RRF_TOP
    scores = []
    for r in out:
        expect = 0.0
        if r.lex_rank is not None:
            expect += 1.0 / (float(RRF_K) + float(r.lex_rank))
        if r.sem_rank is not None:
            expect += 1.0 / (float(RRF_K) + float(r.sem_rank))
        assert r.rrf_score == expect
        assert r.lex_rank is not None or r.sem_rank is not None
        scores.append(r.rrf_score)
    assert scores == sorted(scores, reverse=True)


def test_rrf_both_lists_beat_single_list_at_same_rank(spark, sf_dir):
    """A doc ranked r in BOTH lists must outscore a doc ranked r in
    only one — the fusion property that makes RRF hybrid retrieval."""
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.llm_queries import (
        similarity_rrf_hybrid,
    )

    out = similarity_rrf_hybrid(spark, sf_dir).collect()
    both = [r for r in out if r.lex_rank is not None and r.sem_rank is not None]
    single = [r for r in out if (r.lex_rank is None) != (r.sem_rank is None)]
    if both and single:
        # any dual-list doc with ranks (a, b) beats a single-list doc
        # whose one rank is >= min(a, b)
        b = both[0]
        lo = min(b.lex_rank, b.sem_rank)
        for s in single:
            r = s.lex_rank if s.lex_rank is not None else s.sem_rank
            if r >= lo:
                assert b.rrf_score > s.rrf_score


# ---------------------------------------------------------------------------
# wave 5: prefix-filtering set-similarity join (PPJoin-lite)
# ---------------------------------------------------------------------------


def test_prefix_filter_equals_uncapped_inverted_index(spark, sf_dir):
    """Exact-recall theorem check on the real fixture: the prefix-join
    pair set must equal the UNCAPPED inverted-index pair set at the
    same threshold (both are exact; they get there differently)."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_pairs,
    )
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    brute = {
        (r.doc_a, r.doc_b): (r.inter, r.size_a, r.size_b)
        for r in ngram_jaccard_pairs(docs, max_df=10**9).collect()
    }
    pf = {
        (r.doc_a, r.doc_b): (r.inter, r.size_a, r.size_b)
        for r in prefix_filter_pairs(docs).collect()
    }
    assert pf == brute


def test_prefix_filter_finds_duplicate_groups(spark):
    """k exact replicas must yield all C(k,2) pairs at jaccard 1.0 —
    exact recall under duplicate saturation, where capped miners rely
    on the cap ordering to keep group members together."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    text = " ".join(f"tok{i}" for i in range(30))
    other = " ".join(f"zzz{i}" for i in range(30))
    rows = [(i, text, "en", "s", len(text)) for i in range(5)] + [
        (99, other, "en", "s", len(other))
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = prefix_filter_pairs(df).collect()
    got = {(r.doc_a, r.doc_b) for r in out}
    want = {(a, b) for a in range(5) for b in range(5) if a < b}
    assert got == want
    assert all(r.jaccard == 1.0 for r in out)


def test_prefix_filter_prefixes_exclude_hot_shingles(spark):
    """A boilerplate shingle shared by every doc must enter no doc's
    prefix (it is the LAST in df order) unless the doc is tiny — the
    candidate-volume claim the operator's scale story rests on."""
    from pyspark.sql import functions as F

    from airflow_iceberg_pipeline_stock_tracker_spark.operators.dedup import (
        PREFIX_T_P,
        PREFIX_T_Q,
        _shingle_hashes,
    )

    # every doc ends with the same boilerplate sentence; bodies disjoint
    boiler = "all rights reserved worldwide"
    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(20)) + " " + boiler,
         "en", "s", 0)
        for i in range(8)
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    from pyspark.sql import Window

    sh = _shingle_hashes(df)
    dfrel = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    wdoc = Window.partitionBy("doc_id")
    ranked = (
        sh.join(dfrel, "h")
        .withColumn("set_size", F.count(F.lit(1)).over(wdoc))
        .withColumn("rn", F.row_number().over(wdoc.orderBy("df", "h")))
    )
    pfx_len = (
        F.col("set_size")
        - F.expr(f"({PREFIX_T_P} * set_size + {PREFIX_T_Q} - 1) div {PREFIX_T_Q}")
        + F.lit(1)
    )
    prefix = ranked.where(F.col("rn") <= pfx_len)
    # shared shingles (df == 8) never make a prefix here: each doc has
    # ~22 distinct shingles, prefix ~12, and 8+ rare body shingles
    hot_in_prefix = (
        prefix.join(dfrel.where(F.col("df") == 8).select("h"), "h").count()
    )
    assert hot_in_prefix == 0


# ---------------------------------------------------------------------------
# wave 6: single-pass profiler + per-source score calibration
# ---------------------------------------------------------------------------


def test_dq_profile_stats_are_exact(spark, sf_dir):
    import duckdb

    from airflow_iceberg_pipeline_stock_tracker_spark.plans.relational_ext import (
        dq_profile,
    )

    out = {r.col_name: r for r in dq_profile(spark, sf_dir).collect()}
    assert len(out) == 11
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    # spot-check three columns against independent single-column queries
    n, nn, nd, lo, hi = con.execute(
        "SELECT COUNT(*), COUNT(l_orderkey), COUNT(DISTINCT l_orderkey), "
        "MIN(l_orderkey), MAX(l_orderkey) FROM lineitem"
    ).fetchone()
    r = out["l_orderkey"]
    assert (r.n_total, r.n_null, r.n_distinct, r.min_int, r.max_int) == (
        n, n - nn, nd, lo, hi,
    )
    assert r.min_str is None and r.max_str is None
    r = out["l_returnflag"]
    lo_s, hi_s = con.execute(
        "SELECT MIN(l_returnflag), MAX(l_returnflag) FROM lineitem"
    ).fetchone()
    assert (r.min_str, r.max_str) == (lo_s, hi_s)
    assert r.min_int is None and r.max_int is None
    r = out["l_extendedprice"]
    lo_c, hi_c = con.execute(
        "SELECT MIN(CAST(ROUND(l_extendedprice*100) AS BIGINT)), "
        "MAX(CAST(ROUND(l_extendedprice*100) AS BIGINT)) FROM lineitem"
    ).fetchone()
    assert (r.min_int, r.max_int) == (lo_c, hi_c)


def test_dq_profile_is_one_scan(spark, sf_dir):
    """The profiler's contract: ONE scan of the fact table (the naive
    per-column profiler runs 11)."""
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.relational_ext import (
        dq_profile,
    )

    plan = (
        dq_profile(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1


def test_dq_profile_distinct_stage_is_hash_aggregate(spark, sf_dir):
    """The r13 re-plan's contract: the distinct-collapsing stage is a
    pure-COUNT HashAggregate on the skinny (col, vi, vs) triple — NOT
    Catalyst's multi-distinct rewrite, which plans a SortAggregate of
    first() buffers over a 12x Expand of all eleven wide columns
    (measured 24.3s vs 3.4s at sf0.1). A SortAggregate is still
    allowed for the final 11-group fold (string min/max buffers are
    immutable), but it must run on the collapsed key set: the plan
    must contain NO Expand node and a HashAggregate keyed on the
    triple."""
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.relational_ext import (
        dq_profile,
    )

    plan = (
        dq_profile(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in plan
    assert "HashAggregate(keys=[col_name" in plan


def test_score_calibration_thresholds_are_medians(spark, sf_dir):
    """Each source's threshold must be the discrete median of ITS score
    distribution, and kept_calibrated ~ half of n_docs by construction
    (>= half, since kept includes the median bucket)."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.curation import (
        score_calibration,
    )
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.text import lm_score
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = score_calibration(docs).collect()
    assert len(out) > 1
    scores = {
        r.doc_id: r.lm_score_millibits
        for r in lm_score(docs).collect()
        if r.lm_score_millibits is not None
    }
    srcs = {
        r.doc_id: r.source
        for r in docs.select("doc_id", "source").collect()
    }
    for row in out:
        vals = sorted(
            s for d, s in scores.items() if srcs.get(d) == row.source
        )
        # discrete median: smallest s with 2*|{x <= s}| >= n
        import bisect

        med = next(
            s for s in vals
            if 2 * (bisect.bisect_right(vals, s)) >= len(vals)
        )
        assert row.source_threshold == med
        assert row.n_docs == len(vals)
        assert row.kept_calibrated == sum(1 for v in vals if v >= med)
        # kept-calibrated is always the top half-ish of ITS OWN source
        assert 2 * row.kept_calibrated >= row.n_docs - 1
    # global threshold identical across rows
    assert len({r.global_threshold for r in out}) == 1
