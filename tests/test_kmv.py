"""KMV bottom-k distinct sketch (operators/kmv.py): r12 library tier.

These tests pinned everything the registration needed BEFORE the
driver rows existed (the rows then registered checked-first late in
r12, funded by the r9 code-changed trio's demotion) — the
Python-replica bit parity, the exact-below-k branch, merge ==
one-pass under arbitrary partitioning, the sample-algebra overlap
estimates, and CROSS-ENGINE parity of the SQL twins against DuckDB
directly (so the registered rows inherit proven oracle strings).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_iceberg_pipeline_stock_tracker_spark.operators import kmv  # noqa: E402


def _h60(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


_BASE = dt.datetime(2024, 3, 1)


def test_bottom_k_matches_python_replica_to_the_bit(spark):
    n = 1200
    df = _events(spark, [(i, _BASE, i, "a", 1.0, "{}") for i in range(n)])
    got = sorted(
        r.h for r in kmv.bottom_k(df, ["event_type"], "user_id", k=64).collect()
    )
    want = sorted(_h60(u) for u in range(n))[:64]
    assert got == want

    est = kmv.kmv_estimate(
        kmv.bottom_k(df, ["event_type"], "user_id", k=64), ["event_type"], k=64
    ).collect()[0]
    assert est.n_sample == 64 and est.exact is False
    assert est.kth_min == want[-1]
    assert est.est_distinct == 63.0 * float(1 << 60) / float(want[-1])
    # raw estimator accuracy: ~3 standard errors of 1/sqrt(k-2)
    assert abs(est.est_distinct - n) / n < 3 / math.sqrt(62)


def test_unsaturated_sketch_is_exact(spark):
    df = _events(spark, [(i, _BASE, i % 40, "a", 1.0, "{}") for i in range(500)])
    est = kmv.kmv_estimate(
        kmv.bottom_k(df, ["event_type"], "user_id"), ["event_type"]
    ).collect()[0]
    assert est.exact is True
    assert est.n_sample == 40
    assert est.est_distinct == 40.0  # the sketch IS the distinct set


def test_merge_equals_onepass_under_any_split(spark):
    """Mergeability (the re-aggregation contract): bottom-k over slice
    unions == bottom-k over the whole, for overlapping slices too."""
    rows = [(i, _BASE, i % 700, "a", 1.0, "{}") for i in range(2000)]
    df = _events(spark, rows)
    # overlapping thirds (idempotence matters: shared users repeat)
    s1 = _events(spark, rows[:900])
    s2 = _events(spark, rows[600:1500])
    s3 = _events(spark, rows[1200:])
    k = 128
    keys = ["event_type"]
    merged = kmv.kmv_merge(
        kmv.kmv_merge(
            kmv.bottom_k(s1, keys, "user_id", k),
            kmv.bottom_k(s2, keys, "user_id", k),
            keys,
            k,
        ),
        kmv.bottom_k(s3, keys, "user_id", k),
        keys,
        k,
    )
    one = kmv.bottom_k(df, keys, "user_id", k)
    assert sorted(r.h for r in merged.collect()) == sorted(
        r.h for r in one.collect()
    )


def test_pair_overlap_estimates_known_subset_and_disjoint(spark):
    """B ⊂ A: jaccard = |B|/|A|, intersection ≈ |B|. C disjoint from A:
    both estimates ~0 (exactly 0 when no shared hash lands in X)."""
    rows = (
        [(i, _BASE, i, "a", 1.0, "{}") for i in range(2000)]
        + [(10_000 + i, _BASE, i, "b", 1.0, "{}") for i in range(1000)]  # b ⊂ a
        + [(20_000 + i, _BASE, 100_000 + i, "c", 1.0, "{}") for i in range(800)]
    )
    df = _events(spark, rows)
    sk = kmv.bottom_k(df, ["event_type"], "user_id")
    out = {
        (r.key_a, r.key_b): r
        for r in kmv.kmv_pair_overlap(sk, "event_type").collect()
    }
    ab = out[("a", "b")]
    # truth: |a∪b| = 2000, |a∩b| = 1000, jaccard 0.5
    assert abs(ab.jaccard_est - 0.5) < 3 / math.sqrt(kmv.KMV_K)
    assert abs(ab.union_est - 2000) / 2000 < 3 / math.sqrt(kmv.KMV_K - 2)
    assert abs(ab.intersection_est - 1000) / 1000 < 0.25
    ac = out[("a", "c")]
    assert ac.n_both == 0 and ac.jaccard_est == 0.0 and ac.intersection_est == 0.0


def _duck(sf_events_dir_rows):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{sf_events_dir_rows}')"
    )
    return con


def test_sql_twins_bit_match_spark(spark, tmp_path):
    """The registered rows' oracle strings, proven here first: DuckDB runs the twin SQL over
    the same parquet and every value — including the closing float
    estimates — matches Spark bit-for-bit."""
    rows = (
        [(i, _BASE, i, "a", 1.0, "{}") for i in range(1500)]
        + [(10_000 + i, _BASE, 500 + i, "b", 1.0, "{}") for i in range(1500)]
        + [(30_000 + i, _BASE, i % 90, "c", 1.0, "{}") for i in range(300)]
    )
    d = str(tmp_path / "ev.parquet")
    _events(spark, rows).write.parquet(d)
    df = spark.read.parquet(d)
    con = _duck(os.path.join(d, "*.parquet"))

    sk = kmv.bottom_k(df, ["event_type"], "user_id")
    got_d = [
        (r.event_type, r.n_sample, r.kth_min, r.exact, r.est_distinct)
        for r in kmv.kmv_estimate(sk, ["event_type"])
        .orderBy("event_type")
        .collect()
    ]
    want_d = con.execute(
        kmv.kmv_distinct_sql("events", "event_type", "user_id")
    ).fetchall()
    assert got_d == [tuple(r) for r in want_d]

    got_p = [
        (r.key_a, r.key_b, r.n_x, r.n_both, r.jaccard_est, r.union_est,
         r.intersection_est)
        for r in kmv.kmv_pair_overlap(sk, "event_type").collect()
    ]
    want_p = con.execute(
        kmv.kmv_pair_overlap_sql("events", "event_type", "user_id")
    ).fetchall()
    assert got_p == [tuple(r) for r in want_p]


def test_bottom_k_plans_as_window_group_limit(spark):
    """The scale claim: rank <= k pushes a partial top-k below the
    exchange (WindowGroupLimit), so the shuffle moves O(keys x k) rows."""
    df = _events(spark, [(i, _BASE, i, "a", 1.0, "{}") for i in range(100)])
    plan = (
        kmv.bottom_k(df, ["event_type"], "user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


def test_null_values_are_excluded_count_distinct_semantics(spark, tmp_path):
    """NULL value rows must not consume bottom-k slots (Spark windows
    rank NULLs first, DuckDB last — review-found cross-engine skew) and
    the estimate mirrors COUNT(DISTINCT), which ignores NULLs. Both
    engines must still bit-match on data WITH nulls."""
    rows = [(i, _BASE, i, "a", 1.0, "{}") for i in range(300)] + [
        (9_000 + i, _BASE, None, "a", 1.0, "{}") for i in range(5)
    ]
    d = str(tmp_path / "evn.parquet")
    _events(spark, rows).write.parquet(d)
    df = spark.read.parquet(d)

    k = 64
    sk = kmv.bottom_k(df, ["event_type"], "user_id", k=k)
    got = sorted(r.h for r in sk.collect())
    assert len(got) == k and None not in got
    assert got == sorted(_h60(u) for u in range(300))[:k]

    con = _duck(os.path.join(d, "*.parquet"))
    want = con.execute(
        kmv.kmv_distinct_sql("events", "event_type", "user_id", k=k)
    ).fetchall()
    est = kmv.kmv_estimate(sk, ["event_type"], k=k).collect()[0]
    assert (est.event_type, est.n_sample, est.kth_min, est.exact,
            est.est_distinct) == tuple(want[0])
