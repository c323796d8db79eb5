"""Count-Min sketch (operators/cms.py): r12 library tier.

These pinned the Python-replica bit parity, the one-sided error
contract, counter-wise mergeability under arbitrary splits, and
cross-engine parity of the oracle string against DuckDB directly —
BEFORE the driver row (events_cms_heavy_hitters) registered
checked-first late in r12.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import os
import sys
from collections import Counter

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_iceberg_pipeline_stock_tracker_spark.functions.texthash import (  # noqa: E402
    MINHASH_P,
    MINHASH_PERMS,
)
from airflow_iceberg_pipeline_stock_tracker_spark.operators import cms  # noqa: E402

_BASE = dt.datetime(2024, 3, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _h32(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)


def _bucket(j, h):
    a, b = MINHASH_PERMS[j]
    return ((a * h + b) % MINHASH_P) % cms.CMS_WIDTH


def _zipf_rows(n=3000, n_users=80):
    # heavily skewed multiplicities — the workload CMS exists for
    rows = []
    for i in range(n):
        u = i % n_users if i % 3 else 0  # user 0 is the heavy hitter
        rows.append((i, _BASE, u, "a", 1.0, "{}"))
    return rows


def test_cms_build_matches_python_replica(spark):
    rows = _zipf_rows()
    sketch = {
        (r.j, r.bucket): r.cnt
        for r in cms.cms_build(_events(spark, rows), "user_id").collect()
    }
    want: Counter = Counter()
    for _, _, u, _, _, _ in rows:
        h = _h32(u)
        for j in range(cms.CMS_DEPTH):
            want[(j, _bucket(j, h))] += 1
    assert sketch == dict(want)


def test_cms_estimate_is_one_sided_and_tight_for_heavy_hitters(spark):
    rows = _zipf_rows()
    df = _events(spark, rows)
    sketch = cms.cms_build(df, "user_id")
    probes = df.select("user_id").distinct()
    est = {
        r.user_id: r.cms_est
        for r in cms.cms_estimate(sketch, probes, "user_id").collect()
    }
    exact = Counter(u for _, _, u, _, _, _ in rows)
    n_total = len(rows)
    for u, true_n in exact.items():
        assert est[u] >= true_n  # one-sided, ALWAYS
        # standard CMS bound: overestimate < 2N/width whp
        assert est[u] - true_n <= 2 * n_total // cms.CMS_WIDTH + 8
    # an item never seen estimates (near-)zero: bounded by collisions
    ghost = spark.createDataFrame([(999_999,)], "user_id long")
    g = cms.cms_estimate(sketch, ghost, "user_id").collect()[0]
    assert g.cms_est <= 2 * n_total // cms.CMS_WIDTH + 8


def test_cms_merge_equals_onepass_under_any_split(spark):
    rows = _zipf_rows()
    df = _events(spark, rows)
    one = {
        (r.j, r.bucket): r.cnt
        for r in cms.cms_build(df, "user_id").collect()
    }
    # three disjoint slices (occurrence streams: duplicates must ADD,
    # so slices partition the multiset, unlike KMV's idempotent sets)
    a = cms.cms_build(_events(spark, rows[:1000]), "user_id")
    b = cms.cms_build(_events(spark, rows[1000:2100]), "user_id")
    c = cms.cms_build(_events(spark, rows[2100:]), "user_id")
    merged = {
        (r.j, r.bucket): r.cnt
        for r in cms.cms_merge(cms.cms_merge(a, b), c).collect()
    }
    assert merged == one


def test_cms_sql_twin_bit_matches_spark(spark, tmp_path):
    """The registered row's oracle string, proven here first: top-20 exact items with CMS
    estimates — pure-integer surface, so parity is plain equality."""
    import duckdb

    rows = _zipf_rows()
    d = str(tmp_path / "ev.parquet")
    _events(spark, rows).write.parquet(d)
    df = spark.read.parquet(d)

    sketch = cms.cms_build(df, "user_id")
    from pyspark.sql import functions as F

    exact = (
        df.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
        .orderBy(F.desc("exact_n"), "user_id")
        .limit(20)
    )
    got = [
        (r.user_id, r.exact_n, r.cms_est, r.overestimate)
        for r in (
            cms.cms_estimate(sketch, exact.select("user_id"), "user_id")
            .join(exact, "user_id")
            .select(
                "user_id",
                "exact_n",
                "cms_est",
                (F.col("cms_est") - F.col("exact_n")).cast("bigint").alias(
                    "overestimate"
                ),
            )
            .orderBy(F.desc("exact_n"), "user_id")
            .collect()
        )
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{os.path.join(d, '*.parquet')}')"
    )
    want = con.execute(cms.cms_topk_sql("events", "user_id", k=20)).fetchall()
    assert got == [tuple(r) for r in want]


def test_null_items_excluded_count_semantics(spark):
    """NULL occurrences are excluded from the sketch (COUNT(col)
    semantics) — review-found: a NULL bucket is unreachable by the
    estimate's equi-join, so including NULLs would let a NULL probe
    report 0 under its true count, breaking the one-sided contract.
    With the filter, non-null estimates are unaffected by NULL rows and
    a NULL probe yields NO row (not a misleading 0)."""
    rows = [(i, _BASE, i % 10, "a", 1.0, "{}") for i in range(500)]
    nulls = [(9_000 + i, _BASE, None, "a", 1.0, "{}") for i in range(50)]
    with_nulls = _events(spark, rows + nulls)
    clean = _events(spark, rows)

    got = {
        (r.j, r.bucket): r.cnt
        for r in cms.cms_build(with_nulls, "user_id").collect()
    }
    want = {
        (r.j, r.bucket): r.cnt
        for r in cms.cms_build(clean, "user_id").collect()
    }
    assert got == want

    probes = spark.createDataFrame([(0,), (None,)], "user_id long")
    est = cms.cms_estimate(
        cms.cms_build(with_nulls, "user_id"), probes, "user_id"
    ).collect()
    assert [r.user_id for r in est] == [0]
    assert est[0].cms_est >= 50  # user 0 occurs 50 times
