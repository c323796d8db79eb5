"""Property-based tests (hypothesis) for the custom join operators.

The example-based tests pin known edge cases; these throw randomized
small worlds at the operators and check them against brute-force
reference implementations — the class of bug they catch (boundary
conditions under adversarial timestamp collisions, key skew, empty
sides) is exactly what fixed fixtures miss.

Small deterministic profiles (max 40 rows, no deadline) because each
case pays Spark job overhead; the value is in the search space, not the
row count.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from airflow_iceberg_pipeline_stock_tracker_spark.operators import rangejoin
from airflow_iceberg_pipeline_stock_tracker_spark.operators.asof import asof_join

_BASE = dt.datetime(2024, 1, 1)

_prop_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# (user_id, seconds-offset) event rows; tight offset range forces
# boundary collisions (ts == lo, ts == hi, duplicate timestamps)
_events = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 120)),
    min_size=0,
    max_size=40,
)


def _ts(sec: int) -> dt.datetime:
    return _BASE + dt.timedelta(seconds=sec)


@given(probe=_events, ivals=_events)
@_prop_settings
def test_range_join_matches_bruteforce(spark, probe, ivals):
    width = 30
    probe_df = spark.createDataFrame(
        [(u, _ts(s), i) for i, (u, s) in enumerate(probe)],
        "user_id bigint, ts timestamp, event_id bigint",
    )
    ival_df = spark.createDataFrame(
        [(u, _ts(s), _ts(s + width), 1000 + i) for i, (u, s) in enumerate(ivals)],
        "user_id bigint, lo timestamp, hi timestamp, interval_id bigint",
    )
    got = sorted(
        (r.event_id, r.interval_id)
        for r in rangejoin.range_join_binned(
            probe_df, ival_df, keys=["user_id"], bucket_seconds=17
        ).collect()
    )
    want = sorted(
        (pi, 1000 + ii)
        for pi, (pu, ps) in enumerate(probe)
        for ii, (iu, isec) in enumerate(ivals)
        if pu == iu and isec < ps <= isec + width
    )
    assert got == want


@given(left=_events, right=_events)
@_prop_settings
def test_asof_join_matches_bruteforce(spark, left, right):
    """For every left row: the joined quote is the one with the LATEST
    right_time <= left time for that key (ties on time allowed — the
    operator may pick any of the tied payloads, so compare times)."""
    left_df = spark.createDataFrame(
        [(u, _ts(s), i) for i, (u, s) in enumerate(left)],
        "user_id bigint, ts timestamp, event_id bigint",
    )
    right_df = spark.createDataFrame(
        [(u, _ts(s), float(i)) for i, (u, s) in enumerate(right)],
        "user_id bigint, quote_ts timestamp, quote double",
    )
    got = {
        r.event_id: r.quote_ts
        for r in asof_join(
            left_df, right_df, on="user_id", left_time="ts", right_time="quote_ts"
        ).collect()
    }
    for i, (u, s) in enumerate(left):
        candidates = [rs for (ru, rs) in right if ru == u and rs <= s]
        want = _ts(max(candidates)) if candidates else None
        assert got[i] == want, (i, u, s)
    assert len(got) == len(left)  # every left row survives (left-join flavor)


# ---------------------------------------------------------------------------
# z-order interleave: exact bit round-trip
# ---------------------------------------------------------------------------

_u16 = st.integers(0, (1 << 16) - 1)


@given(st.lists(st.tuples(_u16, _u16), min_size=1, max_size=40))
@_prop_settings
def test_zvalue_interleave_roundtrip(spark, pairs):
    """The Morton value must deinterleave back to exactly (a, b) — the
    property every pruning guarantee rests on — and be monotone in each
    coordinate when the other is fixed at zero."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators import layout

    df = spark.createDataFrame(pairs, "a long, b long")
    rows = df.selectExpr(
        "a", "b", layout.zvalue_expr("a", "b") + " AS z"
    ).collect()
    for r in rows:
        a = b = 0
        for i in range(16):
            b |= ((r.z >> (2 * i)) & 1) << i
            a |= ((r.z >> (2 * i + 1)) & 1) << i
        assert (a, b) == (r.a, r.b), (r.a, r.b, r.z)


# ---------------------------------------------------------------------------
# repeated-span coverage invariants vs a brute-force reference
# ---------------------------------------------------------------------------

# tiny vocab + short docs force verbatim span collisions across docs
_docs = st.lists(
    st.lists(st.integers(0, 2), min_size=0, max_size=12),
    min_size=2,
    max_size=6,
)


@given(_docs)
@_prop_settings
def test_repeated_span_coverage_matches_bruteforce(spark, token_docs):
    """Brute-force reference: token i of doc d is duplicated iff some
    window [s, s+L) containing i appears verbatim in another document.
    The operator's interval-merged counts must agree exactly."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators import dedup

    L = 4  # small span so 12-token docs can collide
    texts = [" ".join(f"t{t}" for t in toks) for toks in token_docs]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.dup_tokens)
        for r in dedup.repeated_span_coverage(df, span=L).collect()
    }

    def windows(toks):
        return [tuple(toks[i : i + L]) for i in range(len(toks) - L + 1)]

    all_w = {}
    for d, toks in enumerate(token_docs):
        for w in set(windows(toks)):
            all_w.setdefault(w, set()).add(d)
    for d, toks in enumerate(token_docs):
        # split("") edge: an empty text still tokenizes to one '' token
        n_tok = len(toks) if toks else 1
        covered = set()
        for i, w in enumerate(windows(toks)):
            if len(all_w[w]) >= 2:
                covered.update(range(i, i + L))
        assert got[d] == (n_tok, len(covered)), (d, toks, got[d], len(covered))


@given(
    tgt=st.lists(
        st.tuples(st.integers(0, 9), st.integers(-100, 100)),
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    src=st.lists(
        st.tuples(st.integers(0, 9), st.integers(-100, 100)),
        max_size=12,
        unique_by=lambda t: t[0],
    ),
)
@_prop_settings
def test_merge_upsert_matches_dict_reference(spark, tgt, src):
    """merge_upsert == the dict-based upsert any engineer would write:
    matched keys accumulate, new keys insert, others pass through."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.merge import (
        merge_upsert,
    )

    target = spark.createDataFrame(
        [(k, v) for k, v in tgt] or [(None, None)], "k int, v int"
    ).where(F.col("k").isNotNull())
    source = spark.createDataFrame(
        [(k, d) for k, d in src] or [(None, None)], "k int, d int"
    ).where(F.col("k").isNotNull())

    out = merge_upsert(
        target,
        source,
        keys=["k"],
        when_matched={"v": F.col("t.v") + F.col("s.d")},
        when_not_matched={"v": F.col("s.d")},
    )
    got = {r.k: r.v for r in out.collect()}

    ref = dict(tgt)
    for k, d in src:
        ref[k] = ref.get(k, 0) + d
    assert got == ref


def test_results_invariant_under_partition_count(spark, sf_dir):
    """Exactness contract: changing spark.sql.shuffle.partitions must not
    change any result bit — the property that makes the engine safe to
    rescale from local[4] to a 1000-executor cluster. Exercised on three
    shapes that historically break under re-partitioning: multi-agg
    scan (double sums), per-key least-squares (moment sums), and the
    interpolating gap-fill (window over a composed join)."""
    import __spark_entry__ as entry

    names = ["q1_pricing_summary", "events_user_trend", "events_gapfill"]
    qs = entry.queries()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for parts in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for n in names:
                rows = [tuple(r) for r in qs[n](spark, sf_dir).collect()]
                results.setdefault(n, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    for n, (a, b) in results.items():
        assert a == b, f"{n} changed under re-partitioning"
