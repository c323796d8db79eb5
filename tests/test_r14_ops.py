"""r14 operator differentials: IVM deletes, FD discovery (wave 1+)."""

from __future__ import annotations

import os
import sys
from collections import Counter, defaultdict

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_iceberg_pipeline_stock_tracker_spark.plans.relational_ext import (  # noqa: E402
    _FD_CANDIDATES,
    _IVM_DELETE_PRED,
    dq_fd_violations,
    orders_ivm_delete,
)
from airflow_iceberg_pipeline_stock_tracker_spark.functions.money import (  # noqa: E402
    cents,
)
from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import (  # noqa: E402
    load_table,
)


# ---------------------------------------------------------------------------
# orders_ivm_delete
# ---------------------------------------------------------------------------


def _direct_recompute(spark, sf_dir):
    """The post-delete state computed directly (no delta algebra)."""
    orders = load_table(spark, sf_dir, "orders").where(
        ~F.expr(_IVM_DELETE_PRED)
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev_c"
        ),
    )
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("line_cnt"),
            F.sum("rev_c").cast("bigint").alias("revenue_cents"),
        )
    )


def test_ivm_delete_equals_direct_recompute(spark, sf_dir):
    got = {
        r.o_custkey: (r.line_cnt, r.revenue_cents)
        for r in orders_ivm_delete(spark, sf_dir).collect()
    }
    want = {
        r.o_custkey: (r.line_cnt, r.revenue_cents)
        for r in _direct_recompute(spark, sf_dir).collect()
    }
    assert got == want and got


def test_ivm_delete_zero_support_groups_vanish(spark, sf_dir):
    """Customers whose EVERY order is retracted (the %7 disjunct) must
    disappear from the maintained view — the negative multiplicities
    cancel to exactly zero and the HAVING filter removes the group."""
    got = {r.o_custkey for r in orders_ivm_delete(spark, sf_dir).collect()}
    # no fully-deleted customer survives
    assert not any(ck % 7 == 0 for ck in got)
    # ...and such customers existed in the PRE-delete view (the path
    # actually fired), while partially-retracted customers remain
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pre = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey")
        .distinct()
    )
    pre_mod7 = pre.where(F.col("o_custkey") % 7 == 0).count()
    assert pre_mod7 > 0
    assert got  # survivors exist


def test_ivm_delete_partial_retraction_counts_drop(spark, sf_dir):
    """A surviving customer with >= 1 retracted order must show strictly
    smaller counts than the pre-delete view (the date disjunct fired)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pre = {
        r.o_custkey: r.n
        for r in orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    post = {
        r.o_custkey: r.line_cnt
        for r in orders_ivm_delete(spark, sf_dir).collect()
    }
    dropped = [ck for ck, n in post.items() if n < pre[ck]]
    assert dropped  # the partial-retraction term fired
    assert all(post[ck] <= pre[ck] for ck in post)


# ---------------------------------------------------------------------------
# dq_fd_violations
# ---------------------------------------------------------------------------


def _python_g3(rows, fd_idx):
    """Pure-Python g3 over (x, y) string pairs."""
    per_x = defaultdict(Counter)
    n = 0
    for x, y in rows:
        per_x[x][y] += 1
        n += 1
    kept = sum(max(c.values()) for c in per_x.values())
    return n, len(per_x), kept


def test_fd_violations_matches_python_recompute(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = {r.fd: r for r in dq_fd_violations(spark, sf_dir).collect()}
    assert set(got) == {name for name, _, _ in _FD_CANDIDATES}
    for name, x_sql, y_sql in _FD_CANDIDATES:
        pairs = [
            (r.x, r.y)
            for r in li.selectExpr(
                f"CAST(({x_sql}) AS STRING) AS x",
                f"CAST(({y_sql}) AS STRING) AS y",
            ).collect()
        ]
        n, n_groups, kept = _python_g3(pairs, name)
        r = got[name]
        assert (r.n_rows, r.n_groups, r.n_kept) == (n, n_groups, kept)
        assert r.n_violations == n - kept
        assert abs(r.g3 - (n - kept) / n) < 1e-15


def test_fd_pk_row_is_exact_and_near_fds_are_not(spark, sf_dir):
    got = {r.fd: r for r in dq_fd_violations(spark, sf_dir).collect()}
    # the function-of-x control row: an exact dependency, g3 exactly
    # 0.0 (the testdata has no usable PK — (l_orderkey, l_linenumber)
    # is NOT unique there, which this test also documents)
    ctl = got["shipdate_to_shipyear"]
    assert ctl.n_violations == 0 and ctl.g3 == 0.0
    # at least one near-FD carries real violation mass
    assert any(
        r.n_violations > 0
        for name, r in got.items()
        if name != "shipdate_to_shipyear"
    )


# ---------------------------------------------------------------------------
# text_classifier_score
# ---------------------------------------------------------------------------


def _py_weight_milli(tok: str) -> int:
    """Pure-Python replica of the md5-derived hashed weight table."""
    import hashlib

    bucket = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 4096
    h60 = int(
        hashlib.md5(f"clfw:{bucket}".encode()).hexdigest()[:15], 16
    )
    return (h60 % 2001) - 1000


def test_classifier_score_matches_python_recompute(spark, sf_dir):
    import re

    from airflow_iceberg_pipeline_stock_tracker_spark.operators.text import (
        classifier_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    got = {r.doc_id: r for r in classifier_score(docs).collect()}
    sample = docs.where(F.col("text").isNotNull()).limit(25).collect()
    assert sample
    for d in sample:
        toks = re.split(r"\s+", d.text.strip())
        milli = sum(_py_weight_milli(t) for t in toks)
        r = got[d.doc_id]
        assert r.n_tokens == len(toks)
        assert r.logit_milli == milli
        assert r.label == ("keep" if milli > 0 else "drop")
        assert abs(r.logit - milli / (1000 * len(toks))) < 1e-15


def test_classifier_decision_boundary_is_integer(spark, sf_dir):
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.text import (
        classifier_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    rows = classifier_score(docs).collect()
    # both classes occur on the fixture, and the label always agrees
    # with the INTEGER sum's sign (never with a float rounding of it)
    assert {r.label for r in rows} == {"keep", "drop"}
    for r in rows:
        assert (r.label == "keep") == (r.logit_milli > 0)


# ---------------------------------------------------------------------------
# similarity_semdedup
# ---------------------------------------------------------------------------


def test_semdedup_matches_python_rule(spark, sf_dir):
    """pruned(v) == EXISTS u < v in the same cluster with a qualifying
    near-dup pair — recomputed in Python from the operator's own
    ingredient relations."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.similarity import (
        embedding_kmeans,
        embedding_near_dup_pairs_df,
        similarity_semdedup,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cluster = {
        r.vec_id: r.cluster
        for r in embedding_kmeans(spark, sf_dir).collect()
    }
    pairs = [
        (r.vec_a, r.vec_b)
        for r in embedding_near_dup_pairs_df(emb, 0.4).collect()
    ]
    want_pruned = {
        b for a, b in pairs if cluster.get(a) == cluster.get(b)
    }
    got = similarity_semdedup(spark, sf_dir).collect()
    assert {r.vec_id for r in got} == set(cluster)
    assert {r.vec_id for r in got if r.pruned} == want_pruned
    assert want_pruned  # non-vacuous on the fixture


def test_semdedup_prunes_planted_duplicate(spark, sf_dir, tmp_path):
    """A planted exact copy of vector 7 (larger id) lands in 7's
    cluster and must be pruned; 7 itself (the smaller id) survives."""
    import os as _os

    from airflow_iceberg_pipeline_stock_tracker_spark.operators.similarity import (
        similarity_semdedup,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.where("vec_id = 7").collect()[0]
    extra = spark.createDataFrame(
        [(1_000_000, list(base.embedding), 99)],
        "vec_id bigint, embedding array<float>, label int",
    )
    emb.unionByName(extra).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    for name in ("documents",):
        _os.symlink(
            f"{sf_dir}/{name}.parquet", str(tmp_path / f"{name}.parquet")
        )
    out = {
        r.vec_id: r for r in similarity_semdedup(spark, str(tmp_path)).collect()
    }
    assert out[1_000_000].pruned is True
    # 7 is pruned iff it has a SMALLER-id same-cluster neighbor at
    # cosine >= threshold on the augmented corpus (the planted copy can
    # never cause it: 1_000_000 > 7). Compute the exact expected boolean
    # from the operator's own definition via its two ingredients
    # (r14 advice: the previous `is False or is True` was vacuous).
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.similarity import (
        SEMDEDUP_THRESHOLD,
        embedding_kmeans,
        embedding_near_dup_pairs_df,
    )

    aug = load_table(spark, str(tmp_path), "embeddings")
    cluster = {
        r.vec_id: r.cluster
        for r in embedding_kmeans(spark, str(tmp_path)).collect()
    }
    want_7 = any(
        r.vec_a < 7 and cluster[r.vec_a] == cluster[7]
        for r in embedding_near_dup_pairs_df(
            aug, SEMDEDUP_THRESHOLD
        ).collect()
        if r.vec_b == 7
    )
    assert out[7].pruned is want_7
    assert out[1_000_000].cluster == out[7].cluster


# ---------------------------------------------------------------------------
# events_ab_cuped
# ---------------------------------------------------------------------------


def test_ab_cuped_matches_python_recompute(spark, sf_dir):
    import datetime as dt
    import hashlib

    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        _AB_CUT,
        events_ab_cuped,
    )

    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    cut = dt.datetime.fromisoformat(_AB_CUT)
    per_user = {}
    for r in ev.select("user_id", "ts").collect():
        x, y = per_user.get(r.user_id, (0, 0))
        if r.ts < cut:
            x += 1
        else:
            y += 1
        per_user[r.user_id] = (x, y)

    def arm_of(uid):
        h = int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:15], 16)
        return "treatment" if h % 2 == 0 else "control"

    import collections

    sums = collections.defaultdict(lambda: [0, 0, 0, 0, 0])  # n,sx,sy,sxx,sxy
    for uid, (x, y) in per_user.items():
        s = sums[arm_of(uid)]
        s[0] += 1
        s[1] += x
        s[2] += y
        s[3] += x * x
        s[4] += x * y
    n = sum(s[0] for s in sums.values())
    sx = sum(s[1] for s in sums.values())
    sy = sum(s[2] for s in sums.values())
    sxx = sum(s[3] for s in sums.values())
    sxy = sum(s[4] for s in sums.values())
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    got = {r.arm: r for r in events_ab_cuped(spark, sf_dir).collect()}
    assert set(got) == {"treatment", "control"}
    for arm, s in sums.items():
        r = got[arm]
        assert (r.n_users, r.sum_x, r.sum_y) == (s[0], s[1], s[2])
        mean_y = s[2] / s[0]
        adj = mean_y - theta * (s[1] / s[0] - sx / n)
        assert abs(r.mean_y - mean_y) < 1e-12
        assert abs(r.adj_mean_y - adj) < 1e-9
    # hash assignment => true effect 0: CUPED tightens the arm gap on
    # a covariate-correlated metric or at worst leaves it comparable
    raw_gap = abs(got["treatment"].mean_y - got["control"].mean_y)
    adj_gap = abs(got["treatment"].adj_mean_y - got["control"].adj_mean_y)
    assert adj_gap <= raw_gap * 1.5 + 1e-9


# ---------------------------------------------------------------------------
# curation_ppl_buckets
# ---------------------------------------------------------------------------


def test_ppl_buckets_matches_python_terciles(spark, sf_dir):
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.curation import (
        ppl_buckets,
    )
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.text import (
        lm_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    scores = {
        r.doc_id: r.lm_score_millibits for r in lm_score(docs).collect()
    }
    src = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    got = {r.doc_id: r for r in ppl_buckets(docs).collect()}
    import collections

    by_src = collections.defaultdict(list)
    for d, s in src.items():
        if d in scores:
            by_src[s].append(d)
    for s, ids in by_src.items():
        ids.sort(key=lambda d: (-scores[d], d))
        n = len(ids)
        for i, d in enumerate(ids, start=1):
            want = (
                "head"
                if 3 * i <= n
                else ("middle" if 3 * i <= 2 * n else "tail")
            )
            assert got[d].bucket == want, (s, d, i, n)
            assert got[d].lm_score_millibits == scores[d]
    # every source contributes all three buckets (non-vacuous split)
    seen = collections.defaultdict(set)
    for r in got.values():
        seen[r.source].add(r.bucket)
    assert all(v == {"head", "middle", "tail"} for v in seen.values())


# ---------------------------------------------------------------------------
# orders_ivm_outer
# ---------------------------------------------------------------------------


def test_ivm_outer_equals_direct_left_join(spark, sf_dir):
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.relational_ext import (
        orders_ivm_outer,
    )

    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders")
    want = {
        (r.c_custkey, r.o_orderkey)
        for r in cust.join(
            orders, cust.c_custkey == orders.o_custkey, "left"
        )
        .select("c_custkey", "o_orderkey")
        .collect()
    }
    got_rows = orders_ivm_outer(spark, sf_dir).collect()
    got = {(r.c_custkey, r.o_orderkey) for r in got_rows}
    assert got == want
    # the correction path fired: %5==3 customers exist, own orders, and
    # carry NO NULL row in the maintained view (their base NULL row was
    # retracted when the delta brought their first order)
    matched = {c for c, o in got if o is not None}
    mod5 = {c for c in matched if c % 5 == 3}
    assert mod5
    null_rows = {c for c, o in got if o is None}
    assert not (null_rows & matched)
    # the fixture has NO orderless customers (every custkey owns >= 1
    # order at every SF), so surviving NULL rows are exercised by the
    # planted test below, not here
    assert null_rows == set()


def test_ivm_outer_never_matched_customer_keeps_null_row(
    spark, sf_dir, tmp_path
):
    """A planted customer with zero orders must keep exactly its
    NULL-padded row through the maintenance pass."""
    import os as _os

    from airflow_iceberg_pipeline_stock_tracker_spark.plans.relational_ext import (
        orders_ivm_outer,
    )

    cust = load_table(spark, sf_dir, "customer")
    extra = spark.createDataFrame(
        [(999_999,)], "c_custkey bigint"
    ).withColumns(
        {
            c: F.lit(None).cast(dict(cust.dtypes)[c])
            for c in cust.columns
            if c != "c_custkey"
        }
    )
    cust.unionByName(extra.select(cust.columns)).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "customer.parquet"))
    _os.symlink(f"{sf_dir}/orders.parquet", str(tmp_path / "orders.parquet"))
    got = {
        (r.c_custkey, r.o_orderkey)
        for r in orders_ivm_outer(spark, str(tmp_path)).collect()
    }
    assert (999_999, None) in got
    assert sum(1 for c, _ in got if c == 999_999) == 1


# ---------------------------------------------------------------------------
# prices_kalman
# ---------------------------------------------------------------------------


def test_kalman_matches_python_fold(spark, sf_dir):
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.finance import (
        KALMAN_Q,
        KALMAN_R,
        kalman_filter,
    )
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.prices import (
        prices_standin,
    )

    from airflow_iceberg_pipeline_stock_tracker_spark.functions.money import (
        cents,
    )

    prices = prices_standin(spark, sf_dir)
    series = {}
    # take the cents surface from the engine itself: Spark ROUND is
    # HALF_UP while Python round() is banker's — the fold, not the
    # rounding rule, is what this test pins
    for r in prices.select(
        "ticker", "date", cents("close").cast("double").alias("x")
    ).collect():
        series.setdefault(r.ticker, []).append((r.date, r.x))
    got = {r.ticker: r for r in kalman_filter(prices).collect()}
    assert set(got) == set(series)
    for t, pts in series.items():
        pts.sort()
        m, p = pts[0][1], KALMAN_R
        for _, x in pts[1:]:
            p1 = p + KALMAN_Q
            k = p1 / (p1 + KALMAN_R)
            m = m + k * (x - m)
            p = (1 - k) * p1
        r = got[t]
        assert r.n_days == len(pts)
        assert r.kalman_level_c == m  # bit-equal fold
        assert r.kalman_var_c == p
        assert r.last_close_c == pts[-1][1]
        assert r.resid_c == pts[-1][1] - m


def test_kalman_variance_converges_to_riccati_fixed_point(spark, sf_dir):
    """p* solves p = (1 - (p+Q)/((p+Q)+R)) * (p+Q); after hundreds of
    bars every ticker's posterior variance sits at the fixed point."""
    import math

    from airflow_iceberg_pipeline_stock_tracker_spark.operators.finance import (
        KALMAN_Q,
        KALMAN_R,
        kalman_filter,
    )
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.prices import (
        prices_standin,
    )

    q, rr = KALMAN_Q, KALMAN_R
    # fixed point of the scalar Riccati recursion: p = (p+q)r/((p+q)+r)
    # => p^2 + p*q - q*r = 0
    p_star = (-q + math.sqrt(q * q + 4 * q * rr)) / 2
    rows = kalman_filter(prices_standin(spark, sf_dir)).collect()
    assert rows
    for r in rows:
        assert r.n_days > 100
        assert abs(r.kalman_var_c - p_star) < 1e-9, (r.ticker, r.kalman_var_c)


# ---------------------------------------------------------------------------
# events_holt_winters
# ---------------------------------------------------------------------------


def test_holt_winters_matches_python_fold(spark, sf_dir):
    import collections
    import datetime as dt

    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        events_holt_winters,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = collections.defaultdict(lambda: collections.defaultdict(int))
    for r in ev.select("event_type", F.to_date("ts").alias("d")).collect():
        daily[r.event_type][r.d] += 1
    got = {r.event_type: r for r in events_holt_winters(spark, sf_dir).collect()}
    epoch = dt.date(1970, 1, 1)
    for typ, by_day in daily.items():
        days = sorted(by_day)
        if len(days) < 8:
            assert typ not in got
            continue
        dows = [((d - epoch).days + 4) % 7 for d in days]
        if len(set(dows[:7])) != 7:
            assert typ not in got
            continue
        xs = [float(by_day[d]) for d in days]
        l = sum(xs[:7]) / 7.0  # fixture counts are small ints: exact sum
        t = 0.0
        s = [0.0] * 7
        for j, x in zip(dows[:7], xs[:7]):
            s[j] = x - l
        for dw, x in zip(dows[7:], xs[7:]):
            l_new = ((x - s[dw]) + (l + t)) / 2
            t = ((l_new - l) + t) / 2
            s[dw] = ((x - l_new) + s[dw]) / 2
            l = l_new
        r = got[typ]
        assert r.n_days == len(days)
        assert r.level == l and r.trend == t
        for j in range(7):
            assert getattr(r, f"s{j}") == s[j]
        nd = (dows[-1] + 1) % 7
        assert r.forecast_1 == (l + t) + s[nd]
        assert r.forecast_7 == (l + t * 7.0) + s[dows[-1]]
    assert got  # non-vacuous


def test_holt_winters_tracks_planted_seasonal_series(spark, tmp_path):
    """A pure weekly pattern with zero trend: after a few seasons the
    seasonal state reproduces the pattern and forecasts are near-exact."""
    import datetime as dt

    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        events_holt_winters,
    )

    rows = []
    eid = 0
    pattern = [10, 20, 30, 40, 30, 20, 10]  # by position in the week
    t0 = dt.datetime(2024, 1, 1)
    for day in range(49):  # 7 full weeks
        n = pattern[day % 7]
        for _ in range(n):
            rows.append(
                (eid, t0 + dt.timedelta(days=day, hours=1), 1, "w", 1.0, None)
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = events_holt_winters(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    # level converges to the weekly mean, trend to ~0, and the 1-step
    # forecast lands near the next day's true count
    week_mean = sum(pattern) / 7.0
    assert abs(r.level - week_mean) < 2.0
    assert abs(r.trend) < 0.5
    next_count = pattern[49 % 7]
    assert abs(r.forecast_1 - next_count) < 3.0


# ---------------------------------------------------------------------------
# events_survival_km
# ---------------------------------------------------------------------------


def test_survival_km_matches_python_recompute(spark, sf_dir):
    import collections
    import datetime as dt

    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        _KM_CUT,
        events_survival_km,
    )

    cut = dt.datetime.fromisoformat(_KM_CUT)
    last_day = cut.date() - dt.timedelta(days=1)
    ev = [
        r
        for r in load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        .collect()
        if r.user_id is not None and r.ts < cut
    ]
    t0 = {}
    for r in ev:
        if r.event_type == "signup":
            if r.user_id not in t0 or r.ts < t0[r.user_id]:
                t0[r.user_id] = r.ts
    tp = {}
    for r in ev:
        if r.event_type == "purchase" and r.user_id in t0 and r.ts > t0[r.user_id]:
            if r.user_id not in tp or r.ts < tp[r.user_id]:
                tp[r.user_id] = r.ts
    subjects = []
    for u, s in t0.items():
        if u in tp:
            subjects.append(((tp[u].date() - s.date()).days, True))
        else:
            subjects.append(((last_day - s.date()).days, False))
    steps = collections.defaultdict(lambda: [0, 0])
    for t, evt in subjects:
        steps[t][0 if evt else 1] += 1
    got = events_survival_km(spark, sf_dir).collect()
    assert got
    risk = len(subjects)
    s = 1.0
    want = []
    for t in sorted(steps):
        d, c = steps[t]
        s = s * ((risk - d) / risk)
        want.append((t, risk, d, c, s))
        risk -= d + c
    assert [
        (r.t, r.n_risk, r.d_events, r.c_censored, r.survival) for r in got
    ] == want
    # censoring is genuinely exercised on the fixture, and the curve is
    # a proper non-increasing survival function
    assert sum(c for _, _, _, c, _ in want) > 0
    assert all(
        want[i][4] >= want[i + 1][4] for i in range(len(want) - 1)
    )


def test_survival_km_censored_at_t_still_at_risk(spark, tmp_path):
    """The pinned convention: a subject censored at t counts in n_risk
    for events at the same t."""
    import datetime as dt

    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        events_survival_km,
    )

    t0 = dt.datetime(2024, 1, 1, 8)
    rows = [
        # user 1: signup day 0, purchase day 1 (event at t=1)
        (1, t0, 1, "signup", 1.0, None),
        (2, t0 + dt.timedelta(days=1), 1, "purchase", 1.0, None),
        # user 2: signup day 3 -> censored at last observed day (t=1)
        (3, t0 + dt.timedelta(days=2), 2, "signup", 1.0, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {r.t: r for r in events_survival_km(spark, str(tmp_path)).collect()}
    assert set(got) == {1}
    r = got[1]
    # both subjects at risk at t=1 even though user 2 is censored there
    assert r.n_risk == 2 and r.d_events == 1 and r.c_censored == 1
    assert r.survival == 1.0 * ((2 - 1) / 2)
