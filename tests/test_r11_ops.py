"""Unit tests for the round-11 operators: Donchian channels,
hour-of-week seasonality, ship-SLA histogram percentiles, and the
winnowing pair miner's contract lives in test_r10_ops. Each pins the
semantic contract on a small adversarial fixture (the oracle gate
checks engine parity; these check the MATH is the intended math)."""

from __future__ import annotations

import datetime as dt

import pytest

from airflow_iceberg_pipeline_stock_tracker_spark.operators.finance import (
    DONCH_PERIOD,
    donchian,
)


def _prices(spark, bars, ticker="T", start=dt.date(2024, 1, 1)):
    """bars: list of (high, low, close) in dollars."""
    return spark.createDataFrame(
        [
            (ticker, start + dt.timedelta(days=i), c, h, lo, c, 100.0)
            for i, (h, lo, c) in enumerate(bars)
        ],
        "ticker string, date date, open double, high double, low double, "
        "close double, volume double",
    )


def test_donchian_prior_window_excludes_current_bar(spark):
    """A fresh high must BREAK OUT of yesterday's channel, not widen
    today's channel to swallow itself."""
    flat = [(10.0, 9.0, 9.5)] * DONCH_PERIOD
    surge = [(20.0, 9.0, 15.0)]  # close 15 > prior upper 10
    out = donchian(_prices(spark, flat + surge)).collect()
    assert len(out) == 1  # the 20 warm-up rows have no full prior window
    r = out[0]
    assert (r.upper_c, r.lower_c) == (1000, 900)  # from the flat window
    assert r.close_c == 1500 and r.signal == "breakout_up"
    assert r.width_c == 100 and r.mid2_c == 1900


def test_donchian_breakout_down_and_inside(spark):
    flat = [(10.0, 9.0, 9.5)] * DONCH_PERIOD
    down = [(9.4, 8.0, 8.5)]   # close 8.5 < prior lower 9.0
    inside = [(9.9, 9.1, 9.5)]  # within the (now widened-down) channel
    out = donchian(_prices(spark, flat + down + inside)).collect()
    assert [r.signal for r in out] == ["breakout_down", "inside"]
    # the down bar's low enters the NEXT row's channel
    assert out[1].lower_c == 800


def test_seasonality_epoch_dow_and_labels(spark, tmp_path):
    import os

    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        events_hourofweek_seasonality,
    )

    # 2024-03-03 is a SUNDAY (dow 0), 2024-03-04 a Monday (dow 1).
    # type 'a': 400 events in one cell + 1 elsewhere. total = 401:
    # hot cell 400*168 > 2*401; cold cell 2*1*168 = 336 < 401 (a cell
    # with total/168 events is exactly uniform -> 'normal', so the
    # cold fixture must be rarer than uniform, not just rare).
    rows, eid = [], 0
    sun = dt.datetime(2024, 3, 3, 10, 0)
    mon = dt.datetime(2024, 3, 4, 5, 0)
    for _ in range(400):
        rows.append((eid, sun, 1, "a", 1.0, "{}")); eid += 1
    rows.append((eid, mon, 1, "a", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    df.write.parquet(os.path.join(d, "events.parquet"))
    out = {(r.dow, r.hour): r for r in
           events_hourofweek_seasonality(spark, d).collect()}
    assert set(out) == {(0, 10), (1, 5)}
    hot = out[(0, 10)]
    assert hot.n_events == 400 and hot.total_type == 401
    assert hot.label == "hot" and hot.seasonal_idx == 400 * 168 / 401
    cold = out[(1, 5)]
    assert cold.label == "cold" and cold.n_events == 1


def test_ship_sla_exact_percentiles_match_python(spark, tmp_path):
    import os

    from airflow_iceberg_pipeline_stock_tracker_spark.plans.relational_ext import (
        orders_ship_sla,
    )

    base = dt.date(2024, 1, 1)
    lags = [1, 2, 2, 3, 10, 10, 10, 50, 100, 365]
    orders = [(i + 1, "1-URGENT", base) for i in range(len(lags))]
    li = [(i + 1, lag) for i, lag in enumerate(lags)]
    spark.createDataFrame(
        orders, "o_orderkey long, o_orderpriority string, o_orderdate date"
    ).write.parquet(os.path.join(str(tmp_path), "orders.parquet"))
    spark.createDataFrame(
        [(k, base + dt.timedelta(days=lag)) for k, lag in li]
        # a later second shipment must NOT move first_ship
        + [(1, base + dt.timedelta(days=200))],
        "l_orderkey long, l_shipdate date",
    ).write.parquet(os.path.join(str(tmp_path), "lineitem.parquet"))
    r = orders_ship_sla(spark, str(tmp_path)).collect()[0]

    def pct(vals, num, den):
        # smallest v with den*cum >= num*n
        s, n, cum = sorted(vals), len(vals), 0
        from collections import Counter
        c = Counter(s)
        for v in sorted(c):
            cum += c[v]
            if den * cum >= num * n:
                return v

    assert (r.n_orders, r.min_lag, r.max_lag) == (10, 1, 365)
    # rank-5 of the 10 sorted lags is 10 (the discrete median —
    # smallest value whose cumulative count reaches n/2)
    assert r.p50 == pct(lags, 1, 2) == 10
    assert r.p90 == pct(lags, 9, 10) == 100
    assert r.p99 == pct(lags, 99, 100) == 365
    assert r.mean_lag == sum(lags) / len(lags)


def _events_dir(spark, tmp_path, rows):
    import os

    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    df.write.parquet(os.path.join(d, "events.parquet"))
    return d


def test_mad_anomaly_flags_only_beyond_3_mad(spark, tmp_path):
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        events_mad_anomaly,
    )

    # 9 hours: counts [4,5,5,5,6,6,7,8,50] -> med 6 (rank ceil(9/2)=5),
    # abs devs [2,1,1,1,0,0,1,2,44] -> mad 1; flag needs dev > 3
    counts = [4, 5, 5, 5, 6, 6, 7, 8, 50]
    rows, eid = [], 0
    base = dt.datetime(2024, 3, 1)
    for h, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + dt.timedelta(hours=h), 1, "a", 1.0, "{}"))
            eid += 1
    out = events_mad_anomaly(spark, _events_dir(spark, tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_events, r.med, r.mad, r.abs_dev) == (50, 6, 1, 44)


def test_burst_episodes_islands_split_on_gaps(spark, tmp_path):
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        events_burst_episodes,
    )

    # 20 quiet hours at 1/hour, then bursts at hours 20-21 and 24
    # (10/hour). total=40, h=23 obs hours; qualify: n*23 > 80 -> n >= 4.
    counts = {h: 1 for h in range(20)}
    counts.update({20: 10, 21: 10, 24: 10})
    rows, eid = [], 0
    base = dt.datetime(2024, 3, 1)
    for h, c in counts.items():
        for _ in range(c):
            rows.append((eid, base + dt.timedelta(hours=h), 1, "a", 1.0, "{}"))
            eid += 1
    out = events_burst_episodes(
        spark, _events_dir(spark, tmp_path, rows)
    ).collect()
    assert len(out) == 2  # the hour-22/23 gap splits the islands
    first, second = out
    assert (first.n_hours, first.peak_n, first.total_n) == (2, 10, 20)
    assert first.start_hour.endswith("20:00:00")
    assert first.end_hour.endswith("21:00:00")
    assert (second.n_hours, second.total_n) == (1, 10)


def test_dq_referential_finds_planted_orphans(spark, tmp_path):
    import os

    from airflow_iceberg_pipeline_stock_tracker_spark.plans.relational_ext import (
        dq_referential_integrity,
    )

    d = str(tmp_path)
    base = dt.date(2024, 1, 1)
    spark.createDataFrame(
        [(1, 10, "O", 5.0, base, "1-URGENT"), (2, 99, "O", 5.0, base, "1-URGENT"),
         (3, 10, "O", 5.0, base, "1-URGENT")],  # custkey 99 is an orphan
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame(
        # order 7 orphan; order 3 has no lines; dup (1, 1) linekey
        [(1, 100, 1), (1, 100, 1), (2, 100, 2), (7, 100, 1)],
        "l_orderkey long, l_partkey long, l_linenumber int",
    ).write.parquet(os.path.join(d, "lineitem.parquet"))
    spark.createDataFrame(
        [(10,), (11,)], "c_custkey long"  # 11 has no orders
    ).write.parquet(os.path.join(d, "customer.parquet"))
    spark.createDataFrame(
        [(100,)], "p_partkey long"
    ).write.parquet(os.path.join(d, "part.parquet"))
    got = {
        r.check_name: (r.n_bad, r.status)
        for r in dq_referential_integrity(spark, d).collect()
    }
    assert got == {
        "lineitem_orphan_orderkey": (1, "FAIL"),
        "orders_without_lineitems": (1, "FAIL"),
        "orders_orphan_custkey": (1, "FAIL"),
        "customers_without_orders": (1, "INFO"),  # informational, never FAIL
        "lineitem_orphan_partkey": (0, "PASS"),
        "lineitem_duplicate_linekey": (1, "FAIL"),
    }


def test_heikin_ashi_matches_exact_fraction_fold(spark):
    """On a SHORT series every division by a power of two stays inside
    the 53-bit mantissa, so the fold equals the MATHEMATICAL
    Heikin-Ashi — checked against an exact Fraction recursion. This
    exactness is explicitly scoped: ha_open's dyadic denominator grows
    one bit per bar, so past ~43 bars the float fold diverges from the
    Fraction value (see the companion test below) and parity rests on
    the identical-op-order discipline instead."""
    from fractions import Fraction

    from airflow_iceberg_pipeline_stock_tracker_spark.operators.finance import (
        heikin_ashi,
    )

    bars = [(105.0, 95.0, 101.0), (110.0, 99.0, 108.0),
            (109.0, 100.0, 102.0), (103.0, 90.0, 91.0)]
    # _prices uses open=close; cents space
    out = heikin_ashi(_prices(spark, bars)).collect()
    po = pc = None
    for r, (h, lo, c) in zip(out, bars):
        oc, hc, lc, cc = (
            Fraction(round(c * 100)), Fraction(round(h * 100)),
            Fraction(round(lo * 100)), Fraction(round(c * 100)),
        )
        ho = (oc + cc) / 2 if po is None else (po + pc) / 2
        hcl = (oc + hc + lc + cc) / 4
        po, pc = ho, hcl
        assert Fraction(r.ha_open_c) == ho and Fraction(r.ha_close_c) == hcl
        assert Fraction(r.ha_high_c) == max(hc, ho, hcl)
        assert Fraction(r.ha_low_c) == min(lc, ho, hcl)
        assert r.bullish == (hcl > ho)


def test_heikin_ashi_exactness_breaks_but_engines_agree(spark):
    """Documents WHERE the exactness claim ends and what replaces it:
    ha_open's dyadic denominator grows one bit per bar, so on a 60-bar
    cents series the float fold must (a) diverge from the exact
    Fraction recursion somewhere past ~bar 40 — exactness does NOT hold
    at real history lengths — while (b) staying BIT-EQUAL to a pure
    Python float fold running the identical IEEE op sequence, which is
    the actual cross-engine contract (the macd discipline: the SQL twin
    runs the same op order, so it lands on the same doubles)."""
    from fractions import Fraction

    from airflow_iceberg_pipeline_stock_tracker_spark.operators.finance import (
        heikin_ashi,
    )

    # deterministic non-degenerate series: odd cents keep denominators
    # growing (a constant series would collapse to a fixed point)
    bars = []
    for i in range(60):
        c = 100.0 + ((i * 7) % 13) + ((i * 3) % 5) * 0.01
        bars.append((c + 1.0, c - 1.0, c))
    out = heikin_ashi(_prices(spark, bars)).collect()
    assert len(out) == 60

    fpo = fpc = None  # float fold, identical op order as the operator
    xpo = xpc = None  # exact Fraction fold
    diverged_at = None
    for i, (r, (h, lo, c)) in enumerate(zip(out, bars)):
        oc, hc, lc, cc = (
            float(round(c * 100)), float(round(h * 100)),
            float(round(lo * 100)), float(round(c * 100)),
        )
        fho = (oc + cc) / 2 if fpo is None else (fpo + fpc) / 2
        fhcl = (oc + hc + lc + cc) / 4
        fpo, fpc = fho, fhcl
        # (b) bit-equal to the identical-op-order float fold, all 60 bars
        assert r.ha_open_c == fho and r.ha_close_c == fhcl

        xoc, xhc, xlc, xcc = (
            Fraction(round(c * 100)), Fraction(round(h * 100)),
            Fraction(round(lo * 100)), Fraction(round(c * 100)),
        )
        xho = (xoc + xcc) / 2 if xpo is None else (xpo + xpc) / 2
        xhcl = (xoc + xhc + xlc + xcc) / 4
        xpo, xpc = xho, xhcl
        if diverged_at is None and Fraction(r.ha_open_c) != xho:
            diverged_at = i
    # (a) the mathematical value IS lost on a realistic history length
    assert diverged_at is not None, (
        "60-bar fold stayed exact — the docstring's ~43-bar bound (and "
        "this test) need revisiting"
    )
    assert diverged_at > 20  # short histories ARE exact (test above)


def test_hll_matches_python_replica_and_accuracy(spark, tmp_path):
    """The register pipeline must equal a pure-Python HLL replica to the
    BIT (same hash, same rho, same rational harmonic sum, same closing
    float expression), and the raw estimate must land within ~3 standard
    errors (3 * 1.04/sqrt(256) ~ 19.5%) of the exact count."""
    import hashlib

    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        HLL_M,
        HLL_W,
        events_hll_distinct,
    )

    n_users = 5000
    base = dt.datetime(2024, 3, 1)
    rows = [(i, base, i, "a", 1.0, "{}") for i in range(n_users)]
    out = events_hll_distinct(
        spark, _events_dir(spark, tmp_path, rows)
    ).collect()[0]

    regs: dict[int, int] = {}
    for u in range(n_users):
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
        b, w = h & (HLL_M - 1), h >> 8
        rho = HLL_W + 1 if w == 0 else HLL_W - w.bit_length() + 1
        regs[b] = max(regs.get(b, 0), rho)
    s_int = sum(1 << (HLL_W + 1 - r) for r in regs.values()) + (
        HLL_M - len(regs)
    ) * (1 << (HLL_W + 1))
    alpha = 0.7213 / (1 + 1.079 / HLL_M)
    est = alpha * (HLL_M * HLL_M) * float(1 << (HLL_W + 1)) / float(s_int)

    assert out.n_exact == n_users
    assert out.n_registers == len(regs)
    assert out.hll_estimate == est  # bit-exact: same IEEE op sequence
    assert abs(out.rel_err) < 0.195


def test_hll_reagg_merge_equals_onepass_with_cross_day_users(spark, tmp_path):
    """Users active on MULTIPLE days are the interesting case: their
    register contribution lands in several daily sketches and the
    max-merge must collapse it exactly to the one-pass register."""
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        events_hll_reagg,
    )

    base = dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    for day in range(5):
        for u in range(0, 800, 2 if day % 2 else 1):  # overlapping users
            rows.append(
                (eid, base + dt.timedelta(days=day), u, "a", 1.0, "{}")
            )
            eid += 1
    out = events_hll_reagg(spark, _events_dir(spark, tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.registers_equal is True
    assert r.merged_estimate == r.onepass_estimate  # bit-exact


def test_hll_setops_union_identity_and_inclusion_exclusion(spark, tmp_path):
    """Disjoint audiences: the merged-union estimate must equal the
    estimate of the concatenated audience (register max-merge IS union),
    and inclusion-exclusion must put the intersection near zero; a
    fully-contained audience must put the union near the superset."""
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        events_hll_setops,
    )

    base = dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    # a: users 0..1999; b: users 2000..3999 (disjoint); c: users 0..199
    # (subset of a)
    for u in range(2000):
        rows.append((eid, base, u, "a", 1.0, "{}")); eid += 1
    for u in range(2000, 4000):
        rows.append((eid, base, u, "b", 1.0, "{}")); eid += 1
    for u in range(200):
        rows.append((eid, base, u, "c", 1.0, "{}")); eid += 1
    out = {
        (r.type_a, r.type_b): r
        for r in events_hll_setops(
            spark, _events_dir(spark, tmp_path, rows)
        ).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    assert ab.exact_union == 4000
    assert abs(ab.union_rel_err) < 0.195  # 3 sigma at m=256
    # disjoint: intersection estimate must sit inside the error band of 0
    assert abs(ab.est_intersection) < 0.2 * 4000
    ac = out[("a", "c")]
    assert ac.exact_union == 2000
    # c is a subset of a: union registers == a's registers exactly, so
    # the union estimate is bit-identical to a's own estimate
    assert ac.est_union == ac.est_a


def test_hll_setops_single_type_yields_no_pairs(spark, tmp_path):
    """One event type: the exploded pair spine (r12's join-free
    rewrite) has no a < b survivors — the query returns ZERO rows
    rather than erroring on the empty frames downstream."""
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        events_hll_setops,
    )

    rows = [(i, dt.datetime(2024, 3, 1), i, "only", 1.0, "{}") for i in range(50)]
    out = events_hll_setops(spark, _events_dir(spark, tmp_path, rows)).collect()
    assert out == []


def test_cluster_balance_quota_and_determinism(spark, tmp_path):
    """Small clusters keep everything, big clusters exactly the quota,
    and the md5 selection is deterministic across runs; the rank<=quota
    filter must compile to a WindowGroupLimit (partial top-k before the
    shuffle)."""
    import os

    from airflow_iceberg_pipeline_stock_tracker_spark.operators.similarity import (
        BALANCE_QUOTA,
        cluster_balance,
    )

    # two well-separated blobs: 4 vectors near seed 0, 30 near seed 1
    rows = []
    for i in range(4):
        rows.append((i * 2, [1.0] * 32 + [0.0] * 32))  # even ids: blob A
    for i in range(30):
        rows.append((i * 2 + 1, [0.0] * 32 + [1.0] * 32))  # odd: blob B
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).write.parquet(os.path.join(d, "embeddings.parquet"))
    out1 = cluster_balance(spark, d).collect()
    out2 = cluster_balance(spark, d).collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    by_cluster: dict[int, int] = {}
    for r in out1:
        by_cluster[r.cluster] = by_cluster.get(r.cluster, 0) + 1
        assert 1 <= r.rank_in_cluster <= BALANCE_QUOTA
    sizes = sorted(by_cluster.values())
    # the small blob keeps all its members; the big one is capped
    assert sizes[-1] == BALANCE_QUOTA and min(sizes) <= 4
    plan = (
        cluster_balance(spark, d)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
