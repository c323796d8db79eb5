"""Unit tests for the round-10 operators: monthly bars, golden cross,
OBV, MACD, winnowing fingerprints, item-item Jaccard. Each pins the
semantic contract on a small adversarial fixture (the oracle gate
checks engine parity; these check the MATH is the intended math)."""

from __future__ import annotations

import datetime as dt

import pytest

from airflow_iceberg_pipeline_stock_tracker_spark.operators.finance import (
    GC_SLOW,
    MACD_FAST,
    MACD_SIG,
    MACD_SLOW,
    golden_cross,
    macd,
    monthly_bars,
    obv,
)


def _prices(spark, closes, ticker="T", volumes=None, start=dt.date(2024, 1, 1)):
    volumes = volumes or [100.0] * len(closes)
    return spark.createDataFrame(
        [
            (ticker, start + dt.timedelta(days=i), c / 100.0, c / 100.0,
             c / 100.0, c / 100.0, float(v))
            for i, (c, v) in enumerate(zip(closes, volumes))
        ],
        "ticker string, date date, open double, high double, low double, "
        "close double, volume double",
    )


# ---------------------------------------------------------------------------
# monthly bars
# ---------------------------------------------------------------------------

def test_monthly_bars_first_open_last_close_extrema(spark):
    # Jan 30 + Jan 31 + Feb 1: month boundary splits the series
    df = spark.createDataFrame(
        [
            ("T", dt.date(2024, 1, 30), 10.0, 15.0, 9.0, 12.0, 5.0),
            ("T", dt.date(2024, 1, 31), 12.0, 20.0, 11.0, 18.0, 7.0),
            ("T", dt.date(2024, 2, 1), 18.0, 19.0, 17.0, 17.5, 3.0),
        ],
        "ticker string, date date, open double, high double, low double, "
        "close double, volume double",
    )
    out = {r.month.isoformat(): r for r in monthly_bars(df).collect()}
    jan = out["2024-01-01"]
    assert (jan.n_days, jan.open, jan.high, jan.low, jan.close) == (
        2, 10.0, 20.0, 9.0, 18.0,
    )
    assert jan.volume == 12
    feb = out["2024-02-01"]
    assert (feb.n_days, feb.open, feb.close) == (1, 18.0, 17.5)


# ---------------------------------------------------------------------------
# golden cross
# ---------------------------------------------------------------------------

def test_golden_cross_detects_both_crossings(spark):
    # flat warm-up long enough to fill the 200-day window, then a surge
    # (fast SMA rises above slow -> golden), then a crash (death)
    closes = [100] * (GC_SLOW + 10) + [200] * 30 + [50] * 60
    out = golden_cross(_prices(spark, closes)).collect()
    signals = [r.signal for r in out]
    assert "golden" in signals and "death" in signals
    # golden must come before death and diff signs must match labels
    assert signals.index("golden") < signals.index("death")
    for r in out:
        assert (r.signal == "golden") == (r.diff_c > 0)
        assert (r.signal == "death") == (r.diff_c < 0)


def test_golden_cross_needs_full_slow_window(spark):
    # fewer rows than GC_SLOW: no full window, no signals ever
    closes = [100] * 50 + [200] * 50
    assert golden_cross(_prices(spark, closes)).count() == 0


# ---------------------------------------------------------------------------
# OBV
# ---------------------------------------------------------------------------

def test_obv_signs_and_running_sum(spark):
    closes = [100, 110, 110, 90, 120]
    vols = [10, 20, 30, 40, 50]
    out = obv(_prices(spark, closes, volumes=vols)).collect()
    # day0: no prior -> 0; up +20; flat 0; down -40; up +50
    assert [r.signed_vol for r in out] == [0, 20, 0, -40, 50]
    assert [r.obv for r in out] == [0, 20, 20, -20, 30]


# ---------------------------------------------------------------------------
# MACD
# ---------------------------------------------------------------------------

def test_macd_matches_pure_python_fold(spark):
    closes = [100 + ((7 * i * i + 3 * i) % 157) for i in range(40)]
    out = macd(_prices(spark, closes)).collect()
    a12, a26, a9 = 2.0 / (MACD_FAST + 1), 2.0 / (MACD_SLOW + 1), 2.0 / (
        MACD_SIG + 1
    )
    e12 = e26 = sig = None
    expect = []
    for c in closes:
        x = float(c)
        e12 = x if e12 is None else e12 + a12 * (x - e12)
        e26 = x if e26 is None else e26 + a26 * (x - e26)
        m = e12 - e26
        sig = m if sig is None else sig + a9 * (m - sig)
        expect.append((m, sig, m - sig))
    assert len(out) == 40  # < MACD_TAIL_DAYS, so every row emitted
    for r, (m, s, h) in zip(out, expect):
        # bit-equal: the fold runs the identical IEEE op sequence
        assert r.macd_c == m and r.signal_c == s and r.hist_c == h


def test_macd_constant_series_is_all_zero(spark):
    out = macd(_prices(spark, [500] * 30)).collect()
    assert all(r.macd_c == 0.0 and r.signal_c == 0.0 and r.hist_c == 0.0
               for r in out)


# ---------------------------------------------------------------------------
# winnowing
# ---------------------------------------------------------------------------

def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_winnowing_guarantee_shared_substring_shares_fingerprint(spark):
    """The SIGMOD'03 guarantee: two docs sharing a substring of at least
    w + k - 1 chars must share at least one selected fingerprint."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.text import (
        WINNOW_K,
        WINNOW_W,
        winnowing,
    )

    shared = "zqxjvkwpbyfgmdhu"  # 16 >= w + k - 1 = 12, no repeats
    t1 = "aaaa " + shared + " bbbb"
    t2 = "cccccc " + shared + " dd"
    # recompute the selected fingerprint HASH SETS via the operator's
    # own checksum surface is too coarse — instead use density+checksum
    # on a 2-doc corpus where the only plausible overlap is `shared`
    out = {r.doc_id: r for r in winnowing(_docs(spark, [t1, t2])).collect()}
    assert out[0].n_kgrams == len(t1.lower()) - WINNOW_K + 1
    # direct set check via a tiny reimplementation in python
    import hashlib

    def fps(text):
        t = " ".join(text.lower().split())
        n = len(t)
        grams = [t] if n <= WINNOW_K else [
            t[i : i + WINNOW_K] for i in range(n - WINNOW_K + 1)
        ]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
        ]
        M = 1 << 21
        keys = [h * M + (M - 1 - p) for p, h in enumerate(hs)]
        sel = set()
        w = WINNOW_W
        for i in range(max(len(keys) - w, 0) + 1):
            sel.add(min(keys[i : i + w]))
        return {k_ // M for k_ in sel}

    assert fps(t1) & fps(t2), "guarantee broken in the reference model"
    # and the operator's checksum equals the reference model's sum over
    # selected keys' hashes for each doc
    for d, t in ((0, t1), (1, t2)):
        t_norm = " ".join(t.lower().split())
        n = len(t_norm)
        grams = [t_norm] if n <= WINNOW_K else [
            t_norm[i : i + WINNOW_K] for i in range(n - WINNOW_K + 1)
        ]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
        ]
        M = 1 << 21
        keys = [h * M + (M - 1 - p) for p, h in enumerate(hs)]
        sel = set()
        for i in range(max(len(keys) - WINNOW_W, 0) + 1):
            sel.add(min(keys[i : i + WINNOW_W]))
        assert out[d].n_fingerprints == len(sel)
        assert out[d].fp_checksum == sum(k_ // M for k_ in sel)


def test_winnowing_short_doc_single_window(spark):
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.text import (
        winnowing,
    )

    out = winnowing(_docs(spark, ["tiny"])).collect()[0]
    # shorter than k: one shingle (the whole text), one fingerprint
    assert out.n_kgrams == 1 and out.n_fingerprints == 1
    assert out.fp_min_hash == out.fp_max_hash == out.fp_checksum


def test_winnowing_density_near_two_over_w_plus_one(spark):
    """Expected density of winnowing on random-ish text is 2/(w+1); on
    a long non-repeating-ish doc it should land in a generous band."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.text import (
        WINNOW_W,
        winnowing,
    )

    import random

    rng = random.Random(7)
    text = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(2000))
    out = winnowing(_docs(spark, [text])).collect()[0]
    expected = 2.0 / (WINNOW_W + 1)
    assert expected * 0.6 <= out.fp_density <= expected * 1.6


# ---------------------------------------------------------------------------
# item-item Jaccard
# ---------------------------------------------------------------------------

def test_parts_jaccard_exact_overlap_math(spark, tmp_path):
    import os

    rows = []
    # parts 1,2 co-occur in 4 baskets; part 1 alone in 1; part 2 alone in 2
    for o in range(4):
        rows += [(o, 1), (o, 2)]
    rows += [(100, 1), (200, 2), (201, 2)]
    # a sub-threshold pair (co=2 < 3) must not appear
    rows += [(300, 7), (300, 8), (301, 7), (301, 8)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    d = str(tmp_path / "sf")
    os.makedirs(d)
    df.write.parquet(os.path.join(d, "lineitem.parquet"))
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.relational_ext import (
        parts_jaccard_similarity,
    )

    out = parts_jaccard_similarity(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.part_a, r.part_b, r.co, r.n_a, r.n_b) == (1, 2, 4, 5, 6)
    assert r.jaccard == pytest.approx(4 / (5 + 6 - 4))


# ---------------------------------------------------------------------------
# CUSUM changepoint
# ---------------------------------------------------------------------------

def test_cusum_prefix_identity_matches_direct_fold(spark, tmp_path):
    """The window formulation (P - min(0, running min P)) must equal the
    textbook recursion max(0, S + d) — both sides, on a series with a
    deliberate level shift."""
    import os

    import datetime as dt

    counts = [10] * 24 + [25] * 12 + [10] * 12  # shift up, then back
    rows = []
    eid = 0
    for h, c in enumerate(counts):
        ts = dt.datetime(2024, 3, 1) + dt.timedelta(hours=h)
        for _ in range(c):
            rows.append((eid, ts, 1, "click", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    df.write.parquet(os.path.join(d, "events.parquet"))
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        events_cusum,
    )

    out = events_cusum(spark, d).collect()
    n_hours = len(counts)
    total = sum(counts)
    s_up = s_dn = 0
    for r, c in zip(out, counts):
        d_ = n_hours * c - total
        s_up = max(0, s_up + d_)
        s_dn = max(0, s_dn - d_)
        assert (r.cusum_up, r.cusum_down) == (s_up, s_dn)
        assert r.flag_up == (s_up > total) and r.flag_down == (s_dn > total)
    # the level shift must actually trip the up-flag at least once
    assert any(r.flag_up for r in out)


# ---------------------------------------------------------------------------
# conversion-lag distributed selection: bucket-boundary edges
# ---------------------------------------------------------------------------

def _write_events(spark, tmp_path, rows):
    import os

    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


def test_conversion_lag_identical_lags_single_bucket(spark, tmp_path):
    """All converters share one lag: hi == lo collapses the range to a
    single bucket — every quantile must be that exact value."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(7):
        rows.append((eid, base, u, "view", 1.0, "{}")); eid += 1
        rows.append((eid, base + dt.timedelta(seconds=42), u, "purchase",
                     1.0, "{}")); eid += 1
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.queries import (
        events_conversion_lag,
    )

    r = events_conversion_lag(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()[0]
    assert (r.n_converters, r.min_lag_s, r.p50_lag_s, r.p90_lag_s,
            r.max_lag_s) == (7, 42, 42, 42, 42)


def test_conversion_lag_extreme_spread_sparse_buckets(spark, tmp_path):
    """Two clusters a million seconds apart: nearly every range bucket
    is empty; rank targeting must still land on exact order
    statistics."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    lags = [0, 1, 2, 1_000_000, 1_000_001]
    for u, lag in enumerate(lags):
        rows.append((eid, base, u, "view", 1.0, "{}")); eid += 1
        rows.append((eid, base + dt.timedelta(seconds=lag), u, "purchase",
                     1.0, "{}")); eid += 1
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.queries import (
        events_conversion_lag,
    )

    r = events_conversion_lag(
        spark, _write_events(spark, tmp_path, rows)
    ).collect()[0]
    # n=5: p50 rank ceil(2.5)=3 -> 2; p90 rank ceil(4.5)=5 -> 1000001
    assert (r.n_converters, r.min_lag_s, r.p50_lag_s, r.p90_lag_s,
            r.max_lag_s) == (5, 0, 2, 1_000_001, 1_000_001)


# ---------------------------------------------------------------------------
# open-order backlog (difference-array interval stabbing)
# ---------------------------------------------------------------------------

def test_open_backlog_matches_naive_interval_count(spark, tmp_path):
    import os

    import datetime as dt

    base = dt.date(2024, 1, 1)
    # (orderkey, open_off, [line ship offsets])
    orders = [
        (1, 0, [2, 5]),     # open days 0..4
        (2, 1, [1]),        # opens and fully ships day 1: never open
        (3, 3, [4, 9]),     # open days 3..8
        (4, 5, [6]),        # open day 5
    ]
    o_rows = [(k, base + dt.timedelta(days=o)) for k, o, _ in orders]
    l_rows = [
        (k, base + dt.timedelta(days=s))
        for k, _, ships in orders
        for s in ships
    ]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(o_rows, "o_orderkey long, o_orderdate date").write.parquet(
        os.path.join(d, "orders.parquet")
    )
    spark.createDataFrame(l_rows, "l_orderkey long, l_shipdate date").write.parquet(
        os.path.join(d, "lineitem.parquet")
    )
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.relational_ext import (
        orders_open_backlog,
    )

    got = {
        (r.date - base).days: (r.n_open, r.open_lines)
        for r in orders_open_backlog(spark, d).collect()
    }
    # naive recompute over every day in range
    for day in range(0, 11):
        n = sum(1 for _, o, ships in orders if o <= day < max(ships))
        ln = sum(
            len(ships) for _, o, ships in orders if o <= day < max(ships)
        )
        if day in got:
            assert got[day] == (n, ln)
        else:
            # days absent from the delta table must not change the
            # running value: same as the previous emitted day
            prev = max((k for k in got if k < day), default=None)
            assert (n, ln) == (got[prev] if prev is not None else (0, 0))


def test_cusum_incremental_state_carry_across_chunks(spark, tmp_path):
    """The 3-int state must carry correctly: a level shift in the LAST
    chunk is judged against extrema accumulated in earlier chunks, and
    the whole fold equals a direct Python recursion with fixed mu0."""
    import os

    import datetime as dt

    # 7 training days at 10/hour, then 12 monitored days: quiet, then a
    # surge confined to the final days (the last fold commit)
    rows, eid = [], 0
    base = dt.datetime(2024, 3, 1)
    for day in range(19):
        rate = 10 if day < 15 else 30
        for h in range(4):  # 4 observed hours per day
            ts = base + dt.timedelta(days=day, hours=h)
            for _ in range(rate):
                rows.append((eid, ts, 1, "click", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    df.write.parquet(os.path.join(d, "events.parquet"))
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        CUSUM_TRAIN_DAYS,
        events_cusum_incremental,
    )

    out = events_cusum_incremental(spark, d).collect()
    # reference: fixed mu0 from the 7 training days (28 hours x 10)
    n_train, total_train = 28, 280
    mon_counts = [
        10 if day < 15 else 30
        for day in range(CUSUM_TRAIN_DAYS, 19)
        for _ in range(4)
    ]
    assert len(out) == len(mon_counts)
    s_up = s_dn = 0
    for r, c in zip(out, mon_counts):
        dd = n_train * c - total_train
        s_up = max(0, s_up + dd)
        s_dn = max(0, s_dn - dd)
        assert (r.cusum_up, r.cusum_down) == (s_up, s_dn), r
    assert any(r.flag_up for r in out)  # the surge trips the monitor


def test_cusum_incremental_type_gap_resumes_not_restarts(spark, tmp_path):
    """A type with NO monitored hours in an intermediate fold commit
    must RESUME its CUSUM from carried state when it reappears, never
    restart from zero — the merge-don't-replace state contract. 'click'
    fires every day (so every chunk exists); 'buy' skips the second
    chunk entirely, then returns at a surge rate whose flag depends on
    the pre-gap accumulated extrema."""
    import os

    import datetime as dt

    rows, eid = [], 0
    base = dt.datetime(2024, 3, 1)
    for day in range(19):
        for h in range(4):  # 4 observed hours per day
            ts = base + dt.timedelta(days=day, hours=h)
            for _ in range(10):
                rows.append((eid, ts, 1, "click", 1.0, "{}")); eid += 1
            # buy: trains days 0-6, monitored days 7-9, GAP days 10-12
            # (exactly the second of the four 3-day chunks), back 13+
            if day < 10 or day >= 13:
                buy_rate = 5 if day < 15 else 20
                for _ in range(buy_rate):
                    rows.append((eid, ts, 1, "buy", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    df.write.parquet(os.path.join(d, "events.parquet"))
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        events_cusum_incremental,
    )

    buy = [
        r
        for r in events_cusum_incremental(spark, d).collect()
        if r.event_type == "buy"
    ]
    # reference recursion: fixed mu0 from 28 training hours x 5/hour
    n_train, total_train = 28, 140
    mon_counts = [
        (5 if day < 15 else 20)
        for day in range(7, 19)
        if day < 10 or day >= 13
        for _ in range(4)
    ]
    assert len(buy) == len(mon_counts)
    s_up = s_dn = 0
    for r, c in zip(buy, mon_counts):
        dd = n_train * c - total_train
        s_up = max(0, s_up + dd)
        s_dn = max(0, s_dn - dd)
        assert (r.cusum_up, r.cusum_down) == (s_up, s_dn), r
    assert any(r.flag_up for r in buy)  # the post-gap surge still trips


def test_purchase_cadence_gaps_and_single_order_nulls(spark, tmp_path):
    import os

    import datetime as dt

    base = dt.date(2024, 1, 1)
    rows = [
        # customer 1: orders at days 0, 10, 12, 40 -> gaps [2, 10, 28]
        (1, base), (1, base + dt.timedelta(10)),
        (1, base + dt.timedelta(12)), (1, base + dt.timedelta(40)),
        # customer 2: one order -> all gap stats NULL
        (2, base + dt.timedelta(5)),
        # customer 3: same-day repeat -> gap 0
        (3, base), (3, base),
    ]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(rows, "o_custkey long, o_orderdate date").write.parquet(
        os.path.join(d, "orders.parquet")
    )
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.relational_ext import (
        customer_purchase_cadence,
    )

    out = {r.custkey: r for r in customer_purchase_cadence(spark, d).collect()}
    c1 = out[1]
    assert c1.n_orders == 4
    assert (c1.avg_gap_days, c1.median_gap_days, c1.max_gap_days) == (
        40 / 3, 10, 28,  # median of [2, 10, 28] at rank ceil(3/2)=2
    )
    c2 = out[2]
    assert (c2.avg_gap_days, c2.median_gap_days, c2.max_gap_days) == (
        None, None, None,
    )
    assert (out[3].median_gap_days, out[3].max_gap_days) == (0, 0)


# ---------------------------------------------------------------------------
# power iteration
# ---------------------------------------------------------------------------

def test_power_iteration_finds_planted_direction(spark, tmp_path):
    """A corpus with variance concentrated on dimension 3 must rank the
    vectors by |component 3| and put the direction's mass there."""
    import os

    import random

    rng = random.Random(11)
    rows = []
    for i in range(60):
        v = [rng.uniform(-0.02, 0.02) for _ in range(64)]
        v[3] = rng.choice([-1.0, 1.0]) * (0.5 + 0.5 * rng.random())
        rows.append((i, v))
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(rows, "vec_id long, embedding array<double>").write.parquet(
        os.path.join(d, "embeddings.parquet")
    )
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.similarity import (
        power_iteration_scores,
    )

    out = power_iteration_scores(spark, d).collect()
    assert len(out) == 20
    assert [r.rank for r in out] == list(range(1, 21))
    # scores must be sorted by |score| and dominated by the planted dim:
    # the top-ranked vector has the largest |component 3|
    mags = [abs(r.score) for r in out]
    assert mags == sorted(mags, reverse=True)
    comp3 = {i: abs(v[3]) for i, v in rows}
    top_ids = [r.vec_id for r in out[:5]]
    best5 = sorted(comp3, key=lambda i: -comp3[i])[:5]
    assert set(top_ids) == set(best5)


def test_var_cvar_exact_tail_statistics(spark):
    # 20 change days: closes step so changes are known exactly
    closes = [1000]
    deltas = [-50, -40, -30, -20, -10, 0, 10, 20, 30, 40,
              -45, -35, -25, -15, -5, 5, 15, 25, 35, 45]
    for d in deltas:
        closes.append(closes[-1] + d)
    out = {
        r.ticker: r
        for r in __import__(
            "airflow_iceberg_pipeline_stock_tracker_spark.operators.finance",
            fromlist=["var_cvar"],
        ).var_cvar(_prices(spark, closes)).collect()
    }
    r = out["T"]
    assert r.n_days == 20
    s = sorted(deltas)
    # 95%: rank ceil(20*0.05)=1 -> worst day; CVaR = that value
    assert r.var95_c == s[0] == -50
    assert r.cvar95_c == float(s[0])
    # 99%: rank ceil(20*0.01)=1 as well at n=20
    assert r.var99_c == s[0]


def test_var_cvar_rank_boundary_multiple_of_twenty(spark):
    """n = 40 puts 95% exactly on rank 2 (40*0.05 = 2.0): the double
    path must agree with itself across engines — ceil lands on 2, and
    CVaR averages the two worst days."""
    deltas = list(range(-200, 200, 10))  # 40 changes, all distinct
    closes = [10000]
    for d in deltas:
        closes.append(closes[-1] + d)
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.finance import (
        var_cvar,
    )

    r = var_cvar(_prices(spark, closes)).collect()[0]
    s = sorted(deltas)
    assert r.n_days == 40
    assert r.var95_c == s[1]
    assert r.cvar95_c == (s[0] + s[1]) / 2


# ---------------------------------------------------------------------------
# growth accounting
# ---------------------------------------------------------------------------

def test_growth_accounting_states_and_churn(spark, tmp_path):
    import os

    import datetime as dt

    monday = dt.datetime(2024, 3, 4)  # a Monday
    wk = lambda i: monday + dt.timedelta(weeks=i)  # noqa: E731

    def ev(eid, user, when):
        return (eid, when, user, "view", 1.0, "{}")

    rows = [
        # user 1: weeks 0,1 (new, retained), churns at week 2
        ev(1, 1, wk(0)), ev(2, 1, wk(1)),
        # user 2: weeks 0, 2 (new, resurrected), churn at 1 AND at 3
        ev(3, 2, wk(0)), ev(4, 2, wk(2)),
        # user 3: only week 2 (new), churn at 3
        ev(5, 3, wk(2) + dt.timedelta(days=3)),
    ]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(d, "events.parquet"))
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        events_growth_accounting,
    )

    out = {
        (r.week - monday.date()).days // 7: (
            r.n_new, r.n_retained, r.n_resurrected, r.n_churned
        )
        for r in events_growth_accounting(spark, d).collect()
    }
    assert out[0] == (2, 0, 0, 0)       # users 1, 2 new
    assert out[1] == (0, 1, 0, 1)       # user 1 retained; user 2 churned
    assert out[2] == (1, 0, 1, 1)       # user 3 new; user 2 back; user 1 gone
    assert out[3] == (0, 0, 0, 2)       # users 2 and 3 churn past the end


# ---------------------------------------------------------------------------
# source drift
# ---------------------------------------------------------------------------

def test_source_drift_identical_zero_disjoint_positive(spark):
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.dedup import (
        source_drift,
    )

    texts_x = [f"alpha beta gamma delta doc {i}" for i in range(6)]
    texts_y = [f"omega zeta theta lambda item {i}" for i in range(6)]
    rows = []
    did = 0
    for t in texts_x:
        rows.append((did, t, "A")); did += 1
    for t in texts_x:  # B is a byte-identical copy of A
        rows.append((did, t, "B")); did += 1
    for t in texts_y:  # C is entirely different content
        rows.append((did, t, "C")); did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r.source_a, r.source_b): r for r in source_drift(docs).collect()}
    assert out[("A", "B")].drift == 0.0  # identical corpora: no drift
    assert out[("A", "B")].l1_scaled == 0
    assert out[("A", "C")].drift > 0.0
    assert out[("B", "C")].drift == out[("A", "C")].drift
    # bounded in [0, 1]
    assert all(0.0 <= r.drift <= 1.0 for r in out.values())


# ---------------------------------------------------------------------------
# winnowing pair mining (r11)
# ---------------------------------------------------------------------------

def test_winnowing_pairs_near_dups_share_fingerprints(spark):
    """The guarantee put to USE: two docs sharing a long substring must
    surface as a candidate pair with n_shared >= the min, and the
    resemblance is exactly n_shared / (n_a + n_b - n_shared)."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators import dedup

    shared = "the quick brown fox jumps over the lazy dog again and again"
    t1 = "intro one " + shared + " outro alpha"
    t2 = "different prefix " + shared + " zz"
    t3 = "completely unrelated text about weather patterns in spring"
    out = dedup.winnowing_pairs(_docs(spark, [t1, t2, t3])).collect()
    pairs = {(r.doc_a, r.doc_b): r for r in out}
    assert (0, 1) in pairs
    r = pairs[(0, 1)]
    assert r.n_shared >= dedup.WINNOW_PAIR_MIN_SHARED
    assert r.n_shared <= min(r.n_a, r.n_b)
    assert r.resemblance == r.n_shared / (r.n_a + r.n_b - r.n_shared)
    # the unrelated doc pairs with nobody
    assert not any(2 in (a, b) for a, b in pairs)


def test_winnowing_pairs_bucket_cap_drops_hot_fingerprints(spark):
    """Exact duplicates share ALL fingerprints (resemblance 1.0); with
    the cap below the duplicate-group size every posting bucket is hot
    and the quadratic expansion is suppressed entirely. The cap is the
    explicit parameter (r12: bench's cap-sensitivity sweep varies it on
    the 10x corpus), so exercise it the way callers do."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators import dedup

    dup = "exactly the same boilerplate text shared by every copy here"
    out = dedup.winnowing_pairs(_docs(spark, [dup, dup, dup])).collect()
    assert len(out) == 3  # C(3,2)
    assert all(
        r.resemblance == 1.0 and r.n_shared == r.n_a == r.n_b for r in out
    )
    out2 = dedup.winnowing_pairs(_docs(spark, [dup, dup, dup]), cap=2).collect()
    assert out2 == []  # bucket size 3 > cap 2 on every fingerprint
