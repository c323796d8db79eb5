"""Round-13 wave-9 operators: pairwise mutual-information DQ profiling
and the rolling-origin forecast backtest.

Reference scope: extension tier — the reference DAG's DQ checks are
row predicates (/root/reference/dags/dag.py); MI is the column-
DEPENDENCE screen, and the backtest is the harness that grades any
forecaster against naive baselines before it ships.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_iceberg_pipeline_stock_tracker_spark.plans.relational_ext import (  # noqa: E402
    dq_mutual_information,
)
from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (  # noqa: E402
    forecast_backtest_df,
)
from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import load_table  # noqa: E402


# ---------------------------------------------------------------------------
# dq_mutual_information
# ---------------------------------------------------------------------------


def _python_mi(pairs):
    """Textbook MI from raw (x, y) samples."""
    n = len(pairs)
    cx, cy, cxy = Counter(), Counter(), Counter()
    for x, y in pairs:
        cx[x] += 1
        cy[y] += 1
        cxy[(x, y)] += 1

    def h(counter):
        return math.log(n) - sum(c * math.log(c) for c in counter.values()) / n

    return h(cx), h(cy), h(cxy)


def test_mi_matches_python_recompute(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").collect()
    samples = {
        "returnflag_linestatus": [
            (r.l_returnflag, r.l_linestatus) for r in li
        ],
        "returnflag_shipyear": [
            (r.l_returnflag, str(r.l_shipdate.year)) for r in li
        ],
        "qtybucket_linestatus": [
            (str(int(math.floor(r.l_quantity / 10))), r.l_linestatus)
            for r in li
        ],
    }
    rows = {r.pair: r for r in dq_mutual_information(spark, sf_dir).collect()}
    assert set(rows) == set(samples)
    for pair, data in samples.items():
        hx, hy, hxy = _python_mi(data)
        r = rows[pair]
        assert r.n == len(data)
        assert abs(r.h_x - hx) < 1e-9
        assert abs(r.h_y - hy) < 1e-9
        assert abs(r.h_xy - hxy) < 1e-9
        # mi is a cancellation of ~1 values down to ~1e-7: compare
        # ABSOLUTE (the operator's own claim is bit-stability, proven
        # by the oracle hash; python float order differs)
        assert abs(r.mi - (hx + hy - hxy)) < 1e-9


def test_mi_information_inequalities(spark, sf_dir):
    for r in dq_mutual_information(spark, sf_dir).collect():
        # 0 <= MI <= min(H); H(XY) between max(H) and H(X)+H(Y)
        assert r.mi >= -1e-9, r
        assert r.mi <= min(r.h_x, r.h_y) + 1e-9, r
        assert r.h_xy >= max(r.h_x, r.h_y) - 1e-9, r
        assert r.h_xy <= r.h_x + r.h_y + 1e-9, r


def test_mi_is_run_to_run_deterministic(spark, sf_dir):
    a = [tuple(r) for r in dq_mutual_information(spark, sf_dir).collect()]
    b = [tuple(r) for r in dq_mutual_information(spark, sf_dir).collect()]
    assert a == b  # bit-equal floats: the pinned-fold claim


# ---------------------------------------------------------------------------
# events_forecast_backtest
# ---------------------------------------------------------------------------


def test_backtest_matches_python_recompute(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = defaultdict(Counter)
    for r in ev.select("event_type", "ts").collect():
        daily[r.event_type][r.ts.date()] += 1
    lo = min(d for c in daily.values() for d in c)
    hi = max(d for c in daily.values() for d in c)
    want = {}
    for typ, counts in daily.items():
        days = [(lo + dt.timedelta(days=i)) for i in range((hi - lo).days + 1)]
        y = [counts.get(d, 0) for d in days]
        per_model = {"seasonal_naive": [], "trailing_mean": []}
        for i, d in enumerate(days):
            if d <= hi - dt.timedelta(days=7) or i < 7 or y[i] <= 0:
                continue
            per_model["seasonal_naive"].append((float(y[i - 7]), y[i]))
            per_model["trailing_mean"].append(
                (sum(y[i - 7 : i]) / 7.0, y[i])
            )
        for model, obs in per_model.items():
            if obs:
                mae = sum(abs(f - a) for f, a in obs) / len(obs)
                mape = sum(abs(f - a) / a for f, a in obs) / len(obs)
                want[(typ, model)] = (len(obs), mae, mape)
    got = {
        (r.event_type, r.model): (r.n_eval, r.mae, r.mape)
        for r in forecast_backtest_df(ev).collect()
    }
    assert set(got) == set(want)
    for k, (n, mae, mape) in want.items():
        gn, gmae, gmape = got[k]
        assert gn == n, k
        assert abs(gmae - mae) < 1e-9, k
        assert abs(gmape - mape) < 1e-9, k


def test_backtest_seasonal_naive_is_perfect_on_weekly_cycle(spark):
    """Events with an exact weekly pattern: seasonal_naive has zero
    error on every eval day; trailing_mean does not (the cycle is not
    flat) — the harness must tell them apart."""
    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    for day in range(28):
        n = 1 + (day % 7)  # weekly cycle 1..7
        for k in range(n):
            rows.append((eid, base + dt.timedelta(days=day, hours=k), 1, "a", 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {r.model: r for r in forecast_backtest_df(ev).collect()}
    assert got["seasonal_naive"].mape == 0.0
    assert got["seasonal_naive"].mae == 0.0
    assert got["trailing_mean"].mape > 0.1
    assert got["seasonal_naive"].n_eval == 7


def test_backtest_zero_actual_days_are_skipped(spark):
    """A type silent on an eval day contributes no MAPE row for it."""
    rows = []
    eid = 0
    base = dt.datetime(2024, 3, 1)
    for day in range(21):
        if day >= 14 and day % 2 == 0:
            continue  # silent on even days of the eval window
        rows.append((eid, base + dt.timedelta(days=day), 7, "b", 1.0, "{}"))
        eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = forecast_backtest_df(ev).collect()
    assert out
    for r in out:
        # eval days: last 7 calendar days = days 14..20; actual>0 only
        # on odd days -> at most 4 scored rows (15, 17, 19) plus day
        # boundaries; never the full 7
        assert r.n_eval < 7
