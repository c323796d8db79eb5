"""OHLC bars / funnel / retention semantics on hand-built fixtures."""
from __future__ import annotations

from datetime import datetime

from airflow_iceberg_pipeline_stock_tracker_spark.operators import analytics


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )


def test_ohlc_open_close_tie_broken_by_event_id(spark):
    # two events at the identical timestamp: event_id orders them
    ev = _events(spark, [
        (2, _ts("2024-01-01 10:00:00"), 1, "click", 20.0),
        (1, _ts("2024-01-01 10:00:00"), 1, "click", 10.0),
        (3, _ts("2024-01-01 10:59:00"), 1, "click", 5.0),
        (4, _ts("2024-01-01 11:00:00"), 1, "click", 7.0),  # next bar
    ])
    bars = {r.bar_start: r for r in analytics.ohlc_bars(ev).collect()}
    b = bars["2024-01-01 10:00:00"]
    assert (b.open, b.high, b.low, b.close, b.volume) == (10.0, 20.0, 5.0, 5.0, 3)
    assert bars["2024-01-01 11:00:00"].open == 7.0


def test_funnel_requires_stage_order(spark):
    ev = _events(spark, [
        # user 1: full ordered funnel; click at the same instant as
        # signup counts (>= is inclusive)
        (1, _ts("2024-01-01 09:00:00"), 1, "signup", 0.0),
        (2, _ts("2024-01-01 09:00:00"), 1, "click", 0.0),
        (3, _ts("2024-01-01 10:00:00"), 1, "purchase", 9.0),
        # user 2: purchase BEFORE the first post-signup click -> stage 2
        (4, _ts("2024-01-01 09:00:00"), 2, "signup", 0.0),
        (5, _ts("2024-01-01 09:30:00"), 2, "purchase", 5.0),
        (6, _ts("2024-01-01 10:00:00"), 2, "click", 0.0),
        # user 3: no signup at all -> stage 0 even though they click
        (7, _ts("2024-01-01 09:00:00"), 3, "click", 0.0),
    ])
    out = {r.user_id: r for r in analytics.funnel(ev).collect()}
    assert out[1].stage_reached == 3
    assert out[1].click_ts == "2024-01-01 09:00:00"
    assert out[2].stage_reached == 2
    assert out[2].purchase_ts is None
    assert out[3].stage_reached == 0
    assert out[3].signup_ts is None


def test_rollup_composition_equals_direct_daily(spark, sf_dir):
    """rollup_bars(hourly) must equal ohlc_bars(events, '1 day') row for
    row — the associativity claim behind the continuous-aggregate
    pattern, checked on the real fixture."""
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    direct = analytics.ohlc_bars(ev, "1 day").collect()
    composed = analytics.rollup_bars(analytics.ohlc_bars(ev, "1 hour")).collect()
    assert [tuple(r) for r in direct] == [tuple(r) for r in composed]


def test_retention_offsets(spark):
    # user 1 first seen day 0, active again day 15 (week offset 2);
    # user 2 joins day 7 (cohort week 1), never returns
    ev = _events(spark, [
        (1, _ts("1970-01-01 12:00:00"), 1, "click", 0.0),
        (2, _ts("1970-01-16 12:00:00"), 1, "click", 0.0),
        (3, _ts("1970-01-08 12:00:00"), 2, "click", 0.0),
    ])
    rows = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in analytics.retention_cohorts(ev).collect()
    }
    assert rows == {(0, 0): 1, (0, 2): 1, (1, 0): 1}


def test_rolling_distinct_set_semantics(spark, tmp_path):
    """Repeat visits inside the frame must count once; events outside
    the 24h range must age out."""
    import datetime as dt

    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        events_rolling_distinct,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (0, t0, 1, "click", 1.0, "{}"),
        (1, t0 + dt.timedelta(hours=1), 1, "click", 1.0, "{}"),   # same user
        (2, t0 + dt.timedelta(hours=2), 2, "click", 1.0, "{}"),   # new user
        (3, t0 + dt.timedelta(hours=30), 3, "click", 1.0, "{}"),  # all aged out
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = tmp_path / "events.parquet"
    ev.write.parquet(str(d))
    import shutil, os
    # events_rolling_distinct loads <sf_dir>/events.parquet
    got = {
        r.event_id: r.n_users_24h
        for r in events_rolling_distinct(spark, str(tmp_path)).collect()
    }
    assert got == {0: 1, 1: 1, 2: 2, 3: 1}
