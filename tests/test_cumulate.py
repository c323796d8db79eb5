"""Cumulate window semantics — frame shrink, stddev NULL→COALESCE, array
order, post-window ds filter (/root/reference/dags/dag.py:385-437)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from airflow_iceberg_pipeline_stock_tracker_spark.operators.cumulate import cumulate

SCHEMA = T.StructType(
    [
        T.StructField("ticker", T.StringType()),
        T.StructField("date", T.DateType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.LongType()),
    ]
)


def _prices(spark, days=10, tickers=("AAPL", "META")):
    start = dt.date(2024, 1, 1)
    rows = []
    for t in tickers:
        for i in range(days):
            d = start + dt.timedelta(days=i)
            px = 100.0 + i + (0.0 if t == "AAPL" else 50.0)
            rows.append((t, d, px, px + 2, px - 1, px + 1, 1000 + i))
    return spark.createDataFrame(rows, SCHEMA)


def test_frame_shrinks_for_early_days(spark):
    out = cumulate(_prices(spark)).collect()
    by_key = {(r.ticker, r.date): r for r in out}
    first = by_key[("AAPL", dt.date(2024, 1, 1))]
    assert len(first.last_7_days_close) == 1  # "or fewer for first days"
    fourth = by_key[("AAPL", dt.date(2024, 1, 4))]
    assert len(fourth.last_7_days_close) == 4
    eighth = by_key[("AAPL", dt.date(2024, 1, 8))]
    assert len(eighth.last_7_days_close) == 7  # capped at the 7-row frame


def test_single_row_frame_volatility_is_zero(spark):
    out = cumulate(_prices(spark)).collect()
    first = next(r for r in out if r.date == dt.date(2024, 1, 1))
    assert first.volatility_7_day == 0.0  # STDDEV 1-row frame NULL -> COALESCE 0


def test_array_order_is_date_ascending(spark):
    out = cumulate(_prices(spark)).collect()
    r = next(
        r for r in out if r.ticker == "AAPL" and r.date == dt.date(2024, 1, 10)
    )
    assert r.last_7_days_close == sorted(r.last_7_days_close)
    assert r.last_7_days_close[-1] == 110.0  # current row is last in frame


def test_ds_filter_applied_after_window(spark):
    ds = "2024-01-10"
    out = cumulate(_prices(spark), ds=ds).collect()
    assert {r.date for r in out} == {dt.date(2024, 1, 10)}
    r = next(r for r in out if r.ticker == "AAPL")
    # the frame still saw the 7 preceding days that the final filter removed
    assert len(r.last_7_days_close) == 7


def test_ds_slice_excludes_older_history(spark):
    # input restricted to (ds-7, ds]: day 1 must not appear in day 10's frame
    out = cumulate(_prices(spark, days=10), ds="2024-01-10").collect()
    r = next(r for r in out if r.ticker == "AAPL")
    assert 101.0 + 1 not in r.last_7_days_close  # close of 2024-01-02 == 103


def test_avg_volume(spark):
    out = cumulate(_prices(spark), ds="2024-01-10").collect()
    r = next(r for r in out if r.ticker == "AAPL")
    # volumes 1003..1009 -> avg 1006
    assert r.avg_7_day_volume == 1006.0
