"""Ingestion source — decimal casting, first-bar-only, per-ticker error
swallowing (/root/reference/dags/dag.py:68-112)."""

from __future__ import annotations

import decimal

from airflow_iceberg_pipeline_stock_tracker_spark.sources.stock_api import (
    DeterministicBarClient,
    bars_to_df,
    fetch_bars,
)


def test_fetch_is_deterministic():
    c = DeterministicBarClient()
    a = fetch_bars(c, "2024-01-10")
    b = fetch_bars(c, "2024-01-10")
    assert [x.__dict__ for x in a] == [x.__dict__ for x in b]
    assert len(a) == 5  # one bar per reference ticker


def test_errors_swallowed_per_ticker():
    c = DeterministicBarClient(fail_tickers=frozenset({"AMZN", "META"}))
    bars = fetch_bars(c, "2024-01-10")
    assert {b.ticker for b in bars} == {"AAPL", "NFLX", "GOOGL"}


def test_decimal_cast(spark):
    bars = fetch_bars(DeterministicBarClient(), "2024-01-10")
    df = bars_to_df(spark, bars)
    row = df.where("ticker = 'AAPL'").collect()[0]
    assert isinstance(row.open, decimal.Decimal)
    assert abs(float(row.open) - bars[0].open) < 0.005  # HALF_UP to 2 places
    assert df.schema["open"].dataType.simpleString() == "decimal(10,2)"
    assert df.schema["volume"].dataType.simpleString() == "bigint"
    assert row.insertion_timestamp is not None


def test_bar_invariants():
    for ds in ["2024-01-10", "2024-03-05", "2025-12-31"]:
        for bar in fetch_bars(DeterministicBarClient(), ds):
            assert bar.low <= bar.open <= bar.high
            assert bar.low <= bar.close <= bar.high
            assert bar.volume > 0
