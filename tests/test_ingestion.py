"""Ingestion source — decimal casting, first-bar-only, per-ticker error
swallowing (/root/reference/dags/dag.py:68-112)."""

from __future__ import annotations

import decimal

import json

from airflow_iceberg_pipeline_stock_tracker_spark.sources.stock_api import (
    DeterministicBarClient,
    PolygonBarClient,
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


def _polygon_payload(n_results: int) -> str:
    return json.dumps(
        {
            "status": "OK",
            "results": [
                {
                    "o": 100.0 + i,
                    "h": 110.0 + i,
                    "l": 95.0 + i,
                    "c": 105.0 + i,
                    "v": 1_000_000 + i,
                    "vw": 104.5 + i,
                    "t": 1704844800000 + i,
                    "n": 50_000 + i,
                }
                for i in range(n_results)
            ],
        }
    )


def test_polygon_client_parses_aggs_offline():
    """Mocked transport: field mapping, URL shape, and api-key plumbing."""
    seen_urls: list[str] = []

    def fake_get(url: str) -> str:
        seen_urls.append(url)
        return _polygon_payload(3)

    client = PolygonBarClient(api_key="testkey", http_get=fake_get)
    bars = list(client.list_aggs("AAPL", "2024-01-10"))
    assert len(bars) == 3
    first = bars[0]
    assert (first.ticker, first.open, first.high, first.low, first.close) == (
        "AAPL", 100.0, 110.0, 95.0, 105.0,
    )
    assert first.vwap == 104.5 and first.transactions == 50_000
    assert first.timestamp == 1704844800000
    assert first.date.isoformat() == "2024-01-10"
    (url,) = seen_urls
    assert "/v2/aggs/ticker/AAPL/range/1/day/2024-01-10/2024-01-10" in url
    assert "limit=5" in url and "apiKey=testkey" in url


def test_polygon_client_first_bar_break():
    """fetch_bars must take only the FIRST agg per ticker (reference's
    limit=5-then-break loop, dag.py:94-109)."""
    client = PolygonBarClient(api_key="k", http_get=lambda url: _polygon_payload(5))
    bars = fetch_bars(client, "2024-01-10", tickers=["AAPL", "MSFT"])
    assert [b.ticker for b in bars] == ["AAPL", "MSFT"]
    assert all(b.open == 100.0 for b in bars)  # first result each


def test_polygon_client_errors_swallowed_per_ticker():
    """A transport failure for one ticker must not poison the batch."""

    def flaky_get(url: str) -> str:
        if "MSFT" in url:
            raise ConnectionError("simulated HTTP 500")
        return _polygon_payload(1)

    client = PolygonBarClient(api_key="k", http_get=flaky_get)
    bars = fetch_bars(client, "2024-01-10", tickers=["AAPL", "MSFT", "NFLX"])
    assert [b.ticker for b in bars] == ["AAPL", "NFLX"]


def test_polygon_client_empty_results():
    """Market holiday: results absent -> zero bars, no error."""
    client = PolygonBarClient(
        api_key="k", http_get=lambda url: json.dumps({"status": "OK"})
    )
    assert fetch_bars(client, "2024-01-01", tickers=["AAPL"]) == []


def test_bar_invariants():
    for ds in ["2024-01-10", "2024-03-05", "2025-12-31"]:
        for bar in fetch_bars(DeterministicBarClient(), ds):
            assert bar.low <= bar.open <= bar.high
            assert bar.low <= bar.close <= bar.high
            assert bar.volume > 0
