"""Stock-bar ingestion source (reference: ``/root/reference/dags/dag.py:68-112``).

The reference calls the Polygon/Massive REST API per ticker
(`RESTClient(...).list_aggs(ticker, 1, "day", ds, ds, limit=5)`), takes the
first bar, and emits one `INSERT INTO ... VALUES` round-trip per row.

Spark-native re-expression:
  * the HTTP client sits behind a `BarClient` protocol so tests (and this
    offline container) use `DeterministicBarClient`;
  * per-ticker failures are swallowed with a log line and the loop
    continues, matching the reference's try/except-per-ticker contract
    (dag.py:110-112);
  * the collected bars become ONE `spark.createDataFrame` + ONE batched
    sink append — not a round-trip per row. Row-at-a-time INSERT is the
    reference's anti-pattern (SURVEY §4); at any real scale ingestion
    must be a single atomic batch commit.
  * API floats are cast to the reference's DECIMAL types at this boundary
    (explicit HALF_UP cast, SURVEY §2.6 F7).
"""

from __future__ import annotations

import datetime as dt
import hashlib
from dataclasses import dataclass
from typing import Iterable, Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import API_BAR_SCHEMA, DEC_PRICE, REFERENCE_TICKERS


@dataclass
class Bar:
    """One daily OHLCV aggregate (the API object shape, dag.py:80-102)."""

    ticker: str
    date: dt.date
    open: float
    high: float
    low: float
    close: float
    volume: float
    vwap: float
    timestamp: int
    transactions: int


class BarClient(Protocol):
    def list_aggs(self, ticker: str, ds: str) -> Iterable[Bar]: ...


class DeterministicBarClient:
    """Offline stand-in for the REST client: seeded, reproducible bars.

    Prices are pure functions of (ticker, ds) via sha256, so ingestion
    tests and the smoke pipeline are deterministic without network access.
    """

    def __init__(self, fail_tickers: frozenset[str] = frozenset()):
        self.fail_tickers = fail_tickers

    def list_aggs(self, ticker: str, ds: str) -> Iterable[Bar]:
        if ticker in self.fail_tickers:
            raise ConnectionError(f"simulated API failure for {ticker}")
        h = hashlib.sha256(f"{ticker}|{ds}".encode()).digest()
        base = 50.0 + (int.from_bytes(h[:4], "big") % 45000) / 100.0
        spread = 1.0 + (int.from_bytes(h[4:6], "big") % 900) / 100.0
        day = dt.date.fromisoformat(ds)
        epoch_ms = int(dt.datetime(day.year, day.month, day.day).timestamp() * 1000)
        yield Bar(
            ticker=ticker,
            date=day,
            open=round(base + spread * 0.25, 4),
            high=round(base + spread, 4),
            low=round(base, 4),
            close=round(base + spread * 0.5, 4),
            volume=float(1_000_000 + int.from_bytes(h[6:9], "big") % 9_000_000),
            vwap=round(base + spread * 0.4, 4),
            timestamp=epoch_ms,
            transactions=10_000 + int.from_bytes(h[9:11], "big") % 90_000,
        )


class PolygonBarClient:
    """HTTP client for the Polygon.io daily-aggregates REST API.

    Completes S1 (reference: ``RESTClient(api_key).list_aggs(ticker, 1,
    "day", ds, ds, limit=5)``, dag.py:72-87) with a real transport:
    ``GET /v2/aggs/ticker/{ticker}/range/1/day/{ds}/{ds}`` with the
    api key from ``POLYGON_API_KEY`` (or the constructor). The response's
    ``results`` objects map o/h/l/c/v/vw/t/n onto :class:`Bar` — the same
    field mapping the reference does (dag.py:95-102).

    The transport is injectable (``http_get(url) -> str``) so unit tests
    run fully offline against canned JSON; the default uses stdlib
    urllib (no third-party HTTP dependency). Per-ticker error isolation
    lives in :func:`fetch_bars`, not here — any transport/HTTP/parse
    error propagates and is swallowed by the caller's per-ticker loop,
    matching the reference's try/except contract.
    """

    BASE_URL = "https://api.polygon.io"

    def __init__(
        self,
        api_key: str | None = None,
        http_get=None,
        timeout: float = 10.0,
    ):
        import os

        self.api_key = api_key if api_key is not None else os.environ.get(
            "POLYGON_API_KEY", ""
        )
        self._http_get = http_get or self._urllib_get
        self.timeout = timeout

    def _urllib_get(self, url: str) -> str:
        import urllib.request

        with urllib.request.urlopen(url, timeout=self.timeout) as resp:
            return resp.read().decode("utf-8")

    def list_aggs(self, ticker: str, ds: str, limit: int = 5) -> Iterable[Bar]:
        import json

        url = (
            f"{self.BASE_URL}/v2/aggs/ticker/{ticker}/range/1/day/{ds}/{ds}"
            f"?adjusted=true&sort=asc&limit={limit}&apiKey={self.api_key}"
        )
        payload = json.loads(self._http_get(url))
        day = dt.date.fromisoformat(ds)
        for agg in payload.get("results") or []:
            yield Bar(
                ticker=ticker,
                date=day,
                open=float(agg["o"]),
                high=float(agg["h"]),
                low=float(agg["l"]),
                close=float(agg["c"]),
                volume=float(agg["v"]),
                vwap=float(agg.get("vw", agg["c"])),
                timestamp=int(agg["t"]),
                transactions=int(agg.get("n", 0)),
            )


def fetch_bars(
    client: BarClient, ds: str, tickers: list[str] | None = None
) -> list[Bar]:
    """Fetch the first daily bar per ticker; swallow per-ticker errors.

    Mirrors the reference loop (dag.py:78-112): `limit=5` then `break`
    after the first agg; failures print-and-continue.
    """
    bars: list[Bar] = []
    for ticker in tickers or REFERENCE_TICKERS:
        try:
            for bar in client.list_aggs(ticker, ds):
                bars.append(bar)
                break  # first bar only, as the reference does (dag.py:109)
        except Exception as exc:  # per-ticker isolation (dag.py:110-112)
            print(f"Error fetching data for {ticker}: {exc}")
    return bars


def bars_to_df(spark: SparkSession, bars: list[Bar]) -> DataFrame:
    """Raw API floats -> DataFrame with the reference's column types.

    Explicit cast double -> DECIMAL(10,2) (HALF_UP, Spark's documented
    decimal rounding) replaces the reference's implicit coercion at
    INSERT time (dag.py:95-100 vs 136-141).
    """
    from .tables import local_df

    # Arrow-backed local frame (guide §4/§6): the pickled-RDD variant
    # makes every downstream insert job pay Python-worker round-trips
    raw = local_df(
        spark,
        [
            (
                b.ticker,
                b.date,
                b.open,
                b.high,
                b.low,
                b.close,
                b.volume,
                b.vwap,
                b.timestamp,
                b.transactions,
            )
            for b in bars
        ],
        schema=API_BAR_SCHEMA,
    )
    return raw.select(
        "ticker",
        "date",
        F.col("open").cast(DEC_PRICE).alias("open"),
        F.col("high").cast(DEC_PRICE).alias("high"),
        F.col("low").cast(DEC_PRICE).alias("low"),
        F.col("close").cast(DEC_PRICE).alias("close"),
        F.col("volume").cast("bigint").alias("volume"),
        F.col("vwap").cast(DEC_PRICE).alias("vwap"),
        F.col("transactions").cast("int").alias("transactions"),
        F.current_timestamp().alias("insertion_timestamp"),
    )
