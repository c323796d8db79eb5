"""Finance analytics over the prices surface: VWAP, drawdown, returns.

The reference is a stock tracker whose cumulate stage stops at rolling
mean/volatility (``/root/reference/dags/dag.py:318-376``); these are the
next operators a quant user reaches for, each built to the repo's
exactness discipline:

  prices_vwap       rolling 7-day volume-weighted average price:
                    sum(close_cents x volume) / sum(volume) — both sums
                    pure int64 over the window, ONE closing division of
                    two exact integers
  prices_drawdown   running peak (window cummax on cents), drawdown from
                    peak (int64 subtraction), and daily simple return
                    (close_c - prev_c as exact int, ratio as one division)

Scale: both are single-window queries — one hash exchange on ticker,
sorted runs inside partitions, no joins, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.money import cents

ROLLING = 7  # trading days in the VWAP window, matching the cumulate frame


def vwap_weekly(prices: DataFrame) -> DataFrame:
    """Per (ticker, date): rolling 7-row VWAP in exact int64 until the
    one closing division."""
    w = (
        Window.partitionBy("ticker")
        .orderBy("date")
        .rowsBetween(-(ROLLING - 1), 0)
    )
    close_c = cents("close")
    vol = F.col("volume").cast("bigint")
    pv = F.sum(close_c * vol).over(w)
    v = F.sum(vol).over(w)
    return (
        prices.select(
            "ticker",
            "date",
            F.count(F.lit(1)).over(w).alias("n_days"),
            pv.alias("pv_c"),
            v.alias("vol_sum"),
            # all-zero-volume window (halted ticker): no trades means no
            # VWAP — NULL in both engines, not an ANSI crash (r8 sweep;
            # tests/test_properties.py::test_finance_zero_denominator_nulls)
            F.when(v != 0, pv / v).alias("vwap_c"),
        )
        .orderBy("ticker", "date")
    )


VWAP_SQL = f"""
SELECT ticker, date,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_days,
       CAST(SUM(CAST(ROUND(close * 100) AS BIGINT) * CAST(volume AS BIGINT))
            OVER w AS BIGINT) AS pv_c,
       CAST(SUM(CAST(volume AS BIGINT)) OVER w AS BIGINT) AS vol_sum,
       CAST(SUM(CAST(ROUND(close * 100) AS BIGINT) * CAST(volume AS BIGINT))
            OVER w AS DOUBLE)
         / NULLIF(SUM(CAST(volume AS BIGINT)) OVER w, 0) AS vwap_c
FROM prices
WINDOW w AS (PARTITION BY ticker ORDER BY date
             ROWS BETWEEN {ROLLING - 1} PRECEDING AND CURRENT ROW)
ORDER BY ticker, date
"""


def drawdown(prices: DataFrame) -> DataFrame:
    """Per (ticker, date): running peak close, drawdown from peak, and
    the daily simple return — all int64 except two closing divisions."""
    w = Window.partitionBy("ticker").orderBy("date")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    close_c = cents("close")
    peak_c = F.max(close_c).over(run)
    prev_c = F.lag(close_c).over(w)
    # r8 float-denominator sweep: a 0.00 close (delisted/bad tick) makes
    # peak_c or prev_c zero — ANSI Spark raises DIVIDE_BY_ZERO where
    # DuckDB diverges; NULL in both engines (F.when here, NULLIF in the
    # oracle) is the defined behavior
    # (tests/test_properties.py::test_finance_zero_denominator_nulls)
    return (
        prices.select(
            "ticker",
            "date",
            peak_c.alias("peak_c"),
            (close_c - peak_c).alias("drawdown_c"),
            F.when(peak_c != 0, (close_c - peak_c) / peak_c).alias(
                "drawdown_pct"
            ),
            (close_c - prev_c).alias("change_c"),
            F.when(prev_c != 0, (close_c - prev_c) / prev_c).alias(
                "daily_return"
            ),
        )
        .orderBy("ticker", "date")
    )


DRAWDOWN_SQL = """
WITH c AS (
  SELECT ticker, date,
         CAST(ROUND(close * 100) AS BIGINT) AS close_c
  FROM prices
)
SELECT ticker, date,
       MAX(close_c) OVER run AS peak_c,
       close_c - MAX(close_c) OVER run AS drawdown_c,
       CAST(close_c - MAX(close_c) OVER run AS DOUBLE)
         / NULLIF(MAX(close_c) OVER run, 0) AS drawdown_pct,
       close_c - LAG(close_c) OVER w AS change_c,
       CAST(close_c - LAG(close_c) OVER w AS DOUBLE)
         / NULLIF(LAG(close_c) OVER w, 0) AS daily_return
FROM c
WINDOW w AS (PARTITION BY ticker ORDER BY date),
       run AS (PARTITION BY ticker ORDER BY date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY ticker, date
"""


def bollinger(prices: DataFrame, width: int = ROLLING) -> DataFrame:
    """Rolling Bollinger bands from exact integer moments.

    stddev_samp over a window streams doubles (order-dependent); here
    sigma comes from the int64 moments (n, sum, sum-of-squares) of the
    cents frame, so both engines derive identical doubles from identical
    integers and even the band-breach BOOLEANS hash-match. Emits the
    exact moments alongside the derived bands — the moments are the
    re-aggregatable representation a rollup table would store.
    """
    w = (
        Window.partitionBy("ticker")
        .orderBy("date")
        .rowsBetween(-(width - 1), 0)
    )
    c = cents("close")
    n = F.count(F.lit(1)).over(w)
    sx = F.sum(c).over(w)
    sxx = F.sum(c * c).over(w)
    mean = sx / n
    var = (n * sxx - sx * sx) / (n * (n - 1))
    sigma = F.sqrt(var.cast("double"))
    upper = mean + 2 * sigma
    lower = mean - 2 * sigma
    return (
        prices.select(
            "ticker",
            "date",
            c.alias("close_c"),
            n.alias("n_days"),
            sx.alias("sum_c"),
            sxx.alias("sumsq_c"),
            F.when(n >= 2, upper).alias("upper_c"),
            F.when(n >= 2, lower).alias("lower_c"),
            F.when(n >= 2, c > upper).alias("breach_up"),
            F.when(n >= 2, c < lower).alias("breach_down"),
        )
        .orderBy("ticker", "date")
    )


BOLLINGER_SQL = f"""
WITH c AS (
  SELECT ticker, date, CAST(ROUND(close * 100) AS BIGINT) AS close_c
  FROM prices
), m AS (
  SELECT ticker, date, close_c,
         CAST(COUNT(*) OVER w AS BIGINT) AS n_days,
         CAST(SUM(close_c) OVER w AS BIGINT) AS sum_c,
         CAST(SUM(close_c * close_c) OVER w AS BIGINT) AS sumsq_c
  FROM c
  WINDOW w AS (PARTITION BY ticker ORDER BY date
               ROWS BETWEEN {ROLLING - 1} PRECEDING AND CURRENT ROW)
)
SELECT ticker, date, close_c, n_days, sum_c, sumsq_c,
       CASE WHEN n_days >= 2 THEN CAST(sum_c AS DOUBLE) / n_days
            + 2 * sqrt(CAST((n_days * sumsq_c - sum_c * sum_c)
                            / (n_days * (n_days - 1)) AS DOUBLE)) END AS upper_c,
       CASE WHEN n_days >= 2 THEN CAST(sum_c AS DOUBLE) / n_days
            - 2 * sqrt(CAST((n_days * sumsq_c - sum_c * sum_c)
                            / (n_days * (n_days - 1)) AS DOUBLE)) END AS lower_c,
       CASE WHEN n_days >= 2 THEN close_c > CAST(sum_c AS DOUBLE) / n_days
            + 2 * sqrt(CAST((n_days * sumsq_c - sum_c * sum_c)
                            / (n_days * (n_days - 1)) AS DOUBLE)) END AS breach_up,
       CASE WHEN n_days >= 2 THEN close_c < CAST(sum_c AS DOUBLE) / n_days
            - 2 * sqrt(CAST((n_days * sumsq_c - sum_c * sum_c)
                            / (n_days * (n_days - 1)) AS DOUBLE)) END AS breach_down
FROM m
ORDER BY ticker, date
"""


RSI_PERIOD = 14  # lookback rows for Cutler's RSI


def rsi(prices: DataFrame, period: int = RSI_PERIOD) -> DataFrame:
    """Per (ticker, date): Cutler's RSI — SMA-based relative strength,
    100 * sum(gains) / (sum(gains) + sum(losses)) over the trailing
    ``period`` rows. (Wilder's original smooths with an EMA; Cutler's
    SMA variant is window-exact, which keeps every intermediate an
    int64 cents sum with ONE closing division — the repo's exactness
    discipline.)

    NULL contract (same class as vwap/drawdown,
    tests/test_properties.py::test_finance_zero_denominator_nulls
    pattern): a window with no movement at all (sum gains + sum losses
    = 0) has no defined RSI — NULL in both engines, never a
    DIVIDE_BY_ZERO; the first row of a ticker (no previous close) is
    excluded from both sums by NULL propagation.

    Scale: one hash exchange on ticker, two stacked window passes over
    sorted runs (lag, then rolling sums), no joins, no Python.
    """
    w = Window.partitionBy("ticker").orderBy("date")
    roll = w.rowsBetween(-(period - 1), 0)
    close_c = cents("close")
    prev_c = F.lag(close_c).over(w)
    diff = close_c - prev_c  # NULL on each ticker's first row
    # EXPLICIT first-row NULL: greatest() swallows NULL args (returns
    # the largest non-null) and engines have differed on that corner —
    # the when() here and the CASE in the oracle pin "no previous close
    # means no gain/loss row" identically on both sides
    gains = prices.select(
        "ticker",
        "date",
        F.when(diff.isNotNull(), F.greatest(diff, F.lit(0))).alias("gain_c"),
        F.when(diff.isNotNull(), F.greatest(-diff, F.lit(0))).alias("loss_c"),
    )
    sg = F.sum("gain_c").over(roll)
    sl = F.sum("loss_c").over(roll)
    return (
        gains.select(
            "ticker",
            "date",
            F.coalesce(sg, F.lit(0)).alias("gain_sum_c"),
            F.coalesce(sl, F.lit(0)).alias("loss_sum_c"),
            F.when(
                (sg + sl) != 0, (F.lit(100.0) * sg) / (sg + sl)
            ).alias("rsi"),
        )
        .orderBy("ticker", "date")
    )


RSI_SQL = f"""
WITH c AS (
  SELECT ticker, date, CAST(ROUND(close * 100) AS BIGINT) AS close_c
  FROM prices
), d AS (
  SELECT ticker, date,
         CASE WHEN LAG(close_c) OVER w IS NULL THEN NULL
              ELSE greatest(close_c - LAG(close_c) OVER w, 0) END AS gain_c,
         CASE WHEN LAG(close_c) OVER w IS NULL THEN NULL
              ELSE greatest(LAG(close_c) OVER w - close_c, 0) END AS loss_c
  FROM c
  WINDOW w AS (PARTITION BY ticker ORDER BY date)
), s AS (
  SELECT ticker, date,
         CAST(SUM(gain_c) OVER r AS BIGINT) AS sg,
         CAST(SUM(loss_c) OVER r AS BIGINT) AS sl
  FROM d
  WINDOW r AS (PARTITION BY ticker ORDER BY date
               ROWS BETWEEN {RSI_PERIOD - 1} PRECEDING AND CURRENT ROW)
)
SELECT ticker, date,
       COALESCE(sg, 0) AS gain_sum_c,
       COALESCE(sl, 0) AS loss_sum_c,
       CASE WHEN sg + sl != 0 THEN (100.0 * sg) / (sg + sl) END AS rsi
FROM s
ORDER BY ticker, date
"""
