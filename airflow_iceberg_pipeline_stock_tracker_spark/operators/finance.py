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


def monthly_bars(prices: DataFrame) -> DataFrame:
    """Per (ticker, month): the calendar OHLCV rollup — open is the
    FIRST day's open, close the LAST day's close (min_by/max_by on the
    unique date key), high/low the extrema, volume the exact int64 sum.
    The monthly view every charting surface derives from daily bars
    (the reference stores daily only, dag.py:132-148).

    Exactness: min_by/max_by select existing doubles by a UNIQUE
    integer-ordered key (one row per (ticker, date)) — no arithmetic on
    floats at all; volume is an int64 sum.

    Scale: one hash aggregate keyed (ticker, month) with map-side
    partial min_by/max_by — shuffle volume bounded by group
    cardinality, same class as the prices_standin derivation itself.
    """
    m = F.date_trunc("month", F.col("date")).cast("date")
    return (
        prices.groupBy("ticker", m.alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.min_by("open", "date").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", "date").alias("close"),
            F.sum("volume").alias("volume"),
        )
        .orderBy("ticker", "month")
    )


MONTHLY_BARS_SQL = """
SELECT ticker,
       CAST(date_trunc('month', date) AS DATE) AS month,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       min_by(open, date) AS open,
       MAX(high) AS high,
       MIN(low) AS low,
       max_by(close, date) AS close,
       CAST(SUM(volume) AS BIGINT) AS volume
FROM prices
GROUP BY 1, 2
ORDER BY ticker, month
"""

GC_FAST = 50  # fast moving-average window (trading days)
GC_SLOW = 200  # slow window; GC_SLOW must be a multiple of GC_FAST


def golden_cross(prices: DataFrame) -> DataFrame:
    """Golden/death crosses: the days a ticker's 50-day moving average
    crosses its 200-day moving average — THE long-horizon trend-reversal
    signal — emitted only where both windows are FULL.

    Exactness: comparing SMA50 to SMA200 needs no division at all —
    sma50 > sma200 iff 4*s50 > s200 over the cent sums (GC_SLOW/GC_FAST
    = 4, all int64). The crossing test compares today's exact integer
    diff sign with yesterday's; golden = diff goes nonpositive ->
    positive, death = nonnegative -> negative.

    Scale: three stacked windows on one (ticker, date) exchange —
    single sort, no joins, no Python; same class as prices_drawdown.
    """
    w = Window.partitionBy("ticker").orderBy("date")
    close_c = cents("close")
    s_fast = F.sum(close_c).over(w.rowsBetween(-(GC_FAST - 1), 0))
    s_slow = F.sum(close_c).over(w.rowsBetween(-(GC_SLOW - 1), 0))
    n_slow = F.count(F.lit(1)).over(w.rowsBetween(-(GC_SLOW - 1), 0))
    staged = prices.select(
        "ticker",
        "date",
        (s_fast * F.lit(GC_SLOW // GC_FAST) - s_slow).alias("diff_c"),
        n_slow.alias("n_slow"),
    ).where(F.col("n_slow") == GC_SLOW)
    prev = F.lag("diff_c").over(w)
    signals = staged.select(
        "ticker",
        "date",
        "diff_c",
        prev.alias("prev_diff_c"),
    ).where(
        (F.col("prev_diff_c").isNotNull())
        & (
            ((F.col("prev_diff_c") <= 0) & (F.col("diff_c") > 0))
            | ((F.col("prev_diff_c") >= 0) & (F.col("diff_c") < 0))
        )
    )
    return signals.select(
        "ticker",
        "date",
        "diff_c",
        "prev_diff_c",
        F.when(F.col("diff_c") > 0, F.lit("golden"))
        .otherwise(F.lit("death"))
        .alias("signal"),
    ).orderBy("ticker", "date")


GOLDEN_CROSS_SQL = f"""
WITH c AS (
  SELECT ticker, date,
         CAST(ROUND(close * 100) AS BIGINT) AS close_c
  FROM prices
), sums AS (
  SELECT ticker, date,
         SUM(close_c) OVER (PARTITION BY ticker ORDER BY date
             ROWS BETWEEN {GC_FAST - 1} PRECEDING AND CURRENT ROW) AS s_fast,
         SUM(close_c) OVER (PARTITION BY ticker ORDER BY date
             ROWS BETWEEN {GC_SLOW - 1} PRECEDING AND CURRENT ROW) AS s_slow,
         COUNT(*) OVER (PARTITION BY ticker ORDER BY date
             ROWS BETWEEN {GC_SLOW - 1} PRECEDING AND CURRENT ROW) AS n_slow
  FROM c
), staged AS (
  SELECT ticker, date,
         CAST(s_fast * {GC_SLOW // GC_FAST} - s_slow AS BIGINT) AS diff_c
  FROM sums WHERE n_slow = {GC_SLOW}
), signals AS (
  SELECT ticker, date, diff_c,
         LAG(diff_c) OVER (PARTITION BY ticker ORDER BY date) AS prev_diff_c
  FROM staged
)
SELECT ticker, date, diff_c, prev_diff_c,
       CASE WHEN diff_c > 0 THEN 'golden' ELSE 'death' END AS signal
FROM signals
WHERE prev_diff_c IS NOT NULL
  AND ((prev_diff_c <= 0 AND diff_c > 0) OR (prev_diff_c >= 0 AND diff_c < 0))
ORDER BY ticker, date
"""


def obv(prices: DataFrame) -> DataFrame:
    """Per (ticker, date): On-Balance Volume — the running sum of
    volume signed by the day's close-to-close direction (up: +volume,
    down: -volume, unchanged: 0; the first day contributes 0, having no
    prior close). Granville's classic accumulation/distribution
    indicator: whether volume is flowing INTO or OUT of the name — the
    natural next consumer of the reference's raw volume column
    (/root/reference/dags/dag.py:318-376 stops at rolling mean/vol).

    Exactness: the direction compares int64 cents and the running sum
    is pure int64 — no floating point anywhere in the operator.

    Scale: two stacked windows on the SAME (ticker, date) key — one
    hash exchange, one sort, no joins, no Python; the same single-
    window class as prices_drawdown.
    """
    w = Window.partitionBy("ticker").orderBy("date")
    close_c = cents("close")
    prev_c = F.lag(close_c).over(w)
    vol = F.col("volume").cast("bigint")
    zero = F.lit(0).cast("bigint")
    signed = (
        F.when(prev_c.isNull(), zero)
        .when(close_c > prev_c, vol)
        .when(close_c < prev_c, -vol)
        .otherwise(zero)
    )
    staged = prices.select(
        "ticker", "date", signed.alias("signed_vol")
    )
    run = (
        Window.partitionBy("ticker")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return staged.select(
        "ticker",
        "date",
        "signed_vol",
        F.sum("signed_vol").over(run).alias("obv"),
    ).orderBy("ticker", "date")


OBV_SQL = """
WITH c AS (
  SELECT ticker, date,
         CAST(ROUND(close * 100) AS BIGINT) AS close_c,
         CAST(volume AS BIGINT) AS vol
  FROM prices
), s AS (
  SELECT ticker, date,
         CASE WHEN LAG(close_c) OVER w IS NULL THEN CAST(0 AS BIGINT)
              WHEN close_c > LAG(close_c) OVER w THEN vol
              WHEN close_c < LAG(close_c) OVER w THEN -vol
              ELSE CAST(0 AS BIGINT) END AS signed_vol
  FROM c
  WINDOW w AS (PARTITION BY ticker ORDER BY date)
)
SELECT ticker, date, signed_vol,
       CAST(SUM(signed_vol) OVER run AS BIGINT) AS obv
FROM s
WINDOW run AS (PARTITION BY ticker ORDER BY date
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

ATR_PERIOD = 14  # lookback rows for the Average True Range


def atr(prices: DataFrame, period: int = ATR_PERIOD) -> DataFrame:
    """Per (ticker, date): True Range and its rolling SMA (Wilder's ATR
    in the SMA formulation, same Cutler-style choice as :func:`rsi` —
    the EMA recursion would force a sequential fold, the SMA keeps the
    whole operator window-exact).

      TR_c  = greatest(high-low, |high-prev_close|, |low-prev_close|)
      ATR_c = avg(TR_c) over the trailing ``period`` rows

    Every intermediate is int64 cents: high/low/close are scaled
    per-row, the three candidate ranges are integer subtractions, the
    rolling mean is an int64 sum with ONE closing division. First row
    of a ticker (no previous close) uses the conventional TR =
    high - low, pinned with an explicit CASE in both engines rather
    than relying on greatest()'s NULL-swallowing (which engines have
    disagreed on — see :func:`rsi`).

    Scale: one hash exchange on ticker, a lag pass then a rolling-sum
    pass over sorted runs, no joins, no Python
    (tests/test_properties.py::test_atr_stochastic_reference).
    """
    w = Window.partitionBy("ticker").orderBy("date")
    roll = w.rowsBetween(-(period - 1), 0)
    hi_c, lo_c, cl_c = cents("high"), cents("low"), cents("close")
    prev_c = F.lag(cl_c).over(w)
    tr = F.when(prev_c.isNull(), hi_c - lo_c).otherwise(
        F.greatest(
            hi_c - lo_c,
            F.abs(hi_c - prev_c),
            F.abs(lo_c - prev_c),
        )
    )
    base = prices.select("ticker", "date", tr.alias("tr_c"))
    n = F.count(F.lit(1)).over(roll)
    s = F.sum("tr_c").over(roll)
    return (
        base.select(
            "ticker",
            "date",
            "tr_c",
            n.alias("n_days"),
            s.alias("tr_sum_c"),
            (s / n).alias("atr_c"),
        )
        .orderBy("ticker", "date")
    )


ATR_SQL = f"""
WITH c AS (
  SELECT ticker, date,
         CAST(ROUND(high * 100) AS BIGINT) AS hi_c,
         CAST(ROUND(low * 100) AS BIGINT) AS lo_c,
         CAST(ROUND(close * 100) AS BIGINT) AS cl_c
  FROM prices
), t AS (
  SELECT ticker, date,
         CASE WHEN LAG(cl_c) OVER w IS NULL THEN hi_c - lo_c
              ELSE greatest(hi_c - lo_c,
                            abs(hi_c - LAG(cl_c) OVER w),
                            abs(lo_c - LAG(cl_c) OVER w)) END AS tr_c
  FROM c
  WINDOW w AS (PARTITION BY ticker ORDER BY date)
)
SELECT ticker, date, tr_c,
       CAST(COUNT(*) OVER r AS BIGINT) AS n_days,
       CAST(SUM(tr_c) OVER r AS BIGINT) AS tr_sum_c,
       CAST(SUM(tr_c) OVER r AS DOUBLE) / (COUNT(*) OVER r) AS atr_c
FROM t
WINDOW r AS (PARTITION BY ticker ORDER BY date
             ROWS BETWEEN {ATR_PERIOD - 1} PRECEDING AND CURRENT ROW)
ORDER BY ticker, date
"""


STOCH_PERIOD = 14  # %K lookback rows


def stochastic(prices: DataFrame, period: int = STOCH_PERIOD) -> DataFrame:
    """Per (ticker, date): the stochastic oscillator.

      %K = 100 * (close - min(low))/(max(high) - min(low))  over ``period`` rows
      %D = (%K + lag(%K) + lag(%K, 2)) / 3                  (SMA-3 of %K)

    Exactness: the window extrema are int64 cents, so %K is ONE
    division of exact integers; a flat window (max high == min low —
    a halted ticker) has no defined %K — NULL in both engines, never a
    DIVIDE_BY_ZERO (the vwap/drawdown/rsi NULL contract,
    tests/test_properties.py::test_finance_zero_denominator_nulls
    class). %D is written as an EXPLICIT three-lag left-associated sum
    — not AVG over a frame — so both engines run the identical IEEE
    sequence on the identical doubles; the first two rows of a ticker
    have no %D (NULL propagation from the missing lags), and any NULL
    %K inside the triple nulls %D in both engines the same way
    (tests/test_properties.py::test_atr_stochastic_reference).

    Scale: same shape as :func:`rsi` — one exchange on ticker, two
    stacked window passes, no joins, no Python.
    """
    w = Window.partitionBy("ticker").orderBy("date")
    roll = w.rowsBetween(-(period - 1), 0)
    hi_c, lo_c, cl_c = cents("high"), cents("low"), cents("close")
    hh = F.max(hi_c).over(roll)
    ll = F.min(lo_c).over(roll)
    k = F.when(hh != ll, (F.lit(100.0) * (cl_c - ll)) / (hh - ll))
    base = prices.select(
        "ticker",
        "date",
        hh.alias("hh_c"),
        ll.alias("ll_c"),
        k.alias("pct_k"),
    )
    k0 = F.col("pct_k")
    k1 = F.lag("pct_k").over(w)
    k2 = F.lag("pct_k", 2).over(w)
    return (
        base.select(
            "ticker",
            "date",
            "hh_c",
            "ll_c",
            "pct_k",
            ((k0 + k1 + k2) / F.lit(3.0)).alias("pct_d"),
        )
        .orderBy("ticker", "date")
    )


STOCH_SQL = f"""
WITH c AS (
  SELECT ticker, date,
         CAST(ROUND(high * 100) AS BIGINT) AS hi_c,
         CAST(ROUND(low * 100) AS BIGINT) AS lo_c,
         CAST(ROUND(close * 100) AS BIGINT) AS cl_c
  FROM prices
), k AS (
  SELECT ticker, date,
         MAX(hi_c) OVER r AS hh_c,
         MIN(lo_c) OVER r AS ll_c,
         CASE WHEN MAX(hi_c) OVER r != MIN(lo_c) OVER r
              THEN (100.0 * (cl_c - MIN(lo_c) OVER r))
                   / (MAX(hi_c) OVER r - MIN(lo_c) OVER r) END AS pct_k
  FROM c
  WINDOW r AS (PARTITION BY ticker ORDER BY date
               ROWS BETWEEN {STOCH_PERIOD - 1} PRECEDING AND CURRENT ROW)
)
SELECT ticker, date, hh_c, ll_c, pct_k,
       ((pct_k + LAG(pct_k) OVER w) + LAG(pct_k, 2) OVER w) / 3.0 AS pct_d
FROM k
WINDOW w AS (PARTITION BY ticker ORDER BY date)
ORDER BY ticker, date
"""


def spearman_pairs(prices: DataFrame) -> DataFrame:
    """Pairwise Spearman rank correlation of daily close changes.

    The reference tracks a fixed small ticker universe
    (``/root/reference/dags/dag.py:61``); cross-ticker co-movement is the
    canonical next question a tracker answers. Pearson on float returns
    is cross-engine-hostile (order-dependent double sums, libm-tainted
    variance), so this computes SPEARMAN via the exactness discipline:

      1. daily change in cents (int64 lag difference) per ticker,
      2. inner self-join on date with ``t1 < t2`` (each pair once, only
         dates where both tickers traded),
      3. 2x-average-rank per pair side: ``2*rank + ties - 1`` — an exact
         INTEGER even under ties (average rank itself is k.5 on even tie
         runs), identical in both engines by construction,
      4. Pearson on the integer ranks from pure int64 sums; the one
         closing step is ``num / (sqrt(den_x) * sqrt(den_y))`` — IEEE
         sqrt is correctly rounded (unlike exp/log), so the double
         result is deterministic cross-engine.

    Constant-change series (den 0) yield NULL rho, never a crash
    (tests/test_properties.py::test_spearman_degenerate_nulls).

    Scale: the join is keyed on date across a BOUNDED ticker universe
    (6 stand-in tickers, ~k^2/2 = 15 pairs); per-pair row count is
    bounded by trading days, so the rank windows sort at most ~2.5k rows
    per (t1, t2) partition and the final aggregate is 15 rows. At 100 TB
    the only full-data pass is the prices aggregation upstream; rank
    sums are associative int64, safe under AQE re-partitioning.
    """
    w = Window.partitionBy("ticker").orderBy("date")
    close_c = cents("close")
    chg = (
        prices.select("ticker", "date", close_c.alias("close_c"))
        .withColumn(
            "change_c", F.col("close_c") - F.lag("close_c").over(w)
        )
        .where(F.col("change_c").isNotNull())
    )
    a = chg.select(
        F.col("ticker").alias("t1"), "date", F.col("change_c").alias("x")
    )
    b = chg.select(
        F.col("ticker").alias("t2"), "date", F.col("change_c").alias("y")
    )
    pairs = a.join(b, "date").where(F.col("t1") < F.col("t2"))
    # 2x average rank: 2*rank(min) + (#ties - 1); exact bigint both sides
    rx = (
        2 * F.rank().over(Window.partitionBy("t1", "t2").orderBy("x"))
        + F.count(F.lit(1)).over(Window.partitionBy("t1", "t2", "x"))
        - 1
    ).cast("bigint")
    ry = (
        2 * F.rank().over(Window.partitionBy("t1", "t2").orderBy("y"))
        + F.count(F.lit(1)).over(Window.partitionBy("t1", "t2", "y"))
        - 1
    ).cast("bigint")
    ranked = pairs.select("t1", "t2", rx.alias("rx"), ry.alias("ry"))
    sums = ranked.groupBy("t1", "t2").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    num = F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n_days") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        sums.select(
            "t1",
            "t2",
            "n_days",
            num.alias("num"),
            den_x.alias("den_x"),
            den_y.alias("den_y"),
            F.when(
                (den_x > 0) & (den_y > 0),
                num
                / (
                    F.sqrt(den_x.cast("double"))
                    * F.sqrt(den_y.cast("double"))
                ),
            ).alias("rho"),
        )
        .orderBy("t1", "t2")
    )


PAIR_CORR_SQL = """
WITH c AS (
  SELECT ticker, date,
         CAST(ROUND(close * 100) AS BIGINT) AS close_c
  FROM prices
), chg AS (
  SELECT ticker, date,
         close_c - LAG(close_c)
           OVER (PARTITION BY ticker ORDER BY date) AS change_c
  FROM c
  QUALIFY change_c IS NOT NULL
), pairs AS (
  SELECT a.ticker AS t1, b.ticker AS t2,
         a.change_c AS x, b.change_c AS y
  FROM chg a JOIN chg b USING (date)
  WHERE a.ticker < b.ticker
), ranked AS (
  SELECT t1, t2,
         CAST(2 * RANK() OVER (PARTITION BY t1, t2 ORDER BY x)
              + COUNT(*) OVER (PARTITION BY t1, t2, x) - 1 AS BIGINT) AS rx,
         CAST(2 * RANK() OVER (PARTITION BY t1, t2 ORDER BY y)
              + COUNT(*) OVER (PARTITION BY t1, t2, y) - 1 AS BIGINT) AS ry
  FROM pairs
), sums AS (
  SELECT t1, t2,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(rx) AS BIGINT) AS sx,
         CAST(SUM(ry) AS BIGINT) AS sy,
         CAST(SUM(rx * ry) AS BIGINT) AS sxy,
         CAST(SUM(rx * rx) AS BIGINT) AS sxx,
         CAST(SUM(ry * ry) AS BIGINT) AS syy
  FROM ranked
  GROUP BY t1, t2
)
SELECT t1, t2, n_days,
       n_days * sxy - sx * sy AS num,
       n_days * sxx - sx * sx AS den_x,
       n_days * syy - sy * sy AS den_y,
       CASE WHEN n_days * sxx - sx * sx > 0
             AND n_days * syy - sy * sy > 0
            THEN CAST(n_days * sxy - sx * sy AS DOUBLE)
                 / (SQRT(CAST(n_days * sxx - sx * sx AS DOUBLE))
                    * SQRT(CAST(n_days * syy - sy * sy AS DOUBLE)))
       END AS rho
FROM sums
ORDER BY t1, t2
"""


def beta_vs_market(prices: DataFrame) -> DataFrame:
    """Per-ticker CAPM beta against the equal-weight market index.

    The index is the SUM of all tickers' closes per date (whole-dollar
    ints; the ticker itself is included, as in a real cap/equal-weight
    index); x_t and m_t are day-over-day dollar changes on dates where
    the ticker AND every index constituent traded (inner join on the
    full-cross-section dates keeps both engines on the same sample).

    Exactness discipline — a different lesson from spearman_pairs:
    dollars come from ``floor(close + 0.5)`` (deterministic: both
    engines evaluate the same IEEE double from the same parquet
    min/max, and floor of a shared double is exact), the five moment
    sums are pure int64 (bounded ~4e15, safely exact), and the closing
    ``beta = (n*sxm - sx*sm) / (n*smm - sm*sm)`` is computed in
    DOUBLES CAST FROM THE EXACT SUMS — every cast is exact (< 2^53),
    every product/difference is one deterministic IEEE op in both
    engines, and no intermediate can overflow int64 the way
    ``n * sxm`` could. Zero-variance markets (den <= 0) yield NULL
    (tests/test_properties.py::test_beta_degenerate_nulls).

    Scale: one exchange for the per-date index aggregate (bounded at
    tickers x days rows), broadcast join back to the per-ticker
    changes, 6-row output.
    """
    dollars_c = F.floor(F.col("close") + F.lit(0.5)).cast("bigint")
    px = prices.select("ticker", "date", dollars_c.alias("close_d"))
    # the index exists only on dates where EVERY constituent traded —
    # a partial cross-section would make the index jump on membership,
    # not price; n_tickers is derived from the data (no literal)
    n_tick = px.select(F.countDistinct("ticker").alias("k"))
    idx = (
        px.groupBy("date")
        .agg(
            F.sum("close_d").alias("index_d"),
            F.count(F.lit(1)).alias("k_present"),
        )
        .join(F.broadcast(n_tick), F.col("k_present") == F.col("k"))
        .select("date", "index_d")
    )
    # both lags run over the SAME per-ticker date sequence (the joined
    # frame is restricted to index dates), so one window serves x and m
    w_t = Window.partitionBy("ticker").orderBy("date")
    joined = px.join(F.broadcast(idx), "date")
    chg = joined.select(
        "ticker",
        "date",
        (F.col("close_d") - F.lag("close_d").over(w_t)).alias("x"),
        (F.col("index_d") - F.lag("index_d").over(w_t)).alias("m"),
    ).where(F.col("x").isNotNull() & F.col("m").isNotNull())
    sums = chg.groupBy("ticker").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("m").alias("sm"),
        F.sum(F.col("x") * F.col("m")).alias("sxm"),
        F.sum(F.col("m") * F.col("m")).alias("smm"),
    )
    n = F.col("n_days").cast("double")
    sx, sm = F.col("sx").cast("double"), F.col("sm").cast("double")
    sxm, smm = F.col("sxm").cast("double"), F.col("smm").cast("double")
    den = n * smm - sm * sm
    return (
        sums.select(
            "ticker",
            "n_days",
            "sx",
            "sm",
            "sxm",
            "smm",
            F.when(den > 0, (n * sxm - sx * sm) / den).alias("beta"),
        )
        .orderBy("ticker")
    )


BETA_SQL = """
WITH px AS (
  SELECT ticker, date,
         CAST(FLOOR(close + 0.5) AS BIGINT) AS close_d
  FROM prices
), idx AS (
  SELECT date, CAST(SUM(close_d) AS BIGINT) AS index_d
  FROM px
  GROUP BY date
  HAVING COUNT(*) = (SELECT COUNT(DISTINCT ticker) FROM px)
), chg AS (
  SELECT ticker, x, m FROM (
    SELECT p.ticker,
           p.close_d - LAG(p.close_d)
             OVER (PARTITION BY p.ticker ORDER BY p.date) AS x,
           i.index_d - LAG(i.index_d)
             OVER (PARTITION BY p.ticker ORDER BY p.date) AS m
    FROM px p JOIN idx i USING (date)
  )
  WHERE x IS NOT NULL AND m IS NOT NULL
), sums AS (
  SELECT ticker,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(m) AS BIGINT) AS sm,
         CAST(SUM(x * m) AS BIGINT) AS sxm,
         CAST(SUM(m * m) AS BIGINT) AS smm
  FROM chg
  GROUP BY ticker
)
SELECT ticker, n_days, sx, sm, sxm, smm,
       CASE WHEN CAST(n_days AS DOUBLE) * CAST(smm AS DOUBLE)
                 - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) > 0
            THEN (CAST(n_days AS DOUBLE) * CAST(sxm AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sm AS DOUBLE))
                 / (CAST(n_days AS DOUBLE) * CAST(smm AS DOUBLE)
                    - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
       END AS beta
FROM sums
ORDER BY ticker
"""


# ---------------------------------------------------------------------------
# MACD (Appel): chained EMA recursions, per-row output
# ---------------------------------------------------------------------------

MACD_FAST = 12
MACD_SLOW = 26
MACD_SIG = 9
MACD_TAIL_DAYS = 250  # emit the trailing year; EMAs still seed from ALL history


def macd(prices: DataFrame) -> DataFrame:
    """Per (ticker, date): MACD line (EMA12 - EMA26 of close), signal
    line (EMA9 of the MACD), histogram — the classic momentum trio.
    Unlike the repo's window indicators this is a CHAIN of recursions:
    each EMA depends on its previous OUTPUT, and the signal EMA runs
    over the macd SERIES, so no SQL window frame expresses it.

    Determinism: each ticker's closes are gathered SORTED BY the unique
    date key and folded by the JVM higher-order ``aggregate`` — the
    recursion ``e' = e + a * (x - e)`` (seed: first close; signal seeds
    at the first macd, which is exactly 0.0) runs the IDENTICAL IEEE op
    sequence as the oracle's recursive CTE, so doubles are bit-equal
    with no rounding (the events_ewma / events_holt_forecast
    discipline; alphas 2/13, 2/27, 2/10 are correctly-rounded double
    literals in both engines). Values are cents-as-doubles (exact
    integers < 2^53).

    Output: the trailing MACD_TAIL_DAYS rows per ticker (the fold
    consumes ALL history for seeding but appends only the tail, keeping
    the accumulator array bounded). Scale: one shuffle on ticker; state
    O(ticker's history) — intrinsic to the recursion, and bounded by
    TIME (daily bars), not data volume.
    """
    close_c = cents("close")
    per_t = prices.groupBy("ticker").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.array_sort(
            F.collect_list(
                F.struct(F.col("date"), close_c.cast("double").alias("x"))
            )
        ).alias("ordered"),
    )
    a12 = f"(cast(2 as double) / {MACD_FAST + 1})"
    a26 = f"(cast(2 as double) / {MACD_SLOW + 1})"
    a9 = f"(cast(2 as double) / {MACD_SIG + 1})"
    fold = F.expr(
        f"""
        aggregate(
          ordered,
          named_struct(
            'e12', cast(null as double), 'e26', cast(null as double),
            'sig', cast(null as double), 'i', 0,
            'rows',
            cast(array() as array<struct<date:date,macd:double,sig:double>>)
          ),
          (acc, o) -> named_struct(
            'e12', if(acc.e12 is null, o.x, acc.e12 + {a12} * (o.x - acc.e12)),
            'e26', if(acc.e26 is null, o.x, acc.e26 + {a26} * (o.x - acc.e26)),
            'sig',
            if(acc.sig is null,
               if(acc.e12 is null, o.x, acc.e12 + {a12} * (o.x - acc.e12))
               - if(acc.e26 is null, o.x, acc.e26 + {a26} * (o.x - acc.e26)),
               acc.sig + {a9} * (
                 (if(acc.e12 is null, o.x, acc.e12 + {a12} * (o.x - acc.e12))
                  - if(acc.e26 is null, o.x,
                       acc.e26 + {a26} * (o.x - acc.e26)))
                 - acc.sig)),
            'i', acc.i + 1,
            'rows',
            if(acc.i + 1 > n_days - {MACD_TAIL_DAYS},
               array_append(acc.rows, named_struct(
                 'date', o.date,
                 'macd',
                 if(acc.e12 is null, o.x, acc.e12 + {a12} * (o.x - acc.e12))
                 - if(acc.e26 is null, o.x,
                      acc.e26 + {a26} * (o.x - acc.e26)),
                 'sig',
                 if(acc.sig is null,
                    if(acc.e12 is null, o.x,
                       acc.e12 + {a12} * (o.x - acc.e12))
                    - if(acc.e26 is null, o.x,
                         acc.e26 + {a26} * (o.x - acc.e26)),
                    acc.sig + {a9} * (
                      (if(acc.e12 is null, o.x,
                          acc.e12 + {a12} * (o.x - acc.e12))
                       - if(acc.e26 is null, o.x,
                            acc.e26 + {a26} * (o.x - acc.e26)))
                      - acc.sig)))),
               acc.rows)
          )
        ).rows
        """
    )
    return (
        per_t.select("ticker", F.explode(fold).alias("r"))
        .select(
            "ticker",
            F.col("r.date").alias("date"),
            F.col("r.macd").alias("macd_c"),
            F.col("r.sig").alias("signal_c"),
            (F.col("r.macd") - F.col("r.sig")).alias("hist_c"),
        )
        .orderBy("ticker", "date")
    )


# NOTE: must be prefixed by a WITH RECURSIVE chain that defines `prices`
# (the entry module rewrites the shared prices CTE accordingly): the
# signal recursion cannot be expressed with DuckDB's list_reduce (its
# struct-literal fields evaluate sequentially against an in-place
# accumulator — the r9 Holt lesson), so the oracle recurses row-wise.
MACD_SQL = f"""
, c AS (
  SELECT ticker, date,
         CAST(CAST(ROUND(close * 100) AS BIGINT) AS DOUBLE) AS x
  FROM prices
), ord AS MATERIALIZED (
  SELECT ticker, date, x,
         ROW_NUMBER() OVER (PARTITION BY ticker ORDER BY date) AS rn,
         COUNT(*) OVER (PARTITION BY ticker) AS n_days
  FROM c
), r AS (
  SELECT ticker, date, rn, n_days, x,
         x AS e12, x AS e26,
         CAST(0 AS DOUBLE) AS macd, CAST(0 AS DOUBLE) AS sig
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.ticker, o.date, o.rn, o.n_days, o.x,
         r.e12 + (CAST(2 AS DOUBLE) / {MACD_FAST + 1}) * (o.x - r.e12),
         r.e26 + (CAST(2 AS DOUBLE) / {MACD_SLOW + 1}) * (o.x - r.e26),
         (r.e12 + (CAST(2 AS DOUBLE) / {MACD_FAST + 1}) * (o.x - r.e12))
           - (r.e26 + (CAST(2 AS DOUBLE) / {MACD_SLOW + 1}) * (o.x - r.e26)),
         r.sig + (CAST(2 AS DOUBLE) / {MACD_SIG + 1}) * (
           ((r.e12 + (CAST(2 AS DOUBLE) / {MACD_FAST + 1}) * (o.x - r.e12))
            - (r.e26 + (CAST(2 AS DOUBLE) / {MACD_SLOW + 1}) * (o.x - r.e26)))
           - r.sig)
  FROM r JOIN ord o ON o.ticker = r.ticker AND o.rn = r.rn + 1
)
SELECT ticker, date, macd AS macd_c, sig AS signal_c,
       macd - sig AS hist_c
FROM r
WHERE rn > n_days - {MACD_TAIL_DAYS}
ORDER BY ticker, date
"""


# ---------------------------------------------------------------------------
# Ichimoku Kinko Hyo lines (Hosoda): window-extremum midpoints + shifts
# ---------------------------------------------------------------------------

ICHI_TENKAN = 9
ICHI_KIJUN = 26
ICHI_SENKOU = 52


def ichimoku(prices: DataFrame) -> DataFrame:
    """Per (ticker, date): the five Ichimoku lines, emitted only where
    every contributing window is FULL (rows >= 52 + the 26-bar shift).
    The one widely-charted indicator family built purely from window
    EXTREMA and SHIFTS — no smoothing recursion at all.

    Exactness: every line is kept in doubled/quadrupled CENT space so
    no division ever happens — tenkan2/kijun2/span_b2 are (highest high
    + lowest low) over 9/26/52 rows (int64), span_a4 is tenkan2+kijun2
    lagged 26 bars (4x the plotted senkou A), chikou_c is close lagged
    -26 (lead; NULL near the series end in both engines).

    Scale: five frames over ONE (ticker, date) sort — a single hash
    exchange, no joins, no Python; prices_drawdown's class.
    """
    w = Window.partitionBy("ticker").orderBy("date")
    high_c, low_c, close_c = cents("high"), cents("low"), cents("close")

    def mid2(n: int):
        f = w.rowsBetween(-(n - 1), 0)
        return F.max(high_c).over(f) + F.min(low_c).over(f)

    staged = prices.select(
        "ticker",
        "date",
        F.row_number().over(w).alias("rn"),
        mid2(ICHI_TENKAN).alias("tenkan2"),
        mid2(ICHI_KIJUN).alias("kijun2"),
        mid2(ICHI_SENKOU).alias("senkou_raw2"),
        close_c.alias("close_c"),
    )
    out = staged.select(
        "ticker",
        "date",
        "rn",
        "tenkan2",
        "kijun2",
        (F.lag(F.col("tenkan2") + F.col("kijun2"), ICHI_KIJUN).over(w)).alias(
            "span_a4"
        ),
        F.lag("senkou_raw2", ICHI_KIJUN).over(w).alias("span_b2"),
        F.lead("close_c", ICHI_KIJUN).over(w).alias("chikou_c"),
    )
    return (
        out.where(F.col("rn") >= ICHI_SENKOU + ICHI_KIJUN)
        .drop("rn")
        .orderBy("ticker", "date")
    )


ICHIMOKU_SQL = f"""
WITH c AS (
  SELECT ticker, date,
         CAST(ROUND(high * 100) AS BIGINT) AS high_c,
         CAST(ROUND(low * 100) AS BIGINT) AS low_c,
         CAST(ROUND(close * 100) AS BIGINT) AS close_c
  FROM prices
), staged AS (
  SELECT ticker, date,
         ROW_NUMBER() OVER w AS rn,
         MAX(high_c) OVER w9 + MIN(low_c) OVER w9 AS tenkan2,
         MAX(high_c) OVER w26 + MIN(low_c) OVER w26 AS kijun2,
         MAX(high_c) OVER w52 + MIN(low_c) OVER w52 AS senkou_raw2,
         close_c
  FROM c
  WINDOW w AS (PARTITION BY ticker ORDER BY date),
         w9 AS (PARTITION BY ticker ORDER BY date
                ROWS BETWEEN {ICHI_TENKAN - 1} PRECEDING AND CURRENT ROW),
         w26 AS (PARTITION BY ticker ORDER BY date
                 ROWS BETWEEN {ICHI_KIJUN - 1} PRECEDING AND CURRENT ROW),
         w52 AS (PARTITION BY ticker ORDER BY date
                 ROWS BETWEEN {ICHI_SENKOU - 1} PRECEDING AND CURRENT ROW)
), shifted AS (
  SELECT ticker, date, rn, tenkan2, kijun2,
         LAG(tenkan2 + kijun2, {ICHI_KIJUN}) OVER w AS span_a4,
         LAG(senkou_raw2, {ICHI_KIJUN}) OVER w AS span_b2,
         LEAD(close_c, {ICHI_KIJUN}) OVER w AS chikou_c
  FROM staged
  WINDOW w AS (PARTITION BY ticker ORDER BY date)
)
SELECT ticker, date, tenkan2, kijun2, span_a4, span_b2, chikou_c
FROM shifted
WHERE rn >= {ICHI_SENKOU + ICHI_KIJUN}
ORDER BY ticker, date
"""


# ---------------------------------------------------------------------------
# Historical VaR / CVaR: exact tail order statistics per ticker
# ---------------------------------------------------------------------------

VAR_LEVELS = (95, 99)


def var_cvar(prices: DataFrame) -> DataFrame:
    """Per ticker: historical Value-at-Risk and Conditional VaR
    (expected shortfall) of the daily close-to-close change, at 95% and
    99% — the risk-desk numbers behind position limits. VaR_q is the
    EXACT discrete order statistic at rank ceil((1-q)*n) of the sorted
    changes (worst first); CVaR_q is the mean of the tail AT OR BELOW
    that rank.

    Exactness: changes are int64 cents; the tail mean is ONE closing
    division of an exact tail sum by the integer rank; the order
    statistic itself is an array element, never interpolated.

    Scale: one groupBy(ticker) gathers each ticker's change series
    (state bounded by TIME — daily bars, like prices_macd); selection
    and tail sums are per-row array expressions on the sorted array.
    """
    w = Window.partitionBy("ticker").orderBy("date")
    close_c = cents("close")
    chg = (close_c - F.lag(close_c).over(w)).alias("chg")
    per_t = (
        prices.select("ticker", "date", chg)
        .where(F.col("chg").isNotNull())
        .groupBy("ticker")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.array_sort(F.collect_list("chg")).alias("sorted_chg"),
        )
    )
    # tail rank per level, computed ONCE on the DOUBLE path: a bare
    # 0.05 literal parses as DECIMAL in both SQL dialects and its exact
    # ceil can disagree with the double product at multiples of 20
    staged = per_t
    for lvl in VAR_LEVELS:
        staged = staged.withColumn(
            f"k{lvl}",
            F.greatest(
                F.ceil(F.col("n_days") * F.lit((100 - lvl) / 100.0)),
                F.lit(1),
            ).cast("int"),
        )
    cols = [
        F.col("ticker"),
        F.col("n_days").cast("bigint").alias("n_days"),
    ]
    for lvl in VAR_LEVELS:
        k = F.col(f"k{lvl}")
        tail_sum = F.expr(
            f"aggregate(slice(sorted_chg, 1, k{lvl}), 0L, "
            "(acc, x) -> acc + x)"
        )
        cols += [
            F.element_at("sorted_chg", k).alias(f"var{lvl}_c"),
            (tail_sum / k).alias(f"cvar{lvl}_c"),
        ]
    return staged.select(*cols).orderBy("ticker")


VAR_CVAR_SQL = """
WITH c AS (
  SELECT ticker, date,
         CAST(ROUND(close * 100) AS BIGINT) AS close_c
  FROM prices
), chgs AS (
  SELECT ticker,
         close_c - LAG(close_c) OVER (PARTITION BY ticker ORDER BY date)
           AS chg
  FROM c
), per_t AS (
  SELECT ticker, CAST(COUNT(*) AS BIGINT) AS n_days,
         list_sort(list(chg)) AS sorted_chg
  FROM chgs WHERE chg IS NOT NULL GROUP BY 1
)
SELECT ticker, n_days,
       CAST(sorted_chg[greatest(CAST(ceil(n_days * CAST(0.05 AS DOUBLE)) AS INT), 1)] AS BIGINT) AS var95_c,
       CAST(list_sum(sorted_chg[1 : greatest(CAST(ceil(n_days * CAST(0.05 AS DOUBLE)) AS INT), 1)]) AS DOUBLE) / greatest(CAST(ceil(n_days * CAST(0.05 AS DOUBLE)) AS INT), 1)
         AS cvar95_c,
       CAST(sorted_chg[greatest(CAST(ceil(n_days * CAST(0.01 AS DOUBLE)) AS INT), 1)] AS BIGINT) AS var99_c,
       CAST(list_sum(sorted_chg[1 : greatest(CAST(ceil(n_days * CAST(0.01 AS DOUBLE)) AS INT), 1)]) AS DOUBLE) / greatest(CAST(ceil(n_days * CAST(0.01 AS DOUBLE)) AS INT), 1)
         AS cvar99_c
FROM per_t
ORDER BY ticker
"""


DONCH_PERIOD = 20  # prior-day lookback for the channel bounds


def donchian(prices: DataFrame, period: int = DONCH_PERIOD) -> DataFrame:
    """Per (ticker, date): Donchian channel over the PRIOR ``period``
    days — upper = highest high, lower = lowest low, both excluding the
    current bar (the breakout convention: today's close is judged
    against yesterday's channel, so a new high IS a breakout instead of
    instantly widening the band to swallow itself). Emitted only where
    the prior window is FULL. The turtle-trading channel/breakout
    primitive, complementing golden_cross (trend) and bollinger
    (dispersion) with pure EXTREMA.

    Exactness: bounds and the close comparison are int64 cents;
    width_c = upper_c - lower_c and mid2_c = upper_c + lower_c (doubled
    cent space, the ichimoku discipline) — zero division, zero floats.
    ``signal`` is 'breakout_up' / 'breakout_down' / 'inside'.

    Scale: two frames over ONE (ticker, date) sort — a single hash
    exchange, no joins, no Python; prices_drawdown's class.
    """
    w = Window.partitionBy("ticker").orderBy("date")
    prior = w.rowsBetween(-period, -1)
    high_c, low_c, close_c = cents("high"), cents("low"), cents("close")
    staged = prices.select(
        "ticker",
        "date",
        F.row_number().over(w).alias("rn"),
        close_c.alias("close_c"),
        F.max(high_c).over(prior).alias("upper_c"),
        F.min(low_c).over(prior).alias("lower_c"),
    )
    sig = (
        F.when(F.col("close_c") > F.col("upper_c"), F.lit("breakout_up"))
        .when(F.col("close_c") < F.col("lower_c"), F.lit("breakout_down"))
        .otherwise(F.lit("inside"))
    )
    return (
        staged.where(F.col("rn") > period)
        .select(
            "ticker",
            "date",
            "close_c",
            "upper_c",
            "lower_c",
            (F.col("upper_c") - F.col("lower_c")).alias("width_c"),
            (F.col("upper_c") + F.col("lower_c")).alias("mid2_c"),
            sig.alias("signal"),
        )
        .orderBy("ticker", "date")
    )


DONCHIAN_SQL = f"""
WITH c AS (
  SELECT ticker, date,
         CAST(ROUND(high * 100) AS BIGINT) AS high_c,
         CAST(ROUND(low * 100) AS BIGINT) AS low_c,
         CAST(ROUND(close * 100) AS BIGINT) AS close_c
  FROM prices
), s AS (
  SELECT ticker, date, close_c,
         ROW_NUMBER() OVER w AS rn,
         MAX(high_c) OVER prior AS upper_c,
         MIN(low_c) OVER prior AS lower_c
  FROM c
  WINDOW w AS (PARTITION BY ticker ORDER BY date),
         prior AS (PARTITION BY ticker ORDER BY date
                   ROWS BETWEEN {DONCH_PERIOD} PRECEDING AND 1 PRECEDING)
)
SELECT ticker, date, close_c, upper_c, lower_c,
       upper_c - lower_c AS width_c,
       upper_c + lower_c AS mid2_c,
       CASE WHEN close_c > upper_c THEN 'breakout_up'
            WHEN close_c < lower_c THEN 'breakout_down'
            ELSE 'inside' END AS signal
FROM s
WHERE rn > {DONCH_PERIOD}
ORDER BY ticker, date
"""


def heikin_ashi(prices: DataFrame) -> DataFrame:
    """Per (ticker, date): Heikin-Ashi candles — the smoothed OHLC
    transform chart platforms overlay to filter single-bar noise:

      ha_close = (open + high + low + close) / 4
      ha_open  = (prev ha_open + prev ha_close) / 2   (recursive;
                 seeds at (open + close) / 2 on the first bar)
      ha_high  = max(high, ha_open, ha_close)
      ha_low   = min(low,  ha_open, ha_close)

    Like macd this is a true recursion (ha_open depends on its own
    previous OUTPUT), so it folds per ticker over the date-sorted bars.
    Cross-engine parity rests on the macd discipline — BIT-IDENTICAL
    IEEE doubles via the identical op sequence in both engines — NOT on
    mathematical exactness: although every division is by a power of
    two, ha_open's dyadic denominator grows one bit per bar, so in
    cents-as-doubles the fold is exact only for short histories
    (~43 bars; beyond that the 2^-k tail falls off the 53-bit mantissa
    and /2 rounds). tests/test_r11_ops.py pins BOTH facts: the Fraction
    test proves exactness on a short series, and
    test_heikin_ashi_exactness_breaks_but_engines_agree demonstrates
    the ~bar-43 divergence from the mathematical value while a float
    fold with the identical op order stays bit-equal over the full
    series — exactly the guarantee the SQL twin relies on.

    Scale: one shuffle on ticker; state O(ticker's history), bounded by
    TIME (daily bars) — the prices_macd class.
    """
    per_t = prices.groupBy("ticker").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("date"),
                    cents("open").cast("double").alias("oc"),
                    cents("high").cast("double").alias("hc"),
                    cents("low").cast("double").alias("lc"),
                    cents("close").cast("double").alias("cc"),
                )
            )
        ).alias("ordered"),
    )
    ho = "if(acc.po is null, (o.oc + o.cc) / 2, (acc.po + acc.pc) / 2)"
    hcl = "(o.oc + o.hc + o.lc + o.cc) / 4"
    fold = F.expr(
        f"""
        aggregate(
          ordered,
          named_struct(
            'po', cast(null as double), 'pc', cast(null as double),
            'rows', cast(array() as array<struct<
              date:date,ho:double,hc:double,hh:double,hl:double>>)
          ),
          (acc, o) -> named_struct(
            'po', {ho},
            'pc', {hcl},
            'rows', array_append(acc.rows, named_struct(
              'date', o.date,
              'ho', {ho},
              'hc', {hcl},
              'hh', greatest(o.hc, {ho}, {hcl}),
              'hl', least(o.lc, {ho}, {hcl})
            ))
          )
        ).rows
        """
    )
    return (
        per_t.select("ticker", F.explode(fold).alias("r"))
        .select(
            "ticker",
            F.col("r.date").alias("date"),
            F.col("r.ho").alias("ha_open_c"),
            F.col("r.hc").alias("ha_close_c"),
            F.col("r.hh").alias("ha_high_c"),
            F.col("r.hl").alias("ha_low_c"),
            (F.col("r.hc") > F.col("r.ho")).alias("bullish"),
        )
        .orderBy("ticker", "date")
    )


# NOTE: must be prefixed by a WITH RECURSIVE chain that defines `prices`
# (the entry module rewrites the shared prices CTE accordingly, the
# prices_macd hook): ha_open recurses on its own previous output.
HEIKIN_SQL = """
, c AS (
  SELECT ticker, date,
         CAST(CAST(ROUND(open * 100) AS BIGINT) AS DOUBLE) AS oc,
         CAST(CAST(ROUND(high * 100) AS BIGINT) AS DOUBLE) AS hc,
         CAST(CAST(ROUND(low * 100) AS BIGINT) AS DOUBLE) AS lc,
         CAST(CAST(ROUND(close * 100) AS BIGINT) AS DOUBLE) AS cc
  FROM prices
), ord AS MATERIALIZED (
  SELECT ticker, date, oc, hc, lc, cc,
         ROW_NUMBER() OVER (PARTITION BY ticker ORDER BY date) AS rn
  FROM c
), r AS (
  SELECT ticker, date, rn, hc AS h, lc AS l,
         (oc + cc) / 2 AS ho,
         (oc + hc + lc + cc) / 4 AS hcl
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.ticker, o.date, o.rn, o.hc, o.lc,
         (r.ho + r.hcl) / 2,
         (o.oc + o.hc + o.lc + o.cc) / 4
  FROM r JOIN ord o ON o.ticker = r.ticker AND o.rn = r.rn + 1
)
SELECT ticker, date,
       ho AS ha_open_c,
       hcl AS ha_close_c,
       GREATEST(h, ho, hcl) AS ha_high_c,
       LEAST(l, ho, hcl) AS ha_low_c,
       hcl > ho AS bullish
FROM r
ORDER BY ticker, date
"""


AROON_PERIOD = 25  # 100 % 25 == 0, so aroon percentages are exact ints
_AROON_RN_BITS = 21  # rn < 2^21 bars/ticker (daily bars: ~8000 years)


def aroon(prices: DataFrame, period: int = AROON_PERIOD) -> DataFrame:
    """Per (ticker, date): Aroon indicator over the trailing
    ``period + 1`` bars (current included) — days since the window's
    highest high / lowest low, and the derived trend-strength
    percentages:

      aroon_up   = 100 * (period - days_since_high) / period
      aroon_down = 100 * (period - days_since_low)  / period
      oscillator = aroon_up - aroon_down

    The charting convention breaks extremum TIES toward the most
    recent bar. Emitted only where the window is full (rn > period),
    the donchian convention.

    Exactness: the "position of the latest max" is ONE integer window
    max over the packed key ``high_c * 2^21 + rn`` (ties on high_c
    resolve to the larger rn by construction); the min side packs
    ``(2^40 - low_c) * 2^21 + rn`` so the same MAX finds the lowest
    low. The packing preconditions — rn < 2^21 bars per ticker and
    cents in [0, 2^40) — are FAIL-FAST: an assert_true folded into the
    key expression (coalesce keeps the value; the fold stops Catalyst
    pruning an unused check column) raises instead of silently packing
    into the wrong bits. ``period`` must divide 100 (checked) so every
    output is an exact int64 — zero floats, zero division.

    Scale: two stacked window projections over ONE (ticker, date) sort
    — a single hash exchange, no joins, no Python; donchian's class.
    """
    if 100 % period != 0:
        raise ValueError("aroon period must divide 100 for exact-int output")
    scale = 100 // period
    shift = 1 << _AROON_RN_BITS
    w = Window.partitionBy("ticker").orderBy("date")
    win = w.rowsBetween(-period, 0)
    # two projections: rn first, the packed-key window maxes second
    # (window-over-window — both engines need the same staging)
    staged = prices.select(
        "ticker",
        "date",
        F.row_number().over(w).alias("rn"),
        cents("high").alias("high_c"),
        cents("low").alias("low_c"),
    )
    # fail-fast packing guard: rn and cents must fit their bit fields.
    # assert_true returns NULL on success; adding its coalesce into the
    # key keeps the value unchanged AND forces per-row evaluation (a
    # free-standing check column would be pruned as unused)
    ok = F.assert_true(
        (F.col("rn") < F.lit(shift))
        & (F.col("high_c") >= 0) & (F.col("high_c") < F.lit(1 << 40))
        & (F.col("low_c") >= 0) & (F.col("low_c") < F.lit(1 << 40)),
        F.lit("aroon packed-key precondition violated: need rn < 2^21 "
              "bars/ticker and cents in [0, 2^40)"),
    ).cast("bigint")
    key_h = F.col("high_c") * F.lit(shift) + F.col("rn") + F.coalesce(ok, F.lit(0))
    key_l = (F.lit(1 << 40) - F.col("low_c")) * F.lit(shift) + F.col("rn")
    keyed = staged.select(
        "ticker",
        "date",
        "rn",
        (F.col("rn") - F.max(key_h).over(win) % F.lit(shift)).alias("ds_high"),
        (F.col("rn") - F.max(key_l).over(win) % F.lit(shift)).alias("ds_low"),
    )
    up = (F.lit(period) - F.col("ds_high")) * F.lit(scale)
    down = (F.lit(period) - F.col("ds_low")) * F.lit(scale)
    return (
        keyed.where(F.col("rn") > period)
        .select(
            "ticker",
            "date",
            F.col("ds_high").cast("bigint").alias("days_since_high"),
            F.col("ds_low").cast("bigint").alias("days_since_low"),
            up.cast("bigint").alias("aroon_up"),
            down.cast("bigint").alias("aroon_down"),
            (up - down).cast("bigint").alias("oscillator"),
        )
        .orderBy("ticker", "date")
    )


AROON_SQL = f"""
WITH c AS (
  SELECT ticker, date,
         CAST(ROUND(high * 100) AS BIGINT) AS high_c,
         CAST(ROUND(low * 100) AS BIGINT) AS low_c,
         ROW_NUMBER() OVER (PARTITION BY ticker ORDER BY date) AS rn
  FROM prices
), k AS (
  SELECT ticker, date, rn,
         rn - (MAX(high_c * {1 << _AROON_RN_BITS} + rn) OVER win)
                % {1 << _AROON_RN_BITS} AS ds_high,
         rn - (MAX(({1 << 40} - low_c) * {1 << _AROON_RN_BITS} + rn) OVER win)
                % {1 << _AROON_RN_BITS} AS ds_low
  FROM c
  WINDOW win AS (PARTITION BY ticker ORDER BY date
                 ROWS BETWEEN {AROON_PERIOD} PRECEDING AND CURRENT ROW)
)
SELECT ticker, date,
       CAST(ds_high AS BIGINT) AS days_since_high,
       CAST(ds_low AS BIGINT) AS days_since_low,
       CAST(({AROON_PERIOD} - ds_high) * {100 // AROON_PERIOD} AS BIGINT)
         AS aroon_up,
       CAST(({AROON_PERIOD} - ds_low) * {100 // AROON_PERIOD} AS BIGINT)
         AS aroon_down,
       CAST(({AROON_PERIOD} - ds_high) * {100 // AROON_PERIOD}
            - ({AROON_PERIOD} - ds_low) * {100 // AROON_PERIOD} AS BIGINT)
         AS oscillator
FROM k
WHERE rn > {AROON_PERIOD}
ORDER BY ticker, date
"""


# ---------------------------------------------------------------------------
# 1-D Kalman filter (constant-level model) per ticker — r14
# ---------------------------------------------------------------------------

# process / observation variances in cents^2 — exact double literals
# shared with the oracle
KALMAN_Q = 25.0
KALMAN_R = 400.0


def kalman_filter(prices: DataFrame) -> DataFrame:
    """(ticker, n_days, kalman_level_c, kalman_var_c, last_close_c,
    resid_c): the steady-state of a 1-D Kalman filter (local-level
    model, fixed Q/R) folded over each ticker's close series — the
    classical optimal denoiser the EWMA family approximates, with the
    gain ADAPTING from the prior variance instead of a fixed alpha:

        p1 = p + Q
        k  = p1 / (p1 + R)
        m' = m + k * (x - m)          (seed: m = x_0, p = R)
        p' = (1 - k) * p1

    Determinism: the same pinned-(date) array fold as macd/holt — the
    recursion uses only +, -, *, / (each correctly rounded) in an op
    sequence written IDENTICALLY in the recursive-CTE oracle, so the
    doubles are bit-equal (DuckDB's list_reduce struct fold is
    unusable — the r9 Holt lesson — hence the row-wise recursion).
    Inputs are cents-as-doubles (exact ints < 2^53); Q/R are exact
    double literals.

    Scale: one shuffle on ticker; per-ticker state is the recursion's
    intrinsic need and bounded by TIME (daily bars), the documented
    finance-tier class. kalman_var_c converging to the fixed point of
    p' = (1-k)(p+Q) is the filter's own sanity check (pytest pins it).
    """
    close_c = cents("close")
    per_t = prices.groupBy("ticker").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.array_sort(
            F.collect_list(
                F.struct(F.col("date"), close_c.cast("double").alias("x"))
            )
        ).alias("ordered"),
    )
    q, r = KALMAN_Q, KALMAN_R
    fold = F.expr(
        f"""
        aggregate(
          ordered,
          named_struct('m', cast(null as double), 'p', cast(null as double),
                       'x', cast(null as double)),
          (acc, o) -> if(
            acc.m is null,
            named_struct('m', o.x, 'p', cast({r} as double), 'x', o.x),
            named_struct(
              'm', acc.m + ((acc.p + {q}) / ((acc.p + {q}) + {r}))
                     * (o.x - acc.m),
              'p', (1 - ((acc.p + {q}) / ((acc.p + {q}) + {r})))
                     * (acc.p + {q}),
              'x', o.x))
        )
        """
    )
    return (
        per_t.select("ticker", "n_days", fold.alias("s"))
        .select(
            "ticker",
            "n_days",
            F.col("s.m").alias("kalman_level_c"),
            F.col("s.p").alias("kalman_var_c"),
            F.col("s.x").alias("last_close_c"),
            (F.col("s.x") - F.col("s.m")).alias("resid_c"),
        )
        .orderBy("ticker")
    )


# continues the shared prices CTE; needs WITH RECURSIVE on the chain
# (the prices_macd assembly rule in __spark_entry__.oracle_sql)
KALMAN_SQL = f"""
, c AS (
  SELECT ticker, date,
         CAST(CAST(ROUND(close * 100) AS BIGINT) AS DOUBLE) AS x
  FROM prices
), ord AS MATERIALIZED (
  SELECT ticker, date, x,
         ROW_NUMBER() OVER (PARTITION BY ticker ORDER BY date) AS rn,
         COUNT(*) OVER (PARTITION BY ticker) AS n_days
  FROM c
), r AS (
  SELECT ticker, rn, n_days, x,
         x AS m, CAST({KALMAN_R} AS DOUBLE) AS p
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.ticker, o.rn, o.n_days, o.x,
         r.m + ((r.p + {KALMAN_Q}) / ((r.p + {KALMAN_Q}) + {KALMAN_R}))
             * (o.x - r.m),
         (1 - ((r.p + {KALMAN_Q}) / ((r.p + {KALMAN_Q}) + {KALMAN_R})))
             * (r.p + {KALMAN_Q})
  FROM r JOIN ord o ON o.ticker = r.ticker AND o.rn = r.rn + 1
)
SELECT ticker, CAST(n_days AS BIGINT) AS n_days,
       m AS kalman_level_c, p AS kalman_var_c,
       x AS last_close_c, x - m AS resid_c
FROM r
WHERE rn = n_days
ORDER BY ticker
"""
