"""Derive a `daily_stock_prices`-shaped frame from the driver's lineitem table.

The reference's fact table (``/root/reference/dags/dag.py:132-148``) is one
row per (ticker, date) with OHLCV measures. The driver's correctness harness
runs on TPC-H-ish parquet, so we materialize the same shape deterministically
from `lineitem` (FIXTURES.md §B mapping):

  ticker := l_returnflag || l_linestatus            (6 distinct values)
  date   := cast(l_shipdate as date)
  low    := min(l_extendedprice)
  high   := max(l_extendedprice)
  open   := low   (deterministic; keeps the low <= open <= high invariant)
  close  := (low + high) / 2                        (in [low, high] by construction)
  volume := cast(sum(l_quantity) as bigint)

Every measure is EXACT across engines: min/max return input doubles
unchanged, (low+high)/2 is deterministic double arithmetic, and l_quantity
is integral so its sum is exact. No round() on order-dependent aggregates
(avg/sum of doubles) — cross-engine summation-order ulp noise next to a
.xx5 tie flips the rounded value and breaks the oracle hash. The pipeline's
table-backed variant applies the reference's DECIMAL(10,2) casts at the
parquet/Iceberg sink instead (schemas.py).

Scale note: this is a single hash aggregation keyed by (ticker, date) —
map-side partial aggregation collapses each scan partition to at most
|tickers| x |dates| rows before the shuffle, so the shuffle volume is bounded
by the group cardinality (~15k groups) regardless of input size. At 100 TB
the same plan holds: the scan is the only full-data pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_table

PRICES_ORACLE_SQL = """
SELECT l_returnflag || l_linestatus AS ticker,
       CAST(l_shipdate AS DATE)    AS date,
       MIN(l_extendedprice) AS open,
       MAX(l_extendedprice) AS high,
       MIN(l_extendedprice) AS low,
       (MIN(l_extendedprice) + MAX(l_extendedprice)) / 2 AS close,
       CAST(SUM(l_quantity) AS BIGINT) AS volume
FROM lineitem
GROUP BY 1, 2
"""


def prices_standin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ticker, date, open, high, low, close, volume) derived from lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.concat("l_returnflag", "l_linestatus").alias("ticker"),
            F.col("l_shipdate").cast("date").alias("date"),
            "l_extendedprice",
            "l_quantity",
        )
        .groupBy("ticker", "date")
        .agg(
            F.min("l_extendedprice").alias("open"),
            F.max("l_extendedprice").alias("high"),
            F.min("l_extendedprice").alias("low"),
            ((F.min("l_extendedprice") + F.max("l_extendedprice")) / 2).alias("close"),
            F.sum("l_quantity").cast("bigint").alias("volume"),
        )
    )


# Tickers produced by the stand-in mapping — the DQ "valid ticker" list
# (reference analogue: the MAANG list at dag.py:61,276).
STANDIN_TICKERS = ["AF", "AO", "NF", "NO", "RF", "RO"]

# A date known to exist at every scale factor (lineitem spans 1995-2001).
DEFAULT_DS = "1998-06-15"
