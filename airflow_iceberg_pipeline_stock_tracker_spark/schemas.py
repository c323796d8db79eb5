"""Static schema contracts.

Spark equivalents of the reference DDL (types per SURVEY §1.2):
  daily_stock_prices            /root/reference/dags/dag.py:132-148
  daily_stock_prices_stg_*      /root/reference/dags/dag.py:158-175 (same cols)
  daily_stock_prices_cumulative /root/reference/dags/dag.py:336-354
  Polygon/Massive API bar shape /root/reference/dags/dag.py:80-102
"""

from __future__ import annotations

from pyspark.sql import types as T

# The five tickers the reference ingests (dag.py:61) and the per-day
# expected distinct-ticker count used by DQ check 1 (dag.py:205-211).
REFERENCE_TICKERS = ["AAPL", "AMZN", "NFLX", "GOOGL", "META"]

DEC_PRICE = T.DecimalType(10, 2)   # OHLC, vwap        (dag.py:136-141)
DEC_AVG_VOL = T.DecimalType(15, 2)  # avg_7_day_volume (dag.py:347)
DEC_VOLATILITY = T.DecimalType(10, 4)  # volatility_7_day (dag.py:348)

STOCK_PRICE_SCHEMA = T.StructType(
    [
        T.StructField("ticker", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("open", DEC_PRICE, True),
        T.StructField("high", DEC_PRICE, True),
        T.StructField("low", DEC_PRICE, True),
        T.StructField("close", DEC_PRICE, True),
        T.StructField("volume", T.LongType(), True),
        T.StructField("vwap", DEC_PRICE, True),
        T.StructField("transactions", T.IntegerType(), True),
        T.StructField("insertion_timestamp", T.TimestampType(), True),
    ]
)

CUMULATIVE_SCHEMA = T.StructType(
    [
        T.StructField("ticker", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("last_7_days_open", T.ArrayType(DEC_PRICE), True),
        T.StructField("last_7_days_high", T.ArrayType(DEC_PRICE), True),
        T.StructField("last_7_days_low", T.ArrayType(DEC_PRICE), True),
        T.StructField("last_7_days_close", T.ArrayType(DEC_PRICE), True),
        T.StructField("last_7_days_volume", T.ArrayType(T.LongType()), True),
        T.StructField("avg_7_day_volume", DEC_AVG_VOL, True),
        T.StructField("volatility_7_day", DEC_VOLATILITY, True),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

# Raw API bar, pre-DECIMAL-cast (floats as the REST API returns them,
# dag.py:95-100): used by sources/stock_api.py ingestion.
API_BAR_SCHEMA = T.StructType(
    [
        T.StructField("ticker", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.DoubleType(), True),
        T.StructField("vwap", T.DoubleType(), True),
        T.StructField("timestamp", T.LongType(), True),
        T.StructField("transactions", T.LongType(), True),
    ]
)

# Driver-provided test tables (TESTDATA.md) — names only; parquet is
# self-describing so we never redeclare their schemas.
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
