"""Format-agnostic ingestion: JSONL and CSV sources with pinned schemas.

The reference ingests exactly one format (REST JSON bodies,
dags/dag.py:66-107); a lake ingest layer meets JSONL dumps and CSV
exports on day one. The rule these helpers enforce: ALWAYS read with an
explicit schema. Schema inference scans the data twice, silently
widens types (ints -> doubles, timestamps -> strings), and produces a
different schema per batch of files — at 100 TB both the extra scan and
the drift are disqualifying. With a pinned schema both formats land
byte-identical to the parquet path (pytest-proven round-trip).

Timestamps: written as ISO-8601 (Spark's JSON/CSV default); read back
under the pinned TimestampType with the session fixed to UTC, so the
round trip is exact at microsecond precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "write_jsonl", "read_jsonl", "write_csv", "read_csv",
    "write_orc", "read_orc",
]

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("timestampFormat", _TS_FMT).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("timestampFormat", _TS_FMT)
        # corrupt lines fail loudly instead of becoming silent nulls
        .option("mode", "FAILFAST")
        .json(path)
    )


def write_csv(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", _TS_FMT)
        # quote/escape defaults handle embedded commas and quotes (the
        # events.props column is JSON text)
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", _TS_FMT)
        .option("mode", "FAILFAST")
        .csv(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (built-in vectorized reader/writer, columnar like parquet).

    ORC is the other lake-native columnar format a migration meets (Hive
    warehouses); Spark's reader does predicate pushdown and column
    pruning for it exactly as for parquet, so downstream plans keep
    their scan-level filters. zlib default compression; types map 1:1
    for the driver tables (pytest-proven exact round-trip incl.
    microsecond timestamps).
    """
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    # same pinned-schema rule as JSONL/CSV: never infer per-batch
    return spark.read.schema(schema).orc(path)
