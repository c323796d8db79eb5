"""Exact money arithmetic for oracle-comparable aggregates.

Summing doubles is order-dependent: Spark's partitioned partial aggregates
and DuckDB's single-node sums disagree in the last ulp, and `round()` next
to a .xx5 tie then flips the output. The fix is to centify BEFORE
aggregating: per-row `round(x * 100)` is a deterministic function of the
input double (identical in both engines), bigint sums are exact in any
order, and the final `/ 100.0` is an exact double division.

This is also the right call at 100 TB independent of the oracle: integer
aggregation is associative/commutative, so map-side partial aggregation
and AQE re-partitioning can never change the result.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str, scale: int = 100) -> Column:
    """Per-row exact integer representation: round(col * scale) as bigint."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * scale, 0).cast("bigint")


def dollars(cents_col: Column | str, scale: int = 100) -> Column:
    """Back to a double after exact integer aggregation."""
    c = F.col(cents_col) if isinstance(cents_col, str) else cents_col
    return c / float(scale)


def cents_sql(expr: str, scale: int = 100) -> str:
    """DuckDB twin of :func:`cents` for oracle SQL strings."""
    return f"CAST(ROUND(({expr}) * {scale}) AS BIGINT)"
