"""Skew-safe aggregation building blocks.

A groupBy on a low-cardinality key (event_type here: a handful of values
over millions of rows) concentrates every row of a hot key onto one
reducer — the canonical straggler at 100 TB. Two standard fixes, both
exact:

  salted partial aggregation   phase 1 groups on (key, salt) so a hot
                               key spreads over `buckets` reducers and
                               map-side combine stays effective; phase 2
                               merges the per-salt partials. Exact for
                               decomposable aggregates (sum/count/min/
                               max) — integer cents keep money sums
                               bit-exact under any regrouping.
  two-phase distinct           COUNT(DISTINCT x) per key as
                               distinct(key, x) -> count per key: the
                               first shuffle keys on (key, x), which is
                               high-cardinality and therefore balanced.

The salt is a deterministic hash of a high-cardinality column (never
rand(): retries/speculative tasks must produce identical partials).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 32


def salt_col(high_card_col: str, buckets: int = DEFAULT_BUCKETS) -> Column:
    return F.pmod(F.hash(high_card_col), F.lit(buckets)).alias("salt")


def salted_sum_count(
    df: DataFrame,
    key: str,
    sum_cols: dict[str, Column],
    high_card_col: str,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-key exact sums + row count via salted two-phase aggregation.

    `sum_cols` maps output name -> column expression to sum (use integer
    cents for money). Returns one row per key with each sum and `n_rows`.
    """
    partial = df.groupBy(F.col(key), salt_col(high_card_col, buckets)).agg(
        *[F.sum(expr).alias(f"p_{name}") for name, expr in sum_cols.items()],
        F.count(F.lit(1)).alias("p_n"),
    )
    return partial.groupBy(key).agg(
        *[F.sum(f"p_{name}").alias(name) for name in sum_cols],
        F.sum("p_n").alias("n_rows"),
    )


def two_phase_distinct_count(
    df: DataFrame, key: str, distinct_col: str, out: str = "n_distinct"
) -> DataFrame:
    """Exact COUNT(DISTINCT distinct_col) per key, skew-balanced.

    NULLs in `distinct_col` are excluded, matching SQL COUNT(DISTINCT x)
    (a key whose rows are all NULL yields 0, not 1).
    """
    return (
        df.select(key, distinct_col)
        .where(F.col(distinct_col).isNotNull())
        .distinct()
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias(out))
    )
