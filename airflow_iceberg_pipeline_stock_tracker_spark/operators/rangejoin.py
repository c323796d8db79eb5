"""Binned (bucketed) range join — the scale path for time-interval joins.

The reference has no non-equi join at all (its only join surface is the
per-date table promotion, dags/dag.py:308-330); but any user extending
the stock/events domain hits "join rows to a time WINDOW" immediately
(events within N minutes of an alert, trades within a quote's validity
interval — the classic as-of/range pair). Spark compiles a raw
`a.ts BETWEEN b.lo AND b.hi` join to BroadcastNestedLoopJoin (or a
cartesian + filter): O(|A|x|B|) comparisons, a guaranteed 100 TB
killer the optimizer cannot rescue because there is no equi-key.

The fix is standard interval binning (DuckDB's IEJoin and Databricks'
range-join hints solve it the same way): quantize time into
fixed-width buckets, explode each interval to the buckets it overlaps
(bounded fan-out = interval_width / bucket_width + 1), then equi-join
on (partition_key, bucket) and re-apply the exact range predicate as a
residual filter. The plan becomes an ordinary shuffled equi-join:
partial aggregation, AQE skew splitting, and broadcast promotion all
apply again.

Scale shape at 100 TB: shuffle moves each probe row once and each
interval row (width/bucket + 1) times; no pairwise blow-up ever
materializes. Bucket width trades fan-out on the build side against
residual-filter selectivity on the probe side — size it near the
median interval width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join_binned", "error_followup_counts"]


def range_join_binned(
    probe: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    probe_ts: str = "ts",
    lo: str = "lo",
    hi: str = "hi",
    bucket_seconds: int = 600,
) -> DataFrame:
    """Join probe rows to intervals with `lo < probe_ts <= hi`.

    `keys` are the equi-partition columns present on BOTH sides (e.g.
    user_id); the bucket column is appended to them, so the shuffle key
    is (keys..., bucket) and co-partitions both sides. Returns the
    joined frame (all probe columns + all interval columns except its
    bucket helpers).

    The exact predicate is re-applied after the equi-join, so results
    are identical to the naive non-equi join for any bucket width —
    bucketing is purely a physical rewrite (asserted in tests by
    equality against a small cross-join reference).
    """
    b = F.lit(bucket_seconds).cast("long")
    ivals = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(lo) / b).cast("long"),
                (F.unix_timestamp(hi) / b).cast("long"),
            )
        ),
    )
    probed = probe.withColumn(
        "__bucket", (F.unix_timestamp(probe_ts) / b).cast("long")
    )
    joined = probed.join(ivals, [*keys, "__bucket"]).where(
        (F.col(probe_ts) > F.col(lo)) & (F.col(probe_ts) <= F.col(hi))
    )
    return joined.drop("__bucket")


def error_followup_counts(events: DataFrame, window_minutes: int = 10) -> DataFrame:
    """Per error event: how many of the SAME user's events land in the
    following `window_minutes`-minute window — a range join of the events
    table against intervals derived from its own error rows.

    Exact-arithmetic surface (counts + exact-cents sums) so the oracle
    hashes bit-for-bit.
    """
    errors = events.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr(f"INTERVAL {window_minutes} MINUTES")).alias("hi"),
    )
    followups = range_join_binned(
        events.select("user_id", "ts", "value"),
        errors,
        keys=["user_id"],
        bucket_seconds=window_minutes * 60,
    )
    return (
        followups.groupBy("error_id", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_followups"),
            (F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0).alias(
                "followup_value"
            ),
        )
        .orderBy("error_id")
    )


ERROR_FOLLOWUP_SQL = """
SELECT e.event_id AS error_id,
       e.user_id,
       COUNT(*) AS n_followups,
       SUM(CAST(ROUND(f.value * 100) AS BIGINT)) / 100.0 AS followup_value
FROM events e
JOIN events f
  ON f.user_id = e.user_id
 AND f.ts > e.ts
 AND f.ts <= e.ts + INTERVAL 10 MINUTE
WHERE e.event_type = 'error'
GROUP BY 1, 2
ORDER BY 1
"""
