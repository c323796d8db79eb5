"""Stream-stream interval join with watermark-bounded state.

The batch twin is operators/rangejoin.py (binned range join); this is
the same semantic — "events within N minutes after an error, same
user" — expressed as a native Structured Streaming stream-stream join.

Why this shape survives unbounded streams: both sides carry an event-time
watermark AND the join condition bounds event time on both sides
(`e.ts < f.ts <= e.ts + N minutes`), so Spark can prove when a buffered
row can never match again and evict it — join state is
O(rows inside the watermark horizon), not O(stream history). Without
the time-range condition the state store would grow forever; Spark
rejects such joins in append mode for exactly that reason.

At cluster scale the join shuffles both streams on user_id once per
micro-batch and keeps the range probe inside the co-partitioned state
store — the streaming analogue of the batch binned equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "1 hour"

__all__ = ["interval_join_error_followups"]


def interval_join_error_followups(
    events: DataFrame,
    window_minutes: int = 10,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Join an events stream to its own error rows: emit one row per
    (error event, follow-up event of the same user within the window).

    Append-mode output (pairs, no post-join aggregation): each matched
    pair is emitted exactly once when both sides have arrived, keeping
    the query single-stateful-operator and its results equal to the
    batch range join row-for-row.
    """
    errors = (
        events.where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("err_user"),
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", watermark)
    )
    followups = events.select(
        F.col("event_id").alias("followup_id"),
        "user_id",
        "ts",
        "value",
    ).withWatermark("ts", watermark)

    return (
        errors.join(
            followups,
            (F.col("err_user") == F.col("user_id"))
            & (F.col("ts") > F.col("err_ts"))
            & (
                F.col("ts")
                <= F.col("err_ts") + F.expr(f"INTERVAL {window_minutes} MINUTES")
            ),
        )
        .select(
            "error_id",
            "user_id",
            "followup_id",
            (F.round(F.col("value") * 100)).cast("bigint").alias("value_cents"),
        )
    )


# pair-level oracle: every (error, follow-up) match, exact cents
INTERVAL_JOIN_SQL = """
SELECT e.event_id AS error_id,
       e.user_id,
       f.event_id AS followup_id,
       CAST(ROUND(f.value * 100) AS BIGINT) AS value_cents
FROM events e
JOIN events f
  ON f.user_id = e.user_id
 AND f.ts > e.ts
 AND f.ts <= e.ts + INTERVAL 10 MINUTE
WHERE e.event_type = 'error'
"""
