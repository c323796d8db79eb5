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

__all__ = [
    "interval_join_error_followups",
    "error_followup_hourly",
    "left_outer_interval_join",
]


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
            # err_ts retained (still watermarked) so a downstream windowed
            # aggregation can chain onto the join — see error_followup_hourly
            "err_ts",
            (F.round(F.col("value") * 100)).cast("bigint").alias("value_cents"),
        )
    )


def error_followup_hourly(
    events: DataFrame,
    window_minutes: int = 10,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """CHAINED stateful operators: stream-stream interval join feeding a
    windowed aggregation, both in one continuous append-mode query —
    hourly (pair count, exact-cents value) of error follow-ups.

    Emission semantics (pinned empirically, see tests):
      * with multiple watermarked inputs the global watermark is the MIN
        across them — here max(err_ts) - delay, since errors are a
        subset of events — floored to MILLISECONDS;
      * the join DELAYS its output watermark by the join condition's
        event-time range (the 10-minute interval): a joined row's
        err_ts can be up to 10 minutes older than the follow-up that
        completed it, so downstream state can only finalize up to
        wm_in - 10min;
      * the downstream window then emits only when
        `window.end < wm_in - 10min` STRICTLY.
    The batch oracle applies the identical cut, so the drained result
    is exactly reproducible in SQL.
    """
    pairs = interval_join_error_followups(events, window_minutes, watermark)
    return (
        pairs.groupBy(F.window("err_ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("value_cents").alias("followup_cents"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:00:00").alias("hour"),
            "n_pairs",
            "followup_cents",
        )
    )


# pair-level oracle: every (error, follow-up) match, exact cents
INTERVAL_JOIN_SQL = """
SELECT e.event_id AS error_id,
       e.user_id,
       f.event_id AS followup_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS err_ts,
       CAST(ROUND(f.value * 100) AS BIGINT) AS value_cents
FROM events e
JOIN events f
  ON f.user_id = e.user_id
 AND f.ts > e.ts
 AND f.ts <= e.ts + INTERVAL 10 MINUTE
WHERE e.event_type = 'error'
"""


# chained-stateful oracle: cut = min input watermark (max error ts,
# floored to Spark's millisecond watermark granularity, minus the 1h
# delay) further delayed by the join's 10-minute event-time range;
# emission strictly below it — every term pinned by tests and mirrored
# here exactly
CHAINED_HOURLY_SQL = """
WITH pairs AS (
  SELECT date_trunc('hour', e.ts) AS ws,
         CAST(ROUND(f.value * 100) AS BIGINT) AS c
  FROM events e
  JOIN events f
    ON f.user_id = e.user_id
   AND f.ts > e.ts
   AND f.ts <= e.ts + INTERVAL 10 MINUTE
  WHERE e.event_type = 'error'
)
SELECT strftime(ws, '%Y-%m-%d %H:00:00') AS hour,
       COUNT(*) AS n_pairs,
       -- CAST: DuckDB SUM(BIGINT) widens to HUGEINT -> float64 under the
       -- driver's pandas canonicalizer; Spark stays BIGINT
       CAST(SUM(c) AS BIGINT) AS followup_cents
FROM pairs
WHERE ws + INTERVAL 1 HOUR
      < (SELECT date_trunc('milliseconds', max(ts))
                - INTERVAL 1 HOUR - INTERVAL 10 MINUTE
         FROM events WHERE event_type = 'error')
GROUP BY ws
"""


def left_outer_interval_join(
    events: DataFrame,
    window_minutes: int = 10,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every error emits — with
    its follow-ups when they arrive, or once with NULL follow-up columns
    when the watermark proves no follow-up can still come.

    The outer side is why the time bound is mandatory, not just an
    optimization: Spark emits the null-padded row only when the
    watermark passes ``err_ts + window`` (the point after which a match
    is impossible), so the unmatched-row latency IS the watermark delay
    plus the window. State stays O(horizon) exactly as in the inner
    variant.

    Emission cut (mirrored in LEFT_OUTER_JOIN_SQL, pinned by the oracle
    row): an unmatched error is emitted iff
    ``err_ts + window < min-input-watermark`` where the global watermark
    is ``floor_ms(max err_ts) - delay`` (errors are a subset of events,
    so theirs is the min input).
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
            "left_outer",
        )
        .select(
            "error_id",
            F.col("err_user").alias("user_id"),
            "followup_id",
            "err_ts",
            (F.round(F.col("value") * 100)).cast("bigint").alias("value_cents"),
        )
    )


# LEFT OUTER oracle: all matched pairs (emitted on arrival, no cut) plus
# the null-padded unmatched errors the watermark had already proven
# matchless when the stream ended
LEFT_OUTER_JOIN_SQL = """
WITH wm AS (
  SELECT date_trunc('milliseconds', max(ts)) - INTERVAL 1 HOUR AS w
  FROM events WHERE event_type = 'error'
), matched AS (
  SELECT e.event_id AS error_id, e.user_id,
         f.event_id AS followup_id,
         e.ts AS err_ts,
         CAST(ROUND(f.value * 100) AS BIGINT) AS value_cents
  FROM events e
  JOIN events f
    ON f.user_id = e.user_id
   AND f.ts > e.ts
   AND f.ts <= e.ts + INTERVAL 10 MINUTE
  WHERE e.event_type = 'error'
), unmatched AS (
  SELECT e.event_id AS error_id, e.user_id,
         CAST(NULL AS BIGINT) AS followup_id,
         e.ts AS err_ts,
         CAST(NULL AS BIGINT) AS value_cents
  FROM events e
  WHERE e.event_type = 'error'
    AND e.ts + INTERVAL 10 MINUTE < (SELECT w FROM wm)
    AND NOT EXISTS (SELECT 1 FROM events f
                    WHERE f.user_id = e.user_id
                      AND f.ts > e.ts
                      AND f.ts <= e.ts + INTERVAL 10 MINUTE)
)
SELECT error_id, user_id, followup_id,
       strftime(err_ts, '%Y-%m-%d %H:%M:%S.%f') AS err_ts,
       value_cents
FROM (SELECT * FROM matched UNION ALL SELECT * FROM unmatched)
"""
