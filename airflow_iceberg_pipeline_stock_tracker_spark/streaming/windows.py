"""Watermarked event-time windows over an events stream.

Streaming twins of the batch queries in plans/queries.py
(events_hourly / events_sessionize). Source-agnostic: each operator is
DataFrame -> DataFrame and works on any streaming frame with
(ts timestamp, event_type, user_id, event_id, value) columns — tests
drive them from a parquet file source with Trigger.AvailableNow, which
is also how the daily-batch parity run works at scale.

Semantics / scale notes:
  * `withWatermark` bounds state: a tumbling hourly aggregate keeps only
    windows newer than (max event time - watermark); state per window is
    one partial aggregate row per (window, event_type) — O(active
    windows), never O(events).
  * Exact COUNT(DISTINCT) is not available under incremental
    aggregation (it would need full value state); we carry the distinct
    user set as `collect_set` state (exact, bounded by the per-window
    user cardinality) — the honest streaming trade-off vs
    `approx_count_distinct` whose HLL sketch is O(1) but approximate.
  * `session_window` implements gap-based sessionization (same merge
    semantics as the batch lag-over-window formulation: events whose
    gaps are <= gap coalesce into one session).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "1 hour"
SESSION_GAP = "30 minutes"  # batch twin: SESSION_GAP_S = 1800 (queries.py)


def _cents(col: str) -> Column:
    # exact money math: aggregate integer cents, render dollars at the end
    return F.round(F.col(col) * 100).cast("bigint")


def hourly_tumbling(
    events: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Tumbling 1-hour event-time aggregate per event_type.

    Streaming twin of events_hourly (plans/queries.py): same output
    columns, with the window rendered as its start hour.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.size(F.collect_set("user_id")).alias("n_users"),
            (F.sum(_cents("value")) / 100.0).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
            "n_events",
            "n_users",
            "total_value",
        )
    )


def sliding_value(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Sliding-window value totals per event_type.

    Each event lands in window/slide overlapping windows; state cost is
    (overlap factor) x (active windows), still independent of history.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(_cents("value")) / 100.0).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = SESSION_GAP,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Gap-based sessions per user via `session_window`.

    Streaming twin of events_sessionize: sessions close once the
    watermark passes (last event ts + gap), so state is only the open
    sessions. Output matches the batch shape minus the per-user ordinal
    (a global running count has no streaming equivalent — session
    identity here is its start time).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            (F.sum(_cents("value")) / 100.0).alias("session_value"),
        )
        .select(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            "session_value",
        )
    )


def enriched_hourly(
    events: DataFrame, dim: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Stream-static enrichment join -> tumbling hourly totals per segment.

    The stream-static join is STATELESS: every micro-batch joins against
    the dimension's current snapshot — no join state, no watermark
    interplay, unlike stream-stream joins. The broadcast hint keeps the
    dim map-side, so at 100 TB the stream never shuffles for the
    enrichment; only the windowed aggregate is stateful (O(active
    windows × segments)). This is THE production enrichment shape:
    join first, aggregate on the enriched key.
    """
    return (
        events.withWatermark("ts", watermark)
        .join(F.broadcast(dim), "user_id", "left_outer")
        .groupBy(F.window("ts", "1 hour").alias("w"), "segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(_cents("value")) / 100.0).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:00:00").alias("hour"),
            "segment",
            "n_events",
            "total_value",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "complete") -> None:
    """Drive a streaming frame to a memory sink with AvailableNow and wait.

    AvailableNow processes everything currently in the source then
    stops — the batch-parity trigger (SURVEY §2.7).
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
