"""Time-series analytics operators: OHLC bar rollup, funnel progression,
retention cohorts.

The reference is a stock tracker whose only derived product is a 7-day
rolling table (`/root/reference/dags/dag.py:385-437`); these operators
extend that time-series surface with the three queries every
market/event analytics user reaches for next — downsampled OHLC bars,
ordered-stage funnels, and cohort retention — each expressed as pure
DataFrame plans (one keyed shuffle each, no UDFs) with DuckDB oracle
twins.

Determinism discipline (cross-engine hashing): "first"/"last" inside a
bucket are ordered by the unique (ts, event_id) pair via min/max over a
packed struct — Spark's struct ordering is lexicographic by field — and
DuckDB mirrors it with ordered aggregates (`first(x ORDER BY ts,
event_id)`). Money goes through exact integer cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.money import cents, dollars

__all__ = ["ohlc_bars", "funnel", "retention_cohorts"]


def ohlc_bars(events: DataFrame, bucket: str = "1 hour") -> DataFrame:
    """Downsample raw events into per-(bucket, event_type) OHLC bars.

    open/close = value of the first/last event in the bar (ordered by
    (ts, event_id) — unique, so deterministic under any partitioning);
    high/low = max/min; volume = row count; total = exact-cents sum.

    100 TB shape: a single map-side-combinable groupBy on
    (time bucket, type) — the struct-packed min/max are ordinary
    partial-aggregatable functions, so the shuffle carries one partial
    bar per (partition, key), not raw events. At 1000 executors this is
    the same plan TimescaleDB's continuous aggregates / Spark's own
    window(...) rollups produce. Rolling a finer bar into a coarser one
    (hour -> day) re-runs the same plan over bars, since
    first-by-(ts,id) composes associatively.
    """
    first_struct = F.min(F.struct("ts", "event_id", cents("value").alias("v")))
    last_struct = F.max(F.struct("ts", "event_id", cents("value").alias("v")))
    return (
        events.groupBy(
            F.window("ts", bucket).start.alias("bar_start"), "event_type"
        )
        .agg(
            dollars(first_struct.getField("v")).alias("open"),
            dollars(F.max(cents("value"))).alias("high"),
            dollars(F.min(cents("value"))).alias("low"),
            dollars(last_struct.getField("v")).alias("close"),
            F.count(F.lit(1)).alias("volume"),
            dollars(F.sum(cents("value"))).alias("total_value"),
        )
        .select(
            F.date_format("bar_start", "yyyy-MM-dd HH:mm:ss").alias("bar_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "volume",
            "total_value",
        )
        .orderBy("bar_start", "event_type")
    )


OHLC_BARS_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bar_start,
       event_type,
       first(CAST(ROUND(value * 100) AS BIGINT) ORDER BY ts, event_id) / 100.0 AS open,
       MAX(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS high,
       MIN(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS low,
       last(CAST(ROUND(value * 100) AS BIGINT) ORDER BY ts, event_id) / 100.0 AS close,
       COUNT(*) AS volume,
       SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS total_value
FROM events
GROUP BY 1, 2
ORDER BY bar_start, event_type
"""


def rollup_bars(bars: DataFrame, bucket: str = "1 day") -> DataFrame:
    """Roll finer OHLC bars up into coarser ones (hour -> day) — the
    hypertable/continuous-aggregate pattern: the coarse bar is computed
    FROM the fine bars, never from raw events.

    Correct because every OHLC component is associative: open/close =
    first/last over bar_start (fine bars are unique per (bucket, type),
    so the ordering is total), high/low = max/min, volume/total = sums.
    At 100 TB this is the difference between scanning a day of raw ticks
    and scanning 24 pre-aggregated rows per key — the fine-bar table is
    ~4 orders of magnitude smaller than its source, and the rollup
    re-runs the identical one-shuffle plan on it.

    Money columns round-trip through exact cents (`cents(dollars(x)) ==
    x` for 2-decimal values), so composing rollups loses nothing.
    """
    ts = F.to_timestamp("bar_start")
    first_struct = F.min(F.struct(ts.alias("t"), cents("open").alias("v")))
    last_struct = F.max(F.struct(ts.alias("t"), cents("close").alias("v")))
    return (
        bars.groupBy(
            F.window(ts, bucket).start.alias("bar_start"), "event_type"
        )
        .agg(
            dollars(first_struct.getField("v")).alias("open"),
            dollars(F.max(cents("high"))).alias("high"),
            dollars(F.min(cents("low"))).alias("low"),
            dollars(last_struct.getField("v")).alias("close"),
            F.sum("volume").alias("volume"),
            dollars(F.sum(cents("total_value"))).alias("total_value"),
        )
        .select(
            F.date_format("bar_start", "yyyy-MM-dd HH:mm:ss").alias("bar_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "volume",
            "total_value",
        )
        .orderBy("bar_start", "event_type")
    )


# oracle computes the DAILY bars straight from raw events — hash-equality
# against rollup_bars(ohlc_bars(events)) is a proof that the hour->day
# composition is exact, not just plausible
OHLC_DAILY_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bar_start,
       event_type,
       first(CAST(ROUND(value * 100) AS BIGINT) ORDER BY ts, event_id) / 100.0 AS open,
       MAX(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS high,
       MIN(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS low,
       last(CAST(ROUND(value * 100) AS BIGINT) ORDER BY ts, event_id) / 100.0 AS close,
       COUNT(*) AS volume,
       SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS total_value
FROM events
GROUP BY 1, 2
ORDER BY bar_start, event_type
"""


# funnel stages, in order; a user is at stage k if they completed
# stages 1..k in timestamp order (each stage strictly after the previous
# one was first reached)
FUNNEL_STAGES = ["signup", "click", "purchase"]


def funnel(events: DataFrame) -> DataFrame:
    """Ordered-stage funnel: per user, the earliest time each stage was
    reached GIVEN the previous stage had already been reached.

    stage_ts(1) = min ts of stage-1 events; stage_ts(k) = min ts of
    stage-k events at-or-after stage_ts(k-1). `stage_reached` counts
    completed stages, so `GROUP BY stage_reached` downstream is the
    funnel report.

    Plan: ONE groupBy(user_id). stage k's threshold is only known after
    aggregation, so a per-stage conditional MIN can't express the chain
    in one pass — instead each user's per-stage timestamps are collected
    into sorted arrays (user-local, bounded by that user's event count —
    the same skew profile as sessionize) and the chain is resolved with
    array `filter`/`element_at` in the projection. No second shuffle, no
    self-join per stage (the SQL oracle's 3-join formulation is the
    plan this one avoids).
    """
    per_stage = [
        F.sort_array(
            F.collect_list(
                F.when(F.col("event_type") == s, F.col("ts"))
            )
        ).alias(f"ts_{s}")
        for s in FUNNEL_STAGES
    ]
    agg = events.groupBy("user_id").agg(*per_stage)

    # resolve the chain: stage_ts(k) = first element of ts_k >= stage_ts(k-1)
    prev = None
    stage_exprs: list = []
    for s in FUNNEL_STAGES:
        arr = F.col(f"ts_{s}")
        # F.get, not element_at: null-safe on empty arrays under ANSI mode
        if prev is None:
            cur = F.get(arr, 0)
        else:
            hits = F.filter(arr, lambda t: t >= prev)  # noqa: B023
            cur = F.when(prev.isNotNull(), F.get(hits, 0))
        stage_exprs.append(
            F.date_format(cur, "yyyy-MM-dd HH:mm:ss").alias(f"{s}_ts")
        )
        prev = cur
    agg = agg.select("user_id", *stage_exprs)
    reached = sum(
        F.col(f"{s}_ts").isNotNull().cast("int") for s in FUNNEL_STAGES
    )
    return agg.select(
        "user_id", *[f"{s}_ts" for s in FUNNEL_STAGES],
        reached.alias("stage_reached"),
    ).orderBy("user_id")


FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS click_ts
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= s1.signup_ts
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= s2.click_ts
  GROUP BY e.user_id
), base AS (SELECT DISTINCT user_id FROM events)
SELECT b.user_id,
       strftime(s1.signup_ts, '%Y-%m-%d %H:%M:%S') AS signup_ts,
       strftime(s2.click_ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       strftime(s3.purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       CAST(s1.user_id IS NOT NULL AS INT)
         + CAST(s2.user_id IS NOT NULL AS INT)
         + CAST(s3.user_id IS NOT NULL AS INT) AS stage_reached
FROM base b
LEFT JOIN s1 USING (user_id)
LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
ORDER BY b.user_id
"""


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly retention triangle: users grouped by first-seen week,
    counted distinct in each subsequent week offset.

    Plan shape at scale: first_seen is a groupBy(user_id) min — one
    keyed shuffle; the join back to events is user_id-to-user_id, so AQE
    plans it on the SAME hash partitioning (no third shuffle); the final
    (cohort, offset) distinct-count aggregates a far smaller keyspace.
    Weeks are epoch-anchored (floor(epoch_days / 7)) rather than
    calendar-ISO so both engines bucket identically with integer math.
    """
    days = F.floor(F.unix_micros("ts") / F.lit(86_400_000_000)).cast("bigint")
    ev = events.select("user_id", days.alias("d"))
    first_seen = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    return (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            F.floor(F.col("d0") / 7).alias("cohort_week"),
            (F.floor(F.col("d") / 7) - F.floor(F.col("d0") / 7)).alias(
                "week_offset"
            ),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


RETENTION_SQL = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events
), first_seen AS (
  SELECT user_id, MIN(d) AS d0 FROM ev GROUP BY user_id
)
SELECT CAST(first_seen.d0 // 7 AS BIGINT) AS cohort_week,
       CAST(ev.d // 7 - first_seen.d0 // 7 AS BIGINT) AS week_offset,
       COUNT(DISTINCT ev.user_id) AS n_users
FROM ev JOIN first_seen USING (user_id)
GROUP BY 1, 2
ORDER BY cohort_week, week_offset
"""
