"""Continuous-aggregate maintenance: incremental OHLC bars via a
mergeable partial-state table.

The batch operator (operators/analytics.ohlc_bars) recomputes bars from
raw events; at 100 TB a dashboard cannot re-scan history per refresh.
The streaming answer (TimescaleDB continuous aggregates / materialized
view maintenance) is to persist the bar's PARTIAL AGGREGATE STATE —
struct-packed first/last carriers, min/max, sums, counts, every one of
them associative and commutative — and fold each micro-batch's partials
into the stored ones, touching only the date partitions the batch
actually contains. A view renders final bars from state; the raw events
are never re-read.

Exactly-once: the merge is keyed by (bar_start, event_type) and the
write is an idempotent dynamic partition overwrite of the affected
dates (pipeline._insert), so replaying a failed batch converges to the
same state. Correctness is pinned by a test folding the same events in
1-file micro-batches and comparing the rendered view bit-for-bit with
the batch operator's output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import pipeline
from ..functions.money import cents, dollars

BARS_TABLE = "ohlc_bars_state"

_STATE_COLS = (
    "bar_start timestamp, event_type string, "
    "first_pack struct<ts:timestamp,event_id:bigint,v:bigint>, "
    "last_pack struct<ts:timestamp,event_id:bigint,v:bigint>, "
    "hi_cents bigint, lo_cents bigint, volume bigint, sum_cents bigint, "
    "date date"
)


def _partials(events: DataFrame) -> DataFrame:
    """Per-(hour, type) partial aggregate state for one slice of events."""
    pack = F.struct("ts", "event_id", cents("value").alias("v"))
    return events.groupBy(
        F.window("ts", "1 hour").start.alias("bar_start"), "event_type"
    ).agg(
        F.min(pack).alias("first_pack"),
        F.max(pack).alias("last_pack"),
        F.max(cents("value")).alias("hi_cents"),
        F.min(cents("value")).alias("lo_cents"),
        F.count(F.lit(1)).alias("volume"),
        F.sum(cents("value")).alias("sum_cents"),
    ).withColumn("date", F.to_date("bar_start"))


def _merge(state: DataFrame) -> DataFrame:
    """Fold partial rows (stored ++ new) — every aggregate associative."""
    return state.groupBy("bar_start", "event_type").agg(
        F.min("first_pack").alias("first_pack"),
        F.max("last_pack").alias("last_pack"),
        F.max("hi_cents").alias("hi_cents"),
        F.min("lo_cents").alias("lo_cents"),
        F.sum("volume").alias("volume"),
        F.sum("sum_cents").alias("sum_cents"),
    ).withColumn("date", F.to_date("bar_start"))


def ensure_state_table(spark: SparkSession, db: str) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {db}.{BARS_TABLE} ({_STATE_COLS}) "
        f"USING {pipeline._fmt(spark)} PARTITIONED BY (date)"
    )


def process_events_batch(batch: DataFrame, batch_id: int, db: str) -> None:
    spark = batch.sparkSession
    ensure_state_table(spark, db)
    new = _partials(batch).persist()
    dates = [r.date for r in new.select("date").distinct().collect()]
    if not dates:
        new.unpersist()
        return
    stored = spark.table(f"{db}.{BARS_TABLE}").where(F.col("date").isin(dates))
    merged = _merge(stored.unionByName(new))
    # idempotent: dynamic partition overwrite of exactly the touched dates
    pipeline._insert(merged, f"{db}.{BARS_TABLE}", overwrite=True)
    new.unpersist()


def run_ohlc_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    db: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain an events directory into the bar-state table (AvailableNow)."""
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(events_dir)
        .writeStream.foreachBatch(lambda b, i: process_events_batch(b, i, db=db))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def rendered_bars(spark: SparkSession, db: str) -> DataFrame:
    """Final OHLC bars from state — same surface as analytics.ohlc_bars."""
    st = spark.table(f"{db}.{BARS_TABLE}")
    return st.select(
        F.date_format("bar_start", "yyyy-MM-dd HH:mm:ss").alias("bar_start"),
        "event_type",
        dollars(F.col("first_pack.v")).alias("open"),
        dollars(F.col("hi_cents")).alias("high"),
        dollars(F.col("lo_cents")).alias("low"),
        dollars(F.col("last_pack.v")).alias("close"),
        "volume",
        dollars(F.col("sum_cents")).alias("total_value"),
    ).orderBy("bar_start", "event_type")
