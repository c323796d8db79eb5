"""Incremental HLL register maintenance — the sketch tier's streaming twin.

``events_hll_reagg`` (plans/timeseries.py) proves the HLL registers'
MAX-merge is associative, commutative and idempotent over ANY
partitioning of the data. This module turns that proof into a sink
design (the events_ohlc_incremental pattern applied to distinct
counting): each micro-batch folds its events down to per-
``(event_type, bucket)`` max-rho register partials and dynamic-
partition-overwrites EXACTLY its own ``src_batch`` partition of the
state table.

Exactly-once under replay comes for free from that layout — no replay
guard, no stored-state read in the hot path: the write is a pure
function of batch b's rows targeting only partition ``src_batch = b``,
so a re-delivered batch_id (state committed, checkpoint offset lost —
the at-least-once window every foreachBatch sink sits in) rewrites its
own partition with identical content and touches nothing else. Compare
continuous_agg.process_events_batch, which must EXCLUDE its own prior
contribution because OHLC partials share date partitions across
batches; max-merged registers don't need the exclusion because the
merge is idempotent — but the per-batch partition layout sidesteps even
the double-count question structurally.

Rendering merges at read — ``groupBy(event_type, bucket).max(maxrho)``
— which is exactly the warehouse shape the reagg row models: store one
small sketch per ingest unit (<= |types| x 256 rows per batch), merge
at query time, never re-scan raw events for a distinct count.

Reference scope: the reference pipeline (dags/dag.py) keeps only exact
SQL aggregates; this is the at-scale extension tier (distinct counts a
100 TB deployment cannot afford to recount per refresh).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import pipeline

REGISTERS_TABLE = "hll_registers_state"

_STATE_COLS = "event_type string, bucket int, maxrho int, src_batch bigint"


def _batch_registers(events: DataFrame) -> DataFrame:
    """Per-(event_type, bucket) max-rho registers for one slice of
    events — the identical hash/split/rho pipeline as the batch rows
    (events_hll_distinct), so the streamed registers are bit-comparable
    to a one-pass build."""
    from ..functions.texthash import hash60
    from ..plans.timeseries import HLL_M, HLL_W

    h = hash60(F.col("user_id").cast("string"))
    keyed = events.select(
        "event_type",
        h.bitwiseAND(F.lit(HLL_M - 1)).alias("bucket"),
        F.shiftright(h, 8).alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(HLL_W + 1)).otherwise(
        F.lit(HLL_W) - F.length(F.bin("w")) + 1
    )
    return keyed.groupBy("event_type", "bucket").agg(
        F.max(rho).cast("int").alias("maxrho")
    )


def ensure_state_table(spark: SparkSession, db: str) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {db}.{REGISTERS_TABLE} ({_STATE_COLS}) "
        f"USING {pipeline._fmt(spark)} PARTITIONED BY (src_batch)"
    )


def process_hll_batch(batch: DataFrame, batch_id: int, db: str) -> None:
    spark = batch.sparkSession
    ensure_state_table(spark, db)
    # register volume is <= |types| x 256 rows per batch: size the
    # shuffle to the state, not the session default (save/restore — the
    # caller's session is not ours to reconfigure; continuous_agg's
    # pattern)
    conf_key = "spark.sql.shuffle.partitions"
    prior = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "8")
    try:
        out = (
            _batch_registers(batch)
            .withColumn("src_batch", F.lit(batch_id).cast("bigint"))
            .coalesce(1)  # one tiny file per batch partition
        )
        # dynamic partition overwrite of exactly partition src_batch=b:
        # idempotent under replay by construction (see module docstring)
        pipeline._insert(out, f"{db}.{REGISTERS_TABLE}", overwrite=True)
    finally:
        spark.conf.set(conf_key, prior)


def run_hll_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    db: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain an events directory into the register-state table
    (AvailableNow)."""
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(events_dir)
        .writeStream.foreachBatch(lambda b, i: process_hll_batch(b, i, db=db))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def merged_registers(spark: SparkSession, db: str) -> DataFrame:
    """MAX-merge the per-batch register partials at read — must equal
    the one-pass register build over the same events to the bit
    (events_hll_reagg's contract, exercised cross-layer here)."""
    return (
        spark.table(f"{db}.{REGISTERS_TABLE}")
        .groupBy("event_type", "bucket")
        .agg(F.max("maxrho").alias("maxrho"))
    )
