"""CDC apply: fold a change stream into a keyed table via MERGE per batch.

The lakehouse standard for consuming change streams (Debezium topics,
order events, balance updates) is foreachBatch + MERGE INTO: each
micro-batch becomes a small keyed changeset upserted into the target
table. This module drives ``operators/merge.py::merge_upsert`` from a
streaming query — per batch the changeset broadcasts into the target's
three-branch merge, so the target never shuffles, and the final table
equals the one-shot batch aggregate (the parity the oracle checks).

Replay safety: the target swap is rename-aside (write staged, rotate),
so a crash leaves either the live dir or its ``.old`` sibling holding
the pre-batch table; ``_read_target`` restores the sibling if the crash
hit between the two renames, and the checkpoint decides whether the
batch re-runs. A re-run of a batch whose swap fully completed WOULD
double-apply — production pairs this with the applied-batch ledger
pattern from ``streaming/continuous_agg.py`` (src_batch tagging); here
the swap is atomic-per-batch and the scope is the parity proof.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import cents
from ..operators.merge import merge_upsert

TARGET_SCHEMA = "user_id bigint, n_events bigint, bal_cents bigint"


def _read_target(spark: SparkSession, target_dir: str) -> DataFrame:
    old = target_dir + ".old"
    if not os.path.isdir(target_dir) and os.path.isdir(old):
        # crashed BETWEEN the two renames: the live dir is gone and the
        # pre-batch table sits aside in .old — restore it before reading,
        # or the replayed batch would fold into an empty target and every
        # earlier batch's state would be silently lost
        os.rename(old, target_dir)
    if os.path.isdir(target_dir):
        return spark.read.schema(TARGET_SCHEMA).parquet(target_dir)
    from ..sources.tables import local_df

    return local_df(spark, [], TARGET_SCHEMA)


def apply_purchases_batch(
    batch: DataFrame, batch_id: int, target_dir: str
) -> None:
    """One CDC apply step: aggregate the batch's purchases per user and
    MERGE into the balance table (matched: accumulate; new user: insert).
    """
    spark = batch.sparkSession
    src = (
        batch.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents("value")).alias("bal_cents"),
        )
    )
    merged = merge_upsert(
        _read_target(spark, target_dir),
        F.broadcast(src),
        keys=["user_id"],
        when_matched={
            "n_events": F.col("t.n_events") + F.col("s.n_events"),
            "bal_cents": F.col("t.bal_cents") + F.col("s.bal_cents"),
        },
        when_not_matched={
            "n_events": F.col("s.n_events"),
            "bal_cents": F.col("s.bal_cents"),
        },
    )
    # merged reads target_dir lazily: materialize to a staged dir first,
    # then rotate rename-aside (same crash discipline as layout.py)
    staged, old = target_dir + ".staged", target_dir + ".old"
    shutil.rmtree(staged, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    merged.write.mode("overwrite").parquet(staged)
    if os.path.isdir(target_dir):
        os.rename(target_dir, old)
    os.rename(staged, target_dir)
    shutil.rmtree(old, ignore_errors=True)


def run_merge_apply(
    spark: SparkSession,
    events_dir: str,
    events_schema: str,
    target_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = 1,
) -> None:
    """Drain an events directory through the CDC apply loop (AvailableNow)."""
    reader = spark.readStream.schema(events_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(events_dir)
        .writeStream.foreachBatch(
            lambda b, i: apply_purchases_batch(b, i, target_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
