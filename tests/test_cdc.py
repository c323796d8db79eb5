"""CDC merge-apply loop (streaming/cdc.py): incremental fold parity,
restart no-op, and the crash-safe target rotation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import load_table
from airflow_iceberg_pipeline_stock_tracker_spark.streaming import cdc

SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def _batch_expected(spark, sf_dir):
    return {
        r.user_id: (r.n, r.bal)
        for r in load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("bal"),
        )
        .collect()
    }


def test_incremental_merge_fold_equals_batch_aggregate(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events4")
    ev.repartition(4).write.mode("overwrite").parquet(src)
    tgt = str(tmp_path / "balances")
    cdc.run_merge_apply(spark, src, SCHEMA, tgt, str(tmp_path / "ckpt"))

    got = {
        r.user_id: (r.n_events, r.bal_cents)
        for r in spark.read.schema(cdc.TARGET_SCHEMA).parquet(tgt).collect()
    }
    assert got == _batch_expected(spark, sf_dir)

    # restart against the same checkpoint: nothing new -> target unchanged
    cdc.run_merge_apply(spark, src, SCHEMA, tgt, str(tmp_path / "ckpt"))
    again = {
        r.user_id: (r.n_events, r.bal_cents)
        for r in spark.read.schema(cdc.TARGET_SCHEMA).parquet(tgt).collect()
    }
    assert again == got


def test_apply_batch_rotation_leaves_no_stray_dirs(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").limit(200)
    tgt = str(tmp_path / "t")
    cdc.apply_purchases_batch(ev, 0, tgt)
    cdc.apply_purchases_batch(ev, 1, tgt)  # second pass exercises rename-aside
    assert os.path.isdir(tgt)
    assert not os.path.exists(tgt + ".staged")
    assert not os.path.exists(tgt + ".old")
    # double-apply doubled the counts (at-least-once without ledger —
    # documented contract; checkpointed runs don't redeliver)
    row = (
        spark.read.schema(cdc.TARGET_SCHEMA)
        .parquet(tgt)
        .agg(F.sum("n_events").alias("n"))
        .collect()[0]
    )
    expected = ev.where(F.col("event_type") == "purchase").count()
    assert row.n == 2 * expected


def test_crash_between_renames_recovers_pre_batch_state(spark, sf_dir, tmp_path):
    """Simulate dying after `target -> .old` but before `staged ->
    target`: the next apply must restore .old and fold on top of it,
    not rebuild from an empty table."""
    ev = load_table(spark, sf_dir, "events").limit(400)
    tgt = str(tmp_path / "t")
    cdc.apply_purchases_batch(ev, 0, tgt)
    before = {
        r.user_id: (r.n_events, r.bal_cents)
        for r in spark.read.schema(cdc.TARGET_SCHEMA).parquet(tgt).collect()
    }
    os.rename(tgt, tgt + ".old")  # the crash window state

    empty = ev.where(F.lit(False))
    cdc.apply_purchases_batch(empty, 1, tgt)  # replayed empty batch
    after = {
        r.user_id: (r.n_events, r.bal_cents)
        for r in spark.read.schema(cdc.TARGET_SCHEMA).parquet(tgt).collect()
    }
    assert after == before
    assert not os.path.exists(tgt + ".old")
