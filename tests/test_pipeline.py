from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from airflow_iceberg_pipeline_stock_tracker_spark import pipeline
from airflow_iceberg_pipeline_stock_tracker_spark.sources.stock_api import (
    DeterministicBarClient,
)

DB = "pipetest"


@pytest.fixture()
def db(spark):
    spark.sql(f"DROP DATABASE IF EXISTS {DB} CASCADE")
    yield DB
    spark.sql(f"DROP DATABASE IF EXISTS {DB} CASCADE")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/{DB.lower()}.db", ignore_errors=True)


def test_run_for_date_end_to_end(spark, db):
    checks = pipeline.run_for_date(spark, "2024-01-02", db=db)
    rows = {r.check_name: r.status for r in checks.collect()}
    assert len(rows) == 6
    assert all(s == "PASS" for s in rows.values())

    prod = spark.table(f"{db}.{pipeline.PROD_TABLE}")
    assert prod.count() == 5  # one row per reference ticker
    cum = spark.table(f"{db}.{pipeline.CUMULATIVE_TABLE}")
    day = cum.where(F.col("date") == "2024-01-02").collect()
    assert len(day) == 5
    # first day in history: frame is 1 row, stddev NULL -> COALESCE 0
    for r in day:
        assert len(r.last_7_days_close) == 1
        assert float(r.volatility_7_day) == 0.0
    # staging dropped after promotion
    assert not spark.catalog.tableExists(pipeline.staging_table_name("2024-01-02", db))


def test_rerun_same_ds_is_idempotent(spark, db):
    pipeline.run_for_date(spark, "2024-01-02", db=db)
    first = spark.table(f"{db}.{pipeline.PROD_TABLE}").drop(
        "insertion_timestamp"
    ).collect()
    pipeline.run_for_date(spark, "2024-01-02", db=db)
    second = spark.table(f"{db}.{pipeline.PROD_TABLE}").drop(
        "insertion_timestamp"
    ).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))


def test_backfill_accumulates_rolling_frames(spark, db):
    days = pipeline.backfill(spark, "2024-01-01", "2024-01-03", db=db)
    assert days == ["2024-01-01", "2024-01-02", "2024-01-03"]
    cum = spark.table(f"{db}.{pipeline.CUMULATIVE_TABLE}")
    sizes = {
        r.date.isoformat(): r.n
        for r in cum.groupBy("date")
        .agg(F.max(F.size("last_7_days_close")).alias("n"))
        .collect()
    }
    # frame grows one row per processed day (shrunk-frame semantics)
    assert sizes == {"2024-01-01": 1, "2024-01-02": 2, "2024-01-03": 3}
    # day-3 volatility over >1 row is positive
    d3 = cum.where(F.col("date") == "2024-01-03").collect()
    assert all(float(r.volatility_7_day) > 0 for r in d3)


def test_failing_ticker_swallowed_and_dq_fails_softly(spark, db):
    client = DeterministicBarClient(fail_tickers=frozenset({"AAPL"}))
    checks = pipeline.run_for_date(spark, "2024-03-05", client=client, db=db)
    by_name = {r.check_name: r for r in checks.collect()}
    missing = by_name["Missing stocks check"]
    assert missing.status == "FAIL" and missing.actual_count == 4
    # non-strict: promotion still happened (reference prints, never gates)
    assert spark.table(f"{db}.{pipeline.PROD_TABLE}").count() == 4


def test_strict_dq_raises(spark, db):
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.dq import DQCheckError

    client = DeterministicBarClient(fail_tickers=frozenset({"META"}))
    with pytest.raises(DQCheckError):
        pipeline.run_for_date(spark, "2024-03-06", client=client, db=db, strict_dq=True)


def test_schema_evolution_add_column(spark, db):
    """ALTER TABLE ADD COLUMNS on the prod table: rows written before the
    evolution read the new column as NULL; rows written after carry it.
    Same DDL evolves Iceberg metadata when that runtime is active."""
    pipeline.run_for_date(spark, "2024-01-02", db=db)
    pipeline.evolve_add_columns(
        spark, pipeline.PROD_TABLE, "source_feed STRING", db=db
    )
    prod = f"{db}.{pipeline.PROD_TABLE}"
    assert "source_feed" in spark.table(prod).columns
    # pre-evolution rows surface NULL for the new column
    assert spark.table(prod).where("source_feed IS NULL").count() == 5
    # post-evolution writes carry the new column
    spark.sql(
        f"INSERT INTO {prod} "
        f"SELECT ticker, open, high, low, close, volume, vwap, transactions, "
        f"insertion_timestamp, 'polygon' AS source_feed, DATE '2024-01-03' AS date "
        f"FROM {prod} WHERE date = DATE '2024-01-02'"
    )
    evolved = spark.table(prod).where("date = DATE '2024-01-03'").collect()
    assert len(evolved) == 5
    assert all(r.source_feed == "polygon" for r in evolved)


def test_insert_overwrite_partition_scoped_without_session_conf(spark, db):
    """The external correctness driver supplies its own session WITHOUT
    partitionOverwriteMode=dynamic (Spark's default is static). Under
    static mode, an INSERT OVERWRITE would truncate the WHOLE table —
    the r3 pipeline_micro_batch_parity HASHFAIL. pipeline._insert must
    save/set/restore the conf itself so a re-run of one day never
    deletes other days' partitions, under any caller's session."""
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "static")
    try:
        pipeline.backfill(spark, "2024-01-01", "2024-01-02", db=db)
        prod = spark.table(f"{db}.{pipeline.PROD_TABLE}")
        assert prod.count() == 10
        # idempotent re-run of day 1 only; day 2 must survive
        pipeline.run_for_date(spark, "2024-01-01", db=db)
        dates = {r.date.isoformat() for r in prod.select("date").distinct().collect()}
        assert dates == {"2024-01-01", "2024-01-02"}
        assert prod.count() == 10
        # conf restored to what the caller had
        assert spark.conf.get(key) == "static"
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_micro_batch_parity_twice_same_session(spark, sf_dir):
    """The r3 driver sweep ran parity inside a long-lived session with
    driver-owned confs; run it twice in ONE session, with the conf the
    driver effectively has (static overwrite mode), and require the
    oracle row both times."""
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.streaming_queries import (
        pipeline_micro_batch_parity,
    )

    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "static")
    try:
        for _ in range(2):
            row = pipeline_micro_batch_parity(spark, sf_dir).collect()[0]
            assert (row.n_only_batch, row.n_only_stream, row.n_rows) == (0, 0, 15), (
                row.keys_only_batch,
                row.keys_only_stream,
            )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
