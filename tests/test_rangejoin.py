"""Binned range join + sketch-accuracy operators (round-4 additions)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from airflow_iceberg_pipeline_stock_tracker_spark.operators import rangejoin, sketches
from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import load_table


def _naive(probe, intervals, keys):
    """Reference implementation: plain non-equi join (the plan Spark
    compiles to a nested-loop — correct, unusable at scale)."""
    return probe.join(intervals, keys).where(
        (F.col("ts") > F.col("lo")) & (F.col("ts") <= F.col("hi"))
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_binned_equals_naive(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    probe = ev.select("user_id", "ts", "event_id").limit(500)
    intervals = (
        ev.where("event_type = 'error'")
        .select(
            "user_id",
            F.col("ts").alias("lo"),
            (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("hi"),
            F.col("event_id").alias("interval_id"),
        )
        .limit(100)
    )
    got = rangejoin.range_join_binned(probe, intervals, keys=["user_id"])
    want = _naive(probe, intervals, ["user_id"])
    assert _rows(got.select("event_id", "interval_id")) == _rows(
        want.select("event_id", "interval_id")
    )


@pytest.mark.parametrize("bucket_seconds", [60, 600, 3600])
def test_bucket_width_is_physical_only(spark, bucket_seconds):
    """Any bucket width returns identical results — bucketing is a
    physical rewrite, including intervals spanning many buckets and
    boundary timestamps (lo exclusive, hi inclusive)."""
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    probe = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=s), s) for s in (0, 1, 599, 600, 601, 7200)],
        "user_id bigint, ts timestamp, event_id bigint",
    )
    intervals = spark.createDataFrame(
        [(1, base, base + dt.timedelta(seconds=600), 100)],
        "user_id bigint, lo timestamp, hi timestamp, interval_id bigint",
    )
    got = rangejoin.range_join_binned(
        probe, intervals, keys=["user_id"], bucket_seconds=bucket_seconds
    )
    # lo < ts <= hi: keeps 1, 599, 600; drops 0 (== lo), 601, 7200
    assert sorted(r.event_id for r in got.collect()) == [1, 599, 600]


def test_range_join_plan_has_no_nested_loop(spark, sf_dir):
    """The point of binning: the physical plan must be a shuffled/broadcast
    HASH or sort-merge equi-join, never BroadcastNestedLoopJoin or
    CartesianProduct (what a raw BETWEEN join compiles to)."""
    ev = load_table(spark, sf_dir, "events")
    plan = (
        rangejoin.error_followup_counts(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sketch_accuracy_all_bounds_hold(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rows = sketches.sketch_accuracy(ev).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.distinct_ok and r.p50_ok and r.p95_ok, r
        assert r.n_events >= r.n_users_exact > 0


def test_streaming_interval_join_matches_batch_range_join(spark, sf_dir):
    """The stream-stream interval join (watermark-bounded state) must
    emit exactly the pairs the batch binned range join produces —
    batch/stream parity for the non-equi join family."""
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.streaming_queries import (
        streaming_interval_join,
    )

    ev = load_table(spark, sf_dir, "events")
    probe = ev.select("user_id", "ts", F.col("event_id").alias("followup_id"))
    intervals = ev.where("event_type = 'error'").select(
        "user_id",
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("hi"),
        F.col("event_id").alias("error_id"),
    )
    batch_pairs = _rows(
        rangejoin.range_join_binned(probe, intervals, keys=["user_id"]).select(
            "error_id", "followup_id"
        )
    )
    stream_pairs = _rows(
        streaming_interval_join(spark, sf_dir).select("error_id", "followup_id")
    )
    assert stream_pairs == batch_pairs


def test_chained_stateful_emission_semantics(spark):
    """Pin the two facts the chained-hourly oracle depends on:
    (1) the global watermark is the MIN across watermarked inputs
    (here max error ts - delay), and (2) an append-mode window emits
    only when window.end < watermark STRICTLY — a window whose end
    equals the watermark stays in state."""
    import datetime as dt

    from airflow_iceberg_pipeline_stock_tracker_spark.plans.streaming_queries import (
        _drain,
    )
    from airflow_iceberg_pipeline_stock_tracker_spark.streaming import joins as sj

    base = dt.datetime(2024, 1, 1)

    def drained(rows):
        ev = spark.createDataFrame(
            rows,
            "event_id bigint, user_id bigint, ts timestamp, "
            "event_type string, value double, props string",
        )
        import tempfile

        path = tempfile.mkdtemp(prefix="chainsem_")
        ev.write.mode("overwrite").parquet(path)
        stream = spark.readStream.schema(ev.schema).parquet(path)
        return _drain(sj.error_followup_hourly(stream), mode="append").collect()

    pair = [
        (1, 1, base + dt.timedelta(minutes=10), "error", 1.0, ""),
        (2, 1, base + dt.timedelta(minutes=15), "click", 2.0, ""),
    ]
    # pair window is [00:00, 01:00). Downstream finalization threshold =
    # floor_ms(max err_ts) - 1h delay - 10min join event-time range.
    # At exactly 02:10:00 the threshold EQUALS the window end -> strict
    # comparison holds it back; 1ms past emits; 1us does not (Spark
    # floors event-time watermarks to milliseconds).
    at_boundary = base + dt.timedelta(hours=2, minutes=10)
    assert drained(pair + [(3, 2, at_boundary, "error", 3.0, "")]) == []
    assert (
        drained(pair + [(3, 2, at_boundary + dt.timedelta(microseconds=1),
                         "error", 3.0, "")])
        == []
    )
    out = drained(
        pair + [(3, 2, at_boundary + dt.timedelta(milliseconds=1), "error", 3.0, "")]
    )
    assert [(r.hour, r.n_pairs, r.followup_cents) for r in out] == [
        ("2024-01-01 00:00:00", 1, 200)
    ]
    # a later CLICK alone must NOT advance the governing watermark (min
    # across inputs; errors' max still at the boundary) => still nothing
    assert (
        drained(pair + [(3, 2, at_boundary, "error", 3.0, ""),
                        (4, 2, base + dt.timedelta(hours=9), "click", 4.0, "")])
        == []
    )


def test_sketch_reaggregation_merged_bounds_hold(spark, sf_dir):
    """The per-day HLL sketches, unioned per type, must estimate the
    exact distinct within the advertised bound — the re-aggregatability
    contract that makes a sketch rollup table answer coarser queries."""
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = sketches.sketch_reaggregation(ev).collect()
    assert rows, "no event types?"
    for r in rows:
        assert r.n_days >= 1
        assert r.merged_distinct_ok, (r.event_type, r.n_users_exact)


def test_sketch_reaggregation_merge_equals_direct_sketch(spark, sf_dir):
    """Unioning per-day sketches must equal sketching the whole column
    directly (associativity of the HLL merge) — estimate-for-estimate,
    not just within-bound."""
    from pyspark.sql import functions as F
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    merged = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.expr("hll_sketch_agg(user_id, 14)").alias("sk"))
        .groupBy("event_type")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
    )
    direct = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").alias("est")
    )
    m = {r.event_type: r.est for r in merged.collect()}
    d = {r.event_type: r.est for r in direct.collect()}
    assert m == d


def test_heavy_hitters_fewer_than_k_users_still_agrees(spark, tmp_path):
    """<k distinct users is not a disagreement: both sides return all
    users and the flag stays TRUE (the bar is 'as many items as the
    exact top-k has rows, each with its exact count')."""
    rows = [(i, 1_700_000_000_000_000_000 + i, i % 3, "click", 1.0, "{}")
            for i in range(30)]
    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import load_table

    ev = load_table(spark, str(tmp_path), "events")
    out = sketches.heavy_hitters(ev).collect()
    assert len(out) == 3  # only 3 distinct users exist
    assert all(r.sketch_agrees for r in out)
    assert [r.n for r in out] == [10, 10, 10]
