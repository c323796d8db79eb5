"""Bloom-filter semi join: correctness, no-false-negative, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_iceberg_pipeline_stock_tracker_spark.operators import bloom
from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import load_table


def test_bloom_result_equals_plain_semi_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    got = bloom.bloom_semi_join(li, orders).collect()

    sel = orders.where(
        (F.col("o_orderdate").cast("date") >= F.lit(bloom._O_START).cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit(bloom._O_END).cast("date"))
        & (F.col("o_orderpriority") == bloom._O_PRIO)
    ).select("o_orderkey")
    plain = (
        li.join(sel, li.l_orderkey == sel.o_orderkey, "left_semi")
        .groupBy(F.trunc(F.col("l_shipdate").cast("date"), "month").alias("m"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {(r.ship_month, r.n_lines) for r in got} == {
        (r.m, r.n) for r in plain
    }
    assert got and all(r.bloom_no_false_negative for r in got)


def test_bloom_probe_rejects_non_members(spark):
    """A bitmap built from keys 1..100 must reject (almost all of) a
    disjoint probe range — i.e. the filter actually prunes. With m=2^17
    and k=5 at 100 keys the expected false-positive count over 1000
    probes is << 1, so demand >= 99% rejection."""
    build = spark.range(1, 101).select(F.col("id").alias("o_orderkey"))
    pos = F.explode(F.array(*bloom._positions(F.col("o_orderkey")))).alias("pos")
    words = (
        build.select(pos)
        .select(
            F.shiftright(F.col("pos"), 6).cast("int").alias("word"),
            F.call_function(
                "shiftleft", F.lit(1).cast("bigint"), (F.col("pos") % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("bits"))
        .collect()
    )
    dense = [0] * (bloom.BLOOM_M_BITS >> 6)
    for r in words:
        dense[r.word] = r.bits
    bf = spark.createDataFrame([(dense,)], "bf array<bigint>")

    members = build.crossJoin(F.broadcast(bf)).where(
        bloom._probe_ok(F.col("bf"), F.col("o_orderkey"))
    )
    assert members.count() == 100  # no false negatives, ever

    probes = spark.range(1_000_000, 1_001_000).select(
        F.col("id").alias("o_orderkey")
    )
    passed = (
        probes.crossJoin(F.broadcast(bf))
        .where(bloom._probe_ok(F.col("bf"), F.col("o_orderkey")))
        .count()
    )
    assert passed <= 10  # >=99% pruned


def test_bloom_plan_has_no_sort_merge_join(spark, sf_dir):
    """The fact side must reach the exact repair via broadcast joins
    only — a SortMergeJoin would mean the runtime filter failed to keep
    the probe scan-local."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    plan = bloom.bloom_semi_join(li, orders)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan  # the exact-repair semi join
