"""Data-layout operators: clustered writes, compaction, file stats."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from airflow_iceberg_pipeline_stock_tracker_spark.operators import layout
from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import load_table


@pytest.fixture()
def fragmented(spark, sf_dir, tmp_path):
    """events written the worst way: many tasks per date partition."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "date", F.to_date("ts")
    )
    path = str(tmp_path / "frag")
    ev.repartition(16).write.partitionBy("date").parquet(path)
    return ev, path


def test_write_clustered_single_file_mode(spark, fragmented, tmp_path):
    ev, _ = fragmented
    out = str(tmp_path / "clustered")
    layout.write_clustered(ev, out, ["date"], ["user_id"], files_per_partition=1)
    stats = layout.file_stats(spark, out).collect()
    assert len(stats) > 1  # one row per date dir
    assert all(r.n_files == 1 for r in stats)
    # row-preserving
    assert spark.read.parquet(out).count() == ev.count()


def test_write_clustered_salt_bounds_and_spreads_files(spark, fragmented, tmp_path):
    """files_per_partition=n must mean AT MOST n writer groups per
    partition value — but more than one, i.e. a partition's rows are not
    funneled through a single task (the 100 TB point of the knob). A
    deterministic salt makes the layout a pure function of the data."""
    ev, _ = fragmented
    out = str(tmp_path / "salted")
    # at test scale AQE's coalescing would (correctly) merge the tiny
    # salt buckets back into one writer; disable it to observe the
    # spread the salt provides at production bucket sizes
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "false")
    try:
        layout.write_clustered(
            ev, out, ["date"], ["user_id"],
            files_per_partition=4,
            salt=(F.col("event_id") % 4).cast("int"),
        )
    finally:
        spark.conf.set(key, prev if prev is not None else "true")
    stats = layout.file_stats(spark, out).collect()
    assert len(stats) > 1
    assert all(1 <= r.n_files <= 4 for r in stats)
    # big partitions actually use the parallelism (not one writer)
    biggest = max(stats, key=lambda r: r.n_rows)
    assert biggest.n_files > 1
    assert spark.read.parquet(out).count() == ev.count()
    # footer-derived row counts agree with the data
    assert sum(r.n_rows for r in stats) == ev.count()


def test_small_partitions_collapse_under_aqe(spark, fragmented, tmp_path):
    """The flip side of the salt: with AQE coalescing ON (default),
    near-empty partitions must NOT fan out into files_per_partition
    tiny files — the anti-small-file half of the contract."""
    ev, _ = fragmented
    out = str(tmp_path / "aqe_collapsed")
    layout.write_clustered(
        ev, out, ["date"], ["user_id"],
        files_per_partition=4,
        salt=(F.col("event_id") % 4).cast("int"),
    )
    stats = layout.file_stats(spark, out).collect()
    # this fixture is ~KBs per date: every bucket sits far below the
    # advisory size, so AQE should have merged aggressively
    assert all(r.n_files <= 2 for r in stats)


def test_zorder_prunes_more_files_than_linear_sort(spark, sf_dir, tmp_path):
    """The point of the z-curve: under a conjunctive range predicate, a
    z-ordered layout's per-file min/max stats prune on BOTH columns,
    while a linear sort prunes only on its leading column. Compare
    candidate-file counts (files whose [min,max] on every predicate
    column overlaps the box) from the real parquet footers."""
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import (
        load_table,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", F.col("ts").cast("long").alias("ts_s"))
    )
    lo_u, hi_u, lo_t, hi_t = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("ts_s"), F.max("ts_s")
    ).collect()[0]
    span_u, span_t = max(hi_u - lo_u, 1), max(hi_t - lo_t, 1)
    scaled = ev.selectExpr(
        "event_id",
        "user_id",
        "ts_s",
        f"((user_id - {lo_u}) * 65535) div {span_u} AS u16",
        f"((ts_s - {lo_t}) * 65535) div {span_t} AS t16",
    ).selectExpr(
        "event_id",
        "user_id",
        "ts_s",
        layout.zvalue_expr("u16", "t16") + " AS z",
    )
    n_files = 16
    zpath, lpath = str(tmp_path / "zord"), str(tmp_path / "linear")
    layout.write_zordered(scaled, zpath, "z", n_files)
    # linear baseline: range-sorted by user_id alone, same file count
    (
        scaled.repartitionByRange(n_files, F.col("user_id"))
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    import glob

    import pyarrow.parquet as pq

    def candidates(path, box):
        (ulo, uhi), (tlo, thi) = box
        n_total, n_cand = 0, 0
        for f in glob.glob(path + "/*.parquet"):
            md = pq.read_metadata(f)
            stats = {}
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                for ci in range(rg.num_columns):
                    col = rg.column(ci)
                    name = col.path_in_schema
                    s = col.statistics
                    mn, mx = stats.get(name, (s.min, s.max))
                    stats[name] = (min(mn, s.min), max(mx, s.max))
            n_total += 1
            u_mn, u_mx = stats["user_id"]
            t_mn, t_mx = stats["ts_s"]
            if u_mx >= ulo and u_mn <= uhi and t_mx >= tlo and t_mn <= thi:
                n_cand += 1
        return n_total, n_cand

    # broad user slice, narrow time slice: the layout where user_id is
    # the only sorted column cannot prune on time at all
    box = (
        (lo_u, lo_u + span_u // 2),
        (lo_t + span_t // 2, lo_t + span_t // 2 + span_t // 16),
    )
    z_total, z_cand = candidates(zpath, box)
    l_total, l_cand = candidates(lpath, box)
    # range partitioning may leave a couple of boundary partitions empty,
    # so compare PRUNING FRACTIONS, not raw counts
    assert z_total >= n_files - 4 and l_total >= n_files - 4
    assert z_cand / z_total < l_cand / l_total, (
        (z_cand, z_total), (l_cand, l_total)
    )
    # and the layouts hold the same rows
    assert (
        spark.read.parquet(zpath).count() == spark.read.parquet(lpath).count()
    )


def test_compact_cleans_stray_dirs_from_a_prior_crash(spark, fragmented):
    """A crash can leave .compact (staged) or .old (renamed-aside) dirs;
    the next compaction must clean them up and still converge."""
    import os

    ev, path = fragmented
    os.makedirs(path + ".compact", exist_ok=True)
    os.makedirs(path + ".old", exist_ok=True)
    rows_before = sorted(
        map(tuple, spark.read.parquet(path).select("event_id", "user_id").collect())
    )
    layout.compact_partitions(spark, path, ["date"], ["user_id"])
    assert not os.path.exists(path + ".compact")
    assert not os.path.exists(path + ".old")
    rows_after = sorted(
        map(tuple, spark.read.parquet(path).select("event_id", "user_id").collect())
    )
    assert rows_after == rows_before


def test_clustered_files_are_sorted_for_stats_pruning(spark, fragmented, tmp_path):
    """Within each file, user_id must be non-decreasing so parquet
    row-group min/max ranges are tight (the file-skipping contract)."""
    import glob

    ev, _ = fragmented
    out = str(tmp_path / "clustered2")
    layout.write_clustered(ev, out, ["date"], ["user_id"])
    some = sorted(glob.glob(out + "/date=*/*.parquet"))[:3]
    assert some
    for f in some:
        vals = pq.read_table(f, columns=["user_id"])["user_id"].to_pylist()
        assert vals == sorted(vals), f


def test_compact_reduces_files_and_preserves_rows(spark, fragmented):
    ev, path = fragmented
    before = layout.file_stats(spark, path).agg(F.sum("n_files")).collect()[0][0]
    rows_before = sorted(
        map(tuple, spark.read.parquet(path).select("event_id", "user_id").collect())
    )
    layout.compact_partitions(spark, path, ["date"], ["user_id"])
    after_stats = layout.file_stats(spark, path).collect()
    after = sum(r.n_files for r in after_stats)
    assert after < before
    assert all(r.n_files == 1 for r in after_stats)
    rows_after = sorted(
        map(tuple, spark.read.parquet(path).select("event_id", "user_id").collect())
    )
    assert rows_after == rows_before


def test_bucketed_join_eliminates_both_shuffles(spark, sf_dir):
    """The whole point of write_bucketed: with matching bucket specs the
    equi-join plans ZERO hash exchanges, while the identical join over
    plain parquet plans one per side. Differential so the assertion can't
    rot into vacuous truth if plan strings change."""
    import shutil

    from airflow_iceberg_pipeline_stock_tracker_spark.operators import layout
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import (
        load_table,
    )

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("tb_orders", "tb_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    layout.write_bucketed(orders, "tb_orders", ["o_orderkey"], 4, ["o_orderkey"])
    layout.write_bucketed(li, "tb_lineitem", ["l_orderkey"], 4, ["l_orderkey"])

    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o, l = spark.table("tb_orders"), spark.table("tb_lineitem")
        bucketed = l.join(o, l.l_orderkey == o.o_orderkey)
        bplan = bucketed._jdf.queryExecution().executedPlan().toString()
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
        pplan = plain._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)

    assert "Exchange hashpartitioning" not in bplan
    assert "SelectedBucketsCount" in bplan  # bucket spec actually used
    assert pplan.count("Exchange hashpartitioning") == 2  # differential

    # joining rows are value-identical to the plain-parquet join
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )
