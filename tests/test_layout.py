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
