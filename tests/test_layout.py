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


def test_write_clustered_bounds_files_per_partition(spark, fragmented, tmp_path):
    ev, _ = fragmented
    out = str(tmp_path / "clustered")
    layout.write_clustered(ev, out, ["date"], ["user_id"])
    stats = layout.file_stats(spark, out).collect()
    assert len(stats) > 1  # one row per date dir
    assert all(r.n_files == 1 for r in stats)
    # row-preserving
    assert spark.read.parquet(out).count() == ev.count()


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
