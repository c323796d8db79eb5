"""Data-layout operators: bounded-file-count writes and compaction.

The reference's write path inherits its layout from the remote warehouse
(every INSERT is one commit, dags/dag.py:294-330); a self-hosted 100 TB
lake has to manage layout itself or drown in the small-file problem:
every micro-batch/backfill task writing `spark.sql.shuffle.partitions`
files per date turns the next full scan into millions of opens, and
metadata listing alone dominates query latency. These operators are the
OPTIMIZE/compaction tier:

* ``write_clustered`` — one shuffle keyed by the partition columns so
  each output partition is written by few tasks, sorted within files by
  the cluster columns so parquet row-group min/max stats actually prune
  (a range predicate on a clustered column skips whole files), with
  ``maxRecordsPerFile`` bounding file size.
* ``compact_partitions`` — rewrite an existing directory to the same
  clustered layout; idempotent (same rows, fewer files), the periodic
  maintenance job every streaming ingest needs.
* ``file_stats`` — files/rows/bytes per partition directory, the
  measurement half (alerting on file-count drift is how compaction gets
  scheduled in production).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_clustered", "compact_partitions", "file_stats"]


def write_clustered(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    cluster_cols: list[str],
    max_records_per_file: int = 1_000_000,
    files_per_partition: int = 1,
) -> None:
    """Write ``df`` partitioned by ``partition_cols``, each partition
    produced by ``files_per_partition`` tasks, rows inside each file
    sorted by ``cluster_cols``.

    `repartition(N, partition_cols)` guarantees every partition-value's
    rows land in at most N tasks (hash co-location), so a partition
    yields at most N files (plus maxRecordsPerFile splits) instead of
    one per upstream task. sortWithinPartitions keeps the sort OUT of
    the shuffle (no global ordering — local per-task sort only), which
    is what parquet needs for tight row-group min/max ranges.
    """
    n = max(1, files_per_partition)
    (
        df.repartition(n, *[F.col(c) for c in partition_cols])
        .sortWithinPartitions(*partition_cols, *cluster_cols)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    cluster_cols: list[str],
    max_records_per_file: int = 1_000_000,
) -> None:
    """Rewrite ``path`` in place to the clustered layout (row-preserving).

    Reads the full dataset, then overwrites atomically-per-partition via
    a staging rewrite. Local-FS simple version: stage to `path + .compact`,
    then swap — object-store deployments would dynamic-overwrite
    partition-by-partition instead.
    """
    import shutil

    staged = path.rstrip("/") + ".compact"
    df = spark.read.parquet(path)
    write_clustered(
        df,
        staged,
        partition_cols,
        cluster_cols,
        max_records_per_file=max_records_per_file,
    )
    # swap after the staged write fully committed
    shutil.rmtree(path)
    os.rename(staged, path)


def file_stats(spark: SparkSession, path: str) -> DataFrame:
    """(partition, n_files, n_bytes): layout health per partition dir."""
    rows = []
    for dirpath, _dirs, files in os.walk(path):
        data = [f for f in files if f.endswith(".parquet")]
        if not data:
            continue
        rel = os.path.relpath(dirpath, path)
        rows.append(
            (
                rel if rel != "." else "",
                len(data),
                sum(os.path.getsize(os.path.join(dirpath, f)) for f in data),
            )
        )
    return spark.createDataFrame(
        rows or [("", 0, 0)], "partition string, n_files int, n_bytes bigint"
    )
