"""Data-layout operators: bounded-file-count writes and compaction.

The reference's write path inherits its layout from the remote warehouse
(every INSERT is one commit, dags/dag.py:294-330); a self-hosted 100 TB
lake has to manage layout itself or drown in the small-file problem:
every micro-batch/backfill task writing `spark.sql.shuffle.partitions`
files per date turns the next full scan into millions of opens, and
metadata listing alone dominates query latency. These operators are the
OPTIMIZE/compaction tier:

* ``write_clustered`` — one shuffle keyed by (partition columns, salt)
  so each output partition is written by a BOUNDED number of tasks yet
  not funneled through one, sorted within files by the cluster columns
  so parquet row-group min/max stats actually prune (a range predicate
  on a clustered column skips whole files), with ``maxRecordsPerFile``
  bounding file size.
* ``compact_partitions`` — rewrite an existing directory to the same
  clustered layout; idempotent (same rows, fewer files), the periodic
  maintenance job every streaming ingest needs.
* ``file_stats`` — files/rows/bytes per partition directory, the
  measurement half (alerting on file-count drift is how compaction gets
  scheduled in production). Row counts come from parquet footers only —
  no data read.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_clustered",
    "compact_partitions",
    "file_stats",
    "zvalue_expr",
    "write_zordered",
    "write_bucketed",
]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-within-bucket)
    catalog table.

    Bucketing is the pre-paid shuffle: rows are hash-distributed into
    ``n_buckets`` files per write task BY KEY at write time, and the
    bucket spec is recorded in the catalog. Every later equi-join or
    aggregation on the bucket columns then reads co-located data and
    plans with NO Exchange on that side — at 100 TB this turns the
    nightly fact-to-fact join from two full shuffles into zero. SortBy
    additionally pre-orders within buckets so sort-merge joins skip
    their sort. Spark only exploits the spec when BOTH join sides share
    the bucket count/keys (pinned in tests/test_layout.py).
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)

Z_BITS = 16  # per-dimension resolution of the z-curve


def zvalue_expr(a: str, b: str, bits: int = Z_BITS) -> str:
    """SQL-string expression interleaving two ``bits``-wide non-negative
    ints into one Morton (Z-order) value — ``a``'s bit i lands at 2i+1,
    ``b``'s at 2i.

    Z-ordering is the lakehouse answer to multi-column pruning
    (Databricks OPTIMIZE ZORDER, Iceberg sort orders): a linear sort
    gives perfect min/max file stats on its FIRST column and none on
    the rest, while sorting by the interleaved value gives every
    z-mapped column locality in every file, so a conjunctive range
    predicate prunes files on all of them at once.

    Built as one SQL string, not chained Column ops (the simhash
    precedent: 2*bits py4j Column calls cost ~driver seconds; one
    selectExpr parse is milliseconds). Exact int64 — both engines agree
    bit-for-bit, so z-values are oracle-checkable.
    """
    terms = []
    for i in range(bits):
        terms.append(f"shiftleft(shiftright({a}, {i}) & 1, {2 * i + 1})")
        terms.append(f"shiftleft(shiftright({b}, {i}) & 1, {2 * i})")
    return "(" + " + ".join(terms) + ")"


def zvalue_duckdb_expr(a: str, b: str, bits: int = Z_BITS) -> str:
    """DuckDB twin of :func:`zvalue_expr` (>> << operator spelling)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    zcol: str,
    n_files: int,
    max_records_per_file: int = 1_000_000,
) -> None:
    """Write ``df`` as ``n_files`` files globally ordered by ``zcol``.

    repartitionByRange gives each task a contiguous z-range (global
    order across files, unlike hash repartition), and the local sort
    inside each task tightens per-file min/max stats on every z-mapped
    column — the layout that makes multi-column range predicates skip
    files. One range shuffle; no global sort barrier.
    """
    (
        df.repartitionByRange(n_files, F.col(zcol))
        .sortWithinPartitions(zcol)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )


def write_clustered(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    cluster_cols: list[str],
    max_records_per_file: int = 1_000_000,
    files_per_partition: int = 8,
    salt: Column | None = None,
) -> None:
    """Write ``df`` partitioned by ``partition_cols``, each partition
    value's rows spread across at most ``files_per_partition`` writer
    groups, rows inside each file sorted by ``cluster_cols``.

    Why the salt: ``repartition(n, partition_cols)`` hashes on the
    partition columns ALONE, so every row of one partition value lands
    in exactly one task no matter what n says — at 100 TB that funnels
    each (possibly multi-TB) partition through a single writer. Adding a
    salt key bounds the writer-group count per partition value at
    ``files_per_partition`` while keeping parallelism. The default salt
    is a deterministic hash of the cluster columns (same input -> same
    layout, unlike rand()); pass ``salt`` to control file splits
    exactly (e.g. ``F.col("event_id") % 4`` makes per-partition file
    counts a pure function of the data).

    sortWithinPartitions keeps the sort OUT of the shuffle (no global
    ordering — local per-task sort only), which is what parquet needs
    for tight row-group min/max ranges.

    ``files_per_partition`` is an UPPER bound on writer groups, not an
    exact count: the repartition is column-keyed (no forced partition
    count), so AQE's partition coalescing still merges salt buckets
    that fall below the advisory target size. That interaction is
    deliberate — at 100 TB a hot date spreads across the full salt
    range (its buckets are large, AQE leaves them alone) while a
    near-empty date collapses to one file instead of n tiny ones. Pin
    `spark.sql.adaptive.coalescePartitions.enabled=false` if an exact
    salt-group layout is required (tests/test_layout.py does).
    """
    n = max(1, files_per_partition)
    keys: list[Column] = [F.col(c) for c in partition_cols]
    if n > 1:
        if salt is None:
            basis = cluster_cols if cluster_cols else df.columns
            salt = F.pmod(F.hash(*[F.col(c) for c in basis]), F.lit(n))
        keys.append(salt.alias("__salt"))
    (
        df.repartition(*keys)
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
    files_per_partition: int = 1,
) -> None:
    """Rewrite ``path`` in place to the clustered layout (row-preserving).

    Reads the full dataset, stages the rewrite to ``path + .compact``,
    then swaps via rename-aside: old -> ``path + .old``, staged -> live,
    delete old. At no instant is the live path missing — a crash leaves
    either the original intact (before the first rename) or the staged
    copy live (after the second); the stray ``.old``/``.compact`` dirs
    are cleaned up by the next run. Object-store deployments would
    dynamic-overwrite partition-by-partition instead.
    """
    import shutil

    staged = path.rstrip("/") + ".compact"
    old = path.rstrip("/") + ".old"
    shutil.rmtree(staged, ignore_errors=True)  # leftover from a crash
    shutil.rmtree(old, ignore_errors=True)
    df = spark.read.parquet(path)
    write_clustered(
        df,
        staged,
        partition_cols,
        cluster_cols,
        max_records_per_file=max_records_per_file,
        files_per_partition=files_per_partition,
    )
    # swap only after the staged write fully committed
    os.rename(path, old)
    os.rename(staged, path)
    shutil.rmtree(old)


def file_stats(spark: SparkSession, path: str) -> DataFrame:
    """(partition, n_files, n_rows, n_bytes): layout health per
    partition directory. Row counts come from parquet footer metadata
    (num_rows) — no column data is read."""
    import pyarrow.parquet as pq

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
                sum(
                    pq.read_metadata(os.path.join(dirpath, f)).num_rows
                    for f in data
                ),
                sum(os.path.getsize(os.path.join(dirpath, f)) for f in data),
            )
        )
    from ..sources.tables import local_df

    return local_df(
        spark,
        rows or [("", 0, 0, 0)],
        "partition string, n_files int, n_rows bigint, n_bytes bigint",
    )
