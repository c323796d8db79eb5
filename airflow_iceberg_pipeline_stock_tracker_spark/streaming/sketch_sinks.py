"""Incremental CMS + KMV maintenance — the remaining streaming sketch twins.

``hll_sink`` (same package) established the layout: each micro-batch
folds its rows down to a tiny sketch partial and dynamic-partition-
overwrites EXACTLY its own ``src_batch`` partition of a state table, so
exactly-once under replay is a property of the LAYOUT (a re-delivered
batch_id rewrites its own partition with identical content and touches
nothing else) — no replay guard, no stored-state read in the hot path.
This module generalizes that design to the other two mergeable sketches
(r12 verdict ask #5), and the distinction between them is the point:

* **CMS** merge is counter ADDITION — *not* idempotent, so a naive
  append-and-sum sink double-counts on replay. The per-batch partition
  layout is what buys exactly-once: the sum at read ranges over one
  partial per batch, and replay replaces rather than appends. This is
  the sink where the layout does real work.
* **KMV** merge (distinct ∪ then bottom-k) is idempotent like HLL's
  max, so the layout is belt-and-braces — but the same layout keeps all
  three sinks operationally identical (one state table shape, one
  overwrite discipline, one render-at-read pattern).

Deliberately NOT here: the sketch quartet's fourth member, the 128-bin
equi-width quantile histogram (events_quantile_sketch). Its partials
sum like CMS counters — but only under SHARED bin edges, and the edges
derive from the GLOBAL (min, max), which a per-batch fold cannot know
yet. Histogram addition GIVEN shared edges is proven at the library
level (tests/test_plans.py::test_quantile_histogram_is_mergeable); a
sink would need either a calibration pass that freezes edges (two
drains of the source) or an edge-free sketch (KLL/t-digest), both of
which change the sketch's exactness contract — scoped out rather than
shipped with a silently weaker guarantee.

State volume per batch: CMS <= CMS_DEPTH x CMS_WIDTH pure-int counter
rows; KMV <= |keys| x KMV_K (key, hash) sample rows. Rendering merges
at read — counter-wise SUM for CMS, distinct+bottom-k for KMV — which
must equal the one-pass build over the same rows EXACTLY (integer
equality; the driver rows prove it as the query).

Reference scope: the reference pipeline (dags/dag.py) keeps only exact
SQL aggregates; this is the at-scale extension tier (a 100 TB
deployment maintains frequency/overlap sketches per ingest unit and
merges at query time instead of re-scanning raw events per refresh).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import pipeline
from ..operators import cms, kmv

CMS_TABLE = "cms_counters_state"
KMV_TABLE = "kmv_samples_state"

_CMS_COLS = "j int, bucket bigint, cnt bigint, src_batch bigint"
_KMV_COLS = "event_type string, h bigint, src_batch bigint"


def _ensure_table(spark: SparkSession, db: str, table: str, cols: str) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {db}.{table} ({cols}) "
        f"USING {pipeline._fmt(spark)} PARTITIONED BY (src_batch)"
    )


def _overwrite_own_partition(
    partial: DataFrame, batch_id: int, db: str, table: str
) -> None:
    """The shared layout move: write batch b's partial to partition
    src_batch=b and nothing else. Sketch partials are dimension-scale,
    so the shuffle is sized to the state, not the session default
    (save/restore — the caller's session is not ours to reconfigure;
    hll_sink's pattern)."""
    spark = partial.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    prior = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "8")
    try:
        out = partial.withColumn(
            "src_batch", F.lit(batch_id).cast("bigint")
        ).coalesce(1)  # one tiny file per batch partition
        pipeline._insert(out, f"{db}.{table}", overwrite=True)
    finally:
        spark.conf.set(conf_key, prior)


# --- CMS: counter addition at read -----------------------------------------

def process_cms_batch(
    batch: DataFrame, batch_id: int, db: str, item_col: str = "user_id"
) -> None:
    """Fold one micro-batch to its <= depth x width counter partial and
    overwrite partition src_batch=batch_id. Identical hash/bucket
    pipeline as the batch rows (operators/cms.cms_build), so the
    summed counters are integer-comparable to a one-pass build."""
    spark = batch.sparkSession
    _ensure_table(spark, db, CMS_TABLE, _CMS_COLS)
    partial = cms.cms_build(batch, item_col).select(
        F.col("j").cast("int").alias("j"),
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("cnt").cast("bigint").alias("cnt"),
    )
    _overwrite_own_partition(partial, batch_id, db, CMS_TABLE)


def merged_cms(spark: SparkSession, db: str) -> DataFrame:
    """Counter-wise SUM of the per-batch partials at read — must equal
    the one-pass cms_build over the same rows counter for counter
    (addition is the CMS merge; the per-batch partition layout is what
    makes the non-idempotent sum replay-safe)."""
    return (
        spark.table(f"{db}.{CMS_TABLE}")
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def run_cms_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    db: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain an events directory into the counter-state table
    (AvailableNow)."""
    q = (
        _events_reader(spark, events_dir, max_files_per_trigger)
        .writeStream.foreachBatch(
            lambda b, i: process_cms_batch(b, i, db=db)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# --- KMV: distinct + bottom-k at read ---------------------------------------

def process_kmv_batch(
    batch: DataFrame, batch_id: int, db: str, value_col: str = "user_id"
) -> None:
    """Fold one micro-batch to its per-event_type bottom-k sample
    partial (<= |types| x k rows) and overwrite partition
    src_batch=batch_id. Identical hash pipeline as operators/kmv.
    bottom_k, so the merged sample is hash-set-comparable to a
    one-pass build."""
    spark = batch.sparkSession
    _ensure_table(spark, db, KMV_TABLE, _KMV_COLS)
    partial = kmv.bottom_k(batch, ["event_type"], value_col).select(
        "event_type", F.col("h").cast("bigint").alias("h")
    )
    _overwrite_own_partition(partial, batch_id, db, KMV_TABLE)


def merged_kmv(spark: SparkSession, db: str) -> DataFrame:
    """Bottom-k of the distinct union of the per-batch samples at read
    — equals the one-pass bottom_k over all rows because any hash in
    the global bottom-k is necessarily in its own batch's bottom-k
    (the kmv_merge associativity contract, exercised cross-layer)."""
    from pyspark.sql import Window

    u = spark.table(f"{db}.{KMV_TABLE}").select("event_type", "h").distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    return (
        u.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= kmv.KMV_K)
        .drop("rnk")
    )


def run_kmv_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    db: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain an events directory into the sample-state table
    (AvailableNow)."""
    q = (
        _events_reader(spark, events_dir, max_files_per_trigger)
        .writeStream.foreachBatch(
            lambda b, i: process_kmv_batch(b, i, db=db)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _events_reader(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int | None
):
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(events_dir)
