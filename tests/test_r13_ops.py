"""Round-13 operators: the CMS and KMV streaming sketch sinks.

Reference scope: extension tier — the reference DAG
(/root/reference/dags/dag.py) keeps only exact SQL aggregates; these
complete the "every sketch is maintainable incrementally" claim the
sketch modules make (r12 verdict ask #5): HLL got its sink in r12,
CMS/KMV get theirs here, over the same per-batch src_batch-partition
layout.
"""

from __future__ import annotations

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_iceberg_pipeline_stock_tracker_spark.operators import cms, kmv  # noqa: E402
from airflow_iceberg_pipeline_stock_tracker_spark.streaming import (  # noqa: E402
    sketch_sinks,
)

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
_BASE = dt.datetime(2024, 3, 1)


def _fresh_db(spark, db):
    import shutil

    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/{db}.db", ignore_errors=True)


def _rows(n, offset=0, types=("a", "b")):
    # repeated user_ids (i % 97) so CMS counts REAL multiplicities, not
    # a distinct set; two event types so KMV partitions by key
    return [
        (offset + i, _BASE, (offset + i) % 97, types[i % len(types)], 1.0, "{}")
        for i in range(n)
    ]


def test_cms_sink_merge_equals_onepass_across_batches(spark):
    """Rows split across micro-batches: the stored counter partials
    SUM-merged at read must equal the one-pass cms_build counter for
    counter — the addition-merge contract at the counter level."""
    b0, b1, b2 = _rows(150), _rows(200, offset=1000), _rows(50, offset=5000)
    db = "cms_sink_test"
    _fresh_db(spark, db)
    for i, b in enumerate((b0, b1, b2)):
        sketch_sinks.process_cms_batch(
            spark.createDataFrame(b, _SCHEMA), i, db=db
        )
    merged = {
        (r.j, r.bucket): r.cnt
        for r in sketch_sinks.merged_cms(spark, db).collect()
    }
    onepass = {
        (r.j, r.bucket): r.cnt
        for r in cms.cms_build(
            spark.createDataFrame(b0 + b1 + b2, _SCHEMA), "user_id"
        ).collect()
    }
    assert merged == onepass
    # every hash row's total is the total occurrence count — the
    # invariant the driver row surfaces as total_cnt
    totals = {}
    for (j, _), cnt in merged.items():
        totals[j] = totals.get(j, 0) + cnt
    assert set(totals.values()) == {len(b0) + len(b1) + len(b2)}
    _fresh_db(spark, db)


def test_cms_sink_replay_is_idempotent_by_layout_alone(spark):
    """THE reason this sink exists as a separate proof: counter addition
    is NOT idempotent (a naive append-and-sum sink would double-count a
    re-delivered batch), so exactly-once must come from the layout — a
    replayed batch_id overwrites its own src_batch partition with
    identical content. State table AND merged counters must be
    byte-identical after the replay."""
    db = "cms_replay_test"
    _fresh_db(spark, db)
    df = spark.createDataFrame(_rows(300), _SCHEMA)
    sketch_sinks.process_cms_batch(df, 0, db=db)
    sketch_sinks.process_cms_batch(spark.createDataFrame(_rows(80, offset=7000), _SCHEMA), 1, db=db)
    before_state = sorted(
        map(tuple, spark.table(f"{db}.{sketch_sinks.CMS_TABLE}").collect())
    )
    before_merged = sorted(
        map(tuple, sketch_sinks.merged_cms(spark, db).collect())
    )
    sketch_sinks.process_cms_batch(df, 0, db=db)  # replay batch 0
    after_state = sorted(
        map(tuple, spark.table(f"{db}.{sketch_sinks.CMS_TABLE}").collect())
    )
    after_merged = sorted(
        map(tuple, sketch_sinks.merged_cms(spark, db).collect())
    )
    assert before_state == after_state
    assert before_merged == after_merged
    _fresh_db(spark, db)


def test_kmv_sink_merge_equals_onepass_sample_sets(spark):
    """Per-batch bottom-k samples merged at read (distinct union then
    bottom-k) must equal the one-pass bottom_k over all rows, hash for
    hash per event_type — including users OVERLAPPING across batches
    (the distinct in the merge absorbs the duplicate hashes)."""
    b0 = _rows(400)
    b1 = [(10_000 + i, _BASE, i, "ab"[i % 2], 1.0, "{}") for i in range(50, 450)]
    db = "kmv_sink_test"
    _fresh_db(spark, db)
    sketch_sinks.process_kmv_batch(spark.createDataFrame(b0, _SCHEMA), 0, db=db)
    sketch_sinks.process_kmv_batch(spark.createDataFrame(b1, _SCHEMA), 1, db=db)
    merged = sorted(
        map(tuple, sketch_sinks.merged_kmv(spark, db).collect())
    )
    onepass = sorted(
        map(
            tuple,
            kmv.bottom_k(
                spark.createDataFrame(b0 + b1, _SCHEMA),
                ["event_type"],
                "user_id",
            ).collect(),
        )
    )
    assert merged == onepass
    _fresh_db(spark, db)


def test_kmv_sink_replay_is_idempotent_by_layout(spark):
    db = "kmv_replay_test"
    _fresh_db(spark, db)
    df = spark.createDataFrame(_rows(300), _SCHEMA)
    sketch_sinks.process_kmv_batch(df, 0, db=db)
    before = sorted(
        map(tuple, spark.table(f"{db}.{sketch_sinks.KMV_TABLE}").collect())
    )
    sketch_sinks.process_kmv_batch(df, 0, db=db)  # replay
    after = sorted(
        map(tuple, spark.table(f"{db}.{sketch_sinks.KMV_TABLE}").collect())
    )
    assert before == after
    _fresh_db(spark, db)
