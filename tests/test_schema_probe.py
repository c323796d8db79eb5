"""Testdata schema-drift gate (VERDICT r3 item 2).

One silent fixture regeneration (events.ts nanos -> timestamp[us]) cost
round 3 its bench and 8 correctness rows. These tests pin every driver
table's physical schema at every scale factor, so drift fails HERE with
the column named, not eight queries deep.
"""

from __future__ import annotations

import os

import pytest

from airflow_iceberg_pipeline_stock_tracker_spark.sources.schema_probe import (
    EXPECTED,
    SchemaDriftError,
    check_sf_dir,
)

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_no_schema_drift(sf_dir):
    check_sf_dir(sf_dir)


def test_probe_detects_drift(tmp_path):
    """The probe itself must catch a drifted column and name it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # events with ts as plain string — not an accepted variant
    bad = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array(["2024-01-01"], pa.string()),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["click"], pa.string()),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    pq.write_table(bad, tmp_path / "events.parquet")
    with pytest.raises(SchemaDriftError) as ei:
        check_sf_dir(str(tmp_path))
    assert "events.ts" in str(ei.value) and "drifted" in str(ei.value)


def test_probe_covers_all_tables():
    from airflow_iceberg_pipeline_stock_tracker_spark.schemas import TESTDATA_TABLES

    assert set(EXPECTED) == set(TESTDATA_TABLES)
