"""Snapshot tables: atomic commit, crash windows, time travel, vacuum."""

from __future__ import annotations

import json
import os

import pytest

from airflow_iceberg_pipeline_stock_tracker_spark.sources import snapshots


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "snaptbl")


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], ["x"])


def test_commit_append_and_overwrite_lineage(spark, tdir):
    snapshots.commit(_df(spark, [1, 2]), tdir, mode="overwrite")
    snapshots.commit(_df(spark, [3]), tdir, mode="append")
    assert snapshots.history(tdir) == [1, 2]
    assert sorted(r.x for r in snapshots.read(spark, tdir).collect()) == [1, 2, 3]
    # overwrite starts a fresh lineage but history still reaches the old
    snapshots.commit(_df(spark, [9]), tdir, mode="overwrite")
    assert sorted(r.x for r in snapshots.read(spark, tdir).collect()) == [9]
    assert sorted(
        r.x for r in snapshots.read(spark, tdir, version=2).collect()
    ) == [1, 2, 3]


def test_time_travel_is_stable_after_later_commits(spark, tdir):
    snapshots.commit(_df(spark, [1]), tdir, mode="overwrite")
    v1 = snapshots.read(spark, tdir, version=1)
    snapshots.commit(_df(spark, [2]), tdir, mode="append")
    # a reader planned before the new commit still sees only v1's files
    assert [r.x for r in v1.collect()] == [1]
    assert sorted(r.x for r in snapshots.read(spark, tdir, version=1).collect()) == [1]


def test_crash_after_data_write_before_swap_is_invisible(spark, tdir):
    """The uncommitted-files guarantee: data directories written by a
    crashed commit are never resolved by any reader."""
    snapshots.commit(_df(spark, [1]), tdir, mode="overwrite")
    # simulate the crash: data of snap-000002 fully written, manifest
    # swap never happened
    _df(spark, [99]).write.parquet(os.path.join(tdir, "snap-000002"))
    assert snapshots.history(tdir) == [1]
    assert [r.x for r in snapshots.read(spark, tdir).collect()] == [1]
    # recovery: the next commit claims id 2... which collides with the
    # orphan dir — errorifexists write refuses to silently reuse it
    with pytest.raises(Exception):
        snapshots.commit(_df(spark, [2]), tdir, mode="append")


def test_manifest_swap_never_leaves_partial_state(spark, tdir):
    snapshots.commit(_df(spark, [1]), tdir, mode="overwrite")
    man = json.load(open(os.path.join(tdir, snapshots.MANIFEST)))
    assert man["current"] == 1
    # no temp manifests linger after a successful swap
    assert not [p for p in os.listdir(tdir) if p.endswith(".tmp")]


def test_vacuum_drops_only_unreferenced_history(spark, tdir):
    snapshots.commit(_df(spark, [1]), tdir, mode="overwrite")
    snapshots.commit(_df(spark, [2]), tdir, mode="append")
    snapshots.commit(_df(spark, [3]), tdir, mode="overwrite")
    removed = snapshots.vacuum(tdir, keep_last=1)
    # snaps 1+2's dirs are gone (unreferenced by snap 3), snap 3 intact
    assert set(removed) == {"snap-000001", "snap-000002"}
    assert snapshots.history(tdir) == [3]
    assert [r.x for r in snapshots.read(spark, tdir).collect()] == [3]
    with pytest.raises(ValueError):
        snapshots.read(spark, tdir, version=1)
