"""merge_upsert semantics (operators/merge.py): the three MERGE branches
— matched-update, not-matched-insert, untouched passthrough — and the
operator's contract errors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_iceberg_pipeline_stock_tracker_spark.operators.merge import merge_upsert


def _frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 200), (3, "c", 300)],
        "k int, name string, bal int",
    )
    source = spark.createDataFrame(
        [(2, 50), (3, 70), (9, 900)], "k int, delta int"
    )
    return target, source


def test_all_three_branches(spark):
    target, source = _frames(spark)
    out = merge_upsert(
        target,
        source,
        keys=["k"],
        when_matched={"bal": F.col("t.bal") + F.col("s.delta")},
        when_not_matched={
            "name": F.lit("new"),
            "bal": F.col("s.delta"),
        },
    )
    rows = {r.k: (r.name, r.bal) for r in out.collect()}
    assert rows == {
        1: ("a", 100),  # untouched
        2: ("b", 250),  # matched: 200 + 50
        3: ("c", 370),  # matched: 300 + 70
        9: ("new", 900),  # inserted
    }
    assert out.columns == target.columns


def test_empty_source_is_identity(spark):
    target, source = _frames(spark)
    out = merge_upsert(
        target,
        source.where(F.lit(False)),
        keys=["k"],
        when_matched={"bal": F.col("s.delta")},
        when_not_matched={"name": F.lit("x"), "bal": F.col("s.delta")},
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, target.collect())
    )


def test_unmapped_matched_column_passes_through(spark):
    target, source = _frames(spark)
    out = merge_upsert(
        target,
        source,
        keys=["k"],
        when_matched={"bal": F.lit(0)},  # name not mapped -> keeps t.name
        when_not_matched={"name": F.lit("n"), "bal": F.lit(0)},
    )
    assert {r.k: r.name for r in out.collect()}[2] == "b"


def test_missing_insert_column_raises(spark):
    target, source = _frames(spark)
    with pytest.raises(ValueError, match="bal"):
        merge_upsert(
            target,
            source,
            keys=["k"],
            when_matched={},
            when_not_matched={"name": F.lit("n")},  # bal missing
        )


def test_unknown_mapping_column_raises(spark):
    target, source = _frames(spark)
    with pytest.raises(ValueError, match="balanc"):
        merge_upsert(
            target,
            source,
            keys=["k"],
            when_matched={"balanc": F.lit(0)},  # typo for "bal"
            when_not_matched={"name": F.lit("n"), "bal": F.lit(0)},
        )
