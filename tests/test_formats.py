"""JSONL / CSV ingestion parity with the parquet source."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_iceberg_pipeline_stock_tracker_spark.sources import formats
from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import load_table


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_jsonl_round_trip_exact(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "ev_jsonl")
    formats.write_jsonl(ev, path)
    back = formats.read_jsonl(spark, path, ev.schema)
    assert back.schema == ev.schema
    assert _rows(back) == _rows(ev)


def test_csv_round_trip_exact(spark, sf_dir, tmp_path):
    """CSV must survive the props column (embedded JSON with commas and
    quotes) and microsecond timestamps."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "ev_csv")
    formats.write_csv(ev, path)
    back = formats.read_csv(spark, path, ev.schema)
    assert back.schema == ev.schema
    assert _rows(back) == _rows(ev)


def test_query_results_identical_across_formats(spark, sf_dir, tmp_path):
    """The same aggregation over parquet/JSONL/CSV sources returns the
    same rows — the source layer is format-transparent."""
    ev = load_table(spark, sf_dir, "events")
    jp = str(tmp_path / "fmt_jsonl")
    cp = str(tmp_path / "fmt_csv")
    formats.write_jsonl(ev, jp)
    formats.write_csv(ev, cp)

    def agg(df):
        return _rows(
            df.groupBy("event_type").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
            )
        )

    want = agg(ev)
    assert agg(formats.read_jsonl(spark, jp, ev.schema)) == want
    assert agg(formats.read_csv(spark, cp, ev.schema)) == want


def test_jsonl_failfast_on_corrupt_record(spark, sf_dir, tmp_path):
    """Pinned-schema ingestion must fail LOUDLY on a corrupt line, not
    silently null it out (the PERMISSIVE default) — silent nulls at
    100 TB are unfindable data loss."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "bad_jsonl")
    formats.write_jsonl(ev.limit(10), path)
    part = next(
        p for p in __import__("os").listdir(path) if p.endswith(".json")
    )
    with open(f"{path}/{part}", "a") as f:
        f.write('{"event_id": "not-a-number", "ts": 12, "user_id": {}}\n')
    with _pytest.raises((PySparkException, Py4JJavaError)):
        formats.read_jsonl(spark, path, ev.schema).count()


def test_orc_round_trip_exact(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "ev_orc")
    formats.write_orc(ev, path)
    back = formats.read_orc(spark, path, ev.schema)
    assert back.schema == ev.schema
    assert _rows(back) == _rows(ev)


def test_orc_scan_keeps_pushdown_and_pruning(spark, sf_dir, tmp_path):
    """The point of offering ORC at all: its scans must push filters and
    prune columns like parquet, or every downstream plan regresses."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "ev_orc2")
    formats.write_orc(ev, path)
    df = (
        formats.read_orc(spark, path, ev.schema)
        .where(F.col("event_type") == "error")
        .select("event_id", "user_id")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,error)]" in plan
    assert "ReadSchema: struct<event_id:bigint,user_id:bigint" in plan


def test_schema_evolution_on_read_merge_schema(spark, tmp_path):
    """A column added mid-stream must not strand old files: reading the
    mixed directory with mergeSchema unions the schemas, old rows
    surface NULL for the new column, and a filter on the new column
    still prunes correctly — the parquet-level half of the schema
    evolution the reference gets from Iceberg."""
    from pyspark.sql import functions as F

    v1 = spark.createDataFrame(
        [(1, "AAPL", 10.0), (2, "MSFT", 11.0)], "id long, ticker string, close double"
    )
    v2 = spark.createDataFrame(
        [(3, "AAPL", 12.0, 500), (4, "GOOG", 13.0, 700)],
        "id long, ticker string, close double, volume long",
    )
    path = str(tmp_path / "evolved")
    v1.write.parquet(path + "/batch=1")
    v2.write.parquet(path + "/batch=2")
    df = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(df.columns) == {"id", "ticker", "close", "volume", "batch"}
    rows = {r.id: r.volume for r in df.collect()}
    assert rows == {1: None, 2: None, 3: 500, 4: 700}
    # predicates on the evolved column behave (NULL rows excluded)
    assert df.where(F.col("volume") > 600).count() == 1
