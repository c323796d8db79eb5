"""As-of join semantics: backward match, inclusive ties, left-join nulls,
multi-key, collision guard — plus cross-engine parity with DuckDB's
native ASOF JOIN on the same rows."""
from __future__ import annotations

from datetime import datetime

import duckdb
import pytest

from airflow_iceberg_pipeline_stock_tracker_spark.operators.asof import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture()
def quotes(spark):
    # (key, time, value) right side — unique per (key, time)
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:00:00"), 10.0),
            ("A", _ts("2024-01-01 10:00:00"), 11.0),
            ("A", _ts("2024-01-01 11:00:00"), 12.0),
            ("B", _ts("2024-01-01 10:30:00"), 99.0),
        ],
        "sym string, quote_ts timestamp, px double",
    )


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 08:59:59")),  # before any quote -> null
            (2, "A", _ts("2024-01-01 10:00:00")),  # exact tie -> inclusive
            (3, "A", _ts("2024-01-01 10:59:59")),  # between -> 10:00 quote
            (4, "B", _ts("2024-01-01 12:00:00")),  # latest B quote
            (5, "C", _ts("2024-01-01 12:00:00")),  # key with no quotes -> null
        ],
        "trade_id bigint, sym string, trade_ts timestamp",
    )


def test_backward_inclusive_semantics(trades, quotes):
    out = {
        r.trade_id: (r.quote_ts, r.px)
        for r in asof_join(
            trades, quotes, on="sym", left_time="trade_ts", right_time="quote_ts"
        ).collect()
    }
    assert len(out) == 5  # every left row survives
    assert out[1] == (None, None)
    assert out[2] == (_ts("2024-01-01 10:00:00"), 11.0)  # tie is inclusive
    assert out[3] == (_ts("2024-01-01 10:00:00"), 11.0)
    assert out[4] == (_ts("2024-01-01 10:30:00"), 99.0)
    assert out[5] == (None, None)


def test_matches_duckdb_asof(trades, quotes):
    spark_rows = sorted(
        (r.trade_id, r.quote_ts, r.px)
        for r in asof_join(
            trades, quotes, on="sym", left_time="trade_ts", right_time="quote_ts"
        ).collect()
    )
    con = duckdb.connect()
    con.register("trades", trades.toPandas())
    con.register("quotes", quotes.toPandas())
    duck_rows = sorted(
        (int(tid), qts, px)
        for tid, qts, px in con.sql(
            """
            SELECT t.trade_id, q.quote_ts, q.px
            FROM trades t ASOF LEFT JOIN quotes q
              ON t.sym = q.sym AND t.trade_ts >= q.quote_ts
            """
        ).fetchall()
    )
    assert spark_rows == duck_rows


def test_multi_column_key(spark):
    left = spark.createDataFrame(
        [(1, "A", "x", _ts("2024-01-01 10:00:00"))],
        "id bigint, k1 string, k2 string, t timestamp",
    )
    right = spark.createDataFrame(
        [
            ("A", "x", _ts("2024-01-01 09:00:00"), 1.0),
            ("A", "y", _ts("2024-01-01 09:30:00"), 2.0),  # wrong k2 — ignored
        ],
        "k1 string, k2 string, rt timestamp, v double",
    )
    rows = asof_join(
        left, right, on=["k1", "k2"], left_time="t", right_time="rt"
    ).collect()
    assert [(r.id, r.v) for r in rows] == [(1, 1.0)]


def test_column_collision_raises(spark):
    left = spark.createDataFrame([(1, "A", _ts("2024-01-01 10:00:00"), 5.0)],
                                 "id bigint, k string, t timestamp, px double")
    right = spark.createDataFrame([("A", _ts("2024-01-01 09:00:00"), 1.0)],
                                  "k string, rt timestamp, px double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", left_time="t", right_time="rt")
