"""r17 optimization-round pins.

Covers (1) the local_df hardening asked by the r16 advice file — the
classic-path fallback must engage (and match) for row shapes the
pandas/Arrow path rejects, and the -0.0 cell must keep its sign bit
through the Arrow path; (2) oracle-differential pins for every
driver-CHECKED query whose internals this round restructured
(retrieval_rag_recall's fused numpy grader, pipeline_micro_batch_parity's
single-action diff tail, prices_mor_deletes' fused parity check) —
each is diffed against its registered DuckDB oracle at sf0.001 under
the driver's own comparison semantics, exactly like the tail sweep.
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import local_df

_ESCALATION_SF_DIR = "/root/testdata/sf0.01"

# driver-checked rows whose internals r17 restructured: the tail-oracle
# sweep does not cover these (the driver does, but only once per round),
# so pin them here every CI run
_R17_RESTRUCTURED_CHECKED = [
    "retrieval_rag_recall",
    "retrieval_index_artifact",
    "pipeline_micro_batch_parity",
    "prices_mor_deletes",
]


def test_restructured_checked_rows_match_oracle(spark, sf_dir):
    import __spark_entry__ as entrymod
    from tools.selfcheck import compare_one, connect_oracle

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = connect_oracle(sf_dir)
    con_big = None
    failures: list[str] = []
    for name in _R17_RESTRUCTURED_CHECKED:
        n_rows, problems = compare_one(
            spark, con, name, queries[name], oracles.get(name), sf_dir
        )
        if not problems and n_rows == 0:
            if con_big is None:
                con_big = connect_oracle(_ESCALATION_SF_DIR)
            n_rows, problems = compare_one(
                spark, con_big, name, queries[name], oracles.get(name),
                _ESCALATION_SF_DIR,
            )
            if not problems and n_rows == 0:
                problems = ["0 rows even at the escalation SF (vacuous)"]
        if problems:
            failures.append(f"{name}: {problems[0]}")
    assert not failures, "\n".join(failures)


def test_local_df_falls_back_for_dict_rows(spark):
    """dict rows index by KEY, so the pandas path's positional r[i]
    raises and local_df must degrade to the classic createDataFrame
    path with identical values (r16 verdict ask #10: the fallback was
    untested for exactly this shape)."""
    rows = [{"a": 1, "b": "x"}, {"a": None, "b": None}]
    got = local_df(spark, rows, "a bigint, b string")
    want = spark.createDataFrame(rows, "a bigint, b string")
    assert got.schema == want.schema
    assert sorted(got.collect(), key=repr) == sorted(want.collect(), key=repr)


def test_local_df_row_objects_match_classic(spark):
    """pyspark Row objects support positional indexing, so they ride
    the Arrow path — values must match the classic path."""
    from pyspark.sql import Row

    rows = [Row(a=1, b="x"), Row(a=2, b=None)]
    got = local_df(spark, rows, "a bigint, b string")
    want = spark.createDataFrame(rows, "a bigint, b string")
    assert got.schema == want.schema
    assert sorted(got.collect(), key=repr) == sorted(want.collect(), key=repr)


def test_local_df_preserves_negative_zero_sign(spark):
    """-0.0 == 0.0 under Python ==, so the r16 equivalence test could
    not catch a sign-of-zero flip between the Arrow and pickled paths
    (r16 advice). Pin the sign bit explicitly."""
    got = local_df(spark, [(-0.0,), (0.0,)], "f double").collect()
    signs = sorted(math.copysign(1.0, r["f"]) for r in got)
    assert signs == [-1.0, 1.0]


def test_local_df_fallback_conf_is_restored(spark):
    """local_df pins arrow.pyspark.fallback.enabled=false around the
    conversion so silent non-Arrow degradation cannot happen — but it
    must restore the caller's setting afterwards."""
    key = "spark.sql.execution.arrow.pyspark.fallback.enabled"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        local_df(spark, [(1,)], "a bigint").collect()
        assert spark.conf.get(key) == "true"
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
