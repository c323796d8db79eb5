"""Integer PageRank: reference recursion parity + determinism."""

from __future__ import annotations

from airflow_iceberg_pipeline_stock_tracker_spark.operators import pagerank


def _reference(edges: list[tuple[str, str]], iters: int) -> dict[str, int]:
    """The same fixed-point recursion in plain Python integers."""
    from collections import defaultdict

    outdeg: dict[str, int] = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    nodes = sorted({n for e in edges for n in e})
    r = {n: pagerank.PR_SCALE for n in nodes}
    tele = pagerank.PR_SCALE * 15 // 100
    for _ in range(iters):
        mass: dict[str, int] = defaultdict(int)
        for s, d in edges:
            mass[d] += (r[s] * 85) // (100 * outdeg[s])
        r = {n: tele + mass[n] for n in nodes}
    return r


def test_pagerank_matches_reference_recursion(spark):
    # trade pairs: S1-{C1,C2}, S2-{C2}; bipartite both-ways edges
    orders = spark.createDataFrame(
        [(1, 101), (2, 102), (3, 102)], ["o_orderkey", "o_custkey"]
    )
    lineitem = spark.createDataFrame(
        [(1, 11), (2, 11), (3, 12)], ["l_orderkey", "l_suppkey"]
    )
    got = {
        r.node: r.r
        for r in pagerank.pagerank_bipartite(lineitem, orders).collect()
    }
    pairs = [("S11", "C101"), ("S11", "C102"), ("S12", "C102")]
    edges = pairs + [(c, s) for s, c in pairs]
    want = _reference(edges, pagerank.PR_ITERS)
    assert got == want
    # the hub (C102: degree 2) must outrank the leaf (C101: degree 1)
    assert got["C102"] > got["C101"]


def test_pagerank_is_bit_deterministic_across_runs(spark, sf_dir):
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import (
        load_table,
    )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    a = pagerank.pagerank_bipartite(li, orders).collect()
    b = pagerank.pagerank_bipartite(li, orders).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == pagerank.PR_TOP
