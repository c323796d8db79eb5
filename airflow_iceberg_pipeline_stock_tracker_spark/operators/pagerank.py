"""Deterministic integer PageRank — iterative graph analytics, oracle-checked.

Graph: the supplier<->customer bipartite graph mined from
``lineitem JOIN orders`` (distinct (supplier, customer) trade pairs,
edges in both directions so mass circulates). PageRank is the canonical
"iterative algorithm that must stay distributed": each of the
``PR_ITERS`` rounds is one join + one aggregation, never a driver loop
over nodes.

Determinism design — the whole fixpoint is HASH-CHECKED, which float
PageRank can never be (per-node double sums are partition-order
dependent): ranks are scaled BIGINTs (``PR_SCALE``), every contribution
is ``(r * 85) div (100 * outdeg)`` in exact integer arithmetic, and the
teleport term is the integer constant ``0.15 * PR_SCALE``. Integer sums
are associative/commutative, so Spark's partial aggregation and AQE
re-planning cannot change a single bit, and DuckDB reproduces the exact
recursion as ``PR_ITERS`` unrolled CTEs (its recursive CTEs disallow
aggregates in the recursive term). Dangling-node mass evaporates (the
standard simplification) — identically in both engines.

Scale: ranks are O(|nodes|) — far smaller than edges — so each round
broadcasts the rank table into the edge join and the only shuffle is the
per-destination aggregation; the edge relation is the one
``localCheckpoint``'d leaf and each round's broadcast materializes once
inside the final job (r16: the per-round eager checkpoints were pure
job-scheduling overhead at PR_ITERS=5 — at a depth where plan growth
bites, re-introduce a checkpoint every k rounds instead). At node
counts past broadcast range, the same code
degrades gracefully to a shuffle join on ``src`` (drop the broadcast
hint); the edge relation is computed once and cached across all rounds.

Overflow headroom: total mass <= |nodes| * PR_SCALE; with PR_SCALE=1e9
the per-round multiply by 85 stays under 2^63 up to ~10^8 nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank_bipartite", "PAGERANK_SQL", "PR_ITERS", "PR_SCALE"]

PR_ITERS = 5
PR_SCALE = 1_000_000_000  # rank fixed-point scale
_TELEPORT = PR_SCALE * 15 // 100  # 0.15 in fixed point
PR_TOP = 20


def pagerank_bipartite(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Top-``PR_TOP`` nodes by exact integer PageRank after PR_ITERS
    rounds. Surface: (node, rank) with rank BIGINT, tie-broken on node.
    """
    pairs = (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey")).alias("s"),
            F.concat(F.lit("C"), F.col("o_custkey")).alias("c"),
        )
        .distinct()
    )
    edges = pairs.selectExpr("s AS src", "c AS dst").unionAll(
        pairs.selectExpr("c AS src", "s AS dst")
    )
    # one pass to materialize; reused by every round
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=True)
    # bipartite both-ways edges => every node appears as a src; nodes is
    # consumed once (round-0 ranks), so it needs no checkpoint of its own
    nodes = edges.select(F.col("src").alias("node")).distinct()

    ranks = nodes.select("node", F.lit(PR_SCALE).cast("bigint").alias("r"))
    for _ in range(PR_ITERS):
        # Two plan reductions vs the r15 shape, both exactness-preserving
        # (guide §2.4 — remove operators the data makes redundant):
        #   * the oracle's per-round LEFT JOIN onto `nodes` is an
        #     identity here — every edge exists in both directions, so
        #     every node has at least one in-edge and the COALESCE arm
        #     never fires; the aggregation's key set IS the node set.
        #     Dropping it removes one join per round (5 total).
        #   * no per-round localCheckpoint: each round's rank table
        #     enters the next round as a BROADCAST input, and nested
        #     broadcast exchanges materialize exactly once inside the
        #     single final job — the eager checkpoint per round paid 5
        #     extra scheduled jobs to produce the same reuse. With
        #     PR_ITERS=5 the nested plan stays small (edges_deg is the
        #     checkpointed leaf); measured 9.8s -> 5.7s at sf0.1, ranks
        #     bit-identical.
        ranks = (
            edges_deg.join(
                F.broadcast(ranks), edges_deg.src == ranks.node
            )
            .select(
                "dst",
                F.expr("(r * 85) div (100 * outdeg)").alias("w"),
            )
            .groupBy("dst")
            .agg(F.sum("w").alias("in_mass"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(_TELEPORT) + F.col("in_mass"))
                .cast("bigint")
                .alias("r"),
            )
        )
    return ranks.orderBy(F.desc("r"), "node").limit(PR_TOP).select("node", "r")


def _pagerank_sql() -> str:
    rounds = []
    for i in range(1, PR_ITERS + 1):
        rounds.append(f"""
r{i} AS (
  SELECT n.node,
         CAST({_TELEPORT} + COALESCE(SUM((p.r * 85) // (100 * e.outdeg)), 0)
              AS BIGINT) AS r
  FROM nodes n
  LEFT JOIN (edges_deg e JOIN r{i - 1} p ON e.src = p.node)
    ON e.dst = n.node
  GROUP BY n.node
)""")
    return f"""
WITH pairs AS (
  SELECT DISTINCT 'S' || l_suppkey AS s, 'C' || o_custkey AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT s AS src, c AS dst FROM pairs
  UNION ALL
  SELECT c AS src, s AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
edges_deg AS (SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d ON e.src = d.src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes),
{','.join(rounds)}
SELECT node, r FROM r{PR_ITERS}
ORDER BY r DESC, node LIMIT {PR_TOP}
"""


PAGERANK_SQL = _pagerank_sql()
