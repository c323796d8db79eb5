"""Triangle census of the co-purchase graph (graphlet counting).

The reference stops at per-ticker window analytics
(``/root/reference/dags/dag.py:318-376``); a training-data / analytics
engine also needs local graph structure — triangles are the building
block for clustering coefficients, community seeds, and spam/bot
detection on co-occurrence graphs.

Algorithm (compact-forward / degree orientation, the standard
MapReduce-era trick from Suri & Vassilvitskii's "Counting Triangles
and the Curse of the Last Reducer", WWW'11):

  * undirected edges (u < v) from distinct co-purchase pairs;
  * orient every edge from its lower-(degree, id) endpoint to its
    higher one — a total order, so each triangle has EXACTLY ONE node
    with out-edges to both others and is counted exactly once;
  * wedges = pairs of out-edges from one source (ordered by the same
    (degree, id) tuple), closed by an equi-join back on the oriented
    edge list.

Why the orientation matters at 100 TB: out-degree under (degree, id)
ordering is bounded by O(sqrt(m)) (graph arboricity), so the wedge
fan-out is sum-of-C(outdeg,2) instead of sum-of-C(degree,2) — the
hub that would explode a naive neighbor self-join ("the curse of the
last reducer") contributes only wedges where it is the LOW endpoint.
Everything is an equi-join / map-combinable aggregate: one shuffle to
build edges (orderkey), one on the wedge source, one on (b, c) for
closure — no global window, no driver state, exact int64 throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BRAND_PREFIX = "Brand#1"  # deterministic scope: 5 of the 25 TPC-H brands


def copurchase_edges(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Distinct undirected co-purchase edges (u < v) between parts of
    the scoped brands, from order baskets (<= 7 lines/order, so the
    per-basket fan-out is <= C(7,2) — linear in orders)."""
    scoped = part.filter(F.col("p_brand").startswith(BRAND_PREFIX)).select(
        "p_partkey"
    )
    items = (
        lineitem.select("l_orderkey", "l_partkey")
        # part is a dimension: broadcast here; at a scale where the
        # scoped key set outgrows the driver, drop the hint and let
        # AQE pick the exchange
        .join(F.broadcast(scoped), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )


def triangle_census(edges: DataFrame, k: int = 20) -> DataFrame:
    """Top-``k`` nodes by triangle participation: (part, degree,
    tri_count, clustering). Clustering is the exact rational
    2*tri / (d*(d-1)) as one closing division, NULL for degree-1 nodes
    (no wedge to close — the finance NULL contract, never a
    DIVIDE_BY_ZERO). Ties broken by part id; every count exact int64
    (tests/test_properties.py::test_triangle_census_reference).
    """
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    with_deg = edges.join(du, "u").join(dv, "v")
    lo_first = F.struct("du", "u") < F.struct("dv", "v")
    oriented = with_deg.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(lo_first, F.col("dv")).otherwise(F.col("du")).alias("dt"),
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedge = e1.join(
        e2,
        (F.col("e1.s") == F.col("e2.s"))
        & (
            F.struct(F.col("e1.dt"), F.col("e1.t"))
            < F.struct(F.col("e2.dt"), F.col("e2.t"))
        ),
    ).select(
        F.col("e1.s").alias("a"),
        F.col("e1.t").alias("b"),
        F.col("e2.t").alias("c"),
    )
    closer = oriented.select(F.col("s").alias("b"), F.col("t").alias("c"))
    tri = wedge.join(closer, ["b", "c"])
    per_node = (
        tri.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri_count"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            F.col("node").alias("part"),
            F.col("d").alias("degree"),
            F.coalesce("tri_count", F.lit(0)).alias("tri_count"),
            F.when(
                F.col("d") >= 2,
                (F.lit(2) * F.coalesce("tri_count", F.lit(0)))
                / (F.col("d") * (F.col("d") - F.lit(1))),
            ).alias("clustering"),
        )
        .orderBy(F.desc("tri_count"), "part")
        .limit(k)
    )


def parts_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    # the edge list feeds FOUR consumers (degree x2, orientation, the
    # closing join); Catalyst does not share subplans, so without a
    # materialization the basket self-join runs four times. The edge
    # list is two longs per edge — orders of magnitude below the fact
    # input — so one eager localCheckpoint trades a small write for 3x
    # of the dominant join (same call pattern as the BM25 tokenize pass)
    edges = copurchase_edges(li, pt).localCheckpoint(eager=True)
    return triangle_census(edges)


TRIANGLE_SQL = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand LIKE 'Brand#1%'
), edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges)
  GROUP BY node
), oriented AS (
  SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS s,
         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS t,
         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END AS dt
  FROM edges e
  JOIN deg du ON du.node = e.u
  JOIN deg dv ON dv.node = e.v
), wedge AS (
  SELECT e1.s AS a, e1.t AS b, e2.t AS c
  FROM oriented e1
  JOIN oriented e2 ON e1.s = e2.s AND (e1.dt, e1.t) < (e2.dt, e2.t)
), tri AS (
  SELECT w.a, w.b, w.c
  FROM wedge w JOIN oriented e3 ON e3.s = w.b AND e3.t = w.c
), per_node AS (
  SELECT node, COUNT(*) AS tri_count FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b AS node FROM tri
    UNION ALL SELECT c AS node FROM tri)
  GROUP BY node
)
SELECT deg.node AS part,
       CAST(deg.d AS BIGINT) AS degree,
       CAST(COALESCE(per_node.tri_count, 0) AS BIGINT) AS tri_count,
       CASE WHEN deg.d >= 2
            THEN CAST(2 * COALESCE(per_node.tri_count, 0) AS DOUBLE)
                 / (deg.d * (deg.d - 1)) END AS clustering
FROM deg LEFT JOIN per_node ON per_node.node = deg.node
ORDER BY tri_count DESC, part
LIMIT 20
"""
