"""The remaining TPC-H decision-support shapes (q2/q8-q12/q19-q22).

With these, every TPC-H query shape q1-q22 has a registered twin —
adapted to the driver's trimmed schema (no partsupp table, no
l_shipmode/l_commitdate/l_receiptdate/c_phone columns; see TESTDATA.md):

  q2_min_cost_supplier      correlated MIN subquery over a 5-way join
                            (partsupp stood in by the lineitem offer set)
  q8_market_share           two-role nation join + conditional share by year
  q9_product_profit         profit expression over a 6-way join, by nation/year
  q10_returned_items        join-agg top-20 (revenue-ranked customers)
  q11_part_value_conc       HAVING vs scalar global-aggregate subquery
  q12_late_lines            join + CASE-conditional counts (lateness classes)
  q19_disjunctive_preds     OR-of-conjunctions spanning both join sides
  q20_excess_suppliers      chained semi-joins (part name -> offers -> supplier)
  q21_waiting_suppliers     self semi + anti join on the fact table
  q22_dormant_customers     substring bucketing + scalar AVG subquery + anti join

Scale stance (same as plans/relational_ext.py): decorrelate every
subquery into an aggregate + join; reduce the fact side FIRST; broadcast
every dimension; all money through exact integer cents
(functions/money.py) so partial aggregation order can never flip a hash;
ratio predicates cross-multiplied to pure int64.

Reference parity note: the reference pipeline itself has no joins
(``/root/reference/dags/dag.py`` is a single-table DAG); this module is
part of the §8 extension surface that makes the engine a complete
decision-support target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import cents, dollars
from ..sources.tables import load_table

# ---------------------------------------------------------------------------
# Q2-style: correlated MIN subquery -> per-part min + equi-join back
# ---------------------------------------------------------------------------


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest EUROPE supplier(s) per size-15 part.

    The trimmed schema has no partsupp, so the (part, supplier, cost)
    relation is mined from lineitem: cost of a (part, supplier) pair is
    the MIN line price that supplier ever charged for that part. The
    TPC-H shape is intact: a correlated `ps_supplycost = (SELECT MIN...)`
    decorrelates into a per-part MIN aggregate joined back on
    (partkey, cost).

    Scale: part (p_size=15) and the EUROPE supplier set are both tiny ->
    broadcast; lineitem is reduced by BOTH broadcasts before the only
    keyed shuffle (the per-(part,supp) MIN). The per-part re-MIN rides
    the same partitioning (partkey is a prefix of the first grouping),
    so AQE coalesces rather than re-shuffles.
    """
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size") == 15)
        .select("p_partkey", "p_name", "p_brand")
    )
    nr = (
        load_table(spark, sf_dir, "nation")
        .join(
            load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", cents("l_extendedprice").alias("price_c"))
        .join(F.broadcast(part.select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp.select("s_suppkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("price_c").alias("cost_c"))
    )
    best = (
        offers.groupBy("l_partkey")
        .agg(F.min("cost_c").alias("best_c"))
        .withColumnRenamed("l_partkey", "bpk")
    )
    return (
        offers.join(
            best,
            (F.col("l_partkey") == F.col("bpk")) & (F.col("cost_c") == F.col("best_c")),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "p_brand",
            dollars("cost_c").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = """
WITH supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), offers AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cost_c
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_size = 15
  JOIN supp ON l_suppkey = s_suppkey
  GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey AS bpk, MIN(cost_c) AS best_c FROM offers GROUP BY l_partkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, p_brand,
       cost_c / 100.0 AS supply_cost
FROM offers
JOIN best ON l_partkey = bpk AND cost_c = best_c
JOIN supp ON l_suppkey = s_suppkey
JOIN part ON l_partkey = p_partkey
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q8-style: national market share by year (two-role nation + CASE share)
# ---------------------------------------------------------------------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_7 suppliers' share of AMERICA-customer widget revenue by year.

    The nation dimension plays two roles (customer's nation pins the
    region; supplier's nation is the share predicate), each a separate
    broadcast build. The share is emitted as exact int64 numerator +
    denominator plus their double quotient — dividing two exactly-summed
    int64s is a single deterministic FP op, so the hash can't drift.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_c"),
    )
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").endswith("widget"))
        .select("p_partkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate").cast("date") >= F.lit("1995-01-01").cast("date"))
            & (F.col("o_orderdate").cast("date") <= F.lit("1996-12-31").cast("date"))
        )
        .select("o_orderkey", "o_custkey",
                F.year("o_orderdate").alias("o_year"))
    )
    nation = load_table(spark, sf_dir, "nation")
    cust_nat = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    load_table(spark, sf_dir, "region").where(
                        F.col("r_name") == "AMERICA"
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_nat = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_nat), orders.o_custkey == cust_nat.c_custkey)
        .join(F.broadcast(supp_nat), li.l_suppkey == supp_nat.s_suppkey)
    )
    return (
        joined.groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_7", F.col("rev_c"))
                .otherwise(F.lit(0).cast("bigint"))
            ).alias("nation_rev_c"),
            F.sum("rev_c").alias("total_rev_c"),
        )
        .select(
            "o_year",
            dollars("nation_rev_c").alias("nation_revenue"),
            dollars("total_rev_c").alias("total_revenue"),
            (F.col("nation_rev_c") / F.col("total_rev_c")).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
       SUM(CASE WHEN n2.n_name = 'NATION_7'
                THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                ELSE 0 END) / 100.0 AS nation_revenue,
       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
           / 100.0 AS total_revenue,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_7'
                THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                ELSE 0 END) AS DOUBLE)
         / SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
         AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_name LIKE '%widget'
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Q9-style: profit expression over a wide join, by supplier nation x year
# ---------------------------------------------------------------------------


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on blue parts by supplier nation and order year.

    No partsupp -> supply cost is modeled as 10% of the part's retail
    price. The profit expression stays exact: revenue cents minus
    (integral quantity x per-unit cost-cents), both int64 per row, so
    the wide join + two-key aggregate is associative end-to-end.
    """
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").startswith("blue"))
        # 10% of retail, in cents: retail * 0.1 * 100 = retail at scale 10
        .select(
            "p_partkey",
            cents(F.col("p_retailprice"), 10).alias("unit_cost_c"),
        )
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_c"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    supp_nat = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp_nat), li.l_suppkey == supp_nat.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn("profit_c", F.col("rev_c") - F.col("qty") * F.col("unit_cost_c"))
        .groupBy("nation", "o_year")
        .agg(F.sum("profit_c").alias("profit_c"),
             F.count(F.lit(1)).alias("n_lines"))
        .select("nation", "o_year", dollars("profit_c").alias("sum_profit"),
                "n_lines")
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           - CAST(l_quantity AS BIGINT)
             * CAST(ROUND(p_retailprice * 10) AS BIGINT)) / 100.0 AS sum_profit,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_name LIKE 'blue%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
ORDER BY n_name, o_year DESC
"""


# ---------------------------------------------------------------------------
# Q10-style: returned-item revenue, top-20 customers
# ---------------------------------------------------------------------------


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who returned the most revenue in 1995Q4 orders.

    Fact-side reduction first (returnflag + order-date quarter), ONE
    keyed shuffle on custkey, then the tiny aggregate joins broadcast
    nation. The top-20 is a global sort of a customer-cardinality
    aggregate — at 100 TB that's still just |customer| rows, and
    orderBy+limit compiles to TakeOrderedAndProject (no full sort).
    """
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate").cast("date") >= F.lit("1995-10-01").cast("date"))
            & (F.col("o_orderdate").cast("date") < F.lit("1996-01-01").cast("date"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select(
            "l_orderkey",
            cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_c"),
        )
    )
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(
            load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
        ),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rev_c").alias("rev_c"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select(
            "c_custkey", "c_name", dollars("rev_c").alias("revenue"),
            "c_acctbal", "n_name", "c_mktsegment",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name,
       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
         / 100.0 AS revenue,
       c_acctbal, n_name, c_mktsegment
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND CAST(o_orderdate AS DATE) >= DATE '1995-10-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1996-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q11-style: HAVING vs a scalar global-aggregate subquery
# ---------------------------------------------------------------------------


def q11_part_value_conc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts holding an outsized share of NATION_3-supplied line value.

    The scalar subquery (total value across ALL parts) is a 1-row
    aggregate of the SAME per-part relation — computed once from the
    grouped result and broadcast back, so the fact scans once. The
    `value > 0.1% of total` predicate is cross-multiplied to pure
    int64 (value_c * 1000 > total_c): no division, no epsilon.
    """
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").where(
                    F.col("n_name") == "NATION_3"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    per_part = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_partkey", cents("l_extendedprice").alias("val_c"))
        .groupBy("l_partkey")
        .agg(F.sum("val_c").alias("value_c"))
        # consumed twice (scalar total + the filter): eagerly materialize
        # the |partkey|-row aggregate so the fact scans ONCE, without
        # leaving a pinned cache entry behind in the shared session
        # (a .cache() here would outlive the query; the repo pattern is
        # eager localCheckpoint for small shared intermediates)
        .localCheckpoint(eager=True)
    )
    total = per_part.agg(F.sum("value_c").alias("total_c"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("value_c") * 1000 > F.col("total_c"))
        .select("l_partkey", dollars("value_c").alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS value_c
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey, value_c / 100.0 AS part_value
FROM per_part
WHERE value_c * 1000 > (SELECT CAST(SUM(value_c) AS BIGINT) FROM per_part)
ORDER BY part_value DESC, l_partkey
"""


# ---------------------------------------------------------------------------
# Q12-style: lateness-classified conditional counts
# ---------------------------------------------------------------------------


def q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1996 late shipments (shipped >60 days after order) by line status.

    The trimmed schema has no l_shipmode/l_receiptdate; the q12 shape —
    join + CASE-conditional counts per class — is preserved with
    l_linestatus as the class and ship-lag as the lateness predicate.
    The priority CASE folds into map-side partial SUMs (pure int64).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", F.col("l_shipdate").cast("date").alias("ship_d")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("order_d"),
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(
            (F.col("ship_d") > F.date_add(F.col("order_d"), 60))
            & (F.col("ship_d") >= F.lit("1996-01-01").cast("date"))
            & (F.col("ship_d") < F.lit("1997-01-01").cast("date"))
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
                ).otherwise(0).cast("bigint")
            ).alias("high_line_count"),
            F.sum(
                F.when(
                    ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
                ).otherwise(0).cast("bigint")
            ).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
  AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# ---------------------------------------------------------------------------
# Q19-style: OR-of-conjunctions spanning both join sides
# ---------------------------------------------------------------------------


def q19_disjunctive_preds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from three brand/size/quantity bands (OR of conjunctions).

    The disjunction mixes part-side (brand, size) and lineitem-side
    (quantity) predicates, so neither side can be fully pre-filtered —
    but each side's UNION of its own bounds CAN be pushed: size<=15 and
    brand IN (...) prune part before the broadcast; quantity<=30 prunes
    the fact scan. The exact OR evaluates post-join on the survivors.
    """
    part = (
        load_table(spark, sf_dir, "part")
        .where(
            F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
            & (F.col("p_size") <= 15)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") <= 30)
        .select(
            "l_partkey",
            F.col("l_quantity").alias("qty"),
            cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_c"),
        )
    )
    band1 = (
        (F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 5))
        & (F.col("qty").between(1, 11))
    )
    band2 = (
        (F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 10))
        & (F.col("qty").between(10, 20))
    )
    band3 = (
        (F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 15))
        & (F.col("qty").between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(band1 | band2 | band3)
        .agg(
            dollars(F.sum("rev_c")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q19_SQL = """
SELECT SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
         / 100.0 AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q20-style: chained semi-joins (name-selected parts -> offers -> suppliers)
# ---------------------------------------------------------------------------


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_6 suppliers who moved >50 units of any 'new *' part in 1996.

    The nested `s_suppkey IN (SELECT ... WHERE l_partkey IN (SELECT...))`
    chain becomes two semi-reductions: parts pruned by name prefix
    (broadcast into the fact scan), then a per-(supp, part) quantity
    aggregate whose survivors semi-join supplier. Each step shrinks the
    relation BEFORE the next join — the whole chain has one keyed
    shuffle (the aggregate).
    """
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").startswith("new"))
        .select("p_partkey")
    )
    movers = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
        .where(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(
            load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_6")
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return (
        supp.join(movers, supp.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_6'
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'new%')
    AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) > 50
)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q21-style: self semi + anti join on the fact table
# ---------------------------------------------------------------------------


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers solely responsible for a multi-supplier order shipping late.

    No l_receiptdate/l_commitdate in the trimmed schema -> "late" is
    shipped >90 days after the order date. The TPC-H shape survives
    intact: EXISTS (another supplier on the order) is a self SEMI join,
    NOT EXISTS (another LATE supplier) a self ANTI join, both against
    per-order supplier sets pruned to two bigint columns before their
    shuffles. Counting DISTINCT orders (not late lines) keeps the
    metric per-order as in the original.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", F.col("o_orderdate").cast("date").alias("order_d"))
    )
    lines = li.select("l_orderkey", "l_suppkey",
                      F.col("l_shipdate").cast("date").alias("ship_d"))
    late = (
        lines.join(orders, lines.l_orderkey == orders.o_orderkey)
        .where(F.col("ship_d") > F.date_add(F.col("order_d"), 90))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    all_pairs = lines.select("l_orderkey", "l_suppkey").distinct()
    # EXISTS other-supplier line on the same order
    others = all_pairs.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    with_other = late.join(
        others,
        (late.l_orderkey == others.o2) & (late.l_suppkey != others.s2),
        "left_semi",
    )
    # NOT EXISTS other LATE supplier on the same order
    late_others = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    sole_late = with_other.join(
        late_others,
        (with_other.l_orderkey == late_others.o3)
        & (with_other.l_suppkey != late_others.s3),
        "left_anti",
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(
            load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return (
        sole_late.join(F.broadcast(supp.select("s_suppkey", "s_name")),
                       sole_late.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_SQL = """
WITH pairs AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
  WHERE CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 90 DAY
)
SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey AND n_name = 'NATION_1'
WHERE EXISTS (SELECT 1 FROM pairs p
              WHERE p.l_orderkey = l1.l_orderkey
                AND p.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q22-style: substring bucketing + scalar AVG subquery + anti join
# ---------------------------------------------------------------------------


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-but-dormant customers by name-code bucket.

    No c_phone in the trimmed schema -> the country-code substring is
    taken from c_name ('Customer#000000042' -> '42'); every driver
    customer has >=1 lifetime order, so "dormant" is no order since
    2000-01-01 (the anti-join build side is date-filtered, same shape).
    The scalar AVG subquery is decorrelated into one (sum_c, cnt) row
    broadcast back, and `acctbal > avg` is cross-multiplied to exact
    int64 (bal_c * cnt > sum_c): no double AVG whose summation order
    could flip a boundary customer between engines. NOT EXISTS(orders)
    is a left ANTI join against the one-column order-customer projection.
    """
    codes = ["01", "11", "23", "31", "42"]
    cust = (
        load_table(spark, sf_dir, "customer")
        .withColumn("cntrycode", F.substring("c_name", 17, 2))
        .where(F.col("cntrycode").isin(codes))
        .select("c_custkey", "cntrycode", cents("c_acctbal").alias("bal_c"))
    )
    pos = cust.where(F.col("bal_c") > 0)
    avg_row = pos.agg(
        F.sum("bal_c").alias("sum_c"), F.count(F.lit(1)).alias("cnt")
    )
    rich = cust.join(F.broadcast(avg_row)).where(
        F.col("bal_c") * F.col("cnt") > F.col("sum_c")
    )
    ordered = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate").cast("date") >= F.lit("2000-01-01").cast("date"))
        .select("o_custkey")
    )
    return (
        rich.join(ordered, rich.c_custkey == ordered.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dollars(F.sum("bal_c")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_SQL = """
WITH cust AS (
  SELECT c_custkey, SUBSTRING(c_name, 17, 2) AS cntrycode,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer
  WHERE SUBSTRING(c_name, 17, 2) IN ('01', '11', '23', '31', '42')
), avg_row AS (
  SELECT CAST(SUM(bal_c) AS BIGINT) AS sum_c, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cust WHERE bal_c > 0
)
SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       SUM(bal_c) / 100.0 AS totacctbal
FROM cust, avg_row
WHERE bal_c * cnt > sum_c
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND CAST(o_orderdate AS DATE) >= DATE '2000-01-01')
GROUP BY cntrycode
ORDER BY cntrycode
"""


TPCH_SUITE_QUERIES = {
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q9_product_profit": (q9_product_profit, Q9_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "q11_part_value_conc": (q11_part_value_conc, Q11_SQL),
    "q12_late_lines": (q12_late_lines, Q12_SQL),
    "q19_disjunctive_preds": (q19_disjunctive_preds, Q19_SQL),
    "q20_excess_suppliers": (q20_excess_suppliers, Q20_SQL),
    "q21_waiting_suppliers": (q21_waiting_suppliers, Q21_SQL),
    "q22_dormant_customers": (q22_dormant_customers, Q22_SQL),
}
