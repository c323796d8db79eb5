"""Relational operator shapes beyond the core TPC-H-ish set.

The reference never joins (its only multi-input operator is UNION ALL,
``/root/reference/dags/dag.py:279-307``), but a complete engine needs the
full decision-support shape catalogue. This module adds the shapes
``plans/queries.py`` does not yet exercise:

  q4_order_priority        EXISTS          -> left-semi join
  q13_customer_distribution LEFT OUTER + double aggregate (decorrelated)
  q16_supplier_cnt         NOT IN          -> broadcast left-anti join
  q17_small_qty_revenue    correlated scalar subquery -> decorrelated agg+join
  q18_large_orders         HAVING-subquery -> pre-aggregated semi filter
  revenue_rollup           GROUP BY ROLLUP -> Expand + grouping_id
  returnflag_pivot         PIVOT (explicit values -> no discovery scan)
  customer_merge_upsert    MERGE INTO algebra (operators/merge.py)
  events_window_funcs      lag/lead/row_number/ntile/dense_rank breadth

Every builder is paired with a DuckDB oracle twin; all money math goes
through exact integer cents (functions/money.py) so partial aggregation
and AQE can never perturb a hash.

Scale notes are inline per query; the common themes: decorrelate
subqueries into aggregates + joins (never per-row re-scans), reduce the
big side BEFORE any join, broadcast every genuinely small side, and keep
semi/anti joins on pruned single-column projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import cents, cents_sql, dollars
from ..operators.merge import merge_upsert
from ..sources.tables import load_table

# ---------------------------------------------------------------------------
# Q4-style: EXISTS -> left-semi join
# ---------------------------------------------------------------------------


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders in 1996Q1 having >=1 deep-discount line, counted by priority.

    EXISTS becomes a LEFT SEMI join: the probe side (orders) keeps its
    columns, the build side (lineitem) is pruned to l_orderkey before
    the shuffle — no distinct needed, semi-join semantics dedup for
    free. At 100 TB both sides shuffle on orderkey, but the lineitem
    side carries ONE bigint column after pushdown.
    """
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-04-01").cast("date"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_discount") > 0.06)
        .select("l_orderkey")
    )
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_discount > 0.06)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q13-style: LEFT OUTER join + two-level aggregate, decorrelated
# ---------------------------------------------------------------------------


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of non-urgent order counts per customer.

    The textbook form left-joins customer->orders then counts twice.
    Shuffle-minimal form used here: pre-aggregate orders by custkey
    FIRST (map-side combinable, output = one row per customer), then
    left-join customer to the tiny aggregate and count the distribution.
    Equivalent because c_custkey is unique in customer. At 100 TB the
    orders fact collapses before any join, and the join input is
    |customers| rows instead of |orders|.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .where(~F.col("o_orderpriority").like("%URGENT%"))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("c_count"))
    )
    return (
        cust.join(per_cust, "c_custkey", "left_outer")
        .select(F.coalesce("c_count", F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '%URGENT%'
  GROUP BY c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q16-style: NOT IN -> broadcast left-anti join
# ---------------------------------------------------------------------------


def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier count per (brand, type), excluding flagged suppliers.

    NOT IN over a subquery becomes a broadcast LEFT ANTI join: the
    flagged-supplier set (s_acctbal < 0 stands in for the reference
    benchmark's complaints filter; this table has no comment column) is
    tiny, so the lineitem side never shuffles for the exclusion. The
    only shuffles are the part join and the final distinct aggregate.
    """
    flagged = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(flagged), "l_suppkey", "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
    )


Q16_SQL = """
SELECT p_brand, p_type, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
"""


# ---------------------------------------------------------------------------
# Q17-style: correlated scalar subquery, decorrelated
# ---------------------------------------------------------------------------


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly revenue from lines under 20% of their part's average quantity.

    The correlated subquery `l_quantity < 0.2 * (SELECT AVG(l_quantity)
    ... WHERE l2.l_partkey = l_partkey)` decorrelates into a per-part
    aggregate joined back. Two scale moves:
      * the part filter (Brand#23, small sizes) is applied FIRST and the
        lineitem side is semi-reduced by a broadcast join to that part
        set BEFORE the per-part aggregate — the filter is on part
        attributes only, so the reduced set still contains every line
        of each surviving part and the aggregate is exact;
      * the 0.2*avg comparison is cross-multiplied into pure int64
        (5*qty*cnt < sum_qty): quantities are integral, so neither
        engine ever divides and the predicate can't flip on a last-ulp.
    """
    part = (
        load_table(spark, sf_dir, "part")
        .where((F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 10))
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(
            F.broadcast(part),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .drop("p_partkey")
    )
    stats = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt_qty"),
    )
    return (
        li.join(F.broadcast(stats), "l_partkey")
        .where(
            F.col("l_quantity").cast("bigint") * 5 * F.col("cnt_qty")
            < F.col("sum_qty")
        )
        .agg(
            (dollars(F.sum(cents("l_extendedprice"))) / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q17_SQL = """
SELECT SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 / 7.0 AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (SELECT l_partkey AS pk,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(COUNT(*) AS BIGINT) AS cnt_qty
      FROM lineitem GROUP BY l_partkey) stats ON pk = p_partkey
WHERE p_brand = 'Brand#23' AND p_size <= 10
  AND CAST(l_quantity AS BIGINT) * 5 * cnt_qty < sum_qty
"""


# ---------------------------------------------------------------------------
# Q18-style: HAVING-subquery -> pre-aggregated filter, no re-join of the fact
# ---------------------------------------------------------------------------


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers holding orders whose total quantity exceeds 300.

    `o_orderkey IN (SELECT ... HAVING SUM(qty) > 300)` pre-aggregates
    lineitem once; the surviving key set is tiny (tail of the per-order
    quantity distribution), so it broadcasts into orders and the total
    is carried along instead of re-joining lineitem a second time (the
    textbook plan scans the fact twice; this one folds the HAVING
    payload into the same aggregate).
    """
    big = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
    )


Q18_SQL = """
WITH big AS (
  SELECT l_orderkey AS bok,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
)
SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       total_qty
FROM orders
JOIN big ON o_orderkey = bok
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey
"""


# ---------------------------------------------------------------------------
# ROLLUP: grouping sets via Expand + grouping_id
# ---------------------------------------------------------------------------


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by (nation, year) with ROLLUP subtotals and grand total.

    Spark executes rollup as ONE Expand node feeding one hash aggregate:
    each input row fans out to its 3 grouping-set replicas map-side,
    partials combine per (gid, keys), and the single shuffle carries the
    combined partials — no per-level re-scan of the fact. grouping_id()
    mirrors DuckDB's GROUPING(n_name)*2 + GROUPING(o_year) bitmask.
    The year is projected BEFORE the rollup so both engines group on an
    identical concrete column, and NULL grouping keys are disambiguated
    from real values via the gid (COALESCE stands in 'ALL'/-1 labels).
    """
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.year(F.col("o_orderdate")).cast("bigint").alias("o_year"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_c")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .rollup("n_name", "o_year")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            dollars(F.sum("rev_c")).alias("revenue"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("o_year", F.lit(-1)).alias("o_year"),
            "gid",
            "revenue",
        )
        .orderBy("gid", "nation", "o_year")
    )


REVENUE_ROLLUP_SQL = """
WITH joined AS (
  SELECT n_name, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS rev_c
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
)
SELECT COALESCE(n_name, 'ALL') AS nation,
       COALESCE(o_year, -1) AS o_year,
       CAST(GROUPING(n_name) * 2 + GROUPING(o_year) AS BIGINT) AS gid,
       SUM(rev_c) / 100.0 AS revenue
FROM joined
GROUP BY ROLLUP(n_name, o_year)
ORDER BY gid, nation, o_year
"""


# ---------------------------------------------------------------------------
# PIVOT with explicit values
# ---------------------------------------------------------------------------


def returnflag_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per ship-year pivoted across return flags (A/N/R).

    The pivot values are EXPLICIT: Spark's value-less pivot() runs an
    eager distinct job over the pivot column before it can even build
    the plan — a full extra scan at 100 TB. With values supplied, pivot
    compiles to one groupBy with conditional aggregates (exactly the
    FILTER form in the oracle), single scan, single shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.select(
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
            "l_returnflag",
            rev.alias("rev_c"),
        )
        .groupBy("ship_year")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum("rev_c"))
        .select(
            "ship_year",
            dollars(F.coalesce("A", F.lit(0))).alias("rev_a"),
            dollars(F.coalesce("N", F.lit(0))).alias("rev_n"),
            dollars(F.coalesce("R", F.lit(0))).alias("rev_r"),
        )
        .orderBy("ship_year")
    )


RETURNFLAG_PIVOT_SQL = """
SELECT CAST(YEAR(l_shipdate) AS BIGINT) AS ship_year,
  COALESCE(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT))
           FILTER (WHERE l_returnflag='A'), 0) / 100.0 AS rev_a,
  COALESCE(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT))
           FILTER (WHERE l_returnflag='N'), 0) / 100.0 AS rev_n,
  COALESCE(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT))
           FILTER (WHERE l_returnflag='R'), 0) / 100.0 AS rev_r
FROM lineitem
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# MERGE INTO algebra (operators/merge.py)
# ---------------------------------------------------------------------------


def customer_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert 1996 order activity into a customer-balance dimension.

    Target: customers with c_custkey % 10 != 0 (a dimension missing some
    rows, so the insert branch is genuinely exercised). Source: per-
    customer 1996 spend in exact cents. MATCHED rows add the spend to
    the balance; NOT MATCHED keys insert a placeholder row; untouched
    target rows pass through. The broadcast-hinted source keeps the
    target on the streamed side of every branch join (merge_upsert's
    three-way decomposition — Spark can't broadcast a full-outer build,
    so the naive MERGE algebra would shuffle the whole target).
    """
    target = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 10 != 0)
        .select("c_custkey", "c_name", cents("c_acctbal").alias("acct_cents"))
    )
    source = (
        load_table(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == 1996)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.sum(cents("o_totalprice")).alias("spend_cents"))
    )
    merged = merge_upsert(
        target,
        F.broadcast(source),
        keys=["c_custkey"],
        when_matched={
            "acct_cents": F.col("t.acct_cents") + F.col("s.spend_cents"),
        },
        when_not_matched={
            "c_name": F.concat(F.lit("NEW#"), F.col("c_custkey").cast("string")),
            "acct_cents": F.col("s.spend_cents"),
        },
    )
    return merged.select(
        "c_custkey", "c_name", dollars("acct_cents").alias("acctbal")
    ).orderBy("c_custkey")


CUSTOMER_MERGE_SQL = """
WITH target AS (
  SELECT c_custkey, c_name,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acct_cents
  FROM customer WHERE c_custkey % 10 <> 0
),
source AS (
  SELECT o_custkey AS c_custkey,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS spend_cents
  FROM orders WHERE YEAR(o_orderdate) = 1996
  GROUP BY o_custkey
)
SELECT COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
       CASE WHEN t.c_custkey IS NULL
            THEN 'NEW#' || CAST(s.c_custkey AS VARCHAR)
            ELSE t.c_name END AS c_name,
       (CASE WHEN t.c_custkey IS NULL THEN s.spend_cents
             WHEN s.c_custkey IS NULL THEN t.acct_cents
             ELSE t.acct_cents + s.spend_cents END) / 100.0 AS acctbal
FROM target t FULL OUTER JOIN source s ON t.c_custkey = s.c_custkey
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# Window-function breadth: lag / lead / row_number / ntile / dense_rank
# ---------------------------------------------------------------------------


def events_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event stream annotated with the offset/rank window family.

    One keyed shuffle produces BOTH windows: they share the partition key
    (user_id), so Spark plans a single exchange with two in-partition
    sorts. Every ordering is fully tie-broken by event_id, making
    lag/lead/ntile deterministic across partitionings and engines. No
    unbounded-preceding frames over unsorted data; state per partition
    is one user's events.
    """
    ev = load_table(spark, sf_dir, "events")
    w_time = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_value = Window.partitionBy("user_id").orderBy(
        F.desc("value"), "event_id"
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            "value",
            F.lag("value").over(w_time).alias("prev_value"),
            F.lead("value").over(w_time).alias("next_value"),
            F.row_number().over(w_time).alias("seq"),
            F.ntile(4).over(w_time).alias("quartile"),
            F.dense_rank().over(w_value).alias("value_rank"),
        )
        .orderBy("user_id", "seq")
    )


EVENTS_WINDOW_SQL = """
SELECT event_id, user_id, value,
       LAG(value)  OVER w_time AS prev_value,
       LEAD(value) OVER w_time AS next_value,
       CAST(ROW_NUMBER() OVER w_time AS INT) AS seq,
       CAST(NTILE(4) OVER w_time AS INT) AS quartile,
       CAST(DENSE_RANK() OVER w_value AS INT) AS value_rank
FROM events
WINDOW w_time  AS (PARTITION BY user_id ORDER BY ts, event_id),
       w_value AS (PARTITION BY user_id ORDER BY value DESC, event_id)
ORDER BY user_id, seq
"""


# ---------------------------------------------------------------------------
# Set operations: INTERSECT / EXCEPT
# ---------------------------------------------------------------------------


def events_user_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average purchasers ∩ above-average clickers ∖ error-heavy
    users — INTERSECT / EXCEPT against global-aggregate thresholds.

    Two shapes in one: set operators (Spark plans both as aggregate +
    semi/anti join, so each input collapses to its distinct user set
    map-side before any shuffle), and the q22-style "above the global
    average" predicate — a 1-row corpus aggregate broadcast onto the
    per-user aggregate. The average comparison is cross-multiplied into
    pure int64 (per_user * n_users > corpus_total), so membership is
    scale-invariant AND can't flip on a float tie at any sf.
    """
    ev = load_table(spark, sf_dir, "events")

    def users_above_avg(etype: str, metric) -> DataFrame:
        per_user = (
            ev.where(F.col("event_type") == etype)
            .groupBy("user_id")
            .agg(metric.alias("m"))
        )
        totals = per_user.agg(
            F.sum("m").alias("corpus_total"),
            F.count(F.lit(1)).alias("n_users"),
        )
        return (
            per_user.crossJoin(F.broadcast(totals))
            .where(F.col("m") * F.col("n_users") > F.col("corpus_total"))
            .select("user_id")
        )

    big_spenders = users_above_avg("purchase", F.sum(cents("value")))
    clickers = users_above_avg("click", F.count(F.lit(1)))
    error_heavy = users_above_avg("error", F.count(F.lit(1)))
    # subtract = EXCEPT (set semantics), planned as an aggregate + anti
    # join; exceptAll would plan the union/replicate-rows multiset form,
    # pointlessly heavier when both inputs are already distinct sets
    return (
        big_spenders.intersect(clickers)
        .subtract(error_heavy)
        .orderBy("user_id")
    )


EVENTS_SET_OPS_SQL = """
WITH spend AS (
  SELECT user_id, SUM(CAST(ROUND(value * 100) AS BIGINT)) AS m
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
clicks AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS m
  FROM events WHERE event_type = 'click' GROUP BY user_id
),
errors AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS m
  FROM events WHERE event_type = 'error' GROUP BY user_id
)
SELECT user_id FROM spend
WHERE m * (SELECT COUNT(*) FROM spend) > (SELECT SUM(m) FROM spend)
INTERSECT
SELECT user_id FROM clicks
WHERE m * (SELECT COUNT(*) FROM clicks) > (SELECT SUM(m) FROM clicks)
EXCEPT
SELECT user_id FROM errors
WHERE m * (SELECT COUNT(*) FROM errors) > (SELECT SUM(m) FROM errors)
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Per-user least-squares trend from exact integer moments
# ---------------------------------------------------------------------------


def events_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear trend of spend over time — regression WITHOUT UDFs.

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) over x = seconds since the
    corpus min timestamp, y = value in cents. All five moments are exact
    int64 sums (map-side combinable, one keyed shuffle), so the closing
    double divisions run on bit-identical operands in any engine and any
    partitioning — the float-determinism discipline of functions/money.py
    extended to second-order moments.

    Overflow bound: the denominator is ≤ (n·x_range)²; with the events
    corpus range (~2.6e6 s) that holds to ~1000 events/user. Beyond
    that, rebase x per day-partition (or widen to decimal) upstream.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.agg(F.min(F.col("ts").cast("long")).alias("mn_t"))
    m = (
        ev.select("user_id", F.col("ts").cast("long").alias("ts_s"), "value")
        .crossJoin(F.broadcast(base))
        .select(
            "user_id",
            (F.col("ts_s") - F.col("mn_t")).alias("x"),
            cents("value").alias("y"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.nullif(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0))
    slope = num.cast("double") / den.cast("double")
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return m.select(
        "user_id",
        F.col("n").alias("n_events"),
        slope.alias("slope"),
        intercept.alias("intercept"),
    ).orderBy("user_id")


EVENTS_TREND_SQL = """
WITH b AS (SELECT MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS mn_t FROM events),
m AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(x*y) AS BIGINT) AS sxy
  FROM (SELECT user_id,
               CAST(floor(epoch(ts)) AS BIGINT) - mn_t AS x,
               CAST(ROUND(value * 100) AS BIGINT) AS y
        FROM events, b) t
  GROUP BY user_id
)
SELECT user_id, n AS n_events,
       CAST(n*sxy - sx*sy AS DOUBLE) / CAST(NULLIF(n*sxx - sx*sx, 0) AS DOUBLE)
         AS slope,
       (CAST(sy AS DOUBLE)
        - (CAST(n*sxy - sx*sy AS DOUBLE)
           / CAST(NULLIF(n*sxx - sx*sx, 0) AS DOUBLE)) * CAST(sx AS DOUBLE))
         / CAST(n AS DOUBLE) AS intercept
FROM m ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Q7-style: the same dimension joined in TWO roles
# ---------------------------------------------------------------------------


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume: nation joined TWICE, as the customer's
    nation and the supplier's nation.

    The distinct shape is one dimension in two roles — each role gets
    its own broadcast build with its own filter, so the fact side
    streams once through both. The pair predicate is applied on the
    pre-broadcast dimension rows (2 rows each), not post-join.
    """
    nations = ("NATION_1", "NATION_2")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin(*nations)
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.year("o_orderdate").isin(1996, 1997)
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    rev = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(dollars(F.sum(rev)).alias("revenue"))
        .orderBy("cust_nation", "supp_nation", "o_year")
    )


Q7_SQL = """
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
       SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT))/100.0
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND YEAR(o_orderdate) IN (1996, 1997)
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q15-style: predicate against a scalar-aggregate subquery
# ---------------------------------------------------------------------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) whose quarterly revenue equals the global maximum.

    The scalar subquery `total = (SELECT MAX(total) FROM rev)` becomes a
    1-row aggregate broadcast back onto the per-supplier revenue — the
    fact aggregates ONCE and is reused for both the ranking and the
    threshold (Spark reuses the exchange). Exact cent totals make the
    max comparison tie-stable: every supplier at the max survives.
    """
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01").cast("date"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("total_c"))
    )
    mx = rev.agg(F.max("total_c").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_c == F.col("mx"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", dollars("total_c").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS total_c
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_c / 100.0 AS total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_c = (SELECT MAX(total_c) FROM rev)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# SCD2: slowly-changing-dimension intervals from a changelog
# ---------------------------------------------------------------------------


def scd2_priority_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension build: per-customer priority history as
    [valid_from, valid_to) intervals with an is_current flag.

    Orders are read as a changelog of each customer's "current order
    priority". The standard SCD2 construction: order the changelog per
    key (fully tie-broken by orderkey), keep only CHANGE rows
    (lag-compare drops consecutive duplicates), then close each interval
    with the next change's start (lead). Both windows share the
    (o_custkey) partition key, so the whole build is ONE keyed shuffle —
    the shape that lets a 100 TB dimension rebuild run as a single pass.
    """
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
        .withColumn("prev_prio", F.lag("o_orderpriority").over(w))
        .where(
            F.col("prev_prio").isNull()
            | (F.col("o_orderpriority") != F.col("prev_prio"))
        )
    )
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        changes.select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").alias("valid_from"),
            F.lead("o_orderdate").over(w2).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .orderBy("c_custkey", "valid_from", "priority")
    )


SCD2_SQL = """
WITH ordered AS (
  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
         o_orderpriority,
         LAG(o_orderpriority) OVER (
           PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
         ) AS prev_prio
  FROM orders
),
changes AS (
  SELECT * FROM ordered
  WHERE prev_prio IS NULL OR o_orderpriority <> prev_prio
)
SELECT o_custkey AS c_custkey, o_orderpriority AS priority,
       o_orderdate AS valid_from,
       LEAD(o_orderdate) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS valid_to,
       LEAD(o_orderdate) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) IS NULL AS is_current
FROM changes
ORDER BY c_custkey, valid_from, priority
"""




# ---------------------------------------------------------------------------
# Recursive CTE: iterative hierarchy walk inside the SQL surface
# ---------------------------------------------------------------------------


def parts_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ancestor-chain rollup via WITH RECURSIVE (Spark 4 recursive CTE).

    The part keys form a synthetic 10-ary tree (parent = key div 10,
    rooted at 0): each part walks its ancestor chain accumulating
    exact-cents retail prices, and the terminal rows aggregate to
    (depth, chain length, root-path cost) per part. The recursion is
    monotone (the key strictly shrinks), so it terminates in
    ceil(log10(max key)) iterations — each iteration is one equi-join
    against the part relation, the distributed fixpoint shape that
    replaces driver-side loops for hierarchy/graph walks. DuckDB runs
    the identical recursion (// for div), so the whole iterative result
    is value-hashed.
    """
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_rec")
    return spark.sql("""
WITH RECURSIVE walk AS (
  SELECT p_partkey AS start_key, p_partkey AS cur, CAST(0 AS BIGINT) AS depth,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS path_c
  FROM part_rec
  UNION ALL
  SELECT w.start_key, p.p_partkey, w.depth + 1,
         w.path_c + CAST(ROUND(p.p_retailprice * 100) AS BIGINT)
  FROM walk w JOIN part_rec p ON p.p_partkey = (w.cur div 10)
  WHERE w.cur > 0
)
SELECT start_key AS p_partkey, MAX(depth) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(MAX(path_c) AS DOUBLE) / 100.0 AS root_path_cost
FROM walk GROUP BY start_key ORDER BY p_partkey
""")


PARTS_HIERARCHY_SQL = """
WITH RECURSIVE walk AS (
  SELECT p_partkey AS start_key, p_partkey AS cur, CAST(0 AS BIGINT) AS depth,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS path_c
  FROM part
  UNION ALL
  SELECT w.start_key, p.p_partkey, w.depth + 1,
         w.path_c + CAST(ROUND(p.p_retailprice * 100) AS BIGINT)
  FROM walk w JOIN part p ON p.p_partkey = (w.cur // 10)
  WHERE w.cur > 0
)
SELECT start_key AS p_partkey, MAX(depth) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(MAX(path_c) AS DOUBLE) / 100.0 AS root_path_cost
FROM walk GROUP BY start_key ORDER BY p_partkey
"""




# ---------------------------------------------------------------------------
# Record linkage: blocking + edit-distance matching
# ---------------------------------------------------------------------------


def parts_name_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-match part names: blocking key + Levenshtein threshold.

    The entity-resolution primitive: candidate pairs come ONLY from
    within a blocking key (here the name's first token), so the
    quadratic step is bounded per block exactly like LSH banding bounds
    near-dup mining — never an all-pairs cross join. Survivors score
    with the built-in JVM ``levenshtein`` (same definition in DuckDB, so
    the distances hash-match) and keep dist <= 4. Output is the distinct
    name-pair edge list, deterministic by construction.
    """
    names = (
        load_table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("block", F.split(F.col("p_name"), " ").getItem(0))
    )
    a = names.select(F.col("block"), F.col("p_name").alias("name_a"))
    b = names.select(F.col("block").alias("block_b"), F.col("p_name").alias("name_b"))
    return (
        a.join(b, (F.col("block") == F.col("block_b"))
               & (F.col("name_a") < F.col("name_b")))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("bigint"))
        .where(F.col("dist") <= 4)
        .select("name_a", "name_b", "dist")
        .orderBy("name_a", "name_b")
    )


PARTS_LINKAGE_SQL = """
WITH names AS (
  SELECT DISTINCT p_name, string_split(p_name, ' ')[1] AS block FROM part
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM names a JOIN names b
  ON a.block = b.block AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 4
ORDER BY name_a, name_b
"""




# ---------------------------------------------------------------------------
# RFM segmentation: recency/frequency/monetary quartiles per customer
# ---------------------------------------------------------------------------


def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic RFM marketing segmentation, exactness-hardened.

    One aggregate over orders (last order date, order count, exact-cents
    spend per customer), then three ntile(4) windows — each fully
    tie-broken with c_custkey so quartile boundaries are deterministic
    in both engines (ntile on a non-unique ordering would split ties
    engine-dependently). The segment code concatenates the three scores.
    Scale: one keyed shuffle for the aggregate; the ntile windows are
    global sorts of a |customers|-sized relation — at 100 TB still just
    the customer dimension, and each window is a single range exchange.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        cents("o_totalprice").alias("price_c"),
    )
    rfm = orders.groupBy("o_custkey").agg(
        F.max("d").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("price_c").alias("monetary_c"),
    )
    r_w = Window.orderBy(F.desc("last_order"), "o_custkey")  # recent = 1
    f_w = Window.orderBy(F.desc("frequency"), "o_custkey")   # frequent = 1
    m_w = Window.orderBy(F.desc("monetary_c"), "o_custkey")  # big spender = 1
    return (
        rfm.select(
            F.col("o_custkey").alias("c_custkey"),
            "last_order",
            "frequency",
            dollars("monetary_c").alias("monetary"),
            F.ntile(4).over(r_w).cast("bigint").alias("r_score"),
            F.ntile(4).over(f_w).cast("bigint").alias("f_score"),
            F.ntile(4).over(m_w).cast("bigint").alias("m_score"),
        )
        .withColumn(
            "segment",
            F.concat_ws(
                "", F.col("r_score"), F.col("f_score"), F.col("m_score")
            ),
        )
        .orderBy("c_custkey")
    )


CUSTOMER_RFM_SQL = """
WITH rfm AS (
  SELECT o_custkey AS c_custkey,
         MAX(CAST(o_orderdate AS DATE)) AS last_order,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS monetary_c
  FROM orders GROUP BY o_custkey
)
SELECT c_custkey, last_order, frequency, monetary_c / 100.0 AS monetary,
       CAST(NTILE(4) OVER (ORDER BY last_order DESC, c_custkey) AS BIGINT)
         AS r_score,
       CAST(NTILE(4) OVER (ORDER BY frequency DESC, c_custkey) AS BIGINT)
         AS f_score,
       CAST(NTILE(4) OVER (ORDER BY monetary_c DESC, c_custkey) AS BIGINT)
         AS m_score,
       CAST(NTILE(4) OVER (ORDER BY last_order DESC, c_custkey) AS VARCHAR)
         || CAST(NTILE(4) OVER (ORDER BY frequency DESC, c_custkey) AS VARCHAR)
         || CAST(NTILE(4) OVER (ORDER BY monetary_c DESC, c_custkey) AS VARCHAR)
         AS segment
FROM rfm
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# market-basket co-occurrence: frequent part pairs within orders
# ---------------------------------------------------------------------------
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 co-purchased part pairs (market-basket support counts).

    Shape: DISTINCT (orderkey, partkey) -> equi-self-join on orderkey
    with ``part_a < part_b`` -> support groupBy -> top-k.

    Scale: the self-join key is the order, and basket sizes are bounded
    (TPC-H lineitem has <= 7 lines/order), so the fan-out is at most
    C(7,2) = 21 pairs per order — LINEAR in orders, never quadratic in
    parts. Both join sides are the same pruned 2-column projection
    co-partitioned on orderkey (one exchange each), the support
    aggregation combines map-side, and the final top-20 is
    TakeOrderedAndProject (per-task local k, driver merge), not a
    global sort. At 100 TB: the same plan, with AQE handling any hot
    promotional part via skew-join splitting.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    )
    return (
        pairs.groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(20)
    )


MARKET_BASKET_SQL = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       COUNT(*) AS support
FROM items a
JOIN items b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY support DESC, part_a, part_b
LIMIT 20
"""


def orders_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over the co-occurrence pairs: for the top-20
    supported pairs, directional confidence and lift — the actionable
    market-basket surface (which part PREDICTS which).

      confidence(a->b) = support(a,b) / support(a)
      lift(a->b)       = confidence(a->b) * n_baskets / support(b)

    All counts are exact int64; the three ratios are single divisions
    of exact integers written identically in both engines. Shape: the
    pair topology reuses the bounded basket self-join
    (orders_market_basket); item supports are one map-combinable
    groupBy. The support joins carry NO broadcast hint: the surviving
    pair side is limit-20 (AQE broadcasts IT), while the per-part
    support side grows with the part dimension — a hard
    ``F.broadcast`` there would OOM the driver at 100 TB with no
    fallback.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_baskets = li.select("l_orderkey").distinct().count()  # one scalar
    item = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.count(F.lit(1)).alias("item_support")
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(20)
    )
    sa = item.select(
        F.col("part").alias("part_a"), F.col("item_support").alias("support_a")
    )
    sb = item.select(
        F.col("part").alias("part_b"), F.col("item_support").alias("support_b")
    )
    conf_ab = F.col("support") / F.col("support_a")
    conf_ba = F.col("support") / F.col("support_b")
    return (
        pairs.join(sa, "part_a")
        .join(sb, "part_b")
        .select(
            "part_a",
            "part_b",
            "support",
            "support_a",
            "support_b",
            conf_ab.alias("conf_a_to_b"),
            conf_ba.alias("conf_b_to_a"),
            ((F.col("support") * F.lit(n_baskets)) / (
                F.col("support_a") * F.col("support_b")
            )).alias("lift"),
        )
        .orderBy(F.desc("support"), "part_a", "part_b")
    )


BASKET_RULES_SQL = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM items
), item_support AS (
  SELECT l_partkey AS part, COUNT(*) AS item_support FROM items GROUP BY 1
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         COUNT(*) AS support
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  ORDER BY support DESC, part_a, part_b
  LIMIT 20
)
SELECT part_a, part_b, support,
       sa.item_support AS support_a,
       sb.item_support AS support_b,
       CAST(support AS DOUBLE) / sa.item_support AS conf_a_to_b,
       CAST(support AS DOUBLE) / sb.item_support AS conf_b_to_a,
       CAST(support * n.n_baskets AS DOUBLE)
         / (sa.item_support * sb.item_support) AS lift
FROM pairs
JOIN item_support sa ON sa.part = part_a
JOIN item_support sb ON sb.part = part_b
CROSS JOIN n
ORDER BY support DESC, part_a, part_b
"""


JACCARD_MIN_SUPPORT = 3
JACCARD_TOP_K = 20


def parts_jaccard_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item Jaccard similarity over the co-purchase topology — the
    set-overlap complement to orders_basket_rules' directional
    confidence: jaccard(a, b) = |baskets(a) n baskets(b)| /
    |baskets(a) u baskets(b)| = co / (n_a + n_b - co). The symmetric
    "customers who bought X also bought Y" score item-item
    collaborative filtering starts from.

    Exactness: all three counts are exact int64; the score is ONE
    closing division of exact integers written identically in both
    engines, so the (jaccard DESC, part_a, part_b) ranking cannot
    diverge on ulps.

    Scale: reuses the bounded-basket pair shape (<= C(7,2) pairs per
    order, linear in orders); the min-support filter runs BEFORE the
    join so only qualifying pairs carry through. The per-part support
    side grows with the part dimension (~20B parts at 100 TB TPC-H), so
    it carries NO broadcast hint — AQE broadcasts it at small SF and
    falls back to a co-partitioned hash join on the part key at scale,
    where a hard ``F.broadcast`` would OOM the driver with no fallback.
    Top-k is TakeOrderedAndProject, never a global sort.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    item = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.count(F.lit(1)).alias("n")
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("co"))
        .where(F.col("co") >= JACCARD_MIN_SUPPORT)
    )
    sa = item.select(F.col("part").alias("part_a"), F.col("n").alias("n_a"))
    sb = item.select(F.col("part").alias("part_b"), F.col("n").alias("n_b"))
    jac = F.col("co") / (F.col("n_a") + F.col("n_b") - F.col("co"))
    return (
        pairs.join(sa, "part_a")
        .join(sb, "part_b")
        .select("part_a", "part_b", "co", "n_a", "n_b", jac.alias("jaccard"))
        .orderBy(F.desc("jaccard"), "part_a", "part_b")
        .limit(JACCARD_TOP_K)
    )


PARTS_JACCARD_SQL = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), item_n AS (
  SELECT l_partkey AS part, CAST(COUNT(*) AS BIGINT) AS n
  FROM items GROUP BY 1
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(COUNT(*) AS BIGINT) AS co
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {JACCARD_MIN_SUPPORT}
)
SELECT part_a, part_b, co, sa.n AS n_a, sb.n AS n_b,
       CAST(co AS DOUBLE) / (sa.n + sb.n - co) AS jaccard
FROM pairs
JOIN item_n sa ON sa.part = part_a
JOIN item_n sb ON sb.part = part_b
ORDER BY jaccard DESC, part_a, part_b
LIMIT {JACCARD_TOP_K}
"""


def orders_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue: rank every part
    by lineitem revenue, take the running share of total, and label the
    classic inventory classes — A while the cumulative share is <= 80%,
    B while <= 95%, C after.

    Exactness: revenue is per-row cents (int64) summed exactly; the
    running total and grand total are int64; the CLASS BOUNDARIES are
    integer cross-multiplications (cum*5 <= total*4, cum*20 <= total*19)
    so no float ever decides a label (at extremes where total_c*19 would
    exceed int64 — ~5e17 cents of revenue — widen the two comparisons to
    DECIMAL(38,0); the doubles surfaced for share/cum_share stay ONE
    closing division each). Rank ties are impossible: (revenue desc,
    part) is a total order.

    Scale: the groupBy is map-combinable and its output is |parts| —
    dimension-scale, orders of magnitude below the fact input. The
    ordered running sum is a global window, acceptable at that
    cardinality; the fully distributed form is the textbook two-pass
    prefix sum (range-repartition by the sort key, per-partition
    partials, broadcast the partition offsets) which this plan
    deliberately trades away for the one-exchange window while the
    aggregated surface fits a partition
    (tests/test_properties.py::test_abc_analysis_reference).
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(cents("l_extendedprice")).alias("revenue_c")
    )
    w = Window.orderBy(F.desc("revenue_c"), "part")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum("revenue_c").over(run)
    total = F.sum("revenue_c").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        rev.select(
            "part",
            "revenue_c",
            F.row_number().over(w).alias("rank"),
            cum.alias("cum_revenue_c"),
            total.alias("total_c"),
        )
        .select(
            "part",
            "revenue_c",
            "rank",
            "cum_revenue_c",
            (F.col("revenue_c") / F.col("total_c") * 100).alias("share_pct"),
            (F.col("cum_revenue_c") / F.col("total_c") * 100).alias(
                "cum_share_pct"
            ),
            F.when(
                F.col("cum_revenue_c") * 5 <= F.col("total_c") * 4, "A"
            )
            .when(F.col("cum_revenue_c") * 20 <= F.col("total_c") * 19, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
        .orderBy("rank")
    )


ABC_ANALYSIS_SQL = """
WITH rev AS (
  SELECT l_partkey AS part,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_c
  FROM lineitem GROUP BY 1
), ranked AS (
  SELECT part, revenue_c,
         CAST(ROW_NUMBER() OVER w AS INT) AS rank,
         CAST(SUM(revenue_c) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT)
           AS cum_revenue_c,
         CAST(SUM(revenue_c) OVER () AS BIGINT) AS total_c
  FROM rev
  WINDOW w AS (ORDER BY revenue_c DESC, part)
)
SELECT part, revenue_c, rank, cum_revenue_c,
       CAST(revenue_c AS DOUBLE) / total_c * 100 AS share_pct,
       CAST(cum_revenue_c AS DOUBLE) / total_c * 100 AS cum_share_pct,
       CASE WHEN cum_revenue_c * 5 <= total_c * 4 THEN 'A'
            WHEN cum_revenue_c * 20 <= total_c * 19 THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked
ORDER BY rank
"""


def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: customers grouped by the month
    of their FIRST order (the acquisition cohort), revenue rolled up by
    cohort x months-since-acquisition — the retention/LTV surface every
    subscription and commerce dashboard draws, and the orders-table
    sibling of events_retention's event cohorts.

    Exactness: the cohort key is min(o_orderdate) per customer via a
    window (one shuffle on custkey, NO join against a firsts table);
    age is pure integer month arithmetic (y*12+m deltas, no
    months_between float); revenue is int64 cents with one closing
    division. Cumulative LTV per cohort is a second window over the
    dimension-sized rollup, running-summed in exact cents
    (tests/test_properties.py::test_cohort_ltv_reference).

    Scale: fact scan -> per-customer window (map-side combinable? no —
    but the window is the intrinsic first-touch requirement, same
    exchange the groupBy would pay) -> (cohort, age) rollup whose
    output is |months|^2 / 2 cells — tiny; the cumulative window runs
    per cohort partition on that rollup.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        cents("o_totalprice").alias("rev_c"),
    )
    w = Window.partitionBy("o_custkey")
    mkey = F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
    first_m = F.min(mkey).over(w)
    cells = (
        orders.select(
            "o_custkey",
            "rev_c",
            first_m.alias("cohort_m"),
            (mkey - first_m).alias("age_months"),
        )
        .groupBy("cohort_m", "age_months")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("rev_c").alias("rev_c"),
        )
    )
    cum = F.sum("rev_c").over(
        Window.partitionBy("cohort_m")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cells.select(
            F.concat_ws(
                "-",
                # explicit FLOOR division: DuckDB's int/int is float
                # division and CAST rounds (1995.5 -> 1996) where
                # Spark's cast truncates — found by the sf0.001 diff
                F.format_string(
                    "%04d", F.floor(F.col("cohort_m") / 12).cast("int")
                ),
                F.format_string(
                    "%02d", (F.col("cohort_m") % 12 + 1).cast("int")
                ),
            ).alias("cohort_month"),
            "age_months",
            "n_customers",
            "n_orders",
            (F.col("rev_c") / 100.0).alias("revenue"),
            (cum / 100.0).alias("cum_revenue"),
        )
        .orderBy("cohort_month", "age_months")
    )


COHORT_LTV_SQL = """
WITH keyed AS (
  SELECT o_custkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS rev_c,
         year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mkey,
         MIN(year(o_orderdate) * 12 + month(o_orderdate) - 1)
           OVER (PARTITION BY o_custkey) AS cohort_m
  FROM orders
), cells AS (
  SELECT cohort_m, mkey - cohort_m AS age_months,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(rev_c) AS BIGINT) AS rev_c
  FROM keyed GROUP BY 1, 2
)
SELECT printf('%04d-%02d', CAST(cohort_m // 12 AS INT),
              CAST(cohort_m % 12 + 1 AS INT)) AS cohort_month,
       CAST(age_months AS BIGINT) AS age_months,
       n_customers, n_orders,
       rev_c / 100.0 AS revenue,
       CAST(SUM(rev_c) OVER (PARTITION BY cohort_m ORDER BY age_months
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) / 100.0 AS cum_revenue
FROM cells
ORDER BY cohort_month, age_months
"""


def orders_open_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open-order backlog: for every date, how many orders are
    open (placed but not yet fully shipped) and how many line items
    they carry — the operations time series behind every fulfillment
    dashboard.

    An order is open on day d iff o_orderdate <= d < close_date, where
    close_date is the order's LAST l_shipdate (the driver's lineitem
    slice carries ship dates only). Computing that by
    joining every order to every day it spans would fan out |orders| x
    |span| rows; instead each interval becomes TWO difference-array
    events (+1 at open, -1 at close) and the running sum over the date
    spine reconstructs the count — the standard interval-stabbing
    rewrite that keeps the shuffle linear in ORDERS, not order-days.

    Exactness: everything is int64 counts summed over exact date keys.
    The running-sum window is global-ordered but DOMAIN-bounded: its
    input is one row per DATE (~2.4k over TPC-H's range, bounded by the
    calendar, never by data volume) — the same dimension-scale class as
    the gapfill spine.

    Surface: one row per date with a nonzero-backlog day on either
    side: date, n_open (orders), open_lines (their line items).
    """
    li = load_table(spark, sf_dir, "lineitem").groupBy(
        F.col("l_orderkey").alias("okey")
    ).agg(
        F.max("l_shipdate").cast("date").alias("close_date"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderdate").cast("date").alias("open_date"),
    )
    iv = orders.join(li, "okey")
    deltas = iv.select(
        F.col("open_date").alias("date"),
        F.lit(1).cast("bigint").alias("d_open"),
        F.col("n_lines").cast("bigint").alias("d_lines"),
    ).unionByName(
        iv.select(
            F.col("close_date").alias("date"),
            F.lit(-1).cast("bigint").alias("d_open"),
            (-F.col("n_lines")).cast("bigint").alias("d_lines"),
        )
    )
    daily = deltas.groupBy("date").agg(
        F.sum("d_open").alias("dd_open"), F.sum("d_lines").alias("dd_lines")
    )
    run = Window.orderBy("date").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.select(
            "date",
            F.sum("dd_open").over(run).alias("n_open"),
            F.sum("dd_lines").over(run).alias("open_lines"),
        )
        .orderBy("date")
    )


OPEN_BACKLOG_SQL = """
WITH close AS (
  SELECT l_orderkey AS okey,
         CAST(MAX(l_shipdate) AS DATE) AS close_date,
         CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY 1
), iv AS (
  SELECT CAST(o.o_orderdate AS DATE) AS open_date, c.close_date, c.n_lines
  FROM orders o JOIN close c ON c.okey = o.o_orderkey
), deltas AS (
  SELECT open_date AS date, CAST(1 AS BIGINT) AS d_open, n_lines AS d_lines
  FROM iv
  UNION ALL
  SELECT close_date AS date, CAST(-1 AS BIGINT), -n_lines FROM iv
), daily AS (
  SELECT date, CAST(SUM(d_open) AS BIGINT) AS dd_open,
         CAST(SUM(d_lines) AS BIGINT) AS dd_lines
  FROM deltas GROUP BY 1
)
SELECT date,
       CAST(SUM(dd_open) OVER run AS BIGINT) AS n_open,
       CAST(SUM(dd_lines) OVER run AS BIGINT) AS open_lines
FROM daily
WINDOW run AS (ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
ORDER BY date
"""


def customer_purchase_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer purchase cadence: order count, first/last order,
    and the average / median / max gap in days between CONSECUTIVE
    orders — the repeat-purchase rhythm behind churn and replenishment
    models (customers with one order have no gaps: NULL stats in both
    engines).

    Exactness: gaps are integer day differences over the sorted unique
    order dates; the average is ONE closing division of two exact ints
    (the gap sum telescopes to last - first); the median is the exact
    discrete order statistic — the value at rank ceil(g/2) of the
    sorted gaps, computed per-row from the sorted gap array, no
    interpolation. Same-day repeat orders produce legitimate 0-day
    gaps.

    Scale: one groupBy(custkey) gathering each customer's order DATES
    (state bounded by orders-per-customer, the operator's intrinsic
    requirement — tens, not millions); all gap math is per-row array
    expressions, no second shuffle before the presentation sort.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    per_c = o.groupBy("custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.array_sort(F.collect_list("d")).alias("dates"),
    )
    n = F.size("dates")
    gaps = F.expr(
        "zip_with(slice(dates, 1, size(dates) - 1), "
        "slice(dates, 2, size(dates) - 1), (a, b) -> datediff(b, a))"
    )
    staged = per_c.select(
        "custkey",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.element_at("dates", 1).alias("first_order"),
        F.element_at("dates", n).alias("last_order"),
        F.array_sort(gaps).alias("sgaps"),
    )
    g = F.size("sgaps")
    return staged.select(
        "custkey",
        "n_orders",
        "first_order",
        "last_order",
        F.when(
            g > 0,
            F.datediff("last_order", "first_order") / g,
        ).alias("avg_gap_days"),
        F.when(
            g > 0,
            F.element_at("sgaps", F.ceil(g / F.lit(2)).cast("int")),
        ).cast("bigint").alias("median_gap_days"),
        F.when(g > 0, F.element_at("sgaps", g))
        .cast("bigint")
        .alias("max_gap_days"),
    ).orderBy("custkey")


PURCHASE_CADENCE_SQL = """
WITH per_c AS (
  SELECT o_custkey AS custkey,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         list_sort(list(CAST(o_orderdate AS DATE))) AS dates
  FROM orders GROUP BY 1
), staged AS (
  SELECT custkey, n_orders,
         dates[1] AS first_order,
         dates[len(dates)] AS last_order,
         list_sort([dates[i + 1] - dates[i]
                    for i in range(1, len(dates))]) AS sgaps
  FROM per_c
)
SELECT custkey, n_orders, first_order, last_order,
       CASE WHEN len(sgaps) > 0
            THEN CAST(last_order - first_order AS DOUBLE) / len(sgaps) END
         AS avg_gap_days,
       CASE WHEN len(sgaps) > 0
            THEN CAST(sgaps[CAST(ceil(len(sgaps) / 2.0) AS INT)] AS BIGINT)
       END AS median_gap_days,
       CASE WHEN len(sgaps) > 0
            THEN CAST(sgaps[len(sgaps)] AS BIGINT) END AS max_gap_days
FROM staged
ORDER BY custkey
"""


def orders_ship_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-first-ship SLA distribution per order priority: exact
    p50/p90/p99 of the day lag between o_orderdate and the order's
    FIRST l_shipdate, plus min/max/mean — the fulfillment-latency SLO
    table, with percentiles computed EXACTLY and WITHOUT ever sorting
    the fact table.

    The at-scale trick: the lag domain is bounded (an integer number
    of days, ~150 distinct values in TPC-H), so the pipeline collapses
    to a (priority, lag_days) HISTOGRAM via one map-combinable
    groupBy, and the exact discrete percentile is the smallest lag
    whose cumulative count clears the rank — computed on the
    dimension-bounded histogram with integer cross-multiplication
    (2*cum >= n for p50, 10*cum >= 9*n for p90, 100*cum >= 99*n for
    p99; no decimal-literal rank arithmetic, no interpolation). This
    is the bounded-domain sibling of events_conversion_lag's bucketed
    selection: when the value domain is small-integer, the histogram
    IS the order statistic.

    Exactness: day lags are exact date arithmetic; counts/cums int64;
    the mean is ONE closing division of two exact ints.

    Scale: the orders-lineitem join is co-partitioned on orderkey (no
    hint — AQE decides); everything after the histogram groupBy runs
    on <= |priorities| x |lag domain| rows.
    """
    first_ship = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("okey"))
        .agg(F.min("l_shipdate").alias("first_ship"))
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderpriority").alias("priority"),
        "o_orderdate",
    )
    lag = o.join(first_ship, "okey").select(
        "priority",
        F.datediff(F.to_date("first_ship"), F.to_date("o_orderdate")).alias(
            "lag_days"
        ),
    )
    hist = lag.groupBy("priority", "lag_days").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wcum = (
        Window.partitionBy("priority")
        .orderBy("lag_days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("priority")
    cum = hist.select(
        "priority",
        "lag_days",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wtot).alias("n"),
        F.sum(F.col("lag_days") * F.col("cnt")).over(wtot).alias("lag_sum"),
    )
    return (
        cum.groupBy("priority")
        .agg(
            F.max("n").cast("bigint").alias("n_orders"),
            F.min("lag_days").cast("int").alias("min_lag"),
            F.max("lag_days").cast("int").alias("max_lag"),
            F.min(F.when(2 * F.col("cum") >= F.col("n"), F.col("lag_days")))
            .cast("int")
            .alias("p50"),
            F.min(
                F.when(10 * F.col("cum") >= 9 * F.col("n"), F.col("lag_days"))
            )
            .cast("int")
            .alias("p90"),
            F.min(
                F.when(
                    100 * F.col("cum") >= 99 * F.col("n"), F.col("lag_days")
                )
            )
            .cast("int")
            .alias("p99"),
            (F.max("lag_sum").cast("double") / F.max("n")).alias("mean_lag"),
        )
        .orderBy("priority")
    )


SHIP_SLA_SQL = """
WITH first_ship AS (
  SELECT l_orderkey AS okey, MIN(l_shipdate) AS first_ship
  FROM lineitem GROUP BY 1
), lag AS (
  SELECT o.o_orderpriority AS priority,
         datediff('day', CAST(o.o_orderdate AS DATE),
                  CAST(f.first_ship AS DATE)) AS lag_days
  FROM orders o JOIN first_ship f ON f.okey = o.o_orderkey
), hist AS (
  SELECT priority, lag_days, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lag GROUP BY 1, 2
), cum AS (
  SELECT priority, lag_days, cnt,
         CAST(SUM(cnt) OVER wcum AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER wtot AS BIGINT) AS n,
         CAST(SUM(lag_days * cnt) OVER wtot AS BIGINT) AS lag_sum
  FROM hist
  WINDOW wcum AS (PARTITION BY priority ORDER BY lag_days
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wtot AS (PARTITION BY priority)
)
SELECT priority,
       CAST(MAX(n) AS BIGINT) AS n_orders,
       CAST(MIN(lag_days) AS INTEGER) AS min_lag,
       CAST(MAX(lag_days) AS INTEGER) AS max_lag,
       CAST(MIN(CASE WHEN 2 * cum >= n THEN lag_days END) AS INTEGER)
         AS p50,
       CAST(MIN(CASE WHEN 10 * cum >= 9 * n THEN lag_days END) AS INTEGER)
         AS p90,
       CAST(MIN(CASE WHEN 100 * cum >= 99 * n THEN lag_days END) AS INTEGER)
         AS p99,
       CAST(MAX(lag_sum) AS DOUBLE) / MAX(n) AS mean_lag
FROM cum
GROUP BY priority
ORDER BY priority
"""


def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-TABLE data-quality battery: referential-integrity and key
    checks across the fact/dimension graph — the warehouse-level
    counterpart of the reference's single-table dq_checks
    (/root/reference/dags/dag.py's six checks run inside one table;
    real pipelines also audit the EDGES between tables):

      lineitem_orphan_orderkey   line items whose order is missing
      orders_without_lineitems   orders with no line items (present in
                                 the driver testdata: a real finding)
      orders_orphan_custkey      orders pointing at missing customers
      customers_without_orders   dormant dimension rows (informational)
      lineitem_orphan_partkey    line items pointing at missing parts
      lineitem_duplicate_linekey (l_orderkey, l_linenumber) collisions

    Exactness: every check is an exact int64 count from an anti-join or
    a groupBy-HAVING; PASS/FAIL is n_bad = 0 (customers_without_orders
    reports but never fails — dormant customers are legal).

    Scale: each orphan check is a co-partitioned ANTI join on the key
    it audits (no hints — dimension sides broadcast under AQE when
    small); the duplicate check is one map-combinable groupBy. Six
    independent scans by design — a DQ battery is an off-peak audit,
    and fusing them would couple every check's partitioning to one
    plan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")

    def _count(df: DataFrame, name: str, informational: bool = False):
        return df.agg(F.count(F.lit(1)).cast("bigint").alias("n_bad")).select(
            F.lit(name).alias("check_name"),
            "n_bad",
            F.when(F.lit(informational), F.lit("INFO"))
            .when(F.col("n_bad") == 0, F.lit("PASS"))
            .otherwise(F.lit("FAIL"))
            .alias("status"),
        )

    checks = [
        _count(
            li.join(o, li.l_orderkey == o.o_orderkey, "left_anti"),
            "lineitem_orphan_orderkey",
        ),
        _count(
            o.join(li, o.o_orderkey == li.l_orderkey, "left_anti"),
            "orders_without_lineitems",
        ),
        _count(
            o.join(cust, o.o_custkey == cust.c_custkey, "left_anti"),
            "orders_orphan_custkey",
        ),
        _count(
            cust.join(o, cust.c_custkey == o.o_custkey, "left_anti"),
            "customers_without_orders",
            informational=True,
        ),
        _count(
            li.join(part, li.l_partkey == part.p_partkey, "left_anti"),
            "lineitem_orphan_partkey",
        ),
        _count(
            li.groupBy("l_orderkey", "l_linenumber")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") > 1),
            "lineitem_duplicate_linekey",
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("check_name")


DQ_REFERENTIAL_SQL = """
WITH checks AS (
  SELECT 'lineitem_orphan_orderkey' AS check_name,
         CAST((SELECT COUNT(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_orderkey = l.l_orderkey))
              AS BIGINT) AS n_bad,
         FALSE AS informational
  UNION ALL
  SELECT 'orders_without_lineitems',
         CAST((SELECT COUNT(*) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                 WHERE l.l_orderkey = o.o_orderkey))
              AS BIGINT),
         FALSE
  UNION ALL
  SELECT 'orders_orphan_custkey',
         CAST((SELECT COUNT(*) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey))
              AS BIGINT),
         FALSE
  UNION ALL
  SELECT 'customers_without_orders',
         CAST((SELECT COUNT(*) FROM customer c
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_custkey = c.c_custkey))
              AS BIGINT),
         TRUE
  UNION ALL
  SELECT 'lineitem_orphan_partkey',
         CAST((SELECT COUNT(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM part p
                                 WHERE p.p_partkey = l.l_partkey))
              AS BIGINT),
         FALSE
  UNION ALL
  SELECT 'lineitem_duplicate_linekey',
         CAST((SELECT COUNT(*) FROM (
                 SELECT l_orderkey, l_linenumber
                 FROM lineitem GROUP BY 1, 2 HAVING COUNT(*) > 1))
              AS BIGINT),
         FALSE
)
SELECT check_name, n_bad,
       CASE WHEN informational THEN 'INFO'
            WHEN n_bad = 0 THEN 'PASS'
            ELSE 'FAIL' END AS status
FROM checks
ORDER BY check_name
"""


# ---------------------------------------------------------------------------
# Skyline / Pareto frontier — dominance queries (operators/skyline.py)
# ---------------------------------------------------------------------------


def parts_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pareto frontier of parts under (MIN retailprice, MAX
    size): every part no other same-brand part beats on both price and
    size with one strict improvement — the preference-query operator
    class (Börzsönyi et al., ICDE 2001) as a first-class relational op.

    Differential-test value: the oracle twin runs the textbook
    QUADRATIC ``NOT EXISTS`` dominance self-join; this plan is a
    different algorithm entirely (collapse to per-price maxima, one
    running-max window over strictly-cheaper rows — operators/
    skyline.py) that must reproduce the identical set.

    Exactness: dominance compares exact integer cents and int sizes —
    nothing floats, so AQE/partial-agg ordering can never flip a hash.

    Scale: one map-combinable groupBy collapses any part volume to
    |brand x distinct price| rows; the window runs on that collapsed
    table and the join back is a plain equi-join — the O(n^2) oracle
    shape never executes on Spark.
    """
    from ..operators.skyline import skyline_min_price_max_size

    part = load_table(spark, sf_dir, "part")
    sky = skyline_min_price_max_size(
        part, "p_brand", "p_retailprice", "p_size"
    )
    return sky.select(
        "p_brand", "p_partkey", "p_name", "p_size", "price_cents"
    ).orderBy("p_brand", "price_cents", "p_partkey")


PARTS_SKYLINE_SQL = """
WITH base AS (
  SELECT p_brand, p_partkey, p_name, p_size,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents
  FROM part
  WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
)
SELECT p.p_brand, p.p_partkey, p.p_name, p.p_size, p.price_cents
FROM base p
WHERE NOT EXISTS (
  SELECT 1 FROM base q
  WHERE q.p_brand = p.p_brand
    AND q.price_cents <= p.price_cents
    AND q.p_size >= p.p_size
    AND (q.price_cents < p.price_cents OR q.p_size > p.p_size)
)
ORDER BY p_brand, price_cents, p_partkey
"""


# ---------------------------------------------------------------------------
# Benford first-digit conformance — the forensic DQ screen
# ---------------------------------------------------------------------------


def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of ``l_extendedprice``
    against Benford's law (P(d) = log10(1 + 1/d)) with the per-digit
    Pearson chi-square contribution — the forensic data-quality screen
    for fabricated or truncated monetary columns, extending the DQ
    tier (dq_checks, dq_referential_integrity) with a DISTRIBUTIONAL
    check rather than a row-predicate one.

    Exactness: the digit comes from integer cents rendered as a string
    (both engines print positive bigints identically) — never
    ``floor(log10(x))``, whose last-ulp wobble flips 1000.0 to digit 9.
    Counts are exact int64; the only floats are the closing
    frequencies and chi-square terms, computed with identical operator
    order from exact ints (log10 verified bit-equal cross-engine).

    Scale: one map-combinable groupBy collapses any volume to <= 9
    rows; the total is a window over those 9 rows. Nothing else
    touches the fact table.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_extendedprice").isNotNull()
        & (F.col("l_extendedprice") > 0)
    )
    digit = F.substring(
        cents("l_extendedprice").cast("string"), 1, 1
    ).cast("int")
    prof = li.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    total = F.sum("n_obs").over(Window.partitionBy())
    obs = F.col("n_obs").cast("double") / total.cast("double")
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    chi = (
        total.cast("double")
        * (obs - exp)
        * (obs - exp)
        / exp
    )
    return (
        prof.select(
            "digit",
            "n_obs",
            obs.alias("obs_freq"),
            exp.alias("exp_freq"),
            chi.alias("chi2_term"),
        )
        .orderBy("digit")
    )


DQ_BENFORD_SQL = """
WITH prof AS (
  SELECT CAST(substr(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0
  GROUP BY 1
), t AS (
  SELECT digit, n_obs, SUM(n_obs) OVER () AS total FROM prof
)
SELECT digit, n_obs,
       CAST(n_obs AS DOUBLE) / CAST(total AS DOUBLE) AS obs_freq,
       log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS exp_freq,
       CAST(total AS DOUBLE)
         * (CAST(n_obs AS DOUBLE) / CAST(total AS DOUBLE)
            - log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
         * (CAST(n_obs AS DOUBLE) / CAST(total AS DOUBLE)
            - log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
         / log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS chi2_term
FROM t
ORDER BY digit
"""


# ---------------------------------------------------------------------------
# single-pass relational profiler — every column's stats in ONE scan
# ---------------------------------------------------------------------------

# (column, class): class picks the exact-integer normalization for
# min/max — money doubles go through cents, timestamps through epoch
# micros, so no float or string-rendering divergence can reach the hash
_PROFILE_COLS: list[tuple[str, str]] = [
    ("l_orderkey", "int"),
    ("l_partkey", "int"),
    ("l_suppkey", "int"),
    ("l_linenumber", "int"),
    ("l_quantity", "money"),
    ("l_extendedprice", "money"),
    ("l_discount", "money"),
    ("l_tax", "money"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
]


def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(col_name, n_total, n_null, n_distinct, min_int, max_int,
    min_str, max_str): the whole-table column profile — the first thing
    a data platform computes on any new table — for all 11 lineitem
    columns in ONE scan.

    The point is the plan shape: a naive profiler runs C scans (one per
    column); this one computes every column's null count, exact
    distinct count, and normalized min/max inside a single aggregate,
    then unpivots the 1-row result with ``stack`` — the fact table is
    touched once. Numeric min/max are normalized to exact int64 (raw
    ints, cents for money, epoch-micros for timestamps); string min/max
    stay strings (binary collation in both engines); each class leaves
    the other columns NULL, so the output schema is fixed and typed.

    Exactness: counts are exact int64 (n_null = n_total - count(col),
    both engines ignore NULLs in count(col) and count(distinct));
    nothing floats anywhere.

    Scale — the r13 re-plan: the obvious single aggregate with 11
    COUNT(DISTINCT)s planned as a SortAggregate of `first()` buffers
    over a 12x Expand of ALL ELEVEN WIDE COLUMNS (Catalyst's
    multi-distinct rewrite) — sorting 12x the table's full width,
    24.3s at sf0.1. Instead the one scan explodes each row into 11
    SKINNY (col, int-surface, str-surface) cells and stage one is a
    pure-COUNT hash aggregate on (col, vi, vs) — map-combinable,
    whole-stage-codegen, no sort, no wide Expand (2.5s at sf0.1);
    stage two folds the ~Σ per-column-cardinality survivors into the
    profile (its string min/max makes that one a SortAggregate, but
    over the collapsed key set, not the table). n_distinct therefore
    counts the NORMALIZED surface — identical to raw for ints,
    strings, and timestamps (injective maps), and cent-precision for
    money columns (the profile's stated unit; the oracle twin uses the
    same expression). At 100 TB swap exact distincts for the HLL
    registers this repo already ships (events_hll_distinct) and stage
    one becomes a fixed-width register table; the exact version IS
    the oracle-checkable one.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cells = []
    for c, kind in _PROFILE_COLS:
        if kind == "int":
            vi = F.col(c).cast("bigint")
        elif kind == "money":
            vi = cents(c)
        elif kind == "ts":
            vi = F.unix_micros(F.col(c).cast("timestamp"))
        else:  # str: min/max land in the string slots instead
            vi = F.lit(None).cast("bigint")
        vs = F.col(c) if kind == "str" else F.lit(None).cast("string")
        cells.append(
            F.struct(
                F.lit(c).alias("col_name"),
                vi.alias("vi"),
                vs.alias("vs"),
            )
        )
    pairs = li.select(F.explode(F.array(*cells)).alias("p")).select(
        "p.col_name", "p.vi", "p.vs"
    )
    # stage 1: pure-count hash aggregate; the NULL-value group (both
    # surfaces NULL) carries the column's null count
    per_key = pairs.groupBy("col_name", "vi", "vs").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    is_null = F.col("vi").isNull() & F.col("vs").isNull()
    return (
        per_key.groupBy("col_name")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_total"),
            F.sum(F.when(is_null, F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_null"),
            F.sum(F.when(is_null, 0).otherwise(1))
            .cast("bigint")
            .alias("n_distinct"),
            F.min("vi").alias("min_int"),
            F.max("vi").alias("max_int"),
            F.min("vs").alias("min_str"),
            F.max("vs").alias("max_str"),
        )
        .orderBy("col_name")
    )


def _dq_profile_sql() -> str:
    aggs = ["CAST(COUNT(*) AS BIGINT) AS n_total"]
    for c, kind in _PROFILE_COLS:
        aggs.append(f"CAST(COUNT({c}) AS BIGINT) AS nn_{c}")
        # distinct over the NORMALIZED surface, same as the Spark plan
        # (identical to raw for int/str/ts — injective; cent-precision
        # for money, the profile's stated unit)
        if kind == "money":
            nd = f"CAST(ROUND({c} * 100) AS BIGINT)"
        elif kind == "ts":
            nd = f"epoch_us({c})"
        else:
            nd = c
        aggs.append(f"CAST(COUNT(DISTINCT {nd}) AS BIGINT) AS nd_{c}")
        if kind == "int":
            lo, hi = f"MIN({c})", f"MAX({c})"
        elif kind == "money":
            lo = f"MIN(CAST(ROUND({c} * 100) AS BIGINT))"
            hi = f"MAX(CAST(ROUND({c} * 100) AS BIGINT))"
        elif kind == "ts":
            lo, hi = f"MIN(epoch_us({c}))", f"MAX(epoch_us({c}))"
        else:
            lo, hi = f"MIN({c})", f"MAX({c})"
        aggs.append(f"{lo} AS lo_{c}")
        aggs.append(f"{hi} AS hi_{c}")
    rows = []
    for c, kind in _PROFILE_COLS:
        if kind == "str":
            mini, maxi = "CAST(NULL AS BIGINT)", "CAST(NULL AS BIGINT)"
            mins, maxs = f"lo_{c}", f"hi_{c}"
        else:
            mini, maxi = f"CAST(lo_{c} AS BIGINT)", f"CAST(hi_{c} AS BIGINT)"
            mins, maxs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        rows.append(
            f"SELECT '{c}' AS col_name, n_total, n_total - nn_{c} AS n_null, "
            f"nd_{c} AS n_distinct, {mini} AS min_int, {maxi} AS max_int, "
            f"{mins} AS min_str, {maxs} AS max_str FROM one"
        )
    return (
        "WITH one AS (SELECT "
        + ", ".join(aggs)
        + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(rows)
        + "\nORDER BY col_name"
    )


DQ_PROFILE_SQL = _dq_profile_sql()


# ---------------------------------------------------------------------------
# incremental view maintenance: delta algebra over a join-aggregate view
# ---------------------------------------------------------------------------

# Both relations receive independent late-arriving deltas: orders split
# by o_orderdate, lineitem by l_shipdate. Dates are chosen so all three
# delta join terms are non-empty at every SF (pinned by pytest) — the
# proof is vacuous if a term never fires.
_IVM_O_CUT = "2000-01-01"
_IVM_L_CUT = "2000-06-01"


def orders_ivm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_custkey, line_cnt, revenue_cents): revenue-per-customer over
    orders JOIN lineitem, maintained INCREMENTALLY and proven equal to
    the full recompute (the oracle IS the recompute, so the driver's
    hash gate is the proof).

    The view-maintenance identity every materialized-view engine runs:
    with O = O_base ⊎ ΔO (split on o_orderdate) and L = L_base ⊎ ΔL
    (split on l_shipdate — late-shipping lines of old orders),

      V(O ⋈ L) = V_base  ⊕  V(ΔO ⋈ L_base)  ⊕  V(O_base ⋈ ΔL)
                         ⊕  V(ΔO ⋈ ΔL)

    because the aggregates (COUNT, SUM of exact integer cents) are
    commutative monoids — ⊕ is a re-aggregation of partial rows, and
    the four terms partition the joined row set exactly (each joined
    row lands in exactly one term by its (o-side, l-side) membership).

    Scale: this is THE pattern that avoids rescanning a 100 TB fact
    table to refresh a view. The base view is an already-materialized
    aggregate (|custkeys| rows); each delta term joins the ingest
    against the other side, so the only big-side work is one pruned
    probe of base lineitem by ΔO's orderkeys (runtime-filterable:
    lineitem_bloom_semi_join is the same probe) — never base ⋈ base
    again. Integer-cents partials make ⊕ safe under any partial-
    aggregation order (functions/money.py).

    Join strategy (r13 advice): the demo's date cuts make the deltas
    scale-PROPORTIONAL slices (~20% of lineitem), not the day's-ingest
    sliver the production claim describes — a hard F.broadcast on them
    would ship ~12M rows through the driver at the 100x deep point and
    OOM beyond. So no hints: AQE picks broadcast exactly when a delta
    is actually small (the production shape) and falls back to a
    shuffle join when it isn't (this demo at 100x) — the same fix r11
    applied to parts_jaccard_similarity's support joins.
    """
    o_cut = F.lit(_IVM_O_CUT).cast("date")
    l_cut = F.lit(_IVM_L_CUT).cast("date")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("o_d"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev_c"
        ),
        F.col("l_shipdate").cast("date").alias("l_d"),
    )
    o_base = orders.where(F.col("o_d") < o_cut)
    o_delta = orders.where(F.col("o_d") >= o_cut)
    l_base = li.where(F.col("l_d") < l_cut)
    l_delta = li.where(F.col("l_d") >= l_cut)

    def part(o: DataFrame, li_side: DataFrame) -> DataFrame:
        # one partial-view term: aggregate to (custkey, cnt, cents)
        return (
            o.join(li_side, o.o_orderkey == li_side.l_orderkey)
            .groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("line_cnt"),
                F.sum("rev_c").alias("revenue_cents"),
            )
        )

    base_view = part(o_base, l_base)  # materialized before the deltas land
    delta_terms = (
        part(o_delta, l_base)
        .unionByName(part(o_base, l_delta))
        .unionByName(part(o_delta, l_delta))
    )
    return (
        base_view.unionByName(delta_terms)
        .groupBy("o_custkey")
        .agg(
            F.sum("line_cnt").cast("bigint").alias("line_cnt"),
            F.sum("revenue_cents").cast("bigint").alias("revenue_cents"),
        )
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# pairwise mutual information between categorical columns (DQ profiling)
# ---------------------------------------------------------------------------

# (pair label, x expression, y expression) — SQL spelled once, reused
# verbatim in both engines so the derived categories match bit-for-bit
# expressions are cast to string by each engine's own wrapper (STRING
# vs VARCHAR); FLOOR keeps the bucket integer-valued in both, so the
# string categories match byte-for-byte
_MI_PAIRS: list[tuple[str, str, str]] = [
    ("returnflag_linestatus", "l_returnflag", "l_linestatus"),
    (
        "returnflag_shipyear",
        "l_returnflag",
        "EXTRACT(YEAR FROM CAST(l_shipdate AS DATE))",
    ),
    (
        "qtybucket_linestatus",
        "CAST(FLOOR(l_quantity / 10) AS BIGINT)",
        "l_linestatus",
    ),
]


def dq_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pair, n, h_x, h_y, h_xy, mi): Shannon entropies (nats) and the
    mutual information I(X;Y) = H(X)+H(Y)-H(XY) for three column pairs
    of lineitem — the dependence screen univariate profiling
    (dq_profile) cannot see. MI ~ 0 means the columns are independent;
    MI ~ min(H) means one determines the other (returnflag/linestatus
    is TPC-H's canonical dependent pair — both are driven by shipdate).

    Entropy is computed from exact int64 joint counts as
    H = ln(n) - (Σ c·ln c)/n. MI subtracts entropies that nearly
    cancel (near-independent pairs sit at ~1e-7 nats), so an
    order-dependent Σ would amplify last-ulp noise past the gate's
    9-significant-digit canon — instead Σ c·ln c is a PINNED
    sequential fold over the sorted count list (the char_entropy
    discipline: identical op order in both engines makes every double
    bit-equal, cancellation included).

    Scale: one scan fans out 3x map-side (the stack), collapses to
    |pair| x |X| x |Y| joint rows (dozens) via map-combinable groupBy;
    every later stage runs on that dimension-bounded table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    stack_args = ", ".join(
        f"'{name}', CAST(({x}) AS STRING), CAST(({y}) AS STRING)"
        for name, x, y in _MI_PAIRS
    )
    pairs = li.selectExpr(
        f"stack({len(_MI_PAIRS)}, {stack_args}) AS (pair, x, y)"
    )
    joint = pairs.groupBy("pair", "x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )

    def _ent(df: DataFrame, out: str) -> DataFrame:
        # H = ln(n) - (fold of c*ln c over SORTED counts)/n: the fold
        # order is pinned so both engines produce bit-equal doubles
        agg = df.groupBy("pair").agg(
            F.sum("c").cast("bigint").alias("n"),
            F.sort_array(
                F.collect_list(F.col("c").cast("double"))
            ).alias("cs"),
        )
        clogc = F.aggregate(
            "cs", F.lit(0.0), lambda acc, x: acc + x * F.log(x)
        )
        return agg.select(
            "pair",
            F.col("n").alias(f"{out}_n"),
            (F.log("n") - clogc / F.col("n")).alias(out),
        )

    hx = _ent(
        joint.groupBy("pair", "x").agg(F.sum("c").alias("c")), "h_x"
    )
    hy = _ent(
        joint.groupBy("pair", "y").agg(F.sum("c").alias("c")), "h_y"
    )
    hxy = _ent(joint, "h_xy")
    return (
        hxy.join(hx, "pair")
        .join(hy, "pair")
        .select(
            "pair",
            F.col("h_xy_n").alias("n"),
            "h_x",
            "h_y",
            "h_xy",
            (F.col("h_x") + F.col("h_y") - F.col("h_xy")).alias("mi"),
        )
        .orderBy("pair")
    )


def _dq_mutual_information_sql() -> str:
    selects = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS pair, CAST(({x}) AS VARCHAR) AS x,"
        f" CAST(({y}) AS VARCHAR) AS y FROM lineitem"
        for name, x, y in _MI_PAIRS
    )
    return f"""
WITH pairs AS ({selects}),
joint AS (
  SELECT pair, x, y, CAST(COUNT(*) AS BIGINT) AS c
  FROM pairs GROUP BY 1, 2, 3
),
hx AS (
  SELECT pair, n,
         ln(CAST(n AS DOUBLE))
           - list_reduce(list_transform(cs, v -> v * ln(v)),
                         (a, b) -> a + b) / n AS h_x
  FROM (SELECT pair, CAST(SUM(c) AS BIGINT) AS n,
               list(CAST(c AS DOUBLE) ORDER BY c) AS cs
        FROM (SELECT pair, x, SUM(c) AS c FROM joint GROUP BY 1, 2)
        GROUP BY pair)
),
hy AS (
  SELECT pair,
         ln(CAST(n AS DOUBLE))
           - list_reduce(list_transform(cs, v -> v * ln(v)),
                         (a, b) -> a + b) / n AS h_y
  FROM (SELECT pair, CAST(SUM(c) AS BIGINT) AS n,
               list(CAST(c AS DOUBLE) ORDER BY c) AS cs
        FROM (SELECT pair, y, SUM(c) AS c FROM joint GROUP BY 1, 2)
        GROUP BY pair)
),
hxy AS (
  SELECT pair, n,
         ln(CAST(n AS DOUBLE))
           - list_reduce(list_transform(cs, v -> v * ln(v)),
                         (a, b) -> a + b) / n AS h_xy
  FROM (SELECT pair, CAST(SUM(c) AS BIGINT) AS n,
               list(CAST(c AS DOUBLE) ORDER BY c) AS cs
        FROM joint GROUP BY pair)
)
SELECT hxy.pair, hxy.n, hx.h_x, hy.h_y, hxy.h_xy,
       hx.h_x + hy.h_y - hxy.h_xy AS mi
FROM hxy JOIN hx ON hx.pair = hxy.pair JOIN hy ON hy.pair = hxy.pair
ORDER BY hxy.pair
"""


DQ_MUTUAL_INFORMATION_SQL = _dq_mutual_information_sql()


# ---------------------------------------------------------------------------
# incremental view maintenance under DELETES (negative multiplicities)
# ---------------------------------------------------------------------------

# the retraction batch, spelled once and reused verbatim in both engines.
# The o_custkey % 7 disjunct deletes ~1/7 of customers ENTIRELY (every
# order they own), so the zero-multiplicity path — a group whose counts
# cancel to exactly 0 must VANISH from the view, not linger as a zero
# row — fires deterministically at every SF; the date disjunct retracts
# a partial slice of everyone else's orders.
_IVM_DELETE_PRED = (
    "(o_custkey % 7 = 0) "
    "OR (CAST(o_orderdate AS DATE) >= DATE '1997-07-01')"
)


def orders_ivm_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_custkey, line_cnt, revenue_cents): the orders_ivm_join view
    maintained under a DELETE batch — retraction as NEGATIVE
    multiplicities, the other half of textbook IVM (DBToaster-style
    delta rules; orders_ivm_join covers inserts):

      V(O \\ D ⋈ L) = V(O ⋈ L) ⊕ (-1)·V(D ⋈ L)

    because COUNT and SUM-of-int-cents form a commutative GROUP (not
    just a monoid — every partial has an inverse), so re-aggregating
    the base view with the deleted rows' NEGATED partials reproduces
    the post-delete state. The one subtlety every IVM engine must get
    right: a group whose multiplicity reaches zero must be DELETED
    from the view, not kept as a (0, 0) row — the HAVING-style
    line_cnt > 0 filter after the merge (exact int cancellation makes
    the zero test safe; no float epsilon anywhere).

    The oracle IS the full recompute on O \\ D, so the driver's hash
    gate — including the ABSENCE of the vanished custkeys — is the
    retraction proof. Deletes partition on the reference's own
    partition column (the reference swaps whole o_orderdate partitions
    via DELETE + INSERT, /root/reference/dags/dag.py:243-258; this is
    that operation's view-maintenance face).

    Scale: the retraction term joins ONLY the deleted orders against
    lineitem (runtime-filterable by orderkey, the bloom-semi-join
    probe); the base view is an already-materialized |custkeys|-row
    aggregate — never base ⋈ base, and never a rescan of the 100 TB
    fact table. No broadcast hints: the demo delta is a scale-
    proportional slice, AQE decides (the orders_ivm_join discipline).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev_c"
        ),
    )
    deleted = orders.where(F.expr(_IVM_DELETE_PRED))

    def view(o: DataFrame, sign: int) -> DataFrame:
        return (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_custkey")
            .agg(
                (F.count(F.lit(1)) * sign).cast("bigint").alias("line_cnt"),
                (F.sum("rev_c") * sign).cast("bigint").alias("revenue_cents"),
            )
        )

    base_view = view(orders, 1)  # the pre-delete materialized aggregate
    retraction = view(deleted, -1)
    return (
        base_view.unionByName(retraction)
        .groupBy("o_custkey")
        .agg(
            F.sum("line_cnt").cast("bigint").alias("line_cnt"),
            F.sum("revenue_cents").cast("bigint").alias("revenue_cents"),
        )
        .where(F.col("line_cnt") > 0)
        .orderBy("o_custkey")
    )


# the oracle is the FULL recompute on the surviving orders — hash
# equality (including the vanished custkeys' absence) proves the
# negative-multiplicity algebra
ORDERS_IVM_DELETE_SQL = f"""
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS line_cnt,
       CAST(SUM({cents_sql('l_extendedprice * (1 - l_discount)')}) AS BIGINT)
         AS revenue_cents
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE NOT ({_IVM_DELETE_PRED})
GROUP BY o_custkey
ORDER BY o_custkey
"""


# ---------------------------------------------------------------------------
# incremental view maintenance of a row-level LEFT OUTER join
# ---------------------------------------------------------------------------

# the insert batch: the %5 disjunct makes ~1/5 of customers receive
# their FIRST-ever order from the delta (every order they own arrives
# in it), so the outer join's NULL-padding retraction — the correction
# term inner-join IVM doesn't have — fires deterministically at every
# SF; the date disjunct is an ordinary late-arriving slice.
_IVM_OUTER_PRED = (
    "(o_custkey % 5 = 3) "
    "OR (CAST(o_orderdate AS DATE) >= DATE '1997-07-01')"
)


def orders_ivm_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_custkey, o_orderkey, o_total_cents): the row-level view
    customer LEFT JOIN orders, maintained incrementally under an
    INSERT batch ΔO — the outer-join delta rule inner-join IVM
    (orders_ivm_join/_delete) doesn't need:

      V_new = V_base ⊖ {NULL-padded rows of customers matched for the
                        FIRST time by ΔO}  ⊕  (ΔO ⋈ customer)

    A LEFT JOIN materializes a NULL-extended row for every unmatched
    customer; when a delta brings a customer its first order, simply
    appending the new joined rows would leave the stale NULL row in
    the view — the retraction term is what makes outer-join views
    maintainable (the DBToaster/Materialize correction). Customers
    unmatched in BOTH base and delta keep their NULL row untouched.

    The oracle IS the direct LEFT JOIN over the full orders table, so
    hash equality — including the exact set of surviving NULL rows —
    proves the correction. Exactness: keys + int cents only.

    Scale: the base view is already materialized; the correction term
    touches only ΔO's custkeys anti-joined against base-matched ones
    (delta-sized), and the insert term joins ΔO against the customer
    dimension — never a rescan of the base view's fact side. No
    broadcast hints (AQE decides; the demo delta is scale-
    proportional).
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        cents(F.col("o_totalprice")).alias("o_total_cents"),
    )
    o_base = orders.where(~F.expr(_IVM_OUTER_PRED))
    o_delta = orders.where(F.expr(_IVM_OUTER_PRED))
    # the pre-existing materialized view: row-level LEFT JOIN on base
    base_view = cust.join(
        o_base, cust.c_custkey == o_base.o_custkey, "left"
    ).select("c_custkey", "o_orderkey", "o_total_cents")
    # correction: NULL rows of customers ΔO matches for the first time
    first_matched = (
        o_delta.select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .join(
            o_base.select(F.col("o_custkey").alias("c_custkey")).distinct(),
            "c_custkey",
            "left_anti",
        )
        .withColumn("newly_matched", F.lit(True))
    )
    retained = base_view.join(first_matched, "c_custkey", "left").where(
        ~(F.col("o_orderkey").isNull() & F.col("newly_matched").isNotNull())
    ).select("c_custkey", "o_orderkey", "o_total_cents")
    inserts = cust.join(
        o_delta, cust.c_custkey == o_delta.o_custkey
    ).select("c_custkey", "o_orderkey", "o_total_cents")
    return retained.unionByName(inserts).orderBy(
        "c_custkey", "o_orderkey"
    )


# the oracle is the direct LEFT JOIN over the FULL orders table —
# hash equality (surviving NULL rows included) proves the correction
ORDERS_IVM_OUTER_SQL = f"""
SELECT c.c_custkey, o.o_orderkey,
       {cents_sql('o.o_totalprice')} AS o_total_cents
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
ORDER BY c.c_custkey, o.o_orderkey
"""


# ---------------------------------------------------------------------------
# approximate functional-dependency discovery (g3 violation rate)
# ---------------------------------------------------------------------------

# candidate FDs X -> Y, spelled once and reused verbatim in both
# engines (the _MI_PAIRS discipline: each engine wraps the expression
# in its own string cast, so the derived categories match byte-for-byte)
_FD_CANDIDATES: list[tuple[str, str, str]] = [
    # y is a pure function of x — an EXACT FD (g3 = 0.0) by
    # construction, the control row that proves the metric can reach
    # zero. (The synthetic testdata does NOT keep (l_orderkey,
    # l_linenumber) unique, so the textbook PK control is unavailable —
    # pinned by tests/test_r14_ops.py.)
    (
        "shipdate_to_shipyear",
        "CAST(l_shipdate AS DATE)",
        "EXTRACT(YEAR FROM CAST(l_shipdate AS DATE))",
    ),
    # near-FDs with real violation mass in TPC-H
    ("orderkey_to_suppkey", "l_orderkey", "l_suppkey"),
    ("orderkey_to_returnflag", "l_orderkey", "l_returnflag"),
    ("partkey_to_suppkey", "l_partkey", "l_suppkey"),
    ("shipdate_to_linestatus", "CAST(l_shipdate AS DATE)", "l_linestatus"),
]


def dq_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(fd, n_rows, n_groups, n_kept, n_violations, g3): approximate
    functional-dependency screen over candidate X -> Y pairs — the g3
    measure of Kivinen & Mannila (the TANE-family standard): the
    MINIMUM number of rows to delete so X -> Y holds exactly, i.e.
    n - Σ_x max_y count(x, y), reported as a rate. g3 = 0 certifies an
    exact dependency (the PK control row); small g3 flags a
    dependency-with-defects, the profile signal that drives both
    schema inference and DQ rules (dq_mutual_information sees
    correlation strength; this sees the deterministic claim and its
    exact defect count).

    Exactness: joint counts, per-x maxima, and all the sums are exact
    int64; g3 is ONE closing int/int division with identical op order
    in the twin — no entropy, no float accumulation at all.

    Scale: one scan fans out |FD|x map-side (stack), collapses via a
    map-combinable (fd, x, y) groupBy, then a second groupBy to
    (fd, x) and a third to |FD| rows — each stage strictly smaller;
    high-cardinality X (the orderkey rows) just means the
    intermediates stay fact-shaped and distributed, never collected.
    """
    li = load_table(spark, sf_dir, "lineitem")
    stack_args = ", ".join(
        f"'{name}', CAST(({x}) AS STRING), CAST(({y}) AS STRING)"
        for name, x, y in _FD_CANDIDATES
    )
    pairs = li.selectExpr(
        f"stack({len(_FD_CANDIDATES)}, {stack_args}) AS (fd, x, y)"
    )
    joint = pairs.groupBy("fd", "x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    perx = joint.groupBy("fd", "x").agg(
        F.sum("c").cast("bigint").alias("cx"),
        F.max("c").cast("bigint").alias("mx"),
    )
    return (
        perx.groupBy("fd")
        .agg(
            F.sum("cx").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("mx").cast("bigint").alias("n_kept"),
        )
        .select(
            "fd",
            "n_rows",
            "n_groups",
            "n_kept",
            (F.col("n_rows") - F.col("n_kept")).alias("n_violations"),
            (
                (F.col("n_rows") - F.col("n_kept")) / F.col("n_rows")
            ).alias("g3"),
        )
        .orderBy("fd")
    )


def _dq_fd_violations_sql() -> str:
    selects = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS fd, CAST(({x}) AS VARCHAR) AS x,"
        f" CAST(({y}) AS VARCHAR) AS y FROM lineitem"
        for name, x, y in _FD_CANDIDATES
    )
    return f"""
WITH pairs AS ({selects}),
joint AS (
  SELECT fd, x, y, CAST(COUNT(*) AS BIGINT) AS c
  FROM pairs GROUP BY 1, 2, 3
),
perx AS (
  SELECT fd, x, CAST(SUM(c) AS BIGINT) AS cx, CAST(MAX(c) AS BIGINT) AS mx
  FROM joint GROUP BY 1, 2
)
SELECT fd,
       CAST(SUM(cx) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(mx) AS BIGINT) AS n_kept,
       CAST(SUM(cx) - SUM(mx) AS BIGINT) AS n_violations,
       CAST(SUM(cx) - SUM(mx) AS BIGINT) / CAST(SUM(cx) AS BIGINT) AS g3
FROM perx
GROUP BY fd
ORDER BY fd
"""


DQ_FD_VIOLATIONS_SQL = _dq_fd_violations_sql()


# The oracle is the FULL recompute — hash equality against it is the
# correctness statement of the delta algebra, not a re-derivation of it.
ORDERS_IVM_SQL = f"""
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS line_cnt,
       CAST(SUM({cents_sql('l_extendedprice * (1 - l_discount)')}) AS BIGINT)
         AS revenue_cents
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_custkey
ORDER BY o_custkey
"""


RELATIONAL_EXT_QUERIES = {
    "q4_order_priority": (q4_order_priority, Q4_SQL),
    "q13_customer_distribution": (q13_customer_distribution, Q13_SQL),
    "q16_supplier_cnt": (q16_supplier_cnt, Q16_SQL),
    "q17_small_qty_revenue": (q17_small_qty_revenue, Q17_SQL),
    "q18_large_orders": (q18_large_orders, Q18_SQL),
    "revenue_rollup": (revenue_rollup, REVENUE_ROLLUP_SQL),
    "returnflag_pivot": (returnflag_pivot, RETURNFLAG_PIVOT_SQL),
    "customer_merge_upsert": (customer_merge_upsert, CUSTOMER_MERGE_SQL),
    "events_window_funcs": (events_window_funcs, EVENTS_WINDOW_SQL),
    "events_user_set_ops": (events_user_set_ops, EVENTS_SET_OPS_SQL),
    "events_user_trend": (events_user_trend, EVENTS_TREND_SQL),
    "scd2_priority_intervals": (scd2_priority_intervals, SCD2_SQL),
    "q7_nation_volume": (q7_nation_volume, Q7_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "parts_hierarchy_rollup": (parts_hierarchy_rollup, PARTS_HIERARCHY_SQL),
    "parts_name_linkage": (parts_name_linkage, PARTS_LINKAGE_SQL),
    "customer_rfm": (customer_rfm, CUSTOMER_RFM_SQL),
    "orders_market_basket": (orders_market_basket, MARKET_BASKET_SQL),
    "parts_jaccard_similarity": (
        parts_jaccard_similarity,
        PARTS_JACCARD_SQL,
    ),
    "orders_open_backlog": (orders_open_backlog, OPEN_BACKLOG_SQL),
    "customer_purchase_cadence": (
        customer_purchase_cadence,
        PURCHASE_CADENCE_SQL,
    ),
    "orders_abc_analysis": (orders_abc_analysis, ABC_ANALYSIS_SQL),
    "orders_cohort_ltv": (orders_cohort_ltv, COHORT_LTV_SQL),
    "orders_basket_rules": (orders_basket_rules, BASKET_RULES_SQL),
    "orders_ship_sla": (orders_ship_sla, SHIP_SLA_SQL),
    "dq_referential_integrity": (
        dq_referential_integrity,
        DQ_REFERENTIAL_SQL,
    ),
    # r13: the dominance-query operator class + a distributional DQ
    # screen — both differential-tested against a structurally
    # different oracle algorithm (quadratic NOT EXISTS / window-free)
    "parts_skyline": (parts_skyline, PARTS_SKYLINE_SQL),
    "dq_benford": (dq_benford, DQ_BENFORD_SQL),
    "dq_profile": (dq_profile, DQ_PROFILE_SQL),
    # r13 wave 7: incremental view maintenance — the oracle is the full
    # recompute, so driver hash equality proves the delta algebra
    "orders_ivm_join": (orders_ivm_join, ORDERS_IVM_SQL),
    # r13 wave 9: the column-dependence screen univariate profiling
    # can't see — exact joint counts, entropies in nats
    "dq_mutual_information": (
        dq_mutual_information,
        DQ_MUTUAL_INFORMATION_SQL,
    ),
    # r14: IVM's other half — retraction as negative multiplicities,
    # zero-support groups vanishing; oracle = full recompute on O \ D
    "orders_ivm_delete": (orders_ivm_delete, ORDERS_IVM_DELETE_SQL),
    # r14: approximate FD discovery (Kivinen-Mannila g3) — the
    # deterministic-dependency screen next to MI's correlation screen
    "dq_fd_violations": (dq_fd_violations, DQ_FD_VIOLATIONS_SQL),
    # r14 wave 4: the OUTER-join delta rule (NULL-padding retraction);
    # oracle = direct LEFT JOIN over the full orders table
    "orders_ivm_outer": (orders_ivm_outer, ORDERS_IVM_OUTER_SQL),
}
