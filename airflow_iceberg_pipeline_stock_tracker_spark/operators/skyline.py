"""Skyline (Pareto-frontier) operator: the maximal set under dominance.

A row p is ON the skyline of its group iff no other row q in the group
dominates it — q at-least-as-good on every criterion and strictly
better on at least one. Here the criteria are MIN price / MAX size over
``part``: the "cheapest part of every useful size" query that price
engines and catalog curators run, and the operator class (preference /
dominance queries, Börzsönyi et al., ICDE 2001) the relational tier did
not yet cover.

The textbook definition is the quadratic NOT EXISTS self-join — that is
exactly what the DuckDB oracle twin runs, making this a strong
differential test: the Spark plan is a DIFFERENT algorithm (sort-based
linear scan) that must produce the identical set.

Spark plan — O(n log n), no self-join, for the 2-criteria case:

  1. collapse to one row per (group, price): ``max(size)`` — map-side
     combinable, any volume falls to |distinct (group, price)|;
  2. per group, ordered by price ascending, take the running
     ``max(size)`` over STRICTLY cheaper rows (a ROWS frame ending at
     -1 on the collapsed table, where each price appears once);
  3. a collapsed row survives iff no strictly-cheaper row reaches its
     size (``prior_max < size`` or first row); a base row survives iff
     its size equals its price-group max AND its price group survives.
     Same-price same-size duplicates are all kept (neither dominates —
     dominance needs one strict inequality), matching NOT EXISTS.

Exactness: prices compare as exact integer cents (functions/money.py);
sizes are ints. Nothing floats, so partial aggregation and AQE cannot
perturb the set.

Scale: the only per-row work is one groupBy (combinable). The window
runs over the collapsed (group, price) table — bounded by price
cardinality, not row count — and the join back is an equi-join on
(group, price_cents) that AQE can broadcast when the frontier input is
dimension-sized. The quadratic oracle shape would be O(n^2) per group
and is never executed on Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.money import cents


def skyline_min_price_max_size(
    df: DataFrame,
    group_col: str,
    price_col: str,
    size_col: str,
) -> DataFrame:
    """Rows of ``df`` on the per-group skyline (min price, max size).

    Adds ``price_cents`` (exact bigint) and preserves all input columns.
    NULL price or size rows are excluded — NULL has no position in a
    dominance order.
    """
    base = df.where(
        F.col(price_col).isNotNull() & F.col(size_col).isNotNull()
    ).withColumn("price_cents", cents(price_col))

    per_price = base.groupBy(group_col, "price_cents").agg(
        F.max(size_col).alias("grp_max_size")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        per_price.withColumn(
            "prior_max_size", F.max("grp_max_size").over(w)
        )
        # a strictly-cheaper price already reaches this size => every
        # row at this price is dominated
        .where(
            F.col("prior_max_size").isNull()
            | (F.col("prior_max_size") < F.col("grp_max_size"))
        )
        .select(group_col, "price_cents", "grp_max_size")
    )
    return base.join(frontier, [group_col, "price_cents"]).where(
        F.col(size_col) == F.col("grp_max_size")
    )
