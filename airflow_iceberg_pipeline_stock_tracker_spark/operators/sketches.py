"""Sketch aggregates with verified error bounds.

At 100 TB, exact COUNT(DISTINCT) and exact percentiles are shuffle-heavy
(distinct forces a full re-shuffle of every key; exact percentile
materializes sorted runs), while HyperLogLog and quantile sketches are
single-pass, map-side-combinable, O(1)-state aggregates — the only
viable shape for interactive cardinality/quantile work at that scale.
The reference never aggregates beyond COUNT(*) (dags/dag.py:202-277);
this adds the sketch tier a real analytics user needs.

Oracle design: cross-engine sketches can never hash-match (different
algorithms, seeds, merge orders), so the CONTRACT is the surfaced
result: each sketch value is compared in-plan against its exact twin
and emitted as a within-bound boolean, alongside the exact integer
aggregates. The DuckDB oracle computes the exact columns and pins the
booleans TRUE — so a driver hash-match proves both the exact math and
that every sketch landed inside its advertised error bound on this
data. No float crosses the engine boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["sketch_accuracy", "sketch_reaggregation", "heavy_hitters"]

# advertised bounds, deliberately looser than the configured sketch
# parameters (rsd=0.01, accuracy=10000) so the check verifies the
# guarantee, not the noise floor
DISTINCT_REL_ERR = 0.05
QUANTILE_REL_ERR = 0.05


def sketch_accuracy(events: DataFrame) -> DataFrame:
    """Per event_type: exact counts plus sketch-vs-exact bound checks.

    One aggregation pass computes COUNT(*), exact COUNT(DISTINCT),
    approx_count_distinct (HLL++), exact percentile, and
    percentile_approx (a Greenwald-Khanna-style mergeable sketch) —
    Catalyst plans the distinct via expand, everything else partial —
    then booleans compare sketch to exact in-plan.
    """
    val = F.col("value")
    agg = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("_users_hll"),
        F.expr("percentile(value, 0.5)").alias("_p50_exact"),
        F.percentile_approx(val, 0.5, 10000).alias("_p50_sketch"),
        F.expr("percentile(value, 0.95)").alias("_p95_exact"),
        F.percentile_approx(val, 0.95, 10000).alias("_p95_sketch"),
    )

    def _ok(sketch: str, exact: str, rel: float):
        e = F.col(exact)
        return F.abs(F.col(sketch) - e) <= F.greatest(
            F.lit(rel) * F.abs(e), F.lit(1e-9)
        )

    return agg.select(
        "event_type",
        "n_events",
        "n_users_exact",
        _ok("_users_hll", "n_users_exact", DISTINCT_REL_ERR).alias("distinct_ok"),
        _ok("_p50_sketch", "_p50_exact", QUANTILE_REL_ERR).alias("p50_ok"),
        _ok("_p95_sketch", "_p95_exact", QUANTILE_REL_ERR).alias("p95_ok"),
    ).orderBy("event_type")


SKETCH_ACCURACY_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users_exact,
       TRUE AS distinct_ok,
       TRUE AS p50_ok,
       TRUE AS p95_ok
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def sketch_reaggregation(events: DataFrame) -> DataFrame:
    """Mergeable-sketch rollup: per-day HLL sketches unioned per type.

    THE pattern that makes distinct counts work in a pre-aggregated
    store at 100 TB: exact COUNT(DISTINCT) is not re-aggregatable (a
    per-day rollup table cannot answer a monthly distinct), but a
    Datasketches HLL sketch is — store the per-(type, day) sketch
    binary, union sketches at query time, estimate once. This operator
    proves the full chain in-plan: build per-day sketches
    (`hll_sketch_agg`), merge them per type (`hll_union_agg`), and
    compare the merged estimate to the exact distinct computed from the
    raw rows — emitted as a within-bound boolean the oracle pins TRUE.

    Also emits n_days (rollup width) and the exact per-type distinct, so
    the row set stays fully deterministic.
    """
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.expr("hll_sketch_agg(user_id, 14)").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("_merged_est"),
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact")
    )
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "n_days",
            "n_users_exact",
            (
                F.abs(F.col("_merged_est") - F.col("n_users_exact"))
                <= F.greatest(
                    F.lit(DISTINCT_REL_ERR) * F.col("n_users_exact"), F.lit(1.0)
                )
            ).alias("merged_distinct_ok"),
        )
        .orderBy("event_type")
    )


SKETCH_REAGG_SQL = """
SELECT event_type,
       COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
       COUNT(DISTINCT user_id) AS n_users_exact,
       TRUE AS merged_distinct_ok
FROM events
GROUP BY event_type
ORDER BY event_type
"""


HH_K = 5
# explicit sketch capacity: exact-count agreement (the oracle's pinned
# TRUE) requires distinct keys <= capacity; see heavy_hitters docstring
HH_MAX_TRACKED = 100_000


def heavy_hitters(events: DataFrame, k: int = HH_K) -> DataFrame:
    """Top-k users by event count, exact vs the approx_top_k sketch.

    The frequent-items sketch is the streaming-friendly half (one pass,
    mergeable, bounded memory) of a query exact top-k needs a full
    count-and-sort for. Same oracle contract as the other sketch rows:
    the surfaced rows are the EXACT top-k (fully tie-broken on
    (count desc, user_id)), and `sketch_agrees` verifies in-plan that
    every item the sketch returned carries its exact count — tie-
    tolerant at the k boundary, where which equal-count item surfaces
    is legitimately unspecified. The oracle pins the boolean TRUE.

    Cardinality assumption (load-bearing for the pinned TRUE): the
    sketch's counts are bit-exact with the exact counts only while the
    distinct-key cardinality stays within its tracking capacity, so
    ``maxItemsTracked`` is passed EXPLICITLY (:data:`HH_MAX_TRACKED`,
    100k — a few MB of executor memory) rather than left at the default.
    Test fixtures stay far under it (~1.5k distinct users at sf0.1,
    ~15k at sf1). Beyond capacity the sketch may undercount and the
    boolean legitimately flips false — at that scale raise
    HH_MAX_TRACKED or drop the in-plan pin to a tolerance check; the
    exact top-k half of the query is unaffected either way.
    """
    from pyspark.sql import Window

    counts = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.desc("n"), "user_id")
    exact = (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("user_id", "n", F.col("rk").cast("bigint").alias("rk"))
    )
    sk = (
        events.agg(
            F.expr(
                f"approx_top_k(user_id, {k}, {HH_MAX_TRACKED})"
            ).alias("items")
        )
        .select(F.explode("items").alias("it"))
        .select(
            F.col("it.item").alias("user_id"),
            F.col("it.count").alias("sk_n"),
        )
    )
    # fewer than k distinct users is NOT a disagreement: both sides then
    # return all users, so the bar is "as many items as the exact top-k
    # has rows, each with its exact count" (empty-sum NULL coalesced)
    n_exact = exact.agg(
        F.count(F.lit(1)).alias("n_ex"), F.lit(1).alias("jk")
    )
    agree = (
        sk.join(counts, "user_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_sk"),
            F.coalesce(
                F.sum(F.when(F.col("sk_n") == F.col("n"), 0).otherwise(1)),
                F.lit(0),
            ).alias("n_bad"),
            F.lit(1).alias("jk"),
        )
        .join(F.broadcast(n_exact), "jk")
        .select(
            ((F.col("n_sk") == F.col("n_ex")) & (F.col("n_bad") == 0)).alias(
                "sketch_agrees"
            ),
            "jk",
        )
    )
    return (
        exact.withColumn("jk", F.lit(1))
        .join(F.broadcast(agree), "jk")
        .select("user_id", "n", "rk", "sketch_agrees")
        .orderBy("rk")
    )


HEAVY_HITTERS_SQL = f"""
SELECT user_id, n, rk, TRUE AS sketch_agrees
FROM (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, user_id) AS BIGINT) AS rk
  FROM events GROUP BY user_id
)
WHERE rk <= {HH_K}
ORDER BY rk
"""
