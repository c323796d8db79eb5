"""KMV (k-minimum-values / bottom-k) distinct sketch.

The HLL tier (plans/timeseries.py) answers per-key distinct counts with
fixed 256-int registers; KMV is its set-algebra complement: the sketch
IS a uniform sample of the key's distinct hash values (the k smallest),
so set operations come from SAMPLE algebra instead of
inclusion-exclusion — the Jaccard of two audiences is estimated by
inspecting the bottom-k of their union, which keeps INTERSECTION
estimates inside [0, min(|A|,|B|)] where HLL's est_a + est_b - est_u
can legitimately go negative (events_hll_setops reports that rawness;
this operator is the fix a pipeline reaches for when intersections are
the product, e.g. audience-overlap matrices).

Exactness discipline (the repo's sketch contract): the sample is a set
of exact int64 60-bit hashes (functions/texthash.hash60 — identical
md5 path in both engines); every count is an exact int; a sketch with
FEWER than k distinct hashes is the key's entire distinct set and is
reported exactly (est == true count by construction, flagged `exact`);
the one float step per estimate is (k-1) * 2^60 / kth_min — two exact
double literals, one multiply, one divide, the same op sequence in any
engine (no libm, no pow).

Scale: bottom-k per key is a rank <= k filter over a window — Spark
plans it as WindowGroupLimit, which takes the per-partition top-k
BEFORE the exchange, so the shuffle moves O(keys x k) rows, not the
corpus (the similarity_cluster_balance discipline). Merge of two
sketches = k smallest of the multiset union — associative,
commutative, idempotent, so sketches re-aggregate across any
partitioning of the data (the events_hll_reagg property, provable the
same way).

Registration: the SQL twins below were parity-pinned against DuckDB by
tests/test_kmv.py BEFORE any driver row existed; the driver rows
(events_kmv_distinct, events_kmv_overlap in plans/timeseries.py) then
registered checked-first late in r12, funded by demoting the
three-round-green r9 code-changed trio — minting stayed capped at the
demotion supply per the r11 verdict.

Reference scope: extension tier — the reference DAG
(/root/reference/dags/dag.py) keeps only exact SQL aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.texthash import hash60, hash60_sql

KMV_K = 256  # relative error ~ 1/sqrt(k-2) ~ 6.3%, the HLL tier's class
HASH_SPACE = 1 << 60  # hash60's domain size; exact as a double (2^60)


def bottom_k(
    df: DataFrame, keys: list[str], value_col: str, k: int = KMV_K
) -> DataFrame:
    """Per-`keys` KMV sketch: the k smallest DISTINCT hash60 values of
    `value_col`, one row per (keys..., h). Deterministic, mergeable.

    NULL values are EXCLUDED (COUNT(DISTINCT) semantics, which the
    estimate mirrors). This is also a cross-engine requirement: a NULL
    hash would rank FIRST in Spark's window (asc = nulls first) but
    LAST in DuckDB's (nulls last), silently skewing a saturated
    sketch's kth_min between the twins."""
    hashed = (
        df.where(F.col(value_col).isNotNull())
        .select(*keys, hash60(F.col(value_col).cast("string")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(*keys).orderBy("h")
    return (
        hashed.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .drop("rnk")
    )


def kmv_estimate(sketch: DataFrame, keys: list[str], k: int = KMV_K) -> DataFrame:
    """Distinct-count estimate per `keys` from a bottom_k sketch.

    A saturated sketch (n_sample == k) estimates (k-1) * 2^60 / kth_min;
    an unsaturated one IS the full distinct set, so the exact size is
    reported and `exact` is true. The output is hash-checkable: counts
    are exact ints, the estimate is one multiply + one divide of exact
    doubles.
    """
    per = sketch.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_sample"),
        F.max("h").alias("kth_min"),  # max of the kept bottom-k = k-th min
    )
    est = (
        F.lit(float(k - 1))
        * F.lit(float(HASH_SPACE))
        / F.col("kth_min").cast("double")
    )
    return per.select(
        *keys,
        F.col("n_sample").cast("bigint").alias("n_sample"),
        F.col("kth_min").cast("bigint").alias("kth_min"),
        (F.col("n_sample") < k).alias("exact"),
        F.when(F.col("n_sample") < k, F.col("n_sample").cast("double"))
        .otherwise(est)
        .alias("est_distinct"),
    )


def kmv_merge(a: DataFrame, b: DataFrame, keys: list[str], k: int = KMV_K) -> DataFrame:
    """Merge two sketches keyed the same way: k smallest of the union.
    Associative/commutative/idempotent — the re-aggregation contract."""
    u = a.unionByName(b).distinct()
    w = Window.partitionBy(*keys).orderBy("h")
    return (
        u.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .drop("rnk")
    )


def kmv_pair_overlap(
    sketch: DataFrame, key: str, k: int = KMV_K
) -> DataFrame:
    """Audience-overlap matrix from ONE per-key sketch table: for every
    unordered key pair, union/intersection/Jaccard estimates via sample
    algebra.

    For pair (A, B): X = bottom-k of (sketch_A ∪ sketch_B) — computable
    from the sketches alone (mergeability); rho = |{x in X seen in both
    A's and B's sketches}| / |X|; union_est from X's k-th min (exact
    branch when |X| < k); intersection_est = rho * union_est; jaccard =
    rho. Every count is an exact int; rho and the two estimates are
    single-division floats with identical op order cross-engine.

    Scale: all algebra runs on O(|keys|^2 x k) sketch rows — dimension
    scale; the corpus is touched only by the one bottom_k build. The
    pair spine explodes a collected key set (no join to replicate — the
    events_hll_setops r12 discipline).
    """
    keyset = (
        sketch.select(F.col(key)).distinct()
        .agg(F.collect_set(key).alias("ks"))
        .select(F.explode("ks").alias("key_a"), "ks")
        .select("key_a", F.explode("ks").alias("key_b"))
        .where(F.col("key_a") < F.col("key_b"))
    )
    sa = sketch.select(F.col(key).alias("key_a"), F.col("h"))
    sb = sketch.select(F.col(key).alias("key_b"), F.col("h"))
    # tagged union of the two samples per pair: in_a/in_b exact flags
    both = (
        keyset.join(sa, "key_a")
        .select("key_a", "key_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            keyset.join(sb, "key_b").select(
                "key_a", "key_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
            )
        )
        .groupBy("key_a", "key_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("key_a", "key_b").orderBy("h")
    x = both.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)
    per = x.groupBy("key_a", "key_b").agg(
        F.count(F.lit(1)).alias("n_x"),
        F.max("h").alias("kth_min"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
    )
    union_est = F.when(
        F.col("n_x") < k, F.col("n_x").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(HASH_SPACE)) / F.col("kth_min").cast("double")
    )
    rho = F.col("n_both").cast("double") / F.col("n_x").cast("double")
    return per.select(
        "key_a",
        "key_b",
        F.col("n_x").cast("bigint").alias("n_x"),
        F.col("n_both").cast("bigint").alias("n_both"),
        rho.alias("jaccard_est"),
        union_est.alias("union_est"),
        (rho * union_est).alias("intersection_est"),
    ).orderBy("key_a", "key_b")


# --- SQL twins (DuckDB), parity-pinned by tests/test_kmv.py now so the
# --- r13 registration inherits proven strings ------------------------------

def kmv_distinct_sql(table: str, key: str, value_expr: str, k: int = KMV_K) -> str:
    hv = hash60_sql(f"CAST({value_expr} AS VARCHAR)")
    return f"""
WITH hashed AS (
  SELECT DISTINCT {key} AS key, {hv} AS h FROM {table}
  WHERE {value_expr} IS NOT NULL
), ranked AS (
  SELECT key, h FROM hashed
  QUALIFY ROW_NUMBER() OVER (PARTITION BY key ORDER BY h) <= {k}
), per AS (
  SELECT key, CAST(COUNT(*) AS BIGINT) AS n_sample,
         CAST(MAX(h) AS BIGINT) AS kth_min
  FROM ranked GROUP BY 1
)
SELECT key, n_sample, kth_min,
       n_sample < {k} AS exact,
       CASE WHEN n_sample < {k} THEN CAST(n_sample AS DOUBLE)
            ELSE CAST({float(k - 1)!r} AS DOUBLE)
                 * CAST({float(HASH_SPACE)!r} AS DOUBLE)
                 / CAST(kth_min AS DOUBLE) END AS est_distinct
FROM per
ORDER BY key
"""


def kmv_pair_overlap_sql(table: str, key: str, value_expr: str, k: int = KMV_K) -> str:
    hv = hash60_sql(f"CAST({value_expr} AS VARCHAR)")
    return f"""
WITH hashed AS (
  SELECT DISTINCT {key} AS key, {hv} AS h FROM {table}
  WHERE {value_expr} IS NOT NULL
), sk AS (
  SELECT key, h FROM hashed
  QUALIFY ROW_NUMBER() OVER (PARTITION BY key ORDER BY h) <= {k}
), keys AS (
  SELECT DISTINCT key FROM sk
), pairs AS (
  SELECT a.key AS key_a, b.key AS key_b
  FROM keys a JOIN keys b ON a.key < b.key
), tagged AS (
  SELECT key_a, key_b, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b
  FROM (
    SELECT p.key_a, p.key_b, s.h, 1 AS in_a, 0 AS in_b
    FROM pairs p JOIN sk s ON s.key = p.key_a
    UNION ALL
    SELECT p.key_a, p.key_b, s.h, 0 AS in_a, 1 AS in_b
    FROM pairs p JOIN sk s ON s.key = p.key_b
  ) GROUP BY 1, 2, 3
), x AS (
  SELECT key_a, key_b, h, in_a, in_b FROM tagged
  QUALIFY ROW_NUMBER() OVER (PARTITION BY key_a, key_b ORDER BY h) <= {k}
), per AS (
  SELECT key_a, key_b,
         CAST(COUNT(*) AS BIGINT) AS n_x,
         CAST(MAX(h) AS BIGINT) AS kth_min,
         CAST(SUM(in_a * in_b) AS BIGINT) AS n_both
  FROM x GROUP BY 1, 2
)
SELECT key_a, key_b, n_x, n_both,
       CAST(n_both AS DOUBLE) / CAST(n_x AS DOUBLE) AS jaccard_est,
       CASE WHEN n_x < {k} THEN CAST(n_x AS DOUBLE)
            ELSE CAST({float(k - 1)!r} AS DOUBLE)
                 * CAST({float(HASH_SPACE)!r} AS DOUBLE)
                 / CAST(kth_min AS DOUBLE) END AS union_est,
       (CAST(n_both AS DOUBLE) / CAST(n_x AS DOUBLE))
         * CASE WHEN n_x < {k} THEN CAST(n_x AS DOUBLE)
                ELSE CAST({float(k - 1)!r} AS DOUBLE)
                     * CAST({float(HASH_SPACE)!r} AS DOUBLE)
                     / CAST(kth_min AS DOUBLE) END AS intersection_est
FROM per
ORDER BY key_a, key_b
"""
