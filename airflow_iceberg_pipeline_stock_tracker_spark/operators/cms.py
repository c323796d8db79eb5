"""Count-Min sketch: mergeable frequency estimation, exact-int end to end.

Completes the sketch tier's quartet — HLL (plans/timeseries.py) answers
DISTINCT counts, KMV (operators/kmv.py) answers set algebra, the
128-bin histogram answers quantiles, and CMS answers "how often does
item x occur" in O(depth x width) integers without per-item state: each
of `depth` universal hash rows maps an item to one of `width` counters;
an item's estimate is the MINIMUM of its counters, which is >= the true
count always (one-sided error) and exceeds it only by other items'
collisions (< 2N/width with probability 1 - 2^-depth).

This is the house discipline's favorite sketch: counters are exact
int64 sums, the estimate is an integer MIN — zero floats anywhere, so
the oracle comparison is pure integer equality (no closing-division
care needed at all). Merge = counter-wise ADDITION, associative and
commutative over any partitioning of the data (the events_hll_reagg
re-aggregation contract, provable the same way).

Hash rows reuse the MinHash universal family h_j(x) = (a_j*x + b_j)
mod p over hash32 items (a < 2^31, x < 2^32: products stay below 2^63
in both engines), then mod `width` — all shared with the SQL twin.

Scale: the build explodes each row into `depth` (row, bucket) pairs and
map-combines to a <= depth x width counter table; estimates join a
bounded probe set against those counters. Nothing is per-item.

Registration: the SQL twin below was parity-pinned against DuckDB by
tests/test_cms.py BEFORE any driver row existed; the driver row
(events_cms_heavy_hitters in plans/timeseries.py) then registered
checked-first late in r12, funded by the r9 code-changed trio's
demotion — minting stayed capped at the demotion supply.

Reference scope: extension tier — the reference DAG
(/root/reference/dags/dag.py) keeps only exact SQL aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.texthash import MINHASH_P, MINHASH_PERMS, hash32, hash32_sql

CMS_DEPTH = 4
CMS_WIDTH = 1024  # error bound ~ 2N/1024 with prob 1 - 2^-4


def _bucket(j: int, hcol) -> F.Column:
    a, b = MINHASH_PERMS[j]
    return ((F.lit(a) * hcol + F.lit(b)) % F.lit(MINHASH_P)) % F.lit(CMS_WIDTH)


def cms_build(df: DataFrame, item_col: str) -> DataFrame:
    """The depth x width counter table for `item_col`'s stream of
    occurrences: (j, bucket, cnt), <= CMS_DEPTH * CMS_WIDTH rows,
    map-combinable (one groupBy; the explode multiplies map-side rows by
    depth, never the shuffle width).

    NULL items are EXCLUDED from the sketch (COUNT(col) semantics —
    COUNT ignores NULLs). Without the filter, NULL occurrences would
    land in a NULL bucket that the estimate's equi-join can never probe,
    so a NULL probe would report 0 below its true count and silently
    break the one-sided (estimate >= truth) contract."""
    h = hash32(F.col(item_col).cast("string"))
    rows = df.where(F.col(item_col).isNotNull()).select(h.alias("h")).select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"), _bucket(j, F.col("h")).alias("bucket")
                )
                for j in range(CMS_DEPTH)
            ])
        ).alias("jb")
    )
    return (
        rows.select("jb.j", "jb.bucket")
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, probes: DataFrame, item_col: str) -> DataFrame:
    """Point estimates for a bounded probe set: per probe item, the MIN
    over its depth counters (missing counter row = 0 occurrences of that
    bucket = estimate 0). Pure integers. NULL probes are excluded,
    mirroring the build's COUNT(col) semantics."""
    h = hash32(F.col(item_col).cast("string"))
    keyed = probes.where(F.col(item_col).isNotNull()).select(
        item_col, h.alias("h")
    ).select(
        item_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"), _bucket(j, F.col("h")).alias("bucket")
                )
                for j in range(CMS_DEPTH)
            ])
        ).alias("jb"),
    ).select(item_col, "jb.j", "jb.bucket")
    return (
        keyed.join(sketch, ["j", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("cms_est"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Counter-wise addition — the mergeability contract (daily sketches
    summed == one-pass build, exactly)."""
    return (
        a.unionByName(b)
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


# --- SQL twins (DuckDB), parity-pinned by tests/test_cms.py ----------------

def _bucket_sql(j: int, hexpr: str) -> str:
    a, b = MINHASH_PERMS[j]
    return f"((({a} * {hexpr} + {b}) % {MINHASH_P}) % {CMS_WIDTH})"


def cms_topk_sql(
    table: str, item_expr: str, k: int = 20
) -> str:
    """Per top-k exact item: exact count, CMS estimate (>= exact always),
    and the integer overestimate — the grader shape an r13 driver row
    uses. Ties on exact count break by item for a deterministic top-k."""
    hv = hash32_sql(f"CAST({item_expr} AS VARCHAR)")
    unions = "\n    UNION ALL\n".join(
        f"    SELECT {j} AS j, {_bucket_sql(j, 'h')} AS bucket, n FROM hashed"
        for j in range(CMS_DEPTH)
    )
    # probe branches derive from the SAME range(CMS_DEPTH) as the sketch
    # unions — a hardcoded j=0..3 list would silently desynchronize the
    # twin if the depth constant moves (review-found)
    probe_unions = "\n    UNION ALL\n".join(
        f"    SELECT item, n, {j} AS j, {_bucket_sql(j, 'h')} AS bucket "
        "FROM top_items"
        for j in range(CMS_DEPTH)
    )
    return f"""
WITH hashed AS (
  SELECT {item_expr} AS item, {hv} AS h, CAST(COUNT(*) AS BIGINT) AS n
  FROM {table} WHERE {item_expr} IS NOT NULL GROUP BY 1, 2
), sketch AS (
  SELECT j, bucket, CAST(SUM(n) AS BIGINT) AS cnt FROM (
{unions}
  ) GROUP BY 1, 2
), top_items AS (
  SELECT item, h, n FROM hashed
  ORDER BY n DESC, item
  LIMIT {k}
), probes AS (
  SELECT item, n, j, bucket FROM (
{probe_unions}
  )
)
SELECT p.item, MIN(p.n) AS exact_n,
       CAST(MIN(COALESCE(s.cnt, 0)) AS BIGINT) AS cms_est,
       CAST(MIN(COALESCE(s.cnt, 0)) - MIN(p.n) AS BIGINT) AS overestimate
FROM probes p
LEFT JOIN sketch s ON s.j = p.j AND s.bucket = p.bucket
GROUP BY p.item
ORDER BY exact_n DESC, p.item
"""
