"""As-of (point-in-time) join — the canonical time-series operator Spark
has no native keyword for (SPARK-22947 discusses it; pandas has
`merge_asof`, DuckDB has `ASOF JOIN`).

For every left row, attach the most recent right row of the same key
whose time is at-or-before the left row's time (backward direction, the
finance/point-in-time-correctness case).

Spark-first design — union + running carry-forward, NOT a range join:

    tag left rows (payload=null) and right rows (payload=struct),
    union, then one window per key ordered by (time, side) taking
    `last(payload, ignorenulls=True)` over UNBOUNDED PRECEDING..CURRENT.

  * One shuffle (the window sort), no join at all — a naive range join
    explodes to |left| x |right-per-key| candidates and even Spark's
    optimized range joins need a bucketized rewrite; the union trick is
    O((|L|+|R|) log) sort per key and streams in one pass.
  * `last(..., ignorenulls)` over an UNBOUNDED PRECEDING frame is
    evaluated incrementally by Spark (running accumulator, not a
    per-row frame rescan), so the window stage is linear.
  * Right rows sort BEFORE left rows at equal times (side tag 0 < 1),
    giving inclusive `right.time <= left.time` semantics, same as
    DuckDB ASOF and pandas merge_asof defaults.
  * At 100 TB both sides shuffle once on the key; skewed keys behave
    like any window (AQE cannot split a single key — pre-salt the key
    if one key dominates, at the cost of per-salt-group boundaries).

Precondition: right must be unique per (key, time) — duplicate
timestamps within a key make "the" most recent row ambiguous (pandas
silently takes the last; we require the caller to disambiguate first,
e.g. with a groupBy-max, so results stay deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
) -> DataFrame:
    """Backward as-of join (left join flavor: every left row survives).

    Returns all left columns plus `right_time` and the remaining right
    columns, null where no right row is at-or-before the left time.
    Right column names must not collide with left's (pre-rename them).
    """
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = [c for c in right.columns if c not in [*keys, right_time]]
    out_cols = [right_time, *value_cols]
    clash = set(out_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right columns collide with left: {sorted(clash)}")

    payload = F.struct(
        F.col(right_time).alias("t"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    tagged_right = right.select(
        *keys,
        F.col(right_time).alias("_asof_t"),
        payload.alias("_asof_payload"),
        F.lit(0).alias("_asof_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
    )
    tagged_left = left.select(
        *left.columns,
        F.col(left_time).alias("_asof_t"),
        F.lit(None).cast(tagged_right.schema["_asof_payload"].dataType).alias(
            "_asof_payload"
        ),
        F.lit(1).alias("_asof_side"),
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_asof_t").asc(), F.col("_asof_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_asof_payload", ignorenulls=True).over(w)
    return (
        tagged_left.unionByName(tagged_right)
        .withColumn("_asof_match", carried)
        .where(F.col("_asof_side") == 1)
        .select(
            *left.columns,
            F.col("_asof_match.t").alias(right_time),
            *[F.col(f"_asof_match.{c}").alias(c) for c in value_cols],
        )
    )
