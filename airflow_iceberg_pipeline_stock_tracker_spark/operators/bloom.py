"""Hand-rolled Bloom-filter semi join — the runtime-filter pattern.

At 100 TB the dominant cost of `fact SEMI JOIN dim-subset` is shuffling
the fact table to the join keys. Spark's own runtime row-level filtering
(`spark.sql.optimizer.runtime.bloomFilter.*`) injects exactly this
structure, but its `bloom_filter_agg` / `might_contain` expressions are
not exposed as SQL-callable functions in this build — so the operator is
composed from public DataFrame algebra instead, which also makes every
piece testable:

  * BUILD (dim side, small): k=``BLOOM_K`` positions per key via
    ``xxhash64(key, seed)`` mod ``BLOOM_M_BITS``, exploded to
    (word, bit) pairs and OR-folded into a dense ``m/64``-word bitmap
    with one tiny groupBy. The bitmap (16 KiB at the default sizing) is
    collected and re-broadcast as a one-row array — the same bounded
    "codebook collect" shape the PQ/IVF operators use: the collect is
    O(m), never O(data).
  * PROBE (fact side, huge): a crossJoin against the broadcast one-row
    bitmap plus a pure projection — ``element_at(bitmap, pos>>6) &
    (1<<(pos&63))`` conjoined over the k hashes. No shuffle, no UDF;
    the filter runs inside the scan's WholeStageCodegen and drops
    ~(1-fpr) of non-matching rows BEFORE the exact join pays any
    network cost.
  * EXACT REPAIR: a broadcast left-semi join against the real key set
    removes Bloom false positives, so the surfaced result is exact and
    a plain SQL semi join can oracle it.

In-plan proof: Bloom filters admit false positives but never false
negatives — every build-side key must pass its own probe. The operator
self-probes the build keys and surfaces the conjunction as a pinned
``bloom_no_false_negative`` boolean (the sketches.py oracle contract:
booleans verified in-plan, TRUE pinned by the oracle, no float crosses
the engine boundary).

Sizing: m = 2^17 bits, k = 5 → <0.1% fpr up to ~9k keys (10+ bits/key
at sf0.1's selective build side). At a larger build side, grow
BLOOM_M_BITS linearly with the key count (the bitmap stays
broadcast-cheap into the MiB range) — fpr only degrades the *pruning
rate*, never correctness, because of the exact repair join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_semi_join", "BLOOM_SEMI_JOIN_SQL"]

BLOOM_M_BITS = 1 << 17  # 131072 bits = 2048 words = 16 KiB
BLOOM_K = 5

# the selective dim-side predicate (urgent orders of 1996Q1; the
# fixture orders span 1995-2001, so this is non-empty at every SF)
_O_START, _O_END = "1996-01-01", "1996-04-01"
_O_PRIO = "1-URGENT"


def _positions(key: Column) -> list[Column]:
    """k bit positions for a key: xxhash64 with distinct seeds, mod m."""
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(BLOOM_M_BITS))
        for seed in range(1, BLOOM_K + 1)
    ]


def _probe_ok(bitmap: Column, key: Column) -> Column:
    """True iff every one of the key's k bits is set in the bitmap."""
    checks = [
        (
            F.element_at(bitmap, F.shiftright(pos, 6).cast("int") + 1).bitwiseAND(
                F.call_function(
                    "shiftleft", F.lit(1).cast("bigint"), (pos % 64).cast("int")
                )
            )
            != 0
        )
        for pos in _positions(key)
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_semi_join(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Monthly revenue of lineitems whose order is an urgent 1996Q1 order,
    computed through a build->probe->exact-repair Bloom pipeline.

    Surface: (ship_month, n_lines, revenue, bloom_no_false_negative) —
    exact integer-cent revenue, month as DATE trunc, boolean pinned TRUE.
    """
    from ..functions.money import cents, dollars

    spark = lineitem.sparkSession
    sel = orders.where(
        (F.col("o_orderdate").cast("date") >= F.lit(_O_START).cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit(_O_END).cast("date"))
        & (F.col("o_orderpriority") == _O_PRIO)
    ).select("o_orderkey")

    # BUILD: (word, or-of-bits) pairs -> dense bitmap array
    pos = F.explode(F.array(*_positions(F.col("o_orderkey")))).alias("pos")
    words = (
        sel.select(pos)
        .select(
            F.shiftright(F.col("pos"), 6).cast("int").alias("word"),
            F.call_function(
                "shiftleft", F.lit(1).cast("bigint"), (F.col("pos") % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("bits"))
        .collect()
    )  # bounded by m/64 = 2048 rows, never by data volume
    dense = [0] * (BLOOM_M_BITS >> 6)
    for r in words:
        dense[r.word] = r.bits
    from ..sources.tables import local_df

    bf = local_df(spark, [(dense,)], "bf array<bigint>")

    # self-probe: every build key must pass (no false negatives)
    self_ok = (
        sel.crossJoin(F.broadcast(bf))
        .agg(
            F.coalesce(
                F.min(_probe_ok(F.col("bf"), F.col("o_orderkey"))), F.lit(True)
            ).alias("bloom_no_false_negative"),
            F.lit(1).alias("jk"),
        )
    )

    # PROBE: scan-local pruning, then exact repair via broadcast semi join
    pruned = lineitem.crossJoin(F.broadcast(bf)).where(
        _probe_ok(F.col("bf"), F.col("l_orderkey"))
    )
    exact = pruned.join(
        F.broadcast(sel),
        pruned.l_orderkey == sel.o_orderkey,
        "left_semi",
    )
    rev = F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
    return (
        exact.groupBy(F.trunc(F.col("l_shipdate").cast("date"), "month").alias("ship_month"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dollars(rev).alias("revenue"),
            F.lit(1).alias("jk"),
        )
        .join(F.broadcast(self_ok), "jk")
        .select("ship_month", "n_lines", "revenue", "bloom_no_false_negative")
        .orderBy("ship_month")
    )


BLOOM_SEMI_JOIN_SQL = f"""
SELECT date_trunc('month', CAST(l_shipdate AS DATE)) AS ship_month,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            AS DOUBLE) / 100.0 AS revenue,
       TRUE AS bloom_no_false_negative
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders
  WHERE CAST(o_orderdate AS DATE) >= DATE '{_O_START}'
    AND CAST(o_orderdate AS DATE) <  DATE '{_O_END}'
    AND o_orderpriority = '{_O_PRIO}'
)
GROUP BY 1 ORDER BY 1
"""
