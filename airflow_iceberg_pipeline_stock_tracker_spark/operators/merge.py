"""MERGE / upsert expressed as distributed relational algebra.

The reference's table format is Iceberg (``/root/reference/dags/dag.py:145``),
whose headline write primitive is ``MERGE INTO`` — upsert a keyed source
batch into a keyed target table. The naive algebra is a FULL OUTER join
on the merge key, but Spark rejects broadcast hints for full-outer
builds (``HintErrorLogger: build right for full outer join``), so that
plan ALWAYS shuffles the entire target — years of history moving for a
day's changeset. This module instead decomposes the merge into three
disjoint branches, the same shape Iceberg's copy-on-write MERGE plans:

  untouched = target LEFT ANTI source-keys     (broadcast anti)
  updated   = target INNER source              (broadcast hash join)
  inserted  = source LEFT ANTI matched-keys    (broadcast anti, both tiny)

With a small changeset (the common case) the target is only ever the
streamed side of broadcast joins — it never shuffles, and Catalyst
prunes each branch's scan to the columns that branch touches. The union
of the three branches is row-identical to the full-outer projection,
which is exactly what the DuckDB oracle cross-checks.

When the Iceberg runtime jar is present the same call sites can switch
to ``MERGE INTO`` SQL verbatim; file-level pruning then additionally
skips data files whose key ranges miss the changeset.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    when_matched: Mapping[str, Column],
    when_not_matched: Mapping[str, Column],
) -> DataFrame:
    """Upsert ``source`` into ``target`` on ``keys``.

    Returns a frame with the target's schema:
      * rows in both: target columns overwritten by ``when_matched``
        expressions (reference columns as ``t.<col>`` / ``s.<col>``);
      * rows only in source: built from ``when_not_matched`` (must
        define EVERY non-key target column; may reference ``s.<col>``);
      * rows only in target: unchanged.

    ``source`` should carry a ``F.broadcast`` hint when it is a small
    changeset — every join here places it (or a projection of it) on
    the build side, so the hint keeps the target from ever shuffling.

    ``source`` must be key-unique (the CDC contract — aggregate the
    changeset per key first): a duplicate source key would multiply
    matched target rows, the same condition for which SQL MERGE raises
    its multiple-source-match error.
    """
    out_cols = target.columns
    missing = [c for c in out_cols if c not in keys and c not in when_not_matched]
    if missing:
        raise ValueError(
            f"when_not_matched must define every non-key target column; "
            f"missing: {missing}"
        )
    settable = set(out_cols) - set(keys)
    unknown = (set(when_matched) | set(when_not_matched)) - settable
    if unknown:
        # a typo'd column name must fail loudly, not become a silent
        # no-op update (the matched branch falls back to t.<col> for any
        # column the mapping doesn't mention)
        raise ValueError(
            f"merge mappings name columns that are not settable target "
            f"columns: {sorted(unknown)}"
        )
    keys = list(keys)
    t, s = target.alias("t"), source.alias("s")
    key_cond = None
    for k in keys:
        c = F.col(f"t.{k}") == F.col(f"s.{k}")
        key_cond = c if key_cond is None else (key_cond & c)

    untouched = target.join(source.select(*keys), on=keys, how="left_anti")

    updated = t.join(s, on=key_cond, how="inner").select(
        *[
            (
                F.col(f"t.{c}")
                if c in keys
                else when_matched.get(c, F.col(f"t.{c}"))
            ).alias(c)
            for c in out_cols
        ]
    )

    # keys present in both sides — bounded by |source|, so it broadcasts
    # into the insert-branch anti join no matter how big the target is
    matched_keys = t.join(s, on=key_cond, how="inner").select(
        *[F.col(f"t.{k}").alias(k) for k in keys]
    )
    inserted = (
        source.join(F.broadcast(matched_keys), on=keys, how="left_anti")
        .alias("s")
        .select(
            *[
                (
                    F.col(f"s.{c}") if c in keys else when_not_matched[c]
                ).alias(c)
                for c in out_cols
            ]
        )
    )
    return untouched.unionByName(updated).unionByName(inserted)
