"""Registry-wide physical-plan inventory.

Builds every registered query's DataFrame against a chosen sf_dir and
records the plan features that matter at 100 TB — exchange count,
join strategies, Python evaluation nodes, cartesian products,
nested-loop joins, rank pushdown, top-k — into PLAN_AUDIT.json. The
pytest plan pins assert per-query invariants; this artifact is the
whole-registry sweep a reviewer can diff round-over-round without
re-running anything.

Notes on reading it:
  * proof-tier lifecycle rows (snapshot demos, incremental folds)
    EXECUTE work while building, and several checkpoint their result —
    a checkpointed plan reads as a bare scan (exchanges=0); the
    interesting plan ran before the checkpoint and is pinned by the
    operator's own pytest instead.
  * BroadcastNestedLoopJoin appears only where the build side is
    broadcast-small by construction (top-k probe sets, centroid
    codebooks, 1-row scalar frames) — the same allowlist
    tests/test_plans.py enforces.

Usage: python tools/plan_audit.py [sf_dir] [out_path]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FEATURES = (
    "Exchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "WindowGroupLimit",
    "TakeOrderedAndProject",
    "WholeStageCodegen",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "PLAN_AUDIT.json",
        )
    )
    import __spark_entry__ as entry
    from airflow_iceberg_pipeline_stock_tracker_spark.session import get_spark

    spark = get_spark()
    audit: dict[str, dict] = {}
    failures: list[str] = []
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 - inventory must be total
            failures.append(f"{name}: {type(e).__name__}: {e}")
            continue
        row = {feat: plan.count(feat) for feat in FEATURES}
        row["pushed_filters"] = "PushedFilters: [" in plan and (
            "PushedFilters: []" not in plan
        )
        audit[name] = row
        print(
            f"{name:34s} exch={row['Exchange']:2d} "
            f"bhj={row['BroadcastHashJoin']} smj={row['SortMergeJoin']} "
            f"nlj={row['BroadcastNestedLoopJoin']} "
            f"cart={row['CartesianProduct']} "
            f"py={row['BatchEvalPython'] + row['ArrowEvalPython']}",
            file=sys.stderr,
        )
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(audit),
        "n_failures": len(failures),
        "failures": failures,
        "totals": {
            "cartesian_products": sum(
                r["CartesianProduct"] for r in audit.values()
            ),
            "python_eval_queries": sorted(
                n
                for n, r in audit.items()
                if r["BatchEvalPython"]
                + r["ArrowEvalPython"]
                + r["MapInPandas"]
                + r["FlatMapGroupsInPandas"]
                > 0
            ),
            "nested_loop_queries": sorted(
                n
                for n, r in audit.items()
                if r["BroadcastNestedLoopJoin"] > 0
            ),
        },
        "queries": audit,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(json.dumps({k: summary[k] for k in ("n_queries", "n_failures")}))
    print(json.dumps(summary["totals"], indent=1), file=sys.stderr)
    return 0 if not failures else 1


if __name__ == "__main__":
    raise SystemExit(main())
