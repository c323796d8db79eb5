"""Testdata schema-drift probe.

Round 3 lost 8 correctness rows, 7 tests, and the whole bench to ONE
silent fixture regeneration (`events.ts` drifted TIMESTAMP(NANOS) ->
timestamp[us]). This probe pins the expected physical schema of every
driver-provided table and fails fast WITH THE DRIFTED COLUMN NAMED, so
the next regeneration costs one clear assertion instead of a round.

Checks are pyarrow-level (footer metadata only — no Spark session, no
data read), so bench.py can afford to run this before its first query.

Where the loader is deliberately dtype-robust (events.ts handles both
the legacy nanos-as-long surface and timestamp[us], tables.py:23-38),
the probe accepts exactly that set of variants and no more.
"""

from __future__ import annotations

import os

# table -> column -> set of acceptable pyarrow type strings
EXPECTED: dict[str, dict[str, set[str]]] = {
    "region": {"r_regionkey": {"int32"}, "r_name": {"string", "large_string"}},
    "nation": {
        "n_nationkey": {"int32"},
        "n_name": {"string", "large_string"},
        "n_regionkey": {"int32"},
    },
    "customer": {
        "c_custkey": {"int64"},
        "c_name": {"string", "large_string"},
        "c_nationkey": {"int32"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string", "large_string"},
    },
    "supplier": {
        "s_suppkey": {"int64"},
        "s_name": {"string", "large_string"},
        "s_nationkey": {"int32"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"int64"},
        "p_name": {"string", "large_string"},
        "p_brand": {"string", "large_string"},
        "p_type": {"string", "large_string"},
        "p_size": {"int32"},
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_orderstatus": {"string", "large_string"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp[us]", "timestamp[ns]", "date32[day]"},
        "o_orderpriority": {"string", "large_string"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_partkey": {"int64"},
        "l_suppkey": {"int64"},
        "l_linenumber": {"int32"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string", "large_string"},
        "l_linestatus": {"string", "large_string"},
        "l_shipdate": {"timestamp[us]", "timestamp[ns]", "date32[day]"},
    },
    "events": {
        "event_id": {"int64"},
        # the two variants tables.py's loader handles; anything else is drift
        "ts": {"timestamp[us]", "timestamp[ns]", "int64"},
        "user_id": {"int64"},
        "event_type": {"string", "large_string"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "lang": {"string", "large_string"},
        "source": {"string", "large_string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>", "list<item: float>"},
        "label": {"int32"},
    },
}


class SchemaDriftError(AssertionError):
    pass


def check_sf_dir(sf_dir: str) -> None:
    """Raise SchemaDriftError naming every drifted/missing column in sf_dir."""
    import pyarrow.parquet as pq

    problems: list[str] = []
    for table, cols in EXPECTED.items():
        path = os.path.join(sf_dir, f"{table}.parquet")
        if not os.path.exists(path):
            problems.append(f"{table}: file missing ({path})")
            continue
        schema = pq.read_schema(path)
        present = {f.name: str(f.type) for f in schema}
        for col, allowed in cols.items():
            if col not in present:
                problems.append(f"{table}.{col}: column missing")
            elif present[col] not in allowed:
                problems.append(
                    f"{table}.{col}: dtype drifted to {present[col]!r} "
                    f"(expected one of {sorted(allowed)})"
                )
    if problems:
        raise SchemaDriftError(
            "TESTDATA schema drift detected in "
            + sf_dir
            + " — fix the loaders/oracles before trusting any result:\n  "
            + "\n  ".join(problems)
        )
