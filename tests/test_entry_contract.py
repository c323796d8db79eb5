"""Driver-contract invariants for __spark_entry__.py.

The driver hash-checks only the first CHECKED_BUDGET registered queries
(CORRECTNESS_r03 proved how silently coverage can fall out), so the
sweep order is a managed budget. These tests make its invariants
executable — no Spark session needed, queries()/oracle_sql() only build
dicts.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

# rows whose result is inherently un-oracle-able (documented per-case in
# the query docstrings); everything else must carry a SQL twin. Empty
# since r5: pipeline_daily_run's bars are a pure sha256 function of
# (ticker, ds), so even the full backfill has a SQL twin now.
ROWS_ONLY_OK: set[str] = set()


def test_checked_prefix_is_exactly_the_budget():
    assert len(entry.SWEEP_CHECKED) == entry.CHECKED_BUDGET
    assert len(set(entry.SWEEP_CHECKED)) == entry.CHECKED_BUDGET


def test_sweep_order_is_checked_plus_tail_no_dupes():
    assert entry.SWEEP_ORDER == entry.SWEEP_CHECKED + entry.SWEEP_TAIL
    assert len(set(entry.SWEEP_ORDER)) == len(entry.SWEEP_ORDER)


def test_registration_order_puts_checked_prefix_first():
    names = list(entry.queries())
    assert names[: entry.CHECKED_BUDGET] == entry.SWEEP_CHECKED


def test_every_query_is_oracle_paired_or_documented_rows_only():
    qs = set(entry.queries())
    oracles = entry.oracle_sql()
    unpaired = {n for n in qs if n not in oracles} - ROWS_ONLY_OK
    assert not unpaired, f"queries with no oracle and no waiver: {sorted(unpaired)}"
    orphans = set(oracles) - qs
    assert not orphans, f"oracles for unregistered queries: {sorted(orphans)}"


def test_new_operators_are_inside_the_checked_prefix():
    # the r4 lesson: new operators must not ship driver-unchecked.
    # Pins the CURRENT round's first-round-checked set: the three r7-new
    # operators plus the eight never-driver-checked tail rows and six
    # one-round q-rows rotated in per the r6 judge's top ask (funded by
    # demoting the 2-round-green r5/r6 rows and, on the judge's explicit
    # direction, the one-round finance/anomaly/rfm/transitions rows).
    promoted = {
        # r7-new, first round
        "multimodal_decode_real",
        "text_bm25_search",
        "events_ewma",
        "text_bpe_train",
        "events_quantile_sketch",
        "text_bpe_tokenize",
        "dedup_graph_stats",
        "events_snapshot_sink_parity",
        "curation_importance_weights",
        "similarity_mmr_rerank",
        "similarity_hard_negatives",
        "prices_snapshot_incremental",
        # never-driver-checked tail rows getting their first real round
        "events_sketch_reagg",
        "events_json_props",
        "curation_mixture_sample",
        "similarity_knn_graph",
        "events_hourly_corr",
        "parts_hierarchy_rollup",
        "events_heavy_hitters",
        "parts_name_linkage",
        # one-green-round q-rows getting their second
        "q8_market_share",
        "q9_product_profit",
        "q10_returned_items",
        "q12_late_lines",
        "q17_small_qty_revenue",
        "q19_disjunctive_preds",
    }
    assert promoted <= set(entry.SWEEP_CHECKED)


def test_budget_violation_raises_value_error_not_assert(monkeypatch):
    # must hold under `python -O` too, hence ValueError not assert
    monkeypatch.setattr(entry, "SWEEP_CHECKED", entry.SWEEP_CHECKED[:-1])
    monkeypatch.setattr(
        entry, "SWEEP_ORDER", entry.SWEEP_CHECKED[:-1] + entry.SWEEP_TAIL
    )
    with pytest.raises(ValueError, match="exactly 50"):
        entry.queries()


def test_unknown_name_raises_value_error(monkeypatch):
    monkeypatch.setattr(
        entry, "SWEEP_ORDER", entry.SWEEP_ORDER + ["no_such_query"]
    )
    with pytest.raises(ValueError, match="unknown"):
        entry.queries()
