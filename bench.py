"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": <sf>}

Each query is built fresh and driven to completion with a count-style
action (the driver's correctness gate does the value checking; here we
measure end-to-end plan execution including scan/shuffle/codegen).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "prices_standin",
    "dq_checks",
    "cumulate_rolling",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "topk_parts_per_brand",
    "customer_order_activity",
    "events_hourly",
    "events_sessionize",
    "order_priority_stats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "embedding_near_dup",
    "similarity_cosine_topk",
    "similarity_rp_lsh_topk",
    "text_language_id",
    "text_token_stats",
    "text_quality_score",
    "text_fingerprints",
    "multimodal_byte_stats",
    "multimodal_frame_sample",
    "multimodal_decode_features",
    "multimodal_resize",
    "cumulate_day",
    "pipeline_daily_run",
    "streaming_hourly_tumbling",
    "streaming_sessionize",
    "streaming_rolling_stateful",
    "streaming_event_dedup",
    "streaming_exact_dedup",
    "similarity_ivf_topk",
    "dedup_components",
    "dedup_keep_list",
    "events_type_totals_salted",
    "text_pack_shards",
    "multimodal_audio_chunks",
    "text_top_terms",
    "curation_contamination",
    "curation_stratified_sample",
    "curation_split",
    "curation_pii_scrub",
    "curation_corpus_verdict",
    "text_corpus_stats",
    "embedding_kmeans",
    # --- added after round 2 (keep appending; HEADLINE[:47] is the r2 set) ---
    "events_asof_join",
    "events_ohlc_bars",
    "events_ohlc_daily",
    "events_funnel",
    "events_retention",
    # --- added in round 4 ---
    "streaming_sliding_value",
    "pipeline_micro_batch_parity",
    "events_micro_batch_parity",
    "events_range_join",
    "events_sketch_accuracy",
    "streaming_interval_join",
    "streaming_chained_hourly",
    "similarity_pq_topk",
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "events_ohlc_incremental",
    # --- added in round 5 ---
    "similarity_ivfpq_topk",
    "dedup_repeated_spans",
    "layout_file_stats",
    "layout_zorder_stats",
    "q4_order_priority",
    "q13_customer_distribution",
    "q16_supplier_cnt",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "revenue_rollup",
    "returnflag_pivot",
    "customer_merge_upsert",
    "events_window_funcs",
    "events_user_set_ops",
    "events_user_trend",
    "layout_bucketed_join",
    "streaming_enriched_hourly",
    "streaming_merge_apply",
    "scd2_priority_intervals",
    "q7_nation_volume",
    "q15_top_supplier",
    "similarity_semantic_dedup",
    # --- TPC-H suite completion (late round 5) ---
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_part_value_conc",
    "q12_late_lines",
    "q19_disjunctive_preds",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    "events_gapfill",
    "events_time_range_window",
    "events_cube",
    "streaming_left_outer_join",
    "text_chunk_documents",
    "events_sketch_reagg",
    "events_json_props",
    "curation_mixture_sample",
    "similarity_knn_graph",
    "events_hourly_corr",
    "parts_hierarchy_rollup",
    "events_heavy_hitters",
    "parts_name_linkage",
    "prices_vwap",
    "prices_drawdown",
    "events_hourly_anomaly",
    "events_skew_profile",
    "customer_rfm",
    "prices_bollinger",
    "events_transitions",
    # --- added in round 6 ---
    "pipeline_schema_evolution",
    "lineitem_bloom_semi_join",
    "text_char_entropy",
    "prices_snapshot_time_travel",
    "graph_pagerank_trade",
    "text_lm_score",
    "events_rolling_distinct",
    # --- added in round 7 ---
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
    # --- added in round 9 ---
    "prices_rsi",
    "orders_market_basket",
    "events_pattern_match",
    "dedup_containment",
    "similarity_sq_topk",
    "text_gopher_rules",
    "text_tfidf_keywords",
    "multimodal_phash_neardup",
    "streaming_pattern_match",
    "orders_basket_rules",
    "prices_snapshot_wap",
    # registered earlier in r9 but missed by this list (found diffing
    # BENCH_DETAIL coverage against the registry — keep them in sync)
    "curation_repetition",
    "curation_source_overlap",
    # r9 second wave
    "prices_atr",
    "prices_stochastic",
    "parts_triangle_count",
    "events_decay_topk",
    "orders_abc_analysis",
    "events_decay_incremental",
    "events_holt_forecast",
    "events_attribution",
    "orders_cohort_ltv",
    "text_collocations",
    "multimodal_patch_grid",
    "events_conversion_lag",
    "prices_mor_deletes",
    "dedup_incremental_lsh",
    "prices_pair_corr",
    "prices_snapshot_metadata",
    "prices_pruned_scan",
    "events_top_paths",
    "events_twap",
    "prices_beta",
    # --- added in round 10 ---
    "prices_obv",
    "prices_partition_evolution",
    "prices_monthly_bars",
    "prices_golden_cross",
    "text_winnowing",
    "prices_macd",
    "parts_jaccard_similarity",
    "events_cusum",
    "orders_open_backlog",
    "prices_ichimoku",
    "events_cusum_incremental",
    "customer_purchase_cadence",
    "embedding_power_iteration",
    "prices_var_cvar",
    "events_growth_accounting",
    "prices_compaction",
    "text_source_drift",
    # --- added in round 11 ---
    "dedup_winnowing_pairs",
    "prices_donchian",
    "events_hourofweek_seasonality",
    "orders_ship_sla",
    "events_mad_anomaly",
    "events_burst_episodes",
    "dq_referential_integrity",
    "prices_heikin_ashi",
    "prices_snapshot_rollback",
    "events_hll_distinct",
    "events_hll_reagg",
    "events_hll_setops",
    "similarity_cluster_balance",
    # --- added in round 12 ---
    "streaming_hll_incremental",
    "prices_aroon",
    "events_kmv_distinct",
    "events_kmv_overlap",
    "events_cms_heavy_hitters",
    # --- added in round 13 ---
    "streaming_cms_incremental",
    "streaming_kmv_incremental",
    "parts_skyline",
    "dq_benford",
    "curation_weighted_sample",
    "dedup_edit_distance",
    "events_stl_decompose",
    "similarity_rrf_hybrid",
    "dedup_prefix_filter",
    "dq_profile",
    "curation_score_calibration",
    "orders_ivm_join",
    "curation_token_budget",
    "similarity_matryoshka_recall",
    "embedding_outlier_lof",
    "dq_mutual_information",
    "events_forecast_backtest",
    "prices_snapshot_expire",
    "events_changepoint",
    # --- r14 ---
    "dedup_prefix_filter_composed",
    "orders_ivm_delete",
    "dq_fd_violations",
    "similarity_semdedup",
    "text_classifier_score",
    "events_ab_cuped",
    "curation_ppl_buckets",
    "orders_ivm_outer",
    "prices_kalman",
    "events_holt_winters",
    "similarity_dup_groups",
    "events_survival_km",
    # --- r15 ---
    "dedup_edit_distance_composed",
    "text_classifier_train",
    "text_bpe_encode",
    # --- r16 ---
    "retrieval_rag_recall",
    "text_classifier_holdout",
    "text_bpe_encode_artifact",
    "retrieval_index_artifact",
]

# correctness artifacts, not throughput queries: parity proofs run two
# full pipelines and diff them; the incremental drain commits 4
# micro-batches by design. Their subtotal is reported separately so the
# operator-throughput trend isn't read through proof-harness cost.
PROOF_TIER = frozenset(
    {
        "pipeline_micro_batch_parity",
        "events_micro_batch_parity",
        "events_ohlc_incremental",
        "streaming_merge_apply",
        # 3-day backfill + ALTER TABLE + partition overwrite: table
        # lifecycle, not operator throughput
        "pipeline_schema_evolution",
        # two snapshot commits + two manifest-resolved reads; same class
        "prices_snapshot_time_travel",
        # stream drain through tagged snapshot commits + parity diff
        "events_snapshot_sink_parity",
        # 3 commits + 3 incremental folds; table lifecycle
        "prices_snapshot_incremental",
        # branch create/commit/audit/publish lifecycle; same class
        "prices_snapshot_wap",
        # positional/equality delete commits + delete-aware compaction;
        # table-lifecycle class
        "prices_mor_deletes",
        # 5-commit scripted history + per-snapshot metadata counts
        "prices_snapshot_metadata",
        # 4-commit lifecycle + pruned-vs-full parity diff
        "prices_pruned_scan",
        # 2 partitioned commits + 2 pruned probes + parity diffs;
        # table-lifecycle class
        "prices_partition_evolution",
        # 5-commit day-chunked state-ring fold; table-lifecycle class
        "events_decay_incremental",
        # 4-commit 3-int-state CUSUM fold; same class
        "events_cusum_incremental",
        # 3 commits + plan + bin rewrite + replan; table-lifecycle class
        "prices_compaction",
        # 4 commits + ref move + audit reads; table-lifecycle class
        "prices_snapshot_rollback",
        # full stream drain + per-batch register commits + register-
        # level parity vs the one-pass build; table-lifecycle class
        "streaming_hll_incremental",
        # same drain-and-prove class for the CMS/KMV sinks (r13)
        "streaming_cms_incremental",
        "streaming_kmv_incremental",
    }
)

# batch/stream diff-proofs: each runs two full pipelines and diffs them —
# a correctness artifact whose cost is dominated by table lifecycle, not
# a throughput query. Benched once (no steady-state second pass).
RUN_ONCE = frozenset(
    {
        "pipeline_micro_batch_parity",
        "events_micro_batch_parity",
        # table-lifecycle-dominated drain; one measured pass
        "events_ohlc_incremental",
        # 4-commit CDC merge fold + per-batch table rotation; same class
        "streaming_merge_apply",
        # full backfill + evolution DDL chain; same class
        "pipeline_schema_evolution",
        # snapshot lifecycle demo; same class
        "prices_snapshot_time_travel",
        # full stream drain + parity diff; one measured pass
        "events_snapshot_sink_parity",
        # snapshot lifecycle + per-commit folds; one measured pass
        "prices_snapshot_incremental",
        # branch lifecycle proof; one measured pass
        "prices_snapshot_wap",
        # 5-commit fold with per-commit checkpoints; one measured pass
        "events_decay_incremental",
        # 4-commit O(1)-state fold; one measured pass
        "events_cusum_incremental",
        # maintenance lifecycle proof; one measured pass
        "prices_compaction",
        # rollback lifecycle proof; one measured pass
        "prices_snapshot_rollback",
        # partition-evolution lifecycle proof; one measured pass
        "prices_partition_evolution",
        # stream drain + register parity proof; one measured pass
        "streaming_hll_incremental",
        # stream drain + counter/sample parity proofs; one measured pass
        "streaming_cms_incremental",
        "streaming_kmv_incremental",
    }
)


# the 47 queries benched in round 2 (BENCH_r02.json), frozen for
# round-over-round subtotal comparison — append new queries to the END
# of HEADLINE so this slice keeps naming exactly the r2 set
R2_COMMON_SET = frozenset(HEADLINE[:47])

# ---------------------------------------------------------------------------
# scale trend: the sf0.1 point proves nothing about the growth curve the
# "survives 100x" claims rest on. These queries are single-fact-table
# plans (so a 10x slice of that one table scales their input 10x without
# breaking join selectivity against unscaled dimensions); each is timed
# at 1x and at a deterministic 10x replica slice and the sec-per-input-row
# at both sizes is recorded in BENCH_DETAIL.json. Near-constant
# sec-per-row across the decade = the plan scales linearly.
# ---------------------------------------------------------------------------
SCALE_TREND = {
    # query -> the fact table that drives its input size
    "q1_pricing_summary": "lineitem",
    "events_hourly_corr": "events",
    "events_sessionize": "events",
    "events_transitions": "events",
    "events_heavy_hitters": "events",
    "events_ewma": "events",
    # LLM tier: documents replicas keep the same closed vocabulary, so
    # LM training tables stay vocab-bounded while scoring input grows
    # 10x — exactly the at-scale shape claim these ops make
    "text_bm25_search": "documents",
    "text_lm_score": "documents",
    # dedup tier (r8 ask): replicas are EXACT duplicates of the base
    # docs, so a 10x corpus has 10-member duplicate groups — realistic
    # crawl-scale shape. dedup_exact stays linear (hash groupBy);
    # minhash-LSH's banded buckets grow to 10 members, so its CANDIDATE
    # PAIR output grows ~45x while input grows 10x — time is read
    # against out_rows for these, not input rows
    "dedup_exact": "documents",
    "dedup_minhash_lsh": "documents",
    # ANN tier (r8 ask): brute-force top-k is linear in corpus size by
    # construction; IVF probes a fixed fraction of cells and should
    # grow sublinearly in wall time at fixed query count
    "similarity_cosine_topk": "embeddings",
    "similarity_ivf_topk": "embeddings",
    # r9 rows: the wordcount-shaped keyword extractor (the one text op
    # that shuffles the token stream) and the per-user sequence matcher
    "text_tfidf_keywords": "documents",
    "events_pattern_match": "events",
    # r9 second wave: decayed leaderboard (map-combinable agg whose 2^k
    # weights need no rescan), last-touch attribution (as-of union
    # window, linear per key), Holt fold (replica users keep series
    # length constant — state per key flat while keys grow 10x), and
    # ABC (fact input 10x against a CONSTANT part dimension, so the
    # global-window stage runs on an unchanged |parts| rollup)
    "events_decay_topk": "events",
    "events_attribution": "events",
    "events_holt_forecast": "events",
    "orders_abc_analysis": "lineitem",
    # r10 rows: winnowing is the purest linear citizen in the repo
    # (per-row array selection, zero shuffle — its sec/row SHOULD be
    # flat), and CUSUM's state is bounded by the TIME RANGE per type
    # (replica events land in the same hours, so the window stage runs
    # on an unchanged types-by-hours table while the pre-aggregate
    # absorbs 10x the input map-side)
    "text_winnowing": "documents",
    "events_cusum": "events",
    # r11 rows (r10 verdict ask #4): the six fact-table-driven r10
    # operators that had no trend evidence
    "parts_jaccard_similarity": "lineitem",
    "text_source_drift": "documents",
    "embedding_power_iteration": "embeddings",
    "events_growth_accounting": "events",
    "orders_open_backlog": "orders",
    "customer_purchase_cadence": "orders",
    # r11 rows: the new fact-table operators ship WITH trend evidence
    # (the r10 verdict's ask #4 applied proactively)
    "events_hourofweek_seasonality": "events",
    "events_mad_anomaly": "events",
    "events_burst_episodes": "events",
    "orders_ship_sla": "orders",
    "dq_referential_integrity": "lineitem",
    "dedup_winnowing_pairs": "documents",
    "events_hll_distinct": "events",
    "events_hll_setops": "events",
    # r12 rows (r11 verdict ask #4): the two r11 ops with no trend
    # attribution of their own
    "events_hll_reagg": "events",
    "similarity_cluster_balance": "embeddings",
    # r12 new sketch rows ship WITH trend evidence
    "events_kmv_distinct": "events",
    "events_cms_heavy_hitters": "events",
    # r13 rows (r12 verdict ask #4): the remaining r12 rows with no
    # trend attribution of their own. prices_aroon is EXEMPT like every
    # other prices_* row: prices are pipeline-generated bars (5 tickers
    # x a bounded date range from the REST-source fixture), not a
    # fact-table input that _build_scale_dir can replicate — the
    # per-ticker window math is the same class as macd/ichimoku/donchian
    # whose at-scale stance is documented in operators/finance.py
    # (state bounded by TIME, not by data volume).
    "events_kmv_overlap": "events",
    "events_quantile_sketch": "events",
    "streaming_hll_incremental": "events",
    # r13 new sinks ship WITH trend evidence
    "streaming_cms_incremental": "events",
    "streaming_kmv_incremental": "events",
    # r13 wave 2-4 operators ship WITH trend evidence. parts_skyline is
    # EXEMPT: part is a dimension table _build_scale_dir deliberately
    # keeps constant (replica facts reference the same catalog), so
    # there is no honest 10x input for it — its at-scale stance is the
    # collapse-to-|brand x price| groupBy documented in
    # operators/skyline.py, the same dimension-bounded class as
    # parts_hierarchy_rollup
    "dq_benford": "lineitem",
    "events_stl_decompose": "events",
    "curation_weighted_sample": "documents",
    "dedup_edit_distance": "documents",
    "similarity_rrf_hybrid": "documents",
    # dedup_prefix_filter is EXEMPT after its r13 measured point: at
    # 10x (exact-duplicate replicas -> 10-member groups) TRUE J>=1/2
    # pairs grow 978.9x and EXACT RECALL means output must follow —
    # measured 6.30s at 1x / 504.8s at 10x (time_ratio 80.1 vs
    # out_ratio 978.9: per-OUTPUT-PAIR cost IMPROVED ~12x). The figures
    # live in the committed r13 BENCH_DETAIL; re-paying ~8.5 min per
    # bench run to re-prove output-bound growth buys nothing — the
    # same exact-recall geometry stays covered per-run by
    # dedup_edit_distance's 10x row (time 23.2x vs out 979x)
    "dq_profile": "lineitem",
    "curation_score_calibration": "documents",
    # r13 wave 7 ships WITH trend evidence: IVM's whole point is the
    # at-scale claim (delta terms + base probe, never base x base), and
    # the token budget collapses to a |sources|-row waterfill
    "orders_ivm_join": "lineitem",
    "curation_token_budget": "documents",
    "similarity_matryoshka_recall": "embeddings",
    "embedding_outlier_lof": "embeddings",
    # r14: the duplicate-collapse re-promotion ships WITH trend
    # evidence — the r13 verdict's `weak` was exactly this row's shape
    # (10x exact-duplicate replicas -> 10-member groups saturating the
    # band buckets), so the collapsed plan's time_ratio at 10x IS the
    # fix's receipt
    "similarity_knn_graph": "embeddings",
    # r14 (r13 verdict ask #5): the composed PPJoin's whole claim is
    # the 10x duplicate-saturated point — the rep join runs at base
    # size and only the arithmetic expansion tracks the 978.9x output
    "dedup_prefix_filter_composed": "documents",
    # r15 (r14 verdict ask #1): the composed edit-distance's whole
    # claim is the 10x duplicate-saturated point — the DP join runs at
    # distinct-(pfx,len) size and the C(k,2) within-group pairs become
    # expansion-only work (vs the direct row's 18.14x capped-pair
    # plateau). The direct row stays in the trend table above for the
    # side-by-side read, with its cap-recall sweep attached
    "dedup_edit_distance_composed": "documents",
    # r15 wave 2: classifier training is T map-combinable gradient
    # aggregates over a |buckets|-bounded weight state; BPE encoding is
    # the vocab-bounded broadcast join + per-word explode (output
    # linear in corpus tokens by definition)
    "text_classifier_train": "documents",
    "text_bpe_encode": "documents",
    # r16: the retrieval capstone — chunk volume (and so index size
    # and per-query candidate volume) scales with the corpus while the
    # query panel, cells, and codebooks stay fixed; the brute-force
    # GRADER is panel x corpus, linear by construction
    "retrieval_rag_recall": "documents",
    # r16: holdout eval rides the minhash pair graph (LSH-bounded) +
    # classifier_train's Gram aggregates restricted to the train fold +
    # a 3-row rollup — every stage linear or vocabulary/bucket-bounded
    "text_classifier_holdout": "documents",
    # r16: artifact encode — training is vocab-bounded like bpe_encode;
    # the ENCODE half under the pinned artifact is the at-scale claim
    # (merge replay on distinct words + broadcast joins, corpus streams
    # once)
    "text_bpe_encode_artifact": "documents",
    # r16: index-artifact round-trip — build+write scales with chunk
    # volume; the serving query's only corpus-scale relation is the
    # codes table, cell-pruned through an equi-join (pure JVM)
    "retrieval_index_artifact": "documents",
    # r14 wave 1: both lineitem-driven (the 10x dir replicates orders
    # with the join-consistent orderkey stride, so the retraction term
    # and the recompute oracle both scale honestly)
    "orders_ivm_delete": "lineitem",
    "dq_fd_violations": "lineitem",
    # r14 wave 2: semdedup rides the collapsed band join + the
    # train-small/score-big kmeans; the classifier is a one-scan
    # projection + map-combinable per-doc sum
    "similarity_semdedup": "embeddings",
    "text_classifier_score": "documents",
    # r14 wave 3: CUPED is two map-combinable aggregates (per-user,
    # then 2-row arms); ppl_buckets rides lm_score's corpus-count
    # joins + one per-source window
    "events_ab_cuped": "events",
    "curation_ppl_buckets": "documents",
    # r14 wave 4: the outer-join IVM is lineitem-class (orders
    # replicate join-consistently in the 10x dir); prices_kalman is
    # EXEMPT like every prices_* row (pipeline-generated bars, state
    # bounded by TIME — the documented finance-tier class)
    "orders_ivm_outer": "orders",
    # r14 wave 5: HW is two map-combinable aggregates + a per-type
    # fold bounded by TIME; dup_groups is one value-keyed exchange
    "events_holt_winters": "events",
    "similarity_dup_groups": "embeddings",
    "events_survival_km": "events",
    "dq_mutual_information": "lineitem",
    "events_forecast_backtest": "events",
    # prices_snapshot_expire is EXEMPT like every prices_* lifecycle
    # row (pipeline-generated bars, not fact-table input); its at-scale
    # claim is structural — vacuum touches manifests + unreachable dirs
    # only, never data proportional to table size
    "events_changepoint": "events",
}
SCALE_FACTOR = 10

# r16 (r15 verdict ask #6): trend rows whose DIRECT plan was demoted to
# the registry tail and superseded by a registered composed successor.
# They stay in the trend table for the side-by-side read (the plateau
# is real and worth re-measuring), but the one-number headline must not
# report a demoted row as the registry's production worst — the
# summary emits scale_trend_production_worst computed over the
# non-superseded rows alongside the raw max.
TREND_SUPERSEDED = {
    # direct blocked-Levenshtein (capped-pair plateau ~18x) -> the
    # composed cap->collapse->rep-DP path (~1.3x, cap-insensitive)
    "dedup_edit_distance": "dedup_edit_distance_composed",
}

# reading guide for trend rows whose time_ratio needs context beyond
# input_ratio — printed into BENCH_DETAIL.json verbatim
SCALE_TREND_NOTES = {
    "retrieval_rag_recall": (
        "end-to-end pipeline: chunk+embed (one scan), 2 training passes, "
        "1 scoring pass, and the panel x corpus brute-force GRADER — all "
        "linear in chunk volume at fixed panel/cells/codebooks. The "
        "grader exists to certify recall; a serving deployment runs it "
        "on a sampled panel exactly like this, so its linear cost is "
        "the honest at-scale shape, not overhead to optimize away"
    ),
    "similarity_ivf_topk": (
        "linear term is the ASSIGNMENT pass (nlist=16 dots/vector), which "
        "at n_queries=10 exceeds brute-force's 10 query dots/vector; IVF "
        "amortizes once queries >> nlist — per-query candidate work is "
        "nprobe/nlist = 1/4 of the corpus vs brute-force's full scan. "
        "DEMONSTRATED at the 'ivf_amortization' point in this file: same "
        "10x corpus, n_queries=256, IVF's absolute sec beats brute-force"
    ),
    "similarity_cosine_topk": (
        "brute-force baseline: by construction linear in corpus at fixed "
        "query count (10 dots/vector); the number to beat for ANN rows"
    ),
    "dedup_minhash_lsh": (
        "replicas are exact duplicates, so CANDIDATE PAIR output grows "
        "~C(10,2)x per duplicate group while input grows 10x — read "
        "time against out_ratio, not input_ratio"
    ),
    "parts_jaccard_similarity": (
        "pair fan-out is C(basket,2) per order — bounded by basket "
        "size (<= C(7,2)), so candidate pairs grow LINEARLY with "
        "orders, never quadratically. Replica orders reuse the SAME "
        "part dimension, so per-pair co-support grows 10x while the "
        "distinct-pair key space stays flat: the pair aggregate "
        "absorbs the 10x map-side (partial agg), out stays top-20"
    ),
    "text_source_drift": (
        "profile is a map-combinable groupBy to |sources| x 60 bit "
        "rows; the pairwise drift join is over the PROFILE (dimension-"
        "scale), so 10x docs only widen the map-side counting pass"
    ),
    "embedding_power_iteration": (
        "each iteration is one map-only projection + one 64-row-per-"
        "partition reduce; driver state is O(dim). Int64 overflow "
        "bound |S| <= rows*dim*PSCALE^2*VSCALE holds to ~1.4e7 rows "
        "per reduce (documented in the operator)"
    ),
    "events_growth_accounting": (
        "replica users are disjoint populations, so every weekly "
        "class count grows ~10x while the week spine is calendar-"
        "bounded; the lag window partitions by user (state = one "
        "prior week per user)"
    ),
    "orders_open_backlog": (
        "interval-stabbing rewrite: 10x orders emit 10x difference-"
        "array events, but the global running-sum window still runs "
        "over ONE row per DATE (calendar-bounded), so the only stage "
        "that grows is the linear open/close aggregation"
    ),
    "customer_purchase_cadence": (
        "replica customers are disjoint, so groups grow 10x while "
        "per-group state stays orders-per-customer; out_ratio tracks "
        "the 10x customer dimension by construction"
    ),
    "events_hourofweek_seasonality": (
        "one map-combinable groupBy collapses the fact table to "
        "<= |types| x 168 rows; out_ratio 1.0 by construction"
    ),
    "events_mad_anomaly": (
        "replica events land in the SAME hours, so hourly counts, the "
        "median, and the MAD all scale by exactly 10 — the flag rule "
        "abs_dev > 3*mad is scale-equivariant, so out_ratio 1.0 is "
        "itself evidence; only the first aggregate widens at 10x"
    ),
    "events_burst_episodes": (
        "same shape: the islands logic runs on the calendar-bounded "
        "hourly table; replicas scale counts and the mean together, so "
        "the qualifying set (n*h > 2t) is IDENTICAL at 10x — out_ratio "
        "1.0 is itself evidence the test is scale-invariant"
    ),
    "orders_ship_sla": (
        "the orderkey join grows 10x both sides (co-partitioned); the "
        "histogram and every percentile stage are bounded by "
        "|priorities| x |lag domain| — out stays 5 rows"
    ),
    "dq_referential_integrity": (
        "six independent anti-join/groupBy scans, each linear; output "
        "is always 6 rows. customer replicates with orders' 10^7 "
        "custkey stride (r11 advice), so every replica repeats the "
        "base data's defect profile 10x — anti-join selectivity is "
        "genuinely scale-invariant, not orphan-dominated"
    ),
    "dedup_winnowing_pairs": (
        "replicas are EXACT duplicates, so every fingerprint's posting "
        "list grows 10x and candidate pairs grow ~C(10,2)x per base "
        "near-dup group — the minhash_lsh out_ratio caveat applies, "
        "but the surfaced top-k stays 50 rows and hot fingerprints "
        "hit the bucket cap instead of exploding the join; "
        "cap_sweep_sec_10x below times caps 50/200/800 on the SAME "
        "10x corpus — runtime tracks the cap at fixed corpus, which "
        "is the cap-bounds-the-join claim measured. r13: the sweep "
        "also reports what the cap COSTS — near-dup (resemblance "
        ">= 0.5) recall per cap on both corpora, with the metric's "
        "construction documented in _winnow_cap_sweep"
    ),
    "events_hll_distinct": (
        "replica users are DISJOINT, so true distincts grow 10x while "
        "the register table stays <= |types| x 256 rows — the sketch's "
        "whole point; the exact COUNT(DISTINCT) grader is the only "
        "stage that scales with users"
    ),
    "events_hll_setops": (
        "all pair algebra runs on |types|^2 x 256 register rows at any "
        "SF; the exact-union grader's (pair, user) distinct is the one "
        "user-scale stage, present only to grade the sketch"
    ),
    "events_hll_reagg": (
        "the merge-vs-onepass register proof: BOTH register builds are "
        "map-combinable groupBys, and the daily-register table the "
        "merge runs on stays <= |types| x days x 256 rows while events "
        "grow 10x (replica events land on the SAME days) — out_ratio "
        "1.0 and a flat register table are the mergeability claim "
        "itself"
    ),
    "events_kmv_distinct": (
        "the bottom-k sketch shuffles O(types x k) rows at any SF "
        "(WindowGroupLimit partial top-k before the exchange); the "
        "exact COUNT(DISTINCT) grader is the one user-scale stage — "
        "replica users are disjoint, so true distincts grow 10x while "
        "the sample stays k rows per type"
    ),
    "events_cms_heavy_hitters": (
        "the counter table is <= 4 x 1024 rows at any SF "
        "(map-combinable build; the explode widens map-side rows by "
        "depth, never the shuffle); the exact top-20 grader is the one "
        "per-item stage. Replica users are disjoint, so per-item "
        "counts stay FLAT while the item domain grows 10x — out stays "
        "20 rows"
    ),
    "similarity_cluster_balance": (
        "exact k-means assignment is the one corpus-scale stage "
        "(replica vectors are exact duplicates, so the centroids are "
        "identical); the md5-rank quota is a WindowGroupLimit that "
        "caps output at k_clusters x quota BEFORE the exchange, so "
        "out stays flat (out_ratio -> 1.0 once every cluster "
        "saturates its quota) while input grows 10x"
    ),
    "events_kmv_overlap": (
        "the pair algebra runs on O(|types|^2 x k) SKETCH rows at any "
        "SF (each type's sample is bottom-k, WindowGroupLimit before "
        "the exchange), so the corpus is touched exactly once to build "
        "the samples; the exact-intersection grader's user equi-join "
        "is the one user-scale stage — replica users are disjoint, so "
        "true overlaps stay FLAT (same base users intersect) while "
        "unions grow 10x"
    ),
    "events_quantile_sketch": (
        "the re-planned (r12) BNLJ-free shape: one map-combinable "
        "groupBy collapses events to a <= |types| x 128 histogram "
        "(localCheckpointed once for its 3 consumers), the (lo,hi) "
        "scalar attaches once, q_pct is an exploded literal — every "
        "post-histogram stage is dimension-scale, so only the first "
        "aggregate widens at 10x; out stays |types| x |q_pcts| rows"
    ),
    "streaming_hll_incremental": (
        "per-micro-batch partial table is <= |types| x 256 register "
        "rows REGARDLESS of batch size (the map-combinable groupBy "
        "runs inside foreachBatch), so 10x events per batch widen "
        "only the map side; batch count is fixed by the 4-file "
        "source layout at both scales, state read back at render is "
        "batches x |types| x 256 rows, and the register-equality "
        "proof joins two dimension-scale tables. Timed via the trend "
        "protocol on a fresh checkpoint per pass (proof tier: "
        "includes stream startup/drain fixed cost both scales)"
    ),
    "streaming_cms_incremental": (
        "same sink shape as the HLL row with a <= 4 x 1024 pure-int "
        "counter partial per batch (map-combinable; the explode "
        "widens map-side rows by depth, never the shuffle); the "
        "SUM-merge render and the counter-equality proof both run on "
        "dimension-scale tables, so only the in-batch counting pass "
        "widens at 10x (proof tier: includes stream startup/drain "
        "fixed cost both scales)"
    ),
    "streaming_kmv_incremental": (
        "per-batch partial is <= |types| x 256 sample rows via "
        "WindowGroupLimit INSIDE foreachBatch (partial top-k before "
        "the exchange), so 10x events per batch widen only the "
        "per-batch hash/distinct pass; render distinct-unions "
        "batches x |types| x 256 stored rows and the sample-equality "
        "proof's one user-scale stage is the one-pass bottom_k "
        "grader (proof tier: includes stream startup/drain fixed "
        "cost both scales)"
    ),
    "dq_benford": (
        "one map-combinable groupBy collapses any lineitem volume to "
        "<= 9 digit rows; the window/chi-square math runs on those 9 "
        "rows — out_ratio 1.0 by construction, and because replicas "
        "repeat the base price distribution the per-digit frequencies "
        "are IDENTICAL at 10x (only counts scale)"
    ),
    "events_stl_decompose": (
        "the daily groupBy collapses events to |dates| rows (replicas "
        "land in the SAME dates, so the series length is constant and "
        "y scales by exactly 10); trend/seasonal/residual all run on "
        "that calendar-bounded series — out_ratio 1.0, and the "
        "unpartitioned window is over days, never events"
    ),
    "curation_weighted_sample": (
        "stateless keying projection + TakeOrderedAndProject: each "
        "task keeps k=25 rows, so the only 10x cost is the linear "
        "scan/pow pass; out stays 25 rows. Replica doc_ids hash to "
        "fresh u draws, so replicas compete fairly in the sample"
    ),
    "dedup_edit_distance": (
        "replicas are EXACT duplicates, so every 16-char-prefix block "
        "grows 10x and within-block pairs grow ~C(10,2)x per base "
        "group — the minhash_lsh out_ratio caveat applies; the "
        "per-block cap (64, deterministic doc_id order) bounds the "
        "DP join at CAP^2 per block no matter how duplicate-saturated "
        "the corpus, so time tracks the capped pair count, not the "
        "quadratic uncapped one"
    ),
    "similarity_rrf_hybrid": (
        "both rankers are linear passes at fixed query count (BM25: "
        "postings-only explode + broadcast df/scalars; cosine: "
        "broadcast 1-row query + TakeOrdered top-50); the fusion "
        "joins two <=50-row lists, so it is scale-INVARIANT by "
        "construction — time_ratio reads the two underlying scans"
    ),
    "dq_profile": (
        "r13 re-plan: skinny (col, surface) explode + pure-COUNT hash "
        "aggregate (map-combinable) replaced the SortAggregate-over-"
        "wide-Expand multi-distinct plan — 24.3s -> 3.4s warm at "
        "sf0.1; output is always 11 rows — out_ratio 1.0 by "
        "construction, null counts and totals scale by exactly 10"
    ),
    "curation_score_calibration": (
        "scoring is lm_score's proven linear plan (replica docs keep "
        "the closed vocabulary, so the bigram LM tables stay "
        "vocab-bounded); everything after runs on the (source, score) "
        "histogram — dimension-scale windows, out stays |sources| rows. "
        "Replicas repeat the base score distribution, so both "
        "thresholds and the kept/total RATIOS are identical at 10x"
    ),
    "orders_ivm_join": (
        "the DRIVER ROW times the whole algebra including rebuilding "
        "the base view (the part a production system has already "
        "materialized), so time_ratio reads the full-join rebuild — "
        "linear is the expected trend. The INCREMENTAL claim is "
        "structural: each delta term joins a delta against the other "
        "side with the delta broadcast, and refresh cost at 100 TB is "
        "those three terms plus one pruned base probe, never base x "
        "base; hash equality vs the full-recompute oracle proves the "
        "fold is safe under any partial-agg order (int64 cents)"
    ),
    "curation_token_budget": (
        "per-doc scoring is quality_score's single-scan projection "
        "(linear); the waterfill itself runs on the |sources|-row "
        "aggregate — the single-partition window the plan shows is "
        "over ~20 rows, a driver-sized plan table. Replicas multiply "
        "every source's tokens and weight by 10, so r_s ordering, the "
        "saturation split, and epochs are IDENTICAL at 10x — "
        "allocations scale by exactly 10"
    ),
    "similarity_matryoshka_recall": (
        "|dims| x the brute-force pass at fixed query count — linear "
        "in corpus by construction (the same baseline class as "
        "similarity_cosine_topk); per-(query,dim) top-k is a "
        "WindowGroupLimit. The ablation's at-scale point is to pick "
        "the smallest dim whose recall holds, then serve IVF/PQ there"
    ),
    "events_survival_km": (
        "two per-user aggregates absorb 10x input map-side (disjoint "
        "replica users -> 10x subjects); the survival fold runs on the "
        "step table, bounded by the OBSERVATION CALENDAR (<= horizon "
        "days rows) at any scale"
    ),
    "events_holt_winters": (
        "the (type, day) count aggregate absorbs 10x input map-side; "
        "the fold runs on a types-by-days table UNCHANGED at 10x "
        "(replica events land on the same days) — the events_cusum "
        "time-bounded class"
    ),
    "similarity_dup_groups": (
        "one exchange keyed by the embedding value: 10x exact replicas "
        "shuffle 10x rows but collapse to the SAME group table (gsize "
        "10x) — the histogram is |distinct sizes| rows"
    ),
    "orders_ivm_outer": (
        "the correction term is delta-custkey-sized (distinct + "
        "anti-join), the insert term joins the delta against the "
        "customer dimension, and the base view is already "
        "materialized — out_rows track |orders| + orderless customers "
        "by construction"
    ),
    "events_ab_cuped": (
        "per-user x/y counts are ONE map-combinable aggregate (10x "
        "disjoint replica users -> 10x groups, flat state per key); "
        "everything after runs on the 2-row arm table — out stays 2 "
        "rows at any scale"
    ),
    "curation_ppl_buckets": (
        "lm_score's bigram-count joins stay token-shaped (closed "
        "vocabulary on replicas, the text_lm_score class); the tercile "
        "window is one exchange per source; out stays |docs| rows"
    ),
    "similarity_semdedup": (
        "kmeans assignment is train-small/score-big (codebook collected "
        "at O(k x dim), scoring one numpy matmul per Arrow batch); pair "
        "mining is the r14 duplicate-collapsed band join, so the 10x "
        "exact-replica corpus keeps the rep join at base size; verdict "
        "table is one |V|-row left join"
    ),
    "text_classifier_score": (
        "tokenize + hash-bucket + weight are one narrow codegen "
        "projection (the weight table is an EXPRESSION, nothing "
        "shuffled); 10x docs widen only the map-combinable per-doc "
        "sum — the quality_score linear class"
    ),
    "orders_ivm_delete": (
        "the retraction term joins ONLY the deleted orders against "
        "lineitem (10x both sides, co-partitioned orderkey join); the "
        "merge + zero-filter run on the |custkeys| aggregate — same "
        "delta-term shape as orders_ivm_join's trend row"
    ),
    "dq_fd_violations": (
        "one scan fanned out |FD|x map-side; the (fd, x, y) joint and "
        "per-x maxima are map-combinable, so 10x rows widen the "
        "counting passes while the output stays |FD| rows — the "
        "orderkey-keyed FDs keep the intermediates fact-shaped but "
        "never collected"
    ),
    "dedup_prefix_filter_composed": (
        "exact-dedup first, PPJoin on distinct-set representatives, "
        "C(k,2) within-group pairs expanded arithmetically — output "
        "hash-IDENTICAL to the direct PPJoin (oracle IS the direct "
        "SQL; tests/test_r14_collapse.py pins it on the saturated "
        "corpus), so time_ratio here reads against the direct path's "
        "retired 80.1x (6.30s -> 504.8s, r13 BENCH_DETAIL): the join "
        "is distinct-set-bound and only the expansion tracks the "
        "978.9x pair output"
    ),
    "similarity_knn_graph": (
        "r14 duplicate-collapse plan (the r13 `weak`, closed): the "
        "band self-join runs on one representative per DISTINCT "
        "embedding value and fans edges back per group — candidate "
        "volume is quadratic in distinct values, LINEAR in duplicate "
        "multiplicity, so the 10x exact-replica corpus (10-member "
        "groups) leaves the rep join at BASE size and the expansion "
        "output-bound. EXACTNESS-preserving, not a cap: collapsed == "
        "direct pinned by tests/test_r14_collapse.py and the "
        "unchanged driver oracle. Deliberate 1x cost: the _dup_groups "
        "value-keyed exchange adds ~1.3s on a duplicate-FREE corpus "
        "(this row and embedding_near_dup read ~1.7x their r13 1x "
        "absolutes) — the price of flat scaling where the old plan "
        "was quadratic; the 100x deep point is the receipt"
    ),
    "embedding_outlier_lof": (
        "cost is the LSH-bucketed k-NN graph build — since r14 the "
        "duplicate-COLLAPSED plan (see similarity_knn_graph's row: "
        "rep-level band join, per-group fan-out, exactness-preserving)"
        " — so 10x exact-duplicate replicas no longer densify the "
        "buckets; the LOF algebra after it is three joins over the "
        "k-bounded edge set, |V| x k rows"
    ),
    "dq_mutual_information": (
        "one scan fans out 3x map-side (stack) and collapses to "
        "|pair| x |X| x |Y| joint rows; replicas repeat the base "
        "distribution so every joint count scales by exactly 10 and "
        "the entropies/MI are IDENTICAL at 10x — out_ratio 1.0 and "
        "value-identity are both evidence"
    ),
    "events_forecast_backtest": (
        "one map-combinable groupBy collapses events to the "
        "|dates| x |types| grid (calendar-bounded); replica events "
        "land on the same days, so daily counts scale by 10 and both "
        "models' MAPE is scale-invariant — only the first aggregate "
        "widens at 10x"
    ),
    "events_changepoint": (
        "same collapse-to-daily-grid shape: the candidate scan is one "
        "window pass over |dates| rows per type. Replica events scale "
        "every daily count by 10, so S and Q scale by 10 and 100, "
        "gain by exactly 100, and the ARGMAX SPLIT DAY is identical "
        "at 10x — out_ratio 1.0 plus split-day identity are the "
        "evidence"
    ),
    "dedup_edit_distance_composed": (
        "read against dedup_edit_distance's row on the SAME corpus: "
        "the 10x replicas saturate every block, so the direct path "
        "runs CAP^2 Levenshtein DPs per block (the 18.14x capped-pair "
        "plateau) while the composed path runs the DP once per "
        "distinct (pfx, len) pair and derives within-group pairs "
        "arithmetically — output pairs still grow with duplicate "
        "multiplicity (exact recall means they must), so time is read "
        "against out_rows, not input"
    ),
    "text_classifier_train": (
        "gradient factored through the Gram matrix: XtX (<= B^2 rows, "
        "B = CLF_TRAIN_BUCKETS = 64) and Xty are computed ONCE by "
        "map-combinable aggregates over the doc-feature rows; all T "
        "iterations are driver arithmetic on that fixed-size state — "
        "integer-identical to the per-doc spec because int64 sums "
        "commute. Only the one-scan feature build and the final "
        "scoring pass grow with the corpus; time_ratio reads that "
        "scan, the training state is corpus-size-free"
    ),
    "text_bpe_encode": (
        "the trained word->tokens map is VOCABULARY-bounded (replicas "
        "repeat the same words, so the merge loop state is unchanged "
        "at 10x) and broadcasts into the doc-side explode; output is "
        "the encoded token stream itself — linear in corpus tokens by "
        "definition, so out_ratio tracks input_ratio and time follows "
        "output"
    ),
}


def _build_scale_dir(spark, sf_dir: str) -> str:
    """Materialize a deterministic SCALE_FACTOR-x slice of the fact
    tables (events, lineitem) next to symlinks of everything else.

    Each replica i shifts the entity keys (user_id/event_id/l_orderkey)
    by a fixed stride so replicas are disjoint populations with the
    original's per-entity distribution — aggregate/session/window
    cardinality scales linearly, which is exactly the property the
    trend measurement needs. Reused across runs if already built
    (the construction is a pure function of the inputs).
    """
    import glob

    from pyspark.sql import functions as F

    base = os.path.basename(sf_dir.rstrip("/"))
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".scale_trend",
        f"{base}-x{SCALE_FACTOR}",
    )
    done_marker = os.path.join(out_dir, "_BUILT")
    marker_want = f"replicas={SCALE_FACTOR} v4-customer\n"
    if os.path.exists(done_marker):
        with open(done_marker) as f:
            if f.read() == marker_want:
                return out_dir
    if os.path.isdir(out_dir):
        # stale layout from an older build recipe: remove it wholesale so
        # no write can ever go THROUGH a leftover symlink into the
        # read-only testdata tree
        import shutil

        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    replicated = (
        "events.parquet",
        "lineitem.parquet",
        "documents.parquet",
        "embeddings.parquet",
        "orders.parquet",
        "customer.parquet",
    )
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)
        link = os.path.join(out_dir, name)
        if name not in replicated:
            if not os.path.exists(link):
                os.symlink(p, link)
    reps = spark.range(SCALE_FACTOR).withColumnRenamed("id", "rep")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    (
        ev.crossJoin(F.broadcast(reps))
        .withColumn("event_id", F.col("event_id") + F.col("rep") * F.lit(10**9))
        .withColumn("user_id", F.col("user_id") + F.col("rep") * F.lit(10**7))
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "events.parquet"))
    )
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    (
        li.crossJoin(F.broadcast(reps))
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("rep") * F.lit(10**9))
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "lineitem.parquet"))
    )
    # orders shares lineitem's orderkey stride so replica i's orders
    # join replica i's line items (open-backlog needs both sides);
    # custkey gets its own stride so replica customers are disjoint
    # populations (cadence groups grow linearly, per-group state flat)
    od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    (
        od.crossJoin(F.broadcast(reps))
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep") * F.lit(10**9))
        .withColumn("o_custkey", F.col("o_custkey") + F.col("rep") * F.lit(10**7))
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "orders.parquet"))
    )
    # customer shares orders' custkey stride so replica i's orders
    # reference replica i's customers — without this every replica order
    # is a custkey orphan and the referential-integrity trend row
    # measures a 90%-orphan anti-join instead of the base data's defect
    # profile repeated 10x (r11 advice)
    cu = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    (
        cu.crossJoin(F.broadcast(reps))
        .withColumn("c_custkey", F.col("c_custkey") + F.col("rep") * F.lit(10**7))
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "customer.parquet"))
    )
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    (
        docs.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(10**9))
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "documents.parquet"))
    )
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    (
        emb.crossJoin(F.broadcast(reps))
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * F.lit(10**9))
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "embeddings.parquet"))
    )
    with open(done_marker, "w") as f:
        f.write(marker_want)
    return out_dir


def _scale_trend(spark, sf_dir: str, queries, base_timings: dict) -> dict:
    """Time the SCALE_TREND queries at 1x and 10x input.

    The HEADLINE number per query is ``time_ratio`` read against
    ``input_ratio`` (r8 advice): raw sec-per-Mrow at these sizes is
    dominated by per-query fixed overhead (scheduling, codegen, plan
    setup) and reads as a misleading 3-12x "speedup" at 10x. The
    fixed-overhead-free rate is ``marginal_sec_per_mrow`` — the slope
    (t_10x - t_1x) / (rows_10x - rows_1x), i.e. the cost of each ADDED
    million rows, which is the number that extrapolates to 100 TB.
    ``out_rows`` at both scales is recorded because dedup-style
    operators legitimately produce superlinear OUTPUT on duplicate-heavy
    corpora (10-member duplicate groups emit ~45x the pairs); their time
    must be read against output growth, not input growth.
    """
    import time as _time

    big_dir = _build_scale_dir(spark, sf_dir)
    fact_rows = {}
    for tbl in sorted(set(SCALE_TREND.values())):
        import pyarrow.parquet as pq

        fact_rows[(tbl, "1x")] = pq.ParquetFile(
            os.path.join(sf_dir, f"{tbl}.parquet")
        ).metadata.num_rows
        fact_rows[(tbl, "10x")] = sum(
            pq.ParquetFile(p).metadata.num_rows
            for p in __import__("glob").glob(
                os.path.join(big_dir, f"{tbl}.parquet", "*.parquet")
            )
        )

    def _timed(fn, d):
        """min-of-2 wall time + output rows, same protocol both scales."""
        best, n = None, None
        for _ in range(2):
            t0 = _time.time()
            n = fn(spark, d).count()
            t = round(_time.time() - t0, 3)
            best = t if best is None else min(best, t)
        return best, n

    trend = {}
    for name, tbl in SCALE_TREND.items():
        fn = queries[name]
        t_small, n_small = _timed(fn, sf_dir)
        t_big, n_big = _timed(fn, big_dir)
        r_small = fact_rows[(tbl, "1x")]
        r_big = fact_rows[(tbl, "10x")]
        time_ratio = round(t_big / t_small, 2) if t_small else None
        marginal = (
            round((t_big - t_small) / ((r_big - r_small) / 1e6), 3)
            if r_big > r_small
            else None
        )
        trend[name] = {
            "fact_table": tbl,
            **({"note": SCALE_TREND_NOTES[name]} if name in SCALE_TREND_NOTES else {}),
            **(
                {"superseded_by": TREND_SUPERSEDED[name]}
                if name in TREND_SUPERSEDED
                else {}
            ),
            "input_ratio": round(r_big / r_small, 2),
            "time_ratio": time_ratio,
            "out_ratio": round(n_big / n_small, 2) if n_small else None,
            "marginal_sec_per_mrow": marginal,
            "rows_1x": r_small,
            "rows_10x": r_big,
            "out_rows_1x": n_small,
            "out_rows_10x": n_big,
            "sec_1x": t_small,
            "sec_10x": t_big,
        }
    return trend


IVF_AMORT_QUERIES = 256


def _ivf_amortization_point(spark, sf_dir: str) -> dict:
    """r9 verdict ask #4: the scale-trend note claims IVF amortizes its
    nlist-dot assignment pass only when queries >> nlist, but no benched
    point demonstrated it — at the trend's n_queries=10 IVF scales WORSE
    than brute force. This records the demonstration: brute-force cosine
    vs IVF on the SAME 10x corpus at n_queries=256 (>> nlist=16), where
    brute pays 256 query-dots per stored vector and IVF pays 16
    assignment-dots plus the nprobe-bounded candidate join. min-of-2
    wall timings, same protocol as the scale trend."""
    import time as _time

    from airflow_iceberg_pipeline_stock_tracker_spark.operators.similarity import (
        IVF_K,
        cosine_topk,
        ivf_topk,
    )

    big_dir = _build_scale_dir(spark, sf_dir)

    def _timed(fn):
        best = None
        for _ in range(2):
            t0 = _time.time()
            fn(spark, big_dir, n_queries=IVF_AMORT_QUERIES).count()
            t = round(_time.time() - t0, 3)
            best = t if best is None else min(best, t)
        return best

    brute_sec = _timed(cosine_topk)
    ivf_sec = _timed(ivf_topk)
    return {
        "corpus": "embeddings@10x",
        "n_queries": IVF_AMORT_QUERIES,
        "nlist": IVF_K,
        "brute_sec": brute_sec,
        "ivf_sec": ivf_sec,
        "ivf_wins": ivf_sec < brute_sec,
    }


WINNOW_CAP_SWEEP = (50, 200, 800)


def _winnow_cap_sweep(spark, sf_dir: str) -> dict:
    """r11 verdict ask #5: dedup_winnowing_pairs' 10x trend point is the
    most expensive in the file, and the claim is that WINNOW_PAIR_CAP —
    not the corpus — bounds the posting-list self-join. Demonstrate it:
    time the operator on the SAME 10x documents dir at caps 50 / 200
    (production value) / 800. If the cap bounds the join, runtime grows
    with the cap at fixed corpus; a corpus-bound join would be flat.
    min-of-2 wall timings, the scale-trend protocol."""
    import time as _time

    from airflow_iceberg_pipeline_stock_tracker_spark.operators.dedup import (
        winnowing_pairs,
    )
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import (
        load_table,
    )

    big_dir = _build_scale_dir(spark, sf_dir)
    docs = load_table(spark, big_dir, "documents")
    out = {}
    for cap in WINNOW_CAP_SWEEP:
        best = None
        for _ in range(2):
            t0 = _time.time()
            winnowing_pairs(docs, cap=cap).count()
            t = round(_time.time() - t0, 3)
            best = t if best is None else min(best, t)
        out[f"cap_{cap}"] = best
    # r12 verdict ask #7: what the cap COSTS in recall, next to what it
    # buys in runtime. Reference set = the UNCAPPED pairs with
    # fingerprint-set resemblance >= 0.5 — the near-dup class the
    # operator exists to surface (it ranks by resemblance). The bare
    # >= 2-shared-fps candidate floor is NOT a usable truth set: 74% of
    # ALL base-fixture doc pairs clear it (boilerplate co-occurrence),
    # and on the 10x corpus it counts 930M pairs (~8 cpu-min to cross)
    # whose survival says only that exact duplicates saturate every
    # bucket — recall over it reads 0.0057 at the production cap while
    # near-dup recall reads 0.99 (both measured; the former is the
    # boilerplate graph dying, which is the cap's JOB).
    # 10x recall runs over the deterministic 10% doc sample: the cap
    # still applies to FULL-corpus bucket sizes before sampling, so a
    # sampled pair's survival equals its survival in the full
    # computation — an unbiased estimate at ~1% of the join cost.
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.dedup import (
        winnow_candidate_pairs,
    )

    base_docs = load_table(spark, sf_dir, "documents")
    for label, corpus, mod in (
        ("base", base_docs, None),
        ("10x", docs, 10),
    ):
        truth = winnow_candidate_pairs(
            corpus, cap=None, doc_sample_mod=mod, min_resemblance=0.5
        ).persist()
        n_truth = truth.count()
        for cap in WINNOW_CAP_SWEEP:
            n_hit = winnow_candidate_pairs(
                corpus, cap=cap, doc_sample_mod=mod
            ).join(truth, ["doc_a", "doc_b"], "inner").count()
            out[f"neardup_recall_{label}_cap_{cap}"] = (
                round(n_hit / n_truth, 4) if n_truth else None
            )
        out[f"neardup_true_pairs_{label}"] = n_truth
        truth.unpersist()
    out["recall_note"] = (
        "truth = uncapped pairs with fingerprint resemblance >= 0.5; "
        "10x rows estimated over the deterministic 10% doc sample "
        "(cap computed on full-corpus buckets before sampling — "
        "unbiased). The 10x corpus is 90% exact duplicates by "
        "construction, so cap 50 is too aggressive there while the "
        "production cap 200 holds ~0.99 near-dup recall; raw "
        ">=2-shared-fps pair recall is dominated by boilerplate "
        "co-occurrence and exact-duplicate saturation (see sweep "
        "comment) and is deliberately not the reported metric"
    )
    return out


LEV_CAP_SWEEP = (32, 64, 128)  # 64 is the production LEV_BLOCK_CAP


def _lev_cap_sweep(spark, sf_dir: str) -> dict:
    """r13 verdict ask #4: dedup_edit_distance's 23.7x trend ratio is
    capped-pair growth (CAP^2 per block) — report what LEV_BLOCK_CAP
    COSTS in recall next to what it buys in runtime, the winnowing-
    recall treatment. Truth = the UNCAPPED qualifying pairs (blocking
    + length band + lev <= 8 are the operator's DEFINITION; only the
    cap is a scalability knob). One uncapped rank-tagged pass grades
    every cap (a pair survives cap c iff max(rank_a, rank_b) <= c);
    the 10x truth runs over the deterministic 10% doc sample with
    ranks computed on FULL-corpus blocks first, so each sampled pair's
    cap survival is exact (the aggregate recall is a deterministic-
    sample estimate, conditional on the mod-10 endpoints — r14
    advice) at ~1% of the join cost. Timings re-run the real
    operator per cap on the 10x corpus,
    min-of-2, the scale-trend protocol."""
    import time as _time

    from pyspark.sql import functions as F

    from airflow_iceberg_pipeline_stock_tracker_spark.operators.dedup import (
        edit_distance_pair_ranks,
        edit_distance_pairs,
    )
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import (
        load_table,
    )

    big_dir = _build_scale_dir(spark, sf_dir)
    docs10 = load_table(spark, big_dir, "documents")
    out = {}
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.dedup import (
        edit_distance_pairs_composed,
    )

    for cap in LEV_CAP_SWEEP:
        best = None
        for _ in range(2):
            t0 = _time.time()
            edit_distance_pairs(docs10, cap=cap).count()
            t = round(_time.time() - t0, 3)
            best = t if best is None else min(best, t)
        out[f"sec_10x_cap_{cap}"] = best
        # r15: the composed path at the same cap — identical output
        # (parity-pinned), but the DP runs once per distinct (pfx, len)
        # pair, so its runtime should be ~cap-insensitive where the
        # direct path grows CAP^2 per saturated block
        best = None
        for _ in range(2):
            t0 = _time.time()
            edit_distance_pairs_composed(docs10, cap=cap).count()
            t = round(_time.time() - t0, 3)
            best = t if best is None else min(best, t)
        out[f"composed_sec_10x_cap_{cap}"] = best
    base_docs = load_table(spark, sf_dir, "documents")
    for label, corpus, mod in (("base", base_docs, None), ("10x", docs10, 10)):
        ranks = edit_distance_pair_ranks(corpus, doc_sample_mod=mod)
        hist = {
            int(r.max_rn): r.n
            for r in ranks.groupBy("max_rn")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n_truth = sum(hist.values())
        out[f"true_pairs_{label}"] = n_truth
        for cap in LEV_CAP_SWEEP:
            n_hit = sum(n for rn, n in hist.items() if rn <= cap)
            out[f"recall_{label}_cap_{cap}"] = (
                round(n_hit / n_truth, 4) if n_truth else None
            )
    out["recall_note"] = (
        "truth = uncapped pairs under the operator's own blocking "
        "(16-char block + length band + prefix lev <= 8); 10x rows "
        "estimated over the deterministic 10% doc sample with ranks "
        "from full-corpus blocks (per-pair cap survival exact; the "
        "aggregate recall is a deterministic-sample estimate, "
        "conditional on both endpoints being ≡0 mod 10). The 10x "
        "corpus is 90% "
        "exact duplicates, so block membership saturates the cap by "
        "construction — recall there prices the cap against the "
        "worst-case shape, the base row against the realistic one"
    )
    return out


DEEP_FACTOR = 100
# winnowing joined r11: the repo's purest linear citizen (zero-shuffle
# per-row selection) gets the two-decade check its flatness claim needs
DEEP_QUERIES = ("text_bm25_search", "text_lm_score", "text_winnowing")

# r12: the sketch tier's two-decade check — the register table stays
# <= |types| x 256 rows while events grow 100x (the reason sketches
# exist), and the seasonality profile stays <= |types| x 168. Both are
# map-combinable single groupBys, so sec/row should stay flat across
# BOTH decades; hll_distinct's exact COUNT(DISTINCT) grader is the one
# stage that legitimately scales with users.
# r13 (r12 verdict ask #8): kmv + cms join the two-decade check. For
# these two the ACCURACY at 100x is recorded alongside the timing
# (_DEEP_ACCURACY below): CMS width 1024 means overestimate ~ 2N/1024
# grows with N — the honest question at 100x is whether the exact
# top-20 is still separated; KMV's rel_err should stay ~1/sqrt(k),
# scale-free, because the sketch is a fixed-k sample of a hash space.
DEEP_EVENTS_QUERIES = (
    "events_hll_distinct",
    "events_hourofweek_seasonality",
    "events_kmv_distinct",
    "events_cms_heavy_hitters",
)

# name -> (error column, denominator column): after timing, the deep
# point re-collects the (bounded: <= |types| or top-20 rows) result and
# records max |err|/denom at 100x — the sketch-accuracy-at-scale
# evidence the timing alone can't carry.
_DEEP_ACCURACY = {
    "events_kmv_distinct": ("rel_err", None),  # already relative
    "events_cms_heavy_hitters": ("overestimate", "exact_n"),
}


def _deep_events_point(spark, sf_dir: str, queries) -> dict:
    """100x-events point for the sketch tier (events-only replica dir,
    same key-shift construction as the 10x build: disjoint user
    populations per replica, so true distincts grow 100x while the
    registers stay fixed-size); min-of-2 timings."""
    import glob
    import shutil
    import time as _time

    from pyspark.sql import functions as F

    base = os.path.basename(sf_dir.rstrip("/"))
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".scale_trend",
        f"{base}-events-x{DEEP_FACTOR}",
    )
    marker = os.path.join(out_dir, "_BUILT")
    want = f"events={DEEP_FACTOR}\n"
    built = os.path.exists(marker) and open(marker).read() == want
    if not built:
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(out_dir)
        for pth in glob.glob(os.path.join(sf_dir, "*.parquet")):
            name = os.path.basename(pth)
            if name != "events.parquet":
                os.symlink(pth, os.path.join(out_dir, name))
        reps = spark.range(DEEP_FACTOR).withColumnRenamed("id", "rep")
        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        (
            ev.crossJoin(F.broadcast(reps))
            .withColumn("event_id", F.col("event_id") + F.col("rep") * F.lit(10**9))
            .withColumn("user_id", F.col("user_id") + F.col("rep") * F.lit(10**7))
            .drop("rep")
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "events.parquet"))
        )
        with open(marker, "w") as f:
            f.write(want)
    out = {}
    acc: dict[str, float] = {}
    for name in DEEP_EVENTS_QUERIES:
        best = None
        for _ in range(2):
            t0 = _time.time()
            df = queries[name](spark, out_dir)
            df.count()
            t = round(_time.time() - t0, 3)
            best = t if best is None else min(best, t)
        out[name] = best
    # accuracy-at-100x for the sketch rows whose output carries its own
    # error evidence (bounded results: <= |types| or top-20 rows)
    for name, (err_col, denom_col) in _DEEP_ACCURACY.items():
        if name not in DEEP_EVENTS_QUERIES:
            continue
        rows = queries[name](spark, out_dir).collect()
        if not rows:
            continue
        if denom_col is None:
            acc[name] = round(max(abs(r[err_col]) for r in rows), 4)
        else:
            acc[name] = round(
                max(abs(r[err_col]) / r[denom_col] for r in rows), 4
            )
    # r14 verdict ask #2: the uniform-replica corpus can never witness
    # CMS identification succeeding (all 100-way ties); grade the same
    # contract on the Zipf 100x dir, where separated heavy hitters
    # exist by construction — both receipts live in the trend row
    zipf_dir = _build_zipf_events_dir(spark, sf_dir, DEEP_FACTOR)
    extras = {
        "events_kmv_distinct": {
            "grader_split_100x": _kmv_grader_split(spark, out_dir)
        },
        "events_cms_heavy_hitters": {
            "rank_agreement_100x": _cms_rank_agreement(spark, out_dir),
            "rank_agreement_100x_zipf": _cms_rank_agreement(
                spark, zipf_dir
            ),
        },
    }
    return out, acc, extras


def _build_zipf_events_dir(spark, sf_dir: str, factor: int) -> str:
    """Zipf-skewed events replica dir (r14 verdict ask #2): the uniform
    replica corpora systematically understate skew — every count level
    becomes a |factor|-way tie, so no separated heavy hitters EXIST and
    the CMS identification grader can only ever read 0.0 there.

    Construction: every event is still replicated `factor` times
    (total = factor x base, same as the uniform dir), but a Zipf HEAD
    of ZIPF_HEADS synthetic users (ids -1..-ZIPF_HEADS, disjoint from
    every real id) claims a 1/k-weighted slice of the replica stream:
    replica rep of event e draws v = (event_id*factor + rep) mod 10007
    (a dense deterministic residue) and lands on head k when v falls
    inside head k's band (band widths ~ ZIPF_W/k); unclaimed replicas
    go to disjoint shifted tail users, the uniform dir's construction.
    Head k's count is ~ N * ZIPF_W / (10007 * k): at the 100x point
    head-1 holds ~5% of ALL events and even head-20 sits decades above
    both the per-user tail and the CMS 2N/w collision floor — heavy
    hitters that are SEPARATED, identifiable, and 1/k-ordered, the
    shape a production event stream actually has. (The base per-user
    counts are so small that no per-user replica scheme could clear
    the collision floor — ~67 x 100 < 2N/1024 — hence synthetic head
    ids rather than boosted real users.)
    """
    import glob
    import shutil

    from pyspark.sql import functions as F

    base = os.path.basename(sf_dir.rstrip("/"))
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".scale_trend",
        f"{base}-events-zipf-x{factor}",
    )
    marker = os.path.join(out_dir, "_BUILT")
    want = f"events-zipf-v3={factor}\n"
    built = os.path.exists(marker) and open(marker).read() == want
    if not built:
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(out_dir)
        for pth in glob.glob(os.path.join(sf_dir, "*.parquet")):
            name = os.path.basename(pth)
            if name != "events.parquet":
                os.symlink(pth, os.path.join(out_dir, name))
        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        reps = spark.range(factor).withColumnRenamed("id", "rep")
        # cumulative 1/k band boundaries (exact ints, shared with any
        # reader re-deriving the expected head masses)
        bounds = []
        acc = 0.0
        for k in range(1, ZIPF_HEADS + 1):
            acc += ZIPF_W / k
            bounds.append(int(round(acc)))
        v = F.col("v")
        head = F.lit(None).cast("bigint")
        for k in range(ZIPF_HEADS, 0, -1):
            lo = bounds[k - 2] if k >= 2 else 0
            head = F.when(
                (v >= F.lit(lo)) & (v < F.lit(bounds[k - 1])),
                F.lit(-k).cast("bigint"),
            ).otherwise(head)
        (
            ev.crossJoin(F.broadcast(reps))
            # bind the residue to the ORIGINAL event_id BEFORE the id
            # shift (r15 code-review finding: an unbound col("event_id")
            # here would resolve against the shifted id and break the
            # documented dense-residue formula)
            .withColumn(
                "v",
                (F.col("event_id") * F.lit(factor) + F.col("rep"))
                % F.lit(10007),
            )
            .withColumn(
                "event_id", F.col("event_id") + F.col("rep") * F.lit(10**9)
            )
            .withColumn(
                "user_id",
                F.when(F.col("user_id").isNull(), F.lit(None).cast("bigint"))
                .when(head.isNotNull(), head)
                .otherwise(
                    F.col("user_id") + (F.col("rep") + 1) * F.lit(10**7)
                ),
            )
            .drop("rep", "v")
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "events.parquet"))
        )
        with open(marker, "w") as f:
            f.write(want)
    return out_dir


ZIPF_HEADS = 20  # synthetic heavy-hitter ids -1..-20
ZIPF_W = 500     # head-k band width ~ ZIPF_W/k residues of 10007


# the per-user/type-keyed rows whose 10x trend the uniform replicas
# flatter (disjoint replica populations mean NO key grows): re-timed on
# the Zipf 10x dir, where the head user's partition is ~10x the median —
# the shape the salting machinery (functions/skew.py) exists for.
# r16 (r15 verdict ask #2): extended from the original 5 rows to the
# full user/type-keyed events family — decay leaderboard, retention,
# funnel, transitions, top paths, TWAP — so every skew-sensitive events
# trend row carries a Zipf receipt next to its uniform sec_10x
ZIPF_10X_QUERIES = (
    "events_type_totals_salted",
    "events_heavy_hitters",
    "events_sessionize",
    "events_pattern_match",
    "events_attribution",
    "events_decay_topk",
    "events_retention",
    "events_funnel",
    "events_transitions",
    "events_top_paths",
    # events_twap is deliberately NOT here (r16 review finding): it
    # keys on (event_type, day) and the Zipf dir reassigns only
    # user_id, so a twap "receipt" would be a no-op measurement
    # presented as skew evidence. Its skew stance is structural: the
    # (type, day) grid is calendar-bounded regardless of row skew.
)


def _zipf_10x_point(spark, sf_dir: str, queries) -> dict:
    """min-of-2 timings of the skew-sensitive rows on the Zipf 10x
    events dir (r14 verdict ask #2's 'skew-corpus trend note')."""
    import time as _time

    zdir = _build_zipf_events_dir(spark, sf_dir, SCALE_FACTOR)
    out = {}
    for name in ZIPF_10X_QUERIES:
        best = None
        for _ in range(2):
            t0 = _time.time()
            queries[name](spark, zdir).count()
            t = round(_time.time() - t0, 3)
            best = t if best is None else min(best, t)
        out[name] = best
    out["note"] = (
        "same rows' sec_10x under the ZIPF replica assignment (head "
        "user ~10x median partition) vs the uniform 10x dir's "
        "disjoint-population flattery; read against each row's "
        "sec_10x in scale_trend"
    )
    return out


def _build_zipf_orders_dir(spark, sf_dir: str, factor: int) -> str:
    """Zipf-skewed ORDERS/LINEITEM replica dir (r15 verdict ask #2's
    second half): the uniform 10x dir keeps replica customers disjoint,
    so no o_custkey group ever grows — the shape the >5x orders trend
    rows (orders_ivm_delete 5.59x, orders_ship_sla 5.1x) were never
    stressed on. Here a head of ZIPF_HEADS synthetic customers (ids
    -1..-ZIPF_HEADS) claims a 1/k-weighted slice of replica ORDER
    OWNERSHIP (same residue-band construction as the events dir, bound
    to the pre-shift o_orderkey), while orderkeys keep the uniform
    dir's join-consistent stride — the orders⋈lineitem join stays
    uniform (lines-per-order is TPC-H-bounded) and ONLY the custkey
    aggregation skews, which is exactly the claim under test: the
    custkey rollups are map-combinable, so partial aggregation must
    absorb a ~5%-of-all-orders head customer."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    base = os.path.basename(sf_dir.rstrip("/"))
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".scale_trend",
        f"{base}-orders-zipf-x{factor}",
    )
    marker = os.path.join(out_dir, "_BUILT")
    want = f"orders-zipf-v2-customer={factor}\n"
    built = os.path.exists(marker) and open(marker).read() == want
    if not built:
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(out_dir)
        for pth in glob.glob(os.path.join(sf_dir, "*.parquet")):
            name = os.path.basename(pth)
            if name not in (
                "orders.parquet",
                "lineitem.parquet",
                "customer.parquet",
            ):
                os.symlink(pth, os.path.join(out_dir, name))
        reps = spark.range(factor).withColumnRenamed("id", "rep")
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        (
            li.crossJoin(F.broadcast(reps))
            .withColumn(
                "l_orderkey", F.col("l_orderkey") + F.col("rep") * F.lit(10**9)
            )
            .drop("rep")
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "lineitem.parquet"))
        )
        bounds = []
        acc = 0.0
        for k in range(1, ZIPF_HEADS + 1):
            acc += ZIPF_W / k
            bounds.append(int(round(acc)))
        v = F.col("v")
        head = F.lit(None).cast("bigint")
        for k in range(ZIPF_HEADS, 0, -1):
            lo = bounds[k - 2] if k >= 2 else 0
            head = F.when(
                (v >= F.lit(lo)) & (v < F.lit(bounds[k - 1])),
                F.lit(-k).cast("bigint"),
            ).otherwise(head)
        od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        (
            od.crossJoin(F.broadcast(reps))
            # residue bound to the PRE-shift orderkey (the r15 events-dir
            # lesson)
            .withColumn(
                "v",
                (F.col("o_orderkey") * F.lit(factor) + F.col("rep"))
                % F.lit(10007),
            )
            .withColumn(
                "o_orderkey", F.col("o_orderkey") + F.col("rep") * F.lit(10**9)
            )
            .withColumn(
                "o_custkey",
                F.when(head.isNotNull(), head).otherwise(
                    F.col("o_custkey") + F.col("rep") * F.lit(10**7)
                ),
            )
            .drop("rep", "v")
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "orders.parquet"))
        )
        # customer must follow orders' custkey stride (the uniform-dir
        # rule) AND gain the 20 synthetic head customers, or every
        # replica/head order is a custkey orphan and the customer-driven
        # rows (orders_ivm_outer) measure an anti-join instead of the
        # skew claim (r16 review finding). Head customers clone the
        # first 20 base rows under the negated key.
        cu = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
        cu_rep = (
            cu.crossJoin(F.broadcast(reps))
            .withColumn(
                "c_custkey", F.col("c_custkey") + F.col("rep") * F.lit(10**7)
            )
            .drop("rep")
        )
        heads = cu.where(
            (F.col("c_custkey") >= 1) & (F.col("c_custkey") <= ZIPF_HEADS)
        ).withColumn("c_custkey", -F.col("c_custkey"))
        cu_rep.unionByName(heads).write.mode("overwrite").parquet(
            os.path.join(out_dir, "customer.parquet")
        )
        with open(marker, "w") as f:
            f.write(want)
    return out_dir


# the >5x orders trend rows (skewable key: o_custkey order ownership)
# plus the other custkey-rollup IVM siblings; orders_ship_sla rides
# along to pin volume-equivalence — its keys (5 priorities x a bounded
# integer lag domain) CANNOT skew by construction, so its Zipf time
# reads as the fact-volume control
ZIPF_10X_ORDERS_QUERIES = (
    "orders_ivm_join",
    "orders_ivm_delete",
    "orders_ivm_outer",
    "orders_ship_sla",
)


def _zipf_10x_orders_point(spark, sf_dir: str, queries) -> dict:
    """min-of-2 timings of the orders rows on the Zipf 10x orders dir
    (head customer owns ~5% of ALL orders)."""
    import time as _time

    zdir = _build_zipf_orders_dir(spark, sf_dir, SCALE_FACTOR)
    out = {}
    for name in ZIPF_10X_ORDERS_QUERIES:
        best = None
        for _ in range(2):
            t0 = _time.time()
            queries[name](spark, zdir).count()
            t = round(_time.time() - t0, 3)
            best = t if best is None else min(best, t)
        out[name] = best
    out["note"] = (
        "same rows' sec_10x under ZIPF order ownership (head customer "
        "~5% of all orders; custkey rollups are map-combinable, so "
        "partial aggregation must absorb the head) vs the uniform 10x "
        "dir's disjoint customers; orders_ship_sla is the volume "
        "control (its keys cannot skew). Read against each row's "
        "sec_10x in scale_trend"
    )
    return out


def _kmv_grader_split(spark, deep_dir: str) -> dict:
    """r13 verdict ask #7: events_kmv_distinct's 13.8s 100x point needed
    attribution — the registered row times sketch + GRADER (an exact
    per-type COUNT(DISTINCT user_id), the one legitimately user-scale
    stage, present only to grade the sketch). Time the sketch-only
    pipeline (bottom-k via WindowGroupLimit + the estimate projection)
    on the SAME 100x dir, min-of-2: full_row_sec - sketch_only_sec is
    the grader's bill, the proof-tier split-out discipline."""
    import time as _time

    from airflow_iceberg_pipeline_stock_tracker_spark.operators import kmv
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import (
        load_table,
    )

    best = None
    for _ in range(2):
        t0 = _time.time()
        ev = load_table(spark, deep_dir, "events")
        sk = kmv.bottom_k(ev, ["event_type"], "user_id")
        kmv.kmv_estimate(sk, ["event_type"]).count()
        t = round(_time.time() - t0, 3)
        best = t if best is None else min(best, t)
    return {
        "sketch_only_sec_100x": best,
        "note": (
            "the registered events_kmv_distinct row also computes the "
            "exact COUNT(DISTINCT) grader; its 100x time minus this "
            "sketch-only time is the grader's share. r14 finding: the "
            "sketch side itself dominates (~80% of the row's 100x "
            "time) — the cost is the full-scan bottom-k window's "
            "per-partition partial top-k sort, not the grader; the "
            "sketch TABLE still stays |types| x k, it is the scan "
            "that scales, as it must"
        ),
    }


def _cms_rank_agreement(spark, deep_dir: str) -> dict:
    """r13 verdict ask #3: CMS's contract is heavy-hitter
    IDENTIFICATION, not per-item counts — width 1024's 2N/w bound
    legitimately swamps per-item error at 100x (the honest
    max_rel_err_100x: 100.87 recorded in r13). Grade the actual
    contract, TIE-AWARE: the 100x replica corpus makes every count
    level a 100-way tie (each user repeats once per disjoint replica),
    so "the" exact top-20 is an arbitrary id-tiebroken pick from a tie
    class — identification is scored against the CLOSURE {u: exact(u)
    >= 20th count} instead, and tau-a reports how many of the exact
    top-20's C(20,2) pairs were comparable at all (count ties compare
    neither way). The diagnostics (top/median count, closure size)
    make the verdict self-reading: this corpus has NO separated heavy
    hitters, so a 2N/w >> top-median gap means identification fails AT
    ANY plausible width — the failure mode, not a tuning miss."""
    from pyspark.sql import functions as F

    from airflow_iceberg_pipeline_stock_tracker_spark.operators import cms
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import (
        load_table,
    )

    ev = load_table(spark, deep_dir, "events")
    sketch = cms.cms_build(ev, "user_id").localCheckpoint(eager=True)
    exact = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
    ).persist()
    exact_top = exact.orderBy(F.desc("exact_n"), "user_id").limit(20).collect()
    c20 = min(r.exact_n for r in exact_top)
    closure = {
        r.user_id
        for r in exact.where(F.col("exact_n") >= c20)
        .select("user_id")
        .collect()
    }
    n_total = exact.count()
    p50 = exact.agg(
        F.expr("percentile(exact_n, 0.5)").alias("p")
    ).collect()[0].p
    cms_top = (
        cms.cms_estimate(sketch, exact.select("user_id"), "user_id")
        .orderBy(F.desc("cms_est"), "user_id")
        .limit(20)
        .collect()
    )
    cms_ids = {r.user_id for r in cms_top}
    recall = len(cms_ids & closure) / 20.0
    exact_ids = [r.user_id for r in exact_top]
    est_of = {
        r.user_id: r.cms_est
        for r in cms.cms_estimate(
            sketch,
            spark.createDataFrame(
                [(i,) for i in exact_ids], "user_id bigint"
            ),
            "user_id",
        ).collect()
    }
    exact_of = {r.user_id: r.exact_n for r in exact_top}
    conc = disc = comparable = 0
    for i in range(len(exact_ids)):
        for j in range(i + 1, len(exact_ids)):
            a, b = exact_ids[i], exact_ids[j]
            de = exact_of[a] - exact_of[b]
            dc = est_of[a] - est_of[b]
            if de != 0:
                comparable += 1
                if de * dc > 0:
                    conc += 1
                elif de * dc < 0:
                    disc += 1
    exact.unpersist()
    return {
        "top20_identification_recall_tie_aware": round(recall, 4),
        "kendall_tau_a_top20": (
            round((conc - disc) / comparable, 4) if comparable else None
        ),
        "comparable_pairs_of_190": comparable,
        "tie_class_size_at_20th_count": len(closure),
        "top_count": int(max(r.exact_n for r in exact_top)),
        "median_count": float(p50),
        "n_distinct_users": int(n_total),
        "note": (
            "tie-aware contract grader: recall = |cms-est top-20 over "
            "ALL users ∩ {u: exact >= 20th count}| / 20; tau-a only "
            "over count-distinct pairs. The replica corpus has no "
            "separated heavy hitters (every level is a 100-way tie, "
            "top barely above median), so 2N/w noise swamps the gap "
            "at ANY plausible width — the recorded failure is the "
            "distribution's, matching r13's honest per-item error"
        ),
    }


# r14: the duplicate-collapse fix's two-decade check — a 100x-embeddings
# replica dir is 100-member exact-duplicate groups, the shape that made
# the pre-r14 band self-join quadratic. With the collapse, the rep join
# runs at BASE size at any multiplicity: knn/LOF should grow roughly
# with the linear member fan-out, never with C(100,2) candidate pairs.
DEEP_EMBEDDINGS_QUERIES = (
    "similarity_knn_graph",
    "embedding_outlier_lof",
    "similarity_dup_groups",
)


def _deep_embeddings_point(spark, sf_dir: str, queries) -> dict:
    """100x-embeddings point (exact-duplicate replicas under shifted
    vec_ids — the 10x builder's construction); min-of-2 timings."""
    import glob
    import shutil
    import time as _time

    from pyspark.sql import functions as F

    base = os.path.basename(sf_dir.rstrip("/"))
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".scale_trend",
        f"{base}-emb-x{DEEP_FACTOR}",
    )
    marker = os.path.join(out_dir, "_BUILT")
    want = f"embeddings={DEEP_FACTOR}\n"
    built = os.path.exists(marker) and open(marker).read() == want
    if not built:
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(out_dir)
        for pth in glob.glob(os.path.join(sf_dir, "*.parquet")):
            name = os.path.basename(pth)
            if name != "embeddings.parquet":
                os.symlink(pth, os.path.join(out_dir, name))
        reps = spark.range(DEEP_FACTOR).withColumnRenamed("id", "rep")
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        (
            emb.crossJoin(F.broadcast(reps))
            .withColumn("vec_id", F.col("vec_id") + F.col("rep") * F.lit(10**9))
            .drop("rep")
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "embeddings.parquet"))
        )
        with open(marker, "w") as f:
            f.write(want)
    out = {}
    for name in DEEP_EMBEDDINGS_QUERIES:
        best = None
        for _ in range(2):
            t0 = _time.time()
            queries[name](spark, out_dir).count()
            t = round(_time.time() - t0, 3)
            best = t if best is None else min(best, t)
        out[name] = best
    return out


# r13: the relational tier's two-decade check — dq_profile's re-planned
# skinny-explode hash aggregate (the row that motivated killing the
# wide-Expand SortAggregate) and the IVM rebuild, both lineitem-driven.
# orders replicate with the join-consistent orderkey stride so every
# replica's lines join its own orders (the 10x builder's construction).
DEEP_LINEITEM_QUERIES = ("dq_profile", "orders_ivm_join")


def _deep_lineitem_point(spark, sf_dir: str, queries) -> dict:
    """100x lineitem+orders point (joint key-shifted replicas, the 10x
    builder's join-consistent strides); min-of-2 timings."""
    import glob
    import shutil
    import time as _time

    from pyspark.sql import functions as F

    base = os.path.basename(sf_dir.rstrip("/"))
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".scale_trend",
        f"{base}-lineitem-x{DEEP_FACTOR}",
    )
    marker = os.path.join(out_dir, "_BUILT")
    want = f"lineitem+orders={DEEP_FACTOR}\n"
    built = os.path.exists(marker) and open(marker).read() == want
    if not built:
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(out_dir)
        for pth in glob.glob(os.path.join(sf_dir, "*.parquet")):
            name = os.path.basename(pth)
            if name not in ("lineitem.parquet", "orders.parquet"):
                os.symlink(pth, os.path.join(out_dir, name))
        reps = spark.range(DEEP_FACTOR).withColumnRenamed("id", "rep")
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        (
            li.crossJoin(F.broadcast(reps))
            .withColumn(
                "l_orderkey", F.col("l_orderkey") + F.col("rep") * F.lit(10**9)
            )
            .drop("rep")
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "lineitem.parquet"))
        )
        od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        (
            od.crossJoin(F.broadcast(reps))
            .withColumn(
                "o_orderkey", F.col("o_orderkey") + F.col("rep") * F.lit(10**9)
            )
            .withColumn(
                "o_custkey", F.col("o_custkey") + F.col("rep") * F.lit(10**7)
            )
            .drop("rep")
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "orders.parquet"))
        )
        with open(marker, "w") as f:
            f.write(want)
    out = {}
    for name in DEEP_LINEITEM_QUERIES:
        best = None
        for _ in range(2):
            t0 = _time.time()
            queries[name](spark, out_dir).count()
            t = round(_time.time() - t0, 3)
            best = t if best is None else min(best, t)
        out[name] = best
    return out


def _deep_docs_point(spark, sf_dir: str, queries) -> dict:
    """100x-documents point for the corpus-scaling text ops (r7 ask: one
    decade can't separate amortized fixed overhead from a genuine
    superlinear term — two decades can). documents-only replica dir,
    same key-shift construction as the 10x build; min-of-2 timings."""
    import glob
    import shutil
    import time as _time

    from pyspark.sql import functions as F

    base = os.path.basename(sf_dir.rstrip("/"))
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".scale_trend",
        f"{base}-docs-x{DEEP_FACTOR}",
    )
    marker = os.path.join(out_dir, "_BUILT")
    want = f"docs={DEEP_FACTOR}\n"
    built = os.path.exists(marker) and open(marker).read() == want
    if not built:
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(out_dir)
        for pth in glob.glob(os.path.join(sf_dir, "*.parquet")):
            name = os.path.basename(pth)
            if name != "documents.parquet":
                os.symlink(pth, os.path.join(out_dir, name))
        reps = spark.range(DEEP_FACTOR).withColumnRenamed("id", "rep")
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        (
            docs.crossJoin(F.broadcast(reps))
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(10**9))
            .drop("rep")
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "documents.parquet"))
        )
        with open(marker, "w") as f:
            f.write(want)
    out = {}
    for name in DEEP_QUERIES:
        best = None
        for _ in range(2):
            t0 = _time.time()
            queries[name](spark, out_dir).count()
            t = round(_time.time() - t0, 3)
            best = t if best is None else min(best, t)
        out[name] = best
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # Host-load preflight (r12 verdict ask #2): the committed r12 run
    # carried ~16% uniform inflation from a noisy neighbor that nothing
    # in the artifacts recorded. Capture the 1-min loadavg at start and
    # end (into BENCH_DETAIL.json, NOT stdout — the one-line contract)
    # and warn on stderr when the machine is already busy, so a reader
    # diffing round-over-round timings can tell load from regression.
    load_start = round(os.getloadavg()[0], 2)
    if load_start > 1.0:
        print(
            f"# WARNING: 1-min loadavg {load_start} > 1 at bench start —"
            " timings will carry host-load inflation; prefer a quiet"
            " window for gate runs",
            file=sys.stderr,
        )

    # Fail fast on silent testdata regeneration (the r3 round-killer):
    # pyarrow footer check only, names the drifted column on failure.
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.schema_probe import (
        check_sf_dir,
    )

    check_sf_dir(sf_dir)

    from airflow_iceberg_pipeline_stock_tracker_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench")
    queries = entrymod.queries()

    # warm the JVM/codegen path once on a trivial action so the first
    # measured query doesn't pay session startup
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    # Two passes per query, report the min (steady-state). Single-pass
    # timings at this scale are dominated by one-off noise — JIT/codegen
    # compilation of first-seen plan shapes, G1 mixed-collection pauses,
    # cold page cache — measured round-over-round swings of 3-14x on
    # UNCHANGED operator code (r2=1.4s vs r4-cold=20s for the same
    # query). The min of two runs is the throughput the plan actually
    # sustains; the first-pass total is reported alongside so cold-start
    # cost stays visible rather than hidden.
    cold: dict[str, float] = {}
    timings: dict[str, float] = {}
    all_times: dict[str, list[float]] = {}

    # Pass 0+1 for everything; pass 2 only for the fast (<1s warm) rows.
    # Same-code swings of up to 1.5x between whole runs (README) make 2x
    # regression detection noisy — a third sample on the cheap rows
    # costs ~seconds and the recorded per-query spread (max-min across
    # measured passes) lets a reader separate noise from regression.
    # Queries that print (the pipeline's reference-parity DQ echo) must
    # not break the ONE-JSON-line stdout contract: all query-time stdout
    # is routed to stderr; only the final JSON line reaches stdout.
    _stdout = sys.stdout
    sys.stdout = sys.stderr
    try:
        # Sustained-rate streaming capacity FIRST (r14, closing the r13
        # knee adjudication): the knee is the registry's most load-
        # sensitive measurement, and running it after ~250s of bench
        # work measured it on a host the bench itself had heated
        # (loadavg 3+ at knee start, 24+ at end — the r14 first run
        # reproduced the r13 driver's 4x understatement mechanism
        # in-process). Probing it before the measurement passes runs it
        # at the preflight loadavg; the probe still records its own
        # loadavg, retries once if it starts busy, and flags
        # inconclusive_load (streaming/throughput.py).
        from airflow_iceberg_pipeline_stock_tracker_spark.streaming.throughput import (
            capacity_knee,
        )

        # start near the highest rate every prior round absorbed (6.4M
        # was still kept_up in r7/r8) and ladder far enough that the
        # first non-sustained offer is actually OBSERVED — a ladder that
        # stops at an absorbed rate states a floor, not capacity
        knee = capacity_knee(
            spark, start_rows_per_sec=1_600_000, run_sec=6.0, max_steps=9
        )
        print(f"# streaming capacity knee: {knee}", file=sys.stderr)
        _measure(spark, queries, sf_dir, cold, timings, all_times)
        scale_trend = _scale_trend(spark, sf_dir, queries, timings)
        print(f"# scale trend: {scale_trend}", file=sys.stderr)
        ivf_amort = _ivf_amortization_point(spark, sf_dir)
        print(f"# ivf amortization: {ivf_amort}", file=sys.stderr)
        # r10 verdict ask #8: the amortization point lives INSIDE the
        # IVF trend row too, so the >1 time_ratio (n_queries=10, where
        # the nlist assignment pass dominates) and the winning absolute
        # point (n_queries=256 >> nlist) can't be read apart
        ivf_row = scale_trend.get("similarity_ivf_topk")
        if ivf_row is not None:
            ivf_row["amortization_at_q256"] = {
                "ivf_sec_10x": ivf_amort["ivf_sec"],
                "brute_sec_10x": ivf_amort["brute_sec"],
                "ivf_wins": ivf_amort["ivf_wins"],
            }
        # r11 verdict ask #5: cap-sensitivity at 10x lives INSIDE the
        # winnowing_pairs trend row, so a reader sees the cap — not the
        # corpus — bounds the posting-list join
        cap_sweep = _winnow_cap_sweep(spark, sf_dir)
        print(f"# winnow cap sweep @10x: {cap_sweep}", file=sys.stderr)
        wp_row = scale_trend.get("dedup_winnowing_pairs")
        if wp_row is not None:
            wp_row["cap_sweep_sec_10x"] = cap_sweep
        # r13 verdict ask #4: the LEV_BLOCK_CAP recall/runtime sweep
        # lives INSIDE the edit-distance trend row, so the 23.7x time
        # ratio reads against what the cap costs in recall
        lev_sweep = _lev_cap_sweep(spark, sf_dir)
        print(f"# lev cap sweep @10x: {lev_sweep}", file=sys.stderr)
        lev_row = scale_trend.get("dedup_edit_distance")
        if lev_row is not None:
            lev_row["cap_sweep_10x"] = lev_sweep
        deep = _deep_docs_point(spark, sf_dir, queries)
        for name, sec in deep.items():
            e = scale_trend.get(name)
            if e:
                e["sec_100x"] = sec
                e["time_ratio_100x_vs_10x"] = (
                    round(sec / e["sec_10x"], 2) if e["sec_10x"] else None
                )
        print(f"# 100x documents point: {deep}", file=sys.stderr)
        deep_ev, deep_acc, deep_extras = _deep_events_point(
            spark, sf_dir, queries
        )
        for name, sec in deep_ev.items():
            e = scale_trend.get(name)
            if e:
                e["sec_100x"] = sec
                e["time_ratio_100x_vs_10x"] = (
                    round(sec / e["sec_10x"], 2) if e["sec_10x"] else None
                )
                if name in deep_acc:
                    e["max_rel_err_100x"] = deep_acc[name]
        # r13 verdict asks #3 + #7: the contract-matched CMS grader and
        # the KMV sketch/grader time split live INSIDE their trend rows
        for name, extra in deep_extras.items():
            e = scale_trend.get(name)
            if e:
                e.update(extra)
        print(
            f"# 100x events point: {deep_ev} accuracy: {deep_acc} "
            f"extras: {deep_extras}",
            file=sys.stderr,
        )
        deep_li = _deep_lineitem_point(spark, sf_dir, queries)
        for name, sec in deep_li.items():
            e = scale_trend.get(name)
            if e:
                e["sec_100x"] = sec
                e["time_ratio_100x_vs_10x"] = (
                    round(sec / e["sec_10x"], 2) if e["sec_10x"] else None
                )
        print(f"# 100x lineitem point: {deep_li}", file=sys.stderr)
        # r14: the duplicate-collapse two-decade receipt — 100-member
        # exact-duplicate groups, the pre-r14 quadratic shape
        deep_emb = _deep_embeddings_point(spark, sf_dir, queries)
        for name, sec in deep_emb.items():
            e = scale_trend.get(name)
            if e:
                e["sec_100x"] = sec
                e["time_ratio_100x_vs_10x"] = (
                    round(sec / e["sec_10x"], 2) if e["sec_10x"] else None
                )
        print(f"# 100x embeddings point: {deep_emb}", file=sys.stderr)
        # r14 verdict ask #2: skew-corpus point — the per-key rows
        # re-timed under the Zipf replica assignment
        zipf_10x = _zipf_10x_point(spark, sf_dir, queries)
        for name, sec in zipf_10x.items():
            e = scale_trend.get(name)
            if e and isinstance(sec, float):
                e["sec_10x_zipf"] = sec
        print(f"# zipf 10x events point: {zipf_10x}", file=sys.stderr)
        # r15 verdict ask #2 (second half): the orders family under
        # Zipf order ownership
        zipf_orders = _zipf_10x_orders_point(spark, sf_dir, queries)
        for name, sec in zipf_orders.items():
            e = scale_trend.get(name)
            if e and isinstance(sec, float):
                e["sec_10x_zipf"] = sec
        print(f"# zipf 10x orders point: {zipf_orders}", file=sys.stderr)
        # r16 verdict ask #6: in-artifact noise adjudication LAST (the
        # trend/knee work above is what heats the box; the loop's decay
        # gate needs to run after it)
        requieted = _requiet(
            spark,
            queries,
            sf_dir,
            timings,
            all_times,
            int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        )
        print(f"# requieted: {requieted.get('rows', {})}", file=sys.stderr)
    finally:
        # the ONE-JSON-line stdout contract must survive any mid-bench
        # exception — restore stdout unconditionally
        sys.stdout = _stdout

    total = round(sum(timings.values()), 3)
    spread = {
        q: round(max(ts) - min(ts), 3)
        for q, ts in all_times.items()
        if len(ts) > 1
    }
    common_r2 = round(
        sum(t for q, t in timings.items() if q in R2_COMMON_SET), 3
    )
    proof_tier = round(
        sum(t for q, t in timings.items() if q in PROOF_TIER), 3
    )
    # Full per-query detail goes to a sidecar file: the one-line stdout
    # JSON outgrew the driver's capture in r5+r6 (BENCH_r0{5,6}.json both
    # record "parsed": null), so stdout now carries only the totals the
    # round-over-round trend needs and the sidecar carries everything.
    # r16 PERF post-mortem: BENCH_DETAIL.json is a single mutable file,
    # so the driver's low-core run clobbers the 32-core per-query detail
    # and PERF's per_query/scaling blocks read n_common=0. Write a
    # per-core-count sidecar alongside (BENCH_DETAIL_c<cpus>.json) so
    # every core count keeps its own per-query record; BENCH_DETAIL.json
    # stays as the latest-run copy for compatibility.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    here = os.path.dirname(os.path.abspath(__file__))
    detail_path = os.path.join(here, "BENCH_DETAIL.json")
    detail_path_cpus = os.path.join(here, f"BENCH_DETAIL_c{cpus}.json")
    load_end = round(os.getloadavg()[0], 2)
    for _dp in (detail_path, detail_path_cpus):
      with open(_dp, "w") as f:
        json.dump(
            {
                "sf": sf,
                "cpus": cpus,
                "queries": timings,
                "cold": cold,
                # r14 advice: since r14 the capacity-knee probe runs
                # FIRST (before the measurement passes), so "cold" pass
                # timings run on a JVM the knee already warmed
                # (codegen/JIT) — do not read cold deltas vs pre-r14
                # rounds as regressions/improvements
                "cold_note": (
                    "cold pass measured AFTER the capacity-knee probe "
                    "since r14 (knee needs the quiet host more); cold "
                    "numbers are knee-warmed vs r13-and-earlier"
                ),
                "spread": spread,
                "throughput": {"capacity_knee": knee},
                "scale_trend": scale_trend,
                "ivf_amortization": ivf_amort,
                # r15 (r14 ask #2): the skew-sensitive rows under the
                # Zipf replica assignment (also inlined per-row as
                # sec_10x_zipf where the row has a trend entry)
                "zipf_10x_events": zipf_10x,
                "zipf_10x_orders": zipf_orders,
                # r16 verdict ask #6: the flagged-row re-measure loop's
                # samples + loadavgs, so noise adjudication is machine-
                # checkable from the artifact
                "requieted": requieted,
                # 1-min loadavg at bench start/end — values > ~1 beyond
                # this process's own 32 threads mean the run is load-
                # inflated (r12's committed run: ~16% uniform). Note:
                # load_end includes the bench's own just-finished
                # Spark work, so only load_start reads as a preflight.
                "loadavg_1m": {"start": load_start, "end": load_end},
            },
            f,
            indent=1,
            sort_keys=True,
        )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "common_r2_sec": common_r2,
                "proof_tier_sec": proof_tier,
                "cold_total_sec": round(sum(cold.values()), 3),
                "runs_per_query": 2,
                "runs_note": "min of 2 (3 for <1s rows; proofs once; noisy/flagged rows +2 quiet-gated samples, see requieted); per-query detail in BENCH_DETAIL.json + BENCH_DETAIL_c<cpus>.json",
                "agg": "min",
                "max_sustained_stream_rows_per_sec": knee[
                    "max_sustained_rows_per_sec"
                ],
                "first_failed_offer": knee["first_failed_offer"],
                "scale_trend_max_time_ratio": max(
                    (
                        e["time_ratio"]
                        for e in scale_trend.values()
                        if e["time_ratio"] is not None
                    ),
                    default=None,
                ),
                # r15 verdict ask #6: the raw max above can read a
                # DEMOTED direct row (kept in the trend table for the
                # side-by-side); this is the worst ratio over rows that
                # ARE the production path
                "scale_trend_production_worst": max(
                    (
                        {"query": n, "time_ratio": e["time_ratio"]}
                        for n, e in scale_trend.items()
                        if e["time_ratio"] is not None
                        and n not in TREND_SUPERSEDED
                    ),
                    key=lambda d: d["time_ratio"],
                    default=None,
                ),
                "sf": sf,
            }
        )
    )


# Rows whose timing is dominated by persist/block-store scheduling
# rather than plan execution: measured under a standardized storage
# state (clearCache + GC before every pass, 3 samples always) — see
# the inline note in _measure (r12 verdict ask #6).
_STORAGE_SENSITIVE = {"dedup_minhash_lsh"}


def _requiet(spark, queries, sf_dir, timings, all_times, cpus) -> dict:
    """r16 verdict ask #6: noise adjudication as an in-artifact
    re-measure loop instead of a narrative.

    Every round ~70 matched-core rows read >10% slower with zero code
    change and the regression audit re-litigates host noise by hand
    (standalone re-runs, 8-core cross-checks). This loop does that
    adjudication inside the bench itself: rows whose measured passes
    disagreed badly (spread > 50% of the min) — or whose only sample is
    a RUN_ONCE cold read taken right after the capacity knee heated the
    box (the documented r12/r16 flap mechanism) — get 2 standalone
    re-samples behind a one-time loadavg decay gate, with every sample
    and its 1-min loadavg recorded in BENCH_DETAIL. The headline keeps
    the same min-across-measured-passes aggregation; the pre-requiet
    value is recorded per row so the old methodology's number stays
    visible alongside.
    """
    import time as _time

    from airflow_iceberg_pipeline_stock_tracker_spark.plans.llm_queries import (
        clear_result_caches,
    )

    flagged = []
    for name in HEADLINE:
        t = timings.get(name)
        if t is None:
            continue
        samples = all_times.get(name, [])
        spread = max(samples) - min(samples) if len(samples) > 1 else 0.0
        if name in RUN_ONCE and t >= 2.0:
            flagged.append(name)
        elif t >= 0.8 and spread > 0.5 * t:
            flagged.append(name)
    flagged = sorted(flagged, key=lambda n: -timings[n])[:10]
    out: dict = {
        "flag_rule": (
            "RUN_ONCE cold sample >= 2s, or spread > 50% of min at >= "
            "0.8s; top 10 by time; 2 re-samples each after a one-time "
            "loadavg decay gate; headline stays min across ALL measured "
            "samples (pre-requiet value kept per row)"
        ),
        "rows": {},
    }
    if not flagged:
        return out
    # one-time decay gate: the bench's own trend/knee work just heated
    # the box; wait for the 1-min loadavg to fall back toward idle so
    # the re-samples measure the plan, not the bench's wake. (While a
    # re-sample RUNS, loadavg includes our own executor threads — only
    # this pre-gate reads as an external-noise preflight.)
    gate = max(4.0, cpus / 4.0)
    deadline = _time.time() + 120
    while os.getloadavg()[0] > gate and _time.time() < deadline:
        _time.sleep(5)
    out["gate_loadavg_1m"] = round(os.getloadavg()[0], 2)
    out["gate_timed_out"] = os.getloadavg()[0] > gate
    for name in flagged:
        pre = timings[name]
        samples, loads = [], []
        for _ in range(2):
            clear_result_caches()
            spark.catalog.clearCache()
            for t in spark.catalog.listTables():
                if t.isTemporary and t.name.startswith("q_"):
                    spark.catalog.dropTempView(t.name)
            loads.append(round(os.getloadavg()[0], 2))
            t0 = _time.time()
            df = queries[name](spark, sf_dir)
            df.count()
            samples.append(round(_time.time() - t0, 3))
        all_times.setdefault(name, []).extend(samples)
        timings[name] = min(timings[name], *samples)
        out["rows"][name] = {
            "pre_requiet": pre,
            "samples": samples,
            "loadavg_1m": loads,
            "final": timings[name],
        }
        print(
            f"# requiet {name}: pre={pre} samples={samples} "
            f"loads={loads} -> {timings[name]}",
            file=sys.stderr,
        )
    return out


def _measure(spark, queries, sf_dir, cold, timings, all_times) -> None:
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.llm_queries import (
        clear_result_caches,
    )

    for rnd in (0, 1, 2):
        # memoized computed intermediates (shared pair graph etc.) are a
        # real per-session feature, but a measured pass must pay for them
        # exactly once itself — not inherit them from the previous pass
        clear_result_caches()
        # clear any catalog-cached relations generally so a later pass
        # can't hit an earlier pass's materialized cache by logical-plan
        # match. Note: localCheckpoint intermediates (q11) are NOT in
        # the catalog cache and are rebuilt per pass anyway, because
        # each query fn constructs a fresh DataFrame
        spark.catalog.clearCache()
        # drop the previous pass's streaming memory-sink tables: each
        # holds a full drained result in driver memory, and a pass-2
        # measurement shouldn't run against a heap aged by pass-1 leftovers
        for t in spark.catalog.listTables():
            if t.isTemporary and t.name.startswith("q_"):
                spark.catalog.dropTempView(t.name)
        for name in HEADLINE:
            if rnd > 0 and name in RUN_ONCE:
                continue
            if (
                rnd == 2
                and timings.get(name, 99.0) >= 1.0
                and name not in _STORAGE_SENSITIVE
            ):
                continue  # third sample only for the fast rows
            if name in _STORAGE_SENSITIVE:
                # r12 verdict ask #6: this row's min-of-passes swung
                # 2.07/2.60/3.24s across same-code RUNS because its
                # persist()+self-join timing depends on what the block
                # store and heap inherited from the preceding ~100
                # queries. Standardize the storage state right before
                # each pass (and always take a third sample) so the row
                # times the band join, not persist scheduling against a
                # run-dependent cache residue. Documented here so
                # round-over-round comparison stays honest: r13+ timings
                # of these rows are under a cleared cache + GC'd heap.
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
            fn = queries[name]
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            t = round(time.time() - t0, 3)
            if rnd == 0:
                cold[name] = t
            timings[name] = min(timings.get(name, t), t)
            all_times.setdefault(name, []).append(t)
            print(f"# {name}[{rnd}]: {t}s ({n} rows)", file=sys.stderr)


if __name__ == "__main__":
    main()
