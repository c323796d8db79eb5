"""Physical-plan regression tests.

Correctness is the oracle's job; these pin the PLAN SHAPE that makes the
queries viable at 100 TB — filter pushdown reaching the parquet scan,
dimension joins broadcasting instead of shuffling the fact side, rank
pushdown for top-k windows. A refactor that silently turns a broadcast
join into a cross product or strips a pushed filter still passes value
checks at test scale; these fail it.
"""

from __future__ import annotations

from airflow_iceberg_pipeline_stock_tracker_spark.plans.queries import (
    RELATIONAL_QUERIES,
)


def _plan(spark, sf_dir, name: str) -> str:
    fn = RELATIONAL_QUERIES[name][0]
    return fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    # the shipdate predicate must reach the parquet reader, not sit in a
    # post-scan Filter over all rows
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan


def test_q6_all_predicates_pushed_and_pruned(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    assert "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount)" in plan
    # 4-column projection must reach the reader
    assert (
        "ReadSchema: struct<l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_shipdate:timestamp" in plan
    )


def test_q14_part_join_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q14_promo_revenue")
    assert "BroadcastHashJoin" in plan


def test_q5_dimension_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_nation_revenue")
    assert plan.count("BroadcastHashJoin") >= 3  # supp/nation/region at least
    assert "CartesianProduct" not in plan
    # the orders date range prunes at the scan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_topk_rank_pushdown(spark, sf_dir):
    # row_number + rank<=3 must become a WindowGroupLimit (partial top-k
    # before the shuffle), not a full sort of every partition's rows
    plan = _plan(spark, sf_dir, "topk_parts_per_brand")
    assert plan.count("WindowGroupLimit") >= 1


def test_salted_agg_shuffles_on_salted_key_first(spark, sf_dir):
    """The hot-key aggregate's FIRST shuffle must be keyed on
    (event_type, salt), not event_type alone — that's the whole point of
    the salting — and the user count's first shuffle on
    (event_type, user_id)."""
    plan = _plan(spark, sf_dir, "events_type_totals_salted")
    assert "hashpartitioning(event_type" in plan
    # salt appears as a grouping expression alongside the key
    assert ", _groupingexpression" in plan or ", salt" in plan
    assert ", user_id" in plan


def test_no_cartesian_products_anywhere(spark, sf_dir):
    for name in RELATIONAL_QUERIES:
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name


# Queries whose plans legitimately contain BroadcastNestedLoopJoin: the
# nested loop's build side is a BROADCAST small relation by construction
# (top-k probe sets, k-centroid codebooks), so the "loop" is k comparisons
# per row — the distributed-scan side streams once. Anything NOT listed
# here that grows a nested-loop join is a scale regression.
_BROADCAST_NLJ_ALLOWED = frozenset(
    {
        "similarity_cosine_topk",  # broadcast query set (exact baseline)
        "similarity_ivf_topk",  # broadcast centroids + nprobe cells
        "text_bm25_search",  # broadcast 1-row corpus scalars (N, sum dl)
        "dedup_graph_stats",  # broadcast 1-row census scalars
        "curation_importance_weights",  # broadcast 1-row V scalars
        "similarity_mmr_rerank",  # broadcast n_queries-row probe set
        "similarity_hard_negatives",  # broadcast anchor set
        "similarity_sq_topk",  # broadcast query-code set (n_queries rows)
        "text_tfidf_keywords",  # broadcast 1-row corpus scalar (N)
        "text_collocations",  # broadcast 1-row corpus scalars (n_bi, n_uni)
        # non-equi (source_a < source_b) pair join over the |sources|-row
        # broadcast profile table — dimension-scale by construction
        "text_source_drift",
        # broadcast 1-row query vector (dense side) + BM25's broadcast
        # 1-row corpus scalars — both the O(n*1) scalar-attach class
        "similarity_rrf_hybrid",
        # broadcast 1-row global-median threshold attached to the
        # |sources| x |scores| histogram — O(hist x 1) scalar-attach
        "curation_score_calibration",
        # broadcast 1-row (budget) scalar attached to the |sources|-row
        # aggregate before the waterfill windows — O(|sources| x 1)
        "curation_token_budget",
    }
)


def test_llm_query_plans_have_no_unbounded_joins(spark, sf_dir):
    """Sweep EVERY registered LLM query: no CartesianProduct ever, and
    BroadcastNestedLoopJoin only where a broadcast-small build side makes
    it O(n*k) by design (allowlisted above)."""
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.llm_queries import (
        LLM_QUERIES,
        clear_result_caches,
    )

    clear_result_caches()
    for name, (fn, _sql) in LLM_QUERIES.items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        if name not in _BROADCAST_NLJ_ALLOWED:
            assert "BroadcastNestedLoopJoin" not in plan, name
    clear_result_caches()


def test_salted_agg_null_keys_and_null_users(spark, tmp_path):
    """NULL semantics must match the GROUP BY oracle: a NULL event_type
    is a real group (GROUP BY keeps it; a plain equi-join between the
    two aggregate branches would drop it), and COUNT(DISTINCT user_id)
    ignores NULLs (a group whose user_ids are all NULL counts 0)."""
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.queries import (
        events_type_totals_salted,
    )

    rows = [
        (1, 10, "click", 1.0),
        (2, None, "click", 2.0),
        (3, 10, "click", 1.5),
        (4, None, "view", 3.0),   # all-NULL users -> n_users = 0
        (5, None, "view", 1.0),
        (6, 20, None, 2.5),       # NULL event_type group
        (7, None, None, 0.5),
    ]
    df = spark.createDataFrame(
        [(i, 1_700_000_000_000_000_000 + i, u, t, v, "{}") for i, u, t, v in rows],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        r.event_type: (r.n_events, r.n_users, r.total_value)
        for r in events_type_totals_salted(spark, str(tmp_path)).collect()
    }
    assert got == {
        "click": (3, 1, 4.5),
        "view": (2, 0, 4.0),
        None: (2, 1, 3.0),
    }


def _llm_plan(spark, sf_dir, name: str) -> str:
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.llm_queries import (
        LLM_QUERIES,
    )

    fn = LLM_QUERIES[name][0]
    return fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_sample_and_pii_are_pure_projections(spark, sf_dir):
    """The curation filters/projections must not shuffle: their single
    Exchange is the range partitioning for the deterministic output sort,
    not a compute shuffle — the property that makes them free at 100 TB."""
    for name in ("curation_stratified_sample", "curation_pii_scrub"):
        plan = _llm_plan(spark, sf_dir, name)
        assert plan.count("Exchange") == 1, name
        assert "rangepartitioning" in plan, name
        assert "CartesianProduct" not in plan, name


def test_top_terms_rank_pushdown(spark, sf_dir):
    # row_number + rank<=k must keep only k rows per doc before the final
    # window sort (partial WindowGroupLimit), not sort every term
    plan = _llm_plan(spark, sf_dir, "text_top_terms")
    assert plan.count("WindowGroupLimit") >= 1


def test_contamination_no_cross_product(spark, sf_dir):
    # the registered query checkpoints its result (the executed plan is a
    # scan of the checkpoint); inspect the un-checkpointed plan instead
    from airflow_iceberg_pipeline_stock_tracker_spark.operators import curation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = curation.contamination(docs, checkpoint=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the DF-cap window over the benchmark postings is present
    assert "windowspecdefinition(h#" in plan


# ---------------------------------------------------------------------------
# relational_ext plan shapes (plans/relational_ext.py)
# ---------------------------------------------------------------------------


def test_q4_exists_becomes_semi_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q4_order_priority")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    # the discount predicate prunes lineitem at the scan
    assert "GreaterThan(l_discount" in plan


def test_q16_not_in_becomes_broadcast_anti_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q16_supplier_cnt")
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q17_decorrelated_with_part_filter_pushed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q17_small_qty_revenue")
    # the brand filter must reach the part scan, not run post-join
    assert "EqualTo(p_brand,Brand#23)" in plan
    # per-part stats and the part set both broadcast into lineitem
    assert plan.count("BroadcastHashJoin") >= 2


def test_q18_having_set_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q18_large_orders")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_rollup_is_single_expand_single_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "revenue_rollup")
    # grouping sets = ONE Expand feeding one aggregate, never a
    # per-grouping-level re-scan of the fact table
    assert plan.count("Expand") == 1
    assert plan.count("Scan parquet") <= 4  # lineitem+orders+customer+nation


def test_pivot_explicit_values_single_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "returnflag_pivot")
    # explicit pivot values: one lineitem scan, no distinct-discovery job
    assert plan.count("Scan parquet") == 1


def test_window_funcs_share_one_exchange(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_window_funcs")
    # both windows partition by user_id -> a single hash exchange feeds
    # two in-partition sorts (plus the final presentation sort's range
    # exchange); anything more means the windows stopped sharing
    assert plan.count("hashpartitioning(user_id") == 1


def test_merge_upsert_target_never_shuffles(spark, sf_dir):
    plan = _plan(spark, sf_dir, "customer_merge_upsert")
    # three-branch MERGE decomposition: every join builds the (broadcast)
    # changeset side; a FullOuter SortMergeJoin here would mean the
    # whole target shuffles for a day's changeset
    assert "FullOuter" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # anti + inner + insert-anti
    # the only exchanges are the source pre-aggregate and the output sort
    assert "hashpartitioning(c_custkey" not in plan


def test_set_ops_become_semi_anti_joins(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_user_set_ops")
    # INTERSECT -> semi join over distinct sets, EXCEPT -> anti join;
    # never a cross product, never a full materialized set comparison
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_user_trend_is_one_keyed_shuffle_no_python(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_user_trend")
    # the five regression moments combine map-side into ONE user_id
    # exchange; the closing divisions are JVM expressions, not a UDF
    assert plan.count("hashpartitioning(user_id") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q7_dimension_in_two_roles_both_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q7_nation_volume")
    # nation builds twice (customer role + supplier role), plus customer
    # and supplier dims — all broadcast; the fact side never shuffles
    # for a dimension
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_q15_scalar_max_broadcasts_onto_reused_aggregate(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q15_top_supplier")
    # the MAX threshold joins back as a broadcast 1-row relation
    assert "BroadcastHashJoin" in plan
    # the shipdate range reaches the lineitem scan
    assert "GreaterThanOrEqual(l_shipdate" in plan


# ---------------------------------------------------------------------------
# TPC-H suite completion (plans/tpch_suite.py): q2/q8-q12/q19-q22
# ---------------------------------------------------------------------------


def test_q2_offers_reduced_by_both_broadcasts_before_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q2_min_cost_supplier")
    # part (size=15) and the EUROPE supplier set both broadcast into the
    # lineitem scan BEFORE the per-(part,supp) MIN — the only wide
    # exchange is the aggregate itself
    assert plan.count("BroadcastHashJoin") >= 4
    assert "EqualTo(p_size,15)" in plan
    assert "CartesianProduct" not in plan


def test_q8_two_role_nation_all_dims_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q8_market_share")
    # part, customer-nation set, supplier-nation map all broadcast; the
    # only sort-merge-eligible join is fact-to-orders on orderkey
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_q9_profit_expression_stays_jvm_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q9_product_profit")
    # part (name-filtered) and supplier-nation broadcast; the profit
    # arithmetic is whole-stage codegen, never Python
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "StringStartsWith(p_name,blue)" in plan


def test_q10_top20_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q10_returned_items")
    # ORDER BY revenue DESC LIMIT 20 over the customer aggregate must
    # compile to TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan
    # the returnflag predicate reaches the lineitem scan
    assert "EqualTo(l_returnflag,R)" in plan


def test_q11_single_fact_scan_for_scalar_total(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q11_part_value_conc")
    # the per-part aggregate is eagerly materialized (localCheckpoint)
    # at build time, so the returned plan contains NO lineitem scan at
    # all — both consumers (scalar total + filter) read the checkpointed
    # RDD and the fact was scanned exactly once, during the checkpoint
    assert "Scan parquet" not in plan
    assert plan.count("Scan ExistingRDD") >= 2
    assert "CartesianProduct" not in plan


def test_q12_lateness_counts_single_join_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q12_late_lines")
    # the CASE sums fold map-side; the ship-date window reaches the scan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "BatchEvalPython" not in plan


def test_q19_quantity_bound_pushed_and_part_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q19_disjunctive_preds")
    # the union-of-bands quantity bound prunes the fact scan even though
    # the exact OR evaluates post-join
    assert "LessThanOrEqual(l_quantity" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q20_chained_semi_reductions(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q20_excess_suppliers")
    # part-name prefilter broadcast into the fact, survivors semi-join
    # supplier — no full-width join anywhere in the chain
    assert "LeftSemi" in plan
    assert "StringStartsWith(p_name,new)" in plan
    assert "CartesianProduct" not in plan


def test_q21_self_semi_and_anti_joins(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q21_waiting_suppliers")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    # supplier+nation broadcast; result is TakeOrdered, not global sort
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q22_anti_join_on_pruned_orders_projection(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q22_dormant_customers")
    assert "LeftAnti" in plan
    # the dormancy cutoff prunes the orders scan; only o_custkey is read
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# Time-series (plans/timeseries.py)
# ---------------------------------------------------------------------------


def test_gapfill_spine_broadcasts_single_fact_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_gapfill")
    # the dense spine is |hours| x |types| rows (data-volume independent)
    # and must join the hourly aggregate broadcast-side; the only wide
    # exchange is the hourly aggregate of the fact plus the window sort
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_time_range_window_no_self_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_time_range_window")
    # the trailing-1h aggregate is a RANGE frame over one sorted run —
    # never a self-join re-materializing every frame
    assert "Join" not in plan
    assert plan.count("hashpartitioning(user_id") == 1


def test_cube_is_single_expand_single_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_cube")
    # the 4-set lattice fans out map-side via ONE Expand; the fact scans
    # once, never once per grouping set
    assert plan.count("Expand") == 1
    assert plan.count("Scan parquet") == 1


def test_json_props_parse_stays_jvm_with_explicit_schema(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_json_props")
    # from_json with a pinned schema: one JVM projection, no Python, no
    # per-row schema inference, one aggregate exchange
    assert "from_json" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Scan parquet") == 1


def test_aqe_splits_skewed_join_partitions(spark):
    """The skew path the engine leans on at 100 TB (session.py enables
    skewJoin) must actually engage: a sort-merge join with one hot key
    gets its skewed partition split by AQE — visible as `skew=true` on
    the SMJ node of the final adaptive plan. Thresholds are lowered to
    test scale and restored."""
    from pyspark.sql import functions as F

    overrides = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # force SMJ: skew handling only applies to shuffle joins
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prior = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        # 200k rows of key=0 (hot) + 2k spread keys, joined to a dim
        left = spark.range(0, 202_000).select(
            F.when(F.col("id") < 200_000, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("payload"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.col("id").alias("dim")
        )
        df = left.join(right, "k")
        # collect() (not count()) so the inspected QueryExecution is the
        # one that actually ran — count() builds its own QE and the
        # join's plan would still read isFinalPlan=false
        assert len(df.collect()) == 202_000
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_knn_graph_rank_pushdown_no_cartesian(spark, sf_dir):
    # the registered query checkpoints its edges (the executed plan is a
    # scan of the checkpoint); inspect the un-checkpointed plan instead,
    # as the contamination test does
    from airflow_iceberg_pipeline_stock_tracker_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = similarity.knn_graph_df(emb, checkpoint=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # per-src top-k must keep k rows per group before the final sort
    assert plan.count("WindowGroupLimit") >= 1
    assert "CartesianProduct" not in plan


def test_events_ewma_exact_fold(spark, tmp_path):
    """alpha=1/2 EWMA: s = ((v1), (v2+s)/2, ...) over (ts, event_id)
    order — exact halving arithmetic, order pinned by the sort."""
    import datetime as dt

    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import events_ewma

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: values 1, 2, 3 in time order -> ((1+2)/2 + 3)/2 = 2.25
        (10, t0, 1, "a", 1.0, None),
        (11, t0 + dt.timedelta(seconds=1), 1, "a", 2.0, None),
        (12, t0 + dt.timedelta(seconds=2), 1, "a", 3.0, None),
        # user 2: same-timestamp tie broken by event_id: 5 then 9 -> 7.0
        (21, t0, 2, "a", 5.0, None),
        (22, t0, 2, "a", 9.0, None),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(f"{sf}/events.parquet")
    out = {r.user_id: r for r in events_ewma(spark, sf).collect()}
    assert out[1].n_events == 3 and out[1].ewma_value == 2.25
    assert out[2].n_events == 2 and out[2].ewma_value == 7.0


def test_events_quantile_sketch_error_contract(spark, sf_dir):
    """The histogram sketch's answer must sit in [exact, exact + bin
    width] for every (type, q) — the invariant the driver hash pins."""
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        events_quantile_sketch,
    )

    rows = events_quantile_sketch(spark, sf_dir).collect()
    assert rows and {r.q_pct for r in rows} == {50, 95}
    for r in rows:
        assert r.within_one_bin  # sketch bin == bin containing the exact
        # upper-edge answer sits at or above the exact value (up to the
        # ulp of the reconstructed edge — the hashed invariant is the
        # exact integer bin equality above, not this float comparison)
        assert r.sketch_value >= r.exact_value - 1e-9 * max(1.0, abs(r.exact_value))
        assert 0 <= r.sketch_bin <= 127


def test_quantile_histogram_is_mergeable(spark, sf_dir):
    """The scale property the sketch exists for: per-partition histograms
    (same global edges) SUM to the whole-table histogram, so the sketch
    reaggregates across days/partitions without touching raw rows."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    edges = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    w = (F.col("hi") - F.col("lo")) / F.lit(128.0)
    binc = F.least(
        F.floor((F.col("value") - F.col("lo")) / w).cast("int"), F.lit(127)
    )
    binned = ev.crossJoin(F.broadcast(edges)).select(
        "event_id", "event_type", binc.alias("bin")
    )
    whole = {
        (r.event_type, r.bin): r.cnt
        for r in binned.groupBy("event_type", "bin").agg(F.count("*").alias("cnt")).collect()
    }
    half_a = binned.where(F.col("event_id") % 2 == 0)
    half_b = binned.where(F.col("event_id") % 2 == 1)
    merged: dict = {}
    for half in (half_a, half_b):
        for r in half.groupBy("event_type", "bin").agg(F.count("*").alias("cnt")).collect():
            merged[(r.event_type, r.bin)] = merged.get((r.event_type, r.bin), 0) + r.cnt
    assert merged == whole


def test_bm25_topk_is_take_ordered(spark, sf_dir):
    """BM25's top-k must be TakeOrderedAndProject (distributed partial
    top-k), never an unpartitioned global rank window over all matched
    docs."""
    plan = _llm_plan(spark, sf_dir, "text_bm25_search")
    assert "TakeOrderedAndProject" in plan


def test_bpe_tokenize_vocab_join_broadcasts(spark, sf_dir):
    """The word->token-count map is vocabulary-bounded and must
    broadcast into the corpus scan — a shuffle join here would move the
    whole corpus by word at 100 TB."""
    plan = _llm_plan(spark, sf_dir, "text_bpe_tokenize")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_triangle_brand_scope_pushed_and_broadcast(spark, sf_dir):
    """The graphlet census must push the brand scope INTO the part scan
    (a quarter-TB of part metadata at 100 TB otherwise) and broadcast
    the scoped dimension into the lineitem probe. The registered query
    checkpoints the edge list (its plan therefore starts at the
    checkpoint), so the scan-side assertions target the edge-building
    stage the checkpoint materializes."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.graphlets import (
        copurchase_edges,
    )
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import (
        load_table,
    )

    edges = copurchase_edges(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )
    plan = edges._jdf.queryExecution().executedPlan().toString()
    assert "StringStartsWith(p_brand,Brand#1)" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the census over the materialized edges must stay equi-join-only
    census = _plan(spark, sf_dir, "parts_triangle_count")
    assert "CartesianProduct" not in census
    assert "BroadcastNestedLoopJoin" not in census


def test_abc_analysis_scan_pruned_to_two_columns(spark, sf_dir):
    """ABC reads a 16-column fact for a 2-column aggregate — the scan
    must prune to (l_partkey, l_extendedprice)."""
    plan = _plan(spark, sf_dir, "orders_abc_analysis")
    assert "ReadSchema: struct<l_partkey:bigint,l_extendedprice:double>" in plan


def test_attribution_pushes_type_filters(spark, sf_dir):
    """Both attribution scans are type-filtered slices of events; the
    IN/EQ predicates must reach the parquet readers."""
    plan = _plan(spark, sf_dir, "events_attribution")
    assert "EqualTo(event_type,purchase)" in plan
    assert "In(event_type, [click,view])" in plan or (
        "In(event_type, [view,click])" in plan
    )


def test_decay_topk_ranks_inside_type_partitions(spark, sf_dir):
    """The leaderboard's rank<=10 must run as a WindowGroupLimit inside
    each type partition (partial top-k before the final sort), never a
    global sort of every (type, user) score."""
    plan = _plan(spark, sf_dir, "events_decay_topk")
    assert plan.count("WindowGroupLimit") >= 1


def test_pair_corr_broadcasts_date_join_single_pair_exchange(spark, sf_dir):
    """The pair self-join keys on date over the BOUNDED tickers-x-days
    frame — it must broadcast (never shuffle two full change frames for
    a 15-row answer), and the four rank/tie windows must share ONE
    (t1, t2) exchange: hash partitioning on (t1, t2) already co-locates
    the (t1, t2, x) tie-count partitions, so any extra exchange between
    the windows is a planner regression."""
    from airflow_iceberg_pipeline_stock_tracker_spark.operators.finance import (
        spearman_pairs,
    )
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.prices import (
        prices_standin,
    )

    df = spearman_pairs(prices_standin(spark, sf_dir))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    post_join = plan.split("BroadcastHashJoin")[0]
    assert post_join.count("Exchange") <= 2, (
        "windows + final agg should reuse the (t1,t2) partitioning: "
        "one pair exchange plus the 15-row ordered output exchange"
    )


def test_top_paths_two_exchanges_and_takeordered(spark, sf_dir):
    """Path mining must be: ONE user_id exchange feeding all three
    windows AND the per-session aggregate (hash partitioning on user_id
    subsumes (user_id, session_seq)), one path exchange with map-side
    partial aggregation, and a TakeOrderedAndProject top-k — never a
    global sort of every path."""
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.queries import (
        events_top_paths,
    )

    plan = (
        events_top_paths(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange") == 2
    assert "partial_collect_list" in plan


def test_twap_window_partitions_by_type_and_day(spark, sf_dir):
    """The lead window must key on (event_type, day), not event_type
    alone: event_type has ~8 values, so a type-only window sort holds
    ~1/8 of ALL history in one task at 100 TB. The no-midnight-carry
    contract makes the day-bounded window hash-identical (r9 verdict)."""
    import re

    plan = _plan(spark, sf_dir, "events_twap")
    # the lead window's spec carries BOTH keys (day is the projected
    # _w1 truncation expression)
    assert re.search(
        r"windowspecdefinition\(event_type#\d+, _w\d+#\d+,", plan
    ), plan
    # and its feeding exchange hashes on both
    assert re.search(
        r"hashpartitioning\(event_type#\d+, _w\d+#\d+", plan
    ), plan


def test_conversion_lag_has_no_global_window(spark, sf_dir):
    """Order statistics must be the distributed two-pass selection: the
    only Window node partitions by the range bucket — never a global
    Window.orderBy pushing every converter through one task (r9
    verdict). The sole SinglePartition exchange is the final 1-row
    aggregate."""
    plan = _plan(spark, sf_dir, "events_conversion_lag")
    win_lines = [l for l in plan.splitlines() if "Window [" in l]
    assert len(win_lines) == 1, plan
    assert ", [bkt#" in win_lines[0], win_lines[0]
    # the old plan's global row_number ranking is gone
    assert "row_number" not in plan


def test_winnowing_is_pure_projection_no_python(spark, sf_dir):
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.llm_queries import (
        LLM_QUERIES,
    )

    plan = (
        LLM_QUERIES["text_winnowing"][0](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # per-row array computation: only the spread repartition and the
    # presentation sort move data; selection stays JVM-side
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2


def test_parts_jaccard_no_part_side_hint_no_global_sort(spark, sf_dir):
    import __spark_entry__ as entrymod

    qe = (
        entrymod.queries()["parts_jaccard_similarity"](spark, sf_dir)
        ._jdf.queryExecution()
    )
    plan = qe.executedPlan().toString()
    # top-k is TakeOrdered; the basket self-join is an equi-join (never
    # a cartesian product)
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    # the per-part support side grows with SF: no hard broadcast hint
    # may pin the full part dimension driver-side — AQE decides (small
    # SF: broadcast; 100 TB: co-partitioned hash join on the part key)
    assert "ResolvedHint" not in qe.analyzed().toString()


def test_macd_single_ticker_shuffle_no_python(spark, sf_dir):
    import __spark_entry__ as entrymod

    plan = (
        entrymod.queries()["prices_macd"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one groupBy(ticker) collects the ordered series; the fold is a JVM
    # higher-order aggregate, never Python. (The (ticker, date) exchange
    # below it is the prices_standin derivation's own aggregate.)
    import re

    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert len(re.findall(r"hashpartitioning\(ticker#\d+, \d+\)", plan)) == 1


def test_donchian_no_python_no_join(spark, sf_dir):
    import __spark_entry__ as entrymod

    plan = (
        entrymod.queries()["prices_donchian"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
    # standin derivation agg + window partition + presentation sort
    assert plan.count("Exchange") <= 3


def test_seasonality_collapses_before_window(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_hourofweek_seasonality")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
    # fact-table groupBy, then window + sort over the bounded profile
    assert plan.count("Exchange") <= 3


def test_ship_sla_histogram_no_hint_no_cartesian(spark, sf_dir):
    import __spark_entry__ as entrymod

    qe = (
        entrymod.queries()["orders_ship_sla"](spark, sf_dir)
        ._jdf.queryExecution()
    )
    plan = qe.executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the orderkey join must stay hint-free (both sides scale with SF)
    assert "ResolvedHint" not in qe.analyzed().toString()
    # everything after the histogram groupBy is dimension-bounded
    assert plan.count("Exchange") <= 6


def test_quantile_sketch_single_scalar_attach(spark, sf_dir):
    """r11 verdict ask #8: the (lo, hi) global scalar attaches to the
    fact scan ONCE and rides the aggregates after that; the q_pct frame
    is an explode of literals (Generate, not a join). Was 7 physical
    BroadcastNestedLoopJoins before the rewrite."""
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        events_quantile_sketch,
    )

    plan = (
        events_quantile_sketch(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "Generate" in plan  # the literal q_pct explode


def test_hll_setops_no_nested_loop_joins(spark, sf_dir):
    """r11 verdict ask #8: the pair spine is a double explode of the
    one-row collected type set and the exact-union grader is a UNION of
    two equi-joins — zero nested-loop joins anywhere (was 4)."""
    from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (
        events_hll_setops,
    )

    plan = (
        events_hll_setops(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_aroon_no_python_no_join(spark, sf_dir):
    import __spark_entry__ as entrymod

    plan = (
        entrymod.queries()["prices_aroon"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
    # standin derivation agg + window partition + presentation sort —
    # the donchian class: both packed-key maxes ride ONE (ticker, date)
    # window exchange
    assert plan.count("Exchange") <= 3
