"""Physical-plan contracts: the scale properties docs/PLAN_AUDIT.md claims
are asserted here so a regression (a lost pushdown, a join that stops
broadcasting, a nested-loop sneaking in) fails CI instead of surfacing at
100 TB.  Checks read the AQE-final/initial physical plan string — coarse,
but exactly what `.explain("formatted")` shows a human."""

from __future__ import annotations

import pytest

from cocktails_data_engineering_spark.plans import queries as plans


def _plan(spark, sf_dir, name: str) -> str:
    df = plans.all_queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_reach_the_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    # the shipdate range must be pushed, not evaluated post-scan only
    assert "GreaterThanOrEqual(l_shipda" in plan or "GreaterThanOrEqual(l_shipdate" in plan
    # projection pruned: no column outside the 4 the query touches
    assert "l_returnflag" not in plan


def test_q1_projection_pruned(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [" in plan
    assert "l_partkey" not in plan  # untouched column never read


def test_star_join_broadcasts_every_dim(spark, sf_dir):
    plan = _plan(spark, sf_dir, "broadcast_join_dims")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_never_global_sorts(spark, sf_dir):
    for name in ("sort_limit_topk", "q3_shipping_priority", "q10_returned_item_revenue"):
        plan = _plan(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in plan, name


@pytest.mark.parametrize(
    "name",
    [
        "minhash_near_dedup",
        "simhash_dedup",
        "embedding_near_dup_pairs",
        "ann_cosine_lsh",
        "ngram_jaccard_dedup",
    ],
)
def test_lsh_family_has_no_quadratic_join(spark, sf_dir, name):
    if name == "minhash_near_dedup":
        # the registered face returns a session-cached checkpoint (a scan
        # plan); the contract must inspect the UNCACHED candidate plan
        from cocktails_data_engineering_spark.operators.dedup import (
            build_minhash_candidates,
        )

        df = build_minhash_candidates(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
    else:
        plan = _plan(spark, sf_dir, name)
    assert "BroadcastNestedLoopJoin" not in plan, name
    assert "CartesianProduct" not in plan, name


def test_semi_anti_decorrelation(spark, sf_dir):
    q4 = _plan(spark, sf_dir, "q4_priority_late_ship")
    assert "LeftSemi" in q4
    q22 = _plan(spark, sf_dir, "q22_wealthy_inactive")
    assert "LeftAnti" in q22
    q21 = _plan(spark, sf_dir, "q21_waiting_suppliers")
    assert "LeftSemi" in q21 and "LeftAnti" in q21


def test_no_row_at_a_time_python_udf(spark, sf_dir):
    """Python in plans only as Arrow-batched stages (ArrowEvalPython /
    FlatMapGroupsInPandas / MapInPandas) — a BatchEvalPython node is the
    row-at-a-time slow path and must never appear."""
    for name in ("extract_links_udf", "media_feature_extract", "crawl_pipeline_e2e"):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name


def test_snapshot_diff_is_one_copartitioned_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "snapshot_diff_orders")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # full-outer CDC diff must be a single key-partitioned join
    assert "SortMergeJoin" in plan
    assert plan.count("FullOuter") == 1


def test_pq_adc_codebook_and_lut_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pq_adc_topk")
    # the code table streams through broadcast joins; no N×N anywhere
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_contamination_probe_has_no_nested_loop(spark, sf_dir):
    plan = _plan(spark, sf_dir, "eval_contamination_overlap")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_block_checksum_is_one_partial_aggregate(spark, sf_dir):
    """The reconciliation checksum must stay map-only + one combined
    shuffle: no join, no window, exactly one exchange (partial → final
    HashAggregate around it)."""
    plan = _plan(spark, sf_dir, "block_checksum_orders")
    assert "Join" not in plan
    assert "Window" not in plan
    assert plan.count("Exchange") <= 2  # shuffle + AQE read, never more


def test_hll_rollup_reuses_sketches_not_raw_rows(spark, sf_dir):
    """The __all__ ESTIMATE must come from unioning per-type sketches —
    never a rescan.  (Since the r9 bounded-contract promotion the query
    also carries the exact COUNT DISTINCT legs the contract compares
    against, so the old count-distinct ban no longer applies; the union
    node is the property that matters.)"""
    plan = _plan(spark, sf_dir, "hll_distinct_by_type")
    assert "hll_union_agg" in plan
    # the sketch-building aggregate runs ONCE at build time into a
    # checkpoint; consumption must not rebuild sketches from raw events
    assert plan.count("hll_sketch_agg") == 0


def test_lexical_pairs_no_quadratic_join(spark, sf_dir):
    """Inverted-index candidate generation must stay an equi-join on word
    (cost Σ df²) — never a cartesian/nested-loop over doc pairs — and the
    stop-word cap plus corpus-size row must ride broadcasts."""
    plan = _plan(spark, sf_dir, "lexical_cosine_pairs")
    # (a 1-row BroadcastNestedLoopJoin for the corpus-size scalar is fine;
    # an unpartitioned CartesianProduct over docs is not)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_resample_spine_broadcasts_types(spark, sf_dir):
    """The spine × types expansion is tiny-side work: the distinct-type
    dimension must broadcast, and the hourly aggregate join must not
    degenerate into a nested loop."""
    plan = _plan(spark, sf_dir, "resample_fill_hourly")
    assert "CartesianProduct" not in plan


def test_triangle_count_stays_equi_joined(spark, sf_dir):
    """Degree-oriented triangle counting must run on equi-joins (wedge
    build + closing-edge probe) — no cartesian anywhere."""
    plan = _plan(spark, sf_dir, "cooccurrence_triangle_stats")
    assert "CartesianProduct" not in plan


def test_incremental_dedup_collapses_corpus_buckets(spark, sf_dir):
    """The batch-vs-corpus probe must join against the AGGREGATED bucket
    table (one anchor row per bucket), never the raw corpus band rows —
    that aggregation is what removes the bucket² risk."""
    plan = _plan(spark, sf_dir, "incremental_minhash_dedup")
    assert "CartesianProduct" not in plan
    assert "min(doc_id)" in plan or "min(anchor)" in plan or "HashAggregate" in plan


def test_semantic_dedup_pair_join_is_cluster_keyed(spark, sf_dir):
    """SemDeDup's whole point is that the pair search is an equi-join on
    the cluster id (cost Σ cluster², never N²).  The only Cross nodes
    allowed are the k-row centroid broadcasts of the Lloyd assignment."""
    plan = _plan(spark, sf_dir, "semantic_dedup_clusters")
    assert "CartesianProduct" not in plan
    import re

    pair_joins = [
        ln
        for ln in plan.splitlines()
        if re.search(r"(SortMergeJoin|ShuffledHashJoin) \[cid", ln) and "Inner" in ln
    ]
    assert pair_joins, "within-cluster pair join must be keyed on cid"


def test_mixture_sample_rates_broadcast(spark, sf_dir):
    """The per-domain rate table (|domains| rows) must broadcast onto the
    scan; the keep decision is map-side — no shuffle of the documents."""
    plan = _plan(spark, sf_dir, "domain_mixture_sample")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_runtime_bloom_filter_prefilters_probe_side(spark, sf_dir):
    """Scale capability check: when a shuffle join's build side carries a
    selective predicate, Spark's runtime bloom filter must inject a
    might_contain pre-filter on the probe side (InjectRuntimeFilter) —
    the engine-native version of the visited-set pre-filter that saves
    shuffling probe rows that cannot match.  Guarded conf changes only;
    thresholds are test-scale stand-ins for cluster defaults (10 GB scan
    threshold)."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1"
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in optimized
        # and the result is unaffected by the injected filter
        [row] = j.collect()
        expected = (
            li.join(orders.hint("broadcast"), li.l_orderkey == orders.o_orderkey).count()
        )
        assert row["count"] == expected
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_fuzzy_join_blocks_on_variant_key(spark, sf_dir):
    """The ED-1 fuzzy join must get its candidates from an equi-join on
    the deletion-variant key — never a levenshtein cross join."""
    plan = _plan(spark, sf_dir, "fuzzy_join_ed1")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_topk_never_global_sorts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "bm25_keyword_search")
    assert "TakeOrderedAndProject" in plan


def test_containment_join_is_df_pruned_equi_join(spark, sf_dir):
    """Containment pairs must come from the shared-shingle equi-join
    (bounded by the df prune) — never an all-pairs comparison."""
    plan = _plan(spark, sf_dir, "containment_dup_pairs")
    assert "CartesianProduct" not in plan


def test_sorted_neighborhood_window_is_partitioned(spark, sf_dir):
    """The SN sort must be partitioned by the blocking key (first char):
    a single-partition global sort would serialize the token domain."""
    plan = _plan(spark, sf_dir, "sorted_neighborhood_pairs")
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan


def test_naive_bayes_scores_through_equi_join(spark, sf_dir):
    """NB scoring joins doc terms to (word, lang) stats on the word key;
    the only nested-loop is the broadcast of the |langs|-row model."""
    plan = _plan(spark, sf_dir, "naive_bayes_lang_confusion")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_zipf_topn_never_global_sorts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "zipf_fit_words")
    assert "TakeOrderedAndProject" in plan


def test_pareto_frontier_windows_daily_aggregate_only(spark, sf_dir):
    """The skyline's running max must run AFTER the per-day rollup: the
    (single-partition, calendar-sized) window sits above an aggregate,
    never above the raw orders scan."""
    df = plans.all_queries()["pareto_frontier_orders"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    w = plan.find("Window")
    agg = plan.find("HashAggregate")
    assert w != -1 and agg != -1
    # plan strings print top-down: the window node appears above (before)
    # the aggregate it consumes
    assert w < agg


def test_embedding_drift_no_quadratic_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "embedding_drift_by_label")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_aligned_block_dedup_no_quadratic_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "aligned_block_dedup")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_running_sum_family_has_no_global_window(spark, sf_dir):
    """AUC / KS cumulate over distinct scores via the two-phase
    range-partitioned pattern: the plan must contain no single-partition
    exchange feeding a Window (the global-sort bottleneck the helper
    exists to avoid).  The only SinglePartition allowed is the final
    one-row aggregate."""
    for name in ("roc_auc_orders", "ks_statistic_status"):
        plan = _plan(spark, sf_dir, name)
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Window" in ln and "WindowGroupLimit" not in ln:
                ctx = "\n".join(lines[i : i + 6])
                assert "SinglePartition" not in ctx, f"{name}: global window:\n{ctx}"


def test_bloom_prefilter_is_single_fact_scan(spark, sf_dir):
    """The bloom readout must scan the fact table once (flag + aggregate),
    not once per output counter, and join only by broadcast."""
    plan = _plan(spark, sf_dir, "bloom_prefilter_join")
    assert plan.count("orders.parquet") <= 1
    assert "SortMergeJoin" not in plan


def test_assoc_rules_pair_join_is_orderkey_keyed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "assoc_rules_brands")
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k by lift, no global sort


def test_countmin_probe_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "countmin_word_freq")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ivm_join_delta_never_rejoins_old_with_old_twice(spark, sf_dir):
    """Four branch joins (V_old + three deltas) — all equi-joins on the
    order key, no nested loop anywhere."""
    plan = _plan(spark, sf_dir, "ivm_join_delta")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_new_topk_queries_never_global_sort(spark, sf_dir):
    for name in ("weighted_sample_docs", "rrf_hybrid_retrieval", "ndcg_orders"):
        plan = _plan(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in plan, name


def test_udtf_and_datasource_python_stages_are_arrow(spark, sf_dir):
    """The UDTF chunker must run as an Arrow-batched UDTF stage, never the
    pickled row-at-a-time evaluator; the Python DataSource scan is a
    planned source node, not a Python eval stage in the query body."""
    plan = _plan(spark, sf_dir, "udtf_chunk_expand")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPythonUDTF" in plan or "EvalPythonUDTF" in plan
    ds_plan = _plan(spark, sf_dir, "python_datasource_scan")
    assert "BatchEvalPython" not in ds_plan


def test_global_plan_invariants_all_queries(spark, sf_dir):
    """Engine-wide physical-plan invariants, swept over EVERY registered
    batch query (streaming queries execute on build, so they are swept
    by their own runs):

    - no CartesianProduct anywhere — every crossJoin in the repo is a
      1-row broadcast bound, which plans as BroadcastNestedLoopJoin,
      never a partitioned cartesian;
    - no BatchEvalPython anywhere — Python appears only as Arrow-batched
      stages (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas /
      ArrowEvalPythonUDTF) or below a DataSource scan.
    """
    skipped_prefixes = ("stream_",)
    side_effect = {"jdbc_roundtrip"}  # writes on plan build
    failures = []
    for name, fn in plans.all_queries().items():
        if name.startswith(skipped_prefixes) or name in side_effect:
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover - diagnostic path
            failures.append(f"{name}: plan build failed: {e}")
            continue
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct")
        if "BatchEvalPython" in plan:
            failures.append(f"{name}: BatchEvalPython")
    assert not failures, failures


def test_cusum_windows_are_per_type_over_preaggregated_series(spark, sf_dir):
    """CUSUM's cumsum + running-min windows must partition by event_type
    (never a single global partition) and must consume the hourly
    pre-aggregate, so partition width is |hours|, not |events|."""
    plan = _plan(spark, sf_dir, "cusum_hourly_shift")
    assert "windowspecdefinition(event_type" in plan
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan


def test_km_risk_sets_build_on_combinable_aggregates(spark, sf_dir):
    """Kaplan-Meier: MIN(l_shipdate) per order must map-side combine
    (partial_min before the shuffle), the N-total join must broadcast,
    and the survival windows run over the distinct-duration aggregate —
    a calendar-bounded series, the documented exception to the
    no-global-window rule."""
    plan = _plan(spark, sf_dir, "survival_km_shipping")
    assert "partial_min" in plan
    assert "BroadcastExchange" in plan or "BroadcastQueryStage" in plan
    assert "CartesianProduct" not in plan


def test_passjoin_candidates_come_from_equi_join(spark, sf_dir):
    """PassJoin tau=2: candidates must come from the (seg, i, l) hash
    join — never a quadratic nested-loop — and the levenshtein verify
    must sit above the join, not inside a cross product."""
    plan = _plan(spark, sf_dir, "passjoin_ed2_words")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan


def test_quality_rules_and_quantize_are_map_only_jvm(spark, sf_dir):
    """Gopher rules and int8 quantization are higher-order-function
    passes: no Python stage, and (for quantization) no exchange at all —
    the cheapest possible shape for a 100 TB text/embedding scan."""
    for name in ("gopher_quality_rules", "int8_quantize_embeddings"):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
    # quantization adds no KEYED exchange (load_spread's round-robin file
    # spread is the only allowed repartition)
    plan = _plan(spark, sf_dir, "int8_quantize_embeddings")
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan


def test_vocab_oov_topn_is_broadcast_takeordered(spark, sf_dir):
    """The vocabulary is a top-N (never a global sort) and rejoins the
    token stream by broadcast (never a shuffled join on word)."""
    plan = _plan(spark, sf_dir, "vocab_oov_stats")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_politeness_window_partitions_per_agent(spark, sf_dir):
    """The lag window must be hash-partitioned on user_id — a
    SinglePartition exchange feeding the Window would serialize the
    whole fetch log through one task."""
    plan = _plan(spark, sf_dir, "politeness_gap_audit")
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Window" in ln and "WindowGroupLimit" not in ln:
            ctx = "\n".join(lines[i : i + 6])
            assert "SinglePartition" not in ctx, f"global window:\n{ctx}"


def test_embedding_audits_are_map_only_folds(spark, sf_dir):
    """Matryoshka and quantization-error audits must be single-scan
    higher-order folds: no Python stage, no join; the only exchange is
    the tiny label/(label,dim) groupBy."""
    for name in ("matryoshka_truncation_stats", "quantization_error_audit"):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "Join" not in plan, name


def test_ann_recall_audit_quadratic_leg_is_exact_only(spark, sf_dir):
    """The recall audit may contain exactly ONE nested-loop join — the
    broadcast brute-force baseline it measures against.  The LSH leg and
    the final hit-join must stay equi-keyed."""
    plan = _plan(spark, sf_dir, "ann_recall_audit")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_partitioned_read_prunes_at_planning_time(spark, sf_dir):
    """The priority filter must resolve against hive partition directories
    (PartitionFilters), not survive as a post-scan data filter — this is
    the 100 TB scan-avoidance mechanism itself."""
    plan = _plan(spark, sf_dir, "partitioned_write_prune_agg")
    pf = [ln for ln in plan.splitlines() if "PartitionFilters:" in ln]
    assert pf and "o_orderpriority" in pf[0]
    # the IN list itself must live in PartitionFilters (directory-level
    # pruning), never as a pushed/post-scan data filter
    assert "1-URGENT" in pf[0]


def test_schema_evolution_read_merges_without_python(spark, sf_dir):
    plan = _plan(spark, sf_dir, "parquet_schema_evolution_agg")
    assert "BatchEvalPython" not in plan
    assert "quality" in plan  # evolved column visible to the unified scan


# ---------------------------------------------------------------------------
# Round-8 contracts: intended plan shapes for the r6/r7 operator families
# (r6 ask #7) — the global sweep only asserts the anti-pattern floor.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name", ["ivfadc_topk", "ivfpq_residual_topk", "ivfadc_rerank_topk"]
)
def test_ivf_pq_luts_broadcast_and_equi_join(spark, sf_dir, name):
    """The ADC lookup tables and coarse centroids are metadata-sized and
    must reach the CODE TABLE by BROADCAST equi-joins — a shuffled or
    nested-loop candidate join is the O(Q·N) failure the IVF structure
    exists to avoid.  The only nested loops allowed are broadcast
    CROSSES between quantizer-metadata sides (queries x coarse
    centroids for nprobe cell selection / LUT construction: Q·K_COARSE
    rows, independent of corpus size); every join that touches the
    corpus-sized code table must be a BroadcastHashJoin."""
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastHashJoin" in plan, name
    for ln in plan.splitlines():
        if "BroadcastNestedLoopJoin" in ln:
            assert "Cross" in ln, f"{name}: non-cross nested loop:\n{ln}"
    assert plan.count("BroadcastNestedLoopJoin") <= 3, name


def test_logistic_gd_plan_is_aggregate_only(spark, sf_dir):
    """Gradient descent = per-round 1-row gradient AGGREGATES; the final
    weights table must contain no window, no join of the fact with
    itself, and no Python stage."""
    plan = _plan(spark, sf_dir, "logistic_regression_gd")
    assert "BatchEvalPython" not in plan
    for i, ln in enumerate(plan.splitlines()):
        if "Window" in ln and "WindowGroupLimit" not in ln:
            raise AssertionError(f"logistic_regression_gd: window node:\n{ln}")


def test_bootstrap_window_sees_only_replica_aggregate(spark, sf_dir):
    """The only Window (rank of 32 replica means) must be fed by the
    32-group aggregate — never by the exploded fact rows.  The explode
    itself must flow into a partial aggregate with no shuffle between."""
    plan = _plan(spark, sf_dir, "bootstrap_ci_order_value")
    lines = plan.splitlines()
    windows = [i for i, ln in enumerate(lines)
               if "Window" in ln and "WindowGroupLimit" not in ln]
    assert len(windows) == 1, f"expected 1 window, got {len(windows)}"
    ctx = "\n".join(lines[windows[0]: windows[0] + 8])
    assert "HashAggregate" in ctx, f"window not fed by the replica aggregate:\n{ctx}"


def test_dsir_delta_table_broadcasts(spark, sf_dir):
    """DSIR's hashed-unigram log-ratio table is vocabulary-sized metadata
    and must broadcast onto the document scan — shuffling the corpus by
    token to meet it would be the 100 TB bottleneck."""
    plan = _plan(spark, sf_dir, "dsir_importance_resample")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ewma_weights_broadcast_onto_rollup_sized_join(spark, sf_dir):
    """The exact-decimal weights table must broadcast, and the triangular
    self-join must run on the daily ROLLUP (the fact table is scanned at
    most twice — once per self-join side — and never nested-looped)."""
    plan = _plan(spark, sf_dir, "ewma_daily_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("events.parquet") <= 2


def test_el2n_decile_window_runs_on_value_rollup_only(spark, sf_dir):
    """EL2N scoring is a literal-weight projection (the GD weights are
    driver scalars); the rank-based decile table is built from the
    VALUE ROLLUP (≤1e6+1 distinct 6-dp scores), so the only Window must
    be fed by a HashAggregate — never an NTILE/global sort of the fact —
    and the decile table reaches the fact scan by broadcast."""
    plan = _plan(spark, sf_dir, "el2n_prune_deciles")
    lines = plan.splitlines()
    windows = [i for i, ln in enumerate(lines)
               if "Window" in ln and "WindowGroupLimit" not in ln]
    assert len(windows) == 1, f"expected 1 window, got {len(windows)}"
    ctx = "\n".join(lines[windows[0]: windows[0] + 10])
    assert "HashAggregate" in ctx, f"window not fed by the value rollup:\n{ctx}"
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # decile table broadcast onto scored
    assert plan.count("orders.parquet") <= 3


def test_kcenter_rounds_are_map_side_folds(spark, sf_dir):
    """The greedy traversal runs at build time as O(K) rounds of
    (map-side fold against one literal center) + (1-row argmax collect)
    — the kmeans/BPE driver-scalar pattern.  Contract: the returned
    DataFrame is a driver-local K-row table (no distributed recompute at
    consumption), and a single round's running-min projection is
    join-free and exchange-free (pure map over the materialized state)."""
    from pyspark.sql import functions as F

    from cocktails_data_engineering_spark.operators import clustering as C

    plan = _plan(spark, sf_dir, "kcenter_coreset_sample")
    assert "LocalTableScan" in plan or "ExistingRDD" in plan
    for bad in ("Join", "Exchange", "parquet"):
        assert bad not in plan, f"kcenter result recomputes distributed work:\n{plan}"

    vecs = C._vectors(spark, sf_dir)
    center = [0.0] * len(vecs.select("emb").first()["emb"])
    lit = F.array(*[F.lit(v) for v in center])
    rnd = vecs.select(
        "vec_id",
        "emb",
        F.round(
            F.aggregate(
                F.zip_with("emb", lit, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("d"),
    )
    round_plan = rnd._jdf.queryExecution().executedPlan().toString()
    # _vectors' RoundRobin load-spread repartition is the one allowed
    # exchange; a keyed (hash) exchange or any join would mean the fold
    # stopped being a pure map over the materialized state.
    for bad in ("Join", "hashpartitioning", "BatchEvalPython"):
        assert bad not in round_plan, f"kcenter round not map-only:\n{round_plan}"


def test_fertility_is_one_scan_one_rollup(spark, sf_dir):
    """Tokenizer-fertility counting is codegen'd per-doc arithmetic plus
    one ≤n_langs-group aggregate: exactly one scan of the corpus, no
    joins, no Python."""
    plan = _plan(spark, sf_dir, "tokenizer_fertility_stats")
    assert plan.count("documents.parquet") == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_temperature_mixture_touches_scan_once(spark, sf_dir):
    """The alpha-sampling weights are computed entirely on the per-source
    rollup: the corpus is scanned exactly once and the one-row normalizer
    reaches the rollup by broadcast, never a shuffle."""
    plan = _plan(spark, sf_dir, "temperature_mixture_weights")
    assert plan.count("documents.parquet") == 1
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_rho_loss_quartile_window_on_value_rollup(spark, sf_dir):
    """RHO scoring is a literal-weight projection (both GD models arrive
    as driver scalars); the rank-based quartile table is built from the
    distinct-rho VALUE ROLLUP — the only Window must be fed by a
    HashAggregate, the quartile table must broadcast back, and the fact
    is never nested-looped."""
    plan = _plan(spark, sf_dir, "rho_loss_selection")
    lines = plan.splitlines()
    windows = [i for i, ln in enumerate(lines)
               if "Window" in ln and "WindowGroupLimit" not in ln]
    assert len(windows) == 1, f"expected 1 window, got {len(windows)}"
    ctx = "\n".join(lines[windows[0]: windows[0] + 10])
    assert "HashAggregate" in ctx, f"window not fed by the value rollup:\n{ctx}"
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_doremi_count_tables_join_without_cartesian(spark, sf_dir):
    """DoReMi's proxy/reference NLLs reuse the TF-IDF shape: the explode
    feeds vocabulary-sized count tables joined back on their natural keys
    (partial-aggregated equi-joins); the only non-equi join is the
    broadcast of the one-row normalizer.  Nothing nested-loops the
    corpus."""
    plan = _plan(spark, sf_dir, "doremi_domain_reweight")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_hits_consumption_plan_is_checkpointed(spark, sf_dir):
    """Each HITS round materializes (lineage truncation, the pagerank
    device), so the RETURNED frame joins two round-sized score tables —
    consuming it must never recompute the iterative chain from parquet."""
    plan = _plan(spark, sf_dir, "hits_hub_authority")
    assert "parquet" not in plan, f"HITS result recomputes from parquet:\n{plan}"
    assert "BatchEvalPython" not in plan


def test_token_budget_plan_touches_scan_once(spark, sf_dir):
    """All epoch-plan arithmetic runs on the per-source token rollup: the
    corpus is scanned exactly once, with no join back to the fact."""
    plan = _plan(spark, sf_dir, "token_budget_epoch_plan")
    assert plan.count("documents.parquet") == 1
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_minhash_estimate_audit_stays_candidate_keyed(spark, sf_dir):
    """The estimator audit must add only candidate-keyed equi-joins back
    to the doc-sized mins/counts tables on top of the LSH candidate plan
    — never an all-pairs comparison of signature vectors."""
    plan = _plan(spark, sf_dir, "minhash_jaccard_estimate_audit")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_dedup_preview_reuses_one_pair_computation(spark, sf_dir):
    """The preview's pair set is computed once and CHECKPOINTED (the
    detector is population-independent, so the sample leg is a filter of
    the full pairs, never a second block join) — consuming the result
    must not re-run the block self-join, and nothing nested-loops."""
    plan = _plan(spark, sf_dir, "dedup_rate_preview")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the (i, h) block self-join ran at build time into the checkpoint:
    # pairs arrive as an ExistingRDD scan, and no block explode (the
    # per-quarter slice/array_join projection) appears at consumption
    assert "ExistingRDD" in plan, "pairs not consumed from the checkpoint"
    assert "array_join" not in plan, "block hashing re-runs at consumption"


def test_cdc_chunk_join_is_hash_keyed_and_df_capped(spark, sf_dir):
    """The CDC pair join must be an equi-join on the chunk hash over the
    CHECKPOINTED df-capped signature table — per-doc windows partition on
    doc_id (no global sort), nothing nested-loops."""
    plan = _plan(spark, sf_dir, "cdc_chunk_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "ExistingRDD" in plan  # capped signature table consumed from checkpoint


def test_spearman_rank_windows_run_on_value_rollups(spark, sf_dir):
    """Both rank tables must be windows over DISTINCT-VALUE rollups
    broadcast back onto the joined signal table (the el2n device) — never
    a global row_number over the fact — and the moments are one
    aggregate."""
    plan = _plan(spark, sf_dir, "spearman_entropy_fluency")
    lines = plan.splitlines()
    windows = [i for i, ln in enumerate(lines)
               if "Window" in ln and "WindowGroupLimit" not in ln]
    assert len(windows) == 2, f"expected 2 rank windows, got {len(windows)}"
    for w in windows:
        ctx = "\n".join(lines[w: w + 10])
        assert "HashAggregate" in ctx, f"rank window not fed by a rollup:\n{ctx}"
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_detector_agreement_consumes_checkpoints(spark, sf_dir):
    """All four detector candidate plans run at build time into
    checkpoints; the returned 6-row table is driver-local — consuming it
    must not re-run any detector."""
    plan = _plan(spark, sf_dir, "dedup_detector_agreement")
    assert "parquet" not in plan, f"a detector re-runs at consumption:\n{plan}"
    assert "BatchEvalPython" not in plan


def test_vocab_coverage_uses_takeordered_legs(spark, sf_dir):
    """Each k-leg must be a TakeOrdered top-k off the materialized vocab
    table — a global Sort (or an unpartitioned row_number window) over
    the vocabulary would be the 10^8-row web-corpus failure mode."""
    plan = _plan(spark, sf_dir, "vocab_coverage_curve")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_media_header_decode_is_one_arrow_stage(spark, sf_dir):
    """Plant+parse run inside mapInPandas (Arrow batches); no row-at-a-time
    Python anywhere."""
    plan = _plan(spark, sf_dir, "media_header_decode")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_cumsum_family_has_no_unpartitioned_window(spark, sf_dir):
    """packing_boundary_stats and webdataset_shard_manifest run their
    global cumsum through the range-repartition two-phase helper; any
    Window in the plan must carry a partition spec (the _pid local
    window), never an empty one."""
    import re

    for name in ("packing_boundary_stats", "webdataset_shard_manifest"):
        plan = _plan(spark, sf_dir, name)
        for m in re.finditer(r"Window \[[^\]]*\], \[\]", plan):
            raise AssertionError(f"{name}: unpartitioned window:\n{m.group(0)}")
        assert "CartesianProduct" not in plan, name


def test_contamination_and_repetition_stay_gram_keyed(spark, sf_dir):
    for name in ("contamination_ngram_audit", "intra_doc_repetition"):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BatchEvalPython" not in plan, name


def test_grouping_set_expands_run_over_preaggregates(spark, sf_dir):
    """r11 aggregate rework contract: CUBE/ROLLUP's Expand must consume the
    BASE-GRAIN pre-aggregate (a handful of rows), never the fact scan —
    in the parent-first plan text a HashAggregate must sit between the
    Expand and the FileScan; and groupby_agg_depth's two-level rewrite
    must keep the mixed distinct/plain aggregate Expand-free."""
    qs = plans.all_queries()
    for name in ("cube_flag_status", "rollup_priority_status"):
        plan = qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "Expand" in plan, name  # grouping sets still go through Expand
        below_expand = plan[plan.rindex("Expand"):]
        scan_at = below_expand.index("FileScan")
        assert "HashAggregate" in below_expand[:scan_at], (
            f"{name}: Expand feeds the raw scan (pre-aggregate rewrite lost)"
        )
    depth_plan = (
        qs["groupby_agg_depth"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in depth_plan, "countDistinct Expand reappeared"
