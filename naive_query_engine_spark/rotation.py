"""Driver correctness-window rotation (VERDICT r4 #1).

The round driver samples exactly the FIRST 50 entries of
``__spark_entry__.queries()`` (verified by the r4 judge: the key sets of
CORRECTNESS_r01..r04 equal ``list(queries())[:50]`` every round).  Insertion
order of that dict is builder-controlled, so which 50 of the registered
queries get a driver-green row each round is a scheduling decision, not a
driver limitation.

This module owns that schedule:

- ``DRIVER_SAMPLED``: names with a driver CORRECTNESS row so far
  (frozen historical fact — append the previous window per round, never
  rewrite).
- ``SENTINELS``: a handful of SURVEY §2 staples re-pinned in every window so
  each round's driver run still covers scan/join/agg/window/TPC-H basics.
- ``ROTATION``: the full planned order; each round's fresh slots are the
  next never-sampled names in this order (``DRIVER_SAMPLED`` membership,
  not slice arithmetic, decides what "next" means — so appending the
  previous window automatically advances the queue).
- RESAMPLE slots (ADVICE r5 #1): beyond the 5 fixed sentinels, each window
  reserves ``RESAMPLE_SLOTS`` positions for a deterministic rotating subset
  of already-driver-green names, so a driver-visible regression in an
  old query is eventually re-caught by the external check too (the local
  all-registry ``tests/test_oracle.py`` sweep remains the primary net).

``ordered_names()`` returns the full registry ordering: current window
first, then the remaining rotation queue (so a driver that samples more
than 50 still prioritizes never-checked queries), then everything already
driver-green in earlier rounds.
"""

from __future__ import annotations

from .queries import QUERIES

#: bump when the previous round's window is folded into DRIVER_SAMPLED —
#: drives the deterministic resample-slot rotation below
ROUND = 12

# Names with at least one driver-green CORRECTNESS row (union of the key
# sets of CORRECTNESS_r01.json .. CORRECTNESS_r04.json).  55 names: the
# driver window was the registry head all four rounds, which drifted as
# registration order evolved r1->r2.
DRIVER_SAMPLED: frozenset[str] = frozenset(
    {
        "agg_cube", "agg_distinct", "agg_grouped_computed_key",
        "agg_multi_key_having", "agg_rollup", "agg_stats_exact",
        "agg_ungrouped", "case_in_between_like", "cast_types",
        "custom_agg_median_gap", "dedup_connected_components", "dedup_exact",
        "dedup_minhash_lsh", "dedup_ngram_jaccard", "distinct_rows",
        "events_anomaly_outliers", "events_daily_gapfill", "events_funnel",
        "events_retention_cohorts", "events_transition_paths",
        "events_value_histogram", "expr_arith_logic", "filter_project",
        "join_anti", "join_cross", "join_full_outer", "join_inner_chain",
        "join_left_outer", "join_multi_key", "join_right_outer", "join_semi",
        "math_funcs", "q01_pricing_summary", "q03_shipping_priority",
        "q04_order_priority", "q05_region_revenue", "q06_forecast_revenue",
        "q10_returned_items", "q12_priority_by_status", "q14_promo_share",
        "q18_large_orders", "scan_project_expr", "set_except",
        "set_intersect", "set_union", "sort_topk", "sql_implicit_join",
        "sql_lateral_join", "sql_subquery_scalar", "sql_udtf_lateral",
        "sql_union_all", "string_funcs", "window_range_frame", "window_rank",
        "window_running_sum",
        # --- r5 window (CORRECTNESS_r05.json: 50/50 green, 45 first-ever
        # rows) ---
        "dedup_simhash", "dedup_substring", "dedup_substring_strided",
        "dedup_tfidf_cosine", "dedup_incremental",
        "dedup_minhash_recall_vs_exact", "dedup_threshold_sweep",
        "dataset_contamination_check", "similarity_cosine_pairs",
        "similarity_topk_bruteforce", "similarity_lsh_bucketed",
        "similarity_topk_vectorized", "similarity_ivf_topk",
        "similarity_pq_adc_topk", "similarity_recall_at_k",
        "embedding_kmeans_lloyd", "similarity_ivf_kmeans_topk",
        "text_token_stats", "text_lang_id", "text_quality_score",
        "text_fingerprint", "text_bm25_topk", "text_bpe_train_8iters",
        "text_bpe_encode", "text_pii_scrub", "multimodal_decode_meta",
        "multimodal_png_header_parse", "multimodal_wav_header_parse",
        "multimodal_mime_sniff", "sketch_approx_distinct",
        "sketch_hll_mergeable", "sketch_bloom_membership",
        "sketch_countmin_freq", "sketch_kmv_jaccard",
        "pipeline_corpus_curation", "pipeline_dedup_cascade",
        "pipeline_incremental_curation", "graph_pagerank",
        "graph_triangle_count", "graph_bfs_reach", "retrieval_rrf_fusion",
        "fuzzy_entity_resolution", "events_zorder_locality",
        "asof_join_events_orders", "range_join_event_pairs",
        # --- r6 window (CORRECTNESS_r06.json: 50/50 green, 42 first-ever
        # rows; dedup_substring / dedup_substring_strided / dedup_tfidf_cosine
        # were that round's resample slots) ---
        "dedup_tfidf_cosine_prefix", "embedding_top_pc_power_iteration",
        "sketch_join_size_estimate", "multimodal_jpeg_header_parse",
        "events_value_jackknife_ci", "text_zipf_slope",
        "window_distribution_functions", "retrieval_eval_mrr_ndcg",
        "layout_compaction_plan", "join_bloom_prefilter",
        "text_gopher_quality_rules", "layout_zone_map_stats",
        "dedup_semantic", "dedup_keep_best", "similarity_ivf_multiprobe",
        "similarity_quantized_rerank", "similarity_kmeans_recall_at_k",
        "embedding_hard_negatives", "embedding_label_centroids",
        "embedding_label_knn_disagreement", "embedding_centroid_outliers",
        "embedding_gram_matrix", "embedding_norm_histogram",
        "embedding_dim_stats", "text_top_ngrams", "text_tfidf_top_terms",
        "text_edit_distance_neighbors", "text_repetition_signals",
        "text_vocab_coverage", "text_char_bigram_likelihood",
        "text_bpe_merge_candidates", "text_bpe_train_2iters",
        "text_adjacent_pmi_top", "text_hashing_trick_features",
        "text_langid_confusion", "text_source_drift_chisquare",
        "pipeline_model_scoring", "mv_incremental_refresh",
        "multimodal_frame_sample", "multimodal_payload_chunks",
        "sketch_approx_quantiles", "sketch_hll_intersection",
        # --- r7 window (CORRECTNESS_r07.json: 50/50 green, 42 first-ever
        # rows; scan_project_expr / join_inner_chain /
        # agg_grouped_computed_key / window_rank / q01_pricing_summary were
        # the sentinels and dedup_substring_strided / dedup_tfidf_cosine /
        # dedup_tfidf_cosine_prefix that round's resample slots) ---
        "agg_mode_exact", "audit_l_diversity",
        "dataset_dsir_importance_weights", "dataset_erase_propagation",
        "dataset_split_neardup_leakage", "dedup_containment",
        "dedup_cross_source_overlap", "dedup_segment_exact",
        "dedup_tokens_saved_by_source", "embedding_cluster_balanced_sample",
        "embedding_int8_quantization_error",
        "embedding_intrinsic_dimension_twonn",
        "embedding_matryoshka_prefix_recall", "events_ab_mann_whitney",
        "events_ab_srm_check", "events_absence_timeout",
        "events_late_arrival_audit", "events_trend_theil_sen",
        "graph_knn_components", "graph_label_modularity",
        "graph_link_prediction", "graph_link_prediction_ivf",
        "layout_partition_skew_report", "multimodal_audio_vad_segments",
        "multimodal_http_response_parse", "multimodal_image_phash_dedup",
        "multimodal_image_resize", "multimodal_mp4_box_parse",
        "multimodal_pcm_frame_energy", "multimodal_phash_hamming_neardup",
        "multimodal_tiff_header_parse", "orders_scd2_priority_history",
        "orders_snapshot_as_of", "pipeline_cdc_merge",
        "pipeline_dedup_weighted_mixture", "retrieval_mmr_diversify",
        "similarity_ivf_nprobe_sweep", "similarity_mutual_knn",
        "similarity_mutual_knn_ivf", "sketch_ams_f2", "text_heaps_law_fit",
        "text_tokenizer_fertility",
        # --- r8 window (CORRECTNESS_r08.json: 50/50 green, 42 first-ever
        # rows — the late-r7 creations, the r8 IVF maintenance plane, and
        # the r6-block events leftovers) ---
        "graph_label_modularity_ivf", "audit_t_closeness",
        "multimodal_zip_eocd_parse", "similarity_range_search_ivf",
        "graph_neighborhood_function_ivf", "lakehouse_deletion_vector_stats",
        "events_diff_in_diff", "layout_curve_locality_compare",
        "text_quality_funnel", "text_quality_rule_overlap",
        "events_salting_plan", "dataset_uncertainty_sample",
        "events_attribution_position_based", "text_vocab_coverage_curve",
        "graph_knn_components_ivf", "similarity_ivf_index_upsert",
        "dataset_split_neardup_leakage_ivf", "dataset_contamination_check_ivf",
        "dataset_split_leakage_safe_ivf", "embedding_centroid_drift_check",
        "similarity_ivf_index_repair", "dedup_semantic_ivf",
        "embedding_hard_negatives_ivf", "events_wau_sliding",
        "graph_clustering_coefficient", "graph_degree_distribution",
        "fuzzy_match_part_names", "fuzzy_match_multipass",
        "join_salted_skew", "asof_join_tolerance", "events_sessionize",
        "events_tumbling_window", "events_sliding_window",
        "events_peak_concurrency", "events_value_drift_ks",
        "events_value_drift_l1", "events_changepoint_cusum",
        "events_sequence_patterns", "events_bot_regularity",
        "events_activity_islands", "events_state_durations",
        "events_cumulative_unique_users",
        # --- r9 window (CORRECTNESS_r09.json: 50/50 green, 42 first-ever
        # rows — the r6-block events/orders/profile/dataset leftovers and
        # the head of the function-family extension block) ---
        "events_decayed_engagement", "events_ab_test_analysis",
        "events_ab_cuped", "events_forecast_backtest",
        "events_funnel_time_to_convert", "events_power_users_pareto",
        "events_seasonality_profile", "events_new_vs_returning_daily",
        "events_type_concentration_hhi",
        "events_attribution_last_touch", "events_value_winsorized",
        "events_growth_accounting", "events_json_extract",
        "events_variant_props", "orders_rfm_segmentation",
        "orders_market_basket_lift", "orders_cohort_ltv_curve",
        "orders_mom_growth", "orders_abc_classification",
        "orders_shipping_latency_sla", "orders_discount_elasticity",
        "supplier_revenue_gini", "part_skyline_pareto",
        "revenue_share_of_parent", "audit_constraints",
        "audit_k_anonymity", "audit_benford_first_digit",
        "profile_dedup_rate_by_source", "profile_orders",
        "profile_documents_by_source",
        "profile_quality_dup_correlation",
        "profile_doc_length_histogram",
        "profile_shingle_df_histogram", "dataset_train_test_split",
        "dataset_mixture_sample", "dataset_reservoir_per_lang",
        "dataset_pack_context_windows", "dataset_global_interleave",
        "dataset_curriculum_bins", "dataset_chunk_documents",
        "dataset_split_leakage_safe", "agg_weighted_median",
        # --- r10 window (CORRECTNESS_r10.json: 50/50 green, 42 first-ever
        # rows — the r8-remainder agg/window/SQL/TPC-H block and the
        # r9/r10-created lifecycle + coreset registrations; with this fold
        # the never-sampled backlog is ZERO: all 310 registered queries
        # have an external driver row) ---
        "agg_boolean", "agg_corr_exact", "agg_grouping_sets",
        "agg_percentiles_exact", "agg_pivot", "agg_string_concat",
        "array_explode_positions", "array_funcs",
        "dataset_packing_fragmentation_sweep", "datetime_funcs",
        "dedup_ingest_admit_gate", "dedup_ingest_admit_gate_growk",
        "embedding_kcenter_coreset", "features_pit_backfill",
        "graph_kcore_ivf", "graph_kcore_peeling",
        "graph_pagerank_personalized", "misc_scalar_funcs",
        "multimodal_tar_member_index", "null_handling",
        "orders_snapshot_diff", "q02_top_customer_per_nation",
        "q07_nation_trade", "q08_market_share", "q09_profit_by_nation_year",
        "q11_important_balance", "q13_order_count_distribution",
        "q15_top_supplier", "q16_supplier_count",
        "q17_small_quantity_revenue", "q19_disjunctive_filter",
        "q20_excess_stock_analog", "q21_sole_supplier_orders",
        "q22_idle_customers", "set_ops_all",
        "similarity_ivf_maintenance_tick", "similarity_ivfpq_adc_topk",
        "sql_correlated_scalar_subquery", "sql_recursive_chain",
        "text_rake_keywords", "unpivot_part_attrs", "window_value_functions",
        # --- r11 window (CORRECTNESS_r11.json: 50/50 green, 5 first-ever
        # rows — the streaming-equivalence quartet plus the ingest
        # canonical-roots resolver; the other 45 slots were sentinels and
        # oldest-first resamples of r4/r5-era rows) ---
        "dedup_ingest_canonical_roots",
        "streaming_absence_timeout_equivalence",
        "streaming_countmin_sink_equivalence",
        "streaming_state_totals_equivalence",
        "streaming_tick_batch_equivalence",
    }
)

#: Last round each name got an external CORRECTNESS row (max over the
#: key sets of CORRECTNESS_r01..r10.json; regenerate when folding a
#: window: names in the new window move to the new round).  Drives the
#: oldest-first resample ordering below (VERDICT r10 #1: the r1/r4-era
#: rows were last externally checked many rounds of shared-helper churn
#: ago - staleness is the main residual correctness risk).
_LAST_SAMPLED_BY_ROUND: dict[int, tuple[str, ...]] = {
    4: (
        'sql_implicit_join', 'sql_lateral_join', 'sql_subquery_scalar',
        'sql_udtf_lateral', 'sql_union_all', 'string_funcs',
        'window_range_frame', 'window_running_sum',
    ),
    5: (
        'asof_join_events_orders', 'dataset_contamination_check',
        'dedup_incremental', 'dedup_simhash', 'dedup_threshold_sweep',
        'embedding_kmeans_lloyd', 'events_zorder_locality',
        'fuzzy_entity_resolution', 'graph_bfs_reach', 'graph_pagerank',
        'graph_triangle_count', 'multimodal_decode_meta',
        'multimodal_mime_sniff', 'multimodal_png_header_parse',
        'multimodal_wav_header_parse', 'pipeline_corpus_curation',
        'pipeline_dedup_cascade', 'pipeline_incremental_curation',
        'range_join_event_pairs', 'retrieval_rrf_fusion',
        'similarity_cosine_pairs', 'similarity_ivf_kmeans_topk',
        'similarity_ivf_topk', 'similarity_lsh_bucketed',
        'similarity_pq_adc_topk', 'similarity_recall_at_k',
        'similarity_topk_bruteforce', 'similarity_topk_vectorized',
        'sketch_approx_distinct', 'sketch_bloom_membership',
        'sketch_countmin_freq', 'sketch_hll_mergeable',
        'sketch_kmv_jaccard', 'text_bm25_topk', 'text_bpe_encode',
        'text_bpe_train_8iters', 'text_fingerprint', 'text_lang_id',
        'text_pii_scrub', 'text_quality_score', 'text_token_stats',
    ),
    6: (
        'dedup_substring', 'embedding_centroid_outliers',
        'embedding_dim_stats', 'embedding_gram_matrix',
        'embedding_hard_negatives', 'embedding_label_centroids',
        'embedding_label_knn_disagreement', 'embedding_norm_histogram',
        'embedding_top_pc_power_iteration', 'events_value_jackknife_ci',
        'join_bloom_prefilter', 'layout_compaction_plan',
        'layout_zone_map_stats', 'multimodal_frame_sample',
        'multimodal_jpeg_header_parse', 'multimodal_payload_chunks',
        'mv_incremental_refresh', 'pipeline_model_scoring',
        'retrieval_eval_mrr_ndcg', 'similarity_ivf_multiprobe',
        'similarity_kmeans_recall_at_k', 'similarity_quantized_rerank',
        'sketch_approx_quantiles', 'sketch_hll_intersection',
        'sketch_join_size_estimate', 'text_adjacent_pmi_top',
        'text_bpe_merge_candidates', 'text_bpe_train_2iters',
        'text_char_bigram_likelihood', 'text_edit_distance_neighbors',
        'text_gopher_quality_rules', 'text_hashing_trick_features',
        'text_langid_confusion', 'text_repetition_signals',
        'text_source_drift_chisquare', 'text_tfidf_top_terms',
        'text_top_ngrams', 'text_vocab_coverage', 'text_zipf_slope',
        'window_distribution_functions',
    ),
    7: (
        'agg_mode_exact', 'audit_l_diversity',
        'dataset_dsir_importance_weights', 'dataset_erase_propagation',
        'dedup_containment', 'dedup_cross_source_overlap',
        'dedup_substring_strided', 'dedup_tfidf_cosine',
        'dedup_tfidf_cosine_prefix', 'dedup_tokens_saved_by_source',
        'embedding_cluster_balanced_sample',
        'embedding_int8_quantization_error',
        'embedding_intrinsic_dimension_twonn',
        'embedding_matryoshka_prefix_recall', 'events_ab_mann_whitney',
        'events_ab_srm_check', 'events_absence_timeout',
        'events_late_arrival_audit', 'events_trend_theil_sen',
        'graph_knn_components', 'graph_label_modularity',
        'graph_link_prediction', 'graph_link_prediction_ivf',
        'layout_partition_skew_report', 'multimodal_audio_vad_segments',
        'multimodal_http_response_parse',
        'multimodal_image_phash_dedup', 'multimodal_image_resize',
        'multimodal_mp4_box_parse', 'multimodal_pcm_frame_energy',
        'multimodal_phash_hamming_neardup',
        'multimodal_tiff_header_parse', 'orders_scd2_priority_history',
        'orders_snapshot_as_of', 'pipeline_cdc_merge',
        'pipeline_dedup_weighted_mixture', 'retrieval_mmr_diversify',
        'similarity_ivf_nprobe_sweep', 'similarity_mutual_knn',
        'similarity_mutual_knn_ivf', 'sketch_ams_f2',
        'text_heaps_law_fit', 'text_tokenizer_fertility',
    ),
    8: (
        'asof_join_tolerance', 'audit_t_closeness',
        'dataset_contamination_check_ivf',
        'dataset_split_leakage_safe_ivf', 'dataset_uncertainty_sample',
        'dedup_ngram_jaccard', 'dedup_segment_exact', 'dedup_semantic',
        'dedup_semantic_ivf', 'embedding_centroid_drift_check',
        'embedding_hard_negatives_ivf', 'events_activity_islands',
        'events_attribution_position_based', 'events_bot_regularity',
        'events_changepoint_cusum', 'events_cumulative_unique_users',
        'events_diff_in_diff', 'events_peak_concurrency',
        'events_salting_plan', 'events_sequence_patterns',
        'events_sessionize', 'events_sliding_window',
        'events_state_durations', 'events_tumbling_window',
        'events_value_drift_ks', 'events_value_drift_l1',
        'events_wau_sliding', 'fuzzy_match_multipass',
        'fuzzy_match_part_names', 'graph_clustering_coefficient',
        'graph_degree_distribution', 'graph_knn_components_ivf',
        'graph_label_modularity_ivf', 'graph_neighborhood_function_ivf',
        'join_salted_skew', 'lakehouse_deletion_vector_stats',
        'layout_curve_locality_compare', 'multimodal_zip_eocd_parse',
        'similarity_ivf_index_repair', 'similarity_ivf_index_upsert',
        'similarity_range_search_ivf', 'text_quality_funnel',
        'text_quality_rule_overlap', 'text_vocab_coverage_curve',
    ),
    9: (
        'agg_weighted_median', 'audit_benford_first_digit',
        'audit_constraints', 'audit_k_anonymity',
        'dataset_chunk_documents', 'dataset_curriculum_bins',
        'dataset_global_interleave', 'dataset_mixture_sample',
        'dataset_pack_context_windows', 'dataset_reservoir_per_lang',
        'dataset_split_leakage_safe', 'dedup_keep_best',
        'dedup_minhash_lsh', 'dedup_minhash_recall_vs_exact',
        'events_ab_cuped', 'events_ab_test_analysis',
        'events_attribution_last_touch', 'events_decayed_engagement',
        'events_forecast_backtest', 'events_funnel_time_to_convert',
        'events_growth_accounting', 'events_json_extract',
        'events_new_vs_returning_daily', 'events_power_users_pareto',
        'events_seasonality_profile', 'events_type_concentration_hhi',
        'events_value_winsorized', 'events_variant_props',
        'orders_abc_classification', 'orders_cohort_ltv_curve',
        'orders_discount_elasticity', 'orders_market_basket_lift',
        'orders_mom_growth', 'orders_rfm_segmentation',
        'orders_shipping_latency_sla', 'part_skyline_pareto',
        'profile_dedup_rate_by_source', 'profile_doc_length_histogram',
        'profile_documents_by_source', 'profile_orders',
        'profile_quality_dup_correlation',
        'profile_shingle_df_histogram', 'revenue_share_of_parent',
        'supplier_revenue_gini',
    ),
    10: (
        'agg_boolean', 'agg_corr_exact', 'agg_grouping_sets',
        'agg_percentiles_exact', 'agg_pivot', 'agg_string_concat',
        'array_explode_positions', 'array_funcs',
        'dataset_packing_fragmentation_sweep',
        'dataset_split_neardup_leakage',
        'dataset_split_neardup_leakage_ivf', 'dataset_train_test_split',
        'datetime_funcs', 'dedup_ingest_admit_gate',
        'dedup_ingest_admit_gate_growk', 'embedding_kcenter_coreset',
        'features_pit_backfill', 'graph_kcore_ivf',
        'graph_kcore_peeling', 'graph_pagerank_personalized',
        'misc_scalar_funcs', 'multimodal_tar_member_index',
        'null_handling', 'orders_snapshot_diff',
        'q02_top_customer_per_nation', 'q07_nation_trade',
        'q08_market_share', 'q09_profit_by_nation_year',
        'q11_important_balance', 'q13_order_count_distribution',
        'q15_top_supplier', 'q16_supplier_count',
        'q17_small_quantity_revenue', 'q19_disjunctive_filter',
        'q20_excess_stock_analog', 'q21_sole_supplier_orders',
        'q22_idle_customers', 'set_ops_all',
        'similarity_ivf_maintenance_tick', 'similarity_ivfpq_adc_topk',
        'sql_correlated_scalar_subquery', 'sql_recursive_chain',
        'text_rake_keywords', 'unpivot_part_attrs',
        'window_value_functions',
    ),
    11: (
        'agg_cube', 'agg_distinct', 'agg_grouped_computed_key',
        'agg_multi_key_having', 'agg_rollup', 'agg_stats_exact',
        'agg_ungrouped', 'case_in_between_like', 'cast_types',
        'custom_agg_median_gap', 'dedup_connected_components',
        'dedup_exact', 'dedup_ingest_canonical_roots', 'distinct_rows',
        'events_anomaly_outliers', 'events_daily_gapfill',
        'events_funnel', 'events_retention_cohorts',
        'events_transition_paths', 'events_value_histogram',
        'expr_arith_logic', 'filter_project', 'join_anti', 'join_cross',
        'join_full_outer', 'join_inner_chain', 'join_left_outer',
        'join_multi_key', 'join_right_outer', 'join_semi', 'math_funcs',
        'q01_pricing_summary', 'q03_shipping_priority',
        'q04_order_priority', 'q05_region_revenue',
        'q06_forecast_revenue', 'q10_returned_items',
        'q12_priority_by_status', 'q14_promo_share', 'q18_large_orders',
        'scan_project_expr', 'set_except', 'set_intersect', 'set_union',
        'sort_topk', 'streaming_absence_timeout_equivalence',
        'streaming_countmin_sink_equivalence',
        'streaming_state_totals_equivalence',
        'streaming_tick_batch_equivalence', 'window_rank',
    ),
}
LAST_SAMPLED: dict[str, int] = {
    n: r for r, names in _LAST_SAMPLED_BY_ROUND.items() for n in names
}

# SURVEY §2 staples kept in EVERY round's window (scan+expr, a join, an
# agg, a window function, a TPC-H query) so the driver's sample never
# loses sight of the reference-parity core.
SENTINELS: tuple[str, ...] = (
    "scan_project_expr",
    "join_inner_chain",
    "agg_grouped_computed_key",
    "window_rank",
    "q01_pricing_summary",
)

WINDOW_SIZE = 50

#: MAINTENANCE MODE (VERDICT r10 #1): with the never-sampled backlog at
#: zero, resample slots expand to fill whatever the window's fresh
#: registrations don't use, with a guaranteed floor — so every round
#: re-checks a large oldest-first slice of the green registry instead of
#: the old 3-slot trickle.  New registrations still take priority (they
#: have no external row at all), but registry discipline caps them well
#: below the window, so each round carries ≥MIN_RESAMPLE_SLOTS re-checks.
MIN_RESAMPLE_SLOTS = 30


def _fresh_queue() -> list[str]:
    """Never-driver-sampled names: rotation order first, then any registry
    name not yet slotted (a brand-new registration lands here until the
    next ROTATION edit)."""
    queue = [n for n in ROTATION if n not in DRIVER_SAMPLED]
    placed = set(ROTATION) | DRIVER_SAMPLED | set(SENTINELS)
    queue += [n for n in QUERIES if n not in placed]
    return queue


def resample_names() -> tuple[str, ...]:
    """The deterministic oldest-first re-check subset for this ROUND.

    Pool = every driver-green name that is not a fixed sentinel, ordered
    by (last externally sampled round, name) — the staleness order the
    r10 VERDICT called for: the r1/r4-era rows have seen nine rounds of
    shared-helper churn since their external check, so they re-enter the
    driver window first.  Self-advancing with no pointer arithmetic:
    folding a window into DRIVER_SAMPLED regenerates LAST_SAMPLED, which
    moves the just-rechecked names to the back of the staleness order.
    A pure function of the baked ledgers — the driver, tests, and a
    re-run all agree on the same names.
    """
    pool = sorted(
        DRIVER_SAMPLED - set(SENTINELS),
        key=lambda q: (LAST_SAMPLED.get(q, 0), q),
    )
    return tuple(pool[:RESAMPLE_SLOTS])

# Planned order for every never-sampled query.  Slots 1-45 (round 5) are
# the flagship LLM-pipeline operators the r4 VERDICT called out: near-dup
# dedup, ANN/k-means similarity, BM25/BPE text, multimodal, sketches,
# pipeline compositions, graph, retrieval fusion, entity resolution,
# layout, temporal joins.  Later slots hold the remaining analytics /
# dataset / TPC-H shapes for rounds 6-8.
ROTATION: tuple[str, ...] = (
    # --- round 5 window (45) ---
    # dedup family
    "dedup_simhash",
    "dedup_substring",
    "dedup_substring_strided",
    "dedup_tfidf_cosine",
    "dedup_incremental",
    "dedup_minhash_recall_vs_exact",
    "dedup_threshold_sweep",
    "dataset_contamination_check",
    # similarity / ANN
    "similarity_cosine_pairs",
    "similarity_topk_bruteforce",
    "similarity_lsh_bucketed",
    "similarity_topk_vectorized",
    "similarity_ivf_topk",
    "similarity_pq_adc_topk",
    "similarity_recall_at_k",
    "embedding_kmeans_lloyd",
    "similarity_ivf_kmeans_topk",
    # text analysis
    "text_token_stats",
    "text_lang_id",
    "text_quality_score",
    "text_fingerprint",
    "text_bm25_topk",
    "text_bpe_train_8iters",
    "text_bpe_encode",
    "text_pii_scrub",
    # multimodal
    "multimodal_decode_meta",
    "multimodal_png_header_parse",
    "multimodal_wav_header_parse",
    "multimodal_mime_sniff",
    # sketches
    "sketch_approx_distinct",
    "sketch_hll_mergeable",
    "sketch_bloom_membership",
    "sketch_countmin_freq",
    "sketch_kmv_jaccard",
    # pipeline compositions
    "pipeline_corpus_curation",
    "pipeline_dedup_cascade",
    "pipeline_incremental_curation",
    # graph
    "graph_pagerank",
    "graph_triangle_count",
    "graph_bfs_reach",
    # retrieval / linkage / layout / temporal
    "retrieval_rrf_fusion",
    "fuzzy_entity_resolution",
    "events_zorder_locality",
    "asof_join_events_orders",
    "range_join_event_pairs",
    # --- round 6 window (45) ---
    "dedup_tfidf_cosine_prefix",
    "embedding_top_pc_power_iteration",
    "sketch_join_size_estimate",
    "multimodal_jpeg_header_parse",
    "events_value_jackknife_ci",
    "text_zipf_slope",
    "window_distribution_functions",
    "retrieval_eval_mrr_ndcg",
    "layout_compaction_plan",
    "join_bloom_prefilter",
    "text_gopher_quality_rules",
    "layout_zone_map_stats",
    "dedup_semantic",
    "dedup_keep_best",
    "similarity_ivf_multiprobe",
    "similarity_quantized_rerank",
    "similarity_kmeans_recall_at_k",
    "embedding_hard_negatives",
    "embedding_label_centroids",
    "embedding_label_knn_disagreement",
    "embedding_centroid_outliers",
    "embedding_gram_matrix",
    "embedding_norm_histogram",
    "embedding_dim_stats",
    "text_top_ngrams",
    "text_tfidf_top_terms",
    "text_edit_distance_neighbors",
    "text_repetition_signals",
    "text_vocab_coverage",
    "text_char_bigram_likelihood",
    "text_bpe_merge_candidates",
    "text_bpe_train_2iters",
    "text_adjacent_pmi_top",
    "text_hashing_trick_features",
    "text_langid_confusion",
    "text_source_drift_chisquare",
    "pipeline_model_scoring",
    "mv_incremental_refresh",
    "multimodal_frame_sample",
    "multimodal_payload_chunks",
    "sketch_approx_quantiles",
    "sketch_hll_intersection",
    # --- round 7 window ---
    # r6-created operators first: never-sampled new work outranks the
    # older backlog (same rule as every round).  The 15 r6-block leftovers
    # (events/fuzzy/layout shapes) are re-slotted AFTER this block per
    # VERDICT r6 #4: the never-externally-sampled r6b/r6c multimodal,
    # lakehouse, and experimentation families take the r7 fresh slots.
    "dedup_containment",
    "events_trend_theil_sen",
    "sketch_ams_f2",
    "similarity_mutual_knn",
    "retrieval_mmr_diversify",
    "multimodal_mp4_box_parse",
    "agg_mode_exact",
    "text_heaps_law_fit",
    "pipeline_dedup_weighted_mixture",
    "graph_knn_components",
    "dedup_segment_exact",
    "pipeline_cdc_merge",
    "embedding_int8_quantization_error",
    "multimodal_tiff_header_parse",
    "graph_link_prediction",
    "dataset_erase_propagation",
    "events_late_arrival_audit",
    "orders_scd2_priority_history",
    "multimodal_pcm_frame_energy",
    "layout_partition_skew_report",
    "multimodal_image_phash_dedup",
    "events_absence_timeout",
    "embedding_matryoshka_prefix_recall",
    "dataset_dsir_importance_weights",
    "multimodal_audio_vad_segments",
    "dataset_split_neardup_leakage",
    "embedding_cluster_balanced_sample",
    "events_ab_srm_check",
    "multimodal_http_response_parse",
    "orders_snapshot_as_of",
    "text_tokenizer_fertility",
    "multimodal_phash_hamming_neardup",
    "dedup_cross_source_overlap",
    "graph_label_modularity",
    "similarity_ivf_nprobe_sweep",
    "dedup_tokens_saved_by_source",
    "audit_l_diversity",
    "embedding_intrinsic_dimension_twonn",
    "multimodal_image_resize",
    "events_ab_mann_whitney",
    "similarity_mutual_knn_ivf",
    # r7-created: the kNN-graph overlays composed onto the per-IVF-cell
    # substrate (VERDICT r6 #3)
    "graph_link_prediction_ivf",
    "graph_label_modularity_ivf",
    # r7-created wave 2: the t-closeness release gate and the
    # trailer-directory (ZIP EOCD) parse shape
    "audit_t_closeness",
    "multimodal_zip_eocd_parse",
    "similarity_range_search_ivf",
    "graph_neighborhood_function_ivf",
    "lakehouse_deletion_vector_stats",
    "events_diff_in_diff",
    "layout_curve_locality_compare",
    "text_quality_funnel",
    "text_quality_rule_overlap",
    "events_salting_plan",
    "dataset_uncertainty_sample",
    "events_attribution_position_based",
    "text_vocab_coverage_curve",
    "graph_knn_components_ivf",
    # r8-created: incremental IVF index maintenance (VERDICT r7 #2) and
    # the decontamination/leakage audits composed onto the substrate
    # (VERDICT r7 #4)
    "similarity_ivf_index_upsert",
    "dataset_split_neardup_leakage_ivf",
    "dataset_contamination_check_ivf",
    "dataset_split_leakage_safe_ivf",
    "embedding_centroid_drift_check",
    "similarity_ivf_index_repair",
    "dedup_semantic_ivf",
    "embedding_hard_negatives_ivf",
    # r6-block leftovers (re-slotted from above; land r8)
    "events_wau_sliding",
    "graph_clustering_coefficient",
    "graph_degree_distribution",
    "fuzzy_match_part_names",
    "fuzzy_match_multipass",
    "join_salted_skew",
    "asof_join_tolerance",
    "events_sessionize",
    "events_tumbling_window",
    "events_sliding_window",
    "events_peak_concurrency",
    "events_value_drift_ks",
    "events_value_drift_l1",
    "events_changepoint_cusum",
    "events_sequence_patterns",
    "events_bot_regularity",
    "events_activity_islands",
    "events_state_durations",
    "events_cumulative_unique_users",
    "events_decayed_engagement",
    "events_ab_test_analysis",
    "events_ab_cuped",
    "events_forecast_backtest",
    "events_funnel_time_to_convert",
    "events_power_users_pareto",
    "events_seasonality_profile",
    "events_new_vs_returning_daily",
    "events_type_concentration_hhi",
    "events_attribution_last_touch",
    "events_value_winsorized",
    "events_growth_accounting",
    "events_json_extract",
    "events_variant_props",
    "orders_rfm_segmentation",
    "orders_market_basket_lift",
    "orders_cohort_ltv_curve",
    "orders_mom_growth",
    "orders_abc_classification",
    "orders_shipping_latency_sla",
    "orders_discount_elasticity",
    "supplier_revenue_gini",
    "part_skyline_pareto",
    "revenue_share_of_parent",
    "audit_constraints",
    "audit_k_anonymity",
    "audit_benford_first_digit",
    "profile_dedup_rate_by_source",
    "profile_orders",
    "profile_documents_by_source",
    "profile_quality_dup_correlation",
    "profile_doc_length_histogram",
    "profile_shingle_df_histogram",
    "dataset_train_test_split",
    "dataset_mixture_sample",
    "dataset_reservoir_per_lang",
    "dataset_pack_context_windows",
    "dataset_global_interleave",
    "dataset_curriculum_bins",
    "dataset_chunk_documents",
    "dataset_split_leakage_safe",
    # --- round 8 window (remainder) ---
    "agg_weighted_median",
    "agg_percentiles_exact",
    "agg_pivot",
    "agg_grouping_sets",
    "agg_string_concat",
    "agg_boolean",
    "agg_corr_exact",
    "window_value_functions",
    "misc_scalar_funcs",
    "datetime_funcs",
    "array_funcs",
    "null_handling",
    "unpivot_part_attrs",
    "array_explode_positions",
    "set_ops_all",
    "sql_correlated_scalar_subquery",
    "sql_recursive_chain",
    "q02_top_customer_per_nation",
    "q07_nation_trade",
    "q08_market_share",
    "q09_profit_by_nation_year",
    "q11_important_balance",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_count",
    "q17_small_quantity_revenue",
    "q19_disjunctive_filter",
    "q20_excess_stock_analog",
    "q21_sole_supplier_orders",
    "q22_idle_customers",
    # --- r9-created (after the backlog: new registrations stay below the
    # drain rate until every older query has an external row) ---
    "dedup_ingest_admit_gate",
    "similarity_ivf_maintenance_tick",
    "similarity_ivfpq_adc_topk",
    "graph_kcore_peeling",
    "features_pit_backfill",
    "orders_snapshot_diff",
    "multimodal_tar_member_index",
    "graph_kcore_ivf",
    "dataset_packing_fragmentation_sweep",
    "graph_pagerank_personalized",
    "text_rake_keywords",
    # --- r10-created (takes the window's spare fresh slots; VERDICT r9
    # #1 freezes further registrations until the backlog sweep lands —
    # the two below fill the 2 spare slots EXACTLY) ---
    "dedup_ingest_admit_gate_growk",
    "embedding_kcenter_coreset",
    # --- r11-created (maintenance mode: each new registration displaces
    # one oldest-first resample slot) ---
    # the maintenance tick executed through the REAL Structured
    # Streaming engine, hash-checked against the batch-fold oracle
    # (VERDICT r10 #8: one streaming path per round gets a driver row)
    "streaming_tick_batch_equivalence",
    # the mergeable-sketch streaming sink (stateless partial-merge path,
    # complementing the tick's stateful fold): count-min built through
    # foreachBatch partial-overwrite, hash-equal to the batch sketch
    "streaming_countmin_sink_equivalence",
    # intra-batch shadow-chain resolution (ADVICE r10 #3) pinned against
    # an independent WITH RECURSIVE formulation; the corpus produces
    # real chains (1 at sf0.01, 9 at sf0.1), so the row is non-vacuous
    "dedup_ingest_canonical_roots",
    # the applyInPandasWithState state-store fold (third streaming
    # primitive: engine-carried per-key state, update-mode emission),
    # final state hash-equal to the one-shot batch aggregate
    "streaming_state_totals_equivalence",
    # EVENT-TIME TIMERS (the hardest streaming surface): the CEP absence
    # detector with a sentinel flush batch so every view is decided —
    # oracle = the batch next-purchase frame rule, no watermark term
    "streaming_absence_timeout_equivalence",
    # --- r12-created (maintenance mode: displaces one oldest-first
    # resample slot) ---
    # POSITIVE-sequence CEP through the real engine (VERDICT r11 #3 —
    # the last streaming surface without a driver row): mod-split
    # out-of-order micro-batches, latest-wins versioned emissions to a
    # per-batch parquet sink, oracle = the batch sequence-pattern rule
    "streaming_cep_alerts_equivalence",
    # the engine's BUILT-IN watermarked session_window aggregation with
    # state-store session merging (every prior streaming row verified
    # CUSTOM state; this is the native stateful operator), sentinel
    # flush so append mode emits every real session exactly once
    "streaming_sessionize_equivalence",
    # watermarked stream-stream interval join (dual join state, eager
    # inner-join emission, watermark eviction) vs the batch interval
    # join; with this row every BUILT-IN stateful streaming operator
    # class has an external row
    "streaming_stream_join_equivalence",
    # dropDuplicatesWithinWatermark with manufactured cross-batch
    # duplicates (each tertile re-arrives in the next micro-batch);
    # expected output is exactly the corpus
    "streaming_dedup_equivalence",
)

#: actual resample slots this round: the window minus sentinels minus the
#: fresh registrations that fit (fresh never squeezes resamples below the
#: floor).  With zero fresh names this is 45/window.  Defined here because
#: _fresh_queue needs ROTATION.
RESAMPLE_SLOTS = WINDOW_SIZE - len(SENTINELS) - min(
    len(_fresh_queue()), WINDOW_SIZE - len(SENTINELS) - MIN_RESAMPLE_SLOTS
)


def ordered_names() -> list[str]:
    """Full registry ordering for the driver-visible dicts.

    Window = 5 sentinels + every never-sampled name (new registrations —
    there is no backlog in maintenance mode, so this is small) + enough
    oldest-first re-checks to fill the 50.  Then any never-sampled
    overflow, then the already-driver-green names in registration order.
    """
    fresh_queue = _fresh_queue()
    n_fresh = WINDOW_SIZE - len(SENTINELS) - RESAMPLE_SLOTS
    window = list(SENTINELS) + fresh_queue[:n_fresh] + list(resample_names())
    rest_rotation = fresh_queue[n_fresh:]
    sampled_tail = [
        n for n in QUERIES if n in DRIVER_SAMPLED and n not in set(window)
    ]
    out = window + rest_rotation + sampled_tail
    # Safety: the ordering must be a permutation of the registry.
    assert len(out) == len(QUERIES) and set(out) == set(QUERIES), (
        len(out), len(QUERIES), set(QUERIES) ^ set(out),
    )
    return out
