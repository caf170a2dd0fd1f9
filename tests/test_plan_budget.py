"""Plan-shape budgets: every headline query has a maximum shuffle count.

A correctness-preserving edit that adds an Exchange is a regression at
100 TB even though every test still passes — these budgets make that
failure mode visible.  Budgets are CEILINGS (AQE may collapse some at
runtime); lowering one is progress, raising one needs a reason.
"""

from __future__ import annotations

import pytest

from naive_query_engine_spark import plans
from naive_query_engine_spark.queries import QUERIES

from .conftest import SF_ORACLE

#: query → (max Exchange nodes in the static plan, broadcast expected)
BUDGETS = {
    "q01_pricing_summary": (2, False),        # agg + final sort
    "q03_shipping_priority": (1, True),       # only the small aggregation
    "q05_region_revenue": (1, True),          # star join fully broadcast
    "q06_forecast_revenue": (1, False),       # single ungrouped agg
    "q07_nation_trade": (1, True),
    "q09_profit_by_nation_year": (1, True),
    "join_inner_chain": (0, True),            # both dims broadcast, no shuffle
    "agg_grouped_computed_key": (1, False),
    "window_rank": (1, False),                # one partition-by shuffle
    "sort_topk": (0, False),                  # TakeOrdered — no sort shuffle
    "events_sessionize": (1, False),
    "q10_returned_items": (1, True),
    "q13_order_count_distribution": (3, False),  # two agg levels + join
    # window shuffles by the group key; the (source, bin) final agg
    # reuses that partitioning — one exchange total
    "dataset_pack_context_windows": (1, False),
    # two-phase salted top-k: (lang, salt) window + survivors-only
    # (lang) window — two exchanges, neither sorts a whole group
    "dataset_reservoir_per_lang": (2, False),
    "events_anomaly_outliers": (1, True),         # moments frame broadcast back
    # strata agg (2-phase) + totals + tag-side agg + final joins; every
    # exchanged frame is stratum-cardinality-bounded except the two
    # column-pruned corpus scans
    "dataset_mixture_sample": (6, True),
    # r2-late additions
    # codebook build (2 aggs) + code argmin window + (query,neighbor) sum
    # + topk window; codebook/ADC joins are broadcasts
    "similarity_pq_adc_topk": (7, True),
    # r3: sym/deg/src_side are one-time localCheckpoint boundaries and the
    # per-iteration ranks join reuses their preserved hash partitioning —
    # what remains is the final iteration's contribution sum plus the
    # top-N (was 16 in r2, 31 before the checkpoint idiom)
    "graph_pagerank": (3, False),
    # r3: blocked frame checkpointed + explode-generated pair keys; the
    # one shuffle is the PRE-explode repartition of the B-row frame
    # (O(corpus) bytes — spreading the pair expansion across cores), and
    # the join broadcasts the B-row a-side payload
    "similarity_cosine_pairs": (1, True),
    # r3: per-batch top-K inside the kernel → only the final ranking
    # window's partition-by shuffle remains
    "similarity_topk_vectorized": (1, False),
    # per-group sketch agg + union-merge + global agg; tiny frames after
    # the first aggregation
    "sketch_hll_mergeable": (4, True),
    # (day,user) dedupe + exact window count + daily sketch agg +
    # merge-side aggs; the 7x explode adds no exchange
    "events_wau_sliding": (8, True),
    # full outer cannot broadcast: both sides exchange on the key
    "join_full_outer": (2, False),
    # correlated LATERAL → join + per-group limit; nation side broadcast
    "sql_lateral_join": (1, True),
    "window_range_frame": (1, False),         # one partition-by shuffle
    "window_distribution_functions": (1, False),  # one partition-by shuffle
    "agg_boolean": (1, False),                # single partial+final agg
    # bigram counts: repartition (single-split input) + (doc,gram) agg +
    # doc rollup
    "text_repetition_signals": (3, False),
    # summary-of-aggregates: six bounded frames crossJoined, each with its
    # own 2-phase agg lineage in the STATIC plan (ReuseExchange collapses
    # repeats at runtime); every exchanged frame after the scans is
    # key-distinct- or m*k-bounded
    "sketch_bloom_membership": (12, True),
    # counter-matrix agg + truth agg + probe-min agg; counters broadcast
    "sketch_countmin_freq": (3, True),
    # word-count agg + TakeOrdered; the 1000-survivor ranking window and
    # the 1-row moment reduce ride the collected top-k (pagerank idiom)
    "text_zipf_slope": (3, False),
    # all corpus cost is the spliced BM25 operator (its tf lineage
    # re-counts per consumer in the STATIC plan, bm25 precedent); the
    # eval layer adds label joins + (queries x k)-bounded aggs
    "retrieval_eval_mrr_ndcg": (18, True),
    # one corpus pass to 16 bucket partials; the summary-of-aggregates
    # crossJoins re-count the scan-agg lineage per consumer in the STATIC
    # plan (the sketch_bloom_membership precedent) — every exchanged
    # frame after the two scans is 16- or 1-row
    "events_value_jackknife_ci": (22, True),
    # manifest agg + the bounded planning window + group rollup
    "layout_compaction_plan": (2, False),
    # one corpus scan; per-row JVM rule exprs; single source-keyed agg
    "text_gopher_quality_rules": (1, False),
    # per layout: global_rank range repartition + zone agg + 1-row
    # summary agg; predicate scoring rides the 64-row zone frames
    "layout_zone_map_stats": (6, False),
    # build distinct + bit-set distinct + probe-key distinct + hit agg +
    # flags joins + the fact rollup; bits/flags broadcast
    "join_bloom_prefilter": (6, True),
    # two sketch aggs + (seed,pos) alignment join + per-seed/min reduces
    # + two exact-frequency aggs + truth join/reduce (the truth side
    # exists to score the estimator; a CBO consults the sketches only)
    "sketch_join_size_estimate": (14, True),
    # the iterative UnionLoop's per-step exchanges are internal to the
    # recursion node, not visible in the static plan
    "sql_recursive_chain": (0, False),
    "events_variant_props": (1, False),       # single grouped agg
    # edge list + orientation are localCheckpoint-ed (each computed once;
    # without the cuts the static plan re-counted the lineitem agg per
    # consumer: 52 exchanges) — what remains is the final triangle agg
    "graph_triangle_count": (2, False),
    # vocab-count agg + per-doc agg; the top-V vocab broadcast is the hint
    "text_vocab_coverage": (2, True),
    # (source,salt) window + survivors-only (source) window — the same
    # two-phase shape as dataset_reservoir_per_lang
    "dataset_global_interleave": (2, False),
    "multimodal_mime_sniff": (1, False),      # single agg by detected type
    "multimodal_jpeg_header_parse": (0, False),  # map-only marker walk
    # r3 additions.  The persisted-frame lineages (tf / wins) are
    # re-counted per consumer in the STATIC plan — runtime reuses the
    # materialization; budgets pin the static shape all the same
    "text_bm25_topk": (11, True),             # tf index: 5 consumers' lineage
    # r13: row-local window dedup + one posting exchange into the
    # collect_list df-cap/pair expansion + pair agg + spread — join-free
    # (was 11 with the df-cap join + self-join + persist lineage)
    "dedup_substring": (3, False),
    "text_char_bigram_likelihood": (6, True), # tf collapse: 2 consumers' lineage
    "fuzzy_match_part_names": (2, True),      # distinct-names agg + block join
    # r4: third (phonetic consonant-skeleton) blocking pass unions one more
    # distinct-names agg lineage + block join into the static plan
    "fuzzy_match_multipass": (6, True),
    "text_bpe_merge_candidates": (2, False),  # repartition + pair agg; TakeOrdered
    "dataset_curriculum_bins": (1, False),    # one lang window; rollup reuses it
    # r4 additions
    # broadcast-centroid assignment is map-only; the final rollup is one
    # exchange.  r14: training rides the session-cached corpus centroids,
    # so the old eager lineage cut (which HID the spread repartition from
    # the static plan) is gone — the conditional split-aware spread of
    # the single-split test file is now the visible second exchange
    "embedding_kmeans_lloyd": (2, False),
    # winnowed fingerprint selection is row-local; r13: one posting
    # exchange into the collect_list df-cap/pair expansion + pair agg +
    # spread — join-free (was 7 with the df-cap join + self-join)
    "dedup_substring_strided": (3, False),
    # iterative trainer: all pair-count exchanges are behind per-iteration
    # lineage cuts; the returned frame is the final TakeOrdered over the
    # checkpointed counts
    "text_bpe_train_8iters": (0, True),
    # r14 re-budget: distinct-name agg + the cogroup's two blk exchanges
    # (names side + edge side) + the final canonical agg; the block
    # Levenshtein join broadcasts.  The old budget (2) predates the
    # per-block union-find shape — the CC fixpoint's exchanges used to
    # hide behind per-round lineage cuts, the cogroup's are visible.
    "fuzzy_entity_resolution": (7, True),
    # dim agg + final per-type agg; the salted join broadcasts the
    # replicated dim at this SF (and widens the key space at scale)
    "join_salted_skew": (2, True),
    # two pid-window exchanges (the range shuffles sit behind global_rank's
    # lineage cuts); final zcell agg reuses the second window's layout
    "events_zorder_locality": (2, False),
    # orders dedupe agg + the one union+window key shuffle; tolerance is
    # a post-carry-forward predicate (no extra exchange vs plain as-of)
    "asof_join_tolerance": (2, False),
    # (user, day) dedupe + islands window reusing its partitioning; final
    # per-user rollup
    "events_activity_islands": (2, False),
    # persisted token frame feeds unigram/pair/total lineages (static
    # re-count per consumer); pair+unigram aggs partial-aggregate, totals
    # broadcast, TakeOrdered top
    "text_adjacent_pmi_top": (10, True),
    # per-user LEAD window + state agg
    "events_state_durations": (2, False),
    # both pair frames sit behind lineage cuts (each feeds 3 aggregate
    # consumers — uncut, the static plan re-counted both dedup pipelines
    # per consumer: 78 exchanges); what remains is the semi-join + counts
    "dedup_minhash_recall_vs_exact": (5, True),
    # pure map: tokenize + sequence explode + in-row slice; the one
    # exchange is the split-aware spread of the single-split test file
    "dataset_chunk_documents": (1, False),
    # kernel emits per-batch top-K → the ranking window's partition-by is
    # the one shuffle; label sides broadcast and the final agg reuses the
    # window's query_id partitioning
    "embedding_label_knn_disagreement": (1, True),
    # learned-quantizer IVF: cell-assignment window (N×K rows) counted
    # once per join side in the static plan + final ranking window; the
    # centroid and query frames broadcast.  r14: training rides the
    # session-cached corpus centroids — the eager lineage cut that hid
    # the spread repartition is gone, so the conditional spread of the
    # single-split test file is now visible once per join side
    "similarity_ivf_kmeans_topk": (5, True),
    # r4-late additions
    # first-touch per-user min + per-day count + the calendar-bounded
    # (O(days), never O(events)) global running-sum window
    "events_cumulative_unique_users": (3, False),
    # value-domain collapse (flag,qty) + flag-partitioned cumulative
    # window; the final per-flag min reuses the window's partitioning
    "agg_weighted_median": (2, False),
    # base and delta partial aggregations; the union-merge re-aggregation
    # reuses the month hash partitioning of the partial frames
    "mv_incremental_refresh": (2, False),
    # centroid agg (map-side combined to K x D) broadcast back onto the
    # exploded scan + (vec,label) re-agg + per-label ranking window
    "embedding_centroid_outliers": (3, True),
    # prefix-filtered all-pairs (r5, re-budgeted r14): the weighted index
    # + norm table moved from a per-call eager lineage cut to the SHARED
    # session cache (persist) — persists substitute at runtime but do not
    # truncate the cold static plan, so the index-build lineage (shingle
    # pipeline + grouped-index Exchange + norm agg) is now VISIBLE once
    # per consumer subtree where the old cut hid it.  Runtime shuffles
    # per warm call went DOWN (the build runs once per session, zero per
    # call); the static count reflects the cold first-call plan only.
    "dedup_tfidf_cosine_prefix": (40, True),
    # same re-budget (r14): session-cached weighted index replaces the
    # per-call cut; cold static plan carries the build lineage per
    # consumer subtree, warm calls run pair-expansion + norm joins only
    "dedup_tfidf_cosine": (27, True),
    # fixed-point decay weights map-side; the 1-row max-date aggregate
    # broadcasts; one per-user agg (2-phase under distinct-free sums)
    "events_decayed_engagement": (2, True),
    # explode + (bucket) agg; the count-distinct doubles the agg phases
    "text_hashing_trick_features": (2, False),
    # map-only Arrow Gram partials -> ONE tiny (dim_i,dim_j) reduce
    "embedding_gram_matrix": (1, False),
    # same Gram build behind a lineage cut; post-cut: the final G.v join's
    # D-row agg + Rayleigh agg + distinct-dim seed (iteration exchanges
    # run at construction behind per-step cuts); v frames broadcast
    # r13: the corpus pass (Gram kernel + D² reduce) runs at construction
    # like the kmeans trainer; the returned frame is the 64-row driver
    # result — the iteration no longer schedules per-step Spark jobs
    "embedding_top_pc_power_iteration": (0, False),
    # (gold,pred) agg + the langs²-bounded share window
    "text_langid_confusion": (2, False),
    # two 1-row sketch aggregations (one broadcast) + the exact contract
    "sketch_hll_intersection": (3, True),
    # customer agg + 1-row quartile agg (broadcast back, replayed per
    # consumer in the static plan) + the <=64-key segment agg
    "orders_rfm_segmentation": (6, True),
    # components sit behind per-iteration lineage cuts; post-cut: split
    # tag + the count-distinct two-phase aggregation
    "dataset_split_leakage_safe": (2, False),
    # per-user conversion agg + the 1-row arm reduce
    "events_ab_test_analysis": (2, False),
    # basket frame behind a lineage cut (4 consumers); post-cut: orderkey
    # self-join + pair agg + unary supports + order count + top-k window;
    # support/total joins broadcast
    "orders_market_basket_lift": (7, True),
    # span + daily aggs -> dense frame joined to its 7-day shift + final
    # per-type reduce; the type-cardinality side broadcasts
    "events_forecast_backtest": (4, True),
    # BatchEvalPythonUDTF expansion is map-side; word agg (count-distinct
    # doubles the phases)
    "sql_udtf_lateral": (2, False),
    # three staged per-user conditional-MIN aggs + the cohort-bounded
    # percentile agg; user frames broadcast where AQE sizes allow
    "events_funnel_time_to_convert": (4, True),
    # fingerprint window + the 1-row moment reduce
    "profile_quality_dup_correlation": (2, False),
    # user-count agg lineage appears under both the cutpoint and the main
    # reduce in the static plan (runtime reuses the exchange); 1-row
    # percentile broadcast
    "events_power_users_pareto": (4, True),
    # (dow,hour) agg; count-distinct doubles the phases; 168-row output
    "events_seasonality_profile": (2, False),
    # one aggregation on (lang, bit-length bin)
    "profile_doc_length_histogram": (1, False),
    # spread + shingle distinct + df agg + ~20-bin rollup
    "profile_shingle_df_histogram": (4, False),
    # unthresholded jaccard pair frame -> per-doc top-20 cap window (one
    # doc_a repartition, r5) -> 1-row conditional-sum reduce; the
    # persisted shingle lineage (5 consumers: df, capped join, sizes,
    # both self-join sides) is re-counted per consumer in the STATIC plan
    # (runtime reuses the materialization — the bm25/pmi precedent)
    "dedup_threshold_sweep": (25, True),
    # distributed sweep: session agg + the range repartition sits behind
    # the lineage cut; post-cut the in-partition running sum needs NO
    # exchange beyond the _pid re-group, and r14 folded n_sessions into
    # the same 1-row reduce (bounds/2) — the session-count branch and its
    # broadcast crossJoin are gone
    "events_peak_concurrency": (2, False),
    # first-order agg + (cohort, month) cell agg + the months^2-bounded
    # cumulative window; customer side broadcast at oracle SF
    "orders_cohort_ltv_curve": (3, True),
    # first-touch agg joined back + day-keyed conditional agg (the two
    # count-distincts expand the agg phases)
    "events_new_vs_returning_daily": (3, True),
    # monthly decimal agg + the months-bounded LAG window
    "orders_mom_growth": (2, False),
    # per-vector exact norm (in-row dot) + the ~40-bin rollup
    "embedding_norm_histogram": (1, False),
    # (source,tok) agg lineage feeds source totals / global counts / the
    # term join (static re-count per consumer — the bm25 precedent);
    # 1-row corpus total broadcasts
    "text_source_drift_chisquare": (9, True),
    # 1-row midpoint broadcast + bin histogram + 1-row totals broadcast +
    # final reduce (histogram lineage re-counted under the totals side)
    "events_value_drift_l1": (6, True),
    # part-revenue agg + distributed_prefix_sum (range shuffle behind the
    # cut; in-partition window) + totals broadcast + 3-key class agg
    "orders_abc_classification": (4, True),
    # (day,type) agg lineage under both the counts and totals sides
    # (static re-count), then the day-bounded reduce
    "events_type_concentration_hhi": (4, True),
    # supplier agg + global_rank's range shuffle behind the cut + 1-row
    # moment reduce
    "supplier_revenue_gini": (2, False),
    # r4c: (price,size) agg + per-price argmax agg; prefix-max's range
    # shuffle sits behind the lineage cut and its exclusive window is
    # in-partition-only
    "part_skyline_pareto": (2, False),
    # r4c: user-partitioned carry-forward window + channel agg (the
    # count-distinct doubles the agg phases)
    "events_attribution_last_touch": (2, False),
    # r4c: every BFS level is cut (frontier joins are per-level jobs);
    # post-cut only the final hops histogram shuffles
    "graph_bfs_reach": (1, False),
    # r4c: per-value half-count agg lineage re-counted under the n-side
    # and the cum side (static re-count — the bm25 precedent); the
    # prefix-sums range shuffle sits behind the lineage cut; 1-row
    # midpoint + totals broadcast
    "events_value_drift_ks": (5, True),
    # r4c: cutpoint percentile agg (broadcast back) + the clipped
    # moment agg
    "events_value_winsorized": (2, True),
    # r4c: 8 independent constraint checks unioned — each FK check is an
    # anti-join + two 1-row reduces, each PK check a grouped dup count;
    # every exchanged frame is a 1-row count or a key-cardinality agg
    "audit_constraints": (17, True),
    # r4c: the two SOURCE retrievals' full pipelines (BM25 inverted index
    # + dense scan) appear in the static plan; the fusion itself adds
    # only the (queries x k)-bounded outer join + ranking window
    "retrieval_rrf_fusion": (15, True),
    # r4c: daily agg lineage re-counted under the totals side (static
    # re-count); the O(days) windows move the day frame, never the corpus
    "events_changepoint_cusum": (4, True),
    # r4c: QI-cell count + the bounded rollup
    "audit_k_anonymity": (2, False),
    # r4c: per-user sequence agg (2-phase) + the 1-row pattern reduce
    "events_sequence_patterns": (2, False),
    # r4c: per-user pre/post agg lineage re-counted under the moments and
    # the arms sides (static re-count — the bm25 precedent); midpoint +
    # moments are 1-row broadcasts
    "events_ab_cuped": (6, True),
    # r4c: edges/oriented are behind the shared builder's lineage cuts;
    # post-cut the degree agg + three 1-row reduces remain
    "graph_clustering_coefficient": (4, True),
    # r4c: sketches sit behind lineage cuts (<=K rows each); the exact-
    # truth side replays the two distinct lineages per consumer (static
    # re-count — the bm25 precedent) and every exchanged frame is
    # key-cardinality bounded
    "sketch_kmv_jaccard": (26, True),
    # r4c: the one fact join (AQE strategy) + priority-bounded rollup
    "orders_shipping_latency_sla": (2, True),
    # r4c: (user,week) dedupe lineage re-counted under firsts/lag/churn
    # consumers (static re-count); all post-dedupe frames week- or
    # user-week-bounded
    "events_growth_accounting": (6, True),
    # r4c: one fact join + brand-bounded moment agg
    "orders_discount_elasticity": (1, True),
    # r4c: two batch partial aggs + the merge agg + the lang summary
    "pipeline_incremental_curation": (4, False),
    # r4c: all three stages execute at CONSTRUCTION (driver-side counts,
    # like the iterative ops); the returned frame is a literal
    "pipeline_dedup_cascade": (0, False),
    # r4c: per-user LAG window + per-user moment agg reusing its layout
    "events_bot_regularity": (2, False),
    # r4c: posexplode + D-bounded agg
    "embedding_dim_stats": (1, False),
    # r4c: the pair frame sits behind a lineage cut (symmetrization
    # consumes it twice); post-cut the degree agg + bin rollup remain
    "graph_degree_distribution": (2, False),
    # r4c: q05-shaped star agg lineage re-counted under the leaf/region/
    # total sides (static re-count); all post-agg frames nation-bounded
    "revenue_share_of_parent": (8, True),
    # r4c: digit agg lineage re-counted under the totals side; 9-row
    # rollup + 1-row broadcast
    "audit_benford_first_digit": (3, True),
    # r6: the session-cached capped-index lineage statically re-counts
    # under its three consumers (sizes + both self-join sides) exactly
    # like dedup_threshold_sweep; at runtime the persisted index is one
    # build
    "dedup_containment": (23, True),
    # r6: the 30-row daily frame re-counts under both pair sides, the
    # rank window, the global count window, and the OLS moments — every
    # exchanged frame after the first daily agg is timespan-bounded
    "events_trend_theil_sen": (5, True),
    # r6: one map-side-combined sign pass, the truth key agg, and its
    # final 1-row merge; truth broadcast back
    "sketch_ams_f2": (3, True),
    # r6: blocked frame (pre-explode repartition) feeds the kernel; the
    # rank window's partition-by and the mutual self-join re-count the
    # candidate pipeline under both aliases (ReuseExchange collapses at
    # runtime)
    "similarity_mutual_knn": (8, True),
    # r6: the (queries x k)-row rel frame sits behind a lineage cut (both
    # pair sides consume it; the spliced BM25 runs once) — post-cut only
    # the pair join and the per-query applyInPandas shuffle remain
    "retrieval_mmr_diversify": (2, True),
    # r6: map-only — JVM payload build + Arrow box walk, no exchange
    "multimodal_mp4_box_parse": (0, False),
    # r6: the shared token-explode lineage statically re-counts under
    # the dl and first-occurrence aggs and their checkpoint rollups;
    # post-agg frames are 16-row / vocabulary-bounded
    "text_heaps_law_fit": (11, True),
    # r6: components sit behind the edge-frame lineage cuts; what
    # remains is the doc-comp join, the source agg, and the 1-row
    # totals broadcast back
    "pipeline_dedup_weighted_mixture": (3, True),
    # r6: labels behind the per-iteration lineage cuts; the size agg and
    # the histogram rollup remain (both cluster-bounded)
    "graph_knn_components": (2, False),
    # r6: the (status, priority) count agg + the value-cardinality
    # window's partition-by; the window never sees corpus rows
    "agg_mode_exact": (2, False),
    # r10: the admit-gate pair — cell-keyed join (probe side), best-twin
    # window partition-by, the verdict left-join, final select; the
    # corpus side reuses the cached frozen assignment.  The grow-K twin
    # must hold the SAME shape as the fixed-K gate (only K differs).
    "dedup_ingest_admit_gate": (4, False),
    "dedup_ingest_admit_gate_growk": (4, False),
    # r10: two admit rounds of the same core (the sequential fold)
    "similarity_ivf_maintenance_tick": (8, False),
    # r12: two shingle distincts + the 2048-word bit_or agg + per-(doc,g)
    # hit agg + the exact-membership (calibration) join + doc rollup;
    # the 8 KiB filter relation is the broadcast
    "dedup_bloom_ingest_prefilter": (8, True),
    # r12: the corpus token agg + the language-cardinality (~5-row)
    # single-partition window frame — planning math rides a tiny frame
    "dataset_unimax_mixture": (2, False),
    # r12: map-only kernel; the one exchange is the single-split spread
    "multimodal_audio_clipping_qa": (1, False),
    # r12: bucket-pair edge build + per-(fam,src) top-E window sit behind
    # the edges/entries/beam lineage cuts (each beam frame is
    # query-bounded); what remains is the per-hop score/prune and the
    # calibration brute-force arm; query payloads broadcast
    "similarity_graph_ann_beam": (10, True),
    # r12: map-only kernel (islands inside the kernel); the one exchange
    # is the single-split spread
    "multimodal_video_scene_cuts": (1, False),
}


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_shuffle_budget(name, spark):
    max_exchanges, expect_broadcast = BUDGETS[name]
    # cached frames left by earlier tests (operators persist() reused
    # intermediates) get substituted into matching plan fragments by the
    # CacheManager, changing static exchange counts — count the cold plan
    spark.catalog.clearCache()
    df = QUERIES[name].fn(spark, SF_ORACLE)
    text = plans.explain_text(df, "simple")
    n_exchanges = text.count("Exchange") - text.count("BroadcastExchange")
    assert n_exchanges <= max_exchanges, (
        f"{name}: {n_exchanges} shuffles (budget {max_exchanges})\n{text[:2000]}"
    )
    if expect_broadcast:
        assert "BroadcastHashJoin" in text or "BroadcastNestedLoopJoin" in text, text[:2000]
