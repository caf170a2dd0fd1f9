"""Generate PLANS.md: formatted physical plans of the headline queries.

The plan IS the scale argument — this artifact makes it reviewable:
pushed filters, pruned schemas, broadcast joins, partial aggregation and
TakeOrdered are visible per query, with a one-line note on why each plan
is the one we want at 100 TB.

Run: python tools/dump_plans.py   (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from naive_query_engine_spark import get_spark, plans  # noqa: E402
from naive_query_engine_spark.queries import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: query → what to look for in its plan
ANNOTATED = {
    "q01_pricing_summary": "partial+final HashAggregate (map-side combine); "
    "7/11 columns read; shipdate filter pushed to the scan",
    "q03_shipping_priority": "no hints: AQE broadcasts the filtered sides at "
    "this SF by measured size (sort-merge at 100x — BASELINE.md); "
    "TakeOrderedAndProject for the top-k (no global sort)",
    "q05_region_revenue": "5-way star join; only nation/region are hinted — "
    "customer/orders/supplier broadcast here by AQE's size check and "
    "switch to sort-merge at scale",
    "similarity_cosine_pairs": "distributed block-pair matmul (r3 shape): "
    "blocked frame is a localCheckpoint (grouping job runs once, invisible "
    "here); pre-explode repartition of the B-row frame, "
    "explode(sequence(0,block)) pair keys with the b-payload attached, one "
    "broadcast join for the a-payload, MapInPandas numpy stage — no driver "
    "collect anywhere",
    "q06_forecast_revenue": "all four predicates in PushedFilters (row-group "
    "pruning at scale)",
    "sort_topk": "TakeOrderedAndProject: per-partition top-k + merge",
    "join_semi": "LeftSemi — existence check without materializing payload",
    "dedup_minhash_lsh": "signatures aggregate the raw gram stream "
    "(partial agg, no shingle shuffle); candidates only from band-bucket joins",
    "similarity_topk_vectorized": "ArrowEvalPython/MapInPandas stage whose "
    "kernel emits only per-batch top-K per query (r3) — the ranking window "
    "shuffles n_q x K x n_batches rows, corpus-size-independent",
    "events_sessionize": "session window aggregation keyed by user",
    "asof_join_events_orders": "union + running last-non-null window — one "
    "shuffle on the key, no inequality-join fan-out",
    "dataset_mixture_sample": "two column-pruned scans (strata counts; hash "
    "tagging); per-stratum rate table is stratum-cardinality bounded, so AQE "
    "broadcasts it — the fact table never sees a window or a hint",
    "similarity_pq_adc_topk": "PQ-ADC: codebook (labels x subspaces) and "
    "per-query ADC lookup tables are bounded BroadcastExchanges; the corpus "
    "side is a map-side code-lookup join, one skinny shuffle for the "
    "(query, neighbor) sum, window top-k — no decompression, nothing O(n^2)",
    "graph_pagerank": "iterative fixpoint (r3): setup (sym/deg/src_side) is "
    "checkpointed ONCE with partitioning preserved, so the per-iteration "
    "ranks join needs no exchange on either side — the only per-iteration "
    "shuffle is the contribution sum; top-N is TakeOrdered-then-rank",
    "pipeline_model_scoring": "batch inference: feature extraction in "
    "WholeStageCodegen, then one ArrowEvalPython/MapInPandas stage applying "
    "the model per Arrow batch — no shuffle at all; scoring is "
    "embarrassingly parallel over scan partitions",
    "events_wau_sliding": "sliding distinct: (day,user) dedupe is the only "
    "raw-volume shuffle; the 7x explode fans out the DEDUPED set (exact "
    "path) and per-day SKETCH rows (HLL path) — window pass touches "
    "kilobytes per day at scale",
    "graph_triangle_count": "degree-ordered orientation: per-part top-2 "
    "window (bounded groups), then edge/degree equi-joins and the wedge "
    "self-join whose fan-out is capped by max out-degree; final top-k is "
    "TakeOrderedAndProject, never a global sort",
    "text_vocab_coverage": "vocab = global top-V limit (TakeOrdered) -> the "
    "one legitimately bounded BroadcastExchange; exploded token stream "
    "joins it map-side, one keyed agg by doc — corpus shuffled once",
    "dataset_global_interleave": "two-phase salted ranking: (source,salt) "
    "window then survivors-only (source) window; global order is a "
    "TakeOrdered over N x |sources| rows, never a corpus sort",
    "multimodal_mime_sniff": "payload build + magic-byte hex inspection all "
    "inside WholeStageCodegen; single partial+final agg by detected type — "
    "no Python, no extra exchange",
    # r3 additions
    "text_bm25_topk": "sparse retrieval: one tf aggregation builds the "
    "inverted index (persisted, 5 consumers); query terms probe postings by "
    "term equi-join; the 1-row (n_docs, total_dl) stats frame is the only "
    "broadcast hint (ungrouped aggregate — bounded by rule); per-(query,doc) "
    "BIGINT score sum + ranking window",
    "dedup_substring": "exact-substring index: stride-1 hashed windows "
    "(narrow transform + explode), per-doc distinct, df-cap join kills "
    "boilerplate fan-out, inverted-index self-join only meets same-window "
    "docs — the bounded-candidate shape, never all-pairs",
    "fuzzy_entity_resolution": "blocked Levenshtein pairs (block-key "
    "equi-join bounds the quadratic kernel) feed the label-propagation "
    "fixpoint on string ids; final per-entity aggregation",
    "text_char_bigram_likelihood": "bigram expansion is a narrow per-row "
    "transform; count table bounded by charset^2 (AQE broadcasts it); one "
    "join keyed by bigram + one doc aggregation",
    # r4 additions
    "embedding_kmeans_lloyd": "Lloyd training ran at construction "
    "(cut_lineage); the visible plan is scan -> MapInPandas (int64 matmul "
    "assignment, centroids in the closure) -> one partial+final cluster "
    "rollup — a single exchange for the whole clustering",
    "dedup_substring_strided": "winnowed fingerprints: window-min selection "
    "is ROW-LOCAL (transform over the in-row hash array — no raw-window "
    "shuffle at all), then the same df-cap + inverted-index self-join as "
    "stride-1 over a K-times-smaller index",
    "events_zorder_locality": "two distributed global ranks "
    "(repartitionByRange behind the lineage cut, per-partition offsets via "
    "a bounded map lookup) + Morton interleave in codegen + one zcell agg "
    "— no single-partition window anywhere",
    "similarity_ivf_kmeans_topk": "learned-quantizer IVF: trained centroid "
    "table is a bounded BroadcastExchange; cell assignment ranks N x K "
    "rows in one partitioned window; probe join meets same-cell vectors "
    "only; final ranking window over probed candidates",
    # late-r4 additions
    "embedding_gram_matrix": "X'X as map-only Arrow partials: scan -> "
    "MapInPandas (per-batch int64 Q.T@Q) -> ONE exchange of 2080-row "
    "partials per batch + exact decimal reduce — the oracle's self-join "
    "shape would shuffle O(N x D^2) rows instead",
    "dedup_tfidf_cosine": "weighted index behind a lineage cut "
    "(materialized once for norms + both self-join sides); post-cut: "
    "inverted-index self-join bounded by the df cap, pair agg, broadcast "
    "norm joins",
    "orders_rfm_segmentation": "no global NTILE: quartile cutpoints are a "
    "1-row percentile aggregate broadcast back; per-customer scoring is "
    "map-side comparisons; final agg is <=64 segment keys",
    "events_cumulative_unique_users": "first-touch inversion: per-user MIN "
    "(map-side combinable) + per-day count; the running-sum window is "
    "calendar-bounded (O(days)) — the only single-partition stage and it "
    "can never grow with the corpus",
    "mv_incremental_refresh": "mergeable partials: base and delta each "
    "partial-aggregate (map-side combine), union-merge re-aggregates by "
    "month — refresh cost O(delta)+O(|MV|), the base never rescanned",
    "events_forecast_backtest": "densified daily series (per-type calendar "
    "explode, zero-fill) joined to its 7-day shift; exact integer error "
    "sums, one division per type — everything after the daily agg is "
    "day-cardinality bounded",
    "events_peak_concurrency": "distributed sweep-line: the boundary "
    "stream's range repartition sits behind a lineage cut (partitioning "
    "pinned), per-partition delta sums collected once (bounded), and the "
    "running sum is an IN-PARTITION window offset by predecessors' totals "
    "— the textbook global prefix-sum window never appears",
    "text_source_drift_chisquare": "drift monitor: (source,tok) counts "
    "aggregate once; source totals and the global token distribution are "
    "bounded side frames; per-token chi-square terms floor to fixed-point "
    "BIGINTs map-side so the final per-source sum is order-free",
    # --- r4c additions ---
    "part_skyline_pareto": "skyline via per-price argmax (two map-side-"
    "partial aggs) + distributed_prefix_max: the range repartition sits "
    "behind a lineage cut and the EXCLUSIVE running max is an "
    "in-partition window — no single-partition window over the "
    "SF-scaling price domain",
    "events_attribution_last_touch": "conditional carry-forward window "
    "(user-partitioned, exclusive preceding frame) + channel-bounded "
    "agg; the 7-day predicate is exact microseconds",
    "graph_bfs_reach": "frontier BFS: per-level joins are behind "
    "per-level lineage cuts (each level one keyed shuffle of "
    "frontier-sized data); the static plan shows only the final hops "
    "histogram",
    "events_value_drift_ks": "per-value half counts aggregate once; "
    "BOTH cumulative sums share one range shuffle "
    "(distributed_prefix_sums); sup of integer cross-products, one "
    "double division after the max",
    "events_value_winsorized": "type-keyed percentile cutpoints "
    "broadcast back onto the scan (category-bounded, documented guard "
    "exception); clipped mean decomposed into exact decimal + "
    "count*cutpoint terms",
    "audit_constraints": "8 count-only constraint checks unioned: FK "
    "anti-joins (sort-merge at scale), PK duplicate-surplus aggs, "
    "notnull conditional count — output is 8 rows at any corpus size",
    "retrieval_rrf_fusion": "both source retrievals' full pipelines "
    "(BM25 inverted-index probe; broadcast-query dense scan) feed a "
    "(queries x k)-bounded full outer join + ranking window",
    "events_changepoint_cusum": "one corpus pass to daily counts; the "
    "cumulative/argmax windows run over the O(days) calendar frame "
    "(bounded-domain exception to the no-global-window rule)",
    "audit_k_anonymity": "QI-cell grouped count + bounded rollup; "
    "cell frame is |QI-domain|-bounded",
    "events_sequence_patterns": "per-user ordered symbol strings "
    "(deterministic array_sort collect); literal patterns as conditional "
    "sums in ONE ungrouped agg + stack() — no row expansion",
    "events_ab_cuped": "per-user pre/post agg; moments and arm frames "
    "are 1-row/2-row reduces broadcast back; theta/rho from integer "
    "co-moments",
    "graph_clustering_coefficient": "shared co-supplier builder behind "
    "lineage cuts; post-cut degree agg + three bounded reduces",
    "sketch_kmv_jaccard": "per-set distinct hashes + salted two-phase "
    "bottom-K; sketch frames lineage-cut at <=K rows; exact-truth side "
    "is the only corpus-sized work",
    "orders_shipping_latency_sla": "one SF-dominant fact join (AQE "
    "strategy) + priority-bounded conditional-sum rollup",
    "events_growth_accounting": "(user,week) dedupe + per-user LAG; "
    "every later frame is week-bounded",
    "orders_discount_elasticity": "one fact join + brand-bounded integer "
    "co-moment aggregation; slope/intercept/R2 are final expressions",
    "pipeline_incremental_curation": "per-batch scored_filtered partials "
    "(the expensive per-doc stage, paid once per batch) + argmin-state "
    "merge + lang summary — the algebraic-MV law on the curation flow",
    "events_bot_regularity": "per-user LAG gaps floored to seconds by "
    "integer division; exact moment agg; CV2 as one double expression",
    "embedding_dim_stats": "posexplode + D-bounded aggregation — one "
    "corpus pass for the whitening-prep stats",
    "graph_degree_distribution": "pair frame behind a lineage cut "
    "(symmetrization reads it twice); post-cut degree agg + bit-length "
    "bin rollup",
    "revenue_share_of_parent": "q05-shaped star agg re-joined at two "
    "bounded rollup levels; the share joins never touch the fact table",
    # r5 additions
    "dedup_tfidf_cosine_prefix": "prefix-pruned candidate join (19% of "
    "postings indexed at t=0.8) + full-index verify + per-doc top-20 cap "
    "window; weighted index behind the shared lineage cut",
    "embedding_top_pc_power_iteration": "map-only Arrow Gram partials "
    "behind a cut; six fixed-point iterations ride D^2-row frames with "
    "broadcast vectors — iteration exchanges run at construction",
    "sketch_join_size_estimate": "two fixed d*w sketch aggregations + "
    "(seed,pos)-aligned join; the truth side is the scorer, not the path",
    "multimodal_jpeg_header_parse": "map-only: JVM-side payload build + "
    "Arrow marker-walk kernel, zero exchanges",
    "events_value_jackknife_ci": "one corpus pass to 16 bucket partials "
    "(map-side combined); every later frame is 16- or 1-row",
    "text_zipf_slope": "word-count agg + TakeOrdered; the ranking window "
    "sees only the 1000 survivors; 1-row exact moment reduce",
    "retrieval_eval_mrr_ndcg": "all corpus cost in the spliced BM25 "
    "operator; label joins and DCG aggs are (queries x k)-bounded",
    "window_distribution_functions": "one partition-by shuffle; "
    "percent_rank/cume_dist ride the same sort",
    # r6
    "dedup_containment": "same session-cached capped inverted index as "
    "ngram-jaccard (df-capped fanout, never all-pairs); containment adds "
    "one LEAST() projection to the already-joined pair frame",
    "events_trend_theil_sen": "one map-side-combined daily agg is the only "
    "corpus-scale stage; pair/rank/moment frames are timespan-bounded "
    "(days^2 rows)",
    "sketch_ams_f2": "16 sign-sum aggregate expressions in ONE "
    "map-side-combined pass (no per-seed row blowup); truth side is the "
    "only key shuffle, broadcast back for scoring",
    "similarity_mutual_knn": "block-pair frame + per-row top-k inside the "
    "Arrow kernel (n*B*k candidates, never n^2); global rank per src; "
    "mutual self-join over n*k survivors",
    "retrieval_mmr_diversify": "spliced BM25 probe behind a lineage cut "
    "(both pair sides read the 25-row rel frame); candidate-id point "
    "lookups into embeddings; per-query greedy in applyInPandas",
    "multimodal_mp4_box_parse": "map-only: JVM-side box build + Arrow "
    "box-tiling walk; no exchange anywhere",
    "agg_mode_exact": "(group, value) count agg is the only corpus "
    "stage; the tie-broken rank window sees one row per distinct value",
    "text_heaps_law_fit": "two map-side aggs (doc lengths, per-term "
    "first occurrence) + 16-way broadcast-threshold rollup; no global "
    "token ordering anywhere",
    "pipeline_dedup_weighted_mixture": "components behind the edge-frame "
    "lineage cuts; one source-keyed agg + 1-row totals broadcast",
    "graph_knn_components": "mutual-kNN edges (<= n*k rows, degree <= k) "
    "feed bounded-fanout label propagation; size + histogram aggs only",
    # --- r6 second wave ---
    "dedup_segment_exact": "tiling segments (corpus/W rows, not corpus x W "
    "like overlapping shingles); md5-keyed df shuffle + same-key join-back "
    "(AQE reuses the exchange); 20-group rollup",
    "pipeline_cdc_merge": "window-dedup both sides PARTITIONed BY the merge "
    "key, the same partitioning the full-outer join needs — one exchange "
    "per side; batch side date-pruned at the scan; 4-row output",
    "embedding_int8_quantization_error": "posexplode + D-bounded min/max agg "
    "(the trained SQ8 params, 64 rows) broadcast back; two linear passes",
    "graph_link_prediction": "wedge join on z then (a,b) agg — degree "
    "bounded <= n*k^2 by the mutual-kNN substrate; anti-join on the cached "
    "edge frame; TakeOrdered top-N with total tie-break",
    "dataset_erase_propagation": "four semi-joins against the subject "
    "sliver (bloom/DPP-prunable at scale); transitive lineitem cascade "
    "through erased order keys; scalar-agg assembly",
    "events_late_arrival_audit": "distributed_prefix_max: range exchange on "
    "arrival key, per-partition exclusive cummax + driver-composed offsets "
    "— no single-partition window; bucket agg is 6 rows",
    "orders_scd2_priority_history": "lag, running-sum version id, and LEAD "
    "validity all PARTITIONed BY o_custkey — one exchange reused "
    "end-to-end; 5-row rollup",
    "layout_partition_skew_report": "one map-side-combined key count (the "
    "same exchange the real join would pay); hot-key top-1 and simulated "
    "reducer histogram are key-bounded; 1-row assembly via broadcasts",
    "multimodal_image_phash_dedup": "spread scan -> JVM pixel build -> "
    "Arrow aHash kernel (map-only), then ONE hash-keyed groupBy — image "
    "dedup is dedup_exact's plan with pixels for text",
    "events_absence_timeout": "NO JOIN: next-B-after-A is a running MIN "
    "over the REVERSED per-user sort (UNBOUNDED PRECEDING..1 PRECEDING — "
    "Spark evaluates FOLLOWING-unbounded frames quadratically, see "
    "BASELINE.md) — single user_id exchange; day rollup bounded",
    "embedding_matryoshka_prefix_recall": "four prefix passes, each a "
    "broadcast of the 5 query vectors against the corpus with a k-bounded "
    "rank window; recall joins are (queries x k)-sized — corpus-linear",
    "dataset_dsir_importance_weights": "two lean corpus passes, no cache: "
    "one aggregation yields both bucket LMs AND (via its 256-row output) "
    "the totals; pass 2 joins the broadcast weight table for per-doc "
    "scores; selection is TakeOrderedAndProject — the LM 'model' never "
    "leaves 256 integers",
    "multimodal_audio_vad_segments": "map-only: payload build + Arrow VAD "
    "kernel fuse into one pass, zero exchanges — segmentation state never "
    "crosses a recording",
    "dataset_split_neardup_leakage": "session-cached edge frame (7th "
    "consumer) tagged by two broadcast joins against the split hash; "
    "1-row output from three bounded aggregates",
    "embedding_cluster_balanced_sample": "Lloyd assignment (broadcast "
    "centroids, Arrow matmul, map-only) then ONE cluster-keyed window "
    "emitting at most 10 rows per cluster — output K-bounded",
    "events_ab_srm_check": "one map-side-combined per-user aggregation "
    "feeding two 1-row reduces (clean + planted-bug scenarios) — nothing "
    "corpus-sized past the first shuffle",
    "multimodal_http_response_parse": "payload build + regexp parse all "
    "inside WholeStageCodegen, one bounded (verdict x ctype) agg — "
    "map-only, no Python",
    "orders_snapshot_as_of": "date predicate in PushedFilters (partition "
    "pruning at scale); latest-wins is one o_custkey ROW_NUMBER exchange; "
    "census rollup bounded by status x priority",
    "text_tokenizer_fertility": "one scan, per-row JVM regex counts in "
    "WholeStageCodegen, lang-bounded agg map-side combined — no Python, "
    "no window",
    "multimodal_phash_hamming_neardup": "Arrow aHash kernel -> 4-band "
    "struct explode -> band equi-join (AQE picks by size) -> XOR "
    "bit_count verify — the banded-candidate shape, never all-pairs",
    "dedup_cross_source_overlap": "cached shingle index -> (source, g) "
    "distinct -> shingle-keyed pair join with C(|sources|,2)-bounded "
    "fan-out -> sources^2-bounded matrix",
    "graph_label_modularity": "spliced mutual-kNN edges + two vec_id "
    "label joins; degree rollup and null-model sum are |labels|-bounded "
    "integer fixed-point — no float accumulation",
    "similarity_ivf_nprobe_sweep": "ranked-cells frame computed ONCE "
    "(one N x K window) and sliced at three probe depths; per-depth "
    "candidate joins touch probed cells only; recall joins "
    "(queries x k)-bounded",
    "dedup_tokens_saved_by_source": "components over the session-cached "
    "edge frame, one token-count scan, one doc_id join + source rollup — "
    "linear past the cached edges",
    "embedding_intrinsic_dimension_twonn": "block-pair frame -> Arrow "
    "kernel emitting per-row top-2 by exact integer L2^2 (n x B x 2 "
    "candidates, never n^2 out of the kernel) -> global top-2 window -> "
    "one bounded MLE reduce",
    "multimodal_image_resize": "map-only: payload build + box-filter "
    "kernel fuse, zero exchanges; 16 typed rows per image out",
    "graph_link_prediction_ivf": "the RA overlay on the per-IVF-cell "
    "substrate: Lloyd assignment (broadcast centroids), within-cell pair "
    "ranking, mutual top-k, then degree-bounded wedge join + anti-join — "
    "candidates sum(cell^2), never n^2; K is the linear-path knob",
    "graph_label_modularity_ivf": "the modularity overlay on the IVF edge "
    "frame (localCheckpoint, reused 4x); label joins + |labels|-bounded "
    "integer fixed-point rollups",
    "similarity_range_search_ivf": "within-cell pairs from the shared "
    "ivf_cell_cosine_pairs frame, one cosine filter — the production "
    "range-search twin of the n^2 blocked matmul",
    "graph_neighborhood_function_ivf": "wedge join on the degree-bounded "
    "IVF graph (<= n k^2 rows) for exact N(2); per-vertex HLL "
    "approx_count_distinct as the merge-shaped path replacing exact "
    "distinct at scale",
    "audit_t_closeness": "one (QI, band) grouped count (map-side partial), "
    "a domain-bounded cells x bands completion cross join (both broadcast), "
    "integer cross-multiplied TVD — nothing corpus-sized past the scan",
    "multimodal_zip_eocd_parse": "JVM hex payload build + one Arrow "
    "mapInPandas reverse-scan kernel — map-only, zero exchanges; scan "
    "bounded by the spec 64 KiB comment, not payload size",
    "lakehouse_deletion_vector_stats": "one file-granularity grouped count "
    "with map-side combine; all shares integer fixed-point DIV",
    "events_diff_in_diff": "one per-user shuffle then a 2-row reduce; "
    "DECIMAL(38,0) moments; Welch z over six exact numbers",
    "layout_curve_locality_compare": "two global_rank range-sorts "
    "(no single-partition window), 16 codegen'd Hilbert levels + Morton "
    "interleave map-only, cell-bounded rollups per curve",
    "text_quality_funnel": "one scan computing 4 integer rule booleans, "
    "first-fail CASE, 5-bucket count map-side combined; funnel arithmetic "
    "on a 1-row frame",
    "text_quality_rule_overlap": "ONE 1-row aggregate carrying all 10 "
    "pair counts — the pair matrix never materializes per-doc rows",
    "events_salting_plan": "one grouped count (key-domain output) + "
    "broadcast total; pure ceil-division arithmetic",
    "similarity_ivf_index_upsert": "the incremental-maintenance fold: "
    "frozen base-trained centroids (broadcast), per-batch assign + "
    "touched-cell membership slice + within-cell mutual top-k recompute, "
    "edge state spliced per batch (localCheckpoint between folds); "
    "census is two cell-bounded rollups — per batch the work is "
    "sum(touched cell^2), never corpus-sized",
    "dataset_split_neardup_leakage_ivf": "the cross-split audit over the "
    "session-cached IVF edge frame: two vec_id-keyed tag joins + "
    "counting — edge-list-linear; substrate misses only UNDERCOUNT",
    "dataset_contamination_check_ivf": "one cosine filter + eval-parity "
    "orientation over the shared ivf_cell_cosine_pairs frame — semantic "
    "decontamination at index-build cost, not n^2",
    "dataset_split_leakage_safe_ivf": "label-propagation components over "
    "the cached IVF edges (one keyed shuffle per round, lineage cut), "
    "md5 split on the component id, split-bounded census — leakage zero "
    "by construction on the substrate the index can see",
    "embedding_centroid_drift_check": "broadcast-centroid assign, one "
    "(cell, dim) grouped sum (map-side combine, <= KxD groups), KxD "
    "centroid join + K-bounded rollup — the Lloyd update step it "
    "simulates, as a report",
    "similarity_ivf_index_repair": "the whole control loop: frozen "
    "assignment (session-cached), drift gate, stage-2 Lloyd on the "
    "pooled flagged members only (O(pool)), K-bounded census + "
    "broadcast checksum join; driver collects are the K-flag set and "
    "KxD centroid dicts",
    "dedup_semantic_ivf": "SemDeDup on the substrate: tau-filter over "
    "the shared within-cell pairs frame, label-propagation components, "
    "canonical census — cross-cell misses only SPLIT groups "
    "(conservative dedup), never merge",
    "dedup_ingest_admit_gate": "the admit arm of the index lifecycle: "
    "broadcast-centroid assign of the arrivals, ONE cell-keyed join, "
    "and a per-arrival tau-twin argmax that WindowGroupLimit prunes to "
    "top-1 BEFORE the full window sort — O(batch x cell-occupancy) per "
    "micro-batch once K tracks n, never O(corpus).  (Here the arrival "
    "set is a full third of the corpus, so AQE picks a symmetric "
    "sort-merge join; at real micro-batch sizes the probe side falls "
    "under autoBroadcastJoinThreshold and the maintained-table twin's "
    "join becomes broadcast — the index side scans in place with no "
    "exchange, the serving-probe shape)",
    "dedup_ingest_admit_gate_growk": "the PRODUCTION-K admit gate "
    "(K = ceil(n_base/150), grow-K): same verdict plan shape as the "
    "fixed-K gate — broadcast-centroid assign, ONE cell-keyed join, "
    "WindowGroupLimit-pruned tau-twin argmax — but the quantizer's K "
    "tracks the corpus count, holding expected cell occupancy (and so "
    "per-arrival probe cost) flat at any scale; the 10x probe read "
    "0.24x per-unit cost (BASELINE.md r10)",
    "embedding_kcenter_coreset": "Gonzalez farthest-point coreset: the "
    "returned frame is a T-row local relation (the plan to read is the "
    "per-round shape — a map-only broadcast-literal distance fold plus "
    "a 1-row struct-argmax reduce, repeated T times, NO shuffle in any "
    "round; the running-min frame re-materializes every 2 rounds so "
    "the plan never deepens)",
    "embedding_hard_negatives_ivf": "cross-label top-k per query over "
    "the shared within-cell pairs frame instead of the query x corpus "
    "broadcast scan — near vectors co-locate in cells, so the "
    "restriction fits this op; misses are softer negatives only",
    "similarity_ivf_maintenance_tick": "the composed admit-then-index "
    "fold: two sequential gate rounds, each one broadcast-centroid "
    "assign + one cell-keyed join + a WindowGroupLimit-pruned top-1 "
    "argmax; the corpus side grows by the admitted rows between rounds "
    "behind a lineage cut, so round 2's plan is round 1's plan over "
    "base ∪ admits — per-batch cost is the serving-probe envelope, the "
    "corpus never re-shuffles",
    "similarity_ivfpq_adc_topk": "IVF-PQ: the coarse cells bound the "
    "candidate scan (probe joins assign on cell, broadcast), the PQ "
    "codes bound the bytes per candidate (8 codes vs 64 floats), and "
    "the ADC tables broadcast — one skinny shuffle for the per-(query, "
    "neighbor) partial-dot sum, WindowGroupLimit top-k; the corpus "
    "side moves only cell-pruned code rows",
    "graph_kcore_peeling": "four synchronized peels, each a degree "
    "aggregation over the session-cached symmetrized edge frame plus "
    "two semi-join restrictions on the shrinking survivor set (AQE "
    "turns them broadcast as survivors collapse); lineage cut per "
    "round bounds the plan, the driver never sees a row",
    "orders_snapshot_diff": "time-travel diff: two latest-wins snapshot "
    "windows on the SAME natural key (both date filters pushed to the "
    "scan), full-key left join classifying added/changed/unchanged — "
    "the o_custkey partitioning is reused end-to-end, so the diff "
    "costs one exchange under AQE",
    "multimodal_tar_member_index": "map-only Arrow kernel over "
    "JVM-built ustar bytes: sequential block walk with checksum "
    "verification, offsets local to each payload — no shuffle, one "
    "task per shard at 100 TB, output is the ranged-GET manifest",
    "graph_kcore_ivf": "bounded peeling on the session-cached per-cell "
    "substrate edges: per round one degree aggregation + two "
    "shrinking semi-joins (AQE broadcasts the survivor set as it "
    "collapses); peeling decomposes by cell because every substrate "
    "edge is within-cell",
    "dataset_packing_fragmentation_sweep": "one shuffle-on-source "
    "ordered window computes the running offset ONCE; the four ctx "
    "candidates fan out as a broadcast VALUES join (a projection per "
    "candidate, not four window passes); boundary math is pure integer "
    "division",
    "graph_pagerank_personalized": "same iterate as graph_pagerank "
    "(checkpointed setup, one contribution-sum shuffle per iteration); "
    "the seed teleport column is computed once, lineage-cut node-keyed, "
    "and joins each iteration's node-keyed aggregate partition-aligned "
    "— personalization adds zero exchanges to the loop; supplier top-N "
    "is TakeOrdered",
    "text_rake_keywords": "RAKE: one token explode + one per-doc "
    "ordered window for the phrase ids (single doc_id shuffle); word "
    "stats are vocab-bounded (AQE broadcasts them into the "
    "phrase-scoring join); pure-integer degree//freq scores; corpus "
    "top-N is TakeOrdered, never a global sort",
    "features_pit_backfill": "PIT backfill as union + running sums: "
    "facts and two probe rows per label in ONE frame, a single "
    "user-partitioned window (probes sort before facts at equal ts = "
    "the strict < boundary), windowed features as probe-pair "
    "differences — one shuffle on user_id, zero fan-out, vs the "
    "oracle's inequality join that explodes on facts x labels per user",
    "dedup_bloom_ingest_prefilter": "Bloom admit gate: one "
    "map-side-combined bit_or pass packs corpus shingles into the "
    "2048-word (8 KiB) filter, which BROADCASTS into the batch probe "
    "join; the exact-membership arm (the one corpus-sized join) is the "
    "calibration measurement production samples — the admit path costs "
    "one map pass per batch regardless of corpus size",
    "dataset_unimax_mixture": "UniMax waterfilling: one "
    "map-side-combined token agg over the corpus, then every window "
    "(rank, cap prefix, saturation census) runs on the "
    "language-cardinality frame — 5 rows here, a few hundred at web "
    "scale; all-integer allocation math, budget filled to the token",
    "multimodal_audio_clipping_qa": "map-only Arrow kernel: decode "
    "int16 PCM and reduce each recording to one QA row inside the "
    "kernel — no shuffle after the single-split spread; decode cost "
    "scales linearly with audio bytes",
    "similarity_graph_ann_beam": "graph-ANN serving probe: the "
    "bucket-pair edge build and the per-(family,src) top-E window sit "
    "behind lineage cuts (edges/entries/beam frames are all "
    "query- or degree-bounded), so each hop is a tiny join + "
    "visited-only scoring with the query payloads broadcast; the "
    "brute-force arm is the recall calibration, not the serving path",
    "multimodal_video_scene_cuts": "map-only Arrow kernel: per-frame "
    "luma sums, cut detection and the gaps-and-islands scene lengths "
    "all inside the kernel — one row per video, nothing shuffles",
}


def main() -> None:
    spark = get_spark(app_name="nqes-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical plans of the headline queries",
        "",
        f"Generated by `tools/dump_plans.py` at `{SF_DIR}` "
        "(AQE plans shown pre-execution: `isFinalPlan=false`).",
        "",
    ]
    for name, note in ANNOTATED.items():
        df = QUERIES[name].fn(spark, SF_DIR)
        text = plans.explain_text(df, "formatted")
        # tree + the scan-node evidence lines (pushdown/pruning proof)
        tree = text.split("\n\n")[0]
        tree = re.sub(r"#\d+L?", "", tree)
        evidence = [
            line.strip()
            for line in text.splitlines()
            if re.match(r"\s*(PushedFilters|ReadSchema|PartitionFilters):", line)
        ]
        out += [f"## {name}", "", f"*{note}*", "", "```", tree]
        if evidence:
            out += ["", "-- scan evidence --"]
            out += [re.sub(r"#\d+L?", "", e)[:160] for e in evidence]
        out += ["```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(ANNOTATED)} plans)")


if __name__ == "__main__":
    main()
