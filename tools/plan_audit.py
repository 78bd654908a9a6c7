"""Physical-plan audit: mechanical checks that the scale story holds.

For each audited query we assert, from `explain("formatted")` output:
  pushdown   — at least one parquet scan has non-empty PushedFilters
               (only for queries that filter on base columns)
  vectorized — every parquet scan reads Batched: true (columnar reader)
  partial    — queries flagged partial must show map-side partial
               aggregation before the exchange — the agg shrinks the
               shuffle, not the reverse. Detected either by partial_*
               function names, or (for distinct-style aggregates whose
               function list is empty on both sides and thus carries no
               partial_ marker) by a HashAggregate appearing as the
               DIRECT CHILD of an Exchange in the tree — children run
               first, so that aggregate fires map-side, pre-shuffle
  no_py_row  — no BatchEvalPython (row-at-a-time Python UDF) anywhere;
               ArrowEvalPython / FlatMapGroupsInPandas (vectorized) are
               allowed only for queries flagged arrow_ok
  broadcast  — queries flagged bcast must contain a BroadcastHashJoin or
               BroadcastNestedLoopJoin
  global_win — (r03 verdict item 3) any Window node with an EMPTY
               partition spec moves ALL rows to one task; only entries
               flagged global_ok (documented bounded-domain windows —
               skylines, vocabularies, group rollups) may carry one
  (WholeStageCodegen isn't assertable pre-execution under AQE — the
  formatted plan is the initial, pre-codegen one — so JVM-sidedness is
  covered by the no-Python checks instead)

Additionally a SOURCE lint (r03 verdict item 2): every `F.broadcast(`
call site in hepop_spark/ must appear in BOUNDED_BROADCASTS with a
one-line boundedness justification — a hinted broadcast of a side that
grows with the corpus is a forced-OOM at scale (the r03 copurchase_jaccard
lesson), so new hints fail the audit until justified here.

Run: python tools/plan_audit.py [sf_dir]
Exit code 1 if any audit fails — wired for CI-style use.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hepop_spark.queries import registry
from hepop_spark.session import get_spark

# name -> set of extra expectations
AUDITS: dict[str, set[str]] = {
    "q1_pricing_summary": {"pushdown", "partial"},
    "q3_shipping_priority": {"pushdown", "bcast", "partial"},
    "q5_local_supplier": {"pushdown", "bcast", "partial"},
    "q6_forecast_revenue": {"pushdown", "partial"},
    "q7_volume_shipping": {"bcast", "partial"},
    "q14_promo_effect": {"pushdown", "bcast", "partial"},
    "join_broadcast_dim": {"bcast"},
    "range_join_bins": {"bcast", "partial", "bnlj_ok"},
    "b2_filter_like": {"pushdown"},
    "b3_time_range": {"pushdown"},
    "win_topk_per_group": set(),
    "win_range_time": set(),
    "dedup_exact": set(),
    "dedup_minhash_lsh": set(),
    "text_token_stats": {"partial"},
    "ann_cosine_topk": {"arrow_ok", "bnlj_ok"},
    "tumbling_window": {"partial"},
    # fourth TPC-H batch
    "q2_min_cost_supplier": {"pushdown", "bcast", "partial"},
    "q8_market_share": {"bcast", "partial"},
    "q9_product_profit": {"pushdown", "bcast", "partial"},
    "q11_important_value": {"bcast", "partial"},
    "q17_small_qty_revenue": {"pushdown", "bcast", "partial"},
    "q19_disjunctive": {"bcast", "partial"},
    "q21_waiting_supplier": {"partial"},
    # corpus-statistics batch
    # round-6 closing curation batch
    "repeated_span_dedup": {"partial"},
    "ccnet_perplexity_buckets": {"bcast", "partial", "bnlj_ok"},
    "dsir_importance_weights": {"bcast", "partial", "bnlj_ok"},
    # round-6 extension batch (llm13): edit-distance dedup is a pure
    # blocked equi-join (no agg); Lloyd broadcasts the 8-row centroid
    # table into the corpus scan (BNLJ on a bounded side); the append-ANN
    # entry shares the flagship's bounded crossJoins and q_id-partitioned
    # rank windows (warm index: plan is the pure query path)
    "dedup_edit_distance": set(),
    "kmeans_lloyd_iter": {"bcast", "partial", "bnlj_ok"},
    "ann_ivfpq_append_topk": {"bcast", "bnlj_ok", "global_ok"},
    "ann_ivfpq_delete_topk": {"bcast", "bnlj_ok", "global_ok"},
    "tfidf_top_terms": {"partial", "bnlj_ok"},
    "text_bigram_counts": {"partial"},
    "sample_stratified_hash": {"partial"},
    "funnel_signup_purchase": {"partial"},
    "retention_weekly": {"partial"},
    # pipeline-maintenance batch
    "merge_upsert": {"pushdown"},
    "scd2_history": set(),
    "salted_join_skew": {"bcast", "partial"},
    "profile_columns": {"partial", "bnlj_ok"},
    "text_redact_pii": set(),
    "hll_partitioned_distinct": {"partial"},
    # dataset-shaping batch
    "text_chunk_windows": set(),
    "pack_sequences": {"partial"},
    "mix_sources_weighted": {"partial"},
    "decontaminate_ngram_overlap": {"bcast", "partial"},
    # joins + corpus accounting
    "join_null_safe": {"bcast", "partial"},
    "lateral_join_topn": {"bcast"},
    "text_url_extract": {"partial"},
    "corpus_filter_cascade": {"partial"},
    # dedup_incremental executes eagerly (persist lifecycle) and returns a
    # LocalRelation — its physical plan is covered by dedup_minhash_lsh's
    # audit (same machinery); only the no-Python check applies here
    "dedup_incremental": set(),
    # batch bands x stored-band equi-join; candidate-bounded verify
    "dedup_incremental_indexed": {"bcast"},
    "minhash_band_stats": {"partial"},  # hash agg over the stored band scan
    # micro-batched loop materializes its bounded result (like
    # dedup_incremental): the audited plan is the pinned local result
    "dedup_streaming_accumulate": set(),
    # real streaming sink + maintenance hook; same pinned-result shape
    "streaming_index_maintain_replay": set(),
    "weighted_percentile_maintained": set(),
    "streaming_ann_maintain_replay": set(),
    "streaming_lsh_maintain_replay": set(),
    # r12: graph maintained from the ingest stream; replay lifecycle
    # entry, pinned result (hooks + store asserted in-entry)
    "streaming_graph_maintain_replay": set(),
    # KMV-sketch maintained store (r09): lifecycle entry, pinned result
    "kmv_distinct_maintained": set(),
    # DDSketch-histogram maintained store (r09): lifecycle entry, pinned
    # result (map-sum monoid merged in-store; quantile read is bounded)
    "ddsketch_maintained": set(),
    # Bloom sidecar point lookup (r09): lifecycle entry, pinned result
    # (pruning accounting asserted in-entry; probe is driver-side bitmap
    # math, the read opens only admitted files)
    "bloom_point_lookup": set(),
    # API-routed bloom lookup (r09): same lifecycle shape; the in-entry
    # breadcrumb assertion (files_read < files_live) is the prune proof
    "bloom_routed_lookup": set(),
    # r10: OR-union of sidecar candidate sets (in-entry plan asserts)
    "sidecar_routed_or_union": set(),
    # trigram-sidecar LIKE routing (r09c): same lifecycle shape; the
    # in-entry breadcrumb assertion is the prune proof
    "trigram_routed_like": set(),
    # star-join aggregate routing (r09c): lifecycle entry (pinned
    # result); grid-scan/no-raw-scan/broadcast asserted in-entry
    "rollup_routed_join": set(),
    # streaming-maintained sidecars (r09c): replay lifecycle entry,
    # pinned result; lock-step + pruning asserted in-entry
    "streaming_sidecar_maintain_replay": set(),
    # retention expiry (r09c): storage-mutation lifecycle entry, pinned
    # result; drop count + idempotence asserted in-entry
    "retention_expiry": set(),
    # z-order x zone 2-D pruning (r09c): lifecycle entry, pinned result;
    # dual-probe engagement + intersection pruning asserted in-entry
    "zone_zorder_prune": set(),
    # all-depth PNG decode (r09): Arrow-batched mapInPandas codec stage
    "multimodal_png_depths": {"arrow_ok"},
    # zone-sidecar range routing (r09): lifecycle entry, pinned result
    "zone_routed_range": set(),
    # NFC dedup (r09): the Arrow NFC stage is the one legitimate Python
    # step (no Spark normalization builtin); count-distincts are partial
    "dedup_unicode_nfc": {"arrow_ok", "partial"},
    # aggregate->rollup routing (r08): the audited plan is the ROUTED
    # query's (routed_plan_text probe, SPECIAL_PLANS below) — rollup_scan
    # asserts the grid parquet is scanned and the raw table is NOT
    "rollup_routed_aggregate": {"rollup_scan", "partial"},
    # the filtered variant must ALSO push the rewritten key predicate
    # into the grid's parquet scan
    "rollup_routed_filtered": {"rollup_scan", "partial", "pushdown"},
    # min/max extrema ride the same routed grid scan (r09)
    "rollup_routed_minmax": {"rollup_scan", "partial"},
    # avg finalized from grid sum+count partials (r09)
    "rollup_routed_avg": {"rollup_scan", "partial"},
    # hourly continuous aggregation on the events time series (r09)
    "rollup_routed_timegrid": {"rollup_scan", "partial"},
    # BETWEEN range on the hour key, pushed into the grid scan (r09)
    "rollup_routed_timerange": {"rollup_scan", "partial", "pushdown"},
    # exact count(distinct key) as a grid row count (r09)
    "rollup_routed_count_distinct": {"rollup_scan", "partial"},
    # HAVING on re-merged grid aggregates (r09)
    "rollup_routed_having": {"rollup_scan", "partial"},
    # r10: OR-of-equalities canonicalized to IN routes onto the same grid
    # scan with the key predicate pushed down
    "rollup_routed_or_in": {"rollup_scan", "partial", "pushdown"},
    # r11: boolean-tree HAVING / SQL-precedence routing — same routed
    # grid-scan shape; the claim is WHICH store the plan reads
    "rollup_routed_having_or": {"rollup_scan", "partial"},
    "rollup_routed_where_precedence": {"rollup_scan", "partial"},
    "rollup_routed_cte": {"rollup_scan", "partial"},
    # r12: linear chain — same routed grid-scan claim through two CTEs
    "rollup_routed_cte_chain": {"rollup_scan", "partial"},
    # r12b: grouping construct re-emitted over the grid (Expand + two-
    # phase aggregate); derived table lifted through the CTE proof;
    # UNION ALL with both branches on the grid scan, key filters pushed
    "rollup_routed_grouping_sets": {"rollup_scan", "partial"},
    "rollup_routed_derived": {"rollup_scan", "partial", "pushdown"},
    "rollup_routed_union_all": {"rollup_scan", "partial", "pushdown"},
    # r12c: two grid-routed branches joined — both scans on the grid
    # with their key filters pushed; the grid-sized sides broadcast
    "rollup_routed_cte_parallel": {"rollup_scan", "partial", "pushdown",
                                   "bcast"},
    "rollup_routed_derived_join": {"rollup_scan", "partial", "pushdown",
                                   "bcast"},
    # r12: routed CTE joined to a dim in the outer — the dim legitimately
    # lives under dbs/, so the claim is fact-only: grid scanned, raw FACT
    # table not scanned, dim broadcast
    "rollup_routed_cte_join": {"rollup_scan_fact", "partial", "bcast"},
    # r12 graph ANN: beam-search over the kNN graph — hops materialize
    # via localCheckpoint, so the returned plan is the final top-k
    # window over the visited set (in-entry joins are broadcast-linted)
    "ann_graph_topk": set(),
    # r12: one NN-descent round — edge self-join + bounded re-score;
    # map-side partials on the distinct/top-K stages
    "knn_graph_refine": {"partial"},
    # r12: artifact audit — 1-row stats x 1-row checksum crossJoin is a
    # bounded BNLJ by design
    "knn_graph_index_stats": {"partial", "bnlj_ok"},
    # r10: mixed-key OR tree routed onto the grid (disjunction does not
    # push down to parquet as a single filter; rollup_scan is the claim)
    "rollup_routed_mixed_or": {"rollup_scan", "partial"},
    # r10: the PUBLIC hepop_spark.sql() surface — in-entry plan asserts,
    # collected rows returned, so only the lifecycle no-UDF rules apply
    "sql_routed_entrypoint": set(),
    # skewed-band dedup (r08): the reps join must carry the salt in its
    # join keys (hot bucket spread over SKEW_SALT partitions) and the
    # min-per-bucket agg must be map-side partial (hot key absorbed
    # before the exchange) — together, no single-partition band stage
    "dedup_skewed_band": {"salted_band_join", "partial"},
    # KMV sketch set-ops: the crossJoins are 1-row aggregates x k-row
    # sketches (constant cost at any corpus scale) -> BNLJ by design
    "theta_sketch_setops": {"bnlj_ok"},
    "ddsketch_quantiles": {"partial"},
    "embedding_quantize_int8": {"partial"},
    # UDF surface: grouped pandas agg IS the (allowed) Arrow stage
    "grouped_mad_pandas": {"arrow_ok"},
    # corpus-shaping + similarity additions
    "split_train_val_test": {"partial"},
    "corpus_shuffle_head": {"global_ok"},  # rank window over the 20 post-LIMIT rows
    "ts_correlation_pairs": {"partial", "pushdown"},
    "fuzzy_name_join": {"partial"},
    "text_repetition_score": {"partial"},
    "cross_source_dup_matrix": {"partial"},
    # round-2 analytics batch
    "concurrency_sweep": {"partial"},
    "counter_rate": {"partial"},
    "time_weighted_avg": {"partial"},
    "rolling_zscore": {"partial"},
    "ewma_smooth": {"partial"},
    "activity_streaks": {"partial"},
    "dq_constraint_suite": {"partial"},
    "fk_orphan_audit": {"bcast", "partial"},
    "triangle_count": {"partial", "bnlj_ok"},
    "pagerank_3iter": {"partial"},
    "kmeans_assign": {"bcast", "bnlj_ok"},
    "knn_vote": {"bcast", "bnlj_ok"},
    # heavy_hitters_mg: the Misra-Gries summary IS the (allowed) Python stage
    "heavy_hitters_mg": {"arrow_ok", "bcast", "partial", "bnlj_ok"},
    "abtest_welch": {"partial"},
    "regr_by_group": {"partial"},
    # interval_overlap_join is a pure equi-join + filter: no aggregate stage
    "interval_overlap_join": set(),
    "attribution_last_touch": set(),
    "bm25_rank": {"bcast", "partial", "bnlj_ok"},
    "token_entropy": {"partial"},
    "pareto_frontier": {"partial", "global_ok"},  # skyline over grouped (brand, container) domain
    "chi_square_independence": {"bcast", "partial", "bnlj_ok", "global_ok"},  # chi2 total over contingency cells (|types| x 2)
    "trend_movers_dod": {"partial"},
    "share_of_total": {"bcast", "partial", "global_ok"},  # cumulative share over 25-nation rollup
    "log_template_mine": {"partial"},
    "state_occupancy": {"partial"},
    "slo_burn_rate": {"partial", "global_ok"},  # rolling window over hourly aggregate series
    "negative_sample_pairs": {"bcast", "partial", "bnlj_ok"},
    # ann_recall_eval: the IVF cell assignment is the (allowed) Arrow stage
    "ann_recall_eval": {"arrow_ok", "bcast", "bnlj_ok", "global_ok"},  # 16-row post-LIMIT codebook rank windows
    "streaming_counter_rate_replay": set(),
    "pattern_3step_funnel": {"partial", "bnlj_ok"},
    "geo_distance_join": {"partial"},
    "cumulative_distinct_users": {"partial", "global_ok"},  # cumsum over distinct-days domain
    "mv_join_refresh": {"bcast", "partial"},
    "latency_bands_hourly": {"partial"},
    "session_paths_topk": set(),  # collect_list is not partial-aggregable
    "histogram_cumulative_le": {"partial"},
    "mode_per_group": {"partial"},
    # round-2 curation batch (llm4.py)
    "dedup_containment": {"partial"},
    "boilerplate_ngrams": {"partial"},
    "prefix_dup_groups": {"partial"},
    "semantic_dedup_cc": {"partial"},
    # PQ ANN: the encode/ADC GEMMs are the allowed Arrow stages; rerank
    # broadcasts the query side
    "ann_pq_topk": {"arrow_ok", "bcast"},
    # the chained pipeline: benchmark n-gram side is broadcast into the
    # contamination join; stage accounting partial-aggregates
    "curation_funnel": {"partial", "bcast"},
    # keyless interval join: event_type filters must reach the scan
    "interval_overlap_grid": {"pushdown"},
    "sample_importance_weighted": {"partial"},
    # HEP codec round-trip is the allowed Arrow stage; id slice pushes down
    "hep_sip_call_stats": {"arrow_ok", "partial", "pushdown"},
    # representative-collapsed minhash: same broadcast-verify shape as parent
    "dedup_minhash_collapsed": {"partial", "bcast"},
    # vocab-sized regression input; token count partial-aggregates
    "text_zipf_fit": {"partial", "global_ok"},  # rank regression needs the full vocab (Heaps-sublinear domain)
    "heaps_law_curve": {"partial", "bnlj_ok"},
    "ttr_by_source": {"partial"},
    # the documented exact all-pairs baseline — the ONLY entry allowed a
    # CartesianProduct (row-cap-guarded in code; scale path = ann_lsh_topk)
    "embedding_neardup": {"cartesian_ok"},
    # broadcast side is the bounded 10-vector query set
    "ann_lsh_topk": {"arrow_ok", "bcast"},
    "ann_ivf_topk": {"arrow_ok", "bcast"},
    "ann_sq8_topk": {"arrow_ok", "bcast"},
    # IVF-PQ compound is fully column-native: bounded broadcasts (cells,
    # codewords), no Python anywhere
    "ann_ivfpq_topk": {"bcast", "bnlj_ok", "global_ok"},  # bounded 16-row cells/books crossJoins; 16-row post-LIMIT sample rank
    # round-3 statistics batch (analytics10.py). bnlj_ok entries join a
    # broadcast 1-ROW aggregate (grand total / scalar marginal) — a scalar
    # BNLJ is constant-cost at any corpus scale, unlike a cartesian.
    "benford_first_digit": {"pushdown", "partial", "bcast", "bnlj_ok"},
    "mutual_information_cells": {"bcast", "partial", "bnlj_ok"},
    "gini_split_eval": {"partial"},
    "calibration_bins": {"partial"},
    "kanonymity_audit": {"bcast", "partial", "bnlj_ok"},
    "entropy_by_column": {"bcast", "partial"},
    "quantile_bins_equidepth": {"partial", "bcast", "bnlj_ok", "global_ok"},  # cumsum over distinct-cents grid; 10-row bin-range BNLJ
    "winsorize_clip": {"bcast", "partial"},
    # round-3 LLM batch (llm6.py)
    "pmi_collocations": {"bcast", "partial", "bnlj_ok", "global_ok"},  # rank over PMI_TOP post-LIMIT rows
    "rare_token_oov_rate": {"bcast", "partial"},  # vocab via TakeOrdered, no window
    # range search: the only aggregate is the keys-only pair distinct
    # (no partial_* functions in the plan); candidate gen is an equi-join
    "lsh_range_search": set(),
    "feature_hashing_vec": {"pushdown", "partial"},
    "target_encoding_loo": {"bcast", "partial", "bnlj_ok"},
    "tokenizer_bpe_apply": {"partial", "global_ok"},  # rank over BPE_TOK_TOP post-LIMIT rows
    "copurchase_jaccard": {"bcast", "partial"},
    "embedding_centroid_dist": {"bcast", "partial"},
    # round-3 model-eval batch (analytics11.py)
    "auc_roc_exact": {"partial", "global_ok"},  # cumsum over the bounded score grid
    "ks_test_twosample": {"pushdown", "partial", "bnlj_ok", "global_ok"},  # scalar totals join; cumsum over bounded cents grid
    "bootstrap_ci_hash": {"pushdown", "partial"},
    # top-k order stats: TakeOrdered window + broadcast scalar, no aggregate
    "tail_index_hill": {"bcast", "bnlj_ok", "global_ok"},  # broadcast 1-row x_k; rank over HILL_K post-LIMIT rows
    "dp_noise_count": {"partial"},
    # iterative cached-edge loop; covered by the no-Python check
    "label_propagation_3iter": set(),
    # pure narrow map — 16 dot products per row, zero shuffles
    "random_projection_reduce": set(),
    "ngram_lm_bigram": {"bcast", "partial", "bnlj_ok"},
    # round-3 VoIP batch (voip_q.py): planted-dialog plants are narrow maps,
    # rollups are bounded-key aggregations
    "sip_response_class_rates": {"pushdown", "partial"},
    "sip_pdd_percentiles": {"pushdown", "partial"},
    "rtcp_mos_rollup": {"pushdown", "partial"},
    "call_duration_log_hist": {"pushdown", "partial", "bcast", "bnlj_ok"},
    "sip_retransmission_rate": {"pushdown", "partial"},
    "capture_seq_gaps": {"pushdown", "partial"},
    # round-6 VoIP trunk-health batch (voip_q2.py): all windows partitioned
    # by the bounded trunk key, rollups partial-combine on trunk
    "rtp_loss_gilbert": {"pushdown", "partial"},
    # round-6 preference-eval batch (analytics20.py): bounded 25-model
    # roster, all rollups partial-combine
    "pairwise_winrate_matrix": {"partial"},
    "elo_batch_update": {"partial"},
    "bradley_terry_mm_iter": {"partial"},
    "rtcp_xr_burst_gap": {"pushdown", "partial"},
    "trunk_busy_hour": {"pushdown", "partial"},
    "trunk_peak_concurrency": {"pushdown", "partial"},
    # round-3 SQL-surface batch (analytics12.py)
    "agg_modern_funcs": {"partial"},
    "hierarchy_rollup_tree": {"partial"},
    "table_checksum": {"partial"},
    "weighted_percentile_disc": {"partial"},  # window now over per-flag distinct-cents domain (partitioned)
    # round-3 closing batch (analytics13.py)
    "vocab_size_sweep": {"partial", "bcast", "bnlj_ok", "global_ok"},  # cumulative coverage needs the full ranked vocab (Heaps-sublinear)
    "stratified_kfold_assign": {"bcast", "partial"},
    "negative_mining_hard": {"pushdown", "bcast", "bnlj_ok"},
    "sip_dialog_progress": {"pushdown", "partial", "bcast", "bnlj_ok"},
    "cdc_keep_latest": {"partial"},  # max_by keep-latest hash agg (r04)
    # eager iterative/storage entries (LocalRelation results)
    "graph_bfs_distance": set(),
    "snapshot_diff": set(),
    # function-surface batch (functions_ext4.py)
    "agg_bitwise_masks": {"partial"},
    "str_funcs2": set(),
    "interval_arith": {"pushdown"},
    # round-3 analytics trio (analytics15.py)
    # keys-only pair distinct + window rank; no partial_* agg functions
    "asof_join_nearest": {"pushdown", "partial"},  # min_by nearest-click agg (r04)
    "rolling_corr": {"pushdown", "partial", "global_ok"},  # rolling window over hourly joined series
    "percentile_cont_family": {"partial"},
    # type-surface batch (functions_ext5.py)
    "decimal_exact_money": {"partial"},
    "union_by_name_evolution": {"pushdown", "partial"},
    # round-3 batch three (llm7.py / timeseries2.py)
    "keyword_rake_topk": {"bcast", "partial", "global_ok"},  # rank over RAKE_TOP post-LIMIT rows
    # keys-only pair distinct (no partial_* funcs), like lsh_range_search
    "knn_graph_build": set(),
    "embedding_sim_histogram": {"partial", "bcast", "bnlj_ok", "global_ok"},  # cumulative over bounded e2 histogram bins
    "downsample_m4": {"partial"},
    "seasonal_residual_stats": {"bcast", "partial"},
    "partition_skew_stats": {"partial", "bcast", "bnlj_ok"},
    "lsh_range_search_collapsed": {"partial"},  # collapse groupBy partials
    "pq_encode_stats": {"partial", "bcast", "global_ok"},  # 16-row post-LIMIT codebook rank
    # data-mixing batch (llm8.py)
    "domain_reweight_step": {"partial", "bcast", "bnlj_ok"},
    "decontaminate_exact_substring": {"pushdown", "partial", "bcast", "bnlj_ok"},
    "token_budget_allocation": {"partial", "bcast", "bnlj_ok", "global_ok"},  # largest-remainder rank over per-source domain
    # round-4 curation batch (llm9.py) + VoIP jitter
    "dedup_norm_whitespace": {"partial"},
    "bloom_decontaminate": {"bcast", "partial"},
    "ngram_repetition_loop": {"partial"},
    "minhash_merge_shards": {"partial"},
    "rtp_jitter_rfc3550": {"pushdown", "partial"},
    # window over the bounded distinct-n_chars grid; 8-row shard broadcast
    "curriculum_shard_roundrobin": {"partial", "bcast", "bnlj_ok", "global_ok"},
    # full minhash chain + 1-row planted-count broadcast
    "dedup_minhash_recall_eval": {"partial", "bcast", "bnlj_ok"},
    "length_bucket_padding": {"partial", "bcast", "bnlj_ok"},  # 1-row global-max broadcast
    # round-5 batch (llm10.py): persisted-index audit + curation ops
    "ann_ivfpq_code_stats": {"partial"},  # hash agg over the stored code scan
    "lsh_bucket_stats": {"partial"},  # hash agg over the stored bucket scan
    # per-source running-sum window (partitioned) + per-source hash agg
    "sequence_packing_stats": {"partial"},
    "cross_source_duplication": {"partial"},  # (fp, source) agg + fp self-join
    # two-level prefix sum over the MATERIALIZED grid: fine windows per
    # (flag, bucket), offset window over the ~600-row bucket grid, 3-row
    # total broadcast — all consumers scan the tiny stored rollup
    "weighted_percentile_rollup": {"partial", "bcast"},
    # bounded top-K simplex: vocab broadcast join, 1-row/≤K+1-row cross joins
    "source_token_jsd": {"partial", "bcast", "bnlj_ok"},
    "source_temperature_mix": {"partial", "bcast", "bnlj_ok"},  # 1-row normalizer broadcast
    "embedding_decontaminate": {"partial"},
    "quality_logreg_filter": {"partial"},
    "winnowing_fingerprints": {"partial"},  # per-doc window, doc-partitioned
    "association_rules_brand": {"partial", "bcast"},
    "maxsim_late_interaction": {"partial", "bnlj_ok"},  # exact-baseline shape (ann_cosine_topk twin); production = rerank over an ANN shortlist
    "time_split_leakage_audit": {"partial"},  # full-scan CASE split, no base filter
    "ngram_cond_entropy": {"partial"},
    "maxsim_vs_cosine_agreement": {"partial", "bnlj_ok"},  # exact-baseline pair, like its inputs
    "countmin_token_freq": {"partial", "bcast"},
    "bottomk_sample_merge": {"global_ok"},  # rank over the k-row post-LIMIT sets
    "source_ngram_novelty": {"partial"},
    # round-4 closing analytics trio (analytics16.py)
    "funnel_time_to_convert": {"pushdown", "partial"},
    "order_fulfillment_sla": {"partial"},
    "sessionized_bounce_rate": {"partial"},
    # round-4 final trio (analytics17.py)
    "window_funnel_steps": {"pushdown", "partial"},
    "attribution_position_based": {"pushdown", "partial"},
    "market_concentration_hhi": {"partial", "bcast"},
    "quantile_normalize_feature": {"partial"},
    "golden_record_merge": {"partial"},
    # streaming_m4_replay executes eagerly (replay harness, LocalRelation)
    "streaming_m4_replay": set(),
    "streaming_cdc_latest_replay": set(),
    "streaming_sip_asr_replay": set(),
}


# ---------------------------------------------------------------------------
# bounded-broadcast catalog: "relpath:first-arg-identifier" -> why the
# broadcast side is bounded (does NOT grow with the corpus, or grows
# strictly sublinearly with a documented cap). A site missing here FAILS.
# ---------------------------------------------------------------------------
BOUNDED_BROADCASTS: dict[str, str] = {
    "hepop_spark/operators/similarity.py:qv": "bounded query set (|q| vectors, contract of the topk API)",
    "hepop_spark/queries/analytics.py:cust": "TPC-H dim: segment-filtered customer, small side vs orders x lineitem",
    "hepop_spark/queries/analytics.py:customer": "TPC-H dim, small side vs the lineitem fact",
    "hepop_spark/queries/analytics.py:supplier": "TPC-H dim (SF/100 of lineitem)",
    "hepop_spark/queries/analytics.py:nation": "fixed 25 rows",
    "hepop_spark/queries/analytics.py:region": "fixed 5 rows",
    "hepop_spark/queries/analytics.py:part": "TPC-H dim, small side vs lineitem",
    "hepop_spark/queries/analytics10.py:total": "1-row grand-total aggregate",
    "hepop_spark/queries/analytics10.py:mx": "marginal over o_orderpriority (5 values)",
    "hepop_spark/queries/analytics10.py:my": "marginal over o_orderstatus (3 values)",
    "hepop_spark/queries/analytics10.py:tot": "1-row / per-column-name scalar aggregates",
    "hepop_spark/queries/analytics10.py:viol": "1-row violation-count aggregate",
    "hepop_spark/queries/analytics10.py:counts": "per-event_type counts (bounded type domain)",
    "hepop_spark/queries/analytics10.py:bounds": "per-event_type clip bounds (bounded type domain)",
    "hepop_spark/queries/analytics10.py:bins": "fixed N_BINS=10 ntile boundary rows",
    "hepop_spark/queries/analytics11.py:tot": "1-row totals aggregate",
    "hepop_spark/queries/analytics11.py:xk": "1-row k-th order statistic",
    "hepop_spark/queries/analytics11.py:bc": "bigram-context counts over the capped vocab",
    "hepop_spark/queries/analytics11.py:uni_w1": "unigram vocab (Heaps-law sublinear, min-count capped)",
    "hepop_spark/queries/analytics11.py:vsize": "1-row vocab size",
    "hepop_spark/queries/analytics13.py:tot": "1-row / per-source totals (bounded source domain)",
    "hepop_spark/queries/analytics13.py:anchors": "fixed 8-row anchor-point sample",
    "hepop_spark/queries/analytics17.py:sup": "TPC-H supplier dim (SF/100 of lineitem)",
    "hepop_spark/queries/analytics17.py:nat": "fixed 25-row nation dim",
    "hepop_spark/queries/analytics2.py:dim_keys": "keys-only projection of the declared dim table (API contract)",
    "hepop_spark/queries/llm15.py:tot": "per-key bucket-weight totals: one row per grid key (+1 global) — bounded by the key domain, never by rows",
    "hepop_spark/storage/bloom_index.py:mdf": "one (file, m, L) row per file being indexed in THIS update call — bounded by the update's file list (r10: shared by the bloom and trigram builds via _or_aggregate_bitmaps)",
    "hepop_spark/queries/analytics3.py:stats": "1-row corpus stats (N, avgdl)",
    "hepop_spark/queries/analytics3.py:idf": "token vocab (Heaps-law sublinear; df>=2 floor)",
    "hepop_spark/queries/analytics3.py:avgdl": "1-row avg doc length",
    "hepop_spark/queries/analytics4.py:row_m": "contingency row marginals (bounded event_type domain)",
    "hepop_spark/queries/analytics4.py:col_m": "contingency col marginals (bounded variant domain)",
    "hepop_spark/queries/analytics4.py:n": "1-row grand total",
    "hepop_spark/queries/analytics4.py:nat": "fixed 25-row nation dim",
    "hepop_spark/queries/analytics5.py:maxp": "1-row max aggregate",
    "hepop_spark/queries/analytics5.py:q": "bounded query-point set (10 rows)",
    "hepop_spark/queries/analytics7.py:nat": "fixed 25-row nation dim",
    "hepop_spark/queries/llm.py:cand_docs": "LSH candidate doc ids (near-dup volume, << corpus by construction)",
    "hepop_spark/queries/llm.py:sides": "candidate pairs exploded to (doc, pair) sides (near-dup volume)",
    "hepop_spark/queries/llm.py:queries": "bounded 10-vector query set",
    "hepop_spark/queries/llm12.py:tot": "1-row token grand total",
    "hepop_spark/queries/llm12.py:freq_n": "token vocab (Heaps-law sublinear)",
    "hepop_spark/queries/llm12.py:tots": "1-row feature-model normalizers",
    "hepop_spark/queries/llm12.py:model": "fixed <=256-row hashed-feature model",
    "hepop_spark/queries/llm5.py:sa": "signatures of candidate docs only (near-dup volume)",
    "hepop_spark/queries/llm5.py:sb": "signatures of candidate docs only (near-dup volume)",
    "hepop_spark/queries/llm5.py:cand_docs": "candidate doc ids (near-dup volume)",
    "hepop_spark/queries/llm5.py:candidates": "candidate pairs (near-dup volume)",
    "hepop_spark/queries/llm5.py:tot": "1-row total token count",
    "hepop_spark/queries/llm5.py:freq_n": "token frequency vocab (Heaps-law sublinear)",
    "hepop_spark/queries/llm6.py:uni_w1": "unigram vocab above min-count floor (w1 side)",
    "hepop_spark/queries/llm6.py:uni_w2": "unigram vocab above min-count floor (w2 side)",
    "hepop_spark/queries/llm6.py:n_pos": "1-row position count",
    "hepop_spark/queries/llm6.py:vocab": "min-count-capped vocab",
    "hepop_spark/queries/llm6.py:per_src": "per-source aggregates (bounded source domain)",
    "hepop_spark/queries/llm6.py:glob": "1-row global aggregate",
    "hepop_spark/queries/llm6.py:cent": "per-(label, dim) centroids: |labels| x 64 rows",
    "hepop_spark/queries/llm7.py:wstats": "per-window-size stats (3 rows)",
    "hepop_spark/queries/llm7.py:tot": "1-row total",
    "hepop_spark/queries/llm7.py:books": "fixed 64-row PQ codeword table",
    # r12 graph ANN: everything query-side is bounded by the query set
    "hepop_spark/queries/llm7.py:pairs": "beam-search candidate pairs, "
    "bounded by queries x beam x graph degree per hop",
    "hepop_spark/queries/llm7.py:frontier": "per-query beam, bounded by "
    "queries x GRAPH_BEAM",
    "hepop_spark/queries/llm8.py:tot": "1-row totals aggregate",
    "hepop_spark/queries/llm8.py:z": "1-row normalizer",
    "hepop_spark/queries/llm8.py:probes": "fixed BENCH_N=20 probe set (TakeOrdered-selected)",
    "hepop_spark/queries/llm8.py:leftover": "1-row leftover count",
    "hepop_spark/queries/llm9.py:s1": "fixed 1024-word Bloom sketch (8 KB)",
    "hepop_spark/queries/llm10.py:tot": "1-row mixture normalizer",
    "hepop_spark/queries/llm10.py:sketch": "fixed 4x256 count-min counter matrix (8 KB)",
    "hepop_spark/queries/analytics18.py:v_df": "64-row PCA iterate",
    "hepop_spark/queries/analytics18.py:nrm": "1-row norm aggregate",
    "hepop_spark/queries/analytics18.py:na": "per-brand counts (25-value domain)",
    "hepop_spark/queries/analytics18.py:nb": "per-brand counts (25-value domain)",
    "hepop_spark/queries/llm9.py:shards": "fixed CURR_SHARDS=8 rows",
    "hepop_spark/queries/llm9.py:n_planted": "1-row planted-count aggregate",
    "hepop_spark/queries/llm9.py:gmax": "1-row global-max aggregate",
    "hepop_spark/queries/llm9.py:s2": "fixed 1024-word Bloom sketch (8 KB)",
    "hepop_spark/queries/mining_q.py:cent": "k centroids (k=4)",
    "hepop_spark/queries/llm13.py:cent": "k centroids (KMEANS_K=8)",
    "hepop_spark/queries/mining_q.py:q": "bounded query-point set",
    "hepop_spark/queries/mining_q.py:candidates": "min-support-capped candidate itemsets",
    "hepop_spark/operators/pq_index.py:cents": "fixed 32-row coarse-centroid table",
    "hepop_spark/operators/pq_index.py:books": "fixed 256-row PQ codeword table",
    "hepop_spark/operators/pq_index.py:qart": "|queries| x nprobe probe rows, each carrying the fixed m_sub x k_codes LUT map and the query norm (bounded query set x fixed codebook)",
    "hepop_spark/operators/pq_index.py:cents_arr": "one-row array fold of the fixed 32-row coarse-centroid table",
    "hepop_spark/operators/pq_index.py:books_arr": "one-row array fold of the fixed m_sub x k_codes PQ codebook",
    "hepop_spark/operators/pq_index.py:shortq": "rerank shortlist: <= |queries| x shortlist (150) rows joined to bounded query vectors",
    "hepop_spark/queries/analytics19.py:tot": "per-returnflag totals (3 rows)",
    "hepop_spark/queries/llm14.py:tot": "per-returnflag totals (3 rows)",
    "hepop_spark/queries/analytics19.py:vocab": "fixed top-K (100) corpus tokens",
    "hepop_spark/queries/analytics19.py:qdist": "K+1 bucket rows (bounded simplex)",
    "hepop_spark/queries/analytics19.py:ns": "per-source totals (bounded source domain)",
    "hepop_spark/queries/analytics19.py:nq": "1-row grand total",
    "hepop_spark/queries/timeseries2.py:slot": "per-(event_type, hour-of-day) seasonal means (bounded 24x|types|)",
    "hepop_spark/queries/timeseries2.py:tot": "1-row total",
    "hepop_spark/queries/tpch_more.py:cust": "TPC-H dim, small side vs orders/lineitem",
    "hepop_spark/queries/tpch_more.py:part": "filtered part dim, small side vs lineitem",
    "hepop_spark/queries/voip_q.py:tot": "1-row total",
    "hepop_spark/streaming/joins.py:dim": "enrich-with-dimension API: caller passes a dim table by contract",
}

# Matched against the WHOLE file text (not per line) so a call whose argument
# sits on the next line, or is an inline expression, cannot slip past the lint.
_BCAST_CALL_RE = __import__("re").compile(r"F\.broadcast\(")
_BCAST_IDENT_RE = __import__("re").compile(
    r"\A\s*([A-Za-z_][A-Za-z0-9_]*)\s*[),]", __import__("re").DOTALL
)


def lint_broadcast_sites(repo_root: str) -> list[str]:
    """Every F.broadcast( call site must be justified in BOUNDED_BROADCASTS;
    the argument must be a bare catalogued identifier (inline expressions are
    rejected outright — name the DataFrame so the catalog key exists); stale
    catalog entries (site gone) also fail so the catalog stays true."""
    import pathlib

    problems: list[str] = []
    found: set[str] = set()
    pkg = pathlib.Path(repo_root) / "hepop_spark"
    for p in sorted(pkg.rglob("*.py")):
        rel = p.relative_to(repo_root).as_posix()
        text = p.read_text()
        for m in _BCAST_CALL_RE.finditer(text):
            lineno = text.count("\n", 0, m.start()) + 1
            ident = _BCAST_IDENT_RE.match(text[m.end() : m.end() + 200])
            if not ident:
                problems.append(
                    f"{rel}:{lineno} F.broadcast(<expression>) — the argument "
                    "must be a bare named DataFrame so it can be catalogued in "
                    "BOUNDED_BROADCASTS; assign it to a variable first"
                )
                continue
            key = f"{rel}:{ident.group(1)}"
            found.add(key)
            if key not in BOUNDED_BROADCASTS:
                problems.append(
                    f"{rel}:{lineno} unjustified F.broadcast({ident.group(1)}) — "
                    "add a boundedness entry to BOUNDED_BROADCASTS or drop the hint"
                )
    for key in sorted(set(BOUNDED_BROADCASTS) - found):
        problems.append(f"stale BOUNDED_BROADCASTS entry (site gone): {key}")
    return problems


def _bracket_groups(s: str) -> list[str]:
    """Top-level [...] group contents of a formatted-plan Arguments line."""
    groups: list[str] = []
    depth = 0
    start = 0
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(s[start:i])
    return groups


def global_windows(plan: str) -> int:
    """Number of Window nodes with an EMPTY partition spec (all rows to one
    task). Shapes of the Arguments line:
      [exprs], [partition], [order]  -> partitioned (3 groups)
      [exprs], [partition]           -> partitioned, no order (2, no ASC/DESC)
      [exprs], [order]               -> GLOBAL sorted window (2, has ASC/DESC)
      [exprs]                        -> GLOBAL unordered window (1)
    """
    lines = plan.splitlines()
    n = 0
    for i, ln in enumerate(lines):
        if _WINDOW_NODE_RE.search(ln):
            for la in lines[i + 1 : i + 4]:
                la = la.strip()
                if la.startswith("Arguments:"):
                    groups = _bracket_groups(la)
                    if len(groups) <= 1:
                        n += 1
                    elif len(groups) == 2 and (
                        " ASC" in groups[1] or " DESC" in groups[1]
                    ):
                        n += 1
                    break
    return n


_WINDOW_NODE_RE = __import__("re").compile(r"^\s*(?:[+:*-]+\s*)?\(\d+\) Window$")


def explain_str(df) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def audit(name: str, plan: str, flags: set[str]) -> list[str]:
    problems: list[str] = []
    if "salted_band_join" in flags:
        # the band->reps equi-join's keys must include the salt column:
        # every "keys [...]" detail line naming bkey must name salt too
        key_lines = [ln for ln in plan.splitlines()
                     if "keys [" in ln and "bkey" in ln]
        if not key_lines:
            problems.append("no band-key join in plan")
        elif not all("salt" in ln for ln in key_lines):
            problems.append("band join keys missing the salt column "
                            "(hot bucket lands on one partition)")
    if "rollup_scan_fact" in flags:
        # routed CTE+JOIN: the grid must be scanned and the raw FACT
        # table must not be — the dim is ALLOWED under dbs/ (that is the
        # point of the join), so the plain rollup_scan rule cannot apply
        if f"{os.sep}rollups{os.sep}" not in plan:
            problems.append("routed plan does not scan a rollups/ store")
        if f"{os.sep}dbs{os.sep}documents" in plan:
            problems.append("routed plan still scans the raw fact table")
    if "rollup_scan" in flags:
        # the routed aggregate must read the maintained grid, never the raw
        # table (r07 verdict item 3's done-criterion)
        if f"{os.sep}rollups{os.sep}" not in plan:
            problems.append("routed plan does not scan a rollups/ store")
        if f"{os.sep}dbs{os.sep}" in plan:
            problems.append("routed plan still scans the raw dbs/ table")
    if "pushdown" in flags:
        pushed = [
            ln for ln in plan.splitlines()
            if "PushedFilters" in ln and "PushedFilters: []" not in ln
        ]
        if not pushed:
            problems.append("no non-empty PushedFilters on any scan")
    scans = [i for i, ln in enumerate(plan.splitlines()) if "Scan parquet" in ln]
    if scans and "Batched: true" not in plan:
        problems.append("parquet scan not vectorized (no Batched: true)")
    if "partial" in flags and "partial_" not in plan and not re.search(
        r"Exchange[^\n]*\n[^\n]*\+- HashAggregate", plan
    ):
        # distinct-style two-phase aggregates carry empty function lists
        # (no partial_ spelling); a HashAggregate as the direct child of
        # an Exchange is the map-side phase — children execute first
        problems.append("no map-side partial aggregation before exchange")
    if "BatchEvalPython" in plan:
        problems.append("row-at-a-time Python UDF (BatchEvalPython) in plan")
    if "arrow_ok" not in flags:
        for marker in ("ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas"):
            if marker in plan:
                problems.append(f"unexpected Python stage {marker}")
    if "bcast" in flags and "Broadcast" not in plan:
        problems.append("expected a broadcast join, none in plan")
    # Scale-killer guard (r02 verdict item 4): a CartesianProduct joins two
    # PARTITIONED (unbounded) sides — only explicitly-flagged exact
    # baselines may carry one. BroadcastNestedLoopJoin broadcasts one side,
    # which is fine iff that side is bounded; entries that legitimately
    # broadcast a bounded side into a non-equi/cross join declare bnlj_ok.
    if "CartesianProduct" in plan and "cartesian_ok" not in flags:
        problems.append("CartesianProduct on two unbounded sides")
    if "BroadcastNestedLoopJoin" in plan and not (
        {"cartesian_ok", "bnlj_ok"} & flags
    ):
        problems.append("BroadcastNestedLoopJoin not declared (bnlj_ok)")
    # r03 verdict item 3: an unpartitioned Window sorts ALL rows in one
    # task. Entries whose global window provably runs over a bounded
    # domain (skyline, vocab, group rollup, top-k survivors) declare
    # global_ok with a justification comment at the AUDITS entry.
    gw = global_windows(plan)
    if gw and "global_ok" not in flags:
        problems.append(
            f"{gw} unpartitioned Window node(s) — single-task global sort; "
            "declare global_ok only if the input domain is bounded"
        )
    return problems


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bcast_problems = lint_broadcast_sites(repo_root)
    for p in bcast_problems:
        print(f"FAIL broadcast-lint: {p}")
    if not bcast_problems:
        print(f"ok   broadcast-lint ({len(BOUNDED_BROADCASTS)} justified sites)")
    spark = get_spark("plan-audit")
    reg = registry()
    failures = len(bcast_problems)
    # entries whose returned DataFrame is a pinned local result but whose
    # INTERESTING plan is reachable through a probe helper
    from hepop_spark.queries.routing_q import (
        routed_avg_plan_text,
        routed_cntd_plan_text,
        routed_filtered_plan_text,
        routed_having_plan_text,
        routed_minmax_plan_text,
        routed_plan_text,
        routed_or_in_plan_text,
        routed_mixed_or_plan_text,
        routed_having_or_plan_text,
        routed_where_precedence_plan_text,
        routed_cte_plan_text,
        routed_cte_chain_plan_text,
        routed_cte_join_plan_text,
        routed_grouping_sets_plan_text,
        routed_derived_plan_text,
        routed_union_all_plan_text,
        routed_cte_parallel_plan_text,
        routed_derived_join_plan_text,
        routed_timegrid_plan_text,
        routed_timerange_plan_text,
    )

    special_plans = {
        "rollup_routed_aggregate": routed_plan_text,
        "rollup_routed_filtered": routed_filtered_plan_text,
        "rollup_routed_minmax": routed_minmax_plan_text,
        "rollup_routed_avg": routed_avg_plan_text,
        "rollup_routed_timegrid": routed_timegrid_plan_text,
        "rollup_routed_timerange": routed_timerange_plan_text,
        "rollup_routed_count_distinct": routed_cntd_plan_text,
        "rollup_routed_having": routed_having_plan_text,
        "rollup_routed_or_in": routed_or_in_plan_text,
        "rollup_routed_mixed_or": routed_mixed_or_plan_text,
        "rollup_routed_having_or": routed_having_or_plan_text,
        "rollup_routed_where_precedence": routed_where_precedence_plan_text,
        "rollup_routed_cte": routed_cte_plan_text,
        "rollup_routed_cte_chain": routed_cte_chain_plan_text,
        "rollup_routed_cte_join": routed_cte_join_plan_text,
        "rollup_routed_grouping_sets": routed_grouping_sets_plan_text,
        "rollup_routed_derived": routed_derived_plan_text,
        "rollup_routed_union_all": routed_union_all_plan_text,
        "rollup_routed_cte_parallel": routed_cte_parallel_plan_text,
        "rollup_routed_derived_join": routed_derived_join_plan_text,
    }
    for name, flags in AUDITS.items():
        if name in special_plans:
            plan = special_plans[name](spark, sf_dir)
        else:
            plan = explain_str(reg[name].fn(spark, sf_dir))
        problems = audit(name, plan, flags)
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}")
    total = len(AUDITS)
    print(f"\n{total - failures}/{total} plans clean")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
