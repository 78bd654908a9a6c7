"""Physical-plan audit: mechanical checks that the scale story holds.

For each audited query we assert, from `explain("formatted")` output:
  pushdown   — at least one parquet scan has non-empty PushedFilters
               (only for queries that filter on base columns)
  vectorized — every parquet scan reads Batched: true (columnar reader)
  partial    — queries flagged partial must show map-side partial
               aggregation (partial_sum/partial_count/...) before the
               exchange — the agg shrinks the shuffle, not the reverse
  no_py_row  — no BatchEvalPython (row-at-a-time Python UDF) anywhere;
               ArrowEvalPython / FlatMapGroupsInPandas (vectorized) are
               allowed only for queries flagged arrow_ok
  broadcast  — queries flagged bcast must contain a BroadcastHashJoin or
               BroadcastNestedLoopJoin
  (WholeStageCodegen isn't assertable pre-execution under AQE — the
  formatted plan is the initial, pre-codegen one — so JVM-sidedness is
  covered by the no-Python checks instead)

Run: python tools/plan_audit.py [sf_dir]
Exit code 1 if any audit fails — wired for CI-style use.
"""

from __future__ import annotations

import os
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
    "embedding_quantize_int8": {"partial"},
    # UDF surface: grouped pandas agg IS the (allowed) Arrow stage
    "grouped_mad_pandas": {"arrow_ok"},
    # corpus-shaping + similarity additions
    "split_train_val_test": {"partial"},
    "corpus_shuffle_head": set(),  # TakeOrderedAndProject, no global sort
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
    "pareto_frontier": {"partial"},
    "chi_square_independence": {"bcast", "partial", "bnlj_ok"},
    "trend_movers_dod": {"partial"},
    "share_of_total": {"bcast", "partial"},
    "log_template_mine": {"partial"},
    "state_occupancy": {"partial"},
    "slo_burn_rate": {"partial"},
    "negative_sample_pairs": {"bcast", "partial", "bnlj_ok"},
    # ann_recall_eval: the IVF cell assignment is the (allowed) Arrow stage
    "ann_recall_eval": {"arrow_ok", "bcast", "bnlj_ok"},
    "streaming_counter_rate_replay": set(),
    "pattern_3step_funnel": {"partial", "bnlj_ok"},
    "geo_distance_join": {"partial"},
    "cumulative_distinct_users": {"partial"},
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
    "text_zipf_fit": {"partial"},
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
    "ann_ivfpq_topk": {"bcast", "bnlj_ok"},  # bounded 16-row cells/books crossJoins
    # round-3 statistics batch (analytics10.py). bnlj_ok entries join a
    # broadcast 1-ROW aggregate (grand total / scalar marginal) — a scalar
    # BNLJ is constant-cost at any corpus scale, unlike a cartesian.
    "benford_first_digit": {"pushdown", "partial", "bcast", "bnlj_ok"},
    "mutual_information_cells": {"bcast", "partial", "bnlj_ok"},
    "gini_split_eval": {"partial"},
    "calibration_bins": {"partial"},
    "kanonymity_audit": {"bcast", "partial", "bnlj_ok"},
    "entropy_by_column": {"bcast", "partial"},
    "quantile_bins_equidepth": {"partial"},
    "winsorize_clip": {"bcast", "partial"},
    # round-3 LLM batch (llm6.py)
    "pmi_collocations": {"bcast", "partial", "bnlj_ok"},
    "rare_token_oov_rate": {"bcast", "partial"},
    # range search: the only aggregate is the keys-only pair distinct
    # (no partial_* functions in the plan); candidate gen is an equi-join
    "lsh_range_search": set(),
    "feature_hashing_vec": {"pushdown", "partial"},
    "target_encoding_loo": {"bcast", "partial", "bnlj_ok"},
    "tokenizer_bpe_apply": {"partial"},
    "copurchase_jaccard": {"bcast", "partial"},
    "embedding_centroid_dist": {"bcast", "partial"},
    # round-3 model-eval batch (analytics11.py)
    "auc_roc_exact": {"partial"},
    "ks_test_twosample": {"pushdown", "partial", "bnlj_ok"},  # scalar totals join
    "bootstrap_ci_hash": {"pushdown", "partial"},
    # top-k order stats: TakeOrdered window + broadcast scalar, no aggregate
    "tail_index_hill": {"bcast", "bnlj_ok"},  # broadcast 1-row x_k
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
    # round-3 SQL-surface batch (analytics12.py)
    "agg_modern_funcs": {"partial"},
    "hierarchy_rollup_tree": {"partial"},
    "table_checksum": {"partial"},
    "weighted_percentile_disc": {"partial"},
    # round-3 closing batch (analytics13.py)
    "vocab_size_sweep": {"partial", "bcast", "bnlj_ok"},
    "stratified_kfold_assign": {"bcast", "partial"},
    "negative_mining_hard": {"pushdown", "bcast", "bnlj_ok"},
    "sip_dialog_progress": {"pushdown", "partial", "bcast", "bnlj_ok"},
    "cdc_keep_latest": set(),  # pure window rank, no aggregate stage
    # eager iterative/storage entries (LocalRelation results)
    "graph_bfs_distance": set(),
    "snapshot_diff": set(),
    # function-surface batch (functions_ext4.py)
    "agg_bitwise_masks": {"partial"},
    "str_funcs2": set(),
    "interval_arith": {"pushdown"},
    # round-3 analytics trio (analytics15.py)
    # keys-only pair distinct + window rank; no partial_* agg functions
    "asof_join_nearest": {"pushdown"},
    "rolling_corr": {"pushdown", "partial"},
    "percentile_cont_family": {"partial"},
    # type-surface batch (functions_ext5.py)
    "decimal_exact_money": {"partial"},
    "union_by_name_evolution": {"pushdown", "partial"},
    # round-3 batch three (llm7.py / timeseries2.py)
    "keyword_rake_topk": {"bcast", "partial"},
    # keys-only pair distinct (no partial_* funcs), like lsh_range_search
    "knn_graph_build": set(),
    "embedding_sim_histogram": {"partial", "bcast", "bnlj_ok"},
    "downsample_m4": {"partial"},
    "seasonal_residual_stats": {"bcast", "partial"},
    "partition_skew_stats": {"partial", "bcast", "bnlj_ok"},
    "lsh_range_search_collapsed": {"partial"},  # collapse groupBy partials
    "pq_encode_stats": {"partial", "bcast"},
    # data-mixing batch (llm8.py)
    "domain_reweight_step": {"partial", "bcast", "bnlj_ok"},
    "decontaminate_exact_substring": {"pushdown", "partial", "bcast", "bnlj_ok"},
    "token_budget_allocation": {"partial", "bcast", "bnlj_ok"},
    # streaming_m4_replay executes eagerly (replay harness, LocalRelation)
    "streaming_m4_replay": set(),
    "streaming_cdc_latest_replay": set(),
    "streaming_sip_asr_replay": set(),
}


def explain_str(df) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def audit(name: str, plan: str, flags: set[str]) -> list[str]:
    problems: list[str] = []
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
    if "partial" in flags and "partial_" not in plan:
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
    return problems


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit")
    reg = registry()
    failures = 0
    for name, flags in AUDITS.items():
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
