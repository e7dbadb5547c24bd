"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's declared-query registry
(``data_etl_sh_lianjia_spark.plans.registry``): every operator implemented
from SURVEY.md §2 registers exactly one (spark_fn, oracle_sql) pair there,
and this module exposes them to the driver's verify harness.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_etl_sh_lianjia_spark.plans.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    q = all_queries()["q1_scan_agg"]
    return q.spark_fn(spark, "/root/testdata/sf0.001")


# Names the round driver has already hash-checked (union of the r1-r6
# CORRECTNESS samples). The driver verifies the FIRST 50 entries of
# ``queries()`` in order, so entries it has never seen are listed first —
# the full registry stays registered and pytest-swept either way; this only
# converts repo-verified queries into driver-verified ones round by round.
# Update after each round from the new CORRECTNESS_r{N}.json.
_DRIVER_SAMPLED = frozenset({
    # --- round 11 sample (CORRECTNESS_r11.json, 50/50 hash-green; the two
    # net-new r11 registrations are now driver-verified) ---
    "schema_evolution_widening", "txn_commit_serialization",
    # --- round 10 sample (CORRECTNESS_r10.json, 50/50 hash-green; the 11
    # net-new r10 operators are now driver-verified) ---
    "concurrent_dml_serialization", "pinned_cut_roundtrip", "ann_ivfpq_topk",
    "stream_tws_counter", "stream_tws_type_stats", "stream_merge_upsert",
    "multimodal_gif_decode", "multimodal_gif_resize", "gopher_quality_flags",
    "events_sliding_distinct_users", "bigram_interpolated_logprob",
    # --- round 9 sample (CORRECTNESS_r09.json, 50/50 hash-green; the 9
    # net-new r9 operators are now driver-verified) ---
    "quantile_sketch_mergeable", "ewma_user_value", "mad_outlier_stats",
    "bigram_good_turing", "triangle_count", "multimodal_avi_frame_extract",
    "python_datasource_sink", "text_roundtrip", "stream_python_sink",
    # --- round 8 sample (CORRECTNESS_r08.json, 50/50 hash-green — closed
    # the never-sampled backlog; registry fully driver-verified) ---
    "ann_lsh_topk", "ann_pq_topk", "approx_distinct", "binaryfile_scan",
    "boilerplate_ngram_flags", "bpe_pair_stats", "catalog_save_as_table",
    "chunk_embed_topk", "compact_managed_orders", "contamination_ngram",
    "count_min_heavy_hitters", "crawl_reachability", "csv_roundtrip",
    "dataset_mixture", "dataset_split_groups", "delete_where_orders",
    "delete_where_q1_projection", "doc_chunking", "expectations_report_orders",
    "hll_mergeable_sketch", "html_selector_extract", "jsonl_roundtrip",
    "lianjia_zone_summary", "merge_into_customers", "ohlc_downsample",
    "orc_roundtrip", "pack_sequences", "partitioned_write_prune",
    "python_datasource_scan", "quarantine_orders", "schema_evolution_orders",
    "source_cap", "source_config_rotation", "stream_dedup",
    "stream_foreach_batch_sink", "stream_lakehouse_ingest",
    "stream_session_window", "stream_sliding_counts",
    "stream_stateful_counter", "stream_static_join",
    "stream_stream_join", "stream_stream_left_join", "stream_tumbling_counts",
    "table_changes_orders", "time_travel_orders", "update_where_orders",
    "update_where_q1_projection", "url_parse_suite", "vocab_coverage",
    "xml_roundtrip",
    # --- round 7 sample (CORRECTNESS_r07.json, 46 hash-green; the two
    # quality queries re-verify post oracle-cast fix, and the two rows-only
    # ANN queries re-verify now that they carry exact+recall oracles) ---
    "ann_brute_topk", "ann_ivf_topk", "cosine_topk", "cosine_topk_grid",
    "dedup_first_per_key", "embedding_centroids", "embedding_norm_qa",
    "except_all_multiset", "except_distinct", "exists_agg_subquery",
    "in_subquery_bigorders", "intersect_all_multiset", "intersect_distinct",
    "knn_label_agreement", "q2_min_cost_supplier", "q4_order_priority",
    "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "q10_returned_items", "q11_top_value_suppliers",
    "q12_priority_classes", "q13_order_distribution", "q14_promo_revenue",
    "q15_top_supplier_cte", "q16_notin_distinct", "q17_small_qty_revenue",
    "q18_large_orders", "q19_disjunctive_pred", "q20_excess_supply",
    "q21_waiting_supplier", "q22_idle_customers", "resample_gapfill",
    "string_regex", "string_regex_df", "udf_arrow_norms",
    "udf_grouped_demean", "udf_pandas_scalar", "udf_row_registered",
    "udtf_tokenize", "union_discriminator", "window_lag_lead",
    "window_range_interval", "window_rank_family", "window_running",
    # --- round 6 sample (CORRECTNESS_r06.json, 50/50 green) ---
    "compact_small_files", "dedup_repeated_passages", "deterministic_sample",
    "distinct_count", "distinct_count_df", "fk_integrity_audit",
    "fuzzy_match_levenshtein", "heavy_hitters_tokens",
    "hierarchical_rollup_reuse", "histogram_value", "join_anti",
    "join_asof_event", "join_cross", "join_full_outer", "join_left_outer",
    "join_right_outer", "join_semi", "join_theta_band", "json_events",
    "json_events_df", "lateral_join_topn", "merge_upsert_customers",
    "multimodal_bmp_decode", "multimodal_bmp_resize", "multimodal_features",
    "multimodal_features_real", "multimodal_jpeg_decode",
    "multimodal_jpeg_resize", "multimodal_png_decode",
    "multimodal_png_resize", "multimodal_resize", "multimodal_wav_decode",
    "multimodal_waveform_stats", "observed_pipeline_metrics",
    "point_lookup_order", "q1_scan_agg", "q1_scan_agg_df", "q3_join3",
    "q3_join3_df", "q5_join5", "q5_join5_df", "scd2_order_history",
    "sessionize", "sessionize_df", "stratified_sample", "topk_sort",
    "topk_sort_df", "window_rank", "window_rank_df", "zorder_cluster",
    # --- rounds 1-5 union (minus approx_distinct / hll_mergeable_sketch /
    # count_min_heavy_hitters, deliberately re-exposed: their r5 rows were
    # rows-only no_oracle; they now carry exact+bounded-error oracles) ---
    "agg_extras_suite", "agg_skew_two_phase",
    "array_map_suite", "bm25_topk", "cohort_retention", "collect_ordered",
    "correlated_scalar_subquery",
    "counting_suite", "cube_agg", "date_suite", "dedup_canonical_docs",
    "dedup_connected_groups", "dedup_embedding_cosine", "dedup_exact",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_semantic_clusters",
    "dedup_simhash", "doc_fingerprint", "embedding_quantize",
    "events_tumbling_batch", "explode_outer_digits", "funnel_conversion",
    "gapfill_locf", "grouping_sets_agg", "having_filtered_agg",
    "hybrid_search_rrf", "join_skew_salted",
    "json_construct_roundtrip", "lang_id", "map_pivot_labels",
    "marker_substring", "math_suite", "misc_agg_suite",
    "multimodal_blob_stats", "multimodal_frame_sample",
    "null_handling_suite", "pagerank_nation_trade", "paginated_expansion",
    "percentile_stats", "pii_redaction", "pivot_agg", "posexplode_tokens",
    "quality_filter", "recursive_page_walk", "regression_stats",
    "repetition_stats", "rollup_agg", "string_agg_groups", "string_suite",
    "text_stats", "tfidf_top_terms", "token_count_bpe",
    "unigram_surprisal", "unpivot_melt", "variant_json_suite",
})


# With the full registry driver-verified at least once, the window's job
# shifts to RE-verifying queries whose physical plans changed since their
# last driver row (VERDICT r11, next-round item 2). Names here are placed
# right after any never-sampled names, so the driver's first-50 window
# re-hashes exactly the paths the optimization rounds touched: the six
# r11 changed-plan queries that missed the r11 window, every stream_*
# runner (r11's partition-cap change; r12's lakehouse/tws work), and the
# mutation-family queries the r12 round touches. Update per round.
_ROTATE_PRIORITY = (
    # r11 changed-plan queries outside the r11 window (VERDICT item 2)
    "dedup_ngram_jaccard", "dedup_connected_groups", "dedup_canonical_docs",
    "triangle_count", "contamination_ngram", "crawl_reachability",
    # stream runners: r11 bounded-shuffle change; r12 lakehouse/tws work
    "stream_tumbling_counts", "stream_sliding_counts", "stream_session_window",
    "stream_dedup", "stream_static_join", "stream_stateful_counter",
    "stream_stream_join", "stream_stream_left_join", "stream_tws_counter",
    "stream_tws_type_stats", "stream_foreach_batch_sink",
    "stream_lakehouse_ingest", "stream_merge_upsert", "stream_python_sink",
    # mutation family (r12 touches the per-mutation projection maintenance)
    "update_where_orders", "delete_where_orders",
    "update_where_q1_projection", "delete_where_q1_projection",
    "merge_into_customers", "compact_managed_orders", "table_changes_orders",
    "time_travel_orders", "concurrent_dml_serialization",
    "pinned_cut_roundtrip", "txn_commit_serialization",
    # consumers of artifacts whose maintenance r12 touches + r11 rewrites
    "window_rank", "sessionize", "funnel_conversion", "tfidf_top_terms",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_exact",
    "recursive_page_walk", "schema_evolution_widening",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2: never-yet-
    driver-sampled names first (see _DRIVER_SAMPLED), then the round's
    re-verification priorities (_ROTATE_PRIORITY), then the rest."""
    qs = all_queries()
    ordered = [n for n in qs if n not in _DRIVER_SAMPLED]
    seen = set(ordered)
    for n in _ROTATE_PRIORITY:
        if n in qs and n not in seen:
            ordered.append(n)
            seen.add(n)
    ordered += [n for n in qs if n not in seen]
    return {name: qs[name].spark_fn for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; approximate/non-SQL operators are omitted
    (driver records the weaker rows-only check for those)."""
    return {
        name: dq.oracle for name, dq in all_queries().items() if dq.oracle is not None
    }
