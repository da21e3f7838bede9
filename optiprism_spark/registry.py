"""Query registry: named (spark, sf_dir) -> DataFrame callables plus
their DuckDB oracle SQL.

Every implemented operator from SURVEY.md §2 registers here via the
``@query`` decorator; ``__spark_entry__`` re-exports the two dicts for
the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None):
    """Register a query; ``oracle=None`` => non-SQL-expressible op
    (driver records a rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


#: Names the driver's correctness gate actually checked each round
#: (keys of CORRECTNESS_r{N}.json). The gate caps how many entries it
#: checks in dict order, so we lead with the least-recently-checked
#: queries — otherwise the same tail stays unchecked round after round.
#: Update per round from the new CORRECTNESS file.
DRIVER_CHECKED_ROUNDS: dict[int, frozenset[str]] = {
    1: frozenset({
        "api_json_segmentation", "dedup_exact_survivors", "dedup_jaccard_pairs",
        "dedup_lsh_near_pairs", "dedup_minhash_signatures", "dedup_simhash",
        "event_records_search_purchases", "funnel_first_touch_3step",
        "funnel_machine_3step", "funnel_machine_any_order_touch_last",
        "funnel_machine_constants", "funnel_machine_dropoff_step1",
        "funnel_machine_excludes", "funnel_machine_nonunique",
        "funnel_machine_session_mode", "group_records_top_value",
        "ingest_geo_country_counts", "ingest_profile_upsert",
        "ingest_ua_browser_counts", "latest_profile_all", "multimodal_features",
        "property_values_event_type", "property_values_json_like",
        "seg_agg_int_prop", "seg_agg_matrix_per_user", "seg_breakdown_json_prop",
        "seg_chart_pipeline", "seg_count_daily_by_type",
        "seg_count_hourly_purchase", "seg_count_per_user_avg",
        "seg_custom_event", "seg_dau", "seg_dau_by_week", "seg_filter_json_prop",
        "seg_filter_ops", "seg_formula_value_per_event",
        "seg_group_analytics_org", "seg_mau", "seg_mixed_levels",
        "seg_multi_agg_weekly", "seg_multi_event_merge", "seg_percentiles_by_type",
        "seg_sum_per_user_outer", "seg_sum_value_daily_by_type",
        "seg_time_from_minute_buckets", "seg_time_last_n_days",
        "seg_unpivot_compact", "seg_wau", "seg_year_buckets",
        "segment_has_property_value",
    }),
    2: frozenset({
        "dedup_embedding_cosine", "dedup_embedding_cosine_ivf",
        "dedup_embedding_cosine_lsh", "dedup_exact_survivors",
        "dedup_jaccard_pairs", "dedup_lsh_near_pairs", "dedup_minhash_signatures",
        "dedup_simhash", "dict_roundtrip_event_type", "event_record_by_id",
        "event_records_search_purchases", "funnel_first_touch_3step",
        "funnel_machine_3step", "funnel_machine_constants",
        "funnel_machine_dropoff_step1", "funnel_machine_excludes",
        "funnel_machine_nonunique", "group_record_by_id",
        "group_records_top_value", "ingest_geo_country_counts",
        "ingest_profile_upsert", "ingest_ua_browser_counts",
        "multimodal_features", "property_values_event_type", "seg_agg_int_prop",
        "seg_agg_matrix_per_user", "seg_chart_pipeline",
        "seg_count_daily_by_type", "seg_count_hourly_purchase",
        "seg_time_last_n_days", "seg_unpivot_compact",
        "segment_and_composition", "segment_has_property_value",
        "segment_historical_count", "segment_or_composition",
        "segment_relative_count", "session_stats_per_user", "sim_cosine_topk",
        "sim_cosine_topk_lsh", "sql_api_revenue_by_segment",
        "text_lang_distribution", "text_quality_scores", "text_stats_all",
        "wh_order_priority_pipeline", "wh_revenue_by_nation",
        "wh_top_brands_by_region", "win_cumulative", "win_logarithmic",
        "win_period_compare", "win_rolling_avg",
    }),
    3: frozenset({
        "api_json_custom_event", "api_json_funnel", "api_json_group_segmentation",
        "api_json_segmentation", "asm_pack_sequences",
        "asm_sample_fraction_by_lang", "asm_split_train_val_test",
        "asm_stratified_sample_exact", "dedup_decontaminate", "dedup_exact_survivors", "dedup_neardup_clusters",
        "event_records_search_purchases", "funnel_first_touch_3step",
        "funnel_frequency", "funnel_machine_any_order_touch_last",
        "funnel_machine_breakdown", "funnel_machine_session_mode",
        "funnel_steps_chart", "funnel_time_to_convert_dist",
        "ingest_ua_browser_counts", "latest_profile_all", "multimodal_features",
        "property_values_json_like", "seg_breakdown_json_prop",
        "seg_chart_pipeline", "seg_count_daily_by_type",
        "seg_count_daily_segmented", "seg_count_per_user_avg", "seg_custom_event",
        "seg_dau", "seg_dau_by_week", "seg_filter_json_prop", "seg_filter_ops",
        "seg_formula_value_per_event", "seg_group_analytics_org", "seg_mau",
        "seg_mixed_levels", "seg_multi_agg_weekly", "seg_multi_event_merge",
        "seg_percentiles_by_type", "seg_sum_per_user_outer",
        "seg_sum_value_daily_by_type", "seg_time_from_minute_buckets",
        "seg_wau", "seg_year_buckets", "segment_has_property_value",
        "session_begin_daily", "sim_cosine_topk", "sim_cosine_topk_ivf",
        "text_pii_redact",
    }),
    4: frozenset({
        "asm_chunk_documents", "asm_split_train_val_test", "asm_training_pipeline",
        "catalog_materialized_property", "catalog_property_query",
        "dedup_embedding_cosine", "dedup_embedding_cosine_ivf",
        "dedup_embedding_cosine_lsh", "dedup_exact_survivors",
        "dedup_jaccard_pairs", "dedup_lsh_near_pairs", "dedup_minhash_signatures",
        "dedup_simhash", "dict_roundtrip_event_type", "event_record_by_id",
        "funnel_first_touch_3step", "funnel_machine_3step",
        "funnel_machine_constants", "funnel_machine_dropoff_step1",
        "funnel_machine_excludes", "funnel_machine_nonunique", "group_record_by_id",
        "group_records_top_value", "ingest_geo_country_counts",
        "ingest_profile_upsert", "multimodal_decoded_stats",
        "property_values_event_type", "seg_agg_int_prop", "seg_agg_matrix_per_user",
        "seg_count_hourly_purchase", "seg_time_last_n_days", "seg_unpivot_compact",
        "segment_and_composition", "segment_historical_count",
        "segment_or_composition", "segment_relative_count",
        "session_stats_per_user", "sim_cosine_topk_lsh",
        "sql_api_revenue_by_segment", "text_gopher_quality",
        "text_lang_distribution", "text_quality_scores", "text_stats_all",
        "wh_order_priority_pipeline", "wh_revenue_by_nation",
        "wh_top_brands_by_region", "win_cumulative", "win_logarithmic",
        "win_period_compare", "win_rolling_avg",
    }),
    5: frozenset({
        "api_json_custom_event", "api_json_funnel", "api_json_group_segmentation",
        "api_json_segmentation", "asm_pack_sequences",
        "asm_sample_fraction_by_lang", "asm_split_train_val_test",
        "asm_stratified_sample_exact", "dedup_decontaminate",
        "dedup_embedding_cosine_ivf_auto", "dedup_neardup_clusters",
        "dict_persisted_roundtrip", "event_records_search_purchases",
        "funnel_frequency", "funnel_machine_any_order_touch_last",
        "funnel_machine_breakdown", "funnel_machine_session_mode",
        "funnel_steps_chart", "funnel_time_to_convert_dist",
        "ingest_ua_browser_counts", "latest_profile_all", "multimodal_features",
        "property_values_json_like", "seg_breakdown_json_prop",
        "seg_chart_pipeline", "seg_count_daily_by_type",
        "seg_count_daily_segmented", "seg_count_per_user_avg", "seg_custom_event",
        "seg_dau", "seg_dau_by_week", "seg_filter_json_prop", "seg_filter_ops",
        "seg_formula_value_per_event", "seg_group_analytics_org", "seg_mau",
        "seg_mixed_levels", "seg_multi_agg_weekly", "seg_multi_event_merge",
        "seg_percentiles_by_type", "seg_sum_per_user_outer",
        "seg_sum_value_daily_by_type", "seg_time_from_minute_buckets",
        "seg_wau", "seg_year_buckets", "segment_has_property_value",
        "session_begin_daily", "sim_cosine_topk", "sim_cosine_topk_ivf",
        "text_pii_redact",
    }),
    6: frozenset({
        "asm_chunk_documents", "asm_training_pipeline",
        "catalog_materialized_property", "catalog_property_query",
        "dedup_embedding_cosine", "dedup_embedding_cosine_ivf",
        "dedup_embedding_cosine_lsh", "dedup_embedding_incremental_ivf",
        "dedup_exact_survivors", "dedup_jaccard_pairs",
        "dedup_lsh_incremental_pairs", "dedup_lsh_near_pairs",
        "dedup_minhash_signatures", "dict_roundtrip_event_type",
        "event_record_by_id", "funnel_first_touch_3step",
        "funnel_machine_3step", "funnel_machine_dropoff_step1",
        "funnel_machine_excludes", "funnel_machine_nonunique",
        "group_record_by_id", "group_records_top_value",
        "ingest_geo_country_counts", "ingest_profile_upsert",
        "multimodal_decoded_stats", "property_values_event_type",
        "seg_agg_int_prop", "seg_agg_matrix_per_user",
        "seg_count_hourly_purchase", "seg_time_last_n_days",
        "seg_unpivot_compact", "segment_and_composition",
        "segment_historical_count", "segment_or_composition",
        "segment_relative_count", "session_stats_per_user",
        "sim_cosine_topk_lsh", "sql_api_revenue_by_segment",
        "text_bpe_segments", "text_gopher_quality", "text_lang_distribution",
        "text_quality_scores", "text_stats_all", "wh_order_priority_pipeline",
        "wh_revenue_by_nation", "wh_top_brands_by_region", "win_cumulative",
        "win_logarithmic", "win_period_compare", "win_rolling_avg",
    }),
    7: frozenset({
        "alert_purchase_count_daily", "asm_pack_sequences",
        "asm_sample_fraction_by_lang", "asm_split_train_val_test",
        "asm_stratified_sample_exact", "attr_first_touch_revenue",
        "attr_last_touch_revenue", "dedup_decontaminate",
        "dedup_embedding_cosine_lsh_banded", "dedup_neardup_clusters",
        "dedup_simhash", "dict_persisted_roundtrip",
        "eng_active_days_histogram", "eng_stickiness_weekly",
        "est_count_daily_sampled", "est_dau_sampled",
        "est_funnel_3step_sampled", "est_retention_weekly_sampled",
        "est_revenue_weekly_sampled", "event_records_search_purchases",
        "exp_view_to_purchase", "funnel_machine_any_order_touch_last",
        "funnel_machine_constants", "ingest_geo_mmdb_counts",
        "ingest_ua_browser_counts", "latest_profile_all",
        "multimodal_features", "path_backward_to_purchase",
        "path_dropoff_after_view", "path_forward_excl_errors",
        "path_forward_from_signup", "property_values_json_like",
        "retention_daily_view_click", "retention_revenue_weekly",
        "retention_unbounded_weekly", "retention_weekly_signup_purchase",
        "rollup_percentile_value_by_type", "seg_chart_pipeline",
        "seg_count_daily_by_type", "seg_count_daily_segmented",
        "seg_rollup_count_daily", "seg_rollup_mixed_fallback",
        "seg_rollup_routed_weekly", "seg_time_from_minute_buckets",
        "seg_year_buckets", "segment_has_property_value",
        "session_begin_daily", "sim_cosine_topk", "sim_cosine_topk_ivf",
        "text_pii_redact",
    }),
    8: frozenset({
        "api_json_custom_event", "api_json_funnel", "api_json_group_segmentation",
        "api_json_segmentation", "catalog_materialized_property",
        "catalog_property_query", "dedup_embedding_cosine_ivf_auto",
        "dedup_exact_survivors", "dedup_lsh_near_pairs",
        "dedup_minhash_signatures", "funnel_first_touch_3step",
        "funnel_frequency", "funnel_machine_3step", "funnel_machine_breakdown",
        "funnel_machine_nonunique", "funnel_machine_session_mode",
        "funnel_steps_chart", "funnel_time_to_convert_dist",
        "group_records_top_value", "ingest_geo_country_counts",
        "ingest_profile_upsert", "multimodal_decoded_stats",
        "seg_breakdown_json_prop", "seg_count_hourly_purchase",
        "seg_count_per_user_avg", "seg_custom_event", "seg_dau",
        "seg_dau_by_week", "seg_filter_json_prop", "seg_filter_ops",
        "seg_formula_value_per_event", "seg_group_analytics_org", "seg_mau",
        "seg_mixed_levels", "seg_multi_agg_weekly", "seg_multi_event_merge",
        "seg_percentiles_by_type", "seg_sum_per_user_outer",
        "seg_sum_value_daily_by_type", "seg_unpivot_compact", "seg_wau",
        "segment_and_composition", "sim_cosine_topk_lsh",
        "text_lang_distribution", "text_quality_scores", "text_stats_all",
        "wh_revenue_by_nation", "wh_top_brands_by_region", "win_logarithmic",
        "win_rolling_avg",
    }),
    9: frozenset({
        "alert_purchase_count_daily", "asm_chunk_documents",
        "asm_sample_fraction_by_lang", "asm_split_train_val_test",
        "asm_training_pipeline", "attr_first_touch_revenue",
        "attr_last_touch_revenue", "dedup_embedding_cosine",
        "dedup_embedding_cosine_ivf", "dedup_embedding_cosine_lsh",
        "dedup_embedding_incremental_ivf", "dedup_jaccard_pairs",
        "dedup_lsh_incremental_pairs", "dict_roundtrip_event_type",
        "eng_stickiness_weekly", "eng_stickiness_weekly_rollup",
        "est_count_daily_sampled", "event_record_by_id",
        "event_records_search_purchases", "exp_view_to_purchase",
        "funnel_machine_dropoff_step1", "funnel_machine_excludes",
        "group_record_by_id", "ingest_ua_browser_counts",
        "multimodal_features", "path_forward_from_signup",
        "property_values_event_type", "retention_cohort_sizes_rollup",
        "retention_weekly_signup_purchase", "rollup_percentile_value_by_type",
        "seg_agg_int_prop", "seg_agg_matrix_per_user", "seg_chart_pipeline",
        "seg_count_daily_by_type", "seg_rollup_count_daily",
        "seg_rollup_dau_by_week_approx", "seg_rollup_uniques_approx",
        "seg_time_last_n_days", "segment_has_property_value",
        "segment_historical_count", "segment_or_composition",
        "segment_relative_count", "session_stats_per_user", "sim_cosine_topk",
        "sql_api_revenue_by_segment", "text_bpe_segments",
        "text_gopher_quality", "wh_order_priority_pipeline", "win_cumulative",
        "win_period_compare",
    }),
    10: frozenset({
        "asm_pack_sequences", "asm_stratified_sample_exact",
        "catalog_materialized_property", "catalog_property_query",
        "dedup_decontaminate", "dedup_embedding_cosine_lsh_banded",
        "dedup_exact_survivors", "dedup_minhash_signatures",
        "dedup_neardup_clusters", "dedup_simhash",
        "dict_persisted_roundtrip", "eng_active_days_histogram",
        "est_dau_sampled", "est_funnel_3step_sampled",
        "est_retention_weekly_sampled", "est_revenue_weekly_sampled",
        "funnel_first_touch_3step", "funnel_machine_3step",
        "funnel_machine_any_order_touch_last",
        "funnel_machine_constants", "group_records_top_value",
        "ingest_geo_country_counts", "ingest_geo_mmdb_counts",
        "latest_profile_all", "multimodal_decoded_stats",
        "path_backward_to_purchase", "path_dropoff_after_view",
        "path_forward_excl_errors", "property_values_json_like",
        "qsketch_percentile_value_by_type",
        "retention_daily_view_click", "retention_revenue_weekly",
        "retention_unbounded_weekly", "seg_count_daily_segmented",
        "seg_count_hourly_purchase", "seg_rollup_mixed_fallback",
        "seg_rollup_routed_weekly", "seg_time_from_minute_buckets",
        "seg_unpivot_compact", "seg_year_buckets",
        "segment_and_composition", "session_begin_daily",
        "sim_cosine_topk_ivf", "text_pii_redact", "text_quality_scores",
        "text_stats_all", "wh_order_priority_bucketed",
        "wh_revenue_by_nation", "wh_revenue_by_nation_bucketed",
        "win_rolling_avg",
    }),
    11: frozenset({
        "alert_purchase_count_daily", "api_json_custom_event",
        "api_json_funnel", "api_json_group_segmentation",
        "api_json_segmentation", "asm_split_train_val_test",
        "attr_last_touch_revenue", "dedup_embedding_cosine_ivf_auto",
        "dedup_lsh_near_pairs", "drift_profile_value_by_type",
        "drift_psi_event_mix_half_month", "drift_psi_value_half_month",
        "eng_stickiness_weekly", "est_count_daily_sampled",
        "event_records_search_purchases", "exp_view_to_purchase",
        "funnel_frequency", "funnel_machine_breakdown",
        "funnel_machine_nonunique", "funnel_machine_session_mode",
        "funnel_steps_chart", "funnel_time_to_convert_dist",
        "ingest_profile_upsert", "ingest_ua_browser_counts",
        "multimodal_features", "path_forward_from_signup",
        "retention_weekly_signup_purchase", "seg_breakdown_json_prop",
        "seg_chart_pipeline", "seg_count_per_user_avg",
        "seg_custom_event", "seg_dau", "seg_dau_by_week",
        "seg_filter_json_prop", "seg_filter_ops",
        "seg_formula_value_per_event", "seg_group_analytics_org",
        "seg_mau", "seg_mixed_levels", "seg_multi_agg_weekly",
        "seg_multi_event_merge", "seg_percentiles_by_type",
        "seg_rollup_count_daily", "seg_sum_per_user_outer",
        "seg_sum_value_daily_by_type", "seg_wau", "sim_cosine_topk_lsh",
        "text_lang_distribution", "wh_top_brands_by_region",
        "win_logarithmic",
    }),
    12: frozenset({
        "asm_chunk_documents", "asm_mixture_rates", "asm_mixture_sample",
        "asm_mixture_sample_exact", "asm_sample_fraction_by_lang",
        "asm_training_pipeline", "attr_first_touch_revenue",
        "aud_overlap_matrix", "aud_overlap_matrix_topk",
        "aud_scoped_count_daily", "aud_set_and_not",
        "aud_venn_kmv_sketched", "aud_venn_signup_purchase",
        "dedup_cluster_survivors_quality", "dedup_embedding_cosine",
        "dedup_embedding_cosine_ivf", "dedup_embedding_cosine_lsh",
        "dedup_embedding_incremental_ivf", "dedup_jaccard_pairs",
        "dedup_lsh_incremental_pairs", "drift_psi_event_mix_topk",
        "drift_psi_value_fixed_bins", "drift_psi_value_quantile_bins",
        "drift_psi_value_rollup_routed", "eng_stickiness_weekly_rollup",
        "event_record_by_id", "funnel_machine_dropoff_step1",
        "funnel_machine_excludes", "group_record_by_id",
        "property_values_event_type", "retention_cohort_sizes_rollup",
        "rollup_percentile_value_by_type", "seg_agg_int_prop",
        "seg_agg_matrix_per_user", "seg_count_daily_by_type",
        "seg_rollup_dau_by_week_approx", "seg_rollup_uniques_approx",
        "seg_time_last_n_days", "segment_has_property_value",
        "segment_historical_count", "segment_or_composition",
        "segment_relative_count", "session_stats_per_user",
        "sim_cosine_topk", "sql_api_revenue_by_segment",
        "text_bpe_segments", "text_gopher_quality",
        "wh_order_priority_pipeline", "win_cumulative", "win_period_compare",
    }),
}


def suite_round_robin(queries: dict) -> dict:
    """Reorder queries for the driver's capped correctness gate:
    primary key = the round a query was last driver-checked (never →
    0, so it sorts first); tie-break = round-robin position across
    suites so any prefix still covers every operator family."""
    from itertools import zip_longest

    by_suite: dict[str, list[str]] = {}
    for name, fn in queries.items():
        by_suite.setdefault(getattr(fn, "__module__", ""), []).append(name)
    rr_order = [
        n
        for row in zip_longest(*by_suite.values())
        for n in row
        if n is not None
    ]
    last_checked = {
        n: max(
            (rnd for rnd, names in DRIVER_CHECKED_ROUNDS.items() if n in names),
            default=0,
        )
        for n in rr_order
    }
    order = sorted(rr_order, key=lambda n: (last_checked[n], rr_order.index(n)))
    return {n: queries[n] for n in order}


# Suites self-register on import (order = SURVEY §2 section order).
# Extend this list as suites are added — no try/except, a broken suite
# module must fail loudly.
from .suites import (  # noqa: E402,F401
    alerts,
    assembly,
    attribution,
    audience,
    catalog_admin,
    dedup,
    drift,
    engagement,
    estimate,
    experiment,
    funnel,
    ingest,
    multimodal,
    paths,
    quality,
    records,
    reshape,
    retention,
    rollup,
    rollup_hist,
    segmentation,
    segments,
    similarity,
    text,
    warehouse,
    windows,
)
