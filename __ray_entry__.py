"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship span-assembly pipeline at sf0.001 (the
interleaved-document shape from BASELINE.json input_hint).

``queries()`` — one entry per implemented operator family from
SURVEY.md §2 plus the graft's training-data operators. SQL-expressible
ones have a value-exact DuckDB twin in ``oracle_sql()`` (float outputs are
quantized to integer cents/basis-points via FLOOR on BOTH sides so the
comparison is integer-exact; SQL aggregates are CAST to BIGINT so Arrow
types line up). Stateful crawl pipelines and heuristic text ops are
rows-only by nature.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: interleaved span assembly over sf0.001 documents."""
    from container_crawler_ray.pipelines.spans import spanify

    return spanify("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from container_crawler_ray.pipelines import (
        analytics, ann, cluster, crawl_queries, curate, dedup, graph, joins,
        media, spans, text_ops)

    return {
        # aggregations (SURVEY §2.5)
        "docs_per_lang": analytics.docs_per_lang,
        "events_rollup": analytics.events_rollup,
        "q1_pricing": analytics.q1_pricing,
        "user_activity": analytics.user_activity,
        "events_windowed": analytics.events_windowed,
        "events_hopping": analytics.events_hopping,
        # watermark scan + sorts/top-k (SURVEY §2.1 S1, §2.6)
        "events_since_watermark": analytics.events_since_watermark,
        "docs_top_nchars": analytics.docs_top_nchars,
        "events_topk_per_user": analytics.events_topk_per_user,
        # joins (SURVEY §2.4): broadcast-dim, fact-fact co-partition,
        # as-of, anti, range/interval, and filtered top-N multi-join
        "region_revenue": analytics.region_revenue,
        "order_priority_revenue": joins.order_priority_revenue,
        "purchase_click_asof": joins.purchase_click_asof,
        "quiet_customers": joins.quiet_customers,
        "q3_shipping": joins.q3_shipping,
        "part_supplier_revenue": joins.part_supplier_revenue,
        "events_value_bands": analytics.events_value_bands,
        # sessionization, percentiles, rolling windows, distinct counts,
        # deterministic hash sampling
        "user_sessions": analytics.user_sessions,
        "events_percentiles": analytics.events_percentiles,
        "events_median_ci_by_type": analytics.events_median_ci_by_type,
        "events_type_entropy_rate": analytics.events_type_entropy_rate,
        "events_transition_dwell": analytics.events_transition_dwell,
        "events_self_transition_stickiness":
            analytics.events_self_transition_stickiness,
        "customer_seasonal_habit": analytics.customer_seasonal_habit,
        "orders_priority_inversion_audit":
            analytics.orders_priority_inversion_audit,
        "events_channel_conversion_census":
            analytics.events_channel_conversion_census,
        "events_channel_shapley":
            analytics.events_channel_shapley,         # golden oracle
        "customer_winback_census": analytics.customer_winback_census,
        "user_value_rolling": analytics.user_value_rolling,
        "users_per_event_type": analytics.users_per_event_type,
        "users_per_event_type_hll":
            analytics.users_per_event_type_hll,      # golden oracle
        "user_event_pivot": analytics.user_event_pivot,
        "events_grouping_sets": analytics.events_grouping_sets,
        "events_latest_per_key": analytics.events_latest_per_key,
        "users_click_and_purchase": analytics.users_click_and_purchase,
        "users_click_no_purchase": analytics.users_click_no_purchase,
        "docs_per_source_cap": analytics.docs_per_source_cap,
        "doc_repetition": analytics.doc_repetition,
        "tfidf_top_terms": analytics.tfidf_top_terms,
        "redact_terms": analytics.redact_terms,
        "events_funnel": analytics.events_funnel,
        "docs_hash_sample": analytics.docs_hash_sample,
        # window functions (rank / lag), semi-structured extraction,
        # stratified sampling, histogram-sketch quantiles
        "events_ranked": analytics.events_ranked,
        "events_lag_delta": analytics.events_lag_delta,
        "events_props_deciles": analytics.events_props_deciles,
        "events_stratified_sample": analytics.events_stratified_sample,
        "events_value_histogram": analytics.events_value_histogram,
        "q5_region_supplier_volume": joins.q5_region_supplier_volume,
        "big_order_lines_bloom": joins.big_order_lines_bloom,
        "q18_large_orders": joins.q18_large_orders,
        "q17_small_qty_revenue": joins.q17_small_qty_revenue,
        "q14_promo_revenue": joins.q14_promo_revenue,
        "q7_nation_volume": joins.q7_nation_volume,
        "q19_bracket_revenue": joins.q19_bracket_revenue,
        "late_shipment_priority": joins.late_shipment_priority,
        "q22_idle_rich_customers": joins.q22_idle_rich_customers,
        "doc_token_rank": analytics.doc_token_rank,
        "q6_revenue_delta": joins.q6_revenue_delta,
        "q10_returned_revenue": joins.q10_returned_revenue,
        "q13_order_count_distribution": joins.q13_order_count_distribution,
        "q15_top_supplier": joins.q15_top_supplier,
        "q8_market_share": joins.q8_market_share,
        "q9_nation_year_revenue": joins.q9_nation_year_revenue,
        "q2_min_cost_supplier": joins.q2_min_cost_supplier,
        "q4_priority_with_bulk_line": joins.q4_priority_with_bulk_line,
        "q11_important_parts": joins.q11_important_parts,
        "q12_shipmode_priority": joins.q12_shipmode_priority,
        "lineitem_fingerprint": analytics.lineitem_fingerprint,
        "events_hist_quantiles": analytics.events_hist_quantiles,
        "events_voptimal_histogram":
            analytics.events_voptimal_histogram,     # golden oracle
        "events_ntile": analytics.events_ntile,
        "user_active_seconds": analytics.user_active_seconds,
        "user_first_last": analytics.user_first_last,
        "lineitem_regr": analytics.lineitem_regr,
        "events_ohlc": analytics.events_ohlc,
        "user_band_runs": analytics.user_band_runs,
        "docs_chunk_windows": curate.docs_chunk_windows,
        "event_transitions": analytics.event_transitions,
        "embedding_dim_stats": analytics.embedding_dim_stats,
        "events_value_winsorized": analytics.events_value_winsorized,
        "events_chi2_cells": analytics.events_chi2_cells,
        "user_twap": analytics.user_twap,
        "embedding_quantize": ann.embedding_quantize,
        "events_rolling_outliers": analytics.events_rolling_outliers,
        "user_path_freq": analytics.user_path_freq,
        "events_dow_hour_heatmap": analytics.events_dow_hour_heatmap,
        "part_abc": analytics.part_abc,
        "user_daily_locf": analytics.user_daily_locf,
        "order_concentration": analytics.order_concentration,
        "events_quantiles_by_type": analytics.events_quantiles_by_type,
        "customer_order_gap_median":
            analytics.customer_order_gap_median,
        "events_burst_max": analytics.events_burst_max,
        "events_autocorr_lag1": analytics.events_autocorr_lag1,
        "fk_orphan_audit": analytics.fk_orphan_audit,
        "docs_trigram_novelty": dedup.docs_trigram_novelty,
        "part_substitutes": joins.part_substitutes,
        "dau_wau": analytics.dau_wau,
        "user_feature_matrix": analytics.user_feature_matrix,
        "orders_daily_trend": analytics.orders_daily_trend,
        "order_ship_lag_hist": analytics.order_ship_lag_hist,
        "embedding_sim_hist": ann.embedding_sim_hist,
        "lineitem_benford": analytics.lineitem_benford,
        "customer_revenue_inequality":
            analytics.customer_revenue_inequality,
        "orders_priority_drift": analytics.orders_priority_drift,
        "supplier_hhi": analytics.supplier_hhi,
        "click_to_purchase_latency":
            analytics.click_to_purchase_latency,
        "event_type_overlap": analytics.event_type_overlap,
        "events_daily_acf": analytics.events_daily_acf,
        "source_vocab_overlap": curate.source_vocab_overlap,
        "event_transition_probs": analytics.event_transition_probs,
        "events_systematic_sample":
            analytics.events_systematic_sample,
        "user_value_cusum": analytics.user_value_cusum,
        "user_streak_max": analytics.user_streak_max,
        "lineitem_weighted_median": analytics.lineitem_weighted_median,
        "part_triple_support": joins.part_triple_support,
        "orders_open_backlog": joins.orders_open_backlog,
        "order_ship_sync_census": joins.order_ship_sync_census,
        "source_js_divergence_matrix":
            text_ops.source_js_divergence_matrix,
        "source_length_ks_matrix": text_ops.source_length_ks_matrix,
        "lang_given_source_entropy":
            text_ops.lang_given_source_entropy,
        "docs_chunk_straddle_loss":
            text_ops.docs_chunk_straddle_loss,
        "token_position_drift": text_ops.token_position_drift,
        "order_brand_diversity_curve":
            joins.order_brand_diversity_curve,
        "supplier_first_touch_share": joins.supplier_first_touch_share,
        "supplier_backlog_aging": joins.supplier_backlog_aging,
        "docs_entropy_rate_by_source":
            text_ops.docs_entropy_rate_by_source,
        "events_ks_test": analytics.events_ks_test,
        "events_mwu": analytics.events_mwu,
        "key_skew_report": analytics.key_skew_report,
        "events_seasonal_backtest": analytics.events_seasonal_backtest,
        "session_funnel_strict": analytics.session_funnel_strict,
        "part_link_prediction": graph.part_link_prediction,
        "lineitem_cube": analytics.lineitem_cube,
        "user_ab_test": analytics.user_ab_test,
        "user_churn_labels": analytics.user_churn_labels,
        "events_cumulative_users": analytics.events_cumulative_users,
        "orders_pivot_priority": joins.orders_pivot_priority,
        "part_neighbor_jaccard": graph.part_neighbor_jaccard,
        "part_clustering_coeff": graph.part_clustering_coeff,
        "part_assortativity": graph.part_assortativity,
        "purchase_delta": analytics.purchase_delta,
        "region_nation_rollup": joins.region_nation_rollup,
        "events_ttest": analytics.events_ttest,
        "events_trend_forecast": analytics.events_trend_forecast,
        "session_bounce_rate": analytics.session_bounce_rate,
        "source_mixture_weights": curate.source_mixture_weights,
        "events_props_stats": analytics.events_props_stats,
        "events_survival_curve": analytics.events_survival_curve,
        "events_calibration_bins": analytics.events_calibration_bins,
        "orders_dow_effect": joins.orders_dow_effect,
        "user_distinct_kmv": analytics.user_distinct_kmv,
        "events_dedup_burst": analytics.events_dedup_burst,
        "embedding_norm_outliers": analytics.embedding_norm_outliers,
        "order_flag_signature": joins.order_flag_signature,
        "user_growth_accounting": analytics.user_growth_accounting,
        "events_target_encode": analytics.events_target_encode,
        "events_randomization_test": analytics.events_randomization_test,
        "lineitem_zorder_layout": analytics.lineitem_zorder_layout,
        "user_lifetime_km": analytics.user_lifetime_km,
        "lineitem_revenue_bridge": analytics.lineitem_revenue_bridge,
        "events_peak_concurrency": analytics.events_peak_concurrency,
        "docs_kfold_assign": curate.docs_kfold_assign,
        "part_price_index": analytics.part_price_index,
        "lineitem_pchart": analytics.lineitem_pchart,
        "cohort_ltv_curve": analytics.cohort_ltv_curve,
        "events_drift_tv": analytics.events_drift_tv,
        "lineitem_ols2": analytics.lineitem_ols2,
        "session_step_transitions": analytics.session_step_transitions,
        "events_quiet_windows": analytics.events_quiet_windows,
        "docs_boilerplate_prefix": curate.docs_boilerplate_prefix,
        "events_interarrival_fano": analytics.events_interarrival_fano,
        "embedding_label_centroids": analytics.embedding_label_centroids,
        "lineitem_price_surface": analytics.lineitem_price_surface,
        "nation_trade_balance": joins.nation_trade_balance,
        "user_retention_triangle": analytics.user_retention_triangle,
        "customer_balance_deciles": joins.customer_balance_deciles,
        "docs_source_simpson": curate.docs_source_simpson,
        "docs_punct_profile": curate.docs_punct_profile,
        "embedding_label_margin": analytics.embedding_label_margin,
        "part_price_ols_by_brand": analytics.part_price_ols_by_brand,
        "session_length_hist": analytics.session_length_hist,
        "returns_by_ship_lag": joins.returns_by_ship_lag,
        "days_to_first_purchase": analytics.days_to_first_purchase,
        "user_activity_hist": analytics.user_activity_hist,
        "order_line_count_hist": analytics.order_line_count_hist,
        "media_phash_bands": media.media_phash_bands,
        "orders_changepoint_scan": analytics.orders_changepoint_scan,
        "customer_snm_pairs": analytics.customer_snm_pairs,
        "part_abc_xyz": analytics.part_abc_xyz,
        "user_burstiness_bands": analytics.user_burstiness_bands,
        "lineitem_margin_waterfall": analytics.lineitem_margin_waterfall,
        "user_type_diversity_hist": analytics.user_type_diversity_hist,
        "orders_monthly_zchart": analytics.orders_monthly_zchart,
        "docs_token_len_profile": curate.docs_token_len_profile,
        "events_type_share_series": analytics.events_type_share_series,
        "brand_type_lift": analytics.brand_type_lift,
        "orders_updown_runs": analytics.orders_updown_runs,
        "events_lateness_hist": analytics.events_lateness_hist,
        "sample_error_audit": analytics.sample_error_audit,
        "lineitem_spearman": analytics.lineitem_spearman,
        "events_diurnal_concentration":
            analytics.events_diurnal_concentration,
        "trigram_spectrum": text_ops.trigram_spectrum,
        "order_total_reconciliation": joins.order_total_reconciliation,
        "session_threshold_sensitivity":
            analytics.session_threshold_sensitivity,
        "events_type_xcorr": analytics.events_type_xcorr,
        "user_lifecycle_census": analytics.user_lifecycle_census,
        "events_kanon_audit": analytics.events_kanon_audit,
        "quantile_sketch_error": analytics.quantile_sketch_error,
        "purchase_latency_slo": analytics.purchase_latency_slo,
        "source_yield_funnel": curate.source_yield_funnel,
        "orders_rescaled_range": analytics.orders_rescaled_range,
        "orders_theil_sen": analytics.orders_theil_sen,
        "user_part_negatives": joins.user_part_negatives,
        "events_cuped_adjust": analytics.events_cuped_adjust,
        "orders_seasonal_strength": analytics.orders_seasonal_strength,
        "customer_order_class_migration":
            analytics.customer_order_class_migration,
        "part_supplier_redundancy": joins.part_supplier_redundancy,
        "orders_month_end_effect": analytics.orders_month_end_effect,
        "session_entry_conversion": analytics.session_entry_conversion,
        "source_hapax_ratio": curate.source_hapax_ratio,
        "vocab_richness_chao1": curate.vocab_richness_chao1,
        "tombstone_impact_audit": analytics.tombstone_impact_audit,
        "catalog_profile": analytics.catalog_profile,
        "events_gap_memory": analytics.events_gap_memory,
        "user_minute_burst_flags": analytics.user_minute_burst_flags,
        "repeat_purchase_gaps": joins.repeat_purchase_gaps,
        "ngram_containment_pairs": dedup.ngram_containment_pairs,
        "events_round_number_bias": analytics.events_round_number_bias,
        "user_tenure_value_curve": analytics.user_tenure_value_curve,
        "embedding_triplet_audit": ann.embedding_triplet_audit,
        "ship_lag_quantiles_by_priority":
            joins.ship_lag_quantiles_by_priority,
        "bloom_fpr_audit": analytics.bloom_fpr_audit,
        "part_price_dispersion": analytics.part_price_dispersion,
        "line_dedup_rate": curate.line_dedup_rate,
        "first_order_ltv_corr": joins.first_order_ltv_corr,
        "hte_by_decile": analytics.hte_by_decile,
        "part_stock_clamp": analytics.part_stock_clamp,
        "score_auc_audit": analytics.score_auc_audit,
        "vocab_growth_curve": curate.vocab_growth_curve,
        "minhash_error_audit": dedup.minhash_error_audit,
        "blocking_key_audit": analytics.blocking_key_audit,
        "ldiversity_audit": analytics.ldiversity_audit,
        "fdr_bh_audit": analytics.fdr_bh_audit,
        "discount_emd_by_year": analytics.discount_emd_by_year,
        "fd_violation_audit": analytics.fd_violation_audit,
        "user_decayed_value": analytics.user_decayed_value,
        "part_name_collision_audit": analytics.part_name_collision_audit,
        "supplier_return_wilson": analytics.supplier_return_wilson,
        "docs_readability": curate.docs_readability,
        "priority_transition_matrix":
            analytics.priority_transition_matrix,
        "boilerplate_overlap_matrix": curate.boilerplate_overlap_matrix,
        "token_coverage_curve": curate.token_coverage_curve,
        "kmv_set_ops_audit": analytics.kmv_set_ops_audit,
        "dedup_threshold_pr": dedup.dedup_threshold_pr,
        "simpson_paradox_audit": analytics.simpson_paradox_audit,
        "zipf_slope_audit": curate.zipf_slope_audit,
        "embedding_isotropy_audit": analytics.embedding_isotropy_audit,
        "kfold_balance_audit": curate.kfold_balance_audit,
        "tcloseness_audit": analytics.tcloseness_audit,
        "ab_power_mde": analytics.ab_power_mde,
        "token_burstiness": curate.token_burstiness,
        "fold_leakage_audit": dedup.fold_leakage_audit,
        "poisson_bootstrap_ci": analytics.poisson_bootstrap_ci,
        "survivorship_bias_audit": analytics.survivorship_bias_audit,
        "f2_ams_audit": analytics.f2_ams_audit,
        "frequency_cap_audit": analytics.frequency_cap_audit,
        "cms_width_sweep": curate.cms_width_sweep,
        "ratio_delta_method": analytics.ratio_delta_method,
        "churn_rule_confusion": analytics.churn_rule_confusion,
        "hdr_quantile_audit": analytics.hdr_quantile_audit,
        "ab_srm_check": analytics.ab_srm_check,
        "mta_linear_credit": analytics.mta_linear_credit,
        "mta_position_credit": analytics.mta_position_credit,
        "jackknife_mean_se": analytics.jackknife_mean_se,
        "randomized_response_audit": analytics.randomized_response_audit,
        "orders_max_drawdown": analytics.orders_max_drawdown,
        "orders_mann_kendall": analytics.orders_mann_kendall,
        "orders_kendall_tau": analytics.orders_kendall_tau,
        "events_turning_points": analytics.events_turning_points,
        "part_brand_type_cramer": analytics.part_brand_type_cramer,
        "orders_dow_anova": analytics.orders_dow_anova,
        "lineitem_quantity_ks_uniform":
            analytics.lineitem_quantity_ks_uniform,
        "customer_segment_kruskal": analytics.customer_segment_kruskal,
        "supplier_grubbs_extremes": analytics.supplier_grubbs_extremes,
        "nation_segment_stdres": analytics.nation_segment_stdres,
        "part_price_tukey_fences": analytics.part_price_tukey_fences,
        "orders_runs_median": analytics.orders_runs_median,
        "orders_friedman_dow": analytics.orders_friedman_dow,
        "orders_variance_ratio": analytics.orders_variance_ratio,
        "lineitem_cohen_kappa": analytics.lineitem_cohen_kappa,
        "events_mcnemar_halves": analytics.events_mcnemar_halves,
        "part_price_skew_kurtosis": analytics.part_price_skew_kurtosis,
        "lineitem_partial_corr": analytics.lineitem_partial_corr,
        "lineitem_blomqvist_beta": analytics.lineitem_blomqvist_beta,
        "event_transition_drift": analytics.event_transition_drift,
        "lineitem_gamma_gk": analytics.lineitem_gamma_gk,
        "orders_wilcoxon_weekend": analytics.orders_wilcoxon_weekend,
        "orders_revenue_milestones": analytics.orders_revenue_milestones,
        "lineitem_position_profile": analytics.lineitem_position_profile,
        "lineitem_dose_response": analytics.lineitem_dose_response,
        "events_daily_record_census":
            analytics.events_daily_record_census,
        "customer_cvm_segments": analytics.customer_cvm_segments,
        "events_ljung_box": analytics.events_ljung_box,
        "nation_flow_stdres": joins.nation_flow_stdres,
        "events_brown_forsythe": analytics.events_brown_forsythe,
        "media_phash_near_pairs": media.media_phash_near_pairs,
        "lineitem_tail_dependence": analytics.lineitem_tail_dependence,
        "events_rayleigh_hour": analytics.events_rayleigh_hour,
        "events_hour_resultant_by_type":
            analytics.events_hour_resultant_by_type,
        "embedding_hubness_audit": ann.embedding_hubness_audit,
        "hash_partition_balance": analytics.hash_partition_balance,
        "simhash_bit_bias_audit": dedup.simhash_bit_bias_audit,
        "token_head_tail_ladder": text_ops.token_head_tail_ladder,
        "part_rich_club": graph.part_rich_club,
        "events_inspection_paradox": analytics.events_inspection_paradox,
        "orders_var_es": analytics.orders_var_es,
        "nation_revenue_shift_share":
            analytics.nation_revenue_shift_share,
        "part_brand_hhi_decomposition":
            analytics.part_brand_hhi_decomposition,
        "customer_topk_stability": analytics.customer_topk_stability,
        "orders_gain_loss_asymmetry":
            analytics.orders_gain_loss_asymmetry,
        "lineitem_arc_elasticity": analytics.lineitem_arc_elasticity,
        "lang_token_simpson": analytics.lang_token_simpson,
        "orders_regression_to_mean":
            analytics.orders_regression_to_mean,
        "lineitem_did_discount": analytics.lineitem_did_discount,
        "events_two_way_anova": analytics.events_two_way_anova,
        "lineitem_capability_index": analytics.lineitem_capability_index,
        "orders_theil_u2": analytics.orders_theil_u2,
        "orders_chow_break": analytics.orders_chow_break,
        "keyspace_contiguity_audit":
            analytics.keyspace_contiguity_audit,
        "vocab_oov_transfer": text_ops.vocab_oov_transfer,
        "media_frame_coverage": media.media_frame_coverage,
        "embedding_knn_loo_accuracy": ann.embedding_knn_loo_accuracy,
        "orders_weekly_periodogram":
            analytics.orders_weekly_periodogram,
        "events_cochran_q": analytics.events_cochran_q,
        "lineitem_hilbert_locality":
            analytics.lineitem_hilbert_locality,
        "orders_pettitt_test": analytics.orders_pettitt_test,
        "events_bowker_symmetry": analytics.events_bowker_symmetry,
        "part_graph_modularity": graph.part_graph_modularity,
        "events_permutation_entropy":
            analytics.events_permutation_entropy,
        "orders_newey_west": analytics.orders_newey_west,
        "lineitem_discount_rdd": analytics.lineitem_discount_rdd,
        "events_allan_variance": analytics.events_allan_variance,
        "lineitem_zonemap_pruning":
            analytics.lineitem_zonemap_pruning,
        "events_sax_motifs": analytics.events_sax_motifs,
        "docs_menzerath": curate.docs_menzerath,
        "docs_rouge_pairs": dedup.docs_rouge_pairs,
        "lineitem_bucket_semijoin_audit":
            analytics.lineitem_bucket_semijoin_audit,
        "events_recurrence_quantification":
            analytics.events_recurrence_quantification,
        "orders_bullwhip_ratio": analytics.orders_bullwhip_ratio,
        "user_split_half_reliability":
            analytics.user_split_half_reliability,
        "part_knapsack_greedy": joins.part_knapsack_greedy,
        "events_peak_over_threshold":
            analytics.events_peak_over_threshold,
        "embedding_centroid_drift": analytics.embedding_centroid_drift,
        "orders_epoch_folding": analytics.orders_epoch_folding,
        "part_degree_ccdf": graph.part_degree_ccdf,
        "part_demand_quadrants": analytics.part_demand_quadrants,
        "customer_lorenz_asymmetry":
            analytics.customer_lorenz_asymmetry,
        "customer_order_overdispersion":
            analytics.customer_order_overdispersion,
        "nation_segment_rca": analytics.nation_segment_rca,
        "media_scene_changes": media.media_scene_changes,
        "part_price_stickiness": analytics.part_price_stickiness,
        "embedding_kmeans_elbow": analytics.embedding_kmeans_elbow,
        "trade_home_bias": joins.trade_home_bias,
        "part_walk_centrality": graph.part_walk_centrality,
        "orders_quarterly_gini": analytics.orders_quarterly_gini,
        "part_price_nested_anova": analytics.part_price_nested_anova,
        "docs_nchars_consistency": curate.docs_nchars_consistency,
        "events_markov_order_test": analytics.events_markov_order_test,
        "events_neyman_allocation": analytics.events_neyman_allocation,
        "docs_winnowing_density": dedup.docs_winnowing_density,
        "embedding_thin_shell": analytics.embedding_thin_shell,
        "nation_ship_lag_median": joins.nation_ship_lag_median,
        "orders_seasonal_mann_kendall":
            analytics.orders_seasonal_mann_kendall,
        "part_abc_migration": analytics.part_abc_migration,
        "events_type_user_gini": analytics.events_type_user_gini,
        "supplier_type_coverage": joins.supplier_type_coverage,
        "part_supply_resilience": joins.part_supply_resilience,
        "part_name_price_premium": analytics.part_name_price_premium,
        "events_next_value_by_type":
            analytics.events_next_value_by_type,
        "lineitem_status_stump": analytics.lineitem_status_stump,
        "order_supplier_spread": analytics.order_supplier_spread,
        "lineitem_moods_median": analytics.lineitem_moods_median,
        "join_size_estimator_audit":
            analytics.join_size_estimator_audit,
        "embedding_knn_reciprocity": ann.embedding_knn_reciprocity,
        "customer_brand_loyalty": joins.customer_brand_loyalty,
        "supplier_cr_ratios": analytics.supplier_cr_ratios,
        "events_group_sequential": analytics.events_group_sequential,
        "lineitem_ansari_bradley": analytics.lineitem_ansari_bradley,
        "user_dow_habit": analytics.user_dow_habit,
        "dedup_cross_source_census": dedup.dedup_cross_source_census,
        "customer_value_trend_census":
            analytics.customer_value_trend_census,
        "brand_mix_drift_series": analytics.brand_mix_drift_series,
        "events_dwell_runs": analytics.events_dwell_runs,
        "events_conformal_coverage":
            analytics.events_conformal_coverage,
        "lineitem_cluster_deff": analytics.lineitem_cluster_deff,
        "embedding_norm2_anova": analytics.embedding_norm2_anova,
        "orders_weekend_ks_dominance":
            analytics.orders_weekend_ks_dominance,
        "user_early_signal_corr": analytics.user_early_signal_corr,
        "orders_pacf2": analytics.orders_pacf2,
        "lineitem_return_trend_ca": analytics.lineitem_return_trend_ca,
        "media_aspect_census": media.media_aspect_census,
        "lineitem_tax_regressivity":
            analytics.lineitem_tax_regressivity,
        "embedding_exact_dup_census":
            dedup.embedding_exact_dup_census,
        "lang_source_lift": curate.lang_source_lift,
        "lineitem_discount_moy": analytics.lineitem_discount_moy,
        "events_daily_basket_lift": analytics.events_daily_basket_lift,
        "lineitem_benford2": analytics.lineitem_benford2,
        "events_hour_drift": analytics.events_hour_drift,
        "user_pareto_8020": analytics.user_pareto_8020,
        "brand_type_coverage": analytics.brand_type_coverage,
        "part_price_points": analytics.part_price_points,
        "user_decile_migration": analytics.user_decile_migration,
        "events_weekend_mix_shift":
            analytics.events_weekend_mix_shift,
        "brand_edge_affinity": graph.brand_edge_affinity,
        "user_night_owl_census": analytics.user_night_owl_census,
        "embedding_knn_confusion": ann.embedding_knn_confusion,
        "orders_status_year_mix": analytics.orders_status_year_mix,
        "orders_size_slope": joins.orders_size_slope,
        "brand_return_stdres": analytics.brand_return_stdres,
        "order_line_concentration": analytics.order_line_concentration,
        "whale_geography": analytics.whale_geography,
        "supplier_brand_specialization":
            analytics.supplier_brand_specialization,
        "orders_yearly_customer_hhi":
            analytics.orders_yearly_customer_hhi,
        "customer_balance_revenue_corr":
            analytics.customer_balance_revenue_corr,
        "part_type_size_price_census":
            analytics.part_type_size_price_census,
        "events_type_dow_peak": analytics.events_type_dow_peak,
        "orders_new_repeat_split": analytics.orders_new_repeat_split,
        "vocab_gini": curate.vocab_gini,
        "docs_length_anova_by_source":
            curate.docs_length_anova_by_source,
        "orders_value_cv_by_priority":
            analytics.orders_value_cv_by_priority,
        "supplier_credit_hold_census":
            analytics.supplier_credit_hold_census,
        "events_minute_heaping": analytics.events_minute_heaping,
        "brand_price_overlap": analytics.brand_price_overlap,
        "docs_ttr_bands": curate.docs_ttr_bands,
        "orders_priority_by_value_decile":
            analytics.orders_priority_by_value_decile,
        "region_share_shift": joins.region_share_shift,
        "events_zero_value_census":
            analytics.events_zero_value_census,
        "nation_market_depth": analytics.nation_market_depth,
        "brand_no_promo_census": analytics.brand_no_promo_census,
        "entity_name_id_audit": analytics.entity_name_id_audit,
        "part_price_endings": analytics.part_price_endings,
        "user_coverage_census": analytics.user_coverage_census,
        "part_size_uniformity": analytics.part_size_uniformity,
        "docs_length_quantiles_by_source":
            curate.docs_length_quantiles_by_source,
        "lineitem_zero_zero_lift": analytics.lineitem_zero_zero_lift,
        "customer_priority_stickiness":
            analytics.customer_priority_stickiness,
        "lineitem_discount_tax_independence":
            analytics.lineitem_discount_tax_independence,
        "nation_balance_sheet": analytics.nation_balance_sheet,
        "supplier_part_repeat_census":
            analytics.supplier_part_repeat_census,
        "user_journey_endpoints": analytics.user_journey_endpoints,
        "part_name_word_census": analytics.part_name_word_census,
        "order_linenumber_contiguity":
            analytics.order_linenumber_contiguity,
        "supplier_activity_balance_gamma":
            analytics.supplier_activity_balance_gamma,
        "customer_urgency_drift": analytics.customer_urgency_drift,
        "part_size_price_gamma": analytics.part_size_price_gamma,
        "segment_priority_mix": analytics.segment_priority_mix,
        "lineitem_net_multiplier_census":
            analytics.lineitem_net_multiplier_census,
        "embedding_dim_sign_balance":
            analytics.embedding_dim_sign_balance,
        "nation_supplier_activity_hhi":
            analytics.nation_supplier_activity_hhi,
        "order_ship_span_census": analytics.order_ship_span_census,
        "embedding_label_doc_mix":
            analytics.embedding_label_doc_mix,
        "embedding_coverage_by_source":
            analytics.embedding_coverage_by_source,
        "part_competition_price_spread":
            analytics.part_competition_price_spread,
        "lineitem_price_divisibility_audit":
            analytics.lineitem_price_divisibility_audit,
        "customer_same_day_orders":
            analytics.customer_same_day_orders,
        "user_weekend_value_census":
            analytics.user_weekend_value_census,
        "embedding_norm_vs_doclen":
            analytics.embedding_norm_vs_doclen,
        "nation_price_premium": analytics.nation_price_premium,
        "returns_by_quantity_band":
            analytics.returns_by_quantity_band,
        "order_size_discount_curve":
            analytics.order_size_discount_curve,
        "supplier_month_coverage":
            analytics.supplier_month_coverage,
        "user_day_opening_type": analytics.user_day_opening_type,
        "part_assortment_churn": analytics.part_assortment_churn,
        "customer_activity_balance_gamma":
            analytics.customer_activity_balance_gamma,
        "user_daily_intensity_census":
            analytics.user_daily_intensity_census,
        "customer_order_momentum":
            analytics.customer_order_momentum,
        "revenue_inequality_decomposition":
            analytics.revenue_inequality_decomposition,
        "event_type_launch_profile":
            analytics.event_type_launch_profile,
        "linestatus_boundary_audit":
            analytics.linestatus_boundary_audit,
        "ship_before_order_audit":
            analytics.ship_before_order_audit,
        "ship_dow_profile": analytics.ship_dow_profile,
        "event_type_intraday_cadence":
            analytics.event_type_intraday_cadence,
        "status_priority_mix": analytics.status_priority_mix,
        "tax_uniformity_by_nation":
            analytics.tax_uniformity_by_nation,
        "event_id_day_monotonicity":
            analytics.event_id_day_monotonicity,
        "segment_one_and_done": analytics.segment_one_and_done,
        "user_spend_maturation": analytics.user_spend_maturation,
        "part_three_way_independence":
            analytics.part_three_way_independence,
        "user_error_exposure": analytics.user_error_exposure,
        "customer_value_gap_interaction":
            analytics.customer_value_gap_interaction,
        "events_daily_load_factor":
            analytics.events_daily_load_factor,
        "type_brand_dominance": analytics.type_brand_dominance,
        "user_day_type_breadth": analytics.user_day_type_breadth,
        "catalog_vs_street_price":
            analytics.catalog_vs_street_price,
        "events_value_tail_share":
            analytics.events_value_tail_share,
        "price_leadership_topk": analytics.price_leadership_topk,
        "user_first_day_value_share":
            analytics.user_first_day_value_share,
        "order_discount_consistency":
            analytics.order_discount_consistency,
        "embedding_dim_range": analytics.embedding_dim_range,
        "part_name_pair_affinity":
            analytics.part_name_pair_affinity,
        "events_value_mode_census":
            analytics.events_value_mode_census,
        "weekend_priority_shift":
            analytics.weekend_priority_shift,
        "user_activity_fingerprint_dups":
            analytics.user_activity_fingerprint_dups,
        "nation_part_coverage": analytics.nation_part_coverage,
        "basket_width_trend": analytics.basket_width_trend,
        "premium_return_interaction":
            analytics.premium_return_interaction,
        "basket_width_ship_span":
            analytics.basket_width_ship_span,
        "returns_by_ship_dow": analytics.returns_by_ship_dow,
        "unit_price_by_quantity":
            analytics.unit_price_by_quantity,
        "source_token_budget": analytics.source_token_budget,
        "type_arpu": analytics.type_arpu,
        "dead_stock_census": analytics.dead_stock_census,
        "user_resurrection_census":
            analytics.user_resurrection_census,
        "type_value_drift": analytics.type_value_drift,
        "first_vs_repeat_priority":
            analytics.first_vs_repeat_priority,
        "supplier_lead_time_laggards":
            analytics.supplier_lead_time_laggards,
        "revenue_by_hour": analytics.revenue_by_hour,
        "type_precedence_matrix":
            analytics.type_precedence_matrix,
        "source_mix_drift": analytics.source_mix_drift,
        "order_value_dup_audit": analytics.order_value_dup_audit,
        "embedding_norm_drift": analytics.embedding_norm_drift,
        "vocab_core_census": analytics.vocab_core_census,
        "type_adoption_rank": analytics.type_adoption_rank,
        "orders_status_boundary_audit":
            analytics.orders_status_boundary_audit,
        "supplier_focus_census":
            analytics.supplier_focus_census,
        "ts_collision_audit": analytics.ts_collision_audit,
        "value_band_type_mix": analytics.value_band_type_mix,
        "order_return_severity": analytics.order_return_severity,
        "source_word_len_profile":
            analytics.source_word_len_profile,
        "dau_volatility": analytics.dau_volatility,
        "debtor_activity_audit":
            analytics.debtor_activity_audit,
        "nation_hhi_trend": analytics.nation_hhi_trend,
        "dow_depth_profile": analytics.dow_depth_profile,
        "streak_value_interaction":
            analytics.streak_value_interaction,
        "ship_daily_load": analytics.ship_daily_load,
        "priority_width_interaction":
            analytics.priority_width_interaction,
        "quantity_integrality_audit":
            analytics.quantity_integrality_audit,
        "brand_revenue_volatility":
            analytics.brand_revenue_volatility,
        "tenure_breadth_curve": analytics.tenure_breadth_curve,
        "street_to_list_census": analytics.street_to_list_census,
        "breadth_value_interaction":
            analytics.breadth_value_interaction,
        "order_value_drift": analytics.order_value_drift,
        "core_customer_census": analytics.core_customer_census,
        "nation_balance_revenue_mismatch":
            analytics.nation_balance_revenue_mismatch,
        "depth_value_curve": analytics.depth_value_curve,
        "part_price_direction_census":
            analytics.part_price_direction_census,
        "habit_mass_census": analytics.habit_mass_census,
        "type_reach_drift": analytics.type_reach_drift,
        "supplier_balance_leadtime":
            analytics.supplier_balance_leadtime,
        "segment_share_drift": analytics.segment_share_drift,
        "brand_promo_spend": analytics.brand_promo_spend,
        "doc_length_drift": analytics.doc_length_drift,
        "return_status_contract_audit":
            analytics.return_status_contract_audit,
        "returns_by_size": analytics.returns_by_size,
        "top_token_drift": analytics.top_token_drift,
        "top_token_drift_sketch": analytics.top_token_drift_sketch,
        "return_rate_drift": analytics.return_rate_drift,
        "entry_type_value": analytics.entry_type_value,
        "nation_one_and_done": analytics.nation_one_and_done,
        "assortment_grid_fill": analytics.assortment_grid_fill,
        "top_supplier_share_drift":
            analytics.top_supplier_share_drift,
        "supplier_churn_census":
            analytics.supplier_churn_census,
        "customer_churn_census":
            analytics.customer_churn_census,
        "source_ttr_profile": analytics.source_ttr_profile,
        "churned_value_share": analytics.churned_value_share,
        "discount_mix_drift": analytics.discount_mix_drift,
        "signup_dow_profile": analytics.signup_dow_profile,
        "segment_churn_census": analytics.segment_churn_census,
        "entry_type_retention": analytics.entry_type_retention,
        "quarter_end_loading": analytics.quarter_end_loading,
        "nation_churn_census": analytics.nation_churn_census,
        "part_velocity_census": analytics.part_velocity_census,
        "repeat_revenue_share": analytics.repeat_revenue_share,
        "lang_length_profile": analytics.lang_length_profile,
        "dead_stock_value": analytics.dead_stock_value,
        "user_activity_gini": analytics.user_activity_gini,
        "nation_lead_time": analytics.nation_lead_time,
        "order_size_gap_effect": analytics.order_size_gap_effect,
        "corpus_grid_fill": analytics.corpus_grid_fill,
        "weekend_order_penalty":
            analytics.weekend_order_penalty,
        "lineitem_energy_distance":
            analytics.lineitem_energy_distance,
        "q6_sensitivity_grid": joins.q6_sensitivity_grid,
        "purchase_attribution": joins.purchase_attribution,
        "q16_supplier_breadth": joins.q16_supplier_breadth,
        "q20_dominant_suppliers": joins.q20_dominant_suppliers,
        "q21_blocking_suppliers": joins.q21_blocking_suppliers,
        "events_rollup_incremental": analytics.events_rollup_incremental,
        "lineitem_unpivot": analytics.lineitem_unpivot,
        "gopher_quality_flags": text_ops.gopher_quality_flags,
        "lm_bigram_scores": text_ops.lm_bigram_scores,    # golden oracle
        "kmeans_clusters": cluster.kmeans_clusters,       # golden oracle
        "semantic_dedup": cluster.semantic_dedup,         # golden oracle
        "user_value_time_window": analytics.user_value_time_window,
        "doc_posting_hashes": analytics.doc_posting_hashes,
        "bm25_scores": text_ops.bm25_scores,              # golden oracle
        "events_value_zscore": analytics.events_value_zscore,
        "user_value_running_total": analytics.user_value_running_total,
        "user_top_event_type": analytics.user_top_event_type,
        "crm_spend_reconciliation": joins.crm_spend_reconciliation,
        "strip_dup_windows": dedup.strip_dup_windows,     # golden oracle
        "part_components": graph.part_components,         # golden oracle
        "events_weighted_sample": analytics.events_weighted_sample,  # golden
        "docs_compression_ratio": text_ops.docs_compression_ratio,   # golden
        "orders_monthly_growth": joins.orders_monthly_growth,
        "customer_rfm": joins.customer_rfm,
        "events_entropy_per_user": analytics.events_entropy_per_user,  # golden
        "returnflag_revenue_salted": analytics.returnflag_revenue_salted,
        "events_daily_gapfill": analytics.events_daily_gapfill,
        "part_skyline": analytics.part_skyline,
        "heavy_hitter_trigrams": text_ops.heavy_hitter_trigrams,
        "part_bfs_hops": graph.part_bfs_hops,
        "bpe_merges": text_ops.bpe_merges,                # golden oracle
        "orders_retention_cohort": joins.orders_retention_cohort,
        "lineitem_profile": analytics.lineitem_profile,
        "part_pair_support": joins.part_pair_support,
        "customer_part_jaccard": joins.customer_part_jaccard,
        "pmi_bigrams": text_ops.pmi_bigrams,
        "events_mad_outliers": analytics.events_mad_outliers,
        "events_moving_sum": analytics.events_moving_sum,
        "events_value_ewma": analytics.events_value_ewma,  # golden oracle
        "events_percentile_rank": analytics.events_percentile_rank,
        "lineitem_corr": analytics.lineitem_corr,
        "supplier_top_parts": analytics.supplier_top_parts,
        "events_nearby_count": analytics.events_nearby_count,
        "part_kcore": graph.part_kcore,                   # golden oracle
        "name_edit_near_pairs": dedup.name_edit_near_pairs,
        "triangle_count_parts": graph.triangle_count_parts,
        # dedup family (graft training-data ops)
        "dedup_exact": analytics.dedup_exact,
        "dedup_keep_best": analytics.dedup_keep_best,
        "part_price_tail_index": analytics.part_price_tail_index,
        "events_type_burst_overlap":
            analytics.events_type_burst_overlap,
        "ngram_top_pairs": dedup.ngram_top_pairs,
        "simhash_dup_pairs": dedup.simhash_dup_pairs,  # golden oracle
        "dup_ngram_spans": dedup.dup_ngram_spans,
        "top_tokens": analytics.top_tokens,
        "top_tokens_sketch": analytics.top_tokens_sketch,
        "token_freq_cms": analytics.token_freq_cms,       # golden oracle
        "embedding_dup_pairs": dedup.embedding_dup_pairs,
        "embedding_dup_groups": dedup.embedding_dup_groups,  # golden oracle
        "minhash_lsh_groups": dedup.minhash_lsh_groups,   # golden oracle
        "simhash_docs": dedup.simhash_docs,               # golden oracle
        # similarity search
        "knn_bruteforce": ann.knn_bruteforce,
        "embedding_mmr_topk": ann.embedding_mmr_topk,     # golden oracle
        "knn_lsh": ann.knn_lsh,                           # golden oracle
        "knn_ivf": ann.knn_ivf,                           # golden oracle
        "knn_ivfpq": ann.knn_ivfpq,                       # golden oracle
        "embedding_rp": ann.embedding_rp,                 # golden oracle
        # text analysis
        "text_stats": analytics.text_stats,
        "text_analysis": text_ops.text_analysis,          # golden oracle
        # interleaved spans (input_hint shape) + sequence packing
        "spans_flat": spans.spans_flat,
        "spans_kind_transitions": spans.spans_kind_transitions,
        "spans_media_density_by_lang": spans.spans_media_density_by_lang,
        "pack_sequences": spans.pack_sequences,           # golden oracle
        "interleaved_pack": spans.interleaved_pack,       # golden oracle
        "pagerank_parts": graph.pagerank_parts,           # golden oracle
        # curation composition
        "curate_docs": curate.curate_docs,
        "curate_dedup": curate.curate_dedup,              # golden oracle
        "curate_pack": curate.curate_pack,                # golden oracle
        "decontaminate_docs": curate.decontaminate_docs,
        "docs_split_assign": curate.docs_split_assign,
        "docs_mixture_sample": curate.docs_mixture_sample,
        # multimodal plumbing (decode/feature/frame-sample stages; decode
        # itself is a clearly-marked deterministic fake — no codecs here)
        "media_metadata": media.media_metadata,
        "media_features": media.media_features,
        "media_frames": media.media_frames,
        "media_resized": media.media_resized,
        # crawl engine (stateful multi-pass; goldens from the independent
        # single-threaded spec oracle in tests/oracle.py)
        "crawl_pass_docs": crawl_queries.crawl_pass_docs,
        "frontier_host_stats": crawl_queries.frontier_host_stats,
    }


_TOP_TOKEN_DRIFT_SQL = """
            WITH b AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2
                                  AS mid FROM documents),
            w AS (SELECT CASE WHEN doc_id > b.mid
                              THEN 1 ELSE 0 END AS h,
                         UNNEST(STRING_SPLIT(text, ' ')) AS tok
                  FROM documents, b),
            g AS (SELECT tok, h, CAST(COUNT(*) AS BIGINT) AS c
                  FROM w GROUP BY 1, 2),
            t AS (SELECT CAST(COALESCE(SUM(c) FILTER (h = 0), 0)
                              AS BIGINT) AS t1,
                         CAST(COALESCE(SUM(c) FILTER (h = 1), 0)
                              AS BIGINT) AS t2 FROM g),
            tp AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS n,
                          CAST(COALESCE(SUM(c) FILTER (h = 0), 0)
                               AS BIGINT) AS a,
                          CAST(COALESCE(SUM(c) FILTER (h = 1), 0)
                               AS BIGINT) AS bb
                   FROM g GROUP BY tok
                   ORDER BY n DESC, tok LIMIT 20)
            SELECT tok AS token, n AS n_total,
                   CAST(CASE WHEN t.t1 > 0 THEN 10000 * a // t.t1
                             ELSE -9999 END AS BIGINT)
                       AS share_h1_bps,
                   CAST(CASE WHEN t.t2 > 0 THEN 10000 * bb // t.t2
                             ELSE -9999 END AS BIGINT)
                       AS share_h2_bps,
                   CAST(CASE WHEN a > 0 AND t.t2 > 0 THEN
                        1000 * bb * t.t1 // (a * t.t2) - 1000
                        ELSE -9999 END AS BIGINT) AS shift_milli
            FROM tp, t
        """


def oracle_sql() -> dict[str, str]:
    """DuckDB twins. Two oracle classes:

    - SQL-recomputed: the query's semantics re-expressed in ANSI SQL over
      the registered table views (most entries).
    - Golden-file: queries whose semantics SQL cannot express (LSH/IVF
      probing, minhash group propagation, heuristic scoring, the stateful
      multi-pass crawl). Their DuckDB side reads a parquet golden under
      ``tests/golden/`` produced at sf0.01 by INDEPENDENT single-process
      reimplementations (``tools/make_goldens.py`` — plain Python loops,
      no Ray, no pipeline imports), so the distributed machinery is
      checked against straight-line reference code, value-exact.
    """
    md5h = "CAST(('0x' || substr(md5(text), 1, 15)) AS UBIGINT)"
    gold = "/root/repo/tests/golden"
    golden_queries = ["simhash_docs", "simhash_dup_pairs", "text_analysis",
                      "minhash_lsh_groups", "curate_dedup",
                      "embedding_dup_groups", "pack_sequences",
                      "curate_pack", "interleaved_pack", "pagerank_parts",
                      "users_per_event_type_hll", "knn_lsh",
                      "knn_ivf", "knn_ivfpq", "embedding_rp",
                      "frontier_host_stats", "crawl_pass_docs",
                      "token_freq_cms", "lm_bigram_scores",
                      "kmeans_clusters", "semantic_dedup", "bm25_scores",
                      "strip_dup_windows", "part_components",
                      "events_weighted_sample", "docs_compression_ratio",
                      "events_entropy_per_user", "bpe_merges",
                      "events_value_ewma", "part_kcore",
                      "embedding_mmr_topk", "events_voptimal_histogram",
                      "events_channel_shapley"]
    goldens = {
        name: f"SELECT * FROM read_parquet('{gold}/{name}.parquet')"
        for name in golden_queries
    }
    return goldens | {
        "part_price_tail_index": """
            WITH p AS (SELECT p_brand, p_partkey,
                              CAST(FLOOR(p_retailprice * 100) AS BIGINT)
                                  AS cents,
                              ROW_NUMBER() OVER (PARTITION BY p_brand
                                  ORDER BY CAST(FLOOR(p_retailprice
                                      * 100) AS BIGINT) DESC, p_partkey)
                                  AS rk
                       FROM part),
            x AS (SELECT p_brand,
                         MAX(CASE WHEN rk = 51 THEN cents END) AS xk
                  FROM p GROUP BY 1),
            t AS (SELECT a.p_brand, MAX(x.xk) AS xk,
                         SUM(CAST(FLOOR((ln(a.cents) - ln(x.xk)) * 1e6)
                             AS BIGINT)) AS s
                  FROM p a JOIN x ON a.p_brand = x.p_brand
                  WHERE x.xk IS NOT NULL AND a.rk <= 50
                  GROUP BY 1)
            SELECT p_brand, CAST(50 AS BIGINT) AS k,
                   xk AS xmin_cents,
                   CAST(s // 50 AS BIGINT) AS hill_micro
            FROM t ORDER BY p_brand
        """,
        "events_type_burst_overlap": """
            WITH m AS (SELECT DISTINCT epoch_us(ts) // 60000000
                           AS minute, event_type
                       FROM events),
            tot AS (SELECT COUNT(DISTINCT minute) AS n_min FROM m),
            s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
                  FROM m GROUP BY 1),
            pr AS (SELECT a.event_type AS ta, b.event_type AS tb,
                          CAST(COUNT(*) AS BIGINT) AS n_both
                   FROM m a JOIN m b ON a.minute = b.minute
                        AND a.event_type < b.event_type
                   GROUP BY 1, 2)
            SELECT ta AS type_a, tb AS type_b, n_both,
                   sa.n AS n_a, sb.n AS n_b,
                   CAST(CAST(n_both AS HUGEINT) * n_min * 1000
                        // (CAST(sa.n AS HUGEINT) * sb.n) AS BIGINT)
                       AS lift_milli
            FROM pr JOIN s sa ON sa.event_type = pr.ta
                 JOIN s sb ON sb.event_type = pr.tb, tot
            ORDER BY 1, 2
        """,
        "dedup_keep_best": """
            SELECT FIRST(doc_id ORDER BY source, doc_id) AS keep_id,
                   FIRST(source ORDER BY source, doc_id)
                       AS keep_source,
                   CAST(COUNT(*) AS BIGINT) AS n_copies,
                   CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
            FROM documents GROUP BY substr(text, 1, 80)
            HAVING COUNT(*) >= 2 ORDER BY keep_id
        """,
        "docs_per_lang": """
            SELECT lang,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   CAST(MAX(n_chars) AS BIGINT) AS max_chars
            FROM documents GROUP BY lang
        """,
        "events_rollup": """
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(FLOOR(value*100) AS BIGINT)) AS BIGINT)
                       AS sum_value_cents,
                   CAST(MIN(event_id) AS BIGINT) AS min_event_id,
                   CAST(MAX(event_id) AS BIGINT) AS max_event_id
            FROM events GROUP BY event_type
        """,
        "q1_pricing": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(FLOOR(l_extendedprice*100) AS BIGINT))
                        AS BIGINT) AS sum_price_cents,
                   CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100)
                        AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "user_activity": """
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(FLOOR(value*100) AS BIGINT)) AS BIGINT)
                       AS sum_value_cents,
                   CAST(MIN(epoch_us(ts)) AS BIGINT) AS first_ts_us,
                   CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_ts_us
            FROM events GROUP BY user_id
        """,
        "events_windowed": """
            SELECT event_type,
                   CAST((epoch_us(ts) // 3600000000) * 3600000000 AS BIGINT)
                       AS window_start_us,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(FLOOR(value*100) AS BIGINT)) AS BIGINT)
                       AS sum_value_cents
            FROM events GROUP BY 1, 2
        """,
        "events_hopping": """
            SELECT event_type,
                   CAST((epoch_us(ts) // 900000000) * 900000000
                        - k * 900000000 AS BIGINT) AS window_start_us,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(FLOOR(value*100) AS BIGINT)) AS BIGINT)
                       AS sum_value_cents
            FROM events, generate_series(0, 3) AS t(k)
            GROUP BY 1, 2
        """,
        "events_since_watermark": """
            SELECT event_id, user_id, event_type, value
            FROM events WHERE event_id > 5000
            ORDER BY event_id LIMIT 2000
        """,
        "docs_top_nchars": """
            SELECT doc_id, lang, n_chars FROM documents
            ORDER BY n_chars DESC, doc_id LIMIT 20
        """,
        "events_topk_per_user": """
            SELECT user_id, event_id, value FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY value DESC, event_id) <= 3
        """,
        "purchase_click_asof": """
            WITH c AS (
              SELECT user_id, ts, MAX(event_id) AS click_id
              FROM events WHERE event_type = 'click' GROUP BY user_id, ts
            ), p AS (
              SELECT event_id AS purchase_id, user_id, ts
              FROM events WHERE event_type = 'purchase'
            ), m AS (
              SELECT p.purchase_id, p.user_id, p.ts AS pts, MAX(c.ts) AS cts
              FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
              GROUP BY 1, 2, 3
            )
            SELECT CAST(m.purchase_id AS BIGINT) AS purchase_id,
                   CAST(m.user_id AS BIGINT) AS user_id,
                   CAST(epoch_us(m.pts) AS BIGINT) AS purchase_ts_us,
                   CAST(c.click_id AS BIGINT) AS click_id,
                   CAST(epoch_us(m.cts) AS BIGINT) AS click_ts_us,
                   CAST(epoch_us(m.pts) - epoch_us(m.cts) AS BIGINT)
                       AS gap_us
            FROM m JOIN c ON c.user_id = m.user_id AND c.ts = m.cts
        """,
        "quiet_customers": """
            SELECT c_custkey, c_name,
                   CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS acctbal_cents
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 300000)
        """,
        "q3_shipping": """
            SELECT l.l_orderkey AS l_orderkey,
                   CAST(epoch_us(o.o_orderdate) AS BIGINT) AS o_orderdate_us,
                   CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1-l.l_discount)*100)
                        AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY 1, 2
            ORDER BY revenue_cents DESC, l_orderkey LIMIT 10
        """,
        "part_supplier_revenue": """
            SELECT p.p_brand AS p_brand, n.n_name AS n_name,
                   CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1-l.l_discount)*100)
                        AS BIGINT)) AS BIGINT) AS revenue_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_lines
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            GROUP BY 1, 2
        """,
        "events_value_bands": """
            WITH bands(tier, lo, hi) AS (VALUES
                ('t0', 0.0, 5.0), ('t1', 5.0, 25.0), ('t2', 25.0, 75.0),
                ('t3', 75.0, 150.0), ('t4', 150.0, 1000000.0))
            SELECT b.tier AS tier, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(FLOOR(e.value*100) AS BIGINT)) AS BIGINT)
                       AS sum_value_cents
            FROM events e JOIN bands b
              ON e.value >= b.lo AND e.value < b.hi
            GROUP BY 1
        """,
        "dup_ngram_spans": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '\S+')) AS tok,
                     generate_subscripts(regexp_extract_all(text, '\S+'), 1)
                         AS i
              FROM documents
            ), w AS (
              SELECT doc_id,
                     tok || ' ' || lead(tok,1) OVER win || ' ' ||
                     lead(tok,2) OVER win AS wtext
              FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY i)
              QUALIFY lead(tok,2) OVER win IS NOT NULL
            ), dcount AS (
              SELECT wtext, COUNT(DISTINCT doc_id) AS nd
              FROM w GROUP BY wtext
            )
            SELECT w.doc_id AS doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_windows,
                   CAST(SUM(CASE WHEN d.nd > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dup_windows
            FROM w JOIN dcount d ON w.wtext = d.wtext
            GROUP BY w.doc_id
        """,
        "top_tokens": r"""
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS tok
                  FROM documents)
            GROUP BY tok ORDER BY n DESC, tok LIMIT 50
        """,
        # output-identical MG-sketch variant — shares the exact twin
        "top_tokens_sketch": r"""
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS tok
                  FROM documents)
            GROUP BY tok ORDER BY n DESC, tok LIMIT 50
        """,
        "order_priority_revenue": """
            SELECT o.o_orderpriority AS o_orderpriority,
                   CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1-l.l_discount)*100)
                        AS BIGINT)) AS BIGINT) AS revenue_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_lines
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderpriority
        """,
        "user_sessions": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
            lagd AS (SELECT user_id, t,
                            lag(t) OVER (PARTITION BY user_id ORDER BY t)
                                AS pt FROM e),
            brk AS (SELECT user_id, t,
                           CASE WHEN pt IS NULL OR t - pt > 1800000000
                                THEN 1 ELSE 0 END AS news FROM lagd),
            sess AS (SELECT user_id,
                            SUM(news) OVER (PARTITION BY user_id ORDER BY t
                                ROWS UNBOUNDED PRECEDING) AS sid FROM brk),
            per AS (SELECT user_id, sid, COUNT(*) AS n
                    FROM sess GROUP BY user_id, sid)
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
                   CAST(MAX(n) AS BIGINT) AS max_session_events
            FROM per GROUP BY user_id
        """,
        "users_click_and_purchase": """
            SELECT CAST(user_id AS BIGINT) AS user_id FROM events
            WHERE event_type = 'click'
            INTERSECT
            SELECT CAST(user_id AS BIGINT) FROM events
            WHERE event_type = 'purchase'
        """,
        "users_click_no_purchase": """
            SELECT CAST(user_id AS BIGINT) AS user_id FROM events
            WHERE event_type = 'click' AND value > 95.0
            EXCEPT
            SELECT CAST(user_id AS BIGINT) FROM events
            WHERE event_type = 'purchase' AND value > 95.0
        """,
        "docs_per_source_cap": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
                   CAST(n_chars AS BIGINT) AS n_chars
            FROM documents
            QUALIFY row_number() OVER (
                PARTITION BY source ORDER BY doc_id) <= 5
        """,
        "doc_repetition": r"""
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(text, '\S+') AS ws
              FROM documents),
            flat AS (
              SELECT doc_id, unnest(ws) AS tok,
                     generate_subscripts(ws, 1) AS pos,
                     len(ws) AS n_tok
              FROM toks),
            bg AS (
              SELECT doc_id, n_tok, tok,
                     lead(tok) OVER (PARTITION BY doc_id ORDER BY pos)
                         AS nxt
              FROM flat),
            cnt AS (
              SELECT doc_id, MAX(n_tok) AS n_tok, COUNT(*) AS c
              FROM bg WHERE nxt IS NOT NULL
              GROUP BY doc_id, tok, nxt),
            tops AS (
              SELECT doc_id, MAX(n_tok) AS n_tok, MAX(c) AS top_n
              FROM cnt GROUP BY doc_id)
            SELECT d.doc_id AS doc_id,
                   CAST(COALESCE(t.n_tok, len(regexp_extract_all(d.text,
                        '\S+'))) AS BIGINT) AS n_tokens,
                   CAST(COALESCE(t.top_n, 0) AS BIGINT) AS top_bigram_n,
                   CAST(CASE WHEN COALESCE(t.n_tok, 0) >= 2
                        THEN t.top_n * 2 * 10000 // t.n_tok
                        ELSE 0 END AS BIGINT) AS rep_bp
            FROM documents d LEFT JOIN tops t ON d.doc_id = t.doc_id
        """,
        "tfidf_top_terms": r"""
            WITH flat AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '\S+')) AS tok
              FROM documents),
            tf AS (
              SELECT doc_id, tok, COUNT(*) AS tf
              FROM flat GROUP BY doc_id, tok),
            dfc AS (
              SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
            scored AS (
              SELECT tf.doc_id, tf.tok, tf.tf, dfc.df,
                     tf.tf * 1000000 // dfc.df AS score_ppm
              FROM tf JOIN dfc ON tf.tok = dfc.tok)
            SELECT CAST(doc_id AS BIGINT) AS doc_id, tok,
                   CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
                   CAST(score_ppm AS BIGINT) AS score_ppm
            FROM scored
            QUALIFY row_number() OVER (
                PARTITION BY doc_id
                ORDER BY score_ppm DESC, tok) <= 3
        """,
        "redact_terms": r"""
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(len(regexp_extract_all(text,
                        '\b(customer|spark|value)\b')) AS BIGINT)
                       AS n_hits,
                   CAST(length(regexp_replace(text,
                        '\b(customer|spark|value)\b', '[REDACTED]', 'g'))
                        AS BIGINT) AS n_chars_redacted
            FROM documents
        """,
        "events_funnel": """
            WITH v AS (SELECT user_id, MIN(ts) AS vt FROM events
                       WHERE event_type = 'view' GROUP BY user_id),
            c AS (SELECT e.user_id, MIN(e.ts) AS ct
                  FROM events e JOIN v ON e.user_id = v.user_id
                  WHERE e.event_type = 'click' AND e.ts > v.vt
                  GROUP BY e.user_id),
            p AS (SELECT DISTINCT e.user_id
                  FROM events e JOIN c ON e.user_id = c.user_id
                  WHERE e.event_type = 'purchase' AND e.ts > c.ct)
            SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT)
                       AS n_users_view,
                   CAST((SELECT COUNT(*) FROM c) AS BIGINT)
                       AS n_users_view_click,
                   CAST((SELECT COUNT(*) FROM p) AS BIGINT)
                       AS n_users_funnel
        """,
        "events_latest_per_key": """
            SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
                   CAST(event_id AS BIGINT) AS event_id,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                   CAST(FLOOR(value*100) AS BIGINT) AS value_cents
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts DESC, event_id DESC) = 1
        """,
        "events_grouping_sets": """
            SELECT CASE WHEN GROUPING(event_type) = 0 AND
                             GROUPING(user_id) = 1 THEN 0
                        WHEN GROUPING(user_id) = 0 THEN 1
                        ELSE 2 END AS set_id,
                   COALESCE(event_type, '') AS event_type,
                   CAST(COALESCE(user_id, -1) AS BIGINT) AS user_id,
                   CAST(SUM(CAST(FLOOR(value*100) AS BIGINT)) AS BIGINT)
                       AS sum_cents,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events
            GROUP BY GROUPING SETS ((event_type), (user_id), ())
        """,
        "user_event_pivot": """
            SELECT user_id,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'click')
                        AS BIGINT) AS n_click,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'error')
                        AS BIGINT) AS n_error,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'purchase')
                        AS BIGINT) AS n_purchase,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'signup')
                        AS BIGINT) AS n_signup,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'view')
                        AS BIGINT) AS n_view
            FROM events GROUP BY user_id
        """,
        "users_per_event_type": """
            SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT)
                AS n_users
            FROM events GROUP BY event_type
        """,
        "user_value_rolling": """
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(event_id AS BIGINT) AS event_id,
                   CAST(SUM(CAST(FLOOR(value*100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS roll_cents
            FROM events
        """,
        "docs_hash_sample": """
            SELECT doc_id, n_chars FROM documents
            WHERE CAST(('0x' || substr(md5(text), 16, 1)) AS INT) = 0
        """,
        "events_ranked": """
            SELECT user_id, event_id,
                   CAST(row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS BIGINT) AS rnk
            FROM events
            QUALIFY rnk <= 2
        """,
        "events_lag_delta": """
            SELECT user_id, event_id,
                   CAST(cents - prev AS BIGINT) AS delta_cents
            FROM (
                SELECT user_id, event_id,
                       CAST(FLOOR(value*100) AS BIGINT) AS cents,
                       LAG(CAST(FLOOR(value*100) AS BIGINT)) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev
                FROM events)
            WHERE prev IS NOT NULL
        """,
        "events_props_deciles": """
            SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT)
                        // 10 AS BIGINT) AS k_decile,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(FLOOR(value*100) AS BIGINT)) AS BIGINT)
                       AS sum_cents
            FROM events
            WHERE json_extract_string(props, '$.k') IS NOT NULL
            GROUP BY 1
        """,
        "events_stratified_sample": """
            SELECT event_id, event_type,
                   CAST(FLOOR(value*100) AS BIGINT) AS value_cents
            FROM events
            WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                                       1, 15)) AS UBIGINT)
                  % (CASE event_type WHEN 'purchase' THEN 1
                                     WHEN 'signup' THEN 2
                                     WHEN 'click' THEN 4
                                     WHEN 'error' THEN 8
                                     ELSE 16 END) = 0
        """,
        "events_value_histogram": """
            WITH b AS (
                SELECT event_type,
                       CAST(FLOOR(value*100) AS BIGINT) // 50 AS bin,
                       COUNT(*) AS c
                FROM events GROUP BY 1, 2
            ), cum AS (
                SELECT event_type, bin,
                       SUM(c) OVER (PARTITION BY event_type
                                    ORDER BY bin) AS cc,
                       SUM(c) OVER (PARTITION BY event_type) AS n
                FROM b
            )
            SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
                   CAST(MIN(CASE WHEN cc >= CEIL(0.5 * n)
                                 THEN bin * 50 END) AS BIGINT)
                       AS p50_est_cents,
                   CAST(MIN(CASE WHEN cc >= CEIL(0.95 * n)
                                 THEN bin * 50 END) AS BIGINT)
                       AS p95_est_cents
            FROM cum GROUP BY event_type
        """,
        "q5_region_supplier_volume": """
            SELECT n_name,
                   CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100)
                        AS BIGINT)) AS BIGINT) AS revenue_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_lines
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
            GROUP BY n_name
        """,
        "big_order_lines_bloom": """
            SELECT o.o_orderpriority AS o_orderpriority,
                   CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1-l.l_discount)*100)
                        AS BIGINT)) AS BIGINT) AS revenue_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_lines
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            WHERE o.o_totalprice > 450000
            GROUP BY o.o_orderpriority
        """,
        "q18_large_orders": """
            WITH big AS (
              SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT))
                     AS BIGINT) AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING SUM(CAST(l_quantity AS BIGINT)) > 250
            )
            SELECT CAST(o.o_custkey AS BIGINT) AS c_custkey,
                   c.c_name AS c_name,
                   CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
                   CAST(epoch_us(o.o_orderdate) AS BIGINT) AS o_orderdate_us,
                   CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)
                       AS totalprice_cents,
                   b.sum_qty AS sum_qty
            FROM orders o
            JOIN big b ON o.o_orderkey = b.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
        """,
        "q17_small_qty_revenue": """
            WITH a AS (
              SELECT l_partkey,
                     SUM(CAST(l_quantity AS BIGINT)) AS s,
                     COUNT(*) AS c
              FROM lineitem GROUP BY l_partkey
            )
            SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS revenue_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_lines
            FROM lineitem l JOIN a ON l.l_partkey = a.l_partkey
            WHERE 5 * CAST(l.l_quantity AS BIGINT) * a.c < a.s
        """,
        "q14_promo_revenue": """
            WITH f AS (
              SELECT CAST(FLOOR(l_extendedprice*(1-l_discount)*100)
                     AS BIGINT) AS cents, p.p_type AS p_type
              FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
              WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
                AND l.l_shipdate < TIMESTAMP '1997-01-01')
            SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN cents
                            ELSE 0 END) AS BIGINT) AS promo_cents,
                   CAST(SUM(cents) AS BIGINT) AS total_cents,
                   CAST(SUM(CASE WHEN p_type = 'PROMO' THEN cents
                            ELSE 0 END) * 10000 // SUM(cents)
                        AS BIGINT) AS promo_bp
            FROM f
        """,
        "q7_nation_volume": """
            SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                   CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS year,
                   CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1-l.l_discount)
                        *100) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation ns ON s.s_nationkey = ns.n_nationkey
            JOIN nation nc ON c.c_nationkey = nc.n_nationkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate < TIMESTAMP '1998-01-01'
              AND ns.n_nationkey <> nc.n_nationkey
            GROUP BY 1, 2, 3
        """,
        "q19_bracket_revenue": """
            SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1-l.l_discount)
                        *100) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_lines
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
                   AND l.l_quantity BETWEEN 1 AND 11)
               OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
                   AND l.l_quantity BETWEEN 10 AND 20)
               OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
                   AND l.l_quantity BETWEEN 20 AND 30)
        """,
        "late_shipment_priority": """
            SELECT o.o_orderpriority AS o_orderpriority,
                   CAST(SUM(CASE WHEN l.l_shipdate > o.o_orderdate
                                      + INTERVAL 90 DAY
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
                   CAST(COUNT(*) AS BIGINT) AS n_lines
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1
        """,
        "q22_idle_rich_customers": """
            WITH avgb AS (
              SELECT CAST(SUM(CAST(FLOOR(c_acctbal*100) AS BIGINT))
                     // COUNT(*) AS BIGINT) AS a
              FROM customer WHERE FLOOR(c_acctbal*100) > 0)
            SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
                   CAST(FLOOR(c.c_acctbal*100) AS BIGINT)
                       AS acctbal_cents
            FROM customer c, avgb
            WHERE FLOOR(c.c_acctbal*100) > avgb.a
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '1-URGENT')
        """,
        "doc_token_rank": r"""
            WITH flat AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '\S+')) AS tok
              FROM documents),
            cnt AS (SELECT tok, COUNT(*) AS n FROM flat GROUP BY tok),
            rk AS (SELECT tok,
                          row_number() OVER (ORDER BY n DESC, tok) AS r
                   FROM cnt)
            SELECT CAST(f.doc_id AS BIGINT) AS doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(rk.r) AS BIGINT) AS rank_sum
            FROM flat f JOIN rk ON f.tok = rk.tok
            GROUP BY f.doc_id
        """,
        "triangle_count_parts": """
            WITH L AS (
              SELECT l_partkey,
                     lead(l_partkey) OVER (PARTITION BY l_orderkey
                                           ORDER BY l_linenumber,
                                                    l_partkey) AS nxt
              FROM lineitem),
            e0 AS (SELECT DISTINCT least(l_partkey, nxt) AS a,
                          greatest(l_partkey, nxt) AS b
                   FROM L WHERE nxt IS NOT NULL AND l_partkey <> nxt),
            nodes AS (SELECT a AS v FROM e0 UNION SELECT b FROM e0)
            SELECT CAST((SELECT COUNT(*) FROM nodes) AS BIGINT)
                       AS n_nodes,
                   CAST((SELECT COUNT(*) FROM e0) AS BIGINT) AS n_edges,
                   CAST((SELECT COUNT(*)
                         FROM e0 e1
                         JOIN e0 e2 ON e2.a = e1.b
                         JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b)
                        AS BIGINT) AS n_triangles
        """,
        "name_edit_near_pairs": """
            WITH n AS (SELECT DISTINCT p_name FROM part)
            SELECT a.p_name AS name_a, b.p_name AS name_b,
                   CAST(levenshtein(a.p_name, b.p_name) AS BIGINT)
                       AS dist
            FROM n a JOIN n b ON a.p_name < b.p_name
            WHERE levenshtein(a.p_name, b.p_name) <= 2
        """,
        "gopher_quality_flags": r"""
            WITH tok AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '\S+') AS toks,
                     length(regexp_replace(text, '\s', '', 'g'))
                         AS nonspace
              FROM documents),
            m AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     CAST(len(toks) AS BIGINT) AS n_words,
                     CAST(nonspace * 100 // greatest(len(toks), 1)
                          AS BIGINT) AS mean_wlen_x100,
                     CAST(len(list_intersect(list_distinct(toks),
                          ['the','a','and','of'])) AS BIGINT)
                         AS n_stop_kinds,
                     CAST(len(list_distinct(toks)) * 10000
                          // greatest(len(toks), 1) AS BIGINT) AS uniq_bp
              FROM tok)
            SELECT doc_id, n_words,
                   CASE WHEN n_words = 0 THEN 0
                        ELSE mean_wlen_x100 END AS mean_wlen_x100,
                   n_stop_kinds,
                   CASE WHEN n_words = 0 THEN 0 ELSE uniq_bp END
                       AS uniq_bp,
                   CAST(CASE WHEN n_words BETWEEN 30 AND 1000
                          AND mean_wlen_x100 BETWEEN 300 AND 600
                          AND n_stop_kinds >= 1 AND uniq_bp >= 3000
                        THEN 1 ELSE 0 END AS BIGINT) AS keep
            FROM m
        """,
        "events_rollup_incremental": """
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(FLOOR(value*100) AS BIGINT)) AS BIGINT)
                       AS sum_value_cents,
                   CAST(MIN(event_id) AS BIGINT) AS min_event_id,
                   CAST(MAX(event_id) AS BIGINT) AS max_event_id
            FROM events GROUP BY event_type
        """,
        "lineitem_unpivot": """
            WITH long AS (
              SELECT l_returnflag, 'quantity' AS measure,
                     CAST(FLOOR(l_quantity*100) AS BIGINT) AS cents
              FROM lineitem
              UNION ALL
              SELECT l_returnflag, 'extendedprice',
                     CAST(FLOOR(l_extendedprice*100) AS BIGINT)
              FROM lineitem
              UNION ALL
              SELECT l_returnflag, 'discount',
                     CAST(FLOOR(l_discount*100) AS BIGINT) FROM lineitem
              UNION ALL
              SELECT l_returnflag, 'tax',
                     CAST(FLOOR(l_tax*100) AS BIGINT) FROM lineitem)
            SELECT l_returnflag, measure,
                   CAST(SUM(cents) AS BIGINT) AS total_cents,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM long GROUP BY 1, 2
        """,
        "q6_revenue_delta": """
            SELECT CAST(COALESCE(SUM(CAST(FLOOR(
                       l_extendedprice*l_discount*100) AS BIGINT)), 0)
                   AS BIGINT) AS revenue_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_lines
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "q10_returned_revenue": """
            SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
                   c.c_name AS c_name,
                   CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1-l.l_discount)
                        *100) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE l.l_returnflag = 'R'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY 1, 2
            ORDER BY revenue_cents DESC, c_custkey
            LIMIT 20
        """,
        "q13_order_count_distribution": """
            SELECT CAST(c_count AS BIGINT) AS c_count,
                   CAST(COUNT(*) AS BIGINT) AS custdist
            FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
                  FROM customer c
                  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                  GROUP BY c.c_custkey) t
            GROUP BY c_count
        """,
        "q15_top_supplier": """
            WITH r AS (
              SELECT l_suppkey AS s_suppkey,
                     SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100)
                         AS BIGINT)) AS total_revenue_cents
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1996-04-01'
              GROUP BY l_suppkey)
            SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey,
                   s.s_name AS s_name,
                   CAST(r.total_revenue_cents AS BIGINT)
                       AS total_revenue_cents
            FROM supplier s JOIN r ON s.s_suppkey = r.s_suppkey
            WHERE r.total_revenue_cents =
                  (SELECT MAX(total_revenue_cents) FROM r)
        """,
        "q2_min_cost_supplier": """
            WITH costs AS (
              SELECT l_partkey AS p, l_suppkey AS s,
                     MIN(CAST(FLOOR(l_extendedprice*100) AS BIGINT)) AS c
              FROM lineitem
              JOIN part ON p_partkey = l_partkey AND p_size <= 10
              GROUP BY 1, 2),
            best AS (SELECT p, MIN(c) AS mc FROM costs GROUP BY p),
            pick AS (
              SELECT costs.p, MIN(costs.s) AS s, MIN(costs.c) AS c
              FROM costs JOIN best
                ON costs.p = best.p AND costs.c = best.mc
              GROUP BY costs.p)
            SELECT CAST(pick.p AS BIGINT) AS p_partkey,
                   CAST(pick.s AS BIGINT) AS s_suppkey,
                   supplier.s_name AS s_name,
                   CAST(pick.c AS BIGINT) AS min_price_cents
            FROM pick JOIN supplier ON supplier.s_suppkey = pick.s
            ORDER BY p_partkey
        """,
        "q4_priority_with_bulk_line": """
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_quantity >= 45)
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "lineitem_fingerprint": """
            WITH h AS (
              SELECT ((((l_orderkey % 2147483647) * 1000003
                        + l_linenumber) % 2147483647 * 1000003
                       + l_partkey) % 2147483647 * 1000003
                      + l_suppkey) % 2147483647 AS v
              FROM lineitem)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(v) AS BIGINT) AS checksum_sum,
                   CAST(BIT_XOR(v) AS BIGINT) AS checksum_xor
            FROM h
        """,
        "events_hist_quantiles": """
            WITH c AS (SELECT CAST(FLOOR(value*100) AS BIGINT) AS cents
                       FROM events)
            SELECT q_pct, cents FROM (
              SELECT 25 AS q_pct,
                     CAST(quantile_disc(cents, 0.25) AS BIGINT) AS cents
              FROM c
              UNION ALL SELECT 50, CAST(quantile_disc(cents, 0.50)
                                        AS BIGINT) FROM c
              UNION ALL SELECT 75, CAST(quantile_disc(cents, 0.75)
                                        AS BIGINT) FROM c
              UNION ALL SELECT 90, CAST(quantile_disc(cents, 0.90)
                                        AS BIGINT) FROM c
              UNION ALL SELECT 99, CAST(quantile_disc(cents, 0.99)
                                        AS BIGINT) FROM c)
        """,
        "events_ntile": """
            SELECT event_id,
                   CAST(NTILE(4) OVER (
                       ORDER BY CAST(FLOOR(value*100) AS BIGINT),
                                event_id) AS BIGINT) AS ntile
            FROM events ORDER BY event_id
        """,
        "user_active_seconds": """
            WITH iv AS (
              SELECT user_id, epoch_us(ts) AS s,
                     epoch_us(ts)
                     + CAST(FLOOR(value*100) AS BIGINT) * 1000000 AS e
              FROM events),
            m AS (
              SELECT user_id, s, e,
                     MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING) AS pm
              FROM iv),
            isl AS (
              SELECT user_id, s, e,
                     SUM(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
                         OVER (PARTITION BY user_id ORDER BY s, e) AS isle
              FROM m)
            SELECT user_id,
                   CAST(SUM(cov) AS BIGINT) AS active_us,
                   CAST(COUNT(*) AS BIGINT) AS n_islands
            FROM (SELECT user_id, isle, MAX(e) - MIN(s) AS cov
                  FROM isl GROUP BY user_id, isle)
            GROUP BY user_id ORDER BY user_id
        """,
        "user_first_last": """
            SELECT user_id,
                   first(event_type ORDER BY ts, event_id) AS first_type,
                   last(event_type ORDER BY ts, event_id) AS last_type,
                   CAST(CAST(FLOOR(last(value ORDER BY ts, event_id)*100)
                             AS BIGINT)
                        - CAST(FLOOR(first(value ORDER BY ts, event_id)*100)
                               AS BIGINT) AS BIGINT) AS delta_cents
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "lineitem_regr": """
            WITH m AS (
              SELECT l_returnflag AS flag,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT))
                          AS BIGINT) AS sx,
                     CAST(SUM(CAST(FLOOR(l_extendedprice) AS BIGINT))
                          AS BIGINT) AS sy,
                     CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)
                              * CAST(FLOOR(l_extendedprice) AS BIGINT))
                          AS BIGINT) AS sxy,
                     CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)
                              * CAST(FLOOR(l_quantity) AS BIGINT))
                          AS BIGINT) AS sxx,
                     CAST(SUM(CAST(FLOOR(l_extendedprice) AS BIGINT)
                              * CAST(FLOOR(l_extendedprice) AS BIGINT))
                          AS BIGINT) AS syy
              FROM lineitem GROUP BY 1),
            d AS (
              SELECT flag, n,
                     CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE) AS num,
                     CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) AS den,
                     CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE) AS vb,
                     CAST(sy AS DOUBLE)*CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE)*CAST(sxy AS DOUBLE) AS inum
              FROM m)
            SELECT flag AS l_returnflag, n,
                   CAST(FLOOR((num/den)*1000000.0) AS BIGINT)
                       AS slope_micro,
                   CAST(FLOOR((inum/den)*1000000.0) AS BIGINT)
                       AS intercept_micro,
                   CAST(FLOOR(((num*num)/(den*vb))*1000.0) AS BIGINT)
                       AS r2_milli
            FROM d ORDER BY l_returnflag
        """,
        "events_ohlc": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                              CAST(FLOOR(value*100) AS BIGINT) AS cents
                       FROM events)
            SELECT user_id,
                   CAST(ts_us//3600000000 AS BIGINT) AS hour_id,
                   first(cents ORDER BY ts_us, event_id) AS open_cents,
                   CAST(MAX(cents) AS BIGINT) AS high_cents,
                   CAST(MIN(cents) AS BIGINT) AS low_cents,
                   last(cents ORDER BY ts_us, event_id) AS close_cents,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM e GROUP BY user_id, ts_us//3600000000
            ORDER BY user_id, hour_id
        """,
        "user_band_runs": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                              CAST(FLOOR(value*100) AS BIGINT)//2000
                                  AS band
                       FROM events),
            m AS (SELECT *,
                         CASE WHEN LAG(band) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts_us, event_id)
                              IS DISTINCT FROM band
                              THEN 1 ELSE 0 END AS brk
                  FROM e),
            r AS (SELECT *,
                         SUM(brk) OVER (PARTITION BY user_id
                                        ORDER BY ts_us, event_id
                                        ROWS UNBOUNDED PRECEDING)
                             AS run_idx
                  FROM m)
            SELECT user_id, CAST(run_idx AS BIGINT) AS run_idx, band,
                   CAST(MIN(ts_us) AS BIGINT) AS from_us,
                   CAST(MAX(ts_us) AS BIGINT) AS to_us,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM r GROUP BY user_id, run_idx, band
            ORDER BY user_id, run_idx
        """,
        "docs_chunk_windows": """
            WITH s AS (
              SELECT doc_id, text,
                     unnest(generate_series(1, CAST(n_chars AS BIGINT),
                                            80)) AS s
              FROM documents)
            SELECT doc_id,
                   CAST((s-1)//80 AS BIGINT) AS chunk_idx,
                   CAST(s AS BIGINT) AS start,
                   CAST(length(substring(text, CAST(s AS INTEGER), 120))
                        AS BIGINT) AS chunk_len,
                   md5(substring(text, CAST(s AS INTEGER), 120))
                       AS chunk_md5
            FROM s ORDER BY doc_id, start
        """,
        "event_transitions": """
            WITH s AS (
              SELECT event_type,
                     LAG(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id)
                         AS prev_type
              FROM events)
            SELECT prev_type AS from_type, event_type AS to_type,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM s WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type
            ORDER BY from_type, to_type
        """,
        "embedding_dim_stats": """
            WITH u AS (
              SELECT unnest(embedding) AS v,
                     unnest(generate_series(1, len(embedding))) AS dim
              FROM embeddings)
            SELECT CAST(dim AS BIGINT) AS dim,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE)*1000000.0)
                                 AS BIGINT)) AS BIGINT) AS sum_fp,
                   CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE)*1000000.0)
                                 AS BIGINT)
                            * CAST(FLOOR(CAST(v AS DOUBLE)*1000000.0)
                                   AS BIGINT)) AS BIGINT) AS sumsq_fp
            FROM u GROUP BY dim ORDER BY dim
        """,
        "events_value_winsorized": """
            WITH c AS (SELECT event_id,
                              CAST(FLOOR(value*100) AS BIGINT) AS cents
                       FROM events),
            q AS (SELECT quantile_disc(cents, 0.05) AS lo,
                         quantile_disc(cents, 0.95) AS hi FROM c)
            SELECT event_id,
                   CAST(LEAST(GREATEST(cents, lo), hi) AS BIGINT)
                       AS w_cents
            FROM c, q ORDER BY event_id
        """,
        "events_chi2_cells": """
            WITH c AS (SELECT event_type,
                              CAST(FLOOR(value*100) AS BIGINT)//10000
                                  AS band
                       FROM events),
            o AS (SELECT event_type, band,
                         CAST(COUNT(*) AS BIGINT) AS observed
                  FROM c GROUP BY 1, 2),
            r AS (SELECT event_type, SUM(observed) AS rt
                  FROM o GROUP BY 1),
            col AS (SELECT band, SUM(observed) AS ct FROM o GROUP BY 1),
            tot AS (SELECT SUM(observed) AS big_n FROM o)
            SELECT o.event_type, o.band, o.observed,
                   CAST(((CAST(big_n AS HUGEINT)*observed
                          - CAST(rt AS HUGEINT)*ct)
                         * (CAST(big_n AS HUGEINT)*observed
                            - CAST(rt AS HUGEINT)*ct)
                         * 1000000)
                        // (CAST(big_n AS HUGEINT)*rt*ct) AS BIGINT)
                       AS chi2_micro
            FROM o
            JOIN r USING (event_type) JOIN col USING (band), tot
            ORDER BY event_type, band
        """,
        "user_twap": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                              CAST(FLOOR(value*100) AS BIGINT) AS cents
                       FROM events),
            l AS (SELECT *,
                         LEAD(ts_us) OVER (PARTITION BY user_id
                                           ORDER BY ts_us, event_id)
                             AS nxt
                  FROM e)
            SELECT user_id,
                   CAST(SUM(cents * ((nxt - ts_us)//1000000))
                        AS BIGINT) AS twap_num,
                   CAST(SUM((nxt - ts_us)//1000000) AS BIGINT)
                       AS twap_den,
                   CAST(COUNT(*) AS BIGINT) AS n_gaps
            FROM l WHERE nxt IS NOT NULL
            GROUP BY user_id ORDER BY user_id
        """,
        "embedding_quantize": """
            WITH u AS (
              SELECT vec_id, unnest(embedding) AS v,
                     unnest(generate_series(1, len(embedding))) AS dim
              FROM embeddings),
            mm AS (SELECT dim, MIN(CAST(v AS DOUBLE)) AS dmin,
                          MAX(CAST(v AS DOUBLE)) AS dmax
                   FROM u GROUP BY dim)
            SELECT vec_id, CAST(dim AS BIGINT) AS dim,
                   CASE WHEN dmax <= dmin THEN CAST(0 AS BIGINT)
                        ELSE CAST(LEAST(GREATEST(
                                 CAST(FLOOR((CAST(v AS DOUBLE) - dmin)
                                            / (dmax - dmin) * 255.0)
                                      AS BIGINT), 0), 255) AS BIGINT)
                   END AS code
            FROM u JOIN mm USING (dim)
            ORDER BY vec_id, dim
        """,
        "events_rolling_outliers": """
            WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                              CAST(FLOOR(value*100) AS BIGINT) AS c
                       FROM events),
            r AS (SELECT event_id, c,
                         COUNT(*) OVER w AS n,
                         SUM(c) OVER w AS s,
                         SUM(c*c) OVER w AS sq
                  FROM e
                  WINDOW w AS (PARTITION BY user_id
                               ORDER BY ts_us, event_id
                               ROWS BETWEEN 20 PRECEDING
                                        AND 1 PRECEDING))
            SELECT event_id,
                   CAST(CASE WHEN n >= 2
                             AND (n*c - s)*(n*c - s) > 9*(n*sq - s*s)
                             THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
            FROM r ORDER BY event_id
        """,
        "user_path_freq": """
            WITH r AS (SELECT user_id, event_type,
                              ROW_NUMBER() OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)
                                  AS rn
                       FROM events),
            p AS (SELECT user_id,
                         string_agg(event_type, '>' ORDER BY rn)
                             AS path
                  FROM r WHERE rn <= 5 GROUP BY user_id)
            SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM p GROUP BY path ORDER BY path
        """,
        "events_dow_hour_heatmap": """
            SELECT CAST((epoch_us(ts)//86400000000 + 4) % 7 AS BIGINT)
                       AS dow,
                   CAST((epoch_us(ts)//3600000000) % 24 AS BIGINT)
                       AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(FLOOR(value*100) AS BIGINT))
                        AS BIGINT) AS sum_cents
            FROM events GROUP BY 1, 2 ORDER BY dow, hour
        """,
        "part_abc": """
            WITH r AS (
              SELECT l_partkey,
                     CAST(SUM(CAST(FLOOR(l_extendedprice
                                         *(1-l_discount)*100)
                                   AS BIGINT)) AS BIGINT) AS rev
              FROM lineitem GROUP BY 1),
            c AS (SELECT *,
                         SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                                        ROWS UNBOUNDED PRECEDING)
                             AS cum,
                         SUM(rev) OVER () AS tot
                  FROM r)
            SELECT l_partkey, rev,
                   CASE WHEN cum*5 <= tot*4 THEN 'A'
                        WHEN cum*20 <= tot*19 THEN 'B'
                        ELSE 'C' END AS cls
            FROM c ORDER BY l_partkey
        """,
        "user_daily_locf": """
            WITH e0 AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                               CAST(FLOOR(value*100) AS BIGINT) AS cents
                        FROM events),
            e AS (SELECT user_id, ts_us,
                         arg_max(cents, event_id) AS cents
                  FROM e0 GROUP BY 1, 2),
            rng AS (SELECT MIN(ts_us)//86400000000 AS mn,
                           MAX(ts_us)//86400000000 AS mx FROM e0),
            days AS (SELECT unnest(generate_series(mn, mx)) AS day_id
                     FROM rng),
            u AS (SELECT DISTINCT user_id FROM e0),
            g AS (SELECT user_id, day_id,
                         (day_id+1)*86400000000 AS de
                  FROM u CROSS JOIN days)
            SELECT g.user_id, CAST(g.day_id AS BIGINT) AS day_id,
                   CAST(e.cents AS BIGINT) AS cents_locf
            FROM g ASOF JOIN e
              ON g.user_id = e.user_id AND e.ts_us < g.de
            ORDER BY g.user_id, g.day_id
        """,
        "order_concentration": """
            WITH l AS (SELECT l_orderkey,
                              CAST(FLOOR(l_extendedprice
                                         *(1-l_discount)*100)
                                   AS BIGINT) AS rev
                       FROM lineitem),
            o AS (SELECT l_orderkey, SUM(rev) AS tot, MAX(rev) AS mx
                  FROM l GROUP BY 1)
            SELECT CAST(((mx*10000)//tot)//1000 AS BIGINT)
                       AS bps_bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM o GROUP BY 1 ORDER BY 1
        """,
        "events_quantiles_by_type": """
            WITH c AS (SELECT event_type,
                              CAST(FLOOR(value*100) AS BIGINT) AS cents
                       FROM events)
            SELECT event_type,
                   CAST(quantile_disc(cents, 0.25) AS BIGINT)
                       AS p25_cents,
                   CAST(quantile_disc(cents, 0.50) AS BIGINT)
                       AS p50_cents,
                   CAST(quantile_disc(cents, 0.75) AS BIGINT)
                       AS p75_cents,
                   CAST(quantile_disc(cents, 0.90) AS BIGINT)
                       AS p90_cents
            FROM c GROUP BY event_type ORDER BY event_type
        """,
        "customer_order_gap_median": """
            WITH o AS (SELECT o_custkey,
                              epoch_us(o_orderdate) AS d, o_orderkey
                       FROM orders),
            l AS (SELECT o_custkey,
                         (LEAD(d) OVER (PARTITION BY o_custkey
                                        ORDER BY d, o_orderkey)
                          - d)//86400000000 AS gap
                  FROM o)
            SELECT o_custkey,
                   CAST(quantile_disc(gap, 0.5) AS BIGINT)
                       AS median_gap_days,
                   CAST(COUNT(*) AS BIGINT) AS n_gaps
            FROM l WHERE gap IS NOT NULL
            GROUP BY o_custkey ORDER BY o_custkey
        """,
        "events_burst_max": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us
                       FROM events),
            w AS (SELECT user_id,
                         COUNT(*) OVER (PARTITION BY user_id
                                        ORDER BY ts_us
                                        RANGE BETWEEN CURRENT ROW
                                        AND 3600000000 FOLLOWING)
                             AS cnt
                  FROM e)
            SELECT user_id, CAST(MAX(cnt) AS BIGINT) AS max_burst,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM w GROUP BY user_id ORDER BY user_id
        """,
        "events_autocorr_lag1": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                              CAST(FLOOR(value*100) AS BIGINT) AS c
                       FROM events),
            p AS (SELECT user_id, c AS x,
                         LEAD(c) OVER (PARTITION BY user_id
                                       ORDER BY ts_us, event_id) AS y
                  FROM e),
            m AS (SELECT user_id,
                         CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(x) AS BIGINT) AS sx,
                         CAST(SUM(y) AS BIGINT) AS sy,
                         CAST(SUM(x*y) AS BIGINT) AS sxy,
                         CAST(SUM(x*x) AS BIGINT) AS sxx,
                         CAST(SUM(y*y) AS BIGINT) AS syy
                  FROM p WHERE y IS NOT NULL GROUP BY user_id)
            SELECT user_id, n AS n_pairs,
                   CAST(FLOOR(
                     (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                     / (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                        * sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))
                     * 1000.0) AS BIGINT) AS ac1_milli
            FROM m
            WHERE n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
            ORDER BY user_id
        """,
        "fk_orphan_audit": """
            WITH e AS (
              SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS edge,
                     CAST(SUM(CASE WHEN o.o_orderkey IS NULL
                                   THEN 1 ELSE 0 END) AS BIGINT)
                         AS n_orphans,
                     CAST(COUNT(*) AS BIGINT) AS n_child
              FROM lineitem l LEFT JOIN orders o
                ON l.l_orderkey = o.o_orderkey
              UNION ALL
              SELECT 'lineitem.l_partkey->part.p_partkey',
                     CAST(SUM(CASE WHEN p.p_partkey IS NULL
                                   THEN 1 ELSE 0 END) AS BIGINT),
                     CAST(COUNT(*) AS BIGINT)
              FROM lineitem l LEFT JOIN part p
                ON l.l_partkey = p.p_partkey
              UNION ALL
              SELECT 'lineitem.l_suppkey->supplier.s_suppkey',
                     CAST(SUM(CASE WHEN s.s_suppkey IS NULL
                                   THEN 1 ELSE 0 END) AS BIGINT),
                     CAST(COUNT(*) AS BIGINT)
              FROM lineitem l LEFT JOIN supplier s
                ON l.l_suppkey = s.s_suppkey
              UNION ALL
              SELECT 'orders.o_custkey->customer.c_custkey',
                     CAST(SUM(CASE WHEN c.c_custkey IS NULL
                                   THEN 1 ELSE 0 END) AS BIGINT),
                     CAST(COUNT(*) AS BIGINT)
              FROM orders o LEFT JOIN customer c
                ON o.o_custkey = c.c_custkey
              UNION ALL
              SELECT 'customer.c_nationkey->nation.n_nationkey',
                     CAST(SUM(CASE WHEN n.n_nationkey IS NULL
                                   THEN 1 ELSE 0 END) AS BIGINT),
                     CAST(COUNT(*) AS BIGINT)
              FROM customer c LEFT JOIN nation n
                ON c.c_nationkey = n.n_nationkey
              UNION ALL
              SELECT 'supplier.s_nationkey->nation.n_nationkey',
                     CAST(SUM(CASE WHEN n.n_nationkey IS NULL
                                   THEN 1 ELSE 0 END) AS BIGINT),
                     CAST(COUNT(*) AS BIGINT)
              FROM supplier s LEFT JOIN nation n
                ON s.s_nationkey = n.n_nationkey
              UNION ALL
              SELECT 'nation.n_regionkey->region.r_regionkey',
                     CAST(SUM(CASE WHEN r.r_regionkey IS NULL
                                   THEN 1 ELSE 0 END) AS BIGINT),
                     CAST(COUNT(*) AS BIGINT)
              FROM nation n LEFT JOIN region r
                ON n.n_regionkey = r.r_regionkey)
            SELECT * FROM e ORDER BY edge
        """,
        "docs_trigram_novelty": """
            WITH g AS (
              SELECT DISTINCT doc_id,
                     substring(text, CAST(s AS INTEGER), 3) AS gram
              FROM (SELECT doc_id, text,
                           unnest(generate_series(
                               1, CAST(n_chars-2 AS BIGINT))) AS s
                    FROM documents)),
            m AS (SELECT gram, MIN(doc_id) AS first_doc
                  FROM g GROUP BY gram)
            SELECT g.doc_id,
                   CAST(SUM(CASE WHEN m.first_doc = g.doc_id
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS novel_grams,
                   CAST(COUNT(*) AS BIGINT) AS distinct_grams
            FROM g JOIN m USING (gram)
            GROUP BY g.doc_id ORDER BY g.doc_id
        """,
        "part_substitutes": """
            WITH p AS (SELECT p_partkey, p_type, p_size,
                              CAST(FLOOR(p_retailprice*100) AS BIGINT)
                                  AS cents
                       FROM part)
            SELECT a.p_partkey AS p1, b.p_partkey AS p2,
                   a.cents AS c1, b.cents AS c2
            FROM p a JOIN p b
              ON a.p_type = b.p_type AND a.p_size = b.p_size
             AND a.p_partkey < b.p_partkey
             AND ABS(a.cents - b.cents)*10 <= LEAST(a.cents, b.cents)
            ORDER BY p1, p2
        """,
        "dau_wau": """
            WITH e AS (SELECT DISTINCT user_id,
                              epoch_us(ts)//86400000000 AS day
                       FROM events),
            rng AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM e),
            days AS (SELECT unnest(generate_series(mn, mx)) AS day_id
                     FROM rng),
            dau AS (SELECT day AS day_id,
                           COUNT(DISTINCT user_id) AS dau
                    FROM e GROUP BY 1),
            wau AS (SELECT d.day_id, COUNT(DISTINCT e.user_id) AS wau
                    FROM days d JOIN e
                      ON e.day BETWEEN d.day_id - 6 AND d.day_id
                    GROUP BY 1)
            SELECT CAST(d.day_id AS BIGINT) AS day_id,
                   CAST(COALESCE(dau.dau, 0) AS BIGINT) AS dau,
                   CAST(COALESCE(wau.wau, 0) AS BIGINT) AS wau,
                   CAST(CASE WHEN COALESCE(wau.wau, 0) > 0
                             THEN (COALESCE(dau.dau, 0)*1000)
                                  //wau.wau
                             ELSE 0 END AS BIGINT)
                       AS stickiness_milli
            FROM days d
            LEFT JOIN dau USING (day_id) LEFT JOIN wau USING (day_id)
            ORDER BY day_id
        """,
        "user_feature_matrix": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                              CAST(FLOOR(value*100) AS BIGINT) AS cents
                       FROM events),
            base AS (SELECT user_id,
                            CAST(COUNT(*) AS BIGINT) AS n_events,
                            CAST(SUM(cents) AS BIGINT) AS sum_cents,
                            CAST(last(cents ORDER BY ts_us, event_id)
                                 - first(cents ORDER BY ts_us, event_id)
                                 AS BIGINT) AS delta_cents
                     FROM e GROUP BY user_id),
            iv AS (SELECT user_id, ts_us AS s,
                          ts_us + cents*1000000 AS en FROM e),
            mx AS (SELECT user_id, s, en,
                          MAX(en) OVER (PARTITION BY user_id
                                        ORDER BY s, en
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND 1 PRECEDING) AS pm
                   FROM iv),
            isl AS (SELECT user_id, s, en,
                           SUM(CASE WHEN pm IS NULL OR s > pm
                                    THEN 1 ELSE 0 END)
                               OVER (PARTITION BY user_id
                                     ORDER BY s, en
                                     ROWS UNBOUNDED PRECEDING) AS isle
                    FROM mx),
            act AS (SELECT user_id,
                           CAST(SUM(cov) AS BIGINT) AS active_us,
                           CAST(COUNT(*) AS BIGINT) AS n_islands
                    FROM (SELECT user_id, isle,
                                 MAX(en) - MIN(s) AS cov
                          FROM isl GROUP BY user_id, isle)
                    GROUP BY user_id),
            bw AS (SELECT user_id,
                          COUNT(*) OVER (PARTITION BY user_id
                                         ORDER BY ts_us
                                         RANGE BETWEEN CURRENT ROW
                                         AND 3600000000 FOLLOWING)
                              AS cnt
                   FROM e),
            burst AS (SELECT user_id,
                             CAST(MAX(cnt) AS BIGINT) AS max_burst
                      FROM bw GROUP BY user_id),
            gp AS (SELECT user_id,
                          (ts_us - LAG(ts_us) OVER w)//1000000 AS gap,
                          cents, LAG(cents) OVER w AS pc
                   FROM e
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts_us, event_id)),
            med AS (SELECT user_id,
                           CAST(quantile_disc(gap, 0.5) AS BIGINT)
                               AS median_gap_sec
                    FROM gp WHERE gap IS NOT NULL GROUP BY user_id),
            mom AS (SELECT user_id,
                           CAST(COUNT(*) AS BIGINT) AS n,
                           CAST(SUM(pc) AS BIGINT) AS sx,
                           CAST(SUM(cents) AS BIGINT) AS sy,
                           CAST(SUM(pc*cents) AS BIGINT) AS sxy,
                           CAST(SUM(pc*pc) AS BIGINT) AS sxx,
                           CAST(SUM(cents*cents) AS BIGINT) AS syy
                    FROM gp WHERE pc IS NOT NULL GROUP BY user_id),
            ac AS (SELECT user_id,
                          CASE WHEN n*sxx - sx*sx > 0
                               AND n*syy - sy*sy > 0 THEN
                            CAST(FLOOR(
                              (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                               - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                              / (sqrt(CAST(n AS DOUBLE)
                                      *CAST(sxx AS DOUBLE)
                                      - CAST(sx AS DOUBLE)
                                        *CAST(sx AS DOUBLE))
                                 * sqrt(CAST(n AS DOUBLE)
                                        *CAST(syy AS DOUBLE)
                                        - CAST(sy AS DOUBLE)
                                          *CAST(sy AS DOUBLE)))
                              * 1000.0) AS BIGINT)
                          ELSE 0 END AS ac1_milli
                   FROM mom)
            SELECT b.user_id, n_events, sum_cents, delta_cents,
                   active_us, n_islands, max_burst,
                   CAST(COALESCE(med.median_gap_sec, 0) AS BIGINT)
                       AS median_gap_sec,
                   CAST(COALESCE(ac.ac1_milli, 0) AS BIGINT)
                       AS ac1_milli
            FROM base b
            JOIN act USING (user_id) JOIN burst USING (user_id)
            LEFT JOIN med USING (user_id) LEFT JOIN ac USING (user_id)
            ORDER BY b.user_id
        """,
        "orders_daily_trend": """
            WITH d AS (SELECT epoch_us(o_orderdate)//86400000000
                                  AS day_id,
                              CAST(FLOOR(o_totalprice*100) AS BIGINT)
                                  AS cents
                       FROM orders),
            r AS (SELECT day_id,
                         CAST(SUM(cents) AS BIGINT) AS total_cents,
                         CAST(COUNT(*) AS BIGINT) AS n_orders
                  FROM d GROUP BY 1),
            rng AS (SELECT MIN(day_id) AS mn, MAX(day_id) AS mx FROM r),
            grid AS (SELECT unnest(generate_series(mn, mx)) AS day_id
                     FROM rng),
            g AS (SELECT grid.day_id,
                         COALESCE(total_cents, 0) AS total_cents,
                         COALESCE(n_orders, 0) AS n_orders
                  FROM grid LEFT JOIN r USING (day_id))
            SELECT CAST(day_id AS BIGINT) AS day_id,
                   CAST(total_cents AS BIGINT) AS total_cents,
                   CAST(n_orders AS BIGINT) AS n_orders,
                   CAST(SUM(total_cents) OVER w AS BIGINT)
                       AS win7_cents,
                   CAST(COUNT(*) OVER w AS BIGINT) AS win7_days
            FROM g
            WINDOW w AS (ORDER BY day_id
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
            ORDER BY day_id
        """,
        "order_ship_lag_hist": """
            WITH l AS (SELECT l_orderkey,
                              MIN(epoch_us(l_shipdate)) AS ship_us
                       FROM lineitem GROUP BY 1),
            o AS (SELECT o_orderkey, epoch_us(o_orderdate) AS o_us,
                         o_orderpriority
                  FROM orders)
            SELECT o_orderpriority,
                   CAST(GREATEST((ship_us - o_us)//86400000000, 0)//7
                        AS BIGINT) AS lag_week,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM o JOIN l ON o.o_orderkey = l.l_orderkey
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "embedding_sim_hist": """
            WITH s AS (SELECT vec_id, embedding FROM embeddings
                       WHERE vec_id % 17 = 0),
            e AS (SELECT vec_id,
                         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)
                                    *1000.0) AS BIGINT) AS iv,
                         unnest(generate_series(1, len(embedding)))
                             AS dim
                  FROM s),
            n AS (SELECT vec_id, SUM(iv*iv) AS nrm FROM e GROUP BY 1),
            d AS (SELECT a.vec_id AS va, b.vec_id AS vb,
                         CAST(SUM(a.iv*b.iv) AS BIGINT) AS dot
                  FROM e a JOIN e b
                    ON a.dim = b.dim AND a.vec_id < b.vec_id
                  GROUP BY 1, 2)
            SELECT va, vb,
                   CAST(FLOOR(CAST(dot AS DOUBLE)
                              / (sqrt(CAST(na.nrm AS DOUBLE))
                                 * sqrt(CAST(nb.nrm AS DOUBLE)))
                              * 10000.0) AS BIGINT) AS sim_bps
            FROM d
            JOIN n na ON na.vec_id = d.va
            JOIN n nb ON nb.vec_id = d.vb
            ORDER BY va, vb
        """,
        "lineitem_benford": """
            WITH r AS (SELECT CAST(FLOOR(l_extendedprice
                                         *(1-l_discount)*100)
                                   AS BIGINT) AS rev
                       FROM lineitem),
            d AS (SELECT CAST(substring(CAST(rev AS VARCHAR), 1, 1)
                              AS BIGINT) AS digit
                  FROM r WHERE rev > 0)
            SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
            FROM d GROUP BY digit ORDER BY digit
        """,
        "customer_revenue_inequality": """
            WITH r AS (SELECT o_custkey,
                              CAST(SUM(CAST(FLOOR(o_totalprice*100)
                                            AS BIGINT)) AS BIGINT)
                                  AS rev
                       FROM orders GROUP BY 1),
            s AS (SELECT rev,
                         ROW_NUMBER() OVER (ORDER BY rev, o_custkey)
                             AS i,
                         COUNT(*) OVER () AS n,
                         SUM(rev) OVER () AS tot
                  FROM r),
            g AS (SELECT MAX(n) AS n, MAX(tot) AS tot,
                         SUM(CAST(i AS HUGEINT)*rev) AS srx
                  FROM s)
            SELECT CAST(n AS BIGINT) AS n_customers,
                   CAST(tot AS BIGINT) AS total_cents,
                   CAST((2*srx - (CAST(n AS HUGEINT)+1)*tot) * 1000000
                        // (CAST(n AS HUGEINT)*tot) AS BIGINT)
                       AS gini_e6,
                   (SELECT CAST(SUM(CAST(rev AS HUGEINT))*10000
                                // MAX(CAST(tot AS HUGEINT)) AS BIGINT)
                    FROM s WHERE i > n - (n+9)//10) AS top10_share_bps
            FROM g
        """,
        "orders_priority_drift": """
            WITH c AS (SELECT epoch_us(o_orderdate)//86400000000//30
                                  AS month_id,
                              o_orderpriority AS prio
                       FROM orders),
            o AS (SELECT month_id, prio,
                         CAST(COUNT(*) AS BIGINT) AS n
                  FROM c GROUP BY 1, 2),
            nm AS (SELECT month_id, SUM(n) AS n_m FROM o GROUP BY 1),
            cp AS (SELECT prio, SUM(n) AS c_p FROM o GROUP BY 1),
            tot AS (SELECT SUM(n) AS big_n FROM o),
            cell AS (SELECT o.month_id,
                            ((CAST(big_n AS HUGEINT)*n
                              - CAST(n_m AS HUGEINT)*c_p)
                             * (CAST(big_n AS HUGEINT)*n
                                - CAST(n_m AS HUGEINT)*c_p)
                             * 1000000)
                            // (CAST(big_n AS HUGEINT)*n_m*c_p)
                                AS contrib
                     FROM o JOIN nm USING (month_id)
                     JOIN cp USING (prio), tot)
            SELECT CAST(cell.month_id AS BIGINT) AS month_id,
                   CAST(SUM(contrib) AS BIGINT) AS chi2_micro,
                   CAST(MAX(n_m) AS BIGINT) AS n_orders
            FROM cell JOIN nm USING (month_id)
            GROUP BY cell.month_id ORDER BY month_id
        """,
        "supplier_hhi": """
            WITH b AS (SELECT s_nationkey AS nation,
                              GREATEST(CAST(FLOOR(s_acctbal*100)
                                            AS BIGINT), 0) AS bal
                       FROM supplier)
            SELECT CAST(nation AS BIGINT) AS nation,
                   CAST(COUNT(*) AS BIGINT) AS n_suppliers,
                   CAST(CASE WHEN SUM(bal) > 0 THEN
                          SUM(CAST(bal AS HUGEINT)*bal)*100000000
                          // (SUM(CAST(bal AS HUGEINT))
                              * SUM(CAST(bal AS HUGEINT)))
                        ELSE 0 END AS BIGINT) AS hhi_e8
            FROM b GROUP BY nation ORDER BY nation
        """,
        "click_to_purchase_latency": """
            WITH c AS (SELECT user_id, MIN(epoch_us(ts)) AS cts
                       FROM events WHERE event_type = 'click'
                       GROUP BY 1),
            p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS pts
                  FROM events e JOIN c ON e.user_id = c.user_id
                  WHERE e.event_type = 'purchase'
                    AND epoch_us(e.ts) >= c.cts
                  GROUP BY 1)
            SELECT c.user_id,
                   CAST((pts - cts)//1000000 AS BIGINT) AS latency_sec
            FROM c JOIN p USING (user_id) ORDER BY user_id
        """,
        "event_type_overlap": """
            WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM d a JOIN d b
              ON a.user_id = b.user_id
             AND a.event_type <= b.event_type
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "events_daily_acf": """
            WITH d AS (SELECT epoch_us(ts)//86400000000 AS day_id,
                              CAST(FLOOR(value*100) AS BIGINT) AS cents
                       FROM events),
            r AS (SELECT day_id, CAST(SUM(cents) AS BIGINT) AS tot
                  FROM d GROUP BY 1),
            rng AS (SELECT MIN(day_id) AS mn, MAX(day_id) AS mx FROM r),
            grid AS (SELECT unnest(generate_series(mn, mx)) AS day_id
                     FROM rng),
            g AS (SELECT grid.day_id, COALESCE(tot, 0) AS tot
                  FROM grid LEFT JOIN r USING (day_id)),
            lags AS (SELECT unnest(generate_series(1, 7)) AS lag),
            p AS (SELECT l.lag, a.tot AS x, b.tot AS y
                  FROM lags l
                  JOIN g a ON true
                  JOIN g b ON b.day_id = a.day_id + l.lag),
            m AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(x) AS BIGINT) AS sx,
                         CAST(SUM(y) AS BIGINT) AS sy,
                         CAST(SUM(x*y) AS BIGINT) AS sxy,
                         CAST(SUM(x*x) AS BIGINT) AS sxx,
                         CAST(SUM(y*y) AS BIGINT) AS syy
                  FROM p GROUP BY lag)
            SELECT CAST(lag AS BIGINT) AS lag, n AS n_pairs,
                   CAST(CASE WHEN n*sxx - sx*sx > 0
                             AND n*syy - sy*sy > 0 THEN
                     FLOOR((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                           / (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                                   - CAST(sx AS DOUBLE)
                                     *CAST(sx AS DOUBLE))
                              * sqrt(CAST(n AS DOUBLE)
                                     *CAST(syy AS DOUBLE)
                                     - CAST(sy AS DOUBLE)
                                       *CAST(sy AS DOUBLE)))
                           * 1000.0)
                   ELSE 0 END AS BIGINT) AS acf_milli
            FROM m ORDER BY lag
        """,
        "source_vocab_overlap": """
            WITH u AS (SELECT source,
                              unnest(string_split(text, ' ')) AS tok
                       FROM documents),
            d AS (SELECT DISTINCT source, tok FROM u WHERE tok <> '')
            SELECT a.source AS src_a, b.source AS src_b,
                   CAST(COUNT(*) AS BIGINT) AS n_common
            FROM d a JOIN d b
              ON a.tok = b.tok AND a.source <= b.source
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "event_transition_probs": """
            WITH s AS (
              SELECT event_type,
                     LAG(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id)
                         AS prev_type
              FROM events),
            c AS (SELECT prev_type AS from_type, event_type AS to_type,
                         CAST(COUNT(*) AS BIGINT) AS n
                  FROM s WHERE prev_type IS NOT NULL
                  GROUP BY 1, 2)
            SELECT from_type, to_type, n,
                   CAST(n*10000 // SUM(n) OVER (PARTITION BY from_type)
                        AS BIGINT) AS p_bps
            FROM c ORDER BY from_type, to_type
        """,
        "events_systematic_sample": """
            WITH r AS (
              SELECT event_id,
                     CAST(FLOOR(value*100) AS BIGINT) AS cents,
                     ROW_NUMBER() OVER (
                         ORDER BY CAST(FLOOR(value*100) AS BIGINT),
                                  event_id) - 1 AS global_rank
              FROM events)
            SELECT event_id, cents,
                   CAST(global_rank AS BIGINT) AS global_rank
            FROM r WHERE global_rank % 97 = 0 ORDER BY global_rank
        """,
        "user_value_cusum": """
            WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                              CAST(FLOOR(value*100) AS BIGINT) AS cents
                       FROM events),
            p AS (SELECT event_id, user_id, ts_us,
                         SUM(cents - 2500) OVER (
                             PARTITION BY user_id
                             ORDER BY ts_us, event_id
                             ROWS UNBOUNDED PRECEDING) AS p
                  FROM e),
            m AS (SELECT event_id,
                         p - LEAST(MIN(p) OVER (
                                 PARTITION BY user_id
                                 ORDER BY ts_us, event_id
                                 ROWS UNBOUNDED PRECEDING), 0) AS s
                  FROM p)
            SELECT event_id, CAST(s AS BIGINT) AS cusum_cents,
                   CAST(CASE WHEN s > 50000 THEN 1 ELSE 0 END
                        AS BIGINT) AS alarm
            FROM m ORDER BY event_id
        """,
        "purchase_attribution": """
            WITH p AS (SELECT event_id AS pid, user_id, ts,
                              CAST(FLOOR(value*100) AS BIGINT) AS cents
                       FROM events WHERE event_type = 'purchase'),
                 c AS (SELECT event_id AS cid, user_id, ts
                       FROM events WHERE event_type = 'click'),
                 j AS (SELECT c.cid, c.user_id, p.cents,
                              COUNT(*) OVER (PARTITION BY p.pid) AS n
                       FROM p JOIN c ON c.user_id = p.user_id
                            AND c.ts >= p.ts - INTERVAL 7 DAY
                            AND c.ts < p.ts)
            SELECT cid AS click_id, user_id,
                   CAST(SUM(cents * 1000000 // n) AS BIGINT)
                       AS attributed_micros
            FROM j GROUP BY cid, user_id
        """,
        "docs_split_assign": """
            WITH s AS (
              SELECT lang, n_chars,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                          1, 15)) AS UBIGINT) % 100 AS r
              FROM documents)
            SELECT lang,
                   CASE WHEN r < 90 THEN 'train'
                        WHEN r < 95 THEN 'valid'
                        ELSE 'test' END AS split,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM s GROUP BY 1, 2
        """,
        "docs_mixture_sample": """
            WITH r AS (
              SELECT source, n_chars,
                     SUM(n_chars) OVER (
                       PARTITION BY source
                       ORDER BY CAST(('0x' || substr(
                                 md5(CAST(doc_id AS VARCHAR)), 1, 15))
                                 AS UBIGINT), doc_id
                       ROWS UNBOUNDED PRECEDING) AS run
              FROM documents)
            SELECT source,
                   CAST(SUM(CASE WHEN run <= 4000 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_docs_kept,
                   CAST(SUM(CASE WHEN run <= 4000 THEN n_chars
                                 ELSE 0 END) AS BIGINT) AS chars_kept,
                   CAST(COUNT(*) AS BIGINT) AS n_docs_total,
                   CAST(SUM(n_chars) AS BIGINT) AS chars_total
            FROM r GROUP BY source
        """,
        "q12_shipmode_priority": """
            SELECT l_returnflag,
                   CAST(SUM(CASE WHEN o_orderpriority IN
                                      ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS high_line_count,
                   CAST(SUM(CASE WHEN o_orderpriority NOT IN
                                      ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS low_line_count
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE l_returnflag IN ('A', 'R')
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_returnflag
            ORDER BY l_returnflag
        """,
        "q11_important_parts": """
            WITH vals AS (
              SELECT l_partkey AS p,
                     CAST(SUM(CAST(FLOOR(l_extendedprice*100) AS BIGINT))
                          AS BIGINT) AS v
              FROM lineitem
              JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = 3
              GROUP BY 1),
            tot AS (SELECT CAST(SUM(v) AS BIGINT) AS t FROM vals)
            SELECT CAST(p AS BIGINT) AS p_partkey, v AS value_cents
            FROM vals, tot
            WHERE v * 1000000 > t * 2000
            ORDER BY value_cents DESC, p_partkey
        """,
        "q16_supplier_breadth": """
            SELECT p_brand, p_type,
                   CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)
                       AS supplier_cnt
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            WHERE s_acctbal >= 0
            GROUP BY p_brand, p_type
            ORDER BY p_brand, p_type
        """,
        "q20_dominant_suppliers": """
            WITH ps AS (
              SELECT l_partkey AS p, l_suppkey AS s,
                     CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
              FROM lineitem GROUP BY 1, 2),
            tot AS (SELECT p, CAST(SUM(q) AS BIGINT) AS tq
                    FROM ps GROUP BY p)
            SELECT DISTINCT CAST(ps.s AS BIGINT) AS s_suppkey,
                   supplier.s_name AS s_name
            FROM ps JOIN tot ON ps.p = tot.p
            JOIN supplier ON supplier.s_suppkey = ps.s
            WHERE 5 * ps.q > tot.tq
            ORDER BY s_suppkey
        """,
        "returnflag_revenue_salted": """
            SELECT l_returnflag,
                   CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)
                        *100) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_lines
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "events_daily_gapfill": """
            WITH obs AS (
              SELECT event_type,
                     CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2),
            dense AS (
              SELECT t.event_type, d.day
              FROM (SELECT DISTINCT event_type FROM obs) t,
                   (SELECT unnest(generate_series(
                        (SELECT MIN(day) FROM obs),
                        (SELECT MAX(day) FROM obs))) AS day) d)
            SELECT dense.event_type, dense.day,
                   CAST(COALESCE(obs.n, 0) AS BIGINT) AS n
            FROM dense LEFT JOIN obs
              ON dense.event_type = obs.event_type
             AND dense.day = obs.day
            ORDER BY dense.event_type, dense.day
        """,
        "lineitem_profile": """
            SELECT * FROM (
              SELECT 'l_quantity' AS "column",
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT)
                         AS n_null,
                     CAST(COUNT(DISTINCT l_quantity) AS BIGINT)
                         AS n_distinct,
                     CAST(MIN(l_quantity) AS DOUBLE) AS min_v,
                     CAST(MAX(l_quantity) AS DOUBLE) AS max_v
              FROM lineitem
              UNION ALL
              SELECT 'l_extendedprice', CAST(COUNT(*) AS BIGINT),
                     CAST(COUNT(*) - COUNT(l_extendedprice) AS BIGINT),
                     CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
                     CAST(MIN(l_extendedprice) AS DOUBLE),
                     CAST(MAX(l_extendedprice) AS DOUBLE)
              FROM lineitem
              UNION ALL
              SELECT 'l_discount', CAST(COUNT(*) AS BIGINT),
                     CAST(COUNT(*) - COUNT(l_discount) AS BIGINT),
                     CAST(COUNT(DISTINCT l_discount) AS BIGINT),
                     CAST(MIN(l_discount) AS DOUBLE),
                     CAST(MAX(l_discount) AS DOUBLE)
              FROM lineitem
              UNION ALL
              SELECT 'l_tax', CAST(COUNT(*) AS BIGINT),
                     CAST(COUNT(*) - COUNT(l_tax) AS BIGINT),
                     CAST(COUNT(DISTINCT l_tax) AS BIGINT),
                     CAST(MIN(l_tax) AS DOUBLE),
                     CAST(MAX(l_tax) AS DOUBLE)
              FROM lineitem)
            ORDER BY "column"
        """,
        "orders_retention_cohort": """
            WITH om AS (SELECT DISTINCT o_custkey AS c,
                               year(o_orderdate)*12
                               + month(o_orderdate) - 1 AS m
                        FROM orders),
            fm AS (SELECT c, MIN(m) AS m0 FROM om GROUP BY c)
            SELECT CAST(fm.m0 AS BIGINT) AS cohort_month,
                   CAST(om.m - fm.m0 AS BIGINT) AS months_since,
                   CAST(COUNT(DISTINCT om.c) AS BIGINT) AS n_customers
            FROM om JOIN fm ON om.c = fm.c
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "part_bfs_hops": """
            WITH RECURSIVE seq AS (
              SELECT l_orderkey, l_partkey,
                     LEAD(l_partkey) OVER (PARTITION BY l_orderkey
                         ORDER BY l_linenumber, l_partkey) AS nxt
              FROM lineitem),
            e AS (SELECT DISTINCT l_partkey AS a, nxt AS b
                  FROM seq WHERE nxt IS NOT NULL),
            und AS (SELECT a AS src, b AS dst FROM e
                    UNION SELECT b, a FROM e),
            walk(node, hops) AS (
              SELECT (SELECT MIN(src) FROM und), 0
              UNION
              SELECT u.dst, w.hops + 1
              FROM walk w JOIN und u ON u.src = w.node
              WHERE w.hops < 3)
            SELECT CAST(node AS BIGINT) AS p_partkey,
                   CAST(MIN(hops) AS BIGINT) AS hops
            FROM walk GROUP BY node ORDER BY node
        """,
        "heavy_hitter_trigrams": r"""
            WITH d AS (SELECT doc_id AS did,
                              regexp_extract_all(text, '\S+') AS l
                       FROM documents),
            t AS (SELECT did, unnest(l) AS tok,
                         unnest(range(1, len(l)+1)) AS i FROM d),
            tri AS (SELECT a.tok || ' ' || b.tok || ' ' || c.tok AS g
                    FROM t a
                    JOIN t b ON a.did = b.did AND b.i = a.i + 1
                    JOIN t c ON a.did = c.did AND c.i = a.i + 2),
            tot AS (SELECT COUNT(*) AS n FROM tri)
            SELECT g, CAST(COUNT(*) AS BIGINT) AS n
            FROM tri GROUP BY g
            HAVING COUNT(*) >= CEIL((SELECT n FROM tot) * 0.0002)
            ORDER BY n DESC, g
        """,
        "part_skyline": """
            WITH p AS (SELECT p_partkey,
                              CAST(FLOOR(p_retailprice*100) AS BIGINT)
                                  AS price_cents,
                              CAST(p_size AS BIGINT) AS p_size
                       FROM part)
            SELECT a.p_partkey, a.price_cents, a.p_size
            FROM p a
            WHERE NOT EXISTS (
              SELECT 1 FROM p b
              WHERE b.price_cents <= a.price_cents
                AND b.p_size >= a.p_size
                AND (b.price_cents < a.price_cents
                     OR b.p_size > a.p_size))
            ORDER BY a.p_partkey
        """,
        "part_pair_support": """
            WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                        FROM lineitem)
            SELECT a.p AS part_a, b.p AS part_b,
                   CAST(COUNT(*) AS BIGINT) AS support
            FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
            ORDER BY support DESC, part_a, part_b
        """,
        "customer_part_jaccard": """
            WITH pur AS (SELECT DISTINCT o.o_custkey AS c,
                                l.l_partkey AS p
                         FROM orders o
                         JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
            sz AS (SELECT c, COUNT(*) AS s FROM pur GROUP BY c),
            i AS (SELECT a.c AS cust_a, b.c AS cust_b,
                         COUNT(*) AS n_common
                  FROM pur a JOIN pur b ON a.p = b.p AND a.c < b.c
                  GROUP BY 1, 2)
            SELECT i.cust_a, i.cust_b,
                   CAST(i.n_common AS BIGINT) AS n_common,
                   CAST(i.n_common AS DOUBLE)
                       / (sa.s + sb.s - i.n_common) AS jaccard
            FROM i JOIN sz sa ON sa.c = i.cust_a
                   JOIN sz sb ON sb.c = i.cust_b
            ORDER BY jaccard DESC, i.cust_a, i.cust_b
            LIMIT 50
        """,
        "pmi_bigrams": r"""
            WITH d AS (SELECT doc_id AS did,
                              regexp_extract_all(text, '\S+') AS l
                       FROM documents),
            t AS (SELECT did, unnest(l) AS tok,
                         unnest(range(1, len(l)+1)) AS i FROM d),
            u AS (SELECT tok, COUNT(*) AS n FROM t GROUP BY tok),
            tot AS (SELECT COUNT(*) AS n FROM t),
            b AS (SELECT a.tok AS w1, c.tok AS w2, COUNT(*) AS n
                  FROM t a JOIN t c ON a.did = c.did AND c.i = a.i + 1
                  GROUP BY 1, 2)
            SELECT b.w1, b.w2, CAST(b.n AS BIGINT) AS n_pair,
                   CAST(b.n * (SELECT n FROM tot) AS DOUBLE)
                       / (u1.n * u2.n) AS lift
            FROM b JOIN u u1 ON b.w1 = u1.tok
                   JOIN u u2 ON b.w2 = u2.tok
            WHERE b.n >= 10
            ORDER BY lift DESC, b.w1, b.w2 LIMIT 50
        """,
        "events_mad_outliers": """
            WITH e AS (SELECT event_type,
                              CAST(FLOOR(value*100) AS BIGINT) AS c
                       FROM events),
            m AS (SELECT event_type,
                         CAST(2*median(c) AS BIGINT) AS med2
                  FROM e GROUP BY 1),
            d AS (SELECT e.event_type, m.med2,
                         ABS(2*e.c - m.med2) AS dev
                  FROM e JOIN m USING (event_type)),
            md AS (SELECT event_type,
                          CAST(2*median(dev) AS BIGINT) AS mad4
                   FROM d GROUP BY 1)
            SELECT d.event_type,
                   ANY_VALUE(d.med2) AS med2_cents,
                   ANY_VALUE(md.mad4) AS mad4_cents,
                   CAST(SUM(CASE WHEN 2*d.dev > 3*md.mad4
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
            FROM d JOIN md USING (event_type)
            GROUP BY d.event_type ORDER BY d.event_type
        """,
        "events_moving_sum": """
            SELECT event_id,
                   CAST(SUM(CAST(FLOOR(value*100) AS BIGINT)) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS msum_cents
            FROM events ORDER BY event_id
        """,
        "events_percentile_rank": """
            SELECT event_id,
                   CAST((RANK() OVER (
                            ORDER BY CAST(FLOOR(value*100) AS BIGINT))
                         - 1) * 10000
                        // (COUNT(*) OVER () - 1) AS BIGINT) AS pct_bp
            FROM events ORDER BY event_id
        """,
        "lineitem_corr": """
            WITH m AS (
              SELECT l_returnflag AS flag,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT))
                          AS BIGINT) AS sx,
                     CAST(SUM(CAST(FLOOR(l_extendedprice) AS BIGINT))
                          AS BIGINT) AS sy,
                     CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)
                              * CAST(FLOOR(l_extendedprice) AS BIGINT))
                          AS BIGINT) AS sxy,
                     CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)
                              * CAST(FLOOR(l_quantity) AS BIGINT))
                          AS BIGINT) AS sxx,
                     CAST(SUM(CAST(FLOOR(l_extendedprice) AS BIGINT)
                              * CAST(FLOOR(l_extendedprice) AS BIGINT))
                          AS BIGINT) AS syy
              FROM lineitem GROUP BY 1)
            SELECT flag AS l_returnflag, n,
                   CAST(FLOOR(
                     (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                     / (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                        * sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))
                     * 1000) AS BIGINT) AS corr_milli
            FROM m ORDER BY l_returnflag
        """,
        "supplier_top_parts": """
            WITH t AS (SELECT l_suppkey, l_partkey,
                              CAST(SUM(CAST(FLOOR(l_quantity)
                                            AS BIGINT)) AS BIGINT)
                                  AS total_qty
                       FROM lineitem GROUP BY 1, 2),
            r AS (SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY l_suppkey
                      ORDER BY total_qty DESC, l_partkey) AS rnk
                  FROM t)
            SELECT l_suppkey, l_partkey, total_qty,
                   CAST(rnk AS BIGINT) AS "rank"
            FROM r WHERE rnk <= 3 ORDER BY l_suppkey, rnk
        """,
        "events_nearby_count": """
            SELECT a.event_id,
                   CAST(COUNT(b.event_id) AS BIGINT) AS n_nearby
            FROM events a LEFT JOIN events b
              ON a.user_id = b.user_id
             AND b.event_id <> a.event_id
             AND ABS(epoch_us(b.ts) - epoch_us(a.ts)) <= 300000000
            GROUP BY a.event_id ORDER BY a.event_id
        """,
        "customer_rfm": """
            WITH c AS (
              SELECT o_custkey AS c_custkey,
                     CAST((SELECT MAX(CAST(o_orderdate AS DATE))
                           FROM orders)
                          - MAX(CAST(o_orderdate AS DATE)) AS BIGINT)
                         AS recency_days,
                     CAST(COUNT(*) AS BIGINT) AS n_orders,
                     CAST(SUM(CAST(FLOOR(o_totalprice*100) AS BIGINT))
                          AS BIGINT) AS spend_cents
              FROM orders GROUP BY o_custkey),
            r AS (SELECT *,
                    ROW_NUMBER() OVER (ORDER BY recency_days DESC,
                                       c_custkey) AS rr,
                    ROW_NUMBER() OVER (ORDER BY n_orders, c_custkey)
                        AS rf,
                    ROW_NUMBER() OVER (ORDER BY spend_cents, c_custkey)
                        AS rm,
                    COUNT(*) OVER () AS n
                  FROM c)
            SELECT CAST(c_custkey AS BIGINT) AS c_custkey, recency_days,
                   n_orders, spend_cents,
                   CAST(1 + (rr-1)*4//n AS BIGINT) AS r_q,
                   CAST(1 + (rf-1)*4//n AS BIGINT) AS f_q,
                   CAST(1 + (rm-1)*4//n AS BIGINT) AS m_q
            FROM r ORDER BY c_custkey
        """,
        "orders_monthly_growth": """
            WITH m AS (
              SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)
                         AS year,
                     CAST(EXTRACT(month FROM o_orderdate) AS BIGINT)
                         AS month,
                     CAST(SUM(CAST(FLOOR(o_totalprice*100) AS BIGINT))
                          AS BIGINT) AS revenue_cents
              FROM orders GROUP BY 1, 2)
            SELECT year, month, revenue_cents,
                   CAST(COALESCE(revenue_cents - LAG(revenue_cents)
                        OVER (ORDER BY year, month), 0) AS BIGINT)
                       AS mom_delta_cents
            FROM m ORDER BY year, month
        """,
        "user_top_event_type": """
            SELECT user_id, event_type AS top_type,
                   CAST(n AS BIGINT) AS n_events
            FROM (SELECT user_id, event_type, COUNT(*) AS n,
                         ROW_NUMBER() OVER (PARTITION BY user_id
                             ORDER BY COUNT(*) DESC, event_type) AS rn
                  FROM events GROUP BY user_id, event_type)
            WHERE rn = 1 ORDER BY user_id
        """,
        "user_value_running_total": """
            SELECT event_id, user_id,
                   CAST(SUM(CAST(FLOOR(value*100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS running_cents
            FROM events
        """,
        "crm_spend_reconciliation": """
            WITH crm AS (
              SELECT c_custkey AS key,
                     CAST(FLOOR(c_acctbal*100) AS BIGINT) AS acctbal_cents
              FROM customer WHERE c_acctbal >= 5000),
            sp AS (
              SELECT user_id AS key,
                     CAST(SUM(CAST(FLOOR(value*100) AS BIGINT)) AS BIGINT)
                         AS spend_cents
              FROM events GROUP BY user_id)
            SELECT CAST(COALESCE(crm.key, sp.key) AS BIGINT) AS key,
                   CAST(COALESCE(acctbal_cents, -1) AS BIGINT)
                       AS acctbal_cents,
                   CAST(COALESCE(spend_cents, -1) AS BIGINT)
                       AS spend_cents,
                   CASE WHEN crm.key IS NULL THEN 'events_only'
                        WHEN sp.key IS NULL THEN 'crm_only'
                        ELSE 'both' END AS status
            FROM crm FULL OUTER JOIN sp ON crm.key = sp.key
            ORDER BY key
        """,
        "events_value_zscore": """
            WITH m AS (
              SELECT event_type,
                     CAST(COUNT(*) AS DOUBLE) AS n,
                     CAST(SUM(CAST(FLOOR(value*100) AS BIGINT))
                          AS DOUBLE) AS s,
                     CAST(SUM(CAST(FLOOR(value*100) AS BIGINT)
                              * CAST(FLOOR(value*100) AS BIGINT))
                          AS DOUBLE) AS q
              FROM events GROUP BY event_type)
            SELECT e.event_id,
                   CAST(FLOOR(((CAST(FLOOR(e.value*100) AS BIGINT)
                                - s/n)
                       / SQRT(q/n - (s/n)*(s/n))) * 1000) AS BIGINT)
                       AS z_milli
            FROM events e JOIN m USING (event_type)
        """,
        "user_value_time_window": """
            SELECT event_id, user_id,
                   CAST(SUM(CAST(FLOOR(value*100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS win_cents
            FROM events
        """,
        "doc_posting_hashes": r"""
            WITH pairs AS (
              SELECT DISTINCT tok, doc_id FROM (
                SELECT unnest(regexp_extract_all(text, '\S+')) AS tok,
                       doc_id
                FROM documents))
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(('0x' || substr(md5(string_agg(
                       CAST(doc_id AS VARCHAR), ','
                       ORDER BY doc_id)), 1, 15)) AS UBIGINT)
                       AS posting_hash
            FROM pairs GROUP BY tok ORDER BY tok
        """,
        "q21_blocking_suppliers": """
            WITH per AS (
              SELECT l_orderkey AS o, l_suppkey AS s,
                     MAX(l_shipdate) AS ms
              FROM lineitem GROUP BY 1, 2),
            agg AS (SELECT o, MAX(ms) AS mx, COUNT(*) AS nsup
                    FROM per GROUP BY o),
            atmax AS (
              SELECT per.o, per.s FROM per JOIN agg ON per.o = agg.o
              WHERE per.ms = agg.mx AND agg.nsup >= 2),
            uniq AS (SELECT o, MIN(s) AS s FROM atmax
                     GROUP BY o HAVING COUNT(*) = 1)
            SELECT supplier.s_name AS s_name,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM uniq JOIN supplier ON supplier.s_suppkey = uniq.s
            GROUP BY supplier.s_name
            ORDER BY n_orders DESC, s_name
            LIMIT 20
        """,
        "q8_market_share": """
            WITH f AS (
              SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT)
                         AS year,
                     CAST(FLOOR(l.l_extendedprice*(1-l.l_discount)*100)
                         AS BIGINT) AS cents,
                     CASE WHEN ns.n_name = 'NATION_3' THEN 1 ELSE 0 END
                         AS frn
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN part p ON l.l_partkey = p.p_partkey
              JOIN supplier s ON l.l_suppkey = s.s_suppkey
              JOIN nation ns ON s.s_nationkey = ns.n_nationkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation nc ON c.c_nationkey = nc.n_nationkey
              JOIN region r ON nc.n_regionkey = r.r_regionkey
              WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
                AND o.o_orderdate >= TIMESTAMP '1996-01-01'
                AND o.o_orderdate < TIMESTAMP '1998-01-01')
            SELECT year,
                   CAST(SUM(CASE WHEN frn = 1 THEN cents ELSE 0 END)
                        AS BIGINT) AS nation_cents,
                   CAST(SUM(cents) AS BIGINT) AS total_cents,
                   CAST(SUM(CASE WHEN frn = 1 THEN cents ELSE 0 END)
                        * 10000 // SUM(cents) AS BIGINT) AS share_bp
            FROM f GROUP BY year
        """,
        "q9_nation_year_revenue": """
            SELECT ns.n_name AS nation,
                   CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT)
                       AS year,
                   CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1-l.l_discount)
                        *100) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation ns ON s.s_nationkey = ns.n_nationkey
            WHERE p.p_name LIKE '%widget%'
            GROUP BY 1, 2
        """,
        "events_channel_conversion_census": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_id,
                              event_type
                       FROM events),
            fp AS (SELECT user_id, ts AS pts, event_id AS pid
                   FROM (SELECT user_id, ts, event_id,
                                ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
                         FROM e WHERE event_type = 'purchase')
                   WHERE rn = 1),
            pre AS (SELECT e.user_id,
                           CASE WHEN fp.pts IS NULL
                                OR e.ts < fp.pts
                                OR (e.ts = fp.pts
                                    AND e.event_id < fp.pid)
                           THEN CASE e.event_type
                                WHEN 'click' THEN 1
                                WHEN 'error' THEN 2
                                WHEN 'signup' THEN 4
                                WHEN 'view' THEN 8 ELSE 0 END
                           ELSE 0 END AS b,
                           CASE WHEN fp.pts IS NULL THEN 0 ELSE 1 END
                               AS conv
                    FROM e LEFT JOIN fp ON e.user_id = fp.user_id),
            u AS (SELECT user_id, CAST(bit_or(b) AS BIGINT) AS mask,
                         MAX(conv) AS conv
                  FROM pre GROUP BY 1)
            SELECT mask, CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(conv) AS BIGINT) AS n_converted
            FROM u GROUP BY 1 ORDER BY 1
        """,
        "docs_chunk_straddle_loss": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '\S+')) AS tok,
                     generate_subscripts(regexp_extract_all(text,
                         '\S+'), 1) AS i
              FROM documents
            ), o AS (
              SELECT doc_id, i, LENGTH(tok) AS len,
                     COALESCE(SUM(LENGTH(tok) + 1) OVER (
                         PARTITION BY doc_id ORDER BY i
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS off
              FROM toks
            ), tri AS (
              SELECT off AS s,
                     LEAD(off, 2) OVER w + LEAD(len, 2) OVER w - 1
                         AS e
              FROM o WINDOW w AS (PARTITION BY doc_id ORDER BY i)
              QUALIFY LEAD(off, 2) OVER w IS NOT NULL
            ), l AS (
              SELECT w.window_chars,
                     CAST(COUNT(*) AS BIGINT) AS n_trigrams,
                     CAST(SUM(CASE WHEN s // w.window_chars
                              <> e // w.window_chars
                              THEN 1 ELSE 0 END) AS BIGINT)
                         AS n_straddling
              FROM tri, (SELECT unnest([128, 512]) AS window_chars) w
              GROUP BY 1
            )
            SELECT CAST(window_chars AS BIGINT) AS window_chars,
                   n_trigrams, n_straddling,
                   CAST(n_straddling * 10000 // n_trigrams AS BIGINT)
                       AS loss_bp
            FROM l ORDER BY 1
        """,
        "token_position_drift": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '\S+')) AS tok,
                     generate_subscripts(regexp_extract_all(text,
                         '\S+'), 1) - 1 AS i
              FROM documents
            ), nd AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM toks
              GROUP BY 1
            ), top AS (
              SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_total
              FROM toks GROUP BY 1
              ORDER BY n_total DESC, tok LIMIT 30
            ), pos AS (
              SELECT t.tok, (1000 * t.i) // (nd.n - 1) AS rel
              FROM toks t
              JOIN nd USING (doc_id)
              JOIN top ON top.tok = t.tok
              WHERE nd.n >= 2
            )
            SELECT top.tok, top.n_total,
                   CAST(COUNT(p.rel) AS BIGINT) AS n_positioned,
                   CAST(CASE WHEN COUNT(p.rel) > 0
                        THEN SUM(p.rel) // COUNT(p.rel)
                        ELSE 0 END AS BIGINT) AS mean_relpos_milli
            FROM top LEFT JOIN pos p ON p.tok = top.tok
            GROUP BY 1, 2 ORDER BY top.tok
        """,
        "events_self_transition_stickiness": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_id,
                              event_type
                       FROM events),
            s AS (SELECT event_type AS b,
                         LAG(event_type) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS a
                  FROM e),
            c AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
                  FROM s WHERE a IS NOT NULL GROUP BY 1, 2),
            oc AS (SELECT a, SUM(n) AS n FROM c GROUP BY 1),
            ic AS (SELECT b, SUM(n) AS n FROM c GROUP BY 1),
            tot AS (SELECT SUM(n) AS nt FROM c),
            ty AS (SELECT DISTINCT t FROM
                   (SELECT a AS t FROM oc
                    UNION ALL SELECT b FROM ic))
            SELECT ty.t AS event_type,
                   CAST(COALESCE(d.n, 0) AS BIGINT) AS n_self,
                   CAST(COALESCE(oc.n, 0) AS BIGINT) AS n_out,
                   CAST(COALESCE(ic.n, 0) AS BIGINT) AS n_in,
                   CAST(CASE WHEN COALESCE(oc.n, 0) > 0
                             AND COALESCE(ic.n, 0) > 0
                        THEN CAST(COALESCE(d.n, 0) AS HUGEINT)
                             * nt * 1000
                             // (CAST(oc.n AS HUGEINT) * ic.n)
                        ELSE 0 END AS BIGINT) AS stickiness_milli
            FROM ty
            LEFT JOIN (SELECT a, n FROM c WHERE a = b) d
                 ON d.a = ty.t
            LEFT JOIN oc ON oc.a = ty.t
            LEFT JOIN ic ON ic.b = ty.t, tot
            ORDER BY 1
        """,
        "customer_seasonal_habit": """
            WITH o AS (SELECT o_custkey AS c,
                              CAST(EXTRACT(month FROM o_orderdate)
                                   AS BIGINT) - 1 AS m
                       FROM orders),
            g AS (SELECT c, m, CAST(COUNT(*) AS BIGINT) AS k
                  FROM o GROUP BY 1, 2),
            v AS (SELECT c, k,
                         CASE m WHEN 0 THEN 1000000 WHEN 1 THEN 866025
                              WHEN 2 THEN 500000 WHEN 3 THEN 0
                              WHEN 4 THEN -500000 WHEN 5 THEN -866026
                              WHEN 6 THEN -1000000 WHEN 7 THEN -866026
                              WHEN 8 THEN -500001 WHEN 9 THEN -1
                              WHEN 10 THEN 500000 ELSE 866025 END
                             AS cx,
                         CASE m WHEN 0 THEN 0 WHEN 1 THEN 499999
                              WHEN 2 THEN 866025 WHEN 3 THEN 1000000
                              WHEN 4 THEN 866025 WHEN 5 THEN 499999
                              WHEN 6 THEN 0 WHEN 7 THEN -500000
                              WHEN 8 THEN -866026 WHEN 9 THEN -1000000
                              WHEN 10 THEN -866026 ELSE -500001 END
                             AS sy_
                  FROM g),
            r AS (SELECT c, SUM(k) AS n, SUM(k * cx) AS sx,
                         SUM(k * sy_) AS sy
                  FROM v GROUP BY 1 HAVING SUM(k) >= 3),
            b AS (SELECT CASE WHEN n <= 4 THEN '3-4'
                              WHEN n <= 8 THEN '5-8'
                              ELSE '9+' END AS band,
                         1000 * (CAST(sx AS HUGEINT) * sx
                                 + CAST(sy AS HUGEINT) * sy)
                             // (CAST(n AS HUGEINT) * n
                                 * 1000000000000) AS conc
                  FROM r)
            SELECT band, CAST(COUNT(*) AS BIGINT) AS n_customers,
                   CAST(SUM(conc) // COUNT(*) AS BIGINT)
                       AS mean_concentration_milli
            FROM b GROUP BY 1 ORDER BY 1
        """,
        "events_transition_dwell": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_id,
                              event_type
                       FROM events),
            s AS (SELECT event_type AS b,
                         LAG(event_type) OVER w AS a,
                         (ts - LAG(ts) OVER w) // 1000000 AS sec
                  FROM e WINDOW w AS (PARTITION BY user_id
                      ORDER BY ts, event_id)),
            t AS (SELECT a, b, sec FROM s WHERE a IS NOT NULL),
            r AS (SELECT a, b, sec,
                         ROW_NUMBER() OVER (PARTITION BY a, b
                             ORDER BY sec) AS rk,
                         COUNT(*) OVER (PARTITION BY a, b) AS n,
                         SUM(sec) OVER (PARTITION BY a, b) AS tot
                  FROM t)
            SELECT a AS from_type, b AS to_type,
                   CAST(MAX(n) AS BIGINT) AS n_transitions,
                   CAST((1000 * MAX(tot)) // MAX(n) AS BIGINT)
                       AS mean_gap_milli_sec,
                   CAST(MAX(CASE WHEN rk = (n + 1) // 2 THEN sec END)
                        AS BIGINT) AS p50_gap_sec
            FROM r GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "events_type_entropy_rate": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_id,
                              event_type
                       FROM events),
            s AS (SELECT event_type AS b,
                         LAG(event_type) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS a
                  FROM e),
            c AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c
                  FROM s WHERE a IS NOT NULL GROUP BY 1, 2),
            f AS (SELECT a, SUM(c) AS c FROM c GROUP BY 1),
            t AS (SELECT (SELECT SUM(c) FROM c) AS n,
                         (SELECT COUNT(*) FROM c) AS cells,
                         (SELECT SUM(CASE WHEN c > 1 THEN
                              CAST(FLOOR(c * ln(c) * 1e6) AS BIGINT)
                              ELSE 0 END) FROM f) AS sf,
                         (SELECT SUM(CASE WHEN c > 1 THEN
                              CAST(FLOOR(c * ln(c) * 1e6) AS BIGINT)
                              ELSE 0 END) FROM c) AS sp)
            SELECT CAST(n AS BIGINT) AS n_transitions,
                   CAST(cells AS BIGINT) AS n_cells,
                   CAST((sf - sp) // n AS BIGINT)
                       AS entropy_rate_micro_nats
            FROM t
        """,
        "orders_priority_inversion_audit": """
            WITH fs AS (SELECT l_orderkey AS ok,
                               MIN(epoch_us(l_shipdate)
                                   // 86400000000) AS sd
                        FROM lineitem GROUP BY 1),
            o AS (SELECT o_custkey AS c,
                         epoch_us(o_orderdate) // 86400000000 AS d,
                         o_orderpriority AS p, sd
                  FROM orders JOIN fs ON o_orderkey = fs.ok),
            pr AS (SELECT a.p AS urgent, b.p AS lax,
                          CAST(COUNT(*) AS BIGINT) AS n_pairs,
                          CAST(SUM(CASE WHEN a.sd > b.sd THEN 1
                               ELSE 0 END) AS BIGINT) AS n_inversions
                   FROM o a JOIN o b ON a.c = b.c AND a.d < b.d
                        AND a.p < b.p
                   GROUP BY 1, 2)
            SELECT urgent, lax, n_pairs, n_inversions,
                   CAST(n_inversions * 10000 // n_pairs AS BIGINT)
                       AS inversion_bp
            FROM pr ORDER BY 1, 2
        """,
        "events_median_ci_by_type": """
            WITH v AS (SELECT event_type,
                              CAST(FLOOR(value * 100) AS BIGINT)
                                  AS cents
                       FROM events),
            r AS (SELECT event_type, cents,
                         ROW_NUMBER() OVER (PARTITION BY event_type
                             ORDER BY cents) AS rk,
                         COUNT(*) OVER (PARTITION BY event_type) AS n
                  FROM v),
            k AS (SELECT event_type, MAX(n) AS n,
                         (MAX(n) + 1) // 2 AS k_med,
                         CAST(FLOOR(0.98 * sqrt(MAX(n))) AS BIGINT)
                             AS delta
                  FROM r GROUP BY 1)
            SELECT r.event_type, CAST(MAX(k.n) AS BIGINT) AS n,
                   CAST(MAX(CASE WHEN rk = k_med THEN cents END)
                        AS BIGINT) AS median_cents,
                   CAST(MAX(CASE WHEN rk = GREATEST(1, k_med - delta)
                        THEN cents END) AS BIGINT) AS ci_lo_cents,
                   CAST(MAX(CASE WHEN rk = LEAST(k.n, k_med + delta)
                        THEN cents END) AS BIGINT) AS ci_hi_cents
            FROM r JOIN k USING (event_type)
            GROUP BY 1 ORDER BY 1
        """,
        "customer_winback_census": """
            WITH o AS (SELECT o_custkey AS c,
                              epoch_us(o_orderdate) // 86400000000
                                  AS d,
                              o_orderkey AS k,
                              CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                                  AS cents
                       FROM orders),
            s AS (SELECT *, LAG(d) OVER w AS pd,
                         ROW_NUMBER() OVER w AS rn
                  FROM o WINDOW w AS (PARTITION BY c ORDER BY d, k)),
            fg AS (SELECT c, MIN(rn) AS cutrn
                   FROM s WHERE pd IS NOT NULL AND d - pd >= 180
                   GROUP BY 1),
            info AS (SELECT s.c, f.cutrn,
                            MAX(CASE WHEN rn = cutrn THEN d - pd END)
                                AS glen
                     FROM s JOIN fg f ON s.c = f.c GROUP BY 1, 2),
            agg AS (SELECT i.c,
                           CASE WHEN glen < 365 THEN '180-365'
                                ELSE '365+' END AS band,
                           SUM(CASE WHEN rn < cutrn THEN 1 ELSE 0 END)
                               AS nb,
                           SUM(CASE WHEN rn < cutrn THEN cents
                               ELSE 0 END) AS sb,
                           SUM(CASE WHEN rn >= cutrn THEN 1 ELSE 0 END)
                               AS na,
                           SUM(CASE WHEN rn >= cutrn THEN cents
                               ELSE 0 END) AS sa
                    FROM s JOIN info i ON s.c = i.c GROUP BY 1, 2),
            b AS (SELECT band, CAST(COUNT(*) AS BIGINT)
                             AS n_customers,
                         SUM(nb) AS nb, SUM(sb) AS sb,
                         SUM(na) AS na, SUM(sa) AS sa
                  FROM agg GROUP BY 1)
            SELECT band, n_customers,
                   CAST(sb // nb AS BIGINT) AS mean_before_cents,
                   CAST(sa // na AS BIGINT) AS mean_after_cents,
                   CAST(CASE WHEN sb > 0 AND na > 0 THEN
                        CASE WHEN CAST(sa AS HUGEINT) * nb
                                  - CAST(sb AS HUGEINT) * na >= 0
                             THEN (1000 * (CAST(sa AS HUGEINT) * nb
                                   - CAST(sb AS HUGEINT) * na))
                                  // (CAST(sb AS HUGEINT) * na)
                             ELSE -((1000 * (CAST(sb AS HUGEINT) * na
                                   - CAST(sa AS HUGEINT) * nb))
                                  // (CAST(sb AS HUGEINT) * na))
                        END ELSE 0 END AS BIGINT) AS uplift_milli
            FROM b ORDER BY band
        """,
        "events_percentiles": """
            SELECT event_type,
                   CAST(quantile_disc(CAST(FLOOR(value*100) AS BIGINT), 0.5)
                        AS BIGINT) AS p50_cents,
                   CAST(quantile_disc(CAST(FLOOR(value*100) AS BIGINT), 0.95)
                        AS BIGINT) AS p95_cents
            FROM events GROUP BY event_type
        """,
        "region_revenue": """
            SELECT r.r_name AS r_name,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(FLOOR(o.o_totalprice*100) AS BIGINT))
                        AS BIGINT) AS revenue_cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        """,
        "dedup_exact": """
            SELECT text,
                   CAST(MIN(doc_id) AS BIGINT) AS keep_id,
                   CAST(COUNT(*) AS BIGINT) AS n_copies
            FROM documents GROUP BY text
        """,
        "ngram_top_pairs": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '\S+')) AS tok,
                     generate_subscripts(regexp_extract_all(text, '\S+'), 1)
                         AS i
              FROM documents
            ), sh AS (
              SELECT DISTINCT doc_id,
                     tok || ' ' || lead(tok,1) OVER w || ' ' ||
                     lead(tok,2) OVER w AS shingle
              FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY i)
              QUALIFY lead(tok,2) OVER w IS NOT NULL
            ), sizes AS (
              SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
            ), pairs AS (
              SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
              FROM sh x JOIN sh y
                ON x.shingle = y.shingle AND x.doc_id < y.doc_id
              GROUP BY x.doc_id, y.doc_id
            )
            SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
                   CAST(inter AS BIGINT) AS inter,
                   CAST(sa.n + sb.n - inter AS BIGINT) AS union_n,
                   CAST((inter*10000) // (sa.n + sb.n - inter) AS BIGINT)
                       AS jaccard_bp
            FROM pairs
            JOIN sizes sa ON pairs.a = sa.doc_id
            JOIN sizes sb ON pairs.b = sb.doc_id
            ORDER BY jaccard_bp DESC, a, b LIMIT 20
        """,
        "embedding_dup_pairs": """
            SELECT * FROM (
              SELECT a.vec_id AS a, b.vec_id AS b,
                     CAST(FLOOR(list_cosine_similarity(
                         CAST(a.embedding AS DOUBLE[]),
                         CAST(b.embedding AS DOUBLE[])) * 10000) AS BIGINT)
                         AS sim_bp
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            ) WHERE sim_bp >= 4000
        """,
        "knn_bruteforce": """
            WITH q AS (SELECT vec_id, embedding FROM embeddings
                       WHERE vec_id < 10)
            SELECT query_id, neighbor_id, sim_bp FROM (
              SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                     CAST(FLOOR(list_cosine_similarity(
                         CAST(q.embedding AS DOUBLE[]),
                         CAST(e.embedding AS DOUBLE[])) * 10000) AS BIGINT)
                         AS sim_bp
              FROM q, embeddings e WHERE e.vec_id != q.vec_id
            )
            QUALIFY row_number() OVER (
                PARTITION BY query_id ORDER BY sim_bp DESC, neighbor_id) <= 5
        """,
        "text_stats": r"""
            SELECT doc_id,
                   CAST(LENGTH(text) AS BIGINT) AS n_chars_computed,
                   CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                       AS n_tokens,
                   CAST(len(regexp_extract_all(
                       text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS BIGINT)
                       AS n_wordish,
                   CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS BIGINT)
                       AS n_punct
            FROM documents
        """,
        "spans_flat": r"""
            WITH toks AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     unnest(regexp_extract_all(text, '\S+')) AS tok,
                     generate_subscripts(regexp_extract_all(text, '\S+'), 1)
                         - 1 AS span_idx
              FROM documents
            ), spans AS (
              SELECT doc_id, span_idx,
                CASE WHEN span_idx % 4 = 3 THEN 'media' ELSE 'text' END
                    AS kind,
                CASE WHEN span_idx % 4 = 3 THEN '' ELSE tok END AS text,
                CASE WHEN span_idx % 4 = 3
                     THEN 'm://' || doc_id || '/' || span_idx
                     ELSE '' END AS media_ref
              FROM toks
            )
            SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx, kind, text,
                   media_ref,
                   CAST(COALESCE(SUM(LENGTH(text) + LENGTH(media_ref)) OVER (
                       PARTITION BY doc_id ORDER BY span_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS BIGINT) AS "offset"
            FROM spans
        """,
        "spans_kind_transitions": r"""
            WITH toks AS (
              SELECT doc_id,
                     generate_subscripts(regexp_extract_all(text, '\S+'), 1)
                         - 1 AS i
              FROM documents
            ), k AS (
              SELECT doc_id, i,
                     CASE WHEN i % 4 = 3 THEN 'media' ELSE 'text' END
                         AS kind
              FROM toks
            ), p AS (
              SELECT kind AS from_kind,
                     LEAD(kind) OVER (PARTITION BY doc_id ORDER BY i)
                         AS to_kind
              FROM k
            )
            SELECT from_kind, to_kind,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(COUNT(*) * 10000
                        // SUM(COUNT(*)) OVER () AS BIGINT) AS share_bp
            FROM p WHERE to_kind IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "spans_media_density_by_lang": r"""
            WITH d AS (
              SELECT lang,
                     CAST(len(regexp_extract_all(text, '\S+'))
                          AS BIGINT) AS n
              FROM documents
            )
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n) AS BIGINT) AS n_spans,
                   CAST(SUM(n // 4) AS BIGINT) AS n_media,
                   CAST(CASE WHEN SUM(n) > 0
                        THEN SUM(n // 4) * 10000 // SUM(n)
                        ELSE 0 END AS BIGINT) AS media_share_bp
            FROM d GROUP BY 1 ORDER BY 1
        """,
        "decontaminate_docs": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '\S+')) AS tok,
                     generate_subscripts(regexp_extract_all(text, '\S+'), 1)
                         AS i
              FROM documents
            ), w AS (
              SELECT doc_id,
                     tok || ' ' || lead(tok,1) OVER win || ' ' ||
                     lead(tok,2) OVER win AS wtext
              FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY i)
              QUALIFY lead(tok,2) OVER win IS NOT NULL
            ), bench AS (
              SELECT DISTINCT wtext FROM w WHERE doc_id < 20
            )
            SELECT w.doc_id AS doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_windows,
                   CAST(SUM(CASE WHEN b.wtext IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_contaminated
            FROM w LEFT JOIN bench b ON w.wtext = b.wtext
            WHERE w.doc_id >= 20
            GROUP BY w.doc_id
        """,
        "curate_docs": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                       AS n_tokens,
                   CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS BIGINT)
                       AS n_punct
            FROM documents
            WHERE len(regexp_extract_all(text, '\S+')) >= 10
              AND len(regexp_extract_all(text, '[.!?,;:]')) <= 40
        """,
        "media_metadata": f"""
            SELECT doc_id,
                   CAST(strlen(text) AS BIGINT) AS n_bytes,
                   ['png','jpeg','webp'][CAST({md5h} % 3 AS BIGINT) + 1]
                       AS fmt,
                   CAST(64 + ({md5h} // 3) % 960 AS BIGINT) AS width,
                   CAST(64 + ({md5h} // 7) % 540 AS BIGINT) AS height
            FROM documents
        """,
        "media_features": "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        + ", ".join(
            f"CAST(CAST(('0x' || substr(md5(text), {1 + 2 * j}, 2)) AS INT)"
            f" AS BIGINT) AS f{j}" for j in range(8))
        + " FROM documents",
        "media_resized": f"""
            WITH m AS (
              SELECT doc_id, strlen(text) AS n_bytes,
                     CAST(64 + ({md5h} // 3) % 960 AS BIGINT) AS width,
                     CAST(64 + ({md5h} // 7) % 540 AS BIGINT) AS height
              FROM documents
            ), s AS (
              SELECT *, GREATEST(width, height) AS mx FROM m
            )
            SELECT doc_id, width, height,
                   CAST(CASE WHEN mx <= 256 THEN width
                        ELSE width * 256 // mx END AS BIGINT) AS out_width,
                   CAST(CASE WHEN mx <= 256 THEN height
                        ELSE height * 256 // mx END AS BIGINT) AS out_height,
                   CAST(n_bytes
                        * (CASE WHEN mx <= 256 THEN width
                           ELSE width * 256 // mx END
                           * CASE WHEN mx <= 256 THEN height
                             ELSE height * 256 // mx END)
                        // (width * height) AS BIGINT) AS n_bytes_est
            FROM s
        """,
        "user_streak_max": """
            WITH e AS (SELECT DISTINCT user_id,
                              epoch_us(ts)//86400000000 AS day
                       FROM events),
            r AS (SELECT user_id, day,
                         day - ROW_NUMBER() OVER (PARTITION BY user_id
                                                  ORDER BY day) AS isl
                  FROM e),
            runs AS (SELECT user_id, COUNT(*) AS len
                     FROM r GROUP BY user_id, isl)
            SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_days,
                   CAST(MAX(len) AS BIGINT) AS max_streak
            FROM runs GROUP BY user_id ORDER BY user_id
        """,
        "lineitem_weighted_median": """
            WITH l AS (SELECT l_returnflag,
                              CAST(FLOOR(l_extendedprice*100) AS BIGINT)
                                  AS cents,
                              CAST(FLOOR(l_quantity) AS BIGINT) AS qty
                       FROM lineitem),
            g AS (SELECT l_returnflag, cents, SUM(qty) AS w
                  FROM l GROUP BY 1, 2),
            c AS (SELECT l_returnflag, cents,
                         SUM(w) OVER (PARTITION BY l_returnflag
                                      ORDER BY cents) AS cw,
                         SUM(w) OVER (PARTITION BY l_returnflag) AS tot
                  FROM g)
            SELECT l_returnflag,
                   CAST(MIN(cents) FILTER (WHERE 2*cw >= tot) AS BIGINT)
                       AS wmedian_cents,
                   CAST(ANY_VALUE(tot) AS BIGINT) AS total_qty
            FROM c GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "part_triple_support": """
            WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                        FROM lineitem),
            t AS (SELECT a.pk AS p1, b.pk AS p2, c.pk AS p3
                  FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk < b.pk
                            JOIN lp c ON b.ok = c.ok AND b.pk < c.pk),
            s AS (SELECT p1, p2, p3, COUNT(*) AS support
                  FROM t GROUP BY 1, 2, 3)
            SELECT CAST(p1 AS BIGINT) AS p1, CAST(p2 AS BIGINT) AS p2,
                   CAST(p3 AS BIGINT) AS p3,
                   CAST(support AS BIGINT) AS support
            FROM s ORDER BY support DESC, p1, p2, p3 LIMIT 100
        """,
        "order_ship_sync_census": """
            WITH l AS (SELECT l_orderkey AS o,
                              epoch_us(l_shipdate) // 86400000000 AS d
                       FROM lineitem),
            per AS (SELECT o, CAST(COUNT(*) AS BIGINT) AS m FROM l
                    GROUP BY 1),
            sd AS (SELECT o, SUM(c * (c - 1) // 2) AS sdp
                   FROM (SELECT o, d, CAST(COUNT(*) AS BIGINT) AS c
                         FROM l GROUP BY 1, 2) GROUP BY 1)
            SELECT m, CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(m * (m - 1) // 2) AS BIGINT) AS n_pairs,
                   CAST(SUM(sdp) AS BIGINT) AS n_same_day,
                   CAST(SUM(sdp) * 10000
                        // SUM(m * (m - 1) // 2) AS BIGINT) AS sync_bp
            FROM per JOIN sd USING (o)
            WHERE m >= 2 GROUP BY 1 ORDER BY 1
        """,
        "lang_given_source_entropy": """
            WITH c AS (SELECT source, lang,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM documents GROUP BY 1, 2),
            s AS (SELECT source, SUM(c) AS n,
                         CAST(COUNT(*) AS BIGINT) AS n_langs,
                         SUM(CASE WHEN c > 1 THEN
                             CAST(FLOOR(c * ln(c) * 1e6) AS BIGINT)
                             ELSE 0 END) AS s_l
                  FROM c GROUP BY 1)
            SELECT source, CAST(n AS BIGINT) AS n_docs, n_langs,
                   CAST((CASE WHEN n > 1 THEN
                        CAST(FLOOR(n * ln(n) * 1e6) AS BIGINT)
                        ELSE 0 END - s_l) // n AS BIGINT)
                       AS h_micro_nats
            FROM s ORDER BY source
        """,
        "source_length_ks_matrix": """
            WITH c AS (SELECT source, n_chars,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM documents GROUP BY 1, 2),
            n AS (SELECT source, SUM(n) AS tot FROM c GROUP BY 1),
            cgrid AS (SELECT s.source, g.n_chars,
                             COALESCE(c.n, 0) AS n
                      FROM (SELECT DISTINCT source FROM documents) s
                      CROSS JOIN (SELECT DISTINCT n_chars
                                  FROM documents) g
                      LEFT JOIN c ON c.source = s.source
                           AND c.n_chars = g.n_chars),
            cum AS (SELECT source, n_chars,
                           SUM(n) OVER (PARTITION BY source
                               ORDER BY n_chars) AS cum
                    FROM cgrid),
            p AS (SELECT a.source AS sa, b.source AS sb,
                         na.tot AS ta, nb.tot AS tb,
                         ABS(a.cum * nb.tot - b.cum * na.tot) AS num
                  FROM cum a
                  JOIN cum b ON a.n_chars = b.n_chars
                       AND a.source < b.source
                  JOIN n na ON na.source = a.source
                  JOIN n nb ON nb.source = b.source)
            SELECT sa AS source_a, sb AS source_b,
                   CAST((1000000 * MAX(num)) // (MAX(ta) * MAX(tb))
                        AS BIGINT) AS ks_micro
            FROM p GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "order_brand_diversity_curve": """
            WITH d AS (SELECT l_orderkey AS o,
                              CAST(COUNT(*) AS BIGINT) AS m,
                              CAST(COUNT(DISTINCT p_brand) AS BIGINT)
                                  AS nb
                       FROM lineitem
                       JOIN part ON l_partkey = p_partkey
                       GROUP BY 1)
            SELECT m, CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(nb) AS BIGINT) AS sum_distinct_brands,
                   CAST(SUM(nb) * 1000 // COUNT(*) AS BIGINT)
                       AS mean_brands_milli
            FROM d GROUP BY 1 ORDER BY 1
        """,
        "source_js_divergence_matrix": r"""
            WITH tok AS (
              SELECT source, unnest(regexp_extract_all(text, '\S+'))
                  AS tok
              FROM documents
            ), c AS (
              SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
              FROM tok GROUP BY 1, 2
            ), n AS (
              SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM c
              GROUP BY 1
            ), p AS (
              SELECT a.source AS sa, a.n AS na, b.source AS sb,
                     b.n AS nb
              FROM n a, n b WHERE a.source < b.source
            ), u AS (
              SELECT DISTINCT p.sa, p.sb, p.na, p.nb, c.tok
              FROM p JOIN c ON c.source = p.sa OR c.source = p.sb
            ), t2 AS (
              SELECT u.sa, u.sb, u.na, u.nb,
                     COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb
              FROM u
              LEFT JOIN c ca ON ca.source = u.sa AND ca.tok = u.tok
              LEFT JOIN c cb ON cb.source = u.sb AND cb.tok = u.tok
            ), terms AS (
              SELECT sa, sb, MAX(na) AS na, MAX(nb) AS nb,
                     SUM(CASE WHEN ca > 0 THEN
                         CAST(FLOOR(1000000 * ca *
                             (ln(2 * ca * nb)
                              - ln(ca * nb + cb * na))) AS BIGINT)
                         ELSE 0 END) AS s_a,
                     SUM(CASE WHEN cb > 0 THEN
                         CAST(FLOOR(1000000 * cb *
                             (ln(2 * cb * na)
                              - ln(ca * nb + cb * na))) AS BIGINT)
                         ELSE 0 END) AS s_b,
                     SUM(CASE WHEN ca > 0 AND cb > 0 THEN 1
                         ELSE 0 END) AS n_common
              FROM t2 GROUP BY 1, 2
            )
            SELECT sa AS source_a, sb AS source_b,
                   CAST(n_common AS BIGINT) AS n_common,
                   CAST((s_a // na + s_b // nb) // 2 AS BIGINT)
                       AS js_micro_nats
            FROM terms ORDER BY 1, 2
        """,
        "supplier_backlog_aging": """
            WITH od AS (SELECT o_orderkey,
                               epoch_us(o_orderdate) // 86400000000
                                   AS d
                        FROM orders),
            c2 AS (SELECT COUNT(*) AS n FROM od),
            dsel AS (SELECT d AS dd FROM od ORDER BY d
                     LIMIT 1 OFFSET (SELECT (n + 1) // 2 - 1 FROM c2)),
            w AS (SELECT l_suppkey,
                         (SELECT dd FROM dsel) - od.d AS age,
                         CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                             AS cents
                  FROM lineitem l
                  JOIN od ON l.l_orderkey = od.o_orderkey
                  WHERE od.d <= (SELECT dd FROM dsel)
                    AND epoch_us(l.l_shipdate) // 86400000000
                        > (SELECT dd FROM dsel)),
            b AS (SELECT s_nationkey AS nk,
                         CASE WHEN age < 8 THEN '0-7'
                              WHEN age < 31 THEN '8-30'
                              WHEN age < 91 THEN '31-90'
                              ELSE '90+' END AS age_band,
                         cents
                  FROM w JOIN supplier ON l_suppkey = s_suppkey)
            SELECT n_name, age_band,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(cents) AS BIGINT) AS value_cents
            FROM b JOIN nation ON nk = n_nationkey
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "supplier_first_touch_share": """
            WITH f AS (SELECT l_orderkey,
                              FIRST(l_suppkey ORDER BY l_shipdate,
                                    l_suppkey, l_linenumber) AS sk
                       FROM lineitem GROUP BY 1),
            fn AS (SELECT s_nationkey AS nk,
                          CAST(COUNT(*) AS BIGINT) AS n_first
                   FROM f JOIN supplier ON sk = s_suppkey GROUP BY 1),
            ln AS (SELECT s_nationkey AS nk,
                          CAST(COUNT(*) AS BIGINT) AS n_lines
                   FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                   GROUP BY 1),
            m AS (SELECT COALESCE(fn.nk, ln.nk) AS nk,
                         COALESCE(n_first, 0) AS n_first,
                         COALESCE(n_lines, 0) AS n_lines
                  FROM fn FULL JOIN ln ON fn.nk = ln.nk),
            t AS (SELECT SUM(n_first) AS tf, SUM(n_lines) AS tl FROM m)
            SELECT n_name, n_first, n_lines,
                   CAST(n_first * 10000 // tf AS BIGINT)
                       AS first_share_bp,
                   CAST(n_lines * 10000 // tl AS BIGINT)
                       AS line_share_bp,
                   CAST(CASE WHEN n_lines > 0 AND tf > 0
                        THEN CAST(n_first AS HUGEINT) * tl * 1000
                             // (CAST(n_lines AS HUGEINT) * tf)
                        ELSE 0 END AS BIGINT) AS lift_milli
            FROM m, t JOIN nation ON nk = n_nationkey
            ORDER BY n_name
        """,
        "docs_entropy_rate_by_source": r"""
            WITH toks AS (
              SELECT source, doc_id,
                     unnest(regexp_extract_all(text, '\S+')) AS tok,
                     generate_subscripts(regexp_extract_all(text, '\S+'),
                                         1) AS i
              FROM documents
            ), tri AS (
              SELECT source,
                     tok || ' ' || lead(tok, 1) OVER win AS ctx,
                     tok || ' ' || lead(tok, 1) OVER win || ' '
                         || lead(tok, 2) OVER win AS trig
              FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY i)
              QUALIFY lead(tok, 2) OVER win IS NOT NULL
            ), cc AS (
              SELECT source, ctx, COUNT(*) AS c FROM tri GROUP BY 1, 2
            ), tc AS (
              SELECT source, trig, COUNT(*) AS c FROM tri GROUP BY 1, 2
            ), sc AS (
              SELECT source, CAST(SUM(c) AS BIGINT) AS n_trigrams,
                     CAST(COUNT(*) AS BIGINT) AS n_contexts,
                     SUM(CASE WHEN c > 1 THEN
                         CAST(FLOOR(c * ln(c) * 1e6) AS BIGINT)
                         ELSE 0 END) AS s_ctx
              FROM cc GROUP BY 1
            ), st AS (
              SELECT source,
                     CAST(COUNT(*) AS BIGINT) AS n_distinct_trigrams,
                     SUM(CASE WHEN c > 1 THEN
                         CAST(FLOOR(c * ln(c) * 1e6) AS BIGINT)
                         ELSE 0 END) AS s_tri
              FROM tc GROUP BY 1
            )
            SELECT sc.source, n_trigrams, n_contexts,
                   n_distinct_trigrams,
                   CAST((s_ctx - s_tri) // n_trigrams AS BIGINT)
                       AS entropy_rate_micro_nats
            FROM sc JOIN st USING (source) ORDER BY source
        """,
        "orders_open_backlog": """
            WITH ls AS (SELECT l_orderkey AS ok,
                               MAX(epoch_us(l_shipdate)//86400000000)
                                   AS ed
                        FROM lineitem GROUP BY 1),
            o AS (SELECT o_orderkey AS ok,
                         epoch_us(o_orderdate)//86400000000 AS sd
                  FROM orders),
            rng AS (SELECT LEAST((SELECT MIN(sd) FROM o),
                                 (SELECT MIN(ed) FROM ls)) AS mn,
                           GREATEST((SELECT MAX(sd) FROM o),
                                    (SELECT MAX(ed) FROM ls)) AS mx),
            days AS (SELECT unnest(generate_series(mn, mx)) AS day_id
                     FROM rng),
            iv AS (SELECT o.sd, ls.ed FROM o JOIN ls USING (ok))
            SELECT CAST(d.day_id AS BIGINT) AS day_id,
                   CAST(COUNT(iv.sd) AS BIGINT) AS open_orders
            FROM days d
            LEFT JOIN iv ON d.day_id BETWEEN iv.sd AND iv.ed
            GROUP BY 1 ORDER BY 1
        """,
        "events_ks_test": """
            WITH e AS (SELECT CAST(FLOOR(value*100) AS BIGINT) AS v,
                              CASE WHEN event_type = 'click'
                                   THEN 1 ELSE 0 END AS a,
                              CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END AS b
                       FROM events
                       WHERE event_type IN ('click', 'purchase')),
            g AS (SELECT v, SUM(a) AS c1, SUM(b) AS c2
                  FROM e GROUP BY v),
            c AS (SELECT v, SUM(c1) OVER (ORDER BY v) AS cum1,
                         SUM(c2) OVER (ORDER BY v) AS cum2
                  FROM g),
            n AS (SELECT SUM(a) AS n1, SUM(b) AS n2 FROM e)
            SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                   CAST(MAX(ABS(cum1*n2 - cum2*n1)) AS BIGINT) AS ks_num,
                   CAST(MAX(ABS(cum1*n2 - cum2*n1))*1000 // (n1*n2)
                        AS BIGINT) AS ks_milli
            FROM c, n GROUP BY n1, n2
        """,
        "events_mwu": """
            WITH e AS (SELECT CAST(FLOOR(value*100) AS BIGINT) AS v,
                              CASE WHEN event_type = 'click'
                                   THEN 1 ELSE 0 END AS a,
                              CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END AS b
                       FROM events
                       WHERE event_type IN ('click', 'purchase')),
            g AS (SELECT v, SUM(a) AS c1, SUM(b) AS c2
                  FROM e GROUP BY v),
            c AS (SELECT v, c1, c2,
                         COALESCE(SUM(c2) OVER (ORDER BY v
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS cl
                  FROM g),
            n AS (SELECT SUM(a) AS n1, SUM(b) AS n2 FROM e),
            u AS (SELECT SUM(c1*(2*cl + c2)) AS u1 FROM c)
            SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                   CAST(u1 AS BIGINT) AS u1_x2,
                   CAST(2*n1*n2 - u1 AS BIGINT) AS u2_x2,
                   CAST(u1*1000 // (2*n1*n2) AS BIGINT) AS auc_milli
            FROM n, u
        """,
        "events_seasonal_backtest": """
            WITH d AS (SELECT epoch_us(ts)//86400000000 AS day_id
                       FROM events),
            r AS (SELECT day_id, COUNT(*) AS n FROM d GROUP BY 1),
            rng AS (SELECT MIN(day_id) AS mn, MAX(day_id) AS mx FROM r),
            grid AS (SELECT unnest(generate_series(mn, mx)) AS day_id
                     FROM rng),
            g AS (SELECT grid.day_id, COALESCE(n, 0) AS n
                  FROM grid LEFT JOIN r USING (day_id)),
            l AS (SELECT day_id, n AS actual,
                         lag(n, 7) OVER (ORDER BY day_id) AS forecast
                  FROM g)
            SELECT CAST(day_id AS BIGINT) AS day_id,
                   CAST(actual AS BIGINT) AS actual,
                   CAST(forecast AS BIGINT) AS forecast,
                   CAST(abs(actual - forecast) AS BIGINT) AS abs_err
            FROM l WHERE forecast IS NOT NULL ORDER BY day_id
        """,
        "session_funnel_strict": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type
                       FROM events),
            lagd AS (SELECT user_id, t, event_type,
                            lag(t) OVER (PARTITION BY user_id
                                         ORDER BY t) AS pt
                     FROM e),
            brk AS (SELECT user_id, t, event_type,
                           CASE WHEN pt IS NULL OR t - pt > 1800000000
                                THEN 1 ELSE 0 END AS news FROM lagd),
            sess AS (SELECT user_id, t, event_type,
                            SUM(news) OVER (PARTITION BY user_id
                                ORDER BY t ROWS UNBOUNDED PRECEDING)
                                AS sid FROM brk),
            t1 AS (SELECT user_id, sid, MIN(t) AS t1 FROM sess
                   WHERE event_type = 'click' GROUP BY 1, 2),
            t2 AS (SELECT s.user_id, s.sid, MIN(s.t) AS t2
                   FROM sess s JOIN t1 ON s.user_id = t1.user_id
                                      AND s.sid = t1.sid
                   WHERE s.event_type = 'view' AND s.t > t1.t1
                   GROUP BY 1, 2),
            t3 AS (SELECT s.user_id, s.sid, MIN(s.t) AS t3
                   FROM sess s JOIN t2 ON s.user_id = t2.user_id
                                      AND s.sid = t2.sid
                   WHERE s.event_type = 'purchase' AND s.t > t2.t2
                   GROUP BY 1, 2),
            per AS (SELECT user_id, sid FROM sess GROUP BY 1, 2)
            SELECT CAST(per.user_id AS BIGINT) AS user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_sessions,
                   CAST(COUNT(t3.t3) AS BIGINT) AS n_funnel_sessions
            FROM per LEFT JOIN t3 ON per.user_id = t3.user_id
                                  AND per.sid = t3.sid
            GROUP BY 1 ORDER BY 1
        """,
        "lineitem_cube": """
            WITH b AS (
              SELECT l_returnflag, l_linestatus,
                     CAST(EXTRACT(year FROM l_shipdate) AS VARCHAR)
                         AS ship_year,
                     CAST(l_quantity AS BIGINT) AS qty,
                     CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                * 100) AS BIGINT) AS rev
              FROM lineitem)
            SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
                   COALESCE(l_linestatus, 'ALL') AS l_linestatus,
                   COALESCE(ship_year, 'ALL') AS ship_year,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(qty) AS BIGINT) AS sum_qty,
                   CAST(SUM(rev) AS BIGINT) AS revenue_cents
            FROM b
            GROUP BY CUBE (l_returnflag, l_linestatus, ship_year)
            ORDER BY 1, 2, 3
        """,
        "user_ab_test": """
            WITH u AS (SELECT user_id,
                              MAX(CASE WHEN event_type = 'purchase'
                                       THEN 1 ELSE 0 END) AS conv
                       FROM events GROUP BY 1),
            t AS (SELECT
                    SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                        AS n_a,
                    SUM(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END)
                        AS conv_a,
                    SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                        AS n_b,
                    SUM(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END)
                        AS conv_b
                  FROM u)
            SELECT CAST(n_a AS BIGINT) AS n_a,
                   CAST(conv_a AS BIGINT) AS conv_a,
                   CAST(conv_a * 10000 // n_a AS BIGINT) AS rate_a_bps,
                   CAST(n_b AS BIGINT) AS n_b,
                   CAST(conv_b AS BIGINT) AS conv_b,
                   CAST(conv_b * 10000 // n_b AS BIGINT) AS rate_b_bps,
                   CAST(CASE WHEN n_a = 0 OR n_b = 0
                             OR conv_a + conv_b = 0
                             OR n_a + n_b - conv_a - conv_b = 0
                        THEN 0
                        ELSE (n_a + n_b)
                             * CAST(conv_a * (n_b - conv_b)
                                    - (n_a - conv_a) * conv_b
                                    AS HUGEINT)
                             * CAST(conv_a * (n_b - conv_b)
                                    - (n_a - conv_a) * conv_b
                                    AS HUGEINT)
                             * 1000000
                             // (CAST(n_a AS HUGEINT) * n_b
                                 * (conv_a + conv_b)
                                 * (n_a + n_b - conv_a - conv_b))
                        END AS BIGINT) AS chi2_micro
            FROM t
        """,
        "user_churn_labels": """
            WITH d AS (SELECT user_id,
                              epoch_us(ts)//86400000000 AS day
                       FROM events),
            t AS (SELECT MAX(day) + 1 AS t_end FROM d),
            g AS (SELECT user_id,
                         SUM(CASE WHEN day >= t_end - 28
                                   AND day < t_end - 14
                                  THEN 1 ELSE 0 END) AS n_feat,
                         SUM(CASE WHEN day >= t_end - 14
                                  THEN 1 ELSE 0 END) AS n_lab
                  FROM d, t GROUP BY 1)
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(n_feat AS BIGINT) AS n_events_feat,
                   CAST(CASE WHEN n_lab = 0 THEN 1 ELSE 0 END
                        AS BIGINT) AS churned
            FROM g WHERE n_feat > 0 ORDER BY 1
        """,
        "events_cumulative_users": """
            WITH d AS (SELECT user_id,
                              epoch_us(ts)//86400000000 AS day
                       FROM events),
            f AS (SELECT user_id, MIN(day) AS first_day
                  FROM d GROUP BY 1),
            n AS (SELECT first_day AS day_id, COUNT(*) AS new_users
                  FROM f GROUP BY 1),
            rng AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM d),
            grid AS (SELECT unnest(generate_series(mn, mx)) AS day_id
                     FROM rng),
            g AS (SELECT grid.day_id,
                         COALESCE(new_users, 0) AS new_users
                  FROM grid LEFT JOIN n USING (day_id))
            SELECT CAST(day_id AS BIGINT) AS day_id,
                   CAST(new_users AS BIGINT) AS new_users,
                   CAST(SUM(new_users) OVER (ORDER BY day_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS cum_users
            FROM g ORDER BY day_id
        """,
        "orders_pivot_priority": """
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)
                       AS year,
                   CAST(EXTRACT(month FROM o_orderdate) AS BIGINT)
                       AS month,
                   CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_p1,
                   CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_p2,
                   CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_p3,
                   CAST(SUM(CASE WHEN o_orderpriority =
                                 '4-NOT SPECIFIED'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_p4,
                   CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_p5,
                   CAST(SUM(CAST(FLOOR(o_totalprice*100) AS BIGINT))
                        AS BIGINT) AS revenue_cents
            FROM orders GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "part_neighbor_jaccard": """
            WITH L AS (
              SELECT l_partkey,
                     lead(l_partkey) OVER (PARTITION BY l_orderkey
                                           ORDER BY l_linenumber,
                                                    l_partkey) AS nxt
              FROM lineitem),
            e0 AS (SELECT DISTINCT least(l_partkey, nxt) AS a,
                          greatest(l_partkey, nxt) AS b
                   FROM L WHERE nxt IS NOT NULL AND l_partkey <> nxt),
            adj AS (SELECT a AS u, b AS v FROM e0
                    UNION ALL SELECT b, a FROM e0),
            deg AS (SELECT u, COUNT(*) AS d FROM adj GROUP BY 1),
            w AS (SELECT a1.v AS p1, a2.v AS p2, COUNT(*) AS cn
                  FROM adj a1 JOIN adj a2
                       ON a1.u = a2.u AND a1.v < a2.v
                  GROUP BY 1, 2),
            e AS (SELECT w.p1, w.p2, w.cn FROM w
                  JOIN e0 ON e0.a = w.p1 AND e0.b = w.p2),
            j AS (SELECT p1, p2, cn, d1.d AS deg_a, d2.d AS deg_b,
                         cn * 10000 // (d1.d + d2.d - cn) AS jacc_bps
                  FROM e JOIN deg d1 ON d1.u = e.p1
                         JOIN deg d2 ON d2.u = e.p2)
            SELECT CAST(p1 AS BIGINT) AS p1, CAST(p2 AS BIGINT) AS p2,
                   CAST(cn AS BIGINT) AS cn,
                   CAST(deg_a AS BIGINT) AS deg_a,
                   CAST(deg_b AS BIGINT) AS deg_b,
                   CAST(jacc_bps AS BIGINT) AS jacc_bps
            FROM j ORDER BY jacc_bps DESC, p1, p2 LIMIT 100
        """,
        "events_props_stats": """
            WITH k AS (SELECT event_type,
                              CAST(props->>'k' AS BIGINT) AS k
                       FROM events)
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(k) AS BIGINT) AS sum_k,
                   CAST(quantile_disc(k, 0.5) AS BIGINT) AS k_p50,
                   CAST(quantile_disc(k, 0.9) AS BIGINT) AS k_p90
            FROM k GROUP BY 1 ORDER BY 1
        """,
        "events_survival_curve": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id
                       FROM events),
            l AS (SELECT t - lag(t) OVER (PARTITION BY user_id
                             ORDER BY t, event_id) AS gap
                  FROM e),
            g AS (SELECT gap FROM l WHERE gap IS NOT NULL),
            grid AS (SELECT CAST(unnest(
                         [1,2,5,10,15,30,60,120,240,480]) AS BIGINT)
                         AS k_min),
            tot AS (SELECT COUNT(*) AS n_gaps FROM g)
            SELECT CAST(k_min AS BIGINT) AS k_min,
                   CAST(SUM(CASE WHEN gap > k_min * 60000000
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_gt,
                   CAST(SUM(CASE WHEN gap > k_min * 60000000
                            THEN 1 ELSE 0 END) * 10000
                        // GREATEST(tot.n_gaps, 1) AS BIGINT)
                       AS survival_bps,
                   CAST(tot.n_gaps AS BIGINT) AS n_gaps
            FROM grid, tot, g
            GROUP BY k_min, tot.n_gaps ORDER BY k_min
        """,
        "events_calibration_bins": """
            WITH b AS (SELECT LEAST(CAST(FLOOR(value*100) AS BIGINT)
                                    // 1000, 40) AS bin,
                              CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END AS p
                       FROM events)
            SELECT CAST(bin AS BIGINT) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(p) AS BIGINT) AS n_purchase,
                   CAST(SUM(p) * 10000 // COUNT(*) AS BIGINT)
                       AS purchase_bps
            FROM b GROUP BY 1 ORDER BY 1
        """,
        "orders_dow_effect": """
            WITH d AS (SELECT (epoch_us(o_orderdate)//86400000000 + 3)
                                  % 7 AS dow,
                              CAST(FLOOR(o_totalprice*100) AS BIGINT)
                                  AS cents
                       FROM orders),
            g AS (SELECT dow, COUNT(*) AS n_orders,
                         SUM(cents) AS revenue_cents
                  FROM d GROUP BY 1),
            t AS (SELECT SUM(revenue_cents) AS tot FROM g)
            SELECT CAST(dow AS BIGINT) AS dow,
                   CAST(n_orders AS BIGINT) AS n_orders,
                   CAST(revenue_cents AS BIGINT) AS revenue_cents,
                   CAST(revenue_cents * 10000 // tot AS BIGINT)
                       AS share_bps,
                   CAST(revenue_cents * 7 * 10000 // tot AS BIGINT)
                       AS lift_bps
            FROM g, t ORDER BY 1
        """,
        "user_distinct_kmv": """
            WITH h AS (SELECT DISTINCT event_type,
                              CAST(('0x' || substr(md5(CAST(user_id
                                       AS VARCHAR)), 1, 15)) AS UBIGINT)
                                  AS h
                       FROM events),
            r AS (SELECT event_type, h,
                         ROW_NUMBER() OVER (PARTITION BY event_type
                                            ORDER BY h) AS rk,
                         COUNT(*) OVER (PARTITION BY event_type) AS nd
                  FROM h),
            g AS (SELECT event_type, MAX(nd) AS nd,
                         MAX(CASE WHEN rk = LEAST(nd, 64)
                             THEN h END) AS kth
                  FROM r GROUP BY 1)
            SELECT event_type,
                   CAST(LEAST(nd, 64) AS BIGINT) AS k_used,
                   CAST(kth AS BIGINT) AS kth_hash,
                   CAST(CASE WHEN nd >= 64
                        THEN CAST(63 AS HUGEINT)
                             * CAST(1152921504606846976 AS HUGEINT)
                             // CAST(kth AS HUGEINT)
                        ELSE nd END AS BIGINT) AS est_distinct
            FROM g ORDER BY event_type
        """,
        "events_dedup_burst": """
            WITH l AS (SELECT event_type,
                              epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                                  PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS gap
                       FROM events)
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN gap <= 60000000
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
                   CAST(COUNT(*) - SUM(CASE WHEN gap <= 60000000
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                   CAST(SUM(CASE WHEN gap <= 60000000
                            THEN 1 ELSE 0 END) * 10000
                        // COUNT(*) AS BIGINT) AS dup_bps
            FROM l GROUP BY 1 ORDER BY 1
        """,
        "user_growth_accounting": """
            WITH uw AS (SELECT DISTINCT user_id,
                               datediff('day', DATE '1970-01-01',
                                        CAST(ts AS DATE)) // 7 AS week
                        FROM events),
            lagd AS (SELECT user_id, week,
                            LAG(week) OVER (PARTITION BY user_id
                                            ORDER BY week) AS pw,
                            LEAD(week) OVER (PARTITION BY user_id
                                             ORDER BY week) AS nw
                     FROM uw),
            stat AS (SELECT week, COUNT(*) AS n_active,
                            SUM(CASE WHEN pw IS NULL
                                THEN 1 ELSE 0 END) AS n_new,
                            SUM(CASE WHEN pw = week - 1
                                THEN 1 ELSE 0 END) AS n_retained,
                            SUM(CASE WHEN pw IS NOT NULL AND pw < week - 1
                                THEN 1 ELSE 0 END) AS n_resurrected
                     FROM lagd GROUP BY week),
            churn AS (SELECT week + 1 AS week, COUNT(*) AS n_churned
                      FROM lagd
                      WHERE (nw IS NULL OR nw > week + 1)
                        AND week + 1 <= (SELECT MAX(week) FROM uw)
                      GROUP BY week + 1)
            SELECT CAST(s.week AS BIGINT) AS week,
                   CAST(s.week * 7 AS BIGINT) AS week_start_day,
                   CAST(s.n_active AS BIGINT) AS n_active,
                   CAST(s.n_new AS BIGINT) AS n_new,
                   CAST(s.n_retained AS BIGINT) AS n_retained,
                   CAST(s.n_resurrected AS BIGINT) AS n_resurrected,
                   CAST(COALESCE(c.n_churned, 0) AS BIGINT) AS n_churned
            FROM stat s LEFT JOIN churn c ON s.week = c.week
            ORDER BY s.week
        """,
        "events_target_encode": """
            WITH c AS (SELECT event_id, event_type,
                              CAST(FLOOR(value * 100) AS BIGINT) AS cents
                       FROM events),
            w AS (SELECT event_id, event_type, cents,
                         SUM(cents) OVER (PARTITION BY event_type) AS s,
                         COUNT(*) OVER (PARTITION BY event_type) AS n
                  FROM c)
            SELECT event_id, event_type, cents AS value_cents,
                   CAST(CASE WHEN n = 1 THEN -1
                        ELSE (s - cents) // (n - 1)
                        END AS BIGINT) AS loo_enc_cents
            FROM w WHERE event_id % 97 = 0 ORDER BY event_id
        """,
        "events_randomization_test": """
            WITH pool AS (
                SELECT CAST(FLOOR(value * 100) AS BIGINT) AS cents,
                       CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END AS obs_side,
                       CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                                            1, 16)) AS UBIGINT) AS h
                FROM events WHERE event_type IN ('purchase', 'click')),
            tot AS (SELECT COUNT(*) AS n, SUM(cents) AS s FROM pool),
            obs AS (SELECT COUNT(*) AS n1, SUM(cents) AS s1
                    FROM pool WHERE obs_side = 1),
            ostat AS (SELECT o.n1, ABS(CAST(o.s1 AS HUGEINT)
                                       * (t.n - o.n1)
                                       - CAST(t.s - o.s1 AS HUGEINT)
                                       * o.n1) AS stat
                      FROM obs o, tot t),
            reps AS (SELECT r.rep,
                            SUM(CAST((p.h >> r.rep) & 1 AS BIGINT)) AS n1,
                            SUM(CASE WHEN (p.h >> r.rep) & 1 = 1
                                THEN p.cents ELSE 0 END) AS s1
                     FROM pool p CROSS JOIN
                          (SELECT unnest(generate_series(0, 63)) AS rep) r
                     GROUP BY r.rep),
            rstat AS (SELECT r.rep, r.n1,
                             ABS(CAST(r.s1 AS HUGEINT) * (t.n - r.n1)
                                 - CAST(t.s - r.s1 AS HUGEINT) * r.n1)
                                 AS stat
                      FROM reps r, tot t)
            SELECT CAST(-1 AS BIGINT) AS rep,
                   CAST(n1 AS BIGINT) AS n_side1,
                   CAST(stat AS BIGINT) AS stat,
                   CAST(1 AS BIGINT) AS ge_obs
            FROM ostat
            UNION ALL
            SELECT CAST(r.rep AS BIGINT), CAST(r.n1 AS BIGINT),
                   CAST(r.stat AS BIGINT),
                   CAST(CASE WHEN r.stat >= o.stat
                        THEN 1 ELSE 0 END AS BIGINT)
            FROM rstat r, ostat o
            ORDER BY rep
        """,
        "user_lifetime_km": """
            WITH RECURSIVE ul AS (
                SELECT user_id,
                       datediff('day', DATE '1970-01-01',
                                CAST(MIN(ts) AS DATE)) AS f,
                       datediff('day', DATE '1970-01-01',
                                CAST(MAX(ts) AS DATE)) AS l
                FROM events GROUP BY 1),
            mx AS (SELECT MAX(l) AS mxd FROM ul),
            u AS (SELECT l - f AS dur,
                         CASE WHEN l >= mxd - 2 THEN 1 ELSE 0 END AS cens
                  FROM ul, mx),
            g AS (SELECT dur, COUNT(*) AS n_tot, SUM(1 - cens) AS n_event,
                         SUM(cens) AS n_cens
                  FROM u GROUP BY dur),
            o AS (SELECT dur, n_tot, n_event, n_cens,
                         ROW_NUMBER() OVER (ORDER BY dur) AS i,
                         CAST((SELECT COUNT(*) FROM u) AS BIGINT)
                             - COALESCE(SUM(n_tot) OVER (ORDER BY dur
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS n_risk
                  FROM g),
            km(i, s) AS (
                SELECT CAST(0 AS BIGINT), CAST(10000 AS HUGEINT)
                UNION ALL
                SELECT km.i + 1,
                       km.s * (o.n_risk - o.n_event) // o.n_risk
                FROM km JOIN o ON o.i = km.i + 1)
            SELECT CAST(o.dur AS BIGINT) AS duration_days,
                   CAST(o.n_risk AS BIGINT) AS n_risk,
                   CAST(o.n_event AS BIGINT) AS n_event,
                   CAST(o.n_cens AS BIGINT) AS n_censored,
                   CAST(km.s AS BIGINT) AS s_bps
            FROM o JOIN km ON km.i = o.i ORDER BY o.dur
        """,
        "lineitem_revenue_bridge": """
            WITH pm AS (SELECT l_partkey AS k,
                               (year(l_shipdate) - 1970) * 12
                                   + month(l_shipdate) - 1 AS m,
                               SUM(CAST(FLOOR(l_extendedprice * 100)
                                        AS BIGINT)) AS rev,
                               SUM(CAST(l_quantity AS BIGINT)) AS q
                        FROM lineitem GROUP BY 1, 2),
            b AS (SELECT MIN(m) AS mn, MAX(m) AS mx FROM pm),
            l AS (SELECT k, m, rev, q,
                         LAG(m) OVER w AS pm_, LAG(rev) OVER w AS prev,
                         LAG(q) OVER w AS pq, LEAD(m) OVER w AS nm
                  FROM pm WINDOW w AS (PARTITION BY k ORDER BY m)),
            cont AS (SELECT m, SUM(rev - prev) AS dc,
                            SUM(CAST(CAST(rev AS HUGEINT) * pq // q
                                     AS BIGINT) - prev) AS pe,
                            SUM(CAST(CAST(prev AS HUGEINT) * q // pq
                                     AS BIGINT) - prev) AS ve
                     FROM l WHERE pm_ = m - 1 GROUP BY m),
            newp AS (SELECT m, SUM(rev) AS new_rev FROM l
                     WHERE pm_ IS NULL OR pm_ < m - 1 GROUP BY m),
            exitp AS (SELECT m + 1 AS m, SUM(rev) AS exit_rev
                      FROM l, b
                      WHERE (nm IS NULL OR nm > m + 1) AND m + 1 <= b.mx
                      GROUP BY m + 1),
            tot AS (SELECT m, SUM(rev) AS rev FROM pm GROUP BY m),
            grid AS (SELECT unnest(generate_series(
                         (SELECT mn + 1 FROM b),
                         (SELECT mx FROM b))) AS m)
            SELECT CAST(g.m AS BIGINT) AS month_index,
                   CAST(COALESCE(t.rev, 0) AS BIGINT) AS rev_cents,
                   CAST(COALESCE(t.rev, 0) - COALESCE(tp.rev, 0)
                        AS BIGINT) AS d_rev,
                   CAST(COALESCE(c.pe, 0) AS BIGINT) AS price_eff,
                   CAST(COALESCE(c.ve, 0) AS BIGINT) AS volume_eff,
                   CAST(COALESCE(c.dc, 0) - COALESCE(c.pe, 0)
                        - COALESCE(c.ve, 0) AS BIGINT) AS residual,
                   CAST(COALESCE(n.new_rev, 0) AS BIGINT) AS new_rev,
                   CAST(COALESCE(x.exit_rev, 0) AS BIGINT) AS exit_rev
            FROM grid g
            LEFT JOIN tot t ON t.m = g.m
            LEFT JOIN tot tp ON tp.m = g.m - 1
            LEFT JOIN cont c ON c.m = g.m
            LEFT JOIN newp n ON n.m = g.m
            LEFT JOIN exitp x ON x.m = g.m
            ORDER BY g.m
        """,
        "events_peak_concurrency": """
            WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us
                       FROM events),
            l AS (SELECT user_id, event_id, us,
                         LAG(us) OVER (PARTITION BY user_id
                                       ORDER BY us, event_id) AS pus
                  FROM e),
            s AS (SELECT user_id, event_id, us,
                         CASE WHEN pus IS NULL OR us - pus > 1800000000
                              THEN 1 ELSE 0 END AS brk
                  FROM l),
            sid AS (SELECT user_id, us,
                           SUM(brk) OVER (PARTITION BY user_id
                               ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
                    FROM s),
            iv AS (SELECT user_id, sid, MIN(us) // 60000000 AS m0,
                          (MAX(us) + 1800000000) // 60000000 AS m1
                   FROM sid GROUP BY 1, 2),
            d AS (SELECT m0 AS minute, 1 AS delta FROM iv
                  UNION ALL SELECT m1 + 1, -1 FROM iv),
            c AS (SELECT minute,
                         SUM(SUM(delta)) OVER (ORDER BY minute
                             ROWS UNBOUNDED PRECEDING) AS conc
                  FROM d GROUP BY minute)
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY conc DESC, minute)
                        AS BIGINT) AS rk,
                   CAST(minute AS BIGINT) AS minute,
                   CAST(conc AS BIGINT) AS concurrency
            FROM c QUALIFY rk <= 10 ORDER BY rk
        """,
        "docs_kfold_assign": """
            WITH h AS (SELECT doc_id, lang, n_chars,
                              CAST(('0x' || substr(md5(CAST(doc_id
                                       AS VARCHAR)), 1, 16)) AS UBIGINT)
                                  AS h
                       FROM documents),
            r AS (SELECT lang, doc_id, n_chars,
                         (ROW_NUMBER() OVER (PARTITION BY lang
                                             ORDER BY h, doc_id) - 1) % 5
                             AS fold
                  FROM h)
            SELECT lang, CAST(fold AS BIGINT) AS fold,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM r GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "part_price_index": """
            WITH pm AS (SELECT l_partkey AS k,
                               (year(l_shipdate) - 1970) * 12
                                   + month(l_shipdate) - 1 AS m,
                               SUM(CAST(FLOOR(l_extendedprice * 100)
                                        AS BIGINT)) AS rev,
                               SUM(CAST(l_quantity AS BIGINT)) AS q
                        FROM lineitem GROUP BY 1, 2),
            b AS (SELECT MIN(m) AS m0 FROM pm),
            base AS (SELECT k, rev AS rev0, q AS q0
                     FROM pm, b WHERE m = b.m0),
            j AS (SELECT pm.m, pm.rev, pm.q, base.rev0, base.q0
                  FROM pm JOIN base ON pm.k = base.k, b
                  WHERE pm.m > b.m0),
            s AS (SELECT m, COUNT(*) AS n_parts,
                         SUM(CAST(rev AS HUGEINT) * q0 // q) AS numl,
                         SUM(CAST(rev0 AS HUGEINT)) AS denl,
                         SUM(CAST(rev AS HUGEINT)) AS nump,
                         SUM(CAST(rev0 AS HUGEINT) * q // q0) AS denp
                  FROM j GROUP BY m)
            SELECT CAST(m AS BIGINT) AS month_index,
                   CAST(n_parts AS BIGINT) AS n_parts,
                   CAST(10000 * numl // denl AS BIGINT)
                       AS laspeyres_bps,
                   CAST(10000 * nump // denp AS BIGINT) AS paasche_bps
            FROM s ORDER BY m
        """,
        "lineitem_pchart": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(l_shipdate AS DATE)) AS dy,
                              COUNT(*) AS n,
                              SUM(CASE WHEN l_returnflag = 'R'
                                  THEN 1 ELSE 0 END) AS x
                       FROM lineitem GROUP BY 1),
            t AS (SELECT SUM(n) AS nn, SUM(x) AS pp FROM d)
            SELECT CAST(dy AS BIGINT) AS day_index,
                   CAST(n AS BIGINT) AS n_lines,
                   CAST(x AS BIGINT) AS n_returned,
                   CAST(10000 * x // n AS BIGINT) AS share_bps,
                   CAST(CASE WHEN CAST(x * t.nn - n * t.pp AS HUGEINT)
                                  * (x * t.nn - n * t.pp)
                                  > CAST(9 AS HUGEINT) * n * t.pp
                                    * (t.nn - t.pp)
                             THEN CASE WHEN x * t.nn > n * t.pp
                                  THEN 1 ELSE -1 END
                             ELSE 0 END AS BIGINT) AS sigma3_flag
            FROM d, t ORDER BY dy
        """,
        "cohort_ltv_curve": """
            WITH o AS (SELECT o_custkey AS c,
                              (year(o_orderdate) - 1970) * 12
                                  + month(o_orderdate) - 1 AS m,
                              CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                                  AS rev
                       FROM orders),
            f AS (SELECT c, MIN(m) AS m0 FROM o GROUP BY 1),
            mx AS (SELECT MAX(m) AS mxm FROM o),
            co AS (SELECT m0, COUNT(*) AS n_cust FROM f GROUP BY 1),
            r AS (SELECT f.m0, o.m - f.m0 AS off, SUM(o.rev) AS rev
                  FROM o JOIN f ON o.c = f.c GROUP BY 1, 2),
            grid AS (SELECT m0, unnest(generate_series(0, mxm - m0))
                                AS off
                     FROM co, mx),
            cum AS (SELECT g.m0, g.off,
                           SUM(COALESCE(r.rev, 0)) OVER (
                               PARTITION BY g.m0 ORDER BY g.off
                               ROWS UNBOUNDED PRECEDING) AS cum_rev
                    FROM grid g LEFT JOIN r
                        ON r.m0 = g.m0 AND r.off = g.off)
            SELECT CAST(cum.m0 AS BIGINT) AS cohort_month,
                   CAST(cum.off AS BIGINT) AS month_offset,
                   CAST(co.n_cust AS BIGINT) AS n_customers,
                   CAST(cum.cum_rev AS BIGINT) AS cum_rev_cents
            FROM cum JOIN co ON co.m0 = cum.m0
            ORDER BY 1, 2
        """,
        "events_drift_tv": """
            WITH e AS (SELECT event_type AS ty,
                              CAST(FLOOR(value * 100) AS BIGINT) // 1000
                                  AS bin,
                              datediff('day', DATE '1970-01-01',
                                       CAST(ts AS DATE)) AS dy
                       FROM events),
            w AS (SELECT MIN(dy) AS mn, MAX(dy) AS mx FROM e),
            h AS (SELECT ty, bin,
                         CASE WHEN dy < (mn + mx + 1) // 2
                              THEN 0 ELSE 1 END AS half
                  FROM e, w),
            c AS (SELECT ty, bin,
                         SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS a,
                         SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS b2
                  FROM h GROUP BY 1, 2),
            t AS (SELECT ty, SUM(a) AS ta, SUM(b2) AS tb
                  FROM c GROUP BY 1),
            n AS (SELECT c.ty,
                         SUM(ABS(CAST(c.a AS HUGEINT) * t.tb
                                 - CAST(c.b2 AS HUGEINT) * t.ta)) AS num
                  FROM c JOIN t ON c.ty = t.ty GROUP BY 1)
            SELECT n.ty AS event_type,
                   CAST(t.ta AS BIGINT) AS n_first,
                   CAST(t.tb AS BIGINT) AS n_second,
                   CAST(10000 * n.num
                        // (2 * CAST(t.ta AS HUGEINT) * t.tb)
                        AS BIGINT) AS tv_bps
            FROM n JOIN t ON n.ty = t.ty ORDER BY 1
        """,
        "lineitem_ols2": """
            WITH m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                              SUM(CAST(l_quantity AS HUGEINT)) AS s1,
                              SUM(CAST(FLOOR(l_discount * 100)
                                       AS HUGEINT)) AS s2,
                              SUM(CAST(l_quantity AS HUGEINT)
                                  * CAST(l_quantity AS HUGEINT)) AS s11,
                              SUM(CAST(l_quantity AS HUGEINT)
                                  * CAST(FLOOR(l_discount * 100)
                                         AS HUGEINT)) AS s12,
                              SUM(CAST(FLOOR(l_discount * 100)
                                       AS HUGEINT)
                                  * CAST(FLOOR(l_discount * 100)
                                         AS HUGEINT)) AS s22,
                              SUM(CAST(FLOOR(l_extendedprice)
                                       AS HUGEINT)) AS sy,
                              SUM(CAST(l_quantity AS HUGEINT)
                                  * CAST(FLOOR(l_extendedprice)
                                         AS HUGEINT)) AS s1y,
                              SUM(CAST(FLOOR(l_discount * 100)
                                       AS HUGEINT)
                                  * CAST(FLOOR(l_extendedprice)
                                         AS HUGEINT)) AS s2y
                       FROM lineitem),
            d AS (SELECT n * (s11 * s22 - s12 * s12)
                         - s1 * (s1 * s22 - s12 * s2)
                         + s2 * (s1 * s12 - s11 * s2) AS det,
                         sy * (s11 * s22 - s12 * s12)
                         - s1 * (s1y * s22 - s12 * s2y)
                         + s2 * (s1y * s12 - s11 * s2y) AS d0,
                         n * (s1y * s22 - s12 * s2y)
                         - sy * (s1 * s22 - s12 * s2)
                         + s2 * (s1 * s2y - s1y * s2) AS d1,
                         n * (s11 * s2y - s1y * s12)
                         - s1 * (s1 * s2y - s1y * s2)
                         + sy * (s1 * s12 - s11 * s2) AS d2
                  FROM m),
            c(coef, num) AS (
                SELECT 'intercept', d0 FROM d UNION ALL
                SELECT 'qty', d1 FROM d UNION ALL
                SELECT 'disc_pct', d2 FROM d)
            SELECT c.coef,
                   CAST(CASE WHEN (c.num < 0) != (d.det < 0)
                        THEN -(ABS(c.num) * 1000000 // ABS(d.det))
                        ELSE ABS(c.num) * 1000000 // ABS(d.det)
                        END AS BIGINT) AS value_micro
            FROM c, d ORDER BY c.coef
        """,
        "session_step_transitions": """
            WITH e AS (SELECT user_id AS u, event_id, epoch_us(ts) AS us,
                              event_type AS ty
                       FROM events),
            l AS (SELECT u, event_id, us, ty,
                         LAG(us) OVER w AS pus, LAG(ty) OVER w AS pty
                  FROM e
                  WINDOW w AS (PARTITION BY u ORDER BY us, event_id)),
            s AS (SELECT *, CASE WHEN pus IS NULL
                                      OR us - pus > 1800000000
                                 THEN 1 ELSE 0 END AS brk
                  FROM l),
            sid AS (SELECT u, us, event_id, ty, pty, brk,
                           SUM(brk) OVER (PARTITION BY u
                               ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
                    FROM s),
            r AS (SELECT ty, pty, brk,
                         ROW_NUMBER() OVER (PARTITION BY u, sid
                             ORDER BY us, event_id) - 2 AS step
                  FROM sid)
            SELECT CAST(step AS BIGINT) AS step, pty AS from_type,
                   ty AS to_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM r WHERE brk = 0 AND step < 8
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "events_quiet_windows": """
            WITH m AS (SELECT DISTINCT epoch_us(ts) // 60000000 AS mi
                       FROM events),
            l AS (SELECT mi, LAG(mi) OVER (ORDER BY mi) AS pm FROM m),
            g AS (SELECT pm, mi, mi - pm AS gap FROM l
                  WHERE pm IS NOT NULL)
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY gap DESC, pm)
                        AS BIGINT) AS rk,
                   CAST(pm AS BIGINT) AS last_active_minute,
                   CAST(mi AS BIGINT) AS next_active_minute,
                   CAST(gap AS BIGINT) AS gap_minutes
            FROM g QUALIFY rk <= 10 ORDER BY rk
        """,
        "docs_boilerplate_prefix": """
            WITH p AS (SELECT doc_id, substr(text, 1, 60) AS pre
                       FROM documents),
            g AS (SELECT pre, COUNT(*) AS n, MIN(doc_id) AS mid,
                         SUM(doc_id) AS sid
                  FROM p GROUP BY 1 HAVING COUNT(*) > 1)
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, mid)
                        AS BIGINT) AS rk,
                   CAST(n AS BIGINT) AS n_docs,
                   CAST(mid AS BIGINT) AS min_doc_id,
                   CAST(sid AS BIGINT) AS sum_doc_id
            FROM g QUALIFY rk <= 20 ORDER BY rk
        """,
        "events_interarrival_fano": """
            WITH e AS (SELECT event_type AS ty,
                              epoch_us(ts) // 60000000 AS mi
                       FROM events),
            w AS (SELECT MAX(mi) - MIN(mi) + 1 AS g FROM e),
            c AS (SELECT ty, mi, COUNT(*) AS c FROM e GROUP BY 1, 2),
            s AS (SELECT ty, SUM(c) AS s, SUM(c * c) AS q
                  FROM c GROUP BY 1)
            SELECT s.ty AS event_type,
                   CAST(w.g AS BIGINT) AS n_minutes,
                   CAST(s.s AS BIGINT) AS n_events,
                   CAST(1000 * s.s // w.g AS BIGINT) AS mean_milli,
                   CAST(CAST(1000000 AS HUGEINT)
                        * (w.g * s.q - s.s * s.s)
                        // (CAST(w.g AS HUGEINT) * s.s) AS BIGINT)
                       AS fano_micro
            FROM s, w ORDER BY 1
        """,
        "embedding_label_centroids": """
            WITH u AS (SELECT label,
                              unnest(generate_series(
                                  1, len(embedding))) AS dim,
                              CAST(FLOOR(CAST(unnest(embedding)
                                              AS DOUBLE) * 1000000.0)
                                   AS BIGINT) AS vf
                       FROM embeddings),
            s AS (SELECT label, dim, COUNT(*) AS n, SUM(vf) AS s
                  FROM u GROUP BY 1, 2)
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(dim AS BIGINT) AS dim,
                   CAST(n AS BIGINT) AS n_vecs,
                   CAST(CASE WHEN s < 0 THEN -((-s) // n)
                        ELSE s // n END AS BIGINT) AS centroid_micro
            FROM s ORDER BY 1, 2
        """,
        "lineitem_price_surface": """
            WITH c AS (SELECT CAST(FLOOR(l_discount * 100) AS BIGINT)
                                  AS disc_pct,
                              CAST(FLOOR(l_tax * 100) AS BIGINT)
                                  AS tax_pct,
                              CAST(FLOOR(l_extendedprice * 100)
                                   AS BIGINT) AS cents
                       FROM lineitem)
            SELECT disc_pct, tax_pct,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(cents) // COUNT(*) AS BIGINT)
                       AS mean_price_cents,
                   CAST(SUM(cents) AS BIGINT) AS sum_price_cents
            FROM c GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "nation_trade_balance": """
            WITH f AS (SELECT CAST(FLOOR(l.l_extendedprice * 100)
                                   AS BIGINT) AS rev,
                              s.s_nationkey AS sn, c.c_nationkey AS cn
                       FROM lineitem l
                       JOIN orders o ON l.l_orderkey = o.o_orderkey
                       JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       JOIN customer c ON o.o_custkey = c.c_custkey),
            e AS (SELECT sn AS nk, SUM(rev) AS ex FROM f GROUP BY 1),
            i AS (SELECT cn AS nk, SUM(rev) AS im FROM f GROUP BY 1)
            SELECT n.n_name AS nation,
                   CAST(COALESCE(e.ex, 0) AS BIGINT) AS export_cents,
                   CAST(COALESCE(i.im, 0) AS BIGINT) AS import_cents,
                   CAST(COALESCE(e.ex, 0) - COALESCE(i.im, 0)
                        AS BIGINT) AS balance_cents
            FROM nation n
            LEFT JOIN e ON e.nk = n.n_nationkey
            LEFT JOIN i ON i.nk = n.n_nationkey
            ORDER BY 1
        """,
        "user_retention_triangle": """
            WITH uw AS (SELECT DISTINCT user_id AS u,
                               datediff('day', DATE '1970-01-01',
                                        CAST(ts AS DATE)) // 7 AS w
                        FROM events),
            f AS (SELECT u, MIN(w) AS w0 FROM uw GROUP BY 1)
            SELECT CAST(f.w0 AS BIGINT) AS cohort_week,
                   CAST(uw.w - f.w0 AS BIGINT) AS week_offset,
                   CAST(COUNT(*) AS BIGINT) AS n_active
            FROM uw JOIN f ON uw.u = f.u
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "customer_balance_deciles": """
            WITH cb AS (SELECT c_custkey,
                               CAST(FLOOR(c_acctbal * 100) AS BIGINT)
                                   AS cents
                        FROM customer),
            r AS (SELECT c_custkey,
                         10 * (ROW_NUMBER() OVER (
                             ORDER BY cents, c_custkey) - 1)
                             // (SELECT COUNT(*) FROM cb) AS dec
                  FROM cb),
            rev AS (SELECT o_custkey,
                           CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                               AS rv
                    FROM orders),
            s AS (SELECT r.dec, COUNT(DISTINCT r.c_custkey) AS nc,
                         COALESCE(SUM(rev.rv), 0) AS rv
                  FROM r LEFT JOIN rev ON rev.o_custkey = r.c_custkey
                  GROUP BY 1),
            t AS (SELECT SUM(rv) AS tot FROM s)
            SELECT CAST(s.dec AS BIGINT) AS decile,
                   CAST(s.nc AS BIGINT) AS n_customers,
                   CAST(s.rv AS BIGINT) AS revenue_cents,
                   CAST(10000 * s.rv // t.tot AS BIGINT) AS share_bps
            FROM s, t ORDER BY 1
        """,
        "docs_source_simpson": """
            WITH c AS (SELECT lang, source, COUNT(*) AS n
                       FROM documents GROUP BY 1, 2),
            s AS (SELECT lang, COUNT(*) AS ns, SUM(n) AS nn,
                         SUM(n * (n - 1)) AS num
                  FROM c GROUP BY 1)
            SELECT lang, CAST(ns AS BIGINT) AS n_sources,
                   CAST(nn AS BIGINT) AS n_docs,
                   CAST(CAST(1000000 AS HUGEINT) * num
                        // (CAST(nn AS HUGEINT) * (nn - 1)) AS BIGINT)
                       AS simpson_ppm
            FROM s ORDER BY 1
        """,
        "docs_punct_profile": """
            WITH p AS (SELECT lang, length(text) AS ch,
                              len(regexp_extract_all(text, '[.!?]+'))
                                  AS runs,
                              length(text)
                                  - length(replace(text, '!', ''))
                                  AS ex,
                              length(text)
                                  - length(replace(text, '?', ''))
                                  AS qu
                       FROM documents),
            a AS (SELECT lang, COUNT(*) AS n_docs, SUM(ch) AS n_chars,
                         SUM(runs) AS sent_runs, SUM(ex) AS n_exclaim,
                         SUM(qu) AS n_question
                  FROM p GROUP BY 1)
            SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
                   CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(sent_runs AS BIGINT) AS sent_runs,
                   CAST(n_exclaim AS BIGINT) AS n_exclaim,
                   CAST(n_question AS BIGINT) AS n_question,
                   CAST(1000 * n_exclaim // n_chars AS BIGINT)
                       AS exclaim_permille,
                   CAST(1000 * n_question // n_chars AS BIGINT)
                       AS question_permille
            FROM a ORDER BY lang
        """,
        "embedding_label_margin": """
            WITH u AS (SELECT label,
                              unnest(generate_series(
                                  1, len(embedding))) AS dim,
                              CAST(FLOOR(CAST(unnest(embedding)
                                              AS DOUBLE) * 1000000.0)
                                   AS BIGINT) AS vf
                       FROM embeddings),
            s AS (SELECT label, dim, COUNT(*) AS n, SUM(vf) AS s
                  FROM u GROUP BY 1, 2),
            c AS (SELECT label, dim,
                         CASE WHEN s < 0 THEN -((-s) // n)
                         ELSE s // n END AS cm
                  FROM s)
            SELECT CAST(a.label AS BIGINT) AS label_a,
                   CAST(b.label AS BIGINT) AS label_b,
                   CAST(SUM((a.cm - b.cm) * (a.cm - b.cm)) AS BIGINT)
                       AS dist2_micro2
            FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "part_price_ols_by_brand": """
            WITH m AS (SELECT p_brand AS brand,
                              CAST(COUNT(*) AS HUGEINT) AS n,
                              SUM(CAST(p_size AS HUGEINT)) AS sx,
                              SUM(CAST(p_size AS HUGEINT) * p_size)
                                  AS sxx,
                              SUM(CAST(FLOOR(p_retailprice * 100)
                                       AS HUGEINT)) AS sy,
                              SUM(CAST(p_size AS HUGEINT)
                                  * CAST(FLOOR(p_retailprice * 100)
                                         AS HUGEINT)) AS sxy
                       FROM part GROUP BY 1),
            d AS (SELECT brand, n, n * sxy - sx * sy AS ns,
                         sy * sxx - sx * sxy AS ni,
                         n * sxx - sx * sx AS den
                  FROM m WHERE n * sxx - sx * sx != 0)
            SELECT brand, CAST(n AS BIGINT) AS n_parts,
                   CAST(CASE WHEN (ns < 0) != (den < 0)
                        THEN -(ABS(ns) * 1000000 // ABS(den))
                        ELSE ABS(ns) * 1000000 // ABS(den)
                        END AS BIGINT) AS slope_micro,
                   CAST(CASE WHEN (ni < 0) != (den < 0)
                        THEN -(ABS(ni) * 1000000 // ABS(den))
                        ELSE ABS(ni) * 1000000 // ABS(den)
                        END AS BIGINT) AS intercept_micro
            FROM d ORDER BY brand
        """,
        "session_length_hist": """
            WITH e AS (SELECT user_id AS u, event_id,
                              epoch_us(ts) AS us
                       FROM events),
            l AS (SELECT u, event_id, us, LAG(us) OVER w AS pus
                  FROM e
                  WINDOW w AS (PARTITION BY u ORDER BY us, event_id)),
            s AS (SELECT u, us, event_id,
                         CASE WHEN pus IS NULL
                                   OR us - pus > 1800000000
                              THEN 1 ELSE 0 END AS brk
                  FROM l),
            sid AS (SELECT u, us,
                           SUM(brk) OVER (PARTITION BY u
                               ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
                    FROM s),
            g AS (SELECT u, sid, COUNT(*) AS cnt,
                         MAX(us) - MIN(us) AS dur
                  FROM sid GROUP BY 1, 2),
            h AS (SELECT LEAST(cnt, 20) AS lb, COUNT(*) AS ns,
                         SUM(dur) AS sd
                  FROM g GROUP BY 1)
            SELECT CAST(lb AS BIGINT) AS len_bucket,
                   CAST(ns AS BIGINT) AS n_sessions,
                   CAST(sd AS BIGINT) AS sum_duration_us
            FROM h ORDER BY 1
        """,
        "returns_by_ship_lag": """
            WITH j AS (SELECT datediff('day',
                                       CAST(o.o_orderdate AS DATE),
                                       CAST(l.l_shipdate AS DATE))
                                  AS lag,
                              CASE WHEN l.l_returnflag = 'R'
                                   THEN 1 ELSE 0 END AS r
                       FROM lineitem l
                       JOIN orders o ON l.l_orderkey = o.o_orderkey),
            a AS (SELECT lag, COUNT(*) AS n, SUM(r) AS x
                  FROM j GROUP BY 1)
            SELECT CAST(lag AS BIGINT) AS lag_days,
                   CAST(n AS BIGINT) AS n_lines,
                   CAST(x AS BIGINT) AS n_returned,
                   CAST(10000 * x // n AS BIGINT) AS return_bps
            FROM a ORDER BY 1
        """,
        "days_to_first_purchase": """
            WITH f AS (SELECT user_id,
                              MIN(epoch_us(ts)) // 86400000000 AS f0,
                              MIN(CASE WHEN event_type = 'purchase'
                                  THEN epoch_us(ts) END)
                                  // 86400000000 AS p0
                       FROM events GROUP BY 1)
            SELECT CAST(p0 - f0 AS BIGINT) AS gap_days,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM f WHERE p0 IS NOT NULL GROUP BY 1 ORDER BY 1
        """,
        "user_activity_hist": """
            WITH c AS (SELECT user_id, COUNT(*) AS cnt
                       FROM events GROUP BY 1)
            SELECT CAST(LEAST(cnt, 50) AS BIGINT) AS n_events,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM c GROUP BY 1 ORDER BY 1
        """,
        "order_line_count_hist": """
            WITH o AS (SELECT l_orderkey, COUNT(*) AS cnt,
                              SUM(CAST(FLOOR(l_extendedprice * 100)
                                       AS BIGINT)) AS rev
                       FROM lineitem GROUP BY 1)
            SELECT CAST(LEAST(cnt, 10) AS BIGINT) AS n_lines,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(rev) AS BIGINT) AS revenue_cents
            FROM o GROUP BY 1 ORDER BY 1
        """,
        "media_phash_bands": """
            WITH b AS (SELECT doc_id,
                              unnest([0, 1, 2, 3]) AS band,
                              unnest([
                                  CAST(('0x' || substr(md5(text), 17, 4))
                                       AS BIGINT),
                                  CAST(('0x' || substr(md5(text), 21, 4))
                                       AS BIGINT),
                                  CAST(('0x' || substr(md5(text), 25, 4))
                                       AS BIGINT),
                                  CAST(('0x' || substr(md5(text), 29, 4))
                                       AS BIGINT)]) AS val
                       FROM documents),
            c AS (SELECT band, val, COUNT(*) AS n FROM b GROUP BY 1, 2),
            s AS (SELECT band, COUNT(*) AS nb,
                         SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS coll,
                         SUM(n * (n - 1) // 2) AS pairs
                  FROM c GROUP BY 1)
            SELECT CAST(band AS BIGINT) AS band,
                   CAST(nb AS BIGINT) AS n_buckets,
                   CAST(coll AS BIGINT) AS n_docs_colliding,
                   CAST(pairs AS BIGINT) AS n_candidate_pairs
            FROM s ORDER BY 1
        """,
        "orders_changepoint_scan": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE)) AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS rev
                       FROM orders GROUP BY 1),
            b AS (SELECT MIN(dy) AS mn, MAX(dy) AS mx FROM d),
            grid AS (SELECT unnest(generate_series(mn, mx)) AS dy
                     FROM b),
            g AS (SELECT grid.dy, COALESCE(d.rev, 0) AS rev
                  FROM grid LEFT JOIN d ON d.dy = grid.dy),
            p AS (SELECT dy,
                         SUM(rev) OVER (ORDER BY dy
                             ROWS UNBOUNDED PRECEDING) AS sl,
                         ROW_NUMBER() OVER (ORDER BY dy) AS nl
                  FROM g),
            t AS (SELECT MAX(sl) AS s, MAX(nl) AS n FROM p),
            sc AS (SELECT dy, nl,
                          CAST(sl AS HUGEINT) * t.n
                              - CAST(t.s AS HUGEINT) * nl AS dnum,
                          nl * (t.n - nl) AS den
                   FROM p, t WHERE nl < t.n),
            q AS (SELECT dy, nl,
                         dnum * dnum
                             // (CAST(den AS HUGEINT) * t.s) AS score
                  FROM sc, t)
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, dy)
                        AS BIGINT) AS rk,
                   CAST(dy AS BIGINT) AS day_index,
                   CAST(nl AS BIGINT) AS n_left_days,
                   CAST(score AS BIGINT) AS score
            FROM q QUALIFY rk <= 5 ORDER BY rk
        """,
        "customer_snm_pairs": """
            WITH c AS (SELECT c_custkey, c_mktsegment AS seg,
                              CAST(FLOOR(c_acctbal * 100) AS BIGINT)
                                  AS cents
                       FROM customer),
            r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY cents,
                                               c_custkey) AS rn
                  FROM c),
            p AS (SELECT a.seg, b.cents - a.cents AS diff
                  FROM r a JOIN r b
                      ON b.rn - a.rn BETWEEN 1 AND 5
                      AND a.seg = b.seg
                      AND b.cents - a.cents <= 100)
            SELECT seg AS mktsegment,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(MIN(diff) AS BIGINT) AS min_diff_cents
            FROM p GROUP BY 1 ORDER BY 1
        """,
        "part_abc_xyz": """
            WITH pm AS (SELECT l_partkey AS k,
                               (year(l_shipdate) - 1970) * 12
                                   + month(l_shipdate) - 1 AS m,
                               SUM(CAST(l_quantity AS BIGINT)) AS q,
                               SUM(CAST(FLOOR(l_extendedprice * 100)
                                        AS BIGINT)) AS rev
                        FROM lineitem GROUP BY 1, 2),
            b AS (SELECT MAX(m) - MIN(m) + 1 AS mm FROM pm),
            p AS (SELECT k, SUM(rev) AS rev, SUM(q) AS s,
                         SUM(q * q) AS qq
                  FROM pm GROUP BY 1),
            r AS (SELECT k, rev, s, qq,
                         SUM(rev) OVER (ORDER BY rev DESC, k
                             ROWS UNBOUNDED PRECEDING) AS cum,
                         SUM(rev) OVER () AS tot
                  FROM p),
            c AS (SELECT rev,
                         CASE WHEN cum * 5 <= tot * 4 THEN 'A'
                              WHEN cum * 20 <= tot * 19 THEN 'B'
                              ELSE 'C' END AS abc,
                         CASE WHEN 4 * (b.mm * qq - s * s) <= s * s
                                  THEN 'X'
                              WHEN b.mm * qq - s * s <= s * s THEN 'Y'
                              ELSE 'Z' END AS xyz
                  FROM r, b)
            SELECT abc, xyz, CAST(COUNT(*) AS BIGINT) AS n_parts,
                   CAST(SUM(rev) AS BIGINT) AS revenue_cents
            FROM c GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "user_burstiness_bands": """
            WITH e AS (SELECT user_id AS u, epoch_us(ts) AS us,
                              event_id
                       FROM events),
            l AS (SELECT u, (us - LAG(us) OVER (PARTITION BY u
                             ORDER BY us, event_id)) // 1000000 AS g
                  FROM e),
            s AS (SELECT u, CAST(COUNT(g) AS HUGEINT) AS n,
                         SUM(CAST(g AS HUGEINT)) AS sg,
                         SUM(CAST(g AS HUGEINT) * g) AS qg
                  FROM l WHERE g IS NOT NULL GROUP BY u),
            b AS (SELECT CASE
                      WHEN 4 * (n * qg - sg * sg) <= sg * sg THEN 0
                      WHEN n * qg - sg * sg <= sg * sg THEN 1
                      WHEN n * qg - sg * sg <= 4 * sg * sg THEN 2
                      ELSE 3 END AS band
                  FROM s)
            SELECT CAST(band AS BIGINT) AS band,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM b GROUP BY 1 ORDER BY 1
        """,
        "lineitem_margin_waterfall": """
            WITH c AS (SELECT l_returnflag AS returnflag,
                              CAST(FLOOR(l_extendedprice * 100)
                                   AS BIGINT) AS gross,
                              CAST(FLOOR(l_extendedprice
                                         * (1 - l_discount) * 100)
                                   AS BIGINT) AS net,
                              CAST(FLOOR(l_extendedprice
                                         * (1 - l_discount)
                                         * (1 + l_tax) * 100)
                                   AS BIGINT) AS chg
                       FROM lineitem)
            SELECT returnflag,
                   CAST(SUM(gross) AS BIGINT) AS gross_cents,
                   CAST(SUM(gross) - SUM(net) AS BIGINT)
                       AS discount_cents,
                   CAST(SUM(net) AS BIGINT) AS net_cents,
                   CAST(SUM(chg) - SUM(net) AS BIGINT) AS tax_cents,
                   CAST(SUM(chg) AS BIGINT) AS charged_cents
            FROM c GROUP BY 1 ORDER BY 1
        """,
        "user_type_diversity_hist": """
            WITH c AS (SELECT user_id AS u, event_type AS ty,
                              COUNT(*) AS n
                       FROM events GROUP BY 1, 2),
            s AS (SELECT u, SUM(n) AS n, SUM(n * n) AS q
                  FROM c GROUP BY 1),
            d AS (SELECT 10000 * (n * n - q) // (n * n) AS bps FROM s)
            SELECT CAST(bps // 250 AS BIGINT) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM d GROUP BY 1 ORDER BY 1
        """,
        "orders_monthly_zchart": """
            WITH m AS (SELECT (year(o_orderdate) - 1970) * 12
                                  + month(o_orderdate) - 1 AS mi,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS rev
                       FROM orders GROUP BY 1),
            b AS (SELECT MIN(mi) AS mn, MAX(mi) AS mx FROM m),
            grid AS (SELECT unnest(generate_series(mn, mx)) AS mi
                     FROM b),
            g AS (SELECT grid.mi, COALESCE(m.rev, 0) AS rev
                  FROM grid LEFT JOIN m ON m.mi = grid.mi),
            z AS (SELECT mi, rev,
                         SUM(rev) OVER (PARTITION BY mi // 12
                             ORDER BY mi ROWS UNBOUNDED PRECEDING)
                             AS ytd,
                         SUM(rev) OVER (ORDER BY mi
                             ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
                             AS mat
                  FROM g)
            SELECT CAST(mi AS BIGINT) AS month_index,
                   CAST(rev AS BIGINT) AS rev_cents,
                   CAST(ytd AS BIGINT) AS ytd_cents,
                   CAST(mat AS BIGINT) AS mat_cents
            FROM z ORDER BY 1
        """,
        "docs_token_len_profile": """
            WITH t AS (SELECT lang,
                              unnest(regexp_split_to_array(text,
                                                           '\\s+'))
                                  AS tok
                       FROM documents),
            f AS (SELECT lang, LEAST(length(tok), 20) AS l
                  FROM t WHERE tok != '')
            SELECT lang, CAST(l AS BIGINT) AS tok_len,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens
            FROM f GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "events_type_share_series": """
            WITH c AS (SELECT (year(ts) - 1970) * 12 + month(ts) - 1
                                  AS mi,
                              event_type AS ty, COUNT(*) AS n
                       FROM events GROUP BY 1, 2),
            t AS (SELECT mi, SUM(n) AS tot FROM c GROUP BY 1)
            SELECT CAST(c.mi AS BIGINT) AS month_index,
                   c.ty AS event_type, CAST(c.n AS BIGINT) AS n_events,
                   CAST(10000 * c.n // t.tot AS BIGINT) AS share_bps
            FROM c JOIN t ON c.mi = t.mi ORDER BY 1, 2
        """,
        "brand_type_lift": """
            WITH c AS (SELECT p_brand AS brand, p_type AS ptype,
                              COUNT(*) AS n
                       FROM part GROUP BY 1, 2),
            mb AS (SELECT brand, SUM(n) AS nb FROM c GROUP BY 1),
            mt AS (SELECT ptype, SUM(n) AS nt FROM c GROUP BY 1),
            tt AS (SELECT SUM(n) AS nn FROM c)
            SELECT c.brand, c.ptype, CAST(c.n AS BIGINT) AS n,
                   CAST(CAST(1000000 AS HUGEINT) * tt.nn * c.n
                        // (CAST(mb.nb AS HUGEINT) * mt.nt) AS BIGINT)
                       AS lift_micro
            FROM c JOIN mb ON c.brand = mb.brand
            JOIN mt ON c.ptype = mt.ptype, tt
            ORDER BY 1, 2
        """,
        "orders_updown_runs": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE)) AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS rev
                       FROM orders GROUP BY 1),
            b AS (SELECT MIN(dy) AS mn, MAX(dy) AS mx FROM d),
            grid AS (SELECT unnest(generate_series(mn, mx)) AS dy
                     FROM b),
            g AS (SELECT grid.dy, COALESCE(d.rev, 0) AS rev
                  FROM grid LEFT JOIN d ON d.dy = grid.dy),
            s AS (SELECT dy,
                         CASE WHEN rev > LAG(rev) OVER w THEN 1
                              WHEN rev < LAG(rev) OVER w THEN -1
                              ELSE 0 END AS sg,
                         LAG(rev) OVER w AS pr
                  FROM g WINDOW w AS (ORDER BY dy)),
            f AS (SELECT dy, sg,
                         ROW_NUMBER() OVER (ORDER BY dy)
                             - ROW_NUMBER() OVER (PARTITION BY sg
                                                  ORDER BY dy) AS rid
                  FROM s WHERE pr IS NOT NULL),
            r AS (SELECT sg, rid, COUNT(*) AS ln
                  FROM f GROUP BY 1, 2)
            SELECT CAST(sg AS BIGINT) AS direction,
                   CAST(COUNT(*) AS BIGINT) AS n_runs,
                   CAST(MAX(ln) AS BIGINT) AS longest_run,
                   CAST(SUM(ln) AS BIGINT) AS n_days
            FROM r GROUP BY 1 ORDER BY 1
        """,
        "events_lateness_hist": """
            WITH e AS (SELECT user_id AS u, event_id,
                              epoch_us(ts) AS us
                       FROM events),
            m AS (SELECT u, us,
                         MAX(us) OVER (PARTITION BY u ORDER BY event_id
                             ROWS UNBOUNDED PRECEDING) AS mx
                  FROM e),
            l AS (SELECT LEAST((mx - us) // 60000000, 60) AS lm FROM m)
            SELECT CAST(lm AS BIGINT) AS late_min,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM l GROUP BY 1 ORDER BY 1
        """,
        "sample_error_audit": """
            WITH o AS (SELECT CAST(('0x' || substr(md5(CAST(o_orderkey
                                       AS VARCHAR)), 1, 16)) AS UBIGINT)
                                  AS h,
                              CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                                  AS rev
                       FROM orders),
            t AS (SELECT SUM(rev) AS tot FROM o),
            s AS (SELECT r,
                         SUM(CASE WHEN h % r = 0 THEN rev ELSE 0 END)
                             AS samp,
                         SUM(CASE WHEN h % r = 0 THEN 1 ELSE 0 END)
                             AS ns
                  FROM o, (SELECT unnest([16, 64, 256]) AS r)
                  GROUP BY r)
            SELECT CAST(s.r AS BIGINT) AS sample_rate,
                   CAST(s.ns AS BIGINT) AS n_sampled,
                   CAST(s.r * s.samp AS BIGINT) AS est_cents,
                   CAST(t.tot AS BIGINT) AS exact_cents,
                   CAST(10000 * ABS(s.r * s.samp - t.tot) // t.tot
                        AS BIGINT) AS err_bps
            FROM s, t ORDER BY 1
        """,
        "lineitem_spearman": """
            WITH h AS (SELECT l_returnflag AS flag,
                              CAST(FLOOR(l_discount * 100) AS BIGINT)
                                  AS x,
                              CAST(FLOOR(l_quantity) AS BIGINT) AS y,
                              COUNT(*) AS n
                       FROM lineitem GROUP BY 1, 2, 3),
            mx AS (SELECT flag, x, SUM(n) AS c FROM h GROUP BY 1, 2),
            rx AS (SELECT flag, x,
                          2 * SUM(c) OVER (PARTITION BY flag ORDER BY x
                              ROWS UNBOUNDED PRECEDING) - c + 1 AS r
                   FROM mx),
            my AS (SELECT flag, y, SUM(n) AS c FROM h GROUP BY 1, 2),
            ry AS (SELECT flag, y,
                          2 * SUM(c) OVER (PARTITION BY flag ORDER BY y
                              ROWS UNBOUNDED PRECEDING) - c + 1 AS r
                   FROM my),
            m AS (SELECT h.flag, CAST(SUM(h.n) AS HUGEINT) AS n,
                         SUM(CAST(h.n AS HUGEINT) * rx.r) AS sx,
                         SUM(CAST(h.n AS HUGEINT) * ry.r) AS sy,
                         SUM(CAST(h.n AS HUGEINT) * rx.r * rx.r)
                             AS sxx,
                         SUM(CAST(h.n AS HUGEINT) * ry.r * ry.r)
                             AS syy,
                         SUM(CAST(h.n AS HUGEINT) * rx.r * ry.r)
                             AS sxy
                  FROM h
                  JOIN rx ON h.flag = rx.flag AND h.x = rx.x
                  JOIN ry ON h.flag = ry.flag AND h.y = ry.y
                  GROUP BY 1)
            SELECT flag AS l_returnflag, CAST(n AS BIGINT) AS n,
                   CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                        / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                           * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                        * 1000) AS BIGINT) AS spearman_milli
            FROM m ORDER BY 1
        """,
        "events_diurnal_concentration": """
            WITH h AS (SELECT event_type AS ty,
                              (epoch_us(ts) // 3600000000) % 24 AS hr,
                              COUNT(*) AS n
                       FROM events GROUP BY 1, 2),
            r AS (SELECT ty, hr, n,
                         ROW_NUMBER() OVER (PARTITION BY ty
                             ORDER BY n DESC, hr) AS rk
                  FROM h),
            t AS (SELECT ty, SUM(n) AS tot FROM h GROUP BY 1),
            s AS (SELECT ty,
                         SUM(CASE WHEN rk <= 3 THEN n ELSE 0 END)
                             AS top3,
                         MAX(CASE WHEN rk = 1 THEN hr END) AS peak
                  FROM r GROUP BY 1)
            SELECT s.ty AS event_type,
                   CAST(s.peak AS BIGINT) AS peak_hour,
                   CAST(10000 * s.top3 // t.tot AS BIGINT)
                       AS top3_share_bps,
                   CAST(t.tot AS BIGINT) AS n_events
            FROM s JOIN t ON s.ty = t.ty ORDER BY 1
        """,
        "trigram_spectrum": r"""
            WITH d AS (SELECT doc_id AS did,
                              regexp_extract_all(text, '\S+') AS l
                       FROM documents),
            t AS (SELECT did, unnest(l) AS tok,
                         unnest(range(1, len(l) + 1)) AS i FROM d),
            tri AS (SELECT a.tok || ' ' || b.tok || ' ' || c.tok AS g
                    FROM t a
                    JOIN t b ON a.did = b.did AND b.i = a.i + 1
                    JOIN t c ON a.did = c.did AND c.i = a.i + 2),
            cnt AS (SELECT g, COUNT(*) AS n FROM tri GROUP BY 1)
            SELECT CAST(LEAST(n, 10) AS BIGINT) AS occ,
                   CAST(COUNT(*) AS BIGINT) AS n_grams
            FROM cnt GROUP BY 1 ORDER BY 1
        """,
        "order_total_reconciliation": """
            WITH c AS (SELECT l_orderkey AS k,
                              SUM(CAST(FLOOR(l_extendedprice
                                             * (1 - l_discount)
                                             * (1 + l_tax) * 100)
                                       AS BIGINT)) AS chg
                       FROM lineitem GROUP BY 1),
            j AS (SELECT CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)
                             - c.chg AS diff
                  FROM orders o JOIN c ON c.k = o.o_orderkey),
            b AS (SELECT CASE WHEN diff = 0 THEN 0
                         ELSE (CASE WHEN diff > 0 THEN 1 ELSE -1 END)
                              * (CASE WHEN ABS(diff) <= 100 THEN 1
                                 WHEN ABS(diff) <= 10000 THEN 2
                                 ELSE 3 END) END AS cls,
                         ABS(diff) AS mag
                  FROM j)
            SELECT CAST(cls AS BIGINT) AS mismatch_class,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(mag) AS BIGINT) AS sum_abs_diff_cents
            FROM b GROUP BY 1 ORDER BY 1
        """,
        "session_threshold_sensitivity": """
            WITH e AS (SELECT user_id AS u, epoch_us(ts) AS us,
                              event_id
                       FROM events),
            l AS (SELECT u, us - LAG(us) OVER (PARTITION BY u
                             ORDER BY us, event_id) AS g
                  FROM e),
            nu AS (SELECT COUNT(DISTINCT u) AS n FROM e),
            t AS (SELECT unnest([5, 15, 30, 60, 120]) AS tm),
            o AS (SELECT t.tm,
                         COUNT(*) FILTER (WHERE l.g > CAST(t.tm AS BIGINT) * 60000000)
                             AS n_over
                  FROM l, t GROUP BY 1)
            SELECT CAST(o.tm AS BIGINT) AS threshold_min,
                   CAST(nu.n + o.n_over AS BIGINT) AS n_sessions
            FROM o, nu ORDER BY 1
        """,
        "events_type_xcorr": """
            WITH e AS (SELECT event_type AS ty,
                              datediff('day', DATE '1970-01-01',
                                       CAST(ts AS DATE)) AS dy
                       FROM events),
            b AS (SELECT MIN(dy) AS mn, MAX(dy) AS mx FROM e),
            grid AS (SELECT unnest(generate_series(mn, mx)) AS dy
                     FROM b),
            cx AS (SELECT dy, COUNT(*) AS n FROM e
                   WHERE ty = 'click' GROUP BY 1),
            cy AS (SELECT dy, COUNT(*) AS n FROM e
                   WHERE ty = 'purchase' GROUP BY 1),
            gx AS (SELECT g.dy, COALESCE(cx.n, 0) AS x
                   FROM grid g LEFT JOIN cx ON cx.dy = g.dy),
            gy AS (SELECT g.dy, COALESCE(cy.n, 0) AS y
                   FROM grid g LEFT JOIN cy ON cy.dy = g.dy),
            lg AS (SELECT unnest(range(0, 8)) AS k),
            j AS (SELECT lg.k, a.x, bb.y
                  FROM gx a CROSS JOIN lg
                  JOIN gy bb ON bb.dy = a.dy + lg.k),
            m AS (SELECT k, CAST(COUNT(*) AS HUGEINT) AS n,
                         SUM(CAST(x AS HUGEINT)) AS sx,
                         SUM(CAST(y AS HUGEINT)) AS sy,
                         SUM(CAST(x AS HUGEINT) * x) AS sxx,
                         SUM(CAST(y AS HUGEINT) * y) AS syy,
                         SUM(CAST(x AS HUGEINT) * y) AS sxy
                  FROM j GROUP BY 1)
            SELECT CAST(k AS BIGINT) AS lag_days,
                   CAST(n AS BIGINT) AS n_days,
                   CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                        / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                           * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                        * 1000) AS BIGINT) AS xcorr_milli
            FROM m ORDER BY 1
        """,
        "user_lifecycle_census": """
            WITH e AS (SELECT user_id AS u,
                              datediff('day', DATE '1970-01-01',
                                       CAST(ts AS DATE)) AS d
                       FROM events),
            f AS (SELECT u, MIN(d) AS f0, MAX(d) AS l0
                  FROM e GROUP BY 1),
            s AS (SELECT CASE WHEN f0 >= mend - 27 THEN 0
                              WHEN l0 >= mend - 6 THEN 1
                              WHEN l0 >= mend - 27 THEN 2
                              ELSE 3 END AS stage
                  FROM f, (SELECT MAX(d) AS mend FROM e)),
            g AS (SELECT stage, COUNT(*) AS n FROM s GROUP BY 1)
            SELECT CAST(stage AS BIGINT) AS stage,
                   ['new', 'active', 'lapsed', 'dormant'][stage + 1]
                       AS stage_name,
                   CAST(n AS BIGINT) AS n_users
            FROM g ORDER BY 1
        """,
        "events_kanon_audit": """
            WITH c AS (SELECT event_type AS ty, user_id AS u,
                              COUNT(*) AS n
                       FROM events GROUP BY 1, 2),
            b AS (SELECT ty, CASE WHEN n = 1 THEN 0
                                  WHEN n <= 4 THEN 1
                                  WHEN n <= 19 THEN 2
                                  ELSE 3 END AS cls
                  FROM c),
            s AS (SELECT ty, cls, COUNT(*) AS nu FROM b GROUP BY 1, 2),
            t AS (SELECT ty, SUM(nu) AS tot,
                         SUM(CASE WHEN cls <= 1 THEN nu ELSE 0 END)
                             AS risk
                  FROM s GROUP BY 1)
            SELECT s.ty AS event_type, CAST(s.cls AS BIGINT)
                       AS freq_class,
                   CAST(s.nu AS BIGINT) AS n_users,
                   CAST(10000 * t.risk // t.tot AS BIGINT)
                       AS risk_share_bps
            FROM s JOIN t ON s.ty = t.ty ORDER BY 1, 2
        """,
        "quantile_sketch_error": """
            WITH c AS (SELECT CAST(FLOOR(value * 100) AS BIGINT)
                                  AS cents
                       FROM events),
            nn AS (SELECT COUNT(*) AS n FROM c),
            q AS (SELECT unnest([25, 50, 75, 90, 99]) AS q),
            h AS (SELECT cents, COUNT(*) AS cn FROM c GROUP BY 1),
            cu AS (SELECT cents, SUM(cn) OVER (ORDER BY cents
                       ROWS UNBOUNDED PRECEDING) AS cum
                   FROM h),
            ex AS (SELECT q.q, MIN(cu.cents) AS cents
                   FROM q, cu, nn
                   WHERE cu.cum >= -(-q.q * nn.n // 100) GROUP BY 1),
            hb AS (SELECT cents // 50 AS b, COUNT(*) AS cn
                   FROM c GROUP BY 1),
            cb AS (SELECT b, SUM(cn) OVER (ORDER BY b
                       ROWS UNBOUNDED PRECEDING) AS cum
                   FROM hb),
            sk AS (SELECT q.q, MIN(cb.b) * 50 AS est
                   FROM q, cb, nn
                   WHERE cb.cum >= -(-q.q * nn.n // 100) GROUP BY 1)
            SELECT CAST(ex.q AS BIGINT) AS q_pct,
                   CAST(ex.cents AS BIGINT) AS exact_cents,
                   CAST(sk.est AS BIGINT) AS sketch_cents,
                   CAST(ex.cents - sk.est AS BIGINT) AS err_cents
            FROM ex JOIN sk ON ex.q = sk.q ORDER BY 1
        """,
        "purchase_latency_slo": """
            WITH c AS (SELECT user_id AS u, epoch_us(ts) AS us
                       FROM events WHERE event_type = 'click'),
            p AS (SELECT user_id AS u, event_id AS eid,
                         epoch_us(ts) AS us
                  FROM events WHERE event_type = 'purchase'),
            a AS (SELECT p.u, p.eid, p.us, MAX(c.us) AS cus
                  FROM p JOIN c ON c.u = p.u AND c.us <= p.us
                  GROUP BY 1, 2, 3),
            w AS (SELECT us // 604800000000 AS wk,
                         CASE WHEN us - cus > 1800000000
                              THEN 1 ELSE 0 END AS slow
                  FROM a)
            SELECT CAST(wk AS BIGINT) AS week_index,
                   CAST(COUNT(*) AS BIGINT) AS n_conversions,
                   CAST(SUM(slow) AS BIGINT) AS n_slow,
                   CAST(10000 * SUM(slow) // COUNT(*) AS BIGINT)
                       AS slow_share_bps
            FROM w GROUP BY 1 ORDER BY 1
        """,
        "source_yield_funnel": r"""
            WITH g AS (SELECT source,
                              len(regexp_extract_all(text, '\S+'))
                                  AS tok,
                              len(regexp_extract_all(text,
                                                     '[.!?,;:]'))
                                  AS pu
                       FROM documents),
            s AS (SELECT source, COUNT(*) AS n_raw,
                         SUM(CASE WHEN tok >= 10 AND pu <= 40
                             THEN 1 ELSE 0 END) AS n_pass
                  FROM g GROUP BY 1)
            SELECT source, CAST(n_raw AS BIGINT) AS n_raw,
                   CAST(n_pass AS BIGINT) AS n_pass,
                   CAST(10000 * n_pass // n_raw AS BIGINT)
                       AS yield_bps
            FROM s ORDER BY 1
        """,
        "orders_rescaled_range": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE)) AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS rev
                       FROM orders GROUP BY 1),
            b AS (SELECT MIN(dy) AS mn, MAX(dy) AS mx FROM d),
            grid AS (SELECT unnest(generate_series(mn, mx)) AS dy
                     FROM b),
            g AS (SELECT grid.dy, COALESCE(d.rev, 0) AS rev
                  FROM grid LEFT JOIN d ON d.dy = grid.dy),
            ws AS (SELECT unnest([8, 16, 32, 64]) AS w),
            x AS (SELECT ws.w, (g.dy - b.mn) // ws.w AS wid, g.dy,
                         g.rev
                  FROM g, b, ws),
            fw AS (SELECT w, wid, COUNT(*) AS c, SUM(rev) AS s
                   FROM x GROUP BY 1, 2 HAVING COUNT(*) = w),
            cd AS (SELECT x.w, x.wid,
                          SUM(x.w * x.rev - f.s) OVER (
                              PARTITION BY x.w, x.wid ORDER BY x.dy
                              ROWS UNBOUNDED PRECEDING) AS z
                   FROM x JOIN fw f ON f.w = x.w AND f.wid = x.wid),
            rng AS (SELECT w, wid, MAX(z) - MIN(z) AS r
                    FROM cd GROUP BY 1, 2)
            SELECT CAST(w AS BIGINT) AS window_days,
                   CAST(COUNT(*) AS BIGINT) AS n_windows,
                   CAST(SUM(r) AS BIGINT) AS sum_range_scaled
            FROM rng GROUP BY 1 ORDER BY 1
        """,
        "orders_theil_sen": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE)) AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS rev
                       FROM orders GROUP BY 1),
            p AS (SELECT b.rev - a.rev AS dr, b.dy - a.dy AS dd
                  FROM d a JOIN d b ON b.dy > a.dy),
            s AS (SELECT CASE WHEN dr < 0
                              THEN -((1000000 * (-dr)) // dd)
                              ELSE (1000000 * dr) // dd END AS sl
                  FROM p)
            SELECT CAST((SELECT COUNT(*) FROM d) AS BIGINT) AS n_days,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(quantile_disc(sl, 0.25) AS BIGINT)
                       AS slope_p25_micro,
                   CAST(quantile_disc(sl, 0.50) AS BIGINT)
                       AS slope_median_micro,
                   CAST(quantile_disc(sl, 0.75) AS BIGINT)
                       AS slope_p75_micro
            FROM s
        """,
        "user_part_negatives": """
            WITH pos AS (SELECT DISTINCT o.o_custkey AS c,
                                l.l_partkey AS p
                         FROM orders o
                         JOIN lineitem l
                             ON l.l_orderkey = o.o_orderkey),
            mx AS (SELECT MAX(p_partkey) AS mp FROM part),
            cust AS (SELECT DISTINCT c FROM pos),
            cand AS (SELECT c, unnest(generate_series(1, 12)) AS i
                     FROM cust),
            h AS (SELECT c, i,
                         CAST(CAST(('0x' || substr(md5(
                             CAST(c AS VARCHAR) || '_'
                             || CAST(i AS VARCHAR)), 1, 16))
                             AS UBIGINT) % mp AS BIGINT) + 1 AS pk
                  FROM cand, mx),
            f AS (SELECT h.c, h.i, h.pk
                  FROM h LEFT JOIN pos
                      ON pos.c = h.c AND pos.p = h.pk
                  WHERE pos.p IS NULL),
            r AS (SELECT c, pk,
                         ROW_NUMBER() OVER (PARTITION BY c ORDER BY i)
                             AS rk
                  FROM f)
            SELECT CAST(rk AS BIGINT) AS neg_rank,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(pk) AS BIGINT) AS sum_partkey
            FROM r WHERE rk <= 4 GROUP BY 1 ORDER BY 1
        """,
        "events_cuped_adjust": """
            WITH w AS (SELECT (MIN(datediff('day', DATE '1970-01-01',
                                  CAST(ts AS DATE)))
                               + MAX(datediff('day', DATE '1970-01-01',
                                     CAST(ts AS DATE))) + 1) // 2
                                  AS mid
                       FROM events),
            u AS (SELECT user_id AS u,
                         SUM(CASE WHEN datediff('day',
                                 DATE '1970-01-01', CAST(ts AS DATE))
                                 < mid
                             THEN CAST(FLOOR(value * 100) AS BIGINT)
                             ELSE 0 END) AS x,
                         SUM(CASE WHEN datediff('day',
                                 DATE '1970-01-01', CAST(ts AS DATE))
                                 >= mid
                             THEN CAST(FLOOR(value * 100) AS BIGINT)
                             ELSE 0 END) AS y
                  FROM events, w GROUP BY 1, w.mid),
            a AS (SELECT u % 2 AS arm, CAST(COUNT(*) AS HUGEINT) AS n,
                         SUM(CAST(x AS HUGEINT)) AS sx,
                         SUM(CAST(y AS HUGEINT)) AS sy,
                         SUM(CAST(x AS HUGEINT) * x) AS sxx,
                         SUM(CAST(y AS HUGEINT) * y) AS syy,
                         SUM(CAST(x AS HUGEINT) * y) AS sxy
                  FROM u GROUP BY 1),
            p AS (SELECT SUM(n) AS n, SUM(sx) AS sx, SUM(sy) AS sy,
                         SUM(sxx) AS sxx, SUM(syy) AS syy,
                         SUM(sxy) AS sxy
                  FROM a),
            t AS (SELECT n * sxy - sx * sy AS num,
                         n * sxx - sx * sx AS d1,
                         n * syy - sy * sy AS d2
                  FROM p)
            SELECT CAST(a.arm AS BIGINT) AS arm,
                   CAST(a.n AS BIGINT) AS n,
                   CAST(a.sx AS BIGINT) AS sum_pre_cents,
                   CAST(a.sy AS BIGINT) AS sum_post_cents,
                   CAST(CASE WHEN (t.num < 0) != (t.d1 < 0)
                        THEN -(ABS(t.num) * 1000000 // ABS(t.d1))
                        ELSE ABS(t.num) * 1000000 // ABS(t.d1)
                        END AS BIGINT) AS theta_micro,
                   CAST(((10000 * ABS(t.num)) // t.d1) * ABS(t.num)
                        // t.d2 AS BIGINT) AS varred_bps
            FROM a, t ORDER BY 1
        """,
        "orders_seasonal_strength": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE)) AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS rev
                       FROM orders GROUP BY 1),
            b AS (SELECT MIN(dy) AS mn, MAX(dy) AS mx FROM d),
            grid AS (SELECT unnest(generate_series(mn, mx)) AS dy
                     FROM b),
            g AS (SELECT grid.dy, COALESCE(d.rev, 0) AS rev
                  FROM grid LEFT JOIN d ON d.dy = grid.dy),
            tt AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                          SUM(CAST(rev AS HUGEINT)) AS s,
                          SUM(CAST(rev AS HUGEINT) * rev) AS q
                   FROM g),
            ps AS (SELECT unnest([7, 30]) AS p),
            ph AS (SELECT ps.p, g.dy % ps.p AS phase,
                          SUM(CAST(g.rev AS HUGEINT)) AS sg,
                          CAST(COUNT(*) AS HUGEINT) AS ng
                   FROM g, ps GROUP BY 1, 2),
            sb AS (SELECT p, SUM(tt.n * sg * sg // ng) AS ssbn
                   FROM ph, tt GROUP BY 1)
            SELECT CAST(sb.p AS BIGINT) AS period_days,
                   CAST(10000 * (sb.ssbn - tt.s * tt.s)
                        // (tt.n * tt.q - tt.s * tt.s) AS BIGINT)
                       AS strength_bps
            FROM sb, tt ORDER BY 1
        """,
        "customer_order_class_migration": """
            WITH w AS (SELECT (MIN(datediff('day', DATE '1970-01-01',
                                  CAST(o_orderdate AS DATE)))
                               + MAX(datediff('day', DATE '1970-01-01',
                                     CAST(o_orderdate AS DATE))) + 1)
                              // 2 AS mid
                       FROM orders),
            u AS (SELECT o_custkey AS c,
                         SUM(CASE WHEN datediff('day',
                                 DATE '1970-01-01',
                                 CAST(o_orderdate AS DATE)) < mid
                             THEN 1 ELSE 0 END) AS n1,
                         SUM(CASE WHEN datediff('day',
                                 DATE '1970-01-01',
                                 CAST(o_orderdate AS DATE)) >= mid
                             THEN 1 ELSE 0 END) AS n2
                  FROM orders, w GROUP BY 1, w.mid),
            k AS (SELECT CASE WHEN n1 = 0 THEN 0 WHEN n1 = 1 THEN 1
                              WHEN n1 <= 4 THEN 2 ELSE 3 END AS c1,
                         CASE WHEN n2 = 0 THEN 0 WHEN n2 = 1 THEN 1
                              WHEN n2 <= 4 THEN 2 ELSE 3 END AS c2
                  FROM u)
            SELECT CAST(c1 AS BIGINT) AS class_h1,
                   CAST(c2 AS BIGINT) AS class_h2,
                   CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM k GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "part_supplier_redundancy": """
            WITH pr AS (SELECT l_partkey AS k,
                               SUM(CAST(FLOOR(l_extendedprice * 100)
                                        AS BIGINT)) AS rev,
                               COUNT(DISTINCT l_suppkey) AS ns
                        FROM lineitem GROUP BY 1),
            c AS (SELECT LEAST(ns, 4) AS cls, COUNT(*) AS n_parts,
                         SUM(rev) AS revenue_cents
                  FROM pr GROUP BY 1)
            SELECT CAST(cls AS BIGINT) AS n_suppliers_class,
                   CAST(n_parts AS BIGINT) AS n_parts,
                   CAST(revenue_cents AS BIGINT) AS revenue_cents
            FROM c ORDER BY 1
        """,
        "orders_month_end_effect": """
            WITH o AS (SELECT (year(o_orderdate) - 1970) * 12
                                  + month(o_orderdate) - 1 AS m,
                              CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                                  AS rev,
                              CASE WHEN day(o_orderdate)
                                   > day(last_day(o_orderdate)) - 3
                                   THEN 1 ELSE 0 END AS l3
                       FROM orders),
            a AS (SELECT m, SUM(rev) AS rev, SUM(rev * l3) AS l3
                  FROM o GROUP BY 1)
            SELECT CAST(m AS BIGINT) AS month_index,
                   CAST(rev AS BIGINT) AS rev_cents,
                   CAST(l3 AS BIGINT) AS last3_cents,
                   CAST(10000 * l3 // rev AS BIGINT)
                       AS last3_share_bps
            FROM a ORDER BY 1
        """,
        "session_entry_conversion": """
            WITH e AS (SELECT user_id AS u, event_id,
                              epoch_us(ts) AS us, event_type AS ty
                       FROM events),
            l AS (SELECT u, event_id, us, ty, LAG(us) OVER w AS pus
                  FROM e
                  WINDOW w AS (PARTITION BY u ORDER BY us, event_id)),
            s AS (SELECT *, CASE WHEN pus IS NULL
                                      OR us - pus > 1800000000
                                 THEN 1 ELSE 0 END AS brk
                  FROM l),
            sid AS (SELECT u, us, event_id, ty,
                           SUM(brk) OVER (PARTITION BY u
                               ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
                    FROM s),
            g AS (SELECT u, sid,
                         FIRST(ty ORDER BY us, event_id) AS entry,
                         MAX(CASE WHEN ty = 'purchase'
                             THEN 1 ELSE 0 END) AS conv
                  FROM sid GROUP BY 1, 2),
            a AS (SELECT entry, COUNT(*) AS ns, SUM(conv) AS nc
                  FROM g GROUP BY 1)
            SELECT entry AS entry_type,
                   CAST(ns AS BIGINT) AS n_sessions,
                   CAST(nc AS BIGINT) AS n_converted,
                   CAST(10000 * nc // ns AS BIGINT) AS conv_bps
            FROM a ORDER BY 1
        """,
        "source_hapax_ratio": r"""
            WITH t AS (SELECT source,
                              unnest(regexp_extract_all(text, '\S+'))
                                  AS tok
                       FROM documents),
            c AS (SELECT source, tok, COUNT(*) AS n
                  FROM t GROUP BY 1, 2),
            s AS (SELECT source, COUNT(*) AS nd,
                         SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS nh
                  FROM c GROUP BY 1)
            SELECT source,
                   CAST(nd AS BIGINT) AS n_distinct_tokens,
                   CAST(nh AS BIGINT) AS n_hapax,
                   CAST(10000 * nh // nd AS BIGINT) AS hapax_bps
            FROM s ORDER BY 1
        """,
        "tombstone_impact_audit": """
            WITH hs AS (SELECT 'events' AS t, user_id AS id FROM events
                        UNION ALL
                        SELECT 'orders', o_custkey FROM orders
                        UNION ALL
                        SELECT 'customer', c_custkey FROM customer),
            m AS (SELECT t, id,
                         CASE WHEN CAST(('0x' || substr(md5(
                                  CAST(id AS VARCHAR)), 1, 16))
                                  AS UBIGINT) % 128 = 0
                              THEN 1 ELSE 0 END AS hit
                  FROM hs),
            a AS (SELECT t, COUNT(*) AS n, SUM(hit) AS na,
                         COUNT(DISTINCT CASE WHEN hit = 1
                                        THEN id END) AS ne
                  FROM m GROUP BY 1)
            SELECT t AS table_name, CAST(n AS BIGINT) AS n_rows,
                   CAST(na AS BIGINT) AS n_affected,
                   CAST(10000 * na // n AS BIGINT) AS share_bps,
                   CAST(ne AS BIGINT) AS n_entities
            FROM a ORDER BY 1
        """,
        "catalog_profile": """
            SELECT * FROM (
                SELECT 'customer' AS table_name,
                       CAST(COUNT(*) AS BIGINT) AS n_rows FROM customer
                UNION ALL SELECT 'documents', COUNT(*) FROM documents
                UNION ALL SELECT 'embeddings', COUNT(*) FROM embeddings
                UNION ALL SELECT 'events', COUNT(*) FROM events
                UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
                UNION ALL SELECT 'nation', COUNT(*) FROM nation
                UNION ALL SELECT 'orders', COUNT(*) FROM orders
                UNION ALL SELECT 'part', COUNT(*) FROM part
                UNION ALL SELECT 'region', COUNT(*) FROM region
                UNION ALL SELECT 'supplier', COUNT(*) FROM supplier)
            ORDER BY 1
        """,
        "events_gap_memory": """
            WITH e AS (SELECT user_id AS u, epoch_us(ts) AS us,
                              event_id
                       FROM events),
            l1 AS (SELECT u, us, event_id,
                          (us - LAG(us) OVER (PARTITION BY u
                              ORDER BY us, event_id)) // 1000000 AS g
                   FROM e),
            l2 AS (SELECT g AS y,
                          LAG(g) OVER (PARTITION BY u
                              ORDER BY us, event_id) AS x
                   FROM l1),
            p AS (SELECT x, y FROM l2
                  WHERE x IS NOT NULL AND y IS NOT NULL),
            m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                         SUM(CAST(x AS HUGEINT)) AS sx,
                         SUM(CAST(y AS HUGEINT)) AS sy,
                         SUM(CAST(x AS HUGEINT) * x) AS sxx,
                         SUM(CAST(y AS HUGEINT) * y) AS syy,
                         SUM(CAST(x AS HUGEINT) * y) AS sxy
                  FROM p)
            SELECT CAST(n AS BIGINT) AS n_pairs,
                   CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                        / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                           * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                        * 1000) AS BIGINT) AS gap_corr_milli
            FROM m
        """,
        "user_minute_burst_flags": """
            WITH c AS (SELECT user_id AS u,
                              epoch_us(ts) // 60000000 AS mi,
                              COUNT(*) AS n
                       FROM events GROUP BY 1, 2),
            m AS (SELECT u, MAX(n) AS mx FROM c GROUP BY 1),
            b AS (SELECT CASE WHEN mx = 1 THEN 0
                              WHEN mx <= 4 THEN 1
                              WHEN mx <= 9 THEN 2
                              ELSE 3 END AS cls
                  FROM m)
            SELECT CAST(cls AS BIGINT) AS burst_class,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM b GROUP BY 1 ORDER BY 1
        """,
        "repeat_purchase_gaps": """
            WITH b AS (SELECT DISTINCT o.o_custkey AS c,
                              l.l_partkey AS p,
                              datediff('day', DATE '1970-01-01',
                                       CAST(o.o_orderdate AS DATE))
                                  AS d
                       FROM orders o
                       JOIN lineitem l
                           ON l.l_orderkey = o.o_orderkey),
            g AS (SELECT d - LAG(d) OVER (PARTITION BY c, p
                          ORDER BY d) AS gp
                  FROM b),
            h AS (SELECT LEAST(gp // 7, 26) AS gw FROM g
                  WHERE gp IS NOT NULL)
            SELECT CAST(gw AS BIGINT) AS gap_week,
                   CAST(COUNT(*) AS BIGINT) AS n_gaps
            FROM h GROUP BY 1 ORDER BY 1
        """,
        "ngram_containment_pairs": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '\S+')) AS tok,
                     generate_subscripts(regexp_extract_all(text,
                                                            '\S+'), 1)
                         AS i
              FROM documents
            ), sh AS (
              SELECT DISTINCT doc_id,
                     tok || ' ' || lead(tok,1) OVER w || ' ' ||
                     lead(tok,2) OVER w AS shingle
              FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY i)
              QUALIFY lead(tok,2) OVER w IS NOT NULL
            ), sizes AS (
              SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
            ), pairs AS (
              SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
              FROM sh x JOIN sh y
                ON x.shingle = y.shingle AND x.doc_id < y.doc_id
              GROUP BY x.doc_id, y.doc_id
            )
            SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
                   CAST(inter AS BIGINT) AS inter,
                   CAST(LEAST(sa.n, sb.n) AS BIGINT) AS min_n,
                   CAST((inter * 10000) // LEAST(sa.n, sb.n)
                        AS BIGINT) AS containment_bp
            FROM pairs
            JOIN sizes sa ON pairs.a = sa.doc_id
            JOIN sizes sb ON pairs.b = sb.doc_id
            ORDER BY containment_bp DESC, a, b LIMIT 20
        """,
        "events_round_number_bias": """
            WITH c AS (SELECT CAST(FLOOR(value * 100) AS BIGINT)
                                  AS cents
                       FROM events),
            m AS (SELECT COUNT(*) AS n,
                         SUM(CASE WHEN cents % 100 = 0
                             THEN 1 ELSE 0 END) AS whole,
                         SUM(CASE WHEN cents % 50 = 0
                             THEN 1 ELSE 0 END) AS half
                  FROM c)
            SELECT * FROM (
                SELECT 'half_dollar' AS point,
                       CAST(half AS BIGINT) AS n_hits,
                       CAST(10000 * half // n AS BIGINT) AS share_bps,
                       CAST(5000 * half // n AS BIGINT) AS lift_pct
                FROM m
                UNION ALL
                SELECT 'whole_dollar', CAST(whole AS BIGINT),
                       CAST(10000 * whole // n AS BIGINT),
                       CAST(10000 * whole // n AS BIGINT)
                FROM m)
            ORDER BY 1
        """,
        "user_tenure_value_curve": """
            WITH e AS (SELECT user_id AS u,
                              datediff('day', DATE '1970-01-01',
                                       CAST(ts AS DATE)) AS d,
                              CAST(FLOOR(value * 100) AS BIGINT)
                                  AS cents
                       FROM events),
            f AS (SELECT u, MIN(d) AS f0 FROM e GROUP BY 1),
            t AS (SELECT e.u,
                         LEAST((e.d - f.f0) // 7, 52) AS tw,
                         e.cents
                  FROM e JOIN f ON e.u = f.u),
            uw AS (SELECT tw, COUNT(DISTINCT u) AS nu
                   FROM t GROUP BY 1),
            sc AS (SELECT tw, SUM(cents) AS s FROM t GROUP BY 1)
            SELECT CAST(uw.tw AS BIGINT) AS tenure_week,
                   CAST(uw.nu AS BIGINT) AS n_user_weeks,
                   CAST(sc.s AS BIGINT) AS sum_cents
            FROM uw JOIN sc ON uw.tw = sc.tw ORDER BY 1
        """,
        "embedding_triplet_audit": """
            WITH p AS (SELECT vec_id AS a,
                              LEAD(vec_id) OVER (PARTITION BY label
                                  ORDER BY vec_id) AS p
                       FROM embeddings),
            ng AS (SELECT vec_id AS a,
                          LEAD(vec_id) OVER (ORDER BY vec_id) AS nx,
                          LEAD(label) OVER (ORDER BY vec_id) AS nl,
                          label AS al
                   FROM embeddings),
            t AS (SELECT p.a, p.p, ng.nx AS n
                  FROM p JOIN ng ON ng.a = p.a
                  WHERE p.p IS NOT NULL AND ng.nx IS NOT NULL
                    AND ng.nl != ng.al),
            u AS (SELECT vec_id,
                         unnest(generate_series(1, len(embedding)))
                             AS dim,
                         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)
                                    * 1000.0) AS BIGINT) AS vf
                  FROM embeddings),
            dap AS (SELECT t.a,
                           SUM((ua.vf - up.vf) * (ua.vf - up.vf))
                               AS d2p
                    FROM t
                    JOIN u ua ON ua.vec_id = t.a
                    JOIN u up ON up.vec_id = t.p AND up.dim = ua.dim
                    GROUP BY 1),
            dan AS (SELECT t.a,
                           SUM((ua.vf - un.vf) * (ua.vf - un.vf))
                               AS d2n
                    FROM t
                    JOIN u ua ON ua.vec_id = t.a
                    JOIN u un ON un.vec_id = t.n AND un.dim = ua.dim
                    GROUP BY 1),
            r AS (SELECT CASE WHEN dap.d2p < dan.d2n
                              THEN 1 ELSE 0 END AS ok
                  FROM dap JOIN dan ON dap.a = dan.a)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_triplets,
                   CAST(SUM(ok) AS BIGINT) AS n_satisfied,
                   CAST(10000 * SUM(ok) // COUNT(*) AS BIGINT)
                       AS satisfied_bps
            FROM r
        """,
        "ship_lag_quantiles_by_priority": """
            WITH j AS (SELECT o.o_orderpriority AS pri,
                              datediff('day',
                                       CAST(o.o_orderdate AS DATE),
                                       CAST(l.l_shipdate AS DATE))
                                  AS lag
                       FROM lineitem l
                       JOIN orders o ON l.l_orderkey = o.o_orderkey)
            SELECT pri AS priority,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(quantile_disc(lag, 0.25) AS BIGINT)
                       AS lag_p25,
                   CAST(quantile_disc(lag, 0.50) AS BIGINT)
                       AS lag_p50,
                   CAST(quantile_disc(lag, 0.75) AS BIGINT)
                       AS lag_p75,
                   CAST(quantile_disc(lag, 0.90) AS BIGINT)
                       AS lag_p90
            FROM j GROUP BY 1 ORDER BY 1
        """,
        "bloom_fpr_audit": """
            WITH keys AS (SELECT DISTINCT p_partkey AS k FROM part),
            nn AS (SELECT COUNT(*) AS nk, MAX(k) AS mk FROM keys),
            par AS (SELECT unnest([8, 16]) AS bpk),
            ii AS (SELECT CAST(unnest([0, 1, 2]) AS UBIGINT) AS i),
            kh AS (SELECT CAST(('0x' || substr(md5(CAST(k AS VARCHAR)),
                                1, 16)) AS UBIGINT) AS h1,
                          CAST(('0x' || substr(md5(CAST(k AS VARCHAR)),
                                17, 16)) AS UBIGINT) AS h2
                   FROM keys),
            sp AS (SELECT DISTINCT par.bpk,
                          ((kh.h1 % (par.bpk * nn.nk))
                           + ii.i * (kh.h2 % (par.bpk * nn.nk)))
                          % (par.bpk * nn.nk) AS pos
                   FROM kh, nn, par, ii),
            pr AS (SELECT unnest(generate_series(mk + 1, mk + nk))
                              AS pk
                   FROM nn),
            ph AS (SELECT pk,
                          CAST(('0x' || substr(md5(CAST(pk
                               AS VARCHAR)), 1, 16)) AS UBIGINT)
                              AS h1,
                          CAST(('0x' || substr(md5(CAST(pk
                               AS VARCHAR)), 17, 16)) AS UBIGINT)
                              AS h2
                   FROM pr),
            pp AS (SELECT par.bpk, ph.pk,
                          ((ph.h1 % (par.bpk * nn.nk))
                           + ii.i * (ph.h2 % (par.bpk * nn.nk)))
                          % (par.bpk * nn.nk) AS pos
                   FROM ph, nn, par, ii),
            hit AS (SELECT pp.bpk, pp.pk, COUNT(*) AS c
                    FROM pp JOIN sp
                        ON sp.bpk = pp.bpk AND sp.pos = pp.pos
                    GROUP BY 1, 2),
            fp AS (SELECT bpk, COUNT(*) AS nfp FROM hit
                   WHERE c = 3 GROUP BY 1)
            SELECT CAST(par.bpk AS BIGINT) AS bits_per_key,
                   CAST(nn.nk AS BIGINT) AS n_keys,
                   CAST(nn.nk AS BIGINT) AS n_probes,
                   CAST(COALESCE(fp.nfp, 0) AS BIGINT)
                       AS n_false_pos,
                   CAST(10000 * COALESCE(fp.nfp, 0) // nn.nk
                        AS BIGINT) AS fpr_bps
            FROM par CROSS JOIN nn
            LEFT JOIN fp ON fp.bpk = par.bpk
            ORDER BY 1
        """,
        "part_price_dispersion": """
            WITH u AS (SELECT l_partkey AS k,
                              CAST(FLOOR(l_extendedprice * 100)
                                   AS BIGINT)
                                  // CAST(l_quantity AS BIGINT) AS un
                       FROM lineitem),
            p AS (SELECT k, MAX(un) - MIN(un) AS disp
                  FROM u GROUP BY 1),
            b AS (SELECT CASE WHEN disp = 0 THEN 0
                              WHEN disp < 100 THEN 1
                              WHEN disp < 1000 THEN 2
                              ELSE 3 END AS band,
                         disp
                  FROM p)
            SELECT CAST(band AS BIGINT) AS band,
                   CAST(COUNT(*) AS BIGINT) AS n_parts,
                   CAST(SUM(disp) AS BIGINT) AS sum_disp_cents
            FROM b GROUP BY 1 ORDER BY 1
        """,
        "line_dedup_rate": r"""
            WITH l AS (SELECT regexp_replace(regexp_replace(
                           unnest(regexp_split_to_array(text,
                                                        '[.!?]+')),
                           '^\s+', ''), '\s+$', '') AS ln
                       FROM documents),
            f AS (SELECT ln FROM l WHERE ln != ''),
            c AS (SELECT ln, COUNT(*) AS n FROM f GROUP BY 1),
            s AS (SELECT SUM(n) AS inst, COUNT(*) AS dist,
                         SUM(CASE WHEN n > 1 THEN n ELSE 0 END)
                             AS dup
                  FROM c)
            SELECT CAST(inst AS BIGINT) AS n_lines,
                   CAST(dist AS BIGINT) AS n_distinct,
                   CAST(dup AS BIGINT) AS n_in_dup_groups,
                   CAST(10000 * dup // inst AS BIGINT)
                       AS dup_group_share_bps,
                   CAST(10000 * (inst - dist) // inst AS BIGINT)
                       AS removable_share_bps
            FROM s
        """,
        "first_order_ltv_corr": """
            WITH o AS (SELECT o_custkey AS c,
                              epoch_us(o_orderdate) AS d,
                              o_orderkey AS k,
                              CAST(FLOOR(o_totalprice) AS BIGINT)
                                  AS rev
                       FROM orders),
            f AS (SELECT c, FIRST(rev ORDER BY d, k) AS x,
                         SUM(rev) AS y
                  FROM o GROUP BY 1),
            m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                         SUM(CAST(x AS HUGEINT)) AS sx,
                         SUM(CAST(y AS HUGEINT)) AS sy,
                         SUM(CAST(x AS HUGEINT) * x) AS sxx,
                         SUM(CAST(y AS HUGEINT) * y) AS syy,
                         SUM(CAST(x AS HUGEINT) * y) AS sxy
                  FROM f)
            SELECT CAST(n AS BIGINT) AS n_customers,
                   CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                        / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                           * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                        * 1000) AS BIGINT) AS corr_milli
            FROM m
        """,
        "hte_by_decile": """
            WITH dd AS (SELECT user_id AS u, event_type AS ty,
                               CAST(FLOOR(value * 100) AS BIGINT)
                                   AS cents,
                               datediff('day', DATE '1970-01-01',
                                        CAST(ts AS DATE)) AS d
                        FROM events),
            w AS (SELECT (MIN(d) + MAX(d) + 1) // 2 AS mid FROM dd),
            u AS (SELECT u,
                         SUM(CASE WHEN d < mid THEN cents ELSE 0 END)
                             AS pre,
                         MAX(CASE WHEN ty = 'purchase' AND d >= mid
                             THEN 1 ELSE 0 END) AS conv
                  FROM dd, w GROUP BY 1, w.mid),
            r AS (SELECT u, pre, conv,
                         10 * (ROW_NUMBER() OVER (ORDER BY pre, u) - 1)
                             // (SELECT COUNT(*) FROM u) AS dec
                  FROM u),
            a AS (SELECT dec,
                         SUM(CASE WHEN u % 2 = 0 THEN 1 ELSE 0 END)
                             AS n0,
                         SUM(CASE WHEN u % 2 = 0 THEN conv
                             ELSE 0 END) AS c0,
                         SUM(CASE WHEN u % 2 = 1 THEN 1 ELSE 0 END)
                             AS n1,
                         SUM(CASE WHEN u % 2 = 1 THEN conv
                             ELSE 0 END) AS c1
                  FROM r GROUP BY 1)
            SELECT CAST(dec AS BIGINT) AS decile,
                   CAST(n0 AS BIGINT) AS n_arm0,
                   CAST(CASE WHEN n0 > 0 THEN 10000 * c0 // n0
                        ELSE 0 END AS BIGINT) AS conv0_bps,
                   CAST(n1 AS BIGINT) AS n_arm1,
                   CAST(CASE WHEN n1 > 0 THEN 10000 * c1 // n1
                        ELSE 0 END AS BIGINT) AS conv1_bps,
                   CAST((CASE WHEN n1 > 0 THEN 10000 * c1 // n1
                         ELSE 0 END)
                        - (CASE WHEN n0 > 0 THEN 10000 * c0 // n0
                           ELSE 0 END) AS BIGINT) AS lift_bps
            FROM a ORDER BY 1
        """,
        "part_stock_clamp": """
            WITH f AS (SELECT l_partkey AS p,
                              datediff('day', DATE '1970-01-01',
                                       CAST(l_shipdate AS DATE)) AS dy,
                              SUM(CASE WHEN l_returnflag = 'R'
                                  THEN CAST(l_quantity AS BIGINT)
                                  ELSE -CAST(l_quantity AS BIGINT)
                                  END) AS net
                       FROM lineitem GROUP BY 1, 2),
            w AS (SELECT p, dy, net,
                         SUM(net) OVER (PARTITION BY p ORDER BY dy)
                             AS ps
                  FROM f),
            s AS (SELECT p, net, ps,
                         MIN(ps) OVER (PARTITION BY p ORDER BY dy)
                             AS mn
                  FROM w),
            a AS (SELECT p,
                         SUM(CASE WHEN ps - LEAST(0, mn) = 0
                             THEN 1 ELSE 0 END) AS zd,
                         -LEAST(0, MIN(mn)) AS lost,
                         SUM(net) - LEAST(0, MIN(mn)) AS fin
                  FROM s GROUP BY 1),
            b AS (SELECT CASE WHEN zd = 0 THEN 0
                              WHEN zd <= 2 THEN 1
                              WHEN zd <= 5 THEN 2 ELSE 3 END AS band,
                         zd, lost, fin
                  FROM a)
            SELECT CAST(band AS BIGINT) AS band,
                   CAST(COUNT(*) AS BIGINT) AS n_parts,
                   CAST(SUM(zd) AS BIGINT) AS stockout_days,
                   CAST(SUM(lost) AS BIGINT) AS lost_units,
                   CAST(SUM(fin) AS BIGINT) AS end_units
            FROM b GROUP BY 1 ORDER BY 1
        """,
        "score_auc_audit": """
            WITH e AS (SELECT CAST(FLOOR(value * 100) AS BIGINT) % 512
                                  AS s,
                              CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END AS y
                       FROM events),
            g AS (SELECT s, SUM(y) AS p, SUM(1 - y) AS q
                  FROM e GROUP BY 1),
            c AS (SELECT s, p, q,
                         COALESCE(SUM(q) OVER (ORDER BY s
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS cq
                  FROM g),
            m AS (SELECT SUM(p * (2 * cq + q)) AS num2,
                         SUM(p) AS np, SUM(q) AS nq
                  FROM c)
            SELECT CAST(np AS BIGINT) AS n_pos,
                   CAST(nq AS BIGINT) AS n_neg,
                   CAST(10000 * num2 // (2 * np * nq) AS BIGINT)
                       AS auc_bps,
                   CAST(20000 * num2 // (2 * np * nq) - 10000
                        AS BIGINT) AS gini_bps
            FROM m
        """,
        "vocab_growth_curve": r"""
            WITH d AS (SELECT text,
                              ROW_NUMBER() OVER (ORDER BY doc_id) AS r
                       FROM documents),
            nn AS (SELECT COUNT(*) AS n FROM documents),
            t AS (SELECT r, unnest(regexp_extract_all(text, '\S+'))
                             AS tok
                  FROM d),
            tm AS (SELECT CAST(('0x' || substr(md5(tok), 1, 16))
                              AS UBIGINT) AS h,
                          MIN(r) AS mr
                   FROM t GROUP BY 1),
            b AS (SELECT mr, COUNT(*) AS v FROM tm GROUP BY 1),
            k AS (SELECT unnest(generate_series(1, 10)) AS ck),
            c AS (SELECT ck, (ck * nn.n) // 10 AS cnt FROM k, nn),
            v AS (SELECT ck, cnt,
                         (SELECT CAST(COALESCE(SUM(v), 0) AS BIGINT)
                          FROM b WHERE mr <= cnt) AS vocab
                  FROM c)
            SELECT CAST(ck AS BIGINT) AS checkpoint,
                   CAST(cnt AS BIGINT) AS n_docs,
                   vocab,
                   CAST(vocab - COALESCE(LAG(vocab) OVER
                        (ORDER BY ck), 0) AS BIGINT) AS new_tokens
            FROM v ORDER BY 1
        """,
        "minhash_error_audit": r"""
            WITH el AS (SELECT doc_id, text,
                               ROW_NUMBER() OVER (ORDER BY doc_id) - 1
                                   AS j
                        FROM documents WHERE doc_id % 5 = 0),
            pr AS (SELECT a.j AS pid, a.doc_id AS da, b.doc_id AS db
                   FROM el a JOIN el b ON b.j = a.j + 1),
            tok AS (SELECT doc_id,
                           unnest(regexp_extract_all(text, '\S+'))
                               AS tok
                    FROM el),
            tk AS (SELECT DISTINCT doc_id,
                          CAST(('0x' || substr(md5(tok), 1, 16))
                               AS UBIGINT) AS h
                   FROM tok),
            ji AS (SELECT p.pid, COUNT(*) AS i
                   FROM pr p JOIN tk x ON x.doc_id = p.da
                             JOIN tk y ON y.doc_id = p.db
                                      AND y.h = x.h
                   GROUP BY 1),
            ju AS (SELECT p.pid, COUNT(DISTINCT t.h) AS u
                   FROM pr p JOIN tk t ON t.doc_id = p.da
                                       OR t.doc_id = p.db
                   GROUP BY 1),
            mh AS (SELECT t.doc_id, k.k,
                          MIN(CAST(('0x' || substr(md5(t.tok || '#' ||
                              CAST(k.k AS VARCHAR)), 1, 16))
                              AS UBIGINT)) AS mv
                   FROM tok t,
                        (SELECT unnest(generate_series(0, 63)) AS k) k
                   GROUP BY 1, 2),
            mm AS (SELECT p.pid,
                          SUM(CASE WHEN a.mv = b.mv THEN 1 ELSE 0 END)
                              AS m
                   FROM pr p JOIN mh a ON a.doc_id = p.da
                             JOIN mh b ON b.doc_id = p.db
                                      AND b.k = a.k
                   GROUP BY 1),
            e AS (SELECT p.pid,
                         10000 * mm.m // 64 AS est,
                         10000 * COALESCE(ji.i, 0) // ju.u AS ex
                  FROM pr p JOIN mm ON mm.pid = p.pid
                            JOIN ju ON ju.pid = p.pid
                            LEFT JOIN ji ON ji.pid = p.pid)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(est) // COUNT(*) AS BIGINT)
                       AS mean_est_bps,
                   CAST(SUM(ex) // COUNT(*) AS BIGINT)
                       AS mean_exact_bps,
                   CAST(SUM(ABS(est - ex)) // COUNT(*) AS BIGINT)
                       AS mean_abs_err_bps,
                   CAST(MAX(ABS(est - ex)) AS BIGINT)
                       AS max_abs_err_bps
            FROM e
        """,
        "blocking_key_audit": """
            WITH c AS (SELECT c_nationkey AS nat,
                              (CAST(FLOOR(c_acctbal * 100) AS BIGINT)
                               + 100000) // 100000 AS band,
                              c_mktsegment AS seg
                       FROM customer),
            nn AS (SELECT COUNT(*) AS n FROM customer),
            u AS (SELECT 0 AS strat, COUNT(*) AS cnt
                  FROM c GROUP BY strat, nat
                  UNION ALL
                  SELECT 1, COUNT(*) FROM c GROUP BY band
                  UNION ALL
                  SELECT 2, COUNT(*) FROM c GROUP BY seg, nat),
            a AS (SELECT strat, COUNT(*) AS n_blocks,
                         MAX(cnt) AS max_block,
                         SUM(cnt * (cnt - 1) // 2) AS cand
                  FROM u GROUP BY 1)
            SELECT CAST(strat AS BIGINT) AS strategy,
                   CAST(n_blocks AS BIGINT) AS n_blocks,
                   CAST(max_block AS BIGINT) AS max_block,
                   CAST(cand AS BIGINT) AS cand_pairs,
                   CAST(10000 * (nn.n * (nn.n - 1) // 2 - cand)
                        // (nn.n * (nn.n - 1) // 2) AS BIGINT)
                       AS reduction_bps
            FROM a, nn ORDER BY 1
        """,
        "ldiversity_audit": """
            WITH g AS (SELECT o_orderpriority AS pr,
                              (EXTRACT(year FROM o_orderdate) - 1970)
                                  * 12
                              + EXTRACT(month FROM o_orderdate) - 1
                                  AS mo,
                              o_orderstatus AS st, COUNT(*) AS n
                       FROM orders GROUP BY 1, 2, 3),
            q AS (SELECT pr, mo, COUNT(*) AS l, SUM(n) AS rws
                  FROM g GROUP BY 1, 2),
            t AS (SELECT SUM(rws) AS tot FROM q)
            SELECT CAST(l AS BIGINT) AS l_distinct,
                   CAST(COUNT(*) AS BIGINT) AS n_groups,
                   CAST(SUM(rws) AS BIGINT) AS n_rows,
                   CAST(10000 * SUM(rws) // t.tot AS BIGINT)
                       AS rows_share_bps
            FROM q, t GROUP BY 1, t.tot ORDER BY 1
        """,
        "fdr_bh_audit": """
            WITH u AS (SELECT DISTINCT user_id AS uid FROM events),
            p0 AS (SELECT uid,
                          CAST(CAST(('0x' || substr(md5(CAST(uid AS
                               VARCHAR)), 1, 16)) AS UBIGINT)
                               % 1000000 AS BIGINT) AS h
                   FROM u),
            p AS (SELECT uid, CASE WHEN uid % 10 = 0 THEN h // 20
                                   ELSE h END AS pm
                  FROM p0),
            r AS (SELECT pm, ROW_NUMBER() OVER (ORDER BY pm, uid)
                             AS rk
                  FROM p),
            m AS (SELECT COUNT(*) AS m FROM p),
            qs AS (SELECT unnest([10000, 50000, 100000]) AS q),
            k AS (SELECT qs.q AS q,
                         COALESCE(MAX(CASE WHEN r.pm * m.m
                             <= r.rk * qs.q THEN r.rk END), 0) AS k
                  FROM qs, r, m GROUP BY 1)
            SELECT CAST(k.q AS BIGINT) AS q_ppm,
                   CAST(m.m AS BIGINT) AS m_tests,
                   CAST(k.k AS BIGINT) AS k_rejected,
                   CAST(COALESCE((SELECT r2.pm FROM r r2
                                  WHERE r2.rk = k.k), -1) AS BIGINT)
                       AS p_thresh_micro
            FROM k, m ORDER BY 1
        """,
        "discount_emd_by_year": """
            WITH d AS (SELECT EXTRACT(year FROM l_shipdate) AS y,
                              CAST(FLOOR(l_discount * 100 + 0.5)
                                   AS BIGINT) AS lv
                       FROM lineitem),
            c AS (SELECT y, lv, COUNT(*) AS n FROM d GROUP BY 1, 2),
            ys AS (SELECT DISTINCT y FROM d),
            lvs AS (SELECT unnest(generate_series(0, 10)) AS lv),
            grid AS (SELECT ys.y, lvs.lv, COALESCE(c.n, 0) AS n
                     FROM ys CROSS JOIN lvs
                     LEFT JOIN c ON c.y = ys.y AND c.lv = lvs.lv),
            cum AS (SELECT y, lv,
                           SUM(n) OVER (PARTITION BY y ORDER BY lv)
                               AS cm
                    FROM grid),
            tot AS (SELECT y, SUM(n) AS n FROM grid GROUP BY 1),
            pairs AS (SELECT y AS y1, LEAD(y) OVER (ORDER BY y) AS y2
                      FROM ys QUALIFY y2 IS NOT NULL),
            e AS (SELECT p.y1, p.y2, t1.n AS n1, t2.n AS n2,
                         SUM(ABS(a.cm * t2.n - b.cm * t1.n)) AS s
                  FROM pairs p
                  JOIN cum a ON a.y = p.y1 AND a.lv < 10
                  JOIN cum b ON b.y = p.y2 AND b.lv = a.lv
                  JOIN tot t1 ON t1.y = p.y1
                  JOIN tot t2 ON t2.y = p.y2
                  GROUP BY 1, 2, 3, 4)
            SELECT CAST(y1 AS BIGINT) AS y1, CAST(y2 AS BIGINT) AS y2,
                   CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                   CAST(1000 * s // (n1 * n2) AS BIGINT)
                       AS emd_millipoints
            FROM e ORDER BY 1
        """,
        "fd_violation_audit": """
            WITH a0 AS (SELECT o_custkey AS l,
                               COUNT(DISTINCT o_orderpriority) AS d
                        FROM orders GROUP BY 1),
            a1 AS (SELECT (EXTRACT(year FROM o_orderdate) - 1970) * 12
                          + EXTRACT(month FROM o_orderdate) - 1 AS l,
                          COUNT(DISTINCT o_orderstatus) AS d
                   FROM orders GROUP BY 1),
            a2 AS (SELECT l_orderkey AS l,
                          COUNT(DISTINCT l_suppkey) AS d
                   FROM lineitem GROUP BY 1),
            a3 AS (SELECT l_partkey AS l,
                          COUNT(DISTINCT l_suppkey) AS d
                   FROM lineitem GROUP BY 1),
            s AS (SELECT 0 AS fd_id, COUNT(*) AS nl,
                         SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS nv,
                         SUM(d - 1) AS v
                  FROM a0
                  UNION ALL
                  SELECT 1, COUNT(*),
                         SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END),
                         SUM(d - 1)
                  FROM a1
                  UNION ALL
                  SELECT 2, COUNT(*),
                         SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END),
                         SUM(d - 1)
                  FROM a2
                  UNION ALL
                  SELECT 3, COUNT(*),
                         SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END),
                         SUM(d - 1)
                  FROM a3)
            SELECT CAST(fd_id AS BIGINT) AS fd_id,
                   CAST(nl AS BIGINT) AS n_lhs_groups,
                   CAST(nv AS BIGINT) AS n_viol_groups,
                   CAST(v AS BIGINT) AS violations,
                   CAST(CASE WHEN v = 0 THEN 1 ELSE 0 END AS BIGINT)
                       AS holds
            FROM s ORDER BY 1
        """,
        "user_decayed_value": """
            WITH dd AS (SELECT user_id AS u,
                               CAST(FLOOR(value * 100) AS BIGINT)
                                   AS cents,
                               datediff('day', DATE '1970-01-01',
                                        CAST(ts AS DATE)) AS d
                        FROM events),
            w AS (SELECT MAX(d) AS mx FROM dd),
            pu AS (SELECT u,
                          SUM(cents // (CAST(1 AS BIGINT)
                              << LEAST((mx - d) // 4, 40))) AS dv
                   FROM dd, w GROUP BY 1, w.mx),
            b AS (SELECT CASE WHEN dv < 50000 THEN 0
                              WHEN dv < 75000 THEN 1
                              WHEN dv < 100000 THEN 2
                              ELSE 3 END AS band, dv
                  FROM pu)
            SELECT CAST(band AS BIGINT) AS band,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(dv) AS BIGINT) AS sum_decayed_cents
            FROM b GROUP BY 1 ORDER BY 1
        """,
        "part_name_collision_audit": """
            WITH c AS (SELECT COUNT(*) AS n FROM part GROUP BY p_name),
            t AS (SELECT SUM(n) AS tot FROM c),
            b AS (SELECT CASE WHEN n < 2 THEN 0
                              WHEN n < 3 THEN 1
                              WHEN n < 5 THEN 2
                              ELSE 3 END AS band, n
                  FROM c)
            SELECT CAST(band AS BIGINT) AS band,
                   CAST(COUNT(*) AS BIGINT) AS n_names,
                   CAST(SUM(n) AS BIGINT) AS n_parts,
                   CAST(10000 * SUM(n) // tot AS BIGINT)
                       AS parts_share_bps
            FROM b, t GROUP BY 1, tot ORDER BY 1
        """,
        "supplier_return_wilson": """
            WITH g AS (SELECT l_suppkey AS suppkey,
                              COUNT(*) AS n_lines,
                              SUM(CASE WHEN l_returnflag = 'R'
                                  THEN 1 ELSE 0 END) AS n_returns
                       FROM lineitem GROUP BY 1),
            w AS (SELECT suppkey, n_lines, n_returns,
                         10000 * n_returns // n_lines AS ret_bps,
                         CAST(FLOOR(
                           ((CAST(n_returns AS DOUBLE)
                             / CAST(n_lines AS DOUBLE))
                            + (1.96 * 1.96)
                              / (2.0 * CAST(n_lines AS DOUBLE))
                            - 1.96 * sqrt(
                                ((CAST(n_returns AS DOUBLE)
                                  / CAST(n_lines AS DOUBLE))
                                 * (1.0 - CAST(n_returns AS DOUBLE)
                                          / CAST(n_lines AS DOUBLE))
                                 + (1.96 * 1.96)
                                   / (4.0 * CAST(n_lines AS DOUBLE)))
                                / CAST(n_lines AS DOUBLE)))
                           / (1.0 + (1.96 * 1.96)
                                    / CAST(n_lines AS DOUBLE))
                           * 1000000.0) AS BIGINT) AS wilson_lb_micro
                  FROM g)
            SELECT CAST(suppkey AS BIGINT) AS suppkey,
                   CAST(n_lines AS BIGINT) AS n_lines,
                   CAST(n_returns AS BIGINT) AS n_returns,
                   CAST(ret_bps AS BIGINT) AS ret_bps,
                   wilson_lb_micro
            FROM w ORDER BY wilson_lb_micro DESC, suppkey LIMIT 20
        """,
        "docs_readability": r"""
            WITH d AS (SELECT lang,
                              len(list_filter(
                                  regexp_split_to_array(text,
                                                        '[.!?]+'),
                                  x -> regexp_matches(x, '\S')))
                                  AS n_sents,
                              len(regexp_extract_all(text, '\S+'))
                                  AS n_tokens,
                              length(regexp_replace(text, '\s+', '',
                                                    'g'))
                                  AS n_token_chars
                       FROM documents)
            SELECT lang,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_sents) AS BIGINT) AS n_sents,
                   CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
                   CAST(SUM(n_token_chars) AS BIGINT)
                       AS n_token_chars,
                   CAST(1000 * SUM(n_tokens) // SUM(n_sents)
                        AS BIGINT) AS tokens_per_sent_milli,
                   CAST(1000 * SUM(n_token_chars) // SUM(n_tokens)
                        AS BIGINT) AS chars_per_token_milli
            FROM d GROUP BY 1 ORDER BY 1
        """,
        "priority_transition_matrix": """
            WITH o AS (SELECT o_custkey AS c, o_orderpriority AS p,
                              epoch_us(o_orderdate) AS d,
                              o_orderkey AS k
                       FROM orders),
            t AS (SELECT p AS fp,
                         LEAD(p) OVER (PARTITION BY c
                                       ORDER BY d, k) AS tp
                  FROM o),
            g AS (SELECT fp, tp, COUNT(*) AS n
                  FROM t WHERE tp IS NOT NULL GROUP BY 1, 2),
            r AS (SELECT fp, SUM(n) AS rt FROM g GROUP BY 1)
            SELECT g.fp AS from_p, g.tp AS to_p,
                   CAST(n AS BIGINT) AS n,
                   CAST(10000 * n // rt AS BIGINT) AS row_share_bps
            FROM g JOIN r ON g.fp = r.fp ORDER BY 1, 2
        """,
        "boilerplate_overlap_matrix": """
            WITH p AS (SELECT DISTINCT
                           CAST(('0x' || substr(md5(substr(text, 1,
                                40)), 1, 16)) AS UBIGINT) AS h,
                           CAST(substr(source, 4) AS BIGINT) AS s
                       FROM documents),
            c AS (SELECT s, COUNT(*) AS n FROM p GROUP BY 1),
            j AS (SELECT a.s AS src_a, b.s AS src_b,
                         COUNT(*) AS shared
                  FROM p a JOIN p b ON a.h = b.h AND a.s < b.s
                  GROUP BY 1, 2)
            SELECT src_a, src_b, CAST(shared AS BIGINT) AS shared,
                   CAST(ca.n AS BIGINT) AS a_prefixes,
                   CAST(cb.n AS BIGINT) AS b_prefixes,
                   CAST(10000 * shared // (ca.n + cb.n - shared)
                        AS BIGINT) AS jaccard_bps
            FROM j JOIN c ca ON ca.s = j.src_a
                   JOIN c cb ON cb.s = j.src_b
            ORDER BY 1, 2
        """,
        "token_coverage_curve": r"""
            WITH t AS (SELECT unnest(regexp_extract_all(text, '\S+'))
                                  AS tok
                       FROM documents),
            f AS (SELECT CAST(('0x' || substr(md5(tok), 1, 16))
                              AS UBIGINT) AS h,
                         COUNT(*) AS n
                  FROM t GROUP BY 1),
            tt AS (SELECT SUM(n) AS tot, COUNT(*) AS vocab FROM f),
            r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC)
                             AS rk
                  FROM f),
            cc AS (SELECT rk, SUM(n) OVER (ORDER BY rk) AS cum
                   FROM r),
            k AS (SELECT unnest([10, 100, 1000, 10000]) AS kk)
            SELECT CAST(kk AS BIGINT) AS k_checkpoint,
                   CAST(LEAST(kk, vocab) AS BIGINT) AS tokens_used,
                   CAST((SELECT cum FROM cc
                         WHERE rk = LEAST(kk, vocab)) AS BIGINT)
                       AS covered_tokens,
                   CAST(10000 * (SELECT cum FROM cc
                                 WHERE rk = LEAST(kk, vocab)) // tot
                        AS BIGINT) AS coverage_bps
            FROM k, tt ORDER BY 1
        """,
        "kmv_set_ops_audit": """
            WITH ev AS (SELECT DISTINCT
                            CAST(('0x' || substr(md5(CAST(user_id
                                 AS VARCHAR)), 1, 15)) AS UBIGINT)
                                AS h,
                            event_type AS ty
                        FROM events
                        WHERE event_type IN ('click', 'purchase')),
            f AS (SELECT h,
                         MAX(CASE WHEN ty = 'click' THEN 1 ELSE 0
                             END) AS a,
                         MAX(CASE WHEN ty = 'purchase' THEN 1 ELSE 0
                             END) AS b
                  FROM ev GROUP BY 1),
            x AS (SELECT SUM(a) AS na, SUM(b) AS nb,
                         SUM(a * b) AS nab, COUNT(*) AS nu
                  FROM f),
            ra AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS r
                   FROM f WHERE a = 1),
            rb AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS r
                   FROM f WHERE b = 1),
            ru AS (SELECT h, a, b,
                          ROW_NUMBER() OVER (ORDER BY h) AS r
                   FROM f),
            th AS (SELECT (SELECT h FROM ra WHERE r = 128) AS ka,
                          (SELECT h FROM rb WHERE r = 128) AS kb,
                          (SELECT h FROM ru WHERE r = 128) AS ku,
                          (SELECT SUM(a * b) FROM ru WHERE r <= 128)
                              AS nboth),
            est AS (SELECT
                CASE WHEN x.na < 128 THEN x.na
                     ELSE CAST(127 * CAST(1152921504606846976
                          AS HUGEINT) // th.ka AS BIGINT) END AS ea,
                CASE WHEN x.nb < 128 THEN x.nb
                     ELSE CAST(127 * CAST(1152921504606846976
                          AS HUGEINT) // th.kb AS BIGINT) END AS eb,
                CASE WHEN x.nu < 128 THEN x.nu
                     ELSE CAST(127 * CAST(1152921504606846976
                          AS HUGEINT) // th.ku AS BIGINT) END AS eu,
                x.na, x.nb, x.nab, x.nu, th.nboth
                FROM x, th),
            rows_ AS (
                SELECT 'click_users' AS metric, na AS exact_count,
                       ea AS est_count FROM est
                UNION ALL
                SELECT 'intersect_users', nab,
                       CASE WHEN nu < 128 THEN nab
                            ELSE CAST(CAST(nboth AS HUGEINT) * eu
                                 // 128 AS BIGINT) END
                FROM est
                UNION ALL
                SELECT 'purchase_users', nb, eb FROM est
                UNION ALL
                SELECT 'union_users', nu, eu FROM est)
            SELECT metric,
                   CAST(exact_count AS BIGINT) AS exact_count,
                   CAST(est_count AS BIGINT) AS est_count,
                   CAST(CASE WHEN exact_count > 0
                        THEN 10000 * ABS(est_count - exact_count)
                             // exact_count
                        ELSE -1 END AS BIGINT) AS err_bps
            FROM rows_ ORDER BY metric
        """,
        "dedup_threshold_pr": r"""
            WITH el AS (SELECT doc_id, text,
                               ROW_NUMBER() OVER (ORDER BY doc_id) - 1
                                   AS j
                        FROM documents WHERE doc_id % 5 = 0),
            pr AS (SELECT a.j AS pid, a.doc_id AS da, b.doc_id AS db
                   FROM el a JOIN el b ON b.j = a.j + 1),
            tok AS (SELECT doc_id,
                           unnest(regexp_extract_all(text, '\S+'))
                               AS tok
                    FROM el),
            tk AS (SELECT DISTINCT doc_id,
                          CAST(('0x' || substr(md5(tok), 1, 16))
                               AS UBIGINT) AS h
                   FROM tok),
            ji AS (SELECT p.pid, COUNT(*) AS i
                   FROM pr p JOIN tk x ON x.doc_id = p.da
                             JOIN tk y ON y.doc_id = p.db
                                      AND y.h = x.h
                   GROUP BY 1),
            ju AS (SELECT p.pid, COUNT(DISTINCT t.h) AS u
                   FROM pr p JOIN tk t ON t.doc_id = p.da
                                       OR t.doc_id = p.db
                   GROUP BY 1),
            mh AS (SELECT t.doc_id, k.k,
                          MIN(CAST(('0x' || substr(md5(t.tok || '#' ||
                              CAST(k.k AS VARCHAR)), 1, 16))
                              AS UBIGINT)) AS mv
                   FROM tok t,
                        (SELECT unnest(generate_series(0, 63)) AS k) k
                   GROUP BY 1, 2),
            mm AS (SELECT p.pid,
                          SUM(CASE WHEN a.mv = b.mv THEN 1 ELSE 0 END)
                              AS m
                   FROM pr p JOIN mh a ON a.doc_id = p.da
                             JOIN mh b ON b.doc_id = p.db
                                      AND b.k = a.k
                   GROUP BY 1),
            e AS (SELECT p.pid, mm.m, COALESCE(ji.i, 0) AS i, ju.u
                  FROM pr p JOIN mm ON mm.pid = p.pid
                            JOIN ju ON ju.pid = p.pid
                            LEFT JOIN ji ON ji.pid = p.pid),
            kt AS (SELECT unnest([3, 5, 7]) AS tau),
            c AS (SELECT tau,
                         SUM(CASE WHEN 10 * i >= tau * u
                                   AND 10 * m >= 64 * tau
                             THEN 1 ELSE 0 END) AS tp,
                         SUM(CASE WHEN 10 * i < tau * u
                                   AND 10 * m >= 64 * tau
                             THEN 1 ELSE 0 END) AS fp,
                         SUM(CASE WHEN 10 * i >= tau * u
                                   AND 10 * m < 64 * tau
                             THEN 1 ELSE 0 END) AS fn,
                         SUM(CASE WHEN 10 * i < tau * u
                                   AND 10 * m < 64 * tau
                             THEN 1 ELSE 0 END) AS tn
                  FROM e, kt GROUP BY 1)
            SELECT CAST(tau AS BIGINT) AS thresh_decis,
                   CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
                   CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
                   CAST(CASE WHEN tp + fp > 0
                        THEN 10000 * tp // (tp + fp) ELSE -1 END
                        AS BIGINT) AS precision_bps,
                   CAST(CASE WHEN tp + fn > 0
                        THEN 10000 * tp // (tp + fn) ELSE -1 END
                        AS BIGINT) AS recall_bps
            FROM c ORDER BY 1
        """,
        "simpson_paradox_audit": """
            WITH d AS (SELECT l_returnflag AS grp,
                              CAST(FLOOR(l_discount * 100) AS BIGINT)
                                  AS x,
                              CAST(FLOOR(l_quantity) AS BIGINT) AS y
                       FROM lineitem),
            g AS (SELECT grp, COUNT(*) AS n, SUM(x) AS sx,
                         SUM(y) AS sy, SUM(x * x) AS sxx,
                         SUM(x * y) AS sxy
                  FROM d GROUP BY 1
                  UNION ALL
                  SELECT 'ALL', COUNT(*), SUM(x), SUM(y),
                         SUM(x * x), SUM(x * y)
                  FROM d),
            s AS (SELECT grp, n,
                         CAST(n AS HUGEINT) * sxy
                             - CAST(sx AS HUGEINT) * sy AS num,
                         CAST(n AS HUGEINT) * sxx
                             - CAST(sx AS HUGEINT) * sx AS den
                  FROM g)
            SELECT grp, CAST(n AS BIGINT) AS n_lines,
                   CAST(CASE WHEN den > 0 THEN
                        (CASE WHEN num > 0 THEN 1
                              WHEN num < 0 THEN -1 ELSE 0 END)
                        * ((1000 * ABS(num)) // den)
                        ELSE 0 END AS BIGINT) AS slope_milli,
                   CAST(CASE WHEN num > 0 THEN 1
                             WHEN num < 0 THEN -1 ELSE 0 END
                        AS BIGINT) AS slope_sign
            FROM s ORDER BY grp
        """,
        "zipf_slope_audit": r"""
            WITH t AS (SELECT unnest(regexp_extract_all(text, '\S+'))
                                  AS tok
                       FROM documents),
            f AS (SELECT CAST(('0x' || substr(md5(tok), 1, 16))
                              AS UBIGINT) AS h,
                         COUNT(*) AS n
                  FROM t GROUP BY 1),
            r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC)
                             AS rk
                  FROM f),
            p AS (SELECT CAST(LENGTH(printf('%b', rk)) - 1
                              AS BIGINT) AS x,
                         CAST(LENGTH(printf('%b', n)) - 1
                              AS BIGINT) AS y
                  FROM r),
            m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                         SUM(CAST(x AS HUGEINT)) AS sx,
                         SUM(CAST(y AS HUGEINT)) AS sy,
                         SUM(CAST(x AS HUGEINT) * x) AS sxx,
                         SUM(CAST(y AS HUGEINT) * y) AS syy,
                         SUM(CAST(x AS HUGEINT) * y) AS sxy
                  FROM p),
            s AS (SELECT n, n * sxy - sx * sy AS num,
                         n * sxx - sx * sx AS den,
                         n * syy - sy * sy AS syc,
                         (SELECT SUM(n) FROM f) AS tot
                  FROM m)
            SELECT CAST(n AS BIGINT) AS vocab,
                   CAST(tot AS BIGINT) AS total_tokens,
                   CAST(CASE WHEN den > 0 THEN
                        (CASE WHEN num > 0 THEN 1
                              WHEN num < 0 THEN -1 ELSE 0 END)
                        * ((1000 * ABS(num)) // den)
                        ELSE 0 END AS BIGINT) AS slope_milli,
                   CAST(CASE WHEN den > 0 AND syc > 0
                        THEN (10000 * num * num) // (den * syc)
                        ELSE 10000 END AS BIGINT) AS r2_bps
            FROM s
        """,
        "embedding_isotropy_audit": """
            WITH u AS (SELECT vec_id,
                              CAST(FLOOR(CAST(unnest(embedding)
                                   AS DOUBLE) * 1000.0) AS BIGINT)
                                  AS iv,
                              unnest(generate_series(1,
                                  len(embedding))) AS dim
                       FROM embeddings),
            m AS (SELECT dim, SUM(iv) AS s, SUM(iv * iv) AS sq,
                         COUNT(*) AS n
                  FROM u GROUP BY 1),
            x AS (SELECT a.dim AS i, b.dim AS j,
                         SUM(a.iv * b.iv) AS sij
                  FROM u a JOIN u b ON a.vec_id = b.vec_id
                                   AND a.dim < b.dim
                  GROUP BY 1, 2),
            p AS (SELECT
                      CAST(ma.n AS HUGEINT) * x.sij
                          - CAST(ma.s AS HUGEINT) * mb.s AS num,
                      CAST(ma.n AS HUGEINT) * ma.sq
                          - CAST(ma.s AS HUGEINT) * ma.s AS di,
                      CAST(mb.n AS HUGEINT) * mb.sq
                          - CAST(mb.s AS HUGEINT) * mb.s AS dj
                  FROM x JOIN m ma ON ma.dim = x.i
                         JOIN m mb ON mb.dim = x.j),
            c AS (SELECT COUNT(*) AS np,
                         SUM(CASE WHEN 10000 * num * num
                                  >= 25 * di * dj
                             THEN 1 ELSE 0 END) AS g5,
                         SUM(CASE WHEN 10000 * num * num
                                  >= 100 * di * dj
                             THEN 1 ELSE 0 END) AS g10,
                         SUM(CASE WHEN 10000 * num * num
                                  >= 400 * di * dj
                             THEN 1 ELSE 0 END) AS g20
                  FROM p),
            meta AS (SELECT MAX(dim) AS d, MAX(n) AS nv FROM m)
            SELECT CAST(d AS BIGINT) AS d,
                   CAST(nv AS BIGINT) AS n_vecs,
                   CAST(np AS BIGINT) AS n_pairs,
                   CAST(g5 AS BIGINT) AS ge5,
                   CAST(g10 AS BIGINT) AS ge10,
                   CAST(g20 AS BIGINT) AS ge20,
                   CAST(10000 * g5 // np AS BIGINT) AS ge5_bps,
                   CAST(10000 * g10 // np AS BIGINT) AS ge10_bps,
                   CAST(10000 * g20 // np AS BIGINT) AS ge20_bps
            FROM c, meta
        """,
        "kfold_balance_audit": """
            WITH d AS (SELECT CAST(CAST(('0x' || substr(md5(
                               CAST(doc_id AS VARCHAR)), 1, 16))
                               AS UBIGINT) % 5 AS BIGINT) AS fold,
                              source
                       FROM documents),
            o AS (SELECT fold, source, COUNT(*) AS o
                  FROM d GROUP BY 1, 2),
            r AS (SELECT fold, SUM(o) AS rt FROM o GROUP BY 1),
            c AS (SELECT source, SUM(o) AS ct FROM o GROUP BY 1),
            n AS (SELECT SUM(o) AS n FROM o),
            cell AS (SELECT r.fold, c.source, r.rt, c.ct, n.n,
                            COALESCE(o.o, 0) AS o
                     FROM r CROSS JOIN c CROSS JOIN n
                          LEFT JOIN o ON o.fold = r.fold
                                     AND o.source = c.source),
            ch AS (SELECT fold, source, rt,
                          CAST((1000 * (CAST(n AS HUGEINT) * o
                                        - CAST(rt AS HUGEINT) * ct)
                                     * (CAST(n AS HUGEINT) * o
                                        - CAST(rt AS HUGEINT) * ct))
                               // (CAST(n AS HUGEINT) * rt * ct)
                               AS BIGINT) AS contrib
                   FROM cell),
            w AS (SELECT fold, source, contrib,
                         ROW_NUMBER() OVER (PARTITION BY fold
                             ORDER BY contrib DESC, source) AS rk
                  FROM ch)
            SELECT ch.fold,
                   CAST(MAX(ch.rt) AS BIGINT) AS n_docs,
                   CAST(SUM(ch.contrib) AS BIGINT) AS chi2_milli,
                   MAX(CASE WHEN w.rk = 1 THEN w.source END)
                       AS worst_source,
                   CAST(MAX(CASE WHEN w.rk = 1 THEN w.contrib END)
                        AS BIGINT) AS worst_cell_milli
            FROM ch JOIN w ON w.fold = ch.fold
                          AND w.source = ch.source
            GROUP BY ch.fold ORDER BY ch.fold
        """,
        "tcloseness_audit": """
            WITH d AS (SELECT o_orderpriority AS pr,
                              date_trunc('month', o_orderdate) AS mo,
                              o_orderstatus AS st
                       FROM orders),
            o AS (SELECT pr, mo, st, COUNT(*) AS n
                  FROM d GROUP BY 1, 2, 3),
            cs AS (SELECT st, SUM(n) AS c FROM o GROUP BY 1),
            nn AS (SELECT SUM(n) AS big_n FROM o),
            grp AS (SELECT pr, mo, SUM(n) AS g FROM o GROUP BY 1, 2),
            cell AS (SELECT grp.pr, grp.mo, grp.g, cs.st, cs.c,
                            COALESCE(o.n, 0) AS os
                     FROM grp CROSS JOIN cs
                          LEFT JOIN o ON o.pr = grp.pr
                                     AND o.mo = grp.mo
                                     AND o.st = cs.st),
            tv AS (SELECT pr, mo, MAX(g) AS g,
                          (10000 * SUM(ABS(CAST(os AS HUGEINT)
                                           * big_n
                                           - CAST(g AS HUGEINT)
                                             * c)))
                          // (2 * CAST(MAX(g) AS HUGEINT) * big_n)
                              AS tvb
                   FROM cell, nn GROUP BY pr, mo, big_n),
            b AS (SELECT CASE WHEN tvb <= 1000 THEN 0
                              WHEN tvb <= 2000 THEN 1
                              WHEN tvb <= 3000 THEN 2
                              ELSE 3 END AS band, g, tvb
                  FROM tv)
            SELECT CAST(band AS BIGINT) AS band,
                   CAST(COUNT(*) AS BIGINT) AS n_groups,
                   CAST(SUM(g) AS BIGINT) AS n_rows,
                   CAST(MAX(tvb) AS BIGINT) AS max_tv_bps,
                   CAST(10000 * SUM(g) // (SELECT big_n FROM nn)
                        AS BIGINT) AS rows_share_bps
            FROM b GROUP BY 1 ORDER BY 1
        """,
        "ab_power_mde": """
            WITH u AS (SELECT DISTINCT user_id, event_type
                       FROM events),
            nt AS (SELECT event_type, COUNT(*) AS n_with
                   FROM u GROUP BY 1),
            nn AS (SELECT COUNT(DISTINCT user_id) AS n_users
                   FROM events)
            SELECT event_type,
                   CAST(n_users AS BIGINT) AS n_users,
                   CAST(n_with AS BIGINT) AS n_with,
                   CAST(10000 * n_with // n_users AS BIGINT)
                       AS p_bps,
                   CAST(FLOOR(10000.0 * (2.8 * sqrt(
                        (2.0 * (CAST(n_with AS DOUBLE)
                                / CAST(n_users AS DOUBLE))
                         * (1.0 - CAST(n_with AS DOUBLE)
                                  / CAST(n_users AS DOUBLE)))
                        / (n_users // 2)))) AS BIGINT) AS mde_bps
            FROM nt, nn ORDER BY event_type
        """,
        "token_burstiness": r"""
            WITH t AS (SELECT doc_id,
                              unnest(regexp_extract_all(text, '\S+'))
                                  AS tok
                       FROM documents),
            h AS (SELECT doc_id,
                         CAST(('0x' || substr(md5(tok), 1, 15))
                              AS UBIGINT) AS h
                  FROM t),
            f AS (SELECT h, COUNT(*) AS cf,
                         COUNT(DISTINCT doc_id) AS df
                  FROM h GROUP BY 1),
            r AS (SELECT h, cf, df,
                         ROW_NUMBER() OVER (ORDER BY cf DESC, h)
                             AS rk
                  FROM f QUALIFY rk <= 20)
            SELECT CAST(rk AS BIGINT) AS rk,
                   CAST(h AS BIGINT) AS tok_hash,
                   CAST(cf AS BIGINT) AS cf,
                   CAST(df AS BIGINT) AS df,
                   CAST(1000 * cf // df AS BIGINT)
                       AS burstiness_milli
            FROM r ORDER BY rk
        """,
        "fold_leakage_audit": r"""
            WITH el AS (SELECT doc_id, text,
                               ROW_NUMBER() OVER (ORDER BY doc_id) - 1
                                   AS j
                        FROM documents WHERE doc_id % 5 = 0),
            pr AS (SELECT a.j AS pid, a.doc_id AS da, b.doc_id AS db,
                          CAST(CAST(('0x' || substr(md5(CAST(a.doc_id
                               AS VARCHAR)), 1, 16)) AS UBIGINT) % 5
                               AS BIGINT) AS fa,
                          CAST(CAST(('0x' || substr(md5(CAST(b.doc_id
                               AS VARCHAR)), 1, 16)) AS UBIGINT) % 5
                               AS BIGINT) AS fb
                   FROM el a JOIN el b ON b.j = a.j + 1),
            tok AS (SELECT doc_id,
                           unnest(regexp_extract_all(text, '\S+'))
                               AS tok
                    FROM el),
            tk AS (SELECT DISTINCT doc_id,
                          CAST(('0x' || substr(md5(tok), 1, 16))
                               AS UBIGINT) AS h
                   FROM tok),
            ji AS (SELECT p.pid, COUNT(*) AS i
                   FROM pr p JOIN tk x ON x.doc_id = p.da
                             JOIN tk y ON y.doc_id = p.db
                                      AND y.h = x.h
                   GROUP BY 1),
            ju AS (SELECT p.pid, COUNT(DISTINCT t.h) AS u
                   FROM pr p JOIN tk t ON t.doc_id = p.da
                                       OR t.doc_id = p.db
                   GROUP BY 1),
            e AS (SELECT p.pid, p.fa, p.fb,
                         COALESCE(ji.i, 0) AS i, ju.u
                  FROM pr p JOIN ju ON ju.pid = p.pid
                            LEFT JOIN ji ON ji.pid = p.pid),
            d AS (SELECT fa, fb FROM e WHERE 2 * i >= u)
            SELECT CAST((SELECT COUNT(*) FROM pr) AS BIGINT)
                       AS n_pairs,
                   CAST(COUNT(*) AS BIGINT) AS n_dups,
                   CAST(COALESCE(SUM(CASE WHEN fa = fb THEN 1
                                     ELSE 0 END), 0) AS BIGINT)
                       AS same_fold,
                   CAST(COALESCE(SUM(CASE WHEN fa <> fb THEN 1
                                     ELSE 0 END), 0) AS BIGINT)
                       AS cross_fold,
                   CAST(CASE WHEN COUNT(*) > 0
                        THEN 10000 * COALESCE(SUM(CASE WHEN fa <> fb
                                               THEN 1 ELSE 0 END), 0)
                             // COUNT(*)
                        ELSE 0 END AS BIGINT) AS leakage_bps
            FROM d
        """,
        "poisson_bootstrap_ci": """
            WITH h AS (SELECT CAST(FLOOR(o_totalprice * 100)
                                   AS BIGINT) AS cents,
                              CAST(CAST(('0x' || substr(md5(
                                  CAST(o_orderkey AS VARCHAR)), 1, 16))
                                  AS UBIGINT) % 1000 AS BIGINT) AS h1,
                              CAST(CAST(('0x' || substr(md5(
                                  CAST(o_orderkey AS VARCHAR)), 17, 16))
                                  AS UBIGINT) % 999 AS BIGINT) + 1
                                  AS step
                       FROM orders),
            w AS (SELECT b.b, cents,
                              CASE WHEN m < 368 THEN 0
                                   WHEN m < 736 THEN 1
                                   WHEN m < 920 THEN 2
                                   WHEN m < 981 THEN 3
                                   WHEN m < 996 THEN 4
                                   ELSE 5 END AS w
                       FROM (SELECT h.cents, b.b,
                                    (h.h1 + b.b * h.step) % 1000 AS m
                             FROM h,
                                  (SELECT unnest(generate_series(0,
                                       63)) AS b) b) b),
            r AS (SELECT b, SUM(w * cents) AS s, SUM(w) AS c
                  FROM w GROUP BY 1),
            mm AS (SELECT s // GREATEST(c, 1) AS mean FROM r),
            q AS (SELECT mean, ROW_NUMBER() OVER (ORDER BY mean)
                             AS rk
                  FROM mm)
            SELECT CAST(64 AS BIGINT) AS n_reps,
                   CAST((SELECT SUM(mean) FROM mm) // 64 AS BIGINT)
                       AS mean_of_means_cents,
                   CAST(MAX(CASE WHEN rk = 4 THEN mean END)
                        AS BIGINT) AS p5_cents,
                   CAST(MAX(CASE WHEN rk = 33 THEN mean END)
                        AS BIGINT) AS p50_cents,
                   CAST(MAX(CASE WHEN rk = 61 THEN mean END)
                        AS BIGINT) AS p95_cents,
                   CAST(MAX(CASE WHEN rk = 61 THEN mean END)
                        - MAX(CASE WHEN rk = 4 THEN mean END)
                        AS BIGINT) AS ci_width_cents
            FROM q
        """,
        "survivorship_bias_audit": """
            WITH o AS (SELECT o_custkey AS c,
                              epoch_us(o_orderdate) AS d,
                              o_orderkey AS k,
                              EXTRACT(year FROM o_orderdate) AS yr,
                              CAST(FLOOR(o_totalprice * 100)
                                   AS BIGINT) AS cents
                       FROM orders),
            f AS (SELECT c, FIRST(yr ORDER BY d, k) AS fy,
                         FIRST(cents ORDER BY d, k) AS fc,
                         COUNT(*) AS cnt
                  FROM o GROUP BY 1),
            g AS (SELECT fy AS yr,
                         CASE WHEN cnt >= 2 THEN 1 ELSE 0 END AS rep,
                         COUNT(*) AS n, SUM(fc) AS s
                  FROM f GROUP BY 1, 2),
            p AS (SELECT yr,
                         COALESCE(MAX(CASE WHEN rep = 0 THEN n END),
                                  0) AS n1,
                         COALESCE(MAX(CASE WHEN rep = 0 THEN s END),
                                  0) AS s1,
                         COALESCE(MAX(CASE WHEN rep = 1 THEN n END),
                                  0) AS nr,
                         COALESCE(MAX(CASE WHEN rep = 1 THEN s END),
                                  0) AS sr
                  FROM g GROUP BY 1)
            SELECT CAST(yr AS BIGINT) AS cohort_year,
                   CAST(n1 AS BIGINT) AS n_oneshot,
                   CAST(nr AS BIGINT) AS n_repeat,
                   CAST(CASE WHEN n1 > 0 THEN s1 // n1 ELSE 0 END
                        AS BIGINT) AS avg_first_oneshot_cents,
                   CAST(CASE WHEN nr > 0 THEN sr // nr ELSE 0 END
                        AS BIGINT) AS avg_first_repeat_cents,
                   CAST(CASE WHEN n1 = 0 OR nr = 0 OR s1 = 0 THEN 0
                        ELSE (CASE WHEN CAST(sr AS HUGEINT) * n1
                                        - CAST(s1 AS HUGEINT) * nr
                                        > 0 THEN 1
                                   WHEN CAST(sr AS HUGEINT) * n1
                                        - CAST(s1 AS HUGEINT) * nr
                                        < 0 THEN -1
                                   ELSE 0 END)
                             * ((10000 * ABS(CAST(sr AS HUGEINT) * n1
                                             - CAST(s1 AS HUGEINT)
                                               * nr))
                                // (CAST(s1 AS HUGEINT) * nr))
                        END AS BIGINT) AS uplift_bps
            FROM p ORDER BY 1
        """,
        "f2_ams_audit": """
            WITH hv AS (SELECT CAST(('0x' || substr(md5(
                                 CAST(l_partkey AS VARCHAR)), 1, 16))
                                 AS UBIGINT) AS h
                        FROM lineitem),
            sg AS (SELECT CASE WHEN (h >> j.j) & 1 = 1
                               THEN 1 ELSE -1 END AS sgn,
                          j.j AS j
                   FROM hv,
                        (SELECT unnest(generate_series(0, 15))
                             AS j) j),
            es AS (SELECT j, SUM(sgn) AS ss FROM sg GROUP BY 1),
            e2 AS (SELECT ss * ss AS e FROM es),
            r AS (SELECT e, ROW_NUMBER() OVER (ORDER BY e) AS rk
                  FROM e2),
            ex AS (SELECT SUM(CAST(c AS HUGEINT) * c) AS f2,
                          COUNT(*) AS nk, SUM(c) AS nr
                   FROM (SELECT COUNT(*) AS c FROM lineitem
                         GROUP BY l_partkey))
            SELECT CAST(nr AS BIGINT) AS n_rows,
                   CAST(nk AS BIGINT) AS n_keys,
                   CAST(f2 AS BIGINT) AS f2_exact,
                   CAST((SELECT e FROM r WHERE rk = 8) AS BIGINT)
                       AS f2_est,
                   CAST(CASE WHEN f2 > 0
                        THEN 10000 * ABS((SELECT e FROM r
                                          WHERE rk = 8) - f2) // f2
                        ELSE 0 END AS BIGINT) AS err_bps
            FROM ex
        """,
        "frequency_cap_audit": """
            WITH c AS (SELECT user_id, CAST(ts AS DATE) AS dy,
                              COUNT(*) AS n
                       FROM events GROUP BY 1, 2),
            t AS (SELECT SUM(n) AS ev, COUNT(*) AS ud FROM c),
            k AS (SELECT unnest([5, 10, 20]) AS cap)
            SELECT CAST(k.cap AS BIGINT) AS cap,
                   CAST(MAX(t.ud) AS BIGINT) AS n_user_days,
                   CAST(SUM(CASE WHEN c.n > k.cap THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_over,
                   CAST(SUM(CASE WHEN c.n > k.cap THEN c.n - k.cap
                            ELSE 0 END) AS BIGINT) AS excess,
                   CAST(MAX(t.ev) AS BIGINT) AS n_events,
                   CAST(10000 * SUM(CASE WHEN c.n > k.cap
                                    THEN c.n - k.cap ELSE 0 END)
                        // MAX(t.ev) AS BIGINT) AS excess_share_bps
            FROM c, k, t GROUP BY k.cap ORDER BY 1
        """,
        "cms_width_sweep": r"""
            WITH t AS (SELECT doc_id,
                              unnest(regexp_extract_all(text, '\S+'))
                                  AS tok
                       FROM documents),
            pr AS (SELECT DISTINCT tok FROM t
                   WHERE doc_id % 199 = 0),
            ex AS (SELECT t.tok, COUNT(*) AS n
                   FROM t JOIN pr ON pr.tok = t.tok GROUP BY 1),
            wd AS (SELECT unnest([256, 1024, 4096]) AS w),
            dp AS (SELECT unnest(generate_series(0, 3)) AS d),
            sk AS (SELECT wd.w, dp.d,
                          CAST(('0x' || substr(md5(t.tok || '#' ||
                               CAST(dp.d AS VARCHAR)), 1, 15))
                               AS UBIGINT) % wd.w AS cell,
                          COUNT(*) AS n
                   FROM t, wd, dp GROUP BY 1, 2, 3),
            pe AS (SELECT wd.w, pr.tok, dp.d,
                          CAST(('0x' || substr(md5(pr.tok || '#' ||
                               CAST(dp.d AS VARCHAR)), 1, 15))
                               AS UBIGINT) % wd.w AS cell
                   FROM pr, wd, dp),
            est AS (SELECT pe.w, pe.tok,
                           MIN(COALESCE(sk.n, 0)) AS est
                    FROM pe LEFT JOIN sk ON sk.w = pe.w
                                        AND sk.d = pe.d
                                        AND sk.cell = pe.cell
                    GROUP BY 1, 2),
            j AS (SELECT e.w, e.est, ex.n AS ex
                  FROM est e JOIN ex ON ex.tok = e.tok)
            SELECT CAST(w AS BIGINT) AS width,
                   CAST(COUNT(*) AS BIGINT) AS n_probes,
                   CAST(SUM(ex) AS BIGINT) AS exact_total,
                   CAST(SUM(est) AS BIGINT) AS est_total,
                   CAST(10000 * (SUM(est) - SUM(ex)) // SUM(ex)
                        AS BIGINT) AS mean_over_bps,
                   CAST(MAX(10000 * (est - ex) // ex) AS BIGINT)
                       AS max_over_bps,
                   CAST(10000 * SUM(CASE WHEN est = ex THEN 1
                                    ELSE 0 END) // COUNT(*)
                        AS BIGINT) AS exact_hit_bps
            FROM j GROUP BY 1 ORDER BY 1
        """,
        "ratio_delta_method": """
            WITH e AS (SELECT user_id AS u, CAST(ts AS DATE) AS dy,
                              CASE WHEN event_type = 'purchase'
                                   THEN CAST(FLOOR(value * 100)
                                             AS BIGINT)
                                   ELSE 0 END AS cents
                       FROM events),
            pu AS (SELECT u, SUM(cents) AS x,
                          COUNT(DISTINCT dy) AS y
                   FROM e GROUP BY 1),
            m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                         SUM(CAST(x AS HUGEINT)) AS sx,
                         SUM(CAST(y AS HUGEINT)) AS sy,
                         SUM(CAST(x AS HUGEINT) * x) AS sxx,
                         SUM(CAST(y AS HUGEINT) * y) AS syy,
                         SUM(CAST(x AS HUGEINT) * y) AS sxy
                  FROM pu),
            v1 AS (SELECT n, sx, sy, sxx, syy, sxy,
                          CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
                              AS mx,
                          CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                              AS my
                   FROM m),
            v2 AS (SELECT *,
                          CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
                              - mx * mx AS vx,
                          CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
                              - my * my AS vy,
                          CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
                              - mx * my AS cxy,
                          mx / my AS r
                   FROM v1),
            v3 AS (SELECT *,
                          (vx - 2.0 * r * cxy + r * r * vy)
                          / (CAST(n AS DOUBLE) * my * my) AS var
                   FROM v2)
            SELECT CAST(n AS BIGINT) AS n_users,
                   CAST(sx AS BIGINT) AS sum_cents,
                   CAST(sy AS BIGINT) AS sum_days,
                   CAST(1000 * sx // sy AS BIGINT) AS ratio_milli,
                   CAST(CASE WHEN var > 0
                        THEN FLOOR(1000000.0 * sqrt(var))
                        ELSE 0 END AS BIGINT) AS se_micro
            FROM v3
        """,
        "churn_rule_confusion": """
            WITH d AS (SELECT user_id AS u,
                              datediff('day', DATE '1970-01-01',
                                       CAST(ts AS DATE)) AS dy
                       FROM events),
            w AS (SELECT (MIN(dy) + MAX(dy) + 1) // 2 AS mid FROM d),
            pu AS (SELECT u, w.mid AS mid,
                          MAX(CASE WHEN dy < mid THEN dy END)
                              AS last1,
                          MAX(CASE WHEN dy >= mid THEN 1 ELSE 0 END)
                              AS any2
                   FROM d, w GROUP BY 1, 2),
            c AS (SELECT mid,
                         CASE WHEN last1 IS NULL THEN NULL
                              WHEN mid - last1 > 30 AND any2 = 0
                                  THEN 'tp'
                              WHEN mid - last1 > 30 AND any2 = 1
                                  THEN 'fp'
                              WHEN any2 = 0 THEN 'fn'
                              ELSE 'tn' END AS cell
                  FROM pu)
            SELECT CAST(MAX(mid) AS BIGINT) AS mid_day,
                   CAST(COUNT(cell) AS BIGINT) AS n_h1_users,
                   CAST(SUM(CASE WHEN cell = 'tp' THEN 1 ELSE 0 END)
                        AS BIGINT) AS tp,
                   CAST(SUM(CASE WHEN cell = 'fp' THEN 1 ELSE 0 END)
                        AS BIGINT) AS fp,
                   CAST(SUM(CASE WHEN cell = 'fn' THEN 1 ELSE 0 END)
                        AS BIGINT) AS fn,
                   CAST(SUM(CASE WHEN cell = 'tn' THEN 1 ELSE 0 END)
                        AS BIGINT) AS tn,
                   CAST(CASE WHEN SUM(CASE WHEN cell IN ('tp', 'fp')
                                    THEN 1 ELSE 0 END) > 0
                        THEN 10000 * SUM(CASE WHEN cell = 'tp'
                                         THEN 1 ELSE 0 END)
                             // SUM(CASE WHEN cell IN ('tp', 'fp')
                                    THEN 1 ELSE 0 END)
                        ELSE -1 END AS BIGINT) AS precision_bps,
                   CAST(CASE WHEN SUM(CASE WHEN cell IN ('tp', 'fn')
                                    THEN 1 ELSE 0 END) > 0
                        THEN 10000 * SUM(CASE WHEN cell = 'tp'
                                         THEN 1 ELSE 0 END)
                             // SUM(CASE WHEN cell IN ('tp', 'fn')
                                    THEN 1 ELSE 0 END)
                        ELSE -1 END AS BIGINT) AS recall_bps
            FROM c
        """,
        "hdr_quantile_audit": """
            WITH c AS (SELECT CAST(FLOOR(value * 100) AS BIGINT)
                                  AS v,
                              COUNT(*) AS n
                       FROM events GROUP BY 1),
            t AS (SELECT SUM(n) AS total FROM c),
            r AS (SELECT v, SUM(n) OVER (ORDER BY v) AS cum FROM c),
            b AS (SELECT LENGTH(printf('%b', v + 1)) - 1 AS bk,
                         SUM(n) AS nb
                  FROM c GROUP BY 1),
            rb AS (SELECT bk, SUM(nb) OVER (ORDER BY bk) AS cumb
                   FROM b),
            k AS (SELECT unnest([50, 90, 99]) AS p),
            kk AS (SELECT p, (p * (total - 1)) // 100 AS kix
                   FROM k, t),
            ex AS (SELECT p,
                          (SELECT MIN(v) FROM r
                           WHERE cum >= kix + 1) AS exact,
                          (SELECT MIN(bk) FROM rb
                           WHERE cumb >= kix + 1) AS bq
                   FROM kk)
            SELECT CAST(p AS BIGINT) AS p,
                   CAST(exact AS BIGINT) AS exact_cents,
                   CAST((CAST(1 AS BIGINT) << (bq + 1)) - 2
                        AS BIGINT) AS hdr_est_cents,
                   CAST(10000 * ((CAST(1 AS BIGINT) << (bq + 1)) - 2
                                 - exact)
                        // GREATEST(exact, 1) AS BIGINT) AS err_bps
            FROM ex ORDER BY p
        """,
        "ab_srm_check": """
            WITH e AS (SELECT SUM(CASE WHEN user_id % 2 = 0 THEN 1
                                  ELSE 0 END) AS a,
                              SUM(CASE WHEN user_id % 2 = 1 THEN 1
                                  ELSE 0 END) AS b
                       FROM events),
            u AS (SELECT SUM(CASE WHEN user_id % 2 = 0 THEN 1
                             ELSE 0 END) AS a,
                         SUM(CASE WHEN user_id % 2 = 1 THEN 1
                             ELSE 0 END) AS b
                  FROM (SELECT DISTINCT user_id FROM events)),
            r AS (SELECT 'events' AS unit, a, b FROM e
                  UNION ALL
                  SELECT 'users', a, b FROM u)
            SELECT unit, CAST(a AS BIGINT) AS n_a,
                   CAST(b AS BIGINT) AS n_b,
                   CAST(1000 * (a - b) * (a - b) // (a + b)
                        AS BIGINT) AS chi2_milli,
                   CAST(CASE WHEN 1000 * (a - b) * (a - b) // (a + b)
                             > 3841 THEN 1 ELSE 0 END AS BIGINT)
                       AS srm_flag
            FROM r ORDER BY unit
        """,
        "mta_linear_credit": """
            WITH p AS (SELECT event_id AS pid, user_id AS u,
                              ts AS tp
                       FROM events WHERE event_type = 'purchase'),
            w AS (SELECT p.pid, e.event_type AS ty, COUNT(*) AS c
                  FROM p JOIN events e
                       ON e.user_id = p.u
                      AND e.event_type <> 'purchase'
                      AND e.ts < p.tp
                      AND e.ts >= p.tp - INTERVAL 7 DAY
                  GROUP BY 1, 2),
            nt AS (SELECT pid, SUM(c) AS n FROM w GROUP BY 1),
            cr AS (SELECT w.ty, SUM(w.c) AS touches,
                          SUM(1000 * w.c // nt.n) AS credit
                   FROM w JOIN nt USING (pid) GROUP BY 1),
            tot AS (SELECT COUNT(*) AS np FROM p),
            att AS (SELECT COUNT(*) AS na FROM nt),
            sc AS (SELECT SUM(credit) AS s FROM cr)
            SELECT ty AS event_type,
                   CAST(touches AS BIGINT) AS touches,
                   CAST(credit AS BIGINT) AS credit_milli,
                   CAST(CASE WHEN s > 0 THEN 10000 * credit // s
                        ELSE 0 END AS BIGINT) AS credit_share_bps,
                   CAST(np AS BIGINT) AS n_purchases,
                   CAST(na AS BIGINT) AS n_attributed
            FROM cr, tot, att, sc ORDER BY 1
        """,
        "mta_position_credit": """
            WITH p AS (SELECT event_id AS pid, user_id AS u, ts AS tp
                       FROM events WHERE event_type = 'purchase'),
            w AS (SELECT p.pid, e.event_type AS ty,
                         ROW_NUMBER() OVER (PARTITION BY p.pid
                             ORDER BY e.ts, e.event_id) AS rf,
                         ROW_NUMBER() OVER (PARTITION BY p.pid
                             ORDER BY e.ts DESC, e.event_id DESC)
                             AS rl,
                         COUNT(*) OVER (PARTITION BY p.pid) AS n
                  FROM p JOIN events e
                       ON e.user_id = p.u
                      AND e.event_type <> 'purchase'
                      AND e.ts < p.tp
                      AND e.ts >= p.tp - INTERVAL 7 DAY),
            g AS (SELECT pid, ty, MAX(n) AS n, COUNT(*) AS c,
                         SUM(CASE WHEN rf = 1 THEN 1 ELSE 0 END)
                             AS isf,
                         SUM(CASE WHEN rl = 1 THEN 1 ELSE 0 END)
                             AS isl,
                         SUM(CASE WHEN rf > 1 AND rl > 1 THEN 1
                             ELSE 0 END) AS mc
                  FROM w GROUP BY 1, 2),
            cr AS (SELECT ty, SUM(c) AS touches, SUM(isf) AS ft,
                          SUM(isl) AS lt,
                          SUM(CASE WHEN n = 1 THEN 1000 * isf
                                   WHEN n = 2 THEN 500 * isf
                                        + 500 * isl
                                   ELSE 400 * isf + 400 * isl
                                        + (200 * mc) // (n - 2)
                              END) AS credit
                   FROM g GROUP BY 1),
            sc AS (SELECT SUM(credit) AS s FROM cr)
            SELECT ty AS event_type,
                   CAST(touches AS BIGINT) AS touches,
                   CAST(ft AS BIGINT) AS first_touch,
                   CAST(lt AS BIGINT) AS last_touch,
                   CAST(credit AS BIGINT) AS credit_milli,
                   CAST(CASE WHEN s > 0 THEN 10000 * credit // s
                        ELSE 0 END AS BIGINT) AS credit_share_bps
            FROM cr, sc ORDER BY 1
        """,
        "vocab_richness_chao1": r"""
            WITH t AS (SELECT source,
                              unnest(regexp_extract_all(text, '\S+'))
                                  AS tok
                       FROM documents),
            c AS (SELECT source, tok, COUNT(*) AS n
                  FROM t GROUP BY 1, 2),
            s AS (SELECT source, COUNT(*) AS nd, SUM(n) AS nt,
                         SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS f1,
                         SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS f2
                  FROM c GROUP BY 1)
            SELECT source, CAST(nt AS BIGINT) AS n_tokens,
                   CAST(nd AS BIGINT) AS n_distinct,
                   CAST(f1 AS BIGINT) AS f1,
                   CAST(f2 AS BIGINT) AS f2,
                   CAST(1000 * nd + (1000 * f1 * (f1 - 1))
                        // (2 * (f2 + 1)) AS BIGINT) AS chao1_milli,
                   CAST(10000 * f1 // GREATEST(nt, 1) AS BIGINT)
                       AS unseen_mass_bps
            FROM s ORDER BY 1
        """,
        "jackknife_mean_se": """
            WITH o AS (SELECT CAST(('0x' || substr(md5(
                                  CAST(o_orderkey AS VARCHAR)), 1, 16))
                                  AS UBIGINT) % 64 AS bk,
                              CAST(FLOOR(o_totalprice * 100)
                                   AS BIGINT) AS cents
                       FROM orders),
            b AS (SELECT bk, COUNT(*) AS n_i, SUM(cents) AS s_i
                  FROM o GROUP BY 1),
            t AS (SELECT SUM(n_i) AS n, SUM(s_i) AS s FROM b),
            l AS (SELECT 1000 * (t.s - b.s_i)
                         // GREATEST(t.n - b.n_i, 1) AS m_i
                  FROM b, t),
            mb AS (SELECT SUM(m_i) // COUNT(*) AS mbar,
                          COUNT(*) AS g FROM l),
            q AS (SELECT g, SUM(CAST(m_i - mbar AS HUGEINT)
                               * CAST(m_i - mbar AS HUGEINT)) AS ssq
                  FROM l, mb GROUP BY 1)
            SELECT CAST(t.n AS BIGINT) AS n_orders,
                   CAST(q.g AS BIGINT) AS n_buckets,
                   CAST(1000 * t.s // t.n AS BIGINT) AS mean_milli,
                   CAST(FLOOR(SQRT(CAST((q.g - 1) * q.ssq // q.g
                        AS DOUBLE))) AS BIGINT) AS jk_se_milli,
                   CAST(10000 * CAST(FLOOR(SQRT(CAST(
                            (q.g - 1) * q.ssq // q.g AS DOUBLE)))
                        AS BIGINT)
                        // (1000 * t.s // t.n) AS BIGINT) AS rel_se_bps
            FROM t, q
        """,
        "randomized_response_audit": """
            WITH v(st) AS (VALUES ('F'), ('O'), ('P')),
            m AS (SELECT v.st,
                         CASE WHEN o.o_orderstatus = v.st THEN 1
                              ELSE 0 END AS bit,
                         CASE WHEN CAST(('0x' || substr(md5(
                                  CAST(o.o_orderkey AS VARCHAR)
                                  || '#' || v.st), 1, 16))
                                  AS UBIGINT) % 4 = 0
                              THEN 1 ELSE 0 END AS flip
                  FROM orders o CROSS JOIN v),
            a AS (SELECT st, COUNT(*) AS n, SUM(bit) AS tru,
                         SUM(CASE WHEN flip = 1 THEN 1 - bit
                             ELSE bit END) AS obs
                  FROM m GROUP BY 1)
            SELECT st AS o_orderstatus,
                   CAST(n AS BIGINT) AS n_orders,
                   CAST(tru AS BIGINT) AS true_cnt,
                   CAST(obs AS BIGINT) AS reported_cnt,
                   CAST(500 * (4 * obs - n) AS BIGINT) AS est_milli,
                   CAST(10000 * ABS(500 * (4 * obs - n) - 1000 * tru)
                        // GREATEST(1000 * tru, 1) AS BIGINT)
                       AS err_bps
            FROM a ORDER BY 1
        """,
        "orders_max_drawdown": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE)) AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS rev
                       FROM orders GROUP BY 1),
            s AS (SELECT dy, SUM(rev) OVER (ORDER BY dy
                          ROWS UNBOUNDED PRECEDING) AS cum
                  FROM d),
            m AS (SELECT dy, cum, MAX(cum) OVER (ORDER BY dy
                          ROWS UNBOUNDED PRECEDING) AS runmax,
                         ROW_NUMBER() OVER (ORDER BY dy) AS rn
                  FROM s),
            dd AS (SELECT dy, cum, runmax, runmax - cum AS ddv, rn
                   FROM m),
            mx AS (SELECT MAX(ddv) AS mdd FROM dd),
            tr AS (SELECT MIN(dy) AS trough FROM dd, mx
                   WHERE ddv = mdd),
            tv AS (SELECT runmax AS pkval FROM dd, tr
                   WHERE dy = trough),
            pk AS (SELECT MIN(dy) AS peak FROM dd, tr, tv
                   WHERE dy <= trough AND cum = pkval),
            uw AS (SELECT rn - ROW_NUMBER() OVER (ORDER BY rn) AS grp
                   FROM dd WHERE ddv > 0),
            st AS (SELECT COALESCE(MAX(c), 0) AS streak
                   FROM (SELECT COUNT(*) AS c FROM uw GROUP BY grp))
            SELECT CAST((SELECT COUNT(*) FROM d) AS BIGINT) AS n_days,
                   CAST(mx.mdd AS BIGINT) AS max_drawdown_cents,
                   CAST(pk.peak AS BIGINT) AS peak_dy,
                   CAST(tr.trough AS BIGINT) AS trough_dy,
                   CAST(st.streak AS BIGINT)
                       AS longest_underwater_days
            FROM mx, tr, pk, st
        """,
        "orders_mann_kendall": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE)) AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS rev
                       FROM orders GROUP BY 1),
            p AS (SELECT CASE WHEN b.rev > a.rev THEN 1
                              WHEN b.rev < a.rev THEN -1
                              ELSE 0 END AS sg
                  FROM d a JOIN d b ON b.dy > a.dy),
            ss AS (SELECT COALESCE(SUM(sg), 0) AS s FROM p),
            tt AS (SELECT COALESCE(SUM(c * (c - 1) * (2 * c + 5)), 0)
                          AS tie_term
                   FROM (SELECT COUNT(*) AS c FROM d GROUP BY rev)
                   WHERE c > 1),
            nn AS (SELECT COUNT(*) AS n FROM d),
            v AS (SELECT nn.n, ss.s, tt.tie_term,
                         nn.n * (nn.n - 1) * (2 * nn.n + 5)
                             - tt.tie_term AS var18
                  FROM nn, ss, tt)
            SELECT CAST(n AS BIGINT) AS n_days,
                   CAST(s AS BIGINT) AS s_stat,
                   CAST(tie_term AS BIGINT) AS tie_term,
                   CAST(var18 AS BIGINT) AS var_x18,
                   CAST(CASE
                        WHEN s > 0 THEN FLOOR(
                            CAST(s - 1 AS DOUBLE)
                            / SQRT(CAST(var18 AS DOUBLE) / 18.0)
                            * 1000.0)
                        WHEN s < 0 THEN FLOOR(
                            CAST(s + 1 AS DOUBLE)
                            / SQRT(CAST(var18 AS DOUBLE) / 18.0)
                            * 1000.0)
                        ELSE 0 END AS BIGINT) AS z_milli
            FROM v
        """,
        "orders_kendall_tau": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE)) AS dy,
                              COUNT(*) AS cnt,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS rev
                       FROM orders GROUP BY 1),
            p AS (SELECT CASE WHEN b.cnt > a.cnt THEN 1
                              WHEN b.cnt < a.cnt THEN -1
                              ELSE 0 END
                         * CASE WHEN b.rev > a.rev THEN 1
                                WHEN b.rev < a.rev THEN -1
                                ELSE 0 END AS sg
                  FROM d a JOIN d b ON b.dy > a.dy),
            cd AS (SELECT COALESCE(COUNT(*) FILTER (sg > 0), 0) AS conc,
                          COALESCE(COUNT(*) FILTER (sg < 0), 0) AS disc
                   FROM p),
            tx AS (SELECT COALESCE(SUM(c * (c - 1) // 2), 0) AS tx_p
                   FROM (SELECT COUNT(*) AS c FROM d GROUP BY cnt)),
            ty AS (SELECT COALESCE(SUM(c * (c - 1) // 2), 0) AS ty_p
                   FROM (SELECT COUNT(*) AS c FROM d GROUP BY rev)),
            nn AS (SELECT COUNT(*) AS g,
                          COUNT(*) * (COUNT(*) - 1) // 2 AS n0
                   FROM d)
            SELECT CAST(g AS BIGINT) AS n_days,
                   CAST(conc AS BIGINT) AS concordant,
                   CAST(disc AS BIGINT) AS discordant,
                   CAST(conc - disc AS BIGINT) AS s_stat,
                   CAST(tx_p AS BIGINT) AS tx_pairs,
                   CAST(ty_p AS BIGINT) AS ty_pairs,
                   CAST(CASE WHEN n0 - tx_p > 0 AND n0 - ty_p > 0 THEN
                        FLOOR(CAST(conc - disc AS DOUBLE)
                              / (SQRT(CAST(n0 - tx_p AS DOUBLE))
                                 * SQRT(CAST(n0 - ty_p AS DOUBLE)))
                              * 1000.0)
                        ELSE 0 END AS BIGINT) AS tau_milli
            FROM cd, tx, ty, nn
        """,
        "events_turning_points": """
            WITH r AS (SELECT epoch_us(ts)//86400000000 AS day_id,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM events GROUP BY 1),
            s AS (SELECT c, LAG(c) OVER (ORDER BY day_id) AS pc,
                         LEAD(c) OVER (ORDER BY day_id) AS nc
                  FROM r),
            t AS (SELECT COALESCE(COUNT(*) FILTER (
                             (c - pc) * (nc - c) < 0), 0) AS tp,
                         COALESCE(COUNT(*) FILTER (
                             (c - pc) * (nc - c) = 0), 0) AS tz
                  FROM s WHERE pc IS NOT NULL AND nc IS NOT NULL),
            nn AS (SELECT COUNT(*) AS n FROM r)
            SELECT CAST(n AS BIGINT) AS n_days,
                   CAST(tp AS BIGINT) AS turning_points,
                   CAST(tz AS BIGINT) AS flat_ties,
                   CAST(2 * (n - 2) AS BIGINT) AS exp_x3,
                   CAST(16 * n - 29 AS BIGINT) AS var_x90,
                   CAST(FLOOR(CAST(3 * tp - 2 * (n - 2) AS DOUBLE)
                              / 3.0
                              / SQRT(CAST(16 * n - 29 AS DOUBLE)
                                     / 90.0)
                              * 1000.0) AS BIGINT) AS z_milli
            FROM t, nn
        """,
        "part_brand_type_cramer": """
            WITH o AS (SELECT p_brand AS b, p_type AS t,
                              COUNT(*) AS o
                       FROM part GROUP BY 1, 2),
            rb AS (SELECT p_brand AS b, CAST(COUNT(*) AS HUGEINT) AS r
                   FROM part GROUP BY 1),
            ct AS (SELECT p_type AS t, CAST(COUNT(*) AS HUGEINT) AS c
                   FROM part GROUP BY 1),
            nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM part),
            cells AS (SELECT rb.r, ct.c, COALESCE(o.o, 0) AS ob
                      FROM rb CROSS JOIN ct
                      LEFT JOIN o ON o.b = rb.b AND o.t = ct.t),
            chi AS (SELECT SUM(1000 * (n * ob - r * c) * (n * ob - r * c)
                               // (n * r * c)) AS chi2m
                    FROM cells, nn),
            dims AS (SELECT (SELECT COUNT(*) FROM rb) AS nb,
                            (SELECT COUNT(*) FROM ct) AS nt)
            SELECT CAST(n AS BIGINT) AS n_parts,
                   CAST(nb AS BIGINT) AS n_brands,
                   CAST(nt AS BIGINT) AS n_types,
                   CAST((nb - 1) * (nt - 1) AS BIGINT) AS dof,
                   CAST(chi2m AS BIGINT) AS chi2_milli,
                   CAST(FLOOR(SQRT(CAST(chi2m AS DOUBLE) / 1000.0
                                   / CAST(n * LEAST(nb - 1, nt - 1)
                                          AS DOUBLE))
                              * 1000.0) AS BIGINT) AS v_milli
            FROM chi, dims, nn
        """,
        "orders_dow_anova": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE)) AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS rev
                       FROM orders GROUP BY 1),
            g AS (SELECT (dy + 3) % 7 AS dow,
                         CAST(COUNT(*) AS HUGEINT) AS n_i,
                         CAST(SUM(rev) AS HUGEINT) AS s_i,
                         SUM(CAST(rev AS HUGEINT) * rev) AS q_i
                  FROM d GROUP BY 1),
            m AS (SELECT dow, n_i, s_i, q_i,
                         (1000 * s_i) // n_i AS m_i
                  FROM g),
            tot AS (SELECT SUM(n_i) AS n, SUM(s_i) AS s,
                           COUNT(*) AS k
                    FROM m),
            gm AS (SELECT (1000 * s) // n AS mbar, n, k FROM tot),
            ss AS (SELECT SUM(n_i * (m_i - mbar) * (m_i - mbar)) AS ssb,
                          SUM(1000000 * q_i - 2 * m_i * 1000 * s_i
                              + n_i * m_i * m_i) AS ssw
                   FROM m, gm),
            bw AS (SELECT
                     (SELECT dow FROM m
                      ORDER BY m_i DESC, dow LIMIT 1) AS best_dow,
                     (SELECT dow FROM m
                      ORDER BY m_i ASC, dow LIMIT 1) AS worst_dow)
            SELECT CAST(n AS BIGINT) AS n_days,
                   CAST(k AS BIGINT) AS n_groups,
                   CAST(1000 * ssb * (n - k)
                        // (ssw * (k - 1)) AS BIGINT) AS f_milli,
                   CAST(10000 * ssb // (ssb + ssw) AS BIGINT)
                       AS eta2_bps,
                   CAST(best_dow AS BIGINT) AS best_dow,
                   CAST(worst_dow AS BIGINT) AS worst_dow
            FROM ss, gm, bw
        """,
        "lineitem_quantity_ks_uniform": """
            WITH grid AS (SELECT unnest(generate_series(1, 50)) AS q),
            cc AS (SELECT CAST(l_quantity AS BIGINT) AS q,
                          CAST(COUNT(*) AS BIGINT) AS c
                   FROM lineitem GROUP BY 1),
            g AS (SELECT grid.q, COALESCE(cc.c, 0) AS c
                  FROM grid LEFT JOIN cc USING (q)),
            nn AS (SELECT SUM(c) AS n FROM g),
            w AS (SELECT q, SUM(c) OVER (ORDER BY q) AS cum FROM g),
            d AS (SELECT q, ABS(50 * cum - q * n) AS dv FROM w, nn),
            mx AS (SELECT MAX(dv) AS d_num FROM d),
            qa AS (SELECT MIN(q) AS q_at_max FROM d, mx
                   WHERE dv = d_num)
            SELECT CAST(n AS BIGINT) AS n_lines,
                   CAST(d_num AS BIGINT) AS d_num,
                   CAST(q_at_max AS BIGINT) AS q_at_max,
                   CAST(1000 * d_num // (50 * n) AS BIGINT) AS d_milli,
                   CAST(FLOOR(CAST(d_num AS DOUBLE)
                              / (50.0 * CAST(n AS DOUBLE))
                              * SQRT(CAST(n AS DOUBLE))
                              * 1000.0) AS BIGINT) AS ks_lambda_milli
            FROM nn, mx, qa
        """,
        "customer_segment_kruskal": """
            WITH b AS (SELECT c_mktsegment AS seg,
                              CAST(FLOOR(c_acctbal * 100) AS BIGINT)
                                  AS v
                       FROM customer),
            vc AS (SELECT v, COUNT(*) AS cv FROM b GROUP BY 1),
            w AS (SELECT v, cv,
                         SUM(cv) OVER (ORDER BY v) - cv AS cumbef
                  FROM vc),
            gv AS (SELECT seg, v, COUNT(*) AS cgv FROM b GROUP BY 1, 2),
            r AS (SELECT seg,
                         CAST(SUM(cgv) AS HUGEINT) AS n_i,
                         CAST(SUM(cgv * (2 * cumbef + cv + 1))
                              AS HUGEINT) AS r2
                  FROM gv JOIN w USING (v) GROUP BY 1),
            nn AS (SELECT SUM(n_i) AS n FROM r),
            s AS (SELECT SUM(3000 * r2 * r2 // n_i) AS s4 FROM r),
            h AS (SELECT s4 // (n * (n + 1)) - 3000 * (n + 1)
                         AS h_milli
                  FROM s, nn)
            SELECT seg AS c_mktsegment,
                   CAST(n_i AS BIGINT) AS n_cust,
                   CAST(r2 AS BIGINT) AS rank2_sum,
                   CAST(1000 * r2 // (2 * n_i) AS BIGINT)
                       AS mean_rank_milli,
                   CAST(h_milli AS BIGINT) AS h_milli
            FROM r, h ORDER BY c_mktsegment
        """,
        "supplier_grubbs_extremes": """
            WITH b AS (SELECT s_suppkey,
                              CAST(FLOOR(s_acctbal * 100) AS BIGINT)
                                  AS v
                       FROM supplier),
            m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(v) AS HUGEINT) AS s,
                         SUM(CAST(v AS HUGEINT) * v) AS q
                  FROM b),
            hi AS (SELECT s_suppkey AS sk, v FROM b
                   ORDER BY v DESC, s_suppkey LIMIT 1),
            lo AS (SELECT s_suppkey AS sk, v FROM b
                   ORDER BY v ASC, s_suppkey LIMIT 1)
            SELECT * FROM (
              SELECT 'high' AS side,
                     CAST(n AS BIGINT) AS n_suppliers,
                     CAST(sk AS BIGINT) AS s_suppkey,
                     CAST(v AS BIGINT) AS bal_cents,
                     CAST(n * v - s AS BIGINT) AS dev_num,
                     CAST(FLOOR((CAST(n * v - s AS DOUBLE)
                                 / CAST(n AS DOUBLE))
                                / SQRT(CAST(n * q - s * s AS DOUBLE)
                                       / (CAST(n AS DOUBLE)
                                          * CAST(n - 1 AS DOUBLE)))
                                * 1000.0) AS BIGINT) AS g_milli
              FROM hi, m
              UNION ALL
              SELECT 'low',
                     CAST(n AS BIGINT),
                     CAST(sk AS BIGINT),
                     CAST(v AS BIGINT),
                     CAST(s - n * v AS BIGINT),
                     CAST(FLOOR((CAST(s - n * v AS DOUBLE)
                                 / CAST(n AS DOUBLE))
                                / SQRT(CAST(n * q - s * s AS DOUBLE)
                                       / (CAST(n AS DOUBLE)
                                          * CAST(n - 1 AS DOUBLE)))
                                * 1000.0) AS BIGINT)
              FROM lo, m)
            ORDER BY side
        """,
        "nation_segment_stdres": """
            WITH b AS (SELECT c_nationkey AS nk, c_mktsegment AS seg
                       FROM customer),
            o AS (SELECT nk, seg, COUNT(*) AS ob
                  FROM b GROUP BY 1, 2),
            r AS (SELECT nk, CAST(COUNT(*) AS BIGINT) AS r
                  FROM b GROUP BY 1),
            c AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS c
                  FROM b GROUP BY 1),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b),
            g AS (SELECT r.nk, c.seg, r.r, c.c,
                         COALESCE(o.ob, 0) AS ob
                  FROM r CROSS JOIN c
                  LEFT JOIN o ON o.nk = r.nk AND o.seg = c.seg),
            e AS (SELECT nk, seg, ob, r, c,
                         n * ob - r * c AS dev,
                         CAST(FLOOR((CAST(n * ob - r * c AS DOUBLE)
                                     / CAST(n AS DOUBLE))
                                    / SQRT(CAST(r * c AS DOUBLE)
                                           / CAST(n AS DOUBLE)
                                           * (1.0 - CAST(r AS DOUBLE)
                                              / CAST(n AS DOUBLE))
                                           * (1.0 - CAST(c AS DOUBLE)
                                              / CAST(n AS DOUBLE)))
                                    * 1000.0) AS BIGINT) AS sr
                  FROM g, nn),
            t AS (SELECT *, ROW_NUMBER() OVER (
                      ORDER BY ABS(sr) DESC, nk, seg) AS rk
                  FROM e)
            SELECT CAST(nk AS BIGINT) AS c_nationkey,
                   seg AS c_mktsegment,
                   CAST(ob AS BIGINT) AS obs,
                   r AS r_tot, c AS c_tot,
                   CAST(dev AS BIGINT) AS dev_num,
                   sr AS stdres_milli,
                   CAST(rk AS BIGINT) AS rk
            FROM t WHERE rk <= 10 ORDER BY rk
        """,
        "part_price_tukey_fences": """
            WITH b AS (SELECT p_brand AS br,
                              CAST(FLOOR(p_retailprice * 100)
                                   AS BIGINT) AS v
                       FROM part),
            q AS (SELECT br, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(quantile_disc(v, 0.25) AS BIGINT) AS q1,
                         CAST(quantile_disc(v, 0.75) AS BIGINT) AS q3
                  FROM b GROUP BY 1),
            o AS (SELECT b.br,
                         SUM(CASE WHEN 4 * b.v <
                                  4 * q.q1 - 6 * (q.q3 - q.q1)
                             THEN 1 ELSE 0 END) AS lo,
                         SUM(CASE WHEN 4 * b.v >
                                  4 * q.q3 + 6 * (q.q3 - q.q1)
                             THEN 1 ELSE 0 END) AS hi
                  FROM b JOIN q ON b.br = q.br GROUP BY 1)
            SELECT q.br AS p_brand, n AS n_parts, q1 AS q1_cents,
                   q3 AS q3_cents, q3 - q1 AS iqr_cents,
                   CAST(o.lo AS BIGINT) AS lo_outliers,
                   CAST(o.hi AS BIGINT) AS hi_outliers
            FROM q JOIN o ON q.br = o.br ORDER BY p_brand
        """,
        "orders_runs_median": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE)) AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS rev
                       FROM orders GROUP BY 1),
            m AS (SELECT CAST(quantile_disc(rev, 0.50) AS BIGINT)
                             AS med,
                         COUNT(*) AS g
                  FROM d),
            s AS (SELECT dy, CASE WHEN rev > med THEN 1 ELSE 0 END
                             AS a
                  FROM d, m WHERE rev <> med),
            l AS (SELECT a, LAG(a) OVER (ORDER BY dy) AS pa FROM s),
            rr AS (SELECT COUNT(*) AS n,
                          COALESCE(SUM(a), 0) AS n1,
                          COUNT(*) - COALESCE(SUM(a), 0) AS n2,
                          CASE WHEN COUNT(*) = 0 THEN 0
                               ELSE 1 + COALESCE(SUM(
                                   CASE WHEN pa IS NOT NULL
                                        AND a <> pa
                                   THEN 1 ELSE 0 END), 0) END AS runs
                   FROM l)
            SELECT CAST(n AS BIGINT) AS n_days_used,
                   CAST(g - n AS BIGINT) AS n_equal_dropped,
                   CAST(n1 AS BIGINT) AS n_above,
                   CAST(n2 AS BIGINT) AS n_below,
                   CAST(med AS BIGINT) AS median_cents,
                   CAST(runs AS BIGINT) AS runs,
                   CAST(CASE WHEN n1 = 0 OR n2 = 0 OR n < 2
                             OR 2 * n1 * n2 * (2 * n1 * n2 - n) <= 0
                        THEN 0
                        ELSE FLOOR(
                            (CAST(n * runs - n - 2 * n1 * n2
                                  AS DOUBLE) / CAST(n AS DOUBLE))
                            / SQRT(CAST(2 * n1 * n2
                                        * (2 * n1 * n2 - n)
                                        AS DOUBLE)
                                   / (CAST(n AS DOUBLE)
                                      * CAST(n AS DOUBLE)
                                      * CAST(n - 1 AS DOUBLE)))
                            * 1000.0) END AS BIGINT) AS z_milli
            FROM rr, m
        """,
        "orders_friedman_dow": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE)) AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS rev
                       FROM orders GROUP BY 1),
            w AS (SELECT dy, rev, (dy + 3) // 7 AS wk,
                         (dy + 3) % 7 AS dow
                  FROM d),
            cw AS (SELECT wk FROM w GROUP BY wk
                   HAVING COUNT(*) = 7),
            x AS (SELECT w.wk, w.dow, w.rev
                  FROM w JOIN cw USING (wk)),
            r AS (SELECT wk, dow,
                         2 * RANK() OVER (PARTITION BY wk
                                          ORDER BY rev)
                         + COUNT(*) OVER (PARTITION BY wk, rev)
                         - 1 AS r2
                  FROM x),
            j AS (SELECT dow, CAST(SUM(r2) AS HUGEINT) AS r2s
                  FROM r GROUP BY 1),
            s AS (SELECT SUM(r2s * r2s) AS s2, COUNT(*) AS k FROM j),
            bb AS (SELECT COUNT(*) AS b FROM cw),
            bw AS (SELECT
                     (SELECT dow FROM j
                      ORDER BY r2s DESC, dow LIMIT 1) AS best_dow,
                     (SELECT dow FROM j
                      ORDER BY r2s ASC, dow LIMIT 1) AS worst_dow)
            SELECT CAST(b AS BIGINT) AS n_weeks,
                   CAST(7 * b AS BIGINT) AS n_days_used,
                   CAST(CASE WHEN b = 0 THEN 0
                        ELSE 3000 * s2 // (b * k * (k + 1))
                             - 3000 * b * (k + 1)
                        END AS BIGINT) AS q_milli,
                   CAST(CASE WHEN b = 0 THEN -1
                        ELSE best_dow END AS BIGINT) AS best_dow,
                   CAST(CASE WHEN b = 0 THEN -1
                        ELSE worst_dow END AS BIGINT) AS worst_dow
            FROM bb, s, bw
        """,
        "orders_variance_ratio": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE)) AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS rev
                       FROM orders GROUP BY 1),
            w AS (SELECT dy, rev, (dy + 3) // 7 AS wk FROM d),
            cw AS (SELECT wk FROM w GROUP BY wk
                   HAVING COUNT(*) = 7),
            x AS (SELECT w.wk, w.rev FROM w JOIN cw USING (wk)),
            wk_s AS (SELECT wk, CAST(SUM(rev) AS HUGEINT) AS ws
                     FROM x GROUP BY 1),
            mq AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nq,
                          SUM(ws) AS sq,
                          SUM(ws * ws) AS qq
                   FROM wk_s),
            m1 AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n1,
                          CAST(SUM(rev) AS HUGEINT) AS s1,
                          SUM(CAST(rev AS HUGEINT) * rev) AS q1
                   FROM x)
            SELECT CAST(nq AS BIGINT) AS n_weeks,
                   CAST(n1 AS BIGINT) AS n_days,
                   CAST(CASE WHEN nq < 2
                             OR n1 * q1 - s1 * s1 <= 0 THEN 0
                        ELSE 1000 * (nq * qq - sq * sq) * n1 * n1
                             // (7 * (n1 * q1 - s1 * s1) * nq * nq)
                        END AS BIGINT) AS vr_milli
            FROM mq, m1
        """,
        "lineitem_cohen_kappa": """
            WITH b AS (SELECT CASE WHEN CAST(FLOOR(l_discount * 10000)
                                        AS BIGINT) >= 500
                              THEN 1 ELSE 0 END AS a,
                              CASE WHEN CAST(FLOOR(l_tax * 10000)
                                        AS BIGINT) >= 400
                              THEN 1 ELSE 0 END AS t
                       FROM lineitem),
            g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         COALESCE(SUM(CASE WHEN a = 1 AND t = 1
                                      THEN 1 ELSE 0 END), 0) AS n11,
                         COALESCE(SUM(CASE WHEN a = 1 AND t = 0
                                      THEN 1 ELSE 0 END), 0) AS n10,
                         COALESCE(SUM(CASE WHEN a = 0 AND t = 1
                                      THEN 1 ELSE 0 END), 0) AS n01,
                         COALESCE(SUM(CASE WHEN a = 0 AND t = 0
                                      THEN 1 ELSE 0 END), 0) AS n00
                  FROM b),
            k AS (SELECT n, n11, n10, n01, n00,
                         n * (n11 + n00)
                         - (n10 + n11) * (n01 + n11)
                         - (n00 + n01) * (n00 + n10) AS num,
                         n * n - (n10 + n11) * (n01 + n11)
                         - (n00 + n01) * (n00 + n10) AS den
                  FROM g)
            SELECT n AS n_lines,
                   CAST(n11 AS BIGINT) AS n_both,
                   CAST(n10 AS BIGINT) AS n_disc_only,
                   CAST(n01 AS BIGINT) AS n_tax_only,
                   CAST(n00 AS BIGINT) AS n_neither,
                   CAST(10000 * (n11 + n00) // n AS BIGINT) AS po_bps,
                   CAST(10000 * ((n10 + n11) * (n01 + n11)
                                 + (n00 + n01) * (n00 + n10))
                        // (n * n) AS BIGINT) AS pe_bps,
                   CAST(CASE WHEN den <= 0 THEN 0
                        ELSE (CASE WHEN num >= 0 THEN 1 ELSE -1 END)
                             * (1000 * ABS(num) // den)
                        END AS BIGINT) AS kappa_milli
            FROM k
        """,
        "events_mcnemar_halves": """
            WITH d AS (SELECT user_id AS u,
                              epoch_us(ts)//86400000000 AS dy
                       FROM events),
            sp AS (SELECT MIN(dy) AS lo, MAX(dy) AS hi FROM d),
            m AS (SELECT (lo + hi) // 2 AS mid FROM sp),
            f AS (SELECT u,
                         MAX(CASE WHEN dy <= mid THEN 1 ELSE 0 END)
                             AS h1,
                         MAX(CASE WHEN dy > mid THEN 1 ELSE 0 END)
                             AS h2
                  FROM d, m GROUP BY u),
            g AS (SELECT COALESCE(SUM(CASE WHEN h1 = 1 AND h2 = 1
                                       THEN 1 ELSE 0 END), 0) AS nb,
                         COALESCE(SUM(CASE WHEN h1 = 1 AND h2 = 0
                                       THEN 1 ELSE 0 END), 0) AS b,
                         COALESCE(SUM(CASE WHEN h1 = 0 AND h2 = 1
                                       THEN 1 ELSE 0 END), 0) AS c
                  FROM f)
            SELECT CAST(nb + b + c AS BIGINT) AS n_users,
                   CAST(mid AS BIGINT) AS mid_day,
                   CAST(nb AS BIGINT) AS n_both,
                   CAST(b AS BIGINT) AS n_h1_only,
                   CAST(c AS BIGINT) AS n_h2_only,
                   CAST(CASE WHEN b + c = 0 THEN 0
                        ELSE 1000 * (ABS(b - c) - 1)
                             * (ABS(b - c) - 1) // (b + c)
                        END AS BIGINT) AS chi2_milli
            FROM g, m
        """,
        "part_price_skew_kurtosis": """
            WITH b AS (SELECT p_brand AS br,
                              CAST(FLOOR(p_retailprice * 100)
                                   AS BIGINT) AS v
                       FROM part),
            m AS (SELECT br, CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(v) AS HUGEINT) AS s,
                         SUM(CAST(v AS HUGEINT) * v) AS q2,
                         SUM(CAST(v AS HUGEINT) * v * v) AS q3,
                         SUM(CAST(v AS HUGEINT) * v * v * v) AS q4
                  FROM b GROUP BY 1),
            c AS (SELECT br, n, s,
                         n * q2 - s * s AS m2,
                         n * n * q3 - 3 * n * q2 * s
                             + 2 * s * s * s AS m3,
                         n * n * n * q4 - 4 * n * n * q3 * s
                             + 6 * n * q2 * s * s
                             - 3 * s * s * s * s AS m4
                  FROM m)
            SELECT br AS p_brand,
                   CAST(n AS BIGINT) AS n_parts,
                   CAST(s // n AS BIGINT) AS mean_cents,
                   CAST(m2 // (n * n) AS BIGINT) AS var_cents2,
                   CAST(CASE WHEN m2 <= 0 THEN 0
                        ELSE FLOOR(CAST(m3 AS DOUBLE)
                                   / CAST(m2 AS DOUBLE)
                                   / SQRT(CAST(m2 AS DOUBLE))
                                   * 1000.0) END AS BIGINT)
                       AS skew_milli,
                   CAST(CASE WHEN m2 <= 0 THEN 0
                        ELSE 1000 * m4 // (m2 * m2) - 3000
                        END AS BIGINT) AS kurt_ex_milli
            FROM c ORDER BY p_brand
        """,
        "lineitem_partial_corr": """
            WITH b AS (SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS x,
                              CAST(FLOOR(l_extendedprice) AS BIGINT)
                                  AS y,
                              CAST(FLOOR(l_discount * 10000)
                                   AS BIGINT) AS z
                       FROM lineitem),
            m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(x) AS HUGEINT) AS sx,
                         CAST(SUM(y) AS HUGEINT) AS sy,
                         CAST(SUM(z) AS HUGEINT) AS sz,
                         SUM(CAST(x AS HUGEINT) * x) AS sxx,
                         SUM(CAST(y AS HUGEINT) * y) AS syy,
                         SUM(CAST(z AS HUGEINT) * z) AS szz,
                         SUM(CAST(x AS HUGEINT) * y) AS sxy,
                         SUM(CAST(x AS HUGEINT) * z) AS sxz,
                         SUM(CAST(y AS HUGEINT) * z) AS syz
                  FROM b),
            v AS (SELECT n,
                         n * sxx - sx * sx AS vx,
                         n * syy - sy * sy AS vy,
                         n * szz - sz * sz AS vz,
                         n * sxy - sx * sy AS cxy,
                         n * sxz - sx * sz AS cxz,
                         n * syz - sy * sz AS cyz
                  FROM m),
            r AS (SELECT n, vx, vy, vz,
                         CAST(cxy AS DOUBLE)
                             / (SQRT(CAST(vx AS DOUBLE))
                                * SQRT(CAST(vy AS DOUBLE))) AS rxy,
                         CAST(cxz AS DOUBLE)
                             / (SQRT(CAST(vx AS DOUBLE))
                                * SQRT(CAST(vz AS DOUBLE))) AS rxz,
                         CAST(cyz AS DOUBLE)
                             / (SQRT(CAST(vy AS DOUBLE))
                                * SQRT(CAST(vz AS DOUBLE))) AS ryz
                  FROM v)
            SELECT CAST(n AS BIGINT) AS n_lines,
                   CAST(CASE WHEN vx <= 0 OR vy <= 0 OR vz <= 0
                        THEN 0 ELSE FLOOR(rxy * 1000.0)
                        END AS BIGINT) AS rxy_milli,
                   CAST(CASE WHEN vx <= 0 OR vy <= 0 OR vz <= 0
                        THEN 0 ELSE FLOOR(rxz * 1000.0)
                        END AS BIGINT) AS rxz_milli,
                   CAST(CASE WHEN vx <= 0 OR vy <= 0 OR vz <= 0
                        THEN 0 ELSE FLOOR(ryz * 1000.0)
                        END AS BIGINT) AS ryz_milli,
                   CAST(CASE WHEN vx <= 0 OR vy <= 0 OR vz <= 0
                        THEN 0 ELSE FLOOR(
                            (rxy - rxz * ryz)
                            / (SQRT(1.0 - rxz * rxz)
                               * SQRT(1.0 - ryz * ryz))
                            * 1000.0) END AS BIGINT) AS pc_milli
            FROM r
        """,
        "lineitem_blomqvist_beta": """
            WITH b AS (SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS x,
                              CAST(FLOOR(l_extendedprice) AS BIGINT)
                                  AS y
                       FROM lineitem),
            m AS (SELECT CAST(quantile_disc(x, 0.50) AS BIGINT) AS mx,
                         CAST(quantile_disc(y, 0.50) AS BIGINT) AS my,
                         CAST(COUNT(*) AS BIGINT) AS n
                  FROM b),
            q AS (SELECT
                    COALESCE(SUM(CASE WHEN x > mx AND y > my
                                 THEN 1 ELSE 0 END), 0) AS n_pp,
                    COALESCE(SUM(CASE WHEN x > mx AND y < my
                                 THEN 1 ELSE 0 END), 0) AS n_pm,
                    COALESCE(SUM(CASE WHEN x < mx AND y > my
                                 THEN 1 ELSE 0 END), 0) AS n_mp,
                    COALESCE(SUM(CASE WHEN x < mx AND y < my
                                 THEN 1 ELSE 0 END), 0) AS n_mm
                  FROM b, m)
            SELECT n AS n_lines,
                   CAST(n - n_pp - n_pm - n_mp - n_mm AS BIGINT)
                       AS n_dropped,
                   mx AS med_qty, my AS med_price_dollars,
                   CAST(n_pp AS BIGINT) AS n_pp,
                   CAST(n_pm AS BIGINT) AS n_pm,
                   CAST(n_mp AS BIGINT) AS n_mp,
                   CAST(n_mm AS BIGINT) AS n_mm,
                   CAST(CASE WHEN n_pp + n_pm + n_mp + n_mm = 0
                        THEN 0
                        ELSE (CASE WHEN n_pp + n_mm - n_pm - n_mp
                                   >= 0 THEN 1 ELSE -1 END)
                             * (1000 * ABS(n_pp + n_mm - n_pm - n_mp)
                                // (n_pp + n_pm + n_mp + n_mm))
                        END AS BIGINT) AS beta_milli
            FROM q, m
        """,
        "event_transition_drift": """
            WITH e AS (SELECT user_id AS u, epoch_us(ts) AS tsu,
                              event_id AS eid, event_type AS et,
                              epoch_us(ts)//86400000000 AS dy
                       FROM events),
            sp AS (SELECT (MIN(dy) + MAX(dy)) // 2 AS mid FROM e),
            s AS (SELECT u, et, dy,
                         LAG(et) OVER (PARTITION BY u
                                       ORDER BY tsu, eid) AS pet
                  FROM e),
            p AS (SELECT pet AS ft, et AS tt,
                         CASE WHEN dy > mid THEN 1 ELSE 0 END AS h2
                  FROM s, sp WHERE pet IS NOT NULL),
            c AS (SELECT ft, tt,
                         CAST(SUM(1 - h2) AS BIGINT) AS n1,
                         CAST(SUM(h2) AS BIGINT) AS n2
                  FROM p GROUP BY 1, 2),
            t AS (SELECT ft, SUM(n1) AS t1, SUM(n2) AS t2
                  FROM c GROUP BY 1),
            v AS (SELECT c.ft,
                         SUM(ABS(n1 * t2 - n2 * t1)) AS sv
                  FROM c JOIN t USING (ft) GROUP BY 1)
            SELECT v.ft AS from_type,
                   CAST(t.t1 AS BIGINT) AS n_h1,
                   CAST(t.t2 AS BIGINT) AS n_h2,
                   CAST(CASE WHEN t.t1 = 0 OR t.t2 = 0 THEN -1
                        ELSE 10000 * v.sv // (2 * t.t1 * t.t2)
                        END AS BIGINT) AS tv_bps
            FROM v JOIN t ON v.ft = t.ft ORDER BY from_type
        """,
        "lineitem_gamma_gk": """
            WITH b AS (SELECT CAST(FLOOR(l_discount * 100) AS BIGINT)
                              AS a,
                              CAST(FLOOR(l_quantity) AS BIGINT) AS q
                       FROM lineitem),
            g AS (SELECT a, q, CAST(COUNT(*) AS HUGEINT) AS n
                  FROM b GROUP BY 1, 2),
            cc AS (SELECT COALESCE(SUM(x.n * y.n), 0) AS c
                   FROM g x JOIN g y ON y.a > x.a AND y.q > x.q),
            dd AS (SELECT COALESCE(SUM(x.n * y.n), 0) AS d
                   FROM g x JOIN g y ON y.a > x.a AND y.q < x.q),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b)
            SELECT n AS n_lines,
                   CAST(c AS BIGINT) AS concordant_pairs,
                   CAST(d AS BIGINT) AS discordant_pairs,
                   CAST(CASE WHEN c + d = 0 THEN 0
                        ELSE (CASE WHEN c >= d THEN 1 ELSE -1 END)
                             * (1000 * ABS(c - d) // (c + d))
                        END AS BIGINT) AS gamma_milli
            FROM cc, dd, nn
        """,
        "orders_wilcoxon_weekend": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE)) AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS rev
                       FROM orders GROUP BY 1),
            w AS (SELECT dy, rev, (dy + 3) // 7 AS wk,
                         (dy + 3) % 7 AS dow
                  FROM d),
            cw AS (SELECT wk FROM w GROUP BY wk
                   HAVING COUNT(*) = 7),
            x AS (SELECT w.wk,
                         CASE WHEN w.dow IN (5, 6) THEN 1 ELSE 0 END
                             AS we,
                         w.rev
                  FROM w JOIN cw USING (wk)),
            p AS (SELECT wk,
                         5 * SUM(CASE WHEN we = 1 THEN rev
                                 ELSE 0 END)
                         - 2 * SUM(CASE WHEN we = 0 THEN rev
                                   ELSE 0 END) AS dd
                  FROM x GROUP BY 1),
            nz AS (SELECT COUNT(*) AS zeros FROM p WHERE dd = 0),
            f AS (SELECT dd, ABS(dd) AS ad FROM p WHERE dd <> 0),
            r AS (SELECT dd,
                         2 * RANK() OVER (ORDER BY ad)
                         + COUNT(*) OVER (PARTITION BY ad) - 1 AS r2
                  FROM f),
            s AS (SELECT COUNT(*) AS n,
                         COALESCE(SUM(CASE WHEN dd > 0 THEN r2
                                      ELSE 0 END), 0) AS w2p
                  FROM r)
            SELECT CAST(n AS BIGINT) AS n_weeks_used,
                   CAST(zeros AS BIGINT) AS n_zero_dropped,
                   CAST(w2p AS BIGINT) AS w2_plus,
                   CAST(CASE WHEN n = 0 THEN 0
                        ELSE FLOOR(
                            (CAST(2 * w2p - n * (n + 1) AS DOUBLE)
                             / 4.0)
                            / SQRT(CAST(n * (n + 1) * (2 * n + 1)
                                        AS DOUBLE) / 24.0)
                            * 1000.0) END AS BIGINT) AS z_milli
            FROM s, nz
        """,
        "orders_revenue_milestones": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE)) AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS rev
                       FROM orders GROUP BY 1),
            c AS (SELECT dy, SUM(rev) OVER (ORDER BY dy) AS cum
                  FROM d),
            t AS (SELECT MAX(cum) AS total, MIN(dy) AS d0 FROM c),
            p AS (SELECT unnest(generate_series(10, 90, 10)) AS pct),
            th AS (SELECT pct, (pct * total + 99) // 100 AS thr
                   FROM p, t),
            m AS (SELECT pct, thr, MIN(dy) AS cross_dy
                  FROM c, th WHERE cum >= thr GROUP BY 1, 2),
            f AS (SELECT m.pct, m.thr, m.cross_dy, c.cum
                  FROM m JOIN c ON c.dy = m.cross_dy)
            SELECT CAST(pct AS BIGINT) AS pct,
                   CAST(thr AS BIGINT) AS threshold_cents,
                   CAST(cross_dy AS BIGINT) AS cross_dy,
                   CAST(cross_dy - d0 AS BIGINT) AS days_from_start,
                   CAST(10000 * cum // total AS BIGINT)
                       AS cum_share_bps
            FROM f, t ORDER BY pct
        """,
        "lineitem_position_profile": """
            WITH b AS (SELECT l_linenumber AS ln,
                              CAST(FLOOR(l_quantity) AS BIGINT) AS q,
                              CAST(FLOOR(l_discount * 10000)
                                   AS BIGINT) AS disc,
                              CAST(FLOOR(l_extendedprice * 100)
                                   AS BIGINT) AS rev
                       FROM lineitem),
            g AS (SELECT ln, CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(q) AS HUGEINT) AS sq,
                         CAST(SUM(disc) AS HUGEINT) AS sd,
                         CAST(SUM(rev) AS HUGEINT) AS sr
                  FROM b GROUP BY 1),
            t AS (SELECT SUM(n) AS n_tot, SUM(sq) AS sq_tot,
                         SUM(sr) AS sr_tot
                  FROM g)
            SELECT CAST(ln AS BIGINT) AS l_linenumber,
                   CAST(n AS BIGINT) AS n_lines,
                   CAST(1000 * sq // n AS BIGINT) AS mean_qty_milli,
                   CAST(sd // n AS BIGINT) AS mean_disc_bps,
                   CAST(10000 * sr // sr_tot AS BIGINT)
                       AS rev_share_bps,
                   CAST((CASE WHEN sq * n_tot - sq_tot * n >= 0
                         THEN 1 ELSE -1 END)
                        * (10000 * ABS(sq * n_tot - sq_tot * n)
                           // (sq_tot * n)) AS BIGINT)
                       AS qty_lift_bps
            FROM g, t ORDER BY l_linenumber
        """,
        "lineitem_dose_response": """
            WITH b AS (SELECT CAST(FLOOR(l_discount * 100) AS BIGINT)
                              AS lvl,
                              CAST(FLOOR(l_quantity) AS BIGINT) AS q
                       FROM lineitem),
            g AS (SELECT lvl, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(q) AS BIGINT) AS sq
                  FROM b GROUP BY 1),
            w AS (SELECT lvl, n, sq,
                         LEAD(n) OVER (ORDER BY lvl) AS n_j,
                         LEAD(sq) OVER (ORDER BY lvl) AS sq_j
                  FROM g)
            SELECT lvl AS discount_pct, n AS n_lines,
                   CAST(1000 * sq // n AS BIGINT) AS mean_qty_milli,
                   CAST(CASE WHEN n_j IS NULL THEN -1
                        WHEN sq_j * n < sq * n_j THEN 1
                        ELSE 0 END AS BIGINT) AS viol_next
            FROM w ORDER BY discount_pct
        """,
        "events_daily_record_census": """
            WITH d AS (SELECT epoch_us(ts)//86400000000 AS dy,
                              MAX(CAST(FLOOR(value * 100) AS BIGINT))
                                  AS v
                       FROM events GROUP BY 1),
            r AS (SELECT dy, v,
                         MAX(v) OVER (ORDER BY dy
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS prevmax
                  FROM d),
            f AS (SELECT dy, v,
                         CASE WHEN prevmax IS NULL OR v > prevmax
                              THEN 1 ELSE 0 END AS rec
                  FROM r),
            rd AS (SELECT dy,
                          LAG(dy) OVER (ORDER BY dy) AS pdy
                   FROM f WHERE rec = 1),
            gp AS (SELECT COALESCE(MAX(dy - pdy), 0) AS longest
                   FROM rd WHERE pdy IS NOT NULL),
            agg AS (SELECT COUNT(*) AS n_days,
                           SUM(rec) AS n_records,
                           MIN(CASE WHEN rec = 1 THEN dy END)
                               AS first_rec,
                           MAX(CASE WHEN rec = 1 THEN dy END)
                               AS last_rec,
                           MAX(v) AS final_rec
                    FROM f)
            SELECT CAST(n_days AS BIGINT) AS n_days,
                   CAST(n_records AS BIGINT) AS n_records,
                   CAST(first_rec AS BIGINT) AS first_record_dy,
                   CAST(last_rec AS BIGINT) AS last_record_dy,
                   CAST(longest AS BIGINT) AS longest_drought_days,
                   CAST(final_rec AS BIGINT) AS final_record_cents
            FROM agg, gp
        """,
        "customer_cvm_segments": """
            WITH b AS (SELECT c_mktsegment AS seg,
                              CAST(FLOOR(c_acctbal * 100) AS BIGINT)
                                  AS v
                       FROM customer
                       WHERE c_mktsegment IN ('BUILDING',
                                              'AUTOMOBILE')),
            g AS (SELECT v,
                         SUM(CASE WHEN seg = 'BUILDING' THEN 1
                             ELSE 0 END) AS a,
                         SUM(CASE WHEN seg = 'AUTOMOBILE' THEN 1
                             ELSE 0 END) AS bb
                  FROM b GROUP BY 1),
            c AS (SELECT v, a + bb AS cv,
                         CAST(SUM(a) OVER (ORDER BY v) AS HUGEINT)
                             AS ca,
                         CAST(SUM(bb) OVER (ORDER BY v) AS HUGEINT)
                             AS cb
                  FROM g),
            nn AS (SELECT CAST(SUM(a) AS HUGEINT) AS n,
                          CAST(SUM(bb) AS HUGEINT) AS m
                   FROM g),
            ps AS (SELECT SUM(cv * (m * ca - n * cb)
                              * (m * ca - n * cb)) AS psi
                   FROM c, nn)
            SELECT CAST(n AS BIGINT) AS n_building,
                   CAST(m AS BIGINT) AS n_automobile,
                   CAST(psi AS BIGINT) AS psi,
                   CAST(CASE WHEN n > 0 AND m > 0 THEN
                        1000 * psi // ((n + m) * n * n * m * m)
                        ELSE 0 END AS BIGINT) AS cvm_milli
            FROM ps, nn
        """,
        "events_ljung_box": """
            WITH d AS (SELECT epoch_us(ts)//86400000000 AS day_id,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM events GROUP BY 1),
            rng AS (SELECT MIN(day_id) AS mn, MAX(day_id) AS mx
                    FROM d),
            grid AS (SELECT unnest(generate_series(mn, mx)) AS day_id
                     FROM rng),
            g AS (SELECT grid.day_id, COALESCE(c, 0) AS c
                  FROM grid LEFT JOIN d USING (day_id)),
            nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM g),
            lags AS (SELECT unnest(generate_series(1, 7)) AS lg),
            p AS (SELECT l.lg, a.c AS x, b.c AS y
                  FROM lags l
                  JOIN g a ON true
                  JOIN g b ON b.day_id = a.day_id + l.lg),
            m AS (SELECT lg, CAST(COUNT(*) AS HUGEINT) AS nk,
                         CAST(SUM(x) AS HUGEINT) AS sx,
                         CAST(SUM(y) AS HUGEINT) AS sy,
                         CAST(SUM(x * y) AS HUGEINT) AS sxy,
                         CAST(SUM(x * x) AS HUGEINT) AS sxx,
                         CAST(SUM(y * y) AS HUGEINT) AS syy
                  FROM p GROUP BY lg),
            t AS (SELECT lg,
                         CASE WHEN nk * sxx - sx * sx > 0
                              AND nk * syy - sy * sy > 0 THEN
                           1000 * n * (n + 2)
                           * (nk * sxy - sx * sy)
                           * (nk * sxy - sx * sy)
                           // ((n - lg)
                               * (nk * sxx - sx * sx)
                               * (nk * syy - sy * sy))
                         ELSE 0 END AS term
                  FROM m, nn)
            SELECT CAST(n AS BIGINT) AS n_days,
                   CAST(7 AS BIGINT) AS max_lag,
                   CAST(SUM(term) AS BIGINT) AS q_milli
            FROM t, nn GROUP BY n
        """,
        "nation_flow_stdres": """
            WITH f AS (SELECT s.s_nationkey AS sn,
                              c.c_nationkey AS cn
                       FROM lineitem l
                       JOIN orders o ON l.l_orderkey = o.o_orderkey
                       JOIN customer c ON o.o_custkey = c.c_custkey
                       JOIN supplier s ON l.l_suppkey = s.s_suppkey),
            o AS (SELECT sn, cn, COUNT(*) AS ob FROM f GROUP BY 1, 2),
            r AS (SELECT sn, CAST(COUNT(*) AS BIGINT) AS r
                  FROM f GROUP BY 1),
            c AS (SELECT cn, CAST(COUNT(*) AS BIGINT) AS c
                  FROM f GROUP BY 1),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM f),
            g AS (SELECT r.sn, c.cn, r.r, c.c,
                         COALESCE(o.ob, 0) AS ob
                  FROM r CROSS JOIN c
                  LEFT JOIN o ON o.sn = r.sn AND o.cn = c.cn),
            e AS (SELECT sn, cn, ob, r, c,
                         n * ob - r * c AS dev,
                         CAST(FLOOR((CAST(n * ob - r * c AS DOUBLE)
                                     / CAST(n AS DOUBLE))
                                    / SQRT(CAST(r * c AS DOUBLE)
                                           / CAST(n AS DOUBLE)
                                           * (1.0 - CAST(r AS DOUBLE)
                                              / CAST(n AS DOUBLE))
                                           * (1.0 - CAST(c AS DOUBLE)
                                              / CAST(n AS DOUBLE)))
                                    * 1000.0) AS BIGINT) AS sr
                  FROM g, nn),
            t AS (SELECT *, ROW_NUMBER() OVER (
                      ORDER BY ABS(sr) DESC, sn, cn) AS rk
                  FROM e)
            SELECT CAST(sn AS BIGINT) AS s_nationkey,
                   CAST(cn AS BIGINT) AS c_nationkey,
                   CAST(ob AS BIGINT) AS obs,
                   r AS r_tot, c AS c_tot,
                   CAST(dev AS BIGINT) AS dev_num,
                   sr AS stdres_milli,
                   CAST(rk AS BIGINT) AS rk
            FROM t WHERE rk <= 15 ORDER BY rk
        """,
        "events_brown_forsythe": """
            WITH b AS (SELECT event_type AS et,
                              CAST(FLOOR(value * 100) AS BIGINT) AS v
                       FROM events),
            md AS (SELECT et, CAST(quantile_disc(v, 0.50) AS BIGINT)
                              AS med
                   FROM b GROUP BY 1),
            z AS (SELECT b.et, ABS(b.v - md.med) AS z
                  FROM b JOIN md ON b.et = md.et),
            g AS (SELECT et, CAST(COUNT(*) AS HUGEINT) AS n_i,
                         CAST(SUM(z) AS HUGEINT) AS s_i,
                         SUM(CAST(z AS HUGEINT) * z) AS q_i
                  FROM z GROUP BY 1),
            m AS (SELECT et, n_i, s_i, q_i,
                         (1000 * s_i) // n_i AS m_i
                  FROM g),
            tot AS (SELECT SUM(n_i) AS n, SUM(s_i) AS s,
                           COUNT(*) AS k
                    FROM m),
            gm AS (SELECT (1000 * s) // n AS mbar, n, k FROM tot),
            ss AS (SELECT SUM(n_i * (m_i - mbar) * (m_i - mbar))
                              AS ssb,
                          SUM(1000000 * q_i - 2 * m_i * 1000 * s_i
                              + n_i * m_i * m_i) AS ssw
                   FROM m, gm),
            bw AS (SELECT
                     (SELECT et FROM m
                      ORDER BY m_i DESC, et LIMIT 1) AS widest,
                     (SELECT et FROM m
                      ORDER BY m_i ASC, et LIMIT 1) AS tightest)
            SELECT CAST(n AS BIGINT) AS n_events,
                   CAST(k AS BIGINT) AS n_types,
                   CAST(CASE WHEN ssw > 0 AND k > 1 THEN
                        1000 * ssb * (n - k) // (ssw * (k - 1))
                        ELSE 0 END AS BIGINT) AS f_milli,
                   CAST(CASE WHEN ssb + ssw > 0 THEN
                        10000 * ssb // (ssb + ssw)
                        ELSE 0 END AS BIGINT) AS eta2_bps,
                   widest AS widest_type,
                   tightest AS tightest_type
            FROM ss, gm, bw
        """,
        "media_phash_near_pairs": """
            WITH h AS (SELECT doc_id,
                              CAST(('0x' || substr(md5(text), 17, 16))
                                   AS UBIGINT) AS h64
                       FROM documents),
            b AS (SELECT doc_id,
                         unnest([0, 1, 2, 3]) AS band,
                         unnest([
                             CAST(('0x' || substr(md5(text), 17, 4))
                                  AS BIGINT),
                             CAST(('0x' || substr(md5(text), 21, 4))
                                  AS BIGINT),
                             CAST(('0x' || substr(md5(text), 25, 4))
                                  AS BIGINT),
                             CAST(('0x' || substr(md5(text), 29, 4))
                                  AS BIGINT)]) AS val
                  FROM documents),
            p AS (SELECT DISTINCT a.doc_id AS d1, b2.doc_id AS d2
                  FROM b a JOIN b b2
                  ON a.band = b2.band AND a.val = b2.val
                     AND a.doc_id < b2.doc_id),
            j AS (SELECT p.d1, p.d2,
                         bit_count(xor(h1.h64, h2.h64)) AS ham
                  FROM p
                  JOIN h h1 ON h1.doc_id = p.d1
                  JOIN h h2 ON h2.doc_id = p.d2),
            nn AS (SELECT COUNT(*) AS n_docs FROM documents)
            SELECT CAST(n_docs AS BIGINT) AS n_docs,
                   CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs,
                   CAST(COALESCE(SUM(CASE WHEN ham <= 8 THEN 1
                                     ELSE 0 END), 0) AS BIGINT)
                       AS n_ham_le8,
                   CAST(COALESCE(SUM(CASE WHEN ham <= 16 THEN 1
                                     ELSE 0 END), 0) AS BIGINT)
                       AS n_ham_le16,
                   CAST(COALESCE(MIN(ham), -1) AS BIGINT)
                       AS min_hamming
            FROM j, nn GROUP BY n_docs
        """,
        "lineitem_tail_dependence": """
            WITH b AS (SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS x,
                              CAST(FLOOR(l_discount * 100) AS BIGINT)
                                  AS y
                       FROM lineitem),
            q AS (SELECT CAST(quantile_disc(x, 0.75) AS BIGINT)
                             AS qx_hi,
                         CAST(quantile_disc(x, 0.25) AS BIGINT)
                             AS qx_lo,
                         CAST(quantile_disc(y, 0.75) AS BIGINT)
                             AS qy_hi,
                         CAST(quantile_disc(y, 0.25) AS BIGINT)
                             AS qy_lo,
                         CAST(COUNT(*) AS BIGINT) AS n
                  FROM b),
            t AS (SELECT
                    COALESCE(SUM(CASE WHEN x > qx_hi THEN 1
                                 ELSE 0 END), 0) AS nx_hi,
                    COALESCE(SUM(CASE WHEN y > qy_hi THEN 1
                                 ELSE 0 END), 0) AS ny_hi,
                    COALESCE(SUM(CASE WHEN x > qx_hi AND y > qy_hi
                                 THEN 1 ELSE 0 END), 0) AS nj_hi,
                    COALESCE(SUM(CASE WHEN x < qx_lo THEN 1
                                 ELSE 0 END), 0) AS nx_lo,
                    COALESCE(SUM(CASE WHEN y < qy_lo THEN 1
                                 ELSE 0 END), 0) AS ny_lo,
                    COALESCE(SUM(CASE WHEN x < qx_lo AND y < qy_lo
                                 THEN 1 ELSE 0 END), 0) AS nj_lo
                  FROM b, q)
            SELECT n AS n_lines,
                   qx_hi, qy_hi,
                   CAST(nx_hi AS BIGINT) AS nx_hi,
                   CAST(ny_hi AS BIGINT) AS ny_hi,
                   CAST(nj_hi AS BIGINT) AS n_joint_hi,
                   CAST(CASE WHEN nx_hi > 0 AND ny_hi > 0 THEN
                        10000 * nj_hi * n // (nx_hi * ny_hi)
                        ELSE -1 END AS BIGINT) AS lift_hi_bps,
                   qx_lo, qy_lo,
                   CAST(nx_lo AS BIGINT) AS nx_lo,
                   CAST(ny_lo AS BIGINT) AS ny_lo,
                   CAST(nj_lo AS BIGINT) AS n_joint_lo,
                   CAST(CASE WHEN nx_lo > 0 AND ny_lo > 0 THEN
                        10000 * nj_lo * n // (nx_lo * ny_lo)
                        ELSE -1 END AS BIGINT) AS lift_lo_bps
            FROM t, q
        """,
        "events_rayleigh_hour": """
            WITH lat AS (SELECT unnest(generate_series(0, 23)) AS hr,
                                unnest([1000000, 965925, 866025,
                                        707106, 500000, 258819, 0,
                                        -258820, -500000, -707107,
                                        -866026, -965926, -1000000,
                                        -965926, -866026, -707107,
                                        -500001, -258820, -1, 258819,
                                        500000, 707106, 866025,
                                        965925]) AS cs,
                                unnest([0, 258819, 499999, 707106,
                                        866025, 965925, 1000000,
                                        965925, 866025, 707106,
                                        499999, 258819, 0, -258820,
                                        -500000, -707107, -866026,
                                        -965926, -1000000, -965926,
                                        -866026, -707107, -500001,
                                        -258820]) AS sn),
            h AS (SELECT (epoch_us(ts)//3600000000) % 24 AS hr,
                         COUNT(*) AS n
                  FROM events GROUP BY 1),
            g AS (SELECT lat.hr, lat.cs, lat.sn,
                         COALESCE(h.n, 0) AS n
                  FROM lat LEFT JOIN h USING (hr)),
            s AS (SELECT SUM(CAST(n AS HUGEINT) * cs) AS sx,
                         SUM(CAST(n AS HUGEINT) * sn) AS sy,
                         CAST(SUM(n) AS HUGEINT) AS n
                  FROM g),
            pk AS (SELECT lat.hr FROM lat, s
                   ORDER BY CAST(lat.cs AS HUGEINT) * s.sx
                            + CAST(lat.sn AS HUGEINT) * s.sy DESC,
                            lat.hr
                   LIMIT 1)
            SELECT CAST(n AS BIGINT) AS n_events,
                   CAST(sx AS BIGINT) AS sx_fp,
                   CAST(sy AS BIGINT) AS sy_fp,
                   CAST(1000 * (sx * sx + sy * sy)
                        // (n * 1000000000000) AS BIGINT) AS z_milli,
                   CAST(pk.hr AS BIGINT) AS peak_hour
            FROM s, pk
        """,
        "events_hour_resultant_by_type": """
            WITH lat AS (SELECT unnest(generate_series(0, 23)) AS hr,
                                unnest([1000000, 965925, 866025,
                                        707106, 500000, 258819, 0,
                                        -258820, -500000, -707107,
                                        -866026, -965926, -1000000,
                                        -965926, -866026, -707107,
                                        -500001, -258820, -1, 258819,
                                        500000, 707106, 866025,
                                        965925]) AS cs,
                                unnest([0, 258819, 499999, 707106,
                                        866025, 965925, 1000000,
                                        965925, 866025, 707106,
                                        499999, 258819, 0, -258820,
                                        -500000, -707107, -866026,
                                        -965926, -1000000, -965926,
                                        -866026, -707107, -500001,
                                        -258820]) AS sn),
            h AS (SELECT event_type AS et,
                         (epoch_us(ts)//3600000000) % 24 AS hr,
                         COUNT(*) AS n
                  FROM events GROUP BY 1, 2),
            ets AS (SELECT DISTINCT et FROM h),
            g AS (SELECT ets.et, lat.hr, lat.cs, lat.sn,
                         COALESCE(h.n, 0) AS n
                  FROM ets CROSS JOIN lat
                  LEFT JOIN h ON h.et = ets.et AND h.hr = lat.hr),
            s AS (SELECT et, SUM(CAST(n AS HUGEINT) * cs) AS sx,
                         SUM(CAST(n AS HUGEINT) * sn) AS sy,
                         CAST(SUM(n) AS HUGEINT) AS n
                  FROM g GROUP BY 1),
            r AS (SELECT et, n,
                         CAST(FLOOR(SQRT(CAST(sx * sx + sy * sy
                                              AS DOUBLE))
                                    / (CAST(n AS DOUBLE)
                                       * 1000000.0)
                                    * 10000.0) AS BIGINT) AS rbar
                  FROM s)
            SELECT et AS event_type,
                   CAST(n AS BIGINT) AS n_events,
                   rbar AS rbar_bps,
                   10000 - rbar AS circ_var_bps
            FROM r ORDER BY event_type
        """,
        "embedding_hubness_audit": """
            WITH q AS (SELECT vec_id, embedding FROM embeddings
                       WHERE vec_id % 4 = 0),
            top AS (SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                       CAST(FLOOR(list_cosine_similarity(
                           CAST(q.embedding AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) * 10000)
                           AS BIGINT) AS sim_bp
                FROM q, embeddings e WHERE e.vec_id != q.vec_id)
              QUALIFY row_number() OVER (
                  PARTITION BY query_id
                  ORDER BY sim_bp DESC, neighbor_id) <= 5),
            occ AS (SELECT neighbor_id, CAST(COUNT(*) AS BIGINT) AS c
                    FROM top GROUP BY 1),
            nn AS (SELECT (SELECT COUNT(*) FROM q) AS n_queries,
                          (SELECT COUNT(*) FROM embeddings)
                              AS n_vectors),
            mx AS (SELECT COALESCE(MAX(c), 0) AS max_occ FROM occ),
            hub AS (SELECT COALESCE(MIN(neighbor_id), -1) AS hub
                    FROM occ, mx WHERE c = max_occ),
            bands AS (SELECT COUNT(*) AS n_occ,
                             COALESCE(SUM(CASE WHEN c BETWEEN 1 AND 4
                                          THEN 1 ELSE 0 END), 0)
                                 AS n_low,
                             COALESCE(SUM(CASE WHEN c BETWEEN 5 AND 9
                                          THEN 1 ELSE 0 END), 0)
                                 AS n_mid,
                             COALESCE(SUM(CASE WHEN c >= 10
                                          THEN 1 ELSE 0 END), 0)
                                 AS n_high
                      FROM occ)
            SELECT CAST(n_queries AS BIGINT) AS n_queries,
                   CAST(n_vectors AS BIGINT) AS n_vectors,
                   CAST(5 AS BIGINT) AS k,
                   CAST(n_vectors - n_occ AS BIGINT) AS n_zero_occ,
                   CAST(n_low AS BIGINT) AS n_occ_1_4,
                   CAST(n_mid AS BIGINT) AS n_occ_5_9,
                   CAST(n_high AS BIGINT) AS n_occ_10p,
                   CAST(max_occ AS BIGINT) AS max_occ,
                   CAST(hub AS BIGINT) AS hub_vec_id
            FROM nn, mx, hub, bands
        """,
        "hash_partition_balance": """
            WITH h AS (SELECT CAST(('0x' || substr(md5(
                                  CAST(l_orderkey AS VARCHAR)), 1, 16))
                                   AS UBIGINT) AS hv
                       FROM lineitem),
            w AS (SELECT unnest([16, 64, 256]) AS w),
            b AS (SELECT w.w, CAST(h.hv % w.w AS BIGINT) AS p
                  FROM h, w),
            g AS (SELECT w, p, CAST(COUNT(*) AS BIGINT) AS c
                  FROM b GROUP BY 1, 2),
            grid AS (SELECT w, unnest(generate_series(0, w - 1)) AS p
                     FROM w),
            f AS (SELECT grid.w, grid.p, COALESCE(g.c, 0) AS c
                  FROM grid LEFT JOIN g
                  ON g.w = grid.w AND g.p = grid.p),
            s AS (SELECT w, CAST(SUM(c) AS HUGEINT) AS n
                  FROM f GROUP BY 1),
            r AS (SELECT f.w,
                         MIN(f.c) AS mn, MAX(f.c) AS mx,
                         SUM(1000 * (CAST(f.w AS HUGEINT) * f.c - s.n)
                             * (CAST(f.w AS HUGEINT) * f.c - s.n)
                             // (f.w * s.n)) AS chi2m
                  FROM f JOIN s ON f.w = s.w GROUP BY f.w)
            SELECT CAST(r.w AS BIGINT) AS n_partitions,
                   CAST(s.n AS BIGINT) AS n_rows,
                   CAST(mn AS BIGINT) AS min_load,
                   CAST(mx AS BIGINT) AS max_load,
                   CAST(10000 * (CAST(mx AS HUGEINT) * r.w - s.n)
                        // s.n AS BIGINT) AS imbalance_bps,
                   CAST(chi2m AS BIGINT) AS chi2_milli
            FROM r JOIN s ON r.w = s.w ORDER BY n_partitions
        """,
        "simhash_bit_bias_audit": """
            WITH tt AS (SELECT doc_id,
                               unnest(string_split(text, ' ')) AS tok
                        FROM documents),
            hv AS (SELECT doc_id,
                          CAST(('0x' || substr(md5(tok), 1, 16))
                               AS UBIGINT) AS h
                   FROM tt WHERE tok <> ''),
            bb AS (SELECT unnest(generate_series(0, 63)) AS b),
            bits AS (SELECT doc_id, bb.b,
                            CAST((h >> CAST(bb.b AS UBIGINT))
                                 & 1 AS BIGINT) AS bit
                     FROM hv, bb),
            maj AS (SELECT doc_id, b,
                           CASE WHEN 2 * SUM(bit) > COUNT(*)
                                THEN 1 ELSE 0 END AS pos
                    FROM bits GROUP BY 1, 2),
            bias AS (SELECT b AS bit,
                            CAST(COALESCE(SUM(pos), 0) AS BIGINT)
                                AS n_set
                     FROM bb LEFT JOIN maj USING (b) GROUP BY 1),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
                   FROM documents)
            SELECT bit, n_set,
                   CAST(10000 * n_set // n AS BIGINT)
                       AS set_share_bps,
                   CAST(10000 * ABS(2 * n_set - n) // (2 * n)
                        AS BIGINT) AS dev_bps
            FROM bias, nn ORDER BY bit
        """,
        "token_head_tail_ladder": """
            WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
                       FROM documents),
            f AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS f
                  FROM t WHERE tok <> '' GROUP BY 1),
            l1 AS (SELECT 1000 * SUM(f) // COUNT(*) AS thr,
                          COUNT(*) AS cnt, SUM(f) AS mass
                   FROM f),
            h1 AS (SELECT f.tok, f.f FROM f, l1
                   WHERE 1000 * f.f > l1.thr),
            l2 AS (SELECT 1000 * SUM(f) // COUNT(*) AS thr,
                          COUNT(*) AS cnt, SUM(f) AS mass
                   FROM h1),
            h2 AS (SELECT h1.tok, h1.f FROM h1, l2
                   WHERE 1000 * h1.f > l2.thr),
            l3 AS (SELECT 1000 * SUM(f) // COUNT(*) AS thr,
                          COUNT(*) AS cnt, SUM(f) AS mass
                   FROM h2),
            h3 AS (SELECT h2.tok, h2.f FROM h2, l3
                   WHERE 1000 * h2.f > l3.thr),
            l4 AS (SELECT 1000 * SUM(f) // COUNT(*) AS thr,
                          COUNT(*) AS cnt, SUM(f) AS mass
                   FROM h3),
            h4 AS (SELECT h3.tok, h3.f FROM h3, l4
                   WHERE 1000 * h3.f > l4.thr),
            ladder AS (
              SELECT 1 AS level, l1.thr, l1.cnt, l1.mass,
                     (SELECT COUNT(*) FROM h1) AS nh,
                     (SELECT COALESCE(SUM(f), 0) FROM h1) AS mh
              FROM l1
              UNION ALL
              SELECT 2, l2.thr, l2.cnt, l2.mass,
                     (SELECT COUNT(*) FROM h2),
                     (SELECT COALESCE(SUM(f), 0) FROM h2)
              FROM l2
              UNION ALL
              SELECT 3, l3.thr, l3.cnt, l3.mass,
                     (SELECT COUNT(*) FROM h3),
                     (SELECT COALESCE(SUM(f), 0) FROM h3)
              FROM l3
              UNION ALL
              SELECT 4, l4.thr, l4.cnt, l4.mass,
                     (SELECT COUNT(*) FROM h4),
                     (SELECT COALESCE(SUM(f), 0) FROM h4)
              FROM l4)
            SELECT CAST(level AS BIGINT) AS level,
                   CAST(CASE WHEN cnt >= 2 THEN thr ELSE -1 END
                        AS BIGINT) AS thr_milli,
                   CAST(COALESCE(cnt, 0) AS BIGINT)
                       AS n_tokens_level,
                   CAST(CASE WHEN cnt >= 2 THEN nh ELSE -1 END
                        AS BIGINT) AS n_head,
                   CAST(CASE WHEN cnt >= 2 THEN 10000 * nh // cnt
                        ELSE -1 END AS BIGINT) AS head_share_bps,
                   CAST(CASE WHEN cnt >= 2 THEN 10000 * mh // mass
                        ELSE -1 END AS BIGINT) AS mass_share_bps
            FROM ladder ORDER BY level
        """,
        "part_rich_club": """
            WITH s AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
                              l_partkey AS pk
                       FROM lineitem),
            o AS (SELECT ok, pk,
                         LAG(pk) OVER (PARTITION BY ok
                                       ORDER BY ln, pk) AS prev
                  FROM s),
            ed AS (SELECT DISTINCT LEAST(pk, prev) AS a,
                          GREATEST(pk, prev) AS b
                   FROM o WHERE prev IS NOT NULL AND pk <> prev),
            deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
                    FROM (SELECT a AS node FROM ed
                          UNION ALL SELECT b FROM ed)
                    GROUP BY 1),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
            mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM ed),
            rk AS (SELECT node, ROW_NUMBER() OVER (
                       ORDER BY d DESC, node) AS r
                   FROM deg),
            den AS (SELECT unnest(['p90', 'p99']) AS club,
                           unnest([10, 100]) AS dd),
            cl AS (SELECT den.club, den.dd,
                          (n + dd - 1) // dd AS nc
                   FROM den, nn),
            ce AS (SELECT cl.club, cl.nc,
                          (SELECT COUNT(*) FROM ed
                           JOIN rk r1 ON ed.a = r1.node
                           JOIN rk r2 ON ed.b = r2.node
                           WHERE r1.r <= cl.nc AND r2.r <= cl.nc)
                              AS ec
                   FROM cl),
            gd AS (SELECT CASE WHEN n > 1 THEN
                          10000 * 2 * m // (n * (n - 1))
                          ELSE -1 END AS g_dens
                   FROM nn, mm)
            SELECT ce.club,
                   CAST(n AS BIGINT) AS n_nodes,
                   CAST(m AS BIGINT) AS n_edges,
                   CAST(ce.nc AS BIGINT) AS club_size,
                   CAST(ce.ec AS BIGINT) AS club_edges,
                   CAST(CASE WHEN ce.nc > 1 THEN
                        10000 * 2 * ce.ec // (ce.nc * (ce.nc - 1))
                        ELSE -1 END AS BIGINT) AS phi_bps,
                   CAST(g_dens AS BIGINT) AS graph_density_bps,
                   CAST(CASE WHEN ce.nc > 1 AND g_dens > 0 THEN
                        10000 * (10000 * 2 * ce.ec
                                 // (ce.nc * (ce.nc - 1))) // g_dens
                        ELSE -1 END AS BIGINT) AS lift_bps
            FROM ce, nn, mm, gd ORDER BY ce.club
        """,
        "events_inspection_paradox": """
            WITH e AS (SELECT user_id AS u, epoch_us(ts) AS tsu,
                              event_id AS eid
                       FROM events),
            s AS (SELECT u, tsu,
                         LAG(tsu) OVER (PARTITION BY u
                                        ORDER BY tsu, eid) AS prev
                  FROM e),
            g AS (SELECT (tsu - prev) // 1000000 AS gap
                  FROM s WHERE prev IS NOT NULL),
            m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(COALESCE(SUM(gap), 0) AS HUGEINT) AS sg,
                         COALESCE(SUM(CAST(gap AS HUGEINT) * gap), 0)
                             AS sg2
                  FROM g)
            SELECT CAST(n AS BIGINT) AS n_gaps,
                   CAST(sg AS BIGINT) AS sum_gap_s,
                   CAST(CASE WHEN n = 0 OR sg = 0 THEN 0
                        ELSE 1000 * sg // n END AS BIGINT)
                       AS mean_gap_milli,
                   CAST(CASE WHEN n = 0 OR sg = 0 THEN 0
                        ELSE 1000 * sg2 // sg END AS BIGINT)
                       AS biased_mean_milli,
                   CAST(CASE WHEN n = 0 OR sg = 0 THEN 0
                        ELSE 10000 * sg2 * n // (sg * sg)
                        END AS BIGINT) AS paradox_ratio_bps
            FROM m
        """,
        "orders_var_es": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE)) AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS rev
                       FROM orders GROUP BY 1),
            w AS (SELECT rev - LAG(rev) OVER (ORDER BY dy) AS delta
                  FROM d),
            dd AS (SELECT delta FROM w WHERE delta IS NOT NULL),
            v1 AS (SELECT CAST(quantile_disc(delta, 0.01) AS BIGINT)
                              AS var_c,
                          CAST(COUNT(*) AS BIGINT) AS n
                   FROM dd),
            t1 AS (SELECT COUNT(*) AS cnt,
                          COALESCE(SUM(delta), 0) AS ssum
                   FROM dd, v1 WHERE delta <= var_c),
            v5 AS (SELECT CAST(quantile_disc(delta, 0.05) AS BIGINT)
                              AS var_c,
                          CAST(COUNT(*) AS BIGINT) AS n
                   FROM dd),
            t5 AS (SELECT COUNT(*) AS cnt,
                          COALESCE(SUM(delta), 0) AS ssum
                   FROM dd, v5 WHERE delta <= var_c)
            SELECT * FROM (
              SELECT CAST(1 AS BIGINT) AS pct, n AS n_deltas,
                     var_c AS var_cents,
                     CAST(cnt AS BIGINT) AS n_tail,
                     CAST(CASE WHEN cnt = 0 THEN 0
                          ELSE (CASE WHEN ssum >= 0 THEN 1
                                ELSE -1 END)
                               * (ABS(ssum) // cnt)
                          END AS BIGINT) AS es_cents
              FROM v1, t1
              UNION ALL
              SELECT 5, n, var_c, CAST(cnt AS BIGINT),
                     CAST(CASE WHEN cnt = 0 THEN 0
                          ELSE (CASE WHEN ssum >= 0 THEN 1
                                ELSE -1 END)
                               * (ABS(ssum) // cnt)
                          END AS BIGINT)
              FROM v5, t5)
            ORDER BY pct
        """,
        "nation_revenue_shift_share": """
            WITH o AS (SELECT c.c_nationkey AS nk,
                              o.o_orderpriority AS pri,
                              datediff('day', DATE '1970-01-01',
                                       CAST(o.o_orderdate AS DATE))
                                  AS dy,
                              CAST(FLOOR(o.o_totalprice * 100)
                                   AS BIGINT) AS c
                       FROM orders o
                       JOIN customer c
                       ON o.o_custkey = c.c_custkey),
            sp AS (SELECT (MIN(dy) + MAX(dy)) // 2 AS mid FROM o),
            b AS (SELECT nk, pri,
                         CASE WHEN dy > mid THEN 1 ELSE 0 END AS h, c
                  FROM o, sp),
            n1 AS (SELECT nk,
                          CAST(SUM(CASE WHEN h = 0 THEN c ELSE 0 END)
                               AS HUGEINT) AS r1,
                          CAST(SUM(CASE WHEN h = 1 THEN c ELSE 0 END)
                               AS HUGEINT) AS r2
                   FROM b GROUP BY 1),
            tt AS (SELECT CAST(SUM(CASE WHEN h = 0 THEN c ELSE 0 END)
                               AS HUGEINT) AS t1,
                          CAST(SUM(CASE WHEN h = 1 THEN c ELSE 0 END)
                               AS HUGEINT) AS t2
                   FROM b),
            tpp AS (SELECT pri,
                           CAST(SUM(CASE WHEN h = 0 THEN c
                                    ELSE 0 END) AS HUGEINT) AS t1p,
                           CAST(SUM(CASE WHEN h = 1 THEN c
                                    ELSE 0 END) AS HUGEINT) AS t2p
                    FROM b GROUP BY 1),
            np AS (SELECT nk, pri,
                          CAST(SUM(CASE WHEN h = 0 THEN c ELSE 0 END)
                               AS HUGEINT) AS r1p
                   FROM b GROUP BY 1, 2),
            mixb AS (SELECT np.nk,
                            SUM(CASE WHEN t1p > 0
                                THEN np.r1p * t2p // t1p
                                ELSE 0 END) AS mb
                     FROM np JOIN tpp USING (pri) GROUP BY 1)
            SELECT CAST(n1.nk AS BIGINT) AS c_nationkey,
                   CAST(r1 AS BIGINT) AS rev_h1_cents,
                   CAST(r2 AS BIGINT) AS rev_h2_cents,
                   CAST(r2 - r1 AS BIGINT) AS delta_cents,
                   CAST(CASE WHEN t1 > 0 THEN r1 * t2 // t1 - r1
                        ELSE 0 END AS BIGINT)
                       AS national_effect_cents,
                   CAST(mb - (CASE WHEN t1 > 0 THEN r1 * t2 // t1
                              ELSE 0 END) AS BIGINT)
                       AS mix_effect_cents,
                   CAST((r2 - r1)
                        - (CASE WHEN t1 > 0 THEN r1 * t2 // t1 - r1
                           ELSE 0 END)
                        - (mb - (CASE WHEN t1 > 0
                                 THEN r1 * t2 // t1
                                 ELSE 0 END)) AS BIGINT)
                       AS residual_cents
            FROM n1 JOIN mixb ON n1.nk = mixb.nk, tt
            ORDER BY c_nationkey
        """,
        "part_brand_hhi_decomposition": """
            WITH pr AS (SELECT l_partkey AS pk,
                               CAST(SUM(CAST(FLOOR(l_extendedprice
                                                   * 100) AS BIGINT))
                                    AS HUGEINT) AS c
                        FROM lineitem GROUP BY 1),
            j AS (SELECT pr.pk, pr.c, p.p_brand AS br
                  FROM pr JOIN part p ON pr.pk = p.p_partkey),
            tt AS (SELECT SUM(c) AS t, SUM(c * c) AS sq FROM j),
            bb AS (SELECT br, CAST(COUNT(*) AS BIGINT) AS np,
                          SUM(c) AS s, SUM(c * c) AS sq
                   FROM j GROUP BY 1),
            bt AS (SELECT SUM(s * s) AS sbsq FROM bb)
            SELECT br AS p_brand, np AS n_parts,
                   CAST(s AS BIGINT) AS rev_cents,
                   CAST(10000 * s // t AS BIGINT) AS w_bps,
                   CAST(CASE WHEN s > 0 THEN 10000 * bb.sq // (s * s)
                        ELSE 0 END AS BIGINT) AS hhi_within_bps,
                   CAST(10000 * tt.sq // (t * t) AS BIGINT)
                       AS hhi_total_bps,
                   CAST(10000 * sbsq // (t * t) AS BIGINT)
                       AS hhi_between_bps
            FROM bb, tt, bt ORDER BY p_brand
        """,
        "customer_topk_stability": """
            WITH o AS (SELECT o_custkey AS ck,
                              datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE))
                                  AS dy,
                              CAST(FLOOR(o_totalprice * 100)
                                   AS BIGINT) AS c
                       FROM orders),
            sp AS (SELECT (MIN(dy) + MAX(dy)) // 2 AS mid FROM o),
            g AS (SELECT ck,
                         CASE WHEN dy > mid THEN 1 ELSE 0 END AS h,
                         SUM(c) AS c
                  FROM o, sp GROUP BY 1, 2),
            r AS (SELECT ck, h, c,
                         ROW_NUMBER() OVER (PARTITION BY h
                                            ORDER BY c DESC, ck)
                             AS rk
                  FROM g),
            t1 AS (SELECT ck, c FROM r WHERE h = 0 AND rk <= 100),
            t2 AS (SELECT ck, c FROM r WHERE h = 1 AND rk <= 100),
            st AS (SELECT (SELECT COUNT(*) FROM t1) AS n1,
                          (SELECT COUNT(*) FROM t2) AS n2,
                          (SELECT COUNT(*) FROM t1
                           JOIN t2 USING (ck)) AS inter,
                          (SELECT COALESCE(MIN(c), -1) FROM t1)
                              AS thr1,
                          (SELECT COALESCE(MIN(c), -1) FROM t2)
                              AS thr2)
            SELECT CAST(100 AS BIGINT) AS k,
                   CAST(n1 AS BIGINT) AS n_top_h1,
                   CAST(n2 AS BIGINT) AS n_top_h2,
                   CAST(inter AS BIGINT) AS overlap,
                   CAST(CASE WHEN n1 + n2 - inter > 0 THEN
                        10000 * inter // (n1 + n2 - inter)
                        ELSE 0 END AS BIGINT) AS jaccard_bps,
                   CAST(thr1 AS BIGINT) AS thr_h1_cents,
                   CAST(thr2 AS BIGINT) AS thr_h2_cents
            FROM st
        """,
        "orders_gain_loss_asymmetry": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE)) AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS rev
                       FROM orders GROUP BY 1),
            w AS (SELECT dy,
                         rev - LAG(rev) OVER (ORDER BY dy) AS delta
                  FROM d),
            dd AS (SELECT dy, delta FROM w WHERE delta IS NOT NULL),
            s AS (SELECT COUNT(*) AS n,
                         COALESCE(SUM(CASE WHEN delta > 0 THEN 1
                                      ELSE 0 END), 0) AS n_up,
                         COALESCE(SUM(CASE WHEN delta < 0 THEN 1
                                      ELSE 0 END), 0) AS n_dn,
                         COALESCE(SUM(CASE WHEN delta > 0 THEN delta
                                      ELSE 0 END), 0) AS s_up,
                         COALESCE(SUM(CASE WHEN delta < 0 THEN -delta
                                      ELSE 0 END), 0) AS s_dn
                  FROM dd),
            g AS (SELECT delta, dy FROM dd
                  ORDER BY delta DESC, dy LIMIT 1),
            l AS (SELECT delta, dy FROM dd
                  ORDER BY delta ASC, dy LIMIT 1)
            SELECT CAST(n AS BIGINT) AS n_deltas,
                   CAST(n_up AS BIGINT) AS n_up,
                   CAST(n_dn AS BIGINT) AS n_down,
                   CAST(n - n_up - n_dn AS BIGINT) AS n_flat,
                   CAST(CASE WHEN n_up > 0 THEN 1000 * s_up // n_up
                        ELSE 0 END AS BIGINT) AS mean_up_milli,
                   CAST(CASE WHEN n_dn > 0 THEN 1000 * s_dn // n_dn
                        ELSE 0 END AS BIGINT) AS mean_down_milli,
                   CAST(CASE WHEN n_up > 0 AND n_dn > 0 AND s_dn > 0
                        THEN 10000 * s_up * n_dn // (s_dn * n_up)
                        ELSE -1 END AS BIGINT) AS up_down_ratio_bps,
                   CAST(g.delta AS BIGINT) AS max_gain_cents,
                   CAST(g.dy AS BIGINT) AS max_gain_dy,
                   CAST(l.delta AS BIGINT) AS max_loss_cents,
                   CAST(l.dy AS BIGINT) AS max_loss_dy
            FROM s, g, l
        """,
        "lineitem_arc_elasticity": """
            WITH b AS (SELECT CAST(FLOOR(l_discount * 100) AS BIGINT)
                              AS lvl,
                              CAST(FLOOR(l_quantity) AS BIGINT) AS q
                       FROM lineitem),
            g AS (SELECT lvl, CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(q) AS HUGEINT) AS sq
                  FROM b GROUP BY 1),
            w AS (SELECT lvl AS l1, n AS n1, sq AS s1,
                         LEAD(lvl) OVER (ORDER BY lvl) AS l2,
                         LEAD(n) OVER (ORDER BY lvl) AS n2,
                         LEAD(sq) OVER (ORDER BY lvl) AS s2
                  FROM g),
            e AS (SELECT l1, l2, n1, n2,
                         (s2 * n1 - s1 * n2)
                         * ((10000 - 100 * l2)
                            + (10000 - 100 * l1)) AS num,
                         (s2 * n1 + s1 * n2)
                         * ((10000 - 100 * l2)
                            - (10000 - 100 * l1)) AS den
                  FROM w WHERE l2 IS NOT NULL)
            SELECT CAST(l1 AS BIGINT) AS lvl_from,
                   CAST(l2 AS BIGINT) AS lvl_to,
                   CAST(n1 AS BIGINT) AS n_from,
                   CAST(n2 AS BIGINT) AS n_to,
                   CAST(CASE WHEN den = 0 THEN 0
                        ELSE (CASE WHEN (num >= 0) = (den > 0)
                              THEN 1 ELSE -1 END)
                             * (1000 * ABS(num) // ABS(den))
                        END AS BIGINT) AS elasticity_milli
            FROM e ORDER BY lvl_from
        """,
        "lang_token_simpson": """
            WITH t AS (SELECT lang,
                              unnest(string_split(text, ' ')) AS tok
                       FROM documents),
            f AS (SELECT lang, tok, CAST(COUNT(*) AS HUGEINT) AS f
                  FROM t WHERE tok <> '' GROUP BY 1, 2),
            g AS (SELECT lang, SUM(f) AS t_tot,
                         CAST(COUNT(*) AS BIGINT) AS vocab,
                         SUM(f * f) AS sq
                  FROM f GROUP BY 1)
            SELECT lang,
                   CAST(t_tot AS BIGINT) AS n_tokens,
                   vocab,
                   CAST(10000 * sq // (t_tot * t_tot) AS BIGINT)
                       AS collision_bps,
                   CAST(1000 * t_tot * t_tot // sq AS BIGINT)
                       AS inv_simpson_milli
            FROM g ORDER BY lang
        """,
        "orders_regression_to_mean": """
            WITH o AS (SELECT o_custkey AS ck, o_orderkey AS ok,
                              datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE))
                                  AS dy,
                              CAST(FLOOR(o_totalprice * 100)
                                   AS BIGINT) AS v
                       FROM orders),
            m AS (SELECT CAST(quantile_disc(v, 0.50) AS BIGINT)
                             AS med
                  FROM o),
            s AS (SELECT ck, v,
                         LAG(v) OVER (PARTITION BY ck
                                      ORDER BY dy, ok) AS pv
                  FROM o),
            p AS (SELECT pv, v FROM s, m
                  WHERE pv IS NOT NULL AND pv <> med),
            agg AS (SELECT
                      COALESCE(SUM(CASE WHEN pv > med THEN 1
                                   ELSE 0 END), 0) AS n_hi,
                      CAST(COALESCE(SUM(CASE WHEN pv > med THEN v
                                         ELSE 0 END), 0) AS HUGEINT)
                          AS s_hi,
                      COALESCE(SUM(CASE WHEN pv < med THEN 1
                                   ELSE 0 END), 0) AS n_lo,
                      CAST(COALESCE(SUM(CASE WHEN pv < med THEN v
                                         ELSE 0 END), 0) AS HUGEINT)
                          AS s_lo
                    FROM p, m)
            SELECT CAST(med AS BIGINT) AS median_cents,
                   CAST(n_hi AS BIGINT) AS n_pairs_hi,
                   CAST(n_lo AS BIGINT) AS n_pairs_lo,
                   CAST(CASE WHEN n_hi > 0 THEN 1000 * s_hi // n_hi
                        ELSE 0 END AS BIGINT) AS next_mean_hi_milli,
                   CAST(CASE WHEN n_lo > 0 THEN 1000 * s_lo // n_lo
                        ELSE 0 END AS BIGINT) AS next_mean_lo_milli,
                   CAST(CASE WHEN n_hi > 0 AND n_lo > 0 AND s_lo > 0
                        THEN (CASE WHEN s_hi * n_lo - s_lo * n_hi
                                   >= 0 THEN 1 ELSE -1 END)
                             * (10000 * ABS(s_hi * n_lo
                                            - s_lo * n_hi)
                                // (s_lo * n_hi))
                        ELSE -1 END AS BIGINT) AS hi_over_lo_gap_bps
            FROM agg, m
        """,
        "lineitem_did_discount": """
            WITH b AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(l_shipdate AS DATE)) AS dy,
                              CAST(FLOOR(l_discount * 10000)
                                   AS BIGINT) AS disc,
                              CAST(FLOOR(l_quantity) AS BIGINT) AS q
                       FROM lineitem),
            sp AS (SELECT (MIN(dy) + MAX(dy)) // 2 AS mid FROM b),
            cells AS (SELECT CASE WHEN disc >= 500 THEN 1 ELSE 0 END
                                 AS trt,
                             CASE WHEN dy > mid THEN 1 ELSE 0 END
                                 AS h, q
                      FROM b, sp),
            g AS (SELECT trt, h, CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(q) AS HUGEINT) AS s
                  FROM cells GROUP BY 1, 2),
            w AS (SELECT
                    MAX(CASE WHEN trt = 0 AND h = 0 THEN n END)
                        AS nc1,
                    MAX(CASE WHEN trt = 0 AND h = 0 THEN s END)
                        AS sc1,
                    MAX(CASE WHEN trt = 0 AND h = 1 THEN n END)
                        AS nc2,
                    MAX(CASE WHEN trt = 0 AND h = 1 THEN s END)
                        AS sc2,
                    MAX(CASE WHEN trt = 1 AND h = 0 THEN n END)
                        AS nt1,
                    MAX(CASE WHEN trt = 1 AND h = 0 THEN s END)
                        AS st1,
                    MAX(CASE WHEN trt = 1 AND h = 1 THEN n END)
                        AS nt2,
                    MAX(CASE WHEN trt = 1 AND h = 1 THEN s END)
                        AS st2
                  FROM g)
            SELECT CAST(mid AS BIGINT) AS mid_day,
                   CAST(nc1 AS BIGINT) AS n_ctl_h1,
                   CAST(nc2 AS BIGINT) AS n_ctl_h2,
                   CAST(nt1 AS BIGINT) AS n_trt_h1,
                   CAST(nt2 AS BIGINT) AS n_trt_h2,
                   CAST(CASE WHEN nc1 > 0 THEN 1000 * sc1 // nc1
                        ELSE -1 END AS BIGINT) AS mean_ctl_h1_milli,
                   CAST(CASE WHEN nc2 > 0 THEN 1000 * sc2 // nc2
                        ELSE -1 END AS BIGINT) AS mean_ctl_h2_milli,
                   CAST(CASE WHEN nt1 > 0 THEN 1000 * st1 // nt1
                        ELSE -1 END AS BIGINT) AS mean_trt_h1_milli,
                   CAST(CASE WHEN nt2 > 0 THEN 1000 * st2 // nt2
                        ELSE -1 END AS BIGINT) AS mean_trt_h2_milli,
                   CAST(CASE WHEN nc1 > 0 AND nc2 > 0 AND nt1 > 0
                             AND nt2 > 0 THEN
                        (CASE WHEN (st2 * nt1 - st1 * nt2)
                                   * nc1 * nc2
                                   - (sc2 * nc1 - sc1 * nc2)
                                   * nt1 * nt2 >= 0
                         THEN 1 ELSE -1 END)
                        * (1000 * ABS((st2 * nt1 - st1 * nt2)
                                      * nc1 * nc2
                                      - (sc2 * nc1 - sc1 * nc2)
                                      * nt1 * nt2)
                           // (nt1 * nt2 * nc1 * nc2))
                        ELSE -1 END AS BIGINT) AS did_milli
            FROM w, sp
        """,
        "events_two_way_anova": """
            WITH e AS (SELECT epoch_us(ts)//86400000000 AS dy,
                              (epoch_us(ts)//3600000000) % 24 AS hr
                       FROM events),
            c AS (SELECT dy, hr, CAST(COUNT(*) AS BIGINT) AS c
                  FROM e GROUP BY 1, 2),
            days AS (SELECT DISTINCT dy FROM c),
            hrs AS (SELECT unnest(generate_series(0, 23)) AS hr),
            grid AS (SELECT days.dy, hrs.hr, COALESCE(c.c, 0) AS c,
                            (days.dy + 3) % 7 AS dow
                     FROM days CROSS JOIN hrs
                     LEFT JOIN c ON c.dy = days.dy
                                AND c.hr = hrs.hr),
            tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                           CAST(SUM(c) AS HUGEINT) AS s,
                           SUM(CAST(c AS HUGEINT) * c) AS q
                    FROM grid),
            gg AS (SELECT CAST(COUNT(*) AS HUGEINT) AS g FROM days),
            gm AS (SELECT (1000 * s) // n AS m, n, s, q FROM tot),
            st AS (SELECT 1000000 * q - 2 * m * 1000 * s + n * m * m
                          AS sst
                   FROM gm),
            ra AS (SELECT dow, CAST(COUNT(*) AS HUGEINT) AS nd,
                          CAST(SUM(c) AS HUGEINT) AS sd
                   FROM grid GROUP BY 1),
            sa AS (SELECT SUM(nd * ((1000 * sd) // nd - m)
                              * ((1000 * sd) // nd - m)) AS ssa
                   FROM ra, gm),
            rb AS (SELECT hr, CAST(COUNT(*) AS HUGEINT) AS nh,
                          CAST(SUM(c) AS HUGEINT) AS sh
                   FROM grid GROUP BY 1),
            sb AS (SELECT SUM(nh * ((1000 * sh) // nh - m)
                              * ((1000 * sh) // nh - m)) AS ssb
                   FROM rb, gm),
            rc AS (SELECT dow, hr, CAST(COUNT(*) AS HUGEINT)
                              AS ncell,
                          CAST(SUM(c) AS HUGEINT) AS scell
                   FROM grid GROUP BY 1, 2),
            sc AS (SELECT SUM(ncell * ((1000 * scell) // ncell - m)
                              * ((1000 * scell) // ncell - m))
                          AS ssc
                   FROM rc, gm)
            SELECT CAST(n AS BIGINT) AS n_obs,
                   CAST(g AS BIGINT) AS n_days,
                   CAST(CASE WHEN sst > 0 THEN 10000 * ssa // sst
                        ELSE 0 END AS BIGINT) AS eta_dow_bps,
                   CAST(CASE WHEN sst > 0 THEN 10000 * ssb // sst
                        ELSE 0 END AS BIGINT) AS eta_hour_bps,
                   CAST(CASE WHEN sst <= 0 THEN 0
                        WHEN ssc - ssa - ssb >= 0
                        THEN 10000 * (ssc - ssa - ssb) // sst
                        ELSE -(10000 * (ssa + ssb - ssc) // sst)
                        END AS BIGINT) AS eta_inter_bps,
                   CAST(CASE WHEN sst <= 0 THEN 0
                        WHEN sst - ssc >= 0
                        THEN 10000 * (sst - ssc) // sst
                        ELSE -(10000 * (ssc - sst) // sst)
                        END AS BIGINT) AS eta_resid_bps
            FROM gm, gg, st, sa, sb, sc
        """,
        "lineitem_capability_index": """
            WITH b AS (SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS q
                       FROM lineitem),
            m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(q) AS HUGEINT) AS s,
                         SUM(CAST(q AS HUGEINT) * q) AS qq
                  FROM b),
            v AS (SELECT n, s, n * qq - s * s AS vn FROM m)
            SELECT CAST(n AS BIGINT) AS n_lines,
                   CAST(s AS BIGINT) AS sum_qty,
                   CAST(vn AS BIGINT) AS var_num,
                   CAST(FLOOR(49.0
                              / (6.0 * SQRT(CAST(vn AS DOUBLE)
                                            / (CAST(n AS DOUBLE)
                                               * CAST(n - 1
                                                      AS DOUBLE))))
                              * 1000.0) AS BIGINT) AS cp_milli,
                   CAST(FLOOR((CAST(CASE WHEN 50 * n - s <= s - n
                                    THEN 50 * n - s
                                    ELSE s - n END AS DOUBLE)
                               / CAST(n AS DOUBLE))
                              / (3.0 * SQRT(CAST(vn AS DOUBLE)
                                            / (CAST(n AS DOUBLE)
                                               * CAST(n - 1
                                                      AS DOUBLE))))
                              * 1000.0) AS BIGINT) AS cpk_milli
            FROM v
        """,
        "orders_theil_u2": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE))
                                  AS day_id,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS rev
                       FROM orders GROUP BY 1),
            rng AS (SELECT MIN(day_id) AS mn, MAX(day_id) AS mx
                    FROM d),
            grid AS (SELECT unnest(generate_series(mn, mx)) AS day_id
                     FROM rng),
            g AS (SELECT grid.day_id, COALESCE(rev, 0) AS c
                  FROM grid LEFT JOIN d USING (day_id)),
            p AS (SELECT a.c AS xt, b.c AS x1, c7.c AS x7
                  FROM g a
                  JOIN g b ON b.day_id = a.day_id - 1
                  JOIN g c7 ON c7.day_id = a.day_id - 7),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         SUM(CAST(xt - x1 AS HUGEINT) * (xt - x1))
                             AS s1,
                         SUM(CAST(xt - x7 AS HUGEINT) * (xt - x7))
                             AS s7
                  FROM p)
            SELECT n AS n_forecasts,
                   CAST(CASE WHEN s1 = 0 THEN -1
                        ELSE 10000 * s7 // s1 END AS BIGINT)
                       AS u2sq_bps,
                   CAST(CASE WHEN s1 = 0 THEN -1
                        ELSE FLOOR(SQRT(CAST(s7 AS DOUBLE)
                                        / CAST(s1 AS DOUBLE))
                                   * 1000.0) END AS BIGINT)
                       AS u2_milli
            FROM m
        """,
        "orders_chow_break": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE)) AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) // 100000 AS y
                       FROM orders GROUP BY 1),
            sp AS (SELECT MIN(dy) AS d0,
                          (MIN(dy) + MAX(dy)) // 2 AS mid
                   FROM d),
            b AS (SELECT CAST(dy - d0 AS HUGEINT) AS x,
                         CAST(y AS HUGEINT) AS y,
                         CASE WHEN dy - d0 <= mid - d0 THEN 1
                              ELSE 2 END AS half
                  FROM d, sp),
            mo AS (SELECT 0 AS leg, CAST(COUNT(*) AS HUGEINT) AS n,
                          SUM(x) AS sx, SUM(y) AS sy,
                          SUM(x * x) AS sxx, SUM(y * y) AS syy,
                          SUM(x * y) AS sxy
                   FROM b
                   UNION ALL
                   SELECT half, CAST(COUNT(*) AS HUGEINT),
                          SUM(x), SUM(y), SUM(x * x), SUM(y * y),
                          SUM(x * y)
                   FROM b GROUP BY half),
            cr AS (SELECT leg, n,
                          n * sxx - sx * sx AS bigx,
                          (n * syy - sy * sy)
                          * (n * sxx - sx * sx)
                          - (n * sxy - sx * sy)
                            * (n * sxy - sx * sy) AS r
                   FROM mo),
            w AS (SELECT
                    MAX(CASE WHEN leg = 0 THEN n END) AS np,
                    MAX(CASE WHEN leg = 0 THEN bigx END) AS xp,
                    MAX(CASE WHEN leg = 0 THEN r END) AS rp,
                    MAX(CASE WHEN leg = 1 THEN n END) AS n1,
                    MAX(CASE WHEN leg = 1 THEN bigx END) AS x1,
                    MAX(CASE WHEN leg = 1 THEN r END) AS r1,
                    MAX(CASE WHEN leg = 2 THEN n END) AS n2,
                    MAX(CASE WHEN leg = 2 THEN bigx END) AS x2,
                    MAX(CASE WHEN leg = 2 THEN r END) AS r2
                  FROM cr),
            ss AS (SELECT np, n1, n2,
                          CASE WHEN xp > 0 THEN rp // xp
                               ELSE 0 END AS ssrp,
                          CASE WHEN x1 > 0 THEN r1 // x1
                               ELSE 0 END AS ssr1,
                          CASE WHEN x2 > 0 THEN r2 // x2
                               ELSE 0 END AS ssr2
                   FROM w)
            SELECT CAST(np AS BIGINT) AS n_days,
                   CAST(n1 AS BIGINT) AS n_h1,
                   CAST(n2 AS BIGINT) AS n_h2,
                   CAST(mid AS BIGINT) AS break_dy,
                   CAST(CASE WHEN (ssr1 + ssr2) * 2 > 0
                        THEN (CASE WHEN (ssrp - ssr1 - ssr2)
                                        * (np - 4) >= 0
                              THEN 1 ELSE -1 END)
                             * (1000 * ABS((ssrp - ssr1 - ssr2)
                                           * (np - 4))
                                // ((ssr1 + ssr2) * 2))
                        ELSE -1 END AS BIGINT) AS f_milli
            FROM ss, sp
        """,
        "keyspace_contiguity_audit": """
            SELECT * FROM (
              SELECT 'documents' AS tbl,
                     CAST(COUNT(*) AS BIGINT) AS n_rows,
                     CAST(COUNT(DISTINCT doc_id) AS BIGINT)
                         AS n_distinct,
                     CAST(MIN(doc_id) AS BIGINT) AS min_id,
                     CAST(MAX(doc_id) AS BIGINT) AS max_id,
                     CAST(MAX(doc_id) - MIN(doc_id) + 1
                          - COUNT(DISTINCT doc_id) AS BIGINT)
                         AS n_holes,
                     CAST(COUNT(*) - COUNT(DISTINCT doc_id)
                          AS BIGINT) AS n_dups
              FROM documents
              UNION ALL
              SELECT 'events', CAST(COUNT(*) AS BIGINT),
                     CAST(COUNT(DISTINCT event_id) AS BIGINT),
                     CAST(MIN(event_id) AS BIGINT),
                     CAST(MAX(event_id) AS BIGINT),
                     CAST(MAX(event_id) - MIN(event_id) + 1
                          - COUNT(DISTINCT event_id) AS BIGINT),
                     CAST(COUNT(*) - COUNT(DISTINCT event_id)
                          AS BIGINT)
              FROM events
              UNION ALL
              SELECT 'orders', CAST(COUNT(*) AS BIGINT),
                     CAST(COUNT(DISTINCT o_orderkey) AS BIGINT),
                     CAST(MIN(o_orderkey) AS BIGINT),
                     CAST(MAX(o_orderkey) AS BIGINT),
                     CAST(MAX(o_orderkey) - MIN(o_orderkey) + 1
                          - COUNT(DISTINCT o_orderkey) AS BIGINT),
                     CAST(COUNT(*) - COUNT(DISTINCT o_orderkey)
                          AS BIGINT)
              FROM orders)
            ORDER BY tbl
        """,
        "vocab_oov_transfer": """
            WITH tr AS (SELECT unnest(string_split(text, ' ')) AS tok
                        FROM documents WHERE doc_id % 2 = 0),
            tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS f
                   FROM tr WHERE tok <> '' GROUP BY 1),
            v AS (SELECT tok, f FROM tf
                  QUALIFY ROW_NUMBER() OVER (ORDER BY f DESC, tok)
                          <= 1000),
            te AS (SELECT unnest(string_split(text, ' ')) AS tok
                   FROM documents WHERE doc_id % 2 = 1),
            ef AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS f
                   FROM te WHERE tok <> '' GROUP BY 1),
            st AS (SELECT
                     (SELECT COUNT(*) FROM v) AS vocab_size,
                     (SELECT COALESCE(SUM(f), 0) FROM v) AS n_train,
                     (SELECT COALESCE(SUM(f), 0) FROM ef) AS n_test,
                     (SELECT COALESCE(SUM(ef.f), 0) FROM ef
                      JOIN v USING (tok)) AS covered,
                     (SELECT COUNT(*) FROM ef) AS n_types,
                     (SELECT COUNT(*) FROM ef JOIN v USING (tok))
                         AS types_cov)
            SELECT CAST(vocab_size AS BIGINT) AS vocab_size,
                   CAST(n_train AS BIGINT) AS n_train_tokens,
                   CAST(n_test AS BIGINT) AS n_test_tokens,
                   CAST(covered AS BIGINT) AS covered_tokens,
                   CAST(CASE WHEN n_test > 0 THEN
                        10000 * (n_test - covered) // n_test
                        ELSE 0 END AS BIGINT) AS token_oov_bps,
                   CAST(n_types AS BIGINT) AS n_test_types,
                   CAST(types_cov AS BIGINT) AS covered_types,
                   CAST(CASE WHEN n_types > 0 THEN
                        10000 * (n_types - types_cov) // n_types
                        ELSE 0 END AS BIGINT) AS type_oov_bps
            FROM st
        """,
        "media_frame_coverage": """
            WITH h AS (SELECT 8 + CAST(('0x' || substr(md5(text),
                                                       1, 15))
                                       AS BIGINT) % 24 AS nf
                       FROM documents),
            g AS (SELECT nf, CAST(COUNT(*) AS BIGINT) AS n_docs
                  FROM h GROUP BY 1),
            c AS (SELECT nf, n_docs, (nf + 3) // 4 AS step FROM g),
            f AS (SELECT nf, n_docs,
                         (nf + step - 1) // step AS spd
                  FROM c)
            SELECT CAST(nf AS BIGINT) AS n_frames, n_docs,
                   CAST(spd AS BIGINT) AS sampled_per_doc,
                   CAST(10000 * spd // nf AS BIGINT) AS coverage_bps
            FROM f ORDER BY n_frames
        """,
        "events_cochran_q": """
            WITH c AS (SELECT user_id, event_type,
                              CAST(COUNT(*) AS HUGEINT) AS cc
                       FROM events GROUP BY 1, 2),
            tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS p,
                           SUM(cc) AS te FROM c),
            ut AS (SELECT user_id, event_type FROM c, tot
                   WHERE cc * p > te),
            l AS (SELECT user_id, CAST(COUNT(*) AS HUGEINT) AS li
                  FROM ut GROUP BY 1),
            g AS (SELECT event_type,
                         CAST(COUNT(*) AS HUGEINT) AS gj
                  FROM ut GROUP BY 1),
            st AS (SELECT (SELECT COUNT(*) FROM l) AS nu,
                          (SELECT CAST(COUNT(*) AS HUGEINT)
                           FROM g) AS k,
                          (SELECT SUM(li) FROM l) AS t,
                          (SELECT SUM(li * li) FROM l) AS sl2,
                          (SELECT SUM(gj * gj) FROM g) AS sg2)
            SELECT CAST(nu AS BIGINT) AS n_users,
                   CAST(k AS BIGINT) AS n_types,
                   CAST(t AS BIGINT) AS t_total,
                   CAST(1000 * (k - 1) * (k * sg2 - t * t)
                        // (k * t - sl2) AS BIGINT) AS q_milli,
                   CAST(k - 1 AS BIGINT) AS df
            FROM st
        """,
        "lineitem_hilbert_locality": """
            WITH cells AS (SELECT DISTINCT
                               CAST(l_partkey AS BIGINT) % 256 AS a,
                               CAST(l_suppkey AS BIGINT) % 256 AS b
                           FROM lineitem),
            c0 AS (SELECT a, b, a AS x, b AS y, 0 AS d FROM cells),

            h0 AS (SELECT a, b,
                d + 16384 * xor(3 * ((x // 128) % 2),
                                (y // 128) % 2) AS d,
                CASE WHEN (y // 128) % 2 = 0 THEN
                     CASE WHEN (x // 128) % 2 = 1
                          THEN 255 - y ELSE y END
                     ELSE x END AS x,
                CASE WHEN (y // 128) % 2 = 0 THEN
                     CASE WHEN (x // 128) % 2 = 1
                          THEN 255 - x ELSE x END
                     ELSE y END AS y
                FROM c0),
            h1 AS (SELECT a, b,
                d + 4096 * xor(3 * ((x // 64) % 2),
                                (y // 64) % 2) AS d,
                CASE WHEN (y // 64) % 2 = 0 THEN
                     CASE WHEN (x // 64) % 2 = 1
                          THEN 255 - y ELSE y END
                     ELSE x END AS x,
                CASE WHEN (y // 64) % 2 = 0 THEN
                     CASE WHEN (x // 64) % 2 = 1
                          THEN 255 - x ELSE x END
                     ELSE y END AS y
                FROM h0),
            h2 AS (SELECT a, b,
                d + 1024 * xor(3 * ((x // 32) % 2),
                                (y // 32) % 2) AS d,
                CASE WHEN (y // 32) % 2 = 0 THEN
                     CASE WHEN (x // 32) % 2 = 1
                          THEN 255 - y ELSE y END
                     ELSE x END AS x,
                CASE WHEN (y // 32) % 2 = 0 THEN
                     CASE WHEN (x // 32) % 2 = 1
                          THEN 255 - x ELSE x END
                     ELSE y END AS y
                FROM h1),
            h3 AS (SELECT a, b,
                d + 256 * xor(3 * ((x // 16) % 2),
                                (y // 16) % 2) AS d,
                CASE WHEN (y // 16) % 2 = 0 THEN
                     CASE WHEN (x // 16) % 2 = 1
                          THEN 255 - y ELSE y END
                     ELSE x END AS x,
                CASE WHEN (y // 16) % 2 = 0 THEN
                     CASE WHEN (x // 16) % 2 = 1
                          THEN 255 - x ELSE x END
                     ELSE y END AS y
                FROM h2),
            h4 AS (SELECT a, b,
                d + 64 * xor(3 * ((x // 8) % 2),
                                (y // 8) % 2) AS d,
                CASE WHEN (y // 8) % 2 = 0 THEN
                     CASE WHEN (x // 8) % 2 = 1
                          THEN 255 - y ELSE y END
                     ELSE x END AS x,
                CASE WHEN (y // 8) % 2 = 0 THEN
                     CASE WHEN (x // 8) % 2 = 1
                          THEN 255 - x ELSE x END
                     ELSE y END AS y
                FROM h3),
            h5 AS (SELECT a, b,
                d + 16 * xor(3 * ((x // 4) % 2),
                                (y // 4) % 2) AS d,
                CASE WHEN (y // 4) % 2 = 0 THEN
                     CASE WHEN (x // 4) % 2 = 1
                          THEN 255 - y ELSE y END
                     ELSE x END AS x,
                CASE WHEN (y // 4) % 2 = 0 THEN
                     CASE WHEN (x // 4) % 2 = 1
                          THEN 255 - x ELSE x END
                     ELSE y END AS y
                FROM h4),
            h6 AS (SELECT a, b,
                d + 4 * xor(3 * ((x // 2) % 2),
                                (y // 2) % 2) AS d,
                CASE WHEN (y // 2) % 2 = 0 THEN
                     CASE WHEN (x // 2) % 2 = 1
                          THEN 255 - y ELSE y END
                     ELSE x END AS x,
                CASE WHEN (y // 2) % 2 = 0 THEN
                     CASE WHEN (x // 2) % 2 = 1
                          THEN 255 - x ELSE x END
                     ELSE y END AS y
                FROM h5),
            h7 AS (SELECT a, b,
                d + 1 * xor(3 * ((x // 1) % 2),
                                (y // 1) % 2) AS d,
                CASE WHEN (y // 1) % 2 = 0 THEN
                     CASE WHEN (x // 1) % 2 = 1
                          THEN 255 - y ELSE y END
                     ELSE x END AS x,
                CASE WHEN (y // 1) % 2 = 0 THEN
                     CASE WHEN (x // 1) % 2 = 1
                          THEN 255 - x ELSE x END
                     ELSE y END AS y
                FROM h6),
            idx AS (SELECT a, b, d AS hd, a * 256 + b AS rm,
                           ((a // 1) % 2) * 1 + ((b // 1) % 2) * 2 + ((a // 2) % 2) * 4 + ((b // 2) % 2) * 8 + ((a // 4) % 2) * 16 + ((b // 4) % 2) * 32 + ((a // 8) % 2) * 64 + ((b // 8) % 2) * 128 + ((a // 16) % 2) * 256 + ((b // 16) % 2) * 512 + ((a // 32) % 2) * 1024 + ((b // 32) % 2) * 2048 + ((a // 64) % 2) * 4096 + ((b // 64) % 2) * 8192 + ((a // 128) % 2) * 16384 + ((b // 128) % 2) * 32768 AS zd
                    FROM h7),
            u AS (SELECT 'hilbert' AS layout, a, b, hd AS k FROM idx
                  UNION ALL
                  SELECT 'rowmajor', a, b, rm FROM idx
                  UNION ALL
                  SELECT 'zorder', a, b, zd FROM idx),
            dd AS (SELECT layout,
                          ABS(a - LAG(a) OVER w)
                              + ABS(b - LAG(b) OVER w) AS st
                   FROM u WINDOW w AS (PARTITION BY layout
                                       ORDER BY k))
            SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_cells,
                   CAST(COALESCE(SUM(st), 0) AS BIGINT)
                       AS dilation_total,
                   CAST(1000 * COALESCE(SUM(st), 0)
                        // (COUNT(*) - 1) AS BIGINT)
                       AS dilation_avg_milli
            FROM dd GROUP BY layout ORDER BY layout
        """,
        "orders_weekly_periodogram": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE)) AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS rev
                       FROM orders GROUP BY 1),
            w AS (SELECT MIN(dy) AS dmin,
                         ((MAX(dy) - MIN(dy) + 1) // 7) * 7 AS n
                  FROM d),
            x AS (SELECT dy - dmin AS d0,
                         CAST(rev // 100000 AS HUGEINT) AS xv
                  FROM d, w WHERE dy - dmin < n),
            tot AS (SELECT w.n AS n, w.n // 7 AS wk,
                           (SELECT SUM(xv) FROM x) AS sx,
                           (SELECT COUNT(*) FROM x) AS nobs
                    FROM w),
            ssy AS (SELECT (SELECT SUM((n * xv - sx) * (n * xv - sx))
                            FROM x, tot) +
                           (SELECT (n - nobs) * sx * sx FROM tot)
                               AS ss),
            lat AS (SELECT * FROM (VALUES
                (1, 0, 1000000, 0), (1, 1, 623489, 781831),
                (1, 2, -222521, 974927), (1, 3, -900969, 433883),
                (1, 4, -900969, -433884), (1, 5, -222521, -974928),
                (1, 6, 623489, -781832),
                (2, 0, 1000000, 0), (2, 1, -222521, 974927),
                (2, 2, -900969, -433884), (2, 3, 623489, -781832),
                (2, 4, 623489, 781831), (2, 5, -900969, 433883),
                (2, 6, -222521, -974928),
                (3, 0, 1000000, 0), (3, 1, -900969, 433883),
                (3, 2, 623489, -781832), (3, 3, -222521, 974927),
                (3, 4, -222521, -974928), (3, 5, 623489, 781831),
                (3, 6, -900969, -433884)) AS t(k, j, cl, sl)),
            res AS (SELECT d0 % 7 AS j, SUM(xv) AS xj FROM x
                    GROUP BY 1),
            rj AS (SELECT g.j,
                          tot.n * COALESCE(res.xj, 0)
                              - tot.wk * tot.sx AS r
                   FROM (SELECT DISTINCT j FROM lat) g
                   LEFT JOIN res ON res.j = g.j, tot),
            ck AS (SELECT lat.k,
                          SUM(rj.r * lat.cl) AS c,
                          SUM(rj.r * lat.sl) AS s
                   FROM lat JOIN rj ON rj.j = lat.j GROUP BY 1),
            pk AS (SELECT k, c * c + s * s AS p FROM ck),
            fin AS (SELECT
                (SELECT p FROM pk WHERE k = 1) AS p1,
                (SELECT p FROM pk WHERE k = 2) AS p2,
                (SELECT p FROM pk WHERE k = 3) AS p3,
                (SELECT k FROM pk ORDER BY p DESC, k LIMIT 1)
                    AS peak,
                CAST(1000000000000 AS HUGEINT) * n * ss AS den,
                n, wk
                FROM tot, ssy)
            SELECT CAST(n AS BIGINT) AS n_days,
                   CAST(wk AS BIGINT) AS n_weeks,
                   CAST(10000 * 2 * p1 // den AS BIGINT) AS p1_bps,
                   CAST(10000 * 2 * p2 // den AS BIGINT) AS p2_bps,
                   CAST(10000 * 2 * p3 // den AS BIGINT) AS p3_bps,
                   CAST(10000 * 2 * (p1 + p2 + p3) // den AS BIGINT)
                       AS weekly_share_bps,
                   CAST(peak AS BIGINT) AS peak_k
            FROM fin
        """,
        "lineitem_energy_distance": """
            WITH h AS (SELECT l_returnflag AS f,
                              CAST(FLOOR(l_quantity) AS BIGINT) AS q,
                              CAST(COUNT(*) AS HUGEINT) AS c
                       FROM lineitem GROUP BY 1, 2),
            nn AS (SELECT f, SUM(c) AS n FROM h GROUP BY 1),
            w AS (SELECT a.f AS fa, b.f AS fb,
                         SUM(a.c * b.c * ABS(a.q - b.q)) AS s
                  FROM h a, h b GROUP BY 1, 2),
            pr AS (SELECT x.fa, x.fb, x.s AS a2,
                          (SELECT s FROM w
                           WHERE fa = x.fa AND fb = x.fa) AS b2,
                          (SELECT s FROM w
                           WHERE fa = x.fb AND fb = x.fb) AS c2,
                          na.n AS n1, nb.n AS n2
                   FROM w x
                   JOIN nn na ON na.f = x.fa
                   JOIN nn nb ON nb.f = x.fb
                   WHERE x.fa < x.fb),
            fin AS (SELECT fa, fb, n1, n2, a2,
                           2 * a2 * n1 * n2 - b2 * n2 * n2
                               - c2 * n1 * n1 AS num
                    FROM pr)
            SELECT fa AS flag_a, fb AS flag_b,
                   CAST(n1 AS BIGINT) AS n_a,
                   CAST(n2 AS BIGINT) AS n_b,
                   CAST(1000 * num // (n1 * n1 * n2 * n2) AS BIGINT)
                       AS e_milli,
                   CAST(1000 * n1 * n2 * num
                        // ((n1 + n2) * n1 * n1 * n2 * n2) AS BIGINT)
                       AS t_milli,
                   CAST(10000 * num // (2 * a2 * n1 * n2) AS BIGINT)
                       AS ecoef_bps
            FROM fin ORDER BY flag_a, flag_b
        """,
        "embedding_knn_loo_accuracy": """
            WITH q AS (SELECT vec_id, embedding FROM embeddings
                       WHERE vec_id % 4 = 0),
            top AS (SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                       CAST(FLOOR(list_cosine_similarity(
                           CAST(q.embedding AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) * 10000)
                           AS BIGINT) AS sim_bp
                FROM q, embeddings e WHERE e.vec_id != q.vec_id)
              QUALIFY row_number() OVER (
                  PARTITION BY query_id
                  ORDER BY sim_bp DESC, neighbor_id) <= 1),
            j AS (SELECT ql.label AS qlab, nl.label AS nlab
                  FROM top
                  JOIN embeddings ql ON ql.vec_id = top.query_id
                  JOIN embeddings nl ON nl.vec_id = top.neighbor_id),
            st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nq,
                          COALESCE(SUM(CASE WHEN qlab = nlab THEN 1
                                       ELSE 0 END), 0) AS corr
                   FROM j),
            mj AS (SELECT qlab AS lab, COUNT(*) AS c FROM j
                   GROUP BY 1 ORDER BY c DESC, lab LIMIT 1)
            SELECT nq AS n_queries,
                   CAST(corr AS BIGINT) AS n_correct,
                   CAST(10000 * corr // nq AS BIGINT) AS acc_bps,
                   CAST(mj.lab AS BIGINT) AS majority_label,
                   CAST(10000 * mj.c // nq AS BIGINT)
                       AS majority_baseline_bps
            FROM st, mj
        """,
        "q6_sensitivity_grid": """
            WITH b AS (SELECT CAST(FLOOR(l_discount * 100) AS BIGINT)
                              AS d,
                              CAST(FLOOR(l_quantity) AS BIGINT) AS q,
                              CAST(FLOOR(l_extendedprice * l_discount
                                         * 100) AS BIGINT) AS rev
                       FROM lineitem),
            grid AS (SELECT unnest([4, 4, 4, 5, 5, 5, 6, 6, 6])
                                AS lo,
                            unnest([6, 6, 6, 7, 7, 7, 8, 8, 8])
                                AS hi,
                            unnest([24, 50, 300, 24, 50, 300,
                                    24, 50, 300]) AS cap)
            SELECT CAST(lo AS BIGINT) AS disc_lo_pct,
                   CAST(hi AS BIGINT) AS disc_hi_pct,
                   CAST(cap AS BIGINT) AS qty_cap,
                   CAST(COALESCE(SUM(CASE WHEN d >= lo AND d <= hi
                                          AND q < cap
                                     THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS n_lines,
                   CAST(COALESCE(SUM(CASE WHEN d >= lo AND d <= hi
                                          AND q < cap
                                     THEN rev ELSE 0 END), 0)
                        AS BIGINT) AS revenue_cents
            FROM grid, b GROUP BY lo, hi, cap
            ORDER BY disc_lo_pct, qty_cap
        """,
        "lineitem_zorder_layout": """
            WITH base AS (SELECT l_partkey & 65535 AS a0,
                                 l_suppkey & 65535 AS b0, 0 AS is_max
                          FROM lineitem
                          UNION ALL
                          SELECT MAX(l_partkey & 65535),
                                 MAX(l_suppkey & 65535), 1
                          FROM lineitem),
            s1 AS (SELECT a0, b0, is_max,
                          (a0 | (a0 << 8)) & 16711935 AS a,
                          (b0 | (b0 << 8)) & 16711935 AS b FROM base),
            s2 AS (SELECT a0, b0, is_max,
                          (a | (a << 4)) & 252645135 AS a,
                          (b | (b << 4)) & 252645135 AS b FROM s1),
            s3 AS (SELECT a0, b0, is_max,
                          (a | (a << 2)) & 858993459 AS a,
                          (b | (b << 2)) & 858993459 AS b FROM s2),
            s4 AS (SELECT a0, b0, is_max,
                          (a | (a << 1)) & 1431655765 AS a,
                          (b | (b << 1)) & 1431655765 AS b FROM s3),
            zt AS (SELECT a0, b0, is_max, a | (b << 1) AS z FROM s4),
            dv AS (SELECT MAX(CASE WHEN is_max = 1 THEN z END) // 256 + 1
                          AS zdiv FROM zt)
            SELECT CAST(z // zdiv AS BIGINT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(MIN(a0) AS BIGINT) AS min_part,
                   CAST(MAX(a0) AS BIGINT) AS max_part,
                   CAST(MIN(b0) AS BIGINT) AS min_supp,
                   CAST(MAX(b0) AS BIGINT) AS max_supp
            FROM zt, dv WHERE is_max = 0
            GROUP BY z // zdiv ORDER BY bucket
        """,
        "embedding_norm_outliers": """
            WITH e AS (SELECT vec_id,
                              CAST(FLOOR(CAST(unnest(embedding)
                                       AS DOUBLE)*1000.0) AS BIGINT)
                                  AS iv
                       FROM embeddings),
            n AS (SELECT vec_id, CAST(SUM(iv*iv) AS BIGINT) AS sq
                  FROM e GROUP BY 1),
            hi AS (SELECT 'high' AS side,
                          ROW_NUMBER() OVER (ORDER BY sq DESC, vec_id)
                              AS rk, vec_id, sq
                   FROM n QUALIFY rk <= 10),
            lo AS (SELECT 'low' AS side,
                          ROW_NUMBER() OVER (ORDER BY sq, vec_id)
                              AS rk, vec_id, sq
                   FROM n QUALIFY rk <= 10)
            SELECT side, CAST(rk AS BIGINT) AS rk,
                   CAST(vec_id AS BIGINT) AS vec_id,
                   sq AS sq_norm_fp
            FROM (SELECT * FROM hi UNION ALL SELECT * FROM lo)
            ORDER BY side, rk
        """,
        "order_flag_signature": """
            WITH s AS (SELECT l_orderkey,
                              STRING_AGG(l_returnflag, ''
                                  ORDER BY l_linenumber, l_returnflag)
                                  AS sig
                       FROM lineitem GROUP BY 1)
            SELECT sig, CAST(length(sig) AS BIGINT) AS n_lines,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM s GROUP BY 1 ORDER BY 1
        """,
        "events_ttest": """
            WITH m AS (
              SELECT
                SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS n_a,
                SUM(CASE WHEN event_type = 'click'
                    THEN CAST(FLOOR(value*100) AS BIGINT)
                    ELSE 0 END) AS s_a,
                SUM(CASE WHEN event_type = 'click'
                    THEN CAST(FLOOR(value*100) AS BIGINT)
                         * CAST(FLOOR(value*100) AS BIGINT)
                    ELSE 0 END) AS ss_a,
                SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                    END) AS n_b,
                SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(FLOOR(value*100) AS BIGINT)
                    ELSE 0 END) AS s_b,
                SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(FLOOR(value*100) AS BIGINT)
                         * CAST(FLOOR(value*100) AS BIGINT)
                    ELSE 0 END) AS ss_b
              FROM events),
            f AS (
              SELECT n_a, n_b,
                     (CAST(n_a AS DOUBLE)*CAST(ss_a AS DOUBLE)
                      - CAST(s_a AS DOUBLE)*CAST(s_a AS DOUBLE))
                     / (CAST(n_a AS DOUBLE)*(CAST(n_a AS DOUBLE)-1.0))
                     / CAST(n_a AS DOUBLE) AS sea,
                     (CAST(n_b AS DOUBLE)*CAST(ss_b AS DOUBLE)
                      - CAST(s_b AS DOUBLE)*CAST(s_b AS DOUBLE))
                     / (CAST(n_b AS DOUBLE)*(CAST(n_b AS DOUBLE)-1.0))
                     / CAST(n_b AS DOUBLE) AS seb,
                     CAST(s_a AS DOUBLE)/CAST(n_a AS DOUBLE)
                     - CAST(s_b AS DOUBLE)/CAST(n_b AS DOUBLE) AS md
              FROM m)
            SELECT CAST(n_a AS BIGINT) AS n_a,
                   CAST(n_b AS BIGINT) AS n_b,
                   CAST(FLOOR(md / sqrt(sea + seb) * 1000.0)
                        AS BIGINT) AS t_milli,
                   CAST(FLOOR((sea + seb) * (sea + seb)
                        / (sea * sea / (CAST(n_a AS DOUBLE) - 1.0)
                           + seb * seb / (CAST(n_b AS DOUBLE) - 1.0))
                        * 1000.0) AS BIGINT) AS df_milli
            FROM f
        """,
        "events_trend_forecast": """
            WITH d AS (SELECT epoch_us(ts)//86400000000 AS day
                       FROM events),
            r AS (SELECT day, COUNT(*) AS n FROM d GROUP BY 1),
            rng AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM r),
            grid AS (SELECT unnest(generate_series(mn, mx)) AS day
                     FROM rng),
            gx AS (SELECT grid.day, COALESCE(n, 0) AS y
                   FROM grid LEFT JOIN r USING (day)),
            g AS (SELECT gx.day - rng.mn AS x, y, rng.mn AS lo
                  FROM gx, rng),
            m AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                         SUM(x*y) AS sxy, SUM(x*x) AS sxx,
                         MIN(lo) AS lo
                  FROM g),
            c AS (SELECT n, lo,
                         n*sxy - sx*sy AS num,
                         n*sxx - sx*sx AS den,
                         sy*(n*sxx - sx*sx)
                         - (n*sxy - sx*sy)*sx AS inum
                  FROM m)
            SELECT CAST(num * 1000000 // den AS BIGINT)
                       AS slope_micro,
                   CAST(inum * 1000000 // (n * den) AS BIGINT)
                       AS icept_micro,
                   CAST(lo + n - 1 + h.h AS BIGINT) AS day_id,
                   CAST((inum + num * (n - 1 + h.h) * n) // (n * den)
                        AS BIGINT) AS forecast
            FROM c, (SELECT unnest(generate_series(1, 7)) AS h) h
            ORDER BY day_id
        """,
        "session_bounce_rate": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
            lagd AS (SELECT user_id, t,
                            lag(t) OVER (PARTITION BY user_id
                                         ORDER BY t) AS pt FROM e),
            brk AS (SELECT user_id, t,
                           CASE WHEN pt IS NULL OR t - pt > 1800000000
                                THEN 1 ELSE 0 END AS news FROM lagd),
            sess AS (SELECT user_id, t,
                            SUM(news) OVER (PARTITION BY user_id
                                ORDER BY t ROWS UNBOUNDED PRECEDING)
                                AS sid FROM brk),
            per AS (SELECT user_id, sid, COUNT(*) AS n
                    FROM sess GROUP BY 1, 2)
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_sessions,
                   CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_bounce,
                   CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                        * 10000 // COUNT(*) AS BIGINT) AS bounce_bps
            FROM per GROUP BY 1 ORDER BY 1
        """,
        "source_mixture_weights": r"""
            WITH t AS (
              SELECT source,
                     CAST(len(regexp_extract_all(text, '\S+'))
                          AS BIGINT) AS nt
              FROM documents),
            g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                         CAST(SUM(nt) AS BIGINT) AS n_tokens
                  FROM t GROUP BY 1),
            tot AS (SELECT SUM(n_tokens) AS total,
                           COUNT(*) AS k FROM g)
            SELECT source, n_docs, n_tokens,
                   CAST(n_tokens * 10000 // total AS BIGINT)
                       AS share_bps,
                   CAST(total * 10000 // (k * n_tokens) AS BIGINT)
                       AS weight_bps
            FROM g, tot ORDER BY source
        """,
        "part_clustering_coeff": """
            WITH L AS (
              SELECT l_partkey,
                     lead(l_partkey) OVER (PARTITION BY l_orderkey
                                           ORDER BY l_linenumber,
                                                    l_partkey) AS nxt
              FROM lineitem),
            e0 AS (SELECT DISTINCT least(l_partkey, nxt) AS a,
                          greatest(l_partkey, nxt) AS b
                   FROM L WHERE nxt IS NOT NULL AND l_partkey <> nxt),
            adj AS (SELECT a AS u, b AS v FROM e0
                    UNION ALL SELECT b, a FROM e0),
            deg AS (SELECT u, COUNT(*) AS d FROM adj GROUP BY 1),
            closed AS (
              SELECT a1.u AS u, COUNT(*) AS n_closed
              FROM adj a1 JOIN adj a2
                   ON a1.u = a2.u AND a1.v < a2.v
              JOIN e0 ON e0.a = a1.v AND e0.b = a2.v
              GROUP BY 1)
            SELECT CAST(deg.u AS BIGINT) AS p_partkey,
                   CAST(deg.d AS BIGINT) AS deg,
                   CAST(COALESCE(n_closed, 0) AS BIGINT) AS n_closed,
                   CAST(COALESCE(n_closed, 0) * 10000
                        // (deg.d * (deg.d - 1) // 2) AS BIGINT)
                       AS cc_bps
            FROM deg LEFT JOIN closed ON closed.u = deg.u
            WHERE deg.d >= 2 ORDER BY 1
        """,
        "part_assortativity": """
            WITH L AS (
              SELECT l_partkey,
                     lead(l_partkey) OVER (PARTITION BY l_orderkey
                                           ORDER BY l_linenumber,
                                                    l_partkey) AS nxt
              FROM lineitem),
            e0 AS (SELECT DISTINCT least(l_partkey, nxt) AS a,
                          greatest(l_partkey, nxt) AS b
                   FROM L WHERE nxt IS NOT NULL AND l_partkey <> nxt),
            adj AS (SELECT a AS u, b AS v FROM e0
                    UNION ALL SELECT b, a FROM e0),
            deg AS (SELECT u, COUNT(*) AS d FROM adj GROUP BY 1),
            xy AS (SELECT d1.d AS x, d2.d AS y
                   FROM adj JOIN deg d1 ON d1.u = adj.u
                            JOIN deg d2 ON d2.u = adj.v),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
                         CAST(SUM(x) AS BIGINT) AS sx,
                         CAST(SUM(y) AS BIGINT) AS sy,
                         CAST(SUM(x*y) AS BIGINT) AS sxy,
                         CAST(SUM(x*x) AS BIGINT) AS sxx,
                         CAST(SUM(y*y) AS BIGINT) AS syy
                  FROM xy)
            SELECT CAST((SELECT COUNT(*) FROM e0) AS BIGINT)
                       AS n_edges,
                   m AS m_oriented,
                   CAST(FLOOR(
                     (CAST(m AS DOUBLE)*CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                     / (sqrt(CAST(m AS DOUBLE)*CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                        * sqrt(CAST(m AS DOUBLE)*CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))
                     * 1000.0) AS BIGINT) AS r_milli
            FROM m
        """,
        "purchase_delta": """
            WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS t,
                              CAST(FLOOR(value*100) AS BIGINT) AS cents
                       FROM events WHERE event_type = 'purchase'),
            l AS (SELECT user_id, event_id,
                         cents - lag(cents) OVER (
                             PARTITION BY user_id
                             ORDER BY t, event_id) AS delta
                  FROM p)
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(event_id AS BIGINT) AS event_id,
                   CAST(delta AS BIGINT) AS delta_cents
            FROM l WHERE delta IS NOT NULL ORDER BY 1, 2
        """,
        "region_nation_rollup": """
            WITH j AS (
              SELECT r.r_name AS region, n.n_name AS nation,
                     CAST(FLOOR(o.o_totalprice*100) AS BIGINT) AS cents
              FROM orders o
              JOIN customer c ON c.c_custkey = o.o_custkey
              JOIN nation n ON n.n_nationkey = c.c_nationkey
              JOIN region r ON r.r_regionkey = n.n_regionkey)
            SELECT COALESCE(region, 'ALL') AS region,
                   COALESCE(nation, 'ALL') AS nation,
                   CAST(SUM(cents) AS BIGINT) AS revenue_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM j GROUP BY ROLLUP (region, nation)
            ORDER BY 1, 2
        """,
        "part_link_prediction": """
            WITH L AS (
              SELECT l_partkey,
                     lead(l_partkey) OVER (PARTITION BY l_orderkey
                                           ORDER BY l_linenumber,
                                                    l_partkey) AS nxt
              FROM lineitem),
            e0 AS (SELECT DISTINCT least(l_partkey, nxt) AS a,
                          greatest(l_partkey, nxt) AS b
                   FROM L WHERE nxt IS NOT NULL AND l_partkey <> nxt),
            adj AS (SELECT a AS u, b AS v FROM e0
                    UNION ALL SELECT b, a FROM e0),
            w AS (SELECT a1.v AS p1, a2.v AS p2, COUNT(*) AS cn
                  FROM adj a1 JOIN adj a2
                       ON a1.u = a2.u AND a1.v < a2.v
                  GROUP BY 1, 2),
            ne AS (SELECT w.* FROM w LEFT JOIN e0
                       ON e0.a = w.p1 AND e0.b = w.p2
                   WHERE e0.a IS NULL)
            SELECT CAST(p1 AS BIGINT) AS p1, CAST(p2 AS BIGINT) AS p2,
                   CAST(cn AS BIGINT) AS cn
            FROM ne ORDER BY cn DESC, p1, p2 LIMIT 100
        """,
        "key_skew_report": """
            WITH g AS (SELECT user_id, COUNT(*) AS n
                       FROM events GROUP BY user_id),
            t AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC) AS rk
                  FROM g)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(SUM(n) AS BIGINT) AS n_rows,
                   CAST(MIN(n) AS BIGINT) AS min_cnt,
                   CAST(MAX(n) AS BIGINT) AS max_cnt,
                   CAST(SUM(n)*1000 // COUNT(*) AS BIGINT) AS mean_milli,
                   CAST(quantile_disc(n, 0.5) AS BIGINT) AS p50_cnt,
                   CAST(quantile_disc(n, 0.9) AS BIGINT) AS p90_cnt,
                   CAST(quantile_disc(n, 0.99) AS BIGINT) AS p99_cnt,
                   CAST(MAX(n)*10000 // SUM(n) AS BIGINT)
                       AS top1_share_bps,
                   CAST((SELECT SUM(n) FROM t WHERE rk <= 10)*10000
                        // SUM(n) AS BIGINT) AS top10_share_bps
            FROM g
        """,
        "media_frames": f"""
            WITH m AS (
              SELECT doc_id, strlen(text) AS n_bytes,
                     8 + {md5h} % 24 AS n_frames
              FROM documents
            ), s AS (
              SELECT doc_id, n_bytes, n_frames,
                     CAST((n_frames + 3) // 4 AS BIGINT) AS step
              FROM m
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(u.frame_idx AS BIGINT) AS frame_idx,
                   CAST(u.frame_idx * (n_bytes // n_frames) AS BIGINT)
                       AS frame_off
            FROM s, UNNEST(range(0, CAST(n_frames AS BIGINT), step))
                 AS u(frame_idx)
        """,
        "orders_pettitt_test": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE)) AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS rev
                       FROM orders GROUP BY 1),
            r AS (SELECT dy,
                         2 * (RANK() OVER (ORDER BY rev))
                             + (COUNT(*) OVER (PARTITION BY rev)) - 1
                             AS r2
                  FROM d),
            u AS (SELECT ROW_NUMBER() OVER (ORDER BY dy) AS t, dy,
                         SUM(r2) OVER (ORDER BY dy
                                       ROWS UNBOUNDED PRECEDING) AS cum
                  FROM r),
            nn AS (SELECT COUNT(*) AS n FROM d),
            uv AS (SELECT u.t, u.dy,
                          ABS(u.cum - u.t * (nn.n + 1)) AS au, nn.n
                   FROM u, nn WHERE u.t < nn.n),
            k AS (SELECT n, au, t, dy FROM uv
                  ORDER BY au DESC, t ASC LIMIT 1)
            SELECT CAST(n AS BIGINT) AS n_days,
                   CAST(au AS BIGINT) AS k_stat,
                   CAST(t AS BIGINT) AS t_hat,
                   CAST(dy AS BIGINT) AS dy_hat,
                   CAST(FLOOR(2.0 * EXP(-(CAST(6 * au * au AS DOUBLE)
                                / CAST(n * n * n + n * n AS DOUBLE)))
                              * 1000000.0) AS BIGINT) AS p_micro
            FROM k
        """,
        "events_bowker_symmetry": """
            WITH s AS (SELECT event_type AS t,
                              LAG(event_type) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS f
                       FROM events),
            c AS (SELECT f, t, COUNT(*) AS n FROM s
                  WHERE f IS NOT NULL AND f <> t GROUP BY f, t),
            p AS (SELECT LEAST(f, t) AS i, GREATEST(f, t) AS j,
                         SUM(CASE WHEN f < t THEN n ELSE 0 END) AS nij,
                         SUM(CASE WHEN f > t THEN n ELSE 0 END) AS nji
                  FROM c GROUP BY 1, 2)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(nij + nji) AS BIGINT) AS n_offdiag,
                   CAST(SUM(1000 * (nij - nji) * (nij - nji)
                            // (nij + nji)) AS BIGINT) AS chi2_milli
            FROM p
        """,
        "part_graph_modularity": """
            WITH s AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
                              l_partkey AS pk
                       FROM lineitem),
            o AS (SELECT ok, pk,
                         LAG(pk) OVER (PARTITION BY ok
                                       ORDER BY ln, pk) AS prev
                  FROM s),
            ed AS (SELECT DISTINCT LEAST(pk, prev) AS a,
                          GREATEST(pk, prev) AS b
                   FROM o WHERE prev IS NOT NULL AND pk <> prev),
            mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM ed),
            deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
                    FROM (SELECT a AS node FROM ed
                          UNION ALL SELECT b FROM ed)
                    GROUP BY 1),
            nb AS (SELECT p_partkey AS node, p_brand AS brand
                   FROM part),
            nd AS (SELECT deg.node, deg.d, nb.brand
                   FROM deg JOIN nb ON deg.node = nb.node),
            li AS (SELECT b1.brand, CAST(COUNT(*) AS BIGINT) AS l_in
                   FROM ed JOIN nb b1 ON ed.a = b1.node
                           JOIN nb b2 ON ed.b = b2.node
                   WHERE b1.brand = b2.brand GROUP BY 1),
            g AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_nodes,
                         CAST(SUM(d) AS BIGINT) AS d_sum
                  FROM nd GROUP BY 1)
            SELECT g.brand,
                   g.n_nodes,
                   CAST(COALESCE(li.l_in, 0) AS BIGINT) AS l_in,
                   g.d_sum,
                   CAST(4 * mm.m * COALESCE(li.l_in, 0)
                        - g.d_sum * g.d_sum AS BIGINT) AS contrib,
                   CAST(mm.m AS BIGINT) AS m_edges
            FROM g LEFT JOIN li ON g.brand = li.brand, mm
            ORDER BY g.brand
        """,
        "events_permutation_entropy": """
            WITH d AS (SELECT epoch_us(ts) // 86400000000 AS dy,
                              COUNT(*) AS c
                       FROM events GROUP BY 1),
            w AS (SELECT c AS x1,
                         LEAD(c, 1) OVER (ORDER BY dy) AS x2,
                         LEAD(c, 2) OVER (ORDER BY dy) AS x3
                  FROM d),
            t AS (SELECT ((CASE WHEN x2 < x1 THEN 1 ELSE 0 END)
                          + (CASE WHEN x3 < x1 THEN 1 ELSE 0 END)) * 9
                       + ((CASE WHEN x1 <= x2 THEN 1 ELSE 0 END)
                          + (CASE WHEN x3 < x2 THEN 1 ELSE 0 END)) * 3
                       + (CASE WHEN x1 <= x3 THEN 1 ELSE 0 END)
                       + (CASE WHEN x2 <= x3 THEN 1 ELSE 0 END) AS pat
                  FROM w WHERE x3 IS NOT NULL),
            c AS (SELECT pat, CAST(COUNT(*) AS BIGINT) AS n
                  FROM t GROUP BY 1),
            grid AS (SELECT unnest([5, 7, 11, 15, 19, 21]) AS pat),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM t)
            SELECT CAST(grid.pat AS BIGINT) AS pat_code,
                   CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
                   CAST(10000 * COALESCE(c.n, 0) // tot.t AS BIGINT)
                       AS share_bps
            FROM grid LEFT JOIN c ON c.pat = grid.pat, tot
            ORDER BY pat_code
        """,
        "orders_newey_west": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE)) AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS cents
                       FROM orders GROUP BY 1),
            rng AS (SELECT MIN(dy) AS mn, MAX(dy) AS mx FROM d),
            grid AS (SELECT u.dy FROM rng,
                     UNNEST(generate_series(mn, mx)) AS u(dy)),
            v AS (SELECT grid.dy,
                         COALESCE(d.cents, 0) // 100000000 AS x
                  FROM grid LEFT JOIN d ON d.dy = grid.dy),
            st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(x) AS BIGINT) AS s FROM v),
            y AS (SELECT dy,
                         CAST(st.n * x - st.s AS HUGEINT) AS yv
                  FROM v, st),
            w AS (SELECT yv,
                         LEAD(yv, 1) OVER (ORDER BY dy) AS y1,
                         LEAD(yv, 2) OVER (ORDER BY dy) AS y2,
                         LEAD(yv, 3) OVER (ORDER BY dy) AS y3,
                         LEAD(yv, 4) OVER (ORDER BY dy) AS y4,
                         LEAD(yv, 5) OVER (ORDER BY dy) AS y5,
                         LEAD(yv, 6) OVER (ORDER BY dy) AS y6,
                         LEAD(yv, 7) OVER (ORDER BY dy) AS y7
                  FROM y),
            gam AS (SELECT SUM(yv * yv) AS g0, SUM(yv * y1) AS g1,
                           SUM(yv * y2) AS g2, SUM(yv * y3) AS g3,
                           SUM(yv * y4) AS g4, SUM(yv * y5) AS g5,
                           SUM(yv * y6) AS g6, SUM(yv * y7) AS g7
                    FROM w),
            f AS (SELECT st.n, g0, g1, g2, g3, g4, g5, g6, g7,
                         8 * g0 + 2 * (7 * g1 + 6 * g2 + 5 * g3
                                       + 4 * g4 + 3 * g5 + 2 * g6
                                       + g7) AS lrv,
                         8 * g0 AS den
                  FROM gam, st)
            SELECT CAST(n AS BIGINT) AS n_days,
                   CAST(g0 AS BIGINT) AS g0, CAST(g1 AS BIGINT) AS g1,
                   CAST(g2 AS BIGINT) AS g2, CAST(g3 AS BIGINT) AS g3,
                   CAST(g4 AS BIGINT) AS g4, CAST(g5 AS BIGINT) AS g5,
                   CAST(g6 AS BIGINT) AS g6, CAST(g7 AS BIGINT) AS g7,
                   CAST(lrv AS BIGINT) AS lrv_num,
                   CAST((CASE WHEN lrv > 0 THEN 1 WHEN lrv < 0 THEN -1
                         ELSE 0 END) * ((1000 * ABS(lrv)) // den)
                        AS BIGINT) AS ratio_milli,
                   CAST(CASE WHEN lrv > 0 THEN
                        (1000 * CAST(n AS HUGEINT) * den) // lrv
                        ELSE -1 END AS BIGINT) AS ess_milli
            FROM f
        """,
        "lineitem_discount_rdd": """
            WITH d AS (SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS x,
                              CAST(FLOOR(l_extendedprice * 100)
                                   AS BIGINT) // 100 AS y
                       FROM lineitem
                       WHERE FLOOR(l_quantity) BETWEEN 15 AND 34),
            g AS (SELECT (x >= 25) AS side,
                         CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(x) AS HUGEINT) AS sx,
                         CAST(SUM(y) AS HUGEINT) AS sy,
                         CAST(SUM(x * x) AS HUGEINT) AS sxx,
                         CAST(SUM(x * y) AS HUGEINT) AS sxy
                  FROM d GROUP BY 1),
            s AS (SELECT side, n,
                         n * sxx - sx * sx AS den,
                         n * sxy - sx * sy AS nums,
                         sy * sxx - sx * sxy
                             + 25 * (n * sxy - sx * sy) AS numv
                  FROM g),
            l AS (SELECT * FROM s WHERE NOT side),
            r AS (SELECT * FROM s WHERE side)
            SELECT CAST(l.n AS BIGINT) AS n_left,
                   CAST(r.n AS BIGINT) AS n_right,
                   CAST((CASE WHEN l.nums > 0 THEN 1
                         WHEN l.nums < 0 THEN -1 ELSE 0 END)
                        * ((1000 * ABS(l.nums)) // l.den) AS BIGINT)
                       AS slope_l_milli,
                   CAST((CASE WHEN r.nums > 0 THEN 1
                         WHEN r.nums < 0 THEN -1 ELSE 0 END)
                        * ((1000 * ABS(r.nums)) // r.den) AS BIGINT)
                       AS slope_r_milli,
                   CAST((CASE WHEN l.numv > 0 THEN 1
                         WHEN l.numv < 0 THEN -1 ELSE 0 END)
                        * ((1000 * ABS(l.numv)) // l.den) AS BIGINT)
                       AS v_l_milli,
                   CAST((CASE WHEN r.numv > 0 THEN 1
                         WHEN r.numv < 0 THEN -1 ELSE 0 END)
                        * ((1000 * ABS(r.numv)) // r.den) AS BIGINT)
                       AS v_r_milli,
                   CAST((CASE WHEN r.numv * l.den - l.numv * r.den > 0
                         THEN 1
                         WHEN r.numv * l.den - l.numv * r.den < 0
                         THEN -1 ELSE 0 END)
                        * ((1000 * ABS(r.numv * l.den - l.numv * r.den))
                           // (r.den * l.den)) AS BIGINT) AS jump_milli
            FROM l, r
        """,
        "events_allan_variance": """
            WITH d AS (SELECT epoch_us(ts) // 86400000000 AS dy,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM events GROUP BY 1),
            rng AS (SELECT MIN(dy) AS mn, MAX(dy) AS mx FROM d),
            grid AS (SELECT u.dy FROM rng,
                     UNNEST(generate_series(mn, mx)) AS u(dy)),
            v AS (SELECT grid.dy - rng.mn AS i, COALESCE(d.c, 0) AS c
                  FROM grid LEFT JOIN d ON d.dy = grid.dy, rng),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
            taus AS (SELECT unnest([1, 2, 4, 8]) AS tau),
            w AS (SELECT taus.tau, v.i // taus.tau AS wi,
                         SUM(v.c) AS wsum
                  FROM v, taus, nn
                  WHERE v.i // taus.tau < nn.n // taus.tau
                  GROUP BY 1, 2),
            dd AS (SELECT tau,
                          wsum - LAG(wsum) OVER (PARTITION BY tau
                                                 ORDER BY wi) AS dw
                   FROM w),
            agg AS (SELECT tau,
                           CAST(SUM(CAST(dw AS HUGEINT) * dw)
                                AS BIGINT) AS num
                    FROM dd WHERE dw IS NOT NULL GROUP BY 1)
            SELECT CAST(taus.tau AS BIGINT) AS tau,
                   CAST(nn.n // taus.tau AS BIGINT) AS m_windows,
                   CAST(CASE WHEN nn.n // taus.tau >= 2
                        THEN agg.num ELSE 0 END AS BIGINT)
                       AS sum_sq_diff,
                   CAST(CASE WHEN nn.n // taus.tau >= 2 THEN
                        1000 * agg.num
                        // (2 * (nn.n // taus.tau - 1)
                            * taus.tau * taus.tau)
                        ELSE -1 END AS BIGINT) AS avar_milli
            FROM taus LEFT JOIN agg ON agg.tau = taus.tau, nn
            ORDER BY tau
        """,
        "lineitem_zonemap_pruning": """
            WITH s AS (SELECT l_orderkey // 2048 AS seg,
                              datediff('day', DATE '1970-01-01',
                                       CAST(l_shipdate AS DATE)) AS d
                       FROM lineitem),
            rng AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM s),
            pr AS (SELECT unnest(['p25_week', 'p50_month', 'p75_tail'])
                              AS pred,
                          unnest([mn + (mx - mn) // 4,
                                  mn + (mx - mn) // 2,
                                  mn + (3 * (mx - mn)) // 4]) AS plo,
                          unnest([mn + (mx - mn) // 4 + 6,
                                  mn + (mx - mn) // 2 + 29,
                                  mx]) AS phi
                   FROM rng),
            g AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
                         MIN(d) AS smn, MAX(d) AS smx
                  FROM s GROUP BY 1),
            cls AS (SELECT pr.pred, pr.plo, pr.phi, g.n,
                           CASE WHEN g.smx < pr.plo OR g.smn > pr.phi
                                THEN 1 ELSE 0 END AS pruned,
                           CASE WHEN g.smx >= pr.plo
                                AND g.smn <= pr.phi
                                AND g.smn >= pr.plo
                                AND g.smx <= pr.phi
                                THEN 1 ELSE 0 END AS fl
                    FROM g, pr),
            m AS (SELECT pr.pred,
                         CAST(COUNT(*) FILTER (s.d >= pr.plo
                                               AND s.d <= pr.phi)
                              AS BIGINT) AS matched
                  FROM s, pr GROUP BY 1),
            a AS (SELECT pred, plo, phi,
                         CAST(COUNT(*) AS BIGINT) AS n_segments,
                         CAST(SUM(pruned) AS BIGINT) AS n_pruned,
                         CAST(SUM(fl) AS BIGINT) AS n_full,
                         CAST(COUNT(*) - SUM(pruned) - SUM(fl)
                              AS BIGINT) AS n_straddle,
                         CAST(SUM(CASE WHEN pruned = 0 THEN n
                                  ELSE 0 END) AS BIGINT)
                             AS rows_scanned
                  FROM cls GROUP BY 1, 2, 3)
            SELECT a.pred, CAST(a.plo AS BIGINT) AS plo,
                   CAST(a.phi AS BIGINT) AS phi,
                   a.n_segments, a.n_pruned, a.n_full, a.n_straddle,
                   a.rows_scanned, m.matched AS rows_match,
                   CAST(CASE WHEN m.matched > 0 THEN
                        1000 * a.rows_scanned // m.matched
                        ELSE -1 END AS BIGINT) AS scan_amp_milli
            FROM a JOIN m ON a.pred = m.pred ORDER BY a.pred
        """,
        "events_sax_motifs": """
            WITH d AS (SELECT epoch_us(ts) // 86400000000 AS dy,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM events GROUP BY 1),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
            r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rk
                  FROM d),
            b AS (SELECT MAX(CASE WHEN rk <= (n + 2) // 3
                              THEN c END) AS b1,
                         MAX(CASE WHEN rk <= (2 * n + 2) // 3
                              THEN c END) AS b2
                  FROM r, nn),
            s AS (SELECT dy, CASE WHEN c <= b1 THEN 'a'
                                  WHEN c <= b2 THEN 'b'
                                  ELSE 'c' END AS sym
                  FROM d, b),
            w AS (SELECT sym
                         || LEAD(sym, 1) OVER (ORDER BY dy)
                         || LEAD(sym, 2) OVER (ORDER BY dy) AS word
                  FROM s),
            c2 AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n
                   FROM w WHERE word IS NOT NULL GROUP BY 1),
            tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM c2)
            SELECT word, n,
                   CAST(10000 * n // t AS BIGINT) AS share_bps
            FROM c2, tot ORDER BY n DESC, word LIMIT 10
        """,
        "docs_menzerath": """
            WITH t AS (SELECT doc_id,
                              unnest(regexp_split_to_array(text,
                                                           '\\s+'))
                                  AS tok
                       FROM documents),
            f AS (SELECT doc_id, length(tok) AS l
                  FROM t WHERE tok != ''),
            d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ntok,
                         CAST(SUM(l) AS BIGINT) AS chars
                  FROM f GROUP BY 1),
            b AS (SELECT CAST(length(printf('%b', ntok)) AS BIGINT)
                             AS band,
                         ntok, chars
                  FROM d WHERE ntok > 0)
            SELECT band, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(ntok) AS BIGINT) AS n_tokens,
                   CAST(SUM(chars) AS BIGINT) AS sum_chars,
                   CAST(1000 * SUM(chars) // SUM(ntok) AS BIGINT)
                       AS mean_tok_len_milli
            FROM b GROUP BY 1 ORDER BY 1
        """,
        "docs_rouge_pairs": """
            WITH el AS (SELECT doc_id, text FROM documents
                        WHERE doc_id % 5 = 0),
            ordp AS (SELECT doc_id, text,
                            LEAD(doc_id) OVER (ORDER BY doc_id)
                                AS nxt,
                            LEAD(text) OVER (ORDER BY doc_id)
                                AS ntext
                     FROM el),
            pr AS (SELECT doc_id AS pid, text AS t1, ntext AS t2
                   FROM ordp WHERE nxt IS NOT NULL),
            tk1 AS (SELECT pid,
                           unnest(regexp_split_to_array(t1, '\\s+'))
                               AS tok
                    FROM pr),
            tk2 AS (SELECT pid,
                           unnest(regexp_split_to_array(t2, '\\s+'))
                               AS tok
                    FROM pr),
            c1 AS (SELECT pid, tok, CAST(COUNT(*) AS BIGINT) AS c
                   FROM tk1 WHERE tok != '' GROUP BY 1, 2),
            c2 AS (SELECT pid, tok, CAST(COUNT(*) AS BIGINT) AS c
                   FROM tk2 WHERE tok != '' GROUP BY 1, 2),
            ov AS (SELECT c1.pid,
                          CAST(SUM(LEAST(c1.c, c2.c)) AS BIGINT)
                              AS ov
                   FROM c1 JOIN c2 ON c1.pid = c2.pid
                                  AND c1.tok = c2.tok
                   GROUP BY 1),
            ln AS (SELECT pr.pid,
                          COALESCE(l1.s, 0) + COALESCE(l2.s, 0)
                              AS tot,
                          COALESCE(ov.ov, 0) AS ov
                   FROM pr
                   LEFT JOIN (SELECT pid, SUM(c) AS s FROM c1
                              GROUP BY 1) l1 ON l1.pid = pr.pid
                   LEFT JOIN (SELECT pid, SUM(c) AS s FROM c2
                              GROUP BY 1) l2 ON l2.pid = pr.pid
                   LEFT JOIN ov ON ov.pid = pr.pid),
            f AS (SELECT pid, ov,
                         CASE WHEN tot > 0 THEN 2000 * ov // tot
                              ELSE -1 END AS fm
                  FROM ln)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(ov) AS BIGINT) AS sum_overlap,
                   CAST(SUM(fm) // COUNT(*) AS BIGINT)
                       AS mean_f_milli,
                   CAST(MAX(fm) AS BIGINT) AS max_f_milli,
                   CAST(COUNT(*) FILTER (fm >= 500) AS BIGINT)
                       AS hi500
            FROM f
        """,
        "lineitem_bucket_semijoin_audit": """
            WITH pr AS (SELECT l_partkey AS pk,
                               CAST(COUNT(*) AS BIGINT) AS n,
                               SUM(CAST(FLOOR(l_extendedprice
                                        * (1 - l_discount) * 100)
                                        AS BIGINT)) AS rev
                        FROM lineitem GROUP BY 1),
            hot AS (SELECT pk FROM pr
                    ORDER BY rev DESC, pk LIMIT 100),
            mt AS (SELECT CAST(SUM(n) AS BIGINT) AS matched
                   FROM pr JOIN hot ON pr.pk = hot.pk),
            tt AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM pr),
            grains AS (SELECT unnest([64, 256, 1024]) AS g),
            hb AS (SELECT DISTINCT grains.g, hot.pk % grains.g AS b
                   FROM hot, grains),
            nh AS (SELECT g, CAST(COUNT(*) AS BIGINT)
                              AS n_hot_buckets
                   FROM hb GROUP BY 1),
            sc AS (SELECT hb.g, CAST(SUM(pr.n) AS BIGINT)
                              AS rows_scanned
                   FROM pr JOIN hb ON pr.pk % hb.g = hb.b
                   GROUP BY 1)
            SELECT CAST(nh.g AS BIGINT) AS grain,
                   nh.n_hot_buckets,
                   sc.rows_scanned,
                   mt.matched AS rows_match,
                   CAST(1000 * sc.rows_scanned // mt.matched
                        AS BIGINT) AS amp_milli,
                   tt.total AS total_rows
            FROM nh JOIN sc ON nh.g = sc.g, mt, tt
            ORDER BY grain
        """,
        "events_recurrence_quantification": """
            WITH d AS (SELECT epoch_us(ts) // 86400000000 AS dy,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM events GROUP BY 1),
            rng AS (SELECT MIN(dy) AS mn, MAX(dy) AS mx FROM d),
            grid AS (SELECT u.dy FROM rng,
                     UNNEST(generate_series(mn, mx)) AS u(dy)),
            v AS (SELECT grid.dy AS i, COALESCE(d.c, 0) AS c
                  FROM grid LEFT JOIN d ON d.dy = grid.dy),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
            ee AS (SELECT (MAX(c) - MIN(c)) // 20 AS eps FROM v),
            vv AS (SELECT i, c, LEAD(c) OVER (ORDER BY i) AS c1
                   FROM v),
            p AS (SELECT CASE WHEN ABS(a.c - b.c) <= ee.eps
                              THEN 1 ELSE 0 END AS r,
                         CASE WHEN b.c1 IS NOT NULL
                              AND ABS(a.c1 - b.c1) <= ee.eps
                              THEN 1 ELSE 0 END AS r2
                  FROM vv a JOIN vv b ON b.i > a.i, ee)
            SELECT CAST(nn.n AS BIGINT) AS n_days,
                   CAST(ee.eps AS BIGINT) AS eps,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(r) AS BIGINT) AS n_rec,
                   CAST(10000 * SUM(r) // COUNT(*) AS BIGINT)
                       AS rr_bps,
                   CAST(SUM(r * r2) AS BIGINT) AS n_det,
                   CAST(CASE WHEN SUM(r) > 0 THEN
                        10000 * SUM(r * r2) // SUM(r)
                        ELSE -1 END AS BIGINT) AS det_bps
            FROM p, nn, ee GROUP BY nn.n, ee.eps
        """,
        "orders_bullwhip_ratio": """
            WITH ud AS (SELECT datediff('day', DATE '1970-01-01',
                                        CAST(o_orderdate AS DATE))
                                   AS dy,
                               CAST(COUNT(*) AS BIGINT) AS c
                        FROM orders GROUP BY 1),
            ur AS (SELECT MIN(dy) AS mn, MAX(dy) AS mx FROM ud),
            uv AS (SELECT COALESCE(ud.c, 0) AS c
                   FROM ur, UNNEST(generate_series(ur.mn, ur.mx))
                        AS g(dy)
                   LEFT JOIN ud ON ud.dy = g.dy),
            us AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                          CAST(SUM(c) AS HUGEINT) AS s,
                          SUM(CAST(c AS HUGEINT) * c) AS ss
                   FROM uv),
            dd AS (SELECT datediff('day', DATE '1970-01-01',
                                   CAST(l_shipdate AS DATE)) AS dy,
                          CAST(COUNT(*) AS BIGINT) AS c
                   FROM lineitem GROUP BY 1),
            dr AS (SELECT MIN(dy) AS mn, MAX(dy) AS mx FROM dd),
            dv AS (SELECT COALESCE(dd.c, 0) AS c
                   FROM dr, UNNEST(generate_series(dr.mn, dr.mx))
                        AS g(dy)
                   LEFT JOIN dd ON dd.dy = g.dy),
            ds_ AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                           CAST(SUM(c) AS HUGEINT) AS s,
                           SUM(CAST(c AS HUGEINT) * c) AS ss
                    FROM dv)
            SELECT CAST(us.n AS BIGINT) AS n_days_up,
                   CAST(us.s AS BIGINT) AS n_orders,
                   CAST(us.n * us.ss - us.s * us.s AS BIGINT)
                       AS var_num_up,
                   CAST(ds_.n AS BIGINT) AS n_days_down,
                   CAST(ds_.s AS BIGINT) AS n_ships,
                   CAST(ds_.n * ds_.ss - ds_.s * ds_.s AS BIGINT)
                       AS var_num_down,
                   CAST(1000 * (ds_.n * ds_.ss - ds_.s * ds_.s)
                        * us.n * us.n
                        // ((us.n * us.ss - us.s * us.s)
                            * ds_.n * ds_.n) AS BIGINT)
                       AS ratio_milli
            FROM us, ds_
        """,
        "user_split_half_reliability": """
            WITH e AS (SELECT user_id,
                              epoch_us(ts) // 86400000000 AS dy
                       FROM events),
            c AS (SELECT user_id,
                         CAST(SUM(CASE WHEN dy % 2 = 1 THEN 1
                                  ELSE 0 END) AS BIGINT) AS co,
                         CAST(SUM(CASE WHEN dy % 2 = 0 THEN 1
                                  ELSE 0 END) AS BIGINT) AS ce
                  FROM e GROUP BY 1),
            m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(co) AS HUGEINT) AS sx,
                         CAST(SUM(ce) AS HUGEINT) AS sy,
                         SUM(CAST(co AS HUGEINT) * co) AS sxx,
                         SUM(CAST(ce AS HUGEINT) * ce) AS syy,
                         SUM(CAST(co AS HUGEINT) * ce) AS sxy
                  FROM c),
            f AS (SELECT n, n * sxy - sx * sy AS num,
                         n * sxx - sx * sx AS va,
                         n * syy - sy * sy AS vb
                  FROM m),
            g AS (SELECT n, num, va, vb,
                         CASE WHEN va > 0 AND vb > 0 THEN
                              CAST(num AS DOUBLE)
                              / (SQRT(CAST(va AS DOUBLE))
                                 * SQRT(CAST(vb AS DOUBLE)))
                         ELSE NULL END AS rf
                  FROM f)
            SELECT CAST(n AS BIGINT) AS n_users,
                   CAST(num AS BIGINT) AS cov_num,
                   CAST(va AS BIGINT) AS var_odd,
                   CAST(vb AS BIGINT) AS var_even,
                   CAST(CASE WHEN rf IS NULL THEN 0
                        ELSE FLOOR(rf * 1000.0) END AS BIGINT)
                       AS r_milli,
                   CAST(CASE WHEN rf IS NULL THEN 0
                        ELSE FLOOR(2.0 * rf / (1.0 + rf) * 1000.0)
                        END AS BIGINT) AS sb_milli
            FROM g
        """,
        "part_knapsack_greedy": """
            WITH rv AS (SELECT l_partkey AS pk,
                               SUM(CAST(FLOOR(l_extendedprice
                                        * (1 - l_discount) * 100)
                                        AS BIGINT)) AS rev
                        FROM lineitem GROUP BY 1),
            p AS (SELECT p_partkey AS pk,
                         CAST(p_size AS BIGINT) AS sz,
                         COALESCE(rv.rev, 0) AS rev
                  FROM part LEFT JOIN rv ON p_partkey = rv.pk),
            tot AS (SELECT CAST(SUM(sz) AS BIGINT) AS ts,
                           CAST(SUM(rev) AS BIGINT) AS tr,
                           CAST(COUNT(*) AS BIGINT) AS np
                    FROM p),
            k AS (SELECT pk, sz, rev,
                         (1000000 * rev) // sz AS key
                  FROM p),
            o AS (SELECT *, SUM(sz) OVER (ORDER BY key DESC, pk
                                          ROWS UNBOUNDED PRECEDING)
                             AS cum
                  FROM k),
            pick AS (SELECT o.* FROM o, tot WHERE cum <= ts // 10)
            SELECT tot.np AS n_parts,
                   CAST(tot.ts // 10 AS BIGINT) AS capacity,
                   CAST(COUNT(*) AS BIGINT) AS n_picked,
                   CAST(SUM(pick.sz) AS BIGINT) AS picked_size,
                   CAST(SUM(pick.rev) AS BIGINT) AS picked_rev,
                   CAST(10000 * SUM(pick.rev) // tot.tr AS BIGINT)
                       AS rev_share_bps,
                   CAST(MIN(pick.key) AS BIGINT) AS last_key
            FROM pick, tot GROUP BY tot.np, tot.ts, tot.tr
        """,
        "events_peak_over_threshold": """
            WITH d AS (SELECT epoch_us(ts) // 86400000000 AS dy,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM events GROUP BY 1),
            rng AS (SELECT MIN(dy) AS mn, MAX(dy) AS mx FROM d),
            grid AS (SELECT u.dy FROM rng,
                     UNNEST(generate_series(mn, mx)) AS u(dy)),
            v AS (SELECT grid.dy AS i, COALESCE(d.c, 0) AS c
                  FROM grid LEFT JOIN d ON d.dy = grid.dy),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
            th AS (SELECT unnest([90, 95, 99]) AS q),
            r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rk
                  FROM v),
            uq AS (SELECT th.q,
                          MAX(CASE WHEN rk <= (th.q * nn.n + 99)
                                            // 100
                               THEN c END) AS u
                   FROM r, nn, th GROUP BY th.q),
            ex AS (SELECT uq.q, uq.u, v.i, v.c,
                          ROW_NUMBER() OVER (PARTITION BY uq.q
                                             ORDER BY v.i) AS rn
                   FROM v JOIN uq ON v.c > uq.u),
            ag AS (SELECT q, u,
                          CAST(COUNT(*) AS BIGINT) AS n_exceed,
                          CAST(COUNT(DISTINCT i - rn) AS BIGINT)
                              AS n_clusters,
                          CAST(SUM(c - u) AS BIGINT) AS sum_excess,
                          CAST(MAX(c - u) AS BIGINT) AS max_excess
                   FROM ex GROUP BY 1, 2)
            SELECT CAST(th.q AS BIGINT) AS q,
                   CAST(uq.u AS BIGINT) AS u,
                   COALESCE(ag.n_exceed, 0) AS n_exceed,
                   COALESCE(ag.n_clusters, 0) AS n_clusters,
                   COALESCE(ag.sum_excess, 0) AS sum_excess,
                   CAST(CASE WHEN ag.n_exceed > 0 THEN
                        1000 * ag.sum_excess // ag.n_exceed
                        ELSE -1 END AS BIGINT) AS mean_excess_milli,
                   CAST(COALESCE(ag.max_excess, -1) AS BIGINT)
                       AS max_excess
            FROM th JOIN uq ON th.q = uq.q
                 LEFT JOIN ag ON ag.q = th.q
            ORDER BY q
        """,
        "embedding_centroid_drift": """
            WITH u AS (SELECT CAST(label AS BIGINT) AS label,
                              vec_id % 2 AS half,
                              unnest(embedding) AS v,
                              unnest(generate_series(
                                  1, len(embedding))) AS dim
                       FROM embeddings),
            s AS (SELECT label, half, dim,
                         SUM(CAST(FLOOR(CAST(v AS DOUBLE)
                                        * 1000000.0) AS BIGINT))
                             AS sv
                  FROM u GROUP BY 1, 2, 3),
            p AS (SELECT a.label,
                         SUM(CAST(a.sv AS HUGEINT) * b.sv) AS num,
                         SUM(CAST(a.sv AS HUGEINT) * a.sv) AS d0,
                         SUM(CAST(b.sv AS HUGEINT) * b.sv) AS d1
                  FROM s a JOIN s b ON a.label = b.label
                                   AND a.dim = b.dim
                  WHERE a.half = 0 AND b.half = 1
                  GROUP BY 1),
            n AS (SELECT CAST(label AS BIGINT) AS label,
                         CAST(COUNT(*) FILTER (vec_id % 2 = 0)
                              AS BIGINT) AS n_even,
                         CAST(COUNT(*) FILTER (vec_id % 2 = 1)
                              AS BIGINT) AS n_odd
                  FROM embeddings GROUP BY 1)
            SELECT n.label, n.n_even, n.n_odd,
                   CAST(CASE WHEN n.n_even > 0 AND n.n_odd > 0 THEN
                        FLOOR(CAST(p.num AS DOUBLE)
                              / (SQRT(CAST(p.d0 AS DOUBLE))
                                 * SQRT(CAST(p.d1 AS DOUBLE)))
                              * 1000.0)
                        ELSE -2000 END AS BIGINT) AS cos_milli
            FROM n LEFT JOIN p ON n.label = p.label
            ORDER BY n.label
        """,
        "orders_epoch_folding": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE))
                                  AS dy,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM orders GROUP BY 1),
            rng AS (SELECT MIN(dy) AS mn, MAX(dy) AS mx FROM d),
            grid AS (SELECT u.dy FROM rng,
                     UNNEST(generate_series(mn, mx)) AS u(dy)),
            v AS (SELECT grid.dy - rng.mn AS i, COALESCE(d.c, 0) AS c
                  FROM grid LEFT JOIN d ON d.dy = grid.dy, rng),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
            pp AS (SELECT unnest([5, 6, 7, 8, 30]) AS p),
            w AS (SELECT pp.p, v.i % pp.p AS k,
                         CAST(SUM(v.c) AS BIGINT) AS o
                  FROM v, pp, nn
                  WHERE v.i < (nn.n // pp.p) * pp.p
                  GROUP BY 1, 2),
            t0 AS (SELECT p, CAST(SUM(o) AS BIGINT) AS tt
                   FROM w GROUP BY 1),
            chi AS (SELECT w.p,
                           SUM(CAST(w.p * w.o - t0.tt AS HUGEINT)
                               * (w.p * w.o - t0.tt)) AS num
                    FROM w JOIN t0 ON w.p = t0.p GROUP BY 1),
            pk AS (SELECT p, k, o,
                          ROW_NUMBER() OVER (PARTITION BY p
                                             ORDER BY o DESC, k)
                              AS rn
                   FROM w)
            SELECT CAST(pp.p AS BIGINT) AS p,
                   CAST((nn.n // pp.p) * pp.p AS BIGINT)
                       AS n_days_used,
                   t0.tt AS total,
                   CAST(1000 * chi.num // (pp.p * t0.tt) AS BIGINT)
                       AS chi2_milli,
                   CAST(pp.p - 1 AS BIGINT) AS df,
                   CAST(pk.k AS BIGINT) AS peak_k,
                   CAST(10000 * pk.o // t0.tt AS BIGINT)
                       AS peak_share_bps
            FROM pp JOIN t0 ON pp.p = t0.p
                 JOIN chi ON chi.p = pp.p
                 JOIN pk ON pk.p = pp.p AND pk.rn = 1, nn
            ORDER BY p
        """,
        "part_degree_ccdf": """
            WITH s AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
                              l_partkey AS pk
                       FROM lineitem),
            o AS (SELECT ok, pk,
                         LAG(pk) OVER (PARTITION BY ok
                                       ORDER BY ln, pk) AS prev
                  FROM s),
            ed AS (SELECT DISTINCT LEAST(pk, prev) AS a,
                          GREATEST(pk, prev) AS b
                   FROM o WHERE prev IS NOT NULL AND pk <> prev),
            deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
                    FROM (SELECT a AS node FROM ed
                          UNION ALL SELECT b FROM ed)
                    GROUP BY 1),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
            b AS (SELECT CAST(length(printf('%b', d)) AS BIGINT)
                             AS band,
                         d
                  FROM deg),
            g AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS n_nodes,
                         CAST(SUM(d) AS BIGINT) AS deg_mass
                  FROM b GROUP BY 1),
            c AS (SELECT band, n_nodes, deg_mass,
                         CAST(SUM(n_nodes) OVER (
                             ORDER BY band DESC
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS ccdf_nodes
                  FROM g)
            SELECT band, n_nodes, deg_mass, ccdf_nodes,
                   CAST(10000 * ccdf_nodes // nn.n AS BIGINT)
                       AS ccdf_bps
            FROM c, nn ORDER BY band
        """,
        "part_demand_quadrants": """
            WITH dd AS (SELECT l_partkey AS pk,
                               datediff('day', DATE '1970-01-01',
                                        CAST(l_shipdate AS DATE))
                                   AS d,
                               SUM(CAST(FLOOR(l_quantity) AS BIGINT))
                                   AS q
                        FROM lineitem GROUP BY 1, 2),
            p AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS k,
                         CAST(SUM(q) AS BIGINT) AS s,
                         CAST(SUM(q * q) AS BIGINT) AS sq,
                         MIN(d) AS df, MAX(d) AS dl
                  FROM dd GROUP BY 1),
            c AS (SELECT pk, k, s,
                         CASE WHEN k = 1 THEN 'single'
                              WHEN 100 * (dl - df) >= 132 * (k - 1)
                              THEN CASE WHEN 100 * (CAST(k AS HUGEINT)
                                                    * sq - CAST(s AS
                                                    HUGEINT) * s)
                                             >= 49 * CAST(s AS HUGEINT)
                                                * s
                                        THEN 'lumpy'
                                        ELSE 'intermittent' END
                              ELSE CASE WHEN 100 * (CAST(k AS HUGEINT)
                                                    * sq - CAST(s AS
                                                    HUGEINT) * s)
                                             >= 49 * CAST(s AS HUGEINT)
                                                * s
                                        THEN 'erratic'
                                        ELSE 'smooth' END
                         END AS quadrant
                  FROM p),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS np FROM p)
            SELECT quadrant,
                   CAST(COUNT(*) AS BIGINT) AS n_parts,
                   CAST(10000 * COUNT(*) // nn.np AS BIGINT)
                       AS share_bps,
                   CAST(SUM(k) AS BIGINT) AS sum_demand_days,
                   CAST(SUM(s) AS BIGINT) AS sum_qty
            FROM c, nn GROUP BY quadrant, nn.np ORDER BY quadrant
        """,
        "customer_lorenz_asymmetry": """
            WITH c AS (SELECT o_custkey,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS x
                       FROM orders GROUP BY 1),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(x) AS BIGINT) AS t
                  FROM c),
            f AS (SELECT CAST(COUNT(*) FILTER (
                              CAST(m.n AS HUGEINT) * x < m.t)
                              AS BIGINT) AS mb,
                         CAST(COALESCE(SUM(x) FILTER (
                              CAST(m.n AS HUGEINT) * x < m.t), 0)
                              AS BIGINT) AS lm,
                         CAST(COUNT(*) FILTER (
                              CAST(m.n AS HUGEINT) * x = m.t)
                              AS BIGINT) AS e
                  FROM c, m GROUP BY m.n, m.t)
            SELECT m.n AS n_customers, m.t AS total_cents,
                   f.mb AS n_below, f.e AS n_at_mean,
                   f.lm AS below_cents,
                   CAST(1000 * f.mb // m.n + 1000 * f.lm // m.t
                        AS BIGINT) AS lac_milli
            FROM m, f
        """,
        "customer_order_overdispersion": """
            WITH c AS (SELECT o_custkey,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM orders GROUP BY 1),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(c) AS BIGINT) AS s,
                         CAST(SUM(c * c) AS BIGINT) AS s2
                  FROM c),
            f AS (SELECT n, s, s2,
                         CAST(n AS HUGEINT) * s2
                             - CAST(s AS HUGEINT) * s AS d
                  FROM m)
            SELECT n AS n_customers, s AS sum_orders, s2 AS sum_sq,
                   CAST(d AS BIGINT) AS disp_num,
                   CAST(1000 * d // (CAST(n AS HUGEINT) * s) - 1000
                        AS BIGINT) AS ics_milli,
                   CAST(CASE WHEN d - CAST(n AS HUGEINT) * s > 0
                        THEN 1000 * CAST(s AS HUGEINT) * s
                             // (d - CAST(n AS HUGEINT) * s)
                        ELSE -1 END AS BIGINT) AS nb_k_milli
            FROM f
        """,
        "nation_segment_rca": """
            WITH j AS (SELECT c_nationkey AS nk,
                              c_mktsegment AS seg,
                              CAST(FLOOR(o_totalprice * 100)
                                   AS BIGINT) AS v
                       FROM orders
                       JOIN customer ON o_custkey = c_custkey),
            g AS (SELECT nk, seg, CAST(SUM(v) AS BIGINT) AS x
                  FROM j GROUP BY 1, 2),
            r AS (SELECT nk, CAST(SUM(x) AS BIGINT) AS rx
                  FROM g GROUP BY 1),
            c AS (SELECT seg, CAST(SUM(x) AS BIGINT) AS cx
                  FROM g GROUP BY 1),
            t AS (SELECT CAST(SUM(x) AS BIGINT) AS tx FROM g)
            SELECT CAST(g.nk AS BIGINT) AS c_nationkey,
                   g.seg AS c_mktsegment,
                   g.x AS cents,
                   r.rx AS nation_cents,
                   c.cx AS segment_cents,
                   CAST(1000 * CAST(g.x AS HUGEINT) * t.tx
                        // (CAST(r.rx AS HUGEINT) * c.cx)
                        AS BIGINT) AS rca_milli
            FROM g JOIN r ON g.nk = r.nk
                 JOIN c ON g.seg = c.seg, t
            ORDER BY c_nationkey, c_mktsegment
        """,
        "media_scene_changes": """
            WITH m AS (SELECT doc_id, text,
                              8 + CAST(('0x' || substr(md5(text),
                                                       1, 15))
                                       AS UBIGINT) % 24 AS nf
                       FROM documents),
            s AS (SELECT doc_id, text, nf,
                         CAST((nf + 3) // 4 AS BIGINT) AS step
                  FROM m),
            fr AS (SELECT doc_id, text, u.f AS fi
                   FROM s, UNNEST(range(0, CAST(nf AS BIGINT),
                                        step)) AS u(f)),
            h AS (SELECT doc_id, fi,
                         CAST(('0x' || substr(md5(text || '#'
                              || CAST(fi AS VARCHAR)), 1, 15))
                              AS UBIGINT) AS hv
                  FROM fr),
            w AS (SELECT doc_id, hv,
                         LEAD(hv) OVER (PARTITION BY doc_id
                                        ORDER BY fi) AS nh
                  FROM h),
            d AS (SELECT doc_id,
                         CAST(COUNT(*) AS BIGINT) AS n_sampled,
                         CAST(SUM(CASE WHEN nh IS NOT NULL
                                  AND bit_count(xor(hv, nh)) > 30
                                  THEN 1 ELSE 0 END) AS BIGINT)
                             AS n_cuts
                  FROM w GROUP BY 1),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d)
            SELECT CAST(n_cuts AS BIGINT) AS n_cuts,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(10000 * COUNT(*) // nn.n AS BIGINT)
                       AS share_bps,
                   CAST(SUM(n_sampled) AS BIGINT) AS sum_frames
            FROM d, nn GROUP BY n_cuts, nn.n ORDER BY n_cuts
        """,
        "part_price_stickiness": """
            WITH s AS (SELECT l_partkey AS pk,
                              datediff('day', DATE '1970-01-01',
                                       CAST(l_shipdate AS DATE))
                                  AS d,
                              l_orderkey AS ok, l_linenumber AS ln,
                              CAST(FLOOR(l_extendedprice * 100)
                                   AS BIGINT) AS ep,
                              CAST(FLOOR(l_quantity) AS BIGINT) AS q
                       FROM lineitem),
            w AS (SELECT pk, ep, q,
                         LAG(ep) OVER (PARTITION BY pk
                                       ORDER BY d, ok, ln) AS pep,
                         LAG(q) OVER (PARTITION BY pk
                                      ORDER BY d, ok, ln) AS pq
                  FROM s),
            p AS (SELECT pk,
                         CASE WHEN ep * pq <> pep * q
                              THEN 1 ELSE 0 END AS ch
                  FROM w WHERE pep IS NOT NULL)
            SELECT CAST(COUNT(DISTINCT pk) AS BIGINT)
                       AS n_parts_multi,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(ch) AS BIGINT) AS n_changed,
                   CAST(10000 * SUM(ch) // COUNT(*) AS BIGINT)
                       AS changed_bps
            FROM p
        """,
        "embedding_kmeans_elbow": """
            WITH q AS (SELECT vec_id,
                              unnest(generate_series(
                                  1, len(embedding))) AS dim,
                              CAST(FLOOR(CAST(unnest(embedding)
                                              AS DOUBLE)
                                         * 1000000.0) AS BIGINT)
                                  AS qv
                       FROM embeddings),
            sids AS (SELECT DISTINCT vec_id FROM embeddings
                     ORDER BY vec_id LIMIT 8),
            seed AS (SELECT q.vec_id AS cid, q.dim, q.qv
                     FROM q JOIN sids ON q.vec_id = sids.vec_id),
            cr AS (SELECT cid,
                          ROW_NUMBER() OVER (ORDER BY cid) - 1
                              AS cidx
                   FROM (SELECT DISTINCT cid FROM seed)),
            d2 AS (SELECT q.vec_id, s.cid,
                          SUM(CAST(q.qv - s.qv AS HUGEINT)
                              * (q.qv - s.qv)) AS dd
                   FROM q JOIN seed s ON q.dim = s.dim
                   GROUP BY 1, 2),
            ks AS (SELECT unnest([2, 4, 8]) AS k),
            a AS (SELECT ks.k, d2.vec_id, d2.dd, cr.cidx,
                         ROW_NUMBER() OVER (
                             PARTITION BY ks.k, d2.vec_id
                             ORDER BY d2.dd, cr.cidx) AS rn
                  FROM d2 JOIN cr ON d2.cid = cr.cid, ks
                  WHERE cr.cidx < ks.k),
            sel AS (SELECT k, vec_id, dd, cidx FROM a WHERE rn = 1),
            sz AS (SELECT k, cidx, CAST(COUNT(*) AS BIGINT) AS c
                   FROM sel GROUP BY 1, 2)
            SELECT CAST(sel.k AS BIGINT) AS k,
                   CAST(COUNT(*) AS BIGINT) AS n_vecs,
                   CAST(SUM(sel.dd) // 1000000 AS BIGINT)
                       AS inertia_scaled,
                   CAST((SELECT MAX(c) FROM sz
                         WHERE sz.k = sel.k) AS BIGINT) AS biggest_n
            FROM sel GROUP BY sel.k ORDER BY k
        """,
        "trade_home_bias": """
            WITH f AS (SELECT s.s_nationkey AS sn,
                              c.c_nationkey AS cn
                       FROM lineitem l
                       JOIN orders o ON l.l_orderkey = o.o_orderkey
                       JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       JOIN customer c ON o.o_custkey = c.c_custkey),
            g AS (SELECT sn, cn, CAST(COUNT(*) AS BIGINT) AS o
                  FROM f GROUP BY 1, 2),
            r AS (SELECT sn, CAST(SUM(o) AS BIGINT) AS rr
                  FROM g GROUP BY 1),
            c2 AS (SELECT cn, CAST(SUM(o) AS BIGINT) AS cc
                   FROM g GROUP BY 1),
            t AS (SELECT CAST(SUM(o) AS BIGINT) AS t FROM g),
            d AS (SELECT CAST(COALESCE(SUM(o), 0) AS BIGINT) AS s
                  FROM g WHERE sn = cn),
            e AS (SELECT SUM(CAST(r.rr AS HUGEINT) * c2.cc) AS en
                  FROM r JOIN c2 ON r.sn = c2.cn)
            SELECT t.t AS n_lines, d.s AS obs_same,
                   CAST(10000 * d.s // t.t AS BIGINT)
                       AS home_share_bps,
                   CAST(e.en AS BIGINT) AS exp_num,
                   CAST(10000 * e.en
                        // (CAST(t.t AS HUGEINT) * t.t) AS BIGINT)
                       AS exp_share_bps,
                   CAST(1000 * CAST(d.s AS HUGEINT) * t.t // e.en
                        AS BIGINT) AS lift_milli
            FROM t, d, e
        """,
        "part_walk_centrality": """
            WITH s AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
                              l_partkey AS pk
                       FROM lineitem),
            o AS (SELECT ok, pk,
                         LAG(pk) OVER (PARTITION BY ok
                                       ORDER BY ln, pk) AS prev
                  FROM s),
            ed AS (SELECT DISTINCT LEAST(pk, prev) AS a,
                          GREATEST(pk, prev) AS b
                   FROM o WHERE prev IS NOT NULL AND pk <> prev),
            deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
                    FROM (SELECT a AS node FROM ed
                          UNION ALL SELECT b FROM ed)
                    GROUP BY 1),
            w2 AS (SELECT node, CAST(SUM(dn) AS BIGINT) AS w2
                   FROM (SELECT ed.a AS node, db.d AS dn
                         FROM ed JOIN deg db ON ed.b = db.node
                         UNION ALL
                         SELECT ed.b, da.d
                         FROM ed JOIN deg da ON ed.a = da.node)
                   GROUP BY 1)
            SELECT CAST(deg.node AS BIGINT) AS p_partkey,
                   deg.d AS deg, w2.w2 AS walks2,
                   CAST(deg.d + w2.w2 AS BIGINT) AS score,
                   CAST(ROW_NUMBER() OVER (
                       ORDER BY deg.d + w2.w2 DESC, deg.node)
                       AS BIGINT) AS rk
            FROM deg JOIN w2 ON deg.node = w2.node
            ORDER BY score DESC, p_partkey LIMIT 20
        """,
        "orders_quarterly_gini": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE))
                                  AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS cents
                       FROM orders GROUP BY 1),
            lo AS (SELECT MIN(dy) AS mn FROM d),
            qd AS (SELECT (dy - mn) // 90 AS quarter, cents
                   FROM d, lo),
            r AS (SELECT quarter, cents,
                         ROW_NUMBER() OVER (PARTITION BY quarter
                                            ORDER BY cents) AS rn,
                         COUNT(*) OVER (PARTITION BY quarter) AS n
                  FROM qd)
            SELECT CAST(quarter AS BIGINT) AS quarter,
                   CAST(MAX(n) AS BIGINT) AS n_days,
                   CAST(SUM(cents) AS BIGINT) AS total_cents,
                   CAST(CASE WHEN SUM(cents) > 0 THEN
                        10000 * SUM(CAST(2 * rn - n - 1 AS HUGEINT)
                                    * cents)
                        // (CAST(MAX(n) AS HUGEINT) * SUM(cents))
                        ELSE -1 END AS BIGINT) AS gini_bps
            FROM r GROUP BY quarter ORDER BY quarter
        """,
        "part_price_nested_anova": """
            WITH d AS (SELECT p_type AS ty, p_brand AS br,
                              CAST(FLOOR(p_retailprice * 100)
                                   AS BIGINT) AS v
                       FROM part),
            c AS (SELECT ty, br, CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(v) AS HUGEINT) AS s,
                         SUM(CAST(v AS HUGEINT) * v) AS q
                  FROM d GROUP BY 1, 2),
            tg AS (SELECT ty, SUM(n) AS nt, SUM(s) AS st
                   FROM c GROUP BY 1),
            g AS (SELECT SUM(n) AS n, SUM(s) AS s FROM c),
            mb AS (SELECT 1000 * s // n AS mbar, n FROM g),
            tm AS (SELECT ty, nt, 1000 * st // nt AS mt FROM tg),
            sst AS (SELECT SUM(nt * (mt - mbar) * (mt - mbar)) AS v
                    FROM tm, mb),
            cm AS (SELECT c.ty, c.n, c.s, c.q,
                          1000 * c.s // c.n AS mi, tm.mt
                   FROM c JOIN tm ON c.ty = tm.ty),
            ssb AS (SELECT SUM(n * (mi - mt) * (mi - mt)) AS v
                    FROM cm),
            ssw AS (SELECT SUM(1000000 * q - 2 * mi * 1000 * s
                               + n * mi * mi) AS v
                    FROM cm),
            kk AS (SELECT (SELECT COUNT(*) FROM tm) AS n_types,
                          (SELECT COUNT(*) FROM c) AS n_cells,
                          mb.n AS n
                   FROM mb)
            SELECT CAST(kk.n AS BIGINT) AS n_parts,
                   CAST(kk.n_types AS BIGINT) AS n_types,
                   CAST(kk.n_cells AS BIGINT) AS n_cells,
                   CAST(sst.v // 1000000 AS BIGINT) AS ss_type_sc,
                   CAST(ssb.v // 1000000 AS BIGINT) AS ss_brand_sc,
                   CAST(ssw.v // 1000000 AS BIGINT) AS ss_within_sc,
                   CAST(1000 * sst.v * (kk.n_cells - kk.n_types)
                        // (ssb.v * (kk.n_types - 1)) AS BIGINT)
                       AS f_type_milli,
                   CAST(1000 * ssb.v * (kk.n - kk.n_cells)
                        // (ssw.v * (kk.n_cells - kk.n_types))
                        AS BIGINT) AS f_brand_milli,
                   CAST(10000 * sst.v // (sst.v + ssb.v + ssw.v)
                        AS BIGINT) AS type_share_bps,
                   CAST(10000 * ssb.v // (sst.v + ssb.v + ssw.v)
                        AS BIGINT) AS brand_share_bps
            FROM sst, ssb, ssw, kk
        """,
        "docs_nchars_consistency": """
            WITH d AS (SELECT n_chars,
                              length(text) AS actual
                       FROM documents),
            f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(COUNT(*) FILTER (n_chars = actual)
                              AS BIGINT) AS m,
                         CAST(SUM(ABS(n_chars - actual)) AS BIGINT)
                             AS sd,
                         CAST(MAX(ABS(n_chars - actual)) AS BIGINT)
                             AS mx
                  FROM d)
            SELECT n AS n_docs, m AS n_match,
                   CAST(10000 * m // n AS BIGINT) AS match_bps,
                   sd AS sum_absdev, mx AS max_absdev
            FROM f
        """,
        "events_markov_order_test": """
            WITH s AS (SELECT event_type AS t,
                              LAG(event_type, 1) OVER w AS p1,
                              LAG(event_type, 2) OVER w AS p2
                       FROM events
                       WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts, event_id)),
            u0 AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c
                   FROM s GROUP BY 1),
            o0 AS (SELECT 0 AS k, 1 AS n_ctx, SUM(c) AS total,
                          MAX(c) AS correct
                   FROM u0),
            u1 AS (SELECT p1, t, CAST(COUNT(*) AS BIGINT) AS c
                   FROM s WHERE p1 IS NOT NULL GROUP BY 1, 2),
            m1 AS (SELECT p1, MAX(c) AS mx, SUM(c) AS tt
                   FROM u1 GROUP BY 1),
            o1 AS (SELECT 1 AS k, COUNT(*) AS n_ctx,
                          SUM(tt) AS total, SUM(mx) AS correct
                   FROM m1),
            u2 AS (SELECT p2, p1, t, CAST(COUNT(*) AS BIGINT) AS c
                   FROM s WHERE p2 IS NOT NULL GROUP BY 1, 2, 3),
            m2 AS (SELECT p2, p1, MAX(c) AS mx, SUM(c) AS tt
                   FROM u2 GROUP BY 1, 2),
            o2 AS (SELECT 2 AS k, COUNT(*) AS n_ctx,
                          SUM(tt) AS total, SUM(mx) AS correct
                   FROM m2),
            al AS (SELECT * FROM o0 UNION ALL SELECT * FROM o1
                   UNION ALL SELECT * FROM o2)
            SELECT CAST(k AS BIGINT) AS order_k,
                   CAST(n_ctx AS BIGINT) AS n_contexts,
                   CAST(total AS BIGINT) AS n_predictions,
                   CAST(correct AS BIGINT) AS n_correct,
                   CAST(10000 * correct // total AS BIGINT)
                       AS accuracy_bps
            FROM al ORDER BY order_k
        """,
        "events_neyman_allocation": """
            WITH d AS (SELECT event_type AS et,
                              CAST(FLOOR(value * 100) AS BIGINT) AS v
                       FROM events),
            g AS (SELECT et, CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(v) AS HUGEINT) AS s,
                         SUM(CAST(v AS HUGEINT) * v) AS q
                  FROM d GROUP BY 1),
            f AS (SELECT et, n, n * q - s * s AS vn,
                         CAST(FLOOR(SQRT(CAST(n * q - s * s
                                              AS DOUBLE)))
                              AS BIGINT) AS w
                  FROM g),
            t AS (SELECT SUM(w) AS ws, SUM(n) AS nt FROM f)
            SELECT et AS event_type,
                   CAST(n AS BIGINT) AS n,
                   CAST(vn // 1000000 AS BIGINT) AS v_num_sc,
                   w,
                   CAST(10000 * w // t.ws AS BIGINT)
                       AS alloc_neyman_bps,
                   CAST(10000 * n // t.nt AS BIGINT)
                       AS alloc_prop_bps
            FROM f, t ORDER BY et
        """,
        "docs_winnowing_density": """
            WITH d AS (SELECT doc_id, text FROM documents
                       WHERE doc_id % 8 = 0
                         AND length(text) >= 12),
            g AS (SELECT doc_id, u.i,
                         CAST(('0x' || substr(md5(substr(text,
                              CAST(u.i AS INT), 5)), 1, 15))
                              AS UBIGINT) AS h
                  FROM d, UNNEST(generate_series(
                      1, length(text) - 4)) AS u(i)),
            w AS (SELECT doc_id,
                         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                                      ROWS 7 PRECEDING) AS mh,
                         ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY i) AS rn
                  FROM g),
            sel AS (SELECT doc_id,
                           CAST(COUNT(*) AS BIGINT) AS nw,
                           CAST(COUNT(DISTINCT mh) AS BIGINT) AS ns
                    FROM w WHERE rn >= 8 GROUP BY 1),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                         CAST(SUM(nw) AS BIGINT) AS nw,
                         CAST(SUM(ns) AS BIGINT) AS ns
                  FROM sel)
            SELECT n_docs, nw AS n_windows, ns AS n_selected,
                   CAST(10000 * ns // nw AS BIGINT) AS density_bps,
                   CAST(20000 // 9 AS BIGINT) AS expected_bps
            FROM t
        """,
        "embedding_thin_shell": """
            WITH q AS (SELECT vec_id,
                              CAST(FLOOR(CAST(unnest(embedding)
                                              AS DOUBLE)
                                         * 1000000.0) AS BIGINT)
                                  AS qv
                       FROM embeddings),
            v AS (SELECT vec_id,
                         SUM(CAST(qv AS HUGEINT) * qv) // 1000000
                             AS ns2
                  FROM q GROUP BY 1),
            m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(ns2) AS HUGEINT) AS s
                  FROM v),
            c AS (SELECT CAST(COUNT(*) FILTER (
                              100 * m.n * ns2 < 90 * m.s)
                              AS BIGINT) AS below,
                         CAST(COUNT(*) FILTER (
                              100 * m.n * ns2 > 110 * m.s)
                              AS BIGINT) AS above,
                         CAST(COUNT(*) AS BIGINT) AS nn
                  FROM v, m GROUP BY m.n, m.s)
            SELECT CAST(m.n AS BIGINT) AS n_vecs,
                   CAST(m.s AS BIGINT) AS sum_ns2_sc,
                   CAST(c.nn - c.below - c.above AS BIGINT)
                       AS n_within,
                   c.below AS n_below, c.above AS n_above,
                   CAST(10000 * (c.nn - c.below - c.above) // m.n
                        AS BIGINT) AS within_bps
            FROM m, c
        """,
        "nation_ship_lag_median": """
            WITH j AS (SELECT c.c_nationkey AS nk,
                              datediff('day',
                                       CAST(o.o_orderdate AS DATE),
                                       CAST(l.l_shipdate AS DATE))
                                  AS lg
                       FROM lineitem l
                       JOIN orders o ON l.l_orderkey = o.o_orderkey
                       JOIN customer c ON o.o_custkey = c.c_custkey),
            g AS (SELECT nk, lg, CAST(COUNT(*) AS BIGINT) AS c
                  FROM j GROUP BY 1, 2),
            r AS (SELECT nk, lg, c,
                         SUM(c) OVER (PARTITION BY nk ORDER BY lg
                                      ROWS UNBOUNDED PRECEDING)
                             AS cum,
                         SUM(c) OVER (PARTITION BY nk) AS tot,
                         SUM(lg * c) OVER (PARTITION BY nk) AS wsum
                  FROM g)
            SELECT CAST(nk AS BIGINT) AS c_nationkey,
                   CAST(MAX(tot) AS BIGINT) AS n_lines,
                   CAST(MIN(lg) FILTER (
                        cum >= (tot + 1) // 2) AS BIGINT) AS med_lag,
                   CAST(MIN(lg) FILTER (
                        cum >= (9 * tot + 9) // 10) AS BIGINT)
                       AS p90_lag,
                   CAST((CASE WHEN MAX(wsum) > 0 THEN 1
                         WHEN MAX(wsum) < 0 THEN -1 ELSE 0 END)
                        * ((1000 * ABS(MAX(wsum))) // MAX(tot))
                        AS BIGINT) AS mean_lag_milli
            FROM r GROUP BY nk ORDER BY c_nationkey
        """,
        "orders_seasonal_mann_kendall": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE))
                                  AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS rev
                       FROM orders GROUP BY 1),
            w AS (SELECT (dy + 3) % 7 AS dow, dy, rev FROM d),
            p AS (SELECT CASE WHEN b.rev > a.rev THEN 1
                              WHEN b.rev < a.rev THEN -1
                              ELSE 0 END AS sg
                  FROM w a JOIN w b ON a.dow = b.dow
                                   AND b.dy > a.dy),
            ss AS (SELECT COALESCE(SUM(sg), 0) AS s FROM p),
            gn AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS n
                   FROM w GROUP BY 1),
            tt AS (SELECT w.dow,
                          COALESCE(SUM(c * (c - 1) * (2 * c + 5)), 0)
                              AS tie
                   FROM (SELECT dow, rev, COUNT(*) AS c
                         FROM w GROUP BY 1, 2) w
                   WHERE c > 1 GROUP BY 1),
            vv AS (SELECT SUM(gn.n * (gn.n - 1) * (2 * gn.n + 5)
                              - COALESCE(tt.tie, 0)) AS var18,
                          SUM(gn.n) AS n_tot
                   FROM gn LEFT JOIN tt ON gn.dow = tt.dow
                   WHERE gn.n >= 2)
            SELECT CAST(vv.n_tot AS BIGINT) AS n_days,
                   CAST(ss.s AS BIGINT) AS s_stat,
                   CAST(vv.var18 AS BIGINT) AS var_x18,
                   CAST(CASE
                        WHEN ss.s > 0 THEN FLOOR(
                            CAST(ss.s - 1 AS DOUBLE)
                            / SQRT(CAST(vv.var18 AS DOUBLE) / 18.0)
                            * 1000.0)
                        WHEN ss.s < 0 THEN FLOOR(
                            CAST(ss.s + 1 AS DOUBLE)
                            / SQRT(CAST(vv.var18 AS DOUBLE) / 18.0)
                            * 1000.0)
                        ELSE 0 END AS BIGINT) AS z_milli
            FROM ss, vv
        """,
        "part_abc_migration": """
            WITH b AS (SELECT l_partkey AS pk,
                              datediff('day', DATE '1970-01-01',
                                       CAST(l_shipdate AS DATE))
                                  AS d,
                              CAST(FLOOR(l_extendedprice
                                   * (1 - l_discount) * 100)
                                   AS BIGINT) AS rev
                       FROM lineitem),
            sp AS (SELECT (MIN(d) + MAX(d)) // 2 AS mid FROM b),
            h AS (SELECT pk,
                         CASE WHEN d > mid THEN 1 ELSE 0 END AS hf,
                         CAST(SUM(rev) AS BIGINT) AS rev
                  FROM b, sp GROUP BY 1, 2),
            w AS (SELECT pk, hf,
                         SUM(rev) OVER (PARTITION BY hf
                                        ORDER BY rev DESC, pk
                                        ROWS UNBOUNDED PRECEDING)
                             AS cum,
                         SUM(rev) OVER (PARTITION BY hf) AS t
                  FROM h),
            cl AS (SELECT pk, hf,
                          CASE WHEN 5 * cum <= 4 * t THEN 'A'
                               WHEN 20 * cum <= 19 * t THEN 'B'
                               ELSE 'C' END AS cls
                   FROM w),
            c1 AS (SELECT pk, cls FROM cl WHERE hf = 0),
            c2 AS (SELECT pk, cls FROM cl WHERE hf = 1),
            j AS (SELECT COALESCE(c1.cls, 'N') AS f,
                         COALESCE(c2.cls, 'N') AS t
                  FROM part
                  LEFT JOIN c1 ON part.p_partkey = c1.pk
                  LEFT JOIN c2 ON part.p_partkey = c2.pk)
            SELECT f AS from_class, t AS to_class,
                   CAST(COUNT(*) AS BIGINT) AS n_parts
            FROM j GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "events_type_user_gini": """
            WITH c AS (SELECT event_type AS et, user_id AS u,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM events GROUP BY 1, 2),
            r AS (SELECT et, c,
                         ROW_NUMBER() OVER (PARTITION BY et
                                            ORDER BY c, u) AS rn,
                         COUNT(*) OVER (PARTITION BY et) AS n,
                         SUM(c) OVER (PARTITION BY et) AS t,
                         MAX(c) OVER (PARTITION BY et) AS mx
                  FROM c)
            SELECT et AS event_type,
                   CAST(MAX(n) AS BIGINT) AS n_users,
                   CAST(MAX(t) AS BIGINT) AS n_events,
                   CAST(10000 * SUM(CAST(2 * rn - n - 1 AS HUGEINT)
                                    * c)
                        // (CAST(MAX(n) AS HUGEINT) * MAX(t))
                        AS BIGINT) AS gini_bps,
                   CAST(10000 * MAX(mx) // MAX(t) AS BIGINT)
                       AS top_user_bps
            FROM r GROUP BY et ORDER BY et
        """,
        "supplier_type_coverage": """
            WITH tt AS (SELECT CAST(COUNT(DISTINCT p_type) AS BIGINT)
                               AS n_types
                        FROM part),
            j AS (SELECT s.s_nationkey AS nk, p.p_type AS ty
                  FROM lineitem l
                  JOIN supplier s ON l.l_suppkey = s.s_suppkey
                  JOIN part p ON l.l_partkey = p.p_partkey),
            g AS (SELECT nk,
                         CAST(COUNT(*) AS BIGINT) AS n_lines,
                         CAST(COUNT(DISTINCT ty) AS BIGINT)
                             AS n_served
                  FROM j GROUP BY 1),
            ns AS (SELECT s_nationkey AS nk,
                          CAST(COUNT(*) AS BIGINT) AS n_suppliers
                   FROM supplier GROUP BY 1)
            SELECT CAST(g.nk AS BIGINT) AS s_nationkey,
                   COALESCE(ns.n_suppliers, 0) AS n_suppliers,
                   g.n_lines, g.n_served AS n_types_served,
                   CAST(10000 * g.n_served // tt.n_types AS BIGINT)
                       AS coverage_bps
            FROM g LEFT JOIN ns ON g.nk = ns.nk, tt
            ORDER BY s_nationkey
        """,
        "part_supply_resilience": """
            WITH j AS (SELECT l.l_partkey AS pk,
                              s.s_nationkey AS nk,
                              CAST(FLOOR(l.l_extendedprice
                                   * (1 - l.l_discount) * 100)
                                   AS BIGINT) AS rev
                       FROM lineitem l
                       JOIN supplier s ON l.l_suppkey = s.s_suppkey),
            p AS (SELECT pk,
                         CAST(COUNT(DISTINCT nk) AS BIGINT) AS nn,
                         CAST(SUM(rev) AS BIGINT) AS rev
                  FROM j GROUP BY 1),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS np,
                         CAST(SUM(rev) AS BIGINT) AS tr
                  FROM p)
            SELECT CAST(LEAST(p.nn, 4) AS BIGINT) AS n_nations_band,
                   CAST(COUNT(*) AS BIGINT) AS n_parts,
                   CAST(10000 * COUNT(*) // t.np AS BIGINT)
                       AS part_share_bps,
                   CAST(SUM(p.rev) AS BIGINT) AS rev_cents,
                   CAST(10000 * SUM(p.rev) // t.tr AS BIGINT)
                       AS rev_share_bps
            FROM p, t GROUP BY 1, t.np, t.tr ORDER BY 1
        """,
        "part_name_price_premium": """
            WITH d AS (SELECT split_part(p_name, ' ', 1) AS tok,
                              CAST(FLOOR(p_retailprice * 100)
                                   AS BIGINT) AS v
                       FROM part),
            g AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(v) AS BIGINT) AS s
                  FROM d GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
                         CAST(SUM(s) AS BIGINT) AS st
                  FROM g)
            SELECT g.tok AS token, g.n AS n_parts,
                   CAST(1000 * g.s // g.n AS BIGINT) AS mean_milli,
                   CAST(1000 * CAST(g.s AS HUGEINT) * t.nt
                        // (CAST(g.n AS HUGEINT) * t.st) - 1000
                        AS BIGINT) AS premium_milli
            FROM g, t ORDER BY token
        """,
        "events_next_value_by_type": """
            WITH s AS (SELECT event_type AS t,
                              CAST(FLOOR(value * 100) AS BIGINT)
                                  AS cents,
                              LAG(event_type) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS prev
                       FROM events),
            g AS (SELECT prev AS cur,
                         CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(cents) AS BIGINT) AS sm
                  FROM s WHERE prev IS NOT NULL GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
                         CAST(SUM(sm) AS BIGINT) AS st
                  FROM g)
            SELECT g.cur AS cur_type, g.n AS n_pairs,
                   g.sm AS sum_next_cents,
                   CAST(1000 * g.sm // g.n AS BIGINT)
                       AS mean_next_milli,
                   CAST(1000 * CAST(g.sm AS HUGEINT) * t.nt
                        // (CAST(g.n AS HUGEINT) * t.st) - 1000
                        AS BIGINT) AS lift_milli
            FROM g, t ORDER BY cur_type
        """,
        "lineitem_status_stump": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(l_shipdate AS DATE))
                                  AS dy,
                              CASE WHEN l_linestatus = 'F'
                                   THEN 1 ELSE 0 END AS isf
                       FROM lineitem),
            h AS (SELECT dy,
                         CAST(SUM(1 - isf) AS BIGINT) AS co,
                         CAST(SUM(isf) AS BIGINT) AS cf
                  FROM d GROUP BY 1),
            t AS (SELECT CAST(SUM(co) AS BIGINT) AS tot_o,
                         CAST(SUM(cf) AS BIGINT) AS tot_f
                  FROM h),
            r AS (SELECT dy,
                         SUM(co) OVER (ORDER BY dy
                                       ROWS UNBOUNDED PRECEDING)
                             AS cum_o,
                         SUM(cf) OVER (ORDER BY dy
                                       ROWS UNBOUNDED PRECEDING)
                             AS cum_f
                  FROM h),
            e AS (SELECT r.dy,
                         r.cum_o + (t.tot_f - r.cum_f) AS err,
                         t.tot_o, t.tot_f
                  FROM r, t),
            b AS (SELECT * FROM e ORDER BY err, dy LIMIT 1)
            SELECT CAST(tot_o + tot_f AS BIGINT) AS n_lines,
                   CAST(tot_o AS BIGINT) AS n_o,
                   CAST(tot_f AS BIGINT) AS n_f,
                   CAST(dy AS BIGINT) AS best_day,
                   CAST(err AS BIGINT) AS min_errors,
                   CAST(10000 * err // (tot_o + tot_f) AS BIGINT)
                       AS err_bps,
                   CAST(10000 * LEAST(tot_o, tot_f)
                        // (tot_o + tot_f) AS BIGINT)
                       AS base_err_bps
            FROM b
        """,
        "order_supplier_spread": """
            WITH p AS (SELECT l_orderkey AS ok,
                              CAST(COUNT(DISTINCT l_suppkey)
                                   AS BIGINT) AS ns,
                              CAST(COUNT(*) AS BIGINT) AS nl
                       FROM lineitem GROUP BY 1),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS no,
                         CAST(SUM(nl) AS BIGINT) AS tl
                  FROM p)
            SELECT CAST(LEAST(p.ns, 4) AS BIGINT) AS band,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(p.nl) AS BIGINT) AS n_lines,
                   CAST(10000 * COUNT(*) // t.no AS BIGINT)
                       AS order_share_bps,
                   CAST(10000 * SUM(p.nl) // t.tl AS BIGINT)
                       AS line_share_bps
            FROM p, t GROUP BY 1, t.no, t.tl ORDER BY 1
        """,
        "lineitem_moods_median": """
            WITH d AS (SELECT l_returnflag AS fl,
                              CAST(FLOOR(l_quantity) AS BIGINT) AS q
                       FROM lineitem),
            qh AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS c
                   FROM d GROUP BY 1),
            nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM qh),
            med AS (SELECT MIN(q) AS med
                    FROM (SELECT q, SUM(c) OVER (ORDER BY q
                              ROWS UNBOUNDED PRECEDING) AS cum
                          FROM qh), nn
                    WHERE cum >= (nn.n + 1) // 2),
            cl AS (SELECT fl,
                          CAST(COUNT(*) FILTER (q <= med) AS HUGEINT)
                              AS lo,
                          CAST(COUNT(*) FILTER (q > med) AS HUGEINT)
                              AS hi
                   FROM d, med GROUP BY 1),
            t AS (SELECT SUM(lo) AS lo_tot, SUM(hi) AS hi_tot,
                         SUM(lo + hi) AS n,
                         CAST(COUNT(*) AS BIGINT) AS k
                  FROM cl),
            chi AS (SELECT SUM(
                        1000 * (t.n * cl.lo - (cl.lo + cl.hi)
                                * t.lo_tot)
                        * (t.n * cl.lo - (cl.lo + cl.hi) * t.lo_tot)
                        // (t.n * (cl.lo + cl.hi) * t.lo_tot)
                        + 1000 * (t.n * cl.hi - (cl.lo + cl.hi)
                                  * t.hi_tot)
                        * (t.n * cl.hi - (cl.lo + cl.hi) * t.hi_tot)
                        // (t.n * (cl.lo + cl.hi) * t.hi_tot))
                        AS v
                    FROM cl, t GROUP BY t.n, t.lo_tot, t.hi_tot)
            SELECT CAST(t.n AS BIGINT) AS n_lines,
                   CAST(med.med AS BIGINT) AS med_qty,
                   CAST(t.lo_tot AS BIGINT) AS n_le,
                   CAST(t.hi_tot AS BIGINT) AS n_gt,
                   CAST(chi.v AS BIGINT) AS chi2_milli,
                   CAST(t.k - 1 AS BIGINT) AS df
            FROM t, med, chi
        """,
        "join_size_estimator_audit": """
            WITH g AS (SELECT l_partkey,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM lineitem GROUP BY 1),
            t AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                         CAST(COUNT(*) AS BIGINT) AS d,
                         CAST(SUM(CAST(c AS HUGEINT) * c) AS BIGINT)
                             AS actual,
                         CAST(MAX(c * c) AS BIGINT) AS top
                  FROM g)
            SELECT n AS n_rows, d AS n_distinct,
                   CAST(CAST(n AS HUGEINT) * n // d AS BIGINT)
                       AS est_rows,
                   actual AS actual_rows,
                   CAST(1000 * (CAST(n AS HUGEINT) * n // d)
                        // actual AS BIGINT)
                       AS est_over_actual_milli,
                   CAST(10000 * top // actual AS BIGINT)
                       AS top_key_share_bps
            FROM t
        """,
        "embedding_knn_reciprocity": """
            WITH q AS (SELECT vec_id, embedding FROM embeddings
                       WHERE vec_id % 4 = 0),
            top AS (SELECT query_id, neighbor_id FROM (
                SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                       CAST(FLOOR(list_cosine_similarity(
                           CAST(a.embedding AS DOUBLE[]),
                           CAST(b.embedding AS DOUBLE[])) * 10000)
                           AS BIGINT) AS sim_bp
                FROM q a, q b WHERE a.vec_id != b.vec_id)
              QUALIFY row_number() OVER (
                  PARTITION BY query_id
                  ORDER BY sim_bp DESC, neighbor_id) <= 5),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS mutual
                  FROM top e JOIN top r
                    ON e.query_id = r.neighbor_id
                   AND e.neighbor_id = r.query_id),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM q),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS ne FROM top)
            SELECT n.nn AS n_nodes, t.ne AS n_edges,
                   m.mutual AS n_mutual,
                   CAST(10000 * m.mutual // t.ne AS BIGINT)
                       AS recip_bps
            FROM n, t, m
        """,
        "customer_brand_loyalty": """
            WITH j AS (SELECT o.o_custkey AS ck, p.p_brand AS br
                       FROM lineitem l
                       JOIN orders o ON l.l_orderkey = o.o_orderkey
                       JOIN part p ON l.l_partkey = p.p_partkey),
            cb AS (SELECT ck, br, CAST(COUNT(*) AS BIGINT) AS c
                   FROM j GROUP BY 1, 2),
            s AS (SELECT SUM(CAST(c AS HUGEINT) * (c - 1)) AS same
                  FROM cb),
            cu AS (SELECT ck, CAST(SUM(c) AS BIGINT) AS n
                   FROM cb GROUP BY 1),
            p AS (SELECT SUM(CAST(n AS HUGEINT) * (n - 1)) AS pairs,
                         CAST(COUNT(*) FILTER (n >= 2) AS BIGINT)
                             AS nc
                  FROM cu),
            b AS (SELECT SUM(CAST(mb AS HUGEINT) * (mb - 1)) AS gb,
                         CAST(SUM(mb) AS HUGEINT) AS m
                  FROM (SELECT br, CAST(SUM(c) AS BIGINT) AS mb
                        FROM cb GROUP BY 1))
            SELECT p.nc AS n_customers_multi,
                   CAST(p.pairs AS BIGINT) AS n_pairs,
                   CAST(s.same AS BIGINT) AS same_brand_pairs,
                   CAST(10000 * s.same // p.pairs AS BIGINT)
                       AS rate_bps,
                   CAST(10000 * b.gb // (b.m * (b.m - 1)) AS BIGINT)
                       AS global_bps,
                   CAST(1000 * s.same * b.m * (b.m - 1)
                        // (p.pairs * b.gb) AS BIGINT) AS lift_milli
            FROM s, p, b
        """,
        "supplier_cr_ratios": """
            WITH r AS (SELECT l_suppkey AS sk,
                              SUM(CAST(FLOOR(l_extendedprice
                                   * (1 - l_discount) * 100)
                                   AS BIGINT)) AS rev
                       FROM lineitem GROUP BY 1),
            j AS (SELECT s.s_nationkey AS nk, r.sk, r.rev
                  FROM r JOIN supplier s ON r.sk = s.s_suppkey),
            w AS (SELECT nk, rev,
                         ROW_NUMBER() OVER (PARTITION BY nk
                                            ORDER BY rev DESC, sk)
                             AS rn
                  FROM j)
            SELECT CAST(nk AS BIGINT) AS s_nationkey,
                   CAST(COUNT(*) AS BIGINT) AS n_suppliers,
                   CAST(SUM(rev) AS BIGINT) AS rev_cents,
                   CAST(10000 * COALESCE(SUM(rev) FILTER (rn <= 1),
                                         0)
                        // SUM(rev) AS BIGINT) AS cr1_bps,
                   CAST(10000 * COALESCE(SUM(rev) FILTER (rn <= 4),
                                         0)
                        // SUM(rev) AS BIGINT) AS cr4_bps,
                   CAST(10000 * COALESCE(SUM(rev) FILTER (rn <= 8),
                                         0)
                        // SUM(rev) AS BIGINT) AS cr8_bps
            FROM w GROUP BY nk ORDER BY s_nationkey
        """,
        "events_group_sequential": """
            WITH d AS (SELECT epoch_us(ts) // 86400000000 AS dy,
                              user_id % 2 AS arm,
                              CAST(FLOOR(value * 100) AS BIGINT) AS v
                       FROM events),
            rng AS (SELECT MIN(dy) AS lo,
                           MAX(dy) - MIN(dy) + 1 AS spn
                    FROM d),
            c AS (SELECT arm,
                         LEAST((dy - lo) * 4 // spn, 3) AS qi, v
                  FROM d, rng),
            looks AS (SELECT unnest([1, 2, 3, 4]) AS k),
            m AS (SELECT looks.k, arm,
                         CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(v) AS HUGEINT) AS s,
                         SUM(CAST(v AS HUGEINT) * v) AS q
                  FROM c, looks WHERE qi < looks.k GROUP BY 1, 2),
            w AS (SELECT a1.k,
                         a0.n AS n0, a0.s AS s0,
                         a0.n * a0.q - a0.s * a0.s AS va0,
                         a1.n AS n1, a1.s AS s1,
                         a1.n * a1.q - a1.s * a1.s AS va1
                  FROM m a0 JOIN m a1 ON a0.k = a1.k
                  WHERE a0.arm = 0 AND a1.arm = 1),
            z AS (SELECT k, n0, n1,
                         CAST(FLOOR((CAST(s1 AS DOUBLE) / n1
                                     - CAST(s0 AS DOUBLE) / n0)
                              / SQRT(CAST(va1 AS DOUBLE)
                                     / ((n1 - 1) * n1 * n1)
                                     + CAST(va0 AS DOUBLE)
                                     / ((n0 - 1) * n0 * n0))
                              * 1000.0) AS BIGINT) AS zm
                  FROM w),
            b AS (SELECT unnest([1, 2, 3, 4]) AS k,
                         unnest([4333, 2963, 2359, 2014]) AS bd)
            SELECT CAST(z.k AS BIGINT) AS look,
                   CAST(n0 AS BIGINT) AS n_arm0,
                   CAST(n1 AS BIGINT) AS n_arm1,
                   zm AS z_milli,
                   CAST(bd AS BIGINT) AS boundary_milli,
                   CAST(CASE WHEN ABS(zm) >= bd THEN 1 ELSE 0 END
                        AS BIGINT) AS crossed
            FROM z JOIN b ON z.k = b.k ORDER BY look
        """,
        "lineitem_ansari_bradley": """
            WITH d AS (SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS q,
                              CASE WHEN l_linestatus = 'F'
                                   THEN 1 ELSE 0 END AS isf
                       FROM lineitem),
            h AS (SELECT q, CAST(SUM(1 - isf) AS BIGINT) AS co,
                         CAST(SUM(isf) AS BIGINT) AS cf
                  FROM d GROUP BY 1),
            nn AS (SELECT CAST(SUM(co + cf) AS BIGINT) AS n FROM h),
            r AS (SELECT q, co, co + cf AS ct,
                         SUM(co + cf) OVER (ORDER BY q
                             ROWS UNBOUNDED PRECEDING) - (co + cf)
                             AS sm
                  FROM h),
            s AS (SELECT co, ct,
                         LEAST(2 * sm + ct + 1,
                               2 * (nn.n + 1)
                               - (2 * sm + ct + 1)) AS score
                  FROM r, nn),
            a AS (SELECT CAST(SUM(score * co) AS HUGEINT) AS ab_o,
                         CAST(SUM(score * ct) AS HUGEINT) AS ab_tot,
                         CAST(SUM(co) AS HUGEINT) AS n_o
                  FROM s)
            SELECT CAST(a.n_o AS BIGINT) AS n_o,
                   CAST(nn.n - a.n_o AS BIGINT) AS n_f,
                   CAST(a.ab_o AS BIGINT) AS ab2_o,
                   CAST(a.ab_tot AS BIGINT) AS ab2_total,
                   CAST(nn.n * a.ab_o - a.n_o * a.ab_tot AS BIGINT)
                       AS dev_num,
                   CAST(1000 * nn.n * a.ab_o
                        // (a.n_o * a.ab_tot) - 1000 AS BIGINT)
                       AS lift_milli
            FROM a, nn
        """,
        "user_dow_habit": """
            WITH c AS (SELECT user_id AS u,
                              (epoch_us(ts) // 86400000000 + 3) % 7
                                  AS dw,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM events GROUP BY 1, 2),
            p AS (SELECT u, CAST(SUM(c) AS BIGINT) AS tot,
                         CAST(MAX(c) AS BIGINT) AS mx
                  FROM c GROUP BY 1),
            b AS (SELECT CASE WHEN tot < 7 THEN 0
                              WHEN 10000 * mx // tot < 2000 THEN 1
                              WHEN 10000 * mx // tot < 4000 THEN 2
                              WHEN 10000 * mx // tot < 7000 THEN 3
                              ELSE 4 END AS band
                  FROM p),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b)
            SELECT CAST(band AS BIGINT) AS band,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(10000 * COUNT(*) // t.n AS BIGINT)
                       AS share_bps
            FROM b, t GROUP BY band, t.n ORDER BY band
        """,
        "dedup_cross_source_census": """
            WITH g AS (SELECT md5(text) AS h,
                              CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(COUNT(DISTINCT source) AS BIGINT)
                                  AS ns
                       FROM documents GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
                         CAST(COUNT(*) FILTER (n >= 2) AS BIGINT)
                             AS gd,
                         CAST(COALESCE(SUM(n) FILTER (n >= 2), 0)
                              AS BIGINT) AS dd,
                         CAST(COUNT(*) FILTER (n >= 2 AND ns >= 2)
                              AS BIGINT) AS cg,
                         CAST(COALESCE(SUM(n) FILTER (
                              n >= 2 AND ns >= 2), 0) AS BIGINT)
                             AS cd
                  FROM g)
            SELECT n_docs, gd AS n_groups_dup, dd AS n_docs_dup,
                   cg AS cross_groups, cd AS cross_docs,
                   CAST(CASE WHEN gd > 0 THEN 10000 * cg // gd
                        ELSE -1 END AS BIGINT) AS cross_share_bps
            FROM t
        """,
        "customer_value_trend_census": """
            WITH o AS (SELECT o_custkey AS ck,
                              CAST(FLOOR(o_totalprice * 100)
                                   AS BIGINT) AS y,
                              ROW_NUMBER() OVER (
                                  PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey)
                                  - 1 AS x
                       FROM orders),
            p AS (SELECT ck, CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(y) AS HUGEINT) AS sy,
                         CAST(SUM(x * y) AS HUGEINT) AS sxy
                  FROM o GROUP BY 1),
            b AS (SELECT CASE WHEN n < 3 THEN 0
                              WHEN n * sxy - (n * (n - 1) // 2) * sy
                                   > 0 THEN 1
                              WHEN n * sxy - (n * (n - 1) // 2) * sy
                                   < 0 THEN 3
                              ELSE 2 END AS band
                  FROM p),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM b)
            SELECT CAST(band AS BIGINT) AS band,
                   CASE band WHEN 0 THEN 'few' WHEN 1 THEN 'up'
                        WHEN 2 THEN 'flat' ELSE 'down' END AS trend,
                   CAST(COUNT(*) AS BIGINT) AS n_customers,
                   CAST(10000 * COUNT(*) // t.tot AS BIGINT)
                       AS share_bps
            FROM b, t GROUP BY band, t.tot ORDER BY band
        """,
        "brand_mix_drift_series": """
            WITH b AS (SELECT datediff('month', DATE '1970-01-01',
                                       CAST(l_shipdate AS DATE))
                                  AS mo,
                              p.p_brand AS br,
                              CAST(FLOOR(l_extendedprice
                                   * (1 - l_discount) * 100)
                                   AS BIGINT) AS rev
                       FROM lineitem l
                       JOIN part p ON l.l_partkey = p.p_partkey),
            g AS (SELECT mo, br, CAST(SUM(rev) AS BIGINT) AS x
                  FROM b GROUP BY 1, 2),
            ms AS (SELECT DISTINCT mo FROM g),
            bs AS (SELECT DISTINCT p_brand AS br FROM part),
            f AS (SELECT ms.mo, bs.br, COALESCE(g.x, 0) AS x
                  FROM ms CROSS JOIN bs
                  LEFT JOIN g ON g.mo = ms.mo AND g.br = bs.br),
            t AS (SELECT mo, CAST(SUM(x) AS BIGINT) AS tot
                  FROM f GROUP BY 1),
            mr AS (SELECT mo, ROW_NUMBER() OVER (ORDER BY mo) AS ri
                   FROM ms),
            pairs AS (SELECT a.mo AS m0, b2.mo AS m1
                      FROM mr a JOIN mr b2 ON b2.ri = a.ri + 1),
            tv AS (SELECT p.m1,
                          SUM(ABS(CAST(f0.x AS HUGEINT) * t1.tot
                                  - CAST(f1.x AS HUGEINT) * t0.tot))
                              AS num,
                          t0.tot AS tot0, t1.tot AS tot1
                   FROM pairs p
                   JOIN f f0 ON f0.mo = p.m0
                   JOIN f f1 ON f1.mo = p.m1 AND f1.br = f0.br
                   JOIN t t0 ON t0.mo = p.m0
                   JOIN t t1 ON t1.mo = p.m1
                   GROUP BY 1, t0.tot, t1.tot)
            SELECT CAST(m1 AS BIGINT) AS month,
                   tot0 AS prev_cents, tot1 AS cur_cents,
                   CAST(10000 * num
                        // (2 * CAST(tot0 AS HUGEINT) * tot1)
                        AS BIGINT) AS tv_bps
            FROM tv ORDER BY month
        """,
        "events_dwell_runs": """
            WITH s AS (SELECT user_id, event_type,
                              ROW_NUMBER() OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id)
                            - ROW_NUMBER() OVER (
                                  PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rid
                       FROM events),
            r AS (SELECT event_type,
                         CAST(COUNT(*) AS BIGINT) AS ln
                  FROM s GROUP BY user_id, event_type, rid)
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_runs,
                   CAST(SUM(ln) AS BIGINT) AS n_events,
                   CAST(MAX(ln) AS BIGINT) AS max_run,
                   CAST(1000 * SUM(ln) // COUNT(*) AS BIGINT)
                       AS mean_dwell_milli
            FROM r GROUP BY event_type ORDER BY event_type
        """,
        "events_conformal_coverage": """
            WITH d AS (SELECT event_type AS et, event_id % 2 AS par,
                              CAST(FLOOR(value * 100) AS BIGINT) AS v
                       FROM events),
            h AS (SELECT et, par, v, CAST(COUNT(*) AS BIGINT) AS c
                  FROM d GROUP BY 1, 2, 3),
            calm AS (SELECT et, CAST(SUM(c) AS BIGINT) AS n_cal,
                            CAST(SUM(v * c) AS BIGINT) AS s_cal
                     FROM h WHERE par = 0 GROUP BY 1),
            calr AS (SELECT h.et,
                            ABS(CAST(calm.n_cal AS HUGEINT) * h.v
                                - calm.s_cal) AS r,
                            h.c
                     FROM h JOIN calm ON h.et = calm.et
                     WHERE h.par = 0),
            cw AS (SELECT et, r,
                          SUM(c) OVER (PARTITION BY et ORDER BY r
                                       ROWS UNBOUNDED PRECEDING)
                              AS cum
                   FROM calr),
            q AS (SELECT cw.et, MIN(cw.r) AS q_hat
                  FROM cw JOIN calm ON cw.et = calm.et
                  WHERE cw.cum >= LEAST(
                      (9 * (calm.n_cal + 1) + 9) // 10, calm.n_cal)
                  GROUP BY 1),
            tst AS (SELECT h.et,
                           ABS(CAST(calm.n_cal AS HUGEINT) * h.v
                               - calm.s_cal) AS r,
                           h.c
                    FROM h JOIN calm ON h.et = calm.et
                    WHERE h.par = 1),
            agg AS (SELECT tst.et,
                           CAST(SUM(c) AS BIGINT) AS n_test,
                           CAST(SUM(CASE WHEN r <= q.q_hat THEN c
                                    ELSE 0 END) AS BIGINT) AS cov
                    FROM tst JOIN q ON tst.et = q.et GROUP BY 1)
            SELECT calm.et AS event_type, calm.n_cal,
                   agg.n_test, agg.cov AS n_covered,
                   CAST(10000 * agg.cov // agg.n_test AS BIGINT)
                       AS coverage_bps,
                   CAST(9000 AS BIGINT) AS nominal_bps
            FROM calm JOIN agg ON calm.et = agg.et
            ORDER BY event_type
        """,
        "lineitem_cluster_deff": """
            WITH p AS (SELECT l_orderkey AS ok,
                              CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(SUM(CAST(FLOOR(l_quantity)
                                   AS BIGINT)) AS BIGINT) AS s,
                              CAST(SUM(CAST(FLOOR(l_quantity)
                                   AS BIGINT)
                                   * CAST(FLOOR(l_quantity)
                                          AS BIGINT)) AS BIGINT)
                                  AS q2
                       FROM lineitem GROUP BY 1),
            g AS (SELECT CAST(SUM(n) AS HUGEINT) AS n,
                         CAST(COUNT(*) AS HUGEINT) AS k,
                         CAST(SUM(s) AS HUGEINT) AS st
                  FROM p),
            mb AS (SELECT 1000 * st // n AS mbar FROM g),
            cells AS (SELECT p.n AS ng, p.s, p.q2,
                             1000 * p.s // p.n AS mg
                      FROM p),
            ss AS (SELECT SUM(CAST(ng AS HUGEINT)
                              * (mg - mb.mbar) * (mg - mb.mbar))
                              AS ssb,
                          SUM(1000000 * CAST(q2 AS HUGEINT)
                              - 2 * CAST(mg AS HUGEINT) * 1000 * s
                              + CAST(ng AS HUGEINT) * mg * mg)
                              AS ssw
                   FROM cells, mb),
            f AS (SELECT g.n, g.k, ss.ssb, ss.ssw,
                         g.k - 1 AS dfb, g.n - g.k AS dfw
                  FROM g, ss),
            ic AS (SELECT n, k, ssb, ssw,
                          k * (ssb * dfw - ssw * dfb) AS num,
                          k * ssb * dfw + (n - k) * ssw * dfb
                              AS den
                   FROM f),
            icc AS (SELECT n, k, ssb, ssw,
                           (CASE WHEN num > 0 THEN 1
                                 WHEN num < 0 THEN -1 ELSE 0 END)
                           * ((1000 * ABS(num)) // den) AS icc_milli
                    FROM ic),
            dd AS (SELECT n, k, ssb, ssw, icc_milli,
                          1000 * n // k AS mcl,
                          (1000 * n // k - 1000) * icc_milli AS tt
                   FROM icc)
            SELECT CAST(n AS BIGINT) AS n_lines,
                   CAST(k AS BIGINT) AS n_orders,
                   CAST(ssb // 1000000 AS BIGINT) AS ssb_sc,
                   CAST(ssw // 1000000 AS BIGINT) AS ssw_sc,
                   CAST(icc_milli AS BIGINT) AS icc_milli,
                   CAST(mcl AS BIGINT) AS mean_cluster_milli,
                   CAST(1000 + (CASE WHEN tt > 0 THEN 1
                                WHEN tt < 0 THEN -1 ELSE 0 END)
                        * (ABS(tt) // 1000) AS BIGINT)
                       AS deff_milli
            FROM dd
        """,
        "embedding_norm2_anova": """
            WITH q AS (SELECT vec_id, label,
                              CAST(FLOOR(CAST(unnest(embedding)
                                              AS DOUBLE)
                                         * 1000000.0) AS BIGINT)
                                  AS qv
                       FROM embeddings),
            v AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                         SUM(CAST(qv AS HUGEINT) * qv)
                             // 1000000000 AS ns2
                  FROM q GROUP BY 1, 2),
            g AS (SELECT label, CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(ns2) AS HUGEINT) AS s,
                         SUM(CAST(ns2 AS HUGEINT) * ns2) AS q2
                  FROM v GROUP BY 1),
            t AS (SELECT SUM(n) AS n, SUM(s) AS st,
                         CAST(COUNT(*) AS HUGEINT) AS k
                  FROM g),
            mb AS (SELECT 1000 * st // n AS mbar FROM t),
            cm AS (SELECT g.n AS ng, g.s, g.q2,
                          1000 * g.s // g.n AS mi
                   FROM g),
            ss AS (SELECT SUM(ng * (mi - mb.mbar) * (mi - mb.mbar))
                              AS ssb,
                          SUM(1000000 * q2 - 2 * mi * 1000 * s
                              + ng * mi * mi) AS ssw
                   FROM cm, mb)
            SELECT CAST(t.n AS BIGINT) AS n_vecs,
                   CAST(t.k AS BIGINT) AS n_labels,
                   CAST(ss.ssb // 1000000 AS BIGINT) AS ssb_sc,
                   CAST(ss.ssw // 1000000 AS BIGINT) AS ssw_sc,
                   CAST(1000 * ss.ssb * (t.n - t.k)
                        // (ss.ssw * (t.k - 1)) AS BIGINT)
                       AS f_milli,
                   CAST(10000 * ss.ssb // (ss.ssb + ss.ssw)
                        AS BIGINT) AS eta2_bps
            FROM t, ss
        """,
        "orders_weekend_ks_dominance": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE))
                                  AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS cents
                       FROM orders GROUP BY 1),
            v AS (SELECT cents,
                         CASE WHEN (dy + 3) % 7 >= 5
                              THEN 1 ELSE 0 END AS we
                  FROM d),
            h AS (SELECT cents, CAST(SUM(we) AS BIGINT) AS cwe,
                         CAST(SUM(1 - we) AS BIGINT) AS cwd
                  FROM v GROUP BY 1),
            t AS (SELECT CAST(SUM(cwe) AS BIGINT) AS nwe,
                         CAST(SUM(cwd) AS BIGINT) AS nwd
                  FROM h),
            r AS (SELECT SUM(cwd) OVER (ORDER BY cents
                              ROWS UNBOUNDED PRECEDING) * t.nwe
                        - SUM(cwe) OVER (ORDER BY cents
                              ROWS UNBOUNDED PRECEDING) * t.nwd
                            AS gap
                  FROM h, t),
            a AS (SELECT CAST(MAX(gap) AS BIGINT) AS dp,
                         CAST(MAX(-gap) AS BIGINT) AS dm
                  FROM r)
            SELECT t.nwd AS n_weekday, t.nwe AS n_weekend,
                   a.dp AS d_plus_num, a.dm AS d_minus_num,
                   CAST(1000 * GREATEST(a.dp, 0)
                        // (t.nwd * t.nwe) AS BIGINT)
                       AS d_plus_milli,
                   CAST(1000 * GREATEST(a.dm, 0)
                        // (t.nwd * t.nwe) AS BIGINT)
                       AS d_minus_milli,
                   CAST(1000 * GREATEST(a.dp, a.dm)
                        // (t.nwd * t.nwe) AS BIGINT) AS d_milli
            FROM t, a
        """,
        "user_early_signal_corr": """
            WITH e AS (SELECT user_id AS u,
                              epoch_us(ts) // 86400000000 AS d
                       FROM events),
            f AS (SELECT u, MIN(d) AS fd,
                         CAST(COUNT(*) AS BIGINT) AS tot
                  FROM e GROUP BY 1),
            c7 AS (SELECT e.u, CAST(COUNT(*) AS BIGINT) AS early
                   FROM e JOIN f ON e.u = f.u
                   WHERE e.d <= f.fd + 6 GROUP BY 1),
            j AS (SELECT f.u, c7.early AS x, f.tot AS y
                  FROM f JOIN c7 ON f.u = c7.u),
            m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(x) AS HUGEINT) AS sx,
                         CAST(SUM(y) AS HUGEINT) AS sy,
                         SUM(CAST(x AS HUGEINT) * x) AS sxx,
                         SUM(CAST(y AS HUGEINT) * y) AS syy,
                         SUM(CAST(x AS HUGEINT) * y) AS sxy
                  FROM j),
            g AS (SELECT n, sx, sy,
                         n * sxy - sx * sy AS num,
                         n * sxx - sx * sx AS va,
                         n * syy - sy * sy AS vb
                  FROM m)
            SELECT CAST(n AS BIGINT) AS n_users,
                   CAST(sx AS BIGINT) AS sum_early,
                   CAST(sy AS BIGINT) AS sum_total,
                   CAST(num AS BIGINT) AS cov_num,
                   CAST(va AS BIGINT) AS var_early,
                   CAST(vb AS BIGINT) AS var_total,
                   CAST(CASE WHEN va > 0 AND vb > 0 THEN
                        FLOOR(CAST(num AS DOUBLE)
                              / (SQRT(CAST(va AS DOUBLE))
                                 * SQRT(CAST(vb AS DOUBLE)))
                              * 1000.0)
                        ELSE 0 END AS BIGINT) AS r_milli
            FROM g
        """,
        "orders_pacf2": """
            WITH d AS (SELECT datediff('day', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE))
                                  AS dy,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS cents
                       FROM orders GROUP BY 1),
            rng AS (SELECT MIN(dy) AS mn, MAX(dy) AS mx FROM d),
            grid AS (SELECT u.dy FROM rng,
                     UNNEST(generate_series(mn, mx)) AS u(dy)),
            v AS (SELECT grid.dy,
                         COALESCE(d.cents, 0) // 100000000 AS x
                  FROM grid LEFT JOIN d ON d.dy = grid.dy),
            st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(x) AS BIGINT) AS s FROM v),
            y AS (SELECT dy,
                         CAST(st.n * x - st.s AS HUGEINT) AS yv
                  FROM v, st),
            w AS (SELECT yv,
                         LEAD(yv, 1) OVER (ORDER BY dy) AS y1,
                         LEAD(yv, 2) OVER (ORDER BY dy) AS y2
                  FROM y),
            c AS (SELECT SUM(yv * yv) AS c0, SUM(yv * y1) AS c1,
                         SUM(yv * y2) AS c2
                  FROM w),
            f AS (SELECT st.n, c0, c1, c2,
                         c2 * c0 - c1 * c1 AS pnum,
                         c0 * c0 - c1 * c1 AS pden
                  FROM c, st)
            SELECT CAST(n AS BIGINT) AS n_days,
                   CAST(c0 AS BIGINT) AS c0,
                   CAST((CASE WHEN c1 > 0 THEN 1 WHEN c1 < 0 THEN -1
                         ELSE 0 END) * ((1000 * ABS(c1)) // c0)
                        AS BIGINT) AS rho1_milli,
                   CAST((CASE WHEN c2 > 0 THEN 1 WHEN c2 < 0 THEN -1
                         ELSE 0 END) * ((1000 * ABS(c2)) // c0)
                        AS BIGINT) AS rho2_milli,
                   CAST(CASE WHEN pden > 0 THEN
                        (CASE WHEN pnum > 0 THEN 1
                              WHEN pnum < 0 THEN -1 ELSE 0 END)
                        * ((1000 * ABS(pnum)) // pden)
                        ELSE -9999 END AS BIGINT) AS phi22_milli
            FROM f
        """,
        "lineitem_return_trend_ca": """
            WITH d AS (SELECT LEAST(GREATEST(
                                  (CAST(FLOOR(l_quantity) AS BIGINT)
                                   - 1) // 10, 0), 4) AS band,
                              CASE WHEN l_returnflag = 'R'
                                   THEN 1 ELSE 0 END AS ret
                       FROM lineitem),
            g AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(ret) AS BIGINT) AS r
                  FROM d GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS HUGEINT) AS nn,
                         CAST(SUM(r) AS HUGEINT) AS rr,
                         SUM(CAST(band AS HUGEINT) * r) AS swr,
                         SUM(CAST(band AS HUGEINT) * n) AS swn,
                         SUM(CAST(n AS HUGEINT) * band * band)
                             AS snw2
                  FROM g),
            f AS (SELECT nn, rr,
                         nn * swr - rr * swn AS num,
                         rr * (nn - rr)
                         * (nn * snw2 - swn * swn) AS den
                  FROM t)
            SELECT CAST(g.band AS BIGINT) AS band,
                   g.n AS n_lines, g.r AS n_returned,
                   CAST(10000 * g.r // g.n AS BIGINT) AS rate_bps,
                   CAST(f.num AS BIGINT) AS trend_num,
                   CAST(1000 * f.num * f.num * f.nn // f.den
                        AS BIGINT) AS z2_milli
            FROM g, f ORDER BY band
        """,
        "media_aspect_census": """
            WITH m AS (SELECT CAST(('0x' || substr(md5(text), 1, 15))
                                   AS UBIGINT) AS x
                       FROM documents),
            g AS (SELECT 64 + (x // 3) % 960 AS w,
                         64 + (x // 7) % 540 AS h
                  FROM m),
            b AS (SELECT CASE WHEN 1000 * w // h < 900 THEN 0
                              WHEN 1000 * w // h < 1112 THEN 1
                              WHEN 1000 * w // h < 1778 THEN 2
                              ELSE 3 END AS band
                  FROM g),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM b)
            SELECT CAST(band AS BIGINT) AS band,
                   CASE band WHEN 0 THEN 'portrait'
                        WHEN 1 THEN 'squarish'
                        WHEN 2 THEN 'landscape'
                        ELSE 'wide' END AS shape,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(10000 * COUNT(*) // t.tot AS BIGINT)
                       AS share_bps
            FROM b, t GROUP BY band, t.tot ORDER BY band
        """,
        "lineitem_tax_regressivity": """
            WITH d AS (SELECT CAST(FLOOR(l_extendedprice * 100)
                                   AS BIGINT) AS ep,
                              CAST(FLOOR(l_extendedprice * l_tax
                                         * 100) AS BIGINT) AS tax
                       FROM lineitem),
            g AS (SELECT ep // 10000 AS b,
                         CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(ep) AS BIGINT) AS base,
                         CAST(SUM(tax) AS BIGINT) AS tax
                  FROM d GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM g),
            r AS (SELECT b, n, base, tax,
                         SUM(n) OVER (ORDER BY b
                                      ROWS UNBOUNDED PRECEDING) - n
                             AS cum_prev
                  FROM g),
            a AS (SELECT LEAST(10 * cum_prev // t.nt, 9) AS decile,
                         n, base, tax
                  FROM r, t)
            SELECT CAST(decile AS BIGINT) AS decile,
                   CAST(SUM(n) AS BIGINT) AS n_lines,
                   CAST(SUM(base) AS BIGINT) AS base_cents,
                   CAST(SUM(tax) AS BIGINT) AS tax_cents,
                   CAST(10000 * SUM(tax) // SUM(base) AS BIGINT)
                       AS eff_tax_bps
            FROM a GROUP BY 1 ORDER BY 1
        """,
        "embedding_exact_dup_census": """
            WITH g AS (SELECT embedding,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM embeddings GROUP BY 1)
            SELECT CAST(SUM(c) AS BIGINT) AS n_vecs,
                   CAST(COUNT(*) FILTER (c >= 2) AS BIGINT)
                       AS n_groups_dup,
                   CAST(COALESCE(SUM(c) FILTER (c >= 2), 0)
                        AS BIGINT) AS n_dup_vecs,
                   CAST(MAX(c) AS BIGINT) AS max_group
            FROM g
        """,
        "lang_source_lift": """
            WITH g AS (SELECT lang, source,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM documents GROUP BY 1, 2),
            l AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS nl
                  FROM g GROUP BY 1),
            s AS (SELECT source, CAST(SUM(n) AS BIGINT) AS ns
                  FROM g GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM g)
            SELECT g.lang, g.source, g.n,
                   CAST(1000 * CAST(g.n AS HUGEINT) * t.nt
                        // (CAST(l.nl AS HUGEINT) * s.ns)
                        AS BIGINT) AS lift_milli
            FROM g JOIN l ON g.lang = l.lang
                 JOIN s ON g.source = s.source, t
            ORDER BY g.lang, g.source
        """,
        "lineitem_discount_moy": """
            WITH d AS (SELECT datediff('month', DATE '1970-01-01',
                                       CAST(l_shipdate AS DATE))
                              % 12 AS moy,
                              CAST(FLOOR(l_discount * 10000)
                                   AS BIGINT) AS disc
                       FROM lineitem),
            g AS (SELECT moy, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(disc) AS BIGINT) AS s
                  FROM d GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
                         CAST(SUM(s) AS BIGINT) AS st
                  FROM g)
            SELECT CAST(g.moy AS BIGINT) AS moy,
                   g.n AS n_lines, g.s AS sum_disc_bp,
                   CAST(g.s // g.n AS BIGINT) AS mean_disc_bp,
                   CAST(1000 * CAST(g.s AS HUGEINT) * t.nt
                        // (CAST(g.n AS HUGEINT) * t.st) - 1000
                        AS BIGINT) AS lift_milli
            FROM g, t ORDER BY moy
        """,
        "events_daily_basket_lift": """
            WITH b AS (SELECT DISTINCT
                              user_id * 32768
                              + (epoch_us(ts) // 86400000000)
                                % 32768 AS bk,
                              event_type AS et
                       FROM events),
            t AS (SELECT CAST(COUNT(DISTINCT bk) AS BIGINT) AS n
                  FROM b),
            s AS (SELECT et, CAST(COUNT(*) AS BIGINT) AS c
                  FROM b GROUP BY 1),
            p AS (SELECT a.et AS ta, b2.et AS tb,
                         CAST(COUNT(*) AS BIGINT) AS nab
                  FROM b a JOIN b b2 ON a.bk = b2.bk
                                    AND a.et < b2.et
                  GROUP BY 1, 2)
            SELECT p.ta AS type_a, p.tb AS type_b,
                   p.nab AS n_both, sa.c AS n_a, sb.c AS n_b,
                   CAST(1000 * CAST(p.nab AS HUGEINT) * t.n
                        // (CAST(sa.c AS HUGEINT) * sb.c)
                        AS BIGINT) AS lift_milli
            FROM p JOIN s sa ON sa.et = p.ta
                 JOIN s sb ON sb.et = p.tb, t
            ORDER BY type_a, type_b
        """,
        "lineitem_benford2": """
            WITH d AS (SELECT CAST(FLOOR(l_extendedprice * 100)
                                   AS BIGINT) AS v
                       FROM lineitem),
            f AS (SELECT CAST(substr(CAST(v AS VARCHAR), 2, 1)
                              AS BIGINT) AS d2
                  FROM d WHERE v >= 10),
            g AS (SELECT d2, CAST(COUNT(*) AS BIGINT) AS c
                  FROM f GROUP BY 1),
            grid AS (SELECT unnest(generate_series(0, 9)) AS d,
                            unnest([1197, 1139, 1088, 1043, 1003,
                                    967, 934, 904, 876, 850]) AS e),
            nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM g),
            t AS (SELECT grid.d, COALESCE(g.c, 0) AS o, grid.e,
                         nn.n,
                         1000 * CAST(10000 * COALESCE(g.c, 0)
                                     - nn.n * grid.e AS HUGEINT)
                         * (10000 * COALESCE(g.c, 0)
                            - nn.n * grid.e)
                         // (10000 * CAST(nn.n AS HUGEINT)
                             * grid.e) AS term
                  FROM grid LEFT JOIN g ON g.d2 = grid.d, nn),
            c2 AS (SELECT CAST(SUM(term) AS BIGINT) AS chi FROM t)
            SELECT CAST(t.d AS BIGINT) AS digit,
                   CAST(o AS BIGINT) AS n_obs,
                   CAST(10000 * o // n AS BIGINT) AS obs_bps,
                   CAST(e AS BIGINT) AS exp_bps,
                   CAST(term AS BIGINT) AS term_milli,
                   c2.chi AS chi2_milli
            FROM t, c2 ORDER BY digit
        """,
        "events_hour_drift": """
            WITH lat AS (SELECT unnest(generate_series(0, 23)) AS hr,
                                unnest([1000000, 965925, 866025,
                                        707106, 500000, 258819, 0,
                                        -258820, -500000, -707107,
                                        -866026, -965926, -1000000,
                                        -965926, -866026, -707107,
                                        -500001, -258820, -1, 258819,
                                        500000, 707106, 866025,
                                        965925]) AS cs,
                                unnest([0, 258819, 499999, 707106,
                                        866025, 965925, 1000000,
                                        965925, 866025, 707106,
                                        499999, 258819, 0, -258820,
                                        -500000, -707107, -866026,
                                        -965926, -1000000, -965926,
                                        -866026, -707107, -500001,
                                        -258820]) AS sn),
            sp AS (SELECT (MIN(epoch_us(ts) // 86400000000)
                           + MAX(epoch_us(ts) // 86400000000)) // 2
                              AS mid
                   FROM events),
            h AS (SELECT CASE WHEN epoch_us(ts) // 86400000000
                                   > sp.mid
                              THEN 1 ELSE 0 END AS hf,
                         (epoch_us(ts) // 3600000000) % 24 AS hr,
                         COUNT(*) AS n
                  FROM events, sp GROUP BY 1, 2),
            g AS (SELECT hv.hf, lat.hr, lat.cs, lat.sn,
                         COALESCE(h.n, 0) AS n
                  FROM (SELECT unnest([0, 1]) AS hf) hv
                  CROSS JOIN lat
                  LEFT JOIN h ON h.hf = hv.hf AND h.hr = lat.hr),
            s AS (SELECT hf,
                         SUM(CAST(n AS HUGEINT) * cs) AS sx,
                         SUM(CAST(n AS HUGEINT) * sn) AS sy,
                         CAST(SUM(n) AS BIGINT) AS n
                  FROM g GROUP BY 1),
            pk AS (SELECT s.hf,
                          (SELECT lat.hr FROM lat
                           ORDER BY CAST(lat.cs AS HUGEINT) * s.sx
                                    + CAST(lat.sn AS HUGEINT)
                                      * s.sy DESC, lat.hr
                           LIMIT 1) AS ph
                   FROM s),
            f AS (SELECT s0.n AS n0, s1.n AS n1,
                         p0.ph AS ph0, p1.ph AS ph1,
                         s0.sx * s1.sx + s0.sy * s1.sy AS num,
                         s0.sx * s0.sx + s0.sy * s0.sy AS d0,
                         s1.sx * s1.sx + s1.sy * s1.sy AS d1
                  FROM s s0, s s1, pk p0, pk p1
                  WHERE s0.hf = 0 AND s1.hf = 1
                    AND p0.hf = 0 AND p1.hf = 1)
            SELECT CAST(n0 AS BIGINT) AS n_first,
                   CAST(n1 AS BIGINT) AS n_second,
                   CAST(ph0 AS BIGINT) AS peak_h0,
                   CAST(ph1 AS BIGINT) AS peak_h1,
                   CAST(FLOOR(CAST(num AS DOUBLE)
                        / (SQRT(CAST(d0 AS DOUBLE))
                           * SQRT(CAST(d1 AS DOUBLE)))
                        * 1000.0) AS BIGINT) AS cos_milli
            FROM f
        """,
        "user_pareto_8020": """
            WITH c AS (SELECT user_id AS u,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM events GROUP BY 1),
            r AS (SELECT c,
                         ROW_NUMBER() OVER (ORDER BY c DESC, u)
                             AS rn
                  FROM c),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu,
                         CAST(SUM(c) AS BIGINT) AS tot
                  FROM r)
            SELECT t.nu AS n_users, t.tot AS n_events,
                   CAST((t.nu + 4) // 5 AS BIGINT) AS k20,
                   CAST(SUM(c) FILTER (rn <= (t.nu + 4) // 5)
                        AS BIGINT) AS top20_events,
                   CAST(10000 * SUM(c) FILTER (
                        rn <= (t.nu + 4) // 5) // t.tot AS BIGINT)
                       AS top20_bps,
                   CAST((t.nu + 99) // 100 AS BIGINT) AS k1,
                   CAST(SUM(c) FILTER (rn <= (t.nu + 99) // 100)
                        AS BIGINT) AS top1_events,
                   CAST(10000 * SUM(c) FILTER (
                        rn <= (t.nu + 99) // 100) // t.tot
                        AS BIGINT) AS top1_bps
            FROM r, t GROUP BY t.nu, t.tot
        """,
        "brand_type_coverage": """
            WITH g AS (SELECT p_brand AS br, p_type AS ty,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM part GROUP BY 1, 2),
            t AS (SELECT CAST(COUNT(DISTINCT br) AS BIGINT) AS nb,
                         CAST(COUNT(DISTINCT ty) AS BIGINT) AS nt,
                         CAST(COUNT(*) AS BIGINT) AS occ,
                         CAST(SUM(n) AS BIGINT) AS total
                  FROM g)
            SELECT nb AS n_brands, nt AS n_types,
                   CAST(nb * nt AS BIGINT) AS n_possible,
                   occ AS n_occupied,
                   CAST(nb * nt - occ AS BIGINT) AS n_holes,
                   CAST(10000 * occ // (nb * nt) AS BIGINT)
                       AS occupied_bps,
                   CAST(1000 * total // occ AS BIGINT)
                       AS mean_per_cell_milli
            FROM t
        """,
        "part_price_points": """
            WITH g AS (SELECT CAST(FLOOR(p_retailprice * 100)
                                   AS BIGINT) AS cents,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM part GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM g),
            r AS (SELECT cents, n,
                         ROW_NUMBER() OVER (ORDER BY n DESC, cents)
                             AS rk
                  FROM g)
            SELECT CAST(rk AS BIGINT) AS rk, cents,
                   n AS n_parts,
                   CAST(10000 * n // t.tot AS BIGINT) AS share_bps
            FROM r, t WHERE rk <= 10 ORDER BY rk
        """,
        "user_decile_migration": """
            WITH sp AS (SELECT (MIN(epoch_us(ts) // 86400000000)
                                + MAX(epoch_us(ts) // 86400000000))
                               // 2 AS mid
                        FROM events),
            p AS (SELECT user_id AS u,
                         CASE WHEN epoch_us(ts) // 86400000000
                                   > sp.mid THEN 1 ELSE 0 END AS hf,
                         CAST(SUM(CAST(FLOOR(value * 100)
                                       AS BIGINT)) AS BIGINT) AS v
                  FROM events, sp GROUP BY 1, 2),
            r AS (SELECT u, hf,
                         10 * (ROW_NUMBER() OVER (
                             PARTITION BY hf
                             ORDER BY v DESC, u) - 1)
                         // (COUNT(*) OVER (PARTITION BY hf))
                             AS dec
                  FROM p),
            j AS (SELECT a.dec AS f, b.dec AS t
                  FROM r a JOIN r b ON a.u = b.u
                  WHERE a.hf = 0 AND b.hf = 1)
            SELECT CAST(f AS BIGINT) AS from_decile,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(10000 * SUM(CASE WHEN t = f THEN 1
                                    ELSE 0 END) // COUNT(*)
                        AS BIGINT) AS stay_bps,
                   CAST(1000 * SUM(ABS(t - f)) // COUNT(*)
                        AS BIGINT) AS mean_abs_move_milli
            FROM j GROUP BY f ORDER BY from_decile
        """,
        "events_weekend_mix_shift": """
            WITH d AS (SELECT event_type AS et,
                              CASE WHEN (epoch_us(ts)
                                         // 86400000000 + 3) % 7
                                        >= 5
                                   THEN 1 ELSE 0 END AS we
                       FROM events),
            g AS (SELECT et, we, CAST(COUNT(*) AS BIGINT) AS n
                  FROM d GROUP BY 1, 2),
            t AS (SELECT CAST(COALESCE(SUM(n) FILTER (we = 0), 0)
                              AS BIGINT) AS nwd,
                         CAST(COALESCE(SUM(n) FILTER (we = 1), 0)
                              AS BIGINT) AS nwe
                  FROM g),
            w AS (SELECT et,
                         CAST(COALESCE(SUM(n) FILTER (we = 0), 0)
                              AS BIGINT) AS a,
                         CAST(COALESCE(SUM(n) FILTER (we = 1), 0)
                              AS BIGINT) AS b
                  FROM g GROUP BY 1)
            SELECT w.et AS event_type,
                   w.a AS n_weekday, w.b AS n_weekend,
                   CAST(10000 * w.a // t.nwd AS BIGINT)
                       AS wd_share_bps,
                   CAST(10000 * w.b // t.nwe AS BIGINT)
                       AS we_share_bps,
                   CAST(CASE WHEN w.a > 0 AND t.nwe > 0 THEN
                        1000 * CAST(w.b AS HUGEINT) * t.nwd
                        // (CAST(w.a AS HUGEINT) * t.nwe) - 1000
                        ELSE -9999 END AS BIGINT) AS shift_milli
            FROM w, t ORDER BY event_type
        """,
        "brand_edge_affinity": """
            WITH s AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
                              l_partkey AS pk
                       FROM lineitem),
            o AS (SELECT ok, pk,
                         LAG(pk) OVER (PARTITION BY ok
                                       ORDER BY ln, pk) AS prev
                  FROM s),
            ed AS (SELECT DISTINCT LEAST(pk, prev) AS a,
                          GREATEST(pk, prev) AS b
                   FROM o WHERE prev IS NOT NULL AND pk <> prev),
            mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM ed),
            be AS (SELECT b1.p_brand AS ba, b2.p_brand AS bb
                   FROM ed JOIN part b1 ON ed.a = b1.p_partkey
                           JOIN part b2 ON ed.b = b2.p_partkey),
            deg AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS d
                    FROM (SELECT ba AS brand FROM be
                          UNION ALL SELECT bb FROM be)
                    GROUP BY 1),
            p AS (SELECT LEAST(ba, bb) AS x, GREATEST(ba, bb) AS y,
                         CAST(COUNT(*) AS BIGINT) AS e
                  FROM be WHERE ba <> bb GROUP BY 1, 2),
            r AS (SELECT p.x AS brand_a, p.y AS brand_b,
                         p.e AS n_edges, da.d AS deg_a,
                         db.d AS deg_b,
                         CAST(1000 * CAST(p.e AS HUGEINT) * 2 * mm.m
                              // (CAST(da.d AS HUGEINT) * db.d)
                              AS BIGINT) AS lift_milli,
                         ROW_NUMBER() OVER (ORDER BY p.e DESC,
                                            p.x, p.y) AS rk
                  FROM p JOIN deg da ON da.brand = p.x
                       JOIN deg db ON db.brand = p.y, mm)
            SELECT brand_a, brand_b, n_edges, deg_a, deg_b,
                   lift_milli, CAST(rk AS BIGINT) AS rk
            FROM r WHERE rk <= 10 ORDER BY rk
        """,
        "user_night_owl_census": """
            WITH e AS (SELECT user_id AS u,
                              CASE WHEN (epoch_us(ts) // 3600000000)
                                        % 24 >= 22
                                     OR (epoch_us(ts) // 3600000000)
                                        % 24 < 6
                                   THEN 1 ELSE 0 END AS ni
                       FROM events),
            p AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS tot,
                         CAST(SUM(ni) AS BIGINT) AS nn
                  FROM e GROUP BY 1),
            b AS (SELECT CASE WHEN tot < 7 THEN 0
                              WHEN 10000 * nn // tot < 1000 THEN 1
                              WHEN 10000 * nn // tot < 3000 THEN 2
                              WHEN 10000 * nn // tot < 6000 THEN 3
                              ELSE 4 END AS band
                  FROM p),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b)
            SELECT CAST(band AS BIGINT) AS band,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(10000 * COUNT(*) // t.n AS BIGINT)
                       AS share_bps
            FROM b, t GROUP BY band, t.n ORDER BY band
        """,
        "embedding_knn_confusion": """
            WITH q AS (SELECT vec_id, embedding FROM embeddings
                       WHERE vec_id % 4 = 0),
            top AS (SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                       CAST(FLOOR(list_cosine_similarity(
                           CAST(q.embedding AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) * 10000)
                           AS BIGINT) AS sim_bp
                FROM q, embeddings e WHERE e.vec_id != q.vec_id)
              QUALIFY row_number() OVER (
                  PARTITION BY query_id
                  ORDER BY sim_bp DESC, neighbor_id) <= 1),
            j AS (SELECT CAST(ql.label AS BIGINT) AS t,
                         CAST(nl.label AS BIGINT) AS p
                  FROM top
                  JOIN embeddings ql ON ql.vec_id = top.query_id
                  JOIN embeddings nl ON nl.vec_id = top.neighbor_id),
            g AS (SELECT t, p, CAST(COUNT(*) AS BIGINT) AS n
                  FROM j GROUP BY 1, 2),
            r AS (SELECT t, CAST(SUM(n) AS BIGINT) AS rt
                  FROM g GROUP BY 1)
            SELECT g.t AS true_label, g.p AS pred_label, g.n,
                   CAST(10000 * g.n // r.rt AS BIGINT) AS row_bps
            FROM g JOIN r ON g.t = r.t
            ORDER BY true_label, pred_label
        """,
        "orders_status_year_mix": """
            WITH d AS (SELECT datediff('year', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE))
                              + 1970 AS yr,
                              o_orderstatus AS st
                       FROM orders),
            g AS (SELECT yr, st, CAST(COUNT(*) AS BIGINT) AS n
                  FROM d GROUP BY 1, 2),
            y AS (SELECT yr, CAST(SUM(n) AS BIGINT) AS ny
                  FROM g GROUP BY 1),
            s AS (SELECT st, CAST(SUM(n) AS BIGINT) AS ns
                  FROM g GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM g)
            SELECT CAST(g.yr AS BIGINT) AS year, g.st AS status,
                   g.n,
                   CAST(10000 * g.n // y.ny AS BIGINT)
                       AS year_share_bps,
                   CAST(1000 * CAST(g.n AS HUGEINT) * t.nt
                        // (CAST(y.ny AS HUGEINT) * s.ns) - 1000
                        AS BIGINT) AS lift_milli
            FROM g JOIN y ON g.yr = y.yr
                 JOIN s ON g.st = s.st, t
            ORDER BY year, status
        """,
        "orders_size_slope": """
            WITH x AS (SELECT l_orderkey AS ok,
                              CAST(COUNT(*) AS BIGINT) AS x
                       FROM lineitem GROUP BY 1),
            j AS (SELECT x.x,
                         CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)
                             AS y
                  FROM x JOIN orders o ON x.ok = o.o_orderkey),
            m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(x) AS HUGEINT) AS sx,
                         CAST(SUM(y) AS HUGEINT) AS sy,
                         SUM(CAST(x AS HUGEINT) * x) AS sxx,
                         SUM(CAST(x AS HUGEINT) * y) AS sxy
                  FROM j),
            f AS (SELECT n, sx, sy,
                         n * sxx - sx * sx AS den,
                         n * sxy - sx * sy AS nums,
                         sy * sxx - sx * sxy
                             + (n * sxy - sx * sy) AS numv
                  FROM m)
            SELECT CAST(n AS BIGINT) AS n_orders,
                   CAST(sx AS BIGINT) AS sum_lines,
                   CAST(sy AS BIGINT) AS sum_cents,
                   CAST((CASE WHEN nums > 0 THEN 1
                         WHEN nums < 0 THEN -1 ELSE 0 END)
                        * ((1000 * ABS(nums)) // den) AS BIGINT)
                       AS slope_milli,
                   CAST((CASE WHEN numv > 0 THEN 1
                         WHEN numv < 0 THEN -1 ELSE 0 END)
                        * ((1000 * ABS(numv)) // den) AS BIGINT)
                       AS one_line_value_milli
            FROM f
        """,
        "brand_return_stdres": """
            WITH d AS (SELECT p.p_brand AS br,
                              CASE WHEN l.l_returnflag = 'R'
                                   THEN 1 ELSE 0 END AS j
                       FROM lineitem l
                       JOIN part p ON l.l_partkey = p.p_partkey),
            obs AS (SELECT br, j, CAST(COUNT(*) AS BIGINT) AS o
                    FROM d GROUP BY 1, 2),
            bs AS (SELECT DISTINCT p_brand AS br FROM part),
            grid AS (SELECT bs.br, jj.j, COALESCE(obs.o, 0) AS o
                     FROM bs CROSS JOIN
                          (SELECT unnest([0, 1]) AS j) jj
                     LEFT JOIN obs ON obs.br = bs.br
                                  AND obs.j = jj.j),
            r AS (SELECT br, CAST(SUM(o) AS BIGINT) AS rt
                  FROM grid GROUP BY 1),
            c AS (SELECT j, CAST(SUM(o) AS BIGINT) AS ct
                  FROM grid GROUP BY 1),
            t AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM grid),
            e AS (SELECT grid.br, grid.j, grid.o, r.rt, c.ct, t.n,
                         CAST(t.n AS HUGEINT) * grid.o
                             - CAST(r.rt AS HUGEINT) * c.ct AS dev
                  FROM grid JOIN r ON grid.br = r.br
                       JOIN c ON grid.j = c.j, t
                  WHERE r.rt > 0),
            f AS (SELECT br, j, o, rt, ct, dev,
                         CAST(FLOOR(
                             (CAST(dev AS DOUBLE) / n)
                             / SQRT(CAST(rt AS DOUBLE) * ct
                                    / CAST(n AS DOUBLE)
                                    * (1.0 - CAST(rt AS DOUBLE)
                                       / CAST(n AS DOUBLE))
                                    * (1.0 - CAST(ct AS DOUBLE)
                                       / CAST(n AS DOUBLE)))
                             * 1000.0) AS BIGINT) AS sr
                  FROM e),
            rk AS (SELECT *, ROW_NUMBER() OVER (
                       ORDER BY ABS(sr) DESC, br, j) AS rk
                   FROM f)
            SELECT br AS brand, CAST(j AS BIGINT) AS returned,
                   o AS obs, rt AS r_tot, ct AS c_tot,
                   CAST(dev AS BIGINT) AS dev_num,
                   sr AS stdres_milli, CAST(rk AS BIGINT) AS rk
            FROM rk WHERE rk <= 10 ORDER BY rk
        """,
        "order_line_concentration": """
            WITH d AS (SELECT l_orderkey AS ok,
                              CAST(FLOOR(l_extendedprice
                                   * (1 - l_discount) * 100)
                                   AS BIGINT) AS rev
                       FROM lineitem),
            p AS (SELECT ok, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(rev) AS BIGINT) AS s,
                         CAST(MAX(rev) AS BIGINT) AS mx
                  FROM d GROUP BY 1),
            b AS (SELECT CASE WHEN n = 1 THEN 0
                              WHEN 100 * mx < 25 * s THEN 1
                              WHEN 100 * mx < 50 * s THEN 2
                              WHEN 100 * mx < 80 * s THEN 3
                              ELSE 4 END AS band
                  FROM p),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b)
            SELECT CAST(band AS BIGINT) AS band,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(10000 * COUNT(*) // t.n AS BIGINT)
                       AS share_bps
            FROM b, t GROUP BY band, t.n ORDER BY band
        """,
        "whale_geography": """
            WITH p AS (SELECT o_custkey AS ck,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS v
                       FROM orders GROUP BY 1),
            r AS (SELECT ck,
                         10 * (ROW_NUMBER() OVER (
                             ORDER BY v DESC, ck) - 1)
                         // (COUNT(*) OVER ()) AS dec
                  FROM p),
            w AS (SELECT c.c_nationkey AS nk,
                         CAST(COUNT(*) AS BIGINT) AS wn
                  FROM r JOIN customer c ON r.ck = c.c_custkey
                  WHERE r.dec = 0 GROUP BY 1),
            a AS (SELECT c.c_nationkey AS nk,
                         CAST(COUNT(*) AS BIGINT) AS cn
                  FROM p JOIN customer c ON p.ck = c.c_custkey
                  GROUP BY 1),
            t AS (SELECT CAST(SUM(cn) AS BIGINT) AS ct FROM a),
            tw AS (SELECT CAST(SUM(wn) AS BIGINT) AS wt FROM w)
            SELECT CAST(a.nk AS BIGINT) AS c_nationkey,
                   a.cn AS n_customers,
                   CAST(COALESCE(w.wn, 0) AS BIGINT) AS n_whales,
                   CAST(10000 * COALESCE(w.wn, 0) // a.cn AS BIGINT)
                       AS whale_bps,
                   CAST(1000 * CAST(COALESCE(w.wn, 0) AS HUGEINT)
                        * t.ct // (CAST(a.cn AS HUGEINT) * tw.wt)
                        - 1000 AS BIGINT) AS lift_milli
            FROM a LEFT JOIN w ON a.nk = w.nk, t, tw
            ORDER BY c_nationkey
        """,
        "supplier_brand_specialization": """
            WITH j AS (SELECT l.l_suppkey AS sk, p.p_brand AS br
                       FROM lineitem l
                       JOIN part p ON l.l_partkey = p.p_partkey),
            c AS (SELECT sk, br, CAST(COUNT(*) AS BIGINT) AS c
                  FROM j GROUP BY 1, 2),
            s AS (SELECT sk, CAST(SUM(c) AS HUGEINT) AS st,
                         SUM(CAST(c AS HUGEINT) * c) AS c2
                  FROM c GROUP BY 1),
            b AS (SELECT sk, st,
                         CASE WHEN st * st < 2 * c2 THEN 0
                              WHEN st * st < 5 * c2 THEN 1
                              WHEN st * st < 10 * c2 THEN 2
                              ELSE 3 END AS band
                  FROM s),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b)
            SELECT CAST(band AS BIGINT) AS band,
                   CASE band WHEN 0 THEN 'lt2' WHEN 1 THEN '2to5'
                        WHEN 2 THEN '5to10' ELSE 'ge10' END
                       AS label,
                   CAST(COUNT(*) AS BIGINT) AS n_suppliers,
                   CAST(10000 * COUNT(*) // t.n AS BIGINT)
                       AS share_bps,
                   CAST(SUM(st) AS BIGINT) AS n_lines
            FROM b, t GROUP BY band, t.n ORDER BY band
        """,
        "orders_yearly_customer_hhi": """
            WITH p AS (SELECT datediff('year', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE))
                              + 1970 AS yr,
                              o_custkey AS ck,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS v
                       FROM orders GROUP BY 1, 2),
            y AS (SELECT yr, CAST(COUNT(*) AS BIGINT) AS nc,
                         CAST(SUM(v) AS HUGEINT) AS t,
                         SUM(CAST(v AS HUGEINT) * v) AS s2
                  FROM p GROUP BY 1),
            r AS (SELECT yr, v,
                         ROW_NUMBER() OVER (PARTITION BY yr
                                            ORDER BY v DESC, ck)
                             AS rn
                  FROM p),
            c10 AS (SELECT yr, CAST(SUM(v) AS HUGEINT) AS top
                    FROM r WHERE rn <= 10 GROUP BY 1)
            SELECT CAST(y.yr AS BIGINT) AS year, y.nc AS n_customers,
                   CAST(y.t AS BIGINT) AS total_cents,
                   CAST(10000 * y.s2 // (y.t * y.t) AS BIGINT)
                       AS hhi_bps,
                   CAST(10000 * c10.top // y.t AS BIGINT)
                       AS cr10_bps
            FROM y JOIN c10 ON y.yr = c10.yr ORDER BY year
        """,
        "customer_balance_revenue_corr": """
            WITH v AS (SELECT o_custkey AS ck,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS v
                       FROM orders GROUP BY 1),
            j AS (SELECT CAST(FLOOR(c.c_acctbal * 100) AS BIGINT)
                             AS x,
                         COALESCE(v.v, 0) AS y
                  FROM customer c LEFT JOIN v ON c.c_custkey = v.ck),
            m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(x) AS HUGEINT) AS sx,
                         CAST(SUM(y) AS HUGEINT) AS sy,
                         SUM(CAST(x AS HUGEINT) * x) AS sxx,
                         SUM(CAST(y AS HUGEINT) * y) AS syy,
                         SUM(CAST(x AS HUGEINT) * y) AS sxy
                  FROM j),
            f AS (SELECT n, n * sxy - sx * sy AS num,
                         n * sxx - sx * sx AS va,
                         n * syy - sy * sy AS vb
                  FROM m)
            SELECT CAST(n AS BIGINT) AS n_customers,
                   CAST((CASE WHEN num > 0 THEN 1
                         WHEN num < 0 THEN -1 ELSE 0 END)
                        * (ABS(num) // 1000000000) AS BIGINT)
                       AS cov_num_sc,
                   CAST(va // 1000000000 AS BIGINT)
                       AS var_balance_sc,
                   CAST(vb // 1000000000 AS BIGINT)
                       AS var_revenue_sc,
                   CAST(CASE WHEN va > 0 AND vb > 0 THEN
                        FLOOR(CAST(num AS DOUBLE)
                              / (SQRT(CAST(va AS DOUBLE))
                                 * SQRT(CAST(vb AS DOUBLE)))
                              * 1000.0)
                        ELSE 0 END AS BIGINT) AS r_milli
            FROM f
        """,
        "part_type_size_price_census": """
            WITH d AS (SELECT p_type AS ty,
                              CAST(p_size AS BIGINT) AS x,
                              CAST(FLOOR(p_retailprice * 100)
                                   AS BIGINT) AS y
                       FROM part),
            g AS (SELECT ty, CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(x) AS HUGEINT) AS sx,
                         CAST(SUM(y) AS HUGEINT) AS sy,
                         SUM(CAST(x AS HUGEINT) * y) AS sxy
                  FROM d GROUP BY 1),
            b AS (SELECT CASE WHEN n < 3 THEN 0
                              WHEN n * sxy - sx * sy > 0 THEN 1
                              WHEN n * sxy - sx * sy < 0 THEN 3
                              ELSE 2 END AS band
                  FROM g),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM b)
            SELECT CAST(band AS BIGINT) AS band,
                   CASE band WHEN 0 THEN 'few' WHEN 1 THEN 'up'
                        WHEN 2 THEN 'flat' ELSE 'down' END AS trend,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   CAST(10000 * COUNT(*) // t.tot AS BIGINT)
                       AS share_bps
            FROM b, t GROUP BY band, t.tot ORDER BY band
        """,
        "events_type_dow_peak": """
            WITH d AS (SELECT event_type AS et,
                              (epoch_us(ts) // 86400000000 + 3) % 7
                                  AS dw
                       FROM events),
            g AS (SELECT et, dw, CAST(COUNT(*) AS BIGINT) AS n
                  FROM d GROUP BY 1, 2),
            ets AS (SELECT DISTINCT et FROM g),
            grid AS (SELECT ets.et, dd.dw, COALESCE(g.n, 0) AS n
                     FROM ets CROSS JOIN
                          (SELECT unnest(generate_series(0, 6))
                               AS dw) dd
                     LEFT JOIN g ON g.et = ets.et
                                AND g.dw = dd.dw),
            t AS (SELECT et, CAST(SUM(n) AS BIGINT) AS tot
                  FROM grid GROUP BY 1),
            pk AS (SELECT et, dw, n,
                          ROW_NUMBER() OVER (PARTITION BY et
                                             ORDER BY n DESC, dw)
                              AS rn
                   FROM grid),
            chi AS (SELECT grid.et,
                           CAST(SUM(1000
                                * CAST(7 * grid.n - t.tot
                                       AS HUGEINT)
                                * (7 * grid.n - t.tot)
                                // (7 * t.tot)) AS BIGINT) AS chi2
                    FROM grid JOIN t ON grid.et = t.et GROUP BY 1)
            SELECT t.et AS event_type, t.tot AS n_events,
                   CAST(pk.dw AS BIGINT) AS peak_dow,
                   CAST(10000 * pk.n // t.tot AS BIGINT)
                       AS peak_share_bps,
                   chi.chi2 AS chi2_milli
            FROM t JOIN pk ON pk.et = t.et AND pk.rn = 1
                 JOIN chi ON chi.et = t.et
            ORDER BY event_type
        """,
        "orders_new_repeat_split": """
            WITH p AS (SELECT o_custkey AS ck,
                              datediff('year', DATE '1970-01-01',
                                       CAST(o_orderdate AS DATE))
                              + 1970 AS yr,
                              SUM(CAST(FLOOR(o_totalprice * 100)
                                       AS BIGINT)) AS v
                       FROM orders GROUP BY 1, 2),
            f AS (SELECT ck, MIN(yr) AS fy FROM p GROUP BY 1),
            j AS (SELECT p.yr, p.v,
                         CASE WHEN p.yr = f.fy THEN 1 ELSE 0 END
                             AS is_new
                  FROM p JOIN f ON p.ck = f.ck)
            SELECT CAST(yr AS BIGINT) AS year,
                   CAST(SUM(v) AS BIGINT) AS total_cents,
                   CAST(COALESCE(SUM(v) FILTER (is_new = 1), 0)
                        AS BIGINT) AS new_cents,
                   CAST(COALESCE(SUM(v) FILTER (is_new = 0), 0)
                        AS BIGINT) AS repeat_cents,
                   CAST(10000 * COALESCE(SUM(v) FILTER (
                        is_new = 1), 0) // SUM(v) AS BIGINT)
                       AS new_share_bps
            FROM j GROUP BY yr ORDER BY year
        """,
        "vocab_gini": """
            WITH tk AS (SELECT unnest(regexp_split_to_array(
                                   text, '\\s+')) AS tok
                        FROM documents),
            c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
                  FROM tk WHERE tok != '' GROUP BY 1),
            cc AS (SELECT n AS f, CAST(COUNT(*) AS BIGINT) AS m
                   FROM c GROUP BY 1),
            w AS (SELECT f, m,
                         SUM(m) OVER (ORDER BY f
                                      ROWS UNBOUNDED PRECEDING) - m
                             AS a
                  FROM cc),
            g AS (SELECT CAST(SUM(m) AS BIGINT) AS n,
                         CAST(SUM(f * m) AS BIGINT) AS t
                  FROM cc),
            s AS (SELECT SUM(CAST(f AS HUGEINT) * m
                             * (2 * a + m - g.n)) AS v
                  FROM w, g)
            SELECT g.n AS n_types, g.t AS n_tokens,
                   CAST(10000 * s.v
                        // (CAST(g.n AS HUGEINT) * g.t) AS BIGINT)
                       AS gini_bps
            FROM g, s
        """,
        "docs_length_anova_by_source": """
            WITH d AS (SELECT source,
                              CAST(n_chars AS BIGINT) AS v
                       FROM documents),
            g AS (SELECT source, CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(v) AS HUGEINT) AS s,
                         SUM(CAST(v AS HUGEINT) * v) AS q
                  FROM d GROUP BY 1),
            t AS (SELECT SUM(n) AS n, SUM(s) AS st,
                         CAST(COUNT(*) AS HUGEINT) AS k
                  FROM g),
            mb AS (SELECT 1000 * st // n AS mbar FROM t),
            cm AS (SELECT g.n AS ng, g.s, g.q,
                          1000 * g.s // g.n AS mi
                   FROM g),
            ss AS (SELECT SUM(ng * (mi - mb.mbar) * (mi - mb.mbar))
                              AS ssb,
                          SUM(1000000 * q - 2 * mi * 1000 * s
                              + ng * mi * mi) AS ssw
                   FROM cm, mb)
            SELECT CAST(t.n AS BIGINT) AS n_docs,
                   CAST(t.k AS BIGINT) AS n_sources,
                   CAST(ss.ssb // 1000000 AS BIGINT) AS ssb_sc,
                   CAST(ss.ssw // 1000000 AS BIGINT) AS ssw_sc,
                   CAST(1000 * ss.ssb * (t.n - t.k)
                        // (ss.ssw * (t.k - 1)) AS BIGINT)
                       AS f_milli,
                   CAST(10000 * ss.ssb // (ss.ssb + ss.ssw)
                        AS BIGINT) AS eta2_bps
            FROM t, ss
        """,
        "orders_value_cv_by_priority": """
            WITH d AS (SELECT o_orderpriority AS pr,
                              CAST(FLOOR(o_totalprice)
                                   AS BIGINT) AS v
                       FROM orders),
            g AS (SELECT pr, CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(v) AS HUGEINT) AS s,
                         SUM(CAST(v AS HUGEINT) * v) AS q
                  FROM d GROUP BY 1)
            SELECT pr AS priority,
                   CAST(n AS BIGINT) AS n_orders,
                   CAST(1000 * s // n AS BIGINT) AS mean_milli,
                   CAST(1000 * (n * q - s * s) // (s * s)
                        AS BIGINT) AS cv2_milli
            FROM g ORDER BY priority
        """,
        "supplier_credit_hold_census": """
            WITH d AS (SELECT s_nationkey AS nk,
                              CASE WHEN CAST(FLOOR(s_acctbal * 100)
                                        AS BIGINT) < 0
                                   THEN 1 ELSE 0 END AS neg
                       FROM supplier),
            g AS (SELECT nk, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(neg) AS BIGINT) AS ng
                  FROM d GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
                         CAST(SUM(ng) AS BIGINT) AS negt
                  FROM g)
            SELECT CAST(g.nk AS BIGINT) AS s_nationkey,
                   g.n AS n_suppliers, g.ng AS n_negative,
                   CAST(10000 * g.ng // g.n AS BIGINT) AS neg_bps,
                   CAST(CASE WHEN t.negt > 0 THEN
                        1000 * CAST(g.ng AS HUGEINT) * t.nt
                        // (CAST(g.n AS HUGEINT) * t.negt) - 1000
                        ELSE -9999 END AS BIGINT) AS lift_milli
            FROM g, t ORDER BY s_nationkey
        """,
        "events_minute_heaping": """
            WITH d AS (SELECT (epoch_us(ts) // 60000000) % 60 AS m
                       FROM events),
            g AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS n
                  FROM d GROUP BY 1),
            grid AS (SELECT u.m, COALESCE(g.n, 0) AS n
                     FROM UNNEST(generate_series(0, 59)) AS u(m)
                     LEFT JOIN g ON g.m = u.m),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM grid),
            chi AS (SELECT CAST(SUM(1000
                        * CAST(60 * n - t.t AS HUGEINT)
                        * (60 * n - t.t) // (60 * t.t)) AS BIGINT)
                        AS v
                    FROM grid, t),
            pk AS (SELECT m, n FROM grid
                   ORDER BY n DESC, m LIMIT 1)
            SELECT t.t AS n_events, chi.v AS chi2_milli,
                   CAST(59 AS BIGINT) AS df,
                   CAST(pk.m AS BIGINT) AS peak_minute,
                   CAST(1000 * 60 * pk.n // t.t - 1000 AS BIGINT)
                       AS peak_lift_milli
            FROM t, chi, pk
        """,
        "brand_price_overlap": """
            WITH h AS (SELECT p_brand AS br,
                              CAST(FLOOR(p_retailprice * 100)
                                   AS BIGINT) AS v,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM part GROUP BY 1, 2),
            r AS (SELECT br, v,
                         SUM(c) OVER (PARTITION BY br ORDER BY v
                                      ROWS UNBOUNDED PRECEDING)
                             AS cum,
                         SUM(c) OVER (PARTITION BY br) AS n
                  FROM h),
            b AS (SELECT br,
                         MIN(v) FILTER (cum >= (n + 9) // 10)
                             AS lo,
                         MIN(v) FILTER (cum >= (9 * n + 9) // 10)
                             AS hi
                  FROM r GROUP BY br),
            p AS (SELECT b1.br AS a, b2.br AS b2r,
                         GREATEST(b1.lo, b2.lo) AS lo,
                         LEAST(b1.hi, b2.hi) AS hi
                  FROM b b1 JOIN b b2 ON b1.br < b2.br),
            agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                           CAST(COUNT(*) FILTER (hi >= lo)
                                AS BIGINT) AS n_over
                    FROM p),
            w AS (SELECT a, b2r, hi - lo AS width FROM p
                  WHERE hi >= lo
                  ORDER BY hi - lo DESC, a, b2r LIMIT 1),
            nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b)
            SELECT nb.n AS n_brands, agg.n_pairs, agg.n_over
                       AS n_overlap,
                   CAST(10000 * agg.n_over // agg.n_pairs
                        AS BIGINT) AS overlap_bps,
                   w.a AS widest_a, w.b2r AS widest_b,
                   CAST(w.width AS BIGINT) AS widest_cents
            FROM nb, agg, w
        """,
        "docs_ttr_bands": """
            WITH t AS (SELECT doc_id,
                              unnest(regexp_split_to_array(
                                  text, '\\s+')) AS tok
                       FROM documents),
            f AS (SELECT doc_id, tok FROM t WHERE tok != ''),
            d AS (SELECT doc_id,
                         CAST(COUNT(*) AS BIGINT) AS tot,
                         CAST(COUNT(DISTINCT tok) AS BIGINT) AS dis
                  FROM f GROUP BY 1),
            al AS (SELECT doc_id,
                          COALESCE(d.tot, 0) AS tot,
                          COALESCE(d.dis, 0) AS dis
                   FROM documents LEFT JOIN d USING (doc_id)),
            b AS (SELECT CASE WHEN tot < 10 THEN 0
                              WHEN 100 * dis < 40 * tot THEN 1
                              WHEN 100 * dis < 60 * tot THEN 2
                              WHEN 100 * dis < 80 * tot THEN 3
                              ELSE 4 END AS band
                  FROM al),
            tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b)
            SELECT CAST(band AS BIGINT) AS band,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(10000 * COUNT(*) // tt.n AS BIGINT)
                       AS share_bps
            FROM b, tt GROUP BY band, tt.n ORDER BY band
        """,
        "orders_priority_by_value_decile": """
            WITH d AS (SELECT CAST(FLOOR(o_totalprice * 100)
                                   AS BIGINT) AS v,
                              CASE WHEN o_orderpriority LIKE '1%'
                                     OR o_orderpriority LIKE '2%'
                                   THEN 1 ELSE 0 END AS urg
                       FROM orders),
            g AS (SELECT v // 10000 AS b,
                         CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(urg) AS BIGINT) AS u
                  FROM d GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
                         CAST(SUM(u) AS BIGINT) AS ut
                  FROM g),
            r AS (SELECT b, n, u,
                         SUM(n) OVER (ORDER BY b
                                      ROWS UNBOUNDED PRECEDING) - n
                             AS cum_prev
                  FROM g),
            a AS (SELECT LEAST(10 * cum_prev // t.nt, 9) AS decile,
                         n, u
                  FROM r, t)
            SELECT CAST(decile AS BIGINT) AS decile,
                   CAST(SUM(n) AS BIGINT) AS n_orders,
                   CAST(SUM(u) AS BIGINT) AS n_urgent,
                   CAST(10000 * SUM(u) // SUM(n) AS BIGINT)
                       AS urgent_bps,
                   CAST(1000 * CAST(SUM(u) AS HUGEINT) * t.nt
                        // (CAST(SUM(n) AS HUGEINT) * t.ut) - 1000
                        AS BIGINT) AS lift_milli
            FROM a, t GROUP BY decile, t.nt, t.ut ORDER BY decile
        """,
        "region_share_shift": """
            WITH sp AS (SELECT (MIN(datediff('day',
                                    DATE '1970-01-01',
                                    CAST(o_orderdate AS DATE)))
                                + MAX(datediff('day',
                                      DATE '1970-01-01',
                                      CAST(o_orderdate AS DATE))))
                               // 2 AS mid
                        FROM orders),
            j AS (SELECT r.r_name AS region,
                         CASE WHEN datediff('day', DATE '1970-01-01',
                                   CAST(o.o_orderdate AS DATE))
                                   > sp.mid
                              THEN 1 ELSE 0 END AS h,
                         CAST(FLOOR(o.o_totalprice * 100)
                              AS BIGINT) AS v
                  FROM orders o
                  JOIN customer c ON o.o_custkey = c.c_custkey
                  JOIN nation n ON c.c_nationkey = n.n_nationkey
                  JOIN region r ON n.n_regionkey = r.r_regionkey,
                       sp),
            g AS (SELECT region, h, CAST(SUM(v) AS BIGINT) AS x
                  FROM j GROUP BY 1, 2),
            t AS (SELECT CAST(COALESCE(SUM(x) FILTER (h = 0), 0)
                              AS BIGINT) AS t1,
                         CAST(COALESCE(SUM(x) FILTER (h = 1), 0)
                              AS BIGINT) AS t2
                  FROM g),
            w AS (SELECT region,
                         CAST(COALESCE(SUM(x) FILTER (h = 0), 0)
                              AS BIGINT) AS a,
                         CAST(COALESCE(SUM(x) FILTER (h = 1), 0)
                              AS BIGINT) AS b
                  FROM g GROUP BY 1)
            SELECT w.region, w.a AS h1_cents, w.b AS h2_cents,
                   CAST(10000 * w.a // t.t1 AS BIGINT)
                       AS h1_share_bps,
                   CAST(10000 * w.b // t.t2 AS BIGINT)
                       AS h2_share_bps,
                   CAST(CASE WHEN w.a > 0 THEN
                        1000 * CAST(w.b AS HUGEINT) * t.t1
                        // (CAST(w.a AS HUGEINT) * t.t2) - 1000
                        ELSE -9999 END AS BIGINT) AS shift_milli
            FROM w, t ORDER BY region
        """,
        "events_zero_value_census": """
            WITH d AS (SELECT event_type AS et,
                              CASE WHEN CAST(FLOOR(value * 100)
                                        AS BIGINT) = 0
                                   THEN 1 ELSE 0 END AS z
                       FROM events),
            g AS (SELECT et, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(z) AS BIGINT) AS zc
                  FROM d GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
                         CAST(SUM(zc) AS BIGINT) AS zt
                  FROM g)
            SELECT g.et AS event_type, g.n AS n_events,
                   g.zc AS n_zero,
                   CAST(10000 * g.zc // g.n AS BIGINT) AS zero_bps,
                   CAST(CASE WHEN t.zt > 0 THEN
                        1000 * CAST(g.zc AS HUGEINT) * t.nt
                        // (CAST(g.n AS HUGEINT) * t.zt) - 1000
                        ELSE -9999 END AS BIGINT) AS lift_milli
            FROM g, t ORDER BY event_type
        """,
        "nation_market_depth": """
            WITH c AS (SELECT c_nationkey AS nk,
                              CAST(COUNT(*) AS BIGINT) AS nc
                       FROM customer GROUP BY 1),
            s AS (SELECT s_nationkey AS nk,
                         CAST(COUNT(*) AS BIGINT) AS ns
                  FROM supplier GROUP BY 1),
            k AS (SELECT nk FROM c UNION SELECT nk FROM s)
            SELECT CAST(k.nk AS BIGINT) AS nationkey,
                   CAST(COALESCE(c.nc, 0) AS BIGINT) AS n_customers,
                   CAST(COALESCE(s.ns, 0) AS BIGINT) AS n_suppliers,
                   CAST(CASE WHEN COALESCE(s.ns, 0) > 0 THEN
                        1000 * COALESCE(c.nc, 0) // s.ns
                        ELSE -1 END AS BIGINT)
                       AS cust_per_supp_milli
            FROM k LEFT JOIN c ON k.nk = c.nk
                 LEFT JOIN s ON k.nk = s.nk
            ORDER BY nationkey
        """,
        "brand_no_promo_census": """
            WITH d AS (SELECT p.p_brand AS br,
                              CASE WHEN CAST(FLOOR(l.l_discount
                                        * 100) AS BIGINT) = 0
                                   THEN 1 ELSE 0 END AS z
                       FROM lineitem l
                       JOIN part p ON l.l_partkey = p.p_partkey),
            g AS (SELECT br, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(z) AS BIGINT) AS zc
                  FROM d GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
                         CAST(SUM(zc) AS BIGINT) AS zt
                  FROM g)
            SELECT g.br AS brand, g.n AS n_lines,
                   g.zc AS n_zero_disc,
                   CAST(10000 * g.zc // g.n AS BIGINT) AS zero_bps,
                   CAST(CASE WHEN t.zt > 0 THEN
                        1000 * CAST(g.zc AS HUGEINT) * t.nt
                        // (CAST(g.n AS HUGEINT) * t.zt) - 1000
                        ELSE -9999 END AS BIGINT) AS lift_milli
            FROM g, t ORDER BY brand
        """,
        "entity_name_id_audit": """
            WITH u AS (
              SELECT 'customer' AS entity,
                     CAST(COUNT(*) AS BIGINT) AS n_rows,
                     CAST(SUM(CASE WHEN regexp_full_match(
                              split_part(c_name, '#', 2), '[0-9]+')
                              AND CAST(split_part(c_name, '#', 2)
                                       AS BIGINT) = c_custkey
                              THEN 1 ELSE 0 END) AS BIGINT)
                         AS n_match,
                     CAST(SUM(CASE WHEN NOT regexp_full_match(
                              split_part(c_name, '#', 2), '[0-9]+')
                              THEN 1 ELSE 0 END) AS BIGINT)
                         AS n_unparsed
              FROM customer
              UNION ALL
              SELECT 'supplier',
                     CAST(COUNT(*) AS BIGINT),
                     CAST(SUM(CASE WHEN regexp_full_match(
                              split_part(s_name, '#', 2), '[0-9]+')
                              AND CAST(split_part(s_name, '#', 2)
                                       AS BIGINT) = s_suppkey
                              THEN 1 ELSE 0 END) AS BIGINT),
                     CAST(SUM(CASE WHEN NOT regexp_full_match(
                              split_part(s_name, '#', 2), '[0-9]+')
                              THEN 1 ELSE 0 END) AS BIGINT)
              FROM supplier)
            SELECT entity, n_rows, n_match,
                   CAST(10000 * n_match // n_rows AS BIGINT)
                       AS match_bps,
                   n_unparsed
            FROM u ORDER BY entity
        """,
        "part_price_endings": """
            WITH d AS (SELECT CAST(FLOOR(p_retailprice * 100)
                                   AS BIGINT) % 100 AS e
                       FROM part),
            g AS (SELECT e, CAST(COUNT(*) AS BIGINT) AS n
                  FROM d GROUP BY 1),
            grid AS (SELECT u.e, COALESCE(g.n, 0) AS n
                     FROM UNNEST(generate_series(0, 99)) AS u(e)
                     LEFT JOIN g ON g.e = u.e),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM grid),
            chi AS (SELECT CAST(SUM(1000
                        * CAST(100 * n - t.t AS HUGEINT)
                        * (100 * n - t.t) // (100 * t.t))
                        AS BIGINT) AS v
                    FROM grid, t),
            pk AS (SELECT e, n FROM grid ORDER BY n DESC, e LIMIT 1)
            SELECT t.t AS n_parts,
                   CAST(10000 * (SELECT n FROM grid WHERE e = 0)
                        // t.t AS BIGINT) AS ending00_bps,
                   CAST(10000 * (SELECT n FROM grid WHERE e = 99)
                        // t.t AS BIGINT) AS ending99_bps,
                   chi.v AS chi2_milli,
                   CAST(pk.e AS BIGINT) AS peak_ending,
                   CAST(1000 * 100 * pk.n // t.t - 1000 AS BIGINT)
                       AS peak_lift_milli
            FROM t, chi, pk
        """,
        "user_coverage_census": """
            WITH e AS (SELECT DISTINCT user_id AS u,
                              epoch_us(ts) // 86400000000 AS d
                       FROM events),
            p AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS act,
                         MAX(d) - MIN(d) + 1 AS span
                  FROM e GROUP BY 1),
            b AS (SELECT CASE WHEN span = 1 THEN 0
                              WHEN 100 * act < 25 * span THEN 1
                              WHEN 100 * act < 50 * span THEN 2
                              WHEN 100 * act < 75 * span THEN 3
                              ELSE 4 END AS band
                  FROM p),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b)
            SELECT CAST(band AS BIGINT) AS band,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(10000 * COUNT(*) // t.n AS BIGINT)
                       AS share_bps
            FROM b, t GROUP BY band, t.n ORDER BY band
        """,
        "part_size_uniformity": """
            WITH d AS (SELECT LEAST(GREATEST(
                                  CAST(p_size AS BIGINT), 1), 50)
                                  AS s
                       FROM part),
            g AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n
                  FROM d GROUP BY 1),
            grid AS (SELECT u.s, COALESCE(g.n, 0) AS n
                     FROM UNNEST(generate_series(1, 50)) AS u(s)
                     LEFT JOIN g ON g.s = u.s),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM grid),
            chi AS (SELECT CAST(SUM(1000
                        * CAST(50 * n - t.t AS HUGEINT)
                        * (50 * n - t.t) // (50 * t.t)) AS BIGINT)
                        AS v
                    FROM grid, t),
            pk AS (SELECT s, n FROM grid ORDER BY n DESC, s LIMIT 1),
            oc AS (SELECT CAST(COUNT(*) FILTER (n > 0) AS BIGINT)
                              AS k
                   FROM grid)
            SELECT t.t AS n_parts, oc.k AS n_sizes_occupied,
                   chi.v AS chi2_milli, CAST(49 AS BIGINT) AS df,
                   CAST(pk.s AS BIGINT) AS peak_size,
                   CAST(1000 * 50 * pk.n // t.t - 1000 AS BIGINT)
                       AS peak_lift_milli
            FROM t, chi, pk, oc
        """,
        "docs_length_quantiles_by_source": """
            WITH h AS (SELECT source AS s,
                              CAST(n_chars AS BIGINT) AS v,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM documents GROUP BY 1, 2),
            r AS (SELECT s, v, c,
                         SUM(c) OVER (PARTITION BY s ORDER BY v
                                      ROWS UNBOUNDED PRECEDING)
                             AS cum,
                         SUM(c) OVER (PARTITION BY s) AS n,
                         SUM(v * c) OVER (PARTITION BY s) AS tot
                  FROM h)
            SELECT s AS source,
                   CAST(MAX(n) AS BIGINT) AS n_docs,
                   CAST(MIN(v) FILTER (
                        cum >= (50 * n + 99) // 100) AS BIGINT)
                       AS p50,
                   CAST(MIN(v) FILTER (
                        cum >= (90 * n + 99) // 100) AS BIGINT)
                       AS p90,
                   CAST(MIN(v) FILTER (
                        cum >= (99 * n + 99) // 100) AS BIGINT)
                       AS p99,
                   CAST(1000 * MAX(tot) // MAX(n) AS BIGINT)
                       AS mean_milli
            FROM r GROUP BY s ORDER BY source
        """,
        "lineitem_zero_zero_lift": """
            WITH d AS (SELECT CASE WHEN CAST(FLOOR(l_discount * 100)
                                        AS BIGINT) = 0
                                   THEN 1 ELSE 0 END AS d0,
                              CASE WHEN CAST(FLOOR(l_tax * 100)
                                        AS BIGINT) = 0
                                   THEN 1 ELSE 0 END AS t0
                       FROM lineitem),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(d0) AS BIGINT) AS nd0,
                         CAST(SUM(t0) AS BIGINT) AS nt0,
                         CAST(SUM(d0 * t0) AS BIGINT) AS n00
                  FROM d)
            SELECT n AS n_lines, nd0 AS n_disc0, nt0 AS n_tax0,
                   n00 AS n_both0,
                   CAST(10000 * nd0 // n AS BIGINT) AS disc0_bps,
                   CAST(10000 * nt0 // n AS BIGINT) AS tax0_bps,
                   CAST(10000 * n00 // n AS BIGINT) AS both0_bps,
                   CAST(CASE WHEN nd0 > 0 AND nt0 > 0 THEN
                        1000 * CAST(n00 AS HUGEINT) * n
                        // (CAST(nd0 AS HUGEINT) * nt0)
                        ELSE -9999 END AS BIGINT) AS lift_milli
            FROM t
        """,
        "customer_priority_stickiness": """
            WITH pc AS (SELECT o_custkey AS c,
                               CAST(SUBSTR(o_orderpriority, 1, 1)
                                    AS BIGINT) AS p,
                               CAST(COUNT(*) AS BIGINT) AS k
                        FROM orders GROUP BY 1, 2),
            cu AS (SELECT c, CAST(SUM(k) AS BIGINT) AS n,
                          CAST(MAX(k) AS BIGINT) AS m
                   FROM pc GROUP BY c),
            b AS (SELECT CASE WHEN n = 1 THEN 0 WHEN m = n THEN 4
                              WHEN 100 * m >= 75 * n THEN 3
                              WHEN 100 * m >= 50 * n THEN 2
                              ELSE 1 END AS band,
                         n, m FROM cu),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM cu)
            SELECT band, CAST(COUNT(*) AS BIGINT) AS n_customers,
                   CAST(10000 * COUNT(*) // MAX(t.total) AS BIGINT)
                       AS share_bps,
                   CAST(10000 * SUM(m) // SUM(n) AS BIGINT)
                       AS modal_bps
            FROM b, t GROUP BY band ORDER BY band
        """,
        "lineitem_discount_tax_independence": """
            WITH d AS (SELECT CAST(FLOOR(l_discount * 100) AS BIGINT)
                                  AS di,
                              CAST(FLOOR(l_tax * 100) AS BIGINT)
                                  AS tj
                       FROM lineitem),
            o AS (SELECT di, tj, CAST(COUNT(*) AS BIGINT) AS c
                  FROM d GROUP BY 1, 2),
            r AS (SELECT di, CAST(SUM(c) AS BIGINT) AS rn
                  FROM o GROUP BY 1),
            cc AS (SELECT tj, CAST(SUM(c) AS BIGINT) AS cn
                   FROM o GROUP BY 1),
            n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM o),
            grid AS (SELECT r.di, cc.tj, r.rn, cc.cn,
                            COALESCE(o.c, 0) AS c
                     FROM r CROSS JOIN cc
                     LEFT JOIN o ON o.di = r.di AND o.tj = cc.tj),
            chi AS (SELECT CAST(SUM(
                        1000 * (n.n * CAST(c AS HUGEINT)
                                - rn * CAST(cn AS HUGEINT))
                             * (n.n * CAST(c AS HUGEINT)
                                - rn * CAST(cn AS HUGEINT))
                        // (CAST(n.n AS HUGEINT) * rn * cn))
                        AS BIGINT) AS chi2,
                           CAST(COUNT(*) FILTER (c > 0) AS BIGINT)
                               AS occ,
                           CAST(COUNT(DISTINCT di) AS BIGINT) AS nr,
                           CAST(COUNT(DISTINCT tj) AS BIGINT) AS nc
                    FROM grid, n),
            pk AS (SELECT di, tj,
                          CAST(1000 * n.n * CAST(c AS HUGEINT)
                               // (rn * CAST(cn AS HUGEINT))
                               AS BIGINT) AS lift
                   FROM grid, n ORDER BY lift DESC, di, tj LIMIT 1)
            SELECT n.n AS n_lines, chi.nr AS n_disc_levels,
                   chi.nc AS n_tax_levels,
                   (chi.nr - 1) * (chi.nc - 1) AS df,
                   chi.occ AS n_cells_occupied,
                   chi.chi2 AS chi2_milli, pk.di AS peak_disc,
                   pk.tj AS peak_tax,
                   pk.lift - 1000 AS peak_lift_milli
            FROM n, chi, pk
        """,
        "nation_balance_sheet": """
            WITH c AS (SELECT c_nationkey AS k,
                              CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(SUM(CAST(FLOOR(c_acctbal * 100)
                                            AS BIGINT)) AS BIGINT)
                                  AS s
                       FROM customer GROUP BY 1),
            s AS (SELECT s_nationkey AS k,
                         CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(CAST(FLOOR(s_acctbal * 100)
                                       AS BIGINT)) AS BIGINT) AS s
                  FROM supplier GROUP BY 1),
            j AS (SELECT n_name AS nation,
                         COALESCE(c.n, 0) AS nc,
                         COALESCE(c.s, 0) AS sc,
                         COALESCE(s.n, 0) AS ns,
                         COALESCE(s.s, 0) AS ss
                  FROM nation LEFT JOIN c ON c.k = n_nationkey
                              LEFT JOIN s ON s.k = n_nationkey)
            SELECT nation, nc AS n_customers, ns AS n_suppliers,
                   CAST(CASE WHEN nc > 0 THEN sc // nc
                             ELSE -9999999 END AS BIGINT)
                       AS cust_mean_cents,
                   CAST(CASE WHEN ns > 0 THEN ss // ns
                             ELSE -9999999 END AS BIGINT)
                       AS supp_mean_cents,
                   CAST(CASE WHEN nc > 0 AND ns > 0
                             THEN sc // nc - ss // ns
                             ELSE -9999999 END AS BIGINT)
                       AS gap_cents
            FROM j ORDER BY nation
        """,
        "supplier_part_repeat_census": """
            WITH p AS (SELECT l_suppkey AS s, l_partkey AS pk,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM lineitem GROUP BY 1, 2),
            b AS (SELECT CASE WHEN c = 1 THEN 0 WHEN c = 2 THEN 1
                              WHEN c <= 4 THEN 2 ELSE 3 END AS band,
                         c FROM p),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS np,
                         CAST(SUM(c) AS BIGINT) AS nl FROM p)
            SELECT band, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(10000 * COUNT(*) // MAX(t.np) AS BIGINT)
                       AS pair_share_bps,
                   CAST(SUM(c) AS BIGINT) AS n_lines,
                   CAST(10000 * SUM(c) // MAX(t.nl) AS BIGINT)
                       AS line_share_bps
            FROM b, t GROUP BY band ORDER BY band
        """,
        "user_journey_endpoints": """
            WITH r AS (SELECT user_id, event_type,
                              ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rf,
                              ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC)
                                  AS rl
                       FROM events),
            f AS (SELECT user_id,
                         MAX(CASE WHEN rf = 1 THEN event_type END)
                             AS first_type,
                         MAX(CASE WHEN rl = 1 THEN event_type END)
                             AS last_type
                  FROM r GROUP BY user_id),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM f)
            SELECT first_type, last_type,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(10000 * COUNT(*) // MAX(t.n) AS BIGINT)
                       AS share_bps
            FROM f, t GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "part_name_word_census": """
            WITH w AS (SELECT p_partkey,
                              UNNEST(STRING_SPLIT(p_name, ' '))
                                  AS word
                       FROM part),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM w)
            SELECT word, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
                   CAST(COUNT(DISTINCT p_partkey) AS BIGINT)
                       AS n_parts,
                   CAST(10000 * COUNT(*) // MAX(t.n) AS BIGINT)
                       AS share_bps
            FROM w, t GROUP BY word ORDER BY word
        """,
        "order_linenumber_contiguity": """
            WITH o AS (SELECT l_orderkey AS k,
                              CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(COUNT(DISTINCT l_linenumber)
                                   AS BIGINT) AS dn,
                              CAST(MIN(l_linenumber) AS BIGINT)
                                  AS mn,
                              CAST(MAX(l_linenumber) AS BIGINT)
                                  AS mx
                       FROM lineitem GROUP BY 1)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CASE WHEN mn = 1 AND mx = n AND dn = n
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_ok,
                   CAST(SUM(CASE WHEN dn < n THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dup,
                   CAST(SUM(CASE WHEN dn = n AND mn <> 1
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_offset,
                   CAST(SUM(CASE WHEN dn = n AND mn = 1 AND mx <> n
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_gap,
                   CAST(10000 * SUM(CASE WHEN mn = 1 AND mx = n
                                              AND dn = n
                                         THEN 1 ELSE 0 END)
                        // COUNT(*) AS BIGINT) AS ok_bps
            FROM o
        """,
        "supplier_activity_balance_gamma": """
            WITH l AS (SELECT l_suppkey AS s,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM lineitem GROUP BY 1),
            a AS (SELECT LEAST(COALESCE(l.c, 0), 1000) AS a,
                         (CAST(FLOOR(s_acctbal * 100) AS BIGINT)
                          + 100000) // 10000 AS b,
                         CASE WHEN COALESCE(l.c, 0) > 0
                              THEN 1 ELSE 0 END AS act
                  FROM supplier LEFT JOIN l ON l.s = s_suppkey),
            p AS (SELECT CAST(SUM(CASE WHEN (x.a < y.a AND x.b < y.b)
                                         OR (x.a > y.a AND x.b > y.b)
                                       THEN 1 ELSE 0 END) AS BIGINT)
                             AS c2,
                         CAST(SUM(CASE WHEN (x.a < y.a AND x.b > y.b)
                                         OR (x.a > y.a AND x.b < y.b)
                                       THEN 1 ELSE 0 END) AS BIGINT)
                             AS d2
                  FROM a x, a y),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(act) AS BIGINT) AS na FROM a)
            SELECT t.n AS n_suppliers, t.na AS n_active,
                   p.c2 // 2 AS concordant_pairs,
                   p.d2 // 2 AS discordant_pairs,
                   CAST(CASE WHEN p.c2 + p.d2 > 0 THEN
                        (CASE WHEN p.c2 >= p.d2 THEN 1 ELSE -1 END)
                        * (1000 * (ABS(p.c2 - p.d2) // 2)
                           // ((p.c2 + p.d2) // 2))
                        ELSE 0 END AS BIGINT) AS gamma_milli
            FROM p, t
        """,
        "customer_urgency_drift": """
            WITH o AS (SELECT o_custkey AS c,
                              epoch_us(o_orderdate) // 86400000000
                                  AS d,
                              CAST(SUBSTR(o_orderpriority, 1, 1)
                                   AS BIGINT) AS p
                       FROM orders),
            pr AS (SELECT CAST(COUNT(*) AS BIGINT) AS np,
                          CAST(SUM(CASE WHEN y.p > x.p
                                        THEN 1 ELSE 0 END)
                               AS BIGINT) AS conc,
                          CAST(SUM(CASE WHEN y.p < x.p
                                        THEN 1 ELSE 0 END)
                               AS BIGINT) AS disc
                   FROM o x JOIN o y
                        ON x.c = y.c AND x.d < y.d),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS nm
                  FROM (SELECT c FROM o GROUP BY c
                        HAVING COUNT(*) >= 2))
            SELECT m.nm AS n_customers_multi, pr.np AS n_dated_pairs,
                   pr.conc AS concordant_pairs,
                   pr.disc AS discordant_pairs,
                   CAST(CASE WHEN pr.conc + pr.disc > 0 THEN
                        (CASE WHEN pr.conc >= pr.disc
                              THEN 1 ELSE -1 END)
                        * (1000 * ABS(pr.conc - pr.disc)
                           // (pr.conc + pr.disc))
                        ELSE 0 END AS BIGINT) AS gamma_milli
            FROM pr, m
        """,
        "part_size_price_gamma": """
            WITH g AS (SELECT CAST(p_size AS BIGINT) AS a,
                              CAST(FLOOR(p_retailprice * 100)
                                   AS BIGINT) // 100 AS b,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM part GROUP BY 1, 2),
            p AS (SELECT CAST(SUM(CASE WHEN x.a < y.a AND x.b < y.b
                                       THEN x.c * y.c ELSE 0 END)
                              AS BIGINT) AS conc,
                         CAST(SUM(CASE WHEN x.a < y.a AND x.b > y.b
                                       THEN x.c * y.c ELSE 0 END)
                              AS BIGINT) AS disc
                  FROM g x, g y),
            s AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                         MAX(a) - MIN(a) + 1 AS na,
                         MAX(b) - MIN(b) + 1 AS nb
                  FROM g)
            SELECT s.n AS n_parts, s.na AS n_sizes_span,
                   s.nb AS n_dollar_span,
                   p.conc AS concordant_pairs,
                   p.disc AS discordant_pairs,
                   CAST(CASE WHEN p.conc + p.disc > 0 THEN
                        (CASE WHEN p.conc >= p.disc
                              THEN 1 ELSE -1 END)
                        * (1000 * ABS(p.conc - p.disc)
                           // (p.conc + p.disc))
                        ELSE 0 END AS BIGINT) AS gamma_milli
            FROM p, s
        """,
        "segment_priority_mix": """
            WITH j AS (SELECT c_mktsegment AS seg,
                              CAST(SUBSTR(o_orderpriority, 1, 1)
                                   AS BIGINT) AS p
                       FROM orders
                       JOIN customer ON o_custkey = c_custkey),
            o AS (SELECT seg, p, CAST(COUNT(*) AS BIGINT) AS n
                  FROM j GROUP BY 1, 2),
            r AS (SELECT seg, CAST(SUM(n) AS BIGINT) AS rn
                  FROM o GROUP BY 1),
            c AS (SELECT p, CAST(SUM(n) AS BIGINT) AS cn
                  FROM o GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM o)
            SELECT o.seg AS segment, o.p AS priority,
                   o.n AS n_orders,
                   CAST(10000 * o.n // r.rn AS BIGINT)
                       AS seg_share_bps,
                   CAST(1000 * o.n * t.n // (r.rn * c.cn) - 1000
                        AS BIGINT) AS lift_milli
            FROM o JOIN r USING (seg) JOIN c USING (p), t
            ORDER BY 1, 2
        """,
        "lineitem_net_multiplier_census": """
            WITH d AS (SELECT (100 - CAST(FLOOR(l_discount * 100)
                                          AS BIGINT))
                             * (100 + CAST(FLOOR(l_tax * 100)
                                           AS BIGINT)) AS m,
                              CAST(FLOOR(l_extendedprice * 100)
                                   AS BIGINT) AS cents
                       FROM lineitem),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d)
            SELECT m AS multiplier, CAST(COUNT(*) AS BIGINT)
                       AS n_lines,
                   CAST(10000 * COUNT(*) // MAX(t.n) AS BIGINT)
                       AS line_share_bps,
                   CAST(SUM(cents) AS BIGINT) AS gross_cents,
                   CAST(SUM(cents) * m // 10000 AS BIGINT)
                       AS net_cents
            FROM d, t GROUP BY m ORDER BY m
        """,
        "embedding_dim_sign_balance": """
            WITH u AS (
              SELECT unnest(embedding) AS v,
                     unnest(generate_series(1, len(embedding)))
                         AS dim
              FROM embeddings)
            SELECT CAST(dim AS BIGINT) AS dim,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN CAST(v AS DOUBLE) > 0
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_pos,
                   CAST(SUM(CASE WHEN CAST(v AS DOUBLE) = 0
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_zero,
                   CAST(10000 * SUM(CASE WHEN CAST(v AS DOUBLE) > 0
                                         THEN 1 ELSE 0 END)
                        // COUNT(*) AS BIGINT) AS pos_bps
            FROM u GROUP BY dim ORDER BY dim
        """,
        "nation_supplier_activity_hhi": """
            WITH l AS (SELECT l_suppkey AS s,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM lineitem GROUP BY 1),
            a AS (SELECT s_nationkey AS k, COALESCE(l.c, 0) AS c
                  FROM supplier LEFT JOIN l ON l.s = s_suppkey),
            g AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
                         CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END)
                              AS BIGINT) AS n_active,
                         CAST(SUM(c) AS BIGINT) AS n_lines,
                         CAST(SUM(c * c) AS BIGINT) AS ss,
                         CAST(MAX(c) AS BIGINT) AS mx
                  FROM a GROUP BY 1)
            SELECT n_name AS nation, g.n_suppliers, g.n_active,
                   g.n_lines,
                   CAST(CASE WHEN g.n_lines > 0 THEN
                        CAST(g.ss AS HUGEINT) * 100000000
                        // (CAST(g.n_lines AS HUGEINT) * g.n_lines)
                        ELSE -1 END AS BIGINT) AS hhi_e8,
                   CAST(CASE WHEN g.n_lines > 0 THEN
                        10000 * g.mx // g.n_lines
                        ELSE -1 END AS BIGINT) AS top_share_bps
            FROM g JOIN nation ON n_nationkey = g.k ORDER BY nation
        """,
        "order_ship_span_census": """
            WITH o AS (SELECT l_orderkey AS k,
                              MAX(epoch_us(l_shipdate)
                                  // 86400000000)
                              - MIN(epoch_us(l_shipdate)
                                    // 86400000000) AS span
                       FROM lineitem GROUP BY 1),
            b AS (SELECT CASE WHEN span = 0 THEN 0
                              WHEN span <= 7 THEN 1
                              WHEN span <= 30 THEN 2
                              WHEN span <= 90 THEN 3
                              ELSE 4 END AS band, span FROM o),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(span) AS BIGINT) AS ss FROM o)
            SELECT band, CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(10000 * COUNT(*) // MAX(t.n) AS BIGINT)
                       AS share_bps,
                   CAST(1000 * MAX(t.ss) // MAX(t.n) AS BIGINT)
                       AS mean_span_milli
            FROM b, t GROUP BY band ORDER BY band
        """,
        "embedding_label_doc_mix": """
            WITH j AS (SELECT e.label AS label, d.lang AS lang
                       FROM embeddings e
                       JOIN documents d ON e.vec_id = d.doc_id),
            o AS (SELECT label, lang, CAST(COUNT(*) AS BIGINT) AS n
                  FROM j GROUP BY 1, 2),
            r AS (SELECT label, CAST(SUM(n) AS BIGINT) AS rn
                  FROM o GROUP BY 1),
            c AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS cn
                  FROM o GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM o)
            SELECT CAST(o.label AS BIGINT) AS label, o.lang,
                   o.n AS n_vecs,
                   CAST(10000 * o.n // r.rn AS BIGINT)
                       AS label_share_bps,
                   CAST(1000 * o.n * t.n // (r.rn * c.cn) - 1000
                        AS BIGINT) AS lift_milli
            FROM o JOIN r USING (label) JOIN c USING (lang), t
            ORDER BY 1, 2
        """,
        "embedding_coverage_by_source": """
            WITH j AS (SELECT d.source,
                              CASE WHEN e.vec_id IS NULL
                                   THEN 0 ELSE 1 END AS has
                       FROM documents d
                       LEFT JOIN embeddings e
                            ON e.vec_id = d.doc_id)
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(has) AS BIGINT) AS n_with_vec,
                   CAST(10000 * SUM(has) // COUNT(*) AS BIGINT)
                       AS coverage_bps
            FROM j GROUP BY 1 ORDER BY 1
        """,
        "part_competition_price_spread": """
            WITH u AS (SELECT l_partkey AS p, l_suppkey AS s,
                              CAST(FLOOR(l_extendedprice * 100)
                                   AS BIGINT)
                              // CAST(FLOOR(l_quantity) AS BIGINT)
                                  AS uc
                       FROM lineitem),
            pp AS (SELECT p, CAST(COUNT(DISTINCT s) AS BIGINT)
                              AS ns,
                          CAST(MIN(uc) AS BIGINT) AS mn,
                          CAST(MAX(uc) AS BIGINT) AS mx
                   FROM u GROUP BY 1),
            lv AS (SELECT LEAST(ns, 10) AS level,
                          LEAST(10000 * (mx - mn)
                                // GREATEST(mn, 1), 10000) AS sp
                   FROM pp),
            r AS (SELECT level, sp, CAST(COUNT(*) AS BIGINT) AS c
                  FROM lv GROUP BY 1, 2),
            w AS (SELECT level, sp, c,
                         SUM(c) OVER (PARTITION BY level ORDER BY sp
                                      ROWS UNBOUNDED PRECEDING)
                             AS cum,
                         SUM(c) OVER (PARTITION BY level) AS n,
                         SUM(sp * c) OVER (PARTITION BY level)
                             AS ssum
                  FROM r)
            SELECT CAST(level AS BIGINT) AS n_suppliers_capped,
                   CAST(MAX(n) AS BIGINT) AS n_parts,
                   CAST(1000 * MAX(ssum) // MAX(n) AS BIGINT)
                       AS mean_spread_bp_milli,
                   CAST(MIN(sp) FILTER (
                        cum >= (50 * n + 99) // 100) AS BIGINT)
                       AS p50_spread_bp
            FROM w GROUP BY level ORDER BY 1
        """,
        "lineitem_price_divisibility_audit": """
            WITH d AS (SELECT CAST(FLOOR(l_quantity) AS BIGINT)
                                  AS q,
                              CASE WHEN CAST(FLOOR(l_extendedprice
                                                   * 100) AS BIGINT)
                                        % CAST(FLOOR(l_quantity)
                                               AS BIGINT) = 0
                                   THEN 1 ELSE 0 END AS dv
                       FROM lineitem)
            SELECT q AS quantity, CAST(COUNT(*) AS BIGINT)
                       AS n_lines,
                   CAST(SUM(dv) AS BIGINT) AS n_divisible,
                   CAST(10000 * SUM(dv) // COUNT(*) AS BIGINT)
                       AS div_bps
            FROM d GROUP BY q ORDER BY q
        """,
        "customer_same_day_orders": """
            WITH cd AS (SELECT o_custkey AS c,
                               epoch_us(o_orderdate) // 86400000000
                                   AS d,
                               CAST(COUNT(*) AS BIGINT) AS k
                        FROM orders GROUP BY 1, 2),
            cu AS (SELECT c, CAST(MAX(k) AS BIGINT) AS mx
                   FROM cd GROUP BY c),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
                         CAST(SUM(CASE WHEN mx >= 2
                                       THEN 1 ELSE 0 END)
                              AS BIGINT) AS n_same FROM cu),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_multi,
                         CAST(COALESCE(SUM(k) FILTER (k >= 2), 0)
                              AS BIGINT) AS n_orders_multi,
                         CAST(MAX(k) AS BIGINT) AS mx1
                  FROM cd WHERE k >= 2),
            mm AS (SELECT CAST(MAX(k) AS BIGINT) AS max_all FROM cd)
            SELECT t.n_customers, t.n_same AS n_cust_same_day,
                   CAST(10000 * t.n_same // t.n_customers AS BIGINT)
                       AS same_day_bps,
                   m.n_multi AS n_multi_days,
                   m.n_orders_multi AS n_orders_on_multi_days,
                   mm.max_all AS max_one_day
            FROM t, m, mm
        """,
        "user_weekend_value_census": """
            WITH u AS (SELECT user_id AS c,
                              CAST(SUM(CAST(FLOOR(value * 100)
                                            AS BIGINT)) AS BIGINT)
                                  AS tv,
                              CAST(SUM(CASE WHEN
                                       (epoch_us(ts) // 86400000000
                                        + 4) % 7 IN (0, 6)
                                       THEN CAST(FLOOR(value * 100)
                                                 AS BIGINT)
                                       ELSE 0 END) AS BIGINT) AS wv
                       FROM events GROUP BY 1),
            b AS (SELECT CASE WHEN tv = 0 THEN 0
                              WHEN wv = 0 THEN 1
                              WHEN 100 * wv < 25 * tv THEN 2
                              WHEN 100 * wv < 50 * tv THEN 3
                              WHEN 100 * wv < 75 * tv THEN 4
                              ELSE 5 END AS band FROM u),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM u)
            SELECT band, CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(10000 * COUNT(*) // MAX(t.n) AS BIGINT)
                       AS share_bps
            FROM b, t GROUP BY band ORDER BY band
        """,
        "embedding_norm_vs_doclen": """
            WITH nv AS (SELECT vec_id,
                               CAST(SUM(
                                   CAST(FLOOR(CAST(v AS DOUBLE)
                                              * 1000000.0)
                                        AS BIGINT)
                                   * CAST(FLOOR(CAST(v AS DOUBLE)
                                                * 1000000.0)
                                          AS BIGINT)) AS BIGINT)
                                   AS n2
                        FROM (SELECT vec_id, unnest(embedding) AS v
                              FROM embeddings) GROUP BY 1),
            j AS (SELECT LEAST(d.n_chars // 100, 9) AS band, nv.n2
                  FROM nv JOIN documents d ON d.doc_id = nv.vec_id)
            SELECT CAST(band AS BIGINT) AS len_band,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n2) // COUNT(*) AS BIGINT)
                       AS mean_norm2_fp,
                   CAST(MIN(n2) AS BIGINT) AS min_norm2_fp,
                   CAST(MAX(n2) AS BIGINT) AS max_norm2_fp
            FROM j GROUP BY 1 ORDER BY 1
        """,
        "nation_price_premium": """
            WITH u AS (SELECT l_partkey AS p, l_suppkey AS s,
                              CAST(FLOOR(l_extendedprice * 100)
                                   AS BIGINT)
                              // CAST(FLOOR(l_quantity) AS BIGINT)
                                  AS uc
                       FROM lineitem),
            pa_ AS (SELECT p, CAST(SUM(uc) AS BIGINT) AS ps,
                           CAST(COUNT(*) AS BIGINT) AS pc
                    FROM u GROUP BY 1),
            r AS (SELECT s_nationkey AS k,
                         10000 * u.uc * pa_.pc // pa_.ps AS rel
                  FROM u JOIN pa_ USING (p)
                         JOIN supplier ON s_suppkey = u.s)
            SELECT n_name AS nation,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(1000 * SUM(rel) // COUNT(*) AS BIGINT)
                       AS rel_price_milli_bp
            FROM r JOIN nation ON n_nationkey = r.k
            GROUP BY 1 ORDER BY 1
        """,
        "returns_by_quantity_band": """
            WITH d AS (SELECT LEAST(GREATEST(
                                  (CAST(FLOOR(l_quantity) AS BIGINT)
                                   - 1) // 10, 0), 4) AS b,
                              CASE WHEN l_returnflag = 'R'
                                   THEN 1 ELSE 0 END AS r
                       FROM lineitem),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(r) AS BIGINT) AS rt FROM d)
            SELECT b AS qty_band,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(r) AS BIGINT) AS n_returned,
                   CAST(10000 * SUM(r) // COUNT(*) AS BIGINT)
                       AS return_bps,
                   CAST(CASE WHEN MAX(t.rt) > 0 THEN
                        1000 * SUM(r) * MAX(t.n)
                        // (COUNT(*) * MAX(t.rt)) - 1000
                        ELSE -9999 END AS BIGINT) AS lift_milli
            FROM d, t GROUP BY b ORDER BY b
        """,
        "order_size_discount_curve": """
            WITH o AS (SELECT l_orderkey AS k,
                              CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(SUM(CAST(FLOOR(l_discount * 100)
                                            AS BIGINT)) AS BIGINT)
                                  AS s
                       FROM lineitem GROUP BY 1),
            b AS (SELECT LEAST(n, 7) AS band, n, s FROM o)
            SELECT band AS line_band,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(n) AS BIGINT) AS n_lines,
                   CAST(1000 * SUM(s) // SUM(n) AS BIGINT)
                       AS mean_disc_pct_milli
            FROM b GROUP BY band ORDER BY band
        """,
        "supplier_month_coverage": """
            WITH sm AS (SELECT DISTINCT l_suppkey AS s,
                               epoch_us(l_shipdate) // 86400000000
                                   // 30 AS m
                        FROM lineitem),
            su AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS act,
                          CAST(MAX(m) - MIN(m) + 1 AS BIGINT)
                              AS span
                   FROM sm GROUP BY s),
            b AS (SELECT CASE WHEN span = 1 THEN 0
                              WHEN 100 * act < 25 * span THEN 1
                              WHEN 100 * act < 50 * span THEN 2
                              WHEN 100 * act < 75 * span THEN 3
                              ELSE 4 END AS band FROM su),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM su)
            SELECT band, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
                   CAST(10000 * COUNT(*) // MAX(t.n) AS BIGINT)
                       AS share_bps
            FROM b, t GROUP BY band ORDER BY band
        """,
        "user_day_opening_type": """
            WITH r AS (SELECT event_type,
                              ROW_NUMBER() OVER (
                                  PARTITION BY user_id,
                                      epoch_us(ts) // 86400000000
                                  ORDER BY ts, event_id) AS rn
                       FROM events),
            f AS (SELECT event_type FROM r WHERE rn = 1),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM f)
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_opens,
                   CAST(10000 * COUNT(*) // MAX(t.n) AS BIGINT)
                       AS share_bps
            FROM f, t GROUP BY 1 ORDER BY 1
        """,
        "part_assortment_churn": """
            WITH b AS (SELECT (MIN(epoch_us(l_shipdate)
                                   // 86400000000)
                             + MAX(epoch_us(l_shipdate)
                                   // 86400000000)) // 2 AS mid
                       FROM lineitem),
            p AS (SELECT l_partkey AS p,
                         MAX(CASE WHEN epoch_us(l_shipdate)
                                       // 86400000000 <= b.mid
                                  THEN 1 ELSE 0 END) AS h1,
                         MAX(CASE WHEN epoch_us(l_shipdate)
                                       // 86400000000 > b.mid
                                  THEN 1 ELSE 0 END) AS h2
                  FROM lineitem, b GROUP BY 1)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_parts_sold,
                   CAST(SUM(h1 * h2) AS BIGINT) AS n_both,
                   CAST(SUM(CASE WHEN h1 = 1 AND h2 = 0
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_only_h1,
                   CAST(SUM(CASE WHEN h1 = 0 AND h2 = 1
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_only_h2,
                   CAST(10000 * SUM(h1 * h2)
                        // (SUM(h1 * h2)
                            + SUM(CASE WHEN h1 = 1 AND h2 = 0
                                       THEN 1 ELSE 0 END))
                        AS BIGINT) AS retention_bps
            FROM p
        """,
        "customer_activity_balance_gamma": """
            WITH l AS (SELECT o_custkey AS k,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM orders GROUP BY 1),
            a AS (SELECT LEAST(COALESCE(l.c, 0), 1000) AS a,
                         (CAST(FLOOR(c_acctbal * 100) AS BIGINT)
                          + 100000) // 10000 AS b,
                         CASE WHEN COALESCE(l.c, 0) > 0
                              THEN 1 ELSE 0 END AS act
                  FROM customer LEFT JOIN l ON l.k = c_custkey),
            g AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c
                  FROM a GROUP BY 1, 2),
            p AS (SELECT CAST(SUM(CASE WHEN x.a < y.a AND x.b < y.b
                                       THEN x.c * y.c ELSE 0 END)
                              AS BIGINT) AS conc,
                         CAST(SUM(CASE WHEN x.a < y.a AND x.b > y.b
                                       THEN x.c * y.c ELSE 0 END)
                              AS BIGINT) AS disc
                  FROM g x, g y),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(act) AS BIGINT) AS na FROM a)
            SELECT t.n AS n_customers, t.na AS n_active,
                   p.conc AS concordant_pairs,
                   p.disc AS discordant_pairs,
                   CAST(CASE WHEN p.conc + p.disc > 0 THEN
                        (CASE WHEN p.conc >= p.disc
                              THEN 1 ELSE -1 END)
                        * (1000 * ABS(p.conc - p.disc)
                           // (p.conc + p.disc))
                        ELSE 0 END AS BIGINT) AS gamma_milli
            FROM p, t
        """,
        "user_daily_intensity_census": """
            WITH ud AS (SELECT user_id AS u,
                               epoch_us(ts) // 86400000000 AS d,
                               CAST(SUM(CAST(FLOOR(value * 100)
                                             AS BIGINT)) AS BIGINT)
                                   AS s
                        FROM events GROUP BY 1, 2),
            cu AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS days,
                          CAST(SUM(s) AS BIGINT) AS tv
                   FROM ud GROUP BY 1),
            b AS (SELECT CASE WHEN tv // days = 0 THEN 0
                              WHEN tv // days < 1000 THEN 1
                              WHEN tv // days < 5000 THEN 2
                              WHEN tv // days < 20000 THEN 3
                              ELSE 4 END AS band FROM cu),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cu)
            SELECT band, CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(10000 * COUNT(*) // MAX(t.n) AS BIGINT)
                       AS share_bps
            FROM b, t GROUP BY band ORDER BY band
        """,
        "customer_order_momentum": """
            WITH o AS (SELECT o_custkey AS c,
                              epoch_us(o_orderdate) // 86400000000
                                  AS d,
                              o_orderkey AS k,
                              CAST(FLOOR(o_totalprice * 100)
                                   AS BIGINT) AS v
                       FROM orders),
            p AS (SELECT c, v,
                         LEAD(v) OVER (PARTITION BY c
                                       ORDER BY d, k) AS nv
                  FROM o),
            s AS (SELECT CAST(SUM(CASE WHEN nv > v THEN 1 ELSE 0
                                  END) AS BIGINT) AS up,
                         CAST(SUM(CASE WHEN nv < v THEN 1 ELSE 0
                                  END) AS BIGINT) AS dn,
                         CAST(SUM(CASE WHEN nv = v THEN 1 ELSE 0
                                  END) AS BIGINT) AS fl
                  FROM p WHERE nv IS NOT NULL)
            SELECT up + dn + fl AS n_pairs, up AS n_up,
                   dn AS n_down, fl AS n_flat,
                   CAST(CASE WHEN up + dn > 0
                             THEN 10000 * up // (up + dn)
                             ELSE -9999 END AS BIGINT)
                       AS up_share_bps,
                   CAST(CASE WHEN up + dn > 0 THEN
                        (CASE WHEN up >= dn THEN 1 ELSE -1 END)
                        * (1000 * ABS(up - dn) // (up + dn))
                        ELSE 0 END AS BIGINT)
                       AS momentum_gamma_milli
            FROM s
        """,
        "revenue_inequality_decomposition": """
            WITH r AS (SELECT o_custkey AS k,
                              CAST(SUM(CAST(FLOOR(o_totalprice
                                                  * 100) AS BIGINT))
                                   AS BIGINT) AS x
                       FROM orders GROUP BY 1),
            j AS (SELECT r.x, c_nationkey AS nk
                  FROM r JOIN customer ON c_custkey = r.k),
            g AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS rn,
                         COUNT(*) OVER () AS n FROM j),
            sa AS (SELECT CAST(SUM((2 * rn - n - 1) * x) AS BIGINT)
                              AS s,
                          CAST(MAX(n) AS BIGINT) AS n,
                          CAST(SUM(x) AS BIGINT) AS t FROM g),
            gw AS (SELECT x, ROW_NUMBER() OVER (PARTITION BY nk
                                                ORDER BY x) AS rn,
                          COUNT(*) OVER (PARTITION BY nk) AS n
                   FROM j),
            sw AS (SELECT CAST(SUM((2 * rn - n - 1) * x) AS BIGINT)
                              AS s FROM gw)
            SELECT sa.n AS n_customers, sa.t AS total_cents,
                   CAST(CASE WHEN sa.t > 0 THEN
                        1000 * CAST(sa.s AS HUGEINT)
                        // (2 * CAST(sa.n AS HUGEINT) * sa.t)
                        ELSE 0 END AS BIGINT) AS gini_milli,
                   CAST(CASE WHEN sa.s > 0 THEN
                        1000 * CAST(sw.s AS HUGEINT) // sa.s
                        ELSE 0 END AS BIGINT)
                       AS within_share_milli,
                   CAST(CASE WHEN sa.s > 0 THEN
                        1000 * (CAST(sa.s AS HUGEINT) - sw.s)
                        // sa.s
                        ELSE 0 END AS BIGINT)
                       AS between_share_milli
            FROM sa, sw
        """,
        "event_type_launch_profile": """
            WITH e AS (SELECT event_type AS t,
                              epoch_us(ts) // 86400000000 AS d
                       FROM events),
            g AS (SELECT t, CAST(MIN(d) AS BIGINT) AS first_day,
                         CAST(MAX(d) AS BIGINT) AS last_day,
                         CAST(COUNT(*) AS BIGINT) AS n
                  FROM e GROUP BY t),
            w AS (SELECT e.t, CAST(COUNT(*) AS BIGINT) AS wk
                  FROM e JOIN g ON g.t = e.t
                  WHERE e.d <= g.first_day + 6 GROUP BY e.t)
            SELECT g.t AS event_type, g.first_day, g.last_day,
                   g.last_day - g.first_day + 1 AS span_days,
                   g.n AS n_events, w.wk AS n_first_week,
                   CAST(10000 * w.wk // g.n AS BIGINT)
                       AS launch_week_bps
            FROM g JOIN w ON w.t = g.t ORDER BY 1
        """,
        "linestatus_boundary_audit": """
            WITH s AS (SELECT l_linestatus AS st,
                              CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(MIN(epoch_us(l_shipdate)
                                       // 86400000000) AS BIGINT)
                                  AS mn,
                              CAST(MAX(epoch_us(l_shipdate)
                                       // 86400000000) AS BIGINT)
                                  AS mx
                       FROM lineitem GROUP BY 1),
            ov AS (SELECT COALESCE(
                       (SELECT f.mx - o.mn + 1
                        FROM s f, s o
                        WHERE f.st = 'F' AND o.st = 'O'), -1)
                       AS overlap)
            SELECT st AS linestatus, n AS n_lines, mn AS min_day,
                   mx AS max_day,
                   CAST(ov.overlap AS BIGINT) AS overlap_days
            FROM s, ov ORDER BY st
        """,
        "ship_before_order_audit": """
            WITH j AS (SELECT epoch_us(l_shipdate) // 86400000000
                              - epoch_us(o_orderdate) // 86400000000
                                  AS lag
                       FROM lineitem
                       JOIN orders ON o_orderkey = l_orderkey)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(CASE WHEN lag < 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_violations,
                   CAST(10000 * SUM(CASE WHEN lag < 0
                                         THEN 1 ELSE 0 END)
                        // COUNT(*) AS BIGINT) AS violation_bps,
                   CAST(MIN(lag) AS BIGINT) AS min_lag_days,
                   CAST(MAX(lag) AS BIGINT) AS max_lag_days
            FROM j
        """,
        "ship_dow_profile": """
            WITH d AS (SELECT (epoch_us(l_shipdate) // 86400000000
                               + 4) % 7 AS dow,
                              CAST(FLOOR(l_extendedprice * 100)
                                   AS BIGINT) AS cents
                       FROM lineitem),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d)
            SELECT CAST(dow AS BIGINT) AS dow,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(10000 * COUNT(*) // MAX(t.n) AS BIGINT)
                       AS share_bps,
                   CAST(SUM(cents) AS BIGINT) AS gross_cents
            FROM d, t GROUP BY dow ORDER BY dow
        """,
        "event_type_intraday_cadence": """
            WITH e AS (SELECT event_type AS t,
                              epoch_us(ts) // 86400000000 AS d,
                              ts, event_id
                       FROM events),
            g AS (SELECT t,
                         (epoch_us(LEAD(ts) OVER w)
                          - epoch_us(ts)) // 1000000 AS gap
                  FROM e WINDOW w AS (PARTITION BY t, d
                                      ORDER BY ts, event_id)),
            h AS (SELECT t, gap, CAST(COUNT(*) AS BIGINT) AS c
                  FROM g WHERE gap IS NOT NULL GROUP BY 1, 2),
            w2 AS (SELECT t, gap, c,
                          SUM(c) OVER (PARTITION BY t ORDER BY gap
                                       ROWS UNBOUNDED PRECEDING)
                              AS cum,
                          SUM(c) OVER (PARTITION BY t) AS n,
                          SUM(gap * c) OVER (PARTITION BY t) AS s
                   FROM h)
            SELECT t AS event_type,
                   CAST(MAX(n) AS BIGINT) AS n_gaps,
                   CAST(MIN(gap) FILTER (
                        cum >= (50 * n + 99) // 100) AS BIGINT)
                       AS p50_gap_s,
                   CAST(1000 * MAX(s) // MAX(n) AS BIGINT)
                       AS mean_gap_milli_s
            FROM w2 GROUP BY t ORDER BY t
        """,
        "status_priority_mix": """
            WITH o AS (SELECT o_orderstatus AS st,
                              CAST(SUBSTR(o_orderpriority, 1, 1)
                                   AS BIGINT) AS p,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM orders GROUP BY 1, 2),
            r AS (SELECT st, CAST(SUM(n) AS BIGINT) AS rn
                  FROM o GROUP BY 1),
            c AS (SELECT p, CAST(SUM(n) AS BIGINT) AS cn
                  FROM o GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM o)
            SELECT o.st AS orderstatus, o.p AS priority,
                   o.n AS n_orders,
                   CAST(10000 * o.n // r.rn AS BIGINT)
                       AS status_share_bps,
                   CAST(1000 * o.n * t.n // (r.rn * c.cn) - 1000
                        AS BIGINT) AS lift_milli
            FROM o JOIN r USING (st) JOIN c USING (p), t
            ORDER BY 1, 2
        """,
        "tax_uniformity_by_nation": """
            WITH l AS (SELECT s_nationkey AS k,
                              CAST(FLOOR(l_tax * 100) AS BIGINT)
                                  AS tx
                       FROM lineitem
                       JOIN supplier ON s_suppkey = l_suppkey),
            o AS (SELECT k, tx, CAST(COUNT(*) AS BIGINT) AS c
                  FROM l GROUP BY 1, 2),
            r AS (SELECT k, CAST(SUM(c) AS BIGINT) AS rn,
                         CAST(SUM(tx * c) AS BIGINT) AS ts
                  FROM o GROUP BY 1),
            ct AS (SELECT tx, CAST(SUM(c) AS BIGINT) AS cn
                   FROM o GROUP BY 1),
            t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM o),
            grid AS (SELECT r.k, ct.tx, r.rn, ct.cn,
                            COALESCE(o.c, 0) AS c
                     FROM r CROSS JOIN ct
                     LEFT JOIN o ON o.k = r.k AND o.tx = ct.tx),
            chi AS (SELECT k, CAST(SUM(
                        (t.n * CAST(c AS HUGEINT)
                         - rn * CAST(cn AS HUGEINT))
                        * (t.n * CAST(c AS HUGEINT)
                           - rn * CAST(cn AS HUGEINT))
                        * 1000000
                        // (CAST(t.n AS HUGEINT) * rn * cn))
                        AS BIGINT) AS chi2
                    FROM grid, t GROUP BY k)
            SELECT n_name AS nation, r.rn AS n_lines,
                   CAST(1000 * r.ts // r.rn AS BIGINT)
                       AS mean_tax_pct_milli,
                   chi.chi2 AS chi2_micro
            FROM r JOIN chi USING (k)
                   JOIN nation ON n_nationkey = r.k
            ORDER BY nation
        """,
        "event_id_day_monotonicity": """
            WITH g AS (SELECT epoch_us(ts) // 86400000000 AS d,
                              CAST(MIN(event_id) AS BIGINT) AS mn,
                              CAST(MAX(event_id) AS BIGINT) AS mx
                       FROM events GROUP BY 1),
            w AS (SELECT d, mn, mx, LAG(mx) OVER (ORDER BY d)
                             AS pmx FROM g),
            s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                         CAST(SUM(CASE WHEN pmx IS NOT NULL
                                            AND pmx > mn
                                       THEN 1 ELSE 0 END)
                              AS BIGINT) AS bad,
                         CAST(COALESCE(MAX(pmx - mn) FILTER (
                              pmx IS NOT NULL), 0) AS BIGINT)
                             AS worst
                  FROM w)
            SELECT n_days, n_days - 1 AS n_boundaries,
                   bad AS n_overlaps,
                   CAST(CASE WHEN n_days > 1
                             THEN 10000 * bad // (n_days - 1)
                             ELSE 0 END AS BIGINT) AS overlap_bps,
                   CAST(GREATEST(worst, 0) AS BIGINT)
                       AS worst_undercut
            FROM s
        """,
        "segment_one_and_done": """
            WITH a AS (SELECT o_custkey AS k,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM orders GROUP BY 1),
            cu AS (SELECT c_mktsegment AS seg, COALESCE(a.c, 0)
                              AS c
                   FROM customer LEFT JOIN a ON a.k = c_custkey),
            t AS (SELECT CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0
                                  END) AS BIGINT) AS ts,
                         CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0
                                  END) AS BIGINT) AS toa FROM cu)
            SELECT seg AS segment,
                   CAST(COUNT(*) AS BIGINT) AS n_customers,
                   CAST(SUM(CASE WHEN c = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_never,
                   CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_single,
                   CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_multi,
                   CAST(CASE WHEN SUM(CASE WHEN c > 0 THEN 1 ELSE 0
                                      END) > 0 THEN
                        10000 * SUM(CASE WHEN c = 1 THEN 1 ELSE 0
                                    END)
                        // SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END)
                        ELSE -9999 END AS BIGINT) AS single_bps,
                   CAST(CASE WHEN SUM(CASE WHEN c > 0 THEN 1 ELSE 0
                                      END) > 0 AND MAX(t.ts) > 0
                        THEN 1000 * SUM(CASE WHEN c = 1
                                             THEN 1 ELSE 0 END)
                             * MAX(t.toa)
                             // (SUM(CASE WHEN c > 0
                                          THEN 1 ELSE 0 END)
                                 * MAX(t.ts)) - 1000
                        ELSE -9999 END AS BIGINT) AS lift_milli
            FROM cu, t GROUP BY seg ORDER BY seg
        """,
        "user_spend_maturation": """
            WITH e AS (SELECT user_id AS u,
                              CAST(FLOOR(value * 100) AS BIGINT)
                                  AS v,
                              ROW_NUMBER() OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
                              COUNT(*) OVER (PARTITION BY user_id)
                                  AS n
                       FROM events),
            h AS (SELECT u, CAST(MAX(n) AS BIGINT) AS n,
                         CAST(SUM(CASE WHEN rn <= n // 2 THEN v
                                       ELSE 0 END) AS BIGINT)
                             AS s1,
                         CAST(SUM(CASE WHEN rn > n // 2 THEN v
                                       ELSE 0 END) AS BIGINT)
                             AS s2
                  FROM e GROUP BY u HAVING MAX(n) >= 2),
            c AS (SELECT CAST(COUNT(*) AS BIGINT) AS nm,
                         CAST(SUM(CASE WHEN s2 * (n // 2)
                                            > s1 * (n - n // 2)
                                       THEN 1 ELSE 0 END)
                              AS BIGINT) AS up,
                         CAST(SUM(CASE WHEN s2 * (n // 2)
                                            < s1 * (n - n // 2)
                                       THEN 1 ELSE 0 END)
                              AS BIGINT) AS dn,
                         CAST(SUM(CASE WHEN s2 * (n // 2)
                                            = s1 * (n - n // 2)
                                       THEN 1 ELSE 0 END)
                              AS BIGINT) AS fl
                  FROM h)
            SELECT nm AS n_users_multi, up AS n_up, dn AS n_down,
                   fl AS n_flat,
                   CAST(CASE WHEN up + dn > 0
                             THEN 10000 * up // (up + dn)
                             ELSE -9999 END AS BIGINT)
                       AS up_share_bps
            FROM c
        """,
        "part_three_way_independence": """
            WITH g AS (SELECT p_brand AS b, p_type AS t,
                              CAST(p_size AS BIGINT) AS s,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM part GROUP BY 1, 2, 3),
            rb AS (SELECT b, CAST(SUM(n) AS BIGINT) AS rn
                   FROM g GROUP BY 1),
            rt AS (SELECT t, CAST(SUM(n) AS BIGINT) AS tn
                   FROM g GROUP BY 1),
            rs AS (SELECT s, CAST(SUM(n) AS BIGINT) AS sn
                   FROM g GROUP BY 1),
            tt AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM g),
            grid AS (SELECT rb.rn, rt.tn, rs.sn,
                            COALESCE(g.n, 0) AS o
                     FROM rb CROSS JOIN rt CROSS JOIN rs
                     LEFT JOIN g ON g.b = rb.b AND g.t = rt.t
                                    AND g.s = rs.s),
            chi AS (SELECT CAST(SUM(
                        1000 * (CAST(tt.n AS HUGEINT) * tt.n * o
                                - CAST(rn AS HUGEINT) * tn * sn)
                             * (CAST(tt.n AS HUGEINT) * tt.n * o
                                - CAST(rn AS HUGEINT) * tn * sn)
                        // (CAST(tt.n AS HUGEINT) * tt.n
                            * rn * tn * sn)) AS BIGINT) AS chi2,
                           CAST(COUNT(*) FILTER (o > 0) AS BIGINT)
                               AS occ
                    FROM grid, tt),
            m AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rb)
                             AS nb,
                         (SELECT CAST(COUNT(*) AS BIGINT) FROM rt)
                             AS nt,
                         (SELECT CAST(COUNT(*) AS BIGINT) FROM rs)
                             AS ns)
            SELECT tt.n AS n_parts, m.nb AS n_brands,
                   m.nt AS n_types, m.ns AS n_sizes,
                   chi.occ AS n_cells_occupied,
                   m.nb * m.nt * m.ns - (m.nb - 1) - (m.nt - 1)
                       - (m.ns - 1) - 1 AS df,
                   chi.chi2 AS chi2_milli
            FROM tt, chi, m
        """,
        "user_error_exposure": """
            WITH r AS (SELECT user_id AS u,
                              CASE WHEN event_type = 'error'
                                   THEN 1 ELSE 0 END AS err,
                              ROW_NUMBER() OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC)
                                  AS rl
                       FROM events),
            u AS (SELECT u, CAST(MAX(err) AS BIGINT) AS saw,
                         CAST(MAX(CASE WHEN rl = 1 THEN err END)
                              AS BIGINT) AS lerr
                  FROM r GROUP BY u),
            s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(saw) AS BIGINT) AS saw,
                         CAST(SUM(lerr) AS BIGINT) AS rage FROM u)
            SELECT n AS n_users, saw AS n_saw_error,
                   CAST(10000 * saw // n AS BIGINT)
                       AS exposure_bps,
                   rage AS n_rage_quit,
                   CAST(CASE WHEN saw > 0
                             THEN 10000 * rage // saw
                             ELSE -9999 END AS BIGINT)
                       AS rage_quit_bps
            FROM s
        """,
        "customer_value_gap_interaction": """
            WITH o AS (SELECT o_custkey AS c,
                              epoch_us(o_orderdate) // 86400000000
                                  AS d,
                              o_orderkey AS k,
                              CAST(FLOOR(o_totalprice * 100)
                                   AS BIGINT) AS v
                       FROM orders),
            cu AS (SELECT c, CAST(SUM(v) AS BIGINT) AS tv,
                          CAST(COUNT(*) AS BIGINT) AS n
                   FROM o GROUP BY 1),
            b AS (SELECT c, CASE WHEN tv < 150000000 THEN 0
                                 WHEN tv < 250000000 THEN 1
                                 WHEN tv < 350000000 THEN 2
                                 ELSE 3 END AS band, n FROM cu),
            gp AS (SELECT c, d - LAG(d) OVER (PARTITION BY c
                                              ORDER BY d, k)
                              AS gap FROM o),
            j AS (SELECT b.band, gp.gap FROM gp JOIN b USING (c)
                  WHERE gp.gap IS NOT NULL),
            h AS (SELECT band, gap, CAST(COUNT(*) AS BIGINT) AS cc
                  FROM j GROUP BY 1, 2),
            w AS (SELECT band, gap, cc,
                         SUM(cc) OVER (PARTITION BY band
                                       ORDER BY gap
                                       ROWS UNBOUNDED PRECEDING)
                             AS cum,
                         SUM(cc) OVER (PARTITION BY band) AS ng,
                         SUM(gap * cc) OVER (PARTITION BY band)
                             AS s
                  FROM h),
            nr AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS nrep
                   FROM b WHERE n >= 2 GROUP BY band)
            SELECT CAST(w.band AS BIGINT) AS value_band,
                   CAST(MAX(nr.nrep) AS BIGINT)
                       AS n_repeat_customers,
                   CAST(MAX(w.ng) AS BIGINT) AS n_gaps,
                   CAST(MIN(w.gap) FILTER (
                        w.cum >= (50 * w.ng + 99) // 100)
                        AS BIGINT) AS p50_gap_days,
                   CAST(1000 * MAX(w.s) // MAX(w.ng) AS BIGINT)
                       AS mean_gap_milli
            FROM w JOIN nr ON nr.band = w.band
            GROUP BY w.band ORDER BY 1
        """,
        "events_daily_load_factor": """
            WITH dh AS (SELECT epoch_us(ts) // 86400000000 AS d,
                               (epoch_us(ts) // 3600000000) % 24
                                   AS h,
                               CAST(COUNT(*) AS BIGINT) AS c
                        FROM events GROUP BY 1, 2),
            dd AS (SELECT d, CAST(1000 * 24 * MAX(c) // SUM(c)
                                  AS BIGINT) AS lf
                   FROM dh GROUP BY d),
            r AS (SELECT lf, ROW_NUMBER() OVER (ORDER BY lf) AS rn,
                         COUNT(*) OVER () AS n FROM dd),
            p AS (SELECT CAST(MIN(lf) FILTER (
                             rn >= (50 * n + 99) // 100) AS BIGINT)
                             AS p50,
                         CAST(MAX(n) AS BIGINT) AS n FROM r),
            wd AS (SELECT d, lf FROM dd
                   ORDER BY lf DESC, d LIMIT 1)
            SELECT p.n AS n_days, p.p50 AS p50_lf_milli,
                   CAST(wd.lf AS BIGINT) AS max_lf_milli,
                   CAST(wd.d AS BIGINT) AS max_day
            FROM p, wd
        """,
        "type_brand_dominance": """
            WITH j AS (SELECT p_type AS t, p_brand AS b,
                              CAST(FLOOR(l_extendedprice * 100)
                                   AS BIGINT) AS cents
                       FROM lineitem
                       JOIN part ON p_partkey = l_partkey),
            g AS (SELECT t, b, CAST(SUM(cents) AS BIGINT) AS s
                  FROM j GROUP BY 1, 2),
            tt AS (SELECT t, CAST(SUM(s) AS BIGINT) AS tot,
                          CAST(COUNT(*) AS BIGINT) AS nb
                   FROM g GROUP BY 1),
            top AS (SELECT t, b, s,
                           ROW_NUMBER() OVER (PARTITION BY t
                                              ORDER BY s DESC, b)
                               AS rn
                    FROM g)
            SELECT tt.t AS p_type, tt.tot AS gross_cents,
                   tt.nb AS n_brands, top.b AS top_brand,
                   CAST(10000 * top.s // tt.tot AS BIGINT)
                       AS top_share_bps
            FROM tt JOIN top ON top.t = tt.t AND top.rn = 1
            ORDER BY 1
        """,
        "user_day_type_breadth": """
            WITH b AS (SELECT user_id AS u,
                              epoch_us(ts) // 86400000000 AS d,
                              CAST(LEAST(COUNT(DISTINCT event_type),
                                         8) AS BIGINT) AS breadth
                       FROM events GROUP BY 1, 2),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b)
            SELECT breadth, CAST(COUNT(*) AS BIGINT)
                       AS n_user_days,
                   CAST(10000 * COUNT(*) // MAX(t.n) AS BIGINT)
                       AS share_bps
            FROM b, t GROUP BY breadth ORDER BY breadth
        """,
        "catalog_vs_street_price": """
            WITH cat AS (SELECT p_type AS t,
                                CAST(COUNT(*) AS BIGINT) AS np,
                                CAST(SUM(CAST(FLOOR(p_retailprice
                                                    * 100)
                                              AS BIGINT))
                                     AS BIGINT) AS cs
                         FROM part GROUP BY 1),
            st AS (SELECT p_type AS t,
                          CAST(COUNT(*) AS BIGINT) AS nl,
                          CAST(SUM(CAST(FLOOR(l_extendedprice
                                              * 100) AS BIGINT)
                                   // CAST(FLOOR(l_quantity)
                                           AS BIGINT)) AS BIGINT)
                              AS ss
                   FROM lineitem
                   JOIN part ON p_partkey = l_partkey GROUP BY 1)
            SELECT cat.t AS p_type, cat.np AS n_parts,
                   CAST(cat.cs // cat.np AS BIGINT)
                       AS catalog_mean_cents,
                   st.nl AS n_lines,
                   CAST(st.ss // st.nl AS BIGINT)
                       AS street_mean_cents,
                   CAST(1000 * (st.ss // st.nl)
                        // (cat.cs // cat.np) AS BIGINT)
                       AS street_to_list_milli
            FROM cat JOIN st ON st.t = cat.t ORDER BY 1
        """,
        "events_value_tail_share": """
            WITH h AS (SELECT CAST(FLOOR(value * 100) AS BIGINT)
                                  AS v,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM events GROUP BY 1),
            w AS (SELECT v, c,
                         SUM(c) OVER (ORDER BY v
                                      ROWS UNBOUNDED PRECEDING)
                             AS cum,
                         SUM(c) OVER () AS n,
                         SUM(v * c) OVER () AS tot FROM h),
            p AS (SELECT MIN(v) FILTER (
                             cum >= (99 * n + 99) // 100) AS p99,
                         MAX(n) AS n, MAX(tot) AS tot FROM w),
            t AS (SELECT CAST(SUM(c) AS BIGINT) AS tn,
                         CAST(SUM(v * c) AS BIGINT) AS tv
                  FROM h, p WHERE h.v >= p.p99)
            SELECT CAST(p.n AS BIGINT) AS n_events,
                   CAST(p.tot AS BIGINT) AS total_cents,
                   CAST(p.p99 AS BIGINT) AS p99_cents,
                   t.tn AS n_tail,
                   CAST(10000 * t.tn // p.n AS BIGINT)
                       AS tail_count_bps,
                   CAST(CASE WHEN p.tot > 0
                             THEN 10000 * t.tv // p.tot
                             ELSE -9999 END AS BIGINT)
                       AS tail_value_bps
            FROM p, t
        """,
        "price_leadership_topk": """
            WITH u AS (SELECT l_partkey AS p, l_suppkey AS s,
                              CAST(MIN(CAST(FLOOR(l_extendedprice
                                                  * 100) AS BIGINT)
                                       // CAST(FLOOR(l_quantity)
                                               AS BIGINT))
                                   AS BIGINT) AS mn
                       FROM lineitem GROUP BY 1, 2),
            pm AS (SELECT p, MIN(mn) AS m FROM u GROUP BY 1),
            cr AS (SELECT u.s, CAST(COUNT(*) AS BIGINT) AS credits
                   FROM u JOIN pm ON pm.p = u.p AND u.mn = pm.m
                   GROUP BY 1),
            np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pm)
            SELECT CAST(cr.s AS BIGINT) AS s_suppkey,
                   cr.credits AS n_lead_parts,
                   CAST(10000 * cr.credits // np.n AS BIGINT)
                       AS lead_rate_bps
            FROM cr, np ORDER BY cr.credits DESC, cr.s LIMIT 10
        """,
        "user_first_day_value_share": """
            WITH ud AS (SELECT user_id AS u,
                               epoch_us(ts) // 86400000000 AS d,
                               CAST(SUM(CAST(FLOOR(value * 100)
                                             AS BIGINT)) AS BIGINT)
                                   AS s
                        FROM events GROUP BY 1, 2),
            cu AS (SELECT u, CAST(SUM(s) AS BIGINT) AS tv,
                          CAST(MIN(d) AS BIGINT) AS fd
                   FROM ud GROUP BY 1),
            fv AS (SELECT ud.u, CAST(SUM(ud.s) AS BIGINT) AS fv
                   FROM ud JOIN cu ON cu.u = ud.u AND ud.d = cu.fd
                   GROUP BY 1),
            j AS (SELECT cu.tv, fv.fv FROM cu JOIN fv USING (u)
                  WHERE cu.tv > 0),
            b AS (SELECT CASE WHEN fv = 0 THEN 0
                              WHEN 100 * fv < 25 * tv THEN 1
                              WHEN 100 * fv < 50 * tv THEN 2
                              WHEN 100 * fv < 75 * tv THEN 3
                              WHEN fv < tv THEN 4
                              ELSE 5 END AS band FROM j),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM j)
            SELECT band, CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(10000 * COUNT(*) // MAX(t.n) AS BIGINT)
                       AS share_bps
            FROM b, t GROUP BY band ORDER BY band
        """,
        "order_discount_consistency": """
            WITH o AS (SELECT l_orderkey AS k,
                              CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(COUNT(DISTINCT
                                   CAST(FLOOR(l_discount * 100)
                                        AS BIGINT)) AS BIGINT)
                                  AS nlev
                       FROM lineitem GROUP BY 1),
            b AS (SELECT CASE WHEN n = 1 THEN 0
                              WHEN nlev = 1 THEN 1
                              WHEN nlev = 2 THEN 2
                              ELSE 3 END AS band FROM o),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM o)
            SELECT band, CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(10000 * COUNT(*) // MAX(t.n) AS BIGINT)
                       AS share_bps
            FROM b, t GROUP BY band ORDER BY band
        """,
        "embedding_dim_range": """
            WITH u AS (
              SELECT unnest(embedding) AS v,
                     unnest(generate_series(1, len(embedding)))
                         AS dim
              FROM embeddings),
            g AS (SELECT CAST(dim AS BIGINT) AS dim,
                         CAST(MIN(CAST(FLOOR(CAST(v AS DOUBLE)
                                             * 1000000.0)
                                       AS BIGINT)) AS BIGINT)
                             AS min_fp,
                         CAST(MAX(CAST(FLOOR(CAST(v AS DOUBLE)
                                             * 1000000.0)
                                       AS BIGINT)) AS BIGINT)
                             AS max_fp
                  FROM u GROUP BY 1)
            SELECT dim, min_fp, max_fp,
                   max_fp - min_fp AS span_fp,
                   GREATEST(ABS(min_fp), ABS(max_fp)) AS absmax_fp
            FROM g ORDER BY dim
        """,
        "part_name_pair_affinity": """
            WITH w AS (SELECT split_part(p_name, ' ', 1) AS w1,
                              split_part(p_name, ' ', 2) AS w2
                       FROM part),
            g AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n
                  FROM w GROUP BY 1, 2),
            r AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS rn
                  FROM g GROUP BY 1),
            c AS (SELECT w2, CAST(SUM(n) AS BIGINT) AS cn
                  FROM g GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM g)
            SELECT g.w1, g.w2, g.n AS n_parts,
                   CAST(1000 * g.n * t.n // (r.rn * c.cn)
                        AS BIGINT) AS lift_milli
            FROM g JOIN r USING (w1) JOIN c USING (w2), t
            WHERE g.n >= 5
            ORDER BY lift_milli DESC, g.w1, g.w2 LIMIT 10
        """,
        "events_value_mode_census": """
            WITH h AS (SELECT CAST(FLOOR(value * 100) AS BIGINT)
                                  AS v,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM events GROUP BY 1),
            t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h)
            SELECT v AS value_cents, c AS n_events,
                   CAST(10000 * c // t.n AS BIGINT) AS share_bps
            FROM h, t ORDER BY c DESC, v LIMIT 10
        """,
        "weekend_priority_shift": """
            WITH d AS (SELECT CAST(SUBSTR(o_orderpriority, 1, 1)
                                   AS BIGINT) AS p,
                              CASE WHEN (epoch_us(o_orderdate)
                                         // 86400000000 + 4) % 7
                                        IN (0, 6)
                                   THEN 1 ELSE 0 END AS we
                       FROM orders),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(we) AS BIGINT) AS w FROM d)
            SELECT p AS priority,
                   CAST(SUM(1 - we) AS BIGINT) AS n_weekday,
                   CAST(SUM(we) AS BIGINT) AS n_weekend,
                   CAST(10000 * SUM(we) // COUNT(*) AS BIGINT)
                       AS weekend_bps,
                   CAST(CASE WHEN MAX(t.w) > 0 THEN
                        1000 * SUM(we) * MAX(t.n)
                        // (COUNT(*) * MAX(t.w)) - 1000
                        ELSE -9999 END AS BIGINT) AS lift_milli
            FROM d, t GROUP BY p ORDER BY p
        """,
        "user_activity_fingerprint_dups": """
            WITH ud AS (SELECT DISTINCT user_id AS u,
                               epoch_us(ts) // 86400000000 AS d
                        FROM events),
            fp AS (SELECT u, string_agg(CAST(d AS VARCHAR), ','
                                        ORDER BY d) AS f
                   FROM ud GROUP BY u),
            g AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS n
                  FROM fp GROUP BY f),
            s AS (SELECT CAST(SUM(n) AS BIGINT) AS nu,
                         CAST(COUNT(*) AS BIGINT) AS np,
                         CAST(COALESCE(SUM(n) FILTER (n >= 2), 0)
                              AS BIGINT) AS nd,
                         CAST(MAX(n) AS BIGINT) AS mg FROM g)
            SELECT nu AS n_users, np AS n_patterns,
                   nd AS n_users_in_dup_groups,
                   CAST(10000 * nd // nu AS BIGINT)
                       AS dup_share_bps,
                   mg AS max_group
            FROM s
        """,
        "nation_part_coverage": """
            WITH np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
                        FROM part),
            j AS (SELECT s_nationkey AS k, l_partkey AS p
                  FROM lineitem
                  JOIN supplier ON s_suppkey = l_suppkey),
            g AS (SELECT k, CAST(COUNT(DISTINCT p) AS BIGINT)
                             AS pc,
                         CAST(COUNT(*) AS BIGINT) AS nl
                  FROM j GROUP BY 1)
            SELECT n_name AS nation, g.pc AS n_parts_touched,
                   CAST(10000 * g.pc // np.n AS BIGINT)
                       AS coverage_bps,
                   g.nl AS n_lines
            FROM g JOIN nation ON n_nationkey = g.k, np
            ORDER BY nation
        """,
        "basket_width_trend": """
            WITH lc AS (SELECT l_orderkey AS k,
                               CAST(COUNT(*) AS BIGINT) AS c
                        FROM lineitem GROUP BY 1),
            j AS (SELECT epoch_us(o_orderdate) // 86400000000
                         // 365 AS y, lc.c
                  FROM orders JOIN lc ON lc.k = o_orderkey)
            SELECT CAST(y AS BIGINT) AS year_id,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(c) AS BIGINT) AS n_lines,
                   CAST(1000 * SUM(c) // COUNT(*) AS BIGINT)
                       AS mean_lines_milli
            FROM j GROUP BY y ORDER BY y
        """,
        "premium_return_interaction": """
            WITH u AS (SELECT l_partkey AS p, l_returnflag AS rf,
                              CAST(FLOOR(l_extendedprice * 100)
                                   AS BIGINT)
                              // CAST(FLOOR(l_quantity) AS BIGINT)
                                  AS uc
                       FROM lineitem),
            pa_ AS (SELECT p, CAST(SUM(uc) AS BIGINT) AS ps,
                           CAST(COUNT(*) AS BIGINT) AS pc
                    FROM u GROUP BY 1),
            r AS (SELECT CASE WHEN rel < 9800 THEN 0
                              WHEN rel < 10000 THEN 1
                              WHEN rel < 10200 THEN 2
                              ELSE 3 END AS band,
                         CASE WHEN rf = 'R' THEN 1 ELSE 0 END AS rr
                  FROM (SELECT u.rf,
                               10000 * u.uc * pa_.pc // pa_.ps
                                   AS rel
                        FROM u JOIN pa_ USING (p))),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(rr) AS BIGINT) AS rt FROM r)
            SELECT band AS rel_band,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(rr) AS BIGINT) AS n_returned,
                   CAST(10000 * SUM(rr) // COUNT(*) AS BIGINT)
                       AS return_bps,
                   CAST(CASE WHEN MAX(t.rt) > 0 THEN
                        1000 * SUM(rr) * MAX(t.n)
                        // (COUNT(*) * MAX(t.rt)) - 1000
                        ELSE -9999 END AS BIGINT) AS lift_milli
            FROM r, t GROUP BY band ORDER BY band
        """,
        "basket_width_ship_span": """
            WITH o AS (SELECT l_orderkey AS k,
                              CAST(COUNT(*) AS BIGINT) AS n,
                              MAX(epoch_us(l_shipdate)
                                  // 86400000000)
                              - MIN(epoch_us(l_shipdate)
                                    // 86400000000) AS span
                       FROM lineitem GROUP BY 1),
            b AS (SELECT LEAST(n, 7) AS band, span FROM o)
            SELECT band AS line_band,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(1000 * SUM(span) // COUNT(*) AS BIGINT)
                       AS mean_span_milli,
                   CAST(10000 * SUM(CASE WHEN span = 0
                                         THEN 1 ELSE 0 END)
                        // COUNT(*) AS BIGINT) AS same_day_bps
            FROM b GROUP BY band ORDER BY band
        """,
        "returns_by_ship_dow": """
            WITH d AS (SELECT (epoch_us(l_shipdate) // 86400000000
                               + 4) % 7 AS w,
                              CASE WHEN l_returnflag = 'R'
                                   THEN 1 ELSE 0 END AS r
                       FROM lineitem),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(r) AS BIGINT) AS rt FROM d)
            SELECT CAST(w AS BIGINT) AS dow,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(r) AS BIGINT) AS n_returned,
                   CAST(10000 * SUM(r) // COUNT(*) AS BIGINT)
                       AS return_bps,
                   CAST(CASE WHEN MAX(t.rt) > 0 THEN
                        1000 * SUM(r) * MAX(t.n)
                        // (COUNT(*) * MAX(t.rt)) - 1000
                        ELSE -9999 END AS BIGINT) AS lift_milli
            FROM d, t GROUP BY w ORDER BY w
        """,
        "unit_price_by_quantity": """
            WITH d AS (SELECT CAST(FLOOR(l_quantity) AS BIGINT)
                                  AS q,
                              CAST(FLOOR(l_extendedprice * 100)
                                   AS BIGINT)
                              // CAST(FLOOR(l_quantity) AS BIGINT)
                                  AS uc
                       FROM lineitem),
            t AS (SELECT CAST(SUM(uc) // COUNT(*) AS BIGINT)
                             AS gmean FROM d)
            SELECT q AS quantity,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(uc) // COUNT(*) AS BIGINT)
                       AS mean_unit_cents,
                   CAST(1000 * (SUM(uc) // COUNT(*)) // MAX(t.gmean)
                        - 1000 AS BIGINT) AS lift_milli
            FROM d, t GROUP BY q ORDER BY q
        """,
        "source_token_budget": """
            WITH d AS (SELECT source,
                              CAST(LENGTH(text)
                                   - LENGTH(REPLACE(text, ' ', ''))
                                   + 1 AS BIGINT) AS tok
                       FROM documents),
            g AS (SELECT source, CAST(COUNT(*) AS BIGINT)
                             AS n_docs,
                         CAST(SUM(tok) AS BIGINT) AS n_tokens
                  FROM d GROUP BY 1),
            t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot
                  FROM g)
            SELECT source, n_docs, n_tokens,
                   CAST(10000 * n_tokens // t.tot AS BIGINT)
                       AS token_share_bps,
                   CAST(1000 * n_tokens // n_docs AS BIGINT)
                       AS mean_tokens_milli
            FROM g, t ORDER BY source
        """,
        "type_arpu": """
            WITH s AS (SELECT event_type AS t,
                              CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(COUNT(DISTINCT user_id)
                                   AS BIGINT) AS nu,
                              CAST(SUM(CAST(FLOOR(value * 100)
                                            AS BIGINT)) AS BIGINT)
                                  AS cents
                       FROM events GROUP BY 1)
            SELECT t AS event_type, n AS n_events, nu AS n_users,
                   cents AS total_cents,
                   CAST(cents // nu AS BIGINT) AS arpu_cents
            FROM s ORDER BY t
        """,
        "dead_stock_census": """
            WITH sold AS (SELECT DISTINCT l_partkey AS p
                          FROM lineitem),
            j AS (SELECT p_brand AS b,
                         CASE WHEN sold.p IS NULL
                              THEN 1 ELSE 0 END AS dead
                  FROM part LEFT JOIN sold ON sold.p = p_partkey),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(dead) AS BIGINT) AS d FROM j)
            SELECT b AS brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
                   CAST(SUM(dead) AS BIGINT) AS n_never_sold,
                   CAST(10000 * SUM(dead) // COUNT(*) AS BIGINT)
                       AS dead_bps,
                   CAST(CASE WHEN MAX(t.d) > 0 THEN
                        1000 * SUM(dead) * MAX(t.n)
                        // (COUNT(*) * MAX(t.d)) - 1000
                        ELSE -9999 END AS BIGINT) AS lift_milli
            FROM j, t GROUP BY b ORDER BY b
        """,
        "user_resurrection_census": """
            WITH ud AS (SELECT DISTINCT user_id AS u,
                               epoch_us(ts) // 86400000000 AS d
                        FROM events),
            g AS (SELECT u, d - LAG(d) OVER (PARTITION BY u
                                             ORDER BY d) AS gap
                  FROM ud),
            gg AS (SELECT u, gap FROM g WHERE gap IS NOT NULL),
            m AS (SELECT CAST(COUNT(DISTINCT u) AS BIGINT)
                             AS n_multi FROM gg),
            dm AS (SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS ndu,
                          CAST(COUNT(*) AS BIGINT) AS nep,
                          CAST(COALESCE(SUM(gap), 0) AS BIGINT)
                              AS sg,
                          CAST(COALESCE(MAX(gap), 0) AS BIGINT)
                              AS mg
                   FROM gg WHERE gap >= 28)
            SELECT m.n_multi AS n_users_multi_day,
                   dm.ndu AS n_dormant_users,
                   CAST(CASE WHEN m.n_multi > 0
                             THEN 10000 * dm.ndu // m.n_multi
                             ELSE -9999 END AS BIGINT)
                       AS dormant_share_bps,
                   dm.nep AS n_episodes,
                   CAST(CASE WHEN dm.nep > 0
                             THEN 1000 * dm.sg // dm.nep
                             ELSE -9999 END AS BIGINT)
                       AS mean_dormancy_milli,
                   dm.mg AS max_dormancy_days
            FROM m, dm
        """,
        "type_value_drift": """
            WITH b AS (SELECT (MIN(epoch_us(ts) // 86400000000)
                             + MAX(epoch_us(ts) // 86400000000))
                             // 2 AS mid FROM events),
            e AS (SELECT event_type AS t,
                         CASE WHEN epoch_us(ts) // 86400000000
                                   > b.mid THEN 1 ELSE 0 END AS h,
                         CAST(FLOOR(value * 100) AS BIGINT) AS v
                  FROM events, b),
            g AS (SELECT t, h, v, CAST(COUNT(*) AS BIGINT) AS c
                  FROM e GROUP BY 1, 2, 3),
            w AS (SELECT t, h, v, c,
                         SUM(c) OVER (PARTITION BY t, h ORDER BY v
                                      ROWS UNBOUNDED PRECEDING)
                             AS cum,
                         SUM(c) OVER (PARTITION BY t, h) AS n
                  FROM g),
            p AS (SELECT t, h,
                         CAST(MIN(v) FILTER (
                              cum >= (50 * n + 99) // 100)
                              AS BIGINT) AS p50,
                         CAST(MAX(n) AS BIGINT) AS n
                  FROM w GROUP BY t, h)
            SELECT a.t AS event_type, a.n AS n_h1, b2.n AS n_h2,
                   a.p50 AS p50_h1_cents, b2.p50 AS p50_h2_cents,
                   CAST(CASE WHEN a.p50 > 0
                             THEN 1000 * b2.p50 // a.p50 - 1000
                             ELSE -9999 END AS BIGINT)
                       AS shift_milli
            FROM p a JOIN p b2 ON b2.t = a.t
                 AND a.h = 0 AND b2.h = 1
            ORDER BY 1
        """,
        "first_vs_repeat_priority": """
            WITH o AS (SELECT o_custkey AS c,
                              CAST(SUBSTR(o_orderpriority, 1, 1)
                                   AS BIGINT) AS p,
                              ROW_NUMBER() OVER (
                                  PARTITION BY o_custkey
                                  ORDER BY epoch_us(o_orderdate)
                                           // 86400000000,
                                           o_orderkey) AS rn
                       FROM orders),
            g AS (SELECT p, CASE WHEN rn = 1 THEN 0 ELSE 1 END
                             AS rep,
                         CAST(COUNT(*) AS BIGINT) AS c
                  FROM o GROUP BY 1, 2),
            t AS (SELECT CAST(COALESCE(SUM(c) FILTER (rep = 0), 0)
                              AS BIGINT) AS ft,
                         CAST(COALESCE(SUM(c) FILTER (rep = 1), 0)
                              AS BIGINT) AS rt FROM g)
            SELECT p AS priority,
                   CAST(COALESCE(SUM(c) FILTER (rep = 0), 0)
                        AS BIGINT) AS n_first,
                   CAST(CASE WHEN MAX(t.ft) > 0 THEN
                        10000 * COALESCE(SUM(c) FILTER (rep = 0),
                                         0) // MAX(t.ft)
                        ELSE -9999 END AS BIGINT)
                       AS first_share_bps,
                   CAST(COALESCE(SUM(c) FILTER (rep = 1), 0)
                        AS BIGINT) AS n_repeat,
                   CAST(CASE WHEN MAX(t.rt) > 0 THEN
                        10000 * COALESCE(SUM(c) FILTER (rep = 1),
                                         0) // MAX(t.rt)
                        ELSE -9999 END AS BIGINT)
                       AS repeat_share_bps,
                   CAST(CASE WHEN MAX(t.ft) > 0
                             AND COALESCE(SUM(c) FILTER (rep = 1),
                                          0) > 0 THEN
                        1000 * COALESCE(SUM(c) FILTER (rep = 0), 0)
                        * MAX(t.rt)
                        // (MAX(t.ft)
                            * COALESCE(SUM(c) FILTER (rep = 1), 0))
                        - 1000
                        ELSE -9999 END AS BIGINT) AS lift_milli
            FROM g, t GROUP BY p ORDER BY p
        """,
        "supplier_lead_time_laggards": """
            WITH j AS (SELECT l_suppkey AS s,
                              epoch_us(l_shipdate) // 86400000000
                              - epoch_us(o_orderdate)
                                // 86400000000 AS lag
                       FROM lineitem
                       JOIN orders ON o_orderkey = l_orderkey),
            g AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(lag) AS BIGINT) AS sl
                  FROM j GROUP BY 1 HAVING COUNT(*) >= 50)
            SELECT CAST(s AS BIGINT) AS s_suppkey, n AS n_lines,
                   CAST(1000 * sl // n AS BIGINT)
                       AS mean_lead_milli
            FROM g ORDER BY mean_lead_milli DESC, s LIMIT 10
        """,
        "revenue_by_hour": """
            WITH d AS (SELECT (epoch_us(ts) // 3600000000) % 24
                                  AS h,
                              CAST(FLOOR(value * 100) AS BIGINT)
                                  AS cents
                       FROM events),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(cents) AS BIGINT) AS s FROM d)
            SELECT CAST(h AS BIGINT) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(cents) AS BIGINT) AS value_cents,
                   CAST(10000 * SUM(cents) // MAX(t.s) AS BIGINT)
                       AS value_share_bps,
                   CAST(1000 * CAST(SUM(cents) AS HUGEINT)
                        * MAX(t.n)
                        // (CAST(COUNT(*) AS HUGEINT) * MAX(t.s))
                        - 1000 AS BIGINT) AS vpe_lift_milli
            FROM d, t GROUP BY h ORDER BY hour
        """,
        "type_precedence_matrix": """
            WITH f AS (SELECT user_id AS u,
                              epoch_us(ts) // 86400000000 AS d,
                              event_type AS t, ts, event_id,
                              ROW_NUMBER() OVER (
                                  PARTITION BY user_id,
                                      epoch_us(ts) // 86400000000,
                                      event_type
                                  ORDER BY ts, event_id) AS rn
                       FROM events),
            ff AS (SELECT u, d, t, ts, event_id
                   FROM f WHERE rn = 1),
            p AS (SELECT x.t AS a, y.t AS b,
                         CASE WHEN x.ts < y.ts
                                   OR (x.ts = y.ts
                                       AND x.event_id < y.event_id)
                              THEN 1 ELSE 0 END AS af
                  FROM ff x JOIN ff y
                       ON x.u = y.u AND x.d = y.d AND x.t < y.t)
            SELECT a AS type_a, b AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS n_days_both,
                   CAST(10000 * SUM(af) // COUNT(*) AS BIGINT)
                       AS a_first_bps
            FROM p GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "source_mix_drift": """
            WITH b AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2
                                  AS mid FROM documents),
            d AS (SELECT source,
                         CASE WHEN doc_id > b.mid
                              THEN 1 ELSE 0 END AS h,
                         CAST(LENGTH(text)
                              - LENGTH(REPLACE(text, ' ', '')) + 1
                              AS BIGINT) AS tok
                  FROM documents, b),
            g AS (SELECT source, h, CAST(SUM(tok) AS BIGINT)
                             AS tok
                  FROM d GROUP BY 1, 2),
            t AS (SELECT CAST(COALESCE(SUM(tok) FILTER (h = 0), 0)
                              AS BIGINT) AS t1,
                         CAST(COALESCE(SUM(tok) FILTER (h = 1), 0)
                              AS BIGINT) AS t2 FROM g)
            SELECT source,
                   CAST(COALESCE(SUM(tok) FILTER (h = 0), 0)
                        AS BIGINT) AS tok_h1,
                   CAST(COALESCE(SUM(tok) FILTER (h = 1), 0)
                        AS BIGINT) AS tok_h2,
                   CAST(CASE WHEN MAX(t.t1) > 0 THEN
                        10000 * COALESCE(SUM(tok) FILTER (h = 0),
                                         0) // MAX(t.t1)
                        ELSE -9999 END AS BIGINT) AS share_h1_bps,
                   CAST(CASE WHEN MAX(t.t2) > 0 THEN
                        10000 * COALESCE(SUM(tok) FILTER (h = 1),
                                         0) // MAX(t.t2)
                        ELSE -9999 END AS BIGINT) AS share_h2_bps,
                   CAST(CASE WHEN COALESCE(SUM(tok) FILTER (h = 0),
                                           0) > 0
                             AND MAX(t.t2) > 0 THEN
                        1000 * COALESCE(SUM(tok) FILTER (h = 1), 0)
                        * MAX(t.t1)
                        // (COALESCE(SUM(tok) FILTER (h = 0), 0)
                            * MAX(t.t2)) - 1000
                        ELSE -9999 END AS BIGINT) AS shift_milli
            FROM g, t GROUP BY source ORDER BY source
        """,
        "order_value_dup_audit": """
            WITH cv AS (SELECT o_custkey AS c,
                               CAST(FLOOR(o_totalprice * 100)
                                    AS BIGINT) AS v,
                               CAST(COUNT(*) AS BIGINT) AS k
                        FROM orders GROUP BY 1, 2),
            t AS (SELECT CAST(COUNT(DISTINCT c) AS BIGINT) AS nc
                  FROM cv),
            d AS (SELECT CAST(COUNT(DISTINCT c) AS BIGINT) AS ndc,
                         CAST(COUNT(*) AS BIGINT) AS ng,
                         CAST(COALESCE(SUM(k), 0) AS BIGINT)
                             AS no
                  FROM cv WHERE k >= 2),
            m AS (SELECT CAST(MAX(k) AS BIGINT) AS mg FROM cv)
            SELECT t.nc AS n_customers_ordering,
                   d.ndc AS n_cust_with_dup_value,
                   CAST(10000 * d.ndc // t.nc AS BIGINT)
                       AS dup_cust_bps,
                   d.ng AS n_collision_groups,
                   d.no AS n_orders_in_groups,
                   m.mg AS max_group
            FROM t, d, m
        """,
        "embedding_norm_drift": """
            WITH b AS (SELECT (MIN(vec_id) + MAX(vec_id)) // 2
                                  AS mid FROM embeddings),
            nv AS (SELECT CASE WHEN vec_id > b.mid
                               THEN 1 ELSE 0 END AS h,
                          CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE)
                                              * 1000000.0)
                                        AS BIGINT)
                                   * CAST(FLOOR(CAST(v AS DOUBLE)
                                                * 1000000.0)
                                          AS BIGINT)) AS BIGINT)
                              AS n2
                   FROM (SELECT vec_id, unnest(embedding) AS v
                         FROM embeddings), b
                   GROUP BY vec_id, b.mid),
            g AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(n2) AS BIGINT) AS s
                  FROM nv GROUP BY h),
            a AS (SELECT CAST(COALESCE(MAX(n) FILTER (h = 0), 0)
                              AS BIGINT) AS n1,
                         CAST(COALESCE(MAX(s) FILTER (h = 0), 0)
                              AS BIGINT) AS s1,
                         CAST(COALESCE(MAX(n) FILTER (h = 1), 0)
                              AS BIGINT) AS n2,
                         CAST(COALESCE(MAX(s) FILTER (h = 1), 0)
                              AS BIGINT) AS s2 FROM g)
            SELECT n1 AS n_h1, n2 AS n_h2,
                   CAST(CASE WHEN n1 > 0 THEN s1 // n1
                             ELSE -9999 END AS BIGINT)
                       AS mean_norm2_h1_fp,
                   CAST(CASE WHEN n2 > 0 THEN s2 // n2
                             ELSE -9999 END AS BIGINT)
                       AS mean_norm2_h2_fp,
                   CAST(CASE WHEN n1 > 0 AND n2 > 0
                                  AND s1 // n1 > 0
                             THEN 1000 * (s2 // n2) // (s1 // n1)
                                  - 1000
                             ELSE -9999 END AS BIGINT)
                       AS shift_milli
            FROM a
        """,
        "vocab_core_census": """
            WITH ns AS (SELECT CAST(COUNT(DISTINCT source)
                                    AS BIGINT) AS k
                        FROM documents),
            w AS (SELECT DISTINCT source, tok
                  FROM (SELECT source,
                               UNNEST(STRING_SPLIT(text, ' '))
                                   AS tok
                        FROM documents)),
            cov AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
                    FROM w GROUP BY 1),
            s AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt,
                         CAST(SUM(CASE WHEN c >= ns.k
                                       THEN 1 ELSE 0 END)
                              AS BIGINT) AS nc,
                         CAST(SUM(CASE WHEN c = 1
                                       THEN 1 ELSE 0 END)
                              AS BIGINT) AS n1,
                         CAST(SUM(c) AS BIGINT) AS sc
                  FROM cov, ns GROUP BY ns.k)
            SELECT ns.k AS n_sources, s.nt AS n_tokens,
                   s.nc AS n_core,
                   CAST(10000 * s.nc // s.nt AS BIGINT)
                       AS core_share_bps,
                   s.n1 AS n_single_source,
                   CAST(10000 * s.n1 // s.nt AS BIGINT)
                       AS single_share_bps,
                   CAST(1000 * s.sc // s.nt AS BIGINT)
                       AS mean_coverage_milli
            FROM s, ns
        """,
        "type_adoption_rank": """
            WITH r0 AS (SELECT user_id AS u, event_type AS t, ts,
                               event_id,
                               ROW_NUMBER() OVER (
                                   PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS rn
                        FROM events),
            f AS (SELECT u, t, ts, event_id
                  FROM r0 WHERE rn = 1),
            rk AS (SELECT u, t,
                          ROW_NUMBER() OVER (PARTITION BY u
                                             ORDER BY ts, event_id)
                              AS rank FROM f)
            SELECT t AS event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_adopters,
                   CAST(1000 * SUM(rank) // COUNT(*) AS BIGINT)
                       AS mean_rank_milli,
                   CAST(10000 * SUM(CASE WHEN rank = 1
                                         THEN 1 ELSE 0 END)
                        // COUNT(*) AS BIGINT) AS rank1_share_bps
            FROM rk GROUP BY t ORDER BY t
        """,
        "orders_status_boundary_audit": """
            WITH s AS (SELECT o_orderstatus AS st,
                              CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(MIN(epoch_us(o_orderdate)
                                       // 86400000000) AS BIGINT)
                                  AS mn,
                              CAST(MAX(epoch_us(o_orderdate)
                                       // 86400000000) AS BIGINT)
                                  AS mx
                       FROM orders GROUP BY 1),
            ov AS (SELECT COALESCE(
                       (SELECT f.mx - o.mn + 1
                        FROM s f, s o
                        WHERE f.st = 'F' AND o.st = 'O'), -1)
                       AS overlap)
            SELECT st AS orderstatus, n AS n_orders,
                   mn AS min_day, mx AS max_day,
                   CAST(ov.overlap AS BIGINT) AS overlap_days
            FROM s, ov ORDER BY st
        """,
        "supplier_focus_census": """
            WITH sp AS (SELECT l_suppkey AS s, l_partkey AS p,
                               CAST(COUNT(*) AS BIGINT) AS c
                        FROM lineitem GROUP BY 1, 2),
            su AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS np,
                          CAST(SUM(c) AS BIGINT) AS tot,
                          CAST(SUM(c * c) AS BIGINT) AS ss
                   FROM sp GROUP BY 1),
            b AS (SELECT CASE WHEN np = 1 THEN 0
                              WHEN 10000 * CAST(ss AS HUGEINT)
                                   // (CAST(tot AS HUGEINT) * tot)
                                   < 1000 THEN 1
                              WHEN 10000 * CAST(ss AS HUGEINT)
                                   // (CAST(tot AS HUGEINT) * tot)
                                   < 2500 THEN 2
                              WHEN 10000 * CAST(ss AS HUGEINT)
                                   // (CAST(tot AS HUGEINT) * tot)
                                   < 5000 THEN 3
                              ELSE 4 END AS band FROM su),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM su)
            SELECT band, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
                   CAST(10000 * COUNT(*) // MAX(t.n) AS BIGINT)
                       AS share_bps
            FROM b, t GROUP BY band ORDER BY band
        """,
        "ts_collision_audit": """
            WITH h AS (SELECT ts, CAST(COUNT(*) AS BIGINT) AS k
                       FROM events GROUP BY 1),
            s AS (SELECT CAST(COUNT(*) AS BIGINT) AS nts,
                         CAST(SUM(k) AS BIGINT) AS ne,
                         CAST(SUM(CASE WHEN k >= 2 THEN 1 ELSE 0
                                  END) AS BIGINT) AS nct,
                         CAST(COALESCE(SUM(k) FILTER (k >= 2), 0)
                              AS BIGINT) AS nec,
                         CAST(MAX(k) AS BIGINT) AS mp FROM h)
            SELECT nts AS n_distinct_ts, ne AS n_events,
                   nct AS n_collision_ts,
                   nec AS n_events_in_collisions,
                   CAST(10000 * nec // ne AS BIGINT)
                       AS collision_bps,
                   mp AS max_pileup
            FROM s
        """,
        "value_band_type_mix": """
            WITH d AS (SELECT event_type AS typ,
                              CASE WHEN CAST(FLOOR(value * 100)
                                        AS BIGINT) = 0 THEN 0
                                   WHEN CAST(FLOOR(value * 100)
                                        AS BIGINT) < 100 THEN 1
                                   WHEN CAST(FLOOR(value * 100)
                                        AS BIGINT) < 1000 THEN 2
                                   WHEN CAST(FLOOR(value * 100)
                                        AS BIGINT) < 10000 THEN 3
                                   ELSE 4 END AS band
                       FROM events),
            o AS (SELECT band, typ, CAST(COUNT(*) AS BIGINT) AS n
                  FROM d GROUP BY 1, 2),
            r AS (SELECT band, CAST(SUM(n) AS BIGINT) AS rn
                  FROM o GROUP BY 1),
            c AS (SELECT typ, CAST(SUM(n) AS BIGINT) AS cn
                  FROM o GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM o)
            SELECT CAST(o.band AS BIGINT) AS value_band,
                   o.typ AS event_type, o.n AS n_events,
                   CAST(10000 * o.n // r.rn AS BIGINT)
                       AS band_share_bps,
                   CAST(1000 * o.n * t.n // (r.rn * c.cn) - 1000
                        AS BIGINT) AS lift_milli
            FROM o JOIN r USING (band) JOIN c USING (typ), t
            ORDER BY 1, 2
        """,
        "order_return_severity": """
            WITH o AS (SELECT l_orderkey AS k,
                              CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(SUM(CASE WHEN l_returnflag = 'R'
                                            THEN 1 ELSE 0 END)
                                   AS BIGINT) AS r
                       FROM lineitem GROUP BY 1),
            s AS (SELECT CAST(COUNT(*) AS BIGINT) AS no,
                         CAST(SUM(CASE WHEN r = 0 THEN 1 ELSE 0
                                  END) AS BIGINT) AS nn,
                         CAST(SUM(CASE WHEN r > 0 AND r < n
                                       THEN 1 ELSE 0 END)
                              AS BIGINT) AS np,
                         CAST(SUM(CASE WHEN r = n AND r > 0
                                       THEN 1 ELSE 0 END)
                              AS BIGINT) AS nf,
                         CAST(COALESCE(SUM(n) FILTER (
                              r > 0 AND r < n), 0) AS BIGINT)
                             AS pl,
                         CAST(COALESCE(SUM(r) FILTER (
                              r > 0 AND r < n), 0) AS BIGINT)
                             AS pr
                  FROM o)
            SELECT no AS n_orders, nn AS n_none,
                   CAST(10000 * nn // no AS BIGINT) AS none_bps,
                   np AS n_partial,
                   CAST(10000 * np // no AS BIGINT)
                       AS partial_bps,
                   nf AS n_full,
                   CAST(10000 * nf // no AS BIGINT) AS full_bps,
                   CAST(CASE WHEN pl > 0 THEN 10000 * pr // pl
                             ELSE -9999 END AS BIGINT)
                       AS partial_depth_bps
            FROM s
        """,
        "source_word_len_profile": """
            WITH w AS (SELECT source,
                              UNNEST(STRING_SPLIT(text, ' '))
                                  AS tok
                       FROM documents),
            m AS (SELECT source, CAST(MAX(LENGTH(tok)) AS BIGINT)
                             AS maxw
                  FROM w GROUP BY 1),
            b AS (SELECT source,
                         CAST(SUM(LENGTH(text)
                                  - LENGTH(REPLACE(text, ' ', ''))
                                  + 1) AS BIGINT) AS toks,
                         CAST(SUM(LENGTH(REPLACE(text, ' ', '')))
                              AS BIGINT) AS letters
                  FROM documents GROUP BY 1)
            SELECT b.source, b.toks AS n_tokens,
                   CAST(1000 * b.letters // b.toks AS BIGINT)
                       AS mean_word_len_milli,
                   m.maxw AS max_word_len
            FROM b JOIN m USING (source) ORDER BY source
        """,
        "dau_volatility": """
            WITH d AS (SELECT epoch_us(ts) // 86400000000 AS d,
                              CAST(COUNT(DISTINCT user_id)
                                   AS BIGINT) AS n
                       FROM events GROUP BY 1),
            s AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
                         CAST(SUM(n) AS BIGINT) AS s,
                         CAST(SUM(n * n) AS BIGINT) AS ss,
                         CAST(MIN(n) AS BIGINT) AS mn,
                         CAST(MAX(n) AS BIGINT) AS mx FROM d)
            SELECT nd AS n_days,
                   CAST(1000 * s // nd AS BIGINT)
                       AS mean_dau_milli,
                   CAST(CASE WHEN s > 0 THEN
                        1000 * (nd * CAST(ss AS HUGEINT)
                                - CAST(s AS HUGEINT) * s)
                        // (CAST(s AS HUGEINT) * s)
                        ELSE -9999 END AS BIGINT) AS cv2_milli,
                   mn AS min_dau, mx AS max_dau
            FROM s
        """,
        "debtor_activity_audit": """
            WITH a AS (SELECT o_custkey AS k,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM orders GROUP BY 1),
            cu AS (SELECT CASE WHEN CAST(FLOOR(c_acctbal * 100)
                                        AS BIGINT) < 0
                               THEN 'negative'
                               ELSE 'nonnegative' END AS sign,
                          COALESCE(a.c, 0) AS c
                   FROM customer LEFT JOIN a ON a.k = c_custkey),
            g AS (SELECT sign, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0
                                  END) AS BIGINT) AS o,
                         CAST(SUM(c) AS BIGINT) AS tc
                  FROM cu GROUP BY 1),
            signs AS (SELECT 'negative' AS sign
                      UNION ALL SELECT 'nonnegative'),
            g2 AS (SELECT signs.sign, COALESCE(g.n, 0) AS n,
                          COALESCE(g.o, 0) AS o,
                          COALESCE(g.tc, 0) AS tc
                   FROM signs LEFT JOIN g USING (sign)),
            l AS (SELECT CAST(CASE WHEN neg.n > 0 AND pos.o > 0
                                   THEN 1000 * neg.o * pos.n
                                        // (neg.n * pos.o) - 1000
                                   ELSE -9999 END AS BIGINT)
                             AS lift
                  FROM (SELECT * FROM g2
                        WHERE sign = 'negative') neg,
                       (SELECT * FROM g2
                        WHERE sign = 'nonnegative') pos)
            SELECT sign AS balance_sign, n AS n_customers,
                   o AS n_ordering,
                   CAST(CASE WHEN n > 0 THEN 10000 * o // n
                             ELSE -9999 END AS BIGINT)
                       AS ordering_bps,
                   CAST(CASE WHEN n > 0 THEN 1000 * tc // n
                             ELSE -9999 END AS BIGINT)
                       AS mean_orders_milli,
                   CAST(CASE WHEN sign = 'negative' THEN l.lift
                             ELSE 0 END AS BIGINT)
                       AS debtor_lift_milli
            FROM g2, l ORDER BY sign
        """,
        "nation_hhi_trend": """
            WITH j AS (SELECT epoch_us(o_orderdate) // 86400000000
                              // 365 AS y,
                              c_nationkey AS nk,
                              CAST(FLOOR(o_totalprice * 100)
                                   AS BIGINT) AS cents
                       FROM orders
                       JOIN customer ON c_custkey = o_custkey),
            g AS (SELECT y, nk, CAST(SUM(cents) AS BIGINT) AS s,
                         CAST(COUNT(*) AS BIGINT) AS n
                  FROM j GROUP BY 1, 2),
            yy AS (SELECT y, CAST(SUM(n) AS BIGINT) AS n_orders,
                          CAST(SUM(s) AS BIGINT) AS tot,
                          CAST(SUM(CAST(s AS HUGEINT) * s) * 10000
                               // (CAST(SUM(s) AS HUGEINT)
                                   * SUM(s)) AS BIGINT) AS hhi,
                          CAST(10000 * MAX(s) // SUM(s) AS BIGINT)
                              AS top
                   FROM g GROUP BY y HAVING SUM(s) > 0)
            SELECT CAST(y AS BIGINT) AS year_id, n_orders,
                   tot AS revenue_cents, hhi AS hhi_e4,
                   top AS top_nation_share_bps
            FROM yy ORDER BY 1
        """,
        "dow_depth_profile": """
            WITH ud AS (SELECT user_id AS u,
                               epoch_us(ts) // 86400000000 AS d,
                               CAST(COUNT(*) AS BIGINT) AS k
                        FROM events GROUP BY 1, 2),
            dd AS (SELECT (d + 4) % 7 AS dow,
                          LEAST(k, 4096) AS depth FROM ud),
            h AS (SELECT dow, depth, CAST(COUNT(*) AS BIGINT)
                             AS c
                  FROM dd GROUP BY 1, 2),
            w AS (SELECT dow, depth, c,
                         SUM(c) OVER (PARTITION BY dow
                                      ORDER BY depth
                                      ROWS UNBOUNDED PRECEDING)
                             AS cum,
                         SUM(c) OVER (PARTITION BY dow) AS n,
                         SUM(depth * c) OVER (PARTITION BY dow)
                             AS s
                  FROM h)
            SELECT CAST(dow AS BIGINT) AS dow,
                   CAST(MAX(n) AS BIGINT) AS n_user_days,
                   CAST(1000 * MAX(s) // MAX(n) AS BIGINT)
                       AS mean_depth_milli,
                   CAST(MIN(depth) FILTER (
                        cum >= (50 * n + 99) // 100) AS BIGINT)
                       AS p50_depth
            FROM w GROUP BY dow ORDER BY dow
        """,
        "streak_value_interaction": """
            WITH ud AS (SELECT DISTINCT user_id AS u,
                               epoch_us(ts) // 86400000000 AS d
                        FROM events),
            uv AS (SELECT user_id AS u,
                          CAST(SUM(CAST(FLOOR(value * 100)
                                        AS BIGINT)) AS BIGINT)
                              AS tv
                   FROM events GROUP BY 1),
            i AS (SELECT u, d,
                         d - ROW_NUMBER() OVER (PARTITION BY u
                                                ORDER BY d) AS grp
                  FROM ud),
            r AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS len
                  FROM i GROUP BY u, grp),
            b0 AS (SELECT u, CAST(MAX(len) AS BIGINT) AS best
                   FROM r GROUP BY u),
            b AS (SELECT CASE WHEN best = 1 THEN 0
                              WHEN best <= 3 THEN 1
                              WHEN best <= 7 THEN 2
                              ELSE 3 END AS band, uv.tv
                  FROM b0 JOIN uv ON uv.u = b0.u),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(tv) AS BIGINT) AS s FROM b)
            SELECT band AS streak_band,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(10000 * COUNT(*) // MAX(t.n) AS BIGINT)
                       AS share_bps,
                   CAST(1000 * SUM(tv) // COUNT(*) AS BIGINT)
                       AS mean_cents_milli,
                   CAST(CASE WHEN MAX(t.s) > 0 THEN
                        1000 * CAST(SUM(tv) AS HUGEINT) * MAX(t.n)
                        // (CAST(COUNT(*) AS HUGEINT) * MAX(t.s))
                        - 1000
                        ELSE -9999 END AS BIGINT)
                       AS value_lift_milli
            FROM b, t GROUP BY band ORDER BY band
        """,
        "ship_daily_load": """
            WITH d AS (SELECT epoch_us(l_shipdate) // 86400000000
                                  AS dd,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM lineitem GROUP BY 1),
            r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn,
                         COUNT(*) OVER () AS n,
                         SUM(c) OVER () AS s FROM d),
            p AS (SELECT CAST(MIN(c) FILTER (
                             rn >= (50 * n + 99) // 100) AS BIGINT)
                             AS p50,
                         CAST(MAX(n) AS BIGINT) AS n,
                         CAST(MAX(s) AS BIGINT) AS s,
                         CAST(MAX(c) AS BIGINT) AS mx FROM r)
            SELECT n AS n_days,
                   CAST(1000 * s // n AS BIGINT)
                       AS mean_lines_milli,
                   p50 AS p50_lines, mx AS max_lines,
                   CAST(CASE WHEN p50 > 0 THEN 1000 * mx // p50
                             ELSE -9999 END AS BIGINT)
                       AS peak_to_median_milli
            FROM p
        """,
        "priority_width_interaction": """
            WITH lc AS (SELECT l_orderkey AS k,
                               CAST(COUNT(*) AS BIGINT) AS c
                        FROM lineitem GROUP BY 1),
            j AS (SELECT CAST(SUBSTR(o_orderpriority, 1, 1)
                              AS BIGINT) AS p, lc.c
                  FROM orders JOIN lc ON lc.k = o_orderkey),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS no,
                         CAST(SUM(c) AS BIGINT) AS nl FROM j)
            SELECT p AS priority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(c) AS BIGINT) AS n_lines,
                   CAST(1000 * SUM(c) // COUNT(*) AS BIGINT)
                       AS mean_lines_milli,
                   CAST(CASE WHEN MAX(t.nl) > 0 THEN
                        1000 * SUM(c) * MAX(t.no)
                        // (COUNT(*) * MAX(t.nl)) - 1000
                        ELSE -9999 END AS BIGINT)
                       AS width_lift_milli
            FROM j, t GROUP BY p ORDER BY p
        """,
        "quantity_integrality_audit": """
            WITH d AS (SELECT l_quantity AS q,
                              CAST(FLOOR(l_quantity) AS BIGINT)
                                  AS iq
                       FROM lineitem)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(CASE WHEN q <> FLOOR(q)
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_fractional,
                   CAST(10000 * SUM(CASE WHEN q <> FLOOR(q)
                                         THEN 1 ELSE 0 END)
                        // COUNT(*) AS BIGINT) AS fractional_bps,
                   CAST(MIN(iq) AS BIGINT) AS min_qty,
                   CAST(MAX(iq) AS BIGINT) AS max_qty,
                   CAST(COUNT(DISTINCT iq) AS BIGINT) AS n_levels
            FROM d
        """,
        "brand_revenue_volatility": """
            WITH j AS (SELECT p_brand AS b,
                              epoch_us(l_shipdate) // 86400000000
                              // 30 AS m,
                              CAST(FLOOR(l_extendedprice * 100)
                                   AS BIGINT) AS cents
                       FROM lineitem
                       JOIN part ON p_partkey = l_partkey),
            g AS (SELECT b, m, CAST(SUM(cents) AS BIGINT) AS s
                  FROM j GROUP BY 1, 2),
            a AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(s) AS BIGINT) AS t,
                         SUM(CAST(s AS HUGEINT) * s) AS ss
                  FROM g GROUP BY 1)
            SELECT b AS brand, n AS n_months,
                   CAST(1000 * t // n AS BIGINT)
                       AS mean_month_cents_milli,
                   CAST(CASE WHEN t > 0 THEN
                        1000 * (n * ss - CAST(t AS HUGEINT) * t)
                        // (CAST(t AS HUGEINT) * t)
                        ELSE -9999 END AS BIGINT) AS cv2_milli
            FROM a ORDER BY brand
        """,
        "tenure_breadth_curve": """
            WITH sp AS (SELECT user_id AS u,
                               MAX(epoch_us(ts) // 86400000000)
                               - MIN(epoch_us(ts) // 86400000000)
                               + 1 AS span,
                               CAST(COUNT(DISTINCT event_type)
                                    AS BIGINT) AS breadth
                        FROM events GROUP BY 1),
            b AS (SELECT CASE WHEN span = 1 THEN 0
                              WHEN span < 7 THEN 1
                              WHEN span < 28 THEN 2
                              WHEN span < 84 THEN 3
                              ELSE 4 END AS band, breadth FROM sp),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM sp)
            SELECT band AS tenure_band,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(10000 * COUNT(*) // MAX(t.n) AS BIGINT)
                       AS share_bps,
                   CAST(1000 * SUM(breadth) // COUNT(*) AS BIGINT)
                       AS mean_breadth_milli
            FROM b, t GROUP BY band ORDER BY band
        """,
        "street_to_list_census": """
            WITH j AS (SELECT 1000 * (CAST(FLOOR(l_extendedprice
                                                 * 100) AS BIGINT)
                                      // CAST(FLOOR(l_quantity)
                                              AS BIGINT))
                              // GREATEST(CAST(FLOOR(p_retailprice
                                                     * 100)
                                               AS BIGINT), 1)
                                  AS ratio
                       FROM lineitem
                       JOIN part ON p_partkey = l_partkey),
            b AS (SELECT CASE WHEN ratio < 900 THEN 0
                              WHEN ratio < 950 THEN 1
                              WHEN ratio < 1000 THEN 2
                              WHEN ratio < 1050 THEN 3
                              ELSE 4 END AS band FROM j),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b)
            SELECT band AS ratio_band,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(10000 * COUNT(*) // MAX(t.n) AS BIGINT)
                       AS share_bps
            FROM b, t GROUP BY band ORDER BY band
        """,
        "breadth_value_interaction": """
            WITH u AS (SELECT user_id AS u,
                              CAST(LEAST(COUNT(DISTINCT
                                              event_type), 8)
                                   AS BIGINT) AS breadth,
                              CAST(SUM(CAST(FLOOR(value * 100)
                                            AS BIGINT)) AS BIGINT)
                                  AS tv
                       FROM events GROUP BY 1),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(tv) AS BIGINT) AS s FROM u)
            SELECT breadth, CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(10000 * COUNT(*) // MAX(t.n) AS BIGINT)
                       AS share_bps,
                   CAST(1000 * SUM(tv) // COUNT(*) AS BIGINT)
                       AS mean_cents_milli,
                   CAST(CASE WHEN MAX(t.s) > 0 THEN
                        1000 * CAST(SUM(tv) AS HUGEINT) * MAX(t.n)
                        // (CAST(COUNT(*) AS HUGEINT) * MAX(t.s))
                        - 1000
                        ELSE -9999 END AS BIGINT)
                       AS value_lift_milli
            FROM u, t GROUP BY breadth ORDER BY breadth
        """,
        "order_value_drift": """
            WITH b AS (SELECT (MIN(epoch_us(o_orderdate)
                                   // 86400000000)
                             + MAX(epoch_us(o_orderdate)
                                   // 86400000000)) // 2 AS mid
                       FROM orders),
            e AS (SELECT CASE WHEN epoch_us(o_orderdate)
                                   // 86400000000 > b.mid
                              THEN 1 ELSE 0 END AS h,
                         CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                         // 1000 AS band
                  FROM orders, b),
            g AS (SELECT h, band, CAST(COUNT(*) AS BIGINT) AS c
                  FROM e GROUP BY 1, 2),
            w AS (SELECT h, band, c,
                         SUM(c) OVER (PARTITION BY h ORDER BY band
                                      ROWS UNBOUNDED PRECEDING)
                             AS cum,
                         SUM(c) OVER (PARTITION BY h) AS n
                  FROM g),
            p AS (SELECT h,
                         CAST(MIN(band) FILTER (
                              cum >= (50 * n + 99) // 100)
                              AS BIGINT) AS p50,
                         CAST(MAX(n) AS BIGINT) AS n
                  FROM w GROUP BY h)
            SELECT a.n AS n_h1, b2.n AS n_h2,
                   a.p50 AS p50_band_h1, b2.p50 AS p50_band_h2,
                   CAST(CASE WHEN a.p50 > 0
                             THEN 1000 * b2.p50 // a.p50 - 1000
                             ELSE -9999 END AS BIGINT)
                       AS shift_milli
            FROM p a JOIN p b2 ON a.h = 0 AND b2.h = 1
        """,
        "core_customer_census": """
            WITH yr AS (SELECT MAX(epoch_us(o_orderdate)
                                   // 86400000000 // 365)
                             - MIN(epoch_us(o_orderdate)
                                   // 86400000000 // 365) + 1
                                  AS n_years
                        FROM orders),
            cy AS (SELECT DISTINCT o_custkey AS c,
                          epoch_us(o_orderdate) // 86400000000
                          // 365 AS y
                   FROM orders),
            cu AS (SELECT c, CAST(LEAST(COUNT(*), 16) AS BIGINT)
                             AS ny
                   FROM cy GROUP BY 1),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cu)
            SELECT ny AS n_years_active,
                   CAST(COUNT(*) AS BIGINT) AS n_customers,
                   CAST(10000 * COUNT(*) // MAX(t.n) AS BIGINT)
                       AS share_bps,
                   CAST(CASE WHEN ny >= MAX(yr.n_years)
                             THEN 1 ELSE 0 END AS BIGINT)
                       AS is_core
            FROM cu, t, yr GROUP BY ny ORDER BY ny
        """,
        "nation_balance_revenue_mismatch": """
            WITH nb AS (SELECT c_nationkey AS k,
                               CAST(SUM(GREATEST(
                                    CAST(FLOOR(c_acctbal * 100)
                                         AS BIGINT), 0)) AS BIGINT)
                                   AS b
                        FROM customer GROUP BY 1),
            rv AS (SELECT c_nationkey AS k,
                          CAST(SUM(CAST(FLOOR(o_totalprice * 100)
                                        AS BIGINT)) AS BIGINT)
                              AS r
                   FROM orders
                   JOIN customer ON c_custkey = o_custkey
                   GROUP BY 1),
            j AS (SELECT n_name AS nation, COALESCE(nb.b, 0) AS b,
                         COALESCE(rv.r, 0) AS r
                  FROM nation LEFT JOIN nb ON nb.k = n_nationkey
                              LEFT JOIN rv ON rv.k = n_nationkey
                  WHERE COALESCE(nb.b, 0) > 0
                        OR COALESCE(rv.r, 0) > 0),
            t AS (SELECT CAST(SUM(b) AS BIGINT) AS bt,
                         CAST(SUM(r) AS BIGINT) AS rt FROM j)
            SELECT nation, b AS balance_cents,
                   CAST(CASE WHEN t.bt > 0 THEN 10000 * b // t.bt
                             ELSE -9999 END AS BIGINT)
                       AS balance_share_bps,
                   r AS revenue_cents,
                   CAST(CASE WHEN t.rt > 0 THEN 10000 * r // t.rt
                             ELSE -9999 END AS BIGINT)
                       AS revenue_share_bps,
                   CAST(CASE WHEN t.bt > 0 AND 10000 * b // t.bt
                                  > 0 AND t.rt > 0
                             THEN 1000 * (10000 * r // t.rt)
                                  // (10000 * b // t.bt)
                             ELSE -9999 END AS BIGINT)
                       AS mismatch_milli
            FROM j, t ORDER BY nation
        """,
        "depth_value_curve": """
            WITH ud AS (SELECT user_id AS u,
                               epoch_us(ts) // 86400000000 AS d,
                               CAST(COUNT(*) AS BIGINT) AS n,
                               CAST(SUM(CAST(FLOOR(value * 100)
                                             AS BIGINT)) AS BIGINT)
                                   AS s
                        FROM events GROUP BY 1, 2),
            b AS (SELECT CASE WHEN n = 1 THEN 0
                              WHEN n <= 3 THEN 1
                              WHEN n <= 7 THEN 2
                              ELSE 3 END AS band, n, s FROM ud)
            SELECT band AS depth_band,
                   CAST(COUNT(*) AS BIGINT) AS n_user_days,
                   CAST(SUM(n) AS BIGINT) AS n_events,
                   CAST(SUM(s) AS BIGINT) AS sum_cents,
                   CAST(1000 * SUM(s) // SUM(n) AS BIGINT)
                       AS cents_per_event_milli
            FROM b GROUP BY band ORDER BY band
        """,
        "part_price_direction_census": """
            WITH b AS (SELECT (MIN(epoch_us(l_shipdate)
                                   // 86400000000)
                             + MAX(epoch_us(l_shipdate)
                                   // 86400000000)) // 2 AS mid
                       FROM lineitem),
            u AS (SELECT l_partkey AS p,
                         CASE WHEN epoch_us(l_shipdate)
                                   // 86400000000 > b.mid
                              THEN 1 ELSE 0 END AS h,
                         CAST(FLOOR(l_extendedprice * 100)
                              AS BIGINT)
                         // CAST(FLOOR(l_quantity) AS BIGINT)
                             AS uc
                  FROM lineitem, b),
            g AS (SELECT p, h, CAST(SUM(uc) AS BIGINT) AS s,
                         CAST(COUNT(*) AS BIGINT) AS n
                  FROM u GROUP BY 1, 2),
            w AS (SELECT p,
                         CAST(COALESCE(MAX(s) FILTER (h = 0), 0)
                              AS BIGINT) AS s1,
                         CAST(COALESCE(MAX(n) FILTER (h = 0), 0)
                              AS BIGINT) AS n1,
                         CAST(COALESCE(MAX(s) FILTER (h = 1), 0)
                              AS BIGINT) AS s2,
                         CAST(COALESCE(MAX(n) FILTER (h = 1), 0)
                              AS BIGINT) AS n2
                  FROM g GROUP BY p),
            c AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb,
                         CAST(SUM(CASE WHEN s2 * n1 > s1 * n2
                                       THEN 1 ELSE 0 END)
                              AS BIGINT) AS up,
                         CAST(SUM(CASE WHEN s2 * n1 < s1 * n2
                                       THEN 1 ELSE 0 END)
                              AS BIGINT) AS dn,
                         CAST(SUM(CASE WHEN s2 * n1 = s1 * n2
                                       THEN 1 ELSE 0 END)
                              AS BIGINT) AS fl
                  FROM w WHERE n1 > 0 AND n2 > 0)
            SELECT nb AS n_parts_both_halves, up AS n_up,
                   dn AS n_down, fl AS n_flat,
                   CAST(CASE WHEN up + dn > 0
                             THEN 10000 * up // (up + dn)
                             ELSE -9999 END AS BIGINT)
                       AS up_share_bps
            FROM c
        """,
        "habit_mass_census": """
            WITH ud AS (SELECT DISTINCT user_id AS u,
                               epoch_us(ts) // 86400000000 AS d
                        FROM events),
            i AS (SELECT u, d,
                         d - ROW_NUMBER() OVER (PARTITION BY u
                                                ORDER BY d) AS grp
                  FROM ud),
            r AS (SELECT CAST(COUNT(*) AS BIGINT) AS len
                  FROM i GROUP BY u, grp),
            s AS (SELECT CAST(SUM(len) AS BIGINT) AS nud,
                         CAST(COALESCE(SUM(len) FILTER (len >= 3),
                                       0) AS BIGINT) AS nih,
                         CAST(COUNT(*) AS BIGINT) AS nr,
                         CAST(SUM(CASE WHEN len >= 3
                                       THEN 1 ELSE 0 END)
                              AS BIGINT) AS nhr,
                         CAST(MAX(len) AS BIGINT) AS mr FROM r)
            SELECT nud AS n_user_days, nih AS n_in_habit,
                   CAST(10000 * nih // nud AS BIGINT)
                       AS habit_mass_bps,
                   nr AS n_runs, nhr AS n_habit_runs,
                   mr AS max_run
            FROM s
        """,
        "type_reach_drift": """
            WITH b AS (SELECT (MIN(epoch_us(ts) // 86400000000)
                             + MAX(epoch_us(ts) // 86400000000))
                             // 2 AS mid FROM events),
            e AS (SELECT DISTINCT event_type AS t,
                         CASE WHEN epoch_us(ts) // 86400000000
                                   > b.mid THEN 1 ELSE 0 END AS h,
                         user_id AS u
                  FROM events, b),
            g AS (SELECT t, h, CAST(COUNT(*) AS BIGINT) AS n
                  FROM e GROUP BY 1, 2),
            w AS (SELECT t,
                         CAST(COALESCE(MAX(n) FILTER (h = 0), 0)
                              AS BIGINT) AS u1,
                         CAST(COALESCE(MAX(n) FILTER (h = 1), 0)
                              AS BIGINT) AS u2
                  FROM g GROUP BY t)
            SELECT t AS event_type, u1 AS users_h1,
                   u2 AS users_h2,
                   CAST(CASE WHEN u1 > 0
                             THEN 1000 * u2 // u1 - 1000
                             ELSE -9999 END AS BIGINT)
                       AS shift_milli
            FROM w ORDER BY t
        """,
        "supplier_balance_leadtime": """
            WITH j AS (SELECT l_suppkey AS s,
                              epoch_us(l_shipdate) // 86400000000
                              - epoch_us(o_orderdate)
                                // 86400000000 AS lag
                       FROM lineitem
                       JOIN orders ON o_orderkey = l_orderkey),
            g AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(lag) AS BIGINT) AS sl
                  FROM j GROUP BY 1),
            b AS (SELECT g.n, g.sl,
                         CASE WHEN CAST(FLOOR(s_acctbal * 100)
                                        AS BIGINT) < 0 THEN 0
                              WHEN CAST(FLOOR(s_acctbal * 100)
                                        AS BIGINT) < 250000 THEN 1
                              WHEN CAST(FLOOR(s_acctbal * 100)
                                        AS BIGINT) < 500000 THEN 2
                              ELSE 3 END AS band
                  FROM g JOIN supplier ON s_suppkey = g.s)
            SELECT CAST(band AS BIGINT) AS balance_band,
                   CAST(COUNT(*) AS BIGINT) AS n_suppliers,
                   CAST(SUM(n) AS BIGINT) AS n_lines,
                   CAST(1000 * SUM(sl) // SUM(n) AS BIGINT)
                       AS mean_lead_milli
            FROM b GROUP BY band ORDER BY band
        """,
        "segment_share_drift": """
            WITH b AS (SELECT (MIN(epoch_us(o_orderdate)
                                   // 86400000000)
                             + MAX(epoch_us(o_orderdate)
                                   // 86400000000)) // 2 AS mid
                       FROM orders),
            e AS (SELECT c_mktsegment AS seg,
                         CASE WHEN epoch_us(o_orderdate)
                                   // 86400000000 > b.mid
                              THEN 1 ELSE 0 END AS h
                  FROM orders
                  JOIN customer ON c_custkey = o_custkey, b),
            g AS (SELECT seg, h, CAST(COUNT(*) AS BIGINT) AS n
                  FROM e GROUP BY 1, 2),
            t AS (SELECT CAST(COALESCE(SUM(n) FILTER (h = 0), 0)
                              AS BIGINT) AS t1,
                         CAST(COALESCE(SUM(n) FILTER (h = 1), 0)
                              AS BIGINT) AS t2 FROM g),
            w AS (SELECT seg,
                         CAST(COALESCE(MAX(n) FILTER (h = 0), 0)
                              AS BIGINT) AS a,
                         CAST(COALESCE(MAX(n) FILTER (h = 1), 0)
                              AS BIGINT) AS b2
                  FROM g GROUP BY seg)
            SELECT seg AS segment, a AS orders_h1,
                   b2 AS orders_h2,
                   CAST(CASE WHEN t.t1 > 0 THEN 10000 * a // t.t1
                             ELSE -9999 END AS BIGINT)
                       AS share_h1_bps,
                   CAST(CASE WHEN t.t2 > 0 THEN 10000 * b2 // t.t2
                             ELSE -9999 END AS BIGINT)
                       AS share_h2_bps,
                   CAST(CASE WHEN a > 0 AND t.t2 > 0 THEN
                        1000 * b2 * t.t1 // (a * t.t2) - 1000
                        ELSE -9999 END AS BIGINT) AS shift_milli
            FROM w, t ORDER BY segment
        """,
        "brand_promo_spend": """
            WITH j AS (SELECT p_brand AS b,
                              CAST(FLOOR(l_extendedprice * 100)
                                   AS BIGINT) AS cents,
                              CAST(FLOOR(l_extendedprice * 100)
                                   AS BIGINT)
                              * CAST(FLOOR(l_discount * 100)
                                     AS BIGINT) // 100 AS promo
                       FROM lineitem
                       JOIN part ON p_partkey = l_partkey),
            g AS (SELECT b, CAST(SUM(cents) AS BIGINT) AS gr,
                         CAST(SUM(promo) AS BIGINT) AS pr
                  FROM j GROUP BY 1),
            t AS (SELECT CAST(SUM(pr) AS BIGINT) AS pt FROM g)
            SELECT b AS brand, gr AS gross_cents,
                   pr AS promo_cents,
                   CAST(10000 * pr // gr AS BIGINT)
                       AS promo_rate_bps,
                   CAST(CASE WHEN t.pt > 0 THEN 10000 * pr // t.pt
                             ELSE -9999 END AS BIGINT)
                       AS promo_budget_share_bps
            FROM g, t WHERE gr > 0 ORDER BY brand
        """,
        "doc_length_drift": """
            WITH b AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2
                                  AS mid FROM documents),
            e AS (SELECT CASE WHEN doc_id > b.mid
                              THEN 1 ELSE 0 END AS h,
                         CAST(n_chars AS BIGINT) AS v
                  FROM documents, b),
            g AS (SELECT h, v, CAST(COUNT(*) AS BIGINT) AS c
                  FROM e GROUP BY 1, 2),
            w AS (SELECT h, v, c,
                         SUM(c) OVER (PARTITION BY h ORDER BY v
                                      ROWS UNBOUNDED PRECEDING)
                             AS cum,
                         SUM(c) OVER (PARTITION BY h) AS n
                  FROM g),
            p AS (SELECT h,
                         CAST(MIN(v) FILTER (
                              cum >= (50 * n + 99) // 100)
                              AS BIGINT) AS p50,
                         CAST(MAX(n) AS BIGINT) AS n
                  FROM w GROUP BY h)
            SELECT a.n AS n_h1, b2.n AS n_h2,
                   a.p50 AS p50_chars_h1, b2.p50 AS p50_chars_h2,
                   CAST(CASE WHEN a.p50 > 0
                             THEN 1000 * b2.p50 // a.p50 - 1000
                             ELSE -9999 END AS BIGINT)
                       AS shift_milli
            FROM p a JOIN p b2 ON a.h = 0 AND b2.h = 1
        """,
        "return_status_contract_audit": """
            WITH g AS (SELECT l_returnflag AS rf,
                              l_linestatus AS st,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM lineitem GROUP BY 1, 2),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS n,
                         CAST(COALESCE(SUM(n) FILTER (
                              rf = 'N' AND st = 'F'), 0) AS BIGINT)
                             AS vnf,
                         CAST(COALESCE(SUM(n) FILTER (
                              rf <> 'N' AND st = 'O'), 0)
                              AS BIGINT) AS vro
                  FROM g)
            SELECT rf AS returnflag, st AS linestatus,
                   g.n AS n_lines,
                   CAST(10000 * g.n // t.n AS BIGINT)
                       AS share_bps,
                   t.vnf AS viol_n_on_f, t.vro AS viol_ra_on_o,
                   CAST(10000 * (t.vnf + t.vro) // t.n AS BIGINT)
                       AS violation_bps
            FROM g, t ORDER BY rf, st
        """,
        "returns_by_size": """
            WITH j AS (SELECT LEAST(GREATEST(
                                  (CAST(p_size AS BIGINT) - 1)
                                  // 10, 0), 4) AS b,
                              CASE WHEN l_returnflag = 'R'
                                   THEN 1 ELSE 0 END AS r
                       FROM lineitem
                       JOIN part ON p_partkey = l_partkey),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(r) AS BIGINT) AS rt FROM j)
            SELECT b AS size_band,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(r) AS BIGINT) AS n_returned,
                   CAST(10000 * SUM(r) // COUNT(*) AS BIGINT)
                       AS return_bps,
                   CAST(CASE WHEN MAX(t.rt) > 0 THEN
                        1000 * SUM(r) * MAX(t.n)
                        // (COUNT(*) * MAX(t.rt)) - 1000
                        ELSE -9999 END AS BIGINT) AS lift_milli
            FROM j, t GROUP BY b ORDER BY b
        """,
        # the sketch variant is output-identical by construction (MG
        # candidate pruning with the N/(m+1) admission bound + exact
        # recount), so it shares the exact op's SQL twin verbatim
        "top_token_drift_sketch": _TOP_TOKEN_DRIFT_SQL,
        "top_token_drift": _TOP_TOKEN_DRIFT_SQL,
        
        "return_rate_drift": """
            WITH b AS (SELECT (MIN(epoch_us(l_shipdate)
                                   // 86400000000)
                             + MAX(epoch_us(l_shipdate)
                                   // 86400000000)) // 2 AS mid
                       FROM lineitem),
            e AS (SELECT CASE WHEN epoch_us(l_shipdate)
                                   // 86400000000 > b.mid
                              THEN 1 ELSE 0 END AS h,
                         CASE WHEN l_returnflag = 'R'
                              THEN 1 ELSE 0 END AS r
                  FROM lineitem, b),
            s AS (SELECT CAST(COALESCE(SUM(1) FILTER (h = 0), 0)
                              AS BIGINT) AS n1,
                         CAST(COALESCE(SUM(r) FILTER (h = 0), 0)
                              AS BIGINT) AS r1,
                         CAST(COALESCE(SUM(1) FILTER (h = 1), 0)
                              AS BIGINT) AS n2,
                         CAST(COALESCE(SUM(r) FILTER (h = 1), 0)
                              AS BIGINT) AS r2 FROM e)
            SELECT n1 AS n_h1, r1 AS returned_h1,
                   CAST(CASE WHEN n1 > 0 THEN 10000 * r1 // n1
                             ELSE -9999 END AS BIGINT)
                       AS rate_h1_bps,
                   n2 AS n_h2, r2 AS returned_h2,
                   CAST(CASE WHEN n2 > 0 THEN 10000 * r2 // n2
                             ELSE -9999 END AS BIGINT)
                       AS rate_h2_bps,
                   CAST(CASE WHEN r1 > 0 AND n2 > 0 THEN
                        1000 * r2 * n1 // (n2 * r1) - 1000
                        ELSE -9999 END AS BIGINT) AS shift_milli
            FROM s
        """,
        "entry_type_value": """
            WITH r AS (SELECT user_id AS u, event_type,
                              ROW_NUMBER() OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
                       FROM events),
            f AS (SELECT u, event_type AS typ FROM r
                  WHERE rn = 1),
            v AS (SELECT user_id AS u,
                         CAST(SUM(CAST(FLOOR(value * 100)
                                       AS BIGINT)) AS BIGINT)
                             AS tv
                  FROM events GROUP BY 1),
            j AS (SELECT f.typ, v.tv FROM f JOIN v USING (u)),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(tv) AS BIGINT) AS s FROM j)
            SELECT typ AS entry_type,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(10000 * COUNT(*) // MAX(t.n) AS BIGINT)
                       AS share_bps,
                   CAST(1000 * SUM(tv) // COUNT(*) AS BIGINT)
                       AS mean_cents_milli,
                   CAST(CASE WHEN MAX(t.s) > 0 THEN
                        1000 * CAST(SUM(tv) AS HUGEINT) * MAX(t.n)
                        // (CAST(COUNT(*) AS HUGEINT) * MAX(t.s))
                        - 1000
                        ELSE -9999 END AS BIGINT)
                       AS value_lift_milli
            FROM j, t GROUP BY typ ORDER BY typ
        """,
        "nation_one_and_done": """
            WITH a AS (SELECT o_custkey AS k,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM orders GROUP BY 1),
            cu AS (SELECT c_nationkey AS nk, COALESCE(a.c, 0) AS c
                   FROM customer LEFT JOIN a ON a.k = c_custkey),
            t AS (SELECT CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0
                                  END) AS BIGINT) AS ts,
                         CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0
                                  END) AS BIGINT) AS toa FROM cu)
            SELECT n_name AS nation,
                   CAST(COUNT(*) AS BIGINT) AS n_customers,
                   CAST(SUM(CASE WHEN c = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_never,
                   CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_single,
                   CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_multi,
                   CAST(CASE WHEN SUM(CASE WHEN c > 0 THEN 1
                                           ELSE 0 END) > 0 THEN
                        10000 * SUM(CASE WHEN c = 1 THEN 1 ELSE 0
                                    END)
                        // SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END)
                        ELSE -9999 END AS BIGINT) AS single_bps,
                   CAST(CASE WHEN SUM(CASE WHEN c > 0 THEN 1
                                           ELSE 0 END) > 0
                                  AND MAX(t.ts) > 0 THEN
                        1000 * SUM(CASE WHEN c = 1 THEN 1 ELSE 0
                                   END) * MAX(t.toa)
                        // (SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END)
                            * MAX(t.ts)) - 1000
                        ELSE -9999 END AS BIGINT) AS lift_milli
            FROM cu JOIN nation ON n_nationkey = cu.nk, t
            GROUP BY n_name ORDER BY n_name
        """,
        "assortment_grid_fill": """
            WITH g AS (SELECT DISTINCT p_brand AS b,
                              CAST(p_size AS BIGINT) AS s
                       FROM part),
            nb AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS n
                   FROM g),
            oc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM g),
            cov AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c
                    FROM g GROUP BY b ORDER BY c DESC, b LIMIT 1)
            SELECT nb.n AS n_brands, CAST(50 AS BIGINT) AS n_sizes,
                   nb.n * 50 AS n_cells, oc.n AS n_occupied,
                   CAST(10000 * oc.n // (nb.n * 50) AS BIGINT)
                       AS fill_bps,
                   cov.b AS widest_brand,
                   cov.c AS widest_brand_sizes
            FROM nb, oc, cov
        """,
        "top_supplier_share_drift": """
            WITH b AS (SELECT (MIN(epoch_us(l_shipdate)
                                   // 86400000000)
                             + MAX(epoch_us(l_shipdate)
                                   // 86400000000)) // 2 AS mid
                       FROM lineitem),
            e AS (SELECT l_suppkey AS s,
                         CASE WHEN epoch_us(l_shipdate)
                                   // 86400000000 > b.mid
                              THEN 1 ELSE 0 END AS h,
                         CAST(FLOOR(l_extendedprice * 100)
                              AS BIGINT) AS cents
                  FROM lineitem, b),
            g AS (SELECT s, h, CAST(SUM(cents) AS BIGINT) AS v
                  FROM e GROUP BY 1, 2),
            t AS (SELECT CAST(COALESCE(SUM(v) FILTER (h = 0), 0)
                              AS BIGINT) AS t1,
                         CAST(COALESCE(SUM(v) FILTER (h = 1), 0)
                              AS BIGINT) AS t2 FROM g),
            tp AS (SELECT s, CAST(SUM(v) AS BIGINT) AS rev,
                          CAST(COALESCE(SUM(v) FILTER (h = 0), 0)
                               AS BIGINT) AS a,
                          CAST(COALESCE(SUM(v) FILTER (h = 1), 0)
                               AS BIGINT) AS bb
                   FROM g GROUP BY s
                   ORDER BY rev DESC, s LIMIT 10)
            SELECT CAST(s AS BIGINT) AS s_suppkey,
                   rev AS revenue_cents,
                   CAST(CASE WHEN t.t1 > 0 THEN 10000 * a // t.t1
                             ELSE -9999 END AS BIGINT)
                       AS share_h1_bps,
                   CAST(CASE WHEN t.t2 > 0 THEN 10000 * bb // t.t2
                             ELSE -9999 END AS BIGINT)
                       AS share_h2_bps,
                   CAST(CASE WHEN a > 0 AND t.t2 > 0 THEN
                        1000 * CAST(bb AS HUGEINT) * t.t1
                        // (CAST(a AS HUGEINT) * t.t2) - 1000
                        ELSE -9999 END AS BIGINT) AS shift_milli
            FROM tp, t
        """,
        "supplier_churn_census": """
            WITH b AS (SELECT (MIN(epoch_us(l_shipdate)
                                   // 86400000000)
                             + MAX(epoch_us(l_shipdate)
                                   // 86400000000)) // 2 AS mid
                       FROM lineitem),
            p AS (SELECT l_suppkey AS s,
                         MAX(CASE WHEN epoch_us(l_shipdate)
                                       // 86400000000 <= b.mid
                                  THEN 1 ELSE 0 END) AS h1,
                         MAX(CASE WHEN epoch_us(l_shipdate)
                                       // 86400000000 > b.mid
                                  THEN 1 ELSE 0 END) AS h2
                  FROM lineitem, b GROUP BY 1)
            SELECT CAST(COUNT(*) AS BIGINT)
                       AS n_suppliers_shipping,
                   CAST(SUM(h1 * h2) AS BIGINT) AS n_both,
                   CAST(SUM(CASE WHEN h1 = 1 AND h2 = 0
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_lost,
                   CAST(SUM(CASE WHEN h1 = 0 AND h2 = 1
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_new,
                   CAST(10000 * SUM(h1 * h2)
                        // (SUM(h1 * h2)
                            + SUM(CASE WHEN h1 = 1 AND h2 = 0
                                       THEN 1 ELSE 0 END))
                        AS BIGINT) AS retention_bps
            FROM p
        """,
        "customer_churn_census": """
            WITH b AS (SELECT (MIN(epoch_us(o_orderdate)
                                   // 86400000000)
                             + MAX(epoch_us(o_orderdate)
                                   // 86400000000)) // 2 AS mid
                       FROM orders),
            p AS (SELECT o_custkey AS c,
                         MAX(CASE WHEN epoch_us(o_orderdate)
                                       // 86400000000 <= b.mid
                                  THEN 1 ELSE 0 END) AS h1,
                         MAX(CASE WHEN epoch_us(o_orderdate)
                                       // 86400000000 > b.mid
                                  THEN 1 ELSE 0 END) AS h2
                  FROM orders, b GROUP BY 1)
            SELECT CAST(COUNT(*) AS BIGINT)
                       AS n_customers_ordering,
                   CAST(SUM(h1 * h2) AS BIGINT) AS n_both,
                   CAST(SUM(CASE WHEN h1 = 1 AND h2 = 0
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_churned,
                   CAST(SUM(CASE WHEN h1 = 0 AND h2 = 1
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_acquired,
                   CAST(10000 * SUM(h1 * h2)
                        // (SUM(h1 * h2)
                            + SUM(CASE WHEN h1 = 1 AND h2 = 0
                                       THEN 1 ELSE 0 END))
                        AS BIGINT) AS retention_bps
            FROM p
        """,
        "source_ttr_profile": """
            WITH tk AS (SELECT source,
                               CAST(SUM(LENGTH(text)
                                        - LENGTH(REPLACE(text, ' ',
                                                         ''))
                                        + 1) AS BIGINT) AS toks
                        FROM documents GROUP BY 1),
            ty AS (SELECT source, CAST(COUNT(*) AS BIGINT)
                              AS types
                   FROM (SELECT DISTINCT source, tok
                         FROM (SELECT source,
                                      UNNEST(STRING_SPLIT(text,
                                                          ' '))
                                          AS tok
                               FROM documents))
                   GROUP BY 1)
            SELECT tk.source, tk.toks AS n_tokens,
                   ty.types AS n_types,
                   CAST(1000 * ty.types // tk.toks AS BIGINT)
                       AS ttr_milli
            FROM tk JOIN ty USING (source) ORDER BY source
        """,
        "churned_value_share": """
            WITH b AS (SELECT (MIN(epoch_us(o_orderdate)
                                   // 86400000000)
                             + MAX(epoch_us(o_orderdate)
                                   // 86400000000)) // 2 AS mid
                       FROM orders),
            o AS (SELECT o_custkey AS c,
                         CASE WHEN epoch_us(o_orderdate)
                                   // 86400000000 > b.mid
                              THEN 1 ELSE 0 END AS h,
                         CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                             AS v
                  FROM orders, b),
            cu AS (SELECT c,
                          CAST(COALESCE(SUM(v) FILTER (h = 0), 0)
                               AS BIGINT) AS s1,
                          CAST(COALESCE(SUM(1) FILTER (h = 0), 0)
                               AS BIGINT) AS n1,
                          CAST(COALESCE(MAX(1) FILTER (h = 1), 0)
                               AS BIGINT) AS has2
                   FROM o GROUP BY c),
            s AS (SELECT CAST(COALESCE(SUM(s1) FILTER (
                             n1 > 0 AND has2 = 0), 0) AS BIGINT)
                             AS cs,
                         CAST(COALESCE(SUM(n1) FILTER (
                             n1 > 0 AND has2 = 0), 0) AS BIGINT)
                             AS cn,
                         CAST(COALESCE(SUM(1) FILTER (
                             n1 > 0 AND has2 = 0), 0) AS BIGINT)
                             AS cc,
                         CAST(COALESCE(SUM(s1) FILTER (
                             n1 > 0 AND has2 = 1), 0) AS BIGINT)
                             AS rs,
                         CAST(COALESCE(SUM(n1) FILTER (
                             n1 > 0 AND has2 = 1), 0) AS BIGINT)
                             AS rn,
                         CAST(COALESCE(SUM(1) FILTER (
                             n1 > 0 AND has2 = 1), 0) AS BIGINT)
                             AS rc
                  FROM cu)
            SELECT cc AS n_churned, rc AS n_retained,
                   cs AS churned_h1_cents,
                   rs AS retained_h1_cents,
                   CAST(CASE WHEN cs + rs > 0
                             THEN 10000 * cs // (cs + rs)
                             ELSE -9999 END AS BIGINT)
                       AS churned_value_bps,
                   CAST(CASE WHEN cn > 0 THEN cs // cn
                             ELSE -9999 END AS BIGINT)
                       AS churned_aov_cents,
                   CAST(CASE WHEN rn > 0 THEN rs // rn
                             ELSE -9999 END AS BIGINT)
                       AS retained_aov_cents
            FROM s
        """,
        "discount_mix_drift": """
            WITH b AS (SELECT (MIN(epoch_us(l_shipdate)
                                   // 86400000000)
                             + MAX(epoch_us(l_shipdate)
                                   // 86400000000)) // 2 AS mid
                       FROM lineitem),
            e AS (SELECT CAST(FLOOR(l_discount * 100) AS BIGINT)
                             AS lv,
                         CASE WHEN epoch_us(l_shipdate)
                                   // 86400000000 > b.mid
                              THEN 1 ELSE 0 END AS h
                  FROM lineitem, b),
            g AS (SELECT lv, h, CAST(COUNT(*) AS BIGINT) AS c
                  FROM e GROUP BY 1, 2),
            t AS (SELECT CAST(COALESCE(SUM(c) FILTER (h = 0), 0)
                              AS BIGINT) AS t1,
                         CAST(COALESCE(SUM(c) FILTER (h = 1), 0)
                              AS BIGINT) AS t2 FROM g),
            w AS (SELECT lv,
                         CAST(COALESCE(MAX(c) FILTER (h = 0), 0)
                              AS BIGINT) AS a,
                         CAST(COALESCE(MAX(c) FILTER (h = 1), 0)
                              AS BIGINT) AS b2
                  FROM g GROUP BY lv)
            SELECT lv AS discount_pct, a AS n_h1, b2 AS n_h2,
                   CAST(CASE WHEN t.t1 > 0 THEN 10000 * a // t.t1
                             ELSE -9999 END AS BIGINT)
                       AS share_h1_bps,
                   CAST(CASE WHEN t.t2 > 0 THEN 10000 * b2 // t.t2
                             ELSE -9999 END AS BIGINT)
                       AS share_h2_bps,
                   CAST(CASE WHEN a > 0 AND t.t2 > 0 THEN
                        1000 * b2 * t.t1 // (a * t.t2) - 1000
                        ELSE -9999 END AS BIGINT) AS shift_milli
            FROM w, t ORDER BY lv
        """,
        "signup_dow_profile": """
            WITH r AS (SELECT user_id AS u, ts, event_id,
                              ROW_NUMBER() OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
                       FROM events),
            f AS (SELECT ((epoch_us(ts) // 86400000000) + 4) % 7
                             AS dow
                  FROM r WHERE rn = 1),
            a AS (SELECT ((epoch_us(ts) // 86400000000) + 4) % 7
                             AS dow,
                         CAST(COUNT(*) AS BIGINT) AS act
                  FROM events GROUP BY 1),
            fa AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS arr
                   FROM f GROUP BY 1),
            j AS (SELECT COALESCE(a.dow, fa.dow) AS dow,
                         COALESCE(fa.arr, 0) AS arr,
                         COALESCE(a.act, 0) AS act
                  FROM a FULL OUTER JOIN fa ON fa.dow = a.dow),
            t AS (SELECT CAST(SUM(arr) AS BIGINT) AS at,
                         CAST(SUM(act) AS BIGINT) AS et FROM j)
            SELECT CAST(dow AS BIGINT) AS dow,
                   CAST(arr AS BIGINT) AS n_arrivals,
                   CAST(CASE WHEN t.at > 0 THEN 10000 * arr // t.at
                             ELSE -9999 END AS BIGINT)
                       AS arrival_share_bps,
                   CAST(act AS BIGINT) AS n_events,
                   CAST(CASE WHEN t.et > 0 THEN 10000 * act // t.et
                             ELSE -9999 END AS BIGINT)
                       AS activity_share_bps,
                   CAST(CASE WHEN t.at > 0 AND act > 0 THEN
                        1000 * arr * t.et // (t.at * act) - 1000
                        ELSE -9999 END AS BIGINT)
                       AS arrival_lift_milli
            FROM j, t WHERE arr + act > 0 ORDER BY dow
        """,
        "segment_churn_census": """
            WITH b AS (SELECT (MIN(epoch_us(o_orderdate)
                                   // 86400000000)
                             + MAX(epoch_us(o_orderdate)
                                   // 86400000000)) // 2 AS mid
                       FROM orders),
            p AS (SELECT o_custkey AS c,
                         MAX(CASE WHEN epoch_us(o_orderdate)
                                       // 86400000000 <= b.mid
                                  THEN 1 ELSE 0 END) AS h1,
                         MAX(CASE WHEN epoch_us(o_orderdate)
                                       // 86400000000 > b.mid
                                  THEN 1 ELSE 0 END) AS h2
                  FROM orders, b GROUP BY 1),
            j AS (SELECT c_mktsegment AS seg, p.h1, p.h2
                  FROM p JOIN customer ON c_custkey = p.c),
            t AS (SELECT CAST(SUM(h1) AS BIGINT) AS ta,
                         CAST(SUM(CASE WHEN h1 = 1 AND h2 = 0
                                       THEN 1 ELSE 0 END)
                              AS BIGINT) AS tc FROM j)
            SELECT seg AS segment,
                   CAST(SUM(h1) AS BIGINT) AS n_h1_active,
                   CAST(SUM(CASE WHEN h1 = 1 AND h2 = 0
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_churned,
                   CAST(10000 * (SUM(h1)
                                 - SUM(CASE WHEN h1 = 1 AND h2 = 0
                                            THEN 1 ELSE 0 END))
                        // SUM(h1) AS BIGINT) AS retention_bps,
                   CAST(CASE WHEN MAX(t.tc) > 0 THEN
                        1000 * SUM(CASE WHEN h1 = 1 AND h2 = 0
                                        THEN 1 ELSE 0 END)
                        * MAX(t.ta)
                        // (SUM(h1) * MAX(t.tc)) - 1000
                        ELSE -9999 END AS BIGINT)
                       AS churn_lift_milli
            FROM j, t GROUP BY seg HAVING SUM(h1) > 0
            ORDER BY seg
        """,
        "entry_type_retention": """
            WITH r AS (SELECT user_id AS u, event_type, ts,
                              event_id,
                              ROW_NUMBER() OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
                       FROM events),
            f AS (SELECT u, event_type AS typ,
                         epoch_us(ts) // 86400000000 AS fd
                  FROM r WHERE rn = 1),
            ud AS (SELECT DISTINCT user_id AS u,
                          epoch_us(ts) // 86400000000 AS d
                   FROM events),
            rt AS (SELECT DISTINCT f.u
                   FROM f JOIN ud ON ud.u = f.u
                        AND ud.d > f.fd AND ud.d <= f.fd + 7),
            j AS (SELECT f.typ,
                         CASE WHEN rt.u IS NULL THEN 0 ELSE 1 END
                             AS ret
                  FROM f LEFT JOIN rt ON rt.u = f.u),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(ret) AS BIGINT) AS r FROM j)
            SELECT typ AS entry_type,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(ret) AS BIGINT) AS n_returned_week1,
                   CAST(10000 * SUM(ret) // COUNT(*) AS BIGINT)
                       AS return_bps,
                   CAST(CASE WHEN MAX(t.r) > 0 THEN
                        1000 * SUM(ret) * MAX(t.n)
                        // (COUNT(*) * MAX(t.r)) - 1000
                        ELSE -9999 END AS BIGINT) AS lift_milli
            FROM j, t GROUP BY typ ORDER BY typ
        """,
        "quarter_end_loading": """
            WITH e AS (SELECT (epoch_us(o_orderdate)
                               // 86400000000 // 30) % 3 AS pos,
                              CAST(FLOOR(o_totalprice * 100)
                                   AS BIGINT) AS cents
                       FROM orders),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(cents) AS BIGINT) AS s FROM e)
            SELECT CAST(pos AS BIGINT) AS month_of_quarter,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(cents) AS BIGINT) AS revenue_cents,
                   CAST(10000 * COUNT(*) // MAX(t.n) AS BIGINT)
                       AS order_share_bps,
                   CAST(CASE WHEN MAX(t.s) > 0 THEN
                        1000 * CAST(SUM(cents) AS HUGEINT)
                        * MAX(t.n)
                        // (CAST(COUNT(*) AS HUGEINT) * MAX(t.s))
                        - 1000
                        ELSE -9999 END AS BIGINT)
                       AS rpo_lift_milli
            FROM e, t GROUP BY pos ORDER BY pos
        """,
        "nation_churn_census": """
            WITH b AS (SELECT (MIN(epoch_us(o_orderdate)
                                   // 86400000000)
                             + MAX(epoch_us(o_orderdate)
                                   // 86400000000)) // 2 AS mid
                       FROM orders),
            p AS (SELECT o_custkey AS c,
                         MAX(CASE WHEN epoch_us(o_orderdate)
                                       // 86400000000 <= b.mid
                                  THEN 1 ELSE 0 END) AS h1,
                         MAX(CASE WHEN epoch_us(o_orderdate)
                                       // 86400000000 > b.mid
                                  THEN 1 ELSE 0 END) AS h2
                  FROM orders, b GROUP BY 1),
            j AS (SELECT n_name AS nation, p.h1, p.h2
                  FROM p JOIN customer ON c_custkey = p.c
                         JOIN nation ON n_nationkey = c_nationkey),
            t AS (SELECT CAST(SUM(h1) AS BIGINT) AS ta,
                         CAST(SUM(CASE WHEN h1 = 1 AND h2 = 0
                                       THEN 1 ELSE 0 END)
                              AS BIGINT) AS tc FROM j)
            SELECT nation,
                   CAST(SUM(h1) AS BIGINT) AS n_h1_active,
                   CAST(SUM(CASE WHEN h1 = 1 AND h2 = 0
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_churned,
                   CAST(10000 * (SUM(h1)
                                 - SUM(CASE WHEN h1 = 1 AND h2 = 0
                                            THEN 1 ELSE 0 END))
                        // SUM(h1) AS BIGINT) AS retention_bps,
                   CAST(CASE WHEN MAX(t.tc) > 0 THEN
                        1000 * SUM(CASE WHEN h1 = 1 AND h2 = 0
                                        THEN 1 ELSE 0 END)
                        * MAX(t.ta)
                        // (SUM(h1) * MAX(t.tc)) - 1000
                        ELSE -9999 END AS BIGINT)
                       AS churn_lift_milli
            FROM j, t GROUP BY nation HAVING SUM(h1) > 0
            ORDER BY nation
        """,
        "part_velocity_census": """
            WITH p AS (SELECT l_partkey AS k,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM lineitem GROUP BY 1),
            b AS (SELECT CASE WHEN c < 20 THEN 0
                              WHEN c < 30 THEN 1
                              WHEN c < 40 THEN 2
                              ELSE 3 END AS band, c FROM p),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tp,
                         CAST(SUM(c) AS BIGINT) AS tl FROM p)
            SELECT band AS velocity_band,
                   CAST(COUNT(*) AS BIGINT) AS n_parts,
                   CAST(10000 * COUNT(*) // MAX(t.tp) AS BIGINT)
                       AS part_share_bps,
                   CAST(SUM(c) AS BIGINT) AS n_lines,
                   CAST(10000 * SUM(c) // MAX(t.tl) AS BIGINT)
                       AS line_share_bps
            FROM b, t GROUP BY band ORDER BY band
        """,
        "repeat_revenue_share": """
            WITH cu AS (SELECT o_custkey AS c,
                               CAST(COUNT(*) AS BIGINT) AS n,
                               CAST(SUM(CAST(FLOOR(o_totalprice
                                                   * 100)
                                             AS BIGINT)) AS BIGINT)
                                   AS s
                        FROM orders GROUP BY 1),
            a AS (SELECT CAST(COALESCE(SUM(1) FILTER (n = 1), 0)
                              AS BIGINT) AS sc,
                         CAST(COALESCE(SUM(n) FILTER (n = 1), 0)
                              AS BIGINT) AS sn,
                         CAST(COALESCE(SUM(s) FILTER (n = 1), 0)
                              AS BIGINT) AS ss,
                         CAST(COALESCE(SUM(1) FILTER (n > 1), 0)
                              AS BIGINT) AS rc,
                         CAST(COALESCE(SUM(n) FILTER (n > 1), 0)
                              AS BIGINT) AS rn,
                         CAST(COALESCE(SUM(s) FILTER (n > 1), 0)
                              AS BIGINT) AS rs
                  FROM cu)
            SELECT sc AS n_single_cust, ss AS single_cents,
                   rc AS n_repeat_cust, rs AS repeat_cents,
                   CAST(CASE WHEN ss + rs > 0
                             THEN 10000 * rs // (ss + rs)
                             ELSE -9999 END AS BIGINT)
                       AS repeat_revenue_bps,
                   CAST(CASE WHEN sn > 0 AND ss // sn > 0 AND
                                  rn > 0
                             THEN 1000 * (rs // rn) // (ss // sn)
                             ELSE -9999 END AS BIGINT)
                       AS aov_ratio_milli
            FROM a
        """,
        "lang_length_profile": """
            WITH h AS (SELECT lang, CAST(n_chars AS BIGINT) AS v,
                              CAST(COUNT(*) AS BIGINT) AS c
                       FROM documents GROUP BY 1, 2),
            w AS (SELECT lang, v, c,
                         SUM(c) OVER (PARTITION BY lang ORDER BY v
                                      ROWS UNBOUNDED PRECEDING)
                             AS cum,
                         SUM(c) OVER (PARTITION BY lang) AS n,
                         SUM(v * c) OVER (PARTITION BY lang) AS s
                  FROM h)
            SELECT lang, CAST(MAX(n) AS BIGINT) AS n_docs,
                   CAST(1000 * MAX(s) // MAX(n) AS BIGINT)
                       AS mean_chars_milli,
                   CAST(MIN(v) FILTER (
                        cum >= (50 * n + 99) // 100) AS BIGINT)
                       AS p50_chars
            FROM w GROUP BY lang ORDER BY lang
        """,
        "dead_stock_value": """
            WITH sold AS (SELECT DISTINCT l_partkey AS p
                          FROM lineitem),
            j AS (SELECT CAST(FLOOR(p_retailprice * 100)
                              AS BIGINT) AS cents,
                         CASE WHEN sold.p IS NULL
                              THEN 1 ELSE 0 END AS dead
                  FROM part LEFT JOIN sold ON sold.p = p_partkey),
            s AS (SELECT CAST(COUNT(*) AS BIGINT) AS np,
                         CAST(COALESCE(SUM(1) FILTER (dead = 1),
                                       0) AS BIGINT) AS nd,
                         CAST(COALESCE(SUM(cents) FILTER (
                              dead = 1), 0) AS BIGINT) AS dc,
                         CAST(COALESCE(SUM(cents) FILTER (
                              dead = 0), 0) AS BIGINT) AS lc
                  FROM j)
            SELECT np AS n_parts, nd AS n_dead,
                   dc AS dead_list_cents,
                   CAST(CASE WHEN dc + lc > 0
                             THEN 10000 * dc // (dc + lc)
                             ELSE -9999 END AS BIGINT)
                       AS dead_value_bps,
                   CAST(CASE WHEN nd > 0 THEN dc // nd
                             ELSE -9999 END AS BIGINT)
                       AS dead_mean_cents,
                   CAST(CASE WHEN np - nd > 0
                             THEN lc // (np - nd)
                             ELSE -9999 END AS BIGINT)
                       AS live_mean_cents,
                   CAST(CASE WHEN nd > 0 AND np - nd > 0
                                  AND lc // (np - nd) > 0
                             THEN 1000 * (dc // nd)
                                  // (lc // (np - nd))
                             ELSE -9999 END AS BIGINT)
                       AS dead_live_ratio_milli
            FROM s
        """,
        "user_activity_gini": """
            WITH u AS (SELECT user_id,
                              CAST(COUNT(*) AS BIGINT) AS x
                       FROM events GROUP BY 1),
            r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS rn,
                         COUNT(*) OVER () AS n,
                         SUM(x) OVER () AS t FROM u),
            s AS (SELECT CAST(SUM((2 * rn - n - 1) * x) AS BIGINT)
                             AS s,
                         CAST(MAX(n) AS BIGINT) AS n,
                         CAST(MAX(t) AS BIGINT) AS t FROM r),
            k AS (SELECT CAST((MAX(n) + 9) // 10 AS BIGINT) AS k
                  FROM r),
            tp AS (SELECT CAST(SUM(x) AS BIGINT) AS top
                   FROM r, k
                   WHERE rn > (SELECT MAX(n) FROM r) - k.k)
            SELECT s.n AS n_users, s.t AS n_events,
                   CAST(CASE WHEN s.t > 0 THEN
                        1000 * s.s // (2 * s.n * s.t)
                        ELSE -9999 END AS BIGINT) AS gini_milli,
                   k.k AS n_top_decile,
                   tp.top AS top_decile_events,
                   CAST(CASE WHEN s.t > 0
                             THEN 10000 * tp.top // s.t
                             ELSE -9999 END AS BIGINT)
                       AS top_decile_share_bps
            FROM s, k, tp
        """,
        "nation_lead_time": """
            WITH j AS (SELECT s_nationkey AS k,
                              epoch_us(l_shipdate) // 86400000000
                              - epoch_us(o_orderdate)
                                // 86400000000 AS lag
                       FROM lineitem
                       JOIN orders ON o_orderkey = l_orderkey
                       JOIN supplier ON s_suppkey = l_suppkey),
            g AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(lag) AS BIGINT) AS s
                  FROM j GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS n,
                         CAST(SUM(s) AS BIGINT) AS s FROM g)
            SELECT n_name AS nation, g.n AS n_lines,
                   CAST(1000 * g.s // g.n AS BIGINT)
                       AS mean_lead_milli,
                   CAST(CASE WHEN t.s > 0 THEN
                        1000 * CAST(g.s AS HUGEINT) * t.n
                        // (CAST(g.n AS HUGEINT) * t.s) - 1000
                        ELSE -9999 END AS BIGINT)
                       AS lead_lift_milli
            FROM g JOIN nation ON n_nationkey = g.k, t
            ORDER BY nation
        """,
        "order_size_gap_effect": """
            WITH o AS (SELECT o_custkey AS c,
                              epoch_us(o_orderdate) // 86400000000
                                  AS d,
                              o_orderkey AS k,
                              CAST(FLOOR(o_totalprice * 100)
                                   AS BIGINT) AS v
                       FROM orders),
            p AS (SELECT v, LEAD(d) OVER w - d AS gap
                  FROM o WINDOW w AS (PARTITION BY c
                                      ORDER BY d, k)),
            pp AS (SELECT CASE WHEN v < 150000000 THEN 0
                               WHEN v < 250000000 THEN 1
                               WHEN v < 350000000 THEN 2
                               ELSE 3 END AS band, gap
                   FROM p WHERE gap IS NOT NULL),
            h AS (SELECT band, gap, CAST(COUNT(*) AS BIGINT) AS cc
                  FROM pp GROUP BY 1, 2),
            w2 AS (SELECT band, gap, cc,
                          SUM(cc) OVER (PARTITION BY band
                                        ORDER BY gap
                                        ROWS UNBOUNDED PRECEDING)
                              AS cum,
                          SUM(cc) OVER (PARTITION BY band) AS n,
                          SUM(gap * cc) OVER (PARTITION BY band)
                              AS s
                   FROM h)
            SELECT CAST(band AS BIGINT) AS value_band,
                   CAST(MAX(n) AS BIGINT) AS n_pairs,
                   CAST(1000 * MAX(s) // MAX(n) AS BIGINT)
                       AS mean_gap_milli,
                   CAST(MIN(gap) FILTER (
                        cum >= (50 * n + 99) // 100) AS BIGINT)
                       AS p50_gap_days
            FROM w2 GROUP BY band ORDER BY band
        """,
        "corpus_grid_fill": """
            WITH g AS (SELECT DISTINCT source AS s, lang AS l
                       FROM documents),
            ns AS (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) AS n
                   FROM g),
            nl AS (SELECT CAST(COUNT(DISTINCT l) AS BIGINT) AS n
                   FROM g),
            oc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM g),
            cov AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS c
                    FROM g GROUP BY s ORDER BY c DESC, s LIMIT 1)
            SELECT ns.n AS n_sources, nl.n AS n_langs,
                   ns.n * nl.n AS n_cells, oc.n AS n_occupied,
                   CAST(10000 * oc.n // (ns.n * nl.n) AS BIGINT)
                       AS fill_bps,
                   cov.s AS widest_source,
                   cov.c AS widest_source_langs
            FROM ns, nl, oc, cov
        """,
        "weekend_order_penalty": """
            WITH fs AS (SELECT l_orderkey AS k,
                               MIN(epoch_us(l_shipdate)
                                   // 86400000000) AS fd
                        FROM lineitem GROUP BY 1),
            j AS (SELECT (epoch_us(o_orderdate) // 86400000000
                          + 4) % 7 AS dow,
                         fs.fd - epoch_us(o_orderdate)
                         // 86400000000 AS lag
                  FROM orders JOIN fs ON fs.k = o_orderkey),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(lag) AS BIGINT) AS s FROM j)
            SELECT CAST(dow AS BIGINT) AS dow,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(1000 * SUM(lag) // COUNT(*) AS BIGINT)
                       AS mean_first_lag_milli,
                   CAST(CASE WHEN MAX(t.s) > 0 THEN
                        1000 * CAST(SUM(lag) AS HUGEINT) * MAX(t.n)
                        // (CAST(COUNT(*) AS HUGEINT) * MAX(t.s))
                        - 1000
                        ELSE -9999 END AS BIGINT) AS lift_milli
            FROM j, t GROUP BY dow ORDER BY dow
        """,
    }
