"""Declared query surface: the driver-checkable operator inventory.

Each submodule exposes ``QUERIES: dict[str, callable(spark, sf_dir) ->
DataFrame]`` and ``ORACLE: dict[str, str]`` (DuckDB ANSI SQL over the same
parquet tables). The driver — and ``tests/test_oracle.py`` — runs both
sides and compares row counts, schemas, and order-insensitive value
hashes.

Output conventions for stable cross-engine hashing:
- time columns as epoch-millis BIGINT (no timezone/precision ambiguity)
- floating-point results of arithmetic rounded via ``round(x, 6)`` on
  both sides (raw column values pass through unrounded — they're exact)
- aggregates aliased identically in Spark and SQL
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_timeseries_java_spark.queries import (
    corpus,
    dedup,
    fx,
    multimodal,
    relational,
    relational_ext,
    scale,
    similarity,
    text,
    tpch_hard,
)

_MODULES = [fx, relational, relational_ext, tpch_hard, dedup, text,
            similarity, multimodal, corpus, scale]

# Queries with a green three-way match in a prior round's driver
# CORRECTNESS file (union of all CORRECTNESS_r*.json — regenerate with
# scripts/update_driver_gated.py at the start of each round). The
# driver samples a prefix of the registry each round, so queries NOT in
# this set sort first — every declared query ends up with a driver entry
# across rounds. Newly added queries are absent here and therefore
# auto-prioritized.
_DRIVER_GATED = frozenset({
    "above_segment_avg", "allowed_lateness_stream_replay", "ann_ivf",
    "ann_ivf_trained", "ann_lsh", "ann_recall_eval",
    "ann_truncation_recall", "anomaly_stream_replay",
    "approx_distinct_users", "approx_topk_cms",
    "approx_value_quantiles", "asof_bucketed_stream_replay",
    "asof_purchase_click", "asof_stream_replay", "attribution_linear",
    "benford_order_totals", "bm25_search", "brand_pagerank",
    "brand_supplier_counts", "brand_triangles", "brand_triangles_deg",
    "classifier_auc", "classifier_calibration", "cohort_ltv",
    "cohort_retention", "corpus_build", "corpus_funnel",
    "corpus_stream_replay", "cross_source_dup",
    "customer_order_distribution", "customer_rfm", "customer_set_ops",
    "customer_spend_quartiles", "customers_without_orders",
    "dataset_split", "decontaminate", "decontaminate_bloom",
    "decontaminate_winnow", "dedup_clusters", "dedup_containment",
    "dedup_exact", "dedup_family_histogram", "dedup_fuzzy",
    "dedup_keep_list", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_segments", "dedup_segments_cdc", "dedup_simhash",
    "dedup_stream_replay", "dedup_substring_spans",
    "disjunctive_revenue", "distinct_suppliers",
    "distinct_users_by_type", "doc_chunks", "dominant_part_suppliers",
    "dq_expectations", "drawdown_stream_replay", "dsir_importance",
    "dsir_quantile_select", "dsir_resample", "dsir_stream_replay",
    "ema_ooo_stream_replay", "ema_stream_replay",
    "embedding_covariance", "embedding_norm_outliers",
    "embedding_pca_top", "embedding_quantize", "embedding_srp_sketch",
    "embedding_stats", "event_ab_test", "event_anomalies",
    "event_cuped", "event_decay_score", "event_gap_stats",
    "event_hour_profile", "event_mad_outliers", "event_transitions",
    "event_winsorize", "events_json_props", "events_k_anonymity",
    "feature_woe_iv", "forecast_revenue", "funnel_conversion",
    "funnel_ooo_stream_replay", "funnel_stream_replay",
    "funnel_time_to_convert", "fx_align_series", "fx_amihud", "fx_atr",
    "fx_autocorr", "fx_backtest_donchian", "fx_bollinger",
    "fx_candle_patterns", "fx_candles_bidask", "fx_candles_complete",
    "fx_candles_interpolated", "fx_candles_ohlc", "fx_candles_rollup",
    "fx_candles_stream_replay", "fx_cointegration", "fx_corr_headline",
    "fx_corr_stream_replay", "fx_corr_threshold", "fx_corr_underlying",
    "fx_corr_user_buckets", "fx_corr_wide", "fx_cross_rate",
    "fx_cross_zscore", "fx_cusum", "fx_dollar_bars", "fx_donchian",
    "fx_drawdown", "fx_ema_returns", "fx_ewma_cov", "fx_gapfill_rows",
    "fx_garch_vol", "fx_half_life", "fx_holt_trend",
    "fx_hourly_seasonality", "fx_hurst", "fx_imbalance_bars",
    "fx_index_beta", "fx_kalman_level", "fx_kyle_lambda", "fx_lead_lag",
    "fx_log_returns", "fx_macd", "fx_mean_correlation",
    "fx_momentum_ls", "fx_obv", "fx_ohlc_vol_estimators",
    "fx_pair_beta", "fx_pair_correlation", "fx_pair_correlation_auto",
    "fx_pair_spearman", "fx_parkinson_vol", "fx_realized_vol",
    "fx_roll_spread", "fx_rsi", "fx_sliding_returns", "fx_spread_stats",
    "fx_stochastic", "fx_tick_bars", "fx_tick_rule", "fx_tsrv",
    "fx_twap", "fx_var_es", "fx_variance_ratio", "fx_vol_regimes",
    "fx_volume_curve", "fx_volume_profile", "fx_vpin", "fx_vwap",
    "fx_workpacket_stats", "garch_stream_replay", "gopher_rules",
    "gridq_stream_replay", "hard_negatives", "hll_pair_intersection",
    "hll_stream_replay", "hll_user_rollup", "holt_ooo_stream_replay",
    "holt_stream_replay", "imbalance_bars_stream_replay",
    "imbalance_ooo_stream_replay", "jaccard_prefix_join",
    "kalman_stream_replay", "knn_bruteforce",
    "label_centroid_distances", "langid_confusion",
    "large_volume_customers", "late_data_state_stream_replay",
    "late_data_stream_replay", "leakage_safe_split",
    "lineitem_grouping_sets", "macd_stream_replay",
    "market_basket_pairs", "media_cross_format_dedup",
    "media_decode_features", "media_jpeg_decode", "media_jpeg_header",
    "media_metadata", "media_png_decode", "media_resize",
    "media_video_frames", "media_wav_features", "media_wav_resample",
    "media_wav_spectrum", "merge_corrections", "min_cost_supplier",
    "mixture_sample", "mixture_token_budget", "monthly_order_stats",
    "monthly_revenue_complete", "moving_avg_range", "moving_median",
    "nation_customer_list", "nation_market_share", "nation_outer_join",
    "nation_profit", "neardup_cosine", "neardup_cosine_auto",
    "neardup_stream_replay", "neardup_threshold_sweep",
    "order_priority_check", "order_ranks", "order_ship_latency",
    "orders_flag_filter", "orders_with_expensive_items",
    "packing_efficiency", "part_abc_classification",
    "part_scalar_functions", "part_supplier_hhi", "pii_scan",
    "price_quantiles", "pricing_summary", "priority_pivot",
    "priority_rollup", "profile_lineitem", "promo_revenue",
    "psi_stream_replay", "quality_classifier",
    "range_join_event_candle", "recovery_stream_replay",
    "region_nation_share", "reorder_recovery_stream_replay",
    "returned_item_report", "revenue_by_nation", "revenue_gini",
    "revenue_pareto", "rich_idle_customers", "rolling_distinct_users",
    "salted_event_stats", "scd2_history", "scd2_stream_replay",
    "scd2_user_status", "seasonal_profile", "semantic_dedup",
    "semantic_dedup_ann", "semantic_dedup_exact",
    "semantic_dedup_fixedk", "sequence_packing", "sequence_packing_bpe",
    "sessions_stream_replay", "ship_lag_quantiles", "shipping_priority",
    "small_quantity_revenue", "snapshot_diff", "source_keyness",
    "source_lang_kl", "source_ngram_overlap", "source_token_stats",
    "status_cube", "stratified_sample", "stream_join_replay",
    "supplier_share", "text_bigram_lm", "text_bpe_tokens",
    "text_bpe_tokens_dict", "text_burstiness", "text_collocations",
    "text_entropy", "text_fingerprint", "text_langid", "text_novelty",
    "text_quality", "text_readability", "text_repetition",
    "text_tokens", "text_winnowing", "tfidf_neardup", "tfidf_top_terms",
    "tick_bars_stream_replay", "tokenizer_fertility", "top_customers",
    "top_revenue_supplier", "topk_stream_replay", "tpch_q21",
    "user_behavior_entropy", "user_event_entropy", "user_sessions",
    "user_survival_km", "value_ks_test", "value_psi", "value_trend_ols",
    "value_trend_theilsen", "vocab_zipf", "vocabulary_topk",
    "vol_stream_replay", "volume_shipping", "vwap_ooo_stream_replay",
    "vwap_stream_replay", "waiting_suppliers", "walk_forward_forecast",
    "weekly_new_returning", "weighted_median_price", "window_sampler",
})


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        assert not overlap, f"duplicate query names: {overlap}"
        out.update(m.QUERIES)
    ungated = {k: v for k, v in out.items() if k not in _DRIVER_GATED}
    gated = {k: v for k, v in out.items() if k in _DRIVER_GATED}
    return {**ungated, **gated}


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
