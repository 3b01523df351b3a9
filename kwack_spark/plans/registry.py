"""Query registry: one entry per operator from SURVEY.md §2.

Each entry pairs
  - a Spark implementation ``fn(spark, sf_dir) -> DataFrame`` (DataFrame API /
    spark.sql — declarative, Catalyst-optimized), and
  - an equivalent ANSI-SQL oracle string executable by DuckDB over the same
    parquet tables (None for non-SQL-expressible ops -> driver does a weaker
    rows-only check).

Column names are aliased identically on both sides (the driver sorts columns
by name before value-hashing).

Float determinism: ``sum(double)`` is order-dependent, so Spark (parallel
partial aggregation) and DuckDB (its own order) would differ in low bits and
fail a hash compare.  Every aggregated double therefore goes through exact
DECIMAL arithmetic and is cast to double at the end — identical bits on both
engines regardless of execution order.  See plans/relational.py helpers.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Entry:
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = ()


QUERIES: dict[str, Entry] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query implementation with its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Entry(fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


# Grading priority: the driver checks a bounded ~50-query prefix of the
# corpus per round, so the map is ordered longest-ungraded-first (every name
# below already passes the local oracle harness in tests/test_oracle.py, and
# the scale-sensitive subset additionally passes at sf0.1 via
# tests/test_scale_oracle.py).  Cumulatively all 370 pre-r12 names have been
# driver-graded at least once (r01-r11) with every latest grade green.  The
# FULL list below is re-sorted for round 12, derived mechanically from
# CORRECTNESS_r01..r11: never-graded first (the 5 r12-new queries: BFF
# Bloom-paragraph dedup + rolling twin, soft-dedup weights, the quality
# threshold sweep, cluster-balanced sampling), then cohorts by last-graded
# round ascending — so the ~50-query
# r12 window covers the 5 new + the full 27-name r04-stale cohort + the
# r05-cohort head (the r11 VERDICT's next #3 rotation), and the
# tail keeps future rotations one re-sort away.  The list is advisory
# ordering only — every query stays registered; names missing from it would
# keep registration order after it.
_PRIORITY = [
    # --- never driver-graded (r12-new; must land in the window) ---
    "dedup_bloom_paragraphs",
    "dedup_bloom_paragraphs_rolling",
    "dedup_soft_weights",
    "quality_threshold_sweep",
    "cluster_balanced_sample",
    # --- last driver grade: r04 ---
    "cooccurrence_window_counts",
    "kafka_avro_fastpath",
    "kafka_avro_key_roundtrip",
    "kafka_jsonschema_fastpath",
    "kafka_jsonschema_union_roundtrip",
    "kafka_poison_quarantine",
    "multimodal_byte_features",
    "quality_bucket_sample",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q12_priority_shipping",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q16_part_supplier_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_discounted_revenue",
    "tpch_q20_part_promotion",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_global_sales_opportunity",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_priority_count",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    # --- last driver grade: r05 ---
    "agg_mode_manual",
    "ann_lsh_adaptive",
    "ann_lsh_multitable",
    "asof_nearest_click",
    "audio_silence_trim",
    "bloom_decontaminate",
    "bm25_topk_search",
    "bpe_merge_candidates",
    "cdc_chunk_dedup",
    "cms_heavy_hitters",
    "daily_anomaly_zscore",
    "dedup_cluster_size_histogram",
    "dedup_keep_best_in_cluster",
    "dedup_simhash_hamming",
    "embedding_dim_stats",
    "embedding_drift_by_label",
    "event_transition_matrix",
    "hll_audience_overlap",
    "hll_distinct_users",
    "hll_merge_shards",
    "inverted_index_incremental",
    "join_positional",
    "k_anonymity_suppress",
    "langid_confusion_matrix",
    "length_bucketed_batches",
    "multimodal_jpeg_decode",
    "order_by_all",
    "quality_ensemble_gate",
    "quality_linear_score",
    "sax_weekly_symbols",
    "semdedup_cluster_prune",
    "shard_compaction_plan",
    "shard_manifest_hashes",
    "sink_compaction_roundtrip",
    "source_lang_gini",
    "streaming_cms_counts",
    "streaming_exactly_once_sink",
    "streaming_hll_distinct",
    "streaming_quality_gate",
    "streaming_running_moments",
    "temperature_mixture_sample",
    "text_token_stats",
    "textrank_keywords",
    "tokenizer_vocab_coverage",
    "user_path_trigrams",
    "winnowing_common_spans",
    "winnowing_fingerprints",
    "winnowing_incremental_new_docs",
    # --- last driver grade: r06 ---
    "ann_reciprocal_rate",
    "bitext_margin_mining",
    "bpe_train_two_steps",
    "cooccurrence_pmi_topk",
    "dedup_incremental_simhash",
    "dedup_lexical_semantic_agreement",
    "dedup_longest_common_span",
    "dedup_shingle_size_sensitivity",
    "dedup_url_canonical",
    "dup_graph_triangles",
    "dup_quality_contrast",
    "embedding_cluster_purity",
    "embedding_covariance_topk",
    "embedding_dedup_threshold_sweep",
    "embedding_kmeans_refine",
    "embedding_norm_extremes",
    "embedding_outlier_mahalanobis",
    "embedding_pc_residual_topk",
    "embedding_top_pc",
    "event_hour_dow_heatmap",
    "event_robust_outliers",
    "events_periodicity_autocorr",
    "graph_k_core",
    "histogram_quantile_estimate",
    "interval_overlap_join",
    "inverted_index_build",
    "jl_projection_recall",
    "jl_recall_vs_dim_curve",
    "market_basket_lift",
    "markov_stationary_power",
    "multimodal_audio_rms_windows",
    "orders_pareto_share",
    "pagerank_dup_graph",
    "prefix_duplicate_groups",
    "rfm_segmentation",
    "session_duration_survival",
    "source_dedup_rate",
    "streaming_click_purchase_join",
    "streaming_latest_per_key",
    "streaming_url_dedup",
    "term_entropy_by_source",
    "text_burstiness",
    "tfidf_cosine_topk",
    "vocab_coverage_curve",
    "zipf_fit_slope",
    # --- last driver grade: r07 ---
    "ann_brute_force_topk",
    "benford_first_digit",
    "cohort_revenue_matrix",
    "conversion_lag_distribution",
    "corpus_data_card",
    "customer_balance_revenue_corr",
    "dau_mau_stickiness",
    "dedup_cross_source_leakage",
    "dedup_exact",
    "dedup_impact_report",
    "dedup_incremental_simhash64",
    "dedup_method_agreement",
    "dedup_minhash_lsh",
    "dedup_minhash_signatures",
    "dedup_pair_jaccard_histogram",
    "dedup_simhash_hamming_d6",
    "doc_length_lognormal_fit",
    "embedding_intrinsic_dimension",
    "embedding_knn_label_probe",
    "embedding_mass_length_corr",
    "embedding_quant_bits_sweep",
    "embedding_temporal_drift",
    "error_purchase_cooccurrence",
    "events_change_point",
    "events_tukey_fences",
    "events_user_entropy",
    "grouped_quantile_estimate",
    "hapax_ratio_by_source",
    "heaps_law_fit",
    "join_key_skew_profile",
    "minhash_band_calibration",
    "minhash_estimate_error",
    "nation_revenue_hhi",
    "ngram_novelty_curve",
    "order_to_ship_leadtime",
    "orders_priority_mix_shift",
    "orders_seasonal_ma_decompose",
    "part_size_price_regression",
    "retention_halflife_fit",
    "scd2_user_state_intervals",
    "sessions_per_user_distribution",
    "simhash_slice_occupancy",
    "source_vocab_overlap",
    "streaming_change_point",
    "streaming_simhash_neardup",
    "token_oov_rate_by_source",
    "tokenizer_fertility_by_lang",
    "user_interevent_gap_histogram",
    "weekly_value_wow_growth",
    "word_length_distribution",
    # --- last driver grade: r08 ---
    "agg_filter_where",
    "agg_having",
    "agg_minmax_by",
    "agg_stats_manual",
    "ann_ivf_adaptive_recall",
    "ann_ivf_recall",
    "ann_ivf_topk",
    "ann_probe_recall_curve",
    "corpus_curation_e2e",
    "count_distinct",
    "cube_orders",
    "date_funcs",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_suffix_exact_spans",
    "distinct_on_latest",
    "distinct_rows",
    "explode_word_counts",
    "filter_predicates",
    "join_anti",
    "join_cross",
    "join_full_outer",
    "join_inner",
    "join_left",
    "join_semi",
    "join_theta",
    "kafka_avro_evolution",
    "kafka_avro_roundtrip",
    "kafka_json_schema_roundtrip",
    "kafka_primitive_roundtrip",
    "kafka_proto_roundtrip",
    "kafka_rawjson_roundtrip",
    "kafka_two_topic_join",
    "math_funcs",
    "multimodal_phash_dedup",
    "projection_compute",
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_region_revenue",
    "rollup_orders",
    "scan_region",
    "set_except",
    "set_ops",
    "set_union_all",
    "sort_limit_offset",
    "string_funcs",
    "struct_funcs",
    "window_frame_moving",
    "window_offset",
    "window_ranking",
    # --- last driver grade: r09 ---
    "ann_index_persist_roundtrip",
    "ann_ivf_pq_topk",
    "ann_lsh_bucketed",
    "ann_pq_topk",
    "approx_count_distinct",
    "array_funcs",
    "bpe_apply_merges",
    "bpe_merge_training_5steps",
    "cms_merge_shards",
    "collect_list_sorted",
    "corpus_curation_multimodal",
    "correlated_in_subquery",
    "cte_scalar_subquery",
    "decontaminate_semantic",
    "dedup_containment",
    "dedup_incremental_lsh",
    "dedup_lsh_edit_verify",
    "dedup_lsh_recall",
    "embedding_matryoshka_recall",
    "funnel_three_step",
    "gopher_quality_rules",
    "grouping_sets",
    "higher_order_funcs",
    "json_funcs",
    "length_trim_sketch_gated",
    "map_funcs",
    "mmr_diverse_topk",
    "multimodal_audio_fingerprint_dedup",
    "multimodal_audio_incremental",
    "multimodal_video_keyframe_dedup",
    "passage_dedup_rewrite",
    "profile_table_stats",
    "quality_perceptron_step",
    "retention_cohorts",
    "scale_bucketed_join",
    "scale_heavy_hitters",
    "scale_salted_join",
    "shard_assignment_stats",
    "sketch_quantile_lengths",
    "split_leakage_safe",
    "star_dialect_columns_regex",
    "star_dialect_exclude_replace",
    "streaming_audio_neardup",
    "streaming_lsh_neardup",
    "streaming_quantile_sketch",
    "streaming_static_enrich",
    "streaming_video_neardup",
    "text_kneser_ney_bigram",
    "udx_chunk_vowels",
    "zorder_layout_key",
    # --- last driver grade: r10 ---
    "agg_bool_bit",
    "bitwise_funcs",
    "conditional_funcs",
    "corpus_curation_all_modalities",
    "corpus_curation_incremental",
    "ddl_create_view",
    "dedup_cluster_components",
    "group_by_all",
    "grouping_id_rollup",
    "histogram_event_values",
    "join_natural",
    "join_right",
    "kafka_jsonschema_evolution",
    "kafka_poison_skip",
    "kafka_proto_evolution",
    "kafka_rowinfo_metadata",
    "kafka_tombstone_skip",
    "knn_mutual_components",
    "lateral_top_orders",
    "length_percentile_trim",
    "listagg_ordered",
    "median_quantiles",
    "mixture_reweight_step",
    "multimodal_image_incremental",
    "multimodal_video_dhash_dedup",
    "multimodal_video_incremental",
    "ntile_window_stats",
    "pivot_order_status",
    "qualify_top_per_group",
    "recursive_cte",
    "regexp_funcs",
    "semantic_dedup_verify",
    "sequence_date_spine",
    "set_except_all",
    "set_intersect_all",
    "stat_corr_regression",
    "streaming_image_neardup",
    "streaming_kafka_avro_decode",
    "streaming_session_counts",
    "streaming_state_observability",
    "streaming_video_dhash_neardup",
    "text_bigram_logprob",
    "tfidf_top_terms",
    "try_cast_safe",
    "unpivot_lineitem_measures",
    "values_inline_join",
    "variant_json_funcs",
    "video_keyframe_occupancy",
    "window_nth_value",
    "window_range_interval",
    # --- last driver grade: r11 ---
    "ann_brute_force_distributed",
    "ann_pq_distributed",
    "ann_pq_recall",
    "asof_forward_next_purchase",
    "asof_purchase_attribution",
    "ccnet_perplexity_buckets",
    "chunk_documents",
    "corpus_curation_incremental_multimodal",
    "cross_doc_repeated_ngrams",
    "curation_pipeline",
    "decontaminate_ngram_overlap",
    "dedup_embedding_cosine",
    "dedup_incremental_new_docs",
    "dedup_lsh_overcap_clusters",
    "doc_fingerprints",
    "dsir_importance_select",
    "embedding_centroid_by_label",
    "embedding_quantize_int8",
    "hard_negative_mining",
    "kafka_proto_msgindex",
    "lsh_band_occupancy",
    "mixture_rebalance",
    "multimodal_avi_incremental",
    "multimodal_avi_keyframe_dedup",
    "multimodal_binary_meta",
    "multimodal_fake_decode",
    "multimodal_frame_sample",
    "multimodal_png_decode",
    "multimodal_resize",
    "multimodal_wav_decode",
    "range_join_clicks_before_purchase",
    "sample_hash_10pct",
    "sample_stratified_by_lang",
    "session_windows",
    "sink_manifest_snapshot_read",
    "source_cap_sample",
    "split_train_val_test",
    "streaming_dedup_keys",
    "streaming_state_observability_sketches",
    "streaming_stateful_running_counts",
    "streaming_window_counts",
    "text_lang_id",
    "text_pii_redact",
    "text_quality",
    "text_repetition_filter",
    "text_token_count_bpe",
    "text_token_rarity",
    "token_budget_pack",
    "training_order_shuffle",
    "window_tumbling_hourly",
]

def _ordered() -> dict[str, Entry]:
    _load_all()
    out: dict[str, Entry] = {}
    for name in _PRIORITY:
        if name in QUERIES:
            out[name] = QUERIES[name]
    for name, e in QUERIES.items():
        if name not in out:
            out[name] = e
    return out


def query_map() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in _ordered().items()}


def oracle_map() -> dict[str, str]:
    return {name: e.oracle for name, e in _ordered().items() if e.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # imports are side-effecting: each module registers its queries
    import kwack_spark.plans.relational  # noqa: F401
    import kwack_spark.plans.functions_corpus  # noqa: F401
    import kwack_spark.plans.pipeline  # noqa: F401
    import kwack_spark.plans.ingest_corpus  # noqa: F401
    import kwack_spark.plans.tpch  # noqa: F401
    import kwack_spark.plans.sketches_corpus  # noqa: F401

    _LOADED = True
