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
# tests/test_scale_oracle.py).  After r07 ALL 328 then-registered names had
# been driver-graded at least once with every latest grade green.  Round 8's
# rotation (r07 VERDICT ask #1): the r08-new queries first (never graded),
# then the queries whose implementation changed this round (IVF family —
# adaptive n_lists + the fused probe-curve pass), then the 35 names last
# graded in r01, then the 50 names last graded in r02 — so the ~50-query
# window re-grades the stalest evidence, and the tail continues
# last-graded-round ascending for the r09+ rotations.  The list is advisory
# ordering only — every query stays registered; names missing from it would
# keep registration order after it.
_PRIORITY = [
    # --- r08-new queries (never graded; must land in the window) ---
    "dedup_suffix_exact_spans",
    "multimodal_phash_dedup",
    "corpus_curation_e2e",
    "ann_ivf_adaptive_recall",
    # --- implementations changed this round (IVF probe-curve fusion;
    # adaptive-n_lists plumbing in ivf_assign) — re-grade with the change ---
    "ann_probe_recall_curve",
    "ann_ivf_recall",
    "ann_ivf_topk",
    # --- last driver grade: r01 ---
    "scan_region",
    "projection_compute",
    "filter_predicates",
    "agg_having",
    "agg_filter_where",
    "agg_minmax_by",
    "agg_stats_manual",
    "count_distinct",
    "rollup_orders",
    "cube_orders",
    "join_inner",
    "join_left",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_cross",
    "join_theta",
    "q3_top_revenue",
    "q5_region_revenue",
    "window_ranking",
    "window_offset",
    "window_frame_moving",
    "distinct_on_latest",
    "sort_limit_offset",
    "set_ops",
    "set_except",
    "set_union_all",
    "distinct_rows",
    "string_funcs",
    "date_funcs",
    "math_funcs",
    "struct_funcs",
    "explode_word_counts",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    # --- last driver grade: r02 ---
    "q1_pricing_summary",
    "kafka_avro_roundtrip",
    "kafka_json_schema_roundtrip",
    "kafka_proto_roundtrip",
    "kafka_rawjson_roundtrip",
    "kafka_primitive_roundtrip",
    "kafka_avro_evolution",
    "kafka_two_topic_join",
    "kafka_rowinfo_metadata",
    "kafka_tombstone_skip",
    "grouping_sets",
    "cte_scalar_subquery",
    "correlated_in_subquery",
    "json_funcs",
    "collect_list_sorted",
    "array_funcs",
    "higher_order_funcs",
    "map_funcs",
    "approx_count_distinct",
    "ann_lsh_bucketed",
    "kafka_proto_evolution",
    "kafka_jsonschema_evolution",
    "kafka_poison_skip",
    "streaming_lsh_neardup",
    "streaming_static_enrich",
    "udx_chunk_vowels",
    "scale_salted_join",
    "scale_bucketed_join",
    "scale_heavy_hitters",
    "gopher_quality_rules",
    "dedup_lsh_recall",
    "star_dialect_exclude_replace",
    "star_dialect_columns_regex",
    "profile_table_stats",
    "zorder_layout_key",
    "funnel_three_step",
    "retention_cohorts",
    "ann_pq_topk",
    "ann_ivf_pq_topk",
    "passage_dedup_rewrite",
    "dedup_incremental_lsh",
    "dedup_lsh_edit_verify",
    "shard_assignment_stats",
    "semantic_dedup_verify",
    "streaming_session_counts",
    "streaming_kafka_avro_decode",
    "text_bigram_logprob",
    "dedup_containment",
    "tfidf_top_terms",
    "length_percentile_trim",
    # --- last driver grade: r03 ---
    "kafka_proto_msgindex",
    "ann_pq_recall",
    "asof_purchase_attribution",
    "asof_forward_next_purchase",
    "range_join_clicks_before_purchase",
    "recursive_cte",
    "pivot_order_status",
    "unpivot_lineitem_measures",
    "lateral_top_orders",
    "values_inline_join",
    "ddl_create_view",
    "sequence_date_spine",
    "window_range_interval",
    "ntile_window_stats",
    "window_nth_value",
    "join_right",
    "join_natural",
    "set_except_all",
    "set_intersect_all",
    "stat_corr_regression",
    "median_quantiles",
    "histogram_event_values",
    "group_by_all",
    "listagg_ordered",
    "agg_bool_bit",
    "try_cast_safe",
    "qualify_top_per_group",
    "grouping_id_rollup",
    "variant_json_funcs",
    "conditional_funcs",
    "bitwise_funcs",
    "regexp_funcs",
    "dedup_cluster_components",
    "dedup_embedding_cosine",
    "dedup_incremental_new_docs",
    "decontaminate_ngram_overlap",
    "cross_doc_repeated_ngrams",
    "doc_fingerprints",
    "sample_hash_10pct",
    "sample_stratified_by_lang",
    "split_train_val_test",
    "source_cap_sample",
    "curation_pipeline",
    "chunk_documents",
    "token_budget_pack",
    "mixture_rebalance",
    "embedding_centroid_by_label",
    "embedding_quantize_int8",
    # --- last driver grade: r04 ---
    "kafka_jsonschema_fastpath",
    "kafka_jsonschema_union_roundtrip",
    "kafka_poison_quarantine",
    "multimodal_png_decode",
    "ann_pq_distributed",
    "ann_brute_force_distributed",
    "sink_manifest_snapshot_read",
    "tpch_q2_min_cost_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q4_priority_count",
    "tpch_q11_important_parts",
    "tpch_q12_priority_shipping",
    "tpch_q20_part_promotion",
    "tpch_q21_waiting_suppliers",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q16_part_supplier_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_discounted_revenue",
    "tpch_q22_global_sales_opportunity",
    "text_token_rarity",
    "text_token_count_bpe",
    "text_quality",
    "text_lang_id",
    "text_pii_redact",
    "text_repetition_filter",
    "window_tumbling_hourly",
    "session_windows",
    "multimodal_binary_meta",
    "multimodal_fake_decode",
    "multimodal_frame_sample",
    "multimodal_resize",
    "multimodal_byte_features",
    "multimodal_wav_decode",
    "streaming_window_counts",
    "streaming_stateful_running_counts",
    "streaming_dedup_keys",
    "kafka_avro_fastpath",
    "kafka_avro_key_roundtrip",
    "quality_bucket_sample",
    "cooccurrence_window_counts",
    "hard_negative_mining",
    "training_order_shuffle",
    # --- last driver grade: r05 ---
    "user_path_trigrams",
    "event_transition_matrix",
    "length_bucketed_batches",
    "daily_anomaly_zscore",
    "sax_weekly_symbols",
    "hll_audience_overlap",
    "streaming_running_moments",
    "bm25_topk_search",
    "dedup_keep_best_in_cluster",
    "textrank_keywords",
    "k_anonymity_suppress",
    "bpe_merge_candidates",
    "join_positional",
    "order_by_all",
    "shard_manifest_hashes",
    "agg_mode_manual",
    "inverted_index_incremental",
    "shard_compaction_plan",
    "embedding_drift_by_label",
    "langid_confusion_matrix",
    "ann_lsh_adaptive",
    "streaming_exactly_once_sink",
    "sink_compaction_roundtrip",
    "ann_lsh_multitable",
    "hll_distinct_users",
    "hll_merge_shards",
    "bloom_decontaminate",
    "quality_linear_score",
    "cdc_chunk_dedup",
    "streaming_hll_distinct",
    "dedup_simhash_hamming",
    "streaming_cms_counts",
    "semdedup_cluster_prune",
    "cms_heavy_hitters",
    "temperature_mixture_sample",
    "text_token_stats",
    "multimodal_jpeg_decode",
    "winnowing_fingerprints",
    "winnowing_common_spans",
    "quality_ensemble_gate",
    "audio_silence_trim",
    "embedding_dim_stats",
    "source_lang_gini",
    "dedup_cluster_size_histogram",
    "tokenizer_vocab_coverage",
    "winnowing_incremental_new_docs",
    "streaming_quality_gate",
    "asof_nearest_click",
    # --- last driver grade: r06 ---
    "prefix_duplicate_groups",
    "inverted_index_build",
    "vocab_coverage_curve",
    "embedding_norm_extremes",
    "dedup_longest_common_span",
    "dedup_url_canonical",
    "embedding_covariance_topk",
    "embedding_top_pc",
    "streaming_url_dedup",
    "bpe_train_two_steps",
    "embedding_pc_residual_topk",
    "tfidf_cosine_topk",
    "event_robust_outliers",
    "bitext_margin_mining",
    "streaming_click_purchase_join",
    "pagerank_dup_graph",
    "dup_graph_triangles",
    "streaming_latest_per_key",
    "jl_projection_recall",
    "embedding_kmeans_refine",
    "histogram_quantile_estimate",
    "interval_overlap_join",
    "zipf_fit_slope",
    "dedup_lexical_semantic_agreement",
    "embedding_outlier_mahalanobis",
    "cooccurrence_pmi_topk",
    "market_basket_lift",
    "markov_stationary_power",
    "term_entropy_by_source",
    "text_burstiness",
    "rfm_segmentation",
    "jl_recall_vs_dim_curve",
    "session_duration_survival",
    "orders_pareto_share",
    "dedup_shingle_size_sensitivity",
    "graph_k_core",
    "dup_quality_contrast",
    "dedup_incremental_simhash",
    "ann_reciprocal_rate",
    "embedding_cluster_purity",
    "source_dedup_rate",
    "events_periodicity_autocorr",
    "multimodal_audio_rms_windows",
    "embedding_dedup_threshold_sweep",
    "event_hour_dow_heatmap",
    # --- last driver grade: r07 ---
    "minhash_band_calibration",
    "ngram_novelty_curve",
    "events_change_point",
    "streaming_change_point",
    "simhash_slice_occupancy",
    "dedup_incremental_simhash64",
    "streaming_simhash_neardup",
    "dedup_cross_source_leakage",
    "tokenizer_fertility_by_lang",
    "dedup_simhash_hamming_d6",
    "token_oov_rate_by_source",
    "scd2_user_state_intervals",
    "grouped_quantile_estimate",
    "cohort_revenue_matrix",
    "embedding_mass_length_corr",
    "events_user_entropy",
    "corpus_data_card",
    "dedup_pair_jaccard_histogram",
    "events_tukey_fences",
    "orders_priority_mix_shift",
    "user_interevent_gap_histogram",
    "embedding_quant_bits_sweep",
    "nation_revenue_hhi",
    "dedup_impact_report",
    "heaps_law_fit",
    "join_key_skew_profile",
    "minhash_estimate_error",
    "order_to_ship_leadtime",
    "embedding_temporal_drift",
    "dedup_method_agreement",
    "doc_length_lognormal_fit",
    "source_vocab_overlap",
    "orders_seasonal_ma_decompose",
    "customer_balance_revenue_corr",
    "dau_mau_stickiness",
    "benford_first_digit",
    "embedding_knn_label_probe",
    "word_length_distribution",
    "sessions_per_user_distribution",
    "conversion_lag_distribution",
    "retention_halflife_fit",
    "weekly_value_wow_growth",
    "hapax_ratio_by_source",
    "part_size_price_regression",
    "embedding_intrinsic_dimension",
    "error_purchase_cooccurrence",
    "ann_brute_force_topk",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh",
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
