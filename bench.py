"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Mirrors the reference's benchmark unit (BASELINE.md): full cycle = session
init + source registration + query execution.  Per-query timings use the noop
sink so results fully materialize without driver collect overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_region_revenue",
    "window_ranking",
    "agg_having",
    "join_left",
    "distinct_on_latest",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_brute_force_topk",
    "dedup_cluster_components",
    "decontaminate_ngram_overlap",
    "text_pii_redact",
    "text_quality",
    "chunk_documents",
    "token_budget_pack",
    "text_token_rarity",
    "asof_purchase_attribution",
    "range_join_clicks_before_purchase",
    "window_tumbling_hourly",
    "session_windows",
    "kafka_avro_roundtrip",
    "multimodal_frame_sample",
    "streaming_window_counts",
    # round-3 operators
    "tfidf_top_terms",
    "mixture_rebalance",
    "length_percentile_trim",
    "dedup_containment",
    "semantic_dedup_verify",
    # round-4 operators
    "ann_pq_topk",
    "ann_ivf_pq_topk",
    "dedup_incremental_lsh",
    "passage_dedup_rewrite",
    "shard_assignment_stats",
    "streaming_lsh_neardup",
    "gopher_quality_rules",
    "zorder_layout_key",
    "funnel_three_step",
    "retention_cohorts",
    # round-5 operators
    "semdedup_cluster_prune",
    "temperature_mixture_sample",
    "multimodal_wav_decode",
    "cms_heavy_hitters",
    # round-6 operators
    "tpch_q6_forecast_revenue",
    "tpch_q18_large_orders",
    # round-7: the suite-completing TPC-H shapes (correlated-min catalog,
    # scalar-subquery HAVING, and the exists/not-exists self-join pair)
    "tpch_q2_min_cost_supplier",
    "tpch_q21_waiting_suppliers",
    "bm25_topk_search",
    # round-8: contrastive prep, graph-text, and event-path operators
    "hard_negative_mining",
    "textrank_keywords",
    "cooccurrence_window_counts",
    "user_path_trigrams",
    "hll_distinct_users",
    "bloom_decontaminate",
    "quality_linear_score",
    "cdc_chunk_dedup",
    # round-9: the adaptive-width LSH (the production ANN near-dup path —
    # same pair set as ann_lsh_bucketed at sf0.1's width but occupancy-bound
    # buckets; see SCALING.md's measured exponents)
    "ann_lsh_adaptive",
    # round-10: the jar-free JVM from_json decode (vs kafka_avro_roundtrip
    # above, which is the same ingest shape on the Python decode stage —
    # the pair shows the JVM-vs-Python decode delta at sf0.1), and the
    # beyond-cap distributed PQ branch
    "kafka_jsonschema_fastpath",
    "ann_pq_distributed",
    "ann_brute_force_distributed",
    # round-11: the full baseline-JPEG pixel decode (Huffman entropy decode
    # + IDCT per 8x8 block — the heaviest per-byte multimodal kernel here),
    # the winnowing fingerprint pipeline (whole-stage-codegen array ops) and
    # its frequency-capped pair join, and the assembled quality gate
    "multimodal_jpeg_decode",
    "winnowing_fingerprints",
    "winnowing_common_spans",
    "quality_ensemble_gate",
    # round-12: exact-substring span extension (diagonal gaps-and-islands
    # over df-capped shingle matches), URL-canonical page dedup (pure
    # codegen regex/array key + one groupBy), and the bounded-window vocab
    # coverage curve (TakeOrderedAndProject(1024) + 1-row total agg)
    "dedup_longest_common_span",
    "dedup_url_canonical",
    "vocab_coverage_curve",
    # round-13: the exact-integer Gram covariance scan (map-side combine to
    # dim^2 rows) and the checkpointed power-iteration top PC over it
    "embedding_covariance_topk",
    "embedding_top_pc",
    # round-14: second-iteration BPE (vocab-sized merge apply + recount)
    "bpe_train_two_steps",
    # round-15: the sparse all-pairs similarity join (stop-term-capped
    # posting self-join), two exact PageRank iterations over the LSH dup
    # graph (persisted pair sketch + checkpointed rank), margin-based
    # bitext mining (broadcast target side), median/MAD robust outliers,
    # and the watermarked stream-stream interval join replay
    "tfidf_cosine_topk",
    "pagerank_dup_graph",
    "bitext_margin_mining",
    "event_robust_outliers",
    "streaming_click_purchase_join",
    "dup_graph_triangles",
    # round-16 (wave 4): one exact-decimal Lloyd iteration (broadcast k-row
    # centroids, k-bounded argmin, (cid,pos)-keyed update), single-pass
    # 256-bin quantile estimation vs the exact-sort baseline, the hour-bin
    # bucketed interval-overlap join, and the Zipf head fit
    "embedding_kmeans_refine",
    "histogram_quantile_estimate",
    "interval_overlap_join",
    "zipf_fit_slope",
    # round-17 (wave 5): LSH band-parameter sweep over one shared signature
    # table, and the first-occurrence novelty curve (shingle-keyed min-agg +
    # rejoin, decile via broadcast max — no window)
    "minhash_band_calibration",
    "ngram_novelty_curve",
    # round-18 (wave 6): IVF probe-budget sweep (one shared index, rank-
    # tagged candidates), lexical-vs-semantic dedup agreement census, and
    # the diagonal-Mahalanobis outlier scan
    "ann_probe_recall_curve",
    "dedup_lexical_semantic_agreement",
    "embedding_outlier_mahalanobis",
    # round-19 (wave 7): PMI collocations (in-array bigrams, vocab-keyed
    # joins), market-basket lift (basket-bounded self-join), the Markov
    # stationary distribution (4 metadata-sized power steps), and
    # per-source term entropy
    "cooccurrence_pmi_topk",
    "market_basket_lift",
    "markov_stationary_power",
    "term_entropy_by_source",
    # round-20 (wave 8): term burstiness (integer-exact VMR), RFM quartile
    # segmentation (percentile boundaries, no ntile window), and the JL
    # sketch-width recall curve (one projection, prefix-slice ranking)
    "text_burstiness",
    "rfm_segmentation",
    "jl_recall_vs_dim_curve",
    # round-21 (wave 9): integer-exact CUSUM change points, the session
    # survival grid, and top-decile revenue concentration
    "events_change_point",
    "session_duration_survival",
    "orders_pareto_share",
    # round-22 (wave 10): the shingle-width sweep (third dedup tuning
    # knob), the 2-core peel census (localCheckpoint per round), and the
    # near-dup vs quality cross-tab
    "dedup_shingle_size_sensitivity",
    "graph_k_core",
    "dup_quality_contrast",
    # round-23 (wave 11): the mutual-kNN hubness audit and the streaming
    # CUSUM monitor (day-map state; replay-order-proof).
    # dedup_incremental_simhash is correctness-graded but not benched: the
    # synthetic corpus's template vocabulary makes 32-bit simhashes
    # collide massively at sf0.1 (~130k verified pairs), so the query is
    # output-bound here, not plan-bound (same reason ann_ivf_topk sits out)
    "ann_reciprocal_rate",
    "streaming_change_point",
    # round-24 (wave 12): IVF cluster label purity, per-source dup rate,
    # and weekly-seasonality autocorrelation (scaled-integer moments)
    "embedding_cluster_purity",
    "source_dedup_rate",
    "events_periodicity_autocorr",
    # round-25 (wave 13): windowed audio energy through the real PCM16
    # chunk-walk, the semantic-dedup threshold sweep (one blocked pair
    # table, conditional counts), the weekly heatmap, and per-source OOV
    "multimodal_audio_rms_windows",
    "embedding_dedup_threshold_sweep",
    "event_hour_dow_heatmap",
    "token_oov_rate_by_source",
    # round-26 (wave 14): SCD-2 interval build (user-keyed change
    # compression), per-group histogram quantiles, and the cohort LTV
    # matrix (integer month arithmetic)
    "scd2_user_state_intervals",
    "grouped_quantile_estimate",
    "cohort_revenue_matrix",
    # round-27 (wave 15): cross-modal mass-vs-length Pearson, per-user
    # behavioral entropy, and the one-row corpus data card
    "embedding_mass_length_corr",
    "events_user_entropy",
    "corpus_data_card",
    # round-28 (wave 16): the candidate-pair Jaccard spectrum and the
    # Tukey boxplot-rule outlier census
    "dedup_pair_jaccard_histogram",
    "events_tukey_fences",
    # round-29 (wave 17): monthly priority-mix L1 drift and the
    # inter-event gap census (sessionization/watermark sizing table)
    "orders_priority_mix_shift",
    "user_interevent_gap_histogram",
    # round-30 (wave 18): quantization bit-width error curve and the
    # per-nation supplier-revenue HHI concentration audit
    "embedding_quant_bits_sweep",
    "nation_revenue_hhi",
    # round-31 (wave 19): the one-row dedup impact report (composes the
    # component walk with exact corpus volumes)
    "dedup_impact_report",
    # round-32 (wave 20): Heaps-law vocabulary-growth fit (Zipf's
    # companion; first-occurrence deciles + log-log OLS)
    "heaps_law_fit",
    # round-33 (wave 21): the join-key skew diagnostic (diagnosis for
    # scale_salted_join's treatment) and the MinHash estimator-error audit
    "join_key_skew_profile",
    "minhash_estimate_error",
    # round-34 (wave 22): monthly order-to-ship lead time (fact-fact join
    # on the order key) and the temporal centroid-drift trigger
    "order_to_ship_leadtime",
    "embedding_temporal_drift",
    # round-35 (wave 23): MinHash-vs-SimHash pair agreement census and the
    # lognormal doc-length fit
    "dedup_method_agreement",
    "doc_length_lognormal_fit",
    # round-36 (wave 24): pairwise source vocabulary Jaccard (mixture
    # redundancy at the vocab level)
    "source_vocab_overlap",
    # round-37 (wave 25): monthly trend/residual decomposition (bounded
    # month window) and the balance-vs-revenue Pearson probe
    "orders_seasonal_ma_decompose",
    "customer_balance_revenue_corr",
    # round-38 (wave 26): DAU/MAU stickiness and the Benford first-digit
    # audit (expected frequencies injected as shared literals)
    "dau_mau_stickiness",
    "benford_first_digit",
    # round-39 (wave 27): the 1-NN label probe (embedding-quality eval)
    "embedding_knn_label_probe",
    # round-40 (wave 28): token length spectrum and the engagement-depth
    # (sessions-per-user) histogram
    "word_length_distribution",
    "sessions_per_user_distribution",
    # round-41 (wave 29): click-to-purchase lag spectrum (attribution
    # window sizing) and the retention half-life fit
    "conversion_lag_distribution",
    "retention_halflife_fit",
    # round-42 (wave 30): week-over-week value growth and per-source
    # hapax-legomena share
    "weekly_value_wow_growth",
    "hapax_ratio_by_source",
    # round-43 (wave 31): the price-vs-size OLS probe
    "part_size_price_regression",
    # round-44 (wave 32): the two-NN intrinsic-dimension estimate and the
    # error-purchase co-occurrence lift
    "embedding_intrinsic_dimension",
    "error_purchase_cooccurrence",
    # round-45 (r07): the 64-bit/16-bit-slice SimHash family — pairs query
    # moved off the 8-bit-slice degenerate blocking (112 s -> ~3 s at
    # sf0.1) plus its bucket-occupancy audit
    "dedup_simhash_hamming",
    "simhash_slice_occupancy",
    # the 64-bit persisted-index incremental probe (unlike the 32-bit
    # dedup_incremental_simhash above it, 16-bit slices keep the collision
    # set plan-bound at sf0.1, so the timing measures the probe, not output)
    "dedup_incremental_simhash64",
    # and the family's streaming member: micro-batch replay through the
    # (blk, slc)-bucketed state index
    "streaming_simhash_neardup",
    # round-46 (wave 33): cross-source leakage census riding the LSH pair
    # set, and the per-language tokenizer fertility table (linear control)
    "dedup_cross_source_leakage",
    "tokenizer_fertility_by_lang",
    # round-47: block-combo blocking at Hamming budget 6 (28 slice-pair
    # tables, 16-bit keys — the documented escape hatch, now measured)
    "dedup_simhash_hamming_d6",
    # round-48 (r08): exact-substring span dedup (anchor-hash groupBy +
    # candidate verify + islands merge), perceptual image dedup (real PNG
    # decode -> dHash -> 16-bit-slice Hamming blocking), the six-stage
    # curation composition, and the adaptive-n_lists IVF audit.
    # (ann_probe_recall_curve is already benched above; r08 rebuilt it on a
    # BLAS bucket shortlist + cumulative-rank fusion, 17.1 s -> ~8.6 s.)
    "dedup_suffix_exact_spans",
    "multimodal_phash_dedup",
    "corpus_curation_e2e",
    "ann_ivf_adaptive_recall",
    # round-49 (r09): mergeable KLL quantile sketch (merge-invariance gate
    # in-query), 5-step applied BPE training loop (one corpus scan +
    # vocabulary-sized iterations), text+image curation composition (image
    # leg fingerprints only the text-funnel survivors).
    "sketch_quantile_lengths",
    "bpe_merge_training_5steps",
    "corpus_curation_multimodal",
    # round-9 wave 2
    "multimodal_audio_fingerprint_dedup",
    "text_kneser_ney_bigram",
    "mmr_diverse_topk",
    "streaming_quantile_sketch",
    "multimodal_audio_incremental",
    "decontaminate_semantic",
    "embedding_matryoshka_recall",
    "bpe_apply_merges",
    "length_trim_sketch_gated",
    "streaming_audio_neardup",
    "quality_perceptron_step",
    "split_leakage_safe",
    "cms_merge_shards",
    "multimodal_video_keyframe_dedup",
    "streaming_video_neardup",
    # round-10 (r10): the frame-hash bucket-occupancy audit (the video
    # sibling of simhash_slice_occupancy — watches the keyframe join's
    # df-cap), sharing the one frame_md5 shuffle with the pair join above,
    # and the real-codec video leg (MJPEG marker-walk split -> full
    # baseline-JPEG keyframe decode -> dHash -> Hamming blocking) — the
    # heaviest per-byte multimodal kernel in the suite (~1M Huffman+IDCT
    # block decodes at sf0.1), decode-bound by design
    "video_keyframe_occupancy",
    "multimodal_video_dhash_dedup",
    # and the four-modality curation DAG (text funnel + image/audio/video
    # keep-min legs + manifest): wall time is the shared text funnel — the
    # survivor-only modality legs add ~3 s on 417 survivors at sf0.1
    "corpus_curation_all_modalities",
    # r10 wave 2 — the matrix-completing incrementals (persisted-index
    # probes: image dHash through the Hamming probe kernel, video through
    # the df-capped key-collision probe) and the streaming image leg
    # (dHash fps through the stateful sliced-Hamming kernel)
    "multimodal_image_incremental",
    "multimodal_video_incremental",
    "streaming_image_neardup",
    # r10 wave 3 — mutual-kNN semantic clusters (exact 3-NN graph ->
    # mutuality self-join -> checkpointed min-label components) and the
    # DoReMi-style domain-reweighting step (one scan + O(#domains) math)
    "knn_mutual_components",
    "mixture_reweight_step",
    # r10 wave 4 - incremental admission control (batch curated against
    # the landed corpus's persisted URL + LSH indexes) and the codec-leg
    # video dedup in streaming form
    "corpus_curation_incremental",
    "streaming_video_dhash_neardup",
    # round-11 (r11): the MinHash band-bucket occupancy audit (rides the
    # same signature/band-key shuffle as dedup_minhash_lsh — the audit
    # that watches the new band df-cap), the real-container AVI video leg
    # (RIFF chunk walk + full baseline-JPEG keyframe decode — the MJPEG
    # leg's decode cost plus container parsing), and the multimodal
    # admission-control DAG (five persisted-index probes + three
    # survivor-only fingerprint legs)
    "lsh_band_occupancy",
    "multimodal_avi_keyframe_dedup",
    "corpus_curation_incremental_multimodal",
    # r11 wave 2: the over-cap band cluster emitter (one band_key shuffle)
    # and the incremental codec-video probe (RIFF walk + JPEG decode on
    # both sides, then O(batch) slice-keyed probes of the persisted index)
    "dedup_lsh_overcap_clusters",
    "multimodal_avi_incremental",
    # and the CCNet head/middle/tail LM bucketing (broadcast KN model +
    # per-lang percentile boundaries — scan + broadcast + scan)
    "ccnet_perplexity_buckets",
    # and DSIR importance selection (two 1024-row hashed unigram models +
    # one percentile boundary, scan + broadcast only)
    "dsir_importance_select",
    # r12 wave: BFF Bloom paragraph dedup — the nightly batch-vs-bitmap
    # pass (broadcast bit table, k probe rows per paragraph) and the
    # rolling twin whose bitmap grows by position-set union — plus
    # soft-dedup 1/cluster_size weights (components consumer), the
    # quality-cutoff calibration sweep (one scored scan, 9-row broadcast
    # grid), and cluster-balanced embedding sampling (IVF assign + capped
    # per-cluster window)
    "dedup_bloom_paragraphs",
    "dedup_bloom_paragraphs_rolling",
    "dedup_soft_weights",
    "quality_threshold_sweep",
    "cluster_balanced_sample",
    # streaming_state_observability / streaming_state_observability_sketches
    # are correctness-graded but not benched: they re-drain stateful kernels
    # that are ALREADY benched (streaming_video_neardup,
    # streaming_simhash_neardup, streaming_stateful_running_counts,
    # streaming_running_moments, streaming_quantile_sketch,
    # streaming_cms_counts) purely to read their progress metrics —
    # micro-batch scheduler overhead with no plan insight the kernels' own
    # bench rows don't give.
    # ann_index_persist_roundtrip is correctness-graded but not benched:
    # it is ann_ivf_topk's probe re-rooted on a landed index, so it pays
    # the same all-queries probe cost that keeps ann_ivf_topk itself out
    # of the bench (see the note below) plus two parquet writes — ~14 s
    # of pure audit at sf0.1 with no plan insight the correctness gate
    # doesn't already give.
]
# ann_ivf_topk is correctness-graded but not benched here: at sf0.1's 2k
# vectors a probed list still holds n/16 vectors, so IVF's candidate set
# (~1M fold-scored pairs) loses to the BLAS brute-force path; its regime is
# n >> broadcast cap where lists are thousands and the rerank kernel is the
# vectorized one (SCALING.md).


def _cached_kb() -> int | None:
    """Page-cache size (kB) from /proc/meminfo, None off-Linux."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("Cached:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    t0 = time.perf_counter()
    load_start = [round(x, 2) for x in os.getloadavg()]
    cached_start = _cached_kb()
    from kwack_spark.session import get_session
    from kwack_spark.plans.registry import query_map

    spark = get_session(app_name="kwack-bench")
    qmap = query_map()
    init_sec = time.perf_counter() - t0

    # one-time warmup: JVM JIT, codegen, parquet footer caches.  Reported
    # separately (and counted in the total), so per-query timings and
    # init_sec are both steady-state-honest.
    from pyspark.sql import functions as F

    from kwack_spark.sources.parquet import load_table

    t_w = time.perf_counter()
    warm = load_table(spark, sf_dir, "lineitem").limit(10000)
    warm.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("s")
    ).write.mode("overwrite").format("noop").save()
    # spin up the Python worker pool + Arrow serde once, so the per-query
    # timing of Pandas-UDF operators measures the operator, not daemon start
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()
    warmup_sec = time.perf_counter() - t_w

    # n reps per query (default 3): the per-query number reported is the
    # MEDIAN, and the max-min spread is reported alongside, so run-to-run
    # drift (JIT, page cache, shuffle-partition pressure) is visible instead
    # of being mistaken for a regression.  Rep loop is outermost so reps of
    # one query don't reuse each other's still-warm shuffle files.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "4")))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for rep in range(reps):
        # reps 2+ run in a DETERMINISTICALLY shuffled order (seeded by the
        # rep index), so the reported median cannot hide a pin violation
        # behind a favorable fixed ordering (shared page cache, JIT, and
        # shuffle-partition pressure all depend on what ran just before);
        # rep 0 keeps registration order so single-rep runs stay
        # comparable with historical pins.
        order = list(HEADLINE)
        if rep > 0:
            import random

            random.Random(rep).shuffle(order)
        for name in order:
            fn = qmap[name]
            t = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            samples[name].append(time.perf_counter() - t)
            # several operators persist() intermediates (shingle sets, LSH
            # buckets, ANN indexes) that would otherwise accumulate across
            # the whole session: by the 40th query the executor heap is
            # carrying every earlier query's cache, and GC pressure shows
            # up as 2x medians on the md5-heavy queries.  Evict ONLY when
            # the query actually cached something — an unconditional
            # clearCache adds ~0.1-0.3 s of catalog churn to every
            # sub-second query for nothing.  localCheckpoint() RDDs (the
            # connected-components rounds) also live in getPersistentRDDs
            # and are NOT released by clearCache, so unpersist them
            # explicitly — otherwise the guard stays true forever and the
            # checkpoint blocks leak across the whole session.
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            if jmap.size() > 0:
                spark.catalog.clearCache()
                for jrdd in list(jmap.values()):
                    try:
                        jrdd.unpersist(False)
                    except Exception:
                        pass

    # per-query number: the median AFTER dropping each query's single worst
    # rep (r11 bench hygiene: one scheduler-stall rep put a 34.6 s spread
    # on dedup_shingle_size_sensitivity and read as a 1.8x regression —
    # with >= 3 reps the worst is noise by construction, since a real
    # regression moves every rep).  Spread is reported over the KEPT reps.
    def _kept(ts: list[float]) -> list[float]:
        return sorted(ts)[:-1] if len(ts) >= 3 else sorted(ts)

    timings = {
        name: round(_kept(ts)[len(_kept(ts)) // 2], 3)
        for name, ts in samples.items()
    }
    spread = {
        name: round(max(_kept(ts)) - min(_kept(ts)), 3)
        for name, ts in samples.items()
    }

    total = time.perf_counter() - t0
    # value stays comparable across rounds: init + warmup + ONE rep
    # (median per query); the full multi-rep wall clock is total_wall_sec
    one_cycle = init_sec + warmup_sec + sum(timings.values())
    result = {
        "metric": "full_cycle_sec",
        "value": round(one_cycle, 3),
        "unit": "sec",
        "queries": timings,
        "queries_spread": spread,
        "reps": reps,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "init_sec": round(init_sec, 3),
        "warmup_sec": round(warmup_sec, 3),
        "total_wall_sec": round(total, 3),
        "n_queries": len(timings),
        "env": {
            "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
            "sf_dir": sf_dir,
            "python": sys.version.split()[0],
            "pyspark": __import__("pyspark").__version__,
            # machine state at bench start (r11 bench hygiene): a loaded
            # box or cold page cache explains a uniformly-shifted run —
            # record it so a drifted geomean is auditable from artifacts
            "loadavg_start": load_start,
            "loadavg_end": [round(x, 2) for x in os.getloadavg()],
            "meminfo_cached_kb_start": cached_start,
        },
    }
    print(json.dumps(result))
    # The driver's BENCH artifact stores only the last ~2 kB of stdout, and
    # the full line (two dicts x 194 queries ~ 12 kB) exceeds that — the r11
    # artifact was truncated mid-line and r12 lost its round-over-round
    # table to it.  Emit a SECOND, compact line AFTER the full one (same
    # schema minus the per-query dicts) so a 2 kB tail always ends with a
    # complete parseable record; consumers that want per-query numbers use
    # the first line or BENCH_LOCAL.json.
    print(
        json.dumps(
            {
                k: v
                for k, v in result.items()
                if k not in ("queries", "queries_spread")
            }
        )
    )
    # The full result is ALSO persisted next to the script so per-query
    # regression auditing never depends on stdout capture size.
    # tools/bench_regress.py diffs this against the committed
    # BENCH_BASELINE.json (>1.25x median = regression).
    out = Path(__file__).resolve().parent / "BENCH_LOCAL.json"
    out.write_text(json.dumps(result, indent=1, sort_keys=True) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
