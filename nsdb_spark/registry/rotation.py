"""Driver-check rotation state: the per-round check prefixes (the driver
verifies the registry's FIRST 50 entries) and the never-driver-checked
queue. See the rotation rule in __init__.build_queries."""



#: Round-5 driver-check prefix: the 3 formerly-`no_oracle` entries (new
#: cross-engine oracles this round — their stale err status must clear) +
#: the 47 OLDEST never-driver-checked entries (text_compress_ratio also
#: changed this round). All 50 verified green against DuckDB at sf0.01
#: before the round close.
_CHECK_PREFIX_R5 = [
    "sim_topk_pq", "text_bpe_encode", "emb_pca_project",
    "text_compress_ratio",
    "mm_frame_sample", "mm_resize", "mm_decode_metadata",
    "scale_zorder_key", "sim_range_search", "tsa_ema",
    "events_retention", "events_transitions", "stats_robust",
    "text_normalize", "sim_topk_ivfpq", "scale_join_chain",
    "sample_weighted", "sample_split", "tsa_decimate", "tsa_locf",
    "tsa_zscore", "tsa_rate", "scale_heavy_hitters", "text_lm_logprob",
    "text_repetition", "text_top_bigrams", "text_bm25_phrase",
    "text_bm25_and", "text_bm25_multi", "text_scrub_numbers",
    "stats_corr", "stats_histogram", "stats_percentiles",
    "events_funnel", "win_moving_agg", "win_topk_per_group",
    "text_bm25_topk", "rollup_temporal_avg", "rollup_temporal_sum",
    "events_sessionize", "join_asof_events_orders", "sample_stratified",
    "scale_bucketed_join", "scale_broadcast_join", "emb_quantize_int8",
    "dedup_source_matrix", "sample_per_group", "dedup_passages_strided",
    "text_bm25_postings", "events_stickiness",
]

#: Round-6 driver-check prefix (SPENT — driver-verified 50/50 green in
#: CORRECTNESS_r06.json): the 17 entries NEW that round (2 per-interval
#: temporal axes, 6 profiling, 2 text, fdr/snaive/power,
#: cohort-LTV/prefix-dedup/norm-profile/WAU) + the 33 oldest
#: never-driver-checked entries from the round-6 rotation block (was
#: _ROTATION_QUEUE[:50] at the round-5 close; the displaced 17 of that
#: block returned to the queue head and are in _CHECK_PREFIX_R7 now).
_CHECK_PREFIX_R6 = [
    "nsdb_temporal_not_range", "nsdb_temporal_or_ranges",
    "profile_columns", "profile_moments", "profile_fk_orphans",
    "profile_pk_unique", "profile_daily_completeness",
    "profile_weekly_drift", "text_chunk_sliding", "text_vocab_coverage",
    "stats_fdr_bh", "tsa_snaive_backtest", "stats_power_two_prop",
    "events_cohort_ltv", "dedup_prefix_hash", "emb_norm_profile",
    "events_rolling_wau",
    "stats_benford", "events_funnel_windowed", "stats_winsorize",
    "sample_ht_estimate", "dedup_decontaminate_emb", "text_lm_bigram",
    "tsa_anomaly", "emb_diversity", "stats_bootstrap",
    "dedup_passage_scrub", "tsa_seasonal", "emb_outliers",
    "text_jsd_by_source", "stats_cube", "stats_ttest",
    "emb_centroid_drift", "stats_anova", "graph_common_neighbors",
    "tsa_rolling_quantiles",
    "emb_knn_classify", "sim_mmr", "tsa_changepoint", "stats_gini",
    "text_gopher_rules", "graph_degree_dist", "win_order_gaps",
    "stats_linreg", "stats_basket_lift", "sample_token_budget",
    "stats_wilson", "events_concurrency", "sim_topk_filtered",
    "stats_cohens_d",
]

#: Round-7 driver-check prefix: stats_fdr_bh re-enters first (its BH
#: rank was rewritten this round onto the two-phase range-partitioned
#: global-rank primitive — changed entries jump the queue), then
#: stats_fdr_by and stats_holm (NEW this round: the Benjamini-Yekutieli
#: dependent-tests FDR variant and Holm-Bonferroni step-down FWER, both
#: on the same two-phase rank), then the 47 oldest never-driver-checked
#: entries from _ROTATION_QUEUE (the 17 displaced from the round-6
#: block + the first 30 of the old round-7 block; stats_ccc and
#: sample_neyman_apply displaced back to the queue head). The remaining
#: 46 queue entries are round 8's prefix. Verified green via
#: tools/check_oracles.py before the close.
_CHECK_PREFIX_R7 = [
    "stats_fdr_bh", "stats_fdr_by", "stats_holm", "events_rfm", "scale_salted_join", "join_asof_forward",
    "stats_zipf", "graph_hits", "stats_lorenz", "kmeans_cells",
    "stats_partial_corr", "emb_silhouette", "stats_pct_rank", "text_ttr",
    "tsa_crosscorr", "stats_kendall", "stats_cramers_v", "stats_theil_sen",
    "tsa_periodogram", "graph_adamic_adar", "stats_mi", "stats_spearman",
    "events_paths", "stats_cvm", "stats_wasserstein", "emb_hamming_topk",
    "stats_levene", "graph_kcore", "stats_qq", "events_kaplan_meier",
    "events_markov", "sim_topk_hamming_rerank", "stats_runs",
    "tsa_ljung_box", "emb_matryoshka_overlap", "sample_neyman", "stats_ad",
    "graph_assortativity", "stats_deming", "sample_pps_systematic",
    "stats_mood", "events_json_stats", "graph_clustering_coeff",
    "text_lang_confusion", "tsa_kpss", "stats_kruskal", "graph_modularity",
    "stats_hill", "join_band_prices", "events_entropy_rate",
]

#: Round-8 driver-check prefix: the entries CHANGED this round jump the
#: queue first — events_pareto_share (rank + running sum rewritten onto
#: the two-phase range-partitioned global-rank primitive, VERDICT r7
#: item 2), then stats_fdr_by (the BY harmonic c(m) now folds once on
#: the 1-row totals frame, ADVICE r7) and stats_fdr_bh / stats_holm
#: (they share the modified _fdr_ranked body; plans unchanged for their
#: modes but re-verified out of caution) — followed by the ENTIRE
#: remaining 45-entry never-driver-checked queue, and one entry NEW this
#: round to fill slot 50. After this round every registry entry has
#: appeared in some CORRECTNESS_r*.json: the rotation queue is DRAINED.
_CHECK_PREFIX_R8 = [
    "events_pareto_share", "stats_fdr_by", "stats_fdr_bh", "stats_holm",
    "stats_ccc", "sample_neyman_apply", "events_mcnemar",
    "stats_dagostino", "stats_logrank", "stats_cronbach", "stats_icc",
    "stats_friedman", "stats_risk_ratio", "stats_gamma", "tsa_hurst",
    "tsa_durbin_watson", "tsa_granger", "tsa_spectral_entropy",
    "text_readability", "text_hapax", "text_pii_scrub",
    "events_interevent_exp", "events_attribution",
    "graph_pref_attachment", "graph_katz", "emb_isotropy",
    "stats_jonckheere", "stats_somers_d", "stats_cohens_h", "stats_grubbs",
    "tsa_mann_kendall", "events_conversion_latency", "events_dow_hour",
    "emb_hubness", "stats_bhattacharyya",
    "text_burrows_delta", "pipeline_source_scorecard",
    "tsa_dickey_fuller", "stats_poisson_rate", "sample_ess",
    "dedup_shingle_profile", "tsa_cointegration", "stats_bartlett",
    "emb_cluster_purity", "stats_ab_srm", "events_funnel_timing",
    "stats_tost", "events_new_vs_returning", "tsa_rolling_corr",
    "stats_page_trend",
]

#: Never-driver-checked entries awaiting their prefix slot, OLDEST FIRST.
#: DRAINED in round 8: _CHECK_PREFIX_R8 absorbed the final 46-entry
#: remainder, so every entry registered through round 7 has been driver-
#: checked. From round 9 on the prefix reverts to changed/new-first
#: (entries touched in the round, then the newest additions).
#:
#: Entries ADDED in round 8 after the prefix froze (the R8 prefix is
#: exactly the 50-slot drain of the old queue) seed the round-9 queue:
#: they are self-verified against DuckDB at sf0.01 + sf0.001 this round
#: and take the first round-9 prefix slots. graph_pref_attachment also
#: CHANGED in round 8 (has_common candidate-incident cut) — it is
#: already in the R8 prefix, so the driver re-verifies it this round.
_ROTATION_QUEUE: list[str] = [
    "stats_mantel_haenszel",
    "text_yule_k",
    "stats_cochran_q",
    "events_session_depth",
    "tsa_acf_pacf",
]
