"""Named query registry wired into ``__spark_entry__``.

Every implemented operator from SURVEY.md §2 registers:
  - a PySpark callable  (spark, sf_dir) -> DataFrame
  - (when SQL-expressible) an equivalent ANSI-SQL string the DuckDB
    oracle runs on the same parquet views.

Import side effects populate the registry; add new query modules to
``_MODULES``.
"""

from __future__ import annotations

import importlib

from .registry import ORACLE, QUERIES, SHADOW_ORACLE, register

_MODULES = [
    "core",
    "aggregates",
    "windows",
    "scalars",
    "mlmetrics",
    "dedup",
    "text",
    "similarity",
    "streamq",
    # sampling's queries rotated INTO the driver window in round 4;
    # _prioritize() orders oracle-backed entries first, so module order
    # only fixes relative position within each class.
    "sampling",
    "corpusweb",
]

# Round-5 rotation (VERDICT r4 #2): the driver hash-checks only the
# first 50 oracle-backed entries per round, so never-driver-checked
# shadow queries rotate INTO the window and multi-round-green queries
# cede their slots (keeping the identical differential contract as
# pytest shadow checks). Declarative here — register() call sites keep
# their SQL untouched; _apply_rotation() swaps dict membership.
ROTATE_TO_ORACLE = [
    # r12 wave (VERDICT r11 #5 window policy): the four round-12
    # registrations (URL canonicalization + code-quality tiers,
    # queries/corpusweb.py) rotate in for their birth-round driver
    # hash rows. Ceding 4 slots: four of the eight two-green r9
    # first-timers (text_bm25_topk, a_assoc_rules, a_rank_normalize,
    # split_stratified_exact — delisted from the r9 block below,
    # returning to SHADOW_ORACLE with the identical hash contract).
    "url_normalize_dedup",
    "url_host_stats",
    "url_robots_filter",
    "code_quality_profile",
    "code_license_stats",
    "text_fix_mojibake",
    # r11 wave (VERDICT r10 #2): bank the second-green debt — the 17
    # one-green r8 first-timers (each delisted in r9 after exactly one
    # driver hash row) rotate back IN for their second consecutive
    # green. Ceding 17 slots: r9-wave first-timers that banked two
    # consecutive greens (r9 + the held r10 window) — delisted from the
    # r9 block below, returning to SHADOW_ORACLE with the identical
    # hash contract. flagship never cedes; streaming stays 3-deep.
    "j_bloom_pruned",
    "j_correlated_subquery",
    "cdc_merge_upsert",
    "a_outlier_mad",
    "a_histogram_value",
    "a_corr_matrix",
    "a_winsorized_stats",
    "a_trend_fit",
    "w_ewma",
    "w_pattern_match",
    "w_interval_merge",
    "w_cusum_changepoint",
    "w_rolling_median",
    "text_zipf_slope",
    "text_lexical_diversity",
    "dedup_containment",
    "dedup_cluster_sizes",
    # r9 wave (VERDICT r8 #1): drain the declared 25-query rotation
    # queue — every SQL-expressible query registered after the r8
    # window filled (waves 6-14) earns its first driver hash row THIS
    # round. Ceding 25 slots: the eight non-streaming multi-round-green
    # incumbents (cdc_scd2_history, dedup_source_overlap,
    # split_cluster_safe, text_dsir_weights via ROTATE_TO_SHADOW;
    # shadow-site dedup_paragraph_exact, text_source_kl,
    # mix_unimax_weights, sample_quality_stratified delisted below)
    # plus — forced by queue depth 25 > 8 eligible multi-greens — 17
    # one-green r8 first-timers (delisted below; each banked its r8
    # row, keeps the identical hash contract as a pytest shadow).
    # flagship never cedes; streaming stays 3-deep (session +
    # cdc_state + hopping).
    # (r11: a_ab_welch_test, a_chi2_independence, w_time_weighted_avg,
    # a_gini_value, text_readability_ari, a_autocorr_lag1,
    # a_seasonality_strength, a_mann_whitney_u, w_peak_detection,
    # a_spearman_trend, a_mutual_info, a_user_entropy, a_quantile_bins,
    # w_streak_runs, w_gap_stats, a_psi_drift, text_jsd_drift delisted
    # after two consecutive green rows (r9 + held r10) — ceding to the
    # r11 wave above; back to SHADOW_ORACLE.)
    # (r12: text_bm25_topk, a_assoc_rules, a_rank_normalize,
    # split_stratified_exact, a_benford_test, a_survival_km delisted
    # after two consecutive green rows (r9 + r11) — ceding to the r12
    # wave above; back to SHADOW_ORACLE.)
    "text_lm_interpolated",
    "a_markov_transitions",
    # r8 fourth/fifth wave: the eleven queries built later this round
    # (ten batch + the streaming hopping twin) rotate in to earn driver
    # hash rows in their build round; eleven multi-round-green
    # incumbents cede (oracle-site ceders listed in ROTATE_TO_SHADOW;
    # shadow-site text_chunk_tokens is simply delisted below).
    # Streaming stays 3-deep: session + cdc_state + hopping
    # (attribution, 4-for-4 green, cedes).
    # (r9: w_cusum_changepoint, w_rolling_median, cdc_merge_upsert,
    # text_zipf_slope, text_lexical_diversity delisted after their r8
    # green row — ceding to the r9 wave; back to SHADOW_ORACLE.)
    "w_hopping_window",
    "w_session_paths",
    "mix_concentration",
    "a_bootstrap_ci",
    "a_ks_test",
    "stream_hopping_window",
    # r8 third wave: the eight registrations added after the second
    # wave filled the window (two pre-session: w_interval_merge,
    # dedup_containment; six from this session's build) rotate in to
    # earn driver hash rows THIS round; eight multi-round-green
    # incumbents cede (shadow-first sites a_key_skew,
    # a_pivot_event_counts, f_array/json/lambda_funcs, text_dup_spans,
    # dedup_cluster_embedding are simply delisted below; oracle-site
    # a_retention_cohorts moves via ROTATE_TO_SHADOW). flagship never
    # cedes; streaming stays 3-deep.
    # (r9: w_interval_merge, dedup_containment, dedup_cluster_sizes
    # delisted after their r8 green row — ceding to the r9 wave.)
    "text_ngram_novelty",
    "emb_source_drift",
    "sample_epoch_materialize",
    "text_mixed_lang",
    "w_cumulative_distinct",
    # r8 second wave: the fifteen round-8 registrations (shadow-first —
    # the window was full at registration time) rotate in to earn their
    # first driver hash rows THIS round instead of aging into the exact
    # ledger gap VERDICT r7 #2 flagged; the fifteen longest-green
    # incumbents cede (4-green: j_multiway_revenue,
    # quality_constraint_report, dedup_cluster_ngram, text_bigram_logprob,
    # mix_temperature_weights, sample_group_bottomk; 3-green:
    # cdc_latest_state, cdc_snapshot_diff, a_cube_revenue, a_outlier_iqr,
    # a_profile_table, a_funnel_conversion, w_rank_functions,
    # text_heavy_hitters, text_chunk_chars). flagship never cedes;
    # streaming stays 3-deep (attribution + session + cdc_state).
    # (r9: j_bloom_pruned, j_correlated_subquery, a_winsorized_stats,
    # a_trend_fit, w_ewma, w_pattern_match delisted after their r8
    # green row — ceding to the r9 wave.)
    "incr_stats_merge",
    "gdpr_delete_cascade",
    "dedup_jaccard_prefix",
    "dedup_cluster_keeper_quality",
    "text_semantic_decontaminate",
    "text_ccnet_buckets",
    "text_duplication_score",
    "w_sliding_distinct",
    "sample_training_order",
    # r8 (VERDICT r7 #2): the five late-round-7 registrations that have
    # never earned a driver hash row rotate in; five 3-round-green r5
    # incumbents cede (removed from this list — their register() sites
    # are shadow-first, so delisting returns them to SHADOW_ORACLE):
    # o_set_operations, asof_forward_ship, a_unpivot_user_stats,
    # dedup_incremental_ngram, text_heavy_hitters_lang.
    # (r9: a_outlier_mad, a_histogram_value, a_corr_matrix delisted
    # after their r8 green row — ceding to the r9 wave.)
    "text_token_contamination",
    "text_remove_dup_spans",
    # r7: the five round-7 queries registered shadow-first (window was
    # full at registration time) rotate in to earn their first driver
    # hash rows this round; five multi-round-green incumbents cede.
    # (r9: mix_unimax_weights, dedup_paragraph_exact,
    # sample_quality_stratified, text_source_kl delisted after two
    # green rounds (r7+r8) — the standing multi-round-green cede.)
    "stream_cdc_state",
    # r6 (VERDICT r5 #3): text_chunk_tokens rotated in here r6-r7;
    # ceded in the r8 fourth/fifth wave (2 green rounds banked,
    # text_chunk_chars-twin plan) — delisted, returning it to
    # SHADOW_ORACLE.
    # r5 additions that remain in-window. (r8 third wave: a_key_skew,
    # a_pivot_event_counts, f_array/json/lambda_funcs, text_dup_spans,
    # dedup_cluster_embedding were delisted from this section — their
    # shadow-first register sites return them to SHADOW_ORACLE, ceding
    # slots to the eight rotated-in queries above.)
    "a_cube_revenue",
    "text_heavy_hitters",
    "w_rank_functions",
]
# All 4-for-4 driver-green (r1-r4); the cheapest evidence to trade.
ROTATE_TO_SHADOW = [
    # r9 wave ceders with oracle-site registrations (two green rounds
    # r7+r8 each); shadow-site r9 ceders are delisted from
    # ROTATE_TO_ORACLE above instead.
    "cdc_scd2_history",
    "dedup_source_overlap",
    "split_cluster_safe",
    "text_dsir_weights",
    # r8 fourth/fifth wave ceders (3+-green oracle-site incumbents; see
    # ROTATE_TO_ORACLE note): every one keeps the identical hash-equal
    # contract as a pytest shadow check.
    "dedup_levenshtein",
    "dedup_levenshtein_multipass",
    "sample_weighted",
    "text_inverted_index",
    "text_pmi_collocations",
    "text_tfidf_keywords",
    "text_token_entropy",
    "w_resample_ffill",
    "w_rolling_range",
    "stream_attribution_join",
    # r8 third wave: oracle-site incumbent ceding to the rotations above.
    "a_retention_cohorts",
    # r8 second wave (see ROTATE_TO_ORACLE note above).
    "j_multiway_revenue",
    "quality_constraint_report",
    "dedup_cluster_ngram",
    "text_bigram_logprob",
    "mix_temperature_weights",
    "sample_group_bottomk",
    "cdc_latest_state",
    "cdc_snapshot_diff",
    "a_cube_revenue",
    "a_outlier_iqr",
    "a_profile_table",
    "a_funnel_conversion",
    "w_rank_functions",
    "text_heavy_hitters",
    "text_chunk_chars",
    # r7 wave: longest-green incumbents cede slots to the round-7
    # additions (cdc_scd2_history, dedup_source_overlap,
    # split_cluster_safe, text_dsir_weights); every ceded query keeps
    # the identical hash-equal contract as a pytest shadow check.
    "w_session_window",
    "dedup_ngram_jaccard",
    "knn_bruteforce",
    "dedup_embedding_cosine",
    # second r7 wave: ceding to the five rotated-in round-7 queries
    # (streaming stays 3-deep in the window: attribution + session +
    # the new cdc_state).
    "text_decontaminate",
    "stream_windowed_agg",
    "corpus_clean_pipeline",
    "sample_stratified",
    "pack_token_shards",
    # r6 wave: multi-round-green queries ceding slots to
    # text_chunk_tokens and the round-6 additions.
    "text_pii_mask",
    "text_unigram_logprob",
    "p_null_guard_cast",
    "asof_nearest_ship",
    "w5_sequence_digest",
    "text_stats",
    "text_token_counts",
    "m1_standard_scale",
    "multimodal_bytes",
    "text_lang_id",
    "w_sessionize",
    "f_scalar_funcs",
    "m15_auc_roc",
    "text_repetition_filter",
    "j_outer_anti",
    "m15_classification_metrics",
    "text_quality_profile",
    "m16_regression_metrics",
    "dedup_exact",
    "m_calibration",
    "a1_stats_bundle",
    "a2_higher_moments",
    "a3_temporal_deltas",
    "a5_calendar_reagg",
    "a7_half_contrast",
    "a8_season_scoped",
    "a12_rowwise_mean",
    "a_percentiles",
    "a_rollup_revenue",
    "m13_oof_folds",
    "m14_ensemble_blend",
    "w4_tail_k",
    "text_fingerprint_groups",
]


# Every query name that has earned a driver hash row in some past
# round's CORRECTNESS_r*.json (the union of all driver windows, rounds
# 1-8; includes the three pre-consolidation names a6/a10/m17 that no
# longer register). VERDICT r8 #2 structural fix: a SQL-expressible
# query may sit OUTSIDE the driver window only if it is on this ledger
# — i.e. new registrations must enter via ROTATE_TO_ORACLE (driver-
# first) instead of accumulating as a never-checked shadow backlog.
# Enforced by tests/test_api.py::test_no_never_driver_checked_shadows;
# extend this ledger only from a new CORRECTNESS record, never to
# bypass the guard.
DRIVER_CHECKED_LEDGER = frozenset([
    "a10_frequency_table", "a11_class_weights", "a12_rowwise_mean",
    "a13_global_stats", "a14_weighted_mean", "a1_stats_bundle",
    "a2_higher_moments", "a3_temporal_deltas", "a5_calendar_reagg",
    "a6_diurnal_range", "a7_half_contrast", "a8_season_scoped",
    "a9_distinct_counts", "a_bootstrap_ci", "a_corr_matrix",
    "a_cube_revenue", "a_funnel_conversion", "a_histogram_value",
    "a_key_skew", "a_ks_test", "a_outlier_iqr", "a_outlier_mad",
    "a_percentiles", "a_pivot_event_counts", "a_profile_table",
    "a_retention_cohorts", "a_rollup_revenue", "a_trend_fit",
    "a_unpivot_user_stats", "a_winsorized_stats", "asof_forward_ship",
    "asof_nearest_ship", "cdc_latest_state", "cdc_merge_upsert",
    "cdc_scd2_history", "cdc_snapshot_diff", "corpus_clean_pipeline",
    "dedup_cluster_embedding", "dedup_cluster_keeper_quality",
    "dedup_cluster_ngram", "dedup_cluster_sizes", "dedup_containment",
    "dedup_embedding_cosine", "dedup_exact", "dedup_incremental_ngram",
    "dedup_jaccard_prefix", "dedup_levenshtein",
    "dedup_levenshtein_multipass", "dedup_ngram_jaccard",
    "dedup_paragraph_exact", "dedup_source_overlap", "emb_source_drift",
    "f_array_funcs", "f_datetime_parts", "f_json_funcs",
    "f_lambda_funcs", "f_math_funcs", "f_scalar_funcs",
    "f_string_funcs", "flagship_interval_stats", "gdpr_delete_cascade",
    "incr_stats_merge", "j2_key_normalize", "j5_semi_split",
    "j_bloom_pruned", "j_correlated_subquery", "j_multiway_revenue",
    "j_outer_anti", "knn_bruteforce", "m13_oof_folds",
    "m14_ensemble_blend", "m15_auc_roc", "m15_classification_metrics",
    "m16_regression_metrics", "m17_confusion_matrix",
    "m1_standard_scale", "m_calibration", "mix_concentration",
    "mix_temperature_weights", "mix_unimax_weights", "multimodal_bytes",
    "o4_top1_per_group", "o_set_operations", "p_filter_project",
    "p_null_guard_cast", "pack_token_shards",
    "quality_constraint_report", "s2_union_provenance",
    "sample_epoch_materialize", "sample_group_bottomk",
    "sample_quality_stratified", "sample_stratified",
    "sample_training_order", "sample_weighted", "split_cluster_safe",
    "stream_attribution_join", "stream_cdc_state",
    "stream_hopping_window", "stream_session_window",
    "stream_windowed_agg", "text_bigram_logprob", "text_ccnet_buckets",
    "text_chunk_chars", "text_chunk_tokens", "text_decontaminate",
    "text_dsir_weights", "text_dup_spans", "text_duplication_score",
    "text_fingerprint_groups", "text_heavy_hitters",
    "text_heavy_hitters_lang", "text_inverted_index", "text_lang_id",
    "text_lexical_diversity", "text_mixed_lang", "text_ngram_novelty",
    "text_pii_mask", "text_pmi_collocations", "text_quality_profile",
    "text_remove_dup_spans", "text_repetition_filter",
    "text_semantic_decontaminate", "text_source_kl", "text_stats",
    "text_tfidf_keywords", "text_token_contamination",
    "text_token_counts", "text_token_entropy", "text_unigram_logprob",
    "text_zipf_slope", "w1_ordered_head", "w3_stride_subsample",
    "w4_tail_k", "w5_sequence_digest", "w_cumulative_distinct",
    "w_cusum_changepoint", "w_ewma", "w_hopping_window",
    "w_interval_merge", "w_pattern_match", "w_rank_functions",
    "w_resample_ffill", "w_rolling_median", "w_rolling_range",
    "w_session_paths", "w_session_window", "w_sessionize",
    "w_sliding_distinct",
    # r9 first-timers: banked driver hash rows in CORRECTNESS_r9 and
    # again in the held-window CORRECTNESS_r10 (ledger extended r11
    # from those records, per the extend-only-from-CORRECTNESS rule).
    "a_ab_welch_test", "a_assoc_rules", "a_autocorr_lag1",
    "a_benford_test", "a_chi2_independence", "a_gini_value",
    "a_mann_whitney_u", "a_markov_transitions", "a_mutual_info",
    "a_psi_drift", "a_quantile_bins", "a_rank_normalize",
    "a_seasonality_strength", "a_spearman_trend", "a_survival_km",
    "a_user_entropy", "split_stratified_exact", "text_bm25_topk",
    "text_jsd_drift", "text_lm_interpolated", "text_readability_ari",
    "w_gap_stats", "w_peak_detection", "w_streak_runs",
    "w_time_weighted_avg",
])


def load_all() -> None:
    for m in _MODULES:
        importlib.import_module(f"{__name__}.{m}")
    _apply_rotation()
    _prioritize()


def _apply_rotation() -> None:
    for name in ROTATE_TO_ORACLE:
        if name in SHADOW_ORACLE:
            ORACLE[name] = SHADOW_ORACLE.pop(name)
    for name in ROTATE_TO_SHADOW:
        if name in ORACLE:
            SHADOW_ORACLE[name] = ORACLE.pop(name)


def _prioritize() -> None:
    """Stable-reorder the registry so every oracle-backed query precedes
    the rows-only (no-oracle) approximate ops.

    The round driver evaluates registry entries in insertion order with
    a bounded window; keeping the hash-checkable queries first ensures
    each gets a full correctness row, while rows-only ops (MinHash/
    SimHash/ANN — approximate by design, covered by pytest recall
    bounds — plus the real-WAV-decode query, value-pinned by
    closed-form sine tests) take the tail positions where a weaker
    check costs least.
    """
    ordered = sorted(QUERIES.items(), key=lambda kv: kv[0] not in ORACLE)
    QUERIES.clear()
    QUERIES.update(ordered)


__all__ = ["QUERIES", "ORACLE", "register", "load_all"]
