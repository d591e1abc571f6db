"""Benchmark harness — driver contract (BASELINE.md engine-side targets).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "spread": {name: {...}}, "sf": ...}

Each query is timed end-to-end (plan + execute + noop-sink action)
$SPARK_GRAFT_BENCH_RUNS times (default 3); "queries" carries the
per-query MEDIAN and "spread" the min/med/max of the runs, so
round-over-round deltas can be separated from single-run JVM noise
without re-running (VERDICT r3 #6). "value" is the sum of medians —
one steady-state pass, comparable with earlier single-pass rounds. A
warmup pass on sf0.001 absorbs JVM/codegen startup so the numbers
reflect steady-state throughput, which is what a long-running cluster
sees.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hive_population_ml_spark.queries import QUERIES, load_all
from hive_population_ml_spark.session import get_spark

HEADLINE = [
    "flagship_interval_stats",
    "a1_stats_bundle",
    "a3_temporal_deltas",
    "a5_calendar_reagg",
    "a_cube_revenue",
    "a_pivot_event_counts",
    "a_key_skew",
    "asof_nearest_ship",
    "j_multiway_revenue",
    "o_set_operations",
    "w_rank_functions",
    "quality_constraint_report",
    "m16_regression_metrics",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_cluster_components",
    "dedup_cluster_ngram",
    "dedup_simhash",
    "dedup_semantic",
    "dedup_embedding_cosine",
    "knn_bruteforce",
    "ann_lsh",
    "ann_ivf",
    "ann_pq",
    "ann_ivfpq",
    "embedding_pca",
    "text_quality_profile",
    "text_quality_clf_scores",
    "text_repetition_filter",
    "text_decontaminate",
    "text_decontaminate_bloom",
    "text_heavy_hitters",
    "text_dup_spans",
    "text_chunk_chars",
    "text_tfidf_keywords",
    "text_token_entropy",
    "text_pmi_collocations",
    "cdc_latest_state",
    "cdc_snapshot_diff",
    "graph_pagerank",
    "text_inverted_index",
    "a_outlier_iqr",
    "dedup_levenshtein",
    "text_bpe_merges",
    "text_bpe_segment",
    "text_pii_mask",
    "text_unigram_logprob",
    "text_bigram_logprob",
    "sample_stratified",
    "sample_weighted",
    "sample_group_bottomk",
    "pack_token_shards",
    "sketch_distinct_tokens",
    "sketch_value_quantiles",
    "m_calibration",
    "w5_sequence_digest",
    "w_sessionize",
    "w_rolling_range",
    "a_profile_table",
    "a_retention_cohorts",
    "w_resample_ffill",
    # round-7 closure of VERDICT r6 #3: the five round-6 registrations
    # that had neither a timed row nor an exchange budget, plus the
    # round-7 additions.
    "a_percentiles_approx",
    "a_outlier_iqr_approx",
    "a_profile_table_approx",
    "ann_pq_distributed",
    "dedup_levenshtein_multipass",
    "cdc_scd2_history",
    "ann_ivfpq_distributed",
    "dedup_source_overlap",
    "split_cluster_safe",
    "text_dsir_weights",
    "sketch_token_freq_cms",
    "dedup_paragraph_exact",
    "sample_quality_stratified",
    "text_source_kl",
    "a_outlier_mad",
    "a_histogram_value",
    "a_corr_matrix",
    "dedup_incremental_minhash",
    "text_token_contamination",
    "text_remove_dup_spans",
    # round-8 additions
    "text_semantic_decontaminate",
    "text_ccnet_buckets",
    "a_winsorized_stats",
    "dedup_cluster_keeper_quality",
    "sample_training_order",
    "text_duplication_score",
    "j_bloom_pruned",
    "j_correlated_subquery",
    "incr_stats_merge",
    "gdpr_delete_cascade",
    "dedup_jaccard_prefix",
    "a_trend_fit",
    "w_ewma",
    "w_sliding_distinct",
    "w_pattern_match",
    "w_interval_merge",
    "dedup_containment",
    "text_ngram_novelty",
    "mix_domain_clusters",
    "dedup_source_overlap_hll",
    "emb_source_drift",
    "j_size_estimate_cms",
    "sample_epoch_materialize",
    "text_mixed_lang",
    "dedup_cluster_sizes",
    "w_cumulative_distinct",
    # round-8 fourth wave
    "w_cusum_changepoint",
    "w_hopping_window",
    "w_session_paths",
    "cdc_merge_upsert",
    "mix_concentration",
    "a_bootstrap_ci",
    "text_lexical_diversity",
    "a_ks_test",
    "text_zipf_slope",
    "w_rolling_median",
    "text_bm25_topk",
    "a_assoc_rules",
    "a_ks_test_binned",
    "emb_jl_project",
    "a_rank_normalize",
    "a_rank_normalize_approx",
    "split_stratified_exact",
    "a_benford_test",
    "a_survival_km",
    "text_lm_interpolated",
    "a_markov_transitions",
    "sketch_user_overlap_hll",
    "a_ab_welch_test",
    "a_chi2_independence",
    "w_time_weighted_avg",
    "a_gini_value",
    "a_gini_value_approx",
    "text_readability_ari",
    "a_autocorr_lag1",
    "a_seasonality_strength",
    "text_compressibility",
    "mix_cluster_silhouette",
    "a_mann_whitney_u",
    "a_mann_whitney_binned",
    "w_peak_detection",
    "a_spearman_trend",
    "a_mutual_info",
    "a_user_entropy",
    "a_quantile_bins",
    "a_quantile_bins_approx",
    "w_streak_runs",
    "w_gap_stats",
    "a_psi_drift",
    "a_psi_drift_approx",
    "text_jsd_drift",
    # round-12 web/code corpus tiers
    "url_normalize_dedup",
    "url_robots_filter",
    "code_quality_profile",
    "text_fix_mojibake",
]

# Registered queries intentionally NOT timed by the headline bench, with
# the reason. tests/test_plan_budgets.py asserts HEADLINE + DECLARED_UNTIMED
# covers the ENTIRE registry, so a new registration cannot silently skip
# both the bench and the budget pin (VERDICT r6 wrong-#2).
DECLARED_UNTIMED = {
    # round-11 ingestion tiers: codec-bound python parsing (stdlib
    # HTML parser / PDF token scan) over synthetic payloads — the
    # timing measures single-core codec throughput (measured: WARC
    # ~4 MB/s-gz/core, PDF ~1 MB/s/core on fixture-shaped payloads),
    # not a Spark plan; correctness-gated by their own pytest suites
    "s_warc_ingest": "codec-bound (WARC/HTML extraction; measured throughput note in PERFORMANCE.md)",
    "s_pdf_ingest": "codec-bound (PDF content-stream extraction)",
    "s_wiki_ingest": "codec-bound (bz2 + wikitext extraction; throughput note in PERFORMANCE.md)",
    "s_wds_ingest": "codec-bound (tar shard build/parse round trip; stdlib tarfile)",
    # round-12 web/code rollups sharing a timed twin's scan + scalar shape
    "url_host_stats": "timed via url_normalize_dedup (same scan + canonicalize project)",
    "code_license_stats": "timed via code_quality_profile (same scan + profile project)",
    # tiny reference-parity micro-queries: dominated by fixed Spark
    # job-submission overhead at sf0.1, so their timings measure the
    # scheduler, not the operator; correctness-gated every round.
    "p_filter_project": "micro (projection/filter parity query)",
    "p_null_guard_cast": "micro",
    "s2_union_provenance": "micro",
    "j2_key_normalize": "micro",
    "j5_semi_split": "micro",
    "j_outer_anti": "micro",
    "a2_higher_moments": "micro",
    "a7_half_contrast": "micro",
    "a8_season_scoped": "micro",
    "a9_distinct_counts": "micro",
    "a11_class_weights": "micro",
    "a12_rowwise_mean": "micro",
    "a13_global_stats": "micro",
    "a14_weighted_mean": "micro",
    "a_rollup_revenue": "micro",
    "a_percentiles": "micro",
    "a_unpivot_user_stats": "micro",
    "a_funnel_conversion": "timed via a_retention_cohorts (same scan/agg shape)",
    "w1_ordered_head": "micro",
    "w3_stride_subsample": "micro",
    "w4_tail_k": "micro",
    "o4_top1_per_group": "micro",
    "w_session_window": "timed via w_sessionize (same operator)",
    "f_datetime_parts": "scalar-function sweep (no data plane)",
    "f_scalar_funcs": "scalar-function sweep",
    "f_array_funcs": "scalar-function sweep",
    "f_json_funcs": "scalar-function sweep",
    "f_lambda_funcs": "scalar-function sweep",
    "asof_forward_ship": "timed via asof_nearest_ship (same operator, reversed)",
    "m1_standard_scale": "ML fit path, timed by tests/test_ml.py",
    "m13_oof_folds": "ML fit path",
    "m14_ensemble_blend": "ML fit path",
    "m15_auc_roc": "metric micro",
    "m15_classification_metrics": "metric micro",
    "corpus_clean_pipeline": "composition of timed stages (pii+quality+dedup)",
    "dedup_incremental_ngram": "timed via dedup_ngram_jaccard (same join core)",
    "dedup_cluster_embedding": "exactness twin of dedup_semantic (declared quadratic)",
    "dedup_canonical_simhash": "timed via dedup_simhash (adds canonical-first filter)",
    "text_stats": "micro",
    "text_token_counts": "micro",
    "text_lang_id": "map-only micro",
    "text_fingerprint_groups": "micro",
    "text_heavy_hitters_lang": "timed via text_heavy_hitters",
    "text_chunk_tokens": "timed via text_chunk_chars (same posexplode plan)",
    "stream_windowed_agg": "streaming (availableNow run; wall time is trigger-bound)",
    "stream_attribution_join": "streaming",
    "stream_session_window": "streaming",
    "stream_cdc_state": "streaming",
    "stream_heavy_hitters": "streaming",
    "stream_hopping_window": "streaming",
    "dedup_recall_report": "composition of timed stages (prefix-exact + LSH pair operators)",
    "mix_temperature_weights": "driver-side weight table (no data plane)",
    "mix_unimax_weights": "one token-count agg + L-row waterfill (micro)",
    "multimodal_bytes": "binary plumbing micro",
    "multimodal_wav_features": "codec-bound (decode dominates, measured in tests)",
    "multimodal_wav_spectral": "codec-bound",
    "multimodal_jpeg_features": "codec-bound (python huffman decode "
    "dominates at fixture scale; RMSE/closed-form pinned in tests)",
    "dedup_image_phash": "codec-bound (192 python JPEG decodes dominate; "
    "banding is the timed SimHash shape; margins pinned in tests)",
    "multimodal_image_quality": "codec-bound (decode dominates; "
    "monotonicity pinned in tests)",
    "multimodal_video_frames": "codec-bound (python MJPEG frame decodes "
    "dominate at fixture scale; container walk + frame parity pinned "
    "in tests)",
    "dedup_audio_fingerprint": "codec-bound (96 python WAV decodes + FFT "
    "dominate; banding is the timed SimHash shape; margins pinned in "
    "tests)",
    "dedup_video_phash": "codec-bound (384 python MJPEG frame decodes "
    "dominate; banding is the timed SimHash shape; slot-majority rollup "
    "pinned in tests)",
    "multimodal_gif_animation": "codec-bound (python LZW frame decodes "
    "dominate at fixture scale; round trips + frame parity pinned in "
    "tests)",
    "text_exact_dup_spans": "one L-gram group-by (exact twin of the "
    "timed hash miner; exactness pinned vs brute force in tests)",
    "text_longest_repeat": "iterative prefix doubling (O(log L) "
    "driver-coordinated re-rank rounds; exactness pinned vs brute "
    "force + python suffix-array reference in tests)",
    "w_sliding_distinct_hll": "timed via w_sliding_distinct (same plan "
    "shape; sketch variant's win is shuffle VOLUME, invisible at sf0.1)",
    "text_topics_lda": "ML fit path (online variational LDA; "
    "iteration cost is minibatch-bounded, timed in tests/test_ml.py)",
}


# The driver-canonical BASELINE set (BENCH_r01.json "queries" keys): the
# "within 2x of BASELINE" regression gate compares THESE 15 queries, so
# their subtotal is computed here (not hand-maintained) and carried on
# the final line every round (VERDICT r7 #6).
R01_BASELINE_QUERIES = [
    "flagship_interval_stats",
    "a1_stats_bundle",
    "a3_temporal_deltas",
    "a5_calendar_reagg",
    "asof_nearest_ship",
    "m16_regression_metrics",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "knn_bruteforce",
    "ann_lsh",
    "text_quality_profile",
    "w5_sequence_digest",
    "w_sessionize",
]


def machine_calibration(spark) -> dict[str, float]:
    """Fixed-work machine calibration carried on every final line
    (VERDICT r10 #4): rounds 8 and 10 each burned a diagnosis cycle
    proving "the machine drifted, not the code". Two pinned kernels,
    measured in THIS process right before the timed runs, let any two
    rounds' numbers be normalized mechanically:

    - ``numpy_sort_sec``: median of 3 sorts of the same 2^22 float64
      array (deterministic rng(0); pure single-thread C loop — no BLAS
      thread-count dependence) -> raw CPU + memory-bandwidth drift.
    - ``spark_1p_sec``: median of 3 one-partition Spark jobs summing a
      fixed 2M-row hash expression (warmed once) -> JVM/codegen-path
      drift, same session as the benchmark itself.

    A round-over-round query ratio close to the calibration ratio is
    machine drift; a query ratio far above it is a code regression."""
    import numpy as np

    base = np.random.default_rng(0).random(1 << 22)
    times = []
    for _ in range(3):
        arr = base.copy()
        t0 = time.perf_counter()
        np.sort(arr)
        times.append(time.perf_counter() - t0)
    numpy_sec = sorted(times)[1]

    job = lambda: spark.range(0, 2_000_000, 1, 1).selectExpr(
        "sum(hash(id, 11) % 1000003) AS s"
    ).collect()
    job()  # warm codegen
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        job()
        times.append(time.perf_counter() - t0)
    spark_sec = sorted(times)[1]
    return {
        "numpy_sort_sec": round(numpy_sec, 4),
        "spark_1p_sec": round(spark_sec, 4),
    }


def final_line(
    timings: dict[str, float],
    sf: object,
    calib: dict | None = None,
    cpus: int | None = None,
    default_parallelism: int | None = None,
) -> str:
    """Render the FINAL stdout line the driver parses.

    O(1)-sized by construction (VERDICT r7 #1): the only per-query map it
    carries is the FIXED 15-entry r01-baseline set, never the full
    registry-sized map (which lives on its own earlier stdout line).
    tests/test_driver_sim.py renders this at the live HEADLINE size and
    pins the byte length under the driver's 2,000-char tail buffer.

    ``cpus``/``default_parallelism`` (round 13, VERDICT r12 #2): echo
    the $SPARK_GRAFT_CPUS the harness was given AND the parallelism the
    session actually resolved, so a scaling run's evidence is carried
    in the measurement itself (the r12 driver flagged
    suspect_cpus_ignored because nothing in the output proved the env
    var reached the session).
    """
    r01 = {name: timings[name] for name in R01_BASELINE_QUERIES if name in timings}
    out = {
        "metric": "headline_queries_total_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "n_queries": len(timings),
        "r01_comparable_total": round(sum(r01.values()), 3),
        "queries": r01,
        "sf": sf,
    }
    if cpus is not None:
        out["cpus"] = cpus
    if default_parallelism is not None:
        out["default_parallelism"] = default_parallelism
    if calib is not None:
        out["calib"] = calib  # fixed 2-key dict — stays O(1)-sized
    return json.dumps(out)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    load_all()
    spark = get_spark("hpml-bench", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    calib = machine_calibration(spark)

    # Warmup: tiny SF exercises the same plans (codegen cache, Arrow init).
    for name in HEADLINE:
        QUERIES[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    # Offline index builds, measured COLD and reported on their own
    # JSONL line (round 13, VERDICT r12 #5): the fingerprint-keyed
    # build memos (IVF centroids, PQ codebooks, IVFPQ index, PCA,
    # mixing quantizer, LSH width) model write-time artifacts, so the
    # timed medians below never see the build cost — this line pins
    # that amortized boundary with numbers. Side effect: the memos are
    # warm before run 1, so all n_runs measure the same serve-path
    # work (previously run 1 silently paid the builds and the median
    # dropped it).
    from hive_population_ml_spark.queries.similarity import (
        offline_build_ledger,
    )

    spark.sparkContext.setJobDescription("offline index builds (ledger)")
    ledger = offline_build_ledger(spark, sf_dir)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"index_build_sec": ledger, "sf_dir": sf_dir}))
    sys.stdout.flush()

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(n_runs):
        for name in HEADLINE:
            t0 = time.perf_counter()
            # noop sink: full execution of every row, zero write cost.
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs[name].append(time.perf_counter() - t0)

    def med(xs: list[float]) -> float:
        s = sorted(xs)
        return s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2

    timings = {name: round(med(ts), 3) for name, ts in runs.items()}
    spread = {
        name: {
            "min": round(min(ts), 3),
            "med": round(med(ts), 3),
            "max": round(max(ts), 3),
        }
        for name, ts in runs.items()
    }
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Registry-sized payloads (spread AND the full per-query median map)
    # go on their OWN earlier lines: the driver captures only a ~2,000-char
    # stdout tail and parses the LAST line, so the final line must stay
    # O(1)-sized regardless of registry growth. Round 4 broke this by
    # folding spread into the final line; round 7 re-broke it when the
    # 82-query median map alone outgrew the buffer (VERDICT r7 #1) — hence
    # the map now lives here and final_line() carries only the fixed
    # 15-entry r01-baseline subset.
    print(json.dumps({"spread": spread, "n_runs": n_runs}))
    print(json.dumps({"queries_full": timings}))
    sys.stdout.flush()
    print(final_line(
        timings,
        float(sf) if sf.replace(".", "").isdigit() else sf,
        calib,
        cpus=cpus,
        default_parallelism=spark.sparkContext.defaultParallelism,
    ))
    spark.stop()


if __name__ == "__main__":
    main()
