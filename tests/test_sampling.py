"""Sampling / data-mixing / PII operators: shadow-oracle differential
checks (same rigor as the driver's hash check, run here because these
queries sit past the driver's 50-entry window) plus semantic units."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hive_population_ml_spark.operators.sampling import (
    mixture_weights,
    pack_shards,
    stratified_sample,
    uniform_hash,
)
from hive_population_ml_spark.operators.textops import pii_count, pii_mask
from hive_population_ml_spark.testing import _normalize, duckdb_connection

# Round-5 rotation (VERDICT r4 #2): the 13 never-driver-checked shadow
# queries moved INTO the driver's 50-entry hash window (see
# queries/__init__.py::ROTATE_TO_ORACLE); 13 queries that were
# driver-green in ALL of rounds 1-4 ceded their slots and keep the
# identical differential contract here as shadow checks. Rotated out in
# earlier rounds (and still driver-green r1-r3): the first block below.
SHADOW_NAMES = [
    # r12 wave ceders (two-green r9 first-timers back in shadow —
    # queries/__init__.py ROTATE_TO_ORACLE comment)
    "text_bm25_topk",
    "a_assoc_rules",
    "a_rank_normalize",
    "split_stratified_exact",
    "a_benford_test",
    "a_survival_km",
    "a_ab_welch_test",
    "a_chi2_independence",
    "w_time_weighted_avg",
    "a_gini_value",
    "text_readability_ari",
    "a_autocorr_lag1",
    "a_seasonality_strength",
    "a_mann_whitney_u",
    "w_peak_detection",
    "a_spearman_trend",
    "a_mutual_info",
    "a_user_entropy",
    "a_quantile_bins",
    "w_streak_runs",
    "w_gap_stats",
    "a_psi_drift",
    "text_jsd_drift",
    "p_filter_project",
    "s2_union_provenance",
    "f_datetime_parts",
    "w1_ordered_head",
    "j5_semi_split",
    "a13_global_stats",
    "j2_key_normalize",
    "a9_distinct_counts",
    "a11_class_weights",
    "a14_weighted_mean",
    "w3_stride_subsample",
    "o4_top1_per_group",
    # round-5 rotation: ceded their driver slots after 4/4 green rounds
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
    # round-6 rotation (VERDICT r5 #3): text_chunk_tokens — the one
    # never-driver-checked SQL-expressible query — rotated INTO the
    # window; these multi-round-green queries ceded slots to it and the
    # round-6 additions.
    "text_pii_mask",
    "text_unigram_logprob",
    # second round-5 rotation wave: ceded slots to the new operators
    # (text_chunk_chars, text_tfidf_keywords, cdc_latest_state,
    # stream_session_window, text_inverted_index, a_outlier_iqr,
    # dedup_cluster_embedding, text_dup_spans)
    "p_null_guard_cast",
    "asof_nearest_ship",
    "w5_sequence_digest",
    "text_stats",
    "text_token_counts",
    "m1_standard_scale",
    "multimodal_bytes",
    "text_lang_id",
    # third wave: ceded to dedup_levenshtein, sample_weighted,
    # text_token_entropy, text_pmi_collocations, cdc_snapshot_diff
    "w_sessionize",
    "f_scalar_funcs",
    "m15_auc_roc",
    "text_repetition_filter",
    "j_outer_anti",
    # fourth wave: ceded to w_rolling_range, w_resample_ffill,
    # a_profile_table, a_funnel_conversion, a_retention_cohorts
    "m15_classification_metrics",
    "text_quality_profile",
    "m16_regression_metrics",
    "dedup_exact",
    "m_calibration",
    # round-7 rotation: longest-green incumbents ceded slots to
    # cdc_scd2_history, dedup_source_overlap, split_cluster_safe,
    # text_dsir_weights
    "w_session_window",
    "dedup_ngram_jaccard",
    "knn_bruteforce",
    "dedup_embedding_cosine",
    # second r7 rotation wave: multi-round-green incumbents ceding
    # slots to the five round-7 shadow-first queries (which rotated
    # INTO the window to earn their first driver hash rows)
    "text_decontaminate",
    "stream_windowed_agg",
    "corpus_clean_pipeline",
    "sample_stratified",
    "pack_token_shards",
    # round-8 rotation (VERDICT r7 #2): the five late-r7 shadow-first
    # queries (a_outlier_mad, a_histogram_value, a_corr_matrix,
    # text_token_contamination, text_remove_dup_spans) rotated INTO the
    # driver window for their first hash rows; these five 3-round-green
    # r5 incumbents ceded their slots and keep the identical hash-equal
    # contract here.
    "o_set_operations",
    "asof_forward_ship",
    "a_unpivot_user_stats",
    "dedup_incremental_ngram",
    "text_heavy_hitters_lang",
    # r8 second wave: the fifteen round-8 additions rotated INTO the
    # driver window (earning hash rows the round they were built); the
    # fifteen longest-green incumbents ceded and keep the identical
    # hash-equal contract here.
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
    # r8 third wave: the eight queries listed here until this wave
    # rotated INTO the driver window; these eight multi-round-green
    # incumbents ceded and keep the identical hash-equal contract here.
    "a_key_skew",
    "a_pivot_event_counts",
    "f_array_funcs",
    "f_json_funcs",
    "f_lambda_funcs",
    "text_dup_spans",
    "dedup_cluster_embedding",
    "a_retention_cohorts",
    # r8 fourth/fifth-wave rotation: the eleven new queries rotated
    # INTO the driver window (driver hash rows in their build round);
    # these eleven multi-round-green incumbents ceded and keep the
    # identical hash-equal contract here.
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
    "text_chunk_tokens",
    # r9 rotation (VERDICT r8 #1): the 25-query r8 shadow-first queue
    # (waves 6-14) rotated INTO the driver window; these 25 incumbents
    # ceded slots (8 multi-round-green + 17 one-green r8 first-timers,
    # forced by queue depth) and keep the identical hash contract here.
    "cdc_scd2_history",
    "dedup_source_overlap",
    "split_cluster_safe",
    "text_dsir_weights",
    "dedup_paragraph_exact",
    "text_source_kl",
    "mix_unimax_weights",
    "sample_quality_stratified",
]


def test_unigram_logprob_ranks_rarity(spark):
    from hive_population_ml_spark.operators.textops import unigram_logprob_score

    rows = [
        Row(doc_id=1, text="common common common common"),
        Row(doc_id=2, text="common common rare1 rare2"),
    ]
    out = {
        r["doc_id"]: r
        for r in unigram_logprob_score(spark.createDataFrame(rows)).collect()
    }
    # the rare-token doc must score a strictly higher mean NLL
    assert out[2]["avg_nll"] > out[1]["avg_nll"]
    assert out[1]["n_tokens"] == 4 and out[2]["n_tokens"] == 4


def test_shadow_list_is_complete():
    """Every registered shadow oracle is exercised here — adding a
    shadow query without its pytest differential check is the gap this
    guard closes."""
    from hive_population_ml_spark.queries import load_all
    from hive_population_ml_spark.queries.registry import SHADOW_ORACLE

    load_all()
    assert set(SHADOW_NAMES) == set(SHADOW_ORACLE)


from conftest import shadow_shard  # single source for shard assignment


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(
            n,
            marks=[
                getattr(pytest.mark, f"shadow_shard{shadow_shard(n)}"),
                # umbrella marker so tools/round_close.sh can collect
                # "everything that is NOT a shadow shard" as one group
                pytest.mark.shadow,
            ],
        )
        for n in SHADOW_NAMES
    ],
)
def test_shadow_oracle_differential(spark, sf_oracle_dir, name):
    from hive_population_ml_spark.queries import QUERIES, load_all
    from hive_population_ml_spark.queries.registry import SHADOW_ORACLE

    load_all()
    spark_df = QUERIES[name](spark, sf_oracle_dir).toPandas()
    assert len(spark_df) > 0, f"{name}: empty result — vacuous comparison"
    con = duckdb_connection(sf_oracle_dir)
    try:
        duck_df = con.execute(SHADOW_ORACLE[name]).df()
    finally:
        con.close()
    assert sorted(spark_df.columns) == sorted(duck_df.columns)
    assert len(spark_df) == len(duck_df)
    assert _normalize(spark_df) == _normalize(duck_df)


def test_stratified_sample_semantics(spark, sf_oracle_dir):
    from hive_population_ml_spark.io import Tables

    docs = Tables(spark, sf_oracle_dir).documents
    kept = stratified_sample(
        docs, "lang", {"en": 0.5}, id_col="doc_id", default_rate=1.0
    )
    n_all = docs.count()
    n_kept = kept.count()
    assert 0 < n_kept < n_all  # en really downsampled, others kept
    # deterministic: the same call selects the same rows
    ids1 = {r["doc_id"] for r in kept.select("doc_id").collect()}
    ids2 = {
        r["doc_id"]
        for r in stratified_sample(
            docs, "lang", {"en": 0.5}, id_col="doc_id", default_rate=1.0
        )
        .select("doc_id")
        .collect()
    }
    assert ids1 == ids2
    # non-en strata untouched at default_rate=1.0
    assert (
        kept.filter(F.col("lang") != "en").count()
        == docs.filter(F.col("lang") != "en").count()
    )
    # en keep-fraction lands near the rate (law of large numbers bound)
    n_en = docs.filter(F.col("lang") == "en").count()
    k_en = kept.filter(F.col("lang") == "en").count()
    assert abs(k_en / n_en - 0.5) < 0.1


def test_uniform_hash_modes(spark):
    df = spark.range(2000).select(
        uniform_hash("id", "minstd").alias("u1"),
        uniform_hash("id", "xxhash64").alias("u2"),
    )
    row = df.agg(
        F.min("u1"), F.max("u1"), F.avg("u1"), F.min("u2"), F.max("u2"), F.avg("u2")
    ).collect()[0]
    for lo, hi, mean in (row[0:3], row[3:6]):
        assert 0.0 <= lo and hi < 1.0
        assert 0.35 < mean < 0.65
    with pytest.raises(ValueError):
        uniform_hash("id", "nope")


def test_mixture_weights_temperature(spark, sf_oracle_dir):
    from hive_population_ml_spark.io import Tables

    docs = Tables(spark, sf_oracle_dir).documents
    flat = {r["lang"]: r for r in mixture_weights(docs, "lang", 0.0, 100).collect()}
    prop = {r["lang"]: r for r in mixture_weights(docs, "lang", 1.0, 100).collect()}
    # alpha=0 -> uniform p across strata
    ps = [r["p"] for r in flat.values()]
    assert max(ps) - min(ps) < 1e-9
    # alpha=1 -> p proportional to n
    total = sum(r["n_docs"] for r in prop.values())
    for r in prop.values():
        assert abs(r["p"] - r["n_docs"] / total) < 1e-9
    # probabilities sum to 1 in both
    assert abs(sum(ps) - 1.0) < 1e-9


def test_domain_mixture_weights_properties(spark, sf_oracle_dir):
    """Learned-domain temperature mixing: every embedded doc lands in
    exactly one cell (doc/token mass conserved), p sums to 1, alpha=1
    is proportional-to-token-mass, alpha=0 is uniform over non-empty
    cells, and the seeded fit is run-to-run deterministic."""
    from hive_population_ml_spark.io import Tables
    from hive_population_ml_spark.operators.sampling import domain_mixture_weights
    from hive_population_ml_spark.operators.textops import token_count

    t = Tables(spark, sf_oracle_dir)
    out = domain_mixture_weights(
        t.documents, t.embeddings, alpha=0.3, n_cells=8, seed=7
    ).collect()
    n_docs = t.documents.count()
    total_tokens = t.documents.select(
        F.sum(token_count("text"))
    ).collect()[0][0]
    assert sum(r["n_docs"] for r in out) == n_docs
    assert sum(r["n_tokens"] for r in out) == total_tokens
    assert abs(sum(r["p"] for r in out) - 1.0) < 1e-6
    # temperature extremes
    prop = domain_mixture_weights(
        t.documents, t.embeddings, alpha=1.0, n_cells=8, seed=7
    ).collect()
    for r in prop:
        assert abs(r["p"] - r["n_tokens"] / total_tokens) < 1e-6
    flat = domain_mixture_weights(
        t.documents, t.embeddings, alpha=0.0, n_cells=8, seed=7
    ).collect()
    ps = [r["p"] for r in flat]
    assert max(ps) - min(ps) < 1e-6
    # default target: half the corpus tokens in expectation
    expected = sum(r["rate"] * r["n_tokens"] for r in out)
    assert expected <= 0.5 * total_tokens + 1e-6
    # determinism
    again = domain_mixture_weights(
        t.documents, t.embeddings, alpha=0.3, n_cells=8, seed=7
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_pack_shards_hierarchical_matches_single_window(spark):
    # the two-level prefix sum (round 10: probe-caught whale-bucket fix)
    # must produce EXACTLY the single-window manifest; tiny chunk_width
    # forces many chunks incl. chunk boundaries mid-shard, sparse ord
    # gaps and a bucket smaller than one chunk
    import random

    rnd = random.Random(11)
    rows = []
    for b in ("en", "de", "fr"):
        ids = sorted(rnd.sample(range(10_000), 400 if b != "fr" else 3))
        rows += [(b, i, rnd.randint(1, 900)) for i in ids]
    # NULL-keyed rows (ADVICE r10): a NULL bucket is its own window
    # partition and ONE NULL ord per bucket is its own (NULL) chunk —
    # the two-level path's null-safe join must keep them, not drop them
    rows += [(None, i, rnd.randint(1, 900)) for i in (3, 99, 512, 9000)]
    rows += [("en", None, 250), (None, None, 250)]
    df = spark.createDataFrame(rows, "bucket string, doc_id long, n long")
    fast = pack_shards(df, "bucket", "n", budget=1500, order_col="doc_id",
                       chunk_width=64).collect()
    slow = pack_shards(df, "bucket", "n", budget=1500, order_col="doc_id",
                       chunk_width=None).collect()
    nk = lambda t: tuple((x is None, x) for x in t)  # None-safe sort
    assert sorted(map(tuple, fast), key=nk) == sorted(map(tuple, slow), key=nk)


def test_two_level_row_number_matches_direct_window(spark):
    # whale-group rank fix: must equal row_number over (group order by
    # u, id) + count over group EXACTLY, incl. u ties (forced by id
    # pairs hashing equal after abs()) and groups smaller than a chunk
    from pyspark.sql import Window

    from hive_population_ml_spark.operators.sampling import (
        two_level_row_number,
        uniform_hash,
    )

    import random

    rnd = random.Random(5)
    rows = [("g" + str(i % 3), i) for i in rnd.sample(range(100_000), 500)]
    rows += [("tiny", 7), ("tiny", -7)]  # abs() makes u collide -> tie
    # NULL group (ADVICE r10): its own window partition; the two-level
    # path's null-safe group join must rank it, not drop it
    rows += [(None, 11), (None, 42), (None, 77)]
    df = spark.createDataFrame(rows, "lang string, doc_id long")
    u = uniform_hash("doc_id", mode="minstd")
    got = two_level_row_number(df, "lang", u, "doc_id", n_chunks=16)
    w = Window.partitionBy("lang").orderBy(u.asc(), F.col("doc_id").asc())
    want = df.select(
        "lang",
        "doc_id",
        F.count("*").over(Window.partitionBy("lang")).alias("n"),
        F.row_number().over(w).alias("rk"),
    )
    nk = lambda t: tuple((x is None, x) for x in t)  # None-safe sort
    a = sorted(map(tuple, got.select("lang", "doc_id", "n", "rk").collect()),
               key=nk)
    b = sorted(map(tuple, want.collect()), key=nk)
    assert a == b


def test_pack_shards_budget_and_coverage(spark, sf_oracle_dir):
    from hive_population_ml_spark.io import Tables
    from hive_population_ml_spark.operators import textops

    docs = Tables(spark, sf_oracle_dir).documents
    manifest = pack_shards(
        docs, "lang", textops.token_count("text"), budget=2000, order_col="doc_id"
    ).collect()
    assert len(manifest) > 2  # multiple shards exist
    by_bucket: dict[str, list] = {}
    for r in manifest:
        by_bucket.setdefault(r["bucket"], []).append(r)
    max_doc_tokens = docs.select(
        F.max(textops.token_count("text"))
    ).collect()[0][0]
    total_docs = docs.count()
    assert sum(r["n_docs"] for r in manifest) == total_docs  # every doc assigned
    for bucket, shards in by_bucket.items():
        shards.sort(key=lambda r: r["shard_id"])
        # contiguous shard ids from 0
        assert [r["shard_id"] for r in shards] == list(range(len(shards)))
        # a shard overshoots the budget by at most one straddling doc
        for r in shards:
            assert r["total_tokens"] < 2000 + max_doc_tokens


def test_pii_mask_real_patterns(spark):
    rows = [
        Row(id=1, text="mail alice.smith+dev@corp-mail.co.uk and bob@x.io now"),
        Row(id=2, text="server at 192.168.001.42 port open"),
        Row(id=3, text="call +44 20-7946 0958 or 555-867-5309x"),
        Row(id=4, text="clean text with no identifiers at all"),
    ]
    df = spark.createDataFrame(rows)
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            pii_count("email", "text").alias("ne"),
            pii_count("ipv4", "text").alias("ni"),
            pii_count("phone", "text").alias("np"),
            pii_mask("text").alias("masked"),
        ).collect()
    }
    assert out[1]["ne"] == 2 and out[1]["masked"] == "mail <EMAIL> and <EMAIL> now"
    assert out[2]["ni"] == 1 and out[2]["masked"] == "server at <IP> port open"
    assert out[3]["np"] >= 1 and "<PHONE>" in out[3]["masked"]
    assert out[4]["masked"] == rows[3].text  # untouched


def test_calibration_report_closed_forms(spark):
    from hive_population_ml_spark.ml.metrics import calibration_report

    # perfectly calibrated by bin: within each bin, positive rate equals
    # the (constant) predicted probability -> ECE == 0 exactly.
    rows = []
    for b in range(10):
        ph = b / 10 + 0.05
        n_pos = b  # out of 10 docs: positive rate b/10 vs conf b/10+0.05
        rows += [Row(y=1, p=ph)] * n_pos + [Row(y=0, p=ph)] * (10 - n_pos)
    df = spark.createDataFrame(rows)
    out = calibration_report(df, "y", "p").collect()[0]
    assert out["n"] == 100 and out["n_bins_nonempty"] == 10
    assert abs(out["ece"] - 0.05) < 1e-9  # |conf-acc| = 0.05 in every bin

    # constant 0.5 on balanced labels: brier = 0.25, ece = 0
    bal = spark.createDataFrame([Row(y=i % 2, p=0.5) for i in range(100)])
    out = calibration_report(bal, "y", "p").collect()[0]
    assert abs(out["brier"] - 0.25) < 1e-9
    assert abs(out["ece"]) < 1e-9
    # p=1.0 lands in the top bin (least() guard), never bin 10
    edge = spark.createDataFrame([Row(y=1, p=1.0)])
    assert calibration_report(edge, "y", "p").collect()[0]["n_bins_nonempty"] == 1


def test_calibration_report_nan_policy(spark):
    """ADVICE r3: NaN/null probabilities previously diluted brier/ece
    silently (null bin sums skipped by the outer SUM, count(*) still in
    n). Default now raises like binned_rank_auc; drop mode excludes and
    reports n_dropped_nan with metrics equal to the clean subset's."""
    from hive_population_ml_spark.ml.metrics import calibration_report

    clean = [Row(y=i % 2, p=0.5) for i in range(100)]
    df = spark.createDataFrame(
        clean + [Row(y=1, p=float("nan")), Row(y=0, p=None)]
    )
    with pytest.raises(Exception, match="2 NaN/null probabilities"):
        calibration_report(df, "y", "p").collect()

    row = calibration_report(df, "y", "p", on_nan="drop").collect()[0]
    ref = calibration_report(
        spark.createDataFrame(clean), "y", "p"
    ).collect()[0]
    assert row["n_dropped_nan"] == 2 and row["n"] == 100
    assert row["brier"] == ref["brier"] and row["ece"] == ref["ece"]

    with pytest.raises(ValueError, match="on_nan"):
        calibration_report(df, "y", "p", on_nan="bogus")


def test_hll_sketches_accuracy_and_mergeability(spark, sf_oracle_dir):
    """Sketch estimates land within HLL error of exact counts, and the
    rollup of fine-grained sketches equals sketching the coarse level
    directly — the property that makes persisted partition sketches
    composable without raw-data rescans."""
    from hive_population_ml_spark.io import Tables
    from hive_population_ml_spark.operators.sketches import (
        distinct_sketches,
        rollup_sketches,
    )
    from hive_population_ml_spark.operators.textops import tokens

    tok = (
        Tables(spark, sf_oracle_dir)
        .documents.select("lang", "source", F.explode(tokens("text")).alias("t"))
    )
    exact = {
        r["lang"]: r["d"]
        for r in tok.groupBy("lang").agg(F.countDistinct("t").alias("d")).collect()
    }
    direct = {
        r["lang"]: r["est_distinct"]
        for r in distinct_sketches(tok, ["lang"], "t").collect()
    }
    rolled = {
        r["lang"]: r["est_distinct"]
        for r in rollup_sketches(
            distinct_sketches(tok, ["lang", "source"], "t"), ["lang"]
        ).collect()
    }
    assert set(exact) == set(direct) == set(rolled)
    for lang, d in exact.items():
        assert abs(direct[lang] - d) / d < 0.05, (lang, direct[lang], d)
        # merging per-source sketches must estimate the SAME set union
        assert rolled[lang] == direct[lang], (lang, rolled[lang], direct[lang])


def test_invalid_params_raise(spark):
    from hive_population_ml_spark.ml.metrics import calibration_report
    from hive_population_ml_spark.operators.sampling import pack_shards

    df = spark.createDataFrame([Row(b="x", n=3, o=1, y=1, p=0.5)])
    with pytest.raises(ValueError, match="budget"):
        pack_shards(df, "b", "n", budget=0, order_col="o")
    with pytest.raises(ValueError, match="n_bins"):
        calibration_report(df, "y", "p", n_bins=0)


def test_bottom_k_sample_prefilter_matches_exact(spark, sf_oracle_dir):
    """The count-broadcast prefilter is an OPTIMIZATION, never a
    semantic change: its output must equal the single-pass exact form
    row for row."""
    from hive_population_ml_spark.io import Tables
    from hive_population_ml_spark.operators.sampling import bottom_k_sample

    docs = Tables(spark, sf_oracle_dir).documents.select("doc_id", "lang")
    fast = bottom_k_sample(docs, "lang", k=7, id_col="doc_id")
    exact = bottom_k_sample(
        docs, "lang", k=7, id_col="doc_id", prefilter_safety=None
    )
    f = {(r["doc_id"], r["lang"], r["rk"]) for r in fast.collect()}
    e = {(r["doc_id"], r["lang"], r["rk"]) for r in exact.collect()}
    assert f == e and len(f) > 0


def test_bottom_k_sample_is_mergeable(spark):
    """Bottom-k sketch property: bottom-k(A ∪ B) == bottom-k of
    bottom-k(A) ∪ bottom-k(B) — per-shard samples roll up without
    rescanning raw data."""
    from hive_population_ml_spark.operators.sampling import bottom_k_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("g")
    )
    a = df.filter(F.col("doc_id") < 500)
    b = df.filter(F.col("doc_id") >= 500)
    whole = bottom_k_sample(df, "g", k=5, id_col="doc_id")
    parts = bottom_k_sample(
        bottom_k_sample(a, "g", k=5, id_col="doc_id")
        .select("doc_id", "g")
        .union(
            bottom_k_sample(b, "g", k=5, id_col="doc_id").select("doc_id", "g")
        ),
        "g",
        k=5,
        id_col="doc_id",
    )
    w = {(r["doc_id"], r["g"], r["rk"]) for r in whole.collect()}
    p = {(r["doc_id"], r["g"], r["rk"]) for r in parts.collect()}
    assert w == p and len(w) == 15


def test_bottom_k_sample_guards(spark):
    from hive_population_ml_spark.operators.sampling import bottom_k_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit("g").alias("g")
    )
    with pytest.raises(ValueError, match="k must be positive"):
        bottom_k_sample(df, "g", k=0, id_col="doc_id")
    # a starved prefilter must raise loudly, never silently under-sample
    with pytest.raises(ValueError, match="prefilter"):
        bottom_k_sample(df, "g", k=5, id_col="doc_id", prefilter_safety=0.01)


def test_bigram_logprob_ranks_transition_rarity(spark):
    """A doc whose TOKENS are all common but whose TRANSITIONS are
    improbable must score worse than a doc with common transitions —
    the signal unigram scoring cannot see."""
    from hive_population_ml_spark.operators.textops import bigram_logprob_score

    rows = [
        Row(doc_id=1, text="a b a b a b a b"),   # only (a,b)/(b,a): common
        Row(doc_id=2, text="a b a b a b a b"),
        Row(doc_id=3, text="b b a a b b a a"),   # rare transitions, same tokens
        Row(doc_id=4, text="x"),                 # single token: no bigrams
    ]
    out = {
        r["doc_id"]: r
        for r in bigram_logprob_score(spark.createDataFrame(rows)).collect()
    }
    assert 4 not in out  # excluded, mirrored by the oracle
    assert out[3]["avg_nll"] > out[1]["avg_nll"]
    assert out[1]["n_bigrams"] == 7


def test_unimax_waterfill_closed_form(spark):
    """Crafted corpus with known waterfill: caps [10, 10, 80] (1 epoch),
    budget 50 -> the two small strata saturate at 10, the big one gets
    the 30-token water level. With budget == total caps everyone
    saturates and weights sum to 1."""
    from hive_population_ml_spark.operators.sampling import unimax_weights

    def corpus(counts):
        rows = []
        for i, (lang, n) in enumerate(counts.items()):
            rows.append((i, lang, " ".join(["w"] * n)))
        return spark.createDataFrame(rows, "doc_id long, lang string, text string")

    docs = corpus({"a": 10, "b": 10, "c": 80})
    got = {
        r["lang"]: r
        for r in unimax_weights(
            docs, "lang", "text", budget_frac=0.5, epochs=1.0
        ).collect()
    }
    assert got["a"]["alloc"] == 10.0 and got["b"]["alloc"] == 10.0
    assert got["c"]["alloc"] == 30.0  # water level, below its cap of 80
    assert got["c"]["weight"] == 0.6
    assert abs(sum(r["weight"] for r in got.values()) - 1.0) < 1e-9

    full = {
        r["lang"]: r
        for r in unimax_weights(
            docs, "lang", "text", budget_frac=1.0, epochs=1.0
        ).collect()
    }
    # budget == sum of caps: every stratum saturates at its own cap
    assert all(full[s]["alloc"] == full[s]["cap"] for s in full)
    assert abs(sum(r["weight"] for r in full.values()) - 1.0) < 1e-9


def test_training_order_permutation_properties(spark, sf_oracle_dir):
    """(shard, pos) is a bijection onto the corpus: every doc exactly
    one slot, positions contiguous 1..|shard| per shard, shards roughly
    balanced, the whole labeling deterministic, and a different seed
    yields a genuinely different order."""
    from hive_population_ml_spark.operators.sampling import training_order

    docs = spark.read.parquet(f"{sf_oracle_dir}/documents.parquet")
    n = docs.count()
    out = training_order(docs, "doc_id", n_shards=8, seed=7).collect()
    assert len(out) == n
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(8))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    sizes = [len(v) for v in by_shard.values()]
    assert min(sizes) > 0.5 * n / 8  # no starved shard
    again = training_order(docs, "doc_id", n_shards=8, seed=7).collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in again} == {
        (r["doc_id"], r["shard"], r["pos"]) for r in out
    }
    other = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in training_order(docs, "doc_id", n_shards=8, seed=8).collect()
    }
    base = {r["doc_id"]: (r["shard"], r["pos"]) for r in out}
    moved = sum(1 for d in base if base[d] != other[d])
    assert moved > 0.5 * n  # the seed really permutes
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_shards"):
        training_order(docs, n_shards=0)


def test_materialize_epochs_multiset_semantics(spark):
    """Closed-form epoch materialization: epochs=2.0 -> exactly two
    copies of every doc (copy_idx 0,1); epochs=0.5 -> a deterministic
    strict subset with copy_idx 0 only; epochs=0 -> nothing (and no
    phantom rows from Spark's descending sequence(1,0)); two runs are
    identical."""
    from hive_population_ml_spark.operators.sampling import materialize_epochs

    docs = spark.createDataFrame(
        [(i, "a" if i < 40 else ("b" if i < 80 else "c")) for i in range(120)],
        "doc_id long, lang string",
    )
    eps = spark.createDataFrame(
        [("a", 2.0), ("b", 0.5), ("c", 0.0)], "lang string, epochs double"
    )
    out = materialize_epochs(docs, "lang", eps).collect()
    a = [r for r in out if r["lang"] == "a"]
    b = [r for r in out if r["lang"] == "b"]
    assert not [r for r in out if r["lang"] == "c"]
    assert len(a) == 80 and {r["copy_idx"] for r in a} == {0, 1}
    from collections import Counter

    per_doc = Counter(r["doc_id"] for r in a)
    assert all(v == 2 for v in per_doc.values())
    assert 0 < len(b) < 40 and all(r["copy_idx"] == 0 for r in b)
    again = materialize_epochs(docs, "lang", eps).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
