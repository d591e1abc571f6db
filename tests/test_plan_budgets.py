"""Shuffle-budget regression guard for the bench headline set.

Every Exchange is a full shuffle of its input; a change that silently
adds one to a headline query is exactly the class of regression that is
invisible at sf0.01 correctness and catastrophic at 100 TB. Budgets are
the exchange counts of the audited plans (PERFORMANCE.md "Per-query
plan shape") — a plan may come in UNDER budget (AQE, broadcast
conversion), never over.

If a legitimate redesign raises a count, change the budget in the same
commit and say why in PERFORMANCE.md.
"""

import pytest

EXCHANGE_BUDGETS = {
    # canonicalize is a pure map; ONE agg exchange + the sort exchange
    "url_normalize_dedup": 2,
    # robots parse runs on the TINY rules table (one robots.txt per
    # host): block-attribution window + agents x rules join exchanges
    # are all rules-sized; the URL stream itself sees only the
    # broadcast join, the per-URL argmax agg and the final sort
    "url_robots_filter": 8,
    # profile bundle is a pure map — only the orderBy range exchange
    "code_quality_profile": 1,
    # conditional encode/decode repair is a pure map — orderBy only
    "text_fix_mojibake": 1,
    # chunking is a map-only posexplode — any Exchange is a regression
    "text_chunk_chars": 0,
    "text_chunk_tokens": 0,
    # tf agg + term-df window + doc top-k window + 1-row N broadcast
    # (+ its BroadcastNestedLoop marker); corpus text scans ONCE —
    # df-as-window avoids the agg+join form whose pruned subtrees
    # defeat exchange reuse and scan the corpus twice
    "text_tfidf_keywords": 5,
    # ONE partial max_by shuffle (no window sort of full history)
    "cdc_latest_state": 1,
    # iterative; localCheckpoint truncates lineage — final plan is the
    # checkpointed rank table projection
    "graph_pagerank": 0,
    # ONE vocab-keyed agg; df derived from the collected postings (a
    # count_distinct would add a (term,doc) pre-agg exchange)
    "text_inverted_index": 1,
    # quartile agg + flag agg + fence BroadcastExchange
    "a_outlier_iqr": 4,
    # block-key equi-join (one shuffle per side) + the now-ACTIVE
    # fractional hot-block guard's count window and 1-row n broadcast
    # (r7: the registered query passes max_block_frac=0.1 so the Spark
    # guard matches the oracle's bc filter instead of being oracle-only)
    "dedup_levenshtein": 7,
    # map-side keys + one rank window
    "sample_weighted": 1,
    # (doc,token) partial agg + doc agg
    "text_token_entropy": 2,
    # bigram agg + unigram agg + 4 broadcast scalars/vocab + TakeOrdered
    "text_pmi_collocations": 9,
    # full-outer join: one co-partitioned shuffle per snapshot side
    # (+1 when AQE re-plans the union side)
    "cdc_snapshot_diff": 3,
    # train word-count pass runs in its own jobs; segmentation is a
    # mapInPandas over the vocab agg
    "text_bpe_segment": 1,
    # fit is memoized offline; scoring is a map-only transform chain
    "text_quality_clf_scores": 0,
    # one (user) sort shuffle serves all three range-frame aggregates
    "w_rolling_range": 1,
    # bounds agg + daily agg + grid join + ffill window share the
    # user_id partitioning where Catalyst can prove it
    "w_resample_ffill": 4,
    # ONE scan aggregation (3 count_distincts expand it) + stack unpivot
    "a_profile_table": 4,
    # three first-touch aggs chained on user_id + 1-row count joins +
    # the BroadcastNestedLoop markers on the three count crossJoins
    "a_funnel_conversion": 13,
    # first-touch agg + distinct + cell agg on shared user partitioning
    "a_retention_cohorts": 4,
    "flagship_interval_stats": 3,
    "a1_stats_bundle": 1,
    "a3_temporal_deltas": 1,
    # one user_id repartition serves both agg-of-agg chains (was 5)
    "a5_calendar_reagg": 3,
    "asof_nearest_ship": 3,
    # 5 BroadcastExchange (every dim broadcasts) + the final agg shuffle
    "j_multiway_revenue": 6,
    # per-key windows over the filtered slice share one partitioning
    "w_rank_functions": 1,
    # two distinct sets + intersect/except semi/anti joins + 1-row aggs
    "o_set_operations": 7,
    # grouping-set expand feeds ONE 2-phase agg
    "a_cube_revenue": 1,
    # whole constraint suite = one aggregation (plan-asserted single scan)
    "quality_constraint_report": 2,
    # pivot agg + totals agg + join back
    "a_pivot_event_counts": 4,
    "a_key_skew": 2,
    "m16_regression_metrics": 3,
    "dedup_exact": 1,
    # bucket agg + pair agg, plus the r12 _frac_cap subtree: the
    # fractional df-cap's count() driver JOB became an inline 1-row
    # count (SinglePartition agg + IdentityBroadcast) — 2 more plan
    # exchanges that move ONE row each, for one fewer full execution
    # of the shingle scan per build
    "dedup_ngram_jaccard": 4,
    # candidate table localCheckpoint'd (it feeds two consumers);
    # remaining: banding agg + verify chain (was 14 pre-checkpoint)
    "dedup_minhash_lsh": 6,
    # iterative: localCheckpoint truncates lineage, so the final plan
    # only shows the assignment join; per-iteration shuffles are bounded
    # by the shrinking edge list (operators/components.py docstring)
    "dedup_cluster_components": 2,
    "dedup_simhash": 7,
    "dedup_embedding_cosine": 3,
    "knn_bruteforce": 2,
    "ann_lsh": 3,
    "ann_ivf": 8,
    # codes scan is map-side (mapInPandas); shortlist window + the two
    # rerank joins (shortlist side tiny -> AQE broadcasts)
    "ann_pq": 4,
    # same shape as ann_pq: map-side code scan, shortlist window, two
    # AQE-broadcast rerank joins; cell probing changes IO, not shuffles
    "ann_ivfpq": 4,
    "text_quality_profile": 0,
    "text_repetition_filter": 0,
    "text_decontaminate": 4,
    # benchmark-side distinct (tiny side) + count_distinct's two-phase
    # (doc,pos) agg + the id-keyed SMJ back to per-doc token counts
    "text_token_contamination": 5,
    # span-hash agg, occurrence<->dup-span rejoin on the same hash,
    # removed-position set agg, id-keyed join to the token arrays;
    # reconstruction itself is a pure map (lambda filter, no sort)
    "text_remove_dup_spans": 4,
    # probe is a pure map against the plan-literal bitset; the build's
    # 2 bounded shuffles run in the bloom_bits_literal collect job
    "text_decontaminate_bloom": 0,
    # vocabulary-bounded partial agg; top-k is TakeOrdered, not a sort
    "text_heavy_hitters": 1,
    # span explode is map-side; count_distinct splits the one agg into
    # two phases (by (hash, doc) then hash); top-N is TakeOrdered
    "text_dup_spans": 2,
    # training runs in its own jobs (word-count pass + vocab merge
    # loop); the returned merge table is a local relation
    "text_bpe_merges": 0,
    # count agg + count BroadcastExchange + per-group rank window
    "sample_group_bottomk": 3,
    # ngram pair shuffles live behind the components localCheckpoint;
    # final plan shows only the corpus assignment join
    "dedup_cluster_ngram": 2,
    # same closure tail; the cell-assignment window + within-cell pack
    # shuffles run inside the checkpoint job
    "dedup_semantic": 2,
    "text_pii_mask": 0,
    # vocab table checkpointed (feeds total + scoring join): was 6
    "text_unigram_logprob": 4,
    # bigram model table checkpointed (feeds rollup + scoring join):
    # pair agg shuffles live in the checkpoint job; was 6
    "text_bigram_logprob": 4,
    "sample_stratified": 0,
    # round-7 additions (VERDICT r6 #3): the five r6 registrations plus
    # cdc_scd2_history get budgets the same commit they join HEADLINE.
    # one group agg (approx_percentile partial+final)
    "a_percentiles_approx": 1,
    # sketch quartile agg + flag agg + fence BroadcastExchange (one
    # fewer than the exact form's 4: no exact-percentile sort agg)
    "a_outlier_iqr_approx": 3,
    # ONE scan aggregation (HLL approx_count_distinct keeps it single)
    "a_profile_table_approx": 1,
    # packed code-block agg + packed query-block agg + block-grid join
    # sides + shortlist window + rerank join (AQE-broadcast)
    "ann_pq_distributed": 6,
    # 3 block-key equi-join passes + per-pass block-count window for the
    # absolute max_block_rows cap (the round-7 100x-probe fix: uncapped,
    # the constant-cardinality length-band key went 1047x at 100x data;
    # capped, 3.9x) + the dropDuplicates agg. The 6 extra exchanges buy
    # the Θ(n²/|keys|) -> linear bound; AQE re-plans to 7 at scale.
    "dedup_levenshtein_multipass": 10,
    # ONE hash exchange + one sort serves both SCD2 windows
    "cdc_scd2_history": 1,
    # probe-LUT block agg + cell-partitioned code-block agg + the cell
    # EQUI-join sides (never a cross grid) + shortlist window + rerank
    # join (AQE-broadcast) + the two per-cell histogram aggs/broadcasts
    # that derive block counts from MEASURED cell sizes (r7 skew fix:
    # a hot cell gets more bounded blocks, never one giant packed task)
    "ann_ivfpq_distributed": 10,
    # (group, shingle) distinct localCheckpoint'd (3 consumers); then
    # shingle self-join sides + (g1,g2) agg + 2 size BroadcastExchange
    "dedup_source_overlap": 6,
    # closure behind the components localCheckpoint; final plan is the
    # assignment join + the map-side minstd split projection
    "split_cluster_safe": 2,
    # raw/target vocab aggs localCheckpoint'd; token-join sides + the
    # 1-row totals broadcast + final per-doc agg
    "text_dsir_weights": 7,
    # cell build (1, partial-agg'd to depth*width keys) + exact top-20
    # probe agg + broadcast of the tiny sketch into the estimate join
    "sketch_token_freq_cms": 3,
    # map-side chunk posexplode + ONE hash-grouped agg (count_distinct
    # splits it into two phases)
    "dedup_paragraph_exact": 2,
    # score + band + hash-keep are all map-side — any Exchange is a
    # regression (same contract as sample_stratified)
    "sample_quality_stratified": 0,
    # vocab agg (checkpointed) + (g,t) agg + totals broadcast + the
    # vocab x groups expansion join + final per-group agg
    "text_source_kl": 7,
    # median agg + deviation-median agg + flag agg + the two per-group
    # table broadcasts
    "a_outlier_mad": 5,
    # bounds agg + bounds broadcast + bucket-count agg
    "a_histogram_value": 3,
    # ONE scan aggregation (all six corr moment bundles); the unpivot
    # is map-side
    "a_corr_matrix": 1,
    # history + batch signature aggs feed the (band, bh) equi-join;
    # candidate distinct + best-match max_by agg
    "dedup_incremental_minhash": 4,
    # PCA fit runs in its own (memoized, sample-bounded) jobs; the
    # projection itself is a map-side matvec — pure scan
    "embedding_pca": 0,
    # round-10 two-level scan rewrite (PERFORMANCE.md "whale-bucket
    # window" entry: 114.9x -> 7.9x at 1000x): chunk-stats agg +
    # offset-table broadcast join replace the single whale window,
    # adding 3 exchanges by design
    "pack_token_shards": 5,
    "sketch_distinct_tokens": 2,
    "sketch_value_quantiles": 1,
    "m_calibration": 4,
    "w5_sequence_digest": 1,
    "w_sessionize": 1,
    # round-8 additions: semantic decontaminate = broadcast cross join
    # + one partial-aggregated max_by exchange (+1 AQE read); ccnet =
    # checkpointed score table -> cut agg + broadcast label pass;
    # winsorize = band agg + broadcast join + stats agg
    "text_semantic_decontaminate": 2,
    "text_ccnet_buckets": 2,
    "a_winsorized_stats": 3,
    # closure's 2 + the quality equi-join + ONE window-max exchange
    "dedup_cluster_keeper_quality": 4,
    # map-side Lehmer shard key + ONE shard-keyed rank window
    "sample_training_order": 1,
    # span-hash count agg + windows re-keyed semi-join on the same hash
    # + per-doc agg + id-keyed join to window counts
    "text_duplication_score": 4,
    # bloom-pruned probe (map-side filter, NO exchange) + dim broadcast
    # + ONE returnflag agg; at sf0.01 AQE broadcasts the dim rows too
    "j_bloom_pruned": 2,
    # decorrelated per-partkey avg agg + its broadcast back to the
    # brand-filtered probe + part dim broadcast + 1-row final agg
    "j_correlated_subquery": 4,
    # one user_id agg per slice; the full-outer merge join REUSES that
    # hash partitioning (plan-proved — zero join exchanges)
    "incr_stats_merge": 2,
    # 4 one-row artifact aggs (docs x2 scalars share a pass) + the
    # broadcast del-key anti-join legs + 1-row cross-join assembly
    "gdpr_delete_cascade": 9,
    # df-count agg + per-doc rank window + prefix bucket agg + the
    # positional-filter pair agg + per-doc array agg + the two verify
    # joins keyed d1/d2. One MORE exchange than the r8 row-form (the
    # per-doc shingle-array agg) buys away the post-join 16M-row
    # (d1,d2) hash agg entirely: 8.59s -> 1.84s at sf0.1.
    "dedup_jaccard_prefix": 9,
    # ONE 2-phase hash agg: regr_* states are fixed-size and partially
    # aggregated — per-key OLS with no per-group loop
    "a_trend_fit": 1,
    # ONE hash exchange: sorted collect_list + Catalyst aggregate fold
    "w_ewma": 1,
    # day-grain distinct agg + explode + window count_distinct (2-phase
    # expands it) + broadcast day-dim semi-join
    "w_sliding_distinct": 5,
    # ONE (user) sort shuffle serves lag + running sum; session collect
    # and the per-user rollup reuse the user partitioning
    "w_pattern_match": 1,
    # ONE user-hash sort shuffle feeds both gaps-and-islands windows;
    # the (user, island) agg REUSES that partitioning (plan-proved)
    "w_interval_merge": 1,
    # bucket agg + pair agg; the directed projection is a pure map
    # (2-struct explode), no third shuffle. +2 in r12: the _frac_cap
    # inline 1-row count subtree (see dedup_ngram_jaccard)
    "dedup_containment": 4,
    # per-doc window sets dedup map-side (array_distinct pre-explode);
    # span-hash min-owner agg + owner re-agg + the novel-count
    # broadcast back to the map-side (id, n_windows) base
    "text_ngram_novelty": 3,
    # centroid fit runs in its own bounded-sample jobs; assignment is a
    # zero-exchange GEMM map; ONE doc-keyed join (2 exchanges) + ONE
    # cell agg; the temperature windows run over the ~sqrt(n)-row cell
    # table (their single-partition exchanges are cell-table-sized)
    "mix_domain_clusters": 5,
    # ONE sketch agg on source (fixed ~16KiB state per group through
    # the exchange) + the broadcast pair join + AQE read — vs the exact
    # form's distinct+checkpoint+self-join
    "dedup_source_overlap_hll": 3,
    # doc<->emb equi-join (one exchange per side) + the (group, dim)
    # partial agg + dim re-agg + global-centroid broadcast + final
    # groups-x-dims agg (+1 AQE read) — everything after the join is
    # corpus-size-free (groups x dims rows)
    "emb_source_drift": 7,
    # two 4x8192-cell sketch aggs (partial-aggregated; shuffle carries
    # <= depth*width rows) + the tiny cell equi-join + the depth-row
    # left join that keeps ip=0 rows in the min (disjoint-input
    # correctness) + 1-row aggs and their crossJoin assembly — NO
    # shuffle of the probed input on the join key, the operator's point
    "j_size_estimate_cms": 9,
    # ONE stratum-count agg + its 5-row global window exchange + the
    # epochs broadcast back onto the corpus; the copy expansion is a
    # map-side sequence+explode, no shuffle of its own
    "sample_epoch_materialize": 3,
    # chunk explode + per-chunk vote are map-side; ONE (id, pred) count
    # agg + the per-doc majority window re-keyed on id (final agg
    # reuses it)
    "text_mixed_lang": 2,
    # the closure's audited 2 (behind its localCheckpoint) + the
    # cluster-size agg + the histogram agg over one-row-per-cluster
    "dedup_cluster_sizes": 4,
    # (type, user) min agg + (type, day) agg + the per-type cumsum
    # window over the #types x #days table
    "w_cumulative_distinct": 3,
    # round-8 fourth wave ------------------------------------------------
    # ONE user_id exchange: sorted + partition windows and the max_by
    # agg all reuse it
    "w_cusum_changepoint": 1,
    # map-side slot explode collapses via partial agg; one hash agg
    "w_hopping_window": 1,
    # sessionize sort shuffle (path agg reuses it) + path-count agg;
    # top-50 is TakeOrderedAndProject
    "w_session_paths": 2,
    # base compaction max_by + merged max_by (union is exchange-free)
    "cdc_merge_upsert": 2,
    # per-source table checkpointed (corpus token scan runs once); the
    # rest are tens-row single-partition aggs + two BroadcastExchanges
    "mix_concentration": 6,
    # (group, rep) partial agg + across-rep agg + obs agg +
    # BroadcastExchange for the final tiny join
    "a_bootstrap_ci": 4,
    # pure map — any Exchange is a regression
    "text_lexical_diversity": 0,
    # ONE group-key exchange: RANGE-frame cum window, partition totals,
    # and the final agg all reuse it
    "a_ks_test": 1,
    # (lang, token) freq agg; per-lang rank window + regr agg reuse the
    # lang partitioning
    "text_zipf_slope": 2,
    # ONE key exchange + sort; moving-frame percentile is frame-local
    "w_rolling_median": 1,
    # r8 sixth wave -------------------------------------------------------
    # two corpus passes by design (doc-length stats pass + postings
    # pass filtered to the query terms); remaining exchanges are the
    # tiny df/stats broadcasts, the doc_id join, and TakeOrdered
    "text_bm25_topk": 8,
    # basket table checkpointed (distinct agg feeds 4 consumers);
    # user-keyed self-join sides + pair agg + 3 broadcasts
    "a_assoc_rules": 9,
    # bounds agg broadcast + (group,bin,sample) hash agg + cumsum
    # window + final agg over the #groups x 256 grid
    "a_ks_test_binned": 4,
    # seed-only projection: pure Arrow mapInPandas map — any Exchange
    # is a regression
    "emb_jl_project": 0,
    # ONE group-key exchange + sort (percent_rank shares it)
    "a_rank_normalize": 1,
    # the exact prefix-join path's full plan (its own budget is 8-9;
    # the LSH side hides behind its candidate checkpoint) + the
    # tiny-pair full-outer join + 1-row agg
    "dedup_recall_report": 16,
    # round-10 two-level rank rewrite (PERFORMANCE.md: single-task
    # stratum rank 13.1x -> 2.2x at 1000x): per-chunk rank agg +
    # chunk-offset broadcast replace the ONE whale stratum window,
    # adding 4 exchanges by design
    "split_stratified_exact": 5,
    # 9-group digit agg + 1-row total (agg + its BroadcastExchange +
    # the BroadcastNestedLoop marker on the crossJoin)
    "a_benford_test": 4,
    # per-user lead() sort shuffle + lifetime agg + the single-partition
    # window over the tiny distinct-gap table
    "a_survival_km": 3,
    # bigram + unigram model tables checkpointed (each feeds a rollup
    # and/or the scoring join); remaining: bigram scoring joins on
    # vocab keys + doc agg + the 1-row token-total broadcast
    "text_lm_interpolated": 7,
    # transition grid checkpointed (windows collapse to ONE user-key
    # exchange inside its job); remaining: row-total rollup + broadcast
    "a_markov_transitions": 2,
    # ONE pass builds per-type sketches (checkpointed); pair matrix is
    # a crossJoin of the #types-row sketch table
    "sketch_user_overlap_hll": 1,
    # ONE (group, variant) moment agg (checkpointed); the A-vs-B
    # pairing self-joins that tiny table
    "a_ab_welch_test": 1,
    # R x C grid agg checkpointed; margins/total are tiny-grid rollups
    # + their BroadcastExchanges
    "a_chi2_independence": 6,
    # ONE key exchange + sort; lead + agg reuse it
    "w_time_weighted_avg": 1,
    # ONE group exchange + sort; rank, partition totals, agg share it
    "a_gini_value": 1,
    # pure map — any Exchange is a regression
    "text_readability_ari": 0,
    # ONE key exchange + sort; lag + closed-form corr agg reuse it
    "a_autocorr_lag1": 1,
    # (group, weekday) sufficient-stats agg + tens-row rollup + its
    # BroadcastExchange + final agg
    "a_seasonality_strength": 5,
    # zlib inside one Arrow mapInPandas scan — any Exchange is a
    # regression
    "text_compressibility": 0,
    # distance grid is a zero-exchange mapInPandas scan; ONE cell agg
    # (training shuffles run in the bounded-sample KMeans fit jobs)
    "mix_cluster_silhouette": 1,
    # ONE group exchange: rank sort + the (group, value) tie window
    # (partition refinement) + rollup all reuse it
    "a_mann_whitney_u": 1,
    # ONE key exchange + sort serves rn/lag/lead; rollup reuses it
    "w_peak_detection": 1,
    # ONE group exchange serves both rank sorts + tie windows + rollup
    "a_spearman_trend": 1,
    # corpus sees ONE partial-agg exchange; the other 7 are aggs/
    # broadcasts/countDistinct expansion over the <=|langs|*|sources|
    # contingency table (tiny by construction)
    "a_mutual_info": 8,
    # (user, type) partial agg + user window; rollup reuses the window
    # partitioning
    "a_user_entropy": 2,
    # ONE group exchange serves the ntile sort; (group, decile) rollup
    # refines the same partitioning
    "a_quantile_bins": 1,
    # user-key exchange serves both row_numbers (second window refines
    # the first); run agg + type rollup partial-aggregate
    "w_streak_runs": 2,
    # ONE user-key exchange serves the lag sort and the per-user rollup
    "w_gap_stats": 1,
    # group-key ntile sort + (group,bucket,half) partial agg + the tiny
    # min/max agg whose result broadcasts back; PSI rollup runs on the
    # <=|groups|*10 pivot
    "a_psi_drift": 3,
    # same expansion as text_source_kl: vocab agg + (group,token) agg +
    # group-totals broadcast chain
    "text_jsd_drift": 7,
    # GK cutpoint agg (1) + map-side decile labels off the broadcast
    # (BroadcastExchange) + (group,decile) partial agg (1) — NO ntile
    # sort; the whole point of the sketch twin
    "a_quantile_bins_approx": 3,
    # GK 255-cutpoint agg (1+bcast) + map-side cell labels — no sort,
    # no second agg: the whole query is one sketch agg + one projection
    "a_rank_normalize_approx": 2,
    # GK cutpoints (1+bcast) + (group,bin) agg (1) + tiny trapezoid
    # window on the <=64-row-per-group grid (1)
    "a_gini_value_approx": 4,
    # min/max (1+bcast) + (group,bin) agg (1) + cum-before window on
    # the 256-bin grid (1)
    "a_mann_whitney_binned": 4,
    # GK median (1+bcast) + min/max (1+bcast) + (group,bucket) agg +
    # the group-total window on the <=groups*10 pivot
    "a_psi_drift_approx": 6,
}


def test_headline_set_is_budgeted():
    import bench

    missing = set(bench.HEADLINE) - set(EXCHANGE_BUDGETS)
    assert not missing, f"headline queries without a shuffle budget: {missing}"


def test_every_registered_query_is_timed_or_declared_untimed():
    """VERDICT r6 #3: iterate the REGISTRY, not the headline list — a
    new registration must either join the bench (and therefore, via
    test_headline_set_is_budgeted, carry an exchange budget) or appear
    in bench.DECLARED_UNTIMED with a stated reason. No third bucket."""
    import bench

    from hive_population_ml_spark.queries import QUERIES, load_all

    load_all()
    headline = set(bench.HEADLINE)
    untimed = set(bench.DECLARED_UNTIMED)
    both = headline & untimed
    assert not both, f"queries both timed and declared-untimed: {both}"
    uncovered = set(QUERIES) - headline - untimed
    assert not uncovered, (
        f"registered queries with neither a bench row nor a declared "
        f"untimed reason: {sorted(uncovered)}"
    )
    stale = untimed - set(QUERIES)
    assert not stale, f"DECLARED_UNTIMED entries not in the registry: {stale}"


# Round-12 narrow-scan fan-out (operators/parallelism.py::fan_out):
# heavy per-row map sites round-robin-repartition a scan that planned
# fewer partitions than defaultParallelism. Those exchanges are
# DELIBERATE, keyless (RoundRobinPartitioning / REPARTITION_BY_NUM),
# move only the tiny narrow projection they sit on, and no-op on any
# real multi-row-group table — so they must not consume the budget
# that guards against *data-moving* shuffles (hash/range/
# ENSURE_REQUIREMENTS), which is what explodes at 100 TB. They get
# their own cap instead so keyless repartitions can't proliferate
# unnoticed either. Composition queries that chain several fanned
# stages get an explicit audited pin.
# Round 13 (ADVICE r12 #4): the cap defaults to ZERO — a query with no
# fan-out today cannot grow one unnoticed — and every fanned query pins
# its EXACT current count below (regenerated from a full plan census;
# checkpointed subtrees hide their internal fan-outs from the executed
# plan, which is why composition queries read lower than their stage
# count). FANOUT_CAPS is the only escape hatch.
FANOUT_CAP = 0
FANOUT_CAPS = {
    "a_bootstrap_ci": 2,
    "a_gini_value_approx": 1,
    "a_rank_normalize_approx": 1,
    "ann_ivfpq": 1,
    "ann_lsh": 2,
    "ann_pq": 1,
    "ann_pq_distributed": 1,
    "code_quality_profile": 1,
    "dedup_containment": 1,
    "dedup_incremental_minhash": 2,
    "dedup_minhash_lsh": 1,
    "dedup_ngram_jaccard": 1,
    "dedup_paragraph_exact": 1,
    "dedup_recall_report": 1,
    "emb_jl_project": 1,
    "embedding_pca": 1,
    "knn_bruteforce": 1,
    "mix_cluster_silhouette": 1,
    "text_chunk_chars": 1,
    "text_chunk_tokens": 1,
    "text_compressibility": 1,
    "text_decontaminate": 1,
    "text_decontaminate_bloom": 1,
    "text_dsir_weights": 1,
    "text_dup_spans": 1,
    "text_duplication_score": 3,
    "text_fix_mojibake": 1,
    "text_heavy_hitters": 1,
    "text_inverted_index": 1,
    "text_jsd_drift": 2,
    "text_mixed_lang": 1,
    "text_ngram_novelty": 2,
    "text_pmi_collocations": 5,
    "text_remove_dup_spans": 3,
    "text_repetition_filter": 1,
    "text_semantic_decontaminate": 1,
    "text_source_kl": 2,
    "text_tfidf_keywords": 1,
    "text_token_contamination": 2,
    "text_token_entropy": 1,
    "text_unigram_logprob": 1,
    "url_normalize_dedup": 1,
    "url_robots_filter": 1,
}


def _classify_exchanges(plan: str) -> tuple[int, int]:
    """(non-fan-out exchanges, round-robin fan-out exchanges).

    The first count is every ``Exchange`` node that is NOT a deliberate
    round-robin fan-out — i.e. hash/range/single-partition shuffles
    PLUS Broadcast/Reused exchange nodes (substring match; the budgets
    below are calibrated to that long-standing convention, so a new
    broadcast build also consumes budget — intentional, it is a real
    job at scale)."""
    total = plan.count("Exchange")
    fanout = plan.count("Exchange RoundRobinPartitioning")
    return total - fanout, fanout


@pytest.mark.parametrize("name", sorted(EXCHANGE_BUDGETS))
def test_exchange_budget(spark, sf_oracle_dir, name):
    from hive_population_ml_spark.queries import QUERIES, load_all

    load_all()
    plan = (
        QUERIES[name](spark, sf_oracle_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n, n_fanout = _classify_exchanges(plan)
    assert n <= EXCHANGE_BUDGETS[name], (
        f"{name}: {n} data-moving exchanges > budget "
        f"{EXCHANGE_BUDGETS[name]} — a new shuffle crept into the plan:\n"
        f"{plan[:4000]}"
    )
    cap = FANOUT_CAPS.get(name, FANOUT_CAP)
    assert n_fanout <= cap, (
        f"{name}: {n_fanout} round-robin repartitions > cap {cap} — "
        f"keyless repartition(n) calls are multiplying:\n{plan[:4000]}"
    )
