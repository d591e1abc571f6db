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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    load_all()
    spark = get_spark("hpml-bench", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: tiny SF exercises the same plans (codegen cache, Arrow init).
    for name in HEADLINE:
        QUERIES[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

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
    total = round(sum(timings.values()), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Spread (min/med/max per query) goes on its OWN earlier line: round 4's
    # driver artifact came back "parsed": null because folding spread into the
    # summary line pushed it past the driver's tail-capture buffer. The driver
    # parses the LAST stdout line, so the compact summary must be final and
    # small (well under ~4 KB).
    print(json.dumps({"spread": spread, "n_runs": n_runs}))
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
