"""CLI train/evaluate round-trip (SURVEY.md §3.1/§3.3 entry points)."""

import os
import tempfile

from pyspark.sql import functions as F

from hive_population_ml_spark.cli import main


def test_cli_train_then_evaluate(spark, sf_dir):
    with tempfile.TemporaryDirectory() as d:
        run = os.path.join(d, "run1")
        out = main(
            [
                "train",
                "--data-dir", sf_dir,
                "--output-dir", run,
                "--model", "gradient_boosting",
                "--task-type", "regression",
                "--window-days", "30",
                "--min-count", "1",
                "--seed", "42",
            ]
        )
        assert out["n"] > 0 and out["rmse"] > 0
        assert os.path.isdir(os.path.join(run, "model"))
        assert os.path.isdir(os.path.join(run, "results_json"))
        assert os.path.isdir(os.path.join(run, "predictions"))

        ev = main(
            [
                "evaluate",
                "--data-dir", sf_dir,
                "--output-dir", os.path.join(run, "eval"),
                "--model-dir", os.path.join(run, "model"),
                "--task-type", "regression",
                "--window-days", "30",
                "--min-count", "1",
            ]
        )
        # checkpoint-reload reproduces the training-time test metrics
        assert ev["n"] == out["n"]
        assert abs(ev["rmse"] - out["rmse"]) < 1e-9


def test_cli_train_lstm_stages_sequence_shards(spark, sf_dir):
    """--model lstm parity (reference train.py:143-167): Spark stages
    the sequence tensors; --stage-only covers torch-less drivers."""
    import json

    from pyspark.sql import functions as F

    with tempfile.TemporaryDirectory() as d:
        run = os.path.join(d, "seqrun")
        out = main(
            [
                "train",
                "--data-dir", sf_dir,
                "--output-dir", run,
                "--model", "lstm",
                "--task-type", "regression",
                "--window-days", "30",
                "--min-count", "1",
                "--stage-only",
            ]
        )
        assert out["model"] == "lstm"
        with open(os.path.join(run, "sequence_spec.json")) as f:
            meta = json.load(f)
        assert meta["spec"]["model"] == "lstm" and meta["label"] == "target"
        staged = spark.read.parquet(meta["staged"]["train"])
        assert {"anchor_orderkey", "seq_len", "seq", "label"} <= set(staged.columns)
        assert staged.count() > 0
        assert staged.filter(F.col("label").isNull()).count() == 0
        # padded tensor: every row the same (max_len x 3) shape
        sizes = staged.select(F.size("seq").alias("s")).distinct().collect()
        assert len(sizes) == 1
        width = staged.select(F.size(F.element_at("seq", 1)).alias("w")).first()["w"]
        assert width == 3  # price, qty, disc


def test_cli_prep_pipeline(spark, sf_dir, tmp_path):
    """prep writes a deduped/masked/gated corpus, a token-budget shard
    manifest that exactly covers it, and a consistent summary JSON."""
    from hive_population_ml_spark.cli import main

    out = main(
        [
            "prep",
            "--data-dir", sf_dir,
            "--output-dir", str(tmp_path),
            "--min-tokens", "5",
            "--shard-tokens", "1000",
            "--cpus", "4",
        ]
    )
    corpus = spark.read.parquet(str(tmp_path / "corpus"))
    manifest = spark.read.parquet(str(tmp_path / "shards"))
    n_corpus = corpus.count()
    assert 0 < n_corpus <= out["n_raw_docs"]
    assert out["n_kept_docs"] == n_corpus  # manifest covers every kept doc
    # no duplicate contents survive
    assert corpus.select("text").distinct().count() == n_corpus
    # gate applied
    assert corpus.filter(F.col("n_tokens") < 5).count() == 0
    # summary agrees with the manifest
    agg = manifest.agg(
        F.sum("n_docs").alias("d"), F.sum("total_tokens").alias("t")
    ).collect()[0]
    assert agg["d"] == out["n_kept_docs"]
    assert agg["t"] == out["n_tokens"]
    assert out["n_shards"] == manifest.count() > 0


def test_cli_dedup_clusters(spark, sf_dir, tmp_path):
    """`dedup` writes a full-corpus cluster assignment whose canonical
    set partitions the corpus (every doc exactly one cluster; each
    cluster exactly one canonical keeper = its min id)."""
    from hive_population_ml_spark.cli import main

    out = main(
        [
            "dedup",
            "--data-dir", sf_dir,
            "--output-dir", str(tmp_path / "dd"),
            "--method", "ngram",
            "--cpus", "4",
        ]
    )
    assert out["n_docs"] == out["n_kept"] + out["n_dropped"]
    assert out["n_clusters"] == out["n_kept"]
    back = spark.read.parquet(out["clusters"])
    assert back.count() == out["n_docs"]
    per_cluster = back.groupBy("cluster_id").agg(
        F.sum("is_canonical").alias("k"), F.min("doc_id").alias("mn")
    )
    rows = per_cluster.collect()
    assert all(r["k"] == 1 for r in rows)
    canon = {
        r["doc_id"] for r in back.filter(F.col("is_canonical") == 1).collect()
    }
    assert canon == {r["mn"] for r in rows}


def test_cli_ann_topk(spark, sf_dir, tmp_path):
    from hive_population_ml_spark.cli import main

    out = main(
        [
            "ann",
            "--data-dir", sf_dir,
            "--output-dir", str(tmp_path / "ann"),
            "--method", "ivfpq",
            "--k", "3",
            "--cpus", "4",
        ]
    )
    assert out["n_queries"] >= 1
    assert out["n_results"] == out["n_queries"] * 3
    back = spark.read.parquet(out["neighbors"])
    assert set(back.columns) == {"query_id", "neighbor_id", "cosine", "rank"}
    assert back.filter(F.col("rank") > 3).count() == 0


def test_cli_tokenize(spark, sf_dir, tmp_path):
    """`tokenize` trains merges and writes a segmented vocabulary whose
    tokens losslessly reconstruct every word; compression < 1 means the
    merges genuinely shorten the corpus vs characters."""
    from hive_population_ml_spark.cli import main

    out = main(
        [
            "tokenize",
            "--data-dir", sf_dir,
            "--output-dir", str(tmp_path / "tok"),
            "--n-merges", "15",
            "--cpus", "4",
        ]
    )
    assert out["n_merges"] == 15
    assert 0 < out["compression_vs_chars"] < 1
    vocab = spark.read.parquet(out["vocab"]).collect()
    assert len(vocab) == out["n_vocab_words"]
    for r in vocab[:50]:
        assert "".join(r["tokens"]) == r["word"] + "</w>"
    merges = spark.read.parquet(out["merges"])
    assert merges.count() == 15


def test_cli_dedup_semantic(spark, sf_dir, tmp_path):
    """`dedup --method semantic` runs SemDeDup over embeddings: same
    assignment invariants as the text methods (partition of the corpus,
    one min-id canonical per cluster)."""
    from hive_population_ml_spark.cli import main

    out = main(
        [
            "dedup",
            "--data-dir", sf_dir,
            "--output-dir", str(tmp_path / "sd"),
            "--method", "semantic",
            "--threshold", "0.35",
            "--cpus", "4",
        ]
    )
    assert out["n_docs"] == out["n_kept"] + out["n_dropped"]
    assert out["n_clusters"] == out["n_kept"]
    assert out["n_dropped"] > 0  # threshold 0.35 really merges on this data
    back = spark.read.parquet(out["clusters"])
    assert back.count() == out["n_docs"]
    per_cluster = back.groupBy("cluster_id").agg(
        F.sum("is_canonical").alias("k"), F.min("doc_id").alias("mn")
    )
    rows = per_cluster.collect()
    assert all(r["k"] == 1 for r in rows)


def test_cli_dedup_levenshtein(spark, sf_dir, tmp_path):
    from hive_population_ml_spark.cli import main

    out = main(
        [
            "dedup",
            "--data-dir", sf_dir,
            "--output-dir", str(tmp_path / "dl"),
            "--method", "levenshtein",
            "--cpus", "4",
        ]
    )
    assert out["n_docs"] == out["n_kept"] + out["n_dropped"]
    back = spark.read.parquet(out["clusters"])
    assert back.count() == out["n_docs"]


def test_cli_split_cluster_safe(spark, sf_dir, tmp_path):
    """`split` labels every doc exactly once, keeps each cluster whole
    on one side, and lands near the requested fraction."""
    from hive_population_ml_spark.cli import main
    from hive_population_ml_spark.operators.dedup import ngram_jaccard_pairs

    out = main(
        [
            "split",
            "--data-dir", sf_dir,
            "--output-dir", str(tmp_path / "sp"),
            "--method", "ngram",
            "--train-frac", "0.8",
            "--cpus", "4",
        ]
    )
    back = spark.read.parquet(out["split_path"])
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert back.count() == docs.count()
    assert out["train"] + out["holdout"] == docs.count()
    assert 0.6 <= out["train"] / docs.count() <= 0.95
    # each cluster entirely on one side
    sides = back.groupBy("cluster_id").agg(
        F.countDistinct("split").alias("k")
    )
    assert all(r["k"] == 1 for r in sides.collect())
    # and therefore no near-dup pair straddles
    split_of = {r["doc_id"]: r["split"] for r in back.collect()}
    for r in ngram_jaccard_pairs(
        docs, "doc_id", "text", k=3, threshold=0.3, max_shingle_frac=0.1
    ).collect():
        assert split_of[r["d1"]] == split_of[r["d2"]]


def test_cli_mix_policies(spark, sf_dir, tmp_path):
    """`mix` writes a weight table for both policies; unimax allocs
    respect caps and sum to the budget, temperature probs sum to 1."""
    from hive_population_ml_spark.cli import main

    out_u = main(
        [
            "mix",
            "--data-dir", sf_dir,
            "--output-dir", str(tmp_path / "mu"),
            "--policy", "unimax",
            "--cpus", "4",
        ]
    )
    wu = spark.read.parquet(out_u["weights_path"]).collect()
    assert out_u["n_strata"] == len(wu) > 1
    assert all(r["alloc"] <= r["cap"] + 1e-6 for r in wu)
    assert abs(sum(r["weight"] for r in wu) - 1.0) < 1e-6

    out_t = main(
        [
            "mix",
            "--data-dir", sf_dir,
            "--output-dir", str(tmp_path / "mt"),
            "--policy", "temperature",
            "--alpha", "0.3",
            "--cpus", "4",
        ]
    )
    wt = spark.read.parquet(out_t["weights_path"]).collect()
    # each p is rounded to 9 decimals, so the sum carries up to
    # n_strata * 5e-10 of rounding slack
    assert abs(sum(r["p"] for r in wt) - 1.0) < 1e-7


def test_cli_prep_from_jsonl(spark, sf_dir, tmp_path):
    """`prep --input-jsonl` ingests a JSONL(.gz) corpus (with a corrupt
    line quarantined + counted) and produces the same artifact set as
    the parquet path."""
    from hive_population_ml_spark.cli import main
    from hive_population_ml_spark.io.adapters import write_jsonl_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "jl")
    write_jsonl_corpus(docs.coalesce(1), src, compression=None)
    # inject a malformed line as its own shard (appending to a Spark-
    # written file would invalidate its Hadoop .crc sidecar)
    with open(f"{src}/extra-shard.json", "w") as f:
        f.write("{broken json line\n")

    out = main(
        [
            "prep",
            "--data-dir", sf_dir,
            "--input-jsonl", src,
            "--output-dir", str(tmp_path / "out"),
            "--min-tokens", "5",
            "--cpus", "4",
        ]
    )
    assert out["n_corrupt_lines"] == 1
    assert out["n_raw_docs"] == docs.count()
    assert 0 < out["n_kept_docs"] <= out["n_raw_docs"]
    assert spark.read.parquet(out["corpus"]).count() == out["n_kept_docs"]


def test_cli_ann_index_save_load_bit_identical(spark, sf_dir, tmp_path):
    """The offline index-build artifact: a trained IVF-PQ index saved
    to parquet and reloaded must reproduce the training run's neighbor
    table BIT-IDENTICALLY (doubles round-trip parquet exactly)."""
    import numpy as np

    from hive_population_ml_spark.cli import main
    from hive_population_ml_spark.operators.similarity import (
        load_ivfpq_index,
        save_ivfpq_index,
        train_ivfpq_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    index = train_ivfpq_index(emb)
    save_ivfpq_index(spark, index, str(tmp_path / "idx0"))
    cents2, books2 = load_ivfpq_index(spark, str(tmp_path / "idx0"))
    assert np.array_equal(np.asarray(index[0]), cents2)
    assert np.array_equal(np.asarray(index[1]), books2)

    # a truncated codebook artifact must raise, never np.empty garbage
    import pytest as _pytest
    from pyspark.sql import functions as F2

    books_df = spark.read.parquet(str(tmp_path / "idx0" / "codebooks"))
    books_df.filter(~((F2.col("s") == 0) & (F2.col("c") == 0))).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "idx_bad" / "codebooks"))
    spark.read.parquet(str(tmp_path / "idx0" / "centroids")).write.parquet(
        str(tmp_path / "idx_bad" / "centroids")
    )
    with _pytest.raises(ValueError, match="corrupt IVF-PQ"):
        load_ivfpq_index(spark, str(tmp_path / "idx_bad"))

    out1 = main(
        [
            "ann",
            "--data-dir", sf_dir,
            "--output-dir", str(tmp_path / "a1"),
            "--method", "ivfpq",
            "--k", "3",
            "--save-index", str(tmp_path / "idx"),
            "--cpus", "4",
        ]
    )
    out2 = main(
        [
            "ann",
            "--data-dir", sf_dir,
            "--output-dir", str(tmp_path / "a2"),
            "--method", "ivfpq",
            "--k", "3",
            "--load-index", str(tmp_path / "idx"),
            "--cpus", "4",
        ]
    )
    r1 = sorted(tuple(r) for r in spark.read.parquet(out1["neighbors"]).collect())
    r2 = sorted(tuple(r) for r in spark.read.parquet(out2["neighbors"]).collect())
    assert r1 == r2 and len(r1) == out1["n_results"]


def test_cli_ingest_incremental_index_lifecycle(spark, sf_dir, tmp_path):
    """The production write path e2e: first ingest builds + persists
    the signature index; the second flags near-dups of history and
    merges its signatures in; re-ingesting the same batch is an
    idempotent upsert (identical seeds -> byte-equal rows) and never
    self-flags."""
    from hive_population_ml_spark.cli import main

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    b1 = str(tmp_path / "b1")
    b2 = str(tmp_path / "b2")
    docs.filter("doc_id % 5 != 0").write.parquet(f"{b1}/documents.parquet")
    docs.filter("doc_id % 5 = 0").write.parquet(f"{b2}/documents.parquet")
    idx = str(tmp_path / "sig_index")

    out1 = main(
        ["ingest", "--data-dir", b1, "--index", idx,
         "--output-dir", str(tmp_path / "o1"), "--cpus", "4"]
    )
    n1 = docs.filter("doc_id % 5 != 0").count()
    assert out1["n_indexed_docs"] == n1 and out1["n_flagged"] == 0

    out2 = main(
        ["ingest", "--data-dir", b2, "--index", idx,
         "--output-dir", str(tmp_path / "o2"), "--cpus", "4"]
    )
    n2 = docs.filter("doc_id % 5 = 0").count()
    assert out2["n_batch_docs"] == n2
    assert out2["n_indexed_docs"] == n1 + n2
    flags = spark.read.parquet(out2["flags"])
    assert flags.count() == n2
    # history ids only — a flag can never point at the batch itself
    assert flags.filter("best_match_id % 5 = 0").count() == 0

    out3 = main(
        ["ingest", "--data-dir", b2, "--index", idx,
         "--output-dir", str(tmp_path / "o3"), "--cpus", "4"]
    )
    # idempotent merge: same doc set, same distinct signature rows
    assert out3["n_indexed_docs"] == n1 + n2
    flags3 = {
        r["doc_id"]: r for r in spark.read.parquet(out3["flags"]).collect()
    }
    # re-ingested docs never match THEMSELVES (est 1.0 self-loop)
    for d, r in flags3.items():
        assert r["best_match_id"] != d


def test_cli_purge_right_to_be_forgotten(spark, sf_dir, tmp_path):
    """purge e2e: build an index via ingest, purge a known id set, and
    the reloaded index has exactly those docs gone with signature-family
    metadata intact; purging already-absent ids is an idempotent no-op;
    a later ingest against the purged index still works (the purged
    docs re-flag as NEW, not as their own ghosts)."""
    from hive_population_ml_spark.cli import main

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    b1 = str(tmp_path / "b1")
    docs.write.parquet(f"{b1}/documents.parquet")
    idx = str(tmp_path / "sig_index")
    main(["ingest", "--data-dir", b1, "--index", idx,
          "--output-dir", str(tmp_path / "o1"), "--cpus", "4"])
    n_all = docs.count()

    purge_ids = [r["doc_id"] for r in
                 docs.filter("doc_id % 100 = 0").select("doc_id").collect()]
    out = main(["purge", "--index", idx,
                "--ids", ",".join(str(i) for i in purge_ids),
                "--output-dir", str(tmp_path / "p1"), "--cpus", "4"])
    assert out["n_docs_before"] == n_all
    assert out["n_purged"] == len(purge_ids)
    assert out["n_docs_after"] == n_all - len(purge_ids)

    # reload validates (k, n_hashes, bands) metadata survived the swap
    from hive_population_ml_spark.operators.dedup import load_minhash_index

    live = load_minhash_index(spark, idx, k=3, n_hashes=32, bands=8)
    left = {r["doc"] for r in live.select("doc").distinct().collect()}
    assert left.isdisjoint(set(purge_ids)) and len(left) == n_all - len(purge_ids)

    # idempotent: purging the same ids again is a no-op rewrite
    out2 = main(["purge", "--index", idx,
                 "--ids", ",".join(str(i) for i in purge_ids),
                 "--output-dir", str(tmp_path / "p2"), "--cpus", "4"])
    assert out2["n_purged"] == 0
    assert out2["n_docs_after"] == n_all - len(purge_ids)


def test_cli_mix_materialize_multiset(spark, sf_dir, tmp_path):
    """`mix --materialize` writes the concrete training multiset whose
    per-stratum expected size matches the weight table's epochs; the
    unimax policy rejects the flag."""
    import pytest as _pytest

    from hive_population_ml_spark.cli import main

    out = main(
        [
            "mix",
            "--data-dir", sf_dir,
            "--output-dir", str(tmp_path / "mm"),
            "--policy", "temperature",
            "--alpha", "0.3",
            "--target-total", "800",
            "--materialize",
            "--cpus", "4",
        ]
    )
    ms = spark.read.parquet(out["multiset_path"])
    assert out["multiset_rows"] == ms.count() > 0
    w = {r["lang"]: r for r in spark.read.parquet(out["weights_path"]).collect()}
    per = {r["lang"]: r["n"] for r in ms.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in per.items():
        expected = w[lang]["epochs"] * w[lang]["n_docs"]
        assert abs(n - expected) <= max(6, 0.25 * expected)  # hash-measure slack
    with _pytest.raises(SystemExit):
        main(
            [
                "mix",
                "--data-dir", sf_dir,
                "--output-dir", str(tmp_path / "mx"),
                "--policy", "unimax",
                "--materialize",
                "--cpus", "4",
            ]
        )


def test_cli_profile_report(spark, sf_dir, tmp_path):
    """`profile` joins the per-doc health signals (novelty, mixed-lang,
    duplication, quality) over every document and writes a sane
    corpus-level summary + the per-source embedding drift table."""
    from hive_population_ml_spark.cli import main
    from hive_population_ml_spark.io import Tables

    out = main(
        [
            "profile",
            "--data-dir", sf_dir,
            "--output-dir", str(tmp_path / "prof"),
            "--cpus", "4",
        ]
    )
    docs_n = Tables(spark, sf_dir).documents.count()
    per_doc = spark.read.parquet(out["per_doc_path"])
    assert per_doc.count() == docs_n == out["n_docs"]
    assert set(per_doc.columns) >= {
        "doc_id", "lang", "source", "quality", "novelty_frac",
        "majority_lang", "agreement", "dup_frac",
    }
    assert 0.0 <= out["mean_novelty"] <= 1.0
    assert 0.0 <= out["mean_dup_frac"] <= 1.0
    assert 0.0 <= out["mixed_lang_doc_frac"] <= 1.0
    assert out["source_drift_path"] is not None
    drift = spark.read.parquet(out["source_drift_path"])
    assert drift.count() > 1 and "cos_to_global" in drift.columns


def test_cli_stats_suite(spark, sf_dir, tmp_path):
    """`stats` materializes the testing tier (KS, Welch A/B, chi²,
    Benford, bootstrap CI) as parquet tables + a one-row summary, each
    component being a registered oracle-checked query."""
    from hive_population_ml_spark.cli import main

    out = main(
        [
            "stats",
            "--data-dir", sf_dir,
            "--output-dir", str(tmp_path / "st"),
            "--cpus", "4",
        ]
    )
    for label in (
        "ks_drift",
        "welch_ab",
        "chi2_independence",
        "benford",
        "bootstrap_ci",
    ):
        assert out[f"{label}_rows"] > 0
        t = spark.read.parquet(out[f"{label}_path"])
        assert t.count() == out[f"{label}_rows"]
    assert 0.0 <= out["max_ks_d"] <= 1.0
    assert out["chi2_stat"] >= 0.0
    assert out["benford_chi2_stat"] >= 0.0
