"""CLI entry points — the Spark restatement of the reference's
``scripts/train.py`` and ``scripts/evaluate.py`` (SURVEY.md §3.1/§3.3).

The reference's "query language" is argparse flags (train.py:33-117):
task, model, window-days, seed, output dir. Same surface here, driving
the engine end-to-end:

  python -m hive_population_ml_spark.cli train \
      --data-dir /root/testdata/sf0.001 --model gradient_boosting \
      --task-type regression --window-days 30 --seed 42 --output-dir /tmp/run1

  python -m hive_population_ml_spark.cli evaluate \
      --data-dir /root/testdata/sf0.001 --model-dir /tmp/run1/model \
      --task-type regression --window-days 30 --output-dir /tmp/run1/eval

train: build features (interval join + stats bundle) → leakage-safe
split → fit Pipeline[Imputer, Assembler, Scaler] on train → fit model →
evaluate on test → write model checkpoint (S8), metrics JSON (S7) and
predictions parquet (S9).
evaluate: reload the saved PipelineModel, re-score the test split,
recompute metrics — the reference's checkpoint-reload path
(evaluate.py:179-276).
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import functions as F


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="hive_population_ml_spark")
    sub = p.add_subparsers(dest="command", required=True)
    for name in ("train", "evaluate"):
        s = sub.add_parser(name)
        s.add_argument("--data-dir", required=True)
        s.add_argument("--output-dir", required=True)
        s.add_argument("--task-type", choices=["regression", "classification"],
                       default="regression")
        s.add_argument("--window-days", type=int, default=7)
        s.add_argument("--min-count", type=int, default=1)
        s.add_argument("--seed", type=int, default=42)
        s.add_argument("--cpus", type=int, default=8)
        if name == "train":
            s.add_argument(
                "--model",
                choices=["ridge", "lasso", "random_forest", "gradient_boosting",
                         "mlp", "lstm", "gru", "transformer"],
                default="gradient_boosting",
            )
            s.add_argument("--hidden-dim", type=int, default=128)
            s.add_argument("--num-layers", type=int, default=2)
            s.add_argument("--max-epochs", type=int, default=100)
            s.add_argument("--patience", type=int, default=15)
            s.add_argument(
                "--stage-only",
                action="store_true",
                help="sequence models: write the staged tensor shards and "
                "spec, skip the torch loop (for torch-less drivers; point "
                "a torch-equipped cluster at the staged directory)",
            )
        else:
            s.add_argument("--model-dir", required=True)
    prep = sub.add_parser(
        "prep",
        help="corpus preparation: exact-dedup -> PII mask -> quality "
        "gate -> deterministic stratified sample -> token-budget shard "
        "manifest (the training-data pipeline, one lazy DAG per output)",
    )
    prep.add_argument("--data-dir", required=True)
    prep.add_argument("--output-dir", required=True)
    prep.add_argument("--sample-rate", type=float, default=1.0)
    prep.add_argument("--min-tokens", type=int, default=5)
    prep.add_argument("--shard-tokens", type=int, default=2000)
    prep.add_argument("--cpus", type=int, default=8)
    prep.add_argument(
        "--learned-quality",
        type=float,
        default=None,
        metavar="THRESHOLD",
        help="additionally fit the hashing-trick filter model "
        "(ml/quality_clf.py) on the input corpus's weak labels and keep "
        "only docs with P(good) >= THRESHOLD; works in batch and "
        "--stream modes (model fit once, offline, before the stream)",
    )
    prep.add_argument(
        "--stream",
        action="store_true",
        help="incremental mode: run the same composed pipeline through "
        "the exactly-once foreachBatch sink (availableNow trigger); "
        "cross-batch exact dedup via the content-hash history",
    )
    prep.add_argument(
        "--input-jsonl",
        metavar="PATH",
        default=None,
        help="read the corpus from JSONL(.gz) shards at PATH instead of "
        "the data-dir documents table (schema-pinned permissive scan; "
        "malformed lines are quarantined and counted in the summary as "
        "n_corrupt_lines). Batch mode only.",
    )
    prep.add_argument(
        "--decontaminate",
        metavar="PARQUET",
        default=None,
        help="optional eval-benchmark parquet (a 'text' column); docs "
        "sharing any 3-token shingle with it are dropped via the Bloom "
        "bitset probe (map-only, no false negatives) before masking",
    )
    dedup = sub.add_parser(
        "dedup",
        help="near-duplicate clustering over documents: pairs "
        "(ngram|minhash|simhash) -> connected components -> full-corpus "
        "(doc_id, cluster_id, is_canonical) assignment parquet; "
        "filter(is_canonical=1) IS the deduplicated corpus",
    )
    dedup.add_argument("--data-dir", required=True)
    dedup.add_argument("--output-dir", required=True)
    dedup.add_argument(
        "--method",
        choices=["ngram", "minhash", "simhash", "semantic", "levenshtein"],
        default="minhash",
        help="semantic = SemDeDup over the embeddings table (IVF cells "
        "-> within-cell cosine pairs -> closure); levenshtein = "
        "prefix-blocked edit distance on doc heads; text methods run "
        "over documents",
    )
    dedup.add_argument("--threshold", type=float, default=0.3)
    dedup.add_argument("--cpus", type=int, default=8)
    ing = sub.add_parser(
        "ingest",
        help="incremental corpus ingest against a persisted MinHash "
        "signature index (the 100 TB write path: state is a few "
        "hundred bytes/doc of signatures, raw text is never re-read): "
        "flag the batch's near-dups of history, then merge the batch's "
        "signatures into the index",
    )
    ing.add_argument("--data-dir", required=True,
                     help="the NEW batch (documents table)")
    ing.add_argument("--index", required=True,
                     help="signature index dir; created on first run")
    ing.add_argument("--output-dir", required=True)
    ing.add_argument("--threshold", type=float, default=0.3)
    ing.add_argument("--cpus", type=int, default=8)
    prg = sub.add_parser(
        "purge",
        help="right-to-be-forgotten: delete the named doc ids from a "
        "persisted MinHash signature index (anti-join filter, staged "
        "rewrite, rename-aside swap; signature-family metadata "
        "preserved) and write a before/after summary",
    )
    prg.add_argument("--index", required=True,
                     help="signature index dir (as built by ingest)")
    prg.add_argument("--ids", default=None,
                     help="comma-separated doc ids to purge")
    prg.add_argument("--ids-parquet", default=None,
                     help="parquet file/dir with a doc_id column")
    prg.add_argument("--output-dir", required=True)
    prg.add_argument("--cpus", type=int, default=8)
    ann = sub.add_parser(
        "ann",
        help="similarity search over embeddings: build the chosen index "
        "(lsh|ivf|pq|ivfpq) and write per-query top-k neighbors parquet "
        "+ summary JSON",
    )
    ann.add_argument("--data-dir", required=True)
    ann.add_argument("--output-dir", required=True)
    ann.add_argument(
        "--method", choices=["lsh", "ivf", "pq", "ivfpq", "exact"], default="ivfpq"
    )
    ann.add_argument("--k", type=int, default=5)
    ann.add_argument(
        "--queries-mod",
        type=int,
        default=100,
        help="vectors with vec_id %% MOD == 0 are the query set",
    )
    ann.add_argument(
        "--save-index",
        metavar="DIR",
        default=None,
        help="(ivfpq) persist the trained index (centroid + codebook "
        "parquet) for later --load-index runs — the offline "
        "index-build artifact",
    )
    ann.add_argument(
        "--load-index",
        metavar="DIR",
        default=None,
        help="(ivfpq) serve from a previously saved index instead of "
        "training; doubles round-trip parquet exactly, so results are "
        "bit-identical to the training run",
    )
    ann.add_argument("--cpus", type=int, default=8)
    spl = sub.add_parser(
        "split",
        help="near-dup-aware train/holdout corpus split: pair emitter "
        "-> transitive closure -> hash the CLUSTER id, so no dup pair "
        "(even transitively connected) straddles the split; writes "
        "(doc_id, cluster_id, split) parquet + summary JSON",
    )
    spl.add_argument("--data-dir", required=True)
    spl.add_argument("--output-dir", required=True)
    spl.add_argument(
        "--method", choices=["ngram", "minhash"], default="ngram"
    )
    spl.add_argument("--train-frac", type=float, default=0.8)
    spl.add_argument("--threshold", type=float, default=0.3)
    spl.add_argument(
        "--hash-mode",
        choices=["minstd", "xxhash64"],
        default="xxhash64",
        help="minstd = portable/oracle-differential; xxhash64 = "
        "production mixing",
    )
    spl.add_argument("--cpus", type=int, default=8)
    mix = sub.add_parser(
        "mix",
        help="language/source mixture weights for training-data "
        "assembly: temperature (p ~ n^alpha, mT5) or unimax "
        "(uniform-as-possible token budget with per-stratum epoch "
        "caps); writes the weight table parquet + JSON",
    )
    mix.add_argument("--data-dir", required=True)
    mix.add_argument("--output-dir", required=True)
    mix.add_argument(
        "--policy", choices=["temperature", "unimax"], default="unimax"
    )
    mix.add_argument("--stratum", default="lang")
    mix.add_argument("--alpha", type=float, default=0.3)
    mix.add_argument("--target-total", type=int, default=100_000)
    mix.add_argument("--budget-frac", type=float, default=0.9)
    mix.add_argument("--epochs", type=float, default=1.0)
    mix.add_argument(
        "--materialize",
        action="store_true",
        help="also write the concrete training multiset (doc_id, "
        "stratum, copy_idx): floor(epochs) copies per doc plus the "
        "deterministic-hash fractional pass (temperature policy only)",
    )
    mix.add_argument("--cpus", type=int, default=8)
    prof = sub.add_parser(
        "profile",
        help="corpus-health report: per-doc novelty curve, mixed-"
        "language profile, duplication fraction, heuristic quality "
        "(+ per-source embedding drift when embeddings exist); writes "
        "the per-doc table parquet + corpus-level summary JSON",
    )
    prof.add_argument("--data-dir", required=True)
    prof.add_argument("--output-dir", required=True)
    prof.add_argument("--cpus", type=int, default=8)
    st = sub.add_parser(
        "stats",
        help="statistical health suite over the events table: exact "
        "two-sample KS drift, Welch A/B readout (deterministic minstd "
        "assignment), chi-squared type x weekday independence grid, "
        "Benford first-digit screen over order totals, and Poisson-"
        "bootstrap CIs; writes each table parquet + one summary JSON",
    )
    st.add_argument("--data-dir", required=True)
    st.add_argument("--output-dir", required=True)
    st.add_argument("--cpus", type=int, default=8)
    tok = sub.add_parser(
        "tokenize",
        help="train a BPE tokenizer on the corpus (one word-count pass "
        "+ merge loop on the bounded vocab) and write the merge table "
        "+ segmented-vocabulary parquet + summary JSON",
    )
    tok.add_argument("--data-dir", required=True)
    tok.add_argument("--output-dir", required=True)
    tok.add_argument("--n-merges", type=int, default=50)
    tok.add_argument("--cpus", type=int, default=8)
    return p


def _features_and_split(spark, args):
    from .ml.features import build_feature_table
    from .ml.pipeline import feature_pipeline, numeric_feature_cols

    ft = build_feature_table(
        spark, args.data_dir, window_days=args.window_days, min_count=args.min_count
    ).cache()
    train = ft.filter(F.col("split") == "train")
    test = ft.filter(F.col("split") == "test")
    feats = numeric_feature_cols(
        train, exclude={"anchor_orderkey", "custkey", "target"}
    )
    return train, test, feats, feature_pipeline(feats)


def _with_label(df, label_col):
    """Expose ``label_col`` as the MLlib 'label' column (dropping the
    feature table's own binary label when a different target is used)."""
    if label_col == "label":
        return df
    return df.drop("label").withColumnRenamed(label_col, "label")


def _metrics_df(spark, scored, task_type):
    e = F.col("label") - F.col("prediction")
    if task_type == "regression":
        return scored.agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.abs(e)), 4).alias("mae"),
            F.round(F.sqrt(F.avg(e * e)), 4).alias("rmse"),
        )
    correct = (F.col("label") == F.col("prediction")).cast("int")
    return scored.agg(
        F.count("*").alias("n"), F.round(F.avg(correct), 6).alias("accuracy")
    )


SEQUENCE_MODELS = ("lstm", "gru", "transformer")


def cmd_train_sequence(args) -> dict:
    """--model lstm|gru|transformer (reference train.py:143-167 path):
    Spark builds + stages the sequence tensors; torch (via
    TorchDistributor) trains. Without torch, --stage-only still
    produces the shards any torch cluster can consume."""
    import json

    from .ml.features import build_sequence_table
    from .ml.sequence import (
        SequenceModelSpec,
        stage_sequences,
        train_sequence_model,
    )
    from .session import get_spark

    spark = get_spark("hpml-train-seq", cpus=args.cpus, shuffle_partitions=args.cpus)
    seq = build_sequence_table(
        spark, args.data_dir, window_days=args.window_days, min_count=args.min_count
    )
    label = "label" if args.task_type == "classification" else "target"
    os.makedirs(args.output_dir, exist_ok=True)
    spec = SequenceModelSpec(
        model=args.model,
        hidden_dim=args.hidden_dim,
        num_layers=args.num_layers,
        num_classes=2 if args.task_type == "classification" else 1,
        task_type=args.task_type,
        max_epochs=args.max_epochs,
        patience=args.patience,
        seed=args.seed,
    )
    staged = {}
    for split in ("train", "test"):
        part = seq.filter(F.col("split") == split)
        path = os.path.join(args.output_dir, f"staged_{split}")
        stage_sequences(
            part.select("anchor_orderkey", "seq_len", "seq"),
            part.select("anchor_orderkey", label),
            ["anchor_orderkey"],
            label,
            path,
            num_shards=max(1, args.cpus // 4),
        )
        staged[split] = path
    from dataclasses import asdict

    with open(os.path.join(args.output_dir, "sequence_spec.json"), "w") as f:
        json.dump({"spec": asdict(spec), "staged": staged, "label": label}, f)
    out = {"staged": staged, "model": args.model}
    if args.stage_only:
        print(out)
        return out
    result = train_sequence_model(
        spark,
        staged["train"],
        spec,
        os.path.join(args.output_dir, "model.pt"),
        num_processes=max(1, args.cpus // 4),
    )
    out.update(result)
    print(out)
    return out


def cmd_train(args) -> dict:
    from pyspark.ml import Pipeline

    from .io.sinks import write_metrics_json, write_predictions
    from .ml.pipeline import mlp_classifier, reference_regressors
    from .session import get_spark

    if args.model in SEQUENCE_MODELS:
        return cmd_train_sequence(args)

    spark = get_spark("hpml-train", cpus=args.cpus, shuffle_partitions=args.cpus)
    train, test, feats, feat_pipe = _features_and_split(spark, args)
    label = "label" if args.task_type == "classification" else "target"
    if args.model == "mlp":
        est = mlp_classifier(n_features=len(feats), n_classes=2, seed=args.seed)
    else:
        est = reference_regressors(seed=args.seed)[args.model]
    full = Pipeline(stages=[feat_pipe, est])
    data_tr, data_te = _with_label(train, label), _with_label(test, label)
    model = full.fit(data_tr)
    scored = model.transform(data_te)
    os.makedirs(args.output_dir, exist_ok=True)
    model.write().overwrite().save(os.path.join(args.output_dir, "model"))
    metrics = _metrics_df(spark, scored, args.task_type)
    write_metrics_json(metrics, os.path.join(args.output_dir, "results_json"))
    write_predictions(
        scored.select("anchor_orderkey", "label", "prediction"),
        os.path.join(args.output_dir, "predictions"),
    )
    out = {r: metrics.first()[r] for r in metrics.columns}
    print(out)
    return out


def cmd_evaluate(args) -> dict:
    from pyspark.ml import PipelineModel

    from .io.sinks import write_metrics_json
    from .session import get_spark

    spark = get_spark("hpml-eval", cpus=args.cpus, shuffle_partitions=args.cpus)
    _, test, _, _ = _features_and_split(spark, args)
    label = "label" if args.task_type == "classification" else "target"
    data_te = _with_label(test, label)
    model = PipelineModel.load(args.model_dir)
    scored = model.transform(data_te)
    metrics = _metrics_df(spark, scored, args.task_type)
    os.makedirs(args.output_dir, exist_ok=True)
    write_metrics_json(metrics, os.path.join(args.output_dir, "results_json"))
    out = {r: metrics.first()[r] for r in metrics.columns}
    print(out)
    return out


def cmd_prep(args) -> dict:
    """Corpus-prep pipeline over ``documents``: keep one doc per exact
    content group, mask PII, gate on a minimum token count, sample
    deterministically, and write (a) the cleaned corpus parquet, (b) the
    per-language token-budget shard manifest, (c) a summary JSON. Every
    stage is the registered operator — the CLI only composes them.
    ``--stream`` runs the identical ``prep_transform`` composition
    incrementally through the exactly-once foreachBatch sink
    (streaming/pipeline.py::prep_stream); the manifest/summary tail is
    the same batch post-pass over the written corpus either way."""
    from .io import Tables
    from .io.sinks import write_metrics_json
    from .operators.sampling import pack_shards
    from .session import get_spark
    from .streaming.pipeline import prep_stream, prep_transform

    spark = get_spark("hpml-prep", cpus=args.cpus, shuffle_partitions=args.cpus)
    jsonl = getattr(args, "input_jsonl", None)
    n_corrupt = 0
    if jsonl:
        if getattr(args, "stream", False):
            raise ValueError(
                "--input-jsonl is batch-only; stream mode replays the "
                "data-dir documents table"
            )
        from .io.adapters import jsonl_corpus_scan

        # cache: Spark rejects corrupt-column-only queries on raw JSON
        raw = jsonl_corpus_scan(spark, jsonl).cache()
        n_corrupt = raw.filter(
            F.col("_corrupt_record").isNotNull()
        ).count()
        docs = raw.filter(F.col("_corrupt_record").isNull()).drop(
            "_corrupt_record"
        )
    else:
        docs = Tables(spark, args.data_dir).documents
    n_raw = docs.count()

    bench_path = getattr(args, "decontaminate", None)
    q_thresh = getattr(args, "learned_quality", None)
    q_model = None
    if q_thresh is not None:
        from .ml.quality_clf import train_quality_classifier, weak_quality_labels

        q_model = train_quality_classifier(weak_quality_labels(docs))
    corpus_path = os.path.join(args.output_dir, "corpus")
    if getattr(args, "stream", False):
        q = (
            prep_stream(
                spark,
                f"{args.data_dir.rstrip('/')}/documents.parquet",
                args.output_dir,
                os.path.join(args.output_dir, "_checkpoint"),
                min_tokens=args.min_tokens,
                sample_rate=args.sample_rate,
                benchmark_path=bench_path,
                quality_model=q_model,
                quality_threshold=q_thresh if q_thresh is not None else 0.5,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        back = spark.read.parquet(corpus_path).drop("batch_id")
    else:
        benchmark = spark.read.parquet(bench_path) if bench_path else None
        sampled = prep_transform(
            docs,
            args.min_tokens,
            args.sample_rate,
            benchmark,
            quality_model=q_model,
            quality_threshold=q_thresh if q_thresh is not None else 0.5,
        )
        # NOTE: an Observation-API piggyback of written-docs/tokens metrics
        # was tried here and reverted — in this Spark build any Observation
        # use leaves the session's ObservationManager reachable from later
        # RDD closures, failing MLlib evaluators with Task-not-serializable
        # (reproduced: Observation+get, then BinaryClassificationEvaluator
        # in the same session). PERFORMANCE.md "deliberately did NOT do".
        sampled.write.mode("overwrite").parquet(corpus_path)
        back = spark.read.parquet(corpus_path)
    manifest = pack_shards(
        back, "lang", F.col("n_tokens"), budget=args.shard_tokens,
        order_col="doc_id",
    )
    manifest_path = os.path.join(args.output_dir, "shards")
    manifest.write.mode("overwrite").parquet(manifest_path)

    summary = spark.read.parquet(manifest_path).agg(
        F.lit(n_raw).alias("n_raw_docs"),
        F.lit(n_corrupt).alias("n_corrupt_lines"),
        F.sum("n_docs").cast("long").alias("n_kept_docs"),
        F.sum("total_tokens").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_shards"),
    )
    write_metrics_json(summary, os.path.join(args.output_dir, "summary"))
    out = {k: v for k, v in summary.collect()[0].asDict().items()}
    out.update({"corpus": corpus_path, "shards": manifest_path})
    return out


def cmd_dedup(args) -> dict:
    """Near-dup clustering: the registered pair emitter for the chosen
    method feeds connected components; the full-corpus assignment and a
    cluster-size summary land as parquet + JSON."""
    from .io import Tables
    from .io.sinks import write_metrics_json
    from .operators.components import dedup_cluster_assignment
    from .operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )
    from .session import get_spark

    spark = get_spark("hpml-dedup", cpus=args.cpus, shuffle_partitions=args.cpus)
    if args.method == "semantic":
        from .operators.similarity import semantic_dedup

        emb = Tables(spark, args.data_dir).embeddings
        assign = semantic_dedup(
            emb, id_col="vec_id", vec_col="embedding", threshold=args.threshold
        ).withColumnRenamed("vec_id", "doc_id")
        return _write_dedup_outputs(spark, assign, args.output_dir)
    docs = Tables(spark, args.data_dir).documents
    if args.method == "ngram":
        pairs = ngram_jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=args.threshold,
            max_shingle_frac=0.1,
        )
    elif args.method == "minhash":
        pairs = minhash_lsh_pairs(
            docs, "doc_id", "text", k=3, n_hashes=32, bands=8,
            threshold=args.threshold,
        )
    elif args.method == "levenshtein":
        from .operators.dedup import levenshtein_pairs

        pairs = levenshtein_pairs(docs, "doc_id", "text")
    else:
        pairs = simhash_pairs(docs, "doc_id", "text", max_hamming=3)
    assign = dedup_cluster_assignment(
        docs, pairs, id_col="doc_id", src="d1", dst="d2"
    )
    return _write_dedup_outputs(spark, assign, args.output_dir)


def _write_dedup_outputs(spark, assign, output_dir: str) -> dict:
    from .io.sinks import write_metrics_json

    out_path = os.path.join(output_dir, "clusters")
    assign.write.mode("overwrite").parquet(out_path)
    back = spark.read.parquet(out_path)
    summary = back.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("is_canonical").cast("long").alias("n_kept"),
        (F.count("*") - F.sum("is_canonical")).cast("long").alias("n_dropped"),
        F.countDistinct("cluster_id").cast("long").alias("n_clusters"),
    )
    write_metrics_json(summary, os.path.join(output_dir, "summary"))
    out = summary.collect()[0].asDict()
    out["clusters"] = out_path
    return out


def _swap_index(live: str, staging: str) -> None:
    """Rename-aside swap of a staged index over the live one: the live
    index is never in a deleted state — a crash between the two renames
    leaves BOTH versions on disk (recover by moving one back), never
    neither. Single-writer discipline assumed (same as cmd_ingest)."""
    import shutil

    old = live.rstrip("/") + "_old"
    shutil.rmtree(old, ignore_errors=True)
    shutil.move(live, old)
    shutil.move(staging, live)
    shutil.rmtree(old)


def cmd_ingest(args) -> dict:
    """Incremental ingest: first run builds + persists the signature
    index of the batch; later runs flag the batch's near-dups against
    the loaded history (signature-estimated Jaccard, no raw-text
    re-read) and merge the batch's signatures in. The merged index is
    staged beside the live one and swapped in atomically-enough for a
    single-writer pipeline (write staging -> replace), because parquet
    cannot overwrite its own input in place."""
    from .io import Tables
    from .io.sinks import write_metrics_json
    from .operators.dedup import (
        incremental_minhash_dups,
        load_minhash_index,
        minhash_band_index,
        save_minhash_index,
    )
    from .session import get_spark

    spark = get_spark("hpml-ingest", cpus=args.cpus, shuffle_partitions=args.cpus)
    docs = Tables(spark, args.data_dir).documents
    batch_idx = minhash_band_index(docs, "doc_id", "text")
    if not os.path.exists(os.path.join(args.index, "_meta")):
        save_minhash_index(batch_idx, args.index, k=3, bands=8)
        n = spark.read.parquet(os.path.join(args.index, "index")).select(
            "doc"
        ).distinct().count()
        summary = spark.createDataFrame(
            [(int(n), 0, int(n))],
            "n_batch_docs long, n_flagged long, n_indexed_docs long",
        )
        write_metrics_json(summary, os.path.join(args.output_dir, "summary"))
        out = summary.collect()[0].asDict()
        out["index"] = args.index
        return out
    hist = load_minhash_index(spark, args.index, k=3, n_hashes=32, bands=8)
    flags = incremental_minhash_dups(
        hist, docs, "doc_id", "text", threshold=args.threshold
    )
    flags_path = os.path.join(args.output_dir, "flags")
    flags.write.mode("overwrite").parquet(flags_path)
    # merge: identical seeds make a re-ingested doc's rows byte-equal,
    # so the distinct on (doc, band, bh) is an idempotent upsert
    staging = args.index.rstrip("/") + "_staging"
    merged = hist.unionByName(batch_idx).dropDuplicates(["doc", "band", "bh"])
    save_minhash_index(merged, staging, k=3, bands=8)
    live = spark.read.parquet(os.path.join(staging, "index"))
    n_indexed = live.select("doc").distinct().count()
    _swap_index(args.index, staging)
    back = spark.read.parquet(flags_path)
    summary = back.agg(
        F.count("*").cast("long").alias("n_batch_docs"),
        F.sum("is_dup").cast("long").alias("n_flagged"),
    ).withColumn("n_indexed_docs", F.lit(int(n_indexed)).cast("long"))
    write_metrics_json(summary, os.path.join(args.output_dir, "summary"))
    out = summary.collect()[0].asDict()
    out["flags"] = flags_path
    out["index"] = args.index
    return out


def cmd_purge(args) -> dict:
    """Right-to-be-forgotten purge of a persisted signature index: the
    requested doc ids are removed by an anti-join (never a rebuild —
    raw text is not re-read, exactly like the ingest path), the
    filtered index is staged with its signature-family metadata intact
    and swapped in with the same rename-aside discipline as ingest.
    Idempotent: purging already-absent ids is a no-op rewrite. At
    100 TB this is the entire point of keeping derived state keyed by
    doc id — a deletion request touches |signature rows of those docs|,
    not the corpus."""
    from .io.sinks import write_metrics_json
    from .operators.dedup import load_minhash_index, save_minhash_index
    from .session import get_spark

    spark = get_spark("hpml-purge", cpus=args.cpus, shuffle_partitions=args.cpus)
    meta = spark.read.parquet(os.path.join(args.index, "_meta")).collect()
    if len(meta) != 1:
        raise ValueError(f"corrupt minhash index at {args.index}")
    k, n_hashes, bands = meta[0]["k"], meta[0]["n_hashes"], meta[0]["bands"]
    hist = load_minhash_index(
        spark, args.index, k=k, n_hashes=n_hashes, bands=bands
    )
    doc_type = dict(hist.dtypes)["doc"]
    if args.ids:
        ids = spark.createDataFrame(
            [(x.strip(),) for x in args.ids.split(",")], "doc string"
        ).select(F.col("doc").cast(doc_type).alias("doc"))
    elif args.ids_parquet:
        ids = spark.read.parquet(args.ids_parquet).select(
            F.col("doc_id").cast(doc_type).alias("doc")
        )
    else:
        raise ValueError("purge needs --ids or --ids-parquet")
    n_before = hist.select("doc").distinct().count()
    kept = hist.join(F.broadcast(ids), "doc", "left_anti")
    staging = args.index.rstrip("/") + "_staging"
    save_minhash_index(kept, staging, k=k, bands=bands)
    n_after = (
        spark.read.parquet(os.path.join(staging, "index"))
        .select("doc")
        .distinct()
        .count()
    )
    _swap_index(args.index, staging)
    summary = spark.createDataFrame(
        [(int(n_before), int(n_after), int(n_before - n_after))],
        "n_docs_before long, n_docs_after long, n_purged long",
    )
    write_metrics_json(summary, os.path.join(args.output_dir, "summary"))
    out = summary.collect()[0].asDict()
    out["index"] = args.index
    return out


def cmd_ann(args) -> dict:
    """Similarity search: build the chosen index over ``embeddings`` and
    write per-query top-k neighbors. Trained structures (KMeans
    centers, PQ codebooks) are the offline index-build step."""
    from .io import Tables
    from .io.sinks import write_metrics_json
    from .operators.similarity import (
        cosine_topk,
        ivf_topk,
        ivfpq_topk,
        lsh_topk,
        pq_topk,
        train_ivf_centroids,
    )
    from .session import get_spark

    spark = get_spark("hpml-ann", cpus=args.cpus, shuffle_partitions=args.cpus)
    emb = Tables(spark, args.data_dir).embeddings
    queries = emb.filter(F.col("vec_id") % args.queries_mod == 0)
    if args.method == "exact":
        topk = cosine_topk(emb, queries, k=args.k)
    elif args.method == "lsh":
        topk = lsh_topk(emb, queries, k=args.k, n_planes=4, n_tables=8)
    elif args.method == "ivf":
        cents = train_ivf_centroids(emb, k=16, max_iter=5)
        topk = ivf_topk(emb, queries, centroids=cents, k=args.k, n_probe=3)
    elif args.method == "pq":
        topk = pq_topk(emb, queries, k=args.k, rerank=4)
    else:
        from .operators.similarity import (
            load_ivfpq_index,
            save_ivfpq_index,
            train_ivfpq_index,
        )

        load_dir = getattr(args, "load_index", None)
        index = (
            load_ivfpq_index(spark, load_dir)
            if load_dir
            else train_ivfpq_index(emb)
        )
        save_dir = getattr(args, "save_index", None)
        if save_dir:
            save_ivfpq_index(spark, index, save_dir)
        topk = ivfpq_topk(
            emb, queries, k=args.k, n_probe=8, rerank=4, index=index
        )
    out_path = os.path.join(args.output_dir, "neighbors")
    topk.write.mode("overwrite").parquet(out_path)
    back = spark.read.parquet(out_path)
    summary = back.agg(
        F.countDistinct("query_id").cast("long").alias("n_queries"),
        F.count("*").cast("long").alias("n_results"),
        F.round(F.avg("cosine"), 6).alias("avg_cosine"),
    )
    write_metrics_json(summary, os.path.join(args.output_dir, "summary"))
    out = summary.collect()[0].asDict()
    out["neighbors"] = out_path
    return out


def cmd_tokenize(args) -> dict:
    """BPE tokenizer training (operators/bpe.py): merges + the
    segmented vocabulary (word -> tokens) as parquet — tokenizing a
    corpus afterwards is a JOIN against that table, never a re-merge
    over raw text."""
    from .io import Tables
    from .io.sinks import write_metrics_json
    from .operators.bpe import bpe_segment_words, train_bpe, word_counts
    from .session import get_spark

    spark = get_spark("hpml-tok", cpus=args.cpus, shuffle_partitions=args.cpus)
    docs = Tables(spark, args.data_dir).documents
    merges = train_bpe(docs, n_merges=args.n_merges)
    merges_path = os.path.join(args.output_dir, "merges")
    spark.createDataFrame(
        [(i + 1, l, r, n) for i, (l, r, n) in enumerate(merges)],
        "rank int, left string, right string, pair_count long",
    ).write.mode("overwrite").parquet(merges_path)
    vocab_path = os.path.join(args.output_dir, "vocab")
    bpe_segment_words(word_counts(docs), merges).write.mode(
        "overwrite"
    ).parquet(vocab_path)
    back = spark.read.parquet(vocab_path)
    summary = back.agg(
        F.lit(len(merges)).alias("n_merges"),
        F.count("*").cast("long").alias("n_vocab_words"),
        F.sum(F.col("n") * F.col("n_tokens")).cast("long").alias(
            "n_corpus_tokens"
        ),
        F.round(
            F.sum(F.col("n") * F.col("n_tokens"))
            / F.sum(F.col("n") * (F.length("word") + 1)),
            6,
        ).alias("compression_vs_chars"),
    )
    write_metrics_json(summary, os.path.join(args.output_dir, "summary"))
    out = summary.collect()[0].asDict()
    out.update({"merges": merges_path, "vocab": vocab_path})
    return out


def cmd_split(args) -> dict:
    """Cluster-safe corpus split: near-dup pairs -> closure -> hash of
    the cluster id; summary reports per-split doc counts and verifies
    zero pair-straddles by construction (split is a pure function of
    cluster_id)."""
    from .io import Tables
    from .io.sinks import write_metrics_json
    from .ml.splits import cluster_safe_split
    from .operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
    from .session import get_spark

    spark = get_spark("hpml-split", cpus=args.cpus, shuffle_partitions=args.cpus)
    docs = Tables(spark, args.data_dir).documents
    if args.method == "ngram":
        pairs = ngram_jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=args.threshold,
            max_shingle_frac=0.1,
        )
    else:
        pairs = minhash_lsh_pairs(
            docs, "doc_id", "text", k=3, n_hashes=32, bands=8,
            threshold=args.threshold,
        )
    out = cluster_safe_split(
        docs, pairs, id_col="doc_id", train_frac=args.train_frac,
        mode=args.hash_mode,
    )
    out_path = os.path.join(args.output_dir, "split")
    out.write.mode("overwrite").parquet(out_path)
    back = spark.read.parquet(out_path)
    summary = back.groupBy("split").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("cluster_id").cast("long").alias("n_clusters"),
    )
    write_metrics_json(summary, os.path.join(args.output_dir, "summary"))
    res = {r["split"]: r["n_docs"] for r in summary.collect()}
    res["split_path"] = out_path
    return res


def cmd_mix(args) -> dict:
    """Mixture weights table (temperature or UniMax) written as parquet
    + JSON — the input manifest for weighted corpus assembly."""
    from .io import Tables
    from .io.sinks import write_metrics_json
    from .operators.sampling import mixture_weights, unimax_weights
    from .session import get_spark

    spark = get_spark("hpml-mix", cpus=args.cpus, shuffle_partitions=args.cpus)
    docs = Tables(spark, args.data_dir).documents
    if args.policy == "temperature":
        w = mixture_weights(docs, args.stratum, args.alpha, args.target_total)
    else:
        w = unimax_weights(
            docs, args.stratum, "text", budget_frac=args.budget_frac,
            epochs=args.epochs,
        )
    out_path = os.path.join(args.output_dir, "weights")
    w.write.mode("overwrite").parquet(out_path)
    write_metrics_json(
        spark.read.parquet(out_path), os.path.join(args.output_dir, "summary")
    )
    rows = w.collect()
    result = {
        "policy": args.policy,
        "n_strata": len(rows),
        "weights_path": out_path,
    }
    if args.materialize:
        if args.policy != "temperature":
            raise SystemExit("--materialize requires --policy temperature "
                             "(unimax allocates tokens, not epochs)")
        from .operators.sampling import materialize_epochs

        eps = spark.read.parquet(out_path).select(args.stratum, "epochs")
        multiset = materialize_epochs(
            docs.select("doc_id", args.stratum), args.stratum, eps
        )
        ms_path = os.path.join(args.output_dir, "multiset")
        multiset.write.mode("overwrite").parquet(ms_path)
        result["multiset_path"] = ms_path
        result["multiset_rows"] = spark.read.parquet(ms_path).count()
    return result


def cmd_stats(args) -> dict:
    """Statistical health suite: the engine's testing tier (KS drift,
    Welch A/B, chi-squared independence, Benford conformance,
    bootstrap CIs) run over one dataset and materialized as parquet
    tables + a one-row summary — the 'is this feed healthy?' artifact
    an operator schedules per-ingest. Each component is the SAME
    registered, oracle-checked query the correctness gate runs."""
    from .io.sinks import write_metrics_json
    from .queries import QUERIES, load_all
    from .session import get_spark

    load_all()
    spark = get_spark(
        "hpml-stats", cpus=args.cpus, shuffle_partitions=args.cpus
    )
    parts = {
        "ks_drift": "a_ks_test",
        "welch_ab": "a_ab_welch_test",
        "chi2_independence": "a_chi2_independence",
        "benford": "a_benford_test",
        "bootstrap_ci": "a_bootstrap_ci",
    }
    row: dict = {}
    for label, qname in parts.items():
        df = QUERIES[qname](spark, args.data_dir)
        path = os.path.join(args.output_dir, label)
        df.write.mode("overwrite").parquet(path)
        row[f"{label}_path"] = path
        row[f"{label}_rows"] = spark.read.parquet(path).count()
    ks = spark.read.parquet(row["ks_drift_path"])
    chi = spark.read.parquet(row["chi2_independence_path"])
    ben = spark.read.parquet(row["benford_path"])
    summary = (
        ks.agg(F.round(F.max("ks_d"), 6).alias("max_ks_d"))
        .crossJoin(
            chi.agg(F.round(F.sum("chi2_term"), 6).alias("chi2_stat"))
        )
        .crossJoin(
            ben.agg(
                F.round(F.sum("chi2_term"), 6).alias("benford_chi2_stat")
            )
        )
    )
    sm_path = os.path.join(args.output_dir, "summary")
    write_metrics_json(summary, sm_path)
    row.update(summary.collect()[0].asDict())
    return row


def cmd_profile(args) -> dict:
    """Corpus-health report: the per-doc signals (novelty, mixed-lang,
    duplication, heuristic quality) joined into one table, plus a
    corpus-level summary — what an operator reads before deciding
    dedup passes and mixture weights."""
    from .io import Tables
    from .io.sinks import write_metrics_json
    from .operators import textops
    from .session import get_spark

    spark = get_spark(
        "hpml-profile", cpus=args.cpus, shuffle_partitions=args.cpus
    )
    t = Tables(spark, args.data_dir)
    docs = t.documents
    nov = textops.ngram_novelty(docs)
    mixed = textops.mixed_lang_profile(docs)
    dup = textops.duplication_score(docs).select(
        "doc_id", F.col("dup_frac")
    )
    qual = docs.select(
        "doc_id", "lang", "source", textops.quality_score("text").alias("quality")
    )
    per_doc = (
        qual.join(nov.select("doc_id", "novelty_frac"), "doc_id")
        .join(mixed.select("doc_id", "majority_lang", "agreement"), "doc_id")
        .join(dup, "doc_id")
    )
    out_path = os.path.join(args.output_dir, "per_doc")
    per_doc.write.mode("overwrite").parquet(out_path)
    summary = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("novelty_frac"), 6).alias("mean_novelty"),
        F.round(F.avg("dup_frac"), 6).alias("mean_dup_frac"),
        F.round(F.avg("quality"), 6).alias("mean_quality"),
        F.round(F.avg((F.col("agreement") < 1.0).cast("double")), 6).alias(
            "mixed_lang_doc_frac"
        ),
    )
    sm_path = os.path.join(args.output_dir, "summary")
    write_metrics_json(summary, sm_path)
    row = summary.collect()[0].asDict()
    try:
        from .operators.similarity import source_centroid_drift

        drift = source_centroid_drift(docs, t.embeddings)
        dr_path = os.path.join(args.output_dir, "source_drift")
        drift.write.mode("overwrite").parquet(dr_path)
        row["source_drift_path"] = dr_path
    except Exception:
        row["source_drift_path"] = None  # no embeddings table
    row["per_doc_path"] = out_path
    return row


def main(argv: list[str] | None = None) -> dict:
    args = _parser().parse_args(argv)
    if args.command == "prep":
        return cmd_prep(args)
    if args.command == "dedup":
        return cmd_dedup(args)
    if args.command == "ingest":
        return cmd_ingest(args)
    if args.command == "purge":
        return cmd_purge(args)
    if args.command == "ann":
        return cmd_ann(args)
    if args.command == "tokenize":
        return cmd_tokenize(args)
    if args.command == "split":
        return cmd_split(args)
    if args.command == "mix":
        return cmd_mix(args)
    if args.command == "profile":
        return cmd_profile(args)
    if args.command == "stats":
        return cmd_stats(args)
    return cmd_train(args) if args.command == "train" else cmd_evaluate(args)


if __name__ == "__main__":
    main()
