"""ML pipeline parity tests — SURVEY.md §2.8/§5.2 items 3-4.

Property-style checks (split disjointness, scaler statistics, OOF
coverage) rather than golden metric values: SURVEY §7.5 — we match the
reference's *semantics* (ratios, leakage-freedom, estimator wiring),
not its RNG stream.
"""

import pytest
from pyspark.sql import functions as F

from hive_population_ml_spark.ml.cv import ensemble_predictions, oof_predict, with_fold
from hive_population_ml_spark.ml.features import build_feature_table
from hive_population_ml_spark.ml.pipeline import (
    feature_pipeline,
    numeric_feature_cols,
    reference_regressors,
)
from hive_population_ml_spark.ml.splits import split_by_group, split_by_hash


@pytest.fixture(scope="module")
def feature_table(spark, sf_dir):
    # ±30d window + gate 1 -> ~950 samples / ~146 groups at sf0.001:
    # enough that every hash-split bucket is non-empty.
    return build_feature_table(spark, sf_dir, window_days=30, min_count=1).cache()


def test_feature_table_shape(feature_table):
    n = feature_table.count()
    assert n > 0
    cols = set(feature_table.columns)
    assert {"anchor_orderkey", "custkey", "target", "label", "split"} <= cols
    assert "price_avg" in cols and "qty_std" in cols


def test_group_split_no_leakage(feature_table):
    for splitter in (split_by_group, split_by_hash):
        train, val, test = splitter(feature_table, "custkey", seed=42)
        tr = {r["custkey"] for r in train.select("custkey").distinct().collect()}
        va = {r["custkey"] for r in val.select("custkey").distinct().collect()}
        te = {r["custkey"] for r in test.select("custkey").distinct().collect()}
        assert not (tr & va) and not (tr & te) and not (va & te)
        assert len(tr) > len(va) and len(tr) > len(te)


def test_split_deterministic(feature_table):
    a = split_by_hash(feature_table, "custkey", seed=42)[0]
    b = split_by_hash(feature_table, "custkey", seed=42)[0]
    assert a.count() == b.count()
    assert a.select(F.sum("anchor_orderkey")).first()[0] == b.select(
        F.sum("anchor_orderkey")
    ).first()[0]


def test_feature_pipeline_scales_train_only(feature_table):
    feats = numeric_feature_cols(
        feature_table, exclude={"anchor_orderkey", "custkey", "target"}
    )
    assert len(feats) >= 15
    train, _, test = split_by_hash(feature_table, "custkey", seed=42)
    pipe = feature_pipeline(feats).fit(train)
    scaled_train = pipe.transform(train)
    # scaled train features have ~zero mean per dimension
    from pyspark.ml.stat import Summarizer

    mean_vec = scaled_train.select(Summarizer.mean(F.col("features"))).first()[0]
    assert max(abs(v) for v in mean_vec.toArray()) < 1e-6
    # the SAME fitted model transforms test (scaler-reuse discipline M1)
    assert pipe.transform(test).select("features").first() is not None


def test_regressors_and_ensemble(feature_table):
    feats = numeric_feature_cols(
        feature_table, exclude={"anchor_orderkey", "custkey", "target"}
    )
    pipe = feature_pipeline(feats).fit(feature_table)
    data = pipe.transform(feature_table).select(
        "anchor_orderkey", "features", F.col("target").alias("label")
    )
    regs = reference_regressors()
    preds = {}
    for name in ("ridge", "gradient_boosting"):
        preds[name] = oof_predict(data, regs[name], "anchor_orderkey", k=3)
        assert preds[name].count() == data.count()  # OOF covers every row
    ens = ensemble_predictions(preds, "anchor_orderkey")
    row = ens.select(
        F.avg(F.abs(F.col("pred_ensemble") - (F.col("pred_ridge") + F.col("pred_gradient_boosting")) / 2))
    ).first()
    assert row[0] < 1e-9  # average ensemble == mean of members


def test_fold_assignment_partition(feature_table):
    folded = with_fold(feature_table, "anchor_orderkey", k=5)
    counts = folded.groupBy("fold").count().collect()
    assert len(counts) == 5
    assert folded.count() == sum(r["count"] for r in counts)


def test_mlp_classifier_trains(spark, feature_table):
    from hive_population_ml_spark.ml.pipeline import mlp_classifier

    feats = ["price_avg", "price_std", "qty_avg", "n_rows"]
    pipe = feature_pipeline(feats).fit(feature_table)
    data = pipe.transform(feature_table).select("features", "label")
    clf = mlp_classifier(n_features=4, n_classes=2, hidden=(8,), seed=42)
    model = clf.fit(data)
    out = model.transform(data)
    assert out.filter(F.col("prediction").isin(0.0, 1.0)).count() == data.count()


# -- binned_rank_auc: exact AUC without a global per-row sort ----------------

def _exact_auc(pairs):
    """Pure-python tie-aware Mann-Whitney AUC for small fixtures."""
    pos = sorted(s for y, s in pairs if y == 1)
    neg = sorted(s for y, s in pairs if y == 0)
    import bisect

    u = 0.0
    for s in pos:
        lo = bisect.bisect_left(neg, s)
        hi = bisect.bisect_right(neg, s)
        u += lo + 0.5 * (hi - lo)
    return u / (len(pos) * len(neg))


@pytest.mark.parametrize("n_bins", [1, 7, 4096])
def test_binned_rank_auc_matches_exact(spark, n_bins):
    from hive_population_ml_spark.ml.metrics import binned_rank_auc

    import random

    rng = random.Random(7)
    # heavy ties on purpose: scores drawn from a small discrete set
    pairs = [(rng.randint(0, 1), rng.choice([0.1, 0.25, 0.25, 0.4, 0.8, 0.8]))
             for _ in range(500)]
    df = spark.createDataFrame(pairs, "yt int, s double")
    row = binned_rank_auc(df, "yt", "s", n_bins=n_bins).collect()[0]
    assert row["n_pos"] + row["n_neg"] == 500
    assert abs(row["auc"] - _exact_auc(pairs)) < 1e-12


def test_binned_rank_auc_constant_scores(spark):
    from hive_population_ml_spark.ml.metrics import binned_rank_auc

    df = spark.createDataFrame(
        [(1, 5.0)] * 10 + [(0, 5.0)] * 10, "yt int, s double"
    )
    row = binned_rank_auc(df, "yt", "s").collect()[0]
    assert row["auc"] == 0.5  # all ties -> chance


def test_binned_rank_auc_nan_raises_like_sklearn(spark):
    from hive_population_ml_spark.ml.metrics import binned_rank_auc

    df = spark.createDataFrame(
        [(1, 0.9), (0, 0.1), (1, float("nan")), (0, None)], "yt int, s double"
    )
    with pytest.raises(Exception, match="2 NaN/null scores"):
        binned_rank_auc(df, "yt", "s").collect()


def test_binned_rank_auc_all_nan_still_raises(spark):
    """ADVICE r3 regression: with EVERY score NaN/null the filtered side
    is an empty relation, and AQE empty-relation propagation elided the
    old smin-folded guard — a silent 1-row null-auc result. The guard
    now lives on the output row, which a global agg always emits."""
    from hive_population_ml_spark.ml.metrics import binned_rank_auc

    df = spark.createDataFrame(
        [(1, float("nan")), (0, None)], "yt int, s double"
    )
    with pytest.raises(Exception, match="2 NaN/null scores"):
        binned_rank_auc(df, "yt", "s").collect()


def test_binned_rank_auc_nan_drop_reports_count(spark):
    from hive_population_ml_spark.ml.metrics import binned_rank_auc

    clean = [(1, 0.9), (0, 0.1), (1, 0.7), (0, 0.4)]
    df = spark.createDataFrame(
        clean + [(1, float("nan")), (0, None)], "yt int, s double"
    )
    row = binned_rank_auc(df, "yt", "s", on_nan="drop").collect()[0]
    assert row["n_dropped_nan"] == 2
    assert row["n_pos"] == 2 and row["n_neg"] == 2
    assert abs(row["auc"] - _exact_auc(clean)) < 1e-12


def test_binned_rank_auc_no_global_row_sort(spark):
    """The executed plan must not funnel the full prediction table
    through one partition: every SinglePartition exchange feeds either a
    scalar aggregate or the <=n_bins bin summary, never the raw rows."""
    from hive_population_ml_spark.ml.metrics import binned_rank_auc

    df = spark.range(10000).selectExpr(
        "CAST(id % 2 AS INT) AS yt", "CAST(id % 997 AS DOUBLE) AS s"
    )
    plan = (
        binned_rank_auc(df, "yt", "s")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the old scale-killer: a Window directly over a SinglePartition sort
    # of the per-row table (rank over ORDER BY score). The new plan's only
    # windows are per-bin (hash-partitioned) or over the bin summary.
    assert "rank(" not in plan


# -- M9: class-weighted MLP via stratified duplication -----------------------

def test_balance_classes_reaches_parity_and_is_deterministic(spark):
    from hive_population_ml_spark.ml.pipeline import balance_classes

    import random

    rng = random.Random(3)
    rows = [(i, 0 if rng.random() < 0.9 else 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, label int")
    bal = balance_classes(df, "label", "id", seed=42)
    counts = {r["label"]: r["n"] for r in
              bal.groupBy("label").agg(F.count("*").alias("n")).collect()}
    n0, n1 = counts[0], counts[1]
    # expectation: both classes at majority cardinality (+-5% sampling noise)
    assert abs(n1 - n0) / n0 < 0.05, counts
    # determinism (M19): same seed -> identical multiset
    again = balance_classes(df, "label", "id", seed=42)
    assert bal.groupBy("id").count().subtract(again.groupBy("id").count()).count() == 0


def test_balanced_mlp_improves_minority_recall(spark):
    """Reference parity check for M9: inverse-frequency weighting must
    lift minority-class recall vs the unweighted fit on skewed data
    (trainer.py:352-366 semantics, approximated by duplication)."""
    import numpy as np
    from pyspark.ml.feature import VectorAssembler
    from hive_population_ml_spark.ml.pipeline import balance_classes, mlp_classifier

    rng = np.random.default_rng(11)
    n0, n1 = 1800, 200
    x0 = rng.normal(0.0, 1.0, size=(n0, 2))
    x1 = rng.normal(1.2, 1.0, size=(n1, 2))
    rows = [(i, float(x[0]), float(x[1]), 0) for i, x in enumerate(x0)]
    rows += [(n0 + i, float(x[0]), float(x[1]), 1) for i, x in enumerate(x1)]
    df = spark.createDataFrame(rows, "id long, f1 double, f2 double, label int")
    train = df.filter(F.col("id") % 4 != 0)
    test = df.filter(F.col("id") % 4 == 0)
    va = VectorAssembler(inputCols=["f1", "f2"], outputCol="features")

    def minority_recall(train_df):
        clf = mlp_classifier(n_features=2, n_classes=2, hidden=(8,), seed=42)
        model = clf.fit(va.transform(train_df))
        pred = model.transform(va.transform(test))
        tp = pred.filter((F.col("label") == 1) & (F.col("prediction") == 1.0)).count()
        fn = pred.filter((F.col("label") == 1) & (F.col("prediction") == 0.0)).count()
        return tp / (tp + fn)

    plain = minority_recall(train)
    weighted = minority_recall(balance_classes(train, "label", "id", seed=42))
    assert weighted > plain, (plain, weighted)
    assert weighted >= 0.5


# -- Dual-head (multi-task) estimator: mlp.py:151-218 analog -----------------

def test_dual_head_predicts_both_targets_in_one_pass(spark):
    """Reference DualHeadMLP semantics: one shared feature backbone,
    regression (frame count) + classification (high/low) heads, both
    outputs per row from a single transform."""
    import numpy as np
    from hive_population_ml_spark.ml.pipeline import DualHeadEstimator

    rng = np.random.default_rng(7)
    x = rng.normal(0.0, 1.0, size=(1200, 3))
    y = 10.0 + 4.0 * x[:, 0] - 2.0 * x[:, 1] + rng.normal(0, 0.3, 1200)
    hi = (y > np.median(y)).astype(int)
    rows = [
        (i, float(a), float(b), float(c), float(yy), int(h))
        for i, ((a, b, c), yy, h) in enumerate(zip(x, y, hi))
    ]
    df = spark.createDataFrame(
        rows, "id long, f1 double, f2 double, f3 double, reg_label double, cls_label int"
    )
    train = df.filter(F.col("id") % 4 != 0)
    test = df.filter(F.col("id") % 4 == 0)

    model = DualHeadEstimator(
        ["f1", "f2", "f3"], hidden=(16,), seed=42
    ).fit(train)
    pred = model.transform(test)
    assert {"reg_prediction", "cls_prediction", "cls_probability"} <= set(pred.columns)

    agg = pred.agg(
        F.avg(F.pow(F.col("reg_prediction") - F.col("reg_label"), 2)).alias("mse"),
        F.var_pop("reg_label").alias("var"),
        F.avg((F.col("cls_prediction") == F.col("cls_label")).cast("double")).alias("acc"),
    ).first()
    assert agg["mse"] < 0.25 * agg["var"]  # regression head genuinely fits
    assert agg["acc"] > 0.85  # classification head genuinely fits


# -- Learned quality classifier ----------------------------------------------


def test_quality_classifier_separates_crafted_docs(spark):
    """Train on weak labels over crafted docs; the model must rank an
    unseen good-style doc above an unseen bad-style doc."""
    from hive_population_ml_spark.ml.quality_clf import (
        score_quality,
        train_quality_classifier,
        weak_quality_labels,
    )

    good = "the quick brown fox jumps over the lazy dog " * 8
    bad = "4531 9981 2210 7743 0912 " * 10
    rows = [(i, good + f"tail{i}") for i in range(20)] + [
        (100 + i, bad + f"{i}") for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    labeled = weak_quality_labels(docs)
    # weak labels really split the crafted corpus
    assert labeled.filter("label = 1.0").count() == 20
    model = train_quality_classifier(labeled, n_features=1024)
    test = spark.createDataFrame(
        [(900, "the brown dog jumps over a quick fox " * 6),
         (901, "8812 3341 5567 9090 1123 " * 8)],
        "doc_id long, text string",
    )
    scores = {r["doc_id"]: r["p_good"] for r in score_quality(model, test).collect()}
    # unseen digit tokens hash to mostly-unseen features, so the bad
    # score floats toward the prior — require correct ordering with a
    # wide margin rather than absolute calibration
    assert scores[900] > 0.8 and scores[901] < 0.5, scores
    assert scores[900] - scores[901] > 0.5, scores


def test_quality_scoring_is_map_only(spark):
    from hive_population_ml_spark.ml.quality_clf import (
        score_quality,
        train_quality_classifier,
        weak_quality_labels,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = train_quality_classifier(weak_quality_labels(docs), n_features=512)
    plan = (
        score_quality(model, docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # scoring must stay a pure scan


def test_lda_topics_shape_simplex_and_determinism(spark, sf_oracle_dir):
    """Online-variational LDA corpus report: fixed k*n_terms shape,
    per-topic term weights positive and sub-simplex, terms drawn from
    the real vocabulary, dominant-topic transform covers every doc
    with a valid (topic, weight) pair, and the seeded fit is
    run-to-run deterministic on the same session."""
    from hive_population_ml_spark.io import Tables
    from hive_population_ml_spark.ml.topics import (
        doc_topics,
        fit_topics,
        topic_terms,
    )

    docs = Tables(spark, sf_oracle_dir).documents
    fitted = fit_topics(docs, k=4, max_iter=10)
    terms = topic_terms(docs, k=4, n_terms=5, max_iter=10, fitted=fitted).collect()
    assert len(terms) == 20
    assert {r["topic"] for r in terms} == {0, 1, 2, 3}
    by_topic: dict = {}
    for r in terms:
        assert 0.0 < r["weight"] < 1.0
        assert r["term"] and " " not in r["term"]
        by_topic.setdefault(r["topic"], []).append(r)
    for rows in by_topic.values():
        ranks = sorted(r["term_rank"] for r in rows)
        assert ranks == [1, 2, 3, 4, 5]
        ws = [r["weight"] for r in sorted(rows, key=lambda x: x["term_rank"])]
        assert ws == sorted(ws, reverse=True)  # describeTopics is ranked
        assert sum(ws) < 1.0  # top-5 mass is a sub-simplex slice
    again = topic_terms(docs, k=4, n_terms=5, max_iter=10).collect()
    assert sorted(map(tuple, terms)) == sorted(map(tuple, again))

    dt = doc_topics(docs, k=4, max_iter=10, fitted=fitted).collect()
    assert len(dt) == docs.count()
    assert all(0 <= r["topic"] <= 3 for r in dt)
    # dominant weight >= uniform share, <= 1
    assert all(0.25 <= r["topic_weight"] <= 1.0 for r in dt)
