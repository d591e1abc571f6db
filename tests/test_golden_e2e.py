"""Golden end-to-end pipeline (SURVEY.md §5.2 item 3): the full flagship
path — scan → interval join → stats bundle → leakage-safe split →
impute/assemble/scale → model → metrics — with fixed seeds on sf0.001.

Asserts structural invariants and metric reproducibility (two runs give
identical metrics) rather than exact reference RNG values (SURVEY §7.5:
we match semantics, not the reference's random stream).
"""

import pytest
from pyspark.sql import functions as F

from hive_population_ml_spark.ml.features import build_feature_table
from hive_population_ml_spark.ml.pipeline import (
    feature_pipeline,
    numeric_feature_cols,
    reference_regressors,
)


@pytest.fixture(scope="module")
def splits(spark, sf_dir):
    ft = build_feature_table(spark, sf_dir, window_days=30, min_count=1).cache()
    train = ft.filter(F.col("split") == "train")
    test = ft.filter(F.col("split") == "test")
    return ft, train, test


def _run_once(train, test):
    feats = numeric_feature_cols(
        train, exclude={"anchor_orderkey", "custkey", "target"}
    )
    pipe = feature_pipeline(feats).fit(train)
    model = reference_regressors()["gradient_boosting"].fit(
        pipe.transform(train).select(
            "features", F.col("target").alias("label")
        )
    )
    scored = model.transform(
        pipe.transform(test).select("features", F.col("target").alias("label"))
    )
    from pyspark.ml.evaluation import RegressionEvaluator

    ev = RegressionEvaluator(metricName="rmse")
    return ev.evaluate(scored), scored.count()


def test_golden_pipeline_reproducible(splits):
    ft, train, test = splits
    assert train.count() > 100 and test.count() > 20
    rmse1, n1 = _run_once(train, test)
    rmse2, n2 = _run_once(train, test)
    assert n1 == n2
    assert rmse1 == rmse2, "seeded pipeline must be bit-reproducible"
    # the model must beat the trivial constant predictor on test
    stats = test.agg(
        F.stddev_samp("target").alias("sd"), F.avg("target").alias("mu")
    ).first()
    assert rmse1 < 2.0 * stats["sd"], f"rmse {rmse1} vs target sd {stats['sd']}"


def test_golden_split_is_partition(splits):
    ft, train, test = splits
    n_all = ft.count()
    n_parts = (
        ft.groupBy("split").count().agg(F.sum("count")).first()[0]
    )
    assert n_all == n_parts
    tr = {r[0] for r in train.select("custkey").distinct().collect()}
    te = {r[0] for r in test.select("custkey").distinct().collect()}
    assert not (tr & te)
