"""MLlib pipeline parity — SURVEY.md §2.8 M1/M2/M5/M9–M12.

Reference: sklearn StandardScaler fit on train only (dataset.py:
533-541), feature auto-detection (dataset.py:64-103), torch MLP /
sklearn Ridge/Lasso/RF/GBT (train_ensemble.py:135-142). Spark
re-expression: Imputer -> VectorAssembler -> StandardScaler inside a
``Pipeline`` (fit on the train split only, transform applied to
val/test — identical leakage discipline), estimators from
``pyspark.ml`` with the reference's hyperparameters.

MLP note (SURVEY §7.5): MLlib's MultilayerPerceptronClassifier covers
the classification head (M5); there is no MLlib MLP *regressor*, so
regression tasks use GBT/LinearRegression as the documented
capability substitution (the reference itself found aggregated-feature
models ≫ sequence models, EXPERIMENTS.md:54-69).
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.classification import MultilayerPerceptronClassifier
from pyspark.ml.feature import Imputer, StandardScaler, VectorAssembler
from pyspark.ml.regression import (
    GBTRegressor,
    LinearRegression,
    RandomForestRegressor,
)
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Reference exclude-set pattern (dataset.py:64-96): features are all
# numeric columns not in an explicit exclusion list.
DEFAULT_EXCLUDE = {"label", "split", "weight"}


def numeric_feature_cols(df: DataFrame, exclude: set[str] | None = None) -> list[str]:
    """M2 auto-detection: numeric columns minus the exclude set."""
    exclude = DEFAULT_EXCLUDE | (exclude or set())
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.NumericType) and f.name not in exclude
    ]


def feature_pipeline(
    feature_cols: list[str],
    output_col: str = "features",
    impute: bool = True,
    scale: bool = True,
) -> Pipeline:
    """M1/M2: Imputer -> VectorAssembler -> StandardScaler(withMean).

    Fit it on the TRAIN split only and reuse the fitted model on
    val/test — the reference's scaler-reuse discipline (M1).
    """
    stages = []
    cols = feature_cols
    if impute:
        imputed = [f"{c}__imp" for c in feature_cols]
        stages.append(
            Imputer(strategy="mean", inputCols=feature_cols, outputCols=imputed)
        )
        cols = imputed
    stages.append(VectorAssembler(inputCols=cols, outputCol="__raw_features"))
    if scale:
        stages.append(
            StandardScaler(
                withMean=True, withStd=True,
                inputCol="__raw_features", outputCol=output_col,
            )
        )
    else:
        stages[-1].setOutputCol(output_col)
    return Pipeline(stages=stages)


def reference_regressors(
    features_col: str = "features", label_col: str = "label", seed: int = 42
) -> dict:
    """M10–M12 with the reference's hyperparameters
    (train_ensemble.py:135-142)."""
    return {
        "ridge": LinearRegression(
            featuresCol=features_col, labelCol=label_col,
            regParam=1.0, elasticNetParam=0.0,
        ),
        "lasso": LinearRegression(
            featuresCol=features_col, labelCol=label_col,
            regParam=0.1, elasticNetParam=1.0,
        ),
        "random_forest": RandomForestRegressor(
            featuresCol=features_col, labelCol=label_col,
            numTrees=100, maxDepth=5, minInstancesPerNode=3, seed=seed,
        ),
        "gradient_boosting": GBTRegressor(
            featuresCol=features_col, labelCol=label_col,
            maxIter=50, maxDepth=3, seed=seed,
        ),
    }


def mlp_classifier(
    n_features: int,
    n_classes: int = 2,
    hidden: tuple[int, ...] = (128, 128, 128),
    features_col: str = "features",
    label_col: str = "label",
    seed: int = 42,
) -> MultilayerPerceptronClassifier:
    """M5: MLP classification head (reference: hidden_dim 128, 3 layers,
    mlp.py:47-260). MLlib MLP has no ``weightCol``; for the reference's
    class-weighted loss (M9, trainer.py:144-150,352-366) run the train
    split through :func:`balance_classes` first — inverse-frequency
    duplication is the sampling-side equivalent of inverse-frequency
    loss weights in expectation."""
    return MultilayerPerceptronClassifier(
        layers=[n_features, *hidden, n_classes],
        featuresCol=features_col,
        labelCol=label_col,
        seed=seed,
        maxIter=200,
    )


def balance_classes(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "id",
    seed: int = 42,
) -> DataFrame:
    """M9 for weight-less estimators: stratified duplication so every
    class reaches the majority class's cardinality in expectation.

    The reference applies inverse-frequency CLASS WEIGHTS to the loss
    (trainer.py:352-366: w_c = (1/n_c) / sum(1/n_c)); MLlib's MLP
    cannot take a weightCol, so the same gradient contribution is
    obtained by replicating each class-c row max_n/n_c times —
    floor(r) guaranteed copies plus one extra with probability
    frac(r), decided by a seeded hash of ``id_col`` (deterministic
    across runs and partitionings, M19).

    Scale shape: class counts are a tiny broadcast; replication is a
    map-side array_repeat+explode — no shuffle of the input, output is
    ~n_classes * max_n rows.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    counts = df.groupBy(label_col).agg(F.count("*").alias("__n"))
    ratios = counts.select(
        label_col,
        (F.max("__n").over(Window.partitionBy()) / F.col("__n")).alias("__r"),
    )
    j = df.join(F.broadcast(ratios), label_col)
    u = (
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_000))
        / 1_000_000.0
    )
    n_copies = (
        F.floor("__r") + (u < (F.col("__r") - F.floor("__r"))).cast("long")
    ).cast("int")
    return (
        j.withColumn("__copy", F.explode(F.array_repeat(F.lit(1), n_copies)))
        .drop("__r", "__copy")
    )
