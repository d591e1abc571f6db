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


class DualHeadEstimator:
    """Dual-head (multi-task) analog of the reference's DualHeadMLP
    (mlp.py:151-218; same pattern in lstm.py:243-340,
    transformer.py:345+): predict the exact frame count (regression)
    AND the high/low class (classification) for the same row.

    Torch shares backbone weights; MLlib has no shared-gradient
    multi-task estimator, so the Spark-idiomatic split is: the shared
    "backbone" is the fitted feature pipeline (impute → assemble →
    scale, fit ONCE on train — both heads see identical features), and
    the heads are an MLlib regressor (GBT by default; no MLP regressor
    exists — documented substitution, module docstring) plus the M5 MLP
    classifier. ``transform`` chains both models over one shared
    feature pass — one scan, no join, each head's outputs under its own
    column names.
    """

    def __init__(
        self,
        feature_cols: list[str],
        reg_label: str = "reg_label",
        cls_label: str = "cls_label",
        hidden: tuple[int, ...] = (128, 128, 128),
        n_classes: int = 2,
        seed: int = 42,
    ):
        self.feature_cols = feature_cols
        self.reg_label = reg_label
        self.cls_label = cls_label
        self.hidden = hidden
        self.n_classes = n_classes
        self.seed = seed

    def fit(self, train: DataFrame) -> "DualHeadModel":
        backbone = feature_pipeline(self.feature_cols).fit(train)
        feats = backbone.transform(train)
        reg = GBTRegressor(
            featuresCol="features",
            labelCol=self.reg_label,
            predictionCol="reg_prediction",
            maxIter=50,
            maxDepth=3,
            seed=self.seed,
        ).fit(feats)
        cls = MultilayerPerceptronClassifier(
            layers=[len(self.feature_cols), *self.hidden, self.n_classes],
            featuresCol="features",
            labelCol=self.cls_label,
            predictionCol="cls_prediction",
            probabilityCol="cls_probability",
            rawPredictionCol="cls_raw",
            seed=self.seed,
            maxIter=200,
        ).fit(feats)
        return DualHeadModel(backbone, reg, cls)


class DualHeadModel:
    """Fitted dual-head bundle; ``transform`` emits both heads' outputs."""

    def __init__(self, backbone, reg_model, cls_model):
        self.backbone = backbone
        self.reg_model = reg_model
        self.cls_model = cls_model

    def transform(self, df: DataFrame) -> DataFrame:
        return self.cls_model.transform(
            self.reg_model.transform(self.backbone.transform(df))
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
