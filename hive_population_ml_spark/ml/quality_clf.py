"""Learned corpus-quality classifier — the fastText/CCNet filter-model
tier (charter §2.10 extension; no reference citation exists — the
reference's estimators are tabular/sequence only).

The modern pretraining-data recipe scores every document with a cheap
linear classifier trained on weak labels (seed heuristics or a trusted
"gold" slice) and keeps/weights by the score. This module builds that
as a pure MLlib pipeline — RegexTokenizer -> HashingTF -> IDF ->
LogisticRegression — so both training and scoring are Spark-native:

- HashingTF is stateless (no vocabulary shuffle; the hash trick is the
  100 TB move — a fitted CountVectorizer would carry a corpus-sized
  vocab), fixed ``n_features`` dims.
- IDF fit is one distributed pass; its model is a broadcast vector.
- Scoring a corpus is a map-only transform chain — no shuffle, no
  Python UDFs (MLlib transforms are JVM-side).

Weak labels default to the repo's heuristic ``quality_score`` gate so
the classifier GENERALIZES the heuristic (learns token evidence
correlated with it) rather than needing hand labels; pass your own
labeled frame for the gold-slice workflow.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weak_quality_labels(
    docs: DataFrame,
    text_col: str = "text",
    good_threshold: float = 0.5,
) -> DataFrame:
    """Label docs by the heuristic quality gate (1 = good). The seed
    heuristic is deterministic, so the training set is too."""
    from ..operators.textops import quality_score

    return docs.withColumn(
        "label",
        (quality_score(text_col) >= F.lit(good_threshold)).cast("double"),
    )


def build_quality_pipeline(
    text_col: str = "text", n_features: int = 4096
) -> Pipeline:
    tok = RegexTokenizer(
        inputCol=text_col,
        outputCol="__tokens",
        pattern=r"\s+",
        toLowercase=True,
    )
    tf = HashingTF(
        inputCol="__tokens", outputCol="__tf", numFeatures=n_features
    )
    idf = IDF(inputCol="__tf", outputCol="__features")
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol="label",
        maxIter=30,
        regParam=0.01,
        standardization=True,
    )
    return Pipeline(stages=[tok, tf, idf, lr])


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    n_features: int = 4096,
) -> PipelineModel:
    """Fit the filter model on a frame carrying ``label`` (0/1)."""
    return build_quality_pipeline(text_col, n_features).fit(labeled)


def score_quality(
    model: PipelineModel, docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Score a corpus: (id_col, p_good) — P(label=1) from the fitted
    model. Map-only transform chain; round to 6 for stable reporting."""
    from pyspark.ml.functions import vector_to_array

    out = model.transform(docs)
    return out.select(
        F.col(id_col),
        F.round(
            vector_to_array(F.col("probability")).getItem(1), 6
        ).alias("p_good"),
    )
