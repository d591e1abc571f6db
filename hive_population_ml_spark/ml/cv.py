"""Fold-column cross-validation with out-of-fold predictions + ensembles
— SURVEY.md §2.8 M13/M14.

The reference uses sklearn ``cross_val_predict`` (train_ensemble.py:
150-158) and averages/R2-weights per-model prediction vectors
(train_ensemble.py:169-197). MLlib's CrossValidator selects models but
does not emit OOF predictions, so this is a small explicit loop:
fold assignment is a DETERMINISTIC hash column (survives re-runs and
repartitioning — unlike zipWithIndex-style fold numbering), each fold
fits on the complement and transforms the held-out fold, and the union
of transformed folds is the OOF prediction table.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_fold(df: DataFrame, id_col: str, k: int = 5, seed: int = 42) -> DataFrame:
    return df.withColumn(
        "fold", F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(k))
    )


def oof_predict(
    df: DataFrame,
    estimator,
    id_col: str,
    k: int = 5,
    seed: int = 42,
    prediction_col: str = "prediction",
) -> DataFrame:
    """Out-of-fold predictions: for each fold f, fit on folds != f,
    predict fold f; union. One model fit per fold (k fits total)."""
    folded = with_fold(df, id_col, k, seed).cache()
    parts = []
    for f in range(k):
        train = folded.filter(F.col("fold") != f)
        test = folded.filter(F.col("fold") == f)
        model = estimator.fit(train)
        parts.append(model.transform(test))
    out = reduce(lambda a, b: a.unionByName(b), parts)
    return out.drop("fold")


def ensemble_predictions(
    preds: dict[str, DataFrame],
    id_col: str,
    prediction_col: str = "prediction",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """M14/J6: join per-model OOF prediction tables on the row id and
    blend. ``weights=None`` -> simple average; else normalized weighted
    sum (the reference's max(0.01, r2+1) guard is applied by callers)."""
    names = list(preds)
    joined = None
    for name in names:
        p = preds[name].select(
            F.col(id_col), F.col(prediction_col).alias(f"pred_{name}")
        )
        joined = p if joined is None else joined.join(p, id_col)
    if weights is None:
        expr = reduce(
            lambda a, b: a + b, [F.col(f"pred_{n}") for n in names]
        ) / float(len(names))
    else:
        total = sum(weights[n] for n in names)
        expr = reduce(
            lambda a, b: a + b,
            [F.col(f"pred_{n}") * (weights[n] / total) for n in names],
        )
    return joined.withColumn("pred_ensemble", expr)
