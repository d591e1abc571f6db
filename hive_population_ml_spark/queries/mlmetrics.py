"""ML evaluation-metric queries — SURVEY.md §2.8 M14–M17.

The reference computes metrics with sklearn on driver-side arrays
(metrics.py:23-113); here each metric set is ONE distributed
aggregation over a predictions DataFrame — the M18 "streaming metric
accumulation" becomes unnecessary because Spark's partial aggregation
already is that accumulation.

The "model" under evaluation is deterministic so both engines agree:
  y      = o_totalprice
  y_hat  = per-order gross revenue  sum(l_extendedprice * (1-l_discount))
  labels = thresholded at 250000 (~median of o_totalprice)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import Tables
from .registry import register

_PRED_SQL = """
    SELECT o.o_orderkey,
           o.o_totalprice AS y,
           sum(l.l_extendedprice * (1 - l.l_discount)) AS y_hat,
           65000.0 * count(*) AS y_hat2
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_totalprice
"""


def _preds(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", F.col("o_totalprice").alias("y"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("y_hat"),
            (F.lit(65000.0) * F.count("*")).alias("y_hat2"),
        )
    )


# -- M16: regression metrics (metrics.py:77-113, train_ensemble.py:54-67) ---

@register(
    "m16_regression_metrics",
    oracle=f"""
WITH p AS ({_PRED_SQL}),
s AS (SELECT *, avg(y) OVER () AS ybar FROM p)
SELECT count(*) AS n,
       round(avg(abs(y - y_hat)), 4) AS mae,
       round(sqrt(avg((y - y_hat) * (y - y_hat))), 4) AS rmse,
       round(1 - sum((y - y_hat) * (y - y_hat))
               / sum((y - ybar) * (y - ybar)), 6) AS r2,
       round(sqrt(avg((y - y_hat) * (y - y_hat))) / (max(y) - min(y)), 6) AS nrmse,
       round(avg(CASE WHEN y <> 0 THEN abs((y - y_hat) / y) END), 6) AS mape
FROM s
""",
)
def m16_regression_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    p = _preds(spark, sf_dir)
    e = F.col("y") - F.col("y_hat")
    ybar = F.avg("y").over(Window.partitionBy())
    p = p.withColumn("dev", F.col("y") - ybar)
    return p.agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.abs(e)), 4).alias("mae"),
        F.round(F.sqrt(F.avg(e * e)), 4).alias("rmse"),
        F.round(1 - F.sum(e * e) / F.sum(F.col("dev") * F.col("dev")), 6).alias("r2"),
        F.round(F.sqrt(F.avg(e * e)) / (F.max("y") - F.min("y")), 6).alias("nrmse"),
        F.round(
            F.avg(F.when(F.col("y") != 0, F.abs(e / F.col("y")))), 6
        ).alias("mape"),
    )


# -- M17: confusion matrix (metrics.py:116-154) -----------------------------

@register(
    "m17_confusion_matrix",
    oracle=f"""
WITH p AS ({_PRED_SQL})
SELECT CAST(y >= 250000 AS INT) AS y_true,
       CAST(y_hat >= 250000 AS INT) AS y_pred,
       count(*) AS n
FROM p
GROUP BY 1, 2
""",
)
def m17_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _preds(spark, sf_dir)
    return (
        p.select(
            (F.col("y") >= 250000).cast("int").alias("y_true"),
            (F.col("y_hat") >= 250000).cast("int").alias("y_pred"),
        )
        .groupBy("y_true", "y_pred")
        .agg(F.count("*").alias("n"))
    )


# -- M15: classification metrics incl. balanced accuracy (metrics.py:23-74) -

@register(
    "m15_classification_metrics",
    oracle=f"""
WITH p AS ({_PRED_SQL}),
lab AS (
    SELECT CAST(y >= 250000 AS INT) AS yt, CAST(y_hat >= 250000 AS INT) AS yp
    FROM p
)
SELECT count(*) AS n,
       round(avg(CAST(yt = yp AS INT)), 6) AS accuracy,
       round(sum(CAST(yt = 1 AND yp = 1 AS INT))
             / NULLIF(sum(CAST(yp = 1 AS INT)), 0), 6) AS precision_pos,
       round(sum(CAST(yt = 1 AND yp = 1 AS INT))
             / NULLIF(sum(CAST(yt = 1 AS INT)), 0), 6) AS recall_pos,
       round(2.0 * sum(CAST(yt = 1 AND yp = 1 AS INT))
             / NULLIF(2.0 * sum(CAST(yt = 1 AND yp = 1 AS INT))
                      + sum(CAST(yt = 0 AND yp = 1 AS INT))
                      + sum(CAST(yt = 1 AND yp = 0 AS INT)), 0), 6) AS f1_pos,
       round((sum(CAST(yt = 1 AND yp = 1 AS INT)) / NULLIF(sum(CAST(yt = 1 AS INT)), 0)
            + sum(CAST(yt = 0 AND yp = 0 AS INT)) / NULLIF(sum(CAST(yt = 0 AS INT)), 0))
             / 2.0, 6) AS balanced_accuracy
FROM lab
""",
)
def m15_classification_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _preds(spark, sf_dir)
    lab = p.select(
        (F.col("y") >= 250000).cast("int").alias("yt"),
        (F.col("y_hat") >= 250000).cast("int").alias("yp"),
    )
    yt, yp = F.col("yt"), F.col("yp")
    tp = F.sum(((yt == 1) & (yp == 1)).cast("int"))
    tn = F.sum(((yt == 0) & (yp == 0)).cast("int"))
    fp = F.sum(((yt == 0) & (yp == 1)).cast("int"))
    fn = F.sum(((yt == 1) & (yp == 0)).cast("int"))
    pos = F.sum((yt == 1).cast("int"))
    neg = F.sum((yt == 0).cast("int"))
    pred_pos = F.sum((yp == 1).cast("int"))
    return lab.agg(
        F.count("*").alias("n"),
        F.round(F.avg((yt == yp).cast("int")), 6).alias("accuracy"),
        F.round(tp / F.nullif(pred_pos, F.lit(0)), 6).alias("precision_pos"),
        F.round(tp / F.nullif(pos, F.lit(0)), 6).alias("recall_pos"),
        F.round(
            2.0 * tp / F.nullif(2.0 * tp + fp + fn, F.lit(0.0)), 6
        ).alias("f1_pos"),
        F.round(
            (tp / F.nullif(pos, F.lit(0)) + tn / F.nullif(neg, F.lit(0))) / 2.0, 6
        ).alias("balanced_accuracy"),
    )


# -- M14/J6: ensemble average + weighted blend (train_ensemble.py:169-197) --

@register(
    "m14_ensemble_blend",
    oracle=f"""
WITH p AS ({_PRED_SQL})
SELECT count(*) AS n,
       round(avg(abs(y - y_hat)), 4) AS mae_m1,
       round(avg(abs(y - y_hat2)), 4) AS mae_m2,
       round(avg(abs(y - (y_hat + y_hat2) / 2.0)), 4) AS mae_avg_ensemble,
       round(avg(abs(y - (0.6 * y_hat + 0.4 * y_hat2))), 4) AS mae_weighted_ensemble
FROM p
""",
)
def m14_ensemble_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _preds(spark, sf_dir)
    y, h1, h2 = F.col("y"), F.col("y_hat"), F.col("y_hat2")
    return p.agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.abs(y - h1)), 4).alias("mae_m1"),
        F.round(F.avg(F.abs(y - h2)), 4).alias("mae_m2"),
        F.round(F.avg(F.abs(y - (h1 + h2) / 2.0)), 4).alias("mae_avg_ensemble"),
        F.round(F.avg(F.abs(y - (0.6 * h1 + 0.4 * h2))), 4).alias(
            "mae_weighted_ensemble"
        ),
    )
