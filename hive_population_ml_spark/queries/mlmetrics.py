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
from ..operators.parallelism import fan_out_by
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
    # Aggregate BELOW the join: lineitem collapses to one row per order
    # first, so the join carries |orders| rows instead of |lineitem| —
    # the aggregate-pushdown Catalyst won't do on its own (2x at sf0.1,
    # and the gap grows with lineitems-per-order at 100 TB).
    # fan_out_by: a one-row-group scan runs the whole per-order partial
    # agg on one core; hashing on the group key keeps every order's
    # rows in ONE partition, which satisfies the aggregation's
    # clustering requirement (Catalyst elides the agg's own exchange —
    # note the partition COUNTS can differ: fan_out_by targets
    # defaultParallelism, the agg exchange would use
    # spark.sql.shuffle.partitions), and with a single row-bearing
    # scan task each group still accumulates in scan order —
    # bit-identical results. No-op on any multi-row-group table.
    per_order = fan_out_by(
        t.lineitem.select("l_orderkey", "l_extendedprice", "l_discount"),
        "l_orderkey",
    ).groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("y_hat"),
        (F.lit(65000.0) * F.count("*")).alias("y_hat2"),
    )
    return per_order.join(
        t.orders.select("o_orderkey", F.col("o_totalprice").alias("y")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select("o_orderkey", "y", "y_hat", "y_hat2")


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
    """All six metrics in ONE distributed aggregation. R²'s total sum of
    squares comes from the algebraic identity Σ(y-ȳ)² = Σy² - (Σy)²/n —
    no second pass and no global window (which would funnel every row
    through a single partition at scale)."""
    p = _preds(spark, sf_dir)
    e = F.col("y") - F.col("y_hat")
    ss_res = F.sum(e * e)
    ss_tot = F.sum(F.col("y") * F.col("y")) - (
        F.sum("y") * F.sum("y") / F.count("*")
    )
    return p.agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.abs(e)), 4).alias("mae"),
        F.round(F.sqrt(F.avg(e * e)), 4).alias("rmse"),
        F.round(1 - ss_res / ss_tot, 6).alias("r2"),
        F.round(F.sqrt(F.avg(e * e)) / (F.max("y") - F.min("y")), 6).alias("nrmse"),
        F.round(
            F.avg(F.when(F.col("y") != 0, F.abs(e / F.col("y")))), 6
        ).alias("mape"),
    )


# -- M15 + M17: classification metrics incl. balanced accuracy and the
# confusion-matrix cells (metrics.py:23-74,116-154; merged so the
# oracle-backed surface fits the driver's 50-entry correctness window) -----

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
             / 2.0, 6) AS balanced_accuracy,
       CAST(sum(CAST(yt = 1 AND yp = 1 AS INT)) AS BIGINT) AS n_tp,
       CAST(sum(CAST(yt = 0 AND yp = 0 AS INT)) AS BIGINT) AS n_tn,
       CAST(sum(CAST(yt = 0 AND yp = 1 AS INT)) AS BIGINT) AS n_fp,
       CAST(sum(CAST(yt = 1 AND yp = 0 AS INT)) AS BIGINT) AS n_fn
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
        tp.cast("bigint").alias("n_tp"),
        tn.cast("bigint").alias("n_tn"),
        fp.cast("bigint").alias("n_fp"),
        fn.cast("bigint").alias("n_fn"),
    )


# -- M1: StandardScaler semantics as relational algebra ---------------------
# (preprocessing.py:524-527 / dataset.py:117-123: fit on one split, apply
#  everywhere). Spark-side the stats come from ONE tiny agg broadcast back —
#  not a global window, which would funnel every row through one partition.

@register(
    "m1_standard_scale",
    oracle="""
WITH p AS (
    SELECT o_orderkey, o_custkey, o_totalprice,
           CASE WHEN o_custkey % 10 < 7 THEN 'train' ELSE 'eval' END AS split
    FROM orders
),
stats AS (
    SELECT avg(o_totalprice) AS mu, stddev_samp(o_totalprice) AS sigma
    FROM p WHERE split = 'train'
)
SELECT split,
       count(*) AS n,
       round(avg((o_totalprice - mu) / sigma), 6) AS scaled_mean,
       round(stddev_samp((o_totalprice - mu) / sigma), 6) AS scaled_std,
       round(min((o_totalprice - mu) / sigma), 6) AS scaled_min,
       round(max((o_totalprice - mu) / sigma), 6) AS scaled_max
FROM p, stats
GROUP BY split
""",
)
def m1_standard_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-fitted z-scaling applied to all splits; per-split moments of
    the scaled feature prove fit-on-train/apply-everywhere semantics
    (train split comes out ~N(0,1), eval keeps its shift)."""
    t = Tables(spark, sf_dir)
    p = t.orders.select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_custkey") % 10 < 7, "train").otherwise("eval").alias("split"),
    )
    stats = (
        p.filter(F.col("split") == "train")
        .agg(
            F.avg("o_totalprice").alias("mu"),
            F.stddev_samp("o_totalprice").alias("sigma"),
        )
    )
    z = (F.col("o_totalprice") - F.col("mu")) / F.col("sigma")
    return (
        p.crossJoin(F.broadcast(stats))
        .groupBy("split")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(z), 6).alias("scaled_mean"),
            F.round(F.stddev_samp(z), 6).alias("scaled_std"),
            F.round(F.min(z), 6).alias("scaled_min"),
            F.round(F.max(z), 6).alias("scaled_max"),
        )
    )


# -- M13: fold-column CV with out-of-fold predictions -----------------------
# (train_ensemble.py:150-158 cross_val_predict). The "model" is the
# leave-fold-out mean: OOF prediction for fold f = mean(y of all other
# folds) — computable from per-fold partial sums, i.e. ONE aggregation
# then pure column arithmetic. This is exactly how fold-column CV avoids
# k separate passes at scale.

@register(
    "m13_oof_folds",
    oracle="""
WITH lab AS (
    SELECT o_orderkey, o_totalprice AS y, o_orderkey % 5 AS fold FROM orders
),
per_fold AS (
    SELECT fold, count(*) AS n_f, sum(y) AS sum_f, avg(abs(y)) AS scale_f
    FROM lab GROUP BY fold
),
tot AS (SELECT sum(n_f) AS n_all, sum(sum_f) AS sum_all FROM per_fold)
SELECT fold, n_f AS n,
       round((sum_all - sum_f) / (n_all - n_f), 6) AS oof_pred,
       round((SELECT avg(abs(y - (tot.sum_all - pf.sum_f) / (tot.n_all - pf.n_f)))
              FROM lab WHERE lab.fold = pf.fold), 6) AS oof_mae
FROM per_fold pf, tot
ORDER BY fold
""",
)
def m13_oof_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    lab = t.orders.select(
        (F.col("o_orderkey") % 5).alias("fold"), F.col("o_totalprice").alias("y")
    )
    w = Window.partitionBy()
    per_fold = lab.groupBy("fold").agg(
        F.count("*").alias("n_f"), F.sum("y").alias("sum_f")
    )
    per_fold = per_fold.select(
        "fold",
        "n_f",
        "sum_f",
        F.sum("n_f").over(w).alias("n_all"),
        F.sum("sum_f").over(w).alias("sum_all"),
    ).withColumn(
        "oof_pred_raw",
        (F.col("sum_all") - F.col("sum_f")) / (F.col("n_all") - F.col("n_f")),
    )
    # join the constant OOF prediction back per fold; MAE in one agg.
    joined = lab.join(F.broadcast(per_fold), "fold")
    return (
        joined.groupBy("fold")
        .agg(
            F.count("*").alias("n"),
            F.round(F.first("oof_pred_raw"), 6).alias("oof_pred"),
            F.round(F.avg(F.abs(F.col("y") - F.col("oof_pred_raw"))), 6).alias(
                "oof_mae"
            ),
        )
        .orderBy("fold")
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


# -- M15 (AUC): exact ROC-AUC, computed scalably -----------------------------
# The ORACLE uses the straightforward Mann-Whitney rank identity (global
# rank is fine in DuckDB at oracle scale); the SPARK plan uses
# ml/metrics.py::binned_rank_auc — the same exact statistic with the
# global per-row sort replaced by per-bin parallel windows plus one
# window over the <=4096-row bin summary. Both sides agree to 6 decimals
# because the binned form is exact, not a trapezoid approximation.

@register(
    "m15_auc_roc",
    oracle=f"""
WITH p AS ({_PRED_SQL}),
r AS (
    SELECT CAST(y >= 250000 AS INT) AS yt,
           rank() OVER (ORDER BY y_hat)
             + (count(*) OVER (PARTITION BY y_hat) - 1) / 2.0 AS midrank
    FROM p
)
SELECT round(
    (sum(CASE WHEN yt = 1 THEN midrank END)
     - sum(yt) * (sum(yt) + 1) / 2.0)
    / (sum(yt) * (count(*) - sum(yt))), 6) AS auc_roc,
    CAST(sum(yt) AS BIGINT) AS n_pos,
    CAST(count(*) - sum(yt) AS BIGINT) AS n_neg
FROM r
""",
)
def m15_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.metrics import binned_rank_auc

    p = _preds(spark, sf_dir).select(
        (F.col("y") >= 250000).cast("int").alias("yt"), "y_hat"
    )
    auc = binned_rank_auc(p, label_col="yt", score_col="y_hat")
    return auc.select(
        F.round("auc", 6).alias("auc_roc"), "n_pos", "n_neg"
    )


# -- Calibration (Brier + ECE): training-pipeline evaluation beyond the
# reference's metric set; same scalable-exact binned posture as the AUC.
# Rotated INTO the driver's hash-check window in round 4 (was
# SHADOW_ORACLE/pytest-checked in round 3).

@register(
    "m_calibration",
    oracle=f"""
WITH p AS ({_PRED_SQL}),
s AS (
    SELECT CAST(y >= 250000 AS INT) AS yt,
           least(1.0, y_hat / 500000.0) AS ph
    FROM p
),
b AS (
    SELECT least(CAST(floor(ph * 10) AS BIGINT), 9) AS bin,
           count(*) AS n, sum(ph) AS sum_p,
           CAST(sum(yt) AS BIGINT) AS sum_y,
           sum((ph - yt) * (ph - yt)) AS sum_sq
    FROM s GROUP BY 1
)
SELECT round(sum(sum_sq) / sum(n), 9) AS brier,
       round(sum(abs(sum_p - sum_y)) / sum(n), 9) AS ece,
       count(*) AS n_bins_nonempty,
       CAST(sum(n) AS BIGINT) AS n
FROM b
""",
)
def m_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier + ECE over the deterministic scored table (probability =
    squashed y_hat). Two aggregations total; exact at any scale."""
    from ..ml.metrics import calibration_report

    p = _preds(spark, sf_dir).select(
        (F.col("y") >= 250000).cast("int").alias("yt"),
        F.least(F.lit(1.0), F.col("y_hat") / F.lit(500000.0)).alias("ph"),
    )
    return calibration_report(p, label_col="yt", prob_col="ph", n_bins=10)
