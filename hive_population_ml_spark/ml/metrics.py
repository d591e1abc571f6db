"""Distributed model-evaluation metrics that stay exact at scale.

The reference computes ROC-AUC on a driver-side array
(src/training/metrics.py:54-74, sklearn.roc_auc_score); the naive
distributed translation — rank() over a global ORDER BY score — funnels
every prediction row through one partition and dies first at 100 TB.

``binned_rank_auc`` removes the global per-row sort while staying
EXACT (it is the Mann-Whitney statistic, not a trapezoid
approximation). Binning is used purely as a partitioning device:

  1. one pass: (min, max) of the score               -> 1 row, broadcast
  2. groupBy (bin, score): pos/neg counts per DISTINCT score
     (map-side partial agg; shuffle carries count rows only)
  3. groupBy bin: per-bin pos/neg totals             -> <= n_bins rows
  4. running negatives ACROSS bins: global window over the tiny bin
     summary (bounded by n_bins, never by data size)
  5. running negatives WITHIN each bin: window partitioned by bin —
     parallel across the cluster
  6. U = sum over distinct scores s of pos(s) * (neg_below(s) + 0.5*neg_at(s));
     AUC = U / (P*N)  — one final scalar aggregation.

Step 6 is the standard tie-aware identity for the rank-sum form
(sum of positive midranks - P(P+1)/2 == U), so the result matches the
exact global-rank computation bit-for-bit up to float addition order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def binned_rank_auc(
    preds: DataFrame,
    label_col: str = "yt",
    score_col: str = "y_hat",
    n_bins: int = 4096,
    on_nan: str = "raise",
) -> DataFrame:
    """Exact ROC-AUC with no global per-row sort.

    Returns a 1-row DataFrame: (auc double, n_pos long, n_neg long).
    ``label_col`` must be 0/1; ``score_col`` numeric.

    NaN/null scores would otherwise pick up a null bin id and silently
    vanish in the bin join — diverging from sklearn.roc_auc_score, which
    raises on NaN input. ``on_nan="raise"`` (default) reproduces sklearn:
    the job fails with a counted error message (checked lazily JVM-side —
    no extra action). ``on_nan="drop"`` excludes them but REPORTS the
    count in an extra ``n_dropped_nan`` output column so the exclusion is
    visible, never silent.
    """
    if on_nan not in ("raise", "drop"):
        raise ValueError(f"on_nan must be 'raise' or 'drop', got {on_nan!r}")
    p0 = preds.select(
        F.col(label_col).cast("long").alias("yt"),
        F.col(score_col).cast("double").alias("s"),
    )
    bad = F.col("s").isNull() | F.isnan("s")
    stats = p0.agg(
        F.min(F.when(~bad, F.col("s"))).alias("smin"),
        F.max(F.when(~bad, F.col("s"))).alias("smax"),
        F.sum(bad.cast("long")).alias("n_bad"),
    )
    p = p0.filter(~bad)
    raw_w = (F.col("smax") - F.col("smin")) / n_bins
    width = F.when(raw_w > 0, raw_w).otherwise(F.lit(1.0))
    binid = F.least(
        F.floor((F.col("s") - F.col("smin")) / width), F.lit(n_bins - 1)
    )

    # Per-distinct-score counts, already tagged with the bin.
    scores = (
        p.crossJoin(F.broadcast(stats))
        .select(binid.alias("bin"), "s", "yt")
        .groupBy("bin", "s")
        .agg(F.sum("yt").alias("n_pos"), F.count("*").alias("n_all"))
        .select(
            "bin", "s", "n_pos", (F.col("n_all") - F.col("n_pos")).alias("n_neg")
        )
    )

    # Bin summary: negatives in all strictly-lower bins. The global
    # window is over <= n_bins rows — a constant, not a data-sized set.
    bins = scores.groupBy("bin").agg(F.sum("n_neg").alias("bn"))
    wb = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    bins = bins.select(
        "bin", F.coalesce(F.sum("bn").over(wb), F.lit(0)).alias("neg_before_bin")
    )

    # Within-bin running negatives: partitioned by bin, parallel.
    ws = (
        Window.partitionBy("bin")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_score = scores.join(F.broadcast(bins), "bin").select(
        "n_pos",
        "n_neg",
        (
            F.col("neg_before_bin")
            + F.coalesce(F.sum("n_neg").over(ws), F.lit(0))
        ).alias("neg_less"),
    )

    u = F.sum(F.col("n_pos") * (F.col("neg_less") + 0.5 * F.col("n_neg")))
    # Global aggs emit exactly one row even over empty input, so the
    # out x stats cross join below is always 1x1 — and referencing the
    # guard from the OUTPUT row means it cannot be pruned. (The previous
    # form folded raise_error into stats.smin, consumed only via the
    # scores-side broadcast: with ALL scores NaN, p is empty and AQE
    # empty-relation propagation elided the broadcast, silently
    # returning a null-auc row instead of raising.)
    out = (
        per_score.agg(
            u.alias("u"),
            F.sum("n_pos").alias("n_pos"),
            F.sum("n_neg").alias("n_neg"),
        )
        .crossJoin(F.broadcast(stats.select("n_bad")))
    )
    auc = (F.col("u") / (F.col("n_pos") * F.col("n_neg"))).alias("auc")
    if on_nan == "raise":
        auc = (
            F.when(
                F.col("n_bad") > 0,
                F.raise_error(
                    F.format_string(
                        "binned_rank_auc: %d NaN/null scores; "
                        "sklearn.roc_auc_score raises on NaN — pass "
                        "on_nan='drop' to exclude (and count) them",
                        F.col("n_bad"),
                    )
                ).cast("double"),
            )
            .otherwise(F.col("u") / (F.col("n_pos") * F.col("n_neg")))
            .alias("auc")
        )
        return out.select(auc, "n_pos", "n_neg")
    return out.select(
        auc, "n_pos", "n_neg", F.col("n_bad").alias("n_dropped_nan")
    )


def calibration_report(
    df: DataFrame,
    label_col: str,
    prob_col: str,
    n_bins: int = 10,
    on_nan: str = "raise",
) -> DataFrame:
    """Brier score + expected calibration error, exactly, in two
    aggregations (bin agg -> summary over <= n_bins rows).

    Equal-width probability bins; ECE = sum_b (n_b/N)*|conf_b - acc_b|
    with conf_b = mean predicted probability and acc_b = positive rate
    in bin b. Like ``binned_rank_auc``, the binned form is the EXACT
    metric (ECE is defined on bins; Brier is a plain mean) — nothing
    here approximates, and no global sort or per-row window exists, so
    the plan is two shuffles regardless of corpus size.

    NaN/null probabilities get an explicit null bin counted in the SAME
    aggregation pass (no extra scan). ``on_nan="raise"`` (default)
    fails the job with the count — mirroring ``binned_rank_auc``'s
    contract; previously they silently diluted brier/ece (null sums
    skipped by the outer SUM while count(*) still fed n).
    ``on_nan="drop"`` excludes them and reports ``n_dropped_nan``.
    """
    if n_bins <= 0:
        raise ValueError(f"n_bins must be positive, got {n_bins}")
    if on_nan not in ("raise", "drop"):
        raise ValueError(f"on_nan must be 'raise' or 'drop', got {on_nan!r}")
    p = F.col(prob_col)
    y = F.col(label_col).cast("double")
    bad = p.isNull() | F.isnan(p.cast("double"))
    b = F.when(bad, F.lit(None).cast("long")).otherwise(
        F.least(F.floor(p * n_bins), F.lit(n_bins - 1))
    )
    binned = df.groupBy(b.alias("bin")).agg(
        F.count("*").alias("n"),
        F.sum(F.when(~bad, p)).alias("sum_p"),
        F.sum(F.when(~bad, y)).alias("sum_y"),
        F.sum(F.when(~bad, (p - y) * (p - y))).alias("sum_sq"),
    )
    clean = F.col("bin").isNotNull()
    out = binned.agg(
        F.round(
            F.sum(F.when(clean, F.col("sum_sq")))
            / F.sum(F.when(clean, F.col("n"))),
            9,
        ).alias("brier"),
        F.round(
            F.sum(F.when(clean, F.abs(F.col("sum_p") - F.col("sum_y"))))
            / F.sum(F.when(clean, F.col("n"))),
            9,
        ).alias("ece"),
        F.sum(clean.cast("long")).alias("n_bins_nonempty"),
        F.coalesce(F.sum(F.when(clean, F.col("n"))), F.lit(0))
        .cast("long")
        .alias("n"),
        F.coalesce(F.sum(F.when(~clean, F.col("n"))), F.lit(0))
        .cast("long")
        .alias("n_bad"),
    )
    if on_nan == "raise":
        # Guard referenced from the output row (same rationale as
        # binned_rank_auc): the global agg always emits one row, so the
        # raise cannot be elided by empty-relation propagation.
        brier = (
            F.when(
                F.col("n_bad") > 0,
                F.raise_error(
                    F.format_string(
                        "calibration_report: %d NaN/null probabilities; "
                        "pass on_nan='drop' to exclude (and count) them",
                        F.col("n_bad"),
                    )
                ).cast("double"),
            )
            .otherwise(F.col("brier"))
            .alias("brier")
        )
        return out.select(brier, "ece", "n_bins_nonempty", "n")
    return out.select(
        "brier",
        "ece",
        "n_bins_nonempty",
        "n",
        F.col("n_bad").alias("n_dropped_nan"),
    )
