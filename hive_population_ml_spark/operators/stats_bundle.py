"""Grouped windowed-statistics bundle — SURVEY.md §2.4 A1–A4.

The reference computes per-(hive, window) stats with a Python loop over
22 measures × 9 stats, one pandas reduction each (``preprocessing.py:
101-131``). Here the whole bundle is ONE ``agg(*exprs)`` — a single
2-phase hash aggregation (map-side partial + final), one shuffle, full
whole-stage codegen, regardless of how many measure×stat pairs are
requested.

Delta statistics (A3: mean/std of 1st and 2nd temporal differences)
need an ordered lag per group first; that is a window over
(keys, order by ts) — one extra shuffle shared by all measures. We
reuse the same partitioning for the final groupBy so AQE keeps the
exchange count at two total.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# stat name -> (expr builder, needs_rounding). Rounding is applied by
# callers that feed the DuckDB differential oracle (float-sum order
# differences between engines are below 1e-6 relative).
STATS: dict[str, callable] = {
    "n": lambda c: F.count(c),
    "avg": lambda c: F.avg(c),
    # pandas .std() is ddof=1 == stddev_samp (SURVEY §5.3).
    "std": lambda c: F.stddev_samp(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "range": lambda c: F.max(c) - F.min(c),
    "sum": lambda c: F.sum(c),
    "median": lambda c: F.median(c),
}

DEFAULT_STATS = ("n", "avg", "std", "min", "max", "range")


def stat_exprs(
    measures: Sequence[str],
    stats: Sequence[str] = DEFAULT_STATS,
    round_to: int | None = None,
) -> list[Column]:
    """Build the flat list of aggregate expressions for one pass."""
    exprs = []
    for m in measures:
        for s in stats:
            e = STATS[s](F.col(m))
            if round_to is not None and s not in ("n", "min", "max"):
                e = F.round(e, round_to)
            exprs.append(e.alias(f"{m}_{s}"))
    return exprs


def stats_bundle(
    df: DataFrame,
    keys: Sequence[str],
    measures: Sequence[str],
    stats: Sequence[str] = DEFAULT_STATS,
    min_count: int | None = None,
    count_col: str | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """groupBy(keys).agg(all measure×stat pairs) + optional HAVING gate.

    min_count reproduces the reference's min-group-size gates (P10,
    ``preprocessing.py:96,188-189``) as a post-aggregation filter —
    evaluated after partial aggregation, so undersized groups never
    leave the final-agg stage.
    """
    exprs = stat_exprs(measures, stats, round_to)
    if min_count is not None:
        cc = count_col or measures[0]
        exprs.append(F.count(F.col(cc)).alias("__gate_n"))
    out = df.groupBy(*keys).agg(*exprs)
    if min_count is not None:
        out = out.filter(F.col("__gate_n") >= min_count).drop("__gate_n")
    return out


def delta_stats(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    measures: Sequence[str],
    order_tiebreak: Sequence[str] = (),
    round_to: int | None = None,
) -> DataFrame:
    """A3: per-group mean/std of first and second differences of each
    measure in time order (``preprocessing.py:123-131``).

    delta1 = v - lag(v); delta2 = delta1 - lag(delta1). One window
    shuffle computes every lag; one groupBy finishes.
    """
    w = Window.partitionBy(*keys).orderBy(ts, *order_tiebreak)
    cols = list(df.columns)
    d1 = [(F.col(m) - F.lag(m).over(w)).alias(f"__d1_{m}") for m in measures]
    step1 = df.select(*cols, *d1)
    d2 = [
        (F.col(f"__d1_{m}") - F.lag(f"__d1_{m}").over(w)).alias(f"__d2_{m}")
        for m in measures
    ]
    step2 = step1.select(*step1.columns, *d2)
    aggs = []
    for m in measures:
        for d in ("d1", "d2"):
            for s, fn in (("mean", F.avg), ("std", F.stddev_samp)):
                e = fn(F.col(f"__{d}_{m}"))
                if round_to is not None:
                    e = F.round(e, round_to)
                aggs.append(e.alias(f"{m}_{d}_{s}"))
    return step2.groupBy(*keys).agg(*aggs)
