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


def moment_state(
    df: DataFrame, keys: Sequence[str], value: str
) -> DataFrame:
    """Per-key MERGEABLE moment state: (n, mean, m2, vmin, vmax).

    The persisted half of incremental statistics maintenance: m2 is the
    sum of squared deviations from the mean (Welford's accumulator), so
    two states merge EXACTLY (``merge_moment_states``) — the property a
    100 TB pipeline needs to keep corpus/feature statistics current by
    aggregating ONLY each day's new partition and merging it into a
    |keys|-row state table, never rescanning history. One 2-phase hash
    aggregation; the shuffle carries one fixed-size state row per key
    per map partition. m2 is derived as var_pop*n from Spark's own
    (Welford-based) variance aggregate rather than sum(x^2)-n*mean^2,
    which cancels catastrophically at large |x|.
    """
    n = F.count(F.col(value))
    return df.groupBy(*[F.col(k) for k in keys]).agg(
        n.alias("n"),
        F.avg(value).alias("mean"),
        # var_pop of a single value is 0.0, so m2 stays exact at n=1;
        # coalesce covers n=0 groups (all-null value column).
        F.coalesce(F.var_pop(value) * n, F.lit(0.0)).alias("m2"),
        F.min(value).alias("vmin"),
        F.max(value).alias("vmax"),
    )


def merge_moment_states(
    state: DataFrame, delta: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Chan's parallel merge of two ``moment_state`` tables.

    n = n1+n2; mean = weighted mean; m2 = m2_1 + m2_2 + d^2*n1*n2/n
    (d = mean2-mean1) — algebraically exact, no rescan of either
    side's rows. Keys present on only one side pass through unchanged
    (full outer join + null-neutral identities: n=0, m2=0). At scale
    the state table is |keys| rows and bucketable by key, so the merge
    is a map-side join against each (much smaller) per-batch delta.
    """
    s = state.select(
        *keys,
        *[F.col(c).alias(f"__s_{c}") for c in ("n", "mean", "m2", "vmin", "vmax")],
    )
    d = delta.select(
        *keys,
        *[F.col(c).alias(f"__d_{c}") for c in ("n", "mean", "m2", "vmin", "vmax")],
    )
    j = s.join(d, on=list(keys), how="full_outer")
    n1 = F.coalesce(F.col("__s_n"), F.lit(0)).cast("long")
    n2 = F.coalesce(F.col("__d_n"), F.lit(0)).cast("long")
    m1 = F.coalesce(F.col("__s_mean"), F.lit(0.0))
    m2v = F.coalesce(F.col("__d_mean"), F.lit(0.0))
    n = n1 + n2
    mean = F.when(n > 0, (n1 * m1 + n2 * m2v) / n)
    dd = m2v - m1
    m2 = (
        F.coalesce(F.col("__s_m2"), F.lit(0.0))
        + F.coalesce(F.col("__d_m2"), F.lit(0.0))
        + F.when(n > 0, dd * dd * n1 * n2 / n).otherwise(F.lit(0.0))
    )
    return j.select(
        *keys,
        n.alias("n"),
        mean.alias("mean"),
        m2.alias("m2"),
        F.least(F.col("__s_vmin"), F.col("__d_vmin")).alias("vmin"),
        F.greatest(F.col("__s_vmax"), F.col("__d_vmax")).alias("vmax"),
    )
