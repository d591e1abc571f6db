"""Mergeable sketch aggregates (HLL) — the at-scale replacement for
exact distinct counts (charter extension; the reference computes exact
``nunique`` only, e.g. pandas ``nunique`` in its profiling paths).

Why sketches at 100 TB: an exact distinct count shuffles every distinct
value; an HLL sketch is a fixed-size (2^lg_k registers) mergeable state,
so the shuffle carries kilobytes per group regardless of cardinality.
Mergeability is the operational win: persist per-partition sketches
(e.g. per day), then roll up any date range with ``hll_union_agg``
WITHOUT rescanning raw data — the pre-aggregation pattern every
warehouse uses for distinct-user metrics.

Built on Spark 4's native Apache DataSketches functions
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``) —
JVM-side, whole-stage-codegen-adjacent, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-key HLL sketches of ``value_col`` (binary, mergeable) plus
    their estimates. lg_k=12 -> 4 KiB state, ~1.6% relative error."""
    sk = F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    out = df.groupBy(*keys).agg(sk)
    return out.select(
        *keys,
        "sketch",
        F.hll_sketch_estimate("sketch").cast("long").alias("est_distinct"),
    )


def rollup_sketches(
    sketch_df: DataFrame,
    keys: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Merge finer-grained sketches to coarser keys WITHOUT touching raw
    data — the persisted-daily-sketch -> arbitrary-range-rollup pattern.
    """
    merged = sketch_df.groupBy(*keys).agg(
        F.hll_union_agg(sketch_col).alias("sketch")
    )
    return merged.select(
        *keys,
        "sketch",
        F.hll_sketch_estimate("sketch").cast("long").alias("est_distinct"),
    )
