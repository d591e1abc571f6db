"""Scan fan-out for narrow inputs feeding per-row-heavy compute.

A parquet file is split across tasks at ROW-GROUP granularity: a table
written as one row group (every file in the bench testdata, any small
dimension snapshot, a single gzip member, one WARC shard) plans as ONE
scan task no matter how many cores the session has, so downstream
per-row work — shingling, tokenize+explode, Arrow GEMM batches, sketch
updates — serializes on one core while the rest idle. That is the
"input skew / unsplittable input" case of the optimization guide (§2.5:
*repartition immediately after the read*; §6 input-split sizing).

``fan_out`` round-robin-repartitions a DataFrame to the session's
default parallelism **only when its plan has fewer partitions than
that** — on a real multi-row-group table (any table at cluster scale)
it is a no-op, so the exchange exists exactly where the data is small
enough for it to be cheap. Measured on the bench corpus (5 000 docs,
one row group, 32 cores): the tokenize+shingle+explode stage drops
0.72 s → 0.12 s; the exchange itself moves <1 MB.

Only fan out per-row-DETERMINISTIC pipelines. Round-robin changes
row-to-partition placement and row order, so anything whose result
depends on partitioning must keep the raw scan:

- MLlib fits (KMeans kmeans|| init samples per partition; tree
  aggregation changes float-sum order),
- driver-side training collects whose row ORDER seeds a model
  (PQ codebook Lloyd, PCA fit sample),
- merge-order-sensitive sketches (GK quantiles / approx_percentile).

HLL (approx_count_distinct) is register-max merged and therefore
partitioning-invariant; plain min/max/count and rounded averages are
exact or stable at the rounding width the oracle contract compares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``min_parts`` (default: the session's
    ``defaultParallelism``) when it currently plans FEWER partitions;
    no-op otherwise. See module docstring for when this is safe."""
    sc = df.sparkSession.sparkContext
    target = int(min_parts or sc.defaultParallelism)
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:  # unresolvable plan (streaming, etc.): leave as is
        return df
    if cur >= target:
        return df
    return df.repartition(target)


def fan_out_by(df: DataFrame, *cols: str, min_parts: int | None = None) -> DataFrame:
    """KEYED fan-out: hash-repartition on ``cols`` when the plan has
    fewer partitions than the session's parallelism; no-op otherwise.

    The group-preserving sibling of ``fan_out`` for pipelines that END
    in a groupBy/window on (a superset of) ``cols``: every group stays
    whole in one partition, so per-group float accumulation order is
    unchanged (round-robin would scatter a group's rows and reorder
    rounded avg/stddev partial merges — the a_profile_table
    rounding-boundary lesson), and Catalyst ELIDES the downstream
    aggregation's own exchange because hash partitioning on a key
    subset satisfies its clustering — the repartition REPLACES that
    exchange rather than adding one. With a single upstream scan task
    (the only case the gate lets through) each partition also receives
    its rows in scan order, so results are bit-identical to the
    unfanned plan.

    At real multi-row-group scale this is a deliberate NO-OP: there the
    map-side combine before the aggregation exchange ships fewer bytes
    than raw rows, so the unfanned plan is strictly better (guide §2.3
    "aggregate before you shuffle"). The explicit partition count stops
    AQE coalescing the small exchange back to one task."""
    sc = df.sparkSession.sparkContext
    target = int(min_parts or sc.defaultParallelism)
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    if cur >= target:
        return df
    return df.repartition(target, *cols)
