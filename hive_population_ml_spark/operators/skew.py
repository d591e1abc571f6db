"""Skew & layout toolkit — the knobs a 100 TB deployment turns when
AQE's automatic handling isn't enough (SURVEY.md §4.3, PERFORMANCE.md).

- ``salted_join``: explicit key salting for a skewed large⋈small join.
  The hot side gets a uniform random-ish salt derived deterministically
  from a row fingerprint; the small side is exploded ``n_salts`` times.
  One hot key's rows then spread over ``n_salts`` tasks instead of one
  straggler. AQE's skew-join split handles sort-merge cases; salting is
  the portable fallback (works for hash joins, pre-AQE engines, and
  aggregate-after-join shapes).
- ``write_partitioned``: date/key-partitioned, within-partition-sorted
  parquet layout — the write-time twin of predicate pushdown: partition
  pruning skips directories, the sort keeps row-group min/max tight so
  range scans skip pages.
- ``bucketed_table``: hash-bucketed saveAsTable; two tables bucketed the
  same way join with ZERO shuffle (verified in tests by asserting the
  plan has no Exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with ``n_salts``-way salt on the (possibly skewed) big
    side. Deterministic: salt = positive hash of the whole row modulo
    n_salts, so repeated runs shard identically.
    """
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")
    ).alias("_salt")
    salted_small = small.select("*", salts)
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_within: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Partition-pruned, row-group-friendly fact layout."""
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 8,
    path: str | None = None,
    sort_by: str | None = None,
) -> DataFrame:
    """Persist ``df`` hash-bucketed on ``bucket_by``; returns the table
    handle. Joining two tables bucketed identically on the join key is
    shuffle-free (both sides' partitioning already satisfies the join's
    distribution requirement)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(sort_by)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)
    return spark.table(table)
