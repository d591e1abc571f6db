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

from pyspark.sql import Column, DataFrame, SparkSession
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


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> Column:
    """Morton (Z-order) interleave key over ``cols`` — the multi-column
    clustering layout (Delta OPTIMIZE ZORDER BY's core): sorting by the
    interleaved key gives every listed column locally-clustered files,
    so parquet row-group min/max stats prune scans filtered on ANY of
    them, not only the leading sort column.

    Each column is min-max scaled to a ``bits``-wide unsigned int, then
    bit i of column j lands at position ``i * len(cols) + j``. All
    Catalyst (shift/and/or fold — whole-stage codegen'd); requires
    ``bits * len(cols) <= 63``.

    ``bounds`` maps col -> (min, max); omitted columns get a one-pass
    global agg computed HERE (an eager, tiny action — pass bounds
    explicitly in pipelines that must stay fully lazy or when writing
    incrementally with stable scaling).
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 63:
        raise ValueError(f"bits*len(cols) must fit a long: {bits}*{n} > 63")
    bounds = dict(bounds or {})
    missing = [c for c in cols if c not in bounds]
    if missing:
        row = df.agg(
            *[F.min(c).alias(f"lo_{c}") for c in missing],
            *[F.max(c).alias(f"hi_{c}") for c in missing],
        ).collect()[0]
        for c in missing:
            bounds[c] = (row[f"lo_{c}"], row[f"hi_{c}"])
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo, hi = (float(bounds[c][0]), float(bounds[c][1]))
        span = hi - lo if hi > lo else 1.0
        s = F.least(
            F.lit(top),
            F.greatest(
                F.lit(0),
                ((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * F.lit(top))
                .cast("long"),
            ),
        )
        scaled.append(s)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, s in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(s, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 16,
    bounds: dict[str, tuple[float, float]] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve over ``cols``:
    range-partition by the Morton key (n_files output files with
    contiguous curve segments), sort within partitions, drop the key.

    At 100 TB this is the write-amplification-free alternative to
    maintaining one sorted copy per filter column: ONE layout serves
    range filters on every z-ordered dimension, because each file's
    min/max envelope is tight in all of them. The range partitioner
    samples the key (no global sort); the within-partition sort keeps
    row-group stats tight inside each file.
    """
    keyed = df.withColumn("__z", zorder_key(df, cols, bits=bits, bounds=bounds))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 128,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> int:
    """Rewrite a parquet directory into ~``target_file_mb`` files — the
    small-files compaction every streaming/incremental sink eventually
    needs (a foreachBatch sink writing per-minute micro-batches leaves
    thousands of KB-scale files; scans then pay one task + one open per
    file, and the NameNode/listing cost grows unbounded).

    File count comes from the REAL on-disk byte size (Hadoop
    ContentSummary — works for any filesystem scheme), not a row-count
    guess. With ``sort_by`` the rewrite range-partitions + sorts so the
    compacted files also get tight min/max envelopes (compaction and
    clustering in one pass, like OPTIMIZE ... ZORDER's 1-D cousin).
    Returns the number of files written.
    """
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(hpath).getLength()
    n_files = max(1, -(-int(total_bytes) // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_path)
    if sort_by:
        df = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(
            *sort_by
        )
    else:
        df = df.repartition(n_files)
    df.write.mode(mode).parquet(dst_path)
    return n_files


def bloom_pruned_join(
    probe: DataFrame,
    dim: DataFrame,
    probe_key: str,
    dim_key: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 5,
    how: str = "inner",
) -> DataFrame:
    """Shuffle join with a Bloom pre-filter on the big probe side.

    The mid-size-dim regime: too many rows to broadcast the TABLE, but
    its KEY SET fits a fixed-size bitset (m/8 bytes regardless of row
    count — 128 KiB at the default 2^20 bits). Build a Bloom over
    ``dim[dim_key]`` (the build's shuffle carries at most m/64 words,
    see ``sketches.bloom_build``), ship it to every task as a plan
    literal, and drop non-matching probe rows MAP-SIDE so only
    plausible matches enter the join's shuffle. False positives are
    culled by the exact join that follows, so the result is IDENTICAL
    to ``probe.join(dim, ...)`` — which is the oracle contract — while
    the shuffle writes shrink by the probe's non-match fraction (at
    100 TB, the probe shuffle IS the job; a 95%-selective prune is a
    ~20x shuffle-write cut). Spark's own runtime bloom pushdown
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``) makes the
    same move when it can see the stats; the explicit form is sizeable
    (m_bits by expected key count) and works where the optimizer is
    blind — a dim produced by a non-SQL stage, or a persisted key set
    loaded from another pipeline.
    """
    from .sketches import bloom_bits_literal, bloom_probe_member

    bits = bloom_bits_literal(dim, dim_key, m_bits=m_bits, k_hashes=k_hashes)
    pruned = (
        probe.withColumn("__bloom_bits", bits)
        .filter(bloom_probe_member(probe_key, "__bloom_bits", m_bits, k_hashes))
        .drop("__bloom_bits")
    )
    return pruned.join(dim, F.col(probe_key) == F.col(dim_key), how)
