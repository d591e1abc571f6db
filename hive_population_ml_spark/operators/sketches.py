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


# ---------------------------------------------------------------------------
# Bloom filter: fixed-size broadcastable set-membership sketch.
#
# Kirsch–Mitzenmacher double hashing: bit position i = (h1 + i*h2) mod m
# with h1, h2 derived from xxhash64 under two salts and h2 forced odd
# (coprime with the power-of-two m, so the k probes never collapse).
# Guarantees: NO false negatives ever; false-positive rate
# ~ (1 - e^(-k*n/m))^k — ~10 bits/element with k=5-7 gives <1% FP.
#
# Both the build and the probe are generated from the SAME SQL-string
# expression helpers, so bit positions agree by construction. Everything
# is a Catalyst expression (no Python in either path); the bitset is an
# array<bigint> built by a bit_or aggregation — build state is bounded
# by m/64 words no matter how many items stream through, and bit_or is
# idempotent, so the build needs NO distinct() pass over the items.
# ---------------------------------------------------------------------------


def _bloom_h1(v: str, mask: int) -> str:
    return f"(xxhash64({v}, 1) & {mask})"


def _bloom_h2(v: str, mask: int) -> str:
    # Forced odd: odd steps generate the full additive group mod 2^j.
    return f"((xxhash64({v}, 2) & {mask}) | 1)"


def bloom_build(
    df: DataFrame,
    col: str,
    m_bits: int = 1 << 23,
    k_hashes: int = 5,
) -> DataFrame:
    """Build a Bloom bitset over every value of ``df[col]``.

    Returns a ONE-ROW DataFrame with column ``bits: array<bigint>`` of
    ``m_bits/64`` words — the broadcastable sketch a probe side
    cross-joins against. Plan shape: explode k positions per item ->
    partial+final ``bit_or`` per word (keyspace <= m/64, map-side
    combine does almost all the work) -> one-row densify. The shuffle
    carries AT MOST m/64 (word, bits) pairs regardless of item count —
    this is why a Bloom build over 10^9 benchmark shingles is cheap
    while an exact distinct() is not.
    """
    if m_bits < 64 or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two >= 64, got {m_bits}")
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")
    mask = m_bits - 1
    n_words = m_bits // 64
    pos = df.select(
        F.expr(
            f"explode(transform(sequence(0, {k_hashes - 1}), i -> "
            f"(({_bloom_h1(col, mask)} + cast(i as bigint) * "
            f"{_bloom_h2(col, mask)}) & {mask})))"
        ).alias("__p")
    )
    words = (
        pos.select(
            F.expr("cast(__p div 64 as bigint)").alias("__w"),
            F.expr("shiftleft(cast(1 as bigint), cast(__p % 64 as int))").alias(
                "__b"
            ),
        )
        .groupBy("__w")
        .agg(F.bit_or("__b").alias("__word"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("__w", "__word"))).alias("__m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("__m"), i.cast("bigint")),
                F.lit(0).cast("bigint"),
            ),
        ).alias("bits")
    )


def bloom_probe_any(
    values_col: str,
    bits_col: str,
    m_bits: int,
    k_hashes: int = 5,
) -> Column:
    """Boolean Column: does ANY element of the array column
    ``values_col`` test positive against the bitset ``bits_col``?

    ``values_col`` must name a MATERIALIZED array column (lambda bodies
    inline captured expressions — same hazard as
    ``textops.shingles_of_tokens``). h1/h2 are bound once per value via
    ``named_struct``, then k bit probes run against the broadcast
    ``bits`` array — O(1) ``element_at`` lookups, all inside codegen.
    """
    mask = m_bits - 1
    return F.expr(
        f"exists(transform({values_col}, v -> named_struct("
        f"'h1', {_bloom_h1('v', mask)}, 'h2', {_bloom_h2('v', mask)})), "
        f"s -> forall("
        f"transform(sequence(0, {k_hashes - 1}), "
        f"i -> (s.h1 + cast(i as bigint) * s.h2) & {mask}), "
        f"p -> (element_at({bits_col}, cast(p div 64 as int) + 1) & "
        f"shiftleft(cast(1 as bigint), cast(p % 64 as int))) != 0))"
    )


def bloom_probe_member(
    value_col: str,
    bits_col: str,
    m_bits: int,
    k_hashes: int = 5,
) -> Column:
    """Boolean Column: does the scalar column ``value_col`` test
    positive against the bitset ``bits_col``?"""
    return bloom_probe_any(f"array({value_col})", bits_col, m_bits, k_hashes)
