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
    # Positions as a PLAIN expression array (array(h1, h1+h2, ...)), not
    # a transform() lambda: higher-order functions are interpreted
    # (CodegenFallback), and on the build's hot explode path that
    # measured ~10x slower than the codegen'd flat form. h1/h2 are
    # materialized first so xxhash64 runs once per item, not per k.
    words = _bloom_words(df, col, mask, k_hashes)
    # Densify via range left-join + one ordered collect. NOT via
    # element_at over a map_from_entries literal: Spark's map
    # element_at is a LINEAR scan of ArrayBasedMapData, so a per-index
    # lookup densify is O(n_words x set_words) — measured ~30 s at
    # 16k x 60k where this form is sub-second.
    dense = (
        df.sparkSession.range(n_words)
        .join(words, F.col("id") == F.col("__w"), "left")
        .select(
            "id",
            F.coalesce("__word", F.lit(0).cast("bigint")).alias("__word"),
        )
    )
    return dense.agg(
        F.array_sort(F.collect_list(F.struct("id", "__word"))).alias("__a")
    ).select(F.transform(F.col("__a"), lambda s: s["__word"]).alias("bits"))


def _bloom_words(df: DataFrame, col: str, mask: int, k_hashes: int) -> DataFrame:
    """Sparse bitset: (word index, or-ed 64-bit word) for every word
    with at least one set bit. Positions are a PLAIN expression array
    (array(h1, h1+h2, ...)), not a transform() lambda: higher-order
    functions are interpreted (CodegenFallback), and on the build's hot
    explode path that measured ~10x slower than the codegen'd flat
    form. h1/h2 are materialized first so xxhash64 runs once per item.
    """
    hashed = df.select(
        F.expr(_bloom_h1(col, mask)).alias("__h1"),
        F.expr(_bloom_h2(col, mask)).alias("__h2"),
    )
    pos = hashed.select(
        F.explode(
            F.array(
                *[
                    F.expr(f"(__h1 + {i} * __h2) & {mask}")
                    for i in range(k_hashes)
                ]
            )
        ).alias("__p")
    )
    return (
        pos.select(
            F.expr("cast(__p div 64 as bigint)").alias("__w"),
            F.expr("shiftleft(cast(1 as bigint), cast(__p % 64 as int))").alias(
                "__b"
            ),
        )
        .groupBy("__w")
        .agg(F.bit_or("__b").alias("__word"))
    )


def bloom_bits_literal(
    df: DataFrame,
    col: str,
    m_bits: int = 1 << 23,
    k_hashes: int = 5,
) -> Column:
    """Build the Bloom bitset and return it as a plan-constant LITERAL
    array column — the fast probe-side transport.

    Why not join the one-row bitset DataFrame onto the probe side: a
    joined array column is rematerialized per output row, so probe cost
    becomes O(rows x m/64) — measured 17 s vs 0.5 s at m=2^23/sf0.1 for
    the identical probe. A ``Literal`` is evaluated by reference (no
    per-row copy) and rides the task binary to every executor. The one
    driver collect this requires is m/8 bytes — FIXED-SIZE by
    construction (1 MiB at the default), which is the entire point of
    the sketch; the distributed one-row-DataFrame form
    (``bloom_build``) remains for pipelines that must stay fully lazy.
    """
    import json

    import numpy as np

    if m_bits < 64 or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two >= 64, got {m_bits}")
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")
    # Collect the SPARSE (word, bits) rows — bounded by m/64 — and
    # densify driver-side; cheaper than shipping the dense array
    # through a second aggregation.
    sparse = _bloom_words(df, col, m_bits - 1, k_hashes).collect()
    dense = np.zeros(m_bits // 64, dtype=np.int64)
    for r in sparse:
        dense[r["__w"]] = r["__word"]
    # from_json of a literal string constant-folds to a plain array
    # Literal at optimization time (verified in the optimized plan) and
    # crosses py4j as ONE string; F.lit(list) builds one py4j Literal
    # per element — measured 7 s for 16k words where this is ~0.
    payload = json.dumps([int(w) for w in dense])
    return F.expr(f"from_json('{payload}', 'array<bigint>')")


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
    ``named_struct``, then k bit probes run with O(1) ``element_at``
    lookups. ``bits_col`` should be the ``bloom_bits_literal`` constant
    (or the name of a column bound to it) — probing a JOINED array
    column pays a per-row copy of the whole bitset (see
    ``bloom_bits_literal``).
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


def quantile_sketches(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    probs: list[float] = (0.25, 0.5, 0.75, 0.95),
    accuracy: int = 10_000,
) -> DataFrame:
    """Approximate per-group quantiles via ``percentile_approx``
    (Greenwald-Khanna): rank error <= 1/accuracy of the group size, with
    MERGEABLE fixed-size state — the one-pass 100 TB replacement for
    exact ``percentile``'s per-group sort. Partial aggregation means the
    shuffle carries one GK summary per group per partition, never the
    values.

    Output: group_cols + q_<prob> columns (dots stripped), plus n.
    """
    aggs = [F.count(F.lit(1)).alias("n")]
    for p in probs:
        name = f"q_{str(p).replace('0.', '').replace('.', '_')}"
        aggs.append(
            F.percentile_approx(value_col, F.lit(p), F.lit(accuracy)).alias(name)
        )
    return df.groupBy(*group_cols).agg(*aggs)


def count_min_sketch(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 7,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of a value
    column — the mergeable FREQUENCY sketch completing the trio with
    HLL (distinct) and GK (quantiles): fixed ``depth x width`` state
    whatever the cardinality, overestimate-only error ≤ e/width · N
    with probability 1 - e^-depth per query.

    Spark shape: each occurrence maps to ``depth`` (row, bucket) cells
    via seeded xxhash64 (an inline array explode — map-side, no
    Python), then ONE aggregation over at most depth*width distinct
    keys: partial aggregation collapses everything before the
    exchange, so the shuffle carries ≤ depth*width rows per partition
    regardless of corpus size. Mergeability is exact: sketches of
    corpus shards SUM cell-wise to the whole-corpus sketch (counts are
    additive — pinned by test), the persist-per-day-rollup-any-range
    pattern.

    Output: (r, b, c) cell table, depth*width rows max.
    """
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        F.pmod(
                            F.xxhash64(F.col(col), F.lit(seed + i)),
                            F.lit(width),
                        ).cast("int").alias("b"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb")
    )
    return cells.groupBy(
        F.col("rb.r").alias("r"), F.col("rb.b").alias("b")
    ).agg(F.count(F.lit(1)).alias("c"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 7,
) -> DataFrame:
    """Point-query the CMS: estimate = min over rows of the probed
    cell. ``probes`` is a (small) DataFrame holding ``col``; the
    sketch side is ≤ depth*width rows, so the join broadcasts it.
    Estimates NEVER undercount (cells only ever add other tokens'
    mass) — the one-sided contract the tests pin."""
    p = probes.select(col).distinct()
    cells = p.select(
        col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        F.pmod(
                            F.xxhash64(F.col(col), F.lit(seed + i)),
                            F.lit(width),
                        ).cast("int").alias("b"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(col, F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    return (
        cells.join(F.broadcast(sketch), ["r", "b"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_count"))
    )


def cms_join_size(
    sk_a: DataFrame,
    sk_b: DataFrame,
) -> DataFrame:
    """Join-size estimation by CMS inner product (the AMS/CMS classic,
    Cormode & Muthukrishnan 2005 §4.2): |A ⋈_k B| = Σ_k f_A(k)·f_B(k),
    and the inner product of two same-seeded sketch rows overestimates
    exactly that — min over the depth rows is the estimate. The 100 TB
    planning tool: answer "how big would this join (or self-join)
    explode?" from two fixed depth×width cell tables WITHOUT shuffling
    either input — the skew pre-check before committing to a plan.

    Guarantees (pinned in tests): est >= true join size (cells only
    ever add other keys' mass, and products of overestimates
    overestimate); est <= true + (e/width)·N_A·N_B with probability
    1 - e^-depth.

    Input: two cell tables from :func:`count_min_sketch` built with the
    SAME depth/width/seed. Output: one row (est_join_rows, double —
    products are summed in double so a skewed 100 TB self-join's
    ~1e16-per-cell products cannot overflow int64's 9.2e18 and invert
    the overestimate guarantee). The cell equi-join touches <=
    depth*width rows per side — driver-cheap.

    A depth row with NO shared cells has true inner product 0 — and a
    shared key always shares cells (same seed), so ip=0 rows only
    happen when the true join size is 0; they must survive into the
    min (an inner-join-only form would drop them and report NULL or an
    inflated estimate for disjoint inputs)."""
    j = (
        sk_a.select("r", "b", F.col("c").cast("double").alias("ca"))
        .join(
            sk_b.select("r", "b", F.col("c").cast("double").alias("cb")),
            ["r", "b"],
        )
        .groupBy("r")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("ip"))
    )
    rows = sk_a.select("r").distinct().join(j, "r", "left")
    return rows.agg(
        F.coalesce(F.min(F.coalesce(F.col("ip"), F.lit(0.0))), F.lit(0.0)).alias(
            "est_join_rows"
        )
    )
