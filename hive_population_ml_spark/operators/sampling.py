"""Corpus sampling & data-mixing operators — the stages between a cleaned
corpus and a training run (charter extension, same scope family as
SURVEY.md §2.10's dedup/text ops; reference has no analog — cites
``/root/reference/README.md`` data-prep scope only).

All-Spark designs, zero UDFs:

- **Deterministic stratified sampling**: keep/drop is a pure function of
  the row id (hash -> uniform [0,1) -> compare to the stratum's rate),
  so the sample is reproducible across runs, executors, and retries —
  never ``rand()``, which resamples per task attempt and breaks retry
  idempotency at scale. Map-side filter: no shuffle at all.
- **Temperature-based mixture weights** (multinomial sampling with
  p_i ∝ n_i^alpha, the mT5/XLM-R recipe): one aggregation to per-stratum
  counts, then weight math over the tiny post-agg table (a global window
  there is O(#strata), not O(rows)).
- **Token-budget shard packing**: docs -> contiguous training shards of
  ~budget tokens each. Shard id = floor(start_offset / budget) from a
  per-bucket running sum — windows partition by the bucket column, so
  parallelism = #buckets and no global sort exists. At 100 TB pick
  bucket granularity (e.g. lang x source x day) so each bucket's doc
  list fits a task comfortably.

Hash choice: the portable ``minstd`` mode (two Lehmer steps
``x -> x*48271 mod (2^31-1)`` after an offset — same 64-bit integer
arithmetic in any engine, so the DuckDB oracle mirrors it exactly) is
the differential-testing default; ``xxhash64`` mode is the production
default for real corpora (avalanche-quality mixing, Spark-native, but
no DuckDB twin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MINSTD_M = 2_147_483_647  # 2^31 - 1 (prime)
_MINSTD_A = 48_271
_MINSTD_OFFSET = 999_983  # avoids the id=0 fixpoint


def uniform_hash(id_col: str | Column, mode: str = "minstd") -> Column:
    """Deterministic uniform [0,1) from an integer id column.

    ``minstd``: ((id % m) * a) % m / m with m=2^31-1, a=48271 — every
    intermediate fits a 64-bit signed int, and any SQL engine computes
    the identical value (the oracle contract). ``xxhash64``: top 31 bits
    of Spark's xxhash64 — better mixing, Spark-only.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    if mode == "minstd":
        # TWO Lehmer steps after an offset: a single multiply maps small
        # sequential ids to u ~ id*48271/2^31 — all tiny, so a rate<1
        # filter keeps everything (caught by test_stratified_sample_
        # semantics). Each step is a bijection mod M (gcd(a, M)=1), so
        # distinct ids keep distinct u and the composed map has LCG
        # equidistribution. Every intermediate fits 64-bit signed.
        x = (F.abs(c) + _MINSTD_OFFSET) % _MINSTD_M
        x = x * _MINSTD_A % _MINSTD_M
        x = x * _MINSTD_A % _MINSTD_M
        return x / F.lit(float(_MINSTD_M))
    if mode == "xxhash64":
        return F.shiftrightunsigned(F.xxhash64(c), 33) / F.lit(float(1 << 31))
    raise ValueError(f"unknown hash mode {mode!r}")


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 1.0,
    mode: str = "minstd",
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep row iff
    uniform_hash(id) < rate(stratum). Pure map-side filter (no shuffle);
    the keep decision is stable under retries and independent of
    partitioning, which ``df.sample``/``rand()`` are not.
    """
    u = uniform_hash(id_col, mode)
    rate: Column = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(float(v))).otherwise(rate)
    return df.withColumn("__u", u).filter(F.col("__u") < rate)


def mixture_weights(
    df: DataFrame,
    stratum_col: str,
    alpha: float,
    target_total: int,
) -> DataFrame:
    """Temperature-scaled mixture over strata: p_i ∝ n_i^alpha
    (alpha=1 -> proportional, alpha=0 -> uniform; 0.3 is the mT5 value).

    Returns per-stratum ``n_docs``, ``p`` (mixture probability),
    ``rate`` (capped per-doc keep rate hitting the target in
    expectation) and ``epochs`` (uncapped expected passes — >1 means the
    stratum must be upsampled/repeated). One distributed agg; the
    global window runs over the #strata-row result only.
    """
    from pyspark.sql import Window

    counts = df.groupBy(stratum_col).agg(F.count("*").alias("n_docs"))
    w = F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
    p = w / F.sum(w).over(Window.partitionBy())
    expected = p * F.lit(float(target_total))
    return counts.select(
        stratum_col,
        "n_docs",
        F.round(p, 9).alias("p"),
        F.round(F.least(F.lit(1.0), expected / F.col("n_docs")), 9).alias("rate"),
        F.round(expected / F.col("n_docs"), 9).alias("epochs"),
    )


def pack_shards(
    df: DataFrame,
    bucket_col: str,
    size_col: Column | str,
    budget: int,
    order_col: str,
    chunk_width: int | None = 65536,
) -> DataFrame:
    """Assign docs to contiguous ~``budget``-token shards per bucket.

    Shard id = floor(start_offset / budget) where start_offset is the
    running token sum (exclusive) in deterministic ``order_col`` order
    WITHIN the bucket — a doc straddling a boundary belongs to the shard
    it starts in, so shards overshoot by at most one doc.

    Scale shape (round 10 — the 1000x probe caught the naive form): a
    single ``partitionBy(bucket)`` running-sum window caps parallelism
    at #buckets, and real corpora have WHALE buckets (one dominant
    language holds most of 100 TB) — measured 114.9x at 1000x docs.
    With a numeric ``order_col`` the prefix sum is computed
    HIERARCHICALLY instead (the classic two-level scan): (1) partial
    token sums per (bucket, chunk) where chunk = floor(ord /
    chunk_width) is order-aligned by construction; (2) a running-sum
    window over that tiny per-bucket chunk table yields each chunk's
    start offset (the only remaining sequential term — #chunks rows,
    not #docs); (3) chunk starts join back and a window partitioned by
    (bucket, chunk) finishes the within-chunk prefix, restoring
    parallelism to #buckets x #chunks. Results are EXACTLY the
    single-window manifest (chunking is monotone in ord), pinned by a
    parity test and the registered query's unchanged DuckDB oracle.
    Re-probed at 1000x: 114.9x -> 7.9x (36.8 s -> 7.2 s), exchanges
    2 -> 5 — the hierarchy pays three extra balanced exchanges to
    remove the per-bucket serialization. ``chunk_width=None`` (or a
    non-numeric order column) keeps the one-window form.

    Returns the shard manifest: (bucket, shard_id, n_docs, total_tokens,
    first/last order key) — the small table a training loader reads.
    """
    from pyspark.sql import Window

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    numeric_ord = dict(df.dtypes).get(order_col) in (
        "tinyint", "smallint", "int", "bigint", "float", "double",
    )
    sized0 = df.select(
        F.col(bucket_col).alias("bucket"),
        F.col(order_col).alias("ord"),
        size.alias("n_tokens"),
    )
    if chunk_width and numeric_ord:
        chunk = F.floor(F.col("ord") / F.lit(int(chunk_width)))
        sized0 = sized0.withColumn("chunk", chunk)
        per_chunk = sized0.groupBy("bucket", "chunk").agg(
            F.sum("n_tokens").alias("chunk_tokens")
        )
        w_chunk = Window.partitionBy("bucket").orderBy("chunk")
        offsets = per_chunk.select(
            "bucket",
            "chunk",
            (F.sum("chunk_tokens").over(w_chunk) - F.col("chunk_tokens"))
            .alias("chunk_start"),
        )
        w_in = Window.partitionBy("bucket", "chunk").orderBy("ord")
        start = (
            F.col("chunk_start") + F.sum("n_tokens").over(w_in)
            - F.col("n_tokens")
        )
        # null-safe equality (<=>) so NULL-keyed rows survive exactly as
        # the single-window form treats them: a NULL bucket is its own
        # window partition and a NULL ord is its own (NULL) chunk — an
        # inner equi-join would silently drop them (ADVICE r10).
        # EqualNullSafe is still an equi-join predicate, so the join
        # stays a shuffled hash join, not a nested loop.
        sized = sized0.join(
            offsets.withColumnsRenamed(
                {"bucket": "__rb", "chunk": "__rc"}
            ),
            F.col("bucket").eqNullSafe(F.col("__rb"))
            & F.col("chunk").eqNullSafe(F.col("__rc")),
        ).select(
            "bucket",
            "ord",
            "n_tokens",
            F.floor(start / F.lit(int(budget))).alias("shard_id"),
        )
    else:
        w = Window.partitionBy("bucket").orderBy("ord")
        start = F.sum("n_tokens").over(w) - F.col("n_tokens")
        sized = sized0.select(
            "bucket",
            "ord",
            "n_tokens",
            F.floor(start / F.lit(int(budget))).alias("shard_id"),
        )
    return sized.groupBy("bucket", "shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("ord").alias("first_ord"),
        F.max("ord").alias("last_ord"),
    )


def two_level_row_number(
    df: DataFrame,
    group_col: str,
    u: Column,
    tiebreak_col: str,
    n_chunks: int = 4096,
) -> DataFrame:
    """``row_number() OVER (PARTITION BY group ORDER BY u, tiebreak)``
    plus ``count(*) OVER (PARTITION BY group)`` via the two-level scan
    (round 10 — same probe-caught whale-bucket fix as pack_shards).

    A direct per-group rank window serializes each group into ONE task;
    real corpora have whale groups. Instead: ``u`` (numeric in [0, 1),
    e.g. a uniform hash) is chunked by value — order-aligned by
    construction — then (1) per-(group, chunk) counts, (2) a running
    sum over that tiny table gives each chunk's rank offset and the
    group total, (3) a window partitioned by (group, chunk) finishes
    the within-chunk rank. Results are EXACTLY the single-window rank:
    chunking is monotone in u and u-ties can't straddle chunks.
    Parallelism: #groups x #chunks.

    Returns df plus ``rk`` (1-based rank) and ``n`` (group size)."""
    from pyspark.sql import Window

    base = df.withColumn("__u", u).withColumn(
        "__chunk",
        F.least(
            F.floor(F.col("__u") * n_chunks), F.lit(n_chunks - 1)
        ).cast("long"),
    )
    per_chunk = base.groupBy(group_col, "__chunk").agg(
        F.count("*").alias("__c")
    )
    w_chunk = Window.partitionBy(group_col).orderBy("__chunk")
    offsets = per_chunk.select(
        group_col,
        "__chunk",
        (F.sum("__c").over(w_chunk) - F.col("__c")).alias("__off"),
        F.sum("__c").over(Window.partitionBy(group_col)).alias("n"),
    )
    w_in = Window.partitionBy(group_col, "__chunk").orderBy(
        F.col("__u").asc(), F.col(tiebreak_col).asc()
    )
    # null-safe equality on the group key (<=>): a NULL group is its own
    # window partition in the single-window form, so the two-level form
    # must match it through the join instead of dropping it (ADVICE
    # r10). __chunk is non-null whenever __u is (and u is a hash by
    # contract — never NULL for non-null ids), but <=> costs nothing
    # and keeps the parity exact.
    return (
        base.join(
            offsets.withColumnsRenamed(
                {group_col: "__rg", "__chunk": "__rc"}
            ),
            F.col(group_col).eqNullSafe(F.col("__rg"))
            & F.col("__chunk").eqNullSafe(F.col("__rc")),
        )
        .withColumn("rk", F.col("__off") + F.row_number().over(w_in))
        .drop("__u", "__chunk", "__off", "__c", "__rg", "__rc")
    )


def bottom_k_sample(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str,
    mode: str = "minstd",
    prefilter_safety: float | None = 4.0,
) -> DataFrame:
    """EXACT-size deterministic sample: the k rows per group with the
    smallest ``uniform_hash(id)`` — the distributed replacement for
    per-group reservoir sampling.

    Why hash-order bottom-k instead of a reservoir: the result is a
    pure function of the data (stable across runs/retries/partition
    layouts), and bottom-k is MERGEABLE — bottom-k of a union is the
    bottom-k of the parts' bottom-ks, so per-shard samples roll up
    without rescanning (the classic bottom-k sketch property).

    Scale shape: the naive form shuffles every row into its group and
    rank-windows it. With ``prefilter_safety`` set, a tiny per-group
    count table (one agg, #groups rows) broadcasts back and a MAP-SIDE
    filter keeps only rows with u < safety*k/n_g — the expected
    survivor set is safety*k per group, so the window sorts O(k) rows
    per group instead of O(n_g). The prefilter is validated EXACTLY:
    a survivor recount raises loudly if any group kept fewer than
    min(k, n_g) rows (cannot silently under-sample; for uniform-ish
    hashes P(miss) < e^-k at safety 4). Set ``prefilter_safety=None``
    for the single-pass exact form.

    Returns ``df``'s columns plus ``u`` (the hash) and ``rk`` (1..k).
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    u = uniform_hash(id_col, mode)
    with_u = df.withColumn("__u", u)
    if prefilter_safety is not None:
        counts = df.groupBy(group_col).agg(F.count("*").alias("__n_g"))
        thresh = F.least(
            F.lit(1.0), F.lit(float(prefilter_safety) * k) / F.col("__n_g")
        )
        survivors = with_u.join(F.broadcast(counts), group_col).filter(
            (F.col("__u") < thresh) | (F.col("__n_g") <= k)
        )
        # validate: every group must still hold min(k, n_g) candidates.
        # Checked against the COUNTS table (left join), not the survivor
        # set alone — a fully-starved group vanishes from the survivors
        # and would otherwise dodge the check.
        kept = survivors.groupBy(group_col).agg(F.count("*").alias("__kept"))
        bad = (
            counts.join(kept, group_col, "left")
            .filter(
                F.coalesce(F.col("__kept"), F.lit(0))
                < F.least(F.lit(k), F.col("__n_g"))
            )
            .limit(1)
            .collect()
        )
        if bad:
            raise ValueError(
                f"bottom_k_sample: prefilter at safety={prefilter_safety} "
                f"kept too few rows for group {bad[0][group_col]!r} — "
                "raise prefilter_safety or pass None for the exact "
                "single-pass form."
            )
        with_u = survivors.drop("__n_g")
    w = Window.partitionBy(group_col).orderBy(
        F.col("__u").asc(), F.col(id_col).asc()
    )
    return (
        with_u.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .withColumnRenamed("__u", "u")
    )


def weighted_sample_by(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    k: int,
    id_col: str,
    mode: str = "minstd",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k per group
    (Efraimidis & Spirakis A-ES): key = u^(1/w) with u =
    uniform_hash(id); the top-k keys per group are a weighted sample —
    inclusion probability proportional to weight, exactly the
    importance-sampling shape corpus mixing wants (e.g. sample documents
    proportional to token count).

    Deterministic and retry-stable like stratified_sample: u comes from
    the portable hash, never rand(). Keys ROUND to 9 decimals before
    ranking (ties broken by id) so the DuckDB differential cannot flip
    on cross-engine pow() ulps.

    Scale shape: key computation is map-side; selection is one rank
    window per group. For huge groups compose with bottom_k_sample's
    count-broadcast prefilter; for full-corpus k use the
    TakeOrderedAndProject form (orderBy + limit).
    """
    from pyspark.sql import Window

    u = uniform_hash(id_col, mode)
    key = F.round(
        F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double")), 9
    )
    w = Window.partitionBy(group_col).orderBy(
        F.desc("__wkey"), F.col(id_col).asc()
    )
    return (
        df.withColumn("__wkey", key)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.lit(k))
        .drop("__rn")
        .withColumnRenamed("__wkey", "sample_key")
    )


def unimax_weights(
    df: DataFrame,
    stratum_col: str,
    text_col: str,
    budget_frac: float = 0.5,
    epochs: float = 2.0,
) -> DataFrame:
    """UniMax language-budget allocation (Chung et al. 2023): spread a
    token budget ``B = budget_frac * total_tokens`` as UNIFORMLY as
    possible across strata, capping each stratum at ``epochs`` passes
    over its own data (cap_l = epochs * n_tokens_l) — the repetition-
    bounded alternative to temperature mixing (``mixture_weights``)
    that stops low-resource languages from being epoch-ed into
    memorization.

    The exact waterfilling has a closed window-function form: sort
    strata by cap ascending; a stratum SATURATES (gets its full cap)
    iff ``cap_i * (L - i + 1) <= B - cumsum(cap)_{<i}`` (with caps
    ascending, the saturated set is always a prefix, so the per-step
    "remaining / strata left" share test needs no recursion); everyone
    else gets the final water level ``(B - sum saturated caps) /
    (#unsaturated)``. Fully SQL-expressible — the DuckDB oracle
    recomputes allocation INCLUDING the waterfill.

    Scale shape: ONE distributed token-count aggregation; every window
    runs over the L-row stratum table (L = #languages, tens). Output:
    (stratum, n_tokens, cap, alloc, weight), weight = alloc / B.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("n_tokens")
    )
    everything = Window.partitionBy()
    asc = Window.orderBy(F.col("cap").asc(), F.col("stratum").asc())
    cum_before = asc.rowsBetween(Window.unboundedPreceding, -1)
    cap = F.col("n_tokens").cast("double") * F.lit(float(epochs))
    staged = (
        counts.withColumn("cap", cap)
        .withColumn(
            "B",
            F.lit(float(budget_frac))
            * F.sum(F.col("n_tokens").cast("double")).over(everything),
        )
        .withColumn("L", F.count(F.lit(1)).over(everything))
        .withColumn("i", F.row_number().over(asc))
        .withColumn(
            "s_before", F.coalesce(F.sum("cap").over(cum_before), F.lit(0.0))
        )
        .withColumn(
            "saturated",
            (
                F.col("cap") * (F.col("L") - F.col("i") + 1)
                <= F.col("B") - F.col("s_before")
            ).cast("int"),
        )
    )
    k = F.sum("saturated").over(everything)
    s_k = F.sum(F.col("cap") * F.col("saturated")).over(everything)
    level = F.when(
        F.col("L") > k, (F.col("B") - s_k) / (F.col("L") - k)
    ).otherwise(F.lit(0.0))
    alloc = F.when(F.col("saturated") == 1, F.col("cap")).otherwise(level)
    return staged.select(
        F.col("stratum").alias(stratum_col),
        "n_tokens",
        F.round("cap", 6).alias("cap"),
        F.round(alloc, 6).alias("alloc"),
        F.round(alloc / F.col("B"), 9).alias("weight"),
    )


def domain_mixture_weights(
    docs: DataFrame,
    embeddings: DataFrame,
    alpha: float = 0.3,
    target_total: int | None = None,
    n_cells: int | None = None,
    seed: int = 7,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    text_col: str = "text",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Temperature mixing over LEARNED domains instead of metadata
    strata (the DoReMi/Dolma corpus-organization move: when `source`
    labels are missing or too coarse, k-means cells over document
    embeddings become the mixing domains): assign every embedding to
    its nearest IVF centroid (bounded-sample k-means fit, GEMM
    assignment — both existing scale paths), join token counts from the
    documents table, then reweight per-cell token mass with
    ``p_c ∝ tokens_c^alpha`` (alpha=1 proportional, 0 uniform; 0.3 the
    mT5 temperature).

    Output per cell: (cell, n_docs, n_tokens, p, rate, epochs) — rate
    is the capped per-TOKEN keep rate hitting ``target_total`` tokens
    in expectation, epochs the uncapped expected passes (>1 ⇒ the cell
    must repeat). ``target_total`` defaults to half the corpus tokens.

    Scale shape: centroid fit is corpus-size-constant (bounded
    sample); assignment is a zero-exchange Arrow GEMM map; ONE
    doc-keyed join (embeddings↔docs share the id) and ONE cell agg;
    every window after that runs over the #cells-row table
    (k ~ sqrt(n) via auto_n_cells, never corpus-sized).
    """
    from pyspark.sql import Window

    from .similarity import assign_cells, auto_n_cells, train_ivf_centroids

    if centroids is not None:
        # pre-trained quantizer (offline index-build contract, same as
        # ivf_topk/semantic_dedup): skips the in-place KMeans fit
        cents = centroids
    else:
        if n_cells is None:
            n_cells = auto_n_cells(embeddings.count(), max_cells=4096)
        cents = train_ivf_centroids(
            embeddings, n_cells, id_col=vec_id_col, seed=seed
        )
    assigned = assign_cells(embeddings, cents, id_col=vec_id_col).select(
        F.col("id").alias(id_col), "cell"
    )
    toks = docs.select(
        F.col(id_col), F.size(F.split(F.col(text_col), " ")).alias("__nt")
    )
    counts = (
        assigned.join(toks, id_col)
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__nt").cast("long").alias("n_tokens"),
        )
    )
    everything = Window.partitionBy()
    total = F.sum(F.col("n_tokens").cast("double")).over(everything)
    tgt = (
        F.lit(float(target_total))
        if target_total is not None
        else total * F.lit(0.5)
    )
    w = F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    p = w / F.sum(w).over(everything)
    expected = p * tgt
    return counts.select(
        "cell",
        "n_docs",
        "n_tokens",
        F.round(p, 9).alias("p"),
        F.round(F.least(F.lit(1.0), expected / F.col("n_tokens")), 9).alias(
            "rate"
        ),
        F.round(expected / F.col("n_tokens"), 9).alias("epochs"),
    )


def training_order(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Deterministic training-order assignment: every row gets a
    (shard, pos) so a dataloader can stream shard files in pos order
    and see a seeded pseudo-random global permutation — WITHOUT a
    global sort (the classic pre-training shuffle step; c.f. the
    shuffled shard layout of GPT/T5 data pipelines).

    Shard = the two-step Lehmer hash of (id + seed) mod n_shards (pure
    integer arithmetic — no float boundary to disagree across engines);
    pos = rank of a THIRD Lehmer step within the shard (ties -> id).
    Each Lehmer step is a bijection mod M, so distinct ids keep
    distinct order keys and the permutation has LCG equidistribution.

    Scale shape: shard assignment is a map-side expression; the only
    exchange is the shard-keyed window — each shard ranks LOCALLY in
    parallel, bounded by corpus/n_shards, never a single global sort.
    Deterministic under retries and independent of input partitioning.
    """
    from pyspark.sql import Window

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    x0 = (
        F.abs(F.col(id_col) + F.lit(seed) * F.lit(1_000_003)) + _MINSTD_OFFSET
    ) % _MINSTD_M
    x1 = x0 * _MINSTD_A % _MINSTD_M
    x2 = x1 * _MINSTD_A % _MINSTD_M
    x3 = x2 * _MINSTD_A % _MINSTD_M
    out = df.select(
        F.col(id_col),
        F.pmod(x2, F.lit(n_shards)).cast("int").alias("shard"),
        x3.alias("__ord"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("__ord"), F.col(id_col))
    return out.withColumn("pos", F.row_number().over(w)).drop("__ord")


def materialize_epochs(
    df: DataFrame,
    stratum_col: str,
    epochs_df: DataFrame,
    id_col: str = "doc_id",
    mode: str = "minstd",
) -> DataFrame:
    """Materialize fractional per-stratum epoch counts into the actual
    training MULTISET: a stratum with epochs=2.3 emits every doc twice
    (copy 0, copy 1) plus a deterministic 30%-of-docs third copy — the
    upsampling step that turns `mixture_weights`/`unimax_weights`
    allocations into concrete repeated rows (low-resource domains get
    >1 pass; Hoffmann-style data budgets get an exact multiset, not an
    expectation over a sampler's RNG).

    The fractional pass keeps doc i iff ``uniform_hash(id) < frac`` —
    the same engine-portable minstd contract every sampler here uses,
    so the SQL oracle reproduces the multiset EXACTLY (hash-checkable),
    re-runs are idempotent, and the same doc set is chosen at any
    partitioning/cluster size.

    Scale shape: epochs_df is stratum-count-sized (broadcast); copies
    generate map-side via sequence+explode; NO shuffle at all — output
    lands partitioned exactly as the input corpus.

    Output: input columns + ``copy_idx`` (0-based). Expected row count
    = Σ_s n_s * epochs_s (exact for the integer part, hash-measure for
    the fraction).
    """
    eps = epochs_df.select(
        F.col(stratum_col), F.col("epochs").cast("double").alias("__e")
    )
    j = df.join(F.broadcast(eps), stratum_col)
    full = F.floor("__e").cast("int")
    frac = F.col("__e") - F.floor("__e")
    u = uniform_hash(id_col, mode)
    n_copies = (full + (u < frac).cast("int")).cast("int")
    # guard the n_copies=0 case: Spark's sequence(1, 0) yields a
    # DESCENDING [1, 0], which would emit two phantom copies for a doc
    # the fractional pass dropped
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(1), n_copies)
    ).otherwise(F.array().cast("array<int>"))
    return (
        j.withColumn("copy_idx", F.explode(copies))
        .withColumn("copy_idx", F.col("copy_idx") - 1)
        .drop("__e")
    )
