"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard.

Charter extension scope (SURVEY.md §2.10). All-Spark designs:

- Exact: content hash -> groupBy -> keep min id. One shuffle on the
  hash; at 100 TB this is the cheapest possible pass (hash computed
  map-side, shuffle carries only (hash, id)).
- N-gram Jaccard (exact near-dup): explode distinct shingles ->
  self-equi-join on shingle -> per-pair intersection counts ->
  |A∪B| = |A|+|B|-|A∩B|. The join key is the shingle, so frequency
  skew is the hazard — drop ultra-common shingles (df > limit) the
  same way search engines drop stopwords.
- MinHash+LSH (approximate near-dup at scale): k independent hash
  functions via seeded xxhash64; signature = per-doc min of each.
  Banding turns "signature similarity" into equi-join keys: pairs
  agreeing on >=1 band are candidates; exact Jaccard verifies only
  candidates. Fan-out is bands-per-doc (constant), so cost is linear
  in corpus size instead of O(n^2).
- SimHash: 64-bit sign-aggregated token-hash fingerprint; near-dups
  have small Hamming distance. Candidate pairs via Manku-style
  block-combination tables (pigeonhole: hamming<=d => all blocks of
  some (n_blocks-d)-combination equal — exact recall with ~33-bit
  bucket keys at d=3), verified with bit_count(xor)<=threshold. All
  bit math is JVM-side.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .parallelism import fan_out
from .textops import shingles_of_tokens, tokens


def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Canonical-row groups: (content md5, canonical id, n_copies)."""
    h = F.md5(F.col(content_col)).alias("content_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
    )


def shingle_sets(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(doc, s, n) exploded distinct-shingle table; ``n`` = the doc's
    shingle-set size, stamped on every row.

    Carrying ``n`` through the explode is free (it is just the array
    length already computed) and lets Jaccard verification read both set
    sizes straight off the pair rows — removing the per-doc size
    aggregation AND its two joins from the plan entirely.
    """
    # The shingle array is materialized ONCE as a column, then exploded
    # as an attribute. This is safe only because session.py excludes
    # InferFiltersFromGenerate — with that rule on, Catalyst inserts a
    # pre-Generate Filter that re-inlines and re-evaluates the whole
    # array build per row off the codegen path (measured ~10x slower).
    # fan_out: shingling is the corpus-scan-heavy map of every consumer
    # (Jaccard/MinHash/prefix/containment); a one-row-group input would
    # serialize it on one core (round-12 measurement: 0.72 s -> 0.12 s).
    return (
        fan_out(df)
        .select(F.col(id_col).alias("doc"), tokens(text_col).alias("t"))
        .select("doc", shingles_of_tokens(F.col("t"), k).alias("sh"))
        .select("doc", F.explode("sh").alias("s"), F.size("sh").alias("n"))
    )


def _pairs_from_groups(grouped: DataFrame, docs_col: str = "docs") -> DataFrame:
    """All ordered pairs (d1 < d2) from each row's doc-id array.

    The scale-safe alternative to a self-equi-join: one groupBy already
    co-located every bucket, so pair generation is a per-row array
    expansion (cost = sum over buckets of c*(c-1)/2) with no second
    shuffle of the full table. Callers bound bucket size (stopword-
    shingle guard / LSH band width) to keep the expansion linear.

    Two-stage explode (posexplode, then explode of the strictly-later
    slice): per-row memory is bounded by the bucket ARRAY, never the
    C(c,2) pair set — duplicate-cluster buckets (hundreds of identical
    docs in one bucket) stay GC-safe.
    """
    sorted_df = grouped.withColumn("__ds", F.array_sort(F.col(docs_col)))
    e1 = sorted_df.select("__ds", F.posexplode("__ds").alias("i", "d1"))
    return e1.select(
        "d1",
        F.explode(
            F.slice("__ds", F.col("i") + F.lit(2), F.size("__ds"))
        ).alias("d2"),
    )


def _frac_cap(
    df: DataFrame,
    max_shingle_df: int | None,
    max_shingle_frac: float | None,
):
    """Resolve the fractional df-cap WITHOUT a separate count job.

    The corpus row count folds into the verify plan as a broadcast
    1-row scalar, so the cap ``ceil(frac * n)`` evaluates in the same
    DAG the pairs run in — one fewer driver job per query, identical
    IEEE-double arithmetic to the previous ``math.ceil(frac *
    df.count())`` (and to the oracle's ``ceil(frac * count(*))``), so
    the effective cap value is unchanged. Returns ``(aux, cap)`` where
    ``aux`` is the 1-row count DataFrame to broadcast-join before the
    bucket filter (None when no fraction is requested) and ``cap`` the
    int or Column to compare bucket sizes against."""
    if max_shingle_frac is None:
        return None, max_shingle_df
    aux = df.agg(F.count(F.lit(1)).alias("__n_docs"))
    cap = F.ceil(F.lit(float(max_shingle_frac)) * F.col("__n_docs"))
    if max_shingle_df:
        cap = F.greatest(F.lit(int(max_shingle_df)).cast("long"), cap)
    return aux, cap


def _jaccard_verify(
    sh: DataFrame,
    pairs: DataFrame | None,
    threshold: float,
    max_bucket=None,
    aux: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard for co-bucketed docs from a (doc, s, n) shingle
    table (``n`` = that doc's set size, stamped per row).

    Two shuffles, zero joins: groupBy shingle-hash collecting
    (doc, n) structs → per-bucket pair expansion carrying both sizes →
    groupBy pair counts the intersection, and |A∪B| = n1 + n2 − |A∩B|
    is pure arithmetic on the aggregated row. ``pairs`` (LSH path)
    restricts verification to candidate pairs via one semi-join.

    ``max_bucket`` is the boilerplate-shingle skew guard: a shingle's
    document frequency IS its bucket size here, so capping the bucket
    inside the existing filter drops hot shingles for free — no
    df-count aggregation, no semi-join, no second shingling pass.
    """
    bucket_ok = F.size("docs") > 1
    if max_bucket is not None:
        bucket_ok = bucket_ok & (F.size("docs") <= max_bucket)
    groups = (
        sh.withColumn("sh64", F.xxhash64("s"))
        .groupBy("sh64")
        # sort INSIDE the agg so the pair lambdas below capture a plain
        # attribute — capturing array_sort(docs) as an expression would
        # re-sort the bucket once per element (lambda-inlining hazard,
        # see shingle_sets; measured ~2x on the expansion stage).
        .agg(F.sort_array(F.collect_list(F.struct("doc", "n"))).alias("docs"))
    )
    if aux is not None:  # 1-row count scalar feeding a Column max_bucket
        groups = groups.join(F.broadcast(aux))
    groups = groups.filter(bucket_ok)
    # TWO-STAGE explode: posexplode each (sorted) bucket, then explode
    # that element's strictly-later slice. Never materializes the full
    # C(c,2) pair array as one row — a c=250 duplicate-cluster bucket
    # would otherwise pack ~31k structs into a single row and die of GC
    # at exactly the workload (re-crawl dup clusters) dedup exists for.
    e1 = groups.select(
        "docs", F.posexplode("docs").alias("i", "x")
    )
    expanded = e1.select(
        F.col("x.doc").alias("d1"),
        F.col("x.n").alias("n1"),
        F.explode(
            F.slice("docs", F.col("i") + F.lit(2), F.size("docs"))
        ).alias("y"),
    )
    # n1/n2 are functions of (d1, d2): carry them as first() aggregates,
    # not group keys — halves the hash-agg key width on the big shuffle.
    inter = expanded.groupBy(
        "d1", F.col("y.doc").alias("d2")
    ).agg(
        F.count("*").alias("inter"),
        F.first("n1").alias("n1"),
        F.first("y.n").alias("n2"),
    )
    if pairs is not None:
        inter = inter.join(pairs, ["d1", "d2"], "left_semi")
    jac = F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter"))
    return inter.select(
        "d1", "d2", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.3,
    max_shingle_df: int | None = None,
    max_shingle_frac: float | None = None,
) -> DataFrame:
    """Exact all-pairs Jaccard over k-shingle sets, thresholded.

    ``max_shingle_df`` drops shingles appearing in more than that many
    docs before pair expansion — the skew guard that keeps the
    expansion from quadratic blowup on boilerplate at scale. Applied
    as a bucket-size cap inside the verify grouping (df == bucket
    size), so the guard adds zero shuffles.

    An ABSOLUTE df cap does not survive corpus growth: shingle
    document frequencies grow with the corpus, so a threshold tuned at
    one scale silently drops the intersection mass at 10x that scale
    while |A| and |B| stay full-set — measured recall collapse to ZERO
    pairs on a 10x-replicated corpus with df<=50. Pass
    ``max_shingle_frac`` (e.g. 0.002 = 0.2% of docs) instead for a
    threshold that scales with the corpus; the effective cap is
    max(max_shingle_df, ceil(frac * n_docs)), one count() of the id
    column at planning time.
    """
    aux, cap = _frac_cap(df, max_shingle_df, max_shingle_frac)
    sh = shingle_sets(df, id_col, text_col, k)
    return _jaccard_verify(
        sh, pairs=None, threshold=threshold, max_bucket=cap, aux=aux
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """EXACT thresholded Jaccard join via prefix filtering (AllPairs:
    Bayardo et al., WWW 2007; PPJoin: Xiao et al., WWW 2008) — the
    candidate generator that needs NO df cap and loses NO pairs.

    Shingles get a canonical global order: ascending document
    frequency, ties by hash (rarest first). For Jaccard >= t, a doc
    with set size n only needs its first p = n - ceil(t*n) + 1
    shingles in that order indexed: J(A,B) >= t forces an overlap of
    at least ceil(t*max(|A|,|B|)), which cannot fit entirely outside
    both prefixes (PPJoin Lemma 1 with the symmetric prefix length).
    Candidates therefore co-bucket only on PREFIX tokens —
    predominantly rare ones — so bucket sizes collapse WITHOUT
    dropping any true pair: the exactness that the banded (recall<1)
    and df-capped (recall<1 on boilerplate-heavy pairs) paths trade
    away. The price over ``ngram_jaccard_pairs`` is one df-count agg
    and one per-doc rank window; the win is pair-expansion volume,
    which is what actually explodes at 100 TB. Candidates that survive
    the length filter are pruned again by PPJoin's positional filter
    (computed in the same shuffle that dedups pairs — see inline
    proof), and verification joins the surviving pairs to per-doc
    sorted shingle-hash arrays (`array_intersect` per pair, no
    post-join shuffle) — never through the all-bucket expansion (the
    semi-join form in ``_jaccard_verify`` would re-expand every bucket
    first, paying exactly the cost the prefix filter exists to avoid).
    """
    from pyspark.sql import Window

    # ONE materialization of the hashed shingle table feeds all three
    # consumers (df-count agg, rank join, verify arrays) — without it
    # the tokenize+shingle explode executes three times in this plan
    # (separate exchanges; Spark cannot reuse the subtree). Projected
    # to (doc, sh64, n) first so the checkpoint never stores the
    # shingle STRINGS (guide §2.3: project before materializing).
    hashed = (
        shingle_sets(df, id_col, text_col, k)  # (doc, s, n)
        .select("doc", F.xxhash64("s").alias("sh64"), "n")
        .localCheckpoint(eager=False)
    )
    freq = hashed.groupBy("sh64").agg(F.count("*").alias("df_s"))
    ranked = hashed.join(freq, "sh64").withColumn(
        "pos",
        F.row_number().over(Window.partitionBy("doc").orderBy("df_s", "sh64")),
    )
    p = F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
    prefix = ranked.filter(F.col("pos") <= p).select("sh64", "doc", "n", "pos")
    groups = (
        prefix.groupBy("sh64")
        .agg(F.sort_array(F.collect_list(F.struct("doc", "n", "pos"))).alias("docs"))
        .filter(F.size("docs") > 1)
    )
    # same two-stage explode as _jaccard_verify: bounded per-row memory.
    # PPJoin's LENGTH filter applies during expansion: J >= t forces
    # |A cap B| >= t*|A u B| >= t*max(n1,n2), and |A cap B| <= min(n1,
    # n2), so min >= t*max — size-mismatched co-bucketed pairs die here,
    # before the pair agg and the verify joins, at zero extra shuffles.
    e1 = groups.select("docs", F.posexplode("docs").alias("i", "x"))
    expanded = e1.select(
        F.col("x.doc").alias("d1"),
        F.col("x.n").alias("n1"),
        F.col("x.pos").alias("pos1"),
        F.explode(
            F.slice("docs", F.col("i") + F.lit(2), F.size("docs"))
        ).alias("y"),
    ).filter(
        F.least(F.col("n1"), F.col("y.n"))
        >= threshold * F.greatest(F.col("n1"), F.col("y.n"))
    )
    # PPJoin's POSITIONAL filter replaces the bare distinct: the same
    # shuffle that would dedup candidate pairs instead aggregates the
    # co-bucketed evidence — c shared prefix tokens and the global-order
    # positions of the LAST one. Every shared token outside that set
    # sorts strictly after it (else it would sit inside both prefixes
    # and be co-bucketed itself), so
    #   |A cap B| <= c + min(n1 - maxpos1, n2 - maxpos2),
    # while J >= t needs |A cap B| >= ceil(t/(1+t) * (n1+n2)). Pairs
    # whose upper bound cannot reach that overlap die HERE, before the
    # two verify joins re-shuffle full shingle sets — the candidate
    # count, not the verify arithmetic, is what explodes at 100 TB.
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("n1") + F.col("n2"))
    )
    cands = (
        expanded.groupBy("d1", F.col("y.doc").alias("d2"))
        .agg(
            F.count("*").alias("c"),
            F.first("n1").alias("n1"),
            F.first("y.n").alias("n2"),
            F.max("pos1").alias("maxpos1"),
            F.max("y.pos").alias("maxpos2"),
        )
        .filter(
            F.col("c")
            + F.least(
                F.col("n1") - F.col("maxpos1"), F.col("n2") - F.col("maxpos2")
            )
            >= alpha
        )
        .select("d1", "d2")
    )
    # Verify surviving pairs against per-doc sorted shingle-hash ARRAYS,
    # not a re-join of every (doc, shingle) row: the row form shuffles
    # |pairs| x avg-set-size rows through a (d2, s) join plus a final
    # (d1, d2) hash-agg (~16M rows at sf0.1), while the array form
    # joins |pairs| rows to a |docs|-row array table twice (tiny side
    # auto-broadcast locally; plain doc-keyed shuffle join at cluster
    # scale) and computes the intersection size JVM-side per pair with
    # NO post-join shuffle at all. Hash-level equality (xxhash64) is the
    # same intersection definition the co-bucket counting in
    # _jaccard_verify has used since round 3 — oracle-hash-green at
    # every SF, with 64-bit collision odds ~1e-15 at these set sizes.
    arrs = hashed.groupBy("doc").agg(
        F.sort_array(F.collect_list("sh64")).alias("arr"),
        F.first("n").alias("n"),
    )
    paired = cands.join(
        arrs.select(
            F.col("doc").alias("d1"),
            F.col("arr").alias("arr1"),
            F.col("n").alias("n1"),
        ),
        "d1",
    ).join(
        arrs.select(
            F.col("doc").alias("d2"),
            F.col("arr").alias("arr2"),
            F.col("n").alias("n2"),
        ),
        "d2",
    )
    inter = paired.withColumn(
        "inter", F.size(F.array_intersect("arr1", "arr2"))
    )
    jac = F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter"))
    return inter.select(
        "d1", "d2", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, n_hashes: int = 32
) -> DataFrame:
    """Per-doc MinHash signature: one pass, ``n_hashes`` min-aggregates.

    Hash family: xxhash64(shingle, salt_i) — deterministic, JVM-side,
    no Python. Returns (doc, h0..h{n-1}).

    Round 13 tried the "zero-shuffle" map form — ``array_min(
    transform(sh, x -> xxhash64(x, i)))`` per doc row, removing the
    hashpartitioning(doc) exchange outright (guide §2.4) — and it
    measured 1.7x SLOWER end to end (dedup_minhash_lsh 3.1 -> 5.3 s
    with a healthy 0.84 s control): Spark's higher-order functions run
    INTERPRETED, one lambda-projection eval per array element, so 32
    transform+array_min passes over each ~50-element shingle array
    lose badly to the fully-codegen'd explode + 32 min() partial
    aggregates, whose map-side combine also keeps the exchange payload
    at one (doc, 32 longs) row per doc. Reverted; kept as the
    counter-example so a later round does not re-try it.
    """
    sh = shingle_sets(df, id_col, text_col, k)
    # SQL-string aggregates: one JVM parse each (see PERFORMANCE.md
    # fix 9 — Column-object assembly of generated expression families
    # is serial py4j driver cost that no cluster size amortizes).
    aggs = [F.expr(f"min(xxhash64(s, {i})) as h{i}") for i in range(n_hashes)]
    return sh.groupBy("doc").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.3,
) -> DataFrame:
    """MinHash LSH candidate generation + exact-Jaccard verification.

    rows-per-doc after banding = ``bands`` (constant), so candidate
    generation is linear-scan + equi-join — the 100 TB path. Verified
    pairs carry their exact Jaccard, so output semantics match
    ``ngram_jaccard_pairs`` up to LSH recall.
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, k, n_hashes)
    structs = ", ".join(
        "struct({b} as band, xxhash64({cols}) as bh)".format(
            b=b,
            cols=", ".join(
                f"h{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    banded = sig.selectExpr("doc", f"explode(array({structs})) as bk").selectExpr(
        "doc", "bk.band as band", "bk.bh as bh"
    )
    # Candidate pairs by bucket expansion (no self-join): docs sharing a
    # (band, band-hash) bucket are grouped by the banding shuffle itself.
    buckets = (
        banded.groupBy("band", "bh")
        .agg(F.sort_array(F.collect_list("doc")).alias("docs"))
        .filter(F.size("docs") > 1)
    )
    # Materialize the candidate table: it feeds BOTH the semi-join doc
    # filter and the verify join, and without the checkpoint the whole
    # signature->banding->pair chain recomputes for each consumer (two
    # full corpus tokenize+minhash passes; measured ~2x wall and plan
    # exchanges 14->8). Candidates are the tiny post-LSH set — exactly
    # what should pin in memory. eager=False (round 13): construction
    # no longer runs a separate blocking job — the first consumer's job
    # materializes the checkpoint and the second reuses it (same
    # single-execution guarantee, one fewer driver round trip per run;
    # executor loss on a cluster recomputes from the truncated
    # lineage's parquet inputs — see ckpt.py).
    cand = _pairs_from_groups(buckets).distinct().localCheckpoint(eager=False)
    # Exact verification only on candidates: first shrink the shingle
    # table to docs that appear in some candidate pair (the LSH payoff —
    # at corpus scale this is a tiny fraction), then verify.
    cand_docs = (
        cand.select(F.col("d1").alias("doc"))
        .unionByName(cand.select(F.col("d2").alias("doc")))
        .distinct()
    )
    sh = shingle_sets(df, id_col, text_col, k).join(cand_docs, "doc", "left_semi")
    return _jaccard_verify(sh, pairs=cand, threshold=threshold)


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per doc: sign-sum of token-hash bits.

    64 conditional-sum aggregates in ONE pass (partial aggregation
    map-side); fingerprint assembled with shifts — no UDF.
    """
    from .textops import tokens

    tok = fan_out(df).select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("t")
    ).withColumn("h", F.xxhash64("t"))
    # Expressions as SQL strings: one JVM-side parse each instead of
    # ~8 py4j round-trips per Column object — the 64-agg + 64-term
    # fingerprint build dropped from ~2 s to ~0.2 s of driver time
    # (identical plan; the aggregates still combine map-side).
    bit_sums = [
        F.expr(
            f"sum(case when (shiftright(h, {i}) & 1) = 1 then 1 else -1 end) as b{i}"
        )
        for i in range(64)
    ]
    sums = tok.groupBy("doc").agg(*bit_sums)
    fp_sql = " | ".join(f"shiftleft(cast(b{i} > 0 as long), {i})" for i in range(64))
    return sums.selectExpr("doc", f"({fp_sql}) as simhash")


def _simhash_tables(max_hamming: int, n_blocks: int | None) -> tuple[int, list[tuple[int, ...]]]:
    """Choose the block-combination candidate scheme (Manku et al.,
    WWW'07 "Detecting Near-Duplicates for Web Crawling").

    The fingerprint is split into ``n_blocks`` blocks; a pair within
    Hamming distance d differs in at most d blocks, so it agrees on at
    least ``n_blocks - d`` — one candidate table per (n_blocks-d)-block
    combination preserves EXACT recall. Wider keys (more agreed blocks
    concatenated) mean exponentially fewer random bucket collisions:
    the old 4x16-bit chunk scheme (the degenerate n_blocks=4, d=3 case)
    made candidate pairs grow as C(n,2)/2^16 — QUADRATIC in corpus size
    (measured 13.5x wall-clock at 10x data); d=3/n_blocks=6 keys are
    ~33 bits, pushing the quadratic term out by ~2^17.

    Auto rule (``n_blocks=None``): maximize key width subject to
    C(n_blocks, d) <= 32 tables (shuffle rows per doc). d=3 -> 6 blocks
    / 20 tables / 33-bit keys, the standard config; d=6 -> 8 blocks /
    28 tables / 16-bit keys — exact recall (the old 4-chunk scheme
    silently LOST pairs for d>3: 4+ differing bits can touch every
    chunk), but narrow keys, so prefer d<=3 at scale.
    """
    from itertools import combinations

    if n_blocks is None:
        best = None
        for n in range(max_hamming + 1, 2 * max_hamming + 4):
            r = n - max_hamming
            tables = math.comb(n, r)
            if tables > 32:
                continue
            key_bits = r * (64 // n)
            if best is None or key_bits > best[1]:
                best = (n, key_bits)
        n_blocks = best[0] if best else max_hamming + 1
    if n_blocks <= max_hamming:
        raise ValueError(
            f"n_blocks ({n_blocks}) must exceed max_hamming ({max_hamming}) "
            "for the pigeonhole recall guarantee"
        )
    r = n_blocks - max_hamming
    return n_blocks, list(combinations(range(n_blocks), r))


def fingerprint_pairs(
    fp: DataFrame,
    max_hamming: int = 3,
    n_blocks: int | None = None,
) -> DataFrame:
    """Near-dup pairs among precomputed 64-bit fingerprints — the core
    of ``simhash_pairs``, factored out (round 9) so ANY 64-bit
    similarity-preserving hash rides the same Manku block-combination
    candidate machinery: text SimHash and image pHash
    (``codecs.phash64``) both land here.

    Input: a (doc, simhash) frame. Candidates via block-combination
    tables (``_simhash_tables`` — exact pigeonhole recall at any
    ``max_hamming``), verified with bit_count(xor). Output:
    (d1, d2, hamming) with d1 < d2.

    ``fp`` is materialized once (localCheckpoint): it feeds THREE
    consumers (the table-key explode and both verify sides), so a
    compute-heavy fingerprint upstream — text SimHash's 64-aggregate
    pass, the codec pHash decodes — would otherwise execute three
    times (Spark reuses the shuffle below the agg, not the agg). The
    checkpointed table is (doc, int64) — 16 B/doc at any scale."""
    fp = fp.localCheckpoint(eager=False)
    n_blocks, combos = _simhash_tables(max_hamming, n_blocks)
    widths = [64 // n_blocks + (1 if i < 64 % n_blocks else 0) for i in range(n_blocks)]
    starts = [sum(widths[:i]) for i in range(n_blocks)]

    def block(i: int) -> str:
        return f"(shiftrightunsigned(simhash, {starts[i]}) & {(1 << widths[i]) - 1})"

    # One (table, key) row per combination; key = hash of the agreed
    # blocks (a rare hash collision only adds a candidate the exact
    # hamming verify then drops). SQL-string build: one parse for the
    # whole table array, not 20 x 4 Column round-trips.
    structs = ", ".join(
        f"struct({t} as t, xxhash64({t}, {', '.join(block(i) for i in combo)}) as key)"
        for t, combo in enumerate(combos)
    )
    keys = fp.selectExpr("doc", f"explode(array({structs})) as tk").selectExpr(
        "doc", "tk.t as t", "tk.key as key"
    )
    # Bucket expansion instead of self-join: group docs per (table, key),
    # expand pairs, then one fingerprint join to verify.
    buckets = (
        keys.groupBy("t", "key")
        .agg(F.sort_array(F.collect_list("doc")).alias("docs"))
        .filter(F.size("docs") > 1)
    )
    cand = _pairs_from_groups(buckets).distinct()
    fp1 = fp.select(F.col("doc").alias("d1"), F.col("simhash").alias("sh1"))
    fp2 = fp.select(F.col("doc").alias("d2"), F.col("simhash").alias("sh2"))
    return (
        cand.join(fp1, "d1")
        .join(fp2, "d2")
        .select(
            "d1",
            "d2",
            F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_blocks: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance.

    Candidates via block-combination tables (see ``_simhash_tables`` —
    exact pigeonhole recall at any ``max_hamming``), verified with
    bit_count(xor). Exact duplicates share every table; run
    ``canonical_near_dup_pairs`` (exact-collapse first) so duplicate
    clusters never reach the bucket expansion — at 100 TB that, plus the
    ~2^-33 random collision rate of the d=3 keys, keeps bucket sizes
    O(cluster), not O(corpus/2^16).
    """
    return fingerprint_pairs(
        simhash(df, id_col, text_col), max_hamming, n_blocks
    )


def canonical_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    method: str = "minhash",
    **kwargs,
) -> tuple[DataFrame, DataFrame]:
    """Canonical-first near-dup: collapse exact duplicates, then run
    near-dup detection over DISTINCT CONTENTS only.

    A re-crawl corpus with c-way duplicate clusters makes any direct
    near-dup pass emit C(c,2) pairs per cluster (measured: 10x
    replication -> ~980x the pair output) and pushes c-sized buckets
    through every expansion. Exact dedup is one cheap hash pass that
    removes the c factor entirely; near-dup cost then depends on
    distinct content, not crawl redundancy.

    Returns ``(groups, pairs)``: ``groups`` = exact_dedup output
    (content_hash, canonical_id, n_copies); ``pairs`` = near-dup pairs
    BETWEEN canonical ids (method: "minhash" | "ngram" | "simhash").
    A pair (a, b) means every member of a's exact-group is a near-dup
    of every member of b's — consumers expand only if they need the
    full pair list.
    """
    groups = exact_dedup(df, id_col, text_col)
    canon = df.join(
        groups.select(F.col("canonical_id").alias(id_col)), id_col, "left_semi"
    )
    if method == "minhash":
        pairs = minhash_lsh_pairs(canon, id_col, text_col, **kwargs)
    elif method == "ngram":
        pairs = ngram_jaccard_pairs(canon, id_col, text_col, **kwargs)
    elif method == "simhash":
        pairs = simhash_pairs(canon, id_col, text_col, **kwargs)
    else:
        raise ValueError(f"unknown method {method!r}")
    return groups, pairs


def incremental_ngram_dups(
    new_docs: DataFrame,
    historical: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """Incremental dedup: flag each NEW-batch document whose best
    n-gram Jaccard against ANY historical document reaches
    ``threshold`` — the production shape (dedupe the day's crawl
    against the corpus, not the corpus against itself).

    Scale shape: in a real deployment the historical shingle-hash
    table is materialized at write time (it never recomputes), the
    join is an int64 equi-join on shingle hash, and the per-pair
    intersection counts collapse to ONE row per (new, historical)
    candidate pair before the jaccard math; a final max() reduces to
    one row per new doc. The cheap at-100-TB composition: run
    ``textops.bloom_decontaminate`` (map-only) over the new batch
    first and feed only its flagged slice here; boilerplate-shingle
    skew takes the same fractional guard as ``ngram_jaccard_pairs``.

    Returns (id, best_jaccard, is_dup) for EVERY new doc (0.0 for no
    overlap).
    """
    def shingle_hashes(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(
                F.col(id_col).alias(name),
                F.split(F.col(text_col), " ").alias("__t"),
            )
            .select(
                name,
                F.explode(
                    shingles_of_tokens(F.col("__t"), k)
                ).alias("__s"),
            )
            .select(name, F.xxhash64("__s").alias("__h"))
        )

    ns = shingle_hashes(new_docs, "nd")
    hs = shingle_hashes(historical, "hd")
    nsize = ns.groupBy("nd").agg(F.count("*").alias("__nn"))
    hsize = hs.groupBy("hd").agg(F.count("*").alias("__hn"))
    inter = (
        ns.join(hs, "__h")
        .groupBy("nd", "hd")
        .agg(F.count("*").alias("__i"))
    )
    best = (
        inter.join(nsize, "nd")
        .join(hsize, "hd")
        .select(
            "nd",
            F.round(
                F.col("__i") / (F.col("__nn") + F.col("__hn") - F.col("__i")),
                6,
            ).alias("__j"),
        )
        .groupBy("nd")
        .agg(F.max("__j").alias("best_j"))
    )
    return (
        new_docs.select(F.col(id_col))
        .join(best, F.col(id_col) == F.col("nd"), "left")
        .select(
            id_col,
            F.round(F.coalesce("best_j", F.lit(0.0)), 6).alias("best_jaccard"),
            (F.coalesce("best_j", F.lit(0.0)) >= threshold)
            .cast("int")
            .alias("is_dup"),
        )
    )


def levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 5,
    head: int = 40,
    block_prefix: int = 6,
    max_block_frac: float | None = None,
) -> DataFrame:
    """Blocked edit-distance near-dup pairs — the record-linkage tier
    (typo'd titles, OCR noise, near-identical headers) that token-set
    Jaccard misses because a single in-word typo changes the token.

    Keys are the lowercased first ``head`` chars; candidate pairs share
    the first ``block_prefix`` chars (classic prefix blocking), then
    verify with exact ``levenshtein <= max_dist``. Blocking recall is
    APPROXIMATE by design — an edit inside the prefix escapes the block
    (the same honesty contract as the LSH emitters; measured against
    brute force in tests). :func:`levenshtein_pairs_multipass` is the
    recall upgrade (prefix + suffix + length-band union).

    Scale shape: one equi-join on the block key (both sides shuffle on
    a short string); the quadratic levenshtein verify runs only within
    blocks. Prefix blocks follow a Zipf-ish size law —
    ``max_block_frac`` drops blocks holding more than that fraction of
    the corpus before pair expansion (the fractional skew guard,
    ngram_jaccard_pairs' max_shingle_frac design: the cap GROWS with
    the corpus instead of silently binding tighter). Output volume is
    inherently quadratic in near-dup FAMILY size — a corpus where every
    head has 10 near-copies yields ~45 pairs per family (measured 390x
    pairs at the 10x distinct-content probe, time linear in pairs);
    consumers wanting one row per family feed the pairs to
    components.dedup_cluster_assignment exactly like the other
    emitters.

    Output: (d1, d2, dist), d1 < d2, deterministic.
    """
    norm = F.lower(F.substring(F.col(text_col), 1, head))
    return _levenshtein_blocked(
        df, id_col, max_dist, norm,
        F.substring(norm, 1, block_prefix), max_block_frac,
    )


def levenshtein_pairs_multipass(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 5,
    head: int = 40,
    block_prefix: int = 6,
    max_block_frac: float | None = None,
    length_band: int = 8,
    max_block_rows: int | None = None,
) -> DataFrame:
    """Multi-pass blocked edit-distance pairs (VERDICT r5 #6) — the
    standard recall upgrade over single-pass prefix blocking: three
    blocking passes unioned, deduped on (d1, d2):

      1. prefix block  — first ``block_prefix`` chars (the single-pass
         key; misses edits INSIDE the prefix);
      2. suffix block  — last ``block_prefix`` chars (catches
         prefix-edited pairs whose tails agree);
      3. length band x 2-char prefix — ``floor(len/length_band)``
         concatenated with the first 2 chars (catches pairs edited in
         BOTH affix zones but still near-identical in bulk; the short
         prefix conjunct keeps raw length bands from going hot).

    A pair escapes only if every pass misses it — for max_dist=5 over
    40-char keys that requires edits spread across both affixes AND a
    band boundary straddle, which is why the union's measured recall
    strictly dominates the single pass (honesty test vs brute force).
    Each pass is the same equi-join shape with the same block guards.
    Distances are exact on every surviving pair, so the whole union
    stays DuckDB-differential (q:`dedup_levenshtein_multipass`).

    SCALE WARNING (round-7 100x probe): the length-band key is
    CONSTANT-CARDINALITY (≤ ~6 bands x alphabet² prefixes), so its
    blocks grow linearly with the corpus and the uncapped pass is
    Θ(n²/|keys|) — measured 1047x wall-clock at 100x data. Always set
    ``max_block_rows`` at scale (the registered query uses 1000); a
    capped block is dropped from that pass only — the other two passes,
    whose keys grow with content diversity, still see its docs.

    Output: (d1, d2, dist), d1 < d2, deterministic.
    """
    norm = F.lower(F.substring(F.col(text_col), 1, head))
    passes = [
        F.substring(norm, 1, block_prefix),
        F.substring(norm, -block_prefix, block_prefix),
        F.concat_ws(
            "#",
            F.floor(F.length(norm) / F.lit(length_band)).cast("string"),
            F.substring(norm, 1, 2),
        ),
    ]
    out = None
    for key in passes:
        p = _levenshtein_blocked(
            df, id_col, max_dist, norm, key, max_block_frac, max_block_rows
        )
        out = p if out is None else out.unionByName(p)
    return out.dropDuplicates(["d1", "d2"])


def _levenshtein_blocked(
    df: DataFrame,
    id_col: str,
    max_dist: int,
    norm,
    block_key,
    max_block_frac: float | None,
    max_block_rows: int | None = None,
) -> DataFrame:
    """One blocking pass: equi-join on ``block_key``, thresholded
    banded-DP verify. Shared by the single-pass and multi-pass forms.

    Two independent block guards, because they bound different failure
    modes:

    - ``max_block_frac`` (fractional) kills SKEW — a block holding more
      than that fraction of the corpus (Zipf head, empty-string keys).
      It cannot bound quadratic growth when the KEY SPACE saturates: if
      the key has ~constant cardinality, every block grows linearly
      with the corpus while staying far under any fraction, and pair
      expansion is Θ(n²/|keys|).
    - ``max_block_rows`` (absolute) bounds worst-case expansion when
      the key saturates — the standard record-linkage block-size cap.
      The round-7 100x probe caught exactly this: the multipass
      length-band key (6 bands x ~alphabet² two-char prefixes) is
      constant-cardinality, and the uncapped pass went 1047x wall-clock
      at 100x data. Capped blocks are DROPPED (recall, not
      correctness — the emitter contract is already approximate-recall,
      exact-verify); the cap is mirrored in the DuckDB oracle so the
      whole guarded pipeline stays differential.
    """
    # Round 13 (guide §2.4, VERDICT r12 #8): the blocking pass was a
    # SELF-equi-join on the block key — Spark executes the keyed
    # projection subtree once per join side, each behind its own
    # window-count exchange+sort (the block-size guards) — i.e. two
    # scans, two exchanges, two window sorts and a join build PER PASS
    # (x3 in the multipass union). One groupBy already co-locates every
    # block, so this is the _jaccard_verify bucket-expansion shape
    # instead: ONE exchange per pass, the guards read the bucket SIZE
    # (== the old window count) off the aggregated row for free, and
    # the two-stage explode bounds per-row memory by the block array
    # (blocks are capped by the guards). Pair set identical: sort_array
    # on (id, key) structs orders by the unique id, so the strictly-
    # later slice emits exactly the old join's d1 < d2 pairs; NULL
    # block keys are filtered explicitly (the old join's NULL != NULL
    # semantics made them pairless).
    keyed = df.select(
        F.col(id_col).alias("__id"),
        norm.alias("__k"),
        block_key.alias("__b"),
    ).filter(F.col("__b").isNotNull())
    groups = keyed.groupBy("__b").agg(
        F.sort_array(F.collect_list(F.struct("__id", "__k"))).alias("docs")
    )
    ok = F.size("docs") > 1
    if max_block_rows is not None:
        ok = ok & (F.size("docs") <= F.lit(int(max_block_rows)))
    if max_block_frac is not None:
        n = df.agg(F.count(F.lit(1)).alias("__n"))
        groups = groups.join(F.broadcast(n))
        ok = ok & (
            F.size("docs") <= F.ceil(F.lit(max_block_frac) * F.col("__n"))
        )
    groups = groups.filter(ok)
    e1 = groups.select("docs", F.posexplode("docs").alias("i", "x"))
    expanded = e1.select(
        F.col("x.__id").alias("d1"),
        F.col("x.__k").alias("k1"),
        F.explode(
            F.slice("docs", F.col("i") + F.lit(2), F.size("docs"))
        ).alias("y"),
    )
    return (
        expanded.select(
            "d1",
            F.col("y.__id").alias("d2"),
            # thresholded form: Ukkonen banded DP, O(d*n) per pair
            # instead of O(n^2), returning -1 above the threshold —
            # exact distances for every surviving pair, so the DuckDB
            # oracle's plain `levenshtein(a,b) <= d` states identical
            # results (measured 6.4 s -> ~2 s at sf0.1).
            F.levenshtein(F.col("k1"), F.col("y.__k"), max_dist).alias(
                "dist"
            ),
        )
        .filter(F.col("dist") >= 0)
    )


def source_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Pairwise shingle-overlap matrix between corpus groups (sources,
    crawls, snapshots): for every group pair, distinct-shingle set
    sizes, intersection, Jaccard, and containment
    ``inter / min(n1, n2)`` — the corpus-curation diagnostic that says
    WHICH feeds duplicate each other before any doc-level dedup runs
    (high containment = one source is largely a subset of another; the
    standard signal for dropping a feed or ordering dedup passes).

    Scale shape: one distinct-aggregation on (group, shingle) — the
    explode is map-side and the distinct partial-aggregates before its
    exchange — then a self-equi-join on the shingle. A shingle shared
    by g groups expands to C(g, 2) pair rows, and g is bounded by the
    NUMBER OF GROUPS (tens), not corpus size, so the expansion is flat;
    per-group set sizes broadcast back onto the tiny pair table.
    Output is C(n_groups, 2) rows — driver-safe by construction.

    Output: (g1, g2, n1, n2, inter, jaccard, containment), g1 < g2.
    """
    # (group, shingle) distinct feeds THREE consumers (sizes + both join
    # sides); without materialization each recomputes the corpus-wide
    # tokenize+explode+distinct chain. The table is vocab-scale x
    # n_groups (Heaps-bounded), the same pin policy as the LM vocab
    # tables in textops.
    gs = (
        df.select(F.col(group_col).alias("g"), tokens(text_col).alias("t"))
        .select("g", shingles_of_tokens(F.col("t"), k).alias("sh"))
        .select("g", F.explode("sh").alias("s"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = gs.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    a, b = gs.alias("a"), gs.alias("b")
    inter = (
        a.join(
            b, (F.col("a.s") == F.col("b.s")) & (F.col("a.g") < F.col("b.g"))
        )
        .groupBy(F.col("a.g").alias("g1"), F.col("b.g").alias("g2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s1 = sizes.select(F.col("g").alias("g1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("g").alias("g2"), F.col("n").alias("n2"))
    denom_j = F.col("n1") + F.col("n2") - F.col("inter")
    return (
        inter.join(F.broadcast(s1), "g1")
        .join(F.broadcast(s2), "g2")
        .select(
            "g1",
            "g2",
            "n1",
            "n2",
            "inter",
            F.round(F.col("inter") / denom_j, 6).alias("jaccard"),
            F.round(
                F.col("inter") / F.least("n1", "n2"), 6
            ).alias("containment"),
        )
    )


def minhash_band_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """The persistable MinHash dedup index: per-doc signature columns
    plus exploded LSH band keys — (doc, band, bh, h0..h{n-1}). At 100 TB
    this table (a few hundred bytes per document, written PARTITIONED BY
    band) IS the dedup history; raw text and shingle sets are never
    stored or re-read by later ingests. Persist with
    :func:`save_minhash_index` / reload with :func:`load_minhash_index`
    so the (k, n_hashes, bands) signature family travels with the data
    and a mismatched caller fails loudly instead of silently finding
    zero band collisions."""
    if n_hashes % bands != 0:
        raise ValueError(
            f"n_hashes={n_hashes} not divisible by bands={bands} — "
            f"{n_hashes % bands} trailing hash columns would be "
            "silently excluded from every band key"
        )
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, k, n_hashes)
    structs = ", ".join(
        "struct({b} as band, xxhash64({cols}) as bh)".format(
            b=b,
            cols=", ".join(
                f"h{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    hs = [f"h{i}" for i in range(n_hashes)]
    return sig.selectExpr(
        "doc", f"explode(array({structs})) as bk", *hs
    ).selectExpr("doc", "bk.band as band", "bk.bh as bh", *hs)


def save_minhash_index(index: DataFrame, path: str, k: int, bands: int) -> None:
    """Persist a :func:`minhash_band_index` as parquet PARTITIONED BY
    band, alongside a one-row ``_meta`` table recording the signature
    family (k, n_hashes, bands). n_hashes is recoverable from the
    column count, but k and bands are not — a history built with
    different shingle width or banding than the querying caller would
    otherwise yield zero band collisions with no error."""
    n_hashes = len([c for c in index.columns if c.startswith("h")])
    index.write.mode("overwrite").partitionBy("band").parquet(f"{path}/index")
    index.sparkSession.createDataFrame(
        [(int(k), int(n_hashes), int(bands))],
        "k int, n_hashes int, bands int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_meta")


def load_minhash_index(
    spark, path: str, k: int = 3, n_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """Reload a persisted MinHash band index, validating the stored
    (k, n_hashes, bands) against the caller's expected signature family
    — the load-time mirror of incremental_minhash_dups' n_hashes guard."""
    meta = spark.read.parquet(f"{path}/_meta").collect()
    if len(meta) != 1:
        raise ValueError(f"corrupt minhash index at {path}: {len(meta)} meta rows")
    got = (meta[0]["k"], meta[0]["n_hashes"], meta[0]["bands"])
    want = (k, n_hashes, bands)
    if got != want:
        raise ValueError(
            f"minhash index at {path} was built with (k, n_hashes, bands)"
            f"={got}, caller expects {want} — refuse to mix signature "
            "families"
        )
    return spark.read.parquet(f"{path}/index")


def incremental_minhash_dups(
    history_index: DataFrame,
    new_docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.3,
) -> DataFrame:
    """Incremental near-dup against a SIGNATURE history — the
    production write-path shape (incremental_ngram_dups' scale
    upgrade): the history is :func:`minhash_band_index` output (a few
    hundred bytes/doc), never raw text, so each ingest batch touches
    O(|batch| * bands) index rows via equi-join on (band, bh) plus the
    matched candidates.

    Verification is SIGNATURE-estimated Jaccard — the fraction of
    agreeing minhash components, an unbiased estimator with std
    ~ sqrt(j(1-j)/n_hashes) (~0.08 at n=32 near the 0.3 threshold) —
    because exact verification would require the history's shingle
    sets, exactly the state this tier exists to avoid. Callers wanting
    exact confirmation re-read ONLY the flagged docs' text (a tiny
    targeted fetch, not a corpus scan).

    Output: one row per new doc — (id_col, best_match_id,
    est_jaccard, is_dup); best match = highest estimate, doc-id
    tiebreak, est 0 / match NULL when no band collides.
    """
    n_idx = len([c for c in history_index.columns if c.startswith("h")])
    if n_idx != n_hashes:
        raise ValueError(
            f"history index carries {n_idx} hashes, caller expects "
            f"{n_hashes} — refuse to mix signature families"
        )
    new_idx = minhash_band_index(
        new_docs, id_col, text_col, k, n_hashes, bands
    )
    hist = history_index.select(
        F.col("doc").alias("hdoc"),
        "band",
        "bh",
        *[F.col(f"h{i}").alias(f"g{i}") for i in range(n_hashes)],
    )
    # hdoc != doc: a batch doc whose id already exists in the history
    # (re-ingest / overlapping partitions) must not become its own best
    # match at est 1.0 — an unchanged doc is not a duplicate of itself.
    cand = (
        new_idx.join(hist, ["band", "bh"])
        .filter(F.col("hdoc") != F.col("doc"))
        .select(
            "doc",
            "hdoc",
            *[F.col(f"h{i}") for i in range(n_hashes)],
            *[F.col(f"g{i}") for i in range(n_hashes)],
        )
        .distinct()
    )
    matches = F.expr(
        " + ".join(
            f"cast(h{i} = g{i} as int)" for i in range(n_hashes)
        )
    )
    est = (matches / F.lit(float(n_hashes))).alias("est")
    best = (
        cand.select("doc", "hdoc", est)
        .groupBy("doc")
        .agg(
            F.max_by(
                F.struct(F.col("est"), F.col("hdoc")),
                F.struct(F.col("est"), (-F.col("hdoc")).alias("nh")),
            ).alias("__b")
        )
        .select(
            "doc",
            F.col("__b.hdoc").alias("best_match_id"),
            F.round("__b.est", 6).alias("est_jaccard"),
        )
    )
    ids = new_docs.select(F.col(id_col).cast("long").alias("doc"))
    return (
        ids.join(best, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            "best_match_id",
            F.coalesce("est_jaccard", F.lit(0.0)).alias("est_jaccard"),
            (
                F.coalesce("est_jaccard", F.lit(0.0)) >= F.lit(threshold)
            ).cast("int").alias("is_dup"),
        )
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
    max_shingle_frac: float | None = None,
) -> DataFrame:
    """Directed set-CONTAINMENT join: (src, dst) where
    |src ∩ dst| / |src| >= threshold over k-shingle sets — the
    asymmetric companion to the Jaccard tiers. Jaccard misses the
    quote/subset relationships that matter for training-data curation
    (a tweet embedded in a news article, a doc wholesale-included in a
    crawl aggregate, benchmark text quoted inside a longer page):
    J(A,B) ~ |A|/|B| is tiny when |B| >> |A| even at full containment,
    while C(A,B)=1. Same co-bucket machinery as ``_jaccard_verify``
    (one bucket agg, two-stage pair explode, one pair agg — the
    intersection is counted once per UNDIRECTED pair and projected to
    both directions afterward, pure arithmetic on the aggregated row).
    The fractional df guard (see ``ngram_jaccard_pairs``) bounds hot
    buckets identically; its oracle mirror drops the same shingles, so
    exactness-under-cap is hash-checkable.
    """
    aux, cap = _frac_cap(df, max_shingle_df, max_shingle_frac)
    sh = shingle_sets(df, id_col, text_col, k)
    bucket_ok = F.size("docs") > 1
    if cap is not None:
        bucket_ok = bucket_ok & (F.size("docs") <= cap)
    groups = (
        sh.withColumn("sh64", F.xxhash64("s"))
        .groupBy("sh64")
        .agg(F.sort_array(F.collect_list(F.struct("doc", "n"))).alias("docs"))
    )
    if aux is not None:
        groups = groups.join(F.broadcast(aux))
    groups = groups.filter(bucket_ok)
    e1 = groups.select("docs", F.posexplode("docs").alias("i", "x"))
    expanded = e1.select(
        F.col("x.doc").alias("d1"),
        F.col("x.n").alias("n1"),
        F.explode(
            F.slice("docs", F.col("i") + F.lit(2), F.size("docs"))
        ).alias("y"),
    )
    inter = expanded.groupBy(
        "d1", F.col("y.doc").alias("d2")
    ).agg(
        F.count("*").alias("inter"),
        F.first("n1").alias("n1"),
        F.first("y.n").alias("n2"),
    )
    # project the undirected intersection to its two directed readings;
    # explode of a 2-element struct array keeps this a pure map stage.
    directed = inter.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("d1").alias("src"),
                    F.col("d2").alias("dst"),
                    (F.col("inter") / F.col("n1")).alias("containment"),
                ),
                F.struct(
                    F.col("d2").alias("src"),
                    F.col("d1").alias("dst"),
                    (F.col("inter") / F.col("n2")).alias("containment"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst", F.round("e.containment", 6).alias("containment"))
    return directed.filter(F.col("containment") >= threshold)


def source_overlap_sketch(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 3,
    lg_k: int = 14,
) -> DataFrame:
    """Sketch form of :func:`source_overlap` — the 100 TB swap. The
    exact matrix materializes the (group, shingle) DISTINCT table
    (vocab x groups rows through one exchange, checkpointed for three
    consumers) and self-joins it; this one runs ONE aggregation whose
    state is a fixed ~2^lg_k-register HLL per group — repeats die in
    the sketch, so no distinct pass, no checkpoint, no shingle-keyed
    join, and the shuffle carries #groups sketches of ~16 KiB
    regardless of corpus size. Pairwise intersection comes from
    inclusion–exclusion over the merged pair sketch
    (|A∩B| = |A| + |B| − |A∪B|); the pair expansion is C(groups, 2)
    driver-safe rows. One deliberate semantic difference: the sketch
    reports EVERY pair (a disjoint pair gets inter≈0), while the exact
    form's inner shingle self-join omits pairs with no shared shingle
    — the full matrix is the more useful report when estimates are
    cheap.

    Error: each estimate carries HLL relative error ~1.04/sqrt(2^lg_k)
    (~0.8% at lg_k=14); inclusion–exclusion SUBTRACTS two near-equal
    numbers for low-overlap pairs, so intersection error is relative
    to the UNION size, not the intersection — the documented sketch
    caveat (use the exact form when Jaccard << sketch error; the test
    pins the error envelope vs the exact matrix on this corpus).

    Output: (g1, g2, n1, n2, inter, jaccard, containment) — same
    columns as the exact form; estimates are clamped non-negative.
    """
    gs = (
        df.select(F.col(group_col).alias("g"), tokens(text_col).alias("t"))
        .select("g", shingles_of_tokens(F.col("t"), k).alias("sh"))
        .select("g", F.explode("sh").alias("s"))
    )
    sk = gs.groupBy("g").agg(
        F.hll_sketch_agg("s", F.lit(lg_k)).alias("sketch")
    )
    a = sk.select(
        F.col("g").alias("g1"),
        F.col("sketch").alias("sk1"),
        F.hll_sketch_estimate("sketch").cast("long").alias("n1"),
    )
    b = sk.select(
        F.col("g").alias("g2"),
        F.col("sketch").alias("sk2"),
        F.hll_sketch_estimate("sketch").cast("long").alias("n2"),
    )
    pairs = a.join(F.broadcast(b), F.col("g1") < F.col("g2"))
    union_est = F.hll_sketch_estimate(
        F.hll_union("sk1", "sk2", True)
    ).cast("long")
    # clamp to [0, min(n1, n2)]: inclusion–exclusion noise on near-
    # subset pairs can push the raw estimate past the smaller set,
    # which would put containment > 1.0 — a value the exact form can
    # never produce
    inter = F.least(
        F.greatest(F.col("n1") + F.col("n2") - union_est, F.lit(0)),
        F.least("n1", "n2"),
    )
    denom_j = F.col("n1") + F.col("n2") - inter
    return pairs.select(
        "g1",
        "g2",
        "n1",
        "n2",
        inter.alias("inter"),
        F.round(inter / denom_j, 6).alias("jaccard"),
        F.round(inter / F.least("n1", "n2"), 6).alias("containment"),
    )
