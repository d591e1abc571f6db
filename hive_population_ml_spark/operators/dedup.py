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
  have small Hamming distance. Candidate pairs via 16-bit chunk
  equality (pigeonhole: hamming<=3 => >=1 of 4 chunks equal), verified
  with bit_count(xor)<=threshold. All bit math is JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import shingles


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
    """(id, shingle) exploded distinct-shingle table."""
    return (
        df.select(F.col(id_col).alias("doc"), shingles(text_col, k).alias("sh"))
        .select("doc", F.explode("sh").alias("s"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact all-pairs Jaccard over k-shingle sets, thresholded.

    ``max_shingle_df`` drops shingles appearing in more than that many
    docs before the self-join — the skew guard that keeps the join from
    quadratic blowup on boilerplate at scale.
    """
    sh = shingle_sets(df, id_col, text_col, k)
    if max_shingle_df is not None:
        rare = (
            sh.groupBy("s").agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("s")
        )
        sh = sh.join(rare, "s", "left_semi")
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("d1"), F.col("b.doc").alias("d2"))
        .agg(F.count("*").alias("inter"))
    )
    s1 = sizes.select(F.col("doc").alias("d1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("doc").alias("d2"), F.col("n").alias("n2"))
    jac = F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter"))
    return (
        inter.join(s1, "d1")
        .join(s2, "d2")
        .select("d1", "d2", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, n_hashes: int = 32
) -> DataFrame:
    """Per-doc MinHash signature: one pass, ``n_hashes`` min-aggregates.

    Hash family: xxhash64(shingle, salt_i) — deterministic, JVM-side,
    no Python. Returns (doc, h0..h{n-1}).
    """
    sh = shingle_sets(df, id_col, text_col, k)
    aggs = [
        F.min(F.xxhash64(F.col("s"), F.lit(i))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
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
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("bh"),
        )
        for b in range(bands)
    ]
    banded = sig.select("doc", F.explode(F.array(*band_cols)).alias("bk")).select(
        "doc", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("d1"), F.col("b.doc").alias("d2"))
        .distinct()
    )
    # Exact verification only on candidates: semi-join the shingle table
    # down to candidate docs, then intersection/union as in the exact op.
    sh = shingle_sets(df, id_col, text_col, k)
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n"))
    sh1 = sh.select(F.col("doc").alias("d1"), F.col("s").alias("s1"))
    sh2 = sh.select(F.col("doc").alias("d2"), F.col("s").alias("s2"))
    inter = (
        cand.join(sh1, "d1")
        .join(sh2, "d2")
        .filter(F.col("s1") == F.col("s2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("inter"))
    )
    s1 = sizes.select(F.col("doc").alias("d1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("doc").alias("d2"), F.col("n").alias("n2"))
    jac = F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter"))
    return (
        inter.join(s1, "d1")
        .join(s2, "d2")
        .select("d1", "d2", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per doc: sign-sum of token-hash bits.

    64 conditional-sum aggregates in ONE pass (partial aggregation
    map-side); fingerprint assembled with shifts — no UDF.
    """
    from .textops import tokens

    tok = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("t")
    ).withColumn("h", F.xxhash64("t"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    sums = tok.groupBy("doc").agg(*bit_sums)
    fp = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return sums.select("doc", fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance.

    Candidates via 16-bit chunk equality (pigeonhole over 4 chunks
    guarantees recall for hamming<=3), verified with bit_count(xor).
    """
    fp = simhash(df, id_col, text_col)
    chunks = fp.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * c)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select("doc", "simhash", F.col("ck.c").alias("c"), F.col("ck.chunk").alias("chunk"))
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.c") == F.col("b.c"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("d1"),
            F.col("b.doc").alias("d2"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
                "hamming"
            ),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
