"""Distributed suffix ranking — exact corpus-wide duplicated substrings.

The hash-based dup-span miner (operators/textops.py) finds repeated
spans by fingerprint; this module is its EXACT twin, built on the
classic prefix-doubling suffix-array construction (Manber-Myers,
public algorithm) expressed in DataFrame ops:

1. ``global_dense_rank`` — dense rank over ALL rows without a
   single-task global sort: range-repartition by the key columns
   (equal keys land in one partition by construction), per-partition
   dense ranks, then partition-offset correction from a
   #partitions-row table. The same two-level shape as
   ``sampling.two_level_row_number`` (round-10 whale-window fix),
   generalized to arbitrary sortable keys.
2. ``suffix_ranks`` — prefix doubling: rank by first character, then
   repeatedly re-rank by (rank[i], rank[i+k]) with k doubling. After
   the round that paired at offset k, equal ranks mean equal prefixes
   of length 2k. O(log L) rounds, each one equi-join (pos+k, trivially
   co-partitioned) + one global_dense_rank (a range-partitioned sort).
   No per-group windows anywhere — the rank assignment is whale-free.
3. ``duplicated_spans`` — positions whose suffix rank collides at the
   largest power-of-two prefix <= min_len form candidate groups
   (a SUPERSET of true repeats, since equal-prefix >= min_len implies
   equal-prefix >= 2^floor(log2 min_len)); each candidate's actual
   ``substring(pos, min_len)`` is then extracted and grouped — exact
   verification, no fingerprint collisions. Per-document sentinels
   keep spans from crossing document boundaries.

Scale posture: the char table is corpus-size (one row per byte — the
honest cost of exact suffix ordering; the hash-based miner remains the
cheap first pass and this the exact refiner for the spans it flags).
Every shuffle is range- or hash-balanced; lineage is cut per round
with localCheckpoint so the O(log L) loop doesn't stack plans.

Reference parity: the reference has no suffix machinery; this extends
the LLM-pipeline dedup tier (ExactSubstr semantics, Lee et al. 2022's
exact-substring goal) past the fingerprint approximation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_dense_rank(
    df: DataFrame,
    cols: list[str],
    out: str = "grank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense rank (1-based) over ALL rows ordered by ``cols`` — the
    whale-free form: range repartition (equal keys co-located), dense
    rank within each partition, plus a cumulative per-partition
    distinct-count offset (a <= #partitions-row table). The result is
    independent of the partition layout: boundaries never split equal
    keys, so local rank + offset IS the global dense rank."""
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n_parts, *[F.col(c) for c in cols])
    part = part.withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy(*cols)
    ranked = part.withColumn("__lr", F.dense_rank().over(w))
    per = ranked.groupBy("__pid").agg(F.max("__lr").alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = per.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    )
    return (
        ranked.join(F.broadcast(off), "__pid")
        .withColumn(out, (F.col("__lr") + F.col("__off")).cast("long"))
        .drop("__pid", "__lr", "__off")
    )


def corpus_char_table(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Documents -> (pos, code, doc_id, local) one row per character,
    with a unique NEGATIVE sentinel code appended per document so no
    suffix comparison ever crosses a document boundary. Global ``pos``
    comes from cumulative document offsets (a #docs-row table)."""
    lens = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        (F.length(text_col) + 1).alias("len1"),  # +1 sentinel
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    offs = lens.withColumn(
        "off", F.coalesce(F.sum("len1").over(w), F.lit(0))
    )
    chars = offs.select(
        "doc_id",
        "off",
        F.posexplode(
            F.concat(F.split(F.col("text"), ""), F.array(F.lit(None)))
        ).alias("local", "ch"),
    )
    return chars.select(
        (F.col("off") + F.col("local")).alias("pos"),
        F.when(
            F.col("ch").isNull(), -(F.col("doc_id") + 1)
        ).otherwise(F.ascii("ch")).cast("long").alias("code"),
        "doc_id",
        "local",
    )


def suffix_ranks(
    chars: DataFrame, until_prefix: int | None = None
) -> tuple[DataFrame, int]:
    """Prefix-doubling suffix ranking over a (pos, code) table.

    Returns ``(ranks, prefix_len)``: a (pos, grank) frame where equal
    grank means equal prefix of length >= ``prefix_len``; iteration
    stops when all ranks are distinct (the full suffix order) or when
    ``prefix_len >= until_prefix``."""
    total = chars.count()
    r = global_dense_rank(
        chars.select("pos", F.col("code").alias("__k1")), ["__k1"]
    ).select("pos", "grank")
    r = r.localCheckpoint()
    prefix = 1
    k = 1
    while True:
        n_ranks = r.agg(F.max("grank")).first()[0] or 0
        if n_ranks >= total:
            break
        if until_prefix is not None and prefix >= until_prefix:
            break
        shifted = r.select(
            (F.col("pos") - k).alias("pos"), F.col("grank").alias("__k2")
        )
        paired = (
            r.withColumnRenamed("grank", "__k1")
            .join(shifted, "pos", "left")
            .fillna({"__k2": 0})  # past-end suffixes sort first
        )
        r = global_dense_rank(paired, ["__k1", "__k2"]).select(
            "pos", "grank"
        )
        r = r.localCheckpoint()
        prefix = 2 * k
        k *= 2
    return r, prefix


def duplicated_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int,
    min_count: int = 2,
) -> DataFrame:
    """EXACT corpus-wide repeated substrings of length ``min_len``:
    every maximal group of positions whose ``min_len``-char substring
    occurs >= ``min_count`` times anywhere in the corpus.

    Candidates come from suffix-rank collisions at the largest
    power-of-two prefix <= min_len (a superset — no recall loss), then
    each candidate's literal substring is extracted and grouped: the
    verification is exact string equality, so unlike the hash-based
    miner there are NO fingerprint collisions. Returns
    (span, n_occurrences, n_docs) ordered by count desc."""
    if min_len < 2:
        raise ValueError("min_len must be >= 2")
    chars = corpus_char_table(docs, id_col, text_col)
    level = 1
    while level * 2 <= min_len:
        level *= 2
    ranks, got = suffix_ranks(chars, until_prefix=level)
    pos_rank = chars.join(ranks, "pos")
    # candidate groups: rank shared by >= min_count positions
    grp = pos_rank.groupBy("grank").agg(F.count("*").alias("__n"))
    cands = (
        pos_rank.join(
            grp.filter(F.col("__n") >= min_count).select("grank"), "grank"
        )
        .filter(F.col("code") >= 0)  # sentinels never start a span
        .select("doc_id", "local")
    )
    texts = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")
    )
    spans = (
        cands.join(texts, "doc_id")
        .select(
            "doc_id",
            F.substring(
                F.col("__text"), F.col("local") + 1, min_len
            ).alias("span"),
        )
        .filter(F.length("span") == min_len)  # span fits in its doc
    )
    return (
        spans.groupBy("span")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= min_count)
        .orderBy(F.desc("n_occurrences"), F.asc("span"))
    )
