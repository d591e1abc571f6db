"""Deduplication queries over ``documents`` — SURVEY.md §2.10.

The testdata corpus has no exact duplicates, so the exact-dedup query
first synthesizes a deterministic "re-crawl" (every 10th doc re-ingested
under a shifted id) — the dedup then has real work to do and the oracle
check is non-vacuous. Near-dup queries run on the corpus as-is (it
contains genuine near-duplicate pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import Tables
from ..operators.dedup import (
    containment_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    prefix_jaccard_pairs,
    simhash_pairs,
)
from .registry import register


def _recrawl(docs: DataFrame) -> DataFrame:
    dup = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    return docs.unionByName(dup)


@register(
    "dedup_exact",
    oracle="""
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
)
SELECT md5(text) AS content_hash,
       min(doc_id) AS canonical_id,
       count(*) AS n_copies
FROM corpus
GROUP BY md5(text)
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return exact_dedup(_recrawl(t.documents), "doc_id", "text")


@register(
    "dedup_ngram_jaccard",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(range(len(t) - 2),
               i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS s
    FROM toks
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
rare AS (
    SELECT s FROM sh GROUP BY s
    HAVING count(*) <= ceil(0.1 * (SELECT count(*) FROM documents))
),
shr AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare ON sh.s = rare.s),
inter AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
    FROM shr a JOIN shr b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT d1, d2,
       round(inter * 1.0 / (s1.n + s2.n - inter), 6) AS jaccard
FROM inter
JOIN sizes s1 ON inter.d1 = s1.doc_id
JOIN sizes s2 ON inter.d2 = s2.doc_id
WHERE round(inter * 1.0 / (s1.n + s2.n - inter), 6) >= 0.3
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup with the FRACTIONAL boilerplate-
    shingle skew guard active (``max_shingle_frac=0.1``): shingles
    appearing in more than 10% of docs are dropped before pair
    expansion. The effective cap is ``ceil(0.1 * n_docs)`` — 50 at
    sf0.01, identical results to the old absolute ``max_shingle_df=50``
    there, but the cap GROWS with the corpus: the builder's own 10x
    probe showed the absolute form collapses recall to zero as document
    frequencies scale up (pinned by
    ``test_ngram_guard_fraction_survives_corpus_growth``). The oracle
    CTE mirrors the derivation (``HAVING count(*) <= ceil(0.1 *
    (SELECT count(*) FROM documents))``), so the driver hash-checks the
    fraction form itself. Set sizes stay full-set (guard only restricts
    the intersection), and the threshold compares the ROUNDED jaccard on
    both engines so borderline pairs cannot diverge."""
    t = Tables(spark, sf_dir)
    return ngram_jaccard_pairs(
        t.documents, "doc_id", "text", k=3, threshold=0.3, max_shingle_frac=0.1
    )


@register("dedup_minhash_lsh")  # rows-only: approximate op, recall checked in tests
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return minhash_lsh_pairs(
        t.documents, "doc_id", "text", k=3, n_hashes=32, bands=8, threshold=0.3
    )


@register("dedup_simhash")  # rows-only: hash-family dependent, properties in tests
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard d=3 config (Manku et al.: 6 blocks, 20 tables, ~33-bit
    keys). The previous d=6 registration rode the 4x16-bit chunk scheme,
    which both LOST recall above d=3 and grew candidates quadratically
    in corpus size (13.5x wall-clock at 10x data on the scale probe)."""
    t = Tables(spark, sf_dir)
    return simhash_pairs(t.documents, "doc_id", "text", max_hamming=3)


@register("dedup_canonical_simhash")  # rows-only: approximate op composition
def dedup_canonical_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-first near-dup (the documented at-scale practice):
    exact-collapse duplicate clusters, then SimHash near-dup over
    distinct contents only; returns canonical pairs with the exact-group
    sizes attached so consumers can expand on demand. Worst-case probe in
    PERFORMANCE.md: 10x duplicate clusters -> 511 canonical pairs in
    6.1s vs 277,500 raw pairs."""
    from ..operators.dedup import canonical_near_dup_pairs

    t = Tables(spark, sf_dir)
    groups, pairs = canonical_near_dup_pairs(
        t.documents, "doc_id", "text", method="simhash", max_hamming=3
    )
    g1 = groups.select(
        F.col("canonical_id").alias("d1"), F.col("n_copies").alias("n_copies_1")
    )
    g2 = groups.select(
        F.col("canonical_id").alias("d2"), F.col("n_copies").alias("n_copies_2")
    )
    return pairs.join(g1, "d1").join(g2, "d2")


@register("dedup_cluster_components")  # rows-only: clusters over approximate
# pairs; labeling checked exact vs a python union-find in
# tests/test_operators.py (crafted graphs + these very sf pairs)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs -> clusters: the transitive-closure step that turns near-dup
    PAIRS into duplicate CLUSTERS with one canonical keeper each (A~B,
    B~C collapses {A,B,C} even though (A,C) was never emitted).
    Alternating large-star/small-star connected components
    (operators/components.py) over the MinHash-LSH pair graph, then a
    full-corpus assignment: every doc labeled (cluster_id, is_canonical);
    filter(is_canonical = 1) IS the deduplicated corpus."""
    from ..operators.components import dedup_cluster_assignment

    t = Tables(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        t.documents, "doc_id", "text", k=3, n_hashes=32, bands=8, threshold=0.3
    )
    return dedup_cluster_assignment(
        t.documents, pairs, id_col="doc_id", src="d1", dst="d2"
    )


@register(
    "dedup_cluster_ngram",
    oracle="""
WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(range(len(t) - 2),
               i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS s
    FROM toks
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
rare AS (
    SELECT s FROM sh GROUP BY s
    HAVING count(*) <= ceil(0.1 * (SELECT count(*) FROM documents))
),
shr AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare ON sh.s = rare.s),
inter AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
    FROM shr a JOIN shr b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
pairs AS (
    SELECT d1, d2
    FROM inter
    JOIN sizes s1 ON inter.d1 = s1.doc_id
    JOIN sizes s2 ON inter.d2 = s2.doc_id
    WHERE round(inter * 1.0 / (s1.n + s2.n - inter), 6) >= 0.3
),
verts AS (SELECT d1 AS id FROM pairs UNION SELECT d2 FROM pairs),
edges AS (SELECT d1 AS u, d2 AS v FROM pairs
          UNION SELECT d2 AS u, d1 AS v FROM pairs),
walk(id, lbl) AS (
    SELECT id, id FROM verts
    UNION
    SELECT e.v AS id, w.lbl FROM walk w JOIN edges e ON e.u = w.id
),
comp AS (SELECT id, min(lbl) AS component FROM walk GROUP BY id)
SELECT d.doc_id,
       coalesce(c.component, d.doc_id) AS cluster_id,
       CAST(coalesce(c.component, d.doc_id) = d.doc_id AS INT) AS is_canonical
FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
""",
)
def dedup_cluster_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure with a FULL differential oracle: the same
    alternating large-star/small-star connected components as
    ``dedup_cluster_components``, but over the EXACT n-gram-Jaccard
    pair graph (SQL-expressible, unlike the seeded MinHash graph), so
    DuckDB can recompute the whole query — pairs via the shared shingle
    CTEs, closure via a recursive min-label-propagation CTE. This is
    the strongest check the cluster operator has: every (doc, cluster,
    canonical) row hash-compared, not just union-find parity on the
    labeling step."""
    from ..operators.components import dedup_cluster_assignment

    t = Tables(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        t.documents, "doc_id", "text", k=3, threshold=0.3, max_shingle_frac=0.1
    )
    return dedup_cluster_assignment(
        t.documents, pairs, id_col="doc_id", src="d1", dst="d2"
    )


@register(
    "dedup_incremental_ngram",
    shadow_oracle="""
WITH hist AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
newb AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
ht AS (SELECT doc_id, string_split(text, ' ') AS t FROM hist),
nt AS (SELECT doc_id, string_split(text, ' ') AS t FROM newb),
hs AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(t) - 2),
        i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS s FROM ht),
ns AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(t) - 2),
        i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS s FROM nt),
hsize AS (SELECT doc_id, count(*) AS n FROM hs GROUP BY doc_id),
nsize AS (SELECT doc_id, count(*) AS n FROM ns GROUP BY doc_id),
inter AS (
    SELECT ns.doc_id AS nd, hs.doc_id AS hd, count(*) AS i
    FROM ns JOIN hs ON ns.s = hs.s GROUP BY 1, 2
),
best AS (
    SELECT nd, max(round(i * 1.0 / (nsize.n + hsize.n - i), 6)) AS best_j
    FROM inter
    JOIN nsize ON inter.nd = nsize.doc_id
    JOIN hsize ON inter.hd = hsize.doc_id
    GROUP BY nd
)
SELECT newb.doc_id,
       round(coalesce(best_j, 0), 6) AS best_jaccard,
       CAST(coalesce(best_j, 0) >= 0.3 AS INT) AS is_dup
FROM newb LEFT JOIN best ON newb.doc_id = best.nd
""",
)
def dedup_incremental_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup (operators/dedup.py::incremental_ngram_dups):
    docs with doc_id % 5 == 0 stand in as the day's new batch, the
    rest as the historical corpus; each new doc gets its best Jaccard
    against ANY historical doc. The production at-scale composition
    (persisted historical shingle table + Bloom prefilter) is in the
    operator docstring."""
    from ..operators.dedup import incremental_ngram_dups

    t = Tables(spark, sf_dir)
    hist = t.documents.filter(F.col("doc_id") % 5 != 0)
    newb = t.documents.filter(F.col("doc_id") % 5 == 0)
    return incremental_ngram_dups(newb, hist, "doc_id", "text", k=3)


@register(
    "dedup_cluster_embedding",
    shadow_oracle="""
WITH RECURSIVE e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
pairs AS (
    SELECT a.vec_id AS d1, b.vec_id AS d2
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round(list_inner_product(a.v, b.v)
                / NULLIF(sqrt(list_inner_product(a.v, a.v))
                         * sqrt(list_inner_product(b.v, b.v)), 0), 9) >= 0.35
),
verts AS (SELECT d1 AS id FROM pairs UNION SELECT d2 FROM pairs),
edges AS (SELECT d1 AS u, d2 AS v FROM pairs
          UNION SELECT d2 AS u, d1 AS v FROM pairs),
walk(id, lbl) AS (
    SELECT id, id FROM verts
    UNION
    SELECT e.v AS id, w.lbl FROM walk w JOIN edges e ON e.u = w.id
),
comp AS (SELECT id, min(lbl) AS component FROM walk GROUP BY id)
SELECT emb.vec_id,
       coalesce(c.component, emb.vec_id) AS cluster_id,
       CAST(coalesce(c.component, emb.vec_id) = emb.vec_id AS INT) AS is_canonical
FROM embeddings emb LEFT JOIN comp c ON c.id = emb.vec_id
""",
)
def dedup_cluster_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure over the EXACT embedding-cosine pair graph —
    the second full recursive-CTE differential on the distributed CC
    operator, over a different (GEMM-scored) pair generator than the
    n-gram variant. dedup_semantic is this query's sub-quadratic
    production form (cells bound the pair search); the exact graph here
    is what makes DuckDB able to recompute every (vec, cluster,
    canonical) row."""
    from ..operators.components import dedup_cluster_assignment
    from ..operators.similarity import cosine_dup_pairs_blocked

    t = Tables(spark, sf_dir)
    pairs = cosine_dup_pairs_blocked(
        t.embeddings, id_col="vec_id", vec_col="embedding", threshold=0.35
    )
    return dedup_cluster_assignment(
        t.embeddings, pairs, id_col="vec_id", src="id1", dst="id2"
    )


@register("graph_pagerank")
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the symmetrized n-gram dup-pair graph of the
    documents table — graph-based corpus quality weighting (rank by the
    duplicate/link structure, weight or prune the corpus). rows-only:
    per-iteration aggregation makes the fixpoint non-SQL-expressible;
    the operator is pinned value-exact (<1e-9) against a pure-python
    power iteration on crafted graphs AND these same sf pairs
    (tests/test_operators.py::test_pagerank_*). Ranks round to 6 for
    display; isolated docs (no dup edges) are excluded by construction."""
    from ..operators.pagerank import pagerank

    t = Tables(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        t.documents, "doc_id", "text", k=3, threshold=0.3, max_shingle_frac=0.1
    )
    edges = pairs.select(
        F.col("d1").alias("u"), F.col("d2").alias("v")
    ).unionByName(pairs.select(F.col("d2").alias("u"), F.col("d1").alias("v")))
    pr = pagerank(edges, max_iter=8, tol=1e-7)
    return pr.select(
        F.col("node").alias("doc_id"), F.round("rank", 6).alias("rank")
    )


@register(
    "dedup_levenshtein",
    oracle="""
WITH keyed AS (
    SELECT doc_id AS id,
           lower(substr(text, 1, 40)) AS k,
           substr(lower(substr(text, 1, 40)), 1, 6) AS b
    FROM documents
), counted AS (
    SELECT *, count(*) OVER (PARTITION BY b) AS bc FROM keyed
), flt AS (
    SELECT id, k, b FROM counted
    WHERE bc <= ceil(0.1 * (SELECT count(*) FROM documents))
)
SELECT a.id AS d1, b.id AS d2, levenshtein(a.k, b.k) AS dist
FROM flt a JOIN flt b ON a.b = b.b AND a.id < b.id
WHERE levenshtein(a.k, b.k) <= 5
""",
)
def dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance near-dup pairs over the lowercased 40-char
    document head (record-linkage tier). Spark `levenshtein` and DuckDB
    `levenshtein` implement the same unit-cost edit distance, so the
    whole blocked pipeline is differential — blocking INCLUDED.
    ``max_block_frac=0.1`` activates the fractional hot-block guard so
    the Spark side matches the oracle's ``bc <= ceil(0.1*n)`` filter
    exactly (with the default ``None`` the guard was oracle-only — a
    latent divergence on any corpus with a >10% shared prefix)."""
    from ..operators.dedup import levenshtein_pairs

    t = Tables(spark, sf_dir)
    return levenshtein_pairs(t.documents, "doc_id", "text", max_block_frac=0.1)


@register(
    "dedup_levenshtein_multipass",
    oracle="""
WITH keyed AS (
    SELECT doc_id AS id,
           lower(substr(text, 1, 40)) AS k
    FROM documents
), passes AS (
    -- Keys are NAMESPACED per pass ('P:'/'S:'/'L:') because the Spark
    -- operator joins each blocking pass only with itself; an untagged
    -- union would admit cross-pass collisions (one doc's prefix block
    -- equal to another doc's suffix block) the operator can never
    -- produce (ADVICE r6 high — counterexample pinned in
    -- tests/test_operators.py::test_levenshtein_multipass_oracle_no_cross_pass).
    SELECT id, k, 'P:' || substr(k, 1, 6) AS b FROM keyed
    UNION ALL
    SELECT id, k, 'S:' || substr(k, -6, 6) AS b FROM keyed
    UNION ALL
    SELECT id, k,
           'L:' || concat(CAST(floor(length(k) / 8) AS VARCHAR), '#',
                          substr(k, 1, 2))
               AS b
    FROM keyed
), counted AS (
    -- absolute block-size cap (max_block_rows=1000), mirrored from the
    -- Spark guard: the length-band key is constant-cardinality, so its
    -- blocks grow linearly with the corpus (round-7 100x probe: 1047x
    -- wall-clock uncapped). Per-pass because keys are namespaced.
    SELECT *, count(*) OVER (PARTITION BY b) AS bc FROM passes
), flt AS (
    SELECT id, k, b FROM counted WHERE bc <= 1000
)
SELECT DISTINCT a.id AS d1, b.id AS d2, levenshtein(a.k, b.k) AS dist
FROM flt a JOIN flt b ON a.b = b.b AND a.id < b.id
WHERE levenshtein(a.k, b.k) <= 5
""",
)
def dedup_levenshtein_multipass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass blocked edit distance (VERDICT r5 #6): prefix +
    suffix + length-band blockings unioned, deduped on the pair —
    recall strictly dominates the single prefix pass (measured vs
    brute force in the honesty test) at ~3x the join cost. Every pass
    is mirrored in the DuckDB oracle, so blocking AND verify stay
    fully differential. ``max_block_rows=1000`` is the absolute
    block-size cap the round-7 100x probe forced (the length-band key
    is constant-cardinality — uncapped it went 1047x wall-clock at
    100x data; capped, the probe measures ~linear); it never binds at
    driver scale (largest sf0.01 block ≪ 1000), so correctness rows
    are unchanged, and the oracle mirrors the cap."""
    from ..operators.dedup import levenshtein_pairs_multipass

    t = Tables(spark, sf_dir)
    return levenshtein_pairs_multipass(
        t.documents, "doc_id", "text", max_block_rows=1000
    )


@register(
    "dedup_source_overlap",
    oracle="""
WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
gs AS (
    SELECT DISTINCT g, s FROM (
        SELECT source AS g,
               unnest(list_transform(range(len(t) - 2),
                   i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS s
        FROM toks
    )
),
sizes AS (SELECT g, count(*) AS n FROM gs GROUP BY g),
inter AS (
    SELECT a.g AS g1, b.g AS g2, count(*) AS inter
    FROM gs a JOIN gs b ON a.s = b.s AND a.g < b.g
    GROUP BY 1, 2
)
SELECT g1, g2, s1.n AS n1, s2.n AS n2, inter,
       round(inter * 1.0 / (s1.n + s2.n - inter), 6) AS jaccard,
       round(inter * 1.0 / least(s1.n, s2.n), 6) AS containment
FROM inter
JOIN sizes s1 ON inter.g1 = s1.g
JOIN sizes s2 ON inter.g2 = s2.g
""",
)
def dedup_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level shingle-overlap matrix (round-7 addition): which
    feeds duplicate each other, BEFORE any doc-level dedup — per source
    pair: distinct-shingle sizes, intersection, Jaccard, containment.
    The corpus-curation step that decides dedup-pass ordering and feed
    drops. Fully differential: the oracle mirrors the shared shingle
    CTE (same k=3 token shingles as dedup_ngram_jaccard's green
    oracle)."""
    from ..operators.dedup import source_overlap

    t = Tables(spark, sf_dir)
    return source_overlap(t.documents, group_col="source", text_col="text")


@register(
    "split_cluster_safe",
    oracle="""
WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(range(len(t) - 2),
               i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS s
    FROM toks
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
rare AS (
    SELECT s FROM sh GROUP BY s
    HAVING count(*) <= ceil(0.1 * (SELECT count(*) FROM documents))
),
shr AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare ON sh.s = rare.s),
inter AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
    FROM shr a JOIN shr b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
pairs AS (
    SELECT d1, d2
    FROM inter
    JOIN sizes s1 ON inter.d1 = s1.doc_id
    JOIN sizes s2 ON inter.d2 = s2.doc_id
    WHERE round(inter * 1.0 / (s1.n + s2.n - inter), 6) >= 0.3
),
verts AS (SELECT d1 AS id FROM pairs UNION SELECT d2 FROM pairs),
edges AS (SELECT d1 AS u, d2 AS v FROM pairs
          UNION SELECT d2 AS u, d1 AS v FROM pairs),
walk(id, lbl) AS (
    SELECT id, id FROM verts
    UNION
    SELECT e.v AS id, w.lbl FROM walk w JOIN edges e ON e.u = w.id
),
comp AS (SELECT id, min(lbl) AS component FROM walk GROUP BY id),
assign AS (
    SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
)
SELECT doc_id, cluster_id,
       CASE WHEN (((((abs(cluster_id) + 999983) % 2147483647)
                     * 48271 % 2147483647) * 48271) % 2147483647)
                 / 2147483647.0 < 0.8
            THEN 'train' ELSE 'holdout' END AS split
FROM assign
""",
)
def split_cluster_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware leakage-safe corpus split (round-7 addition):
    documents split train/holdout by DUPLICATE CLUSTER (transitive
    closure over the exact n-gram-Jaccard pair graph), so no near-dup
    pair — even transitively connected — straddles the split. Fully
    differential end to end: pair CTEs shared with dedup_cluster_ngram's
    green oracle, closure via the recursive min-label CTE, and the
    portable minstd hash split mirrored exactly (sample_stratified's
    oracle contract)."""
    from ..operators.dedup import ngram_jaccard_pairs
    from ..ml.splits import cluster_safe_split

    t = Tables(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        t.documents, "doc_id", "text", k=3, threshold=0.3, max_shingle_frac=0.1
    )
    return cluster_safe_split(
        t.documents, pairs, id_col="doc_id", train_frac=0.8, mode="minstd"
    )


@register(
    "dedup_paragraph_exact",
    shadow_oracle="""
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
), starts AS (
    SELECT doc_id, text,
           unnest(range(1, greatest(length(text), 1) + 1, 120)) AS start
    FROM corpus
), chunks AS (
    SELECT doc_id, substr(text, start, 120) AS chunk_text FROM starts
)
SELECT md5(chunk_text) AS chunk_hash,
       min(length(chunk_text)) AS chunk_chars,
       count(*) AS n_occurrences,
       count(DISTINCT doc_id) AS n_docs,
       min(doc_id) AS canonical_doc
FROM chunks
GROUP BY md5(chunk_text)
HAVING count(*) >= 2
""",
)
def dedup_paragraph_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granularity exact dedup (round-7 addition): documents
    cut into NON-overlapping 120-char windows (the no-newline corpus's
    paragraph stand-in; chunk_documents with overlap=0), each window
    hashed, windows occurring 2+ times reported with occurrence/doc
    counts and a canonical owner — the exact-substring-dedup signal of
    Lee et al. 2022 at chunk granularity (text_dup_spans is the
    token-span miner; this is the removal-unit view). The deterministic
    re-crawl makes it non-vacuous (same device as dedup_exact). Scale
    shape: map-side posexplode + ONE hash-grouped aggregation —
    partial-aggregated, shuffle carries (hash, partial counts) only."""
    from ..operators import textops

    t = Tables(spark, sf_dir)
    corpus = _recrawl(t.documents)
    ch = textops.chunk_documents(corpus, size=120, overlap=0, by="chars")
    return (
        ch.groupBy(F.md5("chunk_text").alias("chunk_hash"))
        .agg(
            F.min("chunk_chars").alias("chunk_chars"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .filter(F.col("n_occurrences") >= 2)
    )


@register("dedup_incremental_minhash")  # rows-only: seeded-hash
# signatures have no DuckDB twin; agreement with the exact
# incremental-ngram labels + estimator semantics pinned in
# tests/test_operators.py
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup against a SIGNATURE history (round-7
    addition; the scale upgrade of dedup_incremental_ngram): history =
    the minhash_band_index of docs with doc_id % 5 != 0 (a few hundred
    bytes/doc — at 100 TB this index IS the stored dedup state; raw
    text is never re-read), batch = the remaining docs. Verification is
    signature-estimated Jaccard (unbiased, std ~ sqrt(j(1-j)/32));
    exact confirmation re-reads only flagged docs."""
    from ..operators.dedup import incremental_minhash_dups, minhash_band_index

    t = Tables(spark, sf_dir)
    hist = minhash_band_index(
        t.documents.filter(F.col("doc_id") % 5 != 0), "doc_id", "text"
    )
    newb = t.documents.filter(F.col("doc_id") % 5 == 0)
    return incremental_minhash_dups(hist, newb, "doc_id", "text")


@register(
    "dedup_cluster_keeper_quality",
    shadow_oracle="""
WITH RECURSIVE toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(range(len(t) - 2),
               i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS s
    FROM toks
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
rare AS (
    SELECT s FROM sh GROUP BY s
    HAVING count(*) <= ceil(0.1 * (SELECT count(*) FROM documents))
),
shr AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare ON sh.s = rare.s),
inter AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
    FROM shr a JOIN shr b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
pairs AS (
    SELECT d1, d2
    FROM inter
    JOIN sizes s1 ON inter.d1 = s1.doc_id
    JOIN sizes s2 ON inter.d2 = s2.doc_id
    WHERE round(inter * 1.0 / (s1.n + s2.n - inter), 6) >= 0.3
),
verts AS (SELECT d1 AS id FROM pairs UNION SELECT d2 FROM pairs),
edges AS (SELECT d1 AS u, d2 AS v FROM pairs
          UNION SELECT d2 AS u, d1 AS v FROM pairs),
walk(id, lbl) AS (
    SELECT id, id FROM verts
    UNION
    SELECT e.v AS id, w.lbl FROM walk w JOIN edges e ON e.u = w.id
),
comp AS (SELECT id, min(lbl) AS component FROM walk GROUP BY id),
lab AS (
    SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
),
q AS (
    SELECT doc_id,
           round(least(len(t) / 50.0, 1.0)
                 * (1.0 - least((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                                * 1.0 / NULLIF(length(text), 0) * 5.0, 1.0)), 6) AS quality
    FROM toks
),
ranked AS (
    SELECT l.doc_id, l.cluster_id, q.quality,
           row_number() OVER (PARTITION BY l.cluster_id
                              ORDER BY q.quality DESC, l.doc_id ASC) AS rn
    FROM lab l JOIN q USING (doc_id)
)
SELECT doc_id, cluster_id, quality, CAST(rn = 1 AS INT) AS is_kept
FROM ranked
""",
)
def dedup_cluster_keeper_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked dedup keeper (round-8 addition): the production
    policy — per near-dup cluster keep the HIGHEST-quality member
    (heuristic quality score; ties -> min doc id), not the arbitrary
    min-id canonical (the FineWeb/RefinedWeb recipe: dedup should
    discard the worse copy, e.g. the one truncated or boilerplate-
    padded). Same exact n-gram-Jaccard pair graph and alternating-star
    closure as dedup_cluster_ngram — fully differential incl. the
    recursive-CTE closure, the quality formula, and the keeper rank.
    Scale shape: closure as audited; keeper_by_score adds exactly ONE
    cluster-keyed window-max exchange (see its docstring)."""
    from ..operators.components import dedup_cluster_assignment, keeper_by_score
    from ..operators.textops import quality_score

    t = Tables(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        t.documents, "doc_id", "text", k=3, threshold=0.3, max_shingle_frac=0.1
    )
    assign = dedup_cluster_assignment(
        t.documents, pairs, id_col="doc_id", src="d1", dst="d2"
    )
    q = t.documents.select("doc_id", quality_score("text").alias("quality"))
    return keeper_by_score(assign, q, "doc_id", "quality")


@register(
    "dedup_jaccard_prefix",
    shadow_oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(range(len(t) - 2),
               i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS s
    FROM toks
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT d1, d2,
       round(inter * 1.0 / (s1.n + s2.n - inter), 6) AS jaccard
FROM inter
JOIN sizes s1 ON inter.d1 = s1.doc_id
JOIN sizes s2 ON inter.d2 = s2.doc_id
WHERE round(inter * 1.0 / (s1.n + s2.n - inter), 6) >= 0.3
""",
)
def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered EXACT Jaccard join (AllPairs/PPJoin): identical
    result set to a full brute-force thresholded Jaccard — the oracle
    is the UNCAPPED all-pairs SQL, no df-cap mirror needed, because
    prefix filtering is lossless by construction. Candidates co-bucket
    only on each doc's p = n - ceil(t*n) + 1 globally-rarest shingles;
    verification touches candidate pairs only. The exactness
    alternative to banding (recall<1) and df-capping (drops
    boilerplate-heavy true pairs) when the dedup report must be
    complete — e.g. the legal/compliance pass, or building ground
    truth to measure the approximate tiers' recall against."""
    t = Tables(spark, sf_dir)
    return prefix_jaccard_pairs(
        t.documents, "doc_id", "text", k=3, threshold=0.3
    )


@register(
    "dedup_containment",
    shadow_oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(range(len(t) - 2),
               i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS s
    FROM toks
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
rare AS (
    SELECT s FROM sh GROUP BY s
    HAVING count(*) <= ceil(0.1 * (SELECT count(*) FROM documents))
),
shr AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare ON sh.s = rare.s),
inter AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
    FROM shr a JOIN shr b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
directed AS (
    SELECT inter.d1 AS src, inter.d2 AS dst,
           round(inter * 1.0 / s1.n, 6) AS containment
    FROM inter JOIN sizes s1 ON inter.d1 = s1.doc_id
    UNION ALL
    SELECT inter.d2 AS src, inter.d1 AS dst,
           round(inter * 1.0 / s2.n, 6) AS containment
    FROM inter JOIN sizes s2 ON inter.d2 = s2.doc_id
)
SELECT src, dst, containment FROM directed WHERE containment >= 0.5
""",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed shingle-set CONTAINMENT join (|src∩dst|/|src| >= 0.5):
    the asymmetric near-dup relation Jaccard structurally misses — a
    short doc quoted wholesale inside a much longer one scores
    J ~ |A|/|B| (arbitrarily small) but C(A,B) = 1. The curation uses
    are one-directional by nature: drop the contained copy, keep the
    container; flag benchmark text quoted inside crawl pages. Same
    fractional df guard and oracle mirror as `dedup_ngram_jaccard`;
    the intersection is counted once per undirected pair and projected
    to both directions as pure arithmetic (an explode of a 2-struct
    array — no second pair shuffle)."""
    t = Tables(spark, sf_dir)
    return containment_pairs(
        t.documents, "doc_id", "text", k=3, threshold=0.5, max_shingle_frac=0.1
    )


@register("dedup_source_overlap_hll")  # rows-only: HLL estimates are
# seeded-sketch values with no DuckDB twin; the error envelope vs the
# exact matrix is pinned in tests/test_scale_toolkit.py
def dedup_source_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch form of dedup_source_overlap (round-8 addition; the
    100 TB swap): per-source HLL sketches replace the (group, shingle)
    DISTINCT table — ONE aggregation with ~16 KiB fixed state per
    source, no distinct pass, no checkpoint, no shingle-keyed self-join
    — and pairwise intersections come from inclusion–exclusion over
    merged pair sketches. Same output columns as the exact form;
    intersection error is relative to the UNION size (the documented
    sketch caveat for low-overlap pairs)."""
    from ..operators.dedup import source_overlap_sketch

    t = Tables(spark, sf_dir)
    return source_overlap_sketch(
        t.documents, group_col="source", text_col="text"
    )


@register(
    "dedup_cluster_sizes",
    shadow_oracle="""
WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(range(len(t) - 2),
               i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS s
    FROM toks
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
rare AS (
    SELECT s FROM sh GROUP BY s
    HAVING count(*) <= ceil(0.1 * (SELECT count(*) FROM documents))
),
shr AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare ON sh.s = rare.s),
inter AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
    FROM shr a JOIN shr b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
pairs AS (
    SELECT d1, d2
    FROM inter
    JOIN sizes s1 ON inter.d1 = s1.doc_id
    JOIN sizes s2 ON inter.d2 = s2.doc_id
    WHERE round(inter * 1.0 / (s1.n + s2.n - inter), 6) >= 0.3
),
verts AS (SELECT d1 AS id FROM pairs UNION SELECT d2 FROM pairs),
edges AS (SELECT d1 AS u, d2 AS v FROM pairs
          UNION SELECT d2 AS u, d1 AS v FROM pairs),
walk(id, lbl) AS (
    SELECT id, id FROM verts
    UNION
    SELECT e.v AS id, w.lbl FROM walk w JOIN edges e ON e.u = w.id
),
comp AS (SELECT id, min(lbl) AS component FROM walk GROUP BY id),
assign AS (
    SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
),
csz AS (SELECT cluster_id, count(*) AS cluster_size FROM assign GROUP BY cluster_id)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       count(*) AS n_clusters,
       CAST(cluster_size * count(*) AS BIGINT) AS n_docs
FROM csz GROUP BY cluster_size
""",
)
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size distribution (round-8 addition): the
    histogram (cluster_size, n_clusters, n_docs) over the exact
    n-gram-Jaccard closure — the dedup-effectiveness report read
    BEFORE choosing a keeper policy (a fat tail of large clusters
    means a few templates dominate the corpus; all-singletons means
    dedup would be a no-op). Fully differential: reuses
    dedup_cluster_ngram's recursive-CTE closure oracle plus two aggs.
    Scale shape: the closure's cost (audited there); the histogram
    itself is two tiny aggs over one-row-per-doc then one-row-per-
    cluster tables."""
    from ..operators.components import dedup_cluster_assignment

    t = Tables(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        t.documents, "doc_id", "text", k=3, threshold=0.3, max_shingle_frac=0.1
    )
    assign = dedup_cluster_assignment(
        t.documents, pairs, id_col="doc_id", src="d1", dst="d2"
    )
    csz = assign.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return csz.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1)))
        .cast("long")
        .alias("n_docs"),
    ).select(F.col("cluster_size").cast("long").alias("cluster_size"),
             "n_clusters", "n_docs")


@register("dedup_recall_report")  # rows-only: the report compares an
# approximate operator against its exact ground truth — precision==1.0
# (verified candidates can't be false) and recall>=0.6 pinned in
# tests/test_operators.py
def dedup_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured LSH quality report — 'measure, don't guess' as a
    first-class query: the EXACT thresholded-Jaccard pair set
    (prefix-filtered AllPairs/PPJoin — lossless, the registered ground
    -truth builder) vs the MinHash-LSH pair set at the SAME threshold,
    joined to one audit row: n_true / n_lsh / n_hit, recall,
    precision. Because the LSH path verifies exact Jaccard on its
    candidates, every reported pair is true (precision 1.0 by
    construction — asserted); recall isolates pure banding loss, the
    number a production operator owner tunes (bands, rows/band)
    against. Scale shape: both pair tables are the tiny post-filter
    sets; the audit join and counts cost nothing beside the operators
    themselves — making this report cheap enough to run per-ingest as
    drift monitoring on the dedup tier."""
    from ..operators.dedup import minhash_lsh_pairs, prefix_jaccard_pairs

    t = Tables(spark, sf_dir)
    truth = prefix_jaccard_pairs(
        t.documents, "doc_id", "text", threshold=0.3
    ).select("d1", "d2", F.lit(1).alias("in_true"))
    lsh = minhash_lsh_pairs(
        t.documents, "doc_id", "text", threshold=0.3
    ).select("d1", "d2", F.lit(1).alias("in_lsh"))
    j = truth.join(lsh, ["d1", "d2"], "full_outer")
    return j.agg(
        F.sum("in_true").cast("bigint").alias("n_true"),
        F.sum("in_lsh").cast("bigint").alias("n_lsh"),
        F.sum(
            F.when(
                F.col("in_true").isNotNull() & F.col("in_lsh").isNotNull(), 1
            )
        )
        .cast("bigint")
        .alias("n_hit"),
        F.round(
            F.sum(
                F.when(
                    F.col("in_true").isNotNull() & F.col("in_lsh").isNotNull(),
                    1,
                ).otherwise(0)
            )
            / F.sum(F.coalesce(F.col("in_true"), F.lit(0))),
            6,
        ).alias("recall"),
        F.round(
            F.sum(
                F.when(
                    F.col("in_true").isNotNull() & F.col("in_lsh").isNotNull(),
                    1,
                ).otherwise(0)
            )
            / F.sum(F.coalesce(F.col("in_lsh"), F.lit(0))),
            6,
        ).alias("precision"),
    )
