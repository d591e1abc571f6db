"""Connected components over near-duplicate pairs — the cluster step of
a production dedup pipeline.

Pair emitters (``minhash_lsh_pairs``, ``simhash_pairs``,
``ngram_jaccard_pairs``) give EDGES; keeping one representative per
duplicate *cluster* needs the transitive closure: if A~B and B~C, then
{A,B,C} collapse together even though (A,C) was never emitted. The
reference has no distributed analog (its pandas dedup is single-node
exact); this is the published MapReduce formulation.

Algorithm: alternating large-star / small-star (Kiveris et al. 2014,
"Connected Components in MapReduce and Beyond") — converges in
O(log^2 n) rounds on any graph (in practice 2-4 rounds for dup
clusters, which are near-stars), against O(diameter) for naive
min-label flooding, which a pathological chain of near-dups turns into
thousands of rounds. Each half-round is one groupBy(min) + one join —
shuffle size bounded by the CURRENT edge list, which only shrinks:
both stars replace a node's edges with edges into its neighborhood
minimum, so mass concentrates onto component roots.

At 100 TB: edges live in executor memory/disk as ordinary DataFrames;
every iteration materializes via ``localCheckpoint`` to cut the lineage
(on a cluster, point ``spark.sparkContext.setCheckpointDir`` at durable
storage and swap to ``checkpoint()`` — documented here rather than
auto-switched so local runs stay dependency-free). Convergence is a
checksum comparison (count + sum of a 64-bit edge hash), two scalar
aggs over the shrinking edge list — never a full edge-set join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .ckpt import free_ckpt, local_ckpt


def _undirected(e: DataFrame) -> DataFrame:
    return e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _checksum(e: DataFrame) -> tuple[int, int]:
    row = e.agg(
        F.count("*").alias("n"),
        # bit_xor: order-insensitive and overflow-free under ANSI mode
        # (SUM of 64-bit hashes overflows LongType)
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def _union_find_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Driver-side union-find with min-id labels (path compression +
    union by attaching the larger root to the smaller — the min-root
    IS the deterministic label, matching the distributed algorithm)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def connected_components(
    pairs: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 25,
    small_graph_threshold: int = 1_000_000,
) -> DataFrame:
    """Label every vertex of the pair graph with its component's MINIMUM
    id (deterministic canonical representative).

    Returns ``(id long, component long)`` — one row per distinct vertex
    appearing in ``pairs``; singletons never enter the edge list, so
    callers attach them with a left join + ``coalesce(component, id)``.

    Small-graph cutover: the deduped edge list is already materialized
    (localCheckpoint), so its count is a cheap scalar; when it fits the
    driver comfortably (default 1M edges ~ 16 MB) the closure runs as a
    driver-side union-find in one pass — identical min-id labels
    (test-pinned against the distributed path), none of the per-
    iteration job-scheduling cost that dominates small graphs (~2 s for
    a 25-edge graph locally). This is the same runtime-stats philosophy
    as AQE's broadcast decision: near-dup pair graphs are TINY relative
    to the corpus (pairs ≪ docs after LSH banding), so most real runs
    take this branch; a pathological pair explosion exceeds the
    threshold and iterates distributively, where shuffle size is
    bounded by the shrinking edge list. Set
    ``small_graph_threshold=0`` to force the distributed path.
    """
    e = (
        pairs.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )
    if small_graph_threshold:
        # Small-graph cutover WITHOUT materializing first (round-12
        # optimization): collect at most threshold+1 edges through a
        # limit guard — ONE execution of the pair graph and one driver
        # round trip, replacing the old checkpoint-write + checksum job
        # + collect triple. Union-find labels are edge-ORDER-invariant
        # (min-root per component), so the limit's nondeterministic row
        # order cannot change the output. If the guard trips
        # (pathological pair explosion) the distributed path below
        # re-executes the graph once into its checkpoint — the rare
        # case pays one extra pass; the common case saves two jobs.
        head = e.limit(small_graph_threshold + 1).collect()
        if len(head) <= small_graph_threshold:
            labels = _union_find_labels([(r["u"], r["v"]) for r in head])
            spark = pairs.sparkSession
            if not labels:
                return spark.createDataFrame([], "id long, component long")
            return spark.createDataFrame(
                [(int(k), int(v)) for k, v in sorted(labels.items())],
                "id long, component long",
            )
    e = local_ckpt(e)
    prev = _checksum(e)
    for _ in range(max_iter):
        prev_ckpt = e  # superseded after this round's checkpoint
        # large-star: every neighbor v > u re-attaches to u's
        # neighborhood minimum m = min(N(u) + {u}).
        und = _undirected(e)
        mins = und.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        e = (
            und.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: neighbors v <= u (edge list now points downward)
        # plus u itself attach to that set's minimum.
        mins = e.groupBy("u").agg(F.min("v").alias("m"))
        e = (
            e.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(mins.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        e = local_ckpt(e)
        # release the superseded round's edge blocks (checkpoint is
        # eager — same per-iteration block leak as suffixes.py; plain
        # DataFrame.unpersist() would NOT free them, see ckpt.py)
        free_ckpt(prev_ckpt)
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "alternating rounds — the algorithm's bound is O(log^2 n), "
            "so this indicates corrupt input (e.g. nulls in the id "
            "columns) rather than scale"
        )
    # At the fixpoint every edge is (node -> component root); roots
    # label themselves.
    return (
        e.select(F.col("u").alias("id"), F.col("v").alias("component"))
        .unionByName(
            e.select(F.col("v").alias("id"), F.col("v").alias("component"))
        )
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )


def dedup_cluster_assignment(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id1",
    dst: str = "id2",
) -> DataFrame:
    """Full-corpus cluster assignment: every document labeled with its
    duplicate-cluster id (= min member id; singletons label themselves)
    and whether it is the cluster's canonical keeper. The keep-set
    ``filter(is_canonical = 1)`` is the deduplicated corpus."""
    comp = connected_components(pairs, src=src, dst=dst)
    return docs.select(F.col(id_col).cast("long").alias(id_col)).join(
        comp.withColumnRenamed("id", id_col), id_col, "left"
    ).select(
        id_col,
        F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        (F.coalesce("component", F.col(id_col)) == F.col(id_col))
        .cast("int")
        .alias("is_canonical"),
    )


def keeper_by_score(
    assign: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Score-ranked dedup keeper (the FineWeb/RefinedWeb policy): per
    cluster keep the member with the HIGHEST score (ties -> min id) —
    dedup should discard the WORSE copy, which the arbitrary min-id
    canonical cannot promise. ``assign`` is a
    :func:`dedup_cluster_assignment` labeling; ``scores`` is
    (id, score).

    Output: (id_col, cluster_col, score_col, is_kept). Exactly ONE
    cluster-keyed exchange beyond the inputs: an unordered window max
    of the (score, -id, id) struct — no agg-plus-join-back, which
    would cost two more exchanges and consume the closure twice.
    """
    from pyspark.sql import Window

    scored = assign.join(scores, id_col).select(
        id_col, cluster_col, score_col
    )
    best = F.max(
        F.struct(
            F.col(score_col),
            (-F.col(id_col)).alias("nd"),
            F.col(id_col).alias("d"),
        )
    ).over(Window.partitionBy(cluster_col))
    return scored.withColumn(
        "is_kept", (F.col(id_col) == best["d"]).cast("int")
    )
