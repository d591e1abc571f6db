"""Distributed PageRank over a DataFrame edge list.

No reference citation exists (SURVEY.md §2.10 charter extension): the
training-data use is graph-based quality weighting — rank documents by
the near-duplicate / link / citation graph (the Common-Crawl-style
"rank the URL graph, weight the corpus" recipe) — and the operator is
the second iterative distributed algorithm in the engine next to
``components.py``'s connected components.

Algorithm (Page et al. 1999, damping form): rank' = (1-a)/N +
a * (in-contributions + dangling_mass/N). Dangling mass (nodes with no
out-edges) is redistributed uniformly each iteration, so total rank
stays 1 and the result matches the power-iteration of the full Google
matrix.

Spark-first shape:
- Per-edge contribution weight ``1/out_degree`` is precomputed ONCE
  and localCheckpoint'ed — the join + groupBy per iteration shuffles
  only (node, rank) pairs and the static weighted edge list.
- Each iteration is one hash join (edges x ranks on src) + one partial
  aggregation (sum by dst) + one left join back onto the node set —
  all key-partitioned on node id; at cluster scale, pre-partitioning
  edges and ranks on the same key makes the per-iteration exchanges
  no-ops on the edge side.
- Lineage is cut per iteration via ``localCheckpoint`` (swap to
  ``checkpoint()`` with a durable dir on a real cluster — same policy
  as components.py).
- The dangling scalar is a 1-row aggregate over the CURRENT ranks of
  the precomputed dangling-node set, fetched with the iteration's
  materializing action — never a corpus-sized collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .ckpt import free_ckpt, local_ckpt


def pagerank(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    alpha: float = 0.85,
    max_iter: int = 10,
    tol: float | None = None,
    small_graph_threshold: int = 1_000_000,
) -> DataFrame:
    """Rank nodes of the directed graph ``edges``; returns (node, rank)
    summing to 1. ``tol`` (L1 change) enables early exit — one extra
    scalar agg per iteration; leave None to run exactly ``max_iter``
    rounds (deterministic plan count).

    Small-graph cutover (components.py's runtime-stats policy): when
    the materialized edge list fits the driver comfortably (default 1M
    edges ~ 16 MB) the power iteration runs driver-side via
    ``pagerank_reference`` — identical ranks (test-pinned <1e-9 against
    the distributed path), none of the per-iteration job-scheduling
    cost that dominates small graphs. Similarity graphs are TINY
    relative to the corpus, so most real runs take this branch; a web-
    scale link graph exceeds the threshold and iterates distributively.
    Set ``small_graph_threshold=0`` to force the distributed path.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if small_graph_threshold:
        # Small-graph cutover WITHOUT materializing first (round 13,
        # the components.py r12 fold): collect at most threshold+1
        # edges through a limit guard — ONE execution of the edge graph
        # and one driver round trip, replacing the eager-checkpoint +
        # count + collect triple. The collected edges are SORTED before
        # the reference power iteration so the float-sum order (and
        # with it every rank, to the last ulp) is a deterministic
        # function of the edge SET, independent of partition/arrival
        # order — strictly more deterministic than the previous
        # checkpoint-order collect.
        head = e.limit(small_graph_threshold + 1).collect()
        if 0 < len(head) <= small_graph_threshold:
            ranks = pagerank_reference(
                sorted((r["s"], r["d"]) for r in head),
                alpha=alpha,
                max_iter=max_iter,
                tol=tol,
            )
            spark = edges.sparkSession
            return spark.createDataFrame(
                sorted(ranks.items()), "node long, rank double"
            )
        if not head:
            spark = edges.sparkSession
            return spark.createDataFrame([], "node long, rank double")
    e = e.localCheckpoint()
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    w_edges = (
        e.join(out_deg, "s")
        .select("s", "d", (F.lit(1.0) / F.col("deg")).alias("w"))
        .localCheckpoint()
    )
    dangling_nodes = nodes.join(
        out_deg.select(F.col("s").alias("node")), "node", "left_anti"
    ).localCheckpoint()
    # Symmetrized similarity graphs have NO dangling nodes — detect once
    # and drop the per-iteration dangling-mass join entirely (it is pure
    # per-iteration overhead when the mass is identically zero).
    has_dangling = dangling_nodes.limit(1).count() > 0

    ranks = local_ckpt(nodes.withColumn("rank", F.lit(1.0 / n)))
    base = (1.0 - alpha) / n
    for _ in range(max_iter):
        contribs = (
            w_edges.join(ranks, w_edges["s"] == ranks["node"])
            .select(F.col("d").alias("node"), (F.col("w") * F.col("rank")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        new_ranks = nodes.join(contribs, "node", "left")
        if has_dangling:
            # Dangling mass stays IN the plan as a broadcast 1-row
            # scalar — a separate .first() action here would double the
            # jobs per iteration (measured ~2x wall on overhead-bound
            # graphs).
            d_mass = dangling_nodes.join(ranks, "node").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
            )
            new_ranks = new_ranks.join(F.broadcast(d_mass))
            in_mass = (
                F.coalesce(F.col("c"), F.lit(0.0))
                + F.col("__dm") / F.lit(float(n))
            )
        else:
            in_mass = F.coalesce(F.col("c"), F.lit(0.0))
        new_ranks = local_ckpt(new_ranks.select(
            "node",
            (F.lit(base) + F.lit(alpha) * in_mass).alias("rank"),
        ))
        if tol is not None:
            diff = (
                new_ranks.join(
                    ranks.select("node", F.col("rank").alias("old")), "node"
                )
                .agg(F.sum(F.abs(F.col("rank") - F.col("old"))))
                .first()[0]
            )
            # the diff action above was the old table's last read —
            # release its blocks (same per-iteration leak as
            # suffixes.py; checkpoints are eager and plain unpersist()
            # would not free them — see ckpt.py)
            free_ckpt(ranks)
            ranks = new_ranks
            if diff is not None and diff < tol:
                break
        else:
            free_ckpt(ranks)
            ranks = new_ranks
    return ranks


def pagerank_reference(
    edge_list: list[tuple[int, int]],
    alpha: float = 0.85,
    max_iter: int = 10,
    tol: float | None = None,
) -> dict[int, float]:
    """Pure-python power iteration with identical dangling handling —
    the pinning twin for tests (same role as _union_find_labels for
    connected components) AND the small-graph cutover executor."""
    nodes = sorted({x for uv in edge_list for x in uv})
    n = len(nodes)
    if n == 0:
        return {}
    out: dict[int, list[int]] = {}
    for u, v in edge_list:
        out.setdefault(u, []).append(v)
    rank = {x: 1.0 / n for x in nodes}
    for _ in range(max_iter):
        d_mass = sum(rank[x] for x in nodes if x not in out)
        contrib = {x: 0.0 for x in nodes}
        for u, vs in out.items():
            share = rank[u] / len(vs)
            for v in vs:
                contrib[v] += share
        new_rank = {
            x: (1.0 - alpha) / n + alpha * (contrib[x] + d_mass / n)
            for x in nodes
        }
        diff = sum(abs(new_rank[x] - rank[x]) for x in nodes)
        rank = new_rank
        if tol is not None and diff < tol:
            break
    return rank
