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


def pagerank(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    alpha: float = 0.85,
    max_iter: int = 10,
    tol: float | None = None,
) -> DataFrame:
    """Rank nodes of the directed graph ``edges``; returns (node, rank)
    summing to 1. ``tol`` (L1 change) enables early exit — one extra
    scalar agg per iteration; leave None to run exactly ``max_iter``
    rounds (deterministic plan count)."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
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

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    base = (1.0 - alpha) / n
    for _ in range(max_iter):
        d_mass = (
            dangling_nodes.join(ranks, "node")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        contribs = (
            w_edges.join(ranks, w_edges["s"] == ranks["node"])
            .select(F.col("d").alias("node"), (F.col("w") * F.col("rank")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(alpha)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(d_mass / n))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        if tol is not None:
            diff = (
                new_ranks.join(
                    ranks.select("node", F.col("rank").alias("old")), "node"
                )
                .agg(F.sum(F.abs(F.col("rank") - F.col("old"))))
                .first()[0]
            )
            ranks = new_ranks
            if diff is not None and diff < tol:
                break
        else:
            ranks = new_ranks
    return ranks


def pagerank_reference(
    edge_list: list[tuple[int, int]],
    alpha: float = 0.85,
    max_iter: int = 10,
) -> dict[int, float]:
    """Pure-python power iteration with identical dangling handling —
    the pinning twin for tests (same role as _union_find_labels for
    connected components)."""
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
        rank = {
            x: (1.0 - alpha) / n + alpha * (contrib[x] + d_mass / n)
            for x in nodes
        }
    return rank
