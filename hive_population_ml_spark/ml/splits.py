"""Leakage-safe group-wise splits — SURVEY.md §2.8 M4.

The reference splits by DISTINCT hive_id (70/15/15, seed 42) so no
hive's rows straddle train/val/test (preprocessing.py:532-567). The
Spark re-expression splits the distinct-key table, then semi-joins
rows back. Two strategies:

- ``split_by_group``: ``randomSplit`` on distinct keys (seeded) —
  matches the reference's *properties* (ratios, key-disjointness),
  not its RNG stream (SURVEY §7.5: reference semantics, not
  reference RNG).
- ``split_by_hash``: deterministic ``pmod(xxhash64(key, seed), 100)``
  bucketing — reproducible across engines AND across runs/cluster
  sizes, the right default for a 100 TB pipeline (no driver-side
  key materialization; the split column is computed map-side and the
  semi-join disappears into a projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_by_group(
    df: DataFrame,
    group_col: str,
    weights: tuple[float, float, float] = (0.7, 0.15, 0.15),
    seed: int = 42,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Random seeded split over distinct group keys + semi-join back."""
    keys = df.select(group_col).distinct()
    train_k, val_k, test_k = keys.randomSplit(list(weights), seed=seed)
    return tuple(
        df.join(F.broadcast(k), group_col, "left_semi")
        for k in (train_k, val_k, test_k)
    )


def with_split_column(
    df: DataFrame,
    group_col: str,
    weights: tuple[float, float, float] = (0.7, 0.15, 0.15),
    seed: int = 42,
    col_name: str = "split",
) -> DataFrame:
    """Deterministic hash-bucket split as a projected column (no join,
    no shuffle): pmod(xxhash64(key, seed), 100) < thresholds."""
    bucket = F.pmod(F.xxhash64(F.col(group_col), F.lit(seed)), F.lit(100))
    t1 = int(weights[0] * 100)
    t2 = int((weights[0] + weights[1]) * 100)
    return df.withColumn(
        col_name,
        F.when(bucket < t1, "train").when(bucket < t2, "val").otherwise("test"),
    )


def split_by_hash(
    df: DataFrame,
    group_col: str,
    weights: tuple[float, float, float] = (0.7, 0.15, 0.15),
    seed: int = 42,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    tagged = with_split_column(df, group_col, weights, seed)
    return tuple(
        tagged.filter(F.col("split") == name).drop("split")
        for name in ("train", "val", "test")
    )


def cluster_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "d1",
    dst: str = "d2",
    train_frac: float = 0.8,
    mode: str = "minstd",
) -> DataFrame:
    """Near-dup-aware train/holdout split: documents split by their
    DUPLICATE CLUSTER, never individually — the corpus-level analogue
    of the reference's leakage-safe group split (M4). A near-duplicate
    of a held-out document leaking into train is exactly the
    contamination eval decks guard against; hashing the CLUSTER id
    (transitive closure over ``pairs``; singletons are their own
    cluster) guarantees no dup pair — even one connected only
    transitively — ever straddles the split.

    Scale shape: the closure is the alternating-star components pass
    (operators/components.py — O(log² n) rounds over a shrinking edge
    list); the split itself adds ZERO shuffles on top of the cluster
    assignment — ``uniform_hash`` is a map-side projection of the
    cluster id (the portable minstd form, so a DuckDB oracle recomputes
    the whole query including the closure; ``xxhash64`` mode for
    production mixing).

    Output: (id_col, cluster_id, split ∈ {train, holdout}).
    """
    from ..operators.components import dedup_cluster_assignment
    from ..operators.sampling import uniform_hash

    assign = dedup_cluster_assignment(
        docs, pairs, id_col=id_col, src=src, dst=dst
    )
    u = uniform_hash(F.col("cluster_id"), mode)
    return assign.select(
        id_col,
        "cluster_id",
        F.when(u < F.lit(train_frac), F.lit("train"))
        .otherwise(F.lit("holdout"))
        .alias("split"),
    )
