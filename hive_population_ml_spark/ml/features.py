"""End-to-end feature-table builder — the Spark restatement of the
reference's flagship pipeline stage (SURVEY.md §3.1 steps 3-7:
scan -> align -> featurize -> label -> split).

Reference: create_population_dataset (preprocessing.py:142-204)
produces a wide per-annotation feature matrix + label. Here the same
shape is built from the testdata star schema: one interval join, one
multi-measure stats-bundle aggregation, a CASE label, and a
deterministic leakage-safe split column — a single lazy DAG, no
intermediate materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import Tables
from ..operators.interval_join import interval_join
from ..operators.stats_bundle import stat_exprs
from .splits import with_split_column


def build_feature_table(
    spark: SparkSession,
    sf_dir: str,
    window_days: int = 7,
    min_count: int = 3,
    label_threshold: float = 250000.0,
) -> DataFrame:
    """Wide feature table keyed by anchor order.

    Columns: anchor_orderkey, custkey, measures' stats bundle
    (price/qty x n/avg/std/min/max/range), n_rows, label (binary:
    o_totalprice >= threshold), target (regression: o_totalprice),
    split (train/val/test by custkey hash — group-wise, leakage-safe).
    """
    t = Tables(spark, sf_dir)
    orders = t.orders
    fact = (
        t.lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("l_shipdate").alias("ts"),
            F.col("l_extendedprice").alias("price"),
            F.col("l_quantity").alias("qty"),
            F.col("l_discount").alias("disc"),
        )
    )
    dim = orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    j = interval_join(
        fact,
        dim,
        on=[("custkey", "o_custkey")],
        fact_ts="ts",
        dim_ts="o_orderdate",
        before=window_days,
        after=window_days,
        broadcast_dim=False,
    )
    feats = (
        j.groupBy(
            F.col("o_orderkey").alias("anchor_orderkey"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_totalprice").alias("target"),
        )
        .agg(
            F.count("*").alias("n_rows"),
            *stat_exprs(["price", "qty", "disc"]),
        )
        .filter(F.col("n_rows") >= min_count)
    )
    feats = feats.withColumn(
        "label", (F.col("target") >= label_threshold).cast("double")
    )
    # Split by CUSTOMER (the grouping entity), not by row — no customer's
    # windows straddle splits (M4 leakage discipline).
    return with_split_column(feats, "custkey", seed=42)


def build_sequence_table(
    spark: SparkSession,
    sf_dir: str,
    window_days: int = 7,
    min_count: int = 3,
    label_threshold: float = 250000.0,
    max_len: int = 64,
) -> DataFrame:
    """Sequence analog of :func:`build_feature_table` (M6/M7 input).

    The reference's sequence datasets slice the SAME aligned readings
    the aggregate features come from into per-sample (seq_len x
    n_features) tensors (dataset.py:144-313). Here: the identical
    interval join, then W5 sequence materialization per anchor order —
    (price, qty, disc) readings ordered by ship date, tail-``max_len``,
    zero-padded — plus the same label/target and the same custkey-hash
    split, so aggregate and sequence models train on byte-identical
    populations (EXPERIMENTS.md's MLP-vs-LSTM comparison discipline).
    """
    from ..operators.sequences import build_sequences

    t = Tables(spark, sf_dir)
    orders = t.orders
    fact = t.lineitem.join(
        orders.select("o_orderkey", "o_custkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        F.col("o_custkey").alias("custkey"),
        F.col("l_shipdate").alias("ts"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").alias("qty"),
        F.col("l_discount").alias("disc"),
    )
    dim = orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    j = interval_join(
        fact,
        dim,
        on=[("custkey", "o_custkey")],
        fact_ts="ts",
        dim_ts="o_orderdate",
        before=window_days,
        after=window_days,
        broadcast_dim=False,
    )
    seqs = build_sequences(
        j,
        keys=["o_orderkey", "o_custkey", "o_totalprice"],
        ts="ts",
        features=["price", "qty", "disc"],
        tiebreak="price",
        max_len=max_len,
        pad_to=max_len,
    )
    out = (
        seqs.filter(F.col("seq_len") >= min_count)
        .select(
            F.col("o_orderkey").alias("anchor_orderkey"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_totalprice").alias("target"),
            "seq_len",
            "seq",
        )
        .withColumn("label", (F.col("target") >= label_threshold).cast("double"))
    )
    return with_split_column(out, "custkey", seed=42)
