"""Sequence materialization — SURVEY.md §2.5 W5 (+W3 stride, W4 tail-K).

The reference builds per-sample (seq_len x n_features) float32 arrays
with pandas slicing, stride subsampling and zero padding
(dataset.py:144-313). Spark re-expression: ONE groupBy with
``sort_array(collect_list(struct(ts, tiebreak, features)))`` — the
sort happens per group after a single shuffle, then stride/tail/pad
are array-lambda projections. No Python in the plan; the resulting
``array<array<double>>`` column feeds TorchDistributor-style consumers
or Arrow export.

Memory note at scale: a group's sequence must fit in one task —
that's inherent to the operator's contract (max_len bounds it after
tail-K, and the collect_list payload is capped by stride-first
subsampling upstream when readings are dense).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_sequences(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    features: Sequence[str],
    tiebreak: str | None = None,
    stride: int = 1,
    max_len: int | None = None,
    pad_to: int | None = None,
) -> DataFrame:
    """Per-key ordered sequence tensor with stride/tail-K/zero-padding.

    Output: keys + seq_len (pre-pad length) + ``seq`` as
    array<array<double>> ordered by (ts, tiebreak).
    """
    order_cols = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    row_struct = F.struct(
        *order_cols,
        F.array(*[F.col(c).cast("double") for c in features]).alias("__fv"),
    )
    grouped = df.groupBy(*keys).agg(
        F.sort_array(F.collect_list(row_struct)).alias("__rows")
    )
    seq = F.transform(F.col("__rows"), lambda r: r["__fv"])
    if stride > 1:
        # W3: keep positions 1, 1+stride, ... (1-based filter index).
        seq = F.filter(seq, lambda x, i: i % stride == 0)
    if max_len is not None:
        # W4: tail-K by recency == last max_len elements of the ordered seq.
        seq = F.when(
            F.size(seq) > max_len, F.slice(seq, -max_len, max_len)
        ).otherwise(seq)
    out = grouped.withColumn("__seq", seq).withColumn("seq_len", F.size("__seq"))
    if pad_to is not None:
        # NB: not F.sequence(1, n) — sequence(1, 0) yields a DESCENDING
        # [1, 0] (2 elements), silently padding full sequences by 2.
        zero_row = F.array_repeat(F.lit(0.0), len(features))
        pad = F.array_repeat(
            zero_row, F.greatest(F.lit(pad_to) - F.size("__seq"), F.lit(0))
        )
        out = out.withColumn("__seq", F.concat(F.col("__seq"), pad))
    return out.select(*keys, "seq_len", F.col("__seq").alias("seq"))
