"""Row-wise (horizontal) null-aware arithmetic — SURVEY.md A12/F20.

The reference's ``df[[a, b]].mean(axis=1)`` (loader.py:252-254) skips
NaNs per row; Spark has no horizontal mean builtin, so we compose it
from coalesce + null masks. Pure Catalyst expressions — stays inside
whole-stage codegen, no UDF.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def rowwise_present(cols: Sequence[str]) -> Column:
    """Count of non-null values across columns, per row."""
    return reduce(
        lambda a, b: a + b,
        [F.col(c).isNotNull().cast("int") for c in cols],
    )


def rowwise_sum(cols: Sequence[str]) -> Column:
    """Null-skipping horizontal sum (null only if all inputs null)."""
    return reduce(
        lambda a, b: a + b,
        [F.coalesce(F.col(c), F.lit(0)) for c in cols],
    )


def rowwise_mean(cols: Sequence[str]) -> Column:
    """Null-skipping horizontal mean; null when every input is null —
    matching pandas ``mean(axis=1)`` semantics."""
    return rowwise_sum(cols) / F.nullif(rowwise_present(cols), F.lit(0))
