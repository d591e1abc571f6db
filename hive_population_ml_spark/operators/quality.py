"""Data-quality constraint checking — Deequ-style declarative
validation (charter extension; the public pattern is AWS Deequ /
Great Expectations, re-expressed as ONE Spark aggregation).

Why one aggregation matters at 100 TB: naive validation runs one job
per constraint (Deequ's own motivation); here every constraint compiles
to an aggregate expression and the whole suite is a single distributed
agg — one corpus pass, map-side partials, a handful of output rows.
``unique`` constraints need count+countDistinct of their column, still
inside the same agg. The report is data, not exceptions: callers gate
on ``violations == 0`` and persist the report next to the dataset.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    name: str
    # aggregate expression counting VIOLATING rows (0 = pass)
    violations: Column = field(compare=False)


def not_null(col: str) -> Constraint:
    return Constraint(
        f"not_null({col})",
        F.sum(F.col(col).isNull().cast("long")),
    )


def unique(col: str) -> Constraint:
    """Violations = n_rows - n_distinct (0 when the column is a key).
    NULLs are not counted as duplicates of each other (count() skips
    them), matching SQL UNIQUE semantics."""
    return Constraint(
        f"unique({col})",
        F.count(col) - F.countDistinct(col),
    )


def in_range(col: str, lo=None, hi=None) -> Constraint:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return Constraint(
        f"in_range({col},{lo},{hi})",
        F.sum(cond.cast("long")),
    )


def accepted_values(col: str, values: list) -> Constraint:
    vals = ",".join(str(v) for v in sorted(values))
    return Constraint(
        f"accepted_values({col},[{vals}])",
        F.sum((~F.col(col).isin(values)).cast("long")),
    )


def matches_regex(col: str, pattern: str) -> Constraint:
    return Constraint(
        f"matches_regex({col})",
        F.sum((~F.col(col).rlike(pattern)).cast("long")),
    )


def non_empty() -> Constraint:
    """Suite-level guard: an EMPTY input passes every per-row
    constraint vacuously — this one fails instead."""
    return Constraint(
        "non_empty()",
        (F.count(F.lit(1)) == 0).cast("long"),
    )


def check_constraints(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Run the whole suite in ONE aggregation. Returns one row per
    constraint: (constraint, violations, passed) — deterministic order
    by constraint name."""
    if not constraints:
        raise ValueError("empty constraint suite")
    names = [c.name for c in constraints]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate constraint names in suite: {names}")
    agg = df.agg(
        *[c.violations.alias(f"__v{i}") for i, c in enumerate(constraints)]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("constraint"),
                F.coalesce(F.col(f"__v{i}"), F.lit(0)).cast("long").alias(
                    "violations"
                ),
            )
            for i, c in enumerate(constraints)
        ]
    )
    return (
        agg.select(F.explode(pairs).alias("r"))
        .select(
            "r.constraint",
            "r.violations",
            (F.col("r.violations") == 0).cast("int").alias("passed"),
        )
        .orderBy("constraint")
    )
