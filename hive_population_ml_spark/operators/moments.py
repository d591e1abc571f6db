"""Bias-corrected higher moments (SURVEY.md §2.4 A2).

pandas ``skew()``/``kurtosis()`` are bias-corrected *sample* statistics
(kurtosis excess); Spark's ``skewness``/``kurtosis`` builtins are
population-moment based, and DuckDB's differ again — so per SURVEY
§5.3 both the engine and the oracle compute the SAME explicit
raw-moment formula:

    m_k = avg(x^k);  c2 = m2 - m1^2
    c3 = m3 - 3 m1 m2 + 2 m1^3
    c4 = m4 - 4 m1 m3 + 6 m1^2 m2 - 3 m1^4
    g1 = c3 / c2^1.5            (population skew)
    G1 = g1 * sqrt(n(n-1))/(n-2)         (pandas skew)
    g2 = c4 / c2^2 - 3          (population excess kurtosis)
    G2 = ((n+1) g2 + 6)(n-1)/((n-2)(n-3))  (pandas kurtosis)

All arithmetic is Catalyst expressions over one ``agg`` pass — a
single 2-phase hash aggregation, no UDAF needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def moment_exprs(col: str, round_to: int | None = 6) -> list:
    """Aggregate expressions for n + bias-corrected skew/kurtosis."""
    x = F.col(col)
    n = F.count(x).cast("double")
    m1 = F.avg(x)
    m2 = F.avg(x * x)
    m3 = F.avg(x * x * x)
    m4 = F.avg(x * x * x * x)
    c2 = m2 - m1 * m1
    c3 = m3 - F.lit(3.0) * m1 * m2 + F.lit(2.0) * m1 * m1 * m1
    c4 = (
        m4
        - F.lit(4.0) * m1 * m3
        + F.lit(6.0) * m1 * m1 * m2
        - F.lit(3.0) * m1 * m1 * m1 * m1
    )
    g1 = c3 / F.pow(c2, F.lit(1.5))
    skew_bc = g1 * F.sqrt(n * (n - 1)) / (n - 2)
    g2 = c4 / (c2 * c2) - F.lit(3.0)
    kurt_bc = ((n + 1) * g2 + F.lit(6.0)) * (n - 1) / ((n - 2) * (n - 3))

    def r(e):
        return F.round(e, round_to) if round_to is not None else e

    return [
        F.count(x).alias(f"{col}_n"),
        r(skew_bc).alias(f"{col}_skew"),
        r(kurt_bc).alias(f"{col}_kurt"),
    ]


def moments_sql(col: str, round_to: int = 6) -> str:
    """The identical formula as ANSI SQL select-list fragments (DuckDB)."""
    frag = f"""
      count({col}) AS {col}_n,
      round(
        (avg({col}*{col}*{col}) - 3.0*avg({col})*avg({col}*{col}) + 2.0*avg({col})*avg({col})*avg({col}))
        / power(avg({col}*{col}) - avg({col})*avg({col}), 1.5)
        * sqrt(CAST(count({col}) AS DOUBLE) * (CAST(count({col}) AS DOUBLE) - 1)) / (CAST(count({col}) AS DOUBLE) - 2)
      , {round_to}) AS {col}_skew,
      round(
        ((CAST(count({col}) AS DOUBLE) + 1) *
          ((avg({col}*{col}*{col}*{col}) - 4.0*avg({col})*avg({col}*{col}*{col})
            + 6.0*avg({col})*avg({col})*avg({col}*{col}) - 3.0*avg({col})*avg({col})*avg({col})*avg({col}))
           / ((avg({col}*{col}) - avg({col})*avg({col})) * (avg({col}*{col}) - avg({col})*avg({col}))) - 3.0)
         + 6.0) * (CAST(count({col}) AS DOUBLE) - 1)
        / ((CAST(count({col}) AS DOUBLE) - 2) * (CAST(count({col}) AS DOUBLE) - 3))
      , {round_to}) AS {col}_kurt"""
    return frag


def grouped_moments(
    df: DataFrame, keys: Sequence[str], col: str, round_to: int | None = 6
) -> DataFrame:
    return df.groupBy(*keys).agg(*moment_exprs(col, round_to))
