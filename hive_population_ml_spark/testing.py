"""Differential-oracle harness mirroring the driver's t2 check.

Runs a registered Spark query and its DuckDB oracle SQL on the same
parquet tables, then compares row count, column names, and
order-insensitive values (doubles rounded) — so mismatches surface in
`pytest` before the driver's CORRECTNESS gate does.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from .io.sources import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir.rstrip('/')}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame, round_to: int = 9) -> list[tuple]:
    df = df[sorted(df.columns)].copy()
    rows = []
    for row in df.itertuples(index=False):
        norm = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                norm.append(None)
            elif isinstance(v, float):
                r = round(v, round_to)
                norm.append(0.0 if r == 0 else r)  # -0.0 == 0.0
            elif isinstance(v, (list, tuple)) or (
                hasattr(v, "ndim") and getattr(v, "ndim", 0) >= 1
            ):  # array cells (Spark arrays / DuckDB lists via pandas)
                norm.append(
                    tuple(_norm_scalar(x, round_to) for x in list(v))
                )
            elif hasattr(v, "item"):  # numpy scalars
                norm.append(_norm_scalar(v.item(), round_to))
            else:
                norm.append(v)
        rows.append(tuple(norm))
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return rows


def _norm_scalar(v, round_to):
    if hasattr(v, "item") and getattr(v, "ndim", 0) == 0:  # numpy scalar
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return None
        r = round(v, round_to)
        return 0.0 if r == 0 else r
    return v


def compare_query(
    spark, sf_dir: str, name: str, round_to: int = 9, allow_empty: bool = False
) -> None:
    """Assert Spark result == DuckDB oracle result for query ``name``."""
    from .queries import ORACLE, QUERIES, load_all

    load_all()
    spark_df = QUERIES[name](spark, sf_dir).toPandas()
    if not allow_empty:
        # A 0-row result matching a 0-row oracle is a vacuous pass.
        assert len(spark_df) > 0, f"{name}: empty result — vacuous comparison"
    if name not in ORACLE:
        return
    con = duckdb_connection(sf_dir)
    try:
        duck_df = con.execute(ORACLE[name]).df()
    finally:
        con.close()

    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: column mismatch spark={sorted(spark_df.columns)} "
        f"duck={sorted(duck_df.columns)}"
    )
    assert len(spark_df) == len(duck_df), (
        f"{name}: row count spark={len(spark_df)} duck={len(duck_df)}"
    )
    s_rows = _normalize(spark_df, round_to)
    d_rows = _normalize(duck_df, round_to)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )
