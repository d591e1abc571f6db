"""Query registry: name -> (spark callable, optional DuckDB oracle SQL)."""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}
# Differential SQL for queries registered AFTER the driver's 50-entry
# hash-check window filled (the window guard in test_api.py caps ORACLE
# at 50). Same rigor, different checker: tests/test_sampling.py runs
# these side-by-side in pytest; the driver sees the query as rows-only.
SHADOW_ORACLE: dict[str, str] = {}


def register(
    name: str, oracle: Optional[str] = None, shadow_oracle: Optional[str] = None
):
    """Decorator registering a query; ``oracle`` is ANSI SQL for DuckDB
    over the pre-registered parquet views (None -> rows-only check);
    ``shadow_oracle`` is the same contract checked by pytest instead of
    the driver (for queries past the driver's 50-entry window)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        if shadow_oracle is not None:
            SHADOW_ORACLE[name] = shadow_oracle
        return fn

    return deco
