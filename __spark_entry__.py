"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``hive_population_ml_spark``; this module
only adapts the registry to the driver's entry-point shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (interval join + windowed stats bundle) on sf0.001."""
    from hive_population_ml_spark.queries import QUERIES, load_all

    load_all()
    return QUERIES["flagship_interval_stats"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from hive_population_ml_spark.queries import QUERIES, load_all

    load_all()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from hive_population_ml_spark.queries import ORACLE, load_all

    load_all()
    return dict(ORACLE)
