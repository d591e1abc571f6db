"""Differential oracle: every registered query vs its DuckDB SQL.

Mirrors the driver's t2 correctness gate (sf0.01 via SPARK_GRAFT_ORACLE_SF;
smoke-scale sf0.001 runs too for fast iteration on empty/edge groups).
"""

import pytest

from hive_population_ml_spark.queries import QUERIES, load_all
from hive_population_ml_spark.testing import compare_query

load_all()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle_smoke(spark, sf_dir, name):
    compare_query(spark, sf_dir, name)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle_sf001(spark, sf_oracle_dir, name):
    compare_query(spark, sf_oracle_dir, name)
