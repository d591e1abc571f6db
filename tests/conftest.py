import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_population_ml_spark.session import get_spark  # noqa: E402

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hpml-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle_dir():
    return SF_ORACLE


N_SHADOW_SHARDS = 4


def shadow_shard(name: str) -> int:
    """Deterministic shard id for a shadow-oracle query (VERDICT r8 #5):
    crc32 of the query name mod N_SHADOW_SHARDS. Used to mark each
    test_shadow_oracle_differential param so the full hash-check
    contract can run as N independent pytest invocations (separate
    Spark sessions, separate processes):

        pytest tests/test_sampling.py -m shadow_shard0   # ... shard3

    in parallel, without losing the all-queries-checked guarantee —
    tests/test_api.py::test_shadow_shards_partition_registry asserts
    the shards partition SHADOW_ORACLE exactly."""
    import zlib

    return zlib.crc32(name.encode()) % N_SHADOW_SHARDS


def pytest_configure(config):
    for k in range(N_SHADOW_SHARDS):
        config.addinivalue_line(
            "markers",
            f"shadow_shard{k}: shard {k} of the shadow-oracle differential "
            f"contract (deterministic crc32(name) % {N_SHADOW_SHARDS}; run "
            f"shards as parallel pytest processes)",
        )
    config.addinivalue_line(
        "markers",
        "shadow: umbrella marker on every shadow-shard test, so "
        "tools/round_close.sh's remainder group (-m 'not shadow') plus "
        "the N shard groups provably cover pytest tests/ exactly",
    )
