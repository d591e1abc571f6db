"""Round-13 fan-out gate (VERDICT r12 #6): the gate must decide from
file METADATA only — no RDD conversion, no physical planning, no job —
and its split arithmetic must agree with Spark's own scan planning on
the real testdata layouts."""

import os

import pytest

from hive_population_ml_spark.io.sources import TABLE_NAMES, load_table
from hive_population_ml_spark.operators.parallelism import (
    _input_row_groups,
    _parse_bytes,
    _planned_scan_partitions,
    fan_out,
    fan_out_by,
)

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


def test_parse_bytes():
    assert _parse_bytes("128MB") == 128 << 20
    assert _parse_bytes("4194304b") == 4 << 20
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("134217728") == 128 << 20
    assert _parse_bytes(" 10k ") == 10 << 10


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_metadata_gate_matches_spark_planning(spark, sf_dir):
    """The file-metadata split count must equal what Spark actually
    plans (the quantity the old df.rdd.getNumPartitions() gate read)
    for every testdata table — the decisions r12's plans were pinned
    on must not move."""
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        got = _planned_scan_partitions(df)
        want = df.rdd.getNumPartitions()
        assert got == want, f"{sf_dir}/{name}: metadata={got} spark={want}"


def test_gate_unknown_inputs_are_noops(spark):
    """Non-file sources must leave the plan alone (the at-scale
    default): no repartition on a local relation."""
    df = spark.range(10)
    assert _planned_scan_partitions(df) is None
    assert _input_row_groups(df) is None
    assert fan_out(df) is df
    assert fan_out_by(df, "id") is df


@pytest.mark.parametrize("sf_dir", SF_DIRS[:1])
def test_fan_out_decisions(spark, sf_dir):
    """One-row-group testdata scans fan out (round-robin for fan_out,
    keyed for fan_out_by); both are no-ops when the scan already meets
    the target."""
    docs = load_table(spark, sf_dir, "documents")
    assert _input_row_groups(docs) >= 1
    fanned = fan_out(docs)
    plan = fanned._jdf.queryExecution().executedPlan().toString()
    if _planned_scan_partitions(docs) < spark.sparkContext.defaultParallelism:
        assert "RoundRobinPartitioning" in plan
    # target <= current: no-op by construction
    assert fan_out(docs, min_parts=1) is docs
    if _input_row_groups(docs) == 1:
        keyed = fan_out_by(docs, "doc_id")
        kplan = keyed._jdf.queryExecution().executedPlan().toString()
        assert "hashpartitioning(doc_id" in kplan
    assert fan_out_by(docs, "doc_id", min_parts=1) is docs


def test_multi_row_group_refuses_keyed_fanout(spark, tmp_path):
    """2+ row groups = 2+ row-bearing producers: the bit-identity
    argument fails, fan_out_by must refuse (the r12 advisory hole)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "two_groups.parquet")
    t = pa.table({"k": list(range(1000)), "v": [float(i) for i in range(1000)]})
    pq.write_table(t, path, row_group_size=500)
    df = spark.read.parquet(path)
    assert _input_row_groups(df) == 2
    assert fan_out_by(df, "k") is df
    # fan_out (order-safe call sites only) still spreads a narrow scan
    if _planned_scan_partitions(df) < spark.sparkContext.defaultParallelism:
        assert "RoundRobinPartitioning" in (
            fan_out(df)._jdf.queryExecution().executedPlan().toString()
        )


def test_no_rdd_conversion_in_gate():
    """The module must not touch df.rdd (VERDICT r12 #6 'done' bar) —
    checked on the AST so docstring mentions don't count."""
    import ast
    import inspect

    import hive_population_ml_spark.operators.parallelism as mod

    tree = ast.parse(inspect.getsource(mod))
    touched = [
        n.attr
        for n in ast.walk(tree)
        if isinstance(n, ast.Attribute) and n.attr == "rdd"
    ]
    assert not touched, "gate must stay metadata-only (no RDD conversion)"
