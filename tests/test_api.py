"""Facade API tests (SURVEY.md §3.2 lifecycle parity): the three task
recipes + split dispatch over sensor-shaped views of the testdata."""

import pytest
from pyspark.sql import functions as F

from hive_population_ml_spark.api import (
    create_datasets,
    create_phenotypic_dataset,
    create_population_dataset,
    create_sequence_dataset,
    create_winter_dataset,
)
from hive_population_ml_spark.io import Tables


@pytest.fixture(scope="module")
def sensor(spark, sf_dir):
    # events as the sensor stream: user_id ≈ hive_id, value ≈ measure
    ev = Tables(spark, sf_dir).events
    return ev.select(
        F.col("user_id").alias("hive_id"),
        F.col("ts").alias("timestamp"),
        F.col("value").alias("temperature"),
        (F.col("value") * 2 + 1).alias("humidity"),
    ).cache()


@pytest.fixture(scope="module")
def annotations(spark, sf_dir):
    # per-hive dated annotations with a numeric target
    ev = Tables(spark, sf_dir).events
    return (
        ev.groupBy(F.col("user_id").alias("hive_id"))
        .agg(
            F.max("ts").alias("eval_date"),
            F.round(F.avg("value"), 3).alias("frames_of_bees"),
            F.when(F.avg("value") < 0, "starvation").alias("mortality_cause"),
        )
        .cache()
    )


def test_population_dataset(sensor, annotations):
    ds = create_population_dataset(
        sensor,
        annotations.select("hive_id", "eval_date", "frames_of_bees"),
        key="hive_id",
        sensor_ts="timestamp",
        annot_key="hive_id",
        annot_date="eval_date",
        measures=["temperature", "humidity"],
        label_col="frames_of_bees",
        label_threshold=0.0,
        window_days=14,
        min_count=2,
    )
    rows = ds.collect()
    assert len(rows) > 0
    cols = set(ds.columns)
    assert {"hive_id", "eval_date", "frames_of_bees", "label"} <= cols
    assert "temperature_avg" in cols and "humidity_std" in cols
    assert "temperature_d1_mean" in cols  # deltas included
    assert all(r["label"] in (0.0, 1.0) for r in rows)


def test_phenotypic_dataset(sensor, annotations):
    ds = create_phenotypic_dataset(
        sensor,
        annotations.select("hive_id", "frames_of_bees"),
        key="hive_id",
        sensor_ts="timestamp",
        annot_key="hive_id",
        measures=["temperature"],
        season_start="2024-01-01",
        season_end="2024-12-31",
        use_multiscale=True,
    )
    rows = ds.collect()
    assert len(rows) > 0
    cols = set(ds.columns)
    assert "temperature_diurnal_range" in cols
    assert "temperature_weekly_std" in cols and "temperature_weekly_range" in cols
    assert "frames_of_bees" in cols


def test_winter_dataset_survival_label(sensor, annotations):
    ds = create_winter_dataset(
        sensor,
        annotations.select("hive_id", "mortality_cause"),
        key="hive_id",
        sensor_ts="timestamp",
        annot_key="hive_id",
        measures=["temperature"],
        prewinter_start="2024-01-01",
        prewinter_end="2024-12-31",
        survival_col="mortality_cause",
    )
    rows = ds.collect()
    assert len(rows) > 0
    # survived == cause is null
    for r in rows:
        assert r["label"] == (1.0 if r["mortality_cause"] is None else 0.0)


def test_create_datasets_dispatch(sensor, annotations):
    ds = create_population_dataset(
        sensor,
        annotations.select("hive_id", "eval_date", "frames_of_bees"),
        key="hive_id",
        sensor_ts="timestamp",
        annot_key="hive_id",
        annot_date="eval_date",
        measures=["temperature"],
        label_col="frames_of_bees",
        label_threshold=0.0,
        window_days=14,
        min_count=1,
        include_deltas=False,
    )
    train, val, test, info = create_datasets(ds, "hive_id")
    n = ds.count()
    assert train.count() + val.count() + test.count() == n
    assert "temperature_avg" in info["feature_columns"]
    assert "label" not in info["feature_columns"]
    tr = {r[0] for r in train.select("hive_id").distinct().collect()}
    te = {r[0] for r in test.select("hive_id").distinct().collect()}
    assert not (tr & te)


def test_registry_oracle_backed_queries_fit_driver_window():
    """The round driver hash-checks only the FIRST 50 registry entries;
    every oracle-backed query must sit inside that window (rows-only
    approximate ops take the tail). Guards future additions from
    silently pushing an oracle-backed query out of correctness checking."""
    from hive_population_ml_spark import queries

    queries.load_all()
    names = list(queries.QUERIES)
    oracle_backed = [n for n in names if n in queries.ORACLE]
    assert len(oracle_backed) <= 50, (
        f"{len(oracle_backed)} oracle-backed queries > 50-entry driver "
        "window; merge a pair (precedent: a6->a5, a10->a9, m17->m15)"
    )
    assert all(n in queries.ORACLE for n in names[: len(oracle_backed)]), (
        "oracle-backed queries must precede rows-only ops in the registry"
    )


def test_coverage_doc_counts_match_registry():
    """COVERAGE.md's header counts drifted twice (VERDICT r4 #2); pin
    them to the registry so a rotation or new query can't leave the doc
    stale again."""
    import os
    import re

    from hive_population_ml_spark import queries
    from hive_population_ml_spark.queries.registry import SHADOW_ORACLE

    queries.load_all()
    doc = open(
        os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    ).read()
    m = re.search(
        r"(\d+) registered queries; (\d+) oracle-checked by the driver, "
        r"(\d+) shadow-oracle\s*\nchecked .*?(\d+) rows-only",
        doc,
        re.S,
    )
    assert m, "COVERAGE.md header counts sentence not found"
    got = tuple(int(x) for x in m.groups())
    want = (
        len(queries.QUERIES),
        len(queries.ORACLE),
        len(SHADOW_ORACLE),
        len(queries.QUERIES) - len(queries.ORACLE) - len(SHADOW_ORACLE),
    )
    assert got == want, f"COVERAGE.md says {got}, registry has {want}"


def test_shadow_shards_partition_registry():
    """VERDICT r8 #5: the shadow-oracle contract is runnable as N
    parallel pytest shards (separate Spark sessions) via deterministic
    markers. Guarantee: the shard assignment PARTITIONS SHADOW_ORACLE —
    every query lands in exactly one shard, every shard is non-empty,
    and the union is the whole registry — so running all N shard
    invocations is provably equivalent to the single full run."""
    from conftest import N_SHADOW_SHARDS, shadow_shard

    from hive_population_ml_spark import queries
    from hive_population_ml_spark.queries.registry import SHADOW_ORACLE

    queries.load_all()
    shards: dict[int, set] = {k: set() for k in range(N_SHADOW_SHARDS)}
    for name in SHADOW_ORACLE:
        k = shadow_shard(name)
        assert 0 <= k < N_SHADOW_SHARDS
        shards[k].add(name)
    union = set().union(*shards.values())
    assert union == set(SHADOW_ORACLE)
    assert sum(len(v) for v in shards.values()) == len(SHADOW_ORACLE)
    assert all(shards.values()), (
        f"empty shard(s): { [k for k, v in shards.items() if not v] } — "
        f"rebalance N_SHADOW_SHARDS"
    )
    # assignment is pure function of the name: stable across processes
    assert all(shadow_shard(n) == shadow_shard(str(n)) for n in union)


def test_no_never_driver_checked_shadows():
    """VERDICT r8 #2 structural fix: registration must not outpace the
    driver's 50-slot window. Every SQL-expressible query OUTSIDE the
    window (i.e. in SHADOW_ORACLE after rotation) must already hold a
    driver hash row from a past round (DRIVER_CHECKED_LEDGER, built
    from the union of CORRECTNESS_r1..r8 records). A new shadow-first
    registration fails here until it is rotated into the window — so a
    never-driver-checked backlog can no longer accumulate."""
    from hive_population_ml_spark import queries
    from hive_population_ml_spark.queries.registry import SHADOW_ORACLE

    queries.load_all()
    unchecked = sorted(
        set(SHADOW_ORACLE) - queries.DRIVER_CHECKED_LEDGER
    )
    assert not unchecked, (
        f"SQL-expressible queries never driver-hash-checked and not in "
        f"the current window: {unchecked}. Rotate them into "
        f"ROTATE_TO_ORACLE (ceding green incumbents) instead of "
        f"registering shadow-first."
    )


def test_sequence_dataset_mirrors_population_alignment(sensor, annotations):
    """use_sequences=True parity: the sequence dataset aligns the same
    (annotation, window) populations as the aggregate dataset, but
    materializes padded tensors instead of stats."""
    common = dict(
        key="hive_id", sensor_ts="timestamp", annot_key="hive_id",
        annot_date="eval_date", measures=["temperature", "humidity"],
        label_col="frames_of_bees", label_threshold=0.0,
        window_days=30, min_count=3,
    )
    agg = create_population_dataset(sensor, annotations, **common)
    seq = create_sequence_dataset(sensor, annotations, max_len=16, **common)
    assert {r["hive_id"] for r in seq.select("hive_id").collect()} == {
        r["hive_id"] for r in agg.select("hive_id").collect()
    }
    rows = seq.collect()
    assert all(len(r["seq"]) == 16 for r in rows)          # padded
    assert all(len(r["seq"][0]) == 2 for r in rows)        # 2 measures
    assert all(r["seq_len"] >= 3 for r in rows)            # min_count gate
    # n (stats bundle count) == seq_len where n <= max_len
    n_by_id = {r["hive_id"]: r["temperature_n"] for r in agg.collect()}
    for r in rows:
        assert r["seq_len"] == min(n_by_id[r["hive_id"]], 16)
    assert {r["label"] for r in rows} <= {0.0, 1.0}


def test_bench_final_line_stays_compact_at_live_registry_size():
    """BENCH_r04 AND BENCH_r07 came back "parsed": null because the
    driver captures only a ~2,000-char stdout tail and parses the LAST
    line: r4 folded the spread map in; r7's 82-query median map alone
    outgrew the buffer (VERDICT r7 #1). Pin the fix: render the actual
    final line via bench.final_line() with worst-case-width timings for
    EVERY live headline query and assert it stays under 1,800 bytes —
    O(1)-sized because it carries only the fixed 15-entry r01 map."""
    import inspect
    import json

    import bench

    timings = {name: 99999.999 for name in bench.HEADLINE}
    line = bench.final_line(
        timings, 0.1,
        calib={"numpy_sort_sec": 9999.9999, "spark_1p_sec": 9999.9999},
        cpus=128, default_parallelism=128,
    )
    assert len(line) < 1800, (
        f"bench final line would be {len(line)} bytes at the current "
        f"registry size ({len(bench.HEADLINE)} headline queries); it must "
        "stay under the driver's 2,000-char tail buffer — keep "
        "registry-sized maps on earlier stdout lines"
    )
    parsed = json.loads(line)
    # the computed r01-vs-BASELINE gate number (VERDICT r7 #6) and the
    # bounded per-query map: exactly the baseline set, nothing that
    # grows with the registry.
    assert parsed["r01_comparable_total"] == round(
        sum(timings[q] for q in bench.R01_BASELINE_QUERIES), 3
    )
    assert set(parsed["queries"]) == set(bench.R01_BASELINE_QUERIES)
    assert parsed["n_queries"] == len(bench.HEADLINE)
    # every baseline query must still be timed, else the gate number
    # silently under-counts.
    missing = set(bench.R01_BASELINE_QUERIES) - set(bench.HEADLINE)
    assert not missing, f"r01 baseline queries missing from HEADLINE: {missing}"
    src = inspect.getsource(bench.main)
    # spread and the full median map print on their own EARLIER lines
    final_print = src[src.rfind("print(") :]
    assert "spread" not in final_print and "queries_full" not in final_print
