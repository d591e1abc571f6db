"""SparkSession construction and runtime tuning.

Design notes (100 TB posture):
- All tuning that affects *correctness vs the DuckDB oracle* (session
  timezone, nanos handling) is applied at runtime via ``tune`` so it
  also takes effect on a SparkSession handed to us by the driver.
- AQE is on: runtime shuffle-partition coalescing, skew-join splitting
  and dynamic join strategy changes replace hand-tuned partition
  counts when the same plan runs at 1000x the data.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are runtime-settable and required for oracle-consistent
# semantics. Applied idempotently before every query.
RUNTIME_CONFS: dict[str, str] = {
    # DuckDB timestamps are UTC-naive; pin Spark's session tz so
    # instant<->naive conversions are the identity.
    "spark.sql.session.timeZone": "UTC",
    # testdata events.parquet stores ts as parquet TIMESTAMP(NANOS,false),
    # which Spark's vectorized reader rejects unless read as raw longs
    # (converted back to timestamps in io.sources.load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Adaptive execution: coalesce small shuffle partitions, split skewed
    # ones, switch SMJ->BHJ when runtime stats allow.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas-UDF path (extension operators).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # InferFiltersFromGenerate duplicates the full generator expression
    # into a pre-Generate Filter; for higher-order-function generators
    # (shingling) that filter re-evaluates the array build per row OFF
    # the codegen path — measured 10x slower than the same plan without
    # the inferred filter. The rule only prunes empty-generate rows,
    # which our explode already skips.
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs idempotently (safe on driver-owned sessions)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            # Non-runtime-settable in some build: best effort.
            pass
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable inside executor Python workers.

    mapInPandas closures do ``from . import codecs``-style imports that
    the WORKER resolves, not the driver. Local-mode workers inherit the
    driver's cwd, which hides a missing deployment until the driver
    runs from another directory (driver-sim from /tmp reproduced the
    ModuleNotFoundError). The cluster-correct mechanism is shipping the
    package with the job — ``sc.addPyFile`` of a package zip, exactly
    what spark-submit --py-files does on a real cluster. Idempotent per
    SparkContext; the zip is rebuilt keyed on source mtimes so an
    edited module re-ships in long-lived test sessions.
    """
    import hashlib
    import pathlib
    import zipfile

    sc = spark.sparkContext
    pkg_dir = pathlib.Path(__file__).resolve().parent
    sources = sorted(pkg_dir.rglob("*.py"))
    # sha1, not hash(): str hashing is salted per process, which would
    # mint a new zip name every run and litter /tmp
    digest = hashlib.sha1()
    for p in sources:
        digest.update(f"{p}:{p.stat().st_mtime_ns}\n".encode())
    zip_path = pathlib.Path(
        f"/tmp/{pkg_dir.name}_pkg_{digest.hexdigest()[:12]}.zip"
    )
    shipped = getattr(sc, "_hpml_shipped", None)
    if shipped == zip_path.name:
        return
    if not zip_path.exists():
        # pid-unique tmp: concurrent processes (parallel pytest shards on
        # a fresh /tmp) each build their own tmp file and atomically
        # rename; identical content makes last-writer-wins harmless. A
        # SHARED tmp name raced here — the first replace() consumed the
        # tmp out from under every other process's rename.
        tmp = zip_path.with_suffix(f".zip.tmp.{os.getpid()}")
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for p in sources:
                zf.write(p, arcname=f"{pkg_dir.name}/{p.relative_to(pkg_dir)}")
        tmp.replace(zip_path)
    try:
        sc.addPyFile(str(zip_path))
        sc._hpml_shipped = zip_path.name
    except Exception:
        # Same-name re-add on a reused context: already shipped.
        sc._hpml_shipped = zip_path.name


def get_spark(
    app_name: str = "hive-population-ml-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a local SparkSession sized for this container.

    On a real cluster the master/memory settings come from
    spark-submit; only the SQL confs below matter there.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark)
