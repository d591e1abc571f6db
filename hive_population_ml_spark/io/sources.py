"""Parquet sources for the driver's synthetic tables (TESTDATA.md).

Reference parity: the reference's sources are eager pandas CSV/Excel
scans with rename maps and positional parsing (``loader.py:56-99``,
``loader.py:125-178``). Here every source is a lazy columnar parquet
scan with column pruning + predicate pushdown for free; schema
normalization (rename, timestamp parsing, provenance columns) is
expressed as Catalyst projections.

Scale notes:
- Timestamps are normalized to TIMESTAMP_NTZ so semantics match the
  DuckDB oracle (UTC-naive) regardless of executor-local timezones.
- ``events.ts`` has been stored by different testdata generations as
  parquet TIMESTAMP(NANOS) (which Spark reads only as raw nanosecond
  longs under ``spark.sql.legacy.parquet.nanosAsLong``; we convert with
  integer division — identical floor semantics to DuckDB's truncation)
  and as TIMESTAMP(MICROS) (read natively). Loaders probe the raw dtype
  and normalize either way; never hardcode one (the streaming path once
  did and silently sheared all events into a single 1970 window).
- No schema inference in the hot path beyond the parquet footer; a
  100 TB table directory scan stays metadata-only until an action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Columns that must surface as TIMESTAMP_NTZ (UTC-naive) for oracle parity.
_TS_COLS = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one testdata table with normalized timestamp types."""
    tune(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos(long) -> micros(long) floor-division -> naive timestamp.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    for c in _TS_COLS.get(name, []):
        if dict(df.dtypes).get(c) not in (None, "timestamp_ntz"):
            df = df.withColumn(c, F.col(c).cast("timestamp_ntz"))
    return df


def scan_events_range(
    spark: SparkSession, sf_dir: str, lo: str, hi: str
) -> DataFrame:
    """Events scan with the time-range predicate applied to the RAW
    nanosecond long column, so it pushes down to parquet row-group
    min/max pruning — a filter on the derived timestamp column cannot
    (Catalyst will not invert timestamp_micros(ts div 1000)).

    At 100 TB the difference is reading the whole table vs only the
    row groups overlapping [lo, hi]. Bounds are UTC-naive strings.
    """
    from datetime import datetime, timezone

    def to_ns(s: str) -> int:
        dt = datetime.fromisoformat(s).replace(tzinfo=timezone.utc)
        return int(dt.timestamp()) * 1_000_000_000

    tune(spark)
    raw = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.filter(F.col("ts").between(to_ns(lo), to_ns(hi))).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    else:  # already a timestamp type: plain pushable between
        raw = raw.filter(F.col("ts").between(lo, hi))
    return raw


class Tables:
    """Lazy accessor: ``Tables(spark, sf_dir).lineitem`` → DataFrame."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_") or name not in TABLE_NAMES:
            raise AttributeError(name)
        return load_table(self._spark, self._sf_dir, name)


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register each table as a temp view for the SQL API."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
