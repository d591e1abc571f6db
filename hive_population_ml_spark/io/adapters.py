"""Edge-ingestion adapters: CSV with explicit schema, Excel workbooks,
and record batches → Spark DataFrames (SURVEY.md §2.1 S1–S6).

The reference's sources are eager pandas scans:
- CSV sensor files with timestamp parsing and a rename map
  (reference ``src/data/loader.py:56-99``).
- Excel annotation workbooks parsed positionally per sheet
  (``loader.py:125-178``, ``loader.py:197-249``, ``loader.py:275-293``)
  and an ID lookup sheet → dict (``loader.py:298-324``).

Engine policy (SURVEY.md §7.5): Excel is an *edge* format — parsed once
on the driver into rows, then handed to Spark as a (usually broadcast)
DataFrame or pre-converted to Parquet. Nothing downstream ever touches
Excel again, so the 100 TB path stays columnar. CSV, by contrast, is a
first-class distributed scan with an explicit schema — no inference in
the hot path.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import tune


def csv_scan(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    rename: Mapping[str, str] | None = None,
    ts_cols: Sequence[str] = (),
    ts_format: str | None = None,
    provenance: Mapping[str, str] | None = None,
    header: bool = True,
) -> DataFrame:
    """S1/S2: distributed CSV scan with declared schema + normalization.

    Mirrors the reference loader's rename map and timestamp parsing
    (loader.py:24-33,76,94) as Catalyst projections. ``provenance``
    appends literal columns (e.g. period='D1') like loader.py:77,86.
    Explicit schema means malformed cells become nulls (PERMISSIVE),
    matching the reference's ``_safe_float`` null-on-error semantics.
    """
    tune(spark)
    df = spark.read.schema(schema).option("header", header).csv(path)
    for old, new in (rename or {}).items():
        df = df.withColumnRenamed(old, new)
    for c in ts_cols:
        col = F.to_timestamp(F.col(c), ts_format) if ts_format else F.to_timestamp(c)
        df = df.withColumn(c, col.cast("timestamp_ntz"))
    for name, value in (provenance or {}).items():
        df = df.withColumn(name, F.lit(value))
    return df


def records_to_df(
    spark: SparkSession,
    records: Iterable[Mapping[str, object]],
    schema: T.StructType | str,
) -> DataFrame:
    """Driver-side record batch → DataFrame (the hand-off point every
    Excel-ish edge parser funnels through). Small by construction —
    callers broadcast it into joins (S6 lookup-table pattern)."""
    return spark.createDataFrame(list(records), schema=schema)


def excel_scan(
    spark: SparkSession,
    path: str,
    sheet: str | int = 0,
    schema: T.StructType | str | None = None,
    header_rows: int = 1,
    column_map: Mapping[int, str] | None = None,
) -> DataFrame:
    """S3–S5: Excel sheet → DataFrame via a driver-side parse.

    ``column_map`` selects columns positionally (index → name), the way
    the reference parses annotation sheets by iloc (loader.py:137-165,
    227-245). Parsing uses the stdlib :mod:`.xlsx_lite` reader — no
    openpyxl dependency; executors never touch Excel.

    Cells arrive untyped; every value is stringified and cast to the
    declared ``schema`` with null-on-error semantics (``try_cast``),
    matching the reference's ``_safe_float`` behavior (loader.py:19-25)
    and the PERMISSIVE CSV path. Integer targets route through double so
    Excel's float rendering of ints ("2056.0") still lands.
    """
    from .xlsx_lite import read_sheet

    rows = read_sheet(path, sheet)[header_rows:]
    target = (
        T.StructType.fromDDL(schema)
        if isinstance(schema, str)
        else schema
    )
    if column_map:
        idxs, names = list(column_map), list(column_map.values())
    elif target is not None:
        # no map: schema fields bind positionally, left to right
        idxs = list(range(len(target.fields)))
        names = [f.name for f in target.fields]
    else:
        width = max((len(r) for r in rows), default=0)
        idxs, names = list(range(width)), [f"c{i}" for i in range(width)]

    def _s(v: object) -> str | None:
        if v is None:
            return None
        if isinstance(v, float) and v.is_integer():
            return str(int(v))  # 2056.0 -> "2056": lossless for ids
        return str(v)

    data = [tuple(_s(r[i]) if i < len(r) else None for i in idxs) for r in rows]
    df = spark.createDataFrame(
        data, schema=T.StructType([T.StructField(n, T.StringType()) for n in names])
    )
    if target is None:
        return df
    cols = []
    for f in target.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, (T.IntegerType, T.LongType, T.ShortType)):
            c = c.try_cast("double").try_cast(f.dataType)
        elif not isinstance(f.dataType, T.StringType):
            c = c.try_cast(f.dataType)
        cols.append(c.alias(f.name))
    return df.select(*cols)


def lookup_map_df(
    spark: SparkSession,
    pairs: Iterable[tuple[object, object]],
    key_name: str = "key",
    value_name: str = "value",
) -> DataFrame:
    """S6: ID lookup table as a broadcastable two-column DataFrame —
    replaces the reference's python dict sensor_id→annotation_id
    (loader.py:298-324); joins stay on the executors."""
    return spark.createDataFrame(
        [(k, v) for k, v in pairs], schema=f"{key_name} string, {value_name} string"
    )


DOCUMENTS_JSONL_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def jsonl_corpus_scan(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_JSONL_SCHEMA,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Distributed JSONL corpus scan — the standard LLM training-data
    interchange format (one JSON document per line, optionally
    ``.gz``/``.zst``-sharded; Spark decompresses supported codecs per
    file transparently).

    Two 100 TB rules enforced here:

    - EXPLICIT schema, never inference: schema inference is a full
      extra pass over the corpus before the first real job. Same
      policy as ``csv_scan``.
    - PERMISSIVE parsing with a corrupt-record column: real crawl
      shards contain malformed lines, and failing the whole job on one
      is not an option. Bad lines land whole in ``corrupt_col`` (other
      fields null) so a downstream filter can count/quarantine them;
      drop the column after triage. Spark caveat: a query referencing
      ONLY the corrupt column is rejected
      (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — select
      at least one data column alongside it (or cache the scan) when
      counting bad lines.
    """
    tune(spark)
    full = f"{schema}, {corrupt_col} string"
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def write_jsonl_corpus(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
) -> None:
    """Write a corpus as (optionally compressed) JSONL shards — one
    file per partition, so shard count/size is controlled upstream by
    ``repartition``/``coalesce`` (or ``skew.compact_parquet``'s sizing
    policy applied before the write)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def orc_scan(spark: SparkSession, path: str) -> DataFrame:
    """Columnar ORC scan (the Hive-ecosystem sibling of parquet; the
    format a warehouse-resident corpus often already sits in). Spark's
    native vectorized ORC reader gives the same predicate-pushdown /
    column-pruning / partition-pruning behavior as the parquet path —
    `.explain` shows PushedFilters on this scan exactly as on parquet —
    so downstream operators are format-agnostic. Schema comes from ORC
    file metadata (embedded, like parquet), so no inference pass."""
    tune(spark)
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: str | None = None,
    compression: str = "zstd",
) -> None:
    """Write ORC shards (zstd default — the modern space/speed point;
    snappy for read-heavy compatibility). Same sizing policy as the
    parquet writers: shard count is controlled upstream by
    repartition/coalesce, directory-partitioned by ``partition_by``
    for downstream partition pruning."""
    w = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.orc(path)
