"""Reference-parity annotation-workbook loaders (S3–S5).

Each function mirrors one positional-parse loader in the reference
(``src/data/loader.py``), re-expressed as: driver-side sheet parse
(:func:`.adapters.excel_scan` over :mod:`.xlsx_lite`) → Catalyst
expressions for every row-level rule (null guards, horizontal sums,
id normalization, null-aware averages). The workbooks are tiny edge
inputs; everything after the parse is a distributed DataFrame that
joins/broadcasts into the 100 TB pipeline.

- :func:`population_annotations` ⇔ load_population_annotations
  (loader.py:102-178): per-"Evaluation*" sheet, cols 0-3 = date/yard/
  hive/boxes, cols 4-9 = per-box frame counts; total = null-skipping
  horizontal sum; rows without date or hive id — or with zero total —
  are dropped.
- :func:`phenotypic_measurements` ⇔ load_phenotypic_measurements
  (loader.py:181-262): fixed column positions after 2 header rows,
  "02056"-style ids normalized to ints, trait pairs averaged
  null-aware (pandas ``mean(axis=1)`` ⇒ :func:`rowwise_mean`).
- :func:`winter_mortality` ⇔ load_winter_mortality (loader.py:265-296):
  header-NAME-based selection (the one sheet with real headers);
  survived ⇔ mortality cause is null.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rowwise import rowwise_mean, rowwise_sum
from .adapters import excel_scan
from .xlsx_lite import read_sheet, sheet_names

_BOXES = [f"box{i}" for i in range(1, 7)]


def population_annotations(spark: SparkSession, path: str) -> DataFrame:
    """Frames-of-bees per (hive, date) from every "Evaluation*" sheet."""
    cmap = {0: "date", 1: "yard", 2: "hive_id", 3: "n_boxes"}
    cmap.update({i + 4: b for i, b in enumerate(_BOXES)})
    ddl = (
        "date timestamp_ntz, yard string, hive_id int, n_boxes int, "
        + ", ".join(f"{b} double" for b in _BOXES)
    )
    parts = [
        excel_scan(
            spark, path, sheet=s, schema=ddl, header_rows=1, column_map=cmap
        ).withColumn("evaluation", F.lit(s))
        for s in sheet_names(path)
        if s.startswith("Evaluation")
    ]
    if not parts:
        raise ValueError(f"no Evaluation* sheets in {path}")
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return (
        df.filter(F.col("date").isNotNull() & F.col("hive_id").isNotNull())
        .withColumn("frames_of_bees", rowwise_sum(_BOXES))
        .filter(F.col("frames_of_bees") > 0)
        .select(
            "hive_id",
            "date",
            "frames_of_bees",
            F.coalesce(F.trim("yard"), F.lit("Unknown")).alias("apiary"),
            "evaluation",
        )
    )


def phenotypic_measurements(spark: SparkSession, path: str) -> DataFrame:
    """Brood / varroa / behavior / honey traits, one row per hive."""
    cmap = {
        1: "apiary",
        3: "hive_id",
        4: "capped_brood",
        5: "uncapped_brood",
        6: "total_brood",
        8: "varroa_may",
        10: "varroa_aug",
        12: "defensive_1",
        14: "defensive_2",
        16: "hygienic_1",
        18: "hygienic_2",
        20: "honey_yield_kg",
    }
    ddl = "apiary string, hive_id string, " + ", ".join(
        f"{n} double" for n in list(cmap.values())[2:]
    )
    df = excel_scan(
        spark,
        path,
        sheet="Phenotypic measurements",
        schema=ddl,
        header_rows=2,
        column_map=cmap,
    )
    return (
        # "02056" -> 2056 (loader.py:222-226): strip leading zeros, int cast
        df.withColumn(
            "hive_id",
            F.regexp_replace("hive_id", r"^0+", "").try_cast("double").try_cast("int"),
        )
        .filter(F.col("hive_id").isNotNull())
        .withColumn("varroa_avg", rowwise_mean(["varroa_may", "varroa_aug"]))
        .withColumn("defensive_avg", rowwise_mean(["defensive_1", "defensive_2"]))
        .withColumn("hygienic_avg", rowwise_mean(["hygienic_1", "hygienic_2"]))
    )


def winter_mortality(spark: SparkSession, path: str, sheet: str = "Sheet1") -> DataFrame:
    """Winter survival per hive; selection by header NAME, not position."""
    header = read_sheet(path, sheet)[0]
    pos = {str(v).strip(): i for i, v in enumerate(header) if v is not None}
    wanted = {
        "Hive ID": ("hive_id", "int"),
        "Apiary": ("apiary", "string"),
        "Mortality cause": ("mortality_cause", "string"),
        "weight (kg) Nov 4 2020": ("weight_before_kg", "double"),
        "weight (kg) Apr 5 2021": ("weight_after_kg", "double"),
        "winter syrup consuption (kg)": ("syrup_consumption_kg", "double"),
        "Bees frames Oct 20": ("frames_before", "double"),
        "Bees frames Apr 2021": ("frames_after", "double"),
    }
    missing = [h for h in wanted if h not in pos]
    if missing:
        raise ValueError(f"missing headers in {sheet!r}: {missing}")
    cmap = {pos[h]: name for h, (name, _) in wanted.items()}
    ddl = ", ".join(f"{name} {typ}" for name, typ in wanted.values())
    df = excel_scan(
        spark, path, sheet=sheet, schema=ddl, header_rows=1, column_map=cmap
    )
    return df.withColumn("survived", F.col("mortality_cause").isNull()).select(
        "hive_id",
        "apiary",
        "survived",
        "mortality_cause",
        "weight_before_kg",
        "weight_after_kg",
        "syrup_consumption_kg",
        "frames_before",
        "frames_after",
    )


def hive_id_mapping(spark: SparkSession, path: str) -> DataFrame:
    """Sensor-id → annotation-id lookup from the "ID lookup table"
    sheet (⇔ get_hive_id_mapping, loader.py:298-324): header-named
    columns, rows with either id missing dropped. Returned as the S6
    broadcastable two-column DataFrame instead of a driver dict, so
    the id-normalization join runs on executors."""
    header = read_sheet(path, "ID lookup table")[0]
    pos = {str(v).strip(): i for i, v in enumerate(header) if v is not None}
    for h in ("Colony number Nectar", "Colony number CRSAD"):
        if h not in pos:
            raise ValueError(f"missing header {h!r} in ID lookup table")
    cmap = {
        pos["Colony number Nectar"]: "sensor_id",
        pos["Colony number CRSAD"]: "annotation_id",
    }
    df = excel_scan(
        spark, path, sheet="ID lookup table",
        schema="sensor_id int, annotation_id int",
        header_rows=1, column_map=cmap,
    )
    return df.filter(
        F.col("sensor_id").isNotNull() & F.col("annotation_id").isNotNull()
    )
