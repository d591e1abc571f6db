"""Reference lifecycle end-to-end through the EXCEL path (VERDICT r3
#5): the SURVEY.md §3.1 chain on MSPB-shaped data —

  S3  Evaluation-sheet scans (serial-DATED workbook: cells are real
      Excel date serials with 1900-epoch styles, not strings)
  J2  phenotypic sheet with zero-padded string hive ids normalized to
      the int key space
  J1  interval join attaching each (hive, date) annotation to its +/-3
      day sensor window
  A1  windowed stats bundle -> per-(hive, date) feature row
  M4  leakage-safe group split on hive_id (hash buckets, no join)
  M5  impute -> assemble -> scale -> MLP classifier (fit on train only)
  M15 confusion-matrix classification metrics on the held-out split

complementing tests/test_golden_e2e.py, which runs the same lifecycle
on TPC-H-shaped testdata with a GBT head. Sensor values are a
deterministic function of the label, so the assertions pin learnable
signal flow through every stage, plus seed reproducibility.
"""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from hive_population_ml_spark.io.annotations import (
    phenotypic_measurements,
    population_annotations,
)
from hive_population_ml_spark.io.xlsx_lite import write_xlsx
from hive_population_ml_spark.ml.pipeline import feature_pipeline, mlp_classifier
from hive_population_ml_spark.ml.splits import with_split_column
from hive_population_ml_spark.operators.interval_join import interval_join
from hive_population_ml_spark.operators.stats_bundle import stats_bundle

HIVES = list(range(3001, 3025))
EVAL_DATES = [dt.datetime(2020, 6, 1), dt.datetime(2020, 7, 1)]
BOX_COLS = ["Brood Chamber 1", "Brood chamber 2", "Honey supper 1",
            "Honey supper 2", "Honey supper 3", "Honey supper 4"]


def _frames(hive: int, month: int) -> int:
    """Ground-truth frames of bees: deterministic, spans 4..12."""
    return 4 + (hive % 8) + (month - 6)


def _mspb_workbook(path: str) -> None:
    """D1-shaped workbook with REAL date serials in the Dates column
    (write_xlsx styles datetime cells as 1900-epoch serials, which
    population_annotations must decode back — S3 + date-serial path)."""
    hdr = ["Dates", "Yard", "Hive ID", "Number of boxes", *BOX_COLS]
    sheets = {}
    for i, d in enumerate(EVAL_DATES, start=1):
        rows = [hdr]
        for h in HIVES:
            fr = _frames(h, d.month)
            boxes = [min(fr, 9), max(fr - 9, 0) or None, None, None, None, None]
            rows.append([d, "North" if h % 2 else "South", h, 2, *boxes])
        sheets[f"Evaluation {i}"] = rows
    # J2-shaped phenotypic sheet: zero-padded STRING hive ids.
    prows = [["cat"] * 21, ["name"] * 21]
    for h in HIVES:
        row = [None] * 21
        row[1] = "North" if h % 2 else "South"
        row[3] = f"0{h}"
        row[8], row[10] = float(h % 5), float(h % 3)  # varroa may/aug
        row[20] = 10.0 + (h % 7)  # honey yield
        prows.append(row)
    sheets["Phenotypic measurements"] = prows
    write_xlsx(path, sheets)


def _sensor(spark):
    """Deterministic sensor readings every 6h in a +/-2-day window
    around each evaluation date; the audio measure encodes the label
    (frames*10) plus a small deterministic ripple."""
    rows = []
    for h in HIVES:
        for d in EVAL_DATES:
            fr = _frames(h, d.month)
            for step in range(-8, 9):
                ts = d + dt.timedelta(hours=6 * step)
                ripple = ((h * 31 + step) % 7) - 3.0
                rows.append((h, ts, fr * 10.0 + ripple, float(step % 4)))
    return spark.createDataFrame(
        rows, "hive_id int, ts timestamp_ntz, audio_power double, temp double"
    )


@pytest.fixture(scope="module")
def lifecycle(spark, tmp_path_factory):
    path = os.path.join(tmp_path_factory.mktemp("mspb"), "D1_mspb.xlsx")
    _mspb_workbook(path)

    pop = population_annotations(spark, path)  # S3 (serial dates)
    pheno = phenotypic_measurements(spark, path)  # S3 + J2 id normalize
    sensor = _sensor(spark)

    joined = interval_join(  # J1: sensor rows -> containing window
        sensor, pop, on=[("hive_id", "hive_id")],
        fact_ts="ts", dim_ts="date", before=3, after=3,
    ).select(
        F.col("f.hive_id").alias("hive_id"), "date", "frames_of_bees",
        "audio_power", "temp",
    )
    feats = stats_bundle(  # A1: per-(hive, date) feature row
        joined, ["hive_id", "date", "frames_of_bees"],
        ["audio_power", "temp"], ["avg", "std", "min", "max"],
    ).join(  # J4: label/trait attach from the phenotypic table
        F.broadcast(pheno.select("hive_id", "varroa_avg", "honey_yield_kg")),
        "hive_id",
    )
    labeled = feats.withColumn(
        "label", (F.col("frames_of_bees") >= 8).cast("double")
    )
    split = with_split_column(  # M4: leakage-safe hash split on hive
        labeled, "hive_id", weights=(0.6, 0.0, 0.4), seed=7
    ).cache()
    return path, pop, pheno, split


def test_excel_annotations_decode_serial_dates(lifecycle):
    _, pop, pheno, _ = lifecycle
    rows = pop.collect()
    assert len(rows) == len(HIVES) * len(EVAL_DATES)
    assert {r["date"] for r in rows} == set(EVAL_DATES)
    for r in rows:
        assert r["frames_of_bees"] == _frames(r["hive_id"], r["date"].month)
    # J2: "03001"-style ids landed in the int key space
    ids = {r["hive_id"] for r in pheno.collect()}
    assert ids == set(HIVES)


def test_lifecycle_split_has_no_hive_leakage(lifecycle):
    _, _, _, split = lifecycle
    tr = {r[0] for r in split.filter("split = 'train'")
          .select("hive_id").distinct().collect()}
    te = {r[0] for r in split.filter("split = 'test'")
          .select("hive_id").distinct().collect()}
    assert tr and te and not (tr & te)
    # every feature row kept exactly one split tag
    assert split.count() == len(HIVES) * len(EVAL_DATES)


def _fit_and_score(split):
    feature_cols = [
        "audio_power_avg", "audio_power_std", "audio_power_min",
        "audio_power_max", "temp_avg", "varroa_avg", "honey_yield_kg",
    ]
    train = split.filter("split = 'train'")
    test = split.filter("split = 'test'")
    pipe = feature_pipeline(feature_cols).fit(train)  # M1/M2 on train only
    mlp = mlp_classifier(
        n_features=len(feature_cols), n_classes=2, hidden=(8,), seed=7
    ).fit(pipe.transform(train))
    scored = mlp.transform(pipe.transform(test))
    yt, yp = F.col("label"), F.col("prediction")
    return scored.agg(  # M15: confusion cells + accuracy, one agg
        F.count("*").alias("n"),
        F.avg((yt == yp).cast("int")).alias("accuracy"),
        F.sum(((yt == 1) & (yp == 1)).cast("int")).alias("n_tp"),
        F.sum(((yt == 0) & (yp == 0)).cast("int")).alias("n_tn"),
        F.sum(((yt == 0) & (yp == 1)).cast("int")).alias("n_fp"),
        F.sum(((yt == 1) & (yp == 0)).cast("int")).alias("n_fn"),
    ).collect()[0]


def test_lifecycle_mlp_learns_and_reproduces(lifecycle):
    _, _, _, split = lifecycle
    m1 = _fit_and_score(split)
    assert m1["n"] == split.filter("split = 'test'").count() > 0
    assert m1["n_tp"] + m1["n_tn"] + m1["n_fp"] + m1["n_fn"] == m1["n"]
    # audio_power_avg ~ frames*10: the signal is learnable, so the MLP
    # must beat chance decisively on held-out hives
    assert m1["accuracy"] >= 0.8, f"accuracy {m1['accuracy']}"
    m2 = _fit_and_score(split)  # seeded -> bit-identical metrics
    assert m1 == m2
