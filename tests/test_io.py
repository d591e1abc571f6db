"""Source-adapter and sink tests — SURVEY.md §2.1 S1–S9."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_population_ml_spark.io import (
    csv_scan,
    excel_scan,
    lookup_map_df,
    read_metrics_json,
    read_predictions,
    records_to_df,
    save_model,
    load_model,
    write_metrics_json,
    write_predictions,
)

CSV = (
    "published_at,tag_number,temperature,bad\n"
    "2024-01-01 00:00:00,202056,33.5,x\n"
    "2024-01-01 00:15:00,202056,not_a_number,y\n"
    "2024-01-01 00:30:00,202057,31.0,z\n"
)

SCHEMA = T.StructType(
    [
        T.StructField("published_at", T.StringType()),
        T.StructField("tag_number", T.LongType()),
        T.StructField("temperature", T.DoubleType()),
        T.StructField("bad", T.StringType()),
    ]
)


def test_csv_scan_schema_rename_ts_provenance(spark):
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "sensor.csv")
        with open(p, "w") as f:
            f.write(CSV)
        df = csv_scan(
            spark,
            p,
            SCHEMA,
            rename={"published_at": "timestamp", "tag_number": "hive_id"},
            ts_cols=["timestamp"],
            provenance={"period": "D1"},
        )
        rows = df.orderBy("timestamp").collect()
        assert df.columns == ["timestamp", "hive_id", "temperature", "bad", "period"]
        assert rows[0]["hive_id"] == 202056 and rows[0]["period"] == "D1"
        # malformed numeric -> null (reference _safe_float semantics)
        assert rows[1]["temperature"] is None
        assert str(dict(df.dtypes)["timestamp"]) == "timestamp_ntz"


def test_records_and_lookup_join(spark):
    recs = records_to_df(
        spark,
        [{"hive_id": "2056", "fob": 21.0}, {"hive_id": "2057", "fob": 12.0}],
        "hive_id string, fob double",
    )
    lk = lookup_map_df(
        spark, [("202056", "2056"), ("202057", "2057")], "sensor_id", "hive_id"
    )
    joined = lk.join(F.broadcast(recs), "hive_id").orderBy("sensor_id").collect()
    assert [r["fob"] for r in joined] == [21.0, 12.0]


def test_excel_scan_null_on_error_cast(spark, tmp_path):
    """excel_scan runs on the stdlib xlsx_lite reader (no openpyxl) and
    casts with _safe_float semantics: bad cells -> null, not errors."""
    from hive_population_ml_spark.io.xlsx_lite import write_xlsx

    p = os.path.join(tmp_path, "w.xlsx")
    write_xlsx(p, {"S": [["h1", "h2"], [2056, "oops"], ["x", 3.5]]})
    rows = excel_scan(spark, p, sheet="S", schema="a int, b double").collect()
    assert (rows[0]["a"], rows[0]["b"]) == (2056, None)
    assert (rows[1]["a"], rows[1]["b"]) == (None, 3.5)


def test_metrics_json_roundtrip(spark):
    m = spark.createDataFrame([(0.837, 0.881)], "accuracy double, f1 double")
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "results_json")
        write_metrics_json(m, p)
        back = read_metrics_json(spark, p).first()
        assert back["accuracy"] == 0.837 and back["f1"] == 0.881


def test_predictions_parquet_roundtrip(spark):
    preds = spark.createDataFrame(
        [(1, 1.0, 0.9, "test"), (2, 0.0, 0.2, "test"), (3, 1.0, 0.7, "val")],
        "id long, y_pred double, y_prob double, split string",
    )
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "preds")
        write_predictions(preds, p, partition_by="split")
        back = read_predictions(spark, p)
        assert back.count() == 3
        # partition pruning works on the partition column
        assert back.filter(F.col("split") == "val").count() == 1


def test_model_checkpoint_roundtrip(spark, sf_dir):
    from pyspark.ml import Pipeline, PipelineModel
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    from hive_population_ml_spark.io import Tables

    df = (
        Tables(spark, sf_dir)
        .orders.select(
            F.col("o_totalprice").alias("label"),
            (F.col("o_orderkey") % 100).cast("double").alias("f1"),
        )
        .limit(200)
    )
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=["f1"], outputCol="features"),
            LinearRegression(maxIter=5),
        ]
    )
    model = pipe.fit(df)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "model")
        save_model(model, p)
        back = load_model(PipelineModel, p)
        a = model.transform(df).select(F.sum("prediction")).first()[0]
        b = back.transform(df).select(F.sum("prediction")).first()[0]
        assert abs(a - b) < 1e-9


def test_class_weighted_classifier_and_auc(spark, sf_dir):
    """M9 weightCol + M15 AUC: inverse-frequency weights (A11) feed an
    MLlib classifier; BinaryClassificationEvaluator computes AUC."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler
    from pyspark.sql import Window

    from hive_population_ml_spark.io import Tables

    df = Tables(spark, sf_dir).orders.select(
        (F.col("o_totalprice") >= 250000).cast("double").alias("label"),
        (F.col("o_orderkey") % 97).cast("double").alias("f1"),
        F.col("o_totalprice").alias("f2"),
    )
    counts = df.groupBy("label").agg(F.count("*").alias("n_c"))
    inv = counts.withColumn("inv", 1.0 / F.col("n_c"))
    tot = inv.select(F.sum("inv").alias("z"))
    weights = inv.crossJoin(tot).select(
        "label", (F.col("inv") / F.col("z")).alias("weight")
    )
    data = VectorAssembler(inputCols=["f1", "f2"], outputCol="features").transform(
        df.join(F.broadcast(weights), "label")
    )
    model = LogisticRegression(weightCol="weight", maxIter=10).fit(data)
    scored = model.transform(data)
    auc = BinaryClassificationEvaluator(metricName="areaUnderROC").evaluate(scored)
    assert 0.5 <= auc <= 1.0


def test_jsonl_corpus_roundtrip_and_corrupt_capture(spark, sf_dir, tmp_path):
    """JSONL is the LLM-corpus interchange format: gzip roundtrip
    preserves every row; malformed lines land in the corrupt column
    (job never fails) with parsed fields null; schema is explicit so
    no inference pass runs."""
    from hive_population_ml_spark.io.adapters import (
        jsonl_corpus_scan,
        write_jsonl_corpus,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "corpus_jsonl")
    write_jsonl_corpus(docs.coalesce(2), out, compression="gzip")
    import glob

    assert glob.glob(f"{out}/*.json.gz"), "expected gzip shards"
    back = jsonl_corpus_scan(spark, out)
    back_rows = back.collect()
    # Catalyst prunes a count() down to the corrupt column alone, which
    # Spark rejects on raw JSON (see the adapter docstring) — assert
    # over the collected rows instead
    assert all(r["_corrupt_record"] is None for r in back_rows)
    a = sorted(
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in back_rows
    )
    b = sorted(
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in docs.collect()
    )
    assert a == b

    # corrupt lines: quarantine, don't fail
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "shard0.jsonl").write_text(
        '{"doc_id": 1, "text": "ok doc", "lang": "en", '
        '"source": "s", "n_chars": 6}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "another", "lang": "en", '
        '"source": "s", "n_chars": 7}\n'
    )
    scanned = jsonl_corpus_scan(spark, str(bad))
    rows = scanned.collect()
    assert len(rows) == 3
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(corrupt) == 1
    assert corrupt[0]["doc_id"] is None  # parsed fields null on bad lines
    assert "not json" in corrupt[0]["_corrupt_record"]
    good_ids = {r["doc_id"] for r in rows if r["_corrupt_record"] is None}
    assert good_ids == {1, 2}


def test_orc_roundtrip_pushdown_and_partitioning(spark, sf_dir, tmp_path):
    """ORC scan/sink parity with the parquet path: zstd roundtrip
    preserves every row; a filtered read shows PushedFilters on the
    ORC scan (format-agnostic pushdown); partitionBy produces prunable
    directories."""
    from hive_population_ml_spark.io.adapters import orc_scan, write_orc

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "corpus_orc")
    write_orc(docs.coalesce(2), out)
    import glob

    assert glob.glob(f"{out}/*.orc"), "expected orc shards"
    back = orc_scan(spark, out)
    a = sorted(map(tuple, back.collect()))
    b = sorted(map(tuple, docs.collect()))
    assert a == b

    filtered = back.filter(F.col("doc_id") == 7).select("doc_id", "lang")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "doc_id" in plan.split(
        "PushedFilters"
    )[1][:120], f"no ORC filter pushdown:\n{plan[:1500]}"
    assert filtered.count() == 1

    # directory partitioning -> partition pruning on lang
    part = str(tmp_path / "corpus_orc_part")
    write_orc(docs, part, partition_by="lang")
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert glob.glob(f"{part}/lang=*"), "expected lang= directories"
    one = orc_scan(spark, part).filter(F.col("lang") == sorted(langs)[0])
    pplan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in pplan
    n_one = one.count()
    n_all = orc_scan(spark, part).count()
    assert 0 < n_one < n_all
