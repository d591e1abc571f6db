"""Result/model sinks — SURVEY.md §2.1 S7–S9.

Reference behavior:
- S7 ``results.json``/``config.json`` dicts with numpy coercion
  (``scripts/train.py:206-208,285-296``).
- S8 torch checkpoint save/load of best model state
  (``src/training/trainer.py:322-349``).
- S9 ``.npz`` dump of y_true/y_pred/y_prob (``scripts/evaluate.py:266-273``).

Spark-native forms: metrics are a one-row DataFrame written as JSON
(no numpy coercion needed — values are already JVM types); models are
MLlib ``PipelineModel.save`` directories (parquet + metadata, readable
cluster-wide); predictions are a parquet table partitioned however the
consumer reads them. All three are driver-light: nothing funnels
through ``collect()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_metrics_json(metrics: DataFrame, path: str) -> None:
    """S7: metrics/config record(s) → JSON lines directory. Callers pass
    the one-row aggregate DataFrame straight from the evaluator query —
    the write is the only action."""
    metrics.coalesce(1).write.mode("overwrite").json(path)


def read_metrics_json(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.json(path)


def save_model(model, path: str) -> None:
    """S8: MLlib model/pipeline checkpoint (parquet + metadata). The
    reference keeps 'best' by early stopping; MLlib callers overwrite
    the same path with the selected model."""
    model.write().overwrite().save(path)


def load_model(cls, path: str):
    """Load with the matching model class (e.g. ``PipelineModel``,
    ``GBTRegressionModel``) — MLlib persists the class name in metadata
    but loading is explicit-class, mirroring torch.load into a known
    architecture (trainer.py:340-349)."""
    return cls.load(path)


def write_predictions(preds: DataFrame, path: str, partition_by: str | None = None) -> None:
    """S9: predictions table → parquet (columnar replacement for the
    reference's npz arrays; schema travels with the data)."""
    w = preds.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(path)


def read_predictions(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
