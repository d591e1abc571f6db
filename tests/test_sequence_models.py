"""M6/M7 sequence-model path: Spark staging tested everywhere; the
torch loop itself is exercised only where torch exists (skip-marked —
this container has no torch; the scaffold is the documented capability
path for torch-equipped clusters)."""

import os

import pytest
from pyspark.sql import functions as F

from hive_population_ml_spark.ml.sequence import (
    SequenceModelSpec,
    stage_sequences,
    staged_summary,
    train_sequence_model,
)
from hive_population_ml_spark.operators.sequences import build_sequences

try:
    import torch  # noqa: F401

    HAS_TORCH = True
except ImportError:
    HAS_TORCH = False


def _staged(spark, tmp_path, num_shards=2):
    rows = [
        (k, t, float(k + t), float(t % 3))
        for k in range(20)
        for t in range(5 + k % 4)
    ]
    df = spark.createDataFrame(rows, "key int, ts int, v1 double, v2 double")
    seqs = build_sequences(
        df, ["key"], "ts", ["v1", "v2"], max_len=6, pad_to=6
    )
    labels = spark.createDataFrame(
        [(k, float(k) * 0.5) for k in range(20)], "key int, y double"
    )
    path = os.path.join(tmp_path, "staged")
    stage_sequences(seqs, labels, ["key"], "y", path, num_shards=num_shards)
    return path


def test_stage_sequences_shapes_and_shards(spark, tmp_path):
    path = _staged(spark, tmp_path, num_shards=3)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 3  # one shard per torch worker
    s = staged_summary(spark, path)
    assert s["rows"] == 20
    assert s["distinct_padded_lens"] == 1  # every seq padded to the same len
    assert s["padded_len"] == 6 and s["num_features"] == 2
    assert s["max_seq_len"] <= 6
    # labels joined, no row lost/duplicated
    df = spark.read.parquet(path)
    assert df.select("key").distinct().count() == 20
    assert df.filter(F.col("label").isNull()).count() == 0


def test_train_without_torch_raises_clear_error(spark, tmp_path):
    if HAS_TORCH:
        pytest.skip("torch present; covered by the training tests below")
    path = _staged(spark, tmp_path)
    with pytest.raises(ImportError, match="TorchDistributor"):
        train_sequence_model(
            spark, path, SequenceModelSpec(), os.path.join(tmp_path, "m.pt")
        )


@pytest.mark.skipif(not HAS_TORCH, reason="torch not installed in this runtime")
@pytest.mark.parametrize("model", ["lstm", "gru", "transformer"])
def test_sequence_model_one_epoch(spark, tmp_path, model):
    path = _staged(spark, tmp_path, num_shards=1)
    spec = SequenceModelSpec(
        model=model, hidden_dim=8, num_layers=1, max_epochs=1,
        batch_size=8, num_heads=2,
    )
    out = os.path.join(tmp_path, "m.pt")
    res = train_sequence_model(spark, path, spec, out)
    assert res["epochs_run"] == 1 and res["final_loss"] >= 0.0
    assert os.path.exists(out)
