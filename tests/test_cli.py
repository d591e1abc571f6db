"""CLI train/evaluate round-trip (SURVEY.md §3.1/§3.3 entry points)."""

import os
import tempfile

from hive_population_ml_spark.cli import main


def test_cli_train_then_evaluate(spark, sf_dir):
    with tempfile.TemporaryDirectory() as d:
        run = os.path.join(d, "run1")
        out = main(
            [
                "train",
                "--data-dir", sf_dir,
                "--output-dir", run,
                "--model", "gradient_boosting",
                "--task-type", "regression",
                "--window-days", "30",
                "--min-count", "1",
                "--seed", "42",
            ]
        )
        assert out["n"] > 0 and out["rmse"] > 0
        assert os.path.isdir(os.path.join(run, "model"))
        assert os.path.isdir(os.path.join(run, "results_json"))
        assert os.path.isdir(os.path.join(run, "predictions"))

        ev = main(
            [
                "evaluate",
                "--data-dir", sf_dir,
                "--output-dir", os.path.join(run, "eval"),
                "--model-dir", os.path.join(run, "model"),
                "--task-type", "regression",
                "--window-days", "30",
                "--min-count", "1",
            ]
        )
        # checkpoint-reload reproduces the training-time test metrics
        assert ev["n"] == out["n"]
        assert abs(ev["rmse"] - out["rmse"]) < 1e-9
