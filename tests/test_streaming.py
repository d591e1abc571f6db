"""Streaming slice: availableNow replay of events must equal the batch
computation of the same windowed aggregation (§2.9)."""

from pyspark.sql import functions as F

from hive_population_ml_spark.io import Tables
from hive_population_ml_spark.streaming.pipeline import (
    coverage_gate,
    run_events_stream,
    streaming_dedup,
    windowed_agg,
)


def _key(r):
    return (r["win_start"], r["win_end"], r["event_type"])


def test_stream_matches_batch(spark, sf_dir):
    streamed = run_events_stream(spark, sf_dir, query_name="t_win", min_count=5)
    batch = coverage_gate(
        windowed_agg(Tables(spark, sf_dir).events), min_count=5
    )
    s = {_key(r): (r["n"], round(r["value_sum"], 6)) for r in streamed.collect()}
    b = {_key(r): (r["n"], round(r["value_sum"], 6)) for r in batch.collect()}
    assert s == b
    assert len(s) > 0


def test_streaming_dedup_batch_semantics(spark, sf_dir):
    ev = Tables(spark, sf_dir).events
    deduped = streaming_dedup(ev, ["user_id", "event_type"])
    assert (
        deduped.count()
        == ev.select("user_id", "event_type").distinct().count()
    )
