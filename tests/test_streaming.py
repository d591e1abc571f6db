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


def test_stateful_running_stats_matches_batch(spark, sf_dir):
    """applyInPandasWithState custom operator: replaying all events
    through the stateful op must equal the batch per-user aggregation."""
    from hive_population_ml_spark.streaming.pipeline import events_raw_stream
    from hive_population_ml_spark.streaming.stateful import running_user_stats

    src = events_raw_stream(spark, sf_dir)
    q = (
        running_user_stats(src)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_stateful")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode: last emitted row per user is the final state
    got = {
        r["user_id"]: (r["n"], round(r["value_sum"], 6))
        for r in spark.table("t_stateful").collect()
    }
    ev = Tables(spark, sf_dir).events
    want = {
        r["user_id"]: (r["n"], round(r["value_sum"], 6))
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("value_sum"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_session_window_stream_matches_batch(spark, sf_dir):
    """Native session_window under availableNow streaming equals the
    batch session_window aggregation (complete mode replay)."""
    from hive_population_ml_spark.streaming.pipeline import events_raw_stream

    src = (
        events_raw_stream(spark, sf_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "30 days")
    )
    agg = src.groupBy("user_id", F.session_window("ts", "2 days")).agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("v")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_sess_win")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_window"]["start"], r["n"], r["v"])
        for r in spark.table("t_sess_win").collect()
    }
    ev = Tables(spark, sf_dir).events.withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    want = {
        (r["user_id"], r["session_window"]["start"], r["n"], r["v"])
        for r in ev.groupBy("user_id", F.session_window("ts", "2 days"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("v"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_decontaminate_matches_batch(spark, sf_dir):
    """Stateless stream-static decontamination: streaming the documents
    with availableNow produces exactly the batch operator's verdicts."""
    import os
    import tempfile

    from hive_population_ml_spark.operators.textops import decontaminate
    from hive_population_ml_spark.streaming.pipeline import (
        _as_stream_dir,
        stream_decontaminate,
    )

    docs_batch = Tables(spark, sf_dir).documents
    bench = docs_batch.filter(F.col("doc_id") % 17 == 0)
    train = docs_batch.filter(F.col("doc_id") % 17 != 0)

    src = (
        spark.readStream.schema(docs_batch.schema)
        .format("parquet")
        .load(_as_stream_dir(f"{sf_dir.rstrip('/')}/documents.parquet"))
        .filter(F.col("doc_id") % 17 != 0)
    )
    out = stream_decontaminate(src, bench)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("t_decon")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["n_overlap"], r["contaminated"])
        for r in spark.table("t_decon").collect()
    }
    want = {
        (r["doc_id"], r["n_overlap"], r["contaminated"])
        for r in decontaminate(train, bench).collect()
    }
    assert got == want and len(got) > 0


def test_stream_sample_and_pii_match_batch(spark, sf_dir):
    """Ingest-time sampling + PII masking are stateless expressions, so
    the same operators run unchanged on a stream and select exactly the
    batch rows with exactly the batch masks — the property that lets one
    pipeline definition serve backfill (batch) and live ingest."""
    from hive_population_ml_spark.operators.sampling import stratified_sample
    from hive_population_ml_spark.operators.textops import pii_mask
    from hive_population_ml_spark.streaming.pipeline import _as_stream_dir

    docs_batch = Tables(spark, sf_dir).documents
    batch_out = {
        (r["doc_id"], r["m"])
        for r in stratified_sample(docs_batch, "lang", {"en": 0.5}, id_col="doc_id")
        .select("doc_id", F.md5(pii_mask("text")).alias("m"))
        .collect()
    }

    src = (
        spark.readStream.schema(docs_batch.schema)
        .format("parquet")
        .load(_as_stream_dir(f"{sf_dir.rstrip('/')}/documents.parquet"))
    )
    out = stratified_sample(src, "lang", {"en": 0.5}, id_col="doc_id").select(
        "doc_id", F.md5(pii_mask("text")).alias("m")
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("t_sample_pii")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_out = {
        (r["doc_id"], r["m"]) for r in spark.table("t_sample_pii").collect()
    }
    assert stream_out == batch_out
    assert len(stream_out) > 0
