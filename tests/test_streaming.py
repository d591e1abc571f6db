"""Streaming slice: availableNow replay of events must equal the batch
computation of the same windowed aggregation (§2.9)."""

from pyspark.sql import functions as F

from hive_population_ml_spark.io import Tables
from hive_population_ml_spark.streaming.pipeline import (
    await_or_raise,
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
    await_or_raise(q, 120)
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
    await_or_raise(q, 120)
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
    await_or_raise(q, 120)
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
    await_or_raise(q, 120)
    stream_out = {
        (r["doc_id"], r["m"]) for r in spark.table("t_sample_pii").collect()
    }
    assert stream_out == batch_out
    assert len(stream_out) > 0


def test_interval_join_stream_matches_batch(spark, sf_dir):
    """The stateful two-stream interval join under availableNow replay
    equals the identical function applied to batch inputs (inner
    stream-stream joins emit eagerly; nothing here is late, so nothing
    is watermark-dropped)."""
    from hive_population_ml_spark.streaming.pipeline import (
        events_raw_stream,
        interval_join,
    )

    clicks_s = events_raw_stream(spark, sf_dir).filter(
        F.col("event_type") == "click"
    )
    buys_s = events_raw_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    out = interval_join(clicks_s, buys_s, watermark="2 days")
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_attr_join")
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 120)
    got = {
        (r["user_id"], r["trigger_id"], r["outcome_id"], r["delay_s"])
        for r in spark.table("t_attr_join").collect()
    }
    ev = Tables(spark, sf_dir).events
    want = {
        (r["user_id"], r["trigger_id"], r["outcome_id"], r["delay_s"])
        for r in interval_join(
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "purchase"),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_dedup_bounded_semantics(spark, tmp_path):
    """dropDuplicatesWithinWatermark contract: duplicates WITHIN the
    watermark of each other collapse; re-occurrences farther apart are
    both kept (the bounded-state trade vs global dropDuplicates)."""
    import datetime as dt

    from hive_population_ml_spark.streaming.pipeline import (
        streaming_dedup_bounded,
    )

    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    # One file per micro-batch, mtime-ordered: arrival order is the
    # semantics here (the watermark only advances between batches, and
    # an out-of-order replay would drop earlier rows as late).
    batches = [
        [("k1", t0), ("k2", t0 + dt.timedelta(minutes=1))],   # both kept
        [("k1", t0 + dt.timedelta(minutes=5))],               # dup in wm: drop
        [("k3", t0 + dt.timedelta(hours=3))],                 # advances wm
        # watermark from a batch only applies in the NEXT one, and state
        # eviction runs during batch processing — so a second advancing
        # batch is needed before k1's expired state is actually gone
        [("k4", t0 + dt.timedelta(hours=4))],                 # evicts k1/k2
        [("k1", t0 + dt.timedelta(hours=30))],                # state expired: keep
    ]
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    for i, rows in enumerate(batches):
        tbl = pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        )
        path = src_dir / f"b{i}.parquet"
        pq.write_table(tbl, path)
        os.utime(path, (1700000000 + i * 60, 1700000000 + i * 60))
    stream = (
        spark.readStream.schema("k string, ts timestamp")
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(str(src_dir))
    )
    out = streaming_dedup_bounded(stream, ["k"], watermark="1 hour")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup_wm")
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 120)
    got = sorted((r["k"], r["ts"]) for r in spark.table("t_dedup_wm").collect())
    assert got == sorted(
        [
            ("k1", t0),
            ("k2", t0 + dt.timedelta(minutes=1)),
            ("k3", t0 + dt.timedelta(hours=3)),
            ("k4", t0 + dt.timedelta(hours=4)),
            ("k1", t0 + dt.timedelta(hours=30)),
        ]
    )


def test_stream_bloom_decontaminate_matches_batch(spark, sf_dir):
    """The Bloom bitset is a plan-constant Literal, so the probe is a
    stateless map — it drops into a streaming plan unchanged (no
    state, no watermark, no output-mode constraint). availableNow
    replay must produce the batch operator's verdicts exactly."""
    from hive_population_ml_spark.operators.sketches import (
        bloom_bits_literal,
        bloom_probe_any,
    )
    from hive_population_ml_spark.operators.textops import (
        bloom_decontaminate,
        shingles_of_tokens,
    )
    from hive_population_ml_spark.streaming.pipeline import _as_stream_dir

    docs_batch = Tables(spark, sf_dir).documents
    bench = docs_batch.filter(F.col("doc_id") % 17 == 0)
    train = docs_batch.filter(F.col("doc_id") % 17 != 0)
    m = 1 << 20

    b_sh = bench.select(F.split("text", " ").alias("__t")).select(
        F.explode(shingles_of_tokens(F.col("__t"), 3)).alias("__s")
    )
    bits = bloom_bits_literal(b_sh, "__s", m_bits=m)

    src = (
        spark.readStream.schema(docs_batch.schema)
        .format("parquet")
        .load(_as_stream_dir(f"{sf_dir.rstrip('/')}/documents.parquet"))
        .filter(F.col("doc_id") % 17 != 0)
    )
    out = (
        src.select("doc_id", F.split("text", " ").alias("__t"))
        .select("doc_id", shingles_of_tokens(F.col("__t"), 3).alias("__sh"))
        .withColumn("__bits", bits)
        .select(
            "doc_id",
            bloom_probe_any("__sh", "__bits", m).cast("int").alias(
                "maybe_contaminated"
            ),
        )
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("t_bloom_stream")
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 120)
    got = {
        (r["doc_id"], r["maybe_contaminated"])
        for r in spark.table("t_bloom_stream").collect()
    }
    want = {
        (r["doc_id"], r["maybe_contaminated"])
        for r in bloom_decontaminate(train, bench, m_bits=m).collect()
    }
    assert got == want and len(got) > 0


def test_foreach_batch_sink_idempotent_replay(spark, sf_dir, tmp_path):
    """The foreachBatch exactly-once contract: (a) a replayed batch_id
    overwrites its own directory — byte-identical content, no
    duplicates; (b) restarting the query from the same checkpoint with
    no new input writes nothing new."""
    from hive_population_ml_spark.streaming.pipeline import (
        _as_stream_dir,
        foreach_batch_idempotent_sink,
    )

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev = Tables(spark, sf_dir).events
    # ONE stable source dir: the checkpoint WAL records source paths, so
    # a restart must see the same location (a per-call tmp dir would be
    # rejected with a basePath mismatch)
    src_dir = _as_stream_dir(f"{sf_dir.rstrip('/')}/events.parquet")

    def start():
        src = (
            spark.readStream.schema(
                spark.read.parquet(src_dir).schema
            )
            .format("parquet")
            .load(src_dir)
            .select("event_id", "user_id", "value")
        )
        return (
            foreach_batch_idempotent_sink(src, out_dir, ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    await_or_raise(q, 120)
    got = spark.read.parquet(out_dir)
    n_events = Tables(spark, sf_dir).events.count()
    assert got.count() == n_events
    assert got.select("event_id").distinct().count() == n_events

    # simulate a replay of batch 0: same batch_id, same data -> the
    # directory is overwritten, never appended
    batch0 = sorted(
        r["batch_id"] for r in got.select("batch_id").distinct().collect()
    )[0]
    replay = Tables(spark, sf_dir).events.select(
        "event_id", "user_id", "value"
    )
    replay.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch0}")
    again = spark.read.parquet(out_dir)
    assert again.select("event_id").distinct().count() == n_events

    # restart from the same checkpoint: no new input -> no new batches
    q2 = start()
    await_or_raise(q2, 120)
    assert spark.read.parquet(out_dir).count() == n_events


def test_stateful_agg_checkpoint_recovery(spark, tmp_path):
    """§2.9 state recovery: a watermarked windowed aggregation stopped
    and RESTARTED from its checkpoint must resume its state store —
    the second run processes only the new file, and the final sink
    content equals the batch aggregation over ALL data. Update mode +
    idempotent foreachBatch sink, so re-emitted windows overwrite."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime as dt
    import os

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1)

    def write_file(name, rows, mtime):
        tbl = pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "v": pa.array([r[2] for r in rows], pa.float64()),
            }
        )
        path = src_dir / name
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    write_file(
        "a.parquet",
        [("k1", t0, 1.0), ("k1", t0 + dt.timedelta(minutes=5), 2.0),
         ("k2", t0, 10.0)],
        1700000000,
    )

    def run_stream():
        src = (
            spark.readStream.schema("k string, ts timestamp, v double")
            .format("parquet")
            .load(str(src_dir))
            .withWatermark("ts", "1 hour")
        )
        agg = src.groupBy(
            "k", F.window("ts", "1 hour").alias("win")
        ).agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        flat = agg.select(
            "k", F.col("win.start").alias("ws"), "n", "s"
        )

        def handle(batch_df, batch_id):
            batch_df.write.mode("overwrite").parquet(
                f"{out_dir}/batch_id={batch_id}"
            )

        q = (
            flat.writeStream.outputMode("update")
            .foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 120)

    run_stream()
    # new data arrives while the query is DOWN — same window for k1
    # (state must resume to accumulate) plus a new key
    write_file(
        "b.parquet",
        [("k1", t0 + dt.timedelta(minutes=20), 4.0), ("k3", t0, 7.0)],
        1700000100,
    )
    run_stream()

    # update-mode: the LAST emission per (k, window) is the truth
    got_df = spark.read.parquet(out_dir)
    latest = {}
    for r in got_df.collect():
        key = (r["k"], r["ws"])
        if key not in latest or r["batch_id"] > latest[key][0]:
            latest[key] = (r["batch_id"], r["n"], r["s"])
    got = {k: v[1:] for k, v in latest.items()}
    want = {
        ("k1", t0): (3, 7.0),   # state resumed: 1+2 from run 1, +4 after
        ("k2", t0): (1, 10.0),
        ("k3", t0): (1, 7.0),
    }
    assert got == want
    # run 2 really was incremental: its batches saw only the new keys'
    # windows, not a reprocessing of file a
    run2 = got_df.filter(F.col("batch_id") >= 1)
    assert run2.count() == 2  # (k1 updated) + (k3 new)


def test_interval_join_left_outer_stream(spark, sf_dir):
    """Left-outer stream-stream join contract: matched rows emit
    eagerly and equal the batch inner join exactly; NULL-padded rows
    for unconverted triggers emit only once the watermark passes
    trigger_ts + horizon — so triggers inside the final
    watermark+horizon window stay HELD at termination (they might
    still convert), and everything older is flushed. The test pins
    the boundary on both sides instead of naive batch equality."""
    from hive_population_ml_spark.streaming.pipeline import (
        events_raw_stream,
        interval_join,
    )

    clicks_s = events_raw_stream(spark, sf_dir).filter(
        F.col("event_type") == "click"
    )
    buys_s = events_raw_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    out = interval_join(
        clicks_s, buys_s, watermark="2 days", join_type="left_outer"
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_attr_outer")
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 120)
    got = {
        (r["user_id"], r["trigger_id"], r["outcome_id"], r["delay_s"])
        for r in spark.table("t_attr_outer").collect()
    }
    ev = Tables(spark, sf_dir).events
    want = {
        (r["user_id"], r["trigger_id"], r["outcome_id"], r["delay_s"])
        for r in interval_join(
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "purchase"),
            join_type="left_outer",
        ).collect()
    }
    matched = {g for g in got if g[2] is not None}
    want_matched = {w for w in want if w[2] is not None}
    assert matched == want_matched  # inner matches emit eagerly, all of them

    got_un = {g[1] for g in got if g[2] is None}
    want_un = {w[1] for w in want if w[2] is None}
    assert got_un <= want_un  # never a spurious NULL row
    assert len(matched) > 0 and len(got_un) > 0  # both cohorts real

    # Boundary: the watermark stops at max_event_ts - delay, so NULL
    # rows for triggers with ts + horizon >= watermark stay held at
    # termination; everything decided must have flushed.
    import datetime as dt

    ts_by_id = {
        r["event_id"]: r["ts"]
        for r in ev.filter(F.col("event_type") == "click")
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"))
        .collect()
    }
    # the GLOBAL watermark of a stream-stream join is the MIN of the
    # two sides' watermarks (each side: its own max event time - delay)
    side_max = [
        ev.filter(F.col("event_type") == et)
        .agg(F.max(F.col("ts").cast("timestamp")))
        .collect()[0][0]
        for et in ("click", "purchase")
    ]
    wm = min(side_max) - dt.timedelta(days=2)
    horizon = dt.timedelta(minutes=30)
    held = want_un - got_un
    for tid in held:
        assert ts_by_id[tid] + horizon >= wm, (
            f"decided trigger {tid} was never flushed"
        )
    for tid in got_un:
        assert ts_by_id[tid] + horizon < wm + dt.timedelta(seconds=1), (
            f"undecided trigger {tid} emitted early"
        )


def test_prep_stream_batch_parity(spark, sf_dir, tmp_path):
    """--stream must produce the SAME corpus + shard manifest + summary
    as the batch prep on the same input (VERDICT r4 #6): the §2.9
    exactly-once sink running the §2.10 composed pipeline, not a
    parallel implementation of it."""
    from hive_population_ml_spark.cli import main

    out_b = main(
        [
            "prep", "--data-dir", sf_dir,
            "--output-dir", str(tmp_path / "b"), "--cpus", "8",
        ]
    )
    out_s = main(
        [
            "prep", "--data-dir", sf_dir,
            "--output-dir", str(tmp_path / "s"), "--stream", "--cpus", "8",
        ]
    )
    for k in ("n_raw_docs", "n_kept_docs", "n_tokens", "n_shards"):
        assert out_b[k] == out_s[k], k
    cols = sorted(
        c for c in spark.read.parquet(str(tmp_path / "b" / "corpus")).columns
    )
    b = (
        spark.read.parquet(str(tmp_path / "b" / "corpus"))
        .select(*cols).orderBy("doc_id").collect()
    )
    s = (
        spark.read.parquet(str(tmp_path / "s" / "corpus"))
        .drop("batch_id").select(*cols).orderBy("doc_id").collect()
    )
    assert len(b) > 0
    assert b == s
    mb = spark.read.parquet(str(tmp_path / "b" / "shards")).collect()
    ms = spark.read.parquet(str(tmp_path / "s" / "shards")).collect()
    assert sorted(map(str, mb)) == sorted(map(str, ms))


def test_prep_stream_replay_and_incremental_dedup(spark, sf_dir, tmp_path):
    """(a) Replaying a batch_id overwrites its own corpus/hash dirs —
    identical rows, no duplicates (the exactly-once contract reused
    from foreach_batch_idempotent_sink). (b) A later batch repeating
    earlier content is dropped by the content-hash history; its half-
    written hashes can never mask its own rows on replay (the handler
    reads only batch_id < N)."""
    from hive_population_ml_spark.streaming.pipeline import (
        prep_batch_handler,
    )

    docs = Tables(spark, sf_dir).documents.limit(200).cache()
    out = str(tmp_path / "out")
    handle = prep_batch_handler(out, min_tokens=1, sample_rate=1.0)

    handle(docs, 0)
    first = spark.read.parquet(f"{out}/corpus").drop("batch_id").collect()
    assert len(first) > 0
    # (a) replay batch 0: byte-identical outcome
    handle(docs, 0)
    again = spark.read.parquet(f"{out}/corpus").drop("batch_id").collect()
    assert sorted(map(str, first)) == sorted(map(str, again))
    # (b) batch 1 re-sends the same docs (re-crawl): all deduped away
    handle(docs, 1)
    b1 = (
        spark.read.parquet(f"{out}/corpus")
        .filter(F.col("batch_id") == 1).collect()
    )
    assert b1 == []
    # and genuinely new content in batch 2 still lands
    fresh = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" fresh-batch-2-token"))
    )
    handle(fresh, 2)
    b2 = (
        spark.read.parquet(f"{out}/corpus")
        .filter(F.col("batch_id") == 2).count()
    )
    assert b2 > 0


def test_prep_decontaminate_stage_batch_stream_parity(spark, sf_dir, tmp_path):
    """--decontaminate drops every doc sharing a shingle with the
    benchmark (Bloom probe: no false negatives) in BOTH modes, and
    batch == stream on the decontaminated corpus."""
    from hive_population_ml_spark.cli import main

    docs = Tables(spark, sf_dir).documents
    bench_path = str(tmp_path / "benchmark")
    # benchmark = 5 real docs' raw text -> those docs MUST be dropped
    bench_ids = [r["doc_id"] for r in docs.limit(5).collect()]
    docs.filter(F.col("doc_id").isin(bench_ids)).select("text").write.parquet(
        bench_path
    )
    out_b = main(
        [
            "prep", "--data-dir", sf_dir,
            "--output-dir", str(tmp_path / "b"),
            "--decontaminate", bench_path, "--cpus", "8",
        ]
    )
    out_s = main(
        [
            "prep", "--data-dir", sf_dir,
            "--output-dir", str(tmp_path / "s"),
            "--decontaminate", bench_path, "--stream", "--cpus", "8",
        ]
    )
    corpus_b = spark.read.parquet(str(tmp_path / "b" / "corpus"))
    kept_ids = {r["doc_id"] for r in corpus_b.select("doc_id").collect()}
    assert not (kept_ids & set(bench_ids))  # no false negatives
    assert len(kept_ids) > 0
    for k in ("n_kept_docs", "n_tokens", "n_shards"):
        assert out_b[k] == out_s[k], k
    s_ids = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "s" / "corpus"))
        .select("doc_id").collect()
    }
    assert s_ids == kept_ids


def test_session_agg_helper_stream_equals_batch(spark, sf_dir):
    """The session_agg operator gives identical results fed a batch
    DataFrame or driven through the streaming replay path — the
    batch/stream unification contract of the registered
    stream_session_window query."""
    from hive_population_ml_spark.streaming.pipeline import (
        run_events_session_stream,
        session_agg,
    )

    streamed = {
        tuple(r)
        for r in run_events_session_stream(
            spark, sf_dir, query_name="t_sess_helper"
        ).collect()
    }
    batch = {
        tuple(r) for r in session_agg(Tables(spark, sf_dir).events).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_prep_learned_quality_batch_stream_parity(spark, sf_dir, tmp_path):
    """The learned filter-model stage composes into BOTH prep modes with
    identical results (model fit once offline, map-only apply)."""
    from hive_population_ml_spark.cli import main

    b_out, s_out = str(tmp_path / "b"), str(tmp_path / "s")
    rb = main(
        ["prep", "--data-dir", sf_dir, "--output-dir", b_out,
         "--min-tokens", "3", "--cpus", "4", "--learned-quality", "0.6"]
    )
    rs = main(
        ["prep", "--data-dir", sf_dir, "--output-dir", s_out,
         "--min-tokens", "3", "--cpus", "4", "--learned-quality", "0.6",
         "--stream"]
    )
    assert rb["n_kept_docs"] == rs["n_kept_docs"] > 0
    # the learned gate really filters relative to the heuristic-only run
    r_plain = main(
        ["prep", "--data-dir", sf_dir, "--output-dir", str(tmp_path / "p"),
         "--min-tokens", "3", "--cpus", "4"]
    )
    assert rb["n_kept_docs"] <= r_plain["n_kept_docs"]
    got_b = {
        r["doc_id"]
        for r in spark.read.parquet(rb["corpus"]).select("doc_id").collect()
    }
    got_s = {
        r["doc_id"]
        for r in spark.read.parquet(rs["corpus"]).select("doc_id").collect()
    }
    assert got_b == got_s


def test_cdc_upsert_stream_multibatch_parity_and_replay(spark, sf_dir, tmp_path):
    """Streaming CDC compaction over a FORCED multi-batch replay (one
    file per trigger) must reproduce the batch latest-wins state
    exactly — winners AND total version counts — and re-running with
    the same checkpoint must be a no-op (exactly-once replay)."""
    from pyspark.sql import functions as F

    from hive_population_ml_spark.operators.cdc import latest_by_key
    from hive_population_ml_spark.streaming.pipeline import (
        cdc_stream_state,
        cdc_upsert_stream,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    src_dir = tmp_path / "ev_src"
    # 4 files -> 4 micro-batches; splitting by event_id ranges means a
    # key's versions genuinely straddle batches
    ev.withColumn("part", (F.col("event_id") % 4).cast("int")).write.partitionBy(
        "part"
    ).parquet(str(src_dir))
    stream = (
        spark.readStream.schema(ev.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(str(src_dir) + "/part=*")
    )
    log = cdc_upsert_stream(
        stream,
        out_path=str(tmp_path / "log"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    import os

    n_batches = len(
        [d for d in os.listdir(log) if d.startswith("batch_id=")]
    )
    assert n_batches >= 2, "replay did not exercise multiple batches"

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    got = canon(cdc_stream_state(spark, log))
    want = canon(
        latest_by_key(
            ev.withColumn(
                "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
            ),
            keys=["user_id", "event_type"],
            order_by=["ts", "event_id"],
            payload=["event_id", "ts_us", "value"],
        )
    )
    assert got == want

    # replay with the same checkpoint: no new batches, identical state
    stream2 = (
        spark.readStream.schema(ev.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(str(src_dir) + "/part=*")
    )
    cdc_upsert_stream(
        stream2,
        out_path=str(tmp_path / "log"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert canon(cdc_stream_state(spark, log)) == want


def test_streaming_heavy_hitters_spacesaving_guarantees(spark, sf_dir, tmp_path):
    """SpaceSaving summary properties (order-free, so they pin the
    operator despite arrival-order-dependent contents): state is
    exactly <= m rows per language; n_seen equals the true token
    count; every token with true frequency > n/m is present; for
    every summary row est_count >= true count >= est_count - err."""
    from hive_population_ml_spark.streaming.pipeline import (
        run_heavy_hitters_stream,
    )

    m = 16
    out = run_heavy_hitters_stream(
        spark, sf_dir, m=m, query_name="t_hh"
    ).collect()
    docs = Tables(spark, sf_dir).documents
    exact = {
        (r["lang"], r["token"]): r["n"]
        for r in docs.select(
            "lang", F.explode(F.split("text", " ")).alias("token")
        )
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_lang: dict = {}
    for (lang, _), n in exact.items():
        n_lang[lang] = n_lang.get(lang, 0) + n

    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == set(n_lang)
    for lang, rows in by_lang.items():
        assert len(rows) <= m
        assert all(r["n_seen"] == n_lang[lang] for r in rows)
        present = {r["token"] for r in rows}
        # the SpaceSaving guarantee: true count > n/m => present
        for (lg, tok), n in exact.items():
            if lg == lang and n > n_lang[lang] / m:
                assert tok in present, (lang, tok, n)
        for r in rows:
            true = exact.get((lang, r["token"]), 0)
            assert r["est_count"] >= true >= r["est_count"] - r["err"]
            assert r["lower_bound"] == r["est_count"] - r["err"]


def test_streaming_heavy_hitters_skewed_stream_tight(spark, tmp_path):
    """On a skewed stream the dominant token surfaces with a TIGHT
    bound: vocabulary (48) far exceeds m (8), yet the heavy token's
    lower_bound alone must already exceed every other token's truth."""
    import pandas as pd

    src = tmp_path / "skew_docs"
    src.mkdir()
    rows = []
    for i in range(200):
        filler = " ".join(f"w{(i * 7 + j) % 48}" for j in range(4))
        rows.append((i, f"hot hot hot {filler}", "en", "s", 0))
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(src / "documents.parquet")

    from hive_population_ml_spark.streaming.pipeline import (
        run_heavy_hitters_stream,
    )

    out = run_heavy_hitters_stream(
        spark, str(src), m=8, query_name="t_hh_skew"
    ).collect()
    assert len(out) <= 8
    hot = [r for r in out if r["token"] == "hot"]
    assert hot, "dominant token evicted — SpaceSaving broken"
    # true count 600; every filler token's truth <= 200*4/48 * safety
    assert hot[0]["est_count"] >= 600 >= hot[0]["lower_bound"]
    fillers_true_max = 4 * 200 / 48 * 3  # generous ceiling
    assert hot[0]["lower_bound"] > fillers_true_max


def test_no_bare_bounded_awaits():
    """Silent-partial-sink ban (VERDICT r11 #1): a bounded
    ``awaitTermination(t)`` whose False return is ignored can hand a
    downstream reader a partially-written sink with no error — the
    class that produced the attribution-replay spark=0 defect and the
    missed ``cdc_upsert_stream`` site. Every bounded wait in the
    package, tests and tools must consume the result (the
    ``await_or_raise`` helper) — unbounded ``awaitTermination()`` is
    exempt because it blocks until completion and cannot be partial."""
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    offenders = []
    for sub in ("hive_population_ml_spark", "tests", "tools"):
        base = root / sub
        if not base.exists():
            continue
        for f in sorted(base.rglob("*.py")):
            for i, line in enumerate(
                f.read_text(encoding="utf-8").splitlines(), 1
            ):
                m = re.search(r"\.awaitTermination\(([^)]*)\)", line)
                if m is None or m.group(1).strip() == "":
                    continue
                # a consumed result (the helper's own body) is the one
                # legitimate bounded form
                if re.search(r"if\s+not\s+\w+\.awaitTermination\(", line):
                    continue
                offenders.append(f"{f.relative_to(root)}:{i}: {line.strip()}")
    assert not offenders, (
        "bare bounded awaitTermination() — route through "
        "streaming.pipeline.await_or_raise:\n" + "\n".join(offenders)
    )
