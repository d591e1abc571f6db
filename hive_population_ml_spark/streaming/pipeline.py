"""Structured Streaming slice — SURVEY.md §2.9.

The reference is batch-only; its temporal semantics (tumbling calendar
buckets A5, coverage gates P10, dedup) translate directly:

- ``windowed_agg``      — tumbling event-time window + per-key stats
                          (the streaming form of A1/A5), with a
                          watermark bounding state.
- ``coverage_gate``     — the P10 "min readings per window" quality
                          gate as a post-aggregation filter.
- ``streaming_dedup``   — watermarked dropDuplicates (exact dedup in
                          flight).
- ``run_events_stream`` — drives the pipeline from parquet with
                          availableNow + memory sink: batch parity is
                          asserted in tests (same plan semantics).

State sizing at scale: watermark delay x key cardinality bounds the
state store; all aggregations here are additive, so Spark keeps only
partial aggregates per (key, window) — no raw rows in state.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io.sources import load_table


def await_or_raise(q, timeout_s: int = 600) -> None:
    """availableNow queries must COMPLETE before their memory sink is
    read: an expired silent wait presents a PARTIAL (or empty) table
    as the final answer — the round-11 full driver-sim sweep caught
    stream_attribution_join doing exactly that when a loaded session
    pushed the two-stream replay past the old 120 s silent wait. Fail
    loudly and stop the leaked query instead."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"streaming query {q.name!r} did not finish within "
            f"{timeout_s}s - refusing to read a partial memory sink"
        )


def _as_stream_dir(path: str) -> str:
    """FileStreamSource requires a directory; testdata tables are single
    parquet files. Symlink the file into a scratch dir and stream that.
    (At production scale the source is already a partitioned directory
    and this is a no-op.)"""
    if os.path.isdir(path):
        return path
    d = tempfile.mkdtemp(prefix="stream_src_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    os.symlink(path, os.path.join(d, os.path.basename(path)))
    return d


def windowed_agg(
    events: DataFrame,
    window: str = "1 day",
    watermark: str = "2 days",
    ts: str = "ts",
    key: str = "event_type",
) -> DataFrame:
    """Tumbling window x key: count / sum / avg / min / max of value."""
    # Watermarks require TimestampType (instant); with the session tz
    # pinned to UTC the NTZ->instant cast is the identity mapping.
    src = events.withColumn(ts, F.col(ts).cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark(ts, watermark)
    return (
        src.groupBy(F.window(F.col(ts), window).alias("win"), F.col(key))
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("value_sum"),
            F.avg("value").alias("value_avg"),
            F.min("value").alias("value_min"),
            F.max("value").alias("value_max"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key,
            "n",
            "value_sum",
            "value_avg",
            "value_min",
            "value_max",
        )
    )


def coverage_gate(agg: DataFrame, min_count: int = 10) -> DataFrame:
    """P10 quality gate on windowed aggregates."""
    return agg.filter(F.col("n") >= min_count)


def streaming_dedup(
    events: DataFrame, keys: list[str], ts: str = "ts", watermark: str = "1 day"
) -> DataFrame:
    src = events.withWatermark(ts, watermark) if events.isStreaming else events
    return src.dropDuplicates(keys)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events table as a file stream (schema pinned from the
    batch read; ts normalized the same way)."""
    batch = load_table(spark, sf_dir, "events")
    return (
        spark.readStream.schema(batch.schema)
        .format("parquet")
        .load(_as_stream_dir(f"{sf_dir.rstrip('/')}/events.parquet"))
    )


def events_raw_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw events file stream with ``ts`` normalized to ``timestamp_ntz``,
    mirroring the batch loader's conversion EXACTLY. The raw dtype is
    probed with a metadata-only batch read: testdata generations have
    stored events.ts both as TIMESTAMP(NANOS) (surfaced as long under the
    legacy conf) and as TIMESTAMP(MICROS) — hardcoding either silently
    shears all event times into a single 1970 window when the other
    shows up."""
    from ..session import tune

    tune(spark)
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    raw_batch = spark.read.parquet(path)
    raw = (
        spark.readStream.schema(raw_batch.schema)
        .format("parquet")
        .load(_as_stream_dir(path))
    )
    if dict(raw_batch.dtypes).get("ts") == "bigint":
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return raw.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def run_events_stream(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "events_windowed",
    min_count: int = 10,
) -> DataFrame:
    """Drive the windowed agg with availableNow into a memory sink;
    returns the materialized result table (complete mode)."""
    raw = events_raw_stream(spark, sf_dir)
    agg = coverage_gate(windowed_agg(raw), min_count=min_count)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q)
    return spark.table(query_name)


def stream_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_overlap: int = 1,
) -> DataFrame:
    """Stateless stream-static decontamination (§2.9 + the LLM-pipeline
    decontamination op, in flight).

    The STATIC benchmark collapses to one row carrying its distinct
    shingle-hash array; a stream-static broadcast cross join rides it
    into every micro-batch, and per-doc overlap is
    ``size(array_intersect(...))`` — a pure projection. No streaming
    state, no watermark, no output-mode constraint; the same function
    works identically on batch inputs (parity-tested).

    Benchmarks are small by construction (MBs of eval data vs TBs of
    corpus), so the one-row array broadcast is safe. For huge
    blocklists use the batch operator's broadcast equi-join form
    (``operators/textops.py::decontaminate``) as a backfill pass.
    """
    from ..operators.textops import shingles_of_tokens

    bench = (
        benchmark.select(F.split(F.col(text_col), " ").alias("__t"))
        .select(F.explode(shingles_of_tokens(F.col("__t"), k)).alias("s"))
        .select(F.xxhash64("s").alias("h"))
        .distinct()
        .agg(F.sort_array(F.collect_list("h")).alias("__bench"))
    )
    with_sh = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__t")
    ).select(
        id_col,
        F.transform(
            shingles_of_tokens(F.col("__t"), k), lambda s: F.xxhash64(s)
        ).alias("__sh"),
    )
    joined = with_sh.crossJoin(F.broadcast(bench))
    n_overlap = F.size(F.array_intersect("__sh", "__bench"))
    return joined.select(
        id_col,
        n_overlap.alias("n_overlap"),
        (n_overlap >= min_overlap).cast("int").alias("contaminated"),
    )


def interval_join(
    triggers: DataFrame,
    outcomes: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    horizon: str = "30 minutes",
    watermark: str = "1 day",
    trigger_id: str = "event_id",
    outcome_id: str = "event_id",
    join_type: str = "inner",
) -> DataFrame:
    """Stream-stream event-time interval join (click->conversion
    attribution): match each trigger with every outcome of the same key
    inside ``[t_ts, t_ts + horizon]``.

    ``join_type="left_outer"`` keeps unconverted triggers with NULL
    outcome columns — the "abandoned click" cohort. Outer semantics
    change the emission contract: a NULL-padded row can only emit once
    the outcome side's WATERMARK has passed trigger_ts + horizon
    (before that, a match could still arrive), so outer results trail
    the watermark where inner matches emit eagerly — test-pinned.

    The streaming form is Spark's canonical stateful two-stream join:
    both sides shuffle on the key, both carry watermarks, and the time-
    range condition lets the state store evict a buffered row once the
    other side's watermark passes ``row_ts + horizon`` — state is
    bounded by (watermark + horizon) x per-key arrival rate, never the
    whole stream. Inner joins emit eagerly on match (no watermark hold),
    so an availableNow replay yields the complete batch answer; rows
    arriving later than the watermark bound are dropped — that loss
    contract is the price of bounded state and is the documented
    difference from the batch form. The SAME function applied to batch
    inputs is the equality oracle (parity-tested).
    """
    t = triggers.select(
        F.col(key).alias("__k"),
        F.col(trigger_id).alias("trigger_id"),
        F.col(ts).cast("timestamp").alias("t_ts"),
    )
    o = outcomes.select(
        F.col(key).alias("__k2"),
        F.col(outcome_id).alias("outcome_id"),
        F.col(ts).cast("timestamp").alias("o_ts"),
    )
    if t.isStreaming:
        t = t.withWatermark("t_ts", watermark)
    if o.isStreaming:
        o = o.withWatermark("o_ts", watermark)
    j = t.join(
        o,
        (F.col("__k") == F.col("__k2"))
        & (F.col("o_ts") >= F.col("t_ts"))
        & (F.col("o_ts") <= F.col("t_ts") + F.expr(f"INTERVAL {horizon}")),
        join_type,
    )
    return j.select(
        F.col("__k").alias(key),
        "trigger_id",
        "outcome_id",
        (F.unix_timestamp("o_ts") - F.unix_timestamp("t_ts")).alias("delay_s"),
    )


def streaming_dedup_bounded(
    events: DataFrame,
    keys: list[str],
    ts: str = "ts",
    watermark: str = "1 day",
) -> DataFrame:
    """Exact in-flight dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` holds each key only until the
    watermark passes its first-seen event time, so the state store size
    is (watermark window x key arrival rate) — the plain
    ``dropDuplicates`` form keeps every key forever, which cannot run
    unbounded streams. Semantic contract: duplicates arriving WITHIN
    the watermark of each other collapse to the first; re-occurrences
    farther apart than the watermark are treated as new (both kept) —
    the standard at-scale trade, test-pinned."""
    src = events.withColumn(ts, F.col(ts).cast("timestamp"))
    if src.isStreaming:
        return src.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return src.dropDuplicates(keys)


def foreach_batch_idempotent_sink(
    out: DataFrame,
    path: str,
    checkpoint_dir: str,
):
    """Exactly-once file sink via ``foreachBatch``: each micro-batch
    overwrites its own ``batch_id=N`` directory.

    Why this composition is exactly-once: Structured Streaming replays
    a failed micro-batch under the SAME batch_id (offsets come from
    the checkpoint WAL), and ``mode("overwrite")`` of the batch's own
    directory makes the replay idempotent — a crash between write and
    checkpoint-commit re-writes identical files instead of appending
    duplicates. Readers scan ``path`` as ordinary partitioned parquet.
    This is the pattern for sinks without transactional support;
    arbitrary-upsert targets get the same guarantee from the
    (batch_id, key) pair.

    Returns the DataStreamWriter (caller picks the trigger/starts)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{path}/batch_id={batch_id}"
        )

    return (
        out.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )


# ---------------------------------------------------------------------------
# Incremental corpus prep: the §2.10 training-data pipeline (exact dedup
# -> PII mask -> quality gate -> deterministic sample) running INSIDE
# the §2.9 exactly-once streaming sink — the two charter slices
# composed, not side-by-side. ``prep_transform`` is the single shared
# definition both the batch CLI and the per-micro-batch handler run, so
# batch/stream parity holds by construction for the stateless stages;
# the only cross-batch state is the content-hash history (incremental
# exact dedup — the production write-path shape, like
# dedup.incremental_ngram_dups for near-dups).
# ---------------------------------------------------------------------------


def prep_transform(
    docs: DataFrame,
    min_tokens: int,
    sample_rate: float,
    benchmark: DataFrame | None = None,
    quality_model=None,
    quality_threshold: float = 0.5,
) -> DataFrame:
    """One corpus-prep pass over ``docs``: keep the min-id canonical of
    each exact content group, Bloom-decontaminate against the optional
    evaluation ``benchmark`` (on RAW text, before masking alters the
    shingles — drops any doc the fixed-size bitset flags; no false
    negatives, a bounded false-positive rate trades a few clean docs
    for a map-only corpus pass), mask PII, gate on token count, sample
    deterministically by hash (retry-stable). Every stage is the
    registered operator; this function only composes them."""
    from ..operators import textops
    from ..operators.dedup import exact_dedup
    from ..operators.sampling import stratified_sample

    canonical = exact_dedup(docs, "doc_id", "text").select("canonical_id")
    kept = docs.join(
        canonical, docs["doc_id"] == canonical["canonical_id"], "left_semi"
    )
    if benchmark is not None:
        flagged = textops.bloom_decontaminate(
            kept, benchmark, "doc_id", "text"
        ).filter(F.col("maybe_contaminated") == 1)
        kept = kept.join(flagged.select("doc_id"), "doc_id", "left_anti")
    cleaned = (
        kept.withColumn("text", textops.pii_mask("text"))
        .withColumn("n_tokens", textops.token_count("text"))
        .filter(F.col("n_tokens") >= min_tokens)
    )
    if quality_model is not None:
        # Learned filter-model stage (ml/quality_clf.py): the model is
        # fit ONCE offline (batch mode: on the input corpus; stream
        # mode: on a static read of the same dir before the stream
        # starts) and applied here as a map-only transform — works
        # identically on batch and micro-batch frames.
        from ..ml.quality_clf import score_quality

        scores = score_quality(quality_model, cleaned, id_col="doc_id")
        cleaned = cleaned.join(
            scores.filter(F.col("p_good") >= quality_threshold).select(
                "doc_id"
            ),
            "doc_id",
            "left_semi",
        )
    return stratified_sample(
        cleaned, "lang", {}, id_col="doc_id", default_rate=sample_rate
    ).drop("__u")


def prep_batch_handler(
    out_dir: str,
    min_tokens: int,
    sample_rate: float,
    quality_model=None,
    quality_threshold: float = 0.5,
    benchmark_path: str | None = None,
):
    """foreachBatch handler for the incremental prep pipeline.

    Per micro-batch: (1) anti-join the batch's content hashes against
    the hashes of STRICTLY EARLIER batches (first-batch-wins cross-
    batch exact dedup — within a batch the min-id canonical wins,
    matching the batch pipeline); (2) run ``prep_transform``; (3) write
    the cleaned slice to ``corpus/batch_id=N``; (4) record the batch's
    distinct content hashes under ``content_hashes/batch_id=N``.

    Replay-idempotent by the same argument as
    ``foreach_batch_idempotent_sink``: a replayed batch_id overwrites
    its OWN corpus and hash directories, and the history anti-join
    reads only batch_id < N — a half-written attempt of batch N can
    never mask batch N's own rows."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch_df.sparkSession
        hist = f"{out_dir}/content_hashes"
        with_hash = batch_df.withColumn("content_hash", F.md5(F.col("text")))
        fresh = with_hash
        try:
            seen = (
                spark.read.option("basePath", hist)
                .parquet(hist)
                .filter(F.col("batch_id") < F.lit(batch_id))
                .select("content_hash")
                .distinct()
            )
            fresh = with_hash.join(seen, "content_hash", "left_anti")
        except AnalysisException:
            # History dir absent: first batch. ONLY plan-time
            # path-not-found is tolerable here — the read is lazy, so
            # actual corruption surfaces when the batch job runs and
            # fails it loudly (the checkpoint then replays the batch);
            # a blanket except would have silently skipped cross-batch
            # dedup. Works on any Hadoop filesystem, unlike an
            # os.path existence probe.
            pass
        benchmark = (
            spark.read.parquet(benchmark_path) if benchmark_path else None
        )
        cleaned = prep_transform(
            fresh.drop("content_hash"),
            min_tokens,
            sample_rate,
            benchmark,
            quality_model=quality_model,
            quality_threshold=quality_threshold,
        )
        cleaned.write.mode("overwrite").parquet(
            f"{out_dir}/corpus/batch_id={batch_id}"
        )
        with_hash.select("content_hash").distinct().write.mode(
            "overwrite"
        ).parquet(f"{hist}/batch_id={batch_id}")

    return handle


def prep_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    min_tokens: int = 5,
    sample_rate: float = 1.0,
    benchmark_path: str | None = None,
    quality_model=None,
    quality_threshold: float = 0.5,
):
    """Streaming corpus prep: parquet file source -> per-batch prep
    handler -> exactly-once partitioned corpus. Returns the
    DataStreamWriter (caller picks the trigger/starts); readers scan
    ``out_dir/corpus`` as ordinary partitioned parquet. The shard
    manifest stays a batch post-pass over the written corpus — shard
    packing is a global cumulative sum, which is re-derived, not
    streamed state."""
    from ..session import tune

    tune(spark)
    src_dir = _as_stream_dir(source_dir)
    schema = spark.read.parquet(src_dir).schema
    src = spark.readStream.schema(schema).format("parquet").load(src_dir)
    handle = prep_batch_handler(
        out_dir,
        min_tokens,
        sample_rate,
        benchmark_path=benchmark_path,
        quality_model=quality_model,
        quality_threshold=quality_threshold,
    )
    return src.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )


def session_agg(
    events: DataFrame,
    gap: str = "2 days",
    watermark: str = "30 days",
    ts: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Gap-based session windows (merging state windows): an event at
    >= ``gap`` after the previous one opens a new session —
    ``F.session_window``'s exact boundary rule, which the batch/oracle
    twin must mirror with ``>=`` (not ``>``) on the lag difference.

    Works identically on batch and streaming inputs; streaming gets the
    watermark so session state is evicted once no earlier event can
    still merge.
    """
    src = events.withColumn(ts, F.col(ts).cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark(ts, watermark)
    return (
        src.groupBy(F.col(key), F.session_window(F.col(ts), gap))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(
            key,
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
            "value_sum",
        )
    )


def run_events_session_stream(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "events_sessions",
    gap: str = "2 days",
) -> DataFrame:
    """Drive the session-window agg over the replayed event stream
    (availableNow, complete-mode memory sink — complete mode so the
    tail sessions still inside the watermark horizon materialize too;
    the replay is finite, so the result equals the batch form)."""
    raw = events_raw_stream(spark, sf_dir)
    q = (
        session_agg(raw, gap=gap)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q)
    return spark.table(query_name)


# ---------------------------------------------------------------------------
# Streaming CDC: the §2.10 latest-wins compaction (operators/cdc.py)
# running INSIDE the §2.9 exactly-once sink — a compacting change log.
# Each micro-batch is compacted map-side (one candidate per key per
# batch) and written to its own batch_id directory; the CURRENT state
# is one more latest-wins pass over the compacted log. Write cost is
# O(batch keys) per trigger, never O(state); replay of a failed batch
# overwrites its own directory (same idempotence argument as
# foreach_batch_idempotent_sink). On a transactional table format the
# per-batch compaction feeds MERGE directly; the log form here needs
# only plain parquet.
# ---------------------------------------------------------------------------

CDC_KEYS = ("user_id", "event_type")
CDC_PAYLOAD = ("event_id", "ts_us", "value")


def cdc_upsert_stream(
    src: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    timeout_s: int = 120,
) -> str:
    """Run the change stream through per-batch latest-wins compaction
    into the exactly-once batch_id-partitioned log. ``src`` is a
    streaming DataFrame with the events schema (ts normalized); returns
    ``out_path`` once the availableNow replay completes."""
    from ..operators.cdc import latest_by_key

    with_us = src.withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        compacted = latest_by_key(
            batch_df,
            keys=list(CDC_KEYS),
            order_by=["ts", "event_id"],
            payload=list(CDC_PAYLOAD),
            n_versions_col="n_versions",
        )
        compacted.write.mode("overwrite").parquet(
            f"{out_path}/batch_id={batch_id}"
        )

    q = (
        with_us.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    # a silent timeout here would return the path of a PARTIALLY
    # compacted log and cdc_stream_state would present partial state
    # as the final answer — same class as the attribution-replay
    # defect; fail loudly instead
    await_or_raise(q, timeout_s)
    return out_path


def cdc_stream_state(spark: SparkSession, log_path: str) -> DataFrame:
    """Current state from the compacted log: one more latest-wins agg
    (ts_us/event_id order is isomorphic to the in-batch ts/event_id
    order, so cross-batch winners match a single batch compaction of
    the full history), with n_versions SUMMED across batches so the
    total equals the batch form's per-key version count. One
    partial-aggregated exchange."""
    log = spark.read.parquet(log_path)
    version = F.struct(F.col("ts_us"), F.col("event_id"))
    return (
        log.groupBy(*[F.col(k) for k in CDC_KEYS])
        .agg(
            F.max_by(
                F.struct(*[F.col(p) for p in CDC_PAYLOAD]), version
            ).alias("__w"),
            F.sum("n_versions").cast("long").alias("n_versions"),
        )
        .select(
            *CDC_KEYS, *(f"__w.{p}" for p in CDC_PAYLOAD), "n_versions"
        )
    )


def documents_raw_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents file stream (schema from a metadata-only batch probe —
    never streaming inference)."""
    from ..session import tune

    tune(spark)
    path = f"{sf_dir.rstrip('/')}/documents.parquet"
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(_as_stream_dir(path))
    )


def run_heavy_hitters_stream(
    spark: SparkSession,
    sf_dir: str,
    m: int = 16,
    query_name: str = "doc_heavy_hitters",
    timeout_s: int = 120,
) -> DataFrame:
    """Replay the documents corpus as a token stream through the
    SpaceSaving summary (update-mode memory sink, availableNow) and
    return the FINAL per-language summary (the emit with the largest
    n_seen per language — update mode re-emits the whole m-row summary
    each micro-batch)."""
    from .stateful import streaming_heavy_hitters

    docs = documents_raw_stream(spark, sf_dir)
    toks = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("token")
    )
    q = (
        streaming_heavy_hitters(toks, m=m)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    # reading the memory sink mid-stream would silently present a
    # partial summary as the final one (n_seen short, guarantee void)
    await_or_raise(q, timeout_s)
    out = spark.table(query_name)
    w = Window.partitionBy("lang")
    return (
        out.withColumn("__mx", F.max("n_seen").over(w))
        .filter(F.col("n_seen") == F.col("__mx"))
        .drop("__mx")
    )
