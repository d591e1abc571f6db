"""Streaming queries surfaced through the driver contract — SURVEY.md §2.9.

``stream_windowed_agg`` replays the events table through a real
Structured Streaming query (file source → watermark → tumbling window →
coverage gate → memory sink, availableNow trigger) and returns the
materialized result. Because the aggregation is additive and the replay
is complete, the result must equal the batch form — which is exactly
what the DuckDB oracle states, making the streaming path itself
hash-checked, not just rows-counted.

Sums are rounded in-query on both engines so accumulation order cannot
flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.pipeline import run_events_stream
from .registry import register
from .windows import HOPPING_ORACLE_SQL


@register(
    "stream_windowed_agg",
    oracle="""
SELECT time_bucket(INTERVAL 1 DAY, CAST(ts AS TIMESTAMP)) AS win_start,
       time_bucket(INTERVAL 1 DAY, CAST(ts AS TIMESTAMP)) + INTERVAL 1 DAY
           AS win_end,
       event_type,
       count(*) AS n,
       round(sum(value), 4) AS value_sum,
       round(avg(value), 6) AS value_avg,
       min(value) AS value_min,
       max(value) AS value_max
FROM events
GROUP BY 1, 2, 3
HAVING count(*) >= 5
""",
)
def stream_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = run_events_stream(
        spark, sf_dir, query_name="q_stream_windowed_agg", min_count=5
    )
    return out.select(
        "win_start",
        "win_end",
        "event_type",
        "n",
        F.round("value_sum", 4).alias("value_sum"),
        F.round("value_avg", 6).alias("value_avg"),
        "value_min",
        "value_max",
    )


@register(
    "stream_attribution_join",
    oracle="""
SELECT c.user_id,
       c.event_id AS trigger_id,
       p.event_id AS outcome_id,
       date_diff('second', c.ts, p.ts) AS delay_s
FROM events c JOIN events p
  ON p.user_id = c.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 30 MINUTE
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
""",
)
def stream_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join through a REAL two-stream Structured
    Streaming query: clicks and purchases replay as two independent
    file streams, shuffle-join on user_id with watermarks and the
    [t, t+30min] event-time range (state evicted past
    watermark+horizon), availableNow append into a memory sink. Inner
    stream-stream joins emit eagerly, so the replayed result equals the
    batch join — which is what the DuckDB oracle states, hash-checking
    the stateful streaming path itself."""
    from ..streaming.pipeline import (await_or_raise,
        events_raw_stream, interval_join)

    clicks = events_raw_stream(spark, sf_dir).filter(
        F.col("event_type") == "click"
    )
    purchases = events_raw_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    out = interval_join(
        clicks, purchases, key="user_id", horizon="30 minutes", watermark="2 days"
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("q_stream_attribution")
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q)
    return spark.table("q_stream_attribution")


@register(
    "stream_session_window",
    oracle="""
WITH ordered AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 2 DAY
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), tagged AS (
    SELECT user_id, ts, value,
           sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM ordered
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events,
       round(sum(value), 4) AS value_sum
FROM tagged GROUP BY user_id, sid
""",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows through a REAL replay: the events file
    stream feeds ``F.session_window`` (merging session state with a
    watermark) into a complete-mode memory sink via availableNow. The
    finite complete replay must equal batch gap-sessionization — the
    DuckDB oracle states that batch form (lag >= gap opens a session,
    matching session_window's boundary rule), so the stateful
    session-merge path itself is hash-checked, beyond the rows-only
    evidence a custom stateful op usually gets."""
    from ..streaming.pipeline import run_events_session_stream

    return run_events_session_stream(
        spark, sf_dir, query_name=f"q_sessions_{abs(hash(sf_dir)) % 10**6}"
    )


@register(
    "stream_cdc_state",
    shadow_oracle="""
WITH ranked AS (
    SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value,
           row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC) AS rn,
           count(*) OVER (PARTITION BY user_id, event_type) AS n_versions
    FROM events
)
SELECT user_id, event_type, event_id, ts_us, value, n_versions
FROM ranked WHERE rn = 1
""",
)
def stream_cdc_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC compaction (round-7 addition): the events change
    log replays through a REAL Structured Streaming query into the
    exactly-once batch_id-partitioned compacted log (per-batch
    latest-wins, foreachBatch overwrite idempotence), then the current
    state is read back with one more latest-wins aggregation. The
    replayed state must equal the batch compaction of the full history
    — exactly what the shadow oracle (cdc_latest_state's independent
    row_number formulation) states, hash-checking the stateful
    streaming write path itself."""
    import atexit
    import shutil
    import tempfile

    from ..streaming.pipeline import (
        cdc_stream_state,
        cdc_upsert_stream,
        events_raw_stream,
    )

    # Scratch (compacted log + streaming checkpoint) is read LAZILY by
    # the returned DataFrame, so it can't be removed here; reclaim it at
    # process exit instead of accumulating across driver/bench rounds.
    scratch = tempfile.mkdtemp(prefix="cdc_stream_")
    atexit.register(shutil.rmtree, scratch, ignore_errors=True)
    log = cdc_upsert_stream(
        events_raw_stream(spark, sf_dir),
        out_path=f"{scratch}/log",
        checkpoint_dir=f"{scratch}/ckpt",
    )
    return cdc_stream_state(spark, log)


@register("stream_heavy_hitters")  # rows-only: SpaceSaving summary
# contents are arrival-order-dependent (the overestimate/guarantee
# properties are order-free and pinned in tests/test_streaming.py)
def stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-language trending tokens (round-8 addition): the
    documents corpus replays as a token stream through a SpaceSaving
    summary held in applyInPandasWithState — EXACTLY m=16 counter
    triples per language regardless of stream length or vocabulary
    (the batch text_heavy_hitters needs state ∝ vocab; this is the
    unbounded-crawl form). Every token with true frequency > n/16 is
    guaranteed present; est_count - err lower-bounds the truth."""
    from ..streaming.pipeline import run_heavy_hitters_stream

    return run_heavy_hitters_stream(
        spark, sf_dir, m=16,
        query_name=f"q_hh_{abs(hash(sf_dir)) % 10**6}",
    )


@register(
    "stream_hopping_window",
    shadow_oracle=HOPPING_ORACLE_SQL,
)
def stream_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregation through a REAL Structured Streaming
    query: window(ts, '1 hour', '15 minutes') — each event lands in
    size/hop = 4 overlapping window states — replayed with availableNow
    into a memory sink (complete mode; the full replay makes the
    result equal the batch form). The oracle is the SAME SQL as the
    batch twin w_hopping_window's, so the streaming state path itself
    is hash-checked against DuckDB, and the two twins are transitively
    hash-equal to each other. Window starts surface as BIGINT epoch-us
    (Spark's window() aligns hop slots to the epoch origin — the exact
    floor(us/hop)*hop arithmetic of the batch rewrite). Production
    posture: unbounded input swaps complete mode for
    watermark + append with the same window spec; state per key is one
    (count, sum) pair across 4 live windows per hop."""
    from ..streaming.pipeline import await_or_raise, events_raw_stream

    raw = events_raw_stream(spark, sf_dir)
    agg = (
        raw.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("v_sum"),
        )
        .select(
            F.unix_micros(F.col("window.start").cast("timestamp")).alias(
                "win_start"
            ),
            "n_events",
            "v_sum",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("q_stream_hopping")
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q)
    return spark.table("q_stream_hopping")
