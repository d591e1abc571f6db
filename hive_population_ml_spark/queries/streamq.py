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
