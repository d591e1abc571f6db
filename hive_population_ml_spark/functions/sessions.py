"""Shared gap-based sessionization frame.

One definition of the 2-day-gap session derivation used by every
session-scoped query (w_session_paths, a_markov_transitions; the
older w_sessionize/w_pattern_match predate it and pin the identical
construction independently): lag + running sum over ONE (user_id,
ts_us, event_id) sort — so the gap threshold and the boundary
tie-break can never silently diverge between consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GAP_US = 172_800_000_000  # 2 days, epoch-microseconds

# The oracle-side CTE mirroring sessionize_2day, for embedding into
# consumer oracles (DuckDB SQL). Produces s(user_id, ts_us, event_id,
# event_type, session_id).
SESSION_SQL_CTE = """
o AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 172800000000
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), s AS (
    SELECT user_id, ts_us, event_id, event_type,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
    FROM o
)"""


def sessionize_2day(events: DataFrame) -> DataFrame:
    """Tag events with a per-user session_id (new session after a
    >2-day silence). Returns (user_id, ts_us, event_id, event_type,
    session_id); ONE hash exchange + sort on the user key — every
    downstream per-session window can reuse it. Ordering inside a
    session is pinned by (ts_us, event_id): boundary-tied timestamps
    otherwise flip session membership between engines (the
    w_pattern_match lesson)."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o = events.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
        "event_type",
    )
    prev = F.lag("ts_us").over(w)
    return o.select(
        "user_id",
        "ts_us",
        "event_id",
        "event_type",
        (prev.isNull() | (F.col("ts_us") - prev > GAP_US))
        .cast("int")
        .alias("new_s"),
    ).withColumn("session_id", F.sum("new_s").over(wrun))
