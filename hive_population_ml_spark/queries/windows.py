"""Window / ordered-operation queries — SURVEY.md §2.5 (W1–W6) + O4.

Each query pins a deterministic total order (ts, event_id) so the
row_number-based operators are reproducible across engines — the
reference gets determinism for free from its global pre-sort
(loader.py:97); a distributed engine must make the tie-break explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.sessions import SESSION_SQL_CTE, sessionize_2day
from ..io import Tables
from .registry import register

_W = lambda: Window.partitionBy("user_id").orderBy("ts", "event_id")  # noqa: E731


# -- W1/O1: partitioned sort exposed via ordered head rows ------------------
# (loader.py:97 sort_values([hive, ts]); determinism via rank projection)

@register(
    "w1_ordered_head",
    shadow_oracle="""
WITH r AS (
    SELECT user_id, event_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
)
SELECT user_id, rn, event_id, value FROM r WHERE rn <= 3
""",
)
def w1_ordered_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    r = t.events.select(
        "user_id", "event_id", "value", F.row_number().over(_W()).alias("rn")
    )
    return r.filter(F.col("rn") <= 3).select("user_id", "rn", "event_id", "value")


# -- W3: stride subsample — every 12th reading (dataset.py:237-238) ---------

@register(
    "w3_stride_subsample",
    shadow_oracle="""
WITH r AS (
    SELECT user_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
)
SELECT user_id, count(*) AS n_sampled, round(avg(value), 6) AS v_avg
FROM r WHERE (rn - 1) % 12 = 0
GROUP BY user_id
""",
)
def w3_stride_subsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    r = t.events.select("user_id", "value", F.row_number().over(_W()).alias("rn"))
    return (
        r.filter((F.col("rn") - 1) % 12 == 0)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sampled"), F.round(F.avg("value"), 6).alias("v_avg"))
    )


# -- W4: per-group tail-K by recency (dataset.py:289-292, max_seq_len) ------

@register(
    "w4_tail_k",
    oracle="""
WITH r AS (
    SELECT user_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
SELECT user_id, count(*) AS n_tail, round(avg(value), 6) AS v_avg
FROM r WHERE rn <= 20
GROUP BY user_id
""",
)
def w4_tail_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    r = t.events.select("user_id", "value", F.row_number().over(w).alias("rn"))
    return (
        r.filter(F.col("rn") <= 20)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_tail"), F.round(F.avg("value"), 6).alias("v_avg"))
    )


# -- W5: sequence materialization digest (dataset.py:233-303) ---------------
# The array-valued operator lives in operators/sequences.py; the oracle
# checks an order-sensitive digest (sum of value x position) since the
# driver hash is order-insensitive over rows, not within arrays.

@register(
    "w5_sequence_digest",
    oracle="""
WITH r AS (
    SELECT user_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
)
SELECT user_id,
       count(*) AS seq_len,
       round(sum(value * rn), 4) AS seq_dot,
       round(sum(CASE WHEN rn <= 5 THEN value END), 6) AS head5_sum
FROM r
GROUP BY user_id
""",
)
def w5_sequence_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    r = t.events.select("user_id", "value", F.row_number().over(_W()).alias("rn"))
    return r.groupBy("user_id").agg(
        F.count("*").alias("seq_len"),
        F.round(F.sum(F.col("value") * F.col("rn")), 4).alias("seq_dot"),
        F.round(F.sum(F.when(F.col("rn") <= 5, F.col("value"))), 6).alias("head5_sum"),
    )


# -- O4: top-1 per group by metric, deterministic tie-break -----------------
# (train_ensemble.py:212 best-model argmax)

@register(
    "o4_top1_per_group",
    shadow_oracle="""
WITH r AS (
    SELECT event_type, event_id, value,
           row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
    FROM events
)
SELECT event_type, event_id, value FROM r WHERE rn = 1
""",
)
def o4_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        t.events.select("event_type", "event_id", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# -- Sessionization: gap-based session ids (training-pipeline staple) -------

@register(
    "w_sessionize",
    oracle="""
WITH ordered AS (
    SELECT user_id, ts, value,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL 2 DAY
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
),
tagged AS (
    SELECT user_id, ts, value,
           CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM ordered
)
SELECT user_id, session_id,
       count(*) AS n_events,
       round(sum(value), 4) AS session_value,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
FROM tagged
GROUP BY user_id, session_id
""",
)
def w_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts after a >2-day
    silence. lag + running-sum over one (user, ts) window — a single
    sort shuffle shared by both window functions, then the session agg
    reuses the same partitioning (streaming analog: session_window)."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.lag("ts").over(w)
    # NTZ -> instant -> epoch seconds (identity under the UTC session tz).
    secs = lambda c: c.cast("timestamp").cast("long")  # noqa: E731
    new_s = (
        prev.isNull() | (secs(F.col("ts")) - secs(prev) > 2 * 86400)
    ).cast("int")
    tagged = t.events.select(
        "user_id", "ts", "value", new_s.alias("new_session")
    ).withColumn("session_id", F.sum("new_session").over(wrun))
    return tagged.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("session_value"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )


# -- Native session windows (streaming-capable twin of w_sessionize) --------

@register(
    "w_session_window",
    oracle="""
WITH ordered AS (
    SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 2 DAY
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
tagged AS (
    SELECT user_id, ts, value,
           sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM ordered
)
SELECT user_id,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts) + INTERVAL 2 DAY) AS session_end_us,
       count(*) AS n_events,
       round(sum(value), 4) AS session_value
FROM tagged
GROUP BY user_id, sid
""",
)
def w_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window (gap = 2 days): the same session
    semantics as w_sessionize but via the built-in, which also runs
    under Structured Streaming with watermark-based state eviction
    (see tests/test_streaming.py for the streaming parity check).
    Session bounds compared as epoch microseconds — exact integers on
    both engines."""
    t = Tables(spark, sf_dir)
    ts_instant = F.col("ts").cast("timestamp")
    return (
        t.events.groupBy(
            "user_id", F.session_window(ts_instant, "2 days").alias("sw")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            F.unix_micros(F.col("sw.end")).alias("session_end_us"),
            "n_events",
            "session_value",
        )
    )


@register(
    "w_rank_functions",
    shadow_oracle="""
SELECT user_id, event_id,
       round(value, 6) AS v,
       round(lead(value) OVER w, 6) AS next_v,
       round(first_value(value) OVER w, 6) AS first_v,
       rank() OVER (PARTITION BY user_id ORDER BY round(value, 6) DESC)
           AS value_rank,
       round(percent_rank() OVER (PARTITION BY user_id
                                  ORDER BY round(value, 6)), 6) AS pct_rank,
       round(cume_dist() OVER (PARTITION BY user_id
                               ORDER BY round(value, 6)), 6) AS cdist
FROM events
WHERE user_id < 10
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def w_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking/navigation window family in one bundle:
    lead / first_value over the event-time frame, rank / percent_rank /
    cume_dist over the value order — every function per-key-partitioned
    (no global window). Ranks order by the ROUNDED value on both
    engines so float noise cannot flip tie groups."""
    t = Tables(spark, sf_dir)
    ev = t.events.filter(F.col("user_id") < 10)
    wt = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v6 = F.round("value", 6)
    wv_desc = Window.partitionBy("user_id").orderBy(v6.desc())
    wv_asc = Window.partitionBy("user_id").orderBy(v6.asc())
    return ev.select(
        "user_id",
        "event_id",
        v6.alias("v"),
        F.round(F.lead("value").over(wt), 6).alias("next_v"),
        F.round(F.first("value").over(wt), 6).alias("first_v"),
        F.rank().over(wv_desc).cast("long").alias("value_rank"),
        F.round(F.percent_rank().over(wv_asc), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(wv_asc), 6).alias("cdist"),
    )


@register(
    "w_rolling_range",
    oracle="""
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       CAST(count(*) OVER w AS BIGINT) AS n_7d,
       round(sum(value) OVER w, 4) AS sum_7d,
       round(avg(value) OVER w, 6) AS avg_7d
FROM events
WINDOW w AS (
    PARTITION BY user_id ORDER BY ts
    RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
""",
)
def w_rolling_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-RANGE rolling aggregates (trailing 7 days per user) — the
    rangeBetween window, not rowsBetween: irregular event spacing means
    row-count frames are wrong for temporal features. One sort shuffle
    per user partition serves all three aggregates; at 100 TB the frame
    is bounded by arrival rate x 7 days, never the partition. DuckDB's
    RANGE INTERVAL frame states the identical semantics."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    secs = F.col("ts").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(secs)
        .rangeBetween(-7 * 86400, 0)
    )
    return t.events.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.count(F.lit(1)).over(w).alias("n_7d"),
        F.round(F.sum("value").over(w), 4).alias("sum_7d"),
        F.round(F.avg("value").over(w), 6).alias("avg_7d"),
    )


@register(
    "w_resample_ffill",
    oracle="""
WITH bounds AS (
    SELECT user_id,
           CAST(min(ts) AS DATE) AS d0,
           CAST(max(ts) AS DATE) AS d1
    FROM events GROUP BY user_id
), grid AS (
    SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
    FROM bounds
), daily AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
           round(sum(value), 4) AS day_value
    FROM events GROUP BY 1, 2
)
SELECT g.user_id,
       strftime(g.day, '%Y-%m-%d') AS day,
       round(last_value(d.day_value IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS value_ffill,
       CASE WHEN d.day_value IS NULL THEN 1 ELSE 0 END AS gap_filled
FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
""",
)
def w_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar resampling with forward-fill: each user's daily value
    series on a COMPLETE per-user day grid (min..max), gaps carrying
    the last observation forward (the classic time-series regularizer
    before windowed features / sequence models). Grid = sequence()
    explode of per-user bounds (map-side after one bounds agg); fill =
    last(ignorenulls) running window. Day cast, not date_trunc: both
    engines drop the time component identically."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    ev = t.events.withColumn("day", F.col("ts").cast("date"))
    bounds = ev.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("interval 1 day"))
        ).alias("day"),
    )
    daily = ev.groupBy("user_id", "day").agg(
        F.round(F.sum("value"), 4).alias("day_value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(
                F.last("day_value", ignorenulls=True).over(w), 4
            ).alias("value_ffill"),
            F.when(F.col("day_value").isNull(), 1).otherwise(0).alias(
                "gap_filled"
            ),
        )
    )


# -- Ordered recursive fold: per-user EWMA (exponential smoothing) ----------

@register(
    "w_ewma",
    shadow_oracle="""
WITH s AS (
    SELECT user_id,
           list(value ORDER BY epoch_us(ts), event_id) AS vals
    FROM events GROUP BY user_id
)
SELECT user_id,
       len(vals) AS n,
       round(list_reduce(vals, (acc, v) -> acc * 0.8 + v * 0.2), 6)
           AS ewma,
       round(vals[-1], 6) AS last_value
FROM s
""",
)
def w_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average (alpha=0.2,
    seeded with the first observation) — the ORDER-DEPENDENT recursive
    fold no plain aggregate can express: s_i = 0.8*s_{i-1} + 0.2*v_i
    is a sequential recurrence, so it runs as one sorted collect per
    key + a Catalyst ``aggregate`` lambda over the array (JVM-side,
    zero Python). Both engines fold the IDENTICAL value order (epoch
    micros, event_id tiebreak) with the identical seed convention
    (DuckDB's list_reduce seeds acc with the first element; the Spark
    side mirrors it as aggregate(slice(vals,2,..), vals[0], ..)), so
    the float sequence is bit-identical — same IEEE ops in the same
    order — not merely close. At 100 TB this is one hash exchange per
    key (the same shuffle a groupBy needs) with per-key state bounded
    by the sequence length, the W5 sequence-materialization posture;
    unbounded streams hand the same recurrence to the streaming tier's
    applyInPandasWithState instead."""
    t = Tables(spark, sf_dir)
    seq = (
        t.events.select(
            "user_id",
            F.struct(
                F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
                F.col("event_id").alias("event_id"),
                F.col("value").alias("value"),
            ).alias("e"),
        )
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("e")).alias("es"))
        .withColumn("vals", F.expr("transform(es, x -> x.value)"))
    )
    return seq.select(
        "user_id",
        F.size("vals").alias("n"),
        F.round(
            F.expr(
                "aggregate(slice(vals, 2, size(vals) - 1), "
                "vals[0], (acc, v) -> acc * 0.8d + v * 0.2d)"
            ),
            6,
        ).alias("ewma"),
        F.round(F.element_at("vals", -1), 6).alias("last_value"),
    )


# -- Sliding-window distinct counts: exact + sketch-merge scale path --------

@register(
    "w_sliding_distinct",
    shadow_oracle="""
WITH du AS (
    SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
days AS (SELECT DISTINCT day FROM du),
contrib AS (
    SELECT CAST(day + i.i * INTERVAL 1 DAY AS DATE) AS win_day, user_id
    FROM du CROSS JOIN (SELECT unnest(range(7)) AS i) i
)
SELECT strftime(c.win_day, '%Y-%m-%d') AS win_day,
       count(DISTINCT c.user_id) AS n_users_7d
FROM contrib c JOIN days d ON c.win_day = d.day
GROUP BY 1
""",
)
def w_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day, EXACT, via the
    explode-to-covering-windows rewrite: distinct counts do NOT
    decompose over sliding windows (yesterday's window shares users
    with today's), so the naive form re-scans 7 days of raw events per
    output day. Instead each DAY-GRAIN distinct (day, user) pair is
    exploded to the <=7 window-end days it contributes to and one
    count_distinct per window finishes — the amplification is a
    bounded 7x of the day-grain pair table (already tiny vs raw
    events), never 7x the raw scan. Window-end days outside the
    observed day set are dropped by a broadcast semi-join (the day
    dimension is O(calendar), always broadcastable). Dates travel as
    yyyy-MM-dd strings for an engine-stable hash (w_resample_ffill
    convention)."""
    t = Tables(spark, sf_dir)
    du = t.events.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct().withColumnRenamed("day", "win_day")
    contrib = du.select(
        F.explode(F.expr("sequence(day, date_add(day, 6))")).alias("win_day"),
        "user_id",
    )
    return (
        contrib.join(F.broadcast(days), "win_day", "left_semi")
        .groupBy("win_day")
        .agg(F.countDistinct("user_id").alias("n_users_7d"))
        .select(
            F.date_format("win_day", "yyyy-MM-dd").alias("win_day"),
            "n_users_7d",
        )
    )


@register("w_sliding_distinct_hll")  # rows-only: HLL estimate, not SQL-exact
def w_sliding_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB shape of w_sliding_distinct: ONE 4-KiB HLL sketch per
    day, exploded to its <=7 covering windows and hll_union_agg-merged
    per window — the shuffle carries O(days x 7) sketches regardless
    of user cardinality, where the exact form's (win_day, user) pair
    shuffle grows with distinct users. Same two-exchange plan shape;
    estimate error bounded by lg_k=12 (~1.6% relative), pinned against
    the exact twin in tests/test_operators.py."""
    t = Tables(spark, sf_dir)
    ev = t.events.select(F.to_date("ts").alias("day"), "user_id")
    daily = ev.groupBy("day").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sketch")
    )
    days = daily.select("day").withColumnRenamed("day", "win_day")
    contrib = daily.select(
        F.explode(F.expr("sequence(day, date_add(day, 6))")).alias("win_day"),
        "sketch",
    )
    return (
        contrib.join(F.broadcast(days), "win_day", "left_semi")
        .groupBy("win_day")
        .agg(F.hll_union_agg("sketch").alias("sk"))
        .select(
            F.date_format("win_day", "yyyy-MM-dd").alias("win_day"),
            F.hll_sketch_estimate("sk").cast("long").alias("est_users_7d"),
        )
    )


# -- Session-scoped ordered pattern match (MATCH_RECOGNIZE-lite) ------------

@register(
    "w_pattern_match",
    shadow_oracle="""
WITH ordered AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL 2 DAY
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
),
tagged AS (
    SELECT user_id, ts, event_id, event_type,
           CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
    FROM ordered
),
seq AS (
    SELECT user_id, session_id,
           list(event_type ORDER BY epoch_us(ts), event_id) AS types
    FROM tagged GROUP BY user_id, session_id
),
m AS (
    SELECT user_id,
           list_position(types, 'view') AS p1,
           CASE WHEN p1 = 0 THEN 0
                ELSE list_position(types[p1+1:], 'click') END AS p2,
           CASE WHEN p2 = 0 THEN 0
                ELSE list_position(types[p1+p2+1:], 'purchase') END AS p3,
           CASE WHEN p3 > 0 THEN 1 ELSE 0 END AS matched
    FROM seq
)
SELECT user_id,
       count(*) AS n_sessions,
       CAST(sum(matched) AS BIGINT) AS n_matched,
       round(sum(matched) * 1.0 / count(*), 6) AS match_rate
FROM m GROUP BY user_id
""",
)
def w_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-subsequence pattern detection per session
    (MATCH_RECOGNIZE-lite): does a session contain view -> click ->
    purchase IN ORDER (other events may interleave)? The match runs as
    a greedy finite-state fold over each session's time-ordered event
    types — a Catalyst ``aggregate`` lambda stepping '' -> 'v' -> 'vc'
    -> 'vcp' — which is the textbook subsequence automaton: greedy
    stage advance is exact for subsequence containment. Sessions are
    the same 2-day-gap construction as w_sessionize (lag + running
    sum, one sort shuffle); the session agg and the per-user rollup
    reuse that partitioning. The 100 TB posture is W5's: per-session
    arrays are bounded by session length, state per row is one enum
    string, and nothing re-scans — contrast with a per-pattern-stage
    self-join (funnel a_funnel_conversion's global form), which pays
    one join per stage. The DuckDB oracle is an INDEPENDENT
    formulation — the greedy first-occurrence position chain
    (list_position on successive suffixes, chained through lateral
    aliases), equivalent to the automaton by the greedy-subsequence
    argument — deliberately NOT list_reduce: DuckDB 1.0's list_reduce
    returned run-to-run varying states on this workload's agg-produced
    string lists (observed; lists themselves stable, fold unstable),
    so the oracle sticks to pure deterministic list functions."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # running sum MUST order by the full (ts, event_id) key: with ts
    # alone, tied timestamps at a session boundary get nondeterministic
    # membership — n_sessions stays stable but WHICH events fall in
    # which session flips between engines/runs, and a subsequence
    # match is sensitive to exactly that (observed: user 9's boundary
    # purchase flipping sessions flipped the match).
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    secs = lambda c: c.cast("timestamp").cast("long")  # noqa: E731
    prev = F.lag("ts").over(w)
    new_s = (
        prev.isNull() | (secs(F.col("ts")) - secs(prev) > 2 * 86400)
    ).cast("int")
    tagged = t.events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        new_s.alias("new_session"),
    ).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("new_session").over(wrun).cast("long").alias("session_id"),
    )
    seq = (
        tagged.select(
            "user_id",
            "session_id",
            F.struct(
                F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
                F.col("event_id").alias("event_id"),
                F.col("event_type").alias("event_type"),
            ).alias("e"),
        )
        .groupBy("user_id", "session_id")
        .agg(F.array_sort(F.collect_list("e")).alias("es"))
        .withColumn("types", F.expr("transform(es, x -> x.event_type)"))
    )
    matched = (
        F.expr(
            "aggregate(types, '', (acc, v) -> CASE "
            "WHEN acc = ''   AND v = 'view'     THEN 'v' "
            "WHEN acc = 'v'  AND v = 'click'    THEN 'vc' "
            "WHEN acc = 'vc' AND v = 'purchase' THEN 'vcp' "
            "ELSE acc END)"
        )
        == "vcp"
    ).cast("long")
    m = seq.select("user_id", matched.alias("matched"))
    return m.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("matched").alias("n_matched"),
        F.round(F.sum("matched") / F.count("*"), 6).alias("match_rate"),
    )


# -- beyond ref: interval union (gaps-and-islands coverage merge) -----------

@register(
    "w_interval_merge",
    shadow_oracle="""
WITH iv AS (
    SELECT user_id, event_id,
           epoch_us(ts) AS s,
           epoch_us(ts) + CAST(round(value * 100) AS BIGINT) * 600000 AS e
    FROM events
),
flagged AS (
    SELECT user_id, s, e,
           CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS opens
    FROM (
        SELECT user_id, s, e, event_id,
               max(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        FROM iv
    )
),
islands AS (
    SELECT user_id, s, e,
           CAST(sum(opens) OVER (PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS island_id
    FROM flagged
)
SELECT user_id, island_id,
       min(s) AS island_start, max(e) AS island_end,
       count(*) AS n_members
FROM islands
GROUP BY user_id, island_id
""",
)
def w_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval UNION per user (gaps-and-islands): each event opens a
    [ts, ts + value-minutes] activity interval; overlapping intervals
    merge into maximal islands with per-island bounds and membership.
    The coverage primitive (uptime/SLA accounting, A4's coverage ratio
    generalized to overlap-aware time math) that GROUP BY alone cannot
    express. All outputs are exact BIGINTs: duration arithmetic stays
    integral (round(value*100)*600000 us — never a double cast, whose
    truncate-vs-round semantics differ between engines). ONE user-hash
    sort shuffle feeds both window passes; islands collapse map-side
    in the final agg."""
    from ..operators.interval_join import merge_intervals

    t = Tables(spark, sf_dir)
    iv = t.events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.round(F.col("value") * 100).cast("long") * 600000
        ).alias("e"),
    )
    return merge_intervals(iv, "user_id", "s", "e", tiebreak="event_id").select(
        "user_id",
        "island_id",
        F.col("island_start").alias("island_start"),
        F.col("island_end").alias("island_end"),
        "n_members",
    )


@register(
    "w_cumulative_distinct",
    shadow_oracle="""
WITH firsts AS (
    SELECT event_type, user_id, min(CAST(ts AS DATE)) AS first_day
    FROM events GROUP BY event_type, user_id
), daily AS (
    SELECT event_type, first_day AS day, count(*) AS n_new_users
    FROM firsts GROUP BY event_type, first_day
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(n_new_users AS BIGINT) AS n_new_users,
       CAST(sum(n_new_users) OVER (PARTITION BY event_type ORDER BY day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_distinct_users
FROM daily
""",
)
def w_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per (event_type, day) — round-8
    addition: running
    COUNT(DISTINCT) doesn't decompose over an expanding window, but
    each user contributes exactly once — on their FIRST day — so the
    running distinct count is the cumsum of first appearances: one
    per-(type, user) min agg + one day agg + a window over the
    #types x #days-row table. The expanding-window sibling of w_sliding_distinct (whose
    trailing-window form can't use the first-day trick). Never
    re-scans a day twice; no distinct over any window."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    firsts = t.events.groupBy("event_type", "user_id").agg(
        F.min(F.to_date("ts")).alias("day")
    )
    daily = firsts.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_new_users")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_new_users").cast("long").alias("n_new_users"),
        F.sum("n_new_users").over(w).cast("long").alias("cum_distinct_users"),
    )


# -- beyond ref: CUSUM changepoint scan (exact integer arithmetic) ----------

@register(
    "w_cusum_changepoint",
    shadow_oracle="""
WITH q AS (
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           CAST(round(value * 1000000) AS BIGINT) AS v_int
    FROM events
), w AS (
    SELECT user_id, v_int,
           row_number() OVER win AS rn,
           sum(v_int) OVER win AS cum_int,
           count(*) OVER (PARTITION BY user_id) AS n,
           sum(v_int) OVER (PARTITION BY user_id) AS tot_int
    FROM q
    WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), d AS (
    SELECT user_id, rn, n, abs(cum_int * n - rn * tot_int) AS dev
    FROM w
), r AS (
    SELECT user_id, n, rn, dev,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY dev DESC, rn ASC) AS pick
    FROM d
)
SELECT user_id, n,
       rn AS changepoint_rn,
       round(dev / (n * 1000000.0), 6) AS max_cusum
FROM r WHERE pick = 1
""",
)
def w_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key CUSUM changepoint scan: the offline mean-shift detector
    (Page 1954 / binary-segmentation first split) — for each user, the
    position maximizing |cumsum_k(v) - k/n * total(v)|, i.e. where the
    prefix mean most departs from the global mean. The float form of
    that statistic is an ORDER-DEPENDENT running sum whose low bits
    differ between engines, so both sides compute it in EXACT BIGINT
    arithmetic: value quantized to micro-units, and the deviation
    tested as |cum*n - rn*tot| (the x n*1e6 rescale of the statistic)
    — pure integer ops, bit-identical everywhere; the one float op
    (the final /(n*1e6) display rescale) is a single IEEE divide on
    both engines. Magnitude audit: |v_int| <= ~1e9 (value <= ~1e3),
    per-user cum <= rows_per_key x 1e9, x n again — safe under 2^63
    through ~1e4 rows/key at this value scale; a production deployment
    would drop to 128-bit decimal sums past that. Plan: ONE hash
    exchange on user_id + one sort serves rn/cum (ordered window) and
    n/tot (partition-only window); the argmax is a partial-aggregable
    max_by on the same partitioning — no second shuffle. The oracle is
    the independent row_number-pick SQL formulation."""
    t = Tables(spark, sf_dir)
    q = t.events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.round(F.col("value") * 1_000_000).cast("bigint").alias("v_int"),
    )
    win = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wrun = win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wp = Window.partitionBy("user_id")
    d = q.select(
        "user_id",
        F.row_number().over(win).alias("rn"),
        F.sum("v_int").over(wrun).alias("cum_int"),
        F.count("*").over(wp).alias("n"),
        F.sum("v_int").over(wp).alias("tot_int"),
    ).select(
        "user_id",
        "rn",
        "n",
        F.abs(
            F.col("cum_int") * F.col("n") - F.col("rn") * F.col("tot_int")
        ).alias("dev"),
    )
    # max_by over (dev, -rn): largest deviation, FIRST position on ties —
    # exact integers, so the argmax is engine-deterministic.
    best = d.groupBy("user_id").agg(
        F.max("n").alias("n"),
        F.max_by(
            F.struct(F.col("rn"), F.col("dev")),
            F.struct(F.col("dev"), (-F.col("rn")).alias("neg_rn")),
        ).alias("best"),
    )
    return best.select(
        "user_id",
        "n",
        F.col("best.rn").alias("changepoint_rn"),
        F.round(F.col("best.dev") / (F.col("n") * F.lit(1_000_000.0)), 6).alias(
            "max_cusum"
        ),
    )


# -- beyond ref: hopping (sliding time) window aggregation ------------------

# Shared between the batch query below and streamq.stream_hopping_window —
# the twin-equivalence claim ("same SQL, transitively hash-equal") is
# enforced structurally by both register() sites referencing THIS
# constant, not hand-synced copies.
HOPPING_ORACLE_SQL = """
WITH e AS (
    SELECT CAST(floor(epoch_us(ts) / 900000000) AS BIGINT) * 900000000
               AS slot0,
           value
    FROM events
), x AS (
    SELECT slot0 - k.k * 900000000 AS win_start, value
    FROM e CROSS JOIN (SELECT unnest(range(4)) AS k) k
)
SELECT win_start, count(*) AS n_events, round(sum(value), 4) AS v_sum
FROM x GROUP BY win_start
"""


@register(
    "w_hopping_window",
    shadow_oracle=HOPPING_ORACLE_SQL,
)
def w_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregation (size 1 h, hop 15 min) as a BATCH
    query — the overlap-explode rewrite: every event belongs to exactly
    size/hop = 4 aligned windows, so each row emits its 4 window-start
    keys and ONE hash agg finishes. The 4x pre-agg amplification is
    map-local and collapses to O(#slots) per partition via partial
    aggregation — the shuffle carries window partials, never the 4x
    rows (contrast a self-join against a window dimension, which
    shuffles raw events per window). Window starts travel as BIGINT
    epoch-us (exact arithmetic, engine-stable hash). The streaming twin
    is stream_hopping_window (same window spec through
    Structured Streaming's window(); parity-tested)."""
    t = Tables(spark, sf_dir)
    hop_us = 900_000_000  # 15 min
    e = t.events.select(
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(hop_us)
            ).cast("bigint")
            * hop_us
        ).alias("slot0"),
        "value",
    )
    x = e.select(
        "slot0", "value", F.explode(F.expr("sequence(0, 3)")).alias("k")
    ).select(
        (
            F.col("slot0") - F.col("k").cast("bigint") * F.lit(hop_us)
        ).alias("win_start"),
        "value",
    )
    return x.groupBy("win_start").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("v_sum"),
    )


# -- beyond ref: session path mining (top ordered event-type paths) ---------

@register(
    "w_session_paths",
    shadow_oracle="WITH "
    + SESSION_SQL_CTE
    + """, p AS (
    SELECT user_id, session_id,
           string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path
    FROM s GROUP BY user_id, session_id
), c AS (
    SELECT path, count(*) AS n_sessions FROM p GROUP BY path
), r AS (
    SELECT path, n_sessions,
           row_number() OVER (ORDER BY n_sessions DESC, path) AS rk
    FROM c
)
SELECT rk, path, n_sessions FROM r WHERE rk <= 50
""",
)
def w_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 session event-type paths (clickstream path mining): the
    2-day-gap sessions of w_sessionize, each session's time-ordered
    event types joined into a path string, counted across ALL sessions
    and ranked. Ordering inside a path is pinned by (ts_us, event_id)
    — the same boundary-determinism lesson as w_pattern_match. Scale
    shape: sessionization is one sort shuffle on user_id; the path agg
    reuses that partitioning (session_id is user-scoped); the path
    frequency count is one hash agg on the path string; and the top-50
    runs as TakeOrderedAndProject (rank recomputed on the <=50
    survivors in a single bounded partition — never a global sort of
    the full path table). Ties are impossible in the final rank: the
    (n_sessions DESC, path ASC) order is total because paths are
    unique after the count agg."""
    t = Tables(spark, sf_dir)
    tagged = sessionize_2day(t.events)
    paths = (
        tagged.select(
            "user_id",
            "session_id",
            F.struct("ts_us", "event_id", "event_type").alias("e"),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.expr("transform(array_sort(collect_list(e)), x -> x.event_type)"),
                ">",
            ).alias("path")
        )
    )
    top = (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(50)
    )
    wr = Window.orderBy(F.col("n_sessions").desc(), "path")
    return top.select(
        F.row_number().over(wr).alias("rk"), "path", "n_sessions"
    )


# -- beyond ref: exact rolling median (order-statistic window) --------------

@register(
    "w_rolling_median",
    shadow_oracle="""
WITH r AS (
    SELECT user_id, event_id, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts), event_id) AS rn,
           round(quantile_cont(value, 0.5) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS med7
    FROM events
)
SELECT user_id, rn, event_id, round(value, 6) AS value, med7
FROM r
""",
)
def w_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key trailing-7-row EXACT rolling median — the robust
    smoother a rolling mean can't be (one spike drags a mean for 7
    rows; the median ignores it). Order statistics don't decompose
    incrementally, so each frame pays an O(w log w) selection — Spark
    runs the exact interpolated percentile(0.5) aggregate over the
    moving ROWS frame, DuckDB its quantile_cont, which share the
    (n-1)*q linear-interpolation definition; frame membership is
    pinned by the (ts_us, event_id) total order so both engines
    select the identical 7 values. Scale: ONE hash exchange + sort on
    the key — the same plan as any ordered window; w=7 keeps the
    per-frame cost constant. The fixed-size-state alternative at
    large w is the GK/t-digest sketch path (sketch_value_quantiles),
    registered separately."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    r = t.events.select(
        "user_id",
        "event_id",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return r.select(
        "user_id",
        F.row_number().over(w).alias("rn"),
        "event_id",
        F.round("value", 6).alias("value"),
        F.round(
            F.expr("percentile(value, 0.5d)").over(w.rowsBetween(-6, 0)), 6
        ).alias("med7"),
    )


# -- beyond ref: time-weighted average (irregular-series TWAP) --------------

@register(
    "w_time_weighted_avg",
    shadow_oracle="""
WITH s AS (
    SELECT user_id, value,
           lead(epoch_us(ts)) OVER w - epoch_us(ts) AS dt_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
)
SELECT user_id,
       count(*) AS n_intervals,
       CAST(sum(dt_us) AS BIGINT) AS span_us,
       round(sum(value * dt_us) / sum(dt_us), 6) AS twap
FROM s WHERE dt_us IS NOT NULL
GROUP BY user_id
""",
)
def w_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average over an IRREGULAR series (TWAP): each
    observation holds until the next one, so its weight is its holding
    duration — the correction plain avg() silently gets wrong whenever
    sampling density correlates with the value (bursty high readings
    dominate an unweighted mean). The last observation per key carries
    no duration and is excluded (step-function convention). Durations
    are exact epoch-us BIGINTs from one lead() window; the weighted
    sum is the only float path, rounded at 6. Scale: ONE hash exchange
    + sort per key, agg reuses the partitioning — the same plan family
    as every ordered per-key op here."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    s = t.events.select(
        "user_id",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
    ).select(
        "user_id",
        "value",
        (F.lead("ts_us").over(w) - F.col("ts_us")).alias("dt_us"),
    )
    return (
        s.filter(F.col("dt_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum("dt_us").cast("bigint").alias("span_us"),
            F.round(
                F.sum(F.col("value") * F.col("dt_us")) / F.sum("dt_us"), 6
            ).alias("twap"),
        )
    )


# -- beyond ref: local peak detection (lag/lead neighborhood test) ----------

@register(
    "w_peak_detection",
    shadow_oracle="""
WITH s AS (
    SELECT user_id, event_id, value,
           row_number() OVER w AS rn,
           lag(value)  OVER w AS pv,
           lead(value) OVER w AS nv
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), p AS (
    SELECT user_id, rn, event_id, value
    FROM s
    WHERE pv IS NOT NULL AND nv IS NOT NULL
      AND value > pv AND value > nv
      AND value - greatest(pv, nv) >= 0.5
)
SELECT user_id,
       count(*) AS n_peaks,
       round(max(value), 6) AS max_peak,
       CAST(min(rn) AS BIGINT) AS first_peak_rn
FROM p GROUP BY user_id
""",
)
def w_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local peak detection per key: a strict local maximum over both
    immediate neighbors with a minimum prominence of 0.5 over the
    higher neighbor — the spike-mining primitive behind alerting and
    burst features (the CUSUM query finds ONE global shift; this finds
    every local spike). Endpoints are excluded (a boundary value has
    only one neighbor — not a peak by this definition). Strict
    inequalities make tied plateaus peak-free, which is deliberate and
    engine-stable; all comparisons are raw column values, no floats
    manufactured. Plan: ONE key exchange + sort serves rn/lag/lead;
    the per-key rollup reuses the partitioning."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    s = t.events.select(
        "user_id",
        "event_id",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    ).select(
        "user_id",
        "event_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.lag("value").over(w).alias("pv"),
        F.lead("value").over(w).alias("nv"),
    )
    p = s.filter(
        F.col("pv").isNotNull()
        & F.col("nv").isNotNull()
        & (F.col("value") > F.col("pv"))
        & (F.col("value") > F.col("nv"))
        & (F.col("value") - F.greatest("pv", "nv") >= 0.5)
    )
    return p.groupBy("user_id").agg(
        F.count("*").alias("n_peaks"),
        F.round(F.max("value"), 6).alias("max_peak"),
        F.min("rn").cast("bigint").alias("first_peak_rn"),
    )


# -- beyond ref: run-length streaks (gaps-and-islands) ----------------------

@register(
    "w_streak_runs",
    shadow_oracle="""
WITH o AS (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id)
         - row_number() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS grp
    FROM events
), runs AS (
    SELECT user_id, event_type, grp, count(*) AS len
    FROM o GROUP BY user_id, event_type, grp
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(max(len) AS BIGINT) AS max_len,
       round(avg(len), 4) AS avg_len,
       CAST(sum(CASE WHEN len >= 3 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_streaks_3plus
FROM runs GROUP BY event_type
""",
)
def w_streak_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-repeat streaks per event type via the classic
    gaps-and-islands identity: within a user's (ts, event_id) total
    order, rn_overall − rn_within_type is CONSTANT exactly along a
    maximal run of the same type, so grouping on that difference
    materializes every run without a self-join. The behavioral
    signal: long streaks of one event type are the bot/retry
    signature (w_peak_detection finds value bursts; this finds
    REPETITION bursts). Scale: both row_numbers ride ONE user-key
    exchange (the second window refines the first's partitioning);
    the run agg and the type rollup are partial-aggregated."""
    t = Tables(spark, sf_dir)
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    o = t.events.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias(
            "grp"
        ),
    )
    runs = o.groupBy("user_id", "event_type", "grp").agg(
        F.count("*").alias("len")
    )
    return runs.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_streaks"),
        F.max("len").cast("bigint").alias("max_len"),
        F.round(F.avg("len"), 4).alias("avg_len"),
        F.sum(F.when(F.col("len") >= 3, 1).otherwise(0))
        .cast("bigint")
        .alias("n_streaks_3plus"),
    )


# -- beyond ref: inter-arrival gap profile (freshness / liveness) -----------

@register(
    "w_gap_stats",
    shadow_oracle="""
WITH g AS (
    SELECT user_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ) AS gap_us
    FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_gaps,
       round(avg(gap_us) / 1e6, 4) AS avg_gap_s,
       round(quantile_cont(gap_us, 0.5) / 1e6, 4) AS p50_gap_s,
       round(max(gap_us) / 1e6, 4) AS max_gap_s,
       CAST(sum(CASE WHEN gap_us > 86400000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_gaps_1d
FROM g WHERE gap_us IS NOT NULL
GROUP BY user_id
""",
)
def w_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival gap profile — the freshness/liveness
    readout (w_sessionize CUTS on a fixed 2-day gap; this MEASURES the
    gap distribution so that threshold can be chosen, and flags users
    whose feeds stall >1 day). Gaps are computed in epoch-microseconds
    (the sessions-CTE convention) so sub-second spacing survives;
    single-event users have no gap and drop out identically in both
    engines. The exact p50 is fine at per-user cardinality; at 100 TB
    the same shape swaps to approx_percentile (a_percentiles_approx
    pattern). Scale: ONE user-key exchange serves the lag sort and the
    per-user rollup reuses the partitioning; per-user state in the
    percentile is bounded by that user's event count."""
    t = Tables(spark, sf_dir)
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(ts_us, "event_id")
    g = t.events.select(
        "user_id", (ts_us - F.lag(ts_us).over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    return g.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        F.round(F.avg("gap_us") / 1e6, 4).alias("avg_gap_s"),
        F.round(F.percentile("gap_us", F.lit(0.5)) / 1e6, 4).alias(
            "p50_gap_s"
        ),
        F.round(F.max("gap_us") / 1e6, 4).alias("max_gap_s"),
        F.sum(F.when(F.col("gap_us") > 86_400_000_000, 1).otherwise(0))
        .cast("bigint")
        .alias("n_gaps_1d"),
    )
