"""Window / ordered-operation queries — SURVEY.md §2.5 (W1–W6) + O4.

Each query pins a deterministic total order (ts, event_id) so the
row_number-based operators are reproducible across engines — the
reference gets determinism for free from its global pre-sort
(loader.py:97); a distributed engine must make the tie-break explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import Tables
from .registry import register

_W = lambda: Window.partitionBy("user_id").orderBy("ts", "event_id")  # noqa: E731


# -- W1/O1: partitioned sort exposed via ordered head rows ------------------
# (loader.py:97 sort_values([hive, ts]); determinism via rank projection)

@register(
    "w1_ordered_head",
    oracle="""
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
    oracle="""
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
    oracle="""
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
