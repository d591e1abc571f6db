"""Aggregation queries — SURVEY.md §2.4 (A1–A14) + A2 moments.

Each query is a single-pass 2-phase hash aggregation (or an explicit
two-level agg where the reference semantics are agg-of-agg). The
reference computes all of these with per-measure pandas loops
(preprocessing.py:101-138, 229-273, 338-358); here every bundle is one
``agg(*exprs)`` so Catalyst plans one shuffle regardless of how many
stat columns are requested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.sessions import SESSION_SQL_CTE, sessionize_2day
from ..io import Tables
from ..operators.parallelism import fan_out
from ..operators.moments import grouped_moments, moments_sql
from ..operators.stats_bundle import delta_stats, stats_bundle
from .registry import register

# -- A1/A4: grouped stats bundle (preprocessing.py:110-115,133-138) ---------

@register(
    "a1_stats_bundle",
    oracle="""
SELECT l_returnflag, l_linestatus,
       count(l_quantity) AS l_quantity_n,
       round(avg(l_quantity), 6) AS l_quantity_avg,
       round(stddev_samp(l_quantity), 6) AS l_quantity_std,
       min(l_quantity) AS l_quantity_min,
       max(l_quantity) AS l_quantity_max,
       round(max(l_quantity) - min(l_quantity), 6) AS l_quantity_range,
       count(l_extendedprice) AS l_extendedprice_n,
       round(avg(l_extendedprice), 6) AS l_extendedprice_avg,
       round(stddev_samp(l_extendedprice), 6) AS l_extendedprice_std,
       min(l_extendedprice) AS l_extendedprice_min,
       max(l_extendedprice) AS l_extendedprice_max,
       round(max(l_extendedprice) - min(l_extendedprice), 6) AS l_extendedprice_range
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def a1_stats_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return stats_bundle(
        t.lineitem,
        keys=["l_returnflag", "l_linestatus"],
        measures=["l_quantity", "l_extendedprice"],
        round_to=6,
    )


# -- A2: bias-corrected skew/kurtosis via shared raw-moment formula ---------

@register(
    "a2_higher_moments",
    oracle=f"""
SELECT l_returnflag,{moments_sql("l_quantity")}
FROM lineitem
GROUP BY l_returnflag
""",
)
def a2_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return grouped_moments(t.lineitem, ["l_returnflag"], "l_quantity")


# -- A3/W2: temporal delta stats (preprocessing.py:123-131) -----------------

@register(
    "a3_temporal_deltas",
    oracle="""
WITH d1 AS (
    SELECT user_id, ts, event_id,
           value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dv1
    FROM events
), d2 AS (
    SELECT user_id, dv1,
           dv1 - lag(dv1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dv2
    FROM d1
)
SELECT user_id,
       round(avg(dv1), 6) AS value_d1_mean,
       round(stddev_samp(dv1), 6) AS value_d1_std,
       round(avg(dv2), 6) AS value_d2_mean,
       round(stddev_samp(dv2), 6) AS value_d2_std
FROM d2
GROUP BY user_id
""",
)
def a3_temporal_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return delta_stats(
        t.events,
        keys=["user_id"],
        ts="ts",
        measures=["value"],
        order_tiebreak=["event_id"],
        round_to=6,
    )


# -- A5: calendar-bucket re-aggregation (preprocessing.py:246-261) ----------

@register(
    "a5_calendar_reagg",
    oracle="""
WITH wk AS (
    SELECT user_id, weekofyear(ts) AS wk, avg(value) AS wv
    FROM events GROUP BY 1, 2
),
h AS (
    SELECT user_id, hour(ts) AS hr, avg(value) AS hv
    FROM events GROUP BY 1, 2
),
wka AS (
    SELECT user_id,
           count(*) AS n_weeks,
           round(stddev_samp(wv), 6) AS weekly_std,
           round(max(wv) - min(wv), 6) AS weekly_range
    FROM wk GROUP BY user_id
),
ha AS (
    SELECT user_id, count(*) AS n_hours,
           round(max(hv) - min(hv), 6) AS diurnal_range
    FROM h GROUP BY user_id
)
SELECT wka.user_id, n_weeks, weekly_std, weekly_range, n_hours, diurnal_range
FROM wka JOIN ha ON wka.user_id = ha.user_id
""",
)
def a5_calendar_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 calendar re-agg + A6 diurnal range in one query (merged so the
    whole oracle-backed surface fits the driver's correctness window).
    Two agg-of-agg passes share the events scan; the final join is at
    user grain — tiny relative to the raw table, co-partitioned on the
    same key the sub-aggregations already shuffled on.
    Reference: preprocessing.py:330-358."""
    t = Tables(spark, sf_dir)
    # One explicit hash-partitioning on user_id serves EVERY downstream
    # distribution requirement: HashPartitioning(user) satisfies
    # ClusteredDistribution(user, wk), (user, hr) and (user), so both
    # agg-of-agg chains run shuffle-free after it — and because the two
    # branches share the identical scan+repartition subtree, Spark
    # reuses the exchange (ReusedExchange). Plan went from 4 data
    # exchanges + broadcast to 1 (+1 reused); the "reuse a partitioning
    # across stages" pattern, plan-asserted in test_plan_budgets.
    ev = t.events.select("user_id", "ts", "value").repartition("user_id")
    weekly = (
        ev.groupBy("user_id", F.weekofyear("ts").alias("wk"))
        .agg(F.avg("value").alias("wv"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_weeks"),
            F.round(F.stddev_samp("wv"), 6).alias("weekly_std"),
            F.round(F.max("wv") - F.min("wv"), 6).alias("weekly_range"),
        )
    )
    hourly = (
        ev.groupBy("user_id", F.hour("ts").alias("hr"))
        .agg(F.avg("value").alias("hv"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_hours"),
            F.round(F.max("hv") - F.min("hv"), 6).alias("diurnal_range"),
        )
    )
    return weekly.join(hourly, "user_id")


# -- A7/W6: early-vs-late halves via ntile (preprocessing.py:231-273) -------

@register(
    "a7_half_contrast",
    oracle="""
WITH r AS (
    SELECT user_id, value,
           ntile(2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS half
    FROM events
)
SELECT user_id,
       round(avg(CASE WHEN half = 1 THEN value END), 6) AS first_half_mean,
       round(avg(CASE WHEN half = 2 THEN value END), 6) AS second_half_mean,
       round(avg(CASE WHEN half = 2 THEN value END)
           - avg(CASE WHEN half = 1 THEN value END), 6) AS half_diff
FROM r
GROUP BY user_id
""",
)
def a7_half_contrast(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = t.events.select("user_id", "value", F.ntile(2).over(w).alias("half"))
    first = F.avg(F.when(F.col("half") == 1, F.col("value")))
    second = F.avg(F.when(F.col("half") == 2, F.col("value")))
    return r.groupBy("user_id").agg(
        F.round(first, 6).alias("first_half_mean"),
        F.round(second, 6).alias("second_half_mean"),
        F.round(second - first, 6).alias("half_diff"),
    )


# -- A8/P5: season-scoped stats (preprocessing.py:338-351,438-450) ----------

@register(
    "a8_season_scoped",
    oracle="""
SELECT user_id,
       count(*) AS n,
       round(avg(value), 6) AS v_avg,
       round(stddev_samp(value), 6) AS v_std,
       min(value) AS v_min,
       max(value) AS v_max
FROM events
WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
GROUP BY user_id
""",
)
def a8_season_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.events.filter(
            (F.col("ts") >= "2024-01-05 00:00:00") & (F.col("ts") < "2024-01-15 00:00:00")
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 6).alias("v_avg"),
            F.round(F.stddev_samp("value"), 6).alias("v_std"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
        )
    )


# -- A9: distinct / count-distinct (preprocessing.py:163,313,413,550) -------

@register(
    "a9_distinct_counts",
    shadow_oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events,
       round(count(*) * 1.0 / sum(count(*)) OVER (), 6) AS share
FROM events
GROUP BY event_type
""",
)
def a9_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 distinct counts + A10 frequency-table share in one groupBy
    (merged so the oracle-backed surface fits the driver's correctness
    window). The global share window runs over the |event_type|-row
    post-agg table, never the raw events.
    Reference: preprocessing.py:163,313,413,550,589; trainer.py:362."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    counts = t.events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )
    return counts.withColumn(
        "share",
        F.round(F.col("n_events") / F.sum("n_events").over(Window.partitionBy()), 6),
    )


# -- A10/A11: frequency table + inverse-frequency class weights -------------
# (trainer.py:352-366: w_c = (1/n_c) / sum_c(1/n_c))

@register(
    "a11_class_weights",
    shadow_oracle="""
WITH c AS (SELECT o_orderstatus AS label, count(*) AS n FROM orders GROUP BY 1)
SELECT label, n, round((1.0 / n) / sum(1.0 / n) OVER (), 6) AS weight
FROM c
""",
)
def a11_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    counts = t.orders.groupBy(F.col("o_orderstatus").alias("label")).agg(
        F.count("*").alias("n")
    )
    inv = F.lit(1.0) / F.col("n")
    w_all = Window.partitionBy()
    return counts.select(
        "label",
        "n",
        F.round(inv / F.sum(inv).over(w_all), 6).alias("weight"),
    )


# -- A12: row-wise null-skipping mean (loader.py:252-254) -------------------

@register(
    "a12_rowwise_mean",
    oracle="""
SELECT p_partkey,
       CAST(v1 IS NOT NULL AS INT) + CAST(v2 IS NOT NULL AS INT)
         + CAST(v3 IS NOT NULL AS INT) AS n_present,
       round((COALESCE(v1, 0) + COALESCE(v2, 0) + COALESCE(v3, 0))
             / NULLIF(CAST(v1 IS NOT NULL AS INT) + CAST(v2 IS NOT NULL AS INT)
                      + CAST(v3 IS NOT NULL AS INT), 0), 6) AS row_mean
FROM (
    SELECT p_partkey,
           CASE WHEN p_size % 3 = 0 THEN NULL ELSE p_retailprice END AS v1,
           CASE WHEN p_size % 5 = 0 THEN NULL ELSE p_retailprice * 0.5 END AS v2,
           CASE WHEN p_size % 7 = 0 THEN NULL ELSE CAST(p_size AS DOUBLE) END AS v3
    FROM part
)
""",
)
def a12_rowwise_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rowwise import rowwise_mean, rowwise_present

    t = Tables(spark, sf_dir)
    base = t.part.select(
        "p_partkey",
        F.when(F.col("p_size") % 3 == 0, None).otherwise(F.col("p_retailprice")).alias("v1"),
        F.when(F.col("p_size") % 5 == 0, None).otherwise(F.col("p_retailprice") * 0.5).alias("v2"),
        F.when(F.col("p_size") % 7 == 0, None).otherwise(F.col("p_size").cast("double")).alias("v3"),
    )
    cols = ["v1", "v2", "v3"]
    return base.select(
        "p_partkey",
        rowwise_present(cols).alias("n_present"),
        F.round(rowwise_mean(cols), 6).alias("row_mean"),
    )


# -- A13/F18: global scalar stats + boolean rate (train_ensemble.py:126-127)

@register(
    "a13_global_stats",
    shadow_oracle="""
SELECT count(*) AS n,
       min(o_totalprice) AS tp_min,
       max(o_totalprice) AS tp_max,
       round(avg(o_totalprice), 6) AS tp_avg,
       round(stddev_samp(o_totalprice), 6) AS tp_std,
       round(avg(CAST(o_orderstatus = 'F' AS INT)), 6) AS finished_rate
FROM orders
""",
)
def a13_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.orders.agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("tp_min"),
        F.max("o_totalprice").alias("tp_max"),
        F.round(F.avg("o_totalprice"), 6).alias("tp_avg"),
        F.round(F.stddev_samp("o_totalprice"), 6).alias("tp_std"),
        F.round(F.avg((F.col("o_orderstatus") == "F").cast("int")), 6).alias(
            "finished_rate"
        ),
    )


# -- A14: weighted running mean as one distributed agg (metrics.py:200-224) -

@register(
    "a14_weighted_mean",
    shadow_oracle="""
SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6)
           AS weighted_avg_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def a14_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_quantity")) / F.sum("l_quantity"),
            6,
        ).alias("weighted_avg_price")
    )


# -- Rollup (beyond-reference breadth: SURVEY §2.4 "free in Spark") ---------

@register(
    "a_rollup_revenue",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS rf,
       COALESCE(l_linestatus, 'ALL') AS ls,
       count(*) AS n,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def a_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals in one pass (flag, flag+status, grand total);
    Spark expands rollup into grouping sets inside a single 2-phase
    aggregation — no union of three scans."""
    t = Tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum(rev), 4).alias("revenue"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n",
            "revenue",
        )
    )


# -- Exact interpolated percentiles -----------------------------------------

@register(
    "a_percentiles",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
       round(quantile_cont(l_extendedprice, 0.95), 6) AS p95
FROM lineitem
GROUP BY l_returnflag
""",
)
def a_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated quantiles (Spark percentile == DuckDB
    quantile_cont). At 100 TB swap to approx_percentile — the same
    query shape with a bounded-memory t-digest-style sketch."""
    t = Tables(spark, sf_dir)
    qs = {"p25": 0.25, "p50": 0.50, "p75": 0.75, "p95": 0.95}
    return t.lineitem.groupBy("l_returnflag").agg(
        *[
            F.round(F.expr(f"percentile(l_extendedprice, {q})"), 6).alias(name)
            for name, q in qs.items()
        ]
    )


@register("a_percentiles_approx")  # rows-only: sketch output;
# rank-error bound vs the exact form pinned in tests/test_scale_toolkit.py
def a_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered 100 TB form of a_percentiles (VERDICT r5 #5):
    identical query shape with percentile -> percentile_approx
    (Greenwald-Khanna sketch). The exact form buffers every group value
    for the interpolated quantile; this one carries a fixed mergeable
    summary through the partial agg, with rank error <= group_n/accuracy
    (accuracy=10000 -> <=0.01% of the group). Output columns match the
    exact query so the two are drop-in swappable."""
    t = Tables(spark, sf_dir)
    qs = {"p25": 0.25, "p50": 0.50, "p75": 0.75, "p95": 0.95}
    return t.lineitem.groupBy("l_returnflag").agg(
        *[
            F.round(
                F.percentile_approx(
                    "l_extendedprice", F.lit(q), F.lit(10000)
                ),
                6,
            ).alias(name)
            for name, q in qs.items()
        ]
    )


@register(
    "a_key_skew",
    shadow_oracle="""
WITH per_key AS (
    SELECT user_id, count(*) AS n FROM events GROUP BY user_id
)
SELECT count(*) AS n_keys,
       CAST(sum(n) AS BIGINT) AS n_rows,
       round(avg(n), 6) AS avg_per_key,
       round(quantile_cont(n, 0.50), 6) AS p50,
       round(quantile_cont(n, 0.90), 6) AS p90,
       round(quantile_cont(n, 0.99), 6) AS p99,
       max(n) AS max_n,
       round(max(n) / sum(n), 9) AS top_share,
       round(max(n) / avg(n), 6) AS skew_ratio
FROM per_key
""",
)
def a_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnostic: the per-key frequency distribution
    (percentiles, max, top-key share, max/avg skew ratio) that decides
    WHEN the `operators/skew.py` remedies (salting, AQE skew-join) are
    needed. Two exchanges: the per-key count's partial agg collapses to
    distinct keys map-side, and the summary runs over the #keys-row
    table — at 100 TB this is the cheap first query you run against any
    new join key. Spark `percentile` and DuckDB `quantile_cont` share
    the p*(n-1) linear-interpolation definition (as in a_percentiles)."""
    t = Tables(spark, sf_dir)
    per_key = t.events.groupBy("user_id").agg(F.count("*").alias("n"))
    n = F.col("n").cast("double")
    return per_key.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.round(F.avg("n"), 6).alias("avg_per_key"),
        F.round(F.percentile(n, F.lit(0.50)), 6).alias("p50"),
        F.round(F.percentile(n, F.lit(0.90)), 6).alias("p90"),
        F.round(F.percentile(n, F.lit(0.99)), 6).alias("p99"),
        F.max("n").alias("max_n"),
        F.round(F.max("n") / F.sum("n"), 9).alias("top_share"),
        F.round(F.max("n") / F.avg("n"), 6).alias("skew_ratio"),
    )


@register(
    "a_pivot_event_counts",
    shadow_oracle="""
SELECT user_id,
       CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS n_click,
       CAST(coalesce(sum(CASE WHEN event_type = 'error' THEN 1 END), 0) AS BIGINT) AS n_error,
       CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS n_purchase,
       CAST(coalesce(sum(CASE WHEN event_type = 'signup' THEN 1 END), 0) AS BIGINT) AS n_signup,
       CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN 1 END), 0) AS BIGINT) AS n_view,
       round(sum(value), 6) AS value_total
FROM events
GROUP BY user_id
""",
)
def a_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot — the reference's feature-matrix construction step (long
    observations -> wide per-entity columns; SURVEY.md §1 'Feature
    matrix'). The pivot VALUES are passed explicitly: without them
    Spark runs an extra distinct-scan job to discover categories, and
    an unbounded category set would mint unbounded columns — at scale
    the category list is a contract, not a discovery."""
    t = Tables(spark, sf_dir)
    kinds = ["click", "error", "purchase", "signup", "view"]
    wide = (
        t.events.groupBy("user_id")
        .pivot("event_type", kinds)
        # count(lit(1)): count(*) is rejected inside Pivot
        .agg(F.count(F.lit(1)))
    )
    out = t.events.groupBy("user_id").agg(
        F.round(F.sum("value"), 6).alias("value_total")
    )
    sel = [F.col("user_id")]
    sel += [
        F.coalesce(F.col(k), F.lit(0)).cast("long").alias(f"n_{k}")
        for k in kinds
    ]
    return wide.join(out, "user_id").select(*sel, "value_total")


@register(
    "a_unpivot_user_stats",
    shadow_oracle="""
WITH per_user AS (
    SELECT user_id,
           round(avg(value), 6) AS avg_value,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value
    FROM events GROUP BY user_id
)
SELECT user_id, stat, val FROM per_user
UNPIVOT (val FOR stat IN (avg_value, min_value, max_value))
""",
)
def a_unpivot_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt — wide stat columns back to long (stat, value)
    rows via Spark's native ``unpivot`` (ids/values/variable/value) —
    the inverse of the feature-matrix pivot, used to feed generic
    per-metric consumers. Pure map-side reshape: no shuffle beyond the
    feeding aggregation."""
    t = Tables(spark, sf_dir)
    per_user = t.events.groupBy("user_id").agg(
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )
    return per_user.unpivot(
        ids=["user_id"],
        values=["avg_value", "min_value", "max_value"],
        variableColumnName="stat",
        valueColumnName="val",
    )


@register(
    "quality_constraint_report",
    oracle="""
WITH m AS (
    SELECT
        sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS v_nn,
        count(o_orderkey) - count(DISTINCT o_orderkey) AS v_u,
        sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS v_r,
        sum(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END)
            AS v_av,
        sum(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-')
            THEN 1 ELSE 0 END) AS v_re,
        CASE WHEN count(*) = 0 THEN 1 ELSE 0 END AS v_ne
    FROM orders
)
SELECT "constraint", CAST(violations AS BIGINT) AS violations,
       CAST(violations = 0 AS INT) AS passed
FROM (
    SELECT 'accepted_values(o_orderstatus,[F,O,P])' AS "constraint", v_av AS violations FROM m
    UNION ALL SELECT 'in_range(o_totalprice,0,None)', v_r FROM m
    UNION ALL SELECT 'matches_regex(o_orderpriority)', v_re FROM m
    UNION ALL SELECT 'non_empty()', v_ne FROM m
    UNION ALL SELECT 'not_null(o_orderkey)', v_nn FROM m
    UNION ALL SELECT 'unique(o_orderkey)', v_u FROM m
)
ORDER BY "constraint"
""",
)
def quality_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style declarative data validation compiled to ONE
    distributed aggregation (operators/quality.py): the whole suite is
    a single corpus pass with map-side partials — not one job per
    constraint. Report is data (constraint, violations, passed);
    pipelines gate on violations == 0."""
    from ..operators import quality as Q

    t = Tables(spark, sf_dir)
    return Q.check_constraints(
        t.orders,
        [
            Q.not_null("o_orderkey"),
            Q.unique("o_orderkey"),
            Q.in_range("o_totalprice", 0, None),
            Q.accepted_values("o_orderstatus", ["F", "O", "P"]),
            Q.matches_regex("o_orderpriority", "^[1-5]-"),
            Q.non_empty(),
        ],
    )


@register(
    "a_cube_revenue",
    shadow_oracle="""
SELECT CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
           AS gid,
       COALESCE(l_returnflag, 'ALL') AS rf,
       COALESCE(l_linestatus, 'ALL') AS ls,
       count(*) AS n,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def a_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — every grouping-set combination (flag x status, per-flag,
    per-status, grand total) in ONE 2-phase aggregation; grouping_id
    disambiguates genuine NULL keys from subtotal rows (both engines
    use the SQL-standard bitmask, hash-compared). Completes the
    rollup/cube/pivot reshaping family."""
    t = Tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.lineitem.cube("l_returnflag", "l_linestatus")
        # grouping_id() is only legal INSIDE the grouping aggregation
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n"),
            F.round(F.sum(rev), 4).alias("revenue"),
        )
        .select(
            "gid",
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n",
            "revenue",
        )
    )


@register(
    "a_outlier_iqr",
    oracle="""
WITH s AS (
    SELECT event_type,
           quantile_cont(value, 0.25) AS q1,
           quantile_cont(value, 0.75) AS q3
    FROM events GROUP BY event_type
)
SELECT e.event_type,
       count(*) AS n,
       CAST(sum(CASE WHEN e.value < q1 - 1.5 * (q3 - q1)
                  OR e.value > q3 + 1.5 * (q3 - q1)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(sum(CASE WHEN e.value < q1 - 1.5 * (q3 - q1)
                        OR e.value > q3 + 1.5 * (q3 - q1)
                      THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS outlier_frac,
       round(q1 - 1.5 * (q3 - q1), 6) AS lo,
       round(q3 + 1.5 * (q3 - q1), 6) AS hi
FROM events e JOIN s USING (event_type)
GROUP BY e.event_type, q1, q3
""",
)
def a_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier profile per event_type: exact quartiles
    (Spark `percentile` == DuckDB `quantile_cont`, the a_percentiles
    parity), fences broadcast back onto the stream, flags counted
    map-side. Two passes over events by construction (exact quantiles
    need the first); at 100 TB swap percentile -> approx_percentile for
    a one-pass mergeable-sketch form with identical plan shape. The
    fence table is group-cardinality-sized — always the broadcast side.
    """
    t = Tables(spark, sf_dir)
    ev = t.events.select("event_type", "value")
    s = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    fenced = s.select(
        "event_type",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("__lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("__hi"),
    )
    out_flag = (
        (F.col("value") < F.col("__lo")) | (F.col("value") > F.col("__hi"))
    ).cast("long")
    return (
        ev.join(F.broadcast(fenced), "event_type")
        .groupBy("event_type", "__lo", "__hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(out_flag).alias("n_outliers"),
            F.round(F.sum(out_flag) / F.count(F.lit(1)), 6).alias(
                "outlier_frac"
            ),
        )
        .select(
            "event_type",
            "n",
            "n_outliers",
            "outlier_frac",
            F.round("__lo", 6).alias("lo"),
            F.round("__hi", 6).alias("hi"),
        )
    )


@register("a_outlier_iqr_approx")  # rows-only: sketch quartiles;
# fence-drift bound vs the exact form pinned in tests/test_scale_toolkit.py
def a_outlier_iqr_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered 100 TB form of a_outlier_iqr (VERDICT r5 #5):
    quartiles via the percentile_approx sketch (fixed mergeable agg
    state — the quantile pass becomes one bounded-memory scan), fences
    and map-side flag counting unchanged. Rank error <= n/accuracy on
    each quartile bounds the fence drift; the flagged-fraction delta vs
    the exact form is pinned in tests."""
    t = Tables(spark, sf_dir)
    ev = t.events.select("event_type", "value")
    s = ev.groupBy("event_type").agg(
        F.percentile_approx("value", F.lit(0.25), F.lit(10000)).alias("q1"),
        F.percentile_approx("value", F.lit(0.75), F.lit(10000)).alias("q3"),
    )
    fenced = s.select(
        "event_type",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("__lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("__hi"),
    )
    out_flag = (
        (F.col("value") < F.col("__lo")) | (F.col("value") > F.col("__hi"))
    ).cast("long")
    return (
        ev.join(F.broadcast(fenced), "event_type")
        .groupBy("event_type", "__lo", "__hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(out_flag).alias("n_outliers"),
            F.round(F.sum(out_flag) / F.count(F.lit(1)), 6).alias(
                "outlier_frac"
            ),
        )
        .select(
            "event_type",
            "n",
            "n_outliers",
            "outlier_frac",
            F.round("__lo", 6).alias("lo"),
            F.round("__hi", 6).alias("hi"),
        )
    )


@register(
    "a_profile_table",
    oracle="""
WITH m AS (
    SELECT count(*) AS n,
           CAST(count(*) - count(l_quantity) AS BIGINT) AS null_q,
           CAST(count(DISTINCT l_quantity) AS BIGINT) AS dist_q,
           round(min(l_quantity), 6) AS min_q,
           round(max(l_quantity), 6) AS max_q,
           round(avg(l_quantity), 6) AS avg_q,
           CAST(count(*) - count(l_extendedprice) AS BIGINT) AS null_p,
           CAST(count(DISTINCT l_extendedprice) AS BIGINT) AS dist_p,
           round(min(l_extendedprice), 6) AS min_p,
           round(max(l_extendedprice), 6) AS max_p,
           round(avg(l_extendedprice), 6) AS avg_p,
           CAST(count(*) - count(l_discount) AS BIGINT) AS null_d,
           CAST(count(DISTINCT l_discount) AS BIGINT) AS dist_d,
           round(min(l_discount), 6) AS min_d,
           round(max(l_discount), 6) AS max_d,
           round(avg(l_discount), 6) AS avg_d
    FROM lineitem
)
SELECT 'l_quantity' AS column_name, n, null_q AS n_null, dist_q AS n_distinct,
       min_q AS min_value, max_q AS max_value, avg_q AS avg_value FROM m
UNION ALL
SELECT 'l_extendedprice', n, null_p, dist_p, min_p, max_p, avg_p FROM m
UNION ALL
SELECT 'l_discount', n, null_d, dist_d, min_d, max_d, avg_d FROM m
""",
)
def a_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style column PROFILING (the sibling of the constraint
    suite): one row per profiled column with count/null/distinct/
    min/max/mean — computed in a SINGLE aggregation pass over the table
    (every metric for every column in one scan), then unpivoted with
    stack(). At 100 TB swap count_distinct for the HLL sketch
    (sketch_distinct_tokens pattern) to keep the agg state fixed."""
    t = Tables(spark, sf_dir)
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"null_{c}"),
            F.count_distinct(F.col(c)).alias(f"dist_{c}"),
            F.round(F.min(c), 6).alias(f"min_{c}"),
            F.round(F.max(c), 6).alias(f"max_{c}"),
            F.round(F.avg(c), 6).alias(f"avg_{c}"),
        ]
    # fan_out NOT applied — and not for shuffle cost (a projected
    # repartition of 3 numeric columns is ~14 MB): round-12 measured
    # that repartitioning flips avg(l_discount)'s float-sum order and
    # its true mean sits within ~1e-11 of a round-6 boundary
    # (0.049918 vs the oracle's 0.049919 at sf0.01). An oracle-compared
    # rounded average pins this query to the scan's native partitioning.
    m = t.lineitem.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', null_{c}, dist_{c}, min_{c}, max_{c}, avg_{c}" for c in cols
    )
    return m.selectExpr(
        "n",
        f"stack({len(cols)}, {stack_expr}) as "
        "(column_name, n_null, n_distinct, min_value, max_value, avg_value)",
    ).select(
        "column_name", "n", "n_null", "n_distinct",
        "min_value", "max_value", "avg_value",
    )


@register("a_profile_table_approx")  # rows-only: HLL distinct counts;
# relative-error bound vs the exact form pinned in tests/test_scale_toolkit.py
def a_profile_table_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered 100 TB form of a_profile_table (VERDICT r5 #5):
    count_distinct -> approx_count_distinct (HyperLogLog++, rsd=0.01).
    The exact form's distinct-count state grows with column cardinality
    and forces a per-column distinct expansion in the partial agg; the
    HLL registers are fixed-size and mergeable, so the whole profile
    stays ONE bounded-memory scan at any scale. All other metrics
    (count/null/min/max/mean) are identical."""
    t = Tables(spark, sf_dir)
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"null_{c}"),
            F.approx_count_distinct(F.col(c), rsd=0.01).alias(f"dist_{c}"),
            F.round(F.min(c), 6).alias(f"min_{c}"),
            F.round(F.max(c), 6).alias(f"max_{c}"),
            F.round(F.avg(c), 6).alias(f"avg_{c}"),
        ]
    # fan_out NOT applied: tests pin every non-sketched metric
    # bit-identical to a_profile_table, whose oracle-compared rounded
    # average forbids repartitioning (see the note there) — the two
    # forms must keep identical float-sum order.
    m = t.lineitem.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', null_{c}, dist_{c}, min_{c}, max_{c}, avg_{c}" for c in cols
    )
    return m.selectExpr(
        "n",
        f"stack({len(cols)}, {stack_expr}) as "
        "(column_name, n_null, n_distinct, min_value, max_value, avg_value)",
    ).select(
        "column_name", "n", "n_null", "n_distinct",
        "min_value", "max_value", "avg_value",
    )


@register(
    "a_funnel_conversion",
    oracle="""
WITH v AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
    WHERE e.event_type = 'click' GROUP BY e.user_id
), p AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_view_click,
       (SELECT count(*) FROM p) AS n_view_click_purchase,
       round((SELECT count(*) FROM p) * 1.0
             / NULLIF((SELECT count(*) FROM v), 0), 6) AS conversion
""",
)
def a_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): users counted at each
    stage only when the stage event happens STRICTLY AFTER their first
    event of the previous stage — the order constraint is what makes it
    a funnel rather than three independent counts. Three first-touch
    aggs chained by user_id joins, all partitioned on the same key; the
    final stage counts are 1-row aggregates."""
    t = Tables(spark, sf_dir)
    ev = t.events.select("user_id", "event_type", "ts")

    def first_after(etype: str, prev: DataFrame | None, tcol: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            e = e.join(prev, "user_id").filter(F.col("ts") > F.col(tcol))
        return e.groupBy("user_id").agg(F.min("ts").alias(f"__{etype}"))

    v = first_after("view", None, "")
    c = first_after("click", v, "__view")
    p = first_after("purchase", c, "__click")
    counts = (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .join(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .join(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )
    return counts.select(
        "n_view",
        "n_view_click",
        "n_view_click_purchase",
        F.round(
            F.col("n_view_click_purchase")
            / F.nullif(F.col("n_view"), F.lit(0)),
            6,
        ).alias("conversion"),
    )


@register(
    "a_retention_cohorts",
    oracle="""
WITH first_day AS (
    SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day FROM events
    GROUP BY user_id
), activity AS (
    SELECT DISTINCT e.user_id, f.cohort_day,
           date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) // 7 AS week_offset
    FROM events e JOIN first_day f ON e.user_id = f.user_id
)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
       week_offset,
       count(*) AS n_active
FROM activity GROUP BY cohort_day, week_offset
""",
)
def a_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users bucketed by first-seen day, each
    (cohort, week-offset) cell counting users active that week — the
    standard engagement decay table. First-touch agg + distinct
    activity + cell agg, all co-partitioned on user_id then cohort."""
    t = Tables(spark, sf_dir)
    ev = t.events.select("user_id", F.col("ts").cast("date").alias("day"))
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        ev.join(first_day, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.floor(
                F.datediff(F.col("day"), F.col("cohort_day")) / 7
            ).alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_day", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    ).select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        "week_offset",
        "n_active",
    )


@register(
    "a_outlier_mad",
    shadow_oracle="""
WITH med AS (
    SELECT event_type, quantile_cont(value, 0.5) AS med
    FROM events GROUP BY event_type
), mad AS (
    SELECT e.event_type, med,
           quantile_cont(abs(e.value - med), 0.5) AS mad
    FROM events e JOIN med USING (event_type)
    GROUP BY e.event_type, med
)
SELECT e.event_type,
       count(*) AS n,
       round(med, 6) AS med,
       round(mad, 6) AS mad,
       CAST(sum(CASE WHEN abs(e.value - med) > 3 * 1.4826 * mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(sum(CASE WHEN abs(e.value - med) > 3 * 1.4826 * mad
                      THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS outlier_frac
FROM events e JOIN mad USING (event_type)
GROUP BY e.event_type, med, mad
""",
)
def a_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier profile per event_type (round-7
    addition) — the heavy-tail-safe sibling of a_outlier_iqr: flag
    |x - median| > 3 * 1.4826 * MAD (the Gaussian-consistent MAD
    scale). Three passes by construction (median, then the deviation
    median, then flags), each a group agg with the tiny per-group
    table broadcast back; exact percentile == quantile_cont parity on
    both hops (the a_percentiles contract). approx_percentile is the
    documented one-pass-per-hop 100 TB swap."""
    t = Tables(spark, sf_dir)
    ev = t.events.select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    )
    flag = (
        F.abs(F.col("value") - F.col("med")) > 3 * 1.4826 * F.col("mad")
    ).cast("long")
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(flag).alias("n_outliers"),
            F.round(F.sum(flag) / F.count(F.lit(1)), 6).alias(
                "outlier_frac"
            ),
        )
        .select(
            "event_type",
            "n",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n_outliers",
            "outlier_frac",
        )
    )


@register(
    "a_histogram_value",
    shadow_oracle="""
WITH b AS (
    SELECT event_type, min(value) AS mn, max(value) AS mx
    FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(CASE WHEN mx = mn THEN 0
                 ELSE least(CAST(floor((e.value - mn) / ((mx - mn) / 10))
                                 AS BIGINT), 9) END AS INT) AS bucket,
       count(*) AS n,
       round(mn + CASE WHEN mx = mn THEN 0
                       ELSE least(CAST(floor((e.value - mn) / ((mx - mn) / 10))
                                       AS BIGINT), 9) END
                  * ((mx - mn) / 10), 6) AS bucket_lo
FROM events e JOIN b USING (event_type)
GROUP BY 1, 2, 4
""",
)
def a_histogram_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histogram per event_type (round-7 profiling
    addition): 10 buckets between the group min/max, the max clamped
    into the last bucket, constant columns collapsing to bucket 0 —
    the distribution-shape profile a_profile_table's scalar stats
    can't show. Two passes (bounds, then counts) with the tiny bounds
    table broadcast back; identical bucket arithmetic on both engines
    so boundary values cannot straddle."""
    t = Tables(spark, sf_dir)
    ev = t.events.select("event_type", "value")
    b = ev.groupBy("event_type").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    w = (F.col("mx") - F.col("mn")) / 10
    bucket = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("value") - F.col("mn")) / w).cast("long"),
            F.lit(9),
        )
    )
    return (
        ev.join(F.broadcast(b), "event_type")
        .withColumn("bucket", bucket.cast("int"))
        .groupBy(
            "event_type",
            "bucket",
            F.round(F.col("mn") + F.col("bucket") * w, 6).alias("bucket_lo"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select("event_type", "bucket", "n", "bucket_lo")
    )


@register(
    "a_corr_matrix",
    shadow_oracle="""
WITH c AS (
    SELECT corr(l_quantity, l_extendedprice) AS qty_price,
           corr(l_quantity, l_discount) AS qty_disc,
           corr(l_quantity, l_tax) AS qty_tax,
           corr(l_extendedprice, l_discount) AS price_disc,
           corr(l_extendedprice, l_tax) AS price_tax,
           corr(l_discount, l_tax) AS disc_tax
    FROM lineitem
)
SELECT p.pair, round(CASE p.pair
         WHEN 'qty_price' THEN qty_price
         WHEN 'qty_disc' THEN qty_disc
         WHEN 'qty_tax' THEN qty_tax
         WHEN 'price_disc' THEN price_disc
         WHEN 'price_tax' THEN price_tax
         WHEN 'disc_tax' THEN disc_tax END, 6) AS corr
FROM c CROSS JOIN (VALUES ('qty_price'), ('qty_disc'), ('qty_tax'),
                          ('price_disc'), ('price_tax'), ('disc_tax'))
     AS p(pair)
""",
)
def a_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations over lineitem's numeric measures
    in ONE scan aggregation (round-7 profiling addition) — the feature-
    redundancy screen before model training. All six pairs come out of
    a single distributed agg (each corr is a mergeable moment bundle);
    the 1-row result unpivots to (pair, corr) long form map-side.
    Spark `corr` == DuckDB `corr` (sample correlation)."""
    t = Tables(spark, sf_dir)
    pairs = [
        ("qty_price", "l_quantity", "l_extendedprice"),
        ("qty_disc", "l_quantity", "l_discount"),
        ("qty_tax", "l_quantity", "l_tax"),
        ("price_disc", "l_extendedprice", "l_discount"),
        ("price_tax", "l_extendedprice", "l_tax"),
        ("disc_tax", "l_discount", "l_tax"),
    ]
    agg = t.lineitem.agg(
        *[F.corr(a, b).alias(name) for name, a, b in pairs]
    )
    stack = ", ".join(f"'{name}', {name}" for name, _, _ in pairs)
    return agg.selectExpr(
        f"stack({len(pairs)}, {stack}) AS (pair, corr)"
    ).select("pair", F.round("corr", 6).alias("corr"))


@register(
    "a_winsorized_stats",
    shadow_oracle="""
WITH s AS (
    SELECT event_type,
           quantile_cont(value, 0.05) AS lo,
           quantile_cont(value, 0.95) AS hi
    FROM events GROUP BY event_type)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(least(greatest(e.value, lo), hi)), 4) AS w_mean,
       round(stddev_samp(least(greatest(e.value, lo), hi)), 4) AS w_std,
       round(min(lo), 6) AS lo,
       round(min(hi), 6) AS hi
FROM events e JOIN s USING (event_type)
GROUP BY e.event_type
""",
)
def a_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-group stats (round-8 addition): clamp values to
    the [p05, p95] band before mean/std — the outlier-robust companion
    to a_outlier_iqr (which only counts the tails). One exact-percentile
    agg builds the L-row band table (L = event types, broadcast); the
    clamp is map-side; one partial-aggregated pass computes the stats —
    two tiny exchanges regardless of corpus size."""
    t = Tables(spark, sf_dir)
    bands = t.events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    w = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        t.events.join(F.broadcast(bands), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg(w), 4).alias("w_mean"),
            F.round(F.stddev_samp(w), 4).alias("w_std"),
            F.round(F.min("lo"), 6).alias("lo"),
            F.round(F.min("hi"), 6).alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental statistics maintenance: per-key moment state merged with a
# new batch's delta state — no history rescan (operators/stats_bundle.py::
# moment_state / merge_moment_states).
# ---------------------------------------------------------------------------

@register(
    "incr_stats_merge",
    shadow_oracle="""
SELECT user_id,
       count(value) AS n,
       round(sum(value), 4) AS vsum,
       round(stddev_samp(value), 4) AS std,
       min(value) AS vmin,
       max(value) AS vmax
FROM events
GROUP BY user_id
""",
)
def incr_stats_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental per-user statistics: an 80% "history" slice is
    aggregated into a mergeable moment-state table (n, mean, m2, min,
    max), the remaining 20% "new batch" into its own delta state, and
    the two merge with Chan's parallel-variance formula — EXACTLY
    reproducing the full-rescan statistics, which is what the oracle
    computes over the whole table. The deterministic event_id%10 split
    stands in for a date partition boundary. This is the 100 TB
    maintenance pattern: the state table is |keys| rows (bucketable by
    key), each day aggregates only its own partition (one 2-phase agg
    over the new data), and the merge is a |keys|-row join — history
    is never rescanned, and no sketch approximation is involved (the
    moment state is algebraically exact, unlike the HLL/GK/CMS tier
    which trades exactness for fixed size on UNBOUNDED key domains).

    The oracle recomputes from scratch over the whole table — the
    no-rescan-equals-rescan claim IS the differential check. Output
    carries vsum (=mean*n, a multiple of the value quantum, so its
    round(4) has ~0.005 absolute margin) rather than the mean itself:
    the 2-decimal values and round group sizes make many true means
    EXACT half-way cases at any rounding precision, where cross-engine
    float noise (~1e-10) flips the last digit — measured, not
    hypothetical. std's true values are sqrt-irrational, never on a
    boundary (min distance 9e-5 across sf0.001-0.1, 6 orders above the
    noise). tests/test_operators.py pins merged-vs-direct equality of
    the un-rounded mean/m2 to 1e-9 relative."""
    from ..operators.stats_bundle import merge_moment_states, moment_state

    t = Tables(spark, sf_dir)
    ev = t.events.select("event_id", "user_id", "value")
    hist = ev.filter(F.col("event_id") % 10 < 8)
    batch = ev.filter(F.col("event_id") % 10 >= 8)
    state = moment_state(hist, ["user_id"], "value")
    delta = moment_state(batch, ["user_id"], "value")
    merged = merge_moment_states(state, delta, ["user_id"])
    n = F.col("n")
    return merged.select(
        "user_id",
        n.alias("n"),
        F.round(F.col("mean") * n, 4).alias("vsum"),
        F.round(
            F.when(n > 1, F.sqrt(F.col("m2") / (n - 1))), 4
        ).alias("std"),
        "vmin",
        "vmax",
    )


# ---------------------------------------------------------------------------
# Per-key OLS trend fit via the closed-form regression AGGREGATES —
# trend features for training without any per-group model-fit loop.
# ---------------------------------------------------------------------------

@register(
    "a_trend_fit",
    shadow_oracle="""
SELECT user_id,
       regr_count(value, (epoch_us(ts) - 1704067200000000) / 86400000000.0)
           AS n,
       round(regr_slope(value,
             (epoch_us(ts) - 1704067200000000) / 86400000000.0), 6)
           AS slope_per_day,
       round(regr_intercept(value,
             (epoch_us(ts) - 1704067200000000) / 86400000000.0), 6)
           AS intercept,
       round(regr_r2(value,
             (epoch_us(ts) - 1704067200000000) / 86400000000.0), 6) AS r2
FROM events
GROUP BY user_id
""",
)
def a_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend of value over time (slope/day, intercept,
    r2) via the CLOSED-FORM regression aggregates ``regr_*`` — per-key
    linear-model fitting as ONE 2-phase hash aggregation, no per-group
    loop, no MLlib fit, full partial aggregation through the shuffle.
    This is how per-entity trend features are extracted at 100 TB: the
    shuffle carries one fixed-size regression state per (key,
    partition), never the observations. x is recentered to days since
    2024-01-01 BEFORE aggregation: epoch-microsecond x values put
    x^2 sums at ~1e30 where the engines' different regr formulations
    diverge past the rounding tolerance (catastrophic cancellation);
    day-scale x keeps both engines' sums in a safe range — the same
    numerical posture as moments.py's shifted raw moments."""
    t = Tables(spark, sf_dir)
    x = (
        (F.unix_micros(F.col("ts").cast("timestamp")) - 1704067200000000)
        / 86400000000.0
    )
    ev = t.events.select("user_id", x.alias("x"), "value")
    return ev.groupBy("user_id").agg(
        F.regr_count("value", "x").alias("n"),
        F.round(F.regr_slope("value", "x"), 6).alias("slope_per_day"),
        F.round(F.regr_intercept("value", "x"), 6).alias("intercept"),
        F.round(F.regr_r2("value", "x"), 6).alias("r2"),
    )


# -- beyond ref: Poisson bootstrap confidence intervals ---------------------

@register(
    "a_bootstrap_ci",
    shadow_oracle="""
WITH ev AS (
    SELECT event_type, value, event_id FROM events
), x AS (
    SELECT event_type, value, r.r AS rep,
           (((((abs(event_id * 32 + r.r) + 999983) % 2147483647)
               * 48271 % 2147483647) * 48271) % 2147483647)
               / 2147483647.0 AS u
    FROM ev CROSS JOIN (SELECT unnest(range(32)) AS r) r
), w AS (
    SELECT event_type, rep,
           CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v_u,
           CASE WHEN u < 0.36787944117144233 THEN 0
                WHEN u < 0.7357588823428847  THEN 1
                WHEN u < 0.9196986029286058  THEN 2
                WHEN u < 0.9810118431238462  THEN 3
                WHEN u < 0.9963401531726563  THEN 4
                ELSE 5 END AS wt
    FROM x
), per AS (
    SELECT event_type, rep,
           CAST(floor(CAST(sum(wt * v_u) AS DOUBLE) / sum(wt) / 1000.0
                      + 0.5) AS BIGINT) AS m
    FROM w GROUP BY event_type, rep
), ci AS (
    SELECT event_type,
           round(CAST(sum(m) AS DOUBLE) / 32.0 / 1000.0, 6) AS boot_mean,
           round(sqrt(greatest(0.0,
                 (CAST(sum(m * m) AS DOUBLE)
                  - CAST(sum(m) AS DOUBLE) * CAST(sum(m) AS DOUBLE) / 32.0)
                 / 31.0)) / 1000.0, 6) AS boot_se,
           round(quantile_cont(m, 0.025) / 1000.0, 6) AS ci_lo,
           round(quantile_cont(m, 0.975) / 1000.0, 6) AS ci_hi
    FROM per GROUP BY event_type
), obs AS (
    SELECT event_type, count(*) AS n,
           round(CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT))
                      AS DOUBLE) / count(*) / 1e6, 6) AS mean_obs
    FROM ev GROUP BY event_type
)
SELECT obs.event_type, n, mean_obs, boot_mean, boot_se, ci_lo, ci_hi
FROM obs JOIN ci USING (event_type)
""",
)
def a_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence intervals for a grouped mean WITHOUT
    resampling the data: the Poisson bootstrap (Chamandy et al. 2012 —
    'Estimating uncertainty for massive data streams', the
    production-scale bootstrap) replaces sampling-with-replacement
    (which needs n known up front and a global shuffle per replicate)
    with an independent Poisson(1) weight per (row, replicate) — so
    ALL 32 replicates run in ONE pass as a map-side weight expansion +
    a single partial-aggregated (group, rep) hash agg; the shuffle
    carries #groups x 32 partial sums, never a resampled copy of the
    data. Weights are deterministic: the repo's portable minstd Lehmer
    hash on (event_id * 32 + rep) drives an inverse-CDF Poisson(1)
    lookup (cumulative e^-1/k! thresholds, capped at 5 where the CDF
    tail < 4e-4) — integer ops + one divide, mirrored digit-for-digit
    in the oracle, so both engines draw the SAME bootstrap. Values are
    quantized to micro-unit BIGINTs (floor(x*1e6+0.5)) and replicate
    means to milli-unit BIGINTs, so every distributed sum is EXACT
    integer arithmetic (the a_ks_test pattern) — float accumulation
    order once flipped boot_mean's 6th decimal between runs; the only
    doubles left are single divisions/sqrt of exact integers, and
    percentile() / quantile_cont interpolate the same sorted integers
    under the shared (n-1)*q definition."""
    t = Tables(spark, sf_dir)
    # fan_out is output-safe here BY the query's own design: every
    # distributed sum is exact BIGINT arithmetic (see docstring), so
    # partitioning cannot move a decimal; the 32-replicate weight
    # expansion is the per-row-heavy map that previously ran on the
    # one-row-group scan's single task.
    ev = fan_out(t.events).select("event_type", "value", "event_id")
    us = (
        "transform(sequence(0, 31), r -> "
        "(((((abs(event_id * 32 + r) + 999983) % 2147483647) "
        "* 48271 % 2147483647) * 48271) % 2147483647) / 2147483647.0d)"
    )
    wts = (
        "transform({u}, u -> CASE WHEN u < 0.36787944117144233d THEN 0 "
        "WHEN u < 0.7357588823428847d  THEN 1 "
        "WHEN u < 0.9196986029286058d  THEN 2 "
        "WHEN u < 0.9810118431238462d  THEN 3 "
        "WHEN u < 0.9963401531726563d  THEN 4 "
        "ELSE 5 END)"
    ).format(u=us)
    # Exact-integer replicate sums (same pattern as a_ks_test): value is
    # quantized to micro-units ONCE with floor(x*1e6 + 0.5) — identical
    # in both engines, no round-half-convention exposure — so every
    # distributed sum below is BIGINT arithmetic, immune to the float
    # accumulation-order nondeterminism that once flipped boot_mean's
    # 6th decimal between otherwise-identical runs. The only doubles are
    # single divisions / sqrt of exact integers — deterministic IEEE.
    v_u = F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    x = ev.select(
        "event_type",
        v_u.alias("v_u"),
        F.posexplode(F.expr(wts)).alias("rep", "wt"),
    )
    # replicate mean quantized to milli-units as an exact integer, so
    # the across-replicate moment sums below are exact too
    per = x.groupBy("event_type", "rep").agg(
        F.floor(
            F.sum(F.col("wt") * F.col("v_u")).cast("double")
            / F.sum("wt")
            / F.lit(1000.0)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("m")
    )
    sm = F.sum("m").cast("double")
    smm = F.sum(F.col("m") * F.col("m")).cast("double")
    ci = per.groupBy("event_type").agg(
        F.round(sm / 32.0 / 1000.0, 6).alias("boot_mean"),
        F.round(
            F.sqrt(F.greatest(F.lit(0.0), (smm - sm * sm / 32.0) / 31.0))
            / 1000.0,
            6,
        ).alias("boot_se"),
        F.round(F.expr("percentile(m, 0.025d)") / 1000.0, 6).alias("ci_lo"),
        F.round(F.expr("percentile(m, 0.975d)") / 1000.0, 6).alias("ci_hi"),
    )
    obs = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(v_u).cast("double") / F.count("*") / F.lit(1e6), 6
        ).alias("mean_obs"),
    )
    return obs.join(F.broadcast(ci), "event_type")


# -- beyond ref: exact two-sample Kolmogorov-Smirnov drift test -------------

@register(
    "a_ks_test",
    shadow_oracle="""
WITH s AS (
    SELECT event_type, value,
           CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS is_a
    FROM events
), c AS (
    SELECT event_type, value,
           sum(is_a)     OVER w AS cum_a,
           sum(1 - is_a) OVER w AS cum_b,
           sum(is_a)     OVER (PARTITION BY event_type) AS n_a,
           sum(1 - is_a) OVER (PARTITION BY event_type) AS n_b
    FROM s
    WINDOW w AS (PARTITION BY event_type ORDER BY value
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type,
       CAST(max(n_a) AS BIGINT) AS n_a,
       CAST(max(n_b) AS BIGINT) AS n_b,
       round(max(abs(cum_a * n_b - cum_b * n_a))
             / (1.0 * max(n_a) * max(n_b)), 6) AS ks_d
FROM c GROUP BY event_type
""",
)
def a_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic per group — the
    distribution-drift gate (deterministic split: even event_ids =
    sample A, odd = B; swap in yesterday-vs-today or source-vs-source
    for production drift monitoring). D = max_x |F_A(x) - F_B(x)|,
    computed tie-correctly with a RANGE window frame (all rows of a
    tied value enter the cumulative counts together, so D is evaluated
    at distinct-value boundaries — the ordering-within-ties ambiguity
    a ROWS frame would leak into the result never arises). The
    statistic stays in EXACT integer arithmetic until the final
    divide: max |cum_a*n_b - cum_b*n_a| is the D numerator scaled by
    n_a*n_b — engine-stable to the last bit. Scale shape: ONE hash
    exchange on the group key + one sort; the per-group totals reuse
    the partition window; at 100 TB the per-group sort is the
    textbook KS cost (no all-pairs, no collect)."""
    t = Tables(spark, sf_dir)
    s = t.events.select(
        "event_type",
        "value",
        F.when(F.col("event_id") % 2 == 0, 1).otherwise(0).alias("is_a"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy("event_type")
    c = s.select(
        "event_type",
        F.sum("is_a").over(w).alias("cum_a"),
        F.sum(1 - F.col("is_a")).over(w).alias("cum_b"),
        F.sum("is_a").over(wp).alias("n_a"),
        F.sum(1 - F.col("is_a")).over(wp).alias("n_b"),
    )
    # cross products in DECIMAL(38,0): cum_a*n_b hits BIGINT overflow
    # (ANSI throw) once a group passes ~3e9 rows; decimal keeps the
    # D numerator EXACT at any realistic depth (DuckDB's HUGEINT
    # already does on the oracle side) — round-9 hardening after the
    # 1000x probe caught the same class in a_mann_whitney_binned
    ca = F.col("cum_a").cast("decimal(19,0)")
    cb = F.col("cum_b").cast("decimal(19,0)")
    nb_ = F.col("n_b").cast("decimal(19,0)")
    na_ = F.col("n_a").cast("decimal(19,0)")
    return c.groupBy("event_type").agg(
        F.max("n_a").cast("bigint").alias("n_a"),
        F.max("n_b").cast("bigint").alias("n_b"),
        F.round(
            F.max(F.abs(ca * nb_ - cb * na_)).cast("double")
            / (
                F.max("n_a").cast("double")
                * F.max("n_b").cast("double")
            ),
            6,
        ).alias("ks_d"),
    )


# -- beyond ref: association rules (support / confidence / lift) ------------

@register(
    "a_assoc_rules",
    shadow_oracle="""
WITH ut AS (
    SELECT DISTINCT user_id, event_type FROM events
), n AS (
    SELECT count(DISTINCT user_id) AS n_users FROM ut
), pt AS (
    SELECT event_type, count(*) AS n_t FROM ut GROUP BY event_type
), pairs AS (
    SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS n_ab
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT ta, tb, n_ab,
       round(n_ab * 1.0 / n_users, 6) AS support,
       round(n_ab * 1.0 / pa.n_t, 6) AS conf_ab,
       round(n_ab * 1.0 / pb.n_t, 6) AS conf_ba,
       round(n_ab * 1.0 * n_users / (pa.n_t * pb.n_t), 6) AS lift
FROM pairs
JOIN pt pa ON pa.event_type = ta
JOIN pt pb ON pb.event_type = tb
CROSS JOIN n
""",
)
def a_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over per-user event-type baskets: for every
    type pair, support, both confidences, and lift — the market-basket
    co-occurrence mining that seeds recommendation and
    next-event-prediction features. Scale shape: the basket table is
    ONE distinct agg keyed (user, type); the pair expansion self-joins
    it ON THE USER KEY, so the per-user fan-out is C(types_per_user,2)
    — bounded by the type vocabulary (tens), never the event count —
    and the pair agg partially aggregates map-side to the #type²
    result grid. Per-type counts and the 1-row user total re-attach by
    broadcast. Every metric is a ratio of exact BIGINT counts, rounded
    once at the end — engine-stable by construction."""
    t = Tables(spark, sf_dir)
    # Checkpoint the basket table: its distinct agg feeds FOUR
    # consumers (user total, per-type counts, both self-join sides) —
    # without it each consumer re-scans and re-aggregates the corpus.
    ut = (
        t.events.select("user_id", "event_type").distinct().localCheckpoint(eager=False)
    )
    n = ut.agg(F.countDistinct("user_id").alias("n_users"))
    pt = ut.groupBy("event_type").agg(F.count("*").alias("n_t"))
    a = ut.withColumnRenamed("event_type", "ta")
    b = ut.withColumnRenamed("event_type", "tb")
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count("*").alias("n_ab"))
    )
    pa = pt.select(
        F.col("event_type").alias("ta"), F.col("n_t").alias("n_a")
    )
    pb = pt.select(
        F.col("event_type").alias("tb"), F.col("n_t").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(pa), "ta")
        .join(F.broadcast(pb), "tb")
        .crossJoin(F.broadcast(n))
        .select(
            "ta",
            "tb",
            "n_ab",
            F.round(F.col("n_ab") / F.col("n_users"), 6).alias("support"),
            F.round(F.col("n_ab") / F.col("n_a"), 6).alias("conf_ab"),
            F.round(F.col("n_ab") / F.col("n_b"), 6).alias("conf_ba"),
            F.round(
                F.col("n_ab")
                * F.col("n_users")
                / (F.col("n_a") * F.col("n_b") * F.lit(1.0)),
                6,
            ).alias("lift"),
        )
    )


@register("a_ks_test_binned")  # rows-only: histogram-approximate D; the
# error envelope vs the exact a_ks_test twin is pinned in
# tests/test_operators.py
def a_ks_test_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB shape of a_ks_test: histogram-approximate KS. The
    exact form pays one SORT of every group (right up to ~10^4-row
    groups; unavoidable for exact D); this twin replaces it with a
    256-bin fixed-width histogram per (group, sample) — ONE hash agg
    whose shuffle carries #groups x 256 x 2 bin counts REGARDLESS of
    group size, plus a cumsum window over that tiny grid. The
    approximation error is bounded by the probability mass of the
    widest bin (|D_hist - D| <= max_bin_mass, since the empirical CDFs
    are evaluated exactly at every bin boundary and D can only hide
    strictly inside one bin); the envelope against the exact twin is
    asserted in tests. Bounds come from one min/max pre-agg
    (broadcast), the same two-pass shape as value histograms."""
    n_bins = 256
    t = Tables(spark, sf_dir)
    s = t.events.select(
        "event_type",
        "value",
        F.when(F.col("event_id") % 2 == 0, 1).otherwise(0).alias("is_a"),
    )
    bounds = s.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    b = s.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "is_a",
        F.least(
            F.lit(n_bins - 1),
            F.floor(
                (F.col("value") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / n_bins)
            ).cast("int"),
        ).alias("bin"),
    )
    g = b.groupBy("event_type", "bin").agg(
        F.sum("is_a").alias("ca"), F.sum(1 - F.col("is_a")).alias("cb")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy("event_type")
    c = g.select(
        "event_type",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        F.sum("ca").over(wp).alias("n_a"),
        F.sum("cb").over(wp).alias("n_b"),
    )
    return c.groupBy("event_type").agg(
        F.max("n_a").cast("bigint").alias("n_a"),
        F.max("n_b").cast("bigint").alias("n_b"),
        F.round(
            F.max(
                F.abs(
                    F.col("cum_a") * F.col("n_b")
                    - F.col("cum_b") * F.col("n_a")
                )
            )
            / (F.max("n_a") * F.max("n_b") * F.lit(1.0)),
            6,
        ).alias("ks_d_approx"),
    )


# -- beyond ref: per-group rank normalization (feature transform) -----------

@register(
    "a_rank_normalize",
    shadow_oracle="""
SELECT event_type, event_id, round(value, 6) AS value,
       round(percent_rank() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id), 6)
           AS pct_rank
FROM events
""",
)
def a_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group rank normalization (percent_rank): maps each value to
    its within-group quantile position — the distribution-free feature
    transform (a.k.a. quantile/rank gauss-prep) that makes skewed
    features comparable across groups without fitting anything. Rank
    ties are impossible because event_id joins the order key, so the
    [0,1] position is engine-deterministic. Scale shape: ONE hash
    exchange + sort per group — identical to any ordered window; no
    second pass, no quantile table to fit or broadcast (contrast
    ccnet_buckets, which cuts on FITTED percentiles when train/apply
    must be separable)."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return t.events.select(
        "event_type",
        "event_id",
        F.round("value", 6).alias("value"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


# -- beyond ref: Benford first-digit conformance (data-quality screen) ------

@register(
    "a_benford_test",
    shadow_oracle="""
WITH d AS (
    SELECT CAST(substr(CAST(CAST(floor(abs(o_totalprice)) AS BIGINT)
                            AS VARCHAR), 1, 1) AS BIGINT) AS digit
    FROM orders WHERE abs(o_totalprice) >= 1
), c AS (
    SELECT digit, count(*) AS n FROM d GROUP BY digit
), tot AS (SELECT sum(n) AS t FROM c)
SELECT digit, n,
       round(n * 1.0 / t, 6) AS observed,
       round(log10(1.0 + 1.0 / digit), 6) AS expected,
       round(t * pow(n * 1.0 / t - log10(1.0 + 1.0 / digit), 2)
             / log10(1.0 + 1.0 / digit), 6) AS chi2_term
FROM c, tot
""",
)
def a_benford_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformance over order totals — the
    fraud/synthetic-data screen: naturally occurring multi-scale
    magnitudes follow P(d) = log10(1 + 1/d); fabricated or truncated
    feeds don't. Emits the 9-row digit table with observed vs expected
    shares and the per-digit chi-squared term (sum them for the test
    statistic, df=8). First digit extracted in EXACT integer/string
    arithmetic (abs -> BIGINT -> first decimal character — no float
    log tricks whose edge rounding at 10^k boundaries differs between
    engines; explicit floor() on BOTH sides because DuckDB's
    double->BIGINT cast rounds where Spark's truncates — a 1-ulp
    boundary price would otherwise flip digits). Scale: one map + one
    9-group partial agg + a 1-row total
    broadcast; nothing grows with the table but the scan."""
    t = Tables(spark, sf_dir)
    d = t.orders.filter(F.abs(F.col("o_totalprice")) >= 1).select(
        F.substring(
            F.floor(F.abs(F.col("o_totalprice")))
            .cast("bigint")
            .cast("string"),
            1,
            1,
        )
        .cast("bigint")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count("*").alias("n"))
    tot = c.agg(F.sum("n").alias("t"))
    obs = F.col("n") / F.col("t")
    exp_ = F.log10(1.0 + 1.0 / F.col("digit"))
    return c.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        F.round(obs, 6).alias("observed"),
        F.round(exp_, 6).alias("expected"),
        F.round(F.col("t") * F.pow(obs - exp_, 2) / exp_, 6).alias(
            "chi2_term"
        ),
    )


# -- beyond ref: Kaplan-Meier survival curve (user retention) ---------------

@register(
    "a_survival_km",
    shadow_oracle="""
WITH u AS (
    SELECT CAST(floor((lead(epoch_us(ts)) OVER w - epoch_us(ts))
                      / 3600000000.0) AS BIGINT) AS life,
           CASE WHEN lead(epoch_us(ts)) OVER w IS NULL
                THEN 1 ELSE 0 END AS censored
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), uu AS (
    SELECT coalesce(life, 99999) AS life, censored FROM u
), lt AS (
    SELECT life, count(*) AS n_total,
           sum(1 - censored) AS d
    FROM uu GROUP BY life
), risk AS (
    SELECT life, d,
           sum(n_total) OVER (ORDER BY life DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS n_risk
    FROM lt
), ev AS (
    SELECT life, d, n_risk FROM risk WHERE d > 0 AND d < n_risk
)
SELECT life AS gap_hours,
       CAST(n_risk AS BIGINT) AS n_at_risk,
       CAST(d AS BIGINT) AS n_events,
       round(exp(sum(ln(1.0 - d * 1.0 / n_risk))
                 OVER (ORDER BY life ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             6) AS survival
FROM ev
""",
)
def a_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-next-event survival: every event is a
    subject whose lifetime is the gap (whole hours) until that user's
    NEXT event; a user's final event is right-CENSORED (sentinel
    lifetime past every observed gap) — it joins every at-risk
    denominator but never a death count, which is precisely the
    correction naive "average gap" cadence metrics miss (dropping
    open-ended gaps biases lifetimes short).
    S(t) = prod_{t_i<=t} (1 - d_i/n_i) computed as exp of a running
    ln-sum over the per-lifetime table: the product runs over
    #distinct-gap-hours rows (calendar-bounded — the global window
    sort is over that TINY table, never the corpus; the corpus-sized
    work is one per-user lead() window, the same shuffle as any
    ordered per-key op). Both engines accumulate the
    identical ln terms in the identical ascending-day frame order, so
    the float path agrees to well past the 6-decimal rounding.
    Terminal d=n_risk days are excluded from OUTPUT (S=0 rows): Spark
    log(0) yields NULL where DuckDB yields -inf — the one cross-engine
    divergence in this plan — and such a day is necessarily last (all
    remaining subjects die), so no later cumsum term can need it."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev0 = t.events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    nxt = F.lead("ts_us").over(w)
    u = ev0.select(
        F.coalesce(
            F.floor((nxt - F.col("ts_us")) / 3_600_000_000.0).cast("bigint"),
            F.lit(99999),
        ).alias("life"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("censored"),
    )
    lt = u.groupBy("life").agg(
        F.count("*").alias("n_total"),
        F.sum(1 - F.col("censored")).alias("d"),
    )
    wdesc = (
        Window.orderBy(F.col("life").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = lt.select(
        "life", "d", F.sum("n_total").over(wdesc).alias("n_risk")
    )
    ev = risk.filter((F.col("d") > 0) & (F.col("d") < F.col("n_risk")))
    wasc = (
        Window.orderBy(F.col("life").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        F.col("life").alias("gap_hours"),
        F.col("n_risk").cast("bigint").alias("n_at_risk"),
        F.col("d").cast("bigint").alias("n_events"),
        F.round(
            F.exp(
                F.sum(F.log(1.0 - F.col("d") / F.col("n_risk"))).over(wasc)
            ),
            6,
        ).alias("survival"),
    )


# -- beyond ref: first-order Markov transition matrix over sessions ---------

@register(
    "a_markov_transitions",
    shadow_oracle="WITH "
    + SESSION_SQL_CTE
    + """, tr AS (
    SELECT event_type AS cur,
           lead(event_type) OVER (PARTITION BY user_id, session_id
                                  ORDER BY ts_us, event_id) AS nxt
    FROM s
), c AS (
    SELECT cur, nxt, count(*) AS n FROM tr WHERE nxt IS NOT NULL
    GROUP BY cur, nxt
), rowt AS (
    SELECT cur, sum(n) AS nr FROM c GROUP BY cur
)
SELECT cur, nxt, CAST(n AS BIGINT) AS n,
       round(n * 1.0 / nr, 6) AS p
FROM c JOIN rowt USING (cur)
""",
)
def a_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types WITHIN
    sessions (same 2-day-gap sessions as w_session_paths — transitions
    never cross a session boundary, the error naive whole-stream
    bigrams make): P(next|current) from exact transition counts. The model
    behind next-event prediction features and the generator for
    synthetic clickstream QA. Scale: one user-key sort shuffle serves
    sessionization AND the lead() pairing (same window family); the
    transition agg collapses to the #types² grid map-side; row totals
    re-attach by broadcast. Exact counts, one rounded division."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    s = sessionize_2day(t.events)
    # lead() over the SAME user-key window (session rows are contiguous
    # in it), gated on the next row sharing the session id — avoids a
    # second exchange on (user, session) that Catalyst can't prove
    # redundant with the user-key partitioning
    tr = s.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
        (F.lead("session_id").over(w) == F.col("session_id")).alias(
            "same_session"
        ),
    ).filter(F.col("nxt").isNotNull() & F.col("same_session"))
    # checkpoint the #types2-row transition grid: it feeds the row-total
    # rollup AND the final projection (without it the whole
    # sessionize+lead+agg chain recomputes per consumer)
    c = (
        tr.groupBy("cur", "nxt").agg(F.count("*").alias("n")).localCheckpoint(eager=False)
    )
    rowt = c.groupBy("cur").agg(F.sum("n").alias("nr"))
    return c.join(F.broadcast(rowt), "cur").select(
        "cur",
        "nxt",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") / F.col("nr"), 6).alias("p"),
    )


@register("sketch_user_overlap_hll")  # rows-only: HLL estimates are
# algorithm-specific; inclusion-exclusion error vs exact overlap pinned
# in tests/test_operators.py
def sketch_user_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix from HLL sketches: |A∩B| estimated by
    inclusion-exclusion (|A| + |B| − |A∪B|, the union being the ONE
    set operation HLL supports losslessly) for every event-type pair.
    The 100 TB posture is the whole point: per-type user sketches are
    ONE pass + fixed 4-KiB states, the pair matrix is a self-join of
    the #types-row SKETCH TABLE (never re-scanning users per pair —
    contrast the exact form's per-pair distinct joins), and persisted
    sketches make tomorrow's overlap an incremental union. Relative
    error grows for small intersections of large sets (the
    inclusion-exclusion weakness, stated honestly in the pinned error
    test: absolute error bounded by the union's HLL error, not the
    intersection's size)."""
    t = Tables(spark, sf_dir)
    sk = (
        t.events.groupBy("event_type")
        .agg(
            F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"),
            F.countDistinct("user_id").alias("n_exact"),
        )
        .localCheckpoint(eager=False)
    )
    a = sk.select(
        F.col("event_type").alias("ta"),
        F.col("sk").alias("ska"),
        F.col("n_exact").alias("na"),
    )
    b = sk.select(
        F.col("event_type").alias("tb"),
        F.col("sk").alias("skb"),
        F.col("n_exact").alias("nb"),
    )
    pairs = a.crossJoin(b).filter(F.col("ta") < F.col("tb"))
    est_a = F.hll_sketch_estimate("ska")
    est_b = F.hll_sketch_estimate("skb")
    est_u = F.hll_sketch_estimate(F.hll_union("ska", "skb"))
    return pairs.select(
        "ta",
        "tb",
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        est_u.cast("long").alias("est_union"),
        F.greatest(F.lit(0.0), est_a + est_b - est_u)
        .cast("long")
        .alias("est_overlap"),
    )


# -- beyond ref: deterministic A/B assignment + Welch's t-test --------------

@register(
    "a_ab_welch_test",
    shadow_oracle="""
WITH a AS (
    SELECT event_type, value,
           CASE WHEN (((((abs(user_id) + 999983) % 2147483647)
                       * 48271 % 2147483647) * 48271) % 2147483647)
                     / 2147483647.0 < 0.5
                THEN 'A' ELSE 'B' END AS variant
    FROM events
), s AS (
    SELECT event_type, variant, count(*) AS n,
           avg(value) AS m, var_samp(value) AS v
    FROM a GROUP BY event_type, variant
), w AS (
    SELECT sa.event_type,
           sa.n AS n_a, sb.n AS n_b,
           round(sa.m, 6) AS mean_a, round(sb.m, 6) AS mean_b,
           (sa.m - sb.m) / sqrt(sa.v / sa.n + sb.v / sb.n) AS tt,
           pow(sa.v / sa.n + sb.v / sb.n, 2)
             / (pow(sa.v / sa.n, 2) / (sa.n - 1)
                + pow(sb.v / sb.n, 2) / (sb.n - 1)) AS dof
    FROM s sa JOIN s sb
      ON sa.event_type = sb.event_type
     AND sa.variant = 'A' AND sb.variant = 'B'
)
SELECT event_type, n_a, n_b, mean_a, mean_b,
       round(tt, 6) AS t_stat, round(dof, 6) AS welch_df
FROM w
""",
)
def a_ab_welch_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with DETERMINISTIC variant assignment:
    users hash into A/B via the portable minstd split (seed-stable,
    retry-stable — the assignment IS the experiment's bucketing
    function, mirrored digit-for-digit in SQL), then Welch's unequal-
    variance t-test per metric group: t statistic and
    Welch–Satterthwaite df from ONE (group, variant) moment agg. The
    grand tour of the experimentation loop the engine's stats tier now
    covers: assignment (here), ratio health (the chi²/Benford
    screens), uncertainty (a_bootstrap_ci), distribution drift
    (a_ks_test). Scale: one partial-aggregated scan to #groups x 2
    fixed-size moment states; the A-vs-B pairing is a self-join of
    that tiny table. var_samp/avg agree across engines well inside the
    6-decimal rounding at these magnitudes."""
    t = Tables(spark, sf_dir)
    from ..operators.sampling import uniform_hash

    a = t.events.select(
        "event_type",
        "value",
        F.when(uniform_hash("user_id", mode="minstd") < 0.5, "A")
        .otherwise("B")
        .alias("variant"),
    )
    s = (
        a.groupBy("event_type", "variant")
        .agg(
            F.count("*").alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
        )
        .localCheckpoint(eager=False)
    )
    sa = s.filter(F.col("variant") == "A").select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("m").alias("m_a"),
        F.col("v").alias("v_a"),
    )
    sb = s.filter(F.col("variant") == "B").select(
        "event_type",
        F.col("n").alias("n_b"),
        F.col("m").alias("m_b"),
        F.col("v").alias("v_b"),
    )
    sea = F.col("v_a") / F.col("n_a")
    seb = F.col("v_b") / F.col("n_b")
    return sa.join(sb, "event_type").select(
        "event_type",
        "n_a",
        "n_b",
        F.round("m_a", 6).alias("mean_a"),
        F.round("m_b", 6).alias("mean_b"),
        F.round((F.col("m_a") - F.col("m_b")) / F.sqrt(sea + seb), 6).alias(
            "t_stat"
        ),
        F.round(
            F.pow(sea + seb, 2)
            / (
                F.pow(sea, 2) / (F.col("n_a") - 1)
                + F.pow(seb, 2) / (F.col("n_b") - 1)
            ),
            6,
        ).alias("welch_df"),
    )


# -- beyond ref: chi-squared independence test (contingency grid) -----------

@register(
    "a_chi2_independence",
    shadow_oracle="""
WITH c AS (
    SELECT event_type, CAST(dayofweek(CAST(ts AS DATE)) AS BIGINT) AS dow,
           count(*) AS n
    FROM events GROUP BY 1, 2
), rt AS (SELECT event_type, sum(n) AS nr FROM c GROUP BY event_type),
ct AS (SELECT dow, sum(n) AS nc FROM c GROUP BY dow),
tot AS (SELECT sum(n) AS t FROM c)
SELECT c.event_type, c.dow, CAST(c.n AS BIGINT) AS n,
       round(nr * nc * 1.0 / t, 6) AS expected,
       round(pow(c.n - nr * nc * 1.0 / t, 2) / (nr * nc * 1.0 / t), 6)
           AS chi2_term
FROM c JOIN rt USING (event_type) JOIN ct USING (dow), tot
""",
)
def a_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence screen over the (event_type x
    day-of-week) contingency grid: observed counts vs independence-
    expected row·col/total, with the per-cell chi² term (sum for the
    statistic, df = (R-1)(C-1)) — the 'is traffic mix stable across
    weekdays?' health check, and with any two categorical columns the
    generic feature-dependence screen. Scale: ONE partial-aggregated
    scan to the R x C grid; margins and the 1-row total are rollups of
    that tiny grid re-attached by broadcast — nothing after the first
    agg touches the corpus. DuckDB's ISO dayofweek and Spark's
    1=Sunday dayofweek disagree — both sides use the engine-native
    function only after pinning: Spark's dayofweek(CAST AS DATE)
    equals DuckDB's dayofweek+1; the Spark side subtracts 1 to match
    DuckDB's 0=Sunday..6=Saturday convention."""
    t = Tables(spark, sf_dir)
    c = (
        t.events.groupBy(
            "event_type",
            (F.dayofweek(F.to_date("ts")) - 1).cast("bigint").alias("dow"),
        )
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    rt = c.groupBy("event_type").agg(F.sum("n").alias("nr"))
    ct = c.groupBy("dow").agg(F.sum("n").alias("nc"))
    tot = c.agg(F.sum("n").alias("t"))
    exp_ = F.col("nr") * F.col("nc") / F.col("t")
    return (
        c.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "dow",
            F.col("n").cast("bigint").alias("n"),
            F.round(exp_, 6).alias("expected"),
            F.round(F.pow(F.col("n") - exp_, 2) / exp_, 6).alias(
                "chi2_term"
            ),
        )
    )


# -- beyond ref: Gini coefficient per group (inequality profile) ------------

@register(
    "a_gini_value",
    shadow_oracle="""
WITH r AS (
    SELECT event_type, value,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS i,
           count(*) OVER (PARTITION BY event_type) AS n,
           sum(value) OVER (PARTITION BY event_type) AS sv
    FROM events WHERE value >= 0
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n,
       round(max(sv), 4) AS total_value,
       round(2.0 * sum(i * value) / (max(n) * max(sv))
             - (max(n) + 1.0) / max(n), 6) AS gini
FROM r GROUP BY event_type
""",
)
def a_gini_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the value distribution per group — the
    inequality fingerprint (0 = uniform, →1 = one observation holds
    everything) behind 'is revenue/token mass concentrated in a few
    whales?' questions; the continuous-distribution sibling of
    mix_concentration's HHI over shares. Closed rank form
    G = 2·Σ(i·x_(i))/(n·Σx) − (n+1)/n over the within-group sort;
    ranks break ties on event_id, and Σ(i·x) is TIE-SAFE anyway
    (equal x make the rank permutation irrelevant to the sum), so the
    statistic is engine-deterministic before its final rounding.
    Negative values are excluded (Gini is defined on non-negative
    support). Scale: ONE hash exchange + sort per group; rank and the
    partition totals share it; the agg reuses the partitioning."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wp = Window.partitionBy("event_type")
    r = t.events.filter(F.col("value") >= 0).select(
        "event_type",
        "value",
        F.row_number().over(w).alias("i"),
        F.count("*").over(wp).alias("n"),
        F.sum("value").over(wp).alias("sv"),
    )
    return r.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.round(F.max("sv"), 4).alias("total_value"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("value"))
            / (F.max("n") * F.max("sv"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
    )


# -- beyond ref: lag-1 autocorrelation per key (time-series feature) --------

@register(
    "a_autocorr_lag1",
    shadow_oracle="""
WITH s AS (
    SELECT user_id, value,
           lag(value) OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS prev
    FROM events
)
SELECT user_id,
       count(*) AS n_pairs,
       round(corr(value, prev), 6) AS acf1
FROM s WHERE prev IS NOT NULL
GROUP BY user_id
HAVING count(*) >= 3
""",
)
def a_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation per key — the first-order serial-
    dependence feature (near 0: white noise; positive: momentum /
    trending sensor; negative: oscillation) that belongs next to the
    Δ1/Δ2 delta stats in any per-entity feature bundle. One lag()
    window pairs each value with its predecessor under the pinned
    (ts_us, event_id) order, then Pearson corr() — a closed-form
    fixed-size aggregate state, the regr_*/a_trend_fit posture: the
    shuffle carries one moment state per (key, partition), never the
    series. Keys with <3 pairs are dropped (corr of a 2-point series
    is ±1 by construction — noise, not signal). The statistic is
    covar_samp/(sd·sd) with a nullif zero-variance guard: ANSI-mode
    corr() throws DIVIDE_BY_ZERO on a constant series where DuckDB's
    corr returns NULL — the guarded form gives NULL on both engines
    (regression-tested with a constant-valued key). Values at these
    magnitudes agree well inside the 6-decimal rounding."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    s = t.events.select(
        "user_id",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
    ).select("user_id", "value", F.lag("value").over(w).alias("prev"))
    return (
        s.filter(F.col("prev").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_pairs"),
            # zero-variance series: ANSI-mode corr() THROWS
            # DIVIDE_BY_ZERO (DuckDB's returns NULL) — compute the
            # identical statistic as covar/(sd*sd) with a nullif guard
            # so degenerate keys yield NULL instead of failing the job
            F.round(
                F.covar_samp("value", "prev")
                / F.nullif(
                    F.stddev_samp("value") * F.stddev_samp("prev"),
                    F.lit(0.0),
                ),
                6,
            ).alias("acf1"),
        )
        .filter(F.col("n_pairs") >= 3)
    )


# -- beyond ref: seasonality strength (eta-squared variance ratio) ----------

@register(
    "a_seasonality_strength",
    shadow_oracle="""
WITH e AS (
    SELECT event_type,
           CAST(dayofweek(CAST(ts AS DATE)) AS BIGINT) AS dow, value
    FROM events
), g AS (
    SELECT event_type, dow, count(*) AS n, sum(value) AS s,
           sum(value * value) AS ss
    FROM e GROUP BY event_type, dow
), tot AS (
    SELECT event_type, sum(n) AS nt, sum(s) AS st, sum(ss) AS sst
    FROM g GROUP BY event_type
)
SELECT g.event_type,
       CAST(max(nt) AS BIGINT) AS n,
       round(sum(s * s / n) - max(st * st / nt), 4) AS ss_between,
       round(max(sst - st * st / nt), 4) AS ss_total,
       round((sum(s * s / n) - max(st * st / nt))
             / (max(sst - st * st / nt)), 6) AS eta_sq
FROM g JOIN tot USING (event_type)
GROUP BY g.event_type
""",
)
def a_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality strength as eta-squared (one-way ANOVA
    variance ratio): SS_between/SS_total over weekday groups — near 0
    means the weekday explains nothing (no weekly cycle), near 1 a
    hard weekly pattern; the screen run before bothering with seasonal
    decomposition. Pure sufficient-statistics form: ONE partial-
    aggregated (group, weekday) pass collecting n/Σx/Σx², a tens-row
    rollup for the totals, and the algebraic identities
    SS_total = Σx² − (Σx)²/n, SS_between = Σ_g((Σx_g)²/n_g) − (Σx)²/n
    — the m16_regression_metrics posture: no second scan, no windows,
    nothing grows past the 7 x #groups grid. Weekday numbering
    cancels out of the ratio, so the engines' dayofweek convention
    mismatch is harmless HERE (groups are the same sets either way) —
    unlike a_chi2_independence, whose OUTPUT carries the labels."""
    t = Tables(spark, sf_dir)
    e = t.events.select(
        "event_type",
        F.dayofweek(F.to_date("ts")).cast("bigint").alias("dow"),
        "value",
    )
    g = e.groupBy("event_type", "dow").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    )
    tot = g.groupBy("event_type").agg(
        F.sum("n").alias("nt"), F.sum("s").alias("st"), F.sum("ss").alias("sst")
    )
    j = g.join(F.broadcast(tot), "event_type")
    ss_b = F.sum(F.col("s") * F.col("s") / F.col("n")) - F.max(
        F.col("st") * F.col("st") / F.col("nt")
    )
    ss_t = F.max(F.col("sst") - F.col("st") * F.col("st") / F.col("nt"))
    return j.groupBy("event_type").agg(
        F.max("nt").cast("bigint").alias("n"),
        F.round(ss_b, 4).alias("ss_between"),
        F.round(ss_t, 4).alias("ss_total"),
        F.round(ss_b / ss_t, 6).alias("eta_sq"),
    )


# -- beyond ref: Mann-Whitney U rank-sum test (nonparametric A/B) -----------

@register(
    "a_mann_whitney_u",
    shadow_oracle="""
WITH s AS (
    SELECT event_type, value,
           CASE WHEN (((((abs(user_id) + 999983) % 2147483647)
                       * 48271 % 2147483647) * 48271) % 2147483647)
                     / 2147483647.0 < 0.5
                THEN 1 ELSE 0 END AS is_a
    FROM events
), r AS (
    SELECT event_type, value, is_a,
           rank() OVER (PARTITION BY event_type ORDER BY value) AS rk,
           count(*) OVER (PARTITION BY event_type, value) AS tie_n
    FROM s
), a AS (
    SELECT event_type,
           CAST(sum(is_a) AS BIGINT) AS n_a,
           CAST(sum(1 - is_a) AS BIGINT) AS n_b,
           sum(CASE WHEN is_a = 1
                    THEN rk + (tie_n - 1) / 2.0 ELSE 0 END) AS r_a
    FROM r GROUP BY event_type
)
SELECT event_type, n_a, n_b,
       round(r_a - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1) / 2.0, 4)
           AS u_a,
       round((r_a - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1) / 2.0
              - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
             / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                    * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1) / 12.0),
             6) AS z
FROM a
""",
)
def a_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test per metric group — the
    NONPARAMETRIC A/B readout (same deterministic minstd assignment as
    a_ab_welch_test): compares distributions by rank, so one whale
    outlier can't swing it the way it swings a t-test on means. Ties
    get the textbook midrank treatment computed WITHOUT a dense-rank
    pass: rank() gives the tie group's first position and a
    (group, value) partition count its size, so midrank =
    rk + (tie_n − 1)/2 — exact halves, engine-stable. U = R_A −
    n_A(n_A+1)/2, z under the large-sample normal approximation
    (untied variance; fine at these n). Scale: ONE group-key exchange
    + sort serves both windows; the rollup reuses the partitioning."""
    t = Tables(spark, sf_dir)
    from ..operators.sampling import uniform_hash

    s = t.events.select(
        "event_type",
        "value",
        F.when(uniform_hash("user_id", mode="minstd") < 0.5, 1)
        .otherwise(0)
        .alias("is_a"),
    )
    wr = Window.partitionBy("event_type").orderBy("value")
    wt = Window.partitionBy("event_type", "value")
    r = s.select(
        "event_type",
        "is_a",
        F.rank().over(wr).alias("rk"),
        F.count("*").over(wt).alias("tie_n"),
    )
    a = r.groupBy("event_type").agg(
        F.sum("is_a").cast("bigint").alias("n_a"),
        F.sum(1 - F.col("is_a")).cast("bigint").alias("n_b"),
        F.sum(
            F.when(
                F.col("is_a") == 1,
                F.col("rk") + (F.col("tie_n") - 1) / 2.0,
            ).otherwise(0.0)
        ).alias("r_a"),
    )
    # combine in DOUBLE (cast each factor): the integer triple product
    # n_a*n_b*(n_a+n_b+1) overflows BIGINT under ANSI once groups pass
    # ~100M rows (caught by the round-9 1000x probe on the binned twin;
    # same expression here). The SQL mirror casts identically so the
    # engines round-trip the same doubles.
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    u_a = F.col("r_a") - na * (na + 1) / 2.0
    return a.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(u_a, 4).alias("u_a"),
        F.round(
            (u_a - na * nb / 2.0)
            / F.sqrt(na * nb * (na + nb + 1) / 12.0),
            6,
        ).alias("z"),
    )


# -- beyond ref: Spearman rank correlation vs time (monotone trend) ---------

@register(
    "a_spearman_trend",
    shadow_oracle="""
WITH r AS (
    SELECT event_type,
           2 * rank() OVER (PARTITION BY event_type ORDER BY ts)
             + count(*) OVER (PARTITION BY event_type, ts) - 1 AS rt2,
           2 * rank() OVER (PARTITION BY event_type ORDER BY value)
             + count(*) OVER (PARTITION BY event_type, value) - 1 AS rv2
    FROM events
), g AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           sum(CAST(rt2 AS HUGEINT)) AS sx,
           sum(CAST(rv2 AS HUGEINT)) AS sy,
           sum(CAST(rt2 AS HUGEINT) * rt2) AS sxx,
           sum(CAST(rv2 AS HUGEINT) * rv2) AS syy,
           sum(CAST(rt2 AS HUGEINT) * rv2) AS sxy
    FROM r GROUP BY event_type
)
SELECT event_type, n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / nullif(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                      0.0), 6) AS rho
FROM g
""",
)
def a_spearman_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of value against time per metric group
    — the SCALABLE monotone-trend test. Mann-Kendall (the textbook
    nonparametric trend test) is Θ(n²) pairwise sign comparisons;
    Spearman's rho against the time axis answers the same question
    ("is this metric drifting monotonically?") from two rank windows
    and one Pearson corr on the ranks — O(n log n), and robust to the
    whale outliers that bend a_trend_fit's least-squares slope. Ties on
    either axis get exact textbook midranks via the same
    rank() + (tie_n − 1)/2 identity as a_mann_whitney_u — kept in
    EXACT INTEGER form as DOUBLED midranks (2·rank + tie_n − 1), so
    the five distributed moment sums are integer-exact and order-
    invariant (the a_ks_test determinism pattern, round 9: the prior
    covar_samp/stddev form carried Welford merge states whose float
    divisions wobble with partial-merge order). The doubling cancels
    in the Pearson ratio; rho combines the five exact sums in one
    deterministic double expression, with a nullif guard for all-tied
    axes (where ANSI corr() would throw and DuckDB returns NULL).
    Scale: every window partitions by event_type, so ONE group-key
    exchange serves both rank sorts and the rollup reuses the
    partitioning; the shuffle carries five integer partials per
    (group, partition). Products sum in DECIMAL(38,0)/HUGEINT —
    4n³ stays under 38 digits at any realistic group depth."""
    t = Tables(spark, sf_dir)
    # doubled midrank 2r = 2*cnt_le - tie_n + 1, built from BIGINT
    # window counts instead of F.rank() (whose IntegerType caps groups
    # at 2^31 rows — code-review r9 finding); RANGE frames make the
    # cumulative count tie-inclusive, matching rank()+(tie-1)/2 exactly
    wt_cum = (
        Window.partitionBy("event_type")
        .orderBy("ts")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt_tie = Window.partitionBy("event_type", "ts")
    wv_cum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wv_tie = Window.partitionBy("event_type", "value")
    r = t.events.select(
        "event_type",
        (
            2 * F.count("*").over(wt_cum)
            - F.count("*").over(wt_tie)
            + 1
        ).alias("rt2"),
        (
            2 * F.count("*").over(wv_cum)
            - F.count("*").over(wv_tie)
            + 1
        ).alias("rv2"),
    )
    rt2d = F.col("rt2").cast("decimal(19,0)")
    rv2d = F.col("rv2").cast("decimal(19,0)")
    g = r.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        # decimal sums: sum(rt2) = n(n+1) would overflow BIGINT past
        # ~3e9 rows/group (the DuckDB mirror is already HUGEINT)
        F.sum(rt2d).alias("sx"),
        F.sum(rv2d).alias("sy"),
        F.sum(rt2d * rt2d).alias("sxx"),
        F.sum(rv2d * rv2d).alias("syy"),
        F.sum(rt2d * rv2d).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    return g.select(
        "event_type",
        "n",
        F.round(
            (nd * sxy - sx * sy)
            / F.nullif(
                F.sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)),
                F.lit(0.0),
            ),
            6,
        ).alias("rho"),
    )


# -- beyond ref: mutual information + Cramér's V (categorical dependence) ---

@register(
    "a_mutual_info",
    shadow_oracle="""
WITH j AS (
    SELECT lang, source, CAST(count(*) AS DOUBLE) AS c
    FROM documents GROUP BY lang, source
), mx AS (SELECT lang, sum(c) AS cx FROM j GROUP BY lang),
   my AS (SELECT source, sum(c) AS cy FROM j GROUP BY source),
   tot AS (SELECT sum(c) AS n FROM j),
   e AS (
    SELECT lang, source, c, cx, cy, n
    FROM j JOIN mx USING (lang) JOIN my USING (source) CROSS JOIN tot
)
SELECT CAST(max(n) AS BIGINT) AS n_docs,
       round(sum(c / n * ln(c * n / (cx * cy))), 6) AS mi_nats,
       round(sum(c / n * ln(c * n / (cx * cy)))
             / sqrt((-sum(c / n * ln(cx / n)) + 0.0)
                    * (-sum(c / n * ln(cy / n)) + 0.0)), 6) AS nmi,
       round(sqrt(sum(pow(c - cx * cy / n, 2) / (cx * cy / n))
                  / (max(n) * nullif(least(count(DISTINCT lang) - 1,
                                           count(DISTINCT source) - 1),
                                     0))), 6)
           AS cramers_v
FROM e
""",
)
def a_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats), normalized MI, and Cramér's V between
    the two categorical document facets (lang × source) — the
    feature-dependence screen a mixing pipeline runs before treating
    facets as independent sampling axes (a_chi2_independence answers
    "is there dependence?"; this quantifies HOW MUCH, on the [0,1] NMI
    / Cramér scales). Everything derives from the joint contingency
    table: marginal entropies fall out of the joint rows because
    Σ_y c·ln(cx/n) = cx·ln(cx/n), so no separate marginal scan is
    needed. Scale: ONE corpus exchange builds the ≤|langs|·|sources|
    joint table; marginals/total are tiny aggs over it, broadcast back;
    the final agg touches only contingency cells — corpus size affects
    exactly one partial-aggregated pass."""
    t = Tables(spark, sf_dir)
    j = (
        t.documents.groupBy("lang", "source")
        .agg(F.count("*").cast("double").alias("c"))
        .localCheckpoint(eager=False)
    )
    mx = j.groupBy("lang").agg(F.sum("c").alias("cx"))
    my = j.groupBy("source").agg(F.sum("c").alias("cy"))
    tot = j.agg(F.sum("c").alias("n"))
    e = (
        j.join(F.broadcast(mx), "lang")
        .join(F.broadcast(my), "source")
        .crossJoin(F.broadcast(tot))
    )
    c, cx, cy, n = F.col("c"), F.col("cx"), F.col("cy"), F.col("n")
    mi = F.sum(c / n * F.log(c * n / (cx * cy)))
    hx = -F.sum(c / n * F.log(cx / n)) + F.lit(0.0)
    hy = -F.sum(c / n * F.log(cy / n)) + F.lit(0.0)
    chi2 = F.sum(F.pow(c - cx * cy / n, F.lit(2.0)) / (cx * cy / n))
    # single-category degenerate corpus: dof = 0 — ANSI division would
    # throw (and DuckDB's double /0 gives inf); nullif makes BOTH
    # engines yield NULL
    dof = F.nullif(
        F.least(
            F.countDistinct("lang") - 1, F.countDistinct("source") - 1
        ),
        F.lit(0),
    )
    return e.agg(
        F.max("n").cast("bigint").alias("n_docs"),
        F.round(mi, 6).alias("mi_nats"),
        F.round(mi / F.sqrt(hx * hy), 6).alias("nmi"),
        F.round(F.sqrt(chi2 / (F.max("n") * dof)), 6).alias("cramers_v"),
    )


# -- beyond ref: per-user behavioral entropy (diversity profiling) ----------

@register(
    "a_user_entropy",
    shadow_oracle="""
WITH c AS (
    SELECT user_id, event_type, CAST(count(*) AS DOUBLE) AS c
    FROM events GROUP BY user_id, event_type
), e AS (
    SELECT user_id, c,
           sum(c) OVER (PARTITION BY user_id) AS tot,
           count(*) OVER (PARTITION BY user_id) AS k
    FROM c
)
SELECT user_id,
       CAST(max(tot) AS BIGINT) AS n_events,
       CAST(max(k) AS BIGINT) AS n_types,
       round(-sum(c / tot * ln(c / tot)) + 0.0, 6) AS entropy_nats,
       round(CASE WHEN max(k) > 1
                  THEN (-sum(c / tot * ln(c / tot)) + 0.0) / ln(max(k))
                  ELSE 0.0 END, 6) AS norm_entropy
FROM e GROUP BY user_id
""",
)
def a_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity score (0 = single-behavior bot-like, 1 on the
    normalized scale = uniform across every observed type). The
    text-side twin is text_token_entropy; this is the EVENT-side
    diversity profile a sampling pipeline uses to stratify users by
    behavioral breadth. `+ 0.0` canonicalizes the IEEE −0.0 that
    −Σ p·ln(p) produces for single-type users in both engines.
    Scale: one partial-aggregated (user, type) exchange, one user-key
    window exchange; the final per-user rollup reuses the window
    partitioning; state per user is bounded by the event-type
    vocabulary (tens), never raw rows."""
    t = Tables(spark, sf_dir)
    c = t.events.groupBy("user_id", "event_type").agg(
        F.count("*").cast("double").alias("c")
    )
    w = Window.partitionBy("user_id")
    e = c.select(
        "user_id",
        "c",
        F.sum("c").over(w).alias("tot"),
        F.count("*").over(w).alias("k"),
    )
    p = F.col("c") / F.col("tot")
    h = -F.sum(p * F.log(p)) + F.lit(0.0)
    return e.groupBy("user_id").agg(
        F.max("tot").cast("bigint").alias("n_events"),
        F.max("k").cast("bigint").alias("n_types"),
        F.round(h, 6).alias("entropy_nats"),
        F.round(
            F.when(F.max("k") > 1, h / F.log(F.max("k"))).otherwise(0.0),
            6,
        ).alias("norm_entropy"),
    )


# -- beyond ref: equi-depth decile binning (feature discretization) ---------

@register(
    "a_quantile_bins",
    shadow_oracle="""
WITH r AS (
    SELECT event_type, value,
           ntile(10) OVER (PARTITION BY event_type
                           ORDER BY value, event_id) AS decile
    FROM events
)
SELECT event_type, CAST(decile AS INT) AS decile,
       CAST(count(*) AS BIGINT) AS n,
       round(min(value), 6) AS lo,
       round(max(value), 6) AS hi,
       round(avg(value), 4) AS bin_avg
FROM r GROUP BY event_type, decile
""",
)
def a_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH decile binning per metric group — the feature-
    discretization primitive (a_histogram_value is the equi-WIDTH
    twin: fixed bin edges, skewed masses; this fixes the masses and
    lets the edges float, which is what tree/quantile-based models
    and drift monitors actually want). ntile ties are resolved by the
    (value, event_id) total order so both engines assign the identical
    row→bucket permutation — ntile's bucket-size rule (first n mod k
    buckets take the extra row) is the same in Spark and DuckDB.
    Scale: ONE group-key exchange serves the ntile sort and the
    (group, decile) rollup refines the same partitioning; at 100 TB
    the same shape runs on approx_percentile edges instead of a full
    sort (the a_percentiles_approx swap pattern)."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    r = t.events.select(
        "event_type", "value", F.ntile(10).over(w).alias("decile")
    )
    return r.groupBy("event_type", "decile").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
        F.round(F.avg("value"), 4).alias("bin_avg"),
    )


@register("a_quantile_bins_approx")  # rows-only: sketch edges; bin-mass
# error vs the exact ntile form pinned in tests/test_scale_toolkit.py
def a_quantile_bins_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered 100 TB form of a_quantile_bins (VERDICT r8 #4):
    equi-depth deciles from Greenwald-Khanna cutpoints instead of a
    per-group ntile sort. The exact form's single group-key exchange
    carries EVERY row into one sorted partition per group — the 100x
    probe showed 29x growth when groups deepen 100x. Here the decile
    EDGES come from one percentile_approx partial agg (fixed mergeable
    sketch state per partition, #groups result rows, broadcast back),
    and each row labels itself map-side by counting edges below its
    value (the text_ccnet_buckets cutpoint pattern) — no full sort
    anywhere, cost ~flat in group depth. Rank error per edge is
    <= group_n/accuracy (accuracy=10000). Output columns match the
    exact query so the two are drop-in swappable; the dispatch rule
    (exact under ~1M rows/group, sketch above) is documented in
    PERFORMANCE.md "Per-group order statistics: the dispatch rule"."""
    t = Tables(spark, sf_dir)
    cuts = t.events.groupBy("event_type").agg(
        F.percentile_approx(
            "value", F.array(*[F.lit(i / 10.0) for i in range(1, 10)]),
            F.lit(10000),
        ).alias("cuts")
    )
    e = t.events.join(F.broadcast(cuts), "event_type")
    decile = F.aggregate(
        "cuts",
        F.lit(1),
        lambda acc, c: acc + F.when(F.col("value") > c, 1).otherwise(0),
    )
    r = e.select("event_type", "value", decile.cast("int").alias("decile"))
    return r.groupBy("event_type", "decile").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
        F.round(F.avg("value"), 4).alias("bin_avg"),
    )


@register("a_rank_normalize_approx")  # rows-only: GK cell labels;
# |pct - exact| <= 1/(2*cells) + sketch error pinned in tests/test_scale_toolkit.py
def a_rank_normalize_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The group-depth-independent form of a_rank_normalize (VERDICT r9
    #6: the dispatch table said "same GK-labeling pattern at finer
    grain" — this registers the swap concretely). The exact query's
    percent_rank is ONE sort per group (21.5x at 100x group depth);
    here each row gets the MIDPOINT of its 256-cell GK quantile cell:
    255 cutpoints per group from one percentile_approx partial agg
    (bounded mergeable sketch state, #groups result rows, broadcast
    back), then a map-side count-of-cutpoints-below label — no sort
    anywhere, cost ~flat in group depth. Error: exact pct_rank is
    uniform within a cell, so the midpoint is off by <= 1/(2*256) +
    GK rank error (n/10000) + within-cell tie mass. Output columns
    match the exact query (drop-in swap); pct_rank is approximate,
    which is fine for its consumer (a monotone feature transform)."""
    n_cells = 256
    t = Tables(spark, sf_dir)
    cuts = t.events.groupBy("event_type").agg(
        F.percentile_approx(
            "value",
            F.array(*[F.lit(k / n_cells) for k in range(1, n_cells)]),
            F.lit(10000),
        ).alias("cuts")
    )
    # PROBE side fans out (per-row label against fixed cuts — exact and
    # partition-safe); the cuts side keeps the raw scan because GK
    # sketch merges are merge-order-sensitive and must stay bit-stable.
    e = fan_out(t.events).join(F.broadcast(cuts), "event_type")
    cell = F.aggregate(
        "cuts",
        F.lit(0),
        lambda acc, c: acc + F.when(F.col("value") > c, 1).otherwise(0),
    )
    return e.select(
        "event_type",
        "event_id",
        F.round("value", 6).alias("value"),
        F.round((cell + 0.5) / F.lit(float(n_cells)), 6).alias("pct_rank"),
    )


@register("a_gini_value_approx")  # rows-only: sketch-binned Lorenz
# integral; |approx - exact| <= ~1/n_bins pinned in tests/test_scale_toolkit.py
def a_gini_value_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The group-depth-independent form of a_gini_value (dispatch rule,
    PERFORMANCE.md): the exact query's 21x-at-100x cost is ONE sort per
    group for the rank integral 2·Σ(i·x)/(n·Σx). Here the Lorenz curve
    is evaluated on 64 GK equi-depth bins — cutpoint agg (bounded
    sketch state), map-side bin labels, a (group, bin) partial agg, and
    a <=64-row-per-group trapezoid rollup. Grouping values into bins
    ignores only WITHIN-bin inequality, so the trapezoid underestimates
    G by at most the largest bin's mass share (~1/64 at equi-depth).
    Output columns match the exact query (drop-in swap)."""
    n_bins = 64
    t = Tables(spark, sf_dir)
    src = t.events.filter(F.col("value") >= 0)
    cuts = src.groupBy("event_type").agg(
        F.percentile_approx(
            "value",
            F.array(*[F.lit(k / n_bins) for k in range(1, n_bins)]),
            F.lit(10000),
        ).alias("cuts")
    )
    # probe side fans out; GK cuts side keeps the raw scan (see
    # a_rank_normalize_approx)
    e = fan_out(src).join(F.broadcast(cuts), "event_type")
    bin_ = F.aggregate(
        "cuts",
        F.lit(0),
        lambda acc, c: acc + F.when(F.col("value") > c, 1).otherwise(0),
    )
    g = e.select("event_type", "value", bin_.alias("bin")).groupBy(
        "event_type", "bin"
    ).agg(
        F.count("*").alias("nb"), F.sum("value").alias("sb")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy("event_type")
    c = g.select(
        "event_type",
        (F.sum("nb").over(wc) / F.sum("nb").over(wp)).alias("p"),
        (F.sum("sb").over(wc) / F.sum("sb").over(wp)).alias("lz"),
        F.sum("nb").over(wp).alias("n"),
        F.sum("sb").over(wp).alias("sv"),
    )
    wl = Window.partitionBy("event_type").orderBy("p")
    seg = c.select(
        "event_type",
        "n",
        "sv",
        (
            (F.col("p") - F.coalesce(F.lag("p").over(wl), F.lit(0.0)))
            * (F.col("lz") + F.coalesce(F.lag("lz").over(wl), F.lit(0.0)))
        ).alias("trap"),
    )
    return seg.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.round(F.max("sv"), 4).alias("total_value"),
        F.round(1.0 - F.sum("trap"), 6).alias("gini"),
    )


@register("a_mann_whitney_binned")  # rows-only: histogram-approximate U;
# midrank-displacement bound vs the exact twin pinned in
# tests/test_scale_toolkit.py
def a_mann_whitney_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB shape of a_mann_whitney_u (dispatch rule,
    PERFORMANCE.md; the a_ks_test_binned pattern): the exact test pays
    a per-group rank sort (18x at 100x group depth); this twin bins
    values onto a 256-bin fixed-width grid — min/max pre-agg broadcast,
    map-side bin labels, ONE (group, bin) partial agg whose shuffle
    carries #groups x 256 x 2 counts regardless of depth — and treats
    each bin as one tie block, which is EXACTLY the midrank U statistic
    of the coarsened values: R_A = Σ_i a_i·(cum_before_i + (t_i+1)/2).
    Each observation's midrank moves < t_i/2 from its exact value, so
    |ΔR_A| <= Σ a_i·(t_i-1)/2 — the bound the test asserts. Output
    columns match the exact query (drop-in swap)."""
    n_bins = 256
    t = Tables(spark, sf_dir)
    from ..operators.sampling import uniform_hash

    s = t.events.select(
        "event_type",
        "value",
        F.when(uniform_hash("user_id", mode="minstd") < 0.5, 1)
        .otherwise(0)
        .alias("is_a"),
    )
    bounds = s.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    b = s.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "is_a",
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_bins - 1),
                F.floor(
                    (F.col("value") - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / n_bins)
                ).cast("int"),
            )
        )
        .alias("bin"),
    )
    g = b.groupBy("event_type", "bin").agg(
        F.sum("is_a").alias("a"), F.sum(1 - F.col("is_a")).alias("bcnt")
    )
    wprev = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = g.select(
        "event_type",
        "a",
        "bcnt",
        F.coalesce(
            F.sum(F.col("a") + F.col("bcnt")).over(wprev), F.lit(0)
        ).alias("before"),
    )
    agg = r.groupBy("event_type").agg(
        F.sum("a").cast("bigint").alias("n_a"),
        F.sum("bcnt").cast("bigint").alias("n_b"),
        F.sum(
            F.col("a")
            * (F.col("before") + (F.col("a") + F.col("bcnt") + 1) / 2.0)
        ).alias("r_a"),
    )
    # combine in DOUBLE: the integer triple product n_a*n_b*(n_a+n_b+1)
    # overflows BIGINT (ANSI throw) once groups pass ~100M rows — the
    # round-9 1000x probe caught exactly that
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    u_a = F.col("r_a") - na * (na + 1) / 2.0
    return agg.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(u_a, 4).alias("u_a"),
        F.round(
            (u_a - na * nb / 2.0)
            / F.sqrt(na * nb * (na + nb + 1) / 12.0),
            6,
        ).alias("z"),
    )


@register("a_psi_drift_approx")  # rows-only: GK-median half split;
# |psi - exact| envelope pinned in tests/test_scale_toolkit.py
def a_psi_drift_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The group-depth-independent form of a_psi_drift (dispatch rule,
    PERFORMANCE.md): the exact query's only deep-group cost is the
    ntile(2) time-half sort (11.4x at 100x depth). Here the half split
    is a GK median of ts_us per group (bounded sketch agg, #groups-row
    broadcast, map-side comparison) — rank error <= n/10000 rows land
    on the wrong side of the split, shifting each bucket's count by at
    most that much. Downstream (equi-width min/max deciles, +0.5/+5
    Laplace smoothing, the PSI rollup on the <=|groups|·10 pivot) the
    formulas match the exact query, with one second-order caveat: the
    GK split may give na != nb, so a bucket empty in BOTH halves (which
    the groupBy grid drops) no longer contributes exactly 0 to PSI the
    way ntile(2)'s equal halves guarantee — a small extra error term on
    top of the rank bound, included in the envelope that
    tests/test_scale_toolkit.py pins empirically."""
    t = Tables(spark, sf_dir)
    src = t.events.select(
        "event_type",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    med = src.groupBy("event_type").agg(
        F.percentile_approx("ts_us", F.lit(0.5), F.lit(10000)).alias("med")
    )
    # min/max don't depend on the half split — aggregate them straight
    # off src so the med-join subtree isn't duplicated into a second
    # scan (saves two exchanges)
    mm = src.groupBy("event_type").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    j = (
        src.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mm), "event_type")
        .select(
            "event_type",
            "value",
            "mn",
            "mx",
            F.when(F.col("ts_us") <= F.col("med"), 1)
            .otherwise(2)
            .alias("half"),
        )
    )
    width = (F.col("mx") - F.col("mn")) / 10
    bucket = (
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col("value") - F.col("mn")) / width).cast(
                    "bigint"
                ),
                F.lit(9),
            )
        )
        .alias("bucket")
    )
    b = j.groupBy("event_type", bucket).agg(
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("half") == 2, 1).otherwise(0)).alias("cb"),
    )
    wt = Window.partitionBy("event_type")
    g = b.select(
        "event_type",
        "ca",
        "cb",
        F.sum("ca").over(wt).alias("na"),
        F.sum("cb").over(wt).alias("nb"),
    )
    pa = (F.col("ca") + 0.5) / (F.col("na") + 5.0)
    pb = (F.col("cb") + 0.5) / (F.col("nb") + 5.0)
    return g.groupBy("event_type").agg(
        (F.max("na") + F.max("nb")).cast("bigint").alias("n"),
        F.round(F.sum((pa - pb) * F.log(pa / pb)), 6).alias("psi"),
    )


# -- beyond ref: Population Stability Index (temporal drift monitor) --------

@register(
    "a_psi_drift",
    shadow_oracle="""
WITH e AS (
    SELECT event_type, value,
           ntile(2) OVER (PARTITION BY event_type
                          ORDER BY ts, event_id) AS half
    FROM events
), mm AS (
    SELECT event_type, min(value) AS mn, max(value) AS mx
    FROM e GROUP BY event_type
), b AS (
    SELECT e.event_type,
           CASE WHEN mx = mn THEN 0
                ELSE least(CAST(floor((e.value - mn) / ((mx - mn) / 10))
                                AS BIGINT), 9) END AS bucket,
           sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS ca,
           sum(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS cb
    FROM e JOIN mm USING (event_type)
    GROUP BY 1, 2
), g AS (
    SELECT event_type, ca, cb,
           sum(ca) OVER (PARTITION BY event_type) AS na,
           sum(cb) OVER (PARTITION BY event_type) AS nb
    FROM b
)
SELECT event_type,
       CAST(max(na) + max(nb) AS BIGINT) AS n,
       round(sum(((ca + 0.5) / (na + 5.0) - (cb + 0.5) / (nb + 5.0))
                 * ln(((ca + 0.5) / (na + 5.0))
                      / ((cb + 0.5) / (nb + 5.0)))), 6) AS psi
FROM g GROUP BY event_type
""",
)
def a_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per metric group between the first
    and second time-half of the stream — THE production ML-monitoring
    drift metric (scorecard convention: PSI < 0.1 stable, > 0.25
    investigate). Halves come from ntile(2) over the deterministic
    (ts, event_id) order; bins are the same equi-width deciles as
    a_histogram_value; each bucket gets +0.5 Laplace mass (+5 on the
    totals) so one-sided buckets stay finite — buckets empty in BOTH
    halves contribute exactly 0, so skipping them is exact, not an
    approximation. a_ks_test answers "did the distribution move?" with
    a sup-statistic; PSI localizes HOW MUCH mass moved, per bin.
    Scale: one group-key exchange for the ntile sort, one tiny min/max
    agg broadcast back, one partial-aggregated (group, bucket, half)
    count; the PSI rollup runs on the ≤|groups|·10 pivot table."""
    t = Tables(spark, sf_dir)
    wh = Window.partitionBy("event_type").orderBy("ts", "event_id")
    e = t.events.select(
        "event_type", "value", F.ntile(2).over(wh).alias("half")
    )
    mm = e.groupBy("event_type").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    j = e.join(F.broadcast(mm), "event_type")
    width = (F.col("mx") - F.col("mn")) / 10
    bucket = (
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col("value") - F.col("mn")) / width).cast(
                    "bigint"
                ),
                F.lit(9),
            )
        )
        .alias("bucket")
    )
    b = j.groupBy("event_type", bucket).agg(
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("half") == 2, 1).otherwise(0)).alias("cb"),
    )
    wt = Window.partitionBy("event_type")
    g = b.select(
        "event_type",
        "ca",
        "cb",
        F.sum("ca").over(wt).alias("na"),
        F.sum("cb").over(wt).alias("nb"),
    )
    pa = (F.col("ca") + 0.5) / (F.col("na") + 5.0)
    pb = (F.col("cb") + 0.5) / (F.col("nb") + 5.0)
    return g.groupBy("event_type").agg(
        (F.max("na") + F.max("nb")).cast("bigint").alias("n"),
        F.round(F.sum((pa - pb) * F.log(pa / pb)), 6).alias("psi"),
    )
