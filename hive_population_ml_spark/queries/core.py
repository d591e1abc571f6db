"""Core queries: flagship interval-join pipeline + projections / filters /
joins (SURVEY.md §2.2–§2.3).

Every query here mirrors a reference operator; docstrings cite the
reference location the semantics come from. All computed columns are
aliased identically in the Spark plan and the DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import Tables
from ..operators.interval_join import as_of_join, interval_join
from .registry import register

# ---------------------------------------------------------------------------
# Flagship: interval join + windowed stats bundle + CASE label + HAVING gate
# (reference: preprocessing.py:142-204 — create_population_dataset: per-
#  annotation 7-day centered window, stats bundle A1/A4, coverage gate P10,
#  CASE label P11). Role mapping per FIXTURES.md §C/§D: orders = dated
# annotations (o_custkey ≈ hive_id, o_orderdate ≈ evaluation date);
# lineitem routed through orders = the sensor fact stream.
# ---------------------------------------------------------------------------

_FLAGSHIP_SQL = """
WITH fact AS (
    SELECT o.o_custkey AS custkey,
           l.l_shipdate AS ts,
           l.l_extendedprice AS price
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT d.o_orderkey AS anchor_orderkey,
       d.o_custkey  AS custkey,
       strftime(d.o_orderdate, '%Y-%m-%d') AS anchor_date,
       count(f.price)                 AS price_n,
       round(avg(f.price), 6)         AS price_avg,
       round(stddev_samp(f.price), 6) AS price_std,
       min(f.price)                   AS price_min,
       max(f.price)                   AS price_max,
       max(f.price) - min(f.price)    AS price_range,
       round(count(f.price) / 14.0, 6) AS coverage,
       CASE WHEN max(f.price) >= 50000 THEN 1 ELSE 0 END AS high_value
FROM orders d
JOIN fact f
  ON f.custkey = d.o_custkey
 AND f.ts BETWEEN d.o_orderdate - INTERVAL 7 DAY
              AND d.o_orderdate + INTERVAL 7 DAY
GROUP BY 1, 2, 3
HAVING count(f.price) >= 3
"""


@register("flagship_interval_stats", oracle=_FLAGSHIP_SQL)
def flagship_interval_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 interval join + A1/A4 stats bundle + P10 gate + P11 CASE.

    Physical plan: lineitem⋈orders is a shuffle hash/SMJ on orderkey;
    the interval join hashes on custkey (equi-conjunct) with the
    BETWEEN range as join filter — one scan of the fact side total,
    vs the reference's O(A×S) iterrows rescan (preprocessing.py:165-183).
    """
    t = Tables(spark, sf_dir)
    orders = t.orders
    fact = (
        t.lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("l_shipdate").alias("ts"),
            F.col("l_extendedprice").alias("price"),
        )
    )
    # Round-12 tried a KEYED fan-out (fan_out_by(fact, "custkey")) here;
    # round 13 REMOVED it. The r12 advisory's hole applies to exactly
    # this site: `fact` is a two-scan join, so the "single row-bearing
    # producer feeds each partition in scan order" bit-identity
    # argument only holds while the orderkey join stays broadcast —
    # which the gate cannot prove from metadata. The tightened gate
    # (one input row group TOTAL) therefore refuses, and the driver's
    # cold measurement agreed the win was noise anyway: 1.09x at 32
    # cores, with the 8-core run FASTER (PERF_r12 scaling 0.83) — the
    # rounded-avg/stddev agg floor is the broadcast builds + one probe
    # pass, decomposed in OPTIMIZATION_r13.md (VERDICT r12 #7).
    dim = orders.select("o_orderkey", "o_custkey", "o_orderdate")
    # dim side is NOT broadcast here: at 100 TB both sides are large and
    # share the custkey equi-conjunct, so a co-partitioned join scales;
    # AQE will still pick broadcast when the dim side is tiny.
    j = interval_join(
        fact,
        dim,
        on=[("custkey", "o_custkey")],
        fact_ts="ts",
        dim_ts="o_orderdate",
        before=7,
        after=7,
        unit="day",
        broadcast_dim=False,
    )
    # Group by the raw date and format AFTER the agg: a string group key
    # would run date_format per joined row (6M at sf0.1) instead of per
    # group, and hash strings instead of int64s through the shuffle.
    return (
        j.groupBy(
            F.col("o_orderkey").alias("anchor_orderkey"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderdate").alias("anchor_dt"),
        )
        .agg(
            F.count("price").alias("price_n"),
            F.round(F.avg("price"), 6).alias("price_avg"),
            F.round(F.stddev_samp("price"), 6).alias("price_std"),
            F.min("price").alias("price_min"),
            F.max("price").alias("price_max"),
            (F.max("price") - F.min("price")).alias("price_range"),
            F.round(F.count("price") / F.lit(14.0), 6).alias("coverage"),
            F.when(F.max("price") >= 50000, 1).otherwise(0).alias("high_value"),
        )
        .filter(F.col("price_n") >= 3)
        .withColumn("anchor_date", F.date_format("anchor_dt", "yyyy-MM-dd"))
        .drop("anchor_dt")
    )


# ---------------------------------------------------------------------------
# P2–P6: projection, literal column, equality + BETWEEN + compound filters
# (reference: loader.py:77,86 literal period; preprocessing.py:74,93-94,
#  329-333 hive/time filters).
# ---------------------------------------------------------------------------

@register(
    "p_filter_project",
    shadow_oracle="""
SELECT event_id, event_type, value, 'W1' AS period
FROM events
WHERE user_id = 7
  AND ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-12 00:00:00'
""",
)
def p_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.sources import scan_events_range

    # Range on the RAW nanos column so it reaches parquet row-group
    # pruning (a filter on the derived timestamp cannot push down).
    ev = scan_events_range(spark, sf_dir, "2024-01-05 00:00:00", "2024-01-12 00:00:00")
    return ev.filter(F.col("user_id") == 7).select(
        "event_id", "event_type", "value", F.lit("W1").alias("period")
    )


# ---------------------------------------------------------------------------
# P7/P12/F13: null guards, try-cast, imputation
# (reference: loader.py:327-334 _safe_float; dataset.py:103 nan_to_num).
# ---------------------------------------------------------------------------

@register(
    "p_null_guard_cast",
    oracle="""
SELECT c_custkey,
       COALESCE(bal, 0.0) AS bal_filled,
       CAST(bal IS NOT NULL AS INT) AS bal_mask,
       TRY_CAST(c_mktsegment AS DOUBLE) AS seg_num
FROM (
    SELECT c_custkey, c_mktsegment,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
    FROM customer
)
WHERE c_custkey IS NOT NULL
""",
)
def p_null_guard_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    base = t.customer.withColumn(
        "bal", F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal"))
    )
    return (
        base.filter(F.col("c_custkey").isNotNull())
        .select(
            "c_custkey",
            F.coalesce(F.col("bal"), F.lit(0.0)).alias("bal_filled"),
            F.col("bal").isNotNull().cast("int").alias("bal_mask"),
            F.expr("try_cast(c_mktsegment AS DOUBLE)").alias("seg_num"),
        )
    )


# ---------------------------------------------------------------------------
# S2/J3/P2: multi-scan union with provenance column
# (reference: loader.py:71-91 — D1+D2 concat with literal period tags).
# ---------------------------------------------------------------------------

@register(
    "s2_union_provenance",
    shadow_oracle="""
SELECT period, l_returnflag,
       count(*) AS n,
       sum(l_quantity) AS sum_qty
FROM (
    SELECT 'open' AS period, l_returnflag, l_quantity
    FROM lineitem WHERE l_linestatus = 'O'
    UNION ALL
    SELECT 'finished' AS period, l_returnflag, l_quantity
    FROM lineitem WHERE l_linestatus = 'F'
)
GROUP BY period, l_returnflag
""",
)
def s2_union_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    li = t.lineitem
    d1 = li.filter(F.col("l_linestatus") == "O").select(
        F.lit("open").alias("period"), "l_returnflag", "l_quantity"
    )
    d2 = li.filter(F.col("l_linestatus") == "F").select(
        F.lit("finished").alias("period"), "l_returnflag", "l_quantity"
    )
    return (
        d1.unionByName(d2)
        .groupBy("period", "l_returnflag")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("sum_qty"))
    )


# ---------------------------------------------------------------------------
# J2/F8–F11: fuzzy suffix-key normalization -> broadcast equi-join
# (reference: preprocessing.py:168-177 — 6-digit sensor id matched to
#  4-digit annotation id by suffix; normalized here to a derived join key
#  instead of a theta join).
# ---------------------------------------------------------------------------

@register(
    "j2_key_normalize",
    shadow_oracle="""
SELECT k2,
       count(*) AS n_pairs,
       round(avg(c.c_acctbal + s.s_acctbal), 6) AS avg_joint_bal
FROM (SELECT substr(lpad(CAST(c_custkey AS VARCHAR), 6, '0'), 5, 2) AS k2, c_acctbal
      FROM customer) c
JOIN (SELECT substr(lpad(CAST(s_suppkey AS VARCHAR), 6, '0'), 5, 2) AS k2, s_acctbal
      FROM supplier) s
USING (k2)
GROUP BY k2
""",
)
def j2_key_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)

    def norm(df: DataFrame, key: str, keep: str) -> DataFrame:
        return df.select(
            F.substring(F.lpad(F.col(key).cast("string"), 6, "0"), 5, 2).alias("k2"),
            keep,
        )

    c = norm(t.customer, "c_custkey", "c_acctbal")
    s = F.broadcast(norm(t.supplier, "s_suppkey", "s_acctbal"))
    return (
        c.join(s, "k2")
        .groupBy("k2")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.avg(F.col("c_acctbal") + F.col("s_acctbal")), 6).alias(
                "avg_joint_bal"
            ),
        )
    )


# ---------------------------------------------------------------------------
# J5/M4/P8: leakage-safe group-wise split via deterministic key bucketing +
# semi-join (reference: preprocessing.py:532-567 split_by_hive — split is
# over DISTINCT keys, never rows, so no group straddles two splits).
# ---------------------------------------------------------------------------

@register(
    "j5_semi_split",
    shadow_oracle="""
SELECT split,
       count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_custs
FROM (
    SELECT o.*, CASE WHEN c.c_custkey % 10 < 7 THEN 'train'
                     WHEN c.c_custkey % 10 < 9 THEN 'val'
                     ELSE 'test' END AS split
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
)
GROUP BY split
""",
)
def j5_semi_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    keys = t.customer.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 10 < 7, "train")
        .when(F.col("c_custkey") % 10 < 9, "val")
        .otherwise("test")
        .alias("split"),
    )
    return (
        t.orders.join(F.broadcast(keys), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_custs"),
        )
    )


# ---------------------------------------------------------------------------
# As-of join (SURVEY §2.3 extension): most recent fact row at or before each
# anchor date, bounded lookback, deterministic tie-break.
# ---------------------------------------------------------------------------

@register(
    "asof_nearest_ship",
    oracle="""
SELECT anchor_orderkey, ship_date, price
FROM (
    SELECT d.o_orderkey AS anchor_orderkey,
           strftime(f.ts, '%Y-%m-%d') AS ship_date,
           f.price,
           row_number() OVER (
               PARTITION BY d.o_orderkey
               ORDER BY f.ts DESC, f.price DESC, f.lineid ASC
           ) AS rn
    FROM (SELECT o_orderkey, o_custkey, o_orderdate FROM orders
          WHERE o_orderkey % 7 = 0) d
    JOIN (
        SELECT o.o_custkey AS custkey, l.l_shipdate AS ts,
               l.l_extendedprice AS price,
               l.l_orderkey * 10 + l.l_linenumber AS lineid
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ) f
      ON f.custkey = d.o_custkey
     AND f.ts BETWEEN d.o_orderdate - INTERVAL 7 DAY AND d.o_orderdate
)
WHERE rn = 1
""",
)
def asof_nearest_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    orders = t.orders
    fact = (
        t.lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("l_shipdate").alias("ts"),
            F.col("l_extendedprice").alias("price"),
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("lineid"),
        )
    )
    # keyed fan-out tried and REVERTED (round 12): unlike the flagship,
    # the as-of window re-keys on o_orderkey, so the repartition cannot
    # replace any exchange — and WindowGroupLimit already collapses each
    # anchor to its top row BELOW the window's exchange, so the unfanned
    # probe ships almost nothing. A/B measured 1.48 s -> 2.18 s median
    # (control-normalized worse still).
    dim = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    j = as_of_join(
        fact,
        dim,
        on=[("custkey", "o_custkey")],
        fact_ts="ts",
        dim_ts="o_orderdate",
        max_lookback=7,
        unit="day",
        dim_id="o_orderkey",
        tiebreak=[F.col("price").desc(), F.col("lineid").asc()],
    )
    return j.select(
        F.col("o_orderkey").alias("anchor_orderkey"),
        F.date_format("ts", "yyyy-MM-dd").alias("ship_date"),
        "price",
    )


# ---------------------------------------------------------------------------
# Outer/anti join semantics (SURVEY §2.3 notes these as absent from the
# reference but free in Spark — demonstrated and oracle-checked here).
# ---------------------------------------------------------------------------

@register(
    "j_outer_anti",
    oracle="""
SELECT c.c_mktsegment AS segment,
       count(*) AS n_customers,
       CAST(sum(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_without_orders
FROM customer c
LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
  ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
""",
)
def j_outer_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join against the distinct order keys; the null side
    count is exactly the anti-join cardinality (customers with no
    orders) — one pass covers both semantics."""
    t = Tables(spark, sf_dir)
    o = t.orders.select("o_custkey").distinct()
    return (
        t.customer.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("o_custkey").isNull().cast("int")).alias(
                "n_without_orders"
            ),
        )
    )


@register(
    "j_multiway_revenue",
    oracle="""
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_items
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""",
)
def j_multiway_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped five-table join: local-supplier revenue by
    nation for one region. The join-planning stress query: Catalyst
    orders the chain, broadcasts every dimension (region/nation/
    supplier/customer are all tiny next to lineitem), and pushes the
    region filter through nation to customer BEFORE the fact join —
    at 100 TB only lineitem⋈orders shuffles, co-partitioned on
    orderkey. Declared with plain joins, no hints: the point is that
    the OPTIMIZER finds this plan."""
    t = Tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.customer.join(
            t.orders, F.col("c_custkey") == F.col("o_custkey")
        )
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(t.region, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.round(F.sum(rev), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "o_set_operations",
    shadow_oracle="""
WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
buyers   AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
both_ AS (SELECT user_id FROM clickers INTERSECT SELECT user_id FROM buyers),
only_click AS (SELECT user_id FROM clickers EXCEPT SELECT user_id FROM buyers)
SELECT 'clicked_and_bought' AS cohort, count(*) AS n FROM both_
UNION ALL
SELECT 'clicked_never_bought', count(*) FROM only_click
""",
)
def o_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT cohort arithmetic (the set-operator surface):
    Spark compiles both to semi/anti hash joins over the distinct key
    sets — at scale these are the same shuffles a groupBy needs, never
    a sort-merge of full rows."""
    t = Tables(spark, sf_dir)
    clickers = (
        t.events.filter(F.col("event_type") == "click")
        .select("user_id")
        .distinct()
    )
    buyers = (
        t.events.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    both = clickers.intersect(buyers).agg(
        F.lit("clicked_and_bought").alias("cohort"),
        F.count("*").alias("n"),
    )
    only = clickers.exceptAll(buyers).agg(
        F.lit("clicked_never_bought").alias("cohort"),
        F.count("*").alias("n"),
    )
    return both.unionByName(only)


@register(
    "asof_forward_ship",
    shadow_oracle="""
SELECT anchor_orderkey, ship_date, price
FROM (
    SELECT d.o_orderkey AS anchor_orderkey,
           strftime(f.ts, '%Y-%m-%d') AS ship_date,
           f.price,
           row_number() OVER (
               PARTITION BY d.o_orderkey
               ORDER BY f.ts ASC, f.price DESC, f.lineid ASC
           ) AS rn
    FROM (SELECT o_orderkey, o_custkey, o_orderdate FROM orders
          WHERE o_orderkey % 7 = 0) d
    JOIN (
        SELECT o.o_custkey AS custkey, l.l_shipdate AS ts,
               l.l_extendedprice AS price,
               l.l_orderkey * 10 + l.l_linenumber AS lineid
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ) f
      ON f.custkey = d.o_custkey
     AND f.ts BETWEEN d.o_orderdate AND d.o_orderdate + INTERVAL 7 DAY
)
WHERE rn = 1
""",
)
def asof_forward_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of (nearest-after with bounded tolerance): the first
    shipment at or after each anchor date within 7 days — the
    symmetric twin of asof_nearest_ship via the same
    ``as_of_join(direction="forward")`` operator. Same scale shape:
    the tolerance bound caps per-anchor fan-in, the rank window
    partitions by anchor, ties break deterministically."""
    t = Tables(spark, sf_dir)
    fact = (
        t.lineitem.join(
            t.orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("l_shipdate").alias("ts"),
            F.col("l_extendedprice").alias("price"),
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("lineid"),
        )
    )
    dim = t.orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    j = as_of_join(
        fact,
        dim,
        on=[("custkey", "o_custkey")],
        fact_ts="ts",
        dim_ts="o_orderdate",
        max_lookback=7,
        unit="day",
        dim_id="o_orderkey",
        tiebreak=[F.col("price").desc(), F.col("lineid").asc()],
        direction="forward",
    )
    return j.select(
        F.col("o_orderkey").alias("anchor_orderkey"),
        F.date_format("ts", "yyyy-MM-dd").alias("ship_date"),
        "price",
    )


@register(
    "cdc_latest_state",
    oracle="""
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
def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins CDC compaction: events as a change log keyed by
    (user_id, event_type), current version = max (ts, event_id). The
    Spark plan is ONE partial-aggregated max_by (operators/cdc.py — the
    shuffle carries one candidate per key per partition); the oracle is
    the independent row_number window formulation."""
    from ..operators.cdc import latest_by_key

    t = Tables(spark, sf_dir)
    ev = t.events.withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    return latest_by_key(
        ev,
        keys=["user_id", "event_type"],
        order_by=["ts", "event_id"],
        payload=["event_id", "ts_us", "value"],
    )


@register(
    "cdc_snapshot_diff",
    oracle="""
WITH old AS (
    SELECT event_id, value FROM events
), new AS (
    SELECT event_id, round(CASE WHEN event_id % 7 = 0 THEN value * 2
                                ELSE value END, 2) AS value
    FROM events WHERE event_id % 11 <> 0
    UNION ALL
    SELECT event_id + 10000000 AS event_id, value
    FROM events WHERE event_id % 13 = 0
)
SELECT coalesce(old.event_id, new.event_id) AS event_id,
       CASE WHEN old.event_id IS NULL THEN 'added'
            WHEN new.event_id IS NULL THEN 'removed'
            WHEN old.value IS DISTINCT FROM new.value THEN 'changed'
            ELSE 'unchanged' END AS status,
       old.value AS value_old,
       new.value AS value_new
FROM old FULL OUTER JOIN new ON old.event_id = new.event_id
WHERE CASE WHEN old.event_id IS NULL THEN 'added'
           WHEN new.event_id IS NULL THEN 'removed'
           WHEN old.value IS DISTINCT FROM new.value THEN 'changed'
           ELSE 'unchanged' END <> 'unchanged'
""",
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between a derived 'yesterday' and 'today' of the
    events table (deterministic edits: every 11th row removed, every
    7th value doubled, every 13th re-ingested under a shifted id) —
    row-level added/removed/changed via operators/cdc.py::snapshot_diff
    (one co-partitioned full-outer join, classification map-side)."""
    from ..operators.cdc import snapshot_diff

    t = Tables(spark, sf_dir)
    old = t.events.select("event_id", "value")
    new = (
        t.events.filter(F.col("event_id") % 11 != 0)
        .select(
            "event_id",
            F.round(
                F.when(
                    F.col("event_id") % 7 == 0, F.col("value") * 2
                ).otherwise(F.col("value")),
                2,
            ).alias("value"),
        )
        .unionByName(
            t.events.filter(F.col("event_id") % 13 == 0).select(
                (F.col("event_id") + 10_000_000).alias("event_id"), "value"
            )
        )
    )
    return snapshot_diff(old, new, ["event_id"], compare=["value"])


@register(
    "cdc_scd2_history",
    oracle="""
WITH log AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id,
           CAST(abs(floor(value)) AS BIGINT) % 3 AS band
    FROM events
), flagged AS (
    SELECT user_id, ts_us, event_id, band,
           (row_number() OVER w = 1
            OR band IS DISTINCT FROM lag(band) OVER w) AS chg
    FROM log
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), pts AS (
    SELECT user_id, ts_us, event_id, band FROM flagged WHERE chg
)
SELECT user_id, band,
       ts_us AS valid_from,
       lead(ts_us) OVER w2 AS valid_to,
       CAST(lead(ts_us) OVER w2 IS NULL AS INT) AS is_current
FROM pts
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
""",
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension history (VERDICT r6 #1): events as a per-user
    change log whose tracked attribute is a derived value band
    (abs(floor(value)) % 3 — coarse enough that consecutive rows
    genuinely restate values, so interval collapse has real work);
    one validity interval per run of unchanged band. The oracle is the
    independent row_number/lag/lead SQL formulation; timestamps travel
    as epoch micros so the hash is engine-stable. The Spark plan is one
    hash exchange + one sort serving BOTH windows (lag change-point
    filter and lead interval close share the partition/order spec —
    plan-asserted in tests/test_plan_budgets.py)."""
    from ..operators.cdc import scd2_history

    t = Tables(spark, sf_dir)
    log = t.events.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
        (F.abs(F.floor("value")) % 3).cast("bigint").alias("band"),
    )
    return scd2_history(
        log,
        keys=["user_id"],
        ts_col="ts_us",
        track=["band"],
        tiebreak=["event_id"],
    )


# ---------------------------------------------------------------------------
# Bloom-pruned shuffle join — the explicit skew/scale-toolkit primitive
# for the dim-too-big-to-broadcast, key-set-fits-a-bitset regime.
# ---------------------------------------------------------------------------

@register(
    "j_bloom_pruned",
    shadow_oracle="""
SELECT l_returnflag,
       count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_totalprice > 400000
GROUP BY l_returnflag
""",
)
def j_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned fact⋈dim join (``operators/skew.py::
    bloom_pruned_join``): the filtered orders key set rides to every
    lineitem task as a 128 KiB bitset literal, non-matching lineitem
    rows die MAP-SIDE, and only plausible matches enter the join's
    shuffle; the exact join then culls the bloom's false positives, so
    the result — and the oracle — is the plain inner join. At 100 TB
    the probe-side shuffle write is the job cost; the prune converts
    dim selectivity into shuffle-volume savings without relying on the
    optimizer's runtime bloom pushdown seeing through the dim's
    lineage."""
    from ..operators.skew import bloom_pruned_join

    t = Tables(spark, sf_dir)
    dim = t.orders.filter(F.col("o_totalprice") > 400000).select("o_orderkey")
    joined = bloom_pruned_join(
        t.lineitem, dim, "l_orderkey", "o_orderkey", m_bits=1 << 20
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum(rev), 4).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery (TPC-H Q17 shape) — the decorrelation
# surface: Catalyst rewrites the per-row subquery into an aggregate +
# join; DuckDB runs the same SQL with its own decorrelator.
# ---------------------------------------------------------------------------

@register(
    "j_correlated_subquery",
    shadow_oracle="""
SELECT round(sum(l.l_extendedprice) / 7.0, 4) AS avg_yearly,
       count(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < (
      SELECT 0.2 * avg(l2.l_quantity)
      FROM lineitem l2
      WHERE l2.l_partkey = p.p_partkey
  )
""",
)
def j_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-order-quantity revenue (TPC-H Q17 shape): line items below
    20% of their part's average quantity. Declared as a CORRELATED
    scalar subquery — the point is that Catalyst's decorrelation
    (RewriteCorrelatedScalarSubquery) turns the per-row subquery into
    one partial-aggregated per-partkey average joined back to the
    filtered fact rows, i.e. exactly the plan one would hand-write,
    with no per-row re-scan anywhere. At 100 TB both sides of that
    join partition on partkey; the brand filter prunes the probe side
    before the shuffle. Passed as DataFrame args to spark.sql — no
    temp-view registration, lineage stays visible to the optimizer."""
    t = Tables(spark, sf_dir)
    return spark.sql(
        """
SELECT round(sum(l.l_extendedprice) / 7.0, 4) AS avg_yearly,
       count(*) AS n_items
FROM {lineitem} l
JOIN {part} p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < (
      SELECT 0.2 * avg(l2.l_quantity)
      FROM {lineitem} l2
      WHERE l2.l_partkey = p.p_partkey
  )
""",
        lineitem=t.lineitem,
        part=t.part,
    )


# -- CDC: MERGE INTO (upsert + tombstone apply) onto a snapshot -------------

@register(
    "cdc_merge_upsert",
    shadow_oracle="""
WITH src AS (
    SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value
    FROM events
), base AS (
    SELECT user_id, event_type, event_id, ts_us, value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts_us DESC, event_id DESC)
                        AS rn
          FROM src WHERE event_id % 3 <> 0)
    WHERE rn = 1
), changes AS (
    SELECT user_id, event_type, event_id, ts_us, value,
           (event_id % 9 = 0) AS is_delete
    FROM src WHERE event_id % 3 = 0
), unioned AS (
    SELECT user_id, event_type, event_id, ts_us, value,
           0 AS pri, CAST(NULL AS BIGINT) AS o_ts,
           CAST(NULL AS BIGINT) AS o_id, FALSE AS del
    FROM base
    UNION ALL
    SELECT user_id, event_type, event_id, ts_us, value,
           1 AS pri, ts_us AS o_ts, event_id AS o_id, is_delete AS del
    FROM changes
), win AS (
    SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                 ORDER BY pri DESC, o_ts DESC, o_id DESC)
                   AS rn2
    FROM unioned
)
SELECT user_id, event_type, event_id, ts_us, value
FROM win WHERE rn2 = 1 AND NOT del
""",
)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta/Iceberg-style MERGE INTO applied as a batch operator:
    a derived 'yesterday' snapshot (latest state of the event_id%3<>0
    log) receives a change batch (the event_id%3=0 rows; every 9th a
    tombstone) — matched keys update to the newest change, unmatched
    keys insert, tombstoned keys delete. Exercises
    operators/cdc.py::merge_upsert, whose plan is ONE shuffle of
    (base UNION changes) through the same partial-aggregated max_by as
    latest_by_key — deliberately NOT the full-outer-join MERGE
    formulation, which shuffles both sides and cannot partially
    aggregate; at 100 TB the snapshot side re-read from a
    key-hash-partitioned table makes even that single shuffle a no-op
    on the base. The oracle is the independent priority-union +
    row_number SQL formulation (base rows rank below every change row;
    NULL order fields never decide because pri breaks the tie first)."""
    from ..operators.cdc import latest_by_key, merge_upsert

    t = Tables(spark, sf_dir)
    src = t.events.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "value",
    )
    base = latest_by_key(
        src.filter(F.col("event_id") % 3 != 0),
        keys=["user_id", "event_type"],
        order_by=["ts_us", "event_id"],
        payload=["event_id", "ts_us", "value"],
        n_versions_col=None,
    )
    changes = src.filter(F.col("event_id") % 3 == 0).withColumn(
        "is_delete", F.col("event_id") % 9 == 0
    )
    return merge_upsert(
        base,
        changes,
        keys=["user_id", "event_type"],
        order_by=["ts_us", "event_id"],
        delete_col="is_delete",
    )


@register("s_warc_ingest")  # rows-only: HTML text extraction, not SQL
def s_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingestion end-to-end (round 11, io/warc.py): the documents
    table is wrapped into CommonCrawl-shaped .warc.gz payloads (one
    gzip member per record, full HTTP response framing, HTML bodies
    with title/style/script chrome) entirely in-task, then parsed BACK
    through the real ingestion path — record grammar, HTTP splitting,
    charset resolve, stdlib-HTML-parser text extraction. One row per
    source document; the script/style chrome must NOT leak into the
    extracted text (pinned in tests/test_warc.py). Scale shape: pure
    map both directions (mapInPandas, zero shuffle) — production swaps
    the synthetic blobs for spark.read.format("binaryFile") over the
    crawl shards with the same downstream plumbing."""
    import html as _html

    import pandas as pd

    from ..io import warc as _warc

    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "text", "lang").filter(
        F.col("doc_id") < 200
    )

    def synth(batches):
        for pdf in batches:
            paths, blobs = [], []
            for bucket, grp in pdf.groupby(pdf["doc_id"] // 20):
                recs = [
                    {
                        "uri": f"http://corpus.example/{int(r.doc_id)}",
                        "record_id": f"doc-{int(r.doc_id)}",
                        # every 7th capture uses chunked framing (round
                        # 12): extraction output must be identical
                        "chunked": int(r.doc_id) % 7 == 0,
                        "html": (
                            "<html><head><title>t</title>"
                            "<style>b{color:red}</style></head>"
                            f"<body><h1>{r.lang}</h1>"
                            f"<p>{_html.escape(r.text)}</p>"
                            "<script>var leak = 1;</script>"
                            "</body></html>"
                        ),
                    }
                    for r in grp.itertuples()
                ]
                paths.append(f"synthetic://warc/{int(bucket)}.warc.gz")
                blobs.append(_warc.encode_warc(recs))
            yield pd.DataFrame({"path": paths, "content": blobs})

    binary = docs.mapInPandas(synth, schema="path string, content binary")
    out = _warc.warc_to_documents(binary)
    return out.select(
        F.regexp_extract("url", r"/(\d+)$", 1).cast("long").alias("doc_id"),
        "url",
        "http_status",
        "content_type",
        "n_bytes",
        F.length("text").alias("n_text_chars"),
        F.substring("text", 1, 80).alias("text_head"),
    ).orderBy("doc_id")


@register("s_pdf_ingest")  # rows-only: PDF content-stream extraction
def s_pdf_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF ingestion end-to-end (round 11, io/pdftext.py): documents
    are wrapped into REAL single-page FlateDecode PDFs in-task
    (paragraph per sentence-ish chunk, escape-worthy characters
    included by the corpus itself) and parsed BACK through the
    extraction path — stream framing, zlib inflate, BT/ET text
    operators, literal-string escapes, line moves. Every 5th document
    is instead written as a composite-font (Type0/Identity-H) PDF with
    an embedded ToUnicode CMap — the books/papers-corpus shape — whose
    2-byte CID hex strings must decode to the SAME text as the
    simple-font form (round 12, VERDICT r11 #6). One row per source
    document; same zero-shuffle mapInPandas posture as s_warc_ingest
    (production reads crawl/paper shards via
    spark.read.format("binaryFile") into the same plumbing)."""
    import pandas as pd

    from ..io import pdftext as _pdf

    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "text").filter(
        F.col("doc_id") < 150
    )

    def synth(batches):
        for pdf in batches:
            paths, blobs = [], []
            for r in pdf.itertuples():
                words = str(r.text).split()
                paras = [
                    " ".join(words[i : i + 12])
                    for i in range(0, len(words), 12)
                ] or [""]
                paths.append(f"synthetic://pdf/{int(r.doc_id)}.pdf")
                enc = (
                    _pdf.encode_pdf_cid
                    if int(r.doc_id) % 5 == 0
                    else _pdf.encode_pdf
                )
                blobs.append(enc(paras[:40]))
            yield pd.DataFrame({"path": paths, "content": blobs})

    binary = docs.mapInPandas(synth, schema="path string, content binary")
    out = _pdf.pdf_to_documents(binary)
    return out.select(
        F.regexp_extract("path", r"/(\d+)\.pdf$", 1).cast("long").alias(
            "doc_id"
        ),
        "n_streams",
        "n_text_ops",
        "skipped_cid",
        F.length("text").alias("n_text_chars"),
        F.substring("text", 1, 60).alias("text_head"),
    ).orderBy("doc_id")


@register("s_wiki_ingest")  # rows-only: wikitext extraction, not SQL
def s_wiki_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wikipedia multistream ingestion end-to-end (round 12,
    io/wikidump.py): documents are wrapped into REAL
    pages-articles-multistream.xml.bz2 layouts in-task (MediaWiki XML,
    one bz2 stream per few pages, wikitext chrome — infobox template,
    heading, wiki links, a ref, a table — around the corpus text) and
    parsed BACK through the ingestion path: bz2 stream walk, page
    grammar, bounded wikitext cleaner. Interleaved redirect and
    Talk-namespace pages must drop. One row per article; zero-shuffle
    mapInPandas both directions (production reads the dump via
    binaryFile or the published multistream index into the same
    plumbing — see wiki_to_documents_indexed)."""
    import pandas as pd

    from ..io import wikidump as _wd

    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "text", "lang").filter(
        F.col("doc_id") < 180
    )

    def synth(batches):
        for pdf in batches:
            paths, blobs = [], []
            for bucket, grp in pdf.groupby(pdf["doc_id"] // 30):
                pages = []
                for r in grp.itertuples():
                    did = int(r.doc_id)
                    pages.append({
                        "title": f"Doc {did}",
                        "page_id": did,
                        "wikitext": (
                            f"{{{{Infobox corpus|lang={r.lang}|id={did}}}}}\n"
                            f"== Doc {did} ==\n"
                            f"'''Lead''' sentence with a [[wiki link|link]].\n"
                            f"{r.text}<ref>corpus</ref>\n"
                            "{| class=\"wikitable\"\n| a || b\n|}\n"
                        ),
                    })
                    # chrome pages that must be filtered out
                    pages.append({
                        "title": f"Redirect {did}", "page_id": did + 100000,
                        "redirect": True,
                        "wikitext": f"#REDIRECT [[Doc {did}]]",
                    })
                    pages.append({
                        "title": f"Talk:Doc {did}", "page_id": did + 200000,
                        "ns": 1, "wikitext": "chatter",
                    })
                blob, _index = _wd.encode_wikidump(pages, pages_per_stream=4)
                paths.append(f"synthetic://wiki/{int(bucket)}.xml.bz2")
                blobs.append(blob)
            yield pd.DataFrame({"path": paths, "content": blobs})

    binary = docs.mapInPandas(synth, schema="path string, content binary")
    out = _wd.wiki_to_documents(binary)
    return out.select(
        F.col("page_id").alias("doc_id"),
        "title",
        "n_wikitext_chars",
        "n_text_chars",
        F.substring("text", 1, 80).alias("text_head"),
    ).orderBy("doc_id")


@register("s_wds_ingest")  # rows-only: tar-shard round trip, not SQL
def s_wds_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset tar-shard ingestion end-to-end (round 12,
    io/webdataset.py): documents are packed into REAL WebDataset tar
    shards — one sample per doc with ``txt`` (the text), ``json``
    (lang/source metadata) and ``cls`` (a label byte) members, 25
    samples per shard — then parsed BACK through the ingestion path:
    tar member walk, first-dot key/field split, consecutive-key sample
    grouping. One row per sample; the json field is decoded with
    from_json and must round-trip the metadata exactly (pinned in
    tests/test_webdataset.py). Scale shape: the write side is one
    skew-free shuffle on count-based shard ids + in-task tar build;
    the read side is a zero-shuffle map (production reads shard files
    via spark.read.format("binaryFile") into the same plumbing)."""
    from ..io import webdataset as _wds

    t = Tables(spark, sf_dir)
    docs = t.documents.select(
        "doc_id", "text", "lang", "source"
    ).filter(F.col("doc_id") < 200)

    shards = _wds.pack_samples_to_shards(
        docs.select(
            F.format_string("%06d", F.col("doc_id")).alias("key"),
            "doc_id",
            F.col("text").alias("txt"),
            F.to_json(F.struct("lang", "source")).alias("json"),
            (F.col("doc_id") % 5).cast("string").alias("cls"),
        ),
        key_col="key",
        fields={"txt": "txt", "json": "json", "cls": "cls"},
        samples_per_shard=25,
        order_col="doc_id",
    )
    binary = shards.select(
        F.format_string("synthetic://wds/shard-%06d.tar", "shard_id")
        .alias("path"),
        "content",
    )
    samples = _wds.tar_shards_to_samples(binary)
    meta = F.from_json(
        F.col("fields").getItem("json").cast("string"),
        "lang string, source string",
    )
    return samples.select(
        F.col("key"),
        "n_fields",
        "n_bytes",
        F.length(F.col("fields").getItem("txt").cast("string")).alias(
            "n_text_chars"
        ),
        meta.getField("lang").alias("lang"),
        meta.getField("source").alias("source"),
        F.col("fields").getItem("cls").cast("string").alias("label"),
    ).orderBy("key")
