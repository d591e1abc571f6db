"""Scalar-function layer queries — SURVEY.md §2.7 (F1–F20).

Thin wrappers over builtins; the queries exist so every scalar the
reference uses is oracle-checked against DuckDB's implementation
(semantics differences — e.g. double->int casts ROUND in DuckDB but
TRUNCATE in Spark — are worked around with explicit floor/round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import Tables
from .registry import register

# -- F1/F3/F4/F5/F19: datetime parts, interval arithmetic, formatting -------

@register(
    "f_datetime_parts",
    shadow_oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mon,
       day(o_orderdate) AS dom,
       quarter(o_orderdate) AS qtr,
       weekofyear(o_orderdate) AS iso_week,
       strftime(o_orderdate, '%Y-%m') AS ym,
       strftime(o_orderdate + INTERVAL 3 DAY, '%Y-%m-%d') AS plus3d,
       datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch0
FROM orders
WHERE o_orderkey % 97 = 0
""",
)
def f_datetime_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    d = F.col("o_orderdate")
    return t.orders.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mon"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("qtr"),
        F.weekofyear(d).alias("iso_week"),
        F.date_format(d, "yyyy-MM").alias("ym"),
        F.date_format(d + F.expr("INTERVAL '3' DAY"), "yyyy-MM-dd").alias("plus3d"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp_ntz")).alias(
            "days_since_epoch0"
        ),
    )


# -- F8–F18: string + math/cast functions (one sweep; merged so the
# oracle-backed surface fits the driver's 50-entry correctness window) ------

@register(
    "f_scalar_funcs",
    oracle="""
SELECT c_custkey,
       upper(c_name) AS name_upper,
       length(c_name) AS name_len,
       trim(c_mktsegment) AS seg_trim,
       substr(c_name, 1, 8) AS name_head,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
       regexp_replace(lpad(CAST(c_custkey AS VARCHAR), 8, '0'), '^0+', '') AS key_canon,
       CAST(ends_with(CAST(c_custkey AS VARCHAR), '7') AS INT) AS ends_in_7,
       concat(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS seg_nation,
       round(sqrt(abs(c_acctbal)), 6) AS bal_sqrt,
       abs(c_acctbal - 1000.0) AS bal_dev,
       greatest(c_acctbal, 0.0) AS bal_floor0,
       least(c_acctbal, 5000.0) AS bal_cap,
       floor(c_acctbal) AS bal_floor,
       ceil(c_acctbal) AS bal_ceil,
       CAST(floor(abs(c_acctbal)) AS BIGINT) AS bal_int,
       round(c_acctbal * (1 - 0.05) * (1 + 0.04), 6) AS bal_net,
       round(abs(c_acctbal - 3000.0) / 3000.0, 6) AS pct_err
FROM customer
WHERE c_custkey % 11 = 0
""",
)
def f_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    key_str = F.col("c_custkey").cast("string")
    b = F.col("c_acctbal")
    return t.customer.filter(F.col("c_custkey") % 11 == 0).select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.trim(F.col("c_mktsegment")).alias("seg_trim"),
        F.substring("c_name", 1, 8).alias("name_head"),
        F.lpad(key_str, 8, "0").alias("key_padded"),
        F.regexp_replace(F.lpad(key_str, 8, "0"), "^0+", "").alias("key_canon"),
        key_str.endswith("7").cast("int").alias("ends_in_7"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
        F.round(F.sqrt(F.abs(b)), 6).alias("bal_sqrt"),
        F.abs(b - 1000.0).alias("bal_dev"),
        F.greatest(b, F.lit(0.0)).alias("bal_floor0"),
        F.least(b, F.lit(5000.0)).alias("bal_cap"),
        F.floor(b).cast("double").alias("bal_floor"),
        F.ceil(b).cast("double").alias("bal_ceil"),
        # DuckDB CAST(double AS INT) rounds; Spark truncates -> make the
        # truncation explicit with floor on both sides (F12 parity note).
        F.floor(F.abs(b)).cast("bigint").alias("bal_int"),
        F.round(b * (1 - 0.05) * (1 + 0.04), 6).alias("bal_net"),
        F.round(F.abs(b - 3000.0) / 3000.0, 6).alias("pct_err"),
    )


@register(
    "f_array_funcs",
    shadow_oracle="""
WITH t AS (
    SELECT doc_id,
           list_slice(string_split(text, ' '), 1, 6) AS a,
           list_slice(string_split(text, ' '), 4, 9) AS b
    FROM documents WHERE doc_id < 50
)
SELECT doc_id,
       len(a) AS n_a,
       array_to_string(list_sort(list_distinct(list_concat(a, b))), ' ') AS u,
       array_to_string(list_sort(list_distinct(list_intersect(a, b))), ' ')
           AS i,
       array_to_string(
           list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))),
           ' ') AS d,
       list_contains(a, 'the') AS has_the,
       coalesce(list_position(a, 'the'), 0) AS pos_the,
       array_to_string(list_reverse(a), ' ') AS rev_a,
       list_sort(a)[1] AS min_tok,
       list_sort(a)[-1] AS max_tok
FROM t
""",
)
def f_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/collection function bundle (union/intersect/except,
    contains/position, reverse, min/max element, slice) — Catalyst
    collection expressions vs DuckDB list functions. Set-valued
    outputs are SORTED on both engines (array_union/intersect/except
    preserve first-occurrence order in Spark but not in DuckDB's list
    composition), then EVERY array-valued output column is serialized
    to a space-joined string: the round driver's canonicalizer
    (pandas ``sort_values``) cannot hash array cells — the only 2 red
    rows in CORRECTNESS_r05.json — so output columns must be scalar.
    The array/lambda expressions under test are unchanged; tokens come
    from a split on ' ' so the join separator cannot collide."""
    t = Tables(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    base = t.documents.filter(F.col("doc_id") < 50).select(
        "doc_id",
        F.slice(toks, 1, 6).alias("a"),
        F.slice(toks, 4, 6).alias("b"),
    )
    return base.select(
        "doc_id",
        F.size("a").alias("n_a"),
        F.array_join(F.array_sort(F.array_union("a", "b")), " ").alias("u"),
        F.array_join(F.array_sort(F.array_intersect("a", "b")), " ").alias("i"),
        F.array_join(F.array_sort(F.array_except("a", "b")), " ").alias("d"),
        F.array_contains("a", "the").alias("has_the"),
        F.coalesce(
            F.array_position("a", "the"), F.lit(0)
        ).alias("pos_the"),
        F.array_join(F.reverse("a"), " ").alias("rev_a"),
        F.array_min("a").alias("min_tok"),
        F.array_max("a").alias("max_tok"),
    )


@register(
    "f_json_funcs",
    shadow_oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
           AS k_sum,
       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max,
       CAST(sum(CASE WHEN json_valid(props) THEN 1 ELSE 0 END) AS BIGINT)
           AS n_valid
FROM events
GROUP BY event_type
""",
)
def f_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON processing over the semi-structured ``events.props``
    column: path extraction (`get_json_object`) + validity — the
    schema-on-read surface. At scale prefer `from_json` with an
    explicit schema ONCE per pipeline over repeated path extraction;
    both stay JVM-side expressions."""
    t = Tables(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    valid = F.when(
        F.try_parse_json(F.col("props")).isNotNull(), 1
    ).otherwise(0)
    return t.events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("k_sum"),
        F.max(k).alias("k_max"),
        F.sum(valid).cast("long").alias("n_valid"),
    )


@register(
    "f_lambda_funcs",
    shadow_oracle="""
WITH t AS (
    SELECT doc_id, list_slice(string_split(text, ' '), 1, 8) AS a
    FROM documents WHERE doc_id < 50
)
SELECT doc_id,
       array_to_string(list_transform(a, x -> upper(x)), ' ') AS up,
       array_to_string(list_filter(a, x -> length(x) > 3), ' ') AS long_toks,
       CAST(list_sum(list_transform(a, x -> length(x))) AS BIGINT)
           AS total_chars,
       len(list_filter(a, x -> x = 'the')) > 0 AS has_the,
       CAST(len(list_filter(a, x -> length(x) <= 3)) = len(a) AS BOOLEAN)
           AS all_short
FROM t
""",
)
def f_lambda_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function bundle (transform / filter / aggregate /
    exists / forall) — the lambda-expression surface mirrored by
    DuckDB's list_* lambdas. Array-valued outputs (`up`, `long_toks`)
    are serialized to space-joined strings — transform/filter preserve
    element order on both engines, and the driver's canonicalizer
    cannot hash array cells (CORRECTNESS_r05 red rows). Reminder from
    PERFORMANCE fix 10c: HOFs are CodegenFallback (interpreted per
    element) — fine for bounded arrays like these 8-token slices,
    moved off the hot path (plain expression arrays, explodes)
    everywhere volume lives."""
    t = Tables(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    base = t.documents.filter(F.col("doc_id") < 50).select(
        "doc_id", F.slice(toks, 1, 8).alias("a")
    )
    return base.select(
        "doc_id",
        F.array_join(F.transform("a", lambda x: F.upper(x)), " ").alias("up"),
        F.array_join(
            F.filter("a", lambda x: F.length(x) > 3), " "
        ).alias("long_toks"),
        F.aggregate(
            "a", F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).alias("total_chars"),
        F.exists("a", lambda x: x == "the").alias("has_the"),
        F.forall("a", lambda x: F.length(x) <= 3).alias("all_short"),
    )
