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
    oracle="""
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


# -- F8–F11: string functions (suffix match, strip, canonicalize, cast) -----

@register(
    "f_string_funcs",
    oracle="""
SELECT c_custkey,
       upper(c_name) AS name_upper,
       length(c_name) AS name_len,
       trim(c_mktsegment) AS seg_trim,
       substr(c_name, 1, 8) AS name_head,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
       regexp_replace(lpad(CAST(c_custkey AS VARCHAR), 8, '0'), '^0+', '') AS key_canon,
       CAST(ends_with(CAST(c_custkey AS VARCHAR), '7') AS INT) AS ends_in_7,
       concat(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS seg_nation
FROM customer
WHERE c_custkey % 11 = 0
""",
)
def f_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    key_str = F.col("c_custkey").cast("string")
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
    )


# -- F12–F17: math / cast / clamp functions ---------------------------------

@register(
    "f_math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(sqrt(l_extendedprice), 6) AS price_sqrt,
       abs(l_discount - 0.05) AS disc_dev,
       greatest(l_extendedprice, 50000.0) AS price_floor50k,
       least(l_tax, 0.04) AS tax_cap,
       floor(l_extendedprice) AS price_floor,
       ceil(l_extendedprice) AS price_ceil,
       CAST(floor(l_quantity) AS BIGINT) AS qty_int,
       round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS net_price,
       round(abs(l_extendedprice - 30000.0) / 30000.0, 6) AS pct_err
FROM lineitem
WHERE l_orderkey % 101 = 0
""",
)
def f_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    p = F.col("l_extendedprice")
    return t.lineitem.filter(F.col("l_orderkey") % 101 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt(p), 6).alias("price_sqrt"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.greatest(p, F.lit(50000.0)).alias("price_floor50k"),
        F.least(F.col("l_tax"), F.lit(0.04)).alias("tax_cap"),
        F.floor(p).cast("double").alias("price_floor"),
        F.ceil(p).cast("double").alias("price_ceil"),
        # DuckDB CAST(double AS INT) rounds; Spark truncates -> make the
        # truncation explicit with floor on both sides (F12 parity note).
        F.floor(F.col("l_quantity")).cast("bigint").alias("qty_int"),
        F.round(p * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 6).alias("net_price"),
        F.round(F.abs(p - 30000.0) / 30000.0, 6).alias("pct_err"),
    )
