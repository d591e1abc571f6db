"""Spark SQL surface: the same engine capabilities driven through
``spark.sql`` over registered views (charter posture: Spark SQL over
tables + MLlib). The flagship query expressed as SQL must agree exactly
with its DataFrame form."""

from pyspark.sql import functions as F

from hive_population_ml_spark.io import register_views
from hive_population_ml_spark.queries import QUERIES, load_all

load_all()

FLAGSHIP_SPARK_SQL = """
WITH fact AS (
    SELECT o.o_custkey AS custkey,
           l.l_shipdate AS ts,
           l.l_extendedprice AS price
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT d.o_orderkey AS anchor_orderkey,
       d.o_custkey  AS custkey,
       date_format(d.o_orderdate, 'yyyy-MM-dd') AS anchor_date,
       count(f.price)                 AS price_n,
       round(avg(f.price), 6)         AS price_avg,
       round(stddev_samp(f.price), 6) AS price_std,
       min(f.price)                   AS price_min,
       max(f.price)                   AS price_max,
       max(f.price) - min(f.price)    AS price_range,
       round(count(f.price) / 14.0D, 6) AS coverage,
       CASE WHEN max(f.price) >= 50000 THEN 1 ELSE 0 END AS high_value
FROM orders d
JOIN fact f
  ON f.custkey = d.o_custkey
 AND f.ts BETWEEN d.o_orderdate - INTERVAL '7' DAY
              AND d.o_orderdate + INTERVAL '7' DAY
GROUP BY 1, 2, 3
HAVING count(f.price) >= 3
"""


def _canon(df):
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(9)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def test_flagship_sql_equals_dataframe(spark, sf_dir):
    register_views(spark, sf_dir)
    sql_df = spark.sql(FLAGSHIP_SPARK_SQL)
    api_df = QUERIES["flagship_interval_stats"](spark, sf_dir)
    import pandas as pd

    pd.testing.assert_frame_equal(
        _canon(sql_df), _canon(api_df), check_dtype=False
    )


def test_views_cover_all_tables(spark, sf_dir):
    register_views(spark, sf_dir)
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        assert spark.sql(f"SELECT count(*) FROM {t}").first()[0] > 0
