"""Multi-dimensional aggregation plans: ROLLUP, CUBE, GROUPING SETS, PIVOT
— the OLAP surface a BI layer over the star schema expects (the reference
delegates these slices to Power BI; here they're native, SURVEY §2.10).

All four compile to a single Expand + hash-aggregate pass in Spark — no
extra scans per grouping combination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import Query, SQL_FACT, fact_sales, load, sql_dsum


def q_g1_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (year, quarter): per-quarter, per-year, and grand totals."""
    fact = fact_sales(spark, sf_dir).select(
        F.year("o_orderdate").alias("year"),
        F.quarter("o_orderdate").alias("quarter"),
        "l_orderkey",
        "price",
    )
    return (
        fact.rollup("year", "quarter")
        .agg(
            F.countDistinct("l_orderkey").alias("order_count"),
            F.sum("price").cast("double").alias("total_sales"),
        )
    )


SQL_G1 = f"""
WITH {SQL_FACT.strip()}
SELECT CAST(year(o_orderdate) AS INT)    AS year,
       CAST(quarter(o_orderdate) AS INT) AS quarter,
       COUNT(DISTINCT l_orderkey)        AS order_count,
       {sql_dsum("price", "total_sales")}
FROM fact
GROUP BY ROLLUP (year(o_orderdate), quarter(o_orderdate))
"""


def q_g2_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (status, priority): all 4 grouping combinations in one pass."""
    orders = load(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("cnt")
    )


SQL_G2 = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_g3_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((status), (priority), ()) via Spark SQL."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("gs_orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        FROM gs_orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


SQL_G3 = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q_pv1_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts by priority × status (explicit value list for a
    deterministic schema; absent combinations stay NULL)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )


SQL_PV1 = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS "F",
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS "O",
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS "P"
FROM orders
GROUP BY o_orderpriority
"""


QUERIES: list[Query] = [
    Query("g1_rollup", q_g1_rollup, SQL_G1, "ROLLUP totals"),
    Query("g2_cube", q_g2_cube, SQL_G2, "CUBE combinations"),
    Query("g3_grouping_sets", q_g3_grouping_sets, SQL_G3, "explicit GROUPING SETS"),
    Query("pv1_pivot", q_pv1_pivot, SQL_PV1, "pivot wide table"),
]
