"""Window-function plans (beyond-reference completeness; SURVEY §2.8 notes
the reference has none — these are the standard analytics surface a user of
the star schema expects).

Scale notes: w2/w3 window over *pre-aggregated* day/month grain — the
shuffle-heavy part is a partial+final hash aggregate; the windowed pass then
runs over thousands of rows, not billions, so the unavoidable single
ordering partition for a global running total is cheap at any input scale.
w1 partitions by segment, which parallelizes across the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import Query, SQL_FACT, fact_sales, load


def q_w1_rank_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per market segment by balance (rank / partitioned window)."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey")
    )
    return (
        load(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rank_in_segment"),
        )
        .filter(F.col("rank_in_segment") <= 3)
    )


SQL_W1 = """
SELECT * FROM (
    SELECT c_mktsegment, c_custkey, c_acctbal,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rank_in_segment
    FROM customer
) WHERE rank_in_segment <= 3
"""


def q_w2_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative daily sales (running total over date grain).

    Decimal window sum → exact regardless of evaluation order → DOUBLE.
    """
    daily = (
        fact_sales(spark, sf_dir)
        .groupBy("date_id")
        .agg(F.sum("price").alias("ts_dec"))
    )
    w = Window.orderBy("date_id").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "date_id",
        F.col("ts_dec").cast("double").alias("total_sales"),
        F.sum("ts_dec").over(w).cast("double").alias("cumulative_sales"),
    )


SQL_W2 = f"""
WITH {SQL_FACT.strip()},
daily AS (SELECT date_id, SUM(price) AS ts_dec FROM fact GROUP BY date_id)
SELECT date_id,
       CAST(ts_dec AS DOUBLE) AS total_sales,
       CAST(SUM(ts_dec) OVER (ORDER BY date_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS cumulative_sales
FROM daily
"""


def q_w3_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month sales delta (lag window)."""
    monthly = (
        fact_sales(spark, sf_dir)
        .groupBy(
            F.year("o_orderdate").alias("year"), F.month("o_orderdate").alias("month")
        )
        .agg(F.sum("price").alias("ts_dec"))
    )
    w = Window.orderBy("year", "month")
    return monthly.select(
        "year",
        "month",
        F.col("ts_dec").cast("double").alias("total_sales"),
        (F.col("ts_dec") - F.lag("ts_dec").over(w)).cast("double").alias("mom_delta"),
    )


SQL_W3 = f"""
WITH {SQL_FACT.strip()},
monthly AS (
    SELECT CAST(year(o_orderdate) AS INT) AS year,
           CAST(month(o_orderdate) AS INT) AS month,
           SUM(price) AS ts_dec
    FROM fact GROUP BY 1, 2
)
SELECT year, month,
       CAST(ts_dec AS DOUBLE) AS total_sales,
       CAST(ts_dec - LAG(ts_dec) OVER (ORDER BY year, month) AS DOUBLE)
           AS mom_delta
FROM monthly
"""


QUERIES: list[Query] = [
    Query("w1_rank_per_group", q_w1_rank_per_group, SQL_W1, "row_number per partition"),
    Query("w2_running_total", q_w2_running_total, SQL_W2, "cumulative window sum"),
    Query("w3_lag_delta", q_w3_lag_delta, SQL_W3, "lag / month-over-month delta"),
]
