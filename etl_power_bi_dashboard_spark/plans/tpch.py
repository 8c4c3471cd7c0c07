"""TPC-H-shaped flagship queries adapted to the driver schema — the
classic analytics shapes (pricing summary, shipping-priority top-k,
local-supplier volume) that exercise multi-way star joins, selective
filters with pushdown, and wide aggregations. Plus the JSON event-props
extraction the `events.props` column invites.

All money math follows the base.py exactness convention (DECIMAL sums →
DOUBLE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import Query, lineitem_revenue, load, load_events


def q_h1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: pricing summary report over shipped lineitems."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    # narrow decimals keep every product well under precision 38 on both
    # engines (overflow-cap rules differ between Spark and DuckDB)
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(6,4)")
    tax = F.col("l_tax").cast("decimal(6,4)")
    disc_price = price * (F.lit(1).cast("decimal(6,4)") - disc)
    # round the scale-10 product to scale 6 BEFORE summing: a scale-10
    # decimal sum exceeds 2^53 when scaled to int, and DuckDB's
    # decimal→double cast double-rounds there (1-ulp divergence)
    charge = F.round(disc_price * (F.lit(1).cast("decimal(6,4)") + tax), 6)
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        F.count("*").alias("count_order"),
    )
    return agg.select(
        "*",
        (F.col("sum_qty") / F.col("count_order")).alias("avg_qty"),
        (F.col("sum_base_price") / F.col("count_order")).alias("avg_price"),
    )


SQL_H1 = """
WITH t AS (
    SELECT l_returnflag, l_linestatus,
           CAST(l_quantity AS DECIMAL(12,2)) AS qty,
           CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
           CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))
               AS disc_price,
           ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))
               * (CAST(1 AS DECIMAL(6,4)) + CAST(l_tax AS DECIMAL(6,4))), 6)
               AS charge
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
)
SELECT l_returnflag, l_linestatus,
       CAST(SUM(qty) AS DOUBLE) AS sum_qty,
       CAST(SUM(price) AS DOUBLE) AS sum_base_price,
       CAST(SUM(disc_price) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(charge) AS DOUBLE) AS sum_charge,
       COUNT(*) AS count_order,
       CAST(SUM(qty) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(price) AS DOUBLE) / COUNT(*) AS avg_price
FROM t
GROUP BY l_returnflag, l_linestatus
"""


def q_h3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 open orders by revenue for one segment."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")
    )
    revenue = lineitem_revenue()
    joined = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"], "inner"
    ).join(cust, orders["o_custkey"] == cust["c_custkey"], "inner")
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(revenue).cast("double").alias("revenue")
    )
    return agg.orderBy(F.desc("revenue"), "l_orderkey").limit(10)


SQL_H3 = """
SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
            * (CAST(1 AS DECIMAL(6,4)) - CAST(l.l_discount AS DECIMAL(6,4))))
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1999-01-01'
  AND l.l_shipdate > TIMESTAMP '1999-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


def q_h5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by customer nation within one region,
    where the supplier is from the same nation (6-table star join),
    restricted to one order year (1996) — the canonical query's
    selective fact-side window, kept so the plan actually exercises
    date-filter pushdown into the orders scan. Only the fixed-size
    nation/region dims carry broadcast hints; customer and supplier
    scale with SF, so their join strategy is AQE's call (a hard
    broadcast hint on an SF-scaled table OOMs the driver at the very
    scale these shapes are written for)."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
            & (F.to_date("o_orderdate") < F.lit("1997-01-01"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    revenue = lineitem_revenue()
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            supp,
            (li["l_suppkey"] == supp["s_suppkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return joined.groupBy("n_name").agg(F.sum(revenue).cast("double").alias("revenue"))


SQL_H5 = """
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
            * (CAST(1 AS DECIMAL(6,4)) - CAST(l.l_discount AS DECIMAL(6,4))))
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
GROUP BY n.n_name
"""


def q_e4_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props column (semi-structured
    surface: get_json_object stays JVM-side in codegen)."""
    ev = load_events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


SQL_E4 = """
SELECT event_id, CAST(props->>'$.k' AS INT) AS k FROM events
"""


QUERIES: list[Query] = [
    Query("h1_pricing_summary", q_h1_pricing_summary, SQL_H1, "TPC-H Q1 shape"),
    Query("h3_shipping_priority", q_h3_shipping_priority, SQL_H3, "TPC-H Q3 shape"),
    Query("h5_region_volume", q_h5_region_volume, SQL_H5, "TPC-H Q5 shape"),
    Query("e4_props_json", q_e4_props_json, SQL_E4, "JSON props extraction"),
]
