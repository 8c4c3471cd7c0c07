"""More TPC-H-shaped analytics over the driver schema — the join/subquery
shapes the first flagship batch (tpch.py) didn't cover:

- semi-join / EXISTS (h4), anti-join / NOT EXISTS (h22)
- scalar-subquery predicates (h17 correlated avg, h22 global avg)
- HAVING over a grouped subquery (h18)
- conditional CASE aggregation (h12, h14)
- multi-distinct grouped counts with a NOT-IN exclusion (h16)

The reference (`/root/reference/src/etl_functions.py`) has none of these —
its only set-algebra is the FK check (SURVEY §2.7) — but they are the
canonical OLAP surface any BI layer issues against the exported star
schema, and Catalyst's subquery decorrelation + join-strategy choice is
exactly what a 100 TB deployment leans on. Spark sides are written as
explicit joins (what Catalyst rewrites subqueries into); oracle sides use
the idiomatic SQL subquery forms, proving the two formulations agree.

Exactness: money sums follow base.py (DECIMAL partials → DOUBLE); ratio
and threshold arithmetic is written with identical association on both
engines so IEEE results are bit-equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import SQL_REVENUE, Query, lineitem_revenue, load

# canonical copies live in base.py; keep the old local names for the
# ~10 queries below and the tpch_rest imports
_revenue = lineitem_revenue


def q_h4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority checking via EXISTS semi-join.

    Orders in 1997H1 having at least one lineitem shipped after the order
    date. LEFT SEMI join = EXISTS; at scale this shuffles on o_orderkey
    once and never fans out (semi join emits each order at most once).
    """
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"]),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


SQL_H4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


def q_h6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-scan selective filter + scalar aggregate.

    The whole query is one parquet scan with every predicate pushed down
    (no join, no shuffle beyond the final 1-row reduce) — the cheapest
    possible shape at 100 TB, and a pushdown litmus test.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    gain = F.col("l_extendedprice").cast("decimal(12,2)") * F.col(
        "l_discount"
    ).cast("decimal(6,4)")
    return li.agg(F.sum(gain).cast("double").alias("revenue"))


SQL_H6 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q_h10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue on returns.

    Fact-side filter first (returnflag = 'R'), then shuffle join to
    orders, broadcast joins to customer and nation, TakeOrdered(20).
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
    )
    agg = joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        F.sum(_revenue()).cast("double").alias("revenue")
    )
    return agg.orderBy(F.desc("revenue"), "c_custkey").limit(20)


SQL_H10 = f"""
SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
       CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


def q_h12_priority_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional CASE counts by line status.

    Counts high- vs low-priority LINEITEMS per l_linestatus (canonical
    Q12 counts lines, not orders: an order's every shipped line in the
    window contributes) — map-side
    combinable conditional aggregation (SUM(CASE ...)), one shuffle on a
    low-cardinality key.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    return joined.groupBy("l_linestatus").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


SQL_H12 = """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_linestatus
"""


def q_h14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-revenue percentage (CASE numerator / total).

    Both sums are exact DECIMAL partials; the final percentage divides two
    exact doubles with identical association on both engines.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _revenue()
    zero = F.lit(0).cast("decimal(20,6)")
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
        .cast("double")
        .alias("promo_revenue_sum"),
        F.sum(rev).cast("double").alias("total_revenue_sum"),
    )
    return agg.select(
        (F.lit(100.0) * F.col("promo_revenue_sum") / F.col("total_revenue_sum")).alias(
            "promo_revenue_pct"
        )
    )


SQL_H14 = f"""
WITH t AS (
    SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {SQL_REVENUE}
                         ELSE CAST(0 AS DECIMAL(20,6)) END) AS DOUBLE)
               AS promo_revenue_sum,
           CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS total_revenue_sum
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate < TIMESTAMP '1997-04-01'
)
SELECT 100.0 * promo_revenue_sum / total_revenue_sum AS promo_revenue_pct
FROM t
"""


def q_h16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per part group, excluding a
    supplier blacklist (NOT IN → broadcast anti-join).

    Suppliers with negative account balance are excluded the way Q16
    excludes complaint suppliers.
    """
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") != "STANDARD").select(
        "p_partkey", "p_brand", "p_size"
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    joined = li.join(
        F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti"
    ).join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    return joined.groupBy("p_brand", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


SQL_H16 = """
SELECT p.p_brand, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_type <> 'STANDARD'
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_size
"""


def q_h17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery — lineitems with
    quantity below 20% of their part's average quantity.

    The correlated AVG decorrelates into a per-part aggregate joined back
    on l_partkey — written here as the explicit groupBy+join Catalyst
    would produce. The per-part avg is exact (DECIMAL sum / count, one
    IEEE divide), so the 0.2× threshold is bit-identical on both engines.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    per_part = li.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double")
            / F.count("*")
        ).alias("avg_qty")
    )
    joined = li.join(
        per_part.withColumnRenamed("l_partkey", "p_key"),
        li["l_partkey"] == F.col("p_key"),
    ).filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    return joined.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly")
    )


SQL_H17 = """
WITH per_part AS (
    SELECT l_partkey AS p_key,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
               AS avg_qty
    FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
           AS avg_yearly
FROM lineitem l
JOIN per_part p ON l.l_partkey = p.p_key
WHERE l.l_quantity < 0.2 * p.avg_qty
"""


def q_h18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — HAVING over a grouped
    subquery, then join back to headers. Top-10 by total quantity.

    The inner aggregate reuses the same shuffle key (l_orderkey) as the
    join that follows, so AQE coalesces into one exchange at scale.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_qty")
        )
        .filter(F.col("total_qty") > 150)
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    joined = big.join(orders, big["l_orderkey"] == orders["o_orderkey"]).join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    )
    return joined.select(
        "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
        "total_qty",
    ).orderBy(F.desc("total_qty"), "o_orderkey").limit(10)


SQL_H18 = """
WITH big AS (
    SELECT l_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 150
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       b.total_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY b.total_qty DESC, o.o_orderkey
LIMIT 10
"""


def q_h22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich customers with no RECENT orders (none on or
    after 2000-01-01) — global-average scalar subquery + NOT EXISTS
    anti-join, grouped by market segment.

    Adaptation note: canonical Q22 looks for customers with no orders at
    all, but the synthetic fixture gives EVERY customer ~10 orders, so
    the literal form returns zero rows at every correctness-gate scale
    factor — an empty-vs-empty hash comparison that verifies nothing.
    The recency cutoff keeps the plan shape identical (scalar broadcast
    + anti-join on a date-filtered order slice, pushdown-visible) while
    producing live rows the gate actually checks (7 at sf0.001, 58 at
    sf0.01); semantically it is the "lapsed high-value customer" report.

    The global average is one tiny aggregate broadcast into the filter;
    the anti-join shuffles on c_custkey only for customers passing it.
    """
    cust = load(spark, sf_dir, "customer")
    avg_bal = cust.agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
            / F.count("*")
        ).alias("avg_bal")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.to_date("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(orders, rich["c_custkey"] == orders["o_custkey"], "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count("*").alias("numcust"),
        F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
        .cast("double")
        .alias("totacctbal"),
    )


SQL_H22 = """
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                          / COUNT(*) FROM customer)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND CAST(o.o_orderdate AS DATE) >= DATE '2000-01-01')
GROUP BY c_mktsegment
"""


def q_h8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's revenue share per year within a
    region — conditional-numerator ratio over a 6-table star join.

    Share = Σ(revenue where supplier nation = NATION_7, an ASIA nation)
    / Σ(revenue), both exact DECIMAL sums, divided once as doubles.
    """
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    supp_nation = supp.join(
        F.broadcast(nation.select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").cast("int").alias("o_year")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = _revenue()
    zero = F.lit(0).cast("decimal(20,6)")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .join(F.broadcast(supp_nation), li["l_suppkey"] == supp_nation["s_suppkey"])
    )
    agg = joined.groupBy("o_year").agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(zero))
        .cast("double")
        .alias("nation_rev"),
        F.sum(rev).cast("double").alias("total_rev"),
    )
    return agg.select(
        "o_year", (F.col("nation_rev") / F.col("total_rev")).alias("mkt_share")
    )


SQL_H8 = f"""
WITH j AS (
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           sn.n_name AS supp_nation,
           {SQL_REVENUE} AS rev
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE r.r_name = 'ASIA'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN rev
                     ELSE CAST(0 AS DECIMAL(20,6)) END) AS DOUBLE)
           / CAST(SUM(rev) AS DOUBLE) AS mkt_share
FROM j
GROUP BY o_year
"""


def q_h19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR of conjunctive brand/size/quantity clauses.

    Catalyst extracts the common l_partkey = p_partkey conjunct so the
    join stays an equi-join with the disjunction as a post-join filter
    (never a cartesian) — the h19 plan is covered by the registry-wide
    no-CartesianProduct test.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    clause1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size") <= 5)
        & (F.col("l_quantity") >= 1)
        & (F.col("l_quantity") <= 11)
    )
    clause2 = (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size") <= 10)
        & (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 20)
    )
    clause3 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size") <= 15)
        & (F.col("l_quantity") >= 20)
        & (F.col("l_quantity") <= 30)
    )
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"]).filter(
        clause1 | clause2 | clause3
    )
    return joined.agg(
        F.sum(_revenue()).cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


SQL_H19 = f"""
SELECT CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size <= 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size <= 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size <= 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


def q_a12_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributional stats (mean/variance/stddev) per return flag,
    computed from DECIMAL power sums so partial-aggregation order can't
    perturb the result — the engine-portable way to do moments at scale.

    variance = (n·Σx² − (Σx)²) / (n·(n−1)) with Σx, Σx² exact decimals
    surfaced as doubles; the remaining arithmetic is identical IEEE on
    both engines.
    """
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(12,2)")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("s1"),
        F.sum(x * x).cast("double").alias("s2"),
    )
    n = F.col("n").cast("double")
    var = (n * F.col("s2") - F.col("s1") * F.col("s1")) / (n * (n - F.lit(1.0)))
    return agg.select(
        "l_returnflag",
        "n",
        (F.col("s1") / n).alias("mean_qty"),
        var.alias("var_qty"),
        F.sqrt(var).alias("stddev_qty"),
    )


SQL_A12 = """
WITH t AS (
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s1,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                    * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s2
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       s1 / CAST(n AS DOUBLE) AS mean_qty,
       (CAST(n AS DOUBLE) * s2 - s1 * s1)
           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS var_qty,
       SQRT((CAST(n AS DOUBLE) * s2 - s1 * s1)
           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS stddev_qty
FROM t
"""


QUERIES: list[Query] = [
    Query("h4_order_priority", q_h4_order_priority, SQL_H4, "EXISTS semi-join"),
    Query("h6_forecast_revenue", q_h6_forecast_revenue, SQL_H6, "pushdown scalar agg"),
    Query("h10_returned_items", q_h10_returned_items, SQL_H10, "returns top-20"),
    Query("h12_priority_case", q_h12_priority_case, SQL_H12, "CASE conditional agg"),
    Query("h14_promo_ratio", q_h14_promo_ratio, SQL_H14, "promo revenue pct"),
    Query("h16_supplier_count", q_h16_supplier_count, SQL_H16, "NOT IN anti-join"),
    Query("h17_small_qty_revenue", q_h17_small_qty_revenue, SQL_H17,
          "correlated scalar subquery"),
    Query("h8_market_share", q_h8_market_share, SQL_H8, "market-share ratio"),
    Query("h18_large_volume", q_h18_large_volume, SQL_H18, "HAVING subquery"),
    Query("h19_disjunctive", q_h19_disjunctive, SQL_H19, "disjunctive predicates"),
    Query("h22_idle_customers", q_h22_idle_customers, SQL_H22,
          "scalar subquery + NOT EXISTS"),
    Query("a12_stats_exact", q_a12_stats_exact, SQL_A12,
          "exact moments via decimal power sums"),
]
