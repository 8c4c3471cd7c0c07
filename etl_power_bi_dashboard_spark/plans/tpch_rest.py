"""The remaining TPC-H query shapes (Q2, Q7, Q9, Q11, Q13, Q15, Q20, Q21),
completing the full 22-query shape suite together with tpch.py (Q1/Q3/Q5)
and tpch_more.py (Q4/Q6/Q8/Q10/Q12/Q14/Q16/Q17/Q18/Q19/Q22).

The driver schema has no ``partsupp`` table and no commit/receipt dates on
``lineitem``, so the four queries that need them (Q2/Q9/Q11/Q20 cost+stock,
Q21 lateness) are *adapted*: each keeps its defining structural character —
the join topology, subquery shape, and aggregation pattern a 100 TB planner
must handle — re-expressed over observed sales:

- h2:  correlated MIN subquery + join-back (min-cost supplier → min
       observed unit price per part within a region), ordered top-100.
- h7:  symmetric nation-pair join (two independent dimension lookups on
       the same fact row, OR of ordered pairs) grouped by year.
- h9:  profit decomposition (revenue minus a cost term) per nation/year;
       ``p_retailprice`` stands in for ``ps_supplycost``.
- h11: group-sum vs global-scalar-threshold (HAVING value > total × k).
- h13: LEFT OUTER join with a join-level predicate → count distribution
       (customers by order count, including zero-order customers).
- h15: per-key revenue in a window, select argmax via scalar-subquery MAX.
- h20: semi-join on a correlated share threshold (supplier shipped > 25 %
       of a part's 1997 volume), nation-restricted.
- h21: multi-EXISTS self-join (late line, another supplier present, no
       other supplier late) — the hardest decorrelation shape in TPC-H.

Reference parity note: the reference (`/root/reference/src/etl_functions.py`)
issues none of these — they are the BI-layer OLAP surface (SURVEY §2.10
extensions). Exactness follows base.py: DECIMAL partial sums surfaced as
DOUBLE, ratios/thresholds written with identical IEEE association on both
engines; MIN/MAX/equality over doubles are order-insensitive and safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import Query, load
from .tpch_more import SQL_REVENUE, _revenue


def q_h2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each LARGE part, the ASIA-region supplier(s) whose
    observed unit sale price equals the part's minimum — a correlated MIN
    subquery joined back on (part, exact min), ordered top-100.

    The per-part MIN decorrelates into a groupBy reusing the same shuffle
    key as the join-back, so AQE plans one exchange. Unit price is a
    single IEEE divide of two doubles — bit-identical on both engines, so
    the equality join-back is exact. Region/nation/supplier lookups are
    broadcasts; only lineitem shuffles.
    """
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation").join(
        F.broadcast(region),
        F.col("n_regionkey") == F.col("r_regionkey"),
        "left_semi",
    ).select("n_nationkey", "n_name")
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE").select(
        "p_partkey", "p_name"
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0).select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    eligible = li.join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"]
    ).join(supp, li["l_suppkey"] == supp["s_suppkey"])
    min_price = eligible.groupBy(F.col("p_partkey").alias("mp_key")).agg(
        F.min("unit_price").alias("min_price")
    )
    best = eligible.join(
        min_price,
        (eligible["p_partkey"] == min_price["mp_key"])
        & (eligible["unit_price"] == min_price["min_price"]),
    )
    return (
        best.select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "min_price"
        )
        .dropDuplicates(["p_partkey", "s_name"])
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


SQL_H2 = """
WITH eligible AS (
    SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal, n.n_name,
           l.l_extendedprice / l.l_quantity AS unit_price
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE p.p_type = 'LARGE' AND r.r_name = 'ASIA'
      AND l.l_quantity > 0
)
SELECT DISTINCT e.s_acctbal, e.s_name, e.n_name, e.p_partkey, e.p_name,
       e.unit_price AS min_price
FROM eligible e
WHERE e.unit_price = (SELECT MIN(e2.unit_price) FROM eligible e2
                      WHERE e2.p_partkey = e.p_partkey)
ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, e.p_partkey
LIMIT 100
"""


def q_h7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations — the
    same fact row resolves a supplier nation AND a customer nation, kept
    only for the two ordered pairs, grouped by (supp, cust, year).

    Both nation lookups are broadcasts; the disjunction of ordered pairs
    is a post-join filter on broadcast-joined columns (no cartesian). One
    shuffle total: lineitem ⨝ orders on orderkey, then a 4-group agg.
    """
    nation = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    cust = load(spark, sf_dir, "customer").join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("cn_key"),
                F.col("n_name").alias("cust_nation"),
            )
        ),
        F.col("c_nationkey") == F.col("cn_key"),
    ).select("c_custkey", "cust_nation")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select(
        "l_orderkey",
        "l_suppkey",
        "l_extendedprice",
        "l_discount",
        F.year("l_shipdate").cast("int").alias("l_year"),
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .filter(pair)
    )
    return joined.groupBy("supp_nation", "cust_nation", "l_year").agg(
        F.sum(_revenue()).cast("double").alias("revenue")
    )


SQL_H7 = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1999-01-01'
  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
GROUP BY sn.n_name, cn.n_name, CAST(year(l.l_shipdate) AS INT)
"""


def q_h9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for a
    part-name-pattern slice — revenue minus a cost term over a 5-table
    join. With no ``partsupp``, cost ≔ p_retailprice × l_quantity / 10
    (the retail price standing in for supply cost).

    Revenue and cost are separate exact DECIMAL sums surfaced as doubles;
    profit = sum_rev − sum_cost/10.0 with identical association on both
    engines (no per-row float subtraction whose order could differ).
    """
    part = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_retailprice")
    nation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), "n_name"
    )
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("sn_key")
    ).select("s_suppkey", "n_name")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("int").alias("o_year")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    cost = F.col("p_retailprice").cast("decimal(12,2)") * F.col(
        "l_quantity"
    ).cast("decimal(12,2)")
    joined = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
    )
    agg = joined.groupBy("n_name", "o_year").agg(
        F.sum(_revenue()).cast("double").alias("sum_rev"),
        F.sum(cost).cast("double").alias("sum_cost"),
    )
    return agg.select(
        "n_name",
        "o_year",
        (F.col("sum_rev") - F.col("sum_cost") / F.lit(10.0)).alias("profit"),
    )


SQL_H9 = f"""
WITH t AS (
    SELECT n.n_name, CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS sum_rev,
           CAST(SUM(CAST(p.p_retailprice AS DECIMAL(12,2))
                    * CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_cost
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INT)
)
SELECT n_name, o_year, sum_rev - sum_cost / 10.0 AS profit FROM t
"""


def q_h11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value for one nation's suppliers, kept
    when above a fraction of the nation's total — grouped sum HAVING a
    global-scalar-subquery threshold.

    Both the per-part values and the grand total are exact DECIMAL sums
    over the *same* filtered join (the total is NOT a re-sum of per-part
    doubles, whose order would differ between engines); the 0.001
    threshold multiply is one IEEE op on both sides. The total is a 1-row
    broadcast, so the filter adds no shuffle.
    """
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation),
        F.col("s_nationkey") == F.col("n_nationkey"),
        "left_semi",
    ).select("s_suppkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    base = li.join(supp, li["l_suppkey"] == supp["s_suppkey"])
    per_part = base.groupBy("l_partkey").agg(
        F.sum(_revenue()).cast("double").alias("part_value")
    )
    total = base.agg(F.sum(_revenue()).cast("double").alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("total_value") * F.lit(0.001))
        .select("l_partkey", "part_value")
    )


SQL_H11 = f"""
WITH base AS (
    SELECT l.l_partkey, {SQL_REVENUE} AS rev
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
)
SELECT l_partkey, CAST(SUM(rev) AS DOUBLE) AS part_value
FROM base
GROUP BY l_partkey
HAVING CAST(SUM(rev) AS DOUBLE) >
       (SELECT CAST(SUM(rev) AS DOUBLE) FROM base) * 0.001
"""


def q_h13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count — LEFT
    OUTER join with a predicate *inside the join condition* (so customers
    whose every order is urgent still appear with count 0), two-level
    aggregation.

    The outer join shuffles on custkey once; the second groupBy is on the
    tiny c_count domain. COUNT(o_orderkey) counts non-null matches only —
    the left-outer twin of COUNT(*).
    """
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    joined = cust.join(
        orders,
        (cust["c_custkey"] == orders["o_custkey"])
        & (orders["o_orderpriority"] != "1-URGENT"),
        "left_outer",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


SQL_H13 = """
WITH per_cust AS (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT OUTER JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
"""


def q_h15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum revenue over a
    3-month ship window — a grouped revenue view consumed twice (argmax
    via scalar-subquery MAX + equality join-back).

    Per-supplier revenues are exact decimal sums as doubles; MAX over
    them is order-insensitive, and the equality join-back compares two
    identically-derived doubles, so argmax selection is deterministic.
    The MAX is a 1-row broadcast. Spark evaluates the revenue view once
    per branch (the pruned columns differ, so AQE does not dedupe the
    exchanges — verified on the runtime plan); the recomputed side is
    the already-filtered 3-month slice, and in a production pipeline the
    view would be cached or persisted before the argmax.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    revenue = li.groupBy("l_suppkey").agg(
        F.sum(_revenue()).cast("double").alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("l_suppkey") == supp["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


SQL_H15 = f"""
WITH revenue AS (
    SELECT l_suppkey, CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS total_revenue
    FROM lineitem l
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM revenue r
JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def q_h20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: NATION_5 suppliers who dominated a Brand#5 part's
    1997 volume — a semi-join against a correlated share threshold
    (supplier's shipped qty > 25 % of the part's total shipped qty).

    Per-(part, supplier) and per-part quantity sums are exact decimal
    partials as doubles sharing one shuffle prefix on l_partkey; the
    share comparison multiplies the same double by 0.25 on both engines.
    The qualifying-supplier set then semi-joins the (tiny, broadcast)
    nation-filtered supplier dim.
    """
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5").select(
        "p_partkey"
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity").join(
        F.broadcast(part), F.col("l_partkey") == part["p_partkey"], "left_semi"
    )
    qty = F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double")
    per_pair = li.groupBy("l_partkey", "l_suppkey").agg(qty.alias("sup_qty"))
    per_part = li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        qty.alias("tot_qty")
    )
    dominant = (
        per_pair.join(per_part, per_pair["l_partkey"] == per_part["pp_key"])
        .filter(F.col("sup_qty") > F.col("tot_qty") * F.lit(0.25))
        .select("l_suppkey")
        .distinct()
    )
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation),
        F.col("s_nationkey") == F.col("n_nationkey"),
        "left_semi",
    )
    return (
        supp.join(dominant, supp["s_suppkey"] == dominant["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


SQL_H20 = """
WITH li97 AS (
    SELECT l.l_partkey, l.l_suppkey, l.l_quantity
    FROM lineitem l
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
      AND l.l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#5')
), per_pair AS (
    SELECT l_partkey, l_suppkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sup_qty
    FROM li97 GROUP BY l_partkey, l_suppkey
), per_part AS (
    SELECT l_partkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS tot_qty
    FROM li97 GROUP BY l_partkey
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_5'
  AND s.s_suppkey IN (
      SELECT pp.l_suppkey
      FROM per_pair pp
      JOIN per_part pt ON pp.l_partkey = pt.l_partkey
      WHERE pp.sup_qty > pt.tot_qty * 0.25)
ORDER BY s.s_suppkey
"""


def q_h21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone were late on a multi-supplier
    finished order — one EXISTS (another supplier has a line in the same
    order) and one NOT EXISTS (no *other* supplier was late), both
    self-joins on lineitem. Lateness ≔ shipped > 60 days after the order
    date (the schema has no commit/receipt dates).

    Late lines are computed once and reused for both the driving set and
    the NOT EXISTS side. All three self-join legs shuffle on l_orderkey —
    one repartitioning reused across semi + anti join at scale. Top-20
    with a total-order tiebreak for determinism.
    """
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    ).distinct()
    waiting = late.join(
        others,
        (late["l_orderkey"] == others["o2_orderkey"])
        & (late["l_suppkey"] != others["o2_suppkey"]),
        "left_semi",
    ).join(
        late_others,
        (late["l_orderkey"] == late_others["o3_orderkey"])
        & (late["l_suppkey"] != late_others["o3_suppkey"]),
        "left_anti",
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(supp, waiting["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


SQL_H21 = """
WITH late AS (
    SELECT l.l_orderkey, l.l_suppkey
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
SELECT s.s_name, COUNT(*) AS numwait
FROM late l1
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
"""


QUERIES: list[Query] = [
    Query("h2_min_cost_supplier", q_h2_min_cost_supplier, SQL_H2,
          "correlated MIN + join-back top-100"),
    Query("h7_volume_shipping", q_h7_volume_shipping, SQL_H7,
          "bilateral nation-pair trade volume"),
    Query("h9_product_profit", q_h9_product_profit, SQL_H9,
          "profit decomposition by nation/year"),
    Query("h11_important_parts", q_h11_important_parts, SQL_H11,
          "group sum vs global threshold"),
    Query("h13_custdist", q_h13_custdist, SQL_H13,
          "outer-join order-count distribution"),
    Query("h15_top_supplier", q_h15_top_supplier, SQL_H15,
          "argmax supplier via scalar MAX"),
    Query("h20_excess_suppliers", q_h20_excess_suppliers, SQL_H20,
          "correlated share-threshold semi-join"),
    Query("h21_waiting_supplier", q_h21_waiting_supplier, SQL_H21,
          "multi-EXISTS self-join"),
]
