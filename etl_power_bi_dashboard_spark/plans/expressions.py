"""Expression-surface plans: string functions, conditionals, null-safe
comparison, and unpivot/melt — the scalar-function completeness a user of
a general analytics engine expects (the reference needs only +,−,×,÷ and
concat; these are engine-completeness extensions, SURVEY §2.5 note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import Query, load


def q_f16_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    name = F.col("p_name")
    return p.select(
        "p_partkey",
        F.upper(name).alias("upper_name"),
        F.lower(F.col("p_brand")).alias("lower_brand"),
        F.substring(name, 1, 5).alias("prefix5"),
        F.length(name).alias("name_len"),
        F.lpad(F.col("p_brand"), 12, "*").alias("brand_padded"),
        F.regexp_extract(name, "([a-z]+)", 1).alias("first_word"),
        F.replace(name, F.lit(" "), F.lit("_")).alias("snake_name"),
        F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.size(F.split(name, " ")).alias("n_words"),
    )


SQL_F16 = """
SELECT p_partkey,
       upper(p_name) AS upper_name,
       lower(p_brand) AS lower_brand,
       substring(p_name, 1, 5) AS prefix5,
       CAST(length(p_name) AS INT) AS name_len,
       lpad(p_brand, 12, '*') AS brand_padded,
       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
       replace(p_name, ' ', '_') AS snake_name,
       concat_ws('|', p_brand, p_type) AS brand_type,
       CAST(len(string_split(p_name, ' ')) AS INT) AS n_words
FROM part
"""


def q_f17_conditionals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(tp > 200000, "high")
        .when(tp > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.nullif((F.col("o_orderkey") % 3).cast("bigint"), F.lit(0).cast("bigint")).alias(
            "mod3_nullif"
        ),
        F.least(tp, F.lit(150000.0)).alias("capped_price"),
        F.greatest((F.col("o_orderkey") % 5).cast("bigint"), F.lit(2).cast("bigint")).alias(
            "floor2"
        ),
    )


SQL_F17 = """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 200000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS price_band,
       nullif(CAST(o_orderkey % 3 AS BIGINT), 0) AS mod3_nullif,
       least(o_totalprice, 150000.0) AS capped_price,
       greatest(CAST(o_orderkey % 5 AS BIGINT), 2) AS floor2
FROM orders
"""


def q_f18_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=> / IS NOT DISTINCT FROM) vs plain equality
    on nullified columns."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 4 == 0, None).otherwise(F.col("c_nationkey")).alias("a"),
        F.when(F.col("c_custkey") % 6 == 0, None).otherwise(F.col("c_nationkey")).alias("b"),
    )
    return c.select(
        "c_custkey",
        F.col("a").eqNullSafe(F.col("b")).alias("null_safe_eq"),
        F.coalesce(F.col("a") == F.col("b"), F.lit(False)).alias("plain_eq_coalesced"),
    )


SQL_F18 = """
WITH t AS (
    SELECT c_custkey,
           CASE WHEN c_custkey % 4 = 0 THEN NULL ELSE c_nationkey END AS a,
           CASE WHEN c_custkey % 6 = 0 THEN NULL ELSE c_nationkey END AS b
    FROM customer
)
SELECT c_custkey,
       a IS NOT DISTINCT FROM b AS null_safe_eq,
       COALESCE(a = b, FALSE) AS plain_eq_coalesced
FROM t
"""


def q_pv2_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide measure columns to (measure, value) rows."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount"],
        variableColumnName="measure",
        valueColumnName="value",
    )


SQL_PV2 = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value
FROM lineitem WHERE l_orderkey < 100
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
FROM lineitem WHERE l_orderkey < 100
"""


QUERIES: list[Query] = [
    Query("f16_string_ops", q_f16_string_ops, SQL_F16, "string function surface"),
    Query("f17_conditionals", q_f17_conditionals, SQL_F17, "CASE/nullif/least/greatest"),
    Query("f18_null_safe_eq", q_f18_null_safe_eq, SQL_F18, "null-safe equality"),
    Query("pv2_unpivot", q_pv2_unpivot, SQL_PV2, "unpivot/melt"),
]
