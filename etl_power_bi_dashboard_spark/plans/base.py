"""Plan-registry foundation.

Every capability from SURVEY.md §2 (and every extension operator) is
registered as a :class:`Query` — a named pair of

- ``spark``: ``(SparkSession, sf_dir) -> DataFrame`` building a lazy,
  Catalyst-optimizable plan over the driver parquet tables, and
- ``oracle``: an equivalent ANSI SQL string DuckDB can run on the same
  tables (``None`` only for genuinely non-SQL-expressible operators).

Exactness convention (so order-insensitive value hashes match bit-for-bit
between Spark and DuckDB):

- money aggregates are summed as DECIMAL (exact, association-independent)
  and cast to DOUBLE at the end — ``CAST(SUM(CAST(x AS DECIMAL)) AS
  DOUBLE)`` — never summed as floating point, where partial-aggregation
  order would make the two engines disagree in the last bits;
- ratios divide two such exact doubles (IEEE ops are deterministic);
- integer-valued keys are cast to explicit INT/BIGINT on both sides.

The "Olist role mapping" onto the TPC-H-ish driver tables (FIXTURES.md §3):
orders+lineitem ↔ orders+order_items, customer/part/supplier ↔
dim_customer/dim_product/dim_seller, ``o_orderdate`` ↔ purchase timestamp,
``price := l_extendedprice``, ``freight := l_extendedprice * l_discount``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Query:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with ``ts`` as TimestampType.

    The driver writes ``events.parquet`` with TIMESTAMP(NANOS), which
    Spark's vectorized parquet reader rejects ([PARQUET_TYPE_ILLEGAL]).
    Read nanos as raw int64 (``spark.sql.legacy.parquet.nanosAsLong``) and
    truncate to microseconds — exactly what DuckDB does when it coerces
    nanos to its µs-precision TIMESTAMP, so oracle comparisons line up.

    The session timezone is pinned to UTC for the same reason: ``ts`` is
    rebuilt via ``timestamp_micros`` (TZ-aware), so a non-UTC driver
    session would shift every derived window/timestamp relative to the
    TZ-naive DuckDB oracle. ``session.get_spark`` already pins UTC at
    construction; the pin here is deliberately kept anyway because the
    grading driver (and any external embedder) builds its OWN session
    that never goes through ``get_spark`` — this loader is the only
    code of ours guaranteed to run before event timestamps materialize.
    """
    path = f"{sf_dir}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type == "timestamp_ntz":
        # TIMESTAMP(MICROS) without timezone annotation reads as NTZ under
        # Spark 4's inferTimestampNTZ; with the session pinned to UTC the
        # cast is a pure re-tag of the same wall-clock instant, matching
        # DuckDB's TZ-naive read. Downstream operators (unix_micros,
        # window(), watermarks) require TimestampType.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# --- exact-money expression helpers (DataFrame side) -----------------------

def price_dec() -> Column:
    """price as exact decimal (2-decimal doubles round-trip exactly)."""
    return F.col("l_extendedprice").cast("decimal(18,2)")


def freight_dec() -> Column:
    """freight := price * discount, in exact decimal arithmetic."""
    return price_dec() * F.col("l_discount").cast("decimal(8,4)")


def dsum(c: Column, alias: str) -> Column:
    """Exact decimal sum surfaced as DOUBLE (deterministic across engines)."""
    return F.sum(c).cast("double").alias(alias)


# --- exact-money expression helpers (oracle SQL side) ----------------------

def lineitem_revenue() -> Column:
    """The TPC-H discounted-revenue expression, exact DECIMAL — ONE
    definition (SQL twin: SQL_REVENUE) consumed by every h-query that
    sums revenue, so the precision convention cannot fork."""
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(6,4)")
        - F.col("l_discount").cast("decimal(6,4)")
    )


SQL_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))"
)


SQL_PRICE = "CAST(l_extendedprice AS DECIMAL(18,2))"
SQL_FREIGHT = f"({SQL_PRICE} * CAST(l_discount AS DECIMAL(8,4)))"


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE) AS {alias}"


# --- the shared fact: lineitem ⨝ orders (reference J2, ef:214-220) ---------

FACT_ORDER_COLS = ("o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus")


def fact_sales(spark: SparkSession, sf_dir: str, parallel: bool = False) -> DataFrame:
    """lineitem enriched with its order header + Olist-role measure columns.

    Fact-to-fact equi-join on the shuffle key; at 100 TB both sides are
    large, so no broadcast hint — AQE picks shuffle-hash/sort-merge and
    handles skew. ``date_id`` is the reference's yyyyMMdd surrogate key
    (reference `src/etl_functions.py:170, 223`).

    ``parallel=True`` (round 12, guide §2.2) routes the lineitem side
    through ``ensure_parallelism`` keyed on ``l_orderkey``: a one-file
    scan yields ONE task, so the join probe + partial (count-distinct)
    aggregation of every downstream rollup serialized on one core. The
    repartition is a no-op at real scale (scan partitions >= cores) and
    hash-partitions on the join key, so a sort-merge plan reuses it.
    Opt-in — only ORDER-INSENSITIVE consumers (the a1–a7/dax rollups)
    set it, so row-shaped consumers keep their exact plan.
    """
    li = load(spark, sf_dir, "lineitem")
    if parallel:
        from ..operators.dedup import ensure_parallelism

        li = ensure_parallelism(li, "l_orderkey")
    orders = load(spark, sf_dir, "orders").select(*FACT_ORDER_COLS)
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "inner")
        .drop("o_orderkey")
        .withColumn("date_id", F.date_format("o_orderdate", "yyyyMMdd").cast("int"))
        .withColumn("price", price_dec())
        .withColumn("freight", freight_dec())
    )


SQL_FACT = f"""
fact AS (
    SELECT l.*,
           o.o_custkey, o.o_orderdate, o.o_orderstatus,
           CAST(strftime(o.o_orderdate, '%Y%m%d') AS INT) AS date_id,
           {SQL_PRICE} AS price,
           {SQL_FREIGHT} AS freight
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
)
"""
