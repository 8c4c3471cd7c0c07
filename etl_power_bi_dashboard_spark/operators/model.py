"""Dimensional-model stage (reference `src/etl_functions.py:130-237`):
dim_date generation, entity dimensions with surrogate ``id`` columns, and
fact_sales assembly.

Scale: dims are narrow per-entity tables (no shuffles to build); the fact
table is items ⨝ orders (shuffle equi-join, AQE) plus a left join to
reviews that deliberately preserves fan-out for multi-review orders
(§1.4.8) — reproduce, don't dedupe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIM_ORDER_COLS = [
    "order_id",
    "order_status",
    "order_purchase_timestamp",
    "order_approved_at",
    "order_delivered_carrier_date",
    "order_delivered_customer_date",
    "order_estimated_delivery_date",
    "delivery_time_days",
    "delivery_delay_days",
    "delivered_on_time",
]


def build_dim_date(orders: DataFrame) -> DataFrame:
    """Daily date dimension spanning [min, max] purchase timestamp
    (ef:146-172).

    pandas `date_range(min, max, freq='D')` strides in exact 24h steps
    *preserving min's time-of-day* — the last row can fall a day short if
    min's clock time exceeds max's. Reproduced exactly: row i =
    min + i·86400s, for i in [0, floor((max-min)/1d)]. Generated from the
    1-row min/max aggregate via sequence+explode — no driver collect, and
    a date dimension is inherently tiny at any data scale.
    """
    bounds = orders.agg(
        F.min("order_purchase_timestamp").alias("lo"),
        F.max("order_purchase_timestamp").alias("hi"),
    )
    days = bounds.select(
        "lo",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor(
                    (F.unix_micros("hi") - F.unix_micros("lo")) / 86400000000.0
                ).cast("int"),
            )
        ).alias("i"),
    ).select(
        F.timestamp_micros(
            F.unix_micros("lo") + F.col("i").cast("long") * 86400000000
        ).alias("date")
    )
    d = F.col("date")
    return days.select(
        d,
        F.year(d).alias("year"),
        F.month(d).alias("month"),
        F.dayofmonth(d).alias("day"),
        F.weekday(d).alias("dayofweek"),  # Monday=0 (§1.4.5)
        F.quarter(d).alias("quarter"),
        F.weekday(d).isin(5, 6).cast("long").alias("is_weekend"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.date_format(d, "EEEE").alias("dayofweek_name"),
        F.date_format(d, "yyyyMMdd").cast("long").alias("id"),  # §1.4.6
    )


def _with_id(df: DataFrame, pk: str) -> DataFrame:
    """F12: surrogate `id` := entity PK (ef:177, 183, 194, 203, 209)."""
    return df.withColumn("id", F.col(pk))


def build_fact_sales(
    order_items: DataFrame, orders: DataFrame, reviews: DataFrame | None
) -> DataFrame:
    """fact_sales = items ⨝ orders(3-col) + date_id + reviews ⟕ zero-fill
    (ef:213-233)."""
    fact = order_items.join(
        orders.select("order_id", "customer_id", "order_purchase_timestamp"),
        "order_id",
        "inner",
    ).withColumn(
        "date_id",
        F.date_format("order_purchase_timestamp", "yyyyMMdd").cast("long"),
    )
    fact = fact.select(
        "order_id",
        "order_item_id",
        "product_id",
        "seller_id",
        "customer_id",
        "date_id",
        "price",
        "freight_value",
    )
    if reviews is not None:
        # left join preserves multi-review fan-out (§1.4.8);
        # unreviewed orders get score 0 → later counted as detractors (§1.4.9)
        fact = fact.join(
            reviews.select("order_id", "review_score"), "order_id", "left"
        ).withColumn(
            "review_score", F.coalesce("review_score", F.lit(0)).cast("long")
        )
    return fact


def create_dimensional_model(
    tables: dict[str, DataFrame],
) -> tuple[dict[str, DataFrame], DataFrame]:
    """Star schema: 6 dims + fact_sales (ef:130-237)."""
    dims: dict[str, DataFrame] = {}
    if "orders" in tables:
        dims["date"] = build_dim_date(tables["orders"])
    if "customers" in tables:
        dims["customer"] = _with_id(tables["customers"], "customer_id")
    if "products" in tables:
        dim_product = _with_id(tables["products"], "product_id")
        if "product_category_name_english" not in dim_product.columns:
            # F13 fallback when the translation table is absent (ef:186-187)
            dim_product = dim_product.withColumn(
                "product_category_name_english", F.col("product_category_name")
            ).select(
                *[c for c in dim_product.columns if c != "id"],
                "product_category_name_english",
                "id",
            )
        dims["product"] = dim_product
    if "sellers" in tables:
        dims["seller"] = _with_id(tables["sellers"], "seller_id")
    if "orders" in tables:
        dims["order"] = _with_id(tables["orders"].select(*DIM_ORDER_COLS), "order_id")
    if "reviews" in tables:
        dims["review"] = _with_id(tables["reviews"], "review_id")

    if "orders" in tables and "order_items" in tables:
        fact = build_fact_sales(
            tables["order_items"], tables["orders"], tables.get("reviews")
        )
    else:
        fact = None
    return dims, fact
