"""Transform stage (reference `src/etl_functions.py:50-127`): date
coercion, median/string imputation, derived order columns, category
translation — re-expressed as lazy Catalyst transformations with the
pandas corner cases preserved (SURVEY §1.4):

- invalid date strings → NULL (try_to_timestamp; input may carry
  nanosecond fractions, truncated to Spark's µs);
- numeric NaN → per-column exact median (linear interpolation, computed
  in ONE aggregation job per table, not one per column);
- string NULL → 'unknown' (timestamp columns are never filled);
- pandas weekday numbering Monday=0;
- NaN <= 0 comparisons yield False, not NULL (delivered_on_time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType

DATE_COLUMNS: dict[str, list[str]] = {
    "orders": [
        "order_purchase_timestamp",
        "order_approved_at",
        "order_delivered_carrier_date",
        "order_delivered_customer_date",
        "order_estimated_delivery_date",
    ],
    "reviews": ["review_creation_date", "review_answer_timestamp"],
    "order_items": ["shipping_limit_date"],
}


def coerce_timestamp(c: F.Column) -> F.Column:
    """String → timestamp, NULL on failure (ef:82). Fractions beyond µs are
    truncated (substring to 26 chars: 'yyyy-MM-dd HH:mm:ss.ffffff')."""
    return F.try_to_timestamp(F.substring(c, 1, 26))


def coerce_dates(df: DataFrame, cols: list[str]) -> DataFrame:
    for c in cols:
        if c in df.columns:
            df = df.withColumn(c, coerce_timestamp(F.col(c)))
    return df


def fill_missing(df: DataFrame) -> DataFrame:
    """Median-fill numerics, 'unknown'-fill strings (ef:85-92).

    One `agg` computing every column's exact median (Spark `percentile`
    interpolates like pandas), then a single `na.fill` — one job per
    table regardless of column count.

    SCALE CAVEAT: exact `percentile` is a single-reducer aggregate —
    every value of the column funnels through one task's sorted buffer.
    Faithful to the reference's pandas median (the parity contract) and
    fine at dim-table scale; a 100 TB fact pipeline must swap in
    `approx_percentile(c, 0.5)` (Greenwald-Khanna sketch — distributed
    and mergeable, see plans/stats_plans.py:q_ax2) at the cost of exact
    parity.
    """
    num_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)]
    str_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, StringType)]
    if num_cols:
        meds = df.agg(
            *[F.expr(f"percentile(`{c}`, 0.5)").alias(c) for c in num_cols]
        ).first()
        fills = {c: meds[c] for c in num_cols if meds[c] is not None}
        if fills:
            df = df.na.fill(fills)
    if str_cols:
        df = df.na.fill("unknown", str_cols)
    return df


def derive_order_columns(orders: DataFrame) -> DataFrame:
    """Date parts + delivery-duration metrics (ef:95-116)."""
    ts = F.col("order_purchase_timestamp")

    def frac_days(t2: F.Column, t1: F.Column) -> F.Column:
        # µs-exact fractional days; unix_micros is ANSI-safe (no ts→double cast)
        return (F.unix_micros(t2) - F.unix_micros(t1)) / 86400000000.0

    delay = frac_days(
        F.col("order_delivered_customer_date"), F.col("order_estimated_delivery_date")
    )
    return (
        orders.withColumn("purchase_year", F.year(ts))
        .withColumn("purchase_month", F.month(ts))
        .withColumn("purchase_day", F.dayofmonth(ts))
        .withColumn("purchase_dayofweek", F.weekday(ts))  # Monday=0 (§1.4.5)
        .withColumn("purchase_quarter", F.quarter(ts))
        .withColumn(
            "delivery_time_days",
            frac_days(F.col("order_delivered_customer_date"), ts),
        )
        .withColumn("delivery_delay_days", delay)
        # pandas: NaN <= 0 is False, not NULL (§1.4.3)
        .withColumn("delivered_on_time", F.coalesce(delay <= 0, F.lit(False)))
    )


def translate_categories(products: DataFrame, translation: DataFrame) -> DataFrame:
    """J1: left-join the (tiny) translation dim — broadcast (ef:119-125).
    Untranslated categories keep NULL english names, exactly like the
    post-fill pandas merge. Reorders columns to pandas-merge layout (left
    columns in place, new right columns appended)."""
    joined = products.join(F.broadcast(translation), "product_category_name", "left")
    new_cols = [c for c in translation.columns if c != "product_category_name"]
    return joined.select(*products.columns, *new_cols)


def transform_data(tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Full transform stage (ef:50-127): coercion → imputation → derived
    columns → translation. Purely lazy except the per-table median lookup
    (one tiny collect each, same as the reference's eager median)."""
    out = dict(tables)  # Spark DataFrames are immutable — no defensive copies (P6)
    for table, cols in DATE_COLUMNS.items():
        if table in out:
            out[table] = coerce_dates(out[table], cols)
    for name in list(out):
        out[name] = fill_missing(out[name])
    if "orders" in out:
        out["orders"] = derive_order_columns(out["orders"])
    if "products" in out and "category_translation" in out:
        out["products"] = translate_categories(out["products"], out["category_translation"])
    return out
