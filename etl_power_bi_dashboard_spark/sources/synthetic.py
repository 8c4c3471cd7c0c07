"""Synthetic Olist fixture generator (reference S7, `notebooks/
01_etl_process.ipynb` cell 4 `create_sample_data`).

The reference synthesizes seven demo CSVs with unseeded `np.random` when
the real Kaggle dump is absent. This twin keeps the same tables, schemas,
id formats, value pools, and date ranges, but is

- **deterministic**: every "random" value is derived from
  ``xxhash64(tag, id)`` — the same (table, row, column) always gets the
  same value, across runs, partitionings, and cluster sizes (the repo-wide
  convention; unseeded RNG cannot be regression-tested), and
- **distributed**: rows come from ``spark.range`` — generating a
  100×-larger fixture is the same plan with a bigger ``n``, no driver
  materialization. Each table is written as a Spark CSV directory bearing
  the exact reference filename (``olist_*_dataset.csv``), which
  ``sources.olist.extract_data`` reads transparently.

Values are *shaped* like the reference's (status weights 0.7/0.1/0.1/0.1,
price ∈ [10, 1000), five-city pools, 2022 date span) so the downstream
pipeline exercises the same branches: category translation hits, review
fan-out, null comment columns, delivered-vs-estimated timing.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .olist import FILENAMES

_CUSTOMER_CITIES = ["Sao Paulo", "Rio de Janeiro", "Belo Horizonte", "Porto Alegre", "Brasilia"]
_CUSTOMER_STATES = ["SP", "RJ", "MG", "RS", "DF"]
_SELLER_CITIES = ["Sao Paulo", "Rio de Janeiro", "Belo Horizonte", "Curitiba", "Salvador"]
_SELLER_STATES = ["SP", "RJ", "MG", "PR", "BA"]
_CATEGORIES = ["electronics", "furniture", "toys", "books", "clothing"]

_YEAR_SECONDS = 365 * 86400
_EPOCH_2022 = 1640995200  # 2022-01-01T00:00:00Z


def _h(tag: str, id_col: Column) -> Column:
    """Deterministic non-negative 63-bit hash for (tag, row id)."""
    return F.abs(F.xxhash64(F.lit(tag), id_col))


def _randint(tag: str, id_col: Column, lo: int, hi: int) -> Column:
    """Uniform integer in [lo, hi) — reference `np.random.randint` twin."""
    return (F.pmod(_h(tag, id_col), F.lit(hi - lo)) + lo).cast("long")


def _unit(tag: str, id_col: Column) -> Column:
    """Uniform double in [0, 1)."""
    return F.pmod(_h(tag, id_col), F.lit(1_000_000)) / 1_000_000.0


def _choice(tag: str, id_col: Column, pool: list[str]) -> Column:
    arr = F.array(*[F.lit(x) for x in pool])
    return F.element_at(arr, (F.pmod(_h(tag, id_col), F.lit(len(pool))) + 1).cast("int"))


def _ts_str(tag: str, id_col: Column, offset_seconds: Column | int = 0) -> Column:
    """Timestamp string within 2022 (+offset), matching the reference's
    string-typed raw date columns."""
    secs = F.pmod(_h(tag, id_col), F.lit(_YEAR_SECONDS)) + F.lit(_EPOCH_2022)
    return F.date_format(F.timestamp_seconds(secs + offset_seconds), "yyyy-MM-dd HH:mm:ss")


def synthetic_olist(
    spark: SparkSession,
    n_customers: int = 100,
    n_orders: int = 200,
    n_products: int = 150,
    n_sellers: int = 50,
    n_items: int = 300,
) -> dict[str, DataFrame]:
    """Build the seven raw Olist tables as lazy DataFrames (keys match
    ``sources.olist.SCHEMAS``)."""

    def ids(n: int, prefix: str, col: str) -> DataFrame:
        return spark.range(1, n + 1).select(
            F.col("id"), F.concat(F.lit(prefix), F.col("id")).alias(col)
        )

    i = F.col("id")

    customers = ids(n_customers, "cust_", "customer_id").select(
        "customer_id",
        F.concat(F.lit("uniq_"), i).alias("customer_unique_id"),
        _randint("czip", i, 10000, 99999).alias("customer_zip_code_prefix"),
        _choice("ccity", i, _CUSTOMER_CITIES).alias("customer_city"),
        _choice("cstate", i, _CUSTOMER_STATES).alias("customer_state"),
    )

    # order_status with the reference's 0.7/0.1/0.1/0.1 weights
    u = _unit("ostatus", i)
    status = (
        F.when(u < 0.7, "delivered")
        .when(u < 0.8, "shipped")
        .when(u < 0.9, "processing")
        .otherwise("canceled")
    )
    # order 1 purchases at exactly 2022-01-01 00:00:00, like the
    # reference's date_range start: dim_date strides day-by-day from the
    # MIN purchase timestamp keeping its time-of-day, so a non-midnight
    # minimum would leave the final calendar date without a dim row
    # (e.g. a Dec-31 09:00 order vs an 18:00 stride) → FK orphan
    purchase_secs = F.when(i == 1, F.lit(_EPOCH_2022)).otherwise(
        F.pmod(_h("opurchase", i), F.lit(_YEAR_SECONDS)) + F.lit(_EPOCH_2022)
    )

    def _offset(tag: str, lo_days: int, hi_days: int) -> Column:
        return _randint(tag, i, lo_days * 86400, hi_days * 86400)

    def _ts(secs: Column) -> Column:
        return F.date_format(F.timestamp_seconds(secs), "yyyy-MM-dd HH:mm:ss")

    orders = ids(n_orders, "order_", "order_id").select(
        "order_id",
        F.concat(F.lit("cust_"), _randint("ocust", i, 1, n_customers + 1)).alias(
            "customer_id"
        ),
        status.alias("order_status"),
        _ts(purchase_secs).alias("order_purchase_timestamp"),
        _ts(purchase_secs + _offset("oappr", 0, 2)).alias("order_approved_at"),
        _ts(purchase_secs + _offset("ocarr", 1, 4)).alias("order_delivered_carrier_date"),
        _ts(purchase_secs + _offset("odeliv", 4, 15)).alias(
            "order_delivered_customer_date"
        ),
        _ts(purchase_secs + _offset("oest", 9, 25)).alias(
            "order_estimated_delivery_date"
        ),
    )

    products = ids(n_products, "prod_", "product_id").select(
        "product_id",
        _choice("pcat", i, _CATEGORIES).alias("product_category_name"),
        _randint("pnamelen", i, 10, 100).alias("product_name_length"),
        _randint("pdesclen", i, 100, 1000).alias("product_description_length"),
        _randint("pphotos", i, 1, 10).alias("product_photos_qty"),
        _randint("pweight", i, 100, 10000).alias("product_weight_g"),
        _randint("plen", i, 10, 100).alias("product_length_cm"),
        _randint("pheight", i, 5, 50).alias("product_height_cm"),
        _randint("pwidth", i, 5, 50).alias("product_width_cm"),
    )

    order_items = spark.range(1, n_items + 1).select(
        F.concat(F.lit("order_"), _randint("iorder", i, 1, n_orders + 1)).alias(
            "order_id"
        ),
        _randint("iitem", i, 1, 5).alias("order_item_id"),
        F.concat(F.lit("prod_"), _randint("iprod", i, 1, n_products + 1)).alias(
            "product_id"
        ),
        F.concat(F.lit("seller_"), _randint("iseller", i, 1, n_sellers + 1)).alias(
            "seller_id"
        ),
        _ts_str("iship", i).alias("shipping_limit_date"),
        F.round(_unit("iprice", i) * 990 + 10, 2).alias("price"),
        F.round(_unit("ifreight", i) * 95 + 5, 2).alias("freight_value"),
    )

    sellers = ids(n_sellers, "seller_", "seller_id").select(
        "seller_id",
        _randint("szip", i, 10000, 99999).alias("seller_zip_code_prefix"),
        _choice("scity", i, _SELLER_CITIES).alias("seller_city"),
        _choice("sstate", i, _SELLER_STATES).alias("seller_state"),
    )

    # one review per order (reference: review_i ↔ order_i), null-heavy
    # comment columns so fill_missing's 'unknown' branch is exercised
    reviews = ids(n_orders, "review_", "review_id").select(
        "review_id",
        F.concat(F.lit("order_"), i).alias("order_id"),
        _randint("rscore", i, 1, 6).alias("review_score"),
        F.when(i % 3 == 0, F.concat(F.lit("Title "), i)).alias("review_comment_title"),
        F.when(i % 2 == 0, F.concat(F.lit("Message "), i)).alias(
            "review_comment_message"
        ),
        _ts_str("rcreate", i).alias("review_creation_date"),
        _ts_str("ranswer", i, 86400).alias("review_answer_timestamp"),
    )

    category_translation = spark.createDataFrame(
        [(c, c) for c in _CATEGORIES],
        ["product_category_name", "product_category_name_english"],
    )

    return {
        "customers": customers,
        "orders": orders,
        "order_items": order_items,
        "products": products,
        "sellers": sellers,
        "reviews": reviews,
        "category_translation": category_translation,
    }


def create_sample_data(spark: SparkSession, raw_dir: str, **sizes: int) -> list[str]:
    """S7: materialize the synthetic fixture under ``raw_dir`` with the
    reference's exact filenames, ready for ``extract_data`` — the twin of
    the notebook's ``create_sample_data()``. Returns written paths.

    Tables are written as Spark CSV directories (distributed write; the
    demo sizes are tiny but a 10⁹-row fixture would use the identical
    plan). ``extract_data``'s existence probe and ``spark.read.csv`` both
    accept directories, so downstream code is unchanged.
    """
    os.makedirs(raw_dir, exist_ok=True)
    tables = synthetic_olist(spark, **sizes)
    written: list[str] = []
    for name, df in tables.items():
        path = os.path.join(raw_dir, FILENAMES[name])
        df.write.mode("overwrite").option("header", True).csv(path)
        written.append(path)
    return written
