"""Catalog of the driver-provided parquet tables.

The reference models a "catalog" as ``dict[str, pandas.DataFrame]``
(reference `src/etl_functions.py:29-36`); the Spark-native equivalent is a
dict of lazy DataFrames plus temp views, so every table is reachable from
both the DataFrame API and ``spark.sql``.

Dimension tables (small, bounded cardinality) are broadcast-joined by the
plans; fact tables (orders, lineitem, events) scale with SF and join via
shuffle with AQE.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tables whose size is bounded (or grows far slower than the facts) — safe
# to broadcast at any SF. `customer`/`part` grow with SF but stay dimension
# -sized relative to lineitem; broadcast hints are still given per-plan, not
# globally, so a 100 TB run can drop them where inappropriate.
DIM_TABLES = ("region", "nation", "supplier")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register_views: bool = False
) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = f"{sf_dir}/{name}.parquet"
        if not os.path.exists(path):
            continue  # optional-source probe (reference S2, `src/etl_functions.py:39-40`)
        df = spark.read.parquet(path)
        out[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return out
