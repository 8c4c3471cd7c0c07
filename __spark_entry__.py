"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``etl_power_bi_dashboard_spark/``; the registry in
``etl_power_bi_dashboard_spark/plans/`` maps every SURVEY.md §2 operator
(and each extension operator) to a (Spark plan, oracle SQL) pair.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_power_bi_dashboard_spark.plans import REGISTRY  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: monthly sales rollup (SURVEY §7.2 step 1).

    orders ⨝ lineitem → daily rollup → dim_date join → monthly
    re-aggregation with ratio measures — scan, shuffle join, two-level
    aggregation, broadcast dim join, derived columns.
    """
    return REGISTRY["a2_sales_by_month"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return {name: q.spark for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query; omitted entries get rows-only checks."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
