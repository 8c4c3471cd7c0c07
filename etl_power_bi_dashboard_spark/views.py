"""SQL entry point (SURVEY §3, entry point 3): the exported star schema as
temp views so the BI-layer measures (§2.10) are answerable via
``spark.sql`` — the reference delegates these to Power BI; here they're
native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

MEASURES_SQL = """
SELECT CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE)         AS total_sales,
       CAST(SUM(CAST(freight_value AS DECIMAL(18,2))) AS DOUBLE) AS total_freight,
       COUNT(DISTINCT order_id)                                  AS order_count,
       CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(DISTINCT order_id)                            AS avg_ticket,
       CAST(SUM(CAST(freight_value AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) * 100
           AS freight_percentage
FROM fact_sales
"""

MEASURES_BY_PERIOD_SQL = """
SELECT d.year, d.quarter,
       CAST(SUM(CAST(f.price AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
       COUNT(DISTINCT f.order_id)                           AS order_count
FROM fact_sales f JOIN dim_date d ON f.date_id = d.id
GROUP BY d.year, d.quarter
"""


def register_star_views(
    spark: SparkSession, dims: dict[str, DataFrame], fact: DataFrame
) -> list[str]:
    """Register fact_sales + dim_* as temp views; returns the view names.

    Temp views land in the catalog of each DataFrame's OWN session —
    ``spark`` is validated against them rather than used to register, so
    a frame from a different session fails loudly here instead of
    ``answer_measures(spark)`` failing later with a missing-view error.
    The comparison is on the underlying JVM session, not Python object
    identity: two Python wrappers around the same JVM session share a
    catalog, so rejecting them would be a false positive.
    """

    def _same_session(a: SparkSession, b: SparkSession) -> bool:
        try:
            return bool(a._jsparkSession.equals(b._jsparkSession))
        except Exception:  # Connect or wrapper without a JVM handle
            return a is b

    names = []
    for view, df in [("fact_sales", fact)] + [
        (f"dim_{name}", df) for name, df in dims.items()
    ]:
        if not _same_session(df.sparkSession, spark):
            raise ValueError(
                f"{view}: DataFrame belongs to a different SparkSession "
                "than the one passed; its temp view would not be visible "
                "to queries on this session"
            )
        df.createOrReplaceTempView(view)
        names.append(view)
    return names


def answer_measures(spark: SparkSession) -> DataFrame:
    """The five DAX measures (§2.10) over the registered views."""
    return spark.sql(MEASURES_SQL)


def measures_by_period(spark: SparkSession) -> DataFrame:
    """Measures sliced by the dim_date relationship (§2.10 slicers)."""
    return spark.sql(MEASURES_BY_PERIOD_SQL)
