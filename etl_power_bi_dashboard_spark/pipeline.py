"""End-to-end Olist ETL pipeline (reference `src/etl_functions.py:562-585`):
extract → transform → dimensional model → aggregates → export, as one lazy
DataFrame graph per sink instead of five eager materializations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators.aggregates import create_aggregated_tables
from .operators.model import create_dimensional_model
from .operators.transform import transform_data
from .sources.olist import extract_data
from . import sinks


def run_pipeline(
    spark: SparkSession,
    base_path: str,
    output_path: str | None = None,
) -> tuple[dict[str, DataFrame], DataFrame, dict[str, DataFrame]] | None:
    """Returns (dims, fact, aggs) — all lazy; writes only if output_path."""
    raw = extract_data(spark, base_path)
    if raw is None:
        return None
    transformed = transform_data(raw)
    dims, fact = create_dimensional_model(transformed)
    aggs = create_aggregated_tables(fact, dims)
    if output_path:
        sinks.export_star(dims, fact, aggs, output_path)
        sinks.write_bi_contract(output_path)
    return dims, fact, aggs


# No __main__ block: `python -m etl_power_bi_dashboard_spark pipeline`
# (see __main__.py) is the one CLI entry — a script-style block here
# would duplicate it and die on the relative imports anyway.
