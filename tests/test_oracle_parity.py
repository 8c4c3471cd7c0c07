"""Differential test: every registered query vs its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from etl_power_bi_dashboard_spark.plans import REGISTRY

from .conftest import SF_DIR
from .parity import compare

_WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
_ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, oracle, name):
    q = REGISTRY[name]
    compare(q.spark(spark, SF_DIR), oracle, q.oracle, name)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only(spark, name):
    q = REGISTRY[name]
    df = q.spark(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
