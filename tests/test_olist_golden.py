"""Golden-output replication (SURVEY §5.2): run the Spark pipeline on the
reference's own raw CSVs and assert equality with its committed
`data/transformed/*.parquet` outputs (modulo row order, float epsilon, and
ns→µs timestamp truncation). This pins every semantic corner in SURVEY
§1.4: exact median, weekday base, NaN<=0→False, date_id keys, fan-out,
score-0 detractors, time-of-day-preserving dim_date stride.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from etl_power_bi_dashboard_spark.pipeline import run_pipeline

RAW = "/root/reference/data/raw/"
GOLDEN = "/root/reference/data/transformed/"

TABLES = [
    "dim_date",
    "dim_customer",
    "dim_product",
    "dim_seller",
    "dim_order",
    "dim_review",
    "fact_sales",
    "agg_sales_by_date",
    "agg_sales_by_category",
    "agg_sales_by_location",
    "agg_sales_by_city",
    "agg_sales_by_seller",
    "agg_review_metrics",
]

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="reference golden outputs not available"
)


@pytest.fixture(scope="module")
def pipeline_outputs(spark):
    dims, fact, aggs = run_pipeline(spark, RAW)
    out = {f"dim_{k}": v for k, v in dims.items()}
    out["fact_sales"] = fact
    out.update({f"agg_{k}": v for k, v in aggs.items()})
    return {k: v.toPandas() for k, v in out.items()}


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].dt.floor("us")  # golden is ns; Spark is µs
    return df.sort_values(by=sorted(df.columns), ignore_index=True)[sorted(df.columns)]


def _assert_frames_equal(ours: pd.DataFrame, golden: pd.DataFrame, name: str):
    assert list(ours.columns) == list(golden.columns), (
        f"{name}: column order mismatch ours={list(ours.columns)} "
        f"golden={list(golden.columns)}"
    )
    a, b = _normalize(ours), _normalize(golden)
    assert len(a) == len(b), f"{name}: rows ours={len(a)} golden={len(b)}"
    for c in a.columns:
        x, y = a[c], b[c]
        if pd.api.types.is_float_dtype(y):
            ok = np.isclose(
                x.astype(float), y.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True
            ).all()
        elif pd.api.types.is_datetime64_any_dtype(y):
            ok = (x.values == y.values) | (pd.isna(x.values) & pd.isna(y.values))
            ok = ok.all()
        else:
            ok = (x.astype(object).where(pd.notna(x), None).tolist()
                  == y.astype(object).where(pd.notna(y), None).tolist())
        assert ok, f"{name}.{c}: values differ\nours:\n{x.head()}\ngolden:\n{y.head()}"


@pytest.mark.parametrize("table", TABLES)
def test_golden(pipeline_outputs, table):
    golden = pd.read_parquet(f"{GOLDEN}{table}.parquet")
    assert table in pipeline_outputs, f"pipeline did not produce {table}"
    _assert_frames_equal(pipeline_outputs[table], golden, table)
