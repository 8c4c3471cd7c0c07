"""Round-11 type-widening reader: mergeSchema refuses int→bigint /
float→double drift across snapshots (probed: CANNOT_MERGE_SCHEMAS), so
read_with_type_widening conforms each snapshot to the widened union
schema and unions by name. These tests pin the widening lattice, the
value-preservation of every upcast, the loud failure on incomparable
drift, and that pushdown survives the per-snapshot conform."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType, DoubleType, LongType

from etl_power_bi_dashboard_spark.sources.evolve import (
    read_with_type_widening,
    widened_union_schema,
)


@pytest.fixture()
def lake(spark, tmp_path):
    """Three snapshots of one logical table, written months apart:
    v1 (n int, v float); v2 widens both (n bigint, v double) and adds
    lang; v3 keeps v2's shape."""
    p1, p2, p3 = (str(tmp_path / f"v{i}") for i in (1, 2, 3))
    spark.createDataFrame(
        [(1, 1.5), (2, 2.5)], "n int, v float"
    ).write.parquet(p1)
    spark.createDataFrame(
        [(2**40, 0.1, "en")], "n bigint, v double, lang string"
    ).write.parquet(p2)
    spark.createDataFrame(
        [(7, 0.25, "pt")], "n bigint, v double, lang string"
    ).write.parquet(p3)
    return p1, p2, p3


def test_mergeschema_alone_refuses_the_drift(spark, lake):
    """The gap being closed, pinned: a plain mergeSchema read across
    the drifted snapshots fails (if a future Spark version starts
    merging primitive widenings, this test flags that the helper can
    be retired)."""
    p1, p2, _ = lake
    with pytest.raises(Exception, match="CANNOT_MERGE_SCHEMAS|merge"):
        spark.read.option("mergeSchema", "true").parquet(p1, p2).schema


def test_widened_read_unions_all_snapshots_losslessly(spark, lake):
    df = read_with_type_widening(spark, *lake)
    assert isinstance(df.schema["n"].dataType, LongType)
    assert isinstance(df.schema["v"].dataType, DoubleType)
    got = {(r.n, r.v, r.lang) for r in df.collect()}
    # v1 rows surface with exact upcast values and NULL lang
    assert got == {
        (1, 1.5, None),
        (2, 2.5, None),
        (2**40, 0.1, "en"),
        (7, 0.25, "pt"),
    }


def test_widened_read_keeps_pushdown(spark, lake):
    """The per-snapshot conform is a projection over each scan — an
    equality filter on the widened column must still reach the parquet
    scans as a pushed filter."""
    df = read_with_type_widening(spark, *lake).filter(F.col("n") == 7)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert plan.count("IsNotNull(n)") >= 1
    assert df.count() == 1


def test_widening_lattice_and_decimal_join(spark):
    s1 = spark.createDataFrame([], "a byte, d decimal(10,2)").schema
    s2 = spark.createDataFrame([], "a long, d decimal(12,4)").schema
    w = widened_union_schema(s1, s2)
    assert isinstance(w["a"].dataType, LongType)
    # joint decimal: int digits max(8, 8)=8, scale max(2,4)=4 -> (12,4)
    assert w["d"].dataType == DecimalType(12, 4)


def test_decimal_widened_read_round_trips(spark, tmp_path):
    p1, p2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    spark.createDataFrame(
        [(Decimal("12345678.99"),)], "d decimal(10,2)"
    ).write.parquet(p1)
    spark.createDataFrame(
        [(Decimal("1.2345"),)], "d decimal(12,4)"
    ).write.parquet(p2)
    df = read_with_type_widening(spark, p1, p2)
    assert df.schema["d"].dataType == DecimalType(12, 4)
    assert {r.d for r in df.collect()} == {
        Decimal("12345678.9900"),
        Decimal("1.2345"),
    }


def test_incomparable_drift_fails_loudly(spark, tmp_path):
    """string-vs-int drift is a producer bug, not a widening — the
    reader must name the column instead of coercing."""
    p1, p2 = str(tmp_path / "x1"), str(tmp_path / "x2")
    spark.createDataFrame([(1,)], "k int").write.parquet(p1)
    spark.createDataFrame([("one",)], "k string").write.parquet(p2)
    with pytest.raises(ValueError, match="'k'.*incompatible"):
        read_with_type_widening(spark, p1, p2)
