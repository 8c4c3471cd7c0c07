"""Sampling contracts: the stratified sample hits its exact per-stratum
rate, and assignment is invariant to repartitioning (content-determined,
like the hash split)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_power_bi_dashboard_spark.plans import REGISTRY
from etl_power_bi_dashboard_spark.plans.base import load

from .conftest import SF_DIR


def test_stratified_rate_exact(spark):
    sample = REGISTRY["p9_stratified_sample"].spark(spark, SF_DIR)
    got = {
        r.lang: r.n for r in sample.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    truth = {
        r.lang: r.n
        for r in load(spark, SF_DIR, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(got) == set(truth)
    for lang, n in truth.items():
        assert got[lang] == math.ceil(0.2 * n), lang


def test_stratified_assignment_content_determined(spark):
    """Same doc_ids selected regardless of input partitioning."""
    a = {
        r.doc_id
        for r in REGISTRY["p9_stratified_sample"].spark(spark, SF_DIR).collect()
    }
    docs = load(spark, SF_DIR, "documents").repartition(13)
    from pyspark.sql import Window

    order = [F.md5(F.col("text")), F.col("doc_id")]
    rk = F.row_number().over(Window.partitionBy("lang").orderBy(*order))
    n = F.count("*").over(Window.partitionBy("lang"))
    b = {
        r.doc_id
        for r in docs.select("doc_id", rk.alias("rk"), n.alias("sz"))
        .filter(F.col("rk") <= F.ceil(F.col("sz") * 0.2))
        .collect()
    }
    assert a == b
