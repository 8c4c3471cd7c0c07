"""Smoke-pin for tools/plan_audit.py: the signal extractor must keep
parsing Spark's formatted plans (a silent regex rot would turn PLANS.md
into a table of zeros that still *looks* generated)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))

from plan_audit import plan_signals  # noqa: E402

from etl_power_bi_dashboard_spark.plans import REGISTRY

from .conftest import SF_DIR


def test_plan_signals_extracts_known_shapes(spark):
    # h1: one filtered lineitem scan, partial+final agg -> exactly one
    # shuffle, a pushed ship-date filter, no joins/windows/python
    h1 = plan_signals(REGISTRY["h1_pricing_summary"].spark(spark, SF_DIR))
    assert h1["scans"] == 1 and h1["pushed"] == 1
    assert h1["exchanges"] == 1 and h1["cartesian"] == 0
    assert h1["python"] == 0 and h1["window"] == 0

    # j1: broadcast dim join must register at least one BroadcastExchange
    j1 = plan_signals(REGISTRY["j1_left_broadcast"].spark(spark, SF_DIR))
    assert j1["bcast"] >= 1 and j1["cartesian"] == 0

    # m1: the declared Arrow hop is visible as exactly one python node
    m1 = plan_signals(REGISTRY["m1_multimodal_features"].spark(spark, SF_DIR))
    assert m1["python"] == 1

    # w1: the rank window registers
    w1 = plan_signals(REGISTRY["w1_rank_per_group"].spark(spark, SF_DIR))
    assert w1["window"] >= 1
