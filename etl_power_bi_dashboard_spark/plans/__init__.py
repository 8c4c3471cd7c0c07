"""Query registry: name → (spark plan builder, DuckDB oracle SQL)."""

from __future__ import annotations

from .base import Query
from . import (
    core,
    dedup_plans,
    events_plans,
    expressions,
    groupings,
    merge_plans,
    similarity_plans,
    stats_plans,
    temporal_plans,
    text_plans,
    tpch,
    tpch_more,
    tpch_rest,
    windows,
    windows_more,
)

_MODULES = [
    core,
    windows,
    windows_more,
    groupings,
    expressions,
    merge_plans,
    tpch,
    tpch_more,
    tpch_rest,
    events_plans,
    temporal_plans,
    text_plans,
    dedup_plans,
    similarity_plans,
    stats_plans,
]


def all_queries() -> dict[str, Query]:
    out: dict[str, Query] = {}
    for mod in _MODULES:
        for q in mod.QUERIES:
            if q.name in out:
                raise ValueError(f"duplicate query name: {q.name}")
            out[q.name] = q
    return out


REGISTRY: dict[str, Query] = all_queries()

__all__ = ["Query", "REGISTRY", "all_queries"]
