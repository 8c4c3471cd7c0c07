"""Query registry: name → (spark plan builder, DuckDB oracle SQL).

Registry ORDER is a driver-facing contract: the correctness driver
verifies a fixed-size window from the FRONT of the registry each round
(round 1 covered exactly the first 50 entries). ``_PRIORITY`` therefore
rotates not-yet-driver-verified queries to the front:

- round 1 verified the 50 entries of core/windows/windows_more/g1/g2
  (all green in ``CORRECTNESS_r01.json``); those are pinned locally by
  the golden-replication + DuckDB-parity suites and move to the BACK;
- the 50 slots now hold the oracle-backed families with no driver row
  yet (TPC-H h*, merge u*, events e*, temporal r*, text x*/m*, dedup
  d*, similarity v*);
- 14 low-risk oracle-backed queries (scalar expression wrappers,
  variants sharing verified code paths) plus the 4 deliberately
  oracle-less ones (ml1, ax1–ax3 — rows-only checks) sit just behind
  the window and rotate in next round.

Round 3 rotation: the 14 deferred oracle-backed queries plus the 4
oracle-less ones (driver records rows-only checks for those) take the
front of the window; the remaining ~32 slots re-check round-1 core
entries (regression evidence on the golden-pinned §2 surface). After
round 3 every entry that existed at rotation time has a driver row;
queries added later in round 3 (x7-x13, d8-d11, e6/e7, p10-p12,
ax4/ax5, a15, sc1/sc2, ml2, m4, u4 — repetition filters, PII scrub,
quality cascade, source mix, mixing-weight solver, unigram LM score,
token budgeting, chunk dedup, decontamination, cross-source
contamination, incremental dedup, cohort retention, z-score outliers,
quality-weighted sampling, sequence packing (+ greedy report),
count-min sketch, mergeable HLL rollup, group mode, salted join/agg,
PageRank, resize plumbing, SCD-2 history) sit behind the window with
local sf0.001/sf0.01 parity and rotate in next round; COVERAGE.md
records the authoritative round-4 rotation list.

Every query keeps its local sf0.001 DuckDB parity test regardless of
position (tests/test_oracle_parity.py covers the whole registry).
"""

from __future__ import annotations

from .base import Query
from . import (
    core,
    dedup_plans,
    events_plans,
    expressions,
    groupings,
    merge_plans,
    scale_plans,
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
    scale_plans,
]

# Driver-window priority (see module docstring). Names listed here come
# first, in this order; everything else follows in module order.
_PRIORITY = [
    # --- round-3 window, slots 1-18: the last entries without a driver
    # row (14 oracle-backed + 4 oracle-less rows-only) ------------------
    "h12_priority_case",
    "h13_custdist",
    "h16_supplier_count",
    "h19_disjunctive",
    "d1b_dedup_prefix",
    "x5_top_terms",
    "f16_string_ops",
    "f17_conditionals",
    "f18_null_safe_eq",
    "pv2_unpivot",
    "g3_grouping_sets",
    "pv1_pivot",
    "a13_histogram",
    "a14_percentiles_disc",
    # oracle-less (driver records rows-only checks)
    "ml1_kmeans",
    "ax1_approx_distinct",
    "ax2_approx_quantiles",
    "ax3_freq_items",
    # --- slots 19-50: round-1 re-checks (golden-pinned §2 core; green in
    # CORRECTNESS_r01.json — re-driven for regression evidence) ---------
    "s1_scan",
    "p1_projection",
    "p2_filter_eq",
    "p3_filter_range",
    "p4_filter_in",
    "p5_rename",
    "j1_left_broadcast",
    "j2_inner_fact",
    "j3_left_fillzero",
    "a1_sales_by_date",
    "a2_sales_by_month",
    "a3_sales_by_category",
    "a4_sales_by_state",
    "a5_sales_by_city",
    "a6_sales_by_seller",
    "a7_review_distribution",
    "a8_global_minmax",
    "a9_nps",
    "a10_count_by_value",
    "a11_distinct",
    "f1_to_timestamp",
    "f2_median_impute",
    "f3_string_impute",
    "f4_date_parts",
    "f5_days_between",
    "f6_flag_coalesce",
    "f15_date_dim",
    "t1_topk",
    "t2_limit",
    "dax_measures",
    "q1_fk_orphans",
    "w2_running_total",
    # --- behind the window: everything already driver-verified in
    # CORRECTNESS_r01/r02 follows in module order -----------------------
]


def all_queries() -> dict[str, Query]:
    collected: dict[str, Query] = {}
    for mod in _MODULES:
        for q in mod.QUERIES:
            if q.name in collected:
                raise ValueError(f"duplicate query name: {q.name}")
            collected[q.name] = q
    missing = [n for n in _PRIORITY if n not in collected]
    if missing:
        raise ValueError(f"_PRIORITY names not in registry: {missing}")
    out: dict[str, Query] = {n: collected[n] for n in _PRIORITY}
    for name, q in collected.items():
        if name not in out:
            out[name] = q
    return out


REGISTRY: dict[str, Query] = all_queries()

__all__ = ["Query", "REGISTRY", "all_queries"]
