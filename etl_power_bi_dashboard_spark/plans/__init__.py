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

Round 5 rotation (current): slots 1-8 are the only entries with no
clean driver row — the 7 queries added during round 4 (recomputed
from CORRECTNESS_r01-r04 as COVERAGE.md instructs: r5/r6 gap-fill,
x14 PMI, d12 edit-distance ER, q5 PSI drift, a16 Gini, a17
cumulative-distinct — all oracle-backed) plus the new round-5
composition r7_asof_against_scd2 (point-in-time lookup against u4's
versioned dim, the verdict's requested shape). Slots 9+ backfill with
round-1/round-3 re-checks per the round-4 verdict: windows w1-w7 +
gap/islands + samplers, groupings/pivots g1-g3 + pv1/pv2, expression
wrappers f16-f18, then the §2 core (scan/projection/filters, the
j1-j3 joins, the a1-a11 aggregate family, f1/f2 coercions, top-k,
DAX measures). Round 4's note for the record: d6/d7's edge builder
gained a PPJoin PREFIX FILTER (not a df-cap — the repo's own builder
proved an absolute cap lossy on this corpus) and the r4 hash gate
re-proved it lossless against the uncapped oracle.

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
    # --- round-5 window, slots 1-8: the round-4 additions with no driver
    # row yet (recomputed from CORRECTNESS_r01-r04) plus this round's new
    # composition queries --------------------------------------------
    "r5_gapfill_locf",
    "r6_gapfill_interpolate",
    "x14_pmi_collocations",
    "d12_fuzzy_title_match",
    "q5_drift_psi",
    "a16_gini_concentration",
    "a17_cumulative_distinct",
    "r7_asof_against_scd2",
    # --- slots 9-26: round-1/round-3 re-checks — window functions,
    # samplers, groupings/pivots, expression wrappers ------------------
    "w1_rank_per_group",
    "w2_running_total",
    "w3_lag_delta",
    "w4_moving_avg",
    "w5_distribution",
    "w6_value_picks",
    "w7_range_frame",
    "r4_gap_islands",
    "p7_sample_mod",
    "p8_hash_split",
    "p9_stratified_sample",
    "g1_rollup",
    "g2_cube",
    "g3_grouping_sets",
    "pv1_pivot",
    "pv2_unpivot",
    "f16_string_ops",
    "f17_conditionals",
    "f18_null_safe_eq",
    # --- slots 27-50: §2 core re-checks (round-1 rows; golden suite pins
    # them locally, but the driver hash gate should re-prove the flagship
    # scan→join→aggregate path at least once post-round-1) --------------
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
    "dax_measures",
    # --- behind the window: t1_topk already carries r1+r3 rows, so
    # dax_measures (the §2.10 surface) takes the 50th re-check slot
    # instead and t1 follows in module order; everything already
    # driver-verified in CORRECTNESS_r01-r04 follows likewise
    # (f3_string_impute, next in line, keeps its r1 row + golden pin) ---
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
