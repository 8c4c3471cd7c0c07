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

Round 4 rotation (current): slots 1-25 are the only entries with no
clean driver row — the 24 queries added during round 3 (recomputed
from CORRECTNESS_r01-r03 as COVERAGE.md instructs: x7-x13, d8-d11,
e6/e7, p10-p12, u4, a15, ax4/ax5, sc1/sc2, ml2, m4; of which
p12/ax4/ax5/ml2 are oracle-less rows-only) plus ax2_approx_quantiles,
whose round-3 row ERRORED on its array<double> column (now three
scalar doubles — must re-record). Slots 26-50 are round-2 re-checks:
d6/d7 FIRST (their edge builder gains a max_df cap this round — the
re-check proves the cap is lossless under the driver's hash gate),
then the TPC-H heavies + merge/events/temporal families per the
round-3 verdict. After round 4 every registry entry has a driver row
and each earlier window has been re-checked at least once.

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
    # --- round-4 window, slots 1-24: the round-3 additions with no
    # driver row yet (recomputed from CORRECTNESS_r01-r03) --------------
    "x7_repetition",
    "x8_pii_scrub",
    "x9_quality_cascade",
    "x10_source_mix",
    "x11_mixing_weights",
    "x12_unigram_score",
    "x13_token_budget",
    "d8_chunk_dedup",
    "d9_contamination",
    "d10_cross_source_contamination",
    "d11_incremental_dedup",
    "e6_retention_cohorts",
    "e7_value_outliers",
    "u4_scd2_history",
    "p10_quality_weighted_sample",
    "p11_sequence_pack",
    "a15_group_mode",
    "sc1_salted_join",
    "sc2_salted_agg",
    # oracle-less (driver records rows-only checks)
    "p12_greedy_pack",
    "ax4_countmin",
    "ax5_hll_merge",
    "ml2_pagerank",
    "m4_resize",
    # slot 25: round-3 row ERRORED (array column); re-record now that the
    # output is three scalar doubles
    "ax2_approx_quantiles",
    # --- slots 26-51: round-2 re-checks. d6/d7 first: their edge builder
    # gains a df-cap this round, so the hash gate must re-prove them ----
    "d6_dup_clusters",
    "d7_cluster_representatives",
    "d2_ngram_jaccard",
    "h1_pricing_summary",
    "h2_min_cost_supplier",
    "h3_shipping_priority",
    "h5_region_volume",
    "h7_volume_shipping",
    "h8_market_share",
    "h9_product_profit",
    "h17_small_qty_revenue",
    "h18_large_volume",
    "h20_excess_suppliers",
    "h21_waiting_supplier",
    "h22_idle_customers",
    "a12_stats_exact",
    "u1_scd1_merge",
    "u2_delete_detect",
    "u3_latest_per_key",
    "e1_tumbling_hourly",
    "e2_sliding_windows",
    "e3_session_windows",
    "e5_funnel",
    "r1_asof_join",
    "r2_range_join",
    # --- behind the window: everything already driver-verified in
    # CORRECTNESS_r01/r02/r03 follows in module order (r3_hierarchical_
    # rollup, next in line, keeps its r2 row) ---------------------------
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
