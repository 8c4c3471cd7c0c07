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

Round 5 rotation (current): slots 1-32 are EVERY entry with no clean
driver row, recomputed from CORRECTNESS_r01-r04 at rotation time —
the 7 queries added during round 4 (r5/r6 gap-fill, x14 PMI, d12
edit-distance ER, q5 PSI drift, a16 Gini, a17 cumulative-distinct),
the r7_asof_against_scd2 composition the round-4 verdict requested,
and the 24 queries added during the round-5 build itself (temporal
r8/r9, text x15-x19, events e8-e11, merge u5/u6, sampling p14, stats
a18/a19/q6/q7, ml3-ml6, scale sc3/sc4) — all oracle-backed. Slots
33-50 backfill with round-1/round-3 re-checks per the round-4
verdict: windows w1-w7 + gap/islands + samplers p7-p9,
groupings/pivots g1-g3 + pv1/pv2, expression wrappers f16/f17. The
§2 core flagship path re-checks move to round 6 (they hold r1 driver
rows and the golden-replication pin meanwhile). Round 4's note for
the record: d6/d7's edge builder
gained a PPJoin PREFIX FILTER (not a df-cap — the repo's own builder
proved an absolute cap lossy on this corpus) and the r4 hash gate
re-proved it lossless against the uncapped oracle.

Queries added after the rotation sit BEHIND the window in module order
and front the round-6 window per the standing no-row-first rule; do NOT
maintain a hand-list here (hand-lists went stale within single rounds,
twice) — recompute as ``[q for q in REGISTRY if no row in
CORRECTNESS_r01-r05]`` at rotation time. All round-5 late additions are
oracle-backed and each was verified at sf0.001 AND the driver's sf0.01
via tools/driver_sim.py before committing.

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
    # --- round-5 window, slots 1-32: EVERY entry with no driver row in
    # CORRECTNESS_r01-r04, recomputed at rotation time. The original
    # round-5 plan fronted only the 7 round-4 additions + r7, but the
    # round-5 build added 24 more oracle-backed queries before the
    # driver ran — deferring them to round 6 would leave 24 implemented
    # operators without evidence for a whole round, so the window fronts
    # all 32 and the re-check backfill shrinks to 18 slots (the §2 core
    # re-checks move to round 6; they keep r1 rows + the golden pin).
    "r5_gapfill_locf",
    "r6_gapfill_interpolate",
    "x14_pmi_collocations",
    "d12_fuzzy_title_match",
    "q5_drift_psi",
    "a16_gini_concentration",
    "a17_cumulative_distinct",
    "r7_asof_against_scd2",
    "r8_resample_ohlc",
    "r9_asof_forward",
    "x15_winnowing",
    "x16_doc_entropy",
    "x17_bm25",
    "x18_cooccurrence",
    "x19_lang_confusion",
    "e8_transition_matrix",
    "e9_rolling_zscore",
    "e10_attribution",
    "e11_rolling_active_users",
    "u5_incremental_rollup",
    "u6_apply_cdc",
    "p14_weighted_reservoir",
    "a18_corr_matrix",
    "a19_percentiles_cont",
    "q6_profile_summary",
    "q7_chi2_independence",
    "ml3_triangle_count",
    "ml4_knn_classify",
    "ml5_linreg_trend",
    "ml6_ab_proportion_test",
    "sc3_bloom_prune_join",
    "sc4_skew_report",
    # --- slots 33-50: round-1/round-3 re-checks — window functions,
    # gap/islands, samplers, groupings/pivots, expression wrappers.
    # f18_null_safe_eq stays behind the window in module order (it
    # keeps its r3 driver row; the f16/f17 re-checks cover the
    # expression-wrapper code path) -----------------------------------
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
    # --- behind the window: everything already driver-verified in
    # CORRECTNESS_r01-r04 follows in module order (the §2 core
    # scan/join/aggregate flagship path re-checks in round 6) ---------
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
