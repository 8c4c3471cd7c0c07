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

# Driver-window priority (see module docstring). Names listed here come
# first, in this order; everything else follows in module order.
_PRIORITY = [
    # --- round-2 window: oracle-backed, no driver row yet ---------------
    # TPC-H analytical heavies (h12/h13/h16/h19 deferred — same join/agg
    # shapes as verified siblings)
    "h1_pricing_summary",
    "h2_min_cost_supplier",
    "h3_shipping_priority",
    "h4_order_priority",
    "h5_region_volume",
    "h6_forecast_revenue",
    "h7_volume_shipping",
    "h8_market_share",
    "h9_product_profit",
    "h10_returned_items",
    "h11_important_parts",
    "h14_promo_ratio",
    "h15_top_supplier",
    "h17_small_qty_revenue",
    "h18_large_volume",
    "h20_excess_suppliers",
    "h21_waiting_supplier",
    "h22_idle_customers",
    "a12_stats_exact",
    "e4_props_json",
    # MERGE / CDC
    "u1_scd1_merge",
    "u2_delete_detect",
    "u3_latest_per_key",
    # event-time windows (batch twins of the streaming surface)
    "e1_tumbling_hourly",
    "e2_sliding_windows",
    "e3_session_windows",
    "e5_funnel",
    # temporal joins
    "r1_asof_join",
    "r2_range_join",
    "r3_hierarchical_rollup",
    # text analysis + multimodal (x5 deferred — shares x6's tf machinery)
    "x1_token_count",
    "x2_quality",
    "x3_lang_guess",
    "x4_fingerprint",
    "x6_tfidf",
    "m1_multimodal_features",
    "m2_frame_sampling",
    "m3_label_centroids",
    # deduplication (d1b deferred — same groupBy shape as d1)
    "d1_dedup_exact",
    "d2_ngram_jaccard",
    "d3_minhash_lsh",
    "d4_simhash",
    "d4b_simhash_pairs",
    "d6_dup_clusters",
    "d7_cluster_representatives",
    # similarity search
    "v1_cosine_topk",
    "v2_ann_ivf",
    "v3_lsh_neardup",
    "d5_embedding_neardup",
    "v4_text_embedding_join",
    # --- just behind the window: rotate in round 3 ----------------------
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
    # --- driver-verified round 1 (CORRECTNESS_r01.json, 50/50 green) ----
    # follow in module order: core, windows, windows_more, g1, g2
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
