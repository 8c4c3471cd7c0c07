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

Round 7 rotation (current): all 50 slots are the first 50 of the 57
entries with no driver row in CORRECTNESS_r01-r06 (the late round-6
additions), recomputed from the JSON files at rotation time. The 7
overflow entries (a25, a26, q11, a22, a21, sc7, sc6) plus the
displaced round-1-only re-checks (q2-q4, q1, t1) and the
never-re-checked r3 cohort front round 8. Historical rotation details
for rounds 1-6 live in COVERAGE.md.

Queries added after the rotation sit BEHIND the window in module order
and front the NEXT round's window per the standing no-row-first rule;
do NOT maintain a hand-list of no-row entries across rounds (hand-lists
went stale within single rounds, twice) — recompute as ``[q for q in
REGISTRY if no row in CORRECTNESS_r01-r06]`` at rotation time. Every
round-6 addition was verified at sf0.001 AND the driver's sf0.01 via
tools/driver_sim.py before committing, and the final 50-slot window was
re-validated 50/50 green as a whole.

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
    # === ROUND-7 WINDOW ==============================================
    # Slots 1-50: the FIRST 50 of the 57 entries with NO driver row in
    # CORRECTNESS_r01-r06 (recomputed at rotation time per the standing
    # no-hand-list rule; ordering is registry/module order at
    # recompute). All 57 are late round-6 additions, each already
    # validated at sf0.001 AND the driver's sf0.01 via
    # tools/driver_sim.py during round 6, plus a pure-Python law test.
    # This window converts the newest ~22% of the registry from
    # builder-side evidence to driver evidence (VERDICT r6 item 1).
    "p16_lang_cap_sample",
    "p15_leakage_safe_split",
    "u10_scd_compaction",
    "u9_bitemporal_lookup",
    "e19_autocorrelation",
    "a31_dow_hour_heatmap",
    "e18_growth_accounting",
    "e17_survival_horizons",
    "e16_event_lateness",
    "e15_bounce_matrix",
    "e14_top_paths",
    "r16_pairwise_overlap",
    "r15_interval_coalesce",
    "r14_peak_window_overlap",
    "r13_business_days",
    "r12_calendarize",
    "m7_scene_cuts",
    "x31_tokenizer_fertility",
    "m8_vad_segments",
    "x30_heaps_fit",
    "x28_kl_divergence",
    "x29_oov_rate",
    "x26_rake_keywords",
    "x27_burstiness",
    "x25_ngram_novelty",
    "m6_frame_dedup",
    "d16_containment_pairs",
    "d17_lsh_s_curve",
    "v9_mmr_rerank",
    "v8_ivf_probe_sweep",
    "ml9_also_bought",
    "v7_pq_adc",
    "v6_int8_recall",
    "v5_label_coherence",
    "q16_sequence_gaps",
    "ml15_ols2",
    "q15_pk_uniqueness",
    "a32_abc_xyz",
    "ml14_pr_curve",
    "ml13_gain_lift",
    "ml12_score_bias_auc",
    "q14_ks_test",
    "ml11_oner",
    "q13_fanout_profile",
    "a28_price_volume_mix",
    "a27_pareto_abc",
    "ml10_decision_stump",
    "a23_rfm_segments",
    "a24_ewma",
    "q12_expectations",
    # --- OVERFLOW -> ROUND 8: the no-row set is 57 entries, 7 more
    # than one window. The remaining 7 (module order at recompute:
    # a25_yoy_growth, a26_cohort_ltv, q11_benford, a22_trimmed_mean,
    # a21_seasonality, sc7_zone_map_skipping, sc6_range_partition_plan)
    # stay BEHIND this window (scattered in module order — position
    # behind slot 50 is irrelevant to the driver) and MUST front
    # round 8, together with the queries ADDED during round 7
    # (u11_cdc_net_effect, v10_filtered_ann, ml16_calibration — each
    # validated at sf0.001 + sf0.01 via driver_sim before committing),
    # followed by the displaced round-1-only re-checks
    # (q2-q4, q1, t1) and the never-re-checked r3 cohort (f3-f6, f15,
    # t2, h12/h13/h16/h19, d1b, x5, a13/a14, ml1, ax1-ax3). Recompute
    # the no-row set from CORRECTNESS_r01-r07 at round-8 rotation time
    # rather than trusting this comment. ------------------------------
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
