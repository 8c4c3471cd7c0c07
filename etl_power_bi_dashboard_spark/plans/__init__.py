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

Round 6 rotation (current): slots 1-5 are the five queries built during
round 6 (r11 nearest as-of, q10 table fingerprint, e13 inter-arrival,
d15 keep-longest, p13 length buckets — the standing no-row-first rule).
Slot 6 is ``sc4_skew_report`` — round 5's only red row, an oracle-side
HUGEINT->float64 hasher artifact fixed by ``CAST(SUM(n) AS BIGINT)``
and re-proved via driver_sim before this rotation landed. Slots 7-23
are the 17 entries with no driver row in CORRECTNESS_r01-r05
(recomputed at rotation time: the late round-5 additions
a20/d13/d14/e12/m5/ml7/ml8/q8/q9/r10/sc5/t3/u7/x20-x23). Slots 24-47
are the §2 core flagship re-checks deferred from round 5 (s1, p1-p5,
j1-j3, a1-a11, f1/f2, dax_measures, f18). Slots 48-50 backfill with
the set ops (round-1-only rows); the five round-6 additions displaced
q2-q4/q1/t1, which must front round 7's backfill. Historical rotation
details for rounds 1-5 live in COVERAGE.md.

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
    # === ROUND-6 WINDOW ==============================================
    # --- slots 1-5: the queries added during the round-6 build itself
    # (standing no-row-first rule: new queries front the window; each
    # displaces one backfill re-check slot at the bottom — with 5 new,
    # q2-q4/q1/t1 slip behind the window and must front round 7's
    # backfill together with the never-re-checked r3 cohort) ----------
    "r11_asof_nearest",
    "q10_table_fingerprint",
    "e13_interarrival",
    "d15_keep_longest",
    "p13_length_buckets",
    # --- slot 6: sc4, the round-5 window's only red row. The
    # plan was already bit-exact (judge driver_sim replay); the oracle's
    # uncast SUM(n) HUGEINT -> fetchdf float64 was the hasher mismatch,
    # now CAST ... AS BIGINT (scale_plans.py SQL_SC4). Re-verified via
    # driver_sim at the driver's sf0.01 before this rotation landed. ---
    "sc4_skew_report",
    # --- slots 7-23: every entry with NO driver row in r01-r05,
    # recomputed from CORRECTNESS_r01-05.json at rotation time (the 17
    # late round-5 additions; all oracle-backed, all green in the
    # round-5 judge's local suite + pre-validated via driver_sim) -----
    "a20_mad",
    "d13_semantic_clusters",
    "d14_minhash_calibration",
    "e12_time_to_convert",
    "m5_audio_frames",
    "ml7_naive_bayes",
    "ml8_markov_eval",
    "q8_volume_anomaly",
    "q9_fk_audit",
    "r10_peak_concurrency",
    "sc5_distributed_row_number",
    "t3_keyset_page",
    "u7_snapshot_diff",
    "x20_chunk_split",
    "x21_bigram_score",
    "x22_temperature_mix",
    "x23_zipf_fit",
    # --- slots 24-47: the §2 core flagship re-checks deferred from
    # round 5 (last driver rows r1/r3; golden-replication pin
    # meanwhile) — scan, projections/filters, joins, all rollups, the
    # coercing parse + median impute, DAX measures, null-safe eq ------
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
    "f18_null_safe_eq",
    # --- slots 48-50: backfill. The original round-6 plan had eight
    # backfill slots (set ops, q2-q4, q1, t1); the five round-6 query
    # additions displaced all but the set ops, which keep their place as
    # the stalest cohort (round-1-only rows). q2-q4/q1/t1 follow BEHIND
    # the window in module order and must front round 7's backfill. ---
    "set_union",
    "set_intersect",
    "set_except",
    # --- behind the window: everything already driver-verified in
    # r01-r05 follows in module order, plus the LATE round-6
    # additions (a21_seasonality, x25_ngram_novelty, a22_trimmed_mean,
    # v5_label_coherence, m6_frame_dedup, v6_int8_recall, q11_benford,
    # sc6_range_partition_plan, v7_pq_adc, r12_calendarize,
    # a23_rfm_segments, a24_ewma, e14_top_paths, q12_expectations,
    # ml9_also_bought, v8_ivf_probe_sweep, x26_rake_keywords,
    # x27_burstiness, a25_yoy_growth, a26_cohort_ltv, a27_pareto_abc,
    # ml10_decision_stump, r13_business_days, e15_bounce_matrix,
    # x28_kl_divergence, x29_oov_rate, m7_scene_cuts, x30_heaps_fit,
    # a28_price_volume_mix, v9_mmr_rerank, e16_event_lateness,
    # q13_fanout_profile, e17_survival_horizons, d17_lsh_s_curve,
    # p15_leakage_safe_split, x31_tokenizer_fertility,
    # e18_growth_accounting, ml11_oner, r14_peak_window_overlap,
    # u9_bitemporal_lookup, q14_ks_test, a31_dow_hour_heatmap,
    # m8_vad_segments, r15_interval_coalesce, sc7_zone_map_skipping,
    # ml12_score_bias_auc, p16_lang_cap_sample, d16_containment_pairs,
    # ml13_gain_lift, ml14_pr_curve, a32_abc_xyz, e19_autocorrelation,
    # q15_pk_uniqueness, ml15_ols2, q16_sequence_gaps,
    # u10_scd_compaction, r16_pairwise_overlap —
    # each validated at sf0.001 + sf0.01 via driver_sim, no driver row
    # yet).
    # Round-7 must front the no-row entries (recompute from
    # CORRECTNESS_r01-r06 — expected: a21, x25, a22, v5, m6, v6, q11,
    # sc6, v7, r12, a23, a24, e14, q12, ml9, v8, x26, x27, a25, a26,
    # a27, ml10, r13, e15, x28, x29, m7, x30, a28, v9, e16, q13,
    # e17, d17, p15, x31, e18, ml11, r14, u9, q14, a31, m8, r15, sc7,
    # ml12, p16, d16, ml13, ml14, a32, e19, q15, ml15, q16, u10, r16).
    # NOTE: that no-row set is 56 entries — MORE than one 50-slot
    # window. Round 7 fronts the FIRST 50 of them (module order after
    # recompute) and rounds 8+ pick up the remainder plus the
    # displaced q2-q4/q1/t1 and the
    # never-re-checked r3 cohort (f3-f6, f15, t2, h12/h13/h16/h19,
    # d1b, x5, a13/a14, ml1, ax1-ax3) ---------------------------------
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
