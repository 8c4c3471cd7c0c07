"""Audit-coverage ratchet: every registry query must be pinned by a
brute-force/property LAW test (the semantic-audit program, batches
1-26) or carry a justified entry in the allowlist below.

The driver's differential hash gate proves Spark == DuckDB, but not
that the shared formula is RIGHT — round 7/8 audits found seven
both-engines-wrong bugs the gate called green. This meta-test makes
the law-test discipline structural: a new registry entry fails here
until someone writes its law test or consciously allowlists it with a
reason.
"""

from __future__ import annotations

import pathlib
import re

from etl_power_bi_dashboard_spark.plans import REGISTRY

TESTS = pathlib.Path(__file__).parent

# Queries exempt from the law-test requirement, each with the stronger
# or equivalent evidence that replaces it.
ALLOWLIST = {
    # Golden bit-for-bit replication of the reference's committed
    # output tables (tests/test_olist_golden.py) — independent evidence
    # from a THIRD engine (the original pandas pipeline), stronger than
    # a reimplemented law.
    "a1_sales_by_date", "a2_sales_by_month", "a3_sales_by_category",
    "a4_sales_by_state", "a5_sales_by_city", "a6_sales_by_seller",
    "a7_review_distribution", "a8_global_minmax", "a9_nps",
    "dax_measures", "f2_median_impute", "f3_string_impute",
    "f4_date_parts", "f5_days_between", "f6_flag_coalesce",
    "f15_date_dim", "j1_left_broadcast", "j2_inner_fact",
    "j3_left_fillzero",
    # Structural mirrors: the Spark plan and the oracle SQL are the
    # same trivial expression (a projection/filter/count with no
    # formula to misdefine); the differential gate IS the law.
    "a10_count_by_value", "f16_string_ops", "f17_conditionals",
    "f18_null_safe_eq", "p4_filter_in", "p5_rename",
    # Operator-level brute force under another name: the registry entry
    # wraps an operator whose law lives in an operator-keyed test.
    "ml3_triangle_count",  # triangle_counts vs 3-subset enumeration
                           # (test_properties_round8) + textbook
                           # three-way self-join oracle (test_graph_ops)
    "q1_fk_orphans",       # fk_violations orphan sets on crafted data
                           # (test_pipeline quality gates)
}

_LAW_FILES = [
    p for p in TESTS.glob("test_*.py")
    if "semantic" in p.name or "properties" in p.name or "fuzz" in p.name
    or p.name in (
        "test_oracle_less_laws.py", "test_stats.py", "test_clustering.py",
        "test_graph_ops.py", "test_packing.py", "test_sampling.py",
    )
]


def test_every_registry_query_has_a_law_or_an_allowlist_reason():
    law_text = "".join(p.read_text() for p in _LAW_FILES)

    def covered(name: str) -> bool:
        if name in law_text:
            return True
        tok = name.split("_")[0]
        return bool(
            re.search(rf"(?<![a-z0-9]){tok}(?![a-z0-9])", law_text, re.I)
        )

    missing = sorted(
        q for q in REGISTRY if q not in ALLOWLIST and not covered(q)
    )
    assert missing == [], (
        f"registry queries without a semantic-audit law test: {missing} — "
        "write a brute-force law (tests/test_round*_semantics*.py) or "
        "allowlist with a justification"
    )
    # the allowlist may only shrink relative to the registry: entries
    # for queries that no longer exist are stale and must be removed
    stale = sorted(ALLOWLIST - set(REGISTRY))
    assert stale == [], f"stale allowlist entries: {stale}"
