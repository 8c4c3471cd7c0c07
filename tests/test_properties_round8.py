"""Round-8 property-based additions (SURVEY §5.2): laws on ARBITRARY
inputs for the scale-rewrite operators whose fixture evidence only
covers the happy path — NULL join keys through the salted rewrites,
random graphs through connected components and triangle counting, and
the int8 quantizer's reconstruction bound.

The salted rewrites are semantics-preserving TRANSFORMS: any input
where `salted == plain` fails is a correctness bug no matter how
skewed or degenerate the data, which is exactly what hypothesis is
for (the fixture tests pin lineitem; these pin adversarial shapes —
duplicate rows, hot keys, NULL keys, NULL values).
"""

from __future__ import annotations

import pytest

import math
from collections import Counter, defaultdict
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_power_bi_dashboard_spark.operators import scale
from etl_power_bi_dashboard_spark.operators.graph import (
    connected_components,
    triangle_counts,
)
from etl_power_bi_dashboard_spark.operators.similarity import quantize_int8

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# rows: (key, value) with nullable keys AND values, tight key domain so
# hot keys and duplicate rows are common
_kv_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 3)),
        st.one_of(st.none(), st.integers(-100, 100)),
    ),
    min_size=1,
    max_size=25,
)


@given(rows=_kv_rows)
@_settings
@pytest.mark.slow
def test_salted_sum_equals_plain_on_adversarial_data(spark, rows):
    """salted_sum == plain groupBy().sum() for any data — NULL keys form
    their own group, NULL values are ignored by SUM, duplicate rows all
    land in ONE salt bucket (content hash) yet still sum correctly."""
    df = spark.createDataFrame(rows, "k int, v int")
    salted = {
        r.k: r.sum_v for r in scale.salted_sum(df, "k", "v").collect()
    }
    plain = {
        r.k: r["sum(v)"] for r in df.groupBy("k").sum("v").collect()
    }
    assert salted == plain


@given(
    big=_kv_rows,
    small=st.lists(
        st.tuples(st.one_of(st.none(), st.integers(0, 3)),
                  st.integers(0, 9)),
        min_size=0,
        max_size=8,
    ),
)
@_settings
@pytest.mark.slow
def test_salted_join_equals_plain_on_adversarial_data(spark, big, small):
    """salted_join == plain inner equi-join as a MULTISET for any data:
    NULL keys never match (on either side), duplicate small-side keys
    fan out with full multiplicity, and the _salt plumbing column never
    leaks into the result."""
    bdf = spark.createDataFrame(big, "k int, v int")
    sdf = spark.createDataFrame(
        [(k, d) for k, d in small], "k int, d int"
    )
    out = scale.salted_join(bdf, sdf, "k", salt_buckets=4)
    assert "_salt" not in out.columns
    got = Counter((r.k, r.v, r.d) for r in out.collect())
    expect = Counter()
    small_by_key = defaultdict(list)
    for k, d in small:
        if k is not None:
            small_by_key[k].append(d)
    for k, v in big:
        if k is None:
            continue
        for d in small_by_key.get(k, []):
            expect[(k, v, d)] += 1
    assert got == expect


@given(
    members=st.sets(st.integers(-50, 50), min_size=1, max_size=30),
    probes=st.sets(st.integers(-50, 50), min_size=0, max_size=30),
)
@_settings
@pytest.mark.slow
def test_bloom_prune_never_drops_a_member(spark, members, probes):
    """Bloom soundness on arbitrary (incl. negative) keys: every probe
    row whose key is a member survives pruning, and pruning never
    invents rows."""
    keys = spark.createDataFrame([(k,) for k in members], "k bigint")
    big = spark.createDataFrame([(k,) for k in probes], "k bigint")
    pruned = {
        r.k for r in scale.bloom_prune(
            big, scale.bloom_build(keys, "k"), "k"
        ).collect()
    }
    assert pruned >= (probes & members)
    assert pruned <= probes


@given(
    edges=st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), max_size=20
    ),
    isolates=st.sets(st.integers(10, 14), max_size=3),
)
@_settings
def test_connected_components_matches_union_find(spark, edges, isolates):
    """Min-label components on a random graph == a from-scratch
    union-find (self-loops tolerated, isolates become singletons)."""
    nodes = sorted(
        {n for e in edges for n in e} | isolates
    )
    if not nodes:
        nodes = [0]
    ndf = spark.createDataFrame([(n,) for n in nodes], "id bigint")
    edf = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(nodes[0], nodes[0])],
        "src bigint, dst bigint",
    )
    got = {
        r.node: r.label
        for r in connected_components(ndf, edf, node_col="id").collect()
    }
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = defaultdict(set)
    for n in nodes:
        comp[find(n)].add(n)
    expect = {n: min(ms) for ms in comp.values() for n in ms}
    assert got == expect


@given(
    edges=st.sets(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(
            lambda e: e[0] != e[1]
        ),
        max_size=16,
    )
)
@_settings
@pytest.mark.slow
def test_triangle_counts_match_bruteforce(spark, edges):
    """Per-node triangle participation on a random graph == the literal
    3-subset enumeration (edges deduped as undirected pairs)."""
    und = {tuple(sorted(e)) for e in edges}
    if not und:
        und = {(0, 1)}
    edf = spark.createDataFrame(sorted(und), "src bigint, dst bigint")
    got = {r[0]: r[1] for r in triangle_counts(edf).collect()}
    nodes = sorted({n for e in und for n in e})
    expect = Counter()
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= und:
            expect[a] += 1
            expect[b] += 1
            expect[c] += 1
    # operators may omit zero-triangle nodes; compare on the support
    assert {k: v for k, v in got.items() if v} == dict(expect)


@given(
    vec=st.lists(
        st.floats(-10, 10, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=16,
    )
)
@_settings
def test_quantize_int8_reconstruction_bound(spark, vec):
    """Quantizer law: codes are integers in [-127, 127] and
    |x - code*scale| <= scale/2 with scale = max(max|x|, 1e-30)/127 —
    the defining bound of symmetric round-to-nearest quantization."""
    df = spark.createDataFrame([(vec,)], "v array<double>")
    [row] = df.select(quantize_int8(F.col("v")).alias("q")).collect()
    scale_ = max(max(abs(x) for x in vec), 1e-30) / 127.0
    assert len(row.q) == len(vec)
    for x, code in zip(vec, row.q):
        code = float(code)
        assert -127.0 <= code <= 127.0
        assert code == math.floor(x / scale_ + 0.5)
        assert abs(x - code * scale_) <= scale_ / 2 + 1e-12


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(0, 20),
            st.integers(0, 99),
        ),
        min_size=1,
        max_size=30,
    )
)
@_settings
@pytest.mark.slow
def test_partitioned_distributed_row_number_matches_global_window(
    spark, rows
):
    """The partition_cols path (p16's per-language ranking) must equal
    ROW_NUMBER() OVER (PARTITION BY p ORDER BY v, id) on arbitrary data,
    for any monotone bucketing of the leading sort key — including
    buckets holding many ties and partitions collapsing to one bucket."""
    data = [(p, v, i) for i, (p, v, _) in enumerate(rows)]
    df = spark.createDataFrame(data, "p string, v int, id int")
    out = scale.distributed_row_number(
        df,
        bucket=F.expr("v DIV 4"),
        order_cols=["v", "id"],
        partition_cols=["p"],
        rn_alias="rn",
    )
    got = {(r.p, r.id): r.rn for r in out.collect()}
    expect = {}
    by_p = defaultdict(list)
    for p, v, i in data:
        by_p[p].append((v, i))
    for p, recs in by_p.items():
        for rk, (_, i) in enumerate(sorted(recs), start=1):
            expect[(p, i)] = rk
    assert got == expect
