"""Round-9 semantic-audit batch 27: hypothesis property laws for the
text-operator family vs an independent pure-Python reference over
ARBITRARY token sequences — empty tokens (multi-space runs), documents
of only spaces, unicode, stopword-only and stopword-free docs, tokens
shorter/longer than the shingle width. The crafted-string laws
(batches 1-26) pin specific cases; these pin the operators on the
whole input space the fixture can't reach.

The pure-Python twin mirrors Spark's split semantics exactly:
``text.split(" ")`` keeps empty strings, and ``"".split(" ") == [""]``
— the same contract as ``F.split(text, " ")``, so token counts can
never disagree on degenerate whitespace.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_power_bi_dashboard_spark.operators import text as T

_STOP = set(T.STOPWORDS)

# tokens: stopwords, plain words, unicode, and EMPTY (adjacent spaces)
_token = st.sampled_from(
    ["the", "a", "and", "of", "fox", "jumped", "zz", "é12", "naïve", ""]
)
_doc = st.lists(_token, min_size=0, max_size=12).map(" ".join)
_docs = st.lists(_doc, min_size=1, max_size=8)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_tokens(s: str) -> list[str]:
    return s.split(" ")


def _py_shingles(s: str, n: int) -> list[str]:
    t = _py_tokens(s)
    m = max(len(t) - (n - 1), 1)
    return [" ".join(t[i : i + n]) for i in range(m)]


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _profile_df(spark, docs):
    return spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )


@given(docs=_docs)
@_settings
def test_text_profile_matches_pure_python(spark, docs):
    """token_count / avg_token_len / stopword_ratio / quality_score /
    lang_guess / fingerprint_md5 (the x1/x2/x3/x4 component operators)
    vs an independent pure-Python computation."""
    rows = {r.doc_id: r for r in T.text_profile(_profile_df(spark, docs)).collect()}
    for i, d in enumerate(docs):
        t = _py_tokens(d)
        n = len(t)
        r = rows[i]
        assert r.n_chars == len(d)
        assert r.n_tokens == n
        nonspace = len(d.replace(" ", ""))
        atl = nonspace / n
        assert math.isclose(r.avg_token_len, atl, rel_tol=1e-12)
        sr = sum(1 for x in t if x in _STOP) / n
        assert math.isclose(r.stopword_ratio, sr, rel_tol=1e-12)
        q = 0.5 * sr + 0.3 * min(n / 40.0, 1.0) + 0.2 * min(atl / 6.0, 1.0)
        assert math.isclose(r.quality_score, q, rel_tol=1e-12)
        assert r.lang_guess == ("en" if sr > 0.05 else "unknown")
        assert r.fingerprint == _md5(d)


@given(docs=_docs, n=st.integers(2, 4))
@_settings
def test_word_shingles_and_fingerprint_match_pure_python(spark, docs, n):
    """word_shingles (d3/x4's shingling primitive): exactly the n-gram
    windows over split-keeping-empties tokens, with the <n-token
    degenerate case yielding one full-text shingle; shingle_fingerprint
    is the lexicographic min of the shingle md5s."""
    df = _profile_df(spark, docs).select(
        "doc_id",
        T.word_shingles(F.col("text"), n).alias("sh"),
        T.shingle_fingerprint(F.col("text"), n).alias("fp"),
    )
    rows = {r.doc_id: r for r in df.collect()}
    for i, d in enumerate(docs):
        want = _py_shingles(d, n)
        assert rows[i].sh == want
        assert rows[i].fp == min(_md5(s) for s in want)


@given(docs=_docs)
@_settings
def test_dup_word_fraction_matches_pure_python(spark, docs):
    """dup_word_fraction (x7's repetition signal): exact integer ratio
    (n_tokens - n_distinct) / n_tokens, empty tokens counted like any
    other token (split semantics, not content semantics)."""
    df = _profile_df(spark, docs).select(
        "doc_id", T.dup_word_fraction(F.col("text")).alias("dwf")
    )
    rows = {r.doc_id: r.dwf for r in df.collect()}
    for i, d in enumerate(docs):
        t = _py_tokens(d)
        want = (len(t) - len(set(t))) / len(t)
        assert math.isclose(rows[i], want, rel_tol=1e-12)
