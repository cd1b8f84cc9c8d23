"""Property-based check for llm_dedup_span_removal's ORACLE.

The engine/oracle differential (driver sim, test_oracle.py) proves
Spark == DuckDB on the fixtures, and the crafted-fixture test pins six
hand-computed cases — but both could in principle share a bug on
shapes neither covers. This test drives the DuckDB side of the
contract against the independent pure-Python brute force from
test_r11_ops over ~150 RANDOM corpora drawn from a 2-token alphabet
(2^8 = 256 possible 8-grams, so cross-document gram collisions, exact
duplicates, overlapping and disjoint kill spans all occur naturally).
DuckDB evaluates in milliseconds per example, so the property sweep is
cheap; Spark parity rides on the existing differentials.
"""

from __future__ import annotations

import hashlib

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from dbt_local_duckdb_deltalake_project_spark.operators import ORACLE
from tests.test_r11_ops import _brute_force

_DOC = st.lists(
    st.sampled_from(["a", "b"]), min_size=0, max_size=30
).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=8)


@settings(max_examples=150, deadline=None, derandomize=True)
@given(_CORPUS, st.sampled_from([8, 9, 12, 16, 25]))
def test_span_removal_oracle_matches_brute_force(texts, min_span):
    # sweeps the min-span gate: T=8 is the ungated r11 semantics (every
    # merged region >= K goes), larger Ts exercise the survive branch;
    # docs are <= 30 tokens so T=16/25 leave most regions in place
    from dbt_local_duckdb_deltalake_project_spark.operators.llm_ops import (
        _span_removal_oracle,
    )

    docs = list(enumerate(texts))
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE documents(doc_id BIGINT, text VARCHAR,"
            " lang VARCHAR, source VARCHAR, n_chars BIGINT)"
        )
        con.executemany(
            "INSERT INTO documents VALUES (?, ?, 'en', 'hyp', ?)",
            [(i, s, len(s)) for i, s in docs],
        )
        got = {
            r[0]: (r[1], r[2], r[3], r[4])
            for r in con.execute(
                _span_removal_oracle(min_span)
            ).fetchall()
        }
    finally:
        con.close()
    want = {
        i: (n, s, r, hashlib.md5(clean.encode()).hexdigest())
        for i, (n, s, r, clean) in _brute_force(
            docs, min_span=min_span
        ).items()
    }
    assert got == want


_SHORT = st.lists(
    st.text(alphabet="ab", min_size=0, max_size=6), min_size=1, max_size=10
)


def _brute_affix(docs, extends):
    by_text: dict[str, list[int]] = {}
    for i, s in docs:
        by_text.setdefault(s, []).append(i)
    distinct = list(by_text)
    out = {}
    for s, ids in by_text.items():
        dup = any(u != s and extends(u, s) for u in distinct)
        rep = min(ids)
        for i in ids:
            out[i] = (len(ids), dup, (not dup) and i == rep)
    return out


def _run_affix_oracle(texts, qid):
    docs = list(enumerate(texts))
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE documents(doc_id BIGINT, text VARCHAR,"
            " lang VARCHAR, source VARCHAR, n_chars BIGINT)"
        )
        con.executemany(
            "INSERT INTO documents VALUES (?, ?, 'en', 'hyp', ?)",
            [(i, s, len(s)) for i, s in docs],
        )
        got = {
            r[0]: (r[1], r[2], r[3])
            for r in con.execute(ORACLE[qid]).fetchall()
        }
    finally:
        con.close()
    return docs, got


@settings(max_examples=200, deadline=None, derandomize=True)
@given(_SHORT)
def test_prefix_oracle_matches_brute_force(texts):
    # the global-order LEAD trick (a distinct text is a proper prefix
    # of some other iff its lexicographic successor extends it) vs the
    # all-pairs definition, on random corpora dense in prefix chains,
    # duplicates, and the empty string
    docs, got = _run_affix_oracle(texts, "llm_dedup_prefix")
    assert got == _brute_affix(docs, lambda u, s: u.startswith(s))


@settings(max_examples=200, deadline=None, derandomize=True)
@given(_SHORT)
def test_suffix_oracle_matches_brute_force(texts):
    docs, got = _run_affix_oracle(texts, "llm_dedup_suffix")
    assert got == _brute_affix(docs, lambda u, s: u.endswith(s))
