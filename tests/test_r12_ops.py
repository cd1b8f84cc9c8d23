"""r12 operator edge-case differentials.

llm_unigram_lm_learn is pinned by a pure-Python replication of the
whole hard-EM pipeline (candidate vocab -> Laplace scores -> Viterbi by
mask enumeration with smallest-mask ties -> usage -> prune/re-score ->
round 2 -> top-20), driven against the DuckDB oracle on crafted and
random corpora, plus a hand-derivable structural case (a single
repeated word must be learned as ONE piece, not characters — fewer
pieces always wins when scores are comparable, since every piece pays
the +ln(T+V) constant).
"""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from dbt_local_duckdb_deltalake_project_spark.operators import ORACLE


def _lnq(x: int) -> int:
    # the house micros log quantization: 9-dp round then half-up micros
    y = round(math.log(x), 9)
    return math.floor(y * 1_000_000 + 0.5)


def _segments(s: str, mask: int):
    """Segments of s under cut bitmask: bit k set = cut between
    positions k+1 and k+2 (1-based), mirroring the bit_count prefix
    construction in the operator/oracle."""
    segs = []
    cur = s[0]
    for i in range(1, len(s)):
        if mask >> (i - 1) & 1:
            segs.append(cur)
            cur = s[i]
        else:
            cur += s[i]
    segs.append(cur)
    return segs


def _uni_brute(texts: list[str], top: int = 20):
    """Pure-Python hard-EM unigram-LM learner, the test's independent
    reference. texts are the SAMPLED docs (caller applies any doc_id
    filter); each is truncated to 12 chars like the operator."""
    docs = [t[:12] for t in texts if len(t) >= 1]
    if not docs:
        return []  # both engines yield an empty result on an empty sample
    v0: dict[str, int] = {}
    for s in docs:
        for n in range(1, 5):
            for p in range(len(s) - n + 1):
                piece = s[p : p + n]
                v0[piece] = v0.get(piece, 0) + 1
    v0 = {p: c for p, c in v0.items() if c >= 2 or len(p) == 1}

    def scores(vocab: dict[str, int]) -> dict[str, int]:
        tot = sum(vocab.values())
        v = len(vocab)
        base = _lnq(tot + v)
        return {p: base - _lnq(c + 1) for p, c in vocab.items()}

    def segment_usage(sc: dict[str, int]) -> dict[str, int]:
        usage: dict[str, int] = {}
        for s in docs:
            best = None
            for mask in range(1 << (len(s) - 1)):
                segs = _segments(s, mask)
                if any(len(g) > 4 or g not in sc for g in segs):
                    continue
                cost = sum(sc[g] for g in segs)
                if best is None or (cost, mask) < best[0]:
                    best = ((cost, mask), segs)
            assert best is not None  # single chars always in vocab
            for g in best[1]:
                usage[g] = usage.get(g, 0) + 1
        return usage

    u1 = segment_usage(scores(v0))
    v2 = dict(u1)
    for p in v0:
        if len(p) == 1:
            v2.setdefault(p, 0)
    sc2 = scores(v2)
    u2 = segment_usage(sc2)
    rows = sorted(u2.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
    return [
        (
            p,
            len(p),
            c,
            sc2[p],
            len(docs),
            len(v2),
            sum(u2.values()),
        )
        for p, c in rows
    ]


def _run_oracle(texts: list[str]):
    # crafted doc_ids all % 10 == 0 so the op's sample filter keeps all
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE documents(doc_id BIGINT, text VARCHAR,"
            " lang VARCHAR, source VARCHAR, n_chars BIGINT)"
        )
        con.executemany(
            "INSERT INTO documents VALUES (?, ?, 'en', 'hyp', ?)",
            [(i * 10, s, len(s)) for i, s in enumerate(texts)],
        )
        return con.execute(ORACLE["llm_unigram_lm_learn"]).fetchall()
    finally:
        con.close()


def test_unigram_brute_force_matches_oracle_crafted():
    texts = [
        "abab",  # repeated bigram structure
        "abab",
        "ababcdcd",  # mixes two repeated units
        "cdcd",
        "xyab",  # shared suffix piece
        "q",  # single char doc
        "",  # empty: excluded by the length filter
        "hello hello",  # 12-char cap exercises truncation ('hello hello'
        #                 is 11 chars, kept whole)
    ]
    assert _run_oracle(texts) == _uni_brute(texts)


def test_unigram_learns_whole_word_not_chars():
    # hand-derivable: every doc is the same 4-char word, so 'wxyz' is a
    # candidate (count >= 2) and the single-piece segmentation beats any
    # multi-piece one (each piece pays the +lnq(T+V) constant, and no
    # per-piece -lnq(cnt+1) discount can exceed it since cnt < T+V).
    texts = ["wxyz"] * 4
    got = _run_oracle(texts)
    brute = _uni_brute(texts)
    assert got == brute
    top = got[0]
    assert top[0] == "wxyz" and top[2] == 4  # piece, usage = all 4 docs
    # characters won no segmentation -> pruned-to-zero, absent from top
    assert all(r[0] != "w" for r in got[1:])


_DOC = st.text(alphabet="ab ", min_size=0, max_size=14)


@settings(max_examples=60, deadline=None, derandomize=True)
@given(st.lists(_DOC, min_size=1, max_size=6))
def test_unigram_oracle_matches_brute_force(texts):
    # random corpora dense in repeated substrings (3-char alphabet) —
    # exercises vocab pruning, mask tie-breaks, truncation, and the
    # empty/short-doc edges; the Spark side rides the registry-wide
    # test_oracle differential + the driver sims
    assert _run_oracle(texts) == _uni_brute(texts)
