"""Property differentials for the r12 operator batch.

Each test drives the DuckDB ORACLE against an independent pure-Python
replication on random crafted tables (the test_r11_property recipe).
The Spark side rides the registry-wide test_oracle differential and the
driver sims; these guard the SHARED semantics — if both engines agreed
on a wrong answer, the brute force catches it.
"""

from __future__ import annotations

import hashlib
import math
from datetime import datetime

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from dbt_local_duckdb_deltalake_project_spark.operators import ORACLE


def _con_with(table_sql: str, rows, insert_sql: str):
    con = duckdb.connect()
    con.execute(table_sql)
    if rows:
        con.executemany(insert_sql, rows)
    return con


# ---------------------------------------------------------------------------
# agg_quantile_sketch_merge: sketch build + merge + tie-aware rank bound
# ---------------------------------------------------------------------------

_VALS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # month group
        st.integers(min_value=-500, max_value=500),  # cents (ties likely)
    ),
    min_size=1,
    max_size=120,
)


def _sketch_brute(pairs):
    groups: dict[int, list[int]] = {}
    for g, c in pairs:
        groups.setdefault(g, []).append(c)
    bnd = []  # (v, g, i, w)
    for g, vals in groups.items():
        vals.sort()
        n = len(vals)
        prev = 0
        for i in range(1, 65):
            ri = (i * n) // 64
            w = ri - prev
            prev = ri
            if w > 0:
                bnd.append((vals[ri - 1], g, i, w))
    bnd.sort(key=lambda t: (t[0], t[1], t[2]))
    nt = sum(len(v) for v in groups.values())
    ng = len(groups)
    n_b = len(bnd)
    allv = sorted(c for _, c in pairs)
    out = []
    for q in (250000, 500000, 750000, 900000):
        target = (q * nt + 999999) // 1000000
        cum = 0
        est = None
        for v, _g, _i, w in bnd:
            cum += w
            if cum >= target:
                est = v
                break
        cle = sum(1 for x in allv if x <= est)
        clt = sum(1 for x in allv if x < est)
        out.append(
            (
                q,
                nt,
                ng,
                n_b,
                est,
                cle * 1000000 // nt,
                clt * 1000000 // nt,
                15627 + (1000000 * ng) // nt,
                True,
            )
        )
    return out


@settings(max_examples=80, deadline=None, derandomize=True)
@given(_VALS)
def test_quantile_sketch_oracle_matches_brute_force(pairs):
    rows = [
        (datetime(2024, 1 + g, 1), c / 100.0) for g, c in pairs
    ]
    con = _con_with(
        "CREATE TABLE lineitem(l_shipdate TIMESTAMP,"
        " l_extendedprice DOUBLE)",
        rows,
        "INSERT INTO lineitem VALUES (?, ?)",
    )
    try:
        got = con.execute(ORACLE["agg_quantile_sketch_merge"]).fetchall()
    finally:
        con.close()
    assert got == _sketch_brute(pairs)
    # the bound boolean is a THEOREM for this sketch: check it really
    # holds (the oracle emits literal TRUE; the brute force re-proves
    # the inequality the Spark side computes)
    for q, nt, ng, _nb, _est, le, lt, bound, _ok in got:
        assert le >= q - 1
        assert lt <= q + bound


# ---------------------------------------------------------------------------
# llm_watermark_detect: greenlist z-test
# ---------------------------------------------------------------------------

_WDOC = st.lists(
    st.text(alphabet="abc ", min_size=0, max_size=40), min_size=1, max_size=6
)


def _watermark_brute(texts):
    out = []
    for i, s in enumerate(texts):
        toks = [w for w in s.split(" ") if w != ""]
        prs = list(zip(toks, toks[1:]))
        if not prs:
            continue
        g = sum(
            1
            for a, b in prs
            if hashlib.md5(f"{a}|{b}".encode()).hexdigest()[0] in "01234567"
        )
        T = len(prs)
        num = 2 * g - T
        out.append((i, T, g, num, num > 0 and num * num > 4 * T))
    return out


@settings(max_examples=120, deadline=None, derandomize=True)
@given(_WDOC)
def test_watermark_oracle_matches_brute_force(texts):
    con = _con_with(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR,"
        " lang VARCHAR, source VARCHAR, n_chars BIGINT)",
        [(i, s, len(s)) for i, s in enumerate(texts)],
        "INSERT INTO documents VALUES (?, ?, 'en', 'hyp', ?)",
    )
    try:
        got = con.execute(ORACLE["llm_watermark_detect"]).fetchall()
    finally:
        con.close()
    assert got == _watermark_brute(texts)


# ---------------------------------------------------------------------------
# llm_eval_pass_at_k: exact falling-factorial estimator
# ---------------------------------------------------------------------------

_NCHARS = st.lists(
    st.integers(min_value=0, max_value=30), min_size=1, max_size=40
)


def _passk_brute(n_chars):
    groups: dict[int, list[int]] = {}
    for i, nc in enumerate(n_chars):
        groups.setdefault(i // 8, []).append(nc)
    out = []
    for gid in sorted(groups):
        vals = groups[gid]
        n = len(vals)
        c = sum(1 for v in vals if v % 3 == 0)
        pass1 = c * 1000000 // n
        if n < 4:
            pass4 = None
        elif n - c < 4:
            pass4 = 1000000
        else:
            den = n * (n - 1) * (n - 2) * (n - 3)
            num = (n - c) * (n - c - 1) * (n - c - 2) * (n - c - 3)
            pass4 = (den - num) * 1000000 // den
            # falling factorials ARE the binomial ratio: cross-check
            # against math.comb (a second independent derivation)
            assert pass4 == (
                (math.comb(n, 4) - math.comb(n - c, 4))
                * 1000000
                // math.comb(n, 4)
            )
        out.append((gid, n, c, pass1, pass4))
    return out


@settings(max_examples=80, deadline=None, derandomize=True)
@given(_NCHARS)
def test_pass_at_k_oracle_matches_brute_force(n_chars):
    con = _con_with(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR,"
        " lang VARCHAR, source VARCHAR, n_chars BIGINT)",
        [(i, "x", nc) for i, nc in enumerate(n_chars)],
        "INSERT INTO documents VALUES (?, ?, 'en', 'hyp', ?)",
    )
    try:
        got = con.execute(ORACLE["llm_eval_pass_at_k"]).fetchall()
    finally:
        con.close()
    assert got == _passk_brute(n_chars)


# ---------------------------------------------------------------------------
# agg_att_nn_matching: 1-NN control matching with tie-to-preceding
# ---------------------------------------------------------------------------

_ORDERS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),  # month
        st.integers(min_value=0, max_value=200),  # cents
        st.booleans(),  # treated
        st.integers(min_value=1, max_value=7),  # outcome y
    ),
    min_size=1,
    max_size=40,
)


def _att_brute(rows):
    # rows: (okey, month, cents, treated, y) sorted by stratum
    strata: dict[int, list] = {}
    for okey, m, c, tr, y in rows:
        strata.setdefault(m, []).append((c, okey, tr, y))
    out = []
    for m in sorted(strata):
        lst = sorted(strata[m])
        n_tr = 0
        n_m = 0
        sd = 0
        for idx, (c, _k, tr, y) in enumerate(lst):
            if not tr:
                continue
            n_tr += 1
            prev = next(
                (
                    (c2, y2)
                    for c2, _k2, t2, y2 in reversed(lst[:idx])
                    if not t2
                ),
                None,
            )
            nxt = next(
                ((c2, y2) for c2, _k2, t2, y2 in lst[idx + 1 :] if not t2),
                None,
            )
            if prev is None and nxt is None:
                continue
            if nxt is None:
                ym = prev[1]
            elif prev is None:
                ym = nxt[1]
            elif c - prev[0] <= nxt[0] - c:
                ym = prev[1]
            else:
                ym = nxt[1]
            n_m += 1
            sd += y - ym
        if n_tr == 0:
            continue  # no treated rows -> the stratum emits no row
        if n_m == 0:
            att = None
        elif sd >= 0:
            att = sd * 1000000 // n_m
        else:
            att = -((-sd) * 1000000 // n_m)
        out.append(
            (datetime(2024, 1 + m, 1), n_tr, n_m, sd if n_m else None, att)
        )
    return out


@settings(max_examples=80, deadline=None, derandomize=True)
@given(_ORDERS)
def test_att_matching_oracle_matches_brute_force(orders):
    o_rows = []
    l_rows = []
    okey = 0
    brute_in = []
    for m, cents, treated, y in orders:
        okey += 1
        prio = "1-URGENT" if treated else "3-MEDIUM"
        o_rows.append(
            (okey, datetime(2024, 1 + m, 5), cents / 100.0, prio)
        )
        for j in range(y):
            l_rows.append((okey,))
        brute_in.append((okey, m, cents, treated, y))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE orders(o_orderkey BIGINT, o_orderdate TIMESTAMP,"
        " o_totalprice DOUBLE, o_orderpriority VARCHAR)"
    )
    con.executemany("INSERT INTO orders VALUES (?, ?, ?, ?)", o_rows)
    con.execute("CREATE TABLE lineitem(l_orderkey BIGINT)")
    con.executemany("INSERT INTO lineitem VALUES (?)", l_rows)
    try:
        got = con.execute(ORACLE["agg_att_nn_matching"]).fetchall()
    finally:
        con.close()
    want = [
        (m, nt, nm, sd, att)
        for m, nt, nm, sd, att in _att_brute(brute_in)
    ]
    # the oracle emits sum_diff NULL only when nothing matched; align
    got_n = [
        (m, nt, nm, sd if nm else None, att) for m, nt, nm, sd, att in got
    ]
    assert got_n == want
