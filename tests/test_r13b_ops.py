"""Pure-Python replications of the r13 batch-2 operators, driven
against the real (tiny-SF) fixture: an independent third
implementation cross-checks Spark (the driver sim already checks
Spark vs DuckDB — a differential alone would bless a bug both sides
share)."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from dbt_local_duckdb_deltalake_project_spark.operators import QUERIES


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in ("orders", "lineitem", "events", "documents"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return c


def trunc_div(a: int, b: int) -> int:
    """Spark div / DuckDB // semantics: truncation toward zero."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# -- graph_jaccard_similarity ------------------------------------------------


def test_jaccard_brute(spark, sf_dir, con):
    pairs = con.execute(
        "SELECT DISTINCT o_custkey, l_suppkey FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey"
    ).fetchall()
    by_c: dict[int, list[int]] = {}
    for c, s in pairs:
        by_c.setdefault(c, []).append(s)
    capped = {c: sorted(ss)[:8] for c, ss in by_c.items()}
    deg: dict[int, int] = {}
    inter: dict[tuple[int, int], int] = {}
    for ss in capped.values():
        for s in ss:
            deg[s] = deg.get(s, 0) + 1
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                k = (ss[i], ss[j])
                inter[k] = inter.get(k, 0) + 1
    rows = [
        (
            s1,
            s2,
            sh,
            deg[s1],
            deg[s2],
            (sh * 1_000_000) // (deg[s1] + deg[s2] - sh),
        )
        for (s1, s2), sh in inter.items()
    ]
    rows.sort(key=lambda r: (-r[5], r[0], r[1]))
    want = rows[:20]
    got = [
        tuple(r)
        for r in QUERIES["graph_jaccard_similarity"](spark, sf_dir).collect()
    ]
    assert got == want


# -- llm_best_of_n -----------------------------------------------------------


def test_best_of_n_brute(spark, sf_dir, con):
    docs = con.execute(
        "SELECT doc_id, n_chars FROM documents ORDER BY doc_id"
    ).fetchall()
    groups: dict[int, list[tuple[int, int]]] = {}
    for d, r in docs:
        groups.setdefault(d // 8, []).append((d, r))
    want = []
    for g in sorted(groups):
        mem = groups[g]
        n = len(mem)
        s = sum(r for _, r in mem)
        bd, br = min(mem, key=lambda t: (-t[1], t[0]))
        mean = (1_000_000 * s) // n
        want.append((g, n, bd, br, mean, 1_000_000 * br - mean))
    got = [
        tuple(r) for r in QUERIES["llm_best_of_n"](spark, sf_dir).collect()
    ]
    assert got == want


# -- agg_logrank_test --------------------------------------------------------


def test_logrank_brute(spark, sf_dir, con):
    users = con.execute(
        "SELECT user_id, MIN(ts), MAX(ts) FROM events GROUP BY user_id"
    ).fetchall()
    import datetime

    cut = datetime.datetime(2024, 1, 28)
    strata: dict[int, dict[int, list[int]]] = {}
    for uid, t0, t1 in users:
        grp = uid % 2
        st = (uid // 2) % 3
        dur = (t1.date() - t0.date()).days
        observed = t1 < cut
        strata.setdefault(st, {}).setdefault(dur, []).append(
            (grp, observed)
        )
    want = []
    for st in sorted(strata):
        durs = sorted(strata[st])
        # reversed risk sets
        o1 = e1 = v = 0
        n_steps = len(durs)
        for k, dur in enumerate(durs):
            at_risk = [
                m for d2 in durs[k:] for m in strata[st][d2]
            ]
            n = len(at_risk)
            n1 = sum(1 for g, _ in at_risk if g == 1)
            here = strata[st][dur]
            d = sum(1 for _, obs in here if obs)
            d1 = sum(1 for g, obs in here if obs and g == 1)
            o1 += d1
            e1 += (d * n1 * 1_000_000) // n
            if n > 1:
                v += (d * n1 * (n - n1) * (n - d) * 1_000_000) // (
                    n * n * (n - 1)
                )
        num = 1_000_000 * o1 - e1
        z2 = (num * num) // v if v > 0 else None
        sig = (z2 > 3_841_459) if v > 0 else None
        want.append((st, n_steps, o1, e1, v, z2, sig))
    got = [
        tuple(r) for r in QUERIES["agg_logrank_test"](spark, sf_dir).collect()
    ]
    assert got == want


# -- agg_regression_discontinuity --------------------------------------------


def test_rdd_brute(spark, sf_dir, con):
    rows = con.execute(
        """
        SELECT o.o_totalprice, l.y FROM orders o
        JOIN (SELECT l_orderkey, COUNT(*) AS y FROM lineitem
              GROUP BY l_orderkey) l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_totalprice >= 100000 AND o.o_totalprice <= 200000
        """
    ).fetchall()
    sides: dict[str, list[tuple[int, int]]] = {"l": [], "r": []}
    for tp, y in rows:
        x = trunc_div(int(round(tp * 100)) - 15000000, 100)
        sides["l" if x < 0 else "r"].append((x, y))

    def fit(pts):
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        den = n * sxx - sx * sx
        na = sy * sxx - sx * sxy
        nb = n * sxy - sx * sy
        # the flooring pmod idiom == python floor division (den > 0)
        return n, (na * 10**6) // den, (nb * 10**9) // den

    n_l, a_l, b_l = fit(sides["l"])
    n_r, a_r, b_r = fit(sides["r"])
    want = [(n_l, n_r, a_l, a_r, a_r - a_l, b_l, b_r)]
    got = [
        tuple(r)
        for r in QUERIES["agg_regression_discontinuity"](
            spark, sf_dir
        ).collect()
    ]
    assert got == want


# -- mm_ocr_reading_order ----------------------------------------------------


def test_ocr_reading_order_brute(spark, sf_dir, con):
    docs = [
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM documents WHERE doc_id % 3 = 0"
            " ORDER BY doc_id"
        ).fetchall()
    ]
    want = []
    for m in docs:
        boxes = []
        for b in range(6 + m % 7):
            x = ((m * 7 + b * 13) % 3) * 400 + (m + b * 37) % 80
            y = (m * 11 + b * 29) % 900
            boxes.append((b, x, y))
        # columns: islands over x-sorted order with gap > 150
        xs = sorted(boxes, key=lambda t: (t[1], t[2], t[0]))
        col = {}
        cid = 0
        prev = None
        for b, x, y in xs:
            if prev is None or x - prev > 150:
                cid += 1
            col[b] = cid
            prev = x
        order = sorted(boxes, key=lambda t: (col[t[0]], t[2], t[1], t[0]))
        for rank, (b, x, y) in enumerate(order, 1):
            want.append((m, b, x, y, col[b], rank))
    got = [
        tuple(r)
        for r in QUERIES["mm_ocr_reading_order"](spark, sf_dir).collect()
    ]
    assert got == want


# -- llm_paragraph_dedup -----------------------------------------------------


def test_paragraph_dedup_brute(spark, sf_dir, con):
    docs = con.execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id"
    ).fetchall()
    paras: list[tuple[int, int, str]] = []
    for d, text in docs:
        ws = [w for w in text.split(" ") if w != ""]
        for blk in range((len(ws) + 9) // 10):
            paras.append((d, blk, " ".join(ws[blk * 10 : blk * 10 + 10])))
    owner: dict[str, int] = {}
    for d, blk, p in paras:
        k = d * 1_000_000 + blk
        h = hashlib.md5(p.encode()).hexdigest()
        owner[h] = min(owner.get(h, k), k)
    want = {}
    for d, _ in docs:
        mine = [(blk, p) for dd, blk, p in paras if dd == d]
        if not mine:
            continue  # empty text: no paragraphs, absent from output
        kept = [
            (blk, p)
            for blk, p in mine
            if owner[hashlib.md5(p.encode()).hexdigest()]
            == d * 1_000_000 + blk
        ]
        joined = " ".join(p for _, p in sorted(kept))
        want[d] = (
            len(mine),
            len(kept),
            hashlib.md5(joined.encode()).hexdigest(),
        )
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["kept_md5"])
        for r in QUERIES["llm_paragraph_dedup"](spark, sf_dir).collect()
    }
    assert got == want
    # the synthetic corpus repeats phrases: dedup must actually excise
    assert sum(n - k for n, k, _ in want.values()) > 0


# -- llm_bradley_terry_strength ----------------------------------------------


def test_bradley_terry_brute(spark, sf_dir, con):
    docs = con.execute(
        "SELECT doc_id, n_chars FROM documents ORDER BY doc_id"
    ).fetchall()
    groups: dict[int, list[tuple[int, int]]] = {}
    for d, r in docs:
        groups.setdefault(d // 8, []).append((d % 8, r))
    wins: dict[tuple[int, int], int] = {}
    n_ij: dict[tuple[int, int], int] = {}
    for mem in groups.values():
        mem = sorted(mem)
        for i in range(len(mem)):
            for j in range(i + 1, len(mem)):
                (pi, ri), (pj, rj) = mem[i], mem[j]
                wk = (pi, pj) if ri >= rj else (pj, pi)
                wins[wk] = wins.get(wk, 0) + 1
                for k in ((pi, pj), (pj, pi)):
                    n_ij[k] = n_ij.get(k, 0) + 1
    players = sorted({i for i, _ in n_ij})
    tot_n = {i: sum(n for (a, _), n in n_ij.items() if a == i) for i in players}
    tot_w = {
        i: sum(w for (a, _), w in wins.items() if a == i) for i in players
    }
    w = {i: 1_000_000 for i in players}
    hist = []
    for _ in range(2):
        nxt = {}
        for i in players:
            s = sum(
                (n_ij[(i, j)] * 10**12) // (w[i] + w[j])
                for j in players
                if (i, j) in n_ij
            )
            nxt[i] = (tot_w.get(i, 0) * 10**12) // s
        w = nxt
        hist.append(dict(w))
    want = [
        (i, tot_n[i], tot_w.get(i, 0), hist[0][i], hist[1][i])
        for i in players
    ]
    got = [
        tuple(r)
        for r in QUERIES["llm_bradley_terry_strength"](
            spark, sf_dir
        ).collect()
    ]
    assert got == want


# -- llm_wordpiece_apply -----------------------------------------------------


def test_wordpiece_apply_brute(spark, sf_dir, con):
    from tests.test_r13_ops import _wp_brute

    sample = [
        r[0]
        for r in con.execute(
            "SELECT text FROM documents WHERE doc_id % 10 = 1"
            " ORDER BY doc_id"
        ).fetchall()
    ]
    merges = [(r[1], r[2]) for r in _wp_brute(sample)]
    tok2marker: dict[str, str] = {}
    pats = []
    for rank, (lt, rt) in enumerate(merges, 1):
        pats.append(tok2marker.get(lt, lt) + tok2marker.get(rt, rt))
        tok2marker[lt + rt] = str(rank)
    docs = con.execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id"
    ).fetchall()
    want = []
    for d, text in docs:
        s = text
        row = [d, len(text)]
        for rank, pat in enumerate(pats, 1):
            nxt = s.replace(pat, str(rank))
            row.append(len(s) - len(nxt))
            s = nxt
        row.append(len(s))
        want.append(tuple(row))
    got = [
        tuple(r)
        for r in QUERIES["llm_wordpiece_apply"](spark, sf_dir).collect()
    ]
    assert got == want
