"""Pure-Python replications of the late-r13 operators (nucleus stats,
scaling-law fit, embedding PCA power iteration, mediation), driven
against the tiny-SF fixture — the independent third implementation
beside the Spark/DuckDB differential."""

from __future__ import annotations

import math

import duckdb
import pytest

from dbt_local_duckdb_deltalake_project_spark.operators import QUERIES


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in ("orders", "lineitem", "documents", "embeddings"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return c


def _lnq(x: int) -> int:
    return math.floor(round(math.log(x), 9) * 1_000_000 + 0.5)


def round_half_away(x: float) -> int:
    """Spark ROUND / DuckDB ROUND on doubles: half away from zero."""
    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def _bigrams(docs):
    occ = []
    for d, text in docs:
        ws = [w for w in text.split(" ") if w != ""]
        occ += [(ws[p], ws[p + 1]) for p in range(len(ws) - 1)]
    return occ


def test_nucleus_brute(spark, sf_dir, con):
    docs = con.execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id"
    ).fetchall()
    pc: dict[tuple[str, str], int] = {}
    for v, w2 in _bigrams(docs):
        pc[(v, w2)] = pc.get((v, w2), 0) + 1
    by_v: dict[str, list[tuple[str, int]]] = {}
    for (v, w2), c in pc.items():
        by_v.setdefault(v, []).append((w2, c))
    rows = []
    for v, conts in by_v.items():
        conts.sort(key=lambda t: (-t[1], t[0]))
        c_v = sum(c for _, c in conts)
        cum = 0
        nucleus = 0
        for _, c in conts:
            if cum * 10 < 9 * c_v:
                nucleus += 1
            cum += c
        rows.append(
            (v, c_v, len(conts), nucleus, (conts[0][1] * 10**6) // c_v)
        )
    rows.sort(key=lambda r: (-r[1], r[0]))
    want = rows[:50]
    got = [
        tuple(r)
        for r in QUERIES["llm_nucleus_sampling_stats"](
            spark, sf_dir
        ).collect()
    ]
    assert got == want


def test_scaling_law_brute(spark, sf_dir, con):
    docs = con.execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id"
    ).fetchall()
    mx = max(d for d, _ in docs)
    pts = []
    for k in range(1, 9):
        cnt: dict[str, int] = {}
        for d, text in docs:
            if d * 8 <= mx * k:
                for w in text.split(" "):
                    if w != "":
                        cnt[w] = cnt.get(w, 0) + 1
        t_k = sum(cnt.values())
        terms = sum(c * (_lnq(t_k) - _lnq(c)) for c in cnt.values())
        pts.append((k, t_k, _lnq(t_k), terms // t_k))
    n = len(pts)
    sx = sum(p[2] for p in pts)
    sy = sum(p[3] for p in pts)
    sxx = sum(p[2] * p[2] for p in pts)
    sxy = sum(p[2] * p[3] for p in pts)
    den = n * sxx - sx * sx
    slope = ((n * sxy - sx * sy) * 10**6) // den
    intercept = (sy * sxx - sx * sxy) // den
    want = [(k, t, x, y, slope, intercept) for k, t, x, y in pts]
    got = [
        tuple(r)
        for r in QUERIES["llm_scaling_law_fit"](spark, sf_dir).collect()
    ]
    assert got == want


def test_pca_power_brute(spark, sf_dir, con):
    vecs = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    xs = [
        [round_half_away(float(e[i]) * 10**6) for i in range(16)]
        for _, e in vecs
    ]
    S = [[0] * 16 for _ in range(16)]
    for x in xs:
        for p in range(16):
            for q in range(16):
                S[p][q] += x[p] * x[q]
    v = [10**6] * 16
    hist = []
    for _ in range(2):
        u = [sum(S[p][q] * v[q] for q in range(16)) for p in range(16)]
        m = max(abs(t) for t in u)
        v = [(t * 10**6) // m for t in u]  # python // = the pmod floor
        hist.append(list(v))
    want = [
        (p, S[p][p], hist[0][p], hist[1][p]) for p in range(16)
    ]
    got = [
        tuple(r)
        for r in QUERIES["llm_embed_pca_power"](spark, sf_dir).collect()
    ]
    assert got == want


def test_mediation_brute(spark, sf_dir, con):
    rows = con.execute(
        """
        SELECT CASE WHEN o.o_orderpriority LIKE '1-%'
                      OR o.o_orderpriority LIKE '2-%' THEN 1 ELSE 0 END,
               l.m, o.o_totalprice
        FROM orders o
        JOIN (SELECT l_orderkey, COUNT(*) AS m FROM lineitem
              GROUP BY l_orderkey) l ON l.l_orderkey = o.o_orderkey
        """
    ).fetchall()
    pts = [(x, m, round_half_away(tp * 100)) for x, m, tp in rows]
    n = len(pts)
    s1 = sum(x for x, _, _ in pts)
    s2 = sum(m for _, m, _ in pts)
    sy = sum(y for _, _, y in pts)
    s11 = sum(x * x for x, _, _ in pts)
    s12 = sum(x * m for x, m, _ in pts)
    s22 = sum(m * m for _, m, _ in pts)
    s1y = sum(x * y for x, _, y in pts)
    s2y = sum(m * y for _, m, y in pts)
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s2 * s12)
        + s2 * (s1 * s12 - s2 * s11)
    )
    n1 = (
        -sy * (s1 * s22 - s12 * s2)
        + s1y * (n * s22 - s2 * s2)
        - s2y * (n * s12 - s2 * s1)
    )
    n2 = (
        sy * (s1 * s12 - s11 * s2)
        - s1y * (n * s12 - s1 * s2)
        + s2y * (n * s11 - s1 * s1)
    )
    m1 = sum(m for x, m, _ in pts if x == 1)
    m0 = sum(m for x, m, _ in pts if x == 0)
    y1 = sum(y for x, _, y in pts if x == 1)
    y0 = sum(y for x, _, y in pts if x == 0)
    a = (m1 * 10**6) // s1 - (m0 * 10**6) // (n - s1)
    c = (y1 * 10**6) // s1 - (y0 * 10**6) // (n - s1)
    b = (n2 * 10**6) // det
    cp = (n1 * 10**6) // det

    def trunc_div(aa, bb):
        q = abs(aa) // abs(bb)
        return q if (aa >= 0) == (bb >= 0) else -q

    want = [(n, s1, a, b, cp, c, trunc_div(a * b, 10**6))]
    got = [
        tuple(r)
        for r in QUERIES["agg_mediation_analysis"](spark, sf_dir).collect()
    ]
    assert got == want
    # sanity: total ~ direct + indirect up to floor slack
    assert abs(c - (cp + trunc_div(a * b, 10**6))) < 50_000
