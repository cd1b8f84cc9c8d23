"""r10-continuation operator checks: third-implementation differentials.

test_oracle.py already diffs each new op against its DuckDB oracle; the
oracle mirrors the engine's algebra, so a shared algebraic mistake would
pass. These tests add an INDEPENDENT implementation per op — numpy
lstsq for the exact-rational OLS, a pure-Python integer replication of
the LMS training loop, a hand-computed funnel on a crafted corpus for
the dedup cascade — plus plan/value assertions for the session-variable
and HLL-intersection ops.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pytest

from dbt_local_duckdb_deltalake_project_spark.catalog import TABLES, table_path
from dbt_local_duckdb_deltalake_project_spark.operators import ORACLE, QUERIES


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    row = QUERIES["agg_ols_normal_equations"](spark, sf_dir).collect()[0]
    con = duckdb.connect()
    df = con.execute(
        "SELECT ROUND(l_extendedprice * 100) AS y, l_quantity AS x1, "
        "ROUND(l_discount * 100) AS x2 FROM "
        f"read_parquet('{table_path(sf_dir, 'lineitem')}')"
    ).fetchdf()
    con.close()
    A = np.column_stack([np.ones(len(df)), df.x1, df.x2])
    beta, *_ = np.linalg.lstsq(A, df.y.values, rcond=None)
    got = np.array(
        [row.b0_micros, row.b1_micros, row.b2_micros], dtype=float
    ) / 1e6
    # floor-to-micros adds < 1e-6 absolute; lstsq carries ~1e-10 relative
    assert np.allclose(got, beta, rtol=1e-8, atol=2e-6), (got, beta)
    assert row.yhat_q25_d5_micros == (
        row.b0_micros + 25 * row.b1_micros + 5 * row.b2_micros
    )


def _py_floor_div(a: int, b: int) -> int:
    return a // b  # Python // IS floor division


def test_lms_matches_pure_python_replication(spark, sf_dir):
    rows = QUERIES["llm_classifier_train_lms"](spark, sf_dir).collect()
    con = duckdb.connect()
    docs = con.execute(
        "SELECT text, lang FROM "
        f"read_parquet('{table_path(sf_dir, 'documents')}')"
    ).fetchall()
    con.close()
    feats = []
    for text, lang in docs:
        toks = text.split(" ")
        nt, nd = len(toks), len(set(toks))
        sc = sum(len(w) for w in toks)
        feats.append(
            (
                1000 if lang == "en" else 0,
                1000,
                (1000 * (nt - nd)) // nt,
                (100 * sc) // nt,
            )
        )
    w = [0, 0, 0]
    expected = []
    for step in range(4):
        g = [0, 0, 0]
        sse = 0
        n = len(feats)
        for y, f0, f1, f2 in feats:
            pred = _py_floor_div(w[0] * f0 + w[1] * f1 + w[2] * f2, 10**6)
            r = pred - y
            g[0] += r * f0
            g[1] += r * f1
            g[2] += r * f2
            sse += r * r
        expected.append((step, w[0], w[1], w[2], sse))
        w = [w[j] - _py_floor_div(g[j], 2 * n) for j in range(3)]
    got = [
        (r.step, r.w0_micros, r.w1_micros, r.w2_micros, r.sse_milli2)
        for r in rows
    ]
    assert got == expected
    sses = [r[4] for r in got]
    assert sses == sorted(sses, reverse=True), "loss must be non-increasing"


# -- dedup cascade on a crafted corpus with a hand-computed funnel ----------

_CASCADE_DOCS = [
    (0, "a b c d e"),    # survives all three stages
    (1, "a b c d e"),    # exact duplicate of 0 → removed at stage 1
    (2, "a b c d"),      # proper prefix of "a b c d e" → removed at stage 2
    (3, "z a b c d e"),  # 3-gram Jaccard 3/4 with doc 0 → removed at stage 3
    (4, "q r s t u"),    # unrelated → survives
]

_CASCADE_EXPECTED = [
    ("1_exact", 5, 1, 4),
    ("2_prefix", 4, 1, 3),
    ("3_neardup", 3, 1, 2),
]


@pytest.fixture(scope="module")
def cascade_dir(tmp_path_factory, sf_dir, spark):
    d = tmp_path_factory.mktemp("crafted_cascade")
    for name in TABLES:
        if name != "documents":
            os.symlink(f"{sf_dir}/{name}.parquet", d / f"{name}.parquet")
    rows = [
        (doc_id, text, "en", "crafted", len(text))
        for doc_id, text in _CASCADE_DOCS
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_dedup_cascade_hand_computed_funnel(spark, cascade_dir):
    got = [
        (r.stage, r.docs_in, r.removed, r.survivors)
        for r in QUERIES["pipeline_dedup_cascade"](spark, cascade_dir)
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{cascade_dir}/documents.parquet/*.parquet')"
    )
    oracle = [
        tuple(r) for r in con.execute(ORACLE["pipeline_dedup_cascade"]).fetchall()
    ]
    con.close()
    assert got == oracle, "engine vs oracle diverge on crafted cascade"
    assert got == _CASCADE_EXPECTED, "both engines agree on a WRONG funnel"


def test_dedup_cascade_stage_flow_consistency(spark, sf_dir):
    rows = QUERIES["pipeline_dedup_cascade"](spark, sf_dir).collect()
    assert [r.stage for r in rows] == ["1_exact", "2_prefix", "3_neardup"]
    for r in rows:
        assert r.removed >= 0
        assert r.docs_in - r.removed == r.survivors
    assert rows[0].survivors == rows[1].docs_in
    assert rows[1].survivors == rows[2].docs_in


def test_hll_intersection_exact_values_and_bounds(spark, sf_dir, duck):
    row = QUERIES["agg_hll_intersection"](spark, sf_dir).collect()[0]
    exact = duck.execute(
        """
        SELECT COUNT(*) FROM (
          SELECT DISTINCT o_custkey FROM orders
          WHERE o_orderpriority = '1-URGENT'
          INTERSECT
          SELECT DISTINCT o_custkey FROM orders
          WHERE o_orderpriority = '2-HIGH'
        )
        """
    ).fetchone()[0]
    assert row.exact_intersection == exact
    assert row.sets_within_3pct and row.intersection_within_5pct


def test_session_variables_fold_and_push_down(spark, sf_dir):
    df = QUERIES["sql_session_variables"](spark, sf_dir)
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    # variable references must have folded to literals and reached the scan
    assert pushed and "l_shipdate" in pushed[0] and "l_quantity" in pushed[0]


# --- r10 late-session additions: independent replications ---------------


def _events_rows(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT event_id, ts, user_id, event_type, value FROM "
        f"read_parquet('{table_path(sf_dir, 'events')}') ORDER BY user_id, ts, event_id"
    ).fetchall()
    con.close()
    return rows


def test_rolling_corr_matches_python_fractions(spark, sf_dir):
    got = {
        (r.user_id, r.event_id): (
            r.n_window,
            r.trend_cov_num,
            r.trend_r2_signed_micros,
        )
        for r in QUERIES["win_rolling_corr"](spark, sf_dir).collect()
    }
    series = {}
    for eid, ts, uid, _et, val in _events_rows(sf_dir):
        x = int(round(val * 100))
        y = int(ts.timestamp() * 1_000_000) // 1_000_000 - 1_704_000_000
        series.setdefault(uid, []).append((eid, x, y))
    n_checked = 0
    for uid, rows in series.items():
        for i, (eid, _x, _y) in enumerate(rows):
            frame = rows[max(0, i - 11) : i + 1]
            n = len(frame)
            sx = sum(x for _, x, _ in frame)
            sy = sum(y for _, _, y in frame)
            sxx = sum(x * x for _, x, _ in frame)
            syy = sum(y * y for _, _, y in frame)
            sxy = sum(x * y for _, x, y in frame)
            num = n * sxy - sx * sy
            dxx = n * sxx - sx * sx
            dyy = n * syy - sy * sy
            exp_num = num if n >= 6 else None
            if n >= 6 and dxx > 0 and dyy > 0:
                sign = (num > 0) - (num < 0)
                exp_r2 = sign * ((num * num * 1_000_000) // (dxx * dyy))
            else:
                exp_r2 = None
            gn, gnum, gr2 = got[(uid, eid)]
            assert gn == n and gnum == exp_num and gr2 == exp_r2, (
                uid,
                eid,
                (gn, gnum, gr2),
                (n, exp_num, exp_r2),
            )
            n_checked += 1
    assert n_checked == len(got)


def test_survival_km_matches_python_product(spark, sf_dir):
    import datetime
    import math

    rows = QUERIES["agg_survival_km"](spark, sf_dir).collect()
    users = {}
    for _eid, ts, uid, _et, _val in _events_rows(sf_dir):
        lo, hi = users.get(uid, (ts, ts))
        users[uid] = (min(lo, ts), max(hi, ts))
    cutoff = datetime.datetime(2024, 1, 28)
    steps = {}
    for uid, (lo, hi) in users.items():
        cohort = uid % 4
        dur = (hi.date() - lo.date()).days
        observed = hi < cutoff
        d, c = steps.get((cohort, dur), (0, 0))
        steps[(cohort, dur)] = (d + (1 if observed else 0),
                                c + (0 if observed else 1))
    by_cohort = {}
    for (cohort, dur), (d, c) in sorted(steps.items()):
        by_cohort.setdefault(cohort, []).append((dur, d, c))
    expected = {}
    for cohort, lst in by_cohort.items():
        total = sum(d + c for _, d, c in lst)
        log_nanos, hit_zero = 0, 0
        n = total
        for dur, d, c in lst:
            if d >= n:
                hit_zero = 1
            elif d > 0:
                log_nanos += int(
                    round(round(math.log((n - d) / n), 9) * 1_000_000_000)
                )
            expected[(cohort, dur)] = (d, c, n, log_nanos, hit_zero)
            n -= d + c
    assert len(rows) == len(expected)
    for r in rows:
        exp = expected[(r.cohort, r.dur)]
        assert (r.d, r.c, r.n, r.log_surv_nanos, r.surv_hit_zero) == exp, (
            r,
            exp,
        )


def test_sprt_matches_python_cumsum(spark, sf_dir):
    rows = QUERIES["agg_sprt_sequential"](spark, sf_dir).collect()
    daily = {}
    for _eid, ts, uid, et, _val in _events_rows(sf_dir):
        key = (uid % 2, (ts.date() - __import__("datetime").date(2024, 1, 1)).days)
        n, x = daily.get(key, (0, 0))
        daily[key] = (n + 1, x + (1 if et == "purchase" else 0))
    cum = {}
    for (arm, day), (n, x) in sorted(daily.items()):
        # walk back over possible gap days to the previous cumulative
        k = day - 1
        while k >= 0 and (arm, k) not in cum:
            k -= 1
        prev = cum.get((arm, k), 0) if k >= 0 else 0
        cum[(arm, day)] = prev + x * 223143551 + (n - x) * (-182321557)
    for r in rows:
        n, x = daily[(r.arm, r.day)]
        llr = cum[(r.arm, r.day)]
        dec = (
            "accept_h1"
            if llr >= 2944438979
            else "accept_h0" if llr <= -2944438979 else "continue"
        )
        assert (r.x, r.n, r.llr_nanos, r.decision) == (x, n, llr, dec), r


def test_empirical_bayes_matches_fractions(spark, sf_dir):
    from fractions import Fraction

    rows = QUERIES["agg_empirical_bayes_rate"](spark, sf_dir).collect()
    per_user = {}
    for _eid, _ts, uid, et, _val in _events_rows(sf_dir):
        n, x = per_user.get(uid, (0, 0))
        per_user[uid] = (n + 1, x + (1 if et == "purchase" else 0))
    gx = sum(x for _, x in per_user.values())
    gn = sum(n for n, _ in per_user.values())
    assert len(rows) == len(per_user)
    for r in rows:
        n, x = per_user[r.user_id]
        shrunk = Fraction(x * gn + 20 * gx, gn * (n + 20))
        assert r.raw_rate_micros == (x * 1_000_000) // n
        assert r.shrunk_rate_micros == (
            shrunk.numerator * 1_000_000 // shrunk.denominator
        )
        # shrinkage pulls toward the pooled rate, never past it
        pooled_micros = gx * 1_000_000 // gn
        lo, hi = sorted((r.raw_rate_micros, pooled_micros))
        assert lo - 1 <= r.shrunk_rate_micros <= hi + 1


def test_modularity_partition_identities(spark, sf_dir):
    rows = QUERIES["graph_modularity"](spark, sf_dir).collect()
    q_den = rows[0].q_den
    m = int(round((q_den / 4) ** 0.5))
    assert 4 * m * m == q_den
    # handshake: community degree totals partition 2m
    assert sum(r.tot_degree for r in rows) == 2 * m
    # intra-community edges can never exceed m
    assert 0 <= sum(r.in_edges for r in rows) <= m
    # global Q within Newman bounds
    q = sum(r.q_num for r in rows) / q_den
    assert -0.5 <= q <= 1.0
    # every q_num consistent with its row's parts
    for r in rows:
        assert r.q_num == 4 * m * r.in_edges - r.tot_degree**2


def test_histogram_log2_matches_python(spark, sf_dir):
    rows = QUERIES["agg_histogram_log2"](spark, sf_dir).collect()
    agg = {}
    for _eid, _ts, _uid, et, val in _events_rows(sf_dir):
        cents = int(round(val * 100))
        if cents <= 0:
            continue
        b = cents.bit_length() - 1
        n, s = agg.get((et, b), (0, 0))
        agg[(et, b)] = (n + 1, s + cents)
    tot = {}
    for (et, _b), (n, _s) in agg.items():
        tot[et] = tot.get(et, 0) + n
    assert len(rows) == len(agg)
    for r in rows:
        n, s = agg[(r.event_type, r.bucket_pow2)]
        assert (r.n, r.sum_cents) == (n, s), r
        assert r.bucket_lo_cents == 1 << r.bucket_pow2
        assert r.bucket_hi_cents == (1 << (r.bucket_pow2 + 1)) - 1
        assert r.share_ppm == n * 1_000_000 // tot[r.event_type]


# --- closing-batch replications: every late-r10 op gets a third impl ---


def _docs_rows(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, text, n_chars FROM "
        f"read_parquet('{table_path(sf_dir, 'documents')}') ORDER BY doc_id"
    ).fetchall()
    con.close()
    return rows


def _py_soundex(word: str) -> str:
    up = word.upper()
    head, tail = up[0], up[1:]
    full = head + "".join(ch for ch in tail if ch not in "HW")
    table = {}
    for digits, letters in [
        ("1", "BFPV"), ("2", "CGJKQSXZ"), ("3", "DT"),
        ("4", "L"), ("5", "MN"), ("6", "R"), ("0", "AEIOUY"),
    ]:
        for ch in letters:
            table[ch] = digits
    codes = "".join(table.get(ch, ch) for ch in full)
    out = [codes[0]]
    for ch in codes[1:]:
        if ch != out[-1]:
            out.append(ch)
    body = "".join(out)[1:].replace("0", "")
    return head + (body + "000")[:3]


def test_soundex_matches_pure_python(spark, sf_dir):
    import re

    rows = QUERIES["fn_phonetic_soundex"](spark, sf_dir).collect()
    assert rows, "no alpha tokens in part names?"
    for r in rows:
        assert re.fullmatch(r"[a-z]+", r.token)
        assert r.soundex_code == _py_soundex(r.token), r


def test_theil_sen_matches_python_median(spark, sf_dir):
    import statistics

    rows = QUERIES["win_theil_sen"](spark, sf_dir).collect()
    daily = {}
    for _eid, ts, uid, _et, val in _events_rows(sf_dir):
        key = (uid, (ts.date() - __import__("datetime").date(2024, 1, 1)).days)
        daily[key] = daily.get(key, 0) + int(round(val * 100))
    per_user = {}
    for (uid, day), cents in daily.items():
        per_user.setdefault(uid, []).append((day, cents))
    expected = {}
    for uid, pts in per_user.items():
        pts.sort()
        slopes = [
            (c2 - c1) / (d2 - d1)
            for i, (d1, c1) in enumerate(pts)
            for (d2, c2) in pts[i + 1 :]
        ]
        if slopes:
            expected[uid] = (len(slopes), statistics.median(slopes))
    assert len(rows) == len(expected)
    for r in rows:
        n, med = expected[r.user_id]
        assert r.n_pairs == n and r.theil_sen_slope == med, (r, med)


def test_skyline_matches_bruteforce(spark, sf_dir):
    rows = QUERIES["agg_skyline_pareto"](spark, sf_dir).collect()
    con = duckdb.connect()
    cust = con.execute(
        "SELECT c.c_mktsegment, c.c_custkey, "
        "CAST(SUM(ROUND(o.o_totalprice * 100)) AS BIGINT), COUNT(*) "
        f"FROM read_parquet('{table_path(sf_dir, 'customer')}') c "
        f"JOIN read_parquet('{table_path(sf_dir, 'orders')}') o "
        "ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_mktsegment, c.c_custkey"
    ).fetchall()
    con.close()
    by_seg = {}
    for seg, key, spend, n in cust:
        by_seg.setdefault(seg, []).append((key, int(spend), int(n)))
    expected = set()
    for seg, pts in by_seg.items():
        for key, sp, n in pts:
            dominated = any(
                sp2 >= sp and n2 >= n and (sp2 > sp or n2 > n)
                for _k2, sp2, n2 in pts
            )
            if not dominated:
                expected.add((seg, key, sp, n))
    got = {
        (r.c_mktsegment, r.c_custkey, r.spend_cents, r.n_orders)
        for r in rows
    }
    assert got == expected


def test_boilerplate_matches_python_counts(spark, sf_dir):
    rows = QUERIES["llm_boilerplate_phrases"](spark, sf_dir).collect()
    df, tf = {}, {}
    for doc_id, text, _nc in _docs_rows(sf_dir):
        toks = [w for w in text.split(" ") if w]
        grams = {
            " ".join(toks[i : i + 5]) for i in range(len(toks) - 4)
        }
        for g in grams:
            df[g] = df.get(g, 0) + 1
        for i in range(len(toks) - 4):
            g = " ".join(toks[i : i + 5])
            tf[g] = tf.get(g, 0) + 1
    top = sorted(df, key=lambda g: (-df[g], -tf[g], g))[:20]
    assert [r.gram for r in rows] == top
    for r in rows:
        assert (r.doc_freq, r.total_freq) == (df[r.gram], tf[r.gram])


def test_autocorr_matches_python_moments(spark, sf_dir):
    rows = QUERIES["agg_autocorr_lags"](spark, sf_dir).collect()
    daily = {}
    for _eid, ts, _uid, et, val in _events_rows(sf_dir):
        key = (et, (ts.date() - __import__("datetime").date(2024, 1, 1)).days)
        daily[key] = daily.get(key, 0) + int(round(val * 100))
    expected = {}
    for (et, day), x in daily.items():
        for lag in (1, 2, 3, 7):
            y = daily.get((et, day - lag))
            if y is None:
                continue
            k = (et, lag)
            n, sx, sy, sxx, syy, sxy = expected.get(k, (0, 0, 0, 0, 0, 0))
            expected[k] = (
                n + 1, sx + x, sy + y, sxx + x * x, syy + y * y,
                sxy + x * y,
            )
    assert len(rows) == len(expected)
    for r in rows:
        n, sx, sy, sxx, syy, sxy = expected[(r.event_type, r.lag)]
        num = n * sxy - sx * sy
        dxx, dyy = n * sxx - sx * sx, n * syy - sy * sy
        assert r.n == n and r.acf_num == num
        if dxx > 0 and dyy > 0:
            sign = (num > 0) - (num < 0)
            assert r.acf_r2_signed_micros == sign * (
                num * num * 1_000_000 // (dxx * dyy)
            )
        else:
            assert r.acf_r2_signed_micros is None


def _tdiv(num: int, den: int) -> int:
    sign = (num > 0) - (num < 0)
    return sign * (abs(num) // den)


def test_seasonal_decompose_matches_python(spark, sf_dir):
    rows = QUERIES["win_seasonal_decompose"](spark, sf_dir).collect()
    daily = {}
    for _eid, ts, _uid, et, val in _events_rows(sf_dir):
        key = (et, (ts.date() - __import__("datetime").date(2024, 1, 1)).days)
        daily[key] = daily.get(key, 0) + int(round(val * 100))
    series = {}
    for (et, day), cents in sorted(daily.items()):
        series.setdefault(et, []).append((day, cents))
    expected = {}
    seas_acc = {}
    det = {}
    for et, pts in series.items():
        days = [d for d, _ in pts]
        cents = {d: c for d, c in pts}
        for i, (d, c) in enumerate(pts):
            frame = pts[max(0, i - 3) : i + 4]
            if len(frame) == 7:
                s7 = sum(c2 for _, c2 in frame)
                trend = s7 * 1_000_000 // 7
                detr = c * 1_000_000 - trend
            else:
                trend, detr = None, None
            det[(et, d)] = (c, trend, detr)
            if detr is not None:
                k = (et, d % 7)
                sd, nd = seas_acc.get(k, (0, 0))
                seas_acc[k] = (sd + detr, nd + 1)
    for (et, d), (c, trend, detr) in det.items():
        sd, nd = seas_acc.get((et, d % 7), (0, 0))
        seasonal = _tdiv(sd, nd) if nd > 0 else None
        resid = (
            detr - seasonal
            if detr is not None and seasonal is not None
            else None
        )
        expected[(et, d)] = (c, trend, seasonal, resid)
    assert len(rows) == len(expected)
    for r in rows:
        exp = expected[(r.event_type, r.day)]
        got = (r.cents, r.trend_micros, r.seasonal_micros,
               r.residual_micros)
        assert got == exp, (r.event_type, r.day, got, exp)


def test_benjamini_hochberg_matches_python(spark, sf_dir):
    import datetime
    import math

    rows = QUERIES["agg_benjamini_hochberg"](spark, sf_dir).collect()
    cutoff = datetime.datetime(2024, 1, 16)
    cells = {}
    for _eid, ts, uid, et, _val in _events_rows(sf_dir):
        for metric in ("purchase", "click"):
            k = (metric, uid % 8)
            n1, x1, n2, x2 = cells.get(k, (0, 0, 0, 0))
            if ts < cutoff:
                n1 += 1
                x1 += 1 if et == metric else 0
            else:
                n2 += 1
                x2 += 1 if et == metric else 0
            cells[k] = (n1, x1, n2, x2)
    pvals = {}
    for (metric, cohort), (n1, x1, n2, x2) in cells.items():
        if not (n1 > 0 and n2 > 0 and 0 < x1 + x2 < n1 + n2):
            continue
        pp = (x1 + x2) / (n1 + n2)
        z = (x1 / n1 - x2 / n2) / math.sqrt(
            pp * (1 - pp) * (1.0 / n1 + 1.0 / n2)
        )
        t_ = 1 / (1 + 0.2316419 * abs(z))
        phi = 0.3989422804014327 * math.exp(-(z * z) / 2)
        p = 2 * phi * (
            t_ * (0.319381530 + t_ * (-0.356563782 + t_ * (1.781477937
                + t_ * (-1.821255978 + t_ * 1.330274429))))
        )
        pvals[(metric, cohort)] = int(round(round(p, 9) * 1_000_000))
    for metric in ("purchase", "click"):
        fam = sorted(
            (p, c) for (m, c), p in pvals.items() if m == metric
        )
        m_tests = len(fam)
        maxk = max(
            (k for k, (p, _c) in enumerate(fam, 1)
             if p * m_tests <= k * 50000),
            default=0,
        )
        got = [r for r in rows if r.metric == metric]
        assert len(got) == m_tests
        for r in got:
            p, c = fam[r.rnk - 1]
            assert (r.cohort, r.p_micros) == (c, p)
            assert r.reject_raw == (p <= 50000)
            assert r.reject_bh == (r.rnk <= maxk)


def test_prefix_cache_matches_python(spark, sf_dir):
    rows = QUERIES["llm_prefix_cache_plan"](spark, sf_dir).collect()
    agg = {}
    for doc_id, text, _nc in _docs_rows(sf_dir):
        toks = text.split(" ")
        pref = " ".join(toks[:8])
        n, tot, ex = agg.get(pref, (0, 0, None))
        agg[pref] = (
            n + 1, tot + len(toks),
            doc_id if ex is None else min(ex, doc_id),
        )
    exp = {p: v for p, v in agg.items() if v[0] > 1}
    assert len(rows) == len(exp)
    for r in rows:
        n, tot, ex = exp[r.prefix8]
        assert (r.n_prompts, r.total_tokens, r.exemplar_doc) == (n, tot, ex)
        assert r.cached_tokens_saved == (n - 1) * 8


def test_sft_pack_matches_python_render(spark, sf_dir):
    import hashlib

    rows = QUERIES["llm_chat_sft_pack"](spark, sf_dir).collect()
    docs = {d: t for d, t, _ in _docs_rows(sf_dir)}
    n_expected = sum(1 for d in docs if d % 2 == 0 and d + 1 in docs)
    assert len(rows) == n_expected
    for r in rows:
        user, asst = docs[r.turn_id], docs[r.turn_id + 1]
        rendered = f"<|user|>{user}<|assistant|>{asst}<|end|>"
        assert r.n_chars == len(rendered)
        assert r.loss_start == 8 + len(user) + 13
        assert r.loss_end == r.loss_start + len(asst) + 7
        assert r.loss_head == rendered[r.loss_start : r.loss_start + 24]
        assert r.render_md5 == hashlib.md5(
            rendered.encode()
        ).hexdigest()


def test_grpo_matches_python_ints(spark, sf_dir):
    rows = QUERIES["llm_grpo_group_advantage"](spark, sf_dir).collect()
    groups = {}
    for doc_id, _t, n_chars in _docs_rows(sf_dir):
        g = doc_id // 8
        n, s, ss = groups.get(g, (0, 0, 0))
        groups[g] = (n + 1, s + n_chars, ss + n_chars * n_chars)
    docs = {d: nc for d, _t, nc in _docs_rows(sf_dir)}
    assert len(rows) == len(docs)
    for r in rows:
        n, s, ss = groups[r.prompt_group]
        reward = docs[r.doc_id]
        adv = reward * n - s
        assert (r.reward, r.group_n, r.adv_num) == (reward, n, adv)
        assert r.adv_micros == _tdiv(adv * 1_000_000, n)
        assert r.var_num == n * ss - s * s


def test_assortativity_matches_python_fractions(spark, sf_dir):
    row = QUERIES["graph_assortativity"](spark, sf_dir).collect()[0]
    con = duckdb.connect()
    pairs = con.execute(
        "SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR), "
        "'s:' || CAST(l_suppkey AS VARCHAR) FROM "
        f"read_parquet('{table_path(sf_dir, 'lineitem')}') l JOIN "
        f"read_parquet('{table_path(sf_dir, 'orders')}') o "
        "ON l.l_orderkey = o.o_orderkey"
    ).fetchall()
    con.close()
    edges = [(c, s) for c, s in pairs] + [(s, c) for c, s in pairs]
    deg = {}
    for src, _dst in edges:
        deg[src] = deg.get(src, 0) + 1
    n = sx = sy = sxx = syy = sxy = 0
    for src, dst in edges:
        x, y = deg[src], deg[dst]
        n += 1
        sx += x; sy += y; sxx += x * x; syy += y * y; sxy += x * y
    num = n * sxy - sx * sy
    dxx, dyy = n * sxx - sx * sx, n * syy - sy * sy
    assert row.n_directed_edges == n and row.assort_num == num
    sign = (num > 0) - (num < 0)
    step1 = abs(num) * 1_000_000 // dxx
    assert row.assort_r2_signed_micros == sign * (step1 * abs(num) // dyy)
    # bipartite commerce graphs are disassortative
    assert num < 0


def test_ipcidr_matches_python_bitmath(spark, sf_dir):
    rows = QUERIES["fn_ipcidr"](spark, sf_dir).collect()
    users = sorted({r[2] for r in _events_rows(sf_dir)})
    assert len(rows) == len(users)
    for r, uid in zip(rows, users):
        ip = 167772160 + (uid % 4096) * 4096 + (uid * 2654435761) % 4096
        assert r.user_id == uid and r.ip_int == ip
        octs = [(ip >> s) & 255 for s in (24, 16, 8, 0)]
        assert r.ip_str == ".".join(str(o) for o in octs)
        assert r.in_10_slash8 == (octs[0] == 10)
        assert r.subnet16 == f"{octs[0]}.{octs[1]}.0.0/16"
        assert r.in_first_slash20 == ((ip >> 12) == (167772160 >> 12))
        assert r.slash20_index == (ip >> 12) & 15
