"""Independent-reference checks for the r6 session-5 batch
(agg_weighted_median / agg_mann_kendall / graph_resource_allocation /
llm_kneser_ney / llm_calibration_isotonic / llm_cdc_chunks /
mm_scene_split) — a pure-Python/pandas third implementation per op
plus each op's defining algebraic invariant.
"""

from __future__ import annotations

import hashlib
from fractions import Fraction

import pandas as pd
from pyspark.sql import functions as F

from dbt_local_duckdb_deltalake_project_spark.catalog import t
from dbt_local_duckdb_deltalake_project_spark.operators import QUERIES


def test_weighted_median_matches_pandas_reference(spark, sf_dir):
    out = QUERIES["agg_weighted_median"](spark, sf_dir).toPandas()
    li = (
        t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .toPandas()
    )
    li["cents"] = (li["l_extendedprice"] * 100).round().astype("int64")
    li["wt"] = li["l_quantity"].astype("int64")
    for _, row in out.iterrows():
        g = (
            li[li["l_returnflag"] == row["flag"]]
            .groupby("cents")["wt"]
            .sum()
            .sort_index()
        )
        cw = g.cumsum()
        tw = int(g.sum())
        lo = int(cw.index[(2 * cw >= tw).values.argmax()])
        hi = int(cw.index[(2 * cw > tw).values.argmax()])
        assert row["total_weight"] == tw
        assert row["wmedian_lo"] == lo
        assert row["wmedian_hi"] == hi
        assert row["wmedian_lo"] <= row["wmedian_hi"]


def test_mann_kendall_matches_python_reference(spark, sf_dir):
    out = QUERIES["agg_mann_kendall"](spark, sf_dir).toPandas()
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "value").toPandas()
    ev["d"] = ev["ts"].dt.floor("D")
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    daily = ev.groupby(["user_id", "d"])["cents"].sum().reset_index()
    for _, row in out.head(25).iterrows():
        x = (
            daily[daily["user_id"] == row["user_id"]]
            .sort_values("d")["cents"]
            .to_list()
        )
        n = len(x)
        s = sum(
            (x[j] > x[i]) - (x[j] < x[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties = pd.Series(x).value_counts()
        tie_term = int(sum(tt * (tt - 1) * (2 * tt + 5) for tt in ties))
        assert row["n_days"] == n
        assert row["s_stat"] == s
        assert row["var_num18"] == n * (n - 1) * (2 * n + 5) - tie_term
        if row["var_num18"] > 0 and s != 0:
            assert (row["z_micros"] > 0) == (s > 0)


def test_resource_allocation_matches_pandas_reference(spark, sf_dir):
    out = QUERIES["graph_resource_allocation"](spark, sf_dir).toPandas()
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .toPandas()
        .rename(columns={"o_custkey": "c", "l_suppkey": "s"})
    )
    capped = (
        pairs.sort_values(["c", "s"]).groupby("c").head(8)
    )
    dc = capped.groupby("c")["s"].size()
    ra: dict[tuple[int, int], list[int]] = {}
    for c, grp in capped.groupby("c"):
        ss = sorted(grp["s"])
        term = 1_000_000 // int(dc[c])
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                k = (ss[i], ss[j])
                e = ra.setdefault(k, [0, 0])
                e[0] += 1
                e[1] += term
    top = sorted(
        ((v[1], k[0], k[1], v[0]) for k, v in ra.items()),
        key=lambda r: (-r[0], r[1], r[2]),
    )[:20]
    got = [
        (r["ra_ppm"], r["s1"], r["s2"], r["shared"])
        for _, r in out.iterrows()
    ]
    assert got == top


def test_kneser_ney_sums_to_one_and_matches_fractions(spark, sf_dir):
    out = QUERIES["llm_kneser_ney"](spark, sf_dir).toPandas()
    texts = [
        r["text"]
        for r in t(spark, sf_dir, "documents").select("text").collect()
    ]
    c2: dict[tuple[str, str], int] = {}
    for s in texts:
        ws = s.split(" ")
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    n1pl: dict[str, int] = {}
    n1pr: dict[str, int] = {}
    for (a, b), c in c2.items():
        c1[a] = c1.get(a, 0) + c
        n1pl[a] = n1pl.get(a, 0) + 1
        n1pr[b] = n1pr.get(b, 0) + 1
    T = len(c2)

    def pkn(a, b):
        c = c2[(a, b)]
        return Fraction(
            (4 * c - 3) * T + 3 * n1pl[a] * n1pr[b], 4 * c1[a] * T
        )

    for _, row in out.iterrows():
        p = pkn(row["w1"], row["w2"])
        assert row["pkn_ppm"] == (1_000_000 * p.numerator) // p.denominator
        assert row["n_types"] == T
    # the defining property of interpolated KN: the conditional
    # distribution sums to exactly 1 for every context (check the
    # contexts surfaced in the top-50)
    for a in set(out["w1"]):
        seen = sum(pkn(w1, w2) for (w1, w2) in c2 if w1 == a)
        # unseen continuations carry mass d·N1+(a,·)/c1(a) · P_cont(b)
        # = (3·N1+(a,·) / (4·c1(a)·T)) · N1+(·,b) summed over every b
        # NOT seen after a; folding them in must hit exactly 1
        unseen = Fraction(3 * n1pl[a], 4 * c1[a] * T) * (
            T - sum(n1pr[b] for (w1, b) in c2 if w1 == a)
        )
        assert seen + unseen == 1


def _pav_reference(bins: list[tuple[int, int, int]]):
    # classic stack-based pool-adjacent-violators over (bin, n, s):
    # each stack block is [pooled n, pooled s, #bins covered]
    stack: list[list[int]] = []
    for _, n, s in bins:
        stack.append([n, s, 1])
        while len(stack) >= 2 and Fraction(
            stack[-2][1], stack[-2][0]
        ) > Fraction(stack[-1][1], stack[-1][0]):
            n2, s2, b2 = stack.pop()
            stack[-1][0] += n2
            stack[-1][1] += s2
            stack[-1][2] += b2
    out: list[Fraction] = []
    for n, s, nb in stack:
        out.extend([Fraction(s, n)] * nb)
    return out


def test_isotonic_matches_pav_stack_reference(spark, sf_dir):
    out = (
        QUERIES["llm_calibration_isotonic"](spark, sf_dir)
        .toPandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    bins = [
        (int(r["bin"]), int(r["n"]), int(r["s"])) for _, r in out.iterrows()
    ]
    ref = _pav_reference(bins)
    for i, (_, row) in enumerate(out.iterrows()):
        f = ref[i]
        assert row["iso_ppm"] == (1_000_000 * f.numerator) // f.denominator
    # monotone nondecreasing — the whole point of the fit
    assert (out["iso_ppm"].diff().dropna() >= 0).all()
    # pooled means conserve mass: sum(iso * n) == sum(s) in rationals
    assert sum(f * n for f, (_, n, _) in zip(ref, bins)) == sum(
        s for _, _, s in bins
    )


def _cdc_reference(head: str):
    L = len(head)
    bounds = []
    for i in range(8, L + 1):
        h = int(hashlib.md5(head[i - 8 : i].encode()).hexdigest()[:8], 16)
        if h % 64 == 0 or i == L:
            bounds.append(i)
    chunks, prev = [], 0
    for b in bounds:
        chunks.append(head[prev:b])
        prev = b
    return chunks


def test_cdc_chunks_matches_python_reference(spark, sf_dir):
    out = QUERIES["llm_cdc_chunks"](spark, sf_dir).toPandas()
    docs = (
        t(spark, sf_dir, "documents").select("source", "text").toPandas()
    )
    agg: dict[str, dict[str, list[int]]] = {}
    for _, r in docs.iterrows():
        head = r["text"][:512]
        if len(head) < 8:
            continue
        for ch in _cdc_reference(head):
            h = hashlib.md5(ch.encode()).hexdigest()
            e = agg.setdefault(r["source"], {}).setdefault(h, [0, len(ch)])
            e[0] += 1
    for _, row in out.iterrows():
        per = agg[row["source"]]
        n_chunks = sum(c for c, _ in per.values())
        total = sum(c * ln for c, ln in per.values())
        dup = sum((c - 1) * ln for c, ln in per.values())
        assert row["n_chunks"] == n_chunks
        assert row["n_distinct"] == len(per)
        assert row["total_bytes"] == total
        assert row["dup_bytes"] == dup
        assert row["dedup_ppm"] == 1_000_000 * dup // total


def test_scene_split_matches_python_reference(spark, sf_dir):
    out = QUERIES["mm_scene_split"](spark, sf_dir).toPandas()
    assert len(out)
    for _, row in out.head(40).iterrows():
        m = int(row["media_id"])
        nf = 16 + m % 48
        feats = [(m * 31 + f * f * 7 + f * 17) % 1000 for f in range(nf)]
        lens, cur = [], 1
        for a, b in zip(feats, feats[1:]):
            if abs(b - a) > 500:
                lens.append(cur)
                cur = 1
            else:
                cur += 1
        lens.append(cur)
        assert row["n_frames"] == nf
        assert row["n_scenes"] == len(lens)
        assert row["max_scene_len"] == max(lens)
        assert sum(lens) == nf  # scene lengths partition the frames
        assert row["avg_scene_len_ppm"] == 1_000_000 * nf // len(lens)
