"""Independent-reference and invariant checks for the r6 session-4
statistics battery (agg_mann_whitney / agg_ks_2sample /
agg_chisq_independence / agg_benford_law) — a pandas/numpy third
implementation per op plus the algebraic identities each statistic must
satisfy, so agreement isn't just two engines sharing a bug.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from dbt_local_duckdb_deltalake_project_spark.catalog import t
from dbt_local_duckdb_deltalake_project_spark.operators import QUERIES


def _two_sample_frame(spark, sf_dir) -> pd.DataFrame:
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select("user_id", "event_type", "value")
        .toPandas()
    )
    ev["cohort"] = ev["user_id"] % 8
    ev["g1"] = ev["event_type"] == "purchase"
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    return ev


def test_mann_whitney_matches_pandas_rank_reference(spark, sf_dir):
    out = QUERIES["agg_mann_whitney"](spark, sf_dir).toPandas()
    ev = _two_sample_frame(spark, sf_dir)
    for _, row in out.iterrows():
        g = ev[ev["cohort"] == row["cohort"]]
        ranks = g["cents"].rank(method="average")
        r1 = ranks[g["g1"]].sum()
        n1 = int(g["g1"].sum())
        u1 = r1 - n1 * (n1 + 1) / 2
        assert row["n1"] == n1
        assert row["n2"] == len(g) - n1
        assert row["u1_doubled"] == 2 * u1


def test_mann_whitney_u_conservation(spark, sf_dir):
    # U1 + U2 = n1·n2, so u_min_doubled ≤ n1·n2 and both U are ≥ 0.
    out = QUERIES["agg_mann_whitney"](spark, sf_dir).toPandas()
    u2 = 2 * out["n1"] * out["n2"] - out["u1_doubled"]
    assert (out["u1_doubled"] >= 0).all() and (u2 >= 0).all()
    assert (out["u_min_doubled"] <= out["n1"] * out["n2"]).all()


def test_ks_matches_numpy_ecdf_reference(spark, sf_dir):
    out = QUERIES["agg_ks_2sample"](spark, sf_dir).toPandas()
    ev = _two_sample_frame(spark, sf_dir)
    for _, row in out.iterrows():
        g = ev[ev["cohort"] == row["cohort"]]
        x1 = np.sort(g.loc[g["g1"], "cents"].to_numpy())
        x2 = np.sort(g.loc[~g["g1"], "cents"].to_numpy())
        pts = np.unique(np.concatenate([x1, x2]))
        c1 = np.searchsorted(x1, pts, side="right")
        c2 = np.searchsorted(x2, pts, side="right")
        d_num = np.abs(c1 * len(x2) - c2 * len(x1)).max()
        assert row["d_num"] == d_num
        assert row["d_micros"] == d_num * 1_000_000 // (len(x1) * len(x2))


def test_chisq_matches_pandas_crosstab_reference(spark, sf_dir):
    out = QUERIES["agg_chisq_independence"](spark, sf_dir).toPandas()
    ev = (
        t(spark, sf_dir, "events")
        .select("event_type", (F.col("user_id") % 4).alias("cohort"))
        .toPandas()
    )
    ct = pd.crosstab(ev["event_type"], ev["cohort"]).to_numpy().astype(float)
    n = ct.sum()
    e = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / n
    chi2 = ((ct - e) ** 2 / e).sum()
    row = out.iloc[0]
    assert row["n_obs"] == n
    assert row["dof"] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert row["n_cells"] == ct.size
    # per-cell micros quantization bounds the drift at n_cells·0.5 micro
    assert abs(row["chi2_micros"] / 1e6 - chi2) <= ct.size * 1e-6 + 1e-9


def test_benford_spine_and_frequency_conservation(spark, sf_dir):
    out = QUERIES["agg_benford_law"](spark, sf_dir).toPandas()
    assert list(out["digit"]) == list(range(1, 10))
    # expected micros are the exact rounded log10(1+1/d) table: sums to 1
    assert out["exp_micros"].sum() == 1_000_000
    n = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .count()
    )
    assert out["n_orders"].sum() == n
    # floor-divided observed frequencies sum to 1e6 less at most 8 ulps
    assert 1_000_000 - 8 <= out["freq_micros"].sum() <= 1_000_000
    assert (
        out["dev_micros"] == (out["freq_micros"] - out["exp_micros"]).abs()
    ).all()


def test_benford_matches_string_reference(spark, sf_dir):
    out = QUERIES["agg_benford_law"](spark, sf_dir).toPandas()
    tp = t(spark, sf_dir, "orders").select("o_totalprice").toPandas()
    cents = (tp["o_totalprice"] * 100).round().astype("int64")
    ref = (
        cents[cents > 0].astype(str).str[0].astype(int).value_counts()
    )
    for _, row in out.iterrows():
        assert row["n_orders"] == ref.get(row["digit"], 0)


def test_ohlc_band_and_conservation(spark, sf_dir):
    out = QUERIES["win_ohlc_resample"](spark, sf_dir).toPandas()
    assert (out["low_cents"] <= out["open_cents"]).all()
    assert (out["low_cents"] <= out["close_cents"]).all()
    assert (out["open_cents"] <= out["high_cents"]).all()
    assert (out["close_cents"] <= out["high_cents"]).all()
    ev = t(spark, sf_dir, "events").select("value").toPandas()
    cents = (ev["value"] * 100).round().astype("int64")
    assert out["n_events"].sum() == len(ev)
    assert out["volume_cents"].sum() == cents.sum()


def test_ohlc_matches_pandas_reference(spark, sf_dir):
    out = QUERIES["win_ohlc_resample"](spark, sf_dir).toPandas()
    ev = (
        t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    ev["day"] = ev["ts"].dt.floor("D")
    ref = ev.groupby(["user_id", "day"])["cents"].agg(
        open_cents="first",
        high_cents="max",
        low_cents="min",
        close_cents="last",
        n_events="size",
        volume_cents="sum",
    )
    got = out.set_index(["user_id", "day"]).sort_index()
    assert got.equals(ref.sort_index().astype("int64"))


def test_clustering_coefficient_triangle_conservation(spark, sf_dir):
    out = QUERIES["graph_clustering_coefficient"](spark, sf_dir).toPandas()
    tri = QUERIES["graph_triangle_count"](spark, sf_dir).toPandas()
    # every a<b<c triangle is credited to exactly its 3 corners
    assert out["n_triangles"].sum() == 3 * tri["n_triangles"].iloc[0]
    assert out["deg"].sum() == 2 * tri["n_edges"].iloc[0]
    assert ((out["cc_micros"] >= 0) & (out["cc_micros"] <= 1_000_000)).all()
    # a node's triangles can't exceed its wedge count
    assert (
        out["n_triangles"] <= out["deg"] * (out["deg"] - 1) // 2
    ).all()


def test_lsh_curve_matches_float_reference_and_is_monotone(spark, sf_dir):
    out = (
        QUERIES["llm_lsh_curve"](spark, sf_dir)
        .toPandas()
        .sort_values(["bands", "s_pct20"])
    )
    for _, row in out.iterrows():
        s = row["s_pct20"] / 20.0
        p = 1.0 - (1.0 - s ** row["rows_per_band"]) ** row["bands"]
        assert abs(row["p_collide_micros"] / 1e6 - p) <= 2e-6
    # collision probability is nondecreasing in similarity per config
    for _, g in out.groupby("bands"):
        assert g["p_collide_micros"].is_monotonic_increasing


def test_weighted_sample_matches_python_reference(spark, sf_dir):
    import hashlib
    import math

    out = QUERIES["llm_weighted_sample"](spark, sf_dir).toPandas()
    docs = (
        t(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .toPandas()
    )
    keys = []
    for doc_id, n_chars in docs.itertuples(index=False):
        h32 = int(hashlib.md5(f"ws:{doc_id}".encode()).hexdigest()[:8], 16)
        u = (h32 + 1) / 4294967297.0
        ln_u_nanos = round(round(math.log(u), 9) * 1_000_000_000)
        keys.append((ln_u_nanos / n_chars, doc_id, n_chars, ln_u_nanos))
    keys.sort(key=lambda k: (-k[0], k[1]))
    ref = keys[:100]
    assert len(out) == 100
    assert list(out["draw_rank"]) == list(range(1, 101))
    for row, (_, doc_id, n_chars, nanos) in zip(out.itertuples(index=False), ref):
        assert row.doc_id == doc_id
        assert row.n_chars == n_chars
        assert row.ln_u_nanos == nanos


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    # Efraimidis–Spirakis with weight = n_chars: the drawn docs must be
    # char-heavier on average than the corpus
    out = QUERIES["llm_weighted_sample"](spark, sf_dir).toPandas()
    docs = t(spark, sf_dir, "documents").select("n_chars").toPandas()
    assert out["n_chars"].mean() > docs["n_chars"].mean()


def test_matryoshka_recall_bounds_and_full_dim_identity(spark, sf_dir):
    out = (
        QUERIES["llm_matryoshka_recall"](spark, sf_dir)
        .toPandas()
        .set_index("prefix_dim")
    )
    assert sorted(out.index) == [8, 16, 32, 64]
    # full-dim list compared to itself is perfect recall by definition
    assert out.loc[64, "recall_at10_micros"] == 1_000_000
    assert (out["recall_at10_micros"] <= 1_000_000).all()
    assert (out["n_hits"] <= 10 * out["n_queries"]).all()


def test_matryoshka_matches_numpy_reference(spark, sf_dir):
    import numpy as np

    out = (
        QUERIES["llm_matryoshka_recall"](spark, sf_dir)
        .toPandas()
        .set_index("prefix_dim")
    )
    emb = t(spark, sf_dir, "embeddings").toPandas()
    mat = np.array([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    ids = emb["vec_id"].to_numpy()
    qmask = ids % 100 == 0
    for dim in (8, 16, 32, 64):
        hits = 0
        for qi in np.where(qmask)[0]:
            others = ids != ids[qi]

            def topk(d):
                x = mat[:, :d]
                qv = x[qi]
                cos = (x @ qv) / (
                    np.linalg.norm(x, axis=1) * np.linalg.norm(qv)
                )
                cand = sorted(
                    zip(np.round(cos[others], 6), -ids[others]),
                    key=lambda p: (-p[0], -p[1]),
                )
                return {int(-i) for _, i in cand[:10]}

            hits += len(topk(dim) & topk(64))
        # the op's decimal-exact cosine may resolve 6-dp ties slightly
        # differently than float64 — allow a 2-hit band
        assert abs(out.loc[dim, "n_hits"] - hits) <= 2


def test_cusum_matches_pandas_recursion(spark, sf_dir):
    out = QUERIES["win_cusum_alarm"](spark, sf_dir).toPandas()
    ev = (
        t(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    alarms = {}
    for uid, g in ev.groupby("user_id"):
        mu0 = int(g["cents"].sum()) // len(g)
        mad = int((g["cents"] - mu0).abs().sum()) // len(g)
        s = 0
        for eid, c in zip(g["event_id"], g["cents"]):
            s = max(0, s + (int(c) - mu0))
            if s > 4 * mad:
                alarms[(uid, eid)] = (s, 4 * mad)
    got = {
        (r.user_id, r.event_id): (r.s_cents, r.threshold_cents)
        for r in out.itertuples(index=False)
    }
    assert got == alarms


def test_power_analysis_matches_numpy(spark, sf_dir):
    import numpy as np

    out = QUERIES["agg_power_analysis"](spark, sf_dir).toPandas()
    ev = t(spark, sf_dir, "events").select("event_type", "value").toPandas()
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    for _, row in out.iterrows():
        g = ev.loc[ev["event_type"] == row["event_type"], "cents"].to_numpy()
        assert row["n"] == len(g)
        var = g.var(ddof=1)
        assert abs(row["var_cents2_micros"] / 1e6 - var) / var < 1e-3
        # n_per_arm must reproduce exactly from the op's own quantized
        # columns — the formula is deterministic on those
        import math

        expect = math.ceil(
            2.0 * 2.801585 * 2.801585
            * (row["var_cents2_micros"] * 1e6)
            / (float(row["delta_micros"]) * float(row["delta_micros"]))
        )
        assert row["n_per_arm"] == expect
        assert row["n_per_arm"] > 0
