"""Independent-reference and invariant checks for the r6 session-3 ops —
beyond the DuckDB differential: a pandas re-implementation for the rolling
MAD (two engines agreeing is weaker evidence than a third, structurally
different implementation agreeing), a naive-plan equivalence for the
bucketed interval join, and conservation laws for FIM / calibration /
heavy hitters.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from dbt_local_duckdb_deltalake_project_spark.catalog import t
from dbt_local_duckdb_deltalake_project_spark.operators import QUERIES


def test_anomaly_mad_matches_pandas_reference(spark, sf_dir):
    out = (
        QUERIES["win_anomaly_mad"](spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    ev = (
        t(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    med = ev.groupby("user_id")["cents"].transform(
        lambda s: s.rolling(5, min_periods=1).median()
    )
    mad = ev.groupby("user_id", group_keys=False)["cents"].apply(
        lambda s: s.rolling(5, min_periods=1).apply(
            lambda w: (pd.Series(w) - pd.Series(w).median()).abs().median(),
            raw=True,
        )
    )
    ref = pd.DataFrame(
        {
            "event_id": ev["event_id"],
            "med_cents": med,
            "mad_cents": mad.reset_index(drop=True),
            "is_anomaly": (ev["cents"] - med).abs() > 3 * mad.reset_index(drop=True),
        }
    ).sort_values("event_id")
    got = out.sort_values("event_id")
    merged = got.merge(ref, on="event_id", suffixes=("", "_ref"))
    assert len(merged) == len(got)
    assert (merged["med_cents"] == merged["med_cents_ref"]).all()
    assert (merged["mad_cents"] == merged["mad_cents_ref"]).all()
    assert (merged["is_anomaly"] == merged["is_anomaly_ref"]).all()


def test_interval_overlap_equals_naive_theta_join(spark, sf_dir):
    # the bucketed equi-join + later-start dedup rule must reproduce the
    # plain quadratic theta-join exactly (counts AND summed overlap)
    out = QUERIES["join_interval_overlap"](spark, sf_dir).toPandas()
    sup = t(spark, sf_dir, "supplier").select("s_suppkey").toPandas()
    cust = t(spark, sf_dir, "customer").select("c_custkey").toPandas()
    camp = pd.DataFrame(
        {
            "campaign_id": sup.s_suppkey,
            "sa": (sup.s_suppkey * 37) % 2000,
            "ea": (sup.s_suppkey * 37) % 2000 + (sup.s_suppkey % 45) + 5,
        }
    )
    act = pd.DataFrame(
        {
            "cb": (cust.c_custkey * 17) % 2000,
            "eb": (cust.c_custkey * 17) % 2000 + (cust.c_custkey % 30) + 3,
        }
    )
    rows = []
    for _, c in camp.iterrows():
        hit = act[(c.sa < act.eb) & (act.cb < c.ea)]
        if len(hit):
            ov = (
                pd.concat(
                    [hit.eb, pd.Series(c.ea, index=hit.index)], axis=1
                ).min(axis=1)
                - pd.concat(
                    [hit.cb, pd.Series(c.sa, index=hit.index)], axis=1
                ).max(axis=1)
            )
            rows.append((c.campaign_id, len(hit), int(ov.sum())))
    ref = pd.DataFrame(
        rows, columns=["campaign_id", "n_customers", "overlap_days"]
    )
    merged = out.merge(ref, on="campaign_id", suffixes=("", "_ref"))
    assert len(merged) == len(ref) == len(out)
    assert (merged["n_customers"] == merged["n_customers_ref"]).all()
    assert (merged["overlap_days"] == merged["overlap_days_ref"]).all()


def test_fim_partition_conserves_tokens(spark, sf_dir):
    out = QUERIES["llm_fim_transform"](spark, sf_dir)
    n_tok = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n")
    )
    bad = (
        out.join(n_tok, "doc_id")
        .filter(
            F.col("n_prefix") + F.col("n_middle") + F.col("n_suffix")
            != F.col("n")
        )
        .count()
    )
    assert bad == 0
    # every segment non-negative
    assert (
        out.filter(
            (F.col("n_prefix") < 0)
            | (F.col("n_middle") < 0)
            | (F.col("n_suffix") < 0)
        ).count()
        == 0
    )


def test_calibration_bins_conserve_vectors(spark, sf_dir):
    out = QUERIES["llm_eval_calibration"](spark, sf_dir).toPandas()
    n_vec = t(spark, sf_dir, "embeddings").count()
    assert out["n"].sum() == n_vec
    assert out["bin"].between(0, 9).all()
    assert out["avg_conf"].between(0.5, 1.0).all()
    assert out["accuracy"].between(0.0, 1.0).all()


def test_heavy_hitters_threshold_exact(spark, sf_dir):
    out = QUERIES["agg_heavy_hitters"](spark, sf_dir).toPandas()
    tok = t(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("w")
    )
    total = tok.count()
    counts = tok.groupBy("w").count().toPandas()
    expected = set(counts[counts["count"] * 50 > total]["w"])
    assert set(out["token"]) == expected
    assert (out["cnt"] * 50 > total).all()
