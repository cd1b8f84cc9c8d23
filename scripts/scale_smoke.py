#!/usr/bin/env python
"""Scale smoke: run representative operators at ~10x the largest fixture.

Replicates documents/embeddings/customer (shifted keys, so dedup keys
and graph structure stay realistic) into .work/scale10 and times a
representative operator set against it. This is NOT the bench — it is
the "would the plan survive a 10x scale-up" check: a hidden quadratic,
a driver-side collect, or an overflow shows up here long before 100 TB.

Usage: python scripts/scale_smoke.py [factor]   (default 10, on sf0.1)
Prints one line per op and a final JSON summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# restrict to named ops: scale_smoke.py [factor] [qid ...]
ONLY = set(sys.argv[2:])

# ops chosen to cover the risk classes: shuffle-heavy dedup, iterative
# graph, banded LSH, blocked ANN, windowed agg, spatial bin join.
OPS = [
    # late-r10 additions: pairwise-slope self-join, range-partition
    # global rank + DECIMAL moments, positional 5-gram assembly
    "win_theil_sen",
    "agg_zipf_fit",
    "llm_boilerplate_phrases",
    "llm_dedup_exact",
    "llm_dedup_near",
    "llm_minhash_signature_sql",
    "graph_connected_components",
    "llm_cosine_topk_blocked",
    "join_spatial_grid",
    "win_sessionize",
    "agg_count_min_sketch",
    "llm_span_corruption_mask",
    "llm_fingerprint_winnow_sql",
    "llm_simhash_portable",
    "llm_dedup_semantic",
    "llm_importance_resample",
    "fn_geohash",
    "delta_merge_matched_delete",
    # r6 adds: asymmetric containment (same capped-index risk class as
    # dedup_near), frontier BFS (iterative graph), classifier inference
    # (broadcast join + explode), pareto two-pass cumsum (range
    # partition + offsets)
    "llm_dedup_containment",
    "graph_bfs_shortest_path",
    "llm_linear_classifier_score",
    "win_pareto_analysis",
    # late-r6 adds: NLL bucket (vocab join + lang window), ROUGE-2
    # (bigram pair shuffle), winsorize (low-cardinality rank window —
    # the skewed-partition risk class), rolling median (per-user
    # frame), common-neighbor wedge join (sparsified)
    "llm_ccnet_bucket",
    "llm_eval_rouge2",
    "agg_winsorized_mean",
    "win_rolling_median",
    "graph_common_neighbors",
    # staged-old-labels incremental CC (cold-builds its label staging
    # for the replicated fixture, then runs the increment over it)
    "llm_dedup_clusters_incremental",
    # session-3 adds: decimal power-sum outlier screen (overflow risk
    # class), broadcast-matmul confusion (10x vectors × 10 centroids),
    # bigram BLEU fold, per-user MAD frames over 10x events, bucketed
    # interval×interval join, vocab-bounded heavy hitters
    "llm_embed_outliers",
    "llm_eval_confusion",
    "llm_hard_negatives",
    "llm_eval_ndcg",
    "llm_eval_bleu",
    "win_anomaly_mad",
    "join_interval_overlap",
    "agg_heavy_hitters",
    # session-3 tail + session-4 adds: RRF rank fusion (two ranked
    # lists over 10x docs), shard packing (global rank offsets), rank
    # windows for the U/KS statistics over 10x events, per-(user, day)
    # OHLC candles
    "llm_rrf_fusion",
    "llm_shard_balance",
    "agg_mann_whitney",
    "agg_ks_2sample",
    "agg_chisq_independence",
    "win_ohlc_resample",
    # session-4 tail + session-5 adds: fixed-panel prefix-dim recall
    # (brute-force pair stage — the quadratic risk this smoke exists
    # for), iterative BPE learning, per-position CDC hashing, corner
    # triangle enumeration, wedge RA join, day-pair Mann-Kendall,
    # distinct-value median window, frame-explode scene split, bigram
    # marginal joins, CUSUM stacked windows over 10x events
    "llm_matryoshka_recall",
    "llm_bpe_learn",
    "llm_cdc_chunks",
    "graph_clustering_coefficient",
    "graph_resource_allocation",
    "agg_mann_kendall",
    "agg_weighted_median",
    "mm_scene_split",
    "llm_kneser_ney",
    "llm_calibration_isotonic",
    "win_cusum_alarm",
    # r7 hardening: mean_micros quotient-remainder form (overflow risk
    # class — the 10x sum of cents is the domain the split protects)
    "agg_power_analysis",
    # r7 hardening: global total via 1-row broadcast (ex-unpartitioned
    # window), decode mapInPandas over 10x payloads, exact-cents uplift
    # through a 10x copy-on-write commit
    "agg_chisq_independence",
    "mm_decode_features",
    "delta_update",
    # r9 adds: sorted-adjacency prefix dedup (global-sort risk class —
    # since r10 the range-partition boundary-handoff form), the
    # cents-rescaled yoy lag (headroom check), and the staged neardup
    # pair/label cache cold-built for the replicated fixture then
    # consumed
    "llm_dedup_prefix",
    "win_yoy_growth",
    "llm_dedup_clusters",
    # r10 adds: BPE apply (cold-learns + stages the merge table on the
    # replicated fixture, then the 3-replace codegen chain over 10x
    # docs), k-anonymity (quasi-identifier group explosion over 10x
    # customers — output stays domain-bounded), and the microbatch
    # incremental (dynamic partition overwrite over 10x events — the
    # per-batch commit must stay O(day slice))
    "llm_bpe_apply",
    "llm_kanonymity_audit",
    "dbt_microbatch_incremental",
    # suffix dedup re-sorts the 10x distinct texts under reverse(text)
    # through the same shared range-partition adjacency helper
    "llm_dedup_suffix",
    # r11 adds: cross-doc span excision (gram-owner join + coverage
    # anti-join — the corpus-token-volume risk class), IVF-PQ ADC scan
    # (Lloyd pass + per-batch encode), bigram-draft acceptance (vocab
    # predictor join over all positions), interleave packing (bucket
    # prefix sums), IGNORE NULLS carry, wedge-join Adamic-Adar, two
    # HITS iterations, conformal rank selection, IPW cell folds
    "llm_dedup_span_removal",
    "llm_cosine_topk_ivfpq",
    "llm_speculative_ngram_accept",
    "mm_interleave_pack",
    "win_attribution",
    "graph_adamic_adar",
    "graph_hits",
    "agg_conformal_interval",
    "agg_ipw_ate",
    # r12 adds: mask-enumeration Viterbi EM (sample x compositions
    # explode — the bounded-sample-by-design class), sketch-size merged
    # quantile summaries, bigram PMI margins, SQ8 crossmodal candidate
    # scan, greenlist watermark pass, push-PPR, JM occurrence join,
    # TextTiling adjacent-block self-join, IGNORE-NULLS 1-NN matching,
    # cell-table raking sweeps
    "llm_unigram_lm_learn",
    "agg_quantile_sketch_merge",
    "llm_pmi_collocations",
    "mm_crossmodal_topk",
    "llm_watermark_detect",
    "graph_personalized_pagerank",
    "llm_ngram_lm_interpolated",
    "llm_texttiling_segments",
    "agg_att_nn_matching",
    "agg_raking_ipf",
]


def main() -> None:
    from pyspark.sql import functions as F

    from dbt_local_duckdb_deltalake_project_spark.session import get_spark
    from dbt_local_duckdb_deltalake_project_spark.sources.workspace import workdir

    spark = get_spark(app_name="scale_smoke")
    out = workdir(BASE, f"scale{FACTOR}", fresh=False)

    def stage(name: str, key: str) -> None:
        dst = f"{out}/{name}.parquet"
        if os.path.exists(f"{dst}/_SUCCESS"):
            return
        src = spark.read.parquet(f"{BASE}/{name}.parquet")
        n = src.agg(F.max(key)).first()[0] + 1
        rep = src.crossJoin(
            spark.range(FACTOR).select(F.col("id").alias("_r"))
        ).withColumn(key, F.col(key) + F.col("_r") * n).drop("_r")
        rep.write.mode("overwrite").parquet(dst)

    t0 = time.perf_counter()
    for name, key in (
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
        ("customer", "c_custkey"),
        ("supplier", "s_suppkey"),
        ("events", "event_id"),
    ):
        stage(name, key)
    # the catalog registers every fixture table for a dir — link the
    # rest through at 1x (they are not what this smoke stresses)
    for name in (
        "region", "nation", "part", "orders", "lineitem",
    ):
        dst = f"{out}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{name}.parquet", dst)
    print(f"staging: {time.perf_counter() - t0:.1f}s", flush=True)

    from dbt_local_duckdb_deltalake_project_spark.operators import QUERIES

    results: dict[str, dict] = {}
    for qid in [q for q in OPS if not ONLY or q in ONLY]:
        t0 = time.perf_counter()
        try:
            n = QUERIES[qid](spark, out).count()
            sec = round(time.perf_counter() - t0, 2)
            results[qid] = {"sec": sec, "rows": n}
            print(f"{qid}: {sec}s, {n} rows", flush=True)
        except Exception as e:  # noqa: BLE001
            results[qid] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(f"{qid}: ERROR {e}", flush=True)
    print(json.dumps({"factor": FACTOR, "base": BASE, "ops": results}))


if __name__ == "__main__":
    main()
