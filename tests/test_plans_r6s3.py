"""Plan assertions for the r6 session-3 operator additions: same contract
as test_plans_r6 — pin the physical-plan properties each docstring claims
(broadcast small sides, map-side partials, single partitioned windows,
no nested loops) so plan regressions fail CI before they fail a cluster.
"""

from __future__ import annotations

from .test_plans_r6 import nodes


def test_token_f1_folds_are_partial_aggregated(spark, sf_dir):
    # both (pair,token) and pair-level folds must partial-aggregate
    # map-side; no nested-loop join anywhere.
    n = nodes(spark, sf_dir, "llm_eval_token_f1")
    assert n["partial_sum"] >= 1
    assert n["CartesianProduct"] == 0 and n["BroadcastNestedLoopJoin"] == 0


def test_bleu_folds_are_partial_aggregated(spark, sf_dir):
    n = nodes(spark, sf_dir, "llm_eval_bleu")
    assert n["partial_sum"] >= 1
    assert n["CartesianProduct"] == 0 and n["BroadcastNestedLoopJoin"] == 0


def test_readability_is_pure_mapside(spark, sf_dir):
    # per-document arithmetic: no joins, no aggregation shuffle, no
    # window — only the presentation sort.
    n = nodes(spark, sf_dir, "llm_readability")
    assert n["Exchange hashpartitioning"] == 0
    assert n["Window"] == 0
    assert not any(k.endswith("Join") or k == "CartesianProduct" for k in n)


def test_embed_outliers_broadcasts_stats(spark, sf_dir):
    # the 640-row (label,pos) stats and the 10-row label totals must
    # broadcast back; the squared-deviation fold partial-aggregates.
    n = nodes(spark, sf_dir, "llm_embed_outliers")
    assert n["BroadcastHashJoin"] >= 2
    assert n["partial_sum"] >= 1
    assert n["Window"] == 0
    assert n["SortMergeJoin"] == 0 and n["ShuffledHashJoin"] == 0


def test_eval_confusion_broadcast_matmul_no_window(spark, sf_dir):
    # centroids broadcast to the exploded stream (matmul shape) and the
    # per-vec argmin is min(struct) — never a rank window.
    n = nodes(spark, sf_dir, "llm_eval_confusion")
    assert n["BroadcastHashJoin"] >= 2
    assert n["Window"] == 0
    assert n["CartesianProduct"] == 0 and n["BroadcastNestedLoopJoin"] == 0


def test_heavy_hitters_scalar_total_broadcasts(spark, sf_dir):
    # vocab-bounded count fold (map-side partials) + ONE broadcast of
    # the 1-row total (nested-loop against a scalar is the right plan);
    # no rank window.
    n = nodes(spark, sf_dir, "agg_heavy_hitters")
    assert n["partial_count"] >= 1
    assert n["BroadcastNestedLoopJoin"] == 1
    assert n["Window"] == 0


def test_anomaly_mad_single_partitioned_window(spark, sf_dir):
    # both unrolled frames (median + MAD) ride ONE user_id-partitioned
    # window sort — no second sort, no unpartitioned window.
    n = nodes(spark, sf_dir, "win_anomaly_mad")
    assert n["Window"] == 1
    assert n["Exchange hashpartitioning"] == 1


def test_label_propagation_no_nested_loops(spark, sf_dir):
    # k bounded join+agg rounds; every join is a hash join on src
    # (never a nested loop), every min-fold partial-aggregates.
    n = nodes(spark, sf_dir, "graph_label_propagation")
    assert n["CartesianProduct"] == 0 and n["BroadcastNestedLoopJoin"] == 0


def test_degree_stats_folds_partial(spark, sf_dir):
    n = nodes(spark, sf_dir, "graph_degree_stats")
    assert n["partial_count"] >= 1
    assert n["CartesianProduct"] == 0 and n["BroadcastNestedLoopJoin"] == 0


def test_interval_overlap_is_bucket_equijoin(spark, sf_dir):
    # the whole point of the op: the overlap predicate must run as a
    # broadcast hash EQUI-join on the bucket id, never a nested loop.
    n = nodes(spark, sf_dir, "join_interval_overlap")
    assert n["BroadcastHashJoin"] == 1
    assert n["SortMergeJoin"] == 0
    assert n["CartesianProduct"] == 0 and n["BroadcastNestedLoopJoin"] == 0


def test_semantic_metric_single_scan_fanout(spark, sf_dir):
    # three metrics from ONE aggregated pass (stack, not re-scans): no
    # window, no nested loop, at most the join + agg exchanges.
    n = nodes(spark, sf_dir, "dbt_semantic_metric")
    assert n["Window"] == 0
    assert n["CartesianProduct"] == 0 and n["BroadcastNestedLoopJoin"] == 0


def test_audio_chunk_plan_pure_mapside(spark, sf_dir):
    # metadata-only chunk planning: explode is map-side; no joins, no
    # aggregation shuffle.
    n = nodes(spark, sf_dir, "mm_audio_chunk_plan")
    assert n["Exchange hashpartitioning"] == 0
    assert not any(k.endswith("Join") or k == "CartesianProduct" for k in n)


def test_ndcg_two_user_windows_only(spark, sf_dir):
    # model-rank + ideal-rank are the only two windows, both partitioned
    # by user_id; the folds partial-aggregate.
    n = nodes(spark, sf_dir, "llm_eval_ndcg")
    assert n["Window"] == 2
    assert n["partial_sum"] >= 1
    assert n["CartesianProduct"] == 0 and n["BroadcastNestedLoopJoin"] == 0


def test_hard_negatives_query_slice_broadcasts(spark, sf_dir):
    # the 2% query slice broadcasts to the exploded corpus; the only
    # window is the per-query top-2 rank.
    n = nodes(spark, sf_dir, "llm_hard_negatives")
    assert n["BroadcastHashJoin"] >= 1
    assert n["partial_sum"] >= 1
    assert n["Window"] == 1
    assert n["CartesianProduct"] == 0 and n["BroadcastNestedLoopJoin"] == 0


def test_calibration_broadcast_and_one_rank_window(spark, sf_dir):
    n = nodes(spark, sf_dir, "llm_eval_calibration")
    assert n["BroadcastHashJoin"] >= 1
    assert n["Window"] == 1
    assert n["CartesianProduct"] == 0 and n["BroadcastNestedLoopJoin"] == 0


def test_arrow_udf_plans_as_arrow_eval(spark, sf_dir):
    # useArrow=True must plan as ArrowEvalPython (Arrow batch exec),
    # not the pickled-row BatchEvalPython of the legacy surface.
    from dbt_local_duckdb_deltalake_project_spark.operators import QUERIES

    p = (
        QUERIES["udf_python_arrow"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in p
    assert "BatchEvalPython" not in p


def test_funnel_steps_user_keyed_chain(spark, sf_dir):
    # three min-agg stages joined on the one user key; the 3-row
    # summary must come from broadcast crossJoins of scalar aggregates
    # (BroadcastNestedLoopJoin against 1-row frames), never a window.
    n = nodes(spark, sf_dir, "agg_funnel_steps")
    assert n["Window"] == 0
    assert n["CartesianProduct"] == 0
    assert n["BroadcastNestedLoopJoin"] >= 1


def test_kcore_rounds_are_hash_joins(spark, sf_dir):
    n = nodes(spark, sf_dir, "graph_kcore_peel")
    assert n["partial_count"] >= 1
    assert n["CartesianProduct"] == 0 and n["BroadcastNestedLoopJoin"] == 0


def test_target_encode_broadcast_fold(spark, sf_dir):
    # segment stats broadcast back over the fact stream; the fold
    # partial-aggregates; LOO needs no window at all.
    n = nodes(spark, sf_dir, "agg_target_encode_loo")
    assert n["BroadcastHashJoin"] >= 1
    assert n["partial_sum"] >= 1
    assert n["Window"] == 0


def test_token_offsets_doc_partitioned_window(spark, sf_dir):
    # one running-sum window partitioned by doc_id — never a global sort
    # over the token stream.
    n = nodes(spark, sf_dir, "llm_token_offsets")
    assert n["Window"] == 1
    assert not any(k.endswith("Join") or k == "CartesianProduct" for k in n)


def test_fim_transform_pure_mapside(spark, sf_dir):
    n = nodes(spark, sf_dir, "llm_fim_transform")
    assert n["Exchange hashpartitioning"] == 0
    assert n["Window"] == 0
    assert not any(k.endswith("Join") or k == "CartesianProduct" for k in n)


def test_seasonality_two_folds_broadcast(spark, sf_dir):
    n = nodes(spark, sf_dir, "agg_seasonality_profile")
    assert n["BroadcastHashJoin"] >= 1
    assert n["partial_sum"] >= 1
    assert n["Window"] == 0


def test_rrf_rank_windows_all_query_partitioned(spark, sf_dir):
    # three rank windows, each partitioned by qid; term hits and the
    # anchor vectors broadcast; no nested loop beyond the tiny
    # doc×query frame builder.
    n = nodes(spark, sf_dir, "llm_rrf_fusion")
    assert n["Window"] == 3
    assert n["BroadcastHashJoin"] >= 2
    assert n["CartesianProduct"] == 0


def test_shard_balance_no_global_window(spark, sf_dir):
    # the global rank must come from the two-pass range-partition form:
    # every Window is pid-partitioned, never a single-partition sort.
    from dbt_local_duckdb_deltalake_project_spark.operators import QUERIES

    df = QUERIES["llm_shard_balance"](spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in p
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", p):
        assert m.group(1).strip(), "unpartitioned Window in shard_balance"


def test_file_metadata_no_window(spark, sf_dir):
    n = nodes(spark, sf_dir, "scan_file_metadata")
    assert n["Window"] == 0
