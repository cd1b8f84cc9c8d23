"""Plan assertions for the r6 session-5 batch — pin the physical
properties each docstring claims (pre-aggregation before windows,
broadcast marginals, WindowGroupLimit caps, single-key shuffle reuse)
so plan regressions fail CI before they fail a cluster.
"""

from __future__ import annotations

from .test_plans_r6 import nodes


def test_weighted_median_preaggregates_before_window(spark, sf_dir):
    # raw rows collapse to distinct (flag, cents) map-side BEFORE the
    # cumulative window; the 3-row totals broadcast back.
    n = nodes(spark, sf_dir, "agg_weighted_median")
    assert n["partial_sum"] >= 1
    assert n["Window"] == 1
    assert n["BroadcastHashJoin"] >= 1
    assert n["SortMergeJoin"] == 0 and n["ShuffledHashJoin"] == 0


def test_mann_kendall_daily_preagg_and_no_cartesian(spark, sf_dir):
    # the pairwise join runs on the DAILY table (events pre-aggregated
    # map-side first) and is keyed on user_id — never a cartesian.
    n = nodes(spark, sf_dir, "agg_mann_kendall")
    assert n["partial_sum"] >= 1
    assert n["CartesianProduct"] == 0
    assert n["BroadcastNestedLoopJoin"] == 0


def test_resource_allocation_caps_and_broadcasts(spark, sf_dir):
    # the 8-per-customer cap pushes into the window sort as
    # WindowGroupLimit; the per-customer degree broadcasts onto the
    # wedge join; top-20 is TakeOrderedAndProject.
    n = nodes(spark, sf_dir, "graph_resource_allocation")
    assert n["WindowGroupLimit"] >= 1
    assert n["BroadcastHashJoin"] >= 1
    assert n["TakeOrderedAndProject"] == 1
    assert n["CartesianProduct"] == 0


def test_kneser_ney_marginals_broadcast(spark, sf_dir):
    # c1 and the right-continuation marginal broadcast onto the bigram
    # table; T is the single 1-row nested-loop; top-50 distributed.
    n = nodes(spark, sf_dir, "llm_kneser_ney")
    assert n["BroadcastHashJoin"] >= 2
    assert n["BroadcastNestedLoopJoin"] == 1
    assert n["TakeOrderedAndProject"] == 1
    assert n["SortMergeJoin"] == 0 and n["ShuffledHashJoin"] == 0


def test_isotonic_data_pass_is_one_fold(spark, sf_dir):
    # the only corpus-sized work is the map-side bin fold; the PAV
    # minimax runs on broadcast 20-row tables (the non-equi joins are
    # nested-loop over broadcast, never a shuffle).
    n = nodes(spark, sf_dir, "llm_calibration_isotonic")
    assert n["partial_count"] >= 1
    assert n["SortMergeJoin"] == 0 and n["ShuffledHashJoin"] == 0
    assert n["CartesianProduct"] == 0


def test_cdc_chunks_window_is_doc_partitioned(spark, sf_dir):
    # one doc_id-partitioned LAG window (both boundary-lag uses collapse
    # into a single Window node) and map-side-combined dedup folds.
    n = nodes(spark, sf_dir, "llm_cdc_chunks")
    assert n["Window"] == 1
    assert n["partial_count"] >= 1
    assert not any(k.endswith("Join") or k == "CartesianProduct" for k in n)


def test_scene_split_single_shuffle_lineage(spark, sf_dir):
    # the media_id exchange is planted once: both windows and both
    # rollups (grouping keys are supersets of media_id) reuse it.
    n = nodes(spark, sf_dir, "mm_scene_split")
    assert n["Exchange hashpartitioning"] == 1
    assert n["Window"] == 2
    assert not any(k.endswith("Join") or k == "CartesianProduct" for k in n)
