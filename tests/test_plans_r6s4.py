"""Plan assertions for the r6 session-4 statistics battery — same
contract as test_plans_r6: pin the physical properties the docstrings
claim (rank windows partitioned by the cohort key, pre-aggregation
before cumulative windows, broadcast scalar/side tables, map-side
partials) so plan regressions fail CI before they fail a cluster.
"""

from __future__ import annotations

from .test_plans_r6 import nodes


def test_mann_whitney_single_rank_pass_no_joins(spark, sf_dir):
    # doubled-rank windows over the cohort shuffle, then one algebraic
    # groupBy — no join anywhere in the plan.
    n = nodes(spark, sf_dir, "agg_mann_whitney")
    assert n["Window"] >= 1
    assert not any(k.endswith("Join") or k == "CartesianProduct" for k in n)


def test_ks_preaggregates_before_cumulative_window(spark, sf_dir):
    # ECDF counts collapse to distinct (cohort, cents) rows map-side
    # BEFORE the cumulative window, and the per-cohort totals broadcast.
    n = nodes(spark, sf_dir, "agg_ks_2sample")
    assert n["partial_count"] >= 1
    assert n["BroadcastHashJoin"] >= 1
    assert n["SortMergeJoin"] == 0 and n["ShuffledHashJoin"] == 0
    assert n["CartesianProduct"] == 0 and n["BroadcastNestedLoopJoin"] == 0


def test_chisq_contingency_is_mapside_then_tiny(spark, sf_dir):
    # the only full-data pass is the map-side-combined cell count; the
    # dof scalar AND the global total each ride a 1-row broadcast
    # nested-loop join (the total moved off the order-less
    # unpartitioned window in r7 — the last WindowExec bench warning).
    # >= 2 rather than == 2 (ADVICE r7): the pinned property is
    # "map-side partial, then tiny broadcast joins, never a
    # single-partition window/shuffle" — an AQE change that collapses
    # or adds a 1-row join must not flip the test while that holds.
    n = nodes(spark, sf_dir, "agg_chisq_independence")
    assert n["partial_count"] >= 1
    assert n["BroadcastNestedLoopJoin"] >= 2
    assert n["SortMergeJoin"] == 0 and n["ShuffledHashJoin"] == 0


def test_benford_digit_spine_broadcasts(spark, sf_dir):
    # 9-row spine joins the digit counts via broadcast hash; the 1-row
    # total rides a broadcast nested-loop; map-side partial counts.
    n = nodes(spark, sf_dir, "agg_benford_law")
    assert n["partial_count"] >= 1
    assert n["BroadcastHashJoin"] >= 1
    assert n["BroadcastNestedLoopJoin"] == 1
    assert n["SortMergeJoin"] == 0 and n["ShuffledHashJoin"] == 0


def test_ohlc_two_copartitioned_windows_no_join(spark, sf_dir):
    # both row-number passes and the groupBy share the (user, day) key:
    # windows collapse onto one shuffle; no join anywhere.
    n = nodes(spark, sf_dir, "win_ohlc_resample")
    assert n["Window"] >= 1
    assert not any(k.endswith("Join") or k == "CartesianProduct" for k in n)


def test_clustering_coefficient_broadcasts_triangle_credits(spark, sf_dir):
    # per-node triangle credits (bounded by the sparsified graph) must
    # broadcast back onto the degree table; no cartesian anywhere.
    n = nodes(spark, sf_dir, "graph_clustering_coefficient")
    assert n["BroadcastHashJoin"] >= 1
    assert n["CartesianProduct"] == 0 and n["BroadcastNestedLoopJoin"] == 0


def test_lsh_curve_is_pure_compute(spark, sf_dir):
    # a 76-row analytic table: no data scan, no hash shuffle, no join.
    n = nodes(spark, sf_dir, "llm_lsh_curve")
    assert n["Exchange hashpartitioning"] == 0
    assert not any(k.endswith("Join") or k == "CartesianProduct" for k in n)


def test_weighted_sample_is_take_ordered(spark, sf_dir):
    # global weighted top-100 must be TakeOrderedAndProject (per-
    # partition top-k + driver merge), never a full global sort
    n = nodes(spark, sf_dir, "llm_weighted_sample")
    assert n["TakeOrderedAndProject"] >= 1


def test_matryoshka_single_pass_broadcast_queries(spark, sf_dir):
    # query positions and per-(query,dim) norms broadcast; the one big
    # aggregation is the pair table (map-side partials); the only
    # nested-loop is the 1-row n_queries scalar
    n = nodes(spark, sf_dir, "llm_matryoshka_recall")
    assert n["BroadcastHashJoin"] >= 2
    assert n["BroadcastNestedLoopJoin"] == 1
    assert n["CartesianProduct"] == 0


def test_cusum_single_user_shuffle(spark, sf_dir):
    # baselines broadcast back; both window passes and the final join
    # share the user_id sort — no sort-merge join anywhere
    n = nodes(spark, sf_dir, "win_cusum_alarm")
    assert n["Window"] >= 1
    assert n["BroadcastHashJoin"] >= 2
    assert n["SortMergeJoin"] == 0 and n["ShuffledHashJoin"] == 0


def test_power_analysis_broadcasts_means(spark, sf_dir):
    # the 5-row means table broadcasts back onto the deviation pass;
    # both groupBys partial-aggregate map-side
    n = nodes(spark, sf_dir, "agg_power_analysis")
    assert n["BroadcastHashJoin"] >= 1
    assert n["partial_count"] + n["partial_sum"] >= 1
    assert n["SortMergeJoin"] == 0 and n["ShuffledHashJoin"] == 0
