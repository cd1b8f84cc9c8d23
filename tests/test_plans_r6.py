"""Plan assertions for the r6 operator additions (SURVEY.md §5.4): pin the
physical-plan properties each op's docstring claims for 100 TB — broadcasted
small sides, map-side partial aggregation, bounded window work, zero
unnecessary shuffles — so a silent plan regression fails CI, not the cluster.
"""

from __future__ import annotations

import re
from collections import Counter

from dbt_local_duckdb_deltalake_project_spark.operators import QUERIES

_NODES = re.compile(
    r"\b(TakeOrderedAndProject|BroadcastHashJoin|SortMergeJoin"
    r"|ShuffledHashJoin|CartesianProduct|BroadcastNestedLoopJoin"
    r"|WindowGroupLimit|Window|Exchange hashpartitioning"
    r"|Exchange rangepartitioning|partial_count|partial_sum|partial_max)\b"
)


def nodes(spark, sf_dir, qid) -> Counter:
    df = QUERIES[qid](spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    return Counter(_NODES.findall(p))


def test_common_neighbors_topk_is_distributed(spark, sf_dir):
    # top-20 by jaccard must be TakeOrderedAndProject (no global sort
    # materialization), the per-customer 8-cap must push into the window
    # sort as WindowGroupLimit, and the degree joins must broadcast —
    # the wedge join itself is the only legitimate non-broadcast join.
    n = nodes(spark, sf_dir, "graph_common_neighbors")
    assert n["TakeOrderedAndProject"] == 1
    assert n["WindowGroupLimit"] >= 1
    assert n["BroadcastHashJoin"] >= 2
    assert n["CartesianProduct"] == 0 and n["BroadcastNestedLoopJoin"] == 0


def test_fertility_is_one_mapside_agg_no_join(spark, sf_dir):
    # per-row codegen counts + a single lang-keyed agg: exactly one hash
    # shuffle, partial (map-side) sums, and no join anywhere.
    n = nodes(spark, sf_dir, "llm_tokenizer_fertility")
    assert n["Exchange hashpartitioning"] == 1
    assert n["partial_sum"] >= 1
    assert not any(
        k.endswith("Join") or k == "CartesianProduct" for k in n
    )


def test_linear_classifier_weights_broadcast(spark, sf_dir):
    # the weight table joins the exploded token stream map-side; the
    # per-doc fold is algebraic (partial sums before the doc_id shuffle).
    n = nodes(spark, sf_dir, "llm_linear_classifier_score")
    assert n["BroadcastHashJoin"] >= 1
    assert n["SortMergeJoin"] == 0 and n["ShuffledHashJoin"] == 0
    assert n["partial_sum"] >= 1


def test_rolling_median_single_partitioned_window(spark, sf_dir):
    # the 4 lags + row_number share ONE Window operator over the
    # user_id-partitioned sort — no unpartitioned window, no second sort.
    n = nodes(spark, sf_dir, "win_rolling_median")
    assert n["Window"] == 1
    assert n["Exchange hashpartitioning"] == 1


def test_winsorized_bounds_fold_and_broadcast(spark, sf_dir):
    # rows pre-collapse map-side to distinct (type, cents) counts before
    # the cumulative window; per-type totals and cut bounds broadcast
    # back — never a shuffle join, never a raw-row window.
    n = nodes(spark, sf_dir, "agg_winsorized_mean")
    assert n["partial_count"] + n["partial_sum"] >= 1
    assert n["BroadcastHashJoin"] >= 1
    assert n["SortMergeJoin"] == 0 and n["ShuffledHashJoin"] == 0


def test_gopher_filter_is_pure_mapside(spark, sf_dir):
    # per-document rule evaluation: zero joins, zero hash shuffles — the
    # only exchange allowed is the final presentation sort.
    n = nodes(spark, sf_dir, "llm_filter_gopher")
    assert n["Exchange hashpartitioning"] == 0
    assert not any(
        k.endswith("Join") or k == "CartesianProduct" for k in n
    )


def test_rouge2_two_keyed_shuffles_no_join(spark, sf_dir):
    # both sides of a pair count in one (pair_id, bigram) shuffle via
    # conditional sums, then fold per pair — joins would double the
    # traffic, so their absence is the design.
    n = nodes(spark, sf_dir, "llm_eval_rouge2")
    assert n["Exchange hashpartitioning"] == 2
    assert n["partial_sum"] >= 2
    assert not any(
        k.endswith("Join") or k == "CartesianProduct" for k in n
    )


def test_no_unpartitioned_windows_registry_wide(spark, sf_dir):
    # A Window with an ORDER BY but no PARTITION BY serializes its whole
    # input through one task — the classic silent scale-killer (VERDICT
    # r5 flagged two; both were rewritten). Scan EVERY registered op's
    # physical plan: a Window node whose trailing spec group is an order
    # spec (contains ASC/DESC) with no partition group in between is
    # unpartitioned. Registry-wide zero as of r6 — keep it that way.
    bad = {}
    for qid, fn in QUERIES.items():
        try:
            p = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception:  # noqa: BLE001 — op build issues belong to test_oracle
            continue
        for ln in p.splitlines():
            s = ln.strip().lstrip("+-:* ")
            if s.startswith("Window "):
                groups = re.split(r"\], \[", s)
                # `Window [exprs], [part], [order]` — empty groups are
                # omitted from toString, so 1 group = no partition at
                # all (order-less global frame: SinglePartition
                # exchange, found r7 in agg_chisq), and 2 groups whose
                # second is an order spec = ordered but unpartitioned.
                if len(groups) == 1 or (
                    len(groups) == 2
                    and (" ASC" in groups[1] or " DESC" in groups[1])
                ):
                    bad.setdefault(qid, []).append(s[:120])
    assert not bad, f"unpartitioned Window in: {sorted(bad)}"


def test_containment_candidate_join_is_equi(spark, sf_dir):
    # the shingle self-join must plan as an equi join on the shingle key
    # (candidate generation bounded by NEARDUP_DF_CAP), never a nested
    # loop, with the shared-shingle count partially aggregated.
    n = nodes(spark, sf_dir, "llm_dedup_containment")
    assert n["CartesianProduct"] == 0 and n["BroadcastNestedLoopJoin"] == 0
    assert n["partial_count"] >= 1
