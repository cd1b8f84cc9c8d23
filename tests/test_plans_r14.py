"""r14 optimization-round plan guards.

The r14 changes are strategy pins and reformulations whose VALUE is
already proven by the oracle differential; these tests pin the PLAN
properties the optimizations bought, so a silent regression (a
ballooned estimate degrading a broadcast back to SortMergeJoin, or the
unigram learner re-growing its window/self-join shape) fails loudly.
"""

from __future__ import annotations

from dbt_local_duckdb_deltalake_project_spark.operators import QUERIES


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_iterative_graph_family_broadcasts_node_sized_iterate(
    spark, sf_dir
):
    # r14: the per-round join of the edge-sized table against the
    # node-sized iterate (rank/label/keep/degree/seed) must be a
    # broadcast — a SortMergeJoin here reshuffles the checkpointed
    # edge list every iteration (measured 2x CPU on pagerank).
    for qid in (
        "graph_pagerank",
        "graph_label_propagation",
        "graph_kcore_peel",
        "graph_hits",
        "graph_modularity",
    ):
        p = plan(QUERIES[qid](spark, sf_dir))
        assert "SortMergeJoin" not in p, qid
        assert "BroadcastHashJoin" in p, qid


def test_pagerank_and_bfs_iterate_on_long_node_keys(spark, sf_dir):
    # r14: node ids stay 8-byte longs through every round; the oracle's
    # string labels render once at the OUTPUT projection. If string
    # keys leaked back into the iteration, the per-round equi-joins
    # would hash/sort on concat(...) expressions — assert every join
    # in both plans is a broadcast hash join (long keys keep the
    # node-sized side trivially broadcastable) and the only concat
    # sites are output-side: in pagerank (no union) the final render
    # is a single site; in BFS the output projection is pushed below
    # the 5-branch union (seed + 4 frontiers), so ≤ 6 sites, all
    # output-side because no join key is a string.
    p_pr = plan(QUERIES["graph_pagerank"](spark, sf_dir))
    assert p_pr.count("concat(") <= 2
    assert "SortMergeJoin" not in p_pr
    assert "BroadcastHashJoin" in p_pr
    # BFS executes its rounds inside eager frontier checkpoints, so
    # the returned plan is just the dist union + output render: assert
    # the render stays output-side (one pushed-down concat per union
    # branch, never a string join key) and joinless.
    p_bfs = plan(QUERIES["graph_bfs_shortest_path"](spark, sf_dir))
    assert p_bfs.count("concat(") <= 6
    assert "Join" not in p_bfs


def test_unigram_learner_plans_no_rank_window(spark, sf_dir):
    # r14: the per-doc Viterbi argmin is a fused min(struct(cost,
    # mask)) hash aggregation and the corpus-expansion path reuses the
    # single doc_id repartition via the subset rule — no Window node
    # (the old row_number rank) anywhere in the plan.
    p = plan(QUERIES["llm_unigram_lm_learn"](spark, sf_dir))
    assert "Window" not in p
