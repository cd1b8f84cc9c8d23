"""Independent-reference checks for the late r6 session-4 additions
(llm_bpe_learn / mm_tile_plan) — a pure-Python third implementation per
op so Spark/DuckDB agreement isn't just two engines sharing a bug.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbt_local_duckdb_deltalake_project_spark.catalog import t
from dbt_local_duckdb_deltalake_project_spark.operators import QUERIES


def _bpe_reference(texts: list[str], rounds: int = 3):
    """Greedy BPE learning, the textbook sequential form (Sennrich et
    al.): count adjacent pairs, adopt the most frequent (count desc,
    then lexicographic (a, b)), apply left-to-right greedily, repeat."""
    docs = [list(s[:64]) for s in texts]
    out = []
    for r in range(1, rounds + 1):
        counts: dict[tuple[str, str], int] = {}
        for d in docs:
            for a, b in zip(d, d[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        n_merges = 0
        new_docs = []
        for d in docs:
            nd, i = [], 0
            while i < len(d):
                if i + 1 < len(d) and d[i] == a and d[i + 1] == b:
                    nd.append(a + b)
                    n_merges += 1
                    i += 2
                else:
                    nd.append(d[i])
                    i += 1
            new_docs.append(nd)
        docs = new_docs
        out.append((r, a, b, c, n_merges, sum(len(d) for d in docs)))
    return out


def test_bpe_learn_matches_sequential_reference(spark, sf_dir):
    # the relational gaps-islands/parity form must reproduce the exact
    # sequential greedy scan, round by round.
    texts = [
        r["text"]
        for r in t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("text")
        .collect()
    ]
    ref = _bpe_reference(texts)
    got = [
        (
            r["round"],
            r["left_tok"],
            r["right_tok"],
            r["pair_count"],
            r["n_merges"],
            r["tokens_after"],
        )
        for r in QUERIES["llm_bpe_learn"](spark, sf_dir).collect()
    ]
    assert got == ref


def test_bpe_learn_token_conservation(spark, sf_dir):
    # every merge removes exactly one token: tokens_after(r) =
    # tokens_after(r-1) − n_merges(r), anchored at the raw char count.
    base = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select(F.sum(F.least(F.lit(64), F.length("text"))).alias("n"))
        .collect()[0]["n"]
    )
    rows = QUERIES["llm_bpe_learn"](spark, sf_dir).collect()
    prev = base
    for r in rows:
        assert r["tokens_after"] == prev - r["n_merges"]
        assert 0 < r["n_merges"] <= r["pair_count"]
        prev = r["tokens_after"]


def test_tile_plan_matches_ceil_reference(spark, sf_dir):
    rows = QUERIES["mm_tile_plan"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        for dim, tiles, canvas, pad in (
            (r["w"], r["tiles_x"], r["canvas_w"], r["pad_x"]),
            (r["h"], r["tiles_y"], r["canvas_h"], r["pad_y"]),
        ):
            want = 1 if dim <= 224 else math.ceil((dim - 224) / 196) + 1
            assert tiles == want
            assert canvas == (tiles - 1) * 196 + 224
            assert pad == canvas - dim
            # coverage: the canvas covers the image; removing the last
            # tile would not (strides of 196 with a 224 window)
            assert canvas >= dim
            if tiles > 1:
                assert (tiles - 2) * 196 + 224 < dim
        assert r["n_tiles"] == r["tiles_x"] * r["tiles_y"]


def test_tile_plan_reads_only_doc_id(spark, sf_dir):
    # metadata-only promise: column pruning must keep text/payload out
    # of the parquet scan entirely.
    df = QUERIES["mm_tile_plan"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<doc_id:bigint>" in plan
    assert not any(
        k.endswith("Join") or k == "CartesianProduct"
        for k in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct")
        if k in plan
    )
