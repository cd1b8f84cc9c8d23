"""Independent-reference checks for the late r6 session-4 additions
(llm_bpe_learn / mm_tile_plan) — a pure-Python third implementation per
op so Spark/DuckDB agreement isn't just two engines sharing a bug.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbt_local_duckdb_deltalake_project_spark.catalog import t
from dbt_local_duckdb_deltalake_project_spark.operators import QUERIES
from dbt_local_duckdb_deltalake_project_spark.operators.llm_ops import _BPE_N


def _bpe_reference(texts: list[str], rounds: int = _BPE_N):
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


def _apply_chain_reference(text: str, merges) -> list[int]:
    """Pure-Python marker-replace chain: sequential lengths
    [len0, len1, len2, len3] after each learned merge is applied as a
    literal leftmost-non-overlapping replace in the marker alphabet."""
    tok2marker: dict[str, str] = {}
    s = text
    lens = [len(s)]
    for rank, (lt, rt) in enumerate(merges, start=1):
        pat = tok2marker.get(lt, lt) + tok2marker.get(rt, rt)
        tok2marker[lt + rt] = str(rank)
        s = s.replace(pat, str(rank))
        lens.append(len(s))
    return lens


def test_bpe_apply_consumes_learned_merges_consistently(spark, sf_dir):
    # the load-bearing r10 handoff: llm_bpe_apply's replace chain must
    # equal GREEDY MERGE APPLICATION of llm_bpe_learn's emitted merge
    # table. Cross-check three ways on the learn's own sample slice:
    # (1) the merges the apply side consumed are the learn op's output;
    # (2) per-doc counts from the op equal a pure-Python replay of the
    #     marker chain over the full text;
    # (3) summing the chain over the sampled 64-char prefixes reproduces
    #     the learn op's tokens_after — i.e. literal-replace application
    #     IS the learn loop's gaps-islands/parity merge, round for round.
    learn = QUERIES["llm_bpe_learn"](spark, sf_dir).collect()
    assert len(learn) == _BPE_N
    merges = [(r["left_tok"], r["right_tok"]) for r in learn]
    got = {
        r["doc_id"]: (
            r["len_chars"],
            *(r[f"n_merge{i}"] for i in range(1, _BPE_N + 1)),
            r["n_tokens"],
        )
        for r in QUERIES["llm_bpe_apply"](spark, sf_dir).collect()
    }
    texts = {
        r["doc_id"]: r["text"]
        for r in t(spark, sf_dir, "documents").collect()
    }
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        lens = _apply_chain_reference(text, merges)
        want = (
            lens[0],
            *(lens[i] - lens[i + 1] for i in range(_BPE_N)),
            lens[_BPE_N],
        )
        assert got[doc_id] == want, f"doc {doc_id}"
    # (3): on the sample slice the chain must land exactly on the learn
    # op's final-round tokens_after (and each round's merge total).
    sampled = [s[:64] for d, s in texts.items() if d % 10 == 0]
    per_round = [0] * _BPE_N
    total = 0
    for s in sampled:
        lens = _apply_chain_reference(s, merges)
        for i in range(_BPE_N):
            per_round[i] += lens[i] - lens[i + 1]
        total += lens[_BPE_N]
    assert total == learn[-1]["tokens_after"]
    assert per_round == [r["n_merges"] for r in learn]
