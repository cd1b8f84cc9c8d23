"""r11 operator edge-case differentials, on CRAFTED fixtures.

llm_dedup_span_removal is pinned on hand-built documents covering every
branch of the excision semantics: an owner doc that keeps everything, a
partial-overlap doc cleaned in the middle, an exact duplicate killed in
full (empty cleaned text), a sub-k doc with no grams, a doc with two
DISJOINT kill spans (interval merge must NOT fuse them), and a doc with
two OVERLAPPING kill spans (interval merge MUST fuse them). The expected
cleaned strings are hand-computed, and a pure-Python brute-force
replication of the whole pipeline (grams -> min-doc owners -> kill
intervals -> coverage union -> reassembly) cross-checks both engines —
a differential alone would bless a bug both sides share.
"""

from __future__ import annotations

import hashlib
import os

import duckdb
import pytest

from dbt_local_duckdb_deltalake_project_spark.catalog import TABLES
from dbt_local_duckdb_deltalake_project_spark.operators import ORACLE, QUERIES

K = 8

_LONG = " ".join(f"L{i}" for i in range(1, 29))  # 28 shared tokens

# (doc_id, text)
_DOCS = [
    (0, "a b c d e f g h x y"),  # owner of every shared gram: untouched
    (1, "p q a b c d e f g h r s"),  # one interior kill span [2,9]
    (2, "a b c d e f g h x y"),  # exact duplicate: killed IN FULL
    (3, "hello world"),  # < K tokens: no grams, pass-through
    (4, "a b c d e f g h z1 z2 z3 a b c d e f g h w1 w2"),  # 2 DISJOINT
    (5, "m a b c d e f g h x n"),  # 2 OVERLAPPING kills -> 1 merged span
    (6, _LONG),  # owner of the 28-token run: untouched
    (7, f"u1 {_LONG} u2"),  # 28-token merged span: excised at T=25 too
]

# min_span=8 (raw r11 semantics — every merged span >= K goes):
# doc_id -> (n_tokens, n_spans_removed, n_tokens_removed, cleaned text)
_EXPECTED = {
    0: (10, 0, 0, "a b c d e f g h x y"),
    1: (12, 1, 8, "p q r s"),
    2: (10, 1, 10, ""),
    3: (2, 0, 0, "hello world"),
    4: (21, 2, 16, "z1 z2 z3 w1 w2"),
    5: (11, 1, 9, "m n"),
    6: (28, 0, 0, _LONG),
    7: (30, 1, 28, "u1 u2"),
}

# min_span=25 (the registered default): every merged region shorter
# than 25 tokens SURVIVES — only doc 7's fused 28-token region goes
_EXPECTED_MIN25 = {
    0: (10, 0, 0, "a b c d e f g h x y"),
    1: (12, 0, 0, "p q a b c d e f g h r s"),
    2: (10, 0, 0, "a b c d e f g h x y"),
    3: (2, 0, 0, "hello world"),
    4: (21, 0, 0, "a b c d e f g h z1 z2 z3 a b c d e f g h w1 w2"),
    5: (11, 0, 0, "m a b c d e f g h x n"),
    6: (28, 0, 0, _LONG),
    7: (30, 1, 28, "u1 u2"),
}


def _brute_force(docs, min_span=8):
    """Pure-Python replication: k-gram owners, kill-interval coverage
    union, min-span gate on the MERGED regions, first-occurrence-keeps
    reassembly."""
    toks = {i: t.split(" ") for i, t in docs}
    owner: dict[tuple, int] = {}
    for i in sorted(toks):
        for p in range(len(toks[i]) - K + 1):
            g = tuple(toks[i][p : p + K])
            owner.setdefault(g, i)
    out = {}
    for i in sorted(toks):
        spans = [
            (p, p + K - 1)
            for p in range(len(toks[i]) - K + 1)
            if owner[tuple(toks[i][p : p + K])] != i
        ]
        # union first, THEN gate merged regions on length
        merged: list[list[int]] = []
        for s, e in spans:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        kept_iv = [(s, e) for s, e in merged if e - s + 1 >= min_span]
        killed = {p for s, e in kept_iv for p in range(s, e + 1)}
        clean = " ".join(
            w for p, w in enumerate(toks[i]) if p not in killed
        )
        out[i] = (len(toks[i]), len(kept_iv), len(killed), clean)
    return out


def test_expected_table_matches_brute_force():
    # the hand tables and the reference algorithm must agree before
    # either engine is consulted
    assert _brute_force(_DOCS, min_span=8) == _EXPECTED
    assert _brute_force(_DOCS, min_span=25) == _EXPECTED_MIN25


@pytest.fixture(scope="module")
def crafted_dir(tmp_path_factory, sf_dir, spark):
    d = tmp_path_factory.mktemp("crafted_spans")
    for name in TABLES:
        if name != "documents":
            os.symlink(f"{sf_dir}/{name}.parquet", d / f"{name}.parquet")
    rows = [
        (doc_id, text, "en", "crafted", len(text)) for doc_id, text in _DOCS
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "min_span,expected", [(8, _EXPECTED), (25, _EXPECTED_MIN25)]
)
def test_span_removal_adversarial_matches_oracle_and_hand(
    spark, crafted_dir, min_span, expected
):
    from dbt_local_duckdb_deltalake_project_spark.operators.llm_ops import (
        _SPAN_MIN_TOKENS,
        _span_removal_frame,
        _span_removal_oracle,
    )

    if min_span == _SPAN_MIN_TOKENS:
        # the registered callable/oracle pair IS the default-threshold
        # path — exercise the exact objects the driver runs
        sdf = QUERIES["llm_dedup_span_removal"](spark, crafted_dir)
        oracle_sql = ORACLE["llm_dedup_span_removal"]
    else:
        sdf = _span_removal_frame(spark, crafted_dir, min_span)
        oracle_sql = _span_removal_oracle(min_span)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_spans_removed"],
            r["n_tokens_removed"],
            r["clean_md5"],
        )
        for r in sdf.collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{crafted_dir}/documents.parquet/*.parquet')"
    )
    oracle = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(oracle_sql).fetchall()
    }
    con.close()
    assert got == oracle, "engine vs oracle diverge on crafted cases"
    want = {
        i: (n, s, r, hashlib.md5(clean.encode()).hexdigest())
        for i, (n, s, r, clean) in expected.items()
    }
    assert got == want, "both engines agree on a WRONG answer"


def test_bpe_learn_per_round_shuffle_count_flat(spark, sf_dir):
    # the r11 N=8 parameterization contract: per-round plan cost must
    # be FLAT in the round number (each round starts from the previous
    # round's localCheckpoint, so lineage — and with it the exchange
    # count — cannot grow). A growing count would mean the checkpoint
    # stopped truncating lineage and the loop went quadratic.
    from dbt_local_duckdb_deltalake_project_spark.operators.llm_ops import (
        _BPE_N,
        _bpe_learn_rows,
    )

    plans: list[str] = []
    rows = _bpe_learn_rows(spark, sf_dir, round_plans=plans)
    assert len(rows) == _BPE_N and len(plans) == _BPE_N
    counts = [p.count("Exchange") for p in plans]
    assert len(set(counts)) == 1, f"per-round exchange count grew: {counts}"
    assert counts[0] <= 8, f"round plan has too many exchanges: {counts[0]}"


def test_mm_interleave_pack_python_replication(spark, sf_dir):
    # full pure-Python replay of the interleave-pack semantics (tile
    # token costs, hashed order, image-before-caption, greedy prefix
    # packing, slot numbering) — engine/oracle agreement plus an
    # independent third implementation.
    from collections import defaultdict

    from dbt_local_duckdb_deltalake_project_spark.catalog import t

    docs = t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    by_bucket = defaultdict(list)
    for r in docs:
        did = r["doc_id"]
        k = hashlib.md5(str(did).encode()).hexdigest()
        if did % 3 == 0:
            w, h = 1 + (did * 37) % 1920, 1 + (did * 17) % 1080
            tx = (w - 224 + 195) // 196 + 1 if w > 224 else 1
            ty = (h - 224 + 195) // 196 + 1 if h > 224 else 1
            by_bucket[k[:1]].append((k, did, 0, "img", tx * ty * 64))
        by_bucket[k[:1]].append((k, did, 1, "txt", len(r["text"].split(" "))))
    expected = {}
    for bucket, lst in by_bucket.items():
        lst.sort()
        before = 0
        pos_in_pack: dict[int, int] = {}
        for _k, did, _rk, ty, n in lst:
            pid = before // 4096
            pos_in_pack[pid] = pos_in_pack.get(pid, 0) + 1
            expected[(did, ty)] = (n, bucket, pid, pos_in_pack[pid])
            before += n
    got = {
        (r["doc_id"], r["seg_type"]): (
            r["n_tokens"],
            r["bucket"],
            r["pack_id"],
            r["pack_pos"],
        )
        for r in QUERIES["mm_interleave_pack"](spark, sf_dir).collect()
    }
    assert got == expected
