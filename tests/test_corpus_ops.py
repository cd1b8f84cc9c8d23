"""Semantic invariants for the corpus-management operators — properties
the oracle diff can't express (it only proves Spark==DuckDB, not that
both are right)."""

from __future__ import annotations

import re

from dbt_local_duckdb_deltalake_project_spark.catalog import t
from dbt_local_duckdb_deltalake_project_spark.operators import QUERIES


def test_split_assign_is_total_and_balanced(spark, sf_dir):
    pdf = QUERIES["llm_split_assign"](spark, sf_dir).toPandas()
    n_docs = t(spark, sf_dir, "documents").count()
    # total: every doc exactly once, only the three splits
    assert len(pdf) == n_docs and pdf.doc_id.is_unique
    assert set(pdf.split.unique()) <= {"train", "val", "test"}
    # balanced: md5 is uniform, so shares track 80/10/10 loosely even
    # at 500 docs (binomial 3-sigma ~ 5%)
    shares = pdf.split.value_counts(normalize=True)
    assert 0.70 <= shares.get("train", 0) <= 0.90
    assert 0.04 <= shares.get("val", 0) <= 0.18
    assert 0.04 <= shares.get("test", 0) <= 0.18


def test_shuffle_is_a_permutation(spark, sf_dir):
    pdf = QUERIES["llm_shuffle_deterministic"](spark, sf_dir).toPandas()
    n_docs = t(spark, sf_dir, "documents").count()
    assert len(pdf) == n_docs and pdf.doc_id.is_unique
    # pos_in_bucket is 1..n contiguous within every bucket
    for _, grp in pdf.groupby("bucket"):
        assert sorted(grp.pos_in_bucket) == list(range(1, len(grp) + 1))


def test_pii_redact_leaves_no_pii(spark, sf_dir):
    pdf = QUERIES["llm_pii_redact"](spark, sf_dir).toPandas()
    email = re.compile(r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}")
    phone = re.compile(r"\b555-[0-9]{4}\b")
    assert (pdf.n_emails >= 1).all() and (pdf.n_phones >= 1).all()
    for s in pdf.redacted:
        assert not email.search(s) and not phone.search(s)
        assert "[EMAIL]" in s and "[PHONE]" in s


def test_sequence_pack_fills_but_never_skips(spark, sf_dir):
    pdf = QUERIES["llm_sequence_pack"](spark, sf_dir).toPandas()
    budget = 512
    n_docs = t(spark, sf_dir, "documents").count()
    assert len(pdf) == n_docs and pdf.doc_id.is_unique
    for _, grp in pdf.groupby("bucket"):
        # pack ids start at 0 and are contiguous
        ids = sorted(grp.pack_id.unique())
        assert ids == list(range(len(ids)))
        # greedy-fill bound: every pack except the last holds at least
        # the budget minus one doc of slack… equivalently, a pack's
        # tokens_before span never leaves a full-budget hole: each
        # non-final pack's total >= budget - max doc size in the bucket
        totals = grp.groupby("pack_id").n_tokens.sum()
        max_doc = grp.n_tokens.max()
        for pid in ids[:-1]:
            assert totals[pid] >= budget - max_doc
        # overflow bound: a pack exceeds the budget by less than one doc
        assert (totals < budget + max_doc).all()


def test_decontaminate_flags_only_training_docs(spark, sf_dir):
    pdf = QUERIES["llm_decontaminate"](spark, sf_dir).toPandas()
    # flagged docs must come from the training side (md5 prefix >= '08')
    import hashlib

    for d in pdf.doc_id:
        h = hashlib.md5(str(d).encode()).hexdigest()[:2]
        assert h >= "08", f"held-out doc {d} flagged as training"
    assert (pdf.n_hit_shingles >= 1).all()


def test_scan_binaryfile_hashes_match_duckdb_read_blob(spark, sf_dir):
    # rows-mode operator (a static oracle can't hold the sf-dependent
    # staged path) — differential check here instead: Spark binaryFile
    # and DuckDB read_blob must agree on names, sizes, and byte hashes.
    import duckdb

    from dbt_local_duckdb_deltalake_project_spark.operators import QUERIES
    from dbt_local_duckdb_deltalake_project_spark.operators.medallion import (
        stage_bronze_csv,
    )

    bronze = stage_bronze_csv(spark, sf_dir)
    got = {
        r.file_name: (r.n_bytes, r.content_md5)
        for r in QUERIES["scan_binaryfile"](spark, sf_dir).collect()
    }
    want = {
        fn.rsplit("/", 1)[-1]: (size, md5)
        for fn, size, md5 in duckdb.connect()
        .execute(
            "SELECT filename, size, md5(decode(content)) "
            f"FROM read_blob('{bronze}/part-*.csv')"
        )
        .fetchall()
    }
    assert got == want and len(got) > 0


def test_cc_large_small_star_chain_converges_logarithmically(spark):
    # A 256-node path is the pathological case for plain min-label
    # propagation (255 rounds = the diameter); large-star/small-star
    # must collapse it to one star in O(log n) alternations.
    from dbt_local_duckdb_deltalake_project_spark.operators.llm_ops import _cc_large_small_star

    n = 256
    edges = [(i, i + 1) for i in range(n - 1)]
    sym = spark.createDataFrame(
        edges + [(b, a) for a, b in edges], "doc_a long, doc_b long"
    )
    labels, rounds = _cc_large_small_star(sym)
    got = {r.doc_id: r.label for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    assert rounds <= 10  # log2(256)=8 + convergence-confirming round


def test_cc_large_small_star_matches_union_find(spark):
    import random

    from dbt_local_duckdb_deltalake_project_spark.operators.llm_ops import _cc_large_small_star

    rng = random.Random(7)
    nodes = list(range(120))
    edges = {
        tuple(sorted(rng.sample(nodes, 2))) for _ in range(90)
    }
    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    touched = {v for e in edges for v in e}
    want = {}
    for v in touched:
        root = find(v)
        want.setdefault(root, []).append(v)
    expect = {
        v: min(members) for members in want.values() for v in members
    }
    sym = spark.createDataFrame(
        [(a, b) for a, b in edges] + [(b, a) for a, b in edges],
        "doc_a long, doc_b long",
    )
    labels, _rounds = _cc_large_small_star(sym)
    got = {r.doc_id: r.label for r in labels.collect()}
    assert got == expect


def test_semantic_dedup_keeps_lowest_id_per_cluster(spark, sf_dir):
    # SemDeDup keeper rule: a vector can only be marked duplicate by a
    # LOWER-id cluster-mate, so the minimum vec_id of every cluster must
    # always survive (is_dup = False) — the anchor the dedup pass keeps.
    from dbt_local_duckdb_deltalake_project_spark.operators import QUERIES

    rows = QUERIES["llm_dedup_semantic"](spark, sf_dir).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    assert by_cluster
    for members in by_cluster.values():
        anchor = min(members, key=lambda r: r.vec_id)
        assert not anchor.is_dup
