"""r9 operator edge-case differentials, on CRAFTED fixtures.

The fixture-driven oracle diff (test_oracle.py) proves engine parity on
the generated corpus; these tests aim the sorted-adjacency prefix-dedup
trick at the adversarial shapes the generator never emits — chains
(a < ab < abc), exact-duplicate groups, range-partition boundaries
(with 16 range partitions over a handful of distinct texts nearly every
adjacency crosses a partition boundary, so the r10 boundary-handoff
path carries the whole answer), and the empty string (correctly flagged
as a prefix of everything since the r10 range-partition form — the old
first-char bucketing could not see its successor) — and pin BOTH the
engine/oracle agreement AND the hand-computed expected answer (a
differential alone would bless a bug both sides share).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from dbt_local_duckdb_deltalake_project_spark.catalog import TABLES
from dbt_local_duckdb_deltalake_project_spark.operators import ORACLE, QUERIES

# (doc_id, text) — hand-crafted cases; n_copies / is_prefix_dup / keep
# computed by hand below.
_DOCS = [
    (0, "alpha"),      # proper prefix of "alphabet" → dup
    (1, "alphabet"),   # nothing extends it → kept
    (2, "alpha"),      # exact duplicate of 0 (rep_id 0 keeps, 2 doesn't)
    (3, "b"),          # chain head: prefix of "ba" → dup
    (4, "ba"),         # middle of sorted bucket: "bb" does NOT extend it
    (5, "bb"),         # nothing extends it → kept
    (6, "zz"),         # global maximum: its LEAD is the cross-boundary
                       # null → boundary handoff must coalesce to kept
    (7, ""),           # empty text: global minimum, proper prefix of
                       # every other text → dup (via the boundary
                       # handoff — "" is almost surely alone in range
                       # partition 0, so its successor arrives from the
                       # next partition's first row)
    (8, "alphabet soup"),  # extends "alphabet" → doc 1 is a dup too,
                           # through a cross-partition adjacency
    (9, "soup"),           # not a prefix of anything, but a SUFFIX of
                           # "alphabet soup" → suffix-dup, prefix-kept
]

# expected: doc_id -> (n_copies, is_prefix_dup, keep)
_EXPECTED = {
    0: (2, True, False),
    1: (1, True, False),
    2: (2, True, False),
    3: (1, True, False),
    4: (1, False, True),
    5: (1, False, True),
    6: (1, False, True),
    7: (1, True, False),
    8: (1, False, True),
    9: (1, False, True),
}

# expected: doc_id -> (n_copies, is_suffix_dup, keep). Hand-derived on
# the reversed strings: "" is a suffix of everything, "b" of "bb",
# "soup" of "alphabet soup"; nothing else is a tail of anything.
_EXPECTED_SUFFIX = {
    0: (2, False, True),
    1: (1, False, True),
    2: (2, False, False),
    3: (1, True, False),
    4: (1, False, True),
    5: (1, False, True),
    6: (1, False, True),
    7: (1, True, False),
    8: (1, False, True),
    9: (1, True, False),
}


@pytest.fixture(scope="module")
def crafted_dir(tmp_path_factory, sf_dir, spark):
    """A fixture dir whose documents table is the crafted case set;
    every other table symlinks the real fixture (catalog.register_views
    registers all ten)."""
    d = tmp_path_factory.mktemp("crafted_prefix")
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


def test_llm_dedup_prefix_adversarial_matches_oracle(spark, crafted_dir):
    sdf = QUERIES["llm_dedup_prefix"](spark, crafted_dir)
    got = {
        r["doc_id"]: (r["n_copies"], r["is_prefix_dup"], r["keep"])
        for r in sdf.collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{crafted_dir}/documents.parquet/*.parquet')"
    )
    oracle = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(ORACLE["llm_dedup_prefix"]).fetchall()
    }
    con.close()
    assert got == oracle, "engine vs oracle diverge on crafted cases"
    assert got == _EXPECTED, "both engines agree on a WRONG answer"


def test_llm_dedup_suffix_adversarial_matches_oracle(spark, crafted_dir):
    sdf = QUERIES["llm_dedup_suffix"](spark, crafted_dir)
    got = {
        r["doc_id"]: (r["n_copies"], r["is_suffix_dup"], r["keep"])
        for r in sdf.collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{crafted_dir}/documents.parquet/*.parquet')"
    )
    oracle = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(ORACLE["llm_dedup_suffix"]).fetchall()
    }
    con.close()
    assert got == oracle, "engine vs oracle diverge on crafted cases"
    assert got == _EXPECTED_SUFFIX, "both engines agree on a WRONG answer"


def test_suffix_trick_brute_force_property(spark, crafted_dir):
    # A is a proper suffix of SOME other distinct text iff
    # reverse(A) is a proper prefix among reversed texts — brute-force
    # all pairs and compare against the op's flags.
    texts = sorted({t for _, t in _DOCS})
    brute = {
        s: any(u != s and u.endswith(s) for u in texts) for s in texts
    }
    sdf = QUERIES["llm_dedup_suffix"](spark, crafted_dir)
    text_of = dict(_DOCS)
    by_text = {}
    for r in sdf.collect():
        by_text[text_of[r["doc_id"]]] = r["is_suffix_dup"]
    for s in texts:
        assert by_text[s] == brute[s], f"suffix flag mismatch for {s!r}"


def test_prefix_trick_adjacency_property(spark, crafted_dir):
    # the load-bearing invariant: a distinct text is a proper prefix of
    # SOME other distinct text iff its immediate GLOBAL lexicographic
    # successor extends it. Brute-force the crafted set (all pairs) and
    # compare against the op's flags — including the empty string, which
    # the r10 range-partition form handles (its successor arrives via
    # the cross-partition boundary handoff; the old first-char bucketing
    # could not see it).
    texts = sorted({t for _, t in _DOCS})
    brute = {
        s: any(u != s and u.startswith(s) for u in texts) for s in texts
    }
    sdf = QUERIES["llm_dedup_prefix"](spark, crafted_dir)
    by_text = {t: None for t in texts}
    text_of = dict(_DOCS)
    for r in sdf.collect():
        by_text[text_of[r["doc_id"]]] = r["is_prefix_dup"]
    for s in texts:
        assert by_text[s] == brute[s], f"flag mismatch for {s!r}"
