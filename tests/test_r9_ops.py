"""r9 operator edge-case differentials, on CRAFTED fixtures.

The fixture-driven oracle diff (test_oracle.py) proves engine parity on
the generated corpus; these tests aim the r9 sorted-adjacency
prefix-dedup trick at the adversarial shapes the generator never emits
— chains (a < ab < abc), exact-duplicate groups, bucket boundaries,
and the empty string — and pin BOTH the engine/oracle agreement AND
the hand-computed expected answer (a differential alone would bless a
bug both sides share).
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
    (6, "zz"),         # alone in its first-char bucket → kept
    (7, ""),           # empty text: its own substr-bucket on both
                       # engines, so the differential must still agree
]

# expected: doc_id -> (n_copies, is_prefix_dup, keep)
_EXPECTED = {
    0: (2, True, False),
    1: (1, False, True),
    2: (2, True, False),
    3: (1, True, False),
    4: (1, False, True),
    5: (1, False, True),
    6: (1, False, True),
    7: (1, False, True),
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


def test_prefix_trick_adjacency_property(spark, crafted_dir):
    # the load-bearing invariant: within a first-char bucket, a distinct
    # text is a proper prefix of SOME other distinct text iff its
    # immediate lexicographic successor extends it. Brute-force the
    # crafted set (all pairs) and compare against the op's flags.
    texts = sorted({t for _, t in _DOCS})
    brute = {
        s: any(u != s and u.startswith(s) for u in texts) for s in texts
    }
    sdf = QUERIES["llm_dedup_prefix"](spark, crafted_dir)
    by_text = {t: None for t in texts}
    text_of = dict(_DOCS)
    for r in sdf.collect():
        by_text[text_of[r["doc_id"]]] = r["is_prefix_dup"]
    # the empty string is the one shape the first-char bucketing cannot
    # see (it buckets alone) — both engines agree by construction, and
    # real corpora have n_chars >= 1; assert the known limitation
    # explicitly rather than skipping it silently.
    assert brute[""] is True and by_text[""] is False
    for s in texts:
        if s:
            assert by_text[s] == brute[s], f"flag mismatch for {s!r}"
